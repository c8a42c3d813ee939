package graft.ext

/** MP4 / ISOBMFF (ISO 14496-12) box-tree TRIAGE — the structural walk
  * for the container that dominates a real crawl's video: `ftyp`/`moov`
  * parsing (movie header, per-track media headers, handler types,
  * sample tables) reports duration, sample rate, frame and sample
  * counts, and the media bitrate WITHOUT touching a single coded
  * sample — the probe pass a corpus pipeline runs to histogram video
  * durations and budget decode cycles.  Codec-payload decode (H.264 /
  * AAC) stays the declared jar-drop extension point, exactly like
  * [[Mp3FrameCodec]]'s PCM synthesis and for the same reason.
  *
  * Walked structure: boxes are `u32 size + 4cc type` (size 1 → 64-bit
  * largesize follows; size 0 → to end of enclosing scope), containers
  * (`moov`/`trak`/`mdia`/`minf`/`stbl`) nest; `mvhd`/`mdhd` are
  * full boxes (version byte switches 32/64-bit times), `hdlr` carries
  * the track handler (`soun`/`vide`), `stsz` the sample count.
  *
  * Probe field mapping (documented, closed-form testable):
  *  - `sampleRate`  = the first audio track's `mdhd` timescale (the
  *    container convention: audio media timescale == sample rate);
  *  - `nSamples`    = that track's `mdhd` duration (PCM frames under
  *    the same convention); 0 when no audio track;
  *  - `nFrames`     = the first VIDEO track's `stsz` sample count
  *    (coded frames), falling back to the audio track's;
  *  - `bitrateKbps` = `mdat` body bytes × 8 over the audio duration —
  *    the MEDIA bitrate, container overhead excluded; 0 without audio.
  *
  * Hostility posture matches the SPI family: truncated/looping/lying
  * box sizes end the walk (degrade to None, never throw, never
  * allocate proportionally to a declared size). */
class Mp4Codec extends CompressedCodec {
  import Mp4Codec._

  override def name: String = "mp4-boxes"

  override def sniff(p: Array[Byte]): Boolean =
    p.length >= 12 && p(4) == 'f' && p(5) == 't' && p(6) == 'y' &&
      p(7) == 'p'

  /** Coded-sample decode is the declared extension point. */
  override def decode(p: Array[Byte]): Option[Array[Byte]] = None
  override def decodeFrames(p: Array[Byte]): Option[Seq[Array[Byte]]] =
    None

  override def probe(p: Array[Byte])
      : Option[CompressedCodecs.MediaProbe] =
    try {
      if (!sniff(p)) return None
      var audio: Option[Track] = None
      var video: Option[Track] = None
      var mdatBytes = 0L
      boxes(p, 0, p.length).foreach { case (tpe, off, len) =>
        if (tpe == "mdat") mdatBytes += len
        else if (tpe == "moov")
          boxes(p, off, off + len).foreach { case (t2, o2, l2) =>
            if (t2 == "trak") parseTrak(p, o2, o2 + l2).foreach { tr =>
              if (tr.handler == "soun" && audio.isEmpty) audio = Some(tr)
              if (tr.handler == "vide" && video.isEmpty) video = Some(tr)
            }
          }
      }
      if (audio.isEmpty && video.isEmpty) return None
      val sr = audio.map(_.timescale).getOrElse(0L)
      val nSamples = audio.map(_.duration).getOrElse(0L)
      val nFrames = video.map(_.sampleCount)
        .orElse(audio.map(_.sampleCount)).getOrElse(0L)
      val kbps =
        if (sr > 0 && nSamples > 0)
          math.round(mdatBytes * 8.0 * sr / nSamples.toDouble / 1000.0)
            .toInt
        else 0
      Some(CompressedCodecs.MediaProbe(name, nFrames, sr.toInt, kbps,
        nSamples))
    } catch { case scala.util.control.NonFatal(_) => None }
}

object Mp4Codec {

  private[ext] case class Track(handler: String, timescale: Long,
                                duration: Long, sampleCount: Long)

  private def u32(p: Array[Byte], o: Int): Long =
    ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)

  private def u64(p: Array[Byte], o: Int): Long =
    (u32(p, o) << 32) | u32(p, o + 4)

  private def cc(p: Array[Byte], o: Int): String =
    new String(p, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** (type, bodyOffset, bodyLen) for each box in [from, to); lying or
    * truncated sizes end the walk. */
  private[ext] def boxes(p: Array[Byte], from: Int,
                         to: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var o = from
    while (o + 8 <= to) {
      val sz32 = u32(p, o)
      val tpe = cc(p, o + 4)
      var body = o + 8
      val size =
        if (sz32 == 1L && o + 16 <= to) { body = o + 16; u64(p, o + 8) }
        else if (sz32 == 0L) (to - o).toLong
        else sz32
      if (size < (body - o).toLong || o + size > to) return out.result()
      out += ((tpe, body, (o + size - body).toInt))
      o += size.toInt
    }
    out.result()
  }

  /** trak → (handler, mdhd timescale/duration, stsz sample count). */
  private def parseTrak(p: Array[Byte], from: Int,
                        to: Int): Option[Track] = {
    var handler = ""
    var timescale = 0L
    var duration = 0L
    var samples = 0L
    boxes(p, from, to).foreach { case (t, o, l) =>
      if (t == "mdia") boxes(p, o, o + l).foreach { case (t2, o2, l2) =>
        t2 match {
          case "mdhd" if l2 >= 20 =>
            val v = p(o2) & 0xff
            if (v == 1 && l2 >= 32) {
              timescale = u32(p, o2 + 20)
              duration = u64(p, o2 + 24)
            } else {
              timescale = u32(p, o2 + 12)
              duration = u32(p, o2 + 16)
            }
          case "hdlr" if l2 >= 12 =>
            handler = cc(p, o2 + 8)
          case "minf" =>
            boxes(p, o2, o2 + l2).foreach { case (t3, o3, l3) =>
              if (t3 == "stbl")
                boxes(p, o3, o3 + l3).foreach { case (t4, o4, l4) =>
                  if (t4 == "stsz" && l4 >= 12) samples = u32(p, o4 + 8)
                }
            }
          case _ => ()
        }
      }
    }
    if (handler.isEmpty) None
    else Some(Track(handler, timescale, duration, samples))
  }

  // --------------------------------------------------------- writer

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(tpe: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8L) ++
      tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body

  private def fullBox(tpe: String, body: Array[Byte]): Array[Byte] =
    box(tpe, Array[Byte](0, 0, 0, 0) ++ body)

  private def trakBox(handler: String, timescale: Long, duration: Long,
                      sampleCount: Long): Array[Byte] = {
    val mdhd = fullBox("mdhd",
      be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++
        Array[Byte](0x55, (0xc4 - 256).toByte, 0, 0))
    val hdlr = fullBox("hdlr", be32(0) ++
      handler.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      new Array[Byte](13))
    val stsz = fullBox("stsz", be32(0) ++ be32(sampleCount))
    val stbl = box("stbl", stsz)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    box("trak", mdia)
  }

  /** Deterministic minimal MP4 — the injection constructor the probe
    * must invert exactly.  One audio track (timescale = `sampleRate`,
    * duration = `nAudioSamples`, `audioChunks` coded samples),
    * optionally one video track (`videoFrames`), and an `mdat` of
    * `mdatBytes` zero bytes. */
  def syntheticMp4(sampleRate: Int, nAudioSamples: Long,
                   audioChunks: Long, videoFrames: Option[Long],
                   mdatBytes: Int): Array[Byte] = {
    require(sampleRate > 0 && nAudioSamples >= 0 && mdatBytes >= 0)
    val ftyp = box("ftyp",
      "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        be32(512) ++
        "isomiso2".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val mvhd = fullBox("mvhd",
      be32(0) ++ be32(0) ++ be32(1000) ++
        be32(nAudioSamples * 1000 / sampleRate) ++ new Array[Byte](80))
    val traks =
      trakBox("soun", sampleRate.toLong, nAudioSamples, audioChunks) ++
        videoFrames.map(v =>
          trakBox("vide", 30000L, v * 1001L, v)).getOrElse(Array.empty)
    val moov = box("moov", mvhd ++ traks)
    val mdat = box("mdat", new Array[Byte](mdatBytes))
    ftyp ++ moov ++ mdat
  }
}
