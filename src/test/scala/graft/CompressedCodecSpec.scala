package graft

import graft.ext.{CompressedCodecs, ImaAdpcmWavCodec, MjpegAviCodec,
  Multimodal, WavAudioCodec}
import org.apache.spark.sql.functions._

/** Real compressed-media decode (round-13 verdict #4): IMA-ADPCM audio
  * (WAV fmt 0x11 — a genuine 4:1 lossy codec the JDK cannot decode)
  * and Motion-JPEG video (AVI) against from-scratch test encoders, the
  * ServiceLoader SPI wiring, and the Spark-side dispatch through the
  * Multimodal stages.
  */
class CompressedCodecSpec extends SparkSpec {

  // ------------------------------------------------------ test encoders

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def riffWav(fmt: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def chunk(id: String, body: Array[Byte]): Unit = {
      out.write(id.getBytes("US-ASCII")); out.write(le32(body.length))
      out.write(body); if (body.length % 2 == 1) out.write(0)
    }
    val inner = new java.io.ByteArrayOutputStream()
    inner.write("WAVE".getBytes("US-ASCII"))
    val tmp = new java.io.ByteArrayOutputStream()
    out.reset()
    chunk("fmt ", fmt); tmp.write(out.toByteArray); out.reset()
    chunk("data", data); tmp.write(out.toByteArray); out.reset()
    inner.write(tmp.toByteArray)
    val whole = new java.io.ByteArrayOutputStream()
    whole.write("RIFF".getBytes("US-ASCII"))
    whole.write(le32(inner.size()))
    whole.write(inner.toByteArray)
    whole.toByteArray
  }

  /** Plain 16-bit PCM WAV (the uncompressed twin). */
  private def pcmWav(mono: Array[Short], rate: Int): Array[Byte] = {
    val fmt = le16(1) ++ le16(1) ++ le32(rate) ++ le32(rate * 2L) ++
      le16(2) ++ le16(16)
    val data = new Array[Byte](mono.length * 2)
    mono.indices.foreach { i =>
      data(2 * i) = (mono(i) & 0xff).toByte
      data(2 * i + 1) = ((mono(i) >> 8) & 0xff).toByte
    }
    riffWav(fmt, data)
  }

  /** From-scratch IMA-ADPCM encoder (the decoder's mirror): blocks of
    * `spb` samples per channel, 4-byte channel-interleaved nibble
    * words, low nibble first.  spb ≡ 1 (mod 8) keeps every word
    * full. */
  private def imaWav(ch: Array[Array[Short]], rate: Int,
                     spb: Int = 505): Array[Byte] = {
    import graft.ext.ImaAdpcmWavCodec.{IndexTable, StepTable}
    val channels = ch.length
    val n = ch(0).length
    val blockAlign = 4 * channels + (spb - 1) / 2 * channels
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    def enc(c: Int, x: Int): Int = {
      val st = StepTable(idx(c))
      var diff = x - pred(c)
      var nib = 0
      if (diff < 0) { nib = 8; diff = -diff }
      if (diff >= st) { nib |= 4; diff -= st }
      if (diff >= (st >> 1)) { nib |= 2; diff -= st >> 1 }
      if (diff >= (st >> 2)) { nib |= 1 }
      // decoder-identical reconstruction
      var d2 = st >> 3
      if ((nib & 1) != 0) d2 += st >> 2
      if ((nib & 2) != 0) d2 += st >> 1
      if ((nib & 4) != 0) d2 += st
      if ((nib & 8) != 0) d2 = -d2
      pred(c) = math.min(32767, math.max(-32768, pred(c) + d2))
      idx(c) = math.min(88, math.max(0, idx(c) + IndexTable(nib)))
      nib
    }
    val data = new java.io.ByteArrayOutputStream()
    var s0 = 0
    while (s0 < n) {
      val take = math.min(spb, n - s0)
      (0 until channels).foreach { c =>
        pred(c) = ch(c)(s0).toInt
        data.write(le16(pred(c) & 0xffff)); data.write(idx(c)); data.write(0)
      }
      var s = 1
      while (s < spb) {
        (0 until channels).foreach { c =>
          val w = new Array[Byte](4)
          (0 until 8).foreach { k =>
            val sample =
              if (s + k < take) ch(c)(s0 + s + k).toInt
              else ch(c)(s0 + take - 1).toInt // pad with the last sample
            val nib = enc(c, sample)
            if ((k & 1) == 0) w(k >> 1) = (nib & 0x0f).toByte
            else w(k >> 1) = (w(k >> 1) | (nib << 4)).toByte
          }
          data.write(w)
        }
        s += 8
      }
      s0 += spb
    }
    val fmt = le16(0x11) ++ le16(channels) ++ le32(rate) ++
      le32(rate.toLong * blockAlign / spb) ++ le16(blockAlign) ++
      le16(4) ++ le16(2) ++ le16(spb)
    riffWav(fmt, data.toByteArray)
  }

  /** Minimal MJPEG AVI: RIFF 'AVI ' + LIST movi with one 00dc chunk
    * per JPEG frame. */
  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val movi = new java.io.ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    frames.foreach { f =>
      movi.write("00dc".getBytes("US-ASCII")); movi.write(le32(f.length))
      movi.write(f); if (f.length % 2 == 1) movi.write(0)
    }
    val inner = new java.io.ByteArrayOutputStream()
    inner.write("AVI ".getBytes("US-ASCII"))
    inner.write("LIST".getBytes("US-ASCII"))
    inner.write(le32(movi.size()))
    inner.write(movi.toByteArray)
    val whole = new java.io.ByteArrayOutputStream()
    whole.write("RIFF".getBytes("US-ASCII"))
    whole.write(le32(inner.size()))
    whole.write(inner.toByteArray)
    whole.toByteArray
  }

  private def jpegBytes(seed: Int, w: Int = 64, h: Int = 48): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val v = (x * 4 + y * 3 + seed * 40) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Amplitude-modulated test tone: the slow AM gives the energy
    * envelope a decisive rise/fall shape (a steady sine makes every
    * adjacent-window comparison a near-tie, which no lossy codec—or
    * even resampling—could preserve bit-stably). */
  private def sine(n: Int, rate: Int, hz: Double, amp: Double,
                   phase: Double = 0.0): Array[Short] =
    Array.tabulate(n) { i =>
      val t = i.toDouble / rate
      val am = 0.55 + 0.45 * math.sin(2 * math.Pi * 2.1 * t)
      (amp * am * 32767 * (math.sin(2 * math.Pi * hz * t + phase) +
        0.4 * math.sin(2 * math.Pi * hz * 2.7 * t))
        / 1.4).toShort
    }

  // ---------------------------------------------------------- discovery

  test("ServiceLoader discovers the built-in compressed codecs") {
    val names = CompressedCodecs.installed.map(_.name)
    assert(names.contains("ima-adpcm-wav") && names.contains("mjpeg-avi")
      && names.contains("mp3-frames"), s"installed: $names")
  }

  test("MP3 frame probe inverts the synthetic constructor: frames, " +
    "rate, bitrate, samples — with and without ID3v2 tags") {
    import graft.ext.Mp3FrameCodec
    val codec = new Mp3FrameCodec
    for (br <- Seq(1, 9, 14); sr <- 0 to 2; frames <- Seq(1, 4, 7);
         id3 <- Seq(false, true)) {
      val p = Mp3FrameCodec.syntheticStream(br, sr, frames, id3)
      assert(codec.sniff(p), s"sniff failed br=$br sr=$sr id3=$id3")
      val pr = codec.probe(p).get
      assert(pr.codec === "mp3-frames")
      assert(pr.nFrames === frames.toLong)
      assert(pr.sampleRate === Mp3FrameCodec.SampleRates(sr))
      assert(pr.bitrateKbps === Mp3FrameCodec.BitrateKbps(br))
      assert(pr.nSamples === frames.toLong * 1152)
    }
    // decode stays the declared extension point (triage only)
    val p = Mp3FrameCodec.syntheticStream(9, 0, 3, id3 = false)
    assert(codec.decode(p).isEmpty && codec.decodeFrames(p).isEmpty)
  }

  test("MP3 probe reports the STREAM-AVERAGE bitrate on VBR streams " +
    "(all frames counted, bitrate no longer first-frame-only)") {
    import graft.ext.Mp3FrameCodec
    val codec = new Mp3FrameCodec
    // 3 frames at 128 kbps + 2 at 320 kbps, same sample rate: a VBR
    // stream whose true average is NOT either frame's table entry
    val a = Mp3FrameCodec.syntheticStream(9, 0, 3, id3 = false)
    val b = Mp3FrameCodec.syntheticStream(14, 0, 2, id3 = false)
    val pr = codec.probe(a ++ b).get
    assert(pr.nFrames === 5L)
    assert(pr.nSamples === 5L * 1152)
    val sr = Mp3FrameCodec.SampleRates(0)
    val expected = math.round(
      (a.length + b.length) * 8.0 * sr / (5 * 1152.0) / 1000.0).toInt
    assert(pr.bitrateKbps === expected,
      s"VBR average: got ${pr.bitrateKbps}, want $expected")
    assert(pr.bitrateKbps > 128 && pr.bitrateKbps < 320)
  }

  test("ID3v2 footer flag adds 10 bytes to the tag skip — tagged " +
    "files with footers stay probeable") {
    import graft.ext.Mp3FrameCodec
    val frames = Mp3FrameCodec.syntheticStream(9, 0, 4, id3 = false)
    val out = new java.io.ByteArrayOutputStream()
    // ID3v2.4 header with the footer flag (0x10) and synchsafe size 12
    out.write(Array[Byte]('I', 'D', '3', 4, 0, 0x10))
    out.write(Array[Byte](0, 0, 0, 12))
    out.write(new Array[Byte](12)) // tag body
    out.write(Array[Byte]('3', 'D', 'I', 4, 0, 0x10)) // footer (10 bytes)
    out.write(Array[Byte](0, 0, 0, 12))
    out.write(frames)
    val codec = new Mp3FrameCodec
    val pr = codec.probe(out.toByteArray)
    assert(pr.isDefined, "footer bytes must not land the frame walk")
    assert(pr.get.nFrames === 4L)
    assert(pr.get.bitrateKbps === Mp3FrameCodec.BitrateKbps(9))
  }

  test("MP3 probe hostility: truncation counts only complete frames, " +
    "mid-stream rate changes stop the walk, garbage never sniffs, " +
    "nothing throws") {
    import graft.ext.Mp3FrameCodec
    val codec = new Mp3FrameCodec
    val valid = Mp3FrameCodec.syntheticStream(9, 0, 5, id3 = true)
    // 40-point truncation sweep: probe returns Some(k<=5) or None,
    // never throws; frame count is monotone in the cut point
    var last = 0L
    (1 to 40).foreach { i =>
      val cut = valid.take(math.max(1, valid.length * i / 40))
      val n = codec.probe(cut).map(_.nFrames).getOrElse(0L)
      assert(n >= last && n <= 5, s"cut $i: $n after $last")
      last = n
    }
    assert(last === 5L)
    // a frame with a DIFFERENT sample rate mid-stream ends the count
    // at the consistent prefix (VBR bitrate would be fine; rate not)
    val a = Mp3FrameCodec.syntheticStream(9, 0, 3, id3 = false)
    val b = Mp3FrameCodec.syntheticStream(9, 1, 2, id3 = false)
    val mixed = a ++ b
    assert(codec.probe(mixed).get.nFrames === 3L)
    // garbage and bit-flipped headers degrade, never throw
    val rng = new scala.util.Random(7)
    (0 until 40).foreach { _ =>
      val p = new Array[Byte](rng.nextInt(2000)); rng.nextBytes(p)
      codec.sniff(p); codec.probe(p); ()
    }
    (0 until 40).foreach { _ =>
      val p = valid.clone()
      val at = rng.nextInt(p.length)
      p(at) = (p(at) ^ (1 << rng.nextInt(8))).toByte
      if (codec.sniff(p)) codec.probe(p)
      ()
    }
  }

  // --------------------------------------------------------- IMA ADPCM

  test("IMA-ADPCM round-trip: sniff, decode, small reconstruction " +
    "error, and a fingerprint that matches the PCM twin") {
    val rate = 8000
    val mono = sine(16000, rate, 220.0, 0.6)
    val adpcm = imaWav(Array(mono), rate)
    val codec = new ImaAdpcmWavCodec
    assert(codec.sniff(adpcm))
    // the JDK itself cannot read fmt 0x11 — that fall-through is why
    // the compressed chain exists
    assert(WavAudioCodec.decode(adpcm).isEmpty)
    val got = codec.decodeAudio(adpcm).get
    assert(got.sampleRate == rate && got.mono.length >= mono.length)
    // lossy but close: relative RMS error under 5% on a smooth signal
    var se = 0.0; var ref = 0.0
    mono.indices.foreach { i =>
      val d = got.mono(i) - mono(i); se += d.toDouble * d; ref += mono(i).toDouble * mono(i)
    }
    val rel = math.sqrt(se / ref)
    assert(rel < 0.05, s"ADPCM relative RMS error $rel")
    // perceptual fingerprint: the lossy re-encode flips at most a few
    // near-tie envelope bits — within the hamming-LSH dedup radius
    // (maxDist=4), which is exactly the bucket-next-to-the-original
    // contract; bit equality would demand losslessness from a lossy
    // codec
    val pcm = WavAudioCodec.decode(pcmWav(mono, rate)).get
    val ham = java.lang.Long.bitCount(
      WavAudioCodec.aHash64(got.mono.take(mono.length)) ^
        WavAudioCodec.aHash64(pcm.mono))
    assert(ham <= 4,
      s"ADPCM re-encode drifted $ham envelope bits from the PCM twin")
  }

  test("IMA-ADPCM stereo decodes channel-averaged, like the PCM path") {
    val rate = 8000
    val l = sine(8080, rate, 220.0, 0.5)
    val r = sine(8080, rate, 220.0, 0.5, phase = 0.2)
    val got = new ImaAdpcmWavCodec().decodeAudio(
      imaWav(Array(l, r), rate)).get
    assert(got.channels == 2)
    var se = 0.0; var ref = 0.0
    l.indices.foreach { i =>
      val avg = ((l(i).toInt + r(i).toInt) / 2)
      val d = got.mono(i) - avg; se += d.toDouble * d; ref += avg.toDouble * avg
    }
    assert(math.sqrt(se / ref) < 0.05)
  }

  test("IMA-ADPCM hostility: PCM WAV, text, truncated payloads all " +
    "degrade, never throw") {
    val codec = new ImaAdpcmWavCodec
    val pcm = pcmWav(sine(4000, 8000, 300.0, 0.5), 8000)
    assert(!codec.sniff(pcm))
    assert(!codec.sniff("RIFFxxxxWAVE but not really".getBytes))
    val adpcm = imaWav(Array(sine(4040, 8000, 300.0, 0.5)), 8000)
    assert(codec.decodeAudio(adpcm.take(40)).isEmpty)
    // corrupt fmt: claim 3 channels
    val bad = adpcm.clone(); bad(22) = 3
    assert(codec.decodeAudio(bad).isEmpty)
  }

  // -------------------------------------------------------- MJPEG AVI

  test("MJPEG AVI: frames decode to the canonical grayscale form; the " +
    "first-frame dHash equals the standalone JPEG's") {
    val jpegs = Seq(jpegBytes(0), jpegBytes(1), jpegBytes(2))
    val avi = mjpegAvi(jpegs)
    val codec = new MjpegAviCodec
    assert(codec.sniff(avi))
    assert(!codec.sniff(jpegs.head))
    assert(Multimodal.ImageIoCodec.sniff(avi).isEmpty,
      "AVI must not be claimed by the still-image codec")
    val frames = codec.decodeFrames(avi).get
    assert(frames.size == 3)
    val still = Multimodal.ImageIoCodec.decode(jpegs.head).get
    assert(frames.head.sameElements(still.gray),
      "AVI frame 0 and the standalone JPEG must share the canonical raster")
    val img = codec.decodeImage(avi).get
    assert(img.width == 64 && img.height == 48)
    assert(Multimodal.dHash64(img.gray, img.width, img.height) ==
      Multimodal.dHash64(still.gray, still.width, still.height))
    // truncated/corrupt containers degrade
    assert(codec.decodeFrames(avi.take(30)).isEmpty)
    assert(codec.decodeFrames(mjpegAvi(Seq("nope".getBytes))).isEmpty)
  }

  // ------------------------------------------------------------ fuzzing

  test("hostile-bytes fuzz: no codec path ever throws — random bytes, " +
    "bit-flipped valid payloads, truncations, and header-boundary cuts") {
    val rng = new scala.util.Random(42)
    val codecs = CompressedCodecs.installed
    val validA = imaWav(Array(sine(4040, 8000, 300.0, 0.5)), 8000)
    val validV = mjpegAvi(Seq(jpegBytes(0), jpegBytes(1)))
    def exercise(p: Array[Byte]): Unit = {
      codecs.foreach { c =>
        if (c.sniff(p)) { c.decode(p); c.decodeFrames(p)
          c.decodeImage(p); c.decodeAudio(p) }
      }
      Multimodal.ImageIoCodec.decode(p)
      WavAudioCodec.decode(p)
      ()
    }
    // pure noise, sometimes dressed in magic prefixes
    (0 until 60).foreach { i =>
      val n = rng.nextInt(4000)
      val p = new Array[Byte](n); rng.nextBytes(p)
      if (i % 3 == 0 && n >= 12) {
        "RIFF".getBytes.copyToArray(p, 0)
        (if (i % 2 == 0) "WAVE" else "AVI ").getBytes.copyToArray(p, 8)
      }
      exercise(p)
    }
    // bit flips and truncations of genuinely valid payloads — the
    // nastiest corpus: passes the sniff, corrupt inside
    Seq(validA, validV).foreach { v =>
      (0 until 40).foreach { _ =>
        val p = v.clone()
        (0 until 1 + rng.nextInt(8)).foreach { _ =>
          val at = rng.nextInt(p.length)
          p(at) = (p(at) ^ (1 << rng.nextInt(8))).toByte
        }
        exercise(p)
      }
      (0 until 40).foreach(i =>
        exercise(v.take(math.max(1, v.length * i / 40))))
    }
  }

  // ------------------------------------------------- Spark-side wiring

  test("Multimodal stages dispatch compressed payloads end-to-end " +
    "(features, fingerprints, frame lens)") {
    import spark.implicits._
    val rate = 8000
    val mono = sine(16160, rate, 220.0, 0.6)
    val adpcm = imaWav(Array(mono), rate)
    val jpegs = Seq(jpegBytes(0), jpegBytes(1), jpegBytes(2))
    val avi = mjpegAvi(jpegs)
    val trimmedAvi = mjpegAvi(jpegs.take(2)) // a trimmed re-mux copy
    val media = Seq(
      (1L, "audio", adpcm, 0, 0, rate),
      (2L, "video", avi, 0, 0, 0),
      (3L, "video", trimmedAvi, 0, 0, 0),
      (4L, "text", "just some text payload".getBytes, 0, 0, 0))
      .toDF("media_id", "modality", "payload", "width", "height",
        "sample_rate")
    val feats = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.media_id -> f).toMap
    // audio: canonical stream is 2 bytes per decoded sample
    assert(feats(1L).n_bytes >= mono.length * 2L)
    // video: decoded stream is the concatenated 64x48 rasters, and the
    // reported dims are the decoded first frame's
    assert(feats(2L).n_bytes == 3L * 64 * 48)
    assert(feats(2L).width == 64 && feats(2L).height == 48)
    assert(feats(4L).n_bytes == "just some text payload".length.toLong)

    // perceptual fingerprints: ADPCM clip == PCM clip; AVI == its own
    // first frame as a plain JPEG
    val pcmMedia = Seq(
      (11L, "audio", pcmWav(mono, rate), 0, 0, rate),
      (12L, "image", jpegs.head, 0, 0, 0))
      .toDF("media_id", "modality", "payload", "width", "height",
        "sample_rate")
    val fps = Multimodal.fingerprints(spark, media.unionByName(pcmMedia))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(11L)) <= 4,
      "ADPCM and PCM encodings of one clip must bucket together " +
        "(hamming <= the dedup radius)")
    assert(fps(2L) == fps(12L),
      "MJPEG first frame and the standalone JPEG must share the dHash")

    // frame lens: the trimmed AVI's frame set is a strict subset
    val hexes = Multimodal.frameHexes(spark, media, everyN = 64)
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(hexes(2L).size == 3 && hexes(3L).size == 2)
    assert(hexes(3L).subsetOf(hexes(2L)),
      "a trimmed MJPEG copy must share its frames with the original")
  }

  // -------------------------------------------------------------- FLAC

  /** Deterministic pseudo-random 16-bit signal (seeded, no
    * Math.random) with full-range excursions — the worst case for a
    * fixed predictor, so residual paths get real work. */
  private def flacSignal(n: Int, seed: Int): Array[Int] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)(rng.nextInt(65536) - 32768)
  }

  test("ServiceLoader discovers the FLAC codec alongside the others") {
    assert(CompressedCodecs.installed.map(_.name).contains("flac"))
  }

  test("FLAC is LOSSLESS through every subframe strategy: encode ->" +
    " decode reproduces the signal bit-exactly (CRC- and MD5-sealed)") {
    import graft.ext.FlacCodec
    val codec = new FlacCodec
    val s = flacSignal(3000, 11) // 3000 = 2 full 1024-blocks + short last
    for (order <- Seq(-1, 0, 1, 2, 3, 4); po <- Seq(0, 2)) {
      val p = FlacCodec.syntheticStream(44100, Array(s),
        blockSize = 1024, fixedOrder = order, partitionOrder = po)
      assert(codec.sniff(p), s"sniff order=$order po=$po")
      val d = codec.decodeAudio(p).getOrElse(
        fail(s"decode failed order=$order po=$po"))
      assert(d.sampleRate === 44100 && d.channels === 1)
      assert(d.mono.length === s.length)
      assert(d.mono.map(_.toInt).sameElements(s),
        s"lossless violated at order=$order po=$po")
    }
  }

  test("FLAC stereo: all four channel assignments reconstruct the " +
    "same signal (decoded mono = truncating channel average)") {
    import graft.ext.FlacCodec
    val codec = new FlacCodec
    val l = flacSignal(2500, 21)
    val r = flacSignal(2500, 22)
    val expect = l.indices.map { i =>
      ((l(i).toLong + r(i)) / 2).toShort }.toArray
    for (mode <- Seq("independent", "left-side", "right-side",
      "mid-side")) {
      val p = FlacCodec.syntheticStream(32000, Array(l, r),
        blockSize = 512, fixedOrder = 2, assignment = mode)
      val d = codec.decodeAudio(p).getOrElse(fail(s"decode failed $mode"))
      assert(d.channels === 2 && d.sampleRate === 32000)
      assert(d.mono.sameElements(expect), s"assignment $mode diverged")
    }
  }

  test("FLAC constant blocks encode CONSTANT subframes and decode " +
    "exactly; probe reads STREAMINFO without touching a residual") {
    import graft.ext.FlacCodec
    val codec = new FlacCodec
    val s = Array.fill(2048)(-12345)
    val p = FlacCodec.syntheticStream(48000, Array(s), blockSize = 1024)
    val d = codec.decodeAudio(p).get
    assert(d.mono.forall(_ === -12345))
    val pr = codec.probe(p).get
    assert(pr.codec === "flac")
    assert(pr.sampleRate === 48000)
    assert(pr.nSamples === 2048L)
    assert(pr.nFrames === 2L)
    assert(pr.bitrateKbps ===
      math.round(p.length * 8.0 * 48000 / 2048.0 / 1000.0).toInt)
  }

  test("a FLAC master and its WAV export decode to the SAME mono " +
    "stream and the SAME envelope fingerprint - exactly, not within " +
    "a radius, because the codec is lossless") {
    import graft.ext.FlacCodec
    val s = flacSignal(8000, 33)
    val flac = FlacCodec.syntheticStream(8000, Array(s),
      blockSize = 2048, fixedOrder = 2)
    val viaFlac = new FlacCodec().decodeAudio(flac).get
    // the same PCM as a WAV container, through the JDK path
    val shorts = s.map(_.toShort)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val raw = new Array[Byte](shorts.length * 2)
    shorts.indices.foreach { i =>
      raw(2 * i) = (shorts(i) & 0xff).toByte
      raw(2 * i + 1) = ((shorts(i) >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, shorts.length),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val viaWav = WavAudioCodec.decode(bos.toByteArray).get
    assert(viaFlac.mono.sameElements(viaWav.mono),
      "FLAC and WAV decode of the same PCM diverged")
    assert(WavAudioCodec.aHash64(viaFlac.mono) ===
      WavAudioCodec.aHash64(viaWav.mono))
  }

  test("FLAC hostility: truncations and bit flips degrade to None " +
    "(CRC/MD5 catch corruption), random bytes never sniff, nothing " +
    "throws, and the header-enforced sample budget rejects early") {
    import graft.ext.FlacCodec
    val codec = new FlacCodec
    val s = flacSignal(2200, 44)
    val valid = FlacCodec.syntheticStream(44100, Array(s),
      blockSize = 512, fixedOrder = 1)
    assert(codec.decodeAudio(valid).isDefined)
    // truncation sweep: every cut decodes to None (lossless = all or
    // nothing), never throws
    (1 until 30).foreach { i =>
      val cut = valid.take(math.max(1, valid.length * i / 30))
      assert(codec.decodeAudio(cut).isEmpty, s"cut $i decoded")
    }
    // bit flips anywhere in frame data must fail a CRC -> None; flips
    // in metadata may survive parse but must never throw
    val rng = new scala.util.Random(9)
    (0 until 60).foreach { _ =>
      val p = valid.clone()
      val at = rng.nextInt(p.length)
      p(at) = (p(at) ^ (1 << rng.nextInt(8))).toByte
      if (codec.sniff(p)) { codec.decodeAudio(p); codec.probe(p) }
      ()
    }
    // a flip INSIDE frame payload bytes (past metadata: magic 4 +
    // header 4 + streaminfo 34 = byte 42+) must be caught
    (42 until valid.length by 97).foreach { at =>
      val p = valid.clone()
      p(at) = (p(at) ^ 0x10).toByte
      assert(codec.decodeAudio(p).isEmpty, s"flip at $at not caught")
    }
    // random bytes never sniff
    (0 until 40).foreach { _ =>
      val p = new Array[Byte](rng.nextInt(500)); rng.nextBytes(p)
      if (codec.sniff(p)) { codec.decodeAudio(p); codec.probe(p) }
      ()
    }
    // header-enforced budget: a STREAMINFO claiming more samples than
    // the budget is rejected before any buffer allocates
    val before = WavAudioCodec.oversizeRejected.get()
    val big = valid.clone()
    // totalSamples is the low 36 bits of streaminfo bytes 21..26
    // (offset 4+4+13=21): force a huge count
    big(22) = 0x7f.toByte // well past defaultMaxFrames
    assert(codec.decodeAudio(big).isEmpty)
    assert(WavAudioCodec.oversizeRejected.get() > before)
  }

  // ---------------------------------------------------------- MP4 boxes

  test("MP4 box probe inverts the synthetic constructor: audio rate/" +
    "samples, video frame count, media bitrate over audio duration") {
    import graft.ext.Mp4Codec
    val codec = new Mp4Codec
    for (sr <- Seq(8000, 16000, 32000); chunks <- Seq(3L, 9L);
         video <- Seq(None, Some(25L)); mdat <- Seq(0, 300)) {
      val nAudio = sr.toLong / 2 // half a second
      val p = Mp4Codec.syntheticMp4(sr, nAudio, chunks, video, mdat)
      assert(codec.sniff(p), s"sniff sr=$sr video=$video")
      val pr = codec.probe(p).get
      assert(pr.codec === "mp4-boxes")
      assert(pr.sampleRate === sr)
      assert(pr.nSamples === nAudio)
      assert(pr.nFrames === video.getOrElse(chunks))
      assert(pr.bitrateKbps ===
        math.round(mdat * 8.0 * sr / nAudio.toDouble / 1000.0).toInt)
    }
    // decode stays the declared extension point (triage only)
    val p = Mp4Codec.syntheticMp4(8000, 4000L, 4L, None, 100)
    val codec2 = new Mp4Codec
    assert(codec2.decode(p).isEmpty && codec2.decodeFrames(p).isEmpty)
  }

  test("MP4 probe hostility: truncations and lying box sizes degrade " +
    "(never throw, never allocate per declared size), garbage never " +
    "sniffs, ServiceLoader carries the codec") {
    import graft.ext.Mp4Codec
    assert(CompressedCodecs.installed.map(_.name).contains("mp4-boxes"))
    val codec = new Mp4Codec
    val valid = Mp4Codec.syntheticMp4(16000, 8000L, 8L, Some(30L), 200)
    assert(codec.probe(valid).isDefined)
    (1 until 30).foreach { i =>
      val cut = valid.take(math.max(1, valid.length * i / 30))
      codec.probe(cut) // Some or None — must not throw
      ()
    }
    val rng = new scala.util.Random(17)
    (0 until 80).foreach { _ =>
      val p = valid.clone()
      val at = rng.nextInt(p.length)
      p(at) = (p(at) ^ (1 << rng.nextInt(8))).toByte
      if (codec.sniff(p)) { codec.probe(p); () }
    }
    // a box claiming 2 GB must end the walk, not allocate
    val lying = valid.clone()
    lying(0) = 0x7f.toByte // first box size -> huge
    codec.probe(lying)
    (0 until 40).foreach { _ =>
      val p = new Array[Byte](rng.nextInt(400)); rng.nextBytes(p)
      if (codec.sniff(p)) { codec.probe(p); () }
    }
  }

  test("the caller-side budget backstop binds for a codec that ignores " +
    "the budgeted SPI overloads: oversize audio rejects and counts, " +
    "in-budget results pass through") {
    import graft.ext.CompressedCodec
    // a rogue jar-drop codec: budgeted overloads inherit the defaults,
    // which DELEGATE to the unbudgeted forms — exactly the unprotected
    // path the backstop closes
    class RogueCodec(frames: Int) extends CompressedCodec {
      def name = "rogue"
      def sniff(p: Array[Byte]) = true
      def decode(p: Array[Byte]): Option[Array[Byte]] =
        Some(new Array[Byte](frames * 2))
      def decodeFrames(p: Array[Byte]): Option[Seq[Array[Byte]]] = None
      override def decodeAudio(p: Array[Byte])
          : Option[WavAudioCodec.DecodedAudio] =
        Some(WavAudioCodec.DecodedAudio(44100, 1, new Array[Short](frames)))
    }
    val payload = Array[Byte](1, 2, 3)
    val before = WavAudioCodec.oversizeRejected.get()
    // mono length over the budget → rejected + counted, regardless of
    // the codec having ignored maxFrames
    assert(Multimodal.budgetedAudio(new RogueCodec(2000), payload,
      maxFrames = 1000).isEmpty)
    assert(WavAudioCodec.oversizeRejected.get() === before + 1)
    // in-budget passes through untouched
    assert(Multimodal.budgetedAudio(new RogueCodec(500), payload,
      maxFrames = 1000).exists(_.mono.length == 500))
    // byte seam: output beyond BOTH budgets (2x frames, pixels) rejects
    assert(Multimodal.budgetedDecode(new RogueCodec(2000), payload,
      maxFrames = 100, maxPixels = 100).isEmpty)
    assert(WavAudioCodec.oversizeRejected.get() === before + 2)
    // a visual-sized result under the pixel budget survives even when
    // it exceeds 2x maxFrames (the SPI carries no modality marker)
    assert(Multimodal.budgetedDecode(new RogueCodec(2000), payload,
      maxFrames = 100, maxPixels = 8192).exists(_.length == 4000))
  }
}
