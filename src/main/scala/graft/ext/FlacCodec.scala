package graft.ext

/** FLAC decoder (RFC 9639) — the real compressed-audio PCM path
  * through the [[CompressedCodec]] SPI, from scratch with zero new
  * dependencies.
  *
  * Why FLAC and not MP3 for the PCM milestone: FLAC's entire
  * normative surface is CLOSED-FORM — fixed-predictor coefficients
  * are binomial, LPC restoration is stated arithmetic, Rice coding is
  * a two-line bijection, and the CRC/MD5 polynomials are named
  * constants — so a from-scratch implementation can be verified
  * BIT-EXACTLY (lossless: decoded PCM must equal the encoder's input
  * to the last sample, enforced by CRC-16 per frame and the
  * STREAMINFO MD5 over the whole stream).  MPEG-1 Layer III synthesis
  * instead requires the ISO 11172-3 tabulated constants (the
  * 512-coefficient synthesis window of Table B.3 and the 34 Huffman
  * code tables of B.7) which have NO closed form; reproducing them
  * from memory would be silently lossy — strictly worse than the
  * declared extension point, which [[Mp3FrameCodec]] keeps (triage
  * probe real, PCM synthesis a jar-drop).  FLAC is also a genuine
  * crawl format: music/speech corpora ship it as the lossless master.
  *
  * Decoder subset = everything a conforming encoder can emit for
  * integer PCM streams: all four subframe types (CONSTANT, VERBATIM,
  * FIXED orders 0–4, LPC orders 1–32), wasted bits, both Rice methods
  * (4- and 5-bit parameters) with escape partitions, all four channel
  * assignments (independent, left/side, right/side, mid/side), fixed
  * and variable blocking, all block-size/sample-rate header codes,
  * UTF-8-style coded numbers, CRC-8 (poly 0x07) per frame header,
  * CRC-16 (poly 0x8005) per frame, and the STREAMINFO MD5 (verified
  * for byte-aligned bit depths).
  *
  * Output lands in [[WavAudioCodec.DecodedAudio]]'s canonical form
  * (16-bit mono at the source rate, channel-averaged with the same
  * truncating division), so a FLAC master and its WAV export
  * fingerprint identically — spec-pinned bit-for-bit, not within a
  * radius, because the codec is lossless.
  *
  * Hostility posture matches the other codecs: the sample budget is
  * enforced from STREAMINFO before any buffer allocates, every
  * malformed/truncated/bit-flipped payload degrades to None (a failed
  * CRC is corruption, not a crash), and the whole decode guards with
  * NonFatal.
  *
  * [[FlacCodec.syntheticStream]] is the matching from-scratch ENCODER
  * (fixed predictors + Rice; CONSTANT/VERBATIM where asked), kept
  * next to the parser so the bit layout has one source of truth for
  * WRITING and an independent table-driven path for READING — the
  * [[Mp3FrameCodec.syntheticStream]] pattern, here with the stronger
  * loop: encode→decode must reproduce the input EXACTLY.
  */
class FlacCodec extends CompressedCodec {
  import FlacCodec._

  override def name: String = "flac"

  override def sniff(p: Array[Byte]): Boolean =
    p.length > 42 && p(0) == 'f' && p(1) == 'L' && p(2) == 'a' &&
      p(3) == 'C'

  override def decode(p: Array[Byte]): Option[Array[Byte]] =
    decodeAudio(p).map(WavAudioCodec.canonicalBytes)

  override def decode(p: Array[Byte], maxFrames: Long): Option[Array[Byte]] =
    decodeAudio(p, maxFrames).map(WavAudioCodec.canonicalBytes)

  override def decodeFrames(p: Array[Byte]): Option[Seq[Array[Byte]]] =
    None // audio: callers chop the canonical stream

  override def decodeAudio(p: Array[Byte])
      : Option[WavAudioCodec.DecodedAudio] =
    decodeAudio(p, WavAudioCodec.defaultMaxFrames)

  override def decodeAudio(p: Array[Byte], maxFrames: Long)
      : Option[WavAudioCodec.DecodedAudio] =
    try decodePcm(p, maxFrames)
    catch { case scala.util.control.NonFatal(_) => None }

  /** STREAMINFO-only triage: exact sample count and rate without
    * touching a residual.  `nFrames` is the implied frame count for
    * fixed-blocksize streams (ceil(total / maxBlock)); `bitrateKbps`
    * the stream average over the whole payload. */
  override def probe(p: Array[Byte])
      : Option[CompressedCodecs.MediaProbe] =
    try parseHeader(p).map { case (si, _) =>
      val nf =
        if (si.totalSamples > 0 && si.maxBlock > 0)
          (si.totalSamples + si.maxBlock - 1) / si.maxBlock
        else 0L
      val kbps =
        if (si.totalSamples > 0 && si.sampleRate > 0)
          math.round(p.length * 8.0 * si.sampleRate /
            si.totalSamples.toDouble / 1000.0).toInt
        else 0
      CompressedCodecs.MediaProbe(name, nf, si.sampleRate, kbps,
        si.totalSamples)
    } catch { case scala.util.control.NonFatal(_) => None }
}

object FlacCodec {

  /** The STREAMINFO fields the decoder needs (RFC 9639 §8.2). */
  private[ext] case class StreamInfo(minBlock: Int, maxBlock: Int,
                                     sampleRate: Int, channels: Int,
                                     bps: Int, totalSamples: Long,
                                     md5: Array[Byte])

  // ------------------------------------------------------------ bits

  /** MSB-first bit cursor.  Out-of-range reads throw (caught by the
    * NonFatal guard at the decode entry — truncation is corruption);
    * nothing here allocates, so hostile bytes cannot bomb memory. */
  private final class BitCursor(p: Array[Byte]) {
    private var bitPos: Long = 0L
    def bytePos: Int = (bitPos >> 3).toInt
    def seekByte(b: Int): Unit = bitPos = b.toLong * 8
    def exhausted: Boolean = bitPos >= p.length.toLong * 8
    def readBit(): Int = {
      val b = (p((bitPos >> 3).toInt) >> (7 - (bitPos & 7).toInt)) & 1
      bitPos += 1
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Long = {
      val v = readBits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    /** Count of 0 bits before the terminating 1 (FLAC unary). */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
    def alignToByte(): Unit = bitPos = (bitPos + 7) & ~7L
  }

  /** MSB-first bit sink for the encoder. */
  private final class BitSink {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nb += 1
        if (nb == 8) { buf.write(cur); cur = 0; nb = 0 }
        i -= 1
      }
    }
    def alignZero(): Unit = if (nb != 0) writeBits(0L, 8 - nb)
    def toBytes: Array[Byte] = { alignZero(); buf.toByteArray }
  }

  // ------------------------------------------------------------ crcs

  /** CRC-8, poly 0x07, init 0 — the frame-header checksum. */
  private[ext] def crc8(p: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= p(i) & 0xff
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff
            else (c << 1) & 0xff
        k += 1
      }
      i += 1
    }
    c
  }

  /** CRC-16, poly 0x8005, init 0 — the whole-frame checksum. */
  private[ext] def crc16(p: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= (p(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
            else (c << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    c
  }

  // ------------------------------------------------------- container

  /** Parse the magic + metadata blocks; Some((streaminfo, first frame
    * byte offset)) iff the stream opens correctly. */
  private[ext] def parseHeader(p: Array[Byte])
      : Option[(StreamInfo, Int)] = {
    if (p.length < 42 || p(0) != 'f' || p(1) != 'L' || p(2) != 'a' ||
      p(3) != 'C') return None
    var off = 4
    var si: Option[StreamInfo] = None
    var last = false
    while (!last) {
      if (off + 4 > p.length) return None
      last = (p(off) & 0x80) != 0
      val btype = p(off) & 0x7f
      val len = ((p(off + 1) & 0xff) << 16) | ((p(off + 2) & 0xff) << 8) |
        (p(off + 3) & 0xff)
      val body = off + 4
      if (body + len > p.length) return None
      if (btype == 0) { // STREAMINFO
        if (len < 34) return None
        val br = new BitCursor(p)
        br.seekByte(body)
        val minB = br.readBits(16).toInt
        val maxB = br.readBits(16).toInt
        br.readBits(24); br.readBits(24) // min/max frame size (unused)
        val sr = br.readBits(20).toInt
        val ch = br.readBits(3).toInt + 1
        val bps = br.readBits(5).toInt + 1
        val total = br.readBits(36)
        val md5 = java.util.Arrays.copyOfRange(p, body + 18, body + 34)
        si = Some(StreamInfo(minB, maxB, sr, ch, bps, total, md5))
      }
      off = body + len
    }
    si.filter(s => s.sampleRate > 0 && s.channels >= 1 &&
        s.channels <= 8 && s.bps >= 4 && s.bps <= 32)
      .map(s => (s, off))
  }

  /** UTF-8-style coded number (frame/sample index); -1 = malformed. */
  private def readCodedNumber(br: BitCursor): Long = {
    val b0 = br.readBits(8).toInt
    if ((b0 & 0x80) == 0) return b0.toLong
    var ones = 0
    var m = 0x80
    while (m != 0 && (b0 & m) != 0) { ones += 1; m >>= 1 }
    if (ones < 2 || ones > 7) return -1L
    var v = (b0 & (0xff >>> (ones + 1))).toLong
    var i = 1
    while (i < ones) {
      val c = br.readBits(8).toInt
      if ((c & 0xc0) != 0x80) return -1L
      v = (v << 6) | (c & 0x3f)
      i += 1
    }
    v
  }

  // --------------------------------------------------------- decoder

  /** Full PCM decode to the canonical mono form.  None on ANY
    * inconsistency: bad sync, failed CRC-8/CRC-16, invalid subframe
    * type, sample count drifting from STREAMINFO, or (for byte-aligned
    * bit depths) an MD5 mismatch.  Lossless means there is no
    * "mostly decoded" — a FLAC payload either reproduces its signal
    * exactly or is corrupt. */
  private[ext] def decodePcm(p: Array[Byte], maxFrames: Long)
      : Option[WavAudioCodec.DecodedAudio] = {
    val (si, firstFrame) = parseHeader(p) match {
      case Some(x) => x
      case None => return None
    }
    if (si.totalSamples <= 0) return None // unbudgetable: refuse
    if (si.totalSamples > maxFrames) {
      WavAudioCodec.oversizeRejected.incrementAndGet()
      return None
    }
    val total = si.totalSamples.toInt
    val mono = new Array[Short](total)
    val md = java.security.MessageDigest.getInstance("MD5")
    val md5able = si.bps % 8 == 0
    val br = new BitCursor(p)
    br.seekByte(firstFrame)
    var done = 0
    while (done < total) {
      val frameStart = br.bytePos
      // ---- frame header
      if (br.readBits(14) != 0x3ffe) return None // sync
      if (br.readBit() != 0) return None         // reserved
      br.readBit()                                // blocking strategy
      val bsCode = br.readBits(4).toInt
      val srCode = br.readBits(4).toInt
      val chanAsgn = br.readBits(4).toInt
      val ssCode = br.readBits(3).toInt
      if (br.readBit() != 0) return None          // reserved
      if (readCodedNumber(br) < 0) return None
      val blockSize = bsCode match {
        case 0 => return None
        case 1 => 192
        case c if c <= 5 => 576 << (c - 2)
        case 6 => br.readBits(8).toInt + 1
        case 7 => br.readBits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match { // consume explicit rate bits; value: streaminfo's
        case 12 => br.readBits(8)
        case 13 | 14 => br.readBits(16)
        case 15 => return None
        case _ => ()
      }
      if (crc8(p, frameStart, br.bytePos) != br.readBits(8).toInt)
        return None
      if (done + blockSize > total) return None
      val bps = ssCode match {
        case 0 => si.bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => return None
      }
      val nCh = if (chanAsgn < 8) chanAsgn + 1
                else if (chanAsgn <= 10) 2
                else return None
      if (chanAsgn < 8 && nCh != si.channels) return None
      if (chanAsgn >= 8 && si.channels != 2) return None
      // ---- subframes (side channels carry one extra bit)
      val chans = new Array[Array[Long]](nCh)
      var c = 0
      while (c < nCh) {
        val extra = chanAsgn match {
          case 8 => if (c == 1) 1 else 0  // left/side
          case 9 => if (c == 0) 1 else 0  // side/right
          case 10 => if (c == 1) 1 else 0 // mid/side
          case _ => 0
        }
        chans(c) = decodeSubframe(br, blockSize, bps + extra) match {
          case Some(s) => s
          case None => return None
        }
        c += 1
      }
      // ---- stereo decorrelation (side = left - right)
      val pcm: Array[Array[Long]] = chanAsgn match {
        case 8 =>
          val l = chans(0); val s = chans(1)
          Array(l, Array.tabulate(blockSize)(i => l(i) - s(i)))
        case 9 =>
          val s = chans(0); val r = chans(1)
          Array(Array.tabulate(blockSize)(i => r(i) + s(i)), r)
        case 10 =>
          val m = chans(0); val s = chans(1)
          val l = Array.tabulate(blockSize) { i =>
            (((m(i) << 1) | (s(i) & 1L)) + s(i)) >> 1
          }
          val r = Array.tabulate(blockSize)(i => l(i) - s(i))
          Array(l, r)
        case _ => chans
      }
      // ---- frame footer
      br.alignToByte()
      if (crc16(p, frameStart, br.bytePos) != br.readBits(16).toInt)
        return None
      // ---- canonicalize: per-sample 16-bit scale, channel average
      val outCh = pcm.length
      var i = 0
      while (i < blockSize) {
        var acc = 0L
        var cc = 0
        while (cc < outCh) {
          val v = pcm(cc)(i)
          acc += (if (bps == 16) v
                  else if (bps > 16) v >> (bps - 16)
                  else v << (16 - bps))
          cc += 1
        }
        mono(done + i) = (acc / outCh).toShort
        i += 1
      }
      if (md5able) {
        val bytesPer = bps / 8
        val buf = new Array[Byte](blockSize * outCh * bytesPer)
        var bi = 0
        i = 0
        while (i < blockSize) {
          var cc = 0
          while (cc < outCh) {
            val v = pcm(cc)(i)
            var b = 0
            while (b < bytesPer) {
              buf(bi) = ((v >> (8 * b)) & 0xff).toByte
              bi += 1
              b += 1
            }
            cc += 1
          }
          i += 1
        }
        md.update(buf)
      }
      done += blockSize
    }
    if (md5able && si.md5.exists(_ != 0) &&
      !java.util.Arrays.equals(md.digest(), si.md5)) return None
    Some(WavAudioCodec.DecodedAudio(si.sampleRate, si.channels, mono))
  }

  /** One subframe → `blockSize` samples at `bps` bits (before
    * decorrelation); None on any malformed field. */
  private def decodeSubframe(br: BitCursor, blockSize: Int,
                             bps: Int): Option[Array[Long]] = {
    if (br.readBit() != 0) return None // padding bit
    val tpe = br.readBits(6).toInt
    val wasted =
      if (br.readBit() == 1) br.readUnary() + 1 else 0
    val eb = bps - wasted
    if (eb <= 0) return None
    val out: Array[Long] =
      if (tpe == 0) { // CONSTANT
        val v = br.readSigned(eb)
        Array.fill(blockSize)(v)
      } else if (tpe == 1) { // VERBATIM
        Array.fill(blockSize)(br.readSigned(eb))
      } else if (tpe >= 8 && tpe <= 12) { // FIXED order 0..4
        val order = tpe - 8
        if (order > blockSize) return None
        val s = new Array[Long](blockSize)
        var i = 0
        while (i < order) { s(i) = br.readSigned(eb); i += 1 }
        val res = decodeResidual(br, blockSize, order) match {
          case Some(r) => r
          case None => return None
        }
        while (i < blockSize) {
          val r = res(i - order)
          s(i) = order match {
            case 0 => r
            case 1 => r + s(i - 1)
            case 2 => r + 2 * s(i - 1) - s(i - 2)
            case 3 => r + 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
            case _ => r + 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) -
              s(i - 4)
          }
          i += 1
        }
        s
      } else if (tpe >= 32) { // LPC order 1..32
        val order = tpe - 31
        if (order > blockSize) return None
        val s = new Array[Long](blockSize)
        var i = 0
        while (i < order) { s(i) = br.readSigned(eb); i += 1 }
        val prec = br.readBits(4).toInt + 1
        if (prec == 16) return None // 0b1111 is invalid
        val shift = br.readSigned(5).toInt
        if (shift < 0) return None
        val coef = new Array[Long](order)
        var j = 0
        while (j < order) { coef(j) = br.readSigned(prec); j += 1 }
        val res = decodeResidual(br, blockSize, order) match {
          case Some(r) => r
          case None => return None
        }
        while (i < blockSize) {
          var acc = 0L
          j = 0
          while (j < order) { acc += coef(j) * s(i - 1 - j); j += 1 }
          s(i) = res(i - order) + (acc >> shift)
          i += 1
        }
        s
      } else return None
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) = out(i) << wasted; i += 1 }
    }
    Some(out)
  }

  /** Rice-coded residual: 2-bit method (4- or 5-bit parameters), 4-bit
    * partition order, escape partitions stored raw. */
  private def decodeResidual(br: BitCursor, blockSize: Int,
                             order: Int): Option[Array[Long]] = {
    val method = br.readBits(2).toInt
    if (method > 1) return None
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val partOrder = br.readBits(4).toInt
    val nParts = 1 << partOrder
    if (blockSize % nParts != 0) return None
    val perPart = blockSize >> partOrder
    if (perPart <= order && partOrder > 0) return None
    if (perPart < order) return None
    val out = new Array[Long](blockSize - order)
    var w = 0
    var pi = 0
    while (pi < nParts) {
      val n = if (pi == 0) perPart - order else perPart
      val param = br.readBits(pBits).toInt
      if (param == escape) {
        val raw = br.readBits(5).toInt
        var i = 0
        while (i < n) {
          out(w) = if (raw == 0) 0L else br.readSigned(raw)
          w += 1
          i += 1
        }
      } else {
        var i = 0
        while (i < n) {
          val q = br.readUnary().toLong
          val u = (q << param) | br.readBits(param)
          out(w) = (u >>> 1) ^ -(u & 1L) // unzigzag
          w += 1
          i += 1
        }
      }
      pi += 1
    }
    Some(out)
  }

  // --------------------------------------------------------- encoder

  /** Deterministic FLAC encoder — the test/injection constructor the
    * decoder must invert EXACTLY (lossless round-trip, CRC- and
    * MD5-sealed).  16-bit input samples, one subframe strategy per
    * call:
    *
    *  - `fixedOrder` 0–4: FIXED predictor of that order (clamped to
    *    the block), Rice residual with per-partition parameters;
    *  - `fixedOrder` -1: VERBATIM;
    *  - blocks whose samples are all equal encode CONSTANT regardless.
    *
    * `assignment` (stereo only): "independent", "left-side",
    * "right-side", "mid-side" — all four reconstruct to the same
    * signal, which is exactly what the spec pins. */
  def syntheticStream(sampleRate: Int, channels: Array[Array[Int]],
                      blockSize: Int = 1024, fixedOrder: Int = 1,
                      assignment: String = "independent",
                      partitionOrder: Int = 0): Array[Byte] = {
    val nCh = channels.length
    require(nCh == 1 || nCh == 2, s"1 or 2 channels (got $nCh)")
    require(channels.forall(_.length == channels(0).length),
      "channels must be equal length")
    require(sampleRate > 0 && sampleRate <= 65535,
      "encoder emits the 16-bit Hz rate code: rate must be <= 65535")
    require(fixedOrder >= -1 && fixedOrder <= 4, "fixedOrder in -1..4")
    // 65535, not 65536: STREAMINFO's min/max block-size fields are
    // 16-bit (RFC 9639 §8.2) — writeBits(65536, 16) would silently
    // truncate the declared block size to 0, an out-of-spec stream
    // (round-15 ADVICE)
    require(blockSize >= 1 && blockSize <= 65535, "blockSize in 1..65535")
    val modes = Set("independent", "left-side", "right-side", "mid-side")
    require(modes.contains(assignment), s"assignment in $modes")
    require(nCh == 2 || assignment == "independent",
      "stereo assignments need 2 channels")
    channels.foreach(_.foreach(v => require(
      v >= Short.MinValue && v <= Short.MaxValue, "16-bit samples")))
    val total = channels(0).length
    require(total > 0, "empty signal")

    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last metadata block)
    val md = java.security.MessageDigest.getInstance("MD5")
    val md5buf = new Array[Byte](total * nCh * 2)
    var bi = 0
    var i = 0
    while (i < total) {
      var c = 0
      while (c < nCh) {
        val v = channels(c)(i)
        md5buf(bi) = (v & 0xff).toByte
        md5buf(bi + 1) = ((v >> 8) & 0xff).toByte
        bi += 2
        c += 1
      }
      i += 1
    }
    md.update(md5buf)
    val info = new BitSink
    info.writeBits(1L, 1)      // last-metadata-block
    info.writeBits(0L, 7)      // type STREAMINFO
    info.writeBits(34L, 24)    // length
    // fixed-blocksize stream: min == max (a shorter LAST block is
    // allowed under this declaration, per the spec's convention)
    val declBlock = math.min(blockSize, total).toLong
    info.writeBits(declBlock, 16) // min block
    info.writeBits(declBlock, 16) // max block
    info.writeBits(0L, 24); info.writeBits(0L, 24) // frame sizes unknown
    info.writeBits(sampleRate.toLong, 20)
    info.writeBits((nCh - 1).toLong, 3)
    info.writeBits(15L, 5)     // bps - 1 = 15 (16-bit)
    info.writeBits(total.toLong, 36)
    out.write(info.toBytes)
    out.write(md.digest())

    var frameNo = 0L
    var pos = 0
    while (pos < total) {
      val n = math.min(blockSize, total - pos)
      out.write(encodeFrame(channels, pos, n, sampleRate, frameNo,
        fixedOrder, assignment, partitionOrder))
      frameNo += 1
      pos += n
    }
    out.toByteArray
  }

  private def encodeFrame(channels: Array[Array[Int]], pos: Int, n: Int,
                          sampleRate: Int, frameNo: Long, fixedOrder: Int,
                          assignment: String,
                          partitionOrder: Int): Array[Byte] = {
    val nCh = channels.length
    val bs = new BitSink
    bs.writeBits(0x3ffeL, 14) // sync
    bs.writeBits(0L, 1)       // reserved
    bs.writeBits(0L, 1)       // fixed blocking
    bs.writeBits(7L, 4)       // block size: explicit 16-bit at end
    bs.writeBits(13L, 4)      // sample rate: explicit 16-bit Hz at end
    val asgn = assignment match {
      case "independent" => nCh - 1
      case "left-side" => 8
      case "right-side" => 9
      case "mid-side" => 10
    }
    bs.writeBits(asgn.toLong, 4)
    bs.writeBits(4L, 3)       // sample size: 16-bit
    bs.writeBits(0L, 1)       // reserved
    // coded number (UTF-8 style)
    if (frameNo < 0x80) bs.writeBits(frameNo, 8)
    else if (frameNo < 0x800) {
      bs.writeBits(0xc0L | (frameNo >> 6), 8)
      bs.writeBits(0x80L | (frameNo & 0x3f), 8)
    } else {
      require(frameNo < (1L << 16), "encoder frame count bound")
      bs.writeBits(0xe0L | (frameNo >> 12), 8)
      bs.writeBits(0x80L | ((frameNo >> 6) & 0x3f), 8)
      bs.writeBits(0x80L | (frameNo & 0x3f), 8)
    }
    bs.writeBits((n - 1).toLong, 16)          // explicit block size
    bs.writeBits(sampleRate.toLong, 16)       // explicit rate (Hz)
    val headerBytes = bs.toBytes // header is byte-aligned here
    bs.writeBits(crc8(headerBytes, 0, headerBytes.length).toLong, 8)
    // subframes (with stereo transforms; side channels carry bps+1)
    val subs: Array[(Array[Long], Int)] = {
      def slice(c: Int) =
        Array.tabulate(n)(i => channels(c)(pos + i).toLong)
      if (nCh == 1) Array((slice(0), 16))
      else asgn match {
        case 8 =>
          val l = slice(0); val r = slice(1)
          Array((l, 16), (Array.tabulate(n)(i => l(i) - r(i)), 17))
        case 9 =>
          val l = slice(0); val r = slice(1)
          Array((Array.tabulate(n)(i => l(i) - r(i)), 17), (r, 16))
        case 10 =>
          val l = slice(0); val r = slice(1)
          Array((Array.tabulate(n)(i => (l(i) + r(i)) >> 1), 16),
            (Array.tabulate(n)(i => l(i) - r(i)), 17))
        case _ => Array((slice(0), 16), (slice(1), 16))
      }
    }
    subs.foreach { case (s, bps) =>
      encodeSubframe(bs, s, bps, fixedOrder, partitionOrder)
    }
    bs.alignZero()
    val frameBytes = bs.toBytes
    bs.writeBits(crc16(frameBytes, 0, frameBytes.length).toLong, 16)
    bs.toBytes
  }

  private def encodeSubframe(bs: BitSink, s: Array[Long], bps: Int,
                             fixedOrder: Int,
                             partitionOrder: Int): Unit = {
    val n = s.length
    bs.writeBits(0L, 1) // padding
    if (s.forall(_ == s(0))) { // CONSTANT
      bs.writeBits(0L, 6)
      bs.writeBits(0L, 1) // no wasted bits
      bs.writeBits(s(0) & ((1L << bps) - 1), bps)
      return
    }
    if (fixedOrder < 0) { // VERBATIM
      bs.writeBits(1L, 6)
      bs.writeBits(0L, 1)
      s.foreach(v => bs.writeBits(v & ((1L << bps) - 1), bps))
      return
    }
    val order = math.min(fixedOrder, n - 1)
    bs.writeBits((8 + order).toLong, 6) // FIXED
    bs.writeBits(0L, 1)                 // no wasted bits
    var i = 0
    while (i < order) {
      bs.writeBits(s(i) & ((1L << bps) - 1), bps)
      i += 1
    }
    // residuals of the fixed predictor
    val res = new Array[Long](n - order)
    i = order
    while (i < n) {
      res(i - order) = order match {
        case 0 => s(i)
        case 1 => s(i) - s(i - 1)
        case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
        case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
        case _ => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) +
          s(i - 4)
      }
      i += 1
    }
    bs.writeBits(0L, 2) // method 0: 4-bit rice params
    val po = if (n % (1 << partitionOrder) == 0 &&
      (n >> partitionOrder) > order) partitionOrder else 0
    bs.writeBits(po.toLong, 4)
    val nParts = 1 << po
    val perPart = n >> po
    var w = 0
    var pi = 0
    while (pi < nParts) {
      val cnt = if (pi == 0) perPart - order else perPart
      // parameter: bound the worst-case quotient to ~2^5 per sample
      var maxZig = 0L
      var k = 0
      while (k < cnt) {
        val u = (res(w + k) << 1) ^ (res(w + k) >> 63)
        if (u > maxZig) maxZig = u
        k += 1
      }
      var param = 0
      while (param < 14 && (maxZig >>> param) > 31) param += 1
      bs.writeBits(param.toLong, 4)
      k = 0
      while (k < cnt) {
        val u = (res(w + k) << 1) ^ (res(w + k) >> 63)
        val q = u >>> param
        var z = 0L
        while (z < q) { bs.writeBits(0L, 1); z += 1 }
        bs.writeBits(1L, 1)
        bs.writeBits(u & ((1L << param) - 1), param)
        k += 1
      }
      w += cnt
      pi += 1
    }
  }
}
