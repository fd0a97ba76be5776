package graft.operators

/** Pure-JVM codecs for REAL media containers — the formats a
  * zero-dependency environment can decode honestly:
  *
  *   - PPM (P6): `P6 <w> <h> <maxval>` header (ASCII tokens, `#`
  *     comments, arbitrary whitespace) + w·h RGB byte triples.
  *   - WAV (RIFF little-endian): `RIFF....WAVE` + a chunk walk over
  *     `fmt ` (channels / sample-rate / bits) and `data` (PCM samples),
  *     honoring word alignment and ignoring unknown chunks (LIST etc.).
  *   - Y4M (YUV4MPEG2): ASCII stream header with `W`/`H` parameters,
  *     then `FRAME`-delimited 4:2:0 planar frames of w·h·3/2 bytes.
  *
  * Each decoder PARSES real bytes (magic, header grammar, chunk/frame
  * structure) — nothing is inferred from out-of-band metadata — and each
  * encoder emits spec-conformant bytes, so encode→decode round-trips are
  * exact and a foreign tool's output of the same format parses too.
  * Compressed formats (JPEG/MP3/H.264) remain out of scope: their
  * entropy coders are library territory, and the pipeline treats this
  * module as the swap point for a JNI-backed codec at deployment.
  */
object MediaCodecs {

  /** Uniform decode result: spatial dims (for audio: samples × channels),
    * frame count, and the raw CONTENT plane (pixel bytes / PCM samples /
    * concatenated YUV planes) downstream stages consume. */
  final case class Decoded(kind: String, width: Int, height: Int,
                           nFrames: Int, content: Array[Byte])

  // ---- PPM (P6) ------------------------------------------------------------

  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"PPM payload ${rgb.length} != ${w * h * 3}")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  def decodePpm(b: Array[Byte]): Decoded = {
    var i = 0
    def token(): String = {
      while (i < b.length &&
        (b(i) == '#' || Character.isWhitespace(b(i).toChar))) {
        if (b(i) == '#') while (i < b.length && b(i) != '\n') i += 1
        else i += 1
      }
      val st = i
      while (i < b.length && !Character.isWhitespace(b(i).toChar)) i += 1
      new String(b, st, i - st, "US-ASCII")
    }
    val magic = token()
    require(magic == "P6", s"not a binary PPM (magic $magic)")
    val w = token().toInt
    val h = token().toInt
    val maxv = token().toInt
    require(maxv == 255, s"unsupported PPM maxval $maxv")
    i += 1 // exactly ONE whitespace byte separates the header from pixels
    require(b.length - i >= w * h * 3,
      s"truncated PPM: ${b.length - i} of ${w * h * 3} pixel bytes")
    Decoded("image", w, h, 1, java.util.Arrays.copyOfRange(b, i, i + w * h * 3))
  }

  // ---- WAV (RIFF PCM) ------------------------------------------------------

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def putLe16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
  }
  private def putLe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
    b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
  }

  /** 8-bit mono PCM — the canonical 44-byte header + data chunk. */
  def encodeWav(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    val n = samples.length
    val out = new Array[Byte](44 + n)
    def ascii(i: Int, s: String): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, out, i, 4)
    ascii(0, "RIFF"); putLe32(out, 4, 36 + n); ascii(8, "WAVE")
    ascii(12, "fmt "); putLe32(out, 16, 16)
    putLe16(out, 20, 1) // PCM
    putLe16(out, 22, 1) // mono
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate) // byte rate = rate · 1 ch · 1 B
    putLe16(out, 32, 1) // block align
    putLe16(out, 34, 8) // bits per sample
    ascii(36, "data"); putLe32(out, 40, n)
    System.arraycopy(samples, 0, out, 44, n)
    out
  }

  def decodeWav(b: Array[Byte]): Decoded = {
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    require(b.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE stream")
    var i = 12
    var channels = 1
    var bytesPer = 1
    var data: Array[Byte] = null
    while (i + 8 <= b.length && data == null) {
      val id = tag(i)
      val sz = le32(b, i + 4)
      if (id == "fmt ") {
        channels = le16(b, i + 10)
        bytesPer = le16(b, i + 22) / 8
        require(le16(b, i + 8) == 1, "only PCM WAV supported")
      } else if (id == "data") {
        data = java.util.Arrays.copyOfRange(b, i + 8,
          math.min(b.length, i + 8 + sz))
      }
      i += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    require(data != null, "WAV stream has no data chunk")
    Decoded("audio", data.length / math.max(1, channels * bytesPer),
      channels, 1, data)
  }

  // ---- Y4M (YUV4MPEG2, C420) -----------------------------------------------

  def encodeY4m(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, "4:2:0 needs even dimensions")
    val fs = w * h * 3 / 2
    require(frames.forall(_.length == fs), s"each frame must be $fs bytes")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val fm = "FRAME\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + frames.size * (fm.length + fs))
    var o = header.length
    System.arraycopy(header, 0, out, 0, header.length)
    frames.foreach { f =>
      System.arraycopy(fm, 0, out, o, fm.length); o += fm.length
      System.arraycopy(f, 0, out, o, fs); o += fs
    }
    out
  }

  def decodeY4m(b: Array[Byte]): Decoded = {
    var i = 0
    def line(): String = {
      val st = i
      while (i < b.length && b(i) != '\n') i += 1
      val s = new String(b, st, i - st, "US-ASCII")
      i += 1
      s
    }
    val header = line()
    require(header.startsWith("YUV4MPEG2"), "not a YUV4MPEG2 stream")
    val params = header.split(' ').drop(1)
    def param(p: Char): Option[String] =
      params.find(t => t.nonEmpty && t.head == p).map(_.tail)
    val w = param('W').getOrElse(sys.error("Y4M missing W")).toInt
    val h = param('H').getOrElse(sys.error("Y4M missing H")).toInt
    require(param('C').forall(_.startsWith("420")),
      "only 4:2:0 Y4M supported")
    val fs = w * h * 3 / 2
    val content = new java.io.ByteArrayOutputStream()
    var n = 0
    while (i < b.length) {
      val fl = line()
      require(fl.startsWith("FRAME"), s"expected FRAME marker, got '$fl'")
      require(b.length - i >= fs, "truncated Y4M frame")
      content.write(b, i, fs)
      i += fs
      n += 1
    }
    Decoded("video", w, h, n, content.toByteArray)
  }

  /** Sniff the container by magic and dispatch — what a real ingest does
    * before handing the blob to a modality-specific decoder. */
  def decode(b: Array[Byte]): Decoded = {
    require(b.length >= 2, "payload too short for any magic")
    if (b(0) == 'P' && b(1) == '6') decodePpm(b)
    else if (b.length >= 4 && new String(b, 0, 4, "US-ASCII") == "RIFF")
      decodeWav(b)
    else if (b.length >= 9 && new String(b, 0, 9, "US-ASCII") == "YUV4MPEG2")
      decodeY4m(b)
    else sys.error("unrecognized media container magic")
  }
}
