package graft.operators

/** Pure-JVM codecs for REAL media containers — the formats a
  * zero-dependency environment can decode honestly:
  *
  *   - PPM (P6): `P6 <w> <h> <maxval>` header (ASCII tokens, `#`
  *     comments, arbitrary whitespace) + w·h RGB byte triples.
  *   - PNG (ISO/IEC 15948): signature + CRC-checked chunk walk
  *     (IHDR/IDAT/IEND), zlib-DEFLATE via `java.util.zip`
  *     Inflater/Deflater, and all five scanline filters (None/Sub/Up/
  *     Average/Paeth) — a COMPRESSED real-world format, decoded
  *     pure-JDK from the public spec.
  *   - WAV (RIFF little-endian): `RIFF....WAVE` + a chunk walk over
  *     `fmt ` (channels / sample-rate / bits) and `data` (PCM samples),
  *     honoring word alignment and ignoring unknown chunks (LIST etc.).
  *   - Y4M (YUV4MPEG2): ASCII stream header with `W`/`H` parameters,
  *     then `FRAME`-delimited 4:2:0 planar frames of w·h·3/2 bytes.
  *
  * Each decoder PARSES real bytes (magic, header grammar, chunk/frame
  * structure, checksums) — nothing is inferred from out-of-band
  * metadata — and each encoder emits spec-conformant bytes, so
  * encode→decode round-trips are exact and a foreign tool's output of
  * the same format parses too. Entropy-coded formats beyond DEFLATE
  * (JPEG/MP3/H.264) remain out of scope: those coders are library
  * territory, and the pipeline treats this module as the swap point
  * for a JNI-backed codec at deployment.
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

  // ---- PNG (8-bit RGB, ISO/IEC 15948) --------------------------------------

  private val PNG_SIG: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  /** Paeth predictor (PNG spec §9.4): closest of left/up/up-left to
    * a + b − c, ties resolved left, up, up-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def pngChunk(out: java.io.ByteArrayOutputStream, typ: String,
                       data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    putBe32(len, 0, data.length)
    out.write(len)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    val cb = new Array[Byte](4)
    putBe32(cb, 0, crc.getValue.toInt)
    out.write(cb)
  }

  /** 8-bit RGB (color type 2) PNG. The row filter cycles through ALL
    * FIVE spec filters (row y uses type y mod 5), so a single
    * encode→decode round-trip exercises every de-filter path — an
    * encoder picking filters per-row is exactly what real tools do
    * (they pick by heuristic; we pick deterministically). */
  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"PNG payload ${rgb.length} != ${w * h * 3}")
    val bpp = 3
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      var i = 0
      while (i < stride) {
        val cur = rgb(y * stride + i) & 0xff
        val left = if (i >= bpp) rgb(y * stride + i - bpp) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp) rgb((y - 1) * stride + i - bpp) & 0xff else 0
        val filtered = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case _ => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + i) = filtered.toByte
        i += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    deflater.setInput(raw)
    deflater.finish()
    val zout = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w); putBe32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    // ihdr(10..12): compression 0, filter method 0, no interlace
    val out = new java.io.ByteArrayOutputStream(zout.size() + 128)
    out.write(PNG_SIG)
    pngChunk(out, "IHDR", ihdr)
    pngChunk(out, "IDAT", zout.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Full PNG parse: signature, CRC-verified chunk walk, multi-IDAT
    * concatenation, Inflater decompress, per-scanline de-filter (all
    * five types). Supports the deployment-realistic core: 8-bit
    * truecolor (color type 2), no interlace — anything else raises
    * (the caller's skip-and-count catch treats it as corrupt). */
  def decodePng(b: Array[Byte]): Decoded = {
    require(b.length >= 8 && (0 until 8).forall(i => b(i) == PNG_SIG(i)),
      "not a PNG stream")
    var i = 8
    var w = 0; var h = 0
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (i + 8 <= b.length && !sawIend) {
      val len = be32(b, i)
      require(len >= 0 && i + 12 + len <= b.length,
        s"truncated PNG chunk at offset $i")
      val typ = new String(b, i + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(b, i + 4, 4 + len)
      require(crc.getValue.toInt == be32(b, i + 8 + len),
        s"PNG $typ chunk CRC mismatch")
      typ match {
        case "IHDR" =>
          require(!sawIhdr && len == 13, "bad IHDR")
          w = be32(b, i + 8); h = be32(b, i + 12)
          require(w > 0 && h > 0, s"bad PNG dims ${w}x$h")
          require(b(i + 16) == 8, s"unsupported PNG bit depth ${b(i + 16)}")
          require(b(i + 17) == 2, s"unsupported PNG color type ${b(i + 17)}")
          require(b(i + 18) == 0 && b(i + 19) == 0,
            "unsupported PNG compression/filter method")
          require(b(i + 20) == 0, "interlaced PNG unsupported")
          sawIhdr = true
        case "IDAT" =>
          require(sawIhdr, "IDAT before IHDR")
          idat.write(b, i + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks (tEXt, pHYs, ...) skip
      }
      i += 12 + len
    }
    require(sawIhdr && sawIend, "PNG missing IHDR or IEND")
    val bpp = 3
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, off, raw.length - off)
      require(n > 0 || inflater.finished(),
        if (inflater.needsInput()) "truncated PNG IDAT stream"
        else "PNG inflate stalled")
      off += n
    }
    inflater.end()
    require(off == raw.length,
      s"PNG pixel data short: $off of ${raw.length} bytes")
    val rgb = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      require(ft <= 4, s"bad PNG filter type $ft on row $y")
      var x = 0
      while (x < stride) {
        val f = raw(y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= bpp) rgb(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) rgb((y - 1) * stride + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case _ => f + paeth(left, up, ul)
        }
        rgb(y * stride + x) = v.toByte
        x += 1
      }
      y += 1
    }
    Decoded("image", w, h, 1, rgb)
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
    else if (b.length >= 8 && (0 until 8).forall(i => b(i) == PNG_SIG(i)))
      decodePng(b)
    else if (b.length >= 4 && new String(b, 0, 4, "US-ASCII") == "RIFF")
      decodeWav(b)
    else if (b.length >= 9 && new String(b, 0, 9, "US-ASCII") == "YUV4MPEG2")
      decodeY4m(b)
    else sys.error("unrecognized media container magic")
  }
}
