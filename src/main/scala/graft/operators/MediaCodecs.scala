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
  *   - JPEG (ITU T.81 baseline sequential, 8-bit grayscale): marker
  *     walk, DQT/DHT parsing, canonical Huffman entropy decode with DC
  *     prediction, dequantize, inverse zigzag, IDCT — the dominant
  *     lossy crawl format, decoded pure-JDK from the public spec
  *     (cross-checked against javax.imageio in MultimodalSpec).
  *
  * Each decoder PARSES real bytes (magic, header grammar, chunk/frame
  * structure, checksums) — nothing is inferred from out-of-band
  * metadata — and each encoder emits spec-conformant bytes, so
  * encode→decode round-trips are exact (JPEG: exact for flat-block
  * fixtures under the all-ones quant table, within IDCT rounding
  * otherwise) and a foreign tool's output of the same format parses
  * too. Audio/video entropy coders (MP3/H.264) remain out of scope:
  * the pipeline treats this module as the swap point for a JNI-backed
  * codec at deployment.
  */
object MediaCodecs {

  /** Uniform decode result: spatial dims (for audio: samples × channels),
    * frame count, and the raw CONTENT plane (pixel bytes / PCM samples /
    * concatenated YUV planes) downstream stages consume. */
  final case class Decoded(kind: String, width: Int, height: Int,
                           nFrames: Int, content: Array[Byte])

  /** Decode allocation cap for header-declared image planes (64 M pixels
    * ≈ 192 MB RGB): PNG/JPEG size their output buffers from the HEADER,
    * not the input, so a forged header could otherwise demand gigabytes
    * and die with a fatal OutOfMemoryError instead of the catchable
    * exception the skip-and-count posture requires. */
  private val MAX_PIXELS = 1L << 26

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
    // long arithmetic + the shared pixel cap: `w * h * 3` in Int overflows
    // on a forged `P6 65536 65536` header (wraps to 0, "passes" the
    // truncation check, returns huge dims with empty content — ADVICE r11)
    require(w > 0 && h > 0 && w.toLong * h <= MAX_PIXELS,
      s"PPM dims ${w}x$h exceed the decode pixel cap")
    val need = w.toLong * h * 3
    require(b.length - i >= need,
      s"truncated PPM: ${b.length - i} of $need pixel bytes")
    Decoded("image", w, h, 1,
      java.util.Arrays.copyOfRange(b, i, i + need.toInt))
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
      // long arithmetic: a hostile len near 2^31 would wrap i+12+len
      // negative and sneak past an Int bound check, turning the intended
      // "truncated PNG chunk" failure into an arbitrary AIOOBE downstream
      require(len >= 0 && i.toLong + 12L + len <= b.length,
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
          // hostile-header allocation guard: the de-filter buffer is
          // sized from IHDR, not from the input — without a cap a forged
          // 65535x65535 header demands GBs BEFORE any data check, and an
          // OutOfMemoryError is fatal, not a skip-and-count exception
          require(w.toLong * h <= MAX_PIXELS,
            s"PNG dims ${w}x$h exceed the decode pixel cap")
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
    // same hostile-header posture as the image decoders: cap pixels
    // BEFORE sizing the frame, in long arithmetic (ADVICE r11)
    require(w > 0 && h > 0 && w.toLong * h <= MAX_PIXELS,
      s"Y4M dims ${w}x$h exceed the decode pixel cap")
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

  // ---- JPEG (baseline sequential DCT, ITU T.81) ----------------------------
  //
  // The one dominant crawl format PNG didn't cover. Scope mirrors what a
  // deployment-realistic minimal decoder needs: baseline sequential
  // (SOF0), 8-bit, single component (grayscale), no restart intervals —
  // anything else raises, and callers' skip-and-count catch treats it as
  // a foreign blob. Everything is pure JDK from the public spec: marker
  // walk, DQT/DHT parsing, canonical Huffman decode, DC prediction +
  // EXTEND, dequantize, inverse zigzag, double-precision IDCT.
  //
  // The encoder keeps entropy coding trivially correct rather than
  // maximally compact: canonical DHT with all 12 DC categories at 4 bits
  // and all 162 AC (run,size) symbols at 8 bits — spec-conformant
  // (the all-ones code of each length stays unused, as T.81 requires),
  // decodable by any reader (MultimodalSpec cross-checks against
  // javax.imageio), and free of a hand-transcribed Annex K table to get
  // wrong. Quantization is all-ones, so flat 8x8 blocks round-trip
  // BYTE-EXACTLY (DC = 8·(v−128) exact in doubles, AC analytically zero):
  // that is what lets q_jpeg_meta keep a hash-green DuckDB oracle on a
  // lossy format.

  /** Zig-zag order: zigzagOf(i) = raster index of the i-th coefficient
    * in transmission order (T.81 Figure 5), derived, not transcribed. */
  private val zigzag: Array[Int] = {
    val order = Array.ofDim[Int](64)
    var i = 0
    // walk anti-diagonals d = x+y, alternating direction
    for (d <- 0 until 15) {
      val pts = (0 to d).flatMap { y =>
        val x = d - y
        if (x < 8 && y < 8) Some((x, y)) else None
      }
      val run = if (d % 2 == 0) pts.reverse else pts // even diagonals go up
      run.foreach { case (x, y) => order(i) = y * 8 + x; i += 1 }
    }
    order
  }

  /** cos((2x+1)·u·π/16) table shared by the forward and inverse DCT. */
  private val dctCos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val invSqrt2 = 1.0 / math.sqrt(2.0)

  /** Canonical Huffman spec: (BITS counts per length 1..16, values).
    * DC: 12 categories at 4 bits. AC: 162 symbols at 8 bits (EOB, ZRL,
    * every (run 0-15, size 1-10)). */
  private val DC_BITS = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DC_VALS = Array.tabulate(12)(identity)
  private val AC_BITS = Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AC_VALS: Array[Int] =
    (0x00 +: 0xf0 +: (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s))
      .toArray

  /** Canonical code assignment (T.81 Annex C): codes of each length in
    * value order, left-aligned. Returns value -> (code, length). */
  private def canonicalCodes(bits: Array[Int],
                             vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var n = bits(len - 1)
      while (n > 0) {
        out += vals(k) -> (code, len)
        code += 1; k += 1; n -= 1
      }
      code <<= 1
    }
    out.result()
  }

  private lazy val dcEnc = canonicalCodes(DC_BITS, DC_VALS)
  private lazy val acEnc = canonicalCodes(AC_BITS, AC_VALS)

  /** Magnitude category (T.81 CSIZE): smallest s with |v| < 2^s. */
  private def category(v: Int): Int = {
    var s = 0
    var a = math.abs(v)
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nBits += len
      while (nBits >= 8) {
        val b = ((acc >>> (nBits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nBits -= 8
      }
    }
    def flush(): Unit = if (nBits > 0) {
      // pad with 1-bits (T.81 F.1.2.3)
      put(0xff, 8 - nBits)
    }
  }

  private def jpegSeg(out: java.io.ByteArrayOutputStream, marker: Int,
                      payload: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(payload, 0, payload.length)
  }

  /** Forward DCT of one level-shifted 8×8 block (samples 0..255, quant
    * all-ones → the rounded coefficient IS the quantized value). */
  private def fdctBlock(samples: Array[Int], coef: Array[Int]): Unit = {
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += (samples(y * 8 + x) - 128) * dctCos(x)(u) * dctCos(y)(v)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) invSqrt2 else 1.0
        val cv = if (v == 0) invSqrt2 else 1.0
        coef(v * 8 + u) = math.round(0.25 * cu * cv * s).toInt
        v += 1
      }
      u += 1
    }
  }

  /** Entropy-code one coefficient block: DC diff then AC run-lengths in
    * zig-zag order. Returns the new DC predictor. */
  private def writeBlock(bw: BitWriter, coef: Array[Int], predDc: Int): Int = {
    val dc = coef(0)
    val diff = dc - predDc
    val s0 = category(diff)
    val (c0, l0) = dcEnc(s0)
    bw.put(c0, l0)
    if (s0 > 0)
      bw.put(if (diff >= 0) diff else diff + (1 << s0) - 1, s0)
    var run = 0
    var i = 1
    while (i < 64) {
      val ac = coef(zigzag(i))
      if (ac == 0) run += 1
      else {
        while (run >= 16) { val (c, l) = acEnc(0xf0); bw.put(c, l); run -= 16 }
        val s = category(ac)
        val (c, l) = acEnc((run << 4) | s)
        bw.put(c, l)
        bw.put(if (ac >= 0) ac else ac + (1 << s) - 1, s)
        run = 0
      }
      i += 1
    }
    if (run > 0) { val (c, l) = acEnc(0x00); bw.put(c, l) } // EOB
    dc
  }

  /** Extract an 8×8 block from a plane, edge-replicating past the edge. */
  private def grabBlock(plane: Array[Int], w: Int, h: Int,
                        bx: Int, by: Int, out: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      val py = math.min(by * 8 + y, h - 1)
      var x = 0
      while (x < 8) {
        out(y * 8 + x) = plane(py * w + math.min(bx * 8 + x, w - 1))
        x += 1
      }
      y += 1
    }
  }

  private def jpegHeader(out: java.io.ByteArrayOutputStream, w: Int, h: Int,
                         components: Seq[(Int, Int, Int)]): Unit = {
    out.write(0xff); out.write(0xd8) // SOI
    jpegSeg(out, 0xe0, // APP0 JFIF 1.1, no thumbnail
      Array[Int]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
        .map(_.toByte))
    jpegSeg(out, 0xdb, (0 +: Array.fill(64)(1)).map(_.toByte)) // DQT id 0
    jpegSeg(out, 0xc0, (Seq(8, // SOF0: precision
      (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      components.size) ++
      components.flatMap { case (id, sh, sv) => Seq(id, (sh << 4) | sv, 0) })
      .map(_.toByte).toArray)
    jpegSeg(out, 0xc4, ((0 +: DC_BITS.toSeq) ++ DC_VALS.toSeq ++
      (0x10 +: AC_BITS.toSeq) ++ AC_VALS.toSeq).map(_.toByte).toArray) // DHT
    jpegSeg(out, 0xda, (Seq(components.size) ++
      components.flatMap { case (id, _, _) => Seq(id, 0x00) } ++
      Seq(0, 63, 0)).map(_.toByte).toArray) // SOS
  }

  /** Baseline grayscale JPEG of a w×h 8-bit plane. Quant table all-ones;
    * edge blocks pad by edge replication (decoder crops). */
  def encodeJpeg(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && gray.length == w * h,
      s"JPEG payload ${gray.length} != ${w * h}")
    val out = new java.io.ByteArrayOutputStream(gray.length + 1024)
    jpegHeader(out, w, h, Seq((1, 1, 1)))
    val plane = Array.tabulate(w * h)(i => gray(i) & 0xff)
    val bw = new BitWriter(out)
    val samples = new Array[Int](64)
    val coef = new Array[Int](64)
    var predDc = 0
    val bxs = (w + 7) / 8
    val bys = (h + 7) / 8
    var by = 0
    while (by < bys) {
      var bx = 0
      while (bx < bxs) {
        grabBlock(plane, w, h, bx, by, samples)
        fdctBlock(samples, coef)
        predDc = writeBlock(bw, coef, predDc)
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Fixed-point BT.601 RGB→YCbCr, the encoder's color transform: integer
    * coefficients summing to 256/0/0 per row. Every shifted numerator is
    * OFFSET-SHIFTED non-negative first (adding k·256 before `>> 8` adds
    * exactly k, so Java values are unchanged) — Java `>>` floors but
    * DuckDB `//` truncates toward zero, and they agree only on
    * non-negative operands (the fleet's established OFF-shift
    * discipline), which is what lets the q_jpeg_color oracle replay this
    * chain exactly. */
  private[graft] def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    def cl(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
    (cl((77 * r + 150 * g + 29 * b + 128) >> 8),
     cl((-43 * r - 85 * g + 128 * b + 128 + 32768) >> 8),
     cl((128 * r - 107 * g - 21 * b + 128 + 32768) >> 8))
  }

  /** Fixed-point YCbCr→RGB, the decoder's inverse transform (same
    * OFF-shift discipline; not the algebraic inverse of [[rgbToYcc]] —
    * both are deterministic, which is what the oracle needs). */
  private[graft] def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def cl(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
    (cl(y + ((359 * (cr - 128) + 128 + 65536) >> 8) - 256),
     cl(y - ((88 * (cb - 128) + 183 * (cr - 128) + 128 + 65536) >> 8) + 256),
     cl(y + ((454 * (cb - 128) + 128 + 65536) >> 8) - 256))
  }

  /** Baseline COLOR JPEG of a w×h interleaved-RGB plane — the shape the
    * web actually serves: 3-component YCbCr, either 4:2:0 (2×2-sampled
    * luma, chroma averaged over each 2×2 with round-half-up) or 4:4:4.
    * Fixed-point color transform ([[rgbToYcc]]), all-ones quant, shared
    * canonical Huffman tables; 4:2:0 requires even dims (the fixture
    * rule), MCUs pad by edge replication. */
  def encodeJpegColor(w: Int, h: Int, rgb: Array[Byte],
                      subsample: Boolean = true): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"JPEG payload ${rgb.length} != ${w * h * 3}")
    require(!subsample || (w % 2 == 0 && h % 2 == 0),
      "4:2:0 JPEG needs even dimensions")
    val yP = new Array[Int](w * h)
    val cbF = new Array[Int](w * h)
    val crF = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val (y, cb, cr) = rgbToYcc(rgb(3 * i) & 0xff, rgb(3 * i + 1) & 0xff,
        rgb(3 * i + 2) & 0xff)
      yP(i) = y; cbF(i) = cb; crF(i) = cr
      i += 1
    }
    val (cw, ch, cbP, crP) =
      if (!subsample) (w, h, cbF, crF)
      else {
        val cw = w / 2; val ch = h / 2
        def down(p: Array[Int]) = Array.tabulate(cw * ch) { j =>
          val x = (j % cw) * 2; val y = (j / cw) * 2
          (p(y * w + x) + p(y * w + x + 1) + p((y + 1) * w + x) +
            p((y + 1) * w + x + 1) + 2) >> 2
        }
        (cw, ch, down(cbF), down(crF))
      }
    val sf = if (subsample) 2 else 1
    val out = new java.io.ByteArrayOutputStream(rgb.length / 2 + 1024)
    jpegHeader(out, w, h, Seq((1, sf, sf), (2, 1, 1), (3, 1, 1)))
    val bw = new BitWriter(out)
    val samples = new Array[Int](64)
    val coef = new Array[Int](64)
    val pred = new Array[Int](3)
    val mxs = (w + 8 * sf - 1) / (8 * sf)
    val mys = (h + 8 * sf - 1) / (8 * sf)
    var my = 0
    while (my < mys) {
      var mx = 0
      while (mx < mxs) {
        // luma blocks of the MCU in raster order, then one Cb, one Cr
        var v = 0
        while (v < sf) {
          var u = 0
          while (u < sf) {
            grabBlock(yP, w, h, mx * sf + u, my * sf + v, samples)
            fdctBlock(samples, coef)
            pred(0) = writeBlock(bw, coef, pred(0))
            u += 1
          }
          v += 1
        }
        grabBlock(cbP, cw, ch, mx, my, samples)
        fdctBlock(samples, coef)
        pred(1) = writeBlock(bw, coef, pred(1))
        grabBlock(crP, cw, ch, mx, my, samples)
        fdctBlock(samples, coef)
        pred(2) = writeBlock(bw, coef, pred(2))
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Canonical Huffman decode tables (T.81 F.2.2.3 decoder): per code
    * length, the smallest code and the index of its first value. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // a hostile DHT whose BITS counts exceed the supplied value bytes
    // must raise a labeled error here, not a raw index exception deep in
    // value() during entropy decode (ADVICE r11)
    require(bits.sum == vals.length,
      s"malformed DHT: BITS declares ${bits.sum} codes, " +
        s"${vals.length} values supplied")
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        if (bits(len - 1) == 0) { minCode(len) = 0; maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len))
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    def bit(): Int = {
      if (nBits == 0) {
        require(pos < b.length, "truncated JPEG entropy stream")
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          require(pos < b.length, "truncated JPEG entropy stream")
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed byte
          else if (m == 0xd9) v = 0xff // EOI reached with bits pending: pad
          else sys.error(f"unexpected marker FF$m%02X inside entropy data")
        }
        acc = v; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = bit()
      var len = 1
      while (len <= 16 && (t.maxCode(len) < 0 || code > t.maxCode(len))) {
        code = (code << 1) | bit()
        len += 1
      }
      require(len <= 16, "invalid JPEG Huffman code")
      t.value(len, code)
    }
  }

  /** T.81 EXTEND: map s received magnitude bits to a signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Baseline sequential JPEG parse — grayscale OR YCbCr color: marker
    * walk, DQT/DHT/SOF0/SOS, canonical Huffman entropy decode with
    * per-component DC prediction over interleaved MCUs (the MCU walk and
    * chroma upsample are sampling-factor-general up to 2×2, so 4:4:4,
    * 4:2:2, and the web-standard 4:2:0 all decode; the spec suite pins
    * 4:4:4 and 4:2:0), dequantize, inverse zigzag, double-precision
    * IDCT, chroma upsample by replication, fixed-point YCbCr→RGB
    * ([[yccToRgb]]). Grayscale returns a w·h gray plane, color a w·h·3
    * interleaved RGB plane (the PPM/PNG content convention).
    * Progressive, 12-bit, >2 sampling, and restart intervals raise
    * (skip-and-count posture upstream). */
  def decodeJpeg(b: Array[Byte]): Decoded = {
    require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      "not a JPEG stream")
    var i = 2
    var w = 0; var h = 0
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    // per-component: (id, hSamp, vSamp, quantTable); filled by SOF0
    var comps: Array[Array[Int]] = null
    val dcSel = new Array[Int](3)
    val acSel = new Array[Int](3)
    var sos = -1
    while (sos < 0) {
      require(i + 2 <= b.length, "truncated JPEG marker stream")
      require((b(i) & 0xff) == 0xff, f"expected marker, got ${b(i)}%02x")
      // T.81 B.1.1.2: any number of 0xFF fill bytes may pad before the
      // marker code — skip the run so a conformant foreign encoder's
      // padding isn't misread as a marker with a bogus length (ADVICE r11)
      while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
      require(i + 2 <= b.length, "truncated JPEG marker stream")
      val m = b(i + 1) & 0xff
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        // TEM / RSTn are length-less standalone markers
        i += 2
      } else {
      require(i + 4 <= b.length, "truncated JPEG marker stream")
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      require(i.toLong + 2 + len <= b.length, "truncated JPEG segment")
      val p = i + 4 // payload start
      m match {
        case 0xdb => // DQT (possibly several tables per segment)
          var o = p
          while (o < i + 2 + len) {
            require(o + 65 <= i + 2 + len,
              "malformed DQT: table overruns the segment")
            val pq = (b(o) & 0xff) >> 4
            val tq = b(o) & 0x0f
            require(pq == 0, "only 8-bit quant tables supported")
            qt(tq) = Array.tabulate(64)(j => b(o + 1 + j) & 0xff)
            o += 65
          }
        case 0xc4 => // DHT (possibly several tables per segment)
          var o = p
          while (o < i + 2 + len) {
            require(o + 17 <= i + 2 + len,
              "malformed DHT: BITS header overruns the segment")
            val tc = (b(o) & 0xff) >> 4
            val th = b(o) & 0x0f
            val bits = Array.tabulate(16)(j => b(o + 1 + j) & 0xff)
            val n = bits.sum
            require(o + 17 + n <= i + 2 + len,
              s"malformed DHT: $n declared values overrun the segment")
            val vals = Array.tabulate(n)(j => b(o + 17 + j) & 0xff)
            if (tc == 0) dcT(th) = new HuffTable(bits, vals)
            else acT(th) = new HuffTable(bits, vals)
            o += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          require(len >= 8, "malformed SOF0: segment too short")
          require((b(p) & 0xff) == 8, "only 8-bit precision supported")
          h = ((b(p + 1) & 0xff) << 8) | (b(p + 2) & 0xff)
          w = ((b(p + 3) & 0xff) << 8) | (b(p + 4) & 0xff)
          val nc = b(p + 5) & 0xff
          require(nc == 1 || nc == 3,
            s"unsupported JPEG component count $nc")
          require(len >= 8 + 3 * nc,
            "malformed SOF0: component table overruns the segment")
          comps = Array.tabulate(nc) { c =>
            val o = p + 6 + 3 * c
            Array(b(o) & 0xff, (b(o + 1) & 0xff) >> 4, b(o + 1) & 0x0f,
              b(o + 2) & 0x0f)
          }
          comps.foreach { c =>
            require(c(1) >= 1 && c(1) <= 2 && c(2) >= 1 && c(2) <= 2,
              s"unsupported JPEG sampling ${c(1)}x${c(2)}")
          }
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
             0xcb | 0xcd | 0xce | 0xcf =>
          sys.error(f"unsupported JPEG SOF marker FF$m%02X (not baseline)")
        case 0xdd => sys.error("JPEG restart intervals not supported")
        case 0xda => // SOS
          require(len >= 3, "malformed SOS: segment too short")
          val ns = b(p) & 0xff
          require(comps != null && ns == comps.length,
            "SOS component count mismatch")
          require(len >= 3 + 2 * ns + 3,
            "malformed SOS: component selectors overrun the segment")
          var c = 0
          while (c < ns) {
            dcSel(c) = (b(p + 2 + 2 * c) & 0xff) >> 4
            acSel(c) = b(p + 2 + 2 * c) & 0x0f
            c += 1
          }
          sos = i + 2 + len
        case _ => () // APPn / COM / anything else: skip
      }
      i += 2 + len
      }
    }
    require(w > 0 && h > 0 && comps != null, "JPEG missing SOF0 before SOS")
    // hostile-SOF allocation guard (same rationale as the PNG cap)
    require(w.toLong * h <= MAX_PIXELS,
      s"JPEG dims ${w}x$h exceed the decode pixel cap")
    val nc = comps.length
    val hmax = comps.map(_(1)).max
    val vmax = comps.map(_(2)).max
    // per-component plane dims (ceil of the sampled fraction)
    val cw = Array.tabulate(nc)(c => (w * comps(c)(1) + hmax - 1) / hmax)
    val ch = Array.tabulate(nc)(c => (h * comps(c)(2) + vmax - 1) / vmax)
    val planes = Array.tabulate(nc)(c => new Array[Int](cw(c) * ch(c)))
    comps.foreach { c =>
      require(qt(c(3)) != null, s"JPEG quant table ${c(3)} undefined")
    }
    (0 until nc).foreach { c =>
      require(dcT(dcSel(c)) != null && acT(acSel(c)) != null,
        "JPEG Huffman tables undefined")
    }
    val r = new BitReader(b, sos)
    val coef = new Array[Int](64)
    val samples = new Array[Int](64)
    val pred = new Array[Int](nc)
    // one entropy-decoded, IDCT'd block landed into component c's plane
    def block(c: Int, bx: Int, by: Int): Unit = {
      val q = qt(comps(c)(3))
      java.util.Arrays.fill(coef, 0)
      val s0 = r.decode(dcT(dcSel(c)))
      pred(c) += extend(r.bits(s0), s0)
      coef(0) = pred(c) * q(0)
      var k = 1
      while (k < 64) {
        val rs = r.decode(acT(acSel(c)))
        val run = rs >> 4
        val s = rs & 0x0f
        if (s == 0) {
          if (run == 15) k += 16 // ZRL
          else k = 64 // EOB
        } else {
          k += run
          require(k < 64, "JPEG AC run overflows the block")
          coef(zigzag(k)) = extend(r.bits(s), s) * q(k)
          k += 1
        }
      }
      idctBlock(coef, samples)
      val pw = cw(c); val ph = ch(c)
      var y = 0
      while (y < 8) {
        val py = by * 8 + y
        var x = 0
        while (x < 8) {
          val px = bx * 8 + x
          if (px < pw && py < ph) planes(c)(py * pw + px) = samples(y * 8 + x)
          x += 1
        }
        y += 1
      }
    }
    val mxs = (w + 8 * hmax - 1) / (8 * hmax)
    val mys = (h + 8 * vmax - 1) / (8 * vmax)
    var my = 0
    while (my < mys) {
      var mx = 0
      while (mx < mxs) {
        var c = 0
        while (c < nc) {
          var v = 0
          while (v < comps(c)(2)) {
            var u = 0
            while (u < comps(c)(1)) {
              block(c, mx * comps(c)(1) + u, my * comps(c)(2) + v)
              u += 1
            }
            v += 1
          }
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    if (nc == 1) {
      val out = new Array[Byte](w * h)
      var j = 0
      while (j < w * h) { out(j) = planes(0)(j).toByte; j += 1 }
      Decoded("image", w, h, 1, out)
    } else {
      // upsample chroma by replication, invert the color transform
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = planes(0)(y * cw(0) + x)
          val cb = planes(1)((y * comps(1)(2) / vmax) * cw(1) +
            x * comps(1)(1) / hmax)
          val cr = planes(2)((y * comps(2)(2) / vmax) * cw(2) +
            x * comps(2)(1) / hmax)
          val (rr, gg, bb) = yccToRgb(yy, cb, cr)
          val o = (y * w + x) * 3
          out(o) = rr.toByte; out(o + 1) = gg.toByte; out(o + 2) = bb.toByte
          x += 1
        }
        y += 1
      }
      Decoded("image", w, h, 1, out)
    }
  }

  /** Inverse DCT of one dequantized block → clamped 0..255 samples. */
  private def idctBlock(coef: Array[Int], samples: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) {
              val cu = if (u == 0) invSqrt2 else 1.0
              val cv = if (v == 0) invSqrt2 else 1.0
              s += cu * cv * c * dctCos(x)(u) * dctCos(y)(v)
            }
            v += 1
          }
          u += 1
        }
        val p = math.round(0.25 * s).toInt + 128
        samples(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }


  /** Sniff the container by magic and dispatch — what a real ingest does
    * before handing the blob to a modality-specific decoder. */
  def decode(b: Array[Byte]): Decoded = {
    require(b.length >= 2, "payload too short for any magic")
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) decodeJpeg(b)
    else if (b(0) == 'P' && b(1) == '6') decodePpm(b)
    else if (b.length >= 8 && (0 until 8).forall(i => b(i) == PNG_SIG(i)))
      decodePng(b)
    else if (b.length >= 4 && new String(b, 0, 4, "US-ASCII") == "RIFF")
      decodeWav(b)
    else if (b.length >= 9 && new String(b, 0, 9, "US-ASCII") == "YUV4MPEG2")
      decodeY4m(b)
    else sys.error("unrecognized media container magic")
  }
}
