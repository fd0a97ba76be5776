package graft

import org.apache.spark.sql.functions._

import graft.operators.{MediaCodecs, MediaRow, Multimodal}

class MultimodalSpec extends SparkTestBase {

  test("PPM decode parses a hand-built image byte-exactly, including " +
    "comments and whitespace variants") {
    val rgb = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val enc = MediaCodecs.encodePpm(2, 2, rgb)
    val d = MediaCodecs.decodePpm(enc)
    assert(d.width == 2 && d.height == 2 && d.nFrames == 1)
    assert(d.content.sameElements(rgb))
    // a foreign tool's header shape: comment line + mixed whitespace
    val foreign = "P6 # written elsewhere\n# comment line\n 2\t2\n255\n"
      .getBytes("US-ASCII") ++ rgb
    val df = MediaCodecs.decodePpm(foreign)
    assert(df.width == 2 && df.height == 2 && df.content.sameElements(rgb))
    // truncated pixel data must fail loudly, not return garbage
    intercept[IllegalArgumentException] {
      MediaCodecs.decodePpm(enc.dropRight(1))
    }
  }

  test("WAV decode walks RIFF chunks: fmt/data parsed, unknown chunks " +
    "skipped, word alignment honored") {
    val samples = Array.tabulate(11)(i => (i * 7).toByte)
    val enc = MediaCodecs.encodeWav(8000, samples)
    val d = MediaCodecs.decodeWav(enc)
    assert(d.width == 11 && d.height == 1 && d.content.sameElements(samples))
    // splice an odd-sized unknown chunk between fmt and data: a correct
    // chunk walk pads to word alignment and still finds data
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 1, 2, 3, 0) // size 3 + 1 pad byte
    val spliced = enc.take(36) ++ junk ++ enc.drop(36)
    val d2 = MediaCodecs.decodeWav(spliced)
    assert(d2.content.sameElements(samples))
  }

  test("Y4M decode parses the stream header and counts FRAME-delimited " +
    "4:2:0 planes") {
    val fs = 4 * 2 * 3 / 2
    val frames = Seq.tabulate(3)(f => Array.tabulate(fs)(i => (f * 16 + i).toByte))
    val enc = MediaCodecs.encodeY4m(4, 2, frames)
    val d = MediaCodecs.decodeY4m(enc)
    assert(d.width == 4 && d.height == 2 && d.nFrames == 3)
    assert(d.content.sameElements(Array.concat(frames: _*)))
    // magic sniffing dispatches all three containers
    assert(MediaCodecs.decode(enc).kind == "video")
    assert(MediaCodecs.decode(
      MediaCodecs.encodeWav(8000, Array[Byte](1))).kind == "audio")
    assert(MediaCodecs.decode(
      MediaCodecs.encodePpm(1, 1, Array[Byte](1, 2, 3))).kind == "image")
  }

  test("corrupt payloads decode to zero rows instead of failing the batch") {
    val rows = Iterator(
      MediaRow(1L, "image", Array[Byte]('X', 'Y', 'Z')),
      MediaRow(2L, "image",
        MediaCodecs.encodePpm(1, 1, Array[Byte](100, 100, 100))))
    val out = Multimodal.decodeMedia(rows).toSeq
    assert(out.head.width == 0 && out.head.brightness == 0.0)
    assert(out(1).width == 1 && out(1).brightness == 100.0)
  }

  test("media payloads are real containers and decode is deterministic " +
    "and batch-shaped") {
    val a = Multimodal.decoded(spark, sfDir).collect().sortBy(_.doc_id)
    val b = Multimodal.decoded(spark, sfDir).collect().sortBy(_.doc_id)
    assert(a.length == 500)
    assert(a.map(_.doc_id).sameElements(b.map(_.doc_id)))
    assert(a.zip(b).forall { case (x, y) =>
      x.width == y.width && x.feature.sameElements(y.feature) })
    // no corrupt rows: every generated payload parses
    assert(a.forall(d => d.width > 0 && d.height > 0 && d.n_frames > 0))
    assert(a.forall(_.feature.length == 8))
    assert(a.forall(d => d.n_sampled == (d.n_frames + 5) / 6))
    assert(a.forall(d => d.feature(0) == (d.brightness / 255.0).toFloat))
    // parsed dims come from real headers: image dims live in the
    // generator's ranges, audio is samples×1, video frames vary
    val byType = a.groupBy(_.media_type)
    assert(byType("image").forall(d =>
      d.width >= 4 && d.width <= 16 && d.height >= 4 && d.height <= 14
        && d.n_frames == 1))
    assert(byType("audio").forall(d => d.height == 1 && d.n_frames == 1))
    assert(byType("video").exists(_.n_frames > 1))
    assert(byType("video").forall(d => d.width % 2 == 0 && d.height % 2 == 0))
  }

  test("nearest-neighbor resample: hand planes give exact pixels, " +
    "weight identity holds, corrupt blobs resize to zero rows") {
    // 1×2 grayscale strip [10, 200] upscaled to 4×2: each source column
    // owns exactly 2 target columns (sx = rx·2/4)
    val up = Multimodal.resampleNN(Array[Byte](10, 200.toByte),
      w = 2, h = 1, ch = 1, rw = 4, rh = 2)
    assert(up.map(_ & 0xff).toSeq ==
      Seq(10, 10, 200, 200, 10, 10, 200, 200))
    // 4×1 downscale to 2×1 picks sources 0 and 2 (rx·4/2)
    val dn = Multimodal.resampleNN(Array[Byte](1, 2, 3, 4),
      w = 4, h = 1, ch = 1, rw = 2, rh = 1)
    assert(dn.map(_ & 0xff).toSeq == Seq(1, 3))
    // RGB channels travel together with their pixel
    val rgb = Multimodal.resampleNN(Array[Byte](1, 2, 3, 4, 5, 6),
      w = 2, h = 1, ch = 3, rw = 1, rh = 1)
    assert(rgb.toSeq == Seq[Byte](1, 2, 3))
    // oracle weight identity: sum over the resampled plane equals the
    // per-source-pixel closed form Σ wx(sx)·wy(sy)·byte — the exact
    // arithmetic the DuckDB oracle replays
    val plane = Array.tabulate(5 * 3)(i => ((i * 37 + 11) % 251).toByte)
    val (w0, h0, rw0, rh0) = (5, 3, 224, 134)
    val rp = Multimodal.resampleNN(plane, w0, h0, 1, rw0, rh0)
    def ceilDiv(a: Long, b: Long) = (a + b - 1) / b
    val closed = (for { sy <- 0 until h0; sx <- 0 until w0 } yield {
      val wx = ceilDiv((sx + 1).toLong * rw0, w0) - ceilDiv(sx.toLong * rw0, w0)
      val wy = ceilDiv((sy + 1).toLong * rh0, h0) - ceilDiv(sy.toLong * rh0, h0)
      wx * wy * (plane(sy * w0 + sx) & 0xff)
    }).sum
    assert(rp.map(_ & 0xff).map(_.toLong).sum == closed)
    // corrupt blob: zero row, never a task failure
    val out = Multimodal.resizePixels(224)(Iterator(
      MediaRow(1L, "image", Array[Byte]('n', 'o')),
      MediaRow(2L, "image",
        MediaCodecs.encodePpm(1, 1, Array[Byte](100, 100, 100))))).toSeq
    assert(out.head.r_cells == 0L && out.head.r_sum == 0L)
    // 1×1 image aspect-fits to 224×224; every resampled byte is 100
    assert(out(1).r_width == 224 && out(1).r_height == 224 &&
      out(1).r_cells == 224L * 224 * 3 &&
      out(1).r_sum == 224L * 224 * 3 * 100)
  }

  test("empty document text yields valid zero-filled containers for all " +
    "modalities (the mod-0 batch-killer guard)") {
    import spark.implicits._
    // doc_id % 3 picks the modality: 0 image, 1 audio, 2 video
    val docs = Seq((0L, ""), (1L, ""), (2L, "")).toDF("doc_id", "text")
    val rows = Multimodal.mediaTableOn(docs).as[
      graft.operators.MediaRow].collect().sortBy(_.doc_id)
    assert(rows.length == 3)
    // every payload PARSES (real container headers), planes are zeros
    val img = MediaCodecs.decode(rows(0).payload)
    assert(img.kind == "image" && img.width == 4 && img.height == 4)
    assert(img.content.forall(_ == 0))
    val aud = MediaCodecs.decode(rows(1).payload)
    assert(aud.kind == "audio" && aud.width == 0) // zero samples
    val vid = MediaCodecs.decode(rows(2).payload)
    assert(vid.kind == "video" && vid.content.forall(_ == 0))
    // and the downstream stages stay zero-rowed, never failing
    val dec = Multimodal.decodeMedia(rows.iterator).toSeq
    assert(dec.forall(_.brightness == 0.0))
    val rs = Multimodal.resizePixels(224)(rows.iterator).toSeq
    assert(rs.forall(_.r_sum == 0L))
  }

  test("modalities partition the corpus") {
    val counts = Multimodal.decoded(spark, sfDir)
      .groupBy("media_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("image", "audio", "video"))
    assert(counts.values.sum == 500)
  }

  test("audio stats: hand PCM gives exact sum and mean-crossing count; " +
    "corrupt payloads degrade to zero rows") {
    import graft.operators.{MediaCodecs, MediaRow, Multimodal}
    // samples [0, 200, 0, 200]: S = 400, centered n*a - S alternates
    // -400/+400 -> 3 strict sign changes
    val wav = MediaCodecs.encodeWav(8000,
      Array[Byte](0, 200.toByte, 0, 200.toByte))
    val out = Multimodal.audioStatsRows(
      Iterator(MediaRow(7L, "audio", wav))).toSeq
    assert(out == Seq(Multimodal.AudioStats(7L, 4L, 400L, 3L)), s"$out")
    // constant clip: centered values are all exactly 0 -> no STRICT
    // sign change
    val flat = MediaCodecs.encodeWav(8000, Array[Byte](9, 9, 9))
    assert(Multimodal.audioStatsRows(
      Iterator(MediaRow(8L, "audio", flat))).toSeq ==
      Seq(Multimodal.AudioStats(8L, 3L, 27L, 0L)))
    // corrupt container: skip-and-count posture, zero row not a throw
    assert(Multimodal.audioStatsRows(
      Iterator(MediaRow(9L, "audio", Array[Byte](1, 2, 3)))).toSeq ==
      Seq(Multimodal.AudioStats(9L, 0L, 0L, 0L)))
  }

  test("video motion: one stride-6 sampled pair, exact abs-diff energy") {
    import graft.operators.{MediaCodecs, MediaRow, Multimodal}
    // 2x2 4:2:0 frames are 6 bytes; 7 frames -> exactly one sampled
    // pair (0, 6) with |diff| = 1+2+3+4+5+6 = 21
    val frames = Seq.tabulate(7)(f =>
      if (f == 6) Array[Byte](1, 2, 3, 4, 5, 6)
      else Array.fill[Byte](6)(0))
    val y4m = MediaCodecs.encodeY4m(2, 2, frames)
    val out = Multimodal.videoMotionRows(
      Iterator(MediaRow(2L, "video", y4m))).toSeq
    assert(out == Seq(Multimodal.VideoMotion(2L, 7L, 1L, 21L)), s"$out")
    // 6 frames: 0 + 6 is out of range -> no pair
    val short = MediaCodecs.encodeY4m(2, 2, frames.take(6))
    assert(Multimodal.videoMotionRows(
      Iterator(MediaRow(5L, "video", short))).toSeq ==
      Seq(Multimodal.VideoMotion(5L, 6L, 0L, 0L)))
  }
}
