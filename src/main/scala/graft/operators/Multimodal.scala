package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** One opaque media blob with typed metadata — the multimodal storage
  * model: binary payload + relational columns beside it. */
final case class MediaRow(doc_id: Long, media_type: String,
                          payload: Array[Byte])

/** Decoder output: per-blob typed metadata + a small feature vector. */
final case class DecodedMedia(doc_id: Long, media_type: String, width: Int,
                              height: Int, n_frames: Int, n_sampled: Int,
                              brightness: Double, feature: Array[Float])

/** Multimodal-column plumbing (north-star [N], SURVEY.md §2.8): treat
  * image/audio/video as opaque `binary` columns with typed metadata, and
  * run decode / feature-extract / frame-sample as per-partition batch
  * functions over a typed Dataset — the Scala analog of mapInPandas
  * (an Iterator of rows per partition = one batch; Tungsten encoders
  * handle (de)serialization at the partition boundary only).
  *
  * The decode is REAL: payloads are spec-conformant PPM / PNG / WAV /
  * Y4M bytes ([[MediaCodecs]] — PNG is a genuinely COMPRESSED format,
  * zlib-inflated and scanline-de-filtered pure-JDK), and every
  * downstream number (width/height/frames/brightness/phash) is read
  * out of parsed headers and content planes. The fixture payloads are
  * SYNTHESIZED deterministically from documents.text (no media ships
  * with the harness), which is what keeps the whole chain
  * oracle-checkable: the oracle replays generation+decode arithmetic
  * straight from the text. Entropy coders beyond DEFLATE (JPEG/MP3/
  * H.264) stay the documented swap point for a JNI-backed library at
  * deployment — [[MediaCodecs.decode]] is that boundary. The Spark-side plumbing is real throughout: binary column
  * synthesis, repartition-by-modality (batch homogeneity on a cluster:
  * co-locates same-codec blobs so a real decoder's model/codec state is
  * reused within a partition), typed mapPartitions, downstream relational
  * aggregation.
  */
object Multimodal {

  /** Media-generation arithmetic — ONE place for the dims both the
    * encoder-side synthesis and the DuckDB oracle derive from text
    * length (all small enough that every container stays a few KB). */
  private[graft] def imageDims(len: Int): (Int, Int) =
    (4 + len % 13, 4 + (len * 7) % 11)
  private[graft] def videoDims(len: Int): (Int, Int) =
    (2 * (2 + len % 7), 2 * (2 + (len * 7) % 5))

  /** Synthesized media table: REAL container bytes (P6 PPM images,
    * RIFF/PCM WAV audio, YUV4MPEG2 4:2:0 video) whose dims/frame counts
    * and content plane derive deterministically from each document
    * (content byte i = text byte i mod len) — at 100 TB this is the
    * parquet `binary` column written by ingest. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    mediaTableOn(
      Tables.documents(s, dir).select(col("doc_id"), col("text")))

  /** [[mediaTable]] over an explicit (doc_id, text) frame — the
    * degenerate-input seam. */
  private[graft] def mediaTableOn(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .as[(Long, String)]
      .map { case (id, text) =>
        val tb = text.getBytes("UTF-8") // fixture text is ASCII
        val len = tb.length
        // An empty document must still yield a valid container — image and
        // video planes have positive size even when len == 0, and a mod-0
        // here would fail the whole batch (the module's skip-and-count
        // posture). Zero-filled content is the degenerate plane; the
        // oracle SQL mirrors it (CASE WHEN len = 0 THEN 0 byte lookups).
        def content(from: Int, n: Int): Array[Byte] =
          if (len == 0) new Array[Byte](n)
          else Array.tabulate(n)(i => tb((from + i) % len))
        (id % 3) match {
          case 0 =>
            val (w, h) = imageDims(len)
            val rgb = content(0, w * h * 3)
            // Mixed image CONTAINERS, one pixel model: even image docs
            // ship uncompressed PPM, odd ones real zlib-compressed PNG
            // (what a crawl actually carries) — the decoded RGB plane
            // is identical either way, so every downstream census is
            // container-invariant and the per-blob magic sniff in
            // [[MediaCodecs.decode]] is doing real work on every batch.
            MediaRow(id, "image",
              if (id % 6 == 0L) MediaCodecs.encodePpm(w, h, rgb)
              else MediaCodecs.encodePng(w, h, rgb))
          case 1 =>
            MediaRow(id, "audio", MediaCodecs.encodeWav(8000, content(0, len)))
          case _ =>
            val (w, h) = videoDims(len)
            val fs = w * h * 3 / 2
            val nf = (1 + id % 24).toInt
            MediaRow(id, "video", MediaCodecs.encodeY4m(w, h,
              Seq.tabulate(nf)(f => content(f * fs, fs))))
        }
      }.toDF()
  }

  /** Real batch decode: sniff + parse each container
    * ([[MediaCodecs.decode]]) and surface typed metadata plus an 8-point
    * content-plane feature sample. A corrupt/unparseable blob decodes to
    * a zero row rather than killing the task — a bad blob must never
    * fail a 100 TB batch (the skip-and-count posture of every real media
    * ingest). */
  def decodeMedia(rows: Iterator[MediaRow]): Iterator[DecodedMedia] =
    rows.map { r =>
      val dec =
        try Some(MediaCodecs.decode(r.payload))
        catch { case scala.util.control.NonFatal(_) => None }
      dec match {
        case None =>
          DecodedMedia(r.doc_id, r.media_type, 0, 0, 0, 0, 0.0,
            Array.fill(8)(0f))
        case Some(d) =>
          val nSampled = (d.nFrames + 5) / 6 // every-6th frame sampling
          val c = d.content
          val brightness = if (c.isEmpty) 0.0 else (c(0) & 0xff).toDouble
          val feature =
            if (c.isEmpty) Array.fill(8)(0f)
            else Array.tabulate(8)(i =>
              (c(i * c.length / 8) & 0xff).toFloat / 255f)
          DecodedMedia(r.doc_id, r.media_type, d.width, d.height,
            d.nFrames, nSampled, brightness, feature)
      }
    }

  /** Modalities the synthetic corpus carries — the salt key-space divides
    * the cluster between them. */
  private val N_MODALITIES = 3

  /** Salt modulus for the decode repartition, derived from the session's
    * shuffle parallelism: ≈ partitions / modalities non-empty (modality,
    * salt) keys fill every shuffle partition, so decode parallelism SCALES
    * with the configured cluster width instead of hard-capping at a
    * constant (a fixed `lit(8)` salt caps decode at 3 × 8 = 24 tasks on a
    * 1000-core cluster). Floor of 8 keeps tiny local runs multi-task. */
  private[graft] def decodeSaltModulus(s: SparkSession): Int =
    math.max(8, s.conf.get("spark.sql.shuffle.partitions").toInt / N_MODALITIES)

  /** The batch-decode pipeline: repartition by (modality, salt), then one
    * decode batch per partition. The salt matters: hashing on media_type
    * alone would collapse decode to ≤3 non-empty partitions at ANY corpus
    * size; the doc_id-derived salt spreads each modality across the
    * cluster while keeping every partition single-modality (codec/model
    * state still reused within a batch). The salt modulus tracks
    * spark.sql.shuffle.partitions (see [[decodeSaltModulus]]) so the
    * decode stage widens with the cluster; results are salt-invariant
    * (the decode is row-local), which the oracle checks. */
  def decoded(s: SparkSession, dir: String): Dataset[DecodedMedia] = {
    import s.implicits._
    mediaTable(s, dir)
      .repartition(col("media_type"),
        pmod(col("doc_id"), lit(decodeSaltModulus(s).toLong)))
      .as[MediaRow]
      .mapPartitions(decodeMedia _)
  }

  /** Nearest-neighbor resample of one channel-interleaved plane to
    * (rw, rh): target pixel (rx, ry) copies source pixel
    * (rx·w div rw, ry·h div rh) — all integer arithmetic on
    * non-negative operands, so the resampled plane's statistics replay
    * in the oracle via the per-source-pixel cell-count closed form
    * (wx(sx) = ⌈(sx+1)·rw/w⌉ − ⌈sx·rw/w⌉ target columns copy source
    * column sx, and Σ wx = rw). */
  private[graft] def resampleNN(plane: Array[Byte], w: Int, h: Int,
                                ch: Int, rw: Int, rh: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(rw * rh * ch, 0))
    var ry = 0
    while (ry < rh) {
      val sy = ry * h / rh
      var rx = 0
      while (rx < rw) {
        val sx = rx * w / rw
        var c = 0
        while (c < ch) {
          out((ry * rw + rx) * ch + c) = plane((sy * w + sx) * ch + c)
          c += 1
        }
        rx += 1
      }
      ry += 1
    }
    out
  }

  /** Resize stage output: source/target geometry plus the exact byte
    * sum and cell count of the RESAMPLED plane — the census proves the
    * resample produced real pixels, not just box arithmetic. */
  final case class ResizedMedia(doc_id: Long, media_type: String,
                                width: Int, height: Int,
                                r_width: Int, r_height: Int,
                                r_sum: Long, r_cells: Long)

  /** Pixel-TRUE resize (aspect-fit into a target×target box): decode
    * the container, select the modality's 2-D plane — image: the
    * interleaved RGB pixels; audio: the 1×n PCM strip; video: the FIRST
    * frame's luma (the thumbnail plane a video pipeline resizes) — and
    * produce the nearest-neighbor-resampled pixels via [[resampleNN]].
    * A corrupt blob resizes to a zero row (skip-and-count), never fails
    * the batch. */
  def resizePixels(target: Int)(rows: Iterator[MediaRow]): Iterator[ResizedMedia] =
    rows.map { r =>
      val dec =
        try Some(MediaCodecs.decode(r.payload))
        catch { case scala.util.control.NonFatal(_) => None }
      dec match {
        case None =>
          ResizedMedia(r.doc_id, r.media_type, 0, 0, 0, 0, 0L, 0L)
        case Some(d) =>
          val (w, h, ch, plane) = d.kind match {
            case "image" => (d.width, d.height, 3, d.content)
            case "audio" => (d.width, 1, 1, d.content)
            case _ => (d.width, d.height, 1, // first-frame luma (Y first in 4:2:0)
              java.util.Arrays.copyOfRange(d.content, 0,
                math.min(d.width * d.height, d.content.length)))
          }
          // A decodable container with a SHORT plane (e.g. a zero-frame
          // or truncated Y4M) is corrupt for resize purposes: resampleNN
          // indexes the full w*h*ch geometry, and an out-of-bounds read
          // here is OUTSIDE the decode try/catch — it would fail the
          // whole batch, contrary to the skip-and-count posture. Emit
          // the zero row instead, same as an undecodable blob.
          if (w <= 0 || h <= 0 || plane.length < w.toLong * h * ch)
            ResizedMedia(r.doc_id, r.media_type, 0, 0, 0, 0, 0L, 0L)
          else {
            val (rw, rh) =
              if (w >= h) (target, h * target / w)
              else (w * target / h, target)
            val rp = resampleNN(plane, w, h, ch, rw, rh)
            var sum = 0L
            var i = 0
            while (i < rp.length) { sum += rp(i) & 0xff; i += 1 }
            ResizedMedia(r.doc_id, r.media_type, w, h, rw, rh,
              sum, rp.length.toLong)
          }
      }
    }

  /** Batch resize over the media table — same repartition-by-modality
    * batch shape as [[decoded]] (a real resampler reuses per-codec
    * buffers within a partition). */
  def resized(s: SparkSession, dir: String): Dataset[ResizedMedia] = {
    import s.implicits._
    mediaTable(s, dir)
      .repartition(col("media_type"),
        pmod(col("doc_id"), lit(decodeSaltModulus(s).toLong)))
      .as[MediaRow]
      .mapPartitions(resizePixels(224) _)
  }

  def resizeAgg(s: SparkSession, dir: String): DataFrame =
    resized(s, dir)
      .groupBy("media_type")
      .agg(count(lit(1)).as("n"),
           Fmt.fix4(avg("r_width")).as("avg_r_width"),
           Fmt.fix4(avg("r_height")).as("avg_r_height"),
           max("r_width").as("max_r_width"),
           max("r_height").as("max_r_height"),
           sum("r_cells").as("r_cells"),
           // mean byte value of the RESAMPLED planes: exact integer
           // sums, ONE division, IEEE floor-4dp (audio above 224
           // samples aspect-fits to a 0-row strip → 0 cells; guard)
           (floor(sum("r_sum").cast("double")
             / greatest(sum("r_cells"), lit(1L)).cast("double")
             * lit(10000.0d) + lit(0.5d)) / lit(10000.0d))
             .as("avg_r_brightness"))
      .orderBy("media_type")

  /** Oracle for the pixel-true resize census. The nearest-neighbor
    * resample replays WITHOUT materializing target planes: source pixel
    * (sx, sy) lands in wx(sx)·wy(sy) target cells, where
    * wx(sx) = ⌈(sx+1)·rw/w⌉ − ⌈sx·rw/w⌉ (non-negative integer ceils as
    * (a + b − 1) // b), so the resampled byte sum is a SOURCE-pixel sum
    * with integer weights — w·h ≤ a few hundred rows per doc instead of
    * rw·rh ≤ 50k. Byte (sidx, c) = text byte ((sidx·ch + c) mod len)
    * (the generation rule: image RGB interleaved, audio PCM strip,
    * video first-frame luma = frame-0 prefix). */
  private val resizeAggSql =
    """WITH dec AS (
      |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
      |         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
      |              WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |         CAST(CASE CAST(doc_id % 3 AS INTEGER)
      |              WHEN 0 THEN 4 + length(text) % 13
      |              WHEN 1 THEN length(text)
      |              ELSE 2 * (2 + length(text) % 7) END AS BIGINT) AS w,
      |         CAST(CASE CAST(doc_id % 3 AS INTEGER)
      |              WHEN 0 THEN 4 + (length(text) * 7) % 11
      |              WHEN 1 THEN 1
      |              ELSE 2 * (2 + (length(text) * 7) % 5) END AS BIGINT) AS h,
      |         CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 1 END AS BIGINT)
      |           AS ch
      |  FROM documents),
      |geo AS (
      |  SELECT *,
      |         CASE WHEN w >= h THEN 224 ELSE w * 224 // h END AS rw,
      |         CASE WHEN w >= h THEN h * 224 // w ELSE 224 END AS rh
      |  FROM dec),
      |px AS (
      |  SELECT media_type, w, h, ch, rw, rh, len, text,
      |         unnest(generate_series(0, CAST(w * h - 1 AS INTEGER)))
      |           AS sidx
      |  FROM geo WHERE rw * rh * ch > 0 AND len > 0),
      |ct AS (
      |  SELECT media_type,
      |         ((((sidx % w) + 1) * rw + w - 1) // w
      |          - ((sidx % w) * rw + w - 1) // w)
      |         * ((((sidx // w) + 1) * rh + h - 1) // h
      |            - ((sidx // w) * rh + h - 1) // h)
      |         * list_aggregate(list_transform(
      |             generate_series(0, CAST(ch - 1 AS INTEGER)),
      |             c -> ord(substr(text,
      |                    1 + CAST((sidx * ch + c) % len AS INTEGER), 1))),
      |           'sum') AS t
      |  FROM px),
      |per AS (
      |  SELECT media_type, CAST(count(*) AS BIGINT) AS n,
      |         floor(avg(rw) * 10000.0 + 0.5) / 10000.0 AS aw, floor(avg(rh) * 10000.0 + 0.5) / 10000.0 AS ah,
      |         CAST(max(rw) AS INTEGER) AS mw,
      |         CAST(max(rh) AS INTEGER) AS mh,
      |         CAST(sum(rw * rh * ch) AS BIGINT) AS cells
      |  FROM geo GROUP BY 1),
      |sums AS (
      |  SELECT media_type, CAST(sum(t) AS BIGINT) AS rsum FROM ct
      |  GROUP BY 1)
      |SELECT per.media_type AS media_type, per.n AS n,
      |       per.aw AS avg_r_width, per.ah AS avg_r_height,
      |       per.mw AS max_r_width, per.mh AS max_r_height,
      |       per.cells AS r_cells,
      |       floor(CAST(coalesce(sums.rsum, 0) AS DOUBLE)
      |             / greatest(CAST(per.cells AS DOUBLE), 1.0)
      |             * 10000.0 + 0.5) / 10000.0 AS avg_r_brightness
      |FROM per LEFT JOIN sums ON per.media_type = sums.media_type
      |ORDER BY media_type""".stripMargin

  /** Relational aggregation over decoded metadata — the query a user runs
    * after decode ("how much video, at what resolution, how many sampled
    * frames"). */
  def metaAgg(s: SparkSession, dir: String): DataFrame =
    decoded(s, dir)
      .groupBy("media_type")
      .agg(count(lit(1)).as("n"),
           Fmt.fix4(avg("width")).as("avg_width"),
           Fmt.fix4(avg("height")).as("avg_height"),
           sum("n_frames").cast("long").as("total_frames"),
           sum("n_sampled").cast("long").as("total_sampled"),
           Fmt.fix4(avg("brightness")).as("avg_brightness"))
      .orderBy("media_type")

  /** Oracle recomputes the generation+decode arithmetic straight from
    * documents.text — identical values because the encoders write
    * exactly these dims/frames into real container headers, the decoder
    * parses them back, content byte 0 is text byte 0, and text is
    * ASCII. */
  private val metaAggSql =
    """WITH dec AS (
      |  SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
      |              WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |         CASE CAST(doc_id % 3 AS INTEGER)
      |              WHEN 0 THEN 4 + length(text) % 13
      |              WHEN 1 THEN length(text)
      |              ELSE 2 * (2 + length(text) % 7) END AS w,
      |         CASE CAST(doc_id % 3 AS INTEGER)
      |              WHEN 0 THEN 4 + (length(text) * 7) % 11
      |              WHEN 1 THEN 1
      |              ELSE 2 * (2 + (length(text) * 7) % 5) END AS h,
      |         CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 24
      |              ELSE 1 END AS frames,
      |         CASE WHEN length(text) = 0 THEN 0
      |              ELSE ascii(substr(text, 1, 1)) END AS bright
      |  FROM documents)
      |SELECT media_type, count(*) AS n,
      |       floor(avg(w) * 10000.0 + 0.5) / 10000.0 AS avg_width,
      |       floor(avg(h) * 10000.0 + 0.5) / 10000.0 AS avg_height,
      |       CAST(sum(frames) AS BIGINT) AS total_frames,
      |       CAST(sum((frames + 5) // 6) AS BIGINT) AS total_sampled,
      |       floor(avg(bright) * 10000.0 + 0.5) / 10000.0 AS avg_brightness
      |FROM dec
      |GROUP BY 1
      |ORDER BY media_type""".stripMargin

  /** Per-blob 64-bit perceptual hash (average-hash) over the DECODED
    * content plane: 64 evenly-spaced samples of the parsed pixel / PCM /
    * YUV bytes (never the container bytes — headers don't hash), bit k
    * set iff sample k ≥ the sample mean — all-integer (`s·64 ≥ Σ`
    * instead of a float mean), so the oracle reproduces every bit from
    * documents.text via the generation rule (content byte i = text byte
    * i mod len). A real image pipeline computes the same 64 bits from an
    * 8×8 downscale; swapping that in changes only the sampling line. */
  final case class MediaHash(doc_id: Long, media_type: String, phash: Long)

  def phashMedia(rows: Iterator[MediaRow]): Iterator[MediaHash] =
    rows.map { r =>
      val c =
        try MediaCodecs.decode(r.payload).content
        catch { case scala.util.control.NonFatal(_) => Array.empty[Byte] }
      val clen = c.length
      val h = if (clen == 0) 0L
      else {
        val s = Array.tabulate(64)(k =>
          (c((k.toLong * clen / 64).toInt) & 0xff).toLong)
        val total = s.sum
        (0 until 64).foldLeft(0L)((acc, k) =>
          if (s(k) * 64 >= total) acc | (1L << k) else acc)
      }
      MediaHash(r.doc_id, r.media_type, h)
    }

  private val PHASH_BANDS = 4
  private val PHASH_HAMMING = 6

  /** Perceptual-hash NEAR-DUP over the media corpus — the multimodal
    * counterpart of MinHash text dedup: hash each blob in the same
    * batched decode pass ([[decoded]]'s repartition shape), then find
    * same-modality pairs within hamming ≤ 6 of 64 bits via LSH banding
    * over 4 disjoint 16-bit bands. Pigeonhole: ≤ 3 bit flips cannot
    * touch all 4 bands, so banding is provably LOSSLESS to hamming ≤ 3;
    * pairs at 4..6 are found only when their flips spare one band — and
    * the oracle replays the identical banding, so that recall boundary
    * is checked semantics, not a silent approximation. Candidates only
    * ever form within a (modality, band, key) bucket, never across the
    * corpus. Census per modality; hamming sums stay integer. */
  def phashNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ph = mediaTable(s, dir)
      .repartition(col("media_type"),
        pmod(col("doc_id"), lit(decodeSaltModulus(s).toLong)))
      .as[MediaRow]
      .mapPartitions(phashMedia _)
      .toDF()
    val banded = ph.select(col("doc_id"), col("media_type"), col("phash"),
      posexplode(array((0 until PHASH_BANDS).map(b =>
        shiftright(col("phash"), 16 * b).bitwiseAND(lit(0xffffL))): _*)))
      .toDF("doc_id", "media_type", "phash", "band", "key")
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.media_type") === col("y.media_type") &&
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.media_type").as("media_type"),
        col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("bit_count(x.phash ^ y.phash)").cast("long").as("hamming"))
      .dropDuplicates("media_type", "a", "b")
      .filter(col("hamming") <= PHASH_HAMMING)
    val stats = pairs.groupBy("media_type")
      .agg(count(lit(1)).as("n_pairs"), sum("hamming").as("sh"))
    ph.groupBy("media_type").agg(count(lit(1)).as("n_media"))
      .join(stats, Seq("media_type"), "left")
      .select(col("media_type"), col("n_media"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        (floor(coalesce(col("sh"), lit(0L)).cast("double")
          / greatest(coalesce(col("n_pairs"), lit(0L)), lit(1L))
          * lit(10000.0d) + lit(0.5d)) / lit(10000.0d)).as("avg_hamming"))
      .orderBy("media_type")
  }

  private val phashNearDupSql =
    s"""WITH base AS (
       |  SELECT doc_id, text, length(text) AS len,
       |         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
       |              WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       |         -- decoded content-plane length per container:
       |         -- image w*h*3, audio = samples, video frames*w*h*3/2
       |         CASE CAST(doc_id % 3 AS INTEGER)
       |           WHEN 0 THEN (4 + length(text) % 13)
       |                       * (4 + (length(text) * 7) % 11) * 3
       |           WHEN 1 THEN length(text)
       |           ELSE (1 + doc_id % 24) * (2 * (2 + length(text) % 7))
       |                * (2 * (2 + (length(text) * 7) % 5)) * 3 // 2
       |         END AS clen
       |  FROM documents),
       |ph AS (
       |  SELECT doc_id, media_type,
       |         -- content byte i = text byte (i mod len); bit 63 via the
       |         -- two's-complement identity (adding -2^63) because DuckDB
       |         -- rejects 1::BIGINT << 63
       |         -- len = 0 mirrors the zero-filled degenerate plane the
       |         -- generator emits for an empty document (byte value 0)
       |         (SELECT CAST(sum(CASE WHEN
       |              (CASE WHEN len = 0 THEN 0 ELSE ord(substr(text,
       |                  1 + CAST(((k * clen) // 64) % len AS INTEGER), 1)) END)
       |                * 64
       |              >= (SELECT sum(CASE WHEN len = 0 THEN 0
       |                    ELSE ord(substr(text,
       |                    1 + CAST(((j * clen) // 64) % len AS INTEGER), 1)) END)
       |                  FROM range(0, 64) r2(j))
       |            THEN CASE WHEN k = 63 THEN -9223372036854775808
       |                 ELSE 1::BIGINT << CAST(k AS INTEGER) END
       |            ELSE 0 END) AS BIGINT)
       |          FROM range(0, 64) r1(k)) AS phash
       |  FROM base),
       |banded AS (
       |  SELECT doc_id, media_type, phash, b.b AS band,
       |         (phash >> (16 * b.b)) & 65535 AS key
       |  FROM ph CROSS JOIN range(0, $PHASH_BANDS) b(b)),
       |pairs AS (
       |  SELECT DISTINCT x.media_type, x.doc_id AS a, y.doc_id AS b,
       |         CAST(bit_count(xor(x.phash, y.phash)) AS BIGINT) AS hamming
       |  FROM banded x JOIN banded y
       |    ON x.media_type = y.media_type AND x.band = y.band
       |       AND x.key = y.key AND x.doc_id < y.doc_id),
       |near AS (SELECT * FROM pairs WHERE hamming <= $PHASH_HAMMING),
       |stats AS (
       |  SELECT media_type, count(*) AS n_pairs,
       |         CAST(sum(hamming) AS BIGINT) AS sh
       |  FROM near GROUP BY media_type)
       |SELECT m.media_type, m.n_media,
       |       COALESCE(s.n_pairs, 0) AS n_pairs,
       |       floor(CAST(COALESCE(s.sh, 0) AS DOUBLE)
       |             / greatest(COALESCE(s.n_pairs, 0), 1)
       |             * 10000.0 + 0.5) / 10000.0 AS avg_hamming
       |FROM (SELECT media_type, count(*) AS n_media FROM ph GROUP BY 1) m
       |LEFT JOIN stats s ON m.media_type = s.media_type
       |ORDER BY m.media_type""".stripMargin

  /** Per-image decoded census row for [[pngMeta]]: container sniffed
    * from the payload MAGIC (not metadata), full decoded-plane byte
    * sum — the value that can only be right if DEFLATE + all five
    * scanline de-filters reconstructed every pixel. */
  final case class ImageMeta(doc_id: Long, container: String, width: Int,
                             height: Int, plane_bytes: Long, plane_sum: Long)

  def pngMetaRows(rows: Iterator[MediaRow]): Iterator[ImageMeta] =
    rows.map { r =>
      val p = r.payload
      val container =
        if (p.length >= 2 && p(0) == 'P' && p(1) == '6') "ppm"
        else if (p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' &&
          p(2) == 'N' && p(3) == 'G') "png"
        else "other"
      val dec =
        try Some(MediaCodecs.decode(p))
        catch { case scala.util.control.NonFatal(_) => None }
      dec match {
        case None => ImageMeta(r.doc_id, container, 0, 0, 0L, 0L)
        case Some(d) =>
          var s = 0L
          var i = 0
          while (i < d.content.length) { s += d.content(i) & 0xff; i += 1 }
          ImageMeta(r.doc_id, container, d.width, d.height,
            d.content.length.toLong, s)
      }
    }

  /** PNG-vs-PPM image census over the mixed-container corpus: per
    * container format (sniffed from each blob's magic), count, mean
    * decoded dims, and the EXACT full-plane byte sum + fix4 mean byte.
    * The plane sum is the honesty check on the compressed path — a PNG
    * that merely parsed its header but mis-inflated or mis-filtered a
    * single byte shifts the BIGINT sum and hash-fails the round. The
    * oracle replays the generation arithmetic (plane byte i = text
    * byte i mod len) with the container split doc_id%6=0 → ppm. Same
    * batched decode shape as [[decoded]]. */
  def pngMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .filter(col("media_type") === "image")
      .repartition(pmod(col("doc_id"), lit(decodeSaltModulus(s).toLong)))
      .as[MediaRow]
      .mapPartitions(pngMetaRows _)
      .toDF()
      .groupBy("container")
      .agg(count(lit(1)).as("n"),
        // widths/heights sum as exact integers, so one double division +
        // the fleet fix4 floor is engine-identical; round-avg-4 is
        // HALF_UP-on-BigDecimal in Spark but float-rounding in DuckDB —
        // a latent hash flake at representation edges (ADVICE r10)
        (floor(sum("width").cast("double") * lit(10000.0d)
          / count(lit(1)).cast("double") + lit(0.5d)) / lit(10000.0d))
          .as("avg_width"),
        (floor(sum("height").cast("double") * lit(10000.0d)
          / count(lit(1)).cast("double") + lit(0.5d)) / lit(10000.0d))
          .as("avg_height"),
        sum("plane_bytes").as("plane_bytes"),
        sum("plane_sum").as("plane_sum"),
        (floor(sum("plane_sum").cast("double")
          / greatest(sum("plane_bytes"), lit(1L)).cast("double")
          * lit(10000.0d) + lit(0.5d)) / lit(10000.0d)).as("mean_byte"))
      .orderBy("container")
  }

  private val pngMetaSql =
    """WITH img AS (
      |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
      |         CASE WHEN doc_id % 6 = 0 THEN 'ppm' ELSE 'png' END
      |           AS container,
      |         CAST(4 + length(text) % 13 AS BIGINT) AS w,
      |         CAST(4 + (length(text) * 7) % 11 AS BIGINT) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |ps AS (
      |  SELECT container, w, h, w * h * 3 AS nb,
      |         CAST(CASE WHEN len = 0 THEN 0 ELSE
      |           list_aggregate(list_transform(
      |             range(0, CAST(w * h * 3 AS INTEGER)),
      |             i -> ord(substr(text, 1 + CAST(i % len AS INTEGER), 1))),
      |           'sum') END AS BIGINT) AS psum
      |  FROM img)
      |SELECT container, CAST(count(*) AS BIGINT) AS n,
      |       floor(CAST(sum(w) AS DOUBLE) * 10000.0
      |             / CAST(count(*) AS DOUBLE) + 0.5) / 10000.0 AS avg_width,
      |       floor(CAST(sum(h) AS DOUBLE) * 10000.0
      |             / CAST(count(*) AS DOUBLE) + 0.5) / 10000.0 AS avg_height,
      |       CAST(sum(nb) AS BIGINT) AS plane_bytes,
      |       CAST(sum(psum) AS BIGINT) AS plane_sum,
      |       floor(CAST(sum(psum) AS DOUBLE)
      |             / greatest(CAST(sum(nb) AS DOUBLE), 1.0)
      |             * 10000.0 + 0.5) / 10000.0 AS mean_byte
      |FROM ps GROUP BY container ORDER BY container""".stripMargin

  /** Per-clip exact audio statistics from the DECODED PCM plane. */
  final case class AudioStats(doc_id: Long, n_samples: Long,
                              sum_amp: Long, crossings: Long)

  def audioStatsRows(rows: Iterator[MediaRow]): Iterator[AudioStats] =
    rows.map { r =>
      val c =
        try MediaCodecs.decode(r.payload).content
        catch { case scala.util.control.NonFatal(_) => Array.empty[Byte] }
      val n = c.length
      var s = 0L
      var i = 0
      while (i < n) { s += (c(i) & 0xff); i += 1 }
      var cr = 0L
      i = 1
      while (i < n) {
        // mean-crossing on the EXACT rational mean: centered sample
        // c_i = n·a_i − Σ; a crossing is a strict sign change (ASCII PCM
        // never crosses the 128 midline, so the fixed-threshold census
        // would be degenerate — the per-clip mean is the honest line)
        val p = n.toLong * (c(i - 1) & 0xff) - s
        val q = n.toLong * (c(i) & 0xff) - s
        if (p * q < 0L) cr += 1
        i += 1
      }
      AudioStats(r.doc_id, n.toLong, s, cr)
    }

  /** Audio-corpus loudness/dynamics census over the decoded 8-bit PCM
    * samples (duration at the container's 8 kHz rate, mean amplitude,
    * mean-crossing rate — the cheap voice-activity/dynamics proxy a
    * speech pipeline gates on before transcription). Every statistic is
    * an exact integer until one final fix4 division: amplitudes sum as
    * BIGINT and crossings count strict sign changes of n·aᵢ − Σ (the
    * exact-rational-mean centering, no float threshold). Same batched
    * decode shape as [[decoded]]; the oracle replays the PCM plane from
    * documents.text via the generation rule. */
  def audioStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .filter(col("media_type") === "audio")
      .repartition(pmod(col("doc_id"), lit(decodeSaltModulus(s).toLong)))
      .as[MediaRow]
      .mapPartitions(audioStatsRows _)
      .toDF()
      .agg(count(lit(1)).as("n_clips"),
        sum("n_samples").as("total_samples"),
        sum(expr("n_samples div 8")).as("total_ms"),
        sum("sum_amp").as("sum_amp"),
        sum("crossings").as("total_crossings"))
      .select(col("n_clips"), col("total_samples"), col("total_ms"),
        (floor(col("sum_amp").cast("double")
          / col("total_samples").cast("double")
          * lit(10000.0d) + lit(0.5d)) / lit(10000.0d)).as("mean_amp"),
        col("total_crossings"),
        (floor(col("total_crossings").cast("double")
          / col("n_clips").cast("double")
          * lit(10000.0d) + lit(0.5d)) / lit(10000.0d))
          .as("avg_crossings"))
  }

  private val audioStatsSql =
    """WITH a AS (
      |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
      |         list_transform(generate_series(1, CAST(length(text) AS INTEGER)),
      |           i -> CAST(ord(substr(text, CAST(i AS INTEGER), 1))
      |                AS BIGINT)) AS l
      |  FROM documents WHERE doc_id % 3 = 1),
      |st AS (
      |  SELECT doc_id, n, l,
      |         CAST(list_aggregate(l, 'sum') AS BIGINT) AS s
      |  FROM a),
      |cr AS (
      |  SELECT doc_id, n, s,
      |         CAST(len(list_filter(generate_series(2, CAST(n AS INTEGER)),
      |           i -> (n * l[CAST(i AS INTEGER) - 1] - s)
      |                * (n * l[CAST(i AS INTEGER)] - s) < 0)) AS BIGINT)
      |           AS crossings
      |  FROM st)
      |SELECT CAST(count(*) AS BIGINT) AS n_clips,
      |       CAST(sum(n) AS BIGINT) AS total_samples,
      |       CAST(sum(n // 8) AS BIGINT) AS total_ms,
      |       floor(CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
      |             * 10000.0 + 0.5) / 10000.0 AS mean_amp,
      |       CAST(sum(crossings) AS BIGINT) AS total_crossings,
      |       floor(CAST(sum(crossings) AS DOUBLE) / count(*)
      |             * 10000.0 + 0.5) / 10000.0 AS avg_crossings
      |FROM cr""".stripMargin

  /** Per-video exact motion statistics from the decoded YUV planes. */
  final case class VideoMotion(doc_id: Long, n_frames: Long,
                               n_pairs: Long, abs_diff: Long)

  /** Frame-sampling stride shared with [[decodeMedia]]'s every-6th
    * sampling census. */
  private val FRAME_STRIDE = 6

  def videoMotionRows(rows: Iterator[MediaRow]): Iterator[VideoMotion] =
    rows.map { r =>
      val dec =
        try Some(MediaCodecs.decode(r.payload))
        catch { case scala.util.control.NonFatal(_) => None }
      dec match {
        case None => VideoMotion(r.doc_id, 0L, 0L, 0L)
        case Some(d) =>
          val fs = if (d.nFrames == 0) 0 else d.content.length / d.nFrames
          var pairs = 0L
          var s = 0L
          var f = 0
          while (fs > 0 && f + FRAME_STRIDE < d.nFrames) {
            val o1 = f * fs
            val o2 = (f + FRAME_STRIDE) * fs
            var i = 0
            while (i < fs) {
              s += math.abs((d.content(o1 + i) & 0xff)
                - (d.content(o2 + i) & 0xff))
              i += 1
            }
            pairs += 1
            f += FRAME_STRIDE
          }
          VideoMotion(r.doc_id, d.nFrames.toLong, pairs, s)
      }
    }

  /** Video-corpus motion census over the decoded YUV 4:2:0 planes —
    * the scene-dynamics proxy a video pipeline gates on (a static slide
    * deck and an action clip cost the same to store but not to
    * caption): mean absolute per-byte difference between consecutive
    * SAMPLED frames (stride 6, the [[decodeMedia]] sampling), exact
    * BIGINT sums until one final fix4 division. Clips too short for a
    * sampled pair report zero pairs and are excluded from the mean by
    * construction. Oracle replays the frame planes from documents.text
    * via the generation rule (frame f byte i = text byte
    * (f·fs + i) mod len). */
  def videoMotion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .filter(col("media_type") === "video")
      .repartition(pmod(col("doc_id"), lit(decodeSaltModulus(s).toLong)))
      .as[MediaRow]
      .mapPartitions(videoMotionRows _)
      .toDF()
      .agg(count(lit(1)).as("n_videos"),
        sum("n_frames").as("total_frames"),
        sum("n_pairs").as("total_pairs"),
        sum("abs_diff").as("total_abs_diff"))
      .select(col("n_videos"), col("total_frames"), col("total_pairs"),
        col("total_abs_diff"),
        (floor(col("total_abs_diff").cast("double")
          / greatest(col("total_pairs"), lit(1L)).cast("double")
          * lit(10000.0d) + lit(0.5d)) / lit(10000.0d))
          .as("mean_pair_energy"))
  }

  private val videoMotionSql =
    s"""WITH v AS (
       |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
       |         CAST(1 + doc_id % 24 AS BIGINT) AS nf,
       |         CAST((2 * (2 + length(text) % 7))
       |              * (2 * (2 + (length(text) * 7) % 5)) * 3 // 2
       |              AS BIGINT) AS fs
       |  FROM documents WHERE doc_id % 3 = 2),
       |pairs AS (
       |  SELECT * FROM (
       |    SELECT v.*, unnest(generate_series(0, nf - 1, $FRAME_STRIDE))
       |             AS f
       |    FROM v)
       |  WHERE f + $FRAME_STRIDE < nf),
       |diffs AS (
       |  SELECT doc_id, f,
       |         CAST(list_aggregate(list_transform(
       |             range(0, CAST(fs AS INTEGER)),
       |             i -> CASE WHEN len = 0 THEN 0
       |                  ELSE abs(ord(substr(text,
       |                      1 + CAST((f * fs + i) % len AS INTEGER), 1))
       |                  - ord(substr(text,
       |                      1 + CAST(((f + $FRAME_STRIDE) * fs + i) % len
       |                               AS INTEGER), 1))) END),
       |           'sum') AS BIGINT) AS d
       |  FROM pairs),
       |per AS (
       |  SELECT v.doc_id, any_value(v.nf) AS nf,
       |         CAST(count(diffs.f) AS BIGINT) AS n_pairs,
       |         CAST(coalesce(sum(diffs.d), 0) AS BIGINT) AS abs_diff
       |  FROM v LEFT JOIN diffs ON v.doc_id = diffs.doc_id
       |  GROUP BY v.doc_id)
       |SELECT CAST(count(*) AS BIGINT) AS n_videos,
       |       CAST(sum(nf) AS BIGINT) AS total_frames,
       |       CAST(sum(n_pairs) AS BIGINT) AS total_pairs,
       |       CAST(sum(abs_diff) AS BIGINT) AS total_abs_diff,
       |       floor(CAST(sum(abs_diff) AS DOUBLE)
       |             / greatest(CAST(sum(n_pairs) AS DOUBLE), 1.0)
       |             * 10000.0 + 0.5) / 10000.0 AS mean_pair_energy
       |FROM per""".stripMargin

  /** Per-image decoded census row for [[jpegMeta]]. */
  final case class JpegMeta(doc_id: Long, width: Int, height: Int,
                            plane_bytes: Long, plane_sum: Long)

  /** JPEG fixture dims: whole 8×8 blocks only (bw ≤ 6, bh ≤ 5), so every
    * pixel belongs to a full block and the flat-block exactness argument
    * covers the entire plane. */
  private[graft] def jpegDims(len: Int): (Int, Int) =
    (8 * (1 + len % 6), 8 * (1 + (len * 7) % 5))

  /** Synthesize one REAL baseline JPEG per document: the gray plane is
    * flat per 8×8 block (block b's value = text byte b mod len), which the
    * all-ones quant table round-trips byte-exactly ([[MediaCodecs
    * .encodeJpeg]] — MultimodalSpec proves exactness and javax.imageio
    * conformance), so the decoded-plane stats are oracle-replayable from
    * documents.text even though the FORMAT is lossy. */
  def jpegRow(id: Long, text: String): MediaRow = {
    val tb = text.getBytes("UTF-8")
    val len = tb.length
    val (w, h) = jpegDims(len)
    val bw = w / 8
    val gray = Array.tabulate(w * h) { i =>
      if (len == 0) 0.toByte
      else tb((((i / w) / 8) * bw + (i % w) / 8) % len)
    }
    MediaRow(id, "image", MediaCodecs.encodeJpeg(w, h, gray))
  }

  /** Parse the entropy-coded container back and reduce it to a 5-long
    * census row (corrupt blob = zero row, the skip-and-count posture). */
  def jpegMetaRows(rows: Iterator[MediaRow]): Iterator[JpegMeta] =
    rows.map { r =>
      val d =
        try MediaCodecs.decode(r.payload)
        catch { case scala.util.control.NonFatal(_) =>
          MediaCodecs.Decoded("image", 0, 0, 0, Array.empty[Byte])
        }
      val c = d.content
      var s = 0L
      var j = 0
      while (j < c.length) { s += (c(j) & 0xff); j += 1 }
      JpegMeta(r.doc_id, d.width, d.height, c.length.toLong, s)
    }

  /** JPEG-corpus census over DECODED planes — the compressed-lossy-format
    * twin of [[pngMeta]]: count, fix4 mean dims, exact decoded byte sums.
    * The [[mediaTable]] choreography: encode rides the scan (narrow), the
    * salt shuffle carries only the binary payload (never document text),
    * decode+reduce run in one mapPartitions pass (per-partition codec
    * state), and only 5-long census rows reach the aggregate. */
  def jpegMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(3L)) === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => jpegRow(id, text) }
      .repartition(pmod(col("doc_id"), lit(decodeSaltModulus(s).toLong)))
      .as[MediaRow]
      .mapPartitions(jpegMetaRows _)
      .toDF()
      .agg(count(lit(1)).as("n"),
        (floor(sum("width").cast("double") * lit(10000.0d)
          / count(lit(1)).cast("double") + lit(0.5d)) / lit(10000.0d))
          .as("avg_width"),
        (floor(sum("height").cast("double") * lit(10000.0d)
          / count(lit(1)).cast("double") + lit(0.5d)) / lit(10000.0d))
          .as("avg_height"),
        sum("plane_bytes").as("plane_bytes"),
        sum("plane_sum").as("plane_sum"),
        (floor(sum("plane_sum").cast("double")
          / greatest(sum("plane_bytes"), lit(1L)).cast("double")
          * lit(10000.0d) + lit(0.5d)) / lit(10000.0d)).as("mean_byte"))
  }

  /** Oracle replays the flat-block plane from documents.text: block b of
    * doc d has value text byte (b mod len), each contributing 64 pixels —
    * exact because the all-ones quant table makes flat blocks lossless
    * (DC = 8·(v−128) exactly representable, AC analytically zero). */
  private val jpegMetaSql =
    """WITH img AS (
      |  SELECT CAST(length(text) AS BIGINT) AS len,
      |         CAST(8 * (1 + length(text) % 6) AS BIGINT) AS w,
      |         CAST(8 * (1 + (length(text) * 7) % 5) AS BIGINT) AS h,
      |         text
      |  FROM documents WHERE doc_id % 3 = 0),
      |ps AS (
      |  SELECT w, h, w * h AS nb,
      |         CAST(CASE WHEN len = 0 THEN 0 ELSE
      |           64 * list_aggregate(list_transform(
      |             range(0, CAST((w // 8) * (h // 8) AS INTEGER)),
      |             i -> ord(substr(text, 1 + CAST(i % len AS INTEGER), 1))),
      |           'sum') END AS BIGINT) AS psum
      |  FROM img)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |       floor(CAST(sum(w) AS DOUBLE) * 10000.0
      |             / CAST(count(*) AS DOUBLE) + 0.5) / 10000.0 AS avg_width,
      |       floor(CAST(sum(h) AS DOUBLE) * 10000.0
      |             / CAST(count(*) AS DOUBLE) + 0.5) / 10000.0 AS avg_height,
      |       CAST(sum(nb) AS BIGINT) AS plane_bytes,
      |       CAST(sum(psum) AS BIGINT) AS plane_sum,
      |       floor(CAST(sum(psum) AS DOUBLE)
      |             / greatest(CAST(sum(nb) AS DOUBLE), 1.0)
      |             * 10000.0 + 0.5) / 10000.0 AS mean_byte
      |FROM ps""".stripMargin

  /** Per-image decoded census row for [[jpegColor]]: exact per-channel
    * byte sums of the decoded RGB plane. */
  final case class JpegColorMeta(doc_id: Long, width: Int, height: Int,
                                 sum_r: Long, sum_g: Long, sum_b: Long)

  /** Color-JPEG fixture dims: whole 16×16 MCUs only (≤ 4×3 of them), so
    * every pixel sits in a full MCU and flat-MCU exactness covers the
    * whole plane. */
  private[graft] def jpegColorDims(len: Int): (Int, Int) =
    (16 * (1 + len % 4), 16 * (1 + (len * 7) % 3))

  /** One REAL 4:2:0 color JPEG per document: RGB flat per 16×16 MCU
    * (MCU m's channels = text bytes 3m, 3m+1, 3m+2 mod len). Flat MCUs
    * make the whole lossy chain deterministic END TO END: chroma
    * averaging of equal values is the value, all six blocks per MCU are
    * flat (exact DCT), replication upsample is exact, so the decoded
    * pixel is precisely yccToRgb(rgbToYcc(r,g,b)) — a fixed-point
    * integer chain the DuckDB oracle replays with floor division. */
  def jpegColorRow(id: Long, text: String): MediaRow = {
    val tb = text.getBytes("UTF-8")
    val len = tb.length
    val (w, h) = jpegColorDims(len)
    val mw = w / 16
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val m = ((i / w) / 16) * mw + (i % w) / 16
      val o = i * 3
      if (len > 0) {
        rgb(o) = tb((3 * m) % len)
        rgb(o + 1) = tb((3 * m + 1) % len)
        rgb(o + 2) = tb((3 * m + 2) % len)
      }
      i += 1
    }
    MediaRow(id, "image", MediaCodecs.encodeJpegColor(w, h, rgb))
  }

  def jpegColorRows(rows: Iterator[MediaRow]): Iterator[JpegColorMeta] =
    rows.map { r =>
      val d =
        try MediaCodecs.decode(r.payload)
        catch { case scala.util.control.NonFatal(_) =>
          MediaCodecs.Decoded("image", 0, 0, 0, Array.empty[Byte])
        }
      val c = d.content
      var sr = 0L; var sg = 0L; var sb = 0L
      var j = 0
      while (j + 2 < c.length) {
        sr += c(j) & 0xff; sg += c(j + 1) & 0xff; sb += c(j + 2) & 0xff
        j += 3
      }
      JpegColorMeta(r.doc_id, d.width, d.height, sr, sg, sb)
    }

  /** 4:2:0 COLOR JPEG census over decoded RGB planes — subsampled-chroma
    * realism on top of [[jpegMeta]]'s grayscale: exact per-channel byte
    * sums of what the decoder actually reconstructs. Same choreography:
    * encode on the scan, salt-shuffle binary payloads only, one
    * mapPartitions decode pass, census rows to the aggregate. */
  def jpegColor(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(3L)) === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => jpegColorRow(id, text) }
      .repartition(pmod(col("doc_id"), lit(decodeSaltModulus(s).toLong)))
      .as[MediaRow]
      .mapPartitions(jpegColorRows _)
      .toDF()
      .agg(count(lit(1)).as("n"),
        (floor(sum("width").cast("double") * lit(10000.0d)
          / count(lit(1)).cast("double") + lit(0.5d)) / lit(10000.0d))
          .as("avg_width"),
        (floor(sum("height").cast("double") * lit(10000.0d)
          / count(lit(1)).cast("double") + lit(0.5d)) / lit(10000.0d))
          .as("avg_height"),
        sum((col("width") * col("height")).cast("long") * lit(3L))
          .as("plane_bytes"),
        sum("sum_r").as("sum_r"),
        sum("sum_g").as("sum_g"),
        sum("sum_b").as("sum_b"),
        (floor((sum("sum_r") + sum("sum_g") + sum("sum_b")).cast("double")
          / greatest(sum((col("width") * col("height")).cast("long") * lit(3L)),
            lit(1L)).cast("double")
          * lit(10000.0d) + lit(0.5d)) / lit(10000.0d)).as("mean_byte"))
  }

  /** Oracle replays the ENTIRE lossy pipeline per MCU in integer SQL:
    * forward fixed-point RGB→YCbCr (floor shifts = `//`), the exact
    * flat-MCU round-trip, inverse fixed-point YCbCr→RGB — each MCU
    * contributing 256 pixels; mean_byte = channel sum / Σ w·h·3. */
  private lazy val jpegColorSql = {
    // shared integer-chain fragments: every numerator is OFF-shifted
    // non-negative before // — Java >> floors, DuckDB // truncates, and
    // they agree only on non-negative operands
    val y = "least(greatest((77*r + 150*g + 29*b + 128) // 256, 0), 255)"
    val cb = "least(greatest((-43*r - 85*g + 128*b + 128 + 32768) // 256, 0), 255)"
    val cr = "least(greatest((128*r - 107*g - 21*b + 128 + 32768) // 256, 0), 255)"
    s"""WITH img AS (
      |  SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
      |         CAST(16 * (1 + length(text) % 4) AS BIGINT) AS w,
      |         CAST(16 * (1 + (length(text) * 7) % 3) AS BIGINT) AS h,
      |         text
      |  FROM documents WHERE doc_id % 3 = 0),
      |mcu AS (
      |  SELECT doc_id, w, h,
      |         unnest(range(0, CAST((w // 16) * (h // 16) AS INTEGER))) AS m,
      |         len, text
      |  FROM img),
      |chan AS (
      |  SELECT doc_id, w, h, m,
      |         CASE WHEN len = 0 THEN 0
      |              ELSE ord(substr(text, 1 + CAST((3*m) % len AS INTEGER), 1)) END AS r,
      |         CASE WHEN len = 0 THEN 0
      |              ELSE ord(substr(text, 1 + CAST((3*m + 1) % len AS INTEGER), 1)) END AS g,
      |         CASE WHEN len = 0 THEN 0
      |              ELSE ord(substr(text, 1 + CAST((3*m + 2) % len AS INTEGER), 1)) END AS b
      |  FROM mcu),
      |ycc AS (
      |  SELECT doc_id, w, h, m, $y AS y, $cb AS cb, $cr AS cr FROM chan),
      |dec AS (
      |  SELECT doc_id, w, h, m,
      |         least(greatest(y + (359*(cr - 128) + 128 + 65536) // 256 - 256, 0), 255) AS er,
      |         least(greatest(y - (88*(cb - 128) + 183*(cr - 128) + 128 + 65536) // 256 + 256, 0), 255) AS eg,
      |         least(greatest(y + (454*(cb - 128) + 128 + 65536) // 256 - 256, 0), 255) AS eb
      |  FROM ycc),
      |per AS (
      |  SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
      |         256 * CAST(sum(er) AS BIGINT) AS sr,
      |         256 * CAST(sum(eg) AS BIGINT) AS sg,
      |         256 * CAST(sum(eb) AS BIGINT) AS sb
      |  FROM dec GROUP BY doc_id)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |       floor(CAST(sum(w) AS DOUBLE) * 10000.0
      |             / CAST(count(*) AS DOUBLE) + 0.5) / 10000.0 AS avg_width,
      |       floor(CAST(sum(h) AS DOUBLE) * 10000.0
      |             / CAST(count(*) AS DOUBLE) + 0.5) / 10000.0 AS avg_height,
      |       CAST(sum(w * h * 3) AS BIGINT) AS plane_bytes,
      |       CAST(sum(sr) AS BIGINT) AS sum_r,
      |       CAST(sum(sg) AS BIGINT) AS sum_g,
      |       CAST(sum(sb) AS BIGINT) AS sum_b,
      |       floor(CAST(sum(sr) + sum(sg) + sum(sb) AS DOUBLE)
      |             / greatest(CAST(sum(w * h * 3) AS DOUBLE), 1.0)
      |             * 10000.0 + 0.5) / 10000.0 AS mean_byte
      |FROM per""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q_jpeg_color", jpegColor, Some(jpegColorSql),
      doc = "4:2:0 color-JPEG census over decoded RGB planes: the full " +
        "lossy chain (fixed-point color transform, chroma subsample, " +
        "DCT, entropy coding) made oracle-exact by flat-MCU fixtures"),
    Q("q_jpeg_meta", jpegMeta, Some(jpegMetaSql),
      doc = "baseline-JPEG census over DECODED planes: real T.81 " +
        "entropy-coded bytes round-tripped per document, exact byte " +
        "sums via the flat-block losslessness of the all-ones quant " +
        "table"),
    Q("q_video_motion", videoMotion, Some(videoMotionSql),
      doc = "decoded-YUV motion census: exact abs-diff energy between " +
        "stride-6 sampled frame pairs, the scene-dynamics gate"),
    Q("q_multimodal_meta", metaAgg, Some(metaAggSql)),
    Q("q_multimodal_resize", resizeAgg, Some(resizeAggSql)),
    Q("q_audio_stats", audioStats, Some(audioStatsSql),
      doc = "decoded-PCM audio census: duration at 8 kHz, exact mean " +
        "amplitude, mean-crossing dynamics via exact-rational-mean " +
        "centering"),
    Q("q_media_phash", phashNearDup, Some(phashNearDupSql)),
    Q("q_png_meta", pngMeta, Some(pngMetaSql),
      doc = "PNG-vs-PPM mixed-container census: magic-sniffed format, " +
        "exact decoded-plane byte sums proving DEFLATE + de-filter " +
        "reconstruction"))
}
