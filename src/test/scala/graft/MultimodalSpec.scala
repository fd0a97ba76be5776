package graft

import org.apache.spark.sql.functions._

import graft.operators.{DecodedMedia, MediaRow, Multimodal}

class MultimodalSpec extends SparkTestBase {

  test("payload binary roundtrips the utf8 text") {
    val row = Multimodal.mediaTable(spark, sfDir)
      .filter(col("doc_id") === 0).head()
    val payload = row.getAs[Array[Byte]]("payload")
    val text = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 0).head().getAs[String]("text")
    assert(new String(payload, "UTF-8") == text)
  }

  test("decode stub is deterministic and batch-shaped") {
    val a = Multimodal.decoded(spark, sfDir).collect().sortBy(_.doc_id)
    val b = Multimodal.decoded(spark, sfDir).collect().sortBy(_.doc_id)
    assert(a.length == 500)
    assert(a.map(_.doc_id).sameElements(b.map(_.doc_id)))
    assert(a.zip(b).forall { case (x, y) =>
      x.width == y.width && x.feature.sameElements(y.feature) })
    // shapes a real decoder would produce
    assert(a.forall(_.feature.length == 8))
    assert(a.forall(d => d.width >= 64 && d.height >= 64))
    assert(a.forall(d => d.n_sampled == (d.n_frames + 5) / 6))
    assert(a.forall(d => d.feature(0) == (d.brightness / 255.0).toFloat))
  }

  test("modalities partition the corpus") {
    val counts = Multimodal.decoded(spark, sfDir)
      .groupBy("media_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("image", "audio", "video"))
    assert(counts.values.sum == 500)
  }
}
