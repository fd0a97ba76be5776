package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Profiling, Similarity}

/** Planted-data SEMANTICS for the round-6 census operators — the oracle
  * twin proves Spark and DuckDB compute the same thing; these prove it is
  * the RIGHT thing on inputs whose answer is hand-computable.
  */
class CensusSemanticsSpec extends SparkTestBase {

  test("watermark sweep counts exactly the planted late arrivals per delay") {
    import spark.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // user 1: arrival order 1,2,3 with event times 1000, 400, 940 —
    // event 2 is 600 s late vs the running max, event 3 is 60 s late.
    // user 2: perfectly ordered — contributes no lateness.
    val events = Seq(
      (1L, 1L, ts(1000)), (1L, 2L, ts(400)), (1L, 3L, ts(940)),
      (2L, 4L, ts(10)), (2L, 5L, ts(20))
    ).toDF("user_id", "event_id", "ts")
    val out = Profiling.watermarkSweepOn(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // delay 0: both disordered events are late (lag > 0)
    assert(out(0L)._1 == 2L, s"delay 0 late count: ${out(0L)}")
    // delay 60 s: the 60 s-late event is NOT late (lag must exceed D)
    assert(out(60L)._1 == 1L, s"delay 60 late count: ${out(60L)}")
    // delay 300 s: only the 600 s-late event remains
    assert(out(300L)._1 == 1L)
    // delay 900 s: nothing is that late
    assert(out(900L)._1 == 0L && out(3600L)._1 == 0L)
    // pct_late = n_late / 5, floor-fixed to 4 dp
    assert(out(0L)._2 == 0.4d)
  }

  test("embedding profile flags planted zero vectors and collapsed dims") {
    import spark.implicits._
    // 4 vectors in 3-d: dim 2 is CONSTANT (collapsed, var 0); one vector
    // is all-zero (zero norm); dims 0/1 vary.
    val vecs = Seq(
      (0L, Seq(1.0d, 0.0d, 0.5d)),
      (1L, Seq(0.0d, 2.0d, 0.5d)),
      (2L, Seq(3.0d, 1.0d, 0.5d)),
      (3L, Seq(0.0d, 0.0d, 0.0d))
    ).toDF("vec_id", "emb")
      .withColumn("nrm", expr("sqrt(aggregate(emb, 0D, (a, x) -> a + x * x))"))
    val r = Similarity.embeddingProfileOn(vecs).collect().head
    assert(r.getAs[Long]("n_vecs") == 4L)
    assert(r.getAs[Long]("n_dims") == 3L)
    assert(r.getAs[Long]("n_zero") == 1L, "the all-zero vector must be flagged")
    // dim 2 has values (.5,.5,.5,0) — NOT collapsed (the zero vector
    // varies it); no dim is constant across all four vectors, so plant a
    // truly-constant check on the first three vectors only
    val r3 = Similarity.embeddingProfileOn(vecs.filter(col("vec_id") < 3))
      .collect().head
    assert(r3.getAs[Long]("n_collapsed_dims") == 1L,
      s"dim 2 is constant over the first three vectors: $r3")
    assert(r3.getAs[Long]("n_zero") == 0L)
    assert(r3.getAs[Double]("norm_min") > 0d)
    // max variance sits on dim 0 (values 1,0,3): var = E[x^2]-E[x]^2 =
    // (10/3) - (4/3)^2 = 14/9 ~= 1.5555...; fixed to 8 dp
    assert(math.abs(r3.getAs[Double]("max_dim_var") - 14.0 / 9.0) < 1e-6,
      s"max_dim_var: $r3")
  }
}
