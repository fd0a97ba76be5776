package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.TrainPipeline

/** Properties of the composed training-data pipeline that the summary
  * oracle cannot see directly. */
class TrainPipelineSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  test("prepared corpus has unique content digests and clean stages") {
    val p = TrainPipeline.prepared(spark, sfDir).cache()
    try {
      val withHash = Tables.documents(spark, sfDir)
        .withColumn("h", md5(graft.functions.TextFns.normalize(col("text"))))
        .select("doc_id", "h")
      val joined = p.join(withHash, "doc_id")
      // dedup: one survivor per digest, and it is the min doc_id
      assert(joined.groupBy("h").count().filter(col("count") > 1).isEmpty,
        "duplicate digest survived dedup")
      val minIds = withHash.groupBy("h").agg(min("doc_id").as("m"))
      assert(joined.join(minIds, joined("h") === minIds("h"))
        .filter(col("doc_id") =!= col("m")).isEmpty,
        "survivor is not the min doc_id of its digest group")
      // quality filter: every survivor clears the cutoff
      assert(p.filter(col("quality") < 0.4).isEmpty,
        "document below the quality cutoff survived")
      // split: total partition into exactly {train, test}
      val splits = p.select("split").distinct().collect().map(_.getString(0))
      assert(splits.toSet.subsetOf(Set("train", "test")))
    } finally p.unpersist()
  }

  test("dedup keep-one aggregation shuffles digests and ids, never text") {
    val df = TrainPipeline.summary(spark, sfDir)
    df.collect()
    val ex = collect(df.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    assert(ex.nonEmpty)
    ex.foreach { e =>
      assert(!e.output.exists(_.name == "text"),
        s"pipeline exchange carries document text:\n$e")
    }
  }
}
