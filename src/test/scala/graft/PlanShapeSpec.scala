package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.types.ArrayType

import graft.operators.{Dedup, JoinsPlus}

/** Physical-plan assertions for the SCALE claims the result oracle cannot
  * see: what the shuffles actually carry, and how many there are. These are
  * the properties that decide whether a pipeline survives 100 TB.
  */
class PlanShapeSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private def exchanges(df: DataFrame): Seq[ShuffleExchangeExec] = {
    df.write.format("noop").mode("overwrite").save()
    collect(df.queryExecution.executedPlan) { case e: ShuffleExchangeExec => e }
  }

  test("minhash dedup never shuffles shingle arrays (ids and band keys only)") {
    val ex = exchanges(Dedup.minhashLsh(spark, sfDir))
    assert(ex.nonEmpty)
    ex.foreach { e =>
      val arrayCols = e.output.filter(_.dataType.isInstanceOf[ArrayType])
      assert(arrayCols.isEmpty,
        s"shuffle carries array columns ${arrayCols.map(_.name)} — " +
          "candidate generation must shuffle ids/keys, not documents")
    }
  }

  test("inverted-index ngram dedup shuffles postings, not shingle arrays") {
    val ex = exchanges(Dedup.ngramJaccard(spark, sfDir))
    assert(ex.nonEmpty)
    ex.foreach { e =>
      val arrayCols = e.output.filter(_.dataType.isInstanceOf[ArrayType])
      assert(arrayCols.isEmpty,
        s"shuffle carries array columns ${arrayCols.map(_.name)}")
    }
  }

  test("as-of join runs on a single data exchange (plus output sort)") {
    val df = JoinsPlus.asofAttribution(spark, sfDir)
    val ex = exchanges(df)
    // one hash exchange on user_id for the window; one tiny exchange for
    // the final global ORDER BY of the per-user summary
    assert(ex.size <= 2, s"expected <=2 exchanges, got ${ex.size}:\n" +
      df.queryExecution.executedPlan)
  }

  test("exact dedup shuffles 32-char digests, not normalized text") {
    val ex = exchanges(Dedup.exact(spark, sfDir))
    val shuffledCols = ex.flatMap(_.output.map(_.name))
    assert(!shuffledCols.contains("norm") && !shuffledCols.contains("text"),
      s"shuffled columns: $shuffledCols")
  }
}
