package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregation (SURVEY.md §2.8): a weighted mean as an
  * `Aggregator[IN, BUF, OUT]` registered through `udaf(...)`. The buffer is
  * two doubles, so the partial/final (map-side combine) phases Spark runs
  * for any Aggregator stay O(1) per group per partition — the same
  * mergeable-state discipline a 100 TB aggregation needs.
  *
  * Note on floats: weighted sums accumulate in partition order, which is
  * nondeterministic across runs; results must be rounded (as all our
  * oracle-compared floats are) and inputs kept in double.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
