package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** AS-OF JOIN as a first-class operator — logical node + planner
  * strategy + physical exec, the (c)-tier extension path for semantics
  * the built-in operators can't state directly. The composed spelling
  * (union + last-ignore-nulls window, `JoinsPlus.asofAttribution`) is
  * correct but materializes BOTH sides through one window; this operator
  * says what it means: for every left row, the LATEST right row of the
  * same key with rightTime ≤ leftTime, left-outer.
  *
  * Physical contract (the part that matters at 100 TB): children are
  * required hash-CLUSTERED on the key and SORTED by (key, time) — Spark's
  * EnsureRequirements inserts exactly the exchanges/sorts needed and
  * co-partitions the sides — and the merge itself is a single forward
  * pass over each partition pair holding ONE candidate row: no window
  * buffer, no per-key group materialization, O(1) state per partition.
  *
  * The merge compares BIGINT; the API layer widens narrower integrals
  * with casts and passes timestamps through (their internal form is
  * epoch-µs). Null key/time on the left → unmatched; on the right →
  * the row is skipped.
  */
final case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                              leftKey: Expression, rightKey: Expression,
                              leftTime: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                              leftKey: Expression, rightKey: Expression,
                              leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lkB = BindReferences.bindReference(leftKey, lOut)
    val ltB = BindReferences.bindReference(leftTime, lOut)
    val rkB = BindReferences.bindReference(rightKey, rOut)
    val rtB = BindReferences.bindReference(rightTime, rOut)
    val outAttrs = output
    val nRight = rOut.length
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      // input schema declares the right side NULLABLE — the generated
      // projection must null-check the unmatched-row slots (binding
      // against the children's non-null attrs read uninitialized zeros)
      val project = UnsafeProjection.create(
        outAttrs.asInstanceOf[Seq[Expression]],
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      val rBuf = rIt.buffered
      new Iterator[InternalRow] {
        // the single held candidate: the latest right row seen whose
        // (key, time) is ≤ the current left frontier — COPIED, because
        // upstream sorters reuse row objects
        private var held: InternalRow = null
        private var heldKey = 0L

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val lkV = lkB.eval(l)
          val ltV = ltB.eval(l)
          if (lkV == null || ltV == null) return project(joined(l, nullRight))
          val k = lkV.asInstanceOf[Long]
          val t = ltV.asInstanceOf[Long]
          var go = true
          while (go && rBuf.hasNext) {
            val r = rBuf.head
            val rkV = rkB.eval(r)
            val rtV = rtB.eval(r)
            if (rkV == null || rtV == null) rBuf.next()
            else {
              val rk = rkV.asInstanceOf[Long]
              val rt = rtV.asInstanceOf[Long]
              // rows of past keys can never match again (left keys are
              // ascending): drop; same-key rows within time → new best
              if (rk < k || (rk == k && rt <= t)) {
                if (rk == k) { held = r.copy(); heldKey = k }
                rBuf.next()
              } else go = false
            }
          }
          if (held != null && heldKey == k) project(joined(l, held))
          else project(joined(l, nullRight))
        }
      }
    }
  }
}

final class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Filter pushdown through [[AsOfJoinPlan]] — the optimizer half a custom
  * logical node must bring along: Catalyst's PushPredicateThroughJoin only
  * understands built-in Join nodes, so without this rule a `Filter` above
  * an as-of join reads BOTH sides in full and filters after the merge. A
  * deterministic conjunct referencing only LEFT-side attributes commutes
  * with the left-outer as-of semantics (every output row derives from
  * exactly one left row, and dropping a left row never affects another
  * row's matched candidate), so it moves to the left child — where normal
  * pushdown carries it all the way into the parquet scan. Right-side
  * conjuncts stay put: they see null-extended slots and filtering the
  * right INPUT would change which candidate is "latest". */
object PushFilterThroughAsOf
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(push.reduce(And), a.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Public entry: `AsOf.join(left, right, key, leftTime, rightTime)` —
  * `key` names the join key on BOTH input sides. Key/time columns may be
  * any integral type (widened to BIGINT with an inserted cast) or —
  * for the time pair — TIMESTAMP/TIMESTAMP_NTZ, whose internal
  * representation already IS epoch-µs BIGINT, so they flow through the
  * merge unchanged; the two time columns must share a category
  * (both temporal or both integral — comparing raw integers against
  * epoch-µs is a semantic error this API refuses to guess at). The right
  * side's columns come back prefixed `__r_`: the rename doubles as the
  * self-join guard — aliasing mints FRESH exprIds, so a right side that
  * shares lineage with the left (both filtered from one table — the
  * common as-of shape) can't collide. Without it the analyzer's
  * DeduplicateRelations rewrites the right subtree's ids but cannot
  * know a custom node's `rightKey` belonged to the right child, leaving
  * it bound to the LEFT side's identically-numbered attribute. */
object AsOf {
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String): DataFrame = {
    val s = left.sparkSession
    if (!s.experimental.extraStrategies.exists(_.isInstanceOf[AsOfJoinStrategy]))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ new AsOfJoinStrategy
    if (!s.experimental.extraOptimizations.contains(PushFilterThroughAsOf))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ PushFilterThroughAsOf
    val rAliased = right.select(
      right.columns.toIndexedSeq.map(c => right(c).as(s"__r_$c")): _*)
    val lp = left.queryExecution.analyzed
    val rp = rAliased.queryExecution.analyzed
    def att(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"AsOf.join: no column '$n' on the $side side"))
    val (lk, lt) = (att(lp, key, "left"), att(lp, leftTime, "left"))
    val rk = att(rp, s"__r_$key", "right")
    val rt = att(rp, s"__r_$rightTime", "right")
    // widen to the exec's BIGINT merge: narrower integrals get an
    // explicit cast (EnsureRequirements then clusters/sorts on the cast
    // expression); timestamps pass through — their internal form is
    // epoch-µs as Long, exactly what the merge compares
    def widened(a: Attribute): Expression = a.dataType match {
      case LongType | TimestampType | TimestampNTZType => a
      case IntegerType | ShortType | ByteType => Cast(a, LongType)
      case dt => sys.error(s"AsOf.join: column '${a.name}' must be an " +
        s"integral or timestamp type, got ${dt.catalogString}")
    }
    def temporal(a: Attribute): Boolean = a.dataType match {
      case TimestampType | TimestampNTZType => true
      case _ => false
    }
    require(temporal(lt) == temporal(rt),
      s"AsOf.join: time columns '${lt.name}' (${lt.dataType.catalogString}) " +
        s"and '${rt.name}' (${rt.dataType.catalogString}) must both be " +
        "temporal or both integral")
    // Same category check for the KEY pair: a TIMESTAMP key is epoch-µs
    // internally, so equating it with a raw integral key would compare
    // µs against ids — the exact silent-mismatch the time check refuses.
    require(temporal(lk) == temporal(rk),
      s"AsOf.join: key columns '${lk.name}' (${lk.dataType.catalogString}) " +
        s"and '${rk.name}' (${rk.dataType.catalogString}) must both be " +
        "temporal or both integral")
    org.apache.spark.sql.graft.PlanShim.ofRows(
      s, AsOfJoinPlan(lp, rp, widened(lk), widened(rk),
        widened(lt), widened(rt)))
  }
}
