package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two array<double> columns.
  *
  * Why a custom Catalyst Expression (SURVEY.md §7.5's one sanctioned case):
  * the built-in higher-order-function formulation
  * `aggregate(zip_with(a, b, (p,q) -> p*q), 0d, (s,v) -> s+v)` is correct
  * but not codegen-capable — each row pays lambda interpretation plus an
  * intermediate array allocation, and it breaks the surrounding
  * whole-stage-codegen span. This expression generates a tight primitive
  * loop instead (profiled ~5× on the pairwise-cosine workloads).
  *
  * Semantics are IDENTICAL to the HOF form and to DuckDB's
  * `list_dot_product`: a sequential left-to-right fold `s += a[i]*b[i]`,
  * so oracle comparisons stay bit-exact. Elements must be non-null
  * (embedding vectors; enforced upstream by construction). If lengths
  * differ, the shorter length is used.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_d requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

/** Registration for graft's native expressions. Two paths:
  *  - [[GraftFunctions.register]]: imperative, idempotent — callable on any
  *    existing session (the driver builds its own sessions).
  *  - [[GraftExtensions]]: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    for cluster deployments where the session is built from conf.
  */
object GraftFunctions {
  // registerFunction logs a "replaced a previously registered function"
  // WARN on every repeat call; operators call register defensively from
  // every entry point, so memoize per session (keyed on identity — a
  // stopped session just stays in the map, there are O(1) per JVM)
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) doRegister(spark)

  private def doRegister(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotProductD].getName, "dot_d"),
      exprs => DotProductD(exprs(0), exprs(1)))
    reg.registerFunction(
      FunctionIdentifier("simhash32_d"),
      new ExpressionInfo(classOf[SimHash32D].getName, "simhash32_d"),
      exprs => SimHash32D(exprs(0)))
    reg.registerFunction(
      FunctionIdentifier("minhash_slices"),
      new ExpressionInfo(classOf[MinHashSlicesD].getName, "minhash_slices"),
      exprs => MinHashSlicesD(exprs(0)))
    reg.registerFunction(
      FunctionIdentifier("rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fingerprint"),
      exprs => RollingFingerprint(exprs(0)))
    reg.registerFunction(
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      exprs => WordShingles(exprs(0), extractIntLiteral(exprs(1), "word_shingles")))
    reg.registerFunction(
      FunctionIdentifier("fingerprint_min"),
      new ExpressionInfo(classOf[FingerprintMin].getName, "fingerprint_min"),
      exprs => FingerprintMin(exprs(0), extractIntLiteral(exprs(1), "fingerprint_min")))
    reg.registerFunction(
      FunctionIdentifier("hilbert_d"),
      new ExpressionInfo(classOf[HilbertD].getName, "hilbert_d"),
      exprs => HilbertD(exprs(0), exprs(1),
        extractIntLiteral(exprs(2), "hilbert_d")))
    reg.registerFunction(
      FunctionIdentifier("myers_ed"),
      new ExpressionInfo(classOf[MyersEdK].getName, "myers_ed"),
      exprs => MyersEdK(exprs(0), exprs(1),
        extractIntLiteral(exprs(2), "myers_ed")))
  }

  private[functions] def extractIntLiteral(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: second argument must be an integer literal, got $other")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotProductD].getName, "dot_d"),
      (exprs: Seq[Expression]) => DotProductD(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash32_d"),
      new ExpressionInfo(classOf[SimHash32D].getName, "simhash32_d"),
      (exprs: Seq[Expression]) => SimHash32D(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("minhash_slices"),
      new ExpressionInfo(classOf[MinHashSlicesD].getName, "minhash_slices"),
      (exprs: Seq[Expression]) => MinHashSlicesD(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fingerprint"),
      (exprs: Seq[Expression]) => RollingFingerprint(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) =>
        WordShingles(exprs(0), GraftFunctions.extractIntLiteral(exprs(1), "word_shingles"))))
    ext.injectFunction((
      FunctionIdentifier("fingerprint_min"),
      new ExpressionInfo(classOf[FingerprintMin].getName, "fingerprint_min"),
      (exprs: Seq[Expression]) =>
        FingerprintMin(exprs(0), GraftFunctions.extractIntLiteral(exprs(1), "fingerprint_min"))))
    ext.injectFunction((
      FunctionIdentifier("hilbert_d"),
      new ExpressionInfo(classOf[HilbertD].getName, "hilbert_d"),
      (exprs: Seq[Expression]) =>
        HilbertD(exprs(0), exprs(1),
          GraftFunctions.extractIntLiteral(exprs(2), "hilbert_d"))))
  }
}
