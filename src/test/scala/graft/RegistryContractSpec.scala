package graft

/** Registry-level invariants of the driver contract — cheap structural
  * checks that catch wiring mistakes the per-operator specs can't see.
  */
class RegistryContractSpec extends SparkTestBase {

  test("query names are unique across all operator modules") {
    // A duplicate name silently loses one operator behind the other in
    // the queries Map (this really happened: TextAnalysis's and
    // Curation's stratified samplers both registered q_stratified_sample
    // for one round). The raw pre-Map order surfaces it.
    val names = SparkEntry.registeredNames
    val dupes = names.groupBy(identity).collect {
      case (n, occ) if occ.size > 1 => n
    }
    assert(dupes.isEmpty, s"duplicate registrations: ${dupes.mkString(", ")}")
  }

  test("every oracle belongs to a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("no registered query's result schema carries DecimalType") {
    // The r12/r13 q_correlated lesson as a compile-time-adjacent gate:
    // Spark parses SQL-text literals like `100.0` as DECIMAL, so a
    // GraftSql-executed query can silently type a result column
    // DECIMAL(34,7) where DuckDB types the same expression DOUBLE — the
    // driver hashes typed values, so the mismatch is a red row even with
    // bit-identical values, and the local DuckDB→pandas round-trip
    // coerces it invisibly. Catching the DECIMAL at the SCHEMA makes the
    // class unshippable. Intentionally-decimal queries must be listed
    // here explicitly (none today).
    val intentionallyDecimal = Set.empty[String]
    val spark = SparkTestBase.session
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !intentionallyDecimal(name) =>
        import org.apache.spark.sql.types._
        def hasDecimal(dt: DataType): Boolean = dt match {
          case _: DecimalType => true
          case a: ArrayType => hasDecimal(a.elementType)
          case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
          case st: StructType => st.fields.exists(f => hasDecimal(f.dataType))
          case _ => false
        }
        val bad = scala.util.Try(fn(spark, sfDir).schema).toOption.toSeq
          .flatMap(_.fields)
          .filter(f => hasDecimal(f.dataType))
          .map(f => s"$name.${f.name}: ${f.dataType.simpleString}")
        spark.catalog.clearCache()
        bad
      case _ => Nil
    }
    assert(offenders.isEmpty,
      s"decimal-typed result columns (cast to DOUBLE/BIGINT in the " +
        s"query): ${offenders.mkString("; ")}")
  }

  test("rows-only (oracle-less) queries stay an explicit small set") {
    // Every addition to this set is a DECISION (the driver records a
    // weaker rows-only check for it) — grow it consciously, not by
    // forgetting an oracle.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val declared = Set("q_approx_distinct", "q_hll_rollup",
      "q_percentile_approx", "q_sortwithin_sizes", "q_pca_variance")
    assert(rowsOnly == declared,
      s"rows-only drift: unexpected=${rowsOnly -- declared} " +
        s"missing=${declared -- rowsOnly}")
  }
}
