package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-level invariants of the driver contract — cheap structural
  * checks that catch wiring mistakes the per-operator specs can't see.
  */
class RegistryContractSpec extends AnyFunSuite {

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
