package graft

/** Driver-contract guards over the query catalog itself: every oracle
  * names a real query, and the rows-only set (queries without SQL
  * oracles, where the driver records a weaker rows-only check) is
  * EXACTLY the documented list — a new query silently missing its
  * oracle fails here by name instead of surfacing as a soft
  * "no_oracle" in the driver's correctness report. */
class CatalogSpec extends SparkSpec {

  private val rowsOnlyDocumented = Set(
    "tel_approx_distinct",    // HLL++ estimate (inherently approximate)
    "tel_approx_percentiles", // GK sketch (inherently approximate)
    "tel_sketch_rollup",      // HLL sketch-column union
    // (sim_opq_trained left this set in r14: the learned rotation is
    // now the closed-form Givens sweep the oracle replays exactly)
    "text_bpe_train_batched") // greedy batched admission is sequential
                              // logic no SQL replica expresses; batch=1
                              // ≡ sequential + per-round savings
                              // identity asserted in Round12OpsSpec
  // r10: tel_cms_counts left this set — the md5-row-salted CMS is
  // deterministic and now SQL-hash-verified like minhash/simhash

  test("every oracle belongs to a query; rows-only set is exactly documented") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty, s"oracles without queries: ${os -- qs}")
    assert(qs -- os === rowsOnlyDocumented,
      s"undocumented rows-only queries: ${(qs -- os) -- rowsOnlyDocumented}; " +
        s"stale rows-only entries: ${rowsOnlyDocumented -- (qs -- os)}")
  }

  test("queryConfs only references real queries") {
    assert(SparkEntry.queryConfs.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
