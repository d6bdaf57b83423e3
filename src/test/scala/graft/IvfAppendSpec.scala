package graft

import graft.llm.SimOps

/** Incremental ANN index append: the unioned (base + appended) parquet
  * index must equal a full re-assignment under the SAME frozen
  * centroids — arrival time can never change the index — and the
  * staleness report must flag exactly when the appended cohort's
  * quantization error crosses the threshold. */
class IvfAppendSpec extends SparkSpec {

  test("union of persisted base+appended lists ≡ rebuild with frozen centroids") {
    // force a fresh build (the per-JVM cache may hold another suite's)
    SimOps.ivfIndexCache.remove(s"$sf#append")
    // run the probe once to materialize the two parquet lists
    val probed = SimOps.ivfAppend(spark, sf).collect()
    assert(probed.nonEmpty)
    val idxDir = SimOps.ivfIndexCache.get(s"$sf#append")
    assert(idxDir != null)
    val union = spark.read.parquet(s"$idxDir/base", s"$idxDir/appended")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rebuild = SimOps.appendAssignAll(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(union === rebuild,
      "appended index must be bit-identical to a frozen-centroid rebuild")
    // both cohorts genuinely present in the persisted index
    val nBase = spark.read.parquet(s"$idxDir/base").count()
    val nApp = spark.read.parquet(s"$idxDir/appended").count()
    assert(nBase > 0 && nApp > 0)
    assert(nBase + nApp === union.size.toLong)
  }

  test("drift report: stationary corpus is not stale; tight tau flags it") {
    val rows = SimOps.ivfAppendDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    // the synthetic corpus is iid: appended error ≈ base error, nothing
    // stale at the default 1.5 tau
    rows.foreach { r =>
      assert(!r.getAs[Boolean]("stale"),
        s"cid ${r.getAs[Long]("cid")} falsely stale: $r")
      val ratio = Option(r.getAs[java.lang.Double]("drift_ratio"))
      ratio.foreach(x => assert(x > 0.5 && x < 1.5, s"implausible ratio $x"))
    }
    // the flag is live: a tau below some observed ratio trips it
    val ratios = rows.flatMap(r =>
      Option(r.getAs[java.lang.Double]("drift_ratio")).map(_.doubleValue))
    assert(ratios.nonEmpty)
    val tight = ratios.min / 2
    val flagged = SimOps.ivfAppendDrift(spark, sf, staleTau = tight).collect()
      .count(_.getAs[Boolean]("stale"))
    assert(flagged > 0, s"tau=$tight should flag at least one centroid")
  }

  test("segment merge: post-compaction probe ≡ pre-merge masked union probe bit-for-bit") {
    // the FAISS merge_from / Lucene segment-merge contract: folding
    // base + appended segments and the tombstone mask into one index
    // is pure storage reclamation — probes are unchanged
    val pre = SimOps.ivfMaskedUnionProbe(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    val post = SimOps.ivfCompact(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    assert(pre === post)
    assert(pre.nonEmpty)
    // tombstoned ids appear nowhere — not as queries, not as neighbors
    val rows = SimOps.ivfCompact(spark, sf).collect()
    assert(rows.forall(r => r.getAs[Long]("query_id") % 7 != 0 &&
      r.getAs[Long]("neighbor_id") % 7 != 0))
  }
}
