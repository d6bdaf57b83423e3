package graft

/** Locks in the plan-quality invariants SURVEY §4 promises, across the
  * ENTIRE query catalog: no sort-based aggregation anywhere, no
  * cartesian products, and nested-loop broadcast joins only where they
  * are the intended shape (scalar-subquery broadcast, ANN brute-force
  * scoring against a broadcast query set). A regression in any future
  * operator fails here by name. */
class PlanHygieneSpec extends SparkSpec {

  private val bnljIntended = Set(
    "q_scalar_subquery",    // single-row subquery broadcast
    "sim_topk_bruteforce",  // corpus × broadcast query set (by design)
    "sim_int8_topk",
    "sim_ivf_ann",
    "sim_ivf_nprobe2",
    "sim_pq_ann",           // codebook-scoring cross (broadcast train set)
    "sim_range_search",     // corpus × broadcast query set (by design)
    "sim_mrl_rerank",       // corpus × broadcast query set (by design)
    "sim_hybrid_rrf",       // corpus × 1-row broadcast query vector
    "sim_nprobe_sweep",     // brute-force baseline inside the evaluation
    "sim_recall_at_k",      // composes the bruteforce pass (same shape)
    "text_mix_weights",     // 5-row agg × 1-row total broadcast
    "text_bm25",            // tf rows × 1-row corpus-stats broadcast
    "text_dsir_weights",    // bucket table × 1-row distribution totals
    "text_bigram_surprisal", // bigram model × 1-row corpus total
    "text_doc_freq",        // term aggregates × 1-row doc-count broadcast
    "text_unigram_surprisal", // token stream × 1-row corpus-total broadcast
    "text_surprisal_buckets", // composes unigram_surprisal (same shape)
    "q_width_bucket",       // scan × 1-row min/max bounds broadcast
    "q_triangle_support",   // edge supports × 1-row global-count broadcast
    "q_skew_diagnose")      // top-k rows × 1-row global-stats broadcast

  test("every query plans hash aggregation, no cartesians, whitelisted BNLJ only") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val confs = SparkEntry.queryConfs.getOrElse(name, Map.empty)
      SparkEntry.withConfs(spark, confs) {
        val plan =
          try fn(spark, sf).queryExecution.executedPlan.toString
          catch { case e: Throwable => offenders += s"$name: plan failed ${e.getMessage}"; "" }
        if (plan.contains("SortAggregate")) offenders += s"$name: SortAggregate"
        if (plan.contains("CartesianProduct")) offenders += s"$name: CartesianProduct"
        if (plan.contains("BroadcastNestedLoop") && !bnljIntended(name))
          offenders += s"$name: unexpected BroadcastNestedLoopJoin"
      }
    }
    assert(offenders.isEmpty, s"plan hygiene violations:\n${offenders.mkString("\n")}")
  }
}
