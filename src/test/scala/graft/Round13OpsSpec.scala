package graft

import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** Round-10 driver-round operator suite: Kneser-Ney perplexity. */
class Round13OpsSpec extends SparkSpec {

  test("kn_perplexity: KN is a PROPER distribution — per-history mass sums to 1") {
    import spark.implicits._
    // rebuild the unrounded model exactly as the operator does and
    // check Σ_w2 P(w2|w1) = 1 for every history: absolute discounting
    // redistributes EXACTLY the discounted mass through the
    // continuation distribution, so any formula slip (wrong backoff
    // weight, unigram instead of continuation counts) breaks this.
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", split(trim(lower($"text")), "\\s+").as("toks"))
    val bi = docs
      .select($"doc_id", $"toks",
              posexplode(expr("slice(toks, 2, size(toks) - 1)"))
                .as(Seq("p", "w2")))
      .select(element_at($"toks", $"p" + 1).as("w1"), $"w2")
    val cb = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("cb"))
    val hist = cb.groupBy($"w1")
      .agg(sum($"cb").as("c1"), count(lit(1)).as("n1f"))
    val cont = cb.groupBy($"w2").agg(count(lit(1)).as("n1b"))
    val types = cb.agg(count(lit(1)).as("t_types"))
    // Σ_w2 over OBSERVED bigrams of max(c-D,0)/c1 leaves mass D·N1f/c1,
    // which the backoff spreads over the continuation distribution —
    // but only the observed-w2 slice is joined here, so add the
    // unobserved remainder analytically: λ(w1)·(1 − Σ_observed Pcont).
    val byHist = cb.join(hist, "w1").join(cont, "w2")
      .crossJoin(broadcast(types))
      .select($"w1", $"c1", $"n1f", $"t_types",
        (greatest($"cb" - lit(0.75), lit(0.0)) / $"c1" +
          (lit(0.75) * $"n1f" / $"c1") * ($"n1b" / $"t_types")).as("p"),
        ($"n1b".cast("double") / $"t_types").as("pcont"))
      .groupBy($"w1")
      .agg(sum($"p").as("observed_mass"),
           first($"c1").as("c1"), first($"n1f").as("n1f"),
           first($"t_types").as("t_types"),
           sum($"pcont").as("observed_cont"))
      .withColumn("total_mass",
        $"observed_mass" +
          (lit(0.75) * $"n1f" / $"c1") * (lit(1.0) - $"observed_cont"))
    val bad = byHist.filter(abs($"total_mass" - 1.0) > 1e-9).count()
    assert(bad === 0L)
  }

  test("dedup_canonical: keeps the longest member; token accounting closes") {
    import spark.implicits._
    val out = graft.llm.Dedup.dedupCanonical(spark, sf).collect()
    val clusters = graft.llm.Dedup.dedupClusters(spark, sf)
      .collect().map(r => r.getAs[Long]("cluster_id") -> r.getAs[Long]("n_docs"))
      .toMap
    // same partition of the corpus as dedup_clusters
    assert(out.map(r => r.getAs[Long]("cluster_id") ->
      r.getAs[Long]("n_docs")).toMap === clusters)
    // independent membership recount: kept is a true member with the
    // cluster-max token count, and kept + dropped covers every member
    val toksz = Tables.documents(spark, sf)
      .select($"doc_id",
        size(split(trim(lower($"text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val members = graft.llm.Dedup.ngramJaccard(spark, sf, 0.2)
      .select($"doc_a", $"doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    out.foreach { r =>
      val kept = r.getAs[Long]("kept_doc")
      assert(members.contains(kept))
      assert(r.getAs[Long]("kept_tokens") === toksz(kept))
      assert(r.getAs[Long]("kept_tokens") +
        r.getAs[Long]("dropped_tokens") >= r.getAs[Long]("n_docs"))
    }
  }

  test("kn_perplexity: one row per multi-token doc, positive integer sums") {
    import spark.implicits._
    val out = TextOps.knPerplexity(spark, sf)
    val nMulti = Tables.documents(spark, sf)
      .filter(size(split(trim(lower($"text")), "\\s+")) >= 2).count()
    assert(out.count() === nMulti)
    val rows = out.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") >= 1L)
      assert(r.getAs[Long]("sum_s_micro") >= 0L)
      assert(r.getAs[Double]("mean_bits") >= 0.0)
    }
  }
}
