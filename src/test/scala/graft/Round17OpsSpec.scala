package graft

import org.apache.spark.sql.functions._

import graft.llm.{AudioOps, Dedup, SimOps, TextOps}

/** Round-17 operator suite: token-budget selection, leakage-safe
  * cluster split, graded ANN ranking eval, audio clipping QA. */
class Round17OpsSpec extends SparkSpec {

  test("text_token_budget: from-scratch replica + straddler semantics") {
    import spark.implicits._
    val budget = 800L
    val out = TextOps.tokenBudget(spark, sf, budget).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_total"),
         r.getAs[Long]("n_kept"), r.getAs[Long]("tokens_kept"),
         r.getAs[Long]("kept_bp"))).toMap
    // independent recompute: per source, order docs by (md5(id), id),
    // keep while the running total STARTS under budget
    val docs = Tables.documents(spark, sf)
      .select($"source", $"doc_id",
        size(split(trim($"text"), "\\s+")).cast("long").as("n"),
        md5($"doc_id".cast("string")).as("h"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    assert(out.keySet === docs.keySet)
    docs.foreach { case (src, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2))
      var cum = 0L
      var kept = 0L
      var keptTok = 0L
      ordered.foreach { r =>
        if (cum < budget) { kept += 1; keptTok += r._3 }
        cum += r._3
      }
      val total = ordered.map(_._3).sum
      assert(out(src) === ((ordered.size.toLong, total, kept, keptTok,
        keptTok * 10000L / total)), s"source $src")
      // the straddler is included: kept mass reaches the budget (or
      // the source ran out), and removing the last kept doc drops
      // back under it
      assert(keptTok >= math.min(budget, total))
    }
  }

  test("text_cluster_split: near-dup pairs never straddle splits; " +
      "aggregate matches the per-doc rule") {
    import spark.implicits._
    val pairs = Dedup.ngramJaccard(spark, sf, 0.2)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must mine at least one near-dup pair")
    // per-doc labels via an INDEPENDENT union-find over the same pairs
    // (label = min member id, the adaptiveComponents contract)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val labels: Map[Long, Long] =
      pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(d => d -> find(d)).toMap
    def splitOf(rep: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(rep.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 2)
      if (hex < "cd") "train" else if (hex < "e6") "val" else "test"
    }
    val docSplit: Long => String =
      id => splitOf(labels.getOrElse(id, id))
    pairs.foreach { case (a, b) =>
      assert(docSplit(a) === docSplit(b),
        s"near-dup pair ($a,$b) straddles splits")
    }
    // aggregate cross-check
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        size(split(trim($"text"), "\\s+")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = docs.groupBy(d => (d._2, docSplit(d._1))).map {
      case (k, ds) => k -> ((ds.size.toLong,
        ds.count(d => labels.contains(d._1)).toLong, ds.map(_._3).sum))
    }
    val got = Dedup.clusterSplit(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("split")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup_docs"),
          r.getAs[Long]("sum_tokens")))).toMap
    assert(got === expect)
    assert(got.values.map(_._1).sum === docs.length.toLong)
  }

  test("sim_ndcg_eval: hits agree with recall_at_k; perfect retrieval " +
      "scores 10000 bp; MRR consistent with first hit") {
    val ndcg = SimOps.ndcgEval(spark, sf).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    val rec = SimOps.recallAtK(spark, sf).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("hits")).toMap
    assert(ndcg.keySet === rec.keySet)
    ndcg.foreach { case (qid, r) =>
      val k = r.getAs[Long]("k")
      val hits = r.getAs[Long]("hits")
      val ndcgBp = r.getAs[Long]("ndcg_bp")
      val mrr = r.getAs[Long]("mrr_micro")
      assert(hits === rec(qid), s"query $qid: hits disagree with recall_at_k")
      assert(ndcgBp >= 0L && ndcgBp <= 10000L)
      // binary relevance with |truth| = k: all k hits back ⟹ DCG fills
      // every position ⟹ nDCG is exactly 1 regardless of order
      if (hits === k) assert(ndcgBp === 10000L, s"query $qid")
      if (hits === 0L) {
        assert(ndcgBp === 0L && mrr === 0L, s"query $qid")
      } else {
        // MRR must be 1e6 div r for some in-range first-hit rank
        val valid = (1L to k).map(1000000L / _).toSet
        assert(valid.contains(mrr), s"query $qid: mrr $mrr")
        assert(r.getAs[Long]("dcg_micro") > 0L)
      }
    }
  }

  test("sim_ivf_delete: tombstoned ids vanish from queries and results; " +
      "masked probe == compacted probe bit-for-bit") {
    import spark.implicits._
    val masked = SimOps.ivfDelete(spark, sf).collect()
    assert(masked.nonEmpty)
    masked.foreach { r =>
      assert(r.getAs[Long]("query_id") % 7 !== 0L, s"deleted query: $r")
      assert(r.getAs[Long]("neighbor_id") % 7 !== 0L, s"deleted neighbor: $r")
    }
    // the index itself did NOT lose non-deleted structure: probing the
    // compacted rewrite (no mask) must reproduce the masked probe
    val compactedDir = SimOps.compactIndex(spark, sf)
    val compacted =
      SimOps.probeCompacted(spark, sf, compactedDir).collect()
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toMap
    assert(keyed(compacted) === keyed(masked))
    // compaction really removed the tombstones from storage
    val leftover = spark.read.parquet(s"$compactedDir/assignments")
      .filter($"vec_id" % 7 === 0).count()
    assert(leftover === 0L)
  }

  test("dedup_source_impact: recount from the apply verdicts; " +
      "cross-source drops bounded by drops") {
    import spark.implicits._
    val verdicts = Dedup.dedupApply(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("keep"))).toMap
    val srcOf = Tables.documents(spark, sf)
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val canonSrc = verdicts.collect {
      case (doc, (cl, true)) => cl -> srcOf(doc)
    }
    val expect = verdicts.toSeq.groupBy { case (doc, _) => srcOf(doc) }
      .map { case (src, ds) =>
        val dropped = ds.filter(!_._2._2)
        src -> ((ds.size.toLong, dropped.size.toLong,
          dropped.count { case (_, (cl, _)) => canonSrc(cl) != src }.toLong,
          dropped.size.toLong * 10000L / ds.size))
      }
    val got = Dedup.sourceImpact(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("n_cross_source"), r.getAs[Long]("dropped_bp"))))
      .toMap
    assert(got === expect)
    assert(got.values.map(_._1).sum === verdicts.size.toLong)
    got.values.foreach { case (_, nd, ncs, _) => assert(ncs <= nd) }
    // the fixture has real drops somewhere, else the report is vacuous
    assert(got.values.map(_._2).sum > 0L)
  }

  test("text_decontam_apply: verdicts are exactly the contamination " +
      "report thresholded at 5%") {
    val rep = TextOps.contamination(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_contaminated"),
         r.getAs[Double]("contamination"))).toMap
    val got = TextOps.decontamApply(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_contaminated"),
         r.getAs[Double]("contamination"), r.getAs[Boolean]("keep"))).toMap
    assert(got.keySet === rep.keySet)
    got.foreach { case (doc, (ns, nc, c, keep)) =>
      assert((ns, nc, c) === rep(doc))
      assert(keep === (c <= 0.05), s"doc $doc")
    }
    // benchmark docs (doc_id % 50 == 0) never appear in the verdict
    assert(got.keys.forall(_ % 50 != 0))
  }

  test("mm_txt_retrieval: self-rank recomputed from the jointEmbed " +
      "towers; rank bounds hold") {
    import graft.llm.CrossModal
    val towers = CrossModal.jointEmbed(spark, sf).collect()
      .map { r =>
        r.getAs[Long]("doc_id") ->
          (Array("q0", "q1", "q2", "q3").map(r.getAs[Long]),
           Array("t0", "t1", "t2", "t3").map(r.getAs[Long]))
      }.toMap
    val got = CrossModal.txtRetrieval(spark, sf).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(got.keySet === towers.keySet.filter(_ < 8L))
    got.foreach { case (qid, row) =>
      val tq = towers(qid)._2
      def l1(img: Long): Long =
        towers(img)._1.zip(tq).map { case (a, b) =>
          math.abs(a - b * 16L) }.sum
      val self = l1(qid)
      val better = towers.keys.count(j =>
        j != qid && (l1(j) < self || (l1(j) == self && j < qid)))
      assert(row.getAs[Long]("self_l1") === self, s"query $qid")
      assert(row.getAs[Long]("self_rank") === better + 1L, s"query $qid")
      assert(row.getAs[Long]("n_images") === towers.size.toLong)
      assert(row.getAs[Boolean]("hit_at_k") === (better + 1 <= 10))
      assert(row.getAs[Long]("self_rank") >= 1L &&
        row.getAs[Long]("self_rank") <= towers.size.toLong)
    }
  }

  test("mm_wav_clipping: detector counts match the analytic samples " +
      "through the real codec") {
    val out = AudioOps.wavClipping(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def sample(doc: Long, i: Int): Int = {
      val d = md.digest(s"a:$doc:$i".getBytes("UTF-8"))
      (((d(0) & 0xff) << 8) | (d(1) & 0xff)).toShort.toInt
    }
    assert(out.nonEmpty)
    out.keys.take(5).foreach { doc =>
      val abs = (0 until 512).map(i => math.abs(sample(doc, i)).toLong)
      val r = out(doc)
      assert(r.getAs[Long]("n_samples") === 512L)
      assert(r.getAs[Long]("n_clipped") === abs.count(_ >= 32440).toLong)
      assert(r.getAs[Long]("n_silent") === abs.count(_ <= 327).toLong)
      assert(r.getAs[Long]("peak_abs") === abs.max)
      assert(r.getAs[Long]("clipped_bp") ===
        abs.count(_ >= 32440).toLong * 10000L / 512L)
      assert(r.getAs[Long]("silent_bp") ===
        abs.count(_ <= 327).toLong * 10000L / 512L)
    }
    // the thresholds have real work on this corpus: both detectors
    // fire somewhere (uniform int16 ⟹ ~1% rates corpus-wide)
    assert(out.values.map(_.getAs[Long]("n_clipped")).sum > 0L)
    assert(out.values.map(_.getAs[Long]("n_silent")).sum > 0L)
  }
}
