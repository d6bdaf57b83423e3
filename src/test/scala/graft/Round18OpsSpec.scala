package graft

import org.apache.spark.sql.functions._

import graft.llm.{AudioOps, SimOps, TextOps}
import graft.operators.ZOrder

/** Round-18 operator suite: corpus-health text trio, attribute-
  * filtered ANN, Z-order layout + cover-set pruning, acoustic
  * fingerprint near-dup, equality-delete MOR chain. */
class Round18OpsSpec extends SparkSpec {

  test("sink_iceberg_eqdel: equality delete + upsert sequencing") {
    import spark.implicits._
    val out = graft.catalog.IcebergSqlDemo.eqdelQuery(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("sum_uid"))).toMap
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"event_type", $"user_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val keys = ev.map(_._1).sorted.take(5).toSet
    // expected state: non-error rows minus the upserted keys, plus the
    // upserted rows (which keep their original event_type — an
    // upserted 'error' row LIVES, proving strictly-below semantics)
    val live = ev.filter(e => !keys(e._1) && e._2 != "error") ++
      ev.filter(e => keys(e._1))
    val expect = live.groupBy(_._2).map { case (t, rs) =>
      t -> (rs.length.toLong, rs.map(_._3).sum) }
    assert(out === expect)
  }

  test("text_ttr: per-source aggregates match a from-scratch replica") {
    import spark.implicits._
    val out = TextOps.ttr(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"),
         r.getAs[Long]("sum_types"), r.getAs[Long]("avg_ttr_micro"))).toMap
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
      .map { case (s, t) =>
        val toks = t.trim.toLowerCase.split("\\s+")
        (s, toks.length.toLong, toks.distinct.length.toLong)
      }.groupBy(_._1)
    assert(out.keySet === docs.keySet)
    docs.foreach { case (src, rows) =>
      val (n, st, sy) = (rows.length.toLong, rows.map(_._2).sum,
        rows.map(_._3).sum)
      val micros = rows.map(r => math.round(r._3 * 1e6 / r._2))
      val avg = math.round(micros.sum.toDouble / micros.length)
      assert(out(src) === ((n, st, sy, avg)), src)
      // a ratio: every per-doc TTR must land in (0, 1e6]
      assert(micros.forall(m => m > 0 && m <= 1000000L), src)
    }
  }

  test("text_hapax: counts partition the vocabulary") {
    val rows = TextOps.hapax(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, h, d, t) = (r.getAs[Long]("vocab"), r.getAs[Long]("n_hapax"),
        r.getAs[Long]("n_dis"), r.getAs[Long]("n_tokens"))
      assert(h + d <= v, r.toString)      // once+twice ⊆ vocabulary
      assert(v <= t)                      // vocab can't exceed tokens
      val hm = r.getAs[Long]("hapax_micro")
      assert(hm === math.round(h * 1e6 / v))
    }
  }

  test("text_zipf_fit: negative slope, bounded fit, full head") {
    val rows = TextOps.zipfFit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // frequency is non-increasing in rank by construction, so the
      // least-squares slope of ln f on ln rank can never be positive
      assert(r.getAs[Double]("slope") <= 0.0, r.toString)
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
      assert(r.getAs[Long]("n_terms") <= 100L)
    }
  }

  test("sim_filtered_ann: every neighbor satisfies the predicate") {
    import spark.implicits._
    val out = SimOps.filteredAnn(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("label") % 3 === 0L, r.toString)
      assert(r.getAs[Long]("rnk") >= 1L && r.getAs[Long]("rnk") <= 5L)
    }
    // ranks are dense per query and cosine is non-increasing in rank
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq ===
        (1L to sorted.length.toLong), s"query $q")
      val cos = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, s"query $q")
    }
  }

  test("sim_filtered_recall: measured against FILTERED ground truth") {
    val rows = SimOps.filteredRecall(spark, sf).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("k") === 5L)
    }
    val avg = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(avg >= 0.5, s"filtered recall collapsed: $avg")
  }

  test("text_dup_ngram_chars: from-scratch replica on sampled docs") {
    import spark.implicits._
    val out = TextOps.dupNgramChars(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("total_chars"), r.getAs[Long]("top2_chars"),
         r.getAs[Long]("dup5_chars"), r.getAs[Boolean]("keep"))).toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(out.keySet === docs.keySet)
    docs.toSeq.sortBy(_._1).take(40).foreach { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+")
      val total = toks.map(_.length.toLong + 1).sum
      val top2 =
        if (toks.length < 2) 0L
        else {
          val counts = toks.sliding(2).map(_.mkString(" ")).toSeq
            .groupBy(identity).view.mapValues(_.size).toSeq
          val (g, c) = counts.minBy { case (g, c) => (-c, g) }
          c.toLong * (g.length + 1)
        }
      val dup5 =
        if (toks.length < 5) 0L
        else {
          val grams = toks.sliding(5).map(_.mkString(" ")).zipWithIndex.toSeq
          val dups = grams.groupBy(_._1).filter(_._2.size > 1)
          val pos = dups.values.flatten.flatMap {
            case (_, p) => p to (p + 4) }.toSet
          pos.toSeq.map(p => toks(p).length.toLong + 1).sum
        }
      assert(out(id)._1 === total, s"doc $id total")
      assert(out(id)._2 === top2, s"doc $id top2")
      assert(out(id)._3 === dup5, s"doc $id dup5")
      val keep = math.round(top2 * 1e6 / total) <= 200000L &&
        math.round(dup5 * 1e6 / total) <= 150000L
      assert(out(id)._4 === keep, s"doc $id keep")
    }
    // dup5 counts each covered token once — never exceeds the doc
    out.values.foreach { case (tot2, _, dup5, _) => assert(dup5 <= tot2) }
  }

  test("dedup_source_matrix: cells match a from-clusters recompute") {
    import spark.implicits._
    import graft.llm.Dedup
    val out = Dedup.sourceMatrix(spark, sf).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Long]("n_shared_clusters")).toMap
    // recompute via driver union-find over the public pair miner
    val pairs = Dedup.ngramJaccard(spark, sf, 0.2)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val srcOf = Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val bySrcs = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find).values
      .map(_.map(srcOf).distinct.sorted)
    val expect = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    bySrcs.foreach { srcs =>
      for (i <- srcs.indices; j <- i + 1 until srcs.length)
        expect((srcs(i), srcs(j))) += 1L
    }
    assert(out === expect.toMap)
    out.keys.foreach { case (a, b) => assert(a < b) }
  }

  test("mm_audio_clusters: families match a union-find recompute") {
    import spark.implicits._
    val pairs = AudioOps.audioFingerprint(spark, sf).collect()
      .map(r => (r.getAs[Long]("fa"), r.getAs[Long]("fb")))
    val out = AudioOps.audioClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_fps"), r.getAs[Long]("n_clips")))
    // driver union-find over the (tiny) fp pair graph
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expect = members.groupBy(find).map { case (root, ms) =>
      math.min(root, ms.min) -> ms.length.toLong }
    assert(out.map(_._1).sorted.toSeq === expect.keys.toSeq.sorted)
    out.foreach { case (cid, (nFps, nClips)) =>
      assert(nFps === expect(cid), s"cluster $cid size")
      assert(nFps >= 2L && nClips >= nFps, s"cluster $cid counts")
    }
  }

  test("sim_pq_recall: bounded, complete, and truth is exact L2") {
    import spark.implicits._
    val rows = SimOps.pqRecall(spark, sf).collect()
    assert(rows.length === 8) // one row per query, none dropped
    rows.foreach { r =>
      assert(r.getAs[Long]("k") === 5L)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(rec === r.getAs[Long]("hits").toDouble / 5.0)
    }
    // truth side sanity: the exact-L2 top-1 of query 8 recomputed
    // from collected vectors matches a from-scratch scan
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .as[(Long, Array[Double])].collect().toMap
    val q = emb(8L)
    val best = emb.filter { case (id, _) => id >= 8 && id != 8L }
      .map { case (id, v) =>
        (v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum, id)
      }.minBy(identity)
    assert(best._2 > 8L) // a real neighbor exists, distinct from self
  }

  test("zvalue: interleave matches a bit-twiddling replica") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val xs = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
      (1L, 2L), (170L, 85L), (37L, 201L))
    val got = xs.toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y"), 8).as("z"))
      .as[Long].collect().toSeq
    assert(got === xs.map { case (x, y) => ref(x, y) })
    // corners: (0,0)→0, (255,255)→65535 (a 16-bit bijection)
    assert(got.head === 0L && got(3) === 65535L)
  }

  test("q_zorder_locality: every bucket is a 16x16 tile in BOTH dims") {
    val rows = ZOrder.qZorderLocality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sx = r.getAs[Long]("max_x") - r.getAs[Long]("min_x")
      val sy = r.getAs[Long]("max_y") - r.getAs[Long]("min_y")
      assert(sx <= 15L && sy <= 15L, r.toString)
      // ... and the tile origin is bucket-determined: x/16 constant
      assert(r.getAs[Long]("min_x") / 16 === r.getAs[Long]("max_x") / 16)
      assert(r.getAs[Long]("min_y") / 16 === r.getAs[Long]("max_y") / 16)
    }
    // the 1-D counter-example that motivates the curve: bucketing by x
    // alone leaves y at (near) full range inside a bucket
    import spark.implicits._
    val linear = Tables.lineitem(spark, sf)
      .select((pmod($"l_partkey", lit(256L)) / 16).cast("long").as("xb"),
        pmod($"l_orderkey", lit(256L)).as("y"))
      .groupBy($"xb").agg((max($"y") - min($"y")).as("span_y"))
      .agg(max($"span_y")).head.getLong(0)
    assert(linear > 15L, s"linear layout unexpectedly local: $linear")
  }

  test("q_hilbert_locality: tile bounds + native expression + no-jump") {
    import graft.sink.Hilbert
    val rows = ZOrder.qHilbertLocality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // each 256-cell curve segment is one 16x16 quadrant tile
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 15L, r)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 15L, r)
    }
    // the codegen'd expression agrees with the reference walk
    import spark.implicits._
    val sample = Seq((0L, 0L), (255L, 255L), (37L, 201L), (128L, 64L))
    val got = sample.toDF("x", "y")
      .selectExpr("hilbert_index(x, y) AS d").as[Long].collect().toSeq
    assert(got === sample.map { case (x, y) => Hilbert.index(x, y) })
    // the property that distinguishes the curves: consecutive Hilbert
    // positions are ALWAYS grid-adjacent (no jumps), while Morton
    // teleports at quadrant boundaries (z=15 -> z=16 jumps (3,3) ->
    // (4,0)); range scans over the Hilbert key never leave the
    // neighborhood
    (1 until 4096).foreach { d =>
      val (x0, y0) = Hilbert.point(d - 1L)
      val (x1, y1) = Hilbert.point(d.toLong)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) === 1L, s"jump at d=$d")
    }
    def deinterleave(z: Long): (Long, Long) = {
      var x = 0L; var y = 0L
      (0 until 8).foreach { i =>
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    val (mx0, my0) = deinterleave(15L)
    val (mx1, my1) = deinterleave(16L)
    assert(math.abs(mx1 - mx0) + math.abs(my1 - my0) > 1L,
      "Morton should jump at the z=15->16 quadrant boundary")
  }

  test("coverBuckets: exact cover of the rectangle, nothing more") {
    val covers = ZOrder.coverBuckets(32, 47, 96, 127, 8, 4)
    // x∈[32,47] is one 16-wide tile column (tx=2), y∈[96,127] two tile
    // rows (ty=6,7) → exactly 2 buckets
    assert(covers.length === 2)
    covers.foreach { zb =>
      var tx = 0L; var ty = 0L
      (0 until 4).foreach { i =>
        tx |= ((zb >> (2 * i)) & 1L) << i
        ty |= ((zb >> (2 * i + 1)) & 1L) << i
      }
      assert(tx === 2L && (ty === 6L || ty === 7L), s"bucket $zb")
    }
    // a full-grid rectangle covers everything
    assert(ZOrder.coverBuckets(0, 255, 0, 255, 8, 4).length === 256)
  }

  test("q_zorder_pruning: pruned read touches covered dirs only and " +
      "loses no rows") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // numFiles METRIC of the executed scan (inputFiles on the frame
    // lists the whole relation — it ignores partition pruning)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.sparkPlan.collectLeaves()
        .collect { case s: FileSourceScanExec =>
          s.selectedPartitions.totalNumberOfFiles }
        .sum
    // the LAYOUT uses 2 bucket bits (16 dirs — tile ≈ target file
    // size; see ZOrder.LayoutBucketBits): this rectangle covers 1 tile
    val covers = ZOrder.coverBuckets(32, 47, 96, 127, 8, 2).toSet
    assert(covers.size === 1)
    val prunedFiles = scannedFiles(ZOrder.qZorderPruning(spark, sf))
    val fullFiles = scannedFiles(ZOrder.rectangleFullScan(spark, sf))
    assert(prunedFiles > 0 && prunedFiles <= covers.size.toLong,
      s"pruned scan read $prunedFiles files for a ${covers.size}-tile cover")
    assert(fullFiles > prunedFiles,
      s"full scan ($fullFiles files) should exceed the cover ($prunedFiles)")
    // and the cover loses no rows: same aggregate
    val a = ZOrder.qZorderPruning(spark, sf)
      .select("l_returnflag", "n_rows", "sum_qty", "sum_price")
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = ZOrder.rectangleFullScan(spark, sf)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("mm_audio_fingerprint: every planted near-dup pair surfaces") {
    import spark.implicits._
    val pairs = AudioOps.audioFingerprint(spark, sf).collect()
      .map(r => (r.getAs[Long]("fa"), r.getAs[Long]("fb"),
        r.getAs[Long]("hamming")))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b, h) => a < b && h === 1L })
    assert(pairs.length === pairs.distinct.length, "band-join dup leak")
    // planted structure: docs 3k/3k+1/3k+2 share a seed; the
    // perturbation moves only window 0's energy, so every same-seed
    // pair's fingerprints are EQUAL (one distinct-fp group) or exactly
    // Hamming 1 apart — and a Hamming-1 fp pair is NEVER missed by the
    // 2-band pigeonhole
    val fps = AudioOps.fingerprints(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap
    val got = pairs.map(p => (p._1, p._2)).toSet
    fps.keySet.groupBy(_ / 3).filter(_._2.size >= 2).foreach {
      case (seed, g) =>
        val sorted = g.toSeq.sorted
        for (i <- sorted.indices; j <- i + 1 until sorted.length) {
          val (f1, f2) = (fps(sorted(i)), fps(sorted(j)))
          assert(java.lang.Long.bitCount(f1 ^ f2) <= 1,
            s"planted pair drifted past Hamming 1 (seed $seed)")
          if (f1 != f2)
            assert(got((math.min(f1, f2), math.max(f1, f2))),
              s"planted fp pair ($f1, $f2) seed $seed missing")
        }
    }
  }
}
