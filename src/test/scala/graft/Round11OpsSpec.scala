package graft

import scala.math.BigDecimal.RoundingMode

import graft.llm.{Dedup, SimOps}
import graft.operators.{AsofJoin, GraphSim}
import graft.telemetry.Telemetry

/** r11 additions: asymmetric n-gram containment dedup and binary-
  * quantization ANN. Every test is a from-scratch Scala re-derivation
  * compared EXACTLY against the Spark pipeline — no tolerance, same
  * integer quantization.
  */
class Round11OpsSpec extends SparkSpec {

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, RoundingMode.HALF_UP).toDouble
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP).toDouble

  private lazy val docs: Array[(Long, String)] = {
    import spark.implicits._
    Tables.documents(spark, sf).select($"doc_id", $"text")
      .as[(Long, String)].collect().sortBy(_._1)
  }

  private def shingleSet(text: String): Set[String] = {
    val toks = text.trim.toLowerCase.split("\\s+")
    val grams =
      if (toks.length >= 3)
        Array.tabulate(toks.length - 2)(i =>
          s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
      else Array(toks.mkString(" "))
    grams.toSet
  }

  test("containment matches brute-force |A∩B|/min(|A|,|B|) over all pairs") {
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }
    val want = (for {
      i <- sets.indices.iterator
      j <- (i + 1) until sets.length
      (ia, sa) = sets(i)
      (ib, sb) = sets(j)
      inter = (sa & sb).size
      if inter > 0
      c = round4(inter.toDouble / math.min(sa.size, sb.size))
      if c >= 0.6
    } yield (math.min(ia, ib), math.max(ia, ib)) ->
      (inter.toLong, sa.size.toLong min sb.size.toLong, c)).toMap
    val got = Dedup.containment(spark, sf).collect().map { r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("inter"),
         math.min(r.getAs[Long]("na"), r.getAs[Long]("nb")),
         r.getAs[Double]("containment"))
    }.toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("containment catches subset pairs that Jaccard @0.2 would rank low") {
    // structural sanity: containment is bounded below by jaccard, and
    // every emitted pair has containment >= the pair's jaccard
    val rows = Dedup.containment(spark, sf).collect()
    rows.foreach { r =>
      val inter = r.getAs[Long]("inter").toDouble
      val na = r.getAs[Long]("na"); val nb = r.getAs[Long]("nb")
      val j = inter / (na + nb - inter)
      assert(r.getAs[Double]("containment") >= j - 1e-9)
    }
  }

  // ---- binary quantization ANN ----

  private lazy val vecs: Array[(Long, Array[Double])] = {
    import spark.implicits._
    Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .as[(Long, Array[Double])].collect().sortBy(_._1)
  }

  /** Plain-Scala replica of the BQ pipeline: micro-quantize, exact
    * integer dim sums, centered sign bits, Hamming shortlist m=20,
    * exact cosine re-rank k=5. */
  private def referenceBq(): Map[(Long, Long), (Long, Double, Long)] = {
    def q(x: Double): Long =
      BigDecimal(x * 1000000).setScale(0, RoundingMode.HALF_UP).toLong
    val vq = vecs.map { case (id, v) => id -> v.map(q) }
    val dim = vq(0)._2.length
    val n = vq.length.toLong
    val sums = new Array[Long](dim)
    vq.foreach { case (_, a) =>
      var d = 0; while (d < dim) { sums(d) += a(d); d += 1 }
    }
    val words = vq.map { case (id, a) =>
      var w0 = 0L; var w1 = 0L
      var d = 0
      while (d < dim) {
        if (a(d) * n > sums(d)) {
          if (d < 32) w0 |= (1L << d) else w1 |= (1L << (d - 32))
        }
        d += 1
      }
      (id, w0, w1)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = vecs.toMap
    words.filter(_._1 < 8).flatMap { case (qid, qw0, qw1) =>
      val short = words.filter(_._1 != qid)
        .map { case (id, w0, w1) =>
          (id, java.lang.Long.bitCount(w0 ^ qw0) +
               java.lang.Long.bitCount(w1 ^ qw1)) }
        .sortBy { case (id, h) => (h, id) }
        .take(20)
      short.map { case (id, h) =>
        (id, h.toLong, round6(cos(byId(id), byId(qid)))) }
        .sortBy { case (id, _, c) => (-c, id) }
        .take(5).zipWithIndex
        .map { case ((id, h, c), i) => (qid, id) -> (h, c, i + 1L) }
    }.toMap
  }

  test("binaryQuantAnn matches a from-scratch BQ + rerank exactly") {
    val got = SimOps.binaryQuantAnn(spark, sf).collect().map { r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        (r.getAs[Long]("hamming"), r.getAs[Double]("cosine"),
         r.getAs[Long]("rnk"))
    }.toMap
    val want = referenceBq()
    assert(got === want)
    assert(got.size === 8 * 5)
  }

  // ---- MMR diversification ----

  private def cosRaw(a: Array[Double], b: Array[Double]): Double = {
    var dp = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dp / (math.sqrt(na) * math.sqrt(nb))
  }
  private def micro(c: Double): Long =
    (BigDecimal(round6(c)) * BigDecimal(1000000)).toLongExact

  /** Plain-Scala greedy MMR over the exact top-8 shortlist. */
  private def referenceMmr(): Map[(Long, Long), (Long, Long, Long)] = {
    val byId = vecs.toMap
    vecs.filter(_._1 < 8).flatMap { case (qid, qv) =>
      val short = vecs.filter(_._1 != qid)
        .map { case (id, v) => (id, round6(cosRaw(v, qv))) }
        .sortBy { case (id, c) => (-c, id) }
        .take(8)
        .map { case (id, c) => (id, micro(c)) }
      val sim = short.map { case (a, _) =>
        short.map { case (b, _) =>
          if (a == b) 0L else micro(cosRaw(byId(a), byId(b))) } }
      var selected = List.empty[Int]
      (1 to 4).map { pick =>
        val (bi, score) = short.indices
          .filterNot(selected.contains)
          .map { i =>
            val mx = if (selected.isEmpty) 0L
                     else selected.map(sim(i)(_)).max
            (i, 7L * short(i)._2 - 3L * mx)
          }
          .minBy { case (i, s) => (-s, short(i)._1) }
        selected = selected :+ bi
        (qid, short(bi)._1) -> (pick.toLong, short(bi)._2, score)
      }
    }.toMap
  }

  test("mmrDiversify matches a from-scratch greedy MMR exactly") {
    val got = SimOps.mmrDiversify(spark, sf).collect().map { r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        (r.getAs[Long]("pick"), r.getAs[Long]("rel_micro"),
         r.getAs[Long]("score10"))
    }.toMap
    assert(got === referenceMmr())
    assert(got.size === 8 * 4)
  }

  test("mmrDiversify structure: 4 distinct picks; pick 1 is the exact argmax") {
    import spark.implicits._
    val rows = SimOps.mmrDiversify(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("pick"),
                 r.getAs[Long]("neighbor_id")))
    rows.groupBy(_._1).foreach { case (_, picks) =>
      assert(picks.map(_._2).sorted === Array(1L, 2L, 3L, 4L))
      assert(picks.map(_._3).distinct.length === 4)
    }
    // pick 1 == brute-force rank-1 neighbor (pure relevance)
    val exact1 = SimOps.simTopkBruteforce(spark, sf)
      .filter($"rnk" === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val pick1 = rows.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    assert(pick1 === exact1)
  }

  // ---- Holt-Winters ----

  test("holtWinters matches a from-scratch additive triple smoothing exactly") {
    import spark.implicits._
    val p = 24; val al = 0.3; val be = 0.1; val ga = 0.2
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 3600000000 as h")
      .as[(String, Long)].collect()
    val h0 = ev.map(_._2).min; val h1 = ev.map(_._2).max
    val byType = ev.groupBy(_._1)
    val want = byType.map { case (et, rows) =>
      val counts = rows.groupBy(_._2).map { case (h, g) => h -> g.length }
      val vs = (h0 to h1).map(h => counts.getOrElse(h, 0).toDouble).toArray
      val l0 = { var s = 0.0; var i = 0
                 while (i < p) { s += vs(i); i += 1 }; s / p }
      val m2 = { var s = 0.0; var i = p
                 while (i < 2 * p) { s += vs(i); i += 1 }; s / p }
      val b0 = (m2 - l0) / p
      var st = Array(l0, b0) ++ vs.take(p).map(_ - l0)
      var i = p
      while (i < vs.length) {
        val x = vs(i)
        val l = (x - st(2)) * al + (st(0) + st(1)) * (1.0 - al)
        val b = (l - st(0)) * be + st(1) * (1.0 - be)
        val s = (x - l) * ga + st(2) * (1.0 - ga)
        st = Array(l, b) ++ st.slice(3, 2 + p) ++ Array(s)
        i += 1
      }
      et -> (vs.length.toLong, round6(st(0)), round6(st(1)), round6(st(2)),
             round6(st(0) + st(1) + st(2)))
    }
    val got = Telemetry.holtWinters(spark, sf).collect().map { r =>
      r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("level"),
         r.getAs[Double]("trend"), r.getAs[Double]("s_next"),
         r.getAs[Double]("forecast"))
    }.toMap
    assert(got === want)
  }

  // ---- neighbor-set Jaccard ----

  test("jaccardNeighbors matches brute-force set Jaccard, top-20 order exact") {
    import spark.implicits._
    val edges = Tables.lineitem(spark, sf)
      .select($"l_suppkey", $"l_partkey")
      .as[(Long, Long)].collect().distinct
    val sets = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._2).toSet }
    val want = (for {
      (a, sa) <- sets.iterator
      (b, sb) <- sets.iterator if a < b
      common = (sa & sb).size
      if common > 0
    } yield (a, b, sa.size.toLong, sb.size.toLong, common.toLong,
             round6(common.toDouble / (sa.size + sb.size - common))))
      .toArray
      .sortBy { case (a, b, _, _, _, j) => (-j, a, b) }
      .take(20)
    val got = GraphSim.jaccardNeighbors(spark, sf).collect().map { r =>
      (r.getAs[Long]("supp_a"), r.getAs[Long]("supp_b"),
       r.getAs[Long]("deg_a"), r.getAs[Long]("deg_b"),
       r.getAs[Long]("common"), r.getAs[Double]("jaccard"))
    }
    assert(got.toSeq === want.toSeq)
  }

  // ---- IVF+PQ ----

  test("ivfPqAnn: neighbors confined to the query's trained list; adist ordered") {
    import spark.implicits._
    val cid = SimOps.clusterAssignments(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    val rows = SimOps.ivfPqAnn(spark, sf).collect().map { r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
       r.getAs[Double]("adist"), r.getAs[Long]("rnk"))
    }
    assert(rows.nonEmpty)
    // nprobe=1: every neighbor shares the query's inverted list
    rows.foreach { case (q, n, _, _) => assert(cid(n) === cid(q)) }
    // ADC distance non-decreasing in rank within each query
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byRnk = g.sortBy(_._4).map(_._3)
      assert(byRnk.zip(byRnk.tail).forall { case (a, b) => a <= b })
    }
    // corpus excludes codebook ids and self
    rows.foreach { case (q, n, _, _) => assert(n >= 8 && n != q) }
  }

  test("ivfPqAnn is deterministic across runs (stable codes/LUT trajectory)") {
    val a = SimOps.ivfPqAnn(spark, sf).collect().map(_.toSeq).toSet
    val b = SimOps.ivfPqAnn(spark, sf).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  // ---- nearest as-of ----

  test("qAsofNearest matches brute-force nearest-order per event (ties backward)") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(org.apache.spark.sql.functions.max($"o_orderkey").as("k"),
           org.apache.spark.sql.functions
             .max_by($"o_totalprice", $"o_orderkey").as("p"))
      .selectExpr("o_custkey", "unix_micros(cast(o_orderdate as timestamp)) as t",
                  "k", "p")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1)
    val events = Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "unix_micros(ts) as t")
      .as[(Long, Long, Long)].collect()
    val want = events.map { case (eid, uid, et) =>
      val os = orders.getOrElse(uid, Array.empty[(Long, Long, Long, Double)])
      val back = os.filter(_._2 <= et).sortBy(o => (o._2, o._3)).lastOption
      val fwd = os.filter(_._2 >= et).sortBy(o => (o._2, -o._3)).headOption
      val pick = (back, fwd) match {
        case (None, None) => None
        case (Some(b), None) => Some((b, "back"))
        case (None, Some(f)) => Some((f, "fwd"))
        case (Some(b), Some(f)) =>
          if (et - b._2 <= f._2 - et) Some((b, "back")) else Some((f, "fwd"))
      }
      eid -> pick.map { case (o, d) => (o._3, round4(o._4), d) }
    }.toMap
    val got = AsofJoin.qAsofNearest(spark, sf).collect().map { r =>
      r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("nearest_order_key"))) None
         else Some((r.getAs[Long]("nearest_order_key"),
                    r.getAs[Double]("nearest_order_price"),
                    r.getAs[String]("direction"))))
    }.toMap
    val wantNorm = want.map { case (k, v) => k -> v }
    assert(got.size === wantNorm.size)
    got.foreach { case (eid, g) =>
      val w = wantNorm(eid)
      if (g.isEmpty) assert(w.isEmpty)
      else assert(g === w, s"event $eid")
    }
  }

  // ---- dedup planning stats ----

  test("clusterStats is the exact histogram of dedupClusters") {
    import spark.implicits._
    val sizes = Dedup.dedupClusters(spark, sf).collect()
      .map(_.getAs[Long]("n_docs"))
    val corpusN = Tables.documents(spark, sf).count()
    val want = sizes.groupBy(identity).map { case (sz, g) =>
      sz -> (g.length.toLong, sz * g.length, (sz - 1) * g.length,
             round6(sz * g.length.toDouble / corpusN))
    }
    val got = Dedup.clusterStats(spark, sf).collect().map { r =>
      r.getAs[Long]("cluster_size") ->
        (r.getAs[Long]("n_clusters"), r.getAs[Long]("docs"),
         r.getAs[Long]("drop_docs"), r.getAs[Double]("frac_corpus"))
    }.toMap
    assert(got === want)
  }

  // ---- centroid outliers ----

  test("centroidOutliers = brute-force top-20 distance-to-trained-centroid") {
    import spark.implicits._
    def q(x: Double): Long =
      BigDecimal(x * 1000000).setScale(0, RoundingMode.HALF_UP).toLong
    val vq = vecs.map { case (id, v) => (id, v.map(q)) }
    val ds = spark.createDataset(vq.toSeq)
    val cents = SimOps.trainCentroids(spark, ds,
      SimOps.autoK(vq.length.toLong), 2)
    def l2(v: Array[Long], c: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < c.length) { val t = v(i) - c(i); d += t * t; i += 1 }
      d
    }
    val want = vq.map { case (id, v) =>
      val dists = cents.map { case (cid, c) => (cid, l2(v, c)) }
      val (cid, dd) = dists.minBy { case (cid, d) => (d, cid) }
      (id, cid, dd)
    }.sortBy { case (id, _, d) => (-d, id) }.take(20)
      .map { case (id, cid, d) => (id, cid, round6(d / 1e12)) }
    val got = SimOps.centroidOutliers(spark, sf).collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("cid"), r.getAs[Double]("dist"))
    }
    assert(got.toSeq === want.toSeq)
  }

  // ---- cross-shard overlap ----

  test("shardOverlap matches a from-scratch exact+sketch recompute") {
    import spark.implicits._
    val P = 2147483647L; val MIX = 2654435761L
    def hash60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val bySrc = Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
      .groupBy(_._1)
      .map { case (src, rows) =>
        src -> rows.flatMap { case (_, t) =>
          shingleSet(t).map(hash60)
        }.toSet
      }
    val sig = bySrc.map { case (src, hs) =>
      src -> Array.tabulate(64) { i =>
        hs.map(h => ((h % P) * (2L * i + 1) + i * MIX) % P).min
      }
    }
    val want = (for {
      (a, sa) <- bySrc.toSeq
      (b, sb) <- bySrc.toSeq if a < b
      inter = (sa & sb).size
      if inter > 0
    } yield {
      val agree = (0 until 64).count(i => sig(a)(i) == sig(b)(i))
      (a, b) -> (sa.size.toLong, sb.size.toLong, inter.toLong,
                 round6(inter.toDouble / (sa.size + sb.size - inter)),
                 round6(agree / 64.0))
    }).toMap
    val got = Dedup.shardOverlap(spark, sf).collect().map { r =>
      (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("inter"),
         r.getAs[Double]("exact_jaccard"), r.getAs[Double]("est_jaccard"))
    }.toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  // ---- sequence pattern match ----

  test("patternMatch matches a from-scratch Java-regex recompute") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) as t", "event_id", "event_type")
      .as[(Long, Long, Long, String)].collect()
    def countNonOverlap(seq: String, pat: String): Long = {
      val m = java.util.regex.Pattern.compile(pat).matcher(seq)
      var c = 0L
      while (m.find()) c += 1
      c
    }
    val want = events.groupBy(_._1).map { case (uid, rows) =>
      val seq = rows.sortBy(r => (r._2, r._3)).map(_._4.head).mkString
      uid -> (rows.length.toLong, seq, seq.length.toLong,
              countNonOverlap(seq, "vcp"), countNonOverlap(seq, "v[^p]*p"),
              countNonOverlap(seq, "ee"))
    }
    val got = Telemetry.patternMatch(spark, sf).collect().map { r =>
      r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[String]("seq"),
         r.getAs[Long]("seq_len"), r.getAs[Long]("n_vcp"),
         r.getAs[Long]("n_view_to_purchase"), r.getAs[Long]("n_double_error"))
    }.toMap
    assert(got === want)
  }

  // ---- incremental dedup ----

  test("incrementalDedup verdicts agree with the full-corpus LSH pipeline") {
    import spark.implicits._
    val probe = Set("src18", "src19")
    val srcOf = Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    // cross-side verified pairs from the PROVEN full pipeline
    val crossPairs = Dedup.minhashLsh(spark, sf).collect().flatMap { r =>
      val a = r.getAs[Long]("doc_a"); val b = r.getAs[Long]("doc_b")
      (probe(srcOf(a)), probe(srcOf(b))) match {
        case (true, false) => Some(a -> b)
        case (false, true) => Some(b -> a)
        case _ => None
      }
    }.groupBy(_._1).map { case (n, ps) => n -> ps.map(_._2).min }
    val got = Dedup.incrementalDedup(spark, sf).collect().map { r =>
      r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_candidates"), r.getAs[Boolean]("is_dup"),
         if (r.isNullAt(r.fieldIndex("dup_of"))) None
         else Some(r.getAs[Long]("dup_of")))
    }.toMap
    // covers exactly the probe docs
    assert(got.keySet === srcOf.filter(kv => probe(kv._2)).keySet)
    // every cross-side LSH dup is flagged with the same canonical id
    crossPairs.foreach { case (n, minOld) =>
      val (_, isDup, dupOf) = got(n)
      assert(isDup, s"doc $n should be flagged")
      assert(dupOf === Some(minOld), s"doc $n canonical")
    }
    // and no false flags: flagged docs must appear in the cross pairs
    got.foreach { case (n, (nc, isDup, _)) =>
      if (isDup) { assert(crossPairs.contains(n)); assert(nc >= 1) }
    }
  }

  // ---- curation funnel ----

  test("curationFunnel telescopes and matches per-stage verdict recomputes") {
    import spark.implicits._
    import graft.llm.TextOps
    val rows = TextOps.curationFunnel(spark, sf).collect().map { r =>
      r.getAs[String]("stage") ->
        (r.getAs[Long]("docs_in"), r.getAs[Long]("dropped"),
         r.getAs[Long]("docs_out"))
    }.toMap
    assert(rows.keySet === Set("1_exact_dedup", "2_near_dedup",
      "3_gopher_quality", "4_langid_match"))
    // telescoping: stage k's docs_out is stage k+1's docs_in
    assert(rows("1_exact_dedup")._3 === rows("2_near_dedup")._1)
    assert(rows("2_near_dedup")._3 === rows("3_gopher_quality")._1)
    assert(rows("3_gopher_quality")._3 === rows("4_langid_match")._1)
    rows.values.foreach { case (in, d, out) => assert(in - d === out) }
    // stage-1 recompute from the component APIs
    val n = Tables.documents(spark, sf).count()
    val nHashes = TextOps.dedupExact(spark, sf).count()
    assert(rows("1_exact_dedup") === ((n, n - nHashes, nHashes)))
    // stage-2 recompute: exact keepers that lose the near-dup vote
    val exactKeepers = Tables.documents(spark, sf)
      .groupBy(org.apache.spark.sql.functions.md5($"text"))
      .agg(org.apache.spark.sql.functions.min($"doc_id").as("k"))
      .select($"k").as[Long].collect().toSet
    val nearKeep = Dedup.dedupApply(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val d2 = exactKeepers.count(id => !nearKeep(id))
    assert(rows("2_near_dedup")._2 === d2.toLong)
  }

  // ---- exactness-composition properties (the mrl_rerank play:
  // degenerate configs must reproduce brute force bit-for-bit) ----

  test("mmrDiversify with λ=1 degenerates to exact top-k by relevance") {
    import spark.implicits._
    val got = SimOps.mmrDiversify(spark, sf, lamTenths = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("pick")) ->
                r.getAs[Long]("neighbor_id")).toMap
    val exact = SimOps.simTopkBruteforce(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk")) ->
                r.getAs[Long]("neighbor_id")).toMap
    // picks 1..4 equal brute-force ranks 1..4 (same ordering, same ties)
    got.foreach { case ((q, pick), n) =>
      if (pick <= 4) assert(exact((q, pick)) === n, s"query $q pick $pick")
    }
    assert(got.size === 8 * 4)
  }

  test("binaryQuantAnn with a corpus-wide shortlist equals exact brute force") {
    import spark.implicits._
    val m = vecs.length + 1 // shortlist covers everything → rerank IS exact
    val got = SimOps.binaryQuantAnn(spark, sf, m = m).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toMap
    val exact = SimOps.simTopkBruteforce(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toMap
    assert(got === exact)
  }

  test("binaryQuantAnn recall against exact brute force is reported sane") {
    // BQ is an approximation: just quantify recall@5 vs brute force
    // (it must beat random = k/N by a wide margin; on this corpus the
    // centered-bit index lands well above 0.2)
    import spark.implicits._
    val exact = SimOps.simTopkBruteforce(spark, sf)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bq = SimOps.binaryQuantAnn(spark, sf)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & bq).size.toDouble / exact.size
    info(f"BQ recall@5 vs exact: $recall%.2f")
    assert(recall > 0.2)
  }
}
