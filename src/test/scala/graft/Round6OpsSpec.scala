package graft

import org.apache.spark.sql.functions._

import graft.llm.{Multimodal, SimOps, TextOps}
import graft.operators.Core
import graft.telemetry.Telemetry

/** Semantic properties of the round-6 operators (oracle hash-parity is
  * the driver's job; these pin the invariants a hash can't express). */
class Round6OpsSpec extends SparkSpec {

  test("mode per user is the true argmax with lexicographic tie-break") {
    import spark.implicits._
    val got = Core.qMode(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("mode_type"), r.getAs[Long]("n_mode"))).toMap
    val counts = Tables.events(spark, sf)
      .groupBy($"user_id", $"event_type").count().collect()
      .groupBy(_.getAs[Long]("user_id"))
    counts.foreach { case (uid, rows) =>
      val byType = rows.map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count"))
      val maxN = byType.map(_._2).max
      val expectType = byType.filter(_._2 == maxN).map(_._1).min
      assert(got(uid) === (expectType, maxN), s"user $uid")
    }
  }

  test("gaps-and-islands streaks match a driver-side sweep") {
    import spark.implicits._
    val got = Core.qGapsIslands(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_streaks"), r.getAs[Long]("active_days"),
         r.getAs[Long]("max_streak"))).toMap
    val days = Tables.events(spark, sf)
      .select($"user_id", datediff(to_date($"ts"), lit("1970-01-01")).as("d"))
      .distinct().collect()
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.map(_.getAs[Int]("d")).sorted.toVector).toMap
    days.foreach { case (uid, ds) =>
      // split sorted distinct days into runs of consecutive integers
      val runs = ds.foldLeft(Vector.empty[Vector[Int]]) { (acc, d) =>
        if (acc.nonEmpty && acc.last.last == d - 1)
          acc.init :+ (acc.last :+ d)
        else acc :+ Vector(d)
      }
      assert(got(uid) === ((runs.length.toLong, ds.length.toLong,
        runs.map(_.length).max.toLong)), s"user $uid")
    }
  }

  test("skyline points are mutually non-dominated and cover all maxima") {
    import spark.implicits._
    val sky = Core.qSkyline(spark, sf).collect()
      .map(r => (r.getAs[Long]("qty"), r.getAs[Double]("price")))
    // pairwise: no output point dominates another (qty≥ ∧ price≤, one strict)
    for (a <- sky; b <- sky if a != b)
      assert(!(a._1 >= b._1 && a._2 <= b._2), s"$a dominates $b")
    // completeness: every (qty, min-price) candidate not in the skyline
    // IS dominated by some skyline point
    val cand = Tables.lineitem(spark, sf)
      .groupBy($"l_quantity".cast("long").as("qty"))
      .agg(min($"l_extendedprice").as("price")).collect()
      .map(r => (r.getAs[Long]("qty"), r.getAs[Double]("price")))
    val skySet = sky.toSet
    cand.filterNot(skySet).foreach { c =>
      assert(sky.exists(s => s._1 >= c._1 && s._2 <= c._2 &&
        (s._1 > c._1 || s._2 < c._2)), s"$c excluded but undominated")
    }
  }

  test("attribution credits the latest preceding click within the window") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"event_id", unix_micros($"ts").as("us"))
      .collect().groupBy(_.getAs[Long]("user_id"))
    val got = Telemetry.attribution(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val pUs = r.getAs[Long]("ts_us")
      val pId = r.getAs[Long]("event_id")
      val clicks = ev(uid).filter(e => e.getAs[String]("event_type") == "click")
        .map(e => (e.getAs[Long]("us"), e.getAs[Long]("event_id")))
        .filter { case (us, id) => us < pUs || (us == pUs && id < pId) }
      if (clicks.isEmpty) {
        assert(r.isNullAt(r.fieldIndex("click_ts")))
        assert(!r.getAs[Boolean]("attributed"))
      } else {
        val (cUs, cId) = clicks.maxBy(identity)
        assert(r.getAs[Long]("click_ts") === cUs)
        assert(r.getAs[Long]("click_id") === cId)
        assert(r.getAs[Boolean]("attributed") === (pUs - cUs <= 604800000000L))
      }
    }
  }

  test("changepoint picks the globally best split per series") {
    import spark.implicits._
    val hourly = Tables.events(spark, sf)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("n"))
      .collect().groupBy(_.getAs[String]("event_type"))
    val got = Telemetry.changepoint(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("score")).toMap
    hourly.foreach { case (et, rows) =>
      val ns = rows.sortBy(_.getAs[java.sql.Timestamp]("h").getTime)
        .map(_.getAs[Long]("n"))
      val total = ns.sum
      val best = (1 until ns.length).map { i =>
        val cum = ns.take(i).sum
        math.abs(cum.toDouble / i - (total - cum).toDouble / (ns.length - i))
      }.max
      assert(got(et) === best, s"series $et")
    }
  }

  test("new-vs-returning: day-1 all new, new totals sum to the user base") {
    import spark.implicits._
    val got = Telemetry.newVsReturning(spark, sf)
      .orderBy($"day").collect()
    assert(got.head.getAs[Long]("returning_users") === 0L)
    val totalNew = got.map(_.getAs[Long]("new_users")).sum
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(totalNew === users)
    got.foreach(r => assert(r.getAs[Long]("active_users") ===
      r.getAs[Long]("new_users") + r.getAs[Long]("returning_users")))
  }

  test("bpe pair counts match a driver-side recount") {
    import spark.implicits._
    val got = TextOps.bpePairs(spark, sf).collect()
    val words = Tables.documents(spark, sf).select($"text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+"))
      .filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairCounts = words.toSeq.flatMap { case (w, f) =>
      w.sliding(2).map(_ -> f)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    got.foreach { r =>
      assert(pairCounts(r.getAs[String]("pair")) === r.getAs[Long]("n"))
    }
    // ranked list is the true global top-25
    val topDriver = pairCounts.toSeq.sortBy { case (p, n) => (-n, p) }.take(25)
    assert(got.sortBy(_.getAs[Long]("rnk")).map(r =>
      (r.getAs[String]("pair"), r.getAs[Long]("n"))).toSeq === topDriver)
  }

  test("frame dedup finds exactly the repeated digests, none singleton") {
    import spark.implicits._
    val frames = Multimodal.frameSample(spark, sf).toDF()
    val expect = frames.groupBy($"frame_md5").count()
      .filter($"count" > 1).count()
    val got = Multimodal.frameDedup(spark, sf)
    assert(got.count() === expect)
    assert(got.filter($"n_frames" < 2).count() === 0L)
    // spot-check: every reported digest really occurs n_frames times
    val sample = got.limit(5).collect()
    sample.foreach { r =>
      val n = frames.filter($"frame_md5" === r.getAs[String]("frame_md5")).count()
      assert(n === r.getAs[Long]("n_frames"))
    }
  }

  test("twap matches a driver-side hold-until-next integration") {
    import spark.implicits._
    val got = Telemetry.twap(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        (r.getAs[Double]("twap"), r.getAs[Long]("held_us"))).toMap
    val ev = Tables.events(spark, sf)
      .select($"event_type", date_format(to_date($"ts"), "yyyy-MM-dd").as("day"),
              unix_micros($"ts").as("us"), $"value", $"event_id")
      .collect()
      .groupBy(r => (r.getAs[String]("event_type"), r.getAs[String]("day")))
    ev.foreach { case (key, rows) =>
      val sorted = rows.sortBy(r => (r.getAs[Long]("us"), r.getAs[Long]("event_id")))
      if (sorted.length >= 2) {
        var num = 0L; var den = 0L
        sorted.sliding(2).foreach { case Array(a, b) =>
          val dt = b.getAs[Long]("us") - a.getAs[Long]("us")
          num += math.round(a.getAs[Double]("value") * 100) * dt
          den += dt
        }
        assert(got(key) === ((num.toDouble / (den * 100L).toDouble, den)), key)
      } else assert(!got.contains(key))
    }
  }

  test("tfidf: rank-1 term per doc maximizes the driver-recomputed score") {
    import spark.implicits._
    import graft.llm.TextOps
    val nDocs = Tables.documents(spark, sf).count().toDouble
    val texts = Tables.documents(spark, sf).filter($"doc_id" < 20)
      .select($"doc_id", $"text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.toLowerCase.split("\\s+").toSeq).toMap
    val dfMap = Tables.documents(spark, sf).select($"text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+").distinct)
      .groupBy(identity).view.mapValues(_.length).toMap
    val got = TextOps.tfidf(spark, sf).collect()
    got.filter(_.getAs[Long]("rnk") == 1L).foreach { r =>
      val doc = r.getAs[Long]("doc_id")
      val terms = texts(doc)
      def score(t: String): Double = {
        val tf = terms.count(_ == t).toDouble / terms.length
        val idf = BigDecimal(math.log(nDocs / dfMap(t)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        BigDecimal(tf * idf).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val best = terms.distinct.map(score).max
      assert(score(r.getAs[String]("term")) === best, s"doc $doc")
    }
  }

  test("line dedup matches a driver-side shared-chunk recompute") {
    import spark.implicits._
    import graft.llm.TextOps
    val got = TextOps.lineDedup(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Double]("dup_frac"))).toMap
    val lens = Tables.documents(spark, sf).select($"doc_id", length($"text"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // chunk count = ceil(len/80)
    got.foreach { case (id, (n, frac)) =>
      assert(n === (lens(id) + 79) / 80, s"doc $id chunks")
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // full driver recompute of the shared-chunk fractions
    val texts = Tables.documents(spark, sf).select($"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val chunksOf = texts.map { case (id, t) =>
      id -> t.grouped(80).toVector
    }.toMap
    val docsPerChunk = chunksOf.toSeq
      .flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    chunksOf.foreach { case (id, cs) =>
      val dup = cs.count(c => docsPerChunk(c) > 1)
      assert(got(id) === ((cs.length.toLong, dup.toDouble / cs.length)),
        s"doc $id")
    }
    // shared chunks DO exist in the corpus (the filter has signal)
    assert(got.values.exists(_._2 > 0.0))
  }

  test("lttb equals a BigInt driver replica; endpoints and bounds hold") {
    import spark.implicits._
    val got = Telemetry.lttb(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        (r.getAs[Long]("x_sec"), r.getAs[Long]("v100")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
    val raw = Tables.events(spark, sf)
      .select($"event_type", date_format(to_date($"ts"), "yyyy-MM-dd").as("day"),
              expr("(unix_micros(ts) div 1000000) % 86400").as("xs"),
              round($"value" * 100, 0).cast("long").as("v100"), $"event_id")
      .collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
    raw.foreach { case (key, rows) =>
      val pts = rows.sortBy(r => (r.getAs[Long]("xs"), r.getAs[Long]("event_id")))
        .map(r => (r.getAs[Long]("xs"), r.getAs[Long]("v100"))).toArray
      // independent replica with BigInt areas — also proves the long
      // arithmetic in the operator cannot have overflowed
      val expect: Vector[(Long, Long)] =
        if (pts.length <= 10) pts.toVector
        else {
          val n = pts.length
          val nMid = 8
          def rng(b: Int) = (1 + ((n - 2).toLong * b / nMid).toInt,
            math.min(1 + ((n - 2).toLong * (b + 1) / nMid).toInt, n - 1))
          val sel = scala.collection.mutable.ArrayBuffer(pts(0))
          var prev = pts(0)
          for (b <- 0 until nMid) {
            val (lo, hi) = rng(b)
            if (lo < hi) {
              val (nl, nh) = if (b + 1 < nMid) rng(b + 1) else (n - 1, n)
              val m = BigInt(nh - nl)
              val sx = pts.slice(nl, nh).map(p => BigInt(p._1)).sum
              val sy = pts.slice(nl, nh).map(p => BigInt(p._2)).sum
              val best = (lo until hi).maxBy { i =>
                (((BigInt(prev._1) * m - sx) * BigInt(pts(i)._2 - prev._2)
                  - BigInt(prev._1 - pts(i)._1) * (sy - m * BigInt(prev._2)))
                  .abs, -i) // earliest wins ties, matching the operator
              }
              sel += pts(best); prev = pts(best)
            }
          }
          sel += pts(n - 1)
          sel.toVector
        }
      assert(got(key) === expect, s"series-day $key")
      assert(got(key).head === pts.head && got(key).last === pts.last)
      assert(got(key).size <= 10)
    }
  }

  test("semantic dedup equals a driver-side within-cluster sweep") {
    import spark.implicits._
    import graft.llm.Dedup
    val got = Dedup.semantic(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    // driver recompute: same assignments, brute-force pairs in-cluster
    val assigns = graft.llm.SimOps.clusterAssignments(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ids = vecs.keys.toSeq.sorted
    val expect = (for {
      i <- ids; j <- ids if i < j && assigns(i) == assigns(j)
      if cos(vecs(i), vecs(j)) >= 0.35
    } yield (i, j)).toSet
    assert(got === expect)
  }

  test("mrl rerank: full-prefix run reproduces exact bruteforce top-k") {
    import spark.implicits._
    // with prefixDims = full dimensionality the coarse pass IS the exact
    // score, so the two-stage pipeline must return bruteforce's answer
    val dims = Tables.embeddings(spark, sf)
      .select(size($"embedding")).first().getInt(0)
    val full = SimOps.mrlRerank(spark, sf, prefixDims = dims)
      .select($"query_id", $"neighbor_id", $"cos6".as("cosine"), $"rnk")
    val brute = SimOps.simTopkBruteforce(spark, sf)
    assert(full.except(brute).count() === 0L && brute.except(full).count() === 0L)
    // shortlist ≥ corpus admits every candidate, so the re-rank is exact
    // even through an 8-dim coarse stage
    val corpus = Tables.embeddings(spark, sf).count().toInt
    val wide = SimOps.mrlRerank(spark, sf, shortlist = corpus)
      .select($"query_id", $"neighbor_id", $"cos6".as("cosine"), $"rnk")
    assert(wide.except(brute).count() === 0L && brute.except(wide).count() === 0L)
    // truncated prefix on UNIFORM-RANDOM synthetic vectors carries no
    // front-loaded signal (the MRL training property real embeddings
    // have), so only sanity-check that the two stages compose: some
    // exact neighbors still surface through a 20-wide shortlist
    val approx = SimOps.mrlRerank(spark, sf)
      .select($"query_id", $"neighbor_id")
    val overlap = approx.intersect(brute.select($"query_id", $"neighbor_id")).count()
    assert(overlap > 0L, "two-stage pipeline surfaced no exact neighbors")
  }
}
