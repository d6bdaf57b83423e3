package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, SimOps, TextOps}
import graft.operators.Core
import graft.telemetry.Telemetry

/** Semantic properties of the round-5 operators (oracle hash-parity is
  * the driver's job; these pin the invariants a hash can't express). */
class Round5OpsSpec extends SparkSpec {

  test("transition probabilities are a proper distribution per from-state") {
    import spark.implicits._
    val t = Telemetry.transitions(spark, sf)
    // each from_type's probabilities sum to 1 (exact n/total divisions)
    val sums = t.groupBy($"from_type").agg(sum($"p").as("s")).collect()
    sums.foreach(r => assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-12))
    // total transition count = total events − one per user (a user with
    // k events contributes exactly k−1 ordered transitions)
    val events = Tables.events(spark, sf)
    val expect = events.count() - events.select($"user_id").distinct().count()
    assert(t.agg(sum($"n")).collect()(0).getLong(0) === expect)
  }

  test("week-over-week movers: ranked ≤3 per week and deltas consistent") {
    import spark.implicits._
    val m = Telemetry.weekOverWeek(spark, sf).collect()
    assert(m.nonEmpty)
    m.groupBy(_.getAs[String]("week_start")).foreach { case (_, rows) =>
      val rnks = rows.map(_.getAs[Long]("rnk")).sorted
      assert(rnks === (1L to rnks.length).toArray && rnks.length <= 3)
    }
    m.foreach { r =>
      assert(r.getAs[Long]("delta") === r.getAs[Long]("n") - r.getAs[Long]("prev_n"))
      assert(r.getAs[Double]("pct") ===
        (r.getAs[Long]("n") - r.getAs[Long]("prev_n")).toDouble / r.getAs[Long]("prev_n"))
    }
  }

  test("weighted systematic sample: ~target per stratum, heavy docs always in") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val got = TextOps.weightedSample(spark, sf, perStratum = 10)
    val byLang = got.groupBy($"lang").agg(count(lit(1)).as("k"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("k")).toMap
    val totals = docs.groupBy($"lang").agg(sum($"n_chars").as("w"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("w")).toMap
    totals.foreach { case (lang, w) =>
      val stride = math.max(1L, w / 10)
      // systematic sampling takes one doc per crossed stride boundary:
      // exactly floor(total/stride) selections, ±1 for the first boundary
      val k = byLang.getOrElse(lang, 0L)
      assert(math.abs(k - w / stride) <= 1, s"stratum $lang: $k vs ${w / stride}")
      // any document heavier than the stride must cross a boundary
      val heavy = docs.filter($"lang" === lang && $"n_chars" >= stride).count()
      val heavyIn = got.filter($"lang" === lang && $"n_chars" >= stride).count()
      assert(heavy === heavyIn)
    }
    // deterministic: no RNG anywhere, re-running yields the same sample
    assert(got.collect().map(_.toString).sorted ===
      TextOps.weightedSample(spark, sf, perStratum = 10).collect().map(_.toString).sorted)
  }

  test("table profile matches directly computed column statistics") {
    import spark.implicits._
    val p = Core.qTableProfile(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val e = Tables.events(spark, sf)
    val n = e.count()
    assert(p.keySet === Set("event_id", "user_id", "event_type", "value", "props"))
    p.values.foreach(r =>
      assert(r.getAs[Long]("non_null") + r.getAs[Long]("n_null") === n))
    assert(p("event_id").getAs[Long]("n_distinct") === n) // ids unique
    assert(p("user_id").getAs[Double]("max_val") ===
      e.agg(max($"user_id")).collect()(0).getLong(0).toDouble)
    assert(p("event_type").getAs[Long]("n_distinct") ===
      e.select($"event_type").distinct().count())
    assert(p("event_type").isNullAt(p("event_type").fieldIndex("min_val")))
  }

  test("interpolation brackets: filled values lie between their endpoints") {
    import spark.implicits._
    val f = Telemetry.interpolate(spark, sf)
    // present points pass through untouched: join back to the hourly agg
    val hourly = Tables.events(spark, sf)
      .groupBy($"event_type",
               date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss")
                 .as("hour_start"))
      .agg(round(sum($"value"), 4).as("v"))
    val present = f.filter(!$"was_missing")
      .join(hourly, Seq("event_type", "hour_start"))
    assert(present.filter($"filled" =!= $"v").count() === 0)
    assert(present.count() === hourly.count())
    // every grid hour appears exactly once per series, and gaps exist
    val missing = f.filter($"was_missing")
    assert(missing.count() > 0, "test data has no hourly gaps to fill")
    assert(f.groupBy($"event_type", $"hour_start").count()
      .filter($"count" > 1).count() === 0)
    // interior gaps interpolate BETWEEN neighbors: filled is bounded by
    // the series' min/max of present values
    val bounds = hourly.groupBy($"event_type")
      .agg(min($"v").as("lo"), max($"v").as("hi"))
    assert(missing.join(bounds, "event_type")
      .filter($"filled" < $"lo" || $"filled" > $"hi").count() === 0)
  }

  test("MAD outliers: exactly the rows whose robust score exceeds 3") {
    import spark.implicits._
    val out = Telemetry.madOutliers(spark, sf)
    assert(out.filter(abs($"score") <= 3.0).count() === 0)
    // reference med/mad per type, computed driver-side
    val vals = Tables.events(spark, sf)
      .select($"event_type", round($"value" * 100, 0).cast("long").as("v"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)))
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    val expected = vals.map { case (et, vs) =>
      val med = medianOf(vs.map(_.toDouble))
      val mad = medianOf(vs.map(v => math.abs(v - med)))
      et -> vs.count(v => math.abs((v - med) / (1.4826 * mad)) > 3.0)
    }.toMap
    val got = out.groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    expected.filter(_._2 > 0).foreach { case (et, n) =>
      assert(got.getOrElse(et, 0L) === n.toLong, s"series $et")
    }
  }

  test("sketch rollup: union-of-hourly equals direct daily, within 5% of exact") {
    import spark.implicits._
    val rolled = Telemetry.sketchRollup(spark, sf).collect()
      .map(r => r.getAs[String]("day") -> r.getAs[Long]("approx_users")).toMap
    // direct single-level daily sketch (no hourly intermediate): HLL
    // union at fixed lgK is register-wise lossless, so estimates match
    val direct = Tables.events(spark, sf)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(12))).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled === direct)
    val exact = Tables.events(spark, sf)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (day, n) =>
      assert(math.abs(rolled(day) - n).toDouble / n < 0.05,
        s"$day: approx ${rolled(day)} vs exact $n")
    }
  }

  test("trained OPQ rotation: orthonormal, diagonalizing, spectrum sorted") {
    val cov = SimOps.covariance(spark, sf)
    val d = cov.length
    // covariance is symmetric by construction
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(cov(i)(j) - cov(j)(i)) < 1e-12)
    val (eig, rot) = SimOps.jacobiEigen(cov)
    // rows orthonormal: R·Rᵀ = I
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(t => rot(i)(t) * rot(j)(t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j)=$dot")
    }
    // eigenvalues descending and R C Rᵀ ≈ diag(eig)
    assert(eig.zip(eig.tail).forall { case (a, b) => a >= b - 1e-12 })
    val scale = eig.map(math.abs).max
    for (i <- 0 until d; j <- 0 until d) {
      val rcr = (0 until d).map(t =>
        rot(i)(t) * (0 until d).map(u => cov(t)(u) * rot(j)(u)).sum).sum
      val want = if (i == j) eig(i) else 0.0
      assert(math.abs(rcr - want) < 1e-8 * scale, s"RCRt($i,$j)=$rcr vs $want")
    }
    // end-to-end: k neighbors per query, deterministic across runs
    val a = SimOps.opqTrainedAnn(spark, sf).collect().map(_.toString).sorted
    assert(a.length === 8 * 5)
    val b = SimOps.opqTrainedAnn(spark, sf).collect().map(_.toString).sorted
    assert(a === b)
  }

  test("edit-distance dedup equals the brute-force quadratic on sf0.001") {
    import spark.implicits._
    val got = Dedup.editDistance(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"),
                 r.getAs[Long]("edit_dist"))).toSet
    def lev(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length) {
          val cost = if (a(i - 1) == b(j - 1)) 0 else 1
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        }
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      d = lev(ta, tb) if d <= 8
    } yield (ia, ib, d.toLong)).toSet
    assert(got === expect)
    assert(got.nonEmpty) // the corpus does contain near-dups at this sf
  }
}
