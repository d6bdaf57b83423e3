package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, TextOps}
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
