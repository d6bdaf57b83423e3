package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** The custom-operator path (AsOfJoinNode → AsOfJoinStrategy →
  * AsOfJoinExec): plan shape, strategy equivalence with the
  * union+window baseline, and merge edge cases. */
class AsOfNativeSpec extends SparkSpec {

  test("native as-of plans AsOfJoinExec with injected exchanges and sorts") {
    val plan = AsofJoin.qAsofNative(spark, sf)
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix: the node prints "AsOfJoin"
    assert(plan.contains("AsOfJoin ["), plan)
    // EnsureRequirements must have inserted the co-located machinery
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort ["), plan)
  }

  test("native exec and union+window strategy return identical rows") {
    val native = AsofJoin.qAsofNative(spark, sf)
    val window = AsofJoin.qAsofJoin(spark, sf)
    assert(native.count() === window.count())
    assert(native.except(window).count() === 0L)
    assert(window.except(native).count() === 0L)
  }

  test("merge edge cases: exact-ts match, no-match nulls, latest-wins") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "l1"),  // before any right row for key 1
      (1L, 200L, "l2"),  // exact-timestamp match (ts == right ts)
      (1L, 350L, "l3"),  // between rights: latest-at-or-before wins
      (2L, 500L, "l4"),  // key with no right rows at all
      (3L, 50L,  "l5")   // right rows exist but all AFTER this ts
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 200L, "r200"),
      (1L, 300L, "r300"),
      (1L, 400L, "r400"),
      (3L, 60L,  "r60")
    ).toDF("k", "t", "payload")
    val got = AsofJoin.leftAsofNative(
        left, right.withColumnRenamed("k", "rk").withColumnRenamed("t", "rt"),
        "k", "rk", "t", "rt")
      .select($"tag", $"payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got === Map(
      "l1" -> None,          // nothing at or before 100
      "l2" -> Some("r200"),  // rightTime == leftTime counts
      "l3" -> Some("r300"),  // 300 is the latest ≤ 350 (not 200, not 400)
      "l4" -> None,          // key never appears on the right
      "l5" -> None))         // right exists only in the future
  }

  test("bucketed right side feeds the native as-of with NO exchange") {
    import spark.implicits._
    // the declarative ClusteredDistribution requirement lets a
    // pre-bucketed side satisfy the exec without any shuffle — the
    // 100 TB win: a bucketed quote/dimension history joins as-of with
    // only the probe side paying an exchange
    spark.sql("DROP TABLE IF EXISTS asof_right_b")
    (0L until 100L).map(i => (i % 10, i * 100L, s"R$i"))
      .toDF("rk", "rt", "payload").write
      .bucketBy(4, "rk").sortBy("rk", "rt")
      .mode("overwrite").saveAsTable("asof_right_b")
    val left = (0L until 300L).map(i => (i % 10, i * 40L, s"L$i"))
      .toDF("k", "t", "tag")
    val joined = AsofJoin.leftAsofNative(
      left, spark.table("asof_right_b"), "k", "rk", "t", "rt")
    val plan = joined.queryExecution.executedPlan.toString
    // right side: bucketed scan → (sort if needed) → AsOfJoin, no Exchange
    assert(!plan.contains("Exchange hashpartitioning(rk"),
      s"bucketed right side shuffled:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(k"),
      s"probe side should still shuffle:\n$plan")
    // correctness unchanged vs the window strategy
    val viaWindow = AsofJoin.leftAsof(
        left, spark.table("asof_right_b"),
        $"k", $"rk", $"t", $"rt", Seq("payload" -> $"payload"))
      .select($"tag", $"_asof.payload".as("payload"))
    val viaNative = joined.select($"tag", $"payload")
    assert(viaNative.except(viaWindow).count() === 0L)
    assert(viaWindow.except(viaNative).count() === 0L)
    spark.sql("DROP TABLE IF EXISTS asof_right_b")
  }

  test("plan-time validation: mismatched key or time types fail fast") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l")).toDF("k", "t", "tag")
    // int key vs long key — RowOrdering over the left types would read
    // garbage bytes from the right rows (r5 ADVICE)
    val rightIntKey = Seq((1, 100L, "r")).toDF("rk", "rt", "payload")
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.leftAsofNative(left, rightIntKey, "k", "rk", "t", "rt")
    }
    assert(e1.getMessage.contains("key columns must share a type"))
    // timestamp-micros vs raw bigint — same-unit requirement
    val rightTsTime = Seq((1L, new Timestamp(100L), "r")).toDF("rk", "rt", "payload")
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.leftAsofNative(left, rightTsTime, "k", "rk", "t", "rt")
    }
    assert(e2.getMessage.contains("time columns must share a type"))
  }

  test("null time raises instead of silently joining as epoch-0") {
    import spark.implicits._
    val left = Seq((1L, Some(100L), "l1"), (1L, None, "l2"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 50L, "r")).toDF("rk", "rt", "payload")
    val err = intercept[Exception] {
      AsofJoin.leftAsofNative(left, right, "k", "rk", "t", "rt").collect()
    }
    def rootChain(t: Throwable): List[Throwable] =
      t :: Option(t.getCause).map(rootChain).getOrElse(Nil)
    assert(rootChain(err).exists(c =>
        Option(c.getMessage).exists(_.contains("requires non-null times"))),
      s"unexpected failure: $err")
  }

  test("native exec survives multi-partition keys and empty partitions") {
    import spark.implicits._
    // many keys → rows spread over all 4 test partitions; some keys
    // right-only, some left-only
    val left = (0L until 400L).map(i => (i % 40, i, s"L$i")).toDF("k", "t", "tag")
    val right = (0L until 200L).map(i => (i % 20, i * 2, s"R$i")).toDF("rk", "rt", "payload")
    val native = AsofJoin.leftAsofNative(left, right, "k", "rk", "t", "rt")
    // reference: per-row argmax computed on the driver
    val rights = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expect = left.collect().map { r =>
      val (k, t, tag) = (r.getLong(0), r.getLong(1), r.getString(2))
      val best = rights.filter(x => x._1 == k && x._2 <= t)
        .sortBy(x => (x._2, x._3)).lastOption.map(_._3)
      tag -> best
    }.toMap
    val got = native.select($"tag", $"payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got === expect)
  }

  test("FORWARD native merge equals the forward window composition and a driver argmin") {
    import spark.implicits._
    // the three-strategy cross-check on the real tables
    val native = AsofJoin.qAsofForwardNative(spark, sf)
    val window = AsofJoin.qAsofForward(spark, sf)
    assert(native.count() === window.count())
    assert(native.except(window).count() === 0L)
    assert(window.except(native).count() === 0L)
    // synthetic multi-partition fixture vs driver reference: earliest
    // at-or-after wins; right rows are shared by several lefts
    val left = (0L until 400L).map(i => (i % 40, i, s"L$i")).toDF("k", "t", "tag")
    val right = (0L until 200L).map(i => (i % 20, i * 2, s"R$i")).toDF("rk", "rt", "payload")
    val fwd = AsofJoin.leftAsofNative(left, right, "k", "rk", "t", "rt",
      forward = true)
    val rights = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expect = left.collect().map { r =>
      val (k, t, tag) = (r.getLong(0), r.getLong(1), r.getString(2))
      val best = rights.filter(x => x._1 == k && x._2 >= t)
        .sortBy(x => (x._2, x._3)).headOption.map(_._3)
      tag -> best
    }.toMap
    val got = fwd.select($"tag", $"payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got === expect)
  }
}
