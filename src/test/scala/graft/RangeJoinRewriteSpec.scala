package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.RangeJoinRewrite

/** RangeJoinRewrite: the naive interval-overlap join must be rewritten
  * into the bucketed equi-join (cells visible in the plan, no BNLJ for
  * the pure-interval case), produce bit-identical rows, and leave
  * non-matching joins untouched. */
class RangeJoinRewriteSpec extends SparkSpec {

  graft.functions.GraftFunctions.register(spark)

  private def withBin(w: String)(f: => Unit): Unit = {
    val prev = spark.conf.getOption(RangeJoinRewrite.BIN_KEY)
    if (w == null) spark.conf.unset(RangeJoinRewrite.BIN_KEY)
    else spark.conf.set(RangeJoinRewrite.BIN_KEY, w)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(RangeJoinRewrite.BIN_KEY, v)
      case None => spark.conf.unset(RangeJoinRewrite.BIN_KEY)
    }
  }

  /** Synthetic interval frames (deterministic, overlapping structure). */
  private def frames: (DataFrame, DataFrame) = {
    import spark.implicits._
    val a = (0 until 200).map(i => (i.toLong, (i * 7 % 97).toLong,
      (i * 7 % 97 + 1 + i % 13).toLong)).toDF("a_id", "a_lo", "a_hi")
    val b = (0 until 200).map(i => (i.toLong, (i * 11 % 101).toLong,
      (i * 11 % 101 + 1 + i % 9).toLong)).toDF("b_id", "b_lo", "b_hi")
    (a, b)
  }

  test("pure interval join: BNLJ without the rule, cell equi-join with it") {
    import spark.implicits._
    val (a, b) = frames
    def q = a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
    var offRows: Set[(Long, Long)] = null
    var offPlan: String = null
    withBin(null) {
      offPlan = q.queryExecution.executedPlan.toString
      offRows = q.select($"a_id", $"b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(offPlan.contains("BroadcastNestedLoop"),
      "expected the naive plan to be a nested loop")
    withBin("8") {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop"), plan.take(800))
      assert(plan.contains("Generate"), "grid-cell explode missing")
      val onRows = q.select($"a_id", $"b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(onRows === offRows)
      assert(onRows.nonEmpty)
    }
  }

  test("keyed overlap join: rewrite preserves rows exactly (duplicates too)") {
    import spark.implicits._
    val (a0, b0) = frames
    val a = a0.withColumn("k", $"a_id" % 5)
    val b = b0.withColumn("k2", $"b_id" % 5)
    def q = a.join(b, $"k" === $"k2" &&
      $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi" && $"a_id" =!= $"b_id")
    var off: Seq[(Long, Long)] = null
    withBin(null) {
      off = q.select($"a_id", $"b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    }
    withBin("8") {
      val on = q.select($"a_id", $"b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      // multiset equality: the canonical-cell condition must not
      // duplicate or drop a single pair
      assert(on === off)
    }
  }

  test("non-matching joins are left alone") {
    import spark.implicits._
    val (a, b) = frames
    withBin("8") {
      // left outer: not rewritten (rule is inner-only)
      val lo = a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi", "left")
      assert(!lo.queryExecution.optimizedPlan.toString.contains("__graft_cell"))
      // one-sided inequality only: not an overlap pattern
      val oneSided = a.join(b, $"a_lo" <= $"b_hi")
      assert(!oneSided.queryExecution.optimizedPlan.toString
        .contains("__graft_cell"))
      // non-integral bounds: not rewritten
      val ad = a.withColumn("alod", $"a_lo".cast("double"))
        .withColumn("ahid", $"a_hi".cast("double"))
      val bd = b.withColumn("blod", $"b_lo".cast("double"))
        .withColumn("bhid", $"b_hi".cast("double"))
      val dbl = ad.join(bd, $"alod" <= $"bhid" && $"blod" <= $"ahid")
      assert(!dbl.queryExecution.optimizedPlan.toString
        .contains("__graft_cell"))
    }
  }

  test("seeded random intervals incl. NEGATIVE bounds: rewrite is row-exact") {
    import spark.implicits._
    // truncated-div cells differ from floor-div below zero — the rule's
    // sign-safety claim (monotonicity suffices) gets adversarial input:
    // bounds straddling zero, zero-length and inverted intervals
    val rnd = new scala.util.Random(42)
    val mk = (n: Int, tag: String) => (0 until n).map { i =>
      val lo = rnd.nextInt(400) - 200L // [-200, 200)
      val len = rnd.nextInt(25) - 2L   // [-2, 23): some inverted
      (i.toLong, lo, lo + len)
    }.toDF(s"${tag}_id", s"${tag}_lo", s"${tag}_hi")
    val a = mk(300, "a")
    val b = mk(300, "b")
    def q = a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select($"a_id", $"b_id")
    var off: Seq[(Long, Long)] = null
    withBin(null) {
      off = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    }
    Seq("3", "8", "50").foreach { w =>
      withBin(w) {
        val on = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        assert(on === off, s"divergence at binSize=$w")
      }
    }
    assert(off.nonEmpty)
  }

  test("per-row cell cap: oversized intervals fail loud, raised cap passes") {
    import spark.implicits._
    val (a, b) = frames
    // one pathological row: an interval spanning 10⁶ cells at binSize=1
    val aBad = a.union(Seq((999L, 0L, 1000000L)).toDF("a_id", "a_lo", "a_hi"))
    def q = aBad.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
    withBin("1") {
      val prev = spark.conf.getOption(RangeJoinRewrite.MAX_CELLS_KEY)
      try {
        spark.conf.set(RangeJoinRewrite.MAX_CELLS_KEY, "4096")
        val ex = intercept[Exception] { q.count() }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil
          else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(ex).exists(_.contains("rangeJoinRewrite")),
          s"expected the cap's clear error, got: ${msgs(ex).take(2)}")
        // raising the cap past the span lets the same query run — and
        // row-exactly so
        spark.conf.set(RangeJoinRewrite.MAX_CELLS_KEY, "2000000")
        val on = q.select($"a_id", $"b_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val off = withBinValue(null) {
          q.select($"a_id", $"b_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
        }
        assert(on === off)
        assert(on.exists(_._1 == 999L), "the wide interval must match rows")
      } finally prev match {
        case Some(v) => spark.conf.set(RangeJoinRewrite.MAX_CELLS_KEY, v)
        case None => spark.conf.unset(RangeJoinRewrite.MAX_CELLS_KEY)
      }
    }
  }

  private def withBinValue[T](w: String)(f: => T): T = {
    val prev = spark.conf.getOption(RangeJoinRewrite.BIN_KEY)
    if (w == null) spark.conf.unset(RangeJoinRewrite.BIN_KEY)
    else spark.conf.set(RangeJoinRewrite.BIN_KEY, w)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(RangeJoinRewrite.BIN_KEY, v)
      case None => spark.conf.unset(RangeJoinRewrite.BIN_KEY)
    }
  }

  test("rewritten naive catalog query equals the hand-bucketed twin") {
    val hand = graft.operators.RangeJoin.intervalOverlap(spark, sf)
      .collect().map(_.toSeq).toSet
    withBin("7") {
      val auto = graft.operators.RangeJoin.intervalOverlapNaive(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(auto === hand)
    }
  }
}
