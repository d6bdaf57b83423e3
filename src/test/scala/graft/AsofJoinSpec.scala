package graft

import java.sql.Timestamp

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {

  private def t(ms: Long) = new Timestamp(ms)

  test("leftAsof: latest at-or-before match, exact-time match, and null before first") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val left = Seq(
      (1L, t(50L)),   // before any right row for key 1 → null
      (1L, t(100L)),  // exactly at right t=100 → matches v=10
      (1L, t(250L)),  // after 100 and 200 → matches v=20
      (2L, t(500L))   // key 2 has no right rows at all → null
    ).toDF("k", "ts")
    val right = Seq(
      (1L, t(100L), 10.0),
      (1L, t(200L), 20.0)
    ).toDF("rk", "rts", "v")

    val out = AsofJoin.leftAsof(left, right,
      col("k"), col("rk"), col("ts"), col("rts"), Seq("v" -> col("v")))
      .select(col("k"), col("ts"), col("_asof.v").as("v"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
                           if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(x => (x._1, x._2))

    assert(out === Array(
      (1L, 50L, None),
      (1L, 100L, Some(10.0)),
      (1L, 250L, Some(20.0)),
      (2L, 500L, None)))
  }

  test("leftAsofForward: earliest at-or-after match, exact-time match, null after last") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val left = Seq(
      (1L, t(50L)),   // before both right rows → earliest following v=10
      (1L, t(100L)),  // exactly at right t=100 → matches v=10
      (1L, t(150L)),  // between → next is v=20
      (1L, t(250L)),  // after the last right row → null
      (2L, t(500L))   // key 2 has no right rows → null
    ).toDF("k", "ts")
    val right = Seq(
      (1L, t(100L), 10.0),
      (1L, t(200L), 20.0)
    ).toDF("rk", "rts", "v")
    val out = AsofJoin.leftAsofForward(left, right,
      col("k"), col("rk"), col("ts"), col("rts"), Seq("v" -> col("v")))
      .select(col("k"), col("ts"), col("_asof.v").as("v"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
                           if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(x => (x._1, x._2))
    assert(out === Array(
      (1L, 50L, Some(10.0)),
      (1L, 100L, Some(10.0)),
      (1L, 150L, Some(20.0)),
      (1L, 250L, None),
      (2L, 500L, None)))
  }

  test("leftAsofTolerance: stale matches null out, fresh ones survive") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val left = Seq(
      (1L, t(100L)),  // exact match, age 0 → v=10
      (1L, t(150L)),  // age 50ms ≤ tol → v=10
      (1L, t(300L)),  // latest right is t=200, age 100ms > tol(60ms) → null
      (1L, t(260L))   // latest right is t=200, age 60ms == tol → v=20
    ).toDF("k", "ts")
    val right = Seq(
      (1L, t(100L), 10.0),
      (1L, t(200L), 20.0)
    ).toDF("rk", "rts", "v")
    val out = AsofJoin.leftAsofTolerance(left, right,
      col("k"), col("rk"), col("ts"), col("rts"), Seq("v" -> col("v")),
      toleranceUs = 60000L) // 60 ms in micros
      .select(col("k"), col("ts"), col("_asof.v").as("v"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
                           if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(x => (x._1, x._2))
    assert(out === Array(
      (1L, 100L, Some(10.0)),
      (1L, 150L, Some(10.0)),
      (1L, 260L, Some(20.0)),
      (1L, 300L, None)))
    // the tolerance bookkeeping column never leaks into the output
    val cols = AsofJoin.leftAsofTolerance(left, right,
      col("k"), col("rk"), col("ts"), col("rts"), Seq("v" -> col("v")), 60000L)
      .select(col("_asof.*")).columns
    assert(cols.toSeq === Seq("v"))
  }
}
