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
}
