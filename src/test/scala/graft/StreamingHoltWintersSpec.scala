package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingHoltWinters
import graft.streaming.StreamingHoltWinters.{Ev, Forecast}
import graft.telemetry.Telemetry

/** Streaming Holt-Winters: the incrementally-maintained (level, trend,
  * seasonals) state must be bit-identical to the batch fold over the
  * same closed hours when the corpus replays chronologically. */
class StreamingHoltWintersSpec extends SparkSpec {

  private def withRocksDb(f: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streamed hourly closes reproduce the batch Holt-Winters state exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) as ts")
      .as[Ev].collect().sortBy(_.ts)
    val h0 = Math.floorDiv(events.head.ts, 3600000000L)
    val h1 = Math.floorDiv(events.last.ts, 3600000000L)
    // sentinel per series one hour past the grid: closes h1 so the
    // stream has folded exactly the batch grid h0..h1 (the sentinel's
    // own hour stays open and never folds)
    val sentinels = events.map(_.event_type).distinct
      .map(et => Ev(et, (h1 + 1) * 3600000000L))
    val half = events.length / 2
    val batches: Seq[Array[Ev]] =
      Seq(events.take(half), events.drop(half), sentinels)
    val want = Telemetry.holtWinters(spark, sf).collect().map { r =>
      r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("level"),
         r.getAs[Double]("trend"), r.getAs[Double]("s_next"),
         r.getAs[Double]("forecast"))
    }.toMap
    withRocksDb {
      val input = MemoryStream[Ev]
      val q = StreamingHoltWinters.forecasts(input.toDS(), 24, h0)
        .writeStream.format("memory").queryName("hw_out")
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      try {
        batches.foreach { b =>
          input.addData(b.toIndexedSeq)
          q.processAllAvailable()
        }
        val round6 = (x: Double) =>
          BigDecimal(x).setScale(6,
            scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
        val got = spark.sql(
          "select * from (select *, row_number() over " +
          "(partition by event_type order by n_hours desc) rn from hw_out) " +
          "where rn = 1")
          .drop("rn").as[Forecast].collect()
          .map(f => f.event_type ->
            (f.n_hours, round6(f.level), round6(f.trend), round6(f.s_next),
             round6(f.forecast)))
          .toMap
        assert(got === want)
      } finally q.stop()
    }
  }

  test("gap hours close as zero: sparse series match a dense-fold replica") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // synthetic sparse series: bursts with multi-hour gaps over 3 days
    val hour = 3600000000L
    val evs = (0 until 72).flatMap { h =>
      val cnt = if (h % 7 == 0) 3 else if (h % 11 == 0) 1 else 0
      Seq.fill(cnt)(Ev("sparse", h * hour + 1000L))
    } :+ Ev("sparse", 72 * hour) // sentinel closes hour 71
    // dense replica (same fold as the batch kernel)
    val xs = (0 until 72).map { h =>
      (if (h % 7 == 0) 3 else if (h % 11 == 0) 1 else 0).toDouble
    }.toArray
    val p = 24
    val l0 = xs.take(p).sum / p
    val b0 = (xs.slice(p, 2 * p).sum / p - l0) / p
    var m = Array(l0, b0) ++ xs.take(p).map(_ - l0)
    xs.drop(p).foreach { x =>
      // (1.0 - α) etc., NOT 0.7/0.9/0.8 literals: 1.0 − 0.3 is a
      // DIFFERENT double than 0.7 — the kernel computes the complement
      val l = (x - m(2)) * 0.3 + (m(0) + m(1)) * (1.0 - 0.3)
      val b = (l - m(0)) * 0.1 + m(1) * (1.0 - 0.1)
      val s = (x - l) * 0.2 + m(2) * (1.0 - 0.2)
      m = Array(l, b) ++ m.slice(3, 2 + p) ++ Array(s)
    }
    withRocksDb {
      val input = MemoryStream[Ev]
      val q = StreamingHoltWinters.forecasts(input.toDS(), p, 0L)
        .writeStream.format("memory").queryName("hw_sparse")
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      try {
        input.addData(evs.toIndexedSeq)
        q.processAllAvailable()
        val f = spark.sql("select * from hw_sparse order by n_hours desc limit 1")
          .as[Forecast].collect().head
        assert(f.n_hours === 72L)
        assert(f.level === m(0) && f.trend === m(1) && f.s_next === m(2))
      } finally q.stop()
    }
  }
}
