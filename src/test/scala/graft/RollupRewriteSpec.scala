package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.plans.RollupRewrite
import graft.telemetry.Rollups

/** Materialized-rollup aggregate rewrite (graft.plans.RollupRewrite):
  * with the spec conf set, an aggregate over the raw events scan must
  * flip to a scan of the hourly rollup — bit-identical rows — and every
  * non-derivable shape must keep the raw plan. */
class RollupRewriteSpec extends SparkSpec {

  private lazy val rollupPath: String = {
    graft.functions.GraftFunctions.register(spark)
    Rollups.ensureHourlyEvents(spark, sf)
  }

  private lazy val dayPath: String = {
    rollupPath // ensure both built
    graft.plans.RollupRewrite.rollupPathFor("/tmp/graft_rollups_day",
      java.nio.file.Paths.get(s"$sf/events.parquet").toAbsolutePath.toString)
  }

  private def specJson: String = {
    rollupPath // force build + rule registration
    Rollups.EventsSpecJson
  }

  /** Root paths of every parquet relation in the OPTIMIZED plan. */
  private def scannedPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toString.replaceFirst("^file:(//)?", ""))
        case _ => Nil
      }
    }.flatten

  private def withSpec[T](body: => T): T = {
    spark.conf.set(RollupRewrite.SPEC_KEY, specJson)
    try body finally spark.conf.unset(RollupRewrite.SPEC_KEY)
  }

  private def events = Tables.events(spark, sf)

  private def collectSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def assertRewritten(mk: => DataFrame): Unit = {
    val raw = collectSet(mk) // conf off: raw plan
    withSpec {
      val df = mk
      val paths = scannedPaths(df)
      assert(paths.exists(p => p == rollupPath || p == dayPath),
        s"expected a rollup scan, got $paths")
      assert(!paths.exists(_.endsWith("/events.parquet")))
      assert(collectSet(df) === raw)
    }
  }

  private def assertNotRewritten(mk: => DataFrame): Unit = withSpec {
    val paths = scannedPaths(mk)
    assert(paths.exists(_.endsWith("/events.parquet")),
      s"expected raw scan kept, got $paths")
  }

  test("day+dim count/sum/min/max with aligned bound flips to the rollup") {
    assertRewritten {
      import spark.implicits._
      events
        .filter($"ts" >= lit(java.time.Instant.parse("2024-01-02T00:00:00Z")))
        .groupBy($"ts".cast("date").as("day"), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("long")).as("s_trunc"),
          sum($"user_id").as("s_uid"),
          min($"value").as("mn"), max($"value").as("mx"))
    }
  }

  test("date_trunc groupings at hour and coarser rewrite; hour() too") {
    assertRewritten {
      import spark.implicits._
      events.groupBy(date_trunc("week", $"ts").as("wk"))
        .agg(count(lit(1)).as("n"))
    }
    assertRewritten {
      import spark.implicits._
      events.groupBy(hour($"ts").as("hod"), $"event_type")
        .agg(max($"value").as("mx"))
    }
    assertRewritten {
      import spark.implicits._
      // dim-only filter + global (no time) grouping
      events.filter($"event_type" =!= "view")
        .groupBy($"event_type").agg(count(lit(1)).as("n"))
    }
  }

  test("global aggregate over an empty-matching filter stays count=0") {
    withSpec {
      import spark.implicits._
      val df = events.filter($"event_type" === "no_such_type")
        .agg(count(lit(1)).as("n"))
      assert(scannedPaths(df).exists(p => p == rollupPath || p == dayPath))
      assert(df.collect().map(_.getLong(0)).toSeq === Seq(0L))
    }
  }

  test("non-derivable shapes keep the raw plan") {
    import spark.implicits._
    // minute grain is finer than the rollup
    assertNotRewritten(
      events.groupBy(date_trunc("minute", $"ts")).agg(count(lit(1))))
    // unaligned time bound
    assertNotRewritten(
      events
        .filter($"ts" >= lit(java.time.Instant.parse("2024-01-02T00:30:00Z")))
        .groupBy($"event_type").agg(count(lit(1))))
    // ts <= L does not commute with hour truncation
    assertNotRewritten(
      events
        .filter($"ts" <= lit(java.time.Instant.parse("2024-01-02T00:00:00Z")))
        .groupBy($"event_type").agg(count(lit(1))))
    // distinct aggregate
    assertNotRewritten(
      events.groupBy($"event_type").agg(countDistinct($"user_id")))
    // unregistered measure
    assertNotRewritten(
      events.groupBy($"event_type").agg(sum($"event_id")))
    // avg is not registered (only count/sum/min/max)
    assertNotRewritten(
      events.groupBy($"event_type").agg(avg($"value")))
    // raw ts in the projection: not derivable from the hour grain
    assertNotRewritten(
      events.groupBy($"ts").agg(count(lit(1))))
    // filter on a non-dim column
    assertNotRewritten(
      events.filter($"user_id" > 100).groupBy($"event_type")
        .agg(count(lit(1))))
  }

  test("the MV hierarchy picks the coarsest rollup that answers") {
    import spark.implicits._
    def scansOf(df: DataFrame): Seq[String] = scannedPaths(df)
    withSpec {
      // day-or-coarser shapes land on the day rollup
      val day = events
        .filter($"ts" >= lit(java.time.Instant.parse("2024-01-02T00:00:00Z")))
        .groupBy($"ts".cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      assert(scansOf(day).contains(dayPath))
      assert(!scansOf(day).contains(rollupPath))
      // hour-of-day needs the hour grain → falls through to hourly
      val hod = events.groupBy(hour($"ts").as("hod"))
        .agg(count(lit(1)).as("n"))
      assert(scansOf(hod).contains(rollupPath))
      assert(!scansOf(hod).contains(dayPath))
      // hour-aligned-but-not-day-aligned bound: day spec bails on
      // alignment, hourly answers — even though the GROUPING is daily
      val mixed = events
        .filter($"ts" >= lit(java.time.Instant.parse("2024-01-02T05:00:00Z")))
        .groupBy($"ts".cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      assert(scansOf(mixed).contains(rollupPath))
      assert(!scansOf(mixed).contains(dayPath))
    }
  }

  test("non-UTC session zone bails") {
    withSpec {
      import spark.implicits._
      val prev = spark.conf.get("spark.sql.session.timeZone")
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      try {
        val df = events.groupBy($"event_type").agg(count(lit(1)))
        assert(scannedPaths(df).exists(_.endsWith("/events.parquet")))
      } finally spark.conf.set("spark.sql.session.timeZone", prev)
    }
  }

  test("rollup proof queries agree with their raw twins") {
    // the SparkEntry pair: rewriteProof under its conf == raw run
    val raw = collectSet(Rollups.rewriteProof(spark, sf))
    withSpec {
      val df = Rollups.rewriteProof(spark, sf)
      // day grouping + day-aligned bound → the 24×-smaller DAY rollup
      assert(scannedPaths(df).exists(_ == dayPath))
      assert(collectSet(df) === raw)
    }
    // the materialized frame re-aggregates to the day grain exactly
    import spark.implicits._
    val viaRollup = spark.read.parquet(rollupPath)
      .groupBy($"hour_ts".cast("date").as("day"), $"event_type")
      .agg(sum($"cnt").as("n")).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2))).toSet
    val viaRaw = events
      .groupBy($"ts".cast("date").as("day"), $"event_type")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(viaRollup === viaRaw)
    val _ = Files.exists(java.nio.file.Paths.get(rollupPath))
  }
}
