package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: prints the formatted physical plan per query so shuffle
  * count, PushedFilters, broadcast joins, and codegen spans can be
  * reviewed. Usage: runMain graft.ExplainAudit <sfDir> [queryName...] */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      // conf-gated rewrites (topk, range-join, rollup) audit the plan
      // they actually ship with
      SparkEntry.withConfs(spark,
        SparkEntry.queryConfs.getOrElse(n, Map.empty)) {
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
