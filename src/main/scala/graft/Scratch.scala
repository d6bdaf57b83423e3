package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop scratch pad — never committed; used to time sub-phases of a
  * query while optimizing. */
object Scratch {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).count()
    graft.functions.GraftFunctions.register(spark)


    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val edges = t("edges distinct (df)") {
        Tables.lineitem(spark, sfDir)
          .select($"l_suppkey".as("s"), $"l_partkey".as("p"))
          .distinct()
      }
      val deg = t("deg (df)") { edges.groupBy($"s").agg(count(lit(1)).as("d").as("deg")) }
      val lists = t("lists ckpt") {
        edges.join(deg, "s")
          .groupBy($"p")
          .agg(collect_list(struct($"s", $"deg")).as("ns"))
          .filter(size($"ns") > 1).filter(size($"ns") <= 1024)
          .localCheckpoint()
      }
      println("lists=" + lists.count())
      t("expand+agg+topk") {
        lists
          .select(explode($"ns").as("a"), $"ns")
          .select($"a", explode($"ns").as("b"))
          .filter($"a.s" < $"b.s")
          .groupBy($"a.s".as("supp_a"), $"b.s".as("supp_b"),
                   $"a.deg".as("deg_a"), $"b.deg".as("deg_b"))
          .agg(count(lit(1)).as("common"))
          .withColumn("jaccard",
            org.apache.spark.sql.functions.round($"common" / ($"deg_a" + $"deg_b" - $"common"), 6))
          .orderBy($"jaccard".desc, $"supp_a".asc, $"supp_b".asc)
          .limit(20)
          .count()
      }
    }

    spark.stop()
  }
}
