package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Parquet table loaders for the graft engine.
  *
  * Mirrors the reference's table-per-signal layout
  * (/root/reference/README.md "Schema" section): the exporter produces
  * flat parquet tables which downstream engines scan. Here the scan is a
  * plain `spark.read.parquet` so Catalyst handles column pruning and
  * predicate pushdown into the parquet reader.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** All reads force LTZ timestamp inference: the generated parquet
    * stamps timestamp columns isAdjustedToUTC=false, which Spark ≥3.4
    * would otherwise surface as TIMESTAMP_NTZ — a type `unix_micros`/
    * `date_trunc(tz)` reject and the DuckDB oracle doesn't produce.
    * With inference off the stored micros are read verbatim as UTC
    * instants (sessions here run UTC), matching the oracle's naive
    * reading bit-for-bit. The conf is saved and RESTORED around the
    * (eager) schema-inference step — Spark 4.1 has no per-read parquet
    * option for this, and the inferred schema is frozen into the
    * relation, so scoping the override to the `spark.read` call leaves
    * parquet reads outside these loaders with their own NTZ
    * inference (no global side effect). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try spark.read.parquet(s"$sfDir/$name.parquet")
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. We read it as a raw long (legacy conf) and truncate
    * to microseconds — Spark's native timestamp precision. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Exact integer truncation: `/` on longs is double division in
        // Spark (ulp at 2024-era ns epochs is 256ns, so ~13% of rows land
        // 1us off after the cast). `div` keeps it in integer math.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Fan a SMALL pre-kernel frame out across the session's cores.
    *
    * A table that arrives as one (or few) parquet files plans as ONE
    * scan partition, so an expensive per-row kernel applied before any
    * shuffle — media encode/decode, digests, codec passes — runs on a
    * single core no matter how many the session has (the "one
    * unsplittable input" skew of the optimization guide §2.5). The
    * frames spread here are narrow id/text projections whose bytes are
    * noise next to the kernel cost, so the round-robin exchange is
    * essentially free; on a many-file table the repartition simply
    * preserves the parallelism the scan already had. Sized by
    * `defaultParallelism` (tracks the session's core count) rather
    * than any constant, so the same code is right at local[8],
    * local[32] and on a cluster. */
  def spread[T](ds: Dataset[T]): Dataset[T] =
    ds.repartition(ds.sparkSession.sparkContext.defaultParallelism)
}
