package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Near-duplicate detection for training-data pipelines (SURVEY.md §2.3):
  * MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * All signature computation is narrow (per-row higher-order expressions,
  * no UDFs, no shuffle); the only shuffles are the LSH bucket join —
  * bounded by band count — and the final candidate verification. This is
  * the shape that survives 100 TB: cost is O(rows) for signatures plus
  * O(candidate pairs), never O(rows²).
  */
object Dedup {

  private val P = 2147483647L   // 2^31 - 1 (Mersenne prime)
  private val MIX = 2654435761L // Knuth multiplicative constant

  /** Token 3-gram shingles of a document (whole doc if < 3 tokens). */
  def shingles(text: Column): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** 64-permutation MinHash signature from a shingle array.
    * perm_i(h) = (a_i * (h mod P) + b_i) mod P over the 31-bit Mersenne
    * field: reducing h first keeps every product below 2^38, so the
    * arithmetic is exact under ANSI mode (no long overflow). */
  def minhashSignature(shingleHashes: Column): Column =
    transform(sequence(lit(0), lit(63)), i =>
      array_min(transform(shingleHashes,
        h => pmod(pmod(h, lit(P)) * (i * 2 + 1) + i * MIX, lit(P)))))

  /** Documents with their distinct shingle hashes and MinHash signature. */
  private def signed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("sh", array_distinct(transform(shingles($"text"), s => xxhash64(s))))
      .withColumn("sig", minhashSignature($"sh"))
  }

  /** MinHash + LSH near-dup pairs: 16 bands × 4 rows. Candidates collide
    * in ≥1 band; each candidate pair is then verified with exact Jaccard
    * over the shingle sets. Shuffle is on (band_idx, band_hash). */
  def minhashLsh(spark: SparkSession, sfDir: String,
                 threshold: Double = 0.2): DataFrame = {
    import spark.implicits._
    val docs = signed(spark, sfDir)
    val bands = docs.select($"doc_id", $"sh",
        explode(transform(sequence(lit(0), lit(15)), b =>
          struct(b.as("band_idx"),
                 xxhash64(slice($"sig", b * 4 + 1, lit(4))).as("band_hash")))).as("b"))
      .select($"doc_id", $"sh", $"b.band_idx", $"b.band_hash")
    val a = bands.select($"band_idx", $"band_hash",
                         $"doc_id".as("doc_a"), $"sh".as("sh_a"))
    val b = bands.select($"band_idx", $"band_hash",
                         $"doc_id".as("doc_b"), $"sh".as("sh_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b", $"sh_a", $"sh_b").distinct()
      .withColumn("jaccard", round(
        size(array_intersect($"sh_a", $"sh_b")) /
        size(array_union($"sh_a", $"sh_b")), 4))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"jaccard")
  }

  /** 64-bit SimHash: per bit j, sum +1/-1 over token hashes by bit j,
    * take the sign. Narrow map, zero shuffle; output groups docs by
    * 16-bit prefix band for hamming-bucket candidate generation. */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tokHashes = transform(split(trim(lower($"text")), "\\s+"), t => xxhash64(t))
    val bits = transform(sequence(lit(0), lit(63)), j =>
      when(aggregate($"th", lit(0L),
        (acc, h) => acc + when(call_function("shiftright", h, j.cast("int"))
                                 .bitwiseAND(lit(1L)) === 1L, 1L)
                           .otherwise(-1L)) > 0, 1L).otherwise(0L))
    Tables.documents(spark, sfDir)
      .withColumn("th", tokHashes)
      .withColumn("bits", bits)
      .withColumn("simhash64",
        aggregate(sequence(lit(0), lit(63)), lit(0L),
          (acc, j) => acc.bitwiseOR(call_function("shiftleft",
            element_at($"bits", j.cast("int") + 1), j.cast("int")))))
      .withColumn("band16", shiftrightunsigned($"simhash64", 48))
      .select($"doc_id", $"simhash64", $"band16")
  }

  /** Exact n-gram Jaccard similarity via distributed shingle inverted
    * index: explode distinct shingles, self-join on shingle, count
    * intersections, derive |A∪B| = |A|+|B|-|A∩B|. O(postings²) per
    * shingle, never O(docs²). */
  def ngramJaccard(spark: SparkSession, sfDir: String,
                   threshold: Double = 0.2): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .withColumn("sh", array_distinct(shingles($"text")))
      .withColumn("n_sh", size($"sh").cast("long"))
    val posting = docs.select($"doc_id", $"n_sh", explode($"sh").as("shingle"))
    val a = posting.select($"shingle", $"doc_id".as("doc_a"), $"n_sh".as("na"))
    val b = posting.select($"shingle", $"doc_id".as("doc_b"), $"n_sh".as("nb"))
    a.join(b, "shingle").filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b", $"na", $"nb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", round($"inter" / ($"na" + $"nb" - $"inter"), 4))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"inter", $"jaccard")
  }
}
