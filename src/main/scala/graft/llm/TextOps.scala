package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for large-scale training-data pipelines
  * (SURVEY.md §2.3): exact dedup, fingerprinting, token statistics,
  * quality scoring, and language ID.
  *
  * Everything is built from native `functions._` (codegen'd or native
  * higher-order expressions) — no UDFs — so the operators stay inside
  * whole-stage codegen and distribute trivially: each is a narrow map
  * followed by one hash aggregate.
  */
object TextOps {

  /** Whitespace tokenization shared by all operators. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  private val stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Exact deduplication: hash-groupBy on md5(text), keep the smallest
    * doc_id as canonical. One shuffle on the hash; at 100 TB the md5
    * spreads keys uniformly so no skew. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .groupBy(md5($"text").as("text_hash"))
      .agg(min($"doc_id").as("keep_doc_id"),
           count(lit(1)).as("n_copies"))
  }

  /** End-to-end curation FUNNEL report (r11) — the attrition table every
    * corpus-curation run publishes ("we started with N docs; exact dedup
    * cut X, near-dedup Y, quality Z, language filtering W"): four
    * sequential keep-verdicts from ALREADY-PROVEN stages — exact
    * ([[dedupExact]] min-id canonical), near-dup ([[Dedup.dedupApply]]
    * component-canonical), Gopher quality ([[gopherColumns]]), language
    * match ([[langId]] prediction vs label) — joined into one per-doc
    * verdict frame, then ONE hash aggregate of conditional counts
    * (each stage's drop counted among the previous stages' survivors)
    * unpivoted to the 4-stage funnel. The report costs the verdict
    * subtrees plus a single agg; nothing new shuffles. */
  def curationFunnel(spark: SparkSession, sfDir: String,
                     threshold: Double = 0.2): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text", $"lang")
    val exactKeep = docs.groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("doc_id"))
      .select($"doc_id", lit(1L).as("ex"))
    val near = Dedup.dedupApply(spark, sfDir, threshold)
      .select($"doc_id", $"keep".as("near_keep"))
    val gq = gopherColumns(docs).select($"doc_id", ($"keep" === 1).as("gq_keep"))
    val li = langId(spark, sfDir).select($"doc_id", $"pred_lang")
    val v = docs.select($"doc_id", $"lang")
      .join(exactKeep, Seq("doc_id"), "left")
      .join(near, "doc_id")
      .join(gq, "doc_id")
      .join(li, "doc_id")
      .select($"ex".isNotNull.as("s1"), $"near_keep".as("s2"),
              $"gq_keep".as("s3"), ($"pred_lang" === $"lang").as("s4"))
    v.agg(
        count(lit(1)).as("n"),
        sum(when(!$"s1", 1L).otherwise(0L)).as("d1"),
        sum(when($"s1" && !$"s2", 1L).otherwise(0L)).as("d2"),
        sum(when($"s1" && $"s2" && !$"s3", 1L).otherwise(0L)).as("d3"),
        sum(when($"s1" && $"s2" && $"s3" && !$"s4", 1L).otherwise(0L)).as("d4"))
      .selectExpr(
        """stack(4,
          |'1_exact_dedup', n, d1,
          |'2_near_dedup', n - d1, d2,
          |'3_gopher_quality', n - d1 - d2, d3,
          |'4_langid_match', n - d1 - d2 - d3, d4)
          |AS (stage, docs_in, dropped)""".stripMargin)
      .withColumn("docs_out", $"docs_in" - $"dropped")
  }

  /** Normalized document fingerprint (lower + whitespace collapse + md5)
    * and per-language duplicate-cluster stats. */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("fp", md5(lower(trim(regexp_replace($"text", "\\s+", " ")))))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct($"fp").as("n_distinct_fp"))
  }

  /** Token counting per source: whitespace tokens + a chars/4 BPE-style
    * estimate (the standard ~4-chars-per-token heuristic). */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"source",
              size(tokens($"text")).cast("long").as("n_tokens"),
              ceil(length($"text") / lit(4.0)).as("n_tokens_bpe"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_tokens").as("sum_tokens"),
           sum($"n_tokens_bpe").as("sum_tokens_bpe"),
           max($"n_tokens").as("max_tokens"))
  }

  /** Deterministic hash-based TRAIN/VAL/TEST split with a per-source
    * stratification report — the assignment every training pipeline
    * needs to be a pure function of the STABLE document id (never of
    * row order, partitioning, or arrival time): md5(doc_id), first hex
    * byte against thresholds 0xcd/0xe6 ≈ 80/10/10. Reruns, backfills,
    * and other engines (the DuckDB twin uses the same md5) route every
    * doc identically, so val/test can never leak into train across
    * pipeline versions. The report is one narrow map (hash + token
    * count per row) into a map-side-combined hash agg; `share_bp` is
    * integer basis points over a partitioned window on the ≤3-rows-
    * per-source aggregate — nothing windows the corpus itself. */
  def trainSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bucket = substring(md5($"doc_id".cast("string")), 1, 2)
    Tables.documents(spark, sfDir)
      .withColumn("split",
        when(bucket < lit("cd"), "train")
          .when(bucket < lit("e6"), "val")
          .otherwise("test"))
      .groupBy($"source", $"split")
      .agg(count(lit(1)).as("n_docs"),
           sum(size(tokens($"text")).cast("long")).as("sum_tokens"))
      .withColumn("total_docs", sum($"n_docs").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"source")))
      .withColumn("share_bp", expr("(n_docs * 10000) div total_docs"))
      .drop("total_docs")
  }

  /** Deterministic TOKEN-BUDGET selection per source (r12) — "give me
    * N training tokens from each source, stably": docs rank by
    * md5(doc_id) (the same consistent-hash coin [[trainSplit]] and
    * [[balancedSample]] flip), and a doc is kept iff its running total
    * STARTS under the per-source budget — so the one straddling doc
    * crosses the line (budget-exact truncation is the tokenizer's job
    * downstream; selection must stay a pure function of the stable id
    * so backfills and other engines re-pick identical docs). Report
    * per source: docs/tokens kept vs available, kept share in exact
    * integer basis points.
    *
    * Scale shape: one narrow map (hash + token count — the full text
    * never moves), one KEYED window cumsum (source shards select
    * independently at 100 TB; no global prefix scan), one map-side-
    * combined aggregate over ≤|sources| groups. */
  def tokenBudget(spark: SparkSession, sfDir: String,
                  budget: Long = 800L): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"source")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    Tables.documents(spark, sfDir)
      .select($"source", $"doc_id",
              size(tokens($"text")).cast("long").as("n_tok"))
      .withColumn("cum_end", sum($"n_tok").over(w))
      .withColumn("keep", $"cum_end" - $"n_tok" < budget)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_tok").as("tokens_total"),
           sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
           sum(when($"keep", $"n_tok").otherwise(0L)).as("tokens_kept"))
      .withColumn("kept_bp", expr("tokens_kept * 10000 div tokens_total"))
  }

  /** Per-document quality metrics: length, token count, mean token
    * length, stopword ratio — the length/punct/stopword heuristics used
    * to filter web-scale corpora. */
  def quality(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = tokens($"text")
    val stopArr = array(stopwords.map(lit): _*)
    Tables.documents(spark, sfDir)
      .withColumn("n_chars_txt", length($"text").cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_stopwords",
        size(filter(toks, t => array_contains(stopArr, t))).cast("long"))
      .withColumn("stop_ratio", round($"n_stopwords" / $"n_tokens", 4))
      .withColumn("mean_token_len",
        round(length(regexp_replace(trim($"text"), "\\s+", "")) / $"n_tokens", 4))
      .select($"doc_id", $"n_chars_txt", $"n_tokens", $"n_stopwords",
              $"stop_ratio", $"mean_token_len")
  }

  /** Corpus-wide top-20 token bigrams — the heavy-hitter n-gram count
    * behind vocabulary/contamination analysis. Explode is narrow; the
    * count is one partial-aggregated shuffle; top-k is
    * TakeOrderedAndProject (no global sort). */
  def ngramFreq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir)
      .select($"text")
      .as[String])
      .mapPartitions { docs =>
        docs.flatMap { text =>
          val t = text.trim.toLowerCase.split("\\s+")
          if (t.length < 2) Iterator.empty
          else Iterator.range(0, t.length - 1).map(i => s"${t(i)} ${t(i + 1)}")
        }
      }
      .toDF("ngram")
      .groupBy($"ngram")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"ngram".asc)
      .limit(20)
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03): Rabin-Karp rolling hash over character k-grams, keep
    * the minimum hash of each sliding window — the standard local
    * plagiarism/near-dup fingerprint. Tight per-row loop → typed
    * mapPartitions; no shuffle. */
  def winnowFingerprints(spark: SparkSession, sfDir: String,
                         k: Int = 8, window: Int = 4): DataFrame = {
    import spark.implicits._
    val B = 1000003L
    val M = 2147483647L
    Tables.spread(Tables.documents(spark, sfDir)
      .select($"doc_id", $"text")
      .as[(Long, String)])
      .mapPartitions { rows =>
        rows.map { case (docId, text) =>
          val s = text.trim.toLowerCase
          val n = math.max(0, s.length - k + 1)
          val hashes = new Array[Long](n)
          if (n > 0) {
            // rolling hash: h_i = h_{i-1}*B - s(i-1)*B^k + s(i+k-1) (mod M)
            var bk = 1L
            var i = 0
            while (i < k) { bk = bk * B % M; i += 1 }
            var h = 0L
            i = 0
            while (i < k) { h = (h * B + s.charAt(i)) % M; i += 1 }
            hashes(0) = h
            i = 1
            while (i < n) {
              h = java.lang.Math.floorMod(
                h * B - s.charAt(i - 1) * bk + s.charAt(i + k - 1), M)
              hashes(i) = h
              i += 1
            }
          }
          // winnow: min hash per window (rightmost min), dedup adjacents
          val fps = scala.collection.mutable.LinkedHashSet.empty[Long]
          var w0 = 0
          while (w0 + window <= hashes.length) {
            var mn = Long.MaxValue
            var j = w0
            while (j < w0 + window) { if (hashes(j) <= mn) mn = hashes(j); j += 1 }
            fps += mn
            w0 += 1
          }
          (docId, fps.size.toLong,
           if (fps.isEmpty) 0L else fps.min, if (fps.isEmpty) 0L else fps.max)
        }
      }
      .toDF("doc_id", "n_fingerprints", "min_fp", "max_fp")
  }

  /** Benchmark-contamination check: fraction of each training doc's
    * distinct 3-gram shingles that appear anywhere in a held-out
    * "benchmark" slice (doc_id % 50 == 0 stands in for the eval set).
    * The shape every training pipeline runs before release. Shingle
    * hashes ride the shuffle (8 bytes, not strings); the benchmark side
    * is a distinct-shingle set, so the join counts each training shingle
    * at most once. */
  def contamination(spark: SparkSession, sfDir: String,
                    modulus: Long = 50): DataFrame = {
    import spark.implicits._
    val sigs = Dedup.shingles(spark, sfDir).toDF().select($"doc_id", $"sh")
    val bench = sigs.filter($"doc_id" % modulus === 0)
      .select(explode($"sh").as("shingle")).distinct()
    val train = sigs.filter($"doc_id" % modulus =!= 0)
    val hits = train.select($"doc_id", explode($"sh").as("shingle"))
      .join(bench, "shingle")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_hit"))
    train.select($"doc_id", size($"sh").cast("long").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_contaminated", coalesce($"n_hit", lit(0L)))
      .select($"doc_id", $"n_shingles", $"n_contaminated",
              round($"n_contaminated" / $"n_shingles", 4).as("contamination"))
  }

  /** The ACTION step of benchmark decontamination (r17) — what
    * [[contamination]]'s signal is FOR (the [[graft.llm.Dedup
    * .spanApply]] discipline): keep a training document iff at most
    * `maxContamination` of its shingles collide with the benchmark
    * set — the GPT-3/Lee et al. decontam rule production pipelines cut
    * at a few percent. Output mirrors the apply family (per-doc
    * verdict; downstream ships `filter($"keep")`); the decision is a
    * projection over the contamination aggregate, no new shuffle. */
  def decontamApply(spark: SparkSession, sfDir: String,
                    maxContamination: Double = 0.05): DataFrame = {
    import spark.implicits._
    contamination(spark, sfDir)
      .select($"doc_id", $"n_shingles", $"n_contaminated", $"contamination",
        ($"contamination" <= maxContamination).as("keep"))
  }

  /** Deterministic class-balanced sampling: keep at most `perGroup` docs
    * per language, chosen by md5(doc_id) order — the consistent-hash
    * "data mixing" step that rebalances source/language proportions in a
    * training corpus. Same sample regardless of partitioning or history;
    * one shuffle on the group key. */
  def balancedSample(spark: SparkSession, sfDir: String,
                     perGroup: Int = 50): DataFrame = {
    import spark.implicits._
    val byHash = Window.partitionBy($"lang")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang")
      .withColumn("rk", row_number().over(byHash).cast("long"))
      .filter($"rk" <= perGroup)
  }

  private val langLexicons: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "una"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"))

  /** Stopword-profile language ID: score each language lexicon by token
    * hits, pick the argmax (ties broken by language code, descending via
    * struct ordering). A narrow map — no shuffle at all. */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = tokens(lower($"text"))
    val scored = langLexicons.toSeq.sortBy(_._1).map { case (langCode, lex) =>
      val lexArr = array(lex.map(lit): _*)
      struct(size(filter(toks, t => array_contains(lexArr, t))).as("score"),
             lit(langCode).as("lang_code"))
    }
    Tables.documents(spark, sfDir)
      .withColumn("best", array_max(array(scored: _*)))
      .select($"doc_id", $"best.lang_code".as("pred_lang"),
              $"best.score".cast("long").as("score"))
  }

  /** Gopher-style per-document quality filter (Rae et al. 2021 §A.1
    * rules, the standard pretraining heuristics): word count bounds,
    * mean-word-length window, minimum alphabetic-word fraction, minimum
    * distinct-stopword hits. Pure narrow column ops — no shuffle at all;
    * at 100 TB this is a free map over the corpus scan. */
  /** Column-level Gopher scoring over ANY frame with a `text` column —
    * shared by the batch query and
    * [[graft.streaming.StreamingQualityGate]], so the streaming gate
    * applies the IDENTICAL batch-proven rules (r8). Narrow map, safe in
    * both planes. */
  def gopherColumns(df: DataFrame): DataFrame = {
    val toks = tokens(lower(col("text")))
    val stopArr = array(stopwords.map(lit): _*)
    df
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("n_alpha_words",
        size(filter(toks, t => t.rlike("[a-z]"))).cast("long"))
      .withColumn("n_stop_distinct",
        size(array_intersect(array_distinct(toks), stopArr)).cast("long"))
      .withColumn("mean_word_len",
        round(length(regexp_replace(trim(col("text")), "\\s+", "")) / col("n_words"), 4))
      .withColumn("alpha_frac", round(col("n_alpha_words") / col("n_words"), 4))
      .withColumn("keep",
        ((col("n_words") >= 5) && (col("n_words") <= 100000) &&
         (col("mean_word_len") >= 3) && (col("mean_word_len") <= 10) &&
         (col("alpha_frac") >= 0.8) && (col("n_stop_distinct") >= 2)).cast("long"))
  }

  def gopherQuality(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    gopherColumns(Tables.documents(spark, sfDir))
      .select($"doc_id", $"n_words", $"n_alpha_words", $"n_stop_distinct",
              $"mean_word_len", $"alpha_frac", $"keep")
  }

  /** Repetition ratio (the other Gopher-family filter): fraction of a
    * document's word 2-grams that are duplicates — high values flag
    * boilerplate/spam/degenerate generations. Narrow map with array
    * ops, no shuffle. */
  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("t", tokens(lower($"text")))
      .withColumn("grams", expr(
        """CASE WHEN size(t) >= 2
          |THEN transform(sequence(0, size(t)-2),
          |               i -> concat(element_at(t, i+1), ' ', element_at(t, i+2)))
          |ELSE array() END""".stripMargin))
      .select($"doc_id",
        size($"grams").cast("long").as("n_2grams"),
        size(array_distinct($"grams")).cast("long").as("n_distinct"))
      .withColumn("rep_frac",
        when($"n_2grams" === 0, 0.0)
          .otherwise(round(($"n_2grams" - $"n_distinct") / $"n_2grams", 4)))
  }

  /** PII scrubbing — the redaction pass every training pipeline runs
    * before tokenization: emails, international-ish phone numbers and
    * IPv4 addresses replaced with typed placeholder tokens. Pure
    * regexp_replace chain: narrow, codegen'd, zero shuffle. The oracle
    * over the (PII-free) corpus doubles as a false-positive check —
    * every count must be zero and every text unchanged. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+?[0-9][0-9 ()-]{7,}[0-9]"
  val ipv4Re  = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  def piiScrubStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        size(regexp_extract_all($"text", lit(emailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all($"text", lit(ipv4Re), lit(0))).cast("long").as("n_ips"),
        size(regexp_extract_all($"text", lit(phoneRe), lit(0))).cast("long").as("n_phones"),
        md5(piiScrub($"text")).as("clean_hash"))
  }

  /** Temperature-based data-mixing weights (the multinomial sampling
    * exponent from multilingual pretraining, α = 0.5): per language,
    * raw sampling weight √(share of corpus tokens). sqrt is IEEE
    * correctly-rounded — bit-identical in every engine — which is why
    * α is 0.5 and not an arbitrary pow() exponent. One tiny agg; the
    * token totals come from a map-side-combined sum over the scan. */
  def mixWeights(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perLang = Tables.documents(spark, sfDir)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
           sum(size(tokens($"text")).cast("long")).as("n_tokens"))
    // total via an unpartitioned window over the AGGREGATED rows (one
    // row per language) — no second scan of the corpus, no driver
    // collect; the single-partition window holds #languages rows only.
    // Long sum is exact, so merge order can't perturb the total.
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    perLang
      .withColumn("total_tokens", sum($"n_tokens").over(all))
      .withColumn("token_share",
        round($"n_tokens" / $"total_tokens".cast("double"), 6))
      .withColumn("weight",
        round(sqrt($"n_tokens".cast("double")) / sqrt($"total_tokens".cast("double")), 6))
      .drop("total_tokens")
  }

  /** Overlapping fixed-window chunking: split each document into
    * `size`-char chunks every `stride` chars (stride < size ⇒ adjacent
    * chunks overlap — the training-example windowing every LLM data
    * pipeline runs before tokenization). sequence + posexplode is a
    * narrow per-row expansion: no shuffle, no UDF, and the expansion
    * factor is len/stride, bounded per row. */
  def chunking(spark: SparkSession, sfDir: String,
               size: Int = 120, stride: Int = 80): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .filter(length($"text") > 0)
      .select($"doc_id", $"text",
              posexplode(sequence(lit(0), length($"text") - 1, lit(stride)))
                .as(Seq("chunk_idx", "start")))
      .withColumn("chunk_text", expr(s"substring(text, start + 1, $size)"))
      .select($"doc_id", $"chunk_idx".cast("long").as("chunk_idx"),
              $"start".cast("long").as("chunk_start"),
              length($"chunk_text").cast("long").as("chunk_len"),
              $"chunk_text")
  }

  /** Document frequency of terms (the IDF building block): how many
    * DISTINCT documents contain each term. array_distinct before the
    * explode keeps the shuffle at one row per (doc, term) instead of one
    * per occurrence; df_frac = df/N is a single exact double division. */
  def docFreq(spark: SparkSession, sfDir: String, topN: Int = 30): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val terms = docs
      .select($"doc_id",
              explode(array_distinct(split(trim(lower($"text")), "\\s+"))).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("df"))
    val totals = docs.agg(count(lit(1)).as("n_docs"))
    terms.crossJoin(broadcast(totals))
      .withColumn("df_frac", $"df".cast("double") / $"n_docs")
      .orderBy($"df".desc, $"term".asc)
      .limit(topN)
  }

  /** CCNet-style fluency filter (Wenzek et al., LREC 2020 shape): rank
    * documents by how SURPRISING their tokens are under the corpus's
    * own unigram distribution — the cheap stand-in for the KenLM
    * perplexity ranking used to split web text into head/middle/tail.
    * Instead of float log-probabilities (whose summation order and libm
    * rounding differ across engines), per-token surprisal is the EXACT
    * integer `bits(total_tokens) − bits(count(token))` (bits = length
    * of the binary representation, the same exact-log2 trick as
    * [[graft.telemetry.Telemetry.expHistogram]]) — rare tokens score
    * high, stopwords near zero, and sums/means are bit-exact in any
    * engine. Shuffles: one term-count aggregate, one term join (key
    * reused from the aggregate), one doc rollup — no windows, no
    * collects; vocab and corpus size only enter as broadcast scalars.
    * (A (doc, term, tf) pre-aggregation that collapses repeated tokens
    * before the join was measured 2× SLOWER at sf0.1 — the extra
    * shuffle outweighs the occurrence collapse on web-length docs; it
    * only pays when documents carry very high per-doc repetition.) */
  def unigramSurprisal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id",
              explode(split(trim(lower($"text")), "\\s+")).as("term"))
    val counts = toks.groupBy($"term").agg(count(lit(1)).as("cnt"))
    val total = toks.agg(count(lit(1)).as("total"))
    toks.join(counts, "term")
      .crossJoin(broadcast(total))
      .withColumn("surprisal",
        (length(bin($"total")) - length(bin($"cnt"))).cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
           sum($"surprisal").as("sum_surprisal"))
      .withColumn("mean_surprisal",
        $"sum_surprisal".cast("double") / $"n_tokens")
  }

  /** CCNet's head/middle/tail split completed: per language, rank
    * documents by [[unigramSurprisal]] and cut into fluency TERCILES —
    * head = most-predictable third (keep for pretraining), tail = most
    * surprising (noise/garble candidates). ntile over an exact-double
    * ordering (mean surprisal is an exact integer ratio, so ranks are
    * engine-independent; doc_id breaks ties) in a per-language window;
    * bucket rollups aggregate INTEGER sums and divide once, keeping the
    * pooled mean bit-exact. Languages partition the window, so strata
    * rank in parallel — no global sort. */
  def surprisalBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val scored = unigramSurprisal(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select($"doc_id", $"lang"), "doc_id")
    val byLang = Window.partitionBy($"lang")
      .orderBy($"mean_surprisal", $"doc_id")
    scored
      .withColumn("tercile", ntile(3).over(byLang))
      .withColumn("bucket",
        when($"tercile" === 1, "head")
          .when($"tercile" === 2, "middle").otherwise("tail"))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_tokens").as("sum_tokens"),
           sum($"sum_surprisal").as("sum_surprisal"))
      .withColumn("pooled_mean_surprisal",
        $"sum_surprisal".cast("double") / $"sum_tokens")
  }

  /** Weighted SYSTEMATIC sample, stratified by language: within each
    * stratum, documents are laid along a deterministic line of cumulative
    * weight (here n_chars — i.e. sample ∝ content volume, the data-mixing
    * primitive for byte-budget corpus construction) and one document is
    * taken every `stride = total/target` weight units — a document is
    * selected iff its weight interval crosses a stride boundary, so
    * inclusion probability ∝ weight with zero randomness. All integer
    * math (running sums + integer division): exactly reproducible in any
    * engine, no float keys, no RNG parity issues.
    *
    * Scale: the running sum is a window per LANGUAGE stratum, so strata
    * sample in parallel and nothing is single-partition; an unstratified
    * global variant would use the distributed prefix-scan pattern from
    * [[graft.telemetry.Telemetry.concurrency]]. */
  def weightedSample(spark: SparkSession, sfDir: String,
                     perStratum: Int = 50): DataFrame = {
    import spark.implicits._
    val byLang = Window.partitionBy($"lang")
    val line = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"n_chars")
      .withColumn("cum", sum($"n_chars").over(line))
      .withColumn("stride",
        greatest(lit(1L), expr(s"sum(n_chars) OVER (PARTITION BY lang) div $perStratum")))
      // crosses a boundary ⇔ floor(cum/stride) advanced over this doc's
      // weight interval (prev = cum - n_chars ≥ 0, so truncating and
      // flooring division agree in every engine)
      .filter(expr("cum div stride") > expr("(cum - n_chars) div stride"))
      .select($"lang", $"doc_id", $"n_chars", $"cum")
  }

  /** Language-ID evaluation: confusion matrix of [[langId]]'s
    * stopword-profile predictions against the corpus's labeled `lang`
    * column, with per-cell fractions — the quality-measurement loop a
    * production filter pipeline runs before trusting a classifier on
    * 100 TB. Joins on doc_id (the prediction side is already reduced
    * to one row per doc); the matrix is #langs² rows. */
  def langIdEval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val truth = Tables.documents(spark, sfDir).select($"doc_id", $"lang")
    langId(spark, sfDir).join(truth, "doc_id")
      .groupBy($"lang".as("true_lang"), $"pred_lang")
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum($"n").over(Window.partitionBy($"true_lang")))
      .withColumn("frac", $"n".cast("double") / $"row_total".cast("double"))
  }

  /** Vocabulary-growth curve (Heaps' law): cumulative distinct terms vs
    * cumulative tokens as the corpus is consumed in doc_id order — the
    * diversity diagnostic that says whether more data still buys new
    * vocabulary. Per doc: tokens contributed and NEW terms introduced
    * (terms whose first-holding doc this is — the [[ngramNovelty]]
    * min-agg at term level); running sums are windows over #docs/stride
    * bucket rollup rows, reported every `stride` docs. */
  def vocabGrowth(spark: SparkSession, sfDir: String,
                  stride: Long = 50L): DataFrame = {
    import spark.implicits._
    val terms = Tables.documents(spark, sfDir)
      .select($"doc_id",
              explode(split(trim(lower($"text")), "\\s+")).as("term"))
    val perDocTokens = terms.groupBy($"doc_id").agg(count(lit(1)).as("toks"))
    val firstHolder = terms.select($"doc_id", $"term").distinct()
      .groupBy($"term").agg(min($"doc_id").as("doc_id"))
      .groupBy($"doc_id").agg(count(lit(1)).as("new_terms"))
    // Only stride-boundary docs are reported, and a boundary doc is by
    // construction the max id of its stride bucket — so per-doc rows
    // pre-aggregate to one row per bucket BEFORE the cumulative window
    // (stride× fewer rows through the single-partition running sum;
    // the curve itself is inherently a global prefix sum).
    val bucketed = perDocTokens.join(firstHolder, Seq("doc_id"), "left")
      .withColumn("new_terms", coalesce($"new_terms", lit(0L)))
      .groupBy(expr(s"doc_id div $stride").as("bkt"))
      .agg(sum($"toks").as("toks"), sum($"new_terms").as("new_terms"),
           max($"doc_id").as("last_id"))
    val line = Window.orderBy($"bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("cum_tokens", sum($"toks").over(line))
      .withColumn("cum_vocab", sum($"new_terms").over(line))
      .filter(($"last_id" + 1) % stride === 0)
      .select($"last_id".as("doc_id"), $"cum_tokens", $"cum_vocab")
  }

  /** TF-IDF top terms per document (the classic retrieval/keyword
    * score, built on [[docFreq]]'s df machinery).
    *
    * tf = term count / doc length (exact int/int division), idf =
    * ln(N/df) ROUNDED to 4 decimals before the product — libm natural
    * logs agree across engines to ~1 ulp, and the 1e-4 grid is twelve
    * orders of magnitude coarser, so the rounded idf (and hence the
    * 6-decimal score) is engine-stable. Scale shape: one explode +
    * two hash aggs sharing the term key; the df side is tiny
    * (vocabulary) and broadcasts into the per-doc score join; the
    * per-doc top-k window partitions by doc_id. */
  def tfidf(spark: SparkSession, sfDir: String, topK: Int = 5,
            maxDocs: Int = 20): DataFrame = {
    import spark.implicits._
    val terms = Tables.documents(spark, sfDir)
      .select($"doc_id",
              explode(split(trim(lower($"text")), "\\s+")).as("term"))
    val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("cnt"))
      .withColumn("doc_len", sum($"cnt").over(Window.partitionBy($"doc_id")))
    // N rides the broadcast vocabulary table as a 1-row crossJoin —
    // building the query triggers no driver-side action
    val nDocsDf = Tables.documents(spark, sfDir)
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val df = terms.select($"doc_id", $"term").distinct()
      .groupBy($"term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocsDf))
    val scored = tf.join(broadcast(df), "term")
      .filter($"doc_id" < maxDocs)
      .withColumn("idf4", round(log($"n_docs" / $"df"), 4))
      .withColumn("score",
        round(($"cnt".cast("double") / $"doc_len".cast("double")) * $"idf4", 6))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"score".desc, $"term".asc))
        .cast("long"))
      .filter($"rnk" <= topK)
      .select($"doc_id", $"term", $"cnt", $"df", $"score", $"rnk")
  }

  /** Chunk-level cross-document duplication (RefinedWeb/C4 line-dedup
    * shape, on fixed 80-char chunks): a chunk digest seen in more than
    * one document marks boilerplate; each doc reports the fraction of
    * its chunks that are shared.
    *
    * The shuffle key is the 16-byte md5, never chunk text; the
    * dup-chunk set is bounded by DISTINCT duplicated digests. Exact
    * int/int fraction. At 100 TB this is the standard pre-training
    * boilerplate-strip pass — one explode, one digest agg, one
    * co-partitioned join back. */
  def lineDedup(spark: SparkSession, sfDir: String,
                chunkChars: Int = 80): DataFrame = {
    import spark.implicits._
    val chunks = Tables.documents(spark, sfDir)
      .filter(length($"text") > 0)
      .select($"doc_id",
              explode(expr(
                s"transform(sequence(0, CAST((length(text)-1) div $chunkChars AS INT)), " +
                s"i -> md5(substring(text, i*$chunkChars + 1, $chunkChars)))"))
                .as("chunk_md5"))
    val dupDigests = chunks.groupBy($"chunk_md5")
      .agg(countDistinct($"doc_id").as("nd"))
      .filter($"nd" > 1)
      .select($"chunk_md5")
    chunks
      .join(dupDigests.withColumn("is_dup", lit(1L)), Seq("chunk_md5"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
           sum(coalesce($"is_dup", lit(0L))).as("n_dup_chunks"))
      .withColumn("dup_frac",
        $"n_dup_chunks".cast("double") / $"n_chunks".cast("double"))
  }

  /** N-gram novelty scoring: for each document, the fraction of its
    * distinct 3-gram shingles that NO earlier document (smaller
    * doc_id) contains — the data-curation signal for "how much new
    * content does this doc add to the corpus prefix" (dedup's softer
    * cousin: streaming corpora drop docs whose novelty falls below a
    * floor).
    *
    * One shingle explode (the corpus pass), one min-aggregate per
    * shingle (its FIRST holder), one co-partitioned join back: a
    * shingle is novel for exactly its first holder. All-integer
    * fraction. */
  def ngramNovelty(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sh = Dedup.shingles(spark, sfDir).toDF()
      .select($"doc_id", explode($"sh").as("shingle"))
    val firstHolder = sh.groupBy($"shingle")
      .agg(min($"doc_id").as("first_doc"))
    sh.join(firstHolder, "shingle")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
           sum(when($"doc_id" === $"first_doc", 1L).otherwise(0L))
             .as("n_novel"))
      .withColumn("novelty",
        $"n_novel".cast("double") / $"n_shingles".cast("double"))
  }

  /** One BPE merge round, corpus-wide: frequency of every adjacent
    * character pair inside words, weighted by word frequency — the
    * counting step a distributed BPE tokenizer trainer repeats per
    * merge.
    *
    * Two-level reduction keeps the explode off the raw corpus: words
    * aggregate to (word, freq) first — the vocabulary is tiny next to
    * the token stream — and only DISTINCT words explode into their
    * len−1 pairs, each carrying its frequency. At 100 TB the pair
    * explosion is proportional to vocabulary size, not corpus size;
    * the only full-data shuffle is the word-count hash agg (map-side
    * combined). Top pairs ranked with a deterministic tie-break. */
  def bpePairs(spark: SparkSession, sfDir: String, topN: Int = 25): DataFrame = {
    import spark.implicits._
    val words = Tables.documents(spark, sfDir)
      .select(explode(split(trim(lower($"text")), "\\s+")).as("word"))
      .filter(length($"word") >= 2)
      .groupBy($"word").agg(count(lit(1)).as("freq"))
    val pairs = words
      .select($"freq",
              explode(expr("transform(sequence(1, length(word) - 1), " +
                           "i -> substring(word, i, 2))")).as("pair"))
      .groupBy($"pair").agg(sum($"freq").as("n"))
    val ranked = Window.orderBy($"n".desc, $"pair".asc)
    pairs.withColumn("rnk", row_number().over(ranked).cast("long"))
      .filter($"rnk" <= topN)
  }

  /** Character-class ENTROPY quality signal (r8): per document, the
    * Shannon entropy of the {lower, upper, digit, space, other}
    * character distribution. Machine-generated or template spam
    * collapses to 1-2 classes (low entropy); healthy prose sits near
    * the corpus mode — the cheap single-pass complement to
    * [[repetition]]'s n-gram signal, used as a pre-filter before the
    * expensive dedup stages. Narrow map (5 regex counts per row, no
    * shuffle until the final per-language rollup); entropy is
    * round(·, 4)-stabilized like [[tfidf]]'s idf so cross-engine libm
    * drift can't flip the hash. */
  def charEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def cnt(re: String): Column =
      length(regexp_replace($"text", re, "")).cast("long")
    val d = Tables.documents(spark, sfDir)
      .filter(length($"text") > 0)
      .withColumn("n", length($"text").cast("long"))
      .withColumn("c_lower", $"n" - cnt("[a-z]"))
      .withColumn("c_upper", $"n" - cnt("[A-Z]"))
      .withColumn("c_digit", $"n" - cnt("[0-9]"))
      .withColumn("c_space", $"n" - cnt("\\s"))
      .withColumn("c_other",
        $"n" - $"c_lower" - $"c_upper" - $"c_digit" - $"c_space")
    def term(c: Column): Column =
      when(c > 0, -(c / $"n") * log2(c / $"n")).otherwise(lit(0.0))
    // per-doc entropy quantized to integer 1e-4 units: every aggregate
    // below is EXACT integer math (no order-dependent float sums), and
    // only the per-doc log2 carries the rounded-once libm value
    d.withColumn("e4", round(lit(10000.0) * (
        term($"c_lower") + term($"c_upper") + term($"c_digit") +
        term($"c_space") + term($"c_other")), 0).cast("long"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
           sum($"e4").as("sum_e4"),
           (min($"e4") / 10000.0).as("min_entropy"),
           (max($"e4") / 10000.0).as("max_entropy"),
           sum(when($"e4" < 10000L, 1L).otherwise(0L)).as("n_low_entropy"))
      .withColumn("avg_entropy",
        round($"sum_e4" / (lit(10000.0) * $"n_docs"), 4))
      .drop("sum_e4")
  }

  /** BM25 per-document scores for a fixed query term set (Robertson/
    * Sparck Jones Okapi weighting, the lexical half of every modern
    * retrieval stack). Returns ONE row per document that matches at
    * least one query term.
    *
    * Engine-stability: ln is the only libm call and is rounded to 4
    * decimals before use (same trick as [[tfidf]]); each per-term
    * contribution is then quantized to integer MICRO-units
    * (`round(x*1e6)` as long) so the per-document sum is an integer
    * aggregate — bit-exact in any engine regardless of summation
    * order. The float work before quantization (tf saturation,
    * length normalization) is pure IEEE-double `*`/`/`/`+`, which is
    * exactly specified and engine-independent.
    *
    * Scale shape: one token explode pruned to the query terms BEFORE
    * the (doc, term) aggregate (the filter reaches the scan side of
    * the shuffle, so the shuffled volume is per-matching-occurrence,
    * not per-token); doc lengths come from a separate narrow map —
    * no window over the token stream; df and corpus stats are
    * broadcast scalars. */
  def bm25Scores(spark: SparkSession, sfDir: String,
                 queryTerms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val qTerms = array(queryTerms.map(lit): _*)
    // doc lengths: narrow map, no explode
    val lens = docs.select($"doc_id",
      size(split(trim(lower($"text")), "\\s+")).cast("long").as("dl"))
    // only query-term occurrences survive to the shuffle
    val hits = docs
      .select($"doc_id",
              explode(split(trim(lower($"text")), "\\s+")).as("term"))
      .filter(array_contains(qTerms, $"term"))
    val tf = hits.groupBy($"doc_id", $"term").agg(count(lit(1)).as("cnt"))
    val df = hits.select($"doc_id", $"term").distinct()
      .groupBy($"term").agg(count(lit(1)).as("df"))
    // corpus stats: one tiny row, broadcast
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    tf.join(lens, "doc_id")
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf4", round(log(
        lit(1.0) + ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))), 4))
      .withColumn("contrib_micro",
        round(lit(1e6) * $"idf4" * ($"cnt" * lit(k1 + 1.0)) /
          ($"cnt" + lit(k1) * (lit(1.0 - b) +
            lit(b) * $"dl" / ($"sum_dl".cast("double") / $"n_docs"))), 0)
          .cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_hit_terms"),
           sum($"contrib_micro").as("score_micro"))
  }

  /** BM25 top-k retrieval as a query entry: rank the corpus for a
    * fixed 3-term query (one rare + two mid-frequency terms so the
    * idf spread is visible) and keep the best `topK` documents with a
    * deterministic doc_id tie-break. Ranking over integer micro-unit
    * scores — engine-exact. Top-k is TakeOrderedAndProject-shaped
    * (row_number over one small scored set; at 100 TB the scored set
    * is already pruned to docs containing a query term). */
  def bm25(spark: SparkSession, sfDir: String, topK: Int = 20): DataFrame = {
    import spark.implicits._
    bm25Scores(spark, sfDir, Seq("dup", "vector", "scan"))
      .withColumn("rnk", row_number().over(
        Window.orderBy($"score_micro".desc, $"doc_id".asc)).cast("long"))
      .filter($"rnk" <= topK)
      .select($"doc_id", $"n_hit_terms", $"score_micro", $"rnk")
  }

  /** Interpolated bigram language-model surprisal per document — the
    * KenLM-style fluency/quality signal one tier above
    * [[unigramSurprisal]]: mean bits per transition under
    * `p = λ·p(w₂|w₁) + (1−λ)·p(w₂)` with the corpus itself as the
    * model. Low = fluent/templated text, high = noise — a standard
    * perplexity-filter axis for pretraining corpora.
    *
    * Engine-stability: per-BIGRAM-TYPE surprisal is ln-computed once,
    * rounded to 4 decimals, micro-quantized — each document's total is
    * an integer sum (BM25 discipline). Bigrams come from one
    * `posexplode(slice(toks, 2, n-1))` + `element_at` — native
    * codegen'd expressions, no lambda in the hot path.
    *
    * Scale shape: bigram/unigram model tables are hash aggregates of
    * the exploded stream (map-side combine); the stream-to-model join
    * keys on the bigram pair (uniform) and the corpus total is a 1-row
    * broadcast. Nothing windows the token stream. */
  def bigramSurprisal(spark: SparkSession, sfDir: String,
                      lambda: Double = 0.75): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", split(trim(lower($"text")), "\\s+").as("toks"))
    val uni = docs.select(explode($"toks").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cw"))
    val tot = uni.agg(sum($"cw").as("total"))
    val bi = docs
      .select($"doc_id", $"toks",
              posexplode(expr("slice(toks, 2, size(toks) - 1)"))
                .as(Seq("p", "w2")))
      .select($"doc_id", element_at($"toks", $"p" + 1).as("w1"), $"w2")
    val cb = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("cb"))
    val st = cb
      .join(uni.select($"w".as("w1"), $"cw".as("c1")), "w1")
      .join(uni.select($"w".as("w2"), $"cw".as("c2")), "w2")
      .crossJoin(broadcast(tot))
      .select($"w1", $"w2",
        round(lit(1e6) * round(-log(
          lit(lambda) * $"cb" / $"c1" +
          lit(1.0 - lambda) * $"c2" / $"total") / log(lit(2.0)), 4))
          .cast("long").as("s_micro"))
    bi.join(st, Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
           sum($"s_micro").as("sum_s_micro"))
      .withColumn("mean_bits",
        round($"sum_s_micro".cast("double") / (lit(1e6) * $"n_bigrams"), 4))
  }

  /** Kneser-Ney smoothed bigram perplexity per document — the
    * kenlm/CCNet-style quality scorer (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets", LREC'20 filters
    * pretraining corpora on exactly this statistic). One tier above
    * [[bigramSurprisal]]'s fixed-λ interpolation: absolute discounting
    * with CONTINUATION probabilities —
    * `P(w₂|w₁) = max(c₁₂−D,0)/c₁ + (D·N₁₊(w₁·)/c₁)·(N₁₊(·w₂)/T)`
    * (D=0.75; N₁₊ = distinct-continuation counts; T = bigram types) —
    * the estimator that makes "Francisco" cheap only after "San".
    *
    * Engine-stability: every model quantity is an integer count off
    * the bigram TYPE table; each type's bits are ln-computed once with
    * a fixed operation order, rounded to 4 decimals, micro-quantized,
    * so each document's total is an exact integer sum (the BM25 /
    * [[bigramSurprisal]] discipline).
    *
    * Scale shape: ONE wide exchange builds the (w1,w2) type table
    * (map-side combined); history stats (c₁, N₁₊ forward), continuation
    * stats (N₁₊ backward), and the type total all derive from that
    * table — vocabulary-sized aggregates, never a second pass over the
    * corpus; the type count rides a 1-row broadcast. Scoring joins the
    * bigram stream back on (w1,w2) — the same key as the type shuffle,
    * so the exchange layout is reused. */
  def knPerplexity(spark: SparkSession, sfDir: String,
                   discount: Double = 0.75): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", split(trim(lower($"text")), "\\s+").as("toks"))
    val bi = docs
      .select($"doc_id", $"toks",
              posexplode(expr("slice(toks, 2, size(toks) - 1)"))
                .as(Seq("p", "w2")))
      .select($"doc_id", element_at($"toks", $"p" + 1).as("w1"), $"w2")
    val cb = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("cb"))
    val hist = cb.groupBy($"w1")
      .agg(sum($"cb").as("c1"), count(lit(1)).as("n1f"))
    val cont = cb.groupBy($"w2").agg(count(lit(1)).as("n1b"))
    val types = cb.agg(count(lit(1)).as("t_types"))
    val st = cb
      .join(hist, "w1")
      .join(cont, "w2")
      .crossJoin(broadcast(types))
      .select($"w1", $"w2",
        round(lit(1e6) * round(-log(
          greatest($"cb" - lit(discount), lit(0.0)) / $"c1" +
            (lit(discount) * $"n1f" / $"c1") * ($"n1b" / $"t_types")) /
          log(lit(2.0)), 4)).cast("long").as("s_micro"))
    bi.join(st, Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
           sum($"s_micro").as("sum_s_micro"))
      // integer floor-division in micro-bits, THEN one exact
      // long→double conversion: a double round() here can land exactly
      // on a .00005 boundary, where Spark (shortest-decimal HALF_UP)
      // and DuckDB (binary-value rounding) disagree by 1e-4
      .withColumn("mean_bits",
        expr("sum_s_micro div n_bigrams").cast("double") / lit(1e6))
  }

  /** DSIR importance weights (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS'23): score every
    * document by how much more likely its hashed-unigram bag is under a
    * TARGET domain's token distribution than under the raw corpus's,
    * then keep the top `topK` docs per thousand-token-normalized weight
    * — the standard pretraining-data selection step.
    *
    * Features are the paper's hashed n-grams: unigram → 60-bit md5
    * prefix → `% nBuckets` (the md5-prefix trick shared with MinHash /
    * fingerprinting, identical in SQL). Both distributions are
    * Laplace-smoothed bucket counts; the per-bucket log-likelihood
    * ratio is ln-rounded to 4 decimals and quantized to integer
    * micro-units, so each document's weight is an integer sum —
    * engine-exact (same discipline as BM25).
    *
    * Scale shape: tokens aggregate to (doc, bucket) counts BEFORE any
    * join (map-side combine collapses repeated tokens); the two bucket
    * distributions are ≤ `nBuckets`-row aggregates joined BROADCAST, so
    * the only wide exchange is the (doc, bucket) hash agg. The final
    * top-k `row_number + filter ≤ k` is rewritten by the optimizer
    * (LimitPushDownThroughWindow) into Window-over-GlobalLimit —
    * physically TakeOrderedAndProject feeding a ≤`topK`-row window;
    * PlanHygieneSpec's unpartitioned-window rule asserts this stays
    * true. At 100 TB the target sample is a tiny fixed domain; the raw
    * distribution is one map-side-combined pass. */
  def dsirWeights(spark: SparkSession, sfDir: String,
                  targetSources: Seq[String] = Seq("src7", "src18"),
                  nBuckets: Int = 512, topK: Int = 100): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val tgtLit = array(targetSources.map(lit): _*)
    val docBuckets = docs
      .select($"doc_id", $"source",
              explode(split(trim(lower($"text")), "\\s+")).as("term"))
      .withColumn("bucket",
        conv(substring(md5($"term"), 1, 15), 16, 10).cast("long") % nBuckets)
      .groupBy($"doc_id", $"source", $"bucket")
      .agg(count(lit(1)).as("cnt"))
    val raw = docBuckets.groupBy($"bucket").agg(sum($"cnt").as("cr"))
    val tgt = docBuckets.filter(array_contains(tgtLit, $"source"))
      .groupBy($"bucket").agg(sum($"cnt").as("ct"))
    val rawTot = raw.agg(sum($"cr").as("raw_total"))
    val tgtTot = tgt.agg(sum($"ct").as("tgt_total"))
    val llr = raw.join(tgt, Seq("bucket"), "left")
      .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tgtTot))
      .select($"bucket",
        round(lit(1e6) * round(log(
          ((coalesce($"ct", lit(0L)) + lit(1.0)) / ($"tgt_total" + lit(nBuckets.toDouble))) /
          (($"cr" + lit(1.0)) / ($"raw_total" + lit(nBuckets.toDouble)))), 4))
          .cast("long").as("llr_micro"))
    val lens = docs.select($"doc_id",
      size(split(trim(lower($"text")), "\\s+")).cast("long").as("n_tokens"))
    docBuckets
      .join(broadcast(llr), "bucket")
      .groupBy($"doc_id")
      .agg(sum($"cnt" * $"llr_micro").as("weight_micro"))
      .join(lens, "doc_id")
      .withColumn("wpk_milli",
        round(lit(1000.0) * $"weight_micro" / $"n_tokens").cast("long"))
      .withColumn("rnk", row_number().over(
        Window.orderBy($"wpk_milli".desc, $"doc_id".asc)).cast("long"))
      .filter($"rnk" <= topK)
      .select($"doc_id", $"n_tokens", $"weight_micro", $"wpk_milli", $"rnk")
  }

  /** Sequence packing (concat-and-chunk): the standard LLM pre-training
    * step that concatenates documents in a deterministic shard order
    * and slices the token stream into fixed `budget`-token training
    * sequences; a document whose token interval crosses a boundary
    * continues into the next sequence. Reports, per (source, seq_id):
    * how many documents contribute, how many are continuations from an
    * earlier sequence, and the packed token count (= budget for every
    * full sequence, < budget only for the shard's last).
    *
    * Packing runs PER SOURCE SHARD (window partitioned by `source`,
    * ordered by doc_id): at 100 TB each input shard packs
    * independently in parallel — exactly how distributed pre-training
    * tokenizers shard the work — so no global prefix scan exists
    * anywhere in the plan. All-integer cumulative sums → engine-exact.
    * The doc→sequence fan-out is an inclusive `sequence(first_seq,
    * last_seq)` explode: its volume is tokens/budget, not docs×seqs. */
  def packSequences(spark: SparkSession, sfDir: String,
                    budget: Int = 256): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"source").orderBy($"doc_id")
    Tables.documents(spark, sfDir)
      .select($"source", $"doc_id",
              size(split(trim(lower($"text")), "\\s+")).cast("long").as("n_tok"))
      .withColumn("cum_end", sum($"n_tok").over(w))
      .withColumn("cum_start", $"cum_end" - $"n_tok")
      .withColumn("seq_id", explode(sequence(
        expr(s"cum_start div $budget"), expr(s"(cum_end - 1) div $budget"))))
      .withColumn("tok_in_seq",
        least($"cum_end", ($"seq_id" + 1) * budget) -
          greatest($"cum_start", $"seq_id" * budget))
      .groupBy($"source", $"seq_id")
      .agg(count(lit(1)).as("n_docs"),
           sum(when($"cum_start" < $"seq_id" * budget, 1L).otherwise(0L))
             .as("n_continuations"),
           sum($"tok_in_seq").as("n_tokens"))
  }

  /** BPE tokenizer TRAINING (Sennrich et al. "Neural Machine
    * Translation of Rare Words with Subword Units", ACL'16) — the
    * iterative merge loop itself, not just one pair count
    * ([[bpePairs]] is the first iteration's statistics): `steps`
    * rounds of (count adjacent symbol pairs weighted by word
    * frequency → take the most frequent pair → merge it everywhere),
    * producing the ordered merge table that IS a BPE tokenizer.
    *
    * Determinism: argmax tie-breaks on (count desc, pair asc); merge
    * application is plain non-regex `replace` on the space-separated
    * symbol string (sentinel spaces at both ends), which scans
    * left-to-right over non-overlapping occurrences IDENTICALLY in
    * Spark and DuckDB. (Deviation from canonical BPE, documented:
    * immediately-adjacent repeats of the pair — "aaaa" under merge
    * a+a — share a boundary space, so alternate occurrences are
    * skipped; rare in natural-language vocab and engine-independent.)
    *
    * Scale shape: the ONLY corpus-sized pass is the initial word
    * count; the loop runs on the DISTINCT-word table (vocabulary-
    * sized — bounded by language, not data volume), one map-side-
    * combined pair agg per step, argmax via orderBy().limit(1) —
    * TakeOrderedAndProject, a 1-row driver collect per step (the
    * k-means/PageRank bounded-driver-state precedent). Each step
    * localCheckpoints the ≤vocab-row table so step k+1's job does not
    * replay k replaces. The DuckDB oracle unrolls the identical loop
    * as `steps` CTE levels (generated by `SparkEntry.bpeOracleSql`). */
  /** Initial BPE symbol rendering for a word: char-level (one symbol
    * per character) or BYTE-level — one symbol per UTF-8 byte,
    * rendered as its 2-hex-digit code (the GPT-2 tokenizer family
    * trains over bytes, not chars, so any byte sequence tokenizes with
    * zero OOV). Hex-pair symbols make merges unambiguous by
    * construction: a merged token concatenates to an even-length hex
    * string, never colliding with a neighbor boundary — and Spark's
    * `hex(encode(w))` and DuckDB's `hex(w)` render identically, which
    * is what keeps the unrolled-CTE oracle exact. */
  private def bpeSymInit(w: Column, byteLevel: Boolean): Column =
    if (byteLevel)
      concat(lit(" "),
        regexp_replace(hex(encode(w, "UTF-8")), "(..)", "$1 "))
    else concat(lit(" "), regexp_replace(w, "(.)", "$1 "))

  def bpeTrain(spark: SparkSession, sfDir: String,
               steps: Int = 8, byteLevel: Boolean = false): DataFrame = {
    import spark.implicits._
    var words = Tables.documents(spark, sfDir)
      .select(explode(split(trim(lower($"text")), "\\s+")).as("w"))
      .filter(length($"w") >= 2)
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .select($"freq", bpeSymInit($"w", byteLevel).as("sym"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (step <- 1 to steps) {
      val best = words
        .select($"freq", split(trim($"sym"), " ").as("t"))
        .select($"freq", $"t",
          posexplode(expr("slice(t, 2, size(t) - 1)")).as(Seq("p", "b")))
        .select(concat(element_at($"t", $"p" + 1), lit(" "), $"b").as("pair"),
          $"freq")
        .groupBy($"pair").agg(sum($"freq").as("n"))
        .orderBy($"n".desc, $"pair".asc)
        .limit(1)
        .collect()(0)
      val pair = best.getAs[String]("pair")
      val merged = pair.replace(" ", "")
      merges += ((step.toLong, pair, merged, best.getAs[Long]("n")))
      words = words
        .select($"freq",
          call_function("replace", $"sym",
            lit(s" $pair "), lit(s" $merged ")).as("sym"))
        .localCheckpoint()
    }
    merges.result().toDF("step", "pair", "merged", "n")
  }

  /** [[bpeTrain]] BEYOND toy vocab sizes (r12): the sequential trainer
    * pays one blocking driver round-trip per merge — 32k round-trips
    * at a real vocabulary. This variant selects a BATCH of
    * symbol-disjoint merges per round: pairs are ranked by the same
    * (count desc, pair asc) argmax, then greedily admitted while
    * neither symbol (nor the merged token) collides with a symbol
    * already admitted this round — disjoint merges cannot affect each
    * other's occurrence counts, so EVERY admitted pair still saves
    * exactly its counted `n` tokens when the batch applies (the
    * accounting identity the spec asserts per round). Driver rounds
    * drop from `steps` to ~`steps/batch`.
    *
    * Deviation from strictly-sequential BPE, documented: a merge can
    * CREATE a new pair (x, ab) whose count exceeds a later-admitted
    * pair's — sequential training would reorder those two picks.
    * Within-round admission order preserves the count ranking, the
    * savings identity stays exact, and batch=1 degenerates to
    * [[bpeTrain]] bit-for-bit (asserted in spec). If every remaining
    * candidate conflicts, the round falls back to the top-1 pair, so
    * progress is guaranteed. Output adds the `round` column so the
    * spec can assert the round count (the wall-time bound) and the
    * per-round savings identity. */
  def bpeTrainBatched(spark: SparkSession, sfDir: String,
                      steps: Int = 64, batch: Int = 8): DataFrame = {
    import spark.implicits._
    var words = Tables.documents(spark, sfDir)
      .select(explode(split(trim(lower($"text")), "\\s+")).as("w"))
      .filter(length($"w") >= 2)
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .select($"freq",
        concat(lit(" "), regexp_replace($"w", "(.)", "$1 ")).as("sym"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Long, Long, String, String, Long)]
    var rank = 0
    var round = 0
    var exhausted = false
    while (rank < steps && !exhausted) {
      round += 1
      val want = math.min(batch, steps - rank)
      // over-fetch so the disjointness filter has candidates to skip to
      val top = words
        .select($"freq", split(trim($"sym"), " ").as("t"))
        .select($"freq", $"t",
          posexplode(expr("slice(t, 2, size(t) - 1)")).as(Seq("p", "b")))
        .select(concat(element_at($"t", $"p" + 1), lit(" "), $"b").as("pair"),
          $"freq")
        .groupBy($"pair").agg(sum($"freq").as("n"))
        .filter($"n" > 1)
        .orderBy($"n".desc, $"pair".asc)
        .limit(math.max(4 * batch, 16))
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val sel = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        top.iterator.takeWhile(_ => sel.size < want).foreach { r =>
          val pair = r.getAs[String]("pair")
          val Array(x, y) = pair.split(" ", 2)
          val merged = x + y
          if (!used(x) && !used(y) && !used(merged)) {
            sel += ((pair, merged, r.getAs[Long]("n")))
            used ++= Seq(x, y, merged)
          }
        }
        // all candidates conflicted: sequential fallback keeps progress
        if (sel.isEmpty) {
          val r = top.head
          val pair = r.getAs[String]("pair")
          sel += ((pair, pair.replace(" ", ""), r.getAs[Long]("n")))
        }
        sel.foreach { case (pair, merged, n) =>
          rank += 1
          merges += ((rank.toLong, round.toLong, pair, merged, n))
        }
        words = sel.foldLeft(words) { case (df, (pair, merged, _)) =>
          df.select($"freq", call_function("replace", $"sym",
            lit(s" $pair "), lit(s" $merged ")).as("sym"))
        }.localCheckpoint()
      }
    }
    merges.result().toDF("rank", "round", "pair", "merged", "n")
  }

  /** Tokenizer-training learning curve: after each [[bpeTrain]] merge
    * step, the corpus-weighted token count `Σ freq·|symbols(word)|` and
    * tokens-per-word — the compression trajectory every tokenizer
    * training run watches to pick its vocab size (each merge saves
    * exactly `n` tokens, so the curve is also an internal consistency
    * check on the merge counts: total_k = total_{k-1} − n_k, asserted
    * by spec). Step 0 is the character baseline.
    *
    * Same scale shape as the trainer: vocabulary-sized table, one tiny
    * agg per step; the curve output is `steps+1` rows. */
  def bpeCurve(spark: SparkSession, sfDir: String,
               steps: Int = 8): DataFrame = {
    import spark.implicits._
    var words = Tables.documents(spark, sfDir)
      .select(explode(split(trim(lower($"text")), "\\s+")).as("w"))
      .filter(length($"w") >= 2)
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .select($"freq",
        concat(lit(" "), regexp_replace($"w", "(.)", "$1 ")).as("sym"))
      .localCheckpoint()
    def curveRow(step: Int): (Long, Long, Long) = {
      val r = words.agg(
        sum($"freq" * size(split(trim($"sym"), " "))).as("tt"),
        sum($"freq").as("tw")).collect()(0)
      (step.toLong, r.getAs[Long]("tt"), r.getAs[Long]("tw"))
    }
    val rows = Seq.newBuilder[(Long, Long, Long)]
    rows += curveRow(0)
    for (step <- 1 to steps) {
      val best = words
        .select($"freq", split(trim($"sym"), " ").as("t"))
        .select($"freq", $"t",
          posexplode(expr("slice(t, 2, size(t) - 1)")).as(Seq("p", "b")))
        .select(concat(element_at($"t", $"p" + 1), lit(" "), $"b").as("pair"),
          $"freq")
        .groupBy($"pair").agg(sum($"freq").as("n"))
        .orderBy($"n".desc, $"pair".asc)
        .limit(1)
        .collect()(0)
      val pair = best.getAs[String]("pair")
      words = words
        .select($"freq",
          call_function("replace", $"sym",
            lit(s" $pair "), lit(s" ${pair.replace(" ", "")} ")).as("sym"))
        .localCheckpoint()
      rows += curveRow(step)
    }
    rows.result().toDF("step", "total_tokens", "total_words")
      .select($"step", $"total_tokens", $"total_words",
        ($"total_tokens".cast("double") / $"total_words")
          .as("tokens_per_word"))
  }

  /** BPE tokenization with the TRAINED merge table — the downstream op
    * [[bpeTrain]]'s output exists for: per document, the token count
    * under the learned subword vocabulary vs the whitespace and
    * character baselines. The 8 merges are collected (8 tiny strings),
    * applied to the DISTINCT-word vocabulary as a chain of 8 plain
    * replaces (no loop, no argmax — training already chose them), and
    * the doc stream joins the ≤vocab-row tokenized vocabulary
    * BROADCAST. Words shorter than the training filter (len < 2)
    * tokenize as themselves (1 token).
    *
    * Scale shape: train cost is vocabulary-sized (see [[bpeTrain]]);
    * apply is one narrow explode + broadcast join + hash agg — the
    * corpus never shuffles; tokens_per_word is one raw division. */
  def bpeTokenize(spark: SparkSession, sfDir: String,
                  steps: Int = 8, byteLevel: Boolean = false): DataFrame = {
    import spark.implicits._
    val merges = bpeTrain(spark, sfDir, steps, byteLevel).collect()
      .sortBy(_.getAs[Long]("step"))
      .map(r => (r.getAs[String]("pair"), r.getAs[String]("merged")))
    val dw = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(split(trim(lower($"text")), "\\s+")).as("w"))
    val vocab0 = dw.filter(length($"w") >= 2).select($"w").distinct()
      .withColumn("sym", bpeSymInit($"w", byteLevel))
    val vocab = merges.foldLeft(vocab0) { case (df, (pair, merged)) =>
      df.withColumn("sym", call_function("replace", $"sym",
        lit(s" $pair "), lit(s" $merged ")))
    }.withColumn("w_tok", size(split(trim($"sym"), " ")).cast("long"))
      .select($"w", $"w_tok")
    // byte level: the short-word fallback is the word's BYTE count
    // (each raw byte is a base-alphabet token — the GPT-2 byte
    // fallback guarantee: no OOV at any input), and the baseline
    // column counts bytes, not chars
    val fallback =
      if (byteLevel) octet_length($"w").cast("long") else lit(1L)
    val baseline =
      if (byteLevel) octet_length($"w") else length($"w")
    dw.join(broadcast(vocab), Seq("w"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce($"w_tok", fallback)).as("bpe_tokens"),
        sum(baseline).cast("long").as("char_tokens"))
      .withColumn("tokens_per_word",
        $"bpe_tokens".cast("double") / $"n_words")
  }

  /** Model-based quality filtering in the fastText shape (Joulin et al.
    * "Bag of Tricks for Efficient Text Classification", EACL'17 — the
    * classifier family CCNet/LLaMA-style pipelines score web documents
    * with): features are hashed unigrams + word bigrams (the paper's
    * exact feature set), the document representation is the MEAN of the
    * feature embeddings, and the score is a linear read-out. Here the
    * trained weight table is replaced by a deterministic md5-derived
    * weight per hash bucket — the Spark-side plumbing (feature
    * explode, hashing trick, mean-pool, threshold gate) is the real
    * artifact, exactly the stub-the-model discipline the multimodal
    * demux uses; swapping in trained weights is a broadcast join
    * against a ≤`nBuckets`-row table.
    *
    * Engine-exactness: buckets and weights come from the md5-prefix
    * idiom (integer everywhere); the mean-pool is one integer sum ÷
    * integer count, rounded once to integer micro-units — no float
    * accumulation. Keep = score > 0 on the INTEGER score.
    *
    * Scale shape: one narrow explode (unigrams + bigrams ≈ 2× token
    * stream) into a map-side-combined (doc, sum, count) hash agg — no
    * join, no window, no weight table to shuffle. */
  def fasttextQuality(spark: SparkSession, sfDir: String,
                      nBuckets: Int = 4096): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", split(trim(lower($"text")), "\\s+").as("toks"))
    val uni = toks.select($"doc_id", explode($"toks").as("feat"))
    val bi = toks
      .select($"doc_id", $"toks",
              posexplode(expr("slice(toks, 2, size(toks) - 1)"))
                .as(Seq("p", "w2")))
      .select($"doc_id",
              concat(element_at($"toks", $"p" + 1), lit("_"), $"w2").as("feat"))
    uni.unionByName(bi)
      .withColumn("bucket",
        conv(substring(md5($"feat"), 1, 15), 16, 10).cast("long") % nBuckets)
      .withColumn("w_micro",
        conv(substring(md5(concat(lit("w:"), $"bucket")), 1, 15), 16, 10)
          .cast("long") % 2000001L - 1000000L)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_feats"),
           round(sum($"w_micro").cast("double") / count(lit(1)), 0)
             .cast("long").as("score_micro"))
      // raw exact division, NOT display-rounded: a micro-integer ending
      // in ...50 is a decimal tie where Spark's string-based round and
      // DuckDB's binary round disagree (doc 211 found it) — the
      // division itself is one correctly-rounded IEEE op, bit-identical
      .select($"doc_id", $"n_feats", $"score_micro",
              ($"score_micro".cast("double") / 1e6).as("score"),
              ($"score_micro" > 0).as("keep"))
  }

  /** Type-token ratio (lexical diversity) per source (r18) — the
    * corpus-health dial next to [[gopherQuality]]: a source whose TTR
    * collapses is template spam (few types, many tokens) long before
    * any dedup pass proves it. Per-doc TTR is micro-quantized to an
    * integer (one correctly-rounded IEEE division per doc — the
    * cross-engine-exact discipline), so the per-source aggregates stay
    * hash-green. One narrow map per doc into a map-side-combined hash
    * agg on ≤|sources| groups — nothing here windows or shuffles the
    * corpus. */
  def ttr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, sfDir)
      .select($"source",
        size(split(trim(lower($"text")), "\\s+")).cast("long").as("n_tokens"),
        size(array_distinct(split(trim(lower($"text")), "\\s+")))
          .cast("long").as("n_types"))
      .withColumn("ttr_micro",
        round($"n_types" * lit(1e6) / $"n_tokens", 0).cast("long"))
    d.groupBy($"source").agg(
      count(lit(1)).as("n_docs"),
      sum($"n_tokens").as("sum_tokens"),
      sum($"n_types").as("sum_types"),
      min($"ttr_micro").as("min_ttr_micro"),
      max($"ttr_micro").as("max_ttr_micro"),
      round(avg($"ttr_micro"), 0).cast("long").as("avg_ttr_micro"))
  }

  /** Hapax-legomena rate per source (r18): the share of a source's
    * vocabulary that appears exactly once. Healthy natural text sits
    * near Zipf's ~50%; machine-generated or boilerplate corpora crater
    * it, OCR noise inflates it — a one-number vocabulary-health gate
    * run per ingest source. Shape: explode to (source, term) → two
    * stacked hash aggs (term counts, then the |sources|-row summary);
    * the exchange carries one row per DISTINCT (source, term), never
    * per token. */
  def hapax(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tc = Tables.documents(spark, sfDir)
      .select($"source", explode(split(trim(lower($"text")), "\\s+")).as("term"))
      .groupBy($"source", $"term").agg(count(lit(1)).as("c"))
    tc.groupBy($"source").agg(
      count(lit(1)).as("vocab"),
      sum(when($"c" === 1, 1L).otherwise(0L)).as("n_hapax"),
      sum(when($"c" === 2, 1L).otherwise(0L)).as("n_dis"),
      sum($"c").as("n_tokens"))
      .withColumn("hapax_micro",
        round($"n_hapax" * lit(1e6) / $"vocab", 0).cast("long"))
  }

  /** Gopher char-weighted repetition filters (r18) — Rae et al. 2021
    * Table A1's other two repetition rules, complementing
    * [[repetition]]'s gram-count ratio with the CHAR-weighted forms
    * the paper actually thresholds: (a) fraction of characters taken
    * by occurrences of the single most frequent 2-gram (count ×
    * gram-chars, the standard naive multiply — overlapping identical
    * occurrences double-count, as in the reference implementations),
    * and (b) fraction of characters inside ANY duplicated 5-gram
    * occurrence, computed as an exact interval union (duplicated
    * occurrences explode to their covered token positions, DISTINCT
    * positions join back to per-token char weights — no island window
    * needed, and no double counting). Char weight of a token is
    * len+1 (its separator), so totals are exact integers and the
    * fractions micro-quantize cross-engine. `keep` applies the A1
    * thresholds (top-2-gram 20%, dup-5-gram 15%). Shape: one explode →
    * two hash aggs + a distinct — per-doc windows only on the ≤|grams|
    * aggregate, the corpus never globally sorts. */
  def dupNgramChars(spark: SparkSession, sfDir: String,
                    topThreshMicro: Long = 200000L,
                    dupThreshMicro: Long = 150000L): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, sfDir)
      .select($"doc_id", split(trim(lower($"text")), "\\s+").as("toks"))
      .withColumn("n_tokens", size($"toks").cast("long"))
    val tk = d.select($"doc_id", posexplode($"toks").as(Seq("p", "w")))
      .select($"doc_id", $"p".cast("long").as("p"),
        (length($"w") + 1).cast("long").as("wl"))
    val tot = tk.groupBy($"doc_id").agg(sum($"wl").as("total_chars"))
    val top2 = d.filter($"n_tokens" >= 2)
      .select($"doc_id", explode(expr(
        """transform(sequence(0, cast(n_tokens as int) - 2),
          |          i -> concat_ws(' ', slice(toks, i + 1, 2)))""".stripMargin))
        .as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"c".desc, $"g".asc)))
      .filter($"rn" === 1)
      .select($"doc_id",
        ($"c" * (length($"g") + 1)).cast("long").as("top2_chars"))
    val g5 = d.filter($"n_tokens" >= 5)
      .select($"doc_id", posexplode(expr(
        """transform(sequence(0, cast(n_tokens as int) - 5),
          |          i -> md5(concat_ws(' ', slice(toks, i + 1, 5))))""".stripMargin))
        .as(Seq("p", "h")))
      .select($"doc_id", $"p".cast("long").as("p"), $"h")
    val dupKeys = g5.groupBy($"doc_id", $"h")
      .agg(count(lit(1)).as("c")).filter($"c" > 1)
      .select($"doc_id", $"h")
    val covered = g5.join(dupKeys, Seq("doc_id", "h"))
      .select($"doc_id", explode(sequence($"p", $"p" + 4)).as("p"))
      .distinct()
      .join(tk, Seq("doc_id", "p"))
      .groupBy($"doc_id").agg(sum($"wl").as("dup5_chars"))
    d.select($"doc_id", $"n_tokens")
      .join(tot, Seq("doc_id"))
      .join(top2, Seq("doc_id"), "left")
      .join(covered, Seq("doc_id"), "left")
      .na.fill(0L, Seq("top2_chars", "dup5_chars"))
      .withColumn("top2_micro",
        round($"top2_chars" * lit(1e6) / $"total_chars", 0).cast("long"))
      .withColumn("dup5_micro",
        round($"dup5_chars" * lit(1e6) / $"total_chars", 0).cast("long"))
      .withColumn("keep",
        $"top2_micro" <= topThreshMicro && $"dup5_micro" <= dupThreshMicro)
  }

  /** Zipf rank-frequency fit per source (r18): least-squares slope of
    * ln(freq) on ln(rank) over the top `topN` terms — natural language
    * tracks slope ≈ −1 (Zipf's law); templated or synthetic text goes
    * shallow (flat head) or cliff-steep. The fit is the standard
    * corpus-vs-reference diagnostic (Gopher §A3 uses the same curve).
    * Rank ties break on term asc so the ranking is engine-stable;
    * round-6 on the regression outputs kills merge-order noise in the
    * last float bits (the [[graft.operators.Core.qCorrRegr]]
    * discipline). Shape: token explode → term-count hash agg → per-
    * source top-`topN` via [[graft.functions.TopKStructs]]-free window
    * over ≤|vocab| rows (the aggregate table, not the corpus) → one
    * 5-double co-moment agg per source. */
  def zipfFit(spark: SparkSession, sfDir: String, topN: Int = 100): DataFrame = {
    import spark.implicits._
    val tc = Tables.documents(spark, sfDir)
      .select($"source", explode(split(trim(lower($"text")), "\\s+")).as("term"))
      .groupBy($"source", $"term").agg(count(lit(1)).as("c"))
    val ranked = tc.withColumn("rnk", row_number().over(
        Window.partitionBy($"source").orderBy($"c".desc, $"term".asc)))
      .filter($"rnk" <= topN)
      .select($"source", log($"c".cast("double")).as("lf"),
        log($"rnk".cast("double")).as("lr"))
    ranked.groupBy($"source").agg(
      count(lit(1)).as("n_terms"),
      round(regr_slope($"lf", $"lr"), 6).as("slope"),
      round(regr_intercept($"lf", $"lr"), 6).as("intercept"),
      round(regr_r2($"lf", $"lr"), 6).as("r2"))
  }

  // ── Unigram-LM (SentencePiece) tokenizer ──────────────────────────
  // Kudo '18 "Subword Regularization" — the OTHER tokenizer family
  // real pipelines train besides BPE: seed a substring vocabulary,
  // EM-refit piece probabilities, segment by Viterbi at apply time.
  // Determinized for the oracle: hard (Viterbi) EM instead of
  // forward-backward expectations, integer-micro log-prob costs
  // (the BM25/DSIR ln-round-quantize discipline), and a composite
  // argmin tie-break (min total cost, tie → longest piece) that the
  // unrolled-CTE oracle encodes as `cost*16 + (maxPiece - k)`.

  /** Max piece length (substring seeds and DP lookback). */
  private[graft] val UniMaxPiece = 4

  /** Words longer than this skip the DP (training ignores them beyond
    * seeding; tokenize falls back to character pieces) — the
    * oracle-expressibility cap, like SentencePiece's own
    * max-sentencepiece-length discipline. */
  private[graft] val UniMaxWordLen = 12

  /** Viterbi segmentation under integer micro costs — the kernel both
    * the E-step and tokenize share. Composite per position:
    * `(bestCost(i-k) + cost(piece)) * 16 + (maxPiece - k)`, minimized —
    * so ties on total cost go to the LONGEST piece, exactly the
    * arithmetic the oracle's unrolled DP levels use. Single-character
    * pieces always exist (the seed keeps every character), so every
    * word segments. Returns pieces in word order. */
  private[graft] def viterbiPieces(w: String,
                                   cost: scala.collection.Map[String, Long])
      : Seq[String] = {
    val n = w.length
    val best = new Array[Long](n + 1)
    val bestK = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Long.MaxValue)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var comp = Long.MaxValue
      val kMax = math.min(i, UniMaxPiece)
      var k = 1
      while (k <= kMax) {
        if (best(i - k) != Long.MaxValue) {
          val c = cost.getOrElse(w.substring(i - k, i), -1L)
          if (c >= 0L) {
            val cand = (best(i - k) + c) * 16L + (UniMaxPiece - k)
            if (cand < comp) comp = cand
          }
        }
        k += 1
      }
      if (comp != Long.MaxValue) {
        best(i) = comp / 16L
        bestK(i) = UniMaxPiece - (comp % 16L).toInt
      }
      i += 1
    }
    require(best(n) != Long.MaxValue,
      s"unsegmentable word '$w' (character not in vocabulary)")
    val acc = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val k = bestK(pos)
      acc += w.substring(pos - k, pos)
      pos -= k
    }
    acc.reverseIterator.toSeq
  }

  /** Distinct corpus words with frequencies (the vocabulary-sized
    * table every tokenizer pass runs on — bounded by language, never
    * by data volume). */
  private def uniWords(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(explode(split(trim(lower($"text")), "\\s+")).as("w"))
      .filter(length($"w") >= 1)
      .groupBy($"w").agg(count(lit(1)).as("freq"))
  }

  /** Laplace-smoothed integer-micro piece costs from a (piece, cnt)
    * vocabulary: `-1e6 * round(ln((cnt+1)/(total+|V|)), 4)` as BIGINT —
    * positive costs, cross-engine exact after the 4-decimal round. */
  private def uniCosts(v: DataFrame): DataFrame = {
    import v.sparkSession.implicits._
    val tot = v.agg(sum($"cnt").cast("double").as("total"),
      count(lit(1)).cast("double").as("nv"))
    v.crossJoin(broadcast(tot))
      .select($"piece", $"cnt",
        (lit(0L) - round(lit(1e6) *
          round(log(($"cnt" + lit(1.0)) / ($"total" + $"nv")), 4))
          .cast("long")).as("cost_micro"))
  }

  /** One Viterbi-EM E-step: segment every DP-eligible distinct word
    * under `costs` and return per-piece usage counts weighted by word
    * frequency. Runs as a mapPartitions kernel over the ≤|vocab| word
    * table with the cost table broadcast (both bounded). */
  private[graft] def uniSegmentCounts(words: DataFrame,
                                      costs: Map[String, Long]): DataFrame = {
    import words.sparkSession.implicits._
    val bc = words.sparkSession.sparkContext.broadcast(costs)
    words.filter(length($"w") <= UniMaxWordLen)
      .select($"w", $"freq").as[(String, Long)]
      .mapPartitions { it =>
        val cost = bc.value
        it.flatMap { case (w, freq) =>
          viterbiPieces(w, cost).map(p => (p, freq))
        }
      }
      .toDF("piece", "f")
      .groupBy($"piece").agg(sum($"f").as("cnt"))
  }

  /** The seed + EM-round chain shared by train and tokenize: returns
    * the final vocabulary (piece, cnt). Seeds: every substring of
    * length 1..[[UniMaxPiece]] of every corpus word, frequency-
    * weighted — all single characters kept unconditionally (the
    * coverage guarantee), the top `seedMulti` multi-character pieces by
    * (cnt desc, piece asc) admitted. Each EM round re-costs the
    * vocabulary, Viterbi-segments the word table, and prunes to the
    * top `vocabMulti` multi-character pieces by usage (the
    * likelihood-prune, hard-EM form). */
  private def uniFinalVocab(spark: SparkSession, sfDir: String,
                            rounds: Int, seedMulti: Int,
                            vocabMulti: Int): DataFrame =
    uniChain(spark, sfDir, rounds, seedMulti, vocabMulti)._1

  /** The seed → EM chain, also returning per-round E-step aggregates
    * (round, vocab pieces used, total pieces, total DP words) — the
    * convergence curve [[unigramCurve]] reads out. */
  private def uniChain(spark: SparkSession, sfDir: String,
                       rounds: Int, seedMulti: Int, vocabMulti: Int)
      : (DataFrame, Seq[(Long, Long, Long, Long)]) = {
    import spark.implicits._
    val words = uniWords(spark, sfDir).localCheckpoint()
    val dpWordTotal = words.filter(length($"w") <= UniMaxWordLen)
      .agg(sum($"freq")).collect()(0).getLong(0)
    val seeds = words
      .select($"freq", $"w",
        explode(sequence(lit(1), least(length($"w"), lit(UniMaxPiece))))
          .as("k"))
      .select($"freq", $"w", $"k",
        explode(sequence(lit(1), length($"w") - $"k" + 1)).as("i"))
      .select(expr("substring(w, i, k)").as("piece"), $"freq")
      .groupBy($"piece").agg(sum($"freq").as("cnt"))
      .localCheckpoint()
    val chars = seeds.filter(length($"piece") === 1)
      .select($"piece").localCheckpoint()
    val multi0 = seeds.filter(length($"piece") > 1)
      .withColumn("rnk", row_number().over(
        Window.orderBy($"cnt".desc, $"piece".asc)))
      .filter($"rnk" <= seedMulti).drop("rnk")
    var v = seeds.join(chars, Seq("piece"), "left_semi")
      .unionByName(multi0).localCheckpoint()
    val curve = Seq.newBuilder[(Long, Long, Long, Long)]
    for (r <- 1 to rounds) {
      val costs = uniCosts(v).select($"piece", $"cost_micro")
        .as[(String, Long)].collect().toMap
      val counts = uniSegmentCounts(words, costs).localCheckpoint()
      val agg = counts.agg(count(lit(1)), sum($"cnt")).collect()(0)
      curve += ((r.toLong, agg.getLong(0), agg.getLong(1), dpWordTotal))
      val vChars = chars.join(counts, Seq("piece"), "left")
        .select($"piece", coalesce($"cnt", lit(0L)).as("cnt"))
      val vMulti = counts.filter(length($"piece") > 1)
        .withColumn("rnk", row_number().over(
          Window.orderBy($"cnt".desc, $"piece".asc)))
        .filter($"rnk" <= vocabMulti).drop("rnk")
      v = vChars.unionByName(vMulti).localCheckpoint()
    }
    (v, curve.result())
  }

  /** Unigram-LM EM CONVERGENCE curve (`text_unigram_curve`): one row
    * per Viterbi-EM round — distinct pieces actually used by the
    * round's segmentation, total pieces over the DP corpus, and pieces
    * per word. The refit can only tighten or hold the segmentation
    * under the re-estimated costs (the bpe_curve discipline: the
    * learning curve is a QUERY, not a log line). All-integer counts,
    * the one double a fixed division — engine-exact. */
  def unigramCurve(spark: SparkSession, sfDir: String,
                   rounds: Int = 3, seedMulti: Int = 96,
                   vocabMulti: Int = 64): DataFrame = {
    import spark.implicits._
    uniChain(spark, sfDir, rounds, seedMulti, vocabMulti)._2
      .toDF("round", "vocab_used", "total_pieces", "total_words")
      .withColumn("pieces_per_word",
        $"total_pieces".cast("double") / $"total_words")
  }

  /** Unigram-LM tokenizer TRAINING (`text_unigram_train`): the final
    * vocabulary with its usage count, integer-micro cost, and
    * deterministic rank. Row count = |corpus characters| +
    * `vocabMulti` — fixed by the parameters.
    *
    * Scale shape: the only corpus-sized pass is the word count;
    * seeding, costing, and every EM round run on vocabulary-sized
    * tables with the cost map broadcast (≤ chars+vocabMulti entries —
    * the k-means-codebook bounded-driver-state precedent). */
  def unigramTrain(spark: SparkSession, sfDir: String,
                   rounds: Int = 2, seedMulti: Int = 96,
                   vocabMulti: Int = 64): DataFrame = {
    import spark.implicits._
    uniCosts(uniFinalVocab(spark, sfDir, rounds, seedMulti, vocabMulti))
      .withColumn("rnk", row_number().over(
        Window.orderBy($"cnt".desc, $"piece".asc)).cast("long"))
      .select($"piece", $"cnt", $"cost_micro", $"rnk")
  }

  /** Unigram-LM tokenization (`text_unigram_tokenize`): per-document
    * piece counts and total cost under the trained model. Distinct
    * words segment ONCE (Viterbi for DP-eligible lengths; words past
    * [[UniMaxWordLen]] fall back to character pieces — zero OOV, since
    * the vocabulary keeps every corpus character), then documents join
    * the per-word table — the same distinct-word discipline as
    * [[bpeTokenize]], so the corpus-sized work is one join, not one
    * DP per occurrence. */
  def unigramTokenize(spark: SparkSession, sfDir: String,
                      rounds: Int = 2, seedMulti: Int = 96,
                      vocabMulti: Int = 64): DataFrame = {
    import spark.implicits._
    val v = uniFinalVocab(spark, sfDir, rounds, seedMulti, vocabMulti)
    val costs = uniCosts(v).select($"piece", $"cost_micro")
      .as[(String, Long)].collect().toMap
    val bc = spark.sparkContext.broadcast(costs)
    val wseg = uniWords(spark, sfDir)
      .select($"w").as[String]
      .mapPartitions { it =>
        val cost = bc.value
        it.map { w =>
          if (w.length <= UniMaxWordLen) {
            val pieces = viterbiPieces(w, cost)
            (w, pieces.length.toLong, pieces.map(cost).sum)
          } else {
            // character fallback: every char is in the vocabulary
            (w, w.length.toLong,
              w.map(c => cost(c.toString)).sum)
          }
        }
      }
      .toDF("w", "n_pieces", "cost_micro")
      .localCheckpoint()
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        explode(split(trim(lower($"text")), "\\s+")).as("w"))
      .join(wseg, "w")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum($"n_pieces").as("n_pieces"),
        sum($"cost_micro").as("cost_micro"))
      .withColumn("pieces_per_word",
        $"n_pieces".cast("double") / $"n_words")
  }
}
