package graft

import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** Unigram-LM (SentencePiece, Kudo '18) tokenizer invariants — the
  * train→apply conservation identities the DuckDB oracle can't see
  * (it replays the same chain; these cross independent code paths). */
class UnigramTokenizerSpec extends SparkSpec {

  private def costMap(train: org.apache.spark.sql.DataFrame)
      : Map[String, Long] = {
    import spark.implicits._
    train.select($"piece", $"cost_micro").as[(String, Long)].collect().toMap
  }

  test("viterbi kernel: coverage, tie-break to longest piece, unsegmentable throws") {
    // hand-built cost table: chars cost 10 each, "ab" costs 20, "abc" 30
    val cost = Map("a" -> 10L, "b" -> 10L, "c" -> 10L,
      "ab" -> 20L, "abc" -> 30L)
    // "abc": char path 30, ab+c 30, abc 30 — all tie at 30; the
    // composite (cost*16 + (4-k)) awards the LONGEST piece at each
    // position, so the whole-word piece wins
    assert(TextOps.viterbiPieces("abc", cost) === Seq("abc"))
    // "abcb": abc+b = 40 beats ab+c+b = 50 and chars = 40 tie → longest
    assert(TextOps.viterbiPieces("abcb", cost) === Seq("abc", "b"))
    // cheaper multi-char piece is chosen over chars when strictly better
    val cost2 = Map("a" -> 10L, "b" -> 10L, "ab" -> 5L)
    assert(TextOps.viterbiPieces("abab", cost2) === Seq("ab", "ab"))
    // coverage: segmentation concatenates back to the word
    assert(TextOps.viterbiPieces("abcb", cost).mkString === "abcb")
    // a character missing from the vocabulary is a loud error
    intercept[IllegalArgumentException] {
      TextOps.viterbiPieces("axb", cost)
    }
  }

  test("train: fixed row count, every corpus character kept, costs positive, rank dense") {
    import spark.implicits._
    val train = TextOps.unigramTrain(spark, sf).localCheckpoint()
    val chars = Tables.documents(spark, sf)
      .select(explode(split(trim(lower($"text")), "\\s+")).as("w"))
      .filter(length($"w") >= 1)
      .select(explode(split($"w", "")).as("ch"))
      .filter(length($"ch") === 1)
      .distinct().as[String].collect().toSet
    val pieces = train.select($"piece").as[String].collect().toSet
    // the coverage guarantee: every corpus character is a piece
    assert(chars.subsetOf(pieces), (chars -- pieces).toSeq.sorted)
    // row count = |chars| + min(vocabMulti, multi candidates)
    val nMulti = train.filter(length($"piece") > 1).count()
    assert(train.count() === chars.size + nMulti)
    assert(nMulti > 0 && nMulti <= 64)
    // smoothed log-prob costs are positive micro-integers
    assert(train.filter($"cost_micro" <= 0).count() === 0)
    // rank is a dense 1..n permutation ordered by (cnt desc, piece asc)
    val rnks = train.select($"rnk").as[Long].collect().sorted
    assert(rnks.toSeq === (1L to train.count()).toSeq)
  }

  test("train→apply conservation: independent recount reproduces tokenize totals") {
    import spark.implicits._
    val train = TextOps.unigramTrain(spark, sf).localCheckpoint()
    val costs = costMap(train)
    val words = Tables.documents(spark, sf)
      .select(explode(split(trim(lower($"text")), "\\s+")).as("w"))
      .filter(length($"w") >= 1)
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    // path A: the E-step counter (flatMap piece emission + groupBy)
    val eStep = TextOps.uniSegmentCounts(words, costs)
    val totalA = eStep.agg(sum($"cnt")).collect()(0).getLong(0)
    // path B: the tokenize query (per-word piece LENGTHS + doc join)
    val tok = TextOps.unigramTokenize(spark, sf)
    val totalB = tok.agg(sum($"n_pieces")).collect()(0).getLong(0)
    // corpus has no words past the DP cap (all ≤ 12 chars), so the two
    // paths count the same segmentations — exact conservation
    val longWords = words.filter(length($"w") > TextOps.UniMaxWordLen).count()
    assert(longWords === 0L, "fixture drifted: corpus now has long words")
    assert(totalA === totalB)
    // per-word coverage: sum of piece lengths == word length, so the
    // corpus-total characters are conserved through segmentation
    val charTotalSeg = words.select($"w", $"freq").as[(String, Long)]
      .collect().map { case (w, f) =>
        f * TextOps.viterbiPieces(w, costs).map(_.length).sum }.sum
    val charTotal = words.agg(sum(length($"w") * $"freq"))
      .collect()(0).getLong(0)
    assert(charTotalSeg === charTotal)
    // tokenize cost is the sum of chosen-piece costs — never negative,
    // and words-per-doc agree with a direct recount
    assert(tok.filter($"cost_micro" <= 0).count() === 0)
    val nWords = Tables.documents(spark, sf)
      .select(explode(split(trim(lower($"text")), "\\s+")).as("w"))
      .filter(length($"w") >= 1).count()
    assert(tok.agg(sum($"n_words")).collect()(0).getLong(0) === nWords)
  }

  test("EM curve: rounds ordered, segmentation never loosens, vocab bounded") {
    import spark.implicits._
    val curve = TextOps.unigramCurve(spark, sf).orderBy($"round").collect()
    assert(curve.map(_.getAs[Long]("round")).toSeq === Seq(1L, 2L, 3L))
    // Viterbi-EM refit can only tighten or hold the total segmentation
    val pieces = curve.map(_.getAs[Long]("total_pieces"))
    assert(pieces.zip(pieces.tail).forall { case (a, b) => b <= a },
      pieces.mkString(","))
    // words are constant across rounds; pieces/word consistent
    val words = curve.map(_.getAs[Long]("total_words")).distinct
    assert(words.length === 1 && words.head > 0)
    curve.foreach { r =>
      assert(math.abs(r.getAs[Double]("pieces_per_word") -
        r.getAs[Long]("total_pieces").toDouble / words.head) < 1e-12)
      assert(r.getAs[Long]("vocab_used") > 0)
    }
  }

  test("EM refines: round-2 vocabulary usage covers the corpus under final costs") {
    import spark.implicits._
    val train = TextOps.unigramTrain(spark, sf).localCheckpoint()
    val costs = costMap(train)
    // every piece the final model's own Viterbi uses is in the model
    val words = Tables.documents(spark, sf)
      .select(explode(split(trim(lower($"text")), "\\s+")).as("w"))
      .filter(length($"w") >= 1).distinct().as[String].collect()
    val used = words.flatMap(w => TextOps.viterbiPieces(w, costs)).toSet
    assert(used.subsetOf(costs.keySet))
    // multi-char pieces actually get used (the EM did not collapse to
    // a character model on this corpus)
    assert(used.exists(_.length > 1))
  }
}
