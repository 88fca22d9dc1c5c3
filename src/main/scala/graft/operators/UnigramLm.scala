package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.functions.UnigramSegmentExpr

/** Unigram-LM (SentencePiece-style) tokenizer training — the OTHER
  * trained-tokenizer family real pipelines run beside BPE (Kudo 2018,
  * arXiv:1804.10959), built on the same certifiable discipline as
  * [[Bpe]]: a fixed budget of hard-EM (Viterbi) rounds, every round
  * exact integer relational algebra plus one micro-quantised `ln`
  * per VOCAB ENTRY, so a DuckDB oracle unrolling the same rounds —
  * DP cells included — retrains the whole model.
  *
  * Algorithm (documented simplifications vs full SentencePiece, each
  * chosen for cross-engine replayability):
  *   - SEED: all substrings of length ≤ `maxPieceLen` of the corpus
  *     word-frequency table, capped to the `vocabCap` most frequent
  *     (ties → lexicographic), ALWAYS keeping every single character
  *     (coverage guarantee, SentencePiece's required-char rule).
  *     Seed costs: `round(-ln(c/Σc)·10⁶)`.
  *   - EM: `rounds` hard-EM iterations — Viterbi-segment the DISTINCT
  *     word table under current costs
  *     ([[graft.functions.UnigramSegmentExpr]], one fused projection
  *     over a vocabulary-sized frame), count pieces on the best paths
  *     weighted by word frequency (exact BIGINT), re-estimate
  *     `cost = round(-ln((c+1)/(Σc+V))·10⁶)` (add-one smoothing keeps
  *     dropped pieces finite). Hard EM instead of forward-backward
  *     soft EM; no vocabulary pruning between rounds (fixed-V EM).
  *   - The vocabulary is driver-paced parameter state (≤ vocabCap +
  *     alphabet entries), exactly like the BPE merge table and the
  *     k-means centroid fold.
  *
  * Scale shape: ONE corpus scan builds the word-frequency table
  * (Heaps' law: vocabulary ≪ corpus); seeding is one substring-keyed
  * count; each EM round is a projection + one piece-keyed count over
  * the WORD table, never the corpus. Encoding 100 TB is a pure
  * codegen projection ([[encodeStats]]).
  *
  * Reference anchor: the reference tokenizes labels by whitespace
  * (`utilities/nlp_preprocessing.py:75-90`); this is the trained
  * subword counterpart, completing the tokenizer family next to
  * [[Bpe]] (q123/q152).
  */
object UnigramLm {

  /** One fitted vocab entry: piece, seed count, final-round Viterbi
    * count, final cost micros. */
  val vocabSchema: StructType = new StructType()
    .add("piece", StringType, nullable = false)
    .add("seed_count", LongType, nullable = false)
    .add("viterbi_count", LongType, nullable = false)
    .add("w_micros", LongType, nullable = false)

  /** Word-frequency table: one row per distinct `[a-z]+` word of
    * length ≤ `maxWordLen` (the DP-unroll bound the oracle shares —
    * longer words are excluded in BOTH engines, deterministically). */
  private[graft] def wordFreq(docs: DataFrame, textCol: String,
      maxWordLen: Int): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z]+$") &&
        length(col("word")) <= maxWordLen)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** Seed piece counts: every substring of length 1..maxPieceLen of
    * every word, weighted by word frequency, capped to the
    * `vocabCap` most frequent with every single character retained. */
  private[graft] def seedVocab(words: DataFrame, maxPieceLen: Int,
      vocabCap: Int): DataFrame = {
    val pc = words
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("st"))
      .select(col("word"), col("cnt"), col("st"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("st") + 1)))
          .as("k"))
      .select(col("word").substr(col("st"), col("k")).as("piece"),
        col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))
    pc.orderBy(col("c").desc, col("piece")).limit(vocabCap)
      .unionByName(pc.filter(length(col("piece")) === 1))
      .distinct()
  }

  /** The segmentation column: struct(pieces, cost_micros) of `word`
    * under the given (piece → cost) table. */
  def segment(word: Column, pieces: Seq[String], costMicros: Seq[Long],
      maxPieceLen: Int, unkCost: Long): Column =
    toColumn(UnigramSegmentExpr(toExpression(word), pieces, costMicros,
      maxPieceLen, unkCost))

  /** `rounds` hard-EM iterations from the frequency-seeded costs.
    * Returns the fitted vocabulary ([[vocabSchema]]) — viterbi_count
    * and w_micros are the FINAL round's count and re-estimated cost.
    * Driver state is one (piece, cost) table per round, ≤ vocabCap +
    * alphabet entries. */
  def trainViterbiEm(docs: DataFrame, textCol: String, rounds: Int,
      maxPieceLen: Int = 4, vocabCap: Int = 512,
      maxWordLen: Int = 12): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    require(maxPieceLen >= 1 && vocabCap >= 1 && maxWordLen >= 1,
      "maxPieceLen, vocabCap, maxWordLen must be positive")
    val spark = docs.sparkSession
    val words = wordFreq(docs, textCol, maxWordLen).persist()
    try {
      val seed = seedVocab(words, maxPieceLen, vocabCap)
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1) // deterministic driver order
      val totSeed = seed.map(_._2).sum
      val v = seed.length
      val pieceArr = seed.map(_._1)
      var costs = seed.map { case (_, c) =>
        math.round(-math.log(c.toDouble / totSeed.toDouble) * 1e6)
      }
      var lastCounts = Map.empty[String, Long]
      for (_ <- 1 to rounds) {
        val seg = segment(col("word"), pieceArr.toSeq, costs.toSeq,
          maxPieceLen, unkCost = Long.MaxValue / 4)
        lastCounts = words
          .select(col("cnt"), explode(seg.getField("pieces")).as("piece"))
          .groupBy(col("piece")).agg(sum(col("cnt")).as("vc"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val totR = lastCounts.valuesIterator.sum
        costs = pieceArr.map { p =>
          val c = lastCounts.getOrElse(p, 0L)
          math.round(-math.log((c + 1).toDouble / (totR + v).toDouble) * 1e6)
        }
      }
      val rows = seed.zip(costs).map { case ((p, c0), w) =>
        Row(p, c0, lastCounts.getOrElse(p, 0L), w)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), vocabSchema)
    } finally words.unpersist()
  }

  /** Per-doc encode stats under a fitted vocabulary — the 100 TB
    * apply path, a pure fused projection per word occurrence plus one
    * per-doc rollup: word count, character tokens, unigram-LM token
    * count, and the exact total path cost (certifying the DP itself
    * inside the hashed result). Only `[a-z]+` words of length ≤
    * `maxWordLen` participate (both engines agree). */
  /** [[trainViterbiEm]] with SentencePiece's vocabulary SHRINK loop —
    * closes the documented fixed-V simplification: each hard-EM round
    * Viterbi-counts the distinct-word table, then PRUNES the bottom
    * `pruneNum/pruneDen` fraction (floor) of MULTI-character pieces
    * by Viterbi-count contribution (ties → lexicographically smaller
    * piece drops first), always keeping the single-character coverage
    * set (SentencePiece's required-char rule), then re-estimates
    * `cost = round(-ln((c+1)/(Σc'+V'))·10⁶)` over the SURVIVORS only
    * (Σc' = surviving counts, V' = surviving vocab size). The
    * vocabulary is driver-paced parameter state shrinking round by
    * round — the real SentencePiece trainer loop, each prune decision
    * exact integer arithmetic a DuckDB oracle replays round by round
    * (the q123 unrolled-rounds discipline).
    *
    * Returns the SURVIVING vocabulary: (piece, viterbi_count,
    * w_micros) — viterbi_count is the FINAL round's count. */
  def trainViterbiEmPruned(docs: DataFrame, textCol: String, rounds: Int,
      maxPieceLen: Int = 4, vocabCap: Int = 512, maxWordLen: Int = 12,
      pruneNum: Int = 1, pruneDen: Int = 4): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    require(pruneNum >= 0 && pruneDen >= 1 && pruneNum < pruneDen,
      "prune fraction must be in [0, 1)")
    val spark = docs.sparkSession
    val words = wordFreq(docs, textCol, maxWordLen).persist()
    try {
      val seed = seedVocab(words, maxPieceLen, vocabCap)
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1)
      val totSeed = seed.map(_._2).sum
      var pieceArr = seed.map(_._1)
      var costs = seed.map { case (_, c) =>
        math.round(-math.log(c.toDouble / totSeed.toDouble) * 1e6)
      }
      var lastCounts = Map.empty[String, Long]
      for (_ <- 1 to rounds) {
        val seg = segment(col("word"), pieceArr.toSeq, costs.toSeq,
          maxPieceLen, unkCost = Long.MaxValue / 4)
        lastCounts = words
          .select(col("cnt"), explode(seg.getField("pieces")).as("piece"))
          .groupBy(col("piece")).agg(sum(col("cnt")).as("vc"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val multi = pieceArr.filter(_.length > 1)
        val nDrop = (multi.length.toLong * pruneNum / pruneDen).toInt
        val dropped = multi
          .sortBy(p => (lastCounts.getOrElse(p, 0L), p))(
            Ordering.Tuple2(Ordering.Long, Ordering.String))
          .take(nDrop).toSet
        pieceArr = pieceArr.filterNot(dropped)
        val totR = pieceArr.iterator
          .map(p => lastCounts.getOrElse(p, 0L)).sum
        val v = pieceArr.length
        costs = pieceArr.map { p =>
          val c = lastCounts.getOrElse(p, 0L)
          math.round(-math.log((c + 1).toDouble / (totR + v).toDouble) * 1e6)
        }
      }
      val rows = pieceArr.zip(costs).map { case (p, w) =>
        Row(p, lastCounts.getOrElse(p, 0L), w)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1),
        new StructType()
          .add("piece", StringType, nullable = false)
          .add("viterbi_count", LongType, nullable = false)
          .add("w_micros", LongType, nullable = false))
    } finally words.unpersist()
  }

  /** Board-level memos for the two trainers over a testdata dir —
    * the langid/residual-PQ memo precedent: q267/q268/q275/q291 train
    * the IDENTICAL fixed-V vocabulary and q277/q283/q289 the
    * IDENTICAL pruned one, so each trains once per
    * (application, dir, params). The memoized value is the trainer's
    * own driver-built local frame (vocabulary-sized parameter state —
    * the fitted tokenizer a production pipeline trains once and
    * ships); memoized ≡ fresh bit-for-bit because both trainers are
    * deterministic. Pinned by UnigramLmSpec.
    *
    * INVARIANT (shared by every dir-keyed memo on the board —
    * langid, quality, PQ/ANN, these): the data under `dir` is
    * immutable for the lifetime of one Spark application. The memos
    * key on (applicationId, dir, params) and read the parquet under
    * `dir` at training time only — a harness that rewrote testdata within
    * one application would be served a stale fitted model. The
    * driver's contract (testdata generated once, read-only) makes
    * this safe; any future in-application rewrite must bust these
    * memos (new dir or new application). */
  private val trainMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  def trainViterbiEmMemo(spark: org.apache.spark.sql.SparkSession,
      dir: String, rounds: Int, maxPieceLen: Int, vocabCap: Int,
      maxWordLen: Int): DataFrame = {
    trainMemo.entrySet().removeIf(
      e => e.getValue.sparkSession.sparkContext.isStopped)
    trainMemo.computeIfAbsent(
      s"${spark.sparkContext.applicationId}:em:$dir:$rounds:" +
        s"$maxPieceLen:$vocabCap:$maxWordLen",
      _ => trainViterbiEm(spark.read.parquet(s"$dir/documents.parquet"),
        "text", rounds, maxPieceLen, vocabCap, maxWordLen))
  }
  def trainViterbiEmPrunedMemo(spark: org.apache.spark.sql.SparkSession,
      dir: String, rounds: Int, maxPieceLen: Int, vocabCap: Int,
      maxWordLen: Int, pruneNum: Int, pruneDen: Int): DataFrame = {
    trainMemo.entrySet().removeIf(
      e => e.getValue.sparkSession.sparkContext.isStopped)
    trainMemo.computeIfAbsent(
      s"${spark.sparkContext.applicationId}:pruned:$dir:$rounds:" +
        s"$maxPieceLen:$vocabCap:$maxWordLen:$pruneNum:$pruneDen",
      _ => trainViterbiEmPruned(
        spark.read.parquet(s"$dir/documents.parquet"), "text", rounds,
        maxPieceLen, vocabCap, maxWordLen, pruneNum, pruneDen))
  }

  /** The ORDERED token stream under a fitted vocabulary — per kept
    * word occurrence, the Viterbi best-path pieces in left-to-right
    * order: (idCol, word_pos, piece_idx, piece). This is the actual
    * pretraining-data deliverable shape ([[encodeStats]] only rolls
    * up counts): joined to a (piece → token id) table it becomes the
    * integer id stream a trainer consumes (q275 packs it into
    * fixed-length sequences). Same scale posture as [[encodeStats]] —
    * one fused codegen projection per word, one generator per piece;
    * `word_pos`/`piece_idx` order tokens WITHIN a doc, so downstream
    * packing never needs a corpus-global sort, only a per-shard one.
    * Only `[a-z]+` words of length ≤ `maxWordLen` participate (both
    * engines agree); dropped words leave gaps in `word_pos`, which is
    * an ordering key, not an index. */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
      pieces: Seq[String], costMicros: Seq[Long], maxPieceLen: Int,
      maxWordLen: Int = 12): DataFrame = {
    val seg = segment(col("word"), pieces, costMicros, maxPieceLen,
      unkCost = Long.MaxValue / 4)
    docs
      .select(col(idCol),
        posexplode(split(lower(col(textCol)), "\\s+"))
          .as(Seq("word_pos", "word")))
      .filter(col("word").rlike("^[a-z]+$") &&
        length(col("word")) <= maxWordLen)
      .withColumn("__seg", seg)
      .select(col(idCol), col("word_pos").cast("long").as("word_pos"),
        posexplode(col("__seg").getField("pieces"))
          .as(Seq("piece_idx", "piece")))
  }

  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
      pieces: Seq[String], costMicros: Seq[Long], maxPieceLen: Int,
      maxWordLen: Int = 12): DataFrame = {
    val seg = segment(col("word"), pieces, costMicros, maxPieceLen,
      unkCost = Long.MaxValue / 4)
    docs
      .select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z]+$") &&
        length(col("word")) <= maxWordLen)
      .withColumn("__seg", seg)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word")).cast("long")).as("char_tokens"),
        sum(size(col("__seg").getField("pieces")).cast("long"))
          .as("unigram_tokens"),
        sum(col("__seg").getField("cost_micros")).as("cost_micros"))
  }
}
