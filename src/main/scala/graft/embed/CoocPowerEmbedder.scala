package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftUdfs

/** Distributed, deterministic trained word embeddings: exact
  * integer co-occurrence counts factorized by a fixed number of
  * quantized diffusion rounds — the engine's answer to the one
  * training stage that did NOT distribute ([[Word2VecEmbedder.fit]]'s
  * single-partition SGD, whose per-sentence updates are inherently
  * sequential; reference capability `main.py:50-56`, where the
  * encoder itself is a fitted external model).
  *
  * The algorithm is diffused random indexing (random projection of
  * the document co-occurrence matrix, smoothed by power iteration):
  *
  *  1. `cooc(u,v)` = number of corpus rows whose clean-dedup token
  *     set ([[GraftUdfs.tokensCleanDedup]], the engine-wide NLP
  *     pipeline) contains both `u` and `v` — one map-combined
  *     aggregate over per-row token pairs, the q104 adjacency shape.
  *     The diagonal `cooc(u,u)` = row frequency of `u` is kept, so
  *     every word's degree is ≥ 1.
  *  2. `vec₀(w,d)` = ±`micro`, sign = parity of the 56-bit md5 of
  *     `salt:w:d` — a content-keyed ±1 random-indexing basis, no RNG
  *     state, identical on any cluster.
  *  3. `rounds` rounds of `vec_{r+1}(u,·) = floor(Σ_v cooc(u,v) ·
  *     vec_r(v,·) / deg(u))` with `deg(u) = Σ_v cooc(u,v)` — each
  *     round averages every word's vector with its co-occurrence
  *     neighbourhood (weights = exact counts), pulling
  *     distributionally-similar words together; `floor` of the
  *     exactly-known integer quotient re-quantizes the trajectory so
  *     every value stays an integer and every sum stays order-free
  *     (the q110 kmeansMicro trajectory pattern).
  *
  * Every quantity is an exact integer: the fit is a pure function of
  * corpus CONTENT — partition-invariant, repartition-invariant,
  * cluster-size-invariant BY CONSTRUCTION (CoocPowerEmbedderSpec
  * pins it), not by a content-sort + `coalesce(1)` contract. The
  * whole trajectory replays in any SQL engine (q148's oracle unrolls
  * the rounds as CTEs over the same corpus).
  *
  * Scale shape: tokenize is a projection; the pair fan-out is
  * per-row quadratic in the DISTINCT-token count, which the
  * engine-wide 150-char truncate bounds (≤ ~30 tokens → ≤ ~900
  * pairs/row); `cooc` is one map-combined shuffle keyed on (u,v);
  * each round is a join on the token key + one map-combined sum —
  * vocab-sized state, corpus-sized work, no global order anywhere.
  *
  * Magnitude bounds (why nothing overflows or loses exactness):
  * |vec| ≤ micro at every round (each update is a floor of a weighted
  * MEAN), so |Σ_v cnt·x| ≤ deg·micro; with micro = 10⁶ that holds to
  * deg ≈ 9·10¹² in a Long and stays double-exact (< 2⁵³) to
  * deg ≈ 9·10⁹ — far beyond any bounded fit corpus.
  */
object CoocPowerEmbedder {

  /** Train and return the word-vector table `(word, vec)` with `vec`
    * an `Array[Double]` of integer values in [-micro, micro] —
    * fully distributed, nothing collected. */
  def fitVectors(corpus: DataFrame, idCol: String, textCol: String,
                 dim: Int = 64, rounds: Int = 2, micro: Long = 1000000L,
                 maxTextLength: Int = 150, salt: String = "cpe"): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    require(rounds >= 0, "rounds must be >= 0")
    require(micro >= 1L, "micro must be >= 1")
    val rowToks = corpus.select(col(idCol).cast("string").as("__rid"),
      explode(GraftUdfs.tokensCleanDedup(col(textCol), lit(maxTextLength))).as("tok"))
    // (u,v) for every ordered pair of distinct-per-row tokens,
    // diagonal included: cnt(u,u) = row frequency of u, so deg >= 1.
    // Persisted for the duration of the fit: the corpus-sized
    // tokenize + pair shuffle is consumed once per diffusion round
    // plus the degree/vocab reads — without the persist, lineage
    // re-executes it rounds+2 times (results are identical either
    // way: every step is exact integer arithmetic). The fit
    // localCheckpoints its vocab-sized OUTPUT and unpersists the
    // aggregate before returning, so no CacheManager entry outlives
    // the call.
    val cooc = rowToks.as("a").join(rowToks.as("b"), Seq("__rid"))
      .select(col("a.tok").as("u"), col("b.tok").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("cnt"))
      .persist()
    val deg = cooc.groupBy("u").agg(sum(col("cnt")).as("deg"))
    // ±micro random-indexing init, keyed on content (md5 parity)
    val parity = pmod(
      conv(substring(md5(concat(lit(salt + ":"), col("word"), lit(":"),
        col("d").cast("string"))), 1, 14), 16, 10).cast("long"),
      lit(2L))
    var vec = cooc.select(col("u").as("word")).distinct()
      .withColumn("d", explode(array((0 until dim).map(i => lit(i)): _*)))
      .select(col("word"), col("d"),
        when(parity === 0L, lit(micro)).otherwise(lit(-micro)).as("x"))
    for (_ <- 1 to rounds) {
      val raw = cooc.join(vec, cooc("v") === vec("word"))
        .groupBy(col("u"), col("d"))
        .agg(sum(col("cnt") * col("x")).as("raw"))
      // floor(raw / deg) via the exactly-divisible form: the double
      // division divides a multiple of deg by deg (both < 2^53), so
      // the quotient is exact in BOTH engines; deg >= 1 always
      vec = raw.join(deg, Seq("u"))
        .select(col("u").as("word"), col("d"),
          ((col("raw") - pmod(col("raw"), col("deg"))) / col("deg"))
            .cast("long").as("x"))
    }
    val out = vec.groupBy("word")
      .agg(sort_array(collect_list(struct(col("d"), col("x")))).as("__dx"))
      .select(col("word"),
        transform(col("__dx"), s => s.getField("x").cast("double")).as("vec"))
      // materialize the vocab-sized result (one eager job), then drop
      // the cooc cache entry — the returned frame no longer depends on
      // it, and localCheckpoint blocks are RDD-scoped (ContextCleaner
      // reclaims them on GC, unlike Dataset.persist's CacheManager
      // registration which lives until an explicit unpersist)
      .localCheckpoint(true)
    cooc.unpersist()
    out
  }

  /** Fully distributed APPLY: embed `df(textCol)` against a trained
    * word-vector TABLE (the [[fitVectors]] output) with a join —
    * no driver-side vocabulary at all, the 100 TB apply path when
    * the vocabulary outgrows a task broadcast (web-scale vocab,
    * per-domain vocabularies). Arithmetic is BIT-identical to
    * [[QuantizedVocabEmbedder]]'s broadcast kernel
    * ([[graft.functions.VocabAvgExpr]]): per-dimension sums of the
    * integer-valued weights are exact doubles (order-free, so the
    * shuffle's arbitrary order cannot change them), then the single
    * `· (1.0/n)` scaling with the FULL token count and the shared
    * L2 normalize — CoocPowerEmbedderSpec pins join-apply ≡
    * broadcast-apply exactly. Plan shape: tokens explode → join on
    * the token key (broadcast when the vectors table is small,
    * shuffle-hash otherwise — Spark picks by stats) → two
    * map-combined aggregates keyed on (row, dim) then row. */
  def embedJoined(df: DataFrame, idCol: String, textCol: String, outCol: String,
                  vectors: DataFrame, dim: Int,
                  maxTextLength: Int = 150): DataFrame = {
    import graft.functions.VectorOps
    val withToks = df.withColumn("__toks",
      GraftUdfs.tokensCleanDedup(col(textCol), lit(maxTextLength)))
    val sums = withToks
      .select(col(idCol).as("__jid"), explode(col("__toks")).as("__tok"))
      .join(vectors.select(col("word").as("__tok"), col("vec").as("__wv")),
        Seq("__tok"))
      // fail fast on a dim/table mismatch: without this, in-vocab rows
      // would carry table-width vectors while all-OOV rows get
      // dim-width zeros — ragged arrays that downstream dot kernels
      // silently truncate
      .withColumn("__wv", when(size(col("__wv")) === dim, col("__wv"))
        .otherwise(raise_error(concat(
          lit(s"embedJoined: vectors table width != dim=$dim (got "),
          size(col("__wv")).cast("string"), lit(")")))))
      .select(col("__jid"), posexplode(col("__wv")).as(Seq("__d", "__x")))
      .groupBy("__jid", "__d").agg(sum(col("__x")).as("__s"))
      .groupBy("__jid")
      .agg(sort_array(collect_list(struct(col("__d"), col("__s")))).as("__ds"))
      .select(col("__jid"),
        transform(col("__ds"), s => s.getField("__s")).as("__sum"))
    val zeros = array((0 until dim).map(_ => lit(0.0)): _*)
    withToks
      .join(sums, col(idCol) === col("__jid"), "left")
      .withColumn(outCol, VectorOps.normalize(
        when(size(col("__toks")) === 0 || col("__sum").isNull, zeros)
          .otherwise(transform(col("__sum"),
            x => x * (lit(1.0) / size(col("__toks")))))))
      .drop("__toks", "__jid", "__sum")
  }

  /** Fit and wrap as a [[QuantizedVocabEmbedder]] (integer weights
    * are trivially 2^-scaleBits-quantized), so the apply path shares
    * the certified clean → in-vocab mean → L2-normalize replay
    * arithmetic of the trained flagship (q44). The collect is
    * vocab-sized — bounded by the fit-corpus contract, same posture
    * as [[Word2VecEmbedder.vocabVectors]]. */
  def fit(corpus: DataFrame, idCol: String, textCol: String,
          dim: Int = 64, rounds: Int = 2, micro: Long = 1000000L,
          maxTextLength: Int = 150, salt: String = "cpe"): QuantizedVocabEmbedder = {
    val vocab = fitVectors(corpus, idCol, textCol, dim, rounds, micro,
        maxTextLength, salt)
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq
    new QuantizedVocabEmbedder(vocab, dim, maxTextLength)
  }
}
