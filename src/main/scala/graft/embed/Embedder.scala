package graft.embed

import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftUdfs, VectorOps}

/** Text → fixed-width dense vector, as a pluggable stage.
  *
  * In the reference the encoder is an externally-supplied
  * SentenceTransformer (`main.py:9,67,171`; `nlp_preprocessing.py:100`)
  * — a *parameter*, not code. We keep that contract: an [[Embedder]]
  * is any `DataFrame => DataFrame` that adds a `Array[Double]` vector
  * column. Correctness tests run against [[FrozenEmbedder]] (fixture
  * vectors, exactly like the checked-in golden CSV); the live path is
  * [[HashingEmbedder]] — deterministic feature hashing, fully
  * distributed, no model state to ship.
  */
trait Embedder extends Serializable {
  /** Add vector column `outCol` derived from text column `textCol`. */
  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame
}

/** Deterministic feature-hashing embedder: clean-dedup tokens
  * (reference NLP semantics, `nlp_preprocessing.py:86-99`) →
  * murmur3-hashed term frequencies ([[HashingTF]], dim buckets) →
  * L2 normalization. Stateless: no fit step, no vocabulary to
  * broadcast, identical output on any cluster size.
  */
class HashingEmbedder(dim: Int = 64, maxTextLength: Int = 150) extends Embedder {
  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val tokCol = outCol + "__tokens"
    val rawCol = outCol + "__raw"
    val htf = new HashingTF().setInputCol(tokCol).setOutputCol(rawCol)
      .setNumFeatures(dim).setBinary(false)
    val withTokens = df.withColumn(
      tokCol, GraftUdfs.tokensCleanDedup(col(textCol), lit(maxTextLength)))
    htf.transform(withTokens)
      .withColumn(outCol, VectorOps.normalize(vector_to_array(col(rawCol))))
      .drop(tokCol, rawCol)
  }
}

/** Feature-hashing embedder with an md5 bucket kernel: identical
  * tokenizer (clean-dedup, `nlp_preprocessing.py:86-99`) and TF→L2
  * semantics to [[HashingEmbedder]], but bucket(t) = top-56-bit
  * md5(t) mod dim instead of murmur3. md5 is engine-standardized, so
  * the WHOLE live embedding path — clean → tokens → TF vector →
  * normalize → cosine — is replayable in any SQL engine; q24's DuckDB
  * oracle replays exactly this. Cost shape: one md5 per token
  * (codegen'd), then dim×|tokens| integer probes per row — embedding
  * runs once per document at ingest, never in the per-pair hot loop,
  * and |tokens| is bounded by the 150-char truncate. */
class Md5HashingEmbedder(dim: Int = 64, maxTextLength: Int = 150) extends Embedder {
  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    def bucket(t: Column): Column =
      pmod(conv(substring(md5(t), 1, 14), 16, 10).cast("long"), lit(dim.toLong))
    val buckets = transform(
      GraftUdfs.tokensCleanDedup(col(textCol), lit(maxTextLength)),
      t => bucket(t))
    // one-pass histogram expression, NOT a per-bucket filter chain:
    // CollapseProject would inline `buckets` (tokenizer UDF + md5 per
    // token) into every per-bucket probe — 64× the tokenize+hash work
    // per row (measured 2.4× on the whole flagship). BucketCountsExpr
    // evaluates its child once.
    val counts = toColumn(
      graft.functions.BucketCountsExpr(toExpression(buckets), dim))
    df.withColumn(outCol, VectorOps.normalize(counts))
  }
}

/** Trained Word2Vec embedder — the "MLlib embeddings" option of
  * SURVEY §2.6 T4: a learned distributed representation standing in
  * for the reference's externally-supplied SentenceTransformer
  * (`main.py:9,67`), where [[HashingEmbedder]] is the stateless one.
  *
  * Train/apply split mirrors the reference's own lifecycle (SBERT is
  * fit elsewhere, applied here): [[Word2VecEmbedder.fit]] learns the
  * vocabulary matrix once — at 100 TB you fit on a bounded sample or
  * the deduped corpus, never the raw stream — and the resulting
  * embedder applies it as one distributed transform. The model state
  * is a |vocab|×dim float matrix that MLlib broadcasts to executors;
  * transform averages the word vectors of each document's cleaned
  * token sequence (OOV tokens ignored, all-OOV → zero vector, which
  * the cosine kernel's zero-norm guard already handles), then
  * L2-normalizes like every other live embedder here.
  *
  * Determinism: fixed seed + numPartitions=1 training makes the fit
  * reproducible for a given corpus (pinned by EmbedderSpec); the
  * transform itself is a pure broadcast lookup.
  */
class Word2VecEmbedder private (
    model: org.apache.spark.ml.feature.Word2VecModel,
    maxTextLength: Int) extends Embedder {

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val tokCol = outCol + "__tokens"
    val rawCol = outCol + "__raw"
    val withTokens = df.withColumn(
      tokCol, GraftUdfs.tokensCleanDedup(col(textCol), lit(maxTextLength)))
    model.setInputCol(tokCol).setOutputCol(rawCol)
      .transform(withTokens)
      .withColumn(outCol, VectorOps.normalize(vector_to_array(col(rawCol))))
      .drop(tokCol, rawCol)
  }

  /** The learned vector for one vocabulary word (test/diagnostic). */
  def wordVector(word: String): Option[Array[Double]] = {
    import org.apache.spark.ml.linalg.Vector
    val rows = model.getVectors.filter(col("word") === word)
      .select("vector").collect()
    rows.headOption.map(_.getAs[Vector](0).toArray)
  }

  /** The full fitted vocabulary matrix, word-sorted — vocab-sized by
    * the fit contract (catalog/sample corpora), so the collect is
    * bounded. Doubles are the exact widenings of the stored float
    * weights. */
  def vocabVectors: Seq[(String, Array[Double])] = {
    import org.apache.spark.ml.linalg.Vector
    model.getVectors.collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Vector]("vector").toArray)
      .sortBy(_._1).toSeq
  }
}

object Word2VecEmbedder {
  /** Fit the vocabulary matrix on `corpus(textCol)` with the same
    * clean-dedup tokenization the embed path applies. */
  def fit(corpus: DataFrame, textCol: String, dim: Int = 64, seed: Long = 42L,
          minCount: Int = 1, maxIter: Int = 1,
          maxTextLength: Int = 150): Word2VecEmbedder = {
    val tokens = corpus.select(
        GraftUdfs.tokensCleanDedup(col(textCol), lit(maxTextLength)).as("__tokens"))
      // canonical sentence order: single-partition SGD is sequential,
      // so the FIT depends on the order sentences arrive — which
      // upstream partitioning would otherwise dictate (a repartitioned
      // corpus trained different vectors). Sorting by sentence content
      // then merging the sorted ranges order-preservingly makes the
      // model a pure function of the corpus CONTENT (equal sentences
      // are interchangeable); the fit corpus is bounded by contract,
      // so the sort is catalog-sized. EmbedderSpec pins
      // repartition-invariance.
      .orderBy(concat_ws(" ", col("__tokens")))
      .coalesce(1)
    val w2v = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("__tokens").setOutputCol("__vec")
      .setVectorSize(dim).setSeed(seed).setMinCount(minCount)
      .setMaxIter(maxIter)
      // one training partition: Word2Vec's per-partition SGD merges
      // nondeterministically across partitions; the corpora this fits
      // on are bounded (sample/catalog), so determinism wins
      .setNumPartitions(1)
    new Word2VecEmbedder(w2v.fit(tokens), maxTextLength)
  }

  /** The 100 TB fit contract, composed explicitly: train on a
    * DETERMINISTIC `num/den` sample of the corpus
    * ([[graft.operators.Curation.deterministicSample]] — salted-md5
    * membership, partition-invariant, stable under corpus growth) so
    * the fitted vocabulary is reproducible run-to-run and machine-to-
    * machine even as the corpus is re-partitioned or appended. The
    * single-partition SGD then runs over a bounded sample, never the
    * raw corpus. */
  def fitSampled(corpus: DataFrame, textCol: String, idCol: String,
                 num: Int, den: Int, dim: Int = 64, seed: Long = 42L,
                 minCount: Int = 1, maxIter: Int = 1,
                 maxTextLength: Int = 150,
                 salt: String = "w2vfit"): Word2VecEmbedder =
    fit(graft.operators.Curation.deterministicSample(corpus, idCol, num, den, salt),
      textCol, dim, seed, minCount, maxIter, maxTextLength)
}

/** Trained-vocabulary embedder with EXACT replay arithmetic: applies
  * a frozen word-vector matrix (typically a fitted
  * [[Word2VecEmbedder]]'s, quantized) through
  * [[graft.functions.VocabAvgExpr]] — clean-dedup tokens → mean of
  * in-vocab word vectors (MLlib transform semantics: denominator is
  * the full token count) → L2 normalize.
  *
  * Quantizing each vocabulary weight to the nearest multiple of
  * 2^-scaleBits makes every per-dimension token sum exact in double
  * arithmetic (≲ 30 significant bits per addend, ≤ ~75 addends —
  * far under the 53-bit mantissa), so the sum is order-free and a SQL
  * engine recomputes it bit-identically with a plain aggregate; the
  * remaining ops (× (1/n), norm, divide) are single correctly-rounded
  * IEEE steps both engines share. This is what turns the trained
  * flagship (q44) from rows-only into a full hash-checked query: the
  * frozen matrix is exported as a generated-VALUES oracle table.
  *
  * The quantization error (≤ 2^-21 per weight ≈ 5e-7 relative) is
  * orders below any semantic effect on cosine ranking — the same
  * trade [[graft.functions.VectorOps.quantizeInt8]] makes far more
  * aggressively for storage.
  */
class QuantizedVocabEmbedder(
    val vocab: Seq[(String, Array[Double])],
    dim: Int,
    maxTextLength: Int = 150) extends Embedder {

  require(vocab.forall(_._2.length == dim),
    s"every vocabulary vector must have exactly dim=$dim components " +
      "(a mismatch would silently truncate or crash per-row in executors)")

  private val lookup: Map[String, Array[Double]] = vocab.toMap

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    val tokCol = outCol + "__tokens"
    df.withColumn(tokCol,
        GraftUdfs.tokensCleanDedup(col(textCol), lit(maxTextLength)))
      .withColumn(outCol, VectorOps.normalize(toColumn(
        graft.functions.VocabAvgExpr(toExpression(col(tokCol)), lookup, dim))))
      .drop(tokCol)
  }
}

object QuantizedVocabEmbedder {
  /** Quantize a fitted Word2Vec vocabulary to multiples of
    * 2^-scaleBits. scaleBits=20 keeps ~6 decimal digits of each
    * weight while guaranteeing exact token sums. */
  def fromWord2Vec(w2v: Word2VecEmbedder, dim: Int,
                   scaleBits: Int = 20,
                   maxTextLength: Int = 150): QuantizedVocabEmbedder = {
    val scale = math.pow(2.0, scaleBits)
    val q = w2v.vocabVectors.map { case (w, v) =>
      // + 0.0 canonicalizes -0.0 (a tiny negative weight rounds to
      // -0.0, whose sign would survive a single-addend SQL sum but
      // not the JVM's 0.0-seeded fold)
      w -> v.map(x => math.rint(x * scale) / scale + 0.0)
    }
    new QuantizedVocabEmbedder(q, dim, maxTextLength)
  }
}

/** Fixture-backed embedder: joins pre-computed vectors by text key —
  * the Spark analog of the reference's frozen golden embeddings
  * (`asctb_reference_embeddings/ASCTB_Lungv1_2.csv`). The lookup is
  * broadcast (reference tables are small by construction — 83 rows
  * for Lung v1.2). */
class FrozenEmbedder(lookup: DataFrame, keyCol: String, vecCol: String) extends Embedder {
  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.join(
      broadcast(lookup.select(col(keyCol).as(textCol), col(vecCol).as(outCol))),
      Seq(textCol), "left")
}
