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
