package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset curation for training pipelines: deterministic sampling
  * and train/validation/test splitting at corpus scale.
  *
  * Both are PURE PROJECTIONS over a content-independent md5 hash of
  * the document id — no shuffle, no RNG state, no sample() seed tied
  * to a partitioning: the same (id, salt) lands in the same
  * split/sample on any cluster, any partition layout, any Spark
  * version. That is the property a 100 TB corpus needs for
  * INCREMENTAL curation — newly crawled documents join the right
  * split on arrival and old documents never migrate, so a held-out
  * set stays held out across re-runs. (Spark's `df.sample` is
  * partition-dependent and re-rolls on every layout change — unusable
  * as a stable split.) md5 keeps it cross-engine-reproducible, the
  * same rationale as [[Dedup]].
  */
object Curation {

  /** 56-bit uniform hash of (salt, id) — the sampling coordinate.
    * Salt separates independent draws: a 10% sample with one salt and
    * a split with another are statistically independent. */
  def sampleHash(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), id.cast("string"))), 1, 14), 16, 10)
      .cast("long")

  /** Membership predicate of the deterministic `num/den` sample. */
  def inSample(id: Column, num: Int, den: Int, salt: String = "graft"): Column = {
    require(num >= 0 && num <= den && den > 0, "need 0 <= num <= den, den > 0")
    pmod(sampleHash(id, salt), lit(den.toLong)) < num.toLong
  }

  /** Keep a deterministic, partition-invariant `num/den` fraction. */
  def deterministicSample(df: DataFrame, idCol: String, num: Int, den: Int,
                          salt: String = "graft"): DataFrame =
    df.filter(inSample(col(idCol), num, den, salt))

  /** Split label for the given integer weights (e.g. train→90,
    * valid→5, test→5): cumulative ranges over pmod(hash, Σweights). */
  def splitLabel(id: Column, weights: Seq[(String, Int)],
                 salt: String = "graft"): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "need at least one positive weight")
    val total = weights.map(_._2).sum
    val h = pmod(sampleHash(id, salt), lit(total.toLong))
    val upperBounds = weights.map(_._2).scanLeft(0)(_ + _).tail
    weights.map(_._1).zip(upperBounds).init
      .foldRight(lit(weights.last._1): Column) { case ((name, ub), rest) =>
        when(h < ub.toLong, lit(name)).otherwise(rest)
      }
  }

  /** Assign every row its deterministic split label. */
  def deterministicSplit(df: DataFrame, idCol: String,
                         weights: Seq[(String, Int)],
                         salt: String = "graft",
                         outCol: String = "split"): DataFrame =
    df.withColumn(outCol, splitLabel(col(idCol), weights, salt))

  /** Concat-and-chunk sequence packing — the standard LLM-pretraining
    * batch prep: documents are laid out in deterministic id order and
    * chunked at `budget` tokens; `pack_id` is the training sequence a
    * document STARTS in and `pack_offset` its token position there
    * (documents may straddle pack boundaries, exactly as the
    * concatenated-corpus approach trains).
    *
    * Packing is a running sum, inherently sequential — so it runs
    * per `partCols` shard (split, language, bucket): one shuffle
    * keyed on the shard, each shard's window independent. A single
    * global pack stream would serialize the corpus through one
    * partition; per-shard packing is what a 100 TB pipeline does
    * anyway (each training shard is packed independently). */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, partCols: Seq[String]): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols.map(col): _*).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__start", sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("pack_id", floor(col("__start") / budget))
      .withColumn("pack_offset", col("__start") - col("pack_id") * budget)
      .drop("__start")
  }
}
