package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Late-interaction (ColBERT-style MaxSim) retrieval scoring
  * (Khattab & Zaharia 2020): instead of one vector per document,
  * every TOKEN keeps its own representation and
  * `score(q, d) = Σ_{t∈q} max_{u∈d} cos(e_t, e_u)` — each query
  * token independently finds its best-matching doc token, so partial
  * phrase matches score even when whole-doc vectors wash them out.
  *
  * Token representations here are hashed CHAR-TRIGRAM TF vectors
  * (the fastText-subword idea on the engine's md5 bucket kernel —
  * `pmod(conv(md5[1:14], 16, 10), dim)`, the q24 discipline): integer
  * gram counts per bucket, so the token-pair cosine is ONE fixed
  * double expression `dot / (sqrt(n²_t)·sqrt(n²_u))` over exact
  * integer aggregates, replayable verbatim in SQL. Per-token MaxSim
  * is micro-quantized, the per-doc score is an exact integer sum.
  *
  * Scale shape — the bucket join IS the inverted index: token pairs
  * meet through an equi-join on (gram bucket), never a cross join,
  * so a doc sharing no hashed gram with any query token is never a
  * candidate (score-0 by contract). Tokens are capped at the first
  * `maxTokens` DISTINCT per document (positional order), bounding
  * every downstream row count at tokens² per COLLIDING pair. */
object LateInteraction {

  private def bucket(t: Column, dim: Int): Column =
    pmod(conv(substring(md5(t), 1, 14), 16, 10).cast("long"),
      lit(dim.toLong))

  /** First `maxTokens` distinct lowered whitespace tokens of each
    * doc, in first-occurrence order. */
  private def topTokens(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, outId: String): DataFrame = {
    val w = Window.partitionBy(col(outId))
      .orderBy(col("__minpos").asc)
    df.select(col(idCol).as(outId),
        posexplode(split(lower(col(textCol)), "\\s+"))
          .as(Seq("__pos", "__tok")))
      .filter(col("__tok") =!= "")
      .groupBy(col(outId), col("__tok"))
      .agg(min(col("__pos")).as("__minpos"))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= maxTokens)
      .select(col(outId), col("__tok"))
  }

  /** (id, tok, bucket, c) hashed char-trigram counts plus the exact
    * integer squared norm per token. */
  private def gramBuckets(toks: DataFrame, idCol: String,
      dim: Int): DataFrame = {
    val grams = when(length(col("__tok")) < 3, array(col("__tok")))
      .otherwise(expr(
        "transform(sequence(1, length(__tok) - 2), i -> substring(__tok, i, 3))"))
    val gb = toks
      .select(col(idCol), col("__tok"), explode(grams).as("__g"))
      .groupBy(col(idCol), col("__tok"),
        bucket(col("__g"), dim).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val norms = gb.groupBy(col(idCol), col("__tok"))
      .agg(sum(col("__c") * col("__c")).as("__n2"))
    gb.join(norms, Seq(idCol, "__tok"))
  }

  /** Top-`k` corpus docs per query doc by MaxSim. Output:
    * (q_id, rank, c_id, score_micros). */
  def maxSimTopK(queries: DataFrame, corpus: DataFrame,
      qIdCol: String, cIdCol: String, textCol: String,
      maxTokens: Int = 8, dim: Int = 64, k: Int = 3): DataFrame = {
    require(maxTokens >= 1 && dim >= 1 && k >= 1,
      "maxTokens, dim, k must be positive")
    val qg = gramBuckets(
        topTokens(queries, qIdCol, textCol, maxTokens, "q_id"), "q_id", dim)
      .toDF("q_id", "__qt", "__b", "__qc", "__qn2")
    val dg = gramBuckets(
        topTokens(corpus, cIdCol, textCol, maxTokens, "c_id"), "c_id", dim)
      .toDF("c_id", "__dt", "__b", "__dc", "__dn2")
    val d = (c: Column) => c.cast("double")
    val cos = qg.join(dg, Seq("__b"))
      .groupBy(col("q_id"), col("__qt"), col("__qn2"),
        col("c_id"), col("__dt"), col("__dn2"))
      .agg(sum(col("__qc") * col("__dc")).as("__dot"))
      .withColumn("__cos",
        d(col("__dot")) / (sqrt(d(col("__qn2"))) * sqrt(d(col("__dn2")))))
    val scored = cos
      .groupBy(col("q_id"), col("__qt"), col("c_id"))
      .agg(max(col("__cos")).as("__ms"))
      .withColumn("__msq", round(col("__ms") * 1e6).cast("long"))
      .groupBy(col("q_id"), col("c_id"))
      .agg(sum(col("__msq")).as("score_micros"))
    val idType = corpus.schema(cIdCol).dataType
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScoreAgg.topK(
        col("score_micros").cast("double"), col("c_id").cast("long"), k)
        .as("__tk"))
      .select(col("q_id"), posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(col("q_id"), (col("__pos") + 1).cast("long").as("rank"),
        col("__e.id").cast(idType).as("c_id"),
        col("__e.score").cast("long").as("score_micros"))
  }
}
