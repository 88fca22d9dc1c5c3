package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftUdfs, TopKByScoreAgg, VectorOps}

/** The flagship label-mapping query: raw labels → top-k reference
  * matches → wide translation report with exact-match overwrite.
  *
  * Re-expresses `main.py:171-221` (per-label python loop, per-label
  * cosine against a re-stacked reference matrix, boolean-mask scatter,
  * 10 isin-mask passes for the exact overwrite) as ONE distributed
  * pass:
  *
  *   labels → cleanLabel → embed → crossJoin(broadcast(ref))
  *          → cosine → window top-k → rank pivot → exact-overwrite join
  *
  * Physical profile: 2 broadcasts (reference table; exact-match
  * lookup), 1 shuffle (hash partition by query label — the top-k
  * aggregate reuses the upstream distinct's partitioning), no other
  * wide ops, and no sort of the candidate set anywhere. The query
  * side stays distributed — at 100 TB of labels this scales linearly
  * with executors; the reference side is broadcast (reference tables
  * are catalog-sized by construction: 83 rows for Lung v1.2).
  *
  * Session note: raise
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (128
  * by default) — the bounded top-k aggregate runs on
  * ObjectHashAggregateExec, and the default threshold silently falls
  * back to sort-based aggregation beyond 128 groups per partition,
  * re-introducing the sort this operator is designed to avoid.
  */
object Matcher {

  /** Prepare a reference table for matching: stable row id (the
    * reference relies on pandas positional order for tie-breaks,
    * `main.py:91-97`; we freeze an explicit id), cleaned CT_NAME for
    * exact matching (`main.py:139`), pre-computed vector norm so the
    * per-pair kernel is one dot product.
    *
    * `ref` must have columns CT_ID, CT_NAME, all_text, definition and
    * `vecCol`; `orderCols` fixes what "first row" means (file order
    * in the reference — pass an explicit ordering for determinism).
    *
    * `cleaner` is the label-normalisation stage applied to CT_NAME for
    * exact matching — a pluggable seam like the embedder. Production
    * default is the full reference NLP pipeline
    * (`nlp_preprocessing.py:86-99`); the frozen-vector oracle variant
    * (q40) injects a SQL-expressible cleaner so DuckDB can replay the
    * whole matcher.
    */
  def prepareReference(ref: DataFrame, vecCol: String, orderCols: Seq[String],
                       cleaner: Column => Column = GraftUdfs.cleanLabel(_),
                       maxCatalogRows: Int = 1 << 20): DataFrame = {
    // ref_row_id is a GLOBAL row_number — a single-partition sort —
    // because the reference's tie-breaks are positional file order
    // (`main.py:91-97`). That is only sane for catalog-sized
    // references (83 rows for Lung v1.2), which the rest of the
    // matcher broadcasts anyway. Fail loudly on a corpus-sized input
    // instead of silently one-task-sorting it. (Corpus-scale global
    // ordinals, where genuinely needed, are Layout.globalOrdinals —
    // range-partitioned offset attach, no SinglePartition sort.) The guard is folded
    // into the row_number projection itself (raise_error past the
    // limit) — zero extra Spark jobs per invocation, and the failure
    // still fires on the first action before any downstream work
    // consumes an over-sized broadcast.
    val w = Window.orderBy(orderCols.map(col): _*)
    val rid = row_number().over(w).cast("long")
    val guarded = when(rid <= lit(maxCatalogRows.toLong), rid)
      .otherwise(raise_error(lit(
        s"prepareReference: reference table exceeds $maxCatalogRows rows — it must be " +
          "catalog-sized (it is broadcast and globally row-numbered). For corpus-scale " +
          "similarity use Ann.bruteForceTopK/ivfTopK instead.")).cast("long"))
    ref
      .withColumn("ref_row_id", guarded)
      .withColumn("CT_NAME_CLEANED", cleaner(col("CT_NAME")))
      .withColumn("ref_norm", VectorOps.l2Norm(col(vecCol)))
  }

  /** queries: (source, raw_input_label, cleaned_input_label, qvec) —
    * cleaned+embedded upstream so any [[graft.embed.Embedder]] plugs in.
    * ref: output of [[prepareReference]].
    * Returns the wide report of FIXTURES.md §4 / `main.py:194-211`.
    */
  def mapLabels(queries: DataFrame, ref: DataFrame, k: Int,
                vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val qNorm = queries.withColumn("q_norm", VectorOps.l2Norm(col("qvec")))

    // one distributed similarity pass replaces the reference's
    // per-label python loop (`main.py:198-211`). Only (ref_row_id,
    // score) ride along — the reference's display attributes join
    // back AFTER top-k, so the |Q|·|C| sort never carries strings.
    val scored = qNorm.crossJoin(
        broadcast(ref.select(
          col("ref_row_id"), col(vecCol).as("ref_vec"), col("ref_norm"))))
      .withColumn("score",
        VectorOps.cosineWithNorms(col("qvec"), col("q_norm"), col("ref_vec"), col("ref_norm")))
      .drop("qvec", "q_norm", "ref_vec", "ref_norm")

    // top-k with the reference's deterministic tie-break: numpy
    // argsort stability ⇒ lower reference row index wins (`main.py:91`).
    // A bounded-heap AGGREGATE ([[TopKByScoreAgg]]) replaces the
    // row_number window: the window form must sort every query's full
    // |C| candidate list before WindowGroupLimit truncates (the
    // dominant flagship cost — a |Q|·|C|-row per-partition sort),
    // while the aggregate streams candidates through a k-entry state
    // with map-side partial merge. The upstream distinct's hash
    // partitioning on (source, raw_input_label) satisfies the
    // grouping, so NO new exchange appears — one shuffle end to end.
    val agged = scored
      .groupBy(col("source"), col("raw_input_label"), col("cleaned_input_label"))
      .agg(TopKByScoreAgg.topK(col("score"), col("ref_row_id"), k).as("__topk"))

    // rank pivot is now a flat projection: element r of the sorted
    // top-k array IS rank r (`main.py:207-211`'s wide columns), and
    // each rank's display attributes join back from the broadcast
    // reference — |Q| rows × k tiny joins, not a second aggregate.
    val withRanks = (1 to k).foldLeft(agged) { (df, i) =>
      val e = get(col("__topk"), lit(i - 1)) // null-safe past-the-end
      df.withColumn(s"match_score_$i", e.getField("score"))
        .withColumn(s"__ref_id_$i", e.getField("id"))
    }.drop("__topk")
    val fetched = (1 to k).foldLeft(withRanks) { (df, i) =>
      df.join(
        broadcast(ref.select(
          col("ref_row_id").as(s"__ref_id_$i"),
          col("CT_ID").as(s"matched_asctb_id_$i"),
          col("CT_NAME").as(s"matched_asctb_label_$i"),
          col("all_text").as(s"matched_asctb_text_$i"))),
        Seq(s"__ref_id_$i"), "left")
    }
    val renamed = fetched.select(
      Seq(col("source"), col("raw_input_label"), col("cleaned_input_label")) ++
        (1 to k).flatMap(i => Seq(
          col(s"match_score_$i"), col(s"matched_asctb_id_$i"),
          col(s"matched_asctb_label_$i"), col(s"matched_asctb_text_$i"))): _*)

    overwriteExactMatches(renamed, ref, k)
  }

  /** Exact-match overwrite (`main.py:126-166`): where the cleaned
    * input label equals a cleaned reference CT_NAME, slot 1 becomes
    * the exact match with score 1.0 and slots 2..k are nulled. The
    * reference's first-row-wins duplicate semantics
    * (`.values[0]`, `main.py:119`) become row_number()==1 over
    * ref_row_id. Its quirk of writing `definition` (not `all_text`)
    * into matched_asctb_text_1 on the exact path (`main.py:97` vs
    * `:145`) is reproduced.
    */
  def overwriteExactMatches(report: DataFrame, ref: DataFrame, k: Int): DataFrame = {
    val firstPerName = Window.partitionBy(col("CT_NAME_CLEANED"))
      .orderBy(col("ref_row_id").asc)
    val exact = broadcast(
      ref.select(col("CT_NAME_CLEANED"), col("CT_ID"), col("CT_NAME"),
          col("definition"), col("ref_row_id"))
        .withColumn("rn", row_number().over(firstPerName))
        .filter(col("rn") === 1)
        .select(
          col("CT_NAME_CLEANED").as("__exact_key"),
          col("CT_ID").as("__exact_id"),
          col("CT_NAME").as("__exact_name"),
          col("definition").as("__exact_def")))

    val joined = report.join(exact,
      report("cleaned_input_label") === exact("__exact_key"), "left")
    val matched = col("__exact_key").isNotNull

    val overwritten = joined
      .withColumn("match_score_1",
        when(matched, lit(1.0)).otherwise(col("match_score_1")))
      .withColumn("matched_asctb_id_1",
        when(matched, col("__exact_id")).otherwise(col("matched_asctb_id_1")))
      .withColumn("matched_asctb_label_1",
        when(matched, col("__exact_name")).otherwise(col("matched_asctb_label_1")))
      .withColumn("matched_asctb_text_1",
        when(matched, col("__exact_def")).otherwise(col("matched_asctb_text_1")))
    val nulled = (2 to k).foldLeft(overwritten) { (df, i) =>
      df.withColumn(s"match_score_$i",
          when(matched, lit(null).cast("double")).otherwise(col(s"match_score_$i")))
        .withColumn(s"matched_asctb_id_$i",
          when(matched, lit(null).cast("string")).otherwise(col(s"matched_asctb_id_$i")))
        .withColumn(s"matched_asctb_label_$i",
          when(matched, lit(null).cast("string")).otherwise(col(s"matched_asctb_label_$i")))
        .withColumn(s"matched_asctb_text_$i",
          when(matched, lit(null).cast("string")).otherwise(col(s"matched_asctb_text_$i")))
    }

    val reportCols =
      Seq("source", "raw_input_label", "cleaned_input_label") ++
        (1 to k).flatMap(i => Seq(
          s"match_score_$i", s"matched_asctb_id_$i",
          s"matched_asctb_label_$i", s"matched_asctb_text_$i"))
    nulled.select(reportCols.map(col): _*)
  }
}
