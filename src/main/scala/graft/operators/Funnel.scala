package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered conversion funnel — per key, the earliest event time of
  * each stage subject to STRICTLY-AFTER-previous-stage ordering
  * (a click only counts after that user's first view; a purchase
  * only after that qualifying click). The event-analytics companion
  * to gap sessionization ([[graft.streaming.StreamOps.sessionize]]).
  *
  * Shape: one conditional min-aggregate per stage, chained. The
  * first `groupBy(key)` hash-partitions on the key; every later join
  * and aggregate is keyed on the SAME key, so Catalyst reuses that
  * exchange — the chain costs one shuffle of the filtered events per
  * stage over strictly SHRINKING inputs (stage k only carries keys
  * that reached stage k-1), never a per-key sort or a collected
  * event list. Irrelevant event types die at the scan via the
  * `isin` pushdown.
  */
object Funnel {

  /** @param stages ordered event-type names, at least two.
    * @return one row per key that reached stage 0:
    *         (keyCol, t_0 .. t_{n-1}, stages_reached) where t_i is
    *         the earliest stage-i time strictly after t_{i-1} (null
    *         once a stage is missed; later stages are then null too
    *         by construction). Time values pass through untyped —
    *         any orderable column works. */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    val base = events
      .select(col(keyCol).as("__k"), col(tsCol).as("__t"), col(typeCol).as("__e"))
      .filter(col("__e").isin(stages: _*))

    var acc = base.filter(col("__e") === stages.head)
      .groupBy(col("__k")).agg(min(col("__t")).as("t_0"))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val next = base.filter(col("__e") === st)
        .join(acc.select(col("__k"), col(s"t_${i - 1}")), "__k")
        .filter(col("__t") > col(s"t_${i - 1}"))
        .groupBy(col("__k")).agg(min(col("__t")).as(s"t_$i"))
      acc = acc.join(next, Seq("__k"), "left")
    }
    val reached = stages.indices
      .map(i => when(col(s"t_$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("stages_reached", reached.cast("long"))
      .withColumnRenamed("__k", keyCol)
  }

  /** MULTI-TOUCH ATTRIBUTION, linear model with exact-cents
    * accounting: every conversion's value splits evenly across the
    * key's touch events inside the lookback window `[t−window, t)`,
    * with the integer remainder credited to the LAST touch (latest
    * time, then highest id — deterministic), so per-conversion
    * credit sums to the conversion's cents EXACTLY. The marketing /
    * growth staple beside [[funnel]] and [[transitionMatrix]];
    * first- and last-touch credit are reported alongside for the
    * position-model comparison.
    *
    * Shape: conversions equi-join touches on the key (the window
    * bound is a post-join range predicate — per-key touch lists are
    * session-sized, the q57/q64 as-of/range discipline; at 100 TB
    * bucket both sides by key first), one per-conversion aggregate
    * (counts + min/max touch structs), then one per-key rollup. All
    * credit arithmetic is BIGINT floor division — order-free.
    *
    * Output per key: n_conversions, n_attributed (≥1 touch),
    * n_orphans, touches_total, attributed_cents (= Σ cents of
    * attributed conversions, proving the split loses nothing),
    * first_touch_cents, last_touch_cents. */
  def linearAttribution(events: DataFrame, keyCol: String,
      conversionType: String, touchType: String,
      tsCol: String, idCol: String, valueCol: Column,
      windowUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    val conv = events.filter(col("event_type") === conversionType)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ct"),
        col(idCol).as("__cid"), valueCol.cast("long").as("__cents"))
    val touch = events.filter(col("event_type") === touchType)
      .select(col(keyCol).as("__k"), col(tsCol).as("__tt"),
        col(idCol).as("__tid"))
    val joined = conv.join(touch, Seq("__k"), "left")
      .withColumn("__hit",
        col("__tt").isNotNull && col("__tt") < col("__ct") &&
          col("__tt") >= col("__ct") - lit(windowUs))
    val perConv = joined
      .groupBy(col("__k"), col("__cid"), col("__cents"))
      .agg(sum(when(col("__hit"), 1L).otherwise(0L)).as("__n_touch"))
    perConv
      .withColumn("__share",
        when(col("__n_touch") > 0, floor(col("__cents") / col("__n_touch"))
          .cast("long")).otherwise(lit(0L)))
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(when(col("__n_touch") > 0, 1L).otherwise(0L))
          .as("n_attributed"),
        sum(when(col("__n_touch") === 0, 1L).otherwise(0L))
          .as("n_orphans"),
        sum(col("__n_touch")).as("touches_total"),
        sum(when(col("__n_touch") > 0, col("__cents")).otherwise(lit(0L)))
          .as("attributed_cents"),
        sum(when(col("__n_touch") > 0, col("__share")).otherwise(lit(0L)))
          .as("first_touch_cents"),
        sum(when(col("__n_touch") > 0,
          col("__cents") - (col("__n_touch") - 1) * col("__share"))
          .otherwise(lit(0L))).as("last_touch_cents"))
      .withColumnRenamed("__k", keyCol)
  }

  /** First-order Markov TRANSITION MATRIX over per-key event
    * sequences: count every consecutive (from → to) event-type pair
    * under the per-key total order `orderCols`, then row-normalize
    * to integer-micro probabilities — the behavioral fingerprint
    * (session model, next-event predictor baseline, bot-vs-human
    * signature) of event analytics.
    *
    * Shape: one window `lead` per event (partitioned BY KEY — never
    * a global sort), one map-side-combined pair count bounded by
    * |types|², and a broadcast-sized row-total join. Probabilities
    * are `round(cnt·10⁶ / row_total)` in one multiply-divide of
    * exact-integer-valued doubles, so a cross-engine oracle states
    * the identical IEEE expression.
    *
    * `orderCols` must totally order each key's events (ties would
    * make `lead` nondeterministic). Output:
    * (from_type, to_type, n_trans, p_micro). */
  def transitionMatrix(events: DataFrame, keyCol: String,
      typeCol: String, orderCols: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val pairs = events
      .select(col(keyCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n_trans")).as("__tot"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        round(col("n_trans").cast("double") * lit(1000000.0)
          / col("__tot").cast("double")).cast("long").as("p_micro"))
  }

  /** SEQUENTIAL PATTERN support counts (the PrefixSpan question
    * answered relationally): for every ordered event-type pair
    * (t1, t2) and triple (t1, t2, t3), how many keys' event streams
    * contain it as a (gap-allowed) subsequence — behavioral motif
    * mining over clickstreams, the ordered sibling of q186's
    * unordered association rules.
    *
    * The enumerate-all-embeddings explosion is avoided by interval
    * logic on each key's per-type extremes: under the per-key total
    * order `orderCols` (rank rn), a pair (a, b) embeds iff
    * `first(a) < last(b)`, and a triple (a, b, c) embeds iff some
    * b-event lies strictly between `first(a)` and `last(c)` — which
    * reduces to `minAfter(a, b) < last(c)` where `minAfter(a, b)` =
    * the smallest b-rank after `first(a)`. Proof sketch: any such
    * b-event extends left to first(a) and right to last(c); and any
    * embedding's middle element is such a b-event.
    *
    * Shape: one per-key rank window (never global), per-(key, type)
    * min/max aggregates (map-combined, ≤ |types| rows per key),
    * then per-key joins bounded by |types|·events — linear in the
    * stream with a small-alphabet constant, and the final support
    * count is a (t1, t2[, t3]) groupBy over ≤ |types|³ keys.
    * `maxRank` truncates each stream to its first N events (the
    * analyst's window; also keeps dense streams from saturating
    * every pattern). Output: (t1, t2, t3, support), t3 null for
    * pairs, support ≥ `minSupport` keys, one row per pattern. */
  def sequentialPatterns(events: DataFrame, keyCol: String,
      typeCol: String, orderCols: Seq[Column], maxRank: Int,
      minSupport: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val ranked = events
      .select(col(keyCol).as("__k"), col(typeCol).as("__t"),
        row_number().over(w).as("__rn"))
      .filter(col("__rn") <= maxRank)
    val ext = ranked.groupBy(col("__k"), col("__t"))
      .agg(min(col("__rn")).as("__first"), max(col("__rn")).as("__last"))
    val pairs = ext.select(col("__k"), col("__t").as("t1"), col("__first"))
      .join(ext.select(col("__k"), col("__t").as("t2"), col("__last")),
        Seq("__k"))
      .filter(col("__first") < col("__last"))
    val pairSupport = pairs
      .groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("support"))
      .select(col("t1"), col("t2"), lit(null).cast("string").as("t3"),
        col("support"))
    // minAfter(a, b): smallest b-rank strictly after first(a)
    val minAfter = ext.select(col("__k"), col("__t").as("t1"), col("__first"))
      .join(ranked.select(col("__k"), col("__t").as("t2"), col("__rn")),
        Seq("__k"))
      .filter(col("__rn") > col("__first"))
      .groupBy(col("__k"), col("t1"), col("t2"))
      .agg(min(col("__rn")).as("__mid"))
    val tripleSupport = minAfter
      .join(ext.select(col("__k"), col("__t").as("t3"), col("__last")),
        Seq("__k"))
      .filter(col("__mid") < col("__last"))
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("support"))
      .select(col("t1"), col("t2"), col("t3"), col("support"))
    pairSupport.unionByName(tripleSupport)
      .filter(col("support") >= minSupport)
  }
}
