package graft.operators

import org.apache.spark.sql.DataFrame
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
}
