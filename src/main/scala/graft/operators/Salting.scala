package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key-safe aggregation: the salting guard for aggregate skew,
  * completing the skew toolkit beside the as-of bucketing (hot-key
  * joins) and the banded-LSH caps (hot buckets).
  *
  * Spark's hash aggregate already does map-side partial aggregation,
  * which handles MOST aggregate skew — but when the number of groups
  * is tiny (one global counter, a handful of event types) the FINAL
  * aggregation lands each group on one reducer, and any per-group
  * post-processing (e.g. a distinct-count or collect inside the
  * group) serializes on the hot key. Salting splits each group into
  * `buckets` sub-groups on a row-derived salt, aggregates partials,
  * then merges the partials with a second tiny aggregate — the
  * classic two-phase rewrite, valid for any ASSOCIATIVE aggregate.
  * Results are EXACTLY the plain aggregate's (integer sums and
  * counts commute), which is what the q137 oracle states. */
object Salting {

  /** Two-phase salted sum/count per key. `saltOf` must be a
    * deterministic row expression (the default hashes the value
    * column) so re-runs produce identical partials; the final merge
    * is bucket-count-sized per key. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: Column,
                     buckets: Int, saltOf: Option[Column] = None): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    // pmod alone normalizes negative hashes (abs() would overflow on
    // Int.MinValue anyway)
    val salt = saltOf.getOrElse(
      pmod(hash(valueCol).cast("long"), lit(buckets.toLong)))
    df.select(col(keyCol), valueCol.as("__v"), salt.as("__salt"))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col("__v")).as("__ps"), count(lit(1)).as("__pc"))
      .groupBy(col(keyCol))
      .agg(sum(col("__ps")).as("sum_v"), sum(col("__pc")).as("n_rows"))
  }
}
