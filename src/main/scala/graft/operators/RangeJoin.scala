package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval (range) join — all pairs with equal keys and
  * `rightTime ∈ [leftTime + lowerOffset, leftTime + upperOffset]`
  * (inclusive integer bounds).
  *
  * Spark plans a raw inequality join as a broadcast-nested-loop —
  * O(|L|·|R|) per key and a single-task broadcast wall at scale. The
  * classic fix: quantize time into buckets as wide as the admissible
  * interval, replicate each RIGHT row into the (at most two)
  * consecutive buckets its admissible left times span, and join on
  * `(key, bucket)` EQUALITY — a plain shuffled hash join — then
  * apply the exact range predicate. Each qualifying pair meets in
  * exactly one bucket (a left row has one bucket), so no post-join
  * dedup exists; the false-positive factor is bounded by the 2×
  * replication, not by data.
  *
  * The shuffle is keyed on `(key, bucket)` — TIME spreads one hot key
  * across partitions, a strictly better skew posture than any
  * key-only join (the as-of join's single-key sort included).
  *
  * Time columns are integers in one shared unit (epoch micros in the
  * harness queries); negative values floor correctly.
  */
object RangeJoin {

  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   lowerOffset: Long, upperOffset: Long): DataFrame = {
    require(lowerOffset <= upperOffset, "need lowerOffset <= upperOffset")
    val width = upperOffset - lowerOffset + 1 // [lower, upper] spans width values
    val clash = right.columns.intersect(left.columns)
    require(clash.isEmpty,
      s"left/right column names clash: ${clash.mkString(", ")}")

    // exact integer floor division (pmod is non-negative; `div` stays
    // in long arithmetic — no double rounding at any magnitude)
    def fdiv(e: String): Column =
      expr(s"(($e) - pmod(($e), ${width}L)) div ${width}L")

    val l = left.withColumn("__lb", fdiv(s"`$leftTime`"))
    // right row at time t matches left times in [t - upper, t - lower],
    // an inclusive span of exactly `width` values -> <= 2 consecutive buckets
    val r = right.withColumn("__rb",
      explode(array_distinct(array(
        fdiv(s"`$rightTime` - ${upperOffset}L"),
        fdiv(s"`$rightTime` - ${lowerOffset}L")))))

    l.join(r,
        col(leftKey) === col(rightKey) &&
          col("__lb") === col("__rb") &&
          col(rightTime) >= col(leftTime) + lowerOffset &&
          col(rightTime) <= col(leftTime) + upperOffset)
      .drop("__lb", "__rb")
  }
}
