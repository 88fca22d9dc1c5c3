package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) join — all pairs with
  * `levenshtein(left, right) <= maxDist`. Entity-resolution lite:
  * matching noisy labels/titles against a canonical catalog.
  *
  * Blocking reuses [[RangeJoin.intervalJoin]] on STRING LENGTH:
  * `|len(a) − len(b)| <= maxDist` is a necessary condition for edit
  * distance ≤ maxDist, and it is exactly an interval join with
  * offsets ±maxDist — candidate pairs form per (length-bucket) hash
  * partitions, never a full cross join. The exact verify uses
  * Spark's bounded `levenshtein(l, r, threshold)` (early-exits past
  * the threshold, returns −1 — the hot loop never computes a full
  * distance matrix for far pairs).
  *
  * Length blocking alone admits every same-length pair as a
  * candidate; production entity resolution adds a content prefilter
  * (q-gram prefix or [[Dedup.shingles]]-Jaccard banding — both here)
  * in front when a length class is large. The necessary-condition
  * structure (and this operator's output) is identical either way.
  */
object FuzzyJoin {

  def editDistanceJoin(left: DataFrame, right: DataFrame,
                       leftCol: String, rightCol: String,
                       maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    // distance is a function of the VALUES: compute it once per
    // distinct (left, right) value pair, then expand back through two
    // hash joins. Real catalogs repeat labels massively (20k rows / 64
    // names in the harness part table), so the quadratic levenshtein
    // work shrinks by the duplication factor squared while the
    // expansion joins stay plain value-keyed hash joins.
    val lVals = left.select(col(leftCol)).distinct()
      .withColumn("__llen", length(col(leftCol)).cast("long"))
      .withColumn("__lk", lit(0))
    val rVals = right.select(col(rightCol)).distinct()
      .withColumn("__rlen", length(col(rightCol)).cast("long"))
      .withColumn("__rk", lit(0))
    val d = levenshtein(col(leftCol), col(rightCol), maxDist)
    val pairs = RangeJoin.intervalJoin(lVals, rVals, "__lk", "__rk",
        "__llen", "__rlen", -maxDist.toLong, maxDist.toLong)
      .withColumn("dist", d)
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col(leftCol), col(rightCol), col("dist"))
    left.join(pairs, leftCol).join(right, rightCol)
  }
}
