package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    require(leftCol != rightCol,
      s"leftCol and rightCol must differ (both '$leftCol'): rename one side")
    val clash = right.columns.intersect(left.columns)
    require(clash.isEmpty,
      s"left/right column names clash: ${clash.mkString(", ")}")
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

  /** Segment-blocked edit-distance join (PassJoin-style) — the scale
    * path when VALUES are high-cardinality and length blocking alone
    * leaves huge length classes: by pigeonhole, two strings within
    * edit distance d agree EXACTLY on at least one of the d+1
    * even-partition segments of the right string (alignment shifts a
    * segment's position by at most d). The right side emits its d+1
    * segments; the left side emits every substring a segment could
    * occupy (segment index × target length ±d × shift ±d — a
    * constant ≈ (d+1)(2d+1)² keys per row); candidacy is an EQUALITY
    * join on (substring, segment, target length) — selective content
    * keys, not length classes — and bounded-threshold levenshtein
    * verifies. Output identical to [[editDistanceJoin]].
    */
  def editDistanceJoinSegmented(left: DataFrame, right: DataFrame,
                                leftCol: String, rightCol: String,
                                maxDist: Int): DataFrame = {
    require(maxDist >= 1, "use an equality join for maxDist = 0")
    require(leftCol != rightCol,
      s"leftCol and rightCol must differ (both '$leftCol'): rename one side")
    val nSeg = maxDist + 1
    val clash = right.columns.intersect(left.columns)
    require(clash.isEmpty,
      s"left/right column names clash: ${clash.mkString(", ")}")

    def segStart(len: Column, j: Int): Column = floor(len * j / nSeg).cast("int")
    def segLen(len: Column, j: Int): Column =
      segStart(len, j + 1) - segStart(len, j)

    // right: its own d+1 segments, keyed by (segment text, j, own length)
    val rLen = length(col(rightCol))
    val rKeys = (0 until nSeg).map { j =>
      struct(
        substring(col(rightCol), segStart(rLen, j) + 1, segLen(rLen, j).cast("int"))
          .as("seg"),
        lit(j).as("j"), rLen.as("target_len"))
    }
    val rVals = right.select(col(rightCol)).distinct()
      .select(col(rightCol), explode(array(rKeys: _*)).as("__k"))
      // zero-length segments (very short strings) carry no signal
      .filter(length(col("__k.seg")) > 0)

    // left: every substring a segment of a right string of length
    // M±maxDist could occupy, shifted by up to ±maxDist
    val lLen = length(col(leftCol))
    val lKeys = for {
      delta <- -maxDist to maxDist
      j <- 0 until nSeg
      shift <- -maxDist to maxDist
    } yield {
      val tLen = lLen + delta
      val p = segStart(tLen, j) + shift
      val sl = segLen(tLen, j).cast("int")
      when(tLen >= 1 && p >= 0 && sl > 0 && p + sl <= lLen,
        struct(substring(col(leftCol), p + 1, sl).as("seg"),
          lit(j).as("j"), tLen.as("target_len")))
    }
    val lVals = left.select(col(leftCol)).distinct()
      .select(col(leftCol),
        explode(array_distinct(array(lKeys: _*))).as("__k"))
      .filter(col("__k").isNotNull)

    val segPairs = lVals.join(rVals, lVals("__k") === rVals("__k"))
      .select(col(leftCol), col(rightCol))

    // strings shorter than d+1 chars have zero-length segments and no
    // pigeonhole guarantee — pair them against all short-enough lefts
    // directly (a negligible slice: lengths <= 2d)
    val tinyPairs = left.select(col(leftCol)).distinct()
      .filter(length(col(leftCol)) <= 2 * maxDist)
      .crossJoin(broadcast(right.select(col(rightCol)).distinct()
        .filter(length(col(rightCol)) <= maxDist)))
      .select(col(leftCol), col(rightCol))

    val pairs = segPairs.unionByName(tinyPairs).distinct()
      .withColumn("dist", levenshtein(col(leftCol), col(rightCol), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
    left.join(pairs, leftCol).join(right, rightCol)
  }
}
