package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** First-match banded self-join — the shared candidate-pair kernel of
  * the MinHash-LSH, sign-LSH and SimHash near-dup paths (the
  * OR-amplified r-of-L construction all three instantiate).
  *
  * Input: one row per id with its per-band bucket array `bks`
  * (element type free — md5 strings, sign-bucket longs, simhash slice
  * keys). Output: every same-bucket pair exactly once, emitted by the
  * lowest agreeing band (a cheap per-pair predicate over the carried
  * arrays — no cross-band `distinct`, whose shuffle input at scale is
  * every duplicate candidate occurrence).
  *
  * With `maxBucketSize`, buckets over the cap emit no pairs — the
  * hot-bucket skew guard: a degenerate bucket (boilerplate, empty
  * documents, zero vectors) otherwise produces |bucket|² output rows
  * inside one shuffle partition, a blowup no AQE skew split can
  * parallelise because it is the OUTPUT, not the partition layout.
  * A pair then survives iff SOME band puts both ids in a small-enough
  * bucket; the first-match predicate treats hot earlier bands as
  * non-emitting via carried per-band size arrays (`szs`). The hot set
  * is never collected to the driver. The identical-signature mass a
  * cap suppresses is recovered linearly by
  * [[Dedup.exactSignatureDuplicates]].
  */
object Banding {

  /** Candidate pairs (id_a, id_b) from `src` = one row per id with
    * columns (`idCol`, `bks: array[numBands]`). */
  def firstMatchPairs(src: DataFrame, idCol: String, numBands: Int,
                      maxBucketSize: Option[Int] = None): DataFrame = {
    val exploded = src.select(col(idCol), col("bks"),
      posexplode(col("bks")).as(Seq("band", "bucket")))
    val banded = maxBucketSize match {
      case None => exploded
      case Some(cap) =>
        require(cap >= 2, "a bucket of 2 is the smallest that can pair")
        // per-(band, bucket) member counts — same shuffle key as the
        // pair join below, co-partitioned
        val sizes = exploded.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("bsz"))
        // per-id size array aligned with bks, carried into the join so
        // the first-match predicate can see earlier bands' hotness.
        // bks joins the grouping key (functionally dependent on the
        // id) so every aggregate buffer stays a primitive long —
        // HashAggregate, not the SortAggregate a first(array) buffer
        // would force.
        exploded.join(sizes, Seq("band", "bucket"))
          .groupBy(col(idCol), col("bks"))
          .agg(array((0 until numBands).map(t =>
            max(when(col("band") === t, col("bsz")))): _*).as("szs"))
          .select(col(idCol), col("bks"), col("szs"),
            posexplode(col("bks")).as(Seq("band", "bucket")))
          .filter(element_at(col("szs"), col("band") + 1) <= cap)
    }
    val hotEscape: Int => Column = maxBucketSize match {
      case None      => _ => lit(false)
      case Some(cap) => t => element_at(col("a.szs"), t + 1) > cap
    }
    // emit only from the first agreeing (and, under a cap, small
    // enough) band: every earlier band must differ or be capped out
    val firstMatch = (0 until numBands - 1)
      .map { t =>
        (col("a.band") <= t) ||
          (element_at(col("a.bks"), t + 1) =!= element_at(col("b.bks"), t + 1)) ||
          hotEscape(t)
      }
      .foldLeft(lit(true))(_ && _)
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol") && firstMatch)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
  }
}
