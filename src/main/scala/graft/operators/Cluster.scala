package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means as a relational fixpoint — the
  * TRAINING half of the IVF tier ([[Ann.trainCodebook]] delegates to
  * MLlib, whose float accumulation order is partition-dependent and
  * therefore can never hash-match a cross-engine oracle; this
  * operator is the certifiable path, the same treatment
  * [[Graph.pageRank]] gives link analysis). Semantic clustering is a
  * first-class curation primitive at 100 TB: topic balancing,
  * semantic dedup cells, and IVF index builds all start from "assign
  * every embedding to one of k centroids and re-estimate".
  *
  * Design for scale, in Spark terms:
  *   - The corpus never shuffles for ASSIGNMENT. Centroids are
  *     catalog-sized (k·dim longs) by contract, so each iteration
  *     folds them into ONE row (`collect_list` over k rows) that is
  *     broadcast and cross-joined — the argmin is a pure codegen'd
  *     higher-order `aggregate` over the carried centroid array, the
  *     same 1-row-build-side shape the corpus-stat scorers use
  *     (q60/q86/q104). No N-row exchange, no window.
  *   - The UPDATE shuffles (cell, dim) partial sums, not vectors:
  *     `posexplode` fans each vector into dim rows whose map-side
  *     partials bound the exchange at k·dim rows PER TASK regardless
  *     of corpus size; the per-cell mean is reassembled into an array
  *     with a k-row `collect_list`. Total per-iteration shuffle is
  *     O(k·dim·tasks) — invariant to N.
  *   - Determinism across engines and partitionings: coordinates are
  *     INTEGER MICROS (`round(x·10⁶)` longs). Squared-L2 distances
  *     are exact BIGINT sums (dim·(2·10⁶)² ≪ 2⁶³), argmin ties break
  *     to the lowest cell id, and each new coordinate is the one
  *     fixed double expression `round(sum/count)` — so a DuckDB
  *     oracle unrolling the same iterations hash-matches the whole
  *     trajectory, where raw float Lloyd's drifts with partition
  *     order.
  *   - Seeding is data-deterministic, not RNG: the k vectors with the
  *     smallest `md5(salt:id)` (a bottom-k `orderBy.limit`, no global
  *     window — cell ids come from `sort_array(collect_list(...))`
  *     inside the one folded row).
  *   - A cell that loses all members keeps its previous centroid
  *     (documented contract; matches the oracle's LEFT JOIN +
  *     coalesce).
  *
  * Iteration count is a parameter, not a convergence test, for the
  * same reason as [[Graph.pageRank]]: fixed budgets keep the plan
  * bounded; pass `checkpoint = true` for deep budgets to cut lineage
  * at each iteration instead of compounding joins.
  */
object Cluster {

  private val Micros = 1000000L

  /** Quantize an array<float|double> column to integer-micro longs. */
  def microQuantize(vec: Column): Column =
    transform(vec.cast("array<double>"),
      x => round(x * lit(Micros.toDouble)).cast("long"))

  /** Exact squared L2 distance between two array<long> columns. */
  def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  /** Exact squared-L2 distance of every vector to its OWN group's
    * centroid — the embedding-space outlier signal (mislabeled-sample
    * mining, semantic noise filtering: the farthest members of a
    * class/source cluster are the curation candidates). Centroids are
    * the same integer-micro means as [[kmeansMicro]]'s update step, so
    * distances are exact BIGINTs and cross-engine reproducible. The
    * centroid table is group-count-sized (catalog-sized by contract)
    * and broadcast; the corpus never shuffles — the only exchange is
    * the k·dim-bounded centroid aggregation itself.
    * Output: (groupCol, idCol, dist2_q). */
  def centroidDistances(vectors: DataFrame, idCol: String, vecCol: String,
      groupCol: String): DataFrame = {
    val reserved = vectors.columns.filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"column names starting with '__' are reserved: ${reserved.mkString(", ")}")
    val q = vectors.select(col(groupCol), col(idCol),
      microQuantize(col(vecCol)).as("__vq"))
    val cent = q
      .select(col(groupCol), posexplode(col("__vq")).as(Seq("__j", "__v")))
      .groupBy(col(groupCol), col("__j"))
      .agg(round(sum(col("__v")).cast("double")
        / count(lit(1)).cast("double")).cast("long").as("__cv"))
      .groupBy(col(groupCol))
      .agg(transform(
        sort_array(collect_list(struct(col("__j"), col("__cv")))),
        s => s.getField("__cv")).as("__cvec"))
    q.join(broadcast(cent), Seq(groupCol))
      .select(col(groupCol), col(idCol),
        dist2(col("__vq"), col("__cvec")).as("dist2_q"))
  }

  /** `iterations` rounds of (assign, update) over micro-quantized
    * coordinates. Returns the LAST round's assignment:
    * (idCol, cell: int, dist2_q: long) — `dist2_q` is the exact
    * squared L2 distance, in micros², to the centroid the row was
    * assigned to in that round. */
  def kmeansMicro(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int, salt: String = "km",
      checkpoint: Boolean = false): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(iterations >= 1, "iterations must be >= 1")
    val reserved = vectors.columns.filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"column names starting with '__' are reserved by kmeansMicro: ${reserved.mkString(", ")}")
    val q = vectors
      .select(col(idCol), microQuantize(col(vecCol)).as("__vq"))
    // bottom-k seed: k smallest md5(salt:id); cell ids follow hash
    // order via sort_array inside the folded row (no global window)
    val seeds = q
      .withColumn("__h",
        md5(concat(lit(salt + ":"), col(idCol).cast("string"))))
      .orderBy(col("__h")).limit(k)
      .agg(sort_array(collect_list(struct(col("__h"), col("__vq"))))
        .as("__ss"))
      .select(posexplode(col("__ss")).as(Seq("cell", "__s")))
      .select(col("cell").cast("int").as("cell"),
        col("__s.__vq").as("cvec"))

    var cents = seeds
    var lastAssign: DataFrame = null
    for (_ <- 1 to iterations) {
      // fold k centroids into one broadcast row, sorted so ties in
      // the argmin resolve to the LOWEST cell id
      val oneRow = cents.agg(
        sort_array(collect_list(struct(col("cell"), col("cvec"))))
          .as("__cents"))
      val assigned = q.crossJoin(broadcast(oneRow))
        .withColumn("__best",
          aggregate(col("__cents"),
            struct(lit(Long.MaxValue).as("d"), lit(-1).as("cell")),
            (acc, c) => {
              val d = dist2(col("__vq"), c.getField("cvec"))
              when(d < acc.getField("d"),
                struct(d.as("d"), c.getField("cell").as("cell")))
                .otherwise(acc)
            }))
        .select(col(idCol), col("__vq"),
          col("__best.cell").as("cell"),
          col("__best.d").as("dist2_q"))
      lastAssign = assigned
      val upd = assigned
        .select(col("cell"), posexplode(col("__vq")).as(Seq("__j", "__v")))
        .groupBy(col("cell"), col("__j"))
        .agg(round(sum(col("__v")).cast("double")
          / count(lit(1)).cast("double")).cast("long").as("__cv"))
        .groupBy(col("cell"))
        .agg(transform(
          sort_array(collect_list(struct(col("__j"), col("__cv")))),
          s => s.getField("__cv")).as("__ncvec"))
      val next = cents.join(upd, Seq("cell"), "left")
        .select(col("cell"),
          coalesce(col("__ncvec"), col("cvec")).as("cvec"))
      cents = if (checkpoint) next.localCheckpoint(true) else next
    }
    lastAssign.select(col(idCol), col("cell"), col("dist2_q"))
  }
}
