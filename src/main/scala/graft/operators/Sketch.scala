package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Count-min sketch over a weighted item stream — the fixed-memory
  * frequency summary a 100 TB corpus needs when the exact per-term
  * count table itself (q86's `tokenCounts`) is too large to hold or
  * ship. The reference has no sketch surface (its corpus is 83 rows,
  * `main.py:9-60`); this is part of the training-data-pipeline tier
  * alongside the heavy-hitter aggregate ([[graft.functions.FreqItemsAgg]])
  * and the HLL/t-digest built-ins (q63).
  *
  * Design for scale, in Spark terms:
  *   - the BUILD is one `groupBy(h, bucket).sum` — a map-side-
  *     combinable aggregate whose output is bounded by depth×width
  *     CELLS, independent of corpus size. Partial aggregation does
  *     the sketch MERGE for free: each task builds a local sketch,
  *     the exchange moves ≤ d·w rows per task, and the final merge is
  *     the same `sum`. No driver-side state, no collect.
  *   - the ESTIMATE broadcasts the (tiny, ≤ d·w-row) sketch back to
  *     the probe side: probing is a broadcast hash join plus a
  *     `min` over d rows per item — no shuffle of the probe stream
  *     beyond its own groupBy.
  *   - the hash family is the repo's cross-engine md5 coordinate
  *     ([[Curation.sampleHash]]): row i of the sketch keys on
  *     `md5(salt:i:item)`, so a DuckDB oracle can replay every cell
  *     and the estimate arithmetic EXACTLY — the sketch is
  *     deterministic, not an engine-specific opaque (contrast
  *     `approx_count_distinct`, which q63 certifies by bound flags).
  *
  * Standard CMS guarantees hold (Cormode–Muthukrishnan): estimates
  * never undercount, and overcount ≤ εN with probability 1−δ for
  * width ≥ e/ε, depth ≥ ln(1/δ).
  */
object Sketch {

  /** Bucket of `item` under hash row `h` (a column, so one `explode`
    * can fan an item across all depth rows): 56-bit md5 coordinate
    * mod width. Non-negative by construction on both engines. */
  def cmBucket(item: Column, h: Column, width: Int, salt: String): Column =
    pmod(
      conv(substring(md5(concat(lit(salt), lit(":"), h.cast("string"),
        lit(":"), item.cast("string"))), 1, 14), 16, 10).cast("long"),
      lit(width.toLong))

  /** Build the depth×width sketch from weighted items: one row per
    * non-empty cell, `(h, bucket, cnt)`. `weightCol` is the item's
    * count/weight (use `lit(1)` upstream for a raw stream). */
  def countMinBuild(items: DataFrame, itemCol: String, weightCol: String,
      depth: Int, width: Int, salt: String): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be positive")
    items.select(col(itemCol).as("__it"), col(weightCol).cast("long").as("__w"))
      .withColumn("h", explode(array((0 until depth).map(i => lit(i)): _*)))
      .select(col("h"), cmBucket(col("__it"), col("h"), width, salt).as("bucket"),
        col("__w"))
      .groupBy(col("h"), col("bucket"))
      .agg(sum(col("__w")).as("cnt"))
  }

  /** AMS F2 sketch: estimate the second frequency moment Σf² per
    * group with `depth` independent ±1-sign estimators — the moments
    * member of the sketch family (CMS = frequencies, Bloom =
    * membership, HLL = cardinality). F2 is the self-join size /
    * skew signal a planner reads before shuffling a key. Each
    * estimator keeps ONE signed BIGINT per group (Σ sign(item)·f,
    * exact, order-free); the estimate is the mean of their squares.
    * Signs come from the [[cmBucket]] md5 coordinate's parity, so a
    * DuckDB oracle replays every estimator exactly. State per group:
    * `depth` longs, whatever the item count. Returns
    * (groupCol, ams_est). */
  def amsF2(items: DataFrame, groupCol: String, itemCol: String,
            weightCol: String, depth: Int, salt: String): DataFrame = {
    require(depth >= 1, "depth must be positive")
    val signed = items
      .select(col(groupCol).as("__g"), col(itemCol).as("__it"),
        col(weightCol).cast("long").as("__w"))
      .withColumn("h", explode(array((0 until depth).map(i => lit(i)): _*)))
      .withColumn("__sgn",
        when(cmBucket(col("__it"), col("h"), 2, salt) === 0L, 1L)
          .otherwise(-1L))
    signed.groupBy(col("__g"), col("h"))
      .agg(sum(col("__sgn") * col("__w")).as("__s"))
      .groupBy(col("__g"))
      .agg(sum(col("__s") * col("__s")).as("__est_num"))
      .select(col("__g").as(groupCol),
        // nonneg exact ints ≪ 2^53: floor(double div) == integer div
        floor(col("__est_num") / lit(depth)).cast("long").as("ams_est"))
  }

  /** AMS INNER-PRODUCT estimate of the equi-join size between two
    * weighted item streams: E[Σ_h s_A(h)·s_B(h) / depth] =
    * Σ_v f_A(v)·f_B(v) — the |A ⋈ B| row count, estimated from
    * 2·depth signed longs without materializing either frequency
    * table (Alon–Gibbons–Matias–Szegedy). The planner signal a
    * 100 TB engine reads BEFORE committing to a join order or a
    * shuffle size: both sides stream once through map-side-combined
    * sign-sums; no key ever shuffles. Both sketches must share the
    * same (depth, salt) sign family — enforced here by construction.
    * Returns one row: (join_size_est). */
  def amsJoinSize(a: DataFrame, itemColA: String, weightColA: String,
                  b: DataFrame, itemColB: String, weightColB: String,
                  depth: Int, salt: String): DataFrame = {
    require(depth >= 1, "depth must be positive")
    def sketch(df: DataFrame, ic: String, wc: String, out: String) =
      df.select(col(ic).as("__it"), col(wc).cast("long").as("__w"))
        .withColumn("h", explode(array((0 until depth).map(i => lit(i)): _*)))
        .withColumn("__sgn",
          when(cmBucket(col("__it"), col("h"), 2, salt) === 0L, 1L)
            .otherwise(-1L))
        .groupBy(col("h"))
        .agg(sum(col("__sgn") * col("__w")).as(out))
    sketch(a, itemColA, weightColA, "__sa")
      .join(sketch(b, itemColB, weightColB, "__sb"), Seq("h"))
      .agg(sum(col("__sa") * col("__sb")).as("__num"))
      .select(floor(col("__num") / lit(depth)).cast("long")
        .as("join_size_est"))
  }

  /** Bloom filter build over `items`: one row per SET BIT, `(pos)`,
    * bounded by `numBits` rows regardless of item count — like the
    * CMS build, `groupBy(pos)` makes partial aggregation the filter
    * merge (bit-OR of per-task filters = distinct of their set
    * positions) and the exchange moves ≤ numBits rows per task.
    * Position family reuses [[cmBucket]]'s md5 coordinate, so a
    * DuckDB oracle replays every bit exactly.
    *
    * The scale story vs an exact semi-join (q58's decontamination):
    * the filter is a fixed ≤ numBits-row broadcast however large the
    * reference set grows, and probing is k hash evaluations per row —
    * the classic pre-filter that keeps a 100 TB scan from shuffling
    * into a join against a reference set that no longer broadcasts
    * exactly. No false negatives, ever; false positives at the
    * standard (1−e^{−kn/m})^k rate. */
  def bloomBuild(items: DataFrame, itemCol: String,
      numBits: Int, numHashes: Int, salt: String): DataFrame = {
    require(numBits >= 1 && numHashes >= 1, "numBits and numHashes must be positive")
    items
      .withColumn("__h", explode(array((0 until numHashes).map(i => lit(i)): _*)))
      .select(cmBucket(col(itemCol), col("__h"), numBits, salt).as("pos"))
      .distinct()
  }

  /** Membership probe: appends `maybe = (all numHashes positions of
    * item are set)`. Never false-negative for any item that went into
    * [[bloomBuild]] with the same (numBits, numHashes, salt). Payload
    * columns of `queries` ride along as the groupBy key set. */
  def bloomMightContain(bloom: DataFrame, queries: DataFrame, itemCol: String,
      numBits: Int, numHashes: Int, salt: String): DataFrame = {
    val reserved = queries.columns.filter(c => c == "pos" || c == "__h" || c == "__bh")
    require(reserved.isEmpty,
      s"queries must not contain reserved columns: ${reserved.mkString(", ")}")
    val payload = queries.columns.map(col).toSeq
    queries
      .withColumn("__h", explode(array((0 until numHashes).map(i => lit(i)): _*)))
      .withColumn("pos", cmBucket(col(itemCol), col("__h"), numBits, salt))
      .join(broadcast(bloom.withColumn("__bh", lit(1))), Seq("pos"), "left")
      .groupBy(payload: _*)
      .agg((count(col("__bh")) === numHashes).as("maybe"))
  }

  /** Per-row Bloom membership PROJECTION: the collected bit set
    * folded into one array literal, probe = all `numHashes` salted
    * positions set. The stateless, stream-safe form of
    * [[bloomMightContain]] — numBits booleans ride the plan as a
    * constant (a Bloom is driver-collectable by construction), no
    * explode/join/aggregate, so it runs inside a streaming
    * micro-batch as a pure map at unbounded rate. Identical bit
    * coordinates to [[bloomBuild]] (`cmBucket`), so batch and stream
    * probes agree bit-for-bit. */
  def bloomProbeColumn(bits: Array[Boolean], item: Column,
      numBits: Int, numHashes: Int, salt: String): Column = {
    require(bits.length == numBits, "bits array must have numBits entries")
    require(numHashes >= 1, "numHashes must be >= 1")
    val bitsLit = typedLit(bits.toSeq)
    (0 until numHashes)
      .map(h => element_at(bitsLit,
        (cmBucket(item, lit(h), numBits, salt) + 1).cast("int")))
      .reduce(_ && _)
  }

  /** α constant of the standard HLL estimator for m = 2^p buckets. */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1 + 1.079 / m)
  }

  /** Deterministic HyperLogLog distinct estimate per group — unlike
    * `approx_count_distinct` (whose sketch is an engine-internal
    * opaque that q63 can only certify by accuracy BOUNDS), this HLL
    * is built from the repo's md5 coordinate with integer-only
    * register math, so a DuckDB oracle replays the ESTIMATE itself
    * bit-for-bit: bucket = top p bits of a 60-bit hash, register
    * M = leading-zeros+1 of the remainder via `length(bin(r))`
    * (integer-exact — no float log2 at bucket boundaries), and the
    * harmonic sum Σ 2^−M is held as Σ 2^(K−M) in a LONG (max m·2^K =
    * 2^61, no overflow, no float-accumulation order dependence). Only
    * the final α·m²·2^K/S division and the small-range linear-count
    * branch touch doubles, in one fixed expression shape.
    *
    * Scale shape: (group, bucket) max-aggregate — map-side partials
    * ARE the HLL merge (register-wise max), the exchange carries
    * ≤ m rows per group per task, and the final per-group fold is m
    * rows. Output: group cols + (n_used, est). */
  def hllDistinct(items: DataFrame, groupCols: Seq[String], itemCol: String,
      p: Int = 6, salt: String): DataFrame =
    hllEstimateFromRegisters(
      hllRegisters(items, groupCols, itemCol, p, salt), groupCols, p)

  /** The per-group HLL REGISTER table (group..., __bucket, __mb) —
    * ≤ 2^p rows per group, the mergeable state: register-wise max IS
    * the sketch union, which is what [[hllOverlapMatrix]] exploits
    * pairwise. */
  def hllRegisters(items: DataFrame, groupCols: Seq[String], itemCol: String,
      p: Int = 6, salt: String): DataFrame = {
    require(p >= 4 && p <= 12, "p must be in [4, 12]")
    val remBits = 60 - p
    val maxM = remBits + 1
    val g = groupCols.map(col)
    val h = conv(substring(md5(concat(lit(salt), lit(":"),
      col(itemCol).cast("string"))), 1, 15), 16, 10).cast("long")
    items
      .select(g :+ h.as("__h"): _*)
      .withColumn("__bucket", shiftright(col("__h"), remBits))
      .withColumn("__r", col("__h").bitwiseAND(lit((1L << remBits) - 1)))
      .withColumn("__m",
        when(col("__r") === 0, lit(maxM))
          .otherwise(lit(maxM) - length(bin(col("__r")))))
      .groupBy(g :+ col("__bucket"): _*)
      .agg(max(col("__m")).as("__mb"))
  }

  /** Registers → (group..., n_used, est): the standard α·m²/Σ2^−M
    * estimator with the small-range linear-count branch, integer
    * register math throughout ([[hllDistinct]]'s contract). */
  def hllEstimateFromRegisters(regs: DataFrame, groupCols: Seq[String],
      p: Int): DataFrame = {
    require(p >= 4 && p <= 12, "p must be in [4, 12]")
    val m = 1 << p
    val remBits = 60 - p
    val maxM = remBits + 1
    val g = groupCols.map(col)
    val alphaM2 = hllAlpha(m) * m * m
    val twoK = math.pow(2.0, maxM)
    regs
      .withColumn("__term", expr(s"shiftleft(CAST(1 AS BIGINT), $maxM - __mb)"))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_used"), sum(col("__term")).as("__sp"))
      .withColumn("__s",
        col("__sp") + (lit(m.toLong) - col("n_used")) * lit(1L << maxM))
      .withColumn("__raw", lit(alphaM2) * (lit(twoK) / col("__s").cast("double")))
      .withColumn("__v", lit(m.toLong) - col("n_used"))
      .withColumn("est",
        when(col("__raw") <= lit(2.5 * m) && col("__v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__v").cast("double")))
          .otherwise(col("__raw")))
      .select(g ++ Seq(col("n_used"), col("est")): _*)
  }

  /** SKETCH-TIER source-overlap matrix — q253's exact governance
    * report at HLL cost: per-group registers once, pairwise
    * register-wise MAX (the HLL merge) for every group pair, union
    * estimates from the merged registers, and the
    * inclusion-exclusion intersection `est_a + est_b − est_union`.
    * At 100 TB the exact matrix's shingle self-join touches every
    * distinct (group, shingle) row; this touches |groups|·2^p
    * register rows — the screening pass that decides WHICH pairs
    * deserve the exact join. Estimates carry HLL noise (est_inter
    * can even go negative on near-disjoint pairs); callers measure
    * it against the exact counts, the measured-recall discipline.
    *
    * Output per (a < b) pair: n_used_union, est_a, est_b, est_union,
    * est_inter. */
  def hllOverlapMatrix(items: DataFrame, groupCol: String, itemCol: String,
      p: Int = 6, salt: String): DataFrame = {
    val regs = hllRegisters(items, Seq(groupCol), itemCol, p, salt)
    val singles = hllEstimateFromRegisters(regs, Seq(groupCol), p)
    val groups = regs.select(col(groupCol)).distinct()
    val pairs = groups.toDF("source_a")
      .crossJoin(broadcast(groups.toDF("source_b")))
      .filter(col("source_a") < col("source_b"))
    val ra = regs.toDF("source_a", "__bucket", "__mb")
    val rb = regs.toDF("source_b", "__bucket", "__mb")
    val pairRegs = pairs.join(ra, Seq("source_a"))
      .select(col("source_a"), col("source_b"), col("__bucket"), col("__mb"))
      .unionByName(pairs.join(rb, Seq("source_b"))
        .select(col("source_a"), col("source_b"), col("__bucket"),
          col("__mb")))
      .groupBy(col("source_a"), col("source_b"), col("__bucket"))
      .agg(max(col("__mb")).as("__mb"))
    hllEstimateFromRegisters(pairRegs, Seq("source_a", "source_b"), p)
      .withColumnRenamed("n_used", "n_used_union")
      .withColumnRenamed("est", "est_union")
      .join(broadcast(singles.toDF("source_a", "n_used_a", "est_a")
        .drop("n_used_a")), Seq("source_a"))
      .join(broadcast(singles.toDF("source_b", "n_used_b", "est_b")
        .drop("n_used_b")), Seq("source_b"))
      .withColumn("est_inter", col("est_a") + col("est_b") - col("est_union"))
      .select(col("source_a"), col("source_b"), col("n_used_union"),
        col("est_a"), col("est_b"), col("est_union"), col("est_inter"))
  }

    /** Point-query the sketch for every row of `queries`: appends
    * `est = min over depth rows of cnt[h][bucket(item)]` (0 for an
    * item no build row ever touched — empty cells are absent rows).
    * Payload columns of `queries` ride along (they join the groupBy
    * key set, so keep them functionally dependent on `itemCol`). */
  def countMinEstimate(sketch: DataFrame, queries: DataFrame, itemCol: String,
      depth: Int, width: Int, salt: String): DataFrame = {
    require(!queries.columns.contains("h") && !queries.columns.contains("bucket"),
      "queries must not contain reserved columns h/bucket")
    val payload = queries.columns.map(col).toSeq
    queries
      .withColumn("h", explode(array((0 until depth).map(i => lit(i)): _*)))
      .withColumn("bucket", cmBucket(col(itemCol), col("h"), width, salt))
      .join(broadcast(sketch), Seq("h", "bucket"), "left")
      .groupBy(payload: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** MERGEABLE QUANTILE SKETCH by 2-significant-digit log bucketing:
    * each positive integer x collapses to its leading two decimal
    * digits (1234567 → 1200000), so the per-group state is a bucket
    * histogram of AT MOST 90 cells per decade — bounded by the value
    * DOMAIN's magnitude range, never the row count — and the
    * estimate for quantile q is the smallest bucket whose cumulative
    * count reaches ⌈q·n⌉. Guaranteed relative error < 10% (one unit
    * in the second significant digit) with zero randomness: unlike
    * KLL/t-digest the state is order-free and partition-invariant,
    * so Spark's partial aggregation IS the sketch merge and a SQL
    * oracle replays every cell (the [[cmBuild]] discipline; contrast
    * q109's sampled exact quantile, which trades determinism for
    * precision).
    *
    * Everything is integer: bucketing is string-arithmetic on the
    * decimal representation (no float log whose last ulp could flip
    * a bucket cross-engine), the rank target is `(permille·n + 999)
    * div 1000`, and the per-group prefix scan runs over the bounded
    * bucket domain. Rows with x ≤ 0 are rejected (log buckets need a
    * sign-free domain; shift upstream).
    *
    * Output: (group, permille, n, est) per requested permille. */
  def logBucketQuantiles(df: DataFrame, groupCol: String, xCol: Column,
      permilles: Seq[Int]): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      "permilles must be in [1, 1000]")
    import org.apache.spark.sql.expressions.Window
    val s = col("__x").cast("string")
    // the positivity guard lives INSIDE the kept expression — a
    // separate check column would be pruned away by Catalyst. NULL
    // must be caught explicitly: `null <= 0` is NULL, which falls
    // through to the otherwise-branch and would be silently counted
    // as a NULL bucket that sorts first in the cumulative window.
    val bucket = when(col("__x").isNull || col("__x") <= 0L,
        raise_error(lit(
        "logBucketQuantiles requires positive values")).cast("long"))
      .otherwise(when(length(s) < 3, col("__x"))
        .otherwise(concat(substring(s, 1, 2),
          repeat(lit("0"), length(s) - 2)).cast("long")))
    val b = df.select(col(groupCol).as("g"), xCol.cast("long").as("__x"))
      .select(col("g"), bucket.as("b"))
      .groupBy(col("g"), col("b")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("g")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = b.withColumn("cum", sum(col("c")).over(w))
    val targets = b.groupBy(col("g")).agg(sum(col("c")).as("n"))
      .withColumn("permille",
        explode(array(permilles.map(p => lit(p.toLong)): _*)))
      .withColumn("t", expr("(permille * n + 999) div 1000"))
    targets.join(cum, Seq("g"))
      .filter(col("cum") >= col("t"))
      .groupBy(col("g"), col("permille"), col("n"))
      .agg(min(col("b")).as("est"))
      .select(col("g").as(groupCol), col("permille"), col("n"), col("est"))
  }
}
