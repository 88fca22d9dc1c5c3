package graft.operators

import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set-agreement and projection analytics (`utilities/plotting.py`).
  *
  * The reference computes 7-region Venn cardinalities over python
  * sets (`plotting.py:22-31`) and a UMAP 2-d projection
  * (`plotting.py:93-96`). Here: one full-outer-join pass produces all
  * 7 regions at once (the reference's 7 separate set expressions each
  * rescanned its inputs), and PCA stands in for UMAP (no JVM UMAP
  * exists; documented deviation, SURVEY.md §7.4).
  */
object Analyze {

  /** Per-group WINSORIZED robust statistics: clamp a numeric column
    * to its group's [pLo, pHi] interpolated percentiles and report
    * the clipped counts plus the winsorized sum in exact integer
    * cents — the outlier-robust metric summary (sensor spikes, bot
    * bursts, fat-finger values) that a plain mean is wrecked by.
    *
    * Shape: one exact percentile aggregate per group (Spark's
    * `percentile`, the same interpolation as `quantile_cont` — the
    * q109 cross-engine identity), then the bounds — |groups| rows —
    * broadcast back for a single clamp-and-sum pass. Two scans, one
    * group-keyed shuffle of partial aggregates, never a global sort.
    * The winsorized sum is Σ round(clamp(v)·100) — order-free exact
    * integers, so an oracle restates it verbatim.
    *
    * Output: (groupCol, n, lo, hi, n_clipped_lo, n_clipped_hi,
    * win_sum_cents). */
  def winsorizedStats(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0.0 && pHi <= 1.0 && pLo < pHi,
      "need 0 <= pLo < pHi <= 1")
    val bounds = df.groupBy(col(groupCol)).agg(
      expr(s"percentile($valueCol, $pLo)").as("lo"),
      expr(s"percentile($valueCol, $pHi)").as("hi"))
    val win = least(greatest(col("__v"), col("lo")), col("hi"))
    df.select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .join(broadcast(bounds), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"),
        sum(when(col("__v") < col("lo"), lit(1L)).otherwise(lit(0L)))
          .as("n_clipped_lo"),
        sum(when(col("__v") > col("hi"), lit(1L)).otherwise(lit(0L)))
          .as("n_clipped_hi"),
        sum(round(win * lit(100.0)).cast("long")).as("win_sum_cents"))
  }

  /** 2-D PARETO FRONTIER (skyline), maximizing both coordinates: the
    * points no other point dominates (x' ≥ x, y' ≥ y, strict in
    * one). The classic quality-vs-cost trade-off readout (best
    * model per token budget, most valuable user per activity tier)
    * whose naive form is an O(n²) dominance anti-join.
    *
    * Distributed shape: one per-x keyed aggregate (`max(y)` — map-
    * side combined, absorbs the full point mass) collapses n points
    * to |distinct x| candidates; the frontier is then a running
    * max-from-the-right over the candidates, a single bounded sort.
    * The caller bounds |distinct x| by quantizing x upstream (grid
    * skyline) — at 100 TB x is a bucketed axis (token-budget tier,
    * activity band), never a raw double. Equal-y ties keep the
    * largest x (the others are dominated); duplicate points emit
    * once. Output: `(x, y)` frontier rows, y strictly decreasing in
    * falling x order. */
  def paretoFrontier(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = df.groupBy(col(xCol).as("x")).agg(max(col(yCol)).as("y"))
    // global window over |distinct x| candidate rows — bounded by the
    // quantized x domain, not the data (PlanContractSpec whitelist)
    val w = Window.orderBy(desc("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cand.withColumn("__ymaxr", max(col("y")).over(w))
      .filter(col("__ymaxr").isNull || col("__ymaxr") < col("y"))
      .select(col("x"), col("y"))
  }

  /** CUPED variance-reduced experiment readout — the industry-
    * standard upgrade to [[abTest]]: each unit's experiment-period
    * metric `y` is adjusted by its PRE-period covariate `x`
    * (`y_adj = y − θ·(x − x̄)`, θ = cov(x,y)/var(x) pooled across
    * arms), which removes the between-user variance the covariate
    * explains and tightens the same comparison at the same sample
    * size.
    *
    * Everything derives from five exact BIGINT sums per arm (n, Σx,
    * Σy, Σxy, Σx²) collected in ONE grouped aggregate over
    * per-unit integer cents, then one fixed explicit-double IEEE
    * tree for θ and the adjusted means — bit-replayable, the
    * [[abTest]]/[[halfSampleCI]] discipline. θ guard: NULL-adjusted
    * means when var(x) = 0. Output (one row per arm): (arm, n,
    * sum_x, sum_y, mean_y, mean_y_adj). */
  def cuped(units: DataFrame, armCol: String, xCentsCol: String,
      yCentsCol: String): DataFrame = {
    def d(c: Column): Column = c.cast("double")
    val perArm = units.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(col(xCentsCol)).as("sum_x"),
        sum(col(yCentsCol)).as("sum_y"),
        sum(col(xCentsCol) * col(yCentsCol)).as("sum_xy"),
        sum(col(xCentsCol) * col(xCentsCol)).as("sum_xx"))
    val tot = perArm.agg(sum(col("n")).as("tn"),
      sum(col("sum_x")).as("tx"), sum(col("sum_y")).as("ty"),
      sum(col("sum_xy")).as("txy"), sum(col("sum_xx")).as("txx"))
    val joined = perArm.crossJoin(broadcast(tot))
    val varNum = d(col("txx")) * d(col("tn")) - d(col("tx")) * d(col("tx"))
    val theta = (d(col("txy")) * d(col("tn"))
      - d(col("tx")) * d(col("ty"))) / varNum
    val xbarAll = d(col("tx")) / d(col("tn"))
    val meanY = d(col("sum_y")) / d(col("n"))
    val meanX = d(col("sum_x")) / d(col("n"))
    joined.select(col("arm"), col("n"), col("sum_x"), col("sum_y"),
      meanY.as("mean_y"),
      when(varNum > 0.0, meanY - theta * (meanX - xbarAll))
        .as("mean_y_adj"))
  }

  /** Deterministic A/B EXPERIMENT readout: units hash-assigned to
    * two arms (`md5(salt:unit) mod 2` — the [[graft.operators
    * .Curation]] membership discipline, so assignment is stable
    * under re-runs and replayable by the oracle), per-arm exact
    * unit/conversion counts and rate micros, plus the pooled
    * two-proportion z-score. The experimentation primitive of every
    * growth stack; at 100 TB the whole readout is one per-unit
    * aggregate followed by a conditional-sum collapse to ONE row.
    *
    * The z-score is built from correctly-rounded IEEE ops only
    * (divisions, sqrt), with a FIXED expression tree, so even the
    * double is bit-identical across engines. Output (one row):
    * (n_a, conv_a, rate_a_micros, n_b, conv_b, rate_b_micros,
    * z_score). */
  def abTest(df: DataFrame, unitCol: String, convertedCol: Column,
      salt: String): DataFrame = {
    val units = df
      .select(col(unitCol).as("__u"), convertedCol.cast("long").as("__c"))
      .groupBy(col("__u")).agg(max(col("__c")).as("__conv"))
      .withColumn("__arm", pmod(
        conv(substring(md5(concat(lit(s"$salt:"), col("__u").cast("string"))),
          1, 14), 16, 10).cast("long"), lit(2L)))
    val row = units.agg(
      sum(when(col("__arm") === 0L, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__arm") === 0L, col("__conv")).otherwise(lit(0L)))
        .as("conv_a"),
      sum(when(col("__arm") === 1L, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__arm") === 1L, col("__conv")).otherwise(lit(0L)))
        .as("conv_b"))
    // explicit DOUBLE arithmetic: under ANSI mode a bare long/long
    // is integral "div" (and decimal coercions differ from DuckDB);
    // doubles make both engines run the identical IEEE tree
    def d(c: Column): Column = c.cast("double")
    val pa = d(col("conv_a")) / d(col("n_a"))
    val pb = d(col("conv_b")) / d(col("n_b"))
    val pp = d(col("conv_a") + col("conv_b")) / d(col("n_a") + col("n_b"))
    val se = sqrt(pp * (lit(1.0) - pp)
      * (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b"))))
    row.select(col("n_a"), col("conv_a"),
      floor(d(col("conv_a")) * lit(1000000.0) / d(col("n_a"))).cast("long")
        .as("rate_a_micros"),
      col("n_b"), col("conv_b"),
      floor(d(col("conv_b")) * lit(1000000.0) / d(col("n_b"))).cast("long")
        .as("rate_b_micros"),
      // z undefined when an arm is empty or the pooled rate
      // saturates (se = 0): NULL, replayed by the oracle's CASE
      when(col("n_a") > 0 && col("n_b") > 0
          && col("conv_a") + col("conv_b") > 0
          && col("conv_a") + col("conv_b") < col("n_a") + col("n_b"),
        (pa - pb) / se).as("z_score"))
  }

  /** TIME-WEIGHTED AVERAGE (TWAP) per key: each observation's value
    * holds until the next observation, so the average weights each
    * value by its holding duration — the correct "average price /
    * average gauge reading" when sampling is irregular (a plain mean
    * over-weights bursts). The telemetry/finance staple.
    *
    * Exact-integer core: `twap_num = Σ cents_i · (t_{i+1} − t_i)`
    * (cents × micros, bounded ≤ 2⁶³ for realistic ranges) and
    * `duration_us = t_last − t_first` are order-free BIGINT sums; the
    * final `twap_cents = num/duration` is one double division,
    * NULL when duration is 0 (single-observation keys). One
    * key-partitioned `lead` window (never global), one aggregate.
    * `ordCols` must totally order each key's rows. */
  def timeWeightedAverage(df: DataFrame, keyCol: String, tsUsCol: String,
      valueCentsCol: Column, ordCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(ordCols: _*)
    df.withColumn("__t", col(tsUsCol).cast("long"))
      .withColumn("__v", valueCentsCol.cast("long"))
      .withColumn("__tn", lead(col("__t"), 1).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        (max(col("__t")) - min(col("__t"))).as("duration_us"),
        sum(when(col("__tn").isNotNull,
          col("__v") * (col("__tn") - col("__t"))).otherwise(lit(0L)))
          .as("twap_num"))
      .withColumn("twap_cents",
        when(col("duration_us") > 0,
          col("twap_num").cast("double")
            / col("duration_us").cast("double")))
  }

  /** HALF-SAMPLE uncertainty for a per-group mean — deterministic
    * subsampling CI: `replicas` half-samples drawn by md5 bit
    * (`md5(salt:b:id) mod 2`, the engine's stable-membership
    * discipline — no RNG state, so the replica set is identical on
    * re-runs and replayable by the oracle), each replica's mean from
    * EXACT integer cents sums, and the spread of replica means as
    * the standard error estimate. The cheap, embarrassingly-parallel
    * cousin of the bootstrap: ONE grouped aggregate carries all
    * 2·replicas conditional sums, so the uncertainty costs the same
    * scan as the mean itself at 100 TB.
    *
    * All doubles derive from exact BIGINT sums through a FIXED
    * left-associated expression order (m₀…m_B, then
    * Σ(m_b−m̄)²/B), so even the std is bit-identical across
    * engines. Output: (groupCol, n, sum_cents, mean_cents,
    * half_sample_std_cents — NULL if any replica is empty). */
  def halfSampleCI(df: DataFrame, groupCol: String, idCol: String,
      centsCol: Column, replicas: Int, salt: String): DataFrame = {
    require(replicas >= 2, "need at least two replicas")
    def member(b: Int): Column = pmod(
      conv(substring(md5(concat(lit(s"$salt:$b:"),
        col(idCol).cast("string"))), 1, 14), 16, 10).cast("long"),
      lit(2L)) === 0L
    val aggs =
      Seq(count(lit(1)).as("n"), sum(centsCol.cast("long")).as("sum_cents")) ++
      (0 until replicas).flatMap { b =>
        Seq(sum(when(member(b), centsCol.cast("long")).otherwise(lit(0L)))
          .as(s"__s$b"),
          sum(when(member(b), 1L).otherwise(0L)).as(s"__n$b"))
      }
    def d(c: Column): Column = c.cast("double")
    val ms = (0 until replicas).map(b => d(col(s"__s$b")) / d(col(s"__n$b")))
    val mbar = ms.reduceLeft(_ + _) / lit(replicas.toDouble)
    // Stage the replicate means m_b (and m̄) as COLUMNS of an
    // intermediate projection instead of inlining the m_b = s_b/n_b
    // division into every (m_b − m̄)² term: the inlined tree put
    // ~300 division nodes into the final aggregate's one generated
    // output method, janino rejected it (64 KB method limit) and the
    // whole post-shuffle stage ran interpreted (guide §4; the one
    // codegen failure on the r15 board). CollapseProject keeps the
    // two projections separate because each staged alias is
    // non-cheap and referenced more than once downstream. The IEEE
    // tree is UNCHANGED — same operations in the same order over the
    // same exact-integer sums, shared subterms evaluate to identical
    // bits — so the oracle hash is preserved.
    val staged = df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
      .select(
        Seq(col(groupCol), col("n"), col("sum_cents")) ++
          (0 until replicas).map(b => col(s"__n$b")) ++
          (0 until replicas).map(b =>
            (d(col(s"__s$b")) / d(col(s"__n$b"))).as(s"__m$b")) :+
          mbar.as("__mbar"): _*)
    val varE = (0 until replicas)
      .map(b => (col(s"__m$b") - col("__mbar"))
        * (col(s"__m$b") - col("__mbar")))
      .reduceLeft(_ + _) / lit(replicas.toDouble)
    staged.select(col(groupCol), col("n"), col("sum_cents"),
      (d(col("sum_cents")) / d(col("n"))).as("mean_cents"),
      when((0 until replicas).map(b => col(s"__n$b") > 0L).reduce(_ && _),
        sqrt(varE)).as("half_sample_std_cents"))
  }

  /** MAD-based robust ANOMALY DETECTION per group: median and
    * median-absolute-deviation of a cents column, rows flagged when
    * `|x − med| > k·MAD` — the outlier DETECTOR beside
    * [[winsorizedStats]]' outlier MITIGATION; immune to the very
    * outliers it hunts (mean/std would be dragged by them).
    *
    * Three passes (median → MAD → flags), each a grouped aggregate
    * with the |groups|-row bounds broadcast back — exact
    * interpolated percentiles (the q109/q179 cross-engine
    * identity); at 100 TB swap the exact percentile for the q109
    * sampled quantile and keep the same shape. All deviations are
    * exact integers until the final interpolation, so the oracle
    * restates every column. Output: (groupCol, n, med_cents,
    * mad_cents, n_anomalies, anomaly_cents). */
  def madAnomalies(df: DataFrame, groupCol: String, centsCol: Column,
      k: Double = 3.0): DataFrame = {
    require(k > 0, "k must be positive")
    val base = df.select(col(groupCol), centsCol.cast("long").as("__c"))
    val med = base.groupBy(col(groupCol))
      .agg(expr("percentile(__c, 0.5)").as("med_cents"))
    val withMed = base.join(broadcast(med), Seq(groupCol))
    val mad = withMed
      .select(col(groupCol),
        abs(col("__c").cast("double") - col("med_cents")).as("__dev"))
      .groupBy(col(groupCol))
      .agg(expr("percentile(__dev, 0.5)").as("mad_cents"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .withColumn("__anom",
        abs(col("__c").cast("double") - col("med_cents"))
          > lit(k) * col("mad_cents"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        min(col("med_cents")).as("med_cents"),
        min(col("mad_cents")).as("mad_cents"),
        sum(when(col("__anom"), 1L).otherwise(0L)).as("n_anomalies"),
        sum(when(col("__anom"), col("__c")).otherwise(lit(0L)))
          .as("anomaly_cents"))
  }

  /** Market-basket ASSOCIATION RULES over (basket, item) pairs:
    * pair support, directed confidence and lift for every item pair
    * co-occurring in at least `minSupport` baskets — the classic
    * co-occurrence miner (bought-together, co-cited, co-crawled).
    *
    * All three metrics are exact integers: `conf_micros` =
    * ⌊10⁶·supp(a,b)/supp(a)⌋ and `lift_micros` =
    * ⌊10⁶·supp(a,b)·n_baskets/(supp(a)·supp(b))⌋, so an oracle
    * restates them verbatim.
    *
    * Scale shape: baskets dedup to DISTINCT (basket, item) first;
    * pair generation is a self-join on the basket key, Σ|basket|²
    * work — bounded by the max basket size (tiny for orders; for
    * fat baskets cap or sample items per basket upstream). Item
    * supports join back catalog-sized (broadcast); the basket count
    * rides a 1-row broadcast. minSupport prunes the pair tail
    * BEFORE the support joins. */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, "minSupport must be positive")
    val b = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val nBaskets = b.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__n"))
    val supp = b.groupBy(col("__i")).agg(count(lit(1)).as("__s"))
    val pairs = b.as("x")
      .join(b.as("y"),
        col("x.__b") === col("y.__b") && col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("item_a"), col("y.__i").as("item_b"))
      .agg(count(lit(1)).as("supp_ab"))
      .filter(col("supp_ab") >= minSupport)
    pairs
      .join(broadcast(supp.withColumnRenamed("__i", "item_a")
        .withColumnRenamed("__s", "__sa")), Seq("item_a"))
      .join(broadcast(supp.withColumnRenamed("__i", "item_b")
        .withColumnRenamed("__s", "__sb")), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("supp_ab"),
        col("__sa").as("supp_a"), col("__sb").as("supp_b"),
        floor(col("supp_ab") * lit(1000000L) / col("__sa"))
          .cast("long").as("conf_micros"),
        floor(col("supp_ab") * lit(1000000L) * col("__n")
          / (col("__sa") * col("__sb"))).cast("long").as("lift_micros"))
  }

  /** 7-region Venn cardinalities for three key sets, in ONE pass:
    * distinct each side, full-outer join on the key (using-column
    * joins coalesce the key), then count by membership pattern.
    * Region labels: a_only, b_only, c_only, ab_only, ac_only,
    * bc_only, abc. Regions with zero members are absent (count(*) of
    * an empty group). */
  def vennCounts3(a: DataFrame, b: DataFrame, c: DataFrame): DataFrame = {
    def side(df: DataFrame, flag: String): DataFrame =
      df.select(col(df.columns.head).as("k")).distinct()
        .withColumn(flag, lit(true))
    val fa = side(a, "in_a")
    val fb = side(b, "in_b")
    val fc = side(c, "in_c")
    fa.join(fb, Seq("k"), "full_outer")
      .join(fc, Seq("k"), "full_outer")
      .na.fill(false, Seq("in_a", "in_b", "in_c"))
      .withColumn("region",
        when(col("in_a") && col("in_b") && col("in_c"), "abc")
          .when(col("in_a") && col("in_b"), "ab_only")
          .when(col("in_a") && col("in_c"), "ac_only")
          .when(col("in_b") && col("in_c"), "bc_only")
          .when(col("in_a"), "a_only")
          .when(col("in_b"), "b_only")
          .otherwise("c_only"))
      .groupBy("region")
      .agg(count(lit(1)).as("n"))
  }

  /** 3-region Venn cardinalities for TWO key sets — the reference's
    * `C=None` default (`plotting.py:9` builds a 2-circle venn when
    * the third frame is absent), previously reachable only by
    * passing [[vennCounts3]] an empty third frame. One distinct per
    * side + one full-outer join. Region labels: a_only, b_only, ab;
    * empty regions are absent (the [[vennCounts3]] convention). */
  def vennCounts2(a: DataFrame, b: DataFrame): DataFrame = {
    def side(df: DataFrame, flag: String): DataFrame =
      df.select(col(df.columns.head).as("k")).distinct()
        .withColumn(flag, lit(true))
    side(a, "in_a").join(side(b, "in_b"), Seq("k"), "full_outer")
      .na.fill(false, Seq("in_a", "in_b"))
      .withColumn("region",
        when(col("in_a") && col("in_b"), "ab")
          .when(col("in_a"), "a_only")
          .otherwise("b_only"))
      .groupBy("region")
      .agg(count(lit(1)).as("n"))
  }

  /** 2-d PCA projection of a vector column — the engine-side
    * equivalent of the reference's UMAP scatter table
    * (`plotting.py:97-103`): id + (x, y) coordinates. The Gram
    * matrix aggregation runs distributed; only the k×d rotation is
    * driver-side.
    *
    * Eigenvector signs are mathematically arbitrary, so a raw PCA is
    * only reproducible up to per-axis sign flips. We fix a canonical
    * orientation — each principal axis is flipped so its
    * largest-|loading| component is positive (the standard
    * sign-determinism convention) — making the projection a
    * deterministic function of the data, as a training pipeline
    * artifact must be. */
  def pcaProject2d(df: DataFrame, vecCol: String, idCols: Seq[String]): DataFrame =
    pcaProject2dWithBasis(df, vecCol, idCols)._1

  /** [[pcaProject2d]] plus the signed 2×d rotation it projected with.
    *
    * The projection itself is applied as two [[graft.functions.DotProductExpr]]
    * columns against the basis rows as array literals — a pure
    * whole-stage-codegen projection (no per-row ML UDF, no BLAS
    * dispatch), and, because the codegen loop is a plain left-to-right
    * fold, the coordinates are replayable bit-for-bit by any engine's
    * ordered dot product (DuckDB `list_dot_product`): the exported
    * basis makes q35 oracle-checkable instead of rows-only. Signs are
    * folded into the basis before the dot (multiplication by ±1 is
    * exact, so this equals post-multiplying the projection by the
    * sign). */
  def pcaProject2dWithBasis(df: DataFrame, vecCol: String, idCols: Seq[String])
      : (DataFrame, Array[Array[Double]]) = {
    val (model, signs, _) = fitSigned2d(df, vecCol)
    val pc = model.pc // d rows × k cols
    val d = pc.numRows
    val basis = Array.tabulate(2)(axis =>
      Array.tabulate(d)(i => pc(i, axis) * signs(axis)))
    def proj(b: Array[Double]): org.apache.spark.sql.Column =
      graft.functions.VectorOps.dotProduct(
        col(vecCol).cast("array<double>"),
        array(b.map(lit(_)).toSeq: _*))
    val out = df.select(idCols.map(col) ++ Seq(
      proj(basis(0)).as("x"), proj(basis(1)).as("y")): _*)
    (out, basis)
  }

  private def fitSigned2d(df: DataFrame, vecCol: String)
      : (org.apache.spark.ml.feature.PCAModel, Array[Double], DataFrame) = {
    val assembled = df.withColumn("__features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new PCA()
      .setInputCol("__features").setOutputCol("__pca").setK(2)
      .fit(assembled)
    // per-axis canonical sign: +1 if the largest-|loading| entry of
    // the axis is positive, else -1 (k×d principal matrix, driver-side)
    val pc = model.pc // d rows × k cols, column-major
    val d = pc.numRows
    val signs = Array.tabulate(2) { axis =>
      var best = 0.0
      var sign = 1.0
      var i = 0
      while (i < d) {
        val v = pc(i, axis)
        if (math.abs(v) > math.abs(best)) { best = v; sign = if (v < 0) -1.0 else 1.0 }
        i += 1
      }
      sign
    }
    (model, signs, assembled)
  }

  /** PCA contract certification — the oracle-side proof for the
    * projection an eigendecomposition-in-the-loop query (q35) cannot
    * hash-check directly. Emits one row per input with boolean
    * contracts a DuckDB oracle states as `TRUE` (the q63
    * self-certification pattern); each flag is a real mathematical
    * invariant of a correct 2-d PCA, so an implementation defect
    * (wrong eigenvectors, broken sign convention, non-orthonormal
    * rotation) flips a flag and the driver's hash row goes red.
    *
    * Per row: `norm_contract` — an orthonormal 2-d projection never
    * lengthens a vector, x²+y² ≤ ‖v‖²(1+ε). Global (same value every
    * row): `orthonormal` — the rotation's columns are unit and
    * mutually orthogonal; `var_ordered` — Var(x) ≥ Var(y) (eigenvalue
    * order; variance is shift-invariant so uncentered projection
    * coordinates inherit it); `sign_canonical` — after the canonical
    * flip each axis's largest-|loading| entry is positive;
    * `axis_optimal` — the top-2 subspace captures at least the
    * variance of the best PAIR of coordinate axes (PCA subspace
    * optimality probed against d·(d−1)/2 competitors via
    * Summarizer's one-pass per-coordinate variances).
    *
    * Scale shape: one PCA fit (Gram aggregation, distributed), one
    * Summarizer pass, one 1-row variance aggregate; the only
    * driver-side values are k×d loadings and three scalars. */
  def pcaCertify2d(df: DataFrame, vecCol: String, idCols: Seq[String],
                   tol: Double = 1e-9): DataFrame = {
    val (model, signs, assembled) = fitSigned2d(df, vecCol)
    val pc = model.pc
    val d = pc.numRows

    def dot(a1: Int, a2: Int): Double = {
      var s = 0.0; var i = 0
      while (i < d) { s += pc(i, a1) * pc(i, a2); i += 1 }
      s
    }
    val orthonormal =
      math.abs(dot(0, 0) - 1.0) < 1e-9 && math.abs(dot(1, 1) - 1.0) < 1e-9 &&
        math.abs(dot(0, 1)) < 1e-9
    val signCanonical = (0 until 2).forall { axis =>
      var bestAbs = 0.0; var bestVal = 0.0; var i = 0
      while (i < d) {
        val v = pc(i, axis) * signs(axis)
        if (math.abs(v) > bestAbs) { bestAbs = math.abs(v); bestVal = v }
        i += 1
      }
      bestVal >= 0.0
    }

    // per-coordinate input variances in ONE distributed pass (no
    // posexplode shuffle); 1-row collect is parameter-sized
    import org.apache.spark.ml.stat.Summarizer
    val coordVar = assembled
      .select(Summarizer.variance(col("__features")).as("__cv"))
      .first().getAs[org.apache.spark.ml.linalg.Vector](0).toArray
    val bestAxisPair = coordVar.sorted.takeRight(2).sum

    val proj = model.transform(assembled)
      .withColumn("__coords", vector_to_array(col("__pca")))
      .withColumn("__x", col("__coords").getItem(0) * lit(signs(0)))
      .withColumn("__y", col("__coords").getItem(1) * lit(signs(1)))
      .withColumn("__vsq",
        graft.functions.VectorOps.dotProduct(col(vecCol), col(vecCol)))
    val Array(varX, varY) = proj
      .select(var_samp(col("__x")), var_samp(col("__y")))
      .first().toSeq.map(_.asInstanceOf[Double]).toArray
    val relTol = 1e-8 * (math.abs(varX) + math.abs(varY) + 1.0)
    val varOrdered = varX >= varY - relTol
    val axisOptimal = varX + varY >= bestAxisPair - relTol

    proj.select(idCols.map(col) ++ Seq(
      (col("__x") * col("__x") + col("__y") * col("__y") <=
        col("__vsq") * lit(1.0 + tol) + lit(tol)).as("norm_contract"),
      lit(orthonormal).as("orthonormal"),
      lit(varOrdered).as("var_ordered"),
      lit(signCanonical).as("sign_canonical"),
      lit(axisOptimal).as("axis_optimal")): _*)
  }

  /** BURSTINESS per key over an ordered event stream: Goh-Barabási
    * B = (σ−μ)/(σ+μ) of the inter-event gaps — −1 for a metronome,
    * → 0 for a Poisson process, → 1 for extreme bursts. The
    * bot-vs-human / crawler-cadence discriminator beside rate
    * (q213) and shape (q212) monitors: a scraper on a timer and a
    * human session can share a mean rate yet sit at opposite ends
    * of B.
    *
    * Per key, ONE grouped aggregate over lag-gaps (seconds — at µs
    * the squares overflow BIGINT on month-long gaps) yields exact
    * (n, Σg, Σg²); σ and B are ONE fixed double tree (population
    * variance lifted over n², `sqrt` is IEEE-correctly-rounded in
    * both engines — the cosSql precedent). The lag itself is a
    * key-partitioned window (co-partitioned, never global). Output:
    * (key, n_gaps, sum_gap_s, sum_gap_sq, b_micro) for EVERY
    * distinct key — a single-event key emits (0, NULL, NULL, NULL)
    * rather than vanishing (each key's first row carries a NULL lag
    * gap, which `count(__gap)`/`sum` skip, so presence is free: no
    * extra distinct-key join). b_micro is NULL under 2 gaps or
    * σ+μ = 0 (all gaps zero). */
  def burstiness(df: DataFrame, keyCol: String, tsUsCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"))
    val gaps = df.select(col(keyCol).as("__k"), tsUsCol.as("__ts"))
      .withColumn("__gap",
        floor((col("__ts") - lag(col("__ts"), 1).over(w)).cast("double")
          / lit(1000000.0)).cast("long"))
    def d(c: Column): Column = c.cast("double")
    val agg = gaps.groupBy(col("__k"))
      .agg(count(col("__gap")).as("n_gaps"), sum(col("__gap")).as("sum_gap_s"),
        sum(col("__gap") * col("__gap")).as("sum_gap_sq"))
    val mu = d(col("sum_gap_s")) / d(col("n_gaps"))
    val sg = sqrt((d(col("n_gaps")) * d(col("sum_gap_sq"))
      - d(col("sum_gap_s")) * d(col("sum_gap_s")))
      / (d(col("n_gaps")) * d(col("n_gaps"))))
    agg.select(col("__k").as(keyCol), col("n_gaps"), col("sum_gap_s"),
      col("sum_gap_sq"),
      when(col("n_gaps") < 2L || (sg + mu) === lit(0.0), lit(null))
        .otherwise(round(lit(1000000.0) * ((sg - mu) / (sg + mu)))
          .cast("long")).as("b_micro"))
  }

  /** HERFINDAHL–HIRSCHMAN INDEX per market: the concentration of a
    * value column across units within each group, HHI = Σᵤ shareᵤ²
    * ∈ (0, 1] — the antitrust-grade "is this market owned by one
    * player" readout (supplier concentration per region, source
    * concentration per language shard, token share per detector).
    * 1/HHI is the effective number of competitors.
    *
    * Exactness: per-unit totals are exact BIGINT cents; the square
    * sum runs in DECIMAL(38,0) (mirrored by the oracle's HUGEINT —
    * both are exact 128-bit integer spaces, and equal integers cast
    * to equal doubles), so HHI_micro = round(10⁶·Σx²/S²) is ONE
    * fixed double expression over exactly-agreed operands. Shape:
    * two map-combined aggregates (unit totals, then group moments)
    * — no window, no broadcast. Output: (group, n_units,
    * total_cents, hhi_micro) per group, NULL on a zero-total
    * group. */
  def hhi(df: DataFrame, groupCol: String, unitCol: String,
      centsCol: Column): DataFrame = {
    val units = df.select(col(groupCol).as("g"), col(unitCol).as("__u"),
        centsCol.cast("long").as("__c"))
      .groupBy(col("g"), col("__u")).agg(sum(col("__c")).as("__x"))
    val dec = col("__x").cast("decimal(38,0)")
    units.groupBy(col("g"))
      .agg(count(lit(1)).as("n_units"), sum(col("__x")).as("total_cents"),
        sum(dec * dec).as("__sumsq"))
      .select(col("g").as(groupCol), col("n_units"), col("total_cents"),
        when(col("total_cents") === 0L, lit(null))
          .otherwise(round(lit(1000000.0)
            * (col("__sumsq").cast("double")
              / (col("total_cents").cast("double")
                * col("total_cents").cast("double"))))
            .cast("long")).as("hhi_micro"))
  }

  /** GINI COEFFICIENT of a non-negative integer metric: the
    * inequality of the distribution, G = (2Σᵢ i·x₍ᵢ₎ − (n+1)Σx) /
    * (n·Σx) over values ranked ascending — the concentration
    * readout behind "do 1% of sources contribute 90% of tokens",
    * "how whale-heavy is revenue", "is the shard load balanced".
    *
    * Exactness: the rank weighting is lifted to one integer
    * numerator (2Σi·x − (n+1)Σx, exact BIGINT to ~10⁸ rows at cents
    * scale) over the integer denominator n·Σx; ranks come from
    * [[graft.operators.Layout.globalOrdinals]] with the caller's
    * unique key as tie-break — and Gini is TIE-INVARIANT (equal
    * values contribute the same Σi·x whichever order they take), so
    * the tie-break never shows in the result. Output: one row (n,
    * total, gini_micro), NULL when the total is 0. */
  def gini(df: DataFrame, keyCol: String, xCol: Column): DataFrame = {
    val base = df.select(col(keyCol).as("__k"),
      xCol.cast("long").as("__x"))
    val ranked = Layout.globalOrdinals(base, Seq("__x", "__k"), "__i")
    ranked
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("total"),
        sum(col("__i") * col("__x")).as("__six"))
      .select(col("n"), col("total"),
        when(col("total") === 0L, lit(null))
          .otherwise(round(lit(1000000.0)
            * ((lit(2L) * col("__six")
              - (col("n") + lit(1L)) * col("total")).cast("double")
              / (col("n") * col("total")).cast("double")))
            .cast("long")).as("gini_micro"))
  }

  /** LORENZ DECILES of a non-negative integer metric: the value
    * share held by each rank decile — the distributional readout
    * behind [[gini]]'s scalar ("the top decile holds 38%" instead
    * of "G = 0.21"). Deciles are INTEGER rank arithmetic over the
    * same [[graft.operators.Layout.globalOrdinals]] ranking
    * (decile = ((i−1)·10) div n + 1 — no float quantile edges),
    * shares are ⌊10⁶·Σdecile/Σ⌋ with the 1-row total broadcast.
    * Ties straddling a decile boundary split by the key order —
    * boundary-exact either way since equal values contribute
    * equally. Output: (decile, n_rows, decile_cents, share_micro),
    * 10 rows, NULL shares on a zero total. */
  def lorenzDeciles(df: DataFrame, keyCol: String, xCol: Column): DataFrame = {
    val base = df.select(col(keyCol).as("__k"),
      xCol.cast("long").as("__x"))
    val ranked = Layout.globalOrdinals(base, Seq("__x", "__k"), "__i")
    val tot = ranked.agg(count(lit(1)).as("n"), sum(col("__x")).as("total"))
    ranked.crossJoin(broadcast(tot))
      .select(expr("((__i - 1) * 10) div n + 1").as("decile"),
        col("__x"), col("total"))
      .groupBy(col("decile"), col("total"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__x")).as("decile_cents"))
      .select(col("decile"), col("n_rows"), col("decile_cents"),
        when(col("total") === 0L, lit(null))
          .otherwise(expr("(decile_cents * 1000000) div total"))
          .as("share_micro"))
  }

  /** COHEN'S KAPPA between two boolean raters: agreement beyond
    * chance, κ = (p_o − p_e)/(1 − p_e) — the standard
    * inter-annotator / inter-gate consistency audit (do two quality
    * screens, a heuristic and a model, agree more than their base
    * rates force them to?). Raw agreement p_o alone misleads when
    * both raters pass almost everything; κ is the correction.
    *
    * One pass builds the exact 2×2 confusion matrix; κ is lifted to
    * integers by scaling through n² — num = n·(n11+n00) −
    * (r1·c1 + r0·c0), den = n² − (r1·c1 + r0·c0), both exact BIGINT
    * (n² < 2⁶³ ⇒ exact to ~3·10⁹ rows), and the micro ratio is ONE
    * fixed double expression. Output: one row (n, n11, n10, n01,
    * n00, kappa_micro), NULL when p_e = 1 (both raters constant on
    * the same side — κ undefined). */
  def cohenKappa(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val agg = df.select(aCol.as("__a"), bCol.as("__b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__a") && col("__b"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("__a") && !col("__b"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("__a") && col("__b"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("__a") && !col("__b"), 1L).otherwise(0L)).as("n00"))
    val pe = (col("n11") + col("n10")) * (col("n11") + col("n01")) +
      (col("n01") + col("n00")) * (col("n10") + col("n00"))
    val num = col("n") * (col("n11") + col("n00")) - pe
    val den = col("n") * col("n") - pe
    agg.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      when(den === 0L, lit(null))
        .otherwise(round(lit(1000000.0)
          * (num.cast("double") / den.cast("double"))).cast("long"))
        .as("kappa_micro"))
  }

  /** SPEARMAN RANK CORRELATION between two integer metrics:
    * ρ = 1 − 6Σd²/(n(n²−1)) over the rank difference d per row —
    * the monotone-association readout that Pearson misses when the
    * relation is nonlinear or the tails are heavy (does quality
    * score track length? does spend track balance?).
    *
    * Ranks are DETERMINISTIC dense ordinals with ties broken by the
    * caller's unique key (rank = position under ORDER BY (value,
    * key)) — a documented deviation from textbook average-rank ties
    * chosen because it replays bit-for-bit in any engine; on near-
    * continuous metrics the two agree to noise. Ranking runs
    * through [[graft.operators.Layout.globalOrdinals]] (range
    * shuffle + per-partition prefix counts — one long per partition
    * of driver state, never a one-task global sort), Σd² is an
    * exact BIGINT (overflows only past ~2·10⁶ rows — pre-aggregate
    * or sample above that, stated not silent), and ρ is ONE fixed
    * double tree with the denominator built from doubles so no n³
    * integer overflow exists. Output: one row (n, sum_d2,
    * rho_micro), NULL below 2 rows. */
  def spearman(df: DataFrame, keyCol: String, xCol: Column,
      yCol: Column): DataFrame = {
    val base = df.select(col(keyCol).as("__k"),
      xCol.cast("long").as("__x"), yCol.cast("long").as("__y"))
    val rx = Layout.globalOrdinals(base.select(col("__k"), col("__x")),
      Seq("__x", "__k"), "__rx")
    val ry = Layout.globalOrdinals(base.select(col("__k"), col("__y")),
      Seq("__y", "__k"), "__ry")
    def d(c: Column): Column = c.cast("double")
    rx.select(col("__k"), col("__rx"))
      .join(ry.select(col("__k"), col("__ry")), Seq("__k"))
      .select(((col("__rx") - col("__ry"))
        * (col("__rx") - col("__ry"))).as("__d2"))
      .agg(count(lit(1)).as("n"), sum(col("__d2")).as("sum_d2"))
      .select(col("n"), col("sum_d2"),
        when(col("n") < 2L, lit(null))
          .otherwise(round(lit(1000000.0)
            * (lit(1.0) - lit(6.0) * d(col("sum_d2"))
              / (d(col("n")) * (d(col("n")) * d(col("n")) - lit(1.0)))))
            .cast("long")).as("rho_micro"))
  }

  /** Two-sample KOLMOGOROV–SMIRNOV statistic over an integer metric
    * column: D = max_x |F₁(x) − F₂(x)| between the rows where
    * `sideCol` is true (sample 1) and the rest — the
    * distribution-level drift detector (did this week's value
    * distribution shift vs last week's?) that mean/variance
    * monitors miss, e.g. a symmetric fattening of both tails.
    *
    * Exactness: the ECDF difference is kept rational — per distinct
    * value the scaled gap |cum₁·n₂ − cum₂·n₁| is exact BIGINT, the
    * max is order-free, and only the final `round(10⁶·D_scaled /
    * (n₁·n₂))` is ONE fixed double expression. Bounds: n₁·n₂ < 2⁶³
    * ⇒ exact up to ~3·10⁹ rows per side; past that, pre-aggregate
    * to a quantized grid upstream (which this already groups by).
    *
    * Shape: one map-combined groupBy collapses the row mass to
    * |distinct values| count rows; the prefix sum over them is a
    * global window BOUNDED BY THE QUANTIZED VALUE DOMAIN, not the
    * data (the q162 AUC / q182 skyline whitelist pattern); totals
    * ride a 1-row broadcast. Output: one row (n1, n2, d_scaled,
    * ks_micro), ks_micro NULL when either sample is empty. */
  def ksTwoSample(df: DataFrame, sideCol: Column, xCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byV = df.select(xCol.cast("long").as("__x"), sideCol.as("__a"))
      .groupBy(col("__x"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("c2"))
    val w = Window.orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byV
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("cum2", sum(col("c2")).over(w))
    val tot = byV.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    cum.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("__d"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("__d")).as("d_scaled"))
      .select(col("n1"), col("n2"), col("d_scaled"),
        when(col("n1") === 0L || col("n2") === 0L, lit(null))
          .otherwise(round(lit(1000000.0)
            * (col("d_scaled").cast("double")
              / (col("n1") * col("n2")).cast("double")))
            .cast("long")).as("ks_micro"))
  }

  /** CUSUM CHANGEPOINT detection over an integer-indexed series:
    * the cumulative sum of deviations from the global mean,
    * S_t = Σ_{i≤t}(x_i − x̄), peaks in magnitude AT the changepoint
    * when a level shift exists — the classic single-changepoint
    * locator (deploy regressions, data-source swaps, crawl-mix
    * changes) that per-point thresholds miss because no single
    * point is anomalous.
    *
    * Exactness: mean-centering is lifted to integers through n
    * (y_t = n·x_t − Σx, the [[autocorrelation]] scaling), so every
    * prefix sum is exact BIGINT and argmax/max are order-free; ties
    * break to the EARLIEST index. The magnitude is also reported
    * relative to the series' total absolute deviation as
    * `cusum_rel_micro` = ⌊10⁶·max|S|/Σ|y|⌋ — a scale-free 0..~10⁶
    * shift-strength score with no distributional constant baked in.
    *
    * Shape: callers aggregate to the series grain first (the
    * reduction carries the 100 TB mass); the prefix sum over the
    * series is a global window bounded by the time-bucket domain
    * (the q162/q212 whitelist pattern); the two totals ride 1-row
    * broadcasts. Output: one row (n, cp_t, s_abs_max, sum_abs_dev,
    * cusum_rel_micro) — cp_t NULL on a constant series. */
  def cusumChangepoint(series: DataFrame, tCol: String, xCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = series.select(col(tCol).cast("long").as("__t"),
      col(xCol).cast("long").as("__x"))
    val tot = base.agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
    val y = base.crossJoin(broadcast(tot))
      .select(col("__t"), col("__n"),
        (col("__n") * col("__x") - col("__s")).as("__y"))
    val w = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = y.withColumn("__cs", sum(col("__y")).over(w))
    val mx = pre.agg(count(lit(1)).as("n"),
      max(abs(col("__cs"))).as("s_abs_max"),
      sum(abs(col("__y"))).as("sum_abs_dev"))
    pre.crossJoin(broadcast(mx))
      .filter(abs(col("__cs")) === col("s_abs_max"))
      .groupBy(col("n"), col("s_abs_max"), col("sum_abs_dev"))
      .agg(min(col("__t")).as("__cp"))
      .select(col("n"),
        when(col("sum_abs_dev") === 0L, lit(null)).otherwise(col("__cp"))
          .as("cp_t"),
        col("s_abs_max"), col("sum_abs_dev"),
        when(col("sum_abs_dev") === 0L, lit(null))
          .otherwise(floor(col("s_abs_max").cast("double") * lit(1000000.0)
            / col("sum_abs_dev").cast("double")).cast("long"))
          .as("cusum_rel_micro"))
  }

  /** Sample AUTOCORRELATION FUNCTION of an integer-indexed series:
    * for each lag k ∈ [1, maxLag], r_k = Σ_t (x_t−x̄)(x_{t−k}−x̄) /
    * Σ_t (x_t−x̄)² — the seasonality / burst-memory detector that
    * tells a pipeline which lag its forecaster (q183 Holt-Winters)
    * or its drift monitor should key on.
    *
    * Cross-engine exactness: centering by the rational mean is
    * lifted to integers by scaling through n — y_t = n·x_t − Σx is
    * exact BIGINT, and n²-scaling cancels in the ratio, so
    * numerator and denominator are both order-free integer sums;
    * the final `round(10⁶·num/den)` is ONE fixed double expression
    * (the q117 OLS discipline). Bounds: |y| ≤ n·max|x−x̄|, so y²
    * sums stay under 2⁶³ for any cents-scale daily series shorter
    * than ~10⁴ points — callers aggregate to the series grain
    * first, which is also the scale story: the heavy reduction
    * (raw rows → one row per t) happens upstream; everything here
    * is linear in n·maxLag with the two totals riding 1-row
    * broadcasts and lag pairing one equi-join on t.
    *
    * Output: (lag, n_pairs, acf_micro), acf_micro NULL on a
    * zero-variance series. */
  def autocorrelation(series: DataFrame, tCol: String, xCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val base = series.select(col(tCol).cast("long").as("__t"),
      col(xCol).cast("long").as("__x"))
    val tot = base.agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
    val y = base.crossJoin(broadcast(tot))
      .select(col("__t"), (col("__n") * col("__x") - col("__s")).as("__y"))
    val den = y.agg(sum(col("__y") * col("__y")).as("__den"))
    val nums = y
      .select(col("__t"), col("__y").as("__ya"),
        explode(expr(s"sequence(1, $maxLag)")).as("lag"))
      .select(col("lag"), (col("__t") - col("lag")).as("__tb"),
        col("__ya"))
      .join(y.select(col("__t").as("__tb"), col("__y").as("__yb")),
        Seq("__tb"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__ya") * col("__yb")).as("__num"))
    nums.crossJoin(broadcast(den))
      .select(col("lag").cast("long").as("lag"), col("n_pairs"),
        when(col("__den") === 0L, lit(null))
          .otherwise(round(lit(1000000)
            * (col("__num").cast("double") / col("__den").cast("double")))
            .cast("long")).as("acf_micro"))
  }

  /** k-ANONYMITY / l-DIVERSITY audit of a table against a
    * quasi-identifier set — the release-compliance check a dataset
    * runs before leaving the curation pipeline (Sweeney's k-anonymity;
    * Machanavajjhala's l-diversity): every row must share its
    * quasi-identifier combination with ≥ k−1 others, and each such
    * equivalence class must carry ≥ l distinct sensitive values
    * (k alone fails under homogeneity — a size-50 class whose
    * sensitive value is constant still discloses it).
    *
    * Output: one row per equivalence class — the quasi columns,
    * `class_size`, `l_distinct`, and the two flags. Shape: ONE
    * map-side-combining aggregate keyed on the quasi columns
    * (`countDistinct` rewrites to a two-phase exact distinct) — at
    * 100 TB this is a plain corpus-keyed pass, no joins, and the
    * output is bounded by the quasi-identifier domain, not the row
    * count. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int = 2): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1 && l >= 1,
      "need quasi columns and positive k, l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("k_anonymous", col("class_size") >= k.toLong)
      .withColumn("l_diverse", col("l_distinct") >= l.toLong)
  }
}
