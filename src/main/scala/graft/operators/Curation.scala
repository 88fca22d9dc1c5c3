package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset curation for training pipelines: deterministic sampling
  * and train/validation/test splitting at corpus scale.
  *
  * Both are PURE PROJECTIONS over a content-independent md5 hash of
  * the document id — no shuffle, no RNG state, no sample() seed tied
  * to a partitioning: the same (id, salt) lands in the same
  * split/sample on any cluster, any partition layout, any Spark
  * version. That is the property a 100 TB corpus needs for
  * INCREMENTAL curation — newly crawled documents join the right
  * split on arrival and old documents never migrate, so a held-out
  * set stays held out across re-runs. (Spark's `df.sample` is
  * partition-dependent and re-rolls on every layout change — unusable
  * as a stable split.) md5 keeps it cross-engine-reproducible, the
  * same rationale as [[Dedup]].
  */
object Curation {

  /** 56-bit uniform hash of (salt, id) — the sampling coordinate.
    * Salt separates independent draws: a 10% sample with one salt and
    * a split with another are statistically independent. */
  def sampleHash(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), id.cast("string"))), 1, 14), 16, 10)
      .cast("long")

  /** Membership predicate of the deterministic `num/den` sample. */
  def inSample(id: Column, num: Int, den: Int, salt: String = "graft"): Column = {
    require(num >= 0 && num <= den && den > 0, "need 0 <= num <= den, den > 0")
    pmod(sampleHash(id, salt), lit(den.toLong)) < num.toLong
  }

  /** Keep a deterministic, partition-invariant `num/den` fraction. */
  def deterministicSample(df: DataFrame, idCol: String, num: Int, den: Int,
                          salt: String = "graft"): DataFrame =
    df.filter(inSample(col(idCol), num, den, salt))

  /** Split label for the given integer weights (e.g. train→90,
    * valid→5, test→5): cumulative ranges over pmod(hash, Σweights). */
  def splitLabel(id: Column, weights: Seq[(String, Int)],
                 salt: String = "graft"): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "need at least one positive weight")
    val total = weights.map(_._2).sum
    val h = pmod(sampleHash(id, salt), lit(total.toLong))
    val upperBounds = weights.map(_._2).scanLeft(0)(_ + _).tail
    weights.map(_._1).zip(upperBounds).init
      .foldRight(lit(weights.last._1): Column) { case ((name, ub), rest) =>
        when(h < ub.toLong, lit(name)).otherwise(rest)
      }
  }

  /** Leakage-safe GROUPED split: hash the GROUP key (domain, author,
    * source...) instead of the row id, so every row sharing the key
    * lands in the SAME split — the split rule that keeps a domain's
    * near-duplicate pages from straddling train and test (row-id
    * splits leak: two scrapes of one page land in different splits
    * and the eval set scores memorization). Pure projection — the
    * hash is computed per row from the key value, no shuffle, no
    * group materialization; identical key ⇒ identical label by
    * construction. */
  def groupedSplit(df: DataFrame, groupKey: Column,
                   weights: Seq[(String, Int)],
                   salt: String = "graft"): DataFrame =
    df.withColumn("split", splitLabel(groupKey, weights, salt))

  /** Crawl-frontier POLITENESS interleave: `wave` = the row's arrival
    * rank within its domain (1-based), `fetch_key` = the salted hash
    * of (domain, wave). Ordering the frontier by (wave, fetch_key,
    * id) yields a fetch schedule where every domain appears AT MOST
    * ONCE per wave — consecutive fetches of one domain are ~|active
    * domains| apart, the politeness spacing a crawler owes each host
    * — and the within-wave order is deterministically shuffled so no
    * domain is systematically first. One domain-keyed window (shuffle
    * on the domain, per-domain sort bounded by the domain's own
    * frontier), no global sort — the ORDER is carried by the key
    * columns, not a global row number. */
  def frontierInterleave(df: DataFrame, idCol: String, domainCol: String,
                         salt: String = "frontier"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(col(idCol))
    df.withColumn("wave", row_number().over(w).cast("long"))
      .withColumn("fetch_key",
        sampleHash(concat(col(domainCol), lit(":"), col("wave").cast("string")),
          salt))
  }

  /** Assign every row its deterministic split label. */
  def deterministicSplit(df: DataFrame, idCol: String,
                         weights: Seq[(String, Int)],
                         salt: String = "graft",
                         outCol: String = "split"): DataFrame =
    df.withColumn(outCol, splitLabel(col(idCol), weights, salt))

  /** Deterministic IMPORTANCE sampling: keep each row with
    * probability `weight` (clamped to [0,1]) — "sample high-quality
    * documents preferentially", the score-weighted counterpart of
    * [[deterministicSample]]. Selection is `hash < floor(w · 2⁵⁶)`
    * on the salted md5 coordinate: membership is a pure projection
    * (partition-invariant, stable under corpus growth), and any
    * engine computing the same weight doubles selects the same rows
    * (the floor product is exact IEEE arithmetic on both sides).
    * A weight that ROUNDS differently across engines would flip a
    * row only if its 56-bit hash hit the one boundary value —
    * probability 2⁻⁵⁶ per row. */
  def importanceSample(df: DataFrame, idCol: String, weight: Column,
                       salt: String = "imp"): DataFrame = {
    val w = least(greatest(weight.cast("double"), lit(0.0)), lit(1.0))
    df.filter(sampleHash(col(idCol), salt) <
      floor(w * lit(72057594037927936.0)).cast("long")) // 2^56
  }

  /** Deterministic weighted sample WITHOUT replacement of EXACTLY
    * `k` rows (Efraimidis–Spirakis A-ES): each row draws the uniform
    * u = (hash+1)/2⁵⁶ from the salted md5 coordinate and keys on
    * ln(u)/w; the k largest keys (ties broken by id) are the sample.
    * P(row first) = wᵢ/Σw, then recursively on the remainder — the
    * exact-size companion to [[importanceSample]]'s per-row
    * Bernoulli: quota-filling ("give me exactly k docs, favoring
    * high quality") needs a fixed k, not a fixed rate.
    *
    * Scale shape: a pure projection followed by a global top-k —
    * Spark plans `orderBy(...).limit(k)` as TakeOrderedAndProject
    * (per-partition k-heaps, driver merges P·k rows), so NOTHING
    * shuffles; corpus growth costs one scan. Membership is
    * partition-invariant and stable under growth (a new row displaces
    * at most the current k-th member).
    *
    * Cross-engine: the key is quantized to integer micros
    * (`round(ln(u)/w · 10⁶)`) so an oracle replays selection with
    * integer compares; rows with weight ≤ 0 are never sampled.
    * Output: the sampled rows' (id, weight, key_micro). */
  /** The A-ES selection key `round(ln(u)/w · 10⁶)` as a column, with
    * u = (hash+1)/2⁵⁶ — factored out so batch
    * ([[weightedSampleWithoutReplacement]]) and streaming
    * (StreamOps' running sample) draw from the IDENTICAL expression
    * tree; `weight` must already be a positive double. */
  def aesKeyMicro(id: Column, weight: Column, salt: String): Column = {
    val u = (sampleHash(id, salt) + lit(1L)).cast("double") /
      lit(72057594037927936.0) // 2^56; u in (0, 1]
    round(log(u) / weight * lit(1000000.0)).cast("long")
  }

  def weightedSampleWithoutReplacement(df: DataFrame, idCol: String,
      weight: Column, k: Int, salt: String = "wsr"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    df.select(col(idCol), weight.cast("double").as("weight"))
      .filter(col("weight") > 0.0)
      .withColumn("key_micro",
        aesKeyMicro(col(idCol), col("weight"), salt))
      .orderBy(col("key_micro").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic per-group cap: keep at most `maxPerGroup` rows of
    * every group (domain, source, language — the "no domain dominates
    * the corpus" rule of web-scale curation), selected by salted-hash
    * priority so the kept set is partition-invariant and stable under
    * corpus growth within a group's first `maxPerGroup` hash ranks.
    *
    * Scale shape: the obvious `row_number() OVER (PARTITION BY
    * group)` form shuffles EVERY row on the group key — and a group
    * key is exactly where real corpora are skewed (one domain with
    * 10⁹ pages lands in one partition and full-sorts there). Here the
    * selection runs as a bounded top-k heap aggregate
    * ([[graft.functions.TopKByScoreAgg]]): map-side partials mean the
    * group-keyed shuffle carries k-entry states instead of rows, and
    * the full-width table only shuffles in the final semi-join keyed
    * on the UNIQUE id — no skew, no sort anywhere.
    *
    * The 52-bit hash (13 hex chars) is exact in double, so the heap's
    * (score DESC, id ASC) order is exactly (hash ASC, id ASC) — the
    * order an oracle engine computes on the integer hash. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
                  maxPerGroup: Int, salt: String = "graft"): DataFrame = {
    require(maxPerGroup >= 1, "maxPerGroup must be >= 1")
    val h52 = conv(substring(
        md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))), 1, 13),
      16, 10).cast("long")
    val picks = df
      .select(col(groupCol), col(idCol).cast("long").as("__cap_id"), h52.as("__h"))
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKByScoreAgg.topK(
        -col("__h").cast("double"), col("__cap_id"), maxPerGroup).as("__picks"))
      .select(explode(col("__picks")).as("__p"))
      .select(col("__p.id").as("__keep_id"))
    df.join(picks, col(idCol).cast("long") === col("__keep_id"), "left_semi")
  }

  /** Per-GROUP exact-k weighted sample without replacement — the
    * quality-weighted refinement of [[capPerGroup]]: within every
    * group (domain, source, language), keep exactly k rows drawn
    * ∝ weight by the A-ES key ([[aesKeyMicro]] — deterministic,
    * partition-invariant, oracle-replayable), the "k docs per
    * domain, favoring high quality" quota sampler.
    *
    * Same skew-proof shape as the cap: the per-group selection is a
    * bounded top-k HEAP aggregate (`TopKByScoreAgg` on the integer
    * key), so the group-keyed shuffle carries k-entry states, not
    * rows — a 10⁹-page domain costs its scan, never a per-group
    * sort. Output: (groupCol, idCol, weight, key_micro), the sampled
    * rows with their selection keys. */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, idCol: String,
      weight: Column, k: Int, salt: String = "wsrg"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val keyed = df
      .select(col(groupCol), col(idCol).cast("long").as("__wid"),
        weight.cast("double").as("__w"))
      .filter(col("__w") > 0.0)
      .withColumn("__key", aesKeyMicro(col("__wid"), col("__w"), salt))
    keyed
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKByScoreAgg.topK(
        col("__key").cast("double"), col("__wid"), k).as("__picks"))
      .select(col(groupCol), explode(col("__picks")).as("__p"))
      .select(col(groupCol), col("__p.id").as("__wid"))
      .join(keyed, Seq(groupCol, "__wid"))
      .select(col(groupCol), col("__wid").as(idCol),
        col("__w").as("weight"), col("__key").as("key_micro"))
  }

  /** Concat-and-chunk sequence packing — the standard LLM-pretraining
    * batch prep: documents are laid out in deterministic id order and
    * chunked at `budget` tokens; `pack_id` is the training sequence a
    * document STARTS in and `pack_offset` its token position there
    * (documents may straddle pack boundaries, exactly as the
    * concatenated-corpus approach trains).
    *
    * Packing is a running sum, inherently sequential — so it runs
    * per `partCols` shard (split, language, bucket): one shuffle
    * keyed on the shard, each shard's window independent. A single
    * global pack stream would serialize the corpus through one
    * partition; per-shard packing is what a 100 TB pipeline does
    * anyway (each training shard is packed independently). */
  /** Deterministic downsample to a TARGET MIXTURE — the "data mix"
    * step of corpus assembly (e.g. 3 parts curated : 2 parts books :
    * 1 part web). Output proportions match integer `weights` exactly
    * in expectation, at the largest total the corpus can supply
    * without upsampling: the binding source (min nₛ/wₛ) is kept
    * whole and every other source thins to rate (nₘ·wₛ)/(wₘ·nₛ).
    *
    * Selection is `pmod(md5-hash, den) < num` with num/den the EXACT
    * integer rationals above — no float thresholds, so any engine
    * computing the same integers selects the same rows, and
    * membership inherits [[sampleHash]]'s partition-invariance (a
    * kept document stays kept when re-run on any layout). Per-source
    * counts are one map-side-combining agg; rates join back broadcast
    * (sources are a catalog, not data); the corpus itself is a single
    * scan + filter — no shuffle of the big table at all.
    *
    * @param weights  integer mixture parts per source value; sources
    *                 not listed get `defaultWeight`. Ratio ordering
    *                 uses IEEE division of the same longs in every
    *                 engine, tie-broken by source value. */
  def resampleToMixture(df: DataFrame, sourceCol: String, idCol: String,
                        weights: Seq[(String, Int)], defaultWeight: Int = 1,
                        salt: String = "mix"): DataFrame = {
    require(weights.forall(_._2 > 0) && defaultWeight > 0,
      "weights must be positive")
    val wExpr = weights.foldRight(lit(defaultWeight): Column) {
      case ((s, w), rest) => when(col(sourceCol) === s, lit(w)).otherwise(rest)
    }
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", wExpr.cast("long"))
    val binding = counts
      .agg(min_by(struct(col("__n"), col("__w")),
        struct(col("__n").cast("double") / col("__w"), col(sourceCol))).as("__m"))
      .select(col("__m.__n").as("__mn"), col("__m.__w").as("__mw"))
    df.join(broadcast(counts), sourceCol)
      .crossJoin(broadcast(binding))
      .filter(pmod(sampleHash(col(idCol), salt), col("__mw") * col("__n")) <
        col("__mn") * col("__w"))
      .drop("__n", "__w", "__mn", "__mw")
  }

  /** EXACT-total mixture quotas by largest-remainder (Hamilton)
    * apportionment: split `budget` rows across the distinct values of
    * `keyCol` proportionally to their counts, summing to EXACTLY the
    * budget — where [[resampleToMixture]]'s rate filter is
    * expectation-exact, this is the form a fixed token/row budget
    * needs. All integer arithmetic: base = floor(B·n/N), scaled
    * remainder B·n − base·N, the B − Σbase leftovers going to the
    * largest remainders (ties → key asc) — deterministic on every
    * engine, no float shares. The quota table is keyed by a CATALOG
    * (sources/domains), so the global remainder-rank window is
    * catalog-sized by contract; corpus data never enters this
    * operator — pass it the already-aggregated frame or the raw rows
    * (one map-side-combining count either way).
    * Output: (keyCol, n_docs, quota). */
  def largestRemainderQuotas(df: DataFrame, keyCol: String,
                             budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val counts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).as("__tot"))
    val based = counts.crossJoin(broadcast(tot))
      .withColumn("__base", expr(s"($budget * n_docs) div __tot"))
      .withColumn("__rem",
        lit(budget) * col("n_docs") - col("__base") * col("__tot"))
    val leftover = based.agg((lit(budget) - sum(col("__base"))).as("__left"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col(keyCol))
    based
      .withColumn("__rk", row_number().over(w))
      .crossJoin(broadcast(leftover))
      .select(col(keyCol), col("n_docs"),
        (col("__base") + when(col("__rk") <= col("__left"), lit(1L))
          .otherwise(lit(0L))).as("quota"))
  }

  /** TEMPERATURE-based mixture quotas — the multilingual sampling
    * rule (mBERT/XLM's α-sampling): per-key quota ∝ n^α with
    * α ∈ (0, 1), flattening the head so low-resource keys are
    * up-sampled relative to raw proportions (α = 1 reproduces
    * [[largestRemainderQuotas]]; α → 0 approaches uniform). The
    * power weight is micro-quantized ONCE
    * (`round(n^α·10⁶)` — one pow per KEY, never per row) and the
    * budget is apportioned over the integer weights by the exact
    * largest-remainder rule, so quotas sum to the budget and replay
    * cross-engine. Shape: one keyed count, |keys|-row arithmetic. */
  def temperatureQuotas(df: DataFrame, keyCol: String, budget: Long,
      alpha: Double): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val counts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__wd",
        round(pow(col("n_docs").cast("double"), lit(alpha)) * 1e6))
      // fail loudly (not wrap) if n^α·10⁶ ever exceeds Long — needs
      // ~9.2e12 docs under ONE key, but a silent wrap here would
      // corrupt every quota downstream
      .withColumn("weight_micros",
        when(col("__wd") > lit(9.0e18),
          raise_error(concat(
            lit("temperatureQuotas: weight_micros overflows Long for key "),
            col(keyCol).cast("string"))).cast("long"))
          .otherwise(col("__wd").cast("long")))
      .drop("__wd")
    val tot = counts.agg(sum(col("weight_micros")).as("__tot"))
    // budget·weight_micros exceeds Long at realistic corpus scale
    // (budget ~1e7 × weight ~3e12 ≈ 3e19), so apportionment runs in
    // Decimal(38,0): products stay ≤ 38 digits by the guard above,
    // and `div` (IntegralDivide) is exact on decimals
    val based = counts.crossJoin(broadcast(tot))
      .withColumn("__base", expr(
        s"(cast($budget as decimal(38,0)) * cast(weight_micros as " +
          "decimal(38,0))) div cast(__tot as decimal(38,0))"))
      .withColumn("__rem",
        lit(budget).cast("decimal(38,0)") *
          col("weight_micros").cast("decimal(38,0)") -
          col("__base").cast("decimal(38,0)") *
          col("__tot").cast("decimal(38,0)"))
    val leftover = based.agg((lit(budget) - sum(col("__base"))).as("__left"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col(keyCol))
    based
      .withColumn("__rk", row_number().over(w))
      .crossJoin(broadcast(leftover))
      .select(col(keyCol), col("n_docs"), col("weight_micros"),
        (col("__base") + when(col("__rk") <= col("__left"), lit(1L))
          .otherwise(lit(0L))).as("quota"))
  }

  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, partCols: Seq[String]): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols.map(col): _*).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__start", sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("pack_id", floor(col("__start") / budget))
      .withColumn("pack_offset", col("__start") - col("pack_id") * budget)
      .drop("__start")
  }

  /** Data-constrained EPOCH ALLOCATION (the Muennighoff et al. 2023
    * repetition recipe): given per-key token masses, a quality
    * ordering, a token budget, and a maximum repeat count, fill the
    * budget greedily in quality order — each key serves up to
    * `maxEpochs` full epochs of its tokens; the key that straddles
    * the budget boundary serves a FRACTIONAL epoch; everything after
    * it serves zero. This is how a data-constrained pretraining run
    * actually spends its budget: repeat the cleanest sources up to
    * ~4 epochs before touching the noisier tail.
    *
    * All arithmetic is exact: the cumulative fill is an integer
    * prefix sum, the fractional epoch is `served·10⁶ div n_tokens`
    * computed in Decimal(38,0) (token masses at 100 TB overflow the
    * `served·10⁶` Long product). Input rows are one per KEY
    * (catalog-sized by contract), so the rank/prefix-sum global
    * window sorts a handful of rows, never the corpus. Expects
    * `budgetCol` already crossed on (a 1-row broadcast). */
  def epochAllocation(srcStats: DataFrame, keyCol: String,
      tokenCol: String, qualityCol: String, budgetCol: String,
      maxEpochs: Int): DataFrame = {
    require(maxEpochs > 0, "maxEpochs must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(qualityCol), col(keyCol))
    val cumW = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    srcStats
      .withColumn("__cap", col(tokenCol) * lit(maxEpochs.toLong))
      .withColumn("q_rank", row_number().over(w).cast("long"))
      .withColumn("__before", coalesce(sum(col("__cap")).over(cumW), lit(0L)))
      .withColumn("served_tokens",
        greatest(lit(0L), least(col("__cap"), col(budgetCol) - col("__before"))))
      .withColumn("epochs_micros",
        coalesce(expr(
          s"cast((cast(served_tokens as decimal(38,0)) * 1000000) div " +
            s"cast($tokenCol as decimal(38,0)) as long)"), lit(0L)))
      .drop("__cap", "__before")
  }

  /** DoReMi-LITE domain reweighting (Xie et al. 2023, the certifiable
    * slice): Group-DRO-flavored multiplicative weights over domains,
    * iterated with SELECTION FEEDBACK under a FROZEN per-doc proxy
    * loss. Each round, domain d's emphasized slice is its hardest
    * `max(1, n_d·w_d div 10⁶)` docs by loss (DRO emphasizes high
    * loss); the domain's excess = mean emphasized loss − global mean
    * emphasized loss; the weight updates multiplicatively
    * `w ← clamp(w·(10⁶ + step) div 10⁶, 1, 10⁶)` with
    * `step = clamp(floor(excess / etaDen), ±stepCap)`. Rounds
    * genuinely interact: a down-weighted domain's slice narrows to
    * its hardest docs, raising its measured mean back up — the DRO
    * self-correction that keeps easy domains from collapsing to
    * zero. (Full DoReMi retrains the proxy under the current
    * mixture; the frozen-proxy + selection-feedback slice keeps
    * every round exact integer arithmetic a DuckDB oracle replays
    * unrolled.)
    *
    * Weights are driver-paced parameter state (the BPE-merge-table
    * posture): per round, ONE catalog-sized per-domain aggregate is
    * collected; the corpus-sized frame is pinned once. Returns long
    * form (group, round, w_micros, share_micros) — share is the
    * round's normalized mixture. */
  def doremiWeights(perDoc: DataFrame, groupCol: String, idCol: String,
      lossCol: String, rounds: Int, etaDen: Long,
      stepCap: Long = 500000L): DataFrame = {
    require(rounds >= 1 && etaDen > 0 && stepCap > 0,
      "rounds, etaDen, stepCap must be positive")
    val spark = perDoc.sparkSession
    import spark.implicits._
    val pinned = perDoc.select(col(groupCol).as("__g"),
        col(idCol).as("__id"), col(lossCol).as("__loss"))
      .localCheckpoint(true)
    val counts = pinned.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val domains = counts.keys.toSeq.sorted
    var w = domains.map(_ -> 1000000L).toMap
    val hist = scala.collection.mutable.ArrayBuffer.empty[Map[String, Long]]
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g"))
      .orderBy(col("__loss").desc, col("__id"))
    for (_ <- 1 to rounds) {
      val wDf = domains.map(d => (d, w(d), counts(d)))
        .toDF("__g", "__w", "__n")
      val sel = pinned.join(broadcast(wDf), Seq("__g"))
        .withColumn("__k",
          greatest(lit(1L), expr("(__n * __w) div 1000000")))
        .withColumn("__rn", row_number().over(rankW).cast("long"))
        .filter(col("__rn") <= col("__k"))
      val stats = sel.groupBy(col("__g"))
        .agg(sum(col("__loss")).as("__s"), count(lit(1)).as("__c"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val gs = stats.values.map(_._1).sum
      val gc = stats.values.map(_._2).sum
      val mg = gs / gc // losses non-negative: / == floor in both engines
      w = domains.map { d =>
        val (sD, cD) = stats(d)
        val step0 = Math.floorDiv(sD / cD - mg, etaDen)
        val step = Math.max(-stepCap, Math.min(stepCap, step0))
        d -> Math.max(1L, Math.min(1000000L,
          w(d) * (1000000L + step) / 1000000L))
      }.toMap
      hist += w
    }
    hist.zipWithIndex.flatMap { case (wr, i) =>
      val tot = domains.map(wr).sum
      domains.map(d =>
        (d, (i + 1).toLong, wr(d), wr(d) * 1000000L / tot))
    }.toSeq.toDF(groupCol, "round", "w_micros", "share_micros")
  }

  /** EPOCH SCHEDULE — [[epochAllocation]] made executable: for every
    * key serving `epochs_micros`, emit the doc instances of each
    * epoch. Full epochs (e ≤ micros div 10⁶) serve EVERY doc,
    * reshuffled per epoch by the salted hash (each epoch has its own
    * deterministic order — the data-loader reshuffle). The fractional
    * tail epoch serves the hash-ordered PREFIX whose cumulative
    * token mass fits `rem·n_tokens div 10⁶` (Decimal-exact — the
    * product overflows Long at corpus scale): docs stream in shuffle
    * order until the fractional budget is spent. Returns one row per
    * (key, epoch, doc) with the serve-order hash, so a digest over
    * the ordered stream certifies content AND order.
    *
    * Scale shape: docs × epochs is ≤ maxEpochs+1 replication; the
    * only windows are per-(key, epoch) — never global. */
  def epochSchedule(perDoc: DataFrame, keyCol: String, idCol: String,
      tokenCol: String, alloc: DataFrame, salt: String): DataFrame = {
    val keyTok = perDoc.groupBy(col(keyCol))
      .agg(sum(col(tokenCol)).as("__ktok"))
    val a = alloc.select(col(keyCol), col("epochs_micros"))
      .join(keyTok, Seq(keyCol))
      .withColumn("__full", expr("epochs_micros div 1000000"))
      .withColumn("__rem", col("epochs_micros") - col("__full") * 1000000L)
      .withColumn("__ne",
        col("__full") + when(col("__rem") > 0, 1L).otherwise(0L))
      .withColumn("__fractok", expr(
        "cast((cast(__rem as decimal(38,0)) * cast(__ktok as " +
          "decimal(38,0))) div 1000000 as long)"))
      .filter(col("__ne") > 0)
    val exploded = perDoc.join(broadcast(a), Seq(keyCol))
      .withColumn("epoch", explode(sequence(lit(1L), col("__ne"))))
      .withColumn("__h", conv(substring(md5(concat(
          lit(s"$salt:"), col("epoch").cast("string"), lit(":"),
          col(idCol).cast("string"))), 1, 14), 16, 10).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("epoch"))
      .orderBy(col("__h"), col(idCol))
    exploded
      .withColumn("__before", coalesce(sum(col(tokenCol)).over(
        w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          -1)), lit(0L)))
      .filter(col("epoch") <= col("__full") ||
        col("__before") < col("__fractok"))
      .withColumn("serve_rank", row_number().over(w).cast("long"))
      .select(col(keyCol), col("epoch"), col(idCol), col(tokenCol),
        col("serve_rank"))
  }

  /** Deterministic training-order shuffle + sharding — the last stage
    * before a corpus ships to a trainer: every row gets a `shard`
    * (uniform over nShards via the salted 56-bit hash) and a `pos`
    * within its shard (hash order, id tie-break), so any worker can
    * reconstruct exactly its slice with no coordination and a re-run
    * yields byte-identical order. One shuffle, keyed on the shard —
    * the per-shard sort is each writer's local order at 100 TB
    * (shards are sized to a worker, not to the corpus). */
  def shardAndOrder(df: DataFrame, idCol: String, nShards: Int,
                    salt: String = "order"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = sampleHash(col(idCol), salt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Corpus snapshot DIFF — the incremental-crawl audit between two
    * corpus versions: which documents were added, deleted, changed
    * (same id, different content), or carried unchanged. The report
    * every re-crawl / re-scrape cycle publishes before the delta is
    * admitted downstream (and the input to incremental dedup /
    * re-embedding: only `added`+`changed` rows need work — the
    * batch counterpart of the streaming CDC paths q93/q97).
    *
    * Scale shape: each side is first REDUCED to (id, md5) — the
    * content column never crosses the shuffle — then one
    * co-partitioned full-outer hash join on the id. No broadcast
    * assumption: both snapshots are corpus-sized.
    * Output: (idCol, status, old_md5, new_md5). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   contentCol: String): DataFrame = {
    def keyed(df: DataFrame, mdCol: String) =
      df.select(col(idCol), md5(col(contentCol)).as(mdCol))
    keyed(oldDf, "old_md5")
      .join(keyed(newDf, "new_md5"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("deleted"))
          .when(col("old_md5") =!= col("new_md5"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("old_md5"), col("new_md5"))
  }

  /** Hashed-unigram bucket id for the DSIR features: the salted
    * 56-bit md5 hash of the token folded into `buckets` — the same
    * engine-portable hash family as [[sampleHash]], so the oracle
    * restates it verbatim. */
  def featureBucket(tok: Column, buckets: Int, salt: String = "dsir"): Column =
    pmod(sampleHash(tok, salt), lit(buckets.toLong))

  /** DSIR importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every raw document by how
    * much more likely its hashed-unigram features are under a small
    * TARGET corpus than under the raw corpus itself —
    * `weight = Σ_tokens ln(p_target(b)/p_raw(b))`, with add-one
    * smoothing over the `buckets`-sized feature space so unseen
    * buckets stay finite. Hashing replaces the vocabulary with a
    * fixed-size table, which is the whole trick: both "models" are
    * ONE `buckets`-row count aggregate each, however large the
    * corpus.
    *
    * Exactness: per-(doc,bucket) counts × `round(ln(ratio)·10⁶)` —
    * the q86/q104 integer-micro discipline, order-independent and
    * oracle-replayable. Output per raw doc: `n_tokens`,
    * `weight_micros`.
    *
    * Scale shape: two bucket-keyed count aggregates (target, raw —
    * each `buckets` rows, broadcastable by construction), the raw
    * side pre-aggregated per (doc, bucket) before its single join,
    * 1-row totals broadcast. Nothing grows with the vocabulary. */
  /** The fitted DSIR model — bucket count tables + 1-row totals, a
    * parameter-sized frame trio (≤ `buckets` rows each) that
    * broadcasts at every scoring site. Train once offline, score any
    * batch or stream against the FROZEN counts (the q157
    * train-offline/gate-online shape). */
  final case class DsirModel(targetBuckets: DataFrame, rawBuckets: DataFrame,
      totals: DataFrame, buckets: Int, salt: String)

  /** Fit a [[DsirModel]]: one bucket-keyed count aggregate per corpus
    * (target and raw) plus the 1-row totals. */
  def dsirTrain(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int = 1024, salt: String = "dsir"): DsirModel = {
    require(buckets >= 2, "need at least two feature buckets")
    def toks(df: DataFrame) =
      df.select(explode(split(lower(col(textCol)), "\\s+")).as("__tok"))
        .filter(col("__tok") =!= "")
    // NO pins on the bucket tables (tried r16, reverted on a
    // same-session A/B: q248/q249 flat — the double tokenization the
    // pins remove overlaps inside one wide job, and two eager
    // 1024-row checkpoint jobs per model bought nothing back)
    val tb = toks(target)
      .select(featureBucket(col("__tok"), buckets, salt).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__ct"))
    val rb = toks(raw)
      .select(featureBucket(col("__tok"), buckets, salt).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__cr"))
    val totals = tb.agg(sum(col("__ct")).as("__nt"))
      .crossJoin(rb.agg(sum(col("__cr")).as("__nr")))
    DsirModel(tb, rb, totals, buckets, salt)
  }

  /** Score documents against a FROZEN [[DsirModel]]: per-doc
    * `n_tokens` and `weight_micros` = Σ round(ln(p_t(b)/p_r(b))·10⁶)
    * with add-one smoothing on BOTH sides, so buckets the model never
    * saw (new-crawl vocabulary) stay finite — the property that lets
    * the same scorer gate an unbounded stream. One keyed per-(doc,
    * bucket) pre-aggregation, two broadcast joins, 1-row totals;
    * nothing grows with the model corpus. */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
      model: DsirModel): DataFrame = {
    val bd = lit(model.buckets.toLong)
    docs.select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
      .select(col(idCol),
        featureBucket(col("__tok"), model.buckets, model.salt).as("__b"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
      .join(broadcast(model.targetBuckets), Seq("__b"), "left")
      .join(broadcast(model.rawBuckets), Seq("__b"), "left")
      .crossJoin(broadcast(model.totals))
      .withColumn("__lr_micro",
        round(log(
          ((coalesce(col("__ct"), lit(0L)) + lit(1L)).cast("double")
            / (col("__nt") + bd).cast("double"))
          / ((coalesce(col("__cr"), lit(0L)) + lit(1L)).cast("double")
            / (col("__nr") + bd).cast("double"))
        ) * 1e6).cast("long") * col("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__lr_micro")).as("weight_micros"))
  }

  /** [[dsirScore]] over the raw corpus with the model trained on the
    * same split — the one-shot batch form (q248/q249). Identical
    * output to the pre-refactor fused version: raw-side buckets are
    * always present in the model there, so the scorer's
    * coalesce(cr, 0) never fires on this path. */
  def importanceWeights(target: DataFrame, raw: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024,
      salt: String = "dsir"): DataFrame =
    dsirScore(raw, idCol, textCol,
      dsirTrain(target, raw, textCol, buckets, salt))

  /** Batch PADDING-WASTE audit — the data-loader efficiency question
    * every padded (non-packed) training setup answers before picking
    * its batching strategy: of the tokens a batch ships, how many are
    * pad? Each group (training shard / source) is batched three ways
    * and the padded-vs-real token mass compared per strategy:
    *
    *  - `arrival`  — consecutive `batchSize` docs in id order (the
    *    naive loader);
    *  - `sorted`   — docs length-sorted first (minimal waste,
    *    maximal length correlation within a batch);
    *  - `bucketed` — docs grouped into `bucketWidth`-token length
    *    buckets, batched in id order within each bucket (the
    *    production compromise: near-sorted waste, arrival-order
    *    mixing inside a bucket).
    *
    * A batch pads every member to its longest member, so batch cost =
    * n_rows · max(tokens) and waste = cost − Σtokens; trailing
    * partial batches cost their actual row count (no phantom rows).
    * `waste_micros` is the padded-token fraction in integer micros —
    * exact integer arithmetic end to end, oracle-replayable.
    *
    * Scale shape: every window is partitioned by the group (and
    * bucket) — never global; the per-batch then per-group rollup is
    * two map-side-combining aggregates. At 100 TB the group is the
    * training shard, so each rank's waste is measured exactly where
    * its loader would pay it. */
  def paddingWasteAudit(df: DataFrame, groupCol: String, idCol: String,
      tokenCol: String, batchSize: Int, bucketWidth: Int): DataFrame = {
    require(batchSize >= 1 && bucketWidth >= 1,
      "batchSize and bucketWidth must be positive")
    val W = org.apache.spark.sql.expressions.Window
    def strategy(name: String, extraKey: Option[Column],
        order: Seq[Column]): DataFrame = {
      val partCols = col(groupCol) +: extraKey.toSeq
      val w = W.partitionBy(partCols: _*).orderBy(order: _*)
      val batched = df
        .withColumn("__rn", row_number().over(w).cast("long"))
        .withColumn("__batch", expr(s"(__rn - 1) div $batchSize"))
        .drop("__rn")
        .groupBy(partCols :+ col("__batch"): _*)
        .agg(count(lit(1)).as("__bn"), max(col(tokenCol)).as("__bmax"),
          sum(col(tokenCol)).as("__bsum"))
      batched.groupBy(col(groupCol))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("__bn") * col("__bmax")).as("padded_tokens"),
          sum(col("__bsum")).as("total_tokens"))
        .withColumn("strategy", lit(name))
    }
    val arrival = strategy("arrival", None, Seq(col(idCol)))
    val sorted = strategy("sorted", None, Seq(col(tokenCol), col(idCol)))
    val bucketed = strategy("bucketed",
      Some(expr(s"$tokenCol div $bucketWidth")), Seq(col(idCol)))
    arrival.unionByName(sorted).unionByName(bucketed)
      .withColumn("waste_micros",
        when(col("padded_tokens") > 0, expr(
          "((padded_tokens - total_tokens) * 1000000) div padded_tokens"))
          .otherwise(lit(0L)))
      .select(col("strategy"), col(groupCol), col("n_batches"),
        col("total_tokens"), col("padded_tokens"), col("waste_micros"))
  }

  /** Curation-gate OVERLAP matrix — the "which filters are redundant"
    * audit run before freezing a gate stack: for every unordered gate
    * pair, how many docs fail both (are the gates measuring the same
    * thing?), and for every gate, how many docs ONLY it catches (is
    * it pulling unique weight?). The report that justifies dropping a
    * gate — or proves each one earns its scan — before a 100 TB
    * pipeline pays for all of them.
    *
    * Input: one boolean fail-flag column per gate. Output: one row
    * per pair `gate_a ≤ gate_b` (diagonal included) with
    * `n_fail_a`, `n_fail_b`, `n_fail_both`, and `n_only_a` (docs
    * failing gate_a and NO other gate).
    *
    * Scale shape: ONE full-scan aggregate computes every pairwise sum
    * as a generated column (k gates → k(k+1)/2 + 2k sums, all
    * map-side combining — the row set is never multiplied k² the way
    * an explode-pairs plan would); the 1-row result unpivots to the
    * tall matrix driver-side-free via a literal-array explode. */
  def gateOverlapMatrix(df: DataFrame, gateCols: Seq[String]): DataFrame = {
    require(gateCols.nonEmpty, "need at least one gate column")
    val gs = gateCols.sorted
    val nf = gs.map(g => when(col(g), 1).otherwise(0)).reduce(_ + _)
    val pairs = for {
      i <- gs.indices; j <- i until gs.size
    } yield (gs(i), gs(j))
    val aggs =
      pairs.map { case (a, b) =>
        sum(when(col(a) && col(b), 1L).otherwise(0L)).as(s"__both_${a}_$b")
      } ++ gs.flatMap { g => Seq(
        sum(when(col(g), 1L).otherwise(0L)).as(s"__fail_$g"),
        sum(when(col(g) && nf === 1, 1L).otherwise(0L)).as(s"__only_$g"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      struct(lit(a).as("gate_a"), lit(b).as("gate_b"),
        coalesce(col(s"__fail_$a"), lit(0L)).as("n_fail_a"),
        coalesce(col(s"__fail_$b"), lit(0L)).as("n_fail_b"),
        coalesce(col(s"__both_${a}_$b"), lit(0L)).as("n_fail_both"),
        coalesce(col(s"__only_$a"), lit(0L)).as("n_only_a"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Gumbel top-k resampling over [[importanceWeights]] — DSIR's
    * selection step: sampling k docs ∝ softmax(weight) without
    * replacement ≡ taking the top k by `weight + Gumbel noise`
    * (the Gumbel-max trick), and the noise here is a PURE salted-hash
    * projection — `u = (hash56 + 0.5)/2⁵⁶`, `g = −ln(−ln u)` — so the
    * "random" draw is deterministic, partition-invariant, and
    * replayable in the oracle, the same property [[inSample]] gives
    * plain sampling. One TakeOrdered top-k; no shuffle beyond it. */
  def gumbelTopK(weights: DataFrame, idCol: String, k: Int,
      salt: String = "gumbel"): DataFrame = {
    require(k >= 1, "k must be positive")
    val u = (sampleHash(col(idCol), salt).cast("double") + lit(0.5)) /
      lit(72057594037927936.0) // 2^56, exact as a double
    weights
      .withColumn("gumbel_micros", round(-log(-log(u)) * 1e6).cast("long"))
      .withColumn("key_micros", col("weight_micros") + col("gumbel_micros"))
      .orderBy(col("key_micros").desc, col(idCol))
      .limit(k)
  }
}
