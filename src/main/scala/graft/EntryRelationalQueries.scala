package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.embed.HashingEmbedder
import graft.functions.GraftUdfs
import graft.operators.{Analyze, Ann, Bpe, Cluster, Dedup, Graph, Matcher, Multimodal, Scrub, Sketch, TextAnalysis, UrlOps}
import graft.streaming.StreamOps

/** Relational / event-analytics queries (SURVEY.md §2.2-2.7): scans, joins, windows, as-of/range joins, SCD2, funnels, table stats. */
private[graft] trait EntryRelationalQueries { this: SparkEntry.type =>

  /** Scan + filter + hash aggregate (P-ops + partial/final agg). */
  private[graft] def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("sum_disc_cents"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Predicate + projection pushdown to the parquet scan (P1-P3). */
  private[graft] def q02(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_discount") > 0.05 && col("l_quantity") < 25 &&
        col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice")).as("price_cents"))
      .orderBy("l_orderkey", "l_linenumber")

  /** 3-way shuffle join + aggregate with a distinct-agg (J-ops). */
  private[graft] def q03(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_orderdate") >= lit("1997-01-01"))
      .groupBy("c_mktsegment")
      .agg(
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"))
      .orderBy("c_mktsegment")

  /** Star-schema rollup with an explicitly broadcast dimension (J1). */
  private[graft] def q04(s: SparkSession, dir: String): DataFrame = {
    val dim = broadcast(
      t(s, dir, "nation").join(t(s, dir, "region"),
        col("n_regionkey") === col("r_regionkey")))
    t(s, dir, "customer")
      .join(dim, col("c_nationkey") === col("n_nationkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_customers"),
        sum(cents(col("c_acctbal"))).as("acctbal_cents"))
      .orderBy("r_name", "n_name")
  }

  /** Left-semi join (P6 membership predicate). */
  private[graft] def q05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_totalprice") > 150000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Left-anti join (negated membership). */
  private[graft] def q06(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Window top-k with deterministic tie-break (T1). */
  private[graft] def q07(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Pivot long→wide (T2 rank-pivot family). */
  private[graft] def q08(s: SparkSession, dir: String): DataFrame = {
    val pivoted = t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", priorities.map(_._1))
      .agg(count(lit(1)))
    val renamed = priorities.foldLeft(pivoted) { case (df, (v, n)) =>
      df.withColumnRenamed(v, n)
    }
    renamed.na.fill(0L, priorities.map(_._2)).orderBy("o_orderstatus")
  }

  /** INTERSECT / EXCEPT / DISTINCT set algebra (T5/V4). */
  private[graft] def q09(s: SparkSession, dir: String): DataFrame = {
    val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    cn.intersect(sn).withColumn("tag", lit("both"))
      .union(cn.except(sn).withColumn("tag", lit("cust_only")))
      .union(sn.except(cn).withColumn("tag", lit("supp_only")))
      .select("tag", "nationkey")
      .orderBy("tag", "nationkey")
  }

  /** Wide→long unpivot via stack() (A1 triplet unpivot family). */
  private[graft] def q10(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .selectExpr("l_orderkey", "l_linenumber",
        """stack(3,
           'discount', l_discount,
           'extendedprice', l_extendedprice,
           'quantity', l_quantity) as (metric, value)""")
      .orderBy("l_orderkey", "l_linenumber", "metric")

  /** Sentinel imputation chains (P4/P8/P9/P10). */
  private[graft] def q11(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        coalesce(nullif(col("source"), lit("src0")), lit("UNK")).as("src_imputed"),
        when(col("lang") === "zh", lit("Unknown")).otherwise(col("lang")).as("lang_display"))
      .orderBy("doc_id")

  /** String scalar functions (F3/F5/F11/F12 family, null-propagating concat). */
  private[graft] def q12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        lower(regexp_replace(col("p_name"), "[^a-zA-Z0-9]", "")).as("name_alnum"),
        substring(col("p_type"), 1, 10).as("type_prefix"),
        concat(col("p_brand"), lit(" "), col("p_type")).as("brand_type"),
        regexp_replace(col("p_brand"), "#", "_").as("brand_underscore"))
      .orderBy("p_partkey")

  /** JSON path extraction (F14/F15). */
  private[graft] def q13(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_int"))
      .orderBy("event_id")

  /** Tumbling-window rollup — the batch shape of the streaming path
    * (SURVEY.md §2.9); same plan Structured Streaming executes
    * incrementally. */
  private[graft] def q14(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"), col("n_events"), col("value_milli"))
      .orderBy("hour", "event_type")

  /** Multi-touch linear attribution ([[graft.operators.Funnel
    * .linearAttribution]]): every purchase's cents split evenly
    * across the user's clicks in the 6 h lookback, remainder to the
    * last touch — per-conversion credit sums to the conversion
    * EXACTLY (attributed_cents proves zero leakage), orphans
    * reported. Key-equi join + range predicate, all-BIGINT credit
    * arithmetic. */
  private[graft] def q189(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.linearAttribution(
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"), col("value")),
        "user_id", conversionType = "purchase", touchType = "click",
        tsCol = "ts_us", idCol = "event_id",
        valueCol = cents(col("value")), windowUs = 6L * 3600L * 1000000L)
      .orderBy("user_id")

  /** Deterministic A/B experiment readout ([[graft.operators
    * .Analyze.abTest]]): users md5-hash-assigned to two arms,
    * conversion = any purchase event; exact per-arm counts + rate
    * micros and the bit-replayable pooled two-proportion z-score
    * in ONE row. */
  private[graft] def q191(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analyze.abTest(
      t(s, dir, "events"), "user_id",
      (col("event_type") === "purchase" && col("value") >= 150.0)
        .cast("long"), salt = "ab")

  /** CDC changelog apply ([[graft.operators.Cdc.applyChangelog]]):
    * a deterministic synthetic changelog over the orders snapshot —
    * updates on keys %7=0 (seq 1), deletes on %11=0 (seq 2, so
    * update-then-delete keys resolve to deleted), inserts of new
    * keys from %13=0 — folded by ONE max-of-struct aggregate; the
    * post-image summarized per status. The oracle replays the merge
    * with a row_number-by-seq QUALIFY. */
  /** The deterministic CDC fixture shared by q192/q196: orders
    * snapshot + a synthetic changelog (updates %7, deletes %11 at a
    * later seq, inserts from %13 re-keyed). */
  private[graft] def cdcFixture(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val o = t(s, dir, "orders")
    val base = o.select(col("o_orderkey"), col("o_orderstatus"),
      cents(col("o_totalprice")).as("price_cents"))
    val upd = o.filter(pmod(col("o_orderkey"), lit(7)) === 0)
      .select(col("o_orderkey"), lit(1L).as("seq"), lit("U").as("op"),
        lit("X").as("o_orderstatus"),
        (cents(col("o_totalprice")) + lit(100L)).as("price_cents"))
    val del = o.filter(pmod(col("o_orderkey"), lit(11)) === 0)
      .select(col("o_orderkey"), lit(2L).as("seq"), lit("D").as("op"),
        lit("").as("o_orderstatus"), lit(0L).as("price_cents"))
    val ins = o.filter(pmod(col("o_orderkey"), lit(13)) === 0)
      .select((col("o_orderkey") + lit(100000000L)).as("o_orderkey"),
        lit(1L).as("seq"), lit("I").as("op"),
        lit("N").as("o_orderstatus"), lit(4200L).as("price_cents"))
    (base, upd.unionByName(del).unionByName(ins))
  }

  private[graft] def q192(s: SparkSession, dir: String): DataFrame = {
    val (base, changes) = cdcFixture(s, dir)
    graft.operators.Cdc.applyChangelog(base, changes,
        "o_orderkey", "seq", "op", Seq("o_orderstatus", "price_cents"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("price_cents")).as("sum_cents"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("o_orderstatus")
  }

  /** Incremental view maintenance ([[graft.operators.Cdc
    * .maintainGroupedAgg]]): the per-status count/sum view refreshed
    * INCREMENTALLY from the q192 changelog — pre-image retraction +
    * post-image addition over changed keys only, merged into the
    * old aggregate. The oracle recomputes the view from the FULL
    * post-image, so a hash match certifies the IVM algebra (two
    * different computation paths, one answer). */
  private[graft] def q196(s: SparkSession, dir: String): DataFrame = {
    val (base, changes) = cdcFixture(s, dir)
    val baseAgg = base.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("price_cents")).as("sum_cents"))
    graft.operators.Cdc.maintainGroupedAgg(baseAgg, base, changes,
        "o_orderkey", "seq", "op", "o_orderstatus", "price_cents")
      .orderBy("o_orderstatus")
  }

  /** Time-weighted average value per user ([[graft.operators
    * .Analyze.timeWeightedAverage]]): each event's cents held until
    * the user's next event; exact BIGINT cents·µs numerator and
    * duration, one fixed double division for the TWAP itself
    * (NULL for single-event users). */
  private[graft] def q193(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analyze.timeWeightedAverage(
        t(s, dir, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("value"), col("event_id")),
        "user_id", "ts_us", cents(col("value")),
        Seq(col("ts_us"), col("event_id")))
      .orderBy("user_id")

  /** Entity resolution ([[graft.operators.EntityResolution
    * .fellegiSunter]]): duplicate-customer detection over the
    * customer table with deterministically PLANTED perturbed copies
    * (every 17th customer re-enters with upper-cased name and +50¢
    * balance drift — the classic re-keyed-account shape). Blocking
    * on (nation, 100-dollar balance bucket) — the drift can cross a
    * bucket edge, the REAL blocking-recall trade, replayed
    * identically by the oracle; three field rules (case-insensitive
    * name, segment, balance within 100¢) under integer micro
    * log-odds; pairs survive at score ≥ 3M. The oracle replays
    * every block, agreement bit and score. */
  private[graft] def q194(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.EntityResolution.{fellegiSunter, FieldRule}
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"),
      col("c_nationkey").cast("long").as("c_nationkey"),
      col("c_mktsegment"), cents(col("c_acctbal")).as("bal_cents"))
    val dup = c.filter(pmod(col("c_custkey"), lit(17)) === 0)
      .select((col("c_custkey") + lit(10000000L)).as("c_custkey"),
        upper(col("c_name")).as("c_name"),
        col("c_nationkey"), col("c_mktsegment"),
        (col("bal_cents") + lit(50L)).as("bal_cents"))
    val recs = c.unionByName(dup)
      .withColumn("block", concat(col("c_nationkey"), lit("|"),
        floor(col("bal_cents").cast("double") / lit(10000.0)).cast("long")))
    fellegiSunter(recs, "c_custkey", "block", Seq(
        FieldRule("name_ci", "c_name",
          (a, b) => lower(a) === lower(b), 2000000L, -2000000L),
        FieldRule("segment", "c_mktsegment",
          (a, b) => a === b, 500000L, -500000L),
        FieldRule("balance", "bal_cents",
          (a, b) => abs(a - b) <= 100L, 1500000L, -1000000L)),
      thresholdMicros = 3000000L)
      .orderBy("id_a", "id_b")
  }

  /** EXPERIMENT-SESSION capstone — the events-analytics chain as one
    * certified statement: 30-min gap sessionization (q30) →
    * per-session conversion flag (the q191 criterion) → md5 arm
    * assignment → per-arm experiment rollup with exact counts and
    * explicit-double rate micros. Session structure, arm hashing and
    * every rate replayed by one oracle SQL chain. */
  private[graft] def q195(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val sess = t(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("ns", when(col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L,
        1L).otherwise(0L))
      .withColumn("session_id", sum(col("ns")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_ev"),
        max(when(col("event_type") === "purchase" && col("value") >= 150.0,
          1L).otherwise(0L)).as("converted"))
    def d(c: Column): Column = c.cast("double")
    sess
      .withColumn("arm", pmod(
        conv(substring(md5(concat(lit("ab:"), col("user_id").cast("string"))),
          1, 14), 16, 10).cast("long"), lit(2L)))
      .groupBy(col("arm"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).as("n_events"),
        sum(col("converted")).as("conv_sessions"))
      .select(col("arm"), col("n_users"), col("n_sessions"),
        col("n_events"), col("conv_sessions"),
        floor(d(col("n_sessions")) * lit(1000000.0) / d(col("n_users")))
          .cast("long").as("sessions_per_user_micros"),
        floor(d(col("conv_sessions")) * lit(1000000.0)
          / d(col("n_sessions"))).cast("long").as("conv_rate_micros"))
      .orderBy("arm")
  }

  /** RETENTION COHORTS — the product-analytics triangle: users
    * cohorted by first-seen week (integer week index since epoch —
    * pure integer arithmetic, no calendar semantics to disagree
    * on), per (cohort, week-offset k) the distinct active users and
    * the retention rate vs the cohort size (= the k=0 row).
    * Two keyed aggregates + one broadcast-sized cohort join. */
  private[graft] def q197(s: SparkSession, dir: String): DataFrame = {
    val weekUs = 604800000000L
    val ev = t(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val firsts = ev.groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("first_us"))
    val activity = ev.join(firsts, Seq("user_id"))
      .select(col("user_id"),
        floor(col("first_us").cast("double") / lit(weekUs.toDouble))
          .cast("long").as("cohort_week"),
        floor((col("ts_us") - col("first_us")).cast("double")
          / lit(weekUs.toDouble)).cast("long").as("week_k"))
      .groupBy(col("cohort_week"), col("week_k"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    val sizes = firsts
      .groupBy(floor(col("first_us").cast("double") / lit(weekUs.toDouble))
        .cast("long").as("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    activity.join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_k"), col("n_active"),
        col("cohort_size"),
        floor(col("n_active").cast("double") * lit(1000000.0)
          / col("cohort_size").cast("double")).cast("long")
          .as("retention_micros"))
      .orderBy("cohort_week", "week_k")
  }

  /** CONVERSION-LATENCY histogram over the q62 funnel: time from
    * first view to the converting purchase, bucketed into
    * power-of-4-minute bands via INTEGER base-4 digit count (no
    * float log edges to disagree on cross-engine). The "how long
    * does conversion take" readout beside the funnel's "how many
    * convert". */
  private[graft] def q198(s: SparkSession, dir: String): DataFrame = {
    val f = graft.operators.Funnel.funnel(
      t(s, dir, "events"), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
    val latencyMin = floor(
      (unix_micros(col("t_2")) - unix_micros(col("t_0"))).cast("double")
        / lit(60000000.0)).cast("long")
    f.filter(col("t_2").isNotNull)
      .select(latencyMin.as("lat_min"))
      .select(
        when(col("lat_min") <= 0, lit(0L))
          .otherwise(length(conv(col("lat_min"), 10, 4)).cast("long"))
          .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_conversions"))
      .orderBy("bucket")
  }

  /** Half-sample uncertainty for the per-type mean value
    * ([[graft.operators.Analyze.halfSampleCI]], 16 md5 replicas):
    * the deterministic subsampling standard error, every double
    * derived from exact integer sums through one fixed IEEE tree
    * and bit-replayed by the generated oracle. */
  private[graft] def q199(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analyze.halfSampleCI(
        t(s, dir, "events"), "event_type", "event_id",
        cents(col("value")), replicas = 16, salt = "ci")
      .orderBy("event_type")

  /** MAD robust anomaly detection per event type
    * ([[graft.operators.Analyze.madAnomalies]], k = 3): median +
    * median-absolute-deviation flags, the outlier DETECTOR closing
    * the robust-stats family (q179 winsorize mitigates, this
    * detects). */
  private[graft] def q200(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analyze.madAnomalies(
        t(s, dir, "events").select(col("event_type"), col("value")),
        "event_type", cents(col("value")), k = 3.0)
      .orderBy("event_type")

  /** CUPED variance-reduced experiment readout ([[graft.operators
    * .Analyze.cuped]]): per-user purchase cents split at the global
    * time midpoint into pre-period covariate x and experiment
    * metric y, md5 arms, pooled θ from five exact BIGINT sums, and
    * the covariate-adjusted per-arm means as one fixed
    * explicit-double tree. */
  private[graft] def q201(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
    val mid = ev.agg(((min(col("ts_us")) + max(col("ts_us"))) / lit(2L))
      .cast("long").as("mid"))
    val isPurchase = col("event_type") === "purchase"
    val units = ev.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ts_us") < col("mid") && isPurchase,
          cents(col("value"))).otherwise(lit(0L))).as("x_cents"),
        sum(when(col("ts_us") >= col("mid") && isPurchase,
          cents(col("value"))).otherwise(lit(0L))).as("y_cents"))
      .withColumn("arm", concat(lit("arm"), pmod(
        conv(substring(md5(concat(lit("ab:"), col("user_id").cast("string"))),
          1, 14), 16, 10).cast("long"), lit(2L))))
    graft.operators.Analyze.cuped(units, "arm", "x_cents", "y_cents")
      .orderBy("arm")
  }

  /** BENFORD first-digit audit over order totals — the
    * fraud/data-entry screening staple: observed leading-digit
    * counts vs Benford expectation with the χ² statistic. The
    * log₁₀(1+1/d) constants are PRECOMPUTED Scala doubles embedded
    * as literals in BOTH engines (shortest-roundtrip decimal text →
    * identical bits), so no cross-engine log evaluation exists; the
    * digit pivot makes χ² one fixed 9-term left-assoc tree over a
    * single aggregate row. */
  private[graft] def q202(s: SparkSession, dir: String): DataFrame = {
    val c = cents(col("o_totalprice"))
    val digit = substring(c.cast("string"), 1, 1)
    val counts = (1 to 9).map(dd =>
      sum(when(digit === dd.toString, 1L).otherwise(0L)).as(s"c$dd"))
    val row = t(s, dir, "orders").filter(c > 0)
      .agg(count(lit(1)).as("n"), counts: _*)
    def d(x: Column): Column = x.cast("double")
    val terms = (1 to 9).map { dd =>
      val e = d(col("n")) * lit(math.log10(1.0 + 1.0 / dd))
      (d(col(s"c$dd")) - e) * (d(col(s"c$dd")) - e) / e
    }
    row.select(col("n") +: (1 to 9).map(dd => col(s"c$dd")) :+
      terms.reduceLeft(_ + _).as("chi2"): _*)
  }

  /** RFM customer segmentation — recency (µs since each user's last
    * event vs the global max), frequency (purchase count), monetary
    * (purchase cents) scored into 1..5 quintile buckets against
    * exact interpolated percentile bounds (ONE 1-row bounds
    * aggregate broadcast back — no ntile global sort), segments
    * rolled up. Bucket = 1 + Σ(x > bound_i), pure integer-vs-bound
    * comparisons. */
  private[graft] def q203(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
    val users = ev.groupBy(col("user_id"))
      .agg(max(col("ts_us")).as("last_us"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("f_cnt"),
        sum(when(col("event_type") === "purchase", cents(col("value")))
          .otherwise(lit(0L))).as("m_cents"))
    val withR = users.crossJoin(broadcast(
        ev.agg(max(col("ts_us")).as("gmax"))))
      .withColumn("r_us", col("gmax") - col("last_us"))
    val bounds = withR.agg(
      expr("percentile(r_us, array(0.2, 0.4, 0.6, 0.8))").as("rb"),
      expr("percentile(f_cnt, array(0.2, 0.4, 0.6, 0.8))").as("fb"),
      expr("percentile(m_cents, array(0.2, 0.4, 0.6, 0.8))").as("mb"))
    def score(x: Column, b: String): Column =
      (1 to 4).map(i => when(x.cast("double") > element_at(col(b), i),
        1L).otherwise(0L)).reduce(_ + _) + lit(1L)
    withR.crossJoin(broadcast(bounds))
      .select(score(col("r_us"), "rb").as("r_score"),
        score(col("f_cnt"), "fb").as("f_score"),
        score(col("m_cents"), "mb").as("m_score"),
        col("m_cents"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("m_cents")).as("sum_m_cents"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Gap-based sessionization (30-min idle gap) per user. */
  private[graft] def q30(s: SparkSession, dir: String): DataFrame =
    StreamOps.sessionize(t(s, dir, "events"), gapMinutes = 30)
      .orderBy("user_id", "session_id")

  /** Backward as-of join: each purchase picks up the user's latest
    * click at or before it ([[graft.operators.AsofJoin]] — the
    * union-merge form, one key-shuffle, no per-key join explosion).
    * Times are epoch-micros BIGINTs so both engines order the exact
    * same integers (testdata ns timestamps are µs-precision). Clicks
    * are pre-aggregated per (user, time) — the operator's uniqueness
    * contract, same as DuckDB's ASOF. */
  private[graft] def q57(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("r_uid"),
        unix_micros(col("ts")).as("click_ts_us"), col("value"))
      .groupBy("r_uid", "click_ts_us")
      .agg(max(col("value")).as("click_val"))
    graft.operators.AsofJoin.asofBackward(
        purchases, clicks, "user_id", "r_uid", "ts_us", "click_ts_us")
      .orderBy("event_id")
  }

  /** Bucketed as-of join ([[AsofJoin.asofBackwardBucketed]]): q57's
    * enrichment with the per-(key, day-bucket) packing that spreads a
    * hot key's history across its time range — output hash-identical
    * to the plain form against the same DuckDB ASOF oracle. */
  private[graft] def q96(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("r_uid"),
        unix_micros(col("ts")).as("click_ts_us"), col("value"))
      .groupBy("r_uid", "click_ts_us")
      .agg(max(col("value")).as("click_val"))
    graft.operators.AsofJoin.asofBackwardBucketed(
        purchases, clicks, "user_id", "r_uid", "ts_us", "click_ts_us",
        bucketSpan = 86400L * 1000000)
      .orderBy("event_id")
  }

  /** Hash-sample quantiles: per source, the exact p50/p90 of n_chars
    * beside the same percentiles over a DETERMINISTIC 8-row sample —
    * the k smallest md5(doc_id) rows per group (KMV-style bottom-k).
    * The exact percentile needs a full per-group sort; the sample
    * variant bounds per-group state to k rows under WindowGroupLimit,
    * the trade a 100 TB profiling pass actually makes. The md5 order
    * makes the sample itself cross-engine identical, so BOTH columns
    * hash-match (contrast approx_percentile's engine-opaque t-digest,
    * q63). */
  private[graft] def q109(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .withColumn("__hk", md5(concat(lit("qs:"), col("doc_id").cast("string"))))
    val w = Window.partitionBy(col("source")).orderBy(col("__hk"))
    val sample = d.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 8)
      .groupBy("source")
      .agg(count(lit(1)).as("sample_n"),
        expr("percentile(n_chars, 0.5)").as("sample_p50"),
        expr("percentile(n_chars, 0.9)").as("sample_p90"))
    val exact = d.groupBy("source")
      .agg(expr("percentile(n_chars, 0.5)").as("exact_p50"),
        expr("percentile(n_chars, 0.9)").as("exact_p90"))
    sample.join(exact, Seq("source"))
      .select("source", "sample_n", "sample_p50", "sample_p90",
        "exact_p50", "exact_p90")
      .orderBy("source")
  }

  /** Hot-key-safe salted aggregation ([[graft.operators.Salting]]):
    * per-event-type exact milli-sums through the two-phase
    * salt → partial → merge rewrite; result equals the plain GROUP BY
    * the oracle states — the aggregate-skew guard beside the as-of
    * bucketing (joins) and LSH caps (buckets). */
  private[graft] def q137(s: SparkSession, dir: String): DataFrame =
    graft.operators.Salting.saltedSumCount(
        t(s, dir, "events"), "event_type",
        round(col("value") * 1000).cast("long"), buckets = 16)
      .orderBy("event_type")

  /** ANALYZE-style column statistics audit: per-column min/max/ndv/
    * null-count over lineitem, every measure exact and
    * integer-quantized where the source is a double (cents /
    * basis-points) so the stats table hash-matches cross-engine.
    * This is the stats surface that drives pruning and join planning
    * — emitted as a relational audit, one map-combined aggregate per
    * column unioned into the report. At 100 TB swap the exact ndv
    * for the HLL sketch (q108) per column; the shape is identical. */
  private[graft] def q138(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    def statsOf(name: String, c: Column): DataFrame =
      li.agg(
        min(c).as("min_v"), max(c).as("max_v"),
        count(c).as("n_nonnull"), count_distinct(c).as("ndv"))
        .select(lit(name).as("column"),
          col("min_v").cast("long").as("min_v"),
          col("max_v").cast("long").as("max_v"),
          col("n_nonnull"), col("ndv"))
    statsOf("l_quantity", col("l_quantity").cast("long"))
      .unionByName(statsOf("l_extendedprice_cents", cents(col("l_extendedprice"))))
      .unionByName(statsOf("l_discount_bp",
        round(col("l_discount") * 10000).cast("long")))
      .unionByName(statsOf("l_partkey", col("l_partkey").cast("long")))
      .orderBy("column")
  }

  /** Join-skew diagnostic: the top-20 hottest keys of a would-be join
    * column, with EXACT integer share-of-total micros and a rational
    * hot flag (cnt·500 > total ⇔ share > 0.2%) — the report you run
    * before keying a 100 TB shuffle on a column, and the measurement
    * behind this engine's hot-bucket caps and salting decisions.
    * Bounded output via orderBy+limit (TakeOrderedAndProject — no
    * global window); the total is a 1-row broadcast. */
  private[graft] def q116(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("__tot"))
    counts.crossJoin(broadcast(tot))
      .withColumn("share_micro", expr("(cnt * 1000000) div __tot"))
      .withColumn("hot", col("cnt") * 500 > col("__tot"))
      .select("key", "cnt", "share_micro", "hot")
      .orderBy(col("cnt").desc, col("key")).limit(20)
  }

  /** Per-source OLS trend of doc length vs token count — aggregate
    * regression as a SINGLE map-side-combining pass: the five exact
    * integer sums (n, Σx, Σy, Σxy, Σx²) shuffle one row per group,
    * and slope/intercept are each ONE fixed double expression over
    * them, so the result hash-matches DuckDB bit-for-bit (the same
    * discipline as the LM scorers; `regr_slope`-style running-state
    * aggregates would drift with partition order). Degenerate groups
    * (zero x-variance) yield NULL, not an ANSI crash. */
  private[graft] def q117(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("source"),
      expr("CAST(size(filter(split(text, '\\\\s+'), t -> t != '')) AS BIGINT)")
        .as("x"),
      col("n_chars").as("y"))
    val a = d.groupBy("source").agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("__a", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("__b", col("n") * col("sxx") - col("sx") * col("sx"))
    a.withColumn("slope_micro",
        when(col("__b") === 0, lit(null))
          .otherwise(round(lit(1000000)
            * (col("__a").cast("double") / col("__b").cast("double")))
            .cast("long")))
      .withColumn("intercept_micro",
        when(col("__b") === 0, lit(null))
          .otherwise(round(lit(1000000)
            * ((col("sy").cast("double")
              - (col("__a").cast("double") / col("__b").cast("double"))
                * col("sx").cast("double"))
              / col("n").cast("double")))
            .cast("long")))
      .select("source", "n", "slope_micro", "intercept_micro")
      .orderBy("source")
  }

  /** SCD type-2 validity intervals: each (user, value-change) row
    * becomes [valid_from, valid_to) via `lead()` over event time —
    * the warehouse history-table build, one partitioned window. */
  private[graft] def q80(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    t(s, dir, "events")
      .filter(col("event_type") === "signup" || col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 1000).cast("long").as("value_milli"))
      .select(col("user_id"), col("event_id"), col("ts_us").as("valid_from"),
        lead(col("ts_us"), 1).over(w).as("valid_to"),
        col("value_milli"),
        (lead(col("ts_us"), 1).over(w).isNull).as("is_current"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  /** TPC-H Q5-shaped 4-table star join: revenue by nation for one
    * order year — two big-table hash joins on their keys plus two
    * broadcast dims (customer at this SF, nation always), date filter
    * pushed to the orders scan, money summed as integer cents. */
  private[graft] def q71(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
    t(s, dir, "lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Corrupt-record quarantine: `from_json` yields a null struct on
    * malformed input (planted on every 7th event), routing bad rows
    * to quarantine counts instead of failing the job — the ingest
    * posture a crawl pipeline needs. Parse + route is one projection;
    * no separate validation pass. */
  private[graft] def q67(s: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    t(s, dir, "events")
      .withColumn("__p",
        when(col("event_id") % 7 === 0, concat(lit("x"), col("props")))
          .otherwise(col("props")))
      .withColumn("__k", from_json(col("__p"), schema).getField("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__k").isNull, 1L).otherwise(0L)).as("n_quarantined"),
        sum(coalesce(col("__k"), lit(0L))).as("sum_k"))
      .orderBy("event_type")
  }

  /** Hierarchical rollup (GROUPING SETS): per-(source, lang),
    * per-source and grand-total aggregates in ONE pass with
    * `grouping_id` disambiguating levels — Spark's Expand operator
    * replicates rows per grouping set before a single hash agg. */
  private[graft] def q65(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .rollup(col("source"), col("lang"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .select(col("source"), col("lang"), col("gid").cast("long").as("gid"),
        col("n_docs"), col("sum_chars"))
      .orderBy("gid", "source", "lang")

  /** Frame-based rolling aggregates per user: 5-row trailing moving
    * sum/count over event time — partitioned window, bounded frame
    * state, no global sort. */
  private[graft] def q66(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(-4, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 1000).cast("long").as("value_milli"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        sum(col("value_milli")).over(w).as("roll_sum_milli"),
        count(lit(1)).over(w).as("roll_n"))
      .orderBy("event_id")
  }

  /** Batch interval join via time-bucketed equality
    * ([[graft.operators.RangeJoin]]) — same semantics as the
    * streaming q59, but planned as a shuffled HASH join on
    * (key, bucket) instead of the nested loop Spark gives a raw
    * inequality join. Same oracle family as q59. */
  private[graft] def q64(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("p_ts_us"), col("value").as("purchase_val"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"),
        unix_micros(col("ts")).as("c_ts_us"), col("value").as("click_val"))
    graft.operators.RangeJoin.intervalJoin(
        purchases, clicks, "user_id", "c_user_id", "p_ts_us", "c_ts_us",
        lowerOffset = -120L * 60 * 1000000, upperOffset = 0L)
      .select("purchase_id", "user_id", "p_ts_us", "purchase_val",
        "click_id", "c_ts_us", "click_val")
      .orderBy("purchase_id", "click_id")
  }

  /** Sketch aggregates, self-certified: per source, exact distinct
    * content digests (hash-proven) alongside HLL++
    * `approx_count_distinct` and t-digest `percentile_approx`, each
    * emitted as a WITHIN-BOUND flag the oracle states as TRUE — the
    * sketch estimate itself is engine-specific, but the accuracy
    * contract is not. Exact percentiles hash-match DuckDB's
    * `quantile_cont` (same (n−1)·p interpolation). */
  private[graft] def q63(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("source"), md5(col("text")).as("h"), col("n_chars"))
    d.groupBy("source")
      .agg(
        count_distinct(col("h")).as("exact_distinct"),
        approx_count_distinct(col("h"), 0.05).as("__approx"),
        expr("percentile(n_chars, 0.5)").as("p50_chars"),
        expr("percentile(n_chars, 0.95)").as("p95_chars"),
        expr("approx_percentile(n_chars, 0.5, 1000)").as("__ap50"))
      .select(col("source"), col("exact_distinct"),
        (abs(col("__approx") - col("exact_distinct")).cast("double") /
          col("exact_distinct") <= 0.15).as("distinct_within_bound"),
        col("p50_chars"), col("p95_chars"),
        (col("__ap50") >= col("p50_chars") * 0.8 &&
          col("__ap50") <= col("p50_chars") * 1.2).as("p50_within_bound"))
      .orderBy("source")
  }

  /** Ordered conversion funnel ([[graft.operators.Funnel]]): per
    * user, first view → first strictly-later click → first
    * strictly-later purchase; chained conditional min-aggregates
    * reusing one key partitioning. */
  private[graft] def q62(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.funnel(
        t(s, dir, "events").select(col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type")),
        "user_id", "ts_us", "event_type", Seq("view", "click", "purchase"))
      .orderBy("user_id")

  /** First-order Markov transition matrix
    * ([[graft.operators.Funnel.transitionMatrix]]): consecutive
    * event-type pairs per user under the (ts, event_id) total
    * order, row-normalized to integer-micro probabilities — the
    * session-behavior fingerprint. Per-key windows (no global
    * sort), |types|²-bounded pair counts, broadcast row totals. */
  private[graft] def q176(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.transitionMatrix(
        t(s, dir, "events").select(col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"),
          col("event_type")),
        "user_id", "event_type", Seq(col("ts_us"), col("event_id")))
      .orderBy("from_type", "to_type")

  /** Sequential-pattern support mining
    * ([[graft.operators.Funnel.sequentialPatterns]]): how many
    * users' first-12-event streams contain each ordered event-type
    * pair and triple as a gap-allowed subsequence (support ≥ 5) —
    * PrefixSpan's support question answered by per-user interval
    * logic (`first(a) < last(b)`; `minAfter(a,b) < last(c)`) instead
    * of embedding enumeration, so the work stays linear in events ×
    * |alphabet| with no candidate explosion. The ordered companion
    * of q186's association rules and q176's first-order transitions
    * (which see only CONSECUTIVE pairs — this sees across gaps). */
  private[graft] def q208(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.sequentialPatterns(
        t(s, dir, "events").select(col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"),
          col("event_type")),
        "user_id", "event_type", Seq(col("ts_us"), col("event_id")),
        maxRank = 12, minSupport = 5L)
      .orderBy("t1", "t2", "t3")

  /** Winsorized robust stats ([[graft.operators.Analyze
    * .winsorizedStats]]): per event type, `value` clamped to its
    * [p5, p95] interpolated percentiles with clipped counts and the
    * winsorized sum in exact cents — the outlier-robust metric
    * summary. Percentile bounds broadcast back (|groups| rows);
    * the clamp-and-sum pass is order-free integer arithmetic. */
  private[graft] def q179(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analyze.winsorizedStats(
        t(s, dir, "events").select(col("event_type"), col("value")),
        "event_type", "value", pLo = 0.05, pHi = 0.95)
      .orderBy("event_type")

  /** Skew-aware salted equi-join ([[graft.operators.SkewJoin
    * .skewEquiJoin]]): lineitem re-keyed onto a planted power-law
    * key (3/4 of rows share `skew_key = -1`) joined to a per-key
    * orders dim. Hot keys (exact census ≥ 1000 rows) route through
    * a `buckets`-way salted replica of their dim slice; cold keys
    * take the plain shuffle join; the union is EXACTLY the plain
    * join, which is what the oracle states. The salt expression
    * only balances reducers — it never appears in the result. */
  private[graft] def q180(s: SparkSession, dir: String): DataFrame = {
    def sk(k: Column): Column =
      when(pmod(k, lit(4)) =!= 0, lit(-1L))
        .otherwise(pmod(k, lit(97)).cast("long"))
    val fact = t(s, dir, "lineitem")
      .select(sk(col("l_orderkey")).as("skew_key"),
        col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    val dim = t(s, dir, "orders")
      .groupBy(sk(col("o_orderkey")).as("skew_key"))
      .agg(count(lit(1)).as("o_cnt"))
    graft.operators.SkewJoin.skewEquiJoin(fact, dim, "skew_key",
        hotThreshold = 1000L, buckets = 8,
        saltOf = col("l_orderkey") * lit(7) + col("l_linenumber"))
      .groupBy(col("skew_key"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        min(col("o_cnt")).as("o_cnt"))
      .orderBy("skew_key")
  }

  /** Pareto frontier ([[graft.operators.Analyze.paretoFrontier]]):
    * the undominated (activity, total value) users — per-user
    * n_events (the naturally bucketed x axis, ≤ ~50 distinct) vs
    * exact value cents; full point mass collapses in one per-x
    * max-combine, frontier over the bounded candidate set. Oracle
    * states dominance directly with NOT EXISTS. */
  private[graft] def q182(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_cents"))
    graft.operators.Analyze.paretoFrontier(pts, "n_events", "value_cents")
      .withColumnRenamed("x", "n_events")
      .withColumnRenamed("y", "value_cents")
      .orderBy("n_events")
  }

  /** Multi-dimensional CUBE with grouping_id — every aggregate cell
    * of the (returnflag × linestatus) lattice in one pass.
    * Catalyst's Expand multiplies each input row into its 4 lattice
    * memberships BEFORE the hash aggregate, so partial aggregation
    * still absorbs the mass map-side; gid disambiguates real NULL
    * group values from rolled-up cells. */
  private[graft] def q184(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("rev_cents"),
        count(lit(1)).as("n_rows"))
      .orderBy("gid", "l_returnflag", "l_linestatus")

  /** ROLLUP hierarchy aggregate — q184's CUBE sibling for the
    * drill-down path the lattice doesn't need: region → nation →
    * market-segment subtotals plus the grand total in ONE pass
    * (4 grouping sets, not 8), revenue in exact cents. The dims
    * arrive through two broadcast-sized joins (nation, region) on
    * the one orders⋈customer shuffle. */
  private[graft] def q216(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"), col("c_mktsegment"))
      .agg(grouping_id().as("gid"),
        sum(cents(col("o_totalprice"))).as("rev_cents"),
        count(lit(1)).as("n_orders"))
      .orderBy("gid", "r_name", "n_name", "c_mktsegment")

  /** Association rules ([[graft.operators.Analyze
    * .associationRules]]) over order baskets: support, directed
    * confidence and lift in exact micros for every part pair
    * co-ordered ≥ 2 times. Pair generation is the basket-keyed
    * self-join bounded by basket size; supports broadcast back
    * catalog-sized. */
  private[graft] def q186(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analyze.associationRules(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 2L)
      .orderBy("item_a", "item_b")

  /** Data-contract expectation suite ([[graft.operators
    * .Expectations.run]]): six checks over orders — null rate, key
    * uniqueness, two value ranges (one deliberately tight, so the
    * FAIL path is certified too), accepted status set, and customer
    * referential integrity — compiled into ONE scan plus one
    * broadcast anti-join. Rates in exact micros. */
  private[graft] def q187(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Expectations
    import graft.operators.Expectations._
    Expectations.run(t(s, dir, "orders"), Seq(
        NotNull("o_custkey"),
        Unique("o_orderkey"),
        InRange("o_totalprice", 1.0, 600000.0),
        InRange("o_totalprice", 1.0, 200000.0,
          thresholdMicros = 100000L), // tight: some orders exceed it
        AcceptedValues("o_orderstatus", Seq("O", "F", "P")),
        RefIntegrity("o_custkey", t(s, dir, "customer"), "c_custkey")))
      .orderBy("check_name")
  }

  /** Sliding-window rollup (1 h / 30 min): the batch shape of the
    * streaming sliding-window operator. */
  private[graft] def q33(s: SparkSession, dir: String): DataFrame =
    StreamOps.slidingRollup(t(s, dir, "events"))
      .orderBy("win_start", "event_type")

  /** The reference's core ingest path (P1-P4/A1-A2: regex triplet
    * projection → stack unpivot → dropna(all) → dedup → CT_ID
    * sentinel impute) run over a part-table-shaped wide sheet, with
    * planted nulls hitting both the sentinel and the all-null-triplet
    * drop. */
  private[graft] def q37(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
    val t2null = col("p_partkey") % 13 === 0
    val wide = part.select(
      col("p_name").as("CT/1"),
      when(col("p_partkey") % 7 === 0, lit(null))
        .otherwise(col("p_partkey").cast("string")).as("CT/1/ID"),
      col("p_brand").as("CT/1/LABEL"),
      when(t2null, lit(null)).otherwise(col("p_type")).as("CT/2"),
      when(t2null, lit(null)).otherwise(col("p_size").cast("string")).as("CT/2/ID"),
      when(t2null, lit(null)).otherwise(col("p_brand")).as("CT/2/LABEL"))
    graft.operators.Wrangle.wrangle(wide)
      .orderBy("CT_ID", "CT_NAME", "CT_LABEL")
  }

  /** SQL front door: the native codegen kernels exposed as SQL
    * functions (GraftExtensions) and driven through `spark.sql`. */
  private[graft] def q36(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    t(s, dir, "embeddings").createOrReplaceTempView("graft_embeddings")
    s.sql("""
      SELECT vec_id,
             graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
                       CAST(embedding AS ARRAY<DOUBLE>)) AS sq_norm,
             size(graft_shingles(array('a','b','c','d'), 3)) AS n_shingles,
             array_join(
               transform(graft_bucket_counts(
                 transform(sequence(CAST(0 AS BIGINT), vec_id % 7),
                           i -> pmod(i, 4)), 4),
                 x -> CAST(CAST(x AS BIGINT) AS STRING)), ',')
               AS bucket_hist
      FROM graft_embeddings ORDER BY vec_id""")
    // bucket_hist is emitted as a comma-joined string, not the raw
    // ARRAY: the driver's pandas-side sort/hash cannot hash ndarray
    // cells. The array-typed kernel itself is pinned in
    // GraftExtensionsSpec.
  }

  /** AUTOCORRELATION of the daily revenue series
    * ([[graft.operators.Analyze.autocorrelation]], lags 1–7): events
    * reduce to one (day-index, cents) row per day — integer day =
    * ⌊µs/86400·10⁶⌋, per-row cents BEFORE the sum so the reduction
    * is order-free — then the exact integer-centered ACF. The
    * weekly-seasonality readout that picks q183's Holt-Winters
    * period. */
  private[graft] def q210(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .select(floor(unix_micros(col("ts")).cast("double")
          / lit(86400000000.0)).cast("long").as("day"),
        round(col("value") * lit(100.0)).cast("long").as("__c"))
      .groupBy(col("day"))
      .agg(sum(col("__c")).as("cents"))
    graft.operators.Analyze.autocorrelation(daily, "day", "cents", 7)
      .orderBy("lag")
  }

  /** Two-sample KS drift test
    * ([[graft.operators.Analyze.ksTwoSample]]): the event `value`
    * distribution of the first 15 days vs the rest of the window —
    * the deploy-boundary "did the metric's SHAPE move" check beside
    * q164's streaming mean/rate monitor. Values quantize to cents;
    * the era split rides the 1-row min-day broadcast. */
  private[graft] def q212(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(
      floor(unix_micros(col("ts")).cast("double") / lit(86400000000.0))
        .cast("long").as("day"),
      round(col("value") * lit(100.0)).cast("long").as("cents"))
    val d0 = ev.agg(min(col("day")).as("__d0"))
    val sided = ev.crossJoin(broadcast(d0))
      .select((col("day") < col("__d0") + lit(15L)).as("__a"),
        col("cents"))
    graft.operators.Analyze.ksTwoSample(sided, col("__a"), col("cents"))
  }

  /** Lorenz deciles ([[graft.operators.Analyze.lorenzDeciles]]) of
    * customer lifetime spend — the distributional detail behind
    * q223's Gini scalar: which decile holds what share (zero-spend
    * customers included, same frame as q223). */
  private[graft] def q228(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("k"))
      .agg(sum(cents(col("o_totalprice"))).as("x"))
    val all = t(s, dir, "customer").select(col("c_custkey").as("k"))
      .join(spend, Seq("k"), "left")
      .select(col("k"), coalesce(col("x"), lit(0L)).as("x"))
    graft.operators.Analyze.lorenzDeciles(all, "k", col("x"))
      .orderBy("decile")
  }

  /** Per-user burstiness ([[graft.operators.Analyze.burstiness]])
    * of event timing — metronome vs Poisson vs bursty: the temporal
    * fingerprint that separates timer-driven crawlers from human
    * sessions at equal mean rate. */
  private[graft] def q226(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analyze.burstiness(
        t(s, dir, "events"), "user_id", unix_micros(col("ts")))
      .orderBy("user_id")

  /** Supplier-concentration HHI per nation
    * ([[graft.operators.Analyze.hhi]]): line revenue share per
    * supplier within its nation, Σshare² — which procurement
    * markets are single-supplier risks. The group sibling of q223's
    * global Gini: Gini says HOW unequal, HHI says HOW FEW
    * effectively. 128-bit-exact square sums (decimal ↔ HUGEINT). */
  private[graft] def q224(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analyze.hhi(
        t(s, dir, "lineitem")
          .join(t(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey")),
        "n_name", "s_suppkey", cents(col("l_extendedprice")))
      .orderBy("n_name")

  /** Gini coefficient ([[graft.operators.Analyze.gini]]) of
    * lifetime spend across ALL customers (zero-spend customers
    * included via left join — excluding them understates
    * concentration): the whale-heaviness readout for revenue,
    * exact integer numerator over ranked cents. */
  private[graft] def q223(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("k"))
      .agg(sum(cents(col("o_totalprice"))).as("x"))
    val all = t(s, dir, "customer").select(col("c_custkey").as("k"))
      .join(spend, Seq("k"), "left")
      .select(col("k"), coalesce(col("x"), lit(0L)).as("x"))
    graft.operators.Analyze.gini(all, "k", col("x"))
  }

  /** Cohen's kappa ([[graft.operators.Analyze.cohenKappa]]) between
    * two document-quality screens — the alpha-dominance gate (alpha
    * chars ≥ 82%, the q162 gold axis) and the substance gate
    * (≥ 300 chars): do the screens agree beyond what their pass
    * rates force? Both discriminate on this corpus (~64%/~51% pass,
    * all four confusion cells populated); κ near 0 = the screens
    * are complementary, not redundant — exactly what a gate-stack
    * audit wants to know. Integer-comparison raters, one
    * confusion-matrix pass, κ exact to the final micro ratio. */
  private[graft] def q222(s: SparkSession, dir: String): DataFrame = {
    val nChars = length(col("text"))
    val a = lit(100) * length(regexp_replace(col("text"), "[^a-zA-Z]", "")) >=
      lit(82) * nChars
    val b = nChars >= lit(300)
    graft.operators.Analyze.cohenKappa(t(s, dir, "documents"), a, b)
  }

  /** Spearman rank correlation
    * ([[graft.operators.Analyze.spearman]]) between document length
    * and whitespace token count — the monotone-association sibling
    * of q117's linear OLS over the same pair: ranks are
    * deterministic (value, doc_id) ordinals through the
    * globalOrdinals range-shuffle machinery, Σd² exact BIGINT, ρ
    * one fixed double tree. */
  private[graft] def q221(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analyze.spearman(
      t(s, dir, "documents"), "doc_id",
      col("n_chars"),
      expr("CAST(size(filter(split(text, '\\\\s+'), t -> t != '')) AS BIGINT)"))

  /** Mergeable log-bucket quantile sketch
    * ([[graft.operators.Sketch.logBucketQuantiles]]): p50/p90/p99/
    * p999 of line revenue cents per return flag from 2-significant-
    * digit buckets — the bounded-state quantile a 100 TB scan ships
    * when the exact per-value table can't be held; <10% relative
    * error by construction, zero randomness, partial aggregation IS
    * the merge. */
  private[graft] def q217(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketch.logBucketQuantiles(
        t(s, dir, "lineitem"), "l_returnflag",
        cents(col("l_extendedprice")), Seq(500, 900, 990, 999))
      .orderBy("l_returnflag", "permille")

  /** CUSUM changepoint locator
    * ([[graft.operators.Analyze.cusumChangepoint]]) over the daily
    * event-RATE series — "when did the traffic level shift": the
    * cumulative mean-deviation peak dates the break, and
    * `cusum_rel_micro` scores its strength scale-free. Completes
    * the monitoring triptych: q212 asks IF the shape moved, q200
    * flags WHICH points are odd, this dates WHEN the level broke. */
  private[graft] def q213(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(floor(unix_micros(col("ts")).cast("double")
          / lit(86400000000.0)).cast("long").as("day"))
      .agg(count(lit(1)).as("n_events"))
    graft.operators.Analyze.cusumChangepoint(daily, "day", "n_events")
  }

  /** k-anonymity / l-diversity release audit
    * ([[graft.operators.Analyze.kAnonymity]]) of the customer table
    * against the (nation, market-segment) quasi-identifier pair,
    * with the account balance in whole hundreds as the sensitive
    * attribute: every equivalence class reports its size and
    * distinct-sensitive count plus the k=8 / l=5 flags — the
    * compliance gate a dataset passes before release. One keyed
    * aggregate; the class count is bounded by the QI domain (25
    * nations × 5 segments), not the row count. */
  private[graft] def q246(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analyze.kAnonymity(
        t(s, dir, "customer")
          .select(col("c_nationkey"), col("c_mktsegment"),
            floor(cents(col("c_acctbal")) / 10000L).as("bal_hundreds")),
        Seq("c_nationkey", "c_mktsegment"), "bal_hundreds", k = 8, l = 5)
      .orderBy("c_nationkey", "c_mktsegment")

}
