package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.embed.HashingEmbedder
import graft.functions.GraftUdfs
import graft.operators.{Analyze, Ann, Bpe, Cluster, Dedup, Graph, Matcher, Multimodal, Scrub, Sketch, TextAnalysis, UrlOps}
import graft.streaming.StreamOps

/** Driver contract — see SURVEY.md §7 and the harness docs.
  *
  * Every SQL-expressible operator of the engine is registered in
  * [[queries]] with a DuckDB oracle in [[oracleSql]]. Cross-engine
  * hash-parity rules used throughout:
  *
  *  - money/measure aggregates are per-row integer quantisations
  *    (`round(x*100) :: bigint`) summed exactly — never raw double
  *    sums, whose accumulation order differs between engines;
  *  - DuckDB `sum(BIGINT)` widens to int128, so every oracle sum is
  *    wrapped in `CAST(... AS BIGINT)` to match Spark's int64;
  *  - every query ends in a total ORDER BY;
  *  - ratio columns are derived from integer counts with the exact
  *    same IEEE expression tree in both engines (bit-identical);
  *  - hashes are md5 (lowercase hex in both engines).
  */
object SparkEntry {

  /** Model-state capture for generated oracles: Verify runs every
    * query BEFORE dumping [[oracleSql]] (same JVM), so a
    * model-in-the-loop query can freeze its fitted state here and
    * the oracle builder emits it as a VALUES table — the q41-43
    * generated-oracle pattern extended to trained models. Unset
    * (e.g. a partial dev run that skipped the query) → the entry is
    * omitted and the driver records its rows-only fallback. */
  final class ModelStateHolder[A] {
    @volatile private var state: Option[A] = None
    def set(a: A): Unit = { state = Some(a) }
    def get: Option[A] = state
  }
  private val q35BasisHolder = new ModelStateHolder[Array[Array[Double]]]
  private val q44VocabHolder = new ModelStateHolder[Seq[(String, Array[Double])]]

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    // events' ts column has shipped under two parquet encodings
    // (TIMESTAMP(NANOS) and TIMESTAMP(MICROS,NTZ)); the loader probes
    // the footer and normalizes ts to TimestampType either way.
    if (name == "events") graft.sources.EventsLoader.events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  /** Per-row integer cents: exact, order-independent summation. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  // ---------------------------------------------------------------------
  // Relational core (SURVEY.md §2.2-2.7 re-expressed over the testdata)
  // ---------------------------------------------------------------------

  /** Scan + filter + hash aggregate (P-ops + partial/final agg). */
  private def q01(s: SparkSession, dir: String): DataFrame =
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
  private def q02(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_discount") > 0.05 && col("l_quantity") < 25 &&
        col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice")).as("price_cents"))
      .orderBy("l_orderkey", "l_linenumber")

  /** 3-way shuffle join + aggregate with a distinct-agg (J-ops). */
  private def q03(s: SparkSession, dir: String): DataFrame =
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
  private def q04(s: SparkSession, dir: String): DataFrame = {
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
  private def q05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_totalprice") > 150000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Left-anti join (negated membership). */
  private def q06(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Window top-k with deterministic tie-break (T1). */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  private val priorities = Seq(
    "1-URGENT" -> "n_urgent", "2-HIGH" -> "n_high", "3-MEDIUM" -> "n_medium",
    "4-NOT SPECIFIED" -> "n_not_specified", "5-LOW" -> "n_low")

  /** Pivot long→wide (T2 rank-pivot family). */
  private def q08(s: SparkSession, dir: String): DataFrame = {
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
  private def q09(s: SparkSession, dir: String): DataFrame = {
    val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    cn.intersect(sn).withColumn("tag", lit("both"))
      .union(cn.except(sn).withColumn("tag", lit("cust_only")))
      .union(sn.except(cn).withColumn("tag", lit("supp_only")))
      .select("tag", "nationkey")
      .orderBy("tag", "nationkey")
  }

  /** Wide→long unpivot via stack() (A1 triplet unpivot family). */
  private def q10(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .selectExpr("l_orderkey", "l_linenumber",
        """stack(3,
           'discount', l_discount,
           'extendedprice', l_extendedprice,
           'quantity', l_quantity) as (metric, value)""")
      .orderBy("l_orderkey", "l_linenumber", "metric")

  /** Sentinel imputation chains (P4/P8/P9/P10). */
  private def q11(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        coalesce(nullif(col("source"), lit("src0")), lit("UNK")).as("src_imputed"),
        when(col("lang") === "zh", lit("Unknown")).otherwise(col("lang")).as("lang_display"))
      .orderBy("doc_id")

  /** String scalar functions (F3/F5/F11/F12 family, null-propagating concat). */
  private def q12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        lower(regexp_replace(col("p_name"), "[^a-zA-Z0-9]", "")).as("name_alnum"),
        substring(col("p_type"), 1, 10).as("type_prefix"),
        concat(col("p_brand"), lit(" "), col("p_type")).as("brand_type"),
        regexp_replace(col("p_brand"), "#", "_").as("brand_underscore"))
      .orderBy("p_partkey")

  /** JSON path extraction (F14/F15). */
  private def q13(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_int"))
      .orderBy("event_id")

  /** Tumbling-window rollup — the batch shape of the streaming path
    * (SURVEY.md §2.9); same plan Structured Streaming executes
    * incrementally. */
  private def q14(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"), col("n_events"), col("value_milli"))
      .orderBy("hour", "event_type")

  // ---------------------------------------------------------------------
  // Training-data-pipeline operators over documents/embeddings
  // ---------------------------------------------------------------------

  /** Exact dedup by content digest (Dedup.exactDuplicates). */
  private def q15(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDuplicates(t(s, dir, "documents")).orderBy("text_md5")

  /** Whitespace/punctuation-robust content fingerprint. */
  private def q16(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprints(t(s, dir, "documents"))
      .select("doc_id", "fingerprint")
      .orderBy("doc_id")

  /** Document quality metrics (codegen-only text scoring). */
  private def q17(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityMetrics(t(s, dir, "documents"))
      .select("doc_id", "n_words", "mean_word_len", "alpha_ratio",
        "digit_ratio", "punct_ratio", "upper_ratio", "stopword_ratio",
        "quality_score")
      .orderBy("doc_id")

  /** Marker-token language identification. */
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val langs = TextAnalysis.langMarkers.keys.toSeq.sorted
    TextAnalysis.languageId(t(s, dir, "documents"))
      .select(col("doc_id") +: langs.map(l => col(s"hits_$l")) :+ col("predicted_lang"): _*)
      .orderBy("doc_id")
  }

  /** Token budget statistics. */
  private def q19(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenStats(t(s, dir, "documents"))
      .select("doc_id", "ws_tokens", "subword_tokens", "chars_per_ws_token")
      .orderBy("doc_id")

  /** MinHash signatures (8 hash families over word 3-shingles). */
  private def q20(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashSignatures(t(s, dir, "documents"), "text", "doc_id",
        shingleSize = 3, numHashes = 8)
      .orderBy("doc_id")

  /** SimHash 60-bit fingerprints. */
  private def q21(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(t(s, dir, "documents"), "text", "doc_id").orderBy("doc_id")

  /** Exact word-3-gram Jaccard over blocked candidate pairs. */
  private def q22(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").filter(col("doc_id") < 40)
    val ids = docs.select(col("doc_id"))
    val pairs = ids.as("x").crossJoin(ids.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    Dedup.jaccardOnPairs(pairs, docs, "text", "doc_id", shingleSize = 3)
      .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  // ---------------------------------------------------------------------
  // Similarity search / ANN over the embeddings table (SURVEY.md §2.8
  // north-star; Ann.scala)
  // ---------------------------------------------------------------------

  /** 32 deterministic sign-LSH hyperplanes (seed 42) over the 64-d
    * embeddings — the SAME constants are inlined into the DuckDB
    * oracles below, so bucket assignment is cross-engine checkable.
    * Band size 8 (4 bands × 256 buckets): sized so expected bucket
    * occupancy stays O(10) on this corpus — 4-bit bands put ~1/16 of
    * the corpus in every bucket and candidate generation went
    * quadratic (514k candidates for 80 true pairs at sf0.1; 8-bit
    * bands cut that ~20×). The recall/cost knob of the classic
    * r-of-L construction. */
  private val lshPlanes = Ann.hyperplanes(dim = 64, nPlanes = 32, seed = 42L)

  /** q74 projection planes — 64-d → 8-d JL, independent seed. */
  private val projPlanes = Ann.hyperplanes(dim = 64, nPlanes = 8, seed = 7L)
  private val lshBandSize = 8
  private def lshBands = lshPlanes.grouped(lshBandSize).toSeq

  /** Exact brute-force cosine top-k: every 50th vector queries the
    * whole corpus (broadcast side). */
  private def q25(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Ann.bruteForceTopK(e.filter(col("vec_id") % 50 === 0), e,
        "vec_id", "vec_id", "embedding", k = 5)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("q_id", "rank")
  }

  /** SEMANTIC decontamination ([[Ann.bruteForceTopK]] k=1 against
    * the eval set): the embedding-space complement of the n-gram
    * gates (q58/q103/q142) — paraphrased eval leakage shares no
    * 3-gram but sits at high cosine. The eval side is benchmarks
    * (broadcast, ~1% of vec_ids here); the train side streams
    * through ONE scan + broadcast cross-score, so the shape holds at
    * 100 TB. Emits each train vector's nearest eval neighbour, its
    * cosine, and the threshold flag (0.9 — natural scores top out at
    * ~0.47 on this corpus and planted leaks sit at ~1.0, so the
    * boolean clears the threshold by a wide margin on both sides and
    * is stable under ulp-level engine differences). PLANTED leakage
    * (every fifth eval vector re-inserted under a new train id)
    * exercises the contaminated=true path inside the hash check. */
  private def q145(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val evalSet = e.filter(col("vec_id") % 97 === 0)
    val train = e.filter(col("vec_id") % 97 =!= 0)
      .union(evalSet.filter(col("vec_id") % 5 === 0)
        // planted ids mirrored NEGATIVE: collision-free with any real
        // (non-negative) vec_id at any corpus scale
        .select((-col("vec_id") - 1L).as("vec_id"), col("embedding"),
          col("label")))
    Ann.bruteForceTopK(train, evalSet,
        "vec_id", "vec_id", "embedding", k = 1)
      .select(col("q_id").as("vec_id"), col("c_id").as("nearest_eval_id"),
        col("score").as("max_cos"),
        (col("score") >= 0.9).as("contaminated"))
      .orderBy("vec_id")
  }

  /** Sign-LSH bucket assignment, 4 bands × 4 planes. */
  private def q26(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    e.select(
        col("vec_id") +: lshBands.zipWithIndex.map { case (b, i) =>
          Ann.bucketExpr(col("embedding"), b).as(s"bucket_$i")
        }: _*)
      .orderBy("vec_id")
  }

  /** Banded-LSH near-dup candidate pairs verified by exact cosine. */
  private def q27(s: SparkSession, dir: String): DataFrame =
    Ann.lshBandedNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        lshPlanes, lshBandSize, cosineThreshold = 0.45)
      .orderBy("id_a", "id_b")

  /** MinHash-LSH near-duplicate detection end-to-end: signatures →
    * banded candidates → exact jaccard ≥ 0.8. */
  private def q28(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDuplicates(t(s, dir, "documents"), "text", "doc_id",
        shingleSize = 3, numHashes = 8, rowsPerBand = 2, jaccardThreshold = 0.8)
      .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
      .orderBy("id_a", "id_b")

  /** The boilerplate text planted by [[corpusWithBoilerplate]] — also
    * inlined into the q45/q46 oracle SQL. */
  private val boilerplateText =
    "subscribe to our newsletter for updates all rights reserved"

  /** documents plus a 12-copy boilerplate cluster: the hot-bucket
    * workload for the capped dedup queries (q45/q46) — identical texts
    * land every copy in ONE (band, bucket) key in every band. */
  private def corpusWithBoilerplate(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"), col("text"))
      .unionByName(s.range(1, 13).select(
        (col("id") + 10000000L).as("doc_id"),
        lit(boilerplateText).as("text")))

  /** MinHash-LSH near-dup with the HOT-BUCKET CAP (the 100 TB skew
    * guard): buckets over 8 members emit no pairwise candidates — the
    * planted boilerplate cluster's 66 pairs are suppressed while every
    * small-bucket pair is found exactly as in q28. */
  private def q45(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDuplicates(corpusWithBoilerplate(s, dir), "text", "doc_id",
        shingleSize = 3, numHashes = 8, rowsPerBand = 2, jaccardThreshold = 0.8,
        maxBucketSize = Some(8))
      .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
      .orderBy("id_a", "id_b")

  /** The linear companion of the cap: identical-full-signature
    * clusters (the capped boilerplate mass, recovered as ONE group by
    * a map-side-combined aggregate instead of |cluster|² pairs). */
  private def q46(s: SparkSession, dir: String): DataFrame =
    Dedup.exactSignatureDuplicates(
        Dedup.minhashSignatures(corpusWithBoilerplate(s, dir), "text", "doc_id",
          shingleSize = 3, numHashes = 8),
        "doc_id", numHashes = 8)
      .orderBy("keep_id")

  /** The hourly rollup run THROUGH the Structured Streaming engine
    * (AvailableNow → memory sink); oracle-checked against the same
    * batch SQL as q14 — stream/batch parity, proven. */
  private def q29(s: SparkSession, dir: String): DataFrame =
    StreamOps.runHourlyRollupAvailableNow(s, dir)
      .orderBy("hour", "event_type")

  /** Gap-based sessionization (30-min idle gap) per user. */
  private def q30(s: SparkSession, dir: String): DataFrame =
    StreamOps.sessionize(t(s, dir, "events"), gapMinutes = 30)
      .orderBy("user_id", "session_id")

  /** Backward as-of join: each purchase picks up the user's latest
    * click at or before it ([[graft.operators.AsofJoin]] — the
    * union-merge form, one key-shuffle, no per-key join explosion).
    * Times are epoch-micros BIGINTs so both engines order the exact
    * same integers (testdata ns timestamps are µs-precision). Clicks
    * are pre-aggregated per (user, time) — the operator's uniqueness
    * contract, same as DuckDB's ASOF. */
  private def q57(s: SparkSession, dir: String): DataFrame = {
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

  /** Winnowing rolling-hash fingerprints
    * ([[TextAnalysis.rollingFingerprints]], k=8 chars, w=5 windows)
    * exploded to (doc_id, fp) rows — the native one-pass kernel vs
    * the oracle's fully relational restatement of the same
    * arithmetic. */
  private def q77(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        explode(TextAnalysis.rollingFingerprints(col("text"), k = 8, w = 5))
          .as("fp"))
      .orderBy("doc_id", "fp")

  /** Streaming conversion funnel ([[StreamOps.streamingFunnel]]):
    * per-user state machine across two time-split micro-batches,
    * emitting a row the moment view→click→purchase completes; equals
    * the batch chained-min funnel (q62) restricted to completions. */
  private def q81(s: SparkSession, dir: String): DataFrame =
    StreamOps.runStreamingFunnelAvailableNow(s, dir,
        Seq("view", "click", "purchase"))
      .orderBy("user_id")

  /** PCA contract certification ([[Analyze.pcaCertify2d]]) — the
    * oracle-side proof for q35's eigendecomposition-in-the-loop
    * projection: per-row norm contraction + global orthonormality /
    * eigenvalue order / canonical sign / subspace-optimality flags,
    * all stated TRUE by the DuckDB oracle (q63's self-certification
    * pattern). */
  private def q82(s: SparkSession, dir: String): DataFrame =
    Analyze.pcaCertify2d(t(s, dir, "embeddings"), "embedding", Seq("vec_id"))
      .orderBy("vec_id")

  /** REAL image codec through the multimodal seam: deterministic
    * grayscale PNGs (closed-form pixels from doc_id) are encoded AND
    * decoded with javax.imageio under the one-codec-init-per-partition
    * batch contract; the oracle recomputes width/height/pixel-sum from
    * the generating formula, so a lossy or broken round trip breaks
    * the hash ([[Multimodal.withGrayPngPayload]] /
    * [[Multimodal.decodePngFeaturesBatched]]). */
  private def q83(s: SparkSession, dir: String): DataFrame = {
    val withPng = Multimodal.withGrayPngPayload(
      t(s, dir, "documents").select(col("doc_id")), "doc_id")
    Multimodal.decodePngFeaturesBatched(withPng, "payload")
      .select(col("doc_id"), col("width"), col("height"), col("px_sum"))
      .orderBy("doc_id")
  }

  /** REAL image resize through the multimodal seam: q83's
    * deterministic gray PNGs decoded and nearest-neighbour resized
    * to 8×6 ([[Multimodal.resizePngBatched]] — exact integer index
    * map `src = (dst·size) div outSize`), with the resized raster's
    * pixel sum recomputed by the oracle from the generating formula
    * alone. Completes the decode / feature-extract / RESIZE /
    * frame-sample family with a real, hash-certified member (the
    * byte-stride stub stays as the seam for codecs this container
    * lacks). */
  private def q146(s: SparkSession, dir: String): DataFrame = {
    val withPng = Multimodal.withGrayPngPayload(
      t(s, dir, "documents").select(col("doc_id")), "doc_id")
    Multimodal.resizePngBatched(withPng, "payload", outW = 8, outH = 6)
      .select(col("doc_id"), col("out_width"), col("out_height"),
        col("out_px_sum"))
      .orderBy("doc_id")
  }

  /** One planted PII string per category (doc_id mod 7 picks the
    * class) so every [[Scrub.piiPatterns]] regex fires inside the
    * hash check — the q41 planting pattern. Shared verbatim with the
    * oracle. */
  private val piiPlants: Seq[String] = Seq(
    " reach me at alice.smith+spam@corp-mail.example.org now",
    " ssn 123-45-6789 on file",
    " call 415-555-0123 today",
    " from host 10.42.255.7 logged",
    " card 4111111111111111 charged",
    " token deadbeefcafebabe0123456789abcdef leaked",
    " key sk-AbCd1234EfGh5678Ij leaked")

  /** PII / secret scrubbing as a corpus pass ([[Scrub.scrubPii]]):
    * per-category counts on the raw text + sequential redaction, all
    * dialect-shared regex — counts and redacted text both inside the
    * hash. */
  private def q84(s: SparkSession, dir: String): DataFrame = {
    val planted = element_at(array(piiPlants.map(lit): _*),
      (col("doc_id") % 7 + 1).cast("int"))
    Scrub.scrubPii(
        t(s, dir, "documents")
          .select(col("doc_id"), concat(col("text"), planted).as("text")),
        "text")
      .select(col("doc_id") +:
        Scrub.piiPatterns.map { case (c, _, _) => col(s"n_$c") } :+
        col("scrubbed"): _*)
      .orderBy("doc_id")
  }

  /** URL canonicalization + per-domain dedup rollup
    * ([[UrlOps.urlDedupRollup]]): synthetic crawl URLs with tracking
    * noise (query strings, fragments, WWW/case variants, trailing
    * slash — doc_id mods pick the variant) collapse to one canonical
    * form; the rollup reports URLs kept and rows removed per
    * domain. */
  private def q85(s: SparkSession, dir: String): DataFrame = {
    val url = concat(
      element_at(array(lit("https://"), lit("HTTPS://WWW.")),
        (col("doc_id") % 2 + 1).cast("int")),
      col("source"), lit(".Example.COM/p/"),
      (col("doc_id") % 37).cast("string"),
      element_at(
        array(lit(""), lit("/"), lit("?utm_source=feed&id=9"), lit("#section-2")),
        (col("doc_id") % 4 + 1).cast("int")))
    UrlOps.urlDedupRollup(
        t(s, dir, "documents").select(col("doc_id"), url.as("url")),
        "url", "doc_id")
      .orderBy("domain")
  }

  /** Corpus-trained unigram log-probability quality score
    * ([[TextAnalysis.unigramLogProb]]): per-token ln(freq/N) quantized
    * to integer micros so the per-doc sum is exact and
    * order-independent — perplexity-lite filtering as a two-aggregate
    * corpus pass. */
  private def q86(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLogProb(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** Deterministic training-order shuffle + sharding
    * ([[Curation.shardAndOrder]]): salted-hash shard assignment and
    * within-shard hash order, reproducible byte-for-byte — the stage
    * that hands a curated corpus to the trainer. */
  private def q87(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.shardAndOrder(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", nShards = 16)
      .select(col("doc_id"), col("source"), col("shard"), col("pos"))
      .orderBy("doc_id")

  /** Overlapping token-window chunking ([[TextAnalysis.chunkTokens]]):
    * 32-token chunks, 8-token overlap, provenance columns — the
    * document → model-input preparation stage, hash-checked including
    * every chunk's text. */
  private def q88(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkTokens(t(s, dir, "documents"), "doc_id", "text",
        chunkSize = 32, overlap = 8)
      .orderBy("doc_id", "chunk_id")

  /** Stream-static enrichment join
    * ([[StreamOps.streamStaticEnrich]]): each micro-batch broadcast-
    * joins a static customer dimension, then aggregates by (segment,
    * event type) — the stateless production enrichment shape, run
    * through the real engine against a plain batch-join oracle. */
  private def q89(s: SparkSession, dir: String): DataFrame =
    StreamOps.runStreamStaticEnrichAvailableNow(s, dir)
      .orderBy("c_mktsegment", "event_type")

  /** Registrable-domain (eTLD+1) folding
    * ([[UrlOps.registrableDomain]]): international URLs with
    * subdomain shards and two-label public suffixes fold to the
    * per-site grouping key; the vendored PSL slice is shared data the
    * oracle inlines. */
  /** The deterministic synthetic URL corpus shared by q90/q131/q134/
    * q136 (and their oracles, which inline the same arithmetic). */
  private def syntheticUrl: Column = concat(
      element_at(array(
        lit("https://ex"), lit("https://news.ex"), lit("https://WWW.ex"),
        lit("https://a.b.ex"), lit("https://ex"), lit("https://sub.ex")),
        (col("doc_id") % 6 + 1).cast("int")),
      (col("doc_id") % 20).cast("string"),
      element_at(array(
        lit(".com/p"), lit(".co.uk/a"), lit(".co.uk/b"),
        lit(".com.au/x"), lit(".org/y"), lit(".de/z")),
        (col("doc_id") % 6 + 1).cast("int")))

  private def q90(s: SparkSession, dir: String): DataFrame = {
    val url = syntheticUrl
    t(s, dir, "documents").select(col("doc_id"), url.as("url"))
      .select(col("doc_id"), col("url"),
        UrlOps.domainOf(col("url")).as("host"),
        UrlOps.registrableDomain(col("url")).as("registrable"))
      .orderBy("doc_id")
  }

  /** Z-order clustering key ([[Layout.zOrderKey]]): Morton
    * interleave of (user_id, value-milli) masked to 16 bits — the
    * write-side layout coordinate that makes parquet min/max stats
    * prune on both columns; the key arithmetic is hash-checked, the
    * layout win is pinned by LayoutSpec's rectangle-span test. */
  private def q91(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        round(col("value") * 1000).cast("long").as("value_milli"))
      .withColumn("z",
        graft.operators.Layout.zOrderKey(col("user_id"), col("value_milli")))
      .orderBy("event_id")

  /** Distributed global ordinals ([[Layout.globalOrdinals]]): 1-based
    * ranks by a total key via range repartition + per-partition
    * offset attach — no single-partition window sort anywhere in the
    * plan. The oracle is the window form (`row_number() OVER (ORDER
    * BY ...)`): same semantics, scale-opposite plan. */
  private def q92(s: SparkSession, dir: String): DataFrame =
    graft.operators.Layout.globalOrdinals(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        Seq("source", "doc_id"))
      .orderBy("doc_id")

  /** Streaming SCD type-2 ([[StreamOps.streamingScd2]]): per-key
    * state holds the open version; arriving changes close and emit
    * [valid_from, valid_to) rows incrementally. Oracle = the batch
    * q80 `lead()` form restricted to closed intervals. */
  private def q93(s: SparkSession, dir: String): DataFrame =
    StreamOps.runStreamingScd2AvailableNow(s, dir)
      .orderBy("user_id", "valid_from", "event_id")

  /** Character-entropy quality signal ([[TextAnalysis.charEntropy]]):
    * exact integer-micro Shannon entropy per document — the
    * compression-ratio-style gibberish/filler detector of the quality
    * family (q17 heuristics, q86 unigram model, this). */
  private def q94(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.charEntropy(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** Watermark late-data semantics
    * ([[StreamOps.runLateDataRollupAvailableNow]]): planted late
    * arrivals must be dropped and only watermark-finalized windows
    * emit; the oracle states both effects in closed form. */
  private def q95(s: SparkSession, dir: String): DataFrame =
    StreamOps.runLateDataRollupAvailableNow(s, dir)
      .orderBy("win_start_us", "event_type")

  /** Bucketed as-of join ([[AsofJoin.asofBackwardBucketed]]): q57's
    * enrichment with the per-(key, day-bucket) packing that spreads a
    * hot key's history across its time range — output hash-identical
    * to the plain form against the same DuckDB ASOF oracle. */
  private def q96(s: SparkSession, dir: String): DataFrame = {
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

  /** Incremental dedup against corpus history
    * ([[Dedup.dedupAgainstCorpus]]): a synthetic recrawl (every 5th
    * doc re-keyed; every 3rd of those edited) anti-joins the corpus
    * digest set — only genuinely new content survives ingestion. */
  private def q97(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    Dedup.dedupAgainstCorpus(batch, docs)
      .select(col("doc_id"), md5(col("text")).as("content_md5"))
      .orderBy("doc_id")
  }

  /** Round-8 end-to-end capstone, the q73 pattern over the NEW
    * stages: PII scrub → canonical-URL first-wins dedup → character-
    * entropy quality gate (exact integer predicate) → token-window
    * chunking → deterministic shard ordering. Every stage proven
    * individually (q84/q85/q94/q88/q87); ONE oracle proves the
    * composition. (Corpus-scale note: the url-deduped frame feeds the
    * entropy aggregate AND the gate join — an unmaterialized lineage
    * replans the upstream scan per consumer; persist it, like q86's
    * tokenCounts seam, when running this off-harness at scale.) */
  private def q98(s: SparkSession, dir: String): DataFrame = {
    val planted = element_at(array(piiPlants.map(lit): _*),
      (col("doc_id") % 7 + 1).cast("int"))
    val url = concat(
      element_at(array(lit("https://"), lit("HTTPS://WWW.")),
        (col("doc_id") % 2 + 1).cast("int")),
      col("source"), lit(".Example.COM/p/"),
      (col("doc_id") % 37).cast("string"),
      element_at(
        array(lit(""), lit("/"), lit("?utm_source=feed&id=9"), lit("#section-2")),
        (col("doc_id") % 4 + 1).cast("int")))
    val base = t(s, dir, "documents")
      .select(col("doc_id"), concat(col("text"), planted).as("text"),
        url.as("url"))
    val scrubbed = Scrub.scrubPii(base, "text")
      .select(col("doc_id"), col("url"), col("scrubbed"))
    val w = Window.partitionBy(col("__curl")).orderBy(col("doc_id"))
    val urlDeduped = scrubbed
      .withColumn("__curl", UrlOps.canonicalizeUrl(col("url")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("scrubbed"))
    val ent = TextAnalysis.charEntropy(urlDeduped, "doc_id", "scrubbed")
    val gated = urlDeduped.join(ent, "doc_id")
      .filter(col("n_chars") >= 100 &&
        col("entropy_micros") >= lit(2800000L) * col("n_chars"))
      .select(col("doc_id"), col("scrubbed"))
    val chunks = TextAnalysis.chunkTokens(gated, "doc_id", "scrubbed",
      chunkSize = 32, overlap = 8)
    graft.operators.Curation.shardAndOrder(
        chunks.select(
          (col("doc_id") * 1000 + col("chunk_id")).as("chunk_uid"),
          col("doc_id"), col("chunk_id"), col("n_tok")),
        "chunk_uid", nShards = 16)
      .select(col("chunk_uid"), col("doc_id"), col("chunk_id"),
        col("n_tok"), col("shard"), col("pos"))
      .orderBy("chunk_uid")
  }

  /** Hard-negative mining ([[Ann.hardNegatives]]): per query, the
    * top-5 most-similar corpus vectors that are neither the query nor
    * its labeled positive (q_id+1) — the contrastive-training
    * negatives a retrieval pipeline mines; over-fetch + filter proven
    * equal to filter-then-rank by the oracle. */
  private def q99(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val queries = e.filter(col("vec_id") % 50 === 0)
    val positives = queries.select(col("vec_id").as("q_id"),
      (col("vec_id") + 1).as("pos_id"))
    Ann.hardNegatives(queries, e, positives,
        "vec_id", "vec_id", "embedding", k = 5, maxPositivesPerQuery = 1)
      .orderBy("q_id", "neg_rank")
  }

  /** Streaming-ingest capstone
    * ([[StreamOps.runStreamIngestAvailableNow]]): two crawl waves
    * (originals, then a recrawl with planted PII on every 4th doc and
    * unchanged re-fetches on every 6th) flow scrub → length gate →
    * cross-batch dedup UNDER the engine; the oracle replays the chain
    * in batch over the same staged union. */
  private def q100(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val planted = element_at(array(piiPlants.map(lit): _*),
      (col("doc_id") % 7 + 1).cast("int"))
    val v0 = d.select(col("doc_id"), lit(0L).as("version"), col("text"))
    val v1 = d.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), lit(1L).as("version"),
        concat(col("text"), planted).as("text"))
      .unionByName(d.filter(col("doc_id") % 6 === 0 && col("doc_id") % 4 =!= 0)
        .select(col("doc_id"), lit(1L).as("version"), col("text")))
    val work = java.nio.file.Files.createTempDirectory("graft_singest_").toString
    val staging = s"$work/staging"
    new java.io.File(staging).mkdirs()
    StreamOps.stageVersionFile(v0, s"$staging/v0.parquet")
    StreamOps.stageVersionFile(v1, s"$staging/v1.parquet")
    val nRedactions = Scrub.piiPatterns
      .map { case (c, _, _) => col(s"n_$c") }
      .reduce(_ + _)
    StreamOps.runStreamIngestAvailableNow(s, staging, minChars = 50)
      .select(col("doc_id"), col("version"), col("text_md5"),
        nRedactions.as("n_redactions"))
      .orderBy("doc_id", "version")
  }

  /** Streaming EWMA ([[StreamOps.streamingEwma]], α = 0.25): one
    * double of per-user state; the oracle replays the exact recursion
    * (recursive CTE, identical IEEE expression shape), so the hash
    * proves bit-faithful float state across micro-batches. */
  private def q101(s: SparkSession, dir: String): DataFrame =
    StreamOps.runStreamingEwmaAvailableNow(s, dir, alpha = 0.25)
      .orderBy("user_id", "ts_us", "event_id")

  /** Count-min sketch frequency estimation ([[Sketch]]): build a
    * 4×16 deterministic md5-keyed sketch over the corpus token
    * frequencies, then point-query every vocabulary term. The narrow
    * width FORCES collisions at the harness vocabulary, so the
    * overcount column exercises the real CMS behaviour; the oracle
    * replays every cell and the min-estimate arithmetic exactly.
    * est ≥ f always (never undercounts). */
  private def q102(s: SparkSession, dir: String): DataFrame = {
    val freq = TextAnalysis.tokenCounts(t(s, dir, "documents"), "doc_id", "text")
      .groupBy(col("__tok").as("tok")).agg(sum(col("__c")).as("f"))
    val sketch = Sketch.countMinBuild(freq, "tok", "f",
      depth = 4, width = 16, salt = "cms")
    Sketch.countMinEstimate(sketch, freq, "tok",
        depth = 4, width = 16, salt = "cms")
      .select(col("tok"), col("f"), col("est"), (col("est") - col("f")).as("overcount"))
      .orderBy("tok")
  }

  /** Bloom-filter decontamination pre-filter ([[Sketch.bloomBuild]]):
    * the q58 eval/train split, but the eval 3-gram set is summarized
    * into a 1024-bit / 3-hash Bloom filter and every distinct train
    * (doc, shingle) is probed through it. Per train doc: shingle
    * count, bloom hits, exact hits — `bloom_hits ≥ exact_hits` on
    * every row (no false negatives), and the gap IS the measured
    * false-positive mass at the harness load factor (~16% of 16k
    * distinct probe shingles). The oracle replays every bit position
    * and the all-k-set test exactly. */
  private def q103(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    def docShingles(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 3)).as("shingle")).distinct()
    val evalSh = docShingles(d.filter(col("doc_id") % 97 === 0))
      .select("shingle").distinct()
    val trainSh = docShingles(d.filter(col("doc_id") % 97 =!= 0))
    val bloom = Sketch.bloomBuild(evalSh, "shingle",
      numBits = 1024, numHashes = 3, salt = "bloom")
    Sketch.bloomMightContain(bloom, trainSh, "shingle",
        numBits = 1024, numHashes = 3, salt = "bloom")
      .join(broadcast(evalSh.withColumn("__ex", lit(1))), Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("maybe"), 1L).otherwise(0L)).as("bloom_hits"),
        sum(when(col("__ex").isNotNull, 1L).otherwise(0L)).as("exact_hits"))
      .orderBy("doc_id")
  }

  /** Interpolated bigram LM scoring ([[TextAnalysis.bigramLogProb]]):
    * q86's unigram scorer with one token of context, λ=0.75
    * Jelinek-Mercer backoff. The oracle replays the ordered-adjacency
    * extraction, all three count layers, and the exact IEEE
    * expression shape `0.75·(f2/fc) + 0.25·(f1/N)` inside the micro-
    * quantized ln. */
  private def q104(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLogProb(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** Per-doc TF-IDF keyword extraction: top-5 terms by
    * `tf · round(ln(N/df)·10⁶)` with (score desc, term asc)
    * tie-break — the metadata-enrichment stage that tags every
    * curated document with its distinguishing terms. Integer-micro
    * idf keeps scores exactly ordinal cross-engine (no float-tie
    * ambiguity); df is one aggregate over DISTINCT (doc, term) rows,
    * the top-k is a doc-partitioned window (WindowGroupLimit prunes
    * to 5 per doc before the final sort). */
  private def q105(s: SparkSession, dir: String): DataFrame = {
    val counts = TextAnalysis.tokenCounts(t(s, dir, "documents"), "doc_id", "text")
    val nDocs = counts.select(countDistinct(col("doc_id")).as("__nd"))
    val dfreq = counts.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micros").desc, col("__tok").asc)
    counts.join(dfreq, Seq("__tok"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score_micros",
        round(log(col("__nd").cast("double") / col("__df").cast("double")) * 1e6)
          .cast("long") * col("__c"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("__tok").as("term"), col("__c").as("tf"), col("score_micros"))
      .orderBy("doc_id", "rank")
  }

  /** MinHash estimator accuracy, measured: for every LSH candidate
    * pair, the signature-agreement count (0..8 equal components — the
    * sketch's Jaccard estimate in eighths) beside the EXACT shingle
    * Jaccard. Per-component agreement is unbiased on a RANDOM pair
    * (P[sig_i equal] = J), but on pairs SELECTED by band collision it
    * overestimates wildly — at sf0.01 the sig_eq∈[2,7] candidates
    * average J≈0.01 while sig_eq=8 averages J≈0.87. That measured
    * selection bias is precisely why [[Dedup.minhashNearDuplicates]]
    * rescores candidates with exact Jaccard instead of trusting the
    * sketch. Both columns replay in DuckDB; one signature build, one
    * banding pass, pair-keyed joins only. */
  private def q106(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val sigs = Dedup.minhashSignatures(d, "text", "doc_id",
      shingleSize = 3, numHashes = 8)
    val pairs = Dedup.minhashCandidatePairs(sigs, "doc_id",
      numHashes = 8, rowsPerBand = 2)
    val sigA = sigs.select(col("doc_id").as("id_a") +:
      (0 until 8).map(i => col(s"sig_$i").as(s"__a_$i")): _*)
    val sigB = sigs.select(col("doc_id").as("id_b") +:
      (0 until 8).map(i => col(s"sig_$i").as(s"__b_$i")): _*)
    val sigEq = (0 until 8)
      .map(i => when(col(s"__a_$i") === col(s"__b_$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    Dedup.jaccardOnPairs(pairs, d, "text", "doc_id", shingleSize = 3)
      .join(sigA, Seq("id_a"))
      .join(sigB, Seq("id_b"))
      .withColumn("sig_eq", sigEq)
      .select("id_a", "id_b", "sig_eq", "n_inter", "n_a", "n_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** Weighted PageRank over the co-purchase graph ([[Graph.pageRank]]):
    * consecutive lineitems of an order define part→part edges, 5
    * damped iterations over micro-quantized ranks. The oracle unrolls
    * the identical 5 iterations as CTEs — integer re-quantization per
    * edge makes every iteration's sums order-independent, so the hash
    * certifies the whole fixpoint trajectory, not just row counts. */
  private def q107(s: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) alone is NOT unique in the harness
    // data — the part/supp tiebreak makes the lead() order total
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    val edges = t(s, dir, "lineitem")
      .select(col("l_partkey").as("src"),
        lead(col("l_partkey"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    Graph.pageRank(edges, "src", "dst", "w", iterations = 5)
      .orderBy("node")
  }

  /** Deterministic HLL ([[Sketch.hllDistinct]]): distinct-token
    * estimate per source, m=64 registers, beside the exact count.
    * The ESTIMATE hash-matches DuckDB — integer register math and one
    * fixed double expression — where q63's `approx_count_distinct`
    * could only be certified by accuracy-bound flags. */
  private def q108(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("source"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val est = Sketch.hllDistinct(toks, Seq("source"), "tok", p = 6, salt = "hll")
    val exact = toks.groupBy("source")
      .agg(countDistinct(col("tok")).as("exact_distinct"))
    est.join(exact, Seq("source"))
      .select("source", "n_used", "est", "exact_distinct")
      .orderBy("source")
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
  private def q109(s: SparkSession, dir: String): DataFrame = {
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

  /** Distributed micro-quantized Lloyd's k-means
    * ([[graft.operators.Cluster.kmeansMicro]]) — the certifiable
    * IVF-training path: per-vector cell assignment after 3
    * assign/update rounds at k=4, exact integer-micro squared
    * distances, cell sizes joined on for the balance picture. The
    * whole iterative trajectory hash-matches a DuckDB oracle
    * unrolling the same rounds (MLlib's KMeans, q32's codebook
    * trainer, can never be oracled — its float accumulation order is
    * partition-dependent). */
  private def q110(s: SparkSession, dir: String): DataFrame = {
    val asg = Cluster.kmeansMicro(t(s, dir, "embeddings"), "vec_id",
      "embedding", k = 4, iterations = 3)
    val sizes = asg.groupBy("cell").agg(count(lit(1)).as("cell_n"))
    asg.join(sizes, Seq("cell"))
      .select("vec_id", "cell", "dist2_q", "cell_n")
      .orderBy("vec_id")
  }

  /** EXACT Jaccard similarity self-join via prefix filtering
    * ([[graft.operators.Dedup.prefixJaccardPairs]]) — the
    * AllPairs/PPJoin blocking family beside q28's banded MinHash:
    * every pair at tau >= 4/5 is FOUND (no LSH false negatives; the
    * guarantee q106 measures the sketch against). Same planted
    * boilerplate corpus as q45/q46, so the recovered pair sets are
    * directly comparable. */
  private def q111(s: SparkSession, dir: String): DataFrame =
    Dedup.prefixJaccardPairs(corpusWithBoilerplate(s, dir), "text", "doc_id",
        shingleSize = 3, tauNum = 4, tauDen = 5)
      .orderBy("id_a", "id_b")

  /** q111 with the AUTO-COMPOSED exact-dup collapse
    * (`collapseExact = true`): the planted 12-copy boilerplate
    * cluster is represented by its lowest-id member instead of 66
    * identical jaccard-1.0 rows — the structural fix for the
    * prefix join's only skew hole (a c-copy cluster can never emit
    * c² output). Pairs between DISTINCT texts are unchanged. */
  private def q140(s: SparkSession, dir: String): DataFrame =
    Dedup.prefixJaccardPairs(corpusWithBoilerplate(s, dir), "text", "doc_id",
        shingleSize = 3, tauNum = 4, tauDen = 5, collapseExact = true)
      .orderBy("id_a", "id_b")

  /** LSH RECALL audit: every exact prefix-filter pair at tau >= 0.8
    * (the ground truth — no false negatives by the prefix theorem)
    * flagged with whether the banded-MinHash tier also surfaced it.
    * The dedup-quality report a 100 TB pipeline ships before trusting
    * its LSH pass: found_by_lsh = false rows ARE the measured recall
    * loss of the 8-hash/2-row banding at this corpus. Both chains are
    * certified individually (q111, q45-family); this joins them. */
  private def q133(s: SparkSession, dir: String): DataFrame =
    lshRecallAudit(s, dir, numHashes = 8)

  /** q139: the q133 recall audit at the SECOND banding preset —
    * 16 hashes × 2 rows = 8 bands. Doubling the bands roughly
    * squares the per-band miss probability's product term
    * (1-(1-s²)^b), so recall at the 0.8 threshold rises toward 1;
    * the measured recall delta and its wall cost sit in the PERF.md
    * ledger, making the recall/cost trade a config choice WITH data
    * — exactly what a 100 TB dedup pass needs before choosing its
    * preset. */
  private def q139(s: SparkSession, dir: String): DataFrame =
    lshRecallAudit(s, dir, numHashes = 16)

  /** q141: the recall audit with INDEPENDENT per-family digests
    * (salted md5 per family instead of the Kirsch-Mitzenmacher
    * h1+i·h2 derivation) — the engine-side fix for the correlated
    * recall loss the q133/q139 pair measured (same two pairs missed
    * at both band presets because one jointly-small (h1,h2) shingle
    * owned every derived family's min). The audit loop closed:
    * monitoring found a loss class, the engine ships the preset that
    * removes it, and this query measures the recovery under the same
    * ground truth. */
  private def q141(s: SparkSession, dir: String): DataFrame =
    lshRecallAudit(s, dir, numHashes = 8, independentHashes = true)

  private def lshRecallAudit(s: SparkSession, dir: String,
                             numHashes: Int,
                             independentHashes: Boolean = false): DataFrame = {
    val corpus = corpusWithBoilerplate(s, dir)
    val exact = Dedup.prefixJaccardPairs(corpus, "text", "doc_id",
        shingleSize = 3, tauNum = 4, tauDen = 5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val lsh = Dedup.minhashNearDuplicates(corpus, "text", "doc_id",
        shingleSize = 3, numHashes = numHashes, rowsPerBand = 2,
        jaccardThreshold = 0.8, independentHashes = independentHashes)
      .select(col("id_a").as("l_a"), col("id_b").as("l_b"))
    exact.join(lsh,
        col("id_a") === col("l_a") && col("id_b") === col("l_b"), "left")
      .select(col("id_a"), col("id_b"), col("jaccard"),
        col("l_a").isNotNull.as("found_by_lsh"))
      .orderBy("id_a", "id_b")
  }

  /** Streaming cardinality: q108's HLL registers carried as PER-KEY
    * STREAMING STATE ([[graft.streaming.StreamOps
    * .streamingHllDistinct]]) — per-source distinct-token estimates
    * snapshotted after each crawl wave, O(m) state per key. The
    * register math bit-matches the batch sketch, so a batch oracle
    * over each wave's cumulative prefix hash-matches the streamed
    * snapshots exactly. */
  private def q112(s: SparkSession, dir: String): DataFrame =
    StreamOps.runStreamingHllAvailableNow(s, dir, p = 6, salt = "hll")
      .orderBy("source", "wave")

  /** STREAMING decontamination gate ([[StreamOps
    * .runStreamingDecontaminateAvailableNow]]): the q103 Bloom
    * pre-filter at crawl rate — eval 3-gram Bloom built once in
    * batch and folded into the plan as a bit-array literal
    * ([[graft.operators.Sketch.bloomProbeColumn]]), train docs
    * arriving as two staged waves, each micro-batch a PURE
    * PROJECTION (no state store, no shuffle). The oracle replays
    * every bit position; bit coordinates are shared with the batch
    * sketch, so stream ≡ batch exactly. */
  private def q142(s: SparkSession, dir: String): DataFrame =
    StreamOps.runStreamingDecontaminateAvailableNow(s, dir,
        numBits = 1024, numHashes = 3, salt = "sdecon")
      .orderBy("doc_id")

  /** BOUNDED-MEMORY streaming dedup ([[StreamOps
    * .streamingBloomDedup]]): per-shard Bloom BITS as the only
    * state — the crawl-rate answer to q47's exact digest state
    * (which grows linearly forever). Exact duplicates always flag;
    * the deterministic false-positive rate is the price of the O(1)
    * bound, and determinism makes even the FPs hash-checkable: the
    * oracle replays first-setter-wins per (shard, bit position) over
    * the same (wave, doc_id) fold order. */
  private def q143(s: SparkSession, dir: String): DataFrame =
    // 64k bits/shard = 64 KB total state: sized so the fill stays
    // meaningful at BOTH harness SFs (~2% at sf0.01, ~32% at sf0.1 —
    // FP rate 7e-6 / 3e-2) instead of saturating; the production rule
    // is bits ~ 10x expected distinct digests per shard
    StreamOps.runStreamingBloomDedupAvailableNow(s, dir,
        numBits = 65536, numHashes = 3, salt = "bdedup", shards = 8)
      .orderBy("doc_id")

  /** Streaming Count-Min ([[StreamOps.streamingCountMin]]): the CMS
    * cell table as per-source streaming state over the same two-wave
    * token staging as q112; per (source, wave, probe) estimates
    * bit-match the batch sketch over the wave's cumulative prefix. */
  private def q129(s: SparkSession, dir: String): DataFrame =
    StreamOps.runStreamingCountMinAvailableNow(s, dir,
        depth = 4, width = 16, salt = "cms",
        probes = Seq("data", "of", "the"))
      .orderBy("source", "wave", "probe")

  /** Leakage-safe GROUPED split ([[graft.operators.Curation
    * .groupedSplit]]): q90's synthetic URLs reduced to their
    * registrable domain, split by the DOMAIN hash — every page of a
    * domain lands in one split, so near-duplicate scrapes cannot
    * straddle train and eval. */
  private def q131(s: SparkSession, dir: String): DataFrame = {
    val url = syntheticUrl
    val d = t(s, dir, "documents")
      .select(col("doc_id"), url.as("url"))
      .withColumn("registrable",
        graft.operators.UrlOps.registrableDomain(col("url")))
    graft.operators.Curation.groupedSplit(d, col("registrable"),
        Seq("train" -> 90, "valid" -> 5, "test" -> 5), salt = "gsplit")
      .select("doc_id", "registrable", "split")
      .orderBy("doc_id")
  }

  /** Crawl-frontier politeness interleave ([[graft.operators.Curation
    * .frontierInterleave]]) over q90's URL corpus: per-domain wave +
    * salted fetch key — ordering by (wave, fetch_key) spaces any one
    * domain's fetches ~|domains| apart. */
  private def q134(s: SparkSession, dir: String): DataFrame = {
    val url = syntheticUrl
    val d = t(s, dir, "documents")
      .select(col("doc_id"), url.as("url"))
      .withColumn("registrable",
        graft.operators.UrlOps.registrableDomain(col("url")))
    graft.operators.Curation.frontierInterleave(d, "doc_id", "registrable",
        salt = "frontier")
      .select("doc_id", "registrable", "wave", "fetch_key")
      .orderBy("doc_id")
  }

  /** Compression-ratio quality signal ([[graft.functions
    * .DeflateLenExpr]]): the Gopher-tier junk detector — repetitive
    * machine text compresses far below natural language, random
    * noise barely compresses. DuckDB has no DEFLATE, so the oracle
    * certifies BOUNDS the codec must satisfy (comp within
    * [11, raw+64]; a 4× self-repeat compresses to well under twice
    * the single copy — the backreference property that IS the
    * signal), the q63 self-certification pattern; the exact ratio is
    * pinned by DeflateLenSpec. Upper length bound: DEFLATE's
    * backreference window is 32 KB, so the 4× self-concat can only
    * reference the previous copy when one copy fits in the window —
    * the repetition contract is asserted for docs under 30 KB and
    * longer docs are out of this signal's scope (both sides filter
    * identically). */
  private def q135(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    def dlen(c: Column): Column =
      toColumn(graft.functions.DeflateLenExpr(toExpression(c)))
    t(s, dir, "documents").select(col("doc_id"), col("text"))
      .filter(expr("octet_length(text)") >= 200 &&
        expr("octet_length(text)") < 30000)
      .select(col("doc_id"),
        expr("octet_length(text)").cast("long").as("raw_bytes"),
        dlen(col("text")).cast("long").as("__c"),
        dlen(concat(col("text"), col("text"), col("text"), col("text")))
          .cast("long").as("__c4"))
      .select(col("doc_id"), col("raw_bytes"),
        (col("__c") >= 11L && col("__c") <= col("raw_bytes") + 64L)
          .as("comp_bounds_ok"),
        (col("__c4") < col("__c") * 2L + 32L).as("repetition_detected"))
      .orderBy("doc_id")
  }

  /** Round-9 curation capstone: quality-aware canonical dedup (keep
    * the longest member per near-dup cluster) → leakage-safe GROUPED
    * split on the synthetic registrable domain → crawl-frontier
    * politeness interleave of the train split. Every stage certified
    * individually (q127, q131, q134); this proves the composition
    * against ONE oracle built from the same SQL fragments. */
  private def q136(s: SparkSession, dir: String): DataFrame = {
    val kept = Dedup.clusterCanonicalByScore(corpusWithBoilerplate(s, dir),
        "text", "doc_id", length(col("text")).cast("long"),
        shingleSize = 3, numHashes = 8, rowsPerBand = 2,
        jaccardThreshold = 0.8)
      .filter(col("keep"))
      .select(col("doc_id"))
    val url = syntheticUrl
    val domained = kept
      .select(col("doc_id"), url.as("url"))
      .withColumn("registrable",
        graft.operators.UrlOps.registrableDomain(col("url")))
    val split = graft.operators.Curation.groupedSplit(domained,
      col("registrable"), Seq("train" -> 90, "valid" -> 5, "test" -> 5),
      salt = "gsplit")
    graft.operators.Curation.frontierInterleave(
        split.filter(col("split") === "train"), "doc_id", "registrable",
        salt = "frontier")
      .select("doc_id", "registrable", "split", "wave", "fetch_key")
      .orderBy("doc_id")
  }

  /** Hot-key-safe salted aggregation ([[graft.operators.Salting]]):
    * per-event-type exact milli-sums through the two-phase
    * salt → partial → merge rewrite; result equals the plain GROUP BY
    * the oracle states — the aggregate-skew guard beside the as-of
    * bucketing (joins) and LSH caps (buckets). */
  private def q137(s: SparkSession, dir: String): DataFrame =
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
  private def q138(s: SparkSession, dir: String): DataFrame = {
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

  /** PMI collocations ([[TextAnalysis.pmiCollocations]]): corpus-wide
    * top-50 adjacent-pair collocations at min-count 5, PMI quantized
    * to integer micros with the oracle's identical expression tree. */
  private def q132(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiCollocations(t(s, dir, "documents"), "doc_id", "text",
      minCount = 5L, topK = 50)

  /** Exact per-shard embedding DIVERSITY audit: spread_num =
    * n·Σ‖x‖² − ‖Σx‖² over 2^20-quantized elements — n² times the
    * total variance, as exact BIGINTs (the curation signal behind
    * diversity-aware data selection: a shard of near-identical
    * vectors scores ~0). One posexplode projection, ONE map-combined
    * (shard, dim) aggregate (≤ shards·dims rows cross the shuffle),
    * then a shards-sized fold — the corpus never shuffles. */
  private def q130(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), pmod(col("vec_id"), lit(8L)).as("shard"),
        col("embedding"))
    val q = e
      .select(col("shard"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("shard"), col("dim"),
        round(col("x") * 1048576).cast("long").as("qx"))
    val dimAgg = q.groupBy("shard", "dim")
      .agg(sum(col("qx")).as("s_d"), sum(col("qx") * col("qx")).as("ss_d"))
    val shardAgg = dimAgg.groupBy("shard")
      .agg(sum(col("ss_d")).as("sum_sq"), sum(col("s_d") * col("s_d")).as("sum_dim_sq"))
    val n = e.groupBy("shard").agg(count(lit(1)).as("n"))
    n.join(shardAgg, Seq("shard"))
      .select(col("shard"), col("n"), col("sum_sq"), col("sum_dim_sq"),
        (col("n") * col("sum_sq") - col("sum_dim_sq")).as("spread_num"))
      .orderBy("shard")
  }

  /** Embedding-space outlier mining
    * ([[graft.operators.Cluster.centroidDistances]]): each vector's
    * exact integer-micro squared distance to its OWN label centroid,
    * top-3 farthest per label under WindowGroupLimit — the
    * mislabeled-sample shortlist a semantic noise filter reviews.
    * Every distance is an exact BIGINT, so ranks and values
    * hash-match the DuckDB replay. */
  private def q113(s: SparkSession, dir: String): DataFrame = {
    val d = Cluster.centroidDistances(t(s, dir, "embeddings"),
      "vec_id", "embedding", "label")
    val w = Window.partitionBy(col("label"))
      .orderBy(col("dist2_q").desc, col("vec_id"))
    d.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("label", "rank", "vec_id", "dist2_q")
      .orderBy("label", "rank")
  }

  /** Exact-budget mixture build: largest-remainder quotas
    * ([[graft.operators.Curation.largestRemainderQuotas]], B = 123
    * rows across the 20 sources — non-divisible on purpose, and the
    * harness's equal per-source counts make EVERY remainder tie, so
    * the key-asc tiebreak is load-bearing) followed by the
    * deterministic md5 bottom-k pick per source. `picked_md5` hashes
    * the actual selected id set, so the driver check pins the full
    * selection, not just its size. */
  private def q114(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val quotas = graft.operators.Curation.largestRemainderQuotas(
      docs, "source", budget = 123L)
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(concat(lit("lr:"), col("doc_id").cast("string"))))
    val picked = docs
      .withColumn("__rn", row_number().over(w))
      .join(quotas.select("source", "quota"), Seq("source"))
      .filter(col("__rn") <= col("quota"))
      .groupBy("source")
      .agg(count(lit(1)).as("picked_n"),
        md5(array_join(transform(sort_array(collect_list(col("doc_id"))),
          x => x.cast("string")), ",")).as("picked_md5"))
    quotas.join(picked, Seq("source"))
      .select("source", "n_docs", "quota", "picked_n", "picked_md5")
      .orderBy("source")
  }

  /** Content-defined chunk dedup
    * ([[graft.operators.TextAnalysis.cdcChunks]], k=8, 2⁵ mask):
    * CDC-split the boilerplate corpus, hash every chunk, and report
    * per doc how many of its chunks are SHARED with another document
    * — the dedup-storage / RETRO-retrieval primitive beside q88's
    * fixed-window chunking. The planted 12-copy cluster shares every
    * chunk; edit-shifted docs keep their untouched chunks shared,
    * which fixed chunking loses past the first edit. */
  private def q115(s: SparkSession, dir: String): DataFrame = {
    val ch = corpusWithBoilerplate(s, dir)
      .select(col("doc_id"),
        explode(TextAnalysis.cdcChunks(col("text"), k = 8, maskBits = 5))
          .as("chunk"))
      .select(col("doc_id"), md5(col("chunk")).as("hh"),
        length(col("chunk")).as("clen"))
    val spread = ch.groupBy("hh")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    ch.join(spread, Seq("hh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") > 1, lit(1L)).otherwise(lit(0L)))
          .as("n_shared"),
        sum(col("clen").cast("long")).as("total_chars"))
      .orderBy("doc_id")
  }

  /** Join-skew diagnostic: the top-20 hottest keys of a would-be join
    * column, with EXACT integer share-of-total micros and a rational
    * hot flag (cnt·500 > total ⇔ share > 0.2%) — the report you run
    * before keying a 100 TB shuffle on a column, and the measurement
    * behind this engine's hot-bucket caps and salting decisions.
    * Bounded output via orderBy+limit (TakeOrderedAndProject — no
    * global window); the total is a 1-row broadcast. */
  private def q116(s: SparkSession, dir: String): DataFrame = {
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
  private def q117(s: SparkSession, dir: String): DataFrame = {
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

  /** Corpus drift monitor: per-source token-distribution shift
    * between the two crawl waves — Jensen-Shannon divergence with
    * each token's contribution micro-quantized (one fixed double
    * expression per token over exact integer counts, `ln` parity
    * proven by the LM scorers) so the per-source SUM is an exact
    * long, order-independent, and hash-matches the DuckDB replay.
    * `new_types`/`lost_types` count vocabulary churn. One shuffle on
    * (source, tok), map-side-combined; wave totals join back
    * broadcast (sources are a catalog). */
  private def q118(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("source"), expr("(doc_id div 20) % 2").as("wave"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val cnt = toks.groupBy("source", "tok").agg(
      sum(when(col("wave") === 0, 1L).otherwise(0L)).as("ca"),
      sum(when(col("wave") === 1, 1L).otherwise(0L)).as("cb"))
    val tot = cnt.groupBy("source")
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val term = cnt.join(broadcast(tot), Seq("source"))
      .withColumn("__p", col("ca").cast("double") / col("na").cast("double"))
      .withColumn("__q", col("cb").cast("double") / col("nb").cast("double"))
      .withColumn("__t", round(lit(1000000) * (
        when(col("ca") > 0, lit(0.5) * col("__p")
          * log(lit(2.0) * col("__p") / (col("__p") + col("__q"))))
          .otherwise(lit(0.0))
        + when(col("cb") > 0, lit(0.5) * col("__q")
          * log(lit(2.0) * col("__q") / (col("__p") + col("__q"))))
          .otherwise(lit(0.0)))).cast("long"))
    term.groupBy("source").agg(
        max(col("na")).as("na"), max(col("nb")).as("nb"),
        sum(when(col("cb") > 0 && col("ca") === 0, 1L).otherwise(0L))
          .as("new_types"),
        sum(when(col("ca") > 0 && col("cb") === 0, 1L).otherwise(0L))
          .as("lost_types"),
        sum(col("__t")).as("jsd_micro"))
      .orderBy("source")
  }

  /** Hybrid-retrieval rank fusion: reciprocal-rank fusion of the
    * EXACT cosine top-10 (q25's ranker) with a SCALE-FREE INT8 top-10
    * (q50's quantization ranked by the exact integer dot product) —
    * the two-view retrieval a curation pipeline fuses before mining
    * (q99). Every RRF contribution is `1000000 div (60 + rank)` —
    * PURE INTEGER, so fusion has no float anywhere and the fused
    * ranking hash-matches by construction; items outside one
    * ranker's top-10 contribute only their present term (standard
    * RRF@k). Output also exposes both source ranks, so rank
    * disagreement (the int8 quantization error in RANK space, beside
    * q50's value-space max_err) is directly readable. */
  private def q119(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val ra = Ann.bruteForceTopK(e.filter(col("vec_id") % 50 === 0), e,
        "vec_id", "vec_id", "embedding", k = 10)
      .select(col("q_id"), col("c_id"),
        col("rank").cast("long").as("r_exact"))
    val qz = e
      .select(col("vec_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("__v"))
      .withColumn("__sc",
        expr("array_max(transform(__v, x -> abs(x)))"))
      .select(col("vec_id"),
        expr("transform(__v, x -> CAST(CASE WHEN __sc = 0 THEN 0 " +
          "ELSE round(x / __sc * 127) END AS INT))").as("qv"))
    val scored = qz.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("qv").as("qa"))
      .crossJoin(broadcast(qz.select(col("vec_id").as("c_id"),
        col("qv").as("qb"))))
      .withColumn("dotint",
        expr("aggregate(zip_with(qa, qb, (a, b) -> CAST(a AS BIGINT) * b), " +
          "0L, (s, x) -> s + x)"))
    val wb = Window.partitionBy(col("q_id"))
      .orderBy(col("dotint").desc, col("c_id"))
    val rb = scored.withColumn("r_int8", row_number().over(wb).cast("long"))
      .filter(col("r_int8") <= 10)
      .select("q_id", "c_id", "r_int8")
    val fused = ra.join(rb, Seq("q_id", "c_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr("1000000 div (60 + r_exact)"), lit(0L))
          + coalesce(expr("1000000 div (60 + r_int8)"), lit(0L)))
    val wf = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf_micro").desc, col("c_id"))
    fused.withColumn("rank", row_number().over(wf).cast("long"))
      .filter(col("rank") <= 5)
      .select("q_id", "rank", "c_id", "rrf_micro", "r_exact", "r_int8")
      .orderBy("q_id", "rank")
  }

  /** Round-8 capstone — training-shard MANIFEST build: exact-budget
    * quota selection (q114) → deterministic shard assignment + dense
    * order (q87) → content-defined chunking (q115) → per-shard
    * manifest rows with an md5 over the ORDERED chunk-hash stream.
    * One lineage from corpus to publishable shard manifest, every
    * stage the already-certified operator, ONE oracle replaying the
    * whole chain — the manifest_md5 pins chunk content AND order, so
    * any drift in any stage breaks the hash. */
  private def q120(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val quotas = graft.operators.Curation.largestRemainderQuotas(
      docs, "source", budget = 123L)
    val wq = Window.partitionBy(col("source"))
      .orderBy(md5(concat(lit("lr:"), col("doc_id").cast("string"))))
    val picked = docs.withColumn("__rn", row_number().over(wq))
      .join(quotas.select("source", "quota"), Seq("source"))
      .filter(col("__rn") <= col("quota"))
      .select("doc_id", "text")
    val sharded = graft.operators.Curation.shardAndOrder(
      picked, "doc_id", nShards = 4)
    val chunks = sharded.select(col("shard"), col("pos"), col("doc_id"),
      posexplode(TextAnalysis.cdcChunks(col("text"), k = 8, maskBits = 5))
        .as(Seq("ci", "chunk")))
    chunks.groupBy("shard").agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(length(col("chunk")).cast("long")).as("total_chars"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col("pos").as("p"),
            col("ci").as("i"), md5(col("chunk")).as("h")))),
          x => x.getField("h")), "")).as("manifest_md5"))
      .orderBy("shard")
  }

  /** embeddings plus a planted near-duplicate twin for every 25th
    * vector (one coordinate +0.01, id offset +100000) — the
    * semantic-dedup workload for q121; the natural corpus has no
    * pair above cosine 0.52, so every emitted pair is a twin. The
    * DOUBLE cast + perturbation replay bit-identically in the oracle
    * ([[twinsCteSql]]): both engines do the same IEEE add before the
    * same micro rounding. */
  private def embeddingsWithTwins(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    // two-step projection: the perturbation lambda must see the
    // ORIGINAL vec_id — in a single select, col("vec_id") inside the
    // lambda resolves against the re-aliased output (+100000) and the
    // wrong coordinate moves
    e.unionByName(e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i.cast("long") === col("vec_id") % 64,
            x + lit(0.01)).otherwise(x)).as("embedding"))
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
  }

  /** SemDeDup — semantic near-duplicate detection
    * ([[graft.operators.Cluster.semanticNearDupPairs]], k=8, 2
    * rounds, tau = 9/10): cluster the twinned embeddings with the
    * certified k-means, then exact-integer cosine tests ONLY within
    * a cell — the cluster step bounds the quadratic exactly the way
    * banding bounds MinHash, which is what makes embedding-space
    * dedup feasible at 100 TB (k scales with the corpus; cells stay
    * bounded; the hot-cell cap guards collapse). All 20 planted
    * twins surface; the keep side is the member closer to its
    * centroid. The whole chain — k-means trajectory, integer dots,
    * threshold, keep rule — hash-matches the DuckDB replay. */
  private def q121(s: SparkSession, dir: String): DataFrame =
    Cluster.semanticNearDupPairs(embeddingsWithTwins(s, dir),
        "vec_id", "embedding", k = 8, iterations = 2,
        tauNum = 9, tauDen = 10)
      .orderBy("id_a", "id_b")

  /** Duplicate 5-gram SPAN mass per document
    * ([[TextAnalysis.duplicateSpans]]) — the substring-level dedup
    * tier (Lee et al. 2021 ExactSubstr, n-gram-anchored): positions
    * whose 5-token gram repeats corpus-wide, merged into maximal
    * spans, reported as exact integer span counts/mass/fraction. */
  private def q122(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.duplicateSpans(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", n = 5)
      .orderBy("doc_id")

  /** BPE tokenizer training ([[graft.operators.Bpe.trainMerges]]):
    * 8 merge rounds over the corpus vocabulary — pair counting as a
    * map-combined aggregate, the merge decision a 1-row collect, the
    * merge application a literal replace on the bracket-encoded
    * symbol state. The whole merge trajectory (winning pair, its
    * weighted count, and the post-merge corpus token count per
    * round) hash-matches a DuckDB oracle unrolling the same rounds
    * independently — argmax recomputed from the oracle's own state,
    * not replayed from learned literals. Runs in BATCHED mode
    * (mergesPerAction=16): provably sequential-equivalent multi-merge
    * actions (Bpe.trainMergesBatched's prefix/chain/threat rules), so
    * the hash is unchanged while the gate exercises the scale path;
    * the driver-local tail variant is pinned by BpeSpec and the
    * BpeBatchProbe ledger row. */
  private def q123(s: SparkSession, dir: String): DataFrame =
    Bpe.trainMerges(t(s, dir, "documents"), "text", iterations = 8,
        mergesPerAction = 16)
      .orderBy("iteration")

  /** Unicode NFC normalization
    * ([[graft.functions.NfcNormalizeExpr]]): canonical composition of
    * the mixed precomposed/decomposed text a real crawl delivers,
    * BEFORE any content hash treats the two byte forms as different
    * documents. Every third doc gets a decomposed suffix (combining
    * acute/tilde/diaeresis); the rest exercise the already-NFC fast
    * path. Codepoint counts before/after, the changed flag, and the
    * md5 of the normalized text hash-match DuckDB's native
    * `nfc_normalize`. */
  private def q124(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    // DECOMPOSED on purpose: base letters + combining acute (U+0301),
    // tilde (U+0303), diaeresis (U+0308); NFC composes them to the
    // precomposed cafe/manana/zurich accented forms
    val suffix = " cafe\u0301 man\u0303ana zu\u0308rich"
    val messy = when(col("doc_id") % 3 === 0,
      concat(col("text"), lit(suffix))).otherwise(col("text"))
    t(s, dir, "documents")
      .select(col("doc_id"), messy.as("__m"))
      .withColumn("__n", toColumn(
        graft.functions.NfcNormalizeExpr(toExpression(col("__m")))))
      .select(col("doc_id"),
        length(col("__m")).cast("long").as("raw_cp"),
        length(col("__n")).cast("long").as("nfc_cp"),
        (col("__n") =!= col("__m")).as("changed"),
        md5(col("__n")).as("nfc_md5"))
      .orderBy("doc_id")
  }

  /** Corpus snapshot diff ([[graft.operators.Curation.snapshotDiff]]):
    * the re-crawl audit — adds, deletes, content changes, carries —
    * over a planted v2 snapshot (every 11th doc deleted, every 5th
    * revised, every 13th re-added under a new id). Content reduces
    * to (id, md5) BEFORE the full-outer join, so the text never
    * crosses the shuffle. */
  private def q125(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val oldSnap = docs.select(col("doc_id"), col("text"))
    val newSnap = docs
      .filter(col("doc_id") % 11 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .unionAll(docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(lit("new "), col("text")).as("text")))
    graft.operators.Curation.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Asymmetric shingle containment ([[Dedup.containmentOnPairs]]):
    * each doc paired with a planted half-length PREFIX clone — the
    * near-inclusion shape (quote/subset) where containment on the
    * short side is ~1 while Jaccard collapses toward |B|/|A|. The
    * decontamination measure symmetric Jaccard misses. */
  private def q126(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").filter(col("doc_id") < 40)
      .select(col("doc_id"), col("text"))
    val words = split(col("text"), "\\s+")
    val half = base.select((col("doc_id") + 5000L).as("doc_id"),
      array_join(slice(words, lit(1),
        greatest(floor(size(words) / 2), lit(1)).cast("int")), " ").as("text"))
    val docs = base.unionByName(half)
    val pairs = base.select(col("doc_id").as("id_a"),
      (col("doc_id") + 5000L).as("id_b"))
    Dedup.containmentOnPairs(pairs, docs, "text", "doc_id", shingleSize = 3)
      .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard",
        "containment_a", "containment_b")
      .orderBy("id_a")
  }

  /** Quality-aware cluster canonicalization
    * ([[Dedup.clusterCanonicalByScore]]): q53's near-dup components
    * with the representative picked by MAX text length (ties → min
    * id) — keep the richest copy, not the smallest id. */
  private def q127(s: SparkSession, dir: String): DataFrame =
    Dedup.clusterCanonicalByScore(corpusWithBoilerplate(s, dir), "text",
        "doc_id", length(col("text")).cast("long"),
        shingleSize = 3, numHashes = 8, rowsPerBand = 2,
        jaccardThreshold = 0.8)
      .orderBy("doc_id")

  /** Matryoshka-truncation recall audit: exact top-10 by full-width
    * cosine vs top-10 by the first-16-dims truncation, per-query
    * overlap count — the evaluation a dimension-reduction rollout
    * ships before swapping the cheap prefilter in. Both rankings are
    * broadcast brute-force with the identical score expression, so
    * the oracle replays them bit-exactly. */
  private def q128(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val et = e.select(col("vec_id"),
      slice(col("embedding"), 1, 16).as("embedding"))
    val k = 10
    val full = Ann.bruteForceTopK(e.filter(col("vec_id") % 50 === 0), e,
      "vec_id", "vec_id", "embedding", k)
    val trunc = Ann.bruteForceTopK(et.filter(col("vec_id") % 50 === 0), et,
      "vec_id", "vec_id", "embedding", k)
    val ov = full.select(col("q_id"), col("c_id"))
      .join(trunc.select(col("q_id").as("t_q"), col("c_id").as("t_c")),
        col("q_id") === col("t_q") && col("c_id") === col("t_c"))
      .groupBy("q_id").agg(count(lit(1)).as("n_common"))
    full.select("q_id").distinct()
      .join(ov, Seq("q_id"), "left")
      .select(col("q_id"), lit(k.toLong).as("k"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .orderBy("q_id")
  }

  /** The retrieval-cascade capstone ([[Ann.retrievalCascade]]): the
    * certified tiers composed into the production read path —
    * matryoshka 32-dim prefix prefilter (q128's truncation) → int8
    * re-rank over dequantized q50 vectors → exact full-precision
    * top-5 rescore (q25's kernel), candidates contracting
    * corpus → 100 → 30 → 5 per query. `exact_rank` joins each answer
    * to its brute-force ground-truth position, so recall is measured
    * inside the hash-checked result (0.94 at sf0.01 — the loss is
    * entirely tier 1: these synthetic vectors are isotropic, so a
    * 32/64 prefix carries only half the variance; trained matryoshka
    * embeddings concentrate it, which is what makes the tier a
    * prefilter rather than a gamble). Every tier's arithmetic is
    * engine-exact (prefix slice, q50's round-quantize formula, shared
    * cosine kernel), so the WHOLE cascade replays in DuckDB. */
  private def q147(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    Ann.retrievalCascade(e.filter(col("vec_id") % 50 === 0), e,
        "vec_id", "vec_id", "embedding",
        prefixDim = 32, c1 = 100, c2 = 30, k = 5)
      .orderBy("q_id", "rank")
  }

  /** Per-GROUP heavy hitters: the Misra-Gries bounded-state sketch
    * ([[graft.functions.FreqItemsAgg]]) as one aggregate per source —
    * per-domain top terms with O(capacity) state per group. Counts
    * are exact here (vocabulary ≪ capacity), so the oracle states
    * plain exact counts. */
  private def q79(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), "\\s+")).as("token"))
      .groupBy(col("source"))
      .agg(graft.functions.FreqItemsAgg.freqItems(col("token"), 4096).as("__hh"))
      .select(col("source"), explode(col("__hh")).as("__e"))
      .select(col("source"), col("__e.item").as("token"), col("__e.count").as("cnt"))
      .orderBy("source", "token")

  /** SCD type-2 validity intervals: each (user, value-change) row
    * becomes [valid_from, valid_to) via `lead()` over event time —
    * the warehouse history-table build, one partitioned window. */
  private def q80(s: SparkSession, dir: String): DataFrame = {
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

  /** Winnowing-based near-dup pairs
    * ([[TextAnalysis.winnowNearDuplicates]]): fingerprint-keyed
    * self-join (no doc×doc), ubiquitous fingerprints (df > 5)
    * dropped first, pairs sharing ≥ 2 selected 20-char-gram
    * fingerprints. */
  private def q78(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowNearDuplicates(t(s, dir, "documents"),
        "doc_id", "text", k = 20, w = 12, minShared = 2L, maxDocFreq = 5L)
      .orderBy("id_a", "id_b")

  /** Streaming per-source admission quota
    * ([[StreamOps.perSourceQuota]]): at most 15 docs per source
    * ACROSS two staged crawl waves — one long of state per key,
    * deterministic (batch, doc_id) admission order, mirrored by the
    * oracle's row_number over (version, doc_id). */
  private def q76(s: SparkSession, dir: String): DataFrame =
    StreamOps.runPerSourceQuotaAvailableNow(s, dir, quota = 15L)
      .orderBy("doc_id")

  /** Score-weighted importance sampling
    * ([[graft.operators.Curation.importanceSample]]): each doc kept
    * with probability = its quality score — membership a pure
    * hash-threshold projection, engine-exact because both engines
    * compute the identical score doubles (q17) and the identical
    * floor product. */
  private def q75(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.importanceSample(
        TextAnalysis.qualityMetrics(TextAnalysis.languageId(t(s, dir, "documents"))),
        "doc_id", col("quality_score"))
      .select(col("doc_id"), col("source"), col("quality_score"))
      .orderBy("doc_id")

  /** Johnson-Lindenstrauss random projection ([[Ann.randomProject]]):
    * 64-d embeddings → 8 dims through seeded literal planes shared
    * verbatim with the oracle SQL — a pure codegen projection, no
    * shuffle, no fit. */
  private def q74(s: SparkSession, dir: String): DataFrame =
    Ann.randomProject(t(s, dir, "embeddings"), "vec_id", "embedding", projPlanes)
      .orderBy("vec_id")

  /** The end-to-end corpus-assembly pipeline, composed from operators
    * proven individually: quality+language filter (q17/q18) → exact
    * dedup (q15) → benchmark decontamination (q58, dropping eval docs
    * and ≥2-hit leaks) → mixture resample (q61) → deterministic split
    * (q48) → 512-token packing per split (q52). One oracle proves the
    * whole composition — the "switch your training-data pipeline to
    * this engine" showpiece. */
  private def q73(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val scored = TextAnalysis.qualityMetrics(TextAnalysis.languageId(d))
    val filtered = scored.filter(col("predicted_lang") === "en" &&
      col("quality_score") >= 0.5 && col("n_words") >= 5)
    val w = Window.partitionBy(col("__h")).orderBy(col("doc_id"))
    val deduped = filtered.withColumn("__h", md5(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val train = deduped.filter(col("doc_id") % 97 =!= 0)
    val contaminated = graft.operators.Decontaminate.contaminationReport(
        train, d.filter(col("doc_id") % 97 === 0), "doc_id", "text", 3, 2)
      .filter(col("contaminated")).select(col("doc_id"))
    val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"),
        col("n_words").cast("long").as("ws_tokens"))
    val mixed = graft.operators.Curation.resampleToMixture(
      clean, "source", "doc_id", Seq("src0" -> 3, "src1" -> 2))
    val split = graft.operators.Curation.deterministicSplit(
      mixed, "doc_id", Seq("train" -> 90, "valid" -> 5, "test" -> 5))
    graft.operators.Curation.packSequences(
        split, "doc_id", "ws_tokens", budget = 512L, partCols = Seq("split"))
      .select(col("doc_id"), col("source"), col("split"), col("ws_tokens"),
        col("pack_id"), col("pack_offset").cast("long").as("pack_offset"))
      .orderBy("doc_id")
  }

  /** LEFT-OUTER stream-stream interval join through the engine:
    * unmatched purchases emit null click columns only on
    * watermark-driven state eviction (sentinel micro-batches advance
    * the watermark past all real data — see
    * [[StreamOps.runClickAttributionOuterAvailableNow]]). */
  private def q72(s: SparkSession, dir: String): DataFrame =
    StreamOps.runClickAttributionOuterAvailableNow(s, dir, windowMinutes = 120)
      .orderBy("purchase_id", "click_id")

  /** TPC-H Q5-shaped 4-table star join: revenue by nation for one
    * order year — two big-table hash joins on their keys plus two
    * broadcast dims (customer at this SF, nation always), date filter
    * pushed to the orders scan, money summed as integer cents. */
  private def q71(s: SparkSession, dir: String): DataFrame = {
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

  /** Native `session_window` gap sessions (the built-in SessionWindow
    * operator, vs q30's window-function formulation). The gap is
    * INCLUSIVE — an event at exactly prev+gap merges (pinned by
    * StreamOpsSpec's exact-gap case), the same `> gap` split rule as
    * the oracle's lag/cumsum form; `end = last event + gap`. */
  private def q70(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"))
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("value_milli"))
      .orderBy("user_id", "session_start")

  /** Edit-distance fuzzy join ([[graft.operators.FuzzyJoin]]):
    * every 10th part name with its first character corrupted, matched
    * back to the catalog at levenshtein <= 1 — length-interval
    * blocking + bounded-threshold verify. */
  private def q69(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
    val queries = part.filter(col("p_partkey") % 10 === 0)
      .select(col("p_partkey").as("q_key"),
        concat(lit("x"), substring(col("p_name"), 2, 1000)).as("q_name"))
    graft.operators.FuzzyJoin.editDistanceJoin(
        queries, part.select(col("p_partkey"), col("p_name")),
        "q_name", "p_name", maxDist = 1)
      .select(col("q_key"), col("p_partkey"), col("dist"))
      .orderBy("q_key", "p_partkey")
  }

  /** Boilerplate-unit removal ([[TextAnalysis.removeFrequentUnits]]):
    * text chunked into 8-word units; a template header planted on
    * three sources (60 docs ≫ maxDocFreq=10) must strip from every
    * doc while content chunks survive in order. */
  private def q68(s: SparkSession, dir: String): DataFrame = {
    val header = "terms of service apply to this site content"
    val withHeader = t(s, dir, "documents").select(col("doc_id"),
      when(col("source").isin("src0", "src1", "src2"),
        concat(lit(header + " "), col("text"))).otherwise(col("text")).as("t"))
    val words = split(col("t"), "\\s+")
    val nChunks = ceil(size(words) / lit(8.0)).cast("int")
    val units = transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(words, i * 8 + 1, lit(8)), " "))
    TextAnalysis.removeFrequentUnits(
        withHeader.select(col("doc_id"), units.as("units")),
        "doc_id", "units", maxDocFreq = 10)
      .orderBy("doc_id")
  }

  /** Corrupt-record quarantine: `from_json` yields a null struct on
    * malformed input (planted on every 7th event), routing bad rows
    * to quarantine counts instead of failing the job — the ingest
    * posture a crawl pipeline needs. Parse + route is one projection;
    * no separate validation pass. */
  private def q67(s: SparkSession, dir: String): DataFrame = {
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
  private def q65(s: SparkSession, dir: String): DataFrame =
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
  private def q66(s: SparkSession, dir: String): DataFrame = {
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
  private def q64(s: SparkSession, dir: String): DataFrame = {
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
  private def q63(s: SparkSession, dir: String): DataFrame = {
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
  private def q62(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.funnel(
        t(s, dir, "events").select(col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type")),
        "user_id", "ts_us", "event_type", Seq("view", "click", "purchase"))
      .orderBy("user_id")

  /** Deterministic mixture resample ([[graft.operators.Curation
    * .resampleToMixture]]): src0 weighted 3, src1 weighted 2, rest 1;
    * exact integer-rational keep rates, no big-table shuffle. */
  private def q61(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.resampleToMixture(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "source", "doc_id", Seq("src0" -> 3, "src1" -> 2))
      .orderBy("doc_id")

  /** Okapi BM25 lexical retrieval over the corpus for a fixed query
    * ([[TextAnalysis.bm25]]): the In-predicate prunes non-query terms
    * at the scan, df broadcast back, corpus stats one broadcast row. */
  private def q60(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25(t(s, dir, "documents"), "doc_id", "text",
        Seq("hash", "join", "dup", "window"))
      .orderBy("doc_id")

  /** Stream-stream interval join run THROUGH the streaming engine
    * (click attribution: purchase × all that user's clicks in the
    * trailing 2 h; watermark-bounded join state on both sides) —
    * oracle-checked against the equivalent batch interval-join SQL. */
  private def q59(s: SparkSession, dir: String): DataFrame =
    StreamOps.runClickAttributionAvailableNow(s, dir, windowMinutes = 120)
      .orderBy("purchase_id", "click_id")

  /** Benchmark decontamination ([[graft.operators.Decontaminate]]):
    * eval set = every 97th document, train = the rest; 3-gram
    * overlap, contaminated at >= 2 distinct leaked grams. Broadcast
    * eval-gram join, one train scan, per-doc map-side counts. */
  private def q58(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    graft.operators.Decontaminate.contaminationReport(
        d.filter(col("doc_id") % 97 =!= 0), d.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3, minOverlap = 2)
      .orderBy("doc_id")
  }

  /** Multimodal plumbing: opaque binary payload + typed metadata
    * (byte length, digest, magic bytes, frame count). */
  private def q31(s: SparkSession, dir: String): DataFrame =
    Multimodal.binaryMeta(
        Multimodal.withBinaryPayload(t(s, dir, "documents"), "text"),
        "payload", frameSize = 256)
      .select("doc_id", "byte_len", "content_md5", "magic_hex", "n_frames")
      .orderBy("doc_id")

  /** IVF approximate top-k: centroids = first 12 vectors (a
    * deterministic stand-in for a trained codebook), nProbe=3, k=5. */
  private def q32(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val centroids = e.filter(col("vec_id") < 12)
      .select(col("vec_id").as("cell"), col("embedding").as("cvec"))
    Ann.ivfTopK(
        e.filter(col("vec_id") % 100 === 0), e,
        centroids, "cell", "cvec",
        "vec_id", "vec_id", "embedding", nProbe = 3, k = 5)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("q_id", "rank")
  }

  /** Sliding-window rollup (1 h / 30 min): the batch shape of the
    * streaming sliding-window operator. */
  private def q33(s: SparkSession, dir: String): DataFrame =
    StreamOps.slidingRollup(t(s, dir, "events"))
      .orderBy("win_start", "event_type")

  /** 7-region Venn set-agreement counts in one full-outer pass
    * (plotting.py:22-31 re-expressed; Analyze.vennCounts3). */
  private def q34(s: SparkSession, dir: String): DataFrame =
    Analyze.vennCounts3(
        t(s, dir, "customer").select(col("c_nationkey")),
        t(s, dir, "supplier").select(col("s_nationkey")),
        t(s, dir, "nation").filter(col("n_regionkey") <= 2).select(col("n_nationkey")))
      .orderBy("region")

  /** 2-d PCA projection of the embeddings (M2, UMAP substitute),
    * oracle-proven: the fit exports its signed basis (captured in
    * [[q35BasisHolder]] when this runs under Verify) and the
    * projection is two codegen ordered dot products, so the DuckDB
    * oracle replays the exact coordinates from the frozen basis —
    * closing the eigendecomposition-in-the-loop gap (the basis
    * CONTRACT is independently certified by q82). */
  private def q35(s: SparkSession, dir: String): DataFrame = {
    val (out, basis) = Analyze.pcaProject2dWithBasis(
      t(s, dir, "embeddings"), "embedding", Seq("vec_id"))
    q35BasisHolder.set(basis)
    out.orderBy("vec_id")
  }

  /** Incremental embedding upsert through Structured Streaming
    * (SURVEY §2.9's last planned extension): three staged versions of
    * the documents table arrive one micro-batch each; only arriving
    * rows are embedded; the parquet target is merged with
    * max-version-wins (order-independent, so the streaming result
    * equals the batch SQL oracle). Checked columns are the winning
    * (doc_id, version, content md5) plus the embedding width — the
    * dimension contract on the incrementally-embedded column. */
  private def q39(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val work = java.nio.file.Files.createTempDirectory("graft_upsert_").toString
    val staging = s"$work/staging"
    new java.io.File(staging).mkdirs()
    StreamOps.stageVersionFile(
      docs.select(col("doc_id"), lit(0L).as("version"), col("text")),
      s"$staging/v0.parquet")
    StreamOps.stageVersionFile(
      docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), lit(1L).as("version"),
          concat(col("text"), lit(" v1")).as("text")),
      s"$staging/v1.parquet")
    StreamOps.stageVersionFile(
      docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), lit(2L).as("version"),
          concat(col("text"), lit(" v2")).as("text")),
      s"$staging/v2.parquet")
    val target = s"$work/target"
    StreamOps.embeddingUpsert(s, staging, target, s"$work/ckpt",
      new HashingEmbedder(dim = 64))
    s.read.parquet(target)
      .select(col("doc_id"), col("version"),
        md5(col("text")).as("content_md5"),
        size(col("embedding")).cast("long").as("emb_dim"))
      .orderBy("doc_id")
  }

  /** Streaming exact dedup across micro-batches (first-arrival wins,
    * watermark-bounded digest state): v0 = the exact-deduped document
    * snapshot; v1 = a re-crawl where every third doc is unchanged
    * (suppressed by the stream's digest state) and the rest are edits
    * (new digests — kept). Deterministic by construction: digests are
    * unique within each staged file, so the kept set is exactly
    * first-arrival per digest whatever the in-batch row order. */
  private def q47(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val w = Window.partitionBy(col("__h")).orderBy(col("doc_id"))
    val v0 = d.withColumn("__h", md5(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), lit(0L).as("version"), col("text"))
    val v1 = v0.select(col("doc_id"), lit(1L).as("version"),
      when(col("doc_id") % 3 === 0, col("text"))
        .otherwise(concat(col("text"), lit(" v1"))).as("text"))
    val work = java.nio.file.Files.createTempDirectory("graft_sdedup_").toString
    val staging = s"$work/staging"
    new java.io.File(staging).mkdirs()
    StreamOps.stageVersionFile(v0, s"$staging/v0.parquet")
    StreamOps.stageVersionFile(v1, s"$staging/v1.parquet")
    StreamOps.runStreamingDedupAvailableNow(s, staging)
      .select(col("doc_id"), col("version"), col("text_md5"))
      .orderBy("doc_id", "version")
  }

  /** Deterministic train/valid/test split + independent 10% sample
    * flag: pure md5-hash projections of the id (partition-invariant,
    * stable under corpus growth — `operators/Curation`). */
  private def q48(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.deterministicSplit(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id", Seq("train" -> 90, "valid" -> 5, "test" -> 5))
      .withColumn("in_sample",
        graft.operators.Curation.inSample(col("doc_id"), 1, 10, salt = "sample"))
      .orderBy("doc_id")

  /** The composed curation pipeline a training corpus actually runs:
    * language filter (en) → quality filter (score ≥ 0.5, ≥ 5 words) →
    * exact dedup (lowest id per content digest) → deterministic
    * split. Every stage is an operator proven individually (q18, q17,
    * q15, q48); this query proves the COMPOSITION end to end against
    * one relational oracle. */
  private def q49(s: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qualityMetrics(
      TextAnalysis.languageId(t(s, dir, "documents")))
    val filtered = scored.filter(col("predicted_lang") === "en" &&
      col("quality_score") >= 0.5 && col("n_words") >= 5)
    val w = Window.partitionBy(col("__h")).orderBy(col("doc_id"))
    val deduped = filtered.withColumn("__h", md5(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    graft.operators.Curation.deterministicSplit(deduped, "doc_id",
        Seq("train" -> 90, "valid" -> 5, "test" -> 5))
      .select(col("doc_id"), col("predicted_lang"),
        col("n_words").cast("long").as("n_words"), col("split"))
      .orderBy("doc_id")
  }

  /** Sequence packing (concat-and-chunk at a 512-token budget) per
    * deterministic split shard — the LLM-pretraining batch prep,
    * expressed as one per-shard running-sum window. */
  private def q52(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("ws_tokens"))
    val withSplit = graft.operators.Curation.deterministicSplit(
      docs, "doc_id", Seq("train" -> 90, "valid" -> 5, "test" -> 5))
    graft.operators.Curation.packSequences(withSplit, "doc_id", "ws_tokens",
        budget = 512, partCols = Seq("split"))
      .select("doc_id", "split", "ws_tokens", "pack_id", "pack_offset")
      .orderBy("doc_id")
  }

  /** Duplicate CLUSTERS: MinHash near-dup pairs → alternating
    * large-star/small-star connected components → one cluster label
    * per document (min id canonical). Near-dup pairs are not
    * transitive; the unit of corpus dedup is the component. The
    * planted 12-copy boilerplate cluster exercises a dense component;
    * the oracle recomputes the closure with a recursive CTE. */
  private def q53(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicateClusters(corpusWithBoilerplate(s, dir), "text", "doc_id",
        shingleSize = 3, numHashes = 8, rowsPerBand = 2,
        jaccardThreshold = 0.8)
      .orderBy("doc_id")

  /** Heavy-hitter token counts through the Misra-Gries bounded-state
    * aggregate, run in its exact regime (capacity ≥ distinct tokens —
    * no decrement ever fires) so the summary IS the exact count table
    * and hash-checks against a plain GROUP BY; the approximation
    * contract under adversarial cardinality is pinned by
    * FreqItemsSpec. */
  private def q56(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.heavyHitterTokens(
        t(s, dir, "documents").select(col("text")), capacity = 4096)
      .orderBy(desc("cnt"), col("token"))

  /** Deterministic per-source cap (≤10 docs per source by salted-hash
    * priority) — the "no domain dominates" curation rule, run as a
    * bounded heap aggregate + id-keyed semi-join instead of a
    * group-keyed row_number (the oracle keeps the window form). */
  private def q55(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.capPerGroup(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "source", "doc_id", maxPerGroup = 10, salt = "capsalt")
      .orderBy("doc_id")

  /** Gopher-style repetition quality filters (word repetition ratio,
    * top-bigram and duplicated-trigram coverage + keep flag), computed
    * in-place per row by RepetitionStatsExpr — the oracle recomputes
    * the counters relationally (explode + (doc, gram) aggregate). */
  private def q54(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionMetrics(
        t(s, dir, "documents").select(col("doc_id"), col("text")))
      .select("doc_id", "n_words", "word_rep_ratio", "top_bigram_frac",
        "dup_trigram_frac", "repetition_keep")
      .orderBy("doc_id")

  /** SimHash near-dup with the hot-bucket cap — the capped family's
    * third path through the shared Banding kernel, proven against its
    * own relational oracle on the boilerplate corpus (identical texts
    * collapse to ONE fingerprint, hot in every slice). */
  private def q51(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDuplicates(corpusWithBoilerplate(s, dir), "text", "doc_id",
        maxHamming = 8, maxBucketSize = Some(8))
      .orderBy("id_a", "id_b")

  /** Symmetric int8 embedding quantization (4× storage/bandwidth at
    * ≲1% cosine error — the standard ANN-candidate trade at 100 TB;
    * exact re-scoring reads floats for the top candidates only):
    * per-vector max-abs scale, quantized bytes (digested — the array
    * itself is the payload), and the max reconstruction error. */
  private def q50(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("scale", VectorOps.quantScale(col("v")))
      .withColumn("q", VectorOps.quantizeInt8(col("v"), col("scale")))
    e.select(col("vec_id"), col("scale"),
        md5(array_join(transform(col("q"), _.cast("string")), ",")).as("q_md5"),
        array_max(zip_with(col("v"),
          VectorOps.dequantizeInt8(col("q"), col("scale")),
          (x, y) => abs(x - y))).as("max_err"))
      .orderBy("vec_id")
  }

  /** SimHash near-duplicate pairs: 15-bit slice blocking (pigeonhole
    * guarantee for small Hamming budgets) + exact Hamming verify. */
  private def q38(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDuplicates(t(s, dir, "documents"), "text", "doc_id",
        maxHamming = 8)
      .orderBy("id_a", "id_b")

  /** The reference's core ingest path (P1-P4/A1-A2: regex triplet
    * projection → stack unpivot → dropna(all) → dedup → CT_ID
    * sentinel impute) run over a part-table-shaped wide sheet, with
    * planted nulls hitting both the sentinel and the all-null-triplet
    * drop. */
  private def q37(s: SparkSession, dir: String): DataFrame = {
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
  private def q36(s: SparkSession, dir: String): DataFrame = {
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

  // ---------------------------------------------------------------------
  // Non-SQL-expressible operators (rows-only driver check; exact
  // semantics pinned by ScalaTest suites instead)
  // ---------------------------------------------------------------------

  /** Reference NLP cleaning pipeline (lemmatizer — not SQL-expressible). */
  private def qNlp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        GraftUdfs.cleanLabel(substring(col("text"), 1, 60)).as("cleaned"))
      .orderBy("doc_id")

  /** The flagship label-mapping report on the LIVE hashing embedder
    * (`main.py:171-221`), hash-proven end to end: the md5-kernel
    * [[graft.embed.Md5HashingEmbedder]] makes every stage — NLP clean,
    * clean-dedup tokenization, TF bucket counts, L2 normalize, cosine
    * top-k, exact-overwrite — DuckDB-replayable, so the driver oracle
    * checks the full live path (the murmur3 [[HashingEmbedder]] keeps
    * MLlib-HashingTF parity, pinned by EmbedderSpec). */
  private def qFlagship(s: SparkSession, dir: String): DataFrame = {
    val embedder = new graft.embed.Md5HashingEmbedder(dim = 64)
    val docs = t(s, dir, "documents")
    val raw = docs.select(col("source"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("raw_input_label"))
      .distinct()
      .withColumn("cleaned_input_label", GraftUdfs.cleanLabel(col("raw_input_label")))
    val queries = embedder.embed(raw, "cleaned_input_label", "qvec")

    val part = t(s, dir, "part").filter(col("p_partkey") <= 300)
      .select(col("p_partkey").cast("string").as("CT_ID"),
        col("p_name").as("CT_NAME"), col("p_brand").as("CT_LABEL"),
        col("p_type").as("definition"))
      .withColumn("all_text",
        coalesce(concat(col("CT_NAME"), lit(" "), col("CT_LABEL"), lit(" "),
          col("definition")), col("CT_NAME")))
    // the prepared reference is referenced ~5× inside mapLabels (score
    // side, per-rank attribute fetches, exact-match side); it is
    // catalog-sized by construction, so cache the 301-row table once
    // instead of re-running scan+embed+row_number per reference.
    val ref = Matcher.prepareReference(
      embedder.embed(part, "all_text", "embedding"), "embedding", Seq("CT_ID"))
      .cache()
    Matcher.mapLabels(queries, ref, k = 2)
      .orderBy("source", "raw_input_label")
  }

  /** The flagship report with the TRAINED embedder: Word2Vec (MLlib)
    * fit on the reference corpus's all_text with a fixed seed, applied
    * to both sides through the same [[graft.embed.Embedder]] seam the
    * hashing and frozen variants use. Oracle-proven despite the
    * model in the loop: the fitted vocabulary matrix is quantized to
    * multiples of 2^-20 ([[graft.embed.QuantizedVocabEmbedder]]) —
    * making every token-sum exact and therefore order-free — then
    * FROZEN into a generated-VALUES DuckDB table
    * ([[q44VocabHolder]]), and the oracle replays tokenize → vocab
    * mean → normalize → cosine top-2 → pivot → exact-overwrite end
    * to end (the q41-43 generated-oracle pattern applied to the
    * trained model; training itself stays un-oracled — its output
    * does not). */
  private def q44(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val raw = docs.select(col("source"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("raw_input_label"))
      .distinct()
      .withColumn("cleaned_input_label", GraftUdfs.cleanLabel(col("raw_input_label")))
    val part = t(s, dir, "part").filter(col("p_partkey") <= 300)
      .select(col("p_partkey").cast("string").as("CT_ID"),
        col("p_name").as("CT_NAME"), col("p_brand").as("CT_LABEL"),
        col("p_type").as("definition"))
      .withColumn("all_text",
        coalesce(concat(col("CT_NAME"), lit(" "), col("CT_LABEL"), lit(" "),
          col("definition")), col("CT_NAME")))
    val w2v = graft.embed.Word2VecEmbedder.fit(part, "all_text", dim = 64)
    val embedder = graft.embed.QuantizedVocabEmbedder.fromWord2Vec(w2v, dim = 64)
    q44VocabHolder.set(embedder.vocab)
    val queries = embedder.embed(raw, "cleaned_input_label", "qvec")
    val ref = Matcher.prepareReference(
      embedder.embed(part, "all_text", "embedding"), "embedding", Seq("CT_ID"))
      .cache()
    Matcher.mapLabels(queries, ref, k = 2)
      .orderBy("source", "raw_input_label")
  }

  /** The flagship with the DISTRIBUTED-trained embedder
    * ([[graft.embed.CoocPowerEmbedder]]): exact integer co-occurrence
    * counts over the reference corpus diffused for 2 quantized
    * rounds — no single-partition SGD, no content-sort, no frozen
    * model state. Because the whole trajectory is order-free integer
    * arithmetic, the oracle RETRAINS the model inside DuckDB
    * (co-occurrence → ±micro md5 init → 2 unrolled update rounds →
    * vocab-mean apply → cosine top-2 → pivot → exact-overwrite) —
    * one step stronger than q44's frozen-VALUES replay: nothing is
    * exported, both engines fit from raw data and must agree on
    * every trained weight to hash-match. */
  private def q148(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val raw = docs.select(col("source"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("raw_input_label"))
      .distinct()
      .withColumn("cleaned_input_label", GraftUdfs.cleanLabel(col("raw_input_label")))
    val part = t(s, dir, "part").filter(col("p_partkey") <= 300)
      .select(col("p_partkey").cast("string").as("CT_ID"),
        col("p_name").as("CT_NAME"), col("p_brand").as("CT_LABEL"),
        col("p_type").as("definition"))
      .withColumn("all_text",
        coalesce(concat(col("CT_NAME"), lit(" "), col("CT_LABEL"), lit(" "),
          col("definition")), col("CT_NAME")))
    val embedder = graft.embed.CoocPowerEmbedder.fit(part, "CT_ID", "all_text",
      dim = 64, rounds = 2)
    val queries = embedder.embed(raw, "cleaned_input_label", "qvec")
    val ref = Matcher.prepareReference(
      embedder.embed(part, "all_text", "embedding"), "embedding", Seq("CT_ID"))
      .cache()
    Matcher.mapLabels(queries, ref, k = 2)
      .orderBy("source", "raw_input_label")
  }

  /** Frozen 8-d vector derived from the md5 of a key string:
    * component i = integer value of hex pair i. Deterministic,
    * engine-independent, and DuckDB-recomputable — the components are
    * small integers (0..255), so every dot product / norm in the
    * matcher is an EXACT double and the scores are bit-identical
    * across engines regardless of accumulation order. */
  private def frozenVec(key: Column): Column =
    array((0 until 8).map(i =>
      conv(substring(md5(key), 2 * i + 1, 2), 16, 10).cast("double")): _*)

  /** The flagship matcher (q24's crossJoin → bounded-heap top-k →
    * rank pivot → exact-overwrite, `main.py:171-221`) run with its two
    * non-SQL seams — embedder and label cleaner — swapped for
    * DuckDB-expressible substitutes (md5-derived frozen vectors;
    * `lower`). Same operator code end to end, so this converts the
    * headline query from spec-pinned to oracle-proven (rows + schema +
    * hash). 'planted' queries ARE reference CT_NAMEs, exercising the
    * exact-overwrite path (score 1.0, slots 2..k nulled) in the hash
    * check too. */
  private def q40(s: SparkSession, dir: String): DataFrame = {
    val part300 = t(s, dir, "part").filter(col("p_partkey") <= 300)
    val fromDocs = t(s, dir, "documents").select(col("source"),
      concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("raw_input_label"))
    val planted = part300.filter(col("p_partkey") % 50 === 0)
      .select(lit("planted").as("source"), col("p_name").as("raw_input_label"))
    val queries = fromDocs.union(planted).distinct()
      .withColumn("cleaned_input_label", lower(col("raw_input_label")))
      .withColumn("qvec", frozenVec(col("cleaned_input_label")))

    val ref0 = part300
      .select(col("p_partkey").cast("string").as("CT_ID"),
        col("p_name").as("CT_NAME"), col("p_brand").as("CT_LABEL"),
        col("p_type").as("definition"))
      .withColumn("all_text",
        concat(col("CT_NAME"), lit(" "), col("CT_LABEL"), lit(" "), col("definition")))
      .withColumn("embedding", frozenVec(col("all_text")))
    val ref = Matcher.prepareReference(ref0, "embedding", Seq("CT_ID"),
      cleaner = lower).cache()
    Matcher.mapLabels(queries, ref, k = 2)
      .orderBy("source", "raw_input_label")
  }

  /** Contraction expansion as a relational corpus pass: token
    * posexplode → broadcast map join → order-preserving reassembly
    * (the distributed form of the per-token F2 step). The planted
    * suffix guarantees expansions actually fire inside the hash
    * check, including a capitalized-variant entry. */
  private def q41(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.expandContractionsColumn(
        t(s, dir, "documents")
          .select(col("doc_id"),
            concat(col("text"), lit(" Don't i'm o'clock")).as("text")),
        "text", "doc_id")
      .orderBy("doc_id")

  /** The lemmatizer itself, oracle-proven: the Spark side runs the
    * REAL JVM function (exceptions + morphy rules + rstrip-'s') as a
    * UDF over every alphabetic token of the corpus; the DuckDB side
    * replays its full specification (exception table as VALUES, rule
    * chain as CASE, rtrim). A hash match proves the JVM lemmatizer
    * equals its SQL spec on the whole corpus vocabulary — converting
    * F6 from spec-pinned to oracle-checked. Alphabetic-only tokens
    * keep the number-to-words step (not SQL-expressible) out of
    * scope. */
  private def q42(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ", -1)).as(Seq("pos", "raw")))
      .filter(col("raw").rlike("^[A-Za-z]+$"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        lower(col("raw")).as("word"))
      .withColumn("root", GraftUdfs.rootWord(col("word")))
      .orderBy("doc_id", "pos")

  /** num2words formatting (F4), oracle-proven: the real JVM formatter
    * runs over two deterministic number streams per document (doc_id
    * and an affine transform reaching the millions range — covering
    * zero, teens, hyphens, "hundred and", scale words, and both
    * inter-group join rules), while the DuckDB side evaluates a SQL
    * formatter GENERATED from the same ones/tens word tables. */
  private def q43(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        GraftUdfs.numberWords(col("doc_id").cast("string")).as("w_small"),
        GraftUdfs.numberWords((col("doc_id") * 12345 + 678).cast("string")).as("w_large"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------------
  // Driver contract
  // ---------------------------------------------------------------------

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qFlagship(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01 _),
    "q02_filter_pushdown" -> (q02 _),
    "q03_join_agg" -> (q03 _),
    "q04_dim_broadcast_join" -> (q04 _),
    "q05_semi_join" -> (q05 _),
    "q06_anti_join" -> (q06 _),
    "q07_window_topk" -> (q07 _),
    "q08_pivot" -> (q08 _),
    "q09_setops" -> (q09 _),
    "q10_unpivot" -> (q10 _),
    "q11_impute_sentinels" -> (q11 _),
    "q12_string_funcs" -> (q12 _),
    "q13_json_extract" -> (q13 _),
    "q14_hourly_rollup" -> (q14 _),
    "q15_dedup_exact" -> (q15 _),
    "q16_fingerprint" -> (q16 _),
    "q17_quality_metrics" -> (q17 _),
    "q18_language_id" -> (q18 _),
    "q19_token_stats" -> (q19 _),
    "q20_minhash_signatures" -> (q20 _),
    "q21_simhash" -> (q21 _),
    "q22_ngram_jaccard" -> (q22 _),
    "q23_nlp_clean" -> (qNlp _),
    "q24_label_match_report" -> (qFlagship _),
    "q25_knn_bruteforce" -> (q25 _),
    "q26_lsh_buckets" -> (q26 _),
    "q27_lsh_neardup" -> (q27 _),
    "q28_minhash_lsh_pairs" -> (q28 _),
    "q29_stream_rollup" -> (q29 _),
    "q30_sessionize" -> (q30 _),
    "q31_binary_meta" -> (q31 _),
    "q32_ivf_topk" -> (q32 _),
    "q33_sliding_window" -> (q33 _),
    "q34_venn_counts" -> (q34 _),
    "q35_pca_projection" -> (q35 _),
    "q36_sql_native_funcs" -> (q36 _),
    "q37_wrangle_sheet" -> (q37 _),
    "q38_simhash_neardup" -> (q38 _),
    "q39_stream_upsert" -> (q39 _),
    "q40_label_match_frozen" -> (q40 _),
    "q41_expand_contractions" -> (q41 _),
    "q42_lemmatize" -> (q42 _),
    "q43_number_words" -> (q43 _),
    "q44_label_match_w2v" -> (q44 _),
    "q45_minhash_capped" -> (q45 _),
    "q46_signature_clusters" -> (q46 _),
    "q47_stream_dedup" -> (q47 _),
    "q48_dataset_split" -> (q48 _),
    "q49_curation_pipeline" -> (q49 _),
    "q50_embedding_quantize" -> (q50 _),
    "q51_simhash_capped" -> (q51 _),
    "q52_sequence_packing" -> (q52 _),
    "q53_duplicate_clusters" -> (q53 _),
    "q54_repetition_filter" -> (q54 _),
    "q55_per_source_cap" -> (q55 _),
    "q56_heavy_hitters" -> (q56 _),
    "q57_asof_join" -> (q57 _),
    "q58_decontaminate" -> (q58 _),
    "q59_stream_join" -> (q59 _),
    "q60_bm25" -> (q60 _),
    "q61_mixture_resample" -> (q61 _),
    "q62_funnel" -> (q62 _),
    "q63_sketch_stats" -> (q63 _),
    "q64_range_join" -> (q64 _),
    "q65_rollup" -> (q65 _),
    "q66_rolling_window" -> (q66 _),
    "q67_json_quarantine" -> (q67 _),
    "q68_boilerplate_removal" -> (q68 _),
    "q69_fuzzy_join" -> (q69 _),
    "q70_session_window" -> (q70 _),
    "q71_star_join" -> (q71 _),
    "q72_stream_outer_join" -> (q72 _),
    "q73_corpus_pipeline" -> (q73 _),
    "q74_random_projection" -> (q74 _),
    "q75_importance_sample" -> (q75 _),
    "q76_stream_quota" -> (q76 _),
    "q77_rolling_fingerprint" -> (q77 _),
    "q78_winnow_neardup" -> (q78 _),
    "q79_group_heavy_hitters" -> (q79 _),
    "q80_scd2_intervals" -> (q80 _),
    "q81_stream_funnel" -> (q81 _),
    "q82_pca_certify" -> (q82 _),
    "q83_png_roundtrip" -> (q83 _),
    "q146_png_resize" -> (q146 _),
    "q84_pii_scrub" -> (q84 _),
    "q85_url_rollup" -> (q85 _),
    "q86_unigram_logprob" -> (q86 _),
    "q87_shard_order" -> (q87 _),
    "q88_chunking" -> (q88 _),
    "q89_stream_static_join" -> (q89 _),
    "q90_registrable_domain" -> (q90 _),
    "q91_zorder_key" -> (q91 _),
    "q92_global_ordinals" -> (q92 _),
    "q93_stream_scd2" -> (q93 _),
    "q94_char_entropy" -> (q94 _),
    "q95_stream_late_data" -> (q95 _),
    "q96_asof_bucketed" -> (q96 _),
    "q97_incremental_dedup" -> (q97 _),
    "q98_curation_pipeline_v2" -> (q98 _),
    "q99_hard_negatives" -> (q99 _),
    "q100_stream_ingest" -> (q100 _),
    "q101_stream_ewma" -> (q101 _),
    "q102_countmin" -> (q102 _),
    "q103_bloom_decontaminate" -> (q103 _),
    "q104_bigram_logprob" -> (q104 _),
    "q105_tfidf_keywords" -> (q105 _),
    "q106_minhash_estimate" -> (q106 _),
    "q107_pagerank" -> (q107 _),
    "q108_hll_distinct" -> (q108 _),
    "q109_sample_quantiles" -> (q109 _),
    "q110_kmeans" -> (q110 _),
    "q111_prefix_jaccard_join" -> (q111 _),
    "q140_prefix_jaccard_collapsed" -> (q140 _),
    "q112_stream_hll" -> (q112 _),
    "q113_embedding_outliers" -> (q113 _),
    "q114_mixture_quota" -> (q114 _),
    "q115_cdc_chunks" -> (q115 _),
    "q116_skew_report" -> (q116 _),
    "q117_group_ols" -> (q117 _),
    "q118_corpus_drift" -> (q118 _),
    "q119_rank_fusion" -> (q119 _),
    "q120_shard_manifest" -> (q120 _),
    "q121_semantic_neardup" -> (q121 _),
    "q122_duplicate_spans" -> (q122 _),
    "q123_bpe_train" -> (q123 _),
    "q124_unicode_nfc" -> (q124 _),
    "q125_snapshot_diff" -> (q125 _),
    "q126_containment" -> (q126 _),
    "q127_cluster_canonical" -> (q127 _),
    "q128_matryoshka_recall" -> (q128 _),
    "q147_retrieval_cascade" -> (q147 _),
    "q148_label_match_cooc" -> (q148 _),
    "q129_stream_countmin" -> (q129 _),
    "q130_shard_diversity" -> (q130 _),
    "q131_grouped_split" -> (q131 _),
    "q132_pmi_collocations" -> (q132 _),
    "q133_lsh_recall" -> (q133 _),
    "q139_lsh_recall_16x2" -> (q139 _),
    "q141_lsh_recall_independent" -> (q141 _),
    "q134_frontier_interleave" -> (q134 _),
    "q135_compression_quality" -> (q135 _),
    "q136_curation_pipeline_v3" -> (q136 _),
    "q137_salted_agg" -> (q137 _),
    "q138_table_stats" -> (q138 _),
    "q142_stream_decontaminate" -> (q142 _),
    "q143_stream_bloom_dedup" -> (q143 _),
    "q145_semantic_decontaminate" -> (q145 _))

  // --- oracle SQL (DuckDB dialect) ---------------------------------------

  private val stopwordsSqlList: String =
    graft.functions.TextNlp.stopwords.toSeq.sorted
      .map(w => "'" + w.replace("'", "''") + "'").mkString(", ")

  private val langMarkersSql: Seq[(String, String)] =
    TextAnalysis.langMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      lang -> ms.map(m => "'" + m.replace("'", "''") + "'").mkString(", ")
    }

  /** Kirsch-Mitzenmacher families from one md5 — mirrors
    * Dedup.minhashSignatures exactly. */
  private def minhashSigsSql: String = minhashSigsSql(8)

  private def minhashSigsSql(numHashes: Int,
                             independent: Boolean = false): String =
    (0 until numHashes).map(h =>
      if (independent) {
        // two families per salted digest: its 56-bit halves
        val (lo, len) = if (h % 2 == 0) (1, 14) else (15, 14)
        s"min(('0x' || substr(md5('mh${h / 2}:' || shingle), $lo, $len))::BIGINT) AS sig_$h"
      } else
        s"min(('0x' || substr(md5(shingle), 1, 14))::BIGINT + $h * ('0x' || substr(md5(shingle), 15, 14))::BIGINT) AS sig_$h")
      .mkString(",\n  ")

  private def minhashOracle: String =
    s"""WITH w AS (
         SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM documents
       ), sh AS (
         SELECT doc_id, unnest(
           CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                ELSE [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]
           END) AS shingle
         FROM w
       )
       SELECT doc_id, $minhashSigsSql FROM sh GROUP BY doc_id ORDER BY doc_id"""

  private def simhashOracle: String = {
    val votes = (0 until 60).map(b =>
      s"CAST(sum(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS b_$b")
      .mkString(",\n  ")
    val fp = (0 until 60).map(b =>
      s"CASE WHEN b_$b > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END")
      .mkString(" | ")
    s"""WITH w AS (
         SELECT doc_id, unnest(list_distinct(string_split_regex(text, '\\s+'))) AS word
         FROM documents
       ), h AS (
         SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS hv FROM w
       ), v AS (
         SELECT doc_id, $votes FROM h GROUP BY doc_id
       )
       SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM v ORDER BY doc_id"""
  }

  private def langIdOracle: String = {
    val hitCols = langMarkersSql.map { case (lang, list) =>
      s"CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x IN ($list))) AS INTEGER) AS hits_$lang"
    }.mkString(",\n  ")
    val langs = langMarkersSql.map(_._1)
    val m = "greatest(" + langs.map(l => s"hits_$l").mkString(", ") + ")"
    val pick = langs.map(l => s"WHEN hits_$l = $m THEN '$l'").mkString(" ")
    s"""WITH h AS (
         SELECT doc_id, $hitCols FROM documents
       )
       SELECT doc_id, ${langs.map(l => s"hits_$l").mkString(", ")},
              CASE $pick END AS predicted_lang
       FROM h ORDER BY doc_id"""
  }

  private def qualityOracle: String =
    s"""WITH m AS (
         SELECT doc_id,
           CAST(length(text) AS DOUBLE) AS n_chars_d,
           CAST(len(string_split_regex(lower(text), '\\s+')) AS DOUBLE) AS n_words,
           CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS n_alpha,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS n_digit,
           CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) AS n_punct,
           CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) AS n_upper,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
             x -> x IN ($stopwordsSqlList))) AS DOUBLE) AS n_stop
         FROM documents
       ), r AS (
         SELECT doc_id, n_words,
           n_alpha / greatest(n_words, 1.0) AS mean_word_len,
           n_alpha / greatest(n_chars_d, 1.0) AS alpha_ratio,
           n_digit / greatest(n_chars_d, 1.0) AS digit_ratio,
           n_punct / greatest(n_chars_d, 1.0) AS punct_ratio,
           n_upper / greatest(n_chars_d, 1.0) AS upper_ratio,
           n_stop / greatest(n_words, 1.0) AS stopword_ratio
         FROM m
       )
       SELECT doc_id, n_words, mean_word_len, alpha_ratio, digit_ratio,
              punct_ratio, upper_ratio, stopword_ratio,
              least(alpha_ratio / 0.7, 1.0) * 0.4
                + least(stopword_ratio / 0.3, 1.0) * 0.3
                + (1.0 - least(digit_ratio * 5, 1.0)) * 0.15
                + (1.0 - least(punct_ratio * 5, 1.0)) * 0.15 AS quality_score
       FROM r ORDER BY doc_id"""

  private def jaccardOracle: String =
    s"""WITH d AS (
         SELECT doc_id, text FROM documents WHERE doc_id < 40
       ), w AS (
         SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM d
       ), sh AS (
         SELECT DISTINCT doc_id, unnest(
           CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                ELSE [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]
           END) AS shingle
         FROM w
       ), sizes AS (
         SELECT doc_id, CAST(count(*) AS INTEGER) AS n_sh FROM sh GROUP BY doc_id
       ), pairs AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM d a JOIN d b ON a.doc_id < b.doc_id
       ), inter AS (
         SELECT p.id_a, p.id_b, CAST(count(*) AS BIGINT) AS n_inter
         FROM pairs p
         JOIN sh ta ON ta.doc_id = p.id_a
         JOIN sh tb ON tb.doc_id = p.id_b AND ta.shingle = tb.shingle
         GROUP BY p.id_a, p.id_b
       )
       SELECT p.id_a, p.id_b,
              coalesce(i.n_inter, 0) AS n_inter,
              sa.n_sh AS n_a, sb.n_sh AS n_b,
              CAST(coalesce(i.n_inter, 0) AS DOUBLE)
                / (sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0)) AS jaccard
       FROM pairs p
       LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
       JOIN sizes sa ON sa.doc_id = p.id_a
       JOIN sizes sb ON sb.doc_id = p.id_b
       ORDER BY p.id_a, p.id_b"""

  // --- ANN / streaming / multimodal oracle builders ----------------------

  /** Shared embeddings CTE: vectors cast to DOUBLE[] (exact float
    * widening — identical IEEE values to Spark's `cast("array<double>")`)
    * plus the L2 norm with the same expression tree as VectorOps. */
  private val embCte =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)"""

  /** Zero-guarded cosine — mirrors VectorOps.cosineWithNorms exactly. */
  private def cosSql(av: String, an: String, bv: String, bn: String): String =
    s"CASE WHEN $an * $bn = 0 THEN 0.0 ELSE list_dot_product($av, $bv) / ($an * $bn) END"

  /** One band's bucket: bit r set iff v · plane_{band*size+r} >= 0 —
    * the hyperplane CONSTANTS are inlined from Ann.hyperplanes, so
    * both engines evaluate the identical dot products. */
  private def bucketSql(vExpr: String, band: Int): String = {
    val bits = (0 until lshBandSize).map { r =>
      val plane = Ann.hyperplaneSqlLiteral(lshPlanes(band * lshBandSize + r))
      s"(CASE WHEN list_dot_product($vExpr, $plane) >= 0 THEN ${1L << r} ELSE 0 END)"
    }
    s"CAST(${bits.mkString(" + ")} AS BIGINT)"
  }

  private def knnOracle: String =
    s"""$embCte,
       q AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 50 = 0),
       s AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
               ${cosSql("q.v", "q.nrm", "c.v", "c.nrm")} AS score
             FROM q CROSS JOIN n c),
       r AS (SELECT q_id, c_id, score,
               row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id ASC) AS rnk
             FROM s)
       SELECT q_id, CAST(rnk AS BIGINT) AS "rank", c_id, score
       FROM r WHERE rnk <= 5 ORDER BY q_id, rnk"""

  /** q145 oracle — nearest eval neighbour per train vector with the
    * 0.9-threshold flag (margin-verified on this corpus). */
  private def semanticDecontaminateOracle: String =
    s"""$embCte,
       q AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 97 = 0),
       tr AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 97 <> 0
              UNION ALL
              SELECT -vec_id - 1 AS vec_id, v, nrm FROM n
              WHERE vec_id % 97 = 0 AND vec_id % 5 = 0),
       s AS (SELECT tr.vec_id, q.vec_id AS eval_id,
               ${cosSql("tr.v", "tr.nrm", "q.v", "q.nrm")} AS score
             FROM tr CROSS JOIN q),
       r AS (SELECT vec_id, eval_id, score,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY score DESC, eval_id ASC) AS rnk
             FROM s)
       SELECT vec_id, eval_id AS nearest_eval_id, score AS max_cos,
              score >= 0.9 AS contaminated
       FROM r WHERE rnk = 1 ORDER BY vec_id"""

  /** q99 oracle — filter-then-rank directly (the Spark side's
    * over-fetch + filter must equal it exactly). */
  private def hardNegativesOracle: String =
    s"""$embCte,
       q AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 50 = 0),
       s AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
               ${cosSql("q.v", "q.nrm", "c.v", "c.nrm")} AS score
             FROM q CROSS JOIN n c),
       f AS (SELECT * FROM s WHERE c_id <> q_id AND c_id <> q_id + 1),
       r AS (SELECT q_id, c_id, score,
               row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id ASC) AS rnk
             FROM f)
       SELECT q_id, CAST(rnk AS BIGINT) AS neg_rank, c_id, score
       FROM r WHERE rnk <= 5 ORDER BY q_id, neg_rank"""

  private def lshBucketsOracle: String = {
    val cols = (0 until lshPlanes.length / lshBandSize)
      .map(b => s"${bucketSql("v", b)} AS bucket_$b").mkString(",\n  ")
    s"""$embCte SELECT vec_id, $cols FROM e ORDER BY vec_id"""
  }

  private def lshNearDupOracle: String = {
    val nBands = lshPlanes.length / lshBandSize
    val bucketCols = (0 until nBands)
      .map(b => s"${bucketSql("v", b)} AS bucket_$b").mkString(", ")
    val unions = (0 until nBands).map { b =>
      s"""SELECT a.vec_id AS id_a, b2.vec_id AS id_b
          FROM bk a JOIN bk b2 ON a.bucket_$b = b2.bucket_$b AND a.vec_id < b2.vec_id"""
    }.mkString(" UNION ")
    s"""$embCte,
       bk AS (SELECT vec_id, $bucketCols FROM e),
       p AS ($unions),
       c AS (SELECT p.id_a, p.id_b,
               ${cosSql("x.v", "x.nrm", "y.v", "y.nrm")} AS "cos"
             FROM p JOIN n x ON x.vec_id = p.id_a JOIN n y ON y.vec_id = p.id_b)
       SELECT id_a, id_b, "cos" FROM c WHERE "cos" >= 0.45 ORDER BY id_a, id_b"""
  }

  /** q45/q46 oracle corpus: documents + the planted boilerplate
    * cluster (mirrors `corpusWithBoilerplate`). */
  private def boilerplateCorpusSql: String =
    s"""corpus AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT 10000000 + r AS doc_id, '$boilerplateText' AS text
         FROM range(1, 13) t(r)
       ), """

  private def minhashLshPairsOracle: String =
    minhashPairsOracle(corpusCte = "", source = "documents", cap = None)

  /** q106: every LSH candidate pair (no Jaccard threshold) with the
    * signature-agreement count beside the exact Jaccard. */
  private def minhashEstimateOracle: String =
    minhashPairsOracle(corpusCte = "", source = "documents", cap = None,
      threshold = None, withSigEq = true)

  /** q108: [[Sketch.hllDistinct]] replayed register-for-register. The
    * α·m² and 2^K double constants are computed HERE with the same
    * Scala arithmetic the operator embeds via `lit`, then printed
    * through Double's round-tripping formatter — both engines hold
    * bit-identical constants, and the integer register sums make the
    * rest exact by construction. */
  private def hllDistinctOracle(p: Int): String = {
    val m = 1 << p
    val remBits = 60 - p
    val maxM = remBits + 1
    val alphaM2 = Sketch.hllAlpha(m) * m * m
    val twoK = math.pow(2.0, maxM)
    s"""WITH toks AS (
         SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS tok
         FROM documents
       ), nz AS (
         SELECT source, tok FROM toks WHERE tok <> ''
       ), hh AS (
         SELECT source, ('0x' || substr(md5('hll:' || tok), 1, 15))::BIGINT AS h
         FROM nz
       ), reg AS (
         SELECT source, h >> $remBits AS bucket,
                h & ((1::BIGINT << $remBits) - 1) AS r
         FROM hh
       ), mm AS (
         SELECT source, bucket,
                max(CASE WHEN r = 0 THEN $maxM
                         ELSE $maxM - length(bin(r)) END) AS mb
         FROM reg GROUP BY source, bucket
       ), agg AS (
         SELECT source, CAST(count(*) AS BIGINT) AS n_used,
                CAST(sum(1::BIGINT << ($maxM - mb)) AS BIGINT) AS sp
         FROM mm GROUP BY source
       ), fin AS (
         SELECT source, n_used,
                CAST(sp + ($m - n_used) * (1::BIGINT << $maxM) AS BIGINT) AS s,
                $m - n_used AS v
         FROM agg
       ), est AS (
         SELECT source, n_used, v,
                $alphaM2 * ($twoK / CAST(s AS DOUBLE)) AS raw
         FROM fin
       ), ex AS (
         SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct
         FROM nz GROUP BY source
       )
       SELECT e.source, e.n_used,
              CASE WHEN e.raw <= ${2.5 * m} AND e.v > 0
                   THEN ${m.toDouble} * ln(${m.toDouble} / CAST(e.v AS DOUBLE))
                   ELSE e.raw END AS est,
              x.exact_distinct
       FROM est e JOIN ex x USING (source) ORDER BY source"""
  }

  /** q107: [[Graph.pageRank]]'s 5 iterations unrolled as CTEs. The
    * base literal is computed HERE in Scala — the same
    * `(1.0 − d)·10⁶` IEEE arithmetic `pageRank` embeds via `lit` —
    * and printed through Double's round-tripping formatter, so both
    * engines hold the bit-identical constant (with d = 0.85 it is NOT
    * exactly 150000). */
  private def pageRankOracle(iterations: Int, damping: Double): String = {
    val base = (1.0 - damping) * 1e6
    val iterCtes = (1 to iterations).map { i =>
      s"""r$i AS (
           SELECT n.node,
                  CAST(round($base + CAST($damping AS DOUBLE)
                             * CAST(coalesce(c.s, 0) AS DOUBLE)) AS BIGINT) AS r
           FROM nodes n LEFT JOIN (
             SELECT er.dst AS node,
                    sum(CAST(round(CAST(p.r AS DOUBLE) * er.ratio) AS BIGINT)) AS s
             FROM r${i - 1} p JOIN er ON er.src = p.node
             GROUP BY er.dst) c USING (node)
         )"""
    }.mkString(", ")
    s"""WITH adj AS (
         SELECT l_partkey AS src,
                lead(l_partkey) OVER (
                  PARTITION BY l_orderkey
                  ORDER BY l_linenumber, l_partkey, l_suppkey) AS dst
         FROM lineitem
       ), ed AS (
         SELECT src, dst, CAST(count(*) AS BIGINT) AS w
         FROM adj WHERE dst IS NOT NULL GROUP BY src, dst
       ), ow AS (
         SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM ed GROUP BY src
       ), er AS (
         SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / CAST(o.ow AS DOUBLE) AS ratio
         FROM ed e JOIN ow o USING (src)
       ), nodes AS (
         SELECT src AS node FROM ed UNION SELECT dst FROM ed
       ), r0 AS (
         SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes
       ), $iterCtes
       SELECT node, r AS rank_micro FROM r$iterations ORDER BY node"""
  }

  /** Unrolled micro-quantized Lloyd's oracle mirroring
    * [[graft.operators.Cluster.kmeansMicro]]: per iteration an argmin
    * cross join (ties → lowest cell), a per-(cell,dim) integer mean
    * via zipped unnest, and an empty-cell carry. All distances are
    * exact BIGINT; only the one `round(sum/count)` expression touches
    * doubles, in the identical IEEE shape on both engines. */
  /** The kmeansMicro replay as a reusable CTE chain over any source
    * relation exposing (vec_id, embedding) — `m$iterations` is the
    * final assignment (vec_id, vq, cell, dist). Shared by the q110
    * oracle and the q121 semantic-dedup oracle. */
  private def kmeansCtesSql(src: String, k: Int, iterations: Int,
      salt: String): String = {
    val iterCtes = (1 to iterations).map { i =>
      s"""a$i AS (
           SELECT vec_id, vq, cell, dist,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cell) AS rn
           FROM (
             SELECT q.vec_id, q.vq, c.cell,
                    CAST(list_sum([(q.vq[j] - c.cvec[j])
                                   * (q.vq[j] - c.cvec[j])
                                   for j in range(1, len(q.vq) + 1)])
                         AS BIGINT) AS dist
             FROM q, c${i - 1} c)
         ), m$i AS (
           SELECT vec_id, vq, cell, dist FROM a$i WHERE rn = 1
         ), u$i AS (
           SELECT cell, j,
                  CAST(round(CAST(sum(v) AS DOUBLE)
                             / CAST(count(*) AS DOUBLE)) AS BIGINT) AS cv
           FROM (SELECT cell, unnest(vq) AS v,
                        unnest(range(1, len(vq) + 1)) AS j FROM m$i)
           GROUP BY cell, j
         ), c$i AS (
           SELECT p.cell, coalesce(n.cvec, p.cvec) AS cvec
           FROM c${i - 1} p LEFT JOIN (
             SELECT cell, list(cv ORDER BY j) AS cvec FROM u$i
             GROUP BY cell) n USING (cell)
         )"""
    }.mkString(", ")
    s"""q AS (
         SELECT vec_id,
                list_transform(CAST(embedding AS DOUBLE[]),
                  x -> CAST(round(x * 1000000) AS BIGINT)) AS vq
         FROM $src
       ), sk AS (
         SELECT md5('$salt:' || CAST(vec_id AS VARCHAR)) AS h, vq
         FROM q ORDER BY h LIMIT $k
       ), c0 AS (
         SELECT CAST(row_number() OVER (ORDER BY h) - 1 AS INTEGER) AS cell,
                vq AS cvec
         FROM sk
       ), $iterCtes"""
  }

  /** Unrolled BPE-training oracle mirroring
    * [[graft.operators.Bpe.trainMerges]]: per round, pair counts via
    * a zipped parallel unnest of the two symbol-array slices, the
    * argmax with the (count DESC, lexical) tie-break recomputed from
    * the oracle's OWN state, and the merge applied with the same
    * left-to-right non-overlapping `replace` on the bracket
    * encoding. Fully independent recomputation — no learned
    * literals cross from the engine. */
  private def bpeTrainOracle(iterations: Int): String = {
    val iterCtes = (1 to iterations).map { i =>
      s"""p$i AS (
           SELECT lft, rgt, CAST(sum(freq) AS BIGINT) AS pair_count
           FROM (
             SELECT unnest(syms[1:len(syms) - 1]) AS lft,
                    unnest(syms[2:len(syms)]) AS rgt, freq
             FROM (SELECT string_split(substr(state, 2,
                            length(state) - 2), '><') AS syms, freq
                   FROM s${i - 1}))
           GROUP BY lft, rgt
         ), m$i AS (
           SELECT lft, rgt, pair_count FROM p$i
           ORDER BY pair_count DESC, lft, rgt LIMIT 1
         ), s$i AS (
           SELECT replace(state, '<' || m.lft || '><' || m.rgt || '>',
                          '<' || m.lft || m.rgt || '>') AS state, freq
           FROM s${i - 1}, m$i m
         ), k$i AS (
           SELECT CAST(sum(freq * len(string_split(substr(state, 2,
                    length(state) - 2), '><'))) AS BIGINT) AS tokens_after
           FROM s$i
         )"""
    }.mkString(", ")
    val rows = (1 to iterations).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS iteration, m.lft, m.rgt,
                 m.lft || m.rgt AS merged, m.pair_count, k.tokens_after
          FROM m$i m, k$i k"""
    }.mkString(" UNION ALL ")
    s"""WITH w AS (
         SELECT word, CAST(count(*) AS BIGINT) AS freq
         FROM (SELECT unnest(string_split_regex(lower(text), '\\s+'))
                        AS word
               FROM documents)
         WHERE regexp_full_match(word, '[a-z]+')
         GROUP BY word
       ), s0 AS (
         SELECT regexp_replace(word || '_', '(.)', '<\\1>', 'g')
                  AS state, freq
         FROM w
       ), $iterCtes
       $rows ORDER BY iteration"""
  }

  private def kmeansOracle(k: Int, iterations: Int): String =
    s"""WITH ${kmeansCtesSql("embeddings", k, iterations, "km")}
       SELECT m.vec_id, m.cell, m.dist AS dist2_q, s.cell_n
       FROM m$iterations m JOIN (
         SELECT cell, CAST(count(*) AS BIGINT) AS cell_n
         FROM m$iterations GROUP BY cell) s USING (cell)
       ORDER BY m.vec_id"""

  /** The q121 planted-twin relation: every 25th embedding gets a
    * near-identical copy (one coordinate +0.01) at vec_id+100000 —
    * the semantic-duplicate workload, mirrored exactly in Spark by
    * [[embeddingsWithTwins]]. */
  private def twinsCteSql: String =
    """twins AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
         FROM embeddings
         UNION ALL
         SELECT vec_id + 100000,
                [CASE WHEN j - 1 = vec_id % 64 THEN emb[j] + 0.01
                      ELSE emb[j] END
                 for j in range(1, len(emb) + 1)]
         FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings WHERE vec_id % 25 = 0)
       )"""

  /** SemDeDup oracle: replay the k-means over the twinned relation,
    * then the within-cell exact-integer cosine pair test in HUGEINT
    * (Spark does the same comparison in DECIMAL(38,0)). */
  private def semanticNearDupOracle(k: Int, iterations: Int,
      tauNum: Int, tauDen: Int): String =
    s"""WITH $twinsCteSql, ${kmeansCtesSql("twins", k, iterations, "sd")},
       wv AS (
         SELECT vec_id, cell, dist, vq,
                CAST(list_sum([vq[j] * vq[j]
                               for j in range(1, len(vq) + 1)])
                     AS BIGINT) AS n2
         FROM m$iterations
       ), p AS (
         SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b,
                a.dist AS da, b.dist AS db,
                a.n2 AS na2_q, b.n2 AS nb2_q,
                CAST(list_sum([a.vq[j] * b.vq[j]
                               for j in range(1, len(a.vq) + 1)])
                     AS BIGINT) AS dot_q
         FROM wv a JOIN wv b ON a.cell = b.cell AND a.vec_id < b.vec_id
       )
       SELECT cell, id_a, id_b, dot_q, na2_q, nb2_q,
              CAST(round(CAST(dot_q AS DOUBLE)
                     / sqrt(CAST(na2_q AS DOUBLE) * CAST(nb2_q AS DOUBLE))
                     * 1000000) AS BIGINT) AS cos_micros,
              CASE WHEN da < db OR (da = db AND id_a < id_b)
                   THEN id_a ELSE id_b END AS keep_id,
              CASE WHEN da < db OR (da = db AND id_a < id_b)
                   THEN id_b ELSE id_a END AS drop_id
       FROM p
       WHERE dot_q > 0
         AND CAST(dot_q AS HUGEINT) * dot_q * ${tauDen.toLong * tauDen}
             >= CAST(na2_q AS HUGEINT) * nb2_q * ${tauNum.toLong * tauNum}
       ORDER BY id_a, id_b"""

  /** Streaming-HLL oracle: the q108 register/estimate SQL evaluated
    * over each wave's CUMULATIVE document prefix — wave w sees docs
    * with `(doc_id // 20) % 2 <= w`, exactly the state the streamed
    * registers hold after micro-batch w. */
  private def hllWaveOracle(p: Int): String = {
    val m = 1 << p
    val remBits = 60 - p
    val maxM = remBits + 1
    val alphaM2 = Sketch.hllAlpha(m) * m * m
    val twoK = math.pow(2.0, maxM)
    def waveEst(w: Int): String =
      s"""(SELECT source, CAST($w AS BIGINT) AS wave, n_used,
             CASE WHEN raw <= ${2.5 * m} AND v > 0
                  THEN ${m.toDouble} * ln(${m.toDouble} / CAST(v AS DOUBLE))
                  ELSE raw END AS est
           FROM (
             SELECT source, CAST(count(*) AS BIGINT) AS n_used,
                    $m - count(*) AS v,
                    $alphaM2 * ($twoK / CAST(
                      CAST(sum(1::BIGINT << ($maxM - mb))
                           + ($m - count(*)) * (1::BIGINT << $maxM)
                           AS BIGINT) AS DOUBLE)) AS raw
             FROM (
               SELECT source, h >> $remBits AS bucket,
                      max(CASE WHEN h & ((1::BIGINT << $remBits) - 1) = 0
                               THEN $maxM
                               ELSE $maxM - length(bin(
                                 h & ((1::BIGINT << $remBits) - 1))) END) AS mb
               FROM (
                 SELECT source,
                        ('0x' || substr(md5('hll:' || tok), 1, 15))::BIGINT AS h
                 FROM (SELECT source, unnest(
                         string_split_regex(lower(text), '\\s+')) AS tok
                       FROM documents WHERE (doc_id // 20) % 2 <= $w) u
                 WHERE tok <> '') hh
               GROUP BY source, bucket) mm
             GROUP BY source) agg)"""
    s"""SELECT * FROM (${waveEst(0)} UNION ALL ${waveEst(1)}) z
       ORDER BY source, wave"""
  }

  /** q131: q90's domain derivation + the grouped-split hash on the
    * DOMAIN string (same md5-14-hex arithmetic as splitHashSql, keyed
    * on the group value instead of the row id). */
  private def groupedSplitOracle: String = {
    val sufs = UrlOps.publicSuffixes.toSeq.sorted
      .map(s => s"'$s'").mkString(", ")
    s"""WITH u AS (
         SELECT doc_id,
                (['https://ex', 'https://news.ex', 'https://WWW.ex',
                  'https://a.b.ex', 'https://ex', 'https://sub.ex'])[(doc_id % 6) + 1]
                  || CAST(doc_id % 20 AS VARCHAR)
                  || (['.com/p', '.co.uk/a', '.co.uk/b',
                      '.com.au/x', '.org/y', '.de/z'])[(doc_id % 6) + 1]
                  AS url
         FROM documents
       ), h AS (
         SELECT doc_id, url,
                regexp_replace(
                  lower(regexp_extract(
                    regexp_replace(regexp_replace(url, '#.*$$', '', 'g'),
                                   '\\?.*$$', '', 'g'),
                    '^([A-Za-z][A-Za-z0-9+.-]*)://([^/]*)(/.*)?$$', 2)),
                  '^www\\.', '', 'g') AS host
         FROM u
       ), l AS (
         SELECT doc_id, host, string_split(host, '.') AS toks FROM h
       ), reg AS (
         SELECT doc_id,
                CASE WHEN len(toks) <= 2 THEN host
                     WHEN toks[-2] || '.' || toks[-1] IN ($sufs)
                       THEN toks[-3] || '.' || toks[-2] || '.' || toks[-1]
                     ELSE toks[-2] || '.' || toks[-1] END AS registrable
         FROM l
       ), sp AS (
         SELECT doc_id, registrable,
                ('0x' || substr(md5('gsplit:' || registrable), 1, 14))::BIGINT
                  % 100 AS hh
         FROM reg
       )
       SELECT doc_id, registrable,
              CASE WHEN hh < 90 THEN 'train'
                   WHEN hh < 95 THEN 'valid' ELSE 'test' END AS split
       FROM sp ORDER BY doc_id"""
  }

  /** q134: q90's domain derivation + the per-domain wave rank + the
    * salted (domain, wave) fetch key, all replayed in SQL. */
  private def frontierInterleaveOracle: String = {
    val sufs = UrlOps.publicSuffixes.toSeq.sorted
      .map(s => s"'$s'").mkString(", ")
    s"""WITH u AS (
         SELECT doc_id,
                (['https://ex', 'https://news.ex', 'https://WWW.ex',
                  'https://a.b.ex', 'https://ex', 'https://sub.ex'])[(doc_id % 6) + 1]
                  || CAST(doc_id % 20 AS VARCHAR)
                  || (['.com/p', '.co.uk/a', '.co.uk/b',
                      '.com.au/x', '.org/y', '.de/z'])[(doc_id % 6) + 1]
                  AS url
         FROM documents
       ), h AS (
         SELECT doc_id,
                regexp_replace(
                  lower(regexp_extract(
                    regexp_replace(regexp_replace(url, '#.*$$', '', 'g'),
                                   '\\?.*$$', '', 'g'),
                    '^([A-Za-z][A-Za-z0-9+.-]*)://([^/]*)(/.*)?$$', 2)),
                  '^www\\.', '', 'g') AS host
         FROM u
       ), l AS (
         SELECT doc_id, host, string_split(host, '.') AS toks FROM h
       ), reg AS (
         SELECT doc_id,
                CASE WHEN len(toks) <= 2 THEN host
                     WHEN toks[-2] || '.' || toks[-1] IN ($sufs)
                       THEN toks[-3] || '.' || toks[-2] || '.' || toks[-1]
                     ELSE toks[-2] || '.' || toks[-1] END AS registrable
         FROM l
       ), wv AS (
         SELECT doc_id, registrable,
                CAST(row_number() OVER (PARTITION BY registrable
                  ORDER BY doc_id) AS BIGINT) AS wave
         FROM reg
       )
       SELECT doc_id, registrable, wave,
              ('0x' || substr(md5('frontier:' || registrable || ':'
                 || CAST(wave AS VARCHAR)), 1, 14))::BIGINT AS fetch_key
       FROM wv ORDER BY doc_id"""
  }

  /** q136: the round-9 capstone oracle — recursive-closure canonical
    * keep, then the q131 domain/split fragments, then the q134 wave/
    * fetch-key fragments, composed exactly as the engine composes the
    * operators. */
  private def curationV3Oracle: String = {
    val pairs = minhashPairsOracle(corpusCte = boilerplateCorpusSql,
      source = "corpus", cap = None)
    val sufs = UrlOps.publicSuffixes.toSeq.sorted
      .map(s => s"'$s'").mkString(", ")
    s"""WITH RECURSIVE p AS (
         SELECT id_a, id_b FROM ($pairs)
       ), sym AS (
         SELECT id_a AS u, id_b AS v FROM p
         UNION
         SELECT id_b AS u, id_a AS v FROM p
       ), reach(u, v) AS (
         SELECT u, v FROM sym
         UNION
         SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
       ), lbl AS (
         SELECT u AS node, least(u, min(v)) AS cluster_id
         FROM reach GROUP BY u
       ), d AS (
         SELECT doc_id, CAST(length(text) AS BIGINT) AS score FROM documents
         UNION ALL
         SELECT 10000000 + r AS doc_id,
                CAST(length('$boilerplateText') AS BIGINT) AS score
         FROM range(1, 13) t(r)
       ), cl AS (
         SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id,
                d.score
         FROM d LEFT JOIN lbl l ON l.node = d.doc_id
       ), rk AS (
         SELECT *, row_number() OVER (PARTITION BY cluster_id
                     ORDER BY score DESC, doc_id) AS rn
         FROM cl
       ), keepers AS (
         SELECT doc_id FROM rk WHERE rn = 1
       ), uu AS (
         SELECT doc_id,
                (['https://ex', 'https://news.ex', 'https://WWW.ex',
                  'https://a.b.ex', 'https://ex', 'https://sub.ex'])[(doc_id % 6) + 1]
                  || CAST(doc_id % 20 AS VARCHAR)
                  || (['.com/p', '.co.uk/a', '.co.uk/b',
                      '.com.au/x', '.org/y', '.de/z'])[(doc_id % 6) + 1]
                  AS url
         FROM keepers
       ), hh AS (
         SELECT doc_id,
                regexp_replace(
                  lower(regexp_extract(
                    regexp_replace(regexp_replace(url, '#.*$$', '', 'g'),
                                   '\\?.*$$', '', 'g'),
                    '^([A-Za-z][A-Za-z0-9+.-]*)://([^/]*)(/.*)?$$', 2)),
                  '^www\\.', '', 'g') AS host
         FROM uu
       ), ll AS (
         SELECT doc_id, host, string_split(host, '.') AS toks FROM hh
       ), reg AS (
         SELECT doc_id,
                CASE WHEN len(toks) <= 2 THEN host
                     WHEN toks[-2] || '.' || toks[-1] IN ($sufs)
                       THEN toks[-3] || '.' || toks[-2] || '.' || toks[-1]
                     ELSE toks[-2] || '.' || toks[-1] END AS registrable
         FROM ll
       ), lab AS (
         SELECT doc_id, registrable,
                CASE WHEN ('0x' || substr(md5('gsplit:' || registrable),
                             1, 14))::BIGINT % 100 < 90 THEN 'train'
                     WHEN ('0x' || substr(md5('gsplit:' || registrable),
                             1, 14))::BIGINT % 100 < 95 THEN 'valid'
                     ELSE 'test' END AS split
         FROM reg
       ), tr AS (
         SELECT doc_id, registrable, split,
                CAST(row_number() OVER (PARTITION BY registrable
                  ORDER BY doc_id) AS BIGINT) AS wave
         FROM lab WHERE split = 'train'
       )
       SELECT doc_id, registrable, split, wave,
              ('0x' || substr(md5('frontier:' || registrable || ':'
                 || CAST(wave AS VARCHAR)), 1, 14))::BIGINT AS fetch_key
       FROM tr ORDER BY doc_id"""
  }

  /** q133/q139: the exact prefix-filter pairs LEFT JOIN the
    * banded-LSH pairs at the given preset — both subqueries are the
    * certified q111/q45-family oracles verbatim. */
  private def lshRecallOracle(numHashes: Int = 8,
                              independent: Boolean = false): String = {
    val exact = prefixJaccardOracle(tauNum = 4, tauDen = 5)
    val lsh = minhashPairsOracle(corpusCte = boilerplateCorpusSql,
      source = "corpus", cap = None, numHashes = numHashes,
      independent = independent)
    s"""WITH ex AS (SELECT id_a, id_b, jaccard FROM ($exact)),
         ls AS (SELECT id_a AS l_a, id_b AS l_b FROM ($lsh))
       SELECT ex.id_a, ex.id_b, ex.jaccard,
              ls.l_a IS NOT NULL AS found_by_lsh
       FROM ex LEFT JOIN ls ON ls.l_a = ex.id_a AND ls.l_b = ex.id_b
       ORDER BY ex.id_a, ex.id_b"""
  }

  /** q129: per (source, wave, probe) Count-Min estimates, each wave
    * recomputed as the batch sketch over that wave's CUMULATIVE token
    * prefix — identical md5 cell coordinates to `Sketch.cmBucket`
    * and the streaming fold. */
  private def cmWaveOracle(depth: Int, width: Int, salt: String,
                           probes: Seq[String]): String = {
    val probeValues = probes.map(p => s"('$p')").mkString(", ")
    def waveEst(w: Int): String =
      s"""(SELECT g.source, CAST($w AS BIGINT) AS wave, g.probe,
             CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est
           FROM (SELECT src.source, p.probe, p.h, p.bucket
                 FROM (SELECT DISTINCT source FROM tt) src
                 CROSS JOIN pc p) g
           LEFT JOIN (
             SELECT source, h,
                    ('0x' || substr(md5('$salt:' || CAST(h AS VARCHAR)
                       || ':' || tok), 1, 14))::BIGINT % $width AS bucket,
                    CAST(count(*) AS BIGINT) AS cnt
             FROM tt CROSS JOIN (SELECT unnest(range(0, $depth)) AS h)
             WHERE wave <= $w GROUP BY source, h, bucket) s
             ON s.source = g.source AND s.h = g.h AND s.bucket = g.bucket
           GROUP BY g.source, g.probe)"""
    s"""WITH t AS (
         SELECT source, (doc_id // 20) % 2 AS wave,
                unnest(string_split_regex(lower(text), '\\s+')) AS tok
         FROM documents
       ), tt AS (SELECT * FROM t WHERE tok <> ''),
       probes(probe) AS (VALUES $probeValues),
       pc AS (
         SELECT probe, h,
                ('0x' || substr(md5('$salt:' || CAST(h AS VARCHAR)
                   || ':' || probe), 1, 14))::BIGINT % $width AS bucket
         FROM probes CROSS JOIN (SELECT unnest(range(0, $depth)) AS h)
       )
       SELECT * FROM (${waveEst(0)} UNION ALL ${waveEst(1)}) z
       ORDER BY source, wave, probe"""
  }

  /** Prefix-filter exact Jaccard join oracle mirroring
    * [[graft.operators.Dedup.prefixJaccardPairs]]: rarity-keyed
    * shingles (lpad(df):shingle), prefix length L - ceil(tau·L) + 1
    * in integer arithmetic, first-match emission at the minimum
    * shared prefix key, then exact set verification. */
  private def prefixJaccardOracle(tauNum: Int, tauDen: Int,
                                  collapse: Boolean = false): String = {
    // collapse: lowest-id representative per distinct text (the
    // exactDuplicates keep rule) before the join — q140's contract
    val repCte = if (!collapse) ""
      else "rcorpus AS (SELECT min(doc_id) AS doc_id, text FROM corpus GROUP BY text), "
    val src = if (collapse) "rcorpus" else "corpus"
    s"""WITH ${boilerplateCorpusSql}${repCte}w AS (
         SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM $src
       ), sh AS (
         SELECT DISTINCT doc_id, unnest(
           CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                ELSE [array_to_string(words[i:i+2], ' ')
                      for i in range(1, len(words) - 1)]
           END) AS shingle
         FROM w
       ), df AS (
         SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY shingle
       ), keyed AS (
         SELECT s.doc_id,
                lpad(CAST(d.df AS VARCHAR), 10, '0') || ':' || s.shingle AS k
         FROM sh s JOIN df d USING (shingle)
       ), sets AS (
         SELECT doc_id, list_sort(list(k)) AS ks, CAST(count(*) AS BIGINT) AS l
         FROM keyed GROUP BY doc_id
       ), pref AS (
         SELECT doc_id, l,
                ks[1:CAST(l - (l * $tauNum + ${tauDen - 1}) // $tauDen + 1
                          AS INTEGER)] AS p
         FROM sets
       ), pe AS (
         SELECT doc_id, l, p, unnest(p) AS pk FROM pref
       ), cand AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM pe a JOIN pe b ON a.pk = b.pk AND a.doc_id < b.doc_id
         WHERE a.l * $tauNum <= b.l * $tauDen
           AND b.l * $tauNum <= a.l * $tauDen
           AND a.pk = list_min(list_intersect(a.p, b.p))
       ), ver AS (
         SELECT c.id_a, c.id_b,
                CAST(len(list_intersect(sa.ks, sb.ks)) AS BIGINT) AS n_inter,
                sa.l AS n_a, sb.l AS n_b
         FROM cand c JOIN sets sa ON sa.doc_id = c.id_a
                     JOIN sets sb ON sb.doc_id = c.id_b
       )
       SELECT id_a, id_b, n_inter, n_a, n_b,
              CAST(n_inter AS DOUBLE)
                / CAST(n_a + n_b - n_inter AS DOUBLE) AS jaccard
       FROM ver
       WHERE n_inter * $tauDen >= (n_a + n_b - n_inter) * $tauNum
       ORDER BY id_a, id_b"""
  }

  private def minhashCappedPairsOracle: String =
    minhashPairsOracle(corpusCte = boilerplateCorpusSql, source = "corpus",
      cap = Some(8))

  /** MinHash-LSH near-dup pair oracle. The Spark side emits each pair
    * once via first-match banding; the oracle gets the same SET with a
    * plain UNION (which dedups) over per-band joins. With `cap`, each
    * band join is restricted to buckets of at most `cap` members —
    * the hot-bucket guard's semantics: a pair survives iff SOME band
    * puts both docs in a small-enough bucket. */
  private def minhashPairsOracle(corpusCte: String, source: String,
                                 cap: Option[Int],
                                 threshold: Option[Double] = Some(0.8),
                                 withSigEq: Boolean = false,
                                 numHashes: Int = 8,
                                 independent: Boolean = false): String = {
    val numBands = numHashes / 2 // rowsPerBand = 2 throughout
    val sigs = minhashSigsSql(numHashes, independent)
    val bandCols = (0 until numBands).map(b =>
      s"md5(concat_ws('|', sig_${2 * b}, sig_${2 * b + 1})) AS b_$b").mkString(", ")
    val unions = (0 until numBands).map { b =>
      val capClause = cap.map(c =>
        s"""
          JOIN (SELECT b_$b AS k, count(*) AS c FROM bands GROUP BY 1) sz
            ON sz.k = a.b_$b
          WHERE sz.c <= $c""").getOrElse("")
      s"""SELECT a.doc_id AS id_a, b2.doc_id AS id_b
          FROM bands a JOIN bands b2 ON a.b_$b = b2.b_$b AND a.doc_id < b2.doc_id$capClause"""
    }.mkString(" UNION ")
    val where = threshold.map(t => s" WHERE jaccard >= $t").getOrElse("")
    val sigEqCte = if (!withSigEq) "" else {
      val eqSum = (0 until numHashes)
        .map(i => s"CASE WHEN sa.sig_$i = sb.sig_$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s""", se AS (
         SELECT j.id_a, j.id_b, CAST($eqSum AS BIGINT) AS sig_eq
         FROM j JOIN sig sa ON sa.doc_id = j.id_a
                JOIN sig sb ON sb.doc_id = j.id_b
       )"""
    }
    val sigEqJoin =
      if (withSigEq) " JOIN se ON se.id_a = j.id_a AND se.id_b = j.id_b" else ""
    val finalCols =
      if (withSigEq) "j.id_a AS id_a, j.id_b AS id_b, se.sig_eq AS sig_eq, " +
        "j.n_inter AS n_inter, j.n_a AS n_a, j.n_b AS n_b, j.jaccard AS jaccard"
      else "id_a, id_b, n_inter, n_a, n_b, jaccard"
    s"""WITH ${corpusCte}w AS (
         SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM $source
       ), sh AS (
         SELECT doc_id, unnest(
           CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                ELSE [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]
           END) AS shingle
         FROM w
       ), shd AS (
         SELECT DISTINCT doc_id, shingle FROM sh
       ), sig AS (
         SELECT doc_id, $sigs FROM sh GROUP BY doc_id
       ), bands AS (
         SELECT doc_id, $bandCols FROM sig
       ), p AS ($unions),
       sizes AS (
         SELECT doc_id, CAST(count(*) AS INTEGER) AS n_sh FROM shd GROUP BY doc_id
       ), inter AS (
         SELECT p.id_a, p.id_b, CAST(count(*) AS BIGINT) AS n_inter
         FROM p
         JOIN shd ta ON ta.doc_id = p.id_a
         JOIN shd tb ON tb.doc_id = p.id_b AND ta.shingle = tb.shingle
         GROUP BY p.id_a, p.id_b
       ), j AS (
         SELECT p.id_a, p.id_b,
                coalesce(i.n_inter, 0) AS n_inter,
                sa.n_sh AS n_a, sb.n_sh AS n_b,
                CAST(coalesce(i.n_inter, 0) AS DOUBLE)
                  / (sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0)) AS jaccard
         FROM p
         LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
         JOIN sizes sa ON sa.doc_id = p.id_a
         JOIN sizes sb ON sb.doc_id = p.id_b
       )$sigEqCte
       SELECT $finalCols
       FROM j$sigEqJoin$where ORDER BY id_a, id_b"""
  }

  /** q53: connected components over the q45-family near-dup pairs,
    * recomputed in DuckDB as a recursive transitive closure — the
    * component label is the minimum reachable id, exactly the
    * large-star/small-star fixpoint. Singleton documents label
    * themselves via the left join. */
  private def duplicateClustersOracle: String = {
    val pairs = minhashPairsOracle(corpusCte = boilerplateCorpusSql,
      source = "corpus", cap = None)
    s"""WITH RECURSIVE p AS (
         SELECT id_a, id_b FROM ($pairs)
       ), sym AS (
         SELECT id_a AS u, id_b AS v FROM p
         UNION
         SELECT id_b AS u, id_a AS v FROM p
       ), reach(u, v) AS (
         SELECT u, v FROM sym
         UNION
         SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
       ), lbl AS (
         SELECT u AS node, least(u, min(v)) AS cluster_id
         FROM reach GROUP BY u
       ), ids AS (
         SELECT doc_id FROM documents
         UNION ALL
         SELECT 10000000 + r AS doc_id FROM range(1, 13) t(r)
       )
       SELECT i.doc_id,
              coalesce(l.cluster_id, i.doc_id) AS cluster_id,
              coalesce(l.cluster_id, i.doc_id) = i.doc_id AS is_canonical
       FROM ids i LEFT JOIN lbl l ON l.node = i.doc_id
       ORDER BY doc_id"""
  }

  /** Identical-full-signature clusters over the boilerplate corpus
    * (q46). DuckDB `count(*)` is already BIGINT; `concat_ws` renders
    * the BIGINT signature slots in plain decimal, matching Spark's
    * `concat_ws` on longs. */
  private def signatureClustersOracle: String = {
    val sigCols = (0 until 8).map(h => s"sig_$h").mkString(", ")
    s"""WITH ${boilerplateCorpusSql}w AS (
         SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM corpus
       ), sh AS (
         SELECT doc_id, unnest(
           CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                ELSE [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]
           END) AS shingle
         FROM w
       ), sig AS (
         SELECT doc_id, $minhashSigsSql FROM sh GROUP BY doc_id
       )
       SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_docs,
              md5(concat_ws('|', $sigCols)) AS sig_md5
       FROM sig GROUP BY $sigCols HAVING count(*) > 1
       ORDER BY keep_id"""
  }

  /** DuckDB mirror of `Curation.sampleHash(...) pmod mod`. */
  private def splitHashSql(salt: String, mod: Int): String =
    s"('0x' || substr(md5('$salt:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % $mod"

  /** q49: the composed curation pipeline — language-id + quality
    * fragments are verbatim from the q18/q17 oracles, then filter,
    * min-id-per-digest dedup, and the split-hash CASE. */
  /** Shared hh..f CTE chain (language-id + quality scoring + the
    * q49/q73 keep-filter), threaded with `source` for the mixture
    * stage. Used WITHOUT a leading WITH. */
  private def qualityFilterCtes: String = {
    val hitCols = langMarkersSql.map { case (lang, list) =>
      s"CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x IN ($list))) AS INTEGER) AS hits_$lang"
    }.mkString(",\n  ")
    val langs = langMarkersSql.map(_._1)
    val m = "greatest(" + langs.map(l => s"hits_$l").mkString(", ") + ")"
    val pick = langs.map(l => s"WHEN hits_$l = $m THEN '$l'").mkString(" ")
    s"""hh AS (
         SELECT doc_id, text, source, $hitCols FROM documents
       ), lang AS (
         SELECT doc_id, text, source, CASE $pick END AS predicted_lang FROM hh
       ), met AS (
         SELECT doc_id, text, source, predicted_lang,
           CAST(length(text) AS DOUBLE) AS n_chars_d,
           CAST(len(string_split_regex(lower(text), '\\s+')) AS DOUBLE) AS n_words,
           CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS n_alpha,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS n_digit,
           CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) AS n_punct,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
             x -> x IN ($stopwordsSqlList))) AS DOUBLE) AS n_stop
         FROM lang
       ), r AS (
         SELECT doc_id, text, source, predicted_lang, n_words,
           n_alpha / greatest(n_chars_d, 1.0) AS alpha_ratio,
           n_digit / greatest(n_chars_d, 1.0) AS digit_ratio,
           n_punct / greatest(n_chars_d, 1.0) AS punct_ratio,
           n_stop / greatest(n_words, 1.0) AS stopword_ratio
         FROM met
       ), q AS (
         SELECT doc_id, text, source, predicted_lang, n_words,
           least(alpha_ratio / 0.7, 1.0) * 0.4
             + least(stopword_ratio / 0.3, 1.0) * 0.3
             + (1.0 - least(digit_ratio * 5, 1.0)) * 0.15
             + (1.0 - least(punct_ratio * 5, 1.0)) * 0.15 AS quality_score
         FROM r
       ), f AS (
         SELECT * FROM q
         WHERE predicted_lang = 'en' AND quality_score >= 0.5 AND n_words >= 5
       )"""
  }

  private def curationPipelineOracle: String =
    s"""WITH $qualityFilterCtes, k AS (
         SELECT doc_id, predicted_lang, n_words,
                row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
                ${splitHashSql("graft", 100)} AS hs
         FROM f
       )
       SELECT doc_id, predicted_lang, CAST(n_words AS BIGINT) AS n_words,
              CASE WHEN hs < 90 THEN 'train'
                   WHEN hs < 95 THEN 'valid' ELSE 'test' END AS split
       FROM k WHERE rn = 1 ORDER BY doc_id"""

  /** q73: the end-to-end corpus-assembly pipeline — quality filter →
    * exact dedup → decontaminate (vs the doc_id%97 eval set) →
    * mixture resample (src0:3, src1:2) → split → 512-token packing
    * per split. Every stage's fragment is proven individually
    * (q49/q58/q61/q48/q52); this oracle proves the COMPOSITION. */
  private def corpusPipelineOracle: String =
    s"""WITH $qualityFilterCtes, dd AS (
         SELECT doc_id, text, source, n_words,
                row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         FROM f
       ), surv AS (
         SELECT doc_id, text, source, n_words FROM dd
         WHERE rn = 1 AND doc_id % 97 <> 0
       ), gw AS (
         SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM documents
       ), g AS (
         SELECT DISTINCT doc_id, unnest(
           CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                ELSE [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]
           END) AS gram
         FROM gw
       ), eg AS (
         SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
       ), contam AS (
         SELECT g.doc_id FROM g JOIN eg USING (gram)
         JOIN surv ON surv.doc_id = g.doc_id
         GROUP BY g.doc_id HAVING count(*) >= 2
       ), clean AS (
         SELECT s.doc_id, s.source, s.n_words FROM surv s
         WHERE s.doc_id NOT IN (SELECT doc_id FROM contam)
       ), cnt AS (
         SELECT source, CAST(count(*) AS BIGINT) AS n FROM clean GROUP BY 1
       ), cw AS (
         SELECT source, n,
                CAST(CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 2
                     ELSE 1 END AS BIGINT) AS w
         FROM cnt
       ), mm AS (
         SELECT n AS mn, w AS mw FROM cw
         ORDER BY CAST(n AS DOUBLE) / w, source LIMIT 1
       ), mixed AS (
         SELECT c.doc_id, c.source, c.n_words
         FROM clean c JOIN cw USING (source) CROSS JOIN mm
         WHERE ('0x' || substr(md5('mix:' || CAST(c.doc_id AS VARCHAR)), 1, 14))::BIGINT
                 % (mm.mw * cw.n) < (mm.mn * cw.w)
       ), sp AS (
         SELECT doc_id, source, CAST(n_words AS BIGINT) AS ws_tokens,
                ${splitHashSql("graft", 100)} AS hs
         FROM mixed
       ), ss AS (
         SELECT doc_id, source, ws_tokens,
                CASE WHEN hs < 90 THEN 'train'
                     WHEN hs < 95 THEN 'valid' ELSE 'test' END AS split
         FROM sp
       ), pk AS (
         SELECT doc_id, source, split, ws_tokens,
                CAST(SUM(ws_tokens) OVER (PARTITION BY split ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  - ws_tokens AS strt
         FROM ss
       )
       SELECT doc_id, source, split, ws_tokens,
              CAST(floor(strt / 512) AS BIGINT) AS pack_id,
              strt - CAST(floor(strt / 512) AS BIGINT) * 512 AS pack_offset
       FROM pk ORDER BY doc_id"""

  private def simhashNearDupOracle: String =
    simhashPairsOracle(corpusCte = "", source = "documents", cap = None)

  private def simhashCappedOracle: String =
    simhashPairsOracle(corpusCte = boilerplateCorpusSql, source = "corpus",
      cap = Some(8))

  /** SimHash near-dup oracle; with `cap`, each slice join is
    * restricted to slice-key buckets of at most `cap` members (the
    * hot-bucket guard — same UNION-set equivalence as the capped
    * minhash oracle). */
  private def simhashPairsOracle(corpusCte: String, source: String,
                                 cap: Option[Int]): String = {
    val votes = (0 until 60).map(b =>
      s"CAST(sum(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS b_$b")
      .mkString(", ")
    val fp = (0 until 60).map(b =>
      s"CASE WHEN b_$b > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END")
      .mkString(" | ")
    val unions = (0 until 4).map { sl =>
      val capClause = cap.map(c =>
        s"""
          JOIN (SELECT (simhash >> ${sl * 15}) & 32767 AS k, count(*) AS c
                FROM sb GROUP BY 1) sz
            ON sz.k = ((a.simhash >> ${sl * 15}) & 32767)
          WHERE sz.c <= $c""").getOrElse("")
      s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
          FROM sb a JOIN sb b
            ON ((a.simhash >> ${sl * 15}) & 32767) = ((b.simhash >> ${sl * 15}) & 32767)
           AND a.doc_id < b.doc_id$capClause"""
    }.mkString(" UNION ")
    s"""WITH ${corpusCte}w AS (
         SELECT doc_id, unnest(list_distinct(string_split_regex(text, '\\s+'))) AS word
         FROM $source
       ), h AS (
         SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS hv FROM w
       ), v AS (
         SELECT doc_id, $votes FROM h GROUP BY doc_id
       ), sb AS (
         SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM v
       ), p AS ($unions)
       SELECT id_a, id_b, hamming FROM p WHERE hamming <= 8
       ORDER BY id_a, id_b"""
  }

  /** DuckDB twin of [[frozenVec]]: 8 exact small-integer doubles from
    * the md5 hex pairs of `keyExpr`. */
  private def frozenVecSql(keyExpr: String): String =
    (0 until 8).map(i =>
      s"('0x' || substr(md5($keyExpr), ${2 * i + 1}, 2))::BIGINT::DOUBLE")
      .mkString("[", ", ", "]")

  /** Full DuckDB replay of the flagship matcher with the frozen
    * embedder + `lower` cleaner (q40): crossJoin cosine → top-2 with
    * the lower-ref_row_id tie-break → rank pivot → exact-overwrite
    * (first-row-wins, definition-vs-all_text asymmetry, rank-2
    * nulling). Every stage mirrors Matcher.mapLabels /
    * overwriteExactMatches one-to-one. */
  private def labelMatchFrozenOracle: String = {
    def cos(av: String, an: String, bv: String, bn: String) =
      s"CASE WHEN $an * $bn = 0 THEN 0.0 ELSE list_dot_product($av, $bv) / ($an * $bn) END"
    s"""WITH p AS (
         SELECT CAST(p_partkey AS VARCHAR) AS ct_id, p_name AS ct_name,
                p_brand AS ct_label, p_type AS def,
                p_name || ' ' || p_brand || ' ' || p_type AS all_text
         FROM part WHERE p_partkey <= 300
       ), ref AS (
         SELECT ct_id, ct_name, def, all_text,
                row_number() OVER (ORDER BY ct_id) AS ref_row_id,
                ${frozenVecSql("all_text")} AS v
         FROM p
       ), refn AS (
         SELECT *, sqrt(list_dot_product(v, v)) AS nrm FROM ref
       ), rawq AS (
         SELECT DISTINCT source, raw FROM (
           SELECT source,
                  array_to_string((string_split(text, ' '))[1:3], ' ') AS raw
           FROM documents
           UNION ALL
           SELECT 'planted' AS source, p_name AS raw
           FROM part WHERE p_partkey <= 300 AND p_partkey % 50 = 0
         )
       ), q AS (
         SELECT source, raw, lower(raw) AS cleaned,
                ${frozenVecSql("lower(raw)")} AS qv
         FROM rawq
       ), qn AS (
         SELECT *, sqrt(list_dot_product(qv, qv)) AS qnrm FROM q
       ), s AS (
         SELECT qn.source, qn.raw, qn.cleaned, r.ref_row_id,
                ${cos("qn.qv", "qn.qnrm", "r.v", "r.nrm")} AS score
         FROM qn CROSS JOIN refn r
       ), rk AS (
         SELECT *, row_number() OVER (PARTITION BY source, raw
                     ORDER BY score DESC, ref_row_id ASC) AS rnk
         FROM s
       ), wide AS (
         SELECT source, raw, cleaned,
           max(CASE WHEN rnk = 1 THEN score END) AS sc1,
           max(CASE WHEN rnk = 1 THEN ref_row_id END) AS rid1,
           max(CASE WHEN rnk = 2 THEN score END) AS sc2,
           max(CASE WHEN rnk = 2 THEN ref_row_id END) AS rid2
         FROM rk WHERE rnk <= 2 GROUP BY source, raw, cleaned
       ), ex AS (
         SELECT ekey, eid, ename, edef FROM (
           SELECT lower(ct_name) AS ekey, ct_id AS eid, ct_name AS ename,
                  def AS edef,
                  row_number() OVER (PARTITION BY lower(ct_name)
                    ORDER BY ref_row_id ASC) AS rn
           FROM ref)
         WHERE rn = 1
       )
       SELECT w.source, w.raw AS raw_input_label, w.cleaned AS cleaned_input_label,
         CASE WHEN e.ekey IS NOT NULL THEN CAST(1.0 AS DOUBLE) ELSE w.sc1 END AS match_score_1,
         CASE WHEN e.ekey IS NOT NULL THEN e.eid ELSE r1.ct_id END AS matched_asctb_id_1,
         CASE WHEN e.ekey IS NOT NULL THEN e.ename ELSE r1.ct_name END AS matched_asctb_label_1,
         CASE WHEN e.ekey IS NOT NULL THEN e.edef ELSE r1.all_text END AS matched_asctb_text_1,
         CASE WHEN e.ekey IS NOT NULL THEN NULL ELSE w.sc2 END AS match_score_2,
         CASE WHEN e.ekey IS NOT NULL THEN NULL ELSE r2.ct_id END AS matched_asctb_id_2,
         CASE WHEN e.ekey IS NOT NULL THEN NULL ELSE r2.ct_name END AS matched_asctb_label_2,
         CASE WHEN e.ekey IS NOT NULL THEN NULL ELSE r2.all_text END AS matched_asctb_text_2
       FROM wide w
       LEFT JOIN ex e ON e.ekey = w.cleaned
       LEFT JOIN ref r1 ON r1.ref_row_id = w.rid1
       LEFT JOIN ref r2 ON r2.ref_row_id = w.rid2
       ORDER BY w.source, raw_input_label"""
  }

  /** Raw-token stopword filter (F7/F10: NLTK list + 'NaN') as a SQL
    * NOT IN list, generated from TextNlp.stopwords. */
  private def notStopwordSql(e: String): String = {
    val words = (graft.functions.TextNlp.stopwords + "NaN").toSeq.sorted
      .map(w => s"'${w.replace("'", "''")}'").mkString(", ")
    s"$e NOT IN ($words)"
  }

  /** CTE stages applying the full cleanToken pipeline (contraction →
    * alnum-strip → number-words → lowercase → exception/morphy lemma →
    * rstrip-'s') to every token of `textExpr`, keyed by `keys`.
    * regexSplit=true mirrors cleanLabel's python no-arg split (`\s+`,
    * empties dropped); false mirrors tokensCleanDedup's `split(' ')`
    * (empties kept). Emits `<p>_rooted(keys*, pos, rt, ctok)`;
    * expects global CTEs ct(tok,exp), exc(eword,elemma), nlex(ws). */
  private def cleanTokenStagesSql(p: String, srcCte: String, keys: Seq[String],
                                  textExpr: String, regexSplit: Boolean): String = {
    val ks = keys.mkString(", ")
    val split =
      if (regexSplit) s"string_split_regex($textExpr, '\\s+')"
      else s"string_split($textExpr, ' ')"
    val emptyFilter = if (regexSplit) "WHERE rt <> ''" else ""
    s"""${p}_toks AS (
         SELECT $ks, unnest($split) AS rt,
                unnest(range(1, len($split) + 1)) AS pos
         FROM $srcCte
       ), ${p}_nz AS (SELECT * FROM ${p}_toks $emptyFilter
       ), ${p}_al AS (
         SELECT $ks, pos, rt,
                regexp_replace(coalesce(ct.exp, x.rt), '[^a-zA-Z0-9]', '', 'g') AS alnum
         FROM ${p}_nz x LEFT JOIN ct ON ct.tok = x.rt
       ), ${p}_lw AS (
         SELECT $ks, pos, rt,
                lower(CASE WHEN regexp_matches(alnum, '^[0-9]+$$')
                           THEN ${numberWordsSql("CAST(alnum AS BIGINT)")}
                           ELSE alnum END) AS w
         FROM ${p}_al
       ), ${p}_rooted AS (
         SELECT $ks, pos, rt,
                rtrim(coalesce(e.elemma, ${morphyCaseSql("w")}), 's') AS ctok
         FROM ${p}_lw CROSS JOIN nlex LEFT JOIN exc e ON e.eword = w
       )"""
  }

  /** Stages turning `<p>_rooted` into the md5-TF embedding vector of
    * [[graft.embed.Md5HashingEmbedder]]: raw-token stopword filter →
    * first-emitted-occurrence dedup on the cleaned token → md5-56
    * bucket counts (dim buckets) → L2 normalize (zero vectors pass
    * through). `baseCte` supplies one row per key so all-stopword /
    * empty token lists still yield a (zero) vector. */
  private def md5TfVecStagesSql(p: String, baseCte: String, keys: Seq[String],
                                dim: Int): String = {
    val ks = keys.mkString(", ")
    val joinOn = keys.map(k => s"b.$k = k.$k").mkString(" AND ")
    val bks = keys.map(k => s"b.$k").mkString(", ")
    s"""${p}_kept AS (
         SELECT $ks, pos, ctok,
                row_number() OVER (PARTITION BY $ks, ctok ORDER BY pos) AS dup_rn
         FROM ${p}_rooted WHERE ${notStopwordSql("rt")}
       ), ${p}_toklist AS (
         SELECT $bks,
                list(k.ctok ORDER BY k.pos) FILTER (WHERE k.pos IS NOT NULL) AS toks
         FROM $baseCte b LEFT JOIN (SELECT * FROM ${p}_kept WHERE dup_rn = 1) k
           ON $joinOn
         GROUP BY $bks
       ), ${p}_cnt AS (
         SELECT $ks,
                list_transform(range(0, $dim), i ->
                  CAST(len(list_filter(coalesce(toks, []), t ->
                    (('0x' || substr(md5(t), 1, 14))::BIGINT % $dim) = i)) AS DOUBLE)) AS c
         FROM ${p}_toklist
       ), ${p}_vec AS (
         SELECT $ks,
                CASE WHEN sqrt(list_dot_product(c, c)) = 0 THEN c
                     ELSE list_transform(c, x -> x / sqrt(list_dot_product(c, c))) END AS v
         FROM ${p}_cnt
       )"""
  }

  /** Stages turning `<p>_rooted` into the frozen-trained-vocabulary
    * mean vector of [[graft.embed.QuantizedVocabEmbedder]] /
    * [[graft.functions.VocabAvgExpr]]: identical kept/toklist stages
    * to [[md5TfVecStagesSql]] (raw-token stopword filter,
    * first-occurrence dedup), then per-dimension SUM of the in-vocab
    * word vectors — a plain group aggregate, valid because the
    * quantized weights make the sum exact and order-free — scaled by
    * `(1.0 / n)` exactly as the JVM applies it (single rounding
    * step), then the shared L2-normalize stage. Expects a global CTE
    * `w2v(word, vec DOUBLE[])`. OOV tokens contribute nothing but
    * count toward n; empty/all-OOV token lists yield the zero
    * vector. */
  private def w2vVecStagesSql(p: String, baseCte: String, keys: Seq[String],
                              dim: Int): String = {
    val ks = keys.mkString(", ")
    val joinOn = keys.map(k => s"b.$k = k.$k").mkString(" AND ")
    val bks = keys.map(k => s"b.$k").mkString(", ")
    val ivJoin = keys.map(k => s"tl.$k = iv.$k").mkString(" AND ")
    val tks = keys.map(k => s"tl.$k").mkString(", ")
    val zeros = Seq.fill(dim)("0.0").mkString("[", ", ", "]")
    s"""${p}_kept AS (
         SELECT $ks, pos, ctok,
                row_number() OVER (PARTITION BY $ks, ctok ORDER BY pos) AS dup_rn
         FROM ${p}_rooted WHERE ${notStopwordSql("rt")}
       ), ${p}_toklist AS (
         SELECT $bks,
                list(k.ctok ORDER BY k.pos) FILTER (WHERE k.pos IS NOT NULL) AS toks
         FROM $baseCte b LEFT JOIN (SELECT * FROM ${p}_kept WHERE dup_rn = 1) k
           ON $joinOn
         GROUP BY $bks
       ), ${p}_ivs AS (
         SELECT $ks, list(w.vec) AS vecs
         FROM (SELECT $ks, unnest(coalesce(toks, [])) AS tok FROM ${p}_toklist) u
         JOIN w2v w ON w.word = u.tok
         GROUP BY $ks
       ), ${p}_cnt AS (
         SELECT $tks,
                CASE WHEN len(coalesce(tl.toks, [])) = 0 THEN $zeros
                     ELSE list_transform(range(1, ${dim + 1}), d ->
                       coalesce(list_sum(list_transform(coalesce(iv.vecs, []),
                                                        v -> v[d])), 0.0)
                         * (1.0 / len(tl.toks)))
                END AS c
         FROM ${p}_toklist tl LEFT JOIN ${p}_ivs iv ON $ivJoin
       ), ${p}_vec AS (
         SELECT $ks,
                CASE WHEN sqrt(list_dot_product(c, c)) = 0 THEN c
                     ELSE list_transform(c, x -> x / sqrt(list_dot_product(c, c))) END AS v
         FROM ${p}_cnt
       )"""
  }

  /** Full DuckDB replay of the flagship matcher on the LIVE md5-kernel
    * hashing embedder (q24): every stage of qFlagship — NLP label
    * clean, clean-dedup tokenization of both sides, TF bucket counts,
    * L2 normalize, cosine top-2 with the lower-ref_row_id tie-break,
    * rank pivot, exact-overwrite — mirrored one-to-one. The pipeline
    * stages are applied four times exactly as the engine does: query
    * label clean (display + embed input), query embed tokens, ref
    * embed tokens (raw all_text), ref CT_NAME clean (exact-match
    * key). */
  private def labelMatchHashedOracle: String =
    flagshipLiveOracle((p, base, keys) => md5TfVecStagesSql(p, base, keys, 64))

  /** q44's oracle: the SAME flagship replay with the vector stages
    * swapped for the frozen trained-vocabulary mean
    * ([[w2vVecStagesSql]]) over a generated-VALUES w2v(word, vec)
    * table — the fitted, 2^-20-quantized Word2Vec matrix captured by
    * [[q44VocabHolder]] during the q44 run. */
  private def labelMatchW2vOracle(vocab: Seq[(String, Array[Double])]): String = {
    val rows = vocab.map { case (w, v) =>
      s"('${w.replace("'", "''")}', ${v.map(_.toString).mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n         ")
    flagshipLiveOracle((p, base, keys) => w2vVecStagesSql(p, base, keys, 64),
      extraCtes = s",\n       w2v(word, vec) AS (SELECT * FROM (VALUES $rows))")
  }

  /** q148's training trajectory as CTEs: RETRAIN the
    * [[graft.embed.CoocPowerEmbedder]] inside DuckDB — tokenize the
    * fit corpus with the engine's clean-dedup pipeline, count exact
    * (u,v) document co-occurrences (diagonal = row frequency), seed
    * ±micro vectors from md5 parity, unroll `rounds` floor-mean
    * diffusion rounds (the exactly-divisible `(raw - pmod) / deg`
    * form both engines compute exactly), and emit `w2v(word, vec)`
    * for the shared [[w2vVecStagesSql]] apply stages. */
  private def coocTrainCtesSql(dim: Int, rounds: Int, micro: Long,
                               salt: String): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""cr$r AS (
         SELECT c.u, w.d, CAST(sum(c.cnt * w.x) AS BIGINT) AS raw
         FROM cooc c JOIN cw${r - 1} w ON w.word = c.v
         GROUP BY c.u, w.d
       ), cw$r AS (
         SELECT r.u AS word, r.d,
                CAST((r.raw - (((r.raw % g.deg) + g.deg) % g.deg)) / g.deg
                  AS BIGINT) AS x
         FROM cr$r r JOIN cdeg g ON g.u = r.u
       )"""
    }.mkString(",\n       ")
    s""",
       twsrc AS (
         SELECT CAST(p_partkey AS VARCHAR) AS ct_id,
                coalesce(p_name || ' ' || p_brand || ' ' || p_type, p_name) AS all_text
         FROM part WHERE p_partkey <= 300
       ),
       ${cleanTokenStagesSql("tw", "twsrc", Seq("ct_id"),
        "substr(all_text, 1, 150)", regexSplit = false)},
       tw_tok AS (
         SELECT ct_id, ctok AS tok FROM (
           SELECT ct_id, ctok,
                  row_number() OVER (PARTITION BY ct_id, ctok ORDER BY pos) AS dup_rn
           FROM tw_rooted WHERE ${notStopwordSql("rt")})
         WHERE dup_rn = 1
       ),
       cooc AS (
         SELECT a.tok AS u, b.tok AS v, CAST(count(*) AS BIGINT) AS cnt
         FROM tw_tok a JOIN tw_tok b ON b.ct_id = a.ct_id
         GROUP BY a.tok, b.tok
       ),
       cdeg AS (SELECT u, CAST(sum(cnt) AS BIGINT) AS deg FROM cooc GROUP BY u),
       cw0 AS (
         SELECT g.u AS word, dd.d,
                CAST(CASE WHEN ('0x' || substr(md5('$salt:' || g.u || ':' ||
                         CAST(dd.d AS VARCHAR)), 1, 14))::BIGINT % 2 = 0
                     THEN $micro ELSE -$micro END AS BIGINT) AS x
         FROM cdeg g CROSS JOIN (SELECT unnest(range(0, $dim)) AS d) dd
       ),
       $roundCtes,
       w2v AS (
         SELECT word, list(CAST(x AS DOUBLE) ORDER BY d) AS vec
         FROM cw$rounds GROUP BY word
       )"""
  }

  private def labelMatchCoocOracle: String =
    flagshipLiveOracle((p, base, keys) => w2vVecStagesSql(p, base, keys, 64),
      extraCtes = coocTrainCtesSql(dim = 64, rounds = 2, micro = 1000000L,
        salt = "cpe"))

  /** q35's oracle: replay the 2-d projection from the frozen signed
    * eigenbasis ([[q35BasisHolder]], captured at fit time). Both
    * engines compute the same ordered 64-term dot product
    * ([[graft.functions.DotProductExpr]] ↔ `list_dot_product`), so
    * the coordinates match bit-for-bit; the basis itself is certified
    * against PCA's mathematical contract by q82. */
  private def pcaProjectionOracle(basis: Array[Array[Double]]): String = {
    def arr(b: Array[Double]) = b.map(_.toString).mkString("[", ", ", "]")
    s"""SELECT vec_id,
         list_dot_product(CAST(embedding AS DOUBLE[]), ${arr(basis(0))}) AS x,
         list_dot_product(CAST(embedding AS DOUBLE[]), ${arr(basis(1))}) AS y
       FROM embeddings ORDER BY vec_id"""
  }

  /** Oracles generated from model state frozen at query-run time
    * (Verify runs every query before dumping [[oracleSql]]); empty
    * until the capturing queries have run in this JVM, in which case
    * the driver falls back to its rows-only record for them. */
  private def modelOracles: Map[String, String] =
    q35BasisHolder.get
      .map(b => "q35_pca_projection" -> pcaProjectionOracle(b)).toMap ++
    q44VocabHolder.get
      .map(v => "q44_label_match_w2v" -> labelMatchW2vOracle(v)).toMap

  /** The shared flagship-replay skeleton (every stage of qFlagship
    * mirrored one-to-one — see [[labelMatchHashedOracle]]'s doc),
    * parameterized over the embedding-vector stages so the md5-TF
    * (q24) and frozen-Word2Vec (q44) oracles state the identical
    * matcher algebra. `vecStages(p, baseCte, keys)` must emit
    * `${p}_vec(keys*, v)`; `extraCtes` is appended to the global CTE
    * prelude (leading comma included by the caller). */
  private def flagshipLiveOracle(
      vecStages: (String, String, Seq[String]) => String,
      extraCtes: String = ""): String = {
    val ctValues = graft.functions.TextNlp.contractionsMap.toSeq.sorted
      .map { case (k, v) =>
        s"('${k.replace("'", "''")}', '${v.replace("'", "''")}')"
      }.mkString(", ")
    def cos(av: String, an: String, bv: String, bn: String) =
      s"CASE WHEN $an * $bn = 0 THEN 0.0 ELSE list_dot_product($av, $bv) / ($an * $bn) END"
    s"""WITH ct(tok, exp) AS (SELECT * FROM (VALUES $ctValues)),
       exc(eword, elemma) AS (SELECT * FROM (VALUES $lemmaExcValuesSql)),
       nlex AS ($nounLexiconCteSql)$extraCtes,
       p AS (
         SELECT CAST(p_partkey AS VARCHAR) AS ct_id, p_name AS ct_name,
                p_type AS def,
                coalesce(p_name || ' ' || p_brand || ' ' || p_type, p_name) AS all_text
         FROM part WHERE p_partkey <= 300
       ), ref0 AS (
         SELECT ct_id, ct_name, def, all_text,
                row_number() OVER (ORDER BY ct_id) AS ref_row_id
         FROM p
       ), rawq AS (
         SELECT DISTINCT source,
                array_to_string((string_split(text, ' '))[1:3], ' ') AS raw
         FROM documents
       ),
       ${cleanTokenStagesSql("qc", "rawq", Seq("source", "raw"), "raw", regexSplit = true)},
       qlab AS (
         SELECT r.source, r.raw, coalesce(l.lbl, '') AS cleaned
         FROM rawq r LEFT JOIN (
           SELECT source, raw, string_agg(ctok, ' ' ORDER BY pos) AS lbl
           FROM qc_rooted GROUP BY source, raw) l
           ON l.source = r.source AND l.raw = r.raw
       ),
       ${cleanTokenStagesSql("qe", "qlab", Seq("source", "raw"),
        "substr(cleaned, 1, 150)", regexSplit = false)},
       ${vecStages("qe", "qlab", Seq("source", "raw"))},
       ${cleanTokenStagesSql("re", "ref0", Seq("ct_id"),
        "substr(all_text, 1, 150)", regexSplit = false)},
       ${vecStages("re", "ref0", Seq("ct_id"))},
       ${cleanTokenStagesSql("rc", "ref0", Seq("ct_id"), "ct_name", regexSplit = true)},
       rclab AS (
         SELECT r.ct_id, coalesce(l.lbl, '') AS name_cleaned
         FROM ref0 r LEFT JOIN (
           SELECT ct_id, string_agg(ctok, ' ' ORDER BY pos) AS lbl
           FROM rc_rooted GROUP BY ct_id) l ON l.ct_id = r.ct_id
       ),
       qn AS (
         SELECT b.source, b.raw, b.cleaned, t.v,
                sqrt(list_dot_product(t.v, t.v)) AS qnrm
         FROM qlab b JOIN qe_vec t ON t.source = b.source AND t.raw = b.raw
       ), refn AS (
         SELECT r0.ct_id, r0.ct_name, r0.def, r0.all_text, r0.ref_row_id,
                c.name_cleaned, t.v,
                sqrt(list_dot_product(t.v, t.v)) AS nrm
         FROM ref0 r0
         JOIN re_vec t ON t.ct_id = r0.ct_id
         JOIN rclab c ON c.ct_id = r0.ct_id
       ), s AS (
         SELECT qn.source, qn.raw, qn.cleaned, r.ref_row_id,
                ${cos("qn.v", "qn.qnrm", "r.v", "r.nrm")} AS score
         FROM qn CROSS JOIN refn r
       ), rk AS (
         SELECT *, row_number() OVER (PARTITION BY source, raw
                     ORDER BY score DESC, ref_row_id ASC) AS rnk
         FROM s
       ), wide AS (
         SELECT source, raw, cleaned,
           max(CASE WHEN rnk = 1 THEN score END) AS sc1,
           max(CASE WHEN rnk = 1 THEN ref_row_id END) AS rid1,
           max(CASE WHEN rnk = 2 THEN score END) AS sc2,
           max(CASE WHEN rnk = 2 THEN ref_row_id END) AS rid2
         FROM rk WHERE rnk <= 2 GROUP BY source, raw, cleaned
       ), ex AS (
         SELECT ekey, eid, ename, edef FROM (
           SELECT name_cleaned AS ekey, ct_id AS eid, ct_name AS ename,
                  def AS edef,
                  row_number() OVER (PARTITION BY name_cleaned
                    ORDER BY ref_row_id ASC) AS ex_rn
           FROM refn)
         WHERE ex_rn = 1
       )
       SELECT w.source, w.raw AS raw_input_label, w.cleaned AS cleaned_input_label,
         CASE WHEN e.ekey IS NOT NULL THEN CAST(1.0 AS DOUBLE) ELSE w.sc1 END AS match_score_1,
         CASE WHEN e.ekey IS NOT NULL THEN e.eid ELSE r1.ct_id END AS matched_asctb_id_1,
         CASE WHEN e.ekey IS NOT NULL THEN e.ename ELSE r1.ct_name END AS matched_asctb_label_1,
         CASE WHEN e.ekey IS NOT NULL THEN e.edef ELSE r1.all_text END AS matched_asctb_text_1,
         CASE WHEN e.ekey IS NOT NULL THEN NULL ELSE w.sc2 END AS match_score_2,
         CASE WHEN e.ekey IS NOT NULL THEN NULL ELSE r2.ct_id END AS matched_asctb_id_2,
         CASE WHEN e.ekey IS NOT NULL THEN NULL ELSE r2.ct_name END AS matched_asctb_label_2,
         CASE WHEN e.ekey IS NOT NULL THEN NULL ELSE r2.all_text END AS matched_asctb_text_2
       FROM wide w
       LEFT JOIN ex e ON e.ekey = w.cleaned
       LEFT JOIN ref0 r1 ON r1.ref_row_id = w.rid1
       LEFT JOIN ref0 r2 ON r2.ref_row_id = w.rid2
       ORDER BY w.source, raw_input_label"""
  }

  /** The nested global regexp_replace chain of [[Scrub.piiPatterns]]
    * in application order, as SQL over `expr`. */
  private def piiRedactChainSql(expr: String): String =
    Scrub.piiPatterns.foldLeft(expr) {
      case (acc, (_, pat, ph)) => s"regexp_replace($acc, '$pat', '$ph', 'g')"
    }

  private def piiPlantListSql: String =
    piiPlants.map(p => s"'$p'").mkString("[", ", ", "]")

  /** q84 oracle GENERATED from [[Scrub.piiPatterns]] — counts via
    * regexp_extract_all on the raw text, redaction as the nested
    * global regexp_replace chain in application order. Same pattern
    * strings, same planted PII, both engines. */
  private def piiScrubOracle: String = {
    val plantList = piiPlantListSql
    val counts = Scrub.piiPatterns.map { case (cat, pat, _) =>
      s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$cat"
    }.mkString(",\n                ")
    val redacted = piiRedactChainSql("text")
    s"""WITH src AS (
         SELECT doc_id, text || ($plantList)[(doc_id % 7) + 1] AS text
         FROM documents
       )
       SELECT doc_id,
              $counts,
              $redacted AS scrubbed
       FROM src ORDER BY doc_id"""
  }

  /** q90 oracle — GENERATED from [[UrlOps.publicSuffixes]]: the same
    * host extraction, then eTLD+1 folding with the identical suffix
    * set inlined as an IN list. */
  private def registrableDomainOracle: String = {
    val sufs = UrlOps.publicSuffixes.toSeq.sorted
      .map(s => s"'$s'").mkString(", ")
    s"""WITH u AS (
         SELECT doc_id,
                (['https://ex', 'https://news.ex', 'https://WWW.ex',
                  'https://a.b.ex', 'https://ex', 'https://sub.ex'])[(doc_id % 6) + 1]
                  || CAST(doc_id % 20 AS VARCHAR)
                  || (['.com/p', '.co.uk/a', '.co.uk/b',
                      '.com.au/x', '.org/y', '.de/z'])[(doc_id % 6) + 1]
                  AS url
         FROM documents
       ), h AS (
         SELECT doc_id, url,
                regexp_replace(
                  lower(regexp_extract(
                    regexp_replace(regexp_replace(url, '#.*$$', '', 'g'),
                                   '\\?.*$$', '', 'g'),
                    '^([A-Za-z][A-Za-z0-9+.-]*)://([^/]*)(/.*)?$$', 2)),
                  '^www\\.', '', 'g') AS host
         FROM u
       ), l AS (
         SELECT doc_id, url, host, string_split(host, '.') AS toks
         FROM h
       )
       SELECT doc_id, url, host,
              CASE WHEN len(toks) <= 2 THEN host
                   WHEN toks[-2] || '.' || toks[-1] IN ($sufs)
                     THEN toks[-3] || '.' || toks[-2] || '.' || toks[-1]
                   ELSE toks[-2] || '.' || toks[-1] END AS registrable
       FROM l ORDER BY doc_id"""
  }

  /** q91 oracle — the same Morton interleave, generated as the
    * shift-mask chain (disjoint bit positions, so | is exact). */
  private def zOrderOracle: String = {
    val terms = (0 until 16).flatMap(i => Seq(
      s"(((user_id >> $i) & 1) << ${2 * i})",
      s"(((vm >> $i) & 1) << ${2 * i + 1})"))
    s"""WITH e AS (
         SELECT event_id, user_id,
                CAST(round(value * 1000) AS BIGINT) AS vm
         FROM events
       )
       SELECT event_id, user_id, vm AS value_milli,
              CAST(${terms.mkString(" | ")} AS BIGINT) AS z
       FROM e ORDER BY event_id"""
  }

  /** q85 oracle — the same strip-fragment/strip-query/lowercase/
    * www-drop/trailing-slash regex chain [[UrlOps]] applies, then the
    * two-level (canonical URL → domain) rollup. */
  private def urlRollupOracle: String = {
    val shp = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/]*)(/.*)?$"
    s"""WITH u AS (
         SELECT doc_id,
                (['https://', 'HTTPS://WWW.'])[(doc_id % 2) + 1]
                  || source || '.Example.COM/p/' || CAST(doc_id % 37 AS VARCHAR)
                  || (['', '/', '?utm_source=feed&id=9', '#section-2'])[(doc_id % 4) + 1]
                  AS url
         FROM documents
       ), c AS (
         SELECT doc_id,
                regexp_replace(regexp_replace(url, '#.*$$', '', 'g'),
                               '\\?.*$$', '', 'g') AS bare
         FROM u
       ), p AS (
         SELECT doc_id,
                lower(regexp_extract(bare, '$shp', 1)) AS scheme,
                regexp_replace(lower(regexp_extract(bare, '$shp', 2)),
                               '^www\\.', '', 'g') AS dom,
                regexp_replace(regexp_extract(bare, '$shp', 3), '/$$', '', 'g') AS path
         FROM c
       ), g AS (
         SELECT dom, scheme || '://' || dom || path AS curl,
                count(*) AS n, min(doc_id) AS keeper
         FROM p GROUP BY dom, scheme || '://' || dom || path
       )
       SELECT dom AS domain, CAST(count(*) AS BIGINT) AS n_urls,
              CAST(sum(n) AS BIGINT) AS n_docs,
              CAST(sum(n - 1) AS BIGINT) AS n_removed
       FROM g GROUP BY dom ORDER BY domain"""
  }

  /** q98 oracle — the composed round-8 pipeline: the q84 redact
    * chain, the q85 canonicalization regex chain, the q94 entropy
    * arithmetic, the q88 chunk windows and the q87 shard hash, all
    * generated from the same shared data/builders as their individual
    * oracles. */
  private def curationPipelineV2Oracle: String = {
    val shp = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/]*)(/.*)?$"
    s"""WITH src AS (
         SELECT doc_id,
                text || ($piiPlantListSql)[(doc_id % 7) + 1] AS text,
                (['https://', 'HTTPS://WWW.'])[(doc_id % 2) + 1]
                  || source || '.Example.COM/p/' || CAST(doc_id % 37 AS VARCHAR)
                  || (['', '/', '?utm_source=feed&id=9', '#section-2'])[(doc_id % 4) + 1]
                  AS url
         FROM documents
       ), scr AS (
         SELECT doc_id, url, ${piiRedactChainSql("text")} AS scrubbed
         FROM src
       ), bare AS (
         SELECT doc_id, scrubbed,
                regexp_replace(regexp_replace(url, '#.*$$', '', 'g'),
                               '\\?.*$$', '', 'g') AS b
         FROM scr
       ), canon AS (
         SELECT doc_id, scrubbed,
                lower(regexp_extract(b, '$shp', 1)) || '://'
                  || regexp_replace(lower(regexp_extract(b, '$shp', 2)),
                                    '^www\\.', '', 'g')
                  || regexp_replace(regexp_extract(b, '$shp', 3), '/$$', '', 'g')
                  AS curl
         FROM bare
       ), kept AS (
         SELECT doc_id, scrubbed FROM (
           SELECT doc_id, scrubbed,
                  row_number() OVER (PARTITION BY curl ORDER BY doc_id) AS rn
           FROM canon)
         WHERE rn = 1
       ), ch AS (
         SELECT doc_id, unnest(regexp_extract_all(scrubbed, '.')) AS c
         FROM kept
       ), cnt AS (
         SELECT doc_id, c, CAST(count(*) AS BIGINT) AS k
         FROM ch GROUP BY doc_id, c
       ), tot AS (
         SELECT doc_id, c, k, sum(k) OVER (PARTITION BY doc_id) AS n
         FROM cnt
       ), ent AS (
         SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_chars,
                CAST(sum(CAST(round(-ln(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6)
                              AS BIGINT) * k) AS BIGINT) AS ent_micros
         FROM tot GROUP BY doc_id
       ), gated AS (
         SELECT k.doc_id, k.scrubbed
         FROM kept k JOIN ent e USING (doc_id)
         WHERE e.n_chars >= 100 AND e.ent_micros >= 2800000 * e.n_chars
       ), tk AS (
         SELECT doc_id,
                list_filter(string_split_regex(scrubbed, '\\s+'), t -> t <> '') AS toks
         FROM gated
       ), wnd AS (
         SELECT doc_id, toks, len(toks) AS n,
                unnest([s for s in range(0, greatest(len(toks), 1), 24) if s < len(toks)]) AS s
         FROM tk
       ), chunks AS (
         SELECT doc_id * 1000 + s // 24 AS chunk_uid, doc_id,
                CAST(s // 24 AS BIGINT) AS chunk_id,
                CAST(least(32, n - s) AS BIGINT) AS n_tok
         FROM wnd
       ), h AS (
         SELECT chunk_uid, doc_id, chunk_id, n_tok,
                ('0x' || substr(md5('order:' || CAST(chunk_uid AS VARCHAR)), 1, 14))::BIGINT AS hk
         FROM chunks
       )
       SELECT chunk_uid, doc_id, chunk_id, n_tok, hk % 16 AS shard,
              CAST(row_number() OVER (PARTITION BY hk % 16 ORDER BY hk, chunk_uid)
                   AS BIGINT) AS pos
       FROM h ORDER BY chunk_uid"""
  }

  /** q100 oracle — the batch replay of the streaming ingest chain:
    * same staged union, same redact chain and counts, same length
    * gate, first-arrival (version, doc_id) dedup on the scrubbed
    * digest. */
  private def streamIngestOracle: String = {
    val counts = Scrub.piiPatterns.map { case (_, pat, _) =>
      s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT)"
    }.mkString(" + ")
    s"""WITH v0 AS (
         SELECT doc_id, CAST(0 AS BIGINT) AS version, text FROM documents
       ), v1 AS (
         SELECT doc_id, CAST(1 AS BIGINT) AS version,
                text || ($piiPlantListSql)[(doc_id % 7) + 1] AS text
         FROM documents WHERE doc_id % 4 = 0
         UNION ALL
         SELECT doc_id, CAST(1 AS BIGINT), text
         FROM documents WHERE doc_id % 6 = 0 AND doc_id % 4 <> 0
       ), u AS (SELECT * FROM v0 UNION ALL SELECT * FROM v1
       ), scr AS (
         SELECT doc_id, version,
                ${piiRedactChainSql("text")} AS scrubbed,
                $counts AS n_redactions
         FROM u
       ), f AS (SELECT * FROM scr WHERE len(scrubbed) >= 50
       ), r AS (
         SELECT doc_id, version, md5(scrubbed) AS text_md5, n_redactions,
                row_number() OVER (PARTITION BY md5(scrubbed)
                  ORDER BY version, doc_id) AS rn
         FROM f
       )
       SELECT doc_id, version, text_md5, n_redactions
       FROM r WHERE rn = 1 ORDER BY doc_id, version"""
  }

  /** The vendored contraction table as DuckDB VALUES — both engines
    * evaluate the identical map. */
  private def expandContractionsOracle: String = {
    val values = graft.functions.TextNlp.contractionsMap.toSeq.sorted
      .map { case (k, v) =>
        s"('${k.replace("'", "''")}', '${v.replace("'", "''")}')"
      }.mkString(", ")
    s"""WITH src AS (
         SELECT doc_id, text || ' Don''t i''m o''clock' AS text FROM documents
       ), ct(tok, exp) AS (SELECT * FROM (VALUES $values)),
       toks AS (
         SELECT doc_id,
                unnest(string_split(text, ' ')) AS tok,
                unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
         FROM src
       )
       SELECT t.doc_id,
              string_agg(coalesce(ct.exp, t.tok), ' ' ORDER BY t.pos) AS expanded
       FROM toks t LEFT JOIN ct ON ct.tok = t.tok
       GROUP BY t.doc_id ORDER BY doc_id"""
  }

  /** SQL specification of TextNlp.getRootWord: exception VALUES (the
    * vendored noun_exceptions resource) + the morphy rule chain (CASE
    * in rule order with the strict length guard) + rtrim('s'). Both
    * sides derive from the SAME Scala data, so the oracle checks the
    * JVM implementation against its spec, not a re-keyed copy. */
  private def lemmatizeOracle: String =
    s"""WITH toks AS (
         SELECT doc_id,
                unnest(string_split(text, ' ')) AS raw,
                unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos1
         FROM documents
       ), w AS (
         SELECT doc_id, CAST(pos1 - 1 AS BIGINT) AS pos, lower(raw) AS word
         FROM toks WHERE regexp_matches(raw, '^[A-Za-z]+$$')
       ), exc(eword, elemma) AS (SELECT * FROM (VALUES $lemmaExcValuesSql)),
       nlex AS ($nounLexiconCteSql),
       lem AS (
         SELECT w.doc_id, w.pos, w.word,
           coalesce(e.elemma, ${morphyCaseSql("word")}) AS lemma
         FROM w CROSS JOIN nlex LEFT JOIN exc e ON e.eword = w.word
       )
       SELECT doc_id, pos, word, rtrim(lemma, 's') AS root
       FROM lem ORDER BY doc_id, pos"""

  /** Full cleanLabel pipeline in SQL — the composition of every step
    * the q41/q42/q43 oracles prove individually, in cleanToken's
    * exact order (`nlp_preprocessing.py:42-70`): whitespace-split
    * (empties dropped, python no-arg split) → contraction map →
    * strip non-alphanumerics → number-to-words on all-digit tokens →
    * lowercase → exception/morphy lemma → rstrip 's' → re-join.
    * Converts q23 from rows-only to hash-checked. */
  private def nlpCleanOracle: String = {
    val ctValues = graft.functions.TextNlp.contractionsMap.toSeq.sorted
      .map { case (k, v) =>
        s"('${k.replace("'", "''")}', '${v.replace("'", "''")}')"
      }.mkString(", ")
    s"""WITH src AS (
         SELECT doc_id, substr(text, 1, 60) AS t FROM documents
       ), toks AS (
         SELECT doc_id,
                unnest(string_split_regex(t, '\\s+')) AS raw,
                unnest(range(1, len(string_split_regex(t, '\\s+')) + 1)) AS pos
         FROM src
       ), nz AS (
         SELECT doc_id, pos, raw FROM toks WHERE raw <> ''
       ), ct(tok, exp) AS (SELECT * FROM (VALUES $ctValues)),
       al AS (
         SELECT nz.doc_id, nz.pos,
                regexp_replace(coalesce(ct.exp, nz.raw), '[^a-zA-Z0-9]', '', 'g') AS alnum
         FROM nz LEFT JOIN ct ON ct.tok = nz.raw
       ), lowered AS (
         SELECT doc_id, pos,
                lower(CASE WHEN regexp_matches(alnum, '^[0-9]+$$')
                           THEN ${numberWordsSql("CAST(alnum AS BIGINT)")}
                           ELSE alnum END) AS word
         FROM al
       ), exc(eword, elemma) AS (SELECT * FROM (VALUES $lemmaExcValuesSql)),
       nlex AS ($nounLexiconCteSql),
       rooted AS (
         SELECT l.doc_id, l.pos,
                rtrim(coalesce(e.elemma, ${morphyCaseSql("l.word")}), 's') AS root
         FROM lowered l CROSS JOIN nlex LEFT JOIN exc e ON e.eword = l.word
       ), agg AS (
         SELECT doc_id, string_agg(root, ' ' ORDER BY pos) AS cleaned
         FROM rooted GROUP BY doc_id
       )
       SELECT s.doc_id,
              CASE WHEN s.t IS NULL THEN NULL
                   ELSE coalesce(a.cleaned, '') END AS cleaned
       FROM src s LEFT JOIN agg a USING (doc_id)
       ORDER BY s.doc_id"""
  }

  // --- NLP oracle builders: SQL twins GENERATED from TextNlp's own
  // --- word tables / rule lists, so the spec can never drift ---------

  private def below100Sql(e: String): String = {
    val onesList = graft.functions.TextNlp.ones.map(w => s"'$w'").mkString("[", ", ", "]")
    val tensList = graft.functions.TextNlp.tens.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""CASE WHEN ($e) < 20 THEN ($onesList)[($e) + 1]
            WHEN ($e) % 10 = 0 THEN ($tensList)[($e) // 10 + 1]
            ELSE ($tensList)[($e) // 10 + 1] || '-' || ($onesList)[($e) % 10 + 1] END"""
  }

  private def below1000Sql(e: String): String = {
    val onesList = graft.functions.TextNlp.ones.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""CASE WHEN ($e) < 100 THEN ${below100Sql(e)}
            WHEN ($e) % 100 = 0 THEN ($onesList)[($e) // 100 + 1] || ' hundred'
            ELSE ($onesList)[($e) // 100 + 1] || ' hundred and ' || ${below100Sql(s"($e) % 100")} END"""
  }

  /** Full number formatter for values < 10^(3·maxGroups): scale-group
    * decomposition with num2words' join rules — ", " between scale
    * groups, " and " before a final sub-100 group. Scale words come
    * from TextNlp.scales. */
  private def numberWordsSql(n: String, maxGroups: Int = 5): String = {
    val groupClauses = ((maxGroups - 1) to 1 by -1).map { k =>
      val div = "1" + "000" * k
      val divHigher = "1" + "000" * (k + 1)
      val g = s"($n) // $div % 1000"
      val scale = graft.functions.TextNlp.scales(k)
      s"""(CASE WHEN $g > 0
               THEN (CASE WHEN ($n) // $divHigher > 0 THEN ', ' ELSE '' END)
                    || ${below1000Sql(g)} || ' $scale' ELSE '' END)"""
    }
    val rest =
      s"""(CASE WHEN ($n) % 1000 > 0
              THEN (CASE WHEN ($n) % 1000 < 100 THEN ' and ' ELSE ', ' END)
                   || ${below1000Sql(s"($n) % 1000")} ELSE '' END)"""
    s"""CASE WHEN ($n) < 1000 THEN ${below1000Sql(n)}
        ELSE ${(groupClauses :+ rest).mkString(" || ")} END"""
  }

  /** One-row CTE body holding the vendored noun lexicon as a DuckDB
    * list — cross-joined so [[morphyCaseSql]]'s validation step can
    * probe it without repeating the literal per rule. */
  private def nounLexiconCteSql: String =
    graft.functions.TextNlp.nounLexicon.toSeq.sorted
      .map(w => s"'$w'").mkString("SELECT [", ", ", "] AS ws")

  /** Morphy rule chain with candidate validation, as a CASE in rule
    * order — applied to `word` when the exception lookup missed.
    * First tier: the first rule whose candidate is in the vendored
    * noun lexicon (`list_contains` against the `ws` list from
    * [[nounLexiconCteSql]]'s CTE). Fallback tier: the first
    * APPLICABLE rule's candidate with the strict length guard —
    * exactly TextNlp.lemmatize's two-tier order. */
  private def morphyCaseSql(word: String): String = {
    def cand(suf: String, rep: String) =
      s"substr($word, 1, len($word) - ${suf.length}) || '$rep'"
    def applicable(suf: String) =
      s"len($word) > ${suf.length} AND $word LIKE '%$suf'"
    val validatedCases = graft.functions.TextNlp.morphyRules.map { case (suf, rep) =>
      s"WHEN ${applicable(suf)} AND list_contains(ws, ${cand(suf, rep)}) " +
        s"THEN ${cand(suf, rep)}"
    }.mkString(" ")
    val fallbackCases = graft.functions.TextNlp.morphyRules.map { case (suf, rep) =>
      s"WHEN ${applicable(suf)} THEN ${cand(suf, rep)}"
    }.mkString(" ")
    s"CASE $validatedCases ELSE (CASE $fallbackCases ELSE $word END) END"
  }

  private def lemmaExcValuesSql: String =
    graft.functions.TextNlp.lemmaExceptions.toSeq.sorted
      .map { case (k, v) => s"('$k', '$v')" }.mkString(", ")

  private def numberWordsOracle: String =
    s"""SELECT doc_id,
         ${numberWordsSql("doc_id")} AS w_small,
         ${numberWordsSql("doc_id * 12345 + 678")} AS w_large
       FROM documents ORDER BY doc_id"""

  private def sessionizeOracle: String =
    """WITH x AS (
         SELECT user_id, ts, value,
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
         FROM events
       ), y AS (
         SELECT user_id, ts, value,
                CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                     THEN 1 ELSE 0 END AS ns
         FROM x
       ), z AS (
         SELECT user_id, ts, value,
                CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         FROM y
       )
       SELECT user_id, session_id, count(*) AS n_events,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
              strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
              CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
       FROM z GROUP BY user_id, session_id ORDER BY user_id, session_id"""

  private def ivfOracle: String =
    s"""$embCte,
       cent AS (SELECT vec_id AS cell, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 12),
       assign AS (
         SELECT vec_id, cell FROM (
           SELECT nn.vec_id, cent.cell,
                  row_number() OVER (PARTITION BY nn.vec_id ORDER BY
                    ${cosSql("nn.v", "nn.nrm", "cent.cv", "cent.cnrm")} DESC,
                    cent.cell ASC) AS rn
           FROM n nn CROSS JOIN cent)
         WHERE rn = 1
       ),
       q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id % 100 = 0),
       probes AS (
         SELECT q_id, cell FROM (
           SELECT q.q_id, cent.cell,
                  row_number() OVER (PARTITION BY q.q_id ORDER BY
                    ${cosSql("q.qv", "q.qnrm", "cent.cv", "cent.cnrm")} DESC,
                    cent.cell ASC) AS rn
           FROM q CROSS JOIN cent)
         WHERE rn <= 3
       ),
       cand AS (
         SELECT q.q_id, c.vec_id AS c_id,
                ${cosSql("q.qv", "q.qnrm", "c.v", "c.nrm")} AS score
         FROM probes p
         JOIN assign a ON a.cell = p.cell
         JOIN n c ON c.vec_id = a.vec_id
         JOIN q ON q.q_id = p.q_id
       )
       SELECT q_id, CAST(rnk AS BIGINT) AS "rank", c_id, score FROM (
         SELECT q_id, c_id, score,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id ASC) AS rnk
         FROM cand)
       WHERE rnk <= 5 ORDER BY q_id, rnk"""

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
           count(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
         FROM lineitem
         WHERE l_discount > 0.05 AND l_quantity < 25
           AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         ORDER BY l_orderkey, l_linenumber""",
    "q03_join_agg" ->
      """SELECT c_mktsegment,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           count(DISTINCT o_orderkey) AS n_orders,
           count(*) AS n_items
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY c_mktsegment
         ORDER BY c_mktsegment""",
    "q04_dim_broadcast_join" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name
         ORDER BY r_name, n_name""",
    "q05_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 150000)
         ORDER BY c_custkey""",
    "q06_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q07_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders)
         WHERE rn <= 3
         ORDER BY o_custkey, rn""",
    "q08_pivot" ->
      """SELECT o_orderstatus,
           count(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
           count(*) FILTER (o_orderpriority = '2-HIGH') AS n_high,
           count(*) FILTER (o_orderpriority = '3-MEDIUM') AS n_medium,
           count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS n_not_specified,
           count(*) FILTER (o_orderpriority = '5-LOW') AS n_low
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q09_setops" ->
      """SELECT 'both' AS tag, nationkey FROM
           (SELECT c_nationkey AS nationkey FROM customer
            INTERSECT SELECT s_nationkey FROM supplier)
         UNION ALL
         SELECT 'cust_only' AS tag, nationkey FROM
           (SELECT c_nationkey AS nationkey FROM customer
            EXCEPT SELECT s_nationkey FROM supplier)
         UNION ALL
         SELECT 'supp_only' AS tag, nationkey FROM
           (SELECT s_nationkey AS nationkey FROM supplier
            EXCEPT SELECT c_nationkey FROM customer)
         ORDER BY tag, nationkey""",
    "q10_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'discount' AS metric, l_discount AS value FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'quantity', l_quantity FROM lineitem
         ORDER BY l_orderkey, l_linenumber, metric""",
    "q11_impute_sentinels" ->
      """SELECT doc_id,
           coalesce(nullif(source, 'src0'), 'UNK') AS src_imputed,
           CASE WHEN lang = 'zh' THEN 'Unknown' ELSE lang END AS lang_display
         FROM documents ORDER BY doc_id""",
    "q12_string_funcs" ->
      """SELECT p_partkey,
           lower(regexp_replace(p_name, '[^a-zA-Z0-9]', '', 'g')) AS name_alnum,
           substr(p_type, 1, 10) AS type_prefix,
           p_brand || ' ' || p_type AS brand_type,
           regexp_replace(p_brand, '#', '_', 'g') AS brand_underscore
         FROM part ORDER BY p_partkey""",
    "q13_json_extract" ->
      """SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
         FROM events ORDER BY event_id""",
    "q14_hourly_rollup" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
           event_type, count(*) AS n_events,
           CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
         FROM events
         GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q15_dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY md5(text) ORDER BY text_md5""",
    "q16_fingerprint" ->
      """SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
         FROM documents ORDER BY doc_id""",
    "q17_quality_metrics" -> qualityOracle,
    "q18_language_id" -> langIdOracle,
    "q19_token_stats" ->
      """SELECT doc_id,
           CAST(len(string_split_regex(text, '\s+')) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]{1,4}|[0-9]{1,3}|[^a-zA-Z0-9\s]')) AS INTEGER) AS subword_tokens,
           round(CAST(length(text) AS DOUBLE)
             / CAST(greatest(len(string_split_regex(text, '\s+')), 1) AS DOUBLE), 6) AS chars_per_ws_token
         FROM documents ORDER BY doc_id""",
    "q20_minhash_signatures" -> minhashOracle,
    "q21_simhash" -> simhashOracle,
    "q22_ngram_jaccard" -> jaccardOracle,
    "q25_knn_bruteforce" -> knnOracle,
    "q145_semantic_decontaminate" -> semanticDecontaminateOracle,
    "q99_hard_negatives" -> hardNegativesOracle,
    "q26_lsh_buckets" -> lshBucketsOracle,
    "q27_lsh_neardup" -> lshNearDupOracle,
    "q28_minhash_lsh_pairs" -> minhashLshPairsOracle,
    "q29_stream_rollup" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
           event_type, count(*) AS n_events,
           CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
         FROM events
         GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q30_sessionize" -> sessionizeOracle,
    "q31_binary_meta" ->
      """SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_md5,
           substr(hex(encode(text)), 1, 8) AS magic_hex,
           CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_frames
         FROM documents ORDER BY doc_id""",
    "q32_ivf_topk" -> ivfOracle,
    "q33_sliding_window" ->
      """WITH s AS (
           SELECT event_type,
                  to_timestamp(CAST((epoch_us(ts) // 1800000000) * 1800 AS BIGINT)) AS t0
           FROM events
         ), u AS (
           SELECT event_type, unnest([t0, t0 - INTERVAL 30 MINUTE]) AS ws FROM s
         )
         SELECT strftime(ws, '%Y-%m-%d %H:%M') AS win_start, event_type,
                count(*) AS n_events
         FROM u GROUP BY 1, 2 ORDER BY win_start, event_type""",
    "q34_venn_counts" ->
      """WITH a AS (SELECT DISTINCT c_nationkey AS k FROM customer),
           b AS (SELECT DISTINCT s_nationkey AS k FROM supplier),
           c AS (SELECT DISTINCT n_nationkey AS k FROM nation WHERE n_regionkey <= 2),
           u AS (
             SELECT coalesce(a.k IS NOT NULL, false) AS ia,
                    coalesce(b.k IS NOT NULL, false) AS ib,
                    coalesce(c.k IS NOT NULL, false) AS ic
             FROM a FULL JOIN b USING (k) FULL JOIN c USING (k))
         SELECT CASE WHEN ia AND ib AND ic THEN 'abc'
                     WHEN ia AND ib THEN 'ab_only'
                     WHEN ia AND ic THEN 'ac_only'
                     WHEN ib AND ic THEN 'bc_only'
                     WHEN ia THEN 'a_only'
                     WHEN ib THEN 'b_only'
                     ELSE 'c_only' END AS region, count(*) AS n
         FROM u GROUP BY 1 ORDER BY region""",
    "q36_sql_native_funcs" ->
      """SELECT vec_id,
           list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS sq_norm,
           CAST(2 AS INTEGER) AS n_shingles,
           array_to_string(list_transform(range(0, 4), b ->
             CAST(len(list_filter(range(0, vec_id % 7 + 1), i -> i % 4 = b)) AS BIGINT)), ',')
             AS bucket_hist
         FROM embeddings ORDER BY vec_id""",
    "q37_wrangle_sheet" ->
      """WITH t1 AS (
           SELECT p_name AS CT_NAME,
                  CASE WHEN p_partkey % 7 = 0 THEN NULL
                       ELSE CAST(p_partkey AS VARCHAR) END AS CT_ID,
                  p_brand AS CT_LABEL
           FROM part
         ), t2 AS (
           SELECT CASE WHEN p_partkey % 13 = 0 THEN NULL ELSE p_type END,
                  CASE WHEN p_partkey % 13 = 0 THEN NULL
                       ELSE CAST(p_size AS VARCHAR) END,
                  CASE WHEN p_partkey % 13 = 0 THEN NULL ELSE p_brand END
           FROM part
         ), u AS (
           SELECT * FROM t1 UNION ALL SELECT * FROM t2
         ), f AS (
           SELECT DISTINCT * FROM u
           WHERE NOT (CT_NAME IS NULL AND CT_ID IS NULL AND CT_LABEL IS NULL)
         )
         SELECT coalesce(CT_ID, 'ASCTB CT_ID UNK') AS CT_ID, CT_NAME, CT_LABEL
         FROM f ORDER BY CT_ID, CT_NAME, CT_LABEL""",
    "q38_simhash_neardup" -> simhashNearDupOracle,
    "q51_simhash_capped" -> simhashCappedOracle,
    "q39_stream_upsert" ->
      """WITH v0 AS (SELECT doc_id, 0 AS version, text FROM documents),
         v1 AS (SELECT doc_id, 1 AS version, text || ' v1' AS text
                FROM documents WHERE doc_id % 5 = 0),
         v2 AS (SELECT doc_id, 2 AS version, text || ' v2' AS text
                FROM documents WHERE doc_id % 7 = 0),
         allv AS (SELECT * FROM v0 UNION ALL SELECT * FROM v1 UNION ALL SELECT * FROM v2),
         win AS (SELECT doc_id, version, text,
                   row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn
                 FROM allv)
         SELECT doc_id, CAST(version AS BIGINT) AS version,
                md5(text) AS content_md5, CAST(64 AS BIGINT) AS emb_dim
         FROM win WHERE rn = 1 ORDER BY doc_id""",
    "q24_label_match_report" -> labelMatchHashedOracle,
    "q84_pii_scrub" -> piiScrubOracle,
    "q85_url_rollup" -> urlRollupOracle,
    "q90_registrable_domain" -> registrableDomainOracle,
    "q91_zorder_key" -> zOrderOracle,
    "q92_global_ordinals" ->
      """SELECT doc_id, source,
                CAST(row_number() OVER (ORDER BY source, doc_id) AS BIGINT)
                  AS ordinal
         FROM documents ORDER BY doc_id""",
    "q95_stream_late_data" ->
      """WITH e AS (
           SELECT event_id, epoch_us(ts) AS ts_us, event_type FROM events
         ), b AS (
           SELECT min(ts_us) AS mn, max(ts_us) AS mx FROM e
         ), keep AS (
           SELECT e.* FROM e, b
           WHERE NOT (event_id % 11 = 0 AND ts_us < mn + (mx - mn) / 2)
         ), wm AS (
           -- the engine tracks event time in milliseconds: watermark =
           -- ms-truncated max minus the delay
           SELECT (mx // 1000) * 1000 - 600000000 AS w FROM b
         )
         SELECT (ts_us // 3600000000) * 3600000000 AS win_start_us,
                event_type, CAST(count(*) AS BIGINT) AS n_events
         FROM keep, wm
         WHERE (ts_us // 3600000000) * 3600000000 + 3600000000 <= w
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q94_char_entropy" ->
      """WITH ch AS (
           SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS c
           FROM documents
         ), cnt AS (
           SELECT doc_id, c, CAST(count(*) AS BIGINT) AS k
           FROM ch GROUP BY doc_id, c
         ), tot AS (
           SELECT doc_id, c, k, sum(k) OVER (PARTITION BY doc_id) AS n
           FROM cnt
         )
         SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_chars,
                CAST(sum(CAST(round(-ln(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6)
                              AS BIGINT) * k) AS BIGINT) AS entropy_micros
         FROM tot GROUP BY doc_id ORDER BY doc_id""",
    "q93_stream_scd2" ->
      """WITH x AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                  CAST(round(value * 1000) AS BIGINT) AS value_milli
           FROM events
           WHERE event_type IN ('signup', 'purchase')
         ), iv AS (
           SELECT user_id, event_id, ts_us AS valid_from,
                  lead(ts_us) OVER w AS valid_to, value_milli
           FROM x
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         )
         SELECT user_id, event_id, valid_from, valid_to, value_milli
         FROM iv WHERE valid_to IS NOT NULL
         ORDER BY user_id, valid_from, event_id""",
    "q86_unigram_logprob" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
           FROM documents
         ), nz AS (SELECT * FROM toks WHERE tok <> ''
         ), per_doc AS (
           SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
           FROM nz GROUP BY doc_id, tok
         ), freq AS (
           SELECT tok, CAST(sum(c) AS BIGINT) AS f FROM per_doc GROUP BY tok
         ), total AS (SELECT CAST(sum(f) AS BIGINT) AS n FROM freq)
         SELECT p.doc_id,
                CAST(sum(p.c) AS BIGINT) AS n_tokens,
                CAST(sum(CAST(round(ln(CAST(f.f AS DOUBLE) / CAST(t.n AS DOUBLE)) * 1e6)
                              AS BIGINT) * p.c) AS BIGINT) AS logprob_micros
         FROM per_doc p JOIN freq f USING (tok) CROSS JOIN total t
         GROUP BY p.doc_id ORDER BY p.doc_id""",
    "q89_stream_static_join" ->
      """SELECT c_mktsegment, event_type,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
         FROM events e JOIN customer c ON c.c_custkey = e.user_id % 150 + 1
         GROUP BY c_mktsegment, event_type
         ORDER BY c_mktsegment, event_type""",
    "q88_chunking" ->
      """WITH d AS (
           SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks
           FROM documents
         ), w AS (
           SELECT doc_id, toks, len(toks) AS n,
                  unnest([s for s in range(0, greatest(len(toks), 1), 24) if s < len(toks)]) AS s
           FROM d
         )
         SELECT doc_id,
                CAST(s // 24 AS BIGINT) AS chunk_id,
                CAST(s AS BIGINT) AS start_tok,
                CAST(least(32, n - s) AS BIGINT) AS n_tok,
                array_to_string(toks[s + 1 : s + 32], ' ') AS chunk_text
         FROM w ORDER BY doc_id, chunk_id""",
    "q87_shard_order" ->
      """WITH h AS (
           SELECT doc_id, source,
                  ('0x' || substr(md5('order:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT AS hk
           FROM documents
         )
         SELECT doc_id, source, hk % 16 AS shard,
                CAST(row_number() OVER (PARTITION BY hk % 16 ORDER BY hk, doc_id)
                     AS BIGINT) AS pos
         FROM h ORDER BY doc_id""",
    "q40_label_match_frozen" -> labelMatchFrozenOracle,
    "q41_expand_contractions" -> expandContractionsOracle,
    "q42_lemmatize" -> lemmatizeOracle,
    "q43_number_words" -> numberWordsOracle,
    "q45_minhash_capped" -> minhashCappedPairsOracle,
    "q53_duplicate_clusters" -> duplicateClustersOracle,
    "q56_heavy_hitters" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS cnt
         FROM (SELECT unnest(string_split_regex(text, '\s+')) AS token
               FROM documents)
         GROUP BY token ORDER BY cnt DESC, token""",
    "q57_asof_join" ->
      """WITH l AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
           FROM events WHERE event_type = 'purchase'
         ), r AS (
           SELECT user_id AS r_uid, epoch_us(ts) AS click_ts_us,
                  max(value) AS click_val
           FROM events WHERE event_type = 'click' GROUP BY 1, 2
         )
         SELECT l.event_id, l.user_id, l.ts_us, l.value,
                r.click_ts_us, r.click_val
         FROM l ASOF LEFT JOIN r
           ON l.user_id = r.r_uid AND l.ts_us >= r.click_ts_us
         ORDER BY l.event_id""",
    "q98_curation_pipeline_v2" -> curationPipelineV2Oracle,
    "q100_stream_ingest" -> streamIngestOracle,
    "q101_stream_ewma" ->
      """WITH RECURSIVE x AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                  CAST(value AS DOUBLE) AS x
           FROM events WHERE event_type IN ('signup', 'purchase')
         ), seq AS (
           SELECT *, row_number() OVER (PARTITION BY user_id
                       ORDER BY ts_us, event_id) AS rn
           FROM x
         ), ew AS (
           SELECT user_id, event_id, ts_us, rn, x, x AS ewma
           FROM seq WHERE rn = 1
           UNION ALL
           SELECT q.user_id, q.event_id, q.ts_us, q.rn, q.x,
                  ew.ewma * 0.75 + q.x * 0.25
           FROM seq q JOIN ew ON q.user_id = ew.user_id AND q.rn = ew.rn + 1
         )
         SELECT user_id, event_id, ts_us, ewma
         FROM ew ORDER BY user_id, ts_us, event_id""",
    "q102_countmin" ->
      """WITH toks AS (
           SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
           FROM documents
         ), freq AS (
           SELECT tok, CAST(count(*) AS BIGINT) AS f
           FROM toks WHERE tok <> '' GROUP BY tok
         ), cells AS (
           SELECT tok, f, h,
                  ('0x' || substr(md5('cms:' || CAST(h AS VARCHAR) || ':' || tok),
                                  1, 14))::BIGINT % 16 AS bucket
           FROM freq CROSS JOIN (SELECT unnest(range(0, 4)) AS h)
         ), sketch AS (
           SELECT h, bucket, CAST(sum(f) AS BIGINT) AS cnt
           FROM cells GROUP BY h, bucket
         ), est AS (
           SELECT c.tok, c.f, min(s.cnt) AS est
           FROM cells c JOIN sketch s USING (h, bucket)
           GROUP BY c.tok, c.f
         )
         SELECT tok, f, CAST(est AS BIGINT) AS est,
                CAST(est - f AS BIGINT) AS overcount
         FROM est ORDER BY tok""",
    "q103_bloom_decontaminate" ->
      """WITH w AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS words FROM documents
         ), sh AS (
           SELECT doc_id, unnest(
             CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                  ELSE [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]
             END) AS shingle
           FROM w
         ), shd AS (
           SELECT DISTINCT doc_id, shingle FROM sh
         ), ev AS (
           SELECT DISTINCT shingle FROM shd WHERE doc_id % 97 = 0
         ), tr AS (
           SELECT doc_id, shingle FROM shd WHERE doc_id % 97 <> 0
         ), hs AS (
           SELECT unnest(range(0, 3)) AS h
         ), bloom AS (
           SELECT DISTINCT
             ('0x' || substr(md5('bloom:' || CAST(h AS VARCHAR) || ':' || shingle),
                             1, 14))::BIGINT % 1024 AS pos
           FROM ev CROSS JOIN hs
         ), probe AS (
           SELECT t.doc_id, t.shingle,
             ('0x' || substr(md5('bloom:' || CAST(h AS VARCHAR) || ':' || t.shingle),
                             1, 14))::BIGINT % 1024 AS pos
           FROM tr t CROSS JOIN hs
         ), hit AS (
           SELECT doc_id, shingle, count(b.pos) = 3 AS maybe
           FROM probe p LEFT JOIN bloom b USING (pos)
           GROUP BY doc_id, shingle
         )
         SELECT h.doc_id,
                CAST(count(*) AS BIGINT) AS n_sh,
                CAST(sum(CASE WHEN h.maybe THEN 1 ELSE 0 END) AS BIGINT) AS bloom_hits,
                CAST(sum(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS exact_hits
         FROM hit h LEFT JOIN ev e ON e.shingle = h.shingle
         GROUP BY h.doc_id ORDER BY h.doc_id""",
    "q142_stream_decontaminate" ->
      """WITH w AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS words FROM documents
         ), sh AS (
           SELECT doc_id, unnest(
             CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                  ELSE [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]
             END) AS shingle
           FROM w
         ), shd AS (
           SELECT DISTINCT doc_id, shingle FROM sh
         ), ev AS (
           SELECT DISTINCT shingle FROM shd WHERE doc_id % 97 = 0
         ), tr AS (
           SELECT doc_id, shingle FROM shd WHERE doc_id % 97 <> 0
         ), hs AS (
           SELECT unnest(range(0, 3)) AS h
         ), bloom AS (
           SELECT DISTINCT
             ('0x' || substr(md5('sdecon:' || CAST(h AS VARCHAR) || ':' || shingle),
                             1, 14))::BIGINT % 1024 AS pos
           FROM ev CROSS JOIN hs
         ), probe AS (
           SELECT t.doc_id, t.shingle,
             ('0x' || substr(md5('sdecon:' || CAST(h AS VARCHAR) || ':' || t.shingle),
                             1, 14))::BIGINT % 1024 AS pos
           FROM tr t CROSS JOIN hs
         ), hit AS (
           SELECT doc_id, shingle, count(b.pos) = 3 AS maybe
           FROM probe p LEFT JOIN bloom b USING (pos)
           GROUP BY doc_id, shingle
         ), agg AS (
           SELECT doc_id,
                  CAST(count(*) AS BIGINT) AS n_sh,
                  CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS bloom_hits
           FROM hit GROUP BY doc_id
         )
         SELECT doc_id, CAST((doc_id // 20) % 2 AS BIGINT) AS wave,
                n_sh, bloom_hits, bloom_hits >= 1 AS flagged
         FROM agg ORDER BY doc_id""",
    "q143_stream_bloom_dedup" ->
      """WITH d0 AS (
           SELECT CAST(0 AS BIGINT) AS wave, doc_id, text FROM documents
         ), d1 AS (
           SELECT CAST(1 AS BIGINT) AS wave, doc_id + 10000000 AS doc_id,
                  CASE WHEN doc_id % 3 = 0 THEN text
                       ELSE text || ' v1' END AS text
           FROM documents
         ), u AS (
           SELECT * FROM d0 UNION ALL SELECT * FROM d1
         ), dg AS (
           SELECT wave, doc_id, md5(text) AS dig FROM u
         ), shd AS (
           SELECT *, ('0x' || substr(md5('shard:' || dig), 1, 14))::BIGINT % 8
                       AS shard
           FROM dg
         ), orded AS (
           SELECT *, row_number() OVER (PARTITION BY shard
                       ORDER BY wave, doc_id) AS ord
           FROM shd
         ), pos AS (
           SELECT doc_id, wave, shard, ord,
                  ('0x' || substr(md5('bdedup:' || CAST(h AS VARCHAR)
                     || ':' || dig), 1, 14))::BIGINT % 65536 AS pos
           FROM orded CROSS JOIN (SELECT unnest(range(0, 3)) AS h)
         ), firstpos AS (
           SELECT shard, pos, min(ord) AS first_ord
           FROM pos GROUP BY shard, pos
         )
         SELECT p.doc_id, p.wave,
                bool_and(f.first_ord < p.ord) AS is_dup
         FROM pos p JOIN firstpos f ON f.shard = p.shard AND f.pos = p.pos
         GROUP BY p.doc_id, p.wave
         ORDER BY p.doc_id""",
    "q104_bigram_logprob" ->
      """WITH d AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS ts
           FROM documents
         ), tok AS (
           SELECT doc_id, unnest(ts) AS tok FROM d
         ), f1 AS (
           SELECT tok, CAST(count(*) AS BIGINT) AS f1 FROM tok GROUP BY tok
         ), tot AS (
           SELECT CAST(sum(f1) AS BIGINT) AS n FROM f1
         ), bg AS (
           SELECT doc_id, unnest([{'u': ts[i], 'v': ts[i+1]} for i in range(1, len(ts))]) AS b
           FROM d WHERE len(ts) >= 2
         ), pd AS (
           SELECT doc_id, b.u AS u, b.v AS v, CAST(count(*) AS BIGINT) AS c
           FROM bg GROUP BY doc_id, b.u, b.v
         ), f2 AS (
           SELECT u, v, CAST(sum(c) AS BIGINT) AS f2 FROM pd GROUP BY u, v
         ), fc AS (
           SELECT u, CAST(sum(f2) AS BIGINT) AS fc FROM f2 GROUP BY u
         )
         SELECT pd.doc_id,
                CAST(sum(pd.c) AS BIGINT) AS n_bigrams,
                CAST(sum(CAST(round(ln(
                        0.75 * (CAST(f2.f2 AS DOUBLE) / CAST(fc.fc AS DOUBLE))
                        + 0.25 * (CAST(f1.f1 AS DOUBLE) / CAST(t.n AS DOUBLE))
                      ) * 1e6) AS BIGINT) * pd.c) AS BIGINT) AS logprob_micros
         FROM pd
         JOIN f2 USING (u, v)
         JOIN fc USING (u)
         JOIN f1 ON f1.tok = pd.v
         CROSS JOIN tot t
         GROUP BY pd.doc_id ORDER BY pd.doc_id""",
    "q105_tfidf_keywords" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
           FROM documents
         ), nz AS (SELECT * FROM toks WHERE tok <> ''
         ), per_doc AS (
           SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
           FROM nz GROUP BY doc_id, tok
         ), nd AS (
           SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM per_doc
         ), dfq AS (
           SELECT tok, CAST(count(*) AS BIGINT) AS df FROM per_doc GROUP BY tok
         ), sc AS (
           SELECT p.doc_id, p.tok, p.c,
                  CAST(round(ln(CAST(nd.nd AS DOUBLE) / CAST(dfq.df AS DOUBLE)) * 1e6)
                       AS BIGINT) * p.c AS score_micros
           FROM per_doc p JOIN dfq USING (tok) CROSS JOIN nd
         ), rk AS (
           SELECT *, row_number() OVER (
             PARTITION BY doc_id ORDER BY score_micros DESC, tok ASC) AS rnk
           FROM sc
         )
         SELECT doc_id, CAST(rnk AS BIGINT) AS rank, tok AS term,
                c AS tf, score_micros
         FROM rk WHERE rnk <= 5 ORDER BY doc_id, rank""",
    "q106_minhash_estimate" -> minhashEstimateOracle,
    "q121_semantic_neardup" ->
      semanticNearDupOracle(k = 8, iterations = 2, tauNum = 9, tauDen = 10),
    "q122_duplicate_spans" ->
      """WITH d AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                              t -> t <> '') AS ts
           FROM documents
         ), tk AS (
           SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens, ts FROM d
         ), g AS (
           SELECT doc_id,
                  unnest([{'p': i, 'g': array_to_string(ts[i:i+4], ' ')}
                          for i in range(1, len(ts) - 3)]) AS u
           FROM tk WHERE len(ts) >= 5
         ), grams AS (
           SELECT doc_id, CAST(u.p AS BIGINT) AS pos, u.g AS gram FROM g
         ), dup AS (
           SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
         ), marked AS (
           SELECT doc_id, pos, pos + 4 AS e
           FROM grams WHERE gram IN (SELECT gram FROM dup)
         ), isl AS (
           SELECT doc_id, pos, e,
                  CASE WHEN pos > coalesce(max(e) OVER (
                         PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       -100) + 1
                       THEN 1 ELSE 0 END AS nw
           FROM marked
         ), isl2 AS (
           SELECT doc_id, pos, e,
                  sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS island
           FROM isl
         ), spans AS (
           SELECT doc_id, island, min(pos) AS s, max(e) AS en
           FROM isl2 GROUP BY doc_id, island
         ), per AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                  CAST(sum(en - s + 1) AS BIGINT) AS dup_tokens
           FROM spans GROUP BY doc_id
         )
         SELECT t.doc_id, t.n_tokens,
                CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
                CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
                CAST(CASE WHEN t.n_tokens > 0
                          THEN (coalesce(p.dup_tokens, 0) * 1000000) // t.n_tokens
                          ELSE 0 END AS BIGINT) AS dup_frac_micros
         FROM tk t LEFT JOIN per p USING (doc_id)
         ORDER BY doc_id""",
    "q123_bpe_train" -> bpeTrainOracle(iterations = 8),
    "q124_unicode_nfc" ->
      """WITH m AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0
                       THEN text || ' cafe' || chr(769) || ' man'
                            || chr(771) || 'ana zu' || chr(776) || 'rich'
                       ELSE text END AS mm
           FROM documents
         ), n AS (
           SELECT doc_id, mm, nfc_normalize(mm) AS nf FROM m
         )
         SELECT doc_id, CAST(length(mm) AS BIGINT) AS raw_cp,
                CAST(length(nf) AS BIGINT) AS nfc_cp,
                nf <> mm AS changed, md5(nf) AS nfc_md5
         FROM n ORDER BY doc_id""",
    "q125_snapshot_diff" ->
      """WITH oldsnap AS (
           SELECT doc_id, md5(text) AS old_md5 FROM documents
         ), newsnap AS (
           SELECT doc_id,
                  md5(CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
                           ELSE text END) AS new_md5
           FROM documents WHERE doc_id % 11 <> 3
           UNION ALL
           SELECT doc_id + 100000, md5('new ' || text)
           FROM documents WHERE doc_id % 13 = 0
         )
         SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                CASE WHEN o.doc_id IS NULL THEN 'added'
                     WHEN n.doc_id IS NULL THEN 'deleted'
                     WHEN o.old_md5 <> n.new_md5 THEN 'changed'
                     ELSE 'unchanged' END AS status,
                o.old_md5, n.new_md5
         FROM oldsnap o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id
         ORDER BY doc_id""",
    "q107_pagerank" -> pageRankOracle(iterations = 5, damping = 0.85),
    "q108_hll_distinct" -> hllDistinctOracle(p = 6),
    "q110_kmeans" -> kmeansOracle(k = 4, iterations = 3),
    "q111_prefix_jaccard_join" -> prefixJaccardOracle(tauNum = 4, tauDen = 5),
    "q140_prefix_jaccard_collapsed" ->
      prefixJaccardOracle(tauNum = 4, tauDen = 5, collapse = true),
    "q112_stream_hll" -> hllWaveOracle(p = 6),
    "q120_shard_manifest" ->
      """WITH counts AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY source
         ), tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM counts),
         b AS (
           SELECT source, n_docs, (123 * n_docs) // t AS base,
                  123 * n_docs - ((123 * n_docs) // t) * t AS rem
           FROM counts, tot
         ), l AS (SELECT CAST(123 - sum(base) AS BIGINT) AS lft FROM b),
         r AS (
           SELECT source, base,
                  row_number() OVER (ORDER BY rem DESC, source) AS rk
           FROM b
         ), q AS (
           SELECT source,
                  CAST(base + CASE WHEN rk <= (SELECT lft FROM l)
                                   THEN 1 ELSE 0 END AS BIGINT) AS quota
           FROM r
         ), sel AS (
           SELECT d.source, d.doc_id, d.text,
                  row_number() OVER (PARTITION BY d.source
                    ORDER BY md5('lr:' || CAST(d.doc_id AS VARCHAR))) AS rn
           FROM documents d
         ), pick AS (
           SELECT s.doc_id, s.text FROM sel s JOIN q USING (source)
           WHERE s.rn <= q.quota
         ), sh AS (
           SELECT doc_id, text,
                  ('0x' || substr(md5('order:' || CAST(doc_id AS VARCHAR)),
                                  1, 14))::BIGINT AS hk
           FROM pick
         ), sp AS (
           SELECT doc_id, text, hk % 4 AS shard,
                  CAST(row_number() OVER (PARTITION BY hk % 4
                    ORDER BY hk, doc_id) AS BIGINT) AS pos
           FROM sh
         ), hs AS (
           SELECT doc_id, shard, pos, text,
                  [list_reduce([CAST(unicode(substr(text, i + j, 1)) AS BIGINT)
                                for j in range(0, 8)],
                               (a, c) -> (a * 257 + c) % 1000000007)
                   for i in range(1, greatest(length(text) - 8 + 2, 1))] AS h
           FROM sp
         ), cut AS (
           SELECT doc_id, shard, pos, text,
                  [i + 7 for i in range(1, len(h) + 1)
                   if h[i] % 32 = 0 AND i + 7 < length(text)] AS c
           FROM hs
         ), bnd AS (
           SELECT doc_id, shard, pos, text,
                  list_prepend(CAST(0 AS BIGINT),
                    list_append(c, CAST(length(text) AS BIGINT))) AS bb
           FROM cut
         ), chunks AS (
           SELECT doc_id, shard, pos,
                  unnest([substr(text, bb[i] + 1, bb[i + 1] - bb[i])
                          for i in range(1, len(bb))]) AS chunk,
                  unnest(range(1, len(bb))) AS ci
           FROM bnd
         ), ch AS (SELECT * FROM chunks WHERE chunk <> '')
         SELECT shard, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                CAST(count(*) AS BIGINT) AS n_chunks,
                CAST(sum(length(chunk)) AS BIGINT) AS total_chars,
                md5(array_to_string(
                  list(md5(chunk) ORDER BY pos, ci), '')) AS manifest_md5
         FROM ch GROUP BY shard ORDER BY shard""",
    "q119_rank_fusion" ->
      s"""$embCte,
         q AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 50 = 0),
         s AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                 ${cosSql("q.v", "q.nrm", "c.v", "c.nrm")} AS score
               FROM q CROSS JOIN n c),
         ra AS (SELECT q_id, c_id, r_exact FROM (
                  SELECT q_id, c_id,
                         CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY score DESC, c_id ASC) AS BIGINT) AS r_exact
                  FROM s) WHERE r_exact <= 10),
         z AS (SELECT vec_id, v,
                      list_max(list_transform(v, x -> abs(x))) AS sc
               FROM e),
         qz AS (SELECT vec_id,
                       [CAST(CASE WHEN sc = 0 THEN 0
                                  ELSE round(v[i] / sc * 127) END AS INTEGER)
                        for i in range(1, len(v) + 1)] AS qv
                FROM z),
         si AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id,
                       CAST(list_sum([CAST(a.qv[i] AS BIGINT) * b.qv[i]
                                      for i in range(1, len(a.qv) + 1)])
                            AS BIGINT) AS dotint
                FROM qz a CROSS JOIN qz b WHERE a.vec_id % 50 = 0),
         rb AS (SELECT q_id, c_id, r_int8 FROM (
                  SELECT q_id, c_id,
                         CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY dotint DESC, c_id ASC) AS BIGINT) AS r_int8
                  FROM si) WHERE r_int8 <= 10),
         f AS (SELECT coalesce(a.q_id, b.q_id) AS q_id,
                      coalesce(a.c_id, b.c_id) AS c_id,
                      a.r_exact, b.r_int8,
                      coalesce(1000000 // (60 + a.r_exact), 0)
                        + coalesce(1000000 // (60 + b.r_int8), 0) AS rrf_micro
               FROM ra a FULL OUTER JOIN rb b
                 ON a.q_id = b.q_id AND a.c_id = b.c_id)
         SELECT q_id, CAST(rnk AS BIGINT) AS "rank", c_id,
                CAST(rrf_micro AS BIGINT) AS rrf_micro, r_exact, r_int8
         FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                 ORDER BY rrf_micro DESC, c_id ASC) AS rnk FROM f)
         WHERE rnk <= 5 ORDER BY q_id, rnk""",
    "q118_corpus_drift" ->
      """WITH toks AS (
           SELECT source, (doc_id // 20) % 2 AS wave,
                  unnest(string_split_regex(lower(text), '\s+')) AS tok
           FROM documents
         ), nz AS (SELECT * FROM toks WHERE tok <> ''),
         cnt AS (
           SELECT source, tok,
                  CAST(sum(CASE WHEN wave = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                  CAST(sum(CASE WHEN wave = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
           FROM nz GROUP BY source, tok
         ), tot AS (
           SELECT source, CAST(sum(ca) AS BIGINT) AS na,
                  CAST(sum(cb) AS BIGINT) AS nb
           FROM cnt GROUP BY source
         ), term AS (
           SELECT c.source, c.ca, c.cb, t.na, t.nb,
                  CAST(round(1000000 * (
                    CASE WHEN c.ca > 0
                         THEN 0.5 * (CAST(c.ca AS DOUBLE) / CAST(t.na AS DOUBLE))
                              * ln(2.0 * (CAST(c.ca AS DOUBLE) / CAST(t.na AS DOUBLE))
                                   / ((CAST(c.ca AS DOUBLE) / CAST(t.na AS DOUBLE))
                                      + (CAST(c.cb AS DOUBLE) / CAST(t.nb AS DOUBLE))))
                         ELSE 0.0 END
                    + CASE WHEN c.cb > 0
                           THEN 0.5 * (CAST(c.cb AS DOUBLE) / CAST(t.nb AS DOUBLE))
                                * ln(2.0 * (CAST(c.cb AS DOUBLE) / CAST(t.nb AS DOUBLE))
                                     / ((CAST(c.ca AS DOUBLE) / CAST(t.na AS DOUBLE))
                                        + (CAST(c.cb AS DOUBLE) / CAST(t.nb AS DOUBLE))))
                           ELSE 0.0 END)) AS BIGINT) AS tmicro
           FROM cnt c JOIN tot t USING (source)
         )
         SELECT source, max(na) AS na, max(nb) AS nb,
                CAST(sum(CASE WHEN cb > 0 AND ca = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS new_types,
                CAST(sum(CASE WHEN ca > 0 AND cb = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS lost_types,
                CAST(sum(tmicro) AS BIGINT) AS jsd_micro
         FROM term GROUP BY source ORDER BY source""",
    "q116_skew_report" ->
      """WITH counts AS (
           SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS cnt
           FROM lineitem GROUP BY 1
         ), tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM counts)
         SELECT key, cnt, (cnt * 1000000) // t AS share_micro,
                cnt * 500 > t AS hot
         FROM counts, tot ORDER BY cnt DESC, key LIMIT 20""",
    "q117_group_ols" ->
      """WITH d AS (
           SELECT source,
                  CAST(len([t for t in string_split_regex(text, '\s+')
                            if t <> '']) AS BIGINT) AS x,
                  n_chars AS y
           FROM documents
         ), s AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(x * y) AS BIGINT) AS sxy,
                  CAST(sum(x * x) AS BIGINT) AS sxx
           FROM d GROUP BY source
         ), ab AS (
           SELECT source, n, sx, sy,
                  n * sxy - sx * sy AS a, n * sxx - sx * sx AS b
           FROM s
         )
         SELECT source, n,
                CASE WHEN b = 0 THEN NULL
                     ELSE CAST(round(1000000
                       * (CAST(a AS DOUBLE) / CAST(b AS DOUBLE)))
                       AS BIGINT) END AS slope_micro,
                CASE WHEN b = 0 THEN NULL
                     ELSE CAST(round(1000000
                       * ((CAST(sy AS DOUBLE)
                           - (CAST(a AS DOUBLE) / CAST(b AS DOUBLE))
                             * CAST(sx AS DOUBLE))
                          / CAST(n AS DOUBLE)))
                       AS BIGINT) END AS intercept_micro
         FROM ab ORDER BY source""",
    "q115_cdc_chunks" ->
      s"""WITH ${boilerplateCorpusSql}hs AS (
           SELECT doc_id, text,
                  [list_reduce([CAST(unicode(substr(text, i + j, 1)) AS BIGINT)
                                for j in range(0, 8)],
                               (a, c) -> (a * 257 + c) % 1000000007)
                   for i in range(1, greatest(length(text) - 8 + 2, 1))] AS h
           FROM corpus
         ), cut AS (
           SELECT doc_id, text,
                  [i + 7 for i in range(1, len(h) + 1)
                   if h[i] % 32 = 0 AND i + 7 < length(text)] AS c
           FROM hs
         ), bnd AS (
           SELECT doc_id, text,
                  list_prepend(CAST(0 AS BIGINT),
                    list_append(c, CAST(length(text) AS BIGINT))) AS b
           FROM cut
         ), chunks AS (
           SELECT doc_id, unnest([substr(text, b[i] + 1, b[i + 1] - b[i])
                                  for i in range(1, len(b))]) AS chunk
           FROM bnd
         ), ch AS (
           SELECT doc_id, md5(chunk) AS hh, length(chunk) AS clen
           FROM chunks WHERE chunk <> ''
         ), spread AS (
           SELECT hh, count(DISTINCT doc_id) AS n_docs FROM ch GROUP BY hh
         )
         SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
                CAST(sum(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_shared,
                CAST(sum(c.clen) AS BIGINT) AS total_chars
         FROM ch c JOIN spread s USING (hh)
         GROUP BY c.doc_id ORDER BY c.doc_id""",
    "q114_mixture_quota" ->
      """WITH counts AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY source
         ), tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM counts),
         b AS (
           SELECT source, n_docs, (123 * n_docs) // t AS base,
                  123 * n_docs - ((123 * n_docs) // t) * t AS rem
           FROM counts, tot
         ), l AS (SELECT CAST(123 - sum(base) AS BIGINT) AS lft FROM b),
         r AS (
           SELECT source, n_docs, base,
                  row_number() OVER (ORDER BY rem DESC, source) AS rk
           FROM b
         ), q AS (
           SELECT source, n_docs,
                  CAST(base + CASE WHEN rk <= (SELECT lft FROM l)
                                   THEN 1 ELSE 0 END AS BIGINT) AS quota
           FROM r
         ), sel AS (
           SELECT d.source, d.doc_id,
                  row_number() OVER (PARTITION BY d.source
                    ORDER BY md5('lr:' || CAST(d.doc_id AS VARCHAR))) AS rn
           FROM documents d
         ), p AS (
           SELECT s.source, CAST(count(*) AS BIGINT) AS picked_n,
                  md5(array_to_string(
                    list(CAST(s.doc_id AS VARCHAR) ORDER BY s.doc_id),
                    ',')) AS picked_md5
           FROM sel s JOIN q USING (source)
           WHERE s.rn <= q.quota GROUP BY s.source
         )
         SELECT q.source, q.n_docs, q.quota, p.picked_n, p.picked_md5
         FROM q JOIN p USING (source) ORDER BY q.source""",
    "q113_embedding_outliers" ->
      """WITH q AS (
           SELECT vec_id, label,
                  list_transform(CAST(embedding AS DOUBLE[]),
                    x -> CAST(round(x * 1000000) AS BIGINT)) AS vq
           FROM embeddings
         ), u AS (
           SELECT label, j,
                  CAST(round(CAST(sum(v) AS DOUBLE)
                             / CAST(count(*) AS DOUBLE)) AS BIGINT) AS cv
           FROM (SELECT label, unnest(vq) AS v,
                        unnest(range(1, len(vq) + 1)) AS j FROM q)
           GROUP BY label, j
         ), c AS (
           SELECT label, list(cv ORDER BY j) AS cvec FROM u GROUP BY label
         ), d AS (
           SELECT q.vec_id, q.label,
                  CAST(list_sum([(q.vq[j] - c.cvec[j]) * (q.vq[j] - c.cvec[j])
                                 for j in range(1, len(q.vq) + 1)])
                       AS BIGINT) AS dist2_q
           FROM q JOIN c USING (label)
         ), r AS (
           SELECT label, vec_id, dist2_q,
                  row_number() OVER (PARTITION BY label
                                     ORDER BY dist2_q DESC, vec_id) AS rk
           FROM d
         )
         SELECT label, CAST(rk AS BIGINT) AS rank, vec_id, dist2_q
         FROM r WHERE rk <= 3 ORDER BY label, rank""",
    "q109_sample_quantiles" ->
      """WITH d AS (
           SELECT source, n_chars,
                  md5('qs:' || CAST(doc_id AS VARCHAR)) AS hk
           FROM documents
         ), rn AS (
           SELECT source, n_chars,
                  row_number() OVER (PARTITION BY source ORDER BY hk) AS rn
           FROM d
         ), samp AS (
           SELECT source, CAST(count(*) AS BIGINT) AS sample_n,
                  quantile_cont(n_chars, 0.5) AS sample_p50,
                  quantile_cont(n_chars, 0.9) AS sample_p90
           FROM rn WHERE rn <= 8 GROUP BY source
         ), ex AS (
           SELECT source, quantile_cont(n_chars, 0.5) AS exact_p50,
                  quantile_cont(n_chars, 0.9) AS exact_p90
           FROM documents GROUP BY source
         )
         SELECT s.source, s.sample_n, s.sample_p50, s.sample_p90,
                e.exact_p50, e.exact_p90
         FROM samp s JOIN ex e USING (source)
         ORDER BY source""",
    "q97_incremental_dedup" ->
      """WITH batch AS (
           SELECT doc_id + 1000000 AS doc_id,
                  CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS text
           FROM documents WHERE doc_id % 5 = 0
         ), seen AS (SELECT DISTINCT md5(text) AS h FROM documents)
         SELECT b.doc_id, md5(b.text) AS content_md5
         FROM batch b LEFT JOIN seen s ON s.h = md5(b.text)
         WHERE s.h IS NULL
         ORDER BY b.doc_id""",
    "q96_asof_bucketed" ->
      """WITH l AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
           FROM events WHERE event_type = 'purchase'
         ), r AS (
           SELECT user_id AS r_uid, epoch_us(ts) AS click_ts_us,
                  max(value) AS click_val
           FROM events WHERE event_type = 'click' GROUP BY 1, 2
         )
         SELECT l.event_id, l.user_id, l.ts_us, l.value,
                r.click_ts_us, r.click_val
         FROM l ASOF LEFT JOIN r
           ON l.user_id = r.r_uid AND l.ts_us >= r.click_ts_us
         ORDER BY l.event_id""",
    "q58_decontaminate" ->
      """WITH d AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS words FROM documents
         ), g AS (
           SELECT DISTINCT doc_id, unnest(
             CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                  ELSE [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]
             END) AS gram
           FROM d
         ), eg AS (
           SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
         ), tg AS (
           SELECT g.doc_id, g.gram, eg.gram IS NOT NULL AS hit
           FROM g LEFT JOIN eg USING (gram)
           WHERE g.doc_id % 97 <> 0
         )
         SELECT doc_id,
                CAST(count(*) AS BIGINT) AS n_grams,
                CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
                sum(CASE WHEN hit THEN 1 ELSE 0 END) >= 2 AS contaminated
         FROM tg GROUP BY doc_id ORDER BY doc_id""",
    "q59_stream_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
                epoch_us(p.ts) AS p_ts_us, p.value AS purchase_val,
                c.event_id AS click_id, epoch_us(c.ts) AS c_ts_us,
                c.value AS click_val
         FROM events p JOIN events c
           ON c.user_id = p.user_id
          AND p.event_type = 'purchase' AND c.event_type = 'click'
          AND c.ts BETWEEN p.ts - INTERVAL 120 MINUTE AND p.ts
         ORDER BY purchase_id, click_id""",
    "q60_bm25" ->
      """WITH toks AS (
           SELECT doc_id, string_split_regex(lower(text), '\s+') AS tk FROM documents
         ), lens AS (
           SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks
         ), corpus AS (
           SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM lens
         ), tf AS (
           SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(tk) AS term FROM toks) u
           WHERE term IN ('hash', 'join', 'dup', 'window')
           GROUP BY doc_id, term
         ), dfx AS (
           SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
         )
         SELECT tf.doc_id,
                CAST(count(*) AS BIGINT) AS n_terms_matched,
                sum(ln(1 + (c.n - dfx.df + 0.5) / (dfx.df + 0.5))
                    * tf.tf * (1.2 + 1.0)
                    / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / c.avgdl))) AS bm25
         FROM tf
         JOIN dfx USING (term)
         JOIN lens l ON l.doc_id = tf.doc_id
         CROSS JOIN corpus c
         GROUP BY tf.doc_id ORDER BY tf.doc_id""",
    "q61_mixture_resample" ->
      """WITH c AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
         ), cw AS (
           SELECT source, n,
                  CAST(CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 2
                       ELSE 1 END AS BIGINT) AS w
           FROM c
         ), m AS (
           SELECT n AS mn, w AS mw FROM cw
           ORDER BY CAST(n AS DOUBLE) / w, source LIMIT 1
         )
         SELECT d.doc_id, d.source
         FROM documents d JOIN cw USING (source) CROSS JOIN m
         WHERE ('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 14))::BIGINT
                 % (m.mw * cw.n) < (m.mn * cw.w)
         ORDER BY d.doc_id""",
    "q62_funnel" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS t, event_type FROM events
         ), s0 AS (
           SELECT user_id, min(t) AS t_0 FROM e
           WHERE event_type = 'view' GROUP BY 1
         ), s1 AS (
           SELECT e.user_id, min(t) AS t_1 FROM e JOIN s0 USING (user_id)
           WHERE event_type = 'click' AND t > t_0 GROUP BY 1
         ), s2 AS (
           SELECT e.user_id, min(t) AS t_2 FROM e JOIN s1 USING (user_id)
           WHERE event_type = 'purchase' AND t > t_1 GROUP BY 1
         )
         SELECT s0.user_id, s0.t_0, s1.t_1, s2.t_2,
                CAST(CASE WHEN s0.t_0 IS NOT NULL THEN 1 ELSE 0 END
                   + CASE WHEN s1.t_1 IS NOT NULL THEN 1 ELSE 0 END
                   + CASE WHEN s2.t_2 IS NOT NULL THEN 1 ELSE 0 END
                 AS BIGINT) AS stages_reached
         FROM s0
         LEFT JOIN s1 USING (user_id)
         LEFT JOIN s2 USING (user_id)
         ORDER BY s0.user_id""",
    "q63_sketch_stats" ->
      """SELECT source,
                CAST(count(DISTINCT md5(text)) AS BIGINT) AS exact_distinct,
                TRUE AS distinct_within_bound,
                quantile_cont(n_chars, 0.5) AS p50_chars,
                quantile_cont(n_chars, 0.95) AS p95_chars,
                TRUE AS p50_within_bound
         FROM documents GROUP BY source ORDER BY source""",
    "q64_range_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
                epoch_us(p.ts) AS p_ts_us, p.value AS purchase_val,
                c.event_id AS click_id, epoch_us(c.ts) AS c_ts_us,
                c.value AS click_val
         FROM events p JOIN events c
           ON c.user_id = p.user_id
          AND p.event_type = 'purchase' AND c.event_type = 'click'
          AND epoch_us(c.ts)
              BETWEEN epoch_us(p.ts) - 7200000000 AND epoch_us(p.ts)
         ORDER BY purchase_id, click_id""",
    "q65_rollup" ->
      """SELECT source, lang,
                CAST(GROUPING(source, lang) AS BIGINT) AS gid,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY ROLLUP (source, lang)
         ORDER BY gid, source, lang""",
    "q66_rolling_window" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                CAST(sum(CAST(round(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS roll_sum_milli,
                CAST(count(*) OVER w AS BIGINT) AS roll_n
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q67_json_quarantine" ->
      """WITH x AS (
           SELECT event_type,
                  CASE WHEN event_id % 7 = 0 THEN 'x' || props
                       ELSE props END AS p
           FROM events
         )
         SELECT event_type,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CASE WHEN NOT json_valid(p) THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_quarantined,
                CAST(sum(CASE WHEN json_valid(p)
                              THEN CAST(json_extract(p, '$.k') AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS sum_k
         FROM x GROUP BY event_type ORDER BY event_type""",
    "q68_boilerplate_removal" ->
      """WITH base AS (
           SELECT doc_id, CASE WHEN source IN ('src0', 'src1', 'src2')
                  THEN 'terms of service apply to this site content ' || text
                  ELSE text END AS t
           FROM documents
         ), w AS (
           SELECT doc_id, string_split_regex(t, '\s+') AS words FROM base
         ), d AS (
           SELECT doc_id,
                  [array_to_string(words[i*8+1:i*8+8], ' ')
                   for i in range(0, CAST(ceil(len(words)/8.0) AS BIGINT))] AS units
           FROM w
         ), pu AS (
           SELECT doc_id, x.pos AS pos, x.u AS unit FROM (
             SELECT doc_id, unnest([{'pos': i, 'u': units[i+1]}
                                    for i in range(0, len(units))]) AS x
             FROM d)
         ), hot AS (
           SELECT unit FROM (SELECT DISTINCT doc_id, unit FROM pu)
           GROUP BY unit HAVING count(*) > 10
         ), kept AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                  string_agg(unit, ' ' ORDER BY pos) AS cleaned
           FROM pu WHERE unit NOT IN (SELECT unit FROM hot)
           GROUP BY doc_id
         )
         SELECT d.doc_id, CAST(len(d.units) AS BIGINT) AS n_units,
                CAST(len(d.units) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed,
                coalesce(k.cleaned, '') AS cleaned
         FROM d LEFT JOIN kept k USING (doc_id) ORDER BY d.doc_id""",
    "q69_fuzzy_join" ->
      """WITH q AS (
           SELECT p_partkey AS q_key, 'x' || substr(p_name, 2) AS q_name
           FROM part WHERE p_partkey % 10 = 0
         )
         SELECT q.q_key, p.p_partkey,
                CAST(levenshtein(q.q_name, p.p_name) AS INT) AS dist
         FROM q JOIN part p
           ON abs(length(q.q_name) - length(p.p_name)) <= 1
          AND levenshtein(q.q_name, p.p_name) <= 1
         ORDER BY q.q_key, p.p_partkey""",
    "q70_session_window" ->
      """WITH x AS (
           SELECT user_id, ts, value,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
           FROM events
         ), y AS (
           SELECT user_id, ts, value,
                  CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                       THEN 1 ELSE 0 END AS ns
           FROM x
         ), z AS (
           SELECT user_id, ts, value,
                  sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS sid
           FROM y
         )
         SELECT user_id,
                strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
                  AS session_end,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
                  AS value_milli
         FROM z GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "q71_star_join" ->
      """SELECT n.n_name,
                CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100)
                              AS BIGINT)) AS BIGINT) AS revenue_cents,
                CAST(count(*) AS BIGINT) AS n_items
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
           AND o.o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n.n_name ORDER BY n.n_name""",
    "q72_stream_outer_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
                epoch_us(p.ts) AS p_ts_us, p.value AS purchase_val,
                c.event_id AS click_id, epoch_us(c.ts) AS c_ts_us,
                c.value AS click_val
         FROM events p LEFT JOIN events c
           ON c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts BETWEEN p.ts - INTERVAL 120 MINUTE AND p.ts
         WHERE p.event_type = 'purchase'
         ORDER BY purchase_id, click_id""",
    "q73_corpus_pipeline" -> corpusPipelineOracle,
    "q74_random_projection" -> {
      val scale = java.lang.Double.toString(1.0 / math.sqrt(projPlanes.size.toDouble))
      val cols = projPlanes.zipWithIndex.map { case (p, i) =>
        s"list_dot_product(v, ${Ann.hyperplaneSqlLiteral(p)}) * $scale AS p$i"
      }.mkString(",\n                ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         SELECT vec_id,
                $cols
         FROM e ORDER BY vec_id"""
    },
    "q75_importance_sample" ->
      s"""WITH $qualityFilterCtes
         SELECT doc_id, source, quality_score FROM q
         WHERE ('0x' || substr(md5('imp:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
               < CAST(floor(quality_score * 72057594037927936.0) AS BIGINT)
         ORDER BY doc_id""",
    "q76_stream_quota" ->
      """WITH d AS (
           SELECT doc_id, doc_id % 2 AS version, source FROM documents
         ), r AS (
           SELECT doc_id, version, source,
                  row_number() OVER (PARTITION BY source
                    ORDER BY version, doc_id) AS rn
           FROM d
         )
         SELECT doc_id, version, source FROM r WHERE rn <= 15
         ORDER BY doc_id""",
    "q77_rolling_fingerprint" ->
      """WITH hs AS (
           SELECT doc_id,
                  [list_reduce([CAST(unicode(substr(text, i + j, 1)) AS BIGINT)
                                for j in range(0, 8)],
                               (a, c) -> (a * 257 + c) % 1000000007)
                   for i in range(1, greatest(length(text) - 8 + 2, 1))] AS h
           FROM documents
         ), sel AS (
           SELECT doc_id,
                  CASE WHEN len(h) = 0 THEN []
                       WHEN len(h) < 5 THEN [list_min(h)]
                       ELSE [list_min(h[i:i+4]) for i in range(1, len(h) - 5 + 2)]
                  END AS mins
           FROM hs
         )
         SELECT doc_id, unnest(list_sort(list_distinct(mins))) AS fp
         FROM sel ORDER BY doc_id, fp""",
    "q78_winnow_neardup" ->
      """WITH hs AS (
           SELECT doc_id,
                  [list_reduce([CAST(unicode(substr(text, i + j, 1)) AS BIGINT)
                                for j in range(0, 20)],
                               (a, c) -> (a * 257 + c) % 1000000007)
                   for i in range(1, greatest(length(text) - 20 + 2, 1))] AS h
           FROM documents
         ), sel AS (
           SELECT doc_id,
                  CASE WHEN len(h) = 0 THEN []
                       WHEN len(h) < 12 THEN [list_min(h)]
                       ELSE [list_min(h[i:i+11]) for i in range(1, len(h) - 12 + 2)]
                  END AS mins
           FROM hs
         ), fp AS (
           SELECT doc_id, unnest(list_distinct(mins)) AS fp FROM sel
         ), hot AS (
           SELECT fp FROM fp GROUP BY fp HAVING count(*) > 5
         ), pruned AS (
           SELECT * FROM fp WHERE fp NOT IN (SELECT fp FROM hot)
         )
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(count(*) AS BIGINT) AS n_shared
         FROM pruned a JOIN pruned b
           ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 2
         ORDER BY id_a, id_b""",
    "q79_group_heavy_hitters" ->
      """SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
         FROM (SELECT source, unnest(string_split_regex(text, '\s+')) AS token
               FROM documents)
         GROUP BY source, token ORDER BY source, token""",
    "q80_scd2_intervals" ->
      """WITH x AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                  CAST(round(value * 1000) AS BIGINT) AS value_milli
           FROM events
           WHERE event_type IN ('signup', 'purchase')
         )
         SELECT user_id, event_id, ts_us AS valid_from,
                lead(ts_us) OVER w AS valid_to,
                value_milli,
                lead(ts_us) OVER w IS NULL AS is_current
         FROM x
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         ORDER BY user_id, valid_from, event_id""",
    "q146_png_resize" ->
      """WITH d AS (
           SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
           FROM documents
         ), g AS (
           SELECT doc_id, w, h,
                  unnest(range(0, 6)) AS y2
           FROM d
         ), gx AS (
           SELECT doc_id, w, h, y2, unnest(range(0, 8)) AS x2
           FROM g
         )
         SELECT doc_id, CAST(8 AS BIGINT) AS out_width,
                CAST(6 AS BIGINT) AS out_height,
                CAST(sum((doc_id * 31
                          + (y2 * h // 6) * w + (x2 * w // 8)) % 256)
                     AS BIGINT) AS out_px_sum
         FROM gx GROUP BY doc_id
         ORDER BY doc_id""",
    "q83_png_roundtrip" ->
      """WITH d AS (
           SELECT doc_id, 8 + doc_id % 9 AS width, 8 + doc_id % 7 AS height
           FROM documents
         ), g AS (
           SELECT doc_id, width, height,
                  unnest(range(0, width * height)) AS i
           FROM d
         )
         SELECT doc_id, CAST(width AS BIGINT) AS width,
                CAST(height AS BIGINT) AS height,
                CAST(sum((doc_id * 31 + i) % 256) AS BIGINT) AS px_sum
         FROM g GROUP BY doc_id, width, height
         ORDER BY doc_id""",
    "q82_pca_certify" ->
      """SELECT vec_id, TRUE AS norm_contract, TRUE AS orthonormal,
                TRUE AS var_ordered, TRUE AS sign_canonical,
                TRUE AS axis_optimal
         FROM embeddings ORDER BY vec_id""",
    "q81_stream_funnel" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS t, event_type FROM events
         ), s0 AS (
           SELECT user_id, min(t) AS t_0 FROM e
           WHERE event_type = 'view' GROUP BY 1
         ), s1 AS (
           SELECT e.user_id, min(t) AS t_1 FROM e JOIN s0 USING (user_id)
           WHERE event_type = 'click' AND t > t_0 GROUP BY 1
         ), s2 AS (
           SELECT e.user_id, min(t) AS t_2 FROM e JOIN s1 USING (user_id)
           WHERE event_type = 'purchase' AND t > t_1 GROUP BY 1
         )
         SELECT s0.user_id, s0.t_0, s1.t_1, s2.t_2
         FROM s0 JOIN s1 USING (user_id) JOIN s2 USING (user_id)
         ORDER BY s0.user_id""",
    "q55_per_source_cap" ->
      """WITH h AS (
           SELECT doc_id, source,
                  ('0x' || substr(md5('capsalt:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS hq
           FROM documents
         ), r AS (
           SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source ORDER BY hq ASC, doc_id ASC) AS rn
           FROM h
         )
         SELECT doc_id, source FROM r WHERE rn <= 10 ORDER BY doc_id""",
    "q54_repetition_filter" ->
      """WITH w AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS words FROM documents
         ), base AS (
           SELECT doc_id, len(words) AS n_words,
                  len(list_distinct(words)) AS n_distinct
           FROM w
         ), bg AS (
           SELECT doc_id, g, count(*) AS c FROM (
             SELECT doc_id, unnest([words[i] || ' ' || words[i+1]
                                    for i in range(1, len(words))]) AS g
             FROM w) GROUP BY doc_id, g
         ), topbg AS (
           SELECT doc_id, max(c) AS top_bigram FROM bg GROUP BY doc_id
         ), tg AS (
           SELECT doc_id, g, count(*) AS c FROM (
             SELECT doc_id, unnest([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                    for i in range(1, len(words) - 1)]) AS g
             FROM w) GROUP BY doc_id, g
         ), duptg AS (
           SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_trigram
           FROM tg GROUP BY doc_id
         ), m AS (
           SELECT b.doc_id, b.n_words,
                  CASE WHEN b.n_words = 0 THEN CAST(0 AS DOUBLE)
                       ELSE CAST(b.n_words - b.n_distinct AS DOUBLE)
                            / CAST(b.n_words AS DOUBLE) END AS word_rep_ratio,
                  CASE WHEN b.n_words = 0 THEN CAST(0 AS DOUBLE)
                       ELSE CAST(coalesce(t.top_bigram, 0) AS DOUBLE) * 2
                            / CAST(b.n_words AS DOUBLE) END AS top_bigram_frac,
                  CASE WHEN b.n_words = 0 THEN CAST(0 AS DOUBLE)
                       ELSE CAST(coalesce(d.dup_trigram, 0) AS DOUBLE) * 3
                            / CAST(b.n_words AS DOUBLE) END AS dup_trigram_frac
           FROM base b
           LEFT JOIN topbg t ON t.doc_id = b.doc_id
           LEFT JOIN duptg d ON d.doc_id = b.doc_id
         )
         SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
                word_rep_ratio, top_bigram_frac, dup_trigram_frac,
                word_rep_ratio <= CAST(0.3 AS DOUBLE)
                  AND top_bigram_frac <= CAST(0.2 AS DOUBLE)
                  AND dup_trigram_frac <= CAST(0.3 AS DOUBLE) AS repetition_keep
         FROM m ORDER BY doc_id""",
    "q46_signature_clusters" -> signatureClustersOracle,
    "q47_stream_dedup" ->
      """WITH d AS (SELECT doc_id, text, md5(text) AS h FROM documents),
           keepers AS (SELECT h, min(doc_id) AS m FROM d GROUP BY h),
           v0 AS (
             SELECT d.doc_id, d.text, d.h
             FROM d JOIN keepers k ON d.h = k.h AND d.doc_id = k.m)
         SELECT doc_id, CAST(0 AS BIGINT) AS version, h AS text_md5 FROM v0
         UNION ALL
         SELECT doc_id, CAST(1 AS BIGINT) AS version,
                md5(text || ' v1') AS text_md5
         FROM v0 WHERE doc_id % 3 <> 0
         ORDER BY doc_id, version""",
    "q48_dataset_split" ->
      s"""WITH h AS (
           SELECT doc_id, ${splitHashSql("graft", 100)} AS hs,
                  ${splitHashSql("sample", 10)} AS hq
           FROM documents)
         SELECT doc_id,
                CASE WHEN hs < 90 THEN 'train'
                     WHEN hs < 95 THEN 'valid' ELSE 'test' END AS split,
                hq < 1 AS in_sample
         FROM h ORDER BY doc_id""",
    "q49_curation_pipeline" -> curationPipelineOracle,
    "q52_sequence_packing" ->
      s"""WITH d AS (
           SELECT doc_id,
                  CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS ws_tokens,
                  ${splitHashSql("graft", 100)} AS hs
           FROM documents
         ), s AS (
           SELECT doc_id, ws_tokens,
                  CASE WHEN hs < 90 THEN 'train'
                       WHEN hs < 95 THEN 'valid' ELSE 'test' END AS split
           FROM d
         ), c AS (
           SELECT doc_id, split, ws_tokens,
                  CAST(SUM(ws_tokens) OVER (PARTITION BY split ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    - ws_tokens AS strt
           FROM s
         )
         SELECT doc_id, split, ws_tokens,
                CAST(floor(strt / 512) AS BIGINT) AS pack_id,
                strt - CAST(floor(strt / 512) AS BIGINT) * 512 AS pack_offset
         FROM c ORDER BY doc_id""",
    "q50_embedding_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           s AS (SELECT vec_id, v,
                        list_max(list_transform(v, x -> abs(x))) AS scale FROM e),
           q AS (SELECT vec_id, v, scale,
                        list_transform(v, x -> CAST(
                          CASE WHEN scale = 0 THEN 0
                               ELSE round(x / scale * 127) END AS TINYINT)) AS qv
                 FROM s)
         SELECT vec_id, scale,
                md5(array_to_string(list_transform(qv, x -> CAST(x AS VARCHAR)), ',')) AS q_md5,
                list_max([abs(v[i] - CAST(qv[i] AS DOUBLE) * scale / 127)
                          for i in range(1, len(v) + 1)]) AS max_err
         FROM q ORDER BY vec_id""",
    "q23_nlp_clean" -> nlpCleanOracle,
    "q126_containment" ->
      """WITH d AS (
           SELECT doc_id, text FROM documents WHERE doc_id < 40
         ), h AS (
           SELECT doc_id + 5000 AS doc_id,
                  array_to_string(
                    string_split_regex(text, '\s+')
                      [1:greatest(len(string_split_regex(text, '\s+')) // 2, 1)],
                    ' ') AS text
           FROM d
         ), u AS (
           SELECT * FROM d UNION ALL SELECT * FROM h
         ), w AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS words FROM u
         ), sh AS (
           SELECT DISTINCT doc_id, unnest(
             CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                  ELSE [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]
             END) AS shingle
           FROM w
         ), sizes AS (
           SELECT doc_id, CAST(count(*) AS INTEGER) AS n_sh FROM sh GROUP BY doc_id
         ), pairs AS (
           SELECT doc_id AS id_a, doc_id + 5000 AS id_b FROM d
         ), inter AS (
           SELECT p.id_a, p.id_b, CAST(count(*) AS BIGINT) AS n_inter
           FROM pairs p
           JOIN sh ta ON ta.doc_id = p.id_a
           JOIN sh tb ON tb.doc_id = p.id_b AND ta.shingle = tb.shingle
           GROUP BY p.id_a, p.id_b
         )
         SELECT p.id_a, p.id_b,
                coalesce(i.n_inter, 0) AS n_inter,
                sa.n_sh AS n_a, sb.n_sh AS n_b,
                CAST(coalesce(i.n_inter, 0) AS DOUBLE)
                  / (sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0)) AS jaccard,
                CAST(coalesce(i.n_inter, 0) AS DOUBLE) / sa.n_sh AS containment_a,
                CAST(coalesce(i.n_inter, 0) AS DOUBLE) / sb.n_sh AS containment_b
         FROM pairs p
         LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
         JOIN sizes sa ON sa.doc_id = p.id_a
         JOIN sizes sb ON sb.doc_id = p.id_b
         ORDER BY p.id_a""",
    "q127_cluster_canonical" -> clusterCanonicalOracle,
    "q129_stream_countmin" -> cmWaveOracle(depth = 4, width = 16,
      salt = "cms", probes = Seq("data", "of", "the")),
    "q131_grouped_split" -> groupedSplitOracle,
    "q133_lsh_recall" -> lshRecallOracle(),
    "q139_lsh_recall_16x2" -> lshRecallOracle(numHashes = 16),
    "q141_lsh_recall_independent" ->
      lshRecallOracle(numHashes = 8, independent = true),
    "q134_frontier_interleave" -> frontierInterleaveOracle,
    "q136_curation_pipeline_v3" -> curationV3Oracle,
    "q137_salted_agg" ->
      """SELECT event_type,
           CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v,
           CAST(count(*) AS BIGINT) AS n_rows
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q138_table_stats" ->
      """WITH s AS (
           SELECT 'l_quantity' AS "column",
                  CAST(min(l_quantity) AS BIGINT) AS min_v,
                  CAST(max(l_quantity) AS BIGINT) AS max_v,
                  CAST(count(l_quantity) AS BIGINT) AS n_nonnull,
                  CAST(count(DISTINCT l_quantity) AS BIGINT) AS ndv
           FROM lineitem
           UNION ALL
           SELECT 'l_extendedprice_cents',
                  CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT),
                  CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT),
                  CAST(count(l_extendedprice) AS BIGINT),
                  CAST(count(DISTINCT CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'l_discount_bp',
                  CAST(min(CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT),
                  CAST(max(CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT),
                  CAST(count(l_discount) AS BIGINT),
                  CAST(count(DISTINCT CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'l_partkey',
                  CAST(min(l_partkey) AS BIGINT),
                  CAST(max(l_partkey) AS BIGINT),
                  CAST(count(l_partkey) AS BIGINT),
                  CAST(count(DISTINCT l_partkey) AS BIGINT)
           FROM lineitem
         )
         SELECT * FROM s ORDER BY "column"""",
    "q135_compression_quality" ->
      """SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS raw_bytes,
           TRUE AS comp_bounds_ok,
           TRUE AS repetition_detected
         FROM documents
         WHERE octet_length(encode(text)) >= 200
           AND octet_length(encode(text)) < 30000
         ORDER BY doc_id""",
    "q132_pmi_collocations" ->
      """WITH w AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                              t -> t <> '') AS ts
           FROM documents
         ), bg AS (
           SELECT unnest(ts[1:len(ts) - 1]) AS u, unnest(ts[2:len(ts)]) AS v
           FROM w WHERE len(ts) >= 2
         ), f2 AS (
           SELECT u, v, CAST(count(*) AS BIGINT) AS f2 FROM bg GROUP BY u, v
         ), f1 AS (
           SELECT tok, CAST(count(*) AS BIGINT) AS f1
           FROM (SELECT unnest(ts) AS tok FROM w) GROUP BY tok
         ), nb AS (SELECT CAST(sum(f2) AS BIGINT) AS nb FROM f2),
         nt AS (SELECT CAST(sum(f1) AS BIGINT) AS nt FROM f1),
         j AS (
           SELECT f2.u, f2.v, f2.f2, a.f1 AS f1_u, b.f1 AS f1_v
           FROM f2 JOIN f1 a ON a.tok = f2.u JOIN f1 b ON b.tok = f2.v
           WHERE f2.f2 >= 5
         ), p AS (
           SELECT u, v, f2, f1_u, f1_v,
                  CAST(round(ln(
                    (CAST(f2 AS DOUBLE) / CAST(nb.nb AS DOUBLE))
                      / ((CAST(f1_u AS DOUBLE) / CAST(nt.nt AS DOUBLE))
                         * (CAST(f1_v AS DOUBLE) / CAST(nt.nt AS DOUBLE))))
                    * 1000000) AS BIGINT) AS pmi_micro
           FROM j, nb, nt
         )
         SELECT * FROM p ORDER BY pmi_micro DESC, u, v LIMIT 50""",
    "q130_shard_diversity" ->
      """WITH e AS (
           SELECT vec_id, vec_id % 8 AS shard,
                  CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings
         ), q AS (
           SELECT shard,
                  unnest(range(1, len(v) + 1)) - 1 AS dim,
                  unnest([CAST(round(v[i] * 1048576) AS BIGINT)
                          for i in range(1, len(v) + 1)]) AS qx
           FROM e
         ), dimagg AS (
           SELECT shard, dim, CAST(sum(qx) AS BIGINT) AS s_d,
                  CAST(sum(qx * qx) AS BIGINT) AS ss_d
           FROM q GROUP BY shard, dim
         ), sh AS (
           SELECT shard, CAST(sum(ss_d) AS BIGINT) AS sum_sq,
                  CAST(sum(s_d * s_d) AS BIGINT) AS sum_dim_sq
           FROM dimagg GROUP BY shard
         ), n AS (
           SELECT shard, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY shard
         )
         SELECT n.shard, n.n, sh.sum_sq, sh.sum_dim_sq,
                CAST(n.n * sh.sum_sq - sh.sum_dim_sq AS BIGINT) AS spread_num
         FROM n JOIN sh USING (shard) ORDER BY shard""",
    "q128_matryoshka_recall" ->
      s"""$embCte,
         tn AS (SELECT vec_id, v[1:16] AS tv,
                       sqrt(list_dot_product(v[1:16], v[1:16])) AS tnrm FROM e),
         q AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 50 = 0),
         qt AS (SELECT vec_id, tv, tnrm FROM tn WHERE vec_id % 50 = 0),
         sf AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                  ${cosSql("q.v", "q.nrm", "c.v", "c.nrm")} AS score
                FROM q CROSS JOIN n c),
         rf AS (SELECT q_id, c_id,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, c_id ASC) AS rnk
                FROM sf),
         st AS (SELECT qt.vec_id AS q_id, c.vec_id AS c_id,
                  ${cosSql("qt.tv", "qt.tnrm", "c.tv", "c.tnrm")} AS score
                FROM qt CROSS JOIN tn c),
         rt AS (SELECT q_id, c_id,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, c_id ASC) AS rnk
                FROM st),
         ov AS (SELECT f.q_id, CAST(count(*) AS BIGINT) AS n_common
                FROM (SELECT q_id, c_id FROM rf WHERE rnk <= 10) f
                JOIN (SELECT q_id, c_id FROM rt WHERE rnk <= 10) t2
                  ON t2.q_id = f.q_id AND t2.c_id = f.c_id
                GROUP BY f.q_id)
         SELECT q.vec_id AS q_id, CAST(10 AS BIGINT) AS k,
                coalesce(o.n_common, CAST(0 AS BIGINT)) AS n_common
         FROM q LEFT JOIN ov o ON o.q_id = q.vec_id ORDER BY q_id""",
    "q147_retrieval_cascade" ->
      s"""$embCte,
         tn AS (SELECT vec_id, v[1:32] AS tv,
                       sqrt(list_dot_product(v[1:32], v[1:32])) AS tnrm FROM e),
         qset AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 50 = 0),
         qp AS (SELECT vec_id, tv, tnrm FROM tn WHERE vec_id % 50 = 0),
         t1 AS (SELECT q_id, c_id FROM (
                  SELECT qp.vec_id AS q_id, c.vec_id AS c_id,
                         row_number() OVER (PARTITION BY qp.vec_id ORDER BY
                           ${cosSql("qp.tv", "qp.tnrm", "c.tv", "c.tnrm")} DESC,
                           c.vec_id ASC) AS rn
                  FROM qp CROSS JOIN tn c)
                WHERE rn <= 100),
         s8 AS (SELECT vec_id, v,
                       list_max(list_transform(v, x -> abs(x))) AS scale FROM e),
         dq AS (SELECT vec_id,
                       list_transform(v, x ->
                         CAST(CAST(CASE WHEN scale = 0 THEN 0
                                        ELSE round(x / scale * 127)
                                   END AS TINYINT) AS DOUBLE) * scale / 127) AS dv
                FROM s8),
         dqn AS (SELECT vec_id, dv, sqrt(list_dot_product(dv, dv)) AS dnrm FROM dq),
         t2 AS (SELECT q_id, c_id FROM (
                  SELECT t1.q_id, t1.c_id,
                         row_number() OVER (PARTITION BY t1.q_id ORDER BY
                           ${cosSql("q.v", "q.nrm", "d.dv", "d.dnrm")} DESC,
                           t1.c_id ASC) AS rn
                  FROM t1 JOIN dqn d ON d.vec_id = t1.c_id
                          JOIN qset q ON q.vec_id = t1.q_id)
                WHERE rn <= 30),
         t3 AS (SELECT q_id, rn AS rnk, c_id, score FROM (
                  SELECT t2.q_id, t2.c_id,
                         ${cosSql("q.v", "q.nrm", "c.v", "c.nrm")} AS score,
                         row_number() OVER (PARTITION BY t2.q_id ORDER BY
                           ${cosSql("q.v", "q.nrm", "c.v", "c.nrm")} DESC,
                           t2.c_id ASC) AS rn
                  FROM t2 JOIN n c ON c.vec_id = t2.c_id
                          JOIN qset q ON q.vec_id = t2.q_id)
                WHERE rn <= 5),
         ex AS (SELECT q_id, c_id, rn AS exact_rank FROM (
                  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                         row_number() OVER (PARTITION BY q.vec_id ORDER BY
                           ${cosSql("q.v", "q.nrm", "c.v", "c.nrm")} DESC,
                           c.vec_id ASC) AS rn
                  FROM qset q CROSS JOIN n c)
                WHERE rn <= 5)
         SELECT t3.q_id, CAST(t3.rnk AS BIGINT) AS "rank", t3.c_id, t3.score,
                CAST(coalesce(ex.exact_rank, 0) AS BIGINT) AS exact_rank
         FROM t3 LEFT JOIN ex ON ex.q_id = t3.q_id AND ex.c_id = t3.c_id
         ORDER BY t3.q_id, t3.rnk""",
    "q148_label_match_cooc" -> labelMatchCoocOracle) ++
    modelOracles

  /** q127: the q53 recursive-closure clusters with the representative
    * re-picked by max score (text length; ties → min id) — both the
    * closure and the argmax replayed in SQL. */
  private def clusterCanonicalOracle: String = {
    val pairs = minhashPairsOracle(corpusCte = boilerplateCorpusSql,
      source = "corpus", cap = None)
    s"""WITH RECURSIVE p AS (
         SELECT id_a, id_b FROM ($pairs)
       ), sym AS (
         SELECT id_a AS u, id_b AS v FROM p
         UNION
         SELECT id_b AS u, id_a AS v FROM p
       ), reach(u, v) AS (
         SELECT u, v FROM sym
         UNION
         SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
       ), lbl AS (
         SELECT u AS node, least(u, min(v)) AS cluster_id
         FROM reach GROUP BY u
       ), d AS (
         SELECT doc_id, CAST(length(text) AS BIGINT) AS score FROM documents
         UNION ALL
         SELECT 10000000 + r AS doc_id,
                CAST(length('$boilerplateText') AS BIGINT) AS score
         FROM range(1, 13) t(r)
       ), cl AS (
         SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id,
                d.score
         FROM d LEFT JOIN lbl l ON l.node = d.doc_id
       ), rk AS (
         SELECT *, row_number() OVER (PARTITION BY cluster_id
                     ORDER BY score DESC, doc_id) AS rn
         FROM cl
       ), best AS (
         SELECT cluster_id, doc_id AS keep_id FROM rk WHERE rn = 1
       )
       SELECT c.doc_id, c.cluster_id, c.score, b.keep_id,
              c.doc_id = b.keep_id AS keep
       FROM cl c JOIN best b USING (cluster_id)
       ORDER BY doc_id"""
  }
}
