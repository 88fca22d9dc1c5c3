package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.embed.HashingEmbedder
import graft.functions.GraftUdfs
import graft.operators.{Analyze, Ann, Bpe, Cluster, Dedup, Graph, Matcher, Multimodal, Scrub, Sketch, TextAnalysis, UrlOps}
import graft.streaming.StreamOps

/** The oracle registry: one DuckDB SQL twin per query in [[SparkEntry.queries]] (the driver's hash-parity gate). */
private[graft] trait EntryOracleSql { this: SparkEntry.type =>

  /** The q192-changelog FULL post-image per-status view — the shared
    * oracle of q196 (batch incremental view) and q204 (streaming CDC
    * merge): three Spark computation paths, one answer. */
  private val cdcPostImageViewOracle: String =
    """WITH base AS (
         SELECT o_orderkey AS k,
                CAST(-9223372036854775808 AS BIGINT) AS seq,
                'I' AS op, o_orderstatus AS st,
                CAST(round(o_totalprice * 100) AS BIGINT) AS pc
         FROM orders
       ), upd AS (
         SELECT o_orderkey, CAST(1 AS BIGINT), 'U', 'X',
                CAST(round(o_totalprice * 100) AS BIGINT) + 100
         FROM orders WHERE o_orderkey % 7 = 0
       ), del AS (
         SELECT o_orderkey, CAST(2 AS BIGINT), 'D', '',
                CAST(0 AS BIGINT)
         FROM orders WHERE o_orderkey % 11 = 0
       ), ins AS (
         SELECT o_orderkey + 100000000, CAST(1 AS BIGINT), 'I', 'N',
                CAST(4200 AS BIGINT)
         FROM orders WHERE o_orderkey % 13 = 0
       ), allrows AS (
         SELECT * FROM base UNION ALL SELECT * FROM upd
         UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ins
       ), last AS (
         SELECT * FROM allrows
         QUALIFY row_number() OVER (PARTITION BY k ORDER BY seq DESC) = 1
       )
       SELECT st AS o_orderstatus,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(pc) AS BIGINT) AS sum_cents
       FROM last WHERE op <> 'D'
       GROUP BY st ORDER BY st"""

  /** The q229-q231 corpus: documents + the planted long-dup docs —
    * the VALUES rows interpolate the SAME Scala constants
    * ([[longDupPassage]]/[[longDupInner]]) the Spark builders plant,
    * so engine and oracle read one corpus definition. */
  private def suffixCorpusCte: String =
    s"""corpus AS (
       |           SELECT doc_id, text FROM documents
       |           UNION ALL
       |           SELECT * FROM (VALUES
       |             (20000001, 'alpha head $longDupPassage alpha tail'),
       |             (20000002, 'beta intro $longDupPassage beta ending words'),
       |             (20000003, '$longDupPassage gamma afterword'),
       |             (20000004, 'delta ${longDupInner}interlude ${longDupInner}coda'))
       |             AS v(doc_id, text)
       |         )""".stripMargin

  /** The q234-q237 expected-block set, rebuilt from [[htmlCorpus]]'s
    * construction arithmetic — the oracle never parses HTML: it knows
    * exactly which blocks the planted template yields per doc (title,
    * nav variant, main div with the decoded entity/CDATA tails, the
    * mod-5 promo, the mod-4 summary, the disclaimer, the footer),
    * with block indices shifted by the optional branches. `n_chars`
    * counts non-space chars (document texts are single-spaced ASCII
    * with no tabs/newlines — verified at all SFs); the regexp
    * collapse mirrors the parser's whitespace-run collapsing at the
    * summary's substr(40) junction. */
  private def htmlBlocksCte: String =
    s"""d AS (SELECT doc_id, text FROM documents
       |         ), b AS (
       |           SELECT doc_id, CAST(0 AS BIGINT) AS block_idx,
       |                  'Doc ' || CAST(doc_id AS VARCHAR) AS raw,
       |                  CAST(0 AS BIGINT) AS link_chars
       |           FROM d
       |           UNION ALL
       |           SELECT doc_id, CAST(1 AS BIGINT),
       |                  'home about pages' || CASE WHEN doc_id % 3 = 0
       |                    THEN ' contact us' ELSE '' END,
       |                  CAST(CASE WHEN doc_id % 3 = 0 THEN 23 ELSE 14 END
       |                    AS BIGINT)
       |           FROM d
       |           UNION ALL
       |           SELECT doc_id, CAST(2 AS BIGINT),
       |                  text || ' & tail AB marker' ||
       |                    CASE WHEN doc_id % 7 = 0
       |                      THEN ' raw < & data' ELSE '' END,
       |                  CAST(0 AS BIGINT)
       |           FROM d
       |           UNION ALL
       |           SELECT doc_id, CAST(3 AS BIGINT), 'buy now limited offer',
       |                  CAST(6 AS BIGINT)
       |           FROM d WHERE doc_id % 5 = 0
       |           UNION ALL
       |           SELECT doc_id,
       |                  CAST(3 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
       |                    AS BIGINT),
       |                  'summary: ' || substr(text, 1, 40) || ' 1 < 2 ok',
       |                  CAST(0 AS BIGINT)
       |           FROM d WHERE doc_id % 4 = 0
       |           UNION ALL
       |           SELECT doc_id,
       |                  CAST(3 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
       |                         + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END
       |                    AS BIGINT),
       |                  '$htmlDisclaimer', CAST(0 AS BIGINT)
       |           FROM d
       |           UNION ALL
       |           SELECT doc_id,
       |                  CAST(4 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
       |                         + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END
       |                    AS BIGINT),
       |                  'terms privacy site map &copy; 2026',
       |                  CAST(19 AS BIGINT)
       |           FROM d
       |         ), blk AS (
       |           SELECT doc_id, block_idx,
       |                  trim(regexp_replace(raw, ' +', ' ', 'g')) AS text,
       |                  CAST(length(replace(raw, ' ', '')) AS BIGINT)
       |                    AS n_chars,
       |                  link_chars
       |           FROM b
       |         ), rep AS (
       |           SELECT doc_id, block_idx, text, n_chars, link_chars,
       |                  link_chars * 1000000 // n_chars
       |                    AS link_density_micros,
       |                  (n_chars >= 10 AND
       |                   link_chars * 1000000 // n_chars <= 300000) AS kept
       |           FROM blk
       |         )""".stripMargin

  /** q235 AND q240 (batch and streaming extraction share one oracle —
    * two engine paths, one answer). */
  private def htmlExtractOracle: String =
    s"""WITH $htmlBlocksCte, tot AS (
         SELECT doc_id, count(*) AS n_blocks FROM rep GROUP BY doc_id
       ), k AS (
         SELECT doc_id, count(*) AS n_kept,
                CAST(sum(n_chars) AS BIGINT) AS main_chars,
                string_agg(text, chr(10) ORDER BY block_idx) AS main_text
         FROM rep WHERE kept GROUP BY doc_id
       )
       SELECT d.doc_id,
              CAST(coalesce(t.n_blocks, 0) AS BIGINT) AS n_blocks,
              CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
              CAST(coalesce(k.main_chars, 0) AS BIGINT) AS main_chars,
              coalesce(k.main_text, '') AS main_text
       FROM (SELECT DISTINCT doc_id FROM d) d
       LEFT JOIN tot t ON t.doc_id = d.doc_id
       LEFT JOIN k ON k.doc_id = d.doc_id
       ORDER BY d.doc_id"""

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
    "q166_stream_holt" ->
      """WITH RECURSIVE x AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                  CAST(value AS DOUBLE) AS x
           FROM events WHERE event_type IN ('signup', 'purchase')
         ), seq AS (
           SELECT *, row_number() OVER (PARTITION BY user_id
                       ORDER BY ts_us, event_id) AS rn
           FROM x
         ), hw AS (
           SELECT user_id, event_id, ts_us, rn, x,
                  x AS level, CAST(0.0 AS DOUBLE) AS trend
           FROM seq WHERE rn = 1
           UNION ALL
           SELECT user_id, event_id, ts_us, rn, x, lvl AS level,
                  0.25 * (lvl - prev_level) + 0.75 * prev_trend AS trend
           FROM (
             SELECT q.user_id, q.event_id, q.ts_us, q.rn, q.x,
                    hw.level AS prev_level, hw.trend AS prev_trend,
                    0.25 * q.x + 0.75 * (hw.level + hw.trend) AS lvl
             FROM seq q JOIN hw ON q.user_id = hw.user_id
                                AND q.rn = hw.rn + 1)
         )
         SELECT user_id, event_id, ts_us, level, trend
         FROM hw ORDER BY user_id, ts_us, event_id""",
    "q169_ams_f2" ->
      """WITH toks AS (
           SELECT source,
                  unnest(string_split_regex(lower(text), '\s+')) AS tok
           FROM documents
         ), freq AS (
           SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
           FROM toks WHERE tok <> '' GROUP BY 1, 2
         ), ex AS (
           SELECT source, CAST(sum(cnt * cnt) AS BIGINT) AS f2_exact
           FROM freq GROUP BY 1
         ), sg AS (
           SELECT source, tok, cnt, h,
                  CASE WHEN ('0x' || substr(md5('ams:' || CAST(h AS VARCHAR)
                             || ':' || tok), 1, 14))::BIGINT % 2 = 0
                       THEN 1 ELSE -1 END AS sgn
           FROM freq CROSS JOIN (SELECT unnest(range(0, 8)) AS h)
         ), ss AS (
           SELECT source, h, CAST(sum(sgn * cnt) AS BIGINT) AS s
           FROM sg GROUP BY 1, 2
         ), es AS (
           SELECT source, CAST(sum(s * s) AS BIGINT) AS est_num
           FROM ss GROUP BY 1
         )
         SELECT e.source, e.f2_exact,
                CAST(es.est_num // 8 AS BIGINT) AS ams_est
         FROM ex e JOIN es USING (source) ORDER BY source""",
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
    "q152_bpe_encode" -> bpeEncodeOracle(iterations = 8),
    "q168_schema_evolution" ->
      """SELECT doc_id, md5(text) AS text_md5,
                CASE WHEN doc_id % 2 = 1 THEN lang ELSE NULL END AS lang,
                doc_id % 2 = 1 AS has_lang
         FROM documents ORDER BY doc_id""",
    "q156_orc_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
         FROM documents ORDER BY doc_id""",
    "q154_quality_train" ->
      sigmoidGdOracle(rounds = 8, lr = "4.0", apply = false),
    "q155_quality_scores" ->
      sigmoidGdOracle(rounds = 8, lr = "4.0", apply = true),
    "q157_stream_quality_gate" ->
      sigmoidGdOracle(rounds = 8, lr = "4.0", apply = true, withWave = true),
    "q159_curation_trained_gate" ->
      trainedCurationOracle(rounds = 8, lr = "4.0"),
    "q160_quality_train_grouped" ->
      sigmoidGdGroupedOracle(rounds = 8, lr = "4.0"),
    "q161_quality_calibration" ->
      sigmoidCalibrationOracle(rounds = 8, lr = "4.0"),
    "q162_quality_auc" ->
      sigmoidAucOracle(rounds = 8, lr = "4.0"),
    "q188_quality_cv" ->
      sigmoidCvOracle(folds = 3, rounds = 8, lr = "4.0"),
    "q167_mmr_selection" -> mmrOracle(k = 8),
    "q163_quality_warm_start" ->
      sigmoidGdWarmOracle(p1 = 8, p2 = 4, lr = "4.0"),
    "q164_stream_drift_monitor" ->
      s"""WITH m AS (
           SELECT (doc_id // 20) % 2 AS wave,
                  CAST(length(text) AS BIGINT) AS nc,
                  CAST(len(string_split_regex(lower(text), '\\s+'))
                       AS BIGINT) AS nw,
                  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                       AS BIGINT) AS na,
                  CAST(len(list_filter(string_split_regex(lower(text),
                    '\\s+'), x -> x IN ($stopwordsSqlList))) AS BIGINT) AS ns
           FROM documents
         )
         SELECT CAST(wave AS BIGINT) AS wave,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(nc) AS BIGINT) AS chars_sum,
                CAST(sum(nw) AS BIGINT) AS words_sum,
                CAST(sum(na) AS BIGINT) AS alpha_sum,
                CAST(sum(ns) AS BIGINT) AS stop_sum,
                CAST(sum(CASE WHEN na * 100 >= nc * 82 AND nw >= 5
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_label_pos
         FROM m GROUP BY 1 ORDER BY wave""",
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
    "q219_personalized_pagerank" ->
      personalizedPageRankOracle(iterations = 4, damping = 0.85),
    "q165_triangle_count" ->
      """WITH adj AS (
           SELECT l_partkey AS src,
                  lead(l_partkey) OVER (
                    PARTITION BY l_orderkey
                    ORDER BY l_linenumber, l_partkey, l_suppkey) AS dst
           FROM lineitem
         ), und AS (
           SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM adj WHERE dst IS NOT NULL AND src <> dst
         ), deg AS (
           SELECT node, CAST(count(*) AS BIGINT) AS dg
           FROM (SELECT a AS node FROM und
                 UNION ALL SELECT b AS node FROM und)
           GROUP BY 1
         ), orient AS (
           SELECT CASE WHEN da.dg < db.dg
                            OR (da.dg = db.dg AND u.a < u.b)
                       THEN u.a ELSE u.b END AS u,
                  CASE WHEN da.dg < db.dg
                            OR (da.dg = db.dg AND u.a < u.b)
                       THEN u.b ELSE u.a END AS v
           FROM und u JOIN deg da ON da.node = u.a
                      JOIN deg db ON db.node = u.b
         ), ov AS (
           SELECT o.u, o.v, d.dg AS dv
           FROM orient o JOIN deg d ON d.node = o.v
         ), tri AS (
           SELECT e1.u AS t1, e1.v AS t2, e2.v AS t3
           FROM ov e1
           JOIN ov e2 ON e1.u = e2.u
             AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
           JOIN orient e3 ON e3.u = e1.v AND e3.v = e2.v
         )
         SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
         FROM (SELECT t1 AS node FROM tri
               UNION ALL SELECT t2 AS node FROM tri
               UNION ALL SELECT t3 AS node FROM tri)
         GROUP BY 1 ORDER BY node""",
    "q214_clustering_coeff" ->
      """WITH adj AS (
           SELECT l_partkey AS src,
                  lead(l_partkey) OVER (
                    PARTITION BY l_orderkey
                    ORDER BY l_linenumber, l_partkey, l_suppkey) AS dst
           FROM lineitem
         ), und AS (
           SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM adj WHERE dst IS NOT NULL AND src <> dst
         ), deg AS (
           SELECT node, CAST(count(*) AS BIGINT) AS degree
           FROM (SELECT a AS node FROM und
                 UNION ALL SELECT b AS node FROM und)
           GROUP BY 1
         ), orient AS (
           SELECT CASE WHEN da.degree < db.degree
                            OR (da.degree = db.degree AND u.a < u.b)
                       THEN u.a ELSE u.b END AS u,
                  CASE WHEN da.degree < db.degree
                            OR (da.degree = db.degree AND u.a < u.b)
                       THEN u.b ELSE u.a END AS v
           FROM und u JOIN deg da ON da.node = u.a
                      JOIN deg db ON db.node = u.b
         ), ov AS (
           SELECT o.u, o.v, d.degree AS dv
           FROM orient o JOIN deg d ON d.node = o.v
         ), tri AS (
           SELECT e1.u AS t1, e1.v AS t2, e2.v AS t3
           FROM ov e1
           JOIN ov e2 ON e1.u = e2.u
             AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
           JOIN orient e3 ON e3.u = e1.v AND e3.v = e2.v
         ), tc AS (
           SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
           FROM (SELECT t1 AS node FROM tri
                 UNION ALL SELECT t2 AS node FROM tri
                 UNION ALL SELECT t3 AS node FROM tri)
           GROUP BY 1
         )
         SELECT d.node, d.degree,
                coalesce(tc.n_triangles, CAST(0 AS BIGINT)) AS n_triangles,
                CASE WHEN d.degree < 2 THEN NULL
                     ELSE CAST((2000000
                       * coalesce(tc.n_triangles, CAST(0 AS BIGINT)))
                       // (d.degree * (d.degree - 1)) AS BIGINT) END
                  AS lcc_micro
         FROM deg d LEFT JOIN tc ON tc.node = d.node
         ORDER BY d.node""",
    "q108_hll_distinct" -> hllDistinctOracle(p = 6),
    "q110_kmeans" -> kmeansOracle(k = 4, iterations = 3),
    "q111_prefix_jaccard_join" -> prefixJaccardOracle(tauNum = 4, tauDen = 5),
    "q140_prefix_jaccard_collapsed" ->
      prefixJaccardOracle(tauNum = 4, tauDen = 5, collapse = true),
    "q112_stream_hll" -> hllWaveOracle(p = 6),
    "q227_stream_quantiles" -> streamQuantilesOracle,
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
    "q262_corpus_datasheet" ->
      s"""WITH ${datasheetBaseCtes}
         SELECT $datasheetBaseSelect
         FROM agg CROSS JOIN ts ORDER BY n_docs""",
    "q269_datasheet_v2" ->
      s"""WITH ${datasheetBaseCtes},
         $datasheetV2FragCtes
         SELECT $datasheetV2Select
         FROM $datasheetV2From
         ORDER BY n_docs""",
    "q261_temperature_mixture" ->
      """WITH counts AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(round(pow(CAST(count(*) AS DOUBLE), 0.7) * 1e6)
                       AS BIGINT) AS weight_micros
           FROM documents GROUP BY source
         ), tot AS (
           SELECT CAST(sum(weight_micros) AS BIGINT) AS t FROM counts
         ), b AS (
           SELECT source, n_docs, weight_micros,
                  (123 * weight_micros) // t AS base,
                  123 * weight_micros
                    - ((123 * weight_micros) // t) * t AS rem
           FROM counts, tot
         ), l AS (SELECT CAST(123 - sum(base) AS BIGINT) AS lft FROM b),
         r AS (
           SELECT source, n_docs, weight_micros, base,
                  row_number() OVER (ORDER BY rem DESC, source) AS rk
           FROM b
         ), q AS (
           SELECT source, n_docs, weight_micros,
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
         SELECT q.source, q.n_docs, q.weight_micros, q.quota,
                p.picked_n, p.picked_md5
         FROM q JOIN p USING (source) ORDER BY q.source""",
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
    "q158_video_frames" ->
      """WITH d AS (
           SELECT doc_id, 4 + doc_id % 5 AS w, 4 + doc_id % 3 AS h,
                  6 + doc_id % 5 AS nf
           FROM documents
         ), fr AS (
           SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS f FROM d
         ), sampled AS (
           SELECT * FROM fr WHERE f % 2 = 0
         ), px AS (
           SELECT doc_id, w, h, nf, f,
                  unnest(range(0, w * h)) AS i
           FROM sampled
         )
         SELECT doc_id, CAST(w AS BIGINT) AS width,
                CAST(h AS BIGINT) AS height, CAST(nf AS BIGINT) AS n_frames,
                CAST(f AS BIGINT) AS frame_idx,
                CAST(sum((doc_id * 31 + f * 7 + i) % 256) AS BIGINT) AS px_sum
         FROM px GROUP BY doc_id, w, h, nf, f
         ORDER BY doc_id, frame_idx""",
    "q153_wav_features" ->
      """WITH d AS (
           SELECT doc_id, 256 + (doc_id % 64) * 16 AS n FROM documents
         ), s AS (
           SELECT doc_id, n,
                  ((doc_id * 2654435761 + i * 40503) % 65536) - 32768 AS smp
           FROM (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d)
         )
         SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
                CAST(n AS BIGINT) AS n_samples,
                CAST(n * 1000000 // 8000 AS BIGINT) AS duration_us,
                CAST(max(abs(smp)) AS BIGINT) AS peak_abs,
                CAST(sum(smp * smp) AS BIGINT) AS sum_sq,
                CAST(sum(abs(smp)) AS BIGINT) AS sum_abs
         FROM s GROUP BY doc_id, n ORDER BY doc_id""",
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
    "q211_ndcg_matryoshka" -> {
      // the SAME JVM-computed 1/log2(pos+1) weights as the Spark
      // query, printed shortest-roundtrip so DuckDB parses the
      // identical bits (q202's Benford discipline)
      val k = 10
      val w = (1 to k).map(p => 1.0 / (math.log(p + 1.0) / math.log(2.0)))
      val idcg = (1 to k).map(p => (k + 1 - p).toDouble * w(p - 1))
        .reduceLeft(_ + _)
      val posCols = (1 to k).map(p =>
        s"""CAST(sum(CASE WHEN pos = $p THEN rel ELSE 0 END)
                 AS BIGINT) AS r$p""").mkString(",\n                ")
      val dcg = (1 to k).map(p => s"CAST(r$p AS DOUBLE) * ${w(p - 1)}")
        .mkString(" + ")
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
         rel AS (SELECT q_id, c_id, CAST(11 - rnk AS BIGINT) AS rel
                 FROM rf WHERE rnk <= 10),
         st AS (SELECT qt.vec_id AS q_id, c.vec_id AS c_id,
                  ${cosSql("qt.tv", "qt.tnrm", "c.tv", "c.tnrm")} AS score
                FROM qt CROSS JOIN tn c),
         rt AS (SELECT q_id, c_id,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, c_id ASC) AS rnk
                FROM st),
         hits AS (SELECT rt.q_id, rt.rnk AS pos,
                    coalesce(rel.rel, CAST(0 AS BIGINT)) AS rel
                  FROM rt LEFT JOIN rel
                    ON rel.q_id = rt.q_id AND rel.c_id = rt.c_id
                  WHERE rt.rnk <= 10),
         perq AS (SELECT q_id, CAST(sum(rel) AS BIGINT) AS rel_mass,
                $posCols
                  FROM hits GROUP BY q_id)
         SELECT q_id, rel_mass,
                CAST(round(1000000.0 * ($dcg) / $idcg) AS BIGINT)
                  AS ndcg_micro
         FROM perq ORDER BY q_id"""
    },
    "q215_mrr_matryoshka" ->
      s"""$embCte,
         tn AS (SELECT vec_id, v[1:16] AS tv,
                       sqrt(list_dot_product(v[1:16], v[1:16])) AS tnrm FROM e),
         q AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 50 = 0),
         qt AS (SELECT vec_id, tv, tnrm FROM tn WHERE vec_id % 50 = 0),
         sf AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                  ${cosSql("q.v", "q.nrm", "c.v", "c.nrm")} AS score
                FROM q CROSS JOIN n c WHERE c.vec_id <> q.vec_id),
         rf AS (SELECT q_id, c_id,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, c_id ASC) AS rnk
                FROM sf),
         gold AS (SELECT q_id, c_id AS gold_id FROM rf WHERE rnk = 1),
         st AS (SELECT qt.vec_id AS q_id, c.vec_id AS c_id,
                  ${cosSql("qt.tv", "qt.tnrm", "c.tv", "c.tnrm")} AS score
                FROM qt CROSS JOIN tn c WHERE c.vec_id <> qt.vec_id),
         rt AS (SELECT q_id, c_id,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, c_id ASC) AS rnk
                FROM st),
         hit AS (SELECT q_id, c_id AS gold_id, CAST(rnk AS BIGINT) AS pos
                 FROM rt WHERE rnk <= 10)
         SELECT g.q_id, g.gold_id, h.pos,
                coalesce(1000000 // h.pos, CAST(0 AS BIGINT)) AS rr_micro
         FROM gold g LEFT JOIN hit h
           ON h.q_id = g.q_id AND h.gold_id = g.gold_id
         ORDER BY g.q_id""",
    "q147_retrieval_cascade" -> retrievalCascadeOracle(withWave = false),
    "q148_label_match_cooc" -> labelMatchCoocOracle,
    "q256_pq_adc_topk" -> pqAdcOracle(m = 8, subDim = 8, k = 8,
      iterations = 2, topK = 5, salt = "pq"),
    "q257_ivf_pq_topk" -> ivfPqOracle(kCells = 8, coarseIters = 2,
      nProbe = 3, m = 8, subDim = 8, kCodes = 8, pqIters = 2, topK = 5,
      coarseSalt = "ivfpqc", pqSalt = "ivfpq"),
    "q265_ivf_pq_residual" -> ivfPqResidualOracle(kCells = 8,
      coarseIters = 2, nProbe = 3, m = 8, subDim = 8, kCodes = 8,
      pqIters = 2, topK = 5, coarseSalt = "ivfpqc", pqSalt = "ivfpqr"),
    "q273_ivf_pq_rerank" -> {
      val inner = ivfPqResidualOracle(kCells = 8, coarseIters = 2,
        nProbe = 3, m = 8, subDim = 8, kCodes = 8, pqIters = 2,
        topK = 20, coarseSalt = "ivfpqc", pqSalt = "ivfpqr")
      s"""WITH b AS (SELECT * FROM ($inner) t),
         rcv AS (
           SELECT vec_id,
                  list_transform(CAST(embedding AS DOUBLE[]),
                    x -> CAST(round(x * 1000000) AS BIGINT)) AS vq
           FROM embeddings
         ), rqv AS (
           SELECT vec_id AS q_id,
                  list_transform(CAST(embedding AS DOUBLE[]),
                    x -> CAST(round(x * 1000000) AS BIGINT)) AS qq
           FROM embeddings WHERE vec_id % 50 = 0
         ), rd AS (
           SELECT b.q_id, b.vec_id, b."rank" AS adc_rank, b.exact_rank,
                  CAST(list_sum([(q.qq[j] - c.vq[j]) * (q.qq[j] - c.vq[j])
                                 for j in range(1, len(q.qq) + 1)])
                       AS BIGINT) AS dist2_q
           FROM b JOIN rcv c ON c.vec_id = b.vec_id
                  JOIN rqv q ON q.q_id = b.q_id
         ), rr AS (
           SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY dist2_q, vec_id) AS rnk FROM rd
         )
         SELECT q_id, CAST(rnk AS BIGINT) AS "rank", vec_id, dist2_q,
                adc_rank, exact_rank
         FROM rr WHERE rnk <= 5 ORDER BY q_id, rnk"""
    },
    "q266_pq_recall_audit" -> {
      def one(variant: String, kCodes: Int, nProbe: Int): String = {
        val inner =
          if (variant == "raw")
            ivfPqOracle(kCells = 8, coarseIters = 2, nProbe = nProbe,
              m = 8, subDim = 8, kCodes = kCodes, pqIters = 1, topK = 5,
              coarseSalt = "ivfpqc", pqSalt = "ivfpq", qMod = 100)
          else
            ivfPqResidualOracle(kCells = 8, coarseIters = 2,
              nProbe = nProbe, m = 8, subDim = 8, kCodes = kCodes,
              pqIters = 1, topK = 5, coarseSalt = "ivfpqc",
              pqSalt = "ivfpqr", qMod = 100)
        s"""SELECT '$variant' AS variant, 8 AS m, $kCodes AS k_codes,
              $nProbe AS n_probe,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN exact_rank > 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_hits,
              (CAST(sum(CASE WHEN exact_rank > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) * 1000000)
                // CAST(count(*) AS BIGINT) AS recall_micros
           FROM ($inner) b"""
      }
      s"""SELECT * FROM (
           ${one("raw", 8, 3)}
           UNION ALL ${one("residual", 8, 3)}
           UNION ALL ${one("raw", 16, 5)}
           UNION ALL ${one("residual", 16, 5)})
         ORDER BY variant, k_codes, n_probe"""
    },
    "q278_opq_audit" -> {
      def one(variant: String, src: String, pre: String): String = {
        val inner = ivfPqOracle(kCells = 8, coarseIters = 2, nProbe = 3,
          m = 8, subDim = 8, kCodes = 8, pqIters = 1, topK = 5,
          coarseSalt = "ivfpqc", pqSalt = "ivfpq", qMod = 100,
          src = src, preCtes = pre)
        s"""SELECT '$variant' AS variant, 8 AS m, 8 AS k_codes,
              3 AS n_probe,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN exact_rank > 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_hits,
              (CAST(sum(CASE WHEN exact_rank > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) * 1000000)
                // CAST(count(*) AS BIGINT) AS recall_micros
           FROM ($inner) b"""
      }
      s"""SELECT * FROM (
           ${one("raw", "embeddings", "")}
           UNION ALL ${one("opq_permuted", "pemb", opqPermCtes(8, 8))})
         ORDER BY variant"""
    },
    "q279_stream_pq_index" -> pqIndexUpsertOracle,
    "q280_graph_ann" -> {
      val inner = nnDescentOracle(degree = 16, rounds = 2, bands = 2,
        beam = 16, hops = 4, topK = 5, salt = "nnd", qMod = 50)
      s"""SELECT q_id, "rank", vec_id, adc_dist2 AS dist2, exact_rank
         FROM ($inner) t ORDER BY q_id, "rank""""
    },
    "q284_stream_graph_serve" -> {
      // same frozen index + walk as q280; wave derived from the id
      // (the q150/q272 streaming-oracle convention)
      val inner = nnDescentOracle(degree = 16, rounds = 2, bands = 2,
        beam = 16, hops = 4, topK = 5, salt = "nnd", qMod = 50)
      s"""SELECT CAST(CASE WHEN q_id % 100 = 0 THEN 0 ELSE 1 END
                      AS BIGINT) AS wave,
                q_id, "rank", vec_id, adc_dist2 AS dist2, exact_rank
         FROM ($inner) t ORDER BY q_id, "rank""""
    },
    "q149_ivf_cascade" -> ivfCascadeOracle(kCells = 8, iterations = 3,
      nProbe = 3, c2 = 30, k = 5, salt = "ivc"),
    "q150_stream_retrieval" -> retrievalCascadeOracle(withWave = true),
    "q151_minhash_collapsed" -> minhashCollapsedPairsOracle,
    "q170_sorted_neighbor_dedup" ->
      """WITH k AS (
           SELECT doc_id,
                  substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                         1, 24) AS sk
           FROM documents
         ), r AS (
           SELECT doc_id, row_number() OVER (ORDER BY sk, doc_id) AS rn
           FROM k
         ), cand AS (
           SELECT least(a.doc_id, b.doc_id) AS id_a,
                  greatest(a.doc_id, b.doc_id) AS id_b
           FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4
         ), w AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS words
           FROM documents
         ), sh AS (
           SELECT DISTINCT doc_id, unnest(
             CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                  ELSE [array_to_string(words[i:i+2], ' ')
                        for i in range(1, len(words) - 1)]
             END) AS shingle
           FROM w
         ), sets AS (
           SELECT doc_id, list_sort(list(shingle)) AS ks,
                  CAST(count(*) AS BIGINT) AS l
           FROM sh GROUP BY doc_id
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
         WHERE n_inter * 2 >= (n_a + n_b - n_inter) * 1
         ORDER BY id_a, id_b""",
    "q171_weighted_sample" ->
      """WITH h AS (
           SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
                  ('0x' || substr(md5('wsr171:' || CAST(doc_id AS VARCHAR)),
                                  1, 14))::BIGINT AS hv
           FROM documents
           WHERE CAST(n_chars AS DOUBLE) > 0.0
         ), keyed AS (
           SELECT doc_id, weight,
                  CAST(round(ln(CAST(hv + 1 AS DOUBLE)
                                / 72057594037927936.0)
                             / weight * 1000000.0) AS BIGINT) AS key_micro
           FROM h
         )
         SELECT doc_id, weight, key_micro
         FROM keyed
         ORDER BY key_micro DESC, doc_id
         LIMIT 20""",
    "q260_group_weighted_sample" ->
      """WITH h AS (
           SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS weight,
                  ('0x' || substr(md5('wsrg260:' || CAST(doc_id AS VARCHAR)),
                                  1, 14))::BIGINT AS hv
           FROM documents
           WHERE CAST(n_chars AS DOUBLE) > 0.0
         ), keyed AS (
           SELECT source, doc_id, weight,
                  CAST(round(ln(CAST(hv + 1 AS DOUBLE)
                                / 72057594037927936.0)
                             / weight * 1000000.0) AS BIGINT) AS key_micro
           FROM h
         ), rk AS (
           SELECT *, row_number() OVER (PARTITION BY source
                       ORDER BY key_micro DESC, doc_id ASC) AS rn
           FROM keyed
         )
         SELECT source, doc_id, weight, key_micro
         FROM rk WHERE rn <= 5
         ORDER BY source, key_micro DESC, doc_id""",
    "q172_kcore" -> kCoreOracle(k = 3, rounds = 8, knn = 6),
    "q173_stream_weighted_sample" ->
      """WITH d AS (
           SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
                  (doc_id // 20) % 2 AS wave
           FROM documents
           WHERE CAST(n_chars AS DOUBLE) > 0.0
         ), keyed AS (
           SELECT wave, doc_id, weight,
                  CAST(round(ln(CAST(('0x' || substr(md5('wsr173:'
                                  || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
                                + 1 AS DOUBLE)
                                / 72057594037927936.0)
                             / weight * 1000000.0) AS BIGINT) AS key_micro
           FROM d
         ), w0 AS (
           SELECT CAST(0 AS BIGINT) AS wave, doc_id, weight, key_micro
           FROM keyed WHERE wave = 0
           ORDER BY key_micro DESC, doc_id LIMIT 20
         ), w1 AS (
           SELECT CAST(1 AS BIGINT) AS wave, doc_id, weight, key_micro
           FROM keyed
           ORDER BY key_micro DESC, doc_id LIMIT 20
         )
         SELECT * FROM w0
         UNION ALL
         SELECT * FROM w1
         ORDER BY wave, key_micro DESC, doc_id""",
    "q174_hits" -> hitsOracle(iterations = 3),
    "q175_chunk_scrub" ->
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
           SELECT doc_id,
                  unnest([substr(text, b[i] + 1, b[i + 1] - b[i])
                          for i in range(1, len(b))]) AS chunk,
                  unnest(range(1, len(b))) AS pos
           FROM bnd
         ), ch AS (
           SELECT doc_id, pos, chunk, md5(chunk) AS hh
           FROM chunks WHERE chunk <> ''
         ), spread AS (
           SELECT hh, count(DISTINCT doc_id) AS n_docs FROM ch GROUP BY hh
         ), agg AS (
           SELECT c.doc_id,
                  CAST(sum(CASE WHEN s.n_docs < 6 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_kept,
                  CAST(sum(CASE WHEN s.n_docs >= 6 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_dropped,
                  string_agg(CASE WHEN s.n_docs < 6 THEN c.chunk END, ''
                             ORDER BY c.pos) AS clean_text
           FROM ch c JOIN spread s USING (hh)
           GROUP BY c.doc_id
         )
         SELECT d.doc_id,
                coalesce(a.n_kept, CAST(0 AS BIGINT)) AS n_kept,
                coalesce(a.n_dropped, CAST(0 AS BIGINT)) AS n_dropped,
                coalesce(a.clean_text, '') AS clean_text
         FROM corpus d LEFT JOIN agg a USING (doc_id)
         ORDER BY doc_id""",
    "q176_transition_matrix" ->
      """WITH seq AS (
           SELECT user_id, event_type AS from_type,
                  lead(event_type) OVER (
                    PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS to_type
           FROM events
         ), pairs AS (
           SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_trans
           FROM seq WHERE to_type IS NOT NULL
           GROUP BY 1, 2
         ), tot AS (
           SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS t
           FROM pairs GROUP BY 1
         )
         SELECT p.from_type, p.to_type, p.n_trans,
                CAST(round(CAST(p.n_trans AS DOUBLE) * 1000000.0
                           / CAST(t.t AS DOUBLE)) AS BIGINT) AS p_micro
         FROM pairs p JOIN tot t USING (from_type)
         ORDER BY from_type, to_type""",
    "q177_random_walks" ->
      randomWalksOracle(steps = 4, startMod = 50, salt = "walk"),
    "q208_sequential_patterns" ->
      """WITH ranked0 AS (
           SELECT user_id AS k, event_type AS t,
                  row_number() OVER (
                    PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS rn
           FROM events
         ), ranked AS (
           SELECT k, t, CAST(rn AS BIGINT) AS rn FROM ranked0
           WHERE rn <= 12
         ), ext AS (
           SELECT k, t, min(rn) AS f, max(rn) AS l
           FROM ranked GROUP BY k, t
         ), pair AS (
           SELECT a.t AS t1, b.t AS t2, CAST(count(*) AS BIGINT) AS support
           FROM ext a JOIN ext b ON a.k = b.k AND a.f < b.l
           GROUP BY a.t, b.t
         ), minafter AS (
           SELECT a.k, a.t AS t1, r.t AS t2, min(r.rn) AS mid
           FROM ext a JOIN ranked r ON a.k = r.k AND r.rn > a.f
           GROUP BY a.k, a.t, r.t
         ), triple AS (
           SELECT m.t1, m.t2, c.t AS t3, CAST(count(*) AS BIGINT) AS support
           FROM minafter m JOIN ext c ON m.k = c.k AND m.mid < c.l
           GROUP BY m.t1, m.t2, c.t
         )
         SELECT t1, t2, CAST(NULL AS VARCHAR) AS t3, support
         FROM pair WHERE support >= 5
         UNION ALL
         SELECT t1, t2, t3, support FROM triple WHERE support >= 5
         ORDER BY t1, t2, t3 NULLS FIRST""",
    "q178_ams_join_size" ->
      """WITH fa AS (
           SELECT l_partkey AS it, CAST(count(*) AS BIGINT) AS w
           FROM lineitem GROUP BY 1
         ), fb AS (
           SELECT l_partkey AS it, CAST(count(*) AS BIGINT) AS w
           FROM lineitem WHERE l_quantity < 10 GROUP BY 1
         ), ex AS (
           SELECT CAST(sum(fa.w * fb.w) AS BIGINT) AS exact_join_size
           FROM fa JOIN fb USING (it)
         ), sa AS (
           SELECT h, CAST(sum(CASE WHEN ('0x' || substr(md5('amsj:'
                        || CAST(h AS VARCHAR) || ':'
                        || CAST(it AS VARCHAR)), 1, 14))::BIGINT % 2 = 0
                      THEN w ELSE -w END) AS BIGINT) AS s
           FROM fa CROSS JOIN (SELECT unnest(range(0, 16)) AS h)
           GROUP BY h
         ), sb AS (
           SELECT h, CAST(sum(CASE WHEN ('0x' || substr(md5('amsj:'
                        || CAST(h AS VARCHAR) || ':'
                        || CAST(it AS VARCHAR)), 1, 14))::BIGINT % 2 = 0
                      THEN w ELSE -w END) AS BIGINT) AS s
           FROM fb CROSS JOIN (SELECT unnest(range(0, 16)) AS h)
           GROUP BY h
         ), num AS (
           SELECT CAST(sum(sa.s * sb.s) AS BIGINT) AS n
           FROM sa JOIN sb USING (h)
         )
         SELECT e.exact_join_size,
                CAST(floor(CAST(n.n AS DOUBLE) / 16) AS BIGINT)
                  AS join_size_est
         FROM ex e CROSS JOIN num n""",
    "q179_winsorized_stats" ->
      """WITH b AS (
           SELECT event_type,
                  quantile_cont(value, 0.05) AS lo,
                  quantile_cont(value, 0.95) AS hi
           FROM events GROUP BY 1
         )
         SELECT e.event_type,
                CAST(count(*) AS BIGINT) AS n,
                min(b.lo) AS lo, min(b.hi) AS hi,
                CAST(sum(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_clipped_lo,
                CAST(sum(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_clipped_hi,
                CAST(sum(CAST(round(least(greatest(e.value, b.lo), b.hi)
                                    * 100.0) AS BIGINT)) AS BIGINT)
                  AS win_sum_cents
         FROM events e JOIN b USING (event_type)
         GROUP BY 1 ORDER BY 1""",
    "q180_skew_join" ->
      """WITH f AS (
           SELECT CASE WHEN l_orderkey % 4 <> 0 THEN -1
                       ELSE l_orderkey % 97 END AS skew_key,
                  l_quantity
           FROM lineitem
         ), d AS (
           SELECT CASE WHEN o_orderkey % 4 <> 0 THEN -1
                       ELSE o_orderkey % 97 END AS skew_key,
                  CAST(count(*) AS BIGINT) AS o_cnt
           FROM orders GROUP BY 1
         )
         SELECT f.skew_key,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(f.l_quantity AS BIGINT)) AS BIGINT)
                  AS sum_qty,
                min(d.o_cnt) AS o_cnt
         FROM f JOIN d USING (skew_key)
         GROUP BY 1 ORDER BY 1""",
    "q181_inverted_index" ->
      """WITH tf AS (
           SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id,
                        unnest(string_split_regex(lower(text), '\s+'))
                          AS term
                 FROM documents) u
           WHERE term <> ''
           GROUP BY 1, 2
         ), lagged AS (
           SELECT term, doc_id, tf,
                  coalesce(lag(doc_id) OVER (PARTITION BY term
                                             ORDER BY doc_id), 0)
                    AS prev_doc
           FROM tf
         )
         SELECT term,
                CAST(count(*) AS BIGINT) AS df_docs,
                CAST(sum(tf) AS BIGINT) AS tf_total,
                string_agg(CAST(doc_id - prev_doc AS VARCHAR) || ':'
                             || CAST(tf AS VARCHAR),
                           ',' ORDER BY doc_id) AS postings
         FROM lagged
         GROUP BY term
         ORDER BY term""",
    "q182_pareto_frontier" ->
      """WITH pts AS (
           SELECT user_id,
                  CAST(count(*) AS BIGINT) AS n_events,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS value_cents
           FROM events GROUP BY 1
         ), cand AS (
           SELECT DISTINCT n_events, value_cents FROM pts
         )
         SELECT c.n_events, c.value_cents
         FROM cand c
         WHERE NOT EXISTS (
           SELECT 1 FROM cand d
           WHERE d.n_events >= c.n_events AND d.value_cents >= c.value_cents
             AND (d.n_events > c.n_events OR d.value_cents > c.value_cents))
         ORDER BY c.n_events""",
    "q183_stream_holt_winters" ->
      """WITH RECURSIVE hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS h,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                    AS x
           FROM events GROUP BY 1, 2
         ), seq AS (
           SELECT event_type, x,
                  CAST(row_number() OVER (PARTITION BY event_type
                                          ORDER BY h) AS BIGINT) AS rn
           FROM hourly
         ), hw AS (
           SELECT event_type, rn, x, x AS level,
                  CAST(0.0 AS DOUBLE) AS trend,
                  CAST(0.0 AS DOUBLE) AS seasonal,
                  list_transform(range(24), i -> CAST(0.0 AS DOUBLE))
                    AS seas
           FROM seq WHERE rn = 1
           UNION ALL
           SELECT event_type, rn, x, lvl AS level,
                  0.125 * (lvl - prev_level) + 0.875 * prev_trend AS trend,
                  0.25 * (x - lvl) + 0.75 * sp AS seasonal,
                  seas[1:idx - 1] || [0.25 * (x - lvl) + 0.75 * sp]
                    || seas[idx + 1:24] AS seas
           FROM (
             SELECT q.event_type, q.rn, q.x,
                    h.level AS prev_level, h.trend AS prev_trend,
                    h.seas AS seas,
                    CAST((q.rn - 1) % 24 AS INT) + 1 AS idx,
                    h.seas[CAST((q.rn - 1) % 24 AS INT) + 1] AS sp,
                    0.25 * (q.x - h.seas[CAST((q.rn - 1) % 24 AS INT) + 1])
                      + 0.75 * (h.level + h.trend) AS lvl
             FROM seq q JOIN hw h ON q.event_type = h.event_type
                                 AND q.rn = h.rn + 1)
         )
         SELECT event_type, rn, level, trend, seasonal FROM hw
         ORDER BY event_type, rn""",
    "q184_cube" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT)
                  AS gid,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS rev_cents,
                CAST(count(*) AS BIGINT) AS n_rows
         FROM lineitem
         GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag, l_linestatus""",
    "q216_rollup" ->
      """SELECT r_name, n_name, c_mktsegment,
                CAST(GROUPING(r_name, n_name, c_mktsegment) AS BIGINT)
                  AS gid,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS rev_cents,
                CAST(count(*) AS BIGINT) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name, c_mktsegment)
         ORDER BY gid, r_name, n_name, c_mktsegment""",
    "q185_dataset_digest" ->
      """WITH h AS (
           SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                     || text), 1, 14))::BIGINT AS h
           FROM documents
         )
         SELECT CAST(h % 16 AS BIGINT) AS shard,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(bit_xor(h) AS BIGINT) AS digest
         FROM h
         GROUP BY ROLLUP (shard)
         ORDER BY shard""",
    "q186_association_rules" ->
      """WITH b AS (
           SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
           FROM lineitem
         ), n AS (
           SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n FROM b
         ), supp AS (
           SELECT it, CAST(count(*) AS BIGINT) AS s FROM b GROUP BY 1
         ), pairs AS (
           SELECT x.it AS item_a, y.it AS item_b,
                  CAST(count(*) AS BIGINT) AS supp_ab
           FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
           GROUP BY 1, 2
           HAVING count(*) >= 2
         )
         SELECT p.item_a, p.item_b, p.supp_ab,
                sa.s AS supp_a, sb.s AS supp_b,
                CAST(floor(p.supp_ab * 1000000 / sa.s) AS BIGINT)
                  AS conf_micros,
                CAST(floor(p.supp_ab * 1000000 * n.n / (sa.s * sb.s))
                     AS BIGINT) AS lift_micros
         FROM pairs p
         JOIN supp sa ON sa.it = p.item_a
         JOIN supp sb ON sb.it = p.item_b
         CROSS JOIN n
         ORDER BY p.item_a, p.item_b""",
    "q187_expectations" ->
      """WITH checks AS (
           SELECT 'not_null:o_custkey' AS check_name,
                  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS violations,
                  CAST(count(*) AS BIGINT) AS n_rows,
                  CAST(0 AS BIGINT) AS threshold_micros
           FROM orders
           UNION ALL
           SELECT 'unique:o_orderkey',
                  CAST(count(o_orderkey) - count(DISTINCT o_orderkey)
                       AS BIGINT),
                  CAST(count(*) AS BIGINT), CAST(0 AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'range:o_totalprice:1.0-600000.0',
                  CAST(sum(CASE WHEN o_totalprice < 1.0
                                  OR o_totalprice > 600000.0
                                THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(count(*) AS BIGINT), CAST(0 AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'range:o_totalprice:1.0-200000.0',
                  CAST(sum(CASE WHEN o_totalprice < 1.0
                                  OR o_totalprice > 200000.0
                                THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(count(*) AS BIGINT), CAST(100000 AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'accepted:o_orderstatus',
                  CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                                THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(count(*) AS BIGINT), CAST(0 AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'fk:o_custkey',
                  CAST(sum(CASE WHEN NOT EXISTS (
                           SELECT 1 FROM customer c
                           WHERE c.c_custkey = o.o_custkey)
                                THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(count(*) AS BIGINT), CAST(0 AS BIGINT)
           FROM orders o
         )
         SELECT check_name, violations, n_rows,
                CAST(floor(violations * 1000000 / n_rows) AS BIGINT)
                  AS rate_micros,
                threshold_micros,
                CAST(floor(violations * 1000000 / n_rows) AS BIGINT)
                  <= threshold_micros AS pass
         FROM checks ORDER BY check_name""",
    "q189_attribution" ->
      """WITH conv AS (
           SELECT user_id, epoch_us(ts) AS ct, event_id AS cid,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'
         ), tch AS (
           SELECT user_id, epoch_us(ts) AS tt
           FROM events WHERE event_type = 'click'
         ), pc AS (
           SELECT c.user_id, c.cid, c.cents,
                  CAST(sum(CASE WHEN t.tt IS NOT NULL AND t.tt < c.ct
                                     AND t.tt >= c.ct - 21600000000
                                THEN 1 ELSE 0 END) AS BIGINT) AS k
           FROM conv c LEFT JOIN tch t USING (user_id)
           GROUP BY 1, 2, 3
         )
         SELECT user_id,
                CAST(count(*) AS BIGINT) AS n_conversions,
                CAST(sum(CASE WHEN k > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_attributed,
                CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_orphans,
                CAST(sum(k) AS BIGINT) AS touches_total,
                CAST(sum(CASE WHEN k > 0 THEN cents ELSE 0 END) AS BIGINT)
                  AS attributed_cents,
                CAST(sum(CASE WHEN k > 0
                              THEN CAST(floor(cents / k) AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS first_touch_cents,
                CAST(sum(CASE WHEN k > 0
                              THEN cents - (k - 1)
                                   * CAST(floor(cents / k) AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS last_touch_cents
         FROM pc GROUP BY 1 ORDER BY 1""",
    "q190_bfs_distances" -> {
      val roundCtes = (1 to 4).map { i =>
        s"""f$i AS (
             SELECT DISTINCT e.d AS node FROM f${i - 1} f
             JOIN e ON f.node = e.s
             WHERE e.d NOT IN (SELECT node FROM s${i - 1})
           ), s$i AS (
             SELECT * FROM s${i - 1}
             UNION ALL
             SELECT node, CAST($i AS BIGINT) AS dist FROM f$i
           )"""
      }.mkString(", ")
      s"""WITH adj AS (
           SELECT l_partkey AS src,
                  lead(l_partkey) OVER (
                    PARTITION BY l_orderkey
                    ORDER BY l_linenumber, l_partkey, l_suppkey) AS dst
           FROM lineitem
         ), e AS (
           SELECT DISTINCT src AS s, dst AS d
           FROM (SELECT src, dst FROM adj
                 WHERE dst IS NOT NULL AND src <> dst
                 UNION ALL
                 SELECT dst, src FROM adj
                 WHERE dst IS NOT NULL AND src <> dst)
         ), s0 AS (
           SELECT DISTINCT p_partkey AS node, CAST(0 AS BIGINT) AS dist
           FROM part WHERE p_partkey % 500 = 0
         ), f0 AS (
           SELECT node FROM s0
         ), $roundCtes
         SELECT node, dist FROM s4 ORDER BY node"""
    },
    "q207_image_ahash_neardup" -> {
      // closed-form pixel → integer cell threshold → packed 60-bit
      // aHash → the simhash-oracle slice-join union, hamming ≤ 6
      val unions = (0 until 4).map { sl =>
        s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming
            FROM sb a JOIN sb b
              ON ((a.ahash >> ${sl * 15}) & 32767) = ((b.ahash >> ${sl * 15}) & 32767)
             AND a.doc_id < b.doc_id"""
      }.mkString(" UNION ")
      s"""WITH px0 AS (
           SELECT doc_id,
                  (y.y // 2) * 10 + (x.x // 2) AS bi,
                  y.y * 20 + x.x AS pos,
                  ('0x' || substr(md5(CAST(doc_id // 4 AS VARCHAR) || ':' ||
                     CAST(y.y * 20 + x.x AS VARCHAR)), 1, 2))::INTEGER AS hb
           FROM documents, range(20) x(x), range(12) y(y)
         ), px AS (
           SELECT doc_id, bi,
                  CASE WHEN pos = (doc_id * 17) % 240
                       THEN (hb + 128) % 256 ELSE hb END AS p
           FROM px0
         ), blk AS (
           SELECT doc_id, bi, CAST(sum(p) AS BIGINT) AS bs
           FROM px GROUP BY doc_id, bi
         ), tot AS (
           SELECT doc_id, CAST(sum(p) AS BIGINT) AS ts
           FROM px GROUP BY doc_id
         ), sb AS (
           SELECT b.doc_id,
                  CAST(sum(CASE WHEN b.bs * 60 > t.ts
                                THEN (1::BIGINT << b.bi)
                                ELSE 0::BIGINT END) AS BIGINT) AS ahash
           FROM blk b JOIN tot t ON b.doc_id = t.doc_id
           GROUP BY b.doc_id
         ), pairs AS ($unions)
         SELECT id_a, id_b, hamming FROM pairs
         WHERE hamming <= 6 ORDER BY id_a, id_b"""
    },
    "q205_label_propagation" -> {
      // three synchronous LPA rounds, each the literal two-step
      // max-count / min-label argmax the Spark operator runs
      val roundCtes = (1 to 3).map { i =>
        s"""c$i AS (
             SELECT e.s, l.label, CAST(count(*) AS BIGINT) AS c
             FROM e JOIN l${i - 1} l ON e.d = l.node
             GROUP BY e.s, l.label
           ), m$i AS (
             SELECT s, max(c) AS mc FROM c$i GROUP BY s
           ), u$i AS (
             SELECT c.s, min(c.label) AS nl
             FROM c$i c JOIN m$i m ON c.s = m.s AND c.c = m.mc
             GROUP BY c.s
           ), l$i AS (
             SELECT l.node, coalesce(u.nl, l.label) AS label
             FROM l${i - 1} l LEFT JOIN u$i u ON l.node = u.s
           )"""
      }.mkString(", ")
      s"""WITH adj AS (
           SELECT l_partkey AS src,
                  lead(l_partkey) OVER (
                    PARTITION BY l_orderkey
                    ORDER BY l_linenumber, l_partkey, l_suppkey) AS dst
           FROM lineitem
         ), e AS (
           SELECT DISTINCT src AS s, dst AS d
           FROM (SELECT src, dst FROM adj
                 WHERE dst IS NOT NULL AND src <> dst
                 UNION ALL
                 SELECT dst, src FROM adj
                 WHERE dst IS NOT NULL AND src <> dst)
         ), l0 AS (
           SELECT node, node AS label
           FROM (SELECT DISTINCT s AS node FROM e
                 UNION SELECT DISTINCT d FROM e)
         ), $roundCtes
         SELECT node, label FROM l3 ORDER BY node"""
    },
    "q220_modularity" -> {
      // the q205 LPA trajectory replayed verbatim, then the exact
      // Newman-Girvan per-community arithmetic over the canonical
      // undirected edge set
      val roundCtes = (1 to 3).map { i =>
        s"""c$i AS (
             SELECT e.s, l.label, CAST(count(*) AS BIGINT) AS c
             FROM e JOIN l${i - 1} l ON e.d = l.node
             GROUP BY e.s, l.label
           ), m$i AS (
             SELECT s, max(c) AS mc FROM c$i GROUP BY s
           ), u$i AS (
             SELECT c.s, min(c.label) AS nl
             FROM c$i c JOIN m$i m ON c.s = m.s AND c.c = m.mc
             GROUP BY c.s
           ), l$i AS (
             SELECT l.node, coalesce(u.nl, l.label) AS label
             FROM l${i - 1} l LEFT JOIN u$i u ON l.node = u.s
           )"""
      }.mkString(", ")
      s"""WITH adj AS (
           SELECT l_partkey AS src,
                  lead(l_partkey) OVER (
                    PARTITION BY l_orderkey
                    ORDER BY l_linenumber, l_partkey, l_suppkey) AS dst
           FROM lineitem
         ), e AS (
           SELECT DISTINCT src AS s, dst AS d
           FROM (SELECT src, dst FROM adj
                 WHERE dst IS NOT NULL AND src <> dst
                 UNION ALL
                 SELECT dst, src FROM adj
                 WHERE dst IS NOT NULL AND src <> dst)
         ), l0 AS (
           SELECT node, node AS label
           FROM (SELECT DISTINCT s AS node FROM e
                 UNION SELECT DISTINCT d FROM e)
         ), $roundCtes, und AS (
           SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM e
         ), mm AS (
           SELECT CAST(count(*) AS BIGINT) AS m FROM und
         ), ein AS (
           SELECT la.label, CAST(count(*) AS BIGINT) AS e_in
           FROM und u JOIN l3 la ON la.node = u.a
                      JOIN l3 lb ON lb.node = u.b
           WHERE la.label = lb.label
           GROUP BY la.label
         ), deg AS (
           SELECT node, CAST(count(*) AS BIGINT) AS dg
           FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
           GROUP BY node
         ), dt AS (
           SELECT l.label, CAST(count(*) AS BIGINT) AS n_nodes,
                  CAST(sum(d.dg) AS BIGINT) AS d_tot
           FROM deg d JOIN l3 l ON l.node = d.node
           GROUP BY l.label
         )
         SELECT dt.label, dt.n_nodes,
                coalesce(ein.e_in, CAST(0 AS BIGINT)) AS e_in, dt.d_tot,
                CAST(4 * mm.m * coalesce(ein.e_in, CAST(0 AS BIGINT))
                     - dt.d_tot * dt.d_tot AS BIGINT) AS contrib_scaled,
                CAST(round(1000000.0
                  * CAST(4 * mm.m * coalesce(ein.e_in, CAST(0 AS BIGINT))
                         - dt.d_tot * dt.d_tot AS DOUBLE)
                  / (4.0 * CAST(mm.m * mm.m AS DOUBLE))) AS BIGINT)
                  AS q_contrib_micro
         FROM dt LEFT JOIN ein ON ein.label = dt.label CROSS JOIN mm
         ORDER BY dt.label"""
    },
    "q206_sssp_bounded" -> {
      // four unrolled Bellman-Ford sweeps over exact integer weights
      val roundCtes = (1 to 4).map { i =>
        s"""d$i AS (
             SELECT node, CAST(min(dist) AS BIGINT) AS dist
             FROM (SELECT node, dist FROM d${i - 1}
                   UNION ALL
                   SELECT e.d AS node, p.dist + e.w AS dist
                   FROM d${i - 1} p JOIN e ON p.node = e.s)
             GROUP BY node
           )"""
      }.mkString(", ")
      s"""WITH adj AS (
           SELECT l_partkey AS src,
                  lead(l_partkey) OVER (
                    PARTITION BY l_orderkey
                    ORDER BY l_linenumber, l_partkey, l_suppkey) AS dst,
                  CAST(l_quantity AS BIGINT) AS w
           FROM lineitem
         ), e0 AS (
           SELECT src AS s, dst AS d, w FROM adj
           WHERE dst IS NOT NULL AND src <> dst
           UNION ALL
           SELECT dst, src, w FROM adj
           WHERE dst IS NOT NULL AND src <> dst
         ), e AS (
           SELECT s, d, CAST(min(w) AS BIGINT) AS w
           FROM e0 GROUP BY s, d
         ), d0 AS (
           SELECT DISTINCT p_partkey AS node, CAST(0 AS BIGINT) AS dist
           FROM part WHERE p_partkey % 500 = 0
         ), $roundCtes
         SELECT node, dist FROM d4 ORDER BY node"""
    },
    "q209_link_prediction" ->
      """WITH adj AS (
           SELECT l_partkey AS src,
                  lead(l_partkey) OVER (
                    PARTITION BY l_orderkey
                    ORDER BY l_linenumber, l_partkey, l_suppkey) AS dst
           FROM lineitem WHERE l_quantity <= 15
         ), e AS (
           SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM adj WHERE dst IS NOT NULL AND src <> dst
         ), deg AS (
           SELECT node, CAST(count(*) AS BIGINT) AS dg
           FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
           GROUP BY node
         ), nb AS (
           SELECT a AS w, b AS n FROM e
           UNION ALL SELECT b, a FROM e
         ), nbd AS (
           SELECT nb.w, nb.n, d.dg FROM nb JOIN deg d ON nb.w = d.node
           WHERE d.dg <= 24
         ), pr AS (
           SELECT x.n AS n1, y.n AS n2,
                  CAST(count(*) AS BIGINT) AS n_common,
                  CAST(sum(1000000 // x.dg) AS BIGINT) AS ra_micro
           FROM nbd x JOIN nbd y ON x.w = y.w AND x.n < y.n
           GROUP BY x.n, y.n
         )
         SELECT n1, n2, n_common, ra_micro
         FROM pr
         WHERE n_common >= 2
           AND NOT EXISTS (SELECT 1 FROM e
                           WHERE e.a = pr.n1 AND e.b = pr.n2)
         ORDER BY n1, n2""",
    "q210_autocorrelation" ->
      """WITH daily AS (
           SELECT CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
                    AS BIGINT) AS day,
                  CAST(sum(CAST(round(value * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
           FROM events GROUP BY 1
         ), tot AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(cents) AS BIGINT) AS s
           FROM daily
         ), y AS (
           SELECT day AS t, n * cents - s AS y FROM daily, tot
         ), den AS (
           SELECT CAST(sum(y * y) AS BIGINT) AS den FROM y
         ), nums AS (
           SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
                  CAST(sum(a.y * b.y) AS BIGINT) AS num
           FROM (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag) l
           JOIN y a ON TRUE
           JOIN y b ON b.t = a.t - l.lag
           GROUP BY l.lag
         )
         SELECT lag, n_pairs,
                CASE WHEN den = 0 THEN NULL
                     ELSE CAST(round(1000000
                       * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)))
                       AS BIGINT) END AS acf_micro
         FROM nums, den ORDER BY lag""",
    "q212_ks_drift" ->
      """WITH ev AS (
           SELECT CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
                    AS BIGINT) AS day,
                  CAST(round(value * 100.0) AS BIGINT) AS cents
           FROM events
         ), d0 AS (SELECT min(day) AS d0 FROM ev),
         sided AS (SELECT (day < d0 + 15) AS a, cents FROM ev, d0),
         byv AS (
           SELECT cents AS x,
                  CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                  CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS c2
           FROM sided GROUP BY cents
         ), cum AS (
           SELECT x,
                  CAST(sum(c1) OVER (ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum1,
                  CAST(sum(c2) OVER (ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum2
           FROM byv
         ), tot AS (
           SELECT CAST(sum(c1) AS BIGINT) AS n1,
                  CAST(sum(c2) AS BIGINT) AS n2
           FROM byv
         )
         SELECT n1, n2,
                CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_scaled,
                CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                     ELSE CAST(round(1000000.0
                       * (CAST(max(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
                          / CAST(n1 * n2 AS DOUBLE))) AS BIGINT) END
                  AS ks_micro
         FROM cum, tot GROUP BY n1, n2""",
    "q218_token_drift" ->
      """WITH toks AS (
           SELECT (CAST(substr(source, 4) AS BIGINT) < 10) AS a,
                  unnest(string_split_regex(lower(text), '\s+')) AS tok
           FROM documents
         ), nz AS (SELECT * FROM toks WHERE tok <> ''
         ), bytok AS (
           SELECT tok,
                  CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                  CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
                    AS c2
           FROM nz GROUP BY tok
         ), tot AS (
           SELECT CAST(sum(c1) AS BIGINT) AS n1,
                  CAST(sum(c2) AS BIGINT) AS n2
           FROM bytok
         ), scored AS (
           SELECT tok, c1, c2, c1 * n2 - c2 * n1 AS diff_scaled,
                  CAST(round(1000000.0
                    * (CAST(c1 * n2 - c2 * n1 AS DOUBLE)
                       * CAST(c1 * n2 - c2 * n1 AS DOUBLE))
                    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                       * CAST(c1 + c2 AS DOUBLE))) AS BIGINT)
                    AS chi2_micro
           FROM bytok, tot
           WHERE c1 + c2 >= 5
         ), top AS (
           SELECT * FROM scored ORDER BY chi2_micro DESC, tok LIMIT 100
         )
         SELECT tok, c1, c2, CAST(diff_scaled AS BIGINT) AS diff_scaled,
                chi2_micro
         FROM top ORDER BY tok""",
    "q226_burstiness" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS ts_us FROM events
         ), g AS (
           SELECT user_id,
                  CAST(floor(CAST(ts_us - lag(ts_us) OVER (
                    PARTITION BY user_id ORDER BY ts_us) AS DOUBLE)
                    / 1000000.0) AS BIGINT) AS gap
           FROM ev
         ), a AS (
           SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
                  CAST(sum(gap) AS BIGINT) AS sum_gap_s,
                  CAST(sum(gap * gap) AS BIGINT) AS sum_gap_sq
           FROM g GROUP BY user_id
         )
         SELECT user_id, n_gaps, sum_gap_s, sum_gap_sq,
                CASE WHEN n_gaps < 2
                       OR sqrt((CAST(n_gaps AS DOUBLE)
                                * CAST(sum_gap_sq AS DOUBLE)
                                - CAST(sum_gap_s AS DOUBLE)
                                  * CAST(sum_gap_s AS DOUBLE))
                               / (CAST(n_gaps AS DOUBLE)
                                  * CAST(n_gaps AS DOUBLE)))
                          + CAST(sum_gap_s AS DOUBLE)
                            / CAST(n_gaps AS DOUBLE) = 0.0 THEN NULL
                     ELSE CAST(round(1000000.0
                       * ((sqrt((CAST(n_gaps AS DOUBLE)
                                 * CAST(sum_gap_sq AS DOUBLE)
                                 - CAST(sum_gap_s AS DOUBLE)
                                   * CAST(sum_gap_s AS DOUBLE))
                                / (CAST(n_gaps AS DOUBLE)
                                   * CAST(n_gaps AS DOUBLE)))
                           - CAST(sum_gap_s AS DOUBLE)
                             / CAST(n_gaps AS DOUBLE))
                          / (sqrt((CAST(n_gaps AS DOUBLE)
                                   * CAST(sum_gap_sq AS DOUBLE)
                                   - CAST(sum_gap_s AS DOUBLE)
                                     * CAST(sum_gap_s AS DOUBLE))
                                  / (CAST(n_gaps AS DOUBLE)
                                     * CAST(n_gaps AS DOUBLE)))
                             + CAST(sum_gap_s AS DOUBLE)
                               / CAST(n_gaps AS DOUBLE))))
                       AS BIGINT) END AS b_micro
         FROM a ORDER BY user_id""",
    "q225_assortativity" ->
      """WITH adj AS (
           SELECT l_partkey AS src,
                  lead(l_partkey) OVER (
                    PARTITION BY l_orderkey
                    ORDER BY l_linenumber, l_partkey, l_suppkey) AS dst
           FROM lineitem
         ), und AS (
           SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM adj WHERE dst IS NOT NULL AND src <> dst
         ), deg AS (
           SELECT node, CAST(count(*) AS BIGINT) AS dg
           FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
           GROUP BY node
         ), j AS (
           SELECT da.dg AS da, db.dg AS db
           FROM und u JOIN deg da ON da.node = u.a
                      JOIN deg db ON db.node = u.b
         ), s AS (
           SELECT CAST(count(*) AS BIGINT) AS m,
                  CAST(sum(da + db) AS BIGINT) AS sum_j,
                  CAST(sum(da * da + db * db) AS BIGINT) AS sum_jj,
                  CAST(sum(2 * da * db) AS BIGINT) AS sum_jk
           FROM j
         )
         SELECT m, sum_j, sum_jj, sum_jk,
                CASE WHEN CAST(m AS DOUBLE) * 2.0 * CAST(sum_jj AS DOUBLE)
                          - CAST(sum_j AS DOUBLE) * CAST(sum_j AS DOUBLE)
                          = 0.0 THEN NULL
                     ELSE CAST(round(1000000.0
                       * ((CAST(m AS DOUBLE) * 2.0 * CAST(sum_jk AS DOUBLE)
                           - CAST(sum_j AS DOUBLE) * CAST(sum_j AS DOUBLE))
                          / (CAST(m AS DOUBLE) * 2.0 * CAST(sum_jj AS DOUBLE)
                             - CAST(sum_j AS DOUBLE)
                               * CAST(sum_j AS DOUBLE))))
                       AS BIGINT) END AS r_micro
         FROM s""",
    "q224_hhi" ->
      """WITH units AS (
           SELECT n_name AS g, l_suppkey AS u,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS x
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           GROUP BY n_name, l_suppkey
         ), a AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n_units,
                  CAST(sum(x) AS BIGINT) AS total_cents,
                  sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sumsq
           FROM units GROUP BY g
         )
         SELECT g AS n_name, n_units, total_cents,
                CASE WHEN total_cents = 0 THEN NULL
                     ELSE CAST(round(1000000.0
                       * (CAST(sumsq AS DOUBLE)
                          / (CAST(total_cents AS DOUBLE)
                             * CAST(total_cents AS DOUBLE))))
                       AS BIGINT) END AS hhi_micro
         FROM a ORDER BY n_name""",
    "q229_suffix_lrs" ->
      s"""WITH $suffixCorpusCte, suf AS (
           SELECT doc_id,
                  CAST(unnest(range(1, length(text) - 38)) AS BIGINT) AS pos,
                  text
           FROM corpus WHERE length(text) >= 40
         ), sufp AS (
           SELECT doc_id, pos,
                  substr(text, CAST(pos AS INTEGER), 640) AS pref,
                  CASE WHEN pos = 1 THEN ''
                       ELSE substr(text, CAST(pos AS INTEGER) - 1, 1)
                  END AS prev
           FROM suf
         ), nb AS (
           SELECT doc_id AS doc_b, pos AS pos_b, pref AS pref_b,
                  prev AS prev_b,
                  lag(doc_id) OVER w AS doc_a, lag(pos) OVER w AS pos_a,
                  lag(pref) OVER w AS pref_a, lag(prev) OVER w AS prev_a
           FROM sufp WINDOW w AS (ORDER BY pref, doc_id, pos)
         ), pairs AS (
           SELECT doc_a, pos_a, doc_b, pos_b,
                  CAST(coalesce(list_min(
                    [i FOR i IN range(1, least(length(pref_a),
                                                length(pref_b)) + 1)
                       IF pref_a[i:i] <> pref_b[i:i]]) - 1,
                    least(length(pref_a), length(pref_b))) AS BIGINT) AS lcp
           FROM nb
           WHERE doc_a IS NOT NULL
             AND substr(pref_a, 1, 40) = substr(pref_b, 1, 40)
             AND (prev_a <> prev_b OR prev_a = '' OR prev_b = '')
         ), top AS (
           SELECT * FROM pairs WHERE lcp >= 40
           ORDER BY lcp DESC, doc_a, pos_a, doc_b, pos_b LIMIT 28
         )
         SELECT CAST(row_number() OVER (ORDER BY t.lcp DESC, t.doc_a,
                  t.pos_a, t.doc_b, t.pos_b) AS BIGINT) AS rank,
                t.lcp, CAST(t.doc_a AS BIGINT) AS doc_a, t.pos_a,
                CAST(t.doc_b AS BIGINT) AS doc_b, t.pos_b,
                substr(c.text, CAST(t.pos_a AS INTEGER),
                  CAST(t.lcp AS INTEGER)) AS "repeat"
         FROM top t JOIN corpus c ON c.doc_id = t.doc_a
         ORDER BY rank""",
    "q230_suffix_spans" ->
      s"""WITH $suffixCorpusCte, g AS (
           SELECT doc_id,
                  CAST(unnest(range(1, length(text) - 23)) AS BIGINT) AS pos,
                  text
           FROM corpus WHERE length(text) >= 25
         ), grams AS (
           SELECT doc_id, pos,
                  substr(text, CAST(pos AS INTEGER), 25) AS gram
           FROM g
         ), dup AS (
           SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
         ), marked AS (
           SELECT doc_id, pos, pos + 24 AS e
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
         )
         SELECT CAST(doc_id AS BIGINT) AS doc_id, min(pos) AS span_start,
                max(e) AS span_end, max(e) - min(pos) + 1 AS span_len
         FROM isl2 GROUP BY doc_id, island
         ORDER BY doc_id, span_start""",
    "q231_suffix_scrub" ->
      s"""WITH $suffixCorpusCte, g AS (
           SELECT doc_id,
                  CAST(unnest(range(1, length(text) - 23)) AS BIGINT) AS pos,
                  text
           FROM corpus WHERE length(text) >= 25
         ), grams AS (
           SELECT doc_id, pos,
                  substr(text, CAST(pos AS INTEGER), 25) AS gram
           FROM g
         ), occ AS (
           SELECT doc_id, pos,
                  row_number() OVER (PARTITION BY gram
                                     ORDER BY doc_id, pos) AS rn,
                  count(*) OVER (PARTITION BY gram) AS c
           FROM grams
         ), marks AS (
           SELECT doc_id, pos, pos + 24 AS e FROM occ
           WHERE c >= 2 AND rn >= 2
         ), isl AS (
           SELECT doc_id, pos, e,
                  CASE WHEN pos > coalesce(max(e) OVER (
                         PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       -100) + 1
                       THEN 1 ELSE 0 END AS nw
           FROM marks
         ), isl2 AS (
           SELECT doc_id, pos, e,
                  sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS island
           FROM isl
         ), spans AS (
           SELECT doc_id, min(pos) AS s, max(e) AS en
           FROM isl2 GROUP BY doc_id, island
         ), spanstats AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans_cut,
                  CAST(sum(en - s + 1) AS BIGINT) AS n_cut
           FROM spans GROUP BY doc_id
         ), cover AS (
           SELECT DISTINCT doc_id,
                  CAST(unnest(range(s, en + 1)) AS BIGINT) AS j
           FROM spans
         ), chars AS (
           SELECT doc_id,
                  CAST(unnest(range(1, length(text) + 1)) AS BIGINT) AS i,
                  text
           FROM corpus
         ), kept AS (
           SELECT c.doc_id, c.i,
                  substr(c.text, CAST(c.i AS INTEGER), 1) AS ch
           FROM chars c
           WHERE NOT EXISTS (SELECT 1 FROM cover v
                             WHERE v.doc_id = c.doc_id AND v.j = c.i)
         ), clean AS (
           SELECT doc_id,
                  coalesce(string_agg(ch, '' ORDER BY i), '') AS clean_text
           FROM kept GROUP BY doc_id
         )
         SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
                CAST(length(c.text) AS BIGINT) AS n_chars,
                coalesce(s.n_spans_cut, 0) AS n_spans_cut,
                coalesce(s.n_cut, 0) AS n_cut,
                md5(coalesce(cl.clean_text, '')) AS clean_md5
         FROM corpus c
         LEFT JOIN spanstats s ON s.doc_id = c.doc_id
         LEFT JOIN clean cl ON cl.doc_id = c.doc_id
         ORDER BY doc_id""",
    "q232_substring_decontaminate" ->
      s"""WITH $suffixCorpusCte, ev AS (
           SELECT doc_id, text FROM corpus
           WHERE doc_id % 19 = 0 OR doc_id = 20000003
         ), tr AS (
           SELECT doc_id, text FROM corpus
           WHERE NOT (doc_id % 19 = 0 OR doc_id = 20000003)
         ), eg AS (
           SELECT DISTINCT substr(text, CAST(i AS INTEGER), 30) AS gram
           FROM (SELECT text,
                        CAST(unnest(range(1, length(text) - 28)) AS BIGINT)
                          AS i
                 FROM ev WHERE length(text) >= 30)
         ), tg AS (
           SELECT doc_id,
                  CAST(unnest(range(1, length(text) - 28)) AS BIGINT) AS pos,
                  text
           FROM tr WHERE length(text) >= 30
         ), marked AS (
           SELECT doc_id, pos, pos + 29 AS e
           FROM (SELECT doc_id, pos,
                        substr(text, CAST(pos AS INTEGER), 30) AS gram
                 FROM tg)
           WHERE gram IN (SELECT gram FROM eg)
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
           SELECT doc_id, min(pos) AS s, max(e) AS en
           FROM isl2 GROUP BY doc_id, island
         ), per AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                  CAST(sum(en - s + 1) AS BIGINT) AS contam_chars
           FROM spans GROUP BY doc_id
         )
         SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
                CAST(length(t.text) AS BIGINT) AS n_chars,
                coalesce(p.n_spans, 0) AS n_spans,
                coalesce(p.contam_chars, 0) AS contam_chars,
                CASE WHEN length(t.text) > 0
                     THEN coalesce(p.contam_chars, 0) * 1000000
                          // length(t.text)
                     ELSE 0 END AS contam_frac_micros
         FROM tr t LEFT JOIN per p ON p.doc_id = t.doc_id
         ORDER BY t.doc_id""",
    "q233_self_lrs" ->
      s"""WITH $suffixCorpusCte, suf AS (
           SELECT doc_id,
                  CAST(unnest(range(1, length(text) - 13)) AS BIGINT) AS pos,
                  text
           FROM corpus WHERE length(text) >= 15
         ), sufp AS (
           SELECT doc_id, pos,
                  substr(text, CAST(pos AS INTEGER), 128) AS pref
           FROM suf
         ), nb AS (
           SELECT doc_id, pos AS pos_b, pref AS pref_b,
                  lag(pos) OVER w AS pos_a, lag(pref) OVER w AS pref_a
           FROM sufp WINDOW w AS (PARTITION BY doc_id ORDER BY pref, pos)
         ), pairs AS (
           SELECT doc_id, pos_a, pos_b,
                  CAST(coalesce(list_min(
                    [i FOR i IN range(1, least(length(pref_a),
                                                length(pref_b)) + 1)
                       IF pref_a[i:i] <> pref_b[i:i]]) - 1,
                    least(length(pref_a), length(pref_b))) AS BIGINT) AS lcp
           FROM nb
           WHERE pos_a IS NOT NULL
             AND substr(pref_a, 1, 15) = substr(pref_b, 1, 15)
         ), win AS (
           SELECT doc_id, lcp AS lrs_len, pos_a, pos_b FROM pairs
           WHERE lcp >= 15
           QUALIFY row_number() OVER (PARTITION BY doc_id
                                      ORDER BY lcp DESC, pos_a, pos_b) = 1
         )
         SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
                CAST(length(c.text) AS BIGINT) AS n_chars,
                coalesce(w.lrs_len, 0) AS lrs_len, w.pos_a, w.pos_b,
                CASE WHEN length(c.text) > 0
                     THEN coalesce(w.lrs_len, 0) * 1000000
                          // length(c.text)
                     ELSE 0 END AS lrs_frac_micros
         FROM corpus c LEFT JOIN win w ON w.doc_id = c.doc_id
         ORDER BY c.doc_id""",
    "q234_html_blocks" ->
      s"""WITH $htmlBlocksCte
         SELECT doc_id, block_idx, text, n_chars, link_chars,
                link_density_micros, kept
         FROM rep ORDER BY doc_id, block_idx""",
    "q235_html_extract" -> htmlExtractOracle,
    // the streaming ingest gate runs the SAME extraction per
    // micro-batch — one oracle certifies both execution paths (the
    // q196/q204 shared-oracle discipline)
    "q240_stream_html_extract" -> htmlExtractOracle,
    "q236_boilerplate_blocks" ->
      s"""WITH $htmlBlocksCte
         SELECT text, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                count(*) AS n_occurrences
         FROM blk GROUP BY text
         HAVING count(DISTINCT doc_id) >= 10
         ORDER BY n_docs DESC, text""",
    "q237_html_extract_df" ->
      s"""WITH $htmlBlocksCte, boiler AS (
           SELECT text FROM blk GROUP BY text
           HAVING count(DISTINCT doc_id) >= 10
         ), surv AS (
           SELECT * FROM rep
           WHERE kept AND text NOT IN (SELECT text FROM boiler)
         ), tot AS (
           SELECT doc_id, count(*) AS n_blocks FROM rep GROUP BY doc_id
         ), k AS (
           SELECT doc_id, count(*) AS n_kept,
                  CAST(sum(n_chars) AS BIGINT) AS main_chars,
                  string_agg(text, chr(10) ORDER BY block_idx) AS main_text
           FROM surv GROUP BY doc_id
         )
         SELECT d.doc_id,
                CAST(coalesce(t.n_blocks, 0) AS BIGINT) AS n_blocks,
                CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
                CAST(coalesce(k.main_chars, 0) AS BIGINT) AS main_chars,
                coalesce(k.main_text, '') AS main_text
         FROM (SELECT DISTINCT doc_id FROM d) d
         LEFT JOIN tot t ON t.doc_id = d.doc_id
         LEFT JOIN k ON k.doc_id = d.doc_id
         ORDER BY d.doc_id""",
    "q238_html_links" ->
      """WITH d AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS m3,
                  CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS m5,
                  (['https://ex', 'https://news.ex', 'https://WWW.ex',
                    'https://a.b.ex', 'https://ex', 'https://sub.ex'])[(doc_id % 6) + 1]
                    || CAST(doc_id % 20 AS VARCHAR)
                    || (['.com/p', '.co.uk/a', '.co.uk/b',
                        '.com.au/x', '.org/y', '.de/z'])[(doc_id % 6) + 1]
                    || '?x=1&y=2' AS url
           FROM documents
         ), l AS (
           SELECT doc_id, CAST(0 AS BIGINT) AS link_idx, '/h' AS href FROM d
           UNION ALL SELECT doc_id, CAST(1 AS BIGINT), '/a' FROM d
           UNION ALL SELECT doc_id, CAST(2 AS BIGINT), '/c' FROM d
             WHERE m3 = 1
           UNION ALL SELECT doc_id, CAST(2 + m3 AS BIGINT), '/buy' FROM d
             WHERE m5 = 1
           UNION ALL SELECT doc_id, CAST(2 + m3 + m5 AS BIGINT), '/t' FROM d
           UNION ALL SELECT doc_id, CAST(3 + m3 + m5 AS BIGINT), '/p' FROM d
           UNION ALL SELECT doc_id, CAST(4 + m3 + m5 AS BIGINT), url FROM d
         )
         SELECT doc_id, link_idx, href FROM l
         ORDER BY doc_id, link_idx""",
    "q239_outlink_domains" -> htmlOutlinkDomainsOracle,
    "q250_html_anchors" ->
      """WITH d AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS m3,
                  CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS m5,
                  (['https://ex', 'https://news.ex', 'https://WWW.ex',
                    'https://a.b.ex', 'https://ex', 'https://sub.ex'])[(doc_id % 6) + 1]
                    || CAST(doc_id % 20 AS VARCHAR)
                    || (['.com/p', '.co.uk/a', '.co.uk/b',
                        '.com.au/x', '.org/y', '.de/z'])[(doc_id % 6) + 1]
                    || '?x=1&y=2' AS url
           FROM documents
         ), l AS (
           SELECT doc_id, CAST(0 AS BIGINT) AS link_idx, '/h' AS href,
                  'home' AS anchor FROM d
           UNION ALL SELECT doc_id, CAST(1 AS BIGINT), '/a', 'about pages'
             FROM d
           UNION ALL SELECT doc_id, CAST(2 AS BIGINT), '/c', 'contact us'
             FROM d WHERE m3 = 1
           UNION ALL SELECT doc_id, CAST(2 + m3 AS BIGINT), '/buy', 'buy now'
             FROM d WHERE m5 = 1
           UNION ALL SELECT doc_id, CAST(2 + m3 + m5 AS BIGINT), '/t', 'terms'
             FROM d
           UNION ALL SELECT doc_id, CAST(3 + m3 + m5 AS BIGINT), '/p',
             'privacy' FROM d
           UNION ALL SELECT doc_id, CAST(4 + m3 + m5 AS BIGINT), url,
             'site map' FROM d
         )
         SELECT doc_id, link_idx, href, anchor FROM l
         ORDER BY doc_id, link_idx""",
    "q251_anchor_rollup" -> anchorRollupOracle,
    "q254_cms_backoff" -> {
      val depth = 3
      val width = 4096
      def estCte(prev: String, name: String, itemSql: String, sk: String,
          saltK: String, carry: String): String =
        s"""q_$name AS (
           SELECT $carry,
                  h,
                  ('0x' || substr(md5('$saltK:' || CAST(h AS VARCHAR)
                    || ':' || $itemSql), 1, 14))::BIGINT % $width AS bucket
           FROM $prev CROSS JOIN (SELECT unnest(range(0, $depth)) AS h)
         ), $name AS (
           SELECT $carry, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS $name
           FROM q_$name LEFT JOIN $sk s USING (h, bucket)
           GROUP BY $carry
         )"""
      def sketchCtes(k: Int, items: String): String =
        s"""i$k AS ($items
         ), f$k AS (
           SELECT it, CAST(count(*) AS BIGINT) AS f FROM i$k GROUP BY it
         ), c$k AS (
           SELECT f, h,
                  ('0x' || substr(md5('cmslm$k:' || CAST(h AS VARCHAR)
                    || ':' || it), 1, 14))::BIGINT % $width AS bucket
           FROM f$k CROSS JOIN (SELECT unnest(range(0, $depth)) AS h)
         ), sk$k AS (
           SELECT h, bucket, CAST(sum(f) AS BIGINT) AS cnt
           FROM c$k GROUP BY h, bucket
         )"""
      val base = "doc_id, u, v, w, c"
      s"""WITH tr AS (
           SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> t <> '') AS ts
           FROM documents WHERE doc_id % 10 <> 0
         ), ${sketchCtes(1, "SELECT unnest(ts) AS it FROM tr")},
         ${sketchCtes(2,
          """SELECT unnest([ts[i] || ' ' || ts[i+1]
                            for i in range(1, len(ts))]) AS it
           FROM tr WHERE len(ts) >= 2""")},
         ${sketchCtes(3,
          """SELECT unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                            for i in range(1, len(ts) - 1)]) AS it
           FROM tr WHERE len(ts) >= 3""")},
         ntok AS (SELECT CAST(count(*) AS BIGINT) AS n FROM i1),
         sd AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> t <> '') AS ts
           FROM (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
                 UNION ALL
                 SELECT 30000001, '$sbOovDoc')
         ), pd AS (
           SELECT doc_id, g.u AS u, g.v AS v, g.w AS w,
                  CAST(count(*) AS BIGINT) AS c
           FROM (SELECT doc_id,
                        unnest([{'u': ts[i], 'v': ts[i+1], 'w': ts[i+2]}
                                for i in range(1, len(ts) - 1)]) AS g
                 FROM sd WHERE len(ts) >= 3)
           GROUP BY doc_id, g.u, g.v, g.w
         ),
         ${estCte("pd", "e3", "u || ' ' || v || ' ' || w", "sk3", "cmslm3", base)},
         ${estCte("e3", "e2uv", "u || ' ' || v", "sk2", "cmslm2", s"$base, e3")},
         ${estCte("e2uv", "e2vw", "v || ' ' || w", "sk2", "cmslm2", s"$base, e3, e2uv")},
         ${estCte("e2vw", "e1v", "v", "sk1", "cmslm1", s"$base, e3, e2uv, e2vw")},
         ${estCte("e1v", "e1w", "w", "sk1", "cmslm1", s"$base, e3, e2uv, e2vw, e1v")}
         SELECT doc_id,
                CAST(sum(c) AS BIGINT) AS n_trigrams,
                CAST(sum(CAST(round(ln(CASE
                    WHEN e3 > 0 AND e2uv > 0
                      THEN least(CAST(e3 AS DOUBLE) / CAST(e2uv AS DOUBLE), 1.0)
                    WHEN e2vw > 0 AND e1v > 0
                      THEN 0.4 * least(CAST(e2vw AS DOUBLE)
                             / CAST(e1v AS DOUBLE), 1.0)
                    ELSE 0.4 * 0.4 * (CAST(e1w + 1 AS DOUBLE)
                           / CAST(t.n + $width AS DOUBLE))
                  END) * 1e6) AS BIGINT) * c) AS BIGINT) AS logprob_micros
         FROM e1w CROSS JOIN ntok t
         GROUP BY doc_id ORDER BY doc_id"""
    },
    "q252_topic_tags" -> {
      val cats = topicCategories.sortBy(_._1)
      val catCols = cats.map { case (name, pats) =>
        val sum = pats.map(p =>
          s"(length(t) - length(replace(t, '$p', ''))) // ${p.length}")
          .mkString(" + ")
        s"CAST($sum AS BIGINT) AS hits_$name"
      }.mkString(", ")
      val names = cats.map(_._1)
      val m = "greatest(" + names.map(n => s"hits_$n").mkString(", ") + ")"
      val pick = names.map(n => s"WHEN hits_$n = $m THEN '$n'").mkString(" ")
      val hitsSel = names.map(n => s"hits_$n").mkString(", ")
      s"""WITH d AS (
           SELECT doc_id, lower(text) AS t FROM documents
         ), h AS (
           SELECT doc_id, $catCols FROM d
         )
         SELECT doc_id, $hitsSel,
                CASE WHEN $m = 0 THEN 'none' ELSE CASE $pick END END AS topic
         FROM h ORDER BY doc_id"""
    },
    "q255_stream_topic_monitor" -> {
      val cats = topicCategories.sortBy(_._1)
      val catCols = cats.map { case (name, pats) =>
        val sum = pats.map(p =>
          s"(length(t) - length(replace(t, '$p', ''))) // ${p.length}")
          .mkString(" + ")
        s"CAST($sum AS BIGINT) AS hits_$name"
      }.mkString(", ")
      val names = cats.map(_._1)
      val m = "greatest(" + names.map(n => s"hits_$n").mkString(", ") + ")"
      val pick = names.map(n => s"WHEN hits_$n = $m THEN '$n'").mkString(" ")
      s"""WITH d AS (
           SELECT doc_id, (doc_id // 20) % 2 AS wave, lower(text) AS t
           FROM documents
         ), h AS (
           SELECT doc_id, wave, $catCols FROM d
         ), tg AS (
           SELECT wave,
                  CASE WHEN $m = 0 THEN 'none' ELSE CASE $pick END END AS topic
           FROM h
         )
         SELECT CAST(wave AS BIGINT) AS wave, topic,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM tg GROUP BY wave, topic ORDER BY wave, topic"""
    },
    "q259_hll_overlap" -> hllOverlapOracle(p = 6, salt = "hllov"),
    "q253_source_overlap" ->
      s"""WITH w AS (
           SELECT source, string_split_regex(text, '\\s+') AS words
           FROM documents
         ), sh AS (
           SELECT DISTINCT source, shingle FROM (
             SELECT source, unnest(
               CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                    ELSE [array_to_string(words[i:i+2], ' ')
                          for i in range(1, len(words) - 1)]
               END) AS shingle
             FROM w)
         ), sz AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY source
         ), pr AS (
           SELECT a.source AS source_a, b.source AS source_b,
                  CAST(count(*) AS BIGINT) AS n_common
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle AND a.source < b.source
           GROUP BY a.source, b.source
         )
         SELECT pr.source_a, pr.source_b, pr.n_common,
                za.n AS n_a, zb.n AS n_b,
                CAST(pr.n_common * 1000000 // least(za.n, zb.n) AS BIGINT)
                  AS containment_micros
         FROM pr
         JOIN sz za ON za.source = pr.source_a
         JOIN sz zb ON zb.source = pr.source_b
         ORDER BY source_a, source_b""",
    "q242_robots_gate" -> robotsGateOracle,
    "q243_stupid_backoff" ->
      s"""WITH tr AS (
           SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> t <> '') AS ts
           FROM documents WHERE doc_id % 10 <> 0
         ), c1 AS (
           SELECT tok AS w, CAST(count(*) AS BIGINT) AS c1
           FROM (SELECT unnest(ts) AS tok FROM tr) GROUP BY tok
         ), tot AS (
           SELECT CAST(sum(c1) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS v FROM c1
         ), c2 AS (
           SELECT b.u AS u, b.v AS v, CAST(count(*) AS BIGINT) AS c2
           FROM (SELECT unnest([{'u': ts[i], 'v': ts[i+1]}
                                for i in range(1, len(ts))]) AS b
                 FROM tr WHERE len(ts) >= 2)
           GROUP BY b.u, b.v
         ), c3 AS (
           SELECT g.u AS u, g.v AS v, g.w AS w,
                  CAST(count(*) AS BIGINT) AS c3
           FROM (SELECT unnest([{'u': ts[i], 'v': ts[i+1], 'w': ts[i+2]}
                                for i in range(1, len(ts) - 1)]) AS g
                 FROM tr WHERE len(ts) >= 3)
           GROUP BY g.u, g.v, g.w
         ), sd AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> t <> '') AS ts
           FROM (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
                 UNION ALL
                 SELECT 30000001, '$sbOovDoc')
         ), pd AS (
           SELECT doc_id, g.u AS u, g.v AS v, g.w AS w,
                  CAST(count(*) AS BIGINT) AS c
           FROM (SELECT doc_id,
                        unnest([{'u': ts[i], 'v': ts[i+1], 'w': ts[i+2]}
                                for i in range(1, len(ts) - 1)]) AS g
                 FROM sd WHERE len(ts) >= 3)
           GROUP BY doc_id, g.u, g.v, g.w
         )
         SELECT pd.doc_id,
                CAST(sum(pd.c) AS BIGINT) AS n_trigrams,
                CAST(sum(CAST(round(ln(CASE
                    WHEN c3.c3 IS NOT NULL
                      THEN CAST(c3.c3 AS DOUBLE) / CAST(uv.c2 AS DOUBLE)
                    WHEN vw.c2 IS NOT NULL
                      THEN 0.4 * (CAST(vw.c2 AS DOUBLE) / CAST(cv.c1 AS DOUBLE))
                    ELSE 0.4 * 0.4 *
                      (CAST(coalesce(cw.c1, 0) + 1 AS DOUBLE)
                        / CAST(t.n + t.v AS DOUBLE))
                  END) * 1e6) AS BIGINT) * pd.c) AS BIGINT) AS logprob_micros
         FROM pd
         LEFT JOIN c3 ON c3.u = pd.u AND c3.v = pd.v AND c3.w = pd.w
         LEFT JOIN c2 uv ON uv.u = pd.u AND uv.v = pd.v
         LEFT JOIN c2 vw ON vw.u = pd.v AND vw.v = pd.w
         LEFT JOIN c1 cv ON cv.w = pd.v
         LEFT JOIN c1 cw ON cw.w = pd.w
         CROSS JOIN tot t
         GROUP BY pd.doc_id ORDER BY pd.doc_id""",
    "q244_blocklist_scan" -> {
      val plantRows = spamPlants.map { case (id, txt) =>
        s"($id, '${txt.replace("'", "''")}')" }.mkString(", ")
      val patRows = blocklistPatterns.map(p => s"('$p')").mkString(", ")
      s"""WITH d AS (
           SELECT doc_id, lower(text) AS t FROM documents
           UNION ALL
           SELECT doc_id, lower(text)
           FROM (VALUES $plantRows) AS plants(doc_id, text)
         ), p AS (
           SELECT pattern FROM (VALUES $patRows) AS pv(pattern)
         ), h AS (
           SELECT doc_id, pattern,
                  CAST((length(t) - length(replace(t, pattern, '')))
                       // length(pattern) AS BIGINT) AS hits
           FROM d CROSS JOIN p
         )
         SELECT doc_id, pattern, hits FROM h
         WHERE hits > 0 ORDER BY doc_id, pattern"""
    },
    "q245_cluster_split" ->
      s"""SELECT doc_id, cluster_id,
                CASE WHEN h < 90 THEN 'train'
                     WHEN h < 95 THEN 'valid' ELSE 'test' END AS split
         FROM (SELECT doc_id, cluster_id,
                 ('0x' || substr(md5('graft:' || CAST(cluster_id AS VARCHAR)),
                   1, 14))::BIGINT % 100 AS h
               FROM ($duplicateClustersOracle) cc)
         ORDER BY doc_id""",
    "q246_k_anonymity" ->
      """WITH b AS (
           SELECT c_nationkey, c_mktsegment,
                  CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 10000)
                       AS BIGINT) AS bal_hundreds
           FROM customer
         )
         SELECT c_nationkey, c_mktsegment,
                CAST(count(*) AS BIGINT) AS class_size,
                CAST(count(DISTINCT bal_hundreds) AS BIGINT) AS l_distinct,
                count(*) >= 8 AS k_anonymous,
                count(DISTINCT bal_hundreds) >= 5 AS l_diverse
         FROM b GROUP BY c_nationkey, c_mktsegment
         ORDER BY c_nationkey, c_mktsegment""",
    "q247_stream_blocklist_gate" -> {
      val plantRows = spamPlants.map { case (id, txt) =>
        s"($id, '${txt.replace("'", "''")}')" }.mkString(", ")
      val patRows = blocklistPatterns.map(p => s"('$p')").mkString(", ")
      s"""WITH d AS (
           SELECT doc_id, (doc_id // 20) % 2 AS wave, lower(text) AS t
           FROM (SELECT doc_id, text FROM documents
                 UNION ALL
                 SELECT doc_id, text
                 FROM (VALUES $plantRows) AS plants(doc_id, text))
         ), p AS (
           SELECT pattern FROM (VALUES $patRows) AS pv(pattern)
         ), h AS (
           SELECT doc_id, wave, pattern,
                  CAST((length(t) - length(replace(t, pattern, '')))
                       // length(pattern) AS BIGINT) AS hits
           FROM d CROSS JOIN p
         )
         SELECT doc_id, CAST(wave AS BIGINT) AS wave,
                CAST(sum(hits) AS BIGINT) AS total_hits,
                CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_patterns_hit,
                sum(hits) < 1 AS blocklist_keep
         FROM h GROUP BY doc_id, wave ORDER BY doc_id"""
    },
    "q258_stream_dsir_gate" ->
      s"""WITH ${dsirCtes("documents")},
         sall AS (
           SELECT doc_id, (doc_id // 20) % 2 AS wave,
                  unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                     t -> t <> '')) AS tok
           FROM documents
         ), pall AS (
           SELECT doc_id, wave,
                  ('0x' || substr(md5('dsir:' || tok), 1, 14))::BIGINT % 1024 AS b,
                  CAST(count(*) AS BIGINT) AS c
           FROM sall GROUP BY doc_id, wave, b
         ), scall AS (
           SELECT p.doc_id, p.wave, CAST(sum(p.c) AS BIGINT) AS n_tokens,
                  CAST(sum(CAST(round(ln(
                      (CAST(coalesce(tb.ct, 0) + 1 AS DOUBLE)
                        / CAST(nt.nt + 1024 AS DOUBLE))
                      / (CAST(coalesce(rb.cr, 0) + 1 AS DOUBLE)
                        / CAST(nr.nr + 1024 AS DOUBLE))
                    ) * 1e6) AS BIGINT) * p.c) AS BIGINT) AS weight_micros
           FROM pall p
           LEFT JOIN tb ON tb.b = p.b
           LEFT JOIN rb ON rb.b = p.b
           CROSS JOIN nt CROSS JOIN nr
           GROUP BY p.doc_id, p.wave
         )
         SELECT doc_id, CAST(wave AS BIGINT) AS wave, n_tokens,
                weight_micros, weight_micros >= 0 AS dsir_keep
         FROM scall ORDER BY doc_id""",
    "q248_dsir_resample" ->
      s"""WITH ${dsirCtes("documents")}
         SELECT doc_id, n_tokens, weight_micros, gumbel_micros,
                weight_micros + gumbel_micros AS key_micros
         FROM g ORDER BY key_micros DESC, doc_id LIMIT 100""",
    "q249_curation_pipeline_v4" -> {
      val plantRows = spamPlants.map { case (id, txt) =>
        s"($id, '${txt.replace("'", "''")}')" }.mkString(", ")
      val patRows = spamPatterns.map(p => s"('$p')").mkString(", ")
      s"""WITH d0 AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id, text FROM (VALUES $plantRows) AS plants(doc_id, text)
         ), hh0 AS (
           SELECT d0.doc_id,
                  sum(CAST((length(lower(d0.text))
                        - length(replace(lower(d0.text), p.pattern, '')))
                      // length(p.pattern) AS BIGINT)) AS h
           FROM d0 CROSS JOIN (VALUES $patRows) AS p(pattern)
           GROUP BY d0.doc_id
         ), clean AS (
           SELECT d0.doc_id, d0.text
           FROM d0 JOIN hh0 ON hh0.doc_id = d0.doc_id
           WHERE hh0.h < 1
         ), ${dsirCtes("clean")}
         , sel AS (
           SELECT doc_id, n_tokens, weight_micros,
                  weight_micros + gumbel_micros AS key_micros
           FROM g ORDER BY key_micros DESC, doc_id LIMIT 200
         )
         SELECT doc_id, n_tokens, weight_micros, key_micros,
                CASE WHEN hs < 90 THEN 'train'
                     WHEN hs < 95 THEN 'valid' ELSE 'test' END AS split
         FROM (SELECT sel.*,
                 ('0x' || substr(md5('graft:' || md5(c.text)), 1, 14))::BIGINT
                   % 100 AS hs
               FROM sel JOIN clean c ON c.doc_id = sel.doc_id)
         ORDER BY doc_id"""
    },
    "q274_curation_pipeline_v5" -> {
      val patRows = spamPatterns.map(p => s"('$p')").mkString(", ")
      s"""WITH lk AS (
           SELECT doc_id FROM (
             WITH ${langIdTrainedCtes}
             SELECT b.doc_id, b.trained_lang FROM best b WHERE b.rn = 1) t
           WHERE trained_lang = 'en'
         ), rp AS (
           SELECT doc_id FROM ($repetitionGateOracle) t WHERE gopher_keep
         ), bl AS (
           SELECT d.doc_id
           FROM documents d CROSS JOIN (VALUES $patRows) AS p(pattern)
           GROUP BY d.doc_id
           HAVING sum(CAST((length(lower(d.text))
                        - length(replace(lower(d.text), p.pattern, '')))
                      // length(p.pattern) AS BIGINT)) < 1
         ), clean AS (
           SELECT d.doc_id, d.text
           FROM documents d
           JOIN lk ON lk.doc_id = d.doc_id
           JOIN rp ON rp.doc_id = d.doc_id
           JOIN bl ON bl.doc_id = d.doc_id
         ), ${dsirCtes("clean")}
         , sel AS (
           SELECT doc_id, n_tokens, weight_micros,
                  weight_micros + gumbel_micros AS key_micros
           FROM g ORDER BY key_micros DESC, doc_id LIMIT 150
         )
         SELECT doc_id, n_tokens, weight_micros, key_micros,
                CASE WHEN hs < 90 THEN 'train'
                     WHEN hs < 95 THEN 'valid' ELSE 'test' END AS split
         FROM (SELECT sel.*,
                 ('0x' || substr(md5('graft:' || md5(c.text)), 1, 14))::BIGINT
                   % 100 AS hs
               FROM sel JOIN clean c ON c.doc_id = sel.doc_id)
         ORDER BY doc_id"""
    },
    "q241_crawl_pipeline" ->
      s"""WITH $htmlBlocksCte, boiler AS (
           SELECT text FROM blk GROUP BY text
           HAVING count(DISTINCT doc_id) >= 10
         ), surv AS (
           SELECT * FROM rep
           WHERE kept AND text NOT IN (SELECT text FROM boiler)
         ), k AS (
           SELECT doc_id,
                  CAST(sum(n_chars) AS BIGINT) AS main_chars,
                  string_agg(text, chr(10) ORDER BY block_idx) AS main_text
           FROM surv GROUP BY doc_id
         ), mt AS (
           SELECT d.doc_id,
                  CAST(coalesce(k.main_chars, 0) AS BIGINT) AS main_chars,
                  coalesce(k.main_text, '') AS t
           FROM (SELECT DISTINCT doc_id FROM d) d
           LEFT JOIN k ON k.doc_id = d.doc_id
         ), m AS (
           SELECT doc_id, main_chars,
             CAST(length(t) AS DOUBLE) AS n_chars_d,
             CAST(len(string_split_regex(lower(t), '\\s+')) AS DOUBLE) AS n_words,
             CAST(length(regexp_replace(t, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS n_alpha,
             CAST(length(regexp_replace(t, '[^0-9]', '', 'g')) AS DOUBLE) AS n_digit,
             CAST(length(regexp_replace(t, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) AS n_punct,
             CAST(len(list_filter(string_split_regex(lower(t), '\\s+'),
               x -> x IN ($stopwordsSqlList))) AS DOUBLE) AS n_stop
           FROM mt
         ), r AS (
           SELECT doc_id, main_chars, n_words,
             n_alpha / greatest(n_chars_d, 1.0) AS alpha_ratio,
             n_digit / greatest(n_chars_d, 1.0) AS digit_ratio,
             n_punct / greatest(n_chars_d, 1.0) AS punct_ratio,
             n_stop / greatest(n_words, 1.0) AS stopword_ratio
           FROM m
         )
         SELECT doc_id, main_chars, n_words, alpha_ratio, stopword_ratio,
                least(alpha_ratio / 0.7, 1.0) * 0.4
                  + least(stopword_ratio / 0.3, 1.0) * 0.3
                  + (1.0 - least(digit_ratio * 5, 1.0)) * 0.15
                  + (1.0 - least(punct_ratio * 5, 1.0)) * 0.15 AS quality_score,
                (least(alpha_ratio / 0.7, 1.0) * 0.4
                  + least(stopword_ratio / 0.3, 1.0) * 0.3
                  + (1.0 - least(digit_ratio * 5, 1.0)) * 0.15
                  + (1.0 - least(punct_ratio * 5, 1.0)) * 0.15 >= 0.5
                 AND main_chars >= 40) AS kept
         FROM r ORDER BY doc_id""",
    "q228_lorenz_deciles" ->
      """WITH spend AS (
           SELECT o_custkey AS k,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS x
           FROM orders GROUP BY o_custkey
         ), allc AS (
           SELECT c.c_custkey AS k,
                  coalesce(s.x, CAST(0 AS BIGINT)) AS x
           FROM customer c LEFT JOIN spend s ON s.k = c.c_custkey
         ), r AS (
           SELECT x, CAST(row_number() OVER (ORDER BY x, k) AS BIGINT) AS i
           FROM allc
         ), tot AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS BIGINT) AS total
           FROM r
         ), d AS (
           SELECT ((i - 1) * 10) // n + 1 AS decile, x, total
           FROM r, tot
         )
         SELECT decile, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(x) AS BIGINT) AS decile_cents,
                CASE WHEN total = 0 THEN NULL
                     ELSE (CAST(sum(x) AS BIGINT) * 1000000) // total END
                  AS share_micro
         FROM d GROUP BY decile, total
         ORDER BY decile""",
    "q223_gini" ->
      """WITH spend AS (
           SELECT o_custkey AS k,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS x
           FROM orders GROUP BY o_custkey
         ), allc AS (
           SELECT c.c_custkey AS k,
                  coalesce(s.x, CAST(0 AS BIGINT)) AS x
           FROM customer c LEFT JOIN spend s ON s.k = c.c_custkey
         ), r AS (
           SELECT x, CAST(row_number() OVER (ORDER BY x, k) AS BIGINT) AS i
           FROM allc
         ), a AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS BIGINT) AS total,
                  CAST(sum(i * x) AS BIGINT) AS six
           FROM r
         )
         SELECT n, total,
                CASE WHEN total = 0 THEN NULL
                     ELSE CAST(round(1000000.0
                       * (CAST(2 * six - (n + 1) * total AS DOUBLE)
                          / CAST(n * total AS DOUBLE))) AS BIGINT) END
                  AS gini_micro
         FROM a""",
    "q222_cohen_kappa" ->
      """WITH r AS (
           SELECT (100 * len(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   >= 82 * len(text)) AS a,
                  (len(text) >= 300) AS b
           FROM documents
         ), m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n11,
                  CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n10,
                  CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n01,
                  CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n00
           FROM r
         ), s AS (
           SELECT n, n11, n10, n01, n00,
                  (n11 + n10) * (n11 + n01)
                    + (n01 + n00) * (n10 + n00) AS pe
           FROM m
         )
         SELECT n, n11, n10, n01, n00,
                CASE WHEN n * n - pe = 0 THEN NULL
                     ELSE CAST(round(1000000.0
                       * (CAST(n * (n11 + n00) - pe AS DOUBLE)
                          / CAST(n * n - pe AS DOUBLE))) AS BIGINT) END
                  AS kappa_micro
         FROM s""",
    "q221_spearman" ->
      """WITH base AS (
           SELECT doc_id AS k, n_chars AS x,
                  CAST(len([t for t in string_split_regex(text, '\s+')
                            if t <> '']) AS BIGINT) AS y
           FROM documents
         ), rx AS (
           SELECT k, CAST(row_number() OVER (ORDER BY x, k) AS BIGINT) AS rx
           FROM base
         ), ry AS (
           SELECT k, CAST(row_number() OVER (ORDER BY y, k) AS BIGINT) AS ry
           FROM base
         ), j AS (
           SELECT (rx.rx - ry.ry) * (rx.rx - ry.ry) AS d2
           FROM rx JOIN ry ON rx.k = ry.k
         ), a AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(d2) AS BIGINT) AS sum_d2
           FROM j
         )
         SELECT n, sum_d2,
                CASE WHEN n < 2 THEN NULL
                     ELSE CAST(round(1000000.0
                       * (1.0 - 6.0 * CAST(sum_d2 AS DOUBLE)
                          / (CAST(n AS DOUBLE)
                             * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                - 1.0)))) AS BIGINT) END AS rho_micro
         FROM a""",
    "q217_logbucket_quantiles" ->
      """WITH base AS (
           SELECT l_returnflag AS g,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS x
           FROM lineitem
         ), bk AS (
           SELECT g,
                  CASE WHEN len(CAST(x AS VARCHAR)) < 3 THEN x
                       ELSE CAST(substr(CAST(x AS VARCHAR), 1, 2)
                         || repeat('0', len(CAST(x AS VARCHAR)) - 2)
                         AS BIGINT) END AS b
           FROM base
         ), h AS (
           SELECT g, b, CAST(count(*) AS BIGINT) AS c
           FROM bk GROUP BY g, b
         ), cum AS (
           SELECT g, b,
                  CAST(sum(c) OVER (PARTITION BY g ORDER BY b
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
           FROM h
         ), tot AS (
           SELECT g, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY g
         ), tg AS (
           SELECT g, n, CAST(p AS BIGINT) AS permille,
                  (CAST(p AS BIGINT) * n + 999) // 1000 AS t
           FROM tot, (SELECT unnest([500, 900, 990, 999]) AS p)
         )
         SELECT tg.g AS l_returnflag, tg.permille, tg.n,
                CAST(min(cum.b) AS BIGINT) AS est
         FROM tg JOIN cum ON cum.g = tg.g AND cum.cum >= tg.t
         GROUP BY tg.g, tg.permille, tg.n
         ORDER BY l_returnflag, permille""",
    "q213_cusum_changepoint" ->
      """WITH daily AS (
           SELECT CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
                    AS BIGINT) AS day,
                  CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1
         ), tot AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS BIGINT) AS s
           FROM daily
         ), y AS (
           SELECT day AS t, n, n * x - s AS y FROM daily, tot
         ), pre AS (
           SELECT t, n, y,
                  CAST(sum(y) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cs
           FROM y
         ), mx AS (
           SELECT CAST(max(abs(cs)) AS BIGINT) AS s_abs_max,
                  CAST(sum(abs(y)) AS BIGINT) AS sum_abs_dev
           FROM pre
         )
         SELECT p.n AS n,
                CASE WHEN m.sum_abs_dev = 0 THEN NULL
                     ELSE min(p.t) END AS cp_t,
                m.s_abs_max, m.sum_abs_dev,
                CASE WHEN m.sum_abs_dev = 0 THEN NULL
                     ELSE CAST(floor(CAST(m.s_abs_max AS DOUBLE) * 1000000.0
                       / CAST(m.sum_abs_dev AS DOUBLE)) AS BIGINT) END
                  AS cusum_rel_micro
         FROM pre p, mx m
         WHERE abs(p.cs) = m.s_abs_max
         GROUP BY p.n, m.s_abs_max, m.sum_abs_dev""",
    "q191_ab_test" ->
      """WITH u AS (
           SELECT user_id,
                  CAST(max(CASE WHEN event_type = 'purchase'
                                     AND value >= 150.0
                                THEN 1 ELSE 0 END) AS BIGINT) AS conv,
                  ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                     1, 14))::BIGINT % 2 AS arm
           FROM events GROUP BY user_id
         ), agg AS (
           SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_a,
                  CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
                       AS BIGINT) AS conv_a,
                  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_b,
                  CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
                       AS BIGINT) AS conv_b
           FROM u
         )
         SELECT n_a, conv_a,
                CAST(floor(CAST(conv_a AS DOUBLE) * 1000000.0
                           / CAST(n_a AS DOUBLE)) AS BIGINT)
                  AS rate_a_micros,
                n_b, conv_b,
                CAST(floor(CAST(conv_b AS DOUBLE) * 1000000.0
                           / CAST(n_b AS DOUBLE)) AS BIGINT)
                  AS rate_b_micros,
                CASE WHEN n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0
                          AND conv_a + conv_b < n_a + n_b
                     THEN (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                           - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                          / sqrt(CAST(conv_a + conv_b AS DOUBLE)
                                   / CAST(n_a + n_b AS DOUBLE)
                                 * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                                          / CAST(n_a + n_b AS DOUBLE))
                                 * (1.0 / CAST(n_a AS DOUBLE)
                                    + 1.0 / CAST(n_b AS DOUBLE)))
                     ELSE NULL END AS z_score
         FROM agg""",
    "q192_cdc_apply" ->
      """WITH base AS (
           SELECT o_orderkey AS k,
                  CAST(-9223372036854775808 AS BIGINT) AS seq,
                  'I' AS op, o_orderstatus AS st,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS pc
           FROM orders
         ), upd AS (
           SELECT o_orderkey, CAST(1 AS BIGINT), 'U', 'X',
                  CAST(round(o_totalprice * 100) AS BIGINT) + 100
           FROM orders WHERE o_orderkey % 7 = 0
         ), del AS (
           SELECT o_orderkey, CAST(2 AS BIGINT), 'D', '',
                  CAST(0 AS BIGINT)
           FROM orders WHERE o_orderkey % 11 = 0
         ), ins AS (
           SELECT o_orderkey + 100000000, CAST(1 AS BIGINT), 'I', 'N',
                  CAST(4200 AS BIGINT)
           FROM orders WHERE o_orderkey % 13 = 0
         ), allrows AS (
           SELECT * FROM base UNION ALL SELECT * FROM upd
           UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ins
         ), last AS (
           SELECT * FROM allrows
           QUALIFY row_number() OVER (PARTITION BY k ORDER BY seq DESC) = 1
         )
         SELECT st AS o_orderstatus,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(pc) AS BIGINT) AS sum_cents,
                min(k) AS min_key, max(k) AS max_key
         FROM last WHERE op <> 'D'
         GROUP BY st ORDER BY st""",
    "q193_twap" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS t,
                  CAST(round(value * 100) AS BIGINT) AS v,
                  lead(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                    AS tn
           FROM events
         ), agg AS (
           SELECT user_id,
                  CAST(count(*) AS BIGINT) AS n_obs,
                  CAST(max(t) - min(t) AS BIGINT) AS duration_us,
                  CAST(sum(CASE WHEN tn IS NOT NULL
                                THEN v * (tn - t) ELSE 0 END) AS BIGINT)
                    AS twap_num
           FROM e GROUP BY 1
         )
         SELECT user_id, n_obs, duration_us, twap_num,
                CASE WHEN duration_us > 0
                     THEN CAST(twap_num AS DOUBLE)
                          / CAST(duration_us AS DOUBLE)
                     ELSE NULL END AS twap_cents
         FROM agg ORDER BY user_id""",
    "q194_entity_resolution" ->
      """WITH c AS (
           SELECT c_custkey, c_name,
                  CAST(c_nationkey AS BIGINT) AS c_nationkey,
                  c_mktsegment,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
           FROM customer
         ), dup AS (
           SELECT c_custkey + 10000000 AS c_custkey,
                  upper(c_name) AS c_name, c_nationkey,
                  c_mktsegment, bal_cents + 50 AS bal_cents
           FROM c WHERE c_custkey % 17 = 0
         ), recs AS (
           SELECT *, CAST(c_nationkey AS VARCHAR) || '|'
                       || CAST(CAST(floor(CAST(bal_cents AS DOUBLE)
                                          / 10000.0) AS BIGINT)
                               AS VARCHAR) AS block
           FROM (SELECT * FROM c UNION ALL SELECT * FROM dup)
         ), pairs AS (
           SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                  lower(a.c_name) = lower(b.c_name) AS agree_name_ci,
                  a.c_mktsegment = b.c_mktsegment AS agree_segment,
                  abs(a.bal_cents - b.bal_cents) <= 100 AS agree_balance
           FROM recs a JOIN recs b
             ON a.block = b.block AND a.c_custkey < b.c_custkey
         )
         SELECT id_a, id_b, agree_name_ci, agree_segment, agree_balance,
                CAST(CASE WHEN agree_name_ci THEN 2000000
                          ELSE -2000000 END
                   + CASE WHEN agree_segment THEN 500000
                          ELSE -500000 END
                   + CASE WHEN agree_balance THEN 1500000
                          ELSE -1000000 END AS BIGINT) AS score_micros
         FROM pairs
         WHERE CASE WHEN agree_name_ci THEN 2000000 ELSE -2000000 END
             + CASE WHEN agree_segment THEN 500000 ELSE -500000 END
             + CASE WHEN agree_balance THEN 1500000 ELSE -1000000 END
             >= 3000000
         ORDER BY id_a, id_b""",
    "q195_experiment_sessions" ->
      """WITH x AS (
           SELECT user_id, ts, event_type, value,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    AS prev_ts
           FROM events
         ), y AS (
           SELECT user_id, ts, event_type, value,
                  CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                       THEN 1 ELSE 0 END AS ns
           FROM x
         ), z AS (
           SELECT user_id, event_type, value,
                  CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM y
         ), sess AS (
           SELECT user_id, session_id,
                  CAST(count(*) AS BIGINT) AS n_ev,
                  CAST(max(CASE WHEN event_type = 'purchase'
                                     AND value >= 150.0
                                THEN 1 ELSE 0 END) AS BIGINT) AS converted
           FROM z GROUP BY 1, 2
         ), armed AS (
           SELECT *, ('0x' || substr(md5('ab:'
                        || CAST(user_id AS VARCHAR)), 1, 14))::BIGINT % 2
                     AS arm
           FROM sess
         ), agg AS (
           SELECT arm,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                  CAST(count(*) AS BIGINT) AS n_sessions,
                  CAST(sum(n_ev) AS BIGINT) AS n_events,
                  CAST(sum(converted) AS BIGINT) AS conv_sessions
           FROM armed GROUP BY 1
         )
         SELECT arm, n_users, n_sessions, n_events, conv_sessions,
                CAST(floor(CAST(n_sessions AS DOUBLE) * 1000000.0
                           / CAST(n_users AS DOUBLE)) AS BIGINT)
                  AS sessions_per_user_micros,
                CAST(floor(CAST(conv_sessions AS DOUBLE) * 1000000.0
                           / CAST(n_sessions AS DOUBLE)) AS BIGINT)
                  AS conv_rate_micros
         FROM agg ORDER BY arm""",
    "q196_incremental_view" -> cdcPostImageViewOracle,
    "q204_stream_cdc" -> cdcPostImageViewOracle,
    "q197_retention_cohorts" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS ts_us FROM events
         ), firsts AS (
           SELECT user_id, min(ts_us) AS first_us FROM ev GROUP BY 1
         ), activity AS (
           SELECT CAST(floor(CAST(f.first_us AS DOUBLE) / 604800000000.0)
                       AS BIGINT) AS cohort_week,
                  CAST(floor(CAST(e.ts_us - f.first_us AS DOUBLE)
                             / 604800000000.0) AS BIGINT) AS week_k,
                  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
           FROM ev e JOIN firsts f USING (user_id)
           GROUP BY 1, 2
         ), sizes AS (
           SELECT CAST(floor(CAST(first_us AS DOUBLE) / 604800000000.0)
                       AS BIGINT) AS cohort_week,
                  CAST(count(*) AS BIGINT) AS cohort_size
           FROM firsts GROUP BY 1
         )
         SELECT a.cohort_week, a.week_k, a.n_active, s.cohort_size,
                CAST(floor(CAST(a.n_active AS DOUBLE) * 1000000.0
                           / CAST(s.cohort_size AS DOUBLE)) AS BIGINT)
                  AS retention_micros
         FROM activity a JOIN sizes s USING (cohort_week)
         ORDER BY a.cohort_week, a.week_k""",
    "q198_conversion_latency" ->
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
         ), lat AS (
           SELECT CAST(floor(CAST(s2.t_2 - s0.t_0 AS DOUBLE) / 60000000.0)
                       AS BIGINT) AS lat_min
           FROM s2 JOIN s0 USING (user_id)
         )
         SELECT CASE WHEN lat_min <= 0 THEN CAST(0 AS BIGINT)
                     ELSE CAST(length(to_base(lat_min, 4)) AS BIGINT)
                END AS bucket,
                CAST(count(*) AS BIGINT) AS n_conversions
         FROM lat GROUP BY 1 ORDER BY 1""",
    "q199_half_sample_ci" -> halfSampleCiOracle(replicas = 16),
    "q200_mad_anomalies" ->
      """WITH base AS (
           SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) AS c
           FROM events
         ), med AS (
           SELECT event_type, quantile_cont(c, 0.5) AS med_cents
           FROM base GROUP BY 1
         ), mad AS (
           SELECT b.event_type,
                  quantile_cont(abs(CAST(b.c AS DOUBLE) - m.med_cents),
                                0.5) AS mad_cents
           FROM base b JOIN med m USING (event_type)
           GROUP BY 1
         )
         SELECT b.event_type,
                CAST(count(*) AS BIGINT) AS n,
                min(m.med_cents) AS med_cents,
                min(d.mad_cents) AS mad_cents,
                CAST(sum(CASE WHEN abs(CAST(b.c AS DOUBLE) - m.med_cents)
                                   > 3.0 * d.mad_cents
                              THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_anomalies,
                CAST(sum(CASE WHEN abs(CAST(b.c AS DOUBLE) - m.med_cents)
                                   > 3.0 * d.mad_cents
                              THEN b.c ELSE 0 END) AS BIGINT)
                  AS anomaly_cents
         FROM base b
         JOIN med m USING (event_type)
         JOIN mad d USING (event_type)
         GROUP BY 1 ORDER BY 1""",
    "q201_cuped" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS t, event_type, value
           FROM events
         ), mid AS (
           SELECT (min(t) + max(t)) // 2 AS mid FROM ev
         ), units AS (
           SELECT user_id,
                  CAST(sum(CASE WHEN t < mid AND event_type = 'purchase'
                                THEN CAST(round(value * 100) AS BIGINT)
                                ELSE 0 END) AS BIGINT) AS x,
                  CAST(sum(CASE WHEN t >= mid AND event_type = 'purchase'
                                THEN CAST(round(value * 100) AS BIGINT)
                                ELSE 0 END) AS BIGINT) AS y,
                  'arm' || CAST(('0x' || substr(md5('ab:'
                      || CAST(user_id AS VARCHAR)), 1, 14))::BIGINT % 2
                    AS VARCHAR) AS arm
           FROM ev CROSS JOIN mid
           GROUP BY user_id
         ), perarm AS (
           SELECT arm, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS BIGINT) AS sum_x,
                  CAST(sum(y) AS BIGINT) AS sum_y,
                  CAST(sum(x * y) AS BIGINT) AS sum_xy,
                  CAST(sum(x * x) AS BIGINT) AS sum_xx
           FROM units GROUP BY 1
         ), tot AS (
           SELECT CAST(sum(n) AS BIGINT) AS tn,
                  CAST(sum(sum_x) AS BIGINT) AS tx,
                  CAST(sum(sum_y) AS BIGINT) AS ty,
                  CAST(sum(sum_xy) AS BIGINT) AS txy,
                  CAST(sum(sum_xx) AS BIGINT) AS txx
           FROM perarm
         )
         SELECT arm, n, sum_x, sum_y,
                CAST(sum_y AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y,
                CASE WHEN CAST(txx AS DOUBLE) * CAST(tn AS DOUBLE)
                          - CAST(tx AS DOUBLE) * CAST(tx AS DOUBLE) > 0.0
                     THEN CAST(sum_y AS DOUBLE) / CAST(n AS DOUBLE)
                          - (CAST(txy AS DOUBLE) * CAST(tn AS DOUBLE)
                             - CAST(tx AS DOUBLE) * CAST(ty AS DOUBLE))
                            / (CAST(txx AS DOUBLE) * CAST(tn AS DOUBLE)
                               - CAST(tx AS DOUBLE) * CAST(tx AS DOUBLE))
                            * (CAST(sum_x AS DOUBLE) / CAST(n AS DOUBLE)
                               - CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
                     ELSE NULL END AS mean_y_adj
         FROM perarm CROSS JOIN tot ORDER BY arm""",
    "q202_benford" -> {
      // the SAME JVM-computed log10 constants as the Spark query,
      // printed shortest-roundtrip so DuckDB parses identical bits
      val counts = (1 to 9).map(dd =>
        s"""CAST(sum(CASE WHEN substr(CAST(c AS VARCHAR), 1, 1) = '$dd'
                          THEN 1 ELSE 0 END) AS BIGINT) AS c$dd""")
        .mkString(",\n            ")
      val terms = (1 to 9).map { dd =>
        val k = math.log10(1.0 + 1.0 / dd)
        s"""(CAST(c$dd AS DOUBLE) - CAST(n AS DOUBLE) * $k)
            * (CAST(c$dd AS DOUBLE) - CAST(n AS DOUBLE) * $k)
            / (CAST(n AS DOUBLE) * $k)"""
      }.mkString(" + ")
      s"""WITH base AS (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
           FROM orders
           WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0
         ), g AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
            $counts
           FROM base
         )
         SELECT n, ${(1 to 9).map(dd => s"c$dd").mkString(", ")},
                $terms AS chi2
         FROM g"""
    },
    "q203_rfm_segments" -> {
      def score(x: String, b: String) =
        (1 to 4).map(i =>
          s"CASE WHEN CAST($x AS DOUBLE) > $b[$i] THEN 1 ELSE 0 END")
          .mkString(" + ") + " + 1"
      s"""WITH ev AS (
           SELECT user_id, epoch_us(ts) AS ts_us, event_type, value
           FROM events
         ), users AS (
           SELECT user_id, max(ts_us) AS last_us,
                  CAST(sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
                  CAST(sum(CASE WHEN event_type = 'purchase'
                                THEN CAST(round(value * 100) AS BIGINT)
                                ELSE 0 END) AS BIGINT) AS m_cents
           FROM ev GROUP BY 1
         ), g AS (
           SELECT max(ts_us) AS gmax FROM ev
         ), withr AS (
           SELECT u.*, g.gmax - u.last_us AS r_us
           FROM users u CROSS JOIN g
         ), bounds AS (
           SELECT quantile_cont(r_us, [0.2, 0.4, 0.6, 0.8]) AS rb,
                  quantile_cont(f_cnt, [0.2, 0.4, 0.6, 0.8]) AS fb,
                  quantile_cont(m_cents, [0.2, 0.4, 0.6, 0.8]) AS mb
           FROM withr
         )
         SELECT CAST(${score("w.r_us", "b.rb")} AS BIGINT) AS r_score,
                CAST(${score("w.f_cnt", "b.fb")} AS BIGINT) AS f_score,
                CAST(${score("w.m_cents", "b.mb")} AS BIGINT) AS m_score,
                CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(w.m_cents) AS BIGINT) AS sum_m_cents
         FROM withr w CROSS JOIN bounds b
         GROUP BY 1, 2, 3
         ORDER BY 1, 2, 3"""
    }) ++
    modelOracles ++
    Map(
      "q263_langid_trained" ->
        s"""WITH ${langIdTrainedCtes}
           SELECT b.doc_id, b.trained_lang, b.score_micros, hl.lang,
                  (b.trained_lang = hl.lang) AS correct, hl.heur_lang,
                  (b.trained_lang = hl.heur_lang) AS agree_heur,
                  hl.is_train
           FROM best b JOIN hl ON hl.doc_id = b.doc_id
           WHERE b.rn = 1 ORDER BY b.doc_id""",
      "q264_langid_confusion" ->
        s"""WITH ${langIdTrainedCtes}
           SELECT hl.lang, b.trained_lang,
                  CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(CASE WHEN hl.is_train THEN 0 ELSE 1 END)
                       AS BIGINT) AS n_holdout
           FROM best b JOIN hl ON hl.doc_id = b.doc_id
           WHERE b.rn = 1
           GROUP BY 1, 2 ORDER BY 1, 2""",
      "q271_langid_expr" ->
        s"""WITH ${langIdTrainedCtes},
           ng AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams
                  FROM db GROUP BY doc_id)
           SELECT b.doc_id, b.trained_lang, b.score_micros, ng.n_grams
           FROM best b JOIN ng ON ng.doc_id = b.doc_id
           WHERE b.rn = 1 ORDER BY b.doc_id""",
      "q272_stream_langid_gate" ->
        s"""WITH ${langIdTrainedCtes}
           SELECT b.doc_id, (b.doc_id // 20) % 2 AS wave, b.trained_lang,
                  (b.trained_lang = 'en') AS lang_keep
           FROM best b WHERE b.rn = 1 ORDER BY b.doc_id""",
      "q270_repetition_gate" -> repetitionGateOracle,
      "q267_unigram_train" -> unigramTrainOracle(rounds = 2,
        maxPieceLen = 4, vocabCap = 128, maxWordLen = 12),
      "q268_unigram_encode" -> unigramEncodeOracle(rounds = 2,
        maxPieceLen = 4, vocabCap = 128, maxWordLen = 12),
      "q275_token_id_packing" -> unigramPackOracle(rounds = 2,
        maxPieceLen = 4, vocabCap = 128, maxWordLen = 12, budget = 512),
      "q276_langid_planted" -> langPlantedOracle(langPlants),
      "q277_unigram_pruned" -> unigramPrunedOracle(rounds = 2,
        maxPieceLen = 4, vocabCap = 128, maxWordLen = 12,
        pruneNum = 1, pruneDen = 4),
      "q281_ppl_buckets" ->
        s"""WITH $sbHeldoutCtes, nb AS (
             SELECT sc.doc_id, d.source, sc.n_trigrams,
                    CAST(((-sc.lp_micros) * 1000) // sc.n_trigrams
                         AS BIGINT) AS nll
             FROM sc JOIN documents d ON d.doc_id = sc.doc_id
           ), rk AS (
             SELECT doc_id, source, n_trigrams, nll,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY nll, doc_id) AS rn,
                    count(*) OVER (PARTITION BY source) AS n
             FROM nb
           )
           SELECT source,
                  CASE WHEN (rn - 1) * 3 < n THEN 'head'
                       WHEN (rn - 1) * 3 < n * 2 THEN 'middle'
                       ELSE 'tail' END AS ppl_bucket,
                  CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(n_trigrams) AS BIGINT) AS n_trigrams,
                  CAST(min(nll) AS BIGINT) AS min_nll_nanos,
                  CAST(max(nll) AS BIGINT) AS max_nll_nanos,
                  md5(string_agg(CAST(doc_id AS VARCHAR), ','
                                 ORDER BY doc_id)) AS ids_md5
           FROM rk GROUP BY 1, 2
           ORDER BY source, ppl_bucket""",
      "q282_epoch_allocation" ->
        s"""WITH $sbHeldoutCtes, $epochAllocCtes
           SELECT source, n_tokens, nll_nanos, q_rank, served_tokens,
                  epochs_micros, budget
           FROM al ORDER BY source""",
      "q291_curriculum_pack" -> unigramCurriculumPackOracle(rounds = 2,
        maxPieceLen = 4, vocabCap = 128, maxWordLen = 12, budget = 512),
      "q292_stream_neardup_gate" -> neardupGateOracle(rejectAgree = 6),
      "q290_epoch_schedule" ->
        s"""WITH $sbHeldoutCtes, $epochAllocCtes,
           pdk AS (
             SELECT source, doc_id,
                    CAST(len(list_filter(
                      string_split_regex(lower(text), '\\s+'),
                      t -> t <> '')) AS BIGINT) AS n_tok
             FROM documents
           ), ae AS (
             SELECT source,
                    epochs_micros // 1000000 AS efull,
                    epochs_micros - (epochs_micros // 1000000) * 1000000
                      AS rem,
                    n_tokens AS ktok
             FROM al
           ), ab AS (
             SELECT source, efull, rem,
                    efull + CASE WHEN rem > 0 THEN 1 ELSE 0 END AS ne,
                    CAST((CAST(rem AS HUGEINT) * CAST(ktok AS HUGEINT))
                         // 1000000 AS BIGINT) AS fractok
             FROM ae WHERE efull + CASE WHEN rem > 0 THEN 1 ELSE 0 END > 0
           ), ex AS (
             SELECT p.source, p.doc_id, p.n_tok, b.efull, b.fractok,
                    CAST(e.e AS BIGINT) AS epoch,
                    ('0x' || substr(md5('epsched:' || CAST(e.e AS VARCHAR)
                      || ':' || CAST(p.doc_id AS VARCHAR)), 1, 14))::BIGINT
                      AS h
             FROM pdk p
             JOIN ab b ON b.source = p.source
             CROSS JOIN (SELECT unnest(range(1, 5)) AS e) e
             WHERE e.e <= b.ne
           ), cb AS (
             SELECT *, coalesce(sum(n_tok) OVER (
                      PARTITION BY source, epoch ORDER BY h, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS bef
             FROM ex
           ), served AS (
             SELECT source, epoch, doc_id, n_tok, h
             FROM cb
             WHERE epoch <= efull OR bef < fractok
           )
           SELECT source, epoch,
                  CAST(count(*) AS BIGINT) AS n_docs_served,
                  CAST(sum(n_tok) AS BIGINT) AS n_tokens_served,
                  md5(string_agg(CAST(doc_id AS VARCHAR), ','
                                 ORDER BY h, doc_id)) AS order_md5
           FROM served GROUP BY source, epoch
           ORDER BY source, epoch""",
      "q283_tokenizer_fertility" -> unigramFertilityOracle(rounds = 2,
        maxPieceLen = 4, vocabCap = 128, maxWordLen = 12,
        pruneNum = 1, pruneDen = 4),
      "q285_curation_pipeline_v6" -> {
        val patRows = spamPatterns.map(p => s"('$p')").mkString(", ")
        s"""WITH lk AS (
             SELECT doc_id FROM (
               WITH ${langIdTrainedCtes}
               SELECT b.doc_id, b.trained_lang FROM best b WHERE b.rn = 1) t
             WHERE trained_lang = 'en'
           ), rp AS (
             SELECT doc_id FROM ($repetitionGateOracle) t WHERE gopher_keep
           ), bl AS (
             SELECT d.doc_id
             FROM documents d CROSS JOIN (VALUES $patRows) AS p(pattern)
             GROUP BY d.doc_id
             HAVING sum(CAST((length(lower(d.text))
                          - length(replace(lower(d.text), p.pattern, '')))
                        // length(p.pattern) AS BIGINT)) < 1
           ), clean AS (
             SELECT d.doc_id, d.text
             FROM documents d
             JOIN lk ON lk.doc_id = d.doc_id
             JOIN rp ON rp.doc_id = d.doc_id
             JOIN bl ON bl.doc_id = d.doc_id
           ), ${dsirCtes("clean")}
           , sel AS (
             SELECT doc_id
             FROM (SELECT doc_id,
                     weight_micros + gumbel_micros AS key_micros
                   FROM g ORDER BY key_micros DESC, doc_id LIMIT 150)
           ), seldoc AS MATERIALIZED (
             SELECT doc_id, text,
                    CASE WHEN hs < 90 THEN 'train'
                         WHEN hs < 95 THEN 'valid' ELSE 'test' END AS split
             FROM (SELECT sel.doc_id, c.text,
                     ('0x' || substr(md5('graft:' || md5(c.text)),
                       1, 14))::BIGINT % 100 AS hs
                   FROM sel JOIN clean c ON c.doc_id = sel.doc_id) q
           ),
           ${unigramPrefixCtes(2, 4, 128, 12, src = "seldoc")},
           ${unigramPackTailSql(2, 4, 12, 512, src = "seldoc")}"""
      },
      "q286_doremi_mixture" -> doremiOracle(rounds = 3, etaDen = 2000L,
        stepCap = 500000L),
      "q287_stream_quota_gate" ->
        """WITH counts AS (
             SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(round(pow(CAST(count(*) AS DOUBLE), 0.7) * 1e6)
                         AS BIGINT) AS weight_micros
             FROM documents GROUP BY source
           ), tot AS (
             SELECT CAST(sum(weight_micros) AS BIGINT) AS t FROM counts
           ), b AS (
             SELECT source, n_docs, weight_micros,
                    (123 * weight_micros) // t AS base,
                    123 * weight_micros
                      - ((123 * weight_micros) // t) * t AS rem
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
           ), dd AS (
             SELECT doc_id, source, (doc_id // 20) % 2 AS wave
             FROM documents
           ), rr AS (
             SELECT doc_id, source, wave,
                    row_number() OVER (PARTITION BY source
                      ORDER BY wave, doc_id) AS rn
             FROM dd
           )
           SELECT rr.doc_id, rr.source, CAST(rr.wave AS BIGINT) AS wave,
                  rn <= q.quota AS admitted,
                  CAST(CASE WHEN rn <= q.quota THEN rn ELSE 0 END
                       AS BIGINT) AS adm_rank
           FROM rr JOIN q USING (source) ORDER BY doc_id""",
      "q288_packed_manifest" ->
        s"""SELECT split,
                  CAST(count(*) AS BIGINT) AS n_sequences,
                  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                  CAST(sum(n_docs_closed) AS BIGINT) AS n_docs_closed,
                  md5(string_agg(ids_md5, '' ORDER BY seq_id))
                    AS manifest_md5
           FROM (${unigramPackOracle(rounds = 2, maxPieceLen = 4,
             vocabCap = 128, maxWordLen = 12, budget = 512)}) t
           GROUP BY split ORDER BY split""",
      "q289_datasheet_v3" ->
        s"""WITH ${datasheetBaseCtes},
           $datasheetV2FragCtes,
           ${unigramSeedCtes(4, 128, 12)},
           vocab0 AS (SELECT piece, c AS vc FROM vocab),
           ${(1 to 2).map(r => unigramPrunedRoundCtes(r, 4, 12, 1, 4))
             .mkString(", ")},
           ${unigramDpCtes("e_", "v2", 4, 12)},
           fert AS (
             SELECT CAST((sum(f.np) * 1000000) // count(*) AS BIGINT)
                      AS fert_pieces_per_word_micros,
                    CAST((sum(length(dw.word)) * 1000000) // sum(f.np)
                         AS BIGINT) AS fert_chars_per_piece_micros
             FROM dw JOIN e_fin f ON f.word = dw.word
           ),
           ${sbHeldoutCtes},
           lm AS (
             SELECT CAST(count(*) AS BIGINT) AS lm_heldout_docs,
                    quantile_cont(nll, 0.5) AS lm_nll_p50,
                    CAST(min(nll) AS BIGINT) AS lm_nll_min,
                    CAST(max(nll) AS BIGINT) AS lm_nll_max
             FROM (SELECT CAST(((-lp_micros) * 1000) // n_trigrams
                               AS BIGINT) AS nll FROM sc)
           )
           SELECT $datasheetV2Select,
                  fert.fert_pieces_per_word_micros,
                  fert.fert_chars_per_piece_micros,
                  lm.lm_heldout_docs, lm.lm_nll_p50,
                  lm.lm_nll_min, lm.lm_nll_max
           FROM $datasheetV2From
                CROSS JOIN fert CROSS JOIN lm
           ORDER BY n_docs""",
      "q295_padding_waste" ->
        """WITH d AS (
             SELECT source, doc_id,
                    CAST(len([t for t in string_split_regex(text, '\s+')
                              if t <> '']) AS BIGINT) AS n_tok
             FROM documents
           ), arr AS (
             SELECT source, n_tok,
                    (row_number() OVER (PARTITION BY source
                       ORDER BY doc_id) - 1) // 8 AS b
             FROM d
           ), srt AS (
             SELECT source, n_tok,
                    (row_number() OVER (PARTITION BY source
                       ORDER BY n_tok, doc_id) - 1) // 8 AS b
             FROM d
           ), bkt AS (
             SELECT source, n_tok, n_tok // 16 AS bk,
                    (row_number() OVER (PARTITION BY source, n_tok // 16
                       ORDER BY doc_id) - 1) // 8 AS b
             FROM d
           ), arr_b AS (
             SELECT source, b, CAST(count(*) AS BIGINT) AS bn,
                    max(n_tok) AS bmax, CAST(sum(n_tok) AS BIGINT) AS bsum
             FROM arr GROUP BY source, b
           ), srt_b AS (
             SELECT source, b, CAST(count(*) AS BIGINT) AS bn,
                    max(n_tok) AS bmax, CAST(sum(n_tok) AS BIGINT) AS bsum
             FROM srt GROUP BY source, b
           ), bkt_b AS (
             SELECT source, bk, b, CAST(count(*) AS BIGINT) AS bn,
                    max(n_tok) AS bmax, CAST(sum(n_tok) AS BIGINT) AS bsum
             FROM bkt GROUP BY source, bk, b
           ), u AS (
             SELECT 'arrival' AS strategy, source,
                    CAST(count(*) AS BIGINT) AS n_batches,
                    CAST(sum(bsum) AS BIGINT) AS total_tokens,
                    CAST(sum(bn * bmax) AS BIGINT) AS padded_tokens
             FROM arr_b GROUP BY source
             UNION ALL
             SELECT 'sorted', source, CAST(count(*) AS BIGINT),
                    CAST(sum(bsum) AS BIGINT),
                    CAST(sum(bn * bmax) AS BIGINT)
             FROM srt_b GROUP BY source
             UNION ALL
             SELECT 'bucketed', source, CAST(count(*) AS BIGINT),
                    CAST(sum(bsum) AS BIGINT),
                    CAST(sum(bn * bmax) AS BIGINT)
             FROM bkt_b GROUP BY source
           )
           SELECT strategy, source, n_batches, total_tokens, padded_tokens,
                  CAST(CASE WHEN padded_tokens > 0
                       THEN ((padded_tokens - total_tokens) * 1000000)
                              // padded_tokens
                       ELSE 0 END AS BIGINT) AS waste_micros
           FROM u ORDER BY strategy, source""",
      "q296_gate_overlap" -> gateOverlapOracle,
      "q294_homoglyph_scrub" -> {
        val plantRows = (spamPlants ++ obfuscationPlants).map { case (id, txt) =>
          s"($id, '${txt.replace("'", "''")}')" }.mkString(", ")
        val patRows = spamPatterns.map(p => s"('$p')").mkString(", ")
        val cyr = "аео"
        val from = graft.operators.Scrub.confusableFrom
        val to = graft.operators.Scrub.confusableTo
        val zw = graft.operators.Scrub.zeroWidthClass
        s"""WITH d0 AS (
             SELECT doc_id, text FROM documents
             UNION ALL
             SELECT doc_id, text
             FROM (VALUES $plantRows) AS plants(doc_id, text)
           ), d AS (
             SELECT doc_id,
                    CASE WHEN doc_id % 3 = 1 THEN 'homoglyph'
                         WHEN doc_id % 3 = 2 THEN 'zwsp'
                         ELSE 'none' END AS obf_mode,
                    CASE WHEN doc_id % 3 = 1 THEN translate(text, 'aeo', '$cyr')
                         WHEN doc_id % 3 = 2 THEN replace(text, 'e', 'e' || chr(8203))
                         ELSE text END AS ot
             FROM d0
           ), s AS (
             SELECT doc_id, obf_mode, lower(ot) AS raw_t,
                    lower(translate(regexp_replace(ot, '$zw', '', 'g'),
                          '$from', '$to')) AS scr_t
             FROM d
           ), p AS (
             SELECT pattern FROM (VALUES $patRows) AS pv(pattern)
           ), h AS (
             SELECT doc_id, obf_mode,
                    CAST((length(raw_t) - length(replace(raw_t, pattern, '')))
                         // length(pattern) AS BIGINT) AS rh,
                    CAST((length(scr_t) - length(replace(scr_t, pattern, '')))
                         // length(pattern) AS BIGINT) AS sh
             FROM s CROSS JOIN p
           ), g AS (
             SELECT doc_id, obf_mode,
                    CAST(sum(rh) AS BIGINT) AS raw_hits,
                    CAST(sum(sh) AS BIGINT) AS scrubbed_hits
             FROM h GROUP BY doc_id, obf_mode
           )
           SELECT doc_id, obf_mode, raw_hits, scrubbed_hits,
                  raw_hits < 1 AS raw_keep,
                  scrubbed_hits < 1 AS scrubbed_keep,
                  (raw_hits < 1 AND scrubbed_hits >= 1) AS evaded
           FROM g ORDER BY doc_id""" },
      "q299_mauve_frontier" ->
        s"""WITH ${kmeansCtesSql("embeddings", 8, 2, "mauve")},
          mfl AS (SELECT m.vec_id, m.cell, e.label < 5 AS is_p
                  FROM m2 m JOIN embeddings e USING (vec_id)),
          mhc AS (SELECT cell,
                   CAST(sum(CASE WHEN is_p THEN 1 ELSE 0 END) AS BIGINT)
                     AS cnt_p,
                   CAST(sum(CASE WHEN is_p THEN 0 ELSE 1 END) AS BIGINT)
                     AS cnt_q
                 FROM mfl GROUP BY cell),
          mtt AS (SELECT CAST(sum(cnt_p) AS BIGINT) AS np,
                        CAST(sum(cnt_q) AS BIGINT) AS nq FROM mhc),
          mlg AS (SELECT CAST(j AS BIGINT) AS lambda_num
                 FROM generate_series(1, 7) AS gs(j)),
           tm AS (SELECT lambda_num, cnt_p, cnt_q, np, nq,
                    lambda_num * cnt_p * nq
                      + (8 - lambda_num) * cnt_q * np AS den
                  FROM mhc CROSS JOIN mtt CROSS JOIN mlg),
          mkq AS (SELECT lambda_num,
                   CAST(sum(cnt_p * (CASE WHEN cnt_p > 0
                     THEN CAST(round(1000000 * ln(
                       CAST(8 * cnt_p * nq AS DOUBLE)
                         / CAST(den AS DOUBLE))) AS BIGINT)
                     ELSE 0 END)) AS BIGINT) AS sump,
                   CAST(sum(cnt_q * (CASE WHEN cnt_q > 0
                     THEN CAST(round(1000000 * ln(
                       CAST(8 * cnt_q * np AS DOUBLE)
                         / CAST(den AS DOUBLE))) AS BIGINT)
                     ELSE 0 END)) AS BIGINT) AS sumq,
                   CAST(max(np) AS BIGINT) AS np,
                   CAST(max(nq) AS BIGINT) AS nq
                 FROM tm GROUP BY lambda_num)
           SELECT lambda_num,
                  (sump * 1000 + 1000000000000 * np) // np
                    - 1000000000000 AS kl_p_nano,
                  (sumq * 1000 + 1000000000000 * nq) // nq
                    - 1000000000000 AS kl_q_nano
           FROM mkq ORDER BY lambda_num""",
      "q301_hamming_rerank" ->
        s"""$embCte,
           c0 AS (SELECT vec_id, v, nrm,
                    ${signCodeSql("v", hammingPlanes)} AS code FROM n),
           qs AS (SELECT vec_id, v, nrm, code FROM c0
                  WHERE vec_id % 50 = 0),
           hm AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                    CAST(bit_count(xor(q.code, c.code)) AS BIGINT)
                      AS hamming,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY bit_count(xor(q.code, c.code)) ASC,
                        c.vec_id ASC) AS rnk
                  FROM qs q CROSS JOIN c0 c),
           sh AS (SELECT q_id, c_id, hamming FROM hm WHERE rnk <= 20),
           rr AS (SELECT sh.q_id, sh.c_id, sh.hamming,
                    ${cosSql("q.v", "q.nrm", "c.v", "c.nrm")} AS score
                  FROM sh JOIN qs q ON q.vec_id = sh.q_id
                          JOIN c0 c ON c.vec_id = sh.c_id),
           fin AS (SELECT q_id, c_id, hamming, score,
                     row_number() OVER (PARTITION BY q_id
                       ORDER BY score DESC, c_id ASC) AS rnk
                   FROM rr)
           SELECT q_id, CAST(rnk AS BIGINT) AS "rank", c_id, hamming,
                  score
           FROM fin WHERE rnk <= 5 ORDER BY q_id, rnk""",
      "q298_margin_mining" ->
        s"""$embCte,
           x AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 2 = 0),
           y AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 2 = 1),
           sf AS (SELECT x.vec_id AS x_id, y.vec_id AS y_id,
                    CAST(round(1000000 *
                      ${cosSql("x.v", "x.nrm", "y.v", "y.nrm")})
                      AS BIGINT) AS cm,
                    row_number() OVER (PARTITION BY x.vec_id
                      ORDER BY ${cosSql("x.v", "x.nrm", "y.v", "y.nrm")}
                        DESC, y.vec_id ASC) AS rnk
                  FROM x CROSS JOIN y),
           fwd AS (SELECT x_id, y_id, cm FROM sf WHERE rnk <= 4),
           sb AS (SELECT x.vec_id AS x_id, y.vec_id AS y_id,
                    CAST(round(1000000 *
                      ${cosSql("y.v", "y.nrm", "x.v", "x.nrm")})
                      AS BIGINT) AS cm,
                    row_number() OVER (PARTITION BY y.vec_id
                      ORDER BY ${cosSql("y.v", "y.nrm", "x.v", "x.nrm")}
                        DESC, x.vec_id ASC) AS rnk
                  FROM y CROSS JOIN x),
           bwd AS (SELECT x_id, y_id, cm FROM sb WHERE rnk <= 4),
           penx AS (SELECT x_id, CAST(sum(cm) AS BIGINT) AS px
                    FROM fwd GROUP BY x_id),
           peny AS (SELECT y_id, CAST(sum(cm) AS BIGINT) AS py
                    FROM bwd GROUP BY y_id),
           fm AS (SELECT f.x_id, f.y_id, f.cm,
                    (f.cm * 8 * 1000000) // (px + py) AS margin
                  FROM fwd f
                  JOIN penx USING (x_id) JOIN peny USING (y_id)
                  WHERE f.cm >= 0 AND px + py > 0),
           bm AS (SELECT b.x_id, b.y_id, b.cm,
                    (b.cm * 8 * 1000000) // (px + py) AS margin
                  FROM bwd b
                  JOIN penx USING (x_id) JOIN peny USING (y_id)
                  WHERE b.cm >= 0 AND px + py > 0),
           bestf AS (SELECT x_id, y_id, cm, margin FROM (
                       SELECT *, row_number() OVER (PARTITION BY x_id
                         ORDER BY margin DESC, y_id ASC) AS r FROM fm)
                     WHERE r = 1),
           bestb AS (SELECT x_id, y_id FROM (
                       SELECT *, row_number() OVER (PARTITION BY y_id
                         ORDER BY margin DESC, x_id ASC) AS r FROM bm)
                     WHERE r = 1)
           SELECT f.x_id, f.y_id, f.cm AS cos_micro,
                  f.margin AS margin_micro,
                  f.margin >= 1060000 AS mined
           FROM bestf f JOIN bestb b
             ON f.x_id = b.x_id AND f.y_id = b.y_id
           ORDER BY f.x_id""",
      "q293_attr_filtered_ann" ->
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                  label FROM embeddings),
           n AS (SELECT vec_id, v, label,
                   sqrt(list_dot_product(v, v)) AS nrm FROM e),
           q AS (SELECT vec_id, v, nrm, label FROM n
                 WHERE vec_id % 50 = 0),
           s AS (SELECT q.vec_id AS q_id, q.label AS label,
                   c.vec_id AS c_id,
                   ${cosSql("q.v", "q.nrm", "c.v", "c.nrm")} AS score
                 FROM q JOIN n c ON q.label = c.label
                 WHERE q.vec_id <> c.vec_id),
           r AS (SELECT q_id, label, c_id, score,
                   row_number() OVER (PARTITION BY q_id
                     ORDER BY score DESC, c_id ASC) AS rnk
                 FROM s)
           SELECT q_id, label, CAST(rnk AS BIGINT) AS "rank", c_id, score
           FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""",
      "q304_late_interaction" ->
        """WITH li_t AS (
             SELECT doc_id,
                    list_filter(string_split_regex(lower(text), '\s+'),
                                t -> t <> '') AS ts
             FROM documents
           ), li_p AS (
             SELECT doc_id, unnest(ts) AS tok,
                    unnest(range(1, len(ts) + 1)) AS pos
             FROM li_t
           ), li_m AS (
             SELECT doc_id, tok, min(pos) AS mp
             FROM li_p GROUP BY doc_id, tok
           ), li_k AS (
             SELECT doc_id, tok FROM (
               SELECT doc_id, tok,
                      row_number() OVER (PARTITION BY doc_id
                        ORDER BY mp) AS r
               FROM li_m) WHERE r <= 8
           ), li_g AS (
             SELECT doc_id, tok,
                    unnest(CASE WHEN len(tok) < 3 THEN [tok]
                           ELSE [substr(tok, i, 3)
                                 for i in range(1, len(tok) - 1)]
                           END) AS g
             FROM li_k
           ), li_b AS (
             SELECT doc_id, tok,
                    ('0x' || substr(md5(g), 1, 14))::BIGINT % 64 AS b,
                    CAST(count(*) AS BIGINT) AS c
             FROM li_g GROUP BY doc_id, tok, b
           ), li_n AS (
             SELECT doc_id, tok, CAST(sum(c * c) AS BIGINT) AS n2
             FROM li_b GROUP BY doc_id, tok
           ), li_pair AS (
             SELECT q.doc_id AS q_id, q.tok AS qt, qn.n2 AS qn2,
                    c.doc_id AS c_id, c.tok AS dt, cn.n2 AS dn2,
                    CAST(sum(q.c * c.c) AS BIGINT) AS dot
             FROM li_b q
             JOIN li_b c ON q.b = c.b
             JOIN li_n qn ON qn.doc_id = q.doc_id AND qn.tok = q.tok
             JOIN li_n cn ON cn.doc_id = c.doc_id AND cn.tok = c.tok
             WHERE q.doc_id % 100 = 0 AND c.doc_id % 5 = 0
             GROUP BY q.doc_id, q.tok, qn.n2, c.doc_id, c.tok, cn.n2
           ), li_ms AS (
             SELECT q_id, qt, c_id,
                    CAST(round(max(CAST(dot AS DOUBLE)
                      / (sqrt(CAST(qn2 AS DOUBLE))
                         * sqrt(CAST(dn2 AS DOUBLE)))) * 1e6) AS BIGINT)
                      AS msq
             FROM li_pair GROUP BY q_id, qt, c_id
           ), li_sc AS (
             SELECT q_id, c_id, CAST(sum(msq) AS BIGINT) AS score_micros
             FROM li_ms GROUP BY q_id, c_id
           )
           SELECT q_id, CAST(rnk AS BIGINT) AS "rank", c_id, score_micros
           FROM (SELECT q_id, c_id, score_micros,
                   row_number() OVER (PARTITION BY q_id
                     ORDER BY score_micros DESC, c_id ASC) AS rnk
                 FROM li_sc)
           WHERE rnk <= 3 ORDER BY q_id, rnk""",
      "q303_stream_semantic_drift" ->
        s"""WITH ${kmeansCtesSql(
              "(SELECT vec_id, embedding FROM embeddings WHERE label < 5)",
              8, 2, "drift", "d")},
           refh AS (SELECT cell, CAST(count(*) AS BIGINT) AS cnt_p
                    FROM dm2 GROUP BY cell),
           rt AS (SELECT CAST(sum(cnt_p) AS BIGINT) AS np FROM refh),
           sq AS (SELECT vec_id,
                    CASE WHEN vec_id % 3 = 0 THEN 0 ELSE 1 END AS wave,
                    list_transform(CAST(embedding AS DOUBLE[]),
                      x -> CAST(round(x * 1000000) AS BIGINT)) AS vq
                  FROM embeddings WHERE label >= 5),
           sa0 AS (SELECT s.vec_id, s.wave, c.cell,
                     CAST(list_sum([(s.vq[j] - c.cvec[j])
                                    * (s.vq[j] - c.cvec[j])
                                    for j in range(1, len(s.vq) + 1)])
                          AS BIGINT) AS dist
                   FROM sq s, dc1 c),
           sa AS (SELECT vec_id, wave, cell FROM (
                    SELECT vec_id, wave, cell,
                           row_number() OVER (PARTITION BY vec_id
                             ORDER BY dist, cell) AS rn
                    FROM sa0) WHERE rn = 1),
           sh AS (SELECT wave, cell, CAST(count(*) AS BIGINT) AS cnt_q
                  FROM sa GROUP BY wave, cell),
           swt AS (SELECT wave, CAST(sum(cnt_q) AS BIGINT) AS nq
                   FROM sh GROUP BY wave),
           cl AS (SELECT DISTINCT wave, cell FROM (
                    SELECT w.wave, r.cell
                    FROM (SELECT DISTINCT wave FROM sh) w
                    CROSS JOIN refh r
                    UNION ALL SELECT wave, cell FROM sh)),
           base AS (SELECT c.wave, c.cell,
                      coalesce(r.cnt_p, 0) AS cnt_p,
                      coalesce(s.cnt_q, 0) AS cnt_q
                    FROM cl c
                    LEFT JOIN refh r ON r.cell = c.cell
                    LEFT JOIN sh s ON s.wave = c.wave
                                  AND s.cell = c.cell),
           dlg AS (SELECT CAST(j AS BIGINT) AS lambda_num
                   FROM generate_series(1, 7) AS gs(j)),
           dtm AS (SELECT b.wave, b.cnt_p, b.cnt_q, t.np, u.nq,
                     l.lambda_num,
                     l.lambda_num * b.cnt_p * u.nq
                       + (8 - l.lambda_num) * b.cnt_q * t.np AS den
                   FROM base b CROSS JOIN rt t
                   JOIN swt u ON u.wave = b.wave
                   CROSS JOIN dlg l),
           dkq AS (SELECT wave, lambda_num,
                     CAST(sum(cnt_p * (CASE WHEN cnt_p > 0
                       THEN CAST(round(1000000 * ln(
                         CAST(8 * cnt_p * nq AS DOUBLE)
                           / CAST(den AS DOUBLE))) AS BIGINT)
                       ELSE 0 END)) AS BIGINT) AS sump,
                     CAST(sum(cnt_q * (CASE WHEN cnt_q > 0
                       THEN CAST(round(1000000 * ln(
                         CAST(8 * cnt_q * np AS DOUBLE)
                           / CAST(den AS DOUBLE))) AS BIGINT)
                       ELSE 0 END)) AS BIGINT) AS sumq,
                     CAST(max(np) AS BIGINT) AS np,
                     CAST(max(nq) AS BIGINT) AS nq
                   FROM dtm GROUP BY wave, lambda_num)
           SELECT CAST(wave AS BIGINT) AS wave, lambda_num,
                  (sump * 1000 + 1000000000000 * np) // np
                    - 1000000000000 AS kl_p_nano,
                  (sumq * 1000 + 1000000000000 * nq) // nq
                    - 1000000000000 AS kl_q_nano
           FROM dkq ORDER BY wave, lambda_num""",
      "q307_vocab_richness" ->
        """WITH tk AS (
             SELECT source,
                    unnest([t for t in string_split_regex(lower(text),
                            '\s+') if t <> '']) AS tok
             FROM documents
           ), fr AS (
             SELECT source, tok, CAST(count(*) AS BIGINT) AS c
             FROM tk GROUP BY source, tok
           ), sp AS (
             SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                    CAST(count(*) AS BIGINT) AS vocab,
                    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_hapax,
                    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_dis
             FROM fr GROUP BY source
           )
           SELECT source, n_tokens, vocab, n_hapax, n_dis,
                  n_hapax * 1000000 // n_tokens AS gt_unseen_micros,
                  CASE WHEN n_dis > 0
                       THEN vocab * 1000000
                         + n_hapax * n_hapax * 1000000 // (2 * n_dis)
                       ELSE NULL END AS chao1_micros
           FROM sp ORDER BY source""",
      "q306_eb_source_prior" -> {
        val hitCols = langMarkersSql.map { case (lang, list) =>
          s"CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x IN ($list))) AS INTEGER) AS hits_$lang"
        }.mkString(",\n  ")
        val langs = langMarkersSql.map(_._1)
        val mx = "greatest(" + langs.map(l => s"hits_$l").mkString(", ") + ")"
        val pick = langs.map(l => s"WHEN hits_$l = $mx THEN '$l'").mkString(" ")
        s"""WITH h AS (
             SELECT doc_id, source, lang, $hitCols FROM documents
           ), p AS (
             SELECT doc_id, source, lang, CASE $pick END AS pl FROM h
           ), g AS (
             SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(CASE WHEN pl = lang THEN 1 ELSE 0 END)
                         AS BIGINT) AS n_match
             FROM p GROUP BY source
           ), t AS (
             SELECT CAST(sum(n_docs) AS BIGINT) AS tn,
                    CAST(sum(n_match) AS BIGINT) AS tk FROM g
           )
           SELECT source, n_docs, n_match,
                  n_match * 1000000 // n_docs AS raw_rate_micros,
                  tk * 1000000 // tn AS global_rate_micros,
                  (n_match * tn + 25 * tk) * 1000000
                    // ((n_docs + 25) * tn) AS shrunk_rate_micros
           FROM g CROSS JOIN t ORDER BY source""" },
      "q305_lm_interp_sweep" ->
        s"""WITH tr AS (
             SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                                t -> t <> '') AS ts
             FROM documents WHERE doc_id % 10 <> 0
           ), c1 AS (
             SELECT tok AS w, CAST(count(*) AS BIGINT) AS c1
             FROM (SELECT unnest(ts) AS tok FROM tr) GROUP BY tok
           ), tot AS (
             SELECT CAST(sum(c1) AS BIGINT) AS n,
                    CAST(count(*) AS BIGINT) AS v FROM c1
           ), c2 AS (
             SELECT b.u AS u, b.v AS v, CAST(count(*) AS BIGINT) AS c2
             FROM (SELECT unnest([{'u': ts[i], 'v': ts[i+1]}
                                  for i in range(1, len(ts))]) AS b
                   FROM tr WHERE len(ts) >= 2)
             GROUP BY b.u, b.v
           ), c3 AS (
             SELECT g.u AS u, g.v AS v, g.w AS w,
                    CAST(count(*) AS BIGINT) AS c3
             FROM (SELECT unnest([{'u': ts[i], 'v': ts[i+1], 'w': ts[i+2]}
                                  for i in range(1, len(ts) - 1)]) AS g
                   FROM tr WHERE len(ts) >= 3)
             GROUP BY g.u, g.v, g.w
           ), bt AS (
             SELECT u, v FROM c2
           ), btot AS (
             SELECT CAST(count(*) AS BIGINT) AS b FROM bt
           ), ctx3 AS (
             SELECT u, v, CAST(sum(c3) AS BIGINT) AS ctx3,
                    CAST(count(*) AS BIGINT) AS n3after
             FROM c3 GROUP BY u, v
           ), cvw AS (
             SELECT v, w, CAST(count(*) AS BIGINT) AS cc2
             FROM c3 GROUP BY v, w
           ), mid AS (
             SELECT v, CAST(count(*) AS BIGINT) AS ccmid,
                    CAST(count(DISTINCT w) AS BIGINT) AS ccafter
             FROM c3 GROUP BY v
           ), cc1 AS (
             SELECT v AS w, CAST(count(*) AS BIGINT) AS cc1
             FROM bt GROUP BY v
           ), sd AS (
             SELECT doc_id,
                    list_filter(string_split_regex(lower(text), '\\s+'),
                                t -> t <> '') AS ts
             FROM (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
                   UNION ALL
                   SELECT 30000002, '$sbOovDoc')
           ), pd AS (
             SELECT doc_id, g.u AS u, g.v AS v, g.w AS w,
                    CAST(count(*) AS BIGINT) AS c
             FROM (SELECT doc_id,
                          unnest([{'u': ts[i], 'v': ts[i+1], 'w': ts[i+2]}
                                  for i in range(1, len(ts) - 1)]) AS g
                   FROM sd WHERE len(ts) >= 3)
             GROUP BY doc_id, g.u, g.v, g.w
           ), j1 AS (
             SELECT pd.c,
                    c3.c3, uv.c2 AS c2uv, vw.c2 AS c2vw,
                    cv.c1 AS c1v, cw.c1 AS c1w,
                    x.ctx3, x.n3after, cvw.cc2, mid.ccmid, mid.ccafter,
                    t.n, t.v AS vv, bb.b,
                    CAST(coalesce(cc1.cc1, 0) + 1 AS DOUBLE)
                      / CAST(bb.b + t.v + 1 AS DOUBLE) AS p1
             FROM pd
             LEFT JOIN c3 ON c3.u = pd.u AND c3.v = pd.v AND c3.w = pd.w
             LEFT JOIN c2 uv ON uv.u = pd.u AND uv.v = pd.v
             LEFT JOIN c2 vw ON vw.u = pd.v AND vw.v = pd.w
             LEFT JOIN c1 cv ON cv.w = pd.v
             LEFT JOIN c1 cw ON cw.w = pd.w
             LEFT JOIN ctx3 x ON x.u = pd.u AND x.v = pd.v
             LEFT JOIN cvw ON cvw.v = pd.v AND cvw.w = pd.w
             LEFT JOIN mid ON mid.v = pd.v
             LEFT JOIN cc1 ON cc1.w = pd.w
             CROSS JOIN tot t CROSS JOIN btot bb
           ), j2 AS (
             SELECT c, c3, ctx3, n3after,
                    CASE WHEN c3 IS NOT NULL
                         THEN CAST(c3 AS DOUBLE) / CAST(c2uv AS DOUBLE)
                         WHEN c2vw IS NOT NULL
                         THEN 0.4 * (CAST(c2vw AS DOUBLE)
                                     / CAST(c1v AS DOUBLE))
                         ELSE 0.4 * 0.4 *
                           (CAST(coalesce(c1w, 0) + 1 AS DOUBLE)
                             / CAST(n + vv AS DOUBLE)) END AS psb,
                    CASE WHEN ccmid IS NOT NULL
                         THEN greatest(CAST(coalesce(cc2, 0) AS DOUBLE)
                                - 0.75, 0.0) / CAST(ccmid AS DOUBLE)
                           + 0.75 * CAST(ccafter AS DOUBLE)
                             / CAST(ccmid AS DOUBLE) * p1
                         ELSE p1 END AS p2
             FROM j1
           ), j3 AS (
             SELECT c, psb,
                    CASE WHEN ctx3 IS NOT NULL
                         THEN greatest(CAST(coalesce(c3, 0) AS DOUBLE)
                                - 0.75, 0.0) / CAST(ctx3 AS DOUBLE)
                           + 0.75 * CAST(n3after AS DOUBLE)
                             / CAST(ctx3 AS DOUBLE) * p2
                         ELSE p2 END AS pkn
             FROM j2
           ), lam AS (
             SELECT CAST(j AS BIGINT) AS lambda_num
             FROM generate_series(0, 8) AS gs(j)
           )
           SELECT lambda_num, CAST(sum(c) AS BIGINT) AS n_trigrams,
                  CAST(sum(CAST(round(ln(
                      (CAST(lambda_num AS DOUBLE) * pkn
                       + CAST(8 - lambda_num AS DOUBLE) * psb)
                      / CAST(8 AS DOUBLE)) * 1e6) AS BIGINT) * c)
                    AS BIGINT) AS logprob_micros
           FROM j3 CROSS JOIN lam
           GROUP BY lambda_num ORDER BY lambda_num""",
      "q302_kneser_ney" ->
        s"""WITH tr AS (
             SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                                t -> t <> '') AS ts
             FROM documents WHERE doc_id % 10 <> 0
           ), c1 AS (
             SELECT tok AS w, CAST(count(*) AS BIGINT) AS c1
             FROM (SELECT unnest(ts) AS tok FROM tr) GROUP BY tok
           ), bt AS (
             SELECT DISTINCT b.u AS u, b.v AS v
             FROM (SELECT unnest([{'u': ts[i], 'v': ts[i+1]}
                                  for i in range(1, len(ts))]) AS b
                   FROM tr WHERE len(ts) >= 2)
           ), c3 AS (
             SELECT g.u AS u, g.v AS v, g.w AS w,
                    CAST(count(*) AS BIGINT) AS c3
             FROM (SELECT unnest([{'u': ts[i], 'v': ts[i+1], 'w': ts[i+2]}
                                  for i in range(1, len(ts) - 1)]) AS g
                   FROM tr WHERE len(ts) >= 3)
             GROUP BY g.u, g.v, g.w
           ), ctx3 AS (
             SELECT u, v, CAST(sum(c3) AS BIGINT) AS ctx3,
                    CAST(count(*) AS BIGINT) AS n3after
             FROM c3 GROUP BY u, v
           ), cvw AS (
             SELECT v, w, CAST(count(*) AS BIGINT) AS cc2
             FROM c3 GROUP BY v, w
           ), mid AS (
             SELECT v, CAST(count(*) AS BIGINT) AS ccmid,
                    CAST(count(DISTINCT w) AS BIGINT) AS ccafter
             FROM c3 GROUP BY v
           ), cc1 AS (
             SELECT v AS w, CAST(count(*) AS BIGINT) AS cc1
             FROM bt GROUP BY v
           ), tot AS (
             SELECT (SELECT CAST(count(*) AS BIGINT) FROM bt) AS b,
                    (SELECT CAST(count(*) AS BIGINT) FROM c1) AS vocab
           ), sd AS (
             SELECT doc_id,
                    list_filter(string_split_regex(lower(text), '\\s+'),
                                t -> t <> '') AS ts
             FROM (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
                   UNION ALL
                   SELECT 30000002, '$sbOovDoc')
           ), pd AS (
             SELECT doc_id, g.u AS u, g.v AS v, g.w AS w,
                    CAST(count(*) AS BIGINT) AS c
             FROM (SELECT doc_id,
                          unnest([{'u': ts[i], 'v': ts[i+1], 'w': ts[i+2]}
                                  for i in range(1, len(ts) - 1)]) AS g
                   FROM sd WHERE len(ts) >= 3)
             GROUP BY doc_id, g.u, g.v, g.w
           ), j1 AS (
             SELECT pd.doc_id, pd.c,
                    c3.c3, x.ctx3, x.n3after, cvw.cc2,
                    mid.ccmid, mid.ccafter,
                    CAST(coalesce(cc1.cc1, 0) + 1 AS DOUBLE)
                      / CAST(t.b + t.vocab + 1 AS DOUBLE) AS p1
             FROM pd
             LEFT JOIN c3 ON c3.u = pd.u AND c3.v = pd.v AND c3.w = pd.w
             LEFT JOIN ctx3 x ON x.u = pd.u AND x.v = pd.v
             LEFT JOIN cvw ON cvw.v = pd.v AND cvw.w = pd.w
             LEFT JOIN mid ON mid.v = pd.v
             LEFT JOIN cc1 ON cc1.w = pd.w
             CROSS JOIN tot t
           ), j2 AS (
             SELECT doc_id, c, c3, ctx3, n3after,
                    CASE WHEN ccmid IS NOT NULL
                         THEN greatest(CAST(coalesce(cc2, 0) AS DOUBLE)
                                - 0.75, 0.0) / CAST(ccmid AS DOUBLE)
                           + 0.75 * CAST(ccafter AS DOUBLE)
                             / CAST(ccmid AS DOUBLE) * p1
                         ELSE p1 END AS p2
             FROM j1
           ), j3 AS (
             SELECT doc_id, c,
                    CASE WHEN ctx3 IS NOT NULL
                         THEN greatest(CAST(coalesce(c3, 0) AS DOUBLE)
                                - 0.75, 0.0) / CAST(ctx3 AS DOUBLE)
                           + 0.75 * CAST(n3after AS DOUBLE)
                             / CAST(ctx3 AS DOUBLE) * p2
                         ELSE p2 END AS p3
             FROM j2
           )
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
                  CAST(sum(CAST(round(ln(p3) * 1e6) AS BIGINT) * c)
                       AS BIGINT) AS logprob_micros
           FROM j3 GROUP BY doc_id ORDER BY doc_id""",
      "q300_heaps_fit" ->
        """WITH tk AS (
             SELECT source, doc_id,
                    unnest([t for t in string_split_regex(lower(text),
                            '\s+') if t <> '']) AS tok
             FROM documents
           ), pd AS (
             SELECT source, doc_id, CAST(count(*) AS BIGINT) AS ntok
             FROM tk GROUP BY source, doc_id
           ), fo AS (
             SELECT source, tok, min(doc_id) AS doc_id
             FROM tk GROUP BY source, tok
           ), nv AS (
             SELECT source, doc_id, CAST(count(*) AS BIGINT) AS nvoc
             FROM fo GROUP BY source, doc_id
           ), cm AS (
             SELECT p.source, p.doc_id,
                    sum(p.ntok) OVER (PARTITION BY p.source
                      ORDER BY p.doc_id) AS ct,
                    sum(coalesce(n.nvoc, 0)) OVER (PARTITION BY p.source
                      ORDER BY p.doc_id) AS cv
             FROM pd p LEFT JOIN nv n USING (source, doc_id)
           ), xy AS (
             SELECT source,
                    CAST(round(ln(CAST(ct AS DOUBLE)) * 1e6) AS BIGINT) AS x,
                    CAST(round(ln(CAST(cv AS DOUBLE)) * 1e6) AS BIGINT) AS y
             FROM cm WHERE ct > 0 AND cv > 0
           ), s AS (
             SELECT source, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(x) AS BIGINT) AS sx,
                    CAST(sum(y) AS BIGINT) AS sy,
                    CAST(sum(x * y) AS BIGINT) AS sxy,
                    CAST(sum(x * x) AS BIGINT) AS sxx,
                    CAST(sum(y * y) AS BIGINT) AS syy
             FROM xy GROUP BY source
           ), ab AS (
             SELECT source, n, sx, sy,
                    n * sxy - sx * sy AS a,
                    n * sxx - sx * sx AS b,
                    n * syy - sy * sy AS c
             FROM s
           )
           SELECT source, n AS n_points,
                  CASE WHEN b = 0 THEN NULL
                       ELSE CAST(round(1000000
                         * (CAST(a AS DOUBLE) / CAST(b AS DOUBLE)))
                         AS BIGINT) END AS slope_micro,
                  CASE WHEN b = 0 THEN NULL
                       ELSE CAST(round((CAST(sy AS DOUBLE)
                           - (CAST(a AS DOUBLE) / CAST(b AS DOUBLE))
                             * CAST(sx AS DOUBLE))
                          / CAST(n AS DOUBLE)) AS BIGINT)
                       END AS intercept_micro,
                  CASE WHEN b = 0 OR c = 0 THEN NULL
                       ELSE CAST(round(1000000
                         * ((CAST(a AS DOUBLE) * CAST(a AS DOUBLE))
                            / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))))
                         AS BIGINT) END AS r2_micro
           FROM ab ORDER BY source""",
      "q297_zipf_fit" ->
        """WITH tk AS (
             SELECT source,
                    unnest([t for t in string_split_regex(lower(text),
                            '\s+') if t <> '']) AS tok
             FROM documents
           ), fr AS (
             SELECT source, tok, CAST(count(*) AS BIGINT) AS f
             FROM tk GROUP BY source, tok
           ), rk AS (
             SELECT source, tok, f,
                    row_number() OVER (PARTITION BY source
                      ORDER BY f DESC, tok) AS r
             FROM fr
           ), xy AS (
             SELECT source,
                    CAST(round(ln(CAST(r AS DOUBLE)) * 1e6) AS BIGINT) AS x,
                    CAST(round(ln(CAST(f AS DOUBLE)) * 1e6) AS BIGINT) AS y
             FROM rk WHERE r <= 100
           ), s AS (
             SELECT source, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(x) AS BIGINT) AS sx,
                    CAST(sum(y) AS BIGINT) AS sy,
                    CAST(sum(x * y) AS BIGINT) AS sxy,
                    CAST(sum(x * x) AS BIGINT) AS sxx,
                    CAST(sum(y * y) AS BIGINT) AS syy
             FROM xy GROUP BY source
           ), ab AS (
             SELECT source, n, sx, sy,
                    n * sxy - sx * sy AS a,
                    n * sxx - sx * sx AS b,
                    n * syy - sy * sy AS c
             FROM s
           )
           SELECT source, n AS n_ranks,
                  CASE WHEN b = 0 THEN NULL
                       ELSE CAST(round(1000000
                         * (CAST(a AS DOUBLE) / CAST(b AS DOUBLE)))
                         AS BIGINT) END AS slope_micro,
                  CASE WHEN b = 0 THEN NULL
                       ELSE CAST(round((CAST(sy AS DOUBLE)
                           - (CAST(a AS DOUBLE) / CAST(b AS DOUBLE))
                             * CAST(sx AS DOUBLE))
                          / CAST(n AS DOUBLE)) AS BIGINT)
                       END AS intercept_micro,
                  CASE WHEN b = 0 OR c = 0 THEN NULL
                       ELSE CAST(round(1000000
                         * ((CAST(a AS DOUBLE) * CAST(a AS DOUBLE))
                            / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))))
                         AS BIGINT) END AS r2_micro
           FROM ab ORDER BY source""")

}
