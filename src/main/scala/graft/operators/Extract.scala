package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML MAIN-CONTENT EXTRACTION — the canonical pipeline stage
  * upstream of every clean-text operator in the engine: raw crawl
  * markup → segmented text blocks → boilerplate-scrubbed main
  * content. Every published LLM corpus assembly (C4, RefinedWeb,
  * Gopher; the jusText/boilerpipe lineage) opens with exactly this
  * pass; the engine's curation capstones (q73/q98/q136/q159) all
  * assume its OUTPUT (a plain-text `documents` table) already
  * exists. Reference capability anchor: the reference pipeline
  * consumes already-clean sheet text (`asctb_data_wrangling.py`),
  * so this family is part of the beyond-reference 100 TB surface,
  * not a port.
  *
  * Two independent, composable boilerplate criteria, both
  * INTEGER-EXACT so oracles replay them verbatim:
  *
  *  - LOCAL DENSITY RULES (jusText-style, per block, no shuffle):
  *    drop a block when it is too short (`n_chars < minChars`) or
  *    too link-dense (`link_chars * 1e6 div n_chars >
  *    maxLinkDensityMicros`) — navigation, button bars, footers;
  *  - CROSS-DOC FREQUENCY (CCNet/RefinedWeb line-dedup style, one
  *    gram^W block-text keyed aggregate): drop a block whose exact
  *    collapsed text appears in ≥ `minDocs` DISTINCT documents —
  *    site templates, disclaimers, cookie banners that local rules
  *    cannot see because they look like prose.
  *
  * Parsing itself (tag/script/comment strip, entity decode, block
  * segmentation, per-block link-char counts) is ONE codegen
  * projection per document — [[graft.functions.HtmlBlocksExpr]],
  * which documents the exact state-machine contract.
  *
  * 100 TB POSTURE: block segmentation and the density rules are
  * embarrassingly parallel (no shuffle at all — the explode stays
  * inside the stage). The frequency pass adds one aggregate keyed on
  * the block text and one left-anti join back, both partitioned by
  * the same key, and block texts are bounded by document size — the
  * same shape as the exact-dedup family ([[Dedup]]). Nothing is
  * collected to the driver; nothing is quadratic.
  */
object Extract {

  private def blocksCol(htmlCol: Column): Column = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    toColumn(graft.functions.HtmlBlocksExpr(toExpression(htmlCol)))
  }

  private def linksCol(htmlCol: Column): Column = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    toColumn(graft.functions.HtmlLinksExpr(toExpression(htmlCol)))
  }

  private def anchorsCol(htmlCol: Column): Column = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    toColumn(graft.functions.HtmlAnchorsExpr(toExpression(htmlCol)))
  }

  /** Outlinks WITH their anchor text
    * ([[graft.functions.HtmlAnchorsExpr]]), one row per `<a href>` in
    * document order: (idCol, link_idx, href, anchor) — `link_idx`
    * aligns index-for-index with [[htmlLinks]] by the shared scan
    * contract. The anchor is the link-description signal the web
    * aggregates per target page/domain. */
  def htmlAnchors(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(anchorsCol(col(htmlCol))).as(Seq("link_idx", "__a")))
      .select(col(idCol), col("link_idx").cast("long").as("link_idx"),
        col("__a.href").as("href"), col("__a.anchor").as("anchor"))

  /** Outlinks ([[graft.functions.HtmlLinksExpr]]), one row per
    * `<a href>` in document order: (idCol, link_idx, href) with
    * 0-based link_idx — the crawl-frontier edge list; compose with
    * [[UrlOps]] for canonicalization / domain folding / politeness
    * quotas downstream. */
  def htmlLinks(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(linksCol(col(htmlCol))).as(Seq("link_idx", "href")))
      .select(col(idCol), col("link_idx").cast("long").as("link_idx"),
        col("href"))

  /** Segmented text blocks, one row per non-empty block in document
    * order: (idCol, block_idx, text, n_chars, link_chars) with
    * 0-based block_idx. Docs whose markup yields no text emit no
    * rows. */
  def htmlBlocks(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(blocksCol(col(htmlCol))).as(Seq("block_idx", "__b")))
      .select(col(idCol), col("block_idx").cast("long").as("block_idx"),
        col("__b.text").as("text"), col("__b.n_chars").as("n_chars"),
        col("__b.link_chars").as("link_chars"))

  /** Per-block keep/drop report under the local density rules:
    * (idCol, block_idx, text, n_chars, link_chars,
    * link_density_micros, kept). `link_density_micros` is the exact
    * integer `link_chars * 1000000 div n_chars` (n_chars ≥ 1 for
    * every emitted block, so the division is total); `kept` is
    * `n_chars >= minChars AND density <= maxLinkDensityMicros`. */
  def blockReport(df: DataFrame, idCol: String, htmlCol: String,
      minChars: Int = 10, maxLinkDensityMicros: Long = 300000L): DataFrame = {
    require(minChars >= 1, "minChars must be >= 1")
    htmlBlocks(df, idCol, htmlCol)
      .withColumn("link_density_micros",
        expr("link_chars * 1000000 div n_chars"))
      .withColumn("kept",
        col("n_chars") >= minChars &&
          col("link_density_micros") <= maxLinkDensityMicros)
  }

  /** Per-document main content under the local density rules:
    * (idCol, n_blocks, n_kept, main_chars, main_text), one row per
    * input row — text-free markup reports (0, 0, 0, "").
    * `main_chars` is the total non-whitespace codepoints of the kept
    * blocks; `main_text` joins kept block texts with '\n' in
    * document order.
    *
    * ONE PURE PROJECTION — no explode, no shuffle: the blocks of a
    * document live in one array cell, so the per-doc rollup is a
    * single `aggregate` fold over that cell (the parser runs ONCE
    * per row — the fold references the array, not the parse;
    * ExtractSpec pins exchange-freedom and single-parse in the
    * physical plan). This is both the 100 TB shape (extraction
    * cost strictly linear in bytes, embarrassingly parallel) and
    * what makes the operator STREAMING-COMPATIBLE: a stateless
    * projection runs per micro-batch with no state store
    * ([[graft.streaming.StreamOps]]'s HTML ingest gate). */
  def mainContent(df: DataFrame, idCol: String, htmlCol: String,
      minChars: Int = 10, maxLinkDensityMicros: Long = 300000L): DataFrame = {
    require(minChars >= 1, "minChars must be >= 1")
    val cond = s"x.n_chars >= $minChars AND " +
      s"x.link_chars * 1000000 div x.n_chars <= $maxLinkDensityMicros"
    df.select(col(idCol), blocksCol(col(htmlCol)).as("__b"))
      .select(col(idCol), expr(
        s"""aggregate(
              __b,
              named_struct('nb', CAST(0 AS BIGINT), 'nk', CAST(0 AS BIGINT),
                           'mc', CAST(0 AS BIGINT), 'mt', ''),
              (acc, x) -> named_struct(
                'nb', acc.nb + CAST(1 AS BIGINT),
                'nk', acc.nk + IF($cond, CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
                'mc', acc.mc + IF($cond, x.n_chars, CAST(0 AS BIGINT)),
                'mt', IF($cond,
                         IF(acc.nk = 0, x.text, concat(acc.mt, '\n', x.text)),
                         acc.mt)))""").as("__r"))
      .select(col(idCol),
        coalesce(col("__r.nb"), lit(0L)).as("n_blocks"),
        coalesce(col("__r.nk"), lit(0L)).as("n_kept"),
        coalesce(col("__r.mc"), lit(0L)).as("main_chars"),
        coalesce(col("__r.mt"), lit("")).as("main_text"))
  }

  /** Cross-document boilerplate table: blocks whose exact collapsed
    * text appears in ≥ `minDocs` distinct documents —
    * (text, n_docs, n_occurrences), the site-template report. One
    * aggregate keyed on the block text. */
  def boilerplateBlocks(df: DataFrame, idCol: String, htmlCol: String,
      minDocs: Long): DataFrame = {
    require(minDocs >= 2, "minDocs must be >= 2 (1 flags everything)")
    htmlBlocks(df, idCol, htmlCol)
      .groupBy(col("text"))
      .agg(count_distinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Main content under BOTH criteria: the density rules plus the
    * cross-doc frequency rule (a block in ≥ `minDocs` distinct docs
    * is boilerplate even when it reads like prose — the disclaimer/
    * cookie-banner case local rules cannot catch). Same output shape
    * as [[mainContent]]; `n_blocks`/`n_kept` count all blocks and
    * the doubly-filtered survivors. The frequency set is derived
    * from the SAME corpus (self-referential, like line-dedup in
    * CCNet) — one block-text-keyed aggregate + one left-anti join. */
  def mainContentDf(df: DataFrame, idCol: String, htmlCol: String,
      minChars: Int = 10, maxLinkDensityMicros: Long = 300000L,
      minDocs: Long = 10L): DataFrame = {
    // ONE parse: the block report feeds three consumers (frequency
    // census, per-doc totals, survivors), which would otherwise each
    // re-run the parser over the corpus (plan-audited: 3 scans).
    // Pinning it via eager localCheckpoint (RDD-scoped blocks, the
    // suffix-family discipline — nothing outlives the ContextCleaner)
    // trades one materialization of the EXTRACTED blocks — a fraction
    // of the raw markup bytes — for two full re-parses. (The rollup's
    // all-docs spine still scans the source, but column-pruned to the
    // id alone — no parse.)
    val rep = blockReport(df, idCol, htmlCol, minChars, maxLinkDensityMicros)
      .localCheckpoint(true)
    val boiler = rep.groupBy(col("text"))
      .agg(count_distinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("text"))
    // left-anti join is the scale-safe "not in boilerplate set": both
    // sides key on the block text (Catalyst picks broadcast when the
    // census is small — site templates are constant in corpus size —
    // and falls back to a shuffled join past the threshold)
    val surviving = rep.filter(col("kept"))
      .join(boiler, Seq("text"), "left_anti")
    rollupBoth(df, idCol, rep, surviving)
  }

  private def robotsRulesCol(txtCol: Column, agent: String): Column = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    toColumn(graft.functions.RobotsRulesExpr(toExpression(txtCol), agent))
  }

  /** robots.txt fetch-permission gate (REP longest-match semantics):
    * every URL joins its registrable domain's robots rules for
    * `agent` ([[graft.functions.RobotsRulesExpr]] — parsed ONCE per
    * domain on the small side of the join, never per URL) and is
    * gated by the longest matching prefix rule: among rules whose
    * prefix starts the URL's path+query target, the LONGEST wins;
    * equal-length ties go to Allow; no match (or no robots for the
    * domain) means allowed. The evaluation is an in-row `aggregate`
    * fold — per URL a pure projection, no explode.
    *
    * Output: `urls` plus (domain, target, allowed). 100 TB posture:
    * one broadcast-or-shuffled equi join keyed on the domain (robots
    * tables are domain-count-sized — tiny next to a frontier), fold
    * cost linear in the domain's rule count. */
  def robotsGate(urls: DataFrame, urlCol: String, robots: DataFrame,
      domainCol: String, txtCol: String, agent: String): DataFrame = {
    val rulesTbl = robots.select(col(domainCol).as("__dom"),
      robotsRulesCol(col(txtCol), agent).as("__rules"))
    val rawTarget = regexp_replace(
      regexp_replace(col(urlCol), "#.*$", ""),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")
    urls
      .withColumn("domain", UrlOps.registrableDomain(col(urlCol)))
      .withColumn("target",
        when(rawTarget === "", lit("/")).otherwise(rawTarget))
      .join(rulesTbl, col("domain") === col("__dom"), "left")
      .withColumn("allowed", coalesce(expr(
        """aggregate(__rules,
             named_struct('len', CAST(-1 AS INT), 'allow', true),
             (acc, r) -> IF(startswith(target, r.prefix)
                            AND (length(r.prefix) > acc.len
                                 OR (length(r.prefix) = acc.len AND r.allow)),
                          named_struct('len', length(r.prefix),
                                       'allow', r.allow),
                          acc)).allow"""), lit(true)))
      .drop("__dom", "__rules")
  }

  private def rollupBoth(df: DataFrame, idCol: String, rep: DataFrame,
      surviving: DataFrame): DataFrame = {
    val totals = rep.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_blocks"))
    val keptAgg = surviving
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("main_chars"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("block_idx"), col("text")))),
          b => b("text"))).as("main_text"))
    df.select(col(idCol)).distinct()
      .join(totals, Seq(idCol), "left")
      .join(keptAgg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("main_chars"), lit(0L)).as("main_chars"),
        coalesce(col("main_text"), lit("")).as("main_text"))
  }
}
