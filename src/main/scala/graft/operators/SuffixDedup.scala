package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Suffix-ordinal dedup — the LONG-REPEATED-SUBSTRING family (Lee et
  * al. 2021 "Deduplicating Training Data Makes Language Models
  * Better", the ExactSubstr suffix-array tier): find maximal repeated
  * substrings ≥ L chars ANYWHERE in the corpus (cross-doc or
  * within-doc), report their true lengths, and scrub the non-first
  * occurrences — the canonical LLM-dedup member between fixed-n gram
  * spans ([[TextAnalysis.duplicateSpans]], which can detect but not
  * measure) and CDC chunk dedup ([[TextAnalysis.scrubSharedChunks]],
  * which only sees chunk-aligned repeats).
  *
  * THE DISTRIBUTED SUFFIX-ARRAY SHAPE: a classical suffix array sorts
  * all corpus suffixes and reads repeats off adjacent-pair LCPs.
  * Here each suffix is represented by a FIXED-WIDTH prefix of
  * `maxLcp` chars, globally range-ordered on (prefix, doc, pos), and
  * adjacent pairs come straight off the sorted partitions
  * ([[Layout.sortedNeighborPairs]] — one range shuffle, a
  * one-row-per-partition boundary exchange, no driver-side sort, no
  * pointer-chasing SA construction). The order is the true suffix
  * order up to depth `maxLcp` (the CAP); suffixes tied past the cap
  * order by (doc, pos). Each adjacent pair's LCP is then ONE
  * codepoint comparison over the carried prefixes
  * ([[graft.functions.LcpExpr]]), capped at `maxLcp` by
  * construction. The prefix is deliberately ONE wide column, not a
  * tuple of blocks: the range sort then pays a single memcmp-style
  * compare per row pair instead of N column comparisons (measured
  * ~3× on the whole pipeline at sf0.1). Everything replays verbatim
  * in an oracle engine: ORDER BY the same substring + (doc, pos),
  * LAG for the neighbor, LCP as a pure codepoint comparison.
  *
  * WHY ADJACENT PAIRS SUFFICE: if a substring of length M ≥ L repeats,
  * the two suffixes at its occurrences share an M-prefix; every
  * suffix BETWEEN them in suffix order also shares it (lexicographic
  * interval property, exact here whenever M ≤ cap), so both
  * occurrences see an adjacent neighbor with LCP ≥ min(M, cap) ≥ L —
  * detection never needs the quadratic all-pairs within a run.
  *
  * COST MODEL AT 100 TB: suffix rows ≈ corpus chars, each carrying a
  * `maxLcp`-byte prefix — a ~cap× amplification through ONE range
  * shuffle. That is the inherent price of distributed suffix-order
  * construction (prefix-doubling SA builders pay log n such rounds;
  * this single-round capped form is the bounded-depth trade), and
  * the cap is the knob: L ≤ cap ≤ a few hundred chars covers the
  * dedup regime. The [[scrubRepeatedSubstrings]] path below avoids
  * even that: coverage-equivalent gram counting with NO suffix sort
  * (see its proof note), so the expensive order pass is only paid
  * when true LENGTHS are wanted.
  */
object SuffixDedup {

  private def lcpOf(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    toColumn(graft.functions.LcpExpr(toExpression(a), toExpression(b)))
  }

  /** SEED-FILTERED suffix rows (doc, pos, prev char, `maxLcp`-char
    * prefix): only positions whose `minLen`-gram occurs ≥ 2 times
    * corpus-wide survive — the rest can never reach an ≥ minLen LCP
    * with anyone. This prunes the EXPENSIVE wide-prefix sort to the
    * duplicated fraction of the corpus (~10× here; far more on a
    * clean crawl). The filter is ONE window count over the 64-bit
    * gram hash (`xxhash64`): one 8-byte-keyed shuffle, no gram
    * re-explode, no semi join — measured 2.6× faster than the
    * agg + semi-join form at sf0.1, where 40-char string agg keys
    * dominated the seed cost (round-13 stage probe).
    *
    * OUTPUT-IDENTICAL to the unfiltered pipeline, not an
    * approximation — including under hash collisions: (keep) true
    * duplicates share the gram hence the hash, so every position of
    * an ≥ L pair survives, and anything BETWEEN such a pair in
    * suffix order shares their ≥ L prefix (interval property), so
    * its gram is duplicated too and survives — every qualifying
    * adjacent pair survives WITH its adjacency; (no extras) a
    * collision can only ADD survivors, and an added survivor can
    * never touch an EMITTED pair: any pair with LCP ≥ L shares a
    * true duplicated L-gram, making both members true survivors —
    * so collision extras only split non-emitted adjacencies, and a
    * pair newly adjacent because separators were dropped has
    * LCP < L, which the `lcp ≥ minLcp` emission filter removes.
    *
    * 1-based `pos` (the SQL slicing convention shared with the
    * oracles). */
  private def suffixRows(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int, maxLcp: Int): DataFrame = {
    val len = length(col(textCol))
    val base = docs.filter(len >= minLen)
      .select(col(idCol).as("__doc"), col(textCol).as("__t"))
    val survivors = base
      .select(col("__doc"), col("__t"),
        explode(sequence(lit(1), length(col("__t")) - (minLen - 1)))
          .as("__pos"))
      .select(col("__doc"), col("__pos").cast("long").as("__pos"),
        xxhash64(col("__t").substr(col("__pos"), lit(minLen))).as("__h"))
      .withColumn("__c", count(lit(1)).over(Window.partitionBy(col("__h"))))
      .filter(col("__c") >= 2)
      .select(col("__doc"), col("__pos"))
    // re-attach the text (doc-keyed join; Catalyst broadcasts a
    // catalog-sized doc table, AQE decides at scale) and build the
    // wide prefix ONLY for survivors. The char BEFORE the suffix (''
    // at doc start) rides along for left-maximality filtering
    // downstream; substr must be guarded — Spark treats start
    // position 0 as 1.
    val prev = when(col("__pos") === 1, lit(""))
      .otherwise(col("__t").substr(col("__pos") - 1, lit(1)))
    survivors.join(base, Seq("__doc"))
      .select(col("__doc"), col("__pos"), prev.as("__prev"),
        col("__t").substr(col("__pos"), lit(maxLcp)).as("__pref"))
      // the range partitioner downstream SAMPLES its input before the
      // shuffle-write pass: without a persist the whole seed-filter
      // pipeline (gram aggregate + semi join + doc join) runs twice
      // (measured ~2× of the suffix wall at sf0.1). SCOPED persist:
      // the caller materializes its (small) pair output eagerly and
      // then unpersists this frame before returning — see
      // pinPairsAndRelease — so no CacheManager entry outlives the
      // invocation (the round-12 code leaked one per call; the leak
      // incidentally memoized repeat invocations, so pre-r13 pinned
      // walls for q229/q230/q233 understate the honest per-call cost
      // — PERF.md round-13 re-pins them).
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** The scoped-persist release hook (VERDICT r12 item 6 / ADVICE):
    * eagerly materialize the emission-filtered pair set — ONE job in
    * which the range sampler and the shuffle both read the persisted
    * survivor frame — via localCheckpoint, whose blocks are
    * RDD-scoped (ContextCleaner-reclaimed, the CoocPowerEmbedder
    * discipline), then unpersist the survivor cache immediately.
    * Pairs are the duplicated-adjacency evidence only, orders of
    * magnitude smaller than the suffix rows. */
  private def pinPairsAndRelease(pairs: DataFrame, suff: DataFrame): DataFrame = {
    val pinned = pairs.localCheckpoint(true)
    suff.unpersist()
    pinned
  }

  /** THE FLOOD CONTRACT (verbatim-duplication regimes): the seed
    * filter prunes the wide sort to the corpus's DUPLICATED fraction
    * — so when everything is duplicated (k verbatim copies of every
    * doc, the crawl-mirror regime), it rightly keeps everything and
    * the sort pays full freight (measured 34× wall at 8× data in the
    * flood probe: wall tracks duplicated MASS, not corpus size). The
    * scale-safe composition is exact-duplicate collapse UPSTREAM (the
    * q140/q151 discipline the LSH family already applies):
    * `collapseExact = true` runs the suffix order over ONE
    * representative per distinct text (the smallest id, one
    * text-keyed aggregate — linear, shuffled on the text like exact
    * dedup). Output equals running the operator on the distinct
    * corpus: repeats BETWEEN verbatim copies (trivially the whole
    * doc) are structurally removed rather than priced, and every
    * reported (doc, pos) names the representative. Compose with
    * [[Dedup]]'s exact-duplicate report when the copy membership
    * itself is the deliverable. */
  private def collapseExactDocs(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col(textCol))

  /** Adjacent-suffix LCP pairs with LCP ≥ `minLcp`: the corpus's
    * repeated-substring evidence, one row per adjacent pair in the
    * (capped) suffix order. LCP values are exact up to `maxLcp` and
    * equal to the cap beyond it. Requires `maxLcp ≥ minLcp` (the
    * order must be exact at least to the emission threshold, or
    * adjacency could miss a qualifying pair). Output: (doc_a, pos_a,
    * doc_b, pos_b, prev_a, prev_b, lcp), where (doc_a, pos_a)
    * precedes (doc_b, pos_b) in suffix order and prev_* is the char
    * before each suffix ('' at doc start) — the left-maximality
    * evidence ([[longestRepeatedSubstrings]] filters on it; span
    * coverage must NOT, see [[repeatedCharSpans]]).
    * `collapseExact` applies the flood contract above. */
  def suffixNeighborLcp(docs: DataFrame, idCol: String, textCol: String,
      minLcp: Int, maxLcp: Int = 256,
      collapseExact: Boolean = false): DataFrame = {
    require(minLcp >= 2, "minLcp must be >= 2")
    require(maxLcp >= minLcp, "suffix-order depth maxLcp must be >= minLcp")
    val base0 = if (collapseExact) collapseExactDocs(docs, idCol, textCol)
      else docs
    val suff = suffixRows(base0, idCol, textCol, minLcp, maxLcp)
    // adjacency straight off the range sort — no ordinal attach, no
    // self-join re-shuffle (Layout.sortedNeighborPairs rationale)
    val pairs = Layout.sortedNeighborPairs(suff, Seq("__pref", "__doc", "__pos"))
      .select(col("a___doc").as("doc_a"), col("a___pos").as("pos_a"),
        col("b___doc").as("doc_b"), col("b___pos").as("pos_b"),
        col("a___prev").as("prev_a"), col("b___prev").as("prev_b"),
        lcpOf(col("a___pref"), col("b___pref")).as("lcp"))
      .filter(col("lcp") >= minLcp)
    pinPairsAndRelease(pairs, suff)
  }

  /** Top-k LONGEST repeated substrings corpus-wide, with the repeat
    * text attached — the suffix-array deliverable gram counting can
    * never produce (an n-gram index knows a repeat is ≥ n, not that
    * it is exactly 217 chars). Exact lengths up to `maxLcp`; longer
    * repeats report the cap. Ties (and everything else) break on
    * (doc_a, pos_a, doc_b, pos_b), so the board is deterministic.
    *
    * Only LEFT-MAXIMAL pairs are ranked (the preceding chars differ,
    * or a suffix starts its doc): a length-M repeat otherwise floods
    * the board with its M−minLcp one-char suffix shifts, each one
    * char shorter — the standard suffix-array maximal-repeat
    * refinement. Right-maximality is automatic: the LCP ends where
    * the neighbors first differ.
    *
    * Shape: the neighbor-pair scan, a TakeOrdered top-k (never a
    * global sort), and ONE broadcast join of the k winners back to
    * their source doc for the substring. Output: (rank, lcp, doc_a,
    * pos_a, doc_b, pos_b, repeat). `collapseExact` applies the flood
    * contract (see [[collapseExactDocs]]): identical to running on
    * the distinct corpus, whole-doc repeats between verbatim copies
    * removed structurally. */
  def longestRepeatedSubstrings(docs: DataFrame, idCol: String,
      textCol: String, minLcp: Int, maxLcp: Int = 256,
      k: Int = 20, collapseExact: Boolean = false): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val pairs = suffixNeighborLcp(docs, idCol, textCol, minLcp, maxLcp,
      collapseExact)
    val docsRep = if (collapseExact) collapseExactDocs(docs, idCol, textCol)
      else docs
    val top = pairs
      .filter(col("prev_a") =!= col("prev_b") ||
        col("prev_a") === "" || col("prev_b") === "")
      .orderBy(col("lcp").desc, col("doc_a"), col("pos_a"),
        col("doc_b"), col("pos_b"))
      .limit(k)
    // k rows from here on: the single-partition window is bounded by
    // construction (the Matcher.prepareReference discipline)
    val w = Window.orderBy(col("lcp").desc, col("doc_a"), col("pos_a"),
      col("doc_b"), col("pos_b"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .join(docsRep.select(col(idCol).as("doc_a"), col(textCol).as("__t")),
        Seq("doc_a"))
      .select(col("rank"), col("lcp"), col("doc_a"), col("pos_a"),
        col("doc_b"), col("pos_b"),
        col("__t").substr(col("pos_a"), col("lcp")).as("repeat"))
  }

  /** Maximal duplicated CHAR spans per document: every character
    * covered by some ≥ `minLen` repeated substring, coalesced into
    * maximal runs — the char-level duplicate-span report beside
    * q122's token-gram one. Coverage is EXACT regardless of the LCP
    * cap: a repeat of length M marks starts p, p+1, …, p+M−minLen,
    * each covering [p_i, p_i+min(M−i, cap)), and the union of that
    * chain is [p, p+M) for any cap ≥ minLen. Uses ALL neighbor pairs
    * — the suffix-shift pairs [[longestRepeatedSubstrings]] filters
    * out are exactly the chain links coverage needs past the cap.
    * Output: (doc, span_start, span_end, span_len), 1-based
    * inclusive. */
  def repeatedCharSpans(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int, maxLcp: Int = 128): DataFrame = {
    val pairs = suffixNeighborLcp(docs, idCol, textCol, minLen, maxLcp)
    val marks = pairs.select(col("doc_a").as("__doc"),
        col("pos_a").as("__pos"), col("lcp"))
      .unionAll(pairs.select(col("doc_b").as("__doc"),
        col("pos_b").as("__pos"), col("lcp")))
      // a position can be marked by both its neighbors: keep the
      // longest mark so island order is strict in __pos (duplicate
      // keys would make the rowsBetween frame order-dependent)
      .groupBy(col("__doc"), col("__pos"))
      .agg(max(col("lcp")).as("__lcp"))
      .select(col("__doc"), col("__pos"),
        (col("__pos") + col("__lcp") - 1).as("__end"))
    islandSpans(marks)
      .select(col("__doc").as(idCol), col("__s").as("span_start"),
        col("__e").as("span_end"),
        (col("__e") - col("__s") + 1).as("span_len"))
  }

  /** Gaps-and-islands coalescing of (doc, pos, end) marks into
    * maximal spans — the [[TextAnalysis.duplicateSpans]] idiom,
    * factored out. Input must be strict in (__doc, __pos). Output:
    * (__doc, __s, __e) per maximal span. */
  private def islandSpans(marks: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("__doc")).orderBy(col("__pos"))
    marks
      .withColumn("__pmax",
        max(col("__end")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pmax").isNull || col("__pos") > col("__pmax") + 1, 1L)
          .otherwise(0L))
      .withColumn("__island",
        sum(col("__new")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("__doc"), col("__island"))
      .agg(min(col("__pos")).as("__s"), max(col("__end")).as("__e"))
  }

  /** Per-doc SELF-LRS: the length (and occurrence positions) of each
    * document's longest INTERNALLY-repeated substring ≥ `minLen` —
    * the arbitrary-length upgrade of fixed-gram repetition fractions
    * (the Gopher/RefinedWeb repetition rules measure duplicate
    * line/n-gram MASS; this measures the worst single template run,
    * the spam/boilerplate-loop signature). Exact up to `maxLcp`:
    * a self-repeat LONGER than the cap reports `lrs_len = maxLcp`
    * with no flag, so `lrs_len` is a LOWER BOUND at the cap value
    * and `lrs_frac_micros` is a lower bound on the true fraction —
    * a quality GATE thresholding at some len < cap is unaffected,
    * but a report consuming the raw lengths must treat rows at
    * exactly the cap as "≥ cap".
    *
    * Same machinery as the corpus pass with `doc` as the LEADING
    * sort key: each doc's suffixes form one contiguous run, so
    * within-run adjacency IS that doc's own suffix order and the
    * per-doc maximal LCP reads off adjacent pairs (cross-doc
    * boundary pairs are discarded — their prefix comparison is
    * meaningless under the doc-first order). The seed filter
    * becomes per-(doc, gram): only positions whose gram repeats
    * WITHIN their doc survive — output-identical by the per-doc
    * restriction of the same interval argument.
    *
    * Output: (doc, n_chars, lrs_len, pos_a, pos_b,
    * lrs_frac_micros) for EVERY doc — repeat-free docs report
    * (0, NULL, NULL, 0). pos_a precedes pos_b in SUFFIX order (not
    * numerically); max-lcp ties break to the smallest
    * (pos_a, pos_b) pair. */
  def selfLongestRepeat(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int, maxLcp: Int = 128): DataFrame = {
    require(minLen >= 2, "minLen must be >= 2")
    require(maxLcp >= minLen, "maxLcp must be >= minLen")
    val len = length(col(textCol))
    val base = docs.filter(len >= minLen)
      .select(col(idCol).as("__doc"), col(textCol).as("__t"))
    // per-(doc, gram-hash) window count — the same one-shuffle seed
    // filter as suffixRows, restricted per doc; output identity under
    // collisions by the per-doc restriction of the same argument
    val survivors = base
      .select(col("__doc"), col("__t"),
        explode(sequence(lit(1), length(col("__t")) - (minLen - 1)))
          .as("__pos"))
      .select(col("__doc"), col("__pos").cast("long").as("__pos"),
        xxhash64(col("__t").substr(col("__pos"), lit(minLen))).as("__h"))
      .withColumn("__c",
        count(lit(1)).over(Window.partitionBy(col("__doc"), col("__h"))))
      .filter(col("__c") >= 2)
      .select(col("__doc"), col("__pos"))
    val suff = survivors.join(base, Seq("__doc"))
      .select(col("__doc"), col("__pos"),
        col("__t").substr(col("__pos"), lit(maxLcp)).as("__pref"))
      // scoped persist, released by pinPairsAndRelease below — same
      // rationale as suffixRows (sampler re-run otherwise; no
      // CacheManager entry outlives the call)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = pinPairsAndRelease(Layout
      .sortedNeighborPairs(suff, Seq("__doc", "__pref", "__pos"))
      .filter(col("a___doc") === col("b___doc"))
      .select(col("a___doc").as("__doc"), col("a___pos").as("pos_a"),
        col("b___pos").as("pos_b"),
        lcpOf(col("a___pref"), col("b___pref")).as("lcp"))
      .filter(col("lcp") >= minLen), suff)
    val best = pairs.groupBy(col("__doc")).agg(max(col("lcp")).as("lrs_len"))
      .withColumnRenamed("__doc", "__bd")
    val winners = pairs
      .join(best, col("__doc") === col("__bd") &&
        col("lcp") === col("lrs_len"))
      .groupBy(col("__doc"), col("lrs_len"))
      .agg(min(struct(col("pos_a"), col("pos_b"))).as("__w"))
      .select(col("__doc"), col("lrs_len"),
        col("__w.pos_a").as("pos_a"), col("__w.pos_b").as("pos_b"))
    docs
      .select(col(idCol).as("__doc"),
        length(col(textCol)).cast("long").as("n_chars"))
      .join(winners, Seq("__doc"), "left")
      .select(col("__doc").as(idCol), col("n_chars"),
        coalesce(col("lrs_len"), lit(0L)).as("lrs_len"),
        col("pos_a"), col("pos_b"),
        when(col("n_chars") > 0,
          expr("coalesce(lrs_len, 0) * 1000000 div n_chars"))
          .otherwise(lit(0L)).as("lrs_frac_micros"))
  }

  /** SUBSTRING-LEVEL DECONTAMINATION report: per train doc, the
    * characters covered by any ≥ `minLen` substring that ALSO
    * appears anywhere in the eval corpus — the ExactSubstr
    * counterpart of the n-gram membership gates (q58/q103's exact
    * and Bloom token tests, q145's embedding cosine): those ask "do
    * train and eval share a fixed-size feature", this measures the
    * VERBATIM overlap mass itself, the published eval-leakage
    * criterion (Lee et al. 2021 decontaminate exactly this way).
    *
    * Same coverage reduction as [[scrubRepeatedSubstrings]]: a train
    * char sits inside an ≥ L shared substring iff a duplicated
    * L-gram window covers it where "duplicated" here means "present
    * in eval" — so the whole report is ONE gram-keyed left-semi join
    * against the distinct eval gram set, a per-doc island window,
    * and a doc-keyed left join back; no suffix sort, nothing
    * quadratic, eval never broadcast by assumption (the join is
    * gram-keyed, so a 100× eval set just shards).
    *
    * Output: (doc, n_chars, n_spans, contam_chars,
    * contam_frac_micros) for EVERY train doc — clean and short docs
    * report zeros. */
  def substringContamination(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, minLen: Int): DataFrame = {
    require(minLen >= 2, "minLen must be >= 2")
    def grams(df: DataFrame): DataFrame = {
      val len = length(col(textCol))
      df.filter(len >= minLen)
        .select(col(idCol).as("__doc"), col(textCol).as("__t"),
          explode(sequence(lit(1), len - (minLen - 1))).as("__pos"))
        .select(col("__doc"), col("__pos").cast("long").as("__pos"),
          col("__t").substr(col("__pos"), lit(minLen)).as("__g"))
    }
    val evalGrams = grams(eval).select(col("__g")).distinct()
    val marks = grams(train).join(evalGrams, Seq("__g"), "left_semi")
      .select(col("__doc"), col("__pos"),
        (col("__pos") + lit(minLen.toLong) - 1).as("__end"))
    val perDoc = islandSpans(marks)
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("__e") - col("__s") + 1).as("contam_chars"))
    train
      .select(col(idCol).as("__doc"),
        length(col(textCol)).cast("long").as("n_chars"))
      .join(perDoc, Seq("__doc"), "left")
      .select(col("__doc").as(idCol), col("n_chars"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("contam_chars"), lit(0L)).as("contam_chars"),
        when(col("n_chars") > 0,
          expr("coalesce(contam_chars, 0) * 1000000 div n_chars"))
          .otherwise(lit(0L)).as("contam_frac_micros"))
  }

  /** SCRUB non-first occurrences of every ≥ `minLen` repeated
    * substring and reassemble the corpus — the ExactSubstr cleaning
    * pass with a DETERMINISTIC keep-first contract: for each
    * duplicated `minLen`-gram, the occurrence with the smallest
    * (doc, pos) is canonical; every character covered by a
    * NON-canonical duplicated gram start is cut. A repeat's first
    * occurrence therefore survives verbatim; later occurrences (in
    * other docs, or later in the same doc) lose the full maximal
    * span.
    *
    * NO SUFFIX SORT HERE — and none is needed: a character is inside
    * some ≥ L repeat iff it is covered by a duplicated L-gram start
    * (⊆: a length-M ≥ L repeat's starts p…p+M−L are all duplicated
    * L-grams, and their L-windows tile [p, p+M); ⊇: a duplicated
    * L-gram IS a repeat). So coverage — the thing scrubbing needs —
    * reduces to ONE gram-keyed count aggregate (map-side combined),
    * one gram-keyed join back, a per-doc island window, and a per-doc
    * reassembly join: every shuffle is keyed on gram or doc, nothing
    * quadratic, no cap, no order pass. Reserve the suffix-ordinal
    * machinery for when true lengths are the deliverable
    * ([[longestRepeatedSubstrings]]).
    *
    * Output: (doc, n_chars, n_spans_cut, n_cut, clean_text); docs
    * with nothing to cut (including docs shorter than minLen) pass
    * through with clean_text = original. */
  def scrubRepeatedSubstrings(docs: DataFrame, idCol: String,
      textCol: String, minLen: Int): DataFrame = {
    require(minLen >= 2, "minLen must be >= 2")
    val len = length(col(textCol))
    val grams = docs
      .filter(len >= minLen)
      .select(col(idCol).as("__doc"), col(textCol).as("__t"),
        explode(sequence(lit(1), len - (minLen - 1))).as("__pos"))
      .select(col("__doc"), col("__pos").cast("long").as("__pos"),
        col("__t").substr(col("__pos"), lit(minLen)).as("__g"))
    val dup = grams.groupBy(col("__g"))
      .agg(count(lit(1)).as("__c"),
        min(struct(col("__doc").as("d"), col("__pos").as("p"))).as("__canon"))
      .filter(col("__c") >= 2)
      .select(col("__g"), col("__canon"))
    val marks = grams.join(dup, Seq("__g"))
      .filter(!(col("__doc") === col("__canon.d") &&
        col("__pos") === col("__canon.p")))
      .select(col("__doc"), col("__pos"),
        (col("__pos") + lit(minLen.toLong) - 1).as("__end"))
    val spans = islandSpans(marks)
    // reassembly: per span, the kept piece BETWEEN the previous span
    // and this one; the tail after the last span rides the final agg.
    // Spans are disjoint and non-adjacent after coalescing, so lag(e)
    // is the correct previous boundary.
    val withText = spans
      .join(docs.select(col(idCol).as("__doc"), col(textCol).as("__t")),
        Seq("__doc"))
    val wd = Window.partitionBy(col("__doc")).orderBy(col("__s"))
    val pieces = withText
      .withColumn("__gapStart",
        coalesce(lag(col("__e"), 1).over(wd) + 1, lit(1L)))
      .withColumn("__piece",
        col("__t").substr(col("__gapStart"), col("__s") - col("__gapStart")))
    val perDoc = pieces.groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_spans_cut"),
        sum(col("__e") - col("__s") + 1).as("n_cut"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("__s"), col("__piece")))),
          x => x("__piece"))).as("__head"),
        max(col("__e")).as("__maxE"))
    docs
      .select(col(idCol).as("__doc"), col(textCol).as("__t"),
        length(col(textCol)).cast("long").as("n_chars"))
      .join(perDoc, Seq("__doc"), "left")
      .select(col("__doc").as(idCol), col("n_chars"),
        coalesce(col("n_spans_cut"), lit(0L)).as("n_spans_cut"),
        coalesce(col("n_cut"), lit(0L)).as("n_cut"),
        when(col("__maxE").isNull, col("__t"))
          .otherwise(concat(col("__head"),
            col("__t").substr(col("__maxE") + 1,
              col("n_chars") - col("__maxE")))).as("clean_text"))
  }
}
