package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale document deduplication — the training-data-pipeline
  * generalisation of the reference's `drop_duplicates`
  * (`asctb_data_wrangling.py:109`) to 100 TB corpora.
  *
  * All hashing is md5-based (built into both Spark and every SQL
  * oracle engine) so every operator here is deterministic across
  * engines and cluster sizes — no JVM `hashCode`, no seed drift.
  *
  * Scale design notes:
  *  - exact dedup: one hash-aggregate (map-side partial combine; the
  *    shuffle carries one row per distinct digest, not per document).
  *  - MinHash/LSH: signatures are computed per-document with a single
  *    explode + groupBy (shuffle keyed on doc_id); candidate
  *    generation shuffles on (band, bucket) — only documents sharing
  *    a bucket ever meet, so pair count stays near-linear instead of
  *    quadratic.
  *  - SimHash: one pass to 64-bit fingerprints, then banded buckets
  *    like LSH.
  */
object Dedup {

  /** Exact dedup by content digest: one row per distinct text, the
    * lowest id wins, with the duplicate count. */
  def exactDuplicates(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("text_md5", md5(col(textCol)))
      .groupBy("text_md5")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles of a text column: split on whitespace, then
    * sliding windows of `n` words joined by single spaces. One native
    * expression ([[graft.functions.WordShinglesExpr]]) — the HOF
    * chain (`transform`+`slice`+`array_join`) paid an interpreted
    * lambda per shingle and dominated the minhash pipelines. */
  def shingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    toColumn(graft.functions.WordShinglesExpr(
      toExpression(split(text, "\\s+")), n))
  }

  /** MinHash signature via Kirsch-Mitzenmacher double hashing: ONE
    * md5 per shingle yields two 56-bit halves (h1, h2); family `i` is
    * `h1 + i·h2` (no overflow: max ≈ 2^59). 8× fewer digest
    * computations than hashing per family, and the min-aggregates run
    * on longs instead of hex strings. Computed as `numHashes`
    * min-aggregates in ONE pass over the exploded shingles (map-side
    * combine means the shuffle carries one signature row per
    * document). Output: (idCol, sig_0..sig_{h-1}: long).
    */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
                        shingleSize: Int = 3, numHashes: Int = 8,
                        independentHashes: Boolean = false): DataFrame = {
    val exploded = docs
      .select(col(idCol), explode(shingles(col(textCol), shingleSize)).as("shingle"))
    if (independentHashes) {
      // genuinely independent families — the Kirsch-Mitzenmacher
      // derivation below makes ALL families affine in one digest's
      // (h1, h2), so one shingle with jointly-small halves owns EVERY
      // family's min and near-dup signatures move together (the
      // correlated recall loss q139's audit measured: the same two
      // pairs missed at 8x2 AND 16x2 banding). One salted digest
      // yields TWO families (its 56-bit halves — distinct md5 bits,
      // not affine transforms of each other), so the preset costs
      // ⌈h/2⌉ digests per shingle, and a jointly-small digest can
      // touch at most 2 families instead of all of them. Use when
      // measured recall matters more than signature cost.
      val withDigests = (0 until (numHashes + 1) / 2).foldLeft(exploded) {
        case (df, d) => df.withColumn(s"__id$d",
          md5(concat(lit(s"mh$d:"), col("shingle"))))
      }
      val aggs = (0 until numHashes).map { h =>
        val half =
          if (h % 2 == 0) substring(col(s"__id${h / 2}"), 1, 14)
          else substring(col(s"__id${h / 2}"), 15, 14)
        min(conv(half, 16, 10).cast("long")).as(s"sig_$h")
      }
      withDigests.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    } else {
      val keyed = exploded
        .withColumn("__d", md5(col("shingle")))
        .withColumn("__h1", conv(substring(col("__d"), 1, 14), 16, 10).cast("long"))
        .withColumn("__h2", conv(substring(col("__d"), 15, 14), 16, 10).cast("long"))
      val aggs = (0 until numHashes).map { h =>
        min(col("__h1") + lit(h.toLong) * col("__h2")).as(s"sig_$h")
      }
      keyed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    }
  }

  /** LSH banding over MinHash signatures: `numHashes / rowsPerBand`
    * bands; documents agreeing on ALL rows of any band become a
    * candidate pair. Returns distinct candidate pairs (id_a < id_b).
    *
    * The band/bucket explode keys the shuffle on the band hash, so
    * only same-bucket documents are ever paired — the crucial
    * difference from a quadratic self-join at 100 TB. Dedup across
    * bands uses first-match emission (a pair is produced only by the
    * FIRST band on which the two documents agree, enforced with a
    * cheap per-pair predicate over the carried bucket array) instead
    * of a `distinct` — at scale that removes an extra shuffle whose
    * input is every duplicate candidate occurrence.
    */
  def minhashCandidatePairs(signatures: DataFrame, idCol: String,
                            numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame =
    Banding.firstMatchPairs(
      bandedSignatures(signatures, idCol, numHashes, rowsPerBand),
      idCol, numHashes / rowsPerBand)

  /** One row per doc with its per-band bucket array (md5 of the band's
    * signature slots). */
  private def bandedSignatures(signatures: DataFrame, idCol: String,
                               numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val numBands = numHashes / rowsPerBand
    val bucketCols = (0 until numBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}"))
      md5(concat_ws("|", parts: _*))
    }
    signatures.select(col(idCol), array(bucketCols: _*).as("bks"))
  }

  /** Long-form (id, band, bucket) LSH keys of a signature frame —
    * the INDEX shape of the incremental near-dup gate: written once
    * for the existing corpus, probed by every arriving doc. */
  def bandBuckets(signatures: DataFrame, idCol: String,
                  numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val numBands = numHashes / rowsPerBand
    val cols = (0 until numBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", parts: _*)).as("bucket"))
    }
    signatures.select(col(idCol), explode(array(cols: _*)).as("__bb"))
      .select(col(idCol), col("__bb.band").as("band"),
        col("__bb.bucket").as("bucket"))
  }

  /** INCREMENTAL near-dup ADMISSION — dedup an arriving crawl against
    * a FROZEN corpus index (the production delta-dedup problem: the
    * existing corpus is indexed once; new docs must not re-run
    * within-corpus dedup). For every new doc: LSH band buckets probe
    * the index, every collided partner's full-signature agreement is
    * counted, and the doc is admitted iff its BEST partner agrees on
    * fewer than `rejectAgree` of `numHashes` slots (no collision ⇒
    * admitted). Output per new doc: distinct partner count, best
    * match id (−1 when none), best agreement, the admit flag.
    *
    * Scale shape: the probe is one (band, bucket)-keyed join — new
    * docs meet only same-bucket index rows, never the corpus; the
    * agreement join reads numHashes longs for the COLLIDED pairs
    * only. Skew: a degenerate index bucket should be pre-capped when
    * the index is written (the [[minhashCandidatePairsCapped]] cap —
    * boilerplate buckets reject everything anyway). */
  def neardupAdmission(indexSigs: DataFrame, newSigs: DataFrame,
      idCol: String, numHashes: Int = 8, rowsPerBand: Int = 2,
      rejectAgree: Int = 6): DataFrame = {
    require(rejectAgree >= 1 && rejectAgree <= numHashes,
      "need 1 <= rejectAgree <= numHashes")
    val ibb = bandBuckets(indexSigs, idCol, numHashes, rowsPerBand)
      .toDF("__i_id", "band", "bucket")
    val nbb = bandBuckets(newSigs, idCol, numHashes, rowsPerBand)
      .toDF("__n_id", "band", "bucket")
    val hits = nbb.join(ibb, Seq("band", "bucket"))
      .select(col("__n_id"), col("__i_id")).distinct()
    val ns = newSigs.toDF(
      "__n_id" +: (0 until numHashes).map(h => s"__ns_$h"): _*)
    val is = indexSigs.toDF(
      "__i_id" +: (0 until numHashes).map(h => s"__is_$h"): _*)
    val agree = (0 until numHashes).map(h =>
        when(col(s"__ns_$h") === col(s"__is_$h"), 1L).otherwise(0L))
      .reduce(_ + _)
    val scored = hits.join(ns, Seq("__n_id")).join(is, Seq("__i_id"))
      .select(col("__n_id"), col("__i_id"), agree.as("__agree"))
    val best = scored.groupBy(col("__n_id"))
      .agg(count(lit(1)).as("n_partners"),
        max(struct(col("__agree").as("a"),
          (-col("__i_id")).as("ni"))).as("__b"))
      .select(col("__n_id"), col("n_partners"),
        (-col("__b.ni")).as("best_match_id"),
        col("__b.a").as("best_agree"))
    newSigs.select(col(idCol))
      .join(best.withColumnRenamed("__n_id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_partners"), lit(0L)).as("n_partners"),
        coalesce(col("best_match_id"), lit(-1L)).as("best_match_id"),
        coalesce(col("best_agree"), lit(0L)).as("best_agree"),
        (coalesce(col("best_agree"), lit(0L)) < rejectAgree)
          .as("admitted"))
  }

  /** [[minhashCandidatePairs]] with a HOT-BUCKET CAP — the skew guard
    * the uncapped form needs at 100 TB. A degenerate bucket (web
    * boilerplate, empty documents, any text shared by millions of
    * pages — all land on ONE (band, bucket) key) makes the bucket
    * self-join quadratic inside a single shuffle partition: |bucket|²
    * pairs that no AQE skew split can parallelise away, because the
    * blowup is the OUTPUT, not the partition layout. Industrial dedup
    * pipelines cap the bucket: members of a bucket larger than
    * `maxBucketSize` emit no pairwise candidates from that band (they
    * are near-certainly mutual duplicates of one boilerplate cluster —
    * route them through [[exactSignatureDuplicates]], which groups the
    * identical-signature mass in ONE linear aggregate instead of
    * |bucket|² pairs).
    *
    * A pair survives iff SOME band puts both docs in a small-enough
    * bucket, and is emitted exactly once (first such band) — the
    * first-match predicate additionally treats a hot earlier band as
    * non-emitting via the carried per-band size array. Cost vs the
    * uncapped form: one (band, bucket) count aggregate (same shuffle
    * key as the join — co-partitioned), its size join back, and one
    * per-doc re-aggregation keyed like the upstream signature groupBy;
    * all keyed, none quadratic, no driver-side state (the hot set is
    * never collected). */
  def minhashCandidatePairsCapped(signatures: DataFrame, idCol: String,
                                  numHashes: Int = 8, rowsPerBand: Int = 2,
                                  maxBucketSize: Int = 1000): DataFrame =
    Banding.firstMatchPairs(
      bandedSignatures(signatures, idCol, numHashes, rowsPerBand),
      idCol, numHashes / rowsPerBand, Some(maxBucketSize))

  /** The linear-cost companion of the hot-bucket cap: group documents
    * whose FULL MinHash signature is identical (the dominant hot-bucket
    * cause — exact or trivially-rehashed boilerplate copies) in one
    * map-side-combined aggregate. One row per duplicate cluster, the
    * lowest id as keeper — |cluster| rows shuffled, never |cluster|²
    * pairs. */
  def exactSignatureDuplicates(signatures: DataFrame, idCol: String,
                               numHashes: Int = 8): DataFrame = {
    val sigCols = (0 until numHashes).map(h => col(s"sig_$h"))
    signatures
      .groupBy(sigCols: _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .select(col("keep_id"), col("n_docs"),
        md5(concat_ws("|", sigCols: _*)).as("sig_md5"))
  }

  /** Full MinHash near-dup pipeline: signatures → banded candidates →
    * exact word-set Jaccard verification ≥ threshold. `maxBucketSize`
    * enables the hot-bucket skew guard
    * ([[minhashCandidatePairsCapped]]); None keeps the exhaustive
    * uncapped join. */
  def minhashNearDuplicates(docs: DataFrame, textCol: String, idCol: String,
                            shingleSize: Int = 3, numHashes: Int = 8,
                            rowsPerBand: Int = 2, jaccardThreshold: Double = 0.5,
                            maxBucketSize: Option[Int] = None,
                            independentHashes: Boolean = false,
                            collapseExact: Boolean = false): DataFrame = {
    if (collapseExact) {
      // one representative (lowest id) per distinct text BEFORE
      // signing — the banded twin of prefixJaccardPairs' flag: a
      // c-copy cluster can neither flood a band bucket past the cap
      // (losing its DISTINCT-text neighbours with it) nor emit c²
      // identical pairs. Same contract as q140: the exact-dup tier
      // owns replica mass, banding sees only distinct texts.
      val reps = docs.groupBy(col(textCol))
        .agg(min(col(idCol)).as(idCol))
        .select(col(idCol), col(textCol))
      return minhashNearDuplicates(reps, textCol, idCol, shingleSize,
        numHashes, rowsPerBand, jaccardThreshold, maxBucketSize,
        independentHashes, collapseExact = false)
    }
    val sigs = minhashSignatures(docs, textCol, idCol, shingleSize, numHashes,
      independentHashes)
    val cands = maxBucketSize match {
      case Some(cap) => minhashCandidatePairsCapped(sigs, idCol, numHashes, rowsPerBand, cap)
      case None      => minhashCandidatePairs(sigs, idCol, numHashes, rowsPerBand)
    }
    val withJ = jaccardOnPairs(cands, docs, textCol, idCol, shingleSize)
    withJ.filter(col("jaccard") >= jaccardThreshold)
  }

  /** Exact shingle-set Jaccard for given candidate pairs. Each pair
    * fetches its two (distinct) shingle arrays by key join and pays
    * one in-place hash-probe intersection count
    * ([[graft.functions.ArrayIntersectCountExpr]]) — the first cut
    * exploded shingles and equality-joined them back per pair, whose
    * intermediate is |pairs|·|shingles/doc| rows plus a re-aggregation
    * shuffle (~16 s of the 19.6 s minhash pipeline at 8× sf0.1; the
    * value computed is identical and the DuckDB oracle keeps the
    * explode-join SQL form). */
  def jaccardOnPairs(pairs: DataFrame, docs: DataFrame, textCol: String,
                     idCol: String, shingleSize: Int = 3): DataFrame = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    def intersectCount(a: Column, b: Column): Column =
      toColumn(graft.functions.ArrayIntersectCountExpr(toExpression(a), toExpression(b)))
    val docShingles = docs.select(
      col(idCol),
      array_distinct(shingles(col(textCol), shingleSize)).as("sh"))
    pairs
      .join(docShingles.select(col(idCol).as("id_a"), col("sh").as("__sh_a")), Seq("id_a"))
      .join(docShingles.select(col(idCol).as("id_b"), col("sh").as("__sh_b")), Seq("id_b"))
      .withColumn("n_inter", intersectCount(col("__sh_a"), col("__sh_b")))
      .withColumn("n_a", size(col("__sh_a")))
      .withColumn("n_b", size(col("__sh_b")))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
  }

  /** ASYMMETRIC shingle-set overlap on candidate pairs: containment
    * |A∩B|/|A| and |A∩B|/|B| beside the symmetric Jaccard. The
    * decontamination/near-inclusion measure Jaccard misses: a short
    * document wholly quoted inside a long one has containment ≈ 1 on
    * the short side but Jaccard ≈ |B|/|A| — near zero for a long
    * host. Same plan shape as [[jaccardOnPairs]] (two id-keyed hash
    * joins, per-pair sorted-merge intersection count, no shingle
    * explode); the ratios are derived from the same three integers,
    * so the added columns are free. */
  def containmentOnPairs(pairs: DataFrame, docs: DataFrame, textCol: String,
                         idCol: String, shingleSize: Int = 3): DataFrame =
    jaccardOnPairs(pairs, docs, textCol, idCol, shingleSize)
      .withColumn("containment_a", col("n_inter").cast("double") / col("n_a"))
      .withColumn("containment_b", col("n_inter").cast("double") / col("n_b"))

  /** EXACT similarity self-join by prefix filtering (the
    * AllPairs/PPJoin family) — the exact-result complement to the
    * MinHash tier: every pair with shingle-set Jaccard >= tau is
    * found, no LSH false negatives, no signature tuning. The filter
    * is the classic prefix theorem: order each document's shingles by
    * GLOBAL RARITY (df asc, shingle asc — encoded as one sortable
    * `lpad(df):shingle` key), and two sets with J >= tau MUST share a
    * token within their first `L - ceil(tau·L) + 1` keys. Rare-first
    * ordering is what makes the join selective: a df=1 shingle can
    * never produce a candidate, and hot shingles sort to the suffix
    * where they are never join keys.
    *
    * Scale shape, in Spark terms: one token-keyed shuffle to attach
    * df, one doc-keyed aggregate to build the sorted key arrays, and
    * a candidate hash join ON PREFIX KEY whose output is emitted
    * exactly once per pair with NO distinct shuffle — each candidate
    * row carries both prefix arrays (bounded at ~(1-tau)·L keys), and
    * a pair survives only from its MINIMUM shared prefix key, the
    * same first-match discipline as the banded-LSH tier. Verification
    * joins the full key arrays back by id (two hash joins) and counts
    * the intersection in place ([[graft.functions
    * .ArrayIntersectCountExpr]]). Length pre-filter `tau·|A| <= |B|
    * <= |A|/tau` runs as integer rationals inside the join predicate.
    *
    * The known skew hole is the same one the LSH cap guards: a
    * cluster of c IDENTICAL documents emits c² candidates here (their
    * rare prefixes coincide). Exactness forbids a cap, so compose
    * with [[exactDuplicates]]/[[dedupAgainstCorpus]] upstream — at
    * 100 TB exact-dup collapse precedes similarity search anyway.
    * `collapseExact = true` AUTO-COMPOSES that contract: documents
    * are collapsed to one representative per distinct text (lowest
    * id, the [[exactDuplicates]] keep rule) before the join, and the
    * emitted pairs are between representatives — identical-document
    * clusters are represented by their cluster (recover members via
    * [[exactDuplicates]]), never enumerated pairwise, so a planted
    * 50-copy cluster contributes ZERO quadratic output instead of
    * 1225 jaccard-1.0 rows (DedupSpec pins this). Cross-cluster
    * scores are unchanged: identical texts have identical shingle
    * sets, so the representative's jaccard IS every member's.
    *
    * `tau = tauNum/tauDen` as integer rationals — no float-threshold
    * drift (membership predicates stay engine-exact). Output:
    * (id_a, id_b, n_inter, n_a, n_b, jaccard), id_a < id_b. */
  def prefixJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, tauNum: Int = 4, tauDen: Int = 5,
      collapseExact: Boolean = false): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      "tau = tauNum/tauDen must be in (0, 1]")
    if (collapseExact) {
      // one representative (lowest id) per distinct text, then the
      // exact join over representatives only — the identical-doc
      // quadratic is structurally impossible. Grouped on the TEXT
      // itself (not a digest): exact semantics, matches the q140
      // oracle's GROUP BY text, and one aggregation instead of a
      // hash-group + join-back.
      val reps = docs
        .groupBy(col(textCol))
        .agg(min(col(idCol)).as(idCol))
        .select(col(idCol), col(textCol))
      return prefixJaccardPairs(reps, textCol, idCol,
        shingleSize, tauNum, tauDen, collapseExact = false)
    }
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    def intersectCount(a: Column, b: Column): Column =
      toColumn(graft.functions.ArrayIntersectCountExpr(toExpression(a), toExpression(b)))
    val toks = docs.select(col(idCol).as("__id"),
      explode(array_distinct(shingles(col(textCol), shingleSize)))
        .as("__tok"))
    val df = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    val keyed = toks.join(df, Seq("__tok"))
      .select(col("__id"),
        concat(lpad(col("__df").cast("string"), 10, "0"), lit(":"),
          col("__tok")).as("__k"))
    val sets = keyed.groupBy(col("__id"))
      .agg(sort_array(collect_list(col("__k"))).as("__ks"),
        count(lit(1)).as("__l"))
    // prefix length = L - ceil(tau*L) + 1, integer-exact
    val pref = sets.withColumn("__p",
      expr(s"slice(__ks, 1, CAST(__l - ((__l * $tauNum + ${tauDen - 1}) " +
        s"div $tauDen) + 1 AS INT))"))
    val pe = pref.select(col("__id"), col("__l"), col("__p"),
      explode(col("__p")).as("__pk"))
    val a = pe.select(col("__id").as("id_a"), col("__l").as("__la"),
      col("__p").as("__pa"), col("__pk"))
    val b = pe.select(col("__id").as("id_b"), col("__l").as("__lb"),
      col("__p").as("__pb"), col("__pk"))
    val cands = a.join(b, Seq("__pk"))
      .filter(col("id_a") < col("id_b")
        && col("__la") * tauNum <= col("__lb") * tauDen
        && col("__lb") * tauNum <= col("__la") * tauDen)
      // first-match emission: only the lowest shared prefix key speaks
      .filter(col("__pk") ===
        array_min(array_intersect(col("__pa"), col("__pb"))))
      .select("id_a", "id_b")
    val withSets = cands
      .join(sets.select(col("__id").as("id_a"), col("__ks").as("__ka")),
        Seq("id_a"))
      .join(sets.select(col("__id").as("id_b"), col("__ks").as("__kb")),
        Seq("id_b"))
      .withColumn("n_inter",
        intersectCount(col("__ka"), col("__kb")).cast("long"))
      .withColumn("n_a", size(col("__ka")).cast("long"))
      .withColumn("n_b", size(col("__kb")).cast("long"))
    withSets
      .filter(col("n_inter") * tauDen
        >= (col("n_a") + col("n_b") - col("n_inter")) * tauNum)
      .withColumn("jaccard", col("n_inter").cast("double")
        / (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
  }

  /** 60-bit SimHash fingerprint per document: each distinct word
    * votes ±1 on each bit of its md5-derived 60-bit hash (first 15
    * hex chars — cross-engine-reproducible); the sign of each
    * bit-sum forms the fingerprint. Computed as a pure projection by
    * [[graft.functions.SimhashExpr]] — the relational form (explode +
    * 60-buffer vote aggregate over every exploded word row) pays a
    * shuffle and 60 conditional sums per word for the identical
    * value. Near-dups are pairs within `maxHamming` bits. */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    docs.select(
      col(idCol),
      toColumn(graft.functions.SimhashExpr(
        toExpression(array_distinct(split(col(textCol), "\\s+"))))).as("simhash"))
  }

  /** Hamming distance between two simhash fingerprints. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: bucket by the high `prefixBits` bits
    * (cheap blocking — identical prefix is necessary for tiny Hamming
    * distance only probabilistically, so we re-check all rotations by
    * also bucketing on low bits), then filter by Hamming distance. */
  def simhashNearDuplicates(docs: DataFrame, textCol: String, idCol: String,
                            maxHamming: Int = 8,
                            maxBucketSize: Option[Int] = None): DataFrame = {
    val fps = simhash(docs, textCol, idCol)
    // block on 4 band-slices of 15 bits each: a pair within maxHamming
    // of 60 bits must agree exactly on at least one slice when
    // maxHamming < 4 slices (pigeonhole); for larger budgets this is a
    // high-recall heuristic blocker.
    def sliceKey(fp: Column, s: Int): Column =
      shiftright(fp, s * 15).bitwiseAND(0x7fff)
    // capped form: route through the shared Banding kernel (slice keys
    // as the per-band bucket array) and join fingerprints back for the
    // Hamming verify — an identical-fingerprint mass (empty/boilerplate
    // docs collapse to ONE fingerprint) otherwise pairs quadratically
    // inside its slice buckets. The default path keeps the carried-
    // fingerprint join below (no join-back).
    if (maxBucketSize.isDefined) {
      val pairs = Banding.firstMatchPairs(
        fps.select(col(idCol),
          array((0 until 4).map(s => sliceKey(col("simhash"), s)): _*).as("bks")),
        idCol, 4, maxBucketSize)
      return pairs
        .join(fps.select(col(idCol).as("id_a"), col("simhash").as("__fa")), Seq("id_a"))
        .join(fps.select(col(idCol).as("id_b"), col("simhash").as("__fb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          hammingDistance(col("__fa"), col("__fb")).as("hamming"))
        .filter(col("hamming") <= maxHamming)
    }
    val sliced = fps.select(
      col(idCol), col("simhash"),
      explode(array((0 until 4).map(s =>
        struct(lit(s).as("slice"), sliceKey(col("simhash"), s).as("key"))): _*)).as("sl"))
      .select(col(idCol), col("simhash"), col("sl.slice"), col("sl.key"))
    val a = sliced.as("a")
    val b = sliced.as("b")
    // first-match emission replaces a distinct over every duplicate
    // candidate occurrence: a pair is produced only by its lowest
    // agreeing slice (all earlier slices must differ — cheap bit math
    // on the carried fingerprints, no extra shuffle).
    val firstMatch = (0 until 3)
      .map { t =>
        (col("a.slice") <= t) ||
          (sliceKey(col("a.simhash"), t) =!= sliceKey(col("b.simhash"), t))
      }
      .foldLeft(lit(true))(_ && _)
    a.join(b,
        col("a.slice") === col("b.slice") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol") && firstMatch)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        hammingDistance(col("a.simhash"), col("b.simhash")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Hamming near-dup pairs over PRECOMPUTED 60-bit signatures —
    * the [[simhashNearDuplicates]] blocking tier factored out so any
    * fingerprint family rides it (image aHash from
    * [[Multimodal.aHashPngBatched]], audio fingerprints, simhash
    * variants): 4 slice keys of 15 bits, pairs produced only by
    * their lowest agreeing slice (first-match emission — no distinct
    * over duplicate candidate occurrences), Hamming verify on the
    * carried signatures. Same scale posture as the text path:
    * slice-keyed shuffle, never all-pairs.
    *
    * RECALL CONTRACT (pigeonhole): with 4 exact-match slices, a pair
    * at Hamming distance d is guaranteed to share at least one
    * unchanged slice only for d < 4 — at `maxHamming` ≥ 4 the 4+
    * differing bits can straddle all 4 slices and the pair is
    * silently missed, so recall is HEURISTIC in that regime (same
    * caveat as [[simhashNearDuplicates]]; near-dup signatures
    * concentrate flips, which is why the default 8 still recovers
    * most mass in practice). Pass `maxHamming` ≤ 3 when exhaustive
    * pair recovery is required. Output:
    * (id_a, id_b, hamming), id_a < id_b. */
  def hammingNearDupPairs(sigs: DataFrame, idCol: String,
      hashCol: String, maxHamming: Int = 8): DataFrame = {
    def sliceKey(fp: Column, s: Int): Column =
      shiftright(fp, s * 15).bitwiseAND(0x7fff)
    val sliced = sigs.select(
      col(idCol), col(hashCol).as("__sig"),
      explode(array((0 until 4).map(s =>
        struct(lit(s).as("slice"), sliceKey(col(hashCol), s).as("key"))): _*)).as("sl"))
      .select(col(idCol), col("__sig"), col("sl.slice"), col("sl.key"))
    val a = sliced.as("a")
    val b = sliced.as("b")
    val firstMatch = (0 until 3)
      .map { t =>
        (col("a.slice") <= t) ||
          (sliceKey(col("a.__sig"), t) =!= sliceKey(col("b.__sig"), t))
      }
      .foldLeft(lit(true))(_ && _)
    a.join(b,
        col("a.slice") === col("b.slice") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol") && firstMatch)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        hammingDistance(col("a.__sig"), col("b.__sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Convergence rounds of the most recent [[connectedComponents]]
    * call (probe-visible: the closure's scale driver is rounds ×
    * per-round shuffle). */
  val lastCcRounds = new java.util.concurrent.atomic.AtomicLong(0)

  /** Connected components over near-duplicate PAIRS — the step a real
    * corpus dedup pipeline runs after pair generation: near-duplicate
    * is not transitive, but the unit of removal is the transitive
    * CLUSTER (keep one document per component, drop the rest).
    *
    * Algorithm: alternating large-star / small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") — converges in
    * O(log²) rounds regardless of component diameter, unlike plain
    * min-label propagation whose round count is the graph diameter
    * (a chained-paraphrase cluster can be arbitrarily deep).
    *
    * Scale design: each star operation is a groupBy-min plus a join
    * back on the SAME key — never a `collect_list` of a node's
    * neighborhood, so a 10⁹-member component's root never
    * materialises its full adjacency in one aggregation buffer.
    * Every round's lineage is truncated with `localCheckpoint`
    * (a 20-round iterated-join plan otherwise dominates planning
    * time; on a real cluster use reliable `checkpoint` dirs).
    * Convergence is detected with a two-long edge-set checksum
    * (count + bit_xor of xxhash64) — constant driver traffic per
    * round, no edge data ever collected.
    *
    * Input: one row per undirected edge (`aCol`, `bCol`). Output:
    * (node, cluster_id) for every node appearing in an edge, where
    * cluster_id is the component's minimum node id.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxRounds: Int = 25): DataFrame = {
    // large-star: every neighbor v > u links to the min of u's
    // closed neighborhood — strictly-larger nodes hop toward the root.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    // small-star: orient each edge large→small; u and all its smaller
    // neighbors link to the neighborhood min.
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins = dir.groupBy("u").agg(min(col("v")).as("m"))
      val attach = dir.join(mins, "u")
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      attach.union(mins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    var edges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var prevSig: (Long, Long) = (-1L, -1L)
    var converged = false
    var round = 0
    while (round < maxRounds && !converged) {
      edges = smallStar(largeStar(edges)).localCheckpoint()
      val row = edges.agg(
        count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("x")).head()
      val sig = (row.getLong(0), row.getLong(1))
      converged = sig == prevSig
      prevSig = sig
      round += 1
    }
    lastCcRounds.set(round)
    // converged state is a star forest: (node → component-min) per
    // non-root node; roots appear only on the v side.
    edges.select(col("u").as("node"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("node"), col("v").as("cluster_id")))
      .distinct()
  }

  /** End-to-end duplicate-cluster assignment: MinHash near-dup pairs →
    * connected components → every document labelled with its cluster
    * id (its own id if it has no near-duplicates) and a canonical flag
    * (the cluster's minimum id — the one copy a dedup pass keeps). */
  def duplicateClusters(docs: DataFrame, textCol: String, idCol: String,
                        shingleSize: Int = 3, numHashes: Int = 8,
                        rowsPerBand: Int = 2, jaccardThreshold: Double = 0.5,
                        maxBucketSize: Option[Int] = None): DataFrame = {
    val pairs = minhashNearDuplicates(docs, textCol, idCol, shingleSize,
      numHashes, rowsPerBand, jaccardThreshold, maxBucketSize)
    val cc = connectedComponents(pairs, "id_a", "id_b")
    docs.join(cc, docs(idCol) === cc("node"), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .withColumn("is_canonical", col("cluster_id") === col(idCol))
  }

  /** Quality-aware duplicate-cluster canonicalization: assign every
    * document its near-dup cluster ([[duplicateClusters]]), then keep
    * the cluster member with the HIGHEST `scoreCol` (ties → the
    * minimum id) instead of the blind minimum-id pick — the
    * representative-selection rule a real dedup pass ships (keep the
    * longest / highest-quality copy, drop the rest). Selection is an
    * argmax aggregate per cluster (`min_by` over the ordering struct
    * (-score, id) — deterministic under ties) joined back on the
    * cluster id: two cluster-keyed shuffles, no window over the
    * corpus. Output: (idCol, cluster_id, score, keep_id, keep). */
  def clusterCanonicalByScore(docs: DataFrame, textCol: String, idCol: String,
                              scoreCol: Column,
                              shingleSize: Int = 3, numHashes: Int = 8,
                              rowsPerBand: Int = 2, jaccardThreshold: Double = 0.5,
                              maxBucketSize: Option[Int] = None): DataFrame = {
    val cl = duplicateClusters(docs, textCol, idCol, shingleSize, numHashes,
        rowsPerBand, jaccardThreshold, maxBucketSize)
      .select(col(idCol), col("cluster_id"))
    val scored = docs.select(col(idCol).as("__sid"), scoreCol.as("score"))
    // NO pin on `m` (tried r16, reverted on a same-session A/B:
    // q127/q136 flat-to-worse pinned — the doubled docs ⋈ clusters ⋈
    // scores lineage reads pinned cc output and overlaps in one wide
    // job, so the eager pin only added a job)
    val m = cl.join(scored, col(idCol) === col("__sid")).drop("__sid")
    val best = m.groupBy("cluster_id").agg(
      min_by(col(idCol), struct((-col("score")).as("ns"), col(idCol))).as("keep_id"))
    m.join(best, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"), col("score"), col("keep_id"),
        (col(idCol) === col("keep_id")).as("keep"))
  }

  /** Embedding near-dup: pairs with cosine ≥ threshold. Blocked by
    * sign-bit LSH against `hyperplanes` — a small table with
    * (hpIdCol: int 0..H-1, hpVecCol: vector) — so the self-join is
    * bucket-local; exact cosine verifies. Bucket = Σ sign_h · 2^h.
    *
    * Delegates to [[Ann.lshNearDupPairs]]: the hyperplane table
    * (catalog-sized by contract — it was a broadcast side) is
    * materialised into the plane matrix of the native
    * [[graft.functions.SignBucketsExpr]] kernel, so bucketing is one
    * codegen projection per row instead of a crossJoin(planes) +
    * groupBy(id) shuffle with per-plane float `pow` bit math.
    */
  def embeddingNearDuplicates(embs: DataFrame, vecCol: String, idCol: String,
                              hyperplanes: DataFrame, hpIdCol: String, hpVecCol: String,
                              cosineThreshold: Double): DataFrame = {
    val planes = hyperplanes
      .select(col(hpIdCol).cast("int").as("hp_id"),
        col(hpVecCol).cast("array<double>").as("hp_vec"))
      .collect() // H plane rows — operator parameters, not data
      .sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)
      .toSeq
    Ann.lshNearDupPairs(embs, idCol, vecCol, planes, cosineThreshold)
  }

  /** Incremental exact dedup: keep only the arriving batch's rows
    * whose content digest does NOT already exist in the corpus — the
    * recrawl-ingestion stage (dedup against history, not within the
    * batch; compose with [[exactDuplicates]] for within-batch).
    * Shape: digest-keyed LEFT ANTI hash join; the corpus side prunes
    * to its digest column only, so at 100 TB the build input is one
    * narrow column (or a pre-materialized digest table — pass any
    * frame with the same text column). */
  def dedupAgainstCorpus(batch: DataFrame, corpus: DataFrame,
                         textCol: String = "text"): DataFrame = {
    val seen = corpus.select(md5(col(textCol)).as("__seen_md5")).distinct()
    batch
      .withColumn("__md5", md5(col(textCol)))
      .join(seen, col("__md5") === col("__seen_md5"), "left_anti")
      .drop("__md5")
  }

  /** Sorted-neighborhood (SNM) near-duplicate pairs — the THIRD
    * candidate-generation family beside hash blocking (minhash LSH)
    * and prefix filtering: sort on a cheap normalized key, compare
    * only documents within `windowSize` positions of each other, then
    * verify the survivors with the exact shingle Jaccard
    * ([[jaccardOnPairs]]). Hernández–Stolfo's merge/purge discipline,
    * re-expressed for Spark:
    *
    *   - the sort key is the first `keyLen` chars of the
    *     lower-cased, non-alphanumeric-stripped text — near-dups that
    *     share an opening sort adjacent; edits deep in the document
    *     cost nothing. (The classic SNM trade: dups whose DIFFERENCE
    *     is inside the key prefix sort apart and are missed — this is
    *     a recall/cost point below LSH, at strictly lower cost: no
    *     shingle explode on the candidate path at all.)
    *   - the global rank comes from [[Layout.globalOrdinals]] (one
    *     range shuffle + per-partition prefix sums) — NOT a
    *     SinglePartition window; the sort stays distributed.
    *   - the neighborhood is an equi-join: each row fans out to
    *     `windowSize` (rank + d) probes, so the candidate volume is
    *     exactly n·w rows whatever the data — no skew amplification,
    *     no hot buckets (contrast LSH, where one hot band bucket can
    *     go quadratic and needs [[minhashCandidatePairsCapped]]).
    *   - verification joins each candidate pair to its two shingle
    *     sets by id (hash joins) and pays one in-place intersection
    *     count — pair-local, linear in candidates.
    *
    * At 100 TB: one range-partitioned sort of a short key column, a
    * linear n·w candidate join, and id-keyed verify joins — the
    * cheapest of the three families, for the lowest recall; run it as
    * the first pass before LSH when the corpus clusters on openings.
    *
    * Pair filter is integer-rational (`n_inter·tauDen ≥ n_union·tauNum`),
    * so the threshold is cross-engine exact. Output:
    * (id_a, id_b, n_inter, n_a, n_b, jaccard), id_a < id_b. */
  def sortedNeighborPairs(docs: DataFrame, textCol: String, idCol: String,
      windowSize: Int, keyLen: Int = 24, shingleSize: Int = 3,
      tauNum: Int = 1, tauDen: Int = 2): DataFrame = {
    require(windowSize >= 1, "windowSize must be >= 1")
    require(keyLen >= 1, "keyLen must be >= 1")
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      "tau = tauNum/tauDen must be in (0, 1]")
    val keyed = docs.select(col(idCol),
      substring(regexp_replace(lower(col(textCol)), "[^a-z0-9]", ""),
        1, keyLen).as("__snm_key"))
    val ranked = Layout.globalOrdinals(keyed, Seq("__snm_key", idCol),
      ordCol = "__rn")
    val a = ranked.select(col(idCol).as("__ida"), col("__rn").as("__ra"))
      .withColumn("__d",
        explode(array((1 to windowSize).map(d => lit(d.toLong)): _*)))
      .select(col("__ida"), (col("__ra") + col("__d")).as("__rb"))
    val b = ranked.select(col(idCol).as("__idb"), col("__rn").as("__rb"))
    val cands = a.join(b, Seq("__rb"))
      .select(least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"))
    jaccardOnPairs(cands, docs, textCol, idCol, shingleSize)
      .withColumn("n_inter", col("n_inter").cast("long"))
      .withColumn("n_a", col("n_a").cast("long"))
      .withColumn("n_b", col("n_b").cast("long"))
      .filter(col("n_inter") * tauDen
        >= (col("n_a") + col("n_b") - col("n_inter")) * tauNum)
      .withColumn("jaccard", col("n_inter").cast("double")
        / (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
  }
}
