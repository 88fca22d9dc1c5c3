package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Dedup

class DedupSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"),   // near dup of 1
    (4L, "completely different text about spark engines here"),
    (5L, "")).toDF("doc_id", "text")

  test("shingles: sliding word 3-grams; short text collapses to one shingle") {
    val sh = Seq(Tuple1("a b c d")).toDF("t")
      .select(Dedup.shingles(col("t"), 3).as("s")).head().getSeq[String](0)
    sh shouldBe Seq("a b c", "b c d")
    val short = Seq(Tuple1("a b")).toDF("t")
      .select(Dedup.shingles(col("t"), 3).as("s")).head().getSeq[String](0)
    short shouldBe Seq("a b")
  }

  test("exactDuplicates: one row per digest, lowest id kept, copies counted") {
    val out = Dedup.exactDuplicates(docs).collect()
    out.length shouldBe 4 // 1&2 collapse
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    dup.getAs[Long]("keep_id") shouldBe 1L
  }

  test("minhash signatures: identical texts get identical signatures") {
    val sigs = Dedup.minhashSignatures(docs.filter($"doc_id" =!= 5L),
      "text", "doc_id", shingleSize = 3, numHashes = 8)
    val rows = sigs.collect().map(r => r.getAs[Long]("doc_id") ->
      (0 until 8).map(h => r.getAs[Long](s"sig_$h"))).toMap
    rows(1L) shouldBe rows(2L)
    rows(1L) should not be rows(4L)
    // near-dup shares most (not necessarily all) signature slots
    val shared = rows(1L).zip(rows(3L)).count { case (a, b) => a == b }
    shared should be >= 4
  }

  test("minhash signatures independentHashes: deterministic, partition-" +
      "invariant, identical texts still collide, families decorrelated") {
    val in = docs.filter($"doc_id" =!= 5L)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        (0 until 8).map(h => r.getAs[Long](s"sig_$h"))).toMap
    val a = collect(Dedup.minhashSignatures(in, "text", "doc_id",
      shingleSize = 3, numHashes = 8, independentHashes = true))
    val b = collect(Dedup.minhashSignatures(in.repartition(7), "text",
      "doc_id", shingleSize = 3, numHashes = 8, independentHashes = true))
    a shouldBe b
    a(1L) shouldBe a(2L) // identical texts collide per family
    // decorrelation: the salted families are NOT the affine h1+i*h2
    // ladder — consecutive slot deltas of one doc must not be constant
    val deltas = a(1L).sliding(2).map(p => p(1) - p(0)).toSeq
    deltas.distinct.size should be > 1
    // the signature IS its specification: recompute doc 1's slots
    // locally from the same two-families-per-salted-digest formula
    // (deterministic — no statistical tail to flake on; the
    // shares-at-jaccard-rate property is carried by the oracle-checked
    // recall audits q141 at both SFs)
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val shingles1 = Dedup.shingles(org.apache.spark.sql.functions.lit(
      "the quick brown fox jumps over the lazy dog"), 3)
    val sh = spark.range(1).select(shingles1.as("s"))
      .collect().head.getSeq[String](0).distinct
    val expected = (0 until 8).map { h =>
      sh.map { s =>
        val d = md5hex(s"mh${h / 2}:$s")
        val half = if (h % 2 == 0) d.substring(0, 14) else d.substring(14, 28)
        java.lang.Long.parseLong(half, 16)
      }.min
    }
    a(1L) shouldBe expected
  }

  test("LSH banding surfaces the exact and near dup pairs, not the unrelated doc") {
    val sigs = Dedup.minhashSignatures(docs.filter($"doc_id" =!= 5L),
      "text", "doc_id", shingleSize = 3, numHashes = 8)
    val pairs = Dedup.minhashCandidatePairs(sigs, "doc_id", numHashes = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
    pairs should contain((1L, 3L))
    pairs should not contain ((1L, 4L))
  }

  test("capped banding equals uncapped when no bucket exceeds the cap") {
    val sigs = Dedup.minhashSignatures(docs.filter($"doc_id" =!= 5L),
      "text", "doc_id", shingleSize = 3, numHashes = 8)
    val uncapped = Dedup.minhashCandidatePairs(sigs, "doc_id", 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minhashCandidatePairsCapped(sigs, "doc_id", 8, 2,
        maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    capped shouldBe uncapped
  }

  test("hot-bucket cap suppresses the boilerplate cluster's quadratic pairs " +
    "and exactSignatureDuplicates groups it linearly instead") {
    // 12 boilerplate copies (one hot bucket in EVERY band) + the normal docs
    val boiler = (100L until 112L)
      .map(i => (i, "subscribe to our newsletter all rights reserved"))
      .toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" =!= 5L).unionByName(boiler)
    val sigs = Dedup.minhashSignatures(corpus, "text", "doc_id", 3, 8)
    val capped = Dedup.minhashCandidatePairsCapped(sigs, "doc_id", 8, 2,
        maxBucketSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no pair touches the boilerplate cluster (its 66 pairs are capped out) ...
    capped.foreach { case (a, b) =>
      a should be < 100L
      b should be < 100L
    }
    // ... the small-bucket pairs are untouched ...
    capped should contain((1L, 2L))
    capped should contain((1L, 3L))
    // ... and the capped mass is recovered as ONE signature cluster
    val clusters = Dedup.exactSignatureDuplicates(sigs, "doc_id").collect()
    val boilerCluster = clusters.find(_.getAs[Long]("keep_id") == 100L).get
    boilerCluster.getAs[Long]("n_docs") shouldBe 12L
    // docs 1 & 2 are exact dups too — identical signatures
    clusters.find(_.getAs[Long]("keep_id") == 1L).get
      .getAs[Long]("n_docs") shouldBe 2L
  }

  test("collapseExact: a replica flood collapses before signing — distinct-text " +
    "pairs survive a cap the flood would otherwise drag them out of") {
    val nearA = "the quick brown fox jumps over the lazy dog today"
    val nearB = "the quick brown fox jumps over the lazy dog tonight"
    // 12 copies of nearA flood every band bucket nearA hashes into
    val flood = (100L until 112L).map(i => (i, nearA))
    val corpus = (Seq((1L, nearA), (2L, nearB)) ++ flood).toDF("doc_id", "text")
    val capped = Dedup.minhashNearDuplicates(corpus, "text", "doc_id",
        shingleSize = 3, numHashes = 8, rowsPerBand = 2,
        jaccardThreshold = 0.5, maxBucketSize = Some(8))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    capped shouldBe empty // the flood drowned the real near-dup pair too
    val collapsed = Dedup.minhashNearDuplicates(corpus, "text", "doc_id",
        shingleSize = 3, numHashes = 8, rowsPerBand = 2,
        jaccardThreshold = 0.5, maxBucketSize = Some(8), collapseExact = true)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // one representative per text: the (nearA-rep, nearB) pair is found,
    // and no identical-text pair is emitted at all
    collapsed shouldBe Set((1L, 2L))
  }

  test("a pair sharing only a hot band and a small band still survives via the small band") {
    // construct signatures directly: docs 1..10 share band 0 exactly
    // (sig_0, sig_1 equal — hot at cap 4); docs 1 & 2 additionally share
    // band 3 (sig_6, sig_7) — a small bucket, so (1,2) must survive
    val rows = (1L to 10L).map { i =>
      val b3 = if (i <= 2) 77L else 1000L + i
      (i, 1L, 2L, 10L + i, 20L + i, 30L + i, 40L + i, b3, b3 + 1)
    }
    val sigs = rows.toDF("doc_id", "sig_0", "sig_1", "sig_2", "sig_3",
      "sig_4", "sig_5", "sig_6", "sig_7")
    val capped = Dedup.minhashCandidatePairsCapped(sigs, "doc_id", 8, 2,
        maxBucketSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    capped shouldBe Set((1L, 2L))
  }

  test("simhash cap: identical-fingerprint pile suppressed; equals uncapped under a generous cap") {
    val boiler = (100L until 110L)
      .map(i => (i, "subscribe to our newsletter all rights reserved"))
      .toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" =!= 5L).unionByName(boiler)
    val uncapped = Dedup.simhashNearDuplicates(corpus, "text", "doc_id", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.simhashNearDuplicates(corpus, "text", "doc_id", maxHamming = 8,
        maxBucketSize = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    capped should contain((1L, 2L))
    capped.foreach { case (a, b) =>
      a should be < 100L
      b should be < 100L
    }
    Dedup.simhashNearDuplicates(corpus, "text", "doc_id", maxHamming = 8,
        maxBucketSize = Some(1000))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe uncapped
  }

  test("Banding kernel equals the brute-force reference on random bucket tables, exactly once") {
    import graft.operators.Banding
    val numBands = 4
    for (seed <- 1 to 5; cap <- Seq(None, Some(3))) {
      val rnd = new scala.util.Random(seed)
      // small bucket domain forces collisions, including piles over the cap
      val rows = (0L until 30L).map(i =>
        (i, Seq.fill(numBands)(rnd.nextInt(5).toLong)))
      val bySize: Map[(Int, Long), Int] = rows.flatMap { case (_, bks) =>
        bks.zipWithIndex.map { case (b, t) => (t, b) }
      }.groupBy(identity).view.mapValues(_.size).toMap
      val expected = (for {
        (a, abks) <- rows; (b, bbks) <- rows if a < b
        t <- 0 until numBands
        if abks(t) == bbks(t) && cap.forall(bySize((t, abks(t))) <= _)
      } yield (a, b)).toSet
      val out = Banding.firstMatchPairs(
          rows.toDF("id", "bks"), "id", numBands, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      withClue(s"seed=$seed cap=$cap: ") {
        out.toSet shouldBe expected
        out.distinct.size shouldBe out.size // first-match = exactly once
      }
    }
  }

  test("jaccardOnPairs: identical docs 1.0; disjoint docs 0.0") {
    val pairs = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val j = Dedup.jaccardOnPairs(pairs, docs, "text", "doc_id", 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("jaccard")).toMap
    j((1L, 2L)) shouldBe 1.0
    j((1L, 4L)) shouldBe 0.0
  }

  test("minhashNearDuplicates end-to-end honours the jaccard threshold") {
    // docs 1 vs 3: 7 shingles each, 4 shared → jaccard 4/10 = 0.4
    val nd = Dedup.minhashNearDuplicates(docs.filter($"doc_id" =!= 5L),
      "text", "doc_id", jaccardThreshold = 0.35)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    nd should contain((1L, 2L))
    nd should contain((1L, 3L))
    nd.foreach { case (a, b) => Set(a, b) should not contain 4L }
  }

  test("simhash: identical texts identical fingerprints, hamming 0; near dup close") {
    val fps = Dedup.simhash(docs.filter($"doc_id" =!= 5L), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fps(1L) shouldBe fps(2L)
    java.lang.Long.bitCount(fps(1L) ^ fps(3L)) should be <= 20
    java.lang.Long.bitCount(fps(1L) ^ fps(4L)) should be > 10
  }


  test("SimhashExpr is bit-identical to the relational md5/conv/vote form") {
    // the DuckDB oracle keeps exactly this SQL formulation — pin the
    // native kernel against it on real text
    val sample = docs.select($"doc_id", $"text")
    val relational = {
      val wordHash = conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long")
      val words = sample
        .select(col("doc_id"), explode(array_distinct(split(col("text"), "\\s+"))).as("word"))
        .withColumn("h", wordHash)
      val bitVotes = (0 until 60).map { bit =>
        sum(when(shiftright(col("h"), bit).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b_$bit")
      }
      val voted = words.groupBy(col("doc_id")).agg(bitVotes.head, bitVotes.tail: _*)
      val fp = (0 until 60).map { bit =>
        when(col(s"b_$bit") > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
      }.reduce((x, y) => x.bitwiseOR(y))
      voted.select(col("doc_id"), fp.as("simhash"))
    }
    val native = Dedup.simhash(sample, "text", "doc_id")
    val rel = relational.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nat = native.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    nat shouldBe rel
  }

  test("simhashNearDuplicates blocks then verifies hamming distance") {
    val nd = Dedup.simhashNearDuplicates(docs.filter($"doc_id" =!= 5L),
      "text", "doc_id", maxHamming = 8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    nd should contain((1L, 2L))
  }

  test("embeddingNearDuplicates: bucket-blocked cosine pairs") {
    val embs = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.99, 0.1, 0.0)),  // near dup of 1
      (3L, Seq(-1.0, 0.0, 0.0))). // opposite
      toDF("vec_id", "embedding")
    val hps = Seq(
      (0, Seq(1.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0)),
      (2, Seq(0.3, -0.7, 0.2))).toDF("hp_id", "hp_vec")
    val out = Dedup.embeddingNearDuplicates(embs, "embedding", "vec_id",
        hps, "hp_id", "hp_vec", cosineThreshold = 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    out shouldBe Set((1L, 2L))
  }

  private def ccLabels(edges: Seq[(Long, Long)], maxRounds: Int = 25): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b", maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side union-find reference for the tests. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connectedComponents: a deep chain collapses to its min id " +
      "(transitivity past any single pair's reach)") {
    val chain = (1L until 40L).map(i => (i, i + 1))
    ccLabels(chain) shouldBe (1L to 40L).map(_ -> 1L).toMap
  }

  test("connectedComponents: separate components keep separate labels; " +
      "self-loops and duplicate edges ignored") {
    val edges = Seq((5L, 7L), (7L, 6L), (6L, 6L), (5L, 7L),
      (20L, 30L), (30L, 10L))
    ccLabels(edges) shouldBe Map(5L -> 5L, 6L -> 5L, 7L -> 5L,
      10L -> 10L, 20L -> 10L, 30L -> 10L)
  }

  test("connectedComponents: empty edge set yields empty labels") {
    ccLabels(Seq.empty) shouldBe Map.empty
  }

  test("connectedComponents equals driver-side union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      ccLabels(edges) shouldBe unionFind(edges)
    }
  }

  test("prefixJaccardPairs finds EXACTLY the brute-force tau-pairs") {
    // mixed corpus: one exact-dup pair, one near-dup pair, distinct rest
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "the quick brown fox jumps over the lazy cat tonight"),
      (4L, "entirely different words compose this document body here"),
      (5L, "another unrelated text with its own vocabulary entirely"),
      (6L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    // brute force: all pairs, exact jaccard, filter >= 0.5
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val allPairs = (for { a <- ids; b <- ids if a < b } yield (a, b))
      .toSeq.toDF("id_a", "id_b")
    val brute = Dedup.jaccardOnPairs(allPairs, docs, "text", "doc_id",
        shingleSize = 3)
      .filter(col("n_inter") * 2 >= (col("n_a") + col("n_b") - col("n_inter")))
      .select("id_a", "id_b", "n_inter", "n_a", "n_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.prefixJaccardPairs(docs, "text", "doc_id",
        shingleSize = 3, tauNum = 1, tauDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe brute
    got should contain((1L, 2L)) // the exact dup must be found
  }

  test("prefixJaccardPairs emits each pair exactly once and is " +
      "partition-invariant") {
    val docs = (1L to 30L).map { i =>
      val base = "alpha beta gamma delta epsilon zeta eta theta"
      val text = if (i % 3 == 0) base else base + s" tail$i word$i"
      (i, text)
    }.toDF("doc_id", "text")
    val once = Dedup.prefixJaccardPairs(docs, "text", "doc_id",
      shingleSize = 3, tauNum = 4, tauDen = 5)
    val rows = once.collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.length shouldBe rows.toSet.size // no double emission
    val repart = Dedup.prefixJaccardPairs(docs.repartition(7), "text",
      "doc_id", shingleSize = 3, tauNum = 4, tauDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    repart shouldBe rows.toSet
    // the 10 identical docs (i % 3 == 0) give 45 J=1 pairs
    rows.count { case (a, b) => a % 3 == 0 && b % 3 == 0 } shouldBe 45
  }

  test("prefixJaccardPairs collapseExact: a planted 50-copy cluster " +
      "stays linear (zero intra-cluster pairs), cross-cluster matches survive") {
    val boiler = "all rights reserved click here to accept our cookie policy now"
    val near = "all rights reserved click here to accept our cookie policy today"
    val docs = ((1L to 50L).map(i => (i, boiler)) ++ Seq(
        (100L, near),
        (200L, "entirely unrelated text with its own private vocabulary")))
      .toDF("doc_id", "text")
    val uncollapsed = Dedup.prefixJaccardPairs(docs, "text", "doc_id",
        shingleSize = 3, tauNum = 4, tauDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the mis-use shape: 50·49/2 identical pairs + 50 near-dup rows
    uncollapsed.count { case (a, b) => a <= 50 && b <= 50 } shouldBe 1225
    val collapsed = Dedup.prefixJaccardPairs(docs, "text", "doc_id",
        shingleSize = 3, tauNum = 4, tauDen = 5, collapseExact = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // representatives only: the cluster contributes its lowest id once
    collapsed.toSet shouldBe Set((1L, 100L)) // cross-cluster match kept
  }

  test("prefixJaccardPairs tau bounds: disjoint docs never pair, " +
      "tau rational is inclusive") {
    val docs = Seq(
      (1L, "one two three four"), // shingles: {one two three, two three four}
      (2L, "one two three five"), // J = 1/3 with doc 1
      (3L, "nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val atThird = Dedup.prefixJaccardPairs(docs, "text", "doc_id",
        shingleSize = 3, tauNum = 1, tauDen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    atThird shouldBe Set((1L, 2L)) // J = 1/3 >= 1/3 inclusive
    val above = Dedup.prefixJaccardPairs(docs, "text", "doc_id",
        shingleSize = 3, tauNum = 1, tauDen = 2)
      .collect()
    above shouldBe empty // J = 1/3 < 1/2
  }

  test("banded MinHash pairs are a SUBSET of the exact prefix-filter " +
      "pairs at the same tau (the q106 guarantee, operator-level)") {
    val docs = (1L to 40L).map { i =>
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      val text =
        if (i % 4 == 0) base
        else if (i % 4 == 1) base + " lambda"
        else s"doc$i " + (1 to 8).map(j => s"w${i}_$j").mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val exact = Dedup.prefixJaccardPairs(docs, "text", "doc_id",
        shingleSize = 3, tauNum = 4, tauDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDuplicates(docs, "text", "doc_id",
        shingleSize = 3, numHashes = 8, rowsPerBand = 2,
        jaccardThreshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact),
      s"LSH emitted pairs the exact join missed: ${lsh -- exact}")
    exact should not be empty
  }

  test("duplicateClusters: boilerplate copies form one cluster with the " +
      "lowest id canonical; unrelated docs are their own singletons") {
    val boiler = "subscribe to our newsletter for updates all rights reserved"
    val docs = ((1L to 5L).map(i => (100L + i, boiler)) ++ Seq(
      (1L, "completely unrelated text about cats and dogs playing outside"),
      (2L, "another standalone document concerning weather patterns today")))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateClusters(docs, "text", "doc_id",
        jaccardThreshold = 0.8)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_canonical"))).toSet
    out shouldBe Set(
      (101L, 101L, true), (102L, 101L, false), (103L, 101L, false),
      (104L, 101L, false), (105L, 101L, false),
      (1L, 1L, true), (2L, 2L, true))
  }

  test("containmentOnPairs: a strict shingle-subset has containment 1 on " +
      "its side while Jaccard stays below 1") {
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val short = "alpha beta gamma delta epsilon" // prefix: shingles subset
    val docs = Seq((1L, long), (2L, short)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Dedup.containmentOnPairs(pairs, docs, "text", "doc_id", 3).head()
    r.getAs[Double]("containment_b") shouldBe 1.0
    assert(r.getAs[Double]("containment_a") < 1.0)
    assert(r.getAs[Double]("jaccard") < 1.0)
    // the asymmetry is the point: jaccard equals the small/large ratio
    r.getAs[Double]("jaccard") shouldBe
      r.getAs[Long]("n_inter").toDouble / r.getAs[Int]("n_a")
  }

  test("clusterCanonicalByScore keeps the highest-score member, ties to min id") {
    val boiler = "subscribe to our newsletter for updates all rights reserved"
    val docs = Seq(
      (101L, boiler), (102L, boiler + " extra tail words here"), (103L, boiler),
      (1L, "completely unrelated text about cats and dogs playing outside"))
      .toDF("doc_id", "text")
    val out = Dedup.clusterCanonicalByScore(docs, "text", "doc_id",
        org.apache.spark.sql.functions.length(col("text")).cast("long"),
        jaccardThreshold = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("keep_id"), r.getAs[Boolean]("keep")))).toMap
    // 102 is the longest member of the cluster -> it wins over min-id 101
    out(101L) shouldBe ((102L, false))
    out(102L) shouldBe ((102L, true))
    out(103L) shouldBe ((102L, false))
    out(1L) shouldBe ((1L, true)) // singleton keeps itself
    // equal scores fall back to the minimum id
    val tied = Seq((7L, boiler), (5L, boiler)).toDF("doc_id", "text")
    val t = Dedup.clusterCanonicalByScore(tied, "text", "doc_id",
        org.apache.spark.sql.functions.length(col("text")).cast("long"),
        jaccardThreshold = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep_id")).toMap
    t shouldBe Map(5L -> 5L, 7L -> 5L)
  }

  test("sortedNeighborPairs: prefix-adjacent near-dups found, " +
      "prefix-divergent dup missed (the SNM window trade), " +
      "partition-invariant") {
    // 10&11 share the 24-char normalized prefix and differ at the
    // tail -> sort adjacent -> found. 20&21 are near-dups whose FIRST
    // word differs -> sort far apart (separated by > windowSize other
    // keys) -> structurally missed at windowSize = 1.
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta one"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta two"),
      (20L, "aardvark shared middle words run along here fine"),
      (21L, "zebra shared middle words run along here fine"),
      (30L, "curium text about engines"),
      (31L, "erbium text about engines"),
      (32L, "ferium text about engines"),
      (33L, "helium text about engines")).toDF("doc_id", "text")
    val out = Dedup.sortedNeighborPairs(corpus, "text", "doc_id",
        windowSize = 1, keyLen = 24, shingleSize = 3,
        tauNum = 1, tauDen = 2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out should contain ((10L, 11L))
    out should not contain ((20L, 21L))
    // widening the window past the separating keys recovers the pair
    val wide = Dedup.sortedNeighborPairs(corpus, "text", "doc_id",
        windowSize = 7, keyLen = 24, shingleSize = 3,
        tauNum = 1, tauDen = 2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    wide should contain ((20L, 21L))
    // global ordinals make the result partition-layout-invariant
    val shuffled = Dedup.sortedNeighborPairs(corpus.repartition(7),
        "text", "doc_id", windowSize = 1, keyLen = 24, shingleSize = 3,
        tauNum = 1, tauDen = 2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    shuffled shouldBe out
  }

  test("sortedNeighborPairs: candidate volume is exactly n·w rank " +
      "pairs before verification — no skew amplification from " +
      "identical keys") {
    // 12 identical docs: LSH banding would emit C(12,2)=66 candidates
    // from one bucket; SNM emits only the w neighbors of each rank.
    val clones = (1L to 12L).map(i => (i, "same text every time here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.sortedNeighborPairs(clones, "text", "doc_id",
        windowSize = 2, keyLen = 24, shingleSize = 3,
        tauNum = 1, tauDen = 2).collect()
    // ranks 1..12, window 2: (12-1) + (12-2) = 21 pairs, all jaccard 1
    pairs.length shouldBe 21
    all(pairs.map(_.getAs[Double]("jaccard"))) shouldBe 1.0
  }

  test("neardupAdmission: exact resends rejected at agree 8, novel docs admitted, edits matched to their source") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different text about spark shuffles and partitions at scale"),
      (3L, "a third document with its own unique shingle inventory for indexing")
    ).toDF("doc_id", "text")
    val arrivals = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again and again today"), // exact resend of 1
      (102L, "the quick brown fox jumps over the lazy dog again and again today extra"), // edit of 1
      (103L, "an entirely novel page with fresh unseen vocabulary nothing shared here")
    ).toDF("doc_id", "text")
    val out = Dedup.neardupAdmission(
        Dedup.minhashSignatures(corpus, "text", "doc_id"),
        Dedup.minhashSignatures(arrivals, "text", "doc_id"),
        "doc_id", rejectAgree = 6)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_partners"), r.getAs[Long]("best_match_id"),
          r.getAs[Long]("best_agree"), r.getAs[Boolean]("admitted"))))
      .toMap
    out(101L)._2 shouldBe 1L
    out(101L)._3 shouldBe 8L
    out(101L)._4 shouldBe false
    out(102L)._2 shouldBe 1L // the edit still matches its source
    out(103L) shouldBe ((0L, -1L, 0L, true)) // novel: no collision
    // bandBuckets emits one row per band
    Dedup.bandBuckets(Dedup.minhashSignatures(corpus, "text", "doc_id"),
      "doc_id").count() shouldBe 12L // 3 docs x 4 bands
  }
}
