package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Curation

class CurationSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private lazy val docs = spark.range(0, 2000).toDF("doc_id")

  test("split is deterministic and partition-invariant") {
    val weights = Seq("train" -> 90, "valid" -> 5, "test" -> 5)
    val a = Curation.deterministicSplit(docs, "doc_id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Curation.deterministicSplit(docs.repartition(17), "doc_id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    b shouldBe a
    // fractions land near the weights (md5 is uniform)
    val n = a.size.toDouble
    a.values.count(_ == "train") / n shouldBe 0.90 +- 0.03
    a.values.count(_ == "valid") / n shouldBe 0.05 +- 0.02
    a.values.count(_ == "test") / n shouldBe 0.05 +- 0.02
  }

  test("assignments are stable under corpus growth (incremental curation)") {
    val weights = Seq("train" -> 4, "test" -> 1)
    val small = Curation.deterministicSplit(docs.filter($"doc_id" < 500),
      "doc_id", weights).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val big = Curation.deterministicSplit(docs, "doc_id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    small.foreach { case (id, s) => big(id) shouldBe s }
  }

  test("sample filter and membership flag agree; salts draw independently") {
    val kept = Curation.deterministicSample(docs, "doc_id", 1, 10)
      .collect().map(_.getLong(0)).toSet
    val flagged = docs.select($"doc_id",
        Curation.inSample($"doc_id", 1, 10).as("f"))
      .collect().filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    flagged shouldBe kept
    kept.size.toDouble / 2000 shouldBe 0.10 +- 0.03
    // a different salt draws an (almost) independent subset
    val other = Curation.deterministicSample(docs, "doc_id", 1, 10, salt = "other")
      .collect().map(_.getLong(0)).toSet
    other should not be kept
    (kept.intersect(other).size.toDouble / 2000) shouldBe 0.01 +- 0.015
  }

  test("packSequences: concat-and-chunk invariants per shard") {
    import graft.operators.Curation
    val rows = Seq((1L, "a", 100L), (2L, "a", 400L), (3L, "a", 200L),
      (4L, "a", 50L), (5L, "b", 600L), (6L, "b", 10L))
      .toDF("doc_id", "shard", "tok")
    val out = Curation.packSequences(rows, "doc_id", "tok", budget = 512,
        partCols = Seq("shard"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset"))).toMap
    // shard a: starts 0, 100, 500, 700 → packs 0,0,0,1; offsets 0,100,500,188
    out(1L) shouldBe ((0L, 0L))
    out(2L) shouldBe ((0L, 100L))
    out(3L) shouldBe ((0L, 500L)) // starts in pack 0, straddles into 1
    out(4L) shouldBe ((1L, 188L))
    // shard b packs independently
    out(5L) shouldBe ((0L, 0L))
    out(6L) shouldBe ((1L, 88L))
  }

  test("capPerGroup: at most N per group, hash-rank selection, stable under growth") {
    import graft.operators.Curation
    val docs = (1L to 200L).map(i => (i, s"g${i % 4}")).toDF("doc_id", "grp")
    val kept = Curation.capPerGroup(docs, "grp", "doc_id", 5, "s1")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    kept.groupBy(_._2).values.foreach(_.size shouldBe 5)
    // selection = the 5 lowest salted hashes per group (window-form reference)
    val ref = docs
      .withColumn("h", conv(substring(md5(concat(lit("s1:"),
        col("doc_id").cast("string"))), 1, 13), 16, 10).cast("long"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp")
          .orderBy(col("h"), col("doc_id"))))
      .filter(col("rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    kept.toSet shouldBe ref.toSet
    // growth within a group cannot evict an already-kept member unless
    // the newcomer outranks it: adding docs with HIGHER hashes keeps
    // the selection identical
    val keptIds = kept.map(_._1).toSet
    val grown = docs.unionByName(
      (1001L to 1100L).map(i => (i, s"g${i % 4}")).toDF("doc_id", "grp"))
    val keptGrown = Curation.capPerGroup(grown, "grp", "doc_id", 5, "s1")
      .collect().map(_.getLong(0)).toSet
    // every survivor of the grown corpus that existed before was kept before
    keptGrown.filter(_ <= 200L).subsetOf(keptIds) shouldBe true
  }

  test("capPerGroup: groups smaller than the cap pass through whole") {
    import graft.operators.Curation
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "grp")
    Curation.capPerGroup(docs, "grp", "doc_id", 10)
      .collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L, 3L)
  }

  test("degenerate weights: single label covers everything") {
    Curation.deterministicSplit(docs, "doc_id", Seq("all" -> 1))
      .select("split").distinct().collect().map(_.getString(0)).toSeq shouldBe Seq("all")
  }

  test("importanceSample: keep probability tracks the weight; 0 and 1 are exact") {
    val scored = spark.range(0, 4000).select(
      col("id").as("doc_id"),
      (when(col("id") % 4 === 0, 0.0)
        .when(col("id") % 4 === 1, 1.0)
        .when(col("id") % 4 === 2, 0.25).otherwise(0.75)).as("w"))
    val kept = Curation.importanceSample(scored, "doc_id", col("w"))
      .groupBy("w").count()
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    kept.contains(0.0) shouldBe false          // weight 0 -> never kept
    kept(1.0) shouldBe 1000L                   // weight 1 -> always kept
    kept(0.25).toDouble shouldBe 250.0 +- 50.0
    kept(0.75).toDouble shouldBe 750.0 +- 60.0
    // pure projection: partition layout cannot change membership
    val a = Curation.importanceSample(scored, "doc_id", col("w"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.importanceSample(scored.repartition(17), "doc_id", col("w"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    b shouldBe a
  }

  test("resampleToMixture: binding source kept whole, others thin to the ratio") {
    val corpus = spark.range(0, 6000).select(
      col("id").as("doc_id"),
      concat(lit("s"), (col("id") % 3).cast("string")).as("source"))
    // equal counts (2000 each), weights 4:2:1 -> s0 binding (kept whole),
    // s1 at rate 1/2, s2 at rate 1/4
    val kept = Curation.resampleToMixture(corpus, "source", "doc_id",
        Seq("s0" -> 4, "s1" -> 2, "s2" -> 1))
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    kept("s0") shouldBe 2000L
    kept("s1").toDouble shouldBe 1000.0 +- 80.0
    kept("s2").toDouble shouldBe 500.0 +- 60.0
    // realized mixture tracks 4:2:1
    (kept("s0").toDouble / kept("s2")) shouldBe 4.0 +- 0.6
  }

  test("resampleToMixture is partition-invariant and stable") {
    val corpus = spark.range(0, 3000).select(
      col("id").as("doc_id"),
      concat(lit("s"), (col("id") % 4).cast("string")).as("source"))
    val w = Seq("s0" -> 3, "s1" -> 2)
    val a = Curation.resampleToMixture(corpus, "source", "doc_id", w)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.resampleToMixture(corpus.repartition(17), "source", "doc_id", w)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    b shouldBe a
    a.nonEmpty shouldBe true
  }

  test("largestRemainderQuotas: sums EXACTLY to the budget, within 1 of " +
      "the proportional share, ties break by key asc") {
    val rows = Seq.tabulate(100)(i =>
      (i.toLong, if (i < 50) "a" else if (i < 80) "b" else "c"))
      .toDF("doc_id", "src")
    val q = Curation.largestRemainderQuotas(rows, "src", budget = 7L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    q.values.sum shouldBe 7L
    // shares: a 3.5, b 2.1, c 1.4 → bases 3/2/1, leftover 1 to the
    // largest remainder (a, .5)
    q shouldBe Map("a" -> 4L, "b" -> 2L, "c" -> 1L)
    // all-equal counts: every remainder ties; keys ascending win
    val eq = Seq.tabulate(40)(i => (i.toLong, s"s${i % 4}"))
      .toDF("doc_id", "src")
    val q2 = Curation.largestRemainderQuotas(eq, "src", budget = 6L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    q2.values.sum shouldBe 6L
    q2 shouldBe Map("s0" -> 2L, "s1" -> 2L, "s2" -> 1L, "s3" -> 1L)
    // divisible budget: no leftovers, pure proportion
    val q3 = Curation.largestRemainderQuotas(eq, "src", budget = 8L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    q3.values.toSet shouldBe Set(2L)
  }

  test("shardAndOrder: partition-invariant deterministic shards and dense per-shard order") {
    val corpus = spark.range(0, 2000).select(col("id").as("doc_id"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.shardAndOrder(df, "doc_id", nShards = 8)
        .select("doc_id", "shard", "pos").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val a = run(corpus)
    val b = run(corpus.repartition(13))
    b shouldBe a // reproducible byte-for-byte whatever the layout
    a.values.map(_._1).toSet.size shouldBe 8 // all shards populated
    // per-shard positions are dense 1..n
    a.values.groupBy(_._1).foreach { case (_, rows) =>
      rows.map(_._2).toSeq.sorted shouldBe (1L to rows.size)
    }
    // hash order is not id order (it's a real shuffle)
    val shard0 = a.toSeq.filter(_._2._1 == 0L).sortBy(_._2._2).map(_._1)
    shard0 should not be shard0.sorted
  }

  test("snapshotDiff: all four statuses, content keyed by md5 not identity") {
    val oldSnap = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "alpha"), (2L, "beta CHANGED"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = Curation.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got shouldBe Map(1L -> "unchanged", 2L -> "changed",
      3L -> "deleted", 4L -> "added")
  }

  test("snapshotDiff: a moved document (same content, new id) is added+deleted") {
    val oldSnap = Seq((1L, "same")).toDF("doc_id", "text")
    val newSnap = Seq((9L, "same")).toDF("doc_id", "text")
    val got = Curation.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got shouldBe Map(1L -> "deleted", 9L -> "added")
  }

  test("groupedSplit: every row sharing the group key lands in the SAME split; " +
      "row-id splits would leak") {
    val rows = (0L until 200L).map(i => (i, s"domain${i % 7}.com"))
      .toDF("doc_id", "domain")
    val out = Curation.groupedSplit(rows, col("domain"),
        Seq("train" -> 90, "valid" -> 5, "test" -> 5), salt = "gs")
      .collect().map(r => r.getString(1) -> r.getString(2))
    // leakage-safety: one split per domain, however many rows
    out.groupBy(_._1).values.foreach(_.map(_._2).distinct.size shouldBe 1)
    // determinism: a re-run yields the identical assignment
    val again = Curation.groupedSplit(rows, col("domain"),
        Seq("train" -> 90, "valid" -> 5, "test" -> 5), salt = "gs")
      .collect().map(r => r.getString(1) -> r.getString(2))
    again.toSet shouldBe out.toSet
    // the salt moves assignments (different hash family)
    val moved = Curation.groupedSplit(rows, col("domain"),
        Seq("a" -> 1, "b" -> 1), salt = "s1")
      .collect().map(r => r.getString(1) -> r.getString(2)).toSet
    val moved2 = Curation.groupedSplit(rows, col("domain"),
        Seq("a" -> 1, "b" -> 1), salt = "s2")
      .collect().map(r => r.getString(1) -> r.getString(2)).toSet
    moved should not be moved2
  }

  test("frontierInterleave: each domain appears at most once per wave, " +
      "waves are dense per domain, order keys are deterministic") {
    val rows = (0L until 60L).map(i => (i, s"host${i % 7}.com"))
      .toDF("doc_id", "domain")
    val out = Curation.frontierInterleave(rows, "doc_id", "domain")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // politeness: within a wave every domain occurs exactly once
    out.groupBy(_._3).values.foreach { wave =>
      wave.map(_._2).distinct.length shouldBe wave.length
    }
    // waves are dense 1..n per domain in id order
    out.groupBy(_._2).values.foreach { d =>
      d.sortBy(_._1).map(_._3).toSeq shouldBe (1L to d.length).toSeq
    }
    // the fetch key is a pure function of (domain, wave): re-run identical
    val again = Curation.frontierInterleave(rows, "doc_id", "domain")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    out.foreach { case (id, _, _, k) => again(id) shouldBe k }
  }

  test("weightedSampleWithoutReplacement: exactly k distinct rows, " +
      "partition-invariant, nonpositive weights never sampled, " +
      "global top-k plans as TakeOrdered (no shuffle)") {
    import org.apache.spark.sql.functions.col
    val rows = (1L to 200L).map(i => (i, (i % 7 + 1).toDouble)) ++
      Seq((900L, 0.0), (901L, -3.0))
    val df = rows.toDF("id", "w")
    val out = Curation.weightedSampleWithoutReplacement(
      df, "id", col("w"), k = 25, salt = "s1")
    val picked = out.collect().map(_.getAs[Long]("id"))
    picked.length shouldBe 25
    picked.distinct.length shouldBe 25
    picked should not contain 900L
    picked should not contain 901L
    val shuffled = Curation.weightedSampleWithoutReplacement(
        df.repartition(11), "id", col("w"), k = 25, salt = "s1")
      .collect().map(_.getAs[Long]("id"))
    shuffled.toSeq shouldBe picked.toSeq
    out.queryExecution.executedPlan.toString should
      include ("TakeOrderedAndProject")
  }

  test("weightedSampleWithoutReplacement: inclusion frequency tracks " +
      "the weight across independent salts") {
    import org.apache.spark.sql.functions.col
    // one heavy row (w=50) among 49 light rows (w=1); over 12
    // independent draws of k=5 the heavy row must be picked strictly
    // more often than any light row's expected handful
    val df = ((1L to 49L).map(i => (i, 1.0)) :+ (50L, 50.0)).toDF("id", "w")
    val hits = (0 until 12).count { s =>
      Curation.weightedSampleWithoutReplacement(
          df, "id", col("w"), k = 5, salt = s"freq$s")
        .collect().exists(_.getAs[Long]("id") == 50L)
    }
    // P(heavy in a k=5 draw) ≈ 1 - prod(1 - 50/(99-i)) >> 0.9;
    // light rows land ~5% of draws. 10+/12 separates them decisively.
    hits should be >= 10
  }
  test("cluster-keyed split (q245 shape): near-duplicate docs never straddle " +
      "splits; a row-id split over the same ids does") {
    val docs = (0L until 60L).map(i => (i * 37L + 5L,
      "subscribe to our newsletter for updates all rights reserved"))
      .toDF("doc_id", "text")
    val clustered = graft.operators.Dedup.duplicateClusters(docs, "text",
      "doc_id", shingleSize = 3, numHashes = 8, rowsPerBand = 2,
      jaccardThreshold = 0.8)
    val out = Curation.groupedSplit(clustered, col("cluster_id"),
      Seq("train" -> 90, "valid" -> 5, "test" -> 5))
    // identical text -> one cluster -> exactly one split for all 60 docs
    out.select("split").distinct().count() shouldBe 1L
    // the row-id split straddles the same cluster (the leak q245 prevents)
    docs.select(Curation.splitLabel(col("doc_id"),
        Seq("train" -> 90, "valid" -> 5, "test" -> 5)).as("s"))
      .distinct().count() should be > 1L
  }

  test("importanceWeights: exact micros vs a local brute-force replay; " +
      "gumbelTopK is deterministic and weight-shift-invariant") {
    val target = Seq((100L, "good words flow here"), (101L, "good words again"))
      .toDF("doc_id", "text")
    val rawDocs = Map(1L -> "good words flow", 2L -> "zz qq junk junk",
      3L -> "good junk")
    val raw = rawDocs.toSeq.toDF("doc_id", "text")
    val out = Curation.importanceWeights(target, raw, "doc_id", "text",
        buckets = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"dsir:$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (BigInt(hex.substring(0, 14), 16) % 64).toLong
    }
    def toks(s2: String) = s2.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val tgtToks = Seq("good words flow here", "good words again").flatMap(toks)
    val ct = tgtToks.groupBy(bucket).map { case (b, xs) => b -> xs.size.toLong }
    val ntv = tgtToks.size.toLong
    val allRaw = rawDocs.values.toSeq.flatMap(toks)
    val cr = allRaw.groupBy(bucket).map { case (b, xs) => b -> xs.size.toLong }
    val nrv = allRaw.size.toLong
    val expected = rawDocs.map { case (id, s2) =>
      val perB = toks(s2).groupBy(bucket).map { case (b, xs) => b -> xs.size.toLong }
      val w = perB.map { case (b, c) =>
        val pt = (ct.getOrElse(b, 0L) + 1).toDouble / (ntv + 64).toDouble
        val pr = (cr(b) + 1).toDouble / (nrv + 64).toDouble
        math.round(math.log(pt / pr) * 1e6) * c
      }.sum
      id -> ((toks(s2).size.toLong, w))
    }
    out shouldBe expected
    // the target-like doc outscores the all-junk doc
    out(1L)._2 should be > out(2L)._2

    val weights = Curation.importanceWeights(target, raw, "doc_id", "text",
      buckets = 64)
    val sel = Curation.gumbelTopK(weights, "doc_id", k = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    sel.size shouldBe 2
    Curation.gumbelTopK(weights, "doc_id", k = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe sel
    // adding a constant to every weight shifts every Gumbel key equally
    val shifted = Curation.gumbelTopK(
        weights.withColumn("weight_micros", col("weight_micros") + 1000000L),
        "doc_id", k = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    shifted shouldBe sel
  }
  test("weightedSamplePerGroup: exactly k per group, equals the window-rank " +
      "form, non-positive weights never sampled") {
    val rows = (0L until 40L).map(i =>
      (s"g${i % 3}", i, if (i % 7 == 0) 0.0 else (i % 5 + 1).toDouble))
      .toDF("g", "id", "w")
    val out = Curation.weightedSamplePerGroup(rows, "g", "id", col("w"),
        k = 4, salt = "t")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    out.groupBy(_._1).values.foreach(_.size shouldBe 4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy(col("key").desc, $"id".asc)
    val brute = rows.filter($"w" > 0)
      .withColumn("key", Curation.aesKeyMicro($"id", $"w", "t"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    out shouldBe brute
    // the zero-weight rows (i % 7 == 0) are never sampled
    out.map(_._2).exists(_ % 7 == 0) shouldBe false
  }

  test("temperatureQuotas: sum to budget; alpha=1 reproduces raw-proportion " +
      "quotas; alpha<1 up-samples small groups") {
    val rows = ((0 until 90).map(i => ("big", i.toLong)) ++
      (0 until 10).map(i => ("small", 100L + i))).toDF("g", "id")
    val t1 = Curation.temperatureQuotas(rows, "g", budget = 50L, alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("quota")).toMap
    val lr = Curation.largestRemainderQuotas(rows, "g", budget = 50L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("quota")).toMap
    t1 shouldBe lr
    t1.values.sum shouldBe 50L
    val t07 = Curation.temperatureQuotas(rows, "g", budget = 50L, alpha = 0.7)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("quota")).toMap
    t07.values.sum shouldBe 50L
    t07("small") should be > t1("small")
    t07("big") should be < t1("big")
  }

  test("epochAllocation: greedy quality-ordered fill, fractional boundary epoch, exact micros") {
    import org.apache.spark.sql.functions._
    // quality order: a (q=1), b (q=2), c (q=3); budget 50, cap 4 epochs
    val stats = Seq(("a", 10L, 1L), ("b", 5L, 2L), ("c", 8L, 3L))
      .toDF("src", "n_tokens", "q")
      .withColumn("budget", lit(50L))
    val out = Curation.epochAllocation(stats, "src", "n_tokens", "q",
        "budget", maxEpochs = 4)
      .collect().map(r => r.getAs[String]("src") ->
        ((r.getAs[Long]("q_rank"), r.getAs[Long]("served_tokens"),
          r.getAs[Long]("epochs_micros")))).toMap
    out("a") shouldBe ((1L, 40L, 4000000L))   // full 4 epochs
    out("b") shouldBe ((2L, 10L, 2000000L))   // fractional: 10/5 = 2 epochs
    out("c") shouldBe ((3L, 0L, 0L))          // budget exhausted
    // budget larger than every cap -> everyone serves maxEpochs
    val rich = Curation.epochAllocation(
        stats.withColumn("budget", lit(1000L)), "src", "n_tokens", "q",
        "budget", maxEpochs = 4)
      .collect().map(r => r.getAs[String]("src") ->
        r.getAs[Long]("epochs_micros")).toMap
    rich.values.toSet shouldBe Set(4000000L)
    // exact fractional division: budget 45 -> b serves 5 of cap 20
    val frac = Curation.epochAllocation(
        stats.withColumn("budget", lit(45L)), "src", "n_tokens", "q",
        "budget", maxEpochs = 4)
      .collect().map(r => r.getAs[String]("src") ->
        r.getAs[Long]("epochs_micros")).toMap
    frac("b") shouldBe 1000000L // 5*1e6 div 5
  }

  test("epochSchedule: full epochs serve everything reshuffled; the fractional epoch serves the exact hash-ordered token prefix") {
    import org.apache.spark.sql.functions._
    // one key, 3 docs of 4/3/3 tokens, 2.5 epochs:
    // 2 full epochs + a fractional epoch of 0.5*10 = 5 tokens
    val perDoc = Seq(("s", 1L, 4L), ("s", 2L, 3L), ("s", 3L, 3L))
      .toDF("src", "id", "tok")
    val alloc = Seq(("s", 2500000L)).toDF("src", "epochs_micros")
    val out = Curation.epochSchedule(perDoc, "src", "id", "tok",
        alloc, salt = "ts")
      .collect().map(r => (r.getAs[Long]("epoch"),
        r.getAs[Long]("serve_rank"), r.getAs[Long]("id"))).toSeq
    val byEpoch = out.groupBy(_._1)
      .view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    byEpoch.keySet shouldBe Set(1L, 2L, 3L)
    byEpoch(1L).toSet shouldBe Set(1L, 2L, 3L)
    byEpoch(2L).toSet shouldBe Set(1L, 2L, 3L)
    // replicate the epoch-salted shuffle exactly
    def h(e: Long, id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ts:$e:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 14)
      java.lang.Long.parseLong(hex, 16)
    }
    (1L to 2L).foreach { e =>
      byEpoch(e) shouldBe Seq(1L, 2L, 3L).sortBy(id => (h(e, id), id))
    }
    // fractional epoch: hash-ordered docs stream while cumBefore < 5
    val toks = Map(1L -> 4L, 2L -> 3L, 3L -> 3L)
    val order3 = Seq(1L, 2L, 3L).sortBy(id => (h(3L, id), id))
    var cum = 0L
    val pref = order3.takeWhile { id =>
      val keep = cum < 5L; cum += toks(id); keep
    }
    byEpoch(3L) shouldBe pref
  }

  test("doremiWeights: hand-computed multiplicative rounds with selection feedback") {
    import org.apache.spark.sql.functions._
    // domain a: losses {2000, 2000}; domain b: {0, 0}; etaDen=1
    val perDoc = Seq(
      ("a", 1L, 2000L), ("a", 2L, 2000L),
      ("b", 3L, 0L), ("b", 4L, 0L)
    ).toDF("src", "id", "loss")
    val out = Curation.doremiWeights(perDoc, "src", "id", "loss",
        rounds = 2, etaDen = 1L)
      .collect().map(r => (r.getString(0), r.getAs[Long]("round")) ->
        r.getAs[Long]("w_micros")).toMap
    // r1: everyone selected; m_a=2000, m_b=0, mg=1000
    //   a: step +1000 -> clamped at 1e6; b: step -1000 -> 999000
    out(("a", 1L)) shouldBe 1000000L
    out(("b", 1L)) shouldBe 999000L
    // r2: k_b = (2*999000) div 1e6 = 1 -> b's hardest doc (loss 0)
    //   mg = 4000/3 = 1333; a: +667 clamped; b: step -1333 ->
    //   999000*998667 div 1e6 = 997668
    out(("a", 2L)) shouldBe 1000000L
    out(("b", 2L)) shouldBe 997668L
    // selection feedback: a domain whose HARDEST doc dominates keeps
    // its weight once its slice narrows — b'={5000,0} has mean 2500
    // (> a's 2000), so b' never shrinks and a shrinks instead
    val fb = Curation.doremiWeights(Seq(
        ("a", 1L, 2000L), ("a", 2L, 2000L),
        ("b", 3L, 5000L), ("b", 4L, 0L)
      ).toDF("src", "id", "loss"), "src", "id", "loss",
        rounds = 1, etaDen = 1L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("w_micros")).toMap
    fb("b") shouldBe 1000000L
    fb("a") should be < 1000000L
    // share normalizes each round to ~1e6 total
    val shares = Curation.doremiWeights(perDoc, "src", "id", "loss",
        rounds = 1, etaDen = 1L)
      .collect().map(_.getAs[Long]("share_micros")).sum
    shares should be <= 1000000L
    shares should be > 999990L
  }

  test("paddingWasteAudit: hand-computed batch costs per strategy") {
    val rows = Seq((1L, "a", 5L), (2L, "a", 1L), (3L, "a", 4L),
      (4L, "a", 8L), (5L, "a", 2L)).toDF("doc_id", "grp", "tok")
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.paddingWasteAudit(df, "grp", "doc_id", "tok",
          batchSize = 2, bucketWidth = 4)
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n_batches"), r.getAs[Long]("total_tokens"),
            r.getAs[Long]("padded_tokens"), r.getAs[Long]("waste_micros")))
        .toMap
    val out = run(rows)
    // arrival (id order): [5,1]→10, [4,8]→16, [2]→2; Σtok=20
    out("arrival") shouldBe ((3L, 20L, 28L, 8000000L / 28L))
    // sorted (tok order 1,2,4,5,8): [1,2]→4, [4,5]→10, [8]→8
    out("sorted") shouldBe ((3L, 20L, 22L, 2000000L / 22L))
    // bucketed (tok div 4): b0=[1,2]→4, b1=[5,4]→10, b2=[8]→8
    out("bucketed") shouldBe ((3L, 20L, 22L, 2000000L / 22L))
    // partition-invariant: windows are keyed, never positional
    run(rows.repartition(7)) shouldBe out
  }

  test("gateOverlapMatrix: pairwise and exclusive counts, sorted keys") {
    // docs: 1 fails a only; 2 fails a+b; 3 fails b+c; 4 fails none
    val flags = Seq(
      (1L, true, false, false), (2L, true, true, false),
      (3L, false, true, true), (4L, false, false, false))
      .toDF("id", "ga", "gb", "gc")
    val out = Curation.gateOverlapMatrix(flags, Seq("gc", "ga", "gb"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    out.keySet shouldBe Set(("ga", "ga"), ("ga", "gb"), ("ga", "gc"),
      ("gb", "gb"), ("gb", "gc"), ("gc", "gc"))
    // (n_fail_a, n_fail_b, n_fail_both, n_only_a)
    out(("ga", "ga")) shouldBe ((2L, 2L, 2L, 1L)) // doc 1 is a-exclusive
    out(("ga", "gb")) shouldBe ((2L, 2L, 1L, 1L)) // doc 2 co-fails
    out(("ga", "gc")) shouldBe ((2L, 1L, 0L, 1L)) // disjoint
    out(("gb", "gc")) shouldBe ((2L, 1L, 1L, 0L)) // gb never exclusive
    out(("gc", "gc")) shouldBe ((1L, 1L, 1L, 0L))
    // empty input: sums coalesce to 0 instead of a null-row explosion
    val empty = Curation.gateOverlapMatrix(
      flags.filter(col("id") < 0), Seq("ga", "gb"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4))
      .toMap
    empty(("ga", "gb")) shouldBe 0L
  }

}
