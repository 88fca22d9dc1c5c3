package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketch

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def freq(rows: (String, Long)*) = rows.toDF("item", "w")

  test("never undercounts, exact when width is collision-free") {
    val items = freq("a" -> 10L, "b" -> 3L, "c" -> 7L, "d" -> 1L)
    // wide sketch: 4 items over 4096 buckets x 4 rows — collisions
    // essentially impossible, estimates must be exact
    val wide = Sketch.countMinBuild(items, "item", "w", 4, 4096, "t")
    val exact = Sketch.countMinEstimate(wide, items, "item", 4, 4096, "t")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact.forall { case (_, (w, est)) => est == w })

    // narrow sketch: 2 buckets force collisions — est >= true, always
    val narrow = Sketch.countMinBuild(items, "item", "w", 4, 2, "t")
    val est = Sketch.countMinEstimate(narrow, items, "item", 4, 2, "t")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(est.forall { case (_, (w, e)) => e >= w })
    // with 4 items in 2 buckets some row must collide somewhere
    assert(est.values.map(_._2).sum >= est.values.map(_._1).sum)
  }

  test("absent item estimates 0 against an unrelated sketch, when no collision") {
    val sketch = Sketch.countMinBuild(freq("a" -> 5L), "item", "w", 4, 4096, "t")
    val out = Sketch.countMinEstimate(sketch, freq("zzz" -> 0L), "item", 4, 4096, "t")
      .collect()
    assert(out.length == 1 && out(0).getLong(2) == 0L)
  }

  test("sketch is mergeable: build(A union B) == cell-wise sum of build(A), build(B)") {
    val a = freq("a" -> 10L, "b" -> 3L, "c" -> 7L)
    val b = freq("b" -> 2L, "d" -> 9L)
    val whole = Sketch.countMinBuild(a.unionByName(b), "item", "w", 4, 8, "m")
      .orderBy("h", "bucket").collect().toSeq
    val merged = Sketch.countMinBuild(a, "item", "w", 4, 8, "m")
      .unionByName(Sketch.countMinBuild(b, "item", "w", 4, 8, "m"))
      .groupBy("h", "bucket").agg(sum("cnt").as("cnt"))
      .orderBy("h", "bucket").collect().toSeq
    assert(whole == merged)
  }

  test("build output is bounded by depth x width cells and partition-invariant") {
    val items = (1 to 500).map(i => (s"it$i", (i % 7 + 1).toLong)).toDF("item", "w")
    val s1 = Sketch.countMinBuild(items.repartition(1), "item", "w", 4, 16, "p")
      .orderBy("h", "bucket").collect().toSeq
    val s8 = Sketch.countMinBuild(items.repartition(8), "item", "w", 4, 16, "p")
      .orderBy("h", "bucket").collect().toSeq
    assert(s1 == s8)
    assert(s1.size <= 4 * 16)
  }

  test("bloom: no false negatives — every inserted item probes true") {
    val items = (1 to 200).map(i => (s"item$i", 0L)).toDF("item", "w")
    // tiny filter, heavily loaded: FPs abound but never a false negative
    val bloom = Sketch.bloomBuild(items, "item", numBits = 64, numHashes = 3, salt = "b")
    val probed = Sketch.bloomMightContain(bloom, items, "item", 64, 3, "b").collect()
    assert(probed.length == 200 && probed.forall(_.getBoolean(2)))
  }

  test("bloom: wide filter rejects absent items; build bounded by numBits") {
    val in = freq("a" -> 1L, "b" -> 1L, "c" -> 1L)
    val out = (1 to 50).map(i => (s"zz$i", 0L)).toDF("item", "w")
    val bloom = Sketch.bloomBuild(in, "item", numBits = 65536, numHashes = 4, salt = "b")
    assert(bloom.count() <= 3 * 4)
    val probed = Sketch.bloomMightContain(bloom, out, "item", 65536, 4, "b").collect()
    // 50 absent probes against 12 set bits of 65536: expected FP mass ~1e-11
    assert(probed.forall(!_.getBoolean(2)))
  }

  test("bloom: merge is distinct-union of positions; partition-invariant") {
    val a = freq("a" -> 1L, "b" -> 1L)
    val b = freq("b" -> 1L, "c" -> 1L)
    val whole = Sketch.bloomBuild(a.unionByName(b), "item", 256, 3, "m")
      .orderBy("pos").collect().toSeq
    val merged = Sketch.bloomBuild(a, "item", 256, 3, "m")
      .unionByName(Sketch.bloomBuild(b, "item", 256, 3, "m"))
      .distinct().orderBy("pos").collect().toSeq
    assert(whole == merged)
    val r8 = Sketch.bloomBuild(a.unionByName(b).repartition(8), "item", 256, 3, "m")
      .orderBy("pos").collect().toSeq
    assert(whole == r8)
  }

  test("bloom: reserved-name misuse fails fast") {
    val items = freq("a" -> 1L)
    val bloom = Sketch.bloomBuild(items, "item", 256, 3, "b")
    intercept[IllegalArgumentException] {
      Sketch.bloomMightContain(bloom, items.withColumn("pos", lit(1)), "item", 256, 3, "b")
    }
  }

  test("hll: estimate is insensitive to duplicates and partitioning") {
    val items = (1 to 2000).map(i => (s"g", s"item${i % 500}")).toDF("grp", "item")
    val once = Sketch.hllDistinct(items, Seq("grp"), "item", p = 6, salt = "h")
      .collect()(0)
    val doubled = Sketch.hllDistinct(items.unionByName(items), Seq("grp"), "item",
      p = 6, salt = "h").collect()(0)
    val repart = Sketch.hllDistinct(items.repartition(8), Seq("grp"), "item",
      p = 6, salt = "h").collect()(0)
    assert(once.getLong(1) == doubled.getLong(1) && once.getDouble(2) == doubled.getDouble(2))
    assert(once.getLong(1) == repart.getLong(1) && once.getDouble(2) == repart.getDouble(2))
  }

  test("hll: within the standard error band on a 5k-distinct set (m=64)") {
    val items = (1 to 5000).map(i => ("g", s"val$i")).toDF("grp", "item")
    val est = Sketch.hllDistinct(items, Seq("grp"), "item", p = 6, salt = "h")
      .collect()(0).getDouble(2)
    // sigma = 1.04/sqrt(64) ~ 13%; 3-sigma gate
    assert(math.abs(est / 5000.0 - 1.0) < 0.4, s"est $est too far from 5000")
  }

  test("hll: small sets take the linear-counting branch exactly") {
    val items = Seq(("g", "a"), ("g", "b"), ("g", "c")).toDF("grp", "item")
    val row = Sketch.hllDistinct(items, Seq("grp"), "item", p = 6, salt = "h")
      .collect()(0)
    val used = row.getLong(1)
    val v = 64 - used
    assert(row.getDouble(2) == 64.0 * math.log(64.0 / v.toDouble))
    assert(used <= 3)
  }

  test("estimate keeps payload columns and reserved-name misuse fails fast") {
    val items = freq("a" -> 5L)
    val sketch = Sketch.countMinBuild(items, "item", "w", 2, 8, "t")
    val withPayload = items.withColumn("extra", lit("x"))
    val out = Sketch.countMinEstimate(sketch, withPayload, "item", 2, 8, "t").collect()
    assert(out(0).schema.fieldNames.toSeq == Seq("item", "w", "extra", "est"))
    intercept[IllegalArgumentException] {
      Sketch.countMinEstimate(sketch, items.withColumn("h", lit(1)), "item", 2, 8, "t")
    }
  }

  test("amsJoinSize: self-join estimate equals the AMS F2 estimate, " +
      "identical frequency tables estimate exactly like F2, " +
      "partition-invariant") {
    import spark.implicits._
    val freqs = (1 to 200).map(i => (s"k$i", (i % 7 + 1).toLong))
      .toDF("item", "w")
    val self = Sketch.amsJoinSize(freqs, "item", "w", freqs, "item", "w",
      depth = 8, salt = "t").head().getLong(0)
    // A = B makes every estimator product a square: the inner-product
    // sketch degenerates to amsF2's Σs²/depth on the same sign family
    val f2 = Sketch.amsF2(freqs.withColumn("g", lit(1)), "g", "item", "w",
      depth = 8, salt = "t").head().getAs[Long]("ams_est")
    assert(self == f2)
    val repart = Sketch.amsJoinSize(freqs.repartition(7), "item", "w",
      freqs.repartition(5), "item", "w", depth = 8, salt = "t")
      .head().getLong(0)
    assert(repart == self)
    // the estimate tracks the true inner product within the AMS
    // error band on this fixed deterministic draw (true Σf² here);
    // deeper sketch → tighter band (std ≈ sqrt(2/depth)·F2)
    val deep = Sketch.amsJoinSize(freqs, "item", "w", freqs, "item", "w",
      depth = 64, salt = "t").head().getLong(0)
    val exact = (1 to 200).map(i => { val w = (i % 7 + 1).toLong; w * w }).sum
    assert(math.abs(deep - exact).toDouble / exact < 0.5)
  }

  test("logBucketQuantiles: matches the brute-force bucket replay, " +
      "stays within 10% of the exact quantile, partition-invariant, " +
      "rejects non-positive values") {
    val rnd = new scala.util.Random(21L)
    // two groups with very different scales, incl. sub-100 exact zone
    val rows = (1 to 4000).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      val x = if (g == "a") 1L + rnd.nextInt(80).toLong
      else (math.exp(rnd.nextDouble() * 9) * 10).toLong + 1L
      (g, x)
    }
    val perms = Seq(500, 900, 990)
    def bucketOf(x: Long): Long = {
      val s = x.toString
      if (s.length < 3) x
      else (s.substring(0, 2) + "0" * (s.length - 2)).toLong
    }
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val bs = rs.map(r => bucketOf(r._2)).sorted
      val n = bs.length.toLong
      perms.map { p =>
        val t = (p.toLong * n + 999) / 1000
        (g, p.toLong) -> ((n, bs((t - 1).toInt)))
      }
    }
    val df = rnd.shuffle(rows).toDF("g", "x")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketch.logBucketQuantiles(d, "g", col("x"), perms)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
    val out = run(df.repartition(8))
    assert(out == expected)
    assert(run(df.repartition(3)) == out)
    // error contract vs the exact quantile at the same rank rule
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val xs = rs.map(_._2).sorted
      perms.foreach { p =>
        val t = ((p.toLong * xs.length + 999) / 1000).toInt
        val exactQ = xs(t - 1)
        val est = out((g, p.toLong))._2
        assert(math.abs(est - exactQ).toDouble <= exactQ.toDouble / 10)
      }
    }
    val bad = Seq(("a", 5L), ("a", 0L)).toDF("g", "x")
    intercept[Exception] {
      Sketch.logBucketQuantiles(bad, "g", col("x"), Seq(500)).collect()
    }
  }
  test("hllOverlapMatrix: the pairwise union estimate IS the sketch of the " +
      "concatenated stream; inclusion-exclusion wiring is exact") {
    val items = Seq(("a", "x1"), ("a", "x2"), ("a", "c1"), ("b", "y1"),
      ("b", "c1"), ("b", "y2"), ("c", "z1"), ("c", "c1"))
      .toDF("g", "it")
    val rows = Sketch.hllOverlapMatrix(items, "g", "it", p = 6, salt = "t")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(rows.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    // register-wise max == sketch of the union stream, exactly
    val abUnion = Sketch.hllDistinct(
        items.filter($"g" =!= "c").withColumn("g", lit("ab")),
        Seq("g"), "it", p = 6, salt = "t")
      .head().getDouble(2)
    assert(rows(("a", "b"))._3 == abUnion)
    // inclusion-exclusion is the literal double arithmetic
    val (ea, eb, eu, ei) = rows(("a", "b"))
    assert(ei == ea + eb - eu)
  }

}
