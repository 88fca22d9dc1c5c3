package graft

import org.apache.spark.sql.functions.col
import org.scalatest.matchers.should.Matchers

import graft.operators.Analyze

class AnalyzeSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("vennCounts3: all 7 regions from one pass") {
    val a = Seq(1, 2, 3, 4, 7, 5).toDF("k")   // dup-free after distinct
    val b = Seq(2, 3, 5, 6, 7).toDF("k")
    val c = Seq(3, 4, 6, 7, 8).toDF("k")
    val out = Analyze.vennCounts3(a, b, c)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map(
      "a_only" -> 1L,   // 1
      "b_only" -> 0L,   // none
      "ab_only" -> 2L,  // 2, 5
      "ac_only" -> 1L,  // 4
      "bc_only" -> 1L,  // 6
      "abc" -> 2L,      // 3, 7
      "c_only" -> 1L    // 8
    ).filter(_._2 > 0)  // zero regions are absent
  }

  test("vennCounts3 deduplicates inputs (set semantics like plotting.py:9)") {
    val a = Seq(1, 1, 1, 2).toDF("k")
    val b = Seq(2, 2).toDF("k")
    val c = Seq(9).toDF("k")
    val out = Analyze.vennCounts3(a, b, c)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("a_only" -> 1L, "ab_only" -> 1L, "c_only" -> 1L)
  }

  test("vennCounts2: 3 regions, set semantics, agrees with vennCounts3 " +
      "given an empty third frame (the plotting.py:9 C=None default)") {
    val a = Seq(1, 1, 2, 3, 4).toDF("k")
    val b = Seq(3, 4, 5).toDF("k")
    val out = Analyze.vennCounts2(a, b)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("a_only" -> 2L, "b_only" -> 1L, "ab" -> 2L)
    // equivalence with the 3-set form under an empty C: the 2-set
    // regions are the C-free projections of the 3-set regions
    val empty = Seq.empty[Int].toDF("k")
    val via3 = Analyze.vennCounts3(a, b, empty)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out("a_only") shouldBe via3.getOrElse("a_only", 0L)
    out("b_only") shouldBe via3.getOrElse("b_only", 0L)
    out("ab") shouldBe via3.getOrElse("ab_only", 0L)
  }

  test("pcaProject2d: 2 coordinates per row; first component carries at least as much variance") {
    val rnd = new scala.util.Random(7)
    // anisotropic cloud: x-axis variance 100, others 1
    val rows = (0L until 200L).map(i =>
      (i, Seq(rnd.nextGaussian() * 10, rnd.nextGaussian(), rnd.nextGaussian(), rnd.nextGaussian())))
    val df = rows.toDF("vec_id", "embedding")
    val out = Analyze.pcaProject2d(df, "embedding", Seq("vec_id")).collect()
    out.length shouldBe 200
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(v => (v - m) * (v - m)).sum / xs.size
    }
    val vx = variance(out.map(_.getAs[Double]("x")).toSeq)
    val vy = variance(out.map(_.getAs[Double]("y")).toSeq)
    vx should be >= vy
    vx should be > 50.0 // the dominant axis was found
  }

  test("pcaProject2d orientation is canonical: dominant-loading axis points positive") {
    // points spread along u ≈ (0.98, 0.2, 0): PC1 = ±u; the canonical
    // convention (largest-|loading| component positive) must pick +u,
    // so a point with a large POSITIVE first component projects to
    // positive x regardless of which sign the eigensolver returned.
    val rnd = new scala.util.Random(11)
    val rows = (-50 to 50).map { t =>
      (t.toLong + 50, Seq(t * 1.0 + rnd.nextGaussian() * 0.01,
        t * 0.2 + rnd.nextGaussian() * 0.01, rnd.nextGaussian() * 0.01))
    }
    val out = Analyze.pcaProject2d(rows.toDF("vec_id", "embedding"), "embedding", Seq("vec_id"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("x")).toMap
    out(100L) should be > 0.0 // the t=+50 extreme
    out(0L) should be < 0.0   // the t=-50 extreme
  }

  test("pcaProject2dWithBasis: coordinates ARE the ordered dot products " +
       "against the exported signed basis (bit-exact oracle replay contract)") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 80L).map(i =>
      (i, Seq(rnd.nextGaussian() * 5, rnd.nextGaussian() * 2,
        rnd.nextGaussian(), rnd.nextGaussian())))
    val df = rows.toDF("vec_id", "embedding")
    val (out, basis) = Analyze.pcaProject2dWithBasis(df, "embedding", Seq("vec_id"))
    basis.length shouldBe 2
    basis(0).length shouldBe 4
    val got = out.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("x"), r.getAs[Double]("y"))).toMap
    def fold(v: Seq[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < b.length) { s += v(i) * b(i); i += 1 }
      s
    }
    rows.foreach { case (id, v) =>
      assert(got(id)._1 == fold(v, basis(0))) // left-to-right fold, bit-exact
      assert(got(id)._2 == fold(v, basis(1)))
    }
  }

  test("pcaCertify2d: every contract flag holds on an anisotropic cloud") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 300L).map(i =>
      (i, Seq(rnd.nextGaussian() * 8, rnd.nextGaussian() * 3,
        rnd.nextGaussian(), rnd.nextGaussian())))
    val out = Analyze.pcaCertify2d(rows.toDF("vec_id", "embedding"),
      "embedding", Seq("vec_id")).collect()
    out.length shouldBe 300
    val flags = Seq("norm_contract", "orthonormal", "var_ordered",
      "sign_canonical", "axis_optimal")
    flags.foreach { f =>
      withClue(f) { out.forall(_.getAs[Boolean](f)) shouldBe true }
    }
  }

  test("pcaCertify2d axis_optimal beats the best coordinate pair on a rotated cloud") {
    // variance lives along a DIAGONAL direction: no coordinate pair
    // captures it fully, a correct top-2 PCA subspace must — so the
    // axis_optimal probe is non-vacuous here (the captured variance
    // strictly exceeds the best coordinate pair's)
    val rnd = new scala.util.Random(17)
    val rows = (0L until 300L).map { i =>
      val t = rnd.nextGaussian() * 10
      (i, Seq(t + rnd.nextGaussian() * 0.1, t + rnd.nextGaussian() * 0.1,
        t + rnd.nextGaussian() * 0.1, rnd.nextGaussian() * 0.1))
    }
    val out = Analyze.pcaCertify2d(rows.toDF("vec_id", "embedding"),
      "embedding", Seq("vec_id")).collect()
    out.forall(_.getAs[Boolean]("axis_optimal")) shouldBe true
    out.forall(_.getAs[Boolean]("norm_contract")) shouldBe true
  }

  test("winsorizedStats: hand-computed interpolated bounds, clipped " +
      "counts, exact winsorized cents, per-group isolation, " +
      "partition-invariant") {
    import org.apache.spark.sql.functions.col
    // group g: 1..20 -> lo = 1.95, hi = 19.05 (linear interpolation);
    // one value clips each side; win sum = 1.95 + Σ(2..19) + 19.05 = 210
    val rows = (1 to 20).map(v => ("g", v.toDouble)) ++
      Seq(("h", 5.0), ("h", 100.0)) // tiny group: bounds interpolate inside
    val df = rows.toDF("grp", "v")
    val out = Analyze.winsorizedStats(df, "grp", "v", 0.05, 0.95)
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    g.getAs[Long]("n") shouldBe 20L
    g.getAs[Double]("lo") shouldBe 1.95 +- 1e-12
    g.getAs[Double]("hi") shouldBe 19.05 +- 1e-12
    g.getAs[Long]("n_clipped_lo") shouldBe 1L
    g.getAs[Long]("n_clipped_hi") shouldBe 1L
    g.getAs[Long]("win_sum_cents") shouldBe 21000L
    // 2-value group: p05 = 5 + 0.05*95 = 9.75, p95 = 5 + 0.95*95 = 95.25
    val h = out("h")
    h.getAs[Long]("n_clipped_lo") shouldBe 1L
    h.getAs[Long]("n_clipped_hi") shouldBe 1L
    h.getAs[Long]("win_sum_cents") shouldBe (975L + 9525L)
    val re = Analyze.winsorizedStats(df.repartition(7), "grp", "v",
        0.05, 0.95)
      .collect().map(r => r.getString(0) ->
        r.getAs[Long]("win_sum_cents")).toMap
    re("g") shouldBe 21000L
    re("h") shouldBe 10500L
  }

  test("paretoFrontier: hand-computed skyline, dominance edges " +
      "(equal-x, equal-y, duplicates), partition-invariant") {
    import org.apache.spark.sql.functions.col
    // skyline: (5,10) (3,20) (1,30); (4,10) dominated by (5,10);
    // (3,15) dominated per-x; (1,20) dominated by (3,20) equal-y;
    // duplicate (3,20) emits once
    val pts = Seq((5L, 10L), (4L, 10L), (3L, 20L), (3L, 20L), (3L, 15L),
      (1L, 30L), (1L, 20L)).toDF("x", "y")
    val out = Analyze.paretoFrontier(pts, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    out shouldBe Seq((1L, 30L), (3L, 20L), (5L, 10L))
    // one point dominating everything collapses the frontier to it
    val allDom = Analyze.paretoFrontier(
        pts.union(Seq((9L, 99L)).toDF("x", "y")), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    allDom shouldBe Seq((9L, 99L))
    val re2 = Analyze.paretoFrontier(pts.repartition(5), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    re2 shouldBe out
  }

  test("associationRules: hand-computed support/confidence/lift, " +
      "within-basket duplicates collapse, minSupport prunes, " +
      "partition-invariant") {
    import org.apache.spark.sql.functions.col
    // baskets: b1={A,B,C}, b2={A,B}, b3={A,C}, b4={B} (+ dup A in b1)
    val rows = Seq((1L, "A"), (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (3L, "A"), (3L, "C"), (4L, "B"))
      .toDF("bk", "it")
    val out = Analyze.associationRules(rows, "bk", "it", minSupport = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // supp: A=3, B=3, C=2; n=4
    // (A,B): supp 2, conf 2/3 -> 666666, lift 2*4/(3*3) -> 888888
    out(("A", "B")) shouldBe ((2L, 3L, 3L, 666666L, 888888L))
    // (A,C): supp 2, conf 2/3, lift 2*4/(3*2) = 4/3 -> 1333333
    out(("A", "C")) shouldBe ((2L, 3L, 2L, 666666L, 1333333L))
    // (B,C): supp 1 < minSupport -> pruned
    out.size shouldBe 2
    val re = Analyze.associationRules(rows.repartition(5), "bk", "it",
        minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    re shouldBe out.keySet
  }

  test("abTest: arm assignment is the md5 rule, counts partition the " +
      "units, rate/z arithmetic matches a scala recompute, " +
      "partition-invariant") {
    import org.apache.spark.sql.functions._
    val ev = (1L to 200L).flatMap { u =>
      // user u converts iff u % 3 == 0 (arm-independent ground truth)
      Seq((u, "view"), (u, if (u % 3 == 0) "purchase" else "click"))
    }.toDF("user_id", "event_type")
    val out = Analyze.abTest(ev, "user_id",
      (col("event_type") === "purchase").cast("long"), "t").head()
    val armOf = (u: Long) => {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t:$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(14), 16) % 2
    }
    val units = (1L to 200L).map(u => (armOf(u), u % 3 == 0))
    val (nA, cA) = (units.count(_._1 == 0L),
      units.count(u => u._1 == 0L && u._2))
    val (nB, cB) = (units.count(_._1 == 1L),
      units.count(u => u._1 == 1L && u._2))
    out.getLong(0) shouldBe nA.toLong
    out.getLong(1) shouldBe cA.toLong
    out.getLong(3) shouldBe nB.toLong
    out.getLong(4) shouldBe cB.toLong
    out.getLong(2) shouldBe (cA.toLong * 1000000L / nA)
    val pa = cA.toDouble / nA; val pb = cB.toDouble / nB
    val pp = (cA + cB).toDouble / (nA + nB)
    val z = (pa - pb) / math.sqrt(pp * (1.0 - pp) * (1.0 / nA + 1.0 / nB))
    java.lang.Double.doubleToLongBits(out.getDouble(6)) shouldBe
      java.lang.Double.doubleToLongBits(z)
    val re = Analyze.abTest(ev.repartition(7), "user_id",
      (col("event_type") === "purchase").cast("long"), "t").head()
    re shouldBe out
  }

  test("halfSampleCI: replica membership is the md5 rule, std matches " +
      "a scala recompute of the same IEEE tree bit-for-bit, " +
      "partition-invariant") {
    import org.apache.spark.sql.functions.col
    val rows = (1L to 400L).map(i => ("g", i, (i % 37) * 10L))
      .toDF("grp", "id", "cents")
    val reps = 8
    val out = Analyze.halfSampleCI(rows, "grp", "id", col("cents"),
      replicas = reps, salt = "t").head()
    def memberOf(b: Int, id: Long): Boolean = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t:$b:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(14), 16) % 2 == 0
    }
    val data = (1L to 400L).map(i => i -> (i % 37) * 10L)
    val ms = (0 until reps).map { b =>
      val sel = data.filter(d => memberOf(b, d._1))
      sel.map(_._2).sum.toDouble / sel.size.toDouble
    }
    val mbar = ms.reduceLeft(_ + _) / reps.toDouble
    val varE = ms.map(m => (m - mbar) * (m - mbar)).reduceLeft(_ + _) /
      reps.toDouble
    out.getAs[Long]("n") shouldBe 400L
    out.getAs[Long]("sum_cents") shouldBe data.map(_._2).sum
    java.lang.Double.doubleToLongBits(
      out.getAs[Double]("half_sample_std_cents")) shouldBe
      java.lang.Double.doubleToLongBits(math.sqrt(varE))
    val re = Analyze.halfSampleCI(rows.repartition(7), "grp", "id",
      col("cents"), replicas = reps, salt = "t").head()
    re shouldBe out
  }

  test("madAnomalies: a planted spike is flagged, the median/MAD are " +
      "immune to it, clean data flags nothing, partition-invariant") {
    import org.apache.spark.sql.functions.col
    // 99 values of 100±5 plus one 10000 spike: med ~100, mad ~<=5,
    // only the spike exceeds 3*MAD
    val rows = ((1 to 99).map(i => ("g", 100L + (i % 11) - 5L)) :+
      (("g", 10000L))).toDF("grp", "cents")
    val out = Analyze.madAnomalies(rows, "grp", col("cents"), k = 3.0)
      .head()
    out.getAs[Long]("n") shouldBe 100L
    out.getAs[Double]("med_cents") should (be >= 95.0 and be <= 105.0)
    out.getAs[Double]("mad_cents") should be <= 5.0
    out.getAs[Long]("n_anomalies") shouldBe 1L
    out.getAs[Long]("anomaly_cents") shouldBe 10000L
    // without the spike nothing flags at k=3 on this tight cluster?
    // (deterministic either way — pin the observed value)
    val clean = Analyze.madAnomalies(rows.filter(col("cents") < 1000L),
      "grp", col("cents"), k = 3.0).head()
    clean.getAs[Long]("n_anomalies") shouldBe 0L
    val re = Analyze.madAnomalies(rows.repartition(7), "grp",
      col("cents"), k = 3.0).head()
    re shouldBe out
  }

  test("cuped: adjustment removes a pure covariate imbalance, matches " +
      "the scala recompute bit-for-bit, var(x)=0 yields NULL") {
    import org.apache.spark.sql.functions.col
    // y = x exactly; arm A drew bigger x's. Raw means differ by the
    // imbalance; CUPED with theta=1 removes it COMPLETELY: both
    // adjusted means collapse to the pooled mean.
    val units = ((1 to 50).map(i => ("A", 100L + i, 100L + i)) ++
      (1 to 50).map(i => ("B", i.toLong, i.toLong)))
      .toDF("arm", "x_cents", "y_cents")
    val out = Analyze.cuped(units, "arm", "x_cents", "y_cents")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(4), r.getDouble(5)))).toMap
    val rawGap = math.abs(out("A")._2 - out("B")._2)
    val adjGap = math.abs(out("A")._3 - out("B")._3)
    rawGap shouldBe 100.0 +- 1e-9
    adjGap should be < 1e-9 // theta = 1 exactly, imbalance fully removed
    // scala recompute of the same tree for arm A
    val xs = ((1 to 50).map(i => (100L + i, 100L + i)) ++
      (1 to 50).map(i => (i.toLong, i.toLong)))
    val (tn, tx, ty) = (xs.size.toLong, xs.map(_._1).sum, xs.map(_._2).sum)
    val txy = xs.map(p => p._1 * p._2).sum
    val txx = xs.map(p => p._1 * p._1).sum
    val varNum = txx.toDouble * tn.toDouble - tx.toDouble * tx.toDouble
    val theta = (txy.toDouble * tn.toDouble - tx.toDouble * ty.toDouble) /
      varNum
    val aX = (1 to 50).map(i => 100L + i)
    val meanYA = aX.sum.toDouble / 50.0
    val adjA = meanYA - theta * (aX.sum.toDouble / 50.0
      - tx.toDouble / tn.toDouble)
    java.lang.Double.doubleToLongBits(out("A")._3) shouldBe
      java.lang.Double.doubleToLongBits(adjA)
    // constant covariate: var(x) = 0 -> NULL adjusted means
    val const = Seq(("A", 5L, 10L), ("B", 5L, 20L))
      .toDF("arm", "x_cents", "y_cents")
    Analyze.cuped(const, "arm", "x_cents", "y_cents")
      .collect().forall(_.isNullAt(5)) shouldBe true
  }

  test("timeWeightedAverage: hand-computed holding-weighted mean, " +
      "single-observation NULL, per-key isolation, partition-invariant") {
    import org.apache.spark.sql.functions.col
    // key g: v=100 held 10us, v=200 held 30us, last v=300 holds 0
    //   num = 100*10 + 200*30 = 7000, dur = 40 -> twap 175.0
    // key h: one observation -> duration 0, twap NULL
    val rows = Seq(("g", 0L, 100L, 1L), ("g", 10L, 200L, 2L),
      ("g", 40L, 300L, 3L), ("h", 5L, 999L, 4L))
      .toDF("k", "t", "cents", "id")
    def run(df: org.apache.spark.sql.DataFrame) =
      Analyze.timeWeightedAverage(df, "k", "t", col("cents"),
          Seq(col("t"), col("id")))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    val out = run(rows)
    out("g") shouldBe ((3L, 40L, 7000L, Some(175.0)))
    out("h") shouldBe ((1L, 0L, 0L, None))
    run(rows.repartition(5)) shouldBe out
  }

  test("autocorrelation matches brute force on a seeded series; " +
      "period-4 series peaks at lag 4; partition-invariant") {
    val rnd = new scala.util.Random(7L)
    val xs = (0 until 40).map(i =>
      1000L + 500L * (i % 4) + rnd.nextInt(100).toLong)
    val n = xs.length.toLong
    val s = xs.sum
    val ys = xs.map(x => n * x - s)
    val den = ys.map(y => y * y).sum
    val expected = (1 to 7).map { k =>
      val num = (k until xs.length).map(t => ys(t) * ys(t - k)).sum
      k.toLong -> (((xs.length - k).toLong,
        Some(math.round(1e6 * (num.toDouble / den.toDouble)))))
    }.toMap
    val df = xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }
      .toDF("t", "x")
    def run(d: org.apache.spark.sql.DataFrame) =
      Analyze.autocorrelation(d, "t", "x", 7)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    val out = run(df)
    out shouldBe expected
    // the planted period-4 signal dominates: lag 4 strongest, positive
    out(4L)._2.get should be > out(1L)._2.get
    out(4L)._2.get should be > 500000L
    run(df.repartition(9)) shouldBe out
  }

  test("burstiness: metronome = -1, bursty > 0, matches brute force, " +
      "single-gap users NULL, single-event users present with 0 gaps, " +
      "partition-invariant") {
    def us(s: Long) = s * 1000000L
    // user 1: metronome every 10s; user 2: bursts (1s,1s,1s, 3000s)x;
    // user 3: two events = one gap -> NULL; user 4: ONE event -> the
    // key must still appear, with (n_gaps=0, NULL, NULL, NULL)
    val rows =
      (0L to 10L).map(i => (1L, us(i * 10L))) ++
      (0L to 2L).flatMap(b => Seq(0L, 1L, 2L, 3L).map(i =>
        (2L, us(b * 3003L + i)))) ++
      Seq((3L, us(0L)), (3L, us(100L))) ++
      Seq((4L, us(7L)))
    def optL(r: org.apache.spark.sql.Row, i: Int) =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    def run(parts: Int) =
      Analyze.burstiness(rows.toDF("user_id", "tsus").repartition(parts),
          "user_id", col("tsus"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), optL(r, 2), optL(r, 3), optL(r, 4)))).toMap
    val out = run(5)
    out.keySet shouldBe Set(1L, 2L, 3L, 4L)
    out(1L)._4 shouldBe Some(-1000000L)
    out(3L)._4 shouldBe None
    out(4L) shouldBe ((0L, None, None, None))
    // brute force for user 2
    val gaps = rows.filter(_._1 == 2L).map(_._2).sorted
      .sliding(2).map(p => (p(1) - p(0)) / 1000000L).toSeq
    val n = gaps.length.toDouble
    val mu = gaps.sum / n
    val sg = math.sqrt((n * gaps.map(g => g * g).sum
      - gaps.sum.toDouble * gaps.sum.toDouble) / (n * n))
    out(2L)._4 shouldBe Some(math.round(1e6 * ((sg - mu) / (sg + mu))))
    out(2L)._4.get should be > 300000L // clearly bursty (B ≈ 0.36)
    run(2) shouldBe out
  }

  test("hhi: monopoly = 1.0, k equal units = 1/k, matches brute " +
      "force with 128-bit squares, partition-invariant") {
    def run(rows: Seq[(String, Long, Long)], parts: Int) =
      Analyze.hhi(rows.toDF("g", "u", "c").repartition(parts),
          "g", "u", col("c"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    val rows = Seq(("mono", 1L, 500L)) ++
      (1L to 4L).map(u => ("quad", u, 250L)) ++
      Seq(("skew", 1L, 900L), ("skew", 2L, 100L)) ++
      // unit totals needing the cross-row sum first
      Seq(("skew", 1L, 0L))
    val out = run(rows, 5)
    out("mono") shouldBe ((1L, 500L, Some(1000000L)))
    out("quad") shouldBe ((4L, 1000L, Some(250000L)))
    // skew: shares 0.9/0.1 -> 0.81 + 0.01 = 0.82
    out("skew") shouldBe ((2L, 1000L, Some(820000L)))
    run(rows, 2) shouldBe out
    // 128-bit check: values whose squares overflow BIGINT
    val big = Seq(("b", 1L, 4000000000L), ("b", 2L, 6000000000L))
    val r = run(big, 2)("b")
    r._2 shouldBe 10000000000L
    // shares 0.4/0.6 -> 0.16+0.36 = 0.52
    r._3 shouldBe Some(520000L)
  }

  test("lorenzDeciles: known shares on a planted ramp, 10 balanced " +
      "deciles, zero total = NULL shares, partition-invariant") {
    // 100 rows, value = rank: decile d holds ranks (10d-9..10d),
    // sum = 100d - 45, total = 5050
    val rows = (1L to 100L).map(k => (k, k))
    def run(parts: Int) =
      Analyze.lorenzDeciles(rows.toDF("k", "x").repartition(parts),
          "k", col("x"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    val out = run(5)
    out.keySet shouldBe (1L to 10L).toSet
    (1L to 10L).foreach { d =>
      val cents = 100L * d - 45L
      out(d) shouldBe ((10L, cents, Some(cents * 1000000L / 5050L)))
    }
    run(3) shouldBe out
    val zero = (1L to 20L).map(k => (k, 0L))
    Analyze.lorenzDeciles(zero.toDF("k", "x"), "k", col("x"))
      .collect().foreach(_.isNullAt(3) shouldBe true)
  }

  test("gini: uniform = 0, one-holder extreme, matches brute force, " +
      "tie-invariant across partitionings, zero total = NULL") {
    def run(rows: Seq[(Long, Long)], parts: Int) = {
      val r = Analyze.gini(rows.toDF("k", "x").repartition(parts), "k",
        col("x")).collect()(0)
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }
    // perfectly equal: G = 0
    run((1L to 20L).map(k => (k, 50L)), 4) shouldBe
      ((20L, 1000L, Some(0L)))
    // one holder of everything: G = (n-1)/n = 0.9
    val one = (1L to 9L).map(k => (k, 0L)) :+ ((10L, 1000L))
    run(one, 3) shouldBe ((10L, 1000L, Some(900000L)))
    // brute force on seeded skewed data (with heavy ties)
    val rnd = new scala.util.Random(23L)
    val rows = (1L to 100L).map(k =>
      (k, (math.pow(rnd.nextDouble(), 3) * 1000).toLong))
    val xs = rows.map(_._2).sorted
    val n = xs.length.toLong
    val total = xs.sum
    val six = xs.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val exp = math.round(1e6 * ((2 * six - (n + 1) * total).toDouble
      / (n * total).toDouble))
    run(rows, 7) shouldBe ((n, total, Some(exp)))
    run(rows, 2) shouldBe ((n, total, Some(exp)))
    run(Seq((1L, 0L), (2L, 0L)), 2)._3 shouldBe None
  }

  test("cohenKappa: perfect agreement = 1.0, independence ~ 0, " +
      "constant rater = NULL, matches hand arithmetic") {
    def run(rows: Seq[(Boolean, Boolean)]) = {
      val r = Analyze.cohenKappa(rows.toDF("a", "b").repartition(5),
        col("a"), col("b")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))
    }
    val perfect = Seq.fill(30)((true, true)) ++ Seq.fill(20)((false, false))
    run(perfect) shouldBe ((50L, 30L, 0L, 0L, 20L, Some(1000000L)))
    // hand case: n11=20 n10=10 n01=10 n00=10; n=50
    // pe = 30*30 + 20*20 = 1300; num = 50*30-1300 = 200; den = 2500-1300
    val hand = Seq.fill(20)((true, true)) ++ Seq.fill(10)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(10)((false, false))
    run(hand) shouldBe ((50L, 20L, 10L, 10L, 10L,
      Some(math.round(1e6 * 200.0 / 1200.0))))
    // degenerate: both raters constant-true -> pe = n² -> NULL
    run(Seq.fill(10)((true, true)))._6 shouldBe None
  }

  test("spearman: monotone = 1.0, reversed = -1.0, matches brute " +
      "force on noisy data, partition-invariant") {
    def run(rows: Seq[(Long, Long, Long)], parts: Int) = {
      val r = Analyze.spearman(
        rows.toDF("k", "x", "y").repartition(parts), "k",
        col("x"), col("y")).collect()(0)
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }
    val mono = (1L to 50L).map(i => (i, i * 3L, i * i))
    run(mono, 4) shouldBe ((50L, 0L, Some(1000000L)))
    val rev = (1L to 50L).map(i => (i, i, 100L - i))
    run(rev, 4)._3 shouldBe Some(-1000000L)

    val rnd = new scala.util.Random(17L)
    val noisy = (1L to 200L).map(i =>
      (i, i + rnd.nextInt(40).toLong, i + rnd.nextInt(40).toLong))
    // brute force with the same (value, key) tie-break
    val n = noisy.length.toLong
    def ranks(f: ((Long, Long, Long)) => Long): Map[Long, Long] =
      noisy.sortBy(r => (f(r), r._1)).zipWithIndex
        .map { case (r, i) => r._1 -> (i + 1L) }.toMap
    val (rx, ry) = (ranks(_._2), ranks(_._3))
    val sd2 = noisy.map(r => { val d = rx(r._1) - ry(r._1); d * d }).sum
    val rho = math.round(1e6 * (1.0 - 6.0 * sd2.toDouble
      / (n.toDouble * (n.toDouble * n.toDouble - 1.0))))
    val out = run(noisy, 7)
    out shouldBe ((n, sd2, Some(rho)))
    out._3.get should be > 700000L // the planted monotone signal
    run(noisy, 3) shouldBe out
  }

  test("ksTwoSample matches brute force on seeded samples; " +
      "identical samples give D = 0; empty side gives NULL") {
    val rnd = new scala.util.Random(11L)
    // sample A uniform-ish on [0,100), B shifted to [20,120)
    val rows = (0 until 300).map(_ => (true, rnd.nextInt(100).toLong)) ++
      (0 until 200).map(_ => (false, 20L + rnd.nextInt(100).toLong))
    val (as, bs) = (rows.filter(_._1).map(_._2), rows.filterNot(_._1).map(_._2))
    val n1 = as.length.toLong
    val n2 = bs.length.toLong
    val dExp = rows.map(_._2).distinct.map { x =>
      math.abs(as.count(_ <= x) * n2 - bs.count(_ <= x) * n1)
    }.max
    val df = rnd.shuffle(rows).toDF("a", "x").repartition(7)
    val out = Analyze.ksTwoSample(df, col("a"), col("x")).collect()
    out.length shouldBe 1
    out(0).getLong(0) shouldBe n1
    out(0).getLong(1) shouldBe n2
    out(0).getLong(2) shouldBe dExp
    out(0).getLong(3) shouldBe
      math.round(1e6 * (dExp.toDouble / (n1 * n2).toDouble))
    // the planted +20 shift must register strongly
    out(0).getLong(3) should be > 150000L

    val same = (0 until 50).flatMap(i =>
      Seq((true, (i % 7).toLong), (false, (i % 7).toLong))).toDF("a", "x")
    Analyze.ksTwoSample(same, col("a"), col("x"))
      .collect()(0).getLong(3) shouldBe 0L

    val oneSided = (0 until 10).map(i => (true, i.toLong)).toDF("a", "x")
    Analyze.ksTwoSample(oneSided, col("a"), col("x"))
      .collect()(0).isNullAt(3) shouldBe true
  }

  test("cusumChangepoint dates a planted level shift; matches brute " +
      "force; constant series yields NULLs; partition-invariant") {
    val rnd = new scala.util.Random(3L)
    // level 100±5 for t<20, level 140±5 after — break between 19 and 20
    val xs = (0 until 40).map(i =>
      (if (i < 20) 100L else 140L) + rnd.nextInt(11).toLong - 5L)
    val n = xs.length.toLong
    val s = xs.sum
    val ys = xs.map(x => n * x - s)
    val cs = ys.scanLeft(0L)(_ + _).drop(1)
    val sMax = cs.map(math.abs).max
    val cpExp = cs.indexWhere(c => math.abs(c) == sMax).toLong
    val sumAbs = ys.map(math.abs).sum
    val df = rnd.shuffle(xs.zipWithIndex.map { case (x, t) => (t.toLong, x) })
      .toDF("t", "x")
    def run(d: org.apache.spark.sql.DataFrame) = {
      val r = Analyze.cusumChangepoint(d, "t", "x").collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }
    val out = run(df.repartition(6))
    out shouldBe ((n, cpExp, sMax,
      sumAbs, math.floor(sMax.toDouble * 1e6 / sumAbs.toDouble).toLong))
    out._2 shouldBe 19L // the CUSUM peak sits on the last pre-break point
    run(df.repartition(3)) shouldBe out

    val const = (0 until 12).map(t => (t.toLong, 7L)).toDF("t", "x")
    val r = Analyze.cusumChangepoint(const, "t", "x").collect()(0)
    r.getLong(0) shouldBe 12L
    r.isNullAt(1) shouldBe true
    r.getLong(2) shouldBe 0L
    r.isNullAt(4) shouldBe true
  }

  test("autocorrelation: zero-variance series yields NULL acf") {
    val df = (0 until 10).map(t => (t.toLong, 42L)).toDF("t", "x")
    val out = Analyze.autocorrelation(df, "t", "x", 3)
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    out shouldBe Map(1L -> true, 2L -> true, 3L -> true)
  }
  test("kAnonymity: class sizes, l-diversity, and both flags hand-checked") {
    val df = Seq(
      ("us", "A", 1), ("us", "A", 1), ("us", "A", 2), // size 3, l=2
      ("us", "B", 5),                                 // size 1, l=1
      ("de", "A", 1), ("de", "A", 1)                  // size 2, l=1
    ).toDF("country", "seg", "sens")
    val out = Analyze.kAnonymity(df, Seq("country", "seg"), "sens",
        k = 2, l = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    out(("us", "A")) shouldBe ((3L, 2L, true, true))
    out(("us", "B")) shouldBe ((1L, 1L, false, false))
    out(("de", "A")) shouldBe ((2L, 1L, true, false))
  }

}
