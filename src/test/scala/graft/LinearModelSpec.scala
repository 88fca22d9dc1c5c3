package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.LinearModel

class LinearModelSpec extends SparkSpec with Matchers {
  import spark.implicits._

  // clear margin on both sides of the 0.82 alpha-ratio label
  private def toyDocs = Seq(
    (1L, "extraordinarily comprehensive documentation describing spectacular implementations thoroughly"),
    (2L, "1234 5678 90!! @@## $$%% ^^&& numbers and noise 99"),
    (3L, "wonderful straightforward paragraphs containing exclusively alphabetic vocabulary throughout everything"),
    (4L, "x"),
    (5L, "UPPERCASE ALPHABETIC DOCUMENTS REMAIN COMPLETELY ALPHABETIC REGARDLESS OBVIOUSLY"),
    (6L, "mixed 12 content 34 with 56 plenty 78 of 90 digits 11 interleaved 22 between 33 short 44 words"),
    (7L, "remarkably consistent linguistic material comprising lengthy dictionary entries exclusively"),
    (8L, "!!! ??? ... ;;; ::: --- symbols only mostly here now 123 456")
  ).toDF("doc_id", "text")

  test("training trajectory is partition-invariant (order-free integer " +
       "gradient sums)") {
    val base = LinearModel.qualityTrainingFrame(toyDocs)
    val a = LinearModel.trainFastSigmoidGD(base.repartition(1),
      LinearModel.qualityFeatureCols, "y", lr = 4.0, iterations = 5)
    val b = LinearModel.trainFastSigmoidGD(base.repartition(7),
      LinearModel.qualityFeatureCols, "y", lr = 4.0, iterations = 5)
    a.map(_.round) shouldBe b.map(_.round)
    a.zip(b).foreach { case (ra, rb) =>
      ra.nPosErr shouldBe rb.nPosErr
      ra.nNegErr shouldBe rb.nNegErr
      // bit-identical doubles, not approx equality
      ra.weights.map(java.lang.Double.doubleToLongBits) shouldBe
        rb.weights.map(java.lang.Double.doubleToLongBits)
    }
  }

  test("the classifier actually learns the label: final errors below the " +
       "all-positive round-1 baseline") {
    val feat = LinearModel.qualityTrainingFrame(toyDocs)
    val traj = LinearModel.trainFastSigmoidGD(feat,
      LinearModel.qualityFeatureCols, "y", lr = 4.0, iterations = 12)
    // round 1 scores with w = 0: z = 0 everywhere, pred = 1 for all
    val nNeg = feat.filter(col("y") === 0.0).count()
    traj.head.nPosErr shouldBe 0L
    traj.head.nNegErr shouldBe nNeg
    val lastErr = traj.last.nPosErr + traj.last.nNegErr
    lastErr should be < (traj.head.nPosErr + traj.head.nNegErr)
  }

  test("scoreLinear: pred is exactly the z >= 0 decision and matches " +
       "p >= 0.5; a pure projection (no shuffle)") {
    val feat = LinearModel.qualityTrainingFrame(toyDocs)
    val traj = LinearModel.trainFastSigmoidGD(feat,
      LinearModel.qualityFeatureCols, "y", lr = 4.0, iterations = 5)
    val scored = LinearModel.scoreLinear(feat,
      LinearModel.qualityFeatureCols, traj.last.weights)
    scored.collect().foreach { r =>
      val p = r.getAs[Double]("p")
      val pred = r.getAs[Long]("pred")
      pred shouldBe (if (p >= 0.5) 1L else 0L)
      p should (be >= 0.0 and be <= 1.0)
    }
    val plan = scored.queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("grouped training == independent per-group training, bit-for-bit") {
    val docs = toyDocs.withColumn("grp",
      when(col("doc_id") % 2 === 0, "even").otherwise("odd"))
    val feat = LinearModel.qualityTrainingFrame(docs, keepCols = Seq("grp"))
    val grouped = LinearModel.trainFastSigmoidGDGrouped(feat, "grp",
        LinearModel.qualityFeatureCols, "y", lr = 4.0, iterations = 4)
      .collect().map { r =>
        (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3),
            LinearModel.qualityFeatureCols.indices
              .map(j => java.lang.Double.doubleToLongBits(r.getDouble(4 + j))))
      }.toMap
    Seq("even", "odd").foreach { g =>
      val solo = LinearModel.trainFastSigmoidGD(
        feat.filter(col("grp") === g),
        LinearModel.qualityFeatureCols, "y", lr = 4.0, iterations = 4)
      solo.foreach { r =>
        grouped((g, r.round.toLong)) shouldBe
          ((r.nPosErr, r.nNegErr,
            r.weights.toIndexedSeq.map(java.lang.Double.doubleToLongBits)))
      }
    }
  }

  test("warm start transfers state exactly: 8 rounds then 4 warm == 12 straight") {
    val feat = LinearModel.qualityTrainingFrame(toyDocs)
    val straight = LinearModel.trainFastSigmoidGD(feat,
      LinearModel.qualityFeatureCols, "y", lr = 4.0, iterations = 12)
    val head = LinearModel.trainFastSigmoidGD(feat,
      LinearModel.qualityFeatureCols, "y", lr = 4.0, iterations = 8)
    val tail = LinearModel.trainFastSigmoidGD(feat,
      LinearModel.qualityFeatureCols, "y", lr = 4.0, iterations = 4,
      init = Some(head.last.weights))
    (head ++ tail).zip(straight).foreach { case (a, b) =>
      a.nPosErr shouldBe b.nPosErr
      a.nNegErr shouldBe b.nNegErr
      a.weights.map(java.lang.Double.doubleToLongBits) shouldBe
        b.weights.map(java.lang.Double.doubleToLongBits)
    }
  }

  test("k-fold replication training: model m (grouped over exploded " +
      "fold membership) == direct training on fold != m, bit-for-bit") {
    val folds = 3
    val feat = LinearModel.qualityTrainingFrame(toyDocs)
      .withColumn("fold", pmod(
        conv(substring(md5(concat(lit("cv:"), col("doc_id").cast("string"))),
          1, 14), 16, 10).cast("long"), lit(folds.toLong)))
    val replicated = feat
      .withColumn("model_f", explode(array((0 until folds)
        .map(i => lit(i.toLong)): _*)))
      .filter(col("model_f") =!= col("fold"))
      .withColumn("model", concat(lit("m"), col("model_f")))
    val grouped = LinearModel.trainFastSigmoidGDGrouped(replicated,
        "model", LinearModel.qualityFeatureCols, "y",
        lr = 4.0, iterations = 4)
      .filter(col("round") === 4)
      .collect()
      .map(r => r.getString(0) ->
        LinearModel.qualityFeatureCols.map(x =>
          java.lang.Double.doubleToLongBits(r.getAs[Double](s"w_$x"))))
      .toMap
    (0 until folds).foreach { m =>
      val direct = LinearModel.trainFastSigmoidGD(
        feat.filter(col("fold") =!= m.toLong),
        LinearModel.qualityFeatureCols, "y", lr = 4.0, iterations = 4)
        .last.weights.map(java.lang.Double.doubleToLongBits).toSeq
      grouped(s"m$m") shouldBe direct
    }
  }

  test("qualityCorpusTrajectory: memoized == fresh training bit-for-bit, second call serves the same value") {
    val dir = "/root/testdata/sf0.001"
    val fresh = LinearModel.trainFastSigmoidGD(
      LinearModel.qualityTrainingFrame(
        spark.read.parquet(s"$dir/documents.parquet")),
      LinearModel.qualityFeatureCols, "y", lr = 4.0, iterations = 8)
    val m1 = LinearModel.qualityCorpusTrajectory(spark, dir,
      lr = 4.0, iterations = 8)
    val m2 = LinearModel.qualityCorpusTrajectory(spark, dir,
      lr = 4.0, iterations = 8)
    (m2.asInstanceOf[AnyRef] eq m1.asInstanceOf[AnyRef]) shouldBe true
    m1.map(_.round) shouldBe fresh.map(_.round)
    m1.zip(fresh).foreach { case (ra, rb) =>
      ra.nPosErr shouldBe rb.nPosErr
      ra.nNegErr shouldBe rb.nNegErr
      ra.weights.map(java.lang.Double.doubleToLongBits) shouldBe
        rb.weights.map(java.lang.Double.doubleToLongBits)
    }
  }

  test("empty feature frame fails fast") {
    val feat = LinearModel.qualityTrainingFrame(toyDocs).filter(lit(false))
    an[IllegalArgumentException] should be thrownBy
      LinearModel.trainFastSigmoidGD(feat,
        LinearModel.qualityFeatureCols, "y", lr = 4.0, iterations = 2)
  }
}
