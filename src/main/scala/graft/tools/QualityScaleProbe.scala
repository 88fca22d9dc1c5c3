package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, LinearModel, Multimodal}

/** Scale-up probe for the round-11 additions (dev tool): replicates
  * documents K× with re-keyed ids, then times BPE train+encode, the
  * WAV codec featurizer, and the fast-sigmoid GD trainer/apply at 1×
  * and K×. Companion to [[NewOpsProbe]]/[[RetrievalScaleProbe]] —
  * same method, round-11 operators.
  *
  * Expected shapes: BPE encode ~linear in corpus words (the merge
  * table is parameter-sized and train pair-counts shrink per round;
  * replicated text shares the vocabulary, so train grows sublinearly
  * while encode carries the K× word mass). WAV featurize ~linear
  * (stateless projection, one codec handle per partition). GD train
  * ~linear per round (one map-side-combining aggregate each); apply
  * ~linear (pure codegen projection).
  */
object QualityScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/graft_quality_x$k"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$src/documents.parquet")
    (0 until k).map(i => base
        .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        // replica sources stay DISTINCT: the grouped-trainer probe
        // then fits k x 20 independent models over the k x corpus
        .withColumn("source", concat(col("source"), lit(s"_$i"))))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    def time(name: String)(f: String => Long): Unit = {
      def once(dir: String): Double = {
        val t0 = System.nanoTime(); val n = f(dir)
        val s = (System.nanoTime() - t0) / 1e9
        println(f"  $name%-24s ${dir.split('/').last}%-18s $s%7.2f s  rows=$n")
        s
      }
      val t1 = once(src)
      val tk = once(dst)
      println(f"  $name%-24s scaling: ${tk / t1}%.1fx wall for ${k}x data")
    }

    time("bpe_train8_encode") { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val merges = Bpe.trainMerges(docs, "text", iterations = 8,
        mergesPerAction = 16)
      Bpe.encodeStats(docs, "doc_id", "text", merges)
        .agg(sum(col("bpe_tokens"))).head().getLong(0)
    }
    time("wav_featurize") { dir =>
      val withWav = Multimodal.withPcmWavPayload(
        spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id")),
        "doc_id")
      Multimodal.wavFeaturesBatched(withWav, "payload")
        .agg(sum(col("sum_sq"))).head().getLong(0)
    }
    time("gd_train8") { dir =>
      val feat = LinearModel.qualityTrainingFrame(
        spark.read.parquet(s"$dir/documents.parquet"))
      val traj = LinearModel.trainFastSigmoidGD(feat,
        LinearModel.qualityFeatureCols, "y", lr = 4.0, iterations = 8)
      traj.last.nPosErr + traj.last.nNegErr
    }
    time("gd_train8_grouped") { dir =>
      val feat = LinearModel.qualityTrainingFrame(
        spark.read.parquet(s"$dir/documents.parquet"),
        keepCols = Seq("source"))
      LinearModel.trainFastSigmoidGDGrouped(feat, "source",
          LinearModel.qualityFeatureCols, "y", lr = 4.0, iterations = 8)
        .count()
    }
    time("gd_apply") { dir =>
      val feat = LinearModel.qualityTrainingFrame(
        spark.read.parquet(s"$dir/documents.parquet"))
      // weights fixed (trained once at 1x): apply is the moving part
      val w = Array(0.5, 1.0, -2.0, -2.0, -0.5, 1.5, 3.0)
      require(w.length == LinearModel.qualityFeatureCols.length)
      LinearModel.scoreLinear(feat, LinearModel.qualityFeatureCols, w)
        .agg(sum(col("pred"))).head().getLong(0)
    }
    spark.stop()
  }
}
