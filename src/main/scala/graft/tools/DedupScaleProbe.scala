package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Deep scale ladder for the dedup tier (dev tool): replicates
  * documents K× (default 32 — past the 8× ladder every posture claim
  * was previously probed at) and times the four load-bearing dedup
  * paths at 1× and K×. The replicas are EXACT duplicates under new
  * ids, so every distinct text becomes a K-member clique — the
  * workload where hot-bucket caps, band-keyed shuffles, closure
  * round counts, and O(1) Bloom state face real pressure:
  *
  *  - capped KM-minhash near-dup (the production near-dup path):
  *    wall must stay ~linear — the cap bounds every replica bucket
  *  - independent-digest preset (q141): same cap, ⌈h/2⌉ digests —
  *    the recall-first preset must not regress past the KM wall
  *  - CC closure over capped pairs (q136's dominant stage): rounds
  *    must stay FLAT (components widen, diameter doesn't)
  *  - streaming Bloom dedup (q143): state is shards×numBits BITS
  *    whatever the doc count — wall tracks rows, never state
  *  - cooc embedding fit (q148's trainer): corpus-sized shuffles,
  *    vocab-sized state — the distributed-training scale claim
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 32
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/graft_dedup_scale_x$k"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!new java.io.File(s"$dst/documents.parquet/_SUCCESS").exists()) {
      val base = spark.read.parquet(s"$src/documents.parquet")
      (0 until k).map(i => base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    }

    def time(name: String)(f: String => Long): Unit = {
      def once(dir: String): Double = {
        val t0 = System.nanoTime(); val n = f(dir)
        val s = (System.nanoTime() - t0) / 1e9
        println(f"  $name%-24s ${dir.split('/').last}%-26s $s%7.2f s  rows=$n")
        s
      }
      val t1 = once(src)
      val tk = once(dst)
      println(f"  $name%-24s scaling: ${tk / t1}%.2fx wall for ${k}x data")
    }

    def docs(dir: String): DataFrame =
      spark.read.parquet(s"$dir/documents.parquet")

    // cap 6 < K: at 32x EVERY replica bucket exceeds the cap and is
    // dropped whole (rows -> 0) — this pair of rows measures the cap's
    // wall bound under maximum hot-bucket pressure, NOT recall (an
    // all-replicas corpus has no sub-cap clusters left to keep)
    time("minhash_km_capped") { dir =>
      Dedup.minhashNearDuplicates(docs(dir), "text", "doc_id",
        jaccardThreshold = 0.8, maxBucketSize = Some(6)).count()
    }
    time("minhash_indep_capped") { dir =>
      Dedup.minhashNearDuplicates(docs(dir), "text", "doc_id",
        jaccardThreshold = 0.8, maxBucketSize = Some(6),
        independentHashes = true).count()
    }
    // the PRODUCTION composition under the same pressure: collapse
    // exact duplicates to one representative (min id per text), then
    // the capped near-dup join — the K-replica flood must reduce to
    // ~the 1x pair set at ~the 1x join wall plus one linear scan
    time("minhash_collapsed") { dir =>
      Dedup.minhashNearDuplicates(docs(dir), "text", "doc_id",
        jaccardThreshold = 0.8, maxBucketSize = Some(6),
        collapseExact = true).count()
    }
    // closure pressure needs EDGES: cap sized above K so the replica
    // cliques survive banding and each distinct text becomes a
    // K-member component — rounds must stay flat while edge mass grows
    time("cc_closure_split") { dir =>
      val cap = if (dir == src) 6 else 2 * k
      val t0 = System.nanoTime()
      val pairs = Dedup.minhashNearDuplicates(docs(dir), "text", "doc_id",
        shingleSize = 3, numHashes = 8, rowsPerBand = 2,
        jaccardThreshold = 0.8, maxBucketSize = Some(cap)).cache()
      val np = pairs.count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n = Dedup.connectedComponents(pairs, "id_a", "id_b").count()
      val tCc = (System.nanoTime() - t1) / 1e9
      println(f"    pairs=$np%d ($tPairs%5.2f s)  " +
        f"cc rounds=${Dedup.lastCcRounds.get()}%d ($tCc%5.2f s)")
      pairs.unpersist()
      n
    }
    time("streaming_bloom") { dir =>
      graft.streaming.StreamOps.runStreamingBloomDedupAvailableNow(
        spark, dir, numBits = 1 << 20, numHashes = 4,
        salt = "probe", shards = 32).count()
    }
    time("cooc_fit") { dir =>
      graft.embed.CoocPowerEmbedder.fitVectors(
        docs(dir), "doc_id", "text", dim = 64, rounds = 2).count()
    }
    spark.stop()
  }
}
