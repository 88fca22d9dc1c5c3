package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Cluster, Dedup, Graph, Sketch, TextAnalysis}

/** Scale-up probe for the round-8 additions (dev tool): replicates
  * documents and lineitem K× with re-keyed ids, then times PageRank,
  * bigram LM scoring, Bloom decontamination, and count-min at 1× and
  * K×. Companion to [[ScaleProbe]] — same method, newer operators.
  *
  * Expected shapes: PageRank wall ~linear in edges (K disjoint
  * subgraph copies; every iteration is edge-keyed joins + dst
  * aggregates). Bigram ~linear in tokens (vocab and bigram tables
  * grow sublinearly on replicated text — replicas share the
  * vocabulary). Bloom probe ~linear in train shingles with a FIXED
  * filter broadcast. CMS build ~linear scan with constant d·w state.
  */
object NewOpsProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/graft_newops_x$k"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(name: String, idSteps: (String, Long)*): DataFrame = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until k).map(i =>
        idSteps.foldLeft(base) { case (df, (c, step)) =>
          df.withColumn(c, col(c) + lit(i * step))
        }).reduce(_ union _)
    }
    replicate("documents", "doc_id" -> 1000000L)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    replicate("embeddings", "vec_id" -> 1000000L)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    // l_partkey offset too: K disjoint copies of the co-purchase graph
    replicate("lineitem", "l_orderkey" -> 100000000L, "l_partkey" -> 10000000L)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

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

    time("pagerank_5it") { dir =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      val edges = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey").as("src"),
          lead(col("l_partkey"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      // aggregate over the rank column so nothing prunes the loop
      Graph.pageRank(edges, "src", "dst", "w", iterations = 5)
        .agg(sum(col("rank_micro"))).head().getLong(0)
    }
    time("triangle_count") { dir =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      val edges = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey").as("src"),
          lead(col("l_partkey"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
      Graph.triangleCounts(edges, "src", "dst")
        .agg(sum(col("n_triangles"))).head().getLong(0)
    }
    time("bigram_logprob") { dir =>
      TextAnalysis.bigramLogProb(
          spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
        .agg(sum(col("logprob_micros"))).head().getLong(0)
    }
    // eval set FIXED (doc_id < 1M keeps it 1x), train side grows Kx —
    // the filter build is constant, the probe scan is the moving part
    time("bloom_decontaminate") { dir =>
      val d = spark.read.parquet(s"$dir/documents.parquet")
      def sh(docs: DataFrame) = docs.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 3)).as("shingle")).distinct()
      val evalSh = sh(d.filter(col("doc_id") % 97 === 0 && col("doc_id") < 1000000L))
        .select("shingle").distinct()
      val bloom = Sketch.bloomBuild(evalSh, "shingle", 1024, 3, "bloom")
      Sketch.bloomMightContain(bloom, sh(d.filter(col("doc_id") % 97 =!= 0)),
          "shingle", 1024, 3, "bloom")
        .filter(col("maybe")).count()
    }
    time("kmeans_k4_3it") { dir =>
      Cluster.kmeansMicro(spark.read.parquet(s"$dir/embeddings.parquet"),
          "vec_id", "embedding", k = 4, iterations = 3)
        .agg(sum(col("dist2_q")) + sum(col("cell"))).head().getLong(0)
    }
    // RAW replicated corpus: every doc has K identical copies, so the
    // prefix join pays the documented quadratic identical-cluster mass
    // (the same hole minhash_neardup's uncapped row prices)
    time("prefix_jaccard_raw") { dir =>
      Dedup.prefixJaccardPairs(spark.read.parquet(s"$dir/documents.parquet"),
          "text", "doc_id", shingleSize = 3, tauNum = 4, tauDen = 5)
        .count()
    }
    // the documented composition: exact-dup collapse FIRST, then the
    // similarity join — replica mass disappears linearly upstream
    time("prefix_jaccard_deduped") { dir =>
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val keep = Dedup.exactDuplicates(d, "text", "doc_id")
        .select(col("keep_id").as("doc_id"))
      Dedup.prefixJaccardPairs(d.join(keep, Seq("doc_id")),
          "text", "doc_id", shingleSize = 3, tauNum = 4, tauDen = 5)
        .count()
    }
    // exact per-group percentile (full per-group sort) vs the q109
    // bottom-k hash sample (bounded state) — the profiling trade
    time("quantiles_exact") { dir =>
      spark.read.parquet(s"$dir/documents.parquet")
        .groupBy("source")
        .agg(expr("percentile(n_chars, 0.5)").as("p50"),
          expr("percentile(n_chars, 0.9)").as("p90"))
        .agg(sum(col("p50") + col("p90"))).head().getDouble(0).toLong
    }
    time("quantiles_sample8") { dir =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(md5(concat(lit("qs:"), col("doc_id").cast("string"))))
      spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 8)
        .groupBy("source")
        .agg(expr("percentile(n_chars, 0.5)").as("p50"),
          expr("percentile(n_chars, 0.9)").as("p90"))
        .agg(sum(col("p50") + col("p90"))).head().getDouble(0).toLong
    }
    time("countmin_build_probe") { dir =>
      val freq = TextAnalysis.tokenCounts(
          spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
        .groupBy(col("__tok").as("tok")).agg(sum(col("__c")).as("f"))
      val sk = Sketch.countMinBuild(freq, "tok", "f", 4, 16, "cms")
      Sketch.countMinEstimate(sk, freq, "tok", 4, 16, "cms")
        .agg(sum(col("est"))).head().getLong(0)
    }
    // Round-9 additions:
    // - PMI: replicas share the vocabulary, so the bigram/unigram
    //   count tables grow sublinearly — expect bigram-LM-like walls
    //   (the scan is the only growing term).
    // - diversity: posexplode projection + (shard, dim)-combined
    //   aggregate — map-side state is shards*dims cells per task,
    //   expect ~linear scan wall.
    // - containment: jaccardOnPairs machinery on a FIXED pair list —
    //   the pair join probes a growing build side but output is
    //   constant; expect ~flat.
    time("pmi_collocations") { dir =>
      TextAnalysis.pmiCollocations(
          spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
          minCount = 5L, topK = 50)
        .agg(sum(col("pmi_micro"))).head().getLong(0)
    }
    time("shard_diversity") { dir =>
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), pmod(col("vec_id"), lit(8L)).as("shard"),
          col("embedding"))
      val q = e.select(col("shard"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("shard"), col("dim"),
          round(col("x") * 1048576).cast("long").as("qx"))
      q.groupBy("shard", "dim")
        .agg(sum(col("qx")).as("s_d"), sum(col("qx") * col("qx")).as("ss_d"))
        .groupBy("shard")
        .agg((sum(col("ss_d")) - sum(col("s_d"))).as("m"))
        .agg(sum(col("m"))).head().getLong(0)
    }
    time("containment_fixed_pairs") { dir =>
      import spark.implicits._
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val pairs = (0L until 40L).map(i => (i, i + 40L)).toDF("id_a", "id_b")
      Dedup.containmentOnPairs(pairs, docs, "text", "doc_id", 3)
        .agg(sum(col("n_inter"))).head().getLong(0)
    }
    // round-10 streaming hygiene ops. Expected shapes: the decon gate
    // is a stateless projection — wall ~linear in streamed docs with a
    // FIXED bit-array in the plan; bloom dedup state is shards×bits
    // whatever the stream length — wall ~linear, state flat (the
    // O(1)-state claim measured). The stagedDir cache is keyed by dir,
    // so 1× and K× each stage once.
    time("stream_decontaminate") { dir =>
      graft.streaming.StreamOps.runStreamingDecontaminateAvailableNow(
        spark, dir, numBits = 1024, numHashes = 3, salt = "probe_sd").count()
    }
    time("stream_bloom_dedup") { dir =>
      graft.streaming.StreamOps.runStreamingBloomDedupAvailableNow(
        spark, dir, numBits = 8192, numHashes = 3, salt = "probe_bd",
        shards = 8).count()
    }
    // independent-digest MinHash vs the KM preset: same banding, same
    // near-dup workload; the delta is the ceil(h/2)-digests-per-shingle
    // signature cost (the price of the 100%-recall preset), and both
    // should hold the bucket-blocked sublinear shape
    time("minhash_neardup_km") { dir =>
      Dedup.minhashNearDuplicates(
        spark.read.parquet(s"$dir/documents.parquet"), "text", "doc_id",
        jaccardThreshold = 0.8).count()
    }
    time("minhash_neardup_indep") { dir =>
      Dedup.minhashNearDuplicates(
        spark.read.parquet(s"$dir/documents.parquet"), "text", "doc_id",
        jaccardThreshold = 0.8, independentHashes = true).count()
    }
    // eval side pinned to the 1× table: benchmarks are FIXED — only
    // the train corpus grows — so the realistic scaling is linear in
    // train vectors against a constant broadcast
    time("semantic_decontaminate") { dir =>
      val train = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") % 97 =!= 0)
      val evalSet = spark.read.parquet(s"$src/embeddings.parquet")
        .filter(col("vec_id") % 97 === 0)
      graft.operators.Ann.bruteForceTopK(train, evalSet,
          "vec_id", "vec_id", "embedding", k = 1)
        .filter(col("score") >= 0.9).count()
    }
    spark.stop()
  }
}
