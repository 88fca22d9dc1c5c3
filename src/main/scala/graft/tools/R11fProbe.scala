package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Analyze, Graph, Sketch, TextAnalysis}

/** Round-11f scale probe: the q209–q219 analytics wave at k× sf0.1
  * (default 8×). Replication keeps per-order/per-doc structure and
  * shifts keys, so edge mass, token mass, and value mass all scale
  * by k while join keys stay disjoint across replicas — the same
  * harness as R11dProbe/R11eProbe.
  *
  * What each row certifies at k×:
  *   - link_prediction: wedge mass under the hub cap stays linear in
  *     edges (the cap is the contract, this measures its constant).
  *   - clustering_coeff: degree-ordered triangle join + degree agg.
  *   - personalized_pagerank: 4 rounds of edge join + combine.
  *   - token_drift: one map-combined token agg + broadcast totals +
  *     distributed top-k.
  *   - ks_drift: row mass → per-distinct-cents histogram (domain-
  *     bounded) → windowed ECDF; the reduction carries the scaling.
  *   - logbucket_quantiles: row mass → ≤90-cells-per-decade
  *     histogram; partial aggregation is the merge.
  */
object R11fProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/graft_r11f_x$k"
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
    replicate("lineitem", "l_orderkey" -> 100000000L,
        "l_partkey" -> 10000000L)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    replicate("part", "p_partkey" -> 10000000L)
      .write.mode("overwrite").parquet(s"$dst/part.parquet")
    replicate("documents", "doc_id" -> 1000000L)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    locally {
      val base = graft.sources.EventsLoader.events(spark, src)
      (0 until k).map(i => base
          .withColumn("user_id", col("user_id") + lit(i * 1000000L))
          .withColumn("event_id", col("event_id") + lit(i * 100000000L)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dst/events.parquet")
    }

    def time(name: String)(f: String => Long): Unit = {
      def once(dir: String): Double = {
        val walls = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); val n = f(dir)
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val (s, n) = walls.minBy(_._1)
        println(f"  $name%-24s ${dir.split('/').last}%-18s $s%7.2f s  rows=$n")
        s
      }
      val t1 = once(src)
      val tk = once(dst)
      println(f"  $name%-24s scaling: ${tk / t1}%.1fx wall for ${k}x data")
    }

    def events(dir: String): DataFrame =
      if (dir == src) graft.sources.EventsLoader.events(spark, dir)
      else spark.read.parquet(s"$dir/events.parquet")

    def partChain(dir: String, qtyMax: Option[Int]): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      qtyMax.map(q => li.filter(col("l_quantity") <= q)).getOrElse(li)
        .select(col("l_partkey").as("src"),
          lead(col("l_partkey"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
    }

    time("link_prediction") { dir =>
      Graph.linkPredictionRA(
        partChain(dir, Some(15)).filter(col("src") =!= col("dst")),
        "src", "dst", maxHubDeg = 24, minCommon = 2L).count()
    }
    time("clustering_coeff") { dir =>
      Graph.clusteringCoefficients(partChain(dir, None), "src", "dst")
        .agg(sum(col("n_triangles"))).head(); 1L
    }
    time("personalized_pagerank") { dir =>
      val edges = partChain(dir, None)
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      val seeds = spark.read.parquet(s"$dir/part.parquet")
        .filter(col("p_brand") === "Brand#4").select(col("p_partkey"))
      Graph.personalizedPageRank(edges, "src", "dst", "w",
        seeds, "p_partkey", iterations = 4).count()
    }
    time("token_drift") { dir =>
      TextAnalysis.tokenDrift(
        spark.read.parquet(s"$dir/documents.parquet"), "text",
        expr("CAST(substring(source, 4) AS BIGINT) < 10"),
        minCount = 5L, topK = 100).count()
    }
    time("ks_drift") { dir =>
      val ev = events(dir).select(
        floor(unix_micros(col("ts")).cast("double") / lit(86400000000.0))
          .cast("long").as("day"),
        round(col("value") * lit(100.0)).cast("long").as("cents"))
      val d0 = ev.agg(min(col("day")).as("__d0"))
      val sided = ev.crossJoin(broadcast(d0))
        .select((col("day") < col("__d0") + lit(15L)).as("__a"),
          col("cents"))
      Analyze.ksTwoSample(sided, col("__a"), col("cents")).count()
    }
    time("logbucket_quantiles") { dir =>
      Sketch.logBucketQuantiles(
        spark.read.parquet(s"$dir/lineitem.parquet"), "l_returnflag",
        round(col("l_extendedprice") * 100).cast("long"),
        Seq(500, 900, 990, 999)).count()
    }
    spark.stop()
  }
}
