package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Analyze, Graph, Sketch}

/** Round-11g scale probe: the q220–q227 wave at k× sf0.1 (default
  * 8×), same replication harness as R11fProbe. What each row
  * certifies at k×:
  *   - modularity: canonical-edge distinct + degree agg + two label
  *     joins carry the 8x edge mass.
  *   - assortativity: one degree-joined edge pass, four sums.
  *   - spearman / gini: the globalOrdinals range shuffle (two passes,
  *     one long per partition of driver state) at 8x rows.
  *   - hhi: two map-combined aggregates (128-bit square sums).
  *   - burstiness: key-partitioned lag window + grouped moments at
  *     8x users.
  */
object R11gProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/graft_r11g_x$k"
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
    replicate("documents", "doc_id" -> 1000000L)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    replicate("customer", "c_custkey" -> 1000000L)
      .write.mode("overwrite").parquet(s"$dst/customer.parquet")
    replicate("orders", "o_orderkey" -> 100000000L,
        "o_custkey" -> 1000000L)
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")
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

    def partChain(dir: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey").as("src"),
          lead(col("l_partkey"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull && col("src") =!= col("dst"))
    }

    time("modularity_lpa") { dir =>
      val e0 = partChain(dir)
      val edges = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      val labels = Graph.labelPropagation(edges, "src", "dst", rounds = 3)
      Graph.modularity(edges, "src", "dst", labels, "node", "label")
        .count()
    }
    time("assortativity") { dir =>
      Graph.degreeAssortativity(partChain(dir), "src", "dst").count()
    }
    time("spearman_600k") { dir =>
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(concat_ws(":", col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey")).as("k"),
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice") * 100).cast("long").as("y"))
      Analyze.spearman(li, "k", col("x"), col("y")).count()
    }
    time("gini_customers") { dir =>
      val spend = spark.read.parquet(s"$dir/orders.parquet")
        .groupBy(col("o_custkey").as("k"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
      val all = spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("k"))
        .join(spend, Seq("k"), "left")
        .select(col("k"), coalesce(col("x"), lit(0L)).as("x"))
      Analyze.gini(all, "k", col("x")).count()
    }
    time("hhi_by_part") { dir =>
      Analyze.hhi(spark.read.parquet(s"$dir/lineitem.parquet"),
        "l_returnflag", "l_partkey",
        round(col("l_extendedprice") * 100).cast("long")).count()
    }
    time("burstiness") { dir =>
      Analyze.burstiness(events(dir), "user_id", unix_micros(col("ts")))
        .count()
    }
    time("logbucket_agg_quant") { dir =>
      Sketch.logBucketQuantiles(
        events(dir).filter(round(col("value") * 100).cast("long") > 0),
        "event_type", round(col("value") * 100).cast("long"),
        Seq(500, 900, 990)).count()
    }
    spark.stop()
  }
}
