package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Analyze, EntityResolution, Funnel, Graph, LinearModel}

/** Scale-up probe for the round-11e additions (dev tool): replicates
  * sf0.1 tables K× with re-keyed ids and times association rules,
  * entity resolution, BFS distances, attribution and the k-fold CV
  * trainer. Same method as [[R11dProbe]].
  *
  * Expected shapes: association rules ~linear (re-keyed baskets stay
  * basket-sized, so the self-join fan-out is Σ|basket|² per copy);
  * entity resolution ~linear (8× blocks of the same size); BFS
  * ~linear in edges (K disjoint graph copies, rounds fixed);
  * attribution ~linear (per-user event lists unchanged); CV training
  * scans K× mass through the same 3-model grouped aggregate per
  * round. */
object R11eProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/graft_r11e_x$k"
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
    replicate("customer", "c_custkey" -> 1000000L)
      .write.mode("overwrite").parquet(s"$dst/customer.parquet")
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

    time("assoc_rules_s2") { dir =>
      Analyze.associationRules(
        spark.read.parquet(s"$dir/lineitem.parquet"),
        "l_orderkey", "l_partkey", minSupport = 2L).count()
    }
    time("entity_resolution") { dir =>
      val c = spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_name"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_mktsegment"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      val dup = c.filter(pmod(col("c_custkey"), lit(17)) === 0)
        .select((col("c_custkey") + lit(100000000L)).as("c_custkey"),
          upper(col("c_name")).as("c_name"), col("c_nationkey"),
          col("c_mktsegment"), (col("bal_cents") + lit(50L)).as("bal_cents"))
      val recs = c.unionByName(dup)
        .withColumn("block", concat(col("c_nationkey"), lit("|"),
          floor(col("bal_cents").cast("double") / lit(10000.0))
            .cast("long")))
      EntityResolution.fellegiSunter(recs, "c_custkey", "block", Seq(
          EntityResolution.FieldRule("name_ci", "c_name",
            (a, b) => lower(a) === lower(b), 2000000L, -2000000L),
          EntityResolution.FieldRule("segment", "c_mktsegment",
            (a, b) => a === b, 500000L, -500000L),
          EntityResolution.FieldRule("balance", "bal_cents",
            (a, b) => abs(a - b) <= 100L, 1500000L, -1000000L)),
        3000000L).count()
    }
    time("bfs_4hops") { dir =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      val adj = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey").as("src"),
          lead(col("l_partkey"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull && col("src") =!= col("dst"))
      val und = adj.unionByName(
        adj.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = spark.read.parquet(s"$dir/part.parquet")
        .filter(pmod(col("p_partkey"), lit(500)) === 0)
        .select(col("p_partkey"))
      Graph.bfsDistances(und, "src", "dst", seeds, "p_partkey", 4).count()
    }
    time("attribution_6h") { dir =>
      Funnel.linearAttribution(
        events(dir).select(col("user_id"), col("event_type"),
          col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("value")),
        "user_id", "purchase", "click", "ts_us", "event_id",
        round(col("value") * 100).cast("long"),
        windowUs = 6L * 3600L * 1000000L).count()
    }
    time("quality_cv_3fold") { dir =>
      val folds = 3
      val feat = LinearModel.qualityTrainingFrame(
          spark.read.parquet(s"$dir/documents.parquet"))
        .withColumn("fold", pmod(
          conv(substring(md5(concat(lit("cv:"),
            col("doc_id").cast("string"))), 1, 14), 16, 10).cast("long"),
          lit(folds.toLong)))
      val replicated = feat
        .withColumn("model_f", explode(array((0 until folds)
          .map(i => lit(i.toLong)): _*)))
        .filter(col("model_f") =!= col("fold"))
        .withColumn("model", concat(lit("m"), col("model_f")))
      LinearModel.trainFastSigmoidGDGrouped(replicated, "model",
        LinearModel.qualityFeatureCols, "y", lr = 4.0, iterations = 8)
        .count()
    }
    spark.stop()
  }
}
