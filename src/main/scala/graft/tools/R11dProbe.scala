package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Analyze, Layout, SkewJoin, TextAnalysis}

/** Scale-up probe for the round-11d additions (dev tool): replicates
  * sf0.1 tables K× with re-keyed ids and times the skew-aware salted
  * join (against the plain join under the same planted skew), the
  * inverted-index build, the Pareto frontier, the content digest and
  * the Holt-Winters staging series. Same method as [[R11cProbe]].
  *
  * Expected shapes: skew join ~linear (the hot key's mass spreads
  * over `buckets` reducers; the census is a map-combined count);
  * inverted index ~linear in postings mass (per-term state grows
  * with df — the maxDf stopword cap is the bound, deliberately off
  * here because the synthetic vocabulary is 31 terms); frontier and
  * digest are pure scan + bounded aggregates; Holt-Winters state is
  * (period+2) doubles per key, so K× keys is K× state but the same
  * per-row work.
  */
object R11dProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/graft_r11d_x$k"
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
    replicate("lineitem", "l_orderkey" -> 100000000L)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    replicate("orders", "o_orderkey" -> 100000000L)
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")
    // events replicated by KEY (event_type gets a copy suffix, user
    // ids re-keyed): K× series for Holt-Winters, K× users for the
    // frontier, same series LENGTH per key
    locally {
      val base = graft.sources.EventsLoader.events(spark, src)
      (0 until k).map(i => base
          .withColumn("event_type", concat(col("event_type"), lit(s"_$i")))
          .withColumn("user_id", col("user_id") + lit(i * 1000000L))
          .withColumn("event_id", col("event_id") + lit(i * 100000000L)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dst/events.parquet")
    }

    def time(name: String)(f: String => Long): Unit = {
      // best of 2: the first run per operator pays JIT/codegen warm-up
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

    def skewFact(dir: String): DataFrame = {
      def sk(c: org.apache.spark.sql.Column) =
        when(pmod(c, lit(4)) =!= 0, lit(-1L))
          .otherwise(pmod(c, lit(97)).cast("long"))
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select(sk(col("l_orderkey")).as("skew_key"),
          col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    }
    def skewDim(dir: String): DataFrame = {
      def sk(c: org.apache.spark.sql.Column) =
        when(pmod(c, lit(4)) =!= 0, lit(-1L))
          .otherwise(pmod(c, lit(97)).cast("long"))
      spark.read.parquet(s"$dir/orders.parquet")
        .groupBy(sk(col("o_orderkey")).as("skew_key"))
        .agg(count(lit(1)).as("o_cnt"))
    }
    def aggOut(df: DataFrame): Long =
      df.groupBy("skew_key")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .agg(sum("sum_qty")).head().getLong(0)

    time("plain_join_skewed") { dir =>
      aggOut(skewFact(dir).join(skewDim(dir), Seq("skew_key")))
    }
    time("skew_join_salted_b8") { dir =>
      aggOut(SkewJoin.skewEquiJoin(skewFact(dir), skewDim(dir), "skew_key",
        hotThreshold = 1000L, buckets = 8,
        saltOf = col("l_orderkey") * lit(7) + col("l_linenumber")))
    }
    // apples-to-apples: the regime the operator exists for — a dim
    // too big to broadcast (simulated by disabling broadcast) and no
    // AQE skew rescue. The hot key's 75% mass lands on ONE reducer in
    // the plain shuffle join; the salted path spreads it 8 ways.
    def shuffleOnly[A](body: => A): A = {
      val conf = spark.conf
      val prevB = conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevS = conf.get("spark.sql.adaptive.skewJoin.enabled")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      try body finally {
        conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
        conf.set("spark.sql.adaptive.skewJoin.enabled", prevS)
      }
    }
    time("plain_shuffle_skewed") { dir =>
      shuffleOnly(aggOut(skewFact(dir).join(skewDim(dir), Seq("skew_key"))))
    }
    time("salted_shuffle_b8") { dir =>
      shuffleOnly(aggOut(SkewJoin.skewEquiJoin(skewFact(dir), skewDim(dir),
        "skew_key", hotThreshold = 1000L, buckets = 8,
        saltOf = col("l_orderkey") * lit(7) + col("l_linenumber"))))
    }
    time("inverted_index") { dir =>
      TextAnalysis.invertedIndex(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
        .agg(sum(length(col("postings")))).head().getLong(0)
    }
    time("pareto_frontier") { dir =>
      val ev = if (dir == src) graft.sources.EventsLoader.events(spark, dir)
               else spark.read.parquet(s"$dir/events.parquet")
      Analyze.paretoFrontier(
        ev.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("value") * 100).cast("long")).as("v")),
        "n", "v").count()
    }
    time("content_digest") { dir =>
      Layout.contentDigest(spark.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", nShards = 16).count()
    }
    time("holt_winters_hourly") { dir =>
      val ev = if (dir == src) graft.sources.EventsLoader.events(spark, dir)
               else spark.read.parquet(s"$dir/events.parquet")
      // batch twin of the q183 recursion cost: the hourly series build
      // + a per-key ordered pass (the streaming run adds only
      // state-store micro-batch overhead, constant per wave)
      val hourly = ev.groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(sum(round(col("value") * 100).cast("long")).cast("double").as("x"))
      hourly.count()
    }
    spark.stop()
  }
}
