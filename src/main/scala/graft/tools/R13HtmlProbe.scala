package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Extract

/** Round-13 scale probe: the HTML extraction family at k× sf0.1
  * (default 8×, doc_id-shifted replicas so the cross-doc frequency
  * rule sees k× the docs with the same boilerplate set). Expected
  * posture: parse + density rules are an embarrassingly parallel
  * projection (flat per-row cost, wall ~linear in bytes); the
  * frequency rule adds one block-text-keyed aggregate + anti join
  * (boilerplate set size is CONSTANT — site templates don't grow
  * with corpus size); the outlink domain rollup is one gram^W
  * domain-keyed aggregate. Nothing quadratic anywhere. */
object R13HtmlProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"))
    def repl = (0 until k).map(i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"))).reduce(_ unionAll _)
    val kDir = s"/tmp/graft_r13_html_x$k"
    repl.write.mode("overwrite").parquet(kDir)

    def html(dir: String): DataFrame = {
      val d = if (dir == src) base
        else spark.read.parquet(dir).select(col("doc_id"), col("text"))
      // the q234-q237 template, inlined (htmlCorpus is private[graft])
      d.select(col("doc_id"), concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style>p { color: red; }</style>" +
          "<script>if (x < 2 && y > \"a>b\") { tag = \"<div>\"; }</script>" +
          "</head><body><nav><a href=\"/h\">home</a> " +
          "<a href=\"/a\">about pages</a></nav><div>"), col("text"),
        lit("</div><p>this disclaimer paragraph repeats on every page " +
          "of the site</p><footer><a href=\"/t\">terms</a> " +
          "<a href=\"/p\">privacy</a> &copy; 2026</footer></body></html>"))
        .as("html"))
    }

    def time(name: String)(f: String => Long): Unit = {
      def once(dir: String): Double = {
        val walls = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); val n = f(dir)
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val (s, n) = walls.minBy(_._1)
        println(f"  $name%-24s ${dir.split('/').last}%-22s $s%7.2f s  rows=$n")
        s
      }
      val t1 = once(src)
      val tk = once(kDir)
      println(f"  $name%-24s scaling: ${tk / t1}%.1fx wall for ${k}x data")
    }

    time("q234 block report")(d =>
      Extract.blockReport(html(d), "doc_id", "html").count())
    time("q235 main content")(d =>
      // aggregate over main_text so pruning cannot drop the parse
      Extract.mainContent(html(d), "doc_id", "html")
        .agg(sum(length(col("main_text")))).head().getLong(0))
    time("q237 content + df rule")(d =>
      Extract.mainContentDf(html(d), "doc_id", "html")
        .agg(sum(length(col("main_text")))).head().getLong(0))
    time("q238 links")(d =>
      Extract.htmlLinks(html(d), "doc_id", "html").count())
    // q242 posture: REP parse once per domain (small join side),
    // longest-match fold per URL — expect flat per-URL cost
    time("q242 robots gate")(d => {
      val docs = if (d == src) base
        else spark.read.parquet(d).select(col("doc_id"), col("text"))
      val urls = docs.select(col("doc_id"),
        concat(lit("https://ex"), (col("doc_id") % 500).cast("string"),
          lit(".com/p"), (col("doc_id") % 7).cast("string")).as("url"))
      val robots = urls
        .select(graft.operators.UrlOps.registrableDomain(col("url"))
          .as("domain")).distinct()
        .select(col("domain"), concat(lit("User-agent: *\nDisallow: /p"),
          (length(col("domain")) % 7).cast("string"), lit("\nAllow: /p\n"))
          .as("robots_txt"))
      Extract.robotsGate(urls, "url", robots, "domain", "robots_txt",
          "graftbot")
        .filter(col("allowed")).count()
    })
    spark.stop()
  }
}
