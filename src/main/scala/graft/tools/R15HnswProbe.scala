package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 HNSW-family scouting probe — the data for the go/no-go
  * decision on a graph-based ANN index (the one index family the
  * board lacks beside IVF-PQ).
  *
  * Measures, on the harness embeddings (sf0.1 by default):
  *   1. BUILD — the bounded-degree exact k-NN neighbor graph via the
  *      certified brute-force top-k join (the q25 shape), wall-clocked.
  *      This is the NSW/HNSW layer-0 build primitive; real HNSW builds
  *      incrementally, but a relational build is the only
  *      oracle-replayable form on this board.
  *   2. SEARCH — deterministic greedy BEAM search over that graph
  *      (entry = lowest vec_id, exact integer-micro L2, ties → lowest
  *      id, visited-set dedup), driver-replayed for the probe. Recall@5
  *      vs the exact top-5 for the q265 query set, plus HOP COUNTS —
  *      the number of expansion rounds until the beam stabilizes,
  *      which is exactly the number of unrolled CTE hops a DuckDB
  *      oracle would need (the q267 MATERIALIZED-chain discipline).
  *   3. The comparison point: q265/q273's measured residual IVF-PQ
  *      recall at the same operating scale (0.275 ADC / 0.365 rerank
  *      at sf0.1, from the pinned boards).
  *
  * The verdict this feeds: a greedy walk is certifiable only if the
  * oracle can replay every hop; hops × beam × degree joins is the
  * oracle cost. Report lands in PERF.md §hnsw-scout.
  */
object R15HnswProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val degree = if (args.length > 1) args(1).toInt else 8
    val beam = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * lit(1e6)).cast("long")).as("vq"))
      .cache()
    val n = e.count()

    // --- 1. BUILD: exact k-NN graph, bounded degree, certified shape
    val t0 = System.nanoTime()
    val d2 = expr("aggregate(zip_with(a.vq, b.vq, (x, y) -> (x - y) * (x - y)), 0L, (acc, d) -> acc + d)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("d2"), col("dst"))
    val knn = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        d2.as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= degree)
      .select("src", "dst")
    val adj = knn.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val buildSec = (System.nanoTime() - t0) / 1e9

    // --- 2. SEARCH: deterministic greedy beam, driver-replayed
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def dist(a: Array[Long], b: Array[Long]): BigInt = {
      var s = BigInt(0); var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += BigInt(d) * BigInt(d); i += 1 }
      s
    }
    val entry = vecs.keys.min
    val queries = vecs.keys.filter(_ % 50 == 0).toSeq.sorted
    val exactTop = queries.map { q =>
      q -> vecs.keys.toSeq.sortBy(c => (dist(vecs(q), vecs(c)), c)).take(5).toSet
    }.toMap
    var hopsTotal = 0
    var hopsMax = 0
    var hits = 0
    val t1 = System.nanoTime()
    queries.foreach { q =>
      val qv = vecs(q)
      var beamSet = List(entry).sortBy(c => (dist(qv, vecs(c)), c))
      var visited = Set(entry)
      var hops = 0
      var improved = true
      while (improved) {
        val frontier = beamSet.flatMap(adj.getOrElse(_, Array.empty[Long]))
          .distinct.filterNot(visited)
        visited ++= frontier
        val merged = (beamSet ++ frontier)
          .sortBy(c => (dist(qv, vecs(c)), c)).take(beam)
        improved = merged != beamSet && frontier.nonEmpty
        beamSet = merged
        if (improved) hops += 1
      }
      hopsTotal += hops
      hopsMax = math.max(hopsMax, hops)
      hits += beamSet.take(5).count(exactTop(q))
    }
    val searchSec = (System.nanoTime() - t1) / 1e9
    val recall = hits.toDouble / (queries.size * 5)

    println(s"""{"n":$n,"degree":$degree,"beam":$beam,""" +
      s""""build_sec":${f"$buildSec%.2f"},"search_sec":${f"$searchSec%.3f"},""" +
      s""""queries":${queries.size},"recall_at5":${f"$recall%.4f"},""" +
      s""""hops_mean":${f"${hopsTotal.toDouble / queries.size}%.2f"},"hops_max":$hopsMax}""")

    // --- 3. NN-DESCENT convergence (the scalable build path): start
    // from a deterministic hash-random degree-D graph, each round
    // replace every node's list with the top-D of
    // {current ∪ reverse ∪ neighbors-of-neighbors} by exact distance
    // — O(n·D²) candidates per round, relational by construction.
    // Measured per round: edge recall vs the exact k-NN graph and the
    // greedy-beam search recall over the descended graph.
    val ids = vecs.keys.toArray.sorted
    val exactAdj = adj // the brute-force graph from step 1
    def md5mix(a: Long, b: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"nnd:$a:$b".getBytes("UTF-8"))
      var v = 0L; var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v
    }
    var cur: Map[Long, Seq[Long]] = ids.map { s =>
      s -> ids.filter(_ != s).sortBy(c => (md5mix(s, c), c))
        .take(degree).toSeq
    }.toMap
    def searchRecall(g: Map[Long, Seq[Long]]): Double = {
      var h = 0
      queries.foreach { q =>
        val qv = vecs(q)
        var bs = List(entry).sortBy(c => (dist(qv, vecs(c)), c))
        var vis = Set(entry)
        var go = true
        while (go) {
          val fr = bs.flatMap(c => g.getOrElse(c, Seq.empty))
            .distinct.filterNot(vis)
          vis ++= fr
          val mg = (bs ++ fr).sortBy(c => (dist(qv, vecs(c)), c)).take(beam)
          go = mg != bs && fr.nonEmpty
          bs = mg
        }
        h += bs.take(5).count(exactTop(q))
      }
      h.toDouble / (queries.size * 5)
    }
    for (round <- 1 to 4) {
      val t = System.nanoTime()
      cur = ids.map { s =>
        val rev = ids.filter(o => cur(o).contains(s))
        val cand = (cur(s) ++ rev ++
          cur(s).flatMap(nb => cur(nb)) ++ rev.flatMap(nb => cur(nb)))
          .distinct.filter(_ != s)
        s -> cand.sortBy(c => (dist(vecs(s), vecs(c)), c)).take(degree).toSeq
      }.toMap
      val roundSec = (System.nanoTime() - t) / 1e9
      val edgeRecall = ids.map(s =>
        cur(s).count(exactAdj.getOrElse(s, Array.empty[Long]).toSet)
          .toDouble / degree).sum / ids.length
      println(s"""{"nnd_round":$round,"round_sec":${f"$roundSec%.2f"},""" +
        s""""edge_recall":${f"$edgeRecall%.4f"},""" +
        s""""search_recall_at5":${f"${searchRecall(cur)}%.4f"}}""")
    }
    spark.stop()
  }
}
