package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // planted power law: one hot key with 500 rows, 20 cold keys with
  // 5 rows each, plus a fact key absent from dim (inner join drops it)
  private def fact: DataFrame =
    ((1 to 500).map(i => ("hot", i.toLong)) ++
      (1 to 20).flatMap(k => (1 to 5).map(i => (s"c$k", (k * 100 + i).toLong))) ++
      (1 to 3).map(i => ("orphan", i.toLong)))
      .toDF("key", "v")

  private def dim: DataFrame =
    (Seq("hot" -> 1L) ++ (1 to 20).map(k => s"c$k" -> (k + 1).toLong) ++
      Seq("dimonly" -> 99L))
      .toDF("key", "w")

  private def canon(df: DataFrame): Seq[String] =
    df.select("key", "v", "w").collect()
      .map(r => s"${r.getString(0)}|${r.getLong(1)}|${r.getLong(2)}")
      .sorted.toSeq

  private val plain = canon(fact.join(dim, Seq("key")))

  test("skewEquiJoin equals the plain join exactly — mixed hot/cold, " +
      "all-cold, all-hot, many-to-many dim, partition-invariant") {
    val mixed = SkewJoin.skewEquiJoin(fact, dim, "key",
      hotThreshold = 100L, buckets = 4, saltOf = col("v"))
    assert(canon(mixed) == plain)
    // threshold above every key count: pure cold path
    val allCold = SkewJoin.skewEquiJoin(fact, dim, "key",
      hotThreshold = 1000000L, buckets = 4, saltOf = col("v"))
    assert(canon(allCold) == plain)
    // threshold 1: every key hot, pure salted path
    val allHot = SkewJoin.skewEquiJoin(fact, dim, "key",
      hotThreshold = 1L, buckets = 4, saltOf = col("v"))
    assert(canon(allHot) == plain)
    // many-to-many: duplicate dim rows multiply matches identically
    val dim2 = dim.unionByName(dim.filter(col("key") === "hot"))
    val m2 = SkewJoin.skewEquiJoin(fact, dim2, "key",
      hotThreshold = 100L, buckets = 3, saltOf = col("v"))
    assert(canon(m2) == canon(fact.join(dim2, Seq("key"))))
    // routing is independent of input partitioning
    val repart = SkewJoin.skewEquiJoin(fact.repartition(7), dim.repartition(3),
      "key", hotThreshold = 100L, buckets = 4, saltOf = col("v"))
    assert(canon(repart) == plain)
  }

  test("salted path spreads the hot key over buckets and survives " +
      "with auto-broadcast disabled") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = SkewJoin.skewEquiJoin(fact, dim, "key",
        hotThreshold = 100L, buckets = 4, saltOf = col("v"))
      assert(canon(out) == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // the salt really disperses: 500 hot rows land in all 4 buckets
    val spread = fact.filter(col("key") === "hot")
      .select(pmod(col("v"), lit(4L)).as("salt"))
      .groupBy("salt").count().collect()
    assert(spread.length == 4 && spread.forall(_.getLong(1) > 50))
  }

  test("fuzz: skewEquiJoin == plain join on random skewed frames " +
      "across thresholds and bucket counts (seeded)") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 8).foreach { _ =>
      val nKeys = 1 + rnd.nextInt(6)
      val f = (0 until nKeys).flatMap { k =>
        val mult = 1 + rnd.nextInt(40) // some keys hot, some cold
        (0 until mult).map(i => (s"k$k", rnd.nextLong() % 1000))
      }.toDF("key", "v")
      val dm = (0 until nKeys).filter(_ => rnd.nextBoolean())
        .flatMap(k => (0 to rnd.nextInt(2)).map(j => (s"k$k", k * 10L + j)))
        .toDF("key", "w")
      val thr = 1L + rnd.nextInt(30)
      val bk = 1 + rnd.nextInt(5)
      val expected = canon(f.join(dm, Seq("key")))
      val got = canon(SkewJoin.skewEquiJoin(f, dm, "key", thr, bk,
        saltOf = col("v")))
      assert(got == expected, s"thr=$thr buckets=$bk")
    }
  }
}
