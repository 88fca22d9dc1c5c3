package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.{FreqItemsAgg, FreqItemsBuffer}

class FreqItemsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("exact regime: capacity >= distinct count reproduces exact counts") {
    val buf = new FreqItemsBuffer(16)
    val stream = Seq("a", "b", "a", "c", "a", "b", "d")
    stream.foreach(buf.add(_, 1L))
    buf.sortedEntries.toSeq shouldBe Seq(("a", 3L), ("b", 2L), ("c", 1L), ("d", 1L))
  }

  test("approximate regime: lower bounds within N/(capacity+1); " +
      "heavy items guaranteed present") {
    val rnd = new scala.util.Random(11)
    val capacity = 8
    // skewed stream: few heavy tokens + a long tail of singletons
    val heavy = Seq.fill(400)(s"h${rnd.nextInt(3)}")
    val tail = (1 to 500).map(i => s"t$i")
    val stream = rnd.shuffle(heavy ++ tail)
    val n = stream.size
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val buf = new FreqItemsBuffer(capacity)
    stream.foreach(buf.add(_, 1L))
    val est = buf.sortedEntries.toMap
    val bound = n.toDouble / (capacity + 1)
    est.foreach { case (item, c) =>
      c should be <= truth(item)
      (truth(item) - c).toDouble should be <= bound
    }
    truth.filter(_._2 > bound).keys.foreach { h => est.keySet should contain(h) }
    buf.size should be <= capacity
  }

  test("merge preserves the additive-error contract across arbitrary splits") {
    val rnd = new scala.util.Random(23)
    val capacity = 8
    val stream = Seq.fill(600)(s"w${math.min(rnd.nextInt(40), rnd.nextInt(40))}")
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // split into 5 partitions, summarize each, merge pairwise
    val parts = stream.grouped(120).map { chunk =>
      val b = new FreqItemsBuffer(capacity)
      chunk.foreach(b.add(_, 1L))
      b
    }.toSeq
    val merged = parts.reduce { (a, b) => a.mergeFrom(b); a }
    val bound = stream.size.toDouble / (capacity + 1)
    merged.sortedEntries.foreach { case (item, c) =>
      c should be <= truth(item)
      (truth(item) - c).toDouble should be <= bound
    }
    merged.size should be <= capacity
  }

  test("DataFrame aggregate in the exact regime equals groupBy().count() " +
      "under multi-partition partial aggregation") {
    val words = Seq.tabulate(5000)(i => s"tok${i % 37}")
    val df = words.toDF("token").repartition(16)
    val viaAgg = df
      .agg(FreqItemsAgg.freqItems(col("token"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("token"), col("e.count").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaGroupBy = df.groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    viaAgg shouldBe viaGroupBy
  }
}
