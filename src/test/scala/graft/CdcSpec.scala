package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.matchers.should.Matchers
import graft.operators.Cdc

class CdcSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
    .toDF("k", "st", "v")

  // k=1 updated; k=2 update then delete; k=3 delete then REINSERT;
  // k=5 fresh insert; k=4 untouched
  private val changes = Seq(
    (1L, 1L, "U", "a2", 11L),
    (2L, 1L, "U", "b2", 21L), (2L, 2L, "D", "", 0L),
    (3L, 1L, "D", "", 0L), (3L, 2L, "I", "c2", 33L),
    (5L, 1L, "I", "e", 50L))
    .toDF("k", "seq", "op", "st", "v")

  private def canon(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("last-writer-wins by seq: update, update-then-delete, " +
      "delete-then-reinsert, fresh insert, untouched base, " +
      "partition-invariant") {
    val out = canon(Cdc.applyChangelog(base, changes, "k", "seq", "op",
      Seq("st", "v")))
    out shouldBe Seq((1L, "a2", 11L), (3L, "c2", 33L), (4L, "d", 40L),
      (5L, "e", 50L))
    canon(Cdc.applyChangelog(base.repartition(5), changes.repartition(3),
      "k", "seq", "op", Seq("st", "v"))) shouldBe out
    // empty changelog is the identity
    canon(Cdc.applyChangelog(base, changes.filter($"k" < 0), "k", "seq",
      "op", Seq("st", "v"))) shouldBe canon(base)
  }

  test("maintainGroupedAgg == full recompute from the post-image, " +
      "groups reaching zero drop, new groups appear") {
    import org.apache.spark.sql.functions._
    def agg(df: DataFrame) = df.groupBy(col("st"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_cents"))
    def canonAgg(df: DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val incremental = Cdc.maintainGroupedAgg(agg(base), base, changes,
      "k", "seq", "op", "st", "v")
    val full = agg(Cdc.applyChangelog(base, changes, "k", "seq", "op",
      Seq("st", "v")))
    canonAgg(incremental) shouldBe canonAgg(full)
    // group "a" disappeared (its only key updated to st "a2"), "e" is new
    val groups = canonAgg(incremental).map(_._1)
    groups should contain("e")
    groups.contains("a") shouldBe false
    groups.contains("b") shouldBe false // deleted key's group had one row
  }

  test("fuzz: applyChangelog == a sequential per-key fold over the " +
      "seq-ordered ops (seeded random changelogs)") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 8).foreach { _ =>
      val keys = (1L to (2 + rnd.nextInt(8))).toSeq
      val baseRows = keys.filter(_ => rnd.nextBoolean())
        .map(k => (k, s"b$k", k * 10L))
      val changeRows = keys.flatMap { k =>
        (1 to rnd.nextInt(4)).map { seq =>
          val op = rnd.nextInt(3) match {
            case 0 => "I"; case 1 => "U"; case 2 => "D"
          }
          (k, seq.toLong, op, s"v$k-$seq", k * 100L + seq)
        }
      }
      // scala reference: fold ops in seq order on top of the base
      val state = scala.collection.mutable.Map.empty[Long, (String, Long)]
      baseRows.foreach { case (k, st, v) => state(k) = (st, v) }
      changeRows.sortBy(c => (c._1, c._2)).foreach {
        case (k, _, "D", _, _) => state.remove(k)
        case (k, _, _, st, v)  => state(k) = (st, v)
      }
      val expected = state.toSeq.map { case (k, (st, v)) => (k, st, v) }
        .sortBy(_._1)
      val got = Cdc.applyChangelog(
          baseRows.toDF("k", "st", "v"),
          changeRows.toDF("k", "seq", "op", "st", "v"),
          "k", "seq", "op", Seq("st", "v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      got shouldBe expected
    }
  }
}
