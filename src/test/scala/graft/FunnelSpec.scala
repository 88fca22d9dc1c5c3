package graft

import org.scalatest.matchers.should.Matchers

import graft.operators.Funnel

class FunnelSpec extends SparkSpec with Matchers {
  import spark.implicits._

  // (user, ts, type) — ts as plain longs; the operator is time-type-generic
  private lazy val events = Seq(
    // u1 completes the funnel in order
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
    // u2 clicks BEFORE viewing (ignored), never clicks again
    (2L, 10L, "click"), (2L, 20L, "view"), (2L, 30L, "purchase"),
    // u3 views only
    (3L, 5L, "view"),
    // u4 purchases before clicking: purchase must not count
    (4L, 1L, "view"), (4L, 2L, "purchase"), (4L, 3L, "click"),
    // u5 never views (excluded entirely)
    (5L, 1L, "click"), (5L, 2L, "purchase"),
    // u6: equal timestamps are NOT strictly after
    (6L, 7L, "view"), (6L, 7L, "click"),
    // noise event type everywhere
    (1L, 1L, "error"), (3L, 1L, "error")
  ).toDF("user_id", "ts", "event_type")

  private lazy val out = Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
    .collect()
    .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)),
      Option(r.get(3)), r.getAs[Long]("stages_reached"))))
    .toMap

  test("stages must happen strictly in order; earliest qualifying times win") {
    out(1L) shouldBe ((Some(10L), Some(20L), Some(30L), 3L))
    out(2L) shouldBe ((Some(20L), None, None, 1L)) // pre-view click ignored
    out(3L) shouldBe ((Some(5L), None, None, 1L))
    out(4L) shouldBe ((Some(1L), Some(3L), None, 2L)) // purchase@2 < click@3
    out.contains(5L) shouldBe false                    // never entered stage 0
    out(6L) shouldBe ((Some(7L), None, None, 1L))      // equal ts not strictly after
  }

  test("a later out-of-order stage can still qualify on a second occurrence") {
    val ev = Seq(
      (9L, 1L, "view"), (9L, 2L, "purchase"), (9L, 3L, "click"),
      (9L, 4L, "purchase")).toDF("user_id", "ts", "event_type")
    val m = Funnel.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    m(9L) shouldBe Some(4L) // second purchase, after the click
  }

  test("is partition-invariant") {
    val repart = Funnel.funnel(events.repartition(11), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getAs[Long]("stages_reached"))))
      .toMap
    repart shouldBe out
  }

  test("transitionMatrix: exact pair counts per key, no cross-key " +
      "transitions, micro rows sum to ~1e6, partition-invariant") {
    import org.apache.spark.sql.functions.col
    // user 1: a a b a  -> (a,a) (a,b) (b,a); user 2: b a -> (b,a)
    val ev = Seq(
      (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "a"),
      (2L, 15L, "b"), (2L, 25L, "a")).toDF("k", "t", "e")
    val out = Funnel.transitionMatrix(ev, "k", "e", Seq(col("t")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    out.keySet shouldBe Set(("a", "a"), ("a", "b"), ("b", "a"))
    out(("a", "a")) shouldBe ((1L, 500000L))
    out(("a", "b")) shouldBe ((1L, 500000L))
    out(("b", "a")) shouldBe ((2L, 1000000L)) // user 1's b->a + user 2's
    // no transition bridges user 1's last event to user 2's first
    out.values.map(_._1).sum shouldBe 4L
    val re = Funnel.transitionMatrix(ev.repartition(5), "k", "e",
        Seq(col("t")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    re shouldBe out
  }
}
