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

  test("sequentialPatterns: interval logic equals brute-force subsequence " +
      "enumeration on seeded random streams") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(20260815L)
    val alphabet = Vector("a", "b", "c", "d")
    val rows = for {
      k <- 1L to 40L
      n = 1 + rnd.nextInt(15)
      i <- 1 to n
    } yield (k, i.toLong, alphabet(rnd.nextInt(alphabet.size)))
    val maxRank = 10
    val minSupport = 3L
    // brute force: per key, enumerate distinct ordered pairs/triples of
    // the first-maxRank prefix, then count keys per pattern
    val byKey = rows.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._3).take(maxRank).toVector)
    val pairCounts = byKey.values.toSeq
      .flatMap { s =>
        (for (i <- s.indices; j <- s.indices if i < j)
          yield (s(i), s(j))).distinct
      }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minSupport).toMap
    val tripleCounts = byKey.values.toSeq
      .flatMap { s =>
        (for (i <- s.indices; j <- s.indices; k <- s.indices
          if i < j && j < k) yield (s(i), s(j), s(k))).distinct
      }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minSupport).toMap
    val df = rows.toDF("k", "pos", "e")
    val out = Funnel.sequentialPatterns(df, "k", "e", Seq(col("pos")),
        maxRank = maxRank, minSupport = minSupport)
      .collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))) ->
        r.getLong(3)).toMap
    val gotPairs = out.collect { case ((t1, t2, None), n) => (t1, t2) -> n }
    val gotTriples = out.collect {
      case ((t1, t2, Some(t3)), n) => (t1, t2, t3) -> n }
    gotPairs.toMap shouldBe pairCounts
    gotTriples.toMap shouldBe tripleCounts
    // sanity: the stream actually exercised both pattern arities
    pairCounts should not be empty
    tripleCounts should not be empty
    // partition invariance
    val re = Funnel.sequentialPatterns(df.repartition(7), "k", "e",
        Seq(col("pos")), maxRank = maxRank, minSupport = minSupport)
      .collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))) ->
        r.getLong(3)).toMap
    re shouldBe out
  }

  test("sequentialPatterns: repeats need two occurrences, maxRank " +
      "truncates, gaps allowed") {
    import org.apache.spark.sql.functions.col
    // u1: b a b  -> (b,a) (a,b) (b,b) and triple (b,a,b)
    // u2: a x b  -> (a,x) (a,b) (x,b) + triple (a,x,b): gap-allowed
    // u3: a ... then b at rank 4 with maxRank=3: (a,b) NOT counted
    val ev = Seq(
      (1L, 1L, "b"), (1L, 2L, "a"), (1L, 3L, "b"),
      (2L, 1L, "a"), (2L, 2L, "x"), (2L, 3L, "b"),
      (3L, 1L, "a"), (3L, 2L, "c"), (3L, 3L, "c"), (3L, 4L, "b"))
      .toDF("k", "pos", "e")
    val out = Funnel.sequentialPatterns(ev, "k", "e", Seq(col("pos")),
        maxRank = 3, minSupport = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))) ->
        r.getLong(3)).toMap
    out(("b", "a", None)) shouldBe 1L
    out(("a", "b", None)) shouldBe 2L // u1 + u2; u3's b is past maxRank
    out(("b", "b", None)) shouldBe 1L // needs two occurrences
    out.contains(("a", "a", None)) shouldBe false // single occurrence
    out(("b", "a", Some("b"))) shouldBe 1L
    out(("a", "x", Some("b"))) shouldBe 1L
    out(("a", "c", Some("c"))) shouldBe 1L // u3's two c's both in rank
    out.contains(("a", "c", Some("b"))) shouldBe false // b truncated
  }

  test("linearAttribution: exact split with remainder to last touch, " +
      "window edges, orphans, zero leakage, partition-invariant") {
    import org.apache.spark.sql.functions.col
    // u1 purchase of 1000 at t=100 with 3 clicks in window (t=50,60,99;
    //   click at t=100 excluded: not strictly before; t=-1 outside)
    //   -> shares 333/333/334: first=333, last=334
    // u1 purchase of 7 at t=200, 1 click in window (t=150+...) -- all
    //   5 clicks of u1 in [200-100, 200)? window=100: t in [100,200):
    //   clicks at 100,150 -> k=2, share 3, last 4
    // u2 purchase with no clicks -> orphan
    val ev = Seq(
      (1L, "click", 1L, 50L, 0.0), (1L, "click", 2L, 60L, 0.0),
      (1L, "click", 3L, 99L, 0.0), (1L, "click", 4L, 100L, 0.0),
      (1L, "click", 5L, 150L, 0.0), (1L, "click", 6L, -1L, 0.0),
      (1L, "purchase", 7L, 100L, 10.0), // 1000 cents
      (1L, "purchase", 8L, 200L, 0.07), // 7 cents
      (2L, "purchase", 9L, 100L, 5.0),
      (2L, "view", 10L, 50L, 0.0))
      .toDF("user_id", "event_type", "event_id", "ts_us", "value")
    def run(df: org.apache.spark.sql.DataFrame) =
      Funnel.linearAttribution(df, "user_id", "purchase", "click",
          "ts_us", "event_id",
          org.apache.spark.sql.functions.round(col("value") * 100)
            .cast("long"), windowUs = 100L)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val out = run(ev)
    // u1: purchase7: window [0,100): clicks 50,60,99 -> k=3, share 333,
    //     last 1000-2*333=334. purchase8: window [100,200): clicks
    //     100,150 -> k=2, share 3, last 7-3=4
    out(1L) shouldBe ((2L, 2L, 0L, 5L, 1007L, 333L + 3L, 334L + 4L))
    // u2: orphan purchase, view is not a touch
    out(2L) shouldBe ((1L, 0L, 1L, 0L, 0L, 0L, 0L))
    run(ev.repartition(5)) shouldBe out
  }
}
