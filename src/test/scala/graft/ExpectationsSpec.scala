package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.operators.Expectations
import graft.operators.Expectations._

class ExpectationsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("every check type counts its planted violations exactly; " +
      "thresholds gate pass; one scan for all scalar checks") {
    val df = Seq(
      (1L, Some("a"), 5.0, "OK"),
      (2L, Some("b"), 50.0, "OK"),
      (2L, Some("c"), 500.0, "BAD"), // dup id, out-of-range hi
      (3L, None, -1.0, "OK"), // null name, out-of-range lo
      (4L, Some("e"), 10.0, "WARN"))
      .toDF("id", "name", "v", "status")
    val dim = Seq(1L, 2L, 3L).toDF("k") // id 4 is an orphan
    val out = Expectations.run(df, Seq(
        NotNull("name", thresholdMicros = 100000L), // 1/5 = 200000 > thr
        Unique("id"),
        InRange("v", 0.0, 100.0),
        AcceptedValues("status", Seq("OK", "WARN")),
        RefIntegrity("id", dim, "k")))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(5))))
      .toMap
    out("not_null:name") shouldBe ((1L, 5L, 200000L, false))
    out("unique:id") shouldBe ((1L, 5L, 200000L, false))
    out("range:v:0.0-100.0") shouldBe ((2L, 5L, 400000L, false))
    out("accepted:status") shouldBe ((1L, 5L, 200000L, false))
    out("fk:id") shouldBe ((1L, 5L, 200000L, false))
    out.size shouldBe 5
    // a clean suite passes
    val clean = Expectations.run(df.filter(col("id") === 1L), Seq(
        NotNull("name"), Unique("id"), InRange("v", 0.0, 100.0),
        RefIntegrity("id", dim, "k")))
      .collect()
    clean.forall(_.getBoolean(5)) shouldBe true
    // threshold admits bounded dirt: 200000 micros of nulls allowed
    val tol = Expectations.run(df, Seq(NotNull("name", 200000L))).collect()
    tol.head.getBoolean(5) shouldBe true
  }
}
