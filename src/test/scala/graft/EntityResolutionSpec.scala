package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.operators.EntityResolution.{fellegiSunter, FieldRule}

class EntityResolutionSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private val rules = Seq(
    FieldRule("name_ci", "name", (a, b) => lower(a) === lower(b),
      2000000L, -2000000L),
    FieldRule("city", "city", (a, b) => a === b, 1000000L, -1000000L))

  test("blocking gates candidates, agreement weights score exactly, " +
      "threshold separates match from non-match, partition-invariant") {
    val recs = Seq(
      (1L, "Ada Lovelace", "london", "b1"),
      (2L, "ADA LOVELACE", "london", "b1"), // true dup of 1 (case)
      (3L, "Bob Smith", "paris", "b1"),     // same block, no agreement
      (4L, "Ada Lovelace", "london", "b2")) // dup of 1 but OTHER block
      .toDF("id", "name", "city", "block")
    val out = fellegiSunter(recs, "id", "block", rules, 3000000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getBoolean(2), r.getBoolean(3), r.getLong(4)))).toMap
    // only (1,2): both rules agree -> 3M. (1,3)/(2,3) score -3M.
    // (1,4) never compared: different block.
    out.keySet shouldBe Set((1L, 2L))
    out((1L, 2L)) shouldBe ((true, true, 3000000L))
    // lower threshold surfaces the disagreeing in-block pairs with
    // their exact negative scores
    val all = fellegiSunter(recs, "id", "block", rules, Long.MinValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4))
      .toMap
    all.keySet shouldBe Set((1L, 2L), (1L, 3L), (2L, 3L))
    all((1L, 3L)) shouldBe -3000000L
    val re = fellegiSunter(recs.repartition(5), "id", "block", rules,
      3000000L).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    re shouldBe Set((1L, 2L))
  }
}
