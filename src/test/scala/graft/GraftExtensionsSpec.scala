package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.matchers.should.Matchers

import graft.functions.GraftExtensions

class GraftExtensionsSpec extends SparkSpec with Matchers {

  test("register exposes the codegen kernels to spark.sql") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
                graft_shingles(array('a', 'b', 'c', 'd'), 3) AS sh""").head()
    row.getDouble(0) shouldBe 32.0
    row.getSeq[String](1) shouldBe Seq("a b c", "b c d")
  }

  test("the SparkSessionExtensions hook installs the same functions without throwing") {
    // full end-to-end via spark.sql.extensions needs a fresh session
    // (the hook runs at builder time); here we verify the injection
    // path itself is well-formed
    noException should be thrownBy new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("graft_intersect_count and graft_simhash run through spark.sql") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_intersect_count(array('a', 'b', 'c'), array('b', 'c', 'd')) AS n,
                graft_simhash(array('hello')) AS fp""").head()
    row.getLong(0) shouldBe 2L
    // single word: fingerprint = the word's own 60-bit hash
    val expected = spark.sql(
      "SELECT CAST(conv(substring(md5('hello'), 1, 15), 16, 10) AS BIGINT)").head().getLong(0)
    row.getLong(1) shouldBe expected
  }

  test("graft_topk aggregates top-k per group through spark.sql") {
    GraftExtensions.register(spark)
    spark.sql(
      """SELECT * FROM VALUES
           ('a', 0.9D, 1L), ('a', 0.9D, 0L), ('a', 0.5D, 2L),
           ('b', 0.1D, 7L)
         AS t(g, score, id)""").createOrReplaceTempView("graft_topk_in")
    val rows = spark.sql(
      """SELECT g, graft_topk(score, id, 2) AS tk
         FROM graft_topk_in GROUP BY g ORDER BY g""").collect()
    rows.map(_.getString(0)).toSeq shouldBe Seq("a", "b")
    val a = rows(0).getSeq[org.apache.spark.sql.Row](1)
    a.map(r => (r.getDouble(0), r.getLong(1))) shouldBe Seq((0.9, 0L), (0.9, 1L))
    val b = rows(1).getSeq[org.apache.spark.sql.Row](1)
    b.map(r => (r.getDouble(0), r.getLong(1))) shouldBe Seq((0.1, 7L))
  }

  test("graft_l2_normalize runs through spark.sql (and coerces int arrays)") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_l2_normalize(array(3, 4)) AS v,
                graft_l2_normalize(array(0.0D, 0.0D)) AS z""").head()
    row.getSeq[Double](0) shouldBe Seq(0.6, 0.8)
    row.getSeq[Double](1) shouldBe Seq(0.0, 0.0) // zero vector passthrough
  }

  test("SQL inputs coerce: int arrays / int scores get analyzer casts, not wrong bytes") {
    GraftExtensions.register(spark)
    // pre-fix, graft_dot over array<int> read int-backed UnsafeArrayData
    // via getDouble → silently wrong numbers
    val d = spark.sql(
      "SELECT graft_dot(array(1, 2, 3), array(4, 5, 6)) AS d").head().getDouble(0)
    d shouldBe 32.0
    // pre-fix, a non-double score threw ClassCastException at execution
    val tk = spark.sql(
      """SELECT graft_topk(score, id, 1) AS tk FROM VALUES (3, 7), (9, 5) AS t(score, id)""")
      .head().getSeq[org.apache.spark.sql.Row](0)
    tk.map(r => (r.getDouble(0), r.getLong(1))) shouldBe Seq((9.0, 5L))
  }

  test("null array elements propagate to a null result (HOF-form parity)") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS d,
                graft_simhash(array('a', CAST(NULL AS STRING))) AS fp,
                graft_intersect_count(array('a', CAST(NULL AS STRING)), array('a')) AS n,
                graft_shingles(array('a', CAST(NULL AS STRING)), 2) AS sh""").head()
    row.isNullAt(0) shouldBe true
    row.isNullAt(1) shouldBe true
    row.isNullAt(2) shouldBe true
    row.isNullAt(3) shouldBe true
  }

  test("graft_shingles rejects a non-literal n") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles(array('a'), 1 + 1)").collect()
    }
    e.getMessage should include("integer literal")
  }

  test("graft_lcp, graft_html_blocks, graft_html_links run through spark.sql") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_lcp('abcdef', 'abcxyz') AS lcp,
                graft_html_blocks(
                  '<p>hi <a href="/x">go</a></p>') AS blocks,
                graft_html_links(
                  '<a href="/x">1</a><a href=\'/y?a=1&amp;b=2\'>2</a>') AS links
      """).head()
    row.getLong(0) shouldBe 3L
    val b = row.getSeq[org.apache.spark.sql.Row](1)
    b.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) shouldBe
      Seq(("hi go", 4L, 2L))
    row.getSeq[String](2) shouldBe Seq("/x", "/y?a=1&b=2")
  }
  test("graft_ac_counts runs through spark.sql; rejects non-literal patterns") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT graft_ac_counts('ababa aaaa', 'aba', 'aa', 'zz') AS c").head()
    row.getSeq[Int](0) shouldBe Seq(1, 2, 0)
    val e = intercept[IllegalArgumentException] {
      spark.sql("SELECT graft_ac_counts('x', upper('a'))").collect()
    }
    e.getMessage should include("string literals")
  }

}
