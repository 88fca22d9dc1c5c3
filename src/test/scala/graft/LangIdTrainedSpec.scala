package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.TextAnalysis

/** Trained multinomial-NB langid over hashed char trigrams
  * ([[graft.operators.TextAnalysis.langIdTrain]]/[[graft.operators.TextAnalysis.langIdApply]]).
  * The synthetic corpus here carries REAL per-language character
  * statistics (unlike the harness documents table, whose `lang`
  * column is uncorrelated with its text — q264's chance-level
  * holdout accuracy is the honest readout there), so the spec can
  * assert the classifier actually learns. */
class LangIdTrainedSpec extends SparkSpec with Matchers {
  import spark.implicits._

  // three toy "languages" with disjoint character inventories; text
  // per doc is a deterministic word mix so the train/holdout split
  // sees the same distributions
  private val vocab = Map(
    "aa" -> Seq("tanaka", "harati", "salama", "karana", "matata"),
    "bb" -> Seq("grumpf", "brozzle", "splorch", "frunzle", "drubble"),
    "cc" -> Seq("vieuxne", "ouielle", "heureux", "oiseaux", "beaucoup"))

  private lazy val corpus = {
    val rows = for {
      (lang, words) <- vocab.toSeq
      i <- 0 until 60
    } yield {
      val text = (0 until 12)
        .map(j => words((i * 7 + j * 3) % words.size)).mkString(" ")
      (vocab.keys.toSeq.sorted.indexOf(lang) * 60L + i, text, lang)
    }
    rows.toDF("doc_id", "text", "lang")
  }

  test("holdout accuracy is high when the text carries language signal") {
    val train = corpus.filter(pmod($"doc_id", lit(3L)) =!= 0L)
    val model = TextAnalysis.langIdTrain(train, "text", "lang",
      buckets = 256, n = 3, maxChars = 512, salt = "lidspec")
    model.langs shouldBe Seq("aa", "bb", "cc")
    // dense model: exactly L x B weight rows, one prior per lang
    model.weights.count() shouldBe 3L * 256
    model.priors.count() shouldBe 3L
    val applied = TextAnalysis.langIdApply(corpus, "doc_id", "text", model)
      .join(corpus.select($"doc_id", $"lang"), Seq("doc_id"))
    val holdout = applied.filter(pmod($"doc_id", lit(3L)) === 0L)
    val acc = holdout.agg(
      avg(when($"trained_lang" === $"lang", 1.0).otherwise(0.0)))
      .head().getDouble(0)
    acc should be >= 0.95
  }

  test("scores are exact integers, invariant to partitioning") {
    val model = TextAnalysis.langIdTrain(corpus, "text", "lang",
      buckets = 64, n = 3, maxChars = 512, salt = "lidspec")
    val a = TextAnalysis.langIdApply(corpus, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val b = TextAnalysis.langIdApply(corpus.repartition(13), "doc_id",
        "text", model)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    b shouldBe a
  }

  test("docs shorter than n produce no row; ties break to smallest lang") {
    val tiny = Seq((1L, "xy", "aa"), (2L, "zq", "bb")).toDF(
      "doc_id", "text", "lang")
    val model = TextAnalysis.langIdTrain(corpus, "text", "lang",
      buckets = 64, n = 3, maxChars = 512, salt = "lidspec")
    TextAnalysis.langIdApply(tiny, "doc_id", "text", model)
      .count() shouldBe 0L
    // a gram seen equally by every class scores only the prior
    // difference; equal priors -> tie -> lexicographically smallest
    val balanced = vocab.toSeq.flatMap { case (lang, _) =>
      (0 until 10).map(i =>
        (vocab.keys.toSeq.sorted.indexOf(lang) * 10L + i, "zzzz", lang))
    }.toDF("doc_id", "text", "lang")
    val m2 = TextAnalysis.langIdTrain(balanced, "text", "lang",
      buckets = 64, n = 3, maxChars = 512, salt = "lidspec")
    val pred = TextAnalysis.langIdApply(
      Seq((99L, "zzzz")).toDF("doc_id", "text"), "doc_id", "text", m2)
      .head()
    pred.getString(1) shouldBe "aa"
  }

  test("fused LangIdScoreExpr equals the relational apply on every doc with grams") {
    val model = TextAnalysis.langIdTrain(corpus, "text", "lang",
      buckets = 256, n = 3, maxChars = 512, salt = "lidspec")
    val (langs, w, p) = TextAnalysis.langIdModelArrays(model)
    val rel = TextAnalysis.langIdApply(corpus, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val fused = corpus.select($"doc_id",
        TextAnalysis.langIdScore($"text", langs, w, p, 256, 3, 512,
          "lidspec").as("__r"))
      .select($"doc_id", $"__r.trained_lang", $"__r.score_micros",
        $"__r.n_grams")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    fused.keySet shouldBe rel.keySet
    rel.foreach { case (id, (lang, score)) =>
      fused(id)._1 shouldBe lang
      fused(id)._2 shouldBe score
      fused(id)._3 should be > 0L
    }
    // a sub-n doc scores priors only (n_grams = 0) instead of vanishing
    val tiny = Seq((99L, "xy")).toDF("doc_id", "text")
      .select(TextAnalysis.langIdScore($"text", langs, w, p, 256, 3, 512,
        "lidspec").as("__r"))
      .select($"__r.trained_lang", $"__r.n_grams").head()
    tiny.getLong(1) shouldBe 0L
    langs should contain(tiny.getString(0))
  }

  test("fused equals relational on supplementary-plane text (code-point truncation)") {
    // Astral characters (1 code point, 2 UTF-16 units) before and
    // inside the window: a code-UNIT scorer would cap the prefix and
    // split trigrams differently from Spark substring/length, which
    // count code POINTS. maxChars = 8 so the cap lands mid-text.
    val astral = Seq(
      (1L, "😀abc😁defgh", "aa"), // 😀abc😁defgh
      (2L, "ta💩naka salama", "aa"),        // ta💩naka…
      (3L, "🚀🚀🚀xyzw", "bb"))
      .toDF("doc_id", "text", "lang")
    val model = TextAnalysis.langIdTrain(corpus, "text", "lang",
      buckets = 256, n = 3, maxChars = 8, salt = "lidspec")
    val (langs, w, p) = TextAnalysis.langIdModelArrays(model)
    val rel = TextAnalysis.langIdApply(astral, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val fused = astral.select($"doc_id",
        TextAnalysis.langIdScore($"text", langs, w, p, 256, 3, 8,
          "lidspec").as("__r"))
      .filter($"__r.n_grams" > 0)
      .select($"doc_id", $"__r.trained_lang", $"__r.score_micros")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    fused shouldBe rel
    rel.keySet shouldBe Set(1L, 2L, 3L)
  }

  test("langIdCorpusModel memoized model equals a fresh train, and trains once") {
    val dir = java.nio.file.Files.createTempDirectory("lidmemo").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val f1 = TextAnalysis.langIdCorpusModel(spark, dir)
    val f2 = TextAnalysis.langIdCorpusModel(spark, dir)
    // same cached entry, not a re-train
    assert(f1 eq f2)
    val fresh = TextAnalysis.langIdTrain(
      corpus.filter(pmod($"doc_id", lit(5L)) =!= 0L), "text", "lang")
    val (langs, w, p) = TextAnalysis.langIdModelArrays(fresh)
    f1.langs shouldBe langs
    f1.weights shouldBe w
    f1.priors shouldBe p
    // the reconstructed LOCAL weight/prior frames carry identical rows
    val memoW = f1.model.weights.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val freshW = fresh.weights.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    memoW shouldBe freshW
    // and the relational apply through the memoized model matches
    val a = TextAnalysis.langIdApply(corpus, "doc_id", "text", f1.model)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val b = TextAnalysis.langIdApply(corpus, "doc_id", "text", fresh)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    a shouldBe b
  }

  test("q276 planted slice shows real holdout discrimination; harness slice stays chance-level") {
    val rows = SparkEntry.queries("q276_langid_planted")(
      spark, "/root/testdata/sf0.001").collect()
    val planted = rows.filter(_.getString(0) == "planted")
    planted.nonEmpty shouldBe true
    val nHold = planted.map(_.getLong(4)).sum
    val nCorrect = planted.map(_.getLong(5)).sum
    nHold should be >= 10L
    // the disjoint-inventory plants must classify near-perfectly
    nCorrect.toDouble / nHold should be >= 0.9
    // diagonal-only correctness: n_holdout_correct is zero off-diagonal
    planted.filter(r => r.getString(1) != r.getString(2))
      .foreach(_.getLong(5) shouldBe 0L)
  }

  test("prefix cap bounds the gram stream") {
    val longDoc = Seq((1L, ("tanaka " * 100) + ("grumpf " * 100), "aa"))
      .toDF("doc_id", "text", "lang")
    // maxChars = 42 sees only the tanaka prefix -> classifies as aa
    val model = TextAnalysis.langIdTrain(corpus, "text", "lang",
      buckets = 256, n = 3, maxChars = 42, salt = "lidspec")
    val pred = TextAnalysis.langIdApply(longDoc, "doc_id", "text", model)
      .head()
    pred.getString(1) shouldBe "aa"
  }
}
