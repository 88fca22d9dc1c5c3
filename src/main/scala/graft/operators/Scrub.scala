package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-level PII / secret scrubbing — the redaction stage every
  * production training-data pipeline runs before any text leaves the
  * curation boundary (not present in the reference, whose corpus is a
  * curated anatomy table; first-class here per the pipeline-surface
  * mandate).
  *
  * Pure projection: per-category regex counts on the RAW text plus a
  * sequentially-redacted output column — no shuffle, no UDF, fully
  * codegen'd `regexp_replace`/`regexp_extract_all`, so it runs at
  * scan speed on 100 TB and pushes down through column pruning like
  * any narrow map.
  *
  * The pattern table is PUBLIC data both engines share: the q84
  * oracle generates its SQL from [[piiPatterns]] itself, so the spec
  * can never drift from the implementation. Patterns deliberately use
  * the regex subset with identical semantics in Java and RE2 (char
  * classes, bounded repeats, `\b`, alternation — no lookaround, no
  * backreferences).
  */
object Scrub {

  /** (category, pattern, placeholder), in APPLICATION ORDER — more
    * specific categories first so e.g. an SSN is not half-eaten by
    * the phone pattern. Counts are evaluated per category on the raw
    * text; redaction applies sequentially. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("card", "\\b\\d{13,16}\\b", "<CARD>"),
    ("hexkey", "\\b[a-f0-9]{32,}\\b", "<KEY>"),
    ("apikey", "\\bsk-[A-Za-z0-9]{16,}\\b", "<KEY>"))

  /** Append `n_<category>` count columns (matches in the raw text)
    * and `outCol` = the text with every category redacted to its
    * placeholder, applied in [[piiPatterns]] order. */
  def scrubPii(df: DataFrame, textCol: String,
               outCol: String = "scrubbed"): DataFrame = {
    val counted = piiPatterns.foldLeft(df) { case (acc, (cat, pat, _)) =>
      acc.withColumn(s"n_$cat",
        size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long"))
    }
    val redacted = piiPatterns.foldLeft(col(textCol): Column) {
      case (acc, (_, pat, ph)) => regexp_replace(acc, lit(pat), lit(ph))
    }
    counted.withColumn(outCol, redacted)
  }

  /** Confusable (homoglyph) fold map: Cyrillic lookalikes → their
    * ASCII targets, lower + upper. PUBLIC shared state — the q294
    * oracle interpolates exactly these two strings into its
    * `translate`, so both engines fold the identical code points.
    * (A production fold ships the full Unicode confusables table;
    * the mechanism — one codepoint-wise `translate` — is the same.) */
  val confusableFrom =
    "\u0430\u0435\u043e\u0440\u0441\u0445" + // Cyrillic a e o r s h (lower)
    "\u0410\u0415\u041e\u0420\u0421\u0425"   // upper
  val confusableTo = "aeopcx" + "AEOPCX"

  /** Zero-width characters adversaries interleave to break substring
    * screens: ZWSP, ZWNJ, ZWJ, BOM/ZWNBSP. */
  val zeroWidthClass = "[\u200b\u200c\u200d\ufeff]"

  /** Obfuscation-resistant text normalisation: strip zero-width
    * characters, then fold Cyrillic homoglyphs to ASCII — the
    * pre-pass that makes a blocklist/quality screen robust to
    * "cl​ick here" and "сlick" evasion. Pure codegen'd
    * projection (`regexp_replace` + `translate`): no shuffle, runs
    * at scan speed, composes under any downstream screen. */
  def foldConfusables(text: Column): Column =
    translate(regexp_replace(text, zeroWidthClass, ""),
      confusableFrom, confusableTo)
}
