package graft.functions

/** Token-level NLP cleaning pipeline.
  *
  * Re-expresses the reference's per-token cleaning chain
  * (`utilities/nlp_preprocessing.py:19-70`): remove whitespace →
  * expand contractions → strip non-alphanumerics → number-to-words →
  * lowercase → lemmatize-and-rstrip-'s'. All supporting data
  * (stopwords, contraction table, irregular-plural exceptions) is
  * vendored here so the pipeline is a pure JVM function — broadcast
  * once per executor instead of rebuilt per token as the reference
  * does (`nlp_preprocessing.py:35,39`).
  *
  * Everything is deterministic and allocation-light: these run inside
  * Spark UDFs on the hot path of the flagship matching query.
  */
object TextNlp extends Serializable {

  /** NLTK's english stopword list (179 words), vendored for parity —
    * MLlib's StopWordsRemover default list differs.
    * (`nlp_preprocessing.py:38-39`) */
  val stopwords: Set[String] = Set(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "you're", "you've", "you'll", "you'd", "your", "yours",
    "yourself", "yourselves", "he", "him", "his", "himself", "she",
    "she's", "her", "hers", "herself", "it", "it's", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "that'll", "these", "those", "am",
    "is", "are", "was", "were", "be", "been", "being", "have", "has",
    "had", "having", "do", "does", "did", "doing", "a", "an", "the",
    "and", "but", "if", "or", "because", "as", "until", "while", "of",
    "at", "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few",
    "more", "most", "other", "some", "such", "no", "nor", "not",
    "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "don't", "should", "should've",
    "now", "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren",
    "aren't", "couldn", "couldn't", "didn", "didn't", "doesn",
    "doesn't", "hadn", "hadn't", "hasn", "hasn't", "haven",
    "haven't", "isn", "isn't", "ma", "mightn", "mightn't", "mustn",
    "mustn't", "needn", "needn't", "shan", "shan't", "shouldn",
    "shouldn't", "wasn", "wasn't", "weren", "weren't", "won",
    "won't", "wouldn", "wouldn't")

  /** English contraction table (the public `contractions` package's
    * expansion data incl. its slang tier, vendored as a resource;
    * `nlp_preprocessing.py:22-23`). Lookup adds Title-case variants
    * like the package's capitalised handling. */
  val contractionsMap: Map[String, String] = {
    val stream = getClass.getResourceAsStream("/graft/contractions.txt")
    require(stream != null, "missing resource graft/contractions.txt")
    val base =
      try scala.io.Source.fromInputStream(stream, "UTF-8").getLines()
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val i = l.indexOf('\t')
          require(i > 0, s"malformed contractions entry: $l")
          l.substring(0, i) -> l.substring(i + 1)
        }
        .toMap
      finally stream.close()
    // The contractions package also fixes capitalised variants; mirror
    // by adding Title-case keys mapping to Title-case expansions.
    base ++ base.map { case (k, v) => (k.capitalize, v.capitalize) }
  }

  def expandContractions(word: String): String =
    contractionsMap.getOrElse(word, word)

  // --- number to words (num2words-en compatible) ------------------------

  // public: the q43 oracle builds its SQL formatter from these exact
  // tables, so the DuckDB twin can never drift from the JVM one
  val ones = Array("zero", "one", "two", "three", "four", "five",
    "six", "seven", "eight", "nine", "ten", "eleven", "twelve",
    "thirteen", "fourteen", "fifteen", "sixteen", "seventeen",
    "eighteen", "nineteen")
  val tens = Array("", "", "twenty", "thirty", "forty", "fifty",
    "sixty", "seventy", "eighty", "ninety")
  // scale words for 1000^i, i = 1..10 (enough for any 33-digit input)
  val scales = Array("", "thousand", "million", "billion",
    "trillion", "quadrillion", "quintillion", "sextillion",
    "septillion", "octillion", "nonillion", "decillion")

  private def below100(n: Int): String =
    if (n < 20) ones(n)
    else if (n % 10 == 0) tens(n / 10)
    else tens(n / 10) + "-" + ones(n % 10)

  private def below1000(n: Int): String =
    if (n < 100) below100(n)
    else if (n % 100 == 0) ones(n / 100) + " hundred"
    else ones(n / 100) + " hundred and " + below100(n % 100)

  /** English cardinal words for a non-negative integer given as a
    * digit string; matches num2words' en formatting: groups joined
    * with ", ", "and" inside a hundred-group and between a scale word
    * and a final sub-100 group ("1005" → "one thousand and five";
    * "1234" → "one thousand, two hundred and thirty-four").
    * (`nlp_preprocessing.py:28-29`) */
  def numberToWords(digits: String): String = {
    val trimmed = digits.dropWhile(_ == '0')
    if (trimmed.isEmpty) return "zero"
    val n = BigInt(trimmed)
    if (n < 1000) return below1000(n.toInt)
    // split into 3-digit groups, most-significant first
    var groups = List.empty[Int]
    var rest = n
    while (rest > 0) { groups = (rest % 1000).toInt :: groups; rest /= 1000 }
    val parts = groups.zipWithIndex.collect {
      case (g, i) if g != 0 =>
        val scaleIdx = groups.length - 1 - i
        val scale = if (scaleIdx < scales.length) scales(scaleIdx) else ""
        val text = if (scaleIdx == 0) below1000(g)
                   else below1000(g) + " " + scale
        (text, g, scaleIdx)
    }
    // num2words merge rule: a final group < 100 after a >=1000 prefix
    // joins with " and "; otherwise groups join with ", ".
    val sb = new StringBuilder(parts.head._1)
    parts.tail.foreach { case (text, g, scaleIdx) =>
      if (scaleIdx == 0 && g < 100) sb.append(" and ").append(text)
      else sb.append(", ").append(text)
    }
    sb.toString
  }

  private val allDigits = java.util.regex.Pattern.compile("[0-9]+")

  def convertNumberToWord(word: String): String =
    if (allDigits.matcher(word).matches()) numberToWords(word) else word

  // --- lemmatizer (WordNet-morphy noun rules) ---------------------------

  /** Noun exception table in WordNet noun.exc format ("inflected
    * lemma" per line), vendored as a resource: standard irregular
    * plurals, Latin/Greek scientific plurals, and identity entries
    * that emulate the lexicon check morphy performs before accepting a
    * detachment (without them the bare men→man rule turns "abdomen"
    * into "abdoman" — WordNet rejects that candidate because it is
    * not in the lexicon and keeps the original).
    * (`nlp_preprocessing.py:34-36` uses the full WordNet lemmatizer.) */
  val lemmaExceptions: Map[String, String] = {
    val stream = getClass.getResourceAsStream("/graft/noun_exceptions.txt")
    require(stream != null, "missing resource graft/noun_exceptions.txt")
    try scala.io.Source.fromInputStream(stream, "UTF-8").getLines()
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l => val p = l.split("\\s+"); p(0) -> p(1) }
      .toMap
    finally stream.close()
  }

  /** WordNet morphy noun detachment rules, in morphy's order. Public:
    * the q42 oracle derives its SQL CASE chain from this exact list. */
  val morphyRules: List[(String, String)] = List(
    ("ses", "s"), ("ves", "f"), ("xes", "x"), ("zes", "z"),
    ("ches", "ch"), ("shes", "sh"), ("ies", "y"), ("men", "man"),
    ("s", ""))

  /** Vendored noun lexicon for morphy's candidate-validation step
    * (`nlp_preprocessing.py:34-36` uses full WordNet, which only
    * accepts a detachment candidate present in its lexicon). This is
    * the minimal slice that matters under the rule list above: the
    * singular -se/-ve/-ze/-che/-ie nouns whose plurals an earlier
    * rule mangles ("houses"→"hous", "nerves"→"nerf", "sizes"→"siz",
    * "aches"→"ach", "movies"→"movy") while the later s→"" rule is
    * right. Public: the q42/q23 oracles inline it as a SQL list. */
  val nounLexicon: Set[String] = {
    val stream = getClass.getResourceAsStream("/graft/noun_lexicon.txt")
    require(stream != null, "missing resource graft/noun_lexicon.txt")
    try scala.io.Source.fromInputStream(stream, "UTF-8").getLines()
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .toSet
    finally stream.close()
  }

  private val morphyRulesArr: Array[(String, String)] = morphyRules.toArray

  /** Morphy with candidate validation: exceptions first; otherwise
    * the first rule candidate present in [[nounLexicon]]; otherwise
    * the first applicable rule's candidate (deviation from NLTK,
    * which returns the word unchanged when no candidate is in the
    * lexicon — with a partial lexicon, first-rule fallback matches
    * NLTK on every word whose true lemma is either vendored or
    * produced by the first rule, and the reference's trailing
    * `rstrip('s')` masks the difference for the dominant s→"" rule). */
  def lemmatize(word: String): String =
    lemmaExceptions.get(word) match {
      case Some(l) => l
      case None =>
        var firstApplicable: String = null
        var i = 0
        while (i < morphyRulesArr.length) {
          val (suf, rep) = morphyRulesArr(i)
          if (word.length > suf.length && word.endsWith(suf)) {
            val cand = word.substring(0, word.length - suf.length) + rep
            if (nounLexicon.contains(cand)) return cand
            if (firstApplicable == null) firstApplicable = cand
          }
          i += 1
        }
        if (firstApplicable != null) firstApplicable else word
    }

  /** lemmatize then strip ALL trailing 's' characters — the reference
    * applies `.rstrip('s')` after lemmatisation (`nlp_preprocessing.py:34-36`). */
  def getRootWord(word: String): String = {
    var w = lemmatize(word)
    var end = w.length
    while (end > 0 && w.charAt(end - 1) == 's') end -= 1
    w.substring(0, end)
  }

  // --- composed pipeline ------------------------------------------------

  private val nonAlnum = java.util.regex.Pattern.compile("[^a-zA-Z0-9]")

  /** The full per-token pipeline, composed in the reference's order
    * (`nlp_preprocessing.py:42-70`). */
  def cleanToken(word: String): String = {
    if (word == null) return null
    val noWs = word.replace(" ", "")
    val expanded = expandContractions(noWs)
    val alnum = nonAlnum.matcher(expanded).replaceAll("")
    val numed = convertNumberToWord(alnum)
    val lowered = numed.toLowerCase
    getRootWord(lowered)
  }

  /** Label-level clean: whitespace-split, clean each token, re-join
    * (`main.py:82,139` — python's no-arg `split()` drops empty
    * tokens and splits on any whitespace run). */
  def cleanLabel(label: String): String = {
    if (label == null) return null
    label.split("\\s+").filter(_.nonEmpty).map(cleanToken).mkString(" ")
  }

  def isNotStopword(rawWord: String): Boolean =
    !stopwords.contains(rawWord) && rawWord != "NaN"

  /** Document-text preparation for embedding: truncate, split on
    * single spaces (keeping empties, like python `split(' ')`),
    * clean each token, keep first occurrence of each cleaned form
    * whose RAW token is not a stopword — order-preserving dedup with
    * the dedup key on the cleaned token but the stopword test on the
    * raw token (`nlp_preprocessing.py:86-99`). */
  def tokensCleanDedup(text: String, maxTextLength: Int = 150): Seq[String] = {
    if (text == null) return Seq.empty
    val truncated = if (text.length > maxTextLength) text.substring(0, maxTextLength) else text
    val seen = scala.collection.mutable.HashSet.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    truncated.split(" ", -1).foreach { raw =>
      val cleaned = cleanToken(raw)
      if (!seen.contains(cleaned) && isNotStopword(raw)) {
        out += cleaned
        seen += cleaned
      }
    }
    out.toSeq
  }

  /** tokensCleanDedup re-joined — the exact string the reference
    * hands to its sentence encoder (`nlp_preprocessing.py:100`). */
  def embedText(text: String, maxTextLength: Int = 150): String =
    tokensCleanDedup(text, maxTextLength).mkString(" ")
}
