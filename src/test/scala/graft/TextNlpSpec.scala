package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextNlp

/** Pins the reference's token-pipeline quirks
  * (`nlp_preprocessing.py:19-99`): rstrip-'s'-after-lemmatise,
  * raw-token stopword test, 'NaN' sentinel, num2words formatting. */
class TextNlpSpec extends AnyFunSuite {

  test("cleanToken composes the six steps in reference order") {
    assert(TextNlp.cleanToken("Can't") == "cannot")
    assert(TextNlp.cleanToken("2") == "two")
    assert(TextNlp.cleanToken("Cells!") == "cell")
    assert(TextNlp.cleanToken("EPITHELIAL") == "epithelial")
    assert(TextNlp.cleanToken(null) == null)
    assert(TextNlp.cleanToken("") == "")
  }

  test("getRootWord lemmatises THEN strips all trailing s (reference quirk)") {
    // lemmatize("glomeruli") -> "glomerulus"; rstrip('s') -> "glomerulu"
    assert(TextNlp.getRootWord("glomeruli") == "glomerulu")
    assert(TextNlp.getRootWord("cells") == "cell")
    // rstrip strips repeated trailing s's
    assert(TextNlp.getRootWord("glass") == "gla")
    assert(TextNlp.getRootWord("children") == "child")
  }

  test("lemmatize matches WordNet on lexicon-dependent words (vendored noun exceptions)") {
    // irregulars the detachment rules get wrong
    assert(TextNlp.lemmatize("wives") == "wife")      // ves->f would give "wif"
    assert(TextNlp.lemmatize("knives") == "knife")
    assert(TextNlp.lemmatize("leaves") == "leaf")
    assert(TextNlp.lemmatize("indices") == "index")   // no ces rule exists
    assert(TextNlp.lemmatize("matrices") == "matrix")
    assert(TextNlp.lemmatize("criteria") == "criterion")
    assert(TextNlp.lemmatize("diagnoses") == "diagnosis") // ses->s would give "diagnose"
    assert(TextNlp.lemmatize("vertebrae") == "vertebra")
    assert(TextNlp.lemmatize("septa") == "septum")
    // identity entries emulate morphy's lexicon check: without them the
    // men->man rule mangles lexicon words ending in -men
    assert(TextNlp.lemmatize("abdomen") == "abdomen")
    assert(TextNlp.lemmatize("specimen") == "specimen")
    assert(TextNlp.lemmatize("foramen") == "foramen")
    assert(TextNlp.lemmatize("rabies") == "rabies")   // ies->y would give "raby"
    assert(TextNlp.lemmatize("riches") == "riches")   // ches->ch would give "rich"
    // NLTK-verified irregular Latin/Greek plurals (noun.exc entries)
    assert(TextNlp.lemmatize("ganglia") == "ganglion")
    assert(TextNlp.lemmatize("femora") == "femur")
    assert(TextNlp.lemmatize("pelves") == "pelvis")   // ves->f would give "pelf"
    assert(TextNlp.lemmatize("testes") == "testis")
    assert(TextNlp.lemmatize("menisci") == "meniscus")
    assert(TextNlp.lemmatize("sulci") == "sulcus")
    // round-7 additions — -mina neuters and other anatomy irregulars
    // no morphy rule touches ("foramina" ends in 'a': only an
    // exception entry can reach "foramen")
    assert(TextNlp.lemmatize("foramina") == "foramen")
    assert(TextNlp.lemmatize("lumina") == "lumen")
    assert(TextNlp.lemmatize("ossa") == "os")
    assert(TextNlp.lemmatize("pontes") == "pons")     // s->"" would give "ponte"
    assert(TextNlp.lemmatize("irides") == "iris")     // s->"" would give "iride"
    assert(TextNlp.lemmatize("chiasmata") == "chiasma")
    assert(TextNlp.lemmatize("tarsi") == "tarsus")
    assert(TextNlp.lemmatize("maxillae") == "maxilla")
    assert(TextNlp.lemmatize("sequelae") == "sequela")
    assert(TextNlp.lemmatize("ischia") == "ischium")
    // full-pipeline parity with the reference (lemmatize + rstrip 's')
    assert(TextNlp.getRootWord("abdomen") == "abdomen")
    assert(TextNlp.getRootWord("wives") == "wife")
    assert(TextNlp.getRootWord("diagnoses") == "diagnosi") // NLTK "diagnosis", then rstrip
  }

  test("round-9 expansion: rare-plural sweep across the new noun.exc families") {
    // -sis medical/scientific plurals (ses->s cannot reconstruct -sis)
    assert(TextNlp.lemmatize("psoriases") == "psoriasis")
    assert(TextNlp.lemmatize("glycolyses") == "glycolysis")
    assert(TextNlp.lemmatize("sarcoidoses") == "sarcoidosis")
    assert(TextNlp.lemmatize("anaphylaxes") == "anaphylaxis") // xes->x would give "anaphylax"
    assert(TextNlp.lemmatize("pneumothoraces") == "pneumothorax")
    // Greek -ma -> -mata
    assert(TextNlp.lemmatize("lipomata") == "lipoma")
    assert(TextNlp.lemmatize("scotomata") == "scotoma")
    // Latin -ium/-um -> -ia/-a
    assert(TextNlp.lemmatize("conidia") == "conidium")
    assert(TextNlp.lemmatize("sporangia") == "sporangium")
    assert(TextNlp.lemmatize("frusta") == "frustum")
    assert(TextNlp.lemmatize("qualia") == "quale")
    // Latin -us -> -i, -a -> -ae
    assert(TextNlp.lemmatize("homunculi") == "homunculus")
    assert(TextNlp.lemmatize("papyri") == "papyrus")
    assert(TextNlp.lemmatize("alumnae") == "alumna")
    assert(TextNlp.lemmatize("tesserae") == "tessera")
    // -oes, -ices, Romance plurals
    assert(TextNlp.lemmatize("tornadoes") == "tornado")
    assert(TextNlp.lemmatize("noes") == "no")
    assert(TextNlp.lemmatize("cruces") == "crux")
    // NOT added: "syringes syrinx" — the r8 decision keeps the common
    // "syringe" over NLTK's min-length "syrinx" (see the r8 test)
    assert(TextNlp.lemmatize("tempi") == "tempo")
    assert(TextNlp.lemmatize("conquistadores") == "conquistador")
    // -fe compounds (ves->f truncates the e)
    assert(TextNlp.lemmatize("midwives") == "midwife")
    assert(TextNlp.lemmatize("penknives") == "penknife")
    // -mina neuters + singular identity
    assert(TextNlp.lemmatize("numina") == "numen")
    assert(TextNlp.lemmatize("velamen") == "velamen")
    // plurale tantum: the inflected form IS the WordNet lemma
    assert(TextNlp.lemmatize("news") == "news")
    assert(TextNlp.lemmatize("molasses") == "molasses")
    assert(TextNlp.lemmatize("eaves") == "eave") // "eave" is the WordNet back-form
    assert(TextNlp.lemmatize("monies") == "money")
    // lexicon-check emulation: common -s/-us/-is lemmas stay fixed
    assert(TextNlp.lemmatize("atlas") == "atlas")
    assert(TextNlp.lemmatize("virus") == "virus")
    assert(TextNlp.lemmatize("census") == "census")
    assert(TextNlp.lemmatize("ibis") == "ibis")
  }

  test("every vendored lemma is a lemmatize fixed-point (morphy lexicon-check emulation)") {
    // WordNet's morphy accepts a word already in its lexicon; every
    // lemma in the exception table is a WordNet noun, so it must map
    // to itself — the property that keeps e.g. "abdomen" from
    // becoming "abdoman" via the men->man rule. Full-table sweep.
    val bad = TextNlp.lemmaExceptions.values.toSet[String]
      .filter(l => TextNlp.lemmatize(l) != l)
    assert(bad.isEmpty, s"non-fixed-point lemmas: ${bad.toSeq.sorted.take(20)}")
  }

  test("morphy validates candidates against the vendored noun lexicon") {
    // the FIRST applicable rule's candidate is a non-word; the later
    // s->"" candidate is in the lexicon — WordNet's lexicon check
    // (nlp_preprocessing.py:34-36) picks the later rule
    assert(TextNlp.lemmatize("houses") == "house")    // ses->s would give "hous"
    assert(TextNlp.lemmatize("nerves") == "nerve")    // ves->f would give "nerf"
    assert(TextNlp.lemmatize("valves") == "valve")
    assert(TextNlp.lemmatize("sizes") == "size")      // zes->z would give "siz"
    assert(TextNlp.lemmatize("aches") == "ache")      // ches->ch would give "ach"
    assert(TextNlp.lemmatize("headaches") == "headache")
    assert(TextNlp.lemmatize("movies") == "movie")    // ies->y would give "movy"
    assert(TextNlp.lemmatize("calories") == "calorie")
    assert(TextNlp.lemmatize("synapses") == "synapse")
    assert(TextNlp.lemmatize("doses") == "dose")
    assert(TextNlp.lemmatize("proteases") == "protease")
    // lexicon validation must NOT override a correct first rule
    assert(TextNlp.lemmatize("branches") == "branch")
    assert(TextNlp.lemmatize("boxes") == "box")
    assert(TextNlp.lemmatize("bodies") == "body")
    assert(TextNlp.lemmatize("classes") == "class")
    // out-of-lexicon regulars keep first-applicable-rule behaviour
    assert(TextNlp.lemmatize("fibroblasts") == "fibroblast")
    // vendored resources are loaded at the expected scale
    assert(TextNlp.lemmaExceptions.size >= 400)
    assert(TextNlp.nounLexicon.size >= 180)
  }

  test("round-8 data expansion: NLTK-divergent rare plurals now match") {
    // -se/-ve/-ze/-che/-ie tails whose FIRST applicable rule mangles
    // the word; the expanded lexicon lets validation pick s->""
    assert(TextNlp.lemmatize("paraphrases") == "paraphrase") // ses->s: "paraphras"
    assert(TextNlp.lemmatize("catchphrases") == "catchphrase")
    assert(TextNlp.lemmatize("porpoises") == "porpoise")
    assert(TextNlp.lemmatize("tortoises") == "tortoise")
    assert(TextNlp.lemmatize("impasses") == "impasse")  // ses->s: "impass"
    assert(TextNlp.lemmatize("finesses") == "finesse")
    assert(TextNlp.lemmatize("wheezes") == "wheeze")    // zes->z: "wheez"
    assert(TextNlp.lemmatize("trapezes") == "trapeze")
    assert(TextNlp.lemmatize("pastiches") == "pastiche") // ches->ch: "pastich"
    assert(TextNlp.lemmatize("tranches") == "tranche")
    assert(TextNlp.lemmatize("pies") == "pie")          // ies->y: "py"
    assert(TextNlp.lemmatize("ties") == "tie")
    assert(TextNlp.lemmatize("dies") == "die")
    assert(TextNlp.lemmatize("magpies") == "magpie")
    assert(TextNlp.lemmatize("alcoves") == "alcove")    // ves->f: "alcof"
    assert(TextNlp.lemmatize("sieves") == "sieve")
    // new exception families
    assert(TextNlp.lemmatize("potatoes") == "potato")
    assert(TextNlp.lemmatize("heroes") == "hero")
    assert(TextNlp.lemmatize("graffiti") == "graffito")
    assert(TextNlp.lemmatize("quizzes") == "quiz")      // zes->z: "quizz"
    assert(TextNlp.lemmatize("gateaux") == "gateau")
    assert(TextNlp.lemmatize("polyhedra") == "polyhedron")
    assert(TextNlp.lemmatize("cicatrices") == "cicatrix")
    assert(TextNlp.lemmatize("amygdalae") == "amygdala")
    assert(TextNlp.lemmatize("candelabra") == "candelabrum")
    assert(TextNlp.lemmatize("forceps") == "forceps")   // invariant lemma
    // a deliberately ABSENT exception: "syringes" must stay the
    // regular syringe (an exception syringes->syrinx would break the
    // common word)
    assert(TextNlp.lemmatize("syringes") == "syringe")
  }

  test("contraction table is the full package data, loaded from the resource") {
    // full -'ll've / -'d've chains and the slang tier, not just the
    // common-aux subset
    assert(TextNlp.expandContractions("y'all'd've") == "you all would have")
    assert(TextNlp.expandContractions("shan't've") == "shall not have")
    assert(TextNlp.expandContractions("howdy") == "how do you do")
    assert(TextNlp.expandContractions("finna") == "fixing to")
    assert(TextNlp.expandContractions("Don't") == "Do not") // Title-case mirror
    assert(TextNlp.expandContractions("plain") == "plain")  // miss → unchanged
    // 160+ base entries, doubled by the Title-case augmentation
    assert(TextNlp.contractionsMap.size >= 320)
  }

  test("numberToWords matches num2words en formatting") {
    assert(TextNlp.numberToWords("0") == "zero")
    assert(TextNlp.numberToWords("15") == "fifteen")
    assert(TextNlp.numberToWords("42") == "forty-two")
    assert(TextNlp.numberToWords("100") == "one hundred")
    assert(TextNlp.numberToWords("101") == "one hundred and one")
    assert(TextNlp.numberToWords("1005") == "one thousand and five")
    assert(TextNlp.numberToWords("1234") == "one thousand, two hundred and thirty-four")
    assert(TextNlp.numberToWords("1000000") == "one million")
    assert(TextNlp.convertNumberToWord("2b") == "2b") // not all-digits: untouched
  }

  test("stopword test runs on the RAW token, not the cleaned one") {
    // raw "The" (capitalised) is NOT in the lowercase stopword list, so
    // it survives; the later raw "the" is dropped. Dedup key is the
    // cleaned form. (`nlp_preprocessing.py:90-99`)
    val out = TextNlp.tokensCleanDedup("The the cell Cells", 150)
    assert(out == Seq("the", "cell"))
  }

  test("tokensCleanDedup truncates before tokenising and keeps first-seen order") {
    val text = "alpha beta alpha gamma"
    assert(TextNlp.tokensCleanDedup(text, 150) == Seq("alpha", "beta", "gamma"))
    // truncation at 10 chars cuts "alpha beta" -> ["alpha", "beta"] ("beta" intact at boundary)
    assert(TextNlp.tokensCleanDedup(text, 10) == Seq("alpha", "beta"))
  }

  test("'NaN' sentinel is filtered like a stopword") {
    assert(!TextNlp.isNotStopword("NaN"))
    assert(TextNlp.isNotStopword("nan")) // only the exact sentinel
    assert(TextNlp.tokensCleanDedup("NaN cell", 150) == Seq("cell"))
  }

  test("cleanLabel splits on whitespace runs and drops empties (python str.split())") {
    assert(TextNlp.cleanLabel("Type  2   Cells") == "type two cell")
    assert(TextNlp.cleanLabel(null) == null)
  }

  test("cleanToken is idempotent on its own output") {
    val words = Seq("Cells!", "can't", "2", "Glomeruli", "T-Cell", "typeIIpneumocytes")
    words.foreach { w =>
      val once = TextNlp.cleanToken(w)
      assert(TextNlp.cleanToken(once) == once, s"not idempotent for $w")
    }
  }
}
