#!/usr/bin/env python3
"""One-shot refactor: split object SparkEntry (6.4k LoC) into family
traits mixed back into the object — zero behavior change by
construction (defs move verbatim; `private` on moved members becomes
`private[graft]`; every trait self-types on SparkEntry.type so
unqualified references keep resolving)."""
import re
import sys

SRC = "src/main/scala/graft/SparkEntry.scala"

ASSIGN = {}
def fam(name, members):
    for m in members.split():
        ASSIGN[m] = name

fam("EntryBase", """ModelStateHolder q35BasisHolder q44VocabHolder t cents
    lshPlanes projPlanes lshBandSize lshBands boilerplateText
    corpusWithBoilerplate piiPlants syntheticUrl embeddingsWithTwins
    frozenVec priorities""")
fam("EntryRelationalQueries", """q01 q02 q03 q04 q05 q06 q07 q08 q09 q10
    q11 q12 q13 q14 q30 q33 q36 q37 q57 q62 q63 q64 q65 q66 q67 q71
    q80 q96 q109 q116 q117 q137 q138""")
fam("EntryTextQueries", """q16 q17 q18 q19 qNlp q41 q42 q43 q54 q56 q60
    q68 q69 q77 q79 q86 q88 q94 q104 q105 q115 q118 q122 q123 q124
    q132 q135""")
fam("EntrySimilarityQueries", """q15 q20 q21 q22 q25 q26 q27 q28 q32 q38
    q45 q46 q50 q51 q53 q58 q74 q78 q97 q99 q102 q103 q106 q108 q110
    q111 q113 q119 q121 q125 q126 q127 q128 q133 q139 q140 q141 q145
    q147 q148 lshRecallAudit qFlagship q40 q44""")
fam("EntryStreamingQueries", """q29 q39 q47 q59 q70 q72 q76 q81 q89 q93
    q95 q100 q101 q112 q129 q142 q143 q31 q83 q146""")
fam("EntryCurationQueries", """q34 q35 q48 q49 q52 q55 q61 q73 q75 q82
    q84 q85 q87 q90 q91 q92 q98 q107 q114 q120 q130 q131 q134 q136""")
fam("EntryOracleBuilders", """stopwordsSqlList langMarkersSql
    minhashSigsSql minhashOracle simhashOracle langIdOracle
    qualityOracle jaccardOracle embCte cosSql bucketSql knnOracle
    semanticDecontaminateOracle hardNegativesOracle lshBucketsOracle
    lshNearDupOracle boilerplateCorpusSql minhashLshPairsOracle
    minhashEstimateOracle hllDistinctOracle pageRankOracle
    kmeansCtesSql bpeTrainOracle kmeansOracle twinsCteSql
    semanticNearDupOracle hllWaveOracle groupedSplitOracle
    frontierInterleaveOracle curationV3Oracle lshRecallOracle
    cmWaveOracle prefixJaccardOracle minhashCappedPairsOracle
    minhashPairsOracle duplicateClustersOracle signatureClustersOracle
    splitHashSql qualityFilterCtes curationPipelineOracle
    corpusPipelineOracle simhashNearDupOracle simhashCappedOracle
    simhashPairsOracle frozenVecSql labelMatchFrozenOracle
    notStopwordSql cleanTokenStagesSql md5TfVecStagesSql
    w2vVecStagesSql labelMatchHashedOracle labelMatchW2vOracle
    coocTrainCtesSql labelMatchCoocOracle pcaProjectionOracle
    modelOracles flagshipLiveOracle piiRedactChainSql piiPlantListSql
    piiScrubOracle registrableDomainOracle zOrderOracle
    urlRollupOracle curationPipelineV2Oracle streamIngestOracle
    expandContractionsOracle lemmatizeOracle nlpCleanOracle
    below100Sql below1000Sql numberWordsSql nounLexiconCteSql
    morphyCaseSql lemmaExcValuesSql numberWordsOracle
    sessionizeOracle ivfOracle clusterCanonicalOracle""")
fam("EntryOracleSql", "oracleSql")
fam("__object__", "entry queries")

DOCS = {
    "EntryBase": "Shared helpers and constants of the query registry: "
        "table loader, integer-cents quantizer, LSH plane sets, planted "
        "corpora, and the model-state holders for generated oracles.",
    "EntryRelationalQueries": "Relational / event-analytics queries "
        "(SURVEY.md §2.2-2.7): scans, joins, windows, as-of/range "
        "joins, SCD2, funnels, table stats.",
    "EntryTextQueries": "Text-analysis and NLP queries: the clean-token "
        "pipeline, quality scoring, language id, LM scores, TF-IDF/BM25, "
        "BPE training, fingerprints.",
    "EntrySimilarityQueries": "Dedup / similarity-search / sketch "
        "queries plus the flagship matcher family: minhash-LSH tiers, "
        "SimHash, prefix-filter Jaccard, ANN tiers, the retrieval "
        "cascade, trained-embedder flagships.",
    "EntryStreamingQueries": "Structured-streaming and multimodal "
        "queries: windows, stateful joins, streaming sketches and "
        "dedup gates, binary-payload decode paths.",
    "EntryCurationQueries": "Corpus-curation and analytics queries: "
        "splits, mixtures, quotas, sharding, PII scrub, URL rollups, "
        "projection/Venn analyzers, the curation capstones.",
    "EntryOracleBuilders": "Generated-DuckDB-SQL builders shared by "
        "[[EntryOracleSql]]: SQL twins generated from the engine's own "
        "word tables, plane constants, and model state so the oracle "
        "can never drift from the implementation.",
    "EntryOracleSql": "The oracle registry: one DuckDB SQL twin per "
        "query in [[SparkEntry.queries]] (the driver's hash-parity "
        "gate).",
}

lines = open(SRC).read().split("\n")
n = len(lines)

member_pat = re.compile(
    r"^  (?:private |final |def |val )+(?:def |val |class )?(\w+)")
starts = []  # (idx, name)
for i, l in enumerate(lines):
    m = member_pat.match(l)
    if m and re.match(r"^  (private |final |def |val )", l):
        starts.append((i, m.group(1)))

# header = everything before first member (package/imports/object doc/decl)
first_member = starts[0][0]

def back_over_comments(idx):
    j = idx
    while j > 0:
        p = lines[j - 1].strip()
        if p.startswith("/**") or p.startswith("*") or p.startswith("//"):
            j -= 1
        else:
            break
    return j

blocks = []  # (name, [lines])
for k_, (i, name) in enumerate(starts):
    start = back_over_comments(i)
    end = back_over_comments(starts[k_ + 1][0]) if k_ + 1 < len(starts) else n - 1
    blocks.append((name, lines[start:end]))

# sanity: reassemble must equal original body
body = []
for _, bl in blocks:
    body.extend(bl)
expect = lines[back_over_comments(first_member):n - 1]
assert body == expect, "block partition lost lines"

def strip_banners(bl):
    out, i = [], 0
    while i < len(bl):
        if re.match(r"^  // -{10,}$", bl[i]):
            # drop banner group: banner, content //-lines, banner
            j = i + 1
            while j < len(bl) and bl[j].startswith("  //"):
                j += 1
            i = j
        else:
            out.append(bl[i])
            i += 1
    return out

def bump_visibility(bl):
    out = []
    done = False
    for l in bl:
        if not done and re.match(r"^  private (def|val) ", l):
            l = l.replace("  private ", "  private[graft] ", 1)
            done = True
        out.append(l)
    return out

def trim(bl):
    while bl and bl[0].strip() == "":
        bl = bl[1:]
    while bl and bl[-1].strip() == "":
        bl = bl[:-1]
    return bl

files = {}
order = ["EntryBase", "EntryRelationalQueries", "EntryTextQueries",
         "EntrySimilarityQueries", "EntryStreamingQueries",
         "EntryCurationQueries", "EntryOracleBuilders", "EntryOracleSql"]
for f in order:
    files[f] = []
object_blocks = []
for name, bl in blocks:
    tgt = ASSIGN.get(name)
    if tgt is None:
        sys.exit(f"UNASSIGNED member: {name}")
    bl = trim(strip_banners(bl))
    if tgt == "__object__":
        object_blocks.append(bl)
    else:
        files[tgt].append(bump_visibility(bl))

header_imports = """import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.embed.HashingEmbedder
import graft.functions.GraftUdfs
import graft.operators.{Analyze, Ann, Bpe, Cluster, Dedup, Graph, Matcher, Multimodal, Scrub, Sketch, TextAnalysis, UrlOps}
import graft.streaming.StreamOps"""

for f in order:
    parts = [f"package graft\n\n{header_imports}\n",
             f"/** {DOCS[f]} */",
             f"private[graft] trait {f} {{ this: SparkEntry.type =>\n"]
    for bl in files[f]:
        parts.append("\n".join(bl))
        parts.append("")
    parts.append("}")
    open(f"src/main/scala/graft/{f}.scala", "w").write("\n".join(parts) + "\n")

obj_doc = "\n".join(lines[:first_member])
# cut the original object declaration line and everything after the doc:
# keep package/imports/object scaladoc, rewrite the object line
obj_doc = obj_doc.replace(
    "object SparkEntry {",
    "object SparkEntry\n    extends EntryBase\n    with EntryRelationalQueries\n"
    "    with EntryTextQueries\n    with EntrySimilarityQueries\n"
    "    with EntryStreamingQueries\n    with EntryCurationQueries\n"
    "    with EntryOracleBuilders\n    with EntryOracleSql {")
out = [obj_doc.rstrip()]
for bl in object_blocks:
    out.append("")
    out.append("\n".join(bl))
out.append("}")
open(SRC, "w").write("\n".join(out) + "\n")
print("split ok:", {f: len(files[f]) for f in order},
      "object keeps", len(object_blocks), "members")
