"""[EXT] Text-analysis and deduplication operators over ``documents``
(SURVEY.md §2.10 + the training-data-pipeline surface: tokenization,
token frequencies, language ID, quality scoring, token counting,
fingerprinting, exact + n-gram-Jaccard dedup, TF-IDF).

All token-level ops are native higher-order functions (split/filter/
transform/explode) — no Python in the hot path; at 100 TB these stay in
whole-stage codegen and parallelize with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..artifacts import SessionMemo, read_or_build
from ..functions.text import clean_text, clean_text_sql
from ..sources import load_table
from ..sources.tables import _memoizable
from .registry import query

_CLEAN = clean_text_sql("text")

# Tokenizer twins (Spark split is Java-regex, DuckDB regexp_split_to_array
# is RE2 — identical for this pattern).
_TOKS_SQL = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic (deliberately simple — deterministic and SQL-expressible).
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "et", "les", "des", "une"],
    "es": ["el", "los", "las", "y", "una"],
}

BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def tokens_col(c: Column | str = "text") -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != "")


def _hits(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def _hits_sql(words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(toks, x -> x IN ({lst})))"


# --- tokenization / frequencies ------------------------------------------

@query("arr_tokenize", f"""
    SELECT doc_id, CAST(len({_TOKS_SQL}) AS INTEGER) AS n_tokens FROM documents
""")
def arr_tokenize(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", F.size(tokens_col()).alias("n_tokens"))


@query("arr_explode_tokens", f"""
    SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents
""")
def arr_explode_tokens(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", F.explode(tokens_col()).alias("token"))


@query("text_token_freq", f"""
    SELECT token, count(*) AS n FROM (
        SELECT unnest({_TOKS_SQL}) AS token FROM documents
    ) GROUP BY token
""")
def text_token_freq(spark, sf_dir):
    """Corpus word frequency: explode + hash agg (two-phase, map-side
    partials make the shuffle carry one row per (partition, token))."""
    return (
        _docs(spark, sf_dir)
        .select(F.explode(tokens_col()).alias("token"))
        .groupBy("token").agg(F.count("*").alias("n"))
    )


@query("text_lang_dist", """
    SELECT lang, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
""")
def text_lang_dist(spark, sf_dir):
    return _docs(spark, sf_dir).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"))


@query("text_token_count", f"""
    SELECT doc_id,
           CAST(len({_TOKS_SQL}) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '{BPE_ISH_PATTERN}')) AS INTEGER) AS bpe_tokens
    FROM documents
""")
def text_token_count(spark, sf_dir):
    """Whitespace token count + a BPE-ish regex token count (letter runs
    / digit runs / single punctuation — a cheap proxy for subword
    tokenizer budgeting over a training corpus)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(tokens_col()).alias("ws_tokens"),
        F.regexp_count(F.lower("text"), F.lit(BPE_ISH_PATTERN)).cast("int").alias("bpe_tokens"),
    )


# --- quality / language ID ------------------------------------------------

@query("text_quality_score", f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
               / CAST(length(text) AS DOUBLE) AS punct_ratio,
           {_hits_sql(STOPWORDS)} / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
           (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
               / CAST(length(text) AS DOUBLE))
             * LEAST(1.0, len(toks) / 50.0) AS quality
    FROM t WHERE length(text) > 0 AND len(toks) > 0
""")
def text_quality_score(spark, sf_dir):
    """Heuristic document-quality scoring (length/punctuation/stopword
    signals — the standard pretraining-corpus filters)."""
    toks = tokens_col()
    df = _docs(spark, sf_dir).select("doc_id", "text", toks.alias("toks"))
    # positive-run form of `replace('[^a-zA-Z0-9 ]','')` — identical
    # count, 34x faster on java.util.regex (see functions/text.py)
    punct = (F.length("text") - F.length(F.array_join(
        F.regexp_extract_all("text", F.lit("[a-zA-Z0-9 ]+"), F.lit(0)), ""))) \
        / F.length("text").cast("double")
    stop_ratio = _hits(F.col("toks"), STOPWORDS) / F.size("toks").cast("double")
    quality = (F.lit(1.0) - punct) * F.least(F.lit(1.0), F.size("toks") / F.lit(50.0))
    return (
        df.filter((F.length("text") > 0) & (F.size("toks") > 0))
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            punct.alias("punct_ratio"),
            stop_ratio.alias("stopword_ratio"),
            quality.alias("quality"),
        )
    )


@query("text_lang_id", f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    h AS (SELECT doc_id,
                 {_hits_sql(LANG_PROFILES['en'])} AS en_h,
                 {_hits_sql(LANG_PROFILES['de'])} AS de_h,
                 {_hits_sql(LANG_PROFILES['fr'])} AS fr_h,
                 {_hits_sql(LANG_PROFILES['es'])} AS es_h
          FROM t)
    SELECT doc_id,
           CASE WHEN en_h + de_h + fr_h + es_h = 0 THEN 'unknown'
                WHEN en_h >= de_h AND en_h >= fr_h AND en_h >= es_h THEN 'en'
                WHEN de_h >= fr_h AND de_h >= es_h THEN 'de'
                WHEN fr_h >= es_h THEN 'fr'
                ELSE 'es' END AS lang_pred
    FROM h
""")
def text_lang_id(spark, sf_dir):
    """Stopword-profile language ID (deterministic argmax with a fixed
    preference order on ties)."""
    df = _docs(spark, sf_dir).select("doc_id", tokens_col().alias("toks"))
    hs = {k: _hits(F.col("toks"), v) for k, v in LANG_PROFILES.items()}
    total = hs["en"] + hs["de"] + hs["fr"] + hs["es"]
    pred = (
        F.when(total == 0, "unknown")
        .when((hs["en"] >= hs["de"]) & (hs["en"] >= hs["fr"]) & (hs["en"] >= hs["es"]), "en")
        .when((hs["de"] >= hs["fr"]) & (hs["de"] >= hs["es"]), "de")
        .when(hs["fr"] >= hs["es"], "fr")
        .otherwise("es")
    )
    return df.select("doc_id", pred.alias("lang_pred"))


# --- fingerprinting / dedup ----------------------------------------------

@query("doc_fingerprint", f"""
    SELECT doc_id, md5({_CLEAN}) AS fingerprint FROM documents
""")
def doc_fingerprint(spark, sf_dir):
    """Content fingerprint: md5 of the normalized (cleaned) text — both
    engines emit identical lowercase hex."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.md5(clean_text(F.col("text"))).alias("fingerprint"))


@query("dedup_exact_docs", f"""
    SELECT doc_id, fingerprint FROM (
        SELECT doc_id, md5({_CLEAN}) AS fingerprint,
               row_number() OVER (PARTITION BY md5({_CLEAN}) ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
""")
def dedup_exact_docs(spark, sf_dir):
    """Exact near-copy removal: hash-groupBy on the content fingerprint,
    deterministic survivor (min doc_id).  The survivor rule is a plain
    min(doc_id) AGGREGATE, not a row_number window: aggregates combine
    map-side, so even a fingerprint shared by billions of rows (empty
    docs, a boilerplate page) collapses to one row per map task before
    the shuffle — a window would sort all of them in one partition
    with no AQE skew relief.  At 100 TB this is the standard first
    dedup pass: one narrow shuffle on the 128-bit hash."""
    df = _docs(spark, sf_dir).select(
        "doc_id", F.md5(clean_text(F.col("text"))).alias("fingerprint"))
    return (df.groupBy("fingerprint")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id", "fingerprint"))


def _naive_jaccard_pairs_sql(scope: str, t: float) -> str:
    """Brute-force exact-Jaccard pair SQL (all pairs sharing any
    shingle) — the shared oracle of dedup_ngram_jaccard (bounded
    scope) and dedup_setsim_prefix (full corpus; the prefix filter is
    lossless so its output IS the brute-force answer)."""
    return f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents{scope}),
    sh AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) >= 3 THEN
                list_transform(range(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            ELSE [] END)) AS shingle
        FROM d),
    cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
    SELECT p.doc_a, p.doc_b,
           CAST(p.inter AS DOUBLE) / (ca.c + cb.c - p.inter) AS jaccard
    FROM pairs p
    JOIN cnt ca ON p.doc_a = ca.doc_id
    JOIN cnt cb ON p.doc_b = cb.doc_id
    WHERE CAST(p.inter AS DOUBLE) / (ca.c + cb.c - p.inter) >= {t}
"""


@query("dedup_ngram_jaccard",
       _naive_jaccard_pairs_sql(" WHERE doc_id < 200", 0.5))
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact token-3-gram Jaccard near-dup pairs (restricted to
    doc_id < 200 to bound the pair space for the oracle; the unbounded
    scale paths are dedup_setsim_prefix — exact, prefix-filtered — and
    dedup_minhash_near, which prunes candidates by LSH banding
    instead of joining every co-shingled pair)."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200).select(
        "doc_id", tokens_col().alias("toks"))
    sh = setsim_shingles(d)
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("c"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("c").alias("ca"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("c").alias("cb"))
    jac = F.col("inter").cast("double") / (F.col("ca") + F.col("cb") - F.col("inter"))
    return (
        pairs.join(ca, "doc_a").join(cb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


_SETSIM_T = 0.5

@query("dedup_setsim_prefix", _naive_jaccard_pairs_sql("", _SETSIM_T))
def dedup_setsim_prefix(spark, sf_dir):
    """EXACT set-similarity self-join (token-3-gram Jaccard >= 0.5)
    over the FULL corpus via prefix filtering (PPJoin-family:
    Chaudhuri et al. SSJoin / Xiao et al. PPJoin) — the lossless scale
    path between ``dedup_ngram_jaccard`` (naive co-shingle join,
    oracle-bounded to doc_id < 200 because common shingles make the
    candidate set quadratic) and ``dedup_minhash_near`` (LSH,
    approximate).

    Mechanics: order each doc's shingle set rarest-first by global
    document frequency (ties by shingle text); a pair with
    J >= t MUST share an element within the first
    |s| - ceil(t*|s|) + 1 elements of each side, so candidates form
    only on shared PREFIX elements — the frequent shingles that
    explode the naive join sit at the suffix end and never generate
    pairs.  A size filter (t*|a| <= |b|) prunes further; survivors
    get ONE exact array_intersect verification against the full
    sorted sets.  The oracle is the brute-force join — prefix
    filtering is lossless, so outputs hash-match it bitwise.

    At 100 TB: df ranking is one hash agg on the shingle vocabulary;
    the candidate join keys on rare prefix shingles (bounded fan-out
    by construction, no LSH tuning, no false negatives); the per-doc
    sorted-set table is built once and checkpointed as the stored
    index artifact (three consumers).  Candidate pruning measured in
    SCALING.md."""
    return corpus_setsim_pairs(spark, sf_dir)


_CORPUS_SETSIM_PAIRS_MEMO = SessionMemo()


def corpus_setsim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, jaccard): the EXACT verified J >= 0.5 duplicate
    pair set over the corpus — the terminal setsim artifact.  Both
    dedup_setsim_prefix (which returns it) and neardup_lsh_eval (which
    uses it as ground truth for the LSH arm) previously re-ran the
    candidate+verify join per call (VERDICT r6 item 5); like the other
    corpus artifacts it now persists on disk for the read-only roots
    and recomputes only when the source parquet changes."""
    p = _CORPUS_SETSIM_PAIRS_MEMO.get(spark, sf_dir)
    if p is None:
        def build():
            per_doc = corpus_setsim_index(spark, sf_dir)
            return setsim_verify(per_doc, setsim_candidates(per_doc))
        if _memoizable(sf_dir):
            p = read_or_build(spark, sf_dir, "corpus_setsim_pairs",
                              ("documents",), build)
        else:
            p = build()
        _CORPUS_SETSIM_PAIRS_MEMO.put(spark, sf_dir, p)
    return p


def setsim_shingles(d: DataFrame) -> DataFrame:
    """(doc_id, shingle): each doc's DISTINCT token 3-grams, from a
    (doc_id, toks) frame — the set elements of the setsim join."""
    shingles = F.when(
        F.size("toks") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 2),
            lambda i: F.concat_ws(" ", F.element_at("toks", i),
                                  F.element_at("toks", i + 1),
                                  F.element_at("toks", i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select("doc_id",
                    F.explode(F.array_distinct(shingles)).alias("shingle"))


# corpus (doc_id, shingle) relation, session-memoized handle over the
# on-disk artifact — see corpus_shingles.
_CORPUS_SHINGLES_MEMO = SessionMemo()


def corpus_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full-corpus (doc_id, shingle) distinct token-3-gram table,
    materialized ONCE per dataset and shared by every full-corpus gram
    consumer (dedup_setsim_prefix, decontam_benchmark,
    decontam_fuzzy_overlap, sketch_bloom_decontam, dedup_minhash_near,
    dedup_simhash_near) — previously each query re-tokenized and
    re-exploded the whole corpus (VERDICT r4 item 6 / r5 item 3).

    This is the stored-artifact shape at 100 TB, now literal (VERDICT
    r6 item 2): for the read-only testdata roots the gram table is
    written once as a manifest-committed parquet snapshot
    (``artifacts.read_or_build``) and every later SESSION reads it
    from disk instead of recomputing; within a session the weak-keyed
    memo hands all consumers the same DataFrame.  Mutable directories
    (tests' tmp corpora, user paths) keep the session-local
    localCheckpoint.  Queries that only need a doc_id-bounded slice
    (dedup_ngram_jaccard, dedup_containment) deliberately do NOT use
    this: their filter belongs on the parquet scan, not after a
    corpus-wide materialization."""
    sh = _CORPUS_SHINGLES_MEMO.get(spark, sf_dir)
    if sh is None:
        def build():
            d = _docs(spark, sf_dir).select("doc_id",
                                            tokens_col().alias("toks"))
            return setsim_shingles(d)
        if _memoizable(sf_dir):
            sh = read_or_build(spark, sf_dir, "corpus_shingles",
                               ("documents",), build)
        else:
            sh = build().localCheckpoint(eager=True)
        _CORPUS_SHINGLES_MEMO.put(spark, sf_dir, sh)
    return sh


_CORPUS_SETSIM_INDEX_MEMO = SessionMemo()


def corpus_setsim_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-doc rarest-first sorted-set index over corpus_shingles,
    built once per dataset (disk artifact for the read-only roots,
    session checkpoint otherwise) — dedup_setsim_prefix and
    neardup_lsh_eval consume the identical index, and setsim_index's
    own eager checkpoint previously re-ran per call."""
    idx = _CORPUS_SETSIM_INDEX_MEMO.get(spark, sf_dir)
    if idx is None:
        def build():
            return setsim_index(corpus_shingles(spark, sf_dir))
        if _memoizable(sf_dir):
            idx = read_or_build(spark, sf_dir, "corpus_setsim_index",
                                ("documents",), build)
        else:
            idx = build()
        _CORPUS_SETSIM_INDEX_MEMO.put(spark, sf_dir, idx)
    return idx


def setsim_index(sh: DataFrame) -> DataFrame:
    """(doc_id, arr, sz): the per-doc rarest-first sorted element
    array — the stored setsim index.  Consumed three times downstream
    (prefix explode + both verify sides), so materialize once
    (round-3 gotcha: reused subframes re-execute)."""
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    return (sh.join(dfreq, "shingle")
            .groupBy("doc_id")
            .agg(F.transform(
                F.sort_array(F.collect_list(F.struct("df", "shingle"))),
                lambda s: s["shingle"]).alias("arr"))
            .withColumn("sz", F.size("arr"))
            .localCheckpoint(eager=True))


# Pruning bounds below loosen by this slack before comparing, so a
# float rounding ABOVE the exact rational bound can never discard a
# true pair (e.g. ceil(0.18/1.18 * 413) = 64 in doubles vs 63 exact).
# All corpus quantities are integers, so 1e-9 is orders of magnitude
# below the spacing that could ever admit a wrong candidate — and a
# too-loose bound only costs a verify probe, never correctness.
_SETSIM_EPS = 1e-9


def setsim_prefix_rows(per_doc: DataFrame,
                       t: float = _SETSIM_T) -> DataFrame:
    """(doc_id, sz, p, shingle): each doc's prefix elements (the first
    |s| - ceil(t*|s|) + 1 under the index's total order) with their
    0-based positions — the probe rows of the prefix filter."""
    plen = (F.col("sz")
            - F.ceil(F.lit(t) * F.col("sz") - F.lit(_SETSIM_EPS))
            .cast("int") + 1)
    return per_doc.select(
        "doc_id", "sz",
        F.posexplode(F.slice("arr", F.lit(1), plen)).alias("p", "shingle"))


def setsim_candidates_between(pa: DataFrame, pb: DataFrame, pair_filter,
                              t: float = _SETSIM_T) -> DataFrame:
    """(doc_a, doc_b): candidate pairs between two prefix-row frames
    sharing a PREFIX element, with the size filter and PPJoin's
    POSITIONAL upper bound applied — the lossless pruned pair space
    (``pair_filter`` dedups the self-join case, e.g. doc_a < doc_b).

    The positional filter: a shared prefix element at (1-based)
    positions i of a / j of b caps the achievable overlap at
    1 + min(sz_a - i, sz_b - j) (everything before the match on
    either side is disjoint under the shared total order); J >= t
    needs overlap >= t/(1+t) * (sz_a+sz_b), so occurrences whose cap
    falls short generate no pair.  The first shared prefix element
    carries the loosest cap, so keeping pairs where ANY occurrence
    passes is exact — both filters prune only on true upper bounds,
    compared with _SETSIM_EPS slack so float rounding cannot tighten
    them (the oracle equality pins losslessness at three SFs;
    SCALING.md measures the candidate cut)."""
    a = pa.select(F.col("shingle"), F.col("doc_id").alias("doc_a"),
                  F.col("p").alias("_pa"), F.col("sz").alias("_sa"))
    b = pb.select(F.col("shingle").alias("_sh_b"),
                  F.col("doc_id").alias("doc_b"),
                  F.col("p").alias("_pb"), F.col("sz").alias("_sb"))
    eps = F.lit(_SETSIM_EPS)
    ub = F.lit(1) + F.least(F.col("_sa") - (F.col("_pa") + 1),
                            F.col("_sb") - (F.col("_pb") + 1))
    return (a.join(b, (F.col("shingle") == F.col("_sh_b")) & pair_filter)
            .filter((F.col("_sb") >= F.lit(t) * F.col("_sa") - eps)
                    & (F.col("_sa") >= F.lit(t) * F.col("_sb") - eps)
                    & (ub * F.lit(1.0 + t)
                       >= F.lit(t) * (F.col("_sa") + F.col("_sb")) - eps))
            .select("doc_a", "doc_b")
            .distinct())


def setsim_candidates(per_doc: DataFrame,
                      t: float = _SETSIM_T) -> DataFrame:
    """Self-join candidates over one per-doc index (doc_a < doc_b)."""
    pre = setsim_prefix_rows(per_doc, t)
    return setsim_candidates_between(
        pre, pre, F.col("doc_a") < F.col("doc_b"), t)


def setsim_verify_pairs(cand: DataFrame, arrs_a: DataFrame,
                        arrs_b: DataFrame,
                        t: float = _SETSIM_T) -> DataFrame:
    """Exact verification: join (doc_a, doc_b) candidates back to the
    full sorted sets on each side, one array_intersect per pair, keep
    J >= t.  Output: (doc_a, doc_b, jaccard)."""
    aa = arrs_a.select(F.col("doc_id").alias("doc_a"),
                       F.col("arr").alias("arr_a"),
                       F.col("sz").alias("sz_a"))
    ab = arrs_b.select(F.col("doc_id").alias("doc_b"),
                       F.col("arr").alias("arr_b"),
                       F.col("sz").alias("sz_b"))
    inter = F.size(F.array_intersect("arr_a", "arr_b"))
    jac = (F.col("inter").cast("double")
           / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
    return (cand.join(aa, "doc_a").join(ab, "doc_b")
            .withColumn("inter", inter)
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= t)
            .select("doc_a", "doc_b", "jaccard"))


def setsim_verify(per_doc: DataFrame, cand: DataFrame,
                  t: float = _SETSIM_T) -> DataFrame:
    """Self-join verification against one per-doc index."""
    return setsim_verify_pairs(cand, per_doc, per_doc, t)


# --- TF-IDF ---------------------------------------------------------------

@query("text_tfidf", f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
    dfreq AS (SELECT token, count(*) AS dfreq FROM tf GROUP BY token),
    n AS (SELECT count(*) AS n FROM documents)
    SELECT tf.doc_id, tf.token, tf.tf,
           round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.dfreq), 6) AS tfidf
    FROM tf CROSS JOIN n JOIN dfreq ON tf.token = dfreq.token
""")
def text_tfidf(spark, sf_dir):
    """Exact TF-IDF (tf * ln(N/df)) without MLlib's hashing trick, so it
    is oracle-checkable.  Two hash aggs + one broadcast-ish join on the
    (small) vocabulary; rounded to 6dp to absorb libm ulp differences."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(tokens_col()).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("dfreq"))
    n = _docs(spark, sf_dir).agg(F.count("*").alias("n"))
    return (
        tf.crossJoin(F.broadcast(n))
        .join(F.broadcast(dfreq), "token")  # vocab << corpus: broadcast
        .select(
            "doc_id", "token", "tf",
            F.round(F.col("tf") * F.log(F.col("n").cast("double") / F.col("dfreq")), 6)
            .alias("tfidf"),
        )
    )


@query("pipeline_training_data", f"""
    WITH t AS (
      SELECT doc_id, lang, text, {_TOKS_SQL} AS toks, md5({_CLEAN}) AS fingerprint
      FROM documents
    ),
    q AS (
      SELECT *,
             (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                 / CAST(length(text) AS DOUBLE))
               * LEAST(1.0, len(toks) / 50.0) AS quality
      FROM t WHERE length(text) > 0 AND len(toks) >= 5
    ),
    d AS (
      SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
      FROM q WHERE quality >= 0.5
    )
    SELECT doc_id, lang, CAST(len(toks) AS INTEGER) AS n_tokens,
           round(quality, 6) AS quality
    FROM d WHERE rn = 1
""")
def pipeline_training_data(spark, sf_dir):
    """The end-to-end pretraining-corpus cleaning pipeline as ONE plan:
    tokenize -> quality score -> quality/length gate -> exact dedup
    (min-doc_id survivor per content fingerprint) -> per-doc stats.

    Plan shape at 100 TB: a single scan computes tokens/quality/
    fingerprint in one projection (all codegen'd); the quality gate
    filters BEFORE the dedup shuffle so only surviving docs are hashed
    across the cluster; the one exchange is the fingerprint aggregate
    (min(struct) survivor — map-side combinable, so a hot fingerprint
    collapses per task instead of piling into a window sort).
    Composes the same expressions as text_quality_score/dedup_exact_docs
    — this query exists to prove they fuse into one pipeline without
    materialization barriers."""
    toks = tokens_col()
    df = _docs(spark, sf_dir).select(
        "doc_id", "lang", "text", toks.alias("toks"),
        F.md5(clean_text(F.col("text"))).alias("fingerprint"))
    # positive-run form of `replace('[^a-zA-Z0-9 ]','')` — identical
    # count, 34x faster on java.util.regex (see functions/text.py)
    punct = (F.length("text") - F.length(F.array_join(
        F.regexp_extract_all("text", F.lit("[a-zA-Z0-9 ]+"), F.lit(0)), ""))) \
        / F.length("text").cast("double")
    quality = (F.lit(1.0) - punct) * F.least(F.lit(1.0), F.size("toks") / F.lit(50.0))
    gated = (
        df.filter((F.length("text") > 0) & (F.size("toks") >= 5))
        .withColumn("quality", quality)
        .filter(F.col("quality") >= 0.5)
    )
    return (
        gated.select("fingerprint", F.struct(
            "doc_id", "lang",
            F.size("toks").cast("int").alias("n_tokens"),
            F.round("quality", 6).alias("quality")).alias("row"))
        .groupBy("fingerprint").agg(F.min("row").alias("row"))
        .select("row.doc_id", "row.lang", "row.n_tokens", "row.quality")
    )


@query("text_bigram_freq", f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    bigrams AS (
      SELECT unnest(list_transform(
               list_filter(t, (x, i) -> i < len(t)),
               (x, i) -> concat(t[i], ' ', t[i + 1]))) AS bigram
      FROM toks WHERE len(t) >= 2
    )
    SELECT bigram, count(*) AS n FROM bigrams
    GROUP BY bigram HAVING count(*) >= 5
""")
def text_bigram_freq(spark, sf_dir):
    """Corpus bigram counts (the n-gram LM / contamination-check
    primitive beside text_token_freq's unigrams).  Adjacent-pair arrays
    are built with transform over an index sequence (no self-join);
    one Generate + one hash agg — the same two-step shape at 100 TB."""
    toks = tokens_col()
    d = _docs(spark, sf_dir).select(toks.alias("t")).filter(F.size("t") >= 2)
    bigrams = d.select(F.explode(F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat_ws(" ", F.element_at("t", i), F.element_at("t", i + 1)),
    )).alias("bigram"))
    return bigrams.groupBy("bigram").agg(F.count("*").alias("n")).filter(
        F.col("n") >= 5)


_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PHONE_RE = "\\b\\d{3}-\\d{4}\\b"


@query("text_pii_scrub", f"""
    WITH seeded AS (
      SELECT doc_id,
             concat(substring(text, 1, 40),
                    CASE WHEN doc_id % 5 = 0
                         THEN concat(' contact user', CAST(doc_id AS VARCHAR),
                                     '@example.com now') ELSE '' END,
                    CASE WHEN doc_id % 7 = 0 THEN ' call 555-1234'
                         ELSE '' END) AS txt
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(txt, '{_EMAIL_RE}')) AS INT) AS n_emails,
           regexp_replace(regexp_replace(txt, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
    FROM seeded
""")
def text_pii_scrub(spark, sf_dir):
    """PII scrubbing — the redaction pass every training-data pipeline
    runs before tokenization: emails and phone-shaped digit runs are
    replaced with typed placeholder tags, plus a per-doc match count
    for audit metrics.  Pure per-row regexes: no shuffle, fully
    codegen'd, scales linearly with input splits (contrast the
    reference, which stores raw user text verbatim,
    kafka_consumer_simple.py:131).  The synthetic corpus contains no
    PII, so both engines seed identical fake emails/phones into the
    input deterministically — the oracle is non-vacuous by
    construction (SURVEY.md §5 vacuous-gate rule)."""
    docs = _docs(spark, sf_dir)
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 40),
            F.when(F.col("doc_id") % 5 == 0,
                   F.concat(F.lit(" contact user"),
                            F.col("doc_id").cast("string"),
                            F.lit("@example.com now"))).otherwise(""),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" call 555-1234"))
            .otherwise(""),
        ).alias("txt"))
    email, phone = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", r"\b\d{3}-\d{4}\b"
    return seeded.select(
        "doc_id",
        F.size(F.regexp_extract_all("txt", F.lit(email), F.lit(0)))
        .cast("int").alias("n_emails"),
        F.regexp_replace(F.regexp_replace("txt", email, "<EMAIL>"),
                         phone, "<PHONE>").alias("scrubbed"))


# --- Training-corpus assembly ops ----------------------------------------

@query("split_train_val_test", """
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                     BETWEEN '0' AND 'c' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                     IN ('d', 'e') THEN 'val'
                ELSE 'test' END AS split
    FROM documents
""")
def split_train_val_test(spark, sf_dir):
    """Deterministic hash-based train/val/test assignment — the split
    must be a pure function of a stable key (never rand(): re-runs and
    late-arriving shards would scramble membership and leak val into
    train).  First hex nibble of md5(doc_id): 0-c train (13/16),
    d-e val (2/16), f test (1/16).  Embarrassingly parallel — a
    per-row expression with no shuffle; at 100 TB this tags at scan
    speed and the split column doubles as a partition key for the
    output layout."""
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.when(b.between("0", "c"), "train")
         .when(b.isin("d", "e"), "val")
         .otherwise("test").alias("split"))


@query("split_group_holdout", f"""
    WITH e AS (SELECT event_id, user_id FROM events),
    tagged AS (
      SELECT user_id, event_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       BETWEEN '0' AND 'c' THEN 'train'
                  WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       IN ('d', 'e') THEN 'val'
                  ELSE 'test' END AS g_split,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1)
                       BETWEEN '0' AND 'c' THEN 'train'
                  WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1)
                       IN ('d', 'e') THEN 'val'
                  ELSE 'test' END AS r_split
      FROM e),
    u AS (
      SELECT 'group' AS strategy, g_split AS split, user_id,
             count(*) AS n_events FROM tagged GROUP BY 2, 3
      UNION ALL
      SELECT 'row', r_split, user_id, count(*) FROM tagged GROUP BY 2, 3),
    spans AS (
      SELECT strategy, user_id, count(*) AS n_splits
      FROM u GROUP BY strategy, user_id)
    SELECT u.strategy, u.split,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(SUM(u.n_events) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN s.n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS users_leaked
    FROM u JOIN spans s
      ON s.strategy = u.strategy AND s.user_id = u.user_id
    GROUP BY u.strategy, u.split
""")
def split_group_holdout(spark, sf_dir):
    """GROUP-level train/val/test holdout vs naive row-level splitting,
    with the leakage measured: assigning by md5(user_id) keeps every
    user's events in ONE split (users_leaked = 0 by construction —
    the GroupKFold discipline that stops a model from memorizing a
    user in train and being graded on the same user in val), while
    the row-level md5(event_id) split leaks almost every active user
    across splits (users_leaked ~ n_users for 13/2/1 proportions).
    Same 13/2/1 hex-nibble rule as split_train_val_test so the two
    strategies differ only in the hashed KEY.

    At 100 TB both taggings are per-row expressions riding the scan;
    the audit is one (strategy, user) agg + a count-distinct-splits
    self-join — shuffle keyed on user_id, never event-sized output."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")

    def tag(c):
        b = F.substring(F.md5(F.col(c).cast("string")), 1, 1)
        return (F.when(b.between("0", "c"), "train")
                .when(b.isin("d", "e"), "val")
                .otherwise("test"))

    tagged = ev.select("user_id", "event_id",
                       tag("user_id").alias("g_split"),
                       tag("event_id").alias("r_split"))
    u = (tagged.groupBy(F.lit("group").alias("strategy"),
                        F.col("g_split").alias("split"), "user_id")
         .agg(F.count("*").alias("n_events"))
         .unionByName(
             tagged.groupBy(F.lit("row").alias("strategy"),
                            F.col("r_split").alias("split"), "user_id")
             .agg(F.count("*").alias("n_events"))))
    spans = (u.groupBy("strategy", "user_id")
             .agg(F.count("*").alias("n_splits")))
    return (u.join(spans, ["strategy", "user_id"])
            .groupBy("strategy", "split")
            .agg(F.count("*").cast("bigint").alias("n_users"),
                 F.sum("n_events").cast("bigint").alias("n_events"),
                 F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
                 .cast("bigint").alias("users_leaked")))


@query("pack_sequences", f"""
    WITH d AS (
      SELECT doc_id, source, len({_TOKS_SQL}) AS n_tok FROM documents),
    c AS (
      SELECT doc_id, source, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tok AS start_off
      FROM d)
    SELECT doc_id, source, n_tok,
           CAST(FLOOR(start_off / 2048) AS BIGINT) AS pack_id
    FROM c
""")
def pack_sequences(spark, sf_dir):
    """Sequence packing (concat-then-chunk): documents are laid out
    back-to-back per source in stable doc_id order and cut into 2048-
    token context windows; each doc is tagged with the window its first
    token lands in.  This is the standard LLM pretraining layout (no
    bin-packing search, which is inherently serial): one running-sum
    window per source partition — a single shuffle on `source`, and at
    100 TB the window state is a single accumulator per partition, so
    packing runs at shuffle speed.  Exactly reproducible: ordering key
    is the unique doc_id."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "source", F.size(tokens_col()).alias("n_tok"))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start_off")
    return d.select("doc_id", "source", "n_tok", start).select(
        "doc_id", "source", "n_tok",
        F.floor(F.col("start_off") / 2048).cast("bigint").alias("pack_id"))


@query("decontam_benchmark", f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct(
          CASE WHEN len(toks) >= 3 THEN
              list_transform(range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
          ELSE [] END)) AS shingle
      FROM d),
    bench AS (SELECT shingle FROM sh WHERE doc_id % 97 = 0),
    train AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
    SELECT DISTINCT t.doc_id
    FROM train t JOIN bench b ON t.shingle = b.shingle
""")
def decontam_benchmark(spark, sf_dir):
    """Benchmark decontamination: flag training documents sharing any
    token-3-gram with a held-out benchmark set (here: doc_id % 97 = 0
    as the stand-in eval split).  Plan shape is a left-SEMI join on the
    shingle — each training doc emits at most once, no pair explosion;
    the benchmark side is tiny (~1% of docs) so Catalyst broadcasts its
    shingle set and the training side never shuffles.  At 100 TB:
    hash the shingles (xxhash64) instead of shipping strings, and the
    broadcast stays MB-sized regardless of corpus size."""
    sh = corpus_shingles(spark, sf_dir)
    bench = sh.filter(F.col("doc_id") % 97 == 0).select("shingle")
    train = sh.filter(F.col("doc_id") % 97 != 0)
    return (train.join(F.broadcast(bench), "shingle", "left_semi")
            .select("doc_id").distinct())


@query("decontam_fuzzy_overlap", f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct(
          CASE WHEN len(toks) >= 3 THEN
              list_transform(range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
          ELSE [] END)) AS shingle
      FROM d),
    ns AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    bench AS (SELECT doc_id AS b_id, shingle FROM sh WHERE doc_id % 97 = 0),
    train AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
    shared AS (
      SELECT t.doc_id, b.b_id, count(*) AS n_shared
      FROM train t JOIN bench b ON t.shingle = b.shingle
      GROUP BY t.doc_id, b.b_id),
    mx AS (SELECT doc_id, max(n_shared) AS max_shared FROM shared GROUP BY doc_id)
    SELECT m.doc_id, CAST(n.n_sh AS BIGINT) AS n_shingles,
           CAST(m.max_shared AS BIGINT) AS max_shared,
           CAST(m.max_shared * 2 >= n.n_sh AS INT) AS contaminated
    FROM mx m JOIN ns n ON n.doc_id = m.doc_id
""")
def decontam_fuzzy_overlap(spark, sf_dir):
    """FUZZY benchmark decontamination — the overlap-ratio upgrade of
    decontam_benchmark (which flags on ANY single shared 3-gram, far
    too trigger-happy for real corpora): a training document is
    contaminated when >= 50%% of its distinct token-3-grams appear in
    one single benchmark document.  All arithmetic is integer (shared
    count x2 vs shingle count), so the verdict is engine-exact — no
    float ratio in the hashed output.  Plan shape: inverted-index join
    through shared shingles only (never all pairs), the ~1%% benchmark
    side broadcasts, then two bounded aggs (per-pair count, per-doc
    max).  At 100 TB: xxhash64 the shingles so the broadcast ships
    8-byte keys, and cap per-shingle fan-out by dropping stop-shingles
    (df above a threshold) exactly like the sparse-cosine IDF floor."""
    sh = corpus_shingles(spark, sf_dir)
    ns = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    bench = (sh.filter(F.col("doc_id") % 97 == 0)
             .select(F.col("doc_id").alias("b_id"), "shingle"))
    train = sh.filter(F.col("doc_id") % 97 != 0)
    shared = (train.join(F.broadcast(bench), "shingle")
              .groupBy("doc_id", "b_id").agg(F.count("*").alias("n_shared")))
    mx = shared.groupBy("doc_id").agg(F.max("n_shared").alias("max_shared"))
    return (mx.join(ns, "doc_id")
            .select("doc_id",
                    F.col("n_sh").cast("bigint").alias("n_shingles"),
                    F.col("max_shared").cast("bigint").alias("max_shared"),
                    (F.col("max_shared") * 2 >= F.col("n_sh"))
                    .cast("int").alias("contaminated")))


MIXTURE_WEIGHTS = [
    # (source-prefix bucket, keep fraction as a 6-nibble hex threshold)
    # 'zzzzzz' sorts above every hex digest prefix => keep all.
    ("src0", "zzzzzz"), ("src1", "zzzzzz"), ("src2", "zzzzzz"),
    ("src3", "800000"), ("src4", "800000"), ("src5", "800000"),
    ("src6", "400000"), ("src7", "400000"), ("src8", "200000"),
    ("src9", "100000"),
]
_W_SQL = ", ".join(f"('{s}', '{h}')" for s, h in MIXTURE_WEIGHTS)


@query("sample_mixture_weights", f"""
    WITH w(source, keep_hex) AS (VALUES {_W_SQL})
    SELECT d.doc_id, d.source
    FROM documents d JOIN w ON d.source = w.source
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6) < w.keep_hex
""")
def sample_mixture_weights(spark, sf_dir):
    """Source-mixture resampling: each corpus source keeps a configured
    fraction of its documents (the data-mixture knob of a pretraining
    run — upweight curated sources, downsample crawl).  Deterministic,
    not rand(): a doc survives iff its md5 hex prefix sorts below the
    source's 6-nibble threshold, so membership is a pure function of
    (doc_id, weights) — stable under re-runs, restarts, and shard
    arrival order, and lexicographic hex compare equals numeric
    compare.  Plan: the weights dim is rows-sized-by-#sources —
    broadcast join, per-row filter, zero shuffles of the corpus."""
    w = spark.createDataFrame(MIXTURE_WEIGHTS, ["source", "keep_hex"])
    d = _docs(spark, sf_dir)
    return (d.join(F.broadcast(w), "source")
            .filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6)
                    < F.col("keep_hex"))
            .select("doc_id", "source"))


@query("sample_temperature_mixture", """
    WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    r AS (SELECT source, n,
                 CAST(round(pow(CAST(n AS DOUBLE), 0.7), 6)
                      AS DECIMAL(18,6)) AS rs
          FROM counts),
    tot AS (SELECT SUM(rs) AS t FROM r)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           round(CAST(rs AS DOUBLE) / CAST(t AS DOUBLE), 6) AS p_sample,
           CAST(floor(1000 * (CAST(rs AS DOUBLE) / CAST(t AS DOUBLE)))
                AS BIGINT) AS budget_docs
    FROM r CROSS JOIN tot
""")
def sample_temperature_mixture(spark, sf_dir):
    """Temperature-scaled source sampling weights — the standard
    multilingual/multi-source rebalancing rule p_s ∝ n_s^α with
    α = 0.7 (upweights small sources relative to proportional
    sampling without letting giants dominate), plus each source's
    document budget for a 1000-doc draw.  Complements
    sample_mixture_weights (hand-set fractions) with the *computed*
    mixture knob.  Exactness recipe: the single pow() per source is
    6dp-rounded into a decimal, the normalizer is an exact decimal
    sum, and the final ratio is one double division — order-free on
    both engines.  The whole query aggregates to #sources rows before
    any arithmetic: one map-side-partial agg over the corpus,
    everything after is metadata-sized."""
    counts = _docs(spark, sf_dir).groupBy("source").agg(F.count("*").alias("n"))
    r = counts.select(
        "source", "n",
        F.round(F.pow(F.col("n").cast("double"), 0.7), 6)
        .cast("decimal(18,6)").alias("rs"))
    tot = r.agg(F.sum("rs").alias("t"))
    p = F.col("rs").cast("double") / F.col("t").cast("double")
    return (r.crossJoin(F.broadcast(tot))
            .select("source", F.col("n").cast("bigint").alias("n_docs"),
                    F.round(p, 6).alias("p_sample"),
                    F.floor(F.lit(1000) * p).cast("bigint")
                    .alias("budget_docs")))


@query("dedup_levenshtein_blocked", """
    WITH d AS (SELECT doc_id, lang, substr(lower(text), 1, 40) AS head
               FROM documents WHERE doc_id < 200)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.head, b.head) AS INTEGER) AS dist
    FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= 20
""")
def dedup_levenshtein_blocked(spark, sf_dir):
    """Fuzzy near-dup pairs by EDIT DISTANCE with blocking: candidate
    pairs form only within a blocking key (lang) and compare a bounded
    prefix, so the quadratic comparator runs on small buckets instead
    of the corpus cross product — the classic record-linkage
    complement to shingle Jaccard (catches char-level typos that break
    token 3-grams).  Built-in levenshtein on both engines; integer
    distances, no rounding rule needed.  At 100 TB: block on
    (lang, length-band) and cap prefix length; the join stays
    within-bucket quadratic, never global."""
    d = (_docs(spark, sf_dir).filter(F.col("doc_id") < 200)
         .select("doc_id", "lang",
                 F.substring(F.lower("text"), 1, 40).alias("head")))
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (a.join(b, (F.col("a.lang") == F.col("b.lang"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .filter(dist <= 20)
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    dist.cast("int").alias("dist")))


@query("er_sorted_neighborhood", """
    WITH d AS (SELECT doc_id, lang, substr(lower(text), 1, 40) AS head
               FROM documents),
    n AS (SELECT doc_id, head,
                 lead(doc_id, 1) OVER w AS d1, lead(head, 1) OVER w AS h1,
                 lead(doc_id, 2) OVER w AS d2, lead(head, 2) OVER w AS h2,
                 lead(doc_id, 3) OVER w AS d3, lead(head, 3) OVER w AS h3
          FROM d WINDOW w AS (PARTITION BY lang ORDER BY head, doc_id)),
    u AS (
      SELECT doc_id AS doc_a, d1 AS doc_b, 1 AS gap,
             levenshtein(head, h1) AS dist FROM n WHERE d1 IS NOT NULL
      UNION ALL
      SELECT doc_id, d2, 2, levenshtein(head, h2) FROM n WHERE d2 IS NOT NULL
      UNION ALL
      SELECT doc_id, d3, 3, levenshtein(head, h3) FROM n WHERE d3 IS NOT NULL)
    SELECT doc_a, doc_b, CAST(gap AS INTEGER) AS gap,
           CAST(dist AS INTEGER) AS dist
    FROM u WHERE dist <= 20
""")
def er_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood entity resolution (Hernandez-Stolfo merge/
    purge): sort records by a blocking key (normalized 40-char text
    head) within each lang partition and compare each record only to
    its next w=3 neighbors in sort order — candidate generation is
    O(n·w) regardless of block-size skew, the classic fix for
    hash-blocking's giant-bucket problem (``dedup_levenshtein_blocked``
    blocks on lang alone, so one dominant lang degrades to quadratic;
    here a hot key costs exactly 3 comparisons per row).

    Implementation is window-native: lead(1..3) within the sort — no
    self-join, no candidate materialization; unpivot + the edit-
    distance gate run in the same stage.  At 100 TB the sort is
    repartitionByRange on (lang, head) — Spark's window exchange
    already range-splits per partition key; multi-pass production
    deployments re-run with a second key (e.g. reversed head) to
    catch prefix-divergent pairs, each pass this same plan."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang",
        F.substring(F.lower("text"), 1, 40).alias("head"))
    w = Window.partitionBy("lang").orderBy("head", "doc_id")
    n = d.select(
        "doc_id", "head",
        *[c for k in (1, 2, 3) for c in
          (F.lead("doc_id", k).over(w).alias(f"d{k}"),
           F.lead("head", k).over(w).alias(f"h{k}"))])
    parts = [
        n.filter(F.col(f"d{k}").isNotNull()).select(
            F.col("doc_id").alias("doc_a"),
            F.col(f"d{k}").alias("doc_b"),
            F.lit(k).alias("gap"),
            F.levenshtein("head", f"h{k}").alias("dist"))
        for k in (1, 2, 3)]
    u = parts[0].unionAll(parts[1]).unionAll(parts[2])
    return (u.filter(F.col("dist") <= 20)
            .select("doc_a", "doc_b", F.col("gap").cast("int").alias("gap"),
                    F.col("dist").cast("int").alias("dist")))


_TRIGRAMS_SQL = f"""
    SELECT doc_id, source,
           CASE WHEN len(t) >= 3
                THEN list_transform(generate_series(1, len(t) - 2),
                       i -> concat(t[i], ' ', t[i + 1], ' ', t[i + 2]))
                ELSE [] END AS grams
    FROM (SELECT doc_id, source, {_TOKS_SQL} AS t FROM documents)
"""


@query("text_repetition_stats", f"""
    WITH grams AS ({_TRIGRAMS_SQL}),
    per_doc AS (
      SELECT source,
             len(grams) AS n_grams,
             len(list_distinct(grams)) AS n_distinct
      FROM grams WHERE len(grams) > 0
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(SUM(n_grams) AS BIGINT) AS total_grams,
           CAST(SUM(n_grams) - SUM(n_distinct) AS DOUBLE) / SUM(n_grams)
             AS dup_gram_frac,
           CAST(SUM(CASE WHEN (n_grams - n_distinct) * 5 > n_grams
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
    FROM per_doc GROUP BY source
""")
def text_repetition_stats(spark, sf_dir):
    """Gopher-style within-document repetition audit (quality filtering
    for LLM corpora: Rae et al. 2021 drop docs whose duplicate-n-gram
    fraction is high).  Per doc the duplicate token-3-gram fraction is
    computed entirely inside per-row higher-order functions (sequence/
    transform/array_distinct — no explode, no shuffle); only per-source
    integer partials are aggregated, so the corpus-wide roll-up moves a
    handful of longs per source.  The "repetitive" flag (dup fraction
    > 0.2) is tested in exact integer arithmetic ((g - d) * 5 > g), and
    the per-source dup fraction is one double division of exact integer
    sums — both engine-deterministic with no rounding rule.  At 100 TB
    this is a pure map + tiny agg: no data movement beyond the scan.

    Two pushdown traps shape the code (both measured at sf0.1):
    the token array is bound to a column BEFORE the trigram lambda
    references it (a lambda body holding the raw split() tree re-runs
    the regex tokenizer per array element — O(len^2) per doc, 23.5s),
    and the emptiness filter is expressed as size(t) >= 3 at the
    tokenized level rather than n_grams > 0 at the end — predicate
    pushdown substitutes a late filter's column references, which
    would inline the ENTIRE trigram tree (4 more tokenizer runs) into
    the pushed condition (11s).  Together: 0.6s."""
    toked = (_docs(spark, sf_dir)
             .select("source", tokens_col().alias("t"))
             .filter(F.size("t") >= 3))     # == n_grams > 0, but cheap pushed
    t = F.col("t")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(t, i), F.element_at(t, i + 1),
            F.element_at(t, i + 2)),
    )
    per_doc = (toked
               .select("source", grams.alias("grams"))
               .select("source", F.size("grams").alias("n_grams"),
                       F.size(F.array_distinct("grams")).alias("n_distinct")))
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_grams").alias("total_grams"),
        (F.sum(F.col("n_grams") - F.col("n_distinct")).cast("double")
         / F.sum("n_grams")).alias("dup_gram_frac"),
        F.sum(F.when((F.col("n_grams") - F.col("n_distinct")) * 5
                     > F.col("n_grams"), 1).otherwise(0)).alias("n_repetitive"),
    )


@query("text_pmi_bigrams", f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    bigrams AS (
      SELECT unnest(list_transform(
               list_filter(t, (x, i) -> i < len(t)),
               (x, i) -> concat(t[i], ' ', t[i + 1]))) AS bigram
      FROM toks WHERE len(t) >= 2
    ),
    bi AS (SELECT bigram, count(*) AS n_xy FROM bigrams
           GROUP BY bigram HAVING count(*) >= 5),
    uni AS (SELECT unnest(t) AS token FROM toks),
    uf AS (SELECT token, count(*) AS n FROM uni GROUP BY token),
    tot AS (SELECT (SELECT count(*) FROM uni) AS n_uni,
                   (SELECT count(*) FROM bigrams) AS n_bi)
    SELECT bi.bigram, bi.n_xy,
           round(ln(CAST(bi.n_xy AS DOUBLE) * tot.n_uni * tot.n_uni
                    / ux.n / uy.n / tot.n_bi), 6) AS pmi
    FROM bi, tot
    JOIN uf ux ON ux.token = split_part(bi.bigram, ' ', 1)
    JOIN uf uy ON uy.token = split_part(bi.bigram, ' ', 2)
""")
def text_pmi_bigrams(spark, sf_dir):
    """Pointwise mutual information of corpus bigrams — the collocation
    / multi-word-expression detector of classic corpus analysis:
    pmi = ln(p(xy) / (p(x) p(y))).  Three hash aggs share one token
    Generate; the unigram table (vocab-sized) and the two scalar totals
    are broadcast into the bigram table, so nothing but the vocab moves.
    Double multiplications are written in the identical left-to-right
    order on both engines (IEEE ops are order-deterministic) and the
    single transcendental is rounded to 6dp per the registry rule.  At
    100 TB the plan is scan -> partial agg -> vocab-sized broadcast
    join: no fact-table shuffle beyond the bigram count itself."""
    t = tokens_col()
    d = _docs(spark, sf_dir).select(t.alias("t"))
    uni = d.select(F.explode("t").alias("token"))
    uf = uni.groupBy("token").agg(F.count("*").alias("n"))
    bigrams = (d.filter(F.size("t") >= 2)
               .select(F.explode(F.transform(
                   F.sequence(F.lit(1), F.size("t") - 1),
                   lambda i: F.concat_ws(" ", F.element_at("t", i),
                                         F.element_at("t", i + 1)),
               )).alias("bigram")))
    bi = (bigrams.groupBy("bigram").agg(F.count("*").alias("n_xy"))
          .filter(F.col("n_xy") >= 5))
    tot = uni.agg(F.count("*").alias("n_uni")).crossJoin(
        bigrams.agg(F.count("*").alias("n_bi")))
    ux = uf.select(F.col("token").alias("tok_x"), F.col("n").alias("n_x"))
    uy = uf.select(F.col("token").alias("tok_y"), F.col("n").alias("n_y"))
    return (bi.crossJoin(F.broadcast(tot))
            .withColumn("tok_x", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
            .withColumn("tok_y", F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)))
            .join(F.broadcast(ux), "tok_x")
            .join(F.broadcast(uy), "tok_y")
            .select("bigram", "n_xy",
                    F.round(F.log(F.col("n_xy").cast("double") * F.col("n_uni")
                                  * F.col("n_uni") / F.col("n_x") / F.col("n_y")
                                  / F.col("n_bi")), 6).alias("pmi")))


_PR_STEPS = 10
_PR_STEP_SQL = "".join(
    f""",
    r{i + 1} AS (
      SELECT n.v AS token,
             round(CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) *
                   CAST(SUM(CAST(round(n.share * r{i}.rank, 9)
                                 AS DECIMAL(28,9))) AS DOUBLE), 9) AS rank
      FROM norm n JOIN r{i} ON n.u = r{i}.token
      GROUP BY n.v)"""
    for i in range(_PR_STEPS))


@query("graph_pagerank_tokens", f"""
    WITH toked AS (SELECT {_TOKS_SQL} AS t FROM documents),
    bg AS (
      SELECT unnest(
        CASE WHEN len(t) >= 2 THEN
          list_transform(range(1, len(t)),
                         i -> struct_pack(u := t[i], v := t[i+1]))
        ELSE [] END) AS b
      FROM toked),
    flat AS (SELECT b.u AS u, b.v AS v FROM bg WHERE b.u <> b.v),
    ud AS (SELECT u, v FROM flat UNION ALL SELECT v, u FROM flat),
    edges AS (SELECT u, v, count(*) AS w FROM ud GROUP BY u, v),
    wdeg AS (SELECT u, SUM(w) AS wdeg FROM edges GROUP BY u),
    norm AS (SELECT e.u, e.v, e.w / wd.wdeg AS share
             FROM edges e JOIN wdeg wd ON wd.u = e.u),
    r0 AS (SELECT DISTINCT u AS token, CAST(1.0 AS DOUBLE) AS rank
           FROM norm){_PR_STEP_SQL}
    SELECT token, round(rank, 6) AS rank FROM r{_PR_STEPS}
""")
def graph_pagerank_tokens(spark, sf_dir):
    """TextRank (Mihalcea & Tarau 2004): PageRank over the token
    co-occurrence graph — the classic unsupervised keyword-importance
    scorer, and this engine's representative of the ITERATIVE
    fixed-point algorithm family (beside dedup_cluster_components'
    label propagation).

    Graph: adjacent-token pairs are undirected weighted edges
    (weight = corpus bigram count).  Iteration:
        r'(v) = (1-d) + d * sum_u w(u,v)/wdeg(u) * r(u)
    with damping d=0.85, 10 fixed passes.  Spark shape per pass: one
    broadcast join of the vocab-sized rank vector onto the edge list +
    one groupBy(dst) — the edge list itself is never re-shuffled
    (partitioned once on dst and localCheckpoint'd to truncate the
    growing iteration lineage; at 100 TB edges vastly exceed the rank
    vector, so broadcasting ranks, not edges, is the only viable
    orientation).

    FULLY oracle-checked despite being iterative: each pass's inflow
    accumulates 9dp-quantized decimal contributions (order-free exact
    sums — the registry's standard float recipe applied per iteration)
    and each new rank is re-quantized to 9dp, so all 10 passes are
    bit-reproducible across engines; the DuckDB twin unrolls the
    iterations as 10 chained CTEs.  Quantization at 1e-9 per pass
    perturbs total rank mass by < 1e-5 — far inside the conservation
    test's tolerance."""
    t = tokens_col()
    d = _docs(spark, sf_dir).select(t.alias("t")).filter(F.size("t") >= 2)
    pairs = d.select(F.explode(F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.struct(F.element_at("t", i).alias("u"),
                           F.element_at("t", i + 1).alias("v")),
    )).alias("e")).select("e.u", "e.v").filter(F.col("u") != F.col("v"))
    edges = (pairs.unionByName(pairs.select(F.col("v").alias("u"),
                                            F.col("u").alias("v")))
             .groupBy("u", "v").agg(F.count("*").alias("w")))
    wdeg = edges.groupBy("u").agg(F.sum("w").alias("wdeg"))
    # edge weight pre-normalized once: contribution share of u -> v
    norm = (edges.join(wdeg, "u")
            .select("u", "v", (F.col("w") / F.col("wdeg")).alias("share"))
            .repartition("v").localCheckpoint())
    ranks = norm.select(F.col("u").alias("token")).distinct() \
                .withColumn("rank", F.lit(1.0))
    for _ in range(_PR_STEPS):
        contrib = (norm.join(F.broadcast(ranks),
                             norm.u == ranks.token)
                   .groupBy("v")
                   .agg(F.sum(F.round(F.col("share") * F.col("rank"), 9)
                              .cast("decimal(28,9)")).alias("inflow")))
        ranks = (contrib.select(
            F.col("v").alias("token"),
            F.round(F.lit(0.15) + F.lit(0.85)
                    * F.col("inflow").cast("double"), 9)
            .alias("rank"))).localCheckpoint()
    return ranks.select("token", F.round("rank", 6).alias("rank"))


@query("text_surprisal_score", f"""
    WITH toked AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    tok AS (SELECT doc_id, unnest(t) AS token FROM toked),
    uf AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
    tot AS (SELECT count(*) AS n_tot FROM tok),
    scored AS (
      SELECT tok.doc_id,
             CAST(round(-ln(CAST(uf.n AS DOUBLE) / tot.n_tot), 6)
                  AS DECIMAL(18,6)) AS surprisal
      FROM tok, tot JOIN uf ON uf.token = tok.token)
    SELECT doc_id, count(*) AS n_tokens,
           CAST(SUM(surprisal) AS DOUBLE) / count(*) AS mean_surprisal
    FROM scored GROUP BY doc_id
""")
def text_surprisal_score(spark, sf_dir):
    """Per-document mean unigram surprisal (-ln p(token)) — the
    language-model perplexity proxy quality filter (CCNet / Wenzek et
    al. 2020 rank web documents by LM score; a corpus-trained unigram
    model is its cheapest honest stand-in).  The vocab-sized frequency
    table and the scalar total broadcast onto the token stream; each
    token's surprisal is rounded to 6dp THEN decimal-cast so the
    per-doc sum is exact-decimal (order-free) on both engines — the
    registry's transcendental and double-sum rules composed.  At
    100 TB: one explode + one vocab broadcast join + one doc-key agg,
    all map-side except the final per-doc combine."""
    toked = _docs(spark, sf_dir).select("doc_id", tokens_col().alias("t"))
    tok = toked.select("doc_id", F.explode("t").alias("token"))
    uf = tok.groupBy("token").agg(F.count("*").alias("n"))
    tot = tok.agg(F.count("*").alias("n_tot"))
    scored = (tok.crossJoin(F.broadcast(tot))
              .join(F.broadcast(uf), "token")
              .select("doc_id",
                      F.round(-F.log(F.col("n").cast("double") / F.col("n_tot")),
                              6).cast("decimal(18,6)").alias("surprisal")))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (F.sum("surprisal").cast("double") / F.count("*"))
        .alias("mean_surprisal"))


def _bpe_oracle_sql(steps: int = 10) -> str:
    """Unrolled-CTE DuckDB twin of the BPE training loop.  Key move:
    the greedy left-to-right merge fold is expressed as a string
    replace over symbols joined with TWO spaces and flanked by one —
    every symbol carries its own leading/trailing space, so pattern
    ' a  b ' -> ' ab ' consumes no neighbour's delimiter and
    scan-resume-after-replacement is exactly the fold's
    no-backtracking, no-revisit semantics."""
    ctes = [f"""v0 AS MATERIALIZED (
      SELECT w, list_transform(range(1, length(w) + 1),
                               i -> substr(w, i, 1)) AS syms, freq
      FROM (SELECT w, count(*) AS freq FROM
            (SELECT unnest({_TOKS_SQL}) AS w FROM documents) GROUP BY w))"""]
    for i in range(steps):
        ctes.append(f"""p{i} AS MATERIALIZED (
      SELECT pr.a AS a, pr.b AS b, SUM(freq) AS w
      FROM (SELECT unnest(list_transform(range(1, len(syms)),
                    j -> struct_pack(a := syms[j], b := syms[j+1]))) AS pr,
                   freq
            FROM v{i} WHERE len(syms) >= 2)
      GROUP BY pr.a, pr.b)""")
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT a, b, w FROM p{i} ORDER BY w DESC, a, b LIMIT 1)")
        ctes.append(f"""v{i + 1} AS MATERIALIZED (
      SELECT v{i}.w AS w, string_split(trim(replace(
               ' ' || array_to_string(syms, '  ') || ' ',
               ' ' || m.a || ' ' || ' ' || m.b || ' ',
               ' ' || m.a || m.b || ' ')), '  ') AS syms, freq
      FROM v{i} CROSS JOIN m{i} m)""")
    sel = " UNION ALL ".join(
        f'SELECT CAST({i} AS INT) AS step, a AS "left", b AS "right", '
        f"CAST(w AS BIGINT) AS weight FROM m{i}" for i in range(steps))
    return "WITH " + ",\n".join(ctes) + "\n" + sel


def _bpe_encode_oracle_sql(steps: int = 10) -> str:
    """Encode-side twin: run the same unrolled training chain, then
    join each word's final symbol count back to the exploded corpus."""
    train = _bpe_oracle_sql(steps)
    body = train.rsplit("\n", 1)[0]  # drop the trailing merge SELECT
    return f"""{body},
    wc AS MATERIALIZED (SELECT w, len(syms) AS n_sym FROM v{steps}),
    exploded AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS w FROM documents)
    SELECT e.doc_id, count(*) AS n_tokens,
           CAST(SUM(wc.n_sym) AS BIGINT) AS n_bpe_symbols
    FROM exploded e JOIN wc ON wc.w = e.w
    GROUP BY e.doc_id"""


@query("bpe_train_merges", _bpe_oracle_sql())
def bpe_train_merges(spark, sf_dir):
    """Byte-pair-encoding merge training (Sennrich et al. 2016) — the
    LLM tokenizer-construction loop, distributed: 10 greedy merge
    steps over the corpus word-frequency table.  Per step: (1) adjacent
    symbol pairs of every distinct word, weighted by word frequency,
    are counted (one vocab-sized shuffle — the corpus itself is touched
    exactly once, at the initial word count); (2) the argmax pair (tie
    break: lexicographic) is one collected row; (3) every word's symbol
    array applies the merge greedily left-to-right via an aggregate()
    fold — per-row, no shuffle — and the lineage is checkpoint-cut.

    The driver loop moves NO data at all (VERDICT r7 item 8 — it
    previously collected the 1-row argmax each step, 10 round trips):
    each step's argmax is checkpointed as a 1-row DataFrame and
    broadcast-crossJoined into the merge fold, which references the
    winner's columns instead of driver-side literals; the returned
    merge table is the union of the 10 step frames.  An exhausted
    vocabulary yields an empty argmax, which empties every later step
    — the same termination as the old driver-side break, with zero
    output rows for dead steps.  At 100 TB the word-freq table is the
    Zipf head (millions of rows, not corpus-sized) and each step costs
    one pair-count shuffle over it.  Differentially tested against a
    pure-Python reference BPE on the same word counts
    (tests/test_text_functions.py) AND fully oracle-checked: the
    DuckDB twin unrolls the 10 steps as chained CTEs, expressing the
    merge fold as a delimiter-safe string replace (see
    _bpe_oracle_sql) — every step's argmax, tie-break, and greedy
    application hash-match across engines.  All arithmetic is integer
    (weighted pair counts), so no float recipe is needed."""
    chars = F.filter(F.split("w", "(?!^)"), lambda x: x != "")
    vocab = (_docs(spark, sf_dir)
             .select(F.explode(tokens_col()).alias("w"))
             .groupBy("w").agg(F.count("*").alias("freq"))
             .select(chars.alias("syms"), "freq")
             .localCheckpoint())
    step_frames = []
    for step in range(10):
        pairs = (vocab.filter(F.size("syms") >= 2)
                 .select(F.explode(F.transform(
                     F.sequence(F.lit(1), F.size("syms") - 1),
                     lambda i: F.struct(
                         F.element_at("syms", i).alias("a"),
                         F.element_at("syms", i + 1).alias("b")),
                 )).alias("p"), "freq")
                 .groupBy("p.a", "p.b").agg(F.sum("freq").alias("weight")))
        top = (pairs.orderBy(F.desc("weight"), "a", "b").limit(1)
               .localCheckpoint(eager=True))    # 1 row, never collected
        step_frames.append(top.select(
            F.lit(step).alias("step"), F.col("a").alias("left"),
            F.col("b").alias("right"),
            F.col("weight").cast("bigint").alias("weight")))
        merged = F.aggregate(
            "syms", F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.col("a"))
                & (s == F.col("b")),
                F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                         F.array(F.concat(F.col("a"), F.col("b")))),
            ).otherwise(F.concat(acc, F.array(s))))
        vocab = (vocab.crossJoin(F.broadcast(top))
                 .select(merged.alias("syms"), "freq")
                 .localCheckpoint())
    out = step_frames[0]
    for fr in step_frames[1:]:
        out = out.unionAll(fr)
    return out


@query("corpus_curation_report", f"""
    WITH per_doc AS (
      SELECT len({_TOKS_SQL}) AS n_toks,
             md5({_CLEAN}) AS fp,
             lang
      FROM documents),
    agg AS (
      SELECT count(*) AS n_docs,
             SUM(n_toks) AS total_tokens,
             count(DISTINCT fp) AS distinct_fps,
             count(DISTINCT lang) AS n_langs
      FROM per_doc)
    SELECT metric, value FROM (
      SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM agg
      UNION ALL
      SELECT 'total_tokens', CAST(total_tokens AS DOUBLE) FROM agg
      UNION ALL
      SELECT 'distinct_fingerprints', CAST(distinct_fps AS DOUBLE) FROM agg
      UNION ALL
      SELECT 'dup_doc_frac',
             CAST(n_docs - distinct_fps AS DOUBLE) / n_docs FROM agg
      UNION ALL
      SELECT 'mean_tokens_per_doc',
             CAST(total_tokens AS DOUBLE) / n_docs FROM agg
      UNION ALL
      SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM agg
    )
""")
def corpus_curation_report(spark, sf_dir):
    """The corpus curation scorecard: document count, token volume,
    exact-dup rate (via content fingerprints), language breadth, and
    mean document length — the one-pass audit a curation run publishes
    before and after each filter stage.  Everything fuses into a
    single scan + one aggregate (the two DISTINCTs expand the agg but
    not the scan), then unpivots metric rows with stack(); ratios are
    single divisions of exact counts.  At 100 TB this replaces N
    ad-hoc profiling jobs with one."""
    d = _docs(spark, sf_dir).select(
        F.size(tokens_col()).alias("n_toks"),
        F.md5(clean_text(F.col("text"))).alias("fp"),
        "lang")
    agg = d.agg(F.count("*").alias("n_docs"),
                F.sum("n_toks").alias("total_tokens"),
                F.countDistinct("fp").alias("distinct_fps"),
                F.countDistinct("lang").alias("n_langs"))
    return agg.selectExpr("""stack(6,
        'n_docs',                CAST(n_docs AS DOUBLE),
        'total_tokens',          CAST(total_tokens AS DOUBLE),
        'distinct_fingerprints', CAST(distinct_fps AS DOUBLE),
        'dup_doc_frac',          CAST(n_docs - distinct_fps AS DOUBLE) / n_docs,
        'mean_tokens_per_doc',   CAST(total_tokens AS DOUBLE) / n_docs,
        'n_langs',               CAST(n_langs AS DOUBLE)
      ) AS (metric, value)""")


_CHUNKS_SQL = f"""
    SELECT doc_id, source,
           list_transform(generate_series(0, CAST(floor((len(t) - 1) / 30)
                                                  AS BIGINT)),
                          i -> md5(array_to_string(t[i * 30 + 1 : i * 30 + 30],
                                                   ' '))) AS fps
    FROM (SELECT doc_id, source, {_TOKS_SQL} AS t FROM documents)
    WHERE len(t) > 0
"""


@query("dedup_chunk_exact", f"""
    WITH chunks AS (
      SELECT doc_id, source, unnest(fps) AS fp FROM ({_CHUNKS_SQL})),
    counts AS (
      SELECT fp, count(*) AS n FROM chunks GROUP BY fp)
    SELECT c.source,
           count(*) AS n_chunks,
           CAST(SUM(CASE WHEN k.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(SUM(CASE WHEN k.n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS dup_chunk_frac
    FROM chunks c JOIN counts k ON c.fp = k.fp
    GROUP BY c.source
""")
def dedup_chunk_exact(spark, sf_dir):
    """SUB-DOCUMENT exact dedup: fingerprint non-overlapping 30-token
    chunks and measure, per source, how many chunk instances recur
    anywhere in the corpus — document-level dedup misses boilerplate
    blocks pasted into otherwise-distinct pages (headers, licenses,
    navigation), which is exactly what poisons LLM training data.
    Chunking and hashing are per-row lambdas (array slice + md5 — both
    engines hash the identical joined string); one shuffle counts
    fingerprints, and the fp-count table joins back to tag duplicates.
    At 100 TB: fp counts are the shuffle (chunk-granular but narrow);
    the join is fp-key co-partitioned with it, and the per-source
    report is metadata-sized.  The removal form keeps min(doc_id,
    chunk_idx) per fp — same plan, one more window."""
    t = F.col("t")
    n_chunks = F.floor((F.size(t) - 1) / 30).cast("int")
    fps = F.transform(
        F.sequence(F.lit(0), n_chunks),
        lambda i: F.md5(F.concat_ws(
            " ", F.slice(t, i * 30 + 1, 30))))
    chunks = (_docs(spark, sf_dir)
              .select("doc_id", "source", tokens_col().alias("t"))
              .filter(F.size("t") > 0)
              .select("doc_id", "source", F.explode(fps).alias("fp")))
    counts = chunks.groupBy("fp").agg(F.count("*").alias("n"))
    return (chunks.join(counts, "fp")
            .groupBy("source")
            .agg(F.count("*").alias("n_chunks"),
                 F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
                 .alias("n_dup_chunks"),
                 (F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("double")
                  / F.count("*")).alias("dup_chunk_frac")))


# trained (left, right) merge pairs per (session, sf_dir) — see
# bpe_encode_apply.  Weak-keyed on the session (ADVICE r6) so stopped
# sessions don't pin entries for process lifetime.
_BPE_MERGES_MEMO = SessionMemo()


def _bpe_merges(spark, sf_dir):
    """The 10 trained merge pairs, one training run per (session,
    dataset) — encode used to re-run the 10-step merge training on
    every call (VERDICT r1 item 6)."""
    from .registry import QUERIES
    merges = _BPE_MERGES_MEMO.get(spark, sf_dir)
    if merges is None:
        merges = [(r["left"], r["right"])
                  for r in QUERIES["bpe_train_merges"](spark, sf_dir)
                  .orderBy("step").collect()]
        _BPE_MERGES_MEMO.put(spark, sf_dir, merges)
    return merges


def _bpe_word_symbol_counts(spark, sf_dir):
    """(w, n_sym): per-distinct-word symbol count after applying the
    memoized merges — the shared encode core of bpe_encode_apply and
    bpe_fertility_by_lang (both join it back to the exploded corpus on
    the word key).  The fold runs over the DISTINCT-WORD table only
    (the Zipf head — millions of rows at 100 TB, not corpus-sized):
    one sequential fold per merge step, no nesting."""
    exploded = (_docs(spark, sf_dir)
                .select(F.explode(tokens_col()).alias("w")))
    chars = F.filter(F.split("w", "(?!^)"), lambda x: x != "")
    vocab = (exploded.select("w").distinct()
             .select("w", chars.alias("syms")).localCheckpoint())
    for a, b in _bpe_merges(spark, sf_dir):
        ab = a + b
        merged = F.aggregate(
            "syms", F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
                F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                         F.array(F.lit(ab))),
            ).otherwise(F.concat(acc, F.array(s))))
        vocab = vocab.select("w", merged.alias("syms")).localCheckpoint()
    return vocab.select("w", F.size("syms").alias("n_sym"))


@query("bpe_encode_apply", _bpe_encode_oracle_sql())
def bpe_encode_apply(spark, sf_dir):
    """Apply the 10 trained BPE merges (bpe_train_merges) to the corpus
    and report per-document subword statistics — the encode half of the
    tokenizer loop.  The merges fold runs over the DISTINCT-WORD table
    only (the Zipf head — millions of rows at 100 TB, not
    corpus-sized): one sequential fold per merge step, no nesting, then
    the per-word symbol count joins back to the exploded corpus on the
    word key and re-aggregates per document.  The corpus itself is
    touched twice (token explode, final agg) and never carries symbol
    arrays.  Differentially tested against a pure-Python encoder on the
    learned merges (tests/test_text_functions.py)."""
    exploded = (_docs(spark, sf_dir)
                .select("doc_id", F.explode(tokens_col()).alias("w")))
    wc = _bpe_word_symbol_counts(spark, sf_dir)
    return (exploded.join(wc, "w")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("n_sym").cast("bigint").alias("n_bpe_symbols")))


@query("doc_length_survival", f"""
    WITH t AS (SELECT doc_id, len({_TOKS_SQL}) AS n FROM documents),
    nz AS (SELECT doc_id, n FROM t WHERE n >= 1),
    b AS (SELECT length(bin(n)) - 1 AS bucket, count(*) AS n_docs,
                 CAST(SUM(n) AS BIGINT) AS n_tokens
          FROM nz GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS all_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS all_tokens
            FROM b)
    SELECT CAST((1 << (o.bucket + 1)) - 1 AS BIGINT) AS cap,
           CAST(SUM(CASE WHEN i.bucket <= o.bucket
                         THEN i.n_docs ELSE 0 END) AS BIGINT) AS n_docs_fit,
           CAST(SUM(CASE WHEN i.bucket <= o.bucket
                         THEN i.n_docs ELSE 0 END) AS DOUBLE)
             / any_value(tot.all_docs) AS doc_survival,
           CAST(SUM(CASE WHEN i.bucket <= o.bucket THEN i.n_tokens
                         ELSE i.n_docs * ((1 << (o.bucket + 1)) - 1)
                    END) AS BIGINT) AS tokens_kept,
           CAST(SUM(CASE WHEN i.bucket <= o.bucket THEN i.n_tokens
                         ELSE i.n_docs * ((1 << (o.bucket + 1)) - 1)
                    END) AS DOUBLE)
             / any_value(tot.all_tokens) AS token_survival
    FROM b o JOIN b i ON true CROSS JOIN tot
    GROUP BY o.bucket
""")
def doc_length_survival(spark, sf_dir):
    """Sequence-length budget curve — the decision aid for choosing a
    training max_seq_len: for each power-of-two cap C (the upper edge
    of every occupied length bucket), how many documents fit entirely
    and what fraction of corpus TOKENS survives truncation at C
    (docs longer than C contribute C tokens each).  The survival
    columns answer "what does capping at 2k/8k/32k actually cost" with
    exact integers.

    Exactness across engines: buckets come from the BIT LENGTH of the
    token count (length(bin(n)) - 1 == floor(log2 n) in pure integer
    arithmetic — float log2 at power-of-two boundaries is a libm
    roulette this avoids), and the per-cap roll-up is a
    #buckets-squared self-join over bucket PARTIALS, exact because
    every cap is a bucket edge: a doc is either wholly below the cap
    (contributes its length) or wholly above (contributes the cap).
    Plan: one scan -> ~20-row bucket table -> 400-element self-join —
    corpus touched once, everything after is metadata-sized."""
    t = (_docs(spark, sf_dir)
         .select(F.size(tokens_col()).alias("n"))
         .filter(F.col("n") >= 1))
    b = (t.select((F.length(F.expr("bin(n)")) - 1).alias("bucket"),
                  F.col("n"))
         .groupBy("bucket")
         .agg(F.count("*").alias("n_docs"),
              F.sum("n").cast("bigint").alias("n_tokens")))
    tot = b.agg(F.sum("n_docs").cast("bigint").alias("all_docs"),
                F.sum("n_tokens").cast("bigint").alias("all_tokens"))
    o = b.select(F.col("bucket").alias("ob"))
    i = b.select(F.col("bucket").alias("ib"), "n_docs", "n_tokens")
    cap = F.expr("CAST(shiftleft(CAST(1 AS BIGINT), ob + 1) - 1 AS BIGINT)")
    kept = F.when(F.col("ib") <= F.col("ob"), F.col("n_tokens")) \
        .otherwise(F.col("n_docs") * cap)
    fit = F.when(F.col("ib") <= F.col("ob"), F.col("n_docs")).otherwise(0)
    return (o.crossJoin(i).crossJoin(F.broadcast(tot))
            .groupBy("ob")
            .agg(F.any_value(cap).alias("cap"),
                 F.sum(fit).cast("bigint").alias("n_docs_fit"),
                 (F.sum(fit).cast("double") / F.any_value("all_docs"))
                 .alias("doc_survival"),
                 F.sum(kept).cast("bigint").alias("tokens_kept"),
                 (F.sum(kept).cast("double") / F.any_value("all_tokens"))
                 .alias("token_survival"))
            .select("cap", "n_docs_fit", "doc_survival",
                    "tokens_kept", "token_survival"))


def _bpe_fertility_oracle_sql(steps: int = 10) -> str:
    """Per-language fertility twin: the same unrolled training chain,
    with the encode join grouped by lang instead of doc."""
    train = _bpe_oracle_sql(steps)
    body = train.rsplit("\n", 1)[0]  # drop the trailing merge SELECT
    return f"""{body},
    wc AS MATERIALIZED (SELECT w, len(syms) AS n_sym FROM v{steps}),
    exploded AS (
      SELECT doc_id, lang, unnest({_TOKS_SQL}) AS w FROM documents)
    SELECT e.lang, count(DISTINCT e.doc_id) AS n_docs,
           count(*) AS n_tokens,
           CAST(SUM(wc.n_sym) AS BIGINT) AS n_bpe_symbols,
           CAST(SUM(wc.n_sym) AS DOUBLE) / count(*) AS fertility
    FROM exploded e JOIN wc ON wc.w = e.w
    GROUP BY e.lang"""


@query("bpe_fertility_by_lang", _bpe_fertility_oracle_sql())
def bpe_fertility_by_lang(spark, sf_dir):
    """Tokenizer FERTILITY audit (symbols emitted per whitespace word)
    per language — the standard multilingual-tokenizer equity metric: a
    tokenizer trained on skewed data fragments under-represented
    languages into more subwords, inflating their effective sequence
    length and training cost (the vocabulary-allocation argument in
    SentencePiece/XLM-R analyses).  Runs the SAME memoized 10-merge BPE
    chain as bpe_encode_apply (one training per session/dataset), joins
    the per-word symbol count back to the lang-tagged corpus, and
    reports per-language doc/token/symbol counts plus the fertility
    ratio — one exact-integer division, engine-deterministic.

    Plan shape: identical to the encode query (the shared
    _bpe_word_symbol_counts distinct-word fold + word-key join), with
    the final aggregate collapsing to |langs| rows instead of per-doc —
    strictly cheaper."""
    exploded = (_docs(spark, sf_dir)
                .select("doc_id", "lang", F.explode(tokens_col()).alias("w")))
    wc = _bpe_word_symbol_counts(spark, sf_dir)
    return (exploded.join(wc, "w")
            .groupBy("lang")
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count("*").alias("n_tokens"),
                 F.sum("n_sym").cast("bigint").alias("n_bpe_symbols"),
                 (F.sum("n_sym").cast("double") / F.count("*"))
                 .alias("fertility")))


@query("bpe_mixture_pareto", f"""
    WITH fert AS (SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
                         n_bpe_symbols, fertility
                  FROM ({_bpe_fertility_oracle_sql()})),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS all_tokens,
                   CAST(SUM(n_bpe_symbols) AS BIGINT) AS all_syms
            FROM fert),
    base AS (SELECT f.lang, f.n_tokens, f.n_bpe_symbols,
                    CAST(f.n_tokens AS DOUBLE) / tot.all_tokens
                      AS token_share,
                    CAST(f.n_bpe_symbols AS DOUBLE) / tot.all_syms
                      AS symbol_share,
                    f.fertility
             FROM fert f CROSS JOIN tot)
    SELECT a.lang, a.n_tokens, a.n_bpe_symbols,
           round(a.token_share, 6) AS token_share,
           round(a.symbol_share, 6) AS symbol_share,
           round(a.fertility, 6) AS fertility,
           round(a.symbol_share - a.token_share, 6) AS compute_excess,
           CAST(CASE WHEN EXISTS (
                  SELECT 1 FROM base o
                  WHERE o.fertility < a.fertility
                    AND o.token_share > a.token_share)
                THEN 0 ELSE 1 END AS INT) AS pareto_optimal
    FROM base a
""")
def bpe_mixture_pareto(spark, sf_dir):
    """Tokenizer-compression PARETO readout over the data mixture
    (VERDICT r9 item 1's fourth candidate): joins the per-language BPE
    fertility audit with each language's share of the corpus token
    mixture and reports (a) compute_excess — the gap between a
    language's share of emitted BPE SYMBOLS (what the model actually
    pays attention over) and its share of whitespace TOKENS (what the
    mixture recipe nominally allocated): a positive excess means the
    tokenizer silently re-weights the mixture toward that language's
    compute, the effect the XLM-R/SentencePiece vocabulary-allocation
    analyses measure — and (b) a per-language Pareto flag: a language
    is pareto_optimal unless some other language gets BOTH better
    compression (lower fertility) AND more mixture share, i.e. it is
    strictly dominated on the fertility/share frontier a tokenizer-
    budget sweep optimizes along.

    Exactness: fertility/shares are single double divisions of exact
    integer sums; the dominance test compares those deterministic
    doubles with strict inequalities — identical verdicts on both
    engines.  Plan: the memoized 10-merge BPE chain + one word-key
    join (the fertility query's shape), then everything is #langs-
    sized: a broadcast 1-row total and a #langs^2 dominance self-join.
    At 100 TB the frontier arithmetic costs nothing — the corpus is
    touched exactly once, shared with every other BPE query via the
    session-memoized symbol table."""
    exploded = (_docs(spark, sf_dir)
                .select("lang", F.explode(tokens_col()).alias("w")))
    wc = _bpe_word_symbol_counts(spark, sf_dir)
    fert = (exploded.join(wc, "w")
            .groupBy("lang")
            .agg(F.count("*").cast("bigint").alias("n_tokens"),
                 F.sum("n_sym").cast("bigint").alias("n_bpe_symbols"),
                 (F.sum("n_sym").cast("double") / F.count("*"))
                 .alias("fertility")))
    tot = fert.agg(F.sum("n_tokens").cast("bigint").alias("all_tokens"),
                   F.sum("n_bpe_symbols").cast("bigint").alias("all_syms"))
    base = (fert.crossJoin(F.broadcast(tot))
            .select("lang", "n_tokens", "n_bpe_symbols",
                    (F.col("n_tokens").cast("double") / F.col("all_tokens"))
                    .alias("token_share"),
                    (F.col("n_bpe_symbols").cast("double")
                     / F.col("all_syms")).alias("symbol_share"),
                    "fertility")
            .localCheckpoint(eager=True))      # #langs rows, feeds both sides
    o = base.select(F.col("fertility").alias("o_fert"),
                    F.col("token_share").alias("o_share"))
    dom = (base.crossJoin(o)
           .groupBy("lang")
           .agg(F.max(((F.col("o_fert") < F.col("fertility"))
                       & (F.col("o_share") > F.col("token_share")))
                      .cast("int")).alias("dominated")))
    return (base.join(F.broadcast(dom), "lang")
            .select("lang", "n_tokens", "n_bpe_symbols",
                    F.round("token_share", 6).alias("token_share"),
                    F.round("symbol_share", 6).alias("symbol_share"),
                    F.round("fertility", 6).alias("fertility"),
                    F.round(F.col("symbol_share") - F.col("token_share"), 6)
                    .alias("compute_excess"),
                    (1 - F.col("dominated")).cast("int")
                    .alias("pareto_optimal")))


@query("text_bigram_lm_score", f"""
    WITH toked AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    bg AS (
      SELECT doc_id, unnest(
        CASE WHEN len(t) >= 2 THEN
          list_transform(range(1, len(t)),
                         i -> struct_pack(w1 := t[i], w2 := t[i+1]))
        ELSE [] END) AS b
      FROM toked),
    flat AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
    c12 AS (SELECT w1, w2, count(*) AS n12 FROM flat GROUP BY w1, w2),
    tok AS (SELECT unnest(t) AS token FROM toked),
    uf AS (SELECT token, count(*) AS n1 FROM tok GROUP BY token),
    vocab AS (SELECT count(*) AS v FROM uf),
    scored AS (
      SELECT f.doc_id,
             CAST(round(ln((CAST(n12 AS DOUBLE) + 1.0)
                           / (CAST(n1 AS DOUBLE) + v)), 6)
                  AS DECIMAL(18,6)) AS logp
      FROM flat f
      JOIN c12 ON c12.w1 = f.w1 AND c12.w2 = f.w2
      JOIN uf ON uf.token = f.w1
      CROSS JOIN vocab)
    SELECT doc_id, count(*) AS n_bigrams,
           CAST(SUM(logp) AS DOUBLE) / count(*) AS avg_logp
    FROM scored GROUP BY doc_id
""")
def text_bigram_lm_score(spark, sf_dir):
    """Per-document mean bigram log-likelihood under an add-1-smoothed
    corpus bigram LM: P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) — one step up
    from text_surprisal_score's unigram model, catching
    plausible-words-in-implausible-order text (shuffled/templated spam)
    that unigram frequency scoring passes.  Same engine-exactness
    recipe: the single transcendental per bigram is 6dp-rounded then
    decimal-summed, so the per-doc mean is order-free on both engines.
    At 100 TB the bigram-count table is the corpus's Zipf-head square
    — far smaller than the corpus — and the scoring pass is the
    doc-bigram stream joined against it (shuffle join on (w1,w2)),
    plus a vocab-sized broadcast for the denominator."""
    toked = _docs(spark, sf_dir).select("doc_id", tokens_col().alias("t"))
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + 1).alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    flat = (toked.select("doc_id", F.explode(bigrams).alias("b"))
            .select("doc_id", F.col("b.w1").alias("w1"),
                    F.col("b.w2").alias("w2")))
    c12 = flat.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    tok = toked.select(F.explode("t").alias("token"))
    uf = tok.groupBy("token").agg(F.count("*").alias("n1"))
    vocab = uf.agg(F.count("*").alias("v"))
    logp = F.round(
        F.log((F.col("n12").cast("double") + F.lit(1.0))
              / (F.col("n1").cast("double") + F.col("v"))),
        6).cast("decimal(18,6)")
    scored = (flat.crossJoin(F.broadcast(vocab))
              .join(c12, ["w1", "w2"])
              .join(F.broadcast(uf.withColumnRenamed("token", "w1")), "w1")
              .select("doc_id", logp.alias("logp")))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (F.sum("logp").cast("double") / F.count("*")).alias("avg_logp"))


@query("quality_ppl_buckets", f"""
    WITH toked AS (SELECT doc_id, lang, {_TOKS_SQL} AS t FROM documents),
    bg AS (
      SELECT doc_id, lang, unnest(
        CASE WHEN len(t) >= 2 THEN
          list_transform(range(1, len(t)),
                         i -> struct_pack(w1 := t[i], w2 := t[i+1]))
        ELSE [] END) AS b
      FROM toked),
    flat AS (SELECT doc_id, lang, b.w1 AS w1, b.w2 AS w2 FROM bg),
    c12 AS (SELECT w1, w2, count(*) AS n12 FROM flat GROUP BY w1, w2),
    tok AS (SELECT unnest(t) AS token FROM toked),
    uf AS (SELECT token, count(*) AS n1 FROM tok GROUP BY token),
    vocab AS (SELECT count(*) AS v FROM uf),
    scored AS (
      SELECT f.doc_id, f.lang,
             CAST(round(ln((CAST(n12 AS DOUBLE) + 1.0)
                           / (CAST(n1 AS DOUBLE) + v)), 6)
                  AS DECIMAL(18,6)) AS logp
      FROM flat f
      JOIN c12 ON c12.w1 = f.w1 AND c12.w2 = f.w2
      JOIN uf ON uf.token = f.w1
      CROSS JOIN vocab),
    per_doc AS (
      SELECT doc_id, lang,
             CAST(SUM(logp) AS DOUBLE) / count(*) AS avg_logp
      FROM scored GROUP BY doc_id, lang),
    cuts AS (
      SELECT lang, quantile_disc(avg_logp, 0.33) AS t_tail,
             quantile_disc(avg_logp, 0.67) AS t_head
      FROM per_doc GROUP BY lang)
    SELECT d.doc_id, d.lang, d.avg_logp AS avg_logp,
           CASE WHEN d.avg_logp >= c.t_head THEN 'head'
                WHEN d.avg_logp >= c.t_tail THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM per_doc d JOIN cuts c ON d.lang = c.lang
""")
def quality_ppl_buckets(spark, sf_dir):
    """CCNet-style perplexity partitioning (Wenzek et al. 2020): score
    every document under the corpus bigram LM (text_bigram_lm_score's
    exact chain) and split each LANGUAGE into head / middle / tail
    thirds by LM score — the curation step that routes high-likelihood
    text to training and flags the tail for heavier filtering.  Higher
    mean log-probability = lower perplexity = head, with per-language
    cutoffs (a language's intrinsic LM score level must not bleed into
    another's buckets — CCNet's core point).

    Determinism: the per-doc score is the 6dp-rounded decimal-summed
    chain already oracle-proven; tertile cutoffs are DISCRETE quantiles
    (observed values, the engine-portable rule used by dq_key_skew /
    histogram_equidepth), and bucket edges compare identically-derived
    doubles, so membership is exact on both engines.  Docs with <2
    tokens have no bigrams and are excluded (no LM evidence either
    way), same as the scoring query.

    Scale shape: the LM chain's shuffles (bigram counts = Zipf-head
    sized, unigram counts, per-doc mean) plus ONE |langs|-row cutoff
    table broadcast back — the bucket tag itself rides the join,
    adding zero passes over the corpus."""
    toked = _docs(spark, sf_dir).select("doc_id", "lang",
                                        tokens_col().alias("t"))
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + 1).alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    flat = (toked.select("doc_id", "lang", F.explode(bigrams).alias("b"))
            .select("doc_id", "lang", F.col("b.w1").alias("w1"),
                    F.col("b.w2").alias("w2")))
    c12 = flat.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    uf = (toked.select(F.explode("t").alias("token"))
          .groupBy("token").agg(F.count("*").alias("n1")))
    vocab = uf.agg(F.count("*").alias("v"))
    logp = F.round(
        F.log((F.col("n12").cast("double") + F.lit(1.0))
              / (F.col("n1").cast("double") + F.col("v"))),
        6).cast("decimal(18,6)")
    # the per-doc score table feeds BOTH the cutoff aggregate and the
    # final tag join — materialize it once (it is the stored score
    # artifact a CCNet deployment keeps; without this the whole
    # bigram-LM chain executes twice)
    per_doc = (flat.crossJoin(F.broadcast(vocab))
               .join(c12, ["w1", "w2"])
               .join(F.broadcast(uf.withColumnRenamed("token", "w1")), "w1")
               .select("doc_id", "lang", logp.alias("logp"))
               .groupBy("doc_id", "lang")
               .agg((F.sum("logp").cast("double") / F.count("*"))
                    .alias("avg_logp"))).localCheckpoint(eager=True)
    cuts = per_doc.groupBy("lang").agg(
        F.expr("percentile_disc(0.33) WITHIN GROUP (ORDER BY avg_logp)")
        .alias("t_tail"),
        F.expr("percentile_disc(0.67) WITHIN GROUP (ORDER BY avg_logp)")
        .alias("t_head"))
    # avg_logp ships UNROUNDED: both engines derive the identical
    # double (decimal sum / count), and a cosmetic 6dp round() is
    # tie-sensitive across engines at half-way mantissas (observed at
    # sf0.1) — the raw double is the bitwise-portable form
    return (per_doc.join(F.broadcast(cuts), "lang")
            .select("doc_id", "lang", "avg_logp",
                    F.when(F.col("avg_logp") >= F.col("t_head"), "head")
                    .when(F.col("avg_logp") >= F.col("t_tail"), "middle")
                    .otherwise("tail").alias("bucket")))


@query("text_lang_confusion", f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents),
    h AS (SELECT doc_id, lang,
                 {_hits_sql(LANG_PROFILES['en'])} AS en_h,
                 {_hits_sql(LANG_PROFILES['de'])} AS de_h,
                 {_hits_sql(LANG_PROFILES['fr'])} AS fr_h,
                 {_hits_sql(LANG_PROFILES['es'])} AS es_h
          FROM t),
    p AS (SELECT lang,
                 CASE WHEN en_h + de_h + fr_h + es_h = 0 THEN 'unknown'
                      WHEN en_h >= de_h AND en_h >= fr_h AND en_h >= es_h THEN 'en'
                      WHEN de_h >= fr_h AND de_h >= es_h THEN 'de'
                      WHEN fr_h >= es_h THEN 'fr'
                      ELSE 'es' END AS lang_pred
          FROM h)
    SELECT lang, lang_pred, count(*) AS n,
           count(*) FILTER (WHERE lang = lang_pred) AS n_correct
    FROM p GROUP BY lang, lang_pred
""")
def text_lang_confusion(spark, sf_dir):
    """Classifier-evaluation confusion matrix: the stopword-profile
    language ID (text_lang_id) scored against the labeled lang column
    — actual x predicted counts plus the diagonal flag, the quality
    report any heuristic corpus filter ships with.  Composition stays
    one scan + one (actual, predicted)-keyed aggregate whose
    cardinality is |langs|² — metadata-sized at any corpus scale; the
    per-row argmax is the same fused when-chain as the classifier
    itself (whole-stage codegen, no second pass)."""
    df = _docs(spark, sf_dir).select("doc_id", "lang",
                                     tokens_col().alias("toks"))
    hs = {k: _hits(F.col("toks"), v) for k, v in LANG_PROFILES.items()}
    total = hs["en"] + hs["de"] + hs["fr"] + hs["es"]
    pred = (
        F.when(total == 0, "unknown")
        .when((hs["en"] >= hs["de"]) & (hs["en"] >= hs["fr"])
              & (hs["en"] >= hs["es"]), "en")
        .when((hs["de"] >= hs["fr"]) & (hs["de"] >= hs["es"]), "de")
        .when(hs["fr"] >= hs["es"], "fr")
        .otherwise("es")
    )
    return (df.select("lang", pred.alias("lang_pred"))
            .groupBy("lang", "lang_pred")
            .agg(F.count("*").alias("n"),
                 F.count_if(F.col("lang") == F.col("lang_pred"))
                 .alias("n_correct")))


_CHAR3_SQL = ("list_distinct(CASE WHEN length(lower(text)) >= 3 THEN "
              "list_transform(range(1, length(lower(text)) - 1), "
              "i -> substr(lower(text), i, 3)) ELSE [] END)")


@query("text_char_ngram_lang_id", f"""
    WITH g AS (
      SELECT doc_id, lang, unnest({_CHAR3_SQL}) AS gram FROM documents),
    prof AS (
      SELECT lang AS plang, gram FROM (
        SELECT lang, gram, count(*) AS n,
               row_number() OVER (PARTITION BY lang
                 ORDER BY count(*) DESC, gram) AS rk
        FROM g GROUP BY lang, gram) WHERE rk <= 20),
    overlap AS (
      SELECT g.doc_id, p.plang, count(*) AS n_overlap
      FROM g JOIN prof p ON g.gram = p.gram
      GROUP BY g.doc_id, p.plang),
    best AS (
      SELECT doc_id, plang, n_overlap,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY n_overlap DESC, plang) AS rk
      FROM overlap)
    SELECT d.doc_id, d.lang,
           COALESCE(b.plang, 'unknown') AS lang_pred,
           COALESCE(b.n_overlap, 0) AS n_overlap
    FROM (SELECT DISTINCT doc_id, lang FROM documents) d
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON d.doc_id = b.doc_id
""")
def text_char_ngram_lang_id(spark, sf_dir):
    """Character-3-gram language ID, profiles LEARNED from the labeled
    corpus itself (top-20 grams per language, tie-pinned), then every
    document scored by profile overlap and argmax-classified — the
    Cavnar-Trenkle n-gram method next to text_lang_id's fixed stopword
    lists.  Two-phase distributed shape: the profile build collapses
    the gram stream to |langs|x20 rows (broadcastable forever); the
    scoring pass joins the doc-gram stream against that tiny profile
    and argmaxes per doc with a tie-pinned window.  Docs overlapping
    no profile fall out of the join and come back as 'unknown' via the
    left join.  At 100 TB both passes are one corpus scan each; the
    profile would be trained on a sample with identical SQL."""
    docs = _docs(spark, sf_dir)
    lowered = F.lower(F.col("text"))
    # substr with a dynamic position needs the SQL expr form
    grams3 = F.array_distinct(F.when(
        F.length(lowered) >= 3,
        F.expr("transform(sequence(1, length(lower(text)) - 2), "
               "i -> substr(lower(text), i, 3))")
    ).otherwise(F.array().cast("array<string>")))
    g = docs.select("doc_id", "lang", F.explode(grams3).alias("gram"))
    wp = Window.partitionBy("lang").orderBy(F.desc("n"), "gram")
    prof = (g.groupBy("lang", "gram").agg(F.count("*").alias("n"))
            .withColumn("rk", F.row_number().over(wp))
            .filter(F.col("rk") <= 20)
            .select(F.col("lang").alias("plang"), "gram"))
    overlap = (g.join(F.broadcast(prof), "gram")
               .groupBy("doc_id", "plang")
               .agg(F.count("*").alias("n_overlap")))
    wb = Window.partitionBy("doc_id").orderBy(F.desc("n_overlap"), "plang")
    best = (overlap.withColumn("rk", F.row_number().over(wb))
            .filter(F.col("rk") == 1))
    d = docs.select("doc_id", "lang").distinct()
    return (d.join(best, "doc_id", "left")
            .select("doc_id", "lang",
                    F.coalesce("plang", F.lit("unknown")).alias("lang_pred"),
                    F.coalesce("n_overlap", F.lit(0)).cast("bigint")
                    .alias("n_overlap")))


@query("doc_winnowing_fingerprints", f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
               WHERE doc_id < 200),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3 THEN
               list_transform(range(1, len(toks) - 1),
                 i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
             ELSE [] END AS fps
      FROM d),
    sel AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(fps) >= 4 THEN
               list_transform(range(1, len(fps) - 2),
                 j -> list_aggregate(fps[j:j+3], 'min'))
             ELSE fps END) AS picked
      FROM sh)
    SELECT doc_id, unnest(picked) AS fingerprint FROM sel
""")
def doc_winnowing_fingerprints(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer et al. 2003, the
    MOSS algorithm): hash every token-3-gram, then keep the minimum
    hash of each sliding window of 4 — guaranteeing any shared run of
    ≥6 tokens between two documents shares a selected fingerprint,
    with ~2/(w+1) of the hashes kept.  Position-robust sub-document
    dup detection: cheaper than all-shingle indexing
    (dedup_chunk_exact keeps every chunk), stronger than whole-doc
    hashing.  Everything is per-row HOFs over the shingle-hash array
    (window mins via slice+min — no self-join, no shuffle until the
    fingerprint index is built); md5 hex min is lexicographic on both
    engines, so selection is engine-exact.  doc_id < 200 bounds the
    oracle output."""
    toks = tokens_col()
    d = (_docs(spark, sf_dir).filter(F.col("doc_id") < 200)
         .select("doc_id", toks.alias("toks")))
    fps = F.when(
        F.size("toks") >= 3,
        F.transform(F.sequence(F.lit(1), F.size("toks") - 2),
                    lambda i: F.md5(F.concat_ws(
                        " ", F.element_at("toks", i),
                        F.element_at("toks", i + 1),
                        F.element_at("toks", i + 2))))
    ).otherwise(F.array().cast("array<string>"))
    # Bind the hash array ONCE per row via a lambda variable: Catalyst's
    # CollapseProject would otherwise inline the full md5-array
    # expression into EVERY window-min element — O(shingles^2) md5
    # evaluations per document (measured 84 s for this query's gate run
    # vs ~2 s with the binding).  transform() over a singleton array is
    # the pure-expression way to introduce a let-binding.
    picked_once = F.element_at(
        F.transform(F.array(fps), lambda arr: F.when(
            F.size(arr) >= 4,
            F.transform(F.sequence(F.lit(1), F.size(arr) - 3),
                        lambda j: F.array_min(F.slice(arr, j, 4)))
        ).otherwise(arr)), 1)
    picked = F.array_distinct(picked_once)
    return (d.select("doc_id", picked.alias("picked"))
            .select("doc_id", F.explode("picked").alias("fingerprint")))


@query("text_zipf_fit", f"""
    WITH tf AS (
      SELECT token, count(*) AS n FROM (
        SELECT unnest({_TOKS_SQL}) AS token FROM documents)
      GROUP BY token),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rk
      FROM tf),
    lg AS (
      SELECT round(ln(CAST(rk AS DOUBLE)), 6) AS lx,
             round(ln(CAST(n AS DOUBLE)), 6) AS ly
      FROM ranked WHERE rk <= 100)
    SELECT round(regr_slope(ly, lx), 6) AS zipf_exponent,
           round(regr_r2(ly, lx), 6) AS r2,
           count(*) AS n_points
    FROM lg
""")
def text_zipf_fit(spark, sf_dir):
    """Zipf's-law fit over the token frequency distribution: regress
    ln(freq) on ln(rank) for the top-100 tokens — natural language
    yields a slope near −1 with high R², so the exponent is a corpus
    -naturalness diagnostic (template/spam corpora flatten or steepen
    it).  The frequency table collapses the corpus before the rank
    window (vocab-sized), each ln is 6dp-rounded per the
    transcendental rule, and regr_slope/regr_r2 are one-pass
    co-moment aggregates over just 100 points.  Corpus scale only
    ever touches the first groupBy."""
    tf = (_docs(spark, sf_dir)
          .select(F.explode(tokens_col()).alias("token"))
          .groupBy("token").agg(F.count("*").alias("n")))
    ranked = tf.select(
        "n", F.row_number().over(Window.orderBy(F.desc("n"), "token"))
        .alias("rk"))
    lg = (ranked.filter(F.col("rk") <= 100)
          .select(F.round(F.log(F.col("rk").cast("double")), 6).alias("lx"),
                  F.round(F.log(F.col("n").cast("double")), 6).alias("ly")))
    return lg.agg(
        F.round(F.expr("regr_slope(ly, lx)"), 6).alias("zipf_exponent"),
        F.round(F.expr("regr_r2(ly, lx)"), 6).alias("r2"),
        F.count("*").alias("n_points"))


# --- C4-style sub-document dedup with reassembly --------------------------

_CHUNK_STRUCTS_SQL = f"""
    SELECT doc_id,
           unnest(list_transform(
               generate_series(0, CAST(floor((len(t) - 1) / 30) AS BIGINT)),
               i -> struct_pack(idx := i,
                                chunk := array_to_string(
                                    t[i * 30 + 1 : i * 30 + 30], ' ')))) AS ch
    FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents)
    WHERE len(t) > 0
"""


@query("dedup_chunk_rewrite", f"""
    WITH flat AS (
      SELECT doc_id, ch.idx AS chunk_idx, ch.chunk AS chunk,
             md5(ch.chunk) AS fp
      FROM ({_CHUNK_STRUCTS_SQL})),
    ranked AS (
      SELECT doc_id, chunk_idx, chunk,
             row_number() OVER (PARTITION BY fp
                                ORDER BY doc_id, chunk_idx) AS rn
      FROM flat)
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INTEGER) AS n_kept,
           coalesce(string_agg(chunk, ' ' ORDER BY chunk_idx)
                      FILTER (WHERE rn = 1), '') AS text_rewritten
    FROM ranked GROUP BY doc_id
""")
def dedup_chunk_rewrite(spark, sf_dir):
    """C4-style sub-document dedup WITH reassembly: fingerprint
    non-overlapping 30-token chunks, keep only the first-occurring
    instance of each fingerprint corpus-wide (ordered by doc_id then
    chunk position — the C4 'retain one occurrence' rule), and rewrite
    every document as its surviving chunks in original order.  Unlike
    ``dedup_chunk_exact`` (which *measures* boilerplate recurrence per
    source) this emits the cleaned corpus itself — the actual filter
    stage a pretraining pipeline runs.

    Plan shape: one scan explodes chunks (rows ~= corpus tokens / 30);
    the first-occurrence rule is a map-side-combinable
    min(struct(doc_id, chunk_idx)) per fingerprint joined back on fp
    (skew-safe even when one boilerplate chunk dominates the corpus —
    see chunk_rewrite_df); the rebuild is one groupBy(doc_id) whose
    collect_list holds a single document's chunks (bounded by max doc
    length, never corpus-sized).  At 100 TB: one narrow fp-partials
    shuffle + the fp join + the doc_id regroup — chunk text moves
    exactly twice, the same shape as the published suffix-array-free
    C4 dedup recipes."""
    return chunk_rewrite_df(_docs(spark, sf_dir))


def chunk_fingerprints_df(docs: DataFrame) -> DataFrame:
    """Explode a corpus into (doc_id, chunk_idx, chunk, fp) rows —
    non-overlapping 30-token chunks with md5 fingerprints.  Shared by
    the batch rewrite below and the incremental streaming twin
    (streaming/chunkdedup.py)."""
    t = F.col("t")
    n_chunks = F.floor((F.size(t) - 1) / 30).cast("int")
    chunk_structs = F.transform(
        F.sequence(F.lit(0), n_chunks),
        lambda i: F.struct(
            i.cast("long").alias("idx"),
            F.concat_ws(" ", F.slice(t, i * 30 + 1, 30)).alias("chunk")))
    return (docs
            .select("doc_id", tokens_col().alias("t"))
            .filter(F.size("t") > 0)
            .select("doc_id", F.explode(chunk_structs).alias("ch"))
            .select("doc_id",
                    F.col("ch.idx").alias("chunk_idx"),
                    F.col("ch.chunk").alias("chunk"),
                    F.md5(F.col("ch.chunk")).alias("fp")))


def chunk_rewrite_df(docs: DataFrame) -> DataFrame:
    """DataFrame-level core of ``dedup_chunk_rewrite`` (docs needs
    doc_id + text) — composable so the curation pipeline can run it on
    an already-filtered corpus (operators/curation.py).

    The first-occurrence rule is a map-side-combinable
    min(struct(doc_id, chunk_idx)) aggregate joined back on fp — NOT a
    row_number window partitioned by fp: a boilerplate-heavy corpus
    makes hot fingerprints (a license block repeated billions of
    times), and a window would funnel every instance of a hot fp into
    one partition's sort with no AQE skew relief.  The aggregate
    collapses hot fps to one row per map task before its (narrow)
    shuffle, and the join back is a plain fp-key join AQE can
    skew-split or broadcast."""
    flat = chunk_fingerprints_df(docs)
    firsts = flat.groupBy("fp").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("first"))
    ranked = flat.join(firsts, "fp").select(
        "doc_id", "chunk_idx", "chunk",
        ((F.col("doc_id") == F.col("first.doc_id"))
         & (F.col("chunk_idx") == F.col("first.chunk_idx")))
        .alias("is_first"))
    kept = F.array_sort(F.collect_list(
        F.when(F.col("is_first"), F.struct("chunk_idx", "chunk"))))
    return ranked.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_chunks"),
        F.sum(F.col("is_first").cast("int")).cast("int").alias("n_kept"),
        F.array_join(F.transform(kept, lambda s: s["chunk"]), " ")
        .alias("text_rewritten"))


# --- Gopher quality rules -------------------------------------------------

_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


@query("text_gopher_rules", f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents
               WHERE len({_TOKS_SQL}) > 0),
    m AS (SELECT doc_id,
                 CAST(len(toks) AS INTEGER) AS n_words,
                 round(CAST(list_sum(list_transform(toks, x -> len(x)))
                            AS DOUBLE) / len(toks), 6) AS mean_word_len,
                 round(CAST(len(list_filter(toks,
                            x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                       / len(toks), 6) AS frac_alpha_words,
                 CAST(len(list_intersect(list_distinct(toks),
                      [{', '.join("'" + w + "'" for w in _GOPHER_STOPS)}]))
                      AS INTEGER) AS n_stop_hits,
                 round((len(regexp_extract_all(text, '#'))
                        + len(regexp_extract_all(text, '\\.\\.\\.')))
                       / CAST(len(toks) AS DOUBLE), 6) AS symbol_ratio,
                 round(CAST(list_max(list_transform(list_distinct(toks),
                            x -> len(list_filter(toks, y -> y = x))))
                            AS DOUBLE) / len(toks), 6) AS top_token_frac
          FROM t)
    SELECT doc_id, n_words, mean_word_len, frac_alpha_words, n_stop_hits,
           symbol_ratio, top_token_frac,
           (n_words BETWEEN 50 AND 100000) AS r_word_count,
           (mean_word_len BETWEEN 3.0 AND 10.0) AS r_mean_word_len,
           (frac_alpha_words >= 0.8) AS r_alpha_words,
           (n_stop_hits >= 2) AS r_stopwords,
           (symbol_ratio < 0.1) AS r_symbol_ratio,
           (top_token_frac <= 0.2) AS r_top_token,
           ((n_words BETWEEN 50 AND 100000)
            AND (mean_word_len BETWEEN 3.0 AND 10.0)
            AND (frac_alpha_words >= 0.8)
            AND (n_stop_hits >= 2)
            AND (symbol_ratio < 0.1)
            AND (top_token_frac <= 0.2)) AS keep
    FROM m
""")
def text_gopher_rules(spark, sf_dir):
    """The Gopher quality-rule battery (Rae et al. 2021, §A1.1) as one
    native projection: word-count bounds, mean-word-length bounds,
    alphabetic-word fraction, stopword presence, symbol-to-word ratio
    ('#' and '...'), and a top-token concentration cap (the repetition
    family's cheapest member) — each emitted as its own boolean so a
    curation run can report per-rule kill rates, plus the conjunction
    ``keep``.  Everything is array-expression work on the tokenized
    row: zero shuffles, zero Python — the whole filter runs inside
    whole-stage codegen at scan speed, which is what lets a 100 TB
    curation pass be scan-bound rather than compute-bound.  The
    top-token fraction is computed per-row over distinct tokens
    (O(distinct·n) on a ~100-token doc) instead of an explode+groupBy —
    trading a trivial per-row loop for two corpus shuffles."""
    return gopher_rules_df(_docs(spark, sf_dir))


def gopher_rules_df(docs: DataFrame,
                    stops: list[str] = _GOPHER_STOPS) -> DataFrame:
    """DataFrame-level core of ``text_gopher_rules`` (docs needs doc_id
    + text) — composable for the curation pipeline.  ``stops`` is the
    required-word list behind the stopword-presence rule; the registry
    query uses Gopher's English list, while a pipeline calibrates it
    per corpus/language (operators/curation.py passes this synthetic
    corpus's function words)."""
    toks = F.col("toks")
    n = F.size(toks)
    df = (docs
          .select("doc_id", "text", tokens_col().alias("toks"))
          .filter(F.size("toks") > 0))
    mean_wl = F.round(
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(x)).cast("double") / n, 6)
    frac_alpha = F.round(
        F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("double")
        / n, 6)
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(toks),
        F.array(*[F.lit(w) for w in stops]))).cast("int")
    sym_ratio = F.round(
        (F.regexp_count("text", F.lit("#"))
         + F.regexp_count("text", F.lit(r"\.\.\.")))
        / n.cast("double"), 6)
    # top token count == longest equal-run of the SORTED token array:
    # one sort + one linear fold per row, vs the naive
    # O(distinct * n) count-per-distinct-token form (measured 0.61s ->
    # ~0.1s at sf0.1; the oracle SQL keeps the naive form — same value)
    run_state = F.aggregate(
        F.array_sort(toks),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)))
            .alias("best")),
        lambda acc: acc["best"])
    top_frac = F.round(run_state.cast("double") / n, 6)
    m = df.select(
        "doc_id", n.cast("int").alias("n_words"),
        mean_wl.alias("mean_word_len"), frac_alpha.alias("frac_alpha_words"),
        stop_hits.alias("n_stop_hits"), sym_ratio.alias("symbol_ratio"),
        top_frac.alias("top_token_frac"))
    rules = {
        "r_word_count": F.col("n_words").between(50, 100000),
        "r_mean_word_len": F.col("mean_word_len").between(3.0, 10.0),
        "r_alpha_words": F.col("frac_alpha_words") >= 0.8,
        "r_stopwords": F.col("n_stop_hits") >= 2,
        "r_symbol_ratio": F.col("symbol_ratio") < 0.1,
        "r_top_token": F.col("top_token_frac") <= 0.2,
    }
    out = m
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
    keep = None
    for cond in rules.values():
        keep = cond if keep is None else keep & cond
    return out.withColumn("keep", keep)


# --- deterministic shuffle-and-shard -------------------------------------

_N_SHARDS = 8
_SHUF_KEY_SQL = "md5('shuffle-seed-42:' || CAST(doc_id AS VARCHAR))"


@query("corpus_shard_shuffle", f"""
    WITH k AS (
      SELECT doc_id,
             {_SHUF_KEY_SQL} AS skey,
             CAST((ascii(substr({_SHUF_KEY_SQL}, 1, 1))
                   + ascii(substr({_SHUF_KEY_SQL}, 2, 1))) % {_N_SHARDS}
                  AS INTEGER) AS shard
      FROM documents)
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY skey, doc_id) AS INTEGER) AS pos
    FROM k
""")
def corpus_shard_shuffle(spark, sf_dir):
    """The shuffle-and-shard step that precedes writing training files:
    every document gets a deterministic pseudo-random shard (seeded md5
    of its id — reproducible across runs and engines, unlike rand())
    and a position within the shard (rank of its shuffle key), so
    `ORDER BY shard, pos` is a stable global permutation of the corpus
    and each shard is an independently shuffled training file.

    Plan shape: the shuffle key is scan-side expression work; the only
    exchange is hashpartitioning(shard) feeding a per-shard sort — at
    real scale N_SHARDS is O(10k), so each window partition is one
    training file's worth and the sort is the per-file sort every
    shard writer needs anyway (this is `repartition(shard) +
    sortWithinPartitions` expressed as a checkable query).  No global
    single-partition sort anywhere."""
    return shard_shuffle_df(_docs(spark, sf_dir))


def shard_shuffle_df(docs: DataFrame) -> DataFrame:
    """DataFrame-level core of ``corpus_shard_shuffle`` (needs doc_id)
    — composable so the curation pipeline shards the FINAL surviving
    corpus (positions are dense within whatever set is passed in)."""
    key = F.md5(F.concat(F.lit("shuffle-seed-42:"),
                         F.col("doc_id").cast("string")))
    k = docs.select(
        "doc_id", key.alias("skey"),
        ((F.ascii(F.substring(key, 1, 1))
          + F.ascii(F.substring(key, 2, 1))) % _N_SHARDS)
        .cast("int").alias("shard"))
    pos = F.row_number().over(
        Window.partitionBy("shard").orderBy("skey", "doc_id"))
    return k.select("doc_id", "shard", pos.cast("int").alias("pos"))


@query("mixture_token_budget", f"""
    WITH tok AS (
      SELECT source,
             CAST(SUM(len({_TOKS_SQL})) AS BIGINT) AS tokens_avail,
             CAST(20 - CAST(substr(source, 4) AS INTEGER) AS DOUBLE) AS w_raw
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(tokens_avail) AS DOUBLE) AS total_tokens,
                   SUM(w_raw) AS w_sum
            FROM tok)
    SELECT source, tokens_avail,
           round(w_raw / w_sum, 6) AS target_weight,
           round((w_raw / w_sum) * 0.5 * total_tokens, 6) AS target_tokens,
           round(LEAST(1.0, (w_raw / w_sum) * 0.5 * total_tokens
                            / tokens_avail), 6) AS sample_rate,
           round(LEAST(1.0, (w_raw / w_sum) * 0.5 * total_tokens
                            / tokens_avail) * tokens_avail, 6)
             AS achieved_tokens
    FROM tok CROSS JOIN tot
""")
def mixture_token_budget(spark, sf_dir):
    """The data-recipe computation a pretraining run starts from: given
    per-source target mixture weights (here derived from the source
    rank — in production a broadcast config table) and a token budget
    (50% of the corpus), emit each source's sampling rate, expected
    token yield, and whether the target is achievable (rate capped at
    1.0 — an under-provisioned source simply yields what it has,
    surfacing the shortfall as achieved < target).

    Plan shape: one scan aggregates per-source token counts (map-side
    partials, 20-row result); the budget join is a broadcast of a
    1-row total.  Everything downstream of the scan is
    dimension-sized — this is the query a scheduler runs before
    launching the actual weighted sample (sample_mixture_weights /
    sample_temperature_mixture execute the recipe)."""
    tok = (_docs(spark, sf_dir)
           .groupBy("source")
           .agg(F.sum(F.size(tokens_col())).cast("bigint")
                .alias("tokens_avail"))
           .withColumn("w_raw", (F.lit(20) - F.substring("source", 4, 10)
                                 .cast("int")).cast("double")))
    tot = tok.agg(F.sum("tokens_avail").cast("double").alias("total_tokens"),
                  F.sum("w_raw").alias("w_sum"))
    weight = F.col("w_raw") / F.col("w_sum")
    rate = F.least(F.lit(1.0),
                   weight * 0.5 * F.col("total_tokens") / F.col("tokens_avail"))
    return (tok.crossJoin(F.broadcast(tot))
            .select("source", "tokens_avail",
                    F.round(weight, 6).alias("target_weight"),
                    F.round(weight * 0.5 * F.col("total_tokens"), 6)
                    .alias("target_tokens"),
                    F.round(rate, 6).alias("sample_rate"),
                    F.round(rate * F.col("tokens_avail"), 6)
                    .alias("achieved_tokens")))


_GOPHER_RULE_NAMES = ["r_word_count", "r_mean_word_len", "r_alpha_words",
                      "r_stopwords", "r_symbol_ratio", "r_top_token"]


@query("quality_rule_funnel", f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents
               WHERE len({_TOKS_SQL}) > 0),
    m AS (SELECT doc_id,
                 CAST(len(toks) AS INTEGER) AS n_words,
                 round(CAST(list_sum(list_transform(toks, x -> len(x)))
                            AS DOUBLE) / len(toks), 6) AS mean_word_len,
                 round(CAST(len(list_filter(toks,
                            x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                       / len(toks), 6) AS frac_alpha_words,
                 CAST(len(list_intersect(list_distinct(toks),
                      [{', '.join("'" + w + "'" for w in _GOPHER_STOPS)}]))
                      AS INTEGER) AS n_stop_hits,
                 round((len(regexp_extract_all(text, '#'))
                        + len(regexp_extract_all(text, '\\.\\.\\.')))
                       / CAST(len(toks) AS DOUBLE), 6) AS symbol_ratio,
                 round(CAST(list_max(list_transform(list_distinct(toks),
                            x -> len(list_filter(toks, y -> y = x))))
                            AS DOUBLE) / len(toks), 6) AS top_token_frac
          FROM t),
    r AS (SELECT doc_id,
                 CAST(n_words BETWEEN 50 AND 100000 AS INTEGER) AS r_word_count,
                 CAST(mean_word_len BETWEEN 3.0 AND 10.0 AS INTEGER) AS r_mean_word_len,
                 CAST(frac_alpha_words >= 0.8 AS INTEGER) AS r_alpha_words,
                 CAST(n_stop_hits >= 2 AS INTEGER) AS r_stopwords,
                 CAST(symbol_ratio < 0.1 AS INTEGER) AS r_symbol_ratio,
                 CAST(top_token_frac <= 0.2 AS INTEGER) AS r_top_token
          FROM m),
    s AS (SELECT *,
                 (r_word_count + r_mean_word_len + r_alpha_words
                  + r_stopwords + r_symbol_ratio + r_top_token) AS n_pass
          FROM r)
    SELECT rule,
           CAST(SUM(1 - pass) AS BIGINT) AS n_failing,
           CAST(SUM(CASE WHEN pass = 0 AND n_pass = 5 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sole_blocker,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM (
      SELECT 'r_word_count' AS rule, r_word_count AS pass, n_pass FROM s
      UNION ALL SELECT 'r_mean_word_len', r_mean_word_len, n_pass FROM s
      UNION ALL SELECT 'r_alpha_words', r_alpha_words, n_pass FROM s
      UNION ALL SELECT 'r_stopwords', r_stopwords, n_pass FROM s
      UNION ALL SELECT 'r_symbol_ratio', r_symbol_ratio, n_pass FROM s
      UNION ALL SELECT 'r_top_token', r_top_token, n_pass FROM s)
    GROUP BY rule
""")
def quality_rule_funnel(spark, sf_dir):
    """The filter-tuning scorecard for the Gopher battery: per rule,
    how many documents fail it (`n_failing`) and how many fail ONLY it
    (`n_sole_blocker` — docs the corpus would gain back if just that
    threshold were relaxed).  This marginal-kill view is what every
    curation tuning session actually needs — total kill rates overstate
    a rule's cost when failures overlap.

    Plan shape: the per-doc rule bits come from the same shuffle-free
    battery as text_gopher_rules; the funnel unpivots six bits per doc
    with stack() (an Expand — no extra scan) into one 6-group hash
    agg.  At 100 TB: one scan, one metadata-sized aggregate."""
    rules_df = gopher_rules_df(_docs(spark, sf_dir))
    bits = [F.col(r).cast("int").alias(r) for r in _GOPHER_RULE_NAMES]
    s = rules_df.select("doc_id", *bits).withColumn(
        "n_pass", sum(F.col(r) for r in _GOPHER_RULE_NAMES))
    stack_expr = "stack({}, {}) AS (rule, pass)".format(
        len(_GOPHER_RULE_NAMES),
        ", ".join(f"'{r}', {r}" for r in _GOPHER_RULE_NAMES))
    return (s.selectExpr(stack_expr, "n_pass")
            .groupBy("rule")
            .agg(F.sum(1 - F.col("pass")).cast("bigint").alias("n_failing"),
                 F.sum(F.when((F.col("pass") == 0) & (F.col("n_pass") == 5),
                              1).otherwise(0)).cast("bigint")
                 .alias("n_sole_blocker"),
                 F.count("*").cast("bigint").alias("n_docs")))


# --- Count-Min Sketch (portable hash family) ------------------------------

_CMS_D, _CMS_W = 4, 64


def _cms_bucket_sql(i: int) -> str:
    h = f"md5(token || ':{i}')"
    nib = ("(strpos('0123456789abcdef', substr({h}, {p}, 1)) - 1)")
    return (f"(({nib.format(h=h, p=1)}) * 16 + ({nib.format(h=h, p=2)}))"
            f" % {_CMS_W}")


def cms_bucket_col(i: int, col: str = "token"):
    """Spark twin of ``_cms_bucket_sql``: row ``i``'s bucket for a
    token — first byte of the salted md5, reduced mod w.  Portable
    nibble math (no conv(); see verify recipe)."""
    nib = "(instr('0123456789abcdef', substr({h}, {p}, 1)) - 1)"
    h = f"md5(concat({col}, ':{i}'))"
    return F.expr(
        f"(({nib.format(h=h, p=1)}) * 16 + ({nib.format(h=h, p=2)}))"
        f" % {_CMS_W}").cast("int")


def cms_bucket_rows(toks: DataFrame) -> DataFrame:
    """(token, b0..b{d-1}): each token occurrence with its d bucket
    ids — the map-side input of both the batch sketch and the
    streaming per-batch delta."""
    return toks.select(
        "token", *[cms_bucket_col(i).alias(f"b{i}") for i in range(_CMS_D)])


def cms_table(buckets: DataFrame) -> DataFrame:
    """(row_i, bucket, n): the d x w CMS counter table — bounded at
    d*w rows regardless of corpus size, and mergeable by plain
    addition (the property the streaming state exploits)."""
    cms = None
    for i in range(_CMS_D):
        c = (buckets.groupBy(F.col(f"b{i}").alias("bucket"))
             .agg(F.count("*").alias("n"))
             .select(F.lit(i).alias("row_i"), "bucket", "n"))
        cms = c if cms is None else cms.unionByName(c)
    return cms


@query("sketch_cms_token_freq", f"""
    WITH tok AS (SELECT unnest({_TOKS_SQL}) AS token FROM documents),
    buckets AS (
      SELECT token,
             {', '.join(f'CAST({_cms_bucket_sql(i)} AS INTEGER) AS b{i}'
                        for i in range(_CMS_D))}
      FROM tok),
    cms AS ({' UNION ALL '.join(
        f"SELECT {i} AS row_i, b{i} AS bucket, count(*) AS n "
        f"FROM buckets GROUP BY b{i}" for i in range(_CMS_D))}),
    exact AS (
      SELECT token, count(*) AS exact_n,
             {', '.join(f'min(b{i}) AS b{i}' for i in range(_CMS_D))}
      FROM buckets GROUP BY token),
    top AS (
      SELECT * FROM exact
      ORDER BY exact_n DESC, token LIMIT 20),
    est AS (
      SELECT t.token, t.exact_n,
             LEAST({', '.join(f'c{i}.n' for i in range(_CMS_D))}) AS est_n
      FROM top t
      {' '.join(f'JOIN cms c{i} ON c{i}.row_i = {i} AND c{i}.bucket = t.b{i}'
                for i in range(_CMS_D))})
    SELECT token, CAST(exact_n AS BIGINT) AS exact_n,
           CAST(est_n AS BIGINT) AS est_n,
           CAST(est_n - exact_n AS BIGINT) AS overcount,
           CAST(est_n >= exact_n AS INTEGER) AS never_undercounts
    FROM est
""")
def sketch_cms_token_freq(spark, sf_dir):
    """Count-Min Sketch completion of the sketch family (HLL distinct,
    top-k, quantiles): a d=4 x w=64 CMS over the corpus token stream
    with an ENGINE-PORTABLE hash family (bucket = first byte of a
    salted md5, reduced mod w), so sketch construction AND its accuracy
    audit — estimate vs exact for the top-20 tokens, the one-sided
    overcount, and the CMS never-undercounts invariant pinned to 1 —
    hash-match DuckDB value-for-value (the verdict-column technique
    from the HLL/top-k sketches, ARCHITECTURE §4.4).

    Plan shape: the CMS is d tiny aggregates over the exploded token
    stream (map-side partials collapse each bucket per task; the
    sketch itself is d*w = 256 rows — the point of CMS is that this
    table stays this size at ANY corpus scale); the audit side
    reuses the exact top-20 (TakeOrdered) and joins the 256-row
    sketch d times broadcast-style.  At 100 TB the sketch replaces
    the full token-frequency table wherever an approximate hot-key
    count suffices (skew pre-detection, heavy-hitter routing)."""
    toks = (_docs(spark, sf_dir)
            .select(F.explode(tokens_col()).alias("token")))
    buckets = cms_bucket_rows(toks)
    cms = cms_table(buckets)
    exact = (buckets.groupBy("token")
             .agg(F.count("*").alias("exact_n"),
                  *[F.min(f"b{i}").alias(f"b{i}") for i in range(_CMS_D)]))
    top = exact.orderBy(F.desc("exact_n"), "token").limit(20)
    est = top
    for i in range(_CMS_D):
        ci = cms.filter(F.col("row_i") == i).select(
            F.col("bucket").alias(f"_bk{i}"), F.col("n").alias(f"_n{i}"))
        est = est.join(F.broadcast(ci), F.col(f"b{i}") == F.col(f"_bk{i}"))
    est_n = F.least(*[F.col(f"_n{i}") for i in range(_CMS_D)])
    return est.select(
        "token", F.col("exact_n").cast("bigint").alias("exact_n"),
        est_n.cast("bigint").alias("est_n"),
        (est_n - F.col("exact_n")).cast("bigint").alias("overcount"),
        (est_n >= F.col("exact_n")).cast("int").alias("never_undercounts"))


# --- fill-in-the-middle transform ----------------------------------------

_FIM_NIB = "(strpos('0123456789abcdef', substr({h}, {p}, 1)) - 1)"


def _fim_byte_sql(p: int) -> str:
    h = "md5('fim:' || CAST(doc_id AS VARCHAR))"
    return (f"(({_FIM_NIB.format(h=h, p=p)}) * 16"
            f" + ({_FIM_NIB.format(h=h, p=p + 1)}))")


@query("transform_fim", f"""
    WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
               WHERE length(text) >= 30),
    cuts AS (
      SELECT doc_id, text, n,
             1 + ({_fim_byte_sql(1)} % CAST(n // 3 AS INTEGER)) AS s1,
             CAST(n // 3 AS INTEGER) + 1 + ({_fim_byte_sql(3)} % CAST(n // 3 AS INTEGER)) AS s2
      FROM d)
    SELECT doc_id, CAST(s1 AS INTEGER) AS s1, CAST(s2 AS INTEGER) AS s2,
           '<PRE>' || substr(text, 1, CAST(s1 AS INTEGER))
             || '<SUF>' || substr(text, CAST(s2 + 1 AS INTEGER))
             || '<MID>' || substr(text, CAST(s1 + 1 AS INTEGER), CAST(s2 - s1 AS INTEGER)) AS fim_text
    FROM cuts
""")
def transform_fim(spark, sf_dir):
    """Fill-in-the-middle corpus transform (Bavarian et al. 2022, the
    PSM format): split each document at two SEEDED pseudo-random
    character offsets — portable salted-md5 bytes, not rand(), so every
    run and both engines cut identically — and emit
    <PRE>prefix<SUF>suffix<MID>middle.  The first cut lands in the
    first third, the second in the middle third, so all three spans are
    non-empty; docs under 30 chars pass through untransformed
    (filtered here; a real run unions them back).

    Plan shape: pure per-row string arithmetic inside the scan
    projection — zero shuffles, zero Python; the FIM pass over 100 TB
    is scan-bound, which is why it is applied on the fly per epoch in
    production pipelines."""
    docs = (_docs(spark, sf_dir)
            .select("doc_id", "text", F.length("text").alias("n"))
            .filter(F.col("n") >= 30))
    nib = "(instr('0123456789abcdef', substr({h}, {p}, 1)) - 1)"

    def byte(p: int):
        h = "md5(concat('fim:', CAST(doc_id AS STRING)))"
        return F.expr(f"(({nib.format(h=h, p=p)}) * 16"
                      f" + ({nib.format(h=h, p=p + 1)}))")

    third = (F.col("n") / 3).cast("int")
    cuts = docs.select(
        "doc_id", "text", "n",
        (F.lit(1) + byte(1) % third).alias("s1"),
        (third + 1 + byte(3) % third).alias("s2"))
    fim = F.concat(
        F.lit("<PRE>"), F.expr("substr(text, 1, s1)"),
        F.lit("<SUF>"), F.expr("substr(text, s2 + 1)"),
        F.lit("<MID>"), F.expr("substr(text, s1 + 1, s2 - s1)"))
    return cuts.select("doc_id", F.col("s1").cast("int").alias("s1"),
                       F.col("s2").cast("int").alias("s2"),
                       fim.alias("fim_text"))


@query("transform_span_corruption", f"""
    WITH d AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    sized AS (
      SELECT doc_id, t, len(t) AS n,
             CAST(len(t) // 20 AS INTEGER) AS blocks
      FROM d WHERE len(t) >= 20),
    offs AS (
      SELECT doc_id, t, n, blocks,
             list_transform(range(0, blocks), k ->
               ((strpos('0123456789abcdef',
                        substr(md5('sc:' || CAST(doc_id AS VARCHAR)
                                   || ':' || CAST(k AS VARCHAR)), 1, 1)) - 1)
                * 16
                + (strpos('0123456789abcdef',
                          substr(md5('sc:' || CAST(doc_id AS VARCHAR)
                                     || ':' || CAST(k AS VARCHAR)), 2, 1)) - 1)
               ) % 18) AS offs
      FROM sized)
    SELECT doc_id,
           CAST(blocks * 3 AS INTEGER) AS n_masked,
           array_to_string(list_transform(range(0, blocks), k ->
             trim(coalesce(array_to_string(
                      t[k * 20 + 1 : k * 20 + offs[k + 1]], ' '), '')
                  || ' <extra_id_' || CAST(k AS VARCHAR) || '> '
                  || coalesce(array_to_string(
                      t[k * 20 + offs[k + 1] + 4 : (k + 1) * 20], ' '), ''))),
             ' ')
             || CASE WHEN n > blocks * 20
                     THEN ' ' || array_to_string(t[blocks * 20 + 1 : n], ' ')
                     ELSE '' END AS corrupted,
           array_to_string(list_transform(range(0, blocks), k ->
             '<extra_id_' || CAST(k AS VARCHAR) || '> '
             || array_to_string(t[k * 20 + offs[k + 1] + 1
                                  : k * 20 + offs[k + 1] + 3], ' ')), ' ')
             AS targets
    FROM offs
""")
def transform_span_corruption(spark, sf_dir):
    """T5-style span-corruption data prep (Raffel et al. 2020): mask a
    3-token span per 20-token block — span offsets are seeded portable
    md5 bytes, and block-locality makes spans overlap-free BY
    CONSTRUCTION (offset <= 17, so a span never crosses its block) —
    emitting the corrupted text with <extra_id_k> sentinels and the
    target sequence of sentinel-prefixed masked spans.  ~15% mask rate
    (3/20), the published default.

    Plan shape: per-row array slicing inside one scan projection —
    zero shuffles, zero Python, fully whole-stage-codegen'd; like the
    FIM transform this runs per epoch at scan speed in production."""
    toks = tokens_col()
    sized = (_docs(spark, sf_dir)
             .select("doc_id", toks.alias("t"))
             .withColumn("n", F.size("t"))
             .filter(F.col("n") >= 20)
             .withColumn("blocks", F.floor(F.col("n") / 20).cast("int")))

    def off(k):
        h = F.md5(F.concat(F.lit("sc:"), F.col("doc_id").cast("string"),
                           F.lit(":"), k.cast("string")))
        return (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % 18)

    offs = sized.withColumn(
        "offs", F.transform(F.sequence(F.lit(0), F.col("blocks") - 1), off))
    t, o = F.col("t"), F.col("offs")
    corrupted_blocks = F.transform(
        F.sequence(F.lit(0), F.col("blocks") - 1),
        lambda k: F.trim(F.concat(
            F.concat_ws(" ", F.slice(t, k * 20 + 1,
                                     F.element_at(o, k + 1))),
            F.lit(" <extra_id_"), k.cast("string"), F.lit("> "),
            F.concat_ws(" ", F.slice(
                t, k * 20 + F.element_at(o, k + 1) + 4,
                20 - F.element_at(o, k + 1) - 3)))))
    tail = F.when(
        F.col("n") > F.col("blocks") * 20,
        F.concat(F.lit(" "), F.concat_ws(" ", F.slice(
            t, F.col("blocks") * 20 + 1,
            F.col("n") - F.col("blocks") * 20)))).otherwise(F.lit(""))
    target_blocks = F.transform(
        F.sequence(F.lit(0), F.col("blocks") - 1),
        lambda k: F.concat(
            F.lit("<extra_id_"), k.cast("string"), F.lit("> "),
            F.concat_ws(" ", F.slice(
                t, k * 20 + F.element_at(o, k + 1) + 1, 3))))
    return offs.select(
        "doc_id", (F.col("blocks") * 3).cast("int").alias("n_masked"),
        F.concat(F.array_join(corrupted_blocks, " "), tail)
        .alias("corrupted"),
        F.array_join(target_blocks, " ").alias("targets"))


# --- DSIR domain-targeted selection --------------------------------------

_DSIR_BIGRAMS_SQL = """
      SELECT doc_id, lang, unnest(
        CASE WHEN len(t) >= 2 THEN
          list_transform(range(1, len(t)),
                         i -> concat(t[i], ' ', t[i+1]))
        ELSE [] END) AS bigram
      FROM (SELECT doc_id, lang, {toks} AS t FROM documents)
""".format(toks=_TOKS_SQL)


@query("dsir_importance_weights", f"""
    WITH bg AS ({_DSIR_BIGRAMS_SQL}),
    bb AS (SELECT doc_id, lang, substr(md5(bigram), 1, 2) AS bucket FROM bg),
    raw AS (SELECT bucket, count(*) AS n_r FROM bb GROUP BY bucket),
    tgt AS (SELECT bucket, count(*) AS n_t FROM bb
            WHERE lang = 'en' GROUP BY bucket),
    tot AS (SELECT (SELECT count(*) FROM bb) AS total_r,
                   (SELECT count(*) FROM bb WHERE lang = 'en') AS total_t),
    lr AS (
      SELECT raw.bucket,
             CAST(round(ln((CAST(COALESCE(n_t, 0) AS DOUBLE) + 1.0)
                           / (total_t + 256))
                        - ln((CAST(n_r AS DOUBLE) + 1.0)
                             / (total_r + 256)), 6)
                  AS DECIMAL(18,6)) AS logratio
      FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN tot)
    SELECT bb.doc_id,
           CAST(count(*) AS INT) AS n_bigrams,
           CAST(SUM(logratio) AS DOUBLE) AS dsir_weight,
           CAST(CAST(SUM(logratio) AS DOUBLE) > 0 AS INT) AS selected
    FROM bb JOIN lr ON bb.bucket = lr.bucket
    GROUP BY bb.doc_id
""")
def dsir_importance_weights(spark, sf_dir):
    """DSIR-style domain-targeted data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every document by the log-likelihood ratio of a TARGET
    domain's hashed-bigram distribution (here lang='en' stands in for
    the curated target set) against the RAW corpus distribution, the
    standard recipe for selecting pretraining data that "looks like"
    a high-quality reference corpus.

    Portability/scale shape: bigrams hash into 256 buckets via the
    first two md5 hex chars (both engines agree byte-for-byte); the
    bucket log-ratio table is 256 rows — Laplace-smoothed, 6dp-rounded
    ln (the text_bigram_lm_score recipe) so per-doc decimal sums are
    order-free and exact.  At 100 TB: one corpus bigram explode, two
    256-row aggregates, a broadcast join of the ratio table back onto
    the exploded stream, one (doc_id) hash agg — selection is a
    threshold (weight > 0: more target-like than raw), NOT a global
    top-k sort, so no single-partition stage anywhere."""
    toks = tokens_col()
    d = (_docs(spark, sf_dir)
         .select("doc_id", "lang", toks.alias("t"))
         .filter(F.size("t") >= 2))
    bb = d.select(
        "doc_id", "lang",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.concat_ws(" ", F.element_at("t", i),
                                  F.element_at("t", i + 1)),
        )).alias("bigram"),
    ).select("doc_id", "lang",
             F.substring(F.md5("bigram"), 1, 2).alias("bucket"))
    raw = bb.groupBy("bucket").agg(F.count("*").alias("n_r"))
    tgt = (bb.filter(F.col("lang") == "en")
           .groupBy("bucket").agg(F.count("*").alias("n_t")))
    tot = bb.agg(
        F.count("*").alias("total_r"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .alias("total_t"))
    lr = (raw.join(tgt, "bucket", "left")
          .crossJoin(F.broadcast(tot))
          .select(
              "bucket",
              F.round(
                  F.log((F.coalesce(F.col("n_t"), F.lit(0)).cast("double")
                         + 1.0) / (F.col("total_t") + 256))
                  - F.log((F.col("n_r").cast("double") + 1.0)
                          / (F.col("total_r") + 256)), 6)
              .cast("decimal(18,6)").alias("logratio")))
    return (bb.join(F.broadcast(lr), "bucket")
            .groupBy("doc_id")
            .agg(F.count("*").cast("int").alias("n_bigrams"),
                 F.sum("logratio").cast("double").alias("dsir_weight"),
                 (F.sum("logratio").cast("double") > 0).cast("int")
                 .alias("selected")))


# --- exact substring-span dedup (ExactSubstr-style) -----------------------

@query("ngram_novelty_decay", f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    mx AS (SELECT max(doc_id) + 1 AS n FROM t),
    grams AS (
      SELECT doc_id, doc_id * 10 // mx.n AS decile,
             md5(array_to_string(toks[u.s:u.s+7], ' ')) AS h
      FROM (SELECT doc_id, toks,
                   unnest(list_transform(range(1, len(toks)-6),
                          i -> {{'s': i}})) AS u
            FROM t WHERE len(toks) >= 8) CROSS JOIN mx),
    per AS (SELECT DISTINCT decile, h FROM grams),
    first_seen AS (SELECT h, min(decile) AS first_decile
                   FROM per GROUP BY h)
    SELECT p.decile,
           CAST(count(*) AS BIGINT) AS n_distinct_grams,
           CAST(SUM(CASE WHEN f.first_decile = p.decile
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_new_grams,
           CAST(SUM(CASE WHEN f.first_decile = p.decile
                         THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
             AS novelty_rate
    FROM per p JOIN first_seen f USING (h)
    GROUP BY p.decile
""")
def ngram_novelty_decay(spark, sf_dir):
    """Corpus DIVERSITY saturation curve: split the corpus into ten
    doc-id deciles (the ingestion-order stand-in) and report, per
    decile, how many of its distinct 8-gram fingerprints are NOVEL —
    first seen in that decile — versus repeats of earlier content.
    A novelty rate decaying toward zero is the data-curation signal
    that additional raw data is mostly re-crawl (dedup will remove it;
    marginal training value is falling — the scaling-laws "data
    exhaustion" diagnostic); a flat curve says the source keeps adding
    genuinely new text.

    Exactness: deciles are integer arithmetic on doc_id against a
    broadcast max (no ntile — a rank-based decile needs a global sort);
    first-seen is a min() aggregate over the gram-fp key; every output
    is an exact-integer count or one division of two of them.
    Plan: the span-dedup gram explode (~1 row per corpus token), one
    fp-keyed aggregate + one (decile, fp) distinct that co-partitions
    with it, and a 10-row report.  At 100 TB this is the same shuffle
    mass as dedup_substring_spans — the curve costs what one dedup
    stats pass costs."""
    t = _docs(spark, sf_dir).select("doc_id", tokens_col().alias("toks"))
    mx = t.agg((F.max("doc_id") + 1).alias("n"))
    K = 8
    n = F.size("toks")
    gram_fps = F.transform(
        F.sequence(F.lit(1), n - K + 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i, K))))
    grams = (t.filter(n >= K)
             .crossJoin(F.broadcast(mx))
             .select(F.expr("CAST(doc_id * 10 DIV n AS BIGINT)")
                     .alias("decile"),
                     F.explode(gram_fps).alias("h")))
    # first_seen derives from the DISTINCT table, not the raw gram
    # stream: min over the deciles present equals min over instances,
    # and this shape runs ONE gram explode feeding one (decile, h)
    # shuffle, with the h-keyed min on the far smaller distinct set
    # (the raw-stream form executed the corpus-sized explode twice)
    per = (grams.select("decile", "h").distinct()
           .localCheckpoint(eager=True))
    # no (h)-keyed join back: every first_seen gram h contributes
    # exactly ONE `per` row with decile == first_decile, so the
    # per-decile novel count is just first_seen regrouped — two
    # vocab-sized aggregates and a 10-row broadcast join replace the
    # r9 shape's vocab x vocab equi-join (guide §2.4)
    n_per = (per.groupBy("decile")
             .agg(F.count("*").cast("bigint").alias("n_distinct_grams")))
    n_new = (per.groupBy("h").agg(F.min("decile").alias("decile"))
             .groupBy("decile")
             .agg(F.count("*").cast("bigint").alias("n_new_grams")))
    return (n_per.join(F.broadcast(n_new), "decile", "left")
            .select("decile", "n_distinct_grams",
                    F.coalesce("n_new_grams", F.lit(0)).cast("bigint")
                    .alias("n_new_grams"),
                    (F.coalesce("n_new_grams", F.lit(0)).cast("double")
                     / F.col("n_distinct_grams")).alias("novelty_rate")))


_SPAN_K = 8  # tokens per window; published ExactSubstr uses 50 BPE tokens

# Shared CTE chain: tokenized docs -> overlapping-gram occurrences ->
# retained-duplicate windows -> merged per-doc spans.  Used by the span
# REPORT below and the span-REMOVAL rewrite after it.
def _span_ctes(k: int) -> str:
    """The span-detection CTE chain at window width ``k`` — shared by
    the 8-token default and the published-threshold 50-token twin."""
    return f"""t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    grams AS (
      SELECT doc_id, u.s AS s,
             md5(array_to_string(toks[u.s:u.s+{k}-1], ' ')) AS h,
             doc_id * 1000000 + u.s AS occ_key
      FROM (SELECT doc_id, toks,
                   unnest(list_transform(range(1, len(toks)-{k}+2),
                          i -> {{'s': i}})) AS u
            FROM t WHERE len(toks) >= {k})),
    gstat AS (SELECT h, count(*) AS cnt, min(occ_key) AS first_key
              FROM grams GROUP BY h),
    dupw AS (
      SELECT g.doc_id, g.s, g.s + {k} - 1 AS e
      FROM grams g JOIN gstat USING (h)
      WHERE gstat.cnt >= 2 AND g.occ_key <> gstat.first_key),
    flagged AS (
      SELECT doc_id, s, e,
             CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  >= s - 1 THEN 0 ELSE 1 END AS new_grp
      FROM dupw),
    grouped AS (
      SELECT doc_id, s, e,
             SUM(new_grp) OVER (PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM flagged),
    spans AS (
      SELECT doc_id, grp, min(s) AS span_s, max(e) AS span_e
      FROM grouped GROUP BY doc_id, grp)"""


_SPAN_CTES = _span_ctes(_SPAN_K)


def span_tokens_df(docs: DataFrame) -> DataFrame:
    """(doc_id, toks) — the tokenized face every span stage shares."""
    return docs.select("doc_id", tokens_col().alias("toks"))


def span_grams_df(t: DataFrame, k: int = _SPAN_K) -> DataFrame:
    """Overlapping-window fingerprints: (doc_id, s, h, occ_key) — one
    row per k-token window at every token offset; occ_key packs
    (doc_id, position) into one orderable bigint (positions < 1e6)."""
    K = k
    n = F.size("toks")
    gram_structs = F.transform(
        F.sequence(F.lit(1), n - K + 1),
        lambda i: F.struct(
            i.alias("s"),
            F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i, K))).alias("h")))
    return (t.filter(n >= K)
            .select("doc_id", F.explode(gram_structs).alias("g"))
            .select("doc_id", F.col("g.s").alias("s"), F.col("g.h").alias("h"))
            .withColumn("occ_key",
                        F.col("doc_id") * F.lit(1_000_000) + F.col("s")))


def merge_spans_df(dupw: DataFrame) -> DataFrame:
    """Merge duplicate windows (doc_id, s, e) into maximal per-doc
    spans (doc_id, span_s, span_e) — the running-max-end interval
    sweep, shuffled once on doc_id, per-doc sorts bounded by doc
    length."""
    wprev = (Window.partitionBy("doc_id").orderBy("s")
             .rowsBetween(Window.unboundedPreceding, -1))
    flagged = dupw.select(
        "doc_id", "s", "e",
        F.when(F.max("e").over(wprev) >= F.col("s") - 1, 0)
        .otherwise(1).alias("new_grp"))
    wsum = (Window.partitionBy("doc_id").orderBy("s")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (flagged
            .select("doc_id", "s", "e",
                    F.sum("new_grp").over(wsum).alias("grp"))
            .groupBy("doc_id", "grp")
            .agg(F.min("s").alias("span_s"), F.max("e").alias("span_e")))


def span_rewrite_df(t: DataFrame, spans: DataFrame) -> DataFrame:
    """Cut every token position covered by a span and re-emit each doc
    from its surviving tokens: (doc_id, n_tokens, kept_tokens,
    text_rewritten).  Shared by the batch rewrite query and the
    incremental streaming twin (streaming/spandedup.py).

    The cut is PER-ROW, not a corpus shuffle: each doc's merged spans
    (few — bounded by doc length / window size) collapse to one small
    array, join back on doc_id (span side ≪ corpus, AQE broadcasts
    it), and a native filter/exists lambda drops covered positions in
    one projection.  The earlier formulation exploded every token into
    (doc_id, p) rows, anti-joined, and re-collected — two corpus-sized
    shuffles this version does not pay (measured 4.4 s → per-row at
    sf0.1; the explode variant's cost grew with corpus tokens, this
    one's with span counts)."""
    sp = (spans.groupBy("doc_id")
          .agg(F.array_sort(F.collect_list(F.struct("span_s", "span_e")))
               .alias("spans")))
    joined = t.join(sp, "doc_id", "left")

    def covered(p):
        return F.coalesce(
            F.exists("spans", lambda s: (p >= s["span_s"])
                     & (p <= s["span_e"])), F.lit(False))

    kept = F.filter(
        F.transform("toks", lambda tok, i: F.struct(
            tok.alias("tok"), (i + 1).cast("bigint").alias("p"))),
        lambda x: ~covered(x["p"]))
    return joined.select(
        "doc_id",
        F.size("toks").cast("int").alias("n_tokens"),
        F.size(kept).cast("int").alias("kept_tokens"),
        F.array_join(F.transform(kept, lambda x: x["tok"]), " ")
        .alias("text_rewritten"))


def _span_frames(docs: DataFrame,
                 k: int = _SPAN_K) -> tuple[DataFrame, DataFrame]:
    """Spark twin of _SPAN_CTES: returns (t, spans) — t = (doc_id,
    toks); spans = merged per-doc duplicate spans (doc_id, span_s,
    span_e).  The first-occurrence rule is a map-side-combinable
    (count, min(occ_key)) hash agg, NOT a row_number window over the
    fingerprint (hot boilerplate grams stay skew-safe)."""
    t = span_tokens_df(docs)
    # the gram relation feeds TWO consumers (the per-h stats agg and
    # the dupw join-back); unpinned, Spark re-runs the tokenize +
    # explode + per-window md5 for each — pin it once, it is the
    # expensive projection of this whole family (guide §1.2 step 1)
    grams = span_grams_df(t, k).localCheckpoint(eager=True)
    gstat = grams.groupBy("h").agg(F.count("*").alias("cnt"),
                                   F.min("occ_key").alias("first_key"))
    dupw = (grams.join(gstat, "h")
            .filter((F.col("cnt") >= 2)
                    & (F.col("occ_key") != F.col("first_key")))
            .select("doc_id", "s", (F.col("s") + k - 1).alias("e")))
    return t, merge_spans_df(dupw)


@query("dedup_substring_spans", f"""
    WITH {_SPAN_CTES},
    rep AS (
      SELECT doc_id, CAST(count(*) AS INTEGER) AS n_dup_spans,
             CAST(SUM(span_e - span_s + 1) AS INTEGER) AS dup_tokens
      FROM spans GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(t.toks) AS INTEGER) AS n_tokens,
           coalesce(rep.n_dup_spans, 0) AS n_dup_spans,
           coalesce(rep.dup_tokens, 0) AS dup_tokens,
           CASE WHEN len(t.toks) = 0 THEN 0.0
                ELSE round(coalesce(rep.dup_tokens, 0)
                           / CAST(len(t.toks) AS DOUBLE), 6)
           END AS dup_frac
    FROM t LEFT JOIN rep USING (doc_id)
""")
def dedup_substring_spans(spark, sf_dir):
    """ExactSubstr-style duplicate-SPAN detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    OVERLAPPING 8-token window is fingerprinted; a window whose
    fingerprint occurs >= 2 times corpus-wide (cross-doc boilerplate OR
    within-doc repetition) is a duplicate occurrence everywhere except
    the single globally-first occurrence (min (doc_id, position), the
    same retain-one rule as dedup_chunk_rewrite); per document the
    surviving duplicate windows are merged into maximal spans with the
    running-max-end interval sweep (interval_merge_overlaps pattern) and
    reported as (n_dup_spans, dup_tokens, dup_frac) — the exact numbers
    a span-removal pass would cut.  Unlike dedup_chunk_exact/_rewrite
    (NON-overlapping 30-token chunks, alignment-sensitive), overlapping
    windows catch duplicated passages at ANY token offset — the property
    the suffix-array formulation provides — at the cost of ~1 row per
    corpus token instead of 1 per 30.

    Scale shape: the gram explode is one scan producing ~n_tokens rows
    (exactly what the published MapReduce-friendly approximations of
    ExactSubstr do when a distributed suffix array is impractical); the
    first-occurrence rule is a map-side-combinable (count, min(occ_key))
    hash agg — NOT a row_number window over fingerprint, so a viral
    boilerplate gram (billions of occurrences at 100 TB) never lands on
    one partition; the join back on h reuses the agg's hash
    partitioning; the interval sweep shuffles once on doc_id with
    per-doc sorts bounded by doc length.  occ_key packs (doc_id,
    position) into one bigint (positions < 1e6 — enforce with a doc
    length cap upstream).  Reference has no dedup at all beyond id
    equality (kafka_producer/reddit_collector_kafka.py:70-76); this is
    the [EXT] training-pipeline surface."""
    t, spans = _span_frames(_docs(spark, sf_dir))
    rep = (spans.groupBy("doc_id")
           .agg(F.count("*").cast("int").alias("n_dup_spans"),
                F.sum(F.col("span_e") - F.col("span_s") + 1).cast("int")
                .alias("dup_tokens")))
    nt = F.size("toks").cast("int")
    return (t.join(rep, "doc_id", "left")
            .select(
                "doc_id", nt.alias("n_tokens"),
                F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
                F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
                F.when(nt == 0, F.lit(0.0))
                .otherwise(F.round(
                    F.coalesce("dup_tokens", F.lit(0))
                    / nt.cast("double"), 6)).alias("dup_frac")))


@query("dedup_substring_rewrite", f"""
    WITH {_SPAN_CTES},
    covered AS (
      SELECT doc_id, u.p AS p
      FROM (SELECT doc_id,
                   unnest(list_transform(range(span_s, span_e + 1),
                          i -> {{'p': i}})) AS u
            FROM spans)),
    tokpos AS (
      SELECT doc_id, u.p AS p, u.tok AS tok
      FROM (SELECT doc_id,
                   unnest(list_transform(toks,
                          (x, i) -> {{'p': i, 'tok': x}})) AS u
            FROM t)),
    kept AS (
      SELECT tokpos.doc_id,
             CAST(count(*) AS INTEGER) AS kept_tokens,
             string_agg(tokpos.tok, ' ' ORDER BY tokpos.p) AS text_rewritten
      FROM tokpos
      ANTI JOIN covered
        ON tokpos.doc_id = covered.doc_id AND tokpos.p = covered.p
      GROUP BY tokpos.doc_id)
    SELECT t.doc_id,
           CAST(len(t.toks) AS INTEGER) AS n_tokens,
           coalesce(kept.kept_tokens, 0) AS kept_tokens,
           coalesce(kept.text_rewritten, '') AS text_rewritten
    FROM t LEFT JOIN kept USING (doc_id)
""")
def dedup_substring_rewrite(spark, sf_dir):
    """The REMOVAL stage of ExactSubstr dedup: every token position
    covered by a merged duplicate span (see dedup_substring_spans —
    retain-one-occurrence, overlapping 8-token windows) is cut, and
    each document is re-emitted from its surviving tokens in original
    order — the corpus a pretraining run would actually consume.
    Fully-duplicate documents come back as empty strings (their later
    occurrences are 100% covered), which is exactly the published
    behaviour: ExactSubstr subsumes exact-document dedup.

    Plan shape on top of the span frames: spans explode to ~dup_tokens
    (doc_id, p) rows (duplicate positions only, not the corpus); the
    cut is one LEFT ANTI join on (doc_id, p) — both sides hash-shuffle
    on the same compound key, skew-bounded by doc length; the rebuild
    groupBy(doc_id) collects ONE document's surviving tokens (the
    dedup_chunk_rewrite sort-struct idiom), never corpus-sized state.
    DuckDB's list_transform index and Spark's posexplode+1 pin the same
    1-based positions on both engines."""
    t, spans = _span_frames(_docs(spark, sf_dir))
    return span_rewrite_df(t, spans)


@query("dedup_soft_weights", f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    flat AS (
      SELECT doc_id, u.idx AS chunk_idx,
             md5(array_to_string(toks[u.idx * 30 + 1:u.idx * 30 + 30], ' '))
               AS fp
      FROM (SELECT doc_id, toks,
                   unnest(list_transform(
                       range(0, CAST((len(toks) - 1) // 30 AS BIGINT) + 1),
                       i -> {{'idx': i}})) AS u
            FROM t WHERE len(toks) > 0)),
    freq AS (SELECT fp, count(*) AS n_occ FROM flat GROUP BY fp)
    SELECT flat.doc_id,
           CAST(count(*) AS INTEGER) AS n_chunks,
           CAST(SUM(freq.n_occ) AS BIGINT) AS total_occurrences,
           round(CAST(SUM(freq.n_occ) AS DOUBLE) / count(*), 6)
             AS commonness,
           round(count(*) / CAST(SUM(freq.n_occ) AS DOUBLE), 6)
             AS soft_weight
    FROM flat JOIN freq USING (fp)
    GROUP BY flat.doc_id
""")
def dedup_soft_weights(spark, sf_dir):
    """Soft deduplication: instead of DROPPING duplicated text, assign
    every document a sampling weight inversely proportional to its
    data commonness — the mean corpus-wide occurrence count of its
    30-token chunk fingerprints (chunk_fingerprints_df, the C4 chunk
    face).  A unique doc gets weight 1.0; a doc whose chunks each
    appear 5x gets 0.2 — feed `soft_weight` into the existing
    weighted samplers (sample_weighted_systematic) to reproduce the
    down-weight-don't-discard recipe recent pretraining work prefers
    over hard dedup (it keeps the tail of partially-duplicated docs
    while equalizing effective epochs over boilerplate).

    Scale shape: one gram explode (1 row / 30 tokens), ONE map-side-
    combinable hash agg to fp frequencies, and a join back on fp that
    reuses the agg's hash partitioning, then a doc_id regroup — the
    same two-shuffle shape as dedup_chunk_rewrite, with integer sums
    the whole way (exact on both engines; only the final two divisions
    are floats, 6dp-rounded)."""
    flat = chunk_fingerprints_df(_docs(spark, sf_dir)).select("doc_id", "fp")
    freq = flat.groupBy("fp").agg(F.count("*").alias("n_occ"))
    return (flat.join(freq, "fp")
            .groupBy("doc_id")
            .agg(F.count("*").cast("int").alias("n_chunks"),
                 F.sum("n_occ").cast("bigint").alias("total_occurrences"),
                 F.round(F.sum("n_occ").cast("double") / F.count("*"), 6)
                 .alias("commonness"),
                 F.round(F.count("*") / F.sum("n_occ").cast("double"), 6)
                 .alias("soft_weight")))


@query("quality_ensemble_score", f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents
               WHERE length(text) > 0),
    s AS (
      SELECT doc_id,
             CAST(len(toks) AS INTEGER) AS n_tokens,
             (1.0 - (length(text) - length(regexp_replace(
                      text, '[^a-zA-Z0-9 ]', '', 'g')))
                 / CAST(length(text) AS DOUBLE))
               * LEAST(1.0, len(toks) / 50.0) AS q,
             CASE WHEN len(toks) >= 3 THEN
               (SELECT CAST(len(g) - len(list_distinct(g)) AS DOUBLE)
                       / len(g)
                FROM (SELECT list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                      AS g))
             ELSE 0.0 END AS rep,
             CASE WHEN {_hits_sql(STOPWORDS)} > 0 THEN 1.0 ELSE 0.0 END
               AS stop_present
      FROM t WHERE len(toks) > 0)
    SELECT doc_id, n_tokens,
           round(q, 6) AS quality,
           round(rep, 6) AS rep_frac,
           CAST(stop_present AS DOUBLE) AS stop_present,
           round(0.5 * q + 0.3 * (1.0 - rep) + 0.2 * stop_present, 6)
             AS ensemble,
           CAST(CASE WHEN 0.5 * q + 0.3 * (1.0 - rep) + 0.2 * stop_present
                          >= 0.5
                     THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM s
""")
def quality_ensemble_score(spark, sf_dir):
    """Ensemble document-quality score — the capstone the quality
    family feeds into practice: a weighted blend of the heuristic
    quality signal (punctuation x length, text_quality_score's core),
    within-document trigram repetition (Gopher's dup-gram fraction,
    inverted), and function-word presence (degenerate-text tripwire),
    with a keep verdict at 0.5 — the single sortable score a curation
    run uses for quality-threshold sweeps and curriculum ordering
    (weights are corpus-calibrated in practice; FineWeb-style
    pipelines learn them, this fixes them for determinism).

    Plan shape: every signal is a per-row native expression (HOFs over
    the token array; the trigram distinct runs on ONE doc's grams,
    bounded by doc length) — zero shuffles, the whole ensemble rides
    the scan in whole-stage codegen.  At 100 TB this is the cheapest
    possible shape: score-and-gate in the same pass that reads the
    corpus."""
    toks = tokens_col()
    df = (_docs(spark, sf_dir)
          .filter(F.length("text") > 0)
          .select("doc_id", "text", toks.alias("toks"))
          .filter(F.size("toks") > 0))
    n = F.size("toks")
    punct = (F.length("text") - F.length(F.array_join(
        F.regexp_extract_all("text", F.lit("[a-zA-Z0-9 ]+"), F.lit(0)), ""))) \
        / F.length("text").cast("double")
    q = (F.lit(1.0) - punct) * F.least(F.lit(1.0), n / F.lit(50.0))
    grams = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(" ", F.element_at("toks", i),
                              F.element_at("toks", i + 1),
                              F.element_at("toks", i + 2)))
    rep = F.when(
        n >= 3,
        (F.size(grams) - F.size(F.array_distinct(grams))).cast("double")
        / F.size(grams)).otherwise(F.lit(0.0))
    stop_present = F.when(_hits(F.col("toks"), STOPWORDS) > 0, 1.0) \
        .otherwise(0.0)
    ensemble_raw = 0.5 * q + 0.3 * (F.lit(1.0) - rep) + 0.2 * stop_present
    return df.select(
        "doc_id", n.cast("int").alias("n_tokens"),
        F.round(q, 6).alias("quality"),
        F.round(rep, 6).alias("rep_frac"),
        stop_present.cast("double").alias("stop_present"),
        F.round(ensemble_raw, 6).alias("ensemble"),
        F.when(ensemble_raw >= 0.5, 1).otherwise(0).cast("int")
        .alias("keep"))


@query("split_leakage_audit", f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tagged AS (
      SELECT doc_id, toks,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                       BETWEEN '0' AND 'c' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                       IN ('d', 'e') THEN 'val'
                  ELSE 'test' END AS split
      FROM t),
    grams AS (
      SELECT doc_id, split,
             md5(array_to_string(toks[u.s:u.s+{_SPAN_K}-1], ' ')) AS h
      FROM (SELECT doc_id, split, toks,
                   unnest(list_transform(range(1, len(toks)-{_SPAN_K}+2),
                          i -> {{'s': i}})) AS u
            FROM tagged WHERE len(toks) >= {_SPAN_K})),
    heldout AS (SELECT DISTINCT h FROM grams WHERE split <> 'train'),
    leaks AS (
      SELECT g.doc_id,
             CAST(count(DISTINCT g.h) AS INTEGER) AS leaked_grams
      FROM grams g JOIN heldout USING (h)
      WHERE g.split = 'train'
      GROUP BY g.doc_id),
    pop AS (SELECT split, CAST(count(*) AS INTEGER) AS n_docs
            FROM tagged GROUP BY split)
    SELECT pop.split, pop.n_docs,
           CAST(coalesce(lk.leaking_docs, 0) AS INTEGER) AS leaking_docs,
           CAST(coalesce(lk.leaked_grams, 0) AS BIGINT) AS leaked_grams
    FROM pop LEFT JOIN (
      SELECT 'train' AS split,
             CAST(count(*) AS INTEGER) AS leaking_docs,
             CAST(SUM(leaked_grams) AS BIGINT) AS leaked_grams
      FROM leaks) lk ON pop.split = lk.split
""")
def split_leakage_audit(spark, sf_dir):
    """Train/test LEAKAGE audit — the check every eval pipeline should
    run after splitting: using the deterministic md5 split
    (split_train_val_test's exact rule), flag every TRAIN document
    that shares an 8-token window with ANY held-out (val/test)
    document, and report per-split populations plus the train-side
    leak counts.  A leaking train doc is the eval-contamination the
    decontam family exists to remove; this query quantifies it for
    THIS split before training spends anything.

    Plan shape: split tagging is a per-row expression on the scan; the
    gram explode is the span-dedup shape (~1 row per corpus token);
    the held-out gram set (distinct fps of the SMALL split fraction,
    3/16 of grams) semi-joins against train grams on the fp hash —
    map-side-combinable distincts on both sides, one narrow shuffle
    each, and the final report is split-cardinality-sized.  At 100 TB
    the held-out fp set is small enough to broadcast or bloom-push."""
    t = (_docs(spark, sf_dir)
         .select("doc_id", tokens_col().alias("toks")))
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (F.when((nib >= "0") & (nib <= "c"), "train")
             .when(nib.isin("d", "e"), "val")
             .otherwise("test"))
    tagged = t.select("doc_id", "toks", split.alias("split"))
    K = _SPAN_K
    n = F.size("toks")
    gram_structs = F.transform(
        F.sequence(F.lit(1), n - K + 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i, K))))
    grams = (tagged.filter(n >= K)
             .select("doc_id", "split",
                     F.explode(gram_structs).alias("h")))
    heldout = (grams.filter(F.col("split") != "train")
               .select("h").distinct())
    leaks = (grams.filter(F.col("split") == "train")
             .join(heldout, "h", "semi")
             .groupBy("doc_id")
             .agg(F.countDistinct("h").cast("int").alias("leaked_grams")))
    pop = tagged.groupBy("split").agg(
        F.count("*").cast("int").alias("n_docs"))
    lk = (leaks.agg(F.count("*").cast("int").alias("leaking_docs"),
                    F.sum("leaked_grams").cast("long").alias("leaked_grams"))
          .withColumn("split", F.lit("train")))
    return (pop.join(F.broadcast(lk), "split", "left")
            .select("split", "n_docs",
                    F.coalesce("leaking_docs", F.lit(0)).cast("int")
                    .alias("leaking_docs"),
                    F.coalesce("leaked_grams", F.lit(0)).cast("long")
                    .alias("leaked_grams")))


@query("text_vocab_coverage", f"""
    WITH freq AS (
      SELECT token, count(*) AS n FROM (
        SELECT unnest({_TOKS_SQL}) AS token FROM documents
      ) GROUP BY token),
    ranked AS (
      SELECT n,
             row_number() OVER (ORDER BY n DESC, token) AS rnk,
             SUM(n) OVER (ORDER BY n DESC, token
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(n) OVER () AS total
      FROM freq),
    marks AS (SELECT unnest([10, 30, 100, 300, 1000]) AS k)
    SELECT marks.k AS vocab_size,
           CAST(max(CASE WHEN rnk <= marks.k THEN cum ELSE 0 END)
                AS BIGINT) AS tokens_covered,
           round(CAST(max(CASE WHEN rnk <= marks.k THEN cum ELSE 0 END)
                      AS DOUBLE) / max(total), 6) AS coverage
    FROM ranked CROSS JOIN marks
    GROUP BY marks.k
""")
def text_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve: what fraction of corpus tokens the
    top-k vocabulary covers, at k in {{10, 30, 100, 300, 1000}} — the
    number that sizes a tokenizer's vocab budget (and the cumulative
    face of text_zipf_fit's rank-frequency slope).  Tie-broken by
    token so the rank order is deterministic on both engines.

    Plan shape: ONE corpus-scale hash agg to vocabulary rows; the
    ranked cumsum is a global window over the VOCABULARY (not the
    corpus — bounded by distinct tokens, and in practice by a top-N
    cutoff far above the largest k); the mark join is 5 literal rows.
    At 100 TB the corpus touches only the first agg."""
    freq = (_docs(spark, sf_dir)
            .select(F.explode(tokens_col()).alias("token"))
            .groupBy("token").agg(F.count("*").alias("n")))
    w = Window.orderBy(F.desc("n"), "token")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = freq.select(
        "n", F.row_number().over(w).alias("rnk"),
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(
            Window.partitionBy().rowsBetween(Window.unboundedPreceding,
                                             Window.unboundedFollowing))
        .alias("total"))
    marks = spark.createDataFrame([(10,), (30,), (100,), (300,), (1000,)],
                                  "k int")
    hit = F.max(F.when(F.col("rnk") <= F.col("k"), F.col("cum"))
                .otherwise(0))
    return (ranked.crossJoin(F.broadcast(marks))
            .groupBy(F.col("k").alias("vocab_size"))
            .agg(hit.cast("bigint").alias("tokens_covered"),
                 F.round(hit.cast("double") / F.max("total"), 6)
                 .alias("coverage")))


@query("text_char_entropy", """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ''), c -> c <> '')
               AS chars
      FROM documents WHERE length(text) > 0),
    s AS (
      SELECT doc_id, chars, len(chars) AS n,
             list_distinct(chars) AS uniq
      FROM t)
    SELECT doc_id,
           CAST(n AS INTEGER) AS n_chars,
           CAST(len(uniq) AS INTEGER) AS distinct_chars,
           round(-list_aggregate(list_transform(uniq, u ->
               (CAST(len(list_filter(chars, c -> c = u)) AS DOUBLE) / n)
               * log2(CAST(len(list_filter(chars, c -> c = u)) AS DOUBLE)
                      / n)), 'sum'), 6) AS entropy_bits,
           CAST(CASE WHEN len(uniq) > 1 AND
                  -list_aggregate(list_transform(uniq, u ->
                    (CAST(len(list_filter(chars, c -> c = u)) AS DOUBLE) / n)
                    * log2(CAST(len(list_filter(chars, c -> c = u))
                                AS DOUBLE) / n)), 'sum')
                    / log2(CAST(len(uniq) AS DOUBLE)) > 0.6
                THEN 1 ELSE 0 END AS INTEGER) AS looks_natural
    FROM s
""")
def text_char_entropy(spark, sf_dir):
    """Character-level Shannon entropy per document — the
    compressibility proxy that separates natural text (entropy/channel
    capacity in a mid band) from degenerate repetition (near 0) and
    random/binary junk (near log2(alphabet)): pipelines gate on the
    NORMALIZED entropy (entropy / log2(distinct)) because raw entropy
    confounds alphabet size.  looks_natural flags docs above 0.6
    normalized — a cheap tripwire complementing quality_ensemble's
    repetition and punctuation signals.

    Plan shape: entirely per-row HOFs — the char frequency loop is
    O(distinct_chars x doc_len) inside one projection, no explode, no
    shuffle; the whole audit rides the scan.  Logs are rounded at 6dp
    AFTER an exact rational p so both engines agree bit-for-bit."""
    chars = F.filter(F.split(F.lower("text"), ""), lambda c: c != "")
    df = (_docs(spark, sf_dir)
          .filter(F.length("text") > 0)
          .select("doc_id", chars.alias("chars")))
    n = F.size("chars")
    uniq = F.array_distinct("chars")

    def plogp(u):
        cnt = F.size(F.filter(F.col("chars"), lambda c: c == u))
        p = cnt.cast("double") / n
        return p * F.log2(p)

    ent = -F.aggregate(uniq, F.lit(0.0), lambda acc, u: acc + plogp(u))
    norm_ok = (F.size(uniq) > 1) & (ent / F.log2(F.size(uniq)
                                                 .cast("double")) > 0.6)
    return df.select(
        "doc_id",
        n.cast("int").alias("n_chars"),
        F.size(uniq).cast("int").alias("distinct_chars"),
        F.round(ent, 6).alias("entropy_bits"),
        F.when(norm_ok, 1).otherwise(0).cast("int").alias("looks_natural"))


@query("source_overlap_matrix", f"""
    WITH t AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
    flat AS (
      SELECT DISTINCT source,
             md5(array_to_string(toks[u.idx * 30 + 1:u.idx * 30 + 30], ' '))
               AS fp
      FROM (SELECT doc_id, source, toks,
                   unnest(list_transform(
                       range(0, CAST((len(toks) - 1) // 30 AS BIGINT) + 1),
                       i -> {{'idx': i}})) AS u
            FROM t WHERE len(toks) > 0)),
    sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_fps
              FROM flat GROUP BY source),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS shared_fps
      FROM flat a JOIN flat b
        ON a.fp = b.fp AND a.source < b.source
      GROUP BY a.source, b.source)
    SELECT sh.source_a, sh.source_b, sa.n_fps AS fps_a, sb.n_fps AS fps_b,
           sh.shared_fps,
           round(CAST(sh.shared_fps AS DOUBLE)
                 / (sa.n_fps + sb.n_fps - sh.shared_fps), 6) AS jaccard
    FROM shared sh
    JOIN sizes sa ON sh.source_a = sa.source
    JOIN sizes sb ON sh.source_b = sb.source
""")
def source_overlap_matrix(spark, sf_dir):
    """Cross-SOURCE duplication governance: for every source pair, how
    many distinct 30-token chunk fingerprints they share and the
    Jaccard of their fingerprint sets — the matrix that tells a corpus
    owner which feeds are republishing each other (and therefore which
    pair a dedup pass will collapse), aggregated at the level
    contracts are negotiated at, not per-document.

    Plan shape: one scan explodes chunks to DISTINCT (source, fp) rows
    (the distinct collapses a source's internal duplication first —
    map-side combinable); the pair join goes through the shared fp key
    only, so disjoint sources never pair; sizes is a sources-row agg
    joined back broadcast.  At 100 TB the (source, fp) relation is the
    chunk index the streaming dedup already persists — this query is
    one self-join over it."""
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    flat = (chunk_fingerprints_df(_docs(spark, sf_dir))
            .join(docs, "doc_id")
            .select("source", "fp").distinct())
    sizes = flat.groupBy("source").agg(F.count("*").cast("bigint")
                                       .alias("n_fps"))
    a = flat.select(F.col("source").alias("source_a"), "fp")
    b = flat.select(F.col("source").alias("source_b"),
                    F.col("fp").alias("fp_b"))
    shared = (a.join(b, (F.col("fp") == F.col("fp_b"))
                     & (F.col("source_a") < F.col("source_b")))
              .groupBy("source_a", "source_b")
              .agg(F.count("*").cast("bigint").alias("shared_fps")))
    sa = sizes.select(F.col("source").alias("source_a"),
                      F.col("n_fps").alias("fps_a"))
    sb = sizes.select(F.col("source").alias("source_b"),
                      F.col("n_fps").alias("fps_b"))
    return (shared.join(F.broadcast(sa), "source_a")
            .join(F.broadcast(sb), "source_b")
            .select("source_a", "source_b", "fps_a", "fps_b", "shared_fps",
                    F.round(F.col("shared_fps").cast("double")
                            / (F.col("fps_a") + F.col("fps_b")
                               - F.col("shared_fps")), 6).alias("jaccard")))


def _hll_overlap_sql() -> str:
    """Oracle for source_overlap_hll: per-source portable HLL
    registers over the chunk fingerprints (the fp IS already an md5
    hex string, so it is the register hash), pairwise max-merged for
    the union estimate, inclusion-exclusion for the shared estimate."""
    from .sketches import _HLL_CAP, _HLL_M, _HLL_REG_SQL_DUCK

    harm = (f"CAST(SUM(1::BIGINT << ({_HLL_CAP} - mx))"
            f" + ({_HLL_M} - COUNT(*)) * (1::BIGINT << {_HLL_CAP})"
            f" AS BIGINT) AS harmonic_s,"
            f" CAST({_HLL_M} - COUNT(*) AS BIGINT) AS n_zero_regs")
    raw = (f"(0.7213 / (1.0 + 1.079 / {_HLL_M})) * {_HLL_M} * {_HLL_M}"
           f" * CAST(1::BIGINT << {_HLL_CAP} AS DOUBLE)"
           f" / CAST(harmonic_s AS DOUBLE)")
    est = (f"round(CASE WHEN {raw} <= 2.5 * {_HLL_M} AND n_zero_regs > 0"
           f" THEN CAST({_HLL_M} AS DOUBLE)"
           f" * ln(CAST({_HLL_M} AS DOUBLE) / n_zero_regs)"
           f" ELSE {raw} END, 4)")
    return f"""
    WITH t AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
    flat AS (
      SELECT DISTINCT source,
             md5(array_to_string(toks[u.idx * 30 + 1:u.idx * 30 + 30], ' '))
               AS h
      FROM (SELECT doc_id, source, toks,
                   unnest(list_transform(
                       range(0, CAST((len(toks) - 1) // 30 AS BIGINT) + 1),
                       i -> {{'idx': i}})) AS u
            FROM t WHERE len(toks) > 0)),
    nib AS (SELECT source, {_HLL_REG_SQL_DUCK} FROM flat),
    rho AS (SELECT source, b0 % {_HLL_M} AS idx,
                   LEAST(CASE WHEN zp = 16 THEN 65
                         ELSE 4 * zp + (CASE WHEN nv >= 8 THEN 0
                                             WHEN nv >= 4 THEN 1
                                             WHEN nv >= 2 THEN 2
                                             ELSE 3 END) + 1
                         END, {_HLL_CAP}) AS rr
            FROM nib),
    regs AS (SELECT source, idx, MAX(rr) AS mx
             FROM rho GROUP BY source, idx),
    prs AS (SELECT a.source AS source_a, b.source AS source_b
            FROM (SELECT DISTINCT source FROM regs) a
            JOIN (SELECT DISTINCT source FROM regs) b
              ON a.source < b.source),
    u AS (SELECT p.source_a, p.source_b, r.idx, r.mx
          FROM prs p JOIN regs r ON r.source = p.source_a
          UNION ALL
          SELECT p.source_a, p.source_b, r.idx, r.mx
          FROM prs p JOIN regs r ON r.source = p.source_b),
    uregs AS (SELECT source_a, source_b, idx, MAX(mx) AS mx
              FROM u GROUP BY source_a, source_b, idx),
    agg1 AS (SELECT source, {harm} FROM regs GROUP BY source),
    est1 AS (SELECT source, {est} AS est FROM agg1),
    aggu AS (SELECT source_a, source_b, {harm}
             FROM uregs GROUP BY source_a, source_b),
    estu AS (SELECT source_a, source_b, {est} AS est_union FROM aggu)
    SELECT e.source_a, e.source_b,
           ea.est AS est_a, eb.est AS est_b, e.est_union,
           round(ea.est + eb.est - e.est_union, 4) + 0.0 AS est_shared,
           round(round(ea.est + eb.est - e.est_union, 4)
                 / e.est_union, 4) + 0.0 AS jaccard_est
    FROM estu e
    JOIN est1 ea ON ea.source = e.source_a
    JOIN est1 eb ON eb.source = e.source_b
"""


@query("source_overlap_hll", _hll_overlap_sql())
def source_overlap_hll(spark, sf_dir):
    """HLL-SKETCHED source-overlap matrix (VERDICT r7 item 6): the
    scale path for ``source_overlap_matrix`` when the source count
    grows past ~1e4 — per-source HyperLogLog registers over the same
    chunk fingerprints, pairwise MAX-merged for a union estimate, and
    inclusion-exclusion (|A|+|B|-|A∪B|) for the shared-chunk estimate.
    No fp-keyed join anywhere: the pairwise work is over m=64-row
    register tables (kilobytes per source), so a 1e4-source corpus
    pairs 5e7 x 64 register rows instead of self-joining the
    corpus-sized fingerprint relation — the estimate quality is the
    standard 1.04/sqrt(64) = 13% sigma, disclosed by comparing
    against the exact twin at small source counts.

    Portability: the chunk fp is ALREADY an md5 hex string, so it is
    the register hash itself (the sketch_hll_portable recipe);
    harmonic sums are exact BIGINTs, one float division + ln per
    estimate, rounded 4dp — hash-identical across engines."""
    from .sketches import _hll_estimate, _hll_registers

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    flat = (chunk_fingerprints_df(_docs(spark, sf_dir))
            .join(docs, "doc_id")
            .select("source", F.col("fp").alias("h")).distinct())
    regs = _hll_registers(flat, ["source"]).localCheckpoint(eager=True)
    srcs = regs.select("source").distinct()
    prs = (srcs.select(F.col("source").alias("source_a"))
           .crossJoin(srcs.select(F.col("source").alias("source_b")))
           .filter(F.col("source_a") < F.col("source_b")))
    u = (regs.join(F.broadcast(prs),
                   regs["source"] == prs["source_a"])
         .select("source_a", "source_b", "idx", "mx")
         .unionAll(regs.join(F.broadcast(prs),
                             regs["source"] == prs["source_b"])
                   .select("source_a", "source_b", "idx", "mx")))
    uregs = (u.groupBy("source_a", "source_b", "idx")
             .agg(F.max("mx").alias("mx")))
    e1 = _hll_estimate(regs, ["source"]).select("source", "est")
    eu = (_hll_estimate(uregs, ["source_a", "source_b"])
          .select("source_a", "source_b",
                  F.col("est").alias("est_union")))
    ea = e1.select(F.col("source").alias("source_a"),
                   F.col("est").alias("est_a"))
    eb = e1.select(F.col("source").alias("source_b"),
                   F.col("est").alias("est_b"))
    shared = F.round(F.col("est_a") + F.col("est_b")
                     - F.col("est_union"), 4)
    return (eu.join(F.broadcast(ea), "source_a")
            .join(F.broadcast(eb), "source_b")
            .select("source_a", "source_b", "est_a", "est_b", "est_union",
                    # + 0.0 collapses IEEE negative zero (a tiny
                    # negative inclusion-exclusion estimate rounds to
                    # -0.0 in DuckDB but 0.0 in Spark)
                    (shared + F.lit(0.0)).alias("est_shared"),
                    (F.round(shared / F.col("est_union"), 4)
                     + F.lit(0.0)).alias("jaccard_est")))


@query("text_ttr_mattr", f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
               WHERE len({_TOKS_SQL}) > 0)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INT) AS n_types,
           round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
             AS ttr,
           round(CASE WHEN len(toks) >= 50 THEN
                   CAST(list_sum(list_transform(
                        generate_series(1, len(toks) - 49),
                        i -> len(list_distinct(toks[i:i+49])))) AS DOUBLE)
                   / ((len(toks) - 49) * 50.0)
                 ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                 END, 6) AS mattr_w50
    FROM t
""")
def text_ttr_mattr(spark, sf_dir):
    """Lexical diversity per document: raw type-token ratio plus MATTR
    (moving-average TTR, Covington & McFall 2010, window 50) — the
    curation-grade signal, because raw TTR falls with document length
    while MATTR is length-invariant, so one threshold works across a
    corpus of mixed-length docs.  Every window statistic is computed
    INSIDE the row over the token array (sequence -> slice ->
    array_distinct -> fold), so the whole query is one scan with zero
    shuffles and zero Python — at 100 TB it rides whole-stage codegen
    at scan speed like the Gopher battery.  Docs shorter than the
    window fall back to raw TTR (the MATTR convention).

    O(n * w) per row is the honest cost; at w=50 on ~100-token docs
    that is ~5k cell-compares per row, far below the explode+window
    alternative's two corpus shuffles."""
    toks = F.col("toks")
    n = F.size(toks)
    types = F.size(F.array_distinct(toks))
    ttr = types.cast("double") / n
    wins = F.transform(
        F.sequence(F.lit(1), n - 49),
        lambda i: F.size(F.array_distinct(F.slice(toks, i, 50))))
    mattr = F.when(
        n >= 50,
        F.aggregate(wins, F.lit(0).cast("long"),
                    lambda acc, x: acc + x).cast("double")
        / ((n - 49) * F.lit(50.0))).otherwise(ttr)
    return (_docs(spark, sf_dir)
            .select("doc_id", tokens_col().alias("toks"))
            .filter(F.size("toks") > 0)
            .select("doc_id",
                    n.cast("int").alias("n_tokens"),
                    types.cast("int").alias("n_types"),
                    F.round(ttr, 6).alias("ttr"),
                    F.round(mattr, 6).alias("mattr_w50")))


_RAKE_STOPS = ["the", "a", "and", "of", "to", "be"]
_RAKE_STOPS_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOPS)
_RAKE_MAX_LEN = 4


@query("text_rake_keywords", f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    pos AS (SELECT doc_id, unnest(toks) AS token,
                   CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos
            FROM t),
    marked AS (SELECT doc_id, token, pos,
                      CASE WHEN token IN ({_RAKE_STOPS_SQL})
                           THEN 1 ELSE 0 END AS is_stop
               FROM pos),
    chained AS (SELECT doc_id, token, pos, is_stop,
                       CAST(SUM(is_stop) OVER (PARTITION BY doc_id
                            ORDER BY pos ROWS UNBOUNDED PRECEDING)
                            AS BIGINT) AS phrase_id
                FROM marked),
    members AS (SELECT doc_id, phrase_id, pos, token
                FROM chained WHERE is_stop = 0),
    phr AS (SELECT doc_id, phrase_id,
                   CAST(count(*) AS BIGINT) AS plen,
                   string_agg(token, ' ' ORDER BY pos) AS phrase
            FROM members GROUP BY doc_id, phrase_id
            HAVING count(*) <= {_RAKE_MAX_LEN}),
    m2 AS (SELECT m.doc_id, m.phrase_id, m.token, p.plen, p.phrase
           FROM members m
           JOIN phr p USING (doc_id, phrase_id)),
    wstats AS (SELECT token, CAST(count(*) AS BIGINT) AS freq,
                      CAST(SUM(plen) AS BIGINT) AS deg
               FROM m2 GROUP BY token),
    occ AS (SELECT m2.doc_id, m2.phrase_id, m2.phrase,
                   CAST(SUM(CAST(CAST(w.deg AS DOUBLE) / w.freq
                        AS DECIMAL(28,12))) AS DOUBLE) AS occ_score
            FROM m2 JOIN wstats w USING (token)
            GROUP BY m2.doc_id, m2.phrase_id, m2.phrase)
    SELECT phrase, CAST(count(*) AS BIGINT) AS n_occs,
           round(max(occ_score), 6) AS score
    FROM occ GROUP BY phrase
    ORDER BY max(occ_score) DESC, phrase LIMIT 20
""")
def text_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal non-stopword token runs (capped at 4 tokens), each
    word scored deg/freq over the candidate corpus (degree = summed
    length of phrases it appears in — rewards co-occurrence), each
    phrase scored as the sum of its members — the zero-training
    keyphrase baseline every extraction pipeline starts from.  Member
    scores are rationals of integers cast to DECIMAL(28,12) before the
    per-phrase sum, so both engines fold identically; top-20 is
    tie-pinned on the phrase string.

    Plan: posexplode -> per-doc window (partitioned by doc_id, no
    global sort) assigns phrase ids as the running stop count; phrase
    assembly and word stats are two hash aggs; the word-stats join is
    a broadcast (vocabulary-sized).  At 100 TB everything shuffles on
    doc or token keys — the quadratic-looking 'degree' is one SUM."""
    stops = [F.lit(w) for w in _RAKE_STOPS]
    pos = (_docs(spark, sf_dir)
           .select("doc_id", F.posexplode(tokens_col())
                   .alias("pos", "token")))
    marked = pos.select(
        "doc_id", "token", "pos",
        F.when(F.col("token").isin(*[w for w in _RAKE_STOPS]), 1)
        .otherwise(0).alias("is_stop"))
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, 0))
    chained = marked.select(
        "doc_id", "token", "pos", "is_stop",
        F.sum("is_stop").over(w).cast("bigint").alias("phrase_id"))
    members = (chained.filter(F.col("is_stop") == 0)
               .select("doc_id", "phrase_id", "pos", "token"))
    phr = (members.groupBy("doc_id", "phrase_id")
           .agg(F.count("*").cast("bigint").alias("plen"),
                F.expr("listagg(token, ' ') WITHIN GROUP (ORDER BY pos)")
                .alias("phrase"))
           .filter(F.col("plen") <= _RAKE_MAX_LEN))
    m2 = members.join(phr, ["doc_id", "phrase_id"])
    wstats = (m2.groupBy("token")
              .agg(F.count("*").cast("bigint").alias("freq"),
                   F.sum("plen").cast("bigint").alias("deg")))
    occ = (m2.join(F.broadcast(wstats), "token")
           .groupBy("doc_id", "phrase_id", "phrase")
           .agg(F.sum((F.col("deg").cast("double") / F.col("freq"))
                      .cast("decimal(28,12)")).cast("double")
                .alias("occ_score")))
    return (occ.groupBy("phrase")
            .agg(F.count("*").cast("bigint").alias("n_occs"),
                 F.max("occ_score").alias("raw"))
            .orderBy(F.desc("raw"), "phrase").limit(20)
            .select("phrase", "n_occs", F.round("raw", 6).alias("score")))


@query("text_burstiness", f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM t),
    c AS (SELECT doc_id, unnest(toks) AS token FROM t),
    dc AS (SELECT token, doc_id, CAST(count(*) AS BIGINT) AS c
           FROM c GROUP BY token, doc_id),
    w AS (SELECT token,
                 CAST(SUM(c) AS BIGINT) AS tot,
                 CAST(SUM(c * c) AS BIGINT) AS tot2,
                 CAST(count(*) AS BIGINT) AS df
          FROM dc GROUP BY token)
    SELECT token, tot, df,
           round((CAST(tot2 AS DOUBLE) / n_docs
                  - (CAST(tot AS DOUBLE) / n_docs)
                    * (CAST(tot AS DOUBLE) / n_docs))
                 / (CAST(tot AS DOUBLE) / n_docs), 6) AS vmr,
           round(CAST(tot AS DOUBLE) / df, 6) AS burstiness
    FROM w CROSS JOIN n
    WHERE tot >= 50
    ORDER BY round((CAST(tot2 AS DOUBLE) / n_docs
                    - (CAST(tot AS DOUBLE) / n_docs)
                      * (CAST(tot AS DOUBLE) / n_docs))
                   / (CAST(tot AS DOUBLE) / n_docs), 6) DESC, token LIMIT 25
""")
def text_burstiness(spark, sf_dir):
    """Token dispersion statistics (Church & Gale 1995): the
    variance-to-mean ratio of a token's per-document count across the
    corpus (Fano factor; 1 = Poisson scatter, >1 = bursty — content
    words clump, function words spread) plus the classic burstiness
    tot/df (mean occurrences per document that HAS the token).  The
    curation use: bursty high-VMR tokens mark topical/boilerplate
    clusters that per-doc quality rules miss.  Documents where the
    token is ABSENT contribute zero to both sums, so the sparse
    (token, doc) table is the whole computation — no dense grid.

    Plan: explode -> (token, doc) hash agg -> token hash agg ->
    broadcast of the 1-row doc count; TakeOrderedAndProject for the
    tie-pinned top-25."""
    t = _docs(spark, sf_dir).select("doc_id", tokens_col().alias("toks"))
    n = t.agg(F.count("*").cast("bigint").alias("n_docs"))
    dc = (t.select("doc_id", F.explode("toks").alias("token"))
          .groupBy("token", "doc_id")
          .agg(F.count("*").cast("bigint").alias("c")))
    w = dc.groupBy("token").agg(
        F.sum("c").cast("bigint").alias("tot"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("tot2"),
        F.count("*").cast("bigint").alias("df"))
    mean = F.col("tot").cast("double") / F.col("n_docs")
    vmr = (F.col("tot2").cast("double") / F.col("n_docs")
           - mean * mean) / mean
    return (w.crossJoin(F.broadcast(n))
            .filter(F.col("tot") >= 50)
            .orderBy(F.desc(F.round(vmr, 6)), "token").limit(25)
            .select("token", "tot", "df",
                    F.round(vmr, 6).alias("vmr"),
                    F.round(F.col("tot").cast("double") / F.col("df"), 6)
                    .alias("burstiness")))


def cdc_chunk_fps(t: DataFrame) -> DataFrame:
    """Content-defined chunk fingerprints for a (doc_id, source, toks)
    relation: boundary wherever the rolling 5-token window's md5
    starts with hex '0' (expected chunk length 16 tokens).  Returns
    (doc_id, source, chunk_id, n_toks, fp).  Shared by the
    dedup_cdc_chunks query and the edit-resilience property test."""
    pos = t.select("doc_id", "source",
                   F.posexplode("toks").alias("pos0", "tok")) \
           .select("doc_id", "source", "tok",
                   (F.col("pos0") + 1).alias("pos"))
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    lagged = pos.select(
        "doc_id", "source", "tok", "pos",
        F.lag("tok", 4).over(wdoc).alias("l4"),
        F.lag("tok", 3).over(wdoc).alias("l3"),
        F.lag("tok", 2).over(wdoc).alias("l2"),
        F.lag("tok", 1).over(wdoc).alias("l1"))
    cut = F.when(
        (F.col("pos") >= 5)
        & (F.substring(F.md5(F.concat_ws(
            " ", "l4", "l3", "l2", "l1", "tok")), 1, 1) == "0"),
        1).otherwise(0)
    cuts = lagged.select("doc_id", "source", "tok", "pos",
                         cut.alias("cut"))
    wrun = (Window.partitionBy("doc_id").orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, -1))
    chunked = cuts.select(
        "doc_id", "source", "tok", "pos",
        F.coalesce(F.sum("cut").over(wrun).cast("bigint"), F.lit(0))
        .alias("chunk_id"))
    return (chunked.groupBy("doc_id", "source", "chunk_id")
            .agg(F.count("*").cast("bigint").alias("n_toks"),
                 F.md5(F.expr(
                     "listagg(tok, ' ') WITHIN GROUP (ORDER BY pos)"))
                 .alias("fp")))


@query("dedup_cdc_chunks", f"""
    WITH t AS (SELECT doc_id, source, {_TOKS_SQL} AS toks
               FROM documents),
    pos AS (SELECT doc_id, source, unnest(toks) AS tok,
                   CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos
            FROM t WHERE len(toks) > 0),
    lagged AS (
      SELECT doc_id, source, tok, pos,
             lag(tok, 4) OVER w AS l4, lag(tok, 3) OVER w AS l3,
             lag(tok, 2) OVER w AS l2, lag(tok, 1) OVER w AS l1
      FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    cuts AS (
      SELECT doc_id, source, tok, pos,
             CASE WHEN pos >= 5 AND substring(md5(concat_ws(' ',
                       l4, l3, l2, l1, tok)), 1, 1) = '0'
                  THEN 1 ELSE 0 END AS cut
      FROM lagged),
    chunked AS (
      SELECT doc_id, source, tok, pos,
             COALESCE(CAST(SUM(cut) OVER (PARTITION BY doc_id
                  ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING) AS BIGINT), 0) AS chunk_id
      FROM cuts),
    chunks AS (
      SELECT doc_id, source, chunk_id,
             CAST(count(*) AS BIGINT) AS n_toks,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
      FROM chunked GROUP BY doc_id, source, chunk_id),
    freq AS (SELECT fp, CAST(count(*) AS BIGINT) AS n
             FROM chunks GROUP BY fp)
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           round(CAST(SUM(CASE WHEN f.n > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS dup_chunk_frac,
           round(CAST(SUM(c.n_toks) AS DOUBLE) / count(*), 4)
             AS mean_chunk_tokens
    FROM chunks c JOIN freq f USING (fp)
    GROUP BY c.source
""")
def dedup_cdc_chunks(spark, sf_dir):
    """CONTENT-DEFINED chunking dedup (the rsync/LBFS recipe, Muthitacharoen
    et al. 2001, as used by chunk-level corpus dedup): instead of fixed
    30-token chunks (dedup_chunk_exact, whose boundaries shift under any
    insertion), a chunk boundary falls wherever the rolling 5-token
    window's md5 starts with hex '0' — a content-anchored cut with
    expected chunk length 16 tokens that RE-SYNCHRONIZES after edits,
    so a one-token insertion dirties only the chunk it lands in, not
    every chunk downstream.  Output: per-source chunk counts, the
    fraction duplicated elsewhere in the corpus, and the realized mean
    chunk length (boundary-rate sanity).

    Plan: one explode -> two doc-partitioned windows (lag window +
    boundary prefix sum; doc-sized partitions, parallel across docs —
    the RAKE chaining shape) -> per-chunk hash agg -> fp-keyed
    frequency join.  At 100 TB the fp relation is ~1/16 of token
    count and the only corpus-order shuffle is the (doc, chunk) agg;
    the md5-prefix cut is engine-portable (no rolling-polynomial
    state, the Rabin fingerprint's distributed-friendly stand-in)."""
    t = (_docs(spark, sf_dir)
         .select("doc_id", "source", tokens_col().alias("toks"))
         .filter(F.size("toks") > 0))
    chunks = cdc_chunk_fps(t).localCheckpoint(eager=True)  # freq+stats
    freq = chunks.groupBy("fp").agg(F.count("*").cast("bigint")
                                    .alias("n"))
    dup = F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
    return (chunks.join(freq, "fp")
            .groupBy("source")
            .agg(F.count("*").cast("bigint").alias("n_chunks"),
                 dup.cast("bigint").alias("n_dup_chunks"),
                 F.round(dup.cast("double") / F.count("*"), 6)
                 .alias("dup_chunk_frac"),
                 F.round(F.sum("n_toks").cast("double") / F.count("*"), 4)
                 .alias("mean_chunk_tokens")))


_PACK_L = 2048


@query("pack_sequences_pairwise", f"""
    WITH d AS (SELECT least(len({_TOKS_SQL}), {_PACK_L}) AS l
               FROM documents WHERE len({_TOKS_SQL}) > 0),
    g AS (SELECT l, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY l),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                 CAST(SUM(l * cnt) AS BIGINT) AS tot FROM g),
    iv AS (SELECT l, cnt,
                  CAST(SUM(cnt) OVER (ORDER BY l DESC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS dend
           FROM g),
    iv2 AS (SELECT l, cnt, dend, dend - cnt + 1 AS dstart FROM iv),
    pairs AS (
      SELECT a.l AS la, b.l AS lb,
             greatest(a.dstart, t.n + 1 - b.dend, 1) AS lo,
             least(a.dend, t.n + 1 - b.dstart, t.n // 2) AS hi
      FROM iv2 a CROSS JOIN iv2 b CROSS JOIN t
      WHERE greatest(a.dstart, t.n + 1 - b.dend, 1)
            <= least(a.dend, t.n + 1 - b.dstart, t.n // 2)),
    pb AS (SELECT CAST(SUM((hi - lo + 1)
                 * (CASE WHEN la + lb <= {_PACK_L} THEN 1 ELSE 2 END))
                 AS BIGINT) AS pair_bins
           FROM pairs)
    SELECT t.n AS n_docs, t.tot AS total_tokens,
           CAST((t.tot + {_PACK_L} - 1) // {_PACK_L} AS BIGINT)
             AS lower_bound_bins,
           CAST(pb.pair_bins + t.n % 2 AS BIGINT) AS packed_bins,
           round(CAST(t.tot AS DOUBLE)
                 / ((pb.pair_bins + t.n % 2) * {_PACK_L}), 6)
             AS utilization,
           round(CAST(t.tot AS DOUBLE) / (t.n * {_PACK_L}), 6)
             AS naive_utilization
    FROM t CROSS JOIN pb
""")
def pack_sequences_pairwise(spark, sf_dir):
    """Training-batch SEQUENCE PACKING planner: how many fixed-length
    context windows (L=2048 tokens) does the corpus need under
    longest-with-shortest pair packing — the deterministic two-per-bin
    variant of first-fit-decreasing used to kill padding waste when
    assembling LLM training batches (cf. Krell et al. 2021's
    histogram-based packing) — versus the ceil(total/L) lower bound
    and the naive one-doc-per-bin utilization.

    The scale trick: the pairing NEVER sorts documents.  Doc lengths
    collapse to the <=L-row length GRID; descending-rank intervals
    per length come from one cumulative sum over that grid; the
    longest[r] / shortest[r] pairing becomes a grid x grid interval-
    intersection join (bounded by L^2 CELLS, independent of corpus
    size), with each cell contributing its rank-interval overlap as
    an integer multiplicity.  One corpus-scale hash agg, then pure
    metadata arithmetic — exact at any row count (all BIGINT)."""
    d = (_docs(spark, sf_dir)
         .select(tokens_col().alias("toks"))
         .filter(F.size("toks") > 0)
         .select(F.least(F.size("toks"), F.lit(_PACK_L)).cast("bigint")
                 .alias("l")))
    g = d.groupBy("l").agg(F.count("*").cast("bigint").alias("cnt"))
    t = g.agg(F.sum("cnt").cast("bigint").alias("n"),
              F.sum(F.col("l") * F.col("cnt")).cast("bigint").alias("tot"))
    # grid-sized global window (<= L rows): the documented benign
    # bounded-sort-width single-partition pattern
    wd = Window.orderBy(F.desc("l")).rowsBetween(
        Window.unboundedPreceding, 0)
    iv = g.select("l", "cnt",
                  F.sum("cnt").over(wd).cast("bigint").alias("dend"))
    iv2 = (iv.withColumn("dstart", F.col("dend") - F.col("cnt") + 1)
           .localCheckpoint(eager=True))       # both pair sides
    a = iv2.select(F.col("l").alias("la"), F.col("dstart").alias("das"),
                   F.col("dend").alias("dae"))
    b = iv2.select(F.col("l").alias("lb"), F.col("dstart").alias("dbs"),
                   F.col("dend").alias("dbe"))
    half = (F.col("n") / 2).cast("bigint")
    lo = F.greatest(F.col("das"), F.col("n") + 1 - F.col("dbe"), F.lit(1))
    hi = F.least(F.col("dae"), F.col("n") + 1 - F.col("dbs"), half)
    pairs = (a.crossJoin(b).crossJoin(F.broadcast(t))
             .select("la", "lb", lo.alias("lo"), hi.alias("hi"))
             .filter(F.col("lo") <= F.col("hi")))
    pb = pairs.agg(F.sum(
        (F.col("hi") - F.col("lo") + 1)
        * F.when(F.col("la") + F.col("lb") <= _PACK_L, 1).otherwise(2))
        .cast("bigint").alias("pair_bins"))
    bins = F.col("pair_bins") + F.col("n") % 2
    return (t.crossJoin(F.broadcast(pb))
            .select(F.col("n").alias("n_docs"),
                    F.col("tot").alias("total_tokens"),
                    F.floor((F.col("tot") + _PACK_L - 1) / _PACK_L)
                    .cast("bigint").alias("lower_bound_bins"),
                    bins.cast("bigint").alias("packed_bins"),
                    F.round(F.col("tot").cast("double")
                            / (bins * _PACK_L), 6).alias("utilization"),
                    F.round(F.col("tot").cast("double")
                            / (F.col("n") * _PACK_L), 6)
                    .alias("naive_utilization")))


@query("dedup_cdc_rewrite", f"""
    WITH t AS (SELECT doc_id, source, {_TOKS_SQL} AS toks
               FROM documents),
    pos AS (SELECT doc_id, source, unnest(toks) AS tok,
                   CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos
            FROM t WHERE len(toks) > 0),
    lagged AS (
      SELECT doc_id, source, tok, pos,
             lag(tok, 4) OVER w AS l4, lag(tok, 3) OVER w AS l3,
             lag(tok, 2) OVER w AS l2, lag(tok, 1) OVER w AS l1
      FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    cuts AS (
      SELECT doc_id, source, tok, pos,
             CASE WHEN pos >= 5 AND substring(md5(concat_ws(' ',
                       l4, l3, l2, l1, tok)), 1, 1) = '0'
                  THEN 1 ELSE 0 END AS cut
      FROM lagged),
    chunked AS (
      SELECT doc_id, source, tok, pos,
             COALESCE(CAST(SUM(cut) OVER (PARTITION BY doc_id
                  ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING) AS BIGINT), 0) AS chunk_id
      FROM cuts),
    chunks AS (
      SELECT doc_id, source, chunk_id,
             CAST(count(*) AS BIGINT) AS n_toks,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
      FROM chunked GROUP BY doc_id, source, chunk_id),
    firsts AS (SELECT fp, MIN(doc_id * 100000 + chunk_id) AS first_key
               FROM chunks GROUP BY fp)
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN c.doc_id * 100000 + c.chunk_id
                              = f.first_key
                         THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
           CAST(SUM(CASE WHEN c.doc_id * 100000 + c.chunk_id
                              = f.first_key
                         THEN c.n_toks ELSE 0 END) AS BIGINT)
             AS kept_tokens,
           CAST(SUM(CASE WHEN c.doc_id * 100000 + c.chunk_id
                              = f.first_key
                         THEN 0 ELSE c.n_toks END) AS BIGINT)
             AS dropped_tokens
    FROM chunks c JOIN firsts f USING (fp)
    GROUP BY c.doc_id
""")
def dedup_cdc_rewrite(spark, sf_dir):
    """The REWRITE half of content-defined chunk dedup (pairs with
    dedup_cdc_chunks the way dedup_chunk_rewrite pairs with
    dedup_chunk_exact): every CDC chunk keeps only its globally-FIRST
    occurrence (min packed (doc_id, chunk_id) — the retain-one rule
    shared by all the dedup rewrites), and each document reports how
    many chunks/tokens survive.  Because CDC boundaries re-anchor
    after edits, this rewrite removes duplicated PASSAGES at any
    offset that fixed-width chunking would miss (pinned by the
    resynchronization property test).

    Plan: the shared cdc_chunk_fps core (two doc-partitioned windows +
    one (doc, chunk) agg), a map-side-combinable (fp -> min key) hash
    agg — never a row_number window over fp, so a viral boilerplate
    chunk cannot land on one partition — and the join back on fp
    reusing the agg's partitioning.  The packed occurrence key bounds
    chunk_id < 1e5 (docs are token-capped far below 1e5 chunks)."""
    t = (_docs(spark, sf_dir)
         .select("doc_id", "source", tokens_col().alias("toks"))
         .filter(F.size("toks") > 0))
    chunks = cdc_chunk_fps(t)
    okey = F.col("doc_id") * 100000 + F.col("chunk_id")
    firsts = (chunks.select("fp", okey.alias("k"))
              .groupBy("fp").agg(F.min("k").alias("first_key")))
    kept = (okey == F.col("first_key")).cast("int")
    return (chunks.join(firsts, "fp")
            .groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_chunks"),
                 F.sum(kept).cast("bigint").alias("kept_chunks"),
                 F.sum(kept * F.col("n_toks")).cast("bigint")
                 .alias("kept_tokens"),
                 F.sum((1 - kept) * F.col("n_toks")).cast("bigint")
                 .alias("dropped_tokens")))


@query("dedup_substring_spans_w50", f"""
    WITH {_span_ctes(50)}
    SELECT t.doc_id,
           CAST(len(t.toks) AS INTEGER) AS n_tokens,
           coalesce(rep.n_dup_spans, 0) AS n_dup_spans,
           coalesce(rep.dup_tokens, 0) AS dup_tokens,
           CASE WHEN len(t.toks) = 0 THEN 0.0
                ELSE round(coalesce(rep.dup_tokens, 0)
                           / CAST(len(t.toks) AS DOUBLE), 6)
           END AS dup_frac
    FROM t
    LEFT JOIN (SELECT doc_id,
                      CAST(count(*) AS INTEGER) AS n_dup_spans,
                      CAST(SUM(span_e - span_s + 1) AS INTEGER)
                        AS dup_tokens
               FROM spans GROUP BY doc_id) rep USING (doc_id)
""")
def dedup_substring_spans_w50(spark, sf_dir):
    """ExactSubstr span detection at the PUBLISHED 50-token threshold
    (Lee et al. 2022 deduplicate substrings of >= 50 BPE tokens; the
    8-token default `dedup_substring_spans` is the high-sensitivity
    setting for this corpus's short docs) — the VERDICT-r7 larger-gram
    twin.  Same retain-first rule, same skew-safe (count, min occ_key)
    hash agg, same interval sweep; only the window width changes, so
    the two queries bracket the precision/recall trade a deployment
    tunes: w=50 flags only passages long enough to be provable copies
    (near-zero false positives, misses short boilerplate), w=8 flags
    everything at ~1 row per corpus token.

    Scale note: LARGER windows are CHEAPER here — the gram relation
    has n_tokens - k + 1 rows per doc either way, but far fewer
    fingerprints recur at w=50, so the dup-window join carries less."""
    t, spans = _span_frames(_docs(spark, sf_dir), k=50)
    rep = (spans.groupBy("doc_id")
           .agg(F.count("*").cast("int").alias("n_dup_spans"),
                F.sum(F.col("span_e") - F.col("span_s") + 1).cast("int")
                .alias("dup_tokens")))
    nt = F.size("toks").cast("int")
    return (t.join(rep, "doc_id", "left")
            .select(
                "doc_id", nt.alias("n_tokens"),
                F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
                F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
                F.when(nt == 0, F.lit(0.0))
                .otherwise(F.round(
                    F.coalesce("dup_tokens", F.lit(0))
                    / nt.cast("double"), 6)).alias("dup_frac")))


@query("mixture_doremi_weights", f"""
    WITH tok AS (SELECT lang, unnest({_TOKS_SQL}) AS w FROM documents),
    dg AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY lang, w),
    nd AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM dg GROUP BY lang),
    gw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cg FROM dg GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM dg),
    kl AS (SELECT dg.lang,
                  CAST(SUM(CAST(
                    (CAST(dg.c AS DOUBLE) / nd.n)
                    * ln((CAST(dg.c AS DOUBLE) / nd.n)
                         / (CAST(gw.cg AS DOUBLE) / tot.n))
                    AS DECIMAL(38,18))) AS DOUBLE) AS excess
           FROM dg
           JOIN nd ON nd.lang = dg.lang
           JOIN gw ON gw.w = dg.w
           CROSS JOIN tot
           GROUP BY dg.lang),
    raw AS (SELECT kl.lang, nd.n AS n_tokens,
                   CAST(nd.n AS DOUBLE) / tot.n AS share,
                   kl.excess,
                   (CAST(nd.n AS DOUBLE) / tot.n) * exp(1.0 * kl.excess)
                     AS r
            FROM kl JOIN nd ON nd.lang = kl.lang CROSS JOIN tot),
    z AS (SELECT CAST(SUM(CAST(r AS DECIMAL(38,18))) AS DOUBLE) AS z
          FROM raw)
    SELECT raw.lang, raw.n_tokens,
           round(raw.share, 6) AS token_share,
           round(raw.excess, 6) AS excess_loss,
           round(raw.r / z.z, 6) AS doremi_weight
    FROM raw CROSS JOIN z
""")
def mixture_doremi_weights(spark, sf_dir):
    """DoReMi-style domain-mixture reweighting (Xie et al. 2023,
    'DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining'; VERDICT r8 item 5a): domains whose distribution the
    reference mixture models WORST get upweighted by an
    exponentiated-gradient step w_d <- share_d * exp(eta *
    excess_loss_d), normalized.  The published excess loss is
    proxy-model-minus-reference-model log-loss; the oracle-expressible
    instantiation here uses its exact information-theoretic analogue:
    excess_d = KL(P_d || P_global) under the domain's empirical
    unigram distribution — precisely the extra nats per token a
    reference model trained on the pooled mixture pays on domain d
    (per-domain unigram LM = the proxy, pooled unigram LM = the
    reference).  eta = 1.

    Exactness: per-(domain, word) KL terms are doubles computed from
    exact integer counts with identical op order on both engines,
    summed in DECIMAL(38,18) (the transcendental-sum convention); the
    5-row softmax normalizer is likewise a decimal sum — see the
    _doremi_pivot block comment for the pivot-form equivalence
    argument.  Plan (r10): ONE corpus scan -> per-word lang-PIVOTED
    hash agg (pinned, shared by the trajectory/t5 twins); the KL pass
    is a single shuffle-free aggregate over the pivot (the word
    marginal is an in-row sum of the count columns), and the final
    reweighting is arithmetic on a #domains-row frame.  At 100 TB:
    map-side partial counts ride the scan; nothing but per-word count
    vectors ever shuffle — once — and the EG step moves #domains
    numbers."""
    try:
        piv, langs, col_of, nd, tot = _doremi_pivot(spark, sf_dir)
    except DoremiDomainOverflow:
        # join-based step-1 equivalent — same algebra, no pivot width
        dg = (_docs(spark, sf_dir)
              .select("lang", F.explode(tokens_col()).alias("w"))
              .groupBy("lang", "w")
              .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
        return doremi_from_counts(dg)
    if not langs:
        return spark.createDataFrame(
            [], "lang string, n_tokens bigint, token_share double, "
                "excess_loss double, doremi_weight double")
    (s1,) = _doremi_pivot_steps(piv, langs, col_of, nd, tot, 1)
    out = spark.createDataFrame(
        [(l, int(nd[l]), s1[l]["e"], s1[l]["wt"]) for l in langs],
        "lang string, n_tokens bigint, e double, wt double")
    share = F.col("n_tokens").cast("double") / F.lit(tot)
    return out.select("lang", "n_tokens",
                      F.round(share, 6).alias("token_share"),
                      F.round("e", 6).alias("excess_loss"),
                      F.round("wt", 6).alias("doremi_weight"))


def doremi_from_counts(dg):
    """The DoReMi reweighting algebra over a (lang, w, c) count
    relation — shared by the batch query and the streaming mixture
    monitor (streaming/mixturestate.py), so stream == batch by
    construction on the same ingested counts."""
    nd = dg.groupBy("lang").agg(F.sum("c").cast("bigint").alias("n"))
    gw = dg.groupBy("w").agg(F.sum("c").cast("bigint").alias("cg"))
    tot = dg.agg(F.sum("c").cast("bigint").alias("nt"))
    p_d = F.col("c").cast("double") / F.col("n")
    p_g = F.col("cg").cast("double") / F.col("nt")
    kl = (dg.join(F.broadcast(nd), "lang")
          .join(gw, "w")
          .crossJoin(F.broadcast(tot))
          .groupBy("lang")
          .agg(F.sum((p_d * F.log(p_d / p_g)).cast("decimal(38,18)"))
               .cast("double").alias("excess")))
    share = F.col("n").cast("double") / F.col("nt")
    raw = (kl.join(F.broadcast(nd), "lang")
           .crossJoin(F.broadcast(tot))
           .select("lang", F.col("n").alias("n_tokens"),
                   share.alias("share"), "excess",
                   (share * F.exp(F.lit(1.0) * F.col("excess")))
                   .alias("r")))
    z = raw.agg(F.sum(F.col("r").cast("decimal(38,18)"))
                .cast("double").alias("z"))
    return (raw.crossJoin(F.broadcast(z))
            .select("lang", "n_tokens",
                    F.round("share", 6).alias("token_share"),
                    F.round("excess", 6).alias("excess_loss"),
                    F.round(F.col("r") / F.col("z"), 6)
                    .alias("doremi_weight")))


# --- DoReMi over the lang-PIVOTED count table (r10 optimization) ----------
#
# The join-based EG step (doremi_from_counts / the unrolled CTE oracles)
# pays TWO vocab-sized shuffles per step: the per-word reference-mixture
# regroup (q_k = dg GROUP BY w) and the dg JOIN q_k re-join.  But with a
# handful of domains the whole recurrence only ever needs, per word, the
# count vector across domains — so pivot (w, lang, c) into one row per
# word (w, c_0..c_D) ONCE, and every step becomes a single shuffle-free
# aggregate over the pinned pivot: Q_{k-1}(w) is an in-row expression
# over the count columns and the LITERAL step-(k-1) weights (#domains
# doubles collected per step — the bounded-driver-reduction contract the
# k-center/BPE loops already use).  At 100 TB: zero vocab shuffles per
# step instead of two; the per-step data cost is one scan of the pivot.
#
# Exactness (the oracle SQL is unchanged, so this must be value-
# identical): every decimal accumulation stays EXACT —
#   * e_k per domain: the same CAST(p*ln(p/q) AS DECIMAL(38,18)) terms
#     summed by F.sum (exact aggregate); words where a domain has no
#     count contribute no term (F.when with no otherwise), exactly like
#     the absent (lang, w) rows of dg.
#   * Q_{k-1}(w): the oracle sums CAST(wt*p AS DECIMAL(38,18)) over the
#     <= #domains rows of word w.  Here each term is CAST to
#     DECIMAL(20,18) — identical digits for |x| < 100, and wt*p <= 1 —
#     and the terms are added PAIRWISE (tree fold): decimal + keeps
#     scale 18 and grows precision by 1 per tree LEVEL, so the sum is
#     exact (never scale-reduced) up to 2^18 domains; absent domains
#     coalesce to an exact decimal zero.  The decimal value equals the
#     oracle's SUM digit for digit, so the CAST to DOUBLE agrees.
#   * r/z/wt and all transcendentals (ln, exp) are computed by the SAME
#     JVM expressions on #domains-row frames; weights cross steps as
#     collected doubles re-embedded via F.lit (bit-exact round trip).

_DOREMI_PIVOT_MEMO = SessionMemo()

# Domain-count bound for the pivot form (ADVICE r10): one pivot column +
# per-domain codegen expressions per distinct lang means the plan
# degrades (wide rows, huge expression trees) at large domain counts,
# hard-fails past spark.sql.pivotMaxValues (10000), and the
# DECIMAL(20,18) tree-sum exactness argument holds to 2^18 terms.  4096
# sits comfortably under all three; DoReMi domain mixtures are
# O(10)-O(100) in practice (language/source buckets).
DOREMI_MAX_DOMAINS = 4096


class DoremiDomainOverflow(ValueError):
    """Raised when the corpus has more distinct domains than the
    pivot-form DoReMi recurrence supports; callers with a join-based
    equivalent (``doremi_from_counts``) fall back to it."""


def _doremi_pivot(spark: SparkSession, sf_dir: str):
    """(piv, langs, col_of, nd, tot): the per-word lang-pivoted count
    table (w, c_0..c_D) pinned once per dataset — the stored
    mixture-counts artifact all three DoReMi queries share (the same
    relation streaming/mixturestate.py persists as its state), built
    with ONE corpus-token shuffle.  ``langs`` are the ACTIVE domains
    (>= 1 token; token-less langs have no dg rows and are absent from
    the join-based outputs too), ``col_of`` maps lang -> pivot column,
    ``nd``/``tot`` the exact per-domain/corpus token totals."""
    got = _DOREMI_PIVOT_MEMO.get(spark, sf_dir)
    if got is not None:
        return got
    d = _docs(spark, sf_dir).select("lang", tokens_col().alias("toks"))
    all_langs = sorted(
        r[0] for r in d.select("lang").distinct().collect())
    if not all_langs:
        got = (None, [], {}, {}, 0)
        _DOREMI_PIVOT_MEMO.put(spark, sf_dir, got)
        return got
    if len(all_langs) > DOREMI_MAX_DOMAINS:
        raise DoremiDomainOverflow(
            f"{len(all_langs)} distinct domains exceed the pivot-form "
            f"bound ({DOREMI_MAX_DOMAINS}); use the join-based "
            "doremi_from_counts recurrence for this corpus")
    cols = [f"c{i}" for i in range(len(all_langs))]
    piv = (d.select("lang", F.explode("toks").alias("w"))
           .groupBy("w").pivot("lang", all_langs)
           .agg(F.count(F.lit(1)).cast("bigint"))
           .toDF("w", *cols)
           .localCheckpoint(eager=True))
    tot_row = piv.agg(*[F.sum(c).cast("bigint").alias(c)
                        for c in cols]).collect()[0]
    nd = {l: tot_row[c] for l, c in zip(all_langs, cols) if tot_row[c]}
    langs = sorted(nd)
    col_of = {l: c for l, c in zip(all_langs, cols) if l in nd}
    got = (piv, langs, col_of, nd, sum(nd.values()))
    _DOREMI_PIVOT_MEMO.put(spark, sf_dir, got)
    return got


def _tree_sum(terms):
    """Pairwise (tree) fold of a column list with ``+`` — for decimals
    the result precision grows 1 per LEVEL instead of 1 per term, so
    the sum stays exact far past any realistic domain count."""
    while len(terms) > 1:
        nxt = [a + b for a, b in zip(terms[0::2], terms[1::2])]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def _doremi_pivot_steps(piv, langs, col_of, nd, tot, n_steps):
    """Run the EG recurrence to ``n_steps`` over the pivoted count
    table with exactly ONE Spark job per step: the per-domain KL sums
    ride the single shuffle-free ``piv`` aggregate, and the EG update
    (r, the decimal-sum normalizer z, wt = r/z) rides a global-frame
    window over the #domains-row explode of that aggregate — a LINEAR
    plan with no second branch, so nothing recomputes and nothing
    needs a checkpoint or broadcast (the first cut's per-step
    z-aggregate + crossJoin re-ran the piv aggregate for the broadcast
    subtree unless checkpointed, ~3 extra jobs per step).  The window
    SUM evaluates the same exact decimal Sum over the same #domains
    terms as the oracle's z CTE, so wt is value-identical.  Each
    step's (lang, e, wt) rows are collected — #domains doubles, the
    bounded-driver-reduction contract — and the weights re-enter step
    k+1 (and the callers' output frames) as exact literals."""

    results: list[dict] = []
    wt_prev: dict | None = None
    for step in range(1, n_steps + 1):
        if step == 1:
            # reference = pooled mixture: per-word global count / total
            cg = _tree_sum([F.coalesce(F.col(col_of[l]), F.lit(0))
                            for l in langs])
            q_expr = cg.cast("double") / F.lit(tot)
        else:
            # reference = last step's weighted mixture, in-row
            zero = F.lit(0).cast("decimal(20,18)")
            terms = []
            for l in langs:
                c = F.col(col_of[l])
                p_d = c.cast("double") / F.lit(nd[l])
                terms.append(F.coalesce(
                    F.when(c > 0, (F.lit(float(wt_prev[l])) * p_d)
                           .cast("decimal(20,18)")), zero))
            q_expr = _tree_sum(terms).cast("double")
        aggs = []
        for i, l in enumerate(langs):
            c = F.col(col_of[l])
            p_d = c.cast("double") / F.lit(nd[l])
            aggs.append(F.sum(F.when(c > 0,
                                     (p_d * F.log(p_d / q_expr))
                                     .cast("decimal(38,18)")))
                        .cast("double").alias(f"e{i}"))
        structs = [F.struct(
            F.lit(l).alias("lang"),
            F.lit(int(nd[l])).cast("bigint").alias("n"),
            (F.lit(float(wt_prev[l])) if wt_prev is not None
             else F.lit(None).cast("double")).alias("wt_prev"),
            F.col(f"e{i}").alias("e")) for i, l in enumerate(langs)]
        ef = (piv.agg(*aggs)
              .select(F.explode(F.array(*structs)).alias("s"))
              .select("s.*"))
        if step == 1:
            r = ((F.col("n").cast("double") / F.lit(tot))
                 * F.exp(F.lit(1.0) * F.col("e")))
        else:
            r = F.col("wt_prev") * F.exp(F.lit(1.0) * F.col("e"))
        z = (F.sum(r.cast("decimal(38,18)"))
             .over(Window.partitionBy()).cast("double"))
        rows = ef.select("lang", "e", (r / z).alias("wt")).collect()
        results.append({row["lang"]: {"e": row["e"], "wt": row["wt"]}
                        for row in rows})
        wt_prev = {l: results[-1][l]["wt"] for l in langs}
    return results


@query("text_heaps_law", f"""
    WITH d AS (SELECT doc_id, len({_TOKS_SQL}) AS nt FROM documents),
    tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS w FROM documents),
    fo AS (SELECT w, min(doc_id) AS fd FROM tok GROUP BY w),
    vnew AS (SELECT fd AS doc_id, CAST(count(*) AS BIGINT) AS nv
             FROM fo GROUP BY fd),
    cum AS (SELECT d.doc_id,
                   CAST(SUM(d.nt) OVER (ORDER BY d.doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS t,
                   CAST(SUM(coalesce(vnew.nv, 0)) OVER (ORDER BY d.doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS v
            FROM d LEFT JOIN vnew ON vnew.doc_id = d.doc_id),
    pts AS (SELECT ln(CAST(t AS DOUBLE)) AS x, ln(CAST(v AS DOUBLE)) AS y
            FROM cum WHERE t > 0 AND v > 0),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy
          FROM pts),
    fit AS (SELECT n,
                   (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta,
                   sx, sy FROM m)
    SELECT fit.n AS n_points,
           (SELECT CAST(SUM(nt) AS BIGINT) FROM d) AS total_tokens,
           (SELECT CAST(count(*) AS BIGINT) FROM fo) AS vocab_size,
           round(fit.beta, 6) AS heaps_beta,
           round(exp((fit.sy - fit.beta * fit.sx) / fit.n), 6) AS heaps_k
    FROM fit
""")
def text_heaps_law(spark, sf_dir):
    """Heaps'-law vocabulary-growth fit (Heaps 1978; Herdan 1960):
    V(T) ~ K * T^beta over the corpus read in doc_id order — the
    curve that budgets tokenizer vocab size and predicts how much
    NEW vocabulary another 10x of corpus will bring (the diminishing-
    returns companion to ngram_novelty_decay, which tracks novel
    n-grams; this tracks novel TYPES with the classic power-law fit).

    Plan: per-doc token counts come straight off the scan (size(),
    no explode); the explode happens once to find each word's FIRST
    document (hash agg on the Zipf-sized vocab); both cumulative
    curves (tokens, vocabulary) are the repo's TWO-PHASE running sum
    over the doc grid — range partition + per-partition window +
    P-row broadcast offsets, no single-partition window over docs —
    and the log-log OLS fit is a 5-aggregate decimal-summed scan of
    the (x, y) points, closed-form slope/intercept on a 1-row
    relation.  At 100 TB: one explode-shuffle sized by distinct
    (word, first-doc), one range exchange of doc-grid-sized rows, and
    the fit moves 5 numbers."""
    d = (_docs(spark, sf_dir)
         .select("doc_id", F.size(tokens_col()).cast("bigint").alias("nt")))
    fo = (_docs(spark, sf_dir)
          .select("doc_id", F.explode(tokens_col()).alias("w"))
          .groupBy("w").agg(F.min("doc_id").alias("fd")))
    vocab = fo.agg(F.count("*").cast("bigint").alias("vocab_size"))
    vnew = (fo.groupBy(F.col("fd").alias("doc_id"))
            .agg(F.count("*").cast("bigint").alias("nv")))
    base = (d.join(vnew, "doc_id", "left")
            .select("doc_id", "nt",
                    F.coalesce("nv", F.lit(0)).cast("bigint").alias("nv")))
    tot = base.agg(F.sum("nt").cast("bigint").alias("total_tokens"))
    # two-phase global running sums over the doc grid (the
    # assign_contiguous_ids pattern: no single-partition window)
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    with_pid = (base.repartitionByRange(n_parts, "doc_id")
                .withColumn("pid", F.spark_partition_id())
                .localCheckpoint())
    wrun = (Window.partitionBy("pid").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0))
    local = with_pid.select(
        "pid", "doc_id",
        F.sum("nt").over(wrun).cast("bigint").alias("lt"),
        F.sum("nv").over(wrun).cast("bigint").alias("lv"))
    woff = (Window.orderBy("pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = (with_pid.groupBy("pid")
            .agg(F.sum("nt").alias("pt"), F.sum("nv").alias("pv"))
            .select("pid",
                    F.coalesce(F.sum("pt").over(woff), F.lit(0))
                    .alias("offt"),
                    F.coalesce(F.sum("pv").over(woff), F.lit(0))
                    .alias("offv")))
    cum = (local.join(F.broadcast(offs), "pid")
           .select((F.col("lt") + F.col("offt")).cast("bigint").alias("t"),
                   (F.col("lv") + F.col("offv")).cast("bigint").alias("v")))
    pts = (cum.filter((F.col("t") > 0) & (F.col("v") > 0))
           .select(F.log(F.col("t").cast("double")).alias("x"),
                   F.log(F.col("v").cast("double")).alias("y")))
    d18 = lambda c: F.sum(c.cast("decimal(38,18)")).cast("double")  # noqa: E731
    m = pts.agg(F.count("*").cast("bigint").alias("n"),
                d18(F.col("x")).alias("sx"), d18(F.col("y")).alias("sy"),
                d18(F.col("x") * F.col("x")).alias("sxx"),
                d18(F.col("x") * F.col("y")).alias("sxy"))
    fit = m.selectExpr(
        "n", "sx", "sy",
        "(n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta")
    return (fit.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(vocab))
            .selectExpr("n AS n_points", "total_tokens", "vocab_size",
                        "round(beta, 6) AS heaps_beta",
                        "round(exp((sy - beta * sx) / n), 6) AS heaps_k"))


@query("sample_rho_excess_loss", f"""
    WITH d AS (SELECT doc_id, doc_id % 2 AS half,
                      unnest({_TOKS_SQL}) AS w FROM documents),
    dg AS (SELECT doc_id, half, w, CAST(count(*) AS BIGINT) AS c
           FROM d GROUP BY doc_id, half, w),
    hw AS (SELECT w,
             CAST(SUM(CASE WHEN half = 0 THEN c ELSE 0 END) AS BIGINT)
               AS c0,
             CAST(SUM(CASE WHEN half = 1 THEN c ELSE 0 END) AS BIGINT)
               AS c1
           FROM dg GROUP BY w),
    tot AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0,
                   CAST(SUM(c1) AS BIGINT) AS n1,
                   CAST(count(*) AS BIGINT) AS v FROM hw),
    model AS (SELECT w,
                ln((CAST(c0 AS DOUBLE) + 1.0) / (n0 + v)) AS lnp0,
                ln((CAST(c1 AS DOUBLE) + 1.0) / (n1 + v)) AS lnp1
              FROM hw CROSS JOIN tot),
    per AS (SELECT dg.doc_id, dg.half,
              CAST(SUM(dg.c) AS BIGINT) AS n_tokens,
              CAST(SUM(CAST(dg.c * (CASE WHEN dg.half = 0
                                         THEN m.lnp0 ELSE m.lnp1 END)
                       AS DECIMAL(38,18))) AS DOUBLE) AS s_own,
              CAST(SUM(CAST(dg.c * (CASE WHEN dg.half = 0
                                         THEN m.lnp1 ELSE m.lnp0 END)
                       AS DECIMAL(38,18))) AS DOUBLE) AS s_other
            FROM dg JOIN model m ON m.w = dg.w
            GROUP BY dg.doc_id, dg.half),
    sc AS (SELECT doc_id, half, n_tokens,
                  -(s_other) / n_tokens AS hold,
                  -(s_own) / n_tokens AS own
           FROM per)
    SELECT doc_id, CAST(half AS BIGINT) AS half, n_tokens,
           round(hold, 6) AS holdout_loss,
           round(own, 6) AS own_loss,
           round(hold - own, 6) AS excess_loss
    FROM sc ORDER BY hold - own DESC, doc_id LIMIT 20
""")
def sample_rho_excess_loss(spark, sf_dir):
    """RHO-loss-style data selection (Mindermann et al. 2022,
    'Prioritized Training on Points that are Learnable, Worth
    Learning, and Not Yet Learnt'): rank documents by REDUCIBLE
    holdout loss — loss under a model that has NOT seen the doc minus
    loss under one that has.  High excess = novel-or-noisy content
    the rest of the corpus does not explain; near-zero = redundant.
    Cross-fitted instantiation inside the verified perimeter: docs
    split by doc_id parity, each half gets an add-one-smoothed
    unigram LM over the POOLED vocabulary, and every doc is scored
    under both — its own half's model (irreducible arm) and the
    other half's (holdout arm); output is the top-20 excess-loss
    docs, the batch a RHO-style sampler would prioritize.

    Exactness: both models' log-probs are computed ONCE per vocab
    word as identical double op chains; per-doc sums weight them by
    exact integer counts in DECIMAL(38,18); ranking orders on the
    unrounded double with a doc_id tiebreak (duplicate docs tie
    exactly).  Plan: one explode -> (doc, word) hash agg; the model
    is vocab-sized grouped algebra; scoring is one join of the
    per-doc-word counts to the 2-column model grid; top-20 is
    TakeOrderedAndProject.  At 100 TB: nothing corpus-sized shuffles
    except the (doc, word) agg, and the two 'trained models' are one
    Zipf-sized relation built in the same pass."""
    d = (_docs(spark, sf_dir)
         .select("doc_id", (F.col("doc_id") % 2).alias("half"),
                 F.explode(tokens_col()).alias("w")))
    dg = (d.groupBy("doc_id", "half", "w")
          .agg(F.count("*").cast("bigint").alias("c")))
    hw = (dg.groupBy("w")
          .agg(F.sum(F.when(F.col("half") == 0, F.col("c")).otherwise(0))
               .cast("bigint").alias("c0"),
               F.sum(F.when(F.col("half") == 1, F.col("c")).otherwise(0))
               .cast("bigint").alias("c1"))
          .localCheckpoint(eager=True))        # feeds tot + model
    tot = hw.agg(F.sum("c0").cast("bigint").alias("n0"),
                 F.sum("c1").cast("bigint").alias("n1"),
                 F.count("*").cast("bigint").alias("v"))
    model = (hw.crossJoin(F.broadcast(tot))
             .selectExpr("w",
                         "ln((CAST(c0 AS DOUBLE) + 1.0) / (n0 + v))"
                         " AS lnp0",
                         "ln((CAST(c1 AS DOUBLE) + 1.0) / (n1 + v))"
                         " AS lnp1"))
    own = F.when(F.col("half") == 0, F.col("lnp0")).otherwise(F.col("lnp1"))
    oth = F.when(F.col("half") == 0, F.col("lnp1")).otherwise(F.col("lnp0"))
    per = (dg.join(model, "w")
           .groupBy("doc_id", "half")
           .agg(F.sum("c").cast("bigint").alias("n_tokens"),
                F.sum((F.col("c") * own).cast("decimal(38,18)"))
                .cast("double").alias("s_own"),
                F.sum((F.col("c") * oth).cast("decimal(38,18)"))
                .cast("double").alias("s_other")))
    sc = per.selectExpr("doc_id", "half", "n_tokens",
                        "-(s_other) / n_tokens AS hold",
                        "-(s_own) / n_tokens AS own")
    return (sc.orderBy(F.desc(F.col("hold") - F.col("own")), "doc_id")
            .limit(20)
            .selectExpr("doc_id", "CAST(half AS BIGINT) AS half",
                        "n_tokens",
                        "round(hold, 6) AS holdout_loss",
                        "round(own, 6) AS own_loss",
                        "round(hold - own, 6) AS excess_loss"))


@query("mixture_doremi_trajectory", f"""
    WITH tok AS (SELECT lang, unnest({_TOKS_SQL}) AS w FROM documents),
    dg AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY lang, w),
    nd AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM dg GROUP BY lang),
    gw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cg FROM dg GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM dg),
    kl1 AS (SELECT dg.lang,
                   CAST(SUM(CAST(
                     (CAST(dg.c AS DOUBLE) / nd.n)
                     * ln((CAST(dg.c AS DOUBLE) / nd.n)
                          / (CAST(gw.cg AS DOUBLE) / tot.n))
                     AS DECIMAL(38,18))) AS DOUBLE) AS e1
            FROM dg
            JOIN nd ON nd.lang = dg.lang
            JOIN gw ON gw.w = dg.w
            CROSS JOIN tot
            GROUP BY dg.lang),
    r1 AS (SELECT kl1.lang, kl1.e1,
                  (CAST(nd.n AS DOUBLE) / tot.n) * exp(1.0 * kl1.e1)
                    AS r
           FROM kl1 JOIN nd ON nd.lang = kl1.lang CROSS JOIN tot),
    z1 AS (SELECT CAST(SUM(CAST(r AS DECIMAL(38,18))) AS DOUBLE) AS z
           FROM r1),
    w1 AS (SELECT r1.lang, r1.e1, r1.r / z1.z AS wt
           FROM r1 CROSS JOIN z1),
    q1 AS (SELECT dg.w,
                  CAST(SUM(CAST(
                    w1.wt * (CAST(dg.c AS DOUBLE) / nd.n)
                    AS DECIMAL(38,18))) AS DOUBLE) AS q
           FROM dg
           JOIN nd ON nd.lang = dg.lang
           JOIN w1 ON w1.lang = dg.lang
           GROUP BY dg.w),
    kl2 AS (SELECT dg.lang,
                   CAST(SUM(CAST(
                     (CAST(dg.c AS DOUBLE) / nd.n)
                     * ln((CAST(dg.c AS DOUBLE) / nd.n) / q1.q)
                     AS DECIMAL(38,18))) AS DOUBLE) AS e2
            FROM dg
            JOIN nd ON nd.lang = dg.lang
            JOIN q1 ON q1.w = dg.w
            GROUP BY dg.lang),
    r2 AS (SELECT w1.lang, w1.e1, w1.wt, kl2.e2,
                  w1.wt * exp(1.0 * kl2.e2) AS r
           FROM w1 JOIN kl2 ON kl2.lang = w1.lang),
    z2 AS (SELECT CAST(SUM(CAST(r AS DECIMAL(38,18))) AS DOUBLE) AS z
           FROM r2)
    SELECT r2.lang,
           round(r2.e1, 6) AS excess_loss_1,
           round(r2.wt, 6) AS weight_1,
           round(r2.e2, 6) AS excess_loss_2,
           round(r2.r / z2.z, 6) AS weight_2
    FROM r2 CROSS JOIN z2
""")
def mixture_doremi_trajectory(spark, sf_dir):
    """TWO exponentiated-gradient steps of the DoReMi recurrence —
    the TRAJECTORY the one-step mixture_doremi_weights starts: after
    step 1 reweights the domains, step 2 measures each domain's
    excess loss against the REWEIGHTED reference mixture
    Q1 = sum_d w1_d * P_d (the published algorithm's moving
    reference) and updates again.  The self-correcting direction is
    the point: a domain boosted in step 1 contributes more to Q1, so
    its step-2 excess falls — weights move toward the equilibrium
    where no domain is under-represented (pinned by test: the step-1
    argmax domain's excess strictly decreases).

    Exactness: Q1's per-word mixture sum runs over the ~#domains
    terms in DECIMAL(38,18) (order-free exact accumulation — a plain
    double hash-agg would be partition-order-dependent); both KL
    passes and both normalizers use the same decimal-sum convention
    as the parent.  Plan (r10, see the _doremi_pivot block comment):
    the per-word lang-PIVOTED count table is pinned once and each EG
    step is ONE shuffle-free aggregate over it — Q1 is an in-row
    expression over the count columns and the literal step-1 weights;
    no per-step vocab join, no corpus re-scan; the per-step driver
    state is #domains numbers, exactly the fixed-iteration contract
    of the PageRank/BPE loops."""
    piv, langs, col_of, nd, tot = _doremi_pivot(spark, sf_dir)
    if not langs:
        return spark.createDataFrame(
            [], "lang string, excess_loss_1 double, weight_1 double, "
                "excess_loss_2 double, weight_2 double")
    s1, s2 = _doremi_pivot_steps(piv, langs, col_of, nd, tot, 2)
    out = spark.createDataFrame(
        [(l, s1[l]["e"], s1[l]["wt"], s2[l]["e"], s2[l]["wt"])
         for l in langs],
        "lang string, e1 double, w1 double, e2 double, w2 double")
    return out.select("lang",
                      F.round("e1", 6).alias("excess_loss_1"),
                      F.round("w1", 6).alias("weight_1"),
                      F.round("e2", 6).alias("excess_loss_2"),
                      F.round("w2", 6).alias("weight_2"))


@query("text_watermark_detect", f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS w FROM documents),
    g AS (SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(SUM(CASE WHEN substr(md5('wm1-' || w), 1, 1)
                               IN ('0','1','2','3','4','5','6','7')
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_green
          FROM tok GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_green,
           round((CAST(n_green AS DOUBLE) - 0.5 * n_tokens)
                 / (0.5 * sqrt(CAST(n_tokens AS DOUBLE))), 6) AS z_score,
           CAST(CASE WHEN (CAST(n_green AS DOUBLE) - 0.5 * n_tokens)
                          / (0.5 * sqrt(CAST(n_tokens AS DOUBLE))) >= 4.0
                     THEN 1 ELSE 0 END AS INT) AS flagged
    FROM g WHERE n_tokens > 0
""")
def text_watermark_detect(spark, sf_dir):
    """Statistical WATERMARK detection (Kirchenbauer et al. 2023, 'A
    Watermark for Large Language Models'): a watermarked generator
    biases sampling toward a pseudorandom 'green list' of the vocab,
    and the detector needs only the hash key — per document, count
    tokens whose keyed hash lands green (gamma = 0.5 here: first md5
    hex nibble < 8) and compute the one-proportion z-score
    (g - gamma*n) / sqrt(n*gamma*(1-gamma)); z >= 4 flags the doc.
    This is the curation gate a 100 TB pipeline runs to keep
    watermarked MODEL OUTPUT out of training data — the contamination
    direction decontam_benchmark (benchmark leakage) does not cover.

    Exactness: the green-list membership is the engine-portable md5
    convention (identical hex on both engines), the z arithmetic is
    one fixed double op chain, and counts are exact integers — so the
    whole detector hash-matches.  On THIS corpus nothing is
    watermarked, so flags should be ~none at gamma-noise rates (the
    honest negative control; the semantic test plants a green-only
    doc and the z-score must explode).  Plan: one explode -> per-doc
    hash agg riding the scan partitioning; no joins, no windows —
    embarrassingly parallel at any scale."""
    t = (_docs(spark, sf_dir)
         .select("doc_id", F.explode(tokens_col()).alias("w")))
    green = F.substring(F.md5(F.concat(F.lit("wm1-"), F.col("w"))), 1, 1) \
        .isin(*"01234567")
    g = (t.groupBy("doc_id")
         .agg(F.count("*").cast("bigint").alias("n_tokens"),
              F.sum(F.when(green, 1).otherwise(0)).cast("bigint")
              .alias("n_green")))
    z = ((F.col("n_green").cast("double") - 0.5 * F.col("n_tokens"))
         / (0.5 * F.sqrt(F.col("n_tokens").cast("double"))))
    return (g.filter(F.col("n_tokens") > 0)
            .select("doc_id", "n_tokens", "n_green",
                    F.round(z, 6).alias("z_score"),
                    F.when(z >= 4.0, 1).otherwise(0).cast("int")
                    .alias("flagged")))


@query("text_self_bleu_adjacent", f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks)),
                         i -> toks[i] || ' ' || toks[i + 1])) AS b
           FROM d WHERE len(toks) >= 2),
    bc AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c
           FROM bg GROUP BY doc_id, b),
    nb AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM bc
           GROUP BY doc_id),
    clip AS (SELECT a.doc_id AS cand,
                    CAST(SUM(least(a.c, r.c)) AS BIGINT) AS clipped
             FROM bc a JOIN bc r
               ON r.doc_id = a.doc_id + 1 AND r.b = a.b
             GROUP BY a.doc_id),
    pairs AS (SELECT na.doc_id AS cand, na.n AS nc, nr.n AS nr,
                     CAST(coalesce(clip.clipped, 0) AS BIGINT)
                       AS clipped
              FROM nb na
              JOIN nb nr ON nr.doc_id = na.doc_id + 1
              LEFT JOIN clip ON clip.cand = na.doc_id),
    scored AS (SELECT cand, nc, nr, clipped,
                      (CAST(clipped AS DOUBLE) / nc)
                      * (CASE WHEN nc < nr
                              THEN exp(1.0 - CAST(nr AS DOUBLE) / nc)
                              ELSE 1.0 END) AS bleu2
               FROM pairs)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CAST(bleu2 AS DECIMAL(38,18))) AS DOUBLE)
                 / count(*), 6) AS avg_self_bleu2,
           round(CAST(SUM(CAST(CAST(clipped AS DOUBLE) / nc
                     AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6)
             AS avg_bigram_precision,
           CAST(SUM(CASE WHEN clipped = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_disjoint_pairs
    FROM scored
""")
def text_self_bleu_adjacent(spark, sf_dir):
    """Corpus DIVERSITY via Self-BLEU (Zhu et al. 2018, Texygen): how
    much each document's bigrams are already present in another — a
    repetitive/templated corpus scores high, a diverse one near zero.
    Deterministic instantiation: each doc is scored against its
    doc_id-successor (a fixed O(n) pairing instead of Texygen's
    random references — every engine and every run picks the same
    pairs), BLEU-2 = clipped bigram precision x brevity penalty.
    Output: pair count, mean Self-BLEU-2, mean clipped bigram
    precision, and the count of fully disjoint pairs (the diversity
    floor).

    Exactness: clipped counts are exact-integer min-sums; precision
    and the brevity penalty are fixed double op chains; the corpus
    mean accumulates in DECIMAL(38,18).  Plan: one explode -> per-doc
    bigram counts, ONE self-join keyed on (successor doc_id, bigram)
    — at 100 TB the join is bigram-vocabulary-shaped per adjacent
    pair, not all-pairs (the all-pairs Texygen form is exactly what
    cannot scale; the adjacent form keeps the diversity signal at
    O(corpus))."""
    d = (_docs(spark, sf_dir)
         .select("doc_id", tokens_col().alias("toks"))
         .filter(F.size("toks") >= 2))
    bg = d.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(" ", F.element_at("toks", i),
                                  F.element_at("toks", i + 1))))
        .alias("b"))
    bc = (bg.groupBy("doc_id", "b")
          .agg(F.count("*").cast("bigint").alias("c"))
          .localCheckpoint(eager=True))        # feeds nb + both join sides
    nb = bc.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    a, r = bc.alias("a"), bc.alias("r")
    clip = (a.join(r, (F.col("r.doc_id") == F.col("a.doc_id") + 1)
                   & (F.col("r.b") == F.col("a.b")))
            .groupBy(F.col("a.doc_id").alias("cand"))
            .agg(F.sum(F.least("a.c", "r.c")).cast("bigint")
                 .alias("clipped")))
    na, nr = nb.alias("na"), nb.alias("nr")
    pairs = (na.join(nr, F.col("nr.doc_id") == F.col("na.doc_id") + 1)
             .join(clip, clip.cand == F.col("na.doc_id"), "left")
             .select(F.col("na.n").alias("nc"), F.col("nr.n").alias("nr"),
                     F.coalesce("clipped", F.lit(0)).cast("bigint")
                     .alias("clipped")))
    prec = F.col("clipped").cast("double") / F.col("nc")
    bp = F.when(F.col("nc") < F.col("nr"),
                F.exp(1.0 - F.col("nr").cast("double") / F.col("nc"))) \
        .otherwise(F.lit(1.0))
    scored = pairs.select("nc", "clipped", (prec * bp).alias("bleu2"),
                          prec.alias("p"))
    d18 = lambda c: F.sum(c.cast("decimal(38,18)")).cast("double")  # noqa: E731
    return scored.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(d18(F.col("bleu2")) / F.count("*"), 6)
        .alias("avg_self_bleu2"),
        F.round(d18(F.col("p")) / F.count("*"), 6)
        .alias("avg_bigram_precision"),
        F.sum(F.when(F.col("clipped") == 0, 1).otherwise(0))
        .cast("bigint").alias("n_disjoint_pairs"))


_RING_OFFSETS = (1, 7)      # successor + a fixed-prime stride


@query("text_self_bleu_ring", f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks)),
                         i -> toks[i] || ' ' || toks[i + 1])) AS b
           FROM d WHERE len(toks) >= 2),
    bc AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c
           FROM bg GROUP BY doc_id, b),
    nb AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM bc
           GROUP BY doc_id),
    offs AS (SELECT unnest([{", ".join(str(o) for o in _RING_OFFSETS)}])
               AS off),
    clip AS (SELECT a.doc_id AS cand, o.off,
                    CAST(SUM(least(a.c, r.c)) AS BIGINT) AS clipped
             FROM bc a CROSS JOIN offs o
             JOIN bc r ON r.doc_id = a.doc_id + o.off AND r.b = a.b
             GROUP BY a.doc_id, o.off),
    pairs AS (SELECT na.doc_id AS cand, o.off, na.n AS nc, nr.n AS nr,
                     CAST(coalesce(clip.clipped, 0) AS BIGINT) AS clipped
              FROM nb na CROSS JOIN offs o
              JOIN nb nr ON nr.doc_id = na.doc_id + o.off
              LEFT JOIN clip ON clip.cand = na.doc_id
                            AND clip.off = o.off),
    scored AS (SELECT off, nc, clipped,
                      (CAST(clipped AS DOUBLE) / nc)
                      * (CASE WHEN nc < nr
                              THEN exp(1.0 - CAST(nr AS DOUBLE) / nc)
                              ELSE 1.0 END) AS bleu2
               FROM pairs)
    SELECT CAST(off AS BIGINT) AS off,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CAST(bleu2 AS DECIMAL(38,18))) AS DOUBLE)
                 / count(*), 6) AS avg_self_bleu2,
           round(CAST(SUM(CAST(CAST(clipped AS DOUBLE) / nc
                     AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6)
             AS avg_bigram_precision,
           CAST(SUM(CASE WHEN clipped = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_disjoint_pairs
    FROM scored GROUP BY off
""")
def text_self_bleu_ring(spark, sf_dir):
    """Self-BLEU over a k-offset RING of reference pairings (VERDICT
    r9 item 4 — the robustness twin of text_self_bleu_adjacent): each
    document is scored against doc_id+1 AND doc_id+7 (a fixed prime
    stride), one diversity row per offset.  The single-draw adjacent
    pairing can be blinded by a corpus SORTED so near-duplicates sit
    at non-adjacent strides (template batches interleaved mod k); two
    coprime strides cannot both be dodged by one interleaving, so a
    diversity collapse shows in at least one row (pinned by the
    templated-corpus property test).

    Exactness: identical arithmetic to the adjacent form — exact
    integer clipped counts, fixed double op chains, DECIMAL(38,18)
    corpus means — just grouped by offset.  Plan: the per-doc bigram
    count relation is built ONCE (checkpointed) and each offset adds
    one equi-join keyed on (doc_id + off, bigram) — O(#offsets x
    corpus), never all-pairs; at 100 TB this stays the
    bigram-vocabulary-shaped join of the parent, 2x."""
    d = (_docs(spark, sf_dir)
         .select("doc_id", tokens_col().alias("toks"))
         .filter(F.size("toks") >= 2))
    return self_bleu_ring_core(d)


def self_bleu_ring_core(d: DataFrame) -> DataFrame:
    """DataFrame-level core of text_self_bleu_ring over a (doc_id,
    toks) relation — composable so the templated-corpus property test
    can prove the detection claim on a synthetic corpus."""
    bg = d.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(" ", F.element_at("toks", i),
                                  F.element_at("toks", i + 1))))
        .alias("b"))
    bc = (bg.groupBy("doc_id", "b")
          .agg(F.count("*").cast("bigint").alias("c"))
          .localCheckpoint(eager=True))        # feeds nb + both join sides
    nb = bc.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    offs = F.array(*[F.lit(o) for o in _RING_OFFSETS])
    cand = (bc.select("doc_id", "b", "c",
                      F.explode(offs).alias("off"))
            .withColumn("tgt", F.col("doc_id") + F.col("off")))
    r = bc.select(F.col("doc_id").alias("r_doc"), F.col("b").alias("r_b"),
                  F.col("c").alias("r_c"))
    clip = (cand.join(r, (F.col("r_doc") == F.col("tgt"))
                      & (F.col("r_b") == F.col("b")))
            .groupBy(F.col("doc_id").alias("cand"), "off")
            .agg(F.sum(F.least("c", "r_c")).cast("bigint").alias("clipped")))
    na = (nb.select(F.col("doc_id").alias("cand"), F.col("n").alias("nc"),
                    F.explode(offs).alias("off"))
          .withColumn("tgt", F.col("cand") + F.col("off")))
    nr = nb.select(F.col("doc_id").alias("tgt_doc"), F.col("n").alias("nr"))
    pairs = (na.join(nr, F.col("tgt_doc") == F.col("tgt"))
             .join(clip, ["cand", "off"], "left")
             .select("off", "nc", "nr",
                     F.coalesce("clipped", F.lit(0)).cast("bigint")
                     .alias("clipped")))
    prec = F.col("clipped").cast("double") / F.col("nc")
    bp = F.when(F.col("nc") < F.col("nr"),
                F.exp(1.0 - F.col("nr").cast("double") / F.col("nc"))) \
        .otherwise(F.lit(1.0))
    scored = pairs.select("off", "nc", "clipped",
                          (prec * bp).alias("bleu2"), prec.alias("p"))
    d18 = lambda c: F.sum(c.cast("decimal(38,18)")).cast("double")  # noqa: E731
    return (scored.groupBy(F.col("off").cast("bigint").alias("off"))
            .agg(F.count("*").cast("bigint").alias("n_pairs"),
                 F.round(d18(F.col("bleu2")) / F.count("*"), 6)
                 .alias("avg_self_bleu2"),
                 F.round(d18(F.col("p")) / F.count("*"), 6)
                 .alias("avg_bigram_precision"),
                 F.sum(F.when(F.col("clipped") == 0, 1).otherwise(0))
                 .cast("bigint").alias("n_disjoint_pairs")))


_DOREMI_T = 5


def _doremi_t_step_sql(k: int) -> str:
    """EG step k >= 2 of the DoReMi recurrence as CTEs: reference
    mixture Q_{k-1} = sum_d w_{k-1,d} * P_d (decimal-summed per word),
    per-domain excess KL(P_d || Q_{k-1}), exponentiated-gradient
    reweight, decimal-summed normalizer."""
    return f"""
    q{k} AS (SELECT dg.w,
                CAST(SUM(CAST(w{k - 1}.wt * (CAST(dg.c AS DOUBLE) / nd.n)
                     AS DECIMAL(38,18))) AS DOUBLE) AS q
             FROM dg JOIN nd ON nd.lang = dg.lang
                     JOIN w{k - 1} ON w{k - 1}.lang = dg.lang
             GROUP BY dg.w),
    kl{k} AS (SELECT dg.lang,
                CAST(SUM(CAST((CAST(dg.c AS DOUBLE) / nd.n)
                     * ln((CAST(dg.c AS DOUBLE) / nd.n) / q{k}.q)
                     AS DECIMAL(38,18))) AS DOUBLE) AS e
              FROM dg JOIN nd ON nd.lang = dg.lang
                      JOIN q{k} ON q{k}.w = dg.w
              GROUP BY dg.lang),
    r{k} AS (SELECT w{k - 1}.lang, w{k - 1}.wt * exp(1.0 * kl{k}.e) AS r
             FROM w{k - 1} JOIN kl{k} ON kl{k}.lang = w{k - 1}.lang),
    z{k} AS (SELECT CAST(SUM(CAST(r AS DECIMAL(38,18))) AS DOUBLE) AS z
             FROM r{k}),
    w{k} AS (SELECT r{k}.lang, r{k}.r / z{k}.z AS wt
             FROM r{k} CROSS JOIN z{k})"""


def _doremi_t_oracle_sql(t: int = _DOREMI_T) -> str:
    steps = ",".join(_doremi_t_step_sql(k) for k in range(2, t + 1))
    w_cols = ",\n           ".join(
        f"round(w{k}.wt, 6) AS weight_{k}" for k in range(1, t + 1))
    joins = "\n    ".join(f"JOIN w{k} ON w{k}.lang = w1.lang"
                          for k in range(2, t + 1))
    return f"""
    WITH tok AS (SELECT lang, unnest({_TOKS_SQL}) AS w FROM documents),
    dg AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY lang, w),
    nd AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM dg GROUP BY lang),
    gw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cg FROM dg GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM dg),
    kl1 AS (SELECT dg.lang,
                   CAST(SUM(CAST(
                     (CAST(dg.c AS DOUBLE) / nd.n)
                     * ln((CAST(dg.c AS DOUBLE) / nd.n)
                          / (CAST(gw.cg AS DOUBLE) / tot.n))
                     AS DECIMAL(38,18))) AS DOUBLE) AS e
            FROM dg JOIN nd ON nd.lang = dg.lang
                    JOIN gw ON gw.w = dg.w
            CROSS JOIN tot GROUP BY dg.lang),
    r1 AS (SELECT kl1.lang,
                  (CAST(nd.n AS DOUBLE) / tot.n) * exp(1.0 * kl1.e) AS r
           FROM kl1 JOIN nd ON nd.lang = kl1.lang CROSS JOIN tot),
    z1 AS (SELECT CAST(SUM(CAST(r AS DECIMAL(38,18))) AS DOUBLE) AS z
           FROM r1),
    w1 AS (SELECT r1.lang, r1.r / z1.z AS wt FROM r1 CROSS JOIN z1),
    {steps}
    SELECT w1.lang,
           {w_cols},
           round(abs(w{t}.wt - w{t - 1}.wt), 6) AS delta_last
    FROM w1
    {joins}
"""


@query("mixture_doremi_t5", _doremi_t_oracle_sql())
def mixture_doremi_t5(spark, sf_dir):
    """The DoReMi exponentiated-gradient recurrence run to T=5 steps
    with a convergence readout (VERDICT r9 item 5 — the trajectory
    generalized from its 2-step form by the same unrolled-CTE recipe
    the PageRank/BPE loops use).  Step 1 measures each domain's excess
    unigram KL against the POOLED mixture; every later step re-measures
    against the REWEIGHTED reference Q_{k-1} = sum_d w_{k-1,d} P_d and
    updates w_k proportional to w_{k-1} exp(excess).  delta_last =
    |w_T - w_{T-1}| per domain is the convergence signal — the fixture
    property test pins that max-domain weight deltas shrink as the
    weights approach the no-under-represented-domain equilibrium.

    Exactness: identical conventions to mixture_doremi_trajectory —
    Q's per-word mixture sum, both KL passes and every normalizer
    accumulate in DECIMAL(38,18); weights are ratios of those exact
    sums, 6dp-rounded only at output.  Plan (r10, see the
    _doremi_pivot block comment): the per-word lang-PIVOTED count
    table is pinned once and each EG step is ONE shuffle-free
    aggregate over it — Q_{k-1} is an in-row expression over the
    count columns and the literal step-(k-1) weights; T is a fixed
    small constant, per-step driver state is #domains numbers.  At
    100 TB: ONE vocab-shaped shuffle total (the pivot build), no
    per-step shuffle, no corpus re-scan."""
    piv, langs, col_of, nd, tot = _doremi_pivot(spark, sf_dir)
    if not langs:
        return spark.createDataFrame(
            [], "lang string, "
                + ", ".join(f"weight_{k} double"
                            for k in range(1, _DOREMI_T + 1))
                + ", delta_last double")
    steps = _doremi_pivot_steps(piv, langs, col_of, nd, tot, _DOREMI_T)
    out = spark.createDataFrame(
        [tuple([l] + [s[l]["wt"] for s in steps]) for l in langs],
        "lang string, " + ", ".join(f"wt_{k} double"
                                    for k in range(1, _DOREMI_T + 1)))
    return out.select(
        "lang",
        *[F.round(f"wt_{k}", 6).alias(f"weight_{k}")
          for k in range(1, _DOREMI_T + 1)],
        F.round(F.abs(F.col(f"wt_{_DOREMI_T}")
                      - F.col(f"wt_{_DOREMI_T - 1}")), 6)
        .alias("delta_last"))


# --- round 10, batch 2: curation selection / code detect / entropy rate ---

_QB_FRACTION = 0.3      # token budget as a fraction of the corpus


@query("sample_quality_budget", f"""
    WITH t AS (SELECT doc_id, source, text, {_TOKS_SQL} AS toks
               FROM documents WHERE length(text) > 0),
    s AS (SELECT doc_id, source,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 round(0.5 * ((1.0 - (length(text) - length(regexp_replace(
                          text, '[^a-zA-Z0-9 ]', '', 'g')))
                       / CAST(length(text) AS DOUBLE))
                       * LEAST(1.0, len(toks) / 50.0))
                   + 0.3 * (1.0 - CASE WHEN len(toks) >= 3 THEN
                       (SELECT CAST(len(g) - len(list_distinct(g))
                               AS DOUBLE) / len(g)
                        FROM (SELECT list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                          AS g))
                     ELSE 0.0 END)
                   + 0.2 * (CASE WHEN {_hits_sql(STOPWORDS)} > 0
                            THEN 1.0 ELSE 0.0 END), 6) AS score
          FROM t WHERE len(toks) > 0),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS corpus_tokens FROM s),
    cum AS (SELECT doc_id, source, n_tokens, score,
                   CAST(SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ctok
            FROM s),
    sel AS (SELECT cum.*, tot.corpus_tokens FROM cum CROSS JOIN tot
            WHERE CAST(ctok AS DOUBLE)
                  <= {_QB_FRACTION} * tot.corpus_tokens)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs_selected,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected,
           round(CAST(SUM(n_tokens) AS DOUBLE)
                 / any_value(corpus_tokens), 6) AS corpus_token_share,
           round(min(score), 6) AS min_score_admitted
    FROM sel GROUP BY source
""")
def sample_quality_budget(spark, sf_dir):
    """Quality-ranked selection under a TOKEN BUDGET — the greedy
    knapsack every curation run executes after scoring (take the
    highest-quality documents until the compute budget is spent; the
    quality-threshold counterpart of mixture_token_budget's per-source
    recipe): rank the corpus by the ensemble quality score
    (quality_ensemble_score's exact blend), admit documents in score
    order while the cumulative token count stays within 30% of the
    corpus, and report the admitted mass per source — which sources
    dominate a quality-budgeted corpus, and the score the budget
    clears (min_score_admitted, the effective quality threshold this
    budget IMPLIES — the number FineWeb-style ablations sweep).

    Exactness: the score is the parent query's 6dp-rounded blend
    (identical doubles), ties broken by doc_id; the admission test
    compares exact-integer cumulative tokens against a fixed double.
    Plan: score rides the scan; the global score-ordered cumulative
    sum runs as the repo's TWO-PHASE running sum (range exchange on
    (score DESC, doc_id), per-partition window, P-row broadcast
    offsets — no single-partition window over the corpus); the final
    rollup is #sources-sized.  At 100 TB: one scan + one range
    exchange, the same cost as writing the corpus sorted by quality —
    which a curation run wants anyway."""
    toks = tokens_col()
    df = (_docs(spark, sf_dir)
          .filter(F.length("text") > 0)
          .select("doc_id", "source", "text", toks.alias("toks"))
          .filter(F.size("toks") > 0))
    n = F.size("toks")
    punct = (F.length("text") - F.length(F.array_join(
        F.regexp_extract_all("text", F.lit("[a-zA-Z0-9 ]+"), F.lit(0)), ""))) \
        / F.length("text").cast("double")
    q = (F.lit(1.0) - punct) * F.least(F.lit(1.0), n / F.lit(50.0))
    grams = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(" ", F.element_at("toks", i),
                              F.element_at("toks", i + 1),
                              F.element_at("toks", i + 2)))
    rep = F.when(
        n >= 3,
        (F.size(grams) - F.size(F.array_distinct(grams))).cast("double")
        / F.size(grams)).otherwise(F.lit(0.0))
    stop_present = F.when(_hits(F.col("toks"), STOPWORDS) > 0, 1.0) \
        .otherwise(0.0)
    s = df.select(
        "doc_id", "source", n.cast("bigint").alias("n_tokens"),
        F.round(0.5 * q + 0.3 * (F.lit(1.0) - rep) + 0.2 * stop_present, 6)
        .alias("score"))
    # two-phase global running sum in (score DESC, doc_id) order
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    with_pid = (s.repartitionByRange(n_parts, F.desc("score"), "doc_id")
                .withColumn("pid", F.spark_partition_id())
                .localCheckpoint())
    # corpus_tokens from the PINNED frame: deriving it from `s` re-ran
    # the whole scoring scan (regexp + trigram array work) a second
    # time just to add up one column (guide §1.2 step 1)
    tot = with_pid.agg(F.sum("n_tokens").cast("bigint")
                       .alias("corpus_tokens"))
    wrun = (Window.partitionBy("pid").orderBy(F.desc("score"), "doc_id")
            .rowsBetween(Window.unboundedPreceding, 0))
    local = with_pid.select(
        "pid", "doc_id", "source", "n_tokens", "score",
        F.sum("n_tokens").over(wrun).cast("bigint").alias("lt"))
    woff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (with_pid.groupBy("pid")
            .agg(F.sum("n_tokens").alias("pt"))
            .select("pid", F.coalesce(F.sum("pt").over(woff), F.lit(0))
                    .alias("offt")))
    cum = (local.join(F.broadcast(offs), "pid")
           .select("doc_id", "source", "n_tokens", "score",
                   (F.col("lt") + F.col("offt")).cast("bigint")
                   .alias("ctok")))
    sel = (cum.crossJoin(F.broadcast(tot))
           .filter(F.col("ctok").cast("double")
                   <= _QB_FRACTION * F.col("corpus_tokens")))
    return (sel.groupBy("source")
            .agg(F.count("*").cast("bigint").alias("n_docs_selected"),
                 F.sum("n_tokens").cast("bigint").alias("tokens_selected"),
                 F.round(F.sum("n_tokens").cast("double")
                         / F.any_value("corpus_tokens"), 6)
                 .alias("corpus_token_share"),
                 F.round(F.min("score"), 6).alias("min_score_admitted")))


_CODE_KEYWORDS = ["def", "class", "return", "import", "function", "var",
                  "const", "void", "int", "public"]


def code_detect_core(docs: DataFrame) -> DataFrame:
    """DataFrame-level core of text_code_detect over a (doc_id, text)
    relation — composable so the planted-code property test can prove
    detection on a synthetic corpus."""
    toks = tokens_col()
    n_chars = F.length("text").cast("double")
    sym = (F.length("text") - F.length(F.array_join(
        F.regexp_extract_all("text", F.lit("[^{}();=\\[\\]<>]+"),
                             F.lit(0)), ""))) / n_chars
    lines = F.split("text", "\n")
    indented = F.size(F.filter(lines, lambda ln: ln.rlike("^(  |\t)")))
    indent_ratio = (indented.cast("double")
                    / F.greatest(F.size(lines), F.lit(1)))
    kw = _hits(toks, _CODE_KEYWORDS).cast("double") \
        / F.greatest(F.size(toks), F.lit(1))
    score = (F.least(F.lit(1.0), sym * 10.0)
             + F.least(F.lit(1.0), indent_ratio * 2.0)
             + F.least(F.lit(1.0), kw * 10.0)) / 3.0
    return (docs.filter(F.length("text") > 0)
            .select("doc_id",
                    F.round(sym, 6).alias("symbol_ratio"),
                    F.round(indent_ratio, 6).alias("indent_ratio"),
                    F.round(kw, 6).alias("keyword_ratio"),
                    F.round(score, 6).alias("code_score"),
                    F.when(score >= 0.5, 1).otherwise(0).cast("int")
                    .alias("is_code")))


@query("text_code_detect", f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents
               WHERE length(text) > 0),
    m AS (SELECT doc_id,
            (length(text) - length(list_aggregate(
               regexp_extract_all(text, '[^{{}}();=\\[\\]<>]+'),
               'string_agg', ''))) / CAST(length(text) AS DOUBLE) AS sym,
            CAST(len(list_filter(string_split(text, chr(10)),
                 ln -> regexp_matches(ln, '^(  |\t)'))) AS DOUBLE)
              / GREATEST(len(string_split(text, chr(10))), 1)
              AS indent_ratio,
            CAST(len(list_filter(toks, x -> list_contains(
                 [{", ".join("'" + w + "'" for w in _CODE_KEYWORDS)}], x)))
                 AS DOUBLE) / GREATEST(len(toks), 1) AS kw
          FROM t)
    SELECT doc_id,
           round(sym, 6) AS symbol_ratio,
           round(indent_ratio, 6) AS indent_ratio,
           round(kw, 6) AS keyword_ratio,
           round((LEAST(1.0, sym * 10.0) + LEAST(1.0, indent_ratio * 2.0)
                  + LEAST(1.0, kw * 10.0)) / 3.0, 6) AS code_score,
           CAST(CASE WHEN (LEAST(1.0, sym * 10.0)
                           + LEAST(1.0, indent_ratio * 2.0)
                           + LEAST(1.0, kw * 10.0)) / 3.0 >= 0.5
                     THEN 1 ELSE 0 END AS INT) AS is_code
    FROM m
""")
def text_code_detect(spark, sf_dir):
    """Code-vs-prose detection — the routing heuristic code-corpus
    pipelines (CodeParrot; StarCoder's preprocessing; Chowdhery et
    al.'s PaLM code split) apply before choosing a tokenizer/quality
    battery, since Gopher-style prose rules mis-kill source code:
    blend of code-symbol density ({{}}();=[]<>), indented-line ratio,
    and reserved-word token hits, each saturating (LEAST) so one
    signal cannot dominate; is_code at 0.5.  On THIS corpus (synthetic
    prose) flags are ~0 — the honest negative control; the property
    test plants a real code document via code_detect_core and the
    score must cross the flag line.

    Exactness: three per-row ratios of exact integers over fixed
    double op chains, 6dp-rounded — no aggregation at all.  Plan: pure
    scan-riding expression work (one regexp pass, one line split, one
    token filter per row), embarrassingly parallel at any scale — the
    cheapest possible curation shape, like quality_ensemble_score."""
    return code_detect_core(
        _docs(spark, sf_dir).select("doc_id", "text"))


@query("text_entropy_rate", f"""
    WITH tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    uni AS (SELECT unnest(toks) AS w FROM tok),
    uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY w),
    bg AS (SELECT unnest(list_transform(range(1, len(toks)),
                   i -> struct_pack(w1 := toks[i], w2 := toks[i + 1])))
             AS b
           FROM tok WHERE len(toks) >= 2),
    bc AS (SELECT b.w1 AS w1, b.w2 AS w2, CAST(count(*) AS BIGINT) AS c
           FROM bg GROUP BY 1, 2),
    nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uc),
    nb AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM bc),
    h1 AS (SELECT CAST(SUM(CAST(
             -(CAST(uc.c AS DOUBLE) / nt.n)
              * ln(CAST(uc.c AS DOUBLE) / nt.n)
             AS DECIMAL(38,18))) AS DOUBLE) AS h
           FROM uc CROSS JOIN nt),
    h12 AS (SELECT CAST(SUM(CAST(
              -(CAST(bc.c AS DOUBLE) / nb.n)
               * ln(CAST(bc.c AS DOUBLE) / nb.n)
              AS DECIMAL(38,18))) AS DOUBLE) AS h
            FROM bc CROSS JOIN nb)
    SELECT nt.n AS n_tokens,
           (SELECT CAST(count(*) AS BIGINT) FROM uc) AS vocab_size,
           nb.n AS n_bigrams,
           round(h1.h, 6) AS unigram_entropy,
           round(h12.h, 6) AS bigram_entropy,
           round(h12.h - h1.h, 6) AS entropy_rate,
           round(exp(h12.h - h1.h), 6) AS conditional_perplexity
    FROM nt CROSS JOIN nb CROSS JOIN h1 CROSS JOIN h12
""")
def text_entropy_rate(spark, sf_dir):
    """Corpus ENTROPY RATE under the empirical bigram model (Shannon
    1951's entropy-of-English program; Brown et al. 1992's n-gram
    upper-bound estimate): H(W2|W1) = H(W1,W2) - H(W1) in nats, plus
    the unigram entropy and the conditional perplexity e^H — the
    single-number compressibility/diversity readout that complements
    text_char_entropy (characters) and text_bigram_lm_score (per-doc):
    a templated or near-duplicate corpus shows a collapsed entropy
    rate long before eyeballing catches it, and tokenizer/budget math
    (bits per token) starts from exactly this number.

    Exactness: each -p ln p term is a deterministic double from exact
    integer counts with identical op order; both entropy sums
    accumulate in DECIMAL(38,18) (the transcendental-sum convention),
    and the subtraction/exp are fixed scalar ops on 1-row relations.
    Plan: ONE corpus explode each for unigrams and bigrams, both
    map-side-combinable hash aggs on Zipf-sized vocabularies; the
    entropy sums are vocabulary-shaped scans with a broadcast 1-row
    total.  At 100 TB nothing but (gram, count) pairs ever shuffles."""
    t = _docs(spark, sf_dir).select("doc_id", tokens_col().alias("toks"))
    uc = (t.select(F.explode("toks").alias("w"))
          .groupBy("w").agg(F.count("*").cast("bigint").alias("c"))
          .localCheckpoint(eager=True))        # feeds nt + vocab + h1
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("w1"),
                        F.element_at("toks", i + 1).alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bc = (t.select(F.explode(bigrams).alias("b"))
          .select("b.w1", "b.w2")
          .groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("c"))
          .localCheckpoint(eager=True))        # feeds nb + h12
    d18 = lambda c: F.sum(c.cast("decimal(38,18)")).cast("double")  # noqa: E731
    nt = uc.agg(F.sum("c").cast("bigint").alias("n"),
                F.count("*").cast("bigint").alias("vocab_size"))
    nb = bc.agg(F.sum("c").cast("bigint").alias("n"))
    p1 = F.col("c").cast("double") / F.col("n")
    h1 = (uc.crossJoin(F.broadcast(nt.select("n")))
          .agg(d18(-p1 * F.log(p1)).alias("h")))
    h12 = (bc.crossJoin(F.broadcast(nb))
           .agg(d18(-p1 * F.log(p1)).alias("h")))
    return (nt.crossJoin(F.broadcast(nb.select(F.col("n").alias("nb"))))
            .crossJoin(F.broadcast(h1.select(F.col("h").alias("h1"))))
            .crossJoin(F.broadcast(h12.select(F.col("h").alias("h12"))))
            .select(F.col("n").alias("n_tokens"), "vocab_size",
                    F.col("nb").alias("n_bigrams"),
                    F.round("h1", 6).alias("unigram_entropy"),
                    F.round("h12", 6).alias("bigram_entropy"),
                    F.round(F.col("h12") - F.col("h1"), 6)
                    .alias("entropy_rate"),
                    F.round(F.exp(F.col("h12") - F.col("h1")), 6)
                    .alias("conditional_perplexity")))


# --- inter-filter agreement: Cohen's kappa (round 10, batch 3) -------------

# shared formula strings over the 2x2 cell counts (exact integers) —
# identical double op chains on both engines
_KAPPA_PO = "CAST(n11 + n00 AS DOUBLE) / n"
_KAPPA_PE = ("(CAST(n11 + n10 AS DOUBLE) * (n11 + n01)"
             " + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))"
             " / (CAST(n AS DOUBLE) * n)")
_KAPPA_EXPR = (f"CASE WHEN 1.0 - ({_KAPPA_PE}) = 0.0 THEN 0.0 "
               f"ELSE (({_KAPPA_PO}) - ({_KAPPA_PE}))"
               f" / (1.0 - ({_KAPPA_PE})) END")


@query("stat_cohens_kappa", f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents
               WHERE len({_TOKS_SQL}) > 0),
    m AS (SELECT doc_id,
                 CAST(len(toks) AS INTEGER) AS n_words,
                 round(CAST(list_sum(list_transform(toks, x -> len(x)))
                            AS DOUBLE) / len(toks), 6) AS mean_word_len,
                 round(CAST(len(list_filter(toks,
                            x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                       / len(toks), 6) AS frac_alpha_words,
                 CAST(len(list_intersect(list_distinct(toks),
                      [{', '.join("'" + w + "'" for w in _GOPHER_STOPS)}]))
                      AS INTEGER) AS n_stop_hits,
                 round((len(regexp_extract_all(text, '#'))
                        + len(regexp_extract_all(text, '\\.\\.\\.')))
                       / CAST(len(toks) AS DOUBLE), 6) AS symbol_ratio,
                 round(CAST(list_max(list_transform(list_distinct(toks),
                            x -> len(list_filter(toks, y -> y = x))))
                            AS DOUBLE) / len(toks), 6) AS top_token_frac
          FROM t),
    gop AS (SELECT doc_id,
                   CASE WHEN (n_words BETWEEN 50 AND 100000)
                         AND (mean_word_len BETWEEN 3.0 AND 10.0)
                         AND (frac_alpha_words >= 0.8)
                         AND (n_stop_hits >= 2)
                         AND (symbol_ratio < 0.1)
                         AND (top_token_frac <= 0.2)
                        THEN 1 ELSE 0 END AS ka
            FROM m),
    e AS (
      SELECT doc_id,
             (1.0 - (length(text) - length(regexp_replace(
                      text, '[^a-zA-Z0-9 ]', '', 'g')))
                 / CAST(length(text) AS DOUBLE))
               * LEAST(1.0, len(toks) / 50.0) AS q,
             CASE WHEN len(toks) >= 3 THEN
               (SELECT CAST(len(g) - len(list_distinct(g)) AS DOUBLE)
                       / len(g)
                FROM (SELECT list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                      AS g))
             ELSE 0.0 END AS rep,
             CASE WHEN {_hits_sql(STOPWORDS)} > 0 THEN 1.0 ELSE 0.0 END
               AS stop_present
      FROM t),
    ens AS (SELECT doc_id,
                   CASE WHEN 0.5 * q + 0.3 * (1.0 - rep)
                             + 0.2 * stop_present >= 0.5
                        THEN 1 ELSE 0 END AS kb
            FROM e),
    j AS (SELECT ka, kb FROM gop JOIN ens USING (doc_id)),
    c AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(ka * kb) AS BIGINT) AS n11,
                 CAST(SUM(ka * (1 - kb)) AS BIGINT) AS n10,
                 CAST(SUM((1 - ka) * kb) AS BIGINT) AS n01,
                 CAST(SUM((1 - ka) * (1 - kb)) AS BIGINT) AS n00
          FROM j)
    SELECT n, n11, n10, n01, n00,
           round({_KAPPA_PO}, 6) AS po,
           round({_KAPPA_PE}, 6) AS pe,
           round({_KAPPA_EXPR}, 6) AS kappa
    FROM c
""")
def stat_cohens_kappa(spark, sf_dir):
    """Chance-corrected agreement (Cohen 1960) between the engine's
    two INDEPENDENT document-quality raters — the Gopher rule battery
    (text_gopher_rules' keep conjunction) and the ensemble-score gate
    (quality_ensemble_score's keep at 0.5): the 2x2 confusion table,
    observed agreement po, chance agreement pe from the marginals, and
    kappa = (po - pe) / (1 - pe).  This is the standard inter-
    annotator readout applied to curation filters: raw agreement
    overstates consensus whenever both filters keep (or kill) almost
    everything, and a curation stack whose gates agree only at chance
    level is two different corpora pretending to be one pipeline —
    exactly the audit LLM-data groups run before swapping one quality
    gate for a cheaper one (kappa >= 0.6 "substantial" as the usual
    swap bar).  The degenerate pe = 1 case (both raters constant)
    reports 0 by convention, guarded identically on both engines.

    Exactness: both keep verdicts re-evaluate their parent queries'
    identical expression chains; cell counts are exact integers; po /
    pe / kappa are shared formula strings over those integers.  Plan:
    ONE corpus scan computes both raters (each is scan-riding HOF
    work), a 4-cell hash agg, then 1-row arithmetic — at 100 TB this
    audit costs the same single pass as either filter alone."""
    gop = (gopher_rules_df(_docs(spark, sf_dir))
           .select("doc_id",
                   F.col("keep").cast("int").alias("ka")))
    ens = (quality_ensemble_score(spark, sf_dir)
           .select("doc_id", F.col("keep").alias("kb")))
    j = gop.join(ens, "doc_id").select("ka", "kb")
    c = j.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("ka") * F.col("kb")).cast("bigint").alias("n11"),
        F.sum(F.col("ka") * (1 - F.col("kb"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("ka")) * F.col("kb")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("ka")) * (1 - F.col("kb"))).cast("bigint")
        .alias("n00"))
    return c.selectExpr(
        "n", "n11", "n10", "n01", "n00",
        f"round({_KAPPA_PO}, 6) AS po",
        f"round({_KAPPA_PE}, 6) AS pe",
        f"round({_KAPPA_EXPR}, 6) AS kappa")


# --- multinomial Naive Bayes language classifier (round 10, batch 3) -------

# per-(test-token, class) log-likelihood term with add-one smoothing:
# identical double chain on both engines; c = 0 for class-unseen
# tokens makes the unseen default -ln(Nc + V) fall out of the same
# expression.
_NB_TERM = ("CAST(tf AS DOUBLE)"
            " * (ln(CAST(c AS DOUBLE) + 1.0) - ln(nc + vocab))")


@query("ml_naive_bayes", f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents
               WHERE len({_TOKS_SQL}) > 0),
    tr AS (SELECT doc_id, lang, toks FROM t WHERE doc_id % 5 <> 0),
    te AS (SELECT doc_id, lang AS true_lang, toks FROM t
           WHERE doc_id % 5 = 0),
    trtok AS (SELECT lang, unnest(toks) AS tok FROM tr),
    ctc AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
            FROM trtok GROUP BY lang, tok),
    cls AS (SELECT lang, CAST(SUM(c) AS DOUBLE) AS nc
            FROM ctc GROUP BY lang),
    pri AS (SELECT lang, CAST(count(*) AS DOUBLE) AS dc
            FROM tr GROUP BY lang),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS dt FROM tr),
    voc AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS vocab
            FROM trtok),
    tetok AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest(toks) AS tok FROM te)
              GROUP BY doc_id, tok),
    cand AS (SELECT tt.doc_id, cls.lang, tt.tf, cls.nc,
                    COALESCE(m.c, 0) AS c, voc.vocab
             FROM tetok tt CROSS JOIN cls CROSS JOIN voc
             LEFT JOIN ctc m ON m.lang = cls.lang AND m.tok = tt.tok),
    sc AS (SELECT doc_id, lang,
                  CAST(SUM(CAST({_NB_TERM} AS DECIMAL(38,18)))
                       AS DOUBLE) AS ll
           FROM cand GROUP BY doc_id, lang),
    scored AS (SELECT sc.doc_id, sc.lang,
                      sc.ll + (ln(pri.dc) - ln(tot.dt)) AS score
               FROM sc JOIN pri ON pri.lang = sc.lang CROSS JOIN tot),
    pred AS (SELECT doc_id, lang AS pred_lang FROM (
               SELECT doc_id, lang,
                      row_number() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, lang) AS rn
               FROM scored) z
             WHERE rn = 1),
    conf AS (SELECT te.true_lang, p.pred_lang,
                    CAST(count(*) AS BIGINT) AS n_docs
             FROM te JOIN pred p ON p.doc_id = te.doc_id
             GROUP BY te.true_lang, p.pred_lang),
    acc AS (SELECT CAST(SUM(CASE WHEN true_lang = pred_lang
                                 THEN n_docs ELSE 0 END) AS DOUBLE)
                   / CAST(SUM(n_docs) AS DOUBLE) AS accuracy
            FROM conf)
    SELECT conf.true_lang, conf.pred_lang, conf.n_docs,
           round(acc.accuracy, 6) AS accuracy
    FROM conf CROSS JOIN acc
""")
def ml_naive_bayes(spark, sf_dir):
    """Multinomial Naive Bayes text classifier (McCallum & Nigam 1998
    — the mechanism behind fastText-style quality/language gates in
    CCNet/GPT-3-era curation stacks) trained and evaluated inside the
    engine: add-one-smoothed per-class token log-likelihoods from the
    training split (doc_id % 5 != 0), argmax class per held-out doc,
    and the test-split confusion matrix with overall accuracy — the
    complete train/score/eval loop as ONE declarative plan, no
    driver-side model state.  The class-unseen default falls out of
    the same smoothing expression at c = 0, so there is exactly one
    scoring formula.

    Exactness: every log term is a fixed double chain over exact
    integer counts (the repo's transcendental convention); per-(doc,
    class) sums accumulate in DECIMAL(38,18); argmax tie-breaks on
    (score DESC, lang).  Plan: train side is explode -> (class, token)
    hash agg (vocabulary-shaped, Zipf-bounded); scoring joins test
    tokens to the model on token (the only wide exchange — the model
    is a posting-list-shaped relation, NOT corpus-sized), then a
    per-doc 5-row window picks the argmax.  At 100 TB: both legs are
    map-side-combinable aggs + one vocabulary join; nothing iterates
    and nothing collects."""
    t = (_docs(spark, sf_dir)
         .select("doc_id", "lang", tokens_col().alias("toks"))
         .filter(F.size("toks") > 0))
    tr = t.filter("doc_id % 5 <> 0")
    te = (t.filter("doc_id % 5 = 0")
          .select("doc_id", F.col("lang").alias("true_lang"), "toks"))
    trtok = tr.select("lang", F.explode("toks").alias("tok"))
    ctc = (trtok.groupBy("lang", "tok")
           .agg(F.count("*").cast("bigint").alias("c"))
           .localCheckpoint(eager=True))     # the model relation
    cls = ctc.groupBy("lang").agg(F.sum("c").cast("double").alias("nc"))
    pri = tr.groupBy("lang").agg(F.count("*").cast("double").alias("dc"))
    tot = tr.agg(F.count("*").cast("double").alias("dt"))
    voc = (trtok.select("tok").distinct()
           .agg(F.count("*").cast("double").alias("vocab")))
    tetok = (te.select("doc_id", F.explode("toks").alias("tok"))
             .groupBy("doc_id", "tok")
             .agg(F.count("*").cast("bigint").alias("tf")))
    cand = (tetok.crossJoin(F.broadcast(cls)).crossJoin(F.broadcast(voc))
            .join(ctc.withColumnRenamed("lang", "mlang"),
                  (F.col("mlang") == F.col("lang"))
                  & (ctc["tok"] == tetok["tok"]), "left")
            .select(tetok["doc_id"], "lang", "tf", "nc",
                    F.coalesce(F.col("c"), F.lit(0)).alias("c"), "vocab"))
    sc = (cand.groupBy("doc_id", "lang")
          .agg(F.sum(F.expr(f"CAST({_NB_TERM} AS DECIMAL(38,18))"))
               .cast("double").alias("ll")))
    scored = (sc.join(F.broadcast(pri), "lang").crossJoin(F.broadcast(tot))
              .selectExpr("doc_id", "lang",
                          "ll + (ln(dc) - ln(dt)) AS score"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "lang")
    pred = (scored.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("doc_id", F.col("lang").alias("pred_lang")))
    conf = (te.select("doc_id", "true_lang").join(pred, "doc_id")
            .groupBy("true_lang", "pred_lang")
            .agg(F.count("*").cast("bigint").alias("n_docs"))
            .localCheckpoint(eager=True))    # feeds accuracy + output
    acc = conf.agg(F.expr(
        "CAST(SUM(CASE WHEN true_lang = pred_lang THEN n_docs ELSE 0 END)"
        " AS DOUBLE) / CAST(SUM(n_docs) AS DOUBLE)").alias("accuracy"))
    return (conf.crossJoin(F.broadcast(acc))
            .select("true_lang", "pred_lang", "n_docs",
                    F.round("accuracy", 6).alias("accuracy")))
