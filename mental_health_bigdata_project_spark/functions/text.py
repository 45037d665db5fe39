"""Text cleaning / risk scoring as native Catalyst expressions.

The reference implements these as row-at-a-time Python UDFs
(spark_jobs/preprocessing_streaming.py:39-68; plain twin
kafka_consumer_simple.py:25-47).  Python UDFs are opaque to Catalyst
(no pushdown, no codegen, per-row Python-worker round trips), so this
engine re-expresses them as built-in expression trees — semantically
identical (verified against the golden records in
reference data/processed_posts_realtime.json) but JVM-side,
whole-stage-codegen'd, and usable in both batch and streaming plans.

Semantics pinned by the golden file (SURVEY.md §2.8):
- keyword match is *substring*, not word-boundary ("die" matches "died");
- each of the 16 keywords counts once (membership, not occurrences);
- score is computed on the FULL combined text (before any truncation);
- the apostrophe keyword "can't go on" is matched against the UNCLEANED
  text (cleaning strips apostrophes);
- score is capped at 100;
- null/empty text cleans to '' and scores 0.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# The 16 distress keywords, exactly as listed at
# reference spark_jobs/preprocessing_streaming.py:13-18 (identical at
# kafka_consumer_simple.py:18-23).
DISTRESS_KEYWORDS = [
    "suicide", "kill myself", "end it all", "no reason to live",
    "hopeless", "worthless", "give up", "can't go on",
    "depressed", "anxious", "panic", "overwhelmed",
    "lonely", "isolated", "scared", "die",
]

URL_PATTERN = r"http\S+|www\S+"
NON_ALNUM_PATTERN = r"[^a-z0-9\s]"
KEEP_ALNUM_RUNS = r"[a-z0-9\s]+"  # positive twin of NON_ALNUM_PATTERN
WS_PATTERN = r"\s+"

# Per-keyword score and cap (preprocessing_streaming.py:64-66).
KEYWORD_POINTS = 10
SCORE_CAP = 100

# High-risk alert threshold (kafka_consumer_simple.py:168; dashboard/app.py:45).
HIGH_RISK_THRESHOLD = 30


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def combined_text(title: Column | str, text: Column | str) -> Column:
    """``concat_ws(" ", title, text)`` — the Spark variant's combiner
    (preprocessing_streaming.py:109-110).  concat_ws skips NULLs but
    keeps empty strings, matching the consumer's f-string except for the
    trailing space on empty text (SURVEY.md §2.7 concat_title_text)."""
    return F.concat_ws(" ", _col(title), _col(text))


def clean_text(c: Column | str) -> Column:
    """lower → strip URLs → strip non-alphanumerics → collapse whitespace.

    Mirrors the UDF at preprocessing_streaming.py:42-48 but as a fused
    native expression.  NULL input maps to '' (the UDF returns '' for
    falsy input; regexp propagates NULL, so we coalesce).

    The strip-non-alphanumerics step is written as KEEP-the-allowed-runs
    (`regexp_extract_all('[a-z0-9\\s]+')` + join) rather than
    `regexp_replace('[^a-z0-9\\s]', '')`: identical output (both keep
    exactly the [a-z0-9\\s] characters, in order), but measured 34x
    faster on java.util.regex — the negated-single-char replace costs
    ~1 ms/row at 300 chars (a Matcher.find per deleted char over a
    class with no literal prefix to skip with), while the positive
    run-extraction matches whole allowed runs.  At 100 TB this is the
    difference between the clean pass being free vs dominating the
    scan.

    Known fidelity boundary (found by the hypothesis differential
    fuzz): the reference runs CPython `re`, where ``\\s`` also matches
    the ASCII separators \\x1c-\\x1f and unicode spaces; Java regex
    does not, so such characters are REMOVED here but would become a
    space under the reference.  Out of spec for reddit text (ASCII,
    no separator control chars) — documented rather than emulated."""
    c = F.lower(_col(c))
    c = F.regexp_replace(c, URL_PATTERN, "")
    c = F.array_join(F.regexp_extract_all(c, F.lit(KEEP_ALNUM_RUNS),
                                          F.lit(0)), "")
    c = F.trim(F.regexp_replace(c, WS_PATTERN, " "))
    return F.coalesce(c, F.lit(""))


def risk_score(c: Column | str, keywords: list[str] | None = None) -> Column:
    """10 points per distinct keyword substring-present in lower(text),
    capped at 100 (preprocessing_streaming.py:53-66).

    Expressed as one higher-order function — ``size(filter(keywords,
    k -> contains(text, k)))`` — instead of a 16-term when/otherwise
    fold.  Semantics are identical (a NULL text makes the lambda NULL,
    which `filter` treats as false → score 0, matching the UDF's falsy
    short-circuit) and measured steady-state throughput is equal; the
    benefit is the ~16x smaller expression tree, which keeps any
    enclosing multi-branch CASE from duplicating a large subtree per
    branch (the codegen blow-up documented in plans history — the HOF
    makes that class of regression structurally impossible).  Keyword
    matching itself is unchanged: substring, not word-boundary."""
    lowered = F.lower(_col(c))
    hits = F.size(F.filter(
        F.array(*[F.lit(k) for k in (keywords or DISTRESS_KEYWORDS)]),
        lambda k: F.contains(lowered, k)))
    return F.least(hits * F.lit(KEYWORD_POINTS), F.lit(SCORE_CAP)).cast("int")


def risk_score_sql(text_expr: str, keywords: list[str] | None = None) -> str:
    """ANSI-SQL twin of :func:`risk_score` (used for DuckDB oracles and
    for spark.sql() string plans).  ``text_expr`` is a SQL expression."""
    kws = keywords or DISTRESS_KEYWORDS
    terms = " + ".join(
        "(CASE WHEN contains(lower({t}), '{k}') THEN 1 ELSE 0 END)".format(
            t=text_expr, k=kw.replace("'", "''"))
        for kw in kws
    )
    return f"CAST(LEAST(10 * ({terms}), 100) AS INTEGER)"


def clean_text_sql(text_expr: str) -> str:
    """DuckDB-flavoured SQL twin of :func:`clean_text` (needs the 'g'
    flag — DuckDB regexp_replace is first-match by default)."""
    return (
        "COALESCE(trim(regexp_replace(regexp_replace(regexp_replace("
        f"lower({text_expr}), 'http\\S+|www\\S+', '', 'g'), "
        "'[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), '')"
    )


def risk_bucket(c: Column | str) -> Column:
    """Left-closed histogram buckets {0-10,10-20,20-30,30+}
    (dashboard/app.py:62-72: edge values go to the upper bucket)."""
    c = _col(c)
    return (
        F.when(c < 10, "0-10")
        .when(c < 20, "10-20")
        .when(c < 30, "20-30")
        .otherwise("30+")
    )


RISK_BUCKET_SQL = (
    "CASE WHEN {c} < 10 THEN '0-10' WHEN {c} < 20 THEN '10-20' "
    "WHEN {c} < 30 THEN '20-30' ELSE '30+' END"
)
