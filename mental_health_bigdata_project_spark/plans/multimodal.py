"""[EXT] Multimodal-column plumbing (SURVEY.md north star).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata.  WAV (RIFF/PCM) decode is REAL as of round 9
(``operators.media.decode_wav`` — pure-Python container parse, no
codec library); compressed codecs keep a deterministic fake
feature extractor.  The Spark-side plumbing is real throughout:
binary columns, Arrow-batched mapInPandas with an explicit output
schema, and partition-preserving one-pass plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.media import extract_features, with_binary_payload
from ..sources import load_table
from .registry import query


@query("multimodal_bytes", """
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len FROM documents
""")
def multimodal_bytes(spark, sf_dir):
    """Byte length of the (fake) binary payload, computed *through* the
    mapInPandas decode path — proves the binary schema + Arrow batch
    plumbing while staying oracle-checkable (octet_length twin)."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs)
    return extract_features(payloads).select("doc_id", "byte_len")


@query("multimodal_features", """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           CASE WHEN strlen(text) = 0 THEN 0
                ELSE CAST(list_sum(list_transform(
                       range(1, least(strlen(text), 64) + 1),
                       i -> i * ascii(substr(text, i, 1)))) % 997
                     AS BIGINT)
           END AS checksum,
           CASE WHEN strlen(text) = 0 THEN 0.0
                ELSE CAST(list_sum(list_transform(
                       range(1, strlen(text) + 1),
                       i -> ascii(substr(text, i, 1)))) AS DOUBLE)
                     / strlen(text)
           END AS mean_byte
    FROM documents
""")
def multimodal_features(spark, sf_dir):
    """Full fake-decode feature row (byte_len, checksum, mean_byte) —
    the shape a real image/audio featurizer would return.  The Spark
    side is the REAL plumbing under test (binary payload column ->
    Arrow-batched mapInPandas featurize); the oracle recomputes the
    same deterministic features byte-for-byte in SQL (valid because the
    synthetic corpus is pure ASCII, so per-byte = per-char ascii()) —
    so the Python-boundary path is value-checked, not just rows-only.
    checksum = sum((i+1) * byte_i, first 64 bytes) mod 997; integer
    arithmetic, engine-exact; mean_byte is one exact-int sum / length
    division."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_binary_payload(docs))


@query("multimodal_bytes_arrow", """
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len FROM documents
""")
def multimodal_bytes_arrow(spark, sf_dir):
    """mapInArrow twin of multimodal_bytes: the batch arrives as a raw
    pyarrow RecordBatch and byte lengths come from pyarrow.compute —
    NO pandas materialization at all.  For binary-heavy media columns
    this is the preferred Python boundary: pandas would copy every
    payload into Python bytes objects; Arrow compute touches only the
    offsets vector of the binary column (O(rows), not O(bytes))."""
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs).select("doc_id", "payload")

    def lengths(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [b.column(0),
                 pc.cast(pc.binary_length(b.column(1)), pa.int64())],
                ["doc_id", "byte_len"])

    return payloads.mapInArrow(lengths, "doc_id bigint, byte_len bigint")


@query("multimodal_dedup_bytes", """
    SELECT content_sha, doc_id, n_copies FROM (
      SELECT sha256(text) AS content_sha, doc_id,
             count(*) OVER (PARTITION BY sha256(text)) AS n_copies,
             row_number() OVER (PARTITION BY sha256(text)
                                ORDER BY doc_id) AS rn
      FROM documents) WHERE rn = 1
""")
def multimodal_dedup_bytes(spark, sf_dir):
    """Exact dedup over the BINARY payload column — the multimodal
    counterpart of dedup_exact_docs: sha-256 of the raw bytes (JVM
    sha2, no decode, no Python), deterministic min-doc_id survivor,
    copy count per content hash.  For real media at 100 TB this is
    the first pass (identical files dominate web-scraped image/video
    dups) and shuffles only the 256-bit digest + id — payload bytes
    never move.  Oracle: DuckDB sha256 over the same utf-8 bytes."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs).select(
        "doc_id", F.sha2("payload", 256).alias("content_sha"))
    # survivor + copy count as ONE map-side-combinable aggregate (a
    # window would sort every copy of a hot digest in one partition —
    # and identical files DOMINATE web-scraped media dups)
    return (payloads.groupBy("content_sha")
            .agg(F.min("doc_id").alias("doc_id"),
                 F.count("*").alias("n_copies"))
            .select("content_sha", "doc_id", "n_copies"))


def _ascii_only(docs: DataFrame) -> DataFrame:
    """Documents whose text is pure ASCII (utf-8 byte count == char
    count) — the precondition that keeps the WAV synth corpora exact
    across engines: Spark synthesizes from utf-8 BYTES while the
    DuckDB oracles recompute from CHARACTER codes via ascii(), and the
    two agree exactly on ASCII.  Filtering (rather than assuming) makes
    the queries degrade deterministically on non-ASCII corpora
    (ADVICE r9): non-ASCII docs drop out on BOTH sides instead of
    crashing the synth or hash-mismatching."""
    return docs.filter(F.octet_length("text") == F.length("text"))


# the oracle-side twin of _ascii_only (DuckDB strlen is BYTES,
# length is CHARACTERS)
_ASCII_ONLY_SQL = "strlen(text) = length(text)"


def synth_wav_corpus(docs: DataFrame) -> DataFrame:
    """Deterministic WAV fixture corpus: each document's ASCII text
    becomes a mono 8 kHz PCM16 payload with sample_i =
    (byte_i % 128 - 64) * 256 (fits int16 for any byte; == (byte - 64)
    * 256 on the ASCII range the queries filter to — the % 128 mask
    keeps the synth from overflowing int16 on non-ASCII bytes instead
    of crashing executors, ADVICE r9), in a REAL canonical RIFF
    container (operators.media.encode_wav_pcm16).  The container bytes
    are real — only the audio content is synthetic — so decode_wav
    downstream exercises the genuine parse path."""
    from ..operators.media import encode_wav_pcm16

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [
                encode_wav_pcm16([(b % 128 - 64) * 256
                                  for b in text.encode("utf-8")])
                for text in pdf["text"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    return (docs.select("doc_id", "text")
            .mapInPandas(synth, "doc_id bigint, payload binary"))


@query("media_decode_wav", """
    SELECT doc_id,
           CAST(1 AS BIGINT) AS n_channels,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(16 AS BIGINT) AS bit_depth,
           CAST(strlen(text) AS BIGINT) AS n_samples,
           CASE WHEN strlen(text) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(list_max(list_transform(
                       range(1, strlen(text) + 1),
                       i -> abs((ascii(substr(text, i, 1)) - 64) * 256)))
                     AS BIGINT)
           END AS peak_abs,
           CASE WHEN strlen(text) = 0 THEN 0.0
                ELSE CAST(list_sum(list_transform(
                       range(1, strlen(text) + 1),
                       i -> (ascii(substr(text, i, 1)) - 64) * 256))
                     AS DOUBLE) / strlen(text)
           END AS mean_sample,
           CAST(strlen(text) AS DOUBLE) / 8000.0 AS duration_sec
    FROM documents WHERE strlen(text) = length(text)
""")
def media_decode_wav(spark, sf_dir):
    """REAL WAV decode through the media path (VERDICT r8 item 3 —
    the codec stub closed for one real format): synth_wav_corpus
    wraps each doc's bytes in a genuine RIFF/PCM16 container, and
    decode_wav_features PARSES the container back (chunk walk, fmt
    descriptor, little-endian PCM16 decode — operators/media.py, no
    codec library) into exact integer sample statistics.  The oracle
    recomputes the expected audio features from the source text (both
    sides filter to pure-ASCII docs, where byte_i == ascii(char_i) —
    see _ascii_only); a decoder that misread the header, mis-aligned a
    chunk, or sign-flipped a sample hash-mismatches.  mean_sample is
    one exact-int-sum / count double division, identical on both
    engines.

    At 100 TB: decode is embarrassingly parallel mapInPandas riding
    the scan partitioning — payload bytes never shuffle; the output is
    a fixed 7-column metadata row per file, the shape a real audio
    curation pass (silence/clipping gates on peak; duration budgets)
    consumes."""
    from ..operators.media import decode_wav_features

    docs = _ascii_only(load_table(spark, sf_dir, "documents"))
    feats = decode_wav_features(synth_wav_corpus(docs))
    return feats.select(
        "doc_id", "n_channels", "sample_rate", "bit_depth", "n_samples",
        "peak_abs",
        F.when(F.col("n_samples") == 0, F.lit(0.0))
        .otherwise(F.col("sum_samples").cast("double")
                   / F.col("n_samples")).alias("mean_sample"),
        (F.col("n_samples").cast("double") / F.lit(8000.0))
        .alias("duration_sec"))


def synth_wav_float32_corpus(docs: DataFrame) -> DataFrame:
    """IEEE-float32 twin of synth_wav_corpus: sample_i =
    (byte_i % 128 - 64) / 64.0 — a dyadic rational (multiple of 2^-6,
    magnitude <= 1) that float32 represents EXACTLY, so the decoded
    statistics are bit-deterministic even though the format is
    floating point.  Real format-tag-3 RIFF containers
    (operators.media.encode_wav_float32)."""
    from ..operators.media import encode_wav_float32

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [
                encode_wav_float32([(b % 128 - 64) / 64.0
                                    for b in text.encode("utf-8")])
                for text in pdf["text"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    return (docs.select("doc_id", "text")
            .mapInPandas(synth, "doc_id bigint, payload binary"))


@query("media_decode_wav_float32", """
    SELECT doc_id,
           CAST(1 AS BIGINT) AS n_channels,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(32 AS BIGINT) AS bit_depth,
           CAST(strlen(text) AS BIGINT) AS n_samples,
           CASE WHEN strlen(text) = 0 THEN 0.0
                ELSE list_max(list_transform(
                       range(1, strlen(text) + 1),
                       i -> abs((ascii(substr(text, CAST(i AS INTEGER), 1))
                                 % 128 - 64) / 64.0)))
           END AS peak_abs,
           CASE WHEN strlen(text) = 0 THEN 0.0
                ELSE list_sum(list_transform(
                       range(1, strlen(text) + 1),
                       i -> (ascii(substr(text, CAST(i AS INTEGER), 1))
                             % 128 - 64) / 64.0)) / strlen(text)
           END AS mean_sample
    FROM documents WHERE strlen(text) = length(text)
""")
def media_decode_wav_float32(spark, sf_dir):
    """REAL IEEE-float32 WAV decode through the media path (VERDICT r9
    item 2 — the first of the two most common non-PCM16 formats moved
    from NotImplementedError to a real decoder): synth_wav_float32_
    corpus wraps each ASCII doc's bytes as exactly-representable
    float32 samples in a genuine format-tag-3 RIFF container, and
    decode_wav PARSES it back (chunk walk with size validation, fmt
    descriptor, little-endian float32 array decode — no codec library).
    The oracle recomputes peak and mean from the source text.

    Float exactness argument: every sample is a multiple of 2^-6 with
    |s| <= 1, and a doc has < 2^13 samples, so every partial sum is a
    multiple of 2^-6 below 2^13 — exactly representable in float64
    under ANY summation order; the float32 -> float64 widening is
    exact by construction.  The mean is one double division of exact
    values, identical on both engines — no rounding needed anywhere.

    At 100 TB: same embarrassingly-parallel shape as media_decode_wav —
    decode is mapInPandas riding the scan partitioning, payload bytes
    never shuffle, output is a fixed metadata row per file."""
    from ..operators.media import decode_wav_features_f64

    docs = _ascii_only(load_table(spark, sf_dir, "documents"))
    feats = decode_wav_features_f64(synth_wav_float32_corpus(docs))
    return feats.select(
        "doc_id", "n_channels", "sample_rate", "bit_depth", "n_samples",
        "peak_abs",
        F.when(F.col("n_samples") == 0, F.lit(0.0))
        .otherwise(F.col("sum_samples") / F.col("n_samples"))
        .alias("mean_sample"))


def synth_wav_mulaw_corpus(docs: DataFrame) -> DataFrame:
    """G.711 mu-law twin of synth_wav_corpus: each utf-8 byte IS the
    companded 8-bit code (every byte value 0-255 is a valid mu-law
    code, so no masking is needed for crash-safety), in a real
    format-tag-7 RIFF container (operators.media.encode_wav_mulaw)."""
    from ..operators.media import encode_wav_mulaw

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [encode_wav_mulaw(text.encode("utf-8"))
                        for text in pdf["text"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    return (docs.select("doc_id", "text")
            .mapInPandas(synth, "doc_id bigint, payload binary"))


# the G.711 expansion as one SQL scalar over a mu-law code `{c}`:
# complement, split exponent/mantissa, rebuild the biased magnitude —
# pure integer arithmetic, identical on both engines.
_MULAW_SQL = ("CASE WHEN xor({c}, 255) >= 128 "
              "THEN 132 - ((xor({c}, 255) % 16) * 8 + 132)"
              " * (1 << ((xor({c}, 255) // 16) % 8)) "
              "ELSE ((xor({c}, 255) % 16) * 8 + 132)"
              " * (1 << ((xor({c}, 255) // 16) % 8)) - 132 END")


@query("media_decode_wav_mulaw", f"""
    SELECT doc_id,
           CAST(1 AS BIGINT) AS n_channels,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(8 AS BIGINT) AS bit_depth,
           CAST(strlen(text) AS BIGINT) AS n_samples,
           CASE WHEN strlen(text) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(list_sum(list_transform(
                       range(1, strlen(text) + 1),
                       i -> {_MULAW_SQL.format(
                           c="ascii(substr(text, CAST(i AS INTEGER), 1))")}))
                     AS BIGINT)
           END AS sum_samples,
           CASE WHEN strlen(text) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(list_max(list_transform(
                       range(1, strlen(text) + 1),
                       i -> abs({_MULAW_SQL.format(
                           c="ascii(substr(text, CAST(i AS INTEGER), 1))")})))
                     AS BIGINT)
           END AS peak_abs,
           CASE WHEN strlen(text) = 0 THEN 0.0
                ELSE CAST(list_sum(list_transform(
                       range(1, strlen(text) + 1),
                       i -> {_MULAW_SQL.format(
                           c="ascii(substr(text, CAST(i AS INTEGER), 1))")}))
                     AS DOUBLE) / strlen(text)
           END AS mean_sample
    FROM documents WHERE strlen(text) = length(text)
""")
def media_decode_wav_mulaw(spark, sf_dir):
    """REAL G.711 mu-law WAV decode through the media path (VERDICT r9
    item 2, second format): synth_wav_mulaw_corpus stores each ASCII
    doc's bytes as companded codes in a genuine format-tag-7 RIFF
    container; decode_wav expands every code to its 16-bit linear
    sample via the pure-integer G.711 table (operators.media.
    mulaw_expand — verified byte-exact against CPython's audioop over
    all 256 codes) and emits exact integer statistics.  The oracle
    replays the SAME expansion arithmetic in SQL (complement, exponent/
    mantissa split, biased magnitude — _MULAW_SQL) over the character
    codes, so a decoder that mis-ordered the bias or sign would
    hash-mismatch.  mu-law is THE telephony/speech-corpus format (8 kHz
    call audio), which is why a real multimodal pipeline hits it
    immediately after PCM16.

    At 100 TB: identical scan-riding mapInPandas shape as the PCM16
    decode — expansion is O(bytes) integer table work per file, no
    shuffle, fixed metadata row out."""
    from ..operators.media import decode_wav_features

    docs = _ascii_only(load_table(spark, sf_dir, "documents"))
    feats = decode_wav_features(synth_wav_mulaw_corpus(docs))
    return feats.select(
        "doc_id", "n_channels", "sample_rate", "bit_depth", "n_samples",
        "sum_samples", "peak_abs",
        F.when(F.col("n_samples") == 0, F.lit(0.0))
        .otherwise(F.col("sum_samples").cast("double")
                   / F.col("n_samples")).alias("mean_sample"))
