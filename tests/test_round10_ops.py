"""Round-10 operator semantics: the float32/mu-law WAV decode paths,
container-validation hardening, plus property checks the DuckDB
oracles can't express for the new statistics/curation queries."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.plans import QUERIES
from mental_health_bigdata_project_spark.sources import load_table


# --- WAV decode, round-10 formats (VERDICT r9 item 2) ---------------------

def test_decode_wav_float32_roundtrips_dyadic_samples():
    """encode_wav_float32 -> decode_wav is value-exact for dyadic
    rationals (the float32-representable grid the synth corpus uses)."""
    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, encode_wav_float32)

    samples = [0.0, 0.5, -0.25, 63 / 64.0, -1.0, 1 / 64.0]
    m = decode_wav(encode_wav_float32(samples, 8000))
    assert m["audio_format"] == 3 and m["bit_depth"] == 32
    assert m["n_samples"] == len(samples)
    assert m["sum_samples"] == sum(samples)       # exact: dyadic grid
    assert m["peak_abs"] == 1.0


def test_decode_wav_mulaw_matches_reference_table():
    """The G.711 expansion must hit the canonical table endpoints and
    agree with an independently-coded decoder over all 256 codes."""
    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, encode_wav_mulaw, mulaw_expand)

    # canonical endpoints of the G.711 mu-law table
    assert mulaw_expand(0x00) == -32124
    assert mulaw_expand(0x80) == 32124
    assert mulaw_expand(0xFF) == 0
    assert mulaw_expand(0x7F) == 0

    # independent re-derivation: reconstruct each segment explicitly
    def reference(code):
        u = code ^ 0xFF
        seg, mant = (u >> 4) & 7, u & 15
        mag = ((2 * mant + 33) << (seg + 2)) - 132
        return -mag if u & 0x80 else mag

    for c in range(256):
        assert mulaw_expand(c) == reference(c), c

    m = decode_wav(encode_wav_mulaw(bytes([0x00, 0xFF, 0x80])))
    assert m["audio_format"] == 7 and m["bit_depth"] == 8
    assert m["n_samples"] == 3
    assert m["sum_samples"] == -32124 + 0 + 32124
    assert m["peak_abs"] == 32124


def test_decode_wav_rejects_truncated_and_short_fmt():
    """Malformed containers fail loudly (ADVICE r9): a chunk whose
    declared size overruns the payload, and a short fmt body, both
    raise ValueError — never silently-truncated statistics."""
    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, encode_wav_pcm16)

    good = encode_wav_pcm16([1, 2, 3, 4])
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:-3])              # data chunk overruns
    # fmt declares 16 bytes but the container ends after 10
    short = (b"RIFF" + struct.pack("<I", 22) + b"WAVEfmt "
             + struct.pack("<I", 16) + b"\x00" * 10)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(short)
    # fmt chunk present but declared short: 10 < 16 required
    body = (b"WAVEfmt " + struct.pack("<I", 10) + b"\x00" * 10
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="short fmt"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_wav_queries_drop_non_ascii_docs_deterministically(spark, sf_dir):
    """The ASCII gate (ADVICE r9): a non-ASCII doc must simply drop out
    of the decode queries — no crash, no phantom row."""
    from mental_health_bigdata_project_spark.plans.multimodal import (
        _ascii_only, synth_wav_corpus, synth_wav_mulaw_corpus)

    docs = spark.createDataFrame(
        [(1, "plain ascii"), (2, "café au lait"), (3, "")],
        "doc_id bigint, text string")
    kept = [r.doc_id for r in _ascii_only(docs).collect()]
    assert kept == [1, 3]
    # the synth itself must survive non-ASCII bytes if handed them raw
    for synth in (synth_wav_corpus, synth_wav_mulaw_corpus):
        out = synth(docs).collect()
        assert len(out) == 3               # mask keeps executors alive


def test_media_decode_float32_query_matches_python(spark, sf_dir):
    """Spark float32 decode stats equal a driver-side pure-Python
    synth+decode over the same docs (independent of the oracle)."""
    rows = {r.doc_id: r for r in
            QUERIES["media_decode_wav_float32"](spark, sf_dir).collect()}
    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.octet_length("text") == F.length("text"))
            .select("doc_id", "text").limit(40).collect())
    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, encode_wav_float32)
    for d in docs:
        m = decode_wav(encode_wav_float32(
            [(b % 128 - 64) / 64.0 for b in d.text.encode("utf-8")]))
        r = rows[d.doc_id]
        assert r.n_samples == m["n_samples"]
        assert r.peak_abs == m["peak_abs"]
        expect_mean = (m["sum_samples"] / m["n_samples"]
                       if m["n_samples"] else 0.0)
        assert r.mean_sample == expect_mean


def test_media_decode_mulaw_query_matches_python(spark, sf_dir):
    rows = {r.doc_id: r for r in
            QUERIES["media_decode_wav_mulaw"](spark, sf_dir).collect()}
    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.octet_length("text") == F.length("text"))
            .select("doc_id", "text").limit(40).collect())
    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, encode_wav_mulaw)
    for d in docs:
        m = decode_wav(encode_wav_mulaw(d.text.encode("utf-8")))
        r = rows[d.doc_id]
        assert (r.n_samples, r.sum_samples, r.peak_abs) == (
            m["n_samples"], m["sum_samples"], m["peak_abs"])
