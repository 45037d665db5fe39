"""Round-10 optimization equivalence tests: every rewrite of an
operator's INTERNALS this round must keep its outputs bit-identical —
these tests pin the equivalences directly (the oracle gate re-proves
them end-to-end at 3 SFs).

- decode_wav_batch (vectorized cross-file ADPCM recurrence) vs the
  per-payload sequential decode_wav, including multi-block, odd-nibble,
  samples_per_block-truncated, empty and error cases;
- encode_wav_adpcm_bytes (direct container build) vs encode_wav_adpcm
  over the (lo, hi) nibble expansion it specializes;
- the vectorized synth sample maps vs the scalar encoders;
- artifacts.read_or_build computing (not reading disk) when no
  $SPARK_GRAFT_ARTIFACT_DIR store is configured.
"""

from __future__ import annotations

import os

import pytest


def _adpcm_reference(payload):
    from mental_health_bigdata_project_spark.operators.media import decode_wav
    return decode_wav(payload)


def test_decode_wav_batch_matches_sequential_adpcm():
    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, decode_wav_batch, encode_wav_adpcm)

    payloads = [
        encode_wav_adpcm([]),                          # no block at all
        encode_wav_adpcm([7]),                         # single code
        encode_wav_adpcm([1, 2, 3, 4, 5, 6, 7, 8, 9]),  # odd count (pad)
        encode_wav_adpcm(list(range(16)) * 20),        # all codes, long
        encode_wav_adpcm([15, 15, 15, 15] * 50),       # clamp at +-32767
        encode_wav_adpcm([8, 8, 8, 8] * 50),           # negative walk
    ]
    got = decode_wav_batch(payloads)
    want = [decode_wav(p) for p in payloads]
    assert got == want


def test_decode_wav_batch_matches_sequential_multiblock():
    """A hand-built TWO-block ADPCM container (nonzero initial
    predictor/step-index in the second block, no fmt extension so no
    samples_per_block truncation) decodes identically."""
    import struct

    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, decode_wav_batch)

    block1 = struct.pack("<hBB", 100, 5, 0) + bytes([0x21, 0x9F])
    block2 = struct.pack("<hBB", -2000, 40, 0) + bytes([0x73])
    data = block1 + block2
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 8000, len(block1), 4)
    payload = (b"RIFF" + struct.pack("<I", 28 + len(fmt) + len(data))
               + b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(data)) + data)
    assert decode_wav_batch([payload]) == [decode_wav(payload)]


def test_decode_wav_batch_truncates_by_samples_per_block():
    """samples_per_block smaller than 1 + n_codes drops trailing codes
    in both decoders (the odd-nibble pad case generalized)."""
    import struct

    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, decode_wav_batch)

    block = struct.pack("<hBB", 0, 0, 0) + bytes([0x54, 0x32, 0x10])
    for spb in (0, 1, 2, 4, 6, 7):
        fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000,
                          len(block), 4, 2, spb)
        payload = (b"RIFF"
                   + struct.pack("<I", 28 + len(fmt) + len(block))
                   + b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
                   + b"data" + struct.pack("<I", len(block)) + block)
        assert decode_wav_batch([payload]) == [decode_wav(payload)], spb


def test_decode_wav_batch_mixed_formats_and_errors():
    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, decode_wav_batch, encode_wav_adpcm,
        encode_wav_float32, encode_wav_mulaw, encode_wav_pcm16)

    payloads = [
        encode_wav_pcm16([0, 1000, -1000, 32767, -32768]),
        encode_wav_float32([0.5, -0.25, 0.0]),
        encode_wav_mulaw(bytes([0, 127, 128, 255])),
        encode_wav_adpcm([3, 12, 0, 15]),
    ]
    assert decode_wav_batch(payloads) == [decode_wav(p) for p in payloads]
    with pytest.raises(ValueError):
        decode_wav_batch([encode_wav_pcm16([1, 2, 3])[:-3]])


def test_encode_wav_adpcm_bytes_matches_nibble_expansion():
    from mental_health_bigdata_project_spark.operators.media import (
        encode_wav_adpcm, encode_wav_adpcm_bytes)

    for bs in (b"", b"a", b"hello world", bytes(range(256)),
               "mixed \t\n punctuation!?".encode("utf-8")):
        want = encode_wav_adpcm(
            [c for b in bs for c in (b & 0x0F, b >> 4)])
        assert encode_wav_adpcm_bytes(bs) == want


def test_vectorized_synth_sample_maps_match_scalar_encoders():
    """The numpy sample maps inside synth_wav_corpus /
    synth_wav_float32_corpus build byte-identical containers to the
    scalar encoders they replaced."""
    import numpy as np

    from mental_health_bigdata_project_spark.operators.media import (
        _wav_container, encode_wav_float32, encode_wav_pcm16)

    for text in ("", "a", "The quick brown fox", "punct!? 42\n"):
        bs = text.encode("utf-8")
        pcm_fast = _wav_container(1, 16, (
            (np.frombuffer(bs, np.uint8).astype(np.int32) % 128 - 64)
            * 256).astype("<i2").tobytes(), 8000)
        assert pcm_fast == encode_wav_pcm16(
            [(b % 128 - 64) * 256 for b in bs])
        f32_fast = _wav_container(3, 32, (
            (np.frombuffer(bs, np.uint8).astype(np.float64) % 128 - 64)
            / 64.0).astype("<f4").tobytes(), 8000)
        assert f32_fast == encode_wav_float32(
            [(b % 128 - 64) / 64.0 for b in bs])


def test_read_or_build_is_session_local_without_store_env(
        spark, sf_dir, tmp_path, monkeypatch):
    """With no $SPARK_GRAFT_ARTIFACT_DIR the artifact layer neither
    reads nor writes any store directory — every invocation computes
    from the inputs (round-10 rule: bench/oracle runs must not reuse
    persisted intermediates keyed on the test data)."""
    monkeypatch.delenv("SPARK_GRAFT_ARTIFACT_DIR", raising=False)

    from mental_health_bigdata_project_spark import artifacts

    assert not artifacts.persistence_enabled()
    calls = []

    def build():
        calls.append(1)
        return spark.range(3).toDF("doc_id")

    got = artifacts.read_or_build(spark, sf_dir, "t_opt_in",
                                  ("documents",), build)
    assert got.count() == 3 and calls == [1]
    assert not os.path.isdir(os.path.join(artifacts.artifact_root(),
                                          artifacts._dataset_key(sf_dir),
                                          "t_opt_in"))
