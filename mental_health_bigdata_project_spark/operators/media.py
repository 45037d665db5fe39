"""Multimodal (binary-column) operators.

Treats media as opaque ``binary`` payloads + typed metadata, processed
with Arrow-batched ``mapInPandas`` — the pattern for decode / resize /
frame-sample at 100 TB (payload bytes never leave the executor, batches
stream through Python via Arrow, output schema is explicit).

Decode status (round 10): WAV is REAL for integer PCM (8/16-bit),
IEEE float32 (format tag 3), G.711 mu-law (format tag 7), G.711
A-law (format tag 6) and IMA ADPCM (format tag 0x11) —
``decode_wav`` is a pure-Python container parser needing no codec
library, wired into the same Arrow-batched path as the fakes and
value-checked against stdlib ``wave``/``audioop`` fixtures.
COMPRESSED codecs (jpeg/mp3/h264, extensible WAV) remain stubbed:
``decode_media`` raises NotImplementedError for those, and the
generic feature extractor keeps its deterministic byte-statistics
fake.  The Spark-side plumbing — schema, batch iteration,
partitioning — is real and tested for every path.
"""

from __future__ import annotations

import struct
import sys
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = "doc_id bigint, byte_len bigint, checksum bigint, mean_byte double"


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach a binary `payload` column (utf-8 bytes of the text — the
    stand-in for real media bytes) plus media-style metadata."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length("text").alias("n_chars"),
        ).alias("media_meta"),
    )


def decode_media(payload: bytes, mime: str) -> object:
    """Decode hook (image/audio/video).  WAV (RIFF: integer PCM, IEEE
    float32, G.711 mu-law) decodes for real via ``decode_wav``;
    compressed codecs need libraries not present in this environment
    and stay stubbed."""
    if mime in ("audio/wav", "audio/x-wav", "audio/wave"):
        return decode_wav(payload)
    raise NotImplementedError(
        f"decoding {mime!r} requires codec libraries not present in this "
        "environment (only RIFF WAV decodes without one); "
        "extract_features uses a deterministic fake instead")


def mulaw_expand(code: int) -> int:
    """G.711 mu-law byte -> 16-bit linear sample, the standard pure-
    integer expansion (ITU-T G.711 table; matches CPython's audioop):
    complement the byte, split sign/exponent/mantissa, rebuild the
    biased magnitude.  Byte 0x00 -> -32124, 0xFF -> 0."""
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return 0x84 - t if u & 0x80 else t - 0x84


def alaw_expand(code: int) -> int:
    """G.711 A-law byte -> 16-bit linear sample, the standard pure-
    integer expansion (ITU-T G.711; matches CPython's audioop): XOR
    0x55, split sign/exponent/mantissa, rebuild the chord magnitude.
    After the XOR, bit 7 SET means positive (the opposite of mu-law's
    complemented convention).  Byte 0x55 -> -8, 0xD5 -> +8,
    0x2A -> -32256 (negative full scale)."""
    a = code ^ 0x55
    sign = a & 0x80
    a &= 0x7F
    e = a >> 4
    m = a & 0x0F
    mag = (m << 4) + 8 if e == 0 else ((m << 4) + 0x108) << (e - 1)
    return mag if sign else -mag


# IMA/DVI ADPCM quantizer tables (IMA "Recommended Practices for
# Enhancing Digital Audio Compatibility", rev 3.00, 1992 — the tables
# every IMA decoder shares; pure integers, no codec library).
IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767]
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]

try:                                   # vectorized decode fast path
    import numpy as _np
except ImportError:                    # pragma: no cover
    _np = None

if _np is not None:
    # 256-entry lookup tables: the G.711 expansions and 8-bit PCM
    # centering are pure per-byte maps, so LUT[frombuffer(bytes)]
    # decodes a whole payload in one vectorized gather (measured ~5x
    # end-to-end on the mu-law/A-law decode queries at sf0.1; the
    # scalar functions above stay as the spec reference the tests
    # pin the tables against).
    _MULAW_LUT = _np.array([mulaw_expand(c) for c in range(256)],
                           dtype=_np.int64)
    _ALAW_LUT = _np.array([alaw_expand(c) for c in range(256)],
                          dtype=_np.int64)
    _PCM8_LUT = _np.arange(256, dtype=_np.int64) - 128
    # IMA ADPCM quantizer as (89 x 16) tables: signed sample delta and
    # step-index walk per (step-index, code) — exactly ima_adpcm_step's
    # arithmetic, materialized so the batch decoder below can advance
    # MANY blocks one code per numpy step (the per-code state update is
    # sequential WITHIN a block, but independent ACROSS blocks).


    def _ima_diff(idx: int, code: int) -> int:
        step = IMA_STEP_TABLE[idx]
        diff = step >> 3
        if code & 1:
            diff += step >> 2
        if code & 2:
            diff += step >> 1
        if code & 4:
            diff += step
        return -diff if code & 8 else diff

    _IMA_DIFF_LUT = _np.array(
        [[_ima_diff(i, c) for c in range(16)] for i in range(89)],
        dtype=_np.int64)
    _IMA_IDX_LUT = _np.array([IMA_INDEX_TABLE[c & 7] for c in range(16)],
                             dtype=_np.int64)


def _lut_decode(data: bytes, lut):
    return lut[_np.frombuffer(data, dtype=_np.uint8)]


def ima_adpcm_step(pred: int, idx: int, code: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: 4-bit ``code`` + carried
    (predictor, step-index) state -> the next sample and state.  The
    magnitude bits add step/8 (+step/4, +step/2, +step) per set bit,
    bit 3 is the sign; predictor clamps to int16, index walks
    IMA_INDEX_TABLE clamped to [0, 88]."""
    step = IMA_STEP_TABLE[idx]
    diff = step >> 3
    if code & 1:
        diff += step >> 2
    if code & 2:
        diff += step >> 1
    if code & 4:
        diff += step
    if code & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    idx = max(0, min(88, idx + IMA_INDEX_TABLE[code & 7]))
    return pred, idx


def _adpcm_decode_blocks(data: bytes, block_align: int,
                         samples_per_block: int | None) -> list:
    """IMA ADPCM data-chunk decode: walk ``block_align``-sized blocks,
    each a 4-byte header (int16 initial predictor — which IS the
    block's first output sample — uint8 step index, reserved) followed
    by packed 4-bit codes, LOW nibble first.  ``samples_per_block``
    (from the fmt extension) caps each block's output so an odd code
    count's pad nibble is dropped; the final block may be short."""
    samples: list[int] = []
    for off in range(0, len(data), block_align):
        block = data[off:off + block_align]
        if len(block) < 4:
            raise ValueError(
                f"short ADPCM block header: {len(block)} bytes, 4 required")
        (pred,) = struct.unpack_from("<h", block, 0)
        idx = block[2]
        if idx > 88:
            raise ValueError(f"ADPCM step index {idx} outside [0, 88]")
        out = [pred]
        for byte in block[4:]:
            for code in (byte & 0x0F, byte >> 4):
                pred, idx = ima_adpcm_step(pred, idx, code)
                out.append(pred)
        if samples_per_block is not None:
            out = out[:samples_per_block]
        samples.extend(out)
    return samples


def _parse_wav(payload: bytes) -> tuple:
    """The RIFF container walk shared by decode_wav and the batch
    decoder: validates the chunk list and the ``fmt `` body, returns
    (audio_format, n_channels, sample_rate, block_align, bit_depth,
    fmt_body, data).  All ValueErrors of the walk live here so both
    entry points fail identically on malformed containers."""
    if (len(payload) < 12 or payload[:4] != b"RIFF"
            or payload[8:12] != b"WAVE"):
        raise ValueError("not a RIFF/WAVE payload")
    fmt_body = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + csize > len(payload):
            raise ValueError(
                f"truncated RIFF chunk {cid!r}: declares {csize} bytes, "
                f"{len(payload) - pos - 8} remain")
        body = payload[pos + 8:pos + 8 + csize]
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            data = body
            if fmt_body is not None:
                break                      # fmt precedes data per spec
        pos += 8 + csize + (csize & 1)     # chunks are word-aligned
    if fmt_body is None or data is None:
        raise ValueError("RIFF/WAVE payload missing fmt or data chunk")
    if len(fmt_body) < 16:
        raise ValueError(
            f"short fmt chunk: {len(fmt_body)} bytes, 16 required")
    (audio_format, n_channels, sample_rate, _byte_rate, block_align,
     bit_depth) = struct.unpack_from("<HHIIHH", fmt_body, 0)
    return (audio_format, n_channels, sample_rate, block_align,
            bit_depth, fmt_body, data)


def decode_wav(payload: bytes) -> dict:
    """Pure-Python RIFF WAV decode — a REAL container parse, no codec
    library: walks the RIFF chunk list (word-aligned, unknown chunks
    skipped, declared sizes validated against the remaining payload),
    reads the ``fmt `` descriptor, and decodes the ``data`` chunk for

    - integer PCM (format tag 1): 8-bit (unsigned, centered at 128)
      and 16-bit (signed little-endian) — exact integer statistics;
    - IEEE float (format tag 3): 32-bit little-endian — float
      statistics (exact when samples are dyadic rationals, as the
      synthetic corpus guarantees);
    - G.711 mu-law (format tag 7) and A-law (format tag 6): 8-bit
      log-companded telephony audio, expanded to 16-bit linear by
      ``mulaw_expand`` / ``alaw_expand`` (pure integer tables — no
      codec library) — exact integer statistics;
    - IMA/DVI ADPCM (format tag 0x11): 4-bit adaptive-delta codes
      decoded block-by-block via ``ima_adpcm_step`` (the genuinely
      SEQUENTIAL sample recurrence — predictor + step-index state
      carried code to code) — exact integer statistics.

    Returns container metadata plus per-payload sample statistics
    (frame count, sum, peak magnitude).  Remaining formats
    (extensible, floating tags other than f32) raise
    NotImplementedError: that is the compressed-codec boundary.  Malformed containers — a chunk whose
    declared size overruns the payload, or a short ``fmt `` body —
    raise ValueError so corrupt files fail loudly instead of yielding
    silently truncated statistics (ADVICE r9)."""
    (audio_format, n_channels, sample_rate, block_align, bit_depth,
     fmt_body, data) = _parse_wav(payload)
    import array
    if audio_format == 1 and bit_depth == 16:
        raw = data[:len(data) - (len(data) % 2)]
        if _np is not None:
            samples: "object" = _np.frombuffer(
                raw, dtype="<i2").astype(_np.int64)
        else:
            arr = array.array("h")
            arr.frombytes(raw)
            if sys.byteorder == "big":
                arr.byteswap()
            samples = arr
    elif audio_format == 1 and bit_depth == 8:
        samples = _lut_decode(data, _PCM8_LUT) \
            if _np is not None else [b - 128 for b in data]
    elif audio_format == 3 and bit_depth == 32:
        raw = data[:len(data) - (len(data) % 4)]
        if _np is not None:
            # float64 partials stay exact on the synthetic dyadic grid
            # under any summation order (ARCHITECTURE note 12)
            samples = _np.frombuffer(raw, dtype="<f4").astype(_np.float64)
        else:
            arr = array.array("f")
            arr.frombytes(raw)
            if sys.byteorder == "big":
                arr.byteswap()
            samples = arr
    elif audio_format == 7 and bit_depth == 8:
        samples = _lut_decode(data, _MULAW_LUT) \
            if _np is not None else [mulaw_expand(b) for b in data]
    elif audio_format == 6 and bit_depth == 8:
        samples = _lut_decode(data, _ALAW_LUT) \
            if _np is not None else [alaw_expand(b) for b in data]
    elif audio_format == 0x11 and bit_depth == 4:
        if block_align < 4:
            raise ValueError(
                f"ADPCM block align {block_align} smaller than the "
                "4-byte block header")
        spb = (struct.unpack_from("<H", fmt_body, 18)[0]
               if len(fmt_body) >= 20 else None)
        samples = _adpcm_decode_blocks(data, block_align, spb)
    else:
        raise NotImplementedError(
            f"WAV format tag {audio_format} at {bit_depth}-bit is outside "
            "the PCM-8/16, float32, mu-law/A-law and IMA-ADPCM decode "
            "paths; other formats need codec libraries not present in "
            "this environment")
    n_frames = len(samples) // max(n_channels, 1)
    is_float = audio_format == 3
    if _np is not None and isinstance(samples, _np.ndarray):
        total = samples.sum() if len(samples) else 0
        peak = _np.abs(samples).max() if len(samples) else 0
    else:
        total = sum(samples)
        peak = max((abs(s) for s in samples), default=0)
    return {
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "bit_depth": bit_depth,
        "audio_format": audio_format,
        "n_samples": n_frames,
        "sum_samples": (float if is_float else int)(total),
        "peak_abs": (float if is_float else int)(peak),
    }


def _adpcm_block_lanes(data: bytes, block_align: int,
                       samples_per_block: int | None) -> list:
    """One payload's data chunk as per-block decode LANES for the batch
    kernel: (pred0, idx0, kept-codes uint8 array, keep_pred).  The
    block walk, header validation and ``samples_per_block`` truncation
    are exactly _adpcm_decode_blocks' — truncating the CODES up front
    (kept samples = [pred0] + first spb-1 codes) replaces truncating
    the decoded output, which is equivalent because sample i depends
    only on codes 0..i."""
    lanes = []
    for off in range(0, len(data), block_align):
        block = data[off:off + block_align]
        if len(block) < 4:
            raise ValueError(
                f"short ADPCM block header: {len(block)} bytes, 4 required")
        (pred,) = struct.unpack_from("<h", block, 0)
        idx = block[2]
        if idx > 88:
            raise ValueError(f"ADPCM step index {idx} outside [0, 88]")
        packed = _np.frombuffer(block, dtype=_np.uint8, offset=4)
        codes = _np.empty(packed.size * 2, dtype=_np.uint8)
        codes[0::2] = packed & 0x0F
        codes[1::2] = packed >> 4
        if samples_per_block is not None:
            keep_pred = samples_per_block >= 1
            codes = codes[:max(samples_per_block - 1, 0)]
        else:
            keep_pred = True
        lanes.append((pred, idx, codes, keep_pred))
    return lanes


def _adpcm_run_lanes(lanes: list) -> tuple:
    """Advance EVERY lane one code per step with vectorized state
    (predictor, step-index) arrays — the IMA recurrence is sequential
    within a block but independent across blocks, so a batch of B
    blocks decodes in max(len) numpy steps instead of sum(len) Python
    steps.  Arithmetic is ima_adpcm_step's, int64 with the same clamps
    (table lookups + clip — bit-exact, no float anywhere).  Lanes are
    processed longest-first so each step only touches the still-active
    prefix.  Returns per-lane (n_samples, sum, peak) int64 arrays in
    input order."""
    n = len(lanes)
    zero = _np.zeros(0, dtype=_np.int64)
    if n == 0:
        return zero, zero, zero
    lens = _np.array([lane[2].size for lane in lanes], dtype=_np.int64)
    order = _np.argsort(-lens, kind="stable")
    lens_s = lens[order]
    maxlen = int(lens_s[0])
    codes2d = _np.zeros((n, maxlen), dtype=_np.uint8)
    for r, oi in enumerate(order):
        c = lanes[oi][2]
        codes2d[r, :c.size] = c
    preds = _np.array([lanes[oi][0] for oi in order], dtype=_np.int64)
    idxs = _np.array([lanes[oi][1] for oi in order], dtype=_np.int64)
    keep0 = _np.array([lanes[oi][3] for oi in order], dtype=bool)
    sums = _np.where(keep0, preds, 0)
    peaks = _np.where(keep0, _np.abs(preds), 0)
    # lanes are sorted by length desc, so the active prefix at step t
    # is the first (count of lens > t) rows
    asc = lens_s[::-1]
    for t in range(maxlen):
        k = n - int(_np.searchsorted(asc, t, side="right"))
        c = codes2d[:k, t]
        _np.clip(preds[:k] + _IMA_DIFF_LUT[idxs[:k], c],
                 -32768, 32767, out=preds[:k])
        _np.clip(idxs[:k] + _IMA_IDX_LUT[c], 0, 88, out=idxs[:k])
        sums[:k] += preds[:k]
        _np.maximum(peaks[:k], _np.abs(preds[:k]), out=peaks[:k])
    nsamp_s = keep0.astype(_np.int64) + lens_s
    out_n = _np.empty(n, dtype=_np.int64)
    out_s = _np.empty(n, dtype=_np.int64)
    out_p = _np.empty(n, dtype=_np.int64)
    out_n[order] = nsamp_s
    out_s[order] = sums
    out_p[order] = peaks
    return out_n, out_s, out_p


def decode_wav_batch(payloads) -> list:
    """decode_wav over a whole batch of payloads, returning one stats
    dict per payload in order.  Non-ADPCM formats already decode
    through per-payload numpy LUT/frombuffer kernels, so they just
    delegate; IMA ADPCM's per-CODE recurrence is instead advanced for
    ALL the batch's blocks together (_adpcm_run_lanes), which turns
    ~2 Python steps per byte into ~max-doc-length numpy steps per
    batch (guide §4.2: hand whole batches to vectorized native code).
    Bit-exact: same tables, same int arithmetic, same ValueErrors."""
    if _np is None:                        # pragma: no cover - no numpy
        return [decode_wav(p) for p in payloads]
    out: list = [None] * len(payloads)
    adpcm: list = []           # (payload row, n_channels, lane slice)
    all_lanes: list = []
    for i, payload in enumerate(payloads):
        (audio_format, n_channels, sample_rate, block_align, bit_depth,
         fmt_body, data) = _parse_wav(payload)
        if not (audio_format == 0x11 and bit_depth == 4):
            out[i] = decode_wav(payload)
            continue
        if block_align < 4:
            raise ValueError(
                f"ADPCM block align {block_align} smaller than the "
                "4-byte block header")
        spb = (struct.unpack_from("<H", fmt_body, 18)[0]
               if len(fmt_body) >= 20 else None)
        lanes = _adpcm_block_lanes(data, block_align, spb)
        lo = len(all_lanes)
        all_lanes.extend(lanes)
        adpcm.append((i, n_channels, lo, len(all_lanes)))
        out[i] = {
            "n_channels": n_channels,
            "sample_rate": sample_rate,
            "bit_depth": bit_depth,
            "audio_format": audio_format,
        }
    if adpcm:
        ln, ls, lp = _adpcm_run_lanes(all_lanes)
        for i, n_channels, lo, hi in adpcm:
            total_samples = int(ln[lo:hi].sum())
            out[i]["n_samples"] = total_samples // max(n_channels, 1)
            out[i]["sum_samples"] = int(ls[lo:hi].sum())
            out[i]["peak_abs"] = int(lp[lo:hi].max()) if hi > lo else 0
    return out


def encode_wav_pcm16(samples, sample_rate: int = 8000) -> bytes:
    """Canonical 44-byte-header mono PCM16 WAV container around an
    int16 sample sequence — the synthesizer the media tests and the
    fixture corpus use (stdlib ``wave`` produces byte-identical
    containers; the fixture test asserts that)."""
    import array
    arr = array.array("h", samples)
    if sys.byteorder == "big":
        arr.byteswap()
    return _wav_container(1, 16, arr.tobytes(), sample_rate)


def _wav_container(fmt_tag: int, bit_depth: int, data: bytes,
                   sample_rate: int) -> bytes:
    """Canonical 44-byte-header mono WAV container around raw sample
    bytes — shared by the three synthesizers below."""
    bytes_per = bit_depth // 8
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, fmt_tag, 1, sample_rate,
                          sample_rate * bytes_per, bytes_per, bit_depth)
            + b"data" + struct.pack("<I", len(data)) + data)


def encode_wav_float32(samples, sample_rate: int = 8000) -> bytes:
    """Mono IEEE-float32 WAV (format tag 3) around a float sequence —
    the fixture synthesizer for the float decode path."""
    import array
    arr = array.array("f", samples)
    if sys.byteorder == "big":
        arr.byteswap()
    return _wav_container(3, 32, arr.tobytes(), sample_rate)


def encode_wav_mulaw(codes: bytes, sample_rate: int = 8000) -> bytes:
    """Mono G.711 mu-law WAV (format tag 7) around raw 8-bit companded
    codes — every byte value 0-255 is a valid mu-law code."""
    return _wav_container(7, 8, bytes(codes), sample_rate)


def encode_wav_alaw(codes: bytes, sample_rate: int = 8000) -> bytes:
    """Mono G.711 A-law WAV (format tag 6) around raw 8-bit companded
    codes — every byte value 0-255 is a valid A-law code."""
    return _wav_container(6, 8, bytes(codes), sample_rate)


def encode_wav_adpcm(nibbles, sample_rate: int = 8000) -> bytes:
    """Mono IMA ADPCM WAV (format tag 0x11) around a raw 4-bit code
    sequence, as ONE block: 4-byte header (predictor 0, step index 0)
    + codes packed LOW nibble first (an odd count pads a 0 nibble that
    ``wSamplesPerBlock`` in the 20-byte fmt extension tells the
    decoder to drop).  The container is real — fmt carries the ADPCM
    cbSize/wSamplesPerBlock extension and nBlockAlign spans the whole
    block — so ``decode_wav`` exercises the genuine block walk."""
    nibbles = list(nibbles)
    if any(c < 0 or c > 15 for c in nibbles):
        raise ValueError("ADPCM codes must be 4-bit (0-15)")
    packed = bytearray()
    for i in range(0, len(nibbles) - 1, 2):
        packed.append(nibbles[i] | (nibbles[i + 1] << 4))
    if len(nibbles) % 2:
        packed.append(nibbles[-1])
    if nibbles:
        data = struct.pack("<hBB", 0, 0, 0) + bytes(packed)
    else:
        data = b""                       # empty payload: no block at all
    block_align = max(len(data), 4)
    samples_per_block = 1 + len(nibbles) if nibbles else 0
    byte_rate = (sample_rate * block_align
                 // max(samples_per_block, 1))
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, sample_rate, byte_rate,
                      block_align, 4, 2, samples_per_block)
    return (b"RIFF" + struct.pack("<I", 28 + len(fmt) + len(data))
            + b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def encode_wav_adpcm_bytes(bs: bytes, sample_rate: int = 8000) -> bytes:
    """``encode_wav_adpcm`` specialized to the nibble sequence
    (b & 0xF, b >> 4) of every byte of ``bs`` — the ADPCM synth
    corpus's encoding — without the per-byte nibble round-trip:
    packing low-nibble-first reassembles each original byte, so the
    block's code payload is ``bs`` verbatim.  Byte-identical output
    (pinned by test)."""
    if not bs:
        return encode_wav_adpcm([], sample_rate)
    data = struct.pack("<hBB", 0, 0, 0) + bs
    block_align = max(len(data), 4)
    samples_per_block = 1 + 2 * len(bs)
    byte_rate = sample_rate * block_align // samples_per_block
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, sample_rate, byte_rate,
                      block_align, 4, 2, samples_per_block)
    return (b"RIFF" + struct.pack("<I", 28 + len(fmt) + len(data))
            + b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


WAV_FEATURE_SCHEMA = ("doc_id bigint, n_channels bigint, "
                      "sample_rate bigint, bit_depth bigint, "
                      "n_samples bigint, sum_samples bigint, "
                      "peak_abs bigint")


WAV_FEATURE_SCHEMA_F64 = ("doc_id bigint, n_channels bigint, "
                          "sample_rate bigint, bit_depth bigint, "
                          "n_samples bigint, sum_samples double, "
                          "peak_abs double")


def decode_wav_features_f64(payloads: DataFrame) -> DataFrame:
    """Float-statistics twin of decode_wav_features for the IEEE-float
    decode path (sum/peak are doubles; exact when the samples are the
    synthetic corpus's dyadic rationals).  Same shape contract: Arrow-
    batched mapInPandas, one container parse per row, no shuffle."""

    def featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_channels", "sample_rate",
                                   "bit_depth", "n_samples", "sum_samples",
                                   "peak_abs")}
            metas = decode_wav_batch([bytes(p) for p in pdf["payload"]])
            for doc_id, m in zip(pdf["doc_id"], metas):
                out["doc_id"].append(doc_id)
                for k in ("n_channels", "sample_rate", "bit_depth",
                          "n_samples"):
                    out[k].append(m[k])
                out["sum_samples"].append(float(m["sum_samples"]))
                out["peak_abs"].append(float(m["peak_abs"]))
            yield pd.DataFrame(out)

    return payloads.mapInPandas(featurize, WAV_FEATURE_SCHEMA_F64)


def decode_wav_features(payloads: DataFrame) -> DataFrame:
    """REAL decode + featurize over a (doc_id, payload) frame of WAV
    bytes: Arrow-batched mapInPandas, one container parse per row,
    exact integer statistics out.  Same shape contract as
    extract_features — payload bytes never leave the executor, no
    shuffle, explicit schema."""

    def featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_channels", "sample_rate",
                                   "bit_depth", "n_samples", "sum_samples",
                                   "peak_abs")}
            metas = decode_wav_batch([bytes(p) for p in pdf["payload"]])
            for doc_id, m in zip(pdf["doc_id"], metas):
                out["doc_id"].append(doc_id)
                for k in ("n_channels", "sample_rate", "bit_depth",
                          "n_samples", "sum_samples", "peak_abs"):
                    out[k].append(m[k])
            yield pd.DataFrame(out)

    return payloads.mapInPandas(featurize, WAV_FEATURE_SCHEMA)


def extract_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched fake 'decode + featurize': byte length, a rolling
    checksum over the first 64 bytes, and the mean byte value.  Shape
    and plumbing match a real decoder (mapInPandas, explicit schema,
    one pass, no shuffle)."""

    def featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            payloads_b = pdf["payload"]
            byte_len = payloads_b.apply(len)
            checksum = payloads_b.apply(
                lambda b: sum((i + 1) * x for i, x in enumerate(b[:64])) % 997)
            mean_byte = payloads_b.apply(
                lambda b: (sum(b) / len(b)) if len(b) else 0.0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "byte_len": byte_len.astype("int64"),
                "checksum": checksum.astype("int64"),
                "mean_byte": mean_byte.astype("float64"),
            })

    return payloads.mapInPandas(featurize, FEATURE_SCHEMA)


FRAME_SCHEMA = ("doc_id bigint, frame_idx int, frame_bytes binary, "
                "frame_len int")


def sample_frames(payloads: DataFrame, frame_size: int = 64,
                  every_nth: int = 4) -> DataFrame:
    """Frame sampling over a binary payload: treat the payload as a
    sequence of fixed-size frames (the stand-in for video decode —
    a real decoder would emit actual frames here) and keep every Nth.

    Shape contract for the real thing: mapInPandas fan-OUT (one input
    row -> many frame rows), explicit output schema, frames never
    gathered to the driver; downstream per-frame featurization is
    another mapInPandas over the same partitioning — no shuffle between
    decode and featurize."""

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [],
                   "frame_len": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) + frame_size - 1) // frame_size
                for idx in range(0, n_frames, every_nth):
                    chunk = payload[idx * frame_size:(idx + 1) * frame_size]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(bytes(chunk))
                    out["frame_len"].append(len(chunk))
            yield pd.DataFrame(out)

    return (
        payloads.select("doc_id", "payload")
        .mapInPandas(frames, FRAME_SCHEMA)
    )


RESIZE_SCHEMA = ("doc_id bigint, orig_len int, target_len int, "
                 "resized_bytes binary")


def resize_media(payloads: DataFrame, target_len: int = 32) -> DataFrame:
    """Resize over a binary payload: deterministic nearest-neighbor
    downsample of the byte sequence to ``target_len`` bytes (the 1-D
    stand-in for image resize — a real decoder would map pixel grids
    here; payloads shorter than the target pass through unchanged).

    Shape contract for the real thing: mapInPandas 1-row-in → 1-row-out
    with a bounded output payload — the property that makes resize the
    FIRST stage of a media pipeline at 100 TB (every downstream stage
    reads target_len bytes per row, not raw media); no shuffle, output
    schema explicit, bytes never leave the executor."""

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "orig_len": [], "target_len": [],
                   "resized_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                if n <= target_len:
                    resized = bytes(payload)
                else:
                    # nearest-neighbor: sample index i maps to source
                    # byte floor(i * n / target_len)
                    resized = bytes(payload[(i * n) // target_len]
                                    for i in range(target_len))
                out["doc_id"].append(doc_id)
                out["orig_len"].append(n)
                out["target_len"].append(len(resized))
                out["resized_bytes"].append(resized)
            yield pd.DataFrame(out)

    return (payloads.select("doc_id", "payload")
            .mapInPandas(resize, RESIZE_SCHEMA))


# binaryFile schema is fixed by the source (needed explicitly for the
# streaming reader — file stream sources cannot infer).
BINARYFILE_SCHEMA = ("path string, modificationTime timestamp, "
                     "length bigint, content binary")


def _media_projection():
    """(path, modificationTime, length, content) -> the engine's media
    row: deterministic doc_id from the path hash, payload, typed meta."""
    return [
        F.xxhash64("path").alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.col("path"),
            F.lower(F.element_at(F.split("path", r"\."), -1)).alias("ext"),
            F.col("length"),
            F.col("modificationTime").alias("mtime"),
        ).alias("media_meta"),
    ]


def read_media_dir(spark, path: str, glob: str = "*",
                   recursive: bool = False) -> DataFrame:
    """Raw media ingestion via the ``binaryFile`` source: every file
    under ``path`` becomes one row (path, mtime, length, content) —
    projected to (doc_id, payload, media_meta) for the decode /
    resize / frame-sample operators above.

    This is how an image/audio corpus enters Spark at 100 TB: file
    reads happen executor-side (the driver only lists paths), payload
    bytes ride Arrow batches into mapInPandas stages without ever
    passing through Python row objects, and
    ``spark.sql.files.maxPartitionBytes`` governs how many files land
    in one task.  ``pathGlobFilter`` prunes by extension at listing
    time — non-matching files are never opened.  Caveat (asserted in
    tests): the source SKIPS zero-byte files, so placeholder empties
    need a manifest-side count if they must be accounted for."""
    return (spark.read.format("binaryFile")
            .option("pathGlobFilter", glob)
            .option("recursiveFileLookup", str(recursive).lower())
            .load(path)
            .select(*_media_projection()))


def stream_media_dir(spark, path: str, glob: str = "*",
                     max_files_per_trigger: int = 8) -> DataFrame:
    """Streaming twin of read_media_dir: the binaryFile source as a
    file STREAM — new media files are discovered per micro-batch and
    flow through the same (doc_id, payload, media_meta) projection, so
    the decode/featurize operators run identically in both modes (the
    batch/streaming parity rule the engine uses everywhere).  The
    fixed binaryFile schema is passed explicitly (file stream sources
    do not infer)."""
    return (spark.readStream.format("binaryFile")
            .schema(BINARYFILE_SCHEMA)
            .option("pathGlobFilter", glob)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .load(path)
            .select(*_media_projection()))
