"""[EXT] Python UDTF + pandas UDAF surface (SURVEY.md §2.8: the
reference ships no UDAF/UDTF; these complete the planned UDF triad).

Two operators the built-in function library genuinely can't express:

- ``chunk_documents``: a *table* function — one document row fans out
  into N overlapping fixed-size token windows.  This is the canonical
  LLM training-data chunker (context-window packing with stride
  overlap); at 100 TB it is the row-multiplying step between raw
  corpus and tokenized training shards.  Implemented as a Spark 4
  Python UDTF consumed via ``LATERAL`` — per-row Python, but a UDTF is
  the right tool precisely when output cardinality is data-dependent.
- ``geomean``: a GROUPED_AGG ``pandas_udf`` (Arrow-batched UDAF) — the
  per-group geometric mean.  Spark has no built-in geometric mean; the
  UDAF receives each group's column as one pandas Series (no
  per-row Python), the 10-100x-over-row-UDF path SNIPPETS.md documents.

Both are deterministic, so both carry full DuckDB oracles — the UDTF's
twin reproduces the chunk fan-out with list slicing over
``unnest(generate_series(...))``.

Scale posture: the UDTF is embarrassingly parallel (no shuffle — chunk
rows inherit the input partitioning); the UDAF shuffles once on the
group key like any aggregate.  Chunk parameters (30-token windows,
stride 25) are literals in both twins.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from ..sources import register_temp_views
from .registry import EVENTS_TS, query

CHUNK_SIZE = 30
STRIDE = 25  # chunk_size - overlap(5)


@udtf(returnType="chunk_idx int, chunk string, n_tokens int", useArrow=True)
class ChunkDoc:
    """Sliding-window token chunker: yields ``ceil(n_tokens/stride)``
    overlapping windows per document; the final window may be short.
    Mirrors the truncation discipline of the reference pipeline
    (kafka_consumer_simple.py:131,138: bound output size, never drop
    the row)."""

    def eval(self, text: str, chunk_size: int, stride: int):
        toks = text.split(" ") if text else []
        start, idx = 0, 0
        while start < len(toks):
            piece = toks[start:start + chunk_size]
            yield idx, " ".join(piece), len(piece)
            idx += 1
            start += stride


@query("udtf_chunk_documents", f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    c AS (SELECT doc_id, toks,
                 unnest(generate_series(0,
                     CAST(ceil(len(toks) / {STRIDE}.0) AS INT) - 1)) AS chunk_idx
          FROM t)
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           array_to_string(
               toks[chunk_idx * {STRIDE} + 1 : chunk_idx * {STRIDE} + {CHUNK_SIZE}],
               ' ') AS chunk,
           CAST(len(toks[chunk_idx * {STRIDE} + 1 : chunk_idx * {STRIDE} + {CHUNK_SIZE}])
                AS INTEGER) AS n_tokens
    FROM c
""")
def udtf_chunk_documents(spark, sf_dir):
    """documents -> overlapping 30-token chunks with stride 25 via the
    registered UDTF in a LATERAL join."""
    register_temp_views(spark, sf_dir, ["documents"])
    spark.udtf.register("chunk_doc", ChunkDoc)
    return spark.sql(f"""
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM documents d, LATERAL chunk_doc(d.text, {CHUNK_SIZE}, {STRIDE}) c
    """)


@query("udaf_geomean_chars", """
    SELECT lang, round(exp(avg(ln(n_chars))), 6) AS gm_chars
    FROM documents GROUP BY lang
""")
def udaf_geomean_chars(spark, sf_dir):
    """Per-language geometric mean of document length via a GROUPED_AGG
    pandas UDAF (exp of the mean log).  Rounded to 6 dp on both sides:
    log-sum ordering differs under parallel merge, the transcendental
    rule from plans.registry applies."""
    from ..sources import load_table

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v).mean()))

    docs = load_table(spark, sf_dir, "documents")
    return (docs.groupBy("lang")
            .agg(F.round(geomean(F.col("n_chars").cast("double")), 6)
                 .alias("gm_chars")))


@udtf
class UnpackProps:
    """POLYMORPHIC UDTF: output schema is computed at *analyze time*
    from the constant keys argument — one generic unpacker serves any
    requested projection of a JSON props bag, and Catalyst sees real
    named columns (prunable, filterable) instead of a map blob.
    """

    @staticmethod
    def analyze(props, keys):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        schema = StructType()
        for k in keys.value:
            schema = schema.add(k, StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, props, keys):
        import json as _json

        d = _json.loads(props) if props else {}
        yield tuple(None if d.get(k) is None else str(d[k]) for k in keys)


@query("udtf_unpack_props", """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k,
           CAST(NULL AS VARCHAR) AS absent
    FROM events
""")
def udtf_unpack_props(spark, sf_dir):
    """events.props unpacked by the polymorphic UDTF; requesting a key
    the bag doesn't have ('absent') yields a typed NULL column — the
    schema came from analyze(), not from a fixed declaration."""
    register_temp_views(spark, sf_dir, ["events"])
    spark.udtf.register("unpack_props", UnpackProps)
    return spark.sql("""
        SELECT e.event_id, u.k, u.absent
        FROM events e, LATERAL unpack_props(e.props, array('k', 'absent')) u
    """)


@query("text_token_count_iter", """
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
                AS INTEGER) AS bpe_tokens
    FROM documents
""")
def text_token_count_iter(spark, sf_dir):
    """Iterator-form pandas UDF (Iterator[Series] -> Iterator[Series]):
    the compiled tokenizer — stand-in for any expensive model object —
    is built ONCE per partition, then reused across every Arrow batch.
    This is the init-once inference pattern for Pandas-UDF feature
    extraction at scale (tokenizers, ONNX sessions, embedding models);
    the scalar (non-iterator) form would re-enter per batch with no
    hook for shared setup.  Values match text_token_count's native
    bpe_tokens column exactly."""
    import re

    from ..sources import load_table
    from .textops import BPE_ISH_PATTERN

    @pandas_udf("int")
    def bpe_count(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        pat = re.compile(BPE_ISH_PATTERN)  # per-partition init, not per batch
        for s in batches:
            yield s.str.lower().str.findall(pat).str.len().astype("int32")

    return (load_table(spark, sf_dir, "documents")
            .select("doc_id", bpe_count("text").alias("bpe_tokens")))


@query("grouped_iqr_arrow", f"""
    SELECT event_type,
           quantile_disc(value, 0.25) AS q1,
           quantile_disc(value, 0.75) AS q3,
           quantile_disc(value, 0.75) - quantile_disc(value, 0.25) AS iqr
    FROM {EVENTS_TS} GROUP BY event_type
""")
def grouped_iqr_arrow(spark, sf_dir):
    """Per-group interquartile range via ``applyInArrow`` — the
    zero-pandas grouped-map surface (each group arrives as a raw
    ``pyarrow.Table``; no pandas Series materialization, no index
    bookkeeping).  The discrete-percentile convention matches
    percentile_disc/quantile_disc on both engines: sort ascending, take
    the element at ceil(q*n)-1 — an OBSERVED value, so results are
    bit-identical cross-engine and the IQR is one deterministic double
    subtraction (see agg_percentile_disc).

    applyInArrow is the right surface when per-group logic needs an
    order-statistics library call (here: arrow-native sort+take) but
    the payload should stay columnar end to end; at 100 TB it costs the
    same single group-key shuffle as any aggregate, with Arrow batches
    crossing the Python boundary once per group."""
    import math

    import pyarrow as pa
    import pyarrow.compute as pc

    from ..sources import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")

    def iqr(table: pa.Table) -> pa.Table:
        vals = pc.array_sort_indices(table.column("value"))
        sorted_v = table.column("value").take(vals)
        n = len(sorted_v)
        q1 = sorted_v[max(0, math.ceil(0.25 * n) - 1)].as_py()
        q3 = sorted_v[max(0, math.ceil(0.75 * n) - 1)].as_py()
        return pa.table({
            "event_type": [table.column("event_type")[0].as_py()],
            "q1": pa.array([q1], pa.float64()),
            "q3": pa.array([q3], pa.float64()),
            "iqr": pa.array([q3 - q1], pa.float64()),
        })

    return ev.groupBy("event_type").applyInArrow(
        iqr, "event_type string, q1 double, q3 double, iqr double")
