"""[EXT] Multimodal-column plumbing (SURVEY.md north star).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata.  The decode/feature-extract step is a deterministic fake
(this container has no image/audio libraries — see ``operators.media``),
but the Spark-side plumbing is real: binary columns, Arrow-batched
mapInPandas with an explicit output schema, and partition-preserving
one-pass plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

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


@query("multimodal_features")  # rows-only: fake feature vector, no SQL twin
def multimodal_features(spark, sf_dir):
    """Full fake-decode feature row (byte_len, checksum, mean_byte) —
    the shape a real image/audio featurizer would return."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_binary_payload(docs))
