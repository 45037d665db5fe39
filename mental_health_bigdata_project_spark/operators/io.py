"""Columnar sinks — the scale-path replacement for the reference's
rewrite-the-world JSON sink (kafka_consumer_simple.py:49-61,146;
SURVEY.md §4.1 anti-patterns).

At 100 TB the retained table is a partitioned parquet (or Delta) layout
written once per micro-batch/job; "latest N" is a *query* over it, not
a file rewrite.  Partition columns are chosen low-cardinality (e.g.
lang / date) so partition pruning works and small-file pressure stays
bounded; writers repartition by the partition key first so each task
writes one file per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_partitioned(df: DataFrame, out_dir: str, partition_by: list[str],
                      mode: str = "overwrite") -> None:
    """Partitioned parquet write; pre-repartition on the partition keys
    so each partition directory gets one file per shuffle partition
    instead of one per input task (the small-files fix)."""
    (
        df.repartition(*[F.col(c) for c in partition_by])
        .write.mode(mode).partitionBy(*partition_by).parquet(out_dir)
    )


def read_partitioned(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)


def latest_n(df: DataFrame, order_col: str, tiebreak_col: str, n: int) -> DataFrame:
    """'Most recent N' as a query (TakeOrderedAndProject — per-partition
    top-N then driver merge of N rows) instead of a maintained file."""
    return df.orderBy(F.desc(order_col), F.desc(tiebreak_col)).limit(n)


def write_bucketed(df: DataFrame, table_name: str, bucket_col: str,
                   n_buckets: int = 16, sort_col: str | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed (hash-clustered) table write: rows are hash-partitioned
    on ``bucket_col`` into ``n_buckets`` files per write task, and the
    bucketing spec is recorded in the catalog.

    This is the co-located-join primitive at 100 TB: two facts bucketed
    on the same key with the same bucket count join WITHOUT either side
    shuffling (SortMergeJoin reads bucket i against bucket i), and a
    groupBy on the bucket key skips its exchange too.  The shuffle is
    paid ONCE at write time instead of per query."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def join_bucketed(spark: SparkSession, left_table: str, right_table: str,
                  on: str) -> DataFrame:
    """Join two same-spec bucketed tables on their bucket key: with
    bucketing aligned, the plan contains no Exchange on either side
    (asserted in tests/test_sources_io.py)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def write_csv(df: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    """CSV sink with header; the interchange format for downstream
    non-Spark consumers.  Timestamps serialize ISO-8601 so a re-read
    round-trips (see read_csv)."""
    (df.write.mode(mode).option("header", "true")
     .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
     .csv(out_dir))


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Schema-checked CSV read (explicit schema: inference costs a full
    extra pass over the data at scale and can mis-type columns)."""
    r = (spark.read.option("header", "true")
         .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def write_xml(df: DataFrame, out_dir: str, row_tag: str = "post",
              mode: str = "overwrite") -> None:
    """XML sink via the Spark-4 built-in xml source (no external
    package): one element per row under ``row_tag``.  Interchange
    format for XML-speaking consumers; same distributed write path as
    every other file sink (one file per task, no driver funnel)."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(out_dir)


def read_xml(spark: SparkSession, path: str, row_tag: str = "post",
             schema=None) -> DataFrame:
    """Schema-checked XML read.  As with CSV, pass an explicit schema
    at scale — inference is an extra full pass."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def write_orc(df: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    """ORC sink (built-in columnar alternative to parquet, common in
    Hive-era lakes).  Same predicate-pushdown / column-pruning story as
    parquet: ORC carries min/max stats and bloom-filterable stripes, so
    engine queries over an ORC lake keep their scan-side pruning."""
    df.write.mode(mode).format("orc").save(out_dir)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan; schema comes from file metadata (self-describing, no
    inference pass needed, unlike CSV/XML)."""
    return spark.read.format("orc").load(path)


def compact_small_files(spark: SparkSession, in_dir: str, out_dir: str,
                        rows_per_file: int) -> int:
    """The small-files maintenance pass: rewrite a directory of many
    tiny parquet files into ~``ceil(n / rows_per_file)`` right-sized
    ones, returning the output file count.

    At 100 TB the small-files problem is an ingest-side inevitability
    (every streaming epoch or upsert snapshot emits one file per task);
    unchecked, scan planning degrades to millions of footer reads and
    task-per-tiny-file scheduling.  Compaction here is a full shuffle-
    free rewrite: ``coalesce`` (not ``repartition``) merges input
    splits without an exchange, and ``maxRecordsPerFile`` caps any
    residual imbalance.  Run it per-partition-directory in production
    so only cold partitions rewrite."""
    import math

    df = spark.read.parquet(in_dir)
    n = df.count()
    files = max(1, math.ceil(n / rows_per_file))
    (df.coalesce(files)
     .write.mode("overwrite")
     .option("maxRecordsPerFile", rows_per_file)
     .parquet(out_dir))
    return len([f for f in spark.read.parquet(out_dir).inputFiles()])


def merge_upsert(existing: DataFrame, updates: DataFrame,
                 key_cols: list[str]) -> DataFrame:
    """Key-based upsert plan: rows of ``existing`` whose key appears in
    ``updates`` are replaced, new keys are appended — the incremental
    corpus-refresh primitive (MERGE INTO without a table format: compute
    the merged relation, then atomically overwrite or write a new
    snapshot dir).

    Precondition: ``updates`` must be key-unique — like MERGE INTO,
    multiple source rows per key are invalid (they would all survive
    the union and break the snapshot's key invariant); dedupe upstream
    with an explicit survivor rule first.

    Plan shape: one left-anti join (existing minus updated keys) + a
    unionByName — a single shuffle on the key.  At 100 TB pair this
    with partitioned layouts so only touched partitions rewrite
    (dynamic partition overwrite), not the world."""
    survivors = existing.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti")
    return survivors.unionByName(updates)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution-aware parquet read: snapshots written over time
    gain columns; mergeSchema unions all file schemas (older files
    yield NULL for later columns).  Costs a footer read per file at
    planning — acceptable for corpus snapshots, so it is opt-in here
    rather than the session default (at 100 TB prefer a declared
    unified schema via .schema(...) once the layout stabilizes)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def zorder_key(cols: list[str], bits: int = 16):
    """Morton (Z-order) interleaved-bit key over 2+ integer columns —
    multi-dimensional clustering for data skipping.  Each input is
    masked to ``bits`` low bits and its bits are interleaved round-robin
    (col0 bit0, col1 bit0, col0 bit1, ...), so files/row-groups sorted
    by the key stay tight in EVERY dimension at once: parquet min/max
    stats then prune scans filtered on ANY of the clustered columns,
    not just the primary sort column (Delta/Iceberg OPTIMIZE ZORDER is
    this exact layout trick).  Built entirely from native shiftleft /
    shiftright / bitwise-& expressions — JVM-side, codegen'd, no UDF.

    Caller maps values into [0, 2^bits) first (rank/bucketize skewed
    domains; raw values are fine for dense surrogate keys)."""
    from functools import reduce

    import pyspark.sql.functions as F

    def bit(c: str, i: int):
        return F.shiftright(F.col(c).cast("long"), i).bitwiseAND(F.lit(1))

    terms = [
        F.shiftleft(bit(c, i), i * len(cols) + j)
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def write_zordered(df: DataFrame, out_dir: str, cols: list[str],
                   bits: int = 16, files: int = 16,
                   options: dict | None = None) -> None:
    """Write parquet clustered by the Z-order key of ``cols``:
    repartitionByRange on the key (one range shuffle — balanced files
    regardless of key skew) then a within-partition sort.  The key
    itself is dropped from the output; its effect lives in the file
    layout.  At 100 TB this is the maintenance/compaction pass that
    makes selective multi-column scans cheap: pruning happens at file
    AND row-group granularity via min/max stats with zero read-path
    cooperation (any parquet reader benefits).

    Each column is first affinely mapped onto the full [0, 2^bits)
    domain so every dimension contributes the SAME significant bit
    positions to the interleave — raw values with unequal ranges would
    let the wide column's high bits dominate the sort and starve the
    narrow column of clustering.  The min/max pass is a metadata-cheap
    aggregate (at 100 TB: read it from table stats instead)."""
    import pyspark.sql.functions as F

    lo_hi = df.agg(*[f for c in cols
                     for f in (F.min(c).alias(f"lo_{c}"),
                               F.max(c).alias(f"hi_{c}"))]).first()
    top = (1 << bits) - 1
    scaled = [
        F.when(F.lit(lo_hi[f"hi_{c}"]) == F.lit(lo_hi[f"lo_{c}"]), F.lit(0))
        .otherwise(((F.col(c).cast("double") - F.lit(lo_hi[f"lo_{c}"]))
                    * top / (lo_hi[f"hi_{c}"] - lo_hi[f"lo_{c}"]))
                   .cast("long"))
        .alias(f"__z_{c}")
        for c in cols
    ]
    keyed = df.select("*", *scaled).withColumn(
        "__zkey", zorder_key([f"__z_{c}" for c in cols], bits))
    writer = (keyed.repartitionByRange(files, "__zkey")
              .sortWithinPartitions("__zkey")
              .drop("__zkey", *[f"__z_{c}" for c in cols])
              .write.mode("overwrite"))
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(out_dir)


class BloomFileIndex:
    """Per-file Bloom filters over a point-lookup column — a secondary
    data-skipping index for HIGH-CARDINALITY columns where min/max
    stats can't help (unsorted ids: every file's [min,max] spans the
    domain, but each file holds only its own keys).  ``candidate_files``
    answers "which files might contain this key" with the Bloom
    guarantee: no false negatives, ~(1-e^(-kn/m))^k false positives —
    so a point lookup reads ~1 file instead of all of them, with zero
    layout change (complements write_zordered, which needs sort
    ownership).

    The k bit positions come from xxhash64(value, seed) % m evaluated
    IN SPARK (both at build and at probe — a 1-row job touching no
    files), so hashing is engine-native and the build is one
    distributed aggregation; nothing row-sized reaches the driver."""

    def __init__(self, col: str, m_bits: int, seeds: list[int],
                 file_bits: dict):
        self.col = col
        self.m_bits = m_bits
        self.seeds = seeds
        self.file_bits = file_bits      # file_path -> set of set bit idxs

    def _positions(self, spark: SparkSession, value) -> list[int]:
        probe = spark.createDataFrame([(value,)], [self.col])
        row = probe.select(*[
            (F.pmod(F.xxhash64(F.col(self.col), F.lit(s)), F.lit(self.m_bits)))
            .alias(f"p{i}") for i, s in enumerate(self.seeds)]).first()
        return [row[f"p{i}"] for i in range(len(self.seeds))]

    def candidate_files(self, spark: SparkSession, value) -> list[str]:
        pos = self._positions(spark, value)
        return [f for f, bits in self.file_bits.items()
                if all(p in bits for p in pos)]


def build_bloom_index(spark: SparkSession, path: str, col: str,
                      m_bits: int = 1 << 17, k: int = 5) -> BloomFileIndex:
    """Build a BloomFileIndex for ``col`` over a parquet directory in
    ONE distributed pass: every row emits its k bit positions tagged
    with the owning file (hidden ``_metadata.file_path``), and the
    per-file distinct position sets — kilobytes per file at any row
    count — are all that reaches the driver.  At 100 TB persist each
    set as a sidecar next to its file (built in the same write job)
    and consult it at plan time the way read_bloom_pruned does."""
    seeds = list(range(1, k + 1))
    df = spark.read.parquet(path)
    bits = (df.select(F.col(col),
                      F.col("_metadata.file_path").alias("f"))
            .select("f", F.explode(F.array(*[
                F.pmod(F.xxhash64(F.col(col), F.lit(s)), F.lit(m_bits))
                for s in seeds])).alias("pos"))
            .groupBy("f").agg(F.collect_set("pos").alias("bits"))
            .collect())
    return BloomFileIndex(col, m_bits, seeds,
                          {r["f"]: set(r["bits"]) for r in bits})


def read_bloom_pruned(spark: SparkSession, path: str,
                      index: BloomFileIndex, value) -> DataFrame:
    """Point lookup through the Bloom index: scan only candidate files
    (no false negatives => result equals the full scan's)."""
    cand = index.candidate_files(spark, value)
    if not cand:
        return (spark.read.parquet(path)
                .filter(F.lit(False))
                .filter(F.col(index.col) == value))
    return (spark.read.parquet(*cand)
            .filter(F.col(index.col) == value))
