"""On-disk corpus-artifact store (artifacts.py, VERDICT r6 item 2):
build-once/commit semantics, cross-session disk hits (no recompute),
fingerprint invalidation on source rewrite, and value equality between
the persisted artifact and a fresh derivation."""

from __future__ import annotations
import pytest

import json
import os
import shutil

from mental_health_bigdata_project_spark import artifacts

# Long-running parity/e2e/compaction tests: slow tier (r11; see
# pytest.ini) — the driver's default `pytest tests/ -x -q` gate
# outgrew its time budget (VERDICT r10 item 1); run with -m slow.
pytestmark = pytest.mark.slow



def _counting_build(df):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return df

    return calls, build


def test_read_or_build_builds_once_then_reads_disk(
        spark, sf_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "store"))
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    calls, build = _counting_build(src)

    a = artifacts.read_or_build(spark, sf_dir, "t_art", ("documents",),
                                build)
    assert calls["n"] == 1
    assert {(r.id, r.v) for r in a.collect()} == {(1, "a"), (2, "b")}
    # second call (fresh handle, same process stands in for a second
    # session): served from the committed snapshot, not recomputed
    b = artifacts.read_or_build(spark, sf_dir, "t_art", ("documents",),
                                build)
    assert calls["n"] == 1
    assert {(r.id, r.v) for r in b.collect()} == {(1, "a"), (2, "b")}
    # manifest committed exactly once
    adir = os.path.join(artifacts.artifact_root(),
                        artifacts._dataset_key(sf_dir), "t_art")
    with open(os.path.join(adir, "manifest.json")) as f:
        m = json.load(f)
    assert m["version"] == 1 and m["tables"] == ["documents"]


def test_fingerprint_invalidates_on_source_rewrite(
        spark, sf_dir, tmp_path, monkeypatch):
    """A rewritten source dataset must invalidate the artifact instead
    of silently serving stale rows — the staleness honesty rule."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "store"))
    data = str(tmp_path / "data")
    os.makedirs(data)
    shutil.copy(os.path.join(sf_dir, "documents.parquet"),
                os.path.join(data, "documents.parquet"))
    src = spark.createDataFrame([(1,)], "id bigint")
    calls, build = _counting_build(src)

    artifacts.read_or_build(spark, data, "t_fp", ("documents",), build)
    artifacts.read_or_build(spark, data, "t_fp", ("documents",), build)
    assert calls["n"] == 1
    # touch the source: mtime_ns changes -> fingerprint changes
    os.utime(os.path.join(data, "documents.parquet"))
    artifacts.read_or_build(spark, data, "t_fp", ("documents",), build)
    assert calls["n"] == 2
    adir = os.path.join(artifacts.artifact_root(),
                        artifacts._dataset_key(data), "t_fp")
    with open(os.path.join(adir, "manifest.json")) as f:
        m = json.load(f)
    assert m["version"] == 2
    # superseded snapshot garbage-collected
    vdirs = [d for d in os.listdir(adir) if d.startswith("_v")]
    assert vdirs == [m["dir"]]


def test_corpus_shingles_disk_artifact_matches_fresh(
        spark, sf_dir, tmp_path, monkeypatch):
    """The real corpus_shingles artifact: first call commits a
    snapshot; after the session memo is dropped (a new session), the
    next call reads the SAME committed version from disk and its rows
    equal a fresh un-memoized derivation."""
    from mental_health_bigdata_project_spark.plans import textops

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "store"))
    # session memos would otherwise serve the pre-monkeypatch handle
    textops._CORPUS_SHINGLES_MEMO.clear()
    try:
        first = textops.corpus_shingles(spark, sf_dir)
        adir = os.path.join(artifacts.artifact_root(),
                            artifacts._dataset_key(sf_dir),
                            "corpus_shingles")
        with open(os.path.join(adir, "manifest.json")) as f:
            v1 = json.load(f)["version"]

        textops._CORPUS_SHINGLES_MEMO.clear()   # "second session"
        second = textops.corpus_shingles(spark, sf_dir)
        with open(os.path.join(adir, "manifest.json")) as f:
            assert json.load(f)["version"] == v1   # read, not rebuilt

        fresh = textops.setsim_shingles(
            textops._docs(spark, sf_dir).select(
                "doc_id", textops.tokens_col().alias("toks")))
        assert second.count() == fresh.count()
        assert second.exceptAll(fresh).count() == 0
        assert fresh.exceptAll(second).count() == 0
        assert first.count() == second.count()
    finally:
        # drop handles into the tmp store so later tests rebuild
        # against the default root instead of a deleted directory
        textops._CORPUS_SHINGLES_MEMO.clear()
        textops._CORPUS_SETSIM_INDEX_MEMO.clear()


def test_recipe_version_bump_invalidates(spark, sf_dir, tmp_path,
                                         monkeypatch):
    """VERDICT r8 item 6: the source fingerprint catches DATA changes,
    but a changed BUILDER must also invalidate — a snapshot committed
    by recipe v1 may not be served to a caller running recipe v2 (same
    bytes in, different rows out).  Bumping recipe_version rebuilds;
    calling again at the same version serves the new snapshot; and a
    pre-versioning manifest (no recipe_version key) reads as v1."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "store"))
    src = spark.createDataFrame([(1, "a")], "id bigint, v string")
    calls, build = _counting_build(src)

    artifacts.read_or_build(spark, sf_dir, "t_ver", ("documents",), build,
                            recipe_version=1)
    artifacts.read_or_build(spark, sf_dir, "t_ver", ("documents",), build,
                            recipe_version=1)
    assert calls["n"] == 1
    # builder changed: v2 must NOT serve the v1 snapshot
    artifacts.read_or_build(spark, sf_dir, "t_ver", ("documents",), build,
                            recipe_version=2)
    assert calls["n"] == 2
    adir = os.path.join(artifacts.artifact_root(),
                        artifacts._dataset_key(sf_dir), "t_ver")
    with open(os.path.join(adir, "manifest.json")) as f:
        m = json.load(f)
    assert m["recipe_version"] == 2 and m["version"] == 2
    # steady state at v2: served from disk, no rebuild
    artifacts.read_or_build(spark, sf_dir, "t_ver", ("documents",), build,
                            recipe_version=2)
    assert calls["n"] == 2
    # legacy manifest without the key == version 1: v1 reads it, v2
    # rebuilds (the backward-compat contract for pre-r9 stores)
    del m["recipe_version"]
    with open(os.path.join(adir, "manifest.json"), "w") as f:
        json.dump(m, f)
    assert artifacts.read_artifact(spark, sf_dir, "t_ver", ("documents",),
                                   recipe_version=1) is not None
    assert artifacts.read_artifact(spark, sf_dir, "t_ver", ("documents",),
                                   recipe_version=2) is None


def test_upstream_delete_propagates_to_served_artifacts(
        spark, sf_dir, tmp_path, monkeypatch):
    """VERDICT r8 item 7: a doc deleted from the corpus must never
    appear in an artifact-backed result.  Policy (ARCHITECTURE.md
    'Upstream deletes'): corpus artifacts are REBUILT on source
    change — the manifest fingerprint covers every source file's
    (path, size, mtime), so a delete-rewrite invalidates each derived
    snapshot at its next read; no tombstone path is needed because
    the artifacts are pure functions of the current corpus bytes.
    This test proves it end to end on the real corpus_shingles
    artifact (the relation feeding every gram consumer)."""
    import pyarrow.parquet as pq

    from mental_health_bigdata_project_spark.plans import textops
    from mental_health_bigdata_project_spark.sources import tables

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "store"))
    data = str(tmp_path / "data")
    os.makedirs(data)
    shutil.copy(os.path.join(sf_dir, "documents.parquet"),
                os.path.join(data, "documents.parquet"))
    # the tmp corpus must take the artifact path (normally reserved for
    # the read-only testdata roots)
    monkeypatch.setattr(tables, "_MEMO_ROOTS",
                        tables._MEMO_ROOTS + (str(tmp_path),))

    def fresh_session_memos():
        # simulate a new session: drop every driver-side handle cache
        textops._CORPUS_SHINGLES_MEMO.clear()
        textops._CORPUS_SETSIM_INDEX_MEMO.clear()
        tables._TABLE_MEMO.clear()

    fresh_session_memos()
    try:
        first = textops.corpus_shingles(spark, data)
        victim = first.select("doc_id").agg({"doc_id": "min"}).collect()[0][0]
        assert first.filter(first.doc_id == victim).count() > 0
        adir = os.path.join(artifacts.artifact_root(),
                            artifacts._dataset_key(data), "corpus_shingles")
        with open(os.path.join(adir, "manifest.json")) as f:
            v1 = json.load(f)["version"]

        # upstream delete: rewrite documents.parquet without the victim
        src_path = os.path.join(data, "documents.parquet")
        import pyarrow.compute as pc
        t = pq.read_table(src_path)
        kept = t.filter(pc.field("doc_id") != victim)
        tmp_file = src_path + ".tmp"
        pq.write_table(kept, tmp_file)
        os.replace(tmp_file, src_path)

        fresh_session_memos()
        served = textops.corpus_shingles(spark, data)
        # the deleted doc is gone from the served artifact...
        assert served.filter(served.doc_id == victim).count() == 0
        # ...because the fingerprint mismatch forced a rebuild
        with open(os.path.join(adir, "manifest.json")) as f:
            assert json.load(f)["version"] == v1 + 1
    finally:
        fresh_session_memos()


def test_session_memo_weak_keyed():
    """SessionMemo entries die with their session object (ADVICE r6:
    plain dicts keyed on the session pinned stopped sessions and their
    checkpointed DataFrames for process lifetime)."""
    import gc

    class FakeSession:     # stands in for SparkSession (weakref-able)
        pass

    m = artifacts.SessionMemo()
    s = FakeSession()
    m.put(s, "k", "v")
    assert m.get(s, "k") == "v"
    assert len(m._store) == 1
    del s
    gc.collect()
    assert len(m._store) == 0


def test_crash_between_snapshot_and_manifest_leaves_no_half_commit(
        spark, sf_dir, tmp_path, monkeypatch):
    """VERDICT r7 item 7: a writer that dies AFTER writing its
    snapshot dir but BEFORE the manifest os.replace must be invisible
    — readers keep serving the previously committed version, a
    leftover manifest tmp file changes nothing, and the next
    read_or_build serves the committed snapshot without rebuilding."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "store"))
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    calls, build = _counting_build(src)
    artifacts.read_or_build(spark, sf_dir, "t_crash", ("documents",),
                            build)
    assert calls["n"] == 1
    adir = os.path.join(artifacts.artifact_root(),
                        artifacts._dataset_key(sf_dir), "t_crash")
    with open(os.path.join(adir, "manifest.json")) as f:
        committed = json.load(f)

    # the crash window: a second writer (pid 99999) wrote its snapshot
    # (even a DIFFERENT dataframe — simulating a racing session) and a
    # manifest tmp, then died before the atomic os.replace
    orphan = os.path.join(adir, "_v2-99999")
    spark.createDataFrame([(9, "z")], "id bigint, v string") \
        .write.mode("overwrite").parquet(orphan)
    with open(os.path.join(adir, "manifest.json.tmp.99999"), "w") as f:
        json.dump({"version": 2, "dir": "_v2-99999",
                   "fingerprint": "torn", "tables": ["documents"]}, f)

    # reader: still the committed version, rows untouched
    got = artifacts.read_artifact(spark, sf_dir, "t_crash",
                                  ("documents",))
    assert got is not None
    assert {(r.id, r.v) for r in got.collect()} == {(1, "a"), (2, "b")}
    with open(os.path.join(adir, "manifest.json")) as f:
        assert json.load(f) == committed
    # read_or_build: no rebuild either — the orphan never surfaces
    again = artifacts.read_or_build(spark, sf_dir, "t_crash",
                                    ("documents",), build)
    assert calls["n"] == 1
    assert {(r.id, r.v) for r in again.collect()} == {(1, "a"), (2, "b")}

    # a half-written (corrupt) manifest TMP also never breaks loads,
    # and a corrupt real manifest fails SAFE to a rebuild, not a torn
    # read of the orphan snapshot
    with open(os.path.join(adir, "manifest.json"), "w") as f:
        f.write('{"version": 2, "dir": "_v2')   # torn write
    assert artifacts.read_artifact(spark, sf_dir, "t_crash",
                                   ("documents",)) is None
    rebuilt = artifacts.read_or_build(spark, sf_dir, "t_crash",
                                      ("documents",), build)
    assert calls["n"] == 2
    assert {(r.id, r.v) for r in rebuilt.collect()} == {(1, "a"), (2, "b")}


def test_racing_writers_degrade_to_rebuild_never_torn(
        spark, sf_dir, tmp_path, monkeypatch):
    """Two sessions racing to build the same artifact (the documented
    single-writer-per-host assumption violated): last manifest commit
    wins, and if the loser's commit lands AFTER the winner's GC
    removed its snapshot dir, readers must degrade to a REBUILD — a
    manifest pointing at a missing directory returns None, never a
    torn read."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "store"))
    a = spark.createDataFrame([(1, "A")], "id bigint, v string")
    b = spark.createDataFrame([(2, "B")], "id bigint, v string")
    # writer A commits normally (version 2 dirs simulate the race)
    artifacts.write_artifact(a, sf_dir, "t_race", ("documents",))
    adir = os.path.join(artifacts.artifact_root(),
                        artifacts._dataset_key(sf_dir), "t_race")
    # writer B (stale: read version 1 like A did) wrote its snapshot,
    # then A's post-commit GC removed it, then B's manifest replace
    # lands anyway — the exact loser-after-GC interleaving
    with open(os.path.join(adir, "manifest.json")) as f:
        committed = json.load(f)
    loser_dir = "_v1-99999"
    b.write.mode("overwrite").parquet(os.path.join(adir, loser_dir))
    shutil.rmtree(os.path.join(adir, loser_dir))        # A's GC ran
    loser_manifest = dict(committed, dir=loser_dir)
    with open(os.path.join(adir, "manifest.json"), "w") as f:
        json.dump(loser_manifest, f)                    # B's commit
    # reader: missing snapshot -> None (no torn read, no exception)
    assert artifacts.read_artifact(spark, sf_dir, "t_race",
                                   ("documents",)) is None
    # read_or_build: degrades to a rebuild and re-commits cleanly
    calls, build = _counting_build(a)
    got = artifacts.read_or_build(spark, sf_dir, "t_race",
                                  ("documents",), build)
    assert calls["n"] == 1
    assert {(r.id, r.v) for r in got.collect()} == {(1, "A")}
    with open(os.path.join(adir, "manifest.json")) as f:
        m = json.load(f)
    assert os.path.isdir(os.path.join(adir, m["dir"]))
