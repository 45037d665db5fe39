"""Semantic tests for the round-2 curation operators: C4-style chunk
rewrite (dedup_chunk_rewrite), the Gopher rule battery
(text_gopher_rules), and the ANN recall harness (sim_ann_recall_eval).
Value-parity vs DuckDB is scripts/check_oracles.py; these pin the
*semantics* on hand-built corpora."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.plans import QUERIES

# Long-running parity/e2e/compaction tests: slow tier (r11; see
# pytest.ini) — the driver's default `pytest tests/ -x -q` gate
# outgrew its time budget (VERDICT r10 item 1); run with -m slow.
pytestmark = pytest.mark.slow


# three distinct 30-token blocks (chunk size = 30)
BLOCK_A = " ".join(f"alpha{i}" for i in range(30))
BLOCK_B = " ".join(f"beta{i}" for i in range(30))
BLOCK_C = " ".join(f"gamma{i}" for i in range(30))


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint")
    d = str(tmp_path / "docs")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_chunk_rewrite_keeps_first_occurrence_only(spark, tmp_path):
    d = _write_docs(spark, tmp_path, [
        (1, BLOCK_A + " " + BLOCK_B),   # A@doc1 is the first occurrence
        (2, BLOCK_A + " " + BLOCK_C),   # A here is a later copy -> dropped
        (3, BLOCK_A),                   # wholly duplicated -> empty rewrite
    ])
    out = {r["doc_id"]: r for r in
           QUERIES["dedup_chunk_rewrite"](spark, d).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["text_rewritten"] == BLOCK_A + " " + BLOCK_B
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["text_rewritten"] == BLOCK_C
    assert out[3]["n_chunks"] == 1 and out[3]["n_kept"] == 0
    assert out[3]["text_rewritten"] == ""


def test_chunk_rewrite_partial_tail_chunk_participates(spark, tmp_path):
    # a <30-token tail is its own chunk; identical tails dedup too
    tail = "tail x y z"
    d = _write_docs(spark, tmp_path, [
        (1, BLOCK_A + " " + tail),
        (2, BLOCK_B + " " + tail),
    ])
    out = {r["doc_id"]: r for r in
           QUERIES["dedup_chunk_rewrite"](spark, d).collect()}
    assert out[1]["text_rewritten"] == BLOCK_A + " " + tail
    assert out[2]["text_rewritten"] == BLOCK_B  # tail already seen in doc 1


GOOD = ("the quick brown fox jumps over the lazy dog and runs to be with "
        "that other fox which have seen many things over long seasons of "
        "hunting across wide open fields while keeping careful watch for "
        "hawks and wolves that roam these lands seeking easy prey among "
        "smaller creatures hiding in tall grass near quiet streams")


def test_gopher_rules_pass_and_fail_cases(spark, tmp_path):
    d = _write_docs(spark, tmp_path, [
        (1, GOOD),                                  # passes everything
        (2, "too short to be a document"),          # fails word count
        (3, " ".join(["42"] * 30 + ["the to of and that be with have"])),
        (4, GOOD + " " + " ".join(["..."] * 20)),   # symbol-heavy
        (5, " ".join(["the"] * 30) + " " + GOOD),   # top-token dominated
    ])
    out = {r["doc_id"]: r for r in
           QUERIES["text_gopher_rules"](spark, d).collect()}
    g = out[1]
    assert g["keep"] and all(g[r] for r in (
        "r_word_count", "r_mean_word_len", "r_alpha_words",
        "r_stopwords", "r_symbol_ratio", "r_top_token"))
    assert not out[2]["r_word_count"] and not out[2]["keep"]
    assert not out[3]["r_alpha_words"] and not out[3]["keep"]
    assert not out[4]["r_symbol_ratio"] and not out[4]["keep"]
    assert not out[5]["r_top_token"] and not out[5]["keep"]
    # metrics are self-consistent
    doc5_toks = (" ".join(["the"] * 30) + " " + GOOD).split()
    top_n = max(doc5_toks.count(t) for t in set(doc5_toks))
    assert out[5]["top_token_frac"] == pytest.approx(
        top_n / len(doc5_toks), abs=1e-6)


def test_ann_recall_eval_real_corpus_bounds(spark, sf_dir):
    rows = QUERIES["sim_ann_recall_eval"](spark, sf_dir).collect()
    assert len(rows) == 8  # one eval row per query vector, none dropped
    for r in rows:
        assert 0 <= r["hits"] <= 10
        assert r["recall_at_10"] == pytest.approx(r["hits"] / 10.0)
        assert r["n_candidates"] >= r["hits"]


def test_ann_recall_is_perfect_when_cell_covers_corpus(spark, tmp_path):
    # every vector strictly positive -> single sign cell -> ANN == exact
    rows = [(i, [0.1 + 0.01 * ((i * 7 + j) % 13) for j in range(8)], 0)
            for i in range(12)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
    d = str(tmp_path / "emb")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    out = QUERIES["sim_ann_recall_eval"](spark, d).collect()
    assert len(out) == 8
    assert all(r["recall_at_10"] == pytest.approx(1.0) and r["hits"] == 10
               for r in out)


TEXT_X = " ".join(f"tok{i}" for i in range(40))
# near-dup of X: same 3-gram shingles except near the tail
TEXT_X2 = " ".join(f"tok{i}" for i in range(38))


def test_survivor_select_keeps_longest_per_cluster(spark, tmp_path):
    d = _write_docs(spark, tmp_path, [
        (1, TEXT_X),        # near-dup pair {1, 2}: 1 is longer -> survives
        (2, TEXT_X2),
        (7, BLOCK_C),       # singleton
    ])
    out = {r["doc_id"]: r for r in
           QUERIES["dedup_survivor_select"](spark, d).collect()}
    assert set(out) == {1, 7}
    assert out[1]["was_clustered"] and out[1]["cluster_id"] == 1
    assert not out[7]["was_clustered"] and out[7]["cluster_id"] == 7


def test_shard_shuffle_is_deterministic_partition(spark, sf_dir):
    q = QUERIES["corpus_shard_shuffle"]
    a = sorted(map(tuple, q(spark, sf_dir).collect()))
    b = sorted(map(tuple, q(spark, sf_dir).collect()))
    assert a == b  # seeded, not rand(): identical across runs
    rows = a
    n_docs = len(rows)
    assert len({r[0] for r in rows}) == n_docs  # every doc exactly once
    # positions within each shard are 1..n_shard with no gaps
    from collections import defaultdict
    by_shard = defaultdict(list)
    for doc_id, shard, pos in rows:
        assert 0 <= shard < 8
        by_shard[shard].append(pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_mixture_token_budget_recipe_consistency(spark, sf_dir):
    rows = QUERIES["mixture_token_budget"](spark, sf_dir).collect()
    assert rows
    assert sum(r["target_weight"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    for r in rows:
        assert 0.0 < r["sample_rate"] <= 1.0
        expect = min(r["target_tokens"], float(r["tokens_avail"]))
        assert r["achieved_tokens"] == pytest.approx(expect, rel=1e-4)


def test_decontam_embedding_flags_exact_copy(spark, tmp_path):
    base = [0.5, -0.25, 0.125, 0.75, -0.5, 0.3, -0.1, 0.2]
    flipped = [-x for x in base]  # different sign cell -> never a candidate
    rows = ([(0, base, 0)]                       # benchmark
            + [(100, base, 0), (101, flipped, 0)])  # corpus
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
    d = str(tmp_path / "emb")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    out = {r["vec_id"]: r for r in
           QUERIES["decontam_embedding_cells"](spark, d).collect()}
    assert set(out) == {100}
    assert out[100]["best_bench_id"] == 0
    assert out[100]["best_cosine"] == pytest.approx(1.0)
    assert out[100]["n_matches"] == 1


def _plan(spark, sf_dir, qid):
    df = QUERIES[qid](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    return p.split("== Initial Plan ==")[0]


def test_gopher_rules_plan_is_shuffle_free(spark, sf_dir):
    p = _plan(spark, sf_dir, "text_gopher_rules")
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p


def test_chunk_rewrite_plan_has_exactly_two_shuffles(spark, sf_dir):
    # fp-partials agg + doc_id regroup; the first-occurrence rule must
    # be the skew-safe min(struct) aggregate, never a window (a hot
    # boilerplate fp would pile into one un-splittable sort partition)
    p = _plan(spark, sf_dir, "dedup_chunk_rewrite")
    assert p.count("Exchange hashpartitioning") == 2, p
    assert "Exchange SinglePartition" not in p
    assert "Window" not in p, p
    assert "BatchEvalPython" not in p


def test_shard_shuffle_plan_partitions_by_shard_only(spark, sf_dir):
    p = _plan(spark, sf_dir, "corpus_shard_shuffle")
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Exchange SinglePartition" not in p


def test_recall_eval_uses_window_group_limit(spark, sf_dir):
    # rank-limit pushdown: per-partition top-k BEFORE the qid shuffle,
    # so the corpus-sized scored relation is never fully shuffled
    p = _plan(spark, sf_dir, "sim_ann_recall_eval")
    assert "WindowGroupLimit" in p, p
    assert "SortMergeJoin" not in p  # all small sides broadcast


def test_assign_contiguous_ids_is_dense_permutation(spark, sf_dir):
    rows = QUERIES["assign_contiguous_ids"](spark, sf_dir).collect()
    ids = sorted(r["new_id"] for r in rows)
    assert ids == list(range(1, len(rows) + 1))  # dense, 1..N, no gaps
    # deterministic across executions (seeded key, not partition layout)
    again = {r["doc_id"]: r["new_id"]
             for r in QUERIES["assign_contiguous_ids"](spark, sf_dir).collect()}
    assert all(again[r["doc_id"]] == r["new_id"] for r in rows)


def test_curate_corpus_end_to_end(spark, sf_dir, tmp_path):
    from mental_health_bigdata_project_spark.operators.curation import (
        curate_corpus)
    out = str(tmp_path / "curated")
    report = {r["stage"]: r["docs"] for r in
              curate_corpus(spark, sf_dir, out).collect()}
    assert (report["input"] >= report["quality_gate"]
            >= report["chunk_rewrite"] >= report["near_dedup"] > 0)
    corpus = spark.read.parquet(f"{out}/corpus")
    rows = corpus.collect()
    assert len(rows) == report["near_dedup"]
    assert all(r["text"] for r in rows)
    # dense positions per shard over the FINAL surviving set
    from collections import defaultdict
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r["shard"]].append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # report round-trips from disk
    again = {r["stage"]: r["docs"] for r in
             spark.read.parquet(f"{out}/report").collect()}
    assert again == report


def test_curate_corpus_exact_near_dedup(spark, tmp_path):
    """exact_near_dedup swaps the LSH survivor stage for the verified
    setsim component pass: an exact duplicate loses to the lower id,
    a below-threshold near-miss survives (no LSH false positive can
    delete it), and chains collapse to one survivor per component."""
    from mental_health_bigdata_project_spark.operators.curation import (
        curate_corpus)

    base = [f"tok{i}" for i in range(60)]
    quux = [f"quux{i}" for i in range(60)]

    def subst(toks, positions):
        # one substitution inside each 30-token chunk window, so the
        # C4 chunk rewrite (stage 2) sees NO identical chunk and the
        # near-dup reaches stage 3 intact — only the shingle-level
        # exact join can catch these
        out = list(toks)
        for p in positions:
            out[p] = f"sub{p}x"
        return out

    # All pass the quality gate (>=50 words, 3-10 char tokens,
    # "the a" stopword hits).
    mk = lambda toks: "the a " + " ".join(toks)
    rows = [
        (1, mk(base)),
        (9, mk(subst(base, [15, 45]))),                       # near-dup of 1
        (3, mk(base[:15] + [f"zed{i}" for i in range(45)])),  # near-miss
        (4, mk(quux)),
        # LONGER near-dup of 4 (J ~ 0.63): longest-wins must keep 5
        (5, mk(subst(quux, [15, 45]) + [f"extra{i}" for i in range(20)])),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    out = str(tmp_path / "curated")
    report = {r["stage"]: r["docs"] for r in
              curate_corpus(spark, d, out, exact_near_dedup=True).collect()}
    kept = {r["doc_id"] for r in
            spark.read.parquet(f"{out}/corpus").collect()}
    # 9 lost to equal-length 1 (doc_id tiebreak); 4 lost to LONGER 5
    # (same longest-wins heuristic as the LSH path); near-miss 3 kept
    assert kept == {1, 3, 5}
    assert report["near_dedup"] == 3


def test_incremental_chunk_dedup_batches(spark, tmp_path):
    from mental_health_bigdata_project_spark.streaming import chunkdedup

    out, idx = str(tmp_path / "out"), str(tmp_path / "idx")

    def _docs_df(rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    # batch 0: doc1 owns A and B; doc3 is wholly block A -> vanishes
    chunkdedup.rewrite_batch_against_index(
        _docs_df([(1, BLOCK_A + " " + BLOCK_B), (3, BLOCK_A)]), 0, out, idx)
    acc0 = {r["doc_id"]: r for r in
            spark.read.parquet(f"{out}/accepted").collect()}
    assert set(acc0) == {1}
    assert acc0[1]["text"] == BLOCK_A + " " + BLOCK_B

    # batch 1: doc5 = B + C; B blocked by the index, C survives
    chunkdedup.rewrite_batch_against_index(
        _docs_df([(5, BLOCK_B + " " + BLOCK_C)]), 1, out, idx)
    acc = {r["doc_id"]: r for r in
           spark.read.parquet(f"{out}/accepted").collect()}
    assert set(acc) == {1, 5}
    assert acc[5]["text"] == BLOCK_C and acc[5]["n_kept"] == 1

    # crash-retry replay of batch 1: identical state, no duplicates —
    # and CONTENT-identical: the replay must not treat its own batch-1
    # index delta (C's fp) as a prior duplicate, which would make doc 5
    # vanish (the index read prunes batch_id >= current)
    chunkdedup.rewrite_batch_against_index(
        _docs_df([(5, BLOCK_B + " " + BLOCK_C)]), 1, out, idx)
    rows = spark.read.parquet(f"{out}/accepted").collect()
    assert {r["doc_id"] for r in rows} == {1, 5} and len(rows) == 2
    acc = {r["doc_id"]: r for r in rows}
    assert acc[5]["text"] == BLOCK_C and acc[5]["n_kept"] == 1


def test_incremental_chunk_dedup_partial_failure_replay(spark, tmp_path):
    """Crash BETWEEN the two per-batch writes: accepted output for
    batch 1 is committed but its index delta is not (the writes are
    not atomic).  The checkpoint retries the whole batch; the retry
    must converge to the same state — accepted partition overwritten
    with identical content, index delta written — with no duplicate
    chunks leaking into later batches."""
    import shutil

    from mental_health_bigdata_project_spark.streaming import chunkdedup

    out, idx = str(tmp_path / "out"), str(tmp_path / "idx")

    def _docs_df(rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    chunkdedup.rewrite_batch_against_index(
        _docs_df([(1, BLOCK_A + " " + BLOCK_B)]), 0, out, idx)
    chunkdedup.rewrite_batch_against_index(
        _docs_df([(5, BLOCK_B + " " + BLOCK_C)]), 1, out, idx)
    # simulate the crash: batch 1's index delta vanishes, accepted stays
    shutil.rmtree(f"{idx}/chunk_fps/batch_id=1")
    # retry of batch 1
    chunkdedup.rewrite_batch_against_index(
        _docs_df([(5, BLOCK_B + " " + BLOCK_C)]), 1, out, idx)
    acc = {r["doc_id"]: r for r in
           spark.read.parquet(f"{out}/accepted").collect()}
    assert set(acc) == {1, 5}
    assert acc[5]["text"] == BLOCK_C and acc[5]["n_kept"] == 1
    # the rebuilt delta blocks C in later batches again
    chunkdedup.rewrite_batch_against_index(
        _docs_df([(9, BLOCK_C)]), 2, out, idx)
    acc2 = {r["doc_id"] for r in
            spark.read.parquet(f"{out}/accepted").collect()}
    assert acc2 == {1, 5}  # doc 9 was wholly the already-claimed block


def test_incremental_chunk_dedup_streaming_matches_batch(spark, tmp_path):
    import json as _json
    import time as _time
    from mental_health_bigdata_project_spark.streaming import chunkdedup
    from mental_health_bigdata_project_spark.plans.textops import (
        chunk_rewrite_df)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    with open(in_dir / "b0.json", "w") as f:
        f.write(_json.dumps({"doc_id": 1,
                             "text": BLOCK_A + " " + BLOCK_B}) + "\n")
    _time.sleep(1.1)  # distinct mtime so the file source splits batches
    with open(in_dir / "b1.json", "w") as f:
        f.write(_json.dumps({"doc_id": 5,
                             "text": BLOCK_A + " " + BLOCK_C}) + "\n")

    q = chunkdedup.stream_chunk_dedup(
        spark, str(in_dir), str(tmp_path / "out"), str(tmp_path / "idx"),
        str(tmp_path / "ckpt"))
    q.awaitTermination(60)

    got = {r["doc_id"]: r["text"] for r in
           spark.read.parquet(str(tmp_path / "out" / "accepted")).collect()}
    # equivalent one-shot batch rewrite over the same docs, in the same
    # arrival order (doc_id order == batch order here)
    batch = chunk_rewrite_df(spark.createDataFrame(
        [(1, BLOCK_A + " " + BLOCK_B), (5, BLOCK_A + " " + BLOCK_C)],
        "doc_id bigint, text string"))
    want = {r["doc_id"]: r["text_rewritten"]
            for r in batch.filter("n_kept > 0").collect()}
    assert got == want


def test_curation_ops_on_degenerate_docs(spark, tmp_path):
    # null text, empty text, whitespace-only, single token: none may
    # crash; text-dependent ops drop them, id-only ops keep them
    d = _write_docs(spark, tmp_path, [(1, GOOD)])
    # _write_docs computes len(t); add degenerate rows manually
    extra = spark.createDataFrame(
        [(90, None, "en", "src0", 0), (91, "", "en", "src0", 0),
         (92, "   ", "en", "src0", 3), (93, "lone", "en", "src0", 4)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint")
    extra.write.mode("append").parquet(f"{d}/documents.parquet")

    gopher = {r["doc_id"] for r in
              QUERIES["text_gopher_rules"](spark, d).collect()}
    assert gopher == {1, 93}  # null/empty/ws filtered; 'lone' scored

    rewrite = {r["doc_id"]: r for r in
               QUERIES["dedup_chunk_rewrite"](spark, d).collect()}
    assert set(rewrite) == {1, 93}
    assert rewrite[93]["text_rewritten"] == "lone"

    shards = {r["doc_id"] for r in
              QUERIES["corpus_shard_shuffle"](spark, d).collect()}
    assert shards == {1, 90, 91, 92, 93}  # id-only: every doc sharded

    surv = {r["doc_id"] for r in
            QUERIES["dedup_survivor_select"](spark, d).collect()}
    assert surv == {1, 90, 91, 92, 93}  # all singletons survive

    ids = {r["doc_id"] for r in
           QUERIES["assign_contiguous_ids"](spark, d).collect()}
    assert ids == {1, 90, 91, 92, 93}


def test_quality_rule_funnel_marginals_consistent(spark, sf_dir):
    funnel = {r["rule"]: r for r in
              QUERIES["quality_rule_funnel"](spark, sf_dir).collect()}
    rules = QUERIES["text_gopher_rules"](spark, sf_dir).collect()
    names = ["r_word_count", "r_mean_word_len", "r_alpha_words",
             "r_stopwords", "r_symbol_ratio", "r_top_token"]
    assert set(funnel) == set(names)
    for name in names:
        failing = sum(1 for r in rules if not r[name])
        sole = sum(1 for r in rules
                   if not r[name] and all(r[o] for o in names if o != name))
        assert funnel[name]["n_failing"] == failing
        assert funnel[name]["n_sole_blocker"] == sole
        assert funnel[name]["n_docs"] == len(rules)
        assert sole <= failing


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    rows = QUERIES["sim_ann_recall_multiprobe"](spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0.0 <= r["recall_1probe"] <= r["recall_9probe"] <= 1.0
    # on this corpus multi-probe must actually add recall somewhere,
    # otherwise the harness measures nothing
    assert any(r["recall_9probe"] > r["recall_1probe"] for r in rows)


def test_dedup_survivors_under_hot_fingerprint(spark, tmp_path):
    # 200 identical docs — one fingerprint owns the whole corpus (the
    # skew case the aggregate survivors exist for); doc 7 is distinct
    rows = [(i, BLOCK_A) for i in range(200)] + [(777, BLOCK_B)]
    d = _write_docs(spark, tmp_path, rows)

    exact = QUERIES["dedup_exact_docs"](spark, d).collect()
    assert sorted(r["doc_id"] for r in exact) == [0, 777]

    rewrite = {r["doc_id"]: r for r in
               QUERIES["dedup_chunk_rewrite"](spark, d).collect()}
    assert rewrite[0]["text_rewritten"] == BLOCK_A   # first occurrence
    assert rewrite[777]["text_rewritten"] == BLOCK_B
    assert all(r["n_kept"] == 0 for i, r in rewrite.items()
               if i not in (0, 777))


def test_cms_never_undercounts_and_is_tight_on_heavy_hitters(spark, sf_dir):
    rows = QUERIES["sketch_cms_token_freq"](spark, sf_dir).collect()
    assert len(rows) == 20
    total = sum(r["exact_n"] for r in rows)  # lower bound on stream size
    for r in rows:
        assert r["never_undercounts"] == 1
        assert r["est_n"] >= r["exact_n"]
        assert r["overcount"] == r["est_n"] - r["exact_n"]
        # d=4 independent rows: overcount should stay well under the
        # single-row worst case of N/w for at least the top tokens
        assert r["overcount"] >= 0
    assert any(r["overcount"] < total for r in rows)


def test_fim_transform_spans_reassemble(spark, sf_dir):
    rows = QUERIES["transform_fim"](spark, sf_dir).collect()
    assert rows
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    for r in rows[:50]:
        text, s1, s2 = docs[r["doc_id"]], r["s1"], r["s2"]
        assert 0 < s1 < s2 < len(text)  # all three spans non-empty
        pre, mid, suf = text[:s1], text[s1:s2], text[s2:]
        assert r["fim_text"] == f"<PRE>{pre}<SUF>{suf}<MID>{mid}"
    # seeded: identical across runs
    again = {r["doc_id"]: r["fim_text"] for r in
             QUERIES["transform_fim"](spark, sf_dir).collect()}
    assert all(again[r["doc_id"]] == r["fim_text"] for r in rows)


def test_span_corruption_masks_and_targets_align(spark, sf_dir):
    import re
    rows = QUERIES["transform_span_corruption"](spark, sf_dir).collect()
    assert rows
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    for r in rows[:50]:
        toks = docs[r["doc_id"]].lower().split()
        blocks = len(toks) // 20
        assert r["n_masked"] == blocks * 3
        sentinels = re.findall(r"<extra_id_(\d+)>", r["corrupted"])
        assert sentinels == [str(k) for k in range(blocks)]
        # corrupted keeps every unmasked token in order
        corrupted_toks = [t for t in r["corrupted"].split()
                          if not t.startswith("<extra_id_")]
        target_spans = re.split(r"<extra_id_\d+> ?", r["targets"])[1:]
        masked = [w for span in target_spans for w in span.split()]
        assert len(corrupted_toks) + len(masked) == len(toks)
        assert sorted(corrupted_toks + masked) == sorted(toks)
        assert all(len(span.split()) == 3 for span in target_spans)


def test_threshold_sweep_covers_the_production_threshold(spark, sf_dir):
    sweep = {r["bucket"]: r["n_pairs"] for r in
             QUERIES["neardup_threshold_sweep"](spark, sf_dir).collect()}
    # pairs at est >= 0.5 (buckets 4..8) must equal what the production
    # threshold admits
    admitted = sum(n for b, n in sweep.items() if b >= 4)
    pairs = QUERIES["dedup_minhash_portable"](spark, sf_dir).count()
    assert admitted == pairs


def test_streaming_neardup_keeps_unshingleable_docs(spark, tmp_path):
    # <3-token docs have no band keys; they can't be near-dups of
    # anything and must be accepted, not silently dropped
    from mental_health_bigdata_project_spark.streaming import neardup
    out, idx = str(tmp_path / "out"), str(tmp_path / "idx")
    df = spark.createDataFrame(
        [(1, "hello world"), (2, TEXT_X)], "doc_id bigint, text string")
    neardup.dedup_batch_against_index(df, 0, out, idx)
    acc = {r["doc_id"] for r in
           spark.read.parquet(f"{out}/accepted").collect()}
    assert acc == {1, 2}


def test_covariance_matrix_is_symmetric_with_variance_diagonal(spark, sf_dir):
    rows = {(r["i"], r["j"]): r["cov"] for r in
            QUERIES["vec_covariance_matrix"](spark, sf_dir).collect()}
    assert len(rows) == 64
    for i in range(8):
        assert rows[(i, i)] >= 0  # variances
        for j in range(8):
            assert rows[(i, j)] == pytest.approx(rows[(j, i)], abs=1e-9)


def test_curate_corpus_rerun_is_idempotent(spark, sf_dir, tmp_path):
    from mental_health_bigdata_project_spark.operators.curation import (
        curate_corpus)
    out = str(tmp_path / "curated")
    r1 = sorted(map(tuple, curate_corpus(spark, sf_dir, out).collect()))
    c1 = sorted(map(tuple,
                    spark.read.parquet(f"{out}/corpus").collect()))
    r2 = sorted(map(tuple, curate_corpus(spark, sf_dir, out).collect()))
    c2 = sorted(map(tuple,
                    spark.read.parquet(f"{out}/corpus").collect()))
    assert r1 == r2 and c1 == c2  # deterministic + overwrite-clean


def test_streaming_chunk_dedup_with_quality_gate(spark, tmp_path):
    from mental_health_bigdata_project_spark.streaming import chunkdedup
    from mental_health_bigdata_project_spark.plans.textops import (
        gopher_rules_df)

    def gate(df):
        # default (real Gopher) stopword list: GOOD is built to pass it
        keep = gopher_rules_df(df).filter("keep").select("doc_id")
        return df.join(keep, "doc_id", "semi")

    out, idx = str(tmp_path / "out"), str(tmp_path / "idx")
    junk = "x y"  # fails the word-count rule
    df = spark.createDataFrame(
        [(1, GOOD), (2, junk)], "doc_id bigint, text string")
    chunkdedup.rewrite_batch_against_index(df, 0, out, idx, gate=gate)
    acc = {r["doc_id"] for r in
           spark.read.parquet(f"{out}/accepted").collect()}
    assert acc == {1}  # junk gated out BEFORE it could claim chunks


def test_curate_corpus_with_span_stage(spark, sf_dir, tmp_path):
    from mental_health_bigdata_project_spark.operators.curation import (
        curate_corpus)

    out = str(tmp_path / "curated_span")
    rep = {r["stage"]: r["docs"] for r in
           curate_corpus(spark, sf_dir, out, span_dedup=True).collect()}
    assert set(rep) == {"input", "quality_gate", "chunk_rewrite",
                        "span_rewrite", "near_dedup"}
    # attrition is monotone through the dedup stages
    assert (rep["input"] >= rep["quality_gate"] >= rep["chunk_rewrite"]
            >= rep["span_rewrite"] >= rep["near_dedup"] > 0)
    corpus = spark.read.parquet(f"{out}/corpus")
    assert corpus.count() == rep["near_dedup"]
    # the span stage really ran: no doc in the final corpus carries a
    # duplicated 8-token window that a chunk-aligned pass would miss —
    # spot-check by re-running span detection on the output (only
    # first occurrences may remain, i.e. every gram is unique OR the
    # retained copy)
    from mental_health_bigdata_project_spark.plans.textops import (
        _span_frames)
    _, spans = _span_frames(corpus.select("doc_id", "text"))
    # re-detected spans can only come from NEW grams formed at cut
    # seams; they must be rare relative to corpus size
    assert spans.count() <= rep["near_dedup"] * 0.05


# --- round-4 diagnostic-query invariants ---------------------------------


def test_doc_length_survival_invariants(spark, sf_dir):
    """Survival curves are monotone in the cap and end at exactly 1.0;
    the token mass kept never exceeds the corpus total."""
    from mental_health_bigdata_project_spark.plans import QUERIES

    rows = sorted(QUERIES["doc_length_survival"](spark, sf_dir).collect(),
                  key=lambda r: r.cap)
    assert rows
    prev_d = prev_t = 0.0
    for r in rows:
        assert 0.0 < r.doc_survival <= 1.0 and 0.0 < r.token_survival <= 1.0
        assert r.doc_survival >= prev_d and r.token_survival >= prev_t
        assert r.tokens_kept <= rows[-1].tokens_kept
        prev_d, prev_t = r.doc_survival, r.token_survival
    assert rows[-1].doc_survival == 1.0 and rows[-1].token_survival == 1.0


def test_ngram_novelty_decay_invariants(spark, sf_dir):
    """The first decile is all-novel by definition; rates are proper
    fractions; new <= distinct everywhere."""
    from mental_health_bigdata_project_spark.plans import QUERIES

    rows = {r.decile: r
            for r in QUERIES["ngram_novelty_decay"](spark, sf_dir).collect()}
    assert rows[min(rows)].novelty_rate == 1.0
    for r in rows.values():
        assert 0.0 <= r.novelty_rate <= 1.0
        assert r.n_new_grams <= r.n_distinct_grams


def test_emb_cell_balance_invariants(spark, sf_dir):
    """The rollup accounts for every vector; imbalance >= 1; the pair
    mass is at least the biggest cell's own interior."""
    from mental_health_bigdata_project_spark.plans import QUERIES
    from mental_health_bigdata_project_spark.sources import load_table

    r = QUERIES["emb_cell_balance"](spark, sf_dir).collect()[0]
    assert r.n_vectors == load_table(spark, sf_dir, "embeddings").count()
    assert r.imbalance >= 1.0
    assert r.pair_mass >= r.max_cell * (r.max_cell - 1) // 2
    assert r.p50_cell <= r.max_cell


def test_quality_ppl_buckets_partitions_each_lang(spark, sf_dir):
    """Buckets partition each language's scored docs, all three bucket
    labels appear, and the head cutoff dominates the tail cutoff (docs
    with no bigrams are excluded on both engines)."""
    from pyspark.sql import functions as F

    from mental_health_bigdata_project_spark.plans import QUERIES

    df = QUERIES["quality_ppl_buckets"](spark, sf_dir)
    per_lang = {r.lang: r for r in
                df.groupBy("lang").agg(
                    F.count("*").alias("n"),
                    F.countDistinct("bucket").alias("n_buckets"),
                    F.min(F.when(F.col("bucket") == "head", F.col("avg_logp")))
                    .alias("min_head"),
                    F.max(F.when(F.col("bucket") == "tail", F.col("avg_logp")))
                    .alias("max_tail")).collect()}
    assert per_lang
    for lang, r in per_lang.items():
        assert r.n_buckets == 3, lang
        assert r.min_head > r.max_tail, lang


def test_dedup_modality_agreement_accounts_all_docs(spark, sf_dir):
    """The 2x2 table partitions the embedded-doc population."""
    from mental_health_bigdata_project_spark.plans import QUERIES
    from mental_health_bigdata_project_spark.sources import load_table

    rows = QUERIES["dedup_modality_agreement"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 4
    assert len({(r.text_dup, r.emb_dup) for r in rows}) == len(rows)
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_docs for r in rows) == n_emb


def test_bpe_fertility_at_least_one_symbol_per_word(spark, sf_dir):
    """Every whitespace word encodes to >= 1 symbol, so per-language
    fertility is >= 1; symbol totals are consistent."""
    from mental_health_bigdata_project_spark.plans import QUERIES

    for r in QUERIES["bpe_fertility_by_lang"](spark, sf_dir).collect():
        assert r.fertility >= 1.0
        assert r.n_bpe_symbols >= r.n_tokens
        assert abs(r.fertility - r.n_bpe_symbols / r.n_tokens) < 1e-12


def test_lm_gate_trains_once_and_filters_stream_batches(spark, tmp_path):
    """CCNet-style loop: fit the bigram LM + tail cutoff on trusted
    text, freeze it, and gate streaming micro-batches — reference-like
    text passes, token soup scores below the reference tail and is
    dropped BEFORE it can claim dedup slots."""
    from mental_health_bigdata_project_spark.streaming import (chunkdedup,
                                                               lmgate)

    # trusted reference: natural-ish sentences with repeated structure
    ref_rows = [(i, GOOD) for i in range(10)] + [
        (20, "the quick brown fox jumps over the lazy dog"),
        (21, "the lazy dog runs to the quiet streams"),
    ]
    ref = spark.createDataFrame(ref_rows, "doc_id bigint, text string")
    art = str(tmp_path / "lm")
    lmgate.build_lm_artifact(ref, art)
    gate = lmgate.lm_tail_gate(spark, art)

    good = spark.createDataFrame(
        [(100, GOOD)], "doc_id bigint, text string")
    soup = spark.createDataFrame(
        [(101, "zxqv wkjh pqrs mnbv zzyy qqww eerr ttuu ooii ppaa")],
        "doc_id bigint, text string")
    assert {r.doc_id for r in gate(good).collect()} == {100}
    assert gate(soup).count() == 0  # all-unseen bigrams -> smoothed floor
    # a doc with <2 tokens carries no evidence and passes
    tiny = spark.createDataFrame([(102, "hello")],
                                 "doc_id bigint, text string")
    assert gate(tiny).count() == 1

    # wired into the streaming chunk-dedup topology
    out, idx = str(tmp_path / "out"), str(tmp_path / "idx")
    batch = spark.createDataFrame(
        [(100, GOOD), (101, "zxqv wkjh pqrs mnbv zzyy qqww")],
        "doc_id bigint, text string")
    chunkdedup.rewrite_batch_against_index(batch, 0, out, idx, gate=gate)
    acc = {r["doc_id"] for r in
           spark.read.parquet(f"{out}/accepted").collect()}
    assert acc == {100}


def test_lm_artifact_refuses_unscorable_reference(spark, tmp_path):
    """A reference corpus with no >=2-token document cannot define a
    tail cutoff — the build must fail loudly, not crash with a
    NoneType TypeError deep in float()."""
    import pytest

    from mental_health_bigdata_project_spark.streaming import lmgate

    ref = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="no scorable documents"):
        lmgate.build_lm_artifact(ref, str(tmp_path / "lm"))


def test_decontam_gate_matches_batch_query(spark, sf_dir, tmp_path):
    """The streaming decontamination gate must drop EXACTLY the docs
    the oracle-checked batch query (decontam_benchmark) flags on the
    same corpus split, and pass everything else — streaming == batch
    pinned end-to-end, including through the chunk-dedup topology's
    gate hook."""
    from mental_health_bigdata_project_spark.plans import QUERIES
    from mental_health_bigdata_project_spark.sources import load_table
    from mental_health_bigdata_project_spark.streaming import (chunkdedup,
                                                               decontamgate)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)

    art = str(tmp_path / "decontam")
    n_fps = decontamgate.build_decontam_artifact(bench, art)
    assert n_fps > 0
    gate = decontamgate.decontam_gate(spark, art)

    flagged_batch = {r.doc_id for r in
                     QUERIES["decontam_benchmark"](spark, sf_dir).collect()}
    kept = {r.doc_id for r in gate(train).select("doc_id").collect()}
    train_ids = {r.doc_id for r in train.select("doc_id").collect()}
    assert train_ids - kept == flagged_batch
    assert flagged_batch, "fixture should contain contamination"

    # wired into the streaming chunk-dedup topology: contaminated docs
    # never reach the accepted output
    out, idx = str(tmp_path / "out"), str(tmp_path / "idx")
    some_clean = sorted(kept)[:3]
    some_dirty = sorted(flagged_batch)[:2]
    batch = train.filter(F.col("doc_id").isin(some_clean + some_dirty))
    chunkdedup.rewrite_batch_against_index(batch, 0, out, idx, gate=gate)
    acc = {r["doc_id"] for r in
           spark.read.parquet(f"{out}/accepted").collect()}
    assert acc == set(some_clean)


def test_decontam_artifact_refuses_empty_benchmark(spark, tmp_path):
    from mental_health_bigdata_project_spark.streaming import decontamgate

    bench = spark.createDataFrame([(1, "too short"), (2, "x")],
                                  "doc_id bigint, text string")
    with pytest.raises(ValueError, match="no 3-gram fingerprints"):
        decontamgate.build_decontam_artifact(bench, str(tmp_path / "a"))
