"""End-to-end build tests: invariants, partitioning-equivalence, resume.

Mirrors the reference's RandomIndexWriter strategy (SURVEY.md §5): the
same corpus built under different partitionings must produce the same
logical index, and CheckIndex-style invariants hold after every build.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from engine.build import IndexConfig, build_index
from engine.check import check_index, dump_postings
from engine.synth import write_transcripts


def test_build_completes(smoke_index):
    idx, man, n = smoke_index
    assert man["status"] == "complete"
    assert man["stats"]["N"] == n
    assert man["stats"]["n_terms"] > 50
    assert man["stats"]["sum_cf"] > 0
    assert man["stats"]["avgdl"] > 1
    # salting exercised: the corpus has hot terms above the threshold
    assert sum(v["n_hot"] for v in man["buckets"].values()) > 0


def test_check_index(smoke_index):
    idx, man, _ = smoke_index
    stats = check_index(idx)
    assert stats["n_terms"] == man["stats"]["n_terms"]
    # salting produced more index rows than distinct terms
    assert stats["n_rows"] > stats["n_terms"]


def test_docmap_matches_sorted_rank(smoke_index, smoke_corpus):
    """doc_id must equal the rank under (conv_id, turn_idx) sort."""
    import pyarrow.parquet as pq

    corpus, n = smoke_corpus
    idx, _, _ = smoke_index
    dm = pq.read_table(os.path.join(idx, "docmap.parquet"))
    convs = dm["conv_id"].to_pylist()
    assert convs == sorted(convs)
    bases = dm["base"].to_numpy()
    counts = dm["n_turns"].to_numpy()
    assert bases[0] == 0
    assert np.array_equal(bases[1:], np.cumsum(counts)[:-1])
    assert int(bases[-1] + counts[-1]) == n


def test_partitioning_equivalence(ray_session, tmp_path_factory):
    """Same corpus, different file splits / batch sizes / salt configs
    → identical logical postings (RandomIndexWriter analog)."""
    ref_dump = None
    for n_files, batch, hot_thr, n_salts in [
            (1, 512, 10**9, 1),   # single part, no salting
            (4, 128, 150, 4),     # many parts, aggressive salting
    ]:
        corpus = str(tmp_path_factory.mktemp(f"pcorp{n_files}"))
        write_transcripts(corpus, n_convs=60, seed=7, n_files=n_files)
        idx = str(tmp_path_factory.mktemp(f"pidx{n_files}"))
        cfg = IndexConfig(n_buckets=2, hot_df_threshold=hot_thr,
                          n_salts=n_salts, batch_size=batch)
        build_index(corpus, idx, cfg)
        check_index(idx)
        dump = dump_postings(idx)
        if ref_dump is None:
            ref_dump = dump
        else:
            assert set(dump) == set(ref_dump)
            for term, (docs, tfs, norms) in dump.items():
                rd, rt, rn = ref_dump[term]
                assert np.array_equal(docs, rd), term
                assert np.array_equal(tfs, rt), term
                assert np.array_equal(norms, rn), term


def test_resume_skips_done_parts_and_is_identical(
        ray_session, tmp_path_factory):
    corpus = str(tmp_path_factory.mktemp("rcorp"))
    write_transcripts(corpus, n_convs=50, seed=11, n_files=3)
    idx = str(tmp_path_factory.mktemp("ridx"))
    cfg = IndexConfig(n_buckets=2, hot_df_threshold=150, n_salts=2,
                      batch_size=128)
    build_index(corpus, idx, cfg)
    ref = dump_postings(idx)

    # simulate a crash after part 0: forget parts 1,2 and all merges
    mpath = os.path.join(idx, "manifest.json")
    with open(mpath) as f:
        man = json.load(f)
    man["status"] = "building"
    for pid in ("1", "2"):
        del man["parts"][pid]
    man["buckets"] = {}
    with open(mpath, "w") as f:
        json.dump(man, f)

    man2 = build_index(corpus, idx, cfg, resume=True)
    assert man2["status"] == "complete"
    check_index(idx)
    dump = dump_postings(idx)
    assert set(dump) == set(ref)
    for term in dump:
        for a, b in zip(dump[term], ref[term]):
            assert np.array_equal(a, b), term


def test_optimize_index(ray_session, smoke_corpus, tmp_path_factory):
    """forceMerge(1): salted sub-lists combined into one row per term;
    logical postings and query results unchanged."""
    from engine.build import optimize_index
    from engine.query import IndexReader

    corpus, _ = smoke_corpus
    idx = str(tmp_path_factory.mktemp("optidx"))
    cfg = IndexConfig(n_buckets=4, hot_df_threshold=200, n_salts=3,
                      batch_size=256)
    build_index(corpus, idx, cfg)
    ref_dump = dump_postings(idx)
    r0 = IndexReader(idx)
    ref_q = r0.brute_force_topk("running connection index", 50)

    counts = optimize_index(idx)
    assert sum(counts.values()) > 0
    check_index(idx)
    dump = dump_postings(idx)
    assert set(dump) == set(ref_dump)
    for term in dump:
        for a, b in zip(dump[term], ref_dump[term]):
            assert np.array_equal(a, b), term

    r = IndexReader(idx, preload=True)
    assert all(len(v) == 1 for v in r._term_cache.values())
    got = r.bmw_topk("running connection index", 50)
    assert got["doc_id"].to_pylist() == ref_q["doc_id"].to_pylist()
    assert got["score"].to_pylist() == ref_q["score"].to_pylist()


def test_resume_per_bucket_merge_path(ray_session, tmp_path_factory):
    """Crash between bucket merges: only the missing bucket reruns
    (the per-bucket checkpoint path, not the global fast path)."""
    corpus = str(tmp_path_factory.mktemp("bcorp"))
    write_transcripts(corpus, n_convs=40, seed=13, n_files=2)
    idx = str(tmp_path_factory.mktemp("bidx"))
    cfg = IndexConfig(n_buckets=3, hot_df_threshold=100, n_salts=2,
                      batch_size=128)
    build_index(corpus, idx, cfg)
    ref = dump_postings(idx)

    mpath = os.path.join(idx, "manifest.json")
    with open(mpath) as f:
        man = json.load(f)
    man["status"] = "building"
    del man["buckets"]["1"]  # bucket 1 "crashed"
    with open(mpath, "w") as f:
        json.dump(man, f)

    man2 = build_index(corpus, idx, cfg, resume=True)
    assert man2["status"] == "complete"
    check_index(idx)
    dump = dump_postings(idx)
    assert set(dump) == set(ref)
    for term in dump:
        for a, b in zip(dump[term], ref[term]):
            assert np.array_equal(a, b), term


def test_vectorized_merge_matches_groupby_reference(
        ray_session, tmp_path_factory):
    """_merge_bucket_table (vectorized multi-term merge) must produce
    the same logical rows as the per-group Dataset reference path
    (`_merged` groupby.map_groups) over real fragments — including
    salted sub-lists and an interleaved-fragment corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import _merge_bucket_table, _merged, build_index
    from engine.synth import write_transcripts
    import ray.data

    root = tmp_path_factory.mktemp("vmerge")
    corpus = str(root / "corpus")
    # shuffle rows across files so fragments interleave doc ranges
    n = write_transcripts(corpus, n_convs=120, seed=11, n_files=1)
    t = pq.read_table(os.path.join(corpus, "transcripts-00000.parquet"))
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    os.remove(os.path.join(corpus, "transcripts-00000.parquet"))
    for i in range(3):
        pq.write_table(t.take(perm[i::3]),
                       os.path.join(corpus, f"shuffled-{i:05d}.parquet"))

    idx = str(root / "idx")
    build_index(corpus, idx, IndexConfig(
        n_buckets=2, hot_df_threshold=60, n_salts=3))

    for b in range(2):
        frag_dir = os.path.join(idx, "fragments", f"bucket={b}")
        if not os.path.isdir(frag_dir):
            continue
        from engine.build import _FRAG_COLS
        tab = pq.read_table(frag_dir, columns=_FRAG_COLS)
        fast = _merge_bucket_table(tab)
        ref = pa.concat_tables(
            ray.get(_merged(ray.data.read_parquet(frag_dir))
                    .to_arrow_refs()))
        assert fast.num_rows == ref.num_rows
        key = lambda t: sorted(zip(t["term"].to_pylist(),
                                   t["sub"].to_pylist()))
        assert key(fast) == key(ref)
        fs = {(r["term"], r["sub"]): r for r in fast.to_pylist()}
        rs = {(r["term"], r["sub"]): r for r in ref.to_pylist()}
        for k in fs:
            for col in ("df", "cf", "min_doc", "docs", "tfs", "norms",
                        "poss", "blk_last_doc", "blk_doc_off",
                        "blk_tf_off", "blk_pos_off", "blk_max_tf",
                        "blk_min_norm"):
                assert fs[k][col] == rs[k][col], (k, col)


def test_stored_fields_fetch(ray_session, smoke_index, smoke_corpus):
    """Stored-fields generation + two-phase fetch: fetch_docs must
    return the exact corpus text for any docID set, touching only the
    files whose range covers the ids."""
    import pyarrow.parquet as pq

    from engine.build import build_stored_fields
    from engine.query import IndexReader, QueryEngine

    corpus, n = smoke_corpus
    idx, _, _ = smoke_index
    stored = build_stored_fields(idx)
    assert stored == n
    # second call is a no-op (manifest guard)
    assert build_stored_fields(idx) == n

    r = IndexReader(idx)
    ids = np.array([0, 1, n // 2, n - 1], dtype=np.int64)
    got = r.fetch_docs(ids)
    assert got["doc_id"].to_pylist() == sorted(set(ids.tolist()))

    # ground truth: corpus sorted by (conv_id, turn_idx) == docID order
    import pyarrow as pa
    full = pa.concat_tables([
        pq.read_table(os.path.join(corpus, f))
        for f in sorted(os.listdir(corpus)) if f.endswith(".parquet")])
    full = full.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    texts = full["text"].to_pylist()
    for did, txt in zip(got["doc_id"].to_pylist(), got["text"].to_pylist()):
        assert txt == texts[did], did

    # QueryEngine fetch_text end-to-end
    qe = QueryEngine(idx, resolve=True, preload=False, fetch_text=True)
    batch = pa.table({
        "query_id": pa.array([0], type=pa.int64()),
        "query_text": pa.array(["running connection"]),
        "k": pa.array([5], type=pa.int64()),
    })
    res = qe(batch)
    assert "text" in res.column_names and res.num_rows > 0
    for did, txt in zip(res["doc_id"].to_pylist(), res["text"].to_pylist()):
        assert txt == texts[did]


def test_deletes_masking(ray_session, tmp_path_factory):
    """delete_docs generation: every query type excludes deleted docs,
    total_hits shrinks, CheckIndex validates the delete list."""
    from engine.build import build_index, delete_docs
    from engine.check import check_index
    from engine.query import IndexReader

    root = tmp_path_factory.mktemp("deletes")
    corpus = str(root / "corpus")
    n = write_transcripts(corpus, n_convs=150, seed=5, n_files=2)
    idx = str(root / "idx")
    build_index(corpus, idx, IndexConfig(
        n_buckets=2, hot_df_threshold=80, n_salts=2))

    before = IndexReader(idx)
    t0 = before.topk("running connection index", 50)
    assert t0.num_rows > 10
    victims = t0["doc_id"].to_pylist()[:5] + [0, n - 1]
    n_del = delete_docs(idx, victims)
    assert n_del == len(set(victims))
    # cumulative second delete
    assert delete_docs(idx, [1]) == n_del + (0 if 1 in victims else 1)
    check_index(idx)

    after = IndexReader(idx)
    dels = set(victims) | {1}
    for strat in ("brute", "bmw"):
        t = after.topk("running connection index", 50, strategy=strat)
        assert not (set(t["doc_id"].to_pylist()) & dels), strat
        assert t["total_hits"][0].as_py() < t0["total_hits"][0].as_py()
    # brute and bmw still rank-identical under deletes
    tb = after.topk("running connection index", 20, strategy="brute")
    tw = after.topk("running connection index", 20, strategy="bmw")
    assert tb["doc_id"].to_pylist() == tw["doc_id"].to_pylist()
    assert tb["score"].to_pylist() == tw["score"].to_pylist()

    for t in [
        after.boolean_topk(must=["running"], k=50),
        after.boolean_topk(should=["running", "index"], k=50),
        after.dismax_topk(["running", "index"], k=50),
        after.boosted_topk({"running": 2.0}, k=50),
        after.constant_score_topk(["running"], k=50),
        after.phrase_topk("running connection", k=50),
        after.wildcard_topk("run", k=50),
    ]:
        assert not (set(t["doc_id"].to_pylist()) & dels)


def test_incremental_append_doc_mode(ray_session, tmp_path_factory):
    """Append new input files to a complete doc_id-mode index: only the
    new parts are analyzed, merges rerun, and the result equals a
    from-scratch build over the union (logical dump equality). Deletes
    survive the append (stable docIDs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_index, delete_docs
    from engine.check import dump_postings
    from engine.query import IndexReader

    root = tmp_path_factory.mktemp("append")

    def make_file(path, lo, hi, seed):
        rng = np.random.default_rng(seed)
        words = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                          "zeta", "eta", "theta"], dtype=object)
        texts = [" ".join(words[rng.integers(0, 8, size=12)])
                 for _ in range(hi - lo)]
        pq.write_table(pa.table({
            "doc_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "text": pa.array(texts),
        }), path)

    f1 = str(root / "part1.parquet")
    f2 = str(root / "part2.parquet")
    f3 = str(root / "part3.parquet")
    make_file(f1, 0, 300, 1)
    make_file(f2, 300, 600, 2)
    make_file(f3, 600, 900, 3)

    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9)
    inc = str(root / "inc")
    man1 = build_index([f1, f2], inc, cfg)
    assert man1["stats"]["N"] == 600
    delete_docs(inc, [5, 10])

    man2 = build_index([f1, f2, f3], inc, cfg)   # append f3
    assert man2["stats"]["N"] == 900
    # old parts were not re-analyzed (their lineage rows survive)
    assert {v["input_file"] for v in man2["parts"].values()} == {f1, f2, f3}

    full = str(root / "full")
    build_index([f1, f2, f3], full, cfg)
    d_inc, d_full = dump_postings(inc), dump_postings(full)
    assert set(d_inc) == set(d_full)
    for term, (docs, tfs, norms) in d_inc.items():
        rd, rt, rn = d_full[term]
        assert np.array_equal(docs, rd), term
        assert np.array_equal(tfs, rt), term
        assert np.array_equal(norms, rn), term

    # appended docs are searchable; deletes still masked
    r = IndexReader(inc)
    t = r.topk("alpha", 2000)
    ids = set(t["doc_id"].to_pylist())
    assert ids & set(range(600, 900)), "appended docs missing"
    assert not ids & {5, 10}, "deletes lost across append"


def test_fold_deletes_equals_fresh_live_build(ray_session, tmp_path):
    """forceMerge(fold_deletes) must be indistinguishable from an
    index freshly built over only the live docs: same stats, same
    scores (idf/avgdl recomputed live-only), CheckIndex-clean."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import (IndexConfig, build_index, delete_docs,
                              optimize_index)
    from engine.check import check_index
    from engine.query import IndexReader

    rng = np.random.default_rng(5)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 25)))
             for _ in range(120)]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts)}), src)
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=30, n_salts=2, batch_size=32)
    idx = str(tmp_path / "idx")
    build_index([src], idx, cfg)
    dead = list(range(0, 120, 5))
    delete_docs(idx, dead)
    optimize_index(idx, fold_deletes=True)
    check_index(idx)

    live_src = str(tmp_path / "live.parquet")
    keep = [i for i in range(120) if i not in set(dead)]
    pq.write_table(pa.table({
        "doc_id": pa.array(keep, type=pa.int64()),
        "text": pa.array([texts[i] for i in keep])}), live_src)
    idx2 = str(tmp_path / "idx2")
    build_index([live_src], idx2, cfg)

    r1, r2 = IndexReader(idx), IndexReader(idx2)
    assert r1.N == r2.N and abs(r1.avgdl - r2.avgdl) < 1e-12
    assert r1.manifest.get("deletes") is None
    for q in ["aa", "aa bb", "aa bb cc", "ff ee"]:
        a = r1.topk(q, 30)
        b = r2.topk(q, 30)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q
    # phrase path (positions survive the fold)
    a = r1.phrase_topk("aa bb", 20)
    b = r2.phrase_topk("aa bb", 20)
    assert a.to_pydict() == b.to_pydict()


def test_optimize_after_append_preserves_results(ray_session, tmp_path):
    """append → optimize → identical query results (generation flip
    keeps df/cf/scores; salted sub-lists collapse is invisible)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_index, optimize_index
    from engine.check import check_index
    from engine.query import IndexReader

    rng = np.random.default_rng(13)
    vocab = ["aa", "bb", "cc", "dd"]

    def mk(path, lo, hi):
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(
                [" ".join(rng.choice(vocab,
                                     size=rng.integers(3, 15)))
                 for _ in range(hi - lo)])}), path)

    f1, f2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    mk(f1, 0, 80)
    mk(f2, 80, 140)
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2, hot_df_threshold=20,
                      n_salts=2, batch_size=32)
    idx = str(tmp_path / "idx")
    build_index([f1], idx, cfg)
    build_index([f1, f2], idx, cfg)        # append
    r = IndexReader(idx)
    before = {q: r.topk(q, 50).to_pydict()
              for q in ["aa", "aa bb", "cc dd"]}
    optimize_index(idx)
    check_index(idx)
    r2 = IndexReader(idx)
    for q, want in before.items():
        assert r2.topk(q, 50).to_pydict() == want, q


def test_fold_deletes_without_positions(ray_session, tmp_path):
    """Delete folding on a positions-free index (store_positions=False)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import (IndexConfig, build_index, delete_docs,
                              optimize_index)
    from engine.check import check_index
    from engine.query import IndexReader

    rng = np.random.default_rng(21)
    vocab = ["aa", "bb", "cc"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 12)))
             for _ in range(60)]
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(60), type=pa.int64()),
        "text": pa.array(texts)}), src)
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=16,
                      store_positions=False)
    idx = str(tmp_path / "i")
    build_index([src], idx, cfg)
    delete_docs(idx, list(range(0, 60, 4)))
    optimize_index(idx, fold_deletes=True)
    check_index(idx)
    r = IndexReader(idx)
    top = r.topk("aa bb", 60)
    assert not (set(top["doc_id"].to_pylist())
                & set(range(0, 60, 4)))
    assert r.N == 45


def test_char_filters_in_conv_mode_flagship(ray_session, tmp_path):
    """The transcript (conv-mode) pipeline accepts char filters."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_index
    from engine.query import IndexReader

    src = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({
        "conv_id": pa.array(["c0", "c0", "c1"]),
        "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
        "text": pa.array(["<b>hello</b> world", "spark &amp; merge",
                          "<i>hello</i> again"]),
    }), src)
    cfg = IndexConfig(stop_words=None, stemming=False, n_buckets=2,
                      batch_size=8,
                      char_filters=({"type": "htmlstrip"},))
    idx = str(tmp_path / "ci")
    build_index([src], idx, cfg)
    r = IndexReader(idx)
    assert "b" not in r.vocabulary() and "amp" not in r.vocabulary()
    assert r.topk("hello", 5).num_rows == 2


def test_append_after_fold_does_not_resurrect_deletes(ray_session,
                                                      tmp_path):
    """Fragments still hold folded-away postings; an incremental
    append re-merge must re-activate the tombstones, not resurrect
    the deleted docs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import (IndexConfig, build_index, delete_docs,
                              optimize_index)
    from engine.check import check_index
    from engine.query import IndexReader

    rng = np.random.default_rng(31)
    vocab = ["aa", "bb", "cc"]

    def mk(path, lo, hi):
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(
                [" ".join(rng.choice(vocab,
                                     size=rng.integers(3, 12)))
                 for _ in range(hi - lo)])}), path)

    f1 = str(tmp_path / "a.parquet")
    f2 = str(tmp_path / "b.parquet")
    mk(f1, 0, 60)
    mk(f2, 60, 90)
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=16)
    idx = str(tmp_path / "idx")
    build_index([f1], idx, cfg)
    dead = list(range(0, 60, 3))
    delete_docs(idx, dead)
    optimize_index(idx, fold_deletes=True)
    # sanity: folded docs gone, deletes cleared
    r = IndexReader(idx)
    assert r.manifest.get("deletes") is None and r.N == 40

    build_index([f1, f2], idx, cfg)        # incremental append
    check_index(idx)
    r2 = IndexReader(idx)
    hits = set(r2.topk("aa bb cc", 200)["doc_id"].to_pylist())
    assert not (hits & set(dead)), "folded deletes resurrected"
    assert hits & set(range(60, 90)), "appended docs missing"
    # tombstone stats semantics are back (pre-merge Lucene behavior)
    assert r2.N == 90 and r2.manifest["deletes"]["n"] == len(dead)
    # deleting more on the appended index keeps the old tombstones
    delete_docs(idx, [61])
    r3 = IndexReader(idx)
    hits3 = set(r3.topk("aa bb cc", 200)["doc_id"].to_pylist())
    assert not (hits3 & (set(dead) | {61}))


def test_add_indexes_equals_single_build(ray_session, tmp_path_factory):
    """addIndexes(A, B) over disjoint halves == one build over the
    union: logical postings dump identical, CheckIndex green."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, add_indexes, build_index
    from engine.check import check_index, dump_postings

    root = tmp_path_factory.mktemp("addidx")

    def make_file(path, lo, hi, seed):
        rng = np.random.default_rng(seed)
        words = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                          "zeta", "eta", "theta"], dtype=object)
        texts = [" ".join(words[rng.integers(0, 8, size=12)])
                 for _ in range(hi - lo)]
        pq.write_table(pa.table({
            "doc_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "text": pa.array(texts),
        }), path)

    f1 = str(root / "lo.parquet")
    f2 = str(root / "hi.parquet")
    make_file(f1, 0, 250, 11)
    make_file(f2, 250, 500, 12)
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=128)
    ia, ib = str(root / "ia"), str(root / "ib")
    build_index([f1], ia, cfg)
    build_index([f2], ib, cfg)
    merged = str(root / "merged")
    man = add_indexes(merged, [ia, ib])
    assert man["status"] == "complete"
    single = str(root / "single")
    build_index([f1, f2], single, cfg)
    dm, ds_ = dump_postings(merged), dump_postings(single)
    assert set(dm) == set(ds_)
    for term, parts in dm.items():
        for got, want in zip(parts, ds_[term]):
            assert np.array_equal(got, want), term
    check_index(merged)
    # overlapping id spaces must be rejected
    with pytest.raises(AssertionError):
        add_indexes(str(root / "bad"), [ia, ia])


def test_snapshot_restore_roundtrip(ray_session, tmp_path_factory):
    """ReplicationHandler backup analog: a snapshot is itself a
    loadable index; queries over it are identical, and it survives
    deletion of the original (no shared mutable state)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_index, snapshot_index
    from engine.query import IndexReader

    root = tmp_path_factory.mktemp("snap")
    rng = np.random.default_rng(5)
    words = np.array(["alpha", "beta", "gamma", "delta"], dtype=object)
    texts = [" ".join(words[rng.integers(0, 4, size=10)])
             for _ in range(200)]
    src = str(root / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(200, dtype=np.int64)),
        "text": pa.array(texts)}), src)
    idx = str(root / "idx")
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    build_index([src], idx, cfg)
    want = IndexReader(idx).topk("alpha beta", 10).to_pylist()

    snap = str(root / "backup")
    snapshot_index(idx, snap)
    shutil.rmtree(idx)           # original gone: snapshot stands alone
    got = IndexReader(snap).topk("alpha beta", 10).to_pylist()
    assert got == want


def test_exorcise_drops_corrupt_shard_and_index_serves(smoke_index, tmp_path):
    """CheckIndex -exorcise analog: corrupt one bucket shard file →
    check_index fails; exorcise quarantines exactly that file,
    rewrites stats; check_index passes and queries still serve from
    the survivors (only the lost bucket's terms vanish)."""
    import shutil

    import pytest as _pytest

    from engine import manifest as mf
    from engine.build import IndexConfig
    from engine.check import check_index, exorcise_index
    from engine.query import IndexReader

    idx, _, _ = smoke_index
    work = str(tmp_path / "exo_index")
    shutil.copytree(idx, work)   # real copy: never corrupt the fixture

    man = mf.load(work)
    cfg = IndexConfig.from_json(man["config"])
    root = mf.shard_root(work, man)
    victim = None
    for b in range(cfg.n_buckets):
        shard = os.path.join(root, f"bucket={b}")
        pfiles = sorted(f for f in os.listdir(shard)
                        if f.endswith(".parquet")) \
            if os.path.isdir(shard) else []
        if pfiles:
            victim = os.path.join(shard, pfiles[0])
            victim_bucket = b
            break
    assert victim is not None
    with open(victim, "wb") as f:
        f.write(b"garbage not parquet")

    with _pytest.raises(Exception):
        check_index(work)

    rep = exorcise_index(work)
    assert len(rep["dropped"]) == 1
    assert rep["dropped"][0].startswith(f"bucket={victim_bucket}/")
    check_index(work)            # self-consistent again

    # surviving buckets still serve
    r = IndexReader(work)
    vocab = r.vocabulary()
    assert vocab, "exorcised index must still have terms"
    top = r.brute_force_topk(vocab[0], 5)
    assert top.num_rows > 0
    # idempotent: nothing further to drop
    assert exorcise_index(work)["dropped"] == []


def test_giant_document_widens_position_keyspace(ray_session, tmp_path):
    """A document whose token positions exceed the default 2^21 span
    key space: the dynamic SHIFT widening (phrase/span pack keys as
    doc*SHIFT + pos) must kick in instead of silently colliding into
    a neighboring doc's key range — a unique phrase planted past the
    2^21 boundary must match exactly its own doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_index
    from engine.query import IndexReader

    n_pad = (1 << 21) + 40_000          # past the default boundary
    giant = "pad " * n_pad + "zzuniqa zzuniqb"
    docs = pa.table({
        "doc_id": [0, 1, 2],
        "text": ["zzuniqa starts here", giant, "zzuniqb alone tail"]})
    src = str(tmp_path / "giant.parquet")
    pq.write_table(docs, src)
    idx = str(tmp_path / "giant_idx")
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=8)
    build_index([src], idx, cfg)

    r = IndexReader(idx)
    ph = r.phrase_topk("zzuniqa zzuniqb", k=10)
    assert ph["doc_id"].to_pylist() == [1]
    sp = r.span_near_topk(["zzuniqa", "zzuniqb"], slop=0, k=10)
    assert sp["doc_id"].to_pylist() == [1]
    # docs 0 and 2 hold one term each but never the adjacent pair —
    # a collided key space would leak them in
    so = r.span_or_topk(["zzuniqa", "zzuniqb"], k=10)
    assert sorted(so["doc_id"].to_pylist()) == [0, 1, 2]


def test_preloaded_reader_is_point_in_time_snapshot(
        ray_session, tmp_path_factory):
    """Searcher-swap semantics (upstream SearcherManager / Solr
    commit-reopen): a PRELOADED reader opened before an append is a
    true point-in-time snapshot — identical results after the append
    mutates the index on disk — while a freshly opened reader sees
    the appended docs. (Lazy readers must re-open after a commit;
    preload=True is the snapshot path, like an old searcher holding
    its segment state until released.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_index
    from engine.query import IndexReader

    root = tmp_path_factory.mktemp("snap")

    def make_file(path, lo, hi, tag):
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": [f"common snapword{tag} filler" for _ in
                     range(lo, hi)]}), path)

    f1 = str(root / "p1.parquet")
    f2 = str(root / "p2.parquet")
    make_file(f1, 0, 200, 1)
    make_file(f2, 200, 400, 2)

    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9)
    idx = str(root / "idx")
    build_index([f1], idx, cfg)

    old = IndexReader(idx, preload=True)     # snapshot searcher
    before = old.brute_force_topk("common", 1000)
    assert before["total_hits"][0].as_py() == 200

    build_index([f1, f2], idx, cfg)          # commit: append f2

    # the old searcher still serves its point-in-time view
    again = old.brute_force_topk("common", 1000)
    assert again["doc_id"].to_pylist() == before["doc_id"].to_pylist()
    assert again["score"].to_pylist() == before["score"].to_pylist()
    assert old.brute_force_topk("snapword2", 10).num_rows == 0

    # a reopened searcher sees the new commit
    new = IndexReader(idx, preload=True)
    assert new.brute_force_topk("common", 1000)["total_hits"][0] \
        .as_py() == 400
    assert new.brute_force_topk("snapword2", 10).num_rows > 0


def test_numeric_docvalue_update(ray_session, tmp_path_factory):
    """updateNumericDocValue: generations stack (later wins), deleted
    docs are skipped at update time, postings/scores stay untouched,
    and unmatched doc_ids resolve to NaN."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import (IndexConfig, build_index, delete_docs,
                              update_numeric_docvalue)
    from engine.query import IndexReader

    root = tmp_path_factory.mktemp("dvup")
    n = 120
    rng = np.random.default_rng(7)
    words = np.array(["alpha", "beta", "gamma", "delta"], dtype=object)
    texts = [" ".join(words[rng.integers(0, 4, size=6)])
             for _ in range(n)]
    texts[0] = "alpha beta"          # pin membership for assertions
    texts[1] = "alpha"
    texts[2] = "beta"
    texts[3] = "gamma"
    f = str(root / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "size": pa.array(np.arange(n, dtype=np.int64) * 10),
    }), f)
    idx = str(root / "idx")
    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9)
    build_index([f], idx, cfg)
    delete_docs(idx, [1])            # deleted doc must not be updated

    before = IndexReader(idx).topk("alpha beta gamma", 20)
    assert update_numeric_docvalue(idx, "alpha", "size", 500) > 0
    assert update_numeric_docvalue(idx, "beta", "size", 900) > 0

    r = IndexReader(idx)
    got = r.numeric_docvalues("size", np.array([0, 1, 2, 3, n + 5]))
    assert got[0] == 900             # alpha+beta: later generation wins
    assert got[1] == 10              # deleted before update: base value
    assert got[2] == 900             # beta only
    assert got[3] == 30              # untouched doc: base value
    assert np.isnan(got[4])          # unknown doc_id
    # posting shards untouched: identical scores after two dv gens
    after = r.topk("alpha beta gamma", 20)
    assert after.equals(before)
    # two generations recorded in the manifest
    assert len(r.manifest["dv_updates"]["size"]) == 2


def test_upgrade_codec_roundtrip(ray_session, tmp_path_factory):
    """IndexUpgrader analog: vbyte -> FOR -> vbyte migration keeps
    every query family bit-identical (BM25, phrase positions, deletes
    masked), flips the manifest codec atomically, and leaves delete
    generations intact. check_index green after each hop."""
    from engine.build import IndexConfig, build_index, delete_docs, upgrade_codec
    from engine.check import check_index
    from engine.query import IndexReader

    root = tmp_path_factory.mktemp("upcodec")
    corpus = str(root / "corpus")
    write_transcripts(corpus, n_convs=120, seed=11, n_files=2)
    idx = str(root / "idx")
    build_index(corpus, idx, IndexConfig(
        n_buckets=2, hot_df_threshold=80, n_salts=2))
    delete_docs(idx, [3, 17])

    r0 = IndexReader(idx)
    assert r0._codec == "vbyte"
    base_top = r0.topk("running connection index", 25)
    base_ph = r0.phrase_topk("running connection", 25)

    info = upgrade_codec(idx, "for")
    assert info["migrated_files"] > 0
    check_index(idx)
    r1 = IndexReader(idx)
    assert r1._codec == "for"
    assert r1.topk("running connection index", 25).equals(base_top)
    assert r1.phrase_topk("running connection", 25).equals(base_ph)
    # deletes generation survived the swap
    assert r1.manifest["deletes"]["n"] == 2

    # no-op when already in the target codec
    assert upgrade_codec(idx, "for")["migrated_files"] == 0

    upgrade_codec(idx, "vbyte")
    check_index(idx)
    r2 = IndexReader(idx)
    assert r2._codec == "vbyte"
    assert r2.topk("running connection index", 25).equals(base_top)
    assert r2.phrase_topk("running connection", 25).equals(base_ph)


def test_sync_replica_incremental(ray_session, tmp_path_factory):
    """IndexFetcher analog: first sync copies everything searchable,
    a post-append re-sync moves only the delta (new segment + changed
    metadata), stale generations are removed on the replica, and the
    replica answers queries bit-identically to the master."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import (IndexConfig, build_index, delete_docs,
                              sync_replica)
    from engine.check import check_index
    from engine.query import IndexReader

    root = tmp_path_factory.mktemp("replica")
    rng = np.random.default_rng(3)
    words = np.array(["alpha", "beta", "gamma", "delta"], dtype=object)

    def part(path, lo, hi):
        pq.write_table(pa.table({
            "doc_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "text": pa.array([" ".join(words[rng.integers(0, 4, size=6)])
                              for _ in range(hi - lo)]),
        }), path)

    f1, f2 = str(root / "p1.parquet"), str(root / "p2.parquet")
    part(f1, 0, 200)
    part(f2, 200, 300)
    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9)
    master = str(root / "master")
    build_index([f1], master, cfg)

    replica = str(root / "replica")
    first = sync_replica(master, replica)
    assert first["copied"] > 0 and first["skipped"] == 0
    check_index(replica)
    q = "alpha beta"
    assert IndexReader(replica).topk(q, 20).equals(
        IndexReader(master).topk(q, 20))

    # master advances: segment append + a delete generation
    build_index([f1, f2], master, cfg, append_mode="segment")
    delete_docs(master, [5])
    second = sync_replica(master, replica)
    assert second["copied"] > 0
    assert second["skipped"] > 0                # old segments reused
    assert second["copied"] < first["copied"] + second["skipped"]
    check_index(replica)
    a = IndexReader(replica).topk(q, 50)
    b = IndexReader(master).topk(q, 50)
    assert a.equals(b)
    # replica respects the replicated delete generation
    assert 5 not in a["doc_id"].to_pylist()

    # idempotent: third sync copies nothing
    third = sync_replica(master, replica)
    assert third["copied"] == 0 and third["removed"] == 0


def test_docmap_distributed_combine(ray_session, tmp_path_factory):
    """The 10^12-turn docmap path (second-level Ray Data groupby +
    range-partitioned sorted parts, driver state = one int per block)
    must produce a docmap byte-identical to the driver combine and
    actually exercise >1 combine partition."""
    import glob

    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_docmap

    corpus = str(tmp_path_factory.mktemp("dmcorp"))
    write_transcripts(corpus, n_convs=200, seed=11, n_files=8)
    files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    cfg = IndexConfig()
    d1 = str(tmp_path_factory.mktemp("dmidx1"))
    d2 = str(tmp_path_factory.mktemp("dmidx2"))
    n1 = build_docmap(files, cfg, d1, combine="driver")
    n2 = build_docmap(files, cfg, d2, combine="distributed")
    assert n1 == n2
    parts = sorted(glob.glob(os.path.join(d2, "docmap.parquet",
                                          "part-*.parquet")))
    assert len(parts) > 1, "distributed combine must shard the docmap"
    t1 = pq.read_table(os.path.join(d1, "docmap.parquet"))
    t2 = pq.read_table(os.path.join(d2, "docmap.parquet"))
    assert t1.column_names == t2.column_names
    for c in t1.column_names:
        assert t1[c].to_pylist() == t2[c].to_pylist(), c


def test_docmap_distributed_rejects_gap(ray_session, tmp_path_factory):
    """Contiguity validation must fire in the distributed combine."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_docmap

    corpus = str(tmp_path_factory.mktemp("dmbad"))
    os.makedirs(corpus, exist_ok=True)
    pq.write_table(pa.table({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pa.array([0, 2, 0], type=pa.int32()),   # gap in c1
        "text": ["a", "b", "c"]}),
        os.path.join(corpus, "p0.parquet"))
    files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    idx = str(tmp_path_factory.mktemp("dmbadidx"))
    with pytest.raises(Exception, match="contiguous"):
        build_docmap(files, IndexConfig(), idx, combine="distributed")
