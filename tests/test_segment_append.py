"""Segment appends + tiered merging (upstream ``IndexWriter`` flush →
``TieredMergePolicy`` merge lifecycle [U]): an incremental append in
``append_mode="segment"`` writes ONE new shard file per bucket from
only the new parts' fragments — existing files are never read or
rewritten — and ``maybe_merge`` bounds the per-bucket segment count
via the size-tiered smallest-files merge, published as an atomic
generation swap."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from engine import manifest as mf


def _cfg():
    from engine.build import IndexConfig

    return IndexConfig(text_col="text", conv_cols=None,
                       doc_id_col="doc_id", stop_words=None,
                       stemming=False, n_buckets=3,
                       hot_df_threshold=10**9, batch_size=128)


@pytest.fixture(scope="module")
def _files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("segappend")
    rng = np.random.default_rng(17)
    vocab = [f"t{i}" for i in range(250)]
    files = []
    for i, (lo, hi) in enumerate([(0, 800), (800, 1200), (1200, 1500),
                                  (1500, 1900), (1900, 2100)]):
        f = str(tmp / f"p{i}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array([" ".join(rng.choice(vocab, size=10))
                              for _ in range(hi - lo)])}), f)
        files.append(f)
    return str(tmp), files


QUERIES = ["t1 t2", "t9", "t10 t20 t30", "t100 t5"]


def test_segment_append_equals_rewrite(ray_session, _files):
    from engine.build import build_index
    from engine.check import check_index, dump_postings
    from engine.query import IndexReader

    tmp, files = _files
    seg, rew = os.path.join(tmp, "seg"), os.path.join(tmp, "rew")
    cfg = _cfg()
    build_index([files[0]], seg, cfg)
    build_index([files[0]], rew, cfg)
    man0 = mf.load(seg)
    b0 = os.path.join(mf.shard_root(seg, man0), "bucket=0")
    inodes = {f: os.stat(os.path.join(b0, f)).st_ino
              for f in os.listdir(b0) if f.endswith(".parquet")}

    build_index(files[:2], seg, cfg, append_mode="segment")
    build_index(files[:2], rew, cfg)
    # existing shard files were not rewritten (same inodes)...
    for f, ino in inodes.items():
        assert os.stat(os.path.join(b0, f)).st_ino == ino
    # ...and exactly one new segment file landed
    assert sum(f.startswith("seg-") for f in os.listdir(b0)) == 1
    check_index(seg)

    ds_, dr_ = dump_postings(seg), dump_postings(rew)
    assert ds_.keys() == dr_.keys()
    for t in ds_:
        for i in range(3):
            assert (ds_[t][i] == dr_[t][i]).all(), t
    rs = IndexReader(seg, preload=True)
    rr = IndexReader(rew, preload=True)
    for q in QUERIES:
        assert rs.topk(q, 200).equals(rr.topk(q, 200)), q


def test_tiered_maybe_merge(ray_session, _files):
    from engine.build import build_index, maybe_merge, optimize_index
    from engine.check import check_index
    from engine.query import IndexReader

    tmp, files = _files
    seg, rew = os.path.join(tmp, "tseg"), os.path.join(tmp, "trew")
    cfg = _cfg()
    build_index([files[0]], seg, cfg)
    for k in (2, 3, 4, 5):
        build_index(files[:k], seg, cfg, append_mode="segment")
    build_index(files, rew, cfg)
    man = mf.load(seg)
    b0 = os.path.join(mf.shard_root(seg, man), "bucket=0")
    assert len([f for f in os.listdir(b0)
                if f.endswith(".parquet")]) == 5
    rr = IndexReader(rew, preload=True)
    want = {q: rr.topk(q, 200) for q in QUERIES}

    r = maybe_merge(seg, max_segments=2)
    assert r["merged_buckets"] == 3
    check_index(seg)
    man = mf.load(seg)
    b0 = os.path.join(mf.shard_root(seg, man), "bucket=0")
    assert len([f for f in os.listdir(b0)
                if f.endswith(".parquet")]) <= 2
    rs = IndexReader(seg, preload=True)
    for q in QUERIES:
        assert rs.topk(q, 200).equals(want[q]), q
    # already under the cap: no-op
    assert maybe_merge(seg, max_segments=2)["merged_buckets"] == 0
    # forceMerge still collapses to one sub-list per term
    optimize_index(seg)
    check_index(seg)
    assert IndexReader(seg, preload=True).topk(
        QUERIES[0], 200).equals(want[QUERIES[0]])


def test_segment_append_keeps_folded_deletes(ray_session, _files):
    """After a delete-folding merge, a segment append must keep the
    live-only stats (no tombstone resurrection): the result equals a
    fresh build over (live old docs + new docs)."""
    from engine.build import (build_index, delete_docs, optimize_index)
    from engine.check import check_index
    from engine.query import IndexReader

    tmp, files = _files
    cfg = _cfg()
    idx = os.path.join(tmp, "segdel")
    build_index([files[0]], idx, cfg)
    delete_docs(idx, np.arange(0, 100, dtype=np.int64))
    optimize_index(idx, fold_deletes=True)
    build_index(files[:2], idx, cfg, append_mode="segment")
    check_index(idx)

    live = os.path.join(tmp, "live.parquet")
    t0 = pq.read_table(files[0])
    pq.write_table(t0.filter(pc.greater_equal(t0["doc_id"], 100)), live)
    ref = os.path.join(tmp, "ref")
    build_index([live, files[1]], ref, cfg)
    ra = IndexReader(idx, preload=True)
    rb = IndexReader(ref, preload=True)
    for q in QUERIES:
        assert ra.topk(q, 200).equals(rb.topk(q, 200)), q


def test_segment_append_for_codec(ray_session, _files):
    """The segment lifecycle under the FOR postings codec."""
    from dataclasses import replace

    from engine.build import build_index, maybe_merge
    from engine.check import check_index
    from engine.query import IndexReader

    tmp, files = _files
    cfg = replace(_cfg(), postings_codec="for")
    seg = os.path.join(tmp, "fseg")
    build_index([files[0]], seg, cfg)
    for k in (2, 3, 4):
        build_index(files[:k], seg, cfg, append_mode="segment")
    maybe_merge(seg, max_segments=2)
    check_index(seg)
    ref = os.path.join(tmp, "fref")
    build_index(files[:4], ref, cfg)
    ra = IndexReader(seg, preload=True)
    rb = IndexReader(ref, preload=True)
    for q in QUERIES:
        assert ra.topk(q, 200).equals(rb.topk(q, 200)), q


def test_nrt_commit_segment_mode(ray_session, _files):
    """NrtWriter(append_mode="segment"): a hard commit flushes through
    the segment append — reader results identical to a rewrite-mode
    commit of the same buffer."""
    from engine.build import build_index
    from engine.check import check_index
    from engine.nrt import NrtWriter
    from engine.query import IndexReader

    tmp, files = _files
    cfg = _cfg()
    outs = {}
    for mode in ("rewrite", "segment"):
        idx = os.path.join(tmp, f"nrt_{mode}")
        build_index([files[0]], idx, cfg)
        w = NrtWriter(idx, append_mode=mode)
        w.add_documents(pa.table({
            "doc_id": pa.array([5000, 5001], type=pa.int64()),
            "text": pa.array(["t1 t2 t2 zulu", "t9 zulu zulu"])}))
        w.commit(os.path.join(tmp, f"nrtflush_{mode}"))
        check_index(idx)
        r = IndexReader(idx, preload=True)
        outs[mode] = {q: r.topk(q, 100) for q in QUERIES + ["zulu"]}
    for q, t in outs["rewrite"].items():
        assert t.equals(outs["segment"][q]), q
