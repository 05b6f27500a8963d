"""Snapshot point-in-time semantics and soft-delete retention
(complements test_build.py::test_snapshot_restore_roundtrip /
test_sync_replica_incremental)."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def own_index(ray_session, smoke_corpus, tmp_path_factory):
    """A private index this module may mutate (deletes, snapshots)."""
    from engine.build import IndexConfig, build_index

    corpus, _n = smoke_corpus
    idx = str(tmp_path_factory.mktemp("bk_index"))
    cfg = IndexConfig(n_buckets=3, hot_df_threshold=200, batch_size=256)
    build_index(corpus, idx, cfg)
    return idx


def _stats(idx, **kw):
    from engine.query import IndexReader

    r = IndexReader(idx, **kw)
    top = r.topk("merge window filter", 10)
    return top.to_pydict()


def test_snapshot_is_point_in_time(own_index, tmp_path):
    """Deletes AFTER the snapshot must not leak into it (Lucene: a
    snapshot pins a commit; later generations are not part of it), and
    a re-snapshot picks the new generation up incrementally."""
    from engine.build import delete_docs, snapshot_index
    from engine.query import IndexReader

    bak = str(tmp_path / "bak")
    before = _stats(own_index)
    snapshot_index(own_index, bak)
    assert not os.path.exists(os.path.join(bak, "fragments"))
    # hardlinked, not copied: same inode on the same filesystem
    man_root = [f for f in os.listdir(bak)
                if f.startswith("index")][0]
    some = next(os.path.join(dp, f)
                for dp, _, fs in os.walk(os.path.join(bak, man_root))
                for f in fs)
    rel = os.path.relpath(some, bak)
    assert os.stat(some).st_ino == \
        os.stat(os.path.join(own_index, rel)).st_ino

    victim = int(before["doc_id"][0])
    delete_docs(own_index, [victim])
    after = _stats(own_index)
    assert victim not in after["doc_id"]
    assert _stats(bak) == before          # pre-delete view preserved

    bak2 = str(tmp_path / "bak2")
    snapshot_index(own_index, bak2)       # re-snapshot sees the delete
    assert _stats(bak2) == after
    assert victim in IndexReader(bak2)._deleted


def test_soft_delete_two_views(own_index):
    """Default reader masks soft-deleted docs; the unwrapped reader
    (include_soft_deleted=True) sees the same commit without the mask;
    collection stats stay index-time in both (Lucene semantics)."""
    from engine.build import soft_delete_docs
    from engine.query import IndexReader

    base = _stats(own_index)
    live = [d for d in base["doc_id"]]
    victims = live[:2]
    n = soft_delete_docs(own_index, victims)
    assert n == 2

    wrapped = IndexReader(own_index)
    raw = IndexReader(own_index, include_soft_deleted=True)
    top_w = wrapped.topk("merge window filter", 10).to_pydict()
    # wider window: the 2 masked victims displace 2 survivors from a
    # same-k raw page
    top_r = raw.topk("merge window filter", 12).to_pydict()
    assert not set(victims) & set(top_w["doc_id"])
    assert set(victims) <= set(top_r["doc_id"])
    # same commit, same stats: scores of surviving docs are identical
    keep = {d: s for d, s in zip(top_r["doc_id"], top_r["score"])}
    for d, s in zip(top_w["doc_id"], top_w["score"]):
        assert keep[d] == s
    # cumulative second call unions
    n2 = soft_delete_docs(own_index, [live[2]])
    assert n2 == 3


def test_optimize_retains_soft_deletes(own_index):
    """forceMerge folds HARD deletes into the rewritten shards but
    must retain soft tombstones (SoftDeletesRetentionMergePolicy)."""
    import pyarrow.parquet as pq

    from engine import manifest as mf
    from engine.build import optimize_index
    from engine.query import IndexReader

    man = mf.load(own_index)
    soft_before = man["soft_deletes"]["n"]
    assert soft_before > 0
    optimize_index(own_index, fold_deletes=True)
    man2 = mf.load(own_index)
    assert man2["soft_deletes"]["n"] == soft_before   # retained
    assert man2.get("deletes") is None                # hard folded
    soft_ids = set(pq.read_table(
        os.path.join(own_index, man2["soft_deletes"]["file"])
    )["doc_id"].to_pylist())
    wrapped = IndexReader(own_index)
    raw = IndexReader(own_index, include_soft_deleted=True)
    top_w = set(wrapped.topk("merge window filter", 10)
                .to_pydict()["doc_id"])
    top_r = set(raw.topk("merge window filter", 10).to_pydict()["doc_id"])
    assert not top_w & soft_ids
    assert top_r & soft_ids                           # still reachable
