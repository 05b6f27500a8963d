"""Unit tests for the breadth operator library (engine/ops)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def test_hll_accuracy():
    from engine.ops.sketch import HLL, _splitmix64

    vals = np.arange(10_000, dtype=np.int64)
    sk = HLL(p=12)
    sk.add64(_splitmix64(vals.view(np.uint64)))
    est = sk.estimate()
    assert abs(est - 10_000) / 10_000 < 0.05
    # merge of disjoint halves == union estimate
    a, b = HLL(12), HLL(12)
    a.add64(_splitmix64(vals[:5000].view(np.uint64)))
    b.add64(_splitmix64(vals[5000:].view(np.uint64)))
    assert a.merge(b).estimate() == pytest.approx(est)


def test_multimodal_fake_decode_plumbing(ray_session):
    import ray.data

    from engine.ops.multimodal import extract_media_features

    rows = [{"item_id": i, "payload": bytes([i % 251] * (50 + i))}
            for i in range(40)]
    ds = ray.data.from_items(rows)
    out = extract_media_features(ds, "payload", ["item_id"],
                                 feature_dim=8, batch_size=8,
                                 concurrency=2).to_pandas()
    assert len(out) == 40
    assert set(out.columns) == {"item_id", "n_bytes", "digest", "features"}
    assert all(len(f) == 8 for f in out["features"])
    # deterministic: same payload -> same digest/features
    import hashlib
    row = out[out["item_id"] == 3].iloc[0]
    assert row["digest"] == hashlib.md5(rows[3]["payload"]).hexdigest()
    assert row["n_bytes"] == len(rows[3]["payload"])


def test_multimodal_real_mode_is_stubbed():
    from engine.ops.multimodal import MediaFeatureExtractor

    ex = MediaFeatureExtractor(media_col="p", id_cols=[], mode="real")
    batch = pa.table({"p": pa.array([b"xx"], type=pa.binary())})
    with pytest.raises(NotImplementedError):
        ex(batch)


def test_simhash_identical_docs_pair(ray_session):
    import ray.data

    from engine.ops.dedup import simhash_pairs

    rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta epsilon zeta"},
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"},
        {"doc_id": 2, "text": "completely different words entirely here"},
    ]
    t = simhash_pairs(ray.data.from_items(rows), "text", "doc_id",
                      hamming_threshold=3).to_pylist()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in t}
    assert pairs.get((0, 1)) == 0
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_minhash_finds_near_dups(ray_session):
    import ray.data

    from engine.ops.dedup import minhash_lsh_pairs

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep dark forest tonight").split()
    near = list(base)
    near[3] = "red"
    rows = [
        {"doc_id": 0, "text": " ".join(base)},
        {"doc_id": 1, "text": " ".join(near)},
        {"doc_id": 2, "text": "unrelated content about database systems "
                              "query planning and execution engines"},
    ]
    t = minhash_lsh_pairs(ray.data.from_items(rows), "text", "doc_id",
                          k=3, threshold=0.5).to_pylist()
    got = {(r["id_a"], r["id_b"]) for r in t}
    assert (0, 1) in got
    assert all(2 not in p for p in got)


def test_knn_brute_self_match(ray_session):
    import ray.data

    from engine.ops.vector import knn_brute

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 16))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    t = knn_brute(ray.data.from_items(rows), "embedding", "vec_id",
                  vecs[:2], k=3).to_pylist()
    by_q = {}
    for r in t:
        by_q.setdefault(r["query_id"], []).append(r)
    for qi in (0, 1):
        top = sorted(by_q[qi], key=lambda r: r["rank"])[0]
        assert top["vec_id"] == qi
        assert top["cosine"] == pytest.approx(1.0)


def test_positions_roundtrip_through_index(ray_session, smoke_index):
    """_lookup_positions must reproduce the analyzer's positions."""
    from engine.query import IndexReader

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    rows = r._lookup_positions("zephyr")
    assert rows
    for docs, tfs, norms, flat in rows:
        assert len(flat) == int(tfs.sum())
        cuts = np.concatenate(([0], np.cumsum(tfs)))
        for i in range(len(docs)):
            pl = flat[cuts[i]:cuts[i + 1]]
            assert (np.diff(pl) > 0).all() if len(pl) > 1 else True
