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


def test_hll_linear_counting_ln_parity_full_domain():
    """The splitmix64 HLL oracle's only transcendental: DuckDB's ln
    must agree with np.log at the ROUNDED-INTEGER level over the
    linear-counting branch's entire argument domain (zeros 1..4096).
    Exhaustive, so a libm change on this box is caught here and not
    as a driver hash-mismatch."""
    import duckdb

    rows = duckdb.sql(
        "SELECT z, CAST(FLOOR(4096.0 * ln(4096.0 / z) + 0.5) AS "
        "BIGINT) FROM (SELECT unnest(range(1, 4097)) AS z)").fetchall()
    assert len(rows) == 4096
    for z, got in rows:
        want = int(np.floor(4096.0 * np.log(4096.0 / float(z)) + 0.5))
        assert got == want, z


def test_hll_splitmix_sql_register_parity():
    """The SQL replay's registers must equal the sketch's exactly —
    wrapping-multiply avalanche, index split, and smear/bit_count
    rank all bit-for-bit (the estimator then follows arithmetically)."""
    import duckdb

    from engine.ops.sketch import HLL, _splitmix64
    from engine.registry import _sql_mul64, _SM_K, _SM_C1, _SM_C2

    vals = np.array([0, 1, 2**31, 2**52 - 1, 2**63 - 1, 123456789],
                    dtype=np.int64)
    sk = HLL(p=12)
    sk.add64(_splitmix64(vals.view(np.uint64)))
    q = f"""
    WITH v(user_id) AS (SELECT unnest([{",".join(map(str, vals))}])),
    x0 AS (SELECT CAST((user_id::UBIGINT::HUGEINT + {_SM_K}::HUGEINT)
             %% 18446744073709551616::HUGEINT AS UBIGINT) AS z FROM v),
    x1 AS (SELECT {_sql_mul64("xor(z, z // 1073741824)", _SM_C1)} AS z
           FROM x0),
    x2 AS (SELECT {_sql_mul64("xor(z, z // 134217728)", _SM_C2)} AS z
           FROM x1),
    h AS (SELECT xor(z, z // 2147483648) AS hv FROM x2),
    r AS (SELECT (hv // 4503599627370496)::BIGINT AS idx,
                 (hv %% 4503599627370496)::BIGINT AS rest FROM h)
    SELECT idx, 53 - bit_count(s5)::BIGINT AS rho
    FROM (SELECT idx, s4 | (s4 >> 32) AS s5
      FROM (SELECT idx, s3 | (s3 >> 16) AS s4
        FROM (SELECT idx, s2 | (s2 >> 8) AS s3
          FROM (SELECT idx, s1 | (s1 >> 4) AS s2
            FROM (SELECT idx, s0 | (s0 >> 2) AS s1
              FROM (SELECT idx, rest | (rest >> 1) AS s0 FROM r))))))
    """.replace("%%", "%")
    regs = np.zeros(4096, dtype=np.uint8)
    for idx, rho in duckdb.sql(q).fetchall():
        regs[idx] = max(regs[idx], rho)
    assert np.array_equal(regs, sk.regs)


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


def test_knn_brute_metrics_vs_numpy(ray_session):
    """dot / l2 metrics must reproduce an exact numpy reference
    ranking (Lucene VectorSimilarityFunction semantics)."""
    import ray.data

    from engine.ops.vector import knn_brute

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((60, 8)) * rng.uniform(0.5, 3.0, (60, 1))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(60)]
    q = rng.standard_normal((3, 8))
    for metric in ("dot", "l2"):
        t = knn_brute(ray.data.from_items(rows), "embedding", "vec_id",
                      q, k=5, metric=metric).to_pylist()
        for qi in range(3):
            got = [r["vec_id"] for r in sorted(
                (r for r in t if r["query_id"] == qi),
                key=lambda r: r["rank"])]
            if metric == "dot":
                s = vecs @ q[qi]
            else:
                d2 = ((vecs - q[qi]) ** 2).sum(axis=1)
                s = 1.0 / (1.0 + d2)
            ref = sorted(range(60), key=lambda i: (-s[i], i))[:5]
            assert got == ref, (metric, qi)


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


def test_simhash_vectorized_matches_reference_formulation():
    """The batch-vectorized simhash64 must equal the per-doc formula."""
    import hashlib

    from engine.ops.dedup import simhash64

    texts = pa.array([
        "the quick brown fox", "the quick brown fox", "", "one one one two",
        "a b c d e f g", "zebra quartz nimbus zebra",
    ])
    got = simhash64(texts)

    def ref_one(text: str) -> int:
        toks = [t for t in text.split() if t]
        if not toks:
            return 0
        uniq, cnt = np.unique(np.array(toks, dtype=object),
                              return_counts=True)
        h64 = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
             for s in uniq),
            dtype=np.uint64, count=len(uniq))
        bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64))
                & np.uint64(1)).astype(np.int64)
        acc = ((2 * bits - 1) * cnt[:, None]).sum(axis=0)
        sig = 0
        for b in np.flatnonzero(acc > 0):
            sig |= 1 << int(b)
        return sig

    for i, t in enumerate(texts.to_pylist()):
        assert int(got[i]) == ref_one(t), (i, t)


def test_popcount64():
    from engine.ops.dedup import _popcount64

    rng = np.random.default_rng(3)
    xs = rng.integers(0, 1 << 63, size=1000, dtype=np.int64).astype(np.uint64)
    xs[:4] = [0, 1, (1 << 64) - 1, 1 << 63]
    got = _popcount64(xs)
    want = np.array([bin(int(x)).count("1") for x in xs])
    assert np.array_equal(got, want)


def test_lsh_bucket_cap_bounds_adversarial_batch(ray_session):
    """All-identical docs: every banding op must complete in bounded
    time by dropping the degenerate bucket (cap), not go O(n^2)."""
    import ray.data

    from engine.ops.dedup import minhash_lsh_pairs, simhash_pairs

    n = 400
    tab = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["same boilerplate text repeated here"] * n),
    })
    ds = ray.data.from_arrow(tab)
    # cap smaller than the bucket: the degenerate bucket is dropped
    out = simhash_pairs(ds, "text", "doc_id", max_bucket=100)
    assert out.num_rows == 0
    out2 = minhash_lsh_pairs(ds, "text", "doc_id", max_bucket=100)
    assert out2.num_rows == 0
    # with the cap above the bucket size, all pairs appear
    out3 = simhash_pairs(ray.data.from_arrow(tab.slice(0, 30)),
                         "text", "doc_id", max_bucket=1000)
    assert out3.num_rows == 30 * 29 // 2


def test_cosine_pairs_lsh_matches_exact(ray_session):
    """Banded hyperplane LSH with per-bucket exact verify must equal
    the exact block-pair join for true near-dups (cosine ≈ 0.99+,
    where the band S-curve gives recall ~1; at looser thresholds LSH
    recall < 1 by design — the registry entry's recall on the sf data
    is pinned by its oracle instead)."""
    import ray.data

    from engine.ops.vector import cosine_pairs, cosine_pairs_lsh

    rng = np.random.default_rng(9)
    n, d = 300, 16
    base = rng.standard_normal((n, d))
    # plant tight near-dup clusters (the realistic dedup target)
    for i in range(0, 60, 3):
        base[i + 1] = base[i] + 0.05 * rng.standard_normal(d)
        base[i + 2] = base[i] + 0.05 * rng.standard_normal(d)
    tab = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(base.astype(np.float32))),
    })
    ds = ray.data.from_arrow(tab)
    exact = cosine_pairs(ds, "embedding", "vec_id", threshold=0.9)
    approx = cosine_pairs_lsh(ray.data.from_arrow(tab), "embedding",
                              "vec_id", threshold=0.9,
                              n_planes=24, n_bands=8)
    assert exact.num_rows >= 40
    assert exact["id_a"].to_pylist() == approx["id_a"].to_pylist()
    assert exact["id_b"].to_pylist() == approx["id_b"].to_pylist()


def test_topic_checkpointed_consumption(ray_session, tmp_path):
    """topic stream: only unconsumed files are delivered; commit
    advances the checkpoint; crash-before-commit redelivers."""
    import os

    import pyarrow.parquet as pq

    from engine.ops.relational import topic

    d = tmp_path / "feed"
    d.mkdir()
    ck = str(tmp_path / "ckpt.json")

    def land(name, lo, hi):
        pq.write_table(pa.table({
            "doc_id": pa.array(np.arange(lo, hi, dtype=np.int64))}),
            str(d / name))

    land("a.parquet", 0, 10)
    land("b.parquet", 10, 20)

    ds, new, commit = topic(str(d), ck)
    assert len(new) == 2 and ds.count() == 20
    # crash before commit: same batch redelivered
    ds2, new2, commit2 = topic(str(d), ck)
    assert sorted(new2) == sorted(new)
    commit2()

    land("c.parquet", 20, 25)
    ds3, new3, commit3 = topic(str(d), ck)
    assert [os.path.basename(f) for f in new3] == ["c.parquet"]
    assert sorted(ds3.take_all(), key=lambda r: r["doc_id"])[0]["doc_id"] == 20
    commit3()
    ds4, new4, _ = topic(str(d), ck)
    assert ds4 is None and new4 == []


def test_media_resize_and_frame_sample_plumbing(ray_session):
    """Resize (binary->binary) and frame sampling (row expansion)
    actor-pool stages: deterministic fake mode exercises the real
    distributed layout; real mode is stubbed."""
    import ray.data

    from engine.ops.multimodal import FrameSampler, MediaResizer

    rng = np.random.default_rng(4)
    payloads = [rng.integers(0, 256, size=n).astype(np.uint8).tobytes()
                for n in (2000, 700, 0, 128)]
    tab = pa.table({
        "media_id": pa.array(np.arange(4, dtype=np.int64)),
        "payload": pa.array(payloads, type=pa.binary()),
    })
    ds = ray.data.from_arrow(tab)
    resized = ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs=dict(id_cols=["media_id"], target_bytes=64),
        batch_size=2, concurrency=2, batch_format="pyarrow").take_all()
    resized.sort(key=lambda r: r["media_id"])
    assert [r["orig_bytes"] for r in resized] == [2000, 700, 0, 128]
    assert all(len(r["payload"]) <= 64 for r in resized)
    # deterministic: same stride slice
    assert resized[0]["payload"] == payloads[0][::2000 // 64][:64]

    frames = ray.data.from_arrow(tab).map_batches(
        FrameSampler,
        fn_constructor_kwargs=dict(id_cols=["media_id"], n_frames=3,
                                   frame_bytes=16),
        batch_size=2, concurrency=2, batch_format="pyarrow").take_all()
    assert len(frames) == 4 * 3
    f0 = sorted((r for r in frames if r["media_id"] == 0),
                key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in f0] == [0, 1, 2]
    assert f0[1]["frame"] == payloads[0][2000 // 3:2000 // 3 + 16]

    import pytest as _pt
    with _pt.raises(NotImplementedError):
        MediaResizer(mode="real")(tab)
    with _pt.raises(NotImplementedError):
        FrameSampler(mode="real")(tab)


# ----------------------------- graph / spatial / cartesian product

def test_gather_nodes_walk(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.ops import graph as gr

    edges1 = ray.data.from_arrow(pa.table({
        "src": [1, 1, 2, 3], "dst": [10, 11, 12, 13]}))
    edges2 = ray.data.from_arrow(pa.table({
        "src": [10, 11, 12, 99], "dst": [100, 101, 100, 999]}))
    t = gr.walk([(edges1, "src", "dst"), (edges2, "src", "dst")],
                pa.array([1, 2], type=pa.int64()))
    rows = list(zip(t["level"].to_pylist(), t["node"].to_pylist()))
    assert rows == [(1, 10), (1, 11), (1, 12), (2, 100), (2, 101)]


def test_gather_nodes_empty_frontier(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.ops import graph as gr

    edges = ray.data.from_arrow(pa.table({"src": [1], "dst": [2]}))
    out = gr.gather_nodes(edges, "src", "dst",
                          pa.array([], type=pa.int64()))
    assert len(out) == 0


def test_graph_query_semantics(ray_session):
    # {!graph}: docs link via (from -> docs whose `to` == value).
    # chain 1 -> 2 -> 3 -> 4 plus a 5<->6 cycle off to the side
    import pyarrow as pa
    import ray.data

    from engine.ops import graph as gr

    docs = ray.data.from_arrow(pa.table({
        "id": [1, 2, 3, 4, 5, 6],
        "nxt": [2, 3, 4, 99, 6, 5],     # from-field: points at `id`
    }))

    def roots_of(ids):
        return docs.filter(lambda r: r["id"] in ids)

    # maxDepth bounds the hop count
    t = gr.graph_query(docs, "id", "nxt", "id", roots_of({1}),
                       max_depth=1)
    assert t["id"].to_pylist() == [1, 2]
    t = gr.graph_query(docs, "id", "nxt", "id", roots_of({1}),
                       max_depth=2)
    assert t["id"].to_pylist() == [1, 2, 3]
    # fixed point: 4's from-value (99) matches nothing; depth 10 ends
    t = gr.graph_query(docs, "id", "nxt", "id", roots_of({1}),
                       max_depth=10)
    assert t["id"].to_pylist() == [1, 2, 3, 4]
    # cycle converges (5 -> 6 -> 5) instead of looping
    t = gr.graph_query(docs, "id", "nxt", "id", roots_of({5}),
                       max_depth=10)
    assert t["id"].to_pylist() == [5, 6]
    # returnRoot=false drops roots unless a hop re-reaches them
    t = gr.graph_query(docs, "id", "nxt", "id", roots_of({1}),
                       max_depth=2, return_root=False)
    assert t["id"].to_pylist() == [2, 3]
    t = gr.graph_query(docs, "id", "nxt", "id", roots_of({5}),
                       max_depth=10, return_root=False)
    assert t["id"].to_pylist() == [5, 6]    # cycle re-reaches the root


def test_graph_query_random_equivalence(ray_session):
    """Property: the broadcast-hop traversal equals a driver BFS on
    random doc tables, for every (max_depth, return_root) combo."""
    import ray.data

    from engine.ops import graph as gr

    rng = np.random.RandomState(23)
    for trial in range(5):
        n = int(rng.randint(3, 60))
        ids = np.arange(n, dtype=np.int64)
        nxt = rng.randint(0, max(1, 2 * n), size=n).astype(np.int64)
        docs = ray.data.from_arrow(pa.table({"id": ids, "nxt": nxt}))
        root_ids = set(rng.choice(ids, size=max(1, n // 5),
                                  replace=False).tolist())
        roots = docs.filter(lambda r: r["id"] in root_ids)
        by_to = {int(i): int(v) for i, v in zip(ids, nxt)}
        for depth in (0, 1, 2, 7):
            for rr in (True, False):
                got = gr.graph_query(docs, "id", "nxt", "id", roots,
                                     max_depth=depth, return_root=rr)
                # driver BFS reference over value->doc edges
                matched = set(root_ids) if rr else set()
                frontier = {by_to[i] for i in root_ids}
                queried: set[int] = set()
                for _ in range(depth):
                    new = frontier - queried
                    if not new:
                        break
                    queried |= new
                    hit = {i for i in by_to if i in new}
                    matched |= hit
                    frontier = {by_to[i] for i in hit}
                assert got["id"].to_pylist() == sorted(matched), \
                    (trial, depth, rr)


def test_shortest_path_all_paths(ray_session):
    # diamond with two 3-hop shortest paths plus a longer 4-hop detour
    import pyarrow as pa
    import ray.data

    from engine.ops import graph as gr

    edges = ray.data.from_arrow(pa.table({
        "f": [1, 1, 2, 3, 1, 5, 6],
        "t": [2, 3, 4, 4, 5, 6, 4]}))
    t = gr.shortest_path(edges, "f", "t", 1, 4, max_depth=5)
    assert t["path"].to_pylist() == ["1->2->4", "1->3->4"]
    assert t["depth"].to_pylist() == [2, 2]


def test_shortest_path_unreachable_and_depth_cut(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.ops import graph as gr

    edges = ray.data.from_arrow(pa.table({
        "f": [1, 2, 3], "t": [2, 3, 4]}))
    assert gr.shortest_path(edges, "f", "t", 1, 99, 5).num_rows == 0
    # dst is 3 hops away; max_depth=2 cuts the walk short
    assert gr.shortest_path(edges, "f", "t", 1, 4, 2).num_rows == 0
    full = gr.shortest_path(edges, "f", "t", 1, 4, 3)
    assert full["path"].to_pylist() == ["1->2->3->4"]
    # src == dst degenerates to the zero-hop path
    same = gr.shortest_path(edges, "f", "t", 2, 2, 3)
    assert same["path"].to_pylist() == ["2"]
    assert same["depth"].to_pylist() == [0]


def test_shortest_path_prunes_longer_routes(ray_session):
    # a shorter route wins even when a longer simple path also exists;
    # cycles must not loop the walk
    import pyarrow as pa
    import ray.data

    from engine.ops import graph as gr

    edges = ray.data.from_arrow(pa.table({
        "f": [1, 2, 1, 4, 2],
        "t": [2, 3, 4, 3, 1]}))
    t = gr.shortest_path(edges, "f", "t", 1, 3, 6)
    assert t["path"].to_pylist() == ["1->2->3", "1->4->3"]
    assert t["depth"].to_pylist() == [2, 2]


def test_spatial_quantize_half_up():
    import numpy as np

    from engine.ops.spatial import haversine_km, quantize_km

    assert quantize_km(np.array([1.0005]))[0] == 1.001
    assert quantize_km(np.array([1.00049]))[0] == 1.0
    # antipodal sanity: half circumference ~ 20015 km
    d = haversine_km(0.0, 0.0, np.array([0.0]), np.array([180.0]))
    assert abs(d[0] - np.pi * 6371.0) < 1e-6


def test_cartesian_product_explodes_with_ordinals(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.ops import relational as rel

    ds = ray.data.from_arrow(pa.table({
        "id": [1, 2, 3],
        "v": [[1.5, 2.5], [], [7.0]]}))
    t = rel.cartesian_product(ds, "v").take_all()
    rows = sorted((r["id"], r["pos"], r["val"]) for r in t)
    assert rows == [(1, 1, 1.5), (1, 2, 2.5), (3, 1, 7.0)]


def test_naive_bayes_train_classify_roundtrip(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.ops import classify as cl

    # two clearly separated vocabularies
    rows = pa.table({
        "doc_id": list(range(8)),
        "text": ["apple banana apple", "banana apple fruit",
                 "apple fruit fruit", "banana banana apple",
                 "motor engine wheel", "wheel engine motor",
                 "engine motor motor", "wheel wheel engine"],
        "label": ["food"] * 4 + ["car"] * 4})
    ds = ray.data.from_arrow(rows)
    model = cl.naive_bayes_train(ds, "text", "label")
    assert model["classes"] == ["car", "food"]
    out = cl.naive_bayes_classify(ds, "text", ["doc_id"], model) \
        .take_all()
    preds = {r["doc_id"]: r["label_pred"] for r in out}
    assert all(preds[i] == "food" for i in range(4))
    assert all(preds[i] == "car" for i in range(4, 8))


def test_train_logistic_matches_reference(ray_session):
    """Integer-GD logistic trainer vs a pure-Python single-process
    replay (same hard-sigmoid fixed point, same floor divisions) —
    the distributed partial-sum path must be bit-identical, and must
    be invariant to how rows are split across blocks."""
    import pyarrow as pa
    import ray.data

    from engine.ops import classify as cl

    terms = ["apple", "engine"]
    texts = ["apple banana apple", "banana apple fruit",
             "apple fruit fruit", "banana banana apple",
             "motor engine wheel", "wheel engine motor",
             "engine motor motor", "wheel wheel engine",
             "apple engine hybrid", "plain words only"]
    labels = ["food"] * 4 + ["car"] * 4 + ["food", "car"]

    # pure-python reference replay
    x = [[1 if t in txt.split() else 0 for t in terms] for txt in texts]
    y = [1_000_000 if l == "food" else 0 for l in labels]
    n = len(texts)
    w = [0, 0, 0]
    for _ in range(3):
        g = [0, 0, 0]
        for xi, yi in zip(x, y):
            z = w[0] + sum(a * b for a, b in zip(xi, w[1:]))
            hs = min(max(z + 2_000_000, 0), 4_000_000) // 4
            err = hs - yi
            g[0] += err
            for j in range(2):
                g[j + 1] += err * xi[j]
        w = [w[j] - (g[j] // (2 * n)) for j in range(3)]

    for nblocks in (1, 3):
        ds = ray.data.from_arrow(
            pa.table({"text": texts, "label": labels})) \
            .repartition(nblocks)
        out = cl.train_logistic(ds, "text", "label", "food", terms,
                                iterations=3)
        got = dict(zip(out["feature"].to_pylist(),
                       out["weight_micro"].to_pylist()))
        assert got["__bias__"] == w[0]
        assert got["apple"] == w[1]
        assert got["engine"] == w[2]


def test_features_select_and_logit_classify(ray_session):
    """chi² feature selection picks the perfectly-separating terms
    first, and the trained logistic model's predictions agree with
    sign(z) computed from its own returned weights."""
    import pyarrow as pa
    import ray.data

    from engine.ops import classify as cl

    texts = ["apple banana", "apple fruit", "apple pie", "apple tart",
             "motor wheel", "motor engine", "motor oil", "motor brake",
             "shared word", "shared word"]
    labels = ["food"] * 4 + ["car"] * 4 + ["food", "car"]
    ds = ray.data.from_arrow(pa.table({"text": texts, "label": labels,
                                       "doc_id": list(range(10))}))

    top = cl.features_select(ds, "text", "label", "food", k=3)
    terms = top["term"].to_pylist()
    # apple (4 pos / 0 neg) and motor (0 pos / 4 neg) dominate
    assert set(terms[:2]) == {"apple", "motor"}
    assert top["chi2"].to_pylist()[0] > top["chi2"].to_pylist()[2]

    w = cl.train_logistic(ds, "text", "label", "food",
                          ["apple", "motor"], iterations=3)
    out = cl.logistic_classify(ds, "text", ["doc_id"], w) \
        .take_all()
    wd = dict(zip(w["feature"].to_pylist(),
                  w["weight_micro"].to_pylist()))
    for r in out:
        xs = [1 if t in texts[r["doc_id"]].split() else 0
              for t in ["apple", "motor"]]
        z = wd["__bias__"] + xs[0] * wd["apple"] + xs[1] * wd["motor"]
        assert r["z_micro"] == z
        assert r["pred"] == (1 if z > 0 else 0)


def test_monitor_percolation(ray_session):
    """Registered-query monitor: term / AND / phrase kinds, no
    cross-document phrase adjacency, never-matching query silent."""
    import pyarrow as pa
    import ray.data

    from engine.ops import monitor as mon

    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["alpha beta gamma",        # q_and needs beta+gamma
                 "alpha ends with beta",    # only beta -> no q_and
                 "x y beta",                # phrase candidate: doc 3
                 "gamma starts here beta gamma"]})  # phrase beta gamma
    qs = [
        {"id": "q_alpha", "kind": "term", "terms": ["alpha"]},
        {"id": "q_and", "kind": "and", "terms": ["beta", "gamma"]},
        {"id": "q_ph", "kind": "phrase", "terms": ["beta", "gamma"]},
        {"id": "q_no", "kind": "term", "terms": ["zzz"]},
    ]
    out = mon.monitor_match(ray.data.from_arrow(docs), "text",
                            "doc_id", qs).take_all()
    got = sorted((r["doc_id"], r["query_id"]) for r in out)
    # doc 3 ends with beta, doc 4 starts with gamma: adjacency must
    # NOT leak across the block/doc boundary
    assert got == [(1, "q_alpha"), (1, "q_and"), (1, "q_ph"),
                   (2, "q_alpha"), (4, "q_and"), (4, "q_ph")]
    # multi-block split must not change the result
    out2 = mon.monitor_match(
        ray.data.from_arrow(docs).repartition(4), "text", "doc_id",
        qs).take_all()
    assert sorted((r["doc_id"], r["query_id"]) for r in out2) == got


def test_interval_facet_overlapping(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.ops import relational as rel

    ds = ray.data.from_arrow(pa.table({"v": [1.0, 5.0, 9.0, 15.0]}))
    t = rel.interval_facet(ds, "v", [
        ("a", None, 10.0), ("b", 4.0, 16.0), ("c", 100.0, None)])
    got = {r["interval"]: r["sum(n)"] for r in t.take_all()}
    assert got == {"a": 3, "b": 3, "c": 0}


def test_daemon_runner_ticks(ray_session):
    from engine.ops.relational import DaemonRunner

    seen = []
    d = DaemonRunner(lambda: seen.append(len(seen)) or len(seen),
                     interval_sec=0.0)
    slept = []
    d.run(3, sleep=lambda s: slept.append(s))
    assert d.iterations == 3 and d.last_result == 3
    assert len(slept) == 2


def test_knn_ivf_full_probe_equals_brute(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.ops import vector as vec

    rng = np.random.default_rng(11)
    n, d = 400, 16
    m = rng.normal(size=(n, d)).astype(np.float32)
    tab = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                    "embedding": pa.array(list(m))})
    ds1 = ray.data.from_arrow(tab)
    ds2 = ray.data.from_arrow(tab)
    q = m[:3].astype(np.float64)
    brute = vec.knn_brute(ds1, "embedding", "vec_id", q, k=5)
    ivf = vec.knn_ivf(ds2, "embedding", "vec_id", q, k=5,
                      n_clusters=8, nprobe=8, sample_n=200)
    assert brute["vec_id"].to_pylist() == ivf["vec_id"].to_pylist()
    assert brute["rank"].to_pylist() == ivf["rank"].to_pylist()


def test_knn_ivf_partial_probe_recall(ray_session):
    """Partial probes trade recall for scan fraction; on clustered
    data recall stays high. Deterministic given fixed seed/algorithm."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.ops import vector as vec

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(6, 16)) * 4
    pts = np.vstack([c + rng.normal(size=(80, 16)) for c in centers])
    n = len(pts)
    tab = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                    "embedding": pa.array(
                        list(pts.astype(np.float32)))})
    q = pts[:2]
    brute = vec.knn_brute(ray.data.from_arrow(tab), "embedding",
                          "vec_id", q, k=10)
    ivf = vec.knn_ivf(ray.data.from_arrow(tab), "embedding", "vec_id",
                      q, k=10, n_clusters=6, nprobe=2, sample_n=480)
    got = set(zip(ivf["query_id"].to_pylist(),
                  ivf["vec_id"].to_pylist()))
    want = set(zip(brute["query_id"].to_pylist(),
                   brute["vec_id"].to_pylist()))
    recall = len(got & want) / len(want)
    assert recall >= 0.8, recall


def test_read_solr_xml_loader(ray_session, tmp_path):
    from engine.ops.loaders import read_solr_xml

    x1 = tmp_path / "a.xml"
    x1.write_text(
        "<add>"
        "<doc><field name='id'>1</field>"
        "<field name='text'>hello world</field>"
        "<field name='tag'>x</field><field name='tag'>y</field></doc>"
        "<doc><field name='id'>2</field>"
        "<field name='text'>second doc</field></doc>"
        "</add>")
    x2 = tmp_path / "b.xml"
    x2.write_text(
        "<add><doc><field name='id'>3</field>"
        "<field name='text'>third</field></doc></add>")
    rows = sorted(read_solr_xml([str(x1), str(x2)]).take_all(),
                  key=lambda r: r["id"])
    assert [r["id"] for r in rows] == ["1", "2", "3"]
    assert rows[0]["tag"] == ["x", "y"]
    assert rows[2]["text"] == "third"


def test_score_nodes_tfidf_ranking(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.ops import graph as gr

    # edges: node 100 is globally common (low idf), 200 is rare
    edges = ray.data.from_arrow(pa.table({
        "src": [1, 1, 2, 9, 9, 9, 9, 9, 9],
        "dst": [100, 200, 200, 100, 100, 100, 100, 100, 100]}))
    t = gr.score_nodes(edges, "src", "dst",
                       pa.array([1, 2], type=pa.int64()))
    rows = {r["node"]: (r["cnt"], r["score"])
            for r in t.to_pylist()}
    assert rows[200][0] == 2 and rows[100][0] == 1
    assert rows[200][1] > rows[100][1]          # rare node outranks
    assert t["node"].to_pylist()[0] == 200


def test_score_nodes_empty_frontier(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.ops import graph as gr

    edges = ray.data.from_arrow(pa.table({"src": [1], "dst": [2]}))
    t = gr.score_nodes(edges, "src", "dst",
                       pa.array([], type=pa.int64()))
    assert t.num_rows == 0 and t.column_names == ["node", "cnt", "score"]


def test_daemon_service_mode_wall_clock():
    """start()/stop() run ticks on a background thread at the
    configured interval (the reference daemon's long-lived service)."""
    import time

    from engine.ops.relational import DaemonRunner

    ticks = []
    d = DaemonRunner(lambda: ticks.append(time.monotonic()),
                     interval_sec=0.02)
    d.start()
    time.sleep(0.15)
    n = d.stop()
    assert n >= 3, f"expected >=3 wall-clock ticks, got {n}"
    assert d.iterations == n
    # idempotent start after stop
    d.start()
    time.sleep(0.05)
    assert d.stop() > n


def test_payload_store_sum_max_and_default(ray_session, tmp_path):
    """Delimited-payload ingest + PayloadScoreQuery: sum/max aggs,
    default payload for undelimited tokens, docID tie-break."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.ops import payload as pl

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["cat|2.0 dog|1 cat|3.5",
                          "cat dog|4",      # cat → default 1.0
                          "bird|9"])}), src / "p.parquet")
    store = str(tmp_path / "store")
    pl.build_payload_index(str(src), store, default=1.0)
    s = pl.payload_score_topk(store, "cat", k=10, agg="sum")
    assert s["doc_id"].to_pylist() == [0, 1]
    assert s["score"].to_pylist() == [np.float32(5.5), np.float32(1.0)]
    m = pl.payload_score_topk(store, "cat", k=10, agg="max")
    assert m["score"].to_pylist() == [np.float32(3.5), np.float32(1.0)]
    assert pl.payload_score_topk(store, "zebra", k=3).num_rows == 0
    # rebuild is a no-op (manifest marker)
    assert pl.build_payload_index(str(src), store) == store


def test_connected_components_known_graph(ray_session):
    """Hash-to-min CC: chain (worst-case diameter), clique, pair,
    and a node order that makes the min non-first."""
    import ray.data

    import engine.ops.dedup as dd

    # chain 10-11-...-17, triangle {3,5,9} (via 2 edges), pair {20,40}
    edges = pa.table({
        "id_a": pa.array([10, 11, 12, 13, 14, 15, 16, 5, 9, 40],
                         type=pa.int64()),
        "id_b": pa.array([11, 12, 13, 14, 15, 16, 17, 3, 3, 20],
                         type=pa.int64())})
    out = dd.connected_components(
        ray.data.from_arrow(edges), "id_a", "id_b")
    lab = dict(zip(out["doc_id"].to_pylist(),
                   out["cluster_id"].to_pylist()))
    assert {d: lab[d] for d in range(10, 18)} == {d: 10 for d in range(10, 18)}
    assert lab[3] == lab[5] == lab[9] == 3
    assert lab[20] == lab[40] == 20
    assert len(lab) == 13
    # empty edge set
    empty = dd.connected_components(
        ray.data.from_arrow(edges.slice(0, 0)), "id_a", "id_b")
    assert empty.num_rows == 0


def test_sessionize_multiblock_boundaries(ray_session):
    """Sessions spanning sorted-block boundaries must merge exactly:
    compare the distributed two-pass against a single-process
    reference over a crafted stream, forced through many blocks."""
    import ray.data

    import engine.ops.relational as rel

    GAP = 100
    rng = np.random.default_rng(42)
    users = rng.integers(0, 7, size=400)
    ts = np.sort(rng.integers(0, 5000, size=400))
    eid = np.arange(400)
    t = pa.table({"user_id": pa.array(users, type=pa.int64()),
                  "ts": pa.array(ts, type=pa.timestamp("us")),
                  "event_id": pa.array(eid, type=pa.int64())})
    ds = ray.data.from_arrow(t).repartition(13)
    out = rel.sessionize(ds, "user_id", "ts", "event_id", GAP)

    # single-process reference
    order = np.lexsort((eid, ts.astype(np.int64), users))
    u, s, e2 = users[order], ts.astype(np.int64)[order], eid[order]
    ref = {}
    cur = {}
    for i in range(len(u)):
        uu, tt = int(u[i]), int(s[i])
        last = cur.get(uu)
        if last is None or tt - last[1] > GAP:
            cur[uu] = [tt, tt, 0]
        cur[uu][1] = tt
        key = (uu, cur[uu][0])
        st, en, n = ref.get(key, (tt, tt, 0))
        ref[key] = (key[1], max(en, tt), n + 1)
    got = {(int(r["user_id"]), int(r["session_start"])):
           (int(r["session_start"]), int(r["session_end"]),
            int(r["n_events"]))
           for r in out.to_pylist()}
    assert got == ref


def test_context_windows_multiblock(ray_session):
    """Windows crossing sorted-block boundaries, including blocks
    SHORTER than the window (rolling carry stitch): compare against a
    single-process reference."""
    import ray.data

    import engine.ops.relational as rel

    W = 4
    rng = np.random.default_rng(11)
    n = 60
    users = rng.integers(0, 4, size=n)
    ts = np.sort(rng.integers(0, 500, size=n))
    eid = np.arange(n)
    vals = np.array([f"e{v}" for v in rng.integers(0, 5, size=n)])
    t = pa.table({"user_id": pa.array(users, type=pa.int64()),
                  "ts": pa.array(ts, type=pa.timestamp("us")),
                  "event_id": pa.array(eid, type=pa.int64()),
                  "event_type": pa.array(vals, type=pa.string())})
    # 50 partitions over 60 rows → most blocks are shorter than W
    ds = ray.data.from_arrow(t).repartition(50)
    out = rel.context_windows(ds, "user_id", "ts", "event_id",
                              "event_type", w=W)
    got = dict(zip(out["event_id"].to_pylist(),
                   out["ctx"].to_pylist()))

    order = np.lexsort((eid, ts.astype(np.int64), users))
    hist: dict[int, list[str]] = {}
    ref = {}
    for i in order:
        u = int(users[i])
        hist.setdefault(u, []).append(str(vals[i]))
        ref[int(eid[i])] = " ".join(hist[u][-W:])
    assert got == ref


def test_tdigest_accuracy_and_merge():
    from engine.ops.sketch import TDigest

    rng = np.random.default_rng(7)
    vals = rng.standard_normal(100_000) * 10 + 50
    merged = TDigest(100)
    for part in np.array_split(vals, 23):
        merged.merge(TDigest(100).add(part))
    sd = float(np.std(vals))
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        exact = float(np.quantile(vals, q))
        assert abs(merged.quantile(q) - exact) / sd < 0.01, q
    # compression bounds the state; weight is conserved exactly
    assert len(merged.means) <= 200
    assert int(merged.weights.sum()) == len(vals)
    # edge cases
    assert np.isnan(TDigest().quantile(0.5))
    one = TDigest().add(np.array([42.0]))
    assert one.quantile(0.0) == one.quantile(1.0) == 42.0


def test_tdigest_group_quantile(ray_session):
    import ray.data

    from engine.ops.sketch import tdigest_group_quantile

    rng = np.random.default_rng(11)
    n = 20_000
    t = pa.table({
        "k": pa.array(np.where(rng.random(n) < 0.5, "a", "b")),
        "v": pa.array(rng.exponential(5.0, size=n))})
    out = tdigest_group_quantile(
        ray.data.from_arrow(t).repartition(8), "k", "v", 0.9) \
        .to_pandas().set_index("k")
    df = t.to_pandas()
    for k in ("a", "b"):
        exact = df[df["k"] == k]["v"].quantile(0.9)
        got = out.loc[k, "quantile"]
        assert abs(got - exact) / exact < 0.02, (k, got, exact)


def test_pairs_in_buckets_matches_bruteforce():
    """Property: the vectorized size-batched pair generator equals the
    obvious per-bucket triu reference, including multiplicity counts
    and the max_bucket drop rule."""
    from itertools import combinations

    from engine.ops.dedup import _pairs_in_buckets

    rng = np.random.RandomState(7)
    for trial in range(20):
        n = rng.randint(1, 400)
        keys = rng.randint(0, rng.randint(1, 40), size=n).astype(np.int64)
        docs = rng.randint(0, 60, size=n).astype(np.int64)
        # buckets must hold unique docs (the generator's contract)
        seen = set()
        keep = []
        for i, (k, d) in enumerate(zip(keys, docs)):
            if (k, d) not in seen:
                seen.add((k, d))
                keep.append(i)
        keys, docs = keys[keep], docs[keep]
        max_bucket = int(rng.randint(2, 25))
        got = _pairs_in_buckets(keys, docs, max_bucket, "test")
        want: dict[tuple[int, int], int] = {}
        for k in np.unique(keys):
            members = np.sort(docs[keys == k])
            if len(members) < 2 or len(members) > max_bucket:
                continue
            for a, b in combinations(members.tolist(), 2):
                want[(a, b)] = want.get((a, b), 0) + 1
        got_map = {(a, b): c for a, b, c in zip(
            got["id_a"].to_pylist(), got["id_b"].to_pylist(),
            got["n"].to_pylist())}
        assert got_map == want, trial


def test_connected_components_random_graphs(ray_session):
    """Property: coarse-grouped hash-to-min equals a driver union-find
    on random graphs (labels = component-min doc_id)."""
    import ray.data

    from engine.ops.dedup import connected_components

    rng = np.random.RandomState(11)
    for trial in range(5):
        n_edges = int(rng.randint(1, 120))
        a = rng.randint(0, 300, size=n_edges).astype(np.int64)
        b = rng.randint(0, 300, size=n_edges).astype(np.int64)
        ok = a != b
        a, b = a[ok], b[ok]
        if not len(a):
            continue
        edges = ray.data.from_arrow(pa.table({"id_a": a, "id_b": b}))
        got = connected_components(edges, "id_a", "id_b")
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in zip(a.tolist(), b.tolist()):
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        want = {x: find(x) for x in set(a.tolist()) | set(b.tolist())}
        got_map = dict(zip(got["doc_id"].to_pylist(),
                           got["cluster_id"].to_pylist()))
        assert got_map == want, trial


def test_ppm_decode_roundtrip_and_resize():
    """synth → decode is exact (shape + every pixel), resize is a
    strided view of the same pixels, odd dims truncate correctly."""
    import numpy as np

    from engine.ops.multimodal import decode_ppm, resize_nearest, synth_ppm

    img = decode_ppm(synth_ppm(7, 5, 3))
    assert img.shape == (3, 5, 3)
    for y in range(3):
        for x in range(5):
            for c in range(3):
                assert img[y, x, c] == (x + 2 * y + 3 * c + 7) % 256
    half = resize_nearest(img, 2)
    assert half.shape == (2, 3, 3)
    assert (half == img[::2, ::2, :]).all()
    # corrupt header rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\nx")


def test_wav_decode_roundtrip_and_chunk_walk():
    """synth → decode exact; an extra unknown RIFF chunk (odd-sized,
    word-aligned) before data must be skipped like any RIFF reader."""
    import struct

    import numpy as np
    import pytest as _pytest

    from engine.ops.multimodal import decode_wav, synth_wav

    p = synth_wav(4, 20, sample_rate=8000)
    s, rate = decode_wav(p)
    assert rate == 8000 and len(s) == 20
    t = np.arange(20, dtype=np.int64)
    assert (s.astype(np.int64) == ((t * 5 + 7) % 4096) - 2048).all()

    # splice an unknown odd-length chunk between fmt and data
    fmt_end = p.index(b"data")
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad
    p2 = p[:fmt_end] + junk + p[fmt_end:]
    p2 = p2[:4] + struct.pack("<I", len(p2) - 8) + p2[8:]
    s2, _ = decode_wav(p2)
    assert (s2 == s).all()

    with _pytest.raises(ValueError):
        decode_wav(b"RIFX" + p[4:])


def test_y4m_parse_roundtrip_and_frame_params():
    """synth → parse exact (dims + every sampled Y pixel); FRAME lines
    carrying optional parameters (allowed by the spec) must parse."""
    import numpy as np
    import pytest as _pytest

    from engine.ops.multimodal import decode_y4m, synth_y4m

    p = synth_y4m(3, 8, 4, 3)
    w, h, frames = decode_y4m(p)
    assert (w, h, len(frames)) == (8, 4, 3)
    for f in range(3):
        x = np.arange(8).reshape(1, 8)
        y = np.arange(4).reshape(4, 1)
        assert (frames[f].astype(np.int64)
                == (x + y + 5 * f + 3) % 256).all()

    # frame-level parameters after FRAME are legal — inject one
    p2 = p.replace(b"FRAME\n", b"FRAME Ip\n", 1)
    _, _, frames2 = decode_y4m(p2)
    assert (frames2[0] == frames[0]).all()

    with _pytest.raises(ValueError):
        decode_y4m(b"JUNK\n")
    with _pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W8 H4 C444\n")


def test_tag_dictionary_counts_and_boundaries(ray_session):
    """Dictionary tagger: per-doc occurrence counts, overlapping
    matches counted per start position, no cross-doc windows, absent
    phrase silent, multi-block invariant."""
    import pyarrow as pa
    import ray.data

    from engine.ops.monitor import tag_dictionary

    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["a b a b a",          # 'a b' twice, 'b a' twice
                 "x y z ends with a",  # next doc starts with b:
                 "b starts here a b"]})  # no cross-doc 'a b'
    for nblocks in (1, 3):
        out = tag_dictionary(
            ray.data.from_arrow(docs).repartition(nblocks),
            "text", "doc_id", ["a b", "b a", "zz qq"]).take_all()
        got = sorted((r["doc_id"], r["phrase"], r["n"]) for r in out)
        assert got == [(1, "a b", 2), (1, "b a", 2), (3, "a b", 1)]


def test_winnow_guarantee_and_boundaries(ray_session):
    """Winnowing (SIGMOD'03): docs sharing a token run of length
    >= k+w-1 share at least one fingerprint; short docs fall back to
    min-of-all; sub-k docs emit nothing."""
    import ray.data

    from engine.ops.dedup import winnow_fingerprints

    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta"   # 6 >= k+w-1
    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [f"one two {shared} three",
                 f"nine {shared} ten eleven",
                 "tiny doc here four",       # 4 tokens -> 2 windows < w
                 "ab cd"],                   # < k tokens -> no windows
    }))
    t = winnow_fingerprints(docs, "text", "doc_id", k=k, w=w)
    by = {}
    for i, fp in zip(t["doc_id"].to_pylist(), t["fp"].to_pylist()):
        by.setdefault(i, set()).add(fp)
    assert by[1] & by[2], "shared run must share a fingerprint"
    assert len(by[3]) == 1, "short doc selects min-of-all once"
    assert 4 not in by, "sub-k docs emit no fingerprints"
    # selection compresses: fewer fingerprints than windows
    n_windows_1 = len("one two".split()) + 6 + 1 - (k - 1) - 1
    assert len(by[1]) < n_windows_1


def test_exact_substring_spans_planted_duplicate(ray_session):
    """A 12-token passage planted in two docs: each must report one
    maximal span exactly covering the passage (k=8 windows merged by
    gaps-and-islands); a doc without the passage reports nothing;
    within-doc repetition also counts (>=2 occurrences total)."""
    import pyarrow as pa
    import ray.data

    from engine.ops.dedup import exact_substring_spans

    passage = [f"dup{i}" for i in range(12)]
    docs = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            " ".join(["lead1", "lead2"] + passage + ["tail1"]),
            " ".join(passage + ["other", "words", "entirely"]),
            "nothing shared with anyone here at all today ok",
            # within-doc repeat of an 8-token run
            " ".join([f"rep{i % 8}" for i in range(16)]),
        ]})
    out = exact_substring_spans(
        ray.data.from_arrow(docs).repartition(2), "text", "doc_id",
        k=8).to_pylist()
    spans = {(r["doc_id"], r["span_start"], r["span_len"])
             for r in out}
    assert (0, 2, 12) in spans
    assert (1, 0, 12) in spans
    assert not any(r["doc_id"] == 2 for r in out)
    # within-doc: only the two aligned rep0..rep7 windows repeat (the
    # rotations occur once each), so two 8-token spans — not one 16
    assert (3, 0, 8) in spans and (3, 8, 8) in spans


def test_new_ops_block_split_invariance(ray_session):
    """The two-pass broadcast ops must be bitwise invariant to how
    rows are split across blocks: exact-substring spans, bigram-LM
    scores (f64-exact) and chunk windows on a random corpus."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.ops.dedup import exact_substring_spans
    from engine.ops.textstats import bigram_lm_score, chunk_windows

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 40)))
             for _ in range(60)]
    tab = pa.table({"doc_id": list(range(60)), "text": texts})

    def canon(rows, keys):
        return sorted(tuple(r[k] for k in keys) for r in rows)

    base_spans = canon(exact_substring_spans(
        ray.data.from_arrow(tab), "text", "doc_id", k=4).to_pylist(),
        ["doc_id", "span_start", "span_len"])
    base_lm = canon(bigram_lm_score(
        ray.data.from_arrow(tab), "text", "doc_id").take_all(),
        ["doc_id", "n_bigrams", "logprob"])
    base_ch = canon(chunk_windows(
        ray.data.from_arrow(tab), "text", "doc_id",
        window=16, stride=12).take_all(),
        ["doc_id", "chunk", "start_tok", "len_toks"])

    for nblocks in (3, 7):
        ds = ray.data.from_arrow(tab).repartition(nblocks)
        assert canon(exact_substring_spans(
            ds, "text", "doc_id", k=4).to_pylist(),
            ["doc_id", "span_start", "span_len"]) == base_spans
        assert canon(bigram_lm_score(ds, "text", "doc_id").take_all(),
                     ["doc_id", "n_bigrams", "logprob"]) == base_lm
        assert canon(chunk_windows(ds, "text", "doc_id", window=16,
                                   stride=12).take_all(),
                     ["doc_id", "chunk", "start_tok", "len_toks"]) \
            == base_ch


def test_media_decoders_randomized_roundtrip():
    """Randomized synth→decode round-trips for all three pure-numpy
    media decoders: every pixel/sample/frame must survive exactly for
    arbitrary dims (odd sizes included — C420 needs even dims for the
    chroma planes, luma is what we check)."""
    import numpy as np

    from engine.ops.multimodal import (decode_ppm, decode_wav,
                                       decode_y4m, synth_ppm,
                                       synth_wav, synth_y4m)

    rng = np.random.default_rng(23)
    for _ in range(10):
        w = int(rng.integers(1, 40))
        h = int(rng.integers(1, 30))
        did = int(rng.integers(0, 10_000))
        img = decode_ppm(synth_ppm(did, w, h))
        assert img.shape == (h, w, 3)
        x = np.arange(w).reshape(1, w, 1)
        y = np.arange(h).reshape(h, 1, 1)
        c = np.arange(3).reshape(1, 1, 3)
        assert (img.astype(np.int64)
                == (x + 2 * y + 3 * c + did) % 256).all()

        n = int(rng.integers(1, 500))
        s, rate = decode_wav(synth_wav(did, n))
        t = np.arange(n, dtype=np.int64)
        assert (s.astype(np.int64)
                == ((t * (did + 1) + 7) % 4096) - 2048).all()

        fw = 2 * int(rng.integers(1, 12))
        fh = 2 * int(rng.integers(1, 8))
        nf = int(rng.integers(1, 6))
        w2, h2, frames = decode_y4m(synth_y4m(did, fw, fh, nf))
        assert (w2, h2, len(frames)) == (fw, fh, nf)
        xx = np.arange(fw).reshape(1, fw)
        yy = np.arange(fh).reshape(fh, 1)
        for f in range(nf):
            assert (frames[f].astype(np.int64)
                    == (xx + yy + 5 * f + did) % 256).all()


def test_knn_int8_exact_integer_and_recall(ray_session):
    """int8 scalar quantization: the distributed result must equal a
    single-process numpy replay of the same quantization (exact int64
    dots), and top-1 self-match must survive quantization."""
    import ray.data

    from engine.ops.vector import knn_int8

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((80, 12)) * rng.uniform(0.2, 5.0, (1, 12))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()}
            for i in range(80)]
    q = vecs[:3]
    t = knn_int8(ray.data.from_items(rows), "embedding", "vec_id",
                 q, k=4).to_pylist()
    # numpy replay
    mab = np.abs(vecs).max(axis=0)
    sc = np.where(mab > 0, 127.0 / mab, 0.0)
    v8 = np.floor(vecs * sc + 0.5).astype(np.int64)
    q8 = np.floor(q * sc + 0.5).astype(np.int64)
    dots = v8 @ q8.T
    for qi in range(3):
        d = dots[:, qi]
        order = np.lexsort((np.arange(80), -d))[:4]
        got = sorted((r for r in t if r["query_id"] == qi),
                     key=lambda r: r["rank"])
        assert [r["vec_id"] for r in got] == order.tolist()
        assert [r["dot"] for r in got] == d[order].tolist()
        assert got[0]["vec_id"] == qi      # self-match survives int8


def test_dsir_importance_separates_strata(ray_session):
    """Docs made of target-only vocabulary must out-weigh docs made
    of source-only vocabulary; block splits don't change weights."""
    import ray

    from engine.ops.textstats import dsir_importance

    tgt_text = "alpha beta gamma alpha beta"
    src_text = "delta epsilon zeta delta epsilon"
    rows = ([{"id": i, "text": tgt_text, "tgt": True}
             for i in range(8)]
            + [{"id": 100 + i, "text": src_text, "tgt": False}
               for i in range(8)]
            + [{"id": 200, "text": "alpha beta", "tgt": False},
               {"id": 201, "text": "", "tgt": False}])
    for nblocks in (1, 4):
        ds = ray.data.from_items(rows).repartition(nblocks)
        out = dsir_importance(ds, "text", "id", "tgt") \
            .to_pandas().set_index("id")["dsir_logw"].sort_index()
        # target-vocab docs score strictly above source-vocab docs
        assert out[0] > out[100]
        # the mixed doc (target vocab, source stratum) still leans
        # target because the vocabulary drives the weight
        assert out[200] > out[100]
        # empty text → exactly 0
        assert out[201] == 0.0
        if nblocks == 1:
            base = out
        else:
            assert (out == base).all()


def test_ccnet_partition_ntile_sizes(ray_session):
    """ntile cut: with n=10, k=3 the buckets hold 4/3/3 docs; more
    fluent (higher avg bigram logprob) docs land in bucket 1; block
    splits don't change the assignment."""
    import ray

    from engine.ops.textstats import ccnet_partition

    # 5 docs of a frequent pattern (fluent) + 5 of rare word salad
    rows = [{"id": i, "text": "the cat sat on the mat " * 3}
            for i in range(5)]
    rows += [{"id": 10 + i, "text": f"zq{i} xv{i} wk{i} jd{i} qb{i}"}
             for i in range(5)]
    base = None
    for nblocks in (1, 3):
        ds = ray.data.from_items(rows).repartition(nblocks)
        out = ccnet_partition(ds, "text", "id", k=3).to_pandas() \
            .set_index("id").sort_index()
        counts = out["bucket"].value_counts().sort_index()
        assert counts.tolist() == [4, 3, 3]
        # every fluent doc ranks at least as high as every rare doc
        assert out.loc[:4, "bucket"].max() <= \
            out.loc[10:, "bucket"].min()
        if base is None:
            base = out
        else:
            assert (out == base).all().all()


def test_misra_gries_error_bound(ray_session):
    """At overflow the MG guarantee holds: every reported lower bound
    lo satisfies true - err <= lo <= true with err <= N/(capacity+1);
    at ample capacity counts are exact with err == 0."""
    import collections

    import numpy as np
    import ray

    from engine.ops.sketch import MisraGries, heavy_hitter_terms

    rng = np.random.RandomState(11)
    # Zipf-ish stream over 200 words
    words = [f"w{int(i)}" for i in
             np.minimum(rng.zipf(1.3, size=5000), 200)]
    true = collections.Counter(words)
    n = len(words)
    rows = [{"text": " ".join(words[i:i + 50])}
            for i in range(0, n, 50)]
    ds = ray.data.from_items(rows).repartition(4)

    t, err = heavy_hitter_terms(ds, "text", capacity=8, k=8)
    assert err <= n // (8 + 1) + 1
    for term, lo in zip(t["term"].to_pylist(), t["count"].to_pylist()):
        assert lo <= true[term] <= lo + err, (term, lo, true[term], err)

    t2, err2 = heavy_hitter_terms(ds, "text", capacity=512, k=5)
    assert err2 == 0
    expect = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = list(zip(t2["term"].to_pylist(), t2["count"].to_pylist()))
    assert got == [(t_, c) for t_, c in expect]

    # pure-python merge law: fold of parts == whole
    a, b = MisraGries(8), MisraGries(8)
    a.add_counts(["x", "y"], [5, 3])
    b.add_counts(["x", "z"], [2, 9])
    m = a.merge(b)
    assert m.lo["x"] == 7 and m.lo["z"] == 9 and m.err == 0


def test_bpe_train_matches_reference(ray_session):
    """bpe_train == a from-scratch list-of-symbols BPE (greedy
    left-to-right one-pass merge, count-all-adjacent pairs,
    (count desc, pair asc) tie-break) — including a same-symbol run
    ('aaaaa'), the case where naive single-space string replace would
    diverge; block splits don't change the learned merges."""
    import collections

    import ray

    from engine.ops.textstats import bpe_train

    corpus = (["banana banana bandana"] * 3
              + ["aaaaa aaa banana"] * 2
              + ["na na na batman", "band and brand"])

    def ref(texts, k):
        wc = collections.Counter(
            w for t in texts for w in t.lower().split())
        seqs = {w: list(w) for w in wc}
        out = []
        for step in range(1, k + 1):
            pairs = collections.Counter()
            for w, sy in seqs.items():
                for a, b in zip(sy, sy[1:]):
                    pairs[(a, b)] += wc[w]
            if not pairs:
                break
            (a, b), c = min(pairs.items(),
                            key=lambda kv: (-kv[1], kv[0]))
            out.append((step, a, b, c))
            for w, sy in seqs.items():
                ns, i = [], 0
                while i < len(sy):
                    if i + 1 < len(sy) and sy[i] == a and sy[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(sy[i])
                        i += 1
                seqs[w] = ns
        return out

    expect = ref(corpus, 6)
    for nblocks in (1, 3):
        ds = ray.data.from_items([{"text": t} for t in corpus]) \
            .repartition(nblocks)
        t = bpe_train(ds, "text", num_merges=6)
        got = list(zip(t["step"].to_pylist(), t["w1"].to_pylist(),
                       t["w2"].to_pylist(), t["cnt"].to_pylist()))
        assert got == expect, (got, expect)


def test_gopher_rules_boundaries(ray_session):
    """Each Gopher rule fires on its adversarial doc; the clean doc
    passes all of them."""
    import ray

    from engine.ops.textstats import gopher_rules

    clean = "the cat and that dog have fun with all of them " + \
        " ".join(f"word{i}x" for i in range(60))
    repeats = "the mat " * 40 + "and of that have"      # top-2gram heavy
    short = "the and of that have tiny"                  # < 50 words
    numeric = "the and of that have " + " ".join(
        str(1000 + i) for i in range(60))                # alpha < 0.8
    rows = [{"id": 0, "text": clean}, {"id": 1, "text": repeats},
            {"id": 2, "text": short}, {"id": 3, "text": numeric}]
    ds = ray.data.from_items(rows)
    out = gopher_rules(ds, "text", "id").to_pandas() \
        .set_index("id").sort_index()
    assert out.loc[0, "keep"] == 1, out.loc[0]
    assert out.loc[1, "keep"] == 0 and out.loc[1, "top2_frac"] > 0.2
    assert out.loc[2, "keep"] == 0 and out.loc[2, "n_words"] < 50
    assert out.loc[3, "keep"] == 0 and out.loc[3, "alpha_frac"] < 0.8
    # dup5 fires on the repeated phrase doc too (the mat x40)
    assert out.loc[1, "dup5_frac"] > 0.15


def test_bpe_encode_matches_reference(ray_session):
    """bpe_encode_count token counts == applying the merges with a
    from-scratch per-word greedy encoder; merges never cross word
    boundaries; empty docs count 0."""
    import ray

    from engine.ops.textstats import bpe_encode_count

    merges = [("a", "n"), ("an", "an"), ("b", "anan")]
    rows = [{"id": 0, "text": "banana bandana"},
            {"id": 1, "text": "na an banana banana"},
            {"id": 2, "text": ""},
            {"id": 3, "text": "a"}]

    def ref_count(text):
        total = 0
        for w in text.lower().split():
            sy = list(w)
            for a, b in merges:
                ns, i = [], 0
                while i < len(sy):
                    if i + 1 < len(sy) and sy[i] == a and sy[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(sy[i])
                        i += 1
                sy = ns
            total += len(sy)
        return total

    ds = ray.data.from_items(rows).repartition(2)
    out = bpe_encode_count(ds, "text", "id", merges).to_pandas() \
        .set_index("id").sort_index()
    for r in rows:
        assert out.loc[r["id"], "n_bpe_tokens"] == ref_count(r["text"]), \
            (r, out.loc[r["id"]])


def test_text_hash128_vectorized_key():
    """The incremental-dedup exact key (_text_hash128): stable within
    a process, seed-independent halves, 16-byte packing round-trips,
    and equal texts collide while distinct texts don't."""
    import numpy as np
    import pyarrow as pa

    from engine.ops.dedup import _pack_h128, _text_hash128

    texts = ["alpha", "beta", "alpha", "", "héllo ünïcode"]
    col = pa.array(texts, type=pa.string())
    h1, h2 = _text_hash128(col)
    r1, r2 = _text_hash128(col)
    assert np.array_equal(h1, r1) and np.array_equal(h2, r2)
    assert not np.array_equal(h1, h2)        # independent halves
    assert h1[0] == h1[2] and h2[0] == h2[2]  # equal text, equal key
    packed = _pack_h128(h1, h2)
    assert packed.type == pa.binary(16)
    keys = packed.to_pylist()
    assert keys[0] == keys[2]
    assert len({keys[0], keys[1], keys[3], keys[4]}) == 4


def test_incremental_dedup_bloom(ray_session):
    """Arrivals deduped against existing without re-shuffling it:
    cross-corpus dup dropped, within-arrival dup keeps first id,
    unique arrival survives; bloom stats prove the short-circuit."""
    import ray

    from engine.ops.dedup import incremental_dedup

    ex_rows = [{"id": i, "text": f"existing doc number {i}"}
               for i in range(50)]
    ar_rows = [{"id": 100, "text": "existing doc number 7"},   # cross dup
               {"id": 101, "text": "fresh arrival one"},
               {"id": 102, "text": "fresh arrival two"},
               {"id": 103, "text": "fresh arrival one"}]       # within dup
    ex = ray.data.from_items(ex_rows).repartition(3)
    ar = ray.data.from_items(ar_rows).repartition(2)
    out, stats = incremental_dedup(ex, ar, "text", "id",
                                   n_existing=50)
    assert out["id"].to_pylist() == [101, 102]
    assert stats["n_arrivals"] == 4
    assert stats["confirmed"] >= 1            # the cross dup
    assert stats["bloom_misses"] >= 2         # fresh texts short-circuit
    assert stats["confirmed"] <= stats["candidates"]


def test_misra_gries_err_survives_empty_prune(ray_session):
    """Review finding: a batch whose prune empties the counter set
    must still ship its err (the exactness claim depends on it)."""
    import ray

    from engine.ops.sketch import heavy_hitter_terms

    # 9 distinct tokens, once each, capacity 8 -> prune empties lo
    rows = [{"text": " ".join(f"u{i}" for i in range(9))}]
    t, err = heavy_hitter_terms(ray.data.from_items(rows), "text",
                                capacity=8, k=8)
    assert err >= 1                      # NOT falsely exact


def test_monitor_prefix_only_query_set(ray_session):
    """Review finding: a prefix-only registered set (empty term
    dictionary) must not crash index_in."""
    import ray

    from engine.ops.monitor import monitor_match

    rows = [{"id": 0, "text": "sparkle dust"}, {"id": 1, "text": "mud"}]
    out = monitor_match(ray.data.from_items(rows), "text", "id",
                        [{"id": "q", "kind": "prefix",
                          "terms": ["sp"]}]).to_pandas()
    assert out["id"].tolist() == [0]


def test_incremental_dedup_false_positive_and_empty(ray_session):
    """Review finding: bloom false positives with zero confirmations
    and empty arrival sets must both return cleanly."""
    import ray

    from engine.ops.dedup import incremental_dedup

    ex = ray.data.from_items(
        [{"id": i, "text": f"doc {i}"} for i in range(20)])
    # tiny bloom (bits_per_key=1) forces false positives
    ar = ray.data.from_items(
        [{"id": 100 + i, "text": f"fresh {i}"} for i in range(10)])
    out, stats = incremental_dedup(ex, ar, "text", "id",
                                   n_existing=20, bits_per_key=1)
    assert out["id"].to_pylist() == list(range(100, 110))
    assert stats["confirmed"] == 0

    empty = ray.data.from_items(
        [{"id": 0, "text": "x"}]).filter(lambda r: False)
    out2, stats2 = incremental_dedup(ex, empty, "text", "id",
                                     n_existing=20)
    assert out2.num_rows == 0 and stats2["n_arrivals"] == 0


def test_bpe_train_property_random_corpora(ray_session):
    """Property: over random small corpora (alphabet {a,b,c} so
    same-symbol runs and overlap cases are dense), bpe_train's merge
    sequence equals the from-scratch greedy reference."""
    import collections

    import numpy as np
    import ray

    from engine.ops.textstats import bpe_train

    def ref(texts, k):
        wc = collections.Counter(
            w for t in texts for w in t.lower().split())
        seqs = {w: list(w) for w in wc}
        out = []
        for step in range(1, k + 1):
            pairs = collections.Counter()
            for w, sy in seqs.items():
                for a, b in zip(sy, sy[1:]):
                    pairs[(a, b)] += wc[w]
            if not pairs:
                break
            (a, b), c = min(pairs.items(),
                            key=lambda kv: (-kv[1], kv[0]))
            out.append((step, a, b, c))
            for w, sy in seqs.items():
                ns, i = [], 0
                while i < len(sy):
                    if i + 1 < len(sy) and sy[i] == a and sy[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(sy[i])
                        i += 1
                seqs[w] = ns
        return out

    rng = np.random.RandomState(42)
    for trial in range(8):
        n_docs = rng.randint(1, 5)
        texts = []
        for _ in range(n_docs):
            words = [
                "".join(rng.choice(list("abc"),
                                   size=rng.randint(1, 7)))
                for _ in range(rng.randint(1, 12))]
            texts.append(" ".join(words))
        expect = ref(texts, 4)
        ds = ray.data.from_items([{"text": t} for t in texts])
        t = bpe_train(ds, "text", num_merges=4)
        got = list(zip(t["step"].to_pylist(), t["w1"].to_pylist(),
                       t["w2"].to_pylist(), t["cnt"].to_pylist()))
        assert got == expect, (trial, texts, got, expect)


def test_duplicate_spans_semantics(ray_session):
    """Constructed corpus vs a brute-force positioned-window reference:
    cross-doc shared substrings, within-doc repetition, adjacent-window
    merging, and clean docs absent from the output."""
    import itertools

    import ray

    from engine.ops.dedup import duplicate_spans

    docs = {
        0: "a b c d e f g h",            # shares "a b c d" with doc 1
        1: "x1 x2 a b c d y1 y2",
        2: "u1 u2 u3 u4 u5 u6",          # fully unique: no output row
        3: "p q r s t p q r s t",        # within-doc repeat, overlap merge
        4: "a b c d e f zz",             # longer shared run with doc 0
    }
    k = 4
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in docs.items()])
    got = {r["doc_id"]: r for r in
           duplicate_spans(ds, "text", "doc_id", k=k).take_all()}

    # brute reference
    wins = {}          # gram -> [(doc, pos)]
    for i, t in docs.items():
        toks = t.split()
        for p in range(len(toks) - k + 1):
            wins.setdefault(" ".join(toks[p:p + k]), []).append((i, p))
    per_doc = {}
    for g, occ in wins.items():
        if len(occ) >= 2:
            for d, p in occ:
                per_doc.setdefault(d, []).append(p)
    assert set(got) == set(per_doc)
    for d, ps in per_doc.items():
        ps = sorted(ps)
        covered = set(itertools.chain.from_iterable(
            range(p, p + k) for p in ps))
        spans = 0
        prev = None
        for p in ps:
            if prev is None or p - prev > k:
                spans += 1
            prev = p
        assert got[d]["n_dup_windows"] == len(ps), d
        assert got[d]["dup_tokens"] == len(covered), d
        assert got[d]["n_spans"] == spans, d
    # sanity on the constructed shapes
    assert 2 not in got
    assert got[3]["n_spans"] == 1          # overlapping repeat merges
    assert got[3]["dup_tokens"] == 10      # whole doc covered


def test_read_solr_xml_mixed_multivalued_and_nested(ray_session, tmp_path):
    """A field single-valued in one doc and repeated in another must
    yield one Arrow-typable column (lists everywhere it appears); a
    nested <doc> is its own record, never extra fields of the parent."""
    from engine.ops.loaders import read_solr_xml

    x = tmp_path / "m.xml"
    x.write_text(
        "<add>"
        "<doc><field name='id'>1</field><field name='tag'>a</field></doc>"
        "<doc><field name='id'>2</field>"
        "<field name='tag'>a</field><field name='tag'>b</field></doc>"
        "<doc><field name='id'>p</field>"
        "<doc><field name='id'>c</field></doc></doc>"
        "</add>")
    rows = sorted(read_solr_xml([str(x)]).take_all(),
                  key=lambda r: str(r["id"]))
    ids = [r["id"] for r in rows]
    assert ids == ["1", "2", "c", "p"]
    by_id = {r["id"]: r for r in rows}
    assert list(by_id["1"]["tag"]) == ["a"]       # promoted to list
    assert list(by_id["2"]["tag"]) == ["a", "b"]
    # the parent kept ONLY its own field; the child became its own row
    assert by_id["p"]["id"] == "p"


def test_nested_entity_import_uncached_path(ray_session, tmp_path):
    """Default (cached=False) DIH path: Ray groupby child aggregation +
    hash join — must produce the same rows as the cached broadcast."""
    import ray.data

    from engine.ops.loaders import nested_entity_import

    root = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], type=pa.int64()),
        "name": pa.array(["a", "b", "c"])}))

    def child_ds():
        return ray.data.from_arrow(pa.table({
            "ck": pa.array([1, 1, 2], type=pa.int64()),
            "v": pa.array([10, 20, 5], type=pa.int64())}))

    out = {}
    for cached in (False, True):
        t = pa.concat_tables(
            ray.get(nested_entity_import(
                root, child_ds(), "k", "ck",
                [(None, "count_all", "n"), ("v", "sum", "v_sum")],
                num_partitions=2, cached=cached)
                .materialize().to_arrow_refs())).combine_chunks()
        rows = sorted(
            (r["k"], r["name"], int(r["n"]), int(r["v_sum"]))
            for r in t.select(["k", "name", "n", "v_sum"]).to_pylist())
        out[cached] = rows
    assert out[False] == out[True] == [(1, "a", 2, 30), (2, "b", 1, 5)]


def test_monitor_queries_analyzed_like_docs(ray_session):
    """Registered queries/phrases go through the document analyzer:
    'Alpha' matches lowercased tokens; 'New York' tags correctly."""
    import ray.data

    from engine.ops.monitor import monitor_match, tag_dictionary

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["Alpha beta, gamma!", "New York city"])}))
    hits = pa.concat_tables(
        ray.get(monitor_match(ds, "text", "doc_id", [
            {"id": "q1", "kind": "term", "terms": ["Alpha"]},
            {"id": "q2", "kind": "and", "terms": ["BETA", "Gamma"]},
            {"id": "q3", "kind": "phrase", "terms": ["NEW", "york"]},
            {"id": "q4", "kind": "prefix", "terms": ["Cit"]},
        ]).materialize().to_arrow_refs())).combine_chunks()
    got = sorted(zip(hits["doc_id"].to_pylist(),
                     hits["query_id"].to_pylist()))
    assert got == [(0, "q1"), (0, "q2"), (1, "q3"), (1, "q4")]

    tags = pa.concat_tables(
        ray.get(tag_dictionary(ds, "text", "doc_id", ["New York"])
                .materialize().to_arrow_refs())).combine_chunks()
    assert tags["doc_id"].to_pylist() == [1]
    assert tags["n"].to_pylist() == [1]


def test_group_top_n_high_cardinality(ray_session):
    """10^5 distinct keys must complete in seconds (flat per-key cost:
    vectorized run-slice partials + coarse-group final, never one
    Python call per key) and agree with a pandas reference."""
    import time

    import pandas as pd
    import ray.data

    from engine.ops.relational import group_top_n

    n, nkeys = 300_000, 100_000
    rng = np.random.default_rng(13)
    tab = pa.table({
        "k": pa.array(rng.integers(0, nkeys, n), type=pa.int64()),
        "v": pa.array(rng.random(n)),
        "id": pa.array(np.arange(n, dtype=np.int64)),
    })
    t0 = time.perf_counter()
    out = group_top_n(ray.data.from_arrow(tab), "k",
                      [("v", True), ("id", False)], 2) \
        .materialize().to_pandas().sort_values(["k", "id"])
    wall = time.perf_counter() - t0
    assert wall < 60, f"high-cardinality group_top_n took {wall:.1f}s"
    df = tab.to_pandas()
    ref = df.sort_values(["v", "id"], ascending=[False, True]) \
        .groupby("k").head(2).sort_values(["k", "id"])
    assert out["id"].to_numpy().tolist() == ref["id"].to_numpy().tolist()
