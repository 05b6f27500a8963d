"""Distributed (sharded) search with global IDF must be bit-identical
to the single-index search — Solr's distributed-IDF contract."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_sharded_equals_single(ray_session, tmp_path):
    from engine.build import IndexConfig, build_index
    from engine.query import IndexReader
    from engine.sharded import DistributedSearcher

    rng = np.random.default_rng(9)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
             for _ in range(300)]
    files = []
    for si in range(3):
        f = str(tmp_path / f"p{si}.parquet")
        lo, hi = si * 100, (si + 1) * 100
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(texts[lo:hi])}), f)
        files.append(f)
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2, hot_df_threshold=40,
                      n_salts=2, batch_size=64)
    single = str(tmp_path / "single")
    build_index(files, single, cfg)
    shards = []
    for si, f in enumerate(files):
        sd = str(tmp_path / f"shard{si}")
        build_index([f], sd, cfg)
        shards.append(sd)
    ds = DistributedSearcher(shards)
    r = IndexReader(single)
    try:
        for q in ["aa", "aa bb", "aa bb cc dd", "gg ff", "zz"]:
            a, b = r.topk(q, 25), ds.topk(q, 25)
            assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
            assert a["score"].to_pylist() == b["score"].to_pylist(), q
            if a.num_rows:
                assert a["total_hits"][0].as_py() == \
                    b["total_hits"][0].as_py(), q
    finally:
        ds.shutdown()


def test_shards_tolerant_partial_results(ray_session, tmp_path):
    """shards.tolerant=true: a dead shard is skipped, the response is
    flagged partial and equals the surviving shards' results;
    tolerant=false propagates the failure (Solr's default)."""
    import pytest
    import ray

    from engine.build import IndexConfig, build_index
    from engine.sharded import DistributedSearcher

    rng = np.random.default_rng(21)
    vocab = ["aa", "bb", "cc", "dd"]
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    shards = []
    for si in range(3):
        f = str(tmp_path / f"t{si}.parquet")
        lo, hi = si * 80, (si + 1) * 80
        texts = [" ".join(rng.choice(vocab, size=6))
                 for _ in range(hi - lo)]
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(texts)}), f)
        sd = str(tmp_path / f"tshard{si}")
        build_index([f], sd, cfg)
        shards.append(sd)
    ds = DistributedSearcher(shards)
    try:
        full = ds.topk("aa bb", 300)
        assert full.schema.metadata is None \
            or b"partial" not in (full.schema.metadata or {})
        ray.kill(ds.shards[1])
        part = ds.topk("aa bb", 300, tolerant=True)
        assert part.schema.metadata[b"partial"] == b"true"
        got = set(part["doc_id"].to_pylist())
        assert got and all(d < 80 or d >= 160 for d in got)
        # shard 0+2 results unchanged for their docs (same global stats)
        fd = {d: s for d, s in zip(full["doc_id"].to_pylist(),
                                   full["score"].to_pylist())}
        for d, s in zip(part["doc_id"].to_pylist(),
                        part["score"].to_pylist()):
            assert fd[d] == s
        with pytest.raises(Exception):
            ds.topk("aa bb", 10, tolerant=False)
    finally:
        ds.shutdown()


def test_composite_id_routing(ray_session, tmp_path_factory):
    """compositeId routing: all docs sharing a route key land on one
    shard; a _route_ query equals a plain single-index search over
    that shard alone (shard-local stats, zero fan-out)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_index
    from engine.query import IndexReader
    from engine.sharded import (DistributedSearcher, route_corpus,
                                route_shard, routed_topk)

    root = tmp_path_factory.mktemp("routing")
    rng = np.random.default_rng(5)
    words = np.array(["alpha", "beta", "gamma", "delta"], dtype=object)
    keys = [f"key{i}" for i in range(24)]
    n = 300
    src = str(root / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array([" ".join(words[rng.integers(0, 4, size=6)])
                          for _ in range(n)]),
        "route": pa.array([keys[int(i)] for i in
                           rng.integers(0, len(keys), size=n)]),
    }), src)

    out = str(root / "routed")
    dirs = route_corpus([src], out, "route", 3)
    # co-location: each key appears in exactly the shard the router says
    for i, d in enumerate(dirs):
        files = [os.path.join(d, f) for f in os.listdir(d)
                 if f.endswith(".parquet")]
        if not files:              # a shard may own no keys
            continue
        got = set(pa.concat_tables(
            [pq.read_table(f, columns=["route"]) for f in files]
        )["route"].to_pylist())
        assert all(route_shard(k, 3) == i for k in got), i

    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9)
    shard_idx = []
    for i, d in enumerate(dirs):
        files = sorted(os.path.join(d, f) for f in os.listdir(d)
                       if f.endswith(".parquet"))
        sd = str(root / f"idx{i}")
        build_index(files, sd, cfg)
        shard_idx.append(sd)

    searcher = DistributedSearcher(shard_idx)
    try:
        k = "key3"
        got = routed_topk(searcher, k, "alpha beta", k=20)
        want = IndexReader(shard_idx[route_shard(k, 3)]) \
            .brute_force_topk("alpha beta", 20)
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
        assert got["score"].to_pylist() == want["score"].to_pylist()
    finally:
        searcher.shutdown()


def test_routed_topk_honors_similarity_params(ray_session, tmp_path):
    """routed_topk must score with the SEARCHER'S k1/b (and the shared
    schema's omit_norms), not silently fall back to the defaults —
    the docstring promises equality with a non-distributed query on
    the owning shard under the same similarity."""
    from engine.build import IndexConfig, build_index
    from engine.query import IndexReader
    from engine.sharded import DistributedSearcher, route_shard, routed_topk

    rng = np.random.default_rng(17)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    shards = []
    for si in range(2):
        f = str(tmp_path / f"r{si}.parquet")
        lo, hi = si * 120, (si + 1) * 120
        texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 25)))
                 for _ in range(hi - lo)]
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(texts)}), f)
        sd = str(tmp_path / f"rshard{si}")
        build_index([f], sd, cfg)
        shards.append(sd)
    searcher = DistributedSearcher(shards, k1=2.0, b=0.3)
    try:
        key = "custA"
        i = route_shard(key, len(shards))
        got = routed_topk(searcher, key, "aa bb", k=15)
        want = IndexReader(shards[i], k1=2.0, b=0.3) \
            .brute_force_topk("aa bb", 15)
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
        assert got["score"].to_pylist() == want["score"].to_pylist()
        # and the scores really differ from the default-parameter run
        deflt = IndexReader(shards[i]).brute_force_topk("aa bb", 15)
        assert got["score"].to_pylist() != deflt["score"].to_pylist()
    finally:
        searcher.shutdown()


def test_distributed_facet_skips_null_values(ray_session, tmp_path):
    """facet() over a column with NULLs must not crash (np.unique on a
    None-mixed object array raises) — missing values are excluded,
    Solr's facet.missing=false default."""
    from engine.build import IndexConfig, build_index
    from engine.sharded import DistributedSearcher

    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    f = str(tmp_path / "nf.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "text": pa.array(["aa"] * 6),
        "cat": pa.array(["x", None, "y", "x", None, "y"]),
    }), f)
    sd = str(tmp_path / "nfshard")
    build_index([f], sd, cfg)
    searcher = DistributedSearcher([sd])
    try:
        t = searcher.facet("aa", "cat")
        assert t["cat"].to_pylist() == ["x", "y"]
        assert t["n"].to_pylist() == [2, 2]
    finally:
        searcher.shutdown()


def _facet_shards(tmp_path, shard_docs: list[list[tuple[str, str]]],
                  prefix: str = "fs") -> list[str]:
    """Build one shard index per list of (text, facet) docs."""
    from engine.build import IndexConfig, build_index

    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    shards, base = [], 0
    for si, docs in enumerate(shard_docs):
        f = str(tmp_path / f"{prefix}{si}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array(range(base, base + len(docs)),
                               type=pa.int64()),
            "text": pa.array([t for t, _ in docs]),
            "cat": pa.array([c for _, c in docs])}), f)
        base += len(docs)
        sd = str(tmp_path / f"{prefix}idx{si}")
        build_index([f], sd, cfg)
        shards.append(sd)
    return shards


def test_facet_refinement_fixes_partial_sums(ray_session, tmp_path):
    """A candidate reported by only SOME shards must be refined: with
    overrequest 0 and k=2, value 'x' tops shard0 but is below the
    phase-A cutoff on shards 1 and 2 — summing only phase-A partials
    would undercount it (6 instead of 8). The refinement round must
    recover the exact global count."""
    from engine.sharded import DistributedSearcher

    def docs(counts: dict) -> list:
        return [("hit", v) for v, c in counts.items() for _ in range(c)]

    shards = _facet_shards(tmp_path, [
        docs({"x": 6, "a": 5, "b": 4}),
        docs({"a": 6, "b": 5, "x": 1}),
        docs({"b": 6, "a": 5, "x": 1}),
    ])
    ds = DistributedSearcher(shards)
    try:
        t = ds.facet_topk("hit", "cat", k=2, overrequest=0)
        assert t["cat"].to_pylist() == ["a", "b"]
        assert t["n"].to_pylist() == [16, 15]
        assert ds.last_refine_values > 0      # refinement really fired
        # exact counts even for the value with partial phase-A sums
        t3 = ds.facet_topk("hit", "cat", k=3, overrequest=0)
        assert dict(zip(t3["cat"].to_pylist(),
                        t3["n"].to_pylist()))["x"] == 8
    finally:
        ds.shutdown()


def test_facet_topk_escalates_until_provably_exact(ray_session,
                                                   tmp_path):
    """Threshold-algorithm escalation: value 'A' is globally top (15)
    but below every shard's local top-1 cutoff, so phase A at
    shard_limit=1 never sees it and the unseen-value bound (Σ cutoffs
    = 15) forbids acceptance; the shard limit must double until 'A'
    surfaces. Solr-without-the-bound would return the wrong bucket."""
    from engine.sharded import DistributedSearcher

    def docs(counts: dict) -> list:
        return [("hit", v) for v, c in counts.items() for _ in range(c)]

    shards = _facet_shards(tmp_path, [
        docs({"b0": 6, "A": 5}),
        docs({"b1": 6, "A": 5}),
        docs({"b2": 6, "A": 5}),
    ], prefix="ta")
    ds = DistributedSearcher(shards)
    try:
        t = ds.facet_topk("hit", "cat", k=1, overrequest=0)
        assert t["cat"].to_pylist() == ["A"]
        assert t["n"].to_pylist() == [15]
        assert ds.last_facet_rounds > 1       # escalation happened
    finally:
        ds.shutdown()


def test_facet_topk_matches_full_facet(ray_session, tmp_path):
    """Randomized: facet.limit top-k under refinement must equal the
    top-k slice of the exact one-round full facet, for every k and a
    range of overrequests (including 0) — and an over-large k just
    returns all values."""
    rng = np.random.default_rng(33)
    from engine.sharded import DistributedSearcher

    vals = [f"v{i:02d}" for i in range(20)]
    shard_docs = []
    for si in range(3):
        n = int(rng.integers(40, 80))
        shard_docs.append([
            ("hit", vals[int(i)])
            for i in rng.integers(0, len(vals), size=n)])
    shards = _facet_shards(tmp_path, shard_docs, prefix="rnd")
    ds = DistributedSearcher(shards)
    try:
        full = ds.facet("hit", "cat")
        exact = sorted(zip(full["cat"].to_pylist(),
                           full["n"].to_pylist()),
                       key=lambda kv: (-kv[1], kv[0]))
        for k in (1, 3, 7, 50):
            for over in (0, 2, 10):
                t = ds.facet_topk("hit", "cat", k=k, overrequest=over)
                got = list(zip(t["cat"].to_pylist(),
                               t["n"].to_pylist()))
                assert got == exact[:k], (k, over)
    finally:
        ds.shutdown()


def test_grouped_docs_two_phase_equals_single(ray_session, tmp_path):
    """Distributed two-phase grouping (top groups → top docs per
    group) must equal the grouping computed from a single index's
    full scored docset."""
    import pandas as pd

    from engine.build import IndexConfig, build_index
    from engine.query import IndexReader
    from engine.sharded import DistributedSearcher

    rng = np.random.default_rng(41)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    cats = [f"g{i}" for i in range(9)]
    n = 240
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 20)))
             for _ in range(n)]
    gvals = [cats[int(i)] for i in rng.integers(0, len(cats), size=n)]
    files = []
    for si in range(3):
        f = str(tmp_path / f"g{si}.parquet")
        lo, hi = si * 80, (si + 1) * 80
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(texts[lo:hi]),
            "source": pa.array(gvals[lo:hi])}), f)
        files.append(f)
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    single = str(tmp_path / "gsingle")
    build_index(files, single, cfg)
    shards = []
    for si, f in enumerate(files):
        sd = str(tmp_path / f"gshard{si}")
        build_index([f], sd, cfg)
        shards.append(sd)

    # reference: full scored docset from the single index, grouped
    r = IndexReader(single)
    top = r.brute_force_topk("aa bb", n)
    df = pd.DataFrame({"doc_id": top["doc_id"].to_numpy(),
                       "score": top["score"].to_numpy()})
    df["source"] = df["doc_id"].map(dict(zip(range(n), gvals)))
    heads = df.groupby("source")["score"].max().reset_index() \
        .sort_values(["score", "source"], ascending=[False, True])
    want_groups = heads["source"].tolist()[:4]
    want = {}
    for g in want_groups:
        sub = df[df["source"] == g].sort_values(
            ["score", "doc_id"], ascending=[False, True])
        want[g] = list(zip(sub["doc_id"].tolist()[:2],
                           sub["score"].tolist()[:2]))

    ds = DistributedSearcher(shards)
    try:
        t = ds.grouped_docs("aa bb", "source", n_groups=4,
                            group_limit=2)
        got_groups = list(dict.fromkeys(t["source"].to_pylist()))
        assert got_groups == want_groups
        for g in want_groups:
            m = [(d, s) for gg, d, s in zip(t["source"].to_pylist(),
                                            t["doc_id"].to_pylist(),
                                            t["score"].to_pylist())
                 if gg == g]
            assert m == want[g], g
        # ranks are 0..len-1 within each group, in row order
        rig = t["rank_in_group"].to_pylist()
        for g in want_groups:
            assert [x for gg, x in zip(t["source"].to_pylist(), rig)
                    if gg == g] == list(range(len(want[g])))
        # no-match query: empty result with the declared schema
        e = ds.grouped_docs("zznope", "source")
        assert e.num_rows == 0 and "rank_in_group" in e.schema.names
    finally:
        ds.shutdown()


def test_json_facet_stats_refined_with_bucket(ray_session, tmp_path):
    """A bucket reported by only some shards must end with the exact
    global avg, not the partial-shard avg: 'x' has 6 docs of stat=10
    on shard0 and 2 docs of stat=100 elsewhere — phase-A-only merge
    would report avg 10, the refined answer is (6*10+2*100)/8."""
    from engine.build import IndexConfig, build_index
    from engine.sharded import DistributedSearcher

    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)

    def shard(tag, rows):
        f = str(tmp_path / f"jf{tag}.parquet")
        base = {"a": 0, "b": 100, "c": 200}[tag]
        pq.write_table(pa.table({
            "doc_id": pa.array(range(base, base + len(rows)),
                               type=pa.int64()),
            "text": pa.array(["hit"] * len(rows)),
            "cat": pa.array([v for v, _ in rows]),
            "val": pa.array([s for _, s in rows], type=pa.int64())}),
            f)
        sd = str(tmp_path / f"jfidx{tag}")
        build_index([f], sd, cfg)
        return sd

    shards = [
        shard("a", [("x", 10)] * 6 + [("a", 1)] * 5 + [("b", 1)] * 4),
        shard("b", [("a", 1)] * 6 + [("b", 1)] * 5 + [("x", 100)]),
        shard("c", [("b", 1)] * 6 + [("a", 1)] * 5 + [("x", 100)]),
    ]
    ds = DistributedSearcher(shards)
    try:
        # k=2, shard_limit=2: 'x' tops shard0 but is below the other
        # shards' phase-A cut → a refinement round must fire and the
        # accepted top-2 stays exact
        t2p = ds.facet_topk_stats("hit", "cat", "val", k=2,
                                  overrequest=0, avg_name="avg_val")
        assert ds.last_refine_values > 0
        assert t2p["cat"].to_pylist() == ["a", "b"]
        assert t2p["n"].to_pylist() == [16, 15]
        t = ds.facet_topk_stats("hit", "cat", "val", k=3,
                                overrequest=0, avg_name="avg_val")
        got = {v: (n, a) for v, n, a in zip(t["cat"].to_pylist(),
                                            t["n"].to_pylist(),
                                            t["avg_val"].to_pylist())}
        assert got["x"] == (8, (6 * 10 + 2 * 100) / 8)
        assert got["a"] == (16, 1.0) and got["b"] == (15, 1.0)
        # count-only path still agrees on the same adversarial data
        t2 = ds.facet_topk("hit", "cat", k=3, overrequest=0)
        assert dict(zip(t2["cat"].to_pylist(),
                        t2["n"].to_pylist())) == \
            {v: n for v, (n, _) in got.items()}
    finally:
        ds.shutdown()


def test_pivot_facet_matches_exact(ray_session, tmp_path):
    """Distributed pivot (A then B within each A-bucket) must equal
    the exact pivot computed from the raw rows, across several
    (k_a, k_b, overrequest) settings including overrequest=0 where
    level-2 escalation is forced on skewed sub-buckets."""
    import pandas as pd

    from engine.build import IndexConfig, build_index
    from engine.sharded import DistributedSearcher

    rng = np.random.default_rng(55)
    a_vals = [f"a{i}" for i in range(8)]
    b_vals = [f"b{i}" for i in range(6)]
    n = 270
    rows_a = [a_vals[int(i)] for i in
              rng.integers(0, len(a_vals), size=n)]
    rows_b = [b_vals[int(i)] for i in
              rng.integers(0, len(b_vals), size=n)]
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    shards = []
    for si in range(3):
        lo, hi = si * 90, (si + 1) * 90
        f = str(tmp_path / f"pv{si}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(["hit"] * (hi - lo)),
            "ca": pa.array(rows_a[lo:hi]),
            "cb": pa.array(rows_b[lo:hi])}), f)
        sd = str(tmp_path / f"pvidx{si}")
        build_index([f], sd, cfg)
        shards.append(sd)

    df = pd.DataFrame({"ca": rows_a, "cb": rows_b})

    def exact(k_a, k_b):
        heads = df.groupby("ca").size().reset_index(name="n_a")
        heads = heads.sort_values(["n_a", "ca"],
                                  ascending=[False, True]).head(k_a)
        out = []
        for va, na in zip(heads["ca"], heads["n_a"]):
            sub = df[df["ca"] == va].groupby("cb").size() \
                .reset_index(name="n_b") \
                .sort_values(["n_b", "cb"],
                             ascending=[False, True]).head(k_b)
            out += [(va, int(na), vb, int(nb))
                    for vb, nb in zip(sub["cb"], sub["n_b"])]
        return out

    ds = DistributedSearcher(shards)
    try:
        for k_a, k_b, over in [(3, 2, 0), (5, 3, 2), (20, 20, 0)]:
            t = ds.pivot_facet("hit", "ca", "cb", k_a=k_a, k_b=k_b,
                               overrequest=over)
            got = list(zip(t["ca"].to_pylist(), t["n_a"].to_pylist(),
                           t["cb"].to_pylist(), t["n_b"].to_pylist()))
            assert got == exact(k_a, k_b), (k_a, k_b, over)
    finally:
        ds.shutdown()


def test_cursor_pages_cover_full_ranking(ray_session, tmp_path):
    """Walking the cursor to exhaustion must reproduce the single
    big top-k exactly (ids, scores, continuing ranks, page-invariant
    total_hits), ending with a None cursor; ties in f32 scores are
    crossed correctly by the (score, docID) cursor."""
    from engine.build import IndexConfig, build_index
    from engine.sharded import DistributedSearcher

    rng = np.random.default_rng(77)
    vocab = ["aa", "bb", "cc"]
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    shards = []
    for si in range(3):
        f = str(tmp_path / f"cp{si}.parquet")
        lo, hi = si * 70, (si + 1) * 70
        # few distinct lengths → many exact f32 score ties
        texts = [" ".join(rng.choice(vocab, size=int(
            rng.choice([4, 8])))) for _ in range(hi - lo)]
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(texts)}), f)
        sd = str(tmp_path / f"cpidx{si}")
        build_index([f], sd, cfg)
        shards.append(sd)
    ds = DistributedSearcher(shards)
    try:
        want = ds.topk("aa bb", 300)
        pages, cur, guard = [], None, 0
        while True:
            page, cur = ds.cursor_page("aa bb", k=7, cursor=cur)
            pages.append(page)
            guard += 1
            assert guard < 100
            if cur is None:
                break
        got = pa.concat_tables(pages)
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
        assert got["score"].to_pylist() == want["score"].to_pylist()
        assert got["rank"].to_pylist() == list(range(got.num_rows))
        assert set(got["total_hits"].to_pylist()) == \
            {want["total_hits"][0].as_py()}
    finally:
        ds.shutdown()


def test_sharded_rerank_equals_single(ray_session, tmp_path):
    """Distributed rerank must be bit-identical to the single-index
    ReRank (window scores, rerank probe, f32 combine)."""
    from engine.build import IndexConfig, build_index
    from engine.query import IndexReader
    from engine.sharded import DistributedSearcher

    rng = np.random.default_rng(88)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 25)))
             for _ in range(240)]
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    files = []
    for si in range(3):
        f = str(tmp_path / f"rr{si}.parquet")
        lo, hi = si * 80, (si + 1) * 80
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(texts[lo:hi])}), f)
        files.append(f)
    single = str(tmp_path / "rrsingle")
    build_index(files, single, cfg)
    shards = []
    for si, f in enumerate(files):
        sd = str(tmp_path / f"rrshard{si}")
        build_index([f], sd, cfg)
        shards.append(sd)
    r = IndexReader(single)
    ds = DistributedSearcher(shards)
    try:
        for main, rq in [("aa bb", "cc dd"), ("cc", "aa"),
                         ("ee ff", "zz")]:
            a = r.rerank_topk(main, rq, k=10, rerank_docs=20,
                              rerank_weight=2.0)
            b = ds.rerank_topk(main, rq, k=10, rerank_docs=20,
                               rerank_weight=2.0)
            assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
            assert a["score"].to_pylist() == b["score"].to_pylist()
    finally:
        ds.shutdown()


def test_sharded_fuzzy_global_rewrite_equals_single(ray_session,
                                                    tmp_path):
    """The expansion union must include variants that exist on only
    ONE shard (stock per-shard rewrite would miss them on the
    others), and the merged scores must equal the single index."""
    from engine.build import IndexConfig, build_index
    from engine.query import IndexReader
    from engine.sharded import DistributedSearcher

    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    # 'cat' variants live on shard0 only; 'car' on shard1 only
    texts0 = ["cat cap", "cap cup", "cat cat nap"] * 10
    texts1 = ["car bar", "car tar", "bar far"] * 10
    files, shards = [], []
    for si, texts in enumerate([texts0, texts1]):
        f = str(tmp_path / f"fz{si}.parquet")
        lo = si * len(texts0)
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, lo + len(texts)),
                               type=pa.int64()),
            "text": pa.array(texts)}), f)
        files.append(f)
        sd = str(tmp_path / f"fzidx{si}")
        build_index([f], sd, cfg)
        shards.append(sd)
    single = str(tmp_path / "fzsingle")
    build_index(files, single, cfg)
    r = IndexReader(single)
    ds = DistributedSearcher(shards)
    try:
        a = r.fuzzy_topk("cat", k=50, max_edits=1)
        b = ds.fuzzy_topk("cat", k=50, max_edits=1)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        assert a["score"].to_pylist() == b["score"].to_pylist()
        # docs from BOTH shards matched (car is edit-1 from cat)
        got = set(b["doc_id"].to_pylist())
        assert any(d < 30 for d in got) and any(d >= 30 for d in got)
        # unknown term with no variants: empty, no crash
        assert ds.fuzzy_topk("zzqq", k=5).num_rows == 0
    finally:
        ds.shutdown()


def test_cursor_numfound_invariant_when_shard_exhausts(ray_session,
                                                       tmp_path):
    """A shard whose post-cursor page is EMPTY must still contribute
    its match count: walking past all of shard0's (high-scoring) docs
    must not shrink total_hits to the surviving shard's count."""
    from engine.build import IndexConfig, build_index
    from engine.sharded import DistributedSearcher

    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    shards = []
    # shard0: short docs (high BM25), shard1: long docs (low BM25)
    for si, pad in enumerate([1, 30]):
        f = str(tmp_path / f"nf{si}.parquet")
        lo = si * 10
        texts = ["aa " + " ".join(["pad"] * pad) for _ in range(10)]
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, lo + 10), type=pa.int64()),
            "text": pa.array(texts)}), f)
        sd = str(tmp_path / f"nfidx{si}")
        build_index([f], sd, cfg)
        shards.append(sd)
    ds = DistributedSearcher(shards)
    try:
        totals, cur = [], None
        while True:
            page, cur = ds.cursor_page("aa", k=5, cursor=cur)
            if page.num_rows:
                totals.extend(set(page["total_hits"].to_pylist()))
            if cur is None:
                break
        assert set(totals) == {20}, totals
    finally:
        ds.shutdown()


def test_terms_topk_refinement_exact(ray_session, tmp_path):
    """terms.limit refinement: a term frequent overall but below each
    shard's phase-A cut must be elected via escalation; all counts
    exact vs a driver-side global df computation."""
    from collections import Counter

    from engine.build import IndexConfig, build_index
    from engine.sharded import DistributedSearcher

    rng = np.random.default_rng(99)
    vocab = [f"t{i:02d}" for i in range(30)]
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    shards, alldocs = [], []
    for si in range(3):
        lo = si * 60
        texts = [" ".join(rng.choice(vocab,
                                     size=rng.integers(2, 9),
                                     replace=False))
                 for _ in range(60)]
        alldocs += texts
        f = str(tmp_path / f"tt{si}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, lo + 60), type=pa.int64()),
            "text": pa.array(texts)}), f)
        sd = str(tmp_path / f"ttidx{si}")
        build_index([f], sd, cfg)
        shards.append(sd)
    gdf = Counter()
    for t in alldocs:
        for w in set(t.split()):
            gdf[w] += 1
    exact = sorted(gdf.items(), key=lambda kv: (-kv[1], kv[0]))
    ds = DistributedSearcher(shards)
    try:
        for k, over in [(5, 0), (10, 2), (100, 0)]:
            t = ds.terms_topk(k=k, overrequest=over)
            got = list(zip(t["term"].to_pylist(),
                           t["df"].to_pylist()))
            assert got == exact[:k], (k, over)
        # prefix-constrained page
        tp = ds.terms_topk(k=5, prefix="t0", overrequest=0)
        exact_p = [kv for kv in exact if kv[0].startswith("t0")][:5]
        assert list(zip(tp["term"].to_pylist(),
                        tp["df"].to_pylist())) == exact_p
    finally:
        ds.shutdown()


def test_sharded_highlight_equals_single(ray_session, tmp_path):
    """Owner-shard snippets must equal the single-index highlighter
    (same spec, same analyzer, same stored fields)."""
    from engine.build import IndexConfig, build_index, \
        build_stored_fields
    from engine.query import IndexReader
    from engine.sharded import DistributedSearcher

    rng = np.random.default_rng(123)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 20)))
             for _ in range(150)]
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    files, shards = [], []
    for si in range(3):
        f = str(tmp_path / f"hl{si}.parquet")
        lo, hi = si * 50, (si + 1) * 50
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(texts[lo:hi])}), f)
        files.append(f)
        sd = str(tmp_path / f"hlidx{si}")
        build_index([f], sd, cfg)
        build_stored_fields(sd)
        shards.append(sd)
    single = str(tmp_path / "hlsingle")
    build_index(files, single, cfg)
    build_stored_fields(single)
    r = IndexReader(single)
    ds = DistributedSearcher(shards)
    try:
        a = r.highlight_topk("aa bb", k=10, window=2)
        b = ds.highlight_topk("aa bb", k=10, window=2)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        assert a["snippet"].to_pylist() == b["snippet"].to_pylist()
        assert any(s for s in b["snippet"].to_pylist())
    finally:
        ds.shutdown()


def test_sharded_automaton_classes_equal_single(ray_session, tmp_path):
    """The r5 pattern classes — vacuous-shape regexp (NFA walk),
    case-insensitive literal-free, and short fuzzy (Levenshtein
    walk) — must be bit-identical between the sharded coordinator
    and a single index over the same corpus (each shard walks its
    OWN dictionary; the union must equal the global expansion)."""
    from engine.build import IndexConfig, build_index
    from engine.query import IndexReader
    from engine.sharded import DistributedSearcher

    rng = np.random.default_rng(23)
    vocab = ["spark", "scan", "spare", "score", "apple", "merge",
             "ray", "rag", "run", "abxq", "cdxz", "ababxy", "SPARK"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(4, 12)))
             for _ in range(120)]
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    files, shards = [], []
    for si in range(3):
        f = str(tmp_path / f"am{si}.parquet")
        lo, hi = si * 40, (si + 1) * 40
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(texts[lo:hi])}), f)
        files.append(f)
        sd = str(tmp_path / f"amidx{si}")
        build_index([f], sd, cfg)
        shards.append(sd)
    single = str(tmp_path / "amsingle")
    build_index(files, single, cfg)
    r = IndexReader(single)
    ds = DistributedSearcher(shards)
    try:
        for pat in ["(s|p|c)+a.*", "(ab|cd)+x.*", "(?i)S..R.",
                    "(a|r)+.*g.*"]:
            a = r.regexp_topk(pat, k=20)
            b = ds.regexp_topk(pat, k=20)
            assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), pat
            assert a["score"].to_pylist() == b["score"].to_pylist(), pat
        for term, k in [("ray", 2), ("rg", 1), ("sp", 2)]:
            a = r.fuzzy_topk(term, k=20, max_edits=k)
            b = ds.fuzzy_topk(term, k=20, max_edits=k)
            assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), term
            assert a["score"].to_pylist() == b["score"].to_pylist(), term
    finally:
        ds.shutdown()


def test_phase2_owner_routing(ray_session, tmp_path):
    """r5 fetch-tail fix: the phase-2 scatter must call ONLY shards
    whose docID bounds cover some requested id, each with exactly its
    owned slice — and the routed fetch must equal the broadcast."""
    from engine.build import IndexConfig, build_index, \
        build_stored_fields
    from engine.sharded import DistributedSearcher

    rng = np.random.default_rng(7)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, size=10)) for _ in range(90)]
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    shards = []
    for si in range(3):
        f = str(tmp_path / f"rt{si}.parquet")
        lo, hi = si * 30, (si + 1) * 30
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(texts[lo:hi])}), f)
        sd = str(tmp_path / f"rtidx{si}")
        build_index([f], sd, cfg)
        build_stored_fields(sd)
        shards.append(sd)
    ds = DistributedSearcher(shards)
    try:
        calls = []
        ids = np.array([1, 5, 62, 70], dtype=np.int64)  # shards 0, 2
        refs = ds._route_phase2(
            ids, lambda s, sub: calls.append(sub.tolist()) or
            s.fetch.remote(sub))
        got = pa.concat_tables(
            [p for p in __import__("ray").get(refs) if p.num_rows])
        assert calls == [[1, 5], [62, 70]]      # shard 1 never called
        assert sorted(got["doc_id"].to_pylist()) == [1, 5, 62, 70]
        # routed two-phase equals the result contract
        top = ds.topk_fetch("aa bb", k=7)
        assert top.num_rows and "text" in top.column_names
        assert all(t for t in top["text"].to_pylist())
    finally:
        ds.shutdown()


def test_phase2_routing_survives_failover(ray_session, tmp_path):
    """The owner-routing table is keyed to the live shard actors:
    after a primary dies and a spare is promoted, the retried
    two-phase fetch must re-resolve bounds against the NEW actors and
    return the same rows (replicas share doc ranges, so even a stale
    table would route correctly — this pins the refresh path)."""
    import ray

    from engine.build import IndexConfig, build_index, \
        build_stored_fields
    from engine.sharded import ReplicatedSearcher

    rng = np.random.default_rng(11)
    vocab = ["aa", "bb", "cc"]
    texts = [" ".join(rng.choice(vocab, size=8)) for _ in range(60)]
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=32)
    shards = []
    for si in range(2):
        f = str(tmp_path / f"fo{si}.parquet")
        lo, hi = si * 30, (si + 1) * 30
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(texts[lo:hi])}), f)
        sd = str(tmp_path / f"foidx{si}")
        build_index([f], sd, cfg)
        build_stored_fields(sd)
        shards.append(sd)
    s = ReplicatedSearcher(shards, n_replicas=2)
    try:
        before = s.call("topk_fetch", "aa bb", 6)
        key0 = s._fetch_bounds_for
        assert key0                      # table was built and keyed
        ray.kill(s.shards[0])
        after = s.call("topk_fetch", "aa bb", 6)
        assert s._fetch_bounds_for != key0     # re-keyed on promotion
        assert before["doc_id"].to_pylist() == \
            after["doc_id"].to_pylist()
        assert before["text"].to_pylist() == after["text"].to_pylist()
    finally:
        s.shutdown()


def test_sharded_mlt_equals_single(ray_session, tmp_path):
    """Distributed MLT must equal single-index MLT: seed fetched
    from its owner, term selection by GLOBAL df (a term rare locally
    but common globally must NOT be selected)."""
    from engine.build import IndexConfig, build_index, \
        build_stored_fields
    from engine.query import IndexReader
    from engine.sharded import DistributedSearcher

    rng = np.random.default_rng(131)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(4, 9),
                                 replace=False))
             for _ in range(180)]
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    files, shards = [], []
    for si in range(3):
        f = str(tmp_path / f"ml{si}.parquet")
        lo, hi = si * 60, (si + 1) * 60
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(texts[lo:hi])}), f)
        files.append(f)
        sd = str(tmp_path / f"mlidx{si}")
        build_index([f], sd, cfg)
        build_stored_fields(sd)
        shards.append(sd)
    single = str(tmp_path / "mlsingle")
    build_index(files, single, cfg)
    build_stored_fields(single)
    r = IndexReader(single)
    ds = DistributedSearcher(shards)
    try:
        for seed in (0, 75, 140):     # one seed per shard
            a = r.more_like_this_topk(seed, k=10, max_terms=4,
                                      min_df=2)
            b = ds.mlt_topk(seed, k=10, max_terms=4, min_df=2)
            assert a["doc_id"].to_pylist() == \
                b["doc_id"].to_pylist(), seed
            assert a["score"].to_pylist() == \
                b["score"].to_pylist(), seed
        assert ds.mlt_topk(10**9).num_rows == 0  # unknown seed
    finally:
        ds.shutdown()


def test_numbuckets_merge_equals_global_hll(ray_session, tmp_path):
    """Register max-merge over shards must equal one HLL of the
    global distinct value set (lattice property), and at this
    cardinality the raw estimate lands near truth."""
    import hashlib
    import struct

    from engine.build import IndexConfig, build_index
    from engine.registry import _HLL_NUM, HLL_MD5_P
    from engine.sharded import DistributedSearcher

    rng = np.random.default_rng(151)
    # cardinality well ABOVE the register count (2^8): the raw
    # estimator (no linear-counting correction — the repo's
    # documented reproducibility tradeoff) is only accurate there
    vals = [f"v{i:04d}" for i in range(4000)]
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=256)
    shards, seen = [], set()
    for si in range(3):
        lo = si * 700
        cats = [vals[int(i)] for i in
                rng.integers(0, len(vals), size=700)]
        seen.update(cats)
        f = str(tmp_path / f"nb{si}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, lo + 700), type=pa.int64()),
            "text": pa.array(["hit"] * 700),
            "cat": pa.array(cats)}), f)
        sd = str(tmp_path / f"nbidx{si}")
        build_index([f], sd, cfg)
        shards.append(sd)

    # reference: one HLL over the global distinct set
    p = HLL_MD5_P
    regs = np.zeros(1 << p, dtype=np.int64)
    for v in seen:
        h = struct.unpack(
            "<Q", hashlib.md5(v.encode()).digest()[8:])[0]
        idx = h >> (64 - p)
        rest = h & ((1 << (64 - p)) - 1)
        rho = (64 - p + 1) if rest == 0 \
            else (rest & -rest).bit_length()
        regs[idx] = max(regs[idx], rho)
    s = sum(1 << (57 - int(r)) for r in regs)
    want = int(np.floor(_HLL_NUM / float(s) + 0.5))

    ds = DistributedSearcher(shards)
    try:
        got = ds.facet_numbuckets("hit", "cat")["n_buckets"][0] \
            .as_py()
        assert got == want
        assert abs(got - len(seen)) / len(seen) < 0.25
    finally:
        ds.shutdown()


def test_serve_job_shard_and_query(ray_session, tmp_path):
    """tools/serve_job.py: row-sliced shard build + every query mode
    runs and the sharded topk equals a single index over the same
    corpus."""
    import argparse

    import pyarrow.parquet as pqq

    from tools import serve_job as sj
    from engine.build import IndexConfig, build_index
    from engine.query import IndexReader

    rng = np.random.default_rng(161)
    vocab = ["aa", "bb", "cc", "dd"]
    n = 120
    src = str(tmp_path / "corpus.parquet")
    pqq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array([" ".join(rng.choice(vocab, size=6))
                          for _ in range(n)]),
        "source": pa.array([f"s{int(i) % 3}" for i in range(n)])}),
        src)
    out = str(tmp_path / "cluster")
    r = sj.cmd_shard(argparse.Namespace(
        input=src, output=out, n_shards=3, text_col="text",
        doc_id_col="doc_id", route_col=None, n_buckets=2,
        batch_size=64, no_analysis=True, stored_fields=True))
    assert r["n_shards"] == 3 and r["n_docs"] == n

    qf = str(tmp_path / "qs.txt")
    open(qf, "w").write("aa bb\ncc\n")
    for mode in ("topk", "fetch", "cursor", "facet"):
        m = sj.cmd_query(argparse.Namespace(
            cluster=out, queries=qf, k=5, mode=mode, pages=2,
            facet_col="source"))
        assert m["n_queries"] == 2 and m["result_rows"] > 0, mode

    # parity: the job-built cluster answers like one single index
    from engine.sharded import DistributedSearcher
    single = str(tmp_path / "single")
    build_index([src], single, IndexConfig(
        text_col="text", conv_cols=None, doc_id_col="doc_id",
        stop_words=None, stemming=False, n_buckets=2,
        hot_df_threshold=10**9, batch_size=64))
    import json as _json
    shards = _json.load(open(out + "/cluster.json"))["shards"]
    ds = DistributedSearcher(shards)
    try:
        a = IndexReader(single).topk("aa bb", 20)
        b = ds.topk("aa bb", 20)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        assert a["score"].to_pylist() == b["score"].to_pylist()
    finally:
        ds.shutdown()


def test_distributed_selection_exact_percentiles(ray_session,
                                                 tmp_path):
    """Iterative rank partitioning must return EXACTLY numpy's
    percentile_disc at every tested pct, including duplicates-heavy
    domains and single-shard-owned extremes."""
    from engine.build import IndexConfig, build_index
    from engine.sharded import DistributedSearcher

    rng = np.random.default_rng(171)
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    shards, allv = [], []
    for si in range(3):
        lo = si * 90
        # skewed + duplicate-heavy integer values; shard2 owns the
        # extreme tail exclusively
        v = rng.integers(0, 40, size=90) ** 2
        if si == 2:
            v[:5] = [9999, 9999, 10000, 0, 0]
        allv += v.tolist()
        f = str(tmp_path / f"ps{si}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, lo + 90), type=pa.int64()),
            "text": pa.array(["hit"] * 90),
            "val": pa.array(v, type=pa.int64())}), f)
        sd = str(tmp_path / f"psidx{si}")
        build_index([f], sd, cfg)
        shards.append(sd)
    sv = sorted(allv)
    n = len(sv)
    ds = DistributedSearcher(shards)
    try:
        for pct in (1, 25, 50, 75, 90, 99, 100):
            want = sv[(pct * n + 99) // 100 - 1]
            got = ds.percentile_disc("hit", "val", pct=pct)
            assert got.num_rows == 1
            assert got[f"p{pct}"][0].as_py() == want, pct
            assert ds.last_selection_rounds <= 16
        # no-match query → empty
        assert ds.percentile_disc("zz", "val").num_rows == 0
    finally:
        ds.shutdown()


def test_replica_failover_full_exact_results(ray_session, tmp_path):
    """Killing a primary replica must NOT lose results: the retried
    request promotes a spare and returns the bit-identical FULL
    answer (contrast shards.tolerant, which drops the dead shard)."""
    import ray

    from engine.build import IndexConfig, build_index
    from engine.sharded import ReplicatedSearcher

    rng = np.random.default_rng(181)
    vocab = ["aa", "bb", "cc"]
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    shards = []
    for si in range(3):
        f = str(tmp_path / f"rp{si}.parquet")
        lo, hi = si * 60, (si + 1) * 60
        texts = [" ".join(rng.choice(vocab, size=6))
                 for _ in range(hi - lo)]
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(texts)}), f)
        sd = str(tmp_path / f"rpidx{si}")
        build_index([f], sd, cfg)
        shards.append(sd)
    rs = ReplicatedSearcher(shards, n_replicas=2)
    try:
        before = rs.call("topk", "aa bb", 200)
        ray.kill(rs.shards[1])          # kill a PRIMARY mid-flight
        after = rs.call("topk", "aa bb", 200)
        assert rs.promotions == 1
        assert after["doc_id"].to_pylist() == \
            before["doc_id"].to_pylist()
        assert after["score"].to_pylist() == \
            before["score"].to_pylist()
        # full coverage: docs from the killed shard's range present
        assert any(60 <= d < 120 for d in after["doc_id"].to_pylist())
        # second kill on the same shard exhausts spares → raises
        ray.kill(rs.shards[1])
        import pytest
        with pytest.raises(ray.exceptions.RayActorError):
            rs.call("topk", "aa bb", 10)
    finally:
        rs.shutdown()


def test_colocated_join_equals_plain_join(ray_session, tmp_path):
    """Co-partitioned join must equal a plain join, including keys a
    shard owns exclusively and keys with no match on one side."""
    import pandas as pd

    from engine.sharded import colocated_join

    rng = np.random.default_rng(191)
    ka = rng.integers(0, 40, size=200)
    a = pa.table({"k": pa.array(ka, type=pa.int64()),
                  "x": pa.array(rng.integers(0, 9, 200),
                                type=pa.int64())})
    kb = np.arange(0, 30, dtype=np.int64)     # keys 30..39 unmatched
    b = pa.table({"kk": pa.array(kb, type=pa.int64()),
                  "name": pa.array([f"n{int(v)}" for v in kb])})
    fa = str(tmp_path / "a.parquet")
    fb = str(tmp_path / "b.parquet")
    pq.write_table(a, fa)
    pq.write_table(b, fb)
    got = colocated_join([fa], [fb], "k", "kk",
                         str(tmp_path / "co"), n_shards=3) \
        .to_pandas().sort_values(["k", "x", "name"]) \
        .reset_index(drop=True)
    want = a.to_pandas().merge(
        b.to_pandas(), left_on="k", right_on="kk") \
        .drop(columns=["kk"]) \
        .sort_values(["k", "x", "name"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "x", "name"]], want[["k", "x", "name"]])


def test_stats_full_exact_moments(ray_session, tmp_path):
    """Exact-bignum moment fold: mean/stddev must equal the direct
    closed-form computation over all values; n==1 yields stddev
    None; no-match yields the count-0 row."""
    import math

    from engine.build import IndexConfig, build_index
    from engine.sharded import DistributedSearcher

    rng = np.random.default_rng(201)
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    shards, allv = [], []
    for si in range(3):
        lo = si * 50
        v = rng.integers(0, 10**6, size=50)
        # one lonely doc matches 'solo' on shard0 only
        texts = ["hit solo" if (si == 0 and i == 0) else "hit"
                 for i in range(50)]
        allv += v.tolist()
        f = str(tmp_path / f"sf{si}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, lo + 50), type=pa.int64()),
            "text": pa.array(texts),
            "val": pa.array(v, type=pa.int64())}), f)
        sd = str(tmp_path / f"sfidx{si}")
        build_index([f], sd, cfg)
        shards.append(sd)
    ds = DistributedSearcher(shards)
    try:
        t = ds.stats_full("hit", "val")
        n = len(allv)
        s = sum(allv)
        ss = sum(x * x for x in allv)
        assert t["n_count"][0].as_py() == n
        assert t["n_sum"][0].as_py() == s
        assert t["n_mean"][0].as_py() == float(s) / float(n)
        assert t["n_stddev"][0].as_py() == math.sqrt(
            float(n * ss - s * s) / float(n * (n - 1)))
        one = ds.stats_full("solo", "val")
        assert one["n_count"][0].as_py() == 1
        assert one["n_stddev"][0].as_py() is None
        zero = ds.stats_full("zz", "val")
        assert zero["n_count"][0].as_py() == 0
    finally:
        ds.shutdown()
