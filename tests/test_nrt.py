"""NRT search (DirectoryReader.open(IndexWriter) analog): a reader
over disk segments + the RAM buffer must be bit-identical to a full
rebuild over the union, and invisible until requested."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _mk(path, lo, hi, seed):
    rng = np.random.default_rng(seed)
    words = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                      "zeta", "eta", "theta"], dtype=object)
    texts = [" ".join(words[rng.integers(0, 8, size=rng.integers(4, 15))])
             for _ in range(hi - lo)]
    # plant a phrase in a buffered-range doc
    if lo <= 7 < hi:
        texts[7 - lo] = "alpha beta " + texts[7 - lo]
    if hi > 250:
        texts[-1] = "alpha beta " + texts[-1]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
        "text": pa.array(texts)}), path)


@pytest.fixture(scope="module")
def nrt_setup(ray_session, tmp_path_factory):
    from engine.build import IndexConfig, build_index

    root = tmp_path_factory.mktemp("nrt")
    f1, f2 = str(root / "p1.parquet"), str(root / "p2.parquet")
    _mk(f1, 0, 200, 1)
    _mk(f2, 200, 300, 2)
    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    base = str(root / "base")
    build_index([f1], base, cfg)
    full = str(root / "full")
    build_index([f1, f2], full, cfg)
    return root, f1, f2, base, full, cfg


def test_nrt_reader_equals_full_rebuild(nrt_setup):
    from engine.nrt import NrtWriter
    from engine.query import IndexReader

    root, f1, f2, base, full, cfg = nrt_setup
    w = NrtWriter(base)
    w.add_documents(pq.read_table(f2))
    nrt = w.reader()
    ref = IndexReader(full)
    assert nrt.N == ref.N and nrt.avgdl == ref.avgdl
    for q in ("alpha", "alpha beta", "beta gamma delta", "theta zeta"):
        a = nrt.topk(q, k=25)
        b = ref.topk(q, k=25)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q
    # phrase over a buffered doc (positions ride in the RAM segment)
    pn = nrt.phrase_topk("alpha beta", k=25)
    pr = ref.phrase_topk("alpha beta", k=25)
    assert pn["doc_id"].to_pylist() == pr["doc_id"].to_pylist()
    assert 299 in pn["doc_id"].to_pylist() or \
        7 in pn["doc_id"].to_pylist()


def test_nrt_invisible_until_reader_and_point_in_time(nrt_setup):
    from engine.nrt import NrtWriter
    from engine.query import IndexReader

    root, f1, f2, base, full, cfg = nrt_setup
    w = NrtWriter(base)
    plain = IndexReader(base)
    n0 = plain.topk("alpha", k=500).num_rows
    w.add_documents(pq.read_table(f2))
    # plain reader opened before buffering sees nothing new
    assert IndexReader(base).topk("alpha", k=500).num_rows == n0
    snap = w.reader()
    n1 = snap.topk("alpha", k=500).num_rows
    assert n1 > n0
    # the snapshot is point-in-time: buffering MORE docs doesn't change it
    extra = pa.table({"doc_id": pa.array([900], type=pa.int64()),
                      "text": pa.array(["alpha alpha alpha"])})
    w.add_documents(extra)
    assert snap.topk("alpha", k=500).num_rows == n1
    assert w.reader().topk("alpha", k=500).num_rows == n1 + 1
    # duplicate buffered id rejected
    with pytest.raises(ValueError):
        w.add_documents(extra)


def test_nrt_commit_round_trip(ray_session, tmp_path_factory):
    from engine.build import IndexConfig, build_index
    from engine.check import check_index
    from engine.nrt import NrtWriter
    from engine.query import IndexReader

    root = tmp_path_factory.mktemp("nrt_commit")
    f1, f2 = str(root / "p1.parquet"), str(root / "p2.parquet")
    _mk(f1, 0, 150, 3)
    _mk(f2, 150, 260, 4)
    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    idx = str(root / "idx")
    build_index([f1], idx, cfg)
    w = NrtWriter(idx)
    w.add_documents(pq.read_table(f2))
    before = w.reader().topk("alpha beta", k=30)
    man = w.commit(str(root / "flush"))
    assert man["stats"]["N"] == 260
    check_index(idx)
    after = IndexReader(idx).topk("alpha beta", k=30)
    assert before["doc_id"].to_pylist() == after["doc_id"].to_pylist()
    assert before["score"].to_pylist() == after["score"].to_pylist()
    # buffer cleared; a fresh snapshot now comes straight from disk
    assert w.reader().topk("alpha beta", k=30)["doc_id"].to_pylist() \
        == after["doc_id"].to_pylist()


def test_nrt_buffered_deletes_and_update(ray_session, tmp_path_factory):
    from engine.build import IndexConfig, build_index
    from engine.nrt import NrtWriter
    from engine.query import IndexReader

    root = tmp_path_factory.mktemp("nrt_del")
    f1 = str(root / "p1.parquet")
    _mk(f1, 0, 120, 9)
    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    idx = str(root / "idx")
    build_index([f1], idx, cfg)
    w = NrtWriter(idx)

    base_ids = set(IndexReader(idx).topk("alpha", k=500)
                   ["doc_id"].to_pylist())
    victim = sorted(base_ids)[0]
    w.delete_documents([victim])
    snap = w.reader()
    nrt_ids = set(snap.topk("alpha", k=500)["doc_id"].to_pylist())
    assert victim not in nrt_ids and nrt_ids == base_ids - {victim}
    # tombstone stats: N/avgdl unchanged by a buffered delete
    assert snap.N == 120

    # delete a still-buffered doc: dropped from the RAM buffer
    w.add_documents(pa.table({
        "doc_id": pa.array([500, 501], type=pa.int64()),
        "text": pa.array(["alpha alpha", "alpha beta"])}))
    w.delete_documents([500])
    ids2 = set(w.reader().topk("alpha", k=500)["doc_id"].to_pylist())
    assert 501 in ids2 and 500 not in ids2

    # update = delete old id + fresh-id append; re-add of a deleted
    # id is rejected (the documented contract)
    w.update_documents([501], pa.table({
        "doc_id": pa.array([502], type=pa.int64()),
        "text": pa.array(["alpha gamma"])}))
    ids3 = set(w.reader().topk("alpha", k=500)["doc_id"].to_pylist())
    assert 502 in ids3 and 501 not in ids3
    with pytest.raises(ValueError):
        w.add_documents(pa.table({
            "doc_id": pa.array([501], type=pa.int64()),
            "text": pa.array(["alpha"])}))

    # commit publishes deletes + appends; disk reader == snapshot
    before = w.reader().topk("alpha", k=500)
    man = w.commit(str(root / "flush"))
    assert man["deletes"]["n"] == 1          # only the disk-range id
    after = IndexReader(idx).topk("alpha", k=500)
    assert before["doc_id"].to_pylist() == after["doc_id"].to_pylist()
    assert before["score"].to_pylist() == after["score"].to_pylist()


def test_nrt_rollback(ray_session, tmp_path_factory):
    from engine.build import IndexConfig, build_index
    from engine.nrt import NrtWriter
    from engine.query import IndexReader

    root = tmp_path_factory.mktemp("nrt_rb")
    f1 = str(root / "p1.parquet")
    _mk(f1, 0, 80, 12)
    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    idx = str(root / "idx")
    build_index([f1], idx, cfg)
    w = NrtWriter(idx)
    base = IndexReader(idx).topk("alpha", k=500)
    w.add_documents(pa.table({
        "doc_id": pa.array([700], type=pa.int64()),
        "text": pa.array(["alpha alpha"])}))
    w.delete_documents([0])
    w.rollback()
    after = w.reader().topk("alpha", k=500)
    assert base["doc_id"].to_pylist() == after["doc_id"].to_pylist()
    assert base["score"].to_pylist() == after["score"].to_pylist()


def test_nrt_random_ops_equal_logical_rebuild(ray_session,
                                              tmp_path_factory):
    """Property: after ANY random sequence of buffered adds, deletes
    and commits, the NRT snapshot's results equal a from-scratch build
    over the live logical state with the same tombstone semantics —
    checked by doc-id sets per query (scores differ from a fresh build
    by design: tombstones keep df/avgdl until folded)."""
    from engine.build import IndexConfig, build_index
    from engine.nrt import NrtWriter
    from engine.query import IndexReader

    root = tmp_path_factory.mktemp("nrt_prop")
    rng = np.random.default_rng(31)
    words = np.array(["aa", "bb", "cc", "dd", "ee"], dtype=object)

    def text():
        return " ".join(rng.choice(words, size=int(rng.integers(3, 9))))

    f0 = str(root / "base.parquet")
    live = {i: " ".join(rng.choice(words, size=6)) for i in range(60)}
    pq.write_table(pa.table({
        "doc_id": pa.array(sorted(live), type=pa.int64()),
        "text": pa.array([live[i] for i in sorted(live)])}), f0)
    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=32)
    idx = str(root / "idx")
    build_index([f0], idx, cfg)
    w = NrtWriter(idx)
    next_id = 60
    for step in range(12):
        op = rng.integers(0, 3)
        if op == 0:                                   # add 1-3 docs
            n = int(rng.integers(1, 4))
            rows = {next_id + j: text() for j in range(n)}
            next_id += n
            live.update(rows)
            w.add_documents(pa.table({
                "doc_id": pa.array(sorted(rows), type=pa.int64()),
                "text": pa.array([rows[i] for i in sorted(rows)])}))
        elif op == 1 and live:                        # delete 1-2 docs
            victims = rng.choice(sorted(live),
                                 size=min(len(live),
                                          int(rng.integers(1, 3))),
                                 replace=False)
            for v in victims:
                live.pop(int(v))
            w.delete_documents([int(v) for v in victims])
        else:                                         # hard commit
            w.commit(str(root / f"flush{step}"))
        snap = w.reader()
        for q in ("aa", "bb cc", "dd ee aa"):
            got = set(snap.topk(q, k=500)["doc_id"].to_pylist())
            terms = set(q.split())
            want = {i for i, t in live.items()
                    if terms & set(t.split())}
            assert got == want, (step, q)


def test_nrt_buffered_dv_updates(ray_session, tmp_path_factory):
    """Buffered updateNumericDocValue: visible in the next reader()
    before commit, docset frozen at call time (later adds unaffected),
    rollback discards, commit publishes disk generations that
    reproduce the NRT snapshot exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_index
    from engine.nrt import NrtWriter
    from engine.query import IndexReader

    root = tmp_path_factory.mktemp("nrtdv")
    src = str(root / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "text": pa.array(["alpha beta", "alpha", "beta", "gamma",
                          "alpha gamma", "delta"]),
        "size": pa.array(np.arange(6, dtype=np.int64) * 10),
    }), src)
    idx = str(root / "idx")
    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9)
    build_index([src], idx, cfg)

    w = NrtWriter(idx)
    # buffered doc 10 contains alpha BEFORE the update -> covered
    w.add_documents(pa.table({
        "doc_id": pa.array([10], pa.int64()),
        "text": pa.array(["alpha omega"])}))
    n = w.update_numeric_docvalue("alpha", "size", 777)
    assert n == 4                       # docs 0,1,4 on disk + 10 in RAM
    # doc 11 added AFTER the update: frozen docset must not cover it
    w.add_documents(pa.table({
        "doc_id": pa.array([11], pa.int64()),
        "text": pa.array(["alpha later"])}))

    r = w.reader()
    got = r.numeric_docvalues("size", np.array([0, 1, 2, 4, 10, 11]))
    assert got[0] == 777 and got[1] == 777 and got[3] == 777
    assert got[2] == 20                 # beta-only doc: base value
    assert got[4] == 777                # RAM doc covered by the update
    assert np.isnan(got[5])             # post-update RAM doc: no base yet

    # rollback discards the buffered update (and the adds)
    w.rollback()
    r2 = w.reader()
    assert r2.numeric_docvalues("size", np.array([0]))[0] == 0

    # redo and hard-commit: disk generations reproduce the snapshot
    w.add_documents(pa.table({
        "doc_id": pa.array([10], pa.int64()),
        "text": pa.array(["alpha omega"])}))
    w.update_numeric_docvalue("alpha", "size", 777)
    snap = w.reader().numeric_docvalues(
        "size", np.array([0, 1, 2, 4, 10]))
    w.commit(str(root / "flush"))
    disk = IndexReader(idx).numeric_docvalues(
        "size", np.array([0, 1, 2, 4, 10]))
    assert list(disk[:4]) == list(snap[:4])
    assert disk[4] == 777               # flushed doc carries the update


def test_nrt_dv_update_of_deleted_buffered_doc(ray_session,
                                               tmp_path_factory):
    """Review regression: a RAM-buffered doc covered by a frozen dv
    update and then deleted before commit must NOT leak into the
    published generation (no out-of-range docIDs; a later append
    reusing the id must not inherit the stale override)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_index
    from engine.check import check_index
    from engine.nrt import NrtWriter
    from engine.query import IndexReader

    root = tmp_path_factory.mktemp("nrtdvdel")
    src = str(root / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(3, dtype=np.int64)),
        "text": pa.array(["alpha", "beta", "alpha beta"]),
        "size": pa.array([10, 20, 30], pa.int64()),
    }), src)
    idx = str(root / "idx")
    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9)
    build_index([src], idx, cfg)

    w = NrtWriter(idx)
    w.add_documents(pa.table({"doc_id": pa.array([10], pa.int64()),
                              "text": pa.array(["alpha zz"])}))
    assert w.update_numeric_docvalue("alpha", "size", 777) == 3
    w.delete_documents([10])          # buffered doc dies pre-commit
    w.commit(str(root / "flush"))
    check_index(idx)                  # dv gens all within max_doc
    r = IndexReader(idx)
    got = r.numeric_docvalues("size", np.array([0, 2, 10]))
    assert got[0] == 777 and got[1] == 777
    assert np.isnan(got[2])           # id 10 never reached disk

    # a later append reusing id 10 keeps ITS OWN base value
    f2 = str(root / "more.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([10], pa.int64()),
        "text": pa.array(["fresh alpha"]),
        "size": pa.array([555], pa.int64()),
    }), f2)
    build_index([src, f2], idx, cfg)
    r2 = IndexReader(idx)
    assert r2.numeric_docvalues("size", np.array([10]))[0] == 555


def test_nrt_dv_sparse_hole_and_memo_invalidation(ray_session,
                                                  tmp_path_factory):
    """Review regressions: (a) a buffered doc in a sparse-id HOLE
    below max_doc, deleted pre-commit, must not leak into published
    dv generations; (b) the resolve memo must see docs committed by
    an earlier commit() on the same writer."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_index
    from engine.nrt import NrtWriter
    from engine.query import IndexReader

    root = tmp_path_factory.mktemp("nrtsparse")
    src = str(root / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 100], pa.int64()),   # hole: 1..99
        "text": pa.array(["alpha", "alpha beta"]),
        "size": pa.array([10, 20], pa.int64()),
    }), src)
    idx = str(root / "idx")
    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9)
    build_index([src], idx, cfg)

    w = NrtWriter(idx)
    w.add_documents(pa.table({"doc_id": pa.array([50], pa.int64()),
                              "text": pa.array(["alpha hole"])}))
    assert w.update_numeric_docvalue("alpha", "size", 777) == 3
    w.delete_documents([50])          # id 50 < max_doc=101, in a hole
    w.commit(str(root / "flush"))
    r = IndexReader(idx)
    got = r.numeric_docvalues("size", np.array([0, 50, 100]))
    assert got[0] == 777 and got[2] == 777
    assert np.isnan(got[1])           # the hole id never leaked

    # (b) memo invalidation across commit: a doc committed via THIS
    # writer must be covered by a later frozen docset
    w.add_documents(pa.table({"doc_id": pa.array([200], pa.int64()),
                              "text": pa.array(["alpha fresh"])}))
    w.commit(str(root / "flush"))
    assert w.update_numeric_docvalue("alpha", "size", 888) == 3
    w.commit(str(root / "flush"))
    r2 = IndexReader(idx)
    assert r2.numeric_docvalues("size", np.array([200]))[0] == 888


def test_nrt_delete_of_buffered_hole_id_not_tombstoned(
        ray_session, tmp_path_factory):
    """A doc buffered then deleted before any flush never reached disk,
    so commit() must NOT write a tombstone for its id: with sparse
    external doc_ids the id can be a hole below max_doc, and a stale
    tombstone would mask a future append that legitimately reuses it."""
    from engine.build import IndexConfig, build_index
    from engine.nrt import NrtWriter
    from engine.query import IndexReader
    import engine.manifest as mf

    root = tmp_path_factory.mktemp("nrt_hole")
    src = str(root / "sparse.parquet")
    # sparse ids: evens only — every odd id below max_doc is a hole
    ids = np.arange(0, 200, 2, dtype=np.int64)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids),
        "text": pa.array(["alpha beta"] * len(ids))}), src)
    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    idx = str(root / "idx")
    build_index([src], idx, cfg)

    w = NrtWriter(idx)
    w.add_documents(pa.table({
        "doc_id": pa.array([51], type=pa.int64()),
        "text": pa.array(["gamma delta"])}))
    w.delete_documents([51])          # still RAM-buffered: drop, no disk id
    w.commit(str(root / "flush1"))
    man = mf.load(idx)
    assert man.get("deletes") is None, \
        "buffered-then-deleted id must not become a disk tombstone"

    # the id is legitimately reusable by a later append
    w.add_documents(pa.table({
        "doc_id": pa.array([51], type=pa.int64()),
        "text": pa.array(["gamma delta"])}))
    w.commit(str(root / "flush2"))
    hits = IndexReader(idx).topk("gamma", k=10)["doc_id"].to_pylist()
    assert hits == [51]

    # a delete of a COMMITTED doc still tombstones normally
    w.delete_documents([4])
    w.commit(str(root / "flush3"))
    alive = IndexReader(idx).topk("alpha", k=500)["doc_id"].to_pylist()
    assert 4 not in alive and 2 in alive
