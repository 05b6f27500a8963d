"""SPLITSHARD analog (Solr collections API ``SPLITSHARD`` /
``SolrIndexSplitter`` [U]): ``split_index`` partitions a complete
doc_id-mode index into two standalone children by docID range without
re-analysis — every child must behave bit-identically to a fresh
build over that half of the corpus (scores, phrases, stats), and the
children must accept segment-mode appends but refuse rewrite appends
(they carry no fragment lineage)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


def _cfg(codec: str = "vbyte"):
    from engine.build import IndexConfig

    return IndexConfig(text_col="text", conv_cols=None,
                       doc_id_col="doc_id", stop_words=None,
                       stemming=False, n_buckets=3,
                       hot_df_threshold=10**9, batch_size=256,
                       postings_codec=codec)


@pytest.fixture(scope="module")
def _corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("split")
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(300)]
    n = 1800
    f = str(tmp / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": [" ".join(rng.choice(vocab, size=rng.integers(3, 15)))
                 for _ in range(n)]}), f)
    return str(tmp), f, n


QUERIES = ["w1 w2", "w10 w20 w30", "w250", "w5"]


def _halves(tmp, f, cut):
    t = pq.read_table(f)
    flo, fhi = os.path.join(tmp, f"dlo{cut}.parquet"), \
        os.path.join(tmp, f"dhi{cut}.parquet")
    if not os.path.exists(flo):
        pq.write_table(t.filter(pc.less(t["doc_id"], cut)), flo)
        pq.write_table(t.filter(pc.greater_equal(t["doc_id"], cut)), fhi)
    return flo, fhi


@pytest.mark.parametrize("codec", ["vbyte", "for"])
def test_split_matches_fresh_half_builds(ray_session, _corpus, codec):
    from engine.build import build_index, split_index
    from engine.check import check_index
    from engine.manifest import load as man_load
    from engine.query import IndexReader

    tmp, f, n = _corpus
    cfg = _cfg(codec)
    idx = os.path.join(tmp, f"idx_{codec}")
    build_index([f], idx, cfg)
    lo, hi = os.path.join(tmp, f"lo_{codec}"), \
        os.path.join(tmp, f"hi_{codec}")
    res = split_index(idx, [lo, hi])
    assert res["N"] == [n // 2, n - n // 2]

    flo, fhi = _halves(tmp, f, res["split_doc"])
    reflo = os.path.join(tmp, f"reflo_{codec}")
    refhi = os.path.join(tmp, f"refhi_{codec}")
    build_index([flo], reflo, cfg)
    build_index([fhi], refhi, cfg)

    for child, ref in ((lo, reflo), (hi, refhi)):
        check_index(child)
        rc, rr = IndexReader(child), IndexReader(ref)
        # exact collection stats (N, sum_cf, avgdl drive idf/norms)
        mc, mr = man_load(child)["stats"], man_load(ref)["stats"]
        for k in ("N", "sum_cf", "n_postings", "avgdl"):
            assert mc[k] == mr[k], (k, mc[k], mr[k])
        for q in QUERIES:
            assert rc.topk(q, 10).equals(rr.topk(q, 10)), (child, q)
        assert rc.phrase_topk("w1 w2", 10).equals(
            rr.phrase_topk("w1 w2", 10))


def test_split_edge_all_docs_one_side(ray_session, _corpus):
    from engine.build import build_index, split_index
    from engine.query import IndexReader

    tmp, f, n = _corpus
    cfg = _cfg()
    idx = os.path.join(tmp, "idx_vbyte")   # built by the param test
    if not os.path.isdir(idx):
        build_index([f], idx, cfg)
    lo, hi = os.path.join(tmp, "lo_edge"), os.path.join(tmp, "hi_edge")
    res = split_index(idx, [lo, hi], split_doc=0)
    assert res["N"] == [0, n]
    assert IndexReader(lo).topk("w1", 5).num_rows == 0
    full = IndexReader(idx).topk("w1 w2 w3", 10)
    assert IndexReader(hi).topk("w1 w2 w3", 10).equals(full)


def test_split_refuses_active_deletes(ray_session, _corpus):
    from engine.build import build_index, delete_docs, split_index

    tmp, f, _ = _corpus
    idx = os.path.join(tmp, "idx_del")
    build_index([f], idx, _cfg())
    delete_docs(idx, [3, 7])
    with pytest.raises(AssertionError, match="fold deletes"):
        split_index(idx, [os.path.join(tmp, "x0"),
                          os.path.join(tmp, "x1")])


def test_split_child_appends(ray_session, _corpus):
    """Children accept segment-mode appends (new docs searchable with
    exact merged stats) and refuse rewrite appends."""
    from engine.build import build_index, split_index
    from engine.query import IndexReader

    tmp, f, n = _corpus
    cfg = _cfg()
    idx = os.path.join(tmp, "idx_vbyte")
    if not os.path.isdir(idx):
        build_index([f], idx, cfg)
    lo, hi = os.path.join(tmp, "lo_app"), os.path.join(tmp, "hi_app")
    split_index(idx, [lo, hi])

    extra = os.path.join(tmp, "extra.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n, n + 5), pa.int64()),
        "text": ["zebra w1"] * 5}), extra)

    with pytest.raises(ValueError, match="segment"):
        build_index([f, extra], hi, cfg)

    build_index([f, extra], hi, cfg, append_mode="segment")
    top = IndexReader(hi).topk("zebra", 10)
    assert top.num_rows == 5
    assert set(top["doc_id"].to_pylist()) == set(range(n, n + 5))
