"""ReRank / JoinUtil-ScoreMode.Max support ops / TotalHitCount /
mlt.interestingTerms — semantics unit tests over a tiny known corpus."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.build import (IndexConfig, build_index, build_stored_fields,
                          delete_docs)
from engine.query import IndexReader, idf


@pytest.fixture(scope="module")
def tiny_idx(tmp_path_factory, ray_session):
    base = tmp_path_factory.mktemp("rescore")
    src = str(base / "src")
    os.makedirs(src)
    texts = {
        0: "alpha beta",               # main strong, no rerank terms
        1: "alpha rho",                # main weak, rerank match
        2: "alpha alpha beta beta",    # main strong
        3: "rho rho sigma",            # no main match
        4: "beta rho",                 # main + rerank
        5: "filler words here",
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": [texts[i] for i in sorted(texts)]}),
        os.path.join(src, "a.parquet"))
    idx = str(base / "idx")
    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9)
    build_index(src, idx, cfg)
    build_stored_fields(idx)
    return idx


def test_rerank_keeps_unmatched_window_scores(tiny_idx):
    r = IndexReader(tiny_idx, preload=True)
    main = r.brute_force_topk("alpha beta", 10)
    rer = r.rerank_topk("alpha beta", "rho", k=10, rerank_docs=10,
                        rerank_weight=5.0)
    main_sc = dict(zip(main["doc_id"].to_pylist(),
                       main["score"].to_pylist()))
    rer_sc = dict(zip(rer["doc_id"].to_pylist(),
                      rer["score"].to_pylist()))
    # docs without any rerank term keep their exact f32 main score
    for d in (0, 2):
        assert rer_sc[d] == main_sc[d]
    # docs matching the rerank query gained score
    for d in (1, 4):
        assert rer_sc[d] > main_sc[d]
    # with a big weight the rerank matches outrank the pure-main docs
    order = rer["doc_id"].to_pylist()
    assert set(order[:2]) == {1, 4}


def test_count_matches_and_delete_mask(tiny_idx, tmp_path_factory):
    import shutil

    r = IndexReader(tiny_idx)
    assert r.count_matches("alpha beta") == 4      # docs 0,1,2,4
    assert r.count_matches("nosuchterm") == 0
    work = str(tmp_path_factory.mktemp("delidx") / "idx")
    shutil.copytree(tiny_idx, work)
    delete_docs(work, [2])
    r2 = IndexReader(work)
    assert r2.count_matches("alpha beta") == 3


def test_filter_cache_hits_and_equivalence(tiny_idx):
    r = IndexReader(tiny_idx)
    a = r.boolean_topk(should=["alpha"], filters=["beta"], k=10)
    assert r.filter_cache_misses == 1 and r.filter_cache_hits == 0
    b = r.boolean_topk(should=["alpha"], filters=["beta"], k=10)
    assert r.filter_cache_hits == 1
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()
    # docset matches the clause's postings
    ds = r.filter_docset("beta")
    assert ds.tolist() == [0, 2, 4]
    # missing term -> empty set, still cached
    assert r.filter_docset("nosuchterm").size == 0
    assert r.filter_docset("nosuchterm").size == 0
    assert r.filter_cache_hits == 3


def test_query_result_cache_windowing(tiny_idx):
    r = IndexReader(tiny_idx)
    direct = r.topk("alpha beta", 10)
    # k=3 rounds up to the window (20): miss, then k<=window hits
    a = r.cached_topk("alpha beta", 3)
    assert r.qr_cache_misses == 1 and r.qr_cache_hits == 0
    b = r.cached_topk("alpha beta", 10)
    assert r.qr_cache_hits == 1 and r.qr_cache_misses == 1
    assert a["doc_id"].to_pylist() == direct.slice(0, 3)["doc_id"] \
        .to_pylist()
    assert b["doc_id"].to_pylist() == direct["doc_id"].to_pylist()
    assert b["score"].to_pylist() == direct["score"].to_pylist()
    # the tiny corpus has fewer matches than the window, so even a
    # k beyond the cached rows is a HIT (window wasn't filled)
    c = r.cached_topk("alpha beta", 50)
    assert r.qr_cache_hits == 2
    assert c.num_rows == direct.num_rows
    # a different strategy is a different cache key
    r.cached_topk("alpha beta", 3, strategy="brute")
    assert r.qr_cache_misses == 2
    # LRU eviction
    r._qr_cache_cap = 2
    r.cached_topk("rho", 3)
    r.cached_topk("beta", 3)        # evicts ("alpha beta", "auto")
    assert ("alpha beta", "auto") not in r._qr_cache
    # window growth past qr_window on big k: k=25 -> window 40
    r2 = IndexReader(tiny_idx)
    r2.qr_max_docs_cached = 200
    r2.cached_topk("alpha", 25)
    assert r2._qr_cache[("alpha", "auto")][0] == 40


def test_filter_cache_lru_eviction(tiny_idx):
    r = IndexReader(tiny_idx)
    r._filter_cache_cap = 2
    r.filter_docset("alpha")
    r.filter_docset("beta")
    r.filter_docset("rho")          # evicts alpha
    assert "alpha" not in r._filter_cache
    r.filter_docset("alpha")        # miss again
    assert r.filter_cache_misses == 4 and r.filter_cache_hits == 0


def test_mlt_interesting_terms(tiny_idx):
    r = IndexReader(tiny_idx, preload=True)
    t = r.mlt_interesting_terms(4, max_terms=5, min_df=2)
    terms = t["term"].to_pylist()
    dfs = t["df"].to_pylist()
    # doc 4 = "beta rho": both have df >= 2; df asc, term asc
    assert terms == ["beta", "rho"]
    assert dfs == [3, 3]
    for i, term in enumerate(terms):
        assert t["boost"][i].as_py() == idf(r.N, dfs[i])
