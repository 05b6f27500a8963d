"""Sorted-index early-termination collector (TopFieldCollector over
the index sort) and the UAX29URLEmail extract tokenizer."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_early_topk_matches_full_and_prunes(smoke_index):
    from engine.query import IndexReader

    idx, _man, _n = smoke_index
    r = IndexReader(idx)
    q = "merge window"
    tab, st = r.early_topk_docid(q, 10)
    got = tab["doc_id"].to_numpy()
    # reference: full decode of both postings
    full = np.unique(np.concatenate(
        [r.filter_docset(t) for t in r.analyzer.query_terms(q)]))
    assert np.array_equal(got, full[:10])
    assert st["decoded_blocks"] <= st["total_blocks"]
    if st["total_blocks"] > 8:
        assert st["decoded_blocks"] < st["total_blocks"]


def test_early_topk_skips_deleted(ray_session, smoke_corpus,
                                  tmp_path_factory):
    from engine.build import IndexConfig, build_index, delete_docs
    from engine.query import IndexReader

    corpus, _n = smoke_corpus
    idx = str(tmp_path_factory.mktemp("et_index"))
    build_index(corpus, idx, IndexConfig(n_buckets=2, batch_size=256))
    r0 = IndexReader(idx)
    tab0, _ = r0.early_topk_docid("merge", 5)
    first = tab0["doc_id"].to_numpy()
    assert len(first) == 5
    delete_docs(idx, first[:3])          # kill the head of the result
    r1 = IndexReader(idx)
    tab1, _ = r1.early_topk_docid("merge", 5)
    got = tab1["doc_id"].to_numpy()
    assert not set(first[:3]) & set(got)
    term = r1.analyzer.query_terms("merge")[0]   # stemmed form
    full = r1.filter_docset(term)
    keep = r1._keep(full)
    live = full[keep] if keep is not None else full
    assert np.array_equal(got, live[:5])


def test_uax_tokenizer_positions_and_phrase():
    from engine.analysis import Analyzer

    a = Analyzer(None, False, tokenizer="uax_url_email")
    toks = a.analyze_text("ping http://h.io/x then bob@q.org done")
    assert toks == [("ping", 0), ("http://h.io/x", 1), ("then", 2),
                    ("bob@q.org", 3), ("done", 4)]
    # batch path identical
    off, terms, pos, _ = a.analyze_flat(
        pa.array(["ping http://h.io/x then bob@q.org done"]))
    assert list(terms) == [t for t, _ in toks]
    assert list(pos) == [p for _, p in toks]
