"""IndexOptions parity: freq-less postings (DOCS) and omitNorms.

Upstream semantics pinned here (public Lucene 8.x behavior):
- ``IndexOptions.DOCS``: ``PostingsEnum.freq() == 1`` for every match,
  ``totalTermFreq == docFreq``, so ``avgFieldLength`` becomes
  sumDocFreq / docCount; norms still record the true field length.
- omitNorms: ``BM25Similarity`` with norms == null scores
  ``tf / (tf + k1)`` — the length factor pinned to 1.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.build import IndexConfig, build_index
from engine.check import check_index, dump_postings
from engine.query import IndexReader, idf
from engine.synth import write_transcripts


def _cfg(**kw) -> IndexConfig:
    return IndexConfig(stop_words=None, stemming=False, n_buckets=2,
                       hot_df_threshold=10**9, batch_size=512, **kw)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("optscorpus"))
    n = write_transcripts(d, n_convs=60, seed=7, n_files=2)
    return d, n


def test_store_freqs_requires_no_positions(corpus, tmp_path_factory):
    d, _ = corpus
    out = str(tmp_path_factory.mktemp("badidx"))
    with pytest.raises(ValueError, match="store_positions"):
        build_index(d, out, _cfg(store_freqs=False))


def test_docs_only_tf_one_and_stats(corpus, tmp_path_factory, ray_session):
    d, n = corpus
    out = str(tmp_path_factory.mktemp("docsidx"))
    man = build_index(
        d, out, _cfg(store_freqs=False, store_positions=False))
    check_index(out)
    dump = dump_postings(out)
    total_postings = 0
    for term, (docs, tfs, norms) in dump.items():
        assert np.all(tfs == 1), f"tf != 1 for {term!r}"
        total_postings += len(docs)
    # totalTermFreq == docFreq -> collection sum_cf == postings count
    assert man["stats"]["sum_cf"] == total_postings
    assert man["stats"]["N"] == n


def test_docs_only_scoring_and_bmw_equivalence(
        corpus, tmp_path_factory, ray_session):
    d, _ = corpus
    out = str(tmp_path_factory.mktemp("docsidx2"))
    build_index(d, out, _cfg(store_freqs=False, store_positions=False))
    r = IndexReader(out, preload=True)
    q = "merge spark window filter"
    brute = r.brute_force_topk(q, 15)
    bmw = r.bmw_topk(q, 15)
    assert brute["doc_id"].to_pylist() == bmw["doc_id"].to_pylist()
    assert brute["score"].to_pylist() == bmw["score"].to_pylist()
    # single-term score check: idf * f32(1 / (1 + cache[norm]))
    term = "merge"
    top = r.topk(term, 1)
    doc = top["doc_id"][0].as_py()
    docs, tfs, norms = dump_postings(out)[term]
    i = int(np.searchsorted(docs, doc))
    w = idf(r.N, len(docs))
    expect = np.float32(
        w * np.float32(1.0 / (1.0 + r.cache[norms[i]])))
    assert top["score"][0].as_py() == expect


def test_omit_norms_scoring(corpus, tmp_path_factory, ray_session):
    d, _ = corpus
    out = str(tmp_path_factory.mktemp("nonormsidx"))
    build_index(d, out, _cfg(omit_norms=True))
    r = IndexReader(out, preload=True)
    assert np.all(r.cache == r.k1)
    term = "merge"
    top = r.topk(term, 3)
    docs, tfs, norms = dump_postings(out)[term]
    w = idf(r.N, len(docs))
    for rank in range(top.num_rows):
        doc = top["doc_id"][rank].as_py()
        i = int(np.searchsorted(docs, doc))
        tf = float(tfs[i])
        expect = np.float32(w * np.float32(tf / (tf + r.k1)))
        assert top["score"][rank].as_py() == expect
    # BMW bounds stay valid under the constant cache
    q = "merge spark window"
    assert r.brute_force_topk(q, 10)["doc_id"].to_pylist() == \
        r.bmw_topk(q, 10)["doc_id"].to_pylist()


def test_nrt_docs_only_consistent_stats(tmp_path_factory, ray_session):
    """NRT over a freq-less index: the RAM segment's stats contribution
    uses the same sumDocFreq convention as disk, so post-commit scores
    equal the NRT snapshot's."""
    from engine.nrt import NrtWriter

    base = tmp_path_factory.mktemp("nrtdocs")
    src = str(base / "src")
    os.makedirs(src)
    rows = [(i, f"alpha beta beta gamma doc{i}") for i in range(40)]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": [r[1] for r in rows]}), os.path.join(src, "a.parquet"))
    idx = str(base / "idx")
    cfg = _cfg(conv_cols=None, doc_id_col="doc_id",
               store_freqs=False, store_positions=False)
    build_index(src, idx, cfg)

    w = NrtWriter(idx)
    w.add_documents(pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": ["beta beta beta alpha", "gamma gamma alpha"]}))
    snap = w.reader()
    nrt_top = snap.topk("beta", 5)
    # every visible tf is 1 (both disk subs and the RAM segment)
    assert all(s < 1.0 for s in nrt_top["score"].to_pylist())
    w.commit(str(base / "flush"))
    r2 = IndexReader(idx)
    post = r2.topk("beta", 5)
    assert nrt_top["doc_id"].to_pylist() == post["doc_id"].to_pylist()
    assert nrt_top["score"].to_pylist() == post["score"].to_pylist()
