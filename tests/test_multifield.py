"""Multi-field indexing: per-field stats + cross-field combination."""

from __future__ import annotations

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mf_index(ray_session, tmp_path_factory):
    from engine.build import IndexConfig
    from engine.multifield import build_multifield_index
    from engine.synth import write_transcripts

    root = tmp_path_factory.mktemp("mf")
    corpus = str(root / "corpus")
    write_transcripts(corpus, n_convs=120, seed=3, n_files=2)
    idx = str(root / "idx")
    base = dict(conv_cols=("conv_id", "turn_idx"), stop_words=None,
                stemming=False, n_buckets=2, hot_df_threshold=10**9)
    mans = build_multifield_index(corpus, idx, {
        "text": IndexConfig(text_col="text", **base),
        "role": IndexConfig(text_col="role", **base),
    })
    return idx, mans


def test_multifield_builds_share_docid_space(mf_index):
    idx, mans = mf_index
    assert mans["text"]["stats"]["N"] == mans["role"]["stats"]["N"]
    # per-field stats differ (role docs are 1 token long)
    assert mans["role"]["stats"]["avgdl"] == pytest.approx(1.0)
    assert mans["text"]["stats"]["avgdl"] > 10


def test_combined_sum_matches_manual(mf_index):
    from engine.multifield import MultiFieldReader

    idx, _ = mf_index
    r = MultiFieldReader(idx)
    qs = {"text": "running merge", "role": "user"}
    t = r.combined_topk(qs, k=2000, mode="sum")

    # manual recomputation from the single-field readers
    want: dict[int, float] = {}
    for f, q in qs.items():
        docs, sums = r._field_scores(f, q)
        for d, sc in zip(docs.tolist(), sums.tolist()):
            want[d] = want.get(d, 0.0) + sc
    got = dict(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))
    assert len(got) == len([v for v in want.values() if v > 0])
    for d, sc in got.items():
        assert sc == pytest.approx(np.float32(want[d]), rel=0)


def test_combined_dismax_is_per_doc_max(mf_index):
    from engine.multifield import MultiFieldReader

    idx, _ = mf_index
    r = MultiFieldReader(idx)
    qs = {"text": "running merge", "role": "user"}
    t = r.combined_topk(qs, k=2000, mode="dismax")
    per_field = {f: dict(zip(*[a.tolist() for a in r._field_scores(f, q)]))
                 for f, q in qs.items()}
    for d, sc in zip(t["doc_id"].to_pylist(), t["score"].to_pylist()):
        m = max(pf.get(d, 0.0) for pf in per_field.values())
        assert sc == pytest.approx(np.float32(m), rel=0)
    # a single-field query through the combiner equals the field engine
    single = r.combined_topk({"text": "running merge"}, k=10, mode="sum")
    direct = r.reader("text").brute_force_topk("running merge", 10)
    assert single["doc_id"].to_pylist() == direct["doc_id"].to_pylist()
    assert single["score"].to_pylist() == direct["score"].to_pylist()


def test_combined_field_single_field_degenerates_to_bm25(ray_session):
    """BM25F with one field at weight 1 IS single-field BM25 (tf̃=tf,
    dl̃=dlq, avgdl̃=avgdl, df̃=df) — bit-exact against brute force."""
    from engine.registry import _mf_reader

    r = _mf_reader("/root/testdata/sf0.001")
    got = r.combined_field_topk("spark merge", weights={"text": 1.0},
                                k=15)
    want = r.readers["text"].brute_force_topk("spark merge", 15)
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["score"].to_pylist() == want["score"].to_pylist()


def test_field_quantized_lengths_match_posting_norms(ray_session):
    """The re-derived per-field quantized length equals the norm byte
    stored in that field's postings (decoded), for docs that have
    postings to compare against."""
    import numpy as np

    from engine.registry import _mf_reader
    from engine.smallfloat import LENGTH_TABLE

    r = _mf_reader("/root/testdata/sf0.001")
    tr = r.readers["text"]
    subs = tr.lookup(["spark"])["spark"]
    docs, _, norms = tr._clause_arrays("spark", subs)
    got = r.field_quantized_lengths("text", docs)
    assert np.array_equal(got, LENGTH_TABLE[norms])


def test_combined_field_weights_shift_scores(ray_session):
    """Raising the source weight must strictly increase the combined
    tf of source-matched docs relative to text-only docs."""
    from engine.registry import _mf_reader

    r = _mf_reader("/root/testdata/sf0.001")
    lo = r.combined_field_topk("src1", weights={"source": 1.0,
                                                "text": 1.0}, k=5)
    hi = r.combined_field_topk("src1", weights={"source": 4.0,
                                                "text": 1.0}, k=5)
    assert lo.num_rows and hi.num_rows
