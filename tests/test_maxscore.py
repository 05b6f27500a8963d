"""MAXSCORE dynamic pruning: rank/score identity with the brute oracle
and with BMW, including deletes and the non-essential probe path."""

from __future__ import annotations

import random

import numpy as np
import pytest

from engine.query import IndexReader


@pytest.fixture(scope="module")
def reader(smoke_index):
    idx, _, _ = smoke_index
    # lazy (no preload): probe_scores must take the block-decode path
    return IndexReader(idx)


def _terms(reader):
    vocab = reader.vocabulary()
    rng = random.Random(17)
    dfs = reader._df_of(vocab)
    by_df = sorted(vocab, key=lambda t: (dfs.get(t, 0), t))
    hot = by_df[-8:]          # highest-df terms (low ub -> non-essential)
    rare = by_df[: len(by_df) // 4]
    return vocab, hot, rare, rng


def test_maxscore_equals_brute_random_queries(reader):
    vocab, hot, rare, rng = _terms(reader)
    for trial in range(25):
        n_terms = rng.randint(1, 5)
        pool = (hot if trial % 3 == 0 else
                rare if trial % 3 == 1 else vocab)
        pool = pool or vocab
        q = " ".join(rng.choice(pool) for _ in range(n_terms))
        k = rng.choice([1, 3, 10])
        brute = reader.brute_force_topk(q, k)
        ms = reader.maxscore_topk(q, k)
        assert brute["doc_id"].to_pylist() == ms["doc_id"].to_pylist(), q
        assert brute["score"].to_pylist() == ms["score"].to_pylist(), q


def test_maxscore_equals_bmw_mixed_hot_rare(reader):
    vocab, hot, rare, rng = _terms(reader)
    if not hot or not rare:
        pytest.skip("corpus lacks hot/rare split")
    # hot + rare mixes maximize the essential/non-essential split
    for _ in range(10):
        q = " ".join([rng.choice(hot), rng.choice(rare),
                      rng.choice(hot), rng.choice(vocab)])
        bmw = reader.bmw_topk(q, 10)
        ms = reader.maxscore_topk(q, 10)
        assert bmw["doc_id"].to_pylist() == ms["doc_id"].to_pylist(), q
        assert bmw["score"].to_pylist() == ms["score"].to_pylist(), q


def test_maxscore_with_deletes(smoke_index, tmp_path_factory):
    import shutil

    from engine.build import delete_docs

    idx, man, n = smoke_index
    work = str(tmp_path_factory.mktemp("msdel") / "idx")
    shutil.copytree(idx, work)
    rng = np.random.default_rng(5)
    delete_docs(work, rng.choice(n, size=max(1, n // 20),
                                 replace=False).tolist())
    r = IndexReader(work)
    vocab = r.vocabulary()
    for q in [" ".join(vocab[i::37][:3]) for i in range(5)]:
        brute = r.brute_force_topk(q, 10)
        ms = r.maxscore_topk(q, 10)
        assert brute["doc_id"].to_pylist() == ms["doc_id"].to_pylist()
        assert brute["score"].to_pylist() == ms["score"].to_pylist()


def test_maxscore_strategy_dispatch(reader):
    t = reader.topk("the merge", 5, strategy="maxscore")
    b = reader.topk("the merge", 5, strategy="brute")
    assert t["doc_id"].to_pylist() == b["doc_id"].to_pylist()
