"""Property tests: span_near chain DP vs brute tuple enumeration, and
dense vs sparse brute-force top-k paths, on randomized mini-corpora."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

RNG = np.random.default_rng(7)
VOCAB = ["aa", "bb", "cc", "dd", "ee"]


def _mk_index(tmp_path, texts):
    from engine.build import IndexConfig, build_index

    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts)}), src)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=64)
    build_index([src], idx, cfg)
    return idx


def _brute_chain_count(toks, terms, slop):
    pos = {t: [i for i, x in enumerate(toks) if x == t] for t in terms}
    chains = [(p,) for p in pos[terms[0]]]
    for t in terms[1:]:
        chains = [c + (p,) for c in chains for p in pos[t]
                  if 0 < p - c[-1] <= slop + 1]
    return len(chains)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_span_near_matches_brute_enumeration(ray_session, tmp_path,
                                             seed):
    from engine.query import IndexReader

    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(VOCAB, size=rng.integers(3, 40)))
             for _ in range(60)]
    idx = _mk_index(tmp_path, texts)
    r = IndexReader(idx)
    for terms, slop in [(["aa", "bb"], 0), (["aa", "bb", "cc"], 1),
                        (["bb", "bb", "aa"], 2),
                        (["aa", "bb", "cc", "dd"], 3)]:
        res = r.span_near_topk(terms, slop, k=100)
        got = {d: None for d in res["doc_id"].to_pylist()}
        expect = {}
        for d, tx in enumerate(texts):
            n = _brute_chain_count(tx.split(), terms, slop)
            if n:
                expect[d] = n
        assert set(got) == set(expect), (terms, slop)


def test_dense_and_sparse_brute_paths_agree(ray_session, tmp_path):
    from engine.query import IndexReader

    texts = [" ".join(RNG.choice(VOCAB, size=RNG.integers(2, 30)))
             for _ in range(80)]
    idx = _mk_index(tmp_path, texts)
    r = IndexReader(idx)
    for q in ["aa", "aa bb", "aa bb cc dd ee", "ee ee aa"]:
        dense = r.brute_force_topk(q, 20)
        r._DENSE_MAX_N, saved = 0, r._DENSE_MAX_N  # force sparse path
        sparse = r.brute_force_topk(q, 20)
        r._DENSE_MAX_N = saved
        assert dense["doc_id"].to_pylist() == sparse["doc_id"].to_pylist()
        assert dense["score"].to_pylist() == sparse["score"].to_pylist()
        assert dense["total_hits"].to_pylist() == \
            sparse["total_hits"].to_pylist()


@pytest.mark.parametrize("seed", [11, 12, 13, 14])
def test_boolean_topk_property_vs_reference(ray_session, tmp_path_factory,
                                            seed):
    """Randomized BooleanQuery clauses (MUST/SHOULD/MUST_NOT/FILTER,
    random minimumNumberShouldMatch) vs a pure-Python reference over
    the same corpus: candidate sets, msm filtering and f32 score sums
    must agree exactly."""
    from engine.query import IndexReader, idf, norm_cache
    from engine.smallfloat import int_to_byte4, LENGTH_TABLE

    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(VOCAB, size=rng.integers(2, 12)))
             for _ in range(80)]
    idx = _mk_index(tmp_path_factory.mktemp(f"bprop{seed}"), texts)
    r = IndexReader(idx)

    toks = [t.split() for t in texts]
    N = len(texts)
    df = {v: sum(1 for tt in toks if v in tt) for v in VOCAB}
    avgdl = sum(len(tt) for tt in toks) / N
    cache = norm_cache(avgdl)

    def ref_score(d, terms):
        s = np.float64(0.0)
        nb = int_to_byte4(len(toks[d]))
        for t in sorted(set(terms)):
            tf = toks[d].count(t)
            if not tf:
                continue
            w = idf(N, df[t])
            s += np.float64(
                w * np.float32(np.float64(np.float32(tf))
                               / (np.float64(np.float32(tf))
                                  + cache[nb])))
        return np.float32(s)

    for _ in range(8):
        must = list(rng.choice(VOCAB, size=rng.integers(0, 3),
                               replace=False))
        should = list(rng.choice(VOCAB, size=rng.integers(0, 3),
                                 replace=False))
        mnot = list(rng.choice(VOCAB, size=rng.integers(0, 2),
                               replace=False))
        filt = list(rng.choice(VOCAB, size=rng.integers(0, 2),
                               replace=False))
        msm = int(rng.integers(0, len(should) + 1)) if should else 0
        got = r.boolean_topk(must=must, should=should, must_not=mnot,
                             filters=filt, min_should_match=msm,
                             k=10**9)
        # reference candidate set
        cand = []
        for d, tt in enumerate(toks):
            if any(t not in tt for t in must):
                continue
            if any(t not in tt for t in filt):
                continue
            if (not must and not filt
                    and not any(t in tt for t in should)):
                continue
            if any(t in tt for t in mnot):
                continue
            nm = sum(1 for t in set(should) if t in tt)
            if msm >= 1 and nm < msm:
                continue
            cand.append(d)
        scores = {d: ref_score(d, set(must) | set(should))
                  for d in cand}
        want = sorted(cand, key=lambda d: (-scores[d], d))
        assert got["doc_id"].to_pylist() == want, (
            must, should, mnot, filt, msm)
        for d, sc in zip(got["doc_id"].to_pylist(),
                         got["score"].to_pylist()):
            assert np.float32(sc) == scores[d], (d, sc, scores[d])


def _brute_sloppy_num(toks, terms, slop, L):
    """Exact-rational numerator: Σ over ordered tuples with total
    slack ≤ slop of L // (1 + slack)."""
    pos = {t: [i for i, x in enumerate(toks) if x == t] for t in terms}
    chains = [(p,) for p in pos.get(terms[0], [])]
    for t in terms[1:]:
        chains = [c + (p,) for c in chains for p in pos.get(t, [])
                  if p > c[-1]]
    n = len(terms)
    num = 0
    for c in chains:
        w = c[-1] - c[0] - (n - 1)
        if w <= slop:
            num += L // (1 + w)
    return num


@pytest.mark.parametrize("seed", [4, 5])
def test_sloppy_phrase_n_matches_brute_weights(ray_session, tmp_path,
                                               seed):
    """n-term sloppy freq must equal the brute-force Σ 1/(1+slack)
    over ordered tuples, via the exact-rational numerator (docs AND
    relative score ordering)."""
    import math

    from engine.query import IndexReader

    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(VOCAB, size=rng.integers(3, 40)))
             for _ in range(60)]
    idx = _mk_index(tmp_path, texts)
    r = IndexReader(idx)
    for terms, slop in [(["aa", "bb"], 0), (["aa", "bb", "cc"], 2),
                        (["aa", "bb", "cc", "dd"], 4)]:
        L = math.lcm(*range(1, slop + 2))
        res = r.sloppy_phrase_n_topk(terms, slop, k=100)
        got = res["doc_id"].to_pylist()
        expect = {}
        for d, tx in enumerate(texts):
            num = _brute_sloppy_num(tx.split(), terms, slop, L)
            if num:
                expect[d] = num
        assert set(got) == set(expect), (terms, slop)
        # same-norm docs must rank by weighted freq (monotone in num)
        # — check the slop=0 two-term case equals the exact phrase
        if slop == 0:
            exact = r.phrase_topk(" ".join(terms), k=100)
            assert res["doc_id"].to_pylist() == \
                exact["doc_id"].to_pylist()


@pytest.mark.parametrize("seed", [6])
def test_sloppy_unordered_matches_brute(ray_session, tmp_path, seed):
    """Unordered 2-term sloppy: docs and exact-rational numerators
    must equal brute-force Σ 1/(1+|q-p-1|) over ALL pairs ≤ slop."""
    import math

    from engine.query import IndexReader

    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(VOCAB, size=rng.integers(3, 40)))
             for _ in range(60)]
    idx = _mk_index(tmp_path, texts)
    r = IndexReader(idx)
    for slop in (0, 1, 3):
        L = math.lcm(*range(1, slop + 2))
        res = r.sloppy_phrase_unordered_topk("aa", "bb", slop, k=100)
        got = set(res["doc_id"].to_pylist())
        expect = set()
        for d, tx in enumerate(texts):
            toks = tx.split()
            num = 0
            for p, a in enumerate(toks):
                if a != "aa":
                    continue
                for q, b in enumerate(toks):
                    if b == "bb" and abs(q - p - 1) <= slop:
                        num += L // (1 + abs(q - p - 1))
            if num:
                expect.add(d)
        assert got == expect, slop
