"""TermBloom: no false negatives ever, bounded false-positive rate,
and shard-wise OR-merge equals whole-dictionary construction."""
import numpy as np

from engine.bloom import TermBloom, terms_exist


def _vocab(n, seed):
    rng = np.random.default_rng(seed)
    return sorted({f"t{rng.integers(0, 10**9):09d}" for _ in range(n)})


def test_bloom_no_false_negatives_and_fp_bound():
    vocab = _vocab(5000, 1)
    bl = TermBloom(len(vocab))
    bl.add_batch(vocab)
    # every indexed term must probe positive
    assert bl.may_contain(vocab).all()
    # absent probes: ~0.8% expected FP at 10 bits/term, assert < 5%
    absent = [f"x{i:09d}" for i in range(4000)]
    fp = bl.may_contain(absent).mean()
    assert fp < 0.05, fp
    # combined answer is exact
    va = np.array(vocab, dtype=object)
    probes = vocab[:50] + absent[:50]
    got = terms_exist(bl, va, probes)
    assert got[:50].all() and not got[50:].any()


def test_bloom_shard_merge_equals_global():
    vocab = _vocab(2000, 2)
    whole = TermBloom(len(vocab))
    whole.add_batch(vocab)
    merged = TermBloom(len(vocab))
    for i in range(0, len(vocab), 300):   # per-shard build + OR
        part = TermBloom(len(vocab))
        part.add_batch(vocab[i:i + 300])
        merged.merge(part)
    assert np.array_equal(whole.words, merged.words)


def test_bloom_empty_dictionary():
    bl = TermBloom(0)
    got = terms_exist(bl, np.array([], dtype=object), ["a", "b"])
    assert not got.any()
