"""FOR bitpacked postings codec (upstream ``Lucene50PostingsFormat``/
``ForUtil`` packed-ints blocks [U]): roundtrip properties, bit-exact
equivalence with the VByte codec, and the full index lifecycle
(build → delete → fold → append) under ``postings_codec="for"``."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.codec import (BLOCK_SIZE, decode_all, decode_block,
                          encode_postings, encode_postings_multi,
                          for_decode_block, for_decode_stream,
                          for_encode_stream)


def _tile(n: int) -> tuple[np.ndarray, np.ndarray]:
    nblk = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    bs = np.arange(nblk) * BLOCK_SIZE
    return bs, np.minimum(bs + BLOCK_SIZE, n)


def test_for_stream_roundtrip_property():
    rng = np.random.default_rng(7)
    for trial in range(80):
        n = int(rng.integers(1, 700))
        wbits = int(rng.integers(1, 64))
        v = rng.integers(0, min(1 << wbits, (1 << 63) - 1), size=n,
                         dtype=np.int64)
        if trial % 9 == 0:
            v[:] = min((1 << wbits) - 1, (1 << 63) - 2)  # max-width
        if trial % 11 == 0:
            v[:] = 0                                     # all-zero
        bs, be = _tile(n)
        blob, offs = for_encode_stream(v, bs, be)
        assert (for_decode_stream(blob, n, offs) == v).all()
        for b in range(len(bs)):
            got = for_decode_block(blob, int(offs[b]), int(be[b] - bs[b]))
            assert (got == v[bs[b]:be[b]]).all()


def test_for_partial_tail_is_vbyte():
    # a lone partial block must be byte-identical to plain VByte
    from engine.codec import vbyte_encode

    v = np.array([5, 1000, 0, 77], dtype=np.int64)
    blob, offs = for_encode_stream(v, np.array([0]), np.array([4]))
    assert blob == vbyte_encode(v)


def test_encode_postings_codec_equivalence():
    rng = np.random.default_rng(13)
    for _ in range(25):
        df = int(rng.integers(1, 900))
        docs = np.cumsum(rng.integers(1, 5000, size=df)).astype(np.int64)
        tfs = rng.integers(1, 9, size=df).astype(np.int64)
        norms = rng.integers(0, 255, size=df).astype(np.uint8)
        pos = np.concatenate(
            [np.sort(rng.choice(4000, size=t, replace=False))
             for t in tfs]).astype(np.int64)
        a = encode_postings(docs, tfs, norms, pos, codec="vbyte")
        b = encode_postings(docs, tfs, norms, pos, codec="for")
        for x, y in zip(decode_all(a), decode_all(b)):
            assert (np.asarray(x) == np.asarray(y)).all()
        assert (a.blk_last_doc == b.blk_last_doc).all()
        assert (a.blk_max_tf == b.blk_max_tf).all()
        assert (a.blk_min_norm == b.blk_min_norm).all()
        assert a.poss == b.poss          # positions stay VByte
        for blk in range(len(a.blk_last_doc)):
            xa = decode_block(a.docs, a.tfs, a.blk_doc_off, a.blk_tf_off,
                              a.blk_last_doc, blk, df, "vbyte")
            xb = decode_block(b.docs, b.tfs, b.blk_doc_off, b.blk_tf_off,
                              b.blk_last_doc, blk, df, "for")
            assert (xa[0] == xb[0]).all() and (xa[1] == xb[1]).all()


def test_encode_postings_multi_codec_equivalence():
    rng = np.random.default_rng(29)
    ng = 30
    gdf = rng.integers(1, 300, size=ng)
    offs = np.concatenate(([0], np.cumsum(gdf))).astype(np.int64)
    docs = np.concatenate(
        [np.cumsum(rng.integers(1, 50, size=d)) for d in gdf]
    ).astype(np.int64)
    n = int(offs[-1])
    tfs = rng.integers(1, 6, size=n).astype(np.int64)
    norms = rng.integers(0, 255, size=n).astype(np.uint8)
    A = encode_postings_multi(offs, docs, tfs, norms, codec="vbyte")
    B = encode_postings_multi(offs, docs, tfs, norms, codec="for")
    assert (A.df == B.df).all()
    assert (A.blk_last_doc == B.blk_last_doc).all()
    for g in range(ng):
        df = int(A.df[g])
        s, e = B.blk_offs[g], B.blk_offs[g + 1]
        da = decode_all({"df": df,
                         "docs": A.docs[A.docs_offs[g]:A.docs_offs[g + 1]],
                         "tfs": A.tfs[A.tfs_offs[g]:A.tfs_offs[g + 1]],
                         "norms": A.norms[A.norms_offs[g]:
                                          A.norms_offs[g + 1]]})
        db = decode_all({"df": df, "codec": "for",
                         "docs": B.docs[B.docs_offs[g]:B.docs_offs[g + 1]],
                         "tfs": B.tfs[B.tfs_offs[g]:B.tfs_offs[g + 1]],
                         "norms": B.norms[B.norms_offs[g]:
                                          B.norms_offs[g + 1]],
                         "blk_doc_off": B.blk_doc_off[s:e],
                         "blk_tf_off": B.blk_tf_off[s:e]})
        for x, y in zip(da, db):
            assert (np.asarray(x) == np.asarray(y)).all()


def test_for_is_smaller_on_dense_postings():
    rng = np.random.default_rng(31)
    df = 50_000
    docs = np.cumsum(rng.integers(1, 3000, size=df)).astype(np.int64)
    tfs = rng.integers(1, 6, size=df).astype(np.int64)
    norms = rng.integers(0, 255, size=df).astype(np.uint8)
    a = encode_postings(docs, tfs, norms, codec="vbyte")
    b = encode_postings(docs, tfs, norms, codec="for")
    assert len(b.docs) + len(b.tfs) < 0.8 * (len(a.docs) + len(a.tfs))


@pytest.fixture(scope="module")
def _corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("forcodec")
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(400)] + ["hot", "warm"]
    f1 = str(tmp / "a.parquet")
    f2 = str(tmp / "b.parquet")
    for path, lo, hi in ((f1, 0, 1200), (f2, 1200, 1700)):
        texts = [" ".join(rng.choice(vocab,
                                     size=int(rng.integers(3, 30))))
                 for _ in range(hi - lo)]
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(texts)}), path)
    return str(tmp), f1, f2


def _cfg(codec: str, **kw):
    from engine.build import IndexConfig

    return IndexConfig(text_col="text", conv_cols=None,
                       doc_id_col="doc_id", stop_words=None,
                       stemming=False, n_buckets=3,
                       hot_df_threshold=300, n_salts=4,
                       batch_size=256, postings_codec=codec, **kw)


def test_for_index_end_to_end(ray_session, _corpus):
    from engine.build import build_index, optimize_index
    from engine.check import check_index, dump_postings
    from engine.query import IndexReader

    tmp, f1, _ = _corpus
    iv, ifor = os.path.join(tmp, "iv"), os.path.join(tmp, "ifor")
    build_index([f1], iv, _cfg("vbyte"))
    build_index([f1], ifor, _cfg("for"))
    check_index(ifor)
    dv, df_ = dump_postings(iv), dump_postings(ifor)
    assert dv.keys() == df_.keys()
    for t in dv:
        for a, b in zip(dv[t], df_[t]):
            assert (np.asarray(a) == np.asarray(b)).all()
    rv = IndexReader(iv, preload=True)
    rf = IndexReader(ifor, preload=True)
    for q in ["hot warm", "w1 w2 w3", "hot w5", "nosuch"]:
        for strat in ("brute", "bmw"):
            assert rv.topk(q, 20, strategy=strat).equals(
                rf.topk(q, 20, strategy=strat)), (q, strat)
    assert rv.phrase_topk("hot warm", 10).equals(
        rf.phrase_topk("hot warm", 10))
    assert rv.fuzzy_topk("hot", 10).equals(rf.fuzzy_topk("hot", 10))
    # lazy reader path + optimize generation swap
    assert IndexReader(ifor, preload=False).topk("hot warm", 20).equals(
        rv.topk("hot warm", 20))
    optimize_index(ifor)
    check_index(ifor)
    assert IndexReader(ifor, preload=True).topk("hot warm", 20).equals(
        rv.topk("hot warm", 20))


def test_for_index_delete_fold_append(ray_session, _corpus):
    from engine.build import build_index, delete_docs, optimize_index
    from engine.check import check_index
    from engine.query import IndexReader

    tmp, f1, f2 = _corpus
    results = {}
    for codec in ("vbyte", "for"):
        idx = os.path.join(tmp, "life_" + codec)
        cfg = _cfg(codec, )
        build_index([f1], idx, cfg)
        delete_docs(idx, np.arange(0, 120, dtype=np.int64))
        r = IndexReader(idx, preload=True)
        t = r.topk("w1 w2", 3000)
        assert all(d >= 120 for d in t["doc_id"].to_pylist())
        optimize_index(idx, fold_deletes=True)
        check_index(idx)
        build_index([f1, f2], idx, cfg)     # incremental append
        check_index(idx)
        results[codec] = IndexReader(idx, preload=True).topk(
            "w1 w2", 5000)
    assert results["vbyte"].equals(results["for"])
