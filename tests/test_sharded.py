"""Distributed (sharded) search with global IDF must be bit-identical
to the single-index search — Solr's distributed-IDF contract."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_sharded_equals_single(ray_session, tmp_path):
    from engine.build import IndexConfig, build_index
    from engine.query import IndexReader
    from engine.sharded import DistributedSearcher

    rng = np.random.default_rng(9)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
             for _ in range(300)]
    files = []
    for si in range(3):
        f = str(tmp_path / f"p{si}.parquet")
        lo, hi = si * 100, (si + 1) * 100
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": pa.array(texts[lo:hi])}), f)
        files.append(f)
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2, hot_df_threshold=40,
                      n_salts=2, batch_size=64)
    single = str(tmp_path / "single")
    build_index(files, single, cfg)
    shards = []
    for si, f in enumerate(files):
        sd = str(tmp_path / f"shard{si}")
        build_index([f], sd, cfg)
        shards.append(sd)
    ds = DistributedSearcher(shards)
    r = IndexReader(single)
    try:
        for q in ["aa", "aa bb", "aa bb cc dd", "gg ff", "zz"]:
            a, b = r.topk(q, 25), ds.topk(q, 25)
            assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
            assert a["score"].to_pylist() == b["score"].to_pylist(), q
            if a.num_rows:
                assert a["total_hits"][0].as_py() == \
                    b["total_hits"][0].as_py(), q
    finally:
        ds.shutdown()
