"""Randomized full-lifecycle property test.

The reference's RandomIndexWriter strategy (SURVEY.md §5) applied to
the WHOLE index lifecycle: a random interleaving of segment appends,
deletes, numeric DocValues updates, tiered merges, codec migrations
and forceMerge must keep the index's observable behavior equal to a
simple driver-side model at every step:

- CheckIndex invariants hold after every mutation.
- The matching-doc set of any term query equals the model's live docs
  containing the term.
- Numeric docvalues resolve to the model's latest-write-wins value.
- Codec migration and tiered merges change NO observable result
  (scores bit-identical before/after).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.build import (IndexConfig, build_index, delete_docs,
                          maybe_merge, optimize_index, update_numeric_docvalue,
                          upgrade_codec)
from engine.check import check_index
from engine.query import IndexReader

WORDS = np.array(["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
                  "eta", "theta", "iota", "kappa"], dtype=object)


def _write_part(path: str, lo: int, hi: int, rng) -> dict[int, str]:
    texts = [" ".join(WORDS[rng.integers(0, len(WORDS), size=8)])
             for _ in range(hi - lo)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
        "text": pa.array(texts),
        "size": pa.array(np.arange(lo, hi, dtype=np.int64) * 10),
    }), path)
    return dict(zip(range(lo, hi), texts))


@pytest.mark.parametrize("seed", [0, 1])
def test_random_lifecycle_interleaving(ray_session, tmp_path_factory,
                                       seed):
    rng = np.random.default_rng(seed)
    root = tmp_path_factory.mktemp(f"life{seed}")
    cfg = IndexConfig(conv_cols=None, doc_id_col="doc_id",
                      stop_words=None, stemming=False, n_buckets=2,
                      hot_df_threshold=10**9)

    # model state
    texts: dict[int, str] = {}          # doc_id -> text (all ever added)
    deleted: set[int] = set()
    dv: dict[int, int] = {}             # doc_id -> latest dv override
    files: list[str] = []

    def add_part(lo: int, hi: int) -> None:
        f = str(root / f"part-{lo}.parquet")
        texts.update(_write_part(f, lo, hi, rng))
        files.append(f)

    idx = str(root / "idx")
    add_part(0, 150)
    build_index(list(files), idx, cfg)

    def live_with(term: str) -> set[int]:
        return {d for d, t in texts.items()
                if d not in deleted and term in t.split()}

    def assert_consistent() -> None:
        check_index(idx)
        r = IndexReader(idx)
        for term in ("alpha", "theta", "kappa"):
            got = set(r.brute_force_topk(term, 10_000)
                      ["doc_id"].to_pylist())
            assert got == live_with(term), term
        # docvalues: latest write wins; untouched docs keep base
        ids = sorted(texts)[:40]
        vals = r.numeric_docvalues("size", np.array(ids))
        for i, d in enumerate(ids):
            want = dv.get(d, d * 10)
            assert vals[i] == want, (d, vals[i], want)

    assert_consistent()
    next_lo = 150
    n_steps = 10
    for step in range(n_steps):
        op = rng.integers(0, 5)
        if op == 0:                      # segment append
            add_part(next_lo, next_lo + int(rng.integers(20, 60)))
            next_lo = max(texts) + 1
            build_index(list(files), idx, cfg, append_mode="segment")
        elif op == 1:                    # delete some live docs
            live = sorted(set(texts) - deleted)
            if len(live) > 10:
                vic = rng.choice(live, size=5, replace=False)
                deleted.update(int(v) for v in vic)
                delete_docs(idx, sorted(int(v) for v in vic))
        elif op == 2:                    # dv update by term
            term = str(WORDS[rng.integers(0, len(WORDS))])
            val = int(rng.integers(1_000, 9_999))
            update_numeric_docvalue(idx, term, "size", val)
            for d in live_with(term):
                dv[d] = val
        elif op == 3:                    # codec migration (flip-flop)
            man_codec = IndexConfig.from_json(
                __import__("engine.manifest", fromlist=["load"])
                .load(idx)["config"]).postings_codec
            upgrade_codec(idx, "for" if man_codec == "vbyte" else "vbyte")
        else:                            # tiered merge
            maybe_merge(idx, max_segments=2)
        assert_consistent()

    # migrations/merges must not have changed scores: fold deletes and
    # compare against a fresh live-only build
    optimize_index(idx, fold_deletes=True)
    assert_consistent()
    live_tab = pa.table({
        "doc_id": pa.array(sorted(set(texts) - deleted), pa.int64()),
        "text": pa.array([texts[d]
                          for d in sorted(set(texts) - deleted)]),
    })
    fresh_src = str(root / "fresh.parquet")
    pq.write_table(live_tab, fresh_src)
    fresh_idx = str(root / "fresh_idx")
    build_index([fresh_src], fresh_idx, cfg)
    a = IndexReader(idx).brute_force_topk("alpha beta", 50)
    b = IndexReader(fresh_idx).brute_force_topk("alpha beta", 50)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()
