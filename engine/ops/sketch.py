"""Mergeable sketches: HyperLogLog distinct-count (partial/final).

The reference exposes approximate distinct counts as the ``hll`` facet
aggregate (SURVEY.md §2.5; upstream ``S/search/facet/HLLAgg.java``
backed by java-hll [U]). Here the sketch is a 2^p-register numpy array
built per batch inside ``map_batches`` and merged associatively with
elementwise max — the canonical partial/final split, so the shuffle
moves only fixed-size registers regardless of cardinality (the entire
point of HLL at 100 TB).

Hashing is deterministic (splitmix64 over the value bits) — no salted
``hash()`` — so retries and repeated runs agree exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class HLL:
    """Fixed-size HyperLogLog registers with numpy add/merge/estimate."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.regs = np.zeros(self.m, dtype=np.uint8)

    def add64(self, hashes: np.ndarray) -> None:
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits, +1
        nz = np.zeros(len(hashes), dtype=np.uint8)
        val = rest
        rank = np.full(len(hashes), 64 - self.p + 1, dtype=np.uint8)
        found = np.zeros(len(hashes), dtype=bool)
        for b in range(64 - self.p):
            hit = (~found) & ((val >> np.uint64(63)) != 0)
            rank[hit] = b + 1
            found |= hit
            val = val << np.uint64(1)
        np.maximum.at(self.regs, idx, rank)

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        s = float(np.sum(2.0 ** (-self.regs.astype(np.float64))))
        e = alpha * m * m / s
        zeros = int(np.count_nonzero(self.regs == 0))
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return e


def hll_group_distinct(ds: ray.data.Dataset, key_col: str, val_col: str,
                       p: int = 12) -> pa.Table:
    """Approximate distinct ``val_col`` per ``key_col`` group.

    Per-batch: one register-array partial per key (emitted as a binary
    cell). Final: grouped elementwise-max merge + estimate. At scale
    the final combine is a groupby over #keys × 4 KiB partials.
    """
    def partial(b: pa.Table) -> pa.Table:
        keys = np.asarray(b[key_col].to_pandas(), dtype=object)
        vals = b[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix64(vals.view(np.uint64))
        out_k, out_r = [], []
        for k in np.unique(keys):
            sk = HLL(p)
            sk.add64(h[keys == k])
            out_k.append(k)
            out_r.append(sk.regs.tobytes())
        return pa.table({key_col: pa.array(out_k, type=pa.string()),
                         "regs": pa.array(out_r, type=pa.binary())})

    def combine(g: pa.Table) -> pa.Table:
        sk = HLL(p)
        for blob in g["regs"].to_pylist():
            o = HLL(p)
            o.regs = np.frombuffer(blob, dtype=np.uint8).copy()
            sk.merge(o)
        return pa.table({
            key_col: g[key_col].slice(0, 1),
            "n_users_approx": pa.array([int(round(sk.estimate()))],
                                       type=pa.int64()),
        })

    t = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key_col).map_groups(combine, batch_format="pyarrow")
    refs = t.to_arrow_refs()
    import ray as _ray
    tabs = [_ray.get(r) for r in refs]
    tabs = [x for x in tabs if x.num_rows]
    out = pa.concat_tables(tabs).combine_chunks() if tabs else tabs
    return out.sort_by(key_col)
