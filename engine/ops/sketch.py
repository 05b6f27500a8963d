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
        # harmonic sum via an EXACT integer numerator (Σ 2^(R-reg),
        # R = max register value), cast to double once — replayable
        # in SQL without float-summation-order sensitivity (r5; the
        # same trick as the md5 entry's Σ 2^(57-rho))
        r_max = 64 - self.p + 1
        s_num = sum(1 << (r_max - int(r)) for r in self.regs)
        s = float(s_num) / float(1 << r_max)
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
        # floor(x + 0.5), not round(): banker's rounding differs from
        # SQL ROUND semantics — shared convention with the md5 entry
        return pa.table({
            key_col: g[key_col].slice(0, 1),
            "n_users_approx": pa.array(
                [int(np.floor(sk.estimate() + 0.5))], type=pa.int64()),
        })

    # materialize before taking refs — to_arrow_refs() on a lazy
    # plan re-executes it for a limit-1 schema probe (Ray 2.49)
    t = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key_col).map_groups(combine, batch_format="pyarrow") \
        .materialize()
    refs = t.to_arrow_refs()
    import ray as _ray
    tabs = [_ray.get(r) for r in refs]
    tabs = [x for x in tabs if x.num_rows]
    out = pa.concat_tables(tabs).combine_chunks() if tabs else tabs
    return out.sort_by(key_col)


class TDigest:
    """Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing
    extremely accurate quantiles using t-digests", 2019 — the sketch
    behind Solr's ``percentile`` agg, upstream ``PercentileAgg`` backed
    by t-digest [U]). Merging-digest variant: centroids are (mean,
    weight) pairs kept sorted; compression sweeps once, greedily
    growing each output centroid while the k1 scale function allows —
    vectorized numpy, fully deterministic for a given insertion order.
    The shuffle moves only O(delta) centroids per group regardless of
    row count — the point of the sketch at 100 TB."""

    def __init__(self, delta: int = 100):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.int64)

    def add(self, values: np.ndarray) -> "TDigest":
        v = np.sort(np.asarray(values, dtype=np.float64))
        u, cnt = np.unique(v, return_counts=True)
        self.means = np.concatenate([self.means, u])
        self.weights = np.concatenate([self.weights, cnt])
        self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _compress(self) -> None:
        if len(self.means) <= self.delta:
            order = np.argsort(self.means, kind="stable")
            self.means, self.weights = \
                self.means[order], self.weights[order]
            return
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order].astype(np.float64)
        total = w.sum()
        # k1 scale: centroid may absorb while its q-span stays within
        # one k-unit of delta
        out_m: list[float] = []
        out_w: list[float] = []
        q0 = 0.0
        acc_w = w[0]
        acc_mw = m[0] * w[0]
        lim = self._q_limit(q0, total)
        for i in range(1, len(m)):
            if q0 + (acc_w + w[i]) / total <= lim:
                acc_w += w[i]
                acc_mw += m[i] * w[i]
            else:
                out_m.append(acc_mw / acc_w)
                out_w.append(acc_w)
                q0 += acc_w / total
                acc_w, acc_mw = w[i], m[i] * w[i]
                lim = self._q_limit(q0, total)
        out_m.append(acc_mw / acc_w)
        out_w.append(acc_w)
        self.means = np.asarray(out_m, dtype=np.float64)
        # weights are sums of int64 counts: integer-valued by
        # construction, round only to undo float representation
        self.weights = np.round(np.asarray(out_w)).astype(np.int64)

    def _q_limit(self, q0: float, total: float) -> float:
        k0 = self._k(q0)
        return self._q_inv(k0 + 1.0)

    def _k(self, q: float) -> float:
        return (self.delta / (2 * np.pi)) * np.arcsin(2 * q - 1)

    def _q_inv(self, k: float) -> float:
        return (np.sin(k * 2 * np.pi / self.delta) + 1) / 2

    def quantile(self, q: float) -> float:
        if not len(self.means):
            return float("nan")
        w = self.weights.astype(np.float64)
        total = w.sum()
        cum = np.cumsum(w) - w / 2.0
        target = q * total
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = int(np.searchsorted(cum, target)) - 1
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1]
                                             - self.means[i]))


def tdigest_group_quantile(ds: ray.data.Dataset, key_col: str,
                           val_col: str, q: float,
                           delta: int = 100) -> pa.Table:
    """Per-group approximate quantile via partial t-digests: per-batch
    digests (serialized as centroid lists) → per-group merge →
    quantile. Only O(delta) centroids per (batch, group) shuffle."""
    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({"k": b[key_col].to_pandas(),
                           "v": b[val_col].to_numpy()})
        ks, ms, ws = [], [], []
        for k, sub in df.groupby("k", sort=False):
            d = TDigest(delta).add(sub["v"].to_numpy())
            ks.append(k)
            ms.append(d.means.tolist())
            ws.append(d.weights.tolist())
        return pa.table({
            key_col: pa.array(ks),
            "means": pa.array(ms, type=pa.list_(pa.float64())),
            "weights": pa.array(ws, type=pa.list_(pa.int64()))})

    def final(g: pa.Table) -> pa.Table:
        d = TDigest(delta)
        for ms, ws in zip(g["means"].to_pylist(),
                          g["weights"].to_pylist()):
            o = TDigest(delta)
            o.means = np.asarray(ms, dtype=np.float64)
            o.weights = np.asarray(ws, dtype=np.int64)
            d.merge(o)
        return pa.table({
            key_col: g[key_col].slice(0, 1),
            "quantile": pa.array([d.quantile(q)], type=pa.float64()),
            "n_centroids": pa.array([len(d.means)], type=pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key_col).map_groups(final, batch_format="pyarrow")


class MisraGries:
    """Misra–Gries heavy-hitters summary (Misra & Gries 1982;
    mergeable form per Agarwal et al., "Mergeable Summaries", PODS
    2012). Upstream analog: the reference surfaces heavy terms via
    ``significantTerms`` over exact counts; the sketch form is what a
    100 TB stream needs — ``capacity`` counters per summary,
    guarantee ``true - err <= lo <= true`` with
    ``err <= N / (capacity + 1)`` overall.

    ``lo`` is the per-term lower bound; ``err`` is the summary-wide
    slack accumulated by prunes (0 while the counter set never
    overflows, i.e. counts are EXACT whenever distinct keys fit)."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.lo: dict[str, int] = {}
        self.err = 0

    def _prune(self) -> None:
        if len(self.lo) <= self.capacity:
            return
        vals = np.sort(np.fromiter(self.lo.values(), dtype=np.int64))
        d = int(vals[-(self.capacity + 1)])   # (cap+1)-th largest
        self.lo = {t: c - d for t, c in self.lo.items() if c > d}
        self.err += d

    def add_counts(self, terms, counts) -> "MisraGries":
        for t, c in zip(terms, counts):
            self.lo[t] = self.lo.get(t, 0) + int(c)
        self._prune()
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        for t, c in other.lo.items():
            self.lo[t] = self.lo.get(t, 0) + c
        self.err += other.err
        self._prune()
        return self

    def top(self, k: int) -> list[tuple[str, int]]:
        return sorted(self.lo.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:k]


def heavy_hitter_terms(ds: ray.data.Dataset, text_col: str,
                       capacity: int, k: int) -> tuple[pa.Table, int]:
    """Distributed heavy hitters over the token stream: per batch,
    EXACT local counts collapse to one ≤``capacity``-row Misra–Gries
    partial (the only thing that leaves the worker), the driver folds
    the tiny partials — O(batches × capacity), corpus never moves.
    Returns (top-k table, err): when ``err == 0`` every reported
    count is exact (capacity never overflowed), otherwise each true
    count lies in ``[lo, lo + err]``."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(b[text_col]), "[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"t": flat}).group_by("t") \
            .aggregate([([], "count_all")])
        mg = MisraGries(capacity).add_counts(
            g["t"].to_pylist(),
            g["count_all"].to_numpy(zero_copy_only=False))
        terms = sorted(mg.lo)
        # a null sentinel row carries err even when pruning emptied
        # the counter set — dropping it would falsely claim exactness
        t_col = terms if terms else [None]
        lo_col = [mg.lo[t] for t in terms] if terms else [0]
        return pa.table({
            "term": pa.array(t_col, type=pa.string()),
            "lo": pa.array(lo_col, type=pa.int64()),
            "err": pa.array([mg.err] + [0] * (len(t_col) - 1),
                            type=pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .materialize().to_arrow_refs()
    acc = MisraGries(capacity)
    for ref in parts:
        t = ray.get(ref)
        o = MisraGries(capacity)
        o.lo = {k: int(v) for k, v in
                zip(t["term"].to_pylist(), t["lo"].to_pylist())
                if k is not None}
        o.err = int(pa.compute.sum(t["err"]).as_py() or 0) \
            if t.num_rows else 0
        acc.merge(o)
    top = acc.top(k)
    return pa.table({
        "term": pa.array([t for t, _ in top], type=pa.string()),
        "count": pa.array([c for _, c in top], type=pa.int64())}), \
        acc.err
