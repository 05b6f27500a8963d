"""Similarity search over an embedding column (``list<float>``).

Brute-force cosine top-k is the exact baseline: the query matrix is
normalized once, broadcast via ``ray.put``, and every batch does one
numpy matmul, emitting per-batch top-k *candidates*; a tiny grouped
final top-k yields the global answer — the partial/final split keeps
the driver out of the hot path (SURVEY.md §2.6 ``knnSearch`` /
``CosineSimilarityEvaluator`` [U]).

The scale path is LSH bucketing: seeded random hyperplanes give every
vector a signature; queries probe their own bucket plus 1-bit flips
(multi-probe), then brute-force only the candidates. Approximate —
recall depends on plane count — so it is registered rows-only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _emb_matrix(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    values = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return values.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_brute(ds: ray.data.Dataset, emb_col: str, id_col: str,
              queries: np.ndarray, k: int = 5) -> pa.Table:
    """Exact cosine top-k for each query row (query_id = row index).

    Returns (query_id, rank, vec_id, cosine) with the Lucene-style
    tie-break (similarity desc, id asc).
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(qn)
    nq = qn.shape[0]

    def candidates(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        m = _normalize(_emb_matrix(batch[emb_col]))
        ids = batch[id_col].to_numpy().astype(np.int64)
        sims = m @ q.T                      # (n, nq)
        kk = min(k, sims.shape[0])
        out_q, out_id, out_s = [], [], []
        for qi in range(nq):
            s = sims[:, qi]
            idx = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) \
                else np.arange(len(s))
            out_q.append(np.full(len(idx), qi, dtype=np.int64))
            out_id.append(ids[idx])
            out_s.append(s[idx])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_id), type=pa.int64()),
            "cosine": pa.array(np.concatenate(out_s), type=pa.float64()),
        })

    def final(g: pa.Table) -> pa.Table:
        s = g["cosine"].to_numpy()
        ids = g["vec_id"].to_numpy()
        order = np.lexsort((ids, -s))[:k]
        return pa.table({
            "query_id": g["query_id"].slice(0, len(order)),
            "rank": pa.array(np.arange(len(order), dtype=np.int32)),
            "vec_id": pa.array(ids[order], type=pa.int64()),
            "cosine": pa.array(s[order], type=pa.float64()),
        })

    res = ds.map_batches(candidates, batch_format="pyarrow") \
        .groupby("query_id").map_groups(final, batch_format="pyarrow") \
        .to_pandas().sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(res, preserve_index=False)


def cosine_pairs(ds: ray.data.Dataset, emb_col: str, id_col: str,
                 threshold: float = 0.5) -> pa.Table:
    """Embedding-cosine near-duplicate pairs: all pairs with cosine ≥
    threshold, id_a < id_b. The comparison side is broadcast once via
    ``ray.put`` and every batch does one matmul against it — exact
    O(n²/batch) at small n; the LSH-bucketed variant (:func:`knn_lsh`
    signatures → per-bucket pairs) is the 100 TB path."""
    full = _to_arrow(ds)
    ids_all = full[id_col].to_numpy().astype(np.int64)
    m_all = _normalize(_emb_matrix(full[emb_col]))
    ref = ray.put((ids_all, m_all))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_a, mat = ray.get(ref)
        ids_b = batch[id_col].to_numpy().astype(np.int64)
        mb = _normalize(_emb_matrix(batch[emb_col]))
        sims = mb @ mat.T
        bi, ai = np.nonzero(sims >= threshold)
        a, b = ids_a[ai], ids_b[bi]
        keep = a < b
        return pa.table({
            "id_a": pa.array(a[keep], type=pa.int64()),
            "id_b": pa.array(b[keep], type=pa.int64()),
        })

    out = _to_arrow(ds.map_batches(pairs, batch_format="pyarrow"))
    return out.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def _to_arrow(ds) -> pa.Table:
    if isinstance(ds, pa.Table):
        return ds
    tabs = [ray.get(r) for r in ds.to_arrow_refs()]
    keep = [t for t in tabs if t.num_rows]
    return pa.concat_tables(keep).combine_chunks() if keep else tabs[0]


def lsh_signatures(m: np.ndarray, n_planes: int = 12, seed: int = 5
                   ) -> np.ndarray:
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((m.shape[1], n_planes))
    bits = (m @ planes) > 0
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    return (bits.astype(np.int64) * weights).sum(axis=1)


def knn_lsh(ds: ray.data.Dataset, emb_col: str, id_col: str,
            queries: np.ndarray, k: int = 5, n_planes: int = 12,
            seed: int = 5) -> pa.Table:
    """Approximate cosine top-k: hyperplane-LSH bucket + 1-bit
    multi-probe, brute force within candidates. Same output schema as
    :func:`knn_brute`; recall < 1 by design (scale path for 100 TB)."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qsig = lsh_signatures(qn, n_planes, seed)
    probe: set[int] = set()
    for s in qsig:
        probe.add(int(s))
        for b in range(n_planes):
            probe.add(int(s) ^ (1 << b))
    probe_arr = pa.array(sorted(probe), type=pa.int64())
    qref = ray.put(qn)
    nq = qn.shape[0]

    def candidates(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = _normalize(_emb_matrix(batch[emb_col]))
        sig = lsh_signatures(m, n_planes, seed)
        keep = pc.is_in(pa.array(sig, type=pa.int64()), value_set=probe_arr)
        keepn = keep.to_numpy(zero_copy_only=False)
        if not keepn.any():
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        m = m[keepn]
        ids = batch[id_col].to_numpy().astype(np.int64)[keepn]
        q = ray.get(qref)
        sims = m @ q.T
        out_q, out_id, out_s = [], [], []
        kk = min(k, sims.shape[0])
        for qi in range(nq):
            s = sims[:, qi]
            idx = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) \
                else np.arange(len(s))
            out_q.append(np.full(len(idx), qi, dtype=np.int64))
            out_id.append(ids[idx])
            out_s.append(s[idx])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_id), type=pa.int64()),
            "cosine": pa.array(np.concatenate(out_s), type=pa.float64()),
        })

    def final(g: pa.Table) -> pa.Table:
        s = g["cosine"].to_numpy()
        ids = g["vec_id"].to_numpy()
        order = np.lexsort((ids, -s))[:k]
        return pa.table({
            "query_id": g["query_id"].slice(0, len(order)),
            "rank": pa.array(np.arange(len(order), dtype=np.int32)),
            "vec_id": pa.array(ids[order], type=pa.int64()),
            "cosine": pa.array(s[order], type=pa.float64()),
        })

    res = ds.map_batches(candidates, batch_format="pyarrow") \
        .groupby("query_id").map_groups(final, batch_format="pyarrow") \
        .to_pandas().sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(res, preserve_index=False)
