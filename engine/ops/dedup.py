"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference's dedup surface is ``SignatureUpdateProcessorFactory``
(exact MD5 / fuzzy TextProfileSignature) plus the MinHash token filter
(SURVEY.md §2.8; upstream ``S/update/processor/Signature...`` and
``lucene/analysis/common/.../minhash/MinHashFilter.java`` [U]). Here
each variant is a Ray Data pipeline:

- exact: hash-partition on the key, keep min(id) per group — one small
  grouped aggregate, no data rewrite.
- MinHash+LSH: shingle → 64-perm minhash → banded bucket keys →
  ``groupby(band)`` emits candidate pairs → exact-Jaccard verify on the
  candidates only (candidate set is tiny relative to the corpus; at
  100 TB the verify fetch is a doc_id join instead of a broadcast).
- SimHash: 64-bit weighted-token signature, banded into
  (hamming_threshold+1) chunks (pigeonhole: any pair within the
  threshold shares ≥1 exact chunk), verify hamming distance.
- n-gram Jaccard: exact pairwise similarity via a shingle-key shuffle
  (groupby(shingle) → pair partials → grouped sum) — the fully exact,
  SQL-checkable baseline the probabilistic variants approximate.

All hashing is seeded/deterministic (crc32 universal hashing for
minhash permutations; md5-derived 64-bit token hashes for SimHash,
chosen because DuckDB can compute the identical value, giving SimHash
an exact SQL oracle) — no process-salted ``hash()`` anywhere, so
retries and the DuckDB oracle agree.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from engine.ops.textstats import _flat_tokens

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _universal_hash(a: np.ndarray, b: np.ndarray,
                    h: np.ndarray) -> np.ndarray:
    """``(a*h + b) mod (2^61 - 1)`` with NO uint64 overflow.

    a, b broadcast against h; a, b < p = 2^61-1, h < 2^32 (crc32).
    The naive ``a * h`` wraps mod 2^64 before the Mersenne mod (a*h is
    up to ~2^93), which silently replaces the universal family with an
    arbitrary mapping — LSH collision probability then no longer
    equals Jaccard similarity. Split a into 32-bit halves and fold the
    ·2^32 factor using 2^61 ≡ 1 (mod p):

        a·h = (a_hi·2^32 + a_lo)·h
            ≡ fold(a_hi·h mod p) + a_lo·h   (mod p)

    where fold(t) = t_hi + t_lo·2^32 for t = t_hi·2^29 + t_lo (since
    t·2^32 = t_hi·2^61 + t_lo·2^32 ≡ t_hi + t_lo·2^32). Every
    intermediate is < 2^64: a_lo·h < 2^64, a_hi·h < 2^61,
    t_lo·2^32 < 2^61, and the final sum of three residues < 3·2^61.
    """
    p = np.uint64(_MERSENNE)
    h = h.astype(np.uint64, copy=False)
    a_lo = a & np.uint64(0xFFFFFFFF)
    a_hi = a >> np.uint64(32)                       # < 2^29
    lo = (a_lo * h) % p                             # < 2^64: exact
    t = (a_hi * h) % p                              # < 2^61: exact
    t_lo = t & np.uint64((1 << 29) - 1)
    t_hi = t >> np.uint64(29)
    t32 = ((t_lo << np.uint64(32)) + t_hi) % p      # t·2^32 mod p
    return (lo + t32 + b) % p


def _shingle_strings(texts, k: int) -> tuple[np.ndarray, list[np.ndarray]]:
    """per-doc DISTINCT word-k-gram strings; returns (counts, list)."""
    offs, flat = _flat_tokens(texts)
    toks = np.asarray(flat.to_pandas(), dtype=object)
    out: list[np.ndarray] = []
    counts = np.zeros(len(offs) - 1, dtype=np.int64)
    for i in range(len(offs) - 1):
        t = toks[offs[i]:offs[i + 1]]
        if len(t) < k:
            # <k tokens: no shingles (matches the SQL oracle's range())
            sh = np.empty(0, dtype=object)
        else:
            sh = np.array([" ".join(t[j:j + k]) for j in range(len(t) - k + 1)],
                          dtype=object)
        sh = np.unique(sh)
        counts[i] = len(sh)
        out.append(sh)
    return counts, out


def _crc_hashes(strings: np.ndarray) -> np.ndarray:
    crc = zlib.crc32
    return np.fromiter((crc(s.encode("utf-8")) for s in strings),
                       dtype=np.uint64, count=len(strings))


def _hash64(strings: np.ndarray) -> np.ndarray:
    """64-bit per-string hash: two salted crc32 halves. Used for exact
    set intersection counting (collision odds ~ n²/2^64)."""
    crc = zlib.crc32
    def h(s: str) -> int:
        b = s.encode("utf-8")
        return (crc(b) << 32) | crc(b + b"#")
    return np.fromiter((h(s) for s in strings),
                       dtype=np.uint64, count=len(strings))


def exact_dedup(ds: ray.data.Dataset, key_col: str, id_col: str
                ) -> ray.data.Dataset:
    """Exact dedup: first (min id) survivor per identical key."""
    return ds.groupby(key_col).min(id_col)


_PAIRS_EMPTY = pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64())})


def _pairs_in_buckets(keys: np.ndarray, docs: np.ndarray,
                      max_bucket: int, label: str) -> pa.Table:
    """All unordered doc pairs sharing a key, fully vectorized.

    Replaces the one-Python-call-per-key ``groupby(key).map_groups``
    shape (≈2-4 ms of Ray overhead per group — seconds once the key
    space hits 10^5): buckets are delimited by ONE lexsort, and pairs
    for all buckets of equal size c are emitted by a single
    (n_buckets, c) gather + shared ``triu_indices``. Returns
    (id_a, id_b, n) with id_a < id_b, n = number of keys (in this
    array) under which the pair co-occurs; oversized buckets are
    dropped with a warning (the documented LSH degenerate-bucket cap).
    """
    if len(keys) == 0:
        return _PAIRS_EMPTY
    order = np.lexsort((docs, keys))
    ks, dv = keys[order], docs[order]
    new = np.empty(len(ks), dtype=bool)
    new[0] = True
    new[1:] = ks[1:] != ks[:-1]
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(ks)))
    ia_parts: list[np.ndarray] = []
    ib_parts: list[np.ndarray] = []
    dropped = 0
    for c in np.unique(counts):
        if c < 2:
            continue
        gs = starts[counts == c]
        if c > max_bucket:
            dropped += len(gs)
            continue
        m = dv[gs[:, None] + np.arange(c)[None, :]]
        iu, ju = np.triu_indices(int(c), 1)
        ia_parts.append(m[:, iu].ravel())
        ib_parts.append(m[:, ju].ravel())
    if dropped:
        import logging
        logging.getLogger(__name__).warning(
            "%s: dropped %d degenerate buckets larger than max_bucket=%d",
            label, dropped, max_bucket)
    if not ia_parts:
        return _PAIRS_EMPTY
    ia = np.concatenate(ia_parts)
    ib = np.concatenate(ib_parts)
    ok = ia != ib
    a = np.minimum(ia[ok], ib[ok])
    b = np.maximum(ia[ok], ib[ok])
    o2 = np.lexsort((b, a))
    a, b = a[o2], b[o2]
    nb = np.empty(len(a), dtype=bool)
    if len(a):
        nb[0] = True
        nb[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    st = np.flatnonzero(nb)
    cnt = np.diff(np.append(st, len(a)))
    return pa.table({"id_a": pa.array(a[st], type=pa.int64()),
                     "id_b": pa.array(b[st], type=pa.int64()),
                     "n": pa.array(cnt, type=pa.int64())})


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def minhash_lsh_pairs(ds: ray.data.Dataset, text_col: str, id_col: str,
                      k: int = 3, num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.8,
                      max_bucket: int = 4096) -> pa.Table:
    """Near-dup pairs via MinHash + banded LSH, exact-verified.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold,
    sorted. Bands of ``num_perm/bands`` rows: a pair colliding in ≥1
    band becomes a candidate; candidates are verified with the exact
    shingle Jaccard (so the output has no false positives; recall is
    the standard LSH S-curve).
    """
    assert num_perm % bands == 0
    rows = num_perm // bands
    a_p, b_p = _perm_params(num_perm)

    def sigs(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        _, shingles = _shingle_strings(batch[text_col], k)
        band_keys: list[int] = []
        band_ids: list[int] = []
        for did, sh in zip(ids, shingles):
            if not len(sh):
                continue
            h = _crc_hashes(sh)
            # universal hashing into num_perm permutations, min per perm
            # (overflow-safe modmul: the naive product wraps mod 2^64
            # and voids the universality guarantee)
            vals = _universal_hash(a_p[:, None], b_p[:, None], h[None, :])
            mh = vals.min(axis=1)
            for bi in range(bands):
                chunk = mh[bi * rows:(bi + 1) * rows]
                band_keys.append(
                    (bi << 32) | zlib.crc32(chunk.tobytes()))
                band_ids.append(int(did))
        karr = np.asarray(band_keys, dtype=np.int64)
        return pa.table({
            "band": pa.array(karr, type=pa.int64()),
            "cg": pa.array(karr & 0xFF, type=pa.int64()),
            "doc": pa.array(band_ids, type=pa.int64()),
        })

    buckets = ds.map_batches(sigs, batch_format="pyarrow")

    def coarse_pairs(g: pa.Table) -> pa.Table:
        # one call per COARSE group (256 total), all band buckets
        # inside it paired by one vectorized pass
        return _pairs_in_buckets(g["band"].to_numpy(), g["doc"].to_numpy(),
                                 max_bucket, "minhash_lsh_pairs")

    # no global candidate-dedup shuffle: a pair seen in several coarse
    # groups is verified more than once (cheap) and survivors are
    # deduped at the end — the output (pairs over threshold) is orders
    # of magnitude smaller than the candidate multiset
    cand = buckets.groupby("cg").map_groups(
        coarse_pairs, batch_format="pyarrow").materialize().to_pandas()
    if not len(cand):
        return pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})

    # exact verification on the candidate doc set only: each candidate
    # doc's DISTINCT shingles become a sorted uint64 hash array (crc32
    # pair → 64-bit; cross-doc collision odds ~ |A||B|/2^64, far below
    # the f64 jaccard ulp), built distributed, broadcast ONCE
    need = np.unique(np.concatenate([cand["id_a"].to_numpy(),
                                     cand["id_b"].to_numpy()]))
    need_arr = pa.array(need, type=pa.int64())

    def hash_sets(b: pa.Table) -> pa.Table:
        sub = b.filter(pc.is_in(b[id_col], value_set=need_arr))
        ids = sub[id_col].to_numpy()
        _, sh = _shingle_strings(sub[text_col], k)
        hv = [np.sort(_hash64(x)) for x in sh]
        return pa.table({
            "doc": pa.array(ids, type=pa.int64()),
            "h": pa.array(hv, type=pa.list_(pa.uint64())),
        })

    sub = ds.map_batches(hash_sets, batch_format="pyarrow") \
        .materialize().to_arrow_refs()
    sub_t = pa.concat_tables([ray.get(r) for r in sub]).combine_chunks()
    hcol = sub_t["h"].combine_chunks()
    flat = hcol.values.to_numpy()
    offs = hcol.offsets.to_numpy()
    by_id = {int(i): flat[offs[j]:offs[j + 1]]
             for j, i in enumerate(sub_t["doc"].to_numpy())}
    by_id_ref = ray.put(by_id)
    pairs_ds = ray.data.from_arrow(pa.table({
        "id_a": pa.array(cand["id_a"].to_numpy(), type=pa.int64()),
        "id_b": pa.array(cand["id_b"].to_numpy(), type=pa.int64()),
    }))

    def verify(b: pa.Table) -> pa.Table:
        m = ray.get(by_id_ref)
        ias = b["id_a"].to_numpy()
        ibs = b["id_b"].to_numpy()
        js = np.empty(len(ias), dtype=np.float64)
        for i in range(len(ias)):
            a, bb = m[int(ias[i])], m[int(ibs[i])]
            if len(a) > len(bb):
                a, bb = bb, a
            if not len(bb):
                js[i] = 1.0 if not len(a) else 0.0
                continue
            idx = np.searchsorted(bb, a)
            idx[idx == len(bb)] = len(bb) - 1
            inter = int((bb[idx] == a).sum())
            union = len(a) + len(bb) - inter
            js[i] = inter / union if union else 1.0
        keep = js >= threshold
        return pa.table({"id_a": pa.array(ias[keep], type=pa.int64()),
                         "id_b": pa.array(ibs[keep], type=pa.int64()),
                         "jaccard": pa.array(js[keep], type=pa.float64())})

    tabs = [ray.get(r) for r in
            pairs_ds.map_batches(verify, batch_format="pyarrow")
            .materialize().to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})
    out = pa.concat_tables(tabs).combine_chunks()
    a = out["id_a"].to_numpy()
    b = out["id_b"].to_numpy()
    j = out["jaccard"].to_numpy()
    o = np.lexsort((b, a))
    a, b, j = a[o], b[o], j[o]
    nb = np.empty(len(a), dtype=bool)
    nb[0] = True
    nb[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return pa.table({"id_a": pa.array(a[nb], type=pa.int64()),
                     "id_b": pa.array(b[nb], type=pa.int64()),
                     "jaccard": pa.array(j[nb], type=pa.float64())})


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy<2 has no bitwise_count)."""
    x = x.astype(np.uint64, copy=True)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = ((x & np.uint64(0x3333333333333333))
         + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)) \
        .astype(np.int64)


def simhash64(texts) -> np.ndarray:
    """64-bit SimHash per document (deterministic crc-derived bits).

    Fully vectorized across the batch: ONE np.unique over all tokens,
    per-(doc, token) counts via lexsort boundaries, and one
    ``np.add.reduceat`` for the weighted ±1 bit accumulation — no
    per-document Python (identical output to the per-doc reference
    formulation, asserted in tests)."""
    offs, flat = _flat_tokens(texts)
    toks = np.asarray(flat.to_pandas(), dtype=object)
    n = len(offs) - 1
    sigs = np.zeros(n, dtype=np.uint64)
    if toks.size == 0:
        return sigs
    doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))

    uniq, inv = np.unique(toks, return_inverse=True)
    # md5-derived 64-bit token hash (first 8 digest bytes, big-endian)
    # — deliberately SQL-expressible: DuckDB's
    # ('0x' || substr(md5(term),1,16))::UBIGINT is the same value, so
    # the whole SimHash op has an exact oracle
    import hashlib as _hl
    h64 = np.fromiter(
        (int.from_bytes(_hl.md5(s.encode("utf-8")).digest()[:8], "big")
         for s in uniq),
        dtype=np.uint64, count=len(uniq))

    # distinct (doc, token) runs + their counts
    order = np.lexsort((inv, doc_of))
    d_s, c_s = doc_of[order], inv[order]
    chg = np.empty(len(d_s), dtype=bool)
    chg[0] = True
    chg[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
    starts = np.flatnonzero(chg)
    cnts = np.diff(np.append(starts, len(d_s))).astype(np.int64)
    pair_doc = d_s[starts]
    pair_code = c_s[starts]

    bits = ((h64[pair_code, None] >> np.arange(64, dtype=np.uint64))
            & np.uint64(1)).astype(np.int64)
    contrib = (2 * bits - 1) * cnts[:, None]
    dchg = np.empty(len(pair_doc), dtype=bool)
    dchg[0] = True
    dchg[1:] = pair_doc[1:] != pair_doc[:-1]
    doc_starts = np.flatnonzero(dchg)
    acc = np.add.reduceat(contrib, doc_starts, axis=0)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    packed = ((acc > 0).astype(np.uint64) * weights).sum(
        axis=1, dtype=np.uint64)
    sigs[pair_doc[doc_starts]] = packed
    return sigs


def simhash_pairs(ds: ray.data.Dataset, text_col: str, id_col: str,
                  hamming_threshold: int = 3,
                  max_bucket: int = 4096) -> pa.Table:
    """Near-dup pairs with SimHash hamming distance ≤ threshold.

    Pigeonhole banding into ``threshold+1`` chunks guarantees every
    true pair collides in at least one chunk — exact recall, verified
    exactly, so the result is deterministic.
    """
    nchunks = hamming_threshold + 1
    width = 64 // nchunks

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        sigs = simhash64(batch[text_col])
        keys, docs, ss = [], [], []
        for did, s in zip(ids, sigs):
            for c in range(nchunks):
                chunk = (int(s) >> (c * width)) & ((1 << width) - 1)
                keys.append(f"{c}:{chunk}")
                docs.append(int(did))
                ss.append(int(s))
        return pa.table({"band": pa.array(keys, type=pa.string()),
                         "doc": pa.array(docs, type=pa.int64()),
                         "sig": pa.array(ss, type=pa.uint64())})

    buckets = ds.map_batches(sig_rows, batch_format="pyarrow")

    def pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "hamming": pa.array([], type=pa.int64())})
        docs = g["doc"].to_numpy()
        sigs = g["sig"].to_numpy()
        order = np.argsort(docs, kind="stable")
        docs, sigs = docs[order], sigs[order]
        uniq, first = np.unique(docs, return_index=True)
        sigs = sigs[first].astype(np.uint64)
        m = len(uniq)
        if m < 2:
            return empty
        if m > max_bucket:
            import logging
            logging.getLogger(__name__).warning(
                "simhash_pairs: dropping degenerate band bucket of %d "
                "docs (max_bucket=%d)", m, max_bucket)
            return empty
        # vectorized hamming: xor outer matrix + SWAR popcount
        ia, ib = np.triu_indices(m, 1)
        d = _popcount64(sigs[ia] ^ sigs[ib])
        keep = d <= hamming_threshold
        return pa.table({"id_a": pa.array(uniq[ia[keep]], type=pa.int64()),
                         "id_b": pa.array(uniq[ib[keep]], type=pa.int64()),
                         "hamming": pa.array(d[keep], type=pa.int64())})

    res = buckets.groupby("band").map_groups(pairs, batch_format="pyarrow") \
        .groupby(["id_a", "id_b"]).min("hamming").to_pandas()
    if not len(res):  # empty to_pandas loses columns — guard before sort
        return pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64()),
                         "hamming": pa.array([], type=pa.int64())})
    res = res.sort_values(["id_a", "id_b"])
    return pa.table({
        "id_a": pa.array(res["id_a"].to_numpy(), type=pa.int64()),
        "id_b": pa.array(res["id_b"].to_numpy(), type=pa.int64()),
        "hamming": pa.array(res["min(hamming)"].to_numpy(), type=pa.int64()),
    })


def ngram_jaccard_pairs(ds: ray.data.Dataset, text_col: str, id_col: str,
                        k: int = 3, threshold: float = 0.5,
                        max_bucket: int = 4096) -> pa.Table:
    """Exact all-pairs n-gram Jaccard via shingle-key shuffle.

    The SQL-checkable exact baseline: explode distinct shingles,
    ``groupby(shingle)`` emits pair partials, a grouped sum yields
    intersection sizes; union sizes come from the per-doc shingle
    counts (broadcast — small; a doc_id join at 100 TB scale).
    """
    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        counts, shingles = _shingle_strings(batch[text_col], k)
        all_sh = np.concatenate(shingles) if shingles else np.empty(0, object)
        all_id = np.repeat(ids, counts)
        # coarse shuffle key: crc of the shingle — buckets inside a
        # coarse group are re-separated EXACTLY by factorize below, so
        # crc collisions cannot merge two shingles' buckets
        cg = (_crc_hashes(all_sh).astype(np.int64) & 0xFF) \
            if len(all_sh) else np.empty(0, np.int64)
        return pa.table({"shingle": pa.array(all_sh, type=pa.string()),
                         "cg": pa.array(cg, type=pa.int64()),
                         "doc": pa.array(all_id, type=pa.int64())})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    sizes = exploded.groupby("doc").count().to_pandas()

    def coarse_pairs(g: pa.Table) -> pa.Table:
        import pandas as pd
        codes, _ = pd.factorize(g["shingle"].to_pandas())
        return _pairs_in_buckets(codes.astype(np.int64),
                                 g["doc"].to_numpy(),
                                 max_bucket, "ngram_jaccard_pairs")

    # n = per-coarse-group co-occurrence count; summing across coarse
    # groups gives the pair's exact intersection size. The sum is done
    # driver-side (lexsort + reduceat): this exact all-pairs baseline
    # materializes its full pair result on the driver anyway — it is
    # the SQL-checkable oracle path, NOT the 100-TB path (that is
    # minhash_lsh_pairs, whose reductions stay distributed).
    inter = exploded.groupby("cg").map_groups(
        coarse_pairs, batch_format="pyarrow").materialize().to_pandas()
    if not len(inter):
        return pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})
    ia0 = inter["id_a"].to_numpy().astype(np.int64)
    ib0 = inter["id_b"].to_numpy().astype(np.int64)
    n0 = inter["n"].to_numpy().astype(np.int64)
    o = np.lexsort((ib0, ia0))
    ia0, ib0, n0 = ia0[o], ib0[o], n0[o]
    nb = np.empty(len(ia0), dtype=bool)
    nb[0] = True
    nb[1:] = (ia0[1:] != ia0[:-1]) | (ib0[1:] != ib0[:-1])
    st = np.flatnonzero(nb)
    ia, ib = ia0[st], ib0[st]
    ic = np.add.reduceat(n0, st).astype(np.float64)
    sdoc = sizes["doc"].to_numpy().astype(np.int64)
    scnt = sizes["count()"].to_numpy().astype(np.float64)
    so = np.argsort(sdoc)
    sdoc, scnt = sdoc[so], scnt[so]
    union = scnt[np.searchsorted(sdoc, ia)] \
        + scnt[np.searchsorted(sdoc, ib)] - ic
    j = ic / union
    keep = j >= threshold
    return pa.table({
        "id_a": pa.array(ia[keep], type=pa.int64()),
        "id_b": pa.array(ib[keep], type=pa.int64()),
        "jaccard": pa.array(j[keep], type=pa.float64()),
    })


def connected_components(edges: ray.data.Dataset, a_col: str,
                         b_col: str, max_rounds: int = 30) -> pa.Table:
    """Dedup-cluster assignment: connected components over near-dup
    pairs via hash-to-min label propagation (Rastogi et al., "Finding
    Connected Components in Map-Reduce in Logarithmic Rounds", ICDE
    2013) — the standard step after pair generation in large-scale
    dedup (keep one doc per cluster).

    State is a (src, mem) membership multiset; each round every node
    group sends its min to all members and its members to the min —
    one ``groupby(src)`` hash shuffle per round, O(log d) rounds, no
    joins. Each round is ``materialize()``d (state is O(paired docs),
    tiny vs the corpus — pairs already fit the object store) so the
    lazy lineage doesn't re-execute quadratically. Convergence is
    certified by the sum of per-node min labels: labels only decrease,
    so two consecutive stable sums = fixpoint. Returns
    ``(doc_id, cluster_id = component-min doc_id)`` for every node
    that appears in a pair (singletons are their own cluster by
    definition and are omitted, as in suffix-array/minhash dedup
    pipelines)."""
    def sym(b: pa.Table) -> pa.Table:
        u = b[a_col].to_numpy().astype(np.int64)
        v = b[b_col].to_numpy().astype(np.int64)
        src = np.concatenate([u, v])
        return pa.table({"src": src,
                         "cg": src & 0xFF,
                         "mem": np.concatenate([v, u])})

    def coarse_step(g: pa.Table) -> pa.Table:
        # ONE call per coarse group (cg is a function of src, so every
        # src's rows are co-located); per-src hash-to-min is done by
        # lexsort + segment reduceat, not a Python call per node
        src = g["src"].to_numpy()
        mem = g["mem"].to_numpy()
        order = np.lexsort((mem, src))
        s, v = src[order], mem[order]
        new = np.empty(len(s), dtype=bool)
        new[0] = True
        new[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(new)
        grp = np.cumsum(new) - 1
        m = np.minimum(np.minimum.reduceat(v, starts), s[starts])
        # each group emits (mem'→m) and (m→mem') for mem' ∈ members∪{src}
        tgt = np.concatenate([v, s[starts]])
        mg = np.concatenate([m[grp], m])
        out_src = np.concatenate([tgt, mg])
        out_mem = np.concatenate([mg, tgt])
        # dedup within the coarse group to keep state near-minimal
        o2 = np.lexsort((out_mem, out_src))
        a2, b2 = out_src[o2], out_mem[o2]
        nb = np.empty(len(a2), dtype=bool)
        nb[0] = True
        nb[1:] = (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1])
        a2, b2 = a2[nb], b2[nb]
        return pa.table({"src": a2, "cg": a2 & 0xFF, "mem": b2})

    cur = edges.map_batches(sym, batch_format="pyarrow").materialize()
    if cur.count() == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "cluster_id": pa.array([], type=pa.int64())})
    stable = 0
    prev_sig = None
    for _ in range(max_rounds):
        cur = cur.groupby("cg").map_groups(
            coarse_step, batch_format="pyarrow").materialize()
        labels = cur.groupby("src").min("mem")
        sig = labels.sum("min(mem)")
        if sig == prev_sig:
            stable += 1
            if stable >= 2:
                break
        else:
            stable, prev_sig = 0, sig

    lab = labels.to_pandas()
    node = lab["src"].to_numpy().astype(np.int64)
    lid = np.minimum(lab["min(mem)"].to_numpy().astype(np.int64), node)
    order = np.argsort(node)
    return pa.table({"doc_id": pa.array(node[order], type=pa.int64()),
                     "cluster_id": pa.array(lid[order], type=pa.int64())})


def _window_hashes(b: pa.Table, text_col: str, k: int
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row k-token window hashes: (row_of, start_pos, hash64).
    Hash = md5 low-uint64 of the chr(0)-joined window — the exact
    value DuckDB's ``md5_number_lower`` computes, so the oracle
    replays collisions too (at 100 TB a vectorizable rolling
    polynomial hash would replace md5; md5 keeps the oracle exact)."""
    import hashlib
    import struct

    offs, flat = _flat_tokens(b[text_col])
    toks = flat.to_pylist()
    rows, poss, hs = [], [], []
    for i in range(len(offs) - 1):
        seg = toks[offs[i]:offs[i + 1]]
        for p in range(len(seg) - k + 1):
            rows.append(i)
            poss.append(p)
            hs.append(struct.unpack("<Q", hashlib.md5(
                "\x00".join(seg[p:p + k]).encode()).digest()[8:])[0])
    # int64 REINTERPRETATION of the uint64 hash: Ray's groupby key
    # conversion overflows on uint64 > 2^63; equality/grouping is
    # unaffected and the SQL side keeps the UBIGINT value space
    return (np.array(rows, dtype=np.int64),
            np.array(poss, dtype=np.int64),
            np.array(hs, dtype=np.uint64).view(np.int64))


def exact_substring_spans(ds: ray.data.Dataset, text_col: str,
                          id_col: str, k: int = 8) -> pa.Table:
    """Exact-substring dedup spans — the "Deduplicating Training Data"
    (Lee et al., 2022) ExactSubstr primitive: every maximal token
    span whose k-token windows ALL occur >= 2 times in the corpus
    (within- or cross-document). Returns (id, span_start, span_len)
    per maximal duplicated region; callers drop or trim those spans.

    Shape: pass 1 — per-batch window-hash partials pre-aggregated to
    (hash, n) → one hash-keyed groupby; the duplicated-hash set
    (only hashes with n >= 2 — vastly smaller than the corpus) is
    broadcast sorted for searchsorted probes. Pass 2 — re-hash each
    batch, mark duplicated window starts, and merge consecutive
    starts into maximal spans with one vectorized diff per batch
    (gaps-and-islands). Lee et al. use a suffix array; the k-gram
    window formulation is groupby-shaped for Ray and equals it for
    spans >= k."""
    def part(b: pa.Table) -> pa.Table:
        _, _, hs = _window_hashes(b, text_col, k)
        u, c = np.unique(hs, return_counts=True)
        return pa.table({"h": pa.array(u, type=pa.int64()),
                         "n": pa.array(c, type=pa.int64())})

    agg = [t for t in ray.get(
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("h").sum("n").materialize().to_arrow_refs())
        if t.num_rows]
    if not agg:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "span_start": pa.array([], type=pa.int64()),
                         "span_len": pa.array([], type=pa.int64())})
    cat = pa.concat_tables(agg).combine_chunks()
    dup = cat.filter(pc.greater_equal(cat["sum(n)"], 2))["h"] \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    dup_ref = ray.put(np.sort(dup))

    def spans(b: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        rows, poss, hs = _window_hashes(b, text_col, k)
        if not len(hs) or not len(dups):
            return pa.table({
                id_col: pa.array([], type=b[id_col].type),
                "span_start": pa.array([], type=pa.int64()),
                "span_len": pa.array([], type=pa.int64())})
        ix = np.minimum(np.searchsorted(dups, hs), len(dups) - 1)
        hit = dups[ix] == hs
        rows, poss = rows[hit], poss[hit]
        if not len(rows):
            return pa.table({
                id_col: pa.array([], type=b[id_col].type),
                "span_start": pa.array([], type=pa.int64()),
                "span_len": pa.array([], type=pa.int64())})
        # islands: same row AND consecutive start positions
        brk = np.concatenate((
            [True], (rows[1:] != rows[:-1]) | (poss[1:] != poss[:-1] + 1)))
        starts = poss[brk]
        ends = np.concatenate((poss[np.nonzero(brk)[0][1:] - 1],
                               [poss[-1]]))
        grow = rows[brk]
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[grow]).cast(b[id_col].type),
            "span_start": pa.array(starts, type=pa.int64()),
            "span_len": pa.array(ends - starts + k, type=pa.int64())})

    tabs = [t for t in ray.get(
        ds.map_batches(spans, batch_format="pyarrow")
        .materialize().to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "span_start": pa.array([], type=pa.int64()),
                         "span_len": pa.array([], type=pa.int64())})
    return pa.concat_tables(tabs).combine_chunks().sort_by(
        [(id_col, "ascending"), ("span_start", "ascending")])


def exact_substring_clean(ds: ray.data.Dataset, text_col: str,
                          id_col: str, k: int = 8
                          ) -> ray.data.Dataset:
    """Apply step of ExactSubstr dedup (Lee et al. 2022 drop the
    duplicated spans and train on the remainder): tokens covered by
    any duplicated maximal span are removed and the survivors are
    reassembled in order. Spans come from
    :func:`exact_substring_spans` (a result vastly smaller than the
    corpus), broadcast once grouped by doc; the cleaning pass streams.
    Emits (id, n_kept, clean_text) for docs with >= 1 surviving
    token."""
    spans = exact_substring_spans(ds, text_col, id_col, k=k)
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in spans.to_pylist():
        by_doc.setdefault(int(r[id_col]), []).append(
            (int(r["span_start"]), int(r["span_len"])))
    span_ref = ray.put(by_doc)

    def clean(b: pa.Table) -> pa.Table:
        sp = ray.get(span_ref)
        offs, flat = _flat_tokens(b[text_col])
        toks = flat.to_pylist()
        ids = b[id_col].to_numpy(zero_copy_only=False)
        out_id, out_n, out_txt = [], [], []
        for i, d in enumerate(ids):
            seg = toks[offs[i]:offs[i + 1]]
            keep = np.ones(len(seg), dtype=bool)
            for s, ln in sp.get(int(d), ()):
                keep[s:s + ln] = False
            if not keep.any():
                continue
            kept = [t for t, kp in zip(seg, keep) if kp]
            out_id.append(int(d))
            out_n.append(len(kept))
            out_txt.append(" ".join(kept))
        return pa.table({
            id_col: pa.array(out_id, type=pa.int64()),
            "n_kept": pa.array(out_n, type=pa.int64()),
            "clean_text": pa.array(out_txt, type=pa.string())})

    return ds.map_batches(clean, batch_format="pyarrow")


def incremental_dedup(existing: ray.data.Dataset,
                      arrivals: ray.data.Dataset, text_col: str,
                      id_col: str, n_existing: int,
                      bits_per_key: int = 12) -> tuple[pa.Table, dict]:
    """Incremental exact dedup of NEW arrivals against an EXISTING
    corpus WITHOUT re-shuffling the old corpus — the daily-increment
    shape at 100 TB. Upstream analog: SignatureUpdateProcessor's
    ``overwriteDupes`` checked against the already-built index, with
    the bloom sidecar playing its ``BloomFilteringPostingsFormat``
    role (misses short-circuit; positives verified ⇒ EXACT answer).

    Three streaming passes, none of which shuffles a corpus:
    1. existing → per-batch text-hash bloom PARTIALS (fixed-size
       uint64 words), OR-merged on the driver (associative union);
    2. arrivals → vectorized bloom probe; definite misses are clean
       immediately (the overwhelmingly common case), possible hits
       contribute their (small) candidate hash set;
    3. existing → broadcast candidate-set probe confirms which
       candidates truly exist (per-batch ``is_in`` against the
       broadcast set, emitting only confirmed hashes).
    Survivors = arrivals whose text is not in existing, first
    ``id_col`` per duplicated arrival text kept. Returns
    ``(survivor table, stats)`` where stats carries the bloom
    short-circuit evidence."""
    import hashlib as _hl

    from engine.bloom import TermBloom, _md5_128

    proto = TermBloom(n_existing, bits_per_key)
    m, k = proto.m, proto.k

    def bloom_partial(b: pa.Table) -> pa.Table:
        bl = TermBloom(1, 1)
        bl.m, bl.k = m, k
        bl.words = np.zeros(m // 64, dtype=np.uint64)
        bl.add_batch(b[text_col].to_pylist())
        return pa.table({"words": pa.array([bl.words.tobytes()],
                                           type=pa.binary())})

    parts = existing.map_batches(
        bloom_partial, batch_format="pyarrow").take_all()
    bloom = TermBloom(1, 1)
    bloom.m, bloom.k = m, k
    bloom.words = np.zeros(m // 64, dtype=np.uint64)
    for p in parts:
        bloom.words |= np.frombuffer(p["words"], dtype=np.uint64)
    bloom_ref = ray.put((bloom.words, m, k))

    def probe(b: pa.Table) -> pa.Table:
        words, m_, k_ = ray.get(bloom_ref)
        bl = TermBloom(1, 1)
        bl.m, bl.k = m_, k_
        bl.words = words
        txts = b[text_col].to_pylist()
        cand = bl.may_contain(txts)
        hx = [_hl.md5(t.encode()).hexdigest() for t in txts]
        return pa.table({
            id_col: b[id_col],
            "h": pa.array(hx, type=pa.string()),
            "cand": pa.array(cand)})

    # the probed table stays DISTRIBUTED: only the (small) candidate
    # hash set and per-batch counts ever reach the driver
    probed = arrivals.map_batches(
        probe, batch_format="pyarrow").materialize()

    def cand_only(b: pa.Table) -> pa.Table:
        return b.filter(b["cand"]).select(["h"])

    cand_rows = probed.map_batches(
        cand_only, batch_format="pyarrow").take_all()
    n_arr = probed.count()
    cand_set = sorted({r["h"] for r in cand_rows})
    stats = {"n_arrivals": n_arr,
             "bloom_misses": n_arr - len(cand_rows),
             "candidates": len(cand_set)}

    confirmed: set[str] = set()
    if cand_set:
        cref = ray.put(pa.array(cand_set, type=pa.string()))

        def verify(b: pa.Table) -> pa.Table:
            cs = ray.get(cref)
            hx = pa.array([_hl.md5(t.encode()).hexdigest()
                           for t in b[text_col].to_pylist()],
                          type=pa.string())
            hit = pc.is_in(hx, value_set=cs)
            return pa.table({"h": hx.filter(hit)})

        confirmed = {r["h"] for r in existing.map_batches(
            verify, batch_format="pyarrow").take_all()}
    stats["confirmed"] = len(confirmed)

    # drop confirmed dups per batch, then ONE grouped min(id) keeps
    # the first id per duplicated arrival text — distributed
    conf_ref = ray.put(pa.array(sorted(confirmed), type=pa.string()))

    def drop(b: pa.Table) -> pa.Table:
        cs = ray.get(conf_ref)
        keep = pc.invert(pc.is_in(b["h"], value_set=cs)) if len(cs) \
            else pa.array(np.ones(b.num_rows, dtype=bool))
        return b.filter(keep).select(["h", id_col])

    sur = probed.map_batches(drop, batch_format="pyarrow") \
        .groupby("h").min(id_col).take_all()
    sel = np.sort(np.array([r[f"min({id_col})"] for r in sur],
                           dtype=np.int64))
    return pa.table({id_col: pa.array(sel, type=pa.int64())}), stats


def duplicate_spans(ds: ray.data.Dataset, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 4
                    ) -> ray.data.Dataset:
    """Exact duplicated-substring span detection — the corpus-level
    substring dedup of Lee et al. 2022, *Deduplicating Training Data
    Makes Language Models Better* (their suffix-array step), restated
    Ray-Data-first: a substring of >= k tokens is duplicated iff every
    one of its length-k windows is duplicated, so positioned word
    k-gram windows + one groupby(gram) find exactly the positions
    covered by any repeated-substring of length >= k, and a per-doc
    interval union turns them into maximal spans.

    Pipeline: map_batches emits (doc, pos, gram) for every window
    (batch-flat, no per-doc Python loop) → groupby(gram) keeps the
    windows of grams occurring >= 2 times corpus-wide (the only
    corpus-wide exchange; group payload is the gram's occurrence list,
    bounded by total occurrences) → groupby(doc) merges overlapping
    windows vectorized (same-length intervals: union length =
    sum(min(delta, k)) + k, span starts where delta > k).

    Scale path: the gram column ships as the window STRING here so the
    DuckDB oracle is exact; at 100 TB emit the 64-bit rolling hash of
    the window instead (one-line change in ``windows``) — collision
    odds ~ n_windows^2/2^64 and the shuffle moves 8-byte keys.
    """
    def windows(b: pa.Table) -> pa.Table:
        offs, flat = _flat_tokens(b[text_col])
        toks = np.asarray(flat.to_pandas(), dtype=object)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        n_docs = len(offs) - 1
        total = len(toks)
        if total == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "pos": pa.array([], type=pa.int64()),
                             "gram": pa.array([], type=pa.string())})
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64),
                           np.diff(offs))
        idx = np.arange(total, dtype=np.int64)
        valid = idx + k <= offs[1:][doc_of]
        starts = idx[valid]
        if not len(starts):
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "pos": pa.array([], type=pa.int64()),
                             "gram": pa.array([], type=pa.string())})
        u = toks.astype(str)
        grams = u[starts]
        for j in range(1, k):
            grams = np.char.add(np.char.add(grams, " "), u[starts + j])
        d = doc_of[starts]
        return pa.table({
            "doc_id": pa.array(ids[d], type=pa.int64()),
            "pos": pa.array(starts - offs[:-1][d], type=pa.int64()),
            "gram": pa.array(grams.astype(object), type=pa.string())})

    w = ds.map_batches(windows, batch_format="pyarrow")

    def dup_only(g: pa.Table) -> pa.Table:
        if g.num_rows >= 2:
            return g.select(["doc_id", "pos"])
        return g.select(["doc_id", "pos"]).slice(0, 0)

    dw = w.groupby("gram").map_groups(dup_only, batch_format="pyarrow")

    def spans(g: pa.Table) -> pa.Table:
        pos = np.sort(g["pos"].to_numpy(zero_copy_only=False))
        deltas = np.diff(pos)
        return pa.table({
            "doc_id": g["doc_id"].slice(0, 1),
            "n_dup_windows": pa.array([len(pos)], type=pa.int64()),
            "dup_tokens": pa.array(
                [int(np.minimum(deltas, k).sum()) + k], type=pa.int64()),
            "n_spans": pa.array([1 + int((deltas > k).sum())],
                                type=pa.int64())})

    return dw.groupby("doc_id").map_groups(spans, batch_format="pyarrow")


def winnow_fingerprints(ds: ray.data.Dataset, text_col: str,
                        id_col: str, k: int = 3,
                        w: int = 4) -> pa.Table:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting algorithm; the
    position-robust sibling of this module's MinHash/SimHash
    signatures): hash every k-token window, slide a length-``w``
    window over the hash sequence and keep each window's MINIMUM —
    the distinct selected hashes are the doc's fingerprints. The
    paper's guarantee: any token run of length ≥ k+w-1 shared by two
    docs yields at least one shared fingerprint, while only ~2/(w+1)
    of positions are stored. Boundary (documented): docs with fewer
    than ``w`` k-gram windows contribute min-of-all (one clamped
    window); the paper's rightmost-tie rule is irrelevant here since
    only hash VALUES are kept, not positions.

    Entirely row-local — ONE streaming ``map_batches``, no shuffle;
    the per-doc sliding min is a vectorized strided-view reduction.
    md5 window hashes keep the DuckDB oracle exact (same boundary as
    ``exact_substring_spans``; at 100 TB a rolling polynomial hash
    replaces md5)."""
    from numpy.lib.stride_tricks import sliding_window_view

    def f(b: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          "fp": pa.array([], type=pa.string())})
        rows, _, hs = _window_hashes(b, text_col, k)
        if not len(rows):
            return empty
        ids = b[id_col].to_numpy()
        hu = hs.view(np.uint64)          # min must compare UNSIGNED
        starts = np.flatnonzero(np.r_[True, rows[1:] != rows[:-1]])
        ends = np.r_[starts[1:], len(rows)]
        out_id: list[np.ndarray] = []
        out_fp: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            seg = hu[s:e]
            if len(seg) >= w:
                mins = sliding_window_view(seg, w).min(axis=1)
            else:
                mins = seg.min(keepdims=True)
            u = np.unique(mins)
            out_id.append(np.full(len(u), ids[rows[s]],
                                  dtype=np.int64))
            out_fp.append(u)
        fid = np.concatenate(out_id)
        fps = np.concatenate(out_fp)
        return pa.table({
            id_col: pa.array(fid, type=pa.int64()),
            "fp": pa.array([str(int(x)) for x in fps],
                           type=pa.string())})

    from engine.ops.graph import _collect
    t = _collect(ds.map_batches(f, batch_format="pyarrow"))
    if t is None:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "fp": pa.array([], type=pa.string())})
    return t.sort_by([(id_col, "ascending"), ("fp", "ascending")])
