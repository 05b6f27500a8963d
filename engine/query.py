"""Top-k BM25 query engine: brute-force oracle + block-max WAND.

Scoring replicates the public Lucene 8.x BM25 path exactly (SURVEY.md
§2.4; upstream ``L/search/similarities/BM25Similarity.java`` [U]):

- ``idf = (float) ln(1 + (N - df + 0.5)/(df + 0.5))`` from **merged
  global** df/N; 8.x has no ``(k1+1)`` numerator (LUCENE-8563).
- per-norm-byte cache ``c[j] = k1*(1-b + b*LENGTH_TABLE[j]/avgdl)`` in
  float64, ``avgdl = sum_cf/N`` exact; doc length is the SmallFloat-
  *decoded* lossy length.
- ``score = idf_f32 * float32(tf/(tf + c[norm]))``; multi-term
  disjunction sums clause scores in float64 then casts float32 (the
  ``DisjunctionSumScorer`` order-robust accumulation).
- tie-break: score desc, then docID asc (upstream
  ``L/search/TopScoreDocCollector``/``HitQueue`` [U]).

The brute-force scorer (score every matching doc, full sort) is the
in-sandbox oracle; the BMW engine (upstream ``L/search/WANDScorer.java``
after Ding & Suel SIGIR'11) must match it exactly — the dual-execution
equivalence pattern of Lucene's own randomized tests (SURVEY.md §5).

A hot (salted) term appears as several index rows over disjoint doc
sets; each row becomes an independent scorer clause weighted with the
*global* df — docs occur in exactly one sub-list so disjunctive sums
are unchanged (the many-segments-per-term shape of a Lucene index).
"""

from __future__ import annotations

import heapq
import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from engine import manifest as mf
from engine.analysis import Analyzer
from engine.build import DOCMAP_NAME, IndexConfig, term_bucket
from engine.codec import BLOCK_SIZE, decode_block, vbyte_decode
from engine.smallfloat import LENGTH_TABLE

K1 = 1.2
B = 0.75
_INF = 1 << 62


def idf(N: int, df: int) -> np.float32:
    return np.float32(np.log(1.0 + (N - df + 0.5) / (df + 0.5)))


def norm_cache(avgdl: float) -> np.ndarray:
    """float64[256]: k1*(1-b+b*decoded_len/avgdl) per norm byte."""
    if avgdl <= 0:
        avgdl = 1.0
    return K1 * (1.0 - B + B * (LENGTH_TABLE.astype(np.float64) / avgdl))


def _clause_scores(tfs: np.ndarray, norms: np.ndarray, weight: np.float32,
                   cache: np.ndarray) -> np.ndarray:
    """Vectorized per-posting BM25 clause scores (float32)."""
    freq = tfs.astype(np.float32).astype(np.float64)
    ratio = (freq / (freq + cache[norms])).astype(np.float32)
    return weight * ratio


class _SubList:
    """One index row: decoded lazily, block at a time (skip + block-max)."""

    __slots__ = ("df", "docs_blob", "tfs_blob", "norms", "blk_last",
                 "blk_doc_off", "blk_tf_off", "blk_max_tf", "blk_min_norm",
                 "n_blocks")

    def __init__(self, row: dict[str, Any]):
        self.df = int(row["df"])
        self.docs_blob = row["docs"]
        self.tfs_blob = row["tfs"]
        self.norms = np.frombuffer(row["norms"], dtype=np.uint8)
        self.blk_last = np.frombuffer(row["blk_last_doc"], dtype=np.int64)
        self.blk_doc_off = np.frombuffer(row["blk_doc_off"], dtype=np.int32)
        self.blk_tf_off = np.frombuffer(row["blk_tf_off"], dtype=np.int32)
        self.blk_max_tf = np.frombuffer(row["blk_max_tf"], dtype=np.int32)
        self.blk_min_norm = np.frombuffer(row["blk_min_norm"], dtype=np.uint8)
        self.n_blocks = len(self.blk_last)

    def decode_block(self, b: int) -> tuple[np.ndarray, np.ndarray]:
        return decode_block(self.docs_blob, self.tfs_blob, self.blk_doc_off,
                            self.blk_tf_off, self.blk_last, b, self.df)

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        deltas, _ = vbyte_decode(self.docs_blob, self.df, 0)
        docs = np.cumsum(deltas)
        tfs, _ = vbyte_decode(self.tfs_blob, self.df, 0)
        return docs, tfs, self.norms


class _Scorer:
    """Doc-at-a-time iterator over one sub-list with block-max bounds."""

    __slots__ = ("sub", "weight", "cache", "block_ub", "max_ub",
                 "cur_block", "docs", "scores", "idx", "doc")

    def __init__(self, sub: _SubList, weight: np.float32, cache: np.ndarray):
        self.sub = sub
        self.weight = weight
        self.cache = cache
        # block upper bounds: max_tf with the *smallest* length in block
        self.block_ub = _clause_scores(
            sub.blk_max_tf.astype(np.int64), sub.blk_min_norm, weight, cache)
        self.max_ub = float(self.block_ub.max())
        self.cur_block = -1
        self.docs = None
        self.scores = None
        self.idx = 0
        self.doc = -1
        self._load(0)
        self.doc = int(self.docs[0])

    def _load(self, b: int) -> None:
        docs, tfs = self.sub.decode_block(b)
        s = b * BLOCK_SIZE
        norms = self.sub.norms[s:s + len(docs)]
        self.docs = docs
        self.scores = _clause_scores(tfs, norms, self.weight, self.cache)
        self.cur_block = b
        self.idx = 0

    def advance(self, target: int) -> int:
        """Move to first doc >= target (returns it; _INF when exhausted)."""
        if self.doc >= target:
            return self.doc
        b = int(np.searchsorted(self.sub.blk_last, target))
        if b >= self.sub.n_blocks:
            self.doc = _INF
            return _INF
        if b != self.cur_block:
            self._load(b)
        self.idx = int(np.searchsorted(self.docs, target))
        self.doc = int(self.docs[self.idx])
        return self.doc

    def next(self) -> int:
        self.idx += 1
        if self.idx < len(self.docs):
            self.doc = int(self.docs[self.idx])
        elif self.cur_block + 1 < self.sub.n_blocks:
            self._load(self.cur_block + 1)
            self.doc = int(self.docs[0])
        else:
            self.doc = _INF
        return self.doc

    def score(self) -> np.float32:
        return self.scores[self.idx]

    def block_max(self, target: int) -> float:
        """Upper bound of the block containing/after ``target``."""
        b = int(np.searchsorted(self.sub.blk_last, target))
        if b >= self.sub.n_blocks:
            return 0.0
        return float(self.block_ub[b])

    def block_last(self, target: int) -> int:
        b = int(np.searchsorted(self.sub.blk_last, target))
        if b >= self.sub.n_blocks:
            return _INF
        return int(self.sub.blk_last[b])


class IndexReader:
    """Loads manifest + stats; serves term lookups with an LRU-ish cache.

    Term-hash bucketing means a term's rows live in exactly one shard
    directory; lookups read only those rows via Parquet predicate
    pushdown (row-group pruning on the sorted ``term`` column).
    """

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        man = mf.load(index_dir)
        if man is None or man.get("status") != "complete":
            raise ValueError(f"no complete index at {index_dir}")
        self.manifest = man
        self.cfg = IndexConfig.from_json(man["config"])
        self.N = int(man["stats"]["N"])
        self.avgdl = float(man["stats"]["avgdl"])
        self.cache = norm_cache(self.avgdl)
        self.analyzer = Analyzer(self.cfg.stop_words, self.cfg.stemming)
        self._term_cache: dict[str, list[_SubList]] = {}
        self._docmap: pa.Table | None = None

    # ------------------------------------------------------------ lookup

    def lookup(self, terms: list[str]) -> dict[str, list[_SubList]]:
        need: dict[int, list[str]] = {}
        for t in set(terms):
            if t not in self._term_cache:
                need.setdefault(term_bucket(t, self.cfg.n_buckets), []).append(t)
        for b, ts in need.items():
            shard = os.path.join(self.index_dir, "index", f"bucket={b}")
            for t in ts:
                self._term_cache[t] = []
            if not os.path.isdir(shard):
                continue
            tab = pq.read_table(
                shard, filters=[("term", "in", ts)],
                columns=["term", "sub", "df", "cf", "min_doc", "docs", "tfs",
                         "norms", "blk_last_doc", "blk_doc_off", "blk_tf_off",
                         "blk_max_tf", "blk_min_norm"])
            for row in tab.to_pylist():
                self._term_cache[row["term"]].append(_SubList(row))
        return {t: self._term_cache[t] for t in set(terms)}

    def global_df(self, subs: list[_SubList]) -> int:
        return sum(s.df for s in subs)

    # ----------------------------------------------------------- scoring

    def brute_force_topk(self, query_text: str, k: int) -> pa.Table:
        """Oracle: score every matching doc (vectorized), full sort."""
        terms = self.analyzer.query_terms(query_text)
        subs_by_term = self.lookup(terms)
        all_docs: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        for t in terms:  # duplicates = duplicate SHOULD clauses
            subs = subs_by_term[t]
            if not subs:
                continue
            w = idf(self.N, self.global_df(subs))
            for s in subs:
                docs, tfs, norms = s.decode_all()
                all_docs.append(docs)
                all_scores.append(_clause_scores(tfs, norms, w, self.cache))
        if not all_docs:
            return _topdocs_table([], [])
        docs = np.concatenate(all_docs)
        scores = np.concatenate(all_scores).astype(np.float64)
        uniq, inv = np.unique(docs, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, scores)
        final = sums.astype(np.float32)
        order = np.lexsort((uniq, -final))[:k]
        return _topdocs_table(uniq[order], final[order], total=len(uniq))

    def bmw_topk(self, query_text: str, k: int) -> pa.Table:
        """Block-max WAND top-k; rank-identical to the brute oracle."""
        terms = self.analyzer.query_terms(query_text)
        subs_by_term = self.lookup(terms)
        scorers: list[_Scorer] = []
        for t in terms:
            subs = subs_by_term[t]
            if not subs:
                continue
            w = idf(self.N, self.global_df(subs))
            for s in subs:
                scorers.append(_Scorer(s, w, self.cache))
        if not scorers or k <= 0:
            return _topdocs_table([], [])

        heap: list[tuple[float, int]] = []   # (score, -doc); min = worst
        threshold = -np.inf
        scored = 0
        while True:
            scorers.sort(key=lambda s: s.doc)
            if scorers[0].doc == _INF:
                break
            # pivot by term-level upper bounds
            acc = 0.0
            pivot = -1
            pidx = -1
            for i, s in enumerate(scorers):
                if s.doc == _INF:
                    break
                acc += s.max_ub
                # compare after the same f32 cast the real score gets:
                # clause scores are exact in f64, so sum_scores <= sum_ubs
                # in f64 and f32 rounding is monotone — bound stays valid
                if np.float32(acc) > threshold:
                    pivot = s.doc
                    pidx = i
                    break
            if pivot < 0:
                break  # nothing can beat the heap anymore
            # refine with block-max bounds at the pivot
            lead = [s for s in scorers if s.doc <= pivot]
            bub = sum(s.block_max(pivot) for s in lead)
            if np.float32(bub) <= threshold:
                # Skip past the shallowest lead-block boundary — but the
                # bound only covers lead scorers, so never skip past the
                # first non-lead scorer's doc (it contributes from there).
                nxt = min(s.block_last(pivot) for s in lead) + 1
                non_lead_min = min(
                    (s.doc for s in scorers if s.doc > pivot), default=_INF)
                nxt = max(min(nxt, non_lead_min), pivot + 1)
                for s in lead:
                    s.advance(nxt)
                continue
            if scorers[0].doc < pivot:
                for s in lead:
                    if s.doc < pivot:
                        s.advance(pivot)
                continue
            # all leads aligned on pivot: score it (float64 sum → float32)
            total = 0.0
            for s in scorers:
                if s.doc != pivot:
                    break
                total += float(s.score())
            sc = np.float32(total)
            scored += 1
            if len(heap) < k:
                heapq.heappush(heap, (float(sc), -pivot))
                if len(heap) == k:
                    threshold = heap[0][0]
            elif float(sc) > heap[0][0]:
                heapq.heapreplace(heap, (float(sc), -pivot))
                threshold = heap[0][0]
            for s in scorers:
                if s.doc != pivot:
                    break
                s.next()

        hits = sorted(heap, key=lambda e: (-e[0], -e[1]))
        return _topdocs_table(
            [-d for _, d in hits], np.array([s for s, _ in hits], np.float32),
            total=scored)

    # ------------------------------------------------------------- fetch

    def resolve_docs(self, doc_ids: np.ndarray) -> pa.Table:
        """doc_id → (conv_id, turn_idx) via the docmap base table."""
        if self.cfg.conv_cols is None:
            raise ValueError("direct doc_id index has no docmap")
        if self._docmap is None:
            self._docmap = pq.read_table(
                os.path.join(self.index_dir, DOCMAP_NAME))
        bases = self._docmap["base"].to_numpy()
        conv_col = self.cfg.conv_cols[0]
        ids = np.asarray(doc_ids, dtype=np.int64)
        ci = np.searchsorted(bases, ids, side="right") - 1
        convs = self._docmap[conv_col].take(pa.array(ci))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            conv_col: convs,
            self.cfg.conv_cols[1]: pa.array(
                (ids - bases[ci]).astype(np.int32), type=pa.int32()),
        })


def _topdocs_table(doc_ids, scores, total: int | None = None) -> pa.Table:
    n = len(doc_ids)
    return pa.table({
        "rank": pa.array(np.arange(n, dtype=np.int32)),
        "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64), type=pa.int64()),
        "score": pa.array(np.asarray(scores, dtype=np.float32), type=pa.float32()),
        "total_hits": pa.array(np.full(n, total or 0, dtype=np.int64)),
    })


class QueryEngine:
    """Actor-pool stage: batch of queries → top-k result rows.

    Use as ``queries_ds.map_batches(QueryEngine, fn_constructor_args=
    (index_dir,), concurrency=N, batch_format="pyarrow")`` — the reader
    (manifest, stats, term cache) loads once per actor; each query in
    the batch runs the BMW engine (SURVEY.md §3.2).
    """

    def __init__(self, index_dir: str, use_bmw: bool = True,
                 resolve: bool = True):
        self.reader = IndexReader(index_dir)
        self.use_bmw = use_bmw
        self.resolve = resolve and self.reader.cfg.conv_cols is not None

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[pa.Table] = []
        qids = batch["query_id"].to_pylist()
        texts = batch["query_text"].to_pylist()
        ks = batch["k"].to_pylist() if "k" in batch.column_names \
            else [10] * len(qids)
        for qid, text, k in zip(qids, texts, ks):
            top = (self.reader.bmw_topk(text, int(k)) if self.use_bmw
                   else self.reader.brute_force_topk(text, int(k)))
            if self.resolve and top.num_rows:
                res = self.reader.resolve_docs(top["doc_id"].to_numpy())
                top = top.append_column(
                    self.reader.cfg.conv_cols[0], res[self.reader.cfg.conv_cols[0]])
                top = top.append_column(
                    self.reader.cfg.conv_cols[1], res[self.reader.cfg.conv_cols[1]])
            elif self.resolve:
                cc = self.reader.cfg.conv_cols
                top = top.append_column(cc[0], pa.array([], type=pa.string()))
                top = top.append_column(cc[1], pa.array([], type=pa.int32()))
            top = top.add_column(
                0, "query_id", pa.array(np.full(top.num_rows, qid, np.int64)))
            out.append(top)
        return pa.concat_tables(out) if out else _empty_results(self.resolve)


def _empty_results(resolve: bool) -> pa.Table:
    cols = {
        "query_id": pa.array([], type=pa.int64()),
        "rank": pa.array([], type=pa.int32()),
        "doc_id": pa.array([], type=pa.int64()),
        "score": pa.array([], type=pa.float32()),
        "total_hits": pa.array([], type=pa.int64()),
    }
    if resolve:
        cols["conv_id"] = pa.array([], type=pa.string())
        cols["turn_idx"] = pa.array([], type=pa.int32())
    return pa.table(cols)
