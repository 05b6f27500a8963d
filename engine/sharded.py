"""Sharded distributed search with global IDF.

The multi-node story for query serving: the corpus is built as K
doc-range shard indexes (each an ordinary `build_index` output over a
slice of the input files), one long-lived Ray actor holds each shard's
warm `IndexReader`, and a query runs Solr's two-phase **distributed
IDF** protocol (upstream ``S/search/stats/ExactStatsCache`` /
``QueryComponent`` distributed flow [U]; Lucene analog: one
``IndexSearcher`` over many leaves with collection-level
``termStatistics``):

  phase 0  every shard reports local (df, cf, N, sum_cf) for the
           query terms — a tiny message;
  phase 1  the coordinator sums them into GLOBAL stats and broadcasts
           per-term idf weights + the global norm cache; each shard
           scores its own postings with those weights and returns its
           local top-k;
  merge    coordinator concatenates K·k rows and takes the global
           top-k (score desc, docID asc).

Because docIDs never span shards, per-doc clause sums are unchanged,
norm bytes are corpus-independent, and the idf/avgdl inputs are the
global ones — the result is **bit-identical** to a single-index search
(pinned by ``test_sharded_equals_single``). At 256 nodes the actors
are placed one-per-node and only (terms, stats, top-k) cross the wire.

On top of that two-phase core the module carries the SolrCloud
protocol surface, every piece exact (never the upstream
approximation) and wire-bounded:

- ``topk`` (+ ``shards.tolerant`` degraded mode, searchAfter cursors)
- ``cursor_page`` — cursorMark deep paging, K·k rows per page at any
  depth, page-invariant numFound
- ``topk_fetch`` — two-phase ids+scores → stored-field fetch
- ``rerank_topk`` — coordinator-exact distributed ReRank
- ``fuzzy_topk`` — globally consistent multi-term rewrite
- ``facet`` (full maps) / ``facet_topk`` (facet.limit + refinement +
  threshold-algorithm exactness bound) / ``facet_topk_stats``
  (json.facet sub-stats refined with their buckets) / ``pivot_facet``
  (batched per-bucket refinement waves)
- ``terms_topk`` — terms.limit refinement over the term dictionary
- ``grouped_topk`` / ``grouped_docs`` — two-phase distributed grouping
- ``spellcheck`` / ``stats`` — merged partials, exact in one round
- compositeId routing (``route_corpus`` / ``routed_topk``)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from engine.query import (IndexReader, _clause_scores, idf, norm_cache,
                          _topdocs_table)


def _local_term_stats(reader: IndexReader, terms: list[str]
                      ) -> dict[str, tuple[int, int]]:
    subs = reader.lookup(terms)
    out = {}
    for t, ss in subs.items():
        if ss:
            # stored per-sublist stats — phase 0 must stay a tiny
            # message, never a posting decode
            out[t] = (reader.global_df(ss), reader.global_cf(ss))
    return out


def _score_shard(reader: IndexReader, terms: list[str],
                 weights: dict[str, float], cache: np.ndarray,
                 k: int, after: tuple | None = None) -> pa.Table:
    """Score one shard's postings with externally supplied (global)
    idf weights and norm cache; local top-k.  ``after=(score,
    doc_id)`` keeps only docs strictly after the cursor position in
    (score desc, docID asc) order — cursorMark's per-shard filter, so
    deep pages never ship more than k rows per shard.  total_hits
    stays the full match count (Solr's numFound is page-invariant)."""
    subs_by_term = reader.lookup(terms)
    clauses = []
    for t in terms:                       # duplicates = duplicate clauses
        w = weights.get(t)
        if w is None:
            continue
        for s in subs_by_term.get(t, []):
            docs, tfs, norms = s.decode_all()
            clauses.append(
                (docs, _clause_scores(tfs, norms, np.float32(w), cache)))
    if not clauses:
        return _topdocs_table([], []).replace_schema_metadata(
            {"total": "0"})
    docs = np.concatenate([d for d, _ in clauses])
    scores = np.concatenate([s for _, s in clauses]).astype(np.float64)
    uniq, inv = np.unique(docs, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(sums, inv, scores)
    keep = reader._keep(uniq)
    if keep is not None:
        uniq, sums = uniq[keep], sums[keep]
    final = sums.astype(np.float32)
    total = len(uniq)
    if after is not None:
        sa, da = np.float32(after[0]), int(after[1])
        m = (final < sa) | ((final == sa) & (uniq > da))
        uniq, final = uniq[m], final[m]
    order = np.lexsort((uniq, -final))[:k]
    # the full (pre-cursor) match count rides as metadata so an
    # after-filter that empties this shard's PAGE still reports the
    # shard's numFound — rows can't carry it when there are none
    return _topdocs_table(uniq[order], final[order], total=total) \
        .replace_schema_metadata({"total": str(total)})


def _shard_total(t: pa.Table) -> int:
    """A shard response's full match count: metadata-borne (survives
    an empty page), falling back to the per-row column."""
    md = t.schema.metadata or {}
    if b"total" in md:
        return int(md[b"total"])
    return int(t["total_hits"][0].as_py()) if t.num_rows else 0


@ray.remote
class ShardSearcher:
    """One shard's warm reader as a long-lived actor (placed per node
    in a real cluster via placement groups; plain actors here)."""

    def __init__(self, index_dir: str, preload: bool = True):
        self.reader = IndexReader(index_dir, preload=preload)

    def collection_stats(self) -> tuple[int, float]:
        return (self.reader.N,
                float(self.reader.manifest["stats"]["sum_cf"]))

    def term_stats(self, terms: list[str]) -> dict:
        return _local_term_stats(self.reader, terms)

    def score(self, terms: list[str], weights: dict, cache: np.ndarray,
              k: int, after: tuple | None = None) -> pa.Table:
        return _score_shard(self.reader, terms, weights, cache, k,
                            after)

    def rerank_window(self, ids: np.ndarray, terms: list[str],
                      weights: dict, cache: np.ndarray) -> pa.Table:
        """Second-pass rescore partial (upstream ``ReRankQuery`` under
        distributed search [U]): probe the rerank terms' postings at
        the window docIDs via searchsorted — never a full traversal —
        under the supplied GLOBAL weights.  Shards own disjoint docs,
        so each window doc's full f64 rerank sum comes from exactly
        its owner; docs with no rerank match are omitted (the
        coordinator defaults them to 0, upstream's keep-first-pass
        behavior)."""
        from engine.query import _clause_scores as _cs

        r = self.reader
        subs = r.lookup(terms)
        rr = np.zeros(len(ids), dtype=np.float64)
        any_hit = np.zeros(len(ids), dtype=bool)
        for t in terms:
            w = weights.get(t)
            if w is None or not subs[t]:
                continue
            docs, tfs, norms = r._clause_arrays(t, subs[t])
            if not len(docs):
                continue
            idx = np.clip(np.searchsorted(docs, ids), 0,
                          len(docs) - 1)
            hit = docs[idx] == ids
            sc = _cs(tfs[idx[hit]], norms[idx[hit]], np.float32(w),
                     cache)
            rr[hit] += sc.astype(np.float64)
            any_hit |= hit
        return pa.table({
            "doc_id": pa.array(np.asarray(ids)[any_hit],
                               type=pa.int64()),
            "rr": pa.array(rr[any_hit], type=pa.float64())})

    def fetch(self, doc_ids: np.ndarray) -> pa.Table:
        """Phase-2 stored-field fetch for the ids THIS shard owns
        (missing ids are simply absent — the coordinator routes each
        id to the shards whose docID bounds cover it and unions the
        returns)."""
        return self.reader.fetch_docs(doc_ids)

    def doc_bounds(self) -> tuple[int, int] | None:
        """(min, max) docID over this shard's stored fields — the
        coordinator's phase-2 routing table (r5): exact ownership for
        doc-range sharding, a safe superset otherwise. None until
        ``build_stored_fields`` has run."""
        b = self.reader.manifest.get("stored") or []
        if not b:
            return None
        return (min(int(x["min"]) for x in b),
                max(int(x["max"]) for x in b))

    def highlight(self, doc_ids: np.ndarray, qterms: list,
                  window: int) -> pa.Table:
        """Phase-2 per-doc highlighting on the OWNER shard (upstream
        distributed ``HighlightComponent`` — snippets are computed by
        the shard holding the doc during the second round, never by
        the coordinator [U]): stored-field fetch for the ids this
        shard owns, then the deterministic 2w+1-token first-match
        snippet spec of :meth:`IndexReader.highlight_topk`."""
        stored = self.reader.fetch_docs(doc_ids)
        qs = set(qterms)
        snippets = []
        for txt in stored["text"].to_pylist():
            toks = [t for t, _ in
                    self.reader.analyzer.analyze_text(txt)]
            p = next((i for i, t in enumerate(toks) if t in qs),
                     None)
            snippets.append(
                "" if p is None else
                " ".join(toks[max(0, p - window): p + window + 1]))
        return pa.table({
            "doc_id": stored["doc_id"],
            "snippet": pa.array(snippets, type=pa.string())})

    def phrase_partial(self, terms: list[str], w: float,
                       cache: np.ndarray, k: int) -> pa.Table:
        """Shard-local exact-phrase match scored under the
        coordinator's GLOBAL weight + norm cache — documents never
        span shards, so the phrase match itself needs no cross-shard
        positions; only the stats are global (upstream distributed
        PhraseQuery [U])."""
        from engine.query import _clause_scores, _topdocs_table

        r = self.reader
        if any(not s for s in r.lookup(terms).values()):
            return _topdocs_table([], [], total=0)
        got = r._phrase_match(terms)
        if got is None:
            return _topdocs_table([], [], total=0)
        uniq, freq, norms = got
        final = _clause_scores(freq, norms, np.float32(w), cache)
        order = np.lexsort((uniq, -final))[:k]
        return _topdocs_table(uniq[order], final[order],
                              total=len(uniq))

    def sloppy_n_partial(self, terms: list[str], slop: int, w: float,
                         cache: np.ndarray, k: int) -> pa.Table:
        """Shard-local n-term sloppy phrase (1/(distance+1) weights)
        scored under the coordinator's GLOBAL weight + norm cache —
        same distribution argument as :meth:`phrase_partial`."""
        from engine.query import _clause_scores, _topdocs_table

        r = self.reader
        if any(not s for s in r.lookup(terms).values()):
            return _topdocs_table([], [], total=0)
        got = r._sloppy_n_match(terms, slop)
        if got is None:
            return _topdocs_table([], [], total=0)
        uniq, freq, norms = got
        final = _clause_scores(freq, norms, np.float32(w), cache)
        order = np.lexsort((uniq, -final))[:k]
        return _topdocs_table(uniq[order], final[order],
                              total=len(uniq))

    def span_near_partial(self, terms: list[str], slop: int,
                          w: float, cache: np.ndarray,
                          k: int) -> pa.Table:
        """Shard-local ordered SpanNear chain DP scored under the
        coordinator's GLOBAL weight + norm cache."""
        from engine.query import _clause_scores, _topdocs_table

        r = self.reader
        if any(not s for s in r.lookup(terms).values()):
            return _topdocs_table([], [], total=0)
        got = r._span_near_match(terms, slop)
        if got is None:
            return _topdocs_table([], [], total=0)
        uniq, freq, norms = got
        final = _clause_scores(freq, norms, np.float32(w), cache)
        order = np.lexsort((uniq, -final))[:k]
        return _topdocs_table(uniq[order], final[order],
                              total=len(uniq))

    def pattern_candidates(self, kind: str, pattern: str) -> list:
        """Per-shard multi-term expansion partials for wildcard/regexp
        (upstream multi-term rewrite under distributed search [U]):
        this shard's matching dictionary terms, pruned through the
        trigram postings like the single-index paths."""
        import re

        r = self.reader
        if kind == "regexp":
            rx = re.compile(pattern)
            return [t for t in r.regexp_candidates(pattern)
                    if rx.fullmatch(t)]
        # wildcard
        body = pattern[:-1] if pattern.endswith("*") else pattern
        if "*" not in body and "?" not in body:
            return r.expand_prefix(body)
        rx = re.compile("".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c)
            for c in pattern))
        lit = pattern.split("*", 1)[0].split("?", 1)[0]
        runs = [x for x in re.split(r"[*?]+", pattern) if len(x) >= 3]
        cands = r._dict_candidates(required=runs) if runs \
            else (r.expand_prefix(lit) if lit
                  else r._shape_candidates(r._wildcard_shape(pattern)))
        if runs and lit:
            cands = [t for t in cands if t.startswith(lit)]
        return [t for t in cands if rx.fullmatch(t)]

    def spell_candidates(self, term: str, max_edits: int) -> pa.Table:
        """Per-shard DirectSpellChecker partials: this shard's vocab
        matches within ``max_edits`` with LOCAL df — the coordinator
        unions the term sets and sums the dfs, which reproduces the
        single-index global ranking exactly."""
        from engine.query import _levenshtein

        r = self.reader
        # q-gram trigram prefilter (same superset bound as the
        # single-index fuzzy path) — sublinear shard-dictionary touch
        pool = r._fuzzy_candidates(term, max_edits)
        cands = [(t, _levenshtein(term, t, max_edits)) for t in pool]
        cands = [(t, d) for t, d in cands if 1 <= d <= max_edits]
        dfs = r._df_of([t for t, _ in cands])
        return pa.table({
            "term": pa.array([t for t, _ in cands], type=pa.string()),
            "dist": pa.array([d for _, d in cands], type=pa.int64()),
            "df": pa.array([int(dfs.get(t, 0)) for t, _ in cands],
                           type=pa.int64())})

    def terms_top(self, shard_limit: int,
                  prefix: str | None = None) -> tuple[list, int]:
        """Phase-A ``terms.limit`` partial (upstream
        ``TermsComponent`` distributed mode [U]): this shard's top
        ``shard_limit`` (term, local df) pairs — df desc, term asc —
        plus the cutoff bounding any unreturned term's local df.  At
        10⁹-term dictionaries this bounded page is the ONLY viable
        wire shape; the full (term, df) map never leaves the shard.
        Memoized per prefix: the sorted (term, df) list is computed
        once per actor and re-sliced on escalation."""
        key = prefix
        cached = getattr(self, "_terms_cache", None)
        if cached is not None and cached[0] == key:
            rows = cached[1]
        else:
            r = self.reader
            vocab = r.expand_prefix(prefix) if prefix \
                else r.vocabulary()
            dfs = r._df_of(vocab)
            rows = sorted(dfs.items(), key=lambda kv: (-kv[1], kv[0]))
            self._terms_cache = (key, rows)
        top = rows[:shard_limit]
        cutoff = int(rows[shard_limit][1]) if len(rows) > shard_limit \
            else 0
        return top, cutoff

    def terms_refine(self, values: list,
                     prefix: str | None = None) -> dict:
        """Phase-B ``terms.limit`` refinement: exact local dfs for
        the candidate terms this shard did not report (0 if absent),
        served from the memoized sorted list."""
        self.terms_top(0, prefix)          # ensure the memo is built
        dfs = dict(self._terms_cache[1])
        return {v: int(dfs.get(v, 0)) for v in values}

    def _matched_col_sorted(self, terms: list[str],
                            col: str) -> np.ndarray:
        """Sorted ``col`` values of the matched docset, memoized —
        one pruned scan per (query, col); every selection round after
        that is a binary search, never I/O."""
        key = (tuple(sorted(set(terms))), col)
        cached = getattr(self, "_colvals_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        import pyarrow.parquet as pq

        r = self.reader
        cand = self._matched_docset(terms)
        parts = []
        for f in r.manifest["input_files"]:
            t = pq.read_table(f, columns=[r.cfg.doc_id_col, col])
            ids = t[r.cfg.doc_id_col].to_numpy()
            m = np.isin(ids, cand, assume_unique=True)
            parts.append(t[col].to_numpy()[m])
        vals = np.sort(np.concatenate(parts)) if parts \
            else np.zeros(0, dtype=np.int64)
        self._colvals_cache = (key, vals)
        return vals

    def col_stats(self, terms: list[str], col: str) -> tuple:
        """(count, min, max) of the matched docset's ``col`` — the
        selection algorithm's phase-0 message."""
        v = self._matched_col_sorted(terms, col)
        if not len(v):
            return (0, None, None)
        return (int(len(v)), int(v[0]), int(v[-1]))

    def count_le(self, terms: list[str], col: str, x: int) -> int:
        """Rank partial: how many matched values are ≤ x — one
        ``searchsorted`` on the memoized sorted array, an O(log n)
        constant-size answer per selection round."""
        v = self._matched_col_sorted(terms, col)
        return int(np.searchsorted(v, x, side="right"))

    def facet_numbuckets_partial(self, terms: list[str],
                                 facet_col: str,
                                 p: int = 8) -> np.ndarray:
        """Distributed ``numBuckets`` partial (upstream JSON Facet
        API ``numBuckets`` under distribution — an HLL estimate, the
        documented semantics [U]): HyperLogLog registers over this
        shard's DISTINCT facet values of the matched docset.  The
        message is 2^p bytes-ish REGARDLESS of field cardinality —
        the fixed-size property that makes distributed distinct
        counting viable where shipping value sets is not.  Hash =
        md5-low-64 (DuckDB ``md5_number_lower``), so the merged
        estimate has an EXACT SQL oracle."""
        import hashlib
        import struct

        vals = self.facet_counts(terms, facet_col).keys()
        regs = np.zeros(1 << p, dtype=np.int64)
        for v in vals:
            h = struct.unpack(
                "<Q", hashlib.md5(str(v).encode()).digest()[8:])[0]
            idx = h >> (64 - p)
            rest = h & ((1 << (64 - p)) - 1)
            rho = (64 - p + 1) if rest == 0 \
                else (rest & -rest).bit_length()
            if rho > regs[idx]:
                regs[idx] = rho
        return regs

    def stats_full_partial(self, terms: list[str],
                           col: str) -> tuple:
        """Full StatsComponent partials: (count, Σ, Σ², min, max) of
        the matched docset's ``col`` — the sum-of-squares rides as an
        exact Python int (no f64 drift), so coordinator mean/stddev
        are computed from EXACT integer moments with one mirrored
        f64 divide each (upstream ``StatsValuesFactory`` fields
        mean/stddev/sumOfSquares [U])."""
        v = self._matched_col_sorted(terms, col)
        if not len(v):
            return (0, 0, 0, None, None)
        iv = [int(x) for x in v]          # Python bignums: exact
        return (len(iv), sum(iv), sum(x * x for x in iv),
                iv[0], iv[-1])

    def stats_partial(self, terms: list[str], col: str) -> tuple:
        """Per-shard StatsComponent partials (sum, min, max, count) of
        ``col`` over this shard's matched docset."""
        import pyarrow.parquet as pq

        r = self.reader
        terms = sorted(set(terms))
        subs = r.lookup(terms)
        arrays = [r._clause_arrays(t, subs[t])[0]
                  for t in terms if subs[t]]
        if not arrays:
            return (0, None, None, 0)
        cand = np.unique(np.concatenate(arrays))
        keep = r._keep(cand)
        if keep is not None:
            cand = cand[keep]
        s, lo, hi, c = 0, None, None, 0
        for f in r.manifest["input_files"]:
            t = pq.read_table(f, columns=[r.cfg.doc_id_col, col])
            ids = t[r.cfg.doc_id_col].to_numpy()
            m = np.isin(ids, cand, assume_unique=True)
            if not m.any():
                continue
            n = t[col].to_numpy()[m]
            s += int(n.sum())
            lo = int(n.min()) if lo is None else min(lo, int(n.min()))
            hi = int(n.max()) if hi is None else max(hi, int(n.max()))
            c += int(len(n))
        return (s, lo, hi, c)

    def _scored_all(self, query_text: str, weights: dict,
                    cache: np.ndarray) -> pa.Table:
        """Every matching doc scored under the given global weights,
        memoized per (query, weights) — the two rounds of distributed
        grouping share ONE postings decode per shard."""
        key = (query_text, tuple(sorted(weights.items())))
        cached = getattr(self, "_scored_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        r = self.reader
        terms = r.analyzer.query_terms(query_text)
        top = _score_shard(r, terms, weights, cache, k=max(r.N, 1))
        self._scored_cache = (key, top)
        return top

    def _doc_groups(self, ids: np.ndarray, group_col: str,
                    memo_key: tuple | None = None) -> dict:
        """doc_id → group value for the given matched ids, via a
        pruned 2-column scan of this shard's own input files —
        memoized under ``memo_key`` so grouping's second round reuses
        the first round's scan."""
        import pyarrow.parquet as pq

        if memo_key is not None:
            cached = getattr(self, "_groups_cache", None)
            if cached is not None and cached[0] == memo_key:
                return cached[1]
        r = self.reader
        gmap: dict = {}
        for f in r.manifest["input_files"]:
            t = pq.read_table(f, columns=[r.cfg.doc_id_col, group_col])
            fid = t[r.cfg.doc_id_col].to_numpy()
            m = np.isin(fid, ids, assume_unique=True)
            for d, v in zip(fid[m], np.asarray(
                    t[group_col].to_pylist(), dtype=object)[m]):
                gmap[int(d)] = v
        if memo_key is not None:
            self._groups_cache = (memo_key, gmap)
        return gmap

    def group_partial(self, query_text: str, group_col: str,
                      weights: dict, cache: np.ndarray) -> pa.Table:
        """Per-shard grouped-max partials (upstream grouping's
        distributed firstPhase [U]): every matching doc scored under
        the GLOBAL weights, rolled up per group value locally —
        (group, max f32 score, matched count). Coordinator merge
        (max-of-max, sum-of-count) is exact: disjoint shards."""
        top = self._scored_all(query_text, weights, cache)
        if not top.num_rows:
            return pa.table({group_col: pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float32())})
        ids = top["doc_id"].to_numpy()
        sc = top["score"].to_numpy()
        gmap = self._doc_groups(ids, group_col,
                                memo_key=(query_text, group_col))
        import pandas as pd
        df = pd.DataFrame({group_col: [gmap[int(d)] for d in ids],
                           "score": sc.astype(np.float32)})
        g = df.groupby(group_col, as_index=False).agg(
            n=("score", "size"), score=("score", "max"))
        return pa.Table.from_pandas(g[[group_col, "n", "score"]],
                                    preserve_index=False)

    def group_docs_partial(self, query_text: str, group_col: str,
                           groups: list, weights: dict,
                           cache: np.ndarray, limit: int) -> pa.Table:
        """Phase-2 TOP_GROUPS partial (upstream distributed grouping's
        ``TopGroupsShardRequestFactory`` second round [U]): for
        exactly the coordinator-selected ``groups``, this shard's top
        ``limit`` docs per group under the GLOBAL weights — shards own
        disjoint docs, so the coordinator's per-group merge of K·limit
        rows reproduces the single-index per-group ranking."""
        import pandas as pd

        empty = pa.table({group_col: pa.array([], type=pa.string()),
                          "doc_id": pa.array([], type=pa.int64()),
                          "score": pa.array([], type=pa.float32())})
        top = self._scored_all(query_text, weights, cache)
        if not top.num_rows:
            return empty
        ids = top["doc_id"].to_numpy()
        sc = top["score"].to_numpy()
        gmap = self._doc_groups(ids, group_col,
                                memo_key=(query_text, group_col))
        df = pd.DataFrame({group_col: [gmap[int(d)] for d in ids],
                           "doc_id": ids.astype(np.int64),
                           "score": sc.astype(np.float32)})
        df = df[df[group_col].isin(set(groups))]
        if not len(df):
            return empty
        df = df.sort_values(["score", "doc_id"],
                            ascending=[False, True], kind="mergesort")
        df = df.groupby(group_col, as_index=False, sort=False) \
               .head(limit)
        return pa.Table.from_pandas(
            df[[group_col, "doc_id", "score"]], preserve_index=False)

    def facet_counts(self, terms: list[str], facet_col: str,
                     filt: tuple | None = None) -> dict:
        """Per-shard facet partials (upstream ``FacetComponent``
        distributed phase [U]): matched docIDs from this shard's
        postings, mapped to facet values via the shard's OWN input
        files (pruned 2-column read) — shards own disjoint docs, so
        coordinator summing gives exact global counts, no refinement
        round needed.  Ships the FULL local count map: exact but
        wire-heavy at high facet cardinality — the ``facet.limit``
        path (:meth:`facet_top` / :meth:`facet_refine`) is the scale
        variant.  ``filt=(col, value)`` restricts the docset to rows
        where ``col == value`` (pivot sub-facets)."""
        return self._facet_cached((tuple(terms), facet_col, filt),
                                  terms, facet_col, None, filt)

    def _facet_cached(self, key: tuple, terms: list[str],
                      facet_col: str, stat_col: str | None,
                      filt: tuple | None) -> dict:
        """Bounded memo of facet scans (Solr's filterCache-backed
        docset reuse): the refinement round and every pivot bucket's
        phase-B hit the map computed in phase A instead of
        re-scanning."""
        cache = getattr(self, "_facet_cache", None)
        if cache is None:
            cache = self._facet_cache = {}
        got = cache.get(key)
        if got is not None:
            return got
        counts = self._facet_scan(terms, facet_col, stat_col, filt)
        if len(cache) >= 128:       # bounded: drop the oldest entry
            cache.pop(next(iter(cache)))
        cache[key] = counts
        return counts

    def facet_top(self, terms: list[str], facet_col: str,
                  shard_limit: int, filt: tuple | None = None
                  ) -> tuple[list, int]:
        """Phase-A partial under ``facet.limit`` (upstream
        ``FacetComponent`` distributed flow [U]): ONLY this shard's
        top ``shard_limit`` (value, count) pairs cross the wire —
        count desc, value asc, Solr's facet.sort=count — plus the
        shard's *cutoff*: the largest count any value NOT returned by
        this shard could have here (0 when the shard exhausted its
        values).  The coordinator uses Σ cutoffs as the
        threshold-algorithm bound on unseen values."""
        counts = self.facet_counts(terms, facet_col, filt)
        rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        top = rows[:shard_limit]
        cutoff = int(rows[shard_limit][1]) if len(rows) > shard_limit \
            else 0
        return top, cutoff

    def facet_refine(self, terms: list[str], facet_col: str,
                     values: list, filt: tuple | None = None) -> dict:
        """Phase-B refinement (upstream FacetComponent's
        ``facet.refine`` shard requests [U]): exact local counts for
        exactly the candidate values this shard did NOT report in
        phase A (0 for values absent here).  Served from the cached
        phase-A docset — no postings re-scan."""
        counts = self.facet_counts(terms, facet_col, filt)
        return {v: int(counts.get(v, 0)) for v in values}

    def _matched_docset(self, terms: list[str]) -> np.ndarray:
        """Live matched docIDs for the (deduped) terms, memoized —
        Solr's filterCache docset: every facet/pivot/stat scan of the
        same query reuses one postings decode."""
        terms = sorted(set(terms))
        key = tuple(terms)
        cached = getattr(self, "_docset_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        r = self.reader
        subs = r.lookup(terms)
        arrays = [r._clause_arrays(t, subs[t])[0]
                  for t in terms if subs[t]]
        if not arrays:
            cand = np.zeros(0, dtype=np.int64)
        else:
            cand = np.unique(np.concatenate(arrays))
            keep = r._keep(cand)
            if keep is not None:
                cand = cand[keep]
        self._docset_cache = (key, cand)
        return cand

    def _facet_scan(self, terms: list[str], facet_col: str,
                    stat_col: str | None = None,
                    filt: tuple | None = None) -> dict:
        """Matched-docset facet scan over this shard's own input
        files (pruned read).  Returns value → count, or — with
        ``stat_col`` — value → (count, Σ stat), the bucket partial a
        ``json.facet`` sub-aggregation needs.  ``filt=(col, value)``
        restricts to rows with ``col == value`` (pivot sub-facet)."""
        import pyarrow.parquet as pq

        r = self.reader
        cand = self._matched_docset(terms)
        if not len(cand):
            return {}
        counts: dict = {}
        cols = [r.cfg.doc_id_col, facet_col]
        if stat_col:
            cols.append(stat_col)
        if filt is not None and filt[0] not in cols:
            cols.append(filt[0])
        for f in r.manifest["input_files"]:
            t = pq.read_table(f, columns=cols)
            ids = t[r.cfg.doc_id_col].to_numpy()
            m = np.isin(ids, cand, assume_unique=True)
            if filt is not None:
                import pyarrow.compute as pc
                m &= pc.equal(t[filt[0]], filt[1]).fill_null(False) \
                    .to_numpy(zero_copy_only=False)
            hit = np.asarray(t[facet_col].to_pylist(), dtype=object)[m]
            # missing facet values are excluded (Solr's facet.missing
            # default); None in an object array breaks np.unique's sort
            ok = np.array([v is not None for v in hit], dtype=bool) \
                if len(hit) else np.zeros(0, dtype=bool)
            hit = hit[ok]
            if stat_col is None:
                vals, cnt = np.unique(hit, return_counts=True)
                for v, c in zip(vals, cnt):
                    counts[v] = counts.get(v, 0) + int(c)
            else:
                stat = t[stat_col].to_numpy()[m][ok]
                vals, inv, cnt = np.unique(hit, return_inverse=True,
                                           return_counts=True)
                sums = np.zeros(len(vals), dtype=np.int64)
                np.add.at(sums, inv, stat.astype(np.int64))
                for v, c, s in zip(vals, cnt, sums):
                    cur = counts.get(v, (0, 0))
                    counts[v] = (cur[0] + int(c), cur[1] + int(s))
        return counts

    def facet_stat_counts(self, terms: list[str], facet_col: str,
                          stat_col: str,
                          filt: tuple | None = None) -> dict:
        """Full local (count, Σ stat) map with the same bounded
        docset reuse as :meth:`facet_counts`."""
        return self._facet_cached(
            (tuple(terms), facet_col, stat_col, filt),
            terms, facet_col, stat_col, filt)

    def facet_top_stats(self, terms: list[str], facet_col: str,
                        stat_col: str, shard_limit: int,
                        filt: tuple | None = None) -> tuple[list, int]:
        """Phase-A ``json.facet`` partial: local top ``shard_limit``
        buckets BY COUNT, each carrying its (count, Σ stat) partial,
        plus the count cutoff for the unseen-value bound (bucket
        *selection* is by count; the stat rides along and is refined
        with the bucket)."""
        counts = self.facet_stat_counts(terms, facet_col, stat_col,
                                        filt)
        rows = sorted(counts.items(),
                      key=lambda kv: (-kv[1][0], kv[0]))
        top = [(v, c, s) for v, (c, s) in rows[:shard_limit]]
        cutoff = int(rows[shard_limit][1][0]) \
            if len(rows) > shard_limit else 0
        return top, cutoff

    def facet_refine_stats(self, terms: list[str], facet_col: str,
                           stat_col: str, values: list,
                           filt: tuple | None = None) -> dict:
        """Phase-B ``json.facet`` refinement (upstream
        ``FacetRequest.Refinement`` [U]): exact local (count, Σ stat)
        for the candidate buckets this shard did not report — the
        sub-aggregation refines WITH the bucket, so merged stats are
        exact, not partial-sum approximations."""
        counts = self.facet_stat_counts(terms, facet_col, stat_col,
                                        filt)
        return {v: counts.get(v, (0, 0)) for v in values}


class DistributedSearcher:
    """Coordinator over K ShardSearcher actors (upstream
    ``SearchHandler`` shard fan-out [U])."""

    def __init__(self, shard_dirs: list[str], preload: bool = True,
                 k1: float = 1.2, b: float = 0.75,
                 _actors: list | None = None):
        self.shards = _actors if _actors is not None else \
            [ShardSearcher.remote(d, preload) for d in shard_dirs]
        stats = ray.get([s.collection_stats.remote()
                         for s in self.shards])
        self.N = sum(n for n, _ in stats)
        sum_cf = sum(c for _, c in stats)
        self.avgdl = (sum_cf / self.N) if self.N else 0.0
        # borrow any shard's analyzer config (all shards share one);
        # borrow any shard's config (all shards share one schema);
        # omitNorms propagates from that shared schema
        _r0 = IndexReader(shard_dirs[0])
        self._k1, self._b = float(k1), float(b)
        self._omit_norms = bool(_r0.cfg.omit_norms)
        if self._omit_norms:
            self.cache = np.full(256, float(k1), dtype=np.float64)
        else:
            self.cache = norm_cache(self.avgdl, k1, b)
        # term -> global df, filled by fully-successful phase-0 rounds;
        # tolerant rounds with a dead shard serve these STALE stats
        # (Solr's ExactStatsCache behavior for missing shards) so that
        # surviving shards' scores are unchanged from the full run.
        self._df_cache: dict[str, int] = {}
        self._analyzer = _r0.analyzer
        # phase-2 routing table: per-shard stored-field docID bounds,
        # fetched lazily and re-fetched when the shard list changes
        # (failover promotion swaps actors) — see _route_phase2 (r5)
        self._fetch_bounds: list | None = None
        self._fetch_bounds_for: tuple = ()

    def _route_phase2(self, ids: np.ndarray, submit) -> list:
        """Owner-routed phase-2 scatter (the K=16 fetch-tail fix,
        VERDICT r4 item 8): each shard receives ONLY the ids inside
        its stored-field docID bounds, and shards owning none of the
        page's ids are not called at all — one RPC per OWNING shard
        per page instead of a broadcast to all K. Bounds are exact
        ownership for doc-range sharding and a safe superset for any
        other layout (every id still reaches its owner; non-owners
        filter to empty, so the union is unchanged). Falls back to
        the full broadcast for shards with no stored bounds."""
        key = tuple(id(s) for s in self.shards)
        if self._fetch_bounds is None or \
                self._fetch_bounds_for != key:
            self._fetch_bounds = ray.get(
                [s.doc_bounds.remote() for s in self.shards])
            self._fetch_bounds_for = key
        refs = []
        for s, b in zip(self.shards, self._fetch_bounds):
            sub = ids if b is None else \
                ids[(ids >= b[0]) & (ids <= b[1])]
            if len(sub):
                refs.append(submit(s, sub))
        return refs

    def _gather(self, refs: list, tolerant: bool) -> tuple[list, int]:
        """ray.get with per-shard fault isolation. tolerant=False:
        any shard failure propagates (Solr's default). tolerant=True
        (``shards.tolerant=true`` [U]): dead shards are skipped and
        the caller marks the response partial."""
        if not tolerant:
            return ray.get(refs), 0
        out, failed = [], 0
        for ref in refs:
            try:
                out.append(ray.get(ref))
            except Exception:  # noqa: BLE001 — actor death/network
                failed += 1
        return out, failed

    def topk(self, query_text: str, k: int = 10,
             tolerant: bool = False,
             after: tuple | None = None) -> pa.Table:
        """Distributed top-k. With ``tolerant=True`` a dead shard is
        skipped (upstream ``shards.tolerant`` partial results): the
        response carries ``partial=true`` metadata and covers the
        surviving shards; collection stats stay the coordinator's
        cached globals, like Solr serving stale stats for missing
        shards.  ``after=(score, doc_id)`` is the cursorMark filter —
        each shard returns only its k best docs strictly after the
        cursor, so page depth never inflates the wire cost."""
        terms = self._analyzer.query_terms(query_text)
        if not terms:
            return _topdocs_table([], [])
        uniq_terms = sorted(set(terms))
        # phase 0: global df from per-shard partials
        partials, fail0 = self._gather(
            [s.term_stats.remote(uniq_terms) for s in self.shards],
            tolerant)
        gdf: dict[str, int] = {}
        for p in partials:
            for t, (df, _) in p.items():
                gdf[t] = gdf.get(t, 0) + df
        if fail0 == 0:
            self._df_cache.update(gdf)
            for t in uniq_terms:          # df=0 terms are also stats
                self._df_cache.setdefault(t, 0)
        else:
            # stale-stats: a missing shard's df contribution is
            # unknowable this round — prefer the last full-round
            # global df so surviving docs score identically.
            for t in list(gdf):
                if t in self._df_cache:
                    gdf[t] = self._df_cache[t]
        weights = {t: float(idf(self.N, df)) for t, df in gdf.items()}
        # phase 1: shard-local scoring under global stats
        tops, fail1 = self._gather(
            [s.score.remote(terms, weights, self.cache, k, after)
             for s in self.shards], tolerant)
        n_failed = max(fail0, fail1)
        # numFound from metadata of EVERY response — a shard whose
        # post-cursor page is empty still reports its match count, so
        # total_hits stays page-invariant across a cursor walk
        total = sum(_shard_total(t) for t in tops)
        tops = [t for t in tops if t.num_rows]
        if not tops:
            out = _topdocs_table([], [])
            return out.replace_schema_metadata(
                {"partial": "true"}) if n_failed else out
        allt = pa.concat_tables(tops)
        ids = allt["doc_id"].to_numpy()
        sc = allt["score"].to_numpy()
        order = np.lexsort((ids, -sc))[:k]
        out = _topdocs_table(ids[order], sc[order], total=total)
        if n_failed:
            out = out.replace_schema_metadata({"partial": "true"})
        return out

    def _score_merge(self, terms: list[str], weights: dict,
                     k: int) -> pa.Table:
        """Fan out an explicit term list under the given global
        weights and merge the shard top-k's (score desc, docID asc)."""
        tops = ray.get([s.score.remote(terms, weights, self.cache, k)
                        for s in self.shards])
        total = sum(_shard_total(t) for t in tops)
        tops = [t for t in tops if t.num_rows]
        if not tops:
            return _topdocs_table([], [])
        allt = pa.concat_tables(tops)
        ids = allt["doc_id"].to_numpy()
        sc = allt["score"].to_numpy()
        order = np.lexsort((ids, -sc))[:k]
        return _topdocs_table(ids[order], sc[order], total=total)

    def phrase_topk(self, phrase: str, k: int = 10) -> pa.Table:
        """Distributed exact PhraseQuery (upstream PhraseQuery under
        distributed search [U]): documents are whole within a shard,
        so matching is shard-local; phase 0 sums per-shard dfs into
        the GLOBAL phrase weight (Σ f32 idf, Lucene's summed phrase
        termStatistics) and phase 1 fans that weight + the global
        norm cache out — the merge is bit-identical to the
        single-index :meth:`IndexReader.phrase_topk`."""
        terms = self._analyzer.query_terms(phrase)
        if not terms:
            return _topdocs_table([], [])
        uniq_terms = sorted(set(terms))
        partials = ray.get(
            [s.term_stats.remote(uniq_terms) for s in self.shards])
        gdf: dict[str, int] = {}
        for p in partials:
            for t, (df, _) in p.items():
                gdf[t] = gdf.get(t, 0) + df
        if any(gdf.get(t, 0) == 0 for t in terms):
            return _topdocs_table([], [])
        w64 = 0.0
        for t in terms:     # left-to-right f64 sum of f32 idfs
            w64 += float(idf(self.N, gdf[t]))
        tops = ray.get([
            s.phrase_partial.remote(terms, w64, self.cache, k)
            for s in self.shards])
        total = sum(_shard_total(t) for t in tops)
        tops = [t for t in tops if t.num_rows]
        if not tops:
            return _topdocs_table([], [])
        allt = pa.concat_tables(tops)
        ids = allt["doc_id"].to_numpy()
        sc = allt["score"].to_numpy()
        order = np.lexsort((ids, -sc))[:k]
        return _topdocs_table(ids[order], sc[order], total=total)

    def sloppy_phrase_n_topk(self, terms: list[str], slop: int,
                             k: int = 10) -> pa.Table:
        """Distributed n-term sloppy phrase with Lucene's
        1/(distance+1) sloppy weight — shard-local positional DP under
        the coordinator's global phrase weight; merge bit-identical to
        the single-index :meth:`IndexReader.sloppy_phrase_n_topk`."""
        uniq_terms = sorted(set(terms))
        partials = ray.get(
            [s.term_stats.remote(uniq_terms) for s in self.shards])
        gdf: dict[str, int] = {}
        for p in partials:
            for t, (df, _) in p.items():
                gdf[t] = gdf.get(t, 0) + df
        if any(gdf.get(t, 0) == 0 for t in terms):
            return _topdocs_table([], [])
        w64 = 0.0
        for t in terms:
            w64 = w64 + float(idf(self.N, gdf[t]))
        tops = ray.get([
            s.sloppy_n_partial.remote(terms, slop, w64, self.cache, k)
            for s in self.shards])
        total = sum(_shard_total(t) for t in tops)
        tops = [t for t in tops if t.num_rows]
        if not tops:
            return _topdocs_table([], [])
        allt = pa.concat_tables(tops)
        ids = allt["doc_id"].to_numpy()
        sc = allt["score"].to_numpy()
        order = np.lexsort((ids, -sc))[:k]
        return _topdocs_table(ids[order], sc[order], total=total)

    def span_near_topk(self, terms: list[str], slop: int,
                       k: int = 10) -> pa.Table:
        """Distributed ordered SpanNearQuery — shard-local chain DP
        under the coordinator's global weight; merge bit-identical to
        the single-index :meth:`IndexReader.span_near_topk`."""
        uniq_terms = sorted(set(terms))
        partials = ray.get(
            [s.term_stats.remote(uniq_terms) for s in self.shards])
        gdf: dict[str, int] = {}
        for p in partials:
            for t, (df, _) in p.items():
                gdf[t] = gdf.get(t, 0) + df
        if any(gdf.get(t, 0) == 0 for t in terms):
            return _topdocs_table([], [])
        w64 = 0.0
        for t in terms:
            w64 = w64 + float(idf(self.N, gdf[t]))
        tops = ray.get([
            s.span_near_partial.remote(terms, slop, w64, self.cache, k)
            for s in self.shards])
        total = sum(_shard_total(t) for t in tops)
        tops = [t for t in tops if t.num_rows]
        if not tops:
            return _topdocs_table([], [])
        allt = pa.concat_tables(tops)
        ids = allt["doc_id"].to_numpy()
        sc = allt["score"].to_numpy()
        order = np.lexsort((ids, -sc))[:k]
        return _topdocs_table(ids[order], sc[order], total=total)

    def wildcard_topk(self, pattern: str, k: int = 10) -> pa.Table:
        """Distributed WildcardQuery with a GLOBALLY consistent
        rewrite (scoring_boolean form): per-shard dictionary matches
        unioned, ONE expansion set broadcast under global IDF —
        bit-identical to the single-index ``wildcard_topk``."""
        return self._multi_term_topk("wildcard", pattern, k)

    def regexp_topk(self, pattern: str, k: int = 10) -> pa.Table:
        """Distributed RegexpQuery, globally consistent rewrite —
        bit-identical to the single-index ``regexp_topk``."""
        return self._multi_term_topk("regexp", pattern, k)

    def _multi_term_topk(self, kind: str, pattern: str,
                         k: int) -> pa.Table:
        parts = ray.get([s.pattern_candidates.remote(kind, pattern)
                         for s in self.shards])
        terms = sorted({t for p in parts for t in p})
        if not terms:
            return _topdocs_table([], [])
        weights = self._global_weights(terms)
        terms = [t for t in terms if t in weights]
        if not terms:
            return _topdocs_table([], [])
        return self._score_merge(terms, weights, k)

    def fuzzy_topk(self, term: str, k: int = 10,
                   max_edits: int = 1) -> pa.Table:
        """Distributed FuzzyQuery with a GLOBALLY consistent rewrite
        (upstream ``FuzzyQuery`` under distributed search [U]): stock
        SolrCloud rewrites multi-term queries per shard against each
        LOCAL dictionary — a shard that lacks a variant simply never
        scores it, a documented cloud/single-node inconsistency.
        Here phase 0 unions the per-shard vocabulary matches (the
        same candidate partials the distributed spellchecker ships),
        adds the query term itself when any shard knows it, and
        broadcasts ONE expansion set with global-IDF weights — so
        every shard scores the same clauses and the merge is
        bit-identical to the single-index ``fuzzy_topk``."""
        parts = ray.get([s.spell_candidates.remote(term, max_edits)
                         for s in self.shards])
        cands = sorted({t for p in parts
                        for t in p["term"].to_pylist()} | {term})
        weights = self._global_weights(cands)
        terms = [t for t in cands if t in weights]
        if not terms:
            return _topdocs_table([], [])
        return self._score_merge(terms, weights, k)

    def cursor_page(self, query_text: str, k: int = 10,
                    cursor: tuple | None = None
                    ) -> tuple[pa.Table, tuple | None]:
        """Distributed cursorMark deep paging (upstream Solr
        ``cursorMark`` / ``CursorFieldValues`` [U]): the cursor
        encodes the last row's sort position ``(score, doc_id)`` plus
        the running rank, each shard filters BEFORE its local top-k,
        and every page — first or ten-thousandth — costs exactly
        K·k rows on the wire (``start+rows`` paging ships
        K·(start+rows), which is why cursorMark exists).  Returns
        (page, next_cursor); next_cursor is None once a short page
        signals exhaustion.  total_hits stays the page-invariant full
        match count; ranks continue across pages."""
        after = (cursor[0], cursor[1]) if cursor else None
        base = cursor[2] if cursor else 0
        top = self.topk(query_text, k, after=after)
        n = top.num_rows
        if n:
            ranks = pa.array(np.arange(base, base + n,
                                       dtype=np.int32))
            top = top.set_column(0, "rank", ranks)
        nxt = None
        if n == k:
            nxt = (float(top["score"][n - 1].as_py()),
                   int(top["doc_id"][n - 1].as_py()), base + n)
        return top, nxt

    def topk_fetch(self, query_text: str, k: int = 10) -> pa.Table:
        """Full two-phase distributed search (upstream
        ``SearchHandler``/``QueryComponent`` [U]): phase 1 merges
        ids+scores under global IDF (:meth:`topk`), phase 2 scatters
        the winning id list to the shards for stored-field row-range
        fetches and stitches the text back in rank order. Each shard
        returns only ids it owns, so the union is exact."""
        top = self.topk(query_text, k)
        if not top.num_rows:
            return top.append_column("text",
                                     pa.array([], type=pa.string()))
        ids = top["doc_id"].to_numpy()
        parts = ray.get(self._route_phase2(
            ids, lambda s, sub: s.fetch.remote(sub)))
        fetched = pa.concat_tables([p for p in parts if p.num_rows])
        import pyarrow.compute as pc
        pos = pc.index_in(top["doc_id"], value_set=fetched["doc_id"])
        return top.append_column("text", fetched["text"].take(pos))

    def highlight_topk(self, query_text: str, k: int = 10,
                       window: int = 3) -> pa.Table:
        """Distributed highlighting (upstream ``HighlightComponent``
        second round [U]): phase 1 merges global-IDF ids+scores, the
        winning id list is scattered, and each OWNER shard computes
        its docs' snippets next to the stored fields — only (id,
        snippet) rows return, never document text.  Output equals the
        single-index ``highlight_topk`` (same deterministic snippet
        spec, same analyzer, same stored fields)."""
        top = self.topk(query_text, k)
        if not top.num_rows:
            return top.append_column(
                "snippet", pa.array([], type=pa.string()))
        ids = top["doc_id"].to_numpy()
        qterms = sorted(set(self._analyzer.query_terms(query_text)))
        parts = ray.get(self._route_phase2(
            ids, lambda s, sub: s.highlight.remote(sub, qterms,
                                                   window)))
        smap: dict = {}
        for p in parts:
            for d, s in zip(p["doc_id"].to_pylist(),
                            p["snippet"].to_pylist()):
                smap[d] = s
        return pa.table({
            "rank": top["rank"], "doc_id": top["doc_id"],
            "score": top["score"],
            "snippet": pa.array([smap.get(int(d), "")
                                 for d in ids], type=pa.string())})

    def rerank_topk(self, query_text: str, rerank_text: str,
                    k: int = 10, rerank_docs: int = 30,
                    rerank_weight: float = 2.0) -> pa.Table:
        """Distributed ReRank (upstream ``ReRankQParserPlugin`` in
        SolrCloud [U], done coordinator-exact): pass 1 is the
        global-IDF distributed top-``rerank_docs`` window (already
        bit-identical to a single index); pass 2 broadcasts the
        window's docIDs with the rerank terms' GLOBAL weights and
        each shard probes only its own postings at those ids.  The
        combine (f32 window score + weight × f32 rerank sum, one
        final f32 cast) mirrors :meth:`IndexReader.rerank_topk`
        bit-for-bit, so the merged page equals the single-index
        rerank — unlike stock Solr, whose per-shard rerank windows
        are a documented approximation."""
        top = self.topk(query_text, rerank_docs)
        if not top.num_rows:
            return _topdocs_table([], [])
        ids = top["doc_id"].to_numpy()
        score = top["score"].to_numpy()
        rr_terms = sorted(set(self._analyzer.query_terms(rerank_text)))
        weights = self._global_weights(rr_terms)
        parts = ray.get([s.rerank_window.remote(
            ids, rr_terms, weights, self.cache)
            for s in self.shards])
        rrmap: dict = {}
        for p in parts:
            for d, v in zip(p["doc_id"].to_pylist(),
                            p["rr"].to_pylist()):
                rrmap[d] = v
        rr32 = np.array([rrmap.get(int(d), 0.0) for d in ids],
                        dtype=np.float64).astype(np.float32)
        final = (score.astype(np.float64)
                 + rerank_weight * rr32.astype(np.float64)
                 ).astype(np.float32)
        order = np.lexsort((ids, -final))[:k]
        return _topdocs_table(ids[order], final[order],
                              total=len(ids))

    def facet(self, query_text: str, facet_col: str) -> pa.Table:
        """Distributed query-scoped faceting: per-shard (value, count)
        partials summed by the coordinator — exact global counts in
        one round (disjoint shards ⇒ Solr's refinement phase is a
        no-op here)."""
        terms = self._analyzer.query_terms(query_text)
        parts = ray.get([s.facet_counts.remote(terms, facet_col)
                         for s in self.shards])
        agg: dict = {}
        for p in parts:
            for v, c in p.items():
                agg[v] = agg.get(v, 0) + c
        vals = sorted(agg)
        return pa.table({facet_col: pa.array(vals, type=pa.string()),
                         "n": pa.array([agg[v] for v in vals],
                                       type=pa.int64())})

    def facet_topk(self, query_text: str, facet_col: str, k: int = 10,
                   overrequest: int | None = None) -> pa.Table:
        """Two-phase distributed ``facet.limit`` faceting (upstream
        ``FacetComponent`` refinement protocol [U]).  Unlike
        :meth:`facet`, shards never ship their full count map — the
        realistic contract when the facet field has millions of
        values:

          phase A  every shard returns its local top
                   ``k + overrequest`` (value, count) pairs (Solr's
                   default overrequest ``limit/2 + 10``) plus its
                   local cutoff — the best count an unreturned value
                   could have on that shard;
          merge    the coordinator unions the candidates; a candidate
                   missing from some shard has an incomplete sum;
          phase B  refinement requests fan out carrying, per shard,
                   exactly the candidates that shard did not report;
                   shards answer from their cached phase-A docset.

        After refinement every candidate's global count is exact.
        Solr stops there (bucket *selection* can in principle still
        miss a value below every shard's cutoff); this implementation
        additionally applies the threshold-algorithm acceptance test
        (Fagin et al. 2001): an unseen value's count is ≤ Σ shard
        cutoffs, so if that bound is strictly below the k-th
        candidate's count the top-k is PROVABLY exact — otherwise the
        shard limit doubles and the round repeats (terminates: limits
        eventually exhaust every shard and the bound hits 0).
        ``last_facet_rounds`` / ``last_refine_values`` expose the
        protocol's work for tests and audits."""
        rows = self._facet_limit(
            self._analyzer.query_terms(query_text), facet_col, None,
            k, overrequest)
        return pa.table({
            facet_col: pa.array([v for v, _, _ in rows],
                                type=pa.string()),
            "n": pa.array([c for _, c, _ in rows], type=pa.int64())})

    def facet_topk_stats(self, query_text: str, facet_col: str,
                         stat_col: str, k: int = 10,
                         overrequest: int | None = None,
                         avg_name: str = "avg_stat") -> pa.Table:
        """Distributed ``json.facet`` with a sub-aggregation under
        ``limit`` (upstream JSON Facet API distributed refinement,
        ``FacetRequest.Refinement`` [U]): the same two-phase
        refinement protocol as :meth:`facet_topk`, but every bucket
        carries its (count, Σ ``stat_col``) partial and refinement
        requests return BOTH — Solr's key guarantee that a refined
        bucket's sub-stats are exact, never the sum of only the
        shards that happened to report the bucket in phase A.
        Buckets rank by count (desc, value asc); the avg is emitted
        as ``avg_name``."""
        rows = self._facet_limit(
            self._analyzer.query_terms(query_text), facet_col,
            stat_col, k, overrequest)
        return pa.table({
            facet_col: pa.array([v for v, _, _ in rows],
                                type=pa.string()),
            "n": pa.array([c for _, c, _ in rows], type=pa.int64()),
            # float(s)/float(c) mirrors SQL's cast-then-divide (the
            # oracle computes s::DOUBLE / c::DOUBLE); Python's exact
            # rational s/c diverges once |s| > 2^53
            avg_name: pa.array([float(s) / float(c) for _, c, s in rows],
                               type=pa.float64())})

    def _facet_limit(self, terms: list[str], facet_col: str,
                     stat_col: str | None, k: int,
                     overrequest: int | None,
                     filt: tuple | None = None) -> list[tuple]:
        """Single-facet wrapper over :meth:`_facet_limit_multi`."""
        return self._facet_limit_multi(terms, facet_col, stat_col, k,
                                       overrequest, [filt])[0]

    def _facet_limit_multi(self, terms: list[str], facet_col: str,
                           stat_col: str | None, k: int,
                           overrequest: int | None,
                           filts: list) -> list[list[tuple]]:
        """Shared facet.limit refinement loop over MANY facets at once
        (each ``filts[j]`` is an independent docset restriction, e.g.
        one pivot bucket; None = unrestricted).  Both waves of each
        round fan out for every unsettled facet × shard in one batch —
        the pivot analog of Solr sending ONE refinement request per
        shard carrying all buckets.  Returns, per facet, the
        provably-exact [(value, count, Σstat)] top-k (Σstat = 0 when
        ``stat_col`` is None; acceptance via the Σ-cutoffs bound on
        unseen values, escalating the shard limit until exact)."""
        base = k + (overrequest if overrequest is not None
                    else k // 2 + 10)
        limits = [base] * len(filts)
        pending = set(range(len(filts)))
        results: list = [[] for _ in filts]
        self.last_facet_rounds = 0
        self.last_refine_values = 0
        while pending:
            self.last_facet_rounds += 1
            order = sorted(pending)
            # wave 1 — phase A for every pending facet × shard
            refs = []
            for j in order:
                for s in self.shards:
                    if stat_col is None:
                        refs.append(s.facet_top.remote(
                            terms, facet_col, limits[j], filts[j]))
                    else:
                        refs.append(s.facet_top_stats.remote(
                            terms, facet_col, stat_col, limits[j],
                            filts[j]))
            flat = iter(ray.get(refs))
            state = {}
            for j in order:
                parts = [next(flat) for _ in self.shards]
                if stat_col is None:
                    seen = [{v: (c, 0) for v, c in p[0]}
                            for p in parts]
                else:
                    seen = [{v: (c, st) for v, c, st in p[0]}
                            for p in parts]
                bound = sum(p[1] for p in parts)
                cand = sorted(set().union(*(set(d) for d in seen)))
                need = [[v for v in cand if v not in d] for d in seen]
                state[j] = (seen, bound, cand, need)
            # wave 2 — phase B refinement, batched across facets
            refs2, owners = [], []
            for j in order:
                _, _, _, need = state[j]
                for i, miss in enumerate(need):
                    if not miss:
                        continue
                    if stat_col is None:
                        refs2.append(self.shards[i].facet_refine
                                     .remote(terms, facet_col, miss,
                                             filts[j]))
                    else:
                        refs2.append(self.shards[i].facet_refine_stats
                                     .remote(terms, facet_col,
                                             stat_col, miss,
                                             filts[j]))
                    owners.append((j, i))
                    self.last_refine_values += len(miss)
            extras: dict = {}
            for (j, i), ans in zip(owners, ray.get(refs2)):
                extras[(j, i)] = ans
            # finalize — accept provably-exact facets, escalate rest
            for j in order:
                seen, bound, cand, need = state[j]
                totals: dict = {v: (0, 0) for v in cand}
                for i, d in enumerate(seen):
                    extra = extras.get((j, i), {})
                    for v in cand:
                        got = d.get(v)
                        if got is None:
                            got = extra.get(v, 0)
                            if not isinstance(got, tuple):
                                got = (got, 0)
                        c0, s0 = totals[v]
                        totals[v] = (c0 + got[0], s0 + got[1])
                ranked = sorted(totals.items(),
                                key=lambda kv: (-kv[1][0], kv[0]))
                # unseen value with count == kth could still win the
                # value-asc tie-break, hence the STRICT inequality
                ok = (len(ranked) >= k and bound < ranked[k - 1][1][0]) \
                    or (len(ranked) < k and bound == 0)
                if ok:
                    results[j] = [(v, c, s)
                                  for v, (c, s) in ranked[:k]]
                    pending.discard(j)
                else:
                    limits[j] *= 2
        return results

    def pivot_facet(self, query_text: str, col_a: str, col_b: str,
                    k_a: int = 5, k_b: int = 3,
                    overrequest: int | None = None) -> pa.Table:
        """Distributed two-level pivot faceting (upstream
        ``facet.pivot`` distributed refinement,
        ``S/handler/component/PivotFacetProcessor`` [U]): level 1
        elects the exact top ``k_a`` buckets of ``col_a`` under the
        refinement protocol; level 2 runs one refinement loop over
        ALL elected buckets at once — each bucket's ``col_b``
        sub-facet restricted to that bucket's docset — with phase-A
        and refinement requests for every bucket batched into the
        same shard waves.  Rows come out (a, n_a, b, n_b) ordered by
        level-1 rank then level-2 rank, every count exact."""
        terms = self._analyzer.query_terms(query_text)
        top_a = self._facet_limit(terms, col_a, None, k_a,
                                  overrequest)
        subs = self._facet_limit_multi(
            terms, col_b, None, k_b, overrequest,
            [(col_a, v) for v, _, _ in top_a])
        rows = [(va, ca, vb, cb)
                for (va, ca, _), sub in zip(top_a, subs)
                for (vb, cb, _) in sub]
        return pa.table({
            col_a: pa.array([r[0] for r in rows], type=pa.string()),
            "n_a": pa.array([r[1] for r in rows], type=pa.int64()),
            col_b: pa.array([r[2] for r in rows], type=pa.string()),
            "n_b": pa.array([r[3] for r in rows], type=pa.int64())})

    def facet_numbuckets(self, query_text: str,
                         facet_col: str) -> pa.Table:
        """Distributed ``numBuckets`` (upstream JSON Facet API [U]):
        per-shard HLL register partials over distinct matched facet
        values, max-merged — registers are a lattice, so the merge is
        exact over the UNION of shard value sets and the estimate
        equals a single-node HLL of the global value set.  Raw
        (uncorrected) estimator with the shared precomputed f64
        numerator, matching the repo's md5-HLL oracle arithmetic."""
        from engine.registry import _HLL_NUM, HLL_MD5_P

        terms = self._analyzer.query_terms(query_text)
        parts = ray.get([
            s.facet_numbuckets_partial.remote(terms, facet_col,
                                              HLL_MD5_P)
            for s in self.shards])
        regs = np.maximum.reduce(parts)
        s = sum(1 << (57 - int(r)) for r in regs)
        n = int(np.floor(_HLL_NUM / float(s) + 0.5))
        return pa.table({"n_buckets": pa.array([n],
                                               type=pa.int64())})

    def terms_topk(self, k: int = 10, prefix: str | None = None,
                   overrequest: int | None = None) -> pa.Table:
        """Distributed TermsComponent under ``terms.limit`` (upstream
        ``TermsComponent`` distributed mode + ``terms.limit`` [U]):
        the refinement protocol applied to the TERM DICTIONARY — the
        structure that actually reaches 10⁹ entries at corpus scale,
        where shipping full per-shard term maps (what stock Solr's
        distributed TermsComponent does, documenting approximate
        counts instead) is impossible.  Same two-phase shape as
        :meth:`facet_topk`: shard-local top-(k+overrequest) by df +
        cutoff, refinement for unreported candidates, Σ-cutoffs bound
        escalating until the global top-k by summed df is provably
        exact (doc-disjoint shards ⇒ global df = Σ local dfs)."""
        shard_limit = k + (overrequest if overrequest is not None
                           else k // 2 + 10)
        self.last_facet_rounds = 0
        self.last_refine_values = 0
        while True:
            self.last_facet_rounds += 1
            parts = ray.get([
                s.terms_top.remote(shard_limit, prefix)
                for s in self.shards])
            seen = [dict(p[0]) for p in parts]
            bound = sum(p[1] for p in parts)
            cand = sorted(set().union(*(set(d) for d in seen)))
            need = [[v for v in cand if v not in d] for d in seen]
            refs = [self.shards[i].terms_refine.remote(miss, prefix)
                    for i, miss in enumerate(need) if miss]
            self.last_refine_values += sum(len(m) for m in need)
            refined = iter(ray.get(refs))
            totals: dict = {v: 0 for v in cand}
            for i, d in enumerate(seen):
                extra = next(refined) if need[i] else {}
                for v in cand:
                    totals[v] += d.get(v, extra.get(v, 0))
            ranked = sorted(totals.items(),
                            key=lambda kv: (-kv[1], kv[0]))
            if len(ranked) >= k:
                if bound < ranked[k - 1][1]:
                    break
            elif bound == 0:
                break
            shard_limit *= 2
        rows = ranked[:k]
        return pa.table({
            "term": pa.array([v for v, _ in rows], type=pa.string()),
            "df": pa.array([c for _, c in rows], type=pa.int64())})

    def spellcheck(self, term: str, k: int = 5,
                   max_edits: int = 2) -> pa.Table:
        """Distributed spellcheck (upstream ``SpellCheckComponent``
        shard merge [U]): per-shard (term, dist, local df) partials,
        coordinator sums dfs per term and applies the single-node
        ranking (dist asc, df desc, term asc) — exact, since global
        df = Σ shard dfs and the candidate set is the vocab union."""
        parts = ray.get([s.spell_candidates.remote(term, max_edits)
                         for s in self.shards])
        agg: dict = {}
        for p in parts:
            for t, d, df in zip(p["term"].to_pylist(),
                                p["dist"].to_pylist(),
                                p["df"].to_pylist()):
                cur = agg.get(t)
                agg[t] = (d, (cur[1] if cur else 0) + df)
        rows = sorted(((t, d, df) for t, (d, df) in agg.items()),
                      key=lambda r: (r[1], -r[2], r[0]))[:k]
        return pa.table({
            "term": pa.array([r[0] for r in rows], type=pa.string()),
            "dist": pa.array([r[1] for r in rows], type=pa.int64()),
            "df": pa.array([r[2] for r in rows], type=pa.int64())})

    def _global_dfs(self, terms: list[str]) -> dict:
        """Phase-0 global document frequencies (df summed over the
        doc-disjoint shards ⇒ exactly the single-index dfs)."""
        uniq_terms = sorted(set(terms))
        partials = ray.get([s.term_stats.remote(uniq_terms)
                            for s in self.shards])
        gdf: dict = {}
        for p in partials:
            for t, (df, _) in p.items():
                gdf[t] = gdf.get(t, 0) + df
        return gdf

    def _global_weights(self, terms: list[str]) -> dict:
        """Phase-0 global-IDF weights (df summed over shards)."""
        return {t: float(idf(self.N, df))
                for t, df in self._global_dfs(terms).items()}

    def mlt_topk(self, doc_id: int, k: int = 10, max_terms: int = 5,
                 min_df: int = 2) -> pa.Table:
        """Distributed MoreLikeThis (upstream ``MoreLikeThis`` [U]):
        SolrCloud's MLT is documented as unsupported/approximate in
        distributed mode — seed term selection runs against ONE
        shard's local statistics.  Here the seed's stored text comes
        from its owner shard (scatter fetch, only the owner answers),
        term *selection* uses GLOBAL dfs (lowest df ≥ min_df, term-asc
        tie-break — identical to the single index since global df =
        Σ shard dfs), and the scoring disjunction runs under global
        IDF — so the result is bit-identical to single-index MLT."""
        parts = ray.get(self._route_phase2(
            np.array([doc_id], dtype=np.int64),
            lambda s, sub: s.fetch.remote(sub)))
        stored = [p for p in parts if p.num_rows]
        if not stored:
            return _topdocs_table([], [])
        text = stored[0]["text"][0].as_py()
        terms = sorted(set(self._analyzer.query_terms(text)))
        gdf = self._global_dfs(terms)
        cand = sorted((df, t) for t, df in gdf.items()
                      if df >= min_df)
        sel = [t for _, t in cand[:max_terms]]
        if not sel:
            return _topdocs_table([], [])
        weights = {t: float(idf(self.N, gdf[t])) for t in sel}
        top = self._score_merge(sel, weights, k + 1)
        import pyarrow.compute as pc
        top = top.filter(pc.not_equal(
            top["doc_id"], pa.scalar(doc_id, pa.int64()))).slice(0, k)
        return top.set_column(
            top.column_names.index("rank"), "rank",
            pa.array(np.arange(top.num_rows, dtype=np.int32)))

    def grouped_topk(self, query_text: str, group_col: str,
                     k: int = 10, weights: dict | None = None
                     ) -> pa.Table:
        """Distributed result grouping (ScoreMode.Max heads): global
        weights broadcast, per-shard grouped partials, coordinator
        merges max-of-max / sum-of-count and ranks groups (score desc,
        value asc) — exact, no second phase needed."""
        if weights is None:
            weights = self._global_weights(
                self._analyzer.query_terms(query_text))
        parts = ray.get([s.group_partial.remote(
            query_text, group_col, weights, self.cache)
            for s in self.shards])
        agg: dict = {}
        for p in parts:
            for v, n, sc in zip(p[group_col].to_pylist(),
                                p["n"].to_pylist(),
                                p["score"].to_pylist()):
                cur = agg.get(v)
                agg[v] = ((cur[0] if cur else 0) + int(n),
                          max(cur[1], sc) if cur else sc)
        rows = sorted(agg.items(),
                      key=lambda kv: (-kv[1][1], kv[0]))[:k]
        return pa.table({
            group_col: pa.array([v for v, _ in rows], type=pa.string()),
            "n_children": pa.array([n for _, (n, _) in rows],
                                   type=pa.int64()),
            "score": pa.array(np.array([s for _, (_, s) in rows],
                                       dtype=np.float32))})

    def grouped_docs(self, query_text: str, group_col: str,
                     n_groups: int = 5, group_limit: int = 3
                     ) -> pa.Table:
        """Full TWO-PHASE distributed grouping (upstream
        ``group.distributed.first``/``second`` —
        ``SearchGroupsShardRequestFactory`` then
        ``TopGroupsShardRequestFactory`` [U]):

          round 1  per-shard grouped-max partials select the global
                   top ``n_groups`` groups (max score desc, value
                   asc) — :meth:`grouped_topk`;
          round 2  the chosen group list is broadcast; every shard
                   returns its local top ``group_limit`` docs per
                   group under the SAME global weights; the
                   coordinator merges per group (score desc, docID
                   asc) and cuts to ``group_limit``.

        Exact vs a single index: shards are doc-disjoint and both
        rounds score under global IDF, so each group's merged doc
        list equals the single-index per-group ranking.  Output rows
        are ordered by group rank then rank-in-group."""
        import pandas as pd

        weights = self._global_weights(
            self._analyzer.query_terms(query_text))
        heads = self.grouped_topk(query_text, group_col, k=n_groups,
                                  weights=weights)
        groups = heads[group_col].to_pylist()
        out_schema = pa.schema([
            (group_col, pa.string()), ("rank_in_group", pa.int64()),
            ("doc_id", pa.int64()), ("score", pa.float32())])
        if not groups:
            return out_schema.empty_table()
        parts = ray.get([s.group_docs_partial.remote(
            query_text, group_col, groups, weights, self.cache,
            group_limit) for s in self.shards])
        allp = pa.concat_tables([p for p in parts if p.num_rows])
        df = allp.to_pandas()
        df = df.sort_values(["score", "doc_id"],
                            ascending=[False, True], kind="mergesort")
        df = df.groupby(group_col, as_index=False, sort=False) \
               .head(group_limit)
        df["rank_in_group"] = df.groupby(group_col).cumcount()
        order = {g: i for i, g in enumerate(groups)}
        df["_g"] = df[group_col].map(order)
        df = df.sort_values(["_g", "rank_in_group"], kind="mergesort")
        return pa.Table.from_pandas(
            df[[group_col, "rank_in_group", "doc_id", "score"]],
            preserve_index=False).cast(out_schema)

    def stats_full(self, query_text: str, col: str) -> pa.Table:
        """Distributed StatsComponent with the FULL Solr stats field
        set (upstream ``StatsValuesFactory`` [U]): count/sum/min/max
        plus mean and sample stddev.  Partials carry Σ and Σ² as
        exact Python bignums, the coordinator folds them exactly, and
        the only float ops are one int→f64 cast per operand, one
        divide and one IEEE sqrt — mirrored verbatim in the SQL
        oracle, so even stddev is hash-exact."""
        import math

        terms = self._analyzer.query_terms(query_text)
        parts = ray.get([s.stats_full_partial.remote(terms, col)
                         for s in self.shards])
        n = sum(p[0] for p in parts)
        if n == 0:
            return pa.table({
                "n_count": pa.array([0], type=pa.int64()),
                "n_sum": pa.array([None], type=pa.int64()),
                "n_min": pa.array([None], type=pa.int64()),
                "n_max": pa.array([None], type=pa.int64()),
                "n_mean": pa.array([None], type=pa.float64()),
                "n_stddev": pa.array([None], type=pa.float64())})
        s_ = sum(p[1] for p in parts)
        ss = sum(p[2] for p in parts)
        lo = min(p[3] for p in parts if p[0])
        hi = max(p[4] for p in parts if p[0])
        mean = float(s_) / float(n)
        std = math.sqrt(float(n * ss - s_ * s_)
                        / float(n * (n - 1))) if n > 1 else None
        return pa.table({
            "n_count": pa.array([n], type=pa.int64()),
            "n_sum": pa.array([s_], type=pa.int64()),
            "n_min": pa.array([lo], type=pa.int64()),
            "n_max": pa.array([hi], type=pa.int64()),
            "n_mean": pa.array([mean], type=pa.float64()),
            "n_stddev": pa.array([std], type=pa.float64())})

    def stats(self, query_text: str, col: str) -> pa.Table:
        """Distributed query-scoped StatsComponent: per-shard
        (sum, min, max, count) partials combined by the coordinator —
        exact in one round."""
        terms = self._analyzer.query_terms(query_text)
        parts = ray.get([s.stats_partial.remote(terms, col)
                         for s in self.shards])
        s = sum(p[0] for p in parts)
        c = sum(p[3] for p in parts)
        los = [p[1] for p in parts if p[1] is not None]
        his = [p[2] for p in parts if p[2] is not None]
        return pa.table({
            "n_sum": pa.array([s], type=pa.int64()),
            "n_min": pa.array([min(los)] if los else [None],
                              type=pa.int64()),
            "n_max": pa.array([max(his)] if his else [None],
                              type=pa.int64()),
            "n_count": pa.array([c], type=pa.int64())})

    def percentile_disc(self, query_text: str, col: str,
                        pct: int = 50,
                        out_col: str | None = None) -> pa.Table:
        """Distributed EXACT percentile by iterative rank
        partitioning — the classic distributed selection algorithm
        (binary search on the value domain with per-shard rank
        counts; cf. the upstream single-node
        ``PercentileEvaluator``, which sorts in one process [U]):

          phase 0  per-shard (count, min, max) of the matched
                   docset's ``col``;
          rounds   binary-search the integer value domain — each
                   round broadcasts one probe value and sums K
                   constant-size ≤-rank partials (a memoized sorted
                   array per shard makes the partial one
                   searchsorted) — until the smallest value whose
                   global rank reaches ``ceil(pct·n/100)`` is pinned:
                   O(log(max−min)) rounds, never a value shipped.

        ``percentile_disc`` semantics (the value IS a data point) on
        integer domains; float domains take the t-digest sketch path
        (documented approximate sibling)."""
        terms = self._analyzer.query_terms(query_text)
        name = out_col or f"p{pct}"
        stats = ray.get([s.col_stats.remote(terms, col)
                         for s in self.shards])
        n = sum(s0[0] for s0 in stats)
        if n == 0:
            return pa.table({name: pa.array([], type=pa.int64())})
        lo = min(s0[1] for s0 in stats if s0[0])
        hi = max(s0[2] for s0 in stats if s0[0])
        rank = (pct * n + 99) // 100
        self.last_selection_rounds = 0
        while lo < hi:
            self.last_selection_rounds += 1
            mid = (lo + hi) // 2
            c = sum(ray.get([s.count_le.remote(terms, col, mid)
                             for s in self.shards]))
            if c >= rank:
                hi = mid
            else:
                lo = mid + 1
        return pa.table({name: pa.array([lo], type=pa.int64())})

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)


class ReplicatedSearcher(DistributedSearcher):
    """Replica failover on top of the coordinator (upstream SolrCloud
    replica promotion — a query touching a dead replica is retried
    against another replica of the SAME shard, returning FULL exact
    results; contrast ``shards.tolerant``, which *drops* the dead
    shard and flags the response partial).  Each shard spawns
    ``n_replicas`` warm ``ShardSearcher`` actors (on a real cluster:
    on different nodes via placement groups); :meth:`call` runs any
    coordinator protocol and, on an actor death, pings the primaries,
    promotes a spare for each dead one, and retries the whole
    request — shard state is an immutable on-disk index, so a spare
    is interchangeable and the retried answer is bit-identical."""

    def __init__(self, shard_dirs: list[str], n_replicas: int = 2,
                 preload: bool = True, k1: float = 1.2,
                 b: float = 0.75):
        self._spares = [[ShardSearcher.remote(d, preload)
                         for _ in range(n_replicas - 1)]
                        for d in shard_dirs]
        primaries = [ShardSearcher.remote(d, preload)
                     for d in shard_dirs]
        super().__init__(shard_dirs, preload, k1, b,
                         _actors=primaries)
        self.promotions = 0

    def _promote_dead(self) -> int:
        """Replace every dead primary with a spare replica; returns
        how many were promoted.  Raises if a shard has no spare left
        (total shard loss — nothing exact can be served)."""
        refs = [s.collection_stats.remote() for s in self.shards]
        promoted = 0
        for i, ref in enumerate(refs):
            try:
                ray.get(ref)
            except ray.exceptions.RayActorError:
                if not self._spares[i]:
                    raise
                self.shards[i] = self._spares[i].pop()
                promoted += 1
                self.promotions += 1
        return promoted

    def call(self, method: str, *args, **kw):
        """Run a coordinator protocol (by name, e.g. ``"topk"``,
        ``"facet_topk"``) with replica failover: on an actor death
        mid-protocol, promote spares and re-issue the request."""
        while True:
            try:
                return getattr(DistributedSearcher, method)(
                    self, *args, **kw)
            except ray.exceptions.RayActorError:
                if self._promote_dead() == 0:
                    raise

    def shutdown(self) -> None:
        super().shutdown()
        for pool in self._spares:
            for s in pool:
                ray.kill(s)


# ---------------------------------------- compositeId document routing

def route_shard(key: str, n_shards: int) -> int:
    """compositeId router (upstream
    ``S/common/cloud/CompositeIdRouter`` [U] — documents sharing a
    route key land on ONE shard so per-key operations never cross
    shards). Conformance restatement (documented): md5-high-32-bits
    modulo n_shards instead of the upstream murmur hash ring — md5 is
    the repo's shared deterministic hash, replayable in SQL."""
    import hashlib
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n_shards


def route_corpus(input_files: list[str], out_root: str, route_col: str,
                 n_shards: int) -> list[str]:
    """Route documents to shards by ``route_col`` (the SolrCloud
    ``id!`` compositeId ingestion step): ONE streaming pass assigns
    shard = route_shard(key) per row — hashed once per DISTINCT key
    per batch via dictionary encoding, not per row — and writes
    hive-partitioned Parquet, one directory per shard. Returns the
    shard directories in router order (index i == shard i)."""
    import os

    import pyarrow.compute as pc
    import ray.data

    def assign(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(b[route_col].combine_chunks())
        vals = enc.dictionary.to_pylist()
        m = np.array([route_shard(str(v), n_shards) for v in vals],
                     dtype=np.int32)
        shard = m[enc.indices.to_numpy(zero_copy_only=False)]
        return b.append_column("_shard", pa.array(shard, pa.int32()))

    ray.data.read_parquet(input_files) \
        .map_batches(assign, batch_format="pyarrow") \
        .write_parquet(out_root, partition_cols=["_shard"])
    dirs = [os.path.join(out_root, f"_shard={i}")
            for i in range(n_shards)]
    for d in dirs:                 # a shard may own no keys: empty dir
        os.makedirs(d, exist_ok=True)
    return dirs


def colocated_join(files_a: list[str], files_b: list[str],
                   key_a: str, key_b: str, out_root: str,
                   n_shards: int, cols_a: list[str] | None = None,
                   cols_b: list[str] | None = None) -> pa.Table:
    """Cross-collection join over COLOCATED collections (upstream
    SolrCloud colocated collections + cross-collection ``{!join}``
    [U]; classically: the co-partitioned join).  Both collections are
    routed by the SAME compositeId ring on their join keys, so every
    matching pair is guaranteed shard-local and the join itself runs
    with ZERO row movement — one independent task per shard, no
    all-to-all.  The routing pass is paid ONCE per collection at
    ingest and amortizes over every later join/fetch on that key —
    the brief's "pick ONE partitioning key and reuse it" rule as an
    operator.  Inner join; per-shard joins use Arrow's hash join on
    the (already co-located) parts."""
    import os

    dirs_a = route_corpus(files_a, os.path.join(out_root, "a"),
                          key_a, n_shards)
    dirs_b = route_corpus(files_b, os.path.join(out_root, "b"),
                          key_b, n_shards)

    @ray.remote
    def join_shard(da: str, db: str) -> pa.Table:
        import pyarrow.parquet as pq

        def load(d, cols):
            fs = sorted(os.path.join(d, f) for f in os.listdir(d)
                        if f.endswith(".parquet"))
            if not fs:
                return None
            return pa.concat_tables(
                [pq.read_table(f, columns=cols) for f in fs])

        ta = load(da, cols_a)
        tb = load(db, cols_b)
        if ta is None or tb is None:
            return None
        return ta.join(tb, keys=[key_a], right_keys=[key_b],
                       join_type="inner")

    parts = [p for p in ray.get([
        join_shard.remote(a, b)
        for a, b in zip(dirs_a, dirs_b)]) if p is not None]
    if not parts:
        return pa.table({})
    live = [p for p in parts if p.num_rows]
    # all per-shard joins empty (keys disjoint): keep the joined
    # schema by returning one of the empty results, not pa.table({})
    return pa.concat_tables(live) if live else parts[0]


def routed_topk(searcher: DistributedSearcher, route: str,
                query_text: str, k: int = 10) -> pa.Table:
    """``_route_`` query (upstream SolrCloud ``_route_`` param [U]):
    the request executes on the ONE shard owning the route key — no
    fan-out, shard-LOCAL collection stats (exactly a non-distributed
    query on that shard), the other shards never see the query."""
    i = route_shard(route, len(searcher.shards))
    s = searcher.shards[i]
    terms = searcher._analyzer.query_terms(query_text)
    if not terms:
        return _topdocs_table([], [])
    n_i, cf_i = ray.get(s.collection_stats.remote())
    # shard-LOCAL avgdl, but the SEARCHER'S similarity parameters —
    # omit_norms / k1 / b come from the shared schema, so the scores
    # equal a non-distributed query on that shard under the same cfg
    if searcher._omit_norms:
        cache_i = np.full(256, searcher._k1, dtype=np.float64)
    else:
        cache_i = norm_cache((cf_i / n_i) if n_i else 0.0,
                             searcher._k1, searcher._b)
    tstats = ray.get(s.term_stats.remote(sorted(set(terms))))
    weights = {t: float(idf(n_i, df)) for t, (df, _) in tstats.items()}
    return ray.get(s.score.remote(terms, weights, cache_i, k))
