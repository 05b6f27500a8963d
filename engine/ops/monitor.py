"""Registered-query monitor — "reverse search" / percolation.

Analog of upstream ``lucene/monitor`` (formerly Luwak,
``monitor/src/java/org/apache/lucene/monitor/Monitor.java`` [U]): a
set of saved queries is registered ONCE; a stream of incoming
documents is matched against all of them, emitting (doc, query)
alert pairs. Upstream builds a *presearcher* index over the queries'
terms so each doc only runs the few queries whose terms it contains;
the same idea here is a term → query adjacency (CSR over the query
term dictionary) probed with one vectorized ``index_in`` per batch —
no per-(doc, query) Python loop, and the compiled query set is
broadcast once via ``ray.put`` (never re-shipped per batch).

Supported query kinds (each with exact SQL-replayable semantics):
``term`` (single term present), ``and`` (all terms present, doc-level
presence), ``phrase`` (two terms at adjacent positions, in order),
``prefix`` (any token starts with the prefix — the Luwak presearcher
handles multi-term queries by registering their term prefixes; here
the prefix probe is one vectorized ``starts_with`` per registered
prefix, the right shape while the registered set is small relative
to the corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from engine.ops.textstats import _flat_tokens


def _norm_term(s: str, ctx: str) -> str:
    """Normalize ONE registered query term with the same analysis the
    documents get (lowercase + TOKEN_SPLIT via ``_flat_tokens``) —
    upstream Monitor / SolrTextTagger analyze registered queries with
    the index analyzer; an unanalyzed 'Alpha' would silently never
    match the lowercased token stream."""
    _, flat = _flat_tokens(pa.array([s], type=pa.string()))
    toks = flat.to_pylist()
    if len(toks) != 1:
        raise ValueError(
            f"{ctx}: registered term {s!r} analyzes to {toks} — "
            "must normalize to exactly one token (use kind='and' or "
            "'phrase' for multi-token queries)")
    return toks[0]


def compile_queries(queries: list[dict]) -> dict:
    """Compile the registered set: a term dictionary, the term→query
    CSR for AND presence counting, and the phrase pair list. Terms and
    phrase words are run through the document analyzer; prefixes are
    lowercased (a prefix of an analyzed token)."""
    qids, kinds = [], []
    and_term_q, and_term_t = [], []      # (query slot, term) pairs
    and_need = []
    phrases = []                          # (slot, t1, t2)
    prefixes = []                         # (slot, prefix)
    terms: set[str] = set()
    for q in queries:
        slot = len(qids)
        qids.append(q["id"])
        kinds.append(q["kind"])
        if q["kind"] == "term":
            t = _norm_term(q["terms"][0], q["id"])
            and_term_q.append(slot)
            and_term_t.append(t)
            and_need.append(1)
            terms.add(t)
        elif q["kind"] == "and":
            qt = {_norm_term(t, q["id"]) for t in q["terms"]}
            for t in sorted(qt):
                and_term_q.append(slot)
                and_term_t.append(t)
            and_need.append(len(qt))
            terms.update(qt)
        elif q["kind"] == "phrase":
            t1, t2 = (_norm_term(t, q["id"]) for t in q["terms"])
            phrases.append((slot, t1, t2))
            and_need.append(0)
            terms.update((t1, t2))
        elif q["kind"] == "prefix":
            prefixes.append((slot, q["terms"][0].lower()))
            and_need.append(0)
        else:
            raise ValueError(f"unknown query kind {q['kind']!r}")
    dict_terms = sorted(terms)   # typed even when empty (prefix-only)
    tix = {t: i for i, t in enumerate(dict_terms)}
    # term → [query slot] adjacency, CSR by term index
    pairs = sorted((tix[t], s) for s, t in zip(and_term_q, and_term_t))
    adj_t = np.array([p[0] for p in pairs], dtype=np.int64)
    adj_q = np.array([p[1] for p in pairs], dtype=np.int64)
    starts = np.searchsorted(adj_t, np.arange(len(dict_terms) + 1))
    return {
        "qids": np.array(qids, dtype=object),
        "dict": pa.array(dict_terms, type=pa.string()),
        "adj_q": adj_q, "starts": starts,
        "need": np.array(and_need, dtype=np.int64),
        "phrases": [(s, tix[a], tix[b]) for s, a, b in phrases],
        "prefixes": prefixes,
        "nq": len(qids),
    }


def monitor_match(ds: ray.data.Dataset, text_col: str, id_col: str,
                  queries: list[dict]) -> ray.data.Dataset:
    """Match every doc against the registered query set; returns
    (id_col, query_id) pairs. One streaming pass; per-batch work is
    pure numpy over token indices."""
    cq_ref = ray.put(compile_queries(queries))

    def f(b: pa.Table) -> pa.Table:
        cq = ray.get(cq_ref)
        offs, flat = _flat_tokens(b[text_col])
        nrows = len(offs) - 1
        doc_of = np.repeat(np.arange(nrows), np.diff(offs))
        tid = pc.index_in(flat, value_set=cq["dict"]) \
            .to_numpy(zero_copy_only=False)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        out_d, out_q = [], []
        nq = cq["nq"]

        hit = ~np.isnan(tid)
        hd, ht = doc_of[hit], tid[hit].astype(np.int64)
        if len(hd):
            # doc-level presence, deduped: one (doc, term) row each
            nt = len(cq["dict"])
            pres = np.unique(hd * nt + ht)
            pd_, pt = pres // nt, pres % nt
            # expand term → query slots (presearcher fan-out)
            cnt = (cq["starts"][pt + 1] - cq["starts"][pt])
            rd = np.repeat(pd_, cnt)
            base = np.repeat(cq["starts"][pt], cnt)
            step = np.arange(len(rd)) - np.repeat(
                np.concatenate(([0], np.cumsum(cnt)))[:-1], cnt)
            rq = cq["adj_q"][base + step]
            # count distinct present required terms per (doc, query)
            key, kcnt = np.unique(rd * nq + rq, return_counts=True)
            kd, kq = key // nq, key % nq
            ok = kcnt >= cq["need"][kq]
            out_d.append(kd[ok])
            out_q.append(kq[ok])

        if cq["phrases"] and len(hd):
            # adjacency: consecutive tokens in the same doc
            tid_full = np.where(np.isnan(tid), -1,
                                np.nan_to_num(tid)).astype(np.int64)
            same_doc = doc_of[1:] == doc_of[:-1]
            a, bb = tid_full[:-1], tid_full[1:]
            dd = doc_of[:-1]
            for slot, t1, t2 in cq["phrases"]:
                m = same_doc & (a == t1) & (bb == t2)
                if m.any():
                    out_d.append(np.unique(dd[m]))
                    out_q.append(np.full(len(np.unique(dd[m])), slot,
                                         dtype=np.int64))

        for slot, pref in cq["prefixes"]:
            m = pc.starts_with(flat, pref) \
                .to_numpy(zero_copy_only=False)
            if m.any():
                docs = np.unique(doc_of[m])
                out_d.append(docs)
                out_q.append(np.full(len(docs), slot, dtype=np.int64))

        if not out_d:
            return pa.table({
                id_col: pa.array([], type=b[id_col].type),
                "query_id": pa.array([], type=pa.string())})
        alld = np.concatenate(out_d)
        allq = np.concatenate(out_q)
        return pa.table({
            id_col: pa.array(ids[alld]).cast(b[id_col].type),
            "query_id": pa.array(cq["qids"][allq].astype(str))})

    return ds.map_batches(f, batch_format="pyarrow")


def tag_dictionary(ds: ray.data.Dataset, text_col: str, id_col: str,
                   phrases: list[str]) -> ray.data.Dataset:
    """SolrTextTagger analog (upstream Solr ``TaggerRequestHandler``
    — dictionary-driven phrase tagging of raw text [U]): every
    occurrence of any dictionary phrase (exact consecutive-token
    match, longest fixed per phrase) is counted per document; emits
    (id, phrase, n) rows for docs that contain the phrase. Upstream
    walks an FST of the dictionary; here each phrase is a chained
    vectorized shift-compare over the token stream (one boolean array
    per phrase word — no per-token Python), which is the right shape
    when the dictionary is small relative to the corpus. One
    streaming pass, combiner-style per-batch counts."""
    # analyze dictionary phrases exactly like the documents (lowercase
    # + TOKEN_SPLIT): 'New York' must match tokens ['new', 'york']
    _offs, _fl = _flat_tokens(pa.array(phrases, type=pa.string()))
    _all = _fl.to_pylist()
    toks_of = [_all[_offs[i]:_offs[i + 1]] for i in range(len(phrases))]
    keep = [i for i, t in enumerate(toks_of) if t]
    phrases = [phrases[i] for i in keep]
    toks_of = [toks_of[i] for i in keep]
    cq_ref = ray.put((phrases, toks_of))

    def f(b: pa.Table) -> pa.Table:
        phr, ptoks = ray.get(cq_ref)
        offs, flat = _flat_tokens(b[text_col])
        doc_of = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        ids = b[id_col].to_numpy(zero_copy_only=False)
        toks = flat.to_numpy(zero_copy_only=False)
        out_id, out_ph, out_n = [], [], []
        for phrase, words in zip(phr, ptoks):
            k = len(words)
            if len(toks) < k:
                continue
            m = toks[: len(toks) - k + 1] == words[0]
            # same-doc guard for the whole window
            m &= doc_of[: len(toks) - k + 1] == doc_of[k - 1:]
            for j in range(1, k):
                m &= toks[j: len(toks) - k + 1 + j] == words[j]
            if not m.any():
                continue
            hd = doc_of[: len(toks) - k + 1][m]
            uniq, cnt = np.unique(hd, return_counts=True)
            out_id.append(ids[uniq])
            out_ph.extend([phrase] * len(uniq))
            out_n.append(cnt.astype(np.int64))
        if not out_id:
            return pa.table({
                id_col: pa.array([], type=b[id_col].type),
                "phrase": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64())})
        return pa.table({
            id_col: pa.array(np.concatenate(out_id)).cast(b[id_col].type),
            "phrase": pa.array(out_ph, type=pa.string()),
            "n": pa.array(np.concatenate(out_n), type=pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")
