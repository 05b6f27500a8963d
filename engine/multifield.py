"""Multi-field indexing and cross-field scoring.

Lucene/Solr index several analyzed fields per document with per-field
postings, norms and collection statistics (upstream
``L/index/FieldInfos``, per-field ``Terms`` in the codec,
``S/schema/IndexSchema`` [U]). The Ray-native restatement keeps fields
as INDEPENDENT index pipelines sharing one docID space (the same
docmap / doc_id column), built side by side under
``index_dir/field=<name>/``:

- each field build is the standard, separately checkpointed
  :func:`engine.build.build_index` job — per-field resume/lineage for
  free, and per-field analyzer config (a ``title`` field can skip
  stemming while ``body`` stems, exactly Solr's per-fieldType chain);
- per-field statistics (N, avgdl, df) fall out naturally, which is
  precisely what per-field BM25 needs — Lucene's similarity is
  per-field too (``IndexSearcher#termStatistics`` is field-scoped);
- cross-field queries combine per-field scorer outputs in doc space
  (docIDs are shared), giving the two canonical combinations:
  ``combined_topk(mode="sum")`` — the boolean SHOULD across fields —
  and ``mode="dismax"`` — DisMaxQueryParser's per-doc max + tiebreak
  (upstream ``S/search/DisMaxQParser``, ``DisjunctionMaxQuery`` [U]).

Design note vs the reference: Lucene physically co-locates all fields
of a segment in one file set; independent per-field shards are the
better fit for Ray's per-pipeline checkpointing and let fields build
in parallel. The logical query surface (per-field stats, cross-field
dismax) matches.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pyarrow as pa

from engine import manifest as mf
from engine.build import IndexConfig, build_index
from engine.query import IndexReader, _clause_scores, _topdocs_table, idf


def field_dir(index_dir: str, field: str) -> str:
    return os.path.join(index_dir, f"field={field}")


def build_multifield_index(input_path: str | list[str], index_dir: str,
                           field_cfgs: dict[str, IndexConfig],
                           resume: bool = True) -> dict[str, Any]:
    """Build one index per field under ``index_dir/field=<name>``.

    ``field_cfgs`` maps field name → IndexConfig whose ``text_col`` is
    that field's column (all sharing the same ``conv_cols`` /
    ``doc_id_col`` so docIDs align). Returns {field: manifest}."""
    out: dict[str, Any] = {}
    ident = None
    cols = [cfg.text_col for cfg in field_cfgs.values()]
    if len(set(cols)) != len(cols):
        raise ValueError(f"field_cfgs share a text_col: {sorted(cols)} — "
                         "each field must index its own column")
    for field, cfg in sorted(field_cfgs.items()):
        if not cfg.text_col:
            raise ValueError(f"field {field!r} has no text_col")
        key = (cfg.doc_id_col, cfg.conv_cols)
        if ident is None:
            ident = key
        elif key != ident:
            raise ValueError("all fields must share the docID source")
        out[field] = build_index(input_path, field_dir(index_dir, field),
                                 cfg, resume=resume)
    return out


class MultiFieldReader:
    """Per-field IndexReaders over a multi-field index + cross-field
    scoring. Readers preload independently (actor-friendly: construct
    once per actor)."""

    def __init__(self, index_dir: str, fields: list[str] | None = None,
                 preload: bool = False):
        if fields is None:
            fields = sorted(
                d.split("=", 1)[1] for d in os.listdir(index_dir)
                if d.startswith("field=")
                and mf.load(os.path.join(index_dir, d)) is not None)
        if not fields:
            raise ValueError(f"no field indexes under {index_dir}")
        self.fields = list(fields)
        self.readers = {f: IndexReader(field_dir(index_dir, f),
                                       preload=preload)
                        for f in self.fields}

    def reader(self, field: str) -> IndexReader:
        return self.readers[field]

    def _field_scores(self, field: str, query_text: str
                      ) -> tuple[np.ndarray, np.ndarray]:
        """(docs, summed f32 clause scores) for one field's disjunction
        — per-field idf/avgdl/norms, exactly the single-field path."""
        r = self.readers[field]
        terms = r.analyzer.query_terms(query_text)
        subs_by_term = r.lookup(terms)
        d_l, s_l = [], []
        for t in terms:
            subs = subs_by_term[t]
            if not subs:
                continue
            w = idf(r.N, r.global_df(subs))
            for sub in subs:
                docs, tfs, norms = sub.decode_all()
                d_l.append(docs)
                s_l.append(_clause_scores(tfs, norms, w, r.cache)
                           .astype(np.float64))
        if not d_l:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        docs = np.concatenate(d_l)
        scores = np.concatenate(s_l)
        uniq, inv = np.unique(docs, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, scores)
        keep = r._keep(uniq)
        if keep is not None:
            uniq, sums = uniq[keep], sums[keep]
        return uniq, sums

    def combined_topk(self, queries: dict[str, str], k: int = 10,
                      mode: str = "dismax",
                      tiebreak: float = 0.0) -> pa.Table:
        """Cross-field top-k. ``queries`` maps field → query text
        (DisMax's ``qf`` per-field queries). ``mode``:

        - ``"sum"``: per-doc sum of field scores (BooleanQuery SHOULD
          across field clauses);
        - ``"dismax"``: per-doc max + tiebreak × (sum − max)
          (upstream ``DisjunctionMaxQuery`` [U]).

        Each field scores with ITS OWN stats (idf, avgdl, norms);
        float32 cast happens once at the end, matching the single-field
        engines' accumulation discipline."""
        per_field = [self._field_scores(f, q) for f, q in
                     sorted(queries.items())]
        per_field = [(d, s) for d, s in per_field if len(d)]
        if not per_field:
            return _topdocs_table([], [])
        all_docs = np.unique(np.concatenate([d for d, _ in per_field]))
        sums = np.zeros(len(all_docs), dtype=np.float64)
        mx = np.zeros(len(all_docs), dtype=np.float64)
        for docs, sc in per_field:
            pos = np.searchsorted(all_docs, docs)
            sums[pos] += sc
            np.maximum.at(mx, pos, sc)
        if mode == "sum":
            final = sums.astype(np.float32)
        elif mode == "dismax":
            final = (mx + tiebreak * (sums - mx)).astype(np.float32)
        else:
            raise ValueError(f"unknown mode {mode!r}")
        nz = final > 0
        all_docs, final = all_docs[nz], final[nz]
        order = np.lexsort((all_docs, -final))[:k]
        return _topdocs_table(all_docs[order], final[order],
                              total=len(all_docs))

    def field_quantized_lengths(self, field: str,
                                doc_ids: np.ndarray) -> np.ndarray:
        """Per-doc SmallFloat-quantized token length of ``field`` for
        the given docs — the per-field norm that
        ``MultiNormsLeafSimScorer`` reads from each field's norms file
        upstream [U]. This engine stores norms per posting, so for
        arbitrary candidate docs the identical value is derived from a
        pruned, FILTERED read of the stored field column plus the
        index analyzer (index-time ``doc_lens`` is the emitted-token
        count, so re-analysis reproduces it exactly; cost is bounded
        by the candidate count — the two-phase-fetch pattern, never a
        corpus scan). Docs missing the field count length 0."""
        import pyarrow.parquet as pq

        from engine.smallfloat import LENGTH_TABLE, encode_lengths

        r = self.readers[field]
        ids = np.asarray(doc_ids, dtype=np.int64)
        uniq = np.unique(ids)
        id_col = r.cfg.doc_id_col
        if id_col is None:
            raise ValueError("combined-field norms need a doc_id index")
        col = r.cfg.text_col
        lens = np.zeros(len(uniq), dtype=np.int64)
        for f in r.manifest["input_files"]:
            t = pq.read_table(f, columns=[id_col, col],
                              filters=[(id_col, "in", uniq.tolist())])
            if not t.num_rows:
                continue
            _, _, _, dl = r.analyzer.analyze_flat(
                t[col].combine_chunks())
            pos = np.searchsorted(uniq, t[id_col].to_numpy()
                                  .astype(np.int64))
            lens[pos] = dl.astype(np.int64)
        q = LENGTH_TABLE[encode_lengths(lens)]
        return q[np.searchsorted(uniq, ids)]

    def combined_field_topk(self, query_text: str,
                            weights: dict[str, float] | None = None,
                            k: int = 10) -> pa.Table:
        """CombinedFieldQuery / BM25F (upstream
        ``lucene/sandbox/.../CombinedFieldQuery.java`` [U]; Robertson,
        Zaragoza & Taylor, CIKM 2004 — "Simple BM25 extension to
        multiple weighted fields"): all fields score as ONE pseudo
        field —

        - ``tf̃(t,d) = Σ_f w_f · tf_f(t,d)``
        - ``dl̃(d)  = Σ_f w_f · dlq_f(d)`` (per-field SmallFloat-
          quantized lengths, the multi-norms sum)
        - ``avgdl̃  = Σ_f w_f · sum_cf_f / N`` (exact, like the
          single-field avgdl)
        - ``df̃(t)  = |∪_f docs(t, f)|`` (the paper's whole-document
          df; idf is the standard BM25 idf over it)
        - per-term clause: ``f32(f32(idf)ᵈ × f32(tf̃/(tf̃ + k1·((1−b)
          + b·dl̃/avgdl̃)))ᵈ)``, per-doc f64 sum over terms, ONE final
          f32 cast — the engine-wide cast discipline, pinned by the
          SQL oracle.

        Upstream requires the same analyzer across combined fields;
        enforced here by analyzing the query with the first field's
        chain. ``weights`` defaults to 1.0 per field (must be ≥ 1 in
        Lucene; not re-checked here)."""
        weights = weights or {f: 1.0 for f in self.fields}
        fields = sorted(weights)
        r0 = self.readers[fields[0]]
        N = r0.N
        terms = r0.analyzer.query_terms(query_text)
        per_term: list[dict[str, tuple[np.ndarray, np.ndarray]]] = []
        all_docs: list[np.ndarray] = []
        for t in terms:
            fd = {}
            for f in fields:
                r = self.readers[f]
                subs = r.lookup([t])[t]
                if subs:
                    docs, tfs, _ = r._clause_arrays(t, subs)
                    fd[f] = (docs, tfs)
                    all_docs.append(docs)
            if fd:
                per_term.append(fd)
        if not per_term:
            return _topdocs_table([], [])
        cand = np.unique(np.concatenate(all_docs))
        keep = r0._keep(cand)
        if keep is not None:
            cand = cand[keep]
        if not len(cand):
            return _topdocs_table([], [])
        dlq = np.zeros(len(cand), dtype=np.float64)
        avgdl = 0.0
        for f in fields:
            w = float(weights[f])
            dlq += w * self.field_quantized_lengths(f, cand)
            rf = self.readers[f]
            avgdl += w * (rf.avgdl * rf.N / N) if rf.N != N \
                else w * rf.avgdl
        total = np.zeros(len(cand), dtype=np.float64)
        for fd in per_term:
            udocs = np.unique(np.concatenate(
                [d for d, _ in fd.values()]))
            w32 = np.float32(idf(N, len(udocs)))
            tfc = np.zeros(len(cand), dtype=np.float64)
            for f, (docs, tfs) in fd.items():
                pos = np.searchsorted(cand, docs)
                inb = pos < len(cand)
                inb[inb] &= cand[pos[inb]] == docs[inb]
                tfc[pos[inb]] += float(weights[f]) * tfs[inb]
            m = tfc > 0
            ratio32 = (tfc[m] / (tfc[m] + 1.2 * (
                0.25 + 0.75 * (dlq[m] / avgdl)))).astype(np.float32)
            sc32 = (np.float64(w32)
                    * ratio32.astype(np.float64)).astype(np.float32)
            total[m] += sc32.astype(np.float64)
        final = total.astype(np.float32)
        nz = final > 0
        cand, final = cand[nz], final[nz]
        order = np.lexsort((cand, -final))[:k]
        return _topdocs_table(cand[order], final[order],
                              total=len(cand))

    def edismax_topk(self, query_text: str, k: int = 10,
                     boosts: dict[str, float] | None = None,
                     tiebreak: float = 0.0,
                     pf_field: str | None = None,
                     pf_boost: float = 1.0) -> pa.Table:
        """Extended DisMax (upstream ``S/search/ExtendedDismaxQParser``
        [U]): the SAME query string runs against every field with its
        ``qf`` boost — per-doc score = max over fields of
        (boost × field BM25) + tiebreak × (sum − max) — and ``pf``
        adds a SHOULD phrase clause: docs where the pf field contains
        the whole query as an exact phrase additionally gain
        pf_boost × that field's phrase BM25 (tf = phrase frequency,
        weight = Σ term idf). All accumulation in f64 over f32 clause
        scores, one final f32 cast."""
        boosts = boosts or {}
        per_field = []
        for f in sorted(self.readers):
            d, s = self._field_scores(f, query_text)
            if len(d):
                per_field.append((d, s * float(boosts.get(f, 1.0))))
        if not per_field:
            return _topdocs_table([], [])
        all_docs = np.unique(np.concatenate([d for d, _ in per_field]))
        sums = np.zeros(len(all_docs), dtype=np.float64)
        mx = np.zeros(len(all_docs), dtype=np.float64)
        for docs, sc in per_field:
            pos = np.searchsorted(all_docs, docs)
            sums[pos] += sc
            np.maximum.at(mx, pos, sc)
        main = mx + tiebreak * (sums - mx)
        if pf_field is not None:
            r = self.readers[pf_field]
            ph = r.phrase_topk(query_text, k=max(r.N, 1))
            pdocs = ph["doc_id"].to_numpy()
            psc = ph["score"].to_numpy().astype(np.float64)
            pos = np.searchsorted(all_docs, pdocs)
            # phrase matches are term matches in pf_field, so every
            # phrase doc is already a candidate when pf_field is in qf
            inb = (pos < len(all_docs))
            inb[inb] &= all_docs[pos[inb]] == pdocs[inb]
            main[pos[inb]] += pf_boost * psc[inb]
        final = main.astype(np.float32)
        nz = final > 0
        all_docs, final = all_docs[nz], final[nz]
        order = np.lexsort((all_docs, -final))[:k]
        return _topdocs_table(all_docs[order], final[order],
                              total=len(all_docs))
