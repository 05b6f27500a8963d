"""Near-real-time search: the ``DirectoryReader.open(IndexWriter)``
analog (upstream ``L/index/DirectoryReader#open(IndexWriter)`` /
``IndexWriter#getReader`` and Solr's soft commit [U]).

``NrtWriter`` wraps a COMPLETE doc_id-mode index and buffers added
documents in RAM. ``reader()`` returns a true NRT snapshot: the
buffered docs are analyzed with the index's own config and encoded
into in-memory posting sub-lists (the DWPT RAM segment), which ride
along the committed sub-lists through the reader's normal ``lookup``
path — so every query family that consumes postings (term / boolean /
BMW / phrase / spans / fuzzy / wildcard …) sees uncommitted docs with
correct merged collection stats (N, avgdl, df all include the RAM
segment, like Lucene's per-segment stats summed across the NRT leaf).
``commit()`` flushes the buffer through the standard incremental
append (stable part lineage, full bucket re-merge), after which a
fresh on-disk reader returns exactly what the NRT snapshot returned.

Buffered deletes (``IndexWriter#deleteDocuments``) are NRT-visible
too: committed docs through the same scoring-time tombstone mask the
disk delete path uses (df/idf unchanged until a folding merge),
still-buffered docs by dropping them from the RAM buffer;
``update_documents`` composes both under this engine's
delete-plus-fresh-id-append updateDocument contract, and ``commit``
publishes the pending deletes through ``delete_docs`` before the
append.

Boundaries (documented): doc_id-mode indexes only (conv-mode docIDs
are assigned by the sorted docmap, which an unflushed buffer cannot
extend without re-ranking); buffered doc_ids must be new (append
contract); the NRT snapshot is point-in-time — later ``add_documents``
calls need a new ``reader()``, exactly like reopening an NRT reader.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from engine import manifest as mf
from engine.analysis import Analyzer
from engine.build import IndexConfig, build_index, delete_docs
from engine.codec import encode_postings
from engine.query import B, K1, IndexReader, _SubList, norm_cache
from engine.smallfloat import encode_lengths


class NrtReader(IndexReader):
    """IndexReader over disk segments + one RAM segment."""

    def __init__(self, index_dir: str, ram: dict[str, _SubList],
                 ram_n_docs: int, ram_sum_len: int, ram_max_id: int,
                 k1: float = K1, b: float = B,
                 extra_deleted: np.ndarray | None = None,
                 dv_buffer: list | None = None):
        super().__init__(index_dir, preload=False, k1=k1, b=b)
        self._ram = ram
        # buffered numeric-DV updates (field, frozen docset, value) in
        # call order — overlaid after the disk generations, later wins
        self._dv_buffer = dv_buffer or []
        if extra_deleted is not None and len(extra_deleted):
            # buffered deletes: same global scoring-time mask as
            # committed deletes (tombstone stats — df/idf unchanged
            # until a delete-folding merge, exactly like the disk path)
            self._deleted = np.union1d(self._deleted, extra_deleted)
        if ram_n_docs:
            # exact-integer merged stats: sum_cf is the exact token
            # total, so merged avgdl is the SAME f64 expression a full
            # rebuild computes — f32 scores stay bit-identical
            base_sum = int(self.manifest["stats"]["sum_cf"])
            self.N += ram_n_docs
            self.avgdl = (base_sum + ram_sum_len) / self.N
            self.max_doc = max(self.max_doc, ram_max_id + 1)
            if not self.cfg.omit_norms:
                self.cache = norm_cache(self.avgdl, k1, b)

    def lookup(self, terms: list[str]) -> dict[str, list[_SubList]]:
        out = super().lookup(terms)
        return {t: (out[t] + [self._ram[t]] if t in self._ram else out[t])
                for t in out}

    def numeric_docvalues(self, field: str,
                          doc_ids: np.ndarray) -> np.ndarray:
        """Disk base + committed generations, then the writer's
        buffered updates in call order (upstream NRT readers see
        ``updateNumericDocValue`` before commit [U]). RAM-buffered
        docs have no disk base value yet — NaN unless a buffered
        update covers them (their base lands with the flush)."""
        vals = super().numeric_docvalues(field, doc_ids)
        ids = np.asarray(doc_ids, dtype=np.int64)
        for f, docs, value in self._dv_buffer:
            if f == field and len(docs):
                vals[np.isin(ids, docs)] = value
        return vals

    def vocabulary(self) -> list[str]:
        if self._vocab is None:
            base = super().vocabulary()
            self._vocab = sorted(set(base) | set(self._ram))
        return self._vocab

    def _extra_dict_terms(self) -> list[str]:
        """RAM-segment terms join the trigram candidate sources so
        fuzzy/wildcard/regexp expansion sees uncommitted docs."""
        return sorted(self._ram)


class NrtWriter:
    """Buffered writer over a complete doc_id-mode index."""

    def __init__(self, index_dir: str, append_mode: str = "rewrite"):
        self.index_dir = index_dir
        # "segment": commits flush through the segment-append path
        # (O(flushed data) per commit, upstream's flush-then-
        # TieredMergePolicy lifecycle) — pair with maybe_merge.
        self.append_mode = append_mode
        man = mf.load(index_dir)
        if man is None or man.get("status") != "complete":
            raise ValueError(f"no complete index at {index_dir}")
        self.cfg = IndexConfig.from_json(man["config"])
        if self.cfg.doc_id_col is None:
            raise ValueError("NRT requires a doc_id-mode index")
        self._inputs = sorted({v["input_file"]
                               for v in man["parts"].values()})
        self._buffered: list[pa.Table] = []
        self._buf_ids: set[int] = set()
        self._nrt_deleted: set[int] = set()
        self._dv_buffer: list[tuple[str, np.ndarray, float]] = []
        # buffered ids deleted BEFORE any flush: they never gain a
        # disk identity, so frozen dv docsets must drop them exactly
        # (a `< max_doc` bound misses holes in sparse external ids)
        self._dropped_buffered: set[int] = set()
        self._mutations = 0          # invalidates the resolve memo
        self._flush_seq = 0
        # warm disk reader for realtime_get point fetches; disk state
        # only changes inside commit(), which drops it
        self._disk_reader: IndexReader | None = None

    # ------------------------------------------------------------ write

    def add_documents(self, table: pa.Table) -> int:
        """Buffer (doc_id, text[, ...]) rows; returns buffered count."""
        ids = table[self.cfg.doc_id_col].to_numpy().astype(np.int64)
        dup = self._buf_ids.intersection(ids.tolist())
        if dup:
            raise ValueError(f"doc_ids already buffered: {sorted(dup)[:5]}")
        dead = self._nrt_deleted.intersection(ids.tolist())
        if dead:
            raise ValueError(
                f"doc_ids deleted this session: {sorted(dead)[:5]} — "
                "updates append under a FRESH id (the engine's "
                "updateDocument contract)")
        self._buf_ids.update(ids.tolist())
        self._buffered.append(table.select(
            [self.cfg.doc_id_col, self.cfg.text_col]))
        self._mutations += 1
        return len(self._buf_ids)

    def delete_documents(self, doc_ids) -> int:
        """Buffered deletes (upstream ``IndexWriter#deleteDocuments``
        [U]): immediately visible in the next ``reader()`` — committed
        docs via the same scoring-time tombstone mask the disk path
        uses, still-buffered docs by dropping them from the RAM
        buffer. Returns the pending delete count."""
        ids = {int(i) for i in doc_ids}
        buffered_hits = ids & self._buf_ids
        if buffered_hits:
            mask_ids = pa.array(sorted(buffered_hits), type=pa.int64())
            self._buffered = [
                t.filter(pc.invert(pc.is_in(
                    t[self.cfg.doc_id_col], value_set=mask_ids)))
                for t in self._buffered]
            self._buffered = [t for t in self._buffered if t.num_rows]
            self._buf_ids -= buffered_hits
            self._dropped_buffered |= buffered_hits
        self._nrt_deleted |= ids
        self._mutations += 1
        return len(self._nrt_deleted)

    def update_numeric_docvalue(self, term: str, field: str,
                                value: float | int) -> int:
        """Buffered in-place DV update (upstream
        ``IndexWriter#updateNumericDocValue`` via ``BufferedUpdates``
        [U]): the docset freezes NOW — disk live docs matching
        ``term`` plus currently-buffered matches; docs added LATER
        are unaffected, exactly the upstream queue-order resolution.
        Visible in the next ``reader()``; published as a disk dvGen
        at ``commit()``. Returns the frozen docset size. Resolution
        reuses a memoized postings snapshot (invalidated by the
        mutation counter, which every add / delete / rollback / commit
        bumps — including disk-generation changes) — upstream
        BufferedUpdates just queues the term; re-encoding the RAM
        buffer per update call would be quadratic across an update
        sequence."""
        if getattr(self, "_resolve_state", None) != self._mutations:
            self._resolve_reader = self.reader()
            self._resolve_state = self._mutations
        r = self._resolve_reader
        docs = r.filter_docset(term)
        keep = r._keep(docs)
        if keep is not None:
            docs = docs[keep]
        self._dv_buffer.append((field, docs.copy(), float(value)))
        return int(len(docs))

    def update_documents(self, old_ids, table: pa.Table) -> int:
        """``updateDocument`` (upstream ``IndexWriter#updateDocument``
        [U], this engine's delete-plus-fresh-id-append contract):
        delete the old ids, buffer the replacements."""
        self.delete_documents(old_ids)
        return self.add_documents(table)

    # ------------------------------------------------------------- read

    def realtime_get(self, doc_ids) -> pa.Table:
        """Solr RealTimeGet over the update log (upstream
        ``RealTimeGetComponent`` [U]): UNCOMMITTED buffered adds are
        visible immediately, buffered deletes hide both buffered and
        committed versions, and everything else point-fetches the disk
        stored fields (requires ``build_stored_fields``). Returns
        (doc_id, text) sorted by doc_id; absent/deleted ids missing."""
        id_col, text_col = self.cfg.doc_id_col, self.cfg.text_col
        ids = sorted({int(i) for i in doc_ids}
                     - set(self._nrt_deleted))
        found: set[int] = set()
        parts: list[pa.Table] = []
        if self._buffered and ids:
            buf = pa.concat_tables(self._buffered).combine_chunks()
            m = pc.is_in(buf[id_col],
                         value_set=pa.array(ids, type=pa.int64()))
            sub = buf.filter(m)
            if sub.num_rows:
                parts.append(pa.table({
                    "doc_id": sub[id_col].cast(pa.int64()),
                    "text": sub[text_col]}))
                found = set(sub[id_col].to_pylist())
        disk_want = np.array([i for i in ids if i not in found],
                             dtype=np.int64)
        if len(disk_want):
            # RealTimeGet workloads are many small point fetches —
            # reuse one warm reader instead of re-parsing the manifest
            # + delete generation per call (invalidated by commit())
            if self._disk_reader is None:
                self._disk_reader = IndexReader(self.index_dir)
            parts.append(self._disk_reader.fetch_docs(disk_want))
        if not parts:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())})
        return pa.concat_tables(parts).combine_chunks() \
                 .sort_by("doc_id")

    def reader(self, k1: float = K1, b: float = B) -> IndexReader:
        """Point-in-time NRT snapshot (disk segments + RAM segment +
        buffered deletes)."""
        dels = np.array(sorted(self._nrt_deleted), dtype=np.int64)
        dv = list(self._dv_buffer)
        if not self._buffered:
            return NrtReader(self.index_dir, {}, 0, 0, -1, k1=k1, b=b,
                             extra_deleted=dels, dv_buffer=dv)
        buf = pa.concat_tables(self._buffered).combine_chunks()
        ram, n_docs, sum_len, max_id = self._encode_ram(buf)
        return NrtReader(self.index_dir, ram, n_docs, sum_len, max_id,
                         k1=k1, b=b, extra_deleted=dels, dv_buffer=dv)

    def _encode_ram(self, buf: pa.Table):
        """Analyze the buffer and encode one _SubList per term — the
        in-memory DWPT segment (same lexsort shape as
        ``FragmentBuilder._build``, per-term encode since NRT buffers
        are small by construction)."""
        cfg = self.cfg
        analyzer = Analyzer(cfg.stop_words, cfg.stemming, cfg.filters,
                            cfg.unicode_tokens, cfg.char_filters,
                            tokenizer=cfg.tokenizer,
                            max_token_len=cfg.max_token_len)
        doc_ids = buf[cfg.doc_id_col].to_numpy().astype(np.int64)
        order = np.argsort(doc_ids, kind="stable")
        buf = buf.take(pa.array(order))
        doc_ids = doc_ids[order]
        _, tcode, vocab, positions, doc_lens = \
            analyzer.analyze_encoded(buf[cfg.text_col])
        n_docs = len(doc_lens)
        sum_len = int(doc_lens.sum())
        max_id = int(doc_ids.max()) if len(doc_ids) else -1
        if tcode.size == 0:
            return {}, n_docs, sum_len, max_id
        norm_bytes = encode_lengths(doc_lens)
        tok_doc = np.repeat(np.arange(n_docs, dtype=np.int64), doc_lens)
        sort = np.lexsort((positions, tok_doc, tcode))
        t_s, d_s, p_s = tcode[sort], tok_doc[sort], positions[sort]
        chg = np.empty(t_s.size, dtype=bool)
        chg[0] = True
        chg[1:] = (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])
        pstart = np.flatnonzero(chg)
        tfs = np.diff(np.append(pstart, t_s.size)).astype(np.int64)
        if not cfg.store_freqs:  # IndexOptions.DOCS: freq() == 1
            tfs = np.ones_like(tfs)
            # merged-stats contribution follows the disk convention:
            # sum_cf for a freq-less field is sumDocFreq (postings),
            # not the token count [U totalTermFreq == docFreq]
            sum_len = int(tfs.size)
        p_t, p_d = t_s[pstart], d_s[pstart]
        tchg = np.empty(p_t.size, dtype=bool)
        tchg[0] = True
        tchg[1:] = p_t[1:] != p_t[:-1]
        tstart = np.flatnonzero(tchg)
        bounds = np.append(tstart, p_t.size)
        tok_bounds = np.append(pstart[tstart], t_s.size)
        ram: dict[str, _SubList] = {}
        for i in range(len(tstart)):
            s, e = bounds[i], bounds[i + 1]
            poss = p_s[tok_bounds[i]:tok_bounds[i + 1]].astype(np.int64) \
                if cfg.store_positions else None
            enc = encode_postings(doc_ids[p_d[s:e]], tfs[s:e],
                                  norm_bytes[p_d[s:e]], poss)
            ram[str(vocab[p_t[s]])] = _SubList.from_encoded(enc)
        return ram, n_docs, sum_len, max_id

    def rollback(self) -> None:
        """``IndexWriter#rollback`` [U]: discard every buffered add,
        update and delete since the last commit — the on-disk index is
        untouched (changes only ever reach it through ``commit``)."""
        self._buffered.clear()
        self._buf_ids.clear()
        self._nrt_deleted.clear()
        self._dv_buffer.clear()
        self._dropped_buffered.clear()
        self._mutations += 1

    # ------------------------------------------------------------ flush

    def commit(self, flush_dir: str) -> dict:
        """Flush the buffer as a new input file through the standard
        incremental append, applying buffered deletes first (hard
        commit). Returns the new manifest; the buffer clears and
        future readers come from disk."""
        if self._nrt_deleted:
            man = mf.load(self.index_dir)
            bound = int(man["stats"].get("max_doc", man["stats"]["N"]))
            # ids deleted while still RAM-buffered never gained a disk
            # identity (updates append under a FRESH id), so they must
            # not become tombstones: with sparse external ids a hole
            # below max_doc would mask a future append reusing the id —
            # the same exclusion _publish_dv applies to frozen docsets.
            disk_dels = [i for i in self._nrt_deleted - self._dropped_buffered
                         if 0 <= i < bound]
            if disk_dels:
                delete_docs(self.index_dir, disk_dels)
            self._nrt_deleted.clear()
        if not self._buffered:
            return self._publish_dv()
        os.makedirs(flush_dir, exist_ok=True)
        buf = pa.concat_tables(self._buffered).combine_chunks()
        ids = buf[self.cfg.doc_id_col].to_numpy().astype(np.int64)
        buf = buf.take(pa.array(np.argsort(ids, kind="stable")))
        self._flush_seq += 1
        path = os.path.join(flush_dir,
                            f"nrt_flush_{self._flush_seq:04d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(buf, tmp)
        os.replace(tmp, path)
        man = build_index(self._inputs + [path], self.index_dir, self.cfg,
                          append_mode=self.append_mode)
        self._inputs.append(path)
        self._buffered.clear()
        self._buf_ids.clear()
        man = self._publish_dv()
        return man

    def _publish_dv(self) -> dict:
        """Flush buffered DV updates as disk generations in call
        order (AFTER the append so generations may reference
        just-flushed docIDs). A frozen docID that never reached disk —
        a RAM-buffered doc deleted before this commit — is dropped
        EXACTLY (tracked per-id; a ``< max_doc`` bound would miss
        holes in sparse external doc_ids): it has no disk identity,
        and a future append reusing the id must not inherit the stale
        override."""
        if self._dv_buffer:
            from engine.build import publish_dv_generation
            man = mf.load(self.index_dir)
            bound = int(man["stats"].get("max_doc", man["stats"]["N"]))
            dead = np.array(sorted(self._dropped_buffered),
                            dtype=np.int64)
            for field, docs, value in self._dv_buffer:
                docs = docs[docs < bound]
                if len(dead):
                    docs = docs[~np.isin(docs, dead,
                                         assume_unique=True)]
                if len(docs):
                    publish_dv_generation(self.index_dir, field, docs,
                                          value)
            self._dv_buffer.clear()
        self._dropped_buffered.clear()
        self._mutations += 1
        # every commit path ends here and disk state may have changed
        # (tombstones / append / dv generations): drop the warm reader
        self._disk_reader = None
        return mf.load(self.index_dir)
