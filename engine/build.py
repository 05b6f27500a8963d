"""Distributed inverted-index build pipeline (Ray Data).

Ray-native restatement of the reference's IndexWriter/SegmentMerger
lifecycle (SURVEY.md §3.1; upstream ``L/index/DocumentsWriterPerThread``
→ flush → ``L/index/SegmentMerger`` [U]) as a streaming Dataset
pipeline:

  Stage 0  docID bases     tiny ``groupby(conv_id).count`` → prefix-sum
                           → ``docmap.parquet`` (the *stable* docID
                           authority: ``doc_id = base[conv_id] +
                           turn_idx`` == rank under (conv_id, turn_idx)
                           sort — execution order can never change it,
                           which is what makes resume + retries safe).
  Stage A  fragments       ``map_batches(FragmentBuilder actor)`` over
                           zero-copy Arrow batches: analyze → per-batch
                           term→postings fragment rows (the DWPT-flush
                           analog), hive-partitioned to
                           ``fragments/bucket=H(term)/part_id=P`` so the
                           merge reads one bucket at a time and resume
                           skips finished input parts.
  Stage B  merge           per bucket: df partials → hot-term set →
                           salted ``groupby(merge_key).map_groups`` →
                           delta+VByte encode + block directory →
                           ``index/bucket=B`` shard Parquet (the
                           SegmentMerger analog; the groupby IS the
                           explicit hash shuffle on term).
  Stage C  commit          stats.json + manifest status=complete,
                           written atomically last (SegmentInfos-style
                           publish).

Skew (SURVEY.md §4): a hot term (global df above threshold) would make
one merge group hold the whole posting list. Instead its fragments are
salted by ``part_id % n_salts`` into independent sub-lists over
*disjoint* doc sets, each encoded as its own index row — exactly
Lucene's many-segments-per-term shape, resolved query-side by treating
sub-lists as independent scorers with the *global* df. No second merge
pass, no giant group.

Scale notes (100 TB): the only all-to-all exchanges are (a) the tiny
conv-count groupby and (b) the per-bucket term groupby, whose working
set is 1/n_buckets of the index; buckets run as independent, separately
checkpointed jobs. The conv base table is 1/avg_turns the corpus and is
loaded once per analyzer actor (not per batch); at 10^12 turns it would
itself be range-sharded with a two-level (partition-sums → prefix)
base assignment — same invariant, documented here as the scale path.
"""

from __future__ import annotations

import os
import shutil
import zlib
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from engine import manifest as mf
from engine import trigram
from engine.analysis import ENGLISH_STOP_WORDS, Analyzer
from engine.codec import (encode_postings, encode_postings_multi,
                          vbyte_decode, vbyte_encode_with_ends)
from engine.smallfloat import encode_lengths

DOCMAP_NAME = "docmap.parquet"
STATS_NAME = "stats.json"


@dataclass
class IndexConfig:
    """Declarative index config (the reference's schema/configset analog)."""

    text_col: str = "text"
    conv_cols: tuple[str, str] | None = ("conv_id", "turn_idx")
    doc_id_col: str | None = None      # direct mode: use this int64 column
    stop_words: frozenset[str] | None = ENGLISH_STOP_WORDS
    stemming: bool = True
    n_buckets: int = 8                 # term-hash shards (merge checkpoint unit)
    hot_df_threshold: int = 50_000     # global df above this => salt the term
    n_salts: int = 8
    batch_size: int = 4096
    concurrency: int | tuple[int, int] | None = None  # None → auto pool
    store_positions: bool = True
    # ordered token-filter chain (JSON specs; see analysis.build_filter)
    filters: tuple = ()
    unicode_tokens: bool = False       # UAX#29-ish \pL\pN tokenizer
    # pre-tokenize char-filter chain (JSON specs; analysis.build_char_filter)
    char_filters: tuple = ()
    # tokenizer choice: standard | unicode | whitespace | letter | keyword
    tokenizer: str = "standard"
    # StandardTokenizer maxTokenLength (over-long runs split, upstream
    # default 255)
    max_token_len: int = 255
    # final-index postings codec for the docs/tfs streams: "vbyte"
    # (delta+VByte, writeVInt analog) or "for" (128-value
    # frame-of-reference bitpacked blocks, the Lucene50PostingsFormat/
    # ForUtil analog; VByte tail block). Fragments always stay VByte —
    # they are transient shuffle payload, merged once.
    postings_codec: str = "vbyte"
    # IndexOptions analog (upstream ``IndexOptions.DOCS`` vs
    # ``DOCS_AND_FREQS[_AND_POSITIONS]``): store_freqs=False records
    # every (term, doc) posting with tf = 1 exactly like Lucene's
    # ``PostingsEnum.freq() == 1`` contract for DOCS fields — scoring,
    # merging, splitting and block-max bounds all see tf 1 with zero
    # special-casing downstream. Conformance boundary: the tf stream
    # still spends 1 VByte byte per posting (upstream spends 0 by
    # interleaving a freq-less .doc file); positions require freqs, so
    # store_freqs=False demands store_positions=False (validated at
    # build_index).
    store_freqs: bool = True
    # omitNorms analog: the norm bytes are still written (they ride
    # inside the postings rows) but the manifest records the field as
    # norm-less and every reader scores with the constant norm factor
    # k1 — upstream BM25Similarity with norms == null scores
    # tf/(tf + k1), i.e. the length term (1 - b + b*dl/avgdl) pinned
    # to 1 (``BM25Similarity.BM25Scorer`` [U]).
    omit_norms: bool = False
    # positionIncrementGap analog (upstream ``S/schema/IndexSchema``
    # [U]): > 0 declares text_col MULTIVALUED (``list<string>``); each
    # value analyzes independently and the next value's positions base
    # at last emitted position + 1 + gap, so phrases/spans never match
    # across value boundaries. 0 = single-valued string column.
    value_gap: int = 0

    def to_json(self) -> dict[str, Any]:
        return {
            "text_col": self.text_col,
            "conv_cols": list(self.conv_cols) if self.conv_cols else None,
            "doc_id_col": self.doc_id_col,
            "stop_words": sorted(self.stop_words) if self.stop_words else [],
            "stemming": self.stemming,
            "n_buckets": self.n_buckets,
            "hot_df_threshold": self.hot_df_threshold,
            "n_salts": self.n_salts,
            "store_positions": self.store_positions,
            "filters": [dict(f) for f in self.filters],
            "unicode_tokens": self.unicode_tokens,
            "char_filters": [dict(f) for f in self.char_filters],
            "tokenizer": self.tokenizer,
            "postings_codec": self.postings_codec,
            "max_token_len": self.max_token_len,
            "store_freqs": self.store_freqs,
            "omit_norms": self.omit_norms,
            "value_gap": self.value_gap,
        }

    @staticmethod
    def from_json(d: dict[str, Any]) -> "IndexConfig":
        return IndexConfig(
            text_col=d["text_col"],
            conv_cols=tuple(d["conv_cols"]) if d.get("conv_cols") else None,
            doc_id_col=d.get("doc_id_col"),
            stop_words=frozenset(d.get("stop_words") or []) or None,
            stemming=d["stemming"],
            n_buckets=d["n_buckets"],
            hot_df_threshold=d["hot_df_threshold"],
            n_salts=d["n_salts"],
            store_positions=d.get("store_positions", True),
            filters=tuple(d.get("filters") or ()),
            unicode_tokens=d.get("unicode_tokens", False),
            char_filters=tuple(d.get("char_filters") or ()),
            tokenizer=d.get("tokenizer", "standard"),
            postings_codec=d.get("postings_codec", "vbyte"),
            max_token_len=d.get("max_token_len", 255),
            store_freqs=d.get("store_freqs", True),
            omit_norms=d.get("omit_norms", False),
            value_gap=d.get("value_gap", 0),
        )


def term_bucket(term: str, n_buckets: int) -> int:
    """Stable (process-independent) term → bucket hash."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def _term_buckets(terms: np.ndarray, n_buckets: int) -> np.ndarray:
    crc = zlib.crc32
    return np.fromiter(
        (crc(t.encode("utf-8")) % n_buckets for t in terms),
        dtype=np.int32, count=len(terms))


# --------------------------------------------------------------- stage 0

def _conv_partial(path: str, conv_col: str, turn_col: str) -> pa.Table:
    t = pq.read_table(path, columns=[conv_col, turn_col])
    g = t.group_by(conv_col).aggregate(
        [(turn_col, "count"), (turn_col, "max")])
    return g.rename_columns([conv_col, "cnt", "mx"])


def build_docmap(files: list[str], cfg: IndexConfig, index_dir: str,
                 combine: str = "auto") -> int:
    """conv_id → docID base table; returns corpus doc count N.

    ``doc_id = base[conv_id] + turn_idx`` equals the rank of
    (conv_id, turn_idx) in the globally sorted corpus because turn_idx
    is contiguous from 0 within each conversation (validated here).

    Two combine strategies over the per-file partials (a pruned
    2-column read + grouped count per file):

    - ``driver`` — concat + one pyarrow group_by on the driver.
      Fastest at seconds-scale inputs (a full Dataset job costs a
      flat ~4.5 s of scheduling at every cluster width), but driver
      memory is O(Σ per-file convs).
    - ``distributed`` — the 10^12-turn path: a Ray Data
      groupby(conv) second-level combine, a range-partitioning sort,
      per-block turn totals (the only driver state: one int per
      block) cumsummed into block base offsets, and the docmap
      written as sorted part files under ``docmap.parquet/`` (a
      directory — ``pq.read_table`` reads it back in sorted part
      order). Driver memory is O(#blocks), independent of conv count.

    ``auto`` picks ``driver`` below 65 input files and
    ``distributed`` at or above.
    """
    conv_col, turn_col = cfg.conv_cols  # type: ignore[misc]

    task = ray.remote(_conv_partial)
    refs = [task.remote(f, conv_col, turn_col) for f in files]
    if combine == "auto":
        combine = "driver" if len(files) < 65 else "distributed"
    if combine == "distributed":
        return _docmap_distributed(refs, conv_col, index_dir)
    tab = pa.concat_tables(ray.get(refs)).combine_chunks()
    tab = tab.group_by(conv_col).aggregate([("cnt", "sum"), ("mx", "max")])
    counts = tab["cnt_sum"].to_numpy().astype(np.int64)
    maxes = tab["mx_max"].to_numpy().astype(np.int64)
    if not np.array_equal(maxes + 1, counts):
        bad = tab[conv_col][int(np.argmax(maxes + 1 != counts))]
        raise ValueError(
            f"turn_idx not contiguous from 0 for conv {bad}; "
            "docID-by-rank invariant requires contiguous turns")
    order = pc.sort_indices(tab[conv_col])
    convs = tab[conv_col].take(order)
    counts = counts[order.to_numpy()]
    bases = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=bases[1:])
    out = pa.table({conv_col: convs,
                    "base": pa.array(bases),
                    "n_turns": pa.array(counts)})
    pq.write_table(out, os.path.join(index_dir, DOCMAP_NAME))
    return int(counts.sum())


def _docmap_distributed(refs: list, conv_col: str,
                        index_dir: str) -> int:
    """Second-level docmap combine as a Ray Data job (see
    :func:`build_docmap`). The docstring's promised shape: partials →
    hash-partitioned groupby → range-partitioned sorted blocks →
    per-block prefix-sum stitch — driver holds one integer per block.
    """
    import ray.data
    from ray.data.aggregate import Max, Sum

    ds = ray.data.from_arrow_refs(refs)
    agg = ds.groupby(conv_col).aggregate(Sum("cnt"), Max("mx")) \
        .materialize()
    srt = agg.sort(conv_col).materialize()
    blocks = srt.to_arrow_refs()

    @ray.remote
    def _block_stats(t: pa.Table) -> tuple[int, int]:
        if t.num_rows == 0:
            return 0, 0
        cnt = t["sum(cnt)"].to_numpy().astype(np.int64)
        mx = t["max(mx)"].to_numpy().astype(np.int64)
        if not np.array_equal(mx + 1, cnt):
            bad = t[conv_col][int(np.argmax(mx + 1 != cnt))]
            raise ValueError(
                f"turn_idx not contiguous from 0 for conv {bad}; "
                "docID-by-rank invariant requires contiguous turns")
        return t.num_rows, int(cnt.sum())

    stats = ray.get([_block_stats.remote(r) for r in blocks])
    turn_totals = np.array([s[1] for s in stats], dtype=np.int64)
    block_bases = np.zeros(len(stats), dtype=np.int64)
    np.cumsum(turn_totals[:-1], out=block_bases[1:])

    out_dir = os.path.join(index_dir, DOCMAP_NAME)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def _write_part(t: pa.Table, base0: int, path: str) -> None:
        cnt = t["sum(cnt)"].to_numpy().astype(np.int64)
        bases = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(cnt[:-1], out=bases[1:])
        out = pa.table({conv_col: t[conv_col],
                        "base": pa.array(bases + base0),
                        "n_turns": pa.array(cnt)})
        tmp = path + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, path)

    writes = [
        _write_part.remote(
            r, int(block_bases[i]),
            os.path.join(out_dir, f"part-{i:05d}.parquet"))
        for i, r in enumerate(blocks) if stats[i][0]]
    ray.get(writes)
    if not writes:                     # empty corpus: keep schema
        pq.write_table(
            pa.table({conv_col: pa.array([], type=pa.string()),
                      "base": pa.array([], type=pa.int64()),
                      "n_turns": pa.array([], type=pa.int64())}),
            os.path.join(out_dir, "part-00000.parquet"))
    return int(turn_totals.sum())


# --------------------------------------------------------------- stage A

class FragmentBuilder:
    """Actor-pool stage: Arrow batch of turns → posting-fragment rows.

    Analyzer tables, the conv→base docmap and the part lookup are built
    once per actor (``__init__``); per-batch work is fully vectorized
    (SURVEY.md §2.3 DWPT analog).
    """

    def __init__(self, cfg_json: dict[str, Any], index_dir: str,
                 part_of_path: dict[str, int], corpus_n: int):
        cfg = IndexConfig.from_json(cfg_json)
        self.cfg = cfg
        self.analyzer = Analyzer(cfg.stop_words, cfg.stemming,
                                 cfg.filters, cfg.unicode_tokens,
                                 cfg.char_filters,
                                 tokenizer=cfg.tokenizer,
                                 max_token_len=cfg.max_token_len)
        self.part_of_path = part_of_path
        self.corpus_n = max(1, int(corpus_n))
        if cfg.conv_cols is not None:
            dm = pq.read_table(os.path.join(index_dir, DOCMAP_NAME))
            self.conv_values = dm[cfg.conv_cols[0]].combine_chunks()
            self.conv_bases = dm["base"].to_numpy().astype(np.int64)
        else:
            self.conv_values = None
            self.conv_bases = None

    def _doc_ids(self, batch: pa.Table) -> np.ndarray:
        cfg = self.cfg
        if cfg.doc_id_col is not None:
            return batch[cfg.doc_id_col].to_numpy().astype(np.int64)
        conv_col, turn_col = cfg.conv_cols  # type: ignore[misc]
        idx = pc.index_in(batch[conv_col], value_set=self.conv_values)
        if idx.null_count:
            raise ValueError("conv_id missing from docmap (stale stage 0?)")
        base = self.conv_bases[idx.to_numpy(zero_copy_only=False).astype(np.int64)]
        return base + batch[turn_col].to_numpy().astype(np.int64)

    def _buckets(self, terms: np.ndarray) -> np.ndarray:
        """term → bucket over the batch's unique terms: one Arrow
        string array + buffer-slice crc pass (C speed, identical
        values to ``term_bucket``) — no per-term dict traffic."""
        arr = pa.array(terms, type=pa.string())
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int32)[: len(arr) + 1]
        mv = memoryview(bufs[2])
        crc = zlib.crc32
        h = np.fromiter((crc(mv[offs[i]:offs[i + 1]])
                         for i in range(len(arr))),
                        dtype=np.uint32, count=len(arr))
        return (h % np.uint32(self.cfg.n_buckets)).astype(np.int32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = np.asarray(batch["path"].to_pandas(), dtype=object)
        uniq = np.unique(paths)
        out: list[pa.Table] = []
        if len(uniq) == 1:
            out.append(self._build(batch, self.part_of_path[uniq[0]]))
        else:  # batch spans input files: split so fragments keep one part_id
            for p in uniq:
                sub = batch.filter(pa.array(paths == p))
                if sub.num_rows:
                    out.append(self._build(sub, self.part_of_path[p]))
        out = [t for t in out if t.num_rows]
        if not out:
            return _empty_fragment_table()
        return pa.concat_tables(out)

    def _build(self, batch: pa.Table, part_id: int) -> pa.Table:
        cfg = self.cfg
        doc_ids = self._doc_ids(batch)
        if cfg.value_gap > 0:       # multivalued list<string> field
            _, tcode, uniq_terms, positions, doc_lens = \
                self.analyzer.analyze_multivalued(batch[cfg.text_col],
                                                  cfg.value_gap)
        else:
            _, tcode, uniq_terms, positions, doc_lens = \
                self.analyzer.analyze_encoded(batch[cfg.text_col])
        if tcode.size == 0:
            return _empty_fragment_table()
        norm_bytes = encode_lengths(doc_lens)
        n_docs = len(doc_lens)
        tok_doc = np.repeat(np.arange(n_docs, dtype=np.int64), doc_lens)

        order = np.lexsort((positions, tok_doc, tcode))
        t_s, d_s, p_s = tcode[order], tok_doc[order], positions[order]

        chg = np.empty(t_s.size, dtype=bool)
        chg[0] = True
        chg[1:] = (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])
        pstart = np.flatnonzero(chg)                       # token idx of each posting
        tfs = np.diff(np.append(pstart, t_s.size)).astype(np.int32)
        if not cfg.store_freqs:  # IndexOptions.DOCS: freq() == 1
            tfs = np.ones_like(tfs)
        p_t = t_s[pstart]                                  # term code per posting
        p_d = d_s[pstart]                                  # batch-doc per posting

        tchg = np.empty(p_t.size, dtype=bool)
        tchg[0] = True
        tchg[1:] = p_t[1:] != p_t[:-1]
        term_pstart = np.flatnonzero(tchg)                 # posting idx per term
        terms_present = uniq_terms[p_t[term_pstart]]

        doc_vals = doc_ids[p_d]
        norm_vals = norm_bytes[p_d]
        n_terms = len(terms_present)
        post_bounds = np.append(term_pstart, p_t.size).astype(np.int64)
        tok_bounds = np.append(pstart[term_pstart], t_s.size).astype(np.int64)
        dfs = np.diff(post_bounds).astype(np.int32)

        # Fragments carry per-term VByte blobs (the DWPT flush writes a
        # compressed mini-segment): ~4x smaller shuffle than Arrow list
        # columns and no list re-assembly on read. One vectorized
        # encode per stream; per-term cells cut from the byte ends.
        doc_deltas = np.empty_like(doc_vals)
        doc_deltas[0] = doc_vals[0]
        np.subtract(doc_vals[1:], doc_vals[:-1], out=doc_deltas[1:])
        doc_deltas[term_pstart] = doc_vals[term_pstart]  # fragment-absolute
        docs_blob, doc_ends = vbyte_encode_with_ends(doc_deltas)
        tfs_blob, tf_ends = vbyte_encode_with_ends(tfs.astype(np.int64))
        if cfg.store_positions and p_s.size:
            pos_vals = p_s.astype(np.int64)
            pos_deltas = np.empty_like(pos_vals)
            pos_deltas[0] = pos_vals[0]
            np.subtract(pos_vals[1:], pos_vals[:-1], out=pos_deltas[1:])
            pos_deltas[pstart] = pos_vals[pstart]  # per-posting reset
            poss_blob, pos_ends = vbyte_encode_with_ends(pos_deltas)
        else:
            poss_blob, pos_ends = b"", np.empty(0, dtype=np.int64)
            tok_bounds = np.zeros(n_terms + 1, dtype=np.int64)

        docs_col = _bin_col(docs_blob, doc_ends, post_bounds)
        tfs_col = _bin_col(tfs_blob, tf_ends, post_bounds)
        norms_col = _bin_col(norm_vals.tobytes(), None, post_bounds)
        poss_col = _bin_col(poss_blob, pos_ends, tok_bounds)

        # LOCAL hot-term salting (no global pass needed): a term whose
        # batch-local df exceeds the threshold scaled to the batch's
        # share of the corpus is salted by part_id % n_salts. Bound: an
        # unsalted term's merge group is ≤ hot_df_threshold postings in
        # total (sum over batches of the local threshold), so no merge
        # group can blow up — the skew guarantee with zero extra I/O.
        local_thresh = self.cfg.hot_df_threshold * (n_docs / self.corpus_n)
        salted = dfs.astype(np.float64) > local_thresh
        salt_val = part_id % self.cfg.n_salts
        # sub 0 = the unsalted group; salted groups use salt+1
        salts = np.where(salted, salt_val + 1, 0).astype(np.int32)
        keys = terms_present.copy()
        if salted.any():
            for i in np.flatnonzero(salted):
                keys[i] = f"{terms_present[i]}\x01{salt_val}"

        return pa.table({
            "term": pa.array(terms_present, type=pa.string()),
            "merge_key": pa.array(keys, type=pa.string()),
            "salt": pa.array(salts, type=pa.int32()),
            "bucket": pa.array(self._buckets(terms_present), type=pa.int32()),
            "part_id": pa.array(np.full(n_terms, part_id, dtype=np.int32)),
            "min_doc": pa.array(doc_vals[term_pstart], type=pa.int64()),
            "df": pa.array(dfs),
            "docs": docs_col,
            "tfs": tfs_col,
            "norms": norms_col,
            "poss": poss_col,
        })


def _bin_col(blob: bytes, ends: np.ndarray | None,
             bounds: np.ndarray) -> pa.Array:
    """Binary array whose cell i spans values [bounds[i], bounds[i+1])
    of one encoded stream; ``ends`` = per-value cumulative byte ends
    (None → fixed 1 byte per value)."""
    if ends is None:
        offs = bounds.astype(np.int32)
    else:
        offs = np.zeros(len(bounds), dtype=np.int32)
        nz = bounds > 0
        if len(ends):
            offs[nz] = ends[bounds[nz] - 1].astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), len(bounds) - 1,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(blob)])


def _empty_fragment_table() -> pa.Table:
    i32 = pa.int32()
    return pa.table({
        "term": pa.array([], type=pa.string()),
        "merge_key": pa.array([], type=pa.string()),
        "salt": pa.array([], type=i32),
        "bucket": pa.array([], type=i32),
        "part_id": pa.array([], type=i32),
        "min_doc": pa.array([], type=pa.int64()),
        "df": pa.array([], type=i32),
        "docs": pa.array([], type=pa.binary()),
        "tfs": pa.array([], type=pa.binary()),
        "norms": pa.array([], type=pa.binary()),
        "poss": pa.array([], type=pa.binary()),
    })


# --------------------------------------------------------------- stage B

def _merge_group(group: pa.Table, codec: str = "vbyte") -> pa.Table:
    """One merge group (a term, or one salt of a hot term) → one index row.

    Fragments cover disjoint doc sets; concatenating them in min_doc
    order is a linear merge (SegmentMerger analog). Falls back to a
    full argsort only if ranges interleave (unsorted input corpus).
    """
    term = group["term"][0].as_py()
    sub = int(group["salt"][0].as_py()) if "salt" in group.column_names else 0
    min_docs = group["min_doc"].to_numpy()
    order = np.argsort(min_docs, kind="stable")
    dfs = group["df"].to_numpy().astype(np.int64)
    cells = {c: group[c].to_pylist()
             for c in ("docs", "tfs", "norms", "poss")}

    docs_l: list[np.ndarray] = []
    tfs_l: list[np.ndarray] = []
    norms_l: list[np.ndarray] = []
    poss_l: list[np.ndarray] = []
    for i in order:
        df = int(dfs[i])
        deltas, _ = vbyte_decode(cells["docs"][i], df)
        docs_l.append(np.cumsum(deltas))
        tf_i, _ = vbyte_decode(cells["tfs"][i], df)
        tfs_l.append(tf_i)
        norms_l.append(np.frombuffer(cells["norms"][i], dtype=np.uint8))
        pblob = cells["poss"][i]
        if len(pblob):
            total = int(tf_i.sum())
            pdel, _ = vbyte_decode(pblob, total)
            flat_p = np.cumsum(pdel)
            starts = np.concatenate(([0], np.cumsum(tf_i)[:-1]))
            bases = flat_p[starts] - pdel[starts]
            poss_l.append(flat_p - np.repeat(bases, tf_i))

    docs = np.concatenate(docs_l)
    tfs = np.concatenate(tfs_l)
    norms = np.concatenate(norms_l)
    poss = np.concatenate(poss_l) if poss_l else np.empty(0, dtype=np.int64)
    if docs.size > 1 and not (docs[1:] > docs[:-1]).all():
        # interleaved fragments: re-sort postings (and positions) by doc
        porder = np.argsort(docs, kind="stable")
        tok_offs = np.concatenate(([0], np.cumsum(tfs)))
        tok_idx = np.concatenate(
            [np.arange(tok_offs[i], tok_offs[i + 1]) for i in porder]) \
            if poss.size else np.empty(0, np.int64)
        docs, tfs, norms = docs[porder], tfs[porder], norms[porder]
        poss = poss[tok_idx] if poss.size else poss

    enc = encode_postings(docs, tfs, norms, poss, codec=codec)
    return _index_row(term, sub, enc, int(docs[0]))


def _index_row(term: str, sub: int, enc, min_doc: int) -> pa.Table:
    return pa.table({
        "term": pa.array([term], type=pa.string()),
        "sub": pa.array([sub], type=pa.int32()),
        "df": pa.array([enc.df], type=pa.int64()),
        "cf": pa.array([enc.cf], type=pa.int64()),
        "min_doc": pa.array([min_doc], type=pa.int64()),
        "docs": pa.array([enc.docs], type=pa.binary()),
        "tfs": pa.array([enc.tfs], type=pa.binary()),
        "norms": pa.array([enc.norms], type=pa.binary()),
        "poss": pa.array([enc.poss], type=pa.binary()),
        "blk_last_doc": pa.array([enc.blk_last_doc.tobytes()], type=pa.binary()),
        "blk_doc_off": pa.array([enc.blk_doc_off.tobytes()], type=pa.binary()),
        "blk_tf_off": pa.array([enc.blk_tf_off.tobytes()], type=pa.binary()),
        "blk_pos_off": pa.array([enc.blk_pos_off.tobytes()], type=pa.binary()),
        "blk_max_tf": pa.array([enc.blk_max_tf.tobytes()], type=pa.binary()),
        "blk_min_norm": pa.array([enc.blk_min_norm.tobytes()], type=pa.binary()),
    })


def _merged(frag: ray.data.Dataset) -> ray.data.Dataset:
    """The explicit hash shuffle on (possibly salted) merge_key.

    Kept as the Dataset-native reference path (per-group Python) —
    production merges go through :func:`_merge_bucket_table`, which is
    equivalent (tested) but vectorized across a bucket's whole term
    set."""
    return frag.groupby("merge_key") \
        .map_groups(_merge_group, batch_format="pyarrow")


_FRAG_COLS = ["term", "merge_key", "salt", "min_doc", "df",
              "docs", "tfs", "norms", "poss"]


def _cell_stream(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Binary column -> (concatenated cell bytes, per-cell bounds).

    Arrow binary layout guarantees cells are contiguous ascending in
    the values buffer, so the concatenation is a zero-copy slice."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data[offs[0]:offs[-1]], offs - offs[0]


def _merge_bucket_table(tab: pa.Table,
                        codec: str = "vbyte") -> pa.Table | None:
    """All fragment rows of one bucket → index rows, vectorized.

    The SegmentMerger analog at realistic term-dictionary scale: ONE
    Arrow sort by (merge_key, min_doc), ONE VByte decode per stream,
    segmented-cumsum rebasing, then :func:`encode_postings_multi` —
    constant numpy-kernel count regardless of how many terms the
    bucket holds (the per-term ``map_groups`` version was 6× slower
    end-to-end at a 10^5-term vocabulary)."""
    if tab.num_rows == 0:
        return None
    tab = tab.sort_by([("merge_key", "ascending"),
                       ("min_doc", "ascending")]).combine_chunks()
    dfs = tab["df"].to_numpy().astype(np.int64)
    n_frag = len(dfs)
    frag_cuts = np.concatenate(([0], np.cumsum(dfs)))
    total = int(frag_cuts[-1])

    d_stream, _ = _cell_stream(tab["docs"])
    deltas, _ = vbyte_decode(d_stream, total, 0)
    fs = frag_cuts[:-1]
    cs = np.cumsum(deltas)
    base = cs[fs] - deltas[fs]
    docs = cs - np.repeat(base, dfs)

    t_stream, _ = _cell_stream(tab["tfs"])
    tfs, _ = vbyte_decode(t_stream, total, 0)
    n_stream, _ = _cell_stream(tab["norms"])
    norms = n_stream.copy()  # 1 byte per posting

    p_stream, _ = _cell_stream(tab["poss"])
    if p_stream.size:
        total_tok = int(tfs.sum())
        pdeltas, _ = vbyte_decode(p_stream, total_tok, 0)
        tok_cuts = np.concatenate(([0], np.cumsum(tfs)))
        ps = tok_cuts[:-1]
        pcs = np.cumsum(pdeltas)
        pbase = pcs[ps] - pdeltas[ps]
        flat_pos = pcs - np.repeat(pbase, tfs)
    else:
        flat_pos = None
        tok_cuts = None

    mk = np.asarray(tab["merge_key"].to_pandas(), dtype=object)
    gchg = np.empty(n_frag, dtype=bool)
    gchg[0] = True
    gchg[1:] = mk[1:] != mk[:-1]
    gfrag_start = np.flatnonzero(gchg)
    group_offsets = frag_cuts[np.append(gfrag_start, n_frag)]

    # fragments of a group cover disjoint, min_doc-ordered ranges, so
    # the concatenation is already sorted; detect the rare interleaved
    # case (unsorted input corpus) and re-sort just those groups
    gposting_start = frag_cuts[gfrag_start]
    exempt = np.zeros(total, dtype=bool)
    exempt[gposting_start] = True
    viol = np.flatnonzero((np.diff(docs) <= 0) & ~exempt[1:]) + 1
    if viol.size:
        bad_groups = np.unique(
            np.searchsorted(group_offsets, viol, side="right") - 1)
        for g in bad_groups:
            s, e = int(group_offsets[g]), int(group_offsets[g + 1])
            order = np.argsort(docs[s:e], kind="stable")
            if flat_pos is not None:
                tok_idx = np.concatenate(
                    [np.arange(tok_cuts[s + i], tok_cuts[s + i + 1])
                     for i in order])
                flat_pos[tok_cuts[s]:tok_cuts[e]] = \
                    flat_pos[tok_cuts[s]:tok_cuts[e]][
                        tok_idx - tok_cuts[s]]
            docs[s:e] = docs[s:e][order]
            tfs[s:e] = tfs[s:e][order]
            norms[s:e] = norms[s:e][order]
        if flat_pos is not None and viol.size:
            # tfs changed per-posting order; rebuild token cuts
            tok_cuts = np.concatenate(([0], np.cumsum(tfs)))

    enc = encode_postings_multi(group_offsets, docs, tfs, norms, flat_pos,
                                codec=codec)
    gs = pa.array(gfrag_start)
    terms = tab["term"].take(gs)
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    subs = tab["salt"].to_numpy()[gfrag_start].astype(np.int32)
    return _multi_index_table(terms, subs, enc)


def _multi_index_table(terms: pa.Array, subs: np.ndarray,
                       enc) -> pa.Table:
    """Zero-copy Arrow table from a MultiEncodedPostings (same schema
    as :func:`_index_row`)."""
    def bcol(blob, offs) -> pa.Array:
        o = np.asarray(offs, dtype=np.int64)
        if o.size and int(o[-1]) > (1 << 31) - 1:
            raise ValueError("bucket blob exceeds 2 GiB binary column; "
                             "raise n_buckets")
        return pa.Array.from_buffers(
            pa.binary(), len(o) - 1,
            [None, pa.py_buffer(o.astype(np.int32).tobytes()),
             pa.py_buffer(blob)])

    blk = enc.blk_offs
    return pa.table({
        "term": terms,
        "sub": pa.array(subs, type=pa.int32()),
        "df": pa.array(enc.df, type=pa.int64()),
        "cf": pa.array(enc.cf, type=pa.int64()),
        "min_doc": pa.array(enc.min_doc, type=pa.int64()),
        "docs": bcol(enc.docs, enc.docs_offs),
        "tfs": bcol(enc.tfs, enc.tfs_offs),
        "norms": bcol(enc.norms, enc.norms_offs),
        "poss": bcol(enc.poss, enc.poss_offs),
        "blk_last_doc": bcol(enc.blk_last_doc.tobytes(), blk * 8),
        "blk_doc_off": bcol(enc.blk_doc_off.tobytes(), blk * 4),
        "blk_tf_off": bcol(enc.blk_tf_off.tobytes(), blk * 4),
        "blk_pos_off": bcol(enc.blk_pos_off.tobytes(), blk * 4),
        "blk_max_tf": bcol(enc.blk_max_tf.tobytes(), blk * 4),
        "blk_min_norm": bcol(enc.blk_min_norm.tobytes(), blk * 1),
    })


def _merge_bucket_files(frag_dir: str, shard_dir: str,
                        codec: str = "vbyte") -> int:
    """Read one bucket's fragments, merge vectorized, write its shard.
    Returns #index rows (0 for an empty bucket)."""
    if not os.path.isdir(frag_dir):
        os.makedirs(shard_dir, exist_ok=True)
        return 0
    tab = pq.read_table(frag_dir, columns=_FRAG_COLS)
    out = _merge_bucket_table(tab, codec=codec)
    os.makedirs(shard_dir, exist_ok=True)
    if out is None:
        return 0
    pq.write_table(out, os.path.join(shard_dir, "merged-0.parquet"))
    trigram.write_sidecar(shard_dir, out["term"])
    return out.num_rows


def _bucket_stats(shard_dir: str) -> dict[str, Any]:
    if not os.path.isdir(shard_dir) or not any(
            f.endswith(".parquet") for f in os.listdir(shard_dir)):
        return {"status": "done", "n_terms": 0, "sum_cf": 0,
                "n_postings": 0, "n_hot": 0}
    back = pq.read_table(shard_dir, columns=["term", "df", "cf", "sub"])
    hot = back.filter(pc.greater(back["sub"], 0))
    return {
        "status": "done",
        "n_terms": len(pc.unique(back["term"])),
        "sum_cf": int(pc.sum(back["cf"]).as_py() or 0),
        "n_postings": int(pc.sum(back["df"]).as_py() or 0),
        "n_hot": len(pc.unique(hot["term"])) if hot.num_rows else 0,
    }


def _merge_bucket_segment(index_dir: str, root: str, bucket: int,
                          part_ids: list[int], codec: str
                          ) -> dict[str, Any]:
    """Segment-append merge for one bucket: ONLY the new parts'
    fragments merge into ONE new shard file; existing files are never
    read or touched (the append costs O(new data)). The file lands via
    staging-dir write + atomic rename keyed by the part-id set, so a
    crashed/rerun append overwrites its own segment instead of
    duplicating postings."""
    import hashlib

    frag_root = os.path.join(index_dir, "fragments", f"bucket={bucket}")
    files: list[str] = []
    for p in part_ids:
        d = os.path.join(frag_root, f"part_id={p}")
        if os.path.isdir(d):
            files += [os.path.join(d, f) for f in sorted(os.listdir(d))
                      if f.endswith(".parquet")]
    shard_dir = os.path.join(root, f"bucket={bucket}")
    os.makedirs(shard_dir, exist_ok=True)
    if files:
        tab = pq.read_table(files, columns=_FRAG_COLS)
        out = _merge_bucket_table(tab, codec=codec)
        if out is not None and out.num_rows:
            tag = hashlib.md5(",".join(
                map(str, sorted(part_ids))).encode()).hexdigest()[:10]
            staging = os.path.join(index_dir, "staging")
            os.makedirs(staging, exist_ok=True)
            tmp = os.path.join(staging, f"b{bucket}-seg-{tag}.tmp")
            pq.write_table(out, tmp)
            os.replace(tmp, os.path.join(shard_dir,
                                         f"seg-{tag}.parquet"))
            trigram.write_sidecar(shard_dir)
    return _bucket_stats(shard_dir)


def merge_bucket(index_dir: str, bucket: int, cfg: IndexConfig
                 ) -> dict[str, Any]:
    """Merge one term-hash bucket's fragments into its index shard
    (the per-bucket resume path)."""
    frag_dir = os.path.join(index_dir, "fragments", f"bucket={bucket}")
    shard_dir = os.path.join(index_dir, "index", f"bucket={bucket}")
    if os.path.exists(shard_dir):
        shutil.rmtree(shard_dir)
    _merge_bucket_files(frag_dir, shard_dir,
                        codec=cfg.postings_codec)
    return _bucket_stats(shard_dir)


def merge_all_buckets(index_dir: str, cfg: IndexConfig
                      ) -> dict[str, dict[str, Any]]:
    """Fresh-build fast path: every bucket merges as an independent
    Ray task in parallel — the fragment write already hash-partitioned
    by ``bucket=H(term)``, so this IS the reduce side of the term
    shuffle with no extra exchange (each task reads only its bucket's
    hive partition)."""
    frag_root = os.path.join(index_dir, "fragments")
    index_root = os.path.join(index_dir, "index")
    if os.path.exists(index_root):
        shutil.rmtree(index_root)

    # Admission control: merge tasks are DRAM-bandwidth-bound (decode +
    # sort + encode streams), so running cluster-width of them thrashes
    # shared memory bandwidth (measured: 16 concurrent merges on 32
    # cpus SLOWER than 8). Reserve multiple logical CPUs per task to
    # cap concurrency at ~cpus/4 (min 2 concurrent); on a multi-node
    # cluster each node brings its own DRAM so the reservation scales
    # naturally with node count.
    cpus = int(ray.cluster_resources().get("CPU", 4))
    ncpu = max(1, min(4, cpus // 8))
    merge_task = ray.remote(num_cpus=ncpu)(_merge_bucket_files)
    futs = {
        b: merge_task.remote(
            os.path.join(frag_root, f"bucket={b}"),
            os.path.join(index_root, f"bucket={b}"),
            cfg.postings_codec)
        for b in range(cfg.n_buckets)
    }
    for b, f in futs.items():
        ray.get(f)
    return {
        str(b): _bucket_stats(os.path.join(index_root, f"bucket={b}"))
        for b in range(cfg.n_buckets)
    }


# --------------------------------------------------------------- driver


def _doc_id_bound(files: list[str], col: str) -> int:
    """max(doc_id)+1 across files — Parquet row-group statistics only
    (no data read); falls back to a column scan when a writer omitted
    stats. External doc_ids may be SPARSE (e.g. live subsets after an
    upstream delete), so the doc-space bound is NOT the row count."""
    bound = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        ci = md.schema.to_arrow_schema().get_field_index(col)
        file_max = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                file_max = None
                break
            m = int(st.max)
            file_max = m if file_max is None else max(file_max, m)
        if file_max is None:
            file_max = int(pa.compute.max(
                pq.read_table(f, columns=[col])[col]).as_py() or -1)
        bound = max(bound, file_max + 1)
    return bound


def build_index(input_path: str | list[str], index_dir: str,
                cfg: IndexConfig | None = None,
                resume: bool = True,
                append_mode: str = "rewrite") -> dict[str, Any]:
    """Full build: stages 0/A/B/C. Returns the committed manifest.

    ``input_path``: a directory of Parquet files or an explicit list.
    Resumable: finished input parts and merged buckets are skipped on
    rerun (per-partition lineage in the manifest).

    ``append_mode`` governs what an incremental append (new input
    files over a complete doc_id-mode index) costs:

    - ``"rewrite"`` (default): every bucket re-merges from ALL
      fragments — one sub-list per term per bucket, but an append
      rewrites the whole index (forceMerge-per-commit).
    - ``"segment"``: each bucket gains ONE new segment file merged
      from only the NEW parts' fragments (upstream's add-then-merge
      segment lifecycle, ``IndexWriter`` flush → ``TieredMergePolicy``
      [U]); existing shard files are untouched, so the append costs
      O(new data), not O(index). Terms then have one sub-list per
      append — readers already re-merge/multi-iterate sub-lists
      (salting uses the same layout); run :func:`maybe_merge`
      periodically to bound the per-bucket segment count, or
      :func:`optimize_index` to collapse to one. A delete-folded
      index keeps its live-only stats (tombstones stay reclaimed;
      the rewrite path instead resurrects them from fragments).
    """
    import time as _time

    phase_sec: dict[str, float] = {}
    explicit_cfg = cfg is not None
    cfg = cfg or IndexConfig()
    if not cfg.store_freqs and cfg.store_positions:
        raise ValueError(
            "store_freqs=False (IndexOptions.DOCS) requires "
            "store_positions=False — positions are grouped by tf")
    os.makedirs(index_dir, exist_ok=True)
    if isinstance(input_path, str):
        files = sorted(
            os.path.join(input_path, f) for f in os.listdir(input_path)
            if f.endswith(".parquet"))
    else:
        files = sorted(input_path)
    if not files:
        raise ValueError(f"no parquet inputs under {input_path!r}")

    man = mf.load(index_dir) if resume else None
    append_new: list[str] = []
    if man is not None and man.get("input_files") != sorted(files):
        # incremental append (the updateDocument add-side, upstream
        # ``IndexWriter#addDocument`` on an existing index [U]): in
        # doc_id mode docIDs are externally stable, so NEW input files
        # become new parts — stage A analyzes only them, stage B
        # re-merges their fragments with the existing ones (the
        # add-then-merge segment lifecycle). conv mode cannot append
        # (docID = sort rank shifts), so it rebuilds. Updates =
        # delete_docs(old ids) + append the new version under fresh ids.
        old = man.get("input_files") or []
        new_only = sorted(set(files) - set(old))
        if (set(old) < set(files)
                and len(old) + len(new_only) == len(files)
                and (man.get("config") or {}).get("doc_id_col")):
            append_new = new_only
        else:
            man = None  # input changed: rebuild
    if man is not None:
        if not explicit_cfg:
            # no config given: adopt the stored one (pure resume)
            cfg = IndexConfig.from_json(man["config"])
        elif man["config"] != cfg.to_json():
            man = None  # config changed: treat like an input change
    if man is None:
        man = mf.new_manifest(files, cfg.to_json())
        for d in ("fragments", "index", "index-opt"):
            p = os.path.join(index_dir, d)
            if os.path.exists(p):
                shutil.rmtree(p)
        for d in os.listdir(index_dir):
            if d.startswith("index-g"):
                shutil.rmtree(os.path.join(index_dir, d))
    elif append_new and append_mode == "segment":
        # segment append: new parts only; existing shards untouched
        old_files = list(man["input_files"])
        man["input_files"] = old_files + append_new
        new_ids = [len(old_files) + i for i in range(len(append_new))]
        man["segment_append"] = {"parts": new_ids}
        man["status"] = "building"
        for v in man["buckets"].values():
            v["status"] = "stale"      # re-stat after the segment lands
        man["stats"]["N"] = int(man["stats"]["N"]) + sum(
            pq.ParquetFile(f).metadata.num_rows for f in append_new)
        man["stats"]["max_doc"] = max(
            int(man["stats"].get("max_doc", 0)),
            _doc_id_bound(append_new, cfg.doc_id_col))
        man["stats"].pop("optimized", None)
        man.pop("stored", None)        # stored fields must be rebuilt
        mf.save(index_dir, man)
    elif append_new:
        if man.get("no_fragments"):
            raise ValueError(
                "this index carries no fragment lineage (split child); "
                "append with append_mode='segment'")
        # stable part ids: append to the manifest's file order
        man["input_files"] = list(man["input_files"]) + append_new
        man["status"] = "building"
        man["buckets"] = {}            # all merges invalidated
        man["stats"]["N"] = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in man["input_files"])
        man["stats"]["max_doc"] = _doc_id_bound(
            man["input_files"], cfg.doc_id_col)
        man["stats"].pop("optimized", None)
        man.pop("stored", None)        # stored fields must be rebuilt
        folded = man.pop("folded_deletes", None)
        if folded:
            # the re-merge rebuilds from FRAGMENTS, which still hold
            # the postings a delete-folding optimize reclaimed — the
            # tombstones must come back as an active delete list or
            # those docs would silently resurrect
            old = pq.read_table(os.path.join(
                index_dir, folded["file"]))["doc_id"].to_numpy()
            cur = man.get("deletes")
            ids = old
            if cur:
                cur_ids = pq.read_table(os.path.join(
                    index_dir, cur["file"]))["doc_id"].to_numpy()
                ids = np.union1d(ids, cur_ids)
            gen = max(folded.get("gen", 0),
                      (cur or {}).get("gen", 0)) + 1
            fname = f"deletes-g{gen}.parquet"
            tmp = os.path.join(index_dir, fname + ".tmp")
            pq.write_table(pa.table({
                "doc_id": pa.array(ids, type=pa.int64())}), tmp)
            os.replace(tmp, os.path.join(index_dir, fname))
            man["deletes"] = {"file": fname, "n": int(len(ids)),
                              "gen": gen}
        if man.get("index_dir_name", "index") != "index":
            # merges write the base generation; retire optimized gens
            old_gen = mf.shard_root(index_dir, man)
            man["index_dir_name"] = "index"
            shutil.rmtree(old_gen, ignore_errors=True)
        mf.save(index_dir, man)

    files = list(man["input_files"])   # manifest order = part identity
    part_of_path = {f: i for i, f in enumerate(files)}

    # stage 0 — docID authority (reused verbatim on resume)
    _t0 = _time.perf_counter()
    if cfg.conv_cols is not None and (
            "N" not in man["stats"]
            or not os.path.exists(os.path.join(index_dir, DOCMAP_NAME))):
        man["stats"]["N"] = build_docmap(files, cfg, index_dir)
        man["stats"]["max_doc"] = int(man["stats"]["N"])
        mf.save(index_dir, man)
    elif cfg.doc_id_col is not None and "N" not in man["stats"]:
        # N = total rows: Parquet footers only, no data read
        man["stats"]["N"] = sum(
            pq.ParquetFile(f).metadata.num_rows for f in files)
        man["stats"]["max_doc"] = _doc_id_bound(files, cfg.doc_id_col)
        mf.save(index_dir, man)

    phase_sec["stage0_docmap"] = round(_time.perf_counter() - _t0, 3)

    # stage A — fragments for pending parts
    _t0 = _time.perf_counter()
    done = mf.done_parts(man)
    pending = [f for f in files if part_of_path[f] not in done]
    if pending:
        # clean any half-written fragment dirs for pending parts
        frag_root = os.path.join(index_dir, "fragments")
        if os.path.exists(frag_root):
            pend_ids = {part_of_path[f] for f in pending}
            for bdir in os.listdir(frag_root):
                for pdir in os.listdir(os.path.join(frag_root, bdir)):
                    pid = int(pdir.split("=", 1)[1])
                    if pid in pend_ids:
                        shutil.rmtree(os.path.join(frag_root, bdir, pdir))
        read_cols = [cfg.text_col] + (
            list(cfg.conv_cols) if cfg.conv_cols else [cfg.doc_id_col])
        ds = ray.data.read_parquet(pending, columns=read_cols,
                                   include_paths=True)
        if cfg.concurrency is not None:
            conc = cfg.concurrency
        else:
            # Pool sizing: leave ~1/4 of CPUs for read/write tasks (a
            # pool ≈ cluster width thrashes: measured 5x slowdown at 31
            # actors on 32 CPUs vs 16 actors), and use a fixed pool only
            # when there are enough batches to amortize actor startup.
            cpus = int(ray.cluster_resources().get("CPU", 4))
            # never let the pool cover every CPU (read/write tasks
            # starve -> deadlock at tiny cpu counts)
            full = max(1, min(cpus - 2 if cpus > 3 else cpus - 1,
                              (cpus * 3) // 4, 16))
            n_batches = max(1, int(man["stats"]["N"]) // cfg.batch_size)
            # fixed pool whenever each actor averages ≥4 batches:
            # actors start in PARALLEL, so the wall-clock startup cost
            # is ~one actor init regardless of pool size — the old
            # full*16 threshold left mid-size builds on an autoscaling
            # pool that never ramped past its floor (measured: stage A
            # flat from 4→8 cpus at 300k turns, 2× at 16)
            conc = full if n_batches >= full * 4 else (2, full)
        frags = ds.map_batches(
            FragmentBuilder,
            fn_constructor_args=(cfg.to_json(), index_dir, part_of_path,
                                 int(man["stats"]["N"])),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=conc,
        )
        frags.write_parquet(frag_root, partition_cols=["bucket", "part_id"])
        for f in pending:
            man["parts"][str(part_of_path[f])] = {
                "input_file": f, "status": "done"}
        if not man.get("segment_append"):
            man["buckets"] = {}  # new fragments invalidate prior merges
        mf.save(index_dir, man)

    phase_sec["stageA_fragments"] = round(_time.perf_counter() - _t0, 3)

    # stage B — merge. Fresh build (no bucket done yet): ONE global
    # shuffle job partitioned by bucket. Partial resume: per-bucket
    # jobs, each its own checkpoint. Hot-term stats computed once.
    _t0 = _time.perf_counter()
    done_b = mf.done_buckets(man)
    pending_b = [b for b in range(cfg.n_buckets) if b not in done_b]
    seg = man.get("segment_append")
    if seg:
        # one NEW segment file per bucket from only the new parts'
        # fragments; existing shard files never re-read or rewritten
        root = mf.shard_root(index_dir, man)
        part_ids = list(seg["parts"])
        task = ray.remote(num_cpus=max(1, min(
            4, int(ray.cluster_resources().get("CPU", 4)) // 8)))(
            _merge_bucket_segment)
        futs = {b: task.remote(index_dir, root, b, part_ids,
                               cfg.postings_codec)
                for b in pending_b}
        for b, f in futs.items():
            man["buckets"][str(b)] = ray.get(f)
        man.pop("segment_append", None)
        mf.save(index_dir, man)
    elif pending_b:
        if not done_b:
            man["buckets"] = merge_all_buckets(index_dir, cfg)
            mf.save(index_dir, man)
        else:
            for b in pending_b:
                man["buckets"][str(b)] = merge_bucket(index_dir, b, cfg)
                mf.save(index_dir, man)

    phase_sec["stageB_merge"] = round(_time.perf_counter() - _t0, 3)

    # stage C — commit
    total_cf = sum(v["sum_cf"] for v in man["buckets"].values())
    n_terms = sum(v["n_terms"] for v in man["buckets"].values())
    n_post = sum(v.get("n_postings", 0) for v in man["buckets"].values())
    N = int(man["stats"]["N"])
    man["stats"].update({
        "sum_cf": total_cf,
        "n_terms": n_terms,
        "n_postings": n_post,
        "avgdl": (total_cf / N) if N else 0.0,
        "max_doc": int(man["stats"].get("max_doc", N)),
        "phase_sec": phase_sec,
    })
    man["status"] = "complete"
    mf.save(index_dir, man)
    return man


def add_indexes(out_dir: str, src_dirs: list[str]) -> dict[str, Any]:
    """``IndexWriter.addIndexes(Directory...)`` analog (upstream
    ``L/index/IndexWriter.java#addIndexes`` [U]): merge N COMPLETE
    indexes into a new one WITHOUT re-analysis. The sources' fragment
    files are hardlinked in as already-done parts of the destination
    manifest, so only stage B (the bucket-merge shuffle) and the
    commit run — the segment-concatenation lifecycle. Requirements
    (asserted): doc_id mode, identical IndexConfig, no active deletes
    (fold or carry them first), and disjoint external docID spaces —
    Lucene rebases internal ids by segment base; with external ids
    disjointness is the caller's contract, checked cheaply via Parquet
    footer min/max when available."""
    mans = []
    for s in src_dirs:
        m = mf.load(s)
        assert m and m["status"] == "complete", f"incomplete index: {s}"
        assert (m["config"] or {}).get("doc_id_col"), \
            "addIndexes requires doc_id mode"
        assert not m.get("deletes"), \
            "addIndexes: fold deletes first (optimize_index)"
        mans.append(m)
    cfg_json = mans[0]["config"]
    for m in mans[1:]:
        assert m["config"] == cfg_json, "addIndexes: configs differ"
    cfg = IndexConfig.from_json(cfg_json)

    # cheap disjointness check from Parquet footer stats (skip any
    # file without them)
    ranges = []
    for m in mans:
        lo, hi = None, None
        for f in m["input_files"]:
            try:
                pf = pq.ParquetFile(f)
                ci = pf.schema_arrow.get_field_index(cfg.doc_id_col)
                for rg in range(pf.metadata.num_row_groups):
                    st = pf.metadata.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
            except Exception:  # noqa: BLE001
                lo = hi = None
                break
        ranges.append((lo, hi))
    known = [r for r in ranges if r[0] is not None]
    for i in range(len(known)):
        for j in range(i + 1, len(known)):
            a, b = sorted((known[i], known[j]))
            assert a[1] < b[0], \
                "addIndexes: overlapping docID ranges"

    all_files = []
    for m in mans:
        all_files.extend(m["input_files"])
    assert len(set(all_files)) == len(all_files), \
        "addIndexes: duplicate input file across sources"
    files = sorted(all_files)
    part_of_path = {f: i for i, f in enumerate(files)}

    os.makedirs(out_dir, exist_ok=True)
    for d in ("fragments", "index", "index-opt"):
        p = os.path.join(out_dir, d)
        if os.path.exists(p):
            shutil.rmtree(p)
    man = mf.new_manifest(files, cfg_json)
    for m, s in zip(mans, src_dirs):
        src_frag = os.path.join(s, "fragments")
        for bdir in os.listdir(src_frag):
            for pdir in os.listdir(os.path.join(src_frag, bdir)):
                old_pid = int(pdir.split("=", 1)[1])
                f = m["input_files"][old_pid]
                src_p = os.path.join(src_frag, bdir, pdir)
                dst_p = os.path.join(out_dir, "fragments", bdir,
                                     f"part_id={part_of_path[f]}")
                os.makedirs(dst_p, exist_ok=True)
                for fn in os.listdir(src_p):
                    dst_f = os.path.join(dst_p, fn)
                    try:
                        os.link(os.path.join(src_p, fn), dst_f)
                    except OSError:
                        shutil.copy2(os.path.join(src_p, fn), dst_f)
    for f in files:
        man["parts"][str(part_of_path[f])] = {
            "input_file": f, "status": "done"}
    man["stats"]["N"] = sum(int(m["stats"]["N"]) for m in mans)
    man["stats"]["max_doc"] = max(
        int(m["stats"]["max_doc"]) for m in mans)
    mf.save(out_dir, man)
    # stage B (merge) + stage C (commit) via the normal resume path
    return build_index(files, out_dir, cfg)


def snapshot_index(index_dir: str, dst_dir: str) -> dict[str, Any]:
    """Backup a COMPLETE index (upstream ``ReplicationHandler``
    backup / Solr collection SNAPSHOT [U]): hardlink-copy every file
    the manifest references (shard generation, delete lists, stored
    fields, docmap, payload store — NOT the rebuildable fragments),
    then write the manifest LAST so a torn snapshot is never loadable
    — the same commit-last discipline as the build. Restore = point a
    reader at the snapshot dir (it IS an index), or copy it back."""
    man = mf.load(index_dir)
    assert man and man["status"] == "complete", "snapshot needs a complete index"
    os.makedirs(dst_dir, exist_ok=True)

    def _copytree_link(src: str, dst: str) -> None:
        for root, _, fns in os.walk(src):
            rel = os.path.relpath(root, src)
            out = os.path.join(dst, rel) if rel != "." else dst
            os.makedirs(out, exist_ok=True)
            for fn in fns:
                s, d = os.path.join(root, fn), os.path.join(out, fn)
                if os.path.exists(d):
                    os.remove(d)
                try:
                    os.link(s, d)
                except OSError:
                    shutil.copy2(s, d)

    shard = mf.shard_root(index_dir, man)
    _copytree_link(shard, os.path.join(
        dst_dir, os.path.basename(shard)))
    for sub in (STORED_DIR, "payloads"):
        p = os.path.join(index_dir, sub)
        if os.path.isdir(p):
            _copytree_link(p, os.path.join(dst_dir, sub))
    for fn in os.listdir(index_dir):
        p = os.path.join(index_dir, fn)
        if os.path.isfile(p) and fn != mf.MANIFEST_NAME:
            try:
                os.link(p, os.path.join(dst_dir, fn))
            except OSError:
                shutil.copy2(p, os.path.join(dst_dir, fn))
    mf.save(dst_dir, man)      # manifest last = commit point
    return man


STORED_DIR = "stored"


def sync_replica(src_dir: str, dst_dir: str) -> dict[str, Any]:
    """Incremental pull replication (upstream ``ReplicationHandler``
    → ``IndexFetcher`` [U]): bring a replica up to the master's commit
    point copying ONLY the files the replica lacks. Mirrors the
    upstream filelist negotiation over the master's searchable file
    inventory (shard generation, docmap, stored fields, delete lists,
    dv updates, payloads; NOT the rebuildable fragments):

    - compare by relative path + size, and md5 ONLY for same-size
      pairs (the one case size can't disambiguate — an incremental
      sync therefore reads O(changed + same-size-pair bytes), not the
      whole index twice);
    - copy each changed/missing file via hardlink (same-device) +
      atomic per-file rename;
    - if any SAME-PATH file changes content (fixed-path mutables:
      docmap, a rewritten merged shard), the replica's manifest is
      first flipped to ``status="syncing"`` — a crash mid-install
      leaves a replica that REFUSES to load (readers assert
      status=complete) instead of silently pairing an old manifest
      with new bytes; rerunning sync_replica repairs it (idempotent),
      upstream IndexFetcher's retry semantics;
    - the master manifest installs as the final commit point; stale
      files and orphaned ``*.tmp`` are removed after.

    Returns {copied, removed, skipped}."""
    import hashlib

    man = mf.load(src_dir)
    assert man and man["status"] == "complete", \
        "sync_replica needs a complete master"
    os.makedirs(dst_dir, exist_ok=True)

    def _md5(path: str) -> str:
        h = hashlib.md5()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    def sizes(base: str) -> dict[str, int]:
        out: dict[str, int] = {}
        skip_tops = {"fragments", mf.MANIFEST_NAME}
        for root, dirs, fns in os.walk(base):
            rel = os.path.relpath(root, base)
            if rel == ".":
                dirs[:] = [d for d in dirs if d not in skip_tops]
            for fn in fns:
                r = os.path.normpath(os.path.join(rel, fn))
                if r in skip_tops:
                    continue
                if fn.endswith(".tmp"):   # orphan from a crashed sync
                    if base == dst_dir:
                        os.remove(os.path.join(root, fn))
                    continue
                out[r] = os.path.getsize(os.path.join(root, fn))
        return out

    want = sizes(src_dir)
    have = sizes(dst_dir)
    to_copy: list[str] = []
    conflicting = False
    skipped = 0
    for r, size in want.items():
        if r not in have:
            to_copy.append(r)
        elif have[r] != size or \
                _md5(os.path.join(dst_dir, r)) != \
                _md5(os.path.join(src_dir, r)):
            to_copy.append(r)
            conflicting = True            # same path, new content
        else:
            skipped += 1

    if conflicting:
        # detectably-incomplete marker: a crash before the final
        # manifest leaves status="syncing" and readers refuse to load
        old = mf.load(dst_dir)
        if old is not None:
            old = dict(old)
            old["status"] = "syncing"
            mf.save(dst_dir, old)

    for r in to_copy:
        s = os.path.join(src_dir, r)
        d = os.path.join(dst_dir, r)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        tmp = d + ".tmp"
        if os.path.exists(tmp):
            os.remove(tmp)
        try:
            os.link(s, tmp)
        except OSError:
            shutil.copy2(s, tmp)
        os.replace(tmp, d)               # atomic per-file install
    mf.save(dst_dir, man)      # the commit point
    removed = 0
    for r in set(have) - set(want):      # post-commit cleanup
        try:
            os.remove(os.path.join(dst_dir, r))
            removed += 1
        except OSError:
            pass
    for root, dirs, fns in os.walk(dst_dir, topdown=False):
        if not dirs and not fns and os.path.normpath(root) != \
                os.path.normpath(dst_dir):
            os.rmdir(root)
    return {"copied": len(to_copy), "removed": removed,
            "skipped": skipped}


def delete_docs(index_dir: str, doc_ids) -> int:
    """Mark docIDs deleted (upstream ``LiveDocsFormat`` /
    ``PendingDeletes`` [U]): deletes live OUTSIDE the immutable posting
    shards as a sorted docID list, published as a new generation file +
    one atomic manifest commit — same two-phase pattern as optimize.
    Readers mask deleted docs at scoring time; a later forceMerge could
    fold them into rewritten shards.

    Cumulative: new ids union with the existing delete set. Returns
    the total deleted count. At 10^12-doc scale the list shards by
    docID range next to the index buckets; the manifest schema
    (file, n, gen) already allows a list of range files."""
    man = mf.load(index_dir)
    assert man and man["status"] == "complete", "delete needs a complete index"
    N = int(man["stats"].get("max_doc", man["stats"]["N"]))
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if len(ids) and (ids[0] < 0 or ids[-1] >= N):
        raise ValueError(f"doc_id out of range [0, {N})")
    cur = man.get("deletes")
    if cur:
        old = pq.read_table(
            os.path.join(index_dir, cur["file"]))["doc_id"].to_numpy()
        ids = np.union1d(ids, old)
    # never reuse a generation name still referenced by folded_deletes
    gen = max((cur or {}).get("gen", 0),
              (man.get("folded_deletes") or {}).get("gen", 0)) + 1
    fname = f"deletes-g{gen}.parquet"
    tmp = os.path.join(index_dir, fname + ".tmp")
    pq.write_table(pa.table({"doc_id": pa.array(ids, type=pa.int64())}), tmp)
    os.replace(tmp, os.path.join(index_dir, fname))
    man["deletes"] = {"file": fname, "n": int(len(ids)), "gen": gen}
    mf.save(index_dir, man)          # the commit point
    if cur and cur["file"] != fname:
        try:
            os.remove(os.path.join(index_dir, cur["file"]))
        except OSError:
            pass
    return int(len(ids))


def soft_delete_docs(index_dir: str, doc_ids) -> int:
    """Soft deletes (upstream ``IndexWriter#softUpdateDocuments`` /
    ``softDeletesField`` + ``SoftDeletesRetentionMergePolicy`` [U]):
    mark docIDs deleted in a SEPARATE tombstone namespace that (a) a
    default reader masks exactly like hard deletes, (b) a reader
    opened with ``include_soft_deleted=True`` ignores — upstream's
    unwrapped ``DirectoryReader`` vs ``SoftDeletesDirectoryReader``
    view of the same commit — and (c) ``optimize_index`` RETAINS
    (hard deletes fold into rewritten shards; soft tombstones survive
    the merge, the retention-policy contract that makes them usable
    for replica-ship / undo windows).

    Same two-phase publish as :func:`delete_docs`: new generation
    parquet, then one atomic manifest commit. Cumulative; returns the
    total soft-deleted count."""
    man = mf.load(index_dir)
    assert man and man["status"] == "complete", \
        "soft delete needs a complete index"
    N = int(man["stats"].get("max_doc", man["stats"]["N"]))
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if len(ids) and (ids[0] < 0 or ids[-1] >= N):
        raise ValueError(f"doc_id out of range [0, {N})")
    cur = man.get("soft_deletes")
    if cur:
        old = pq.read_table(
            os.path.join(index_dir, cur["file"]))["doc_id"].to_numpy()
        ids = np.union1d(ids, old)
    gen = (cur or {}).get("gen", 0) + 1
    fname = f"soft-deletes-g{gen}.parquet"
    tmp = os.path.join(index_dir, fname + ".tmp")
    pq.write_table(pa.table({"doc_id": pa.array(ids, type=pa.int64())}), tmp)
    os.replace(tmp, os.path.join(index_dir, fname))
    man["soft_deletes"] = {"file": fname, "n": int(len(ids)), "gen": gen}
    mf.save(index_dir, man)          # the commit point
    if cur and cur["file"] != fname:
        try:
            os.remove(os.path.join(index_dir, cur["file"]))
        except OSError:
            pass
    return int(len(ids))


def update_numeric_docvalue(index_dir: str, term: str, field: str,
                            value: float | int) -> int:
    """In-place numeric DocValues update (upstream
    ``IndexWriter#updateNumericDocValue(Term, String, long)`` /
    ``BufferedUpdates`` → per-segment DV update generations [U]): set
    ``field`` to ``value`` for every LIVE doc matching ``term``,
    WITHOUT touching the immutable posting shards — exactly Lucene's
    dvGen mechanism, where updated docvalues land in new generation
    files stacked over the indexed base values.

    Each call publishes one generation parquet (doc_id, value) plus an
    atomic manifest commit; readers overlay generations in order
    (later wins) on top of the base column read from the source
    corpus. Returns the number of docs updated. At 10^12-doc scale a
    generation shards by docID range like the delete list; the
    manifest entry (file, n, gen) extends to a file list the same
    way."""
    from engine.query import IndexReader
    man = mf.load(index_dir)
    assert man and man["status"] == "complete", \
        "docvalue update needs a complete index"
    r = IndexReader(index_dir)
    docs = r.filter_docset(term)
    keep = r._keep(docs)
    if keep is not None:
        docs = docs[keep]
    return publish_dv_generation(index_dir, field, docs, value)


def publish_dv_generation(index_dir: str, field: str, doc_ids,
                          value: float | int) -> int:
    """Publish one numeric-DV update generation for an EXPLICIT
    (already-resolved) docID set — the write half of
    :func:`update_numeric_docvalue`, also used by the NRT writer to
    flush buffered updates whose docsets were frozen at call time
    (upstream ``BufferedUpdates`` queue-order resolution [U])."""
    man = mf.load(index_dir)
    assert man and man["status"] == "complete", \
        "docvalue update needs a complete index"
    docs = np.unique(np.asarray(doc_ids, dtype=np.int64))
    gens = (man.get("dv_updates") or {}).get(field, [])
    gen = max((g["gen"] for g in gens), default=0) + 1
    fname = f"dv-{field}-g{gen}.parquet"
    tmp = os.path.join(index_dir, fname + ".tmp")
    pq.write_table(pa.table({
        "doc_id": pa.array(docs, type=pa.int64()),
        "value": pa.array(np.full(len(docs), value, dtype=np.float64)),
    }), tmp)
    os.replace(tmp, os.path.join(index_dir, fname))
    dv = man.setdefault("dv_updates", {})
    dv.setdefault(field, []).append(
        {"file": fname, "n": int(len(docs)), "gen": gen})
    mf.save(index_dir, man)          # the commit point
    return int(len(docs))


def build_stored_fields(index_dir: str) -> int:
    """Stored-fields stage (upstream ``Lucene50StoredFieldsFormat``
    ``.fdt``/``.fdx`` [U]; the second phase of distributed search,
    ``S/handler/component/QueryComponent#mergeIds`` → fetch [U]):
    rewrite the corpus text in docID order as range-partitioned Parquet
    so query-time doc fetch is a row-range read, not a corpus scan.

    One ``ds.sort("doc_id")`` exchange at build time; per-file
    (min, max) docID bounds go into the manifest, so a fetch touches
    only the files its ids fall in (binary search + Parquet row-group
    pruning on the sorted column). Returns the stored doc count."""
    man = mf.load(index_dir)
    assert man and man["status"] == "complete", "stored fields need a complete index"
    cfg = IndexConfig.from_json(man["config"])
    out_dir = os.path.join(index_dir, STORED_DIR)
    if man.get("stored") and os.path.isdir(out_dir):
        return sum(b["rows"] for b in man["stored"])
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    files = man["input_files"]

    if cfg.doc_id_col is not None:
        id_col, text_col = cfg.doc_id_col, cfg.text_col

        def project(b: pa.Table) -> pa.Table:
            return pa.table({"doc_id": b[id_col].cast(pa.int64()),
                             "text": b[text_col]})

        ds = ray.data.read_parquet(files, columns=[id_col, text_col]) \
            .map_batches(project, batch_format="pyarrow")
    else:
        conv_col, turn_col = cfg.conv_cols  # type: ignore[misc]
        dm = pq.read_table(os.path.join(index_dir, DOCMAP_NAME))
        dm_ref = ray.put((dm[conv_col].combine_chunks(),
                          dm["base"].to_numpy().astype(np.int64)))

        def add_doc_id(b: pa.Table) -> pa.Table:
            convs, bases = ray.get(dm_ref)
            idx = pc.index_in(b[conv_col], value_set=convs)
            base = bases[idx.to_numpy(zero_copy_only=False).astype(np.int64)]
            did = base + b[turn_col].to_numpy().astype(np.int64)
            return pa.table({
                "doc_id": pa.array(did, type=pa.int64()),
                "text": b[cfg.text_col],
            })

        ds = ray.data.read_parquet(
            files, columns=[conv_col, turn_col, cfg.text_col])
        ds = ds.map_batches(add_doc_id, batch_format="pyarrow")

    ds.sort("doc_id").write_parquet(out_dir)

    bounds: list[dict[str, Any]] = []
    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out_dir, f)).metadata
        mins, maxs, rows = [], [], 0
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "doc_id"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
            rows += md.row_group(rg).num_rows
        if rows:
            bounds.append({"file": f, "min": int(min(mins)),
                           "max": int(max(maxs)), "rows": rows})
    man["stored"] = bounds
    mf.save(index_dir, man)
    return sum(b["rows"] for b in bounds)


def _decode_row_full(row: dict[str, Any], codec: str = "vbyte"
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                np.ndarray]:
    """Decode one index row -> (doc_ids, tfs, norms, flat absolute
    positions); positions are empty when the row stored none."""
    from engine.codec import for_decode_stream

    df = int(row["df"])
    if codec == "for":
        deltas = for_decode_stream(
            row["docs"], df,
            np.frombuffer(row["blk_doc_off"], dtype=np.int32))
        tf_i = for_decode_stream(
            row["tfs"], df,
            np.frombuffer(row["blk_tf_off"], dtype=np.int32))
    else:
        deltas, _ = vbyte_decode(row["docs"], df)
        tf_i, _ = vbyte_decode(row["tfs"], df)
    docs = np.cumsum(deltas)
    norms = np.frombuffer(row["norms"], dtype=np.uint8)
    if len(row["poss"]):
        total = int(tf_i.sum())
        pdel, _ = vbyte_decode(row["poss"], total)
        flat = np.cumsum(pdel)
        starts = np.concatenate(([0], np.cumsum(tf_i)[:-1]))
        bases = flat[starts] - pdel[starts]
        poss = flat - np.repeat(bases, tf_i)
    else:
        poss = np.empty(0, np.int64)
    return docs, tf_i, norms, poss


def _merge_index_rows(rows: list[dict[str, Any]],
                      deleted: np.ndarray | None = None,
                      codec: str = "vbyte") -> pa.Table | None:
    """Combine one term's sub-list index rows into a single row;
    ``deleted`` (sorted docIDs) folds tombstones away — postings of
    deleted docs are dropped and df/cf shrink (the forceMerge
    delete-reclaim, upstream ``SegmentMerger`` + ``LiveDocs`` [U]).
    Returns None when every posting was deleted."""
    docs_l, tfs_l, norms_l, poss_l = [], [], [], []
    for row in rows:
        d, t, nr, p = _decode_row_full(row, codec)
        docs_l.append(d)
        tfs_l.append(t)
        norms_l.append(nr)
        if p.size:
            poss_l.append(p)
    docs = np.concatenate(docs_l)
    tfs = np.concatenate(tfs_l)
    norms = np.concatenate(norms_l)
    poss = np.concatenate(poss_l) if poss_l else np.empty(0, np.int64)
    order = np.argsort(docs, kind="stable")
    if poss.size:
        tok_offs = np.concatenate(([0], np.cumsum(tfs)))
        tok_idx = np.concatenate(
            [np.arange(tok_offs[i], tok_offs[i + 1]) for i in order])
        poss = poss[tok_idx]
    docs, tfs, norms = docs[order], tfs[order], norms[order]
    if deleted is not None and len(deleted):
        pos_idx = np.clip(np.searchsorted(deleted, docs), 0,
                          len(deleted) - 1)
        keep = deleted[pos_idx] != docs
        if not keep.any():
            return None
        if not keep.all():
            if poss.size:
                poss = poss[np.repeat(keep, tfs)]
            docs, tfs, norms = docs[keep], tfs[keep], norms[keep]
    enc = encode_postings(docs, tfs, norms, poss, codec=codec)
    return _index_row(rows[0]["term"], 0, enc, int(docs[0]))


def _optimize_shard(src_dir: str, dst_dir: str,
                    deleted: np.ndarray | None = None,
                    codec: str = "vbyte") -> tuple[int, int, int]:
    """forceMerge one bucket shard into ``dst_dir``; returns
    (n_terms, sum_cf, n_postings) of the rewritten shard.

    Vectorized: the shard is term-sorted once; terms that already have
    a single sub-list (the vast majority after an unskewed build) are
    passed through as zero-copy Arrow slices with ``sub`` reset to 0 —
    only multi-sub (salted) terms pay the decode/re-encode. With
    ``deleted`` set (delete-folding merge) every term is re-encoded
    with tombstoned docs dropped; terms whose postings are all deleted
    disappear."""
    if not os.path.isdir(src_dir) or not any(
            f.endswith(".parquet") for f in os.listdir(src_dir)):
        return (0, 0, 0)
    tab = pq.read_table(src_dir).combine_chunks()
    merged = _merge_shard_rows(tab, deleted, codec)
    if merged is None:
        return (0, 0, 0)
    os.makedirs(dst_dir, exist_ok=True)
    pq.write_table(merged, os.path.join(dst_dir, "optimized-0.parquet"))
    trigram.write_sidecar(dst_dir, merged["term"])
    return (merged.num_rows,
            int(pa.compute.sum(merged["cf"]).as_py() or 0),
            int(pa.compute.sum(merged["df"]).as_py() or 0))


def _merge_shard_rows(tab: pa.Table,
                      deleted: np.ndarray | None = None,
                      codec: str = "vbyte") -> pa.Table | None:
    """Combine a set of index rows so every term has ONE sub-list
    (the shared kernel of forceMerge and tiered segment merging)."""
    tab = tab.sort_by("term")
    terms = np.asarray(tab["term"].to_pandas(), dtype=object)
    n = len(terms)
    if n == 0:
        return None
    chg = np.empty(n, dtype=bool)
    chg[0] = True
    chg[1:] = terms[1:] != terms[:-1]
    starts = np.flatnonzero(chg)
    counts = np.diff(np.append(starts, n))

    folding = deleted is not None and len(deleted)
    parts: list[pa.Table] = []
    cols = ("term", "df", "docs", "tfs", "norms", "poss")
    if codec == "for":
        cols += ("blk_doc_off", "blk_tf_off")
    if folding:
        for s, c in zip(starts, counts):
            rows = [{k: tab[k][j].as_py() for k in cols}
                    for j in range(s, s + int(c))]
            t = _merge_index_rows(rows, deleted, codec=codec)
            if t is not None:
                parts.append(t)
    else:
        single_rows = starts[counts == 1]
        if len(single_rows):
            singles = tab.take(pa.array(single_rows))
            sub_i = singles.schema.get_field_index("sub")
            singles = singles.set_column(
                sub_i, "sub",
                pa.array(np.zeros(len(single_rows), np.int32),
                         type=pa.int32()))
            parts.append(singles)
        for s, c in zip(starts[counts > 1], counts[counts > 1]):
            rows = [{k: tab[k][j].as_py() for k in cols}
                    for j in range(s, s + int(c))]
            parts.append(_merge_index_rows(rows, codec=codec))
    if not parts:
        return None
    return pa.concat_tables(parts, promote_options="default") \
        .sort_by("term")


def optimize_index(index_dir: str,
                   fold_deletes: bool = False) -> dict[str, int]:
    """forceMerge(1) analog (upstream ``IndexWriter#forceMerge`` [U]):
    rewrite each bucket shard so every term has exactly ONE posting
    list (salted sub-lists combined). Optional post-build pass; query
    actors then skip per-actor re-merging at preload.

    ``fold_deletes=True`` additionally reclaims tombstones (the real
    forceMerge semantics): deleted docs' postings are dropped, df/cf
    shrink, empty terms disappear, and the collection stats become
    live-only — N, sum_cf, avgdl and therefore idf and length norms
    all change, exactly as Lucene's do once deletes merge away. The
    original docIDs stay (they are externally stable here), so
    ``stats.max_doc`` keeps the pre-fold doc-space bound for dense
    accumulators and key packing while ``stats.N`` becomes the live
    doc count used by scoring.

    Publish protocol (crash-safe, the ``segments_N`` generation
    pattern): the new generation is written COMPLETELY to a fresh
    ``index-gN`` directory, then ONE atomic manifest commit flips
    ``index_dir_name``; only then is the superseded generation removed.
    A crash at any point leaves the live generation fully readable."""
    man = mf.load(index_dir)
    assert man and man["status"] == "complete", "optimize needs a complete index"
    cfg = IndexConfig.from_json(man["config"])
    gen = int(man["stats"].get("index_gen", 0)) + 1
    cur_root = mf.shard_root(index_dir, man)
    new_name = f"index-g{gen}"
    new_root = os.path.join(index_dir, new_name)
    if os.path.exists(new_root):
        shutil.rmtree(new_root)

    deleted = None
    dels = man.get("deletes")
    if fold_deletes and dels and dels.get("n"):
        deleted = pq.read_table(
            os.path.join(index_dir, dels["file"]))["doc_id"] \
            .to_numpy().astype(np.int64)
    dref = ray.put(deleted) if deleted is not None else None

    opt = ray.remote(_optimize_shard)
    futs = {b: opt.remote(os.path.join(cur_root, f"bucket={b}"),
                          os.path.join(new_root, f"bucket={b}"),
                          dref, cfg.postings_codec)
            for b in range(cfg.n_buckets)}
    stats_b = {b: ray.get(f) for b, f in futs.items()}

    man["index_dir_name"] = new_name
    man["stats"]["optimized"] = True
    man["stats"]["index_gen"] = gen
    if deleted is not None:
        n_live = int(man["stats"]["N"]) - len(deleted)
        man["stats"].setdefault("max_doc", int(man["stats"]["N"]))
        total_cf = sum(s[1] for s in stats_b.values())
        man["buckets"] = {
            str(b): {"n_terms": s[0], "sum_cf": s[1], "n_postings": s[2]}
            for b, s in stats_b.items()}
        man["stats"].update({
            "N": n_live,
            "sum_cf": total_cf,
            "n_terms": sum(s[0] for s in stats_b.values()),
            "n_postings": sum(s[2] for s in stats_b.values()),
            "avgdl": (total_cf / n_live) if n_live else 0.0,
        })
        # the delete FILE outlives the fold: fragments still hold the
        # reclaimed postings, so a later incremental append re-merge
        # must re-activate these tombstones (see build_index append).
        # Successive folds accumulate: union with any earlier fold.
        prev = man.get("folded_deletes")
        if prev:
            prev_ids = pq.read_table(os.path.join(
                index_dir, prev["file"]))["doc_id"].to_numpy()
            all_ids = np.union1d(prev_ids, deleted)
            fgen = max(prev.get("gen", 0),
                       man["deletes"].get("gen", 0)) + 1
            fname = f"deletes-g{fgen}.parquet"
            tmp = os.path.join(index_dir, fname + ".tmp")
            pq.write_table(pa.table({
                "doc_id": pa.array(all_ids, type=pa.int64())}), tmp)
            os.replace(tmp, os.path.join(index_dir, fname))
            man["folded_deletes"] = {"file": fname,
                                     "n": int(len(all_ids)),
                                     "gen": fgen}
        else:
            man["folded_deletes"] = dict(man["deletes"])
        man.pop("deletes", None)
    mf.save(index_dir, man)          # the commit point
    if os.path.realpath(cur_root) != os.path.realpath(new_root):
        shutil.rmtree(cur_root, ignore_errors=True)
    return {b: s[0] for b, s in stats_b.items()}


def _merge_segment_files(src_files: list[str], dst_file: str,
                         codec: str) -> None:
    tab = pq.read_table(src_files)
    merged = _merge_shard_rows(tab, codec=codec)
    if merged is not None:
        pq.write_table(merged, dst_file)


def _migrate_shard_file(src: str, dst: str, from_codec: str,
                        to_codec: str) -> None:
    tab = pq.read_table(src)
    out: list[pa.Table] = []
    for row in tab.to_pylist():
        d, t, nr, p = _decode_row_full(row, from_codec)
        enc = encode_postings(d, t, nr, p if p.size else None,
                              codec=to_codec)
        out.append(_index_row(row["term"], int(row["sub"]), enc,
                              int(d[0])))
    if out:
        pq.write_table(pa.concat_tables(out), dst)


def upgrade_codec(index_dir: str, to_codec: str) -> dict[str, Any]:
    """IndexUpgrader analog (upstream ``L/index/IndexUpgrader`` — a
    forceMerge under the NEW Codec [U]): rewrite every posting shard
    in ``to_codec`` WITHOUT re-analyzing any text — each row decodes
    once and re-encodes (docs, tfs, norms, positions and the block
    directory all rebuilt for the target codec); df/cf/norms and
    therefore every f32 score are bit-identical before and after.

    Publish protocol is the optimize/maybe_merge generation swap: the
    ``index-gN`` directory is built completely, then ONE atomic
    manifest commit flips ``index_dir_name`` AND the config's
    ``postings_codec`` together — readers opened before see the old
    generation, readers after see the new; a crash never exposes a
    mixed-codec index. Delete bitmaps and dv-update generations live
    outside the shards and are untouched. Fragment lineage (rewrite
    appends) stores raw token streams, so later appends re-encode in
    the new codec automatically. Shard files migrate as parallel Ray
    tasks (one per file)."""
    man = mf.load(index_dir)
    assert man and man["status"] == "complete", \
        "upgrade_codec needs a complete index"
    cfg = IndexConfig.from_json(man["config"])
    from_codec = cfg.postings_codec
    if from_codec == to_codec:
        return {"migrated_files": 0, "codec": to_codec,
                "gen": int(man["stats"].get("index_gen", 0))}
    cur_root = mf.shard_root(index_dir, man)
    gen = int(man["stats"].get("index_gen", 0)) + 1
    new_root = os.path.join(index_dir, f"index-g{gen}")
    if os.path.exists(new_root):
        shutil.rmtree(new_root)
    task = ray.remote(_migrate_shard_file)
    futs = []
    for b in range(cfg.n_buckets):
        src = os.path.join(cur_root, f"bucket={b}")
        if not os.path.isdir(src):
            continue
        dst = os.path.join(new_root, f"bucket={b}")
        os.makedirs(dst, exist_ok=True)
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                futs.append(task.remote(
                    os.path.join(src, f), os.path.join(dst, f),
                    from_codec, to_codec))
        side = os.path.join(src, trigram.SIDECAR_NAME)
        if os.path.exists(side):
            # codec migration never changes the term set — the
            # trigram sidecar stays valid, carry it forward
            shutil.copy2(side, os.path.join(dst, trigram.SIDECAR_NAME))
    ray.get(futs)
    for b in range(cfg.n_buckets):
        bdir = os.path.join(new_root, f"bucket={b}")
        if os.path.isdir(bdir):
            man["buckets"][str(b)] = _bucket_stats(bdir)
    cfg.postings_codec = to_codec
    man["config"] = cfg.to_json()
    man["index_dir_name"] = f"index-g{gen}"
    man["stats"]["index_gen"] = gen
    mf.save(index_dir, man)            # the commit point
    if os.path.realpath(cur_root) != os.path.realpath(new_root):
        shutil.rmtree(cur_root, ignore_errors=True)
    return {"migrated_files": len(futs), "codec": to_codec, "gen": gen}


def maybe_merge(index_dir: str, max_segments: int = 8
                ) -> dict[str, Any]:
    """TieredMergePolicy analog (upstream ``TieredMergePolicy`` /
    ``ConcurrentMergeScheduler`` [U]) for segment-appended indexes:
    any bucket holding more than ``max_segments`` shard files merges
    its SMALLEST files down to the cap (one combined file replaces
    them), leaving big segments untouched — the size-tiered policy
    that keeps append cost amortized O(new data · log(index/new)).

    Publish protocol is the optimize generation swap: the new
    ``index-gN`` directory is built completely (untouched segment
    files HARDLINKED in, so only merged bytes are written), then one
    atomic manifest commit flips ``index_dir_name``; a crash never
    exposes a half-merged shard. Active delete bitmaps are untouched
    (they mask at query time; ``optimize_index(fold_deletes=True)``
    reclaims them)."""
    man = mf.load(index_dir)
    assert man and man["status"] == "complete", \
        "maybe_merge needs a complete index"
    cfg = IndexConfig.from_json(man["config"])
    cur_root = mf.shard_root(index_dir, man)

    plans: dict[int, tuple[list[str], list[str]]] = {}
    for b in range(cfg.n_buckets):
        bdir = os.path.join(cur_root, f"bucket={b}")
        if not os.path.isdir(bdir):
            continue
        fs = sorted(
            (os.path.getsize(os.path.join(bdir, f)), f)
            for f in os.listdir(bdir) if f.endswith(".parquet"))
        if len(fs) > max_segments:
            k = len(fs) - max_segments + 1
            plans[b] = ([f for _, f in fs[:k]], [f for _, f in fs[k:]])
    if not plans:
        return {"merged_buckets": 0,
                "gen": int(man["stats"].get("index_gen", 0))}

    gen = int(man["stats"].get("index_gen", 0)) + 1
    new_root = os.path.join(index_dir, f"index-g{gen}")
    if os.path.exists(new_root):
        shutil.rmtree(new_root)
    task = ray.remote(_merge_segment_files)
    futs = []
    for b in range(cfg.n_buckets):
        src = os.path.join(cur_root, f"bucket={b}")
        if not os.path.isdir(src):
            continue
        dst = os.path.join(new_root, f"bucket={b}")
        os.makedirs(dst, exist_ok=True)
        merge_files, keep = plans.get(b, (None, None))
        if keep is None:
            keep = [f for f in os.listdir(src) if f.endswith(".parquet")]
        for f in keep:
            os.link(os.path.join(src, f), os.path.join(dst, f))
        side = os.path.join(src, trigram.SIDECAR_NAME)
        if os.path.exists(side):
            # segment merging never changes the bucket's term set —
            # the trigram sidecar stays valid, carry it forward
            shutil.copy2(side, os.path.join(dst, trigram.SIDECAR_NAME))
        if merge_files:
            futs.append(task.remote(
                [os.path.join(src, f) for f in merge_files],
                os.path.join(dst, f"seg-m{gen}.parquet"),
                cfg.postings_codec))
    for f in futs:
        ray.get(f)
    for b in plans:
        man["buckets"][str(b)] = _bucket_stats(
            os.path.join(new_root, f"bucket={b}"))
    man["index_dir_name"] = f"index-g{gen}"
    man["stats"]["index_gen"] = gen
    mf.save(index_dir, man)            # the commit point
    if os.path.realpath(cur_root) != os.path.realpath(new_root):
        shutil.rmtree(cur_root, ignore_errors=True)
    return {"merged_buckets": len(plans), "gen": gen}


def _split_shard_table(tab: pa.Table, split_doc: int, codec: str
                       ) -> tuple[pa.Table | None, pa.Table | None]:
    """One bucket shard table -> (low child, high child) index tables,
    partitioning every row's postings at ``doc_id < split_doc``. Rows
    whose postings fall entirely on one side land there whole; rows
    that straddle are re-encoded per side (block directories rebuilt).
    Vectorized for the vbyte codec (one decode per stream across the
    whole bucket); FOR-codec rows decode per row (block-offset streams
    do not concatenate)."""
    if tab.num_rows == 0:
        return None, None
    tab = tab.combine_chunks()
    dfs = tab["df"].to_numpy().astype(np.int64)
    cuts = np.concatenate(([0], np.cumsum(dfs)))
    total = int(cuts[-1])
    if codec == "for":
        need = ["df", "docs", "tfs", "norms", "poss",
                "blk_doc_off", "blk_tf_off"]
        cols = {c: tab[c] for c in need}
        docs_l, tfs_l, norms_l, poss_l = [], [], [], []
        for i in range(tab.num_rows):
            row = {c: cols[c][i].as_py() for c in need}
            d, t, nr, p = _decode_row_full(row, codec)
            docs_l.append(d)
            tfs_l.append(t)
            norms_l.append(nr)
            poss_l.append(p)
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        norms = np.concatenate(norms_l)
        flat_pos = np.concatenate(poss_l) \
            if any(p.size for p in poss_l) else None
    else:
        d_stream, _ = _cell_stream(tab["docs"])
        deltas, _ = vbyte_decode(d_stream, total, 0)
        fs = cuts[:-1]
        cs = np.cumsum(deltas)
        base = cs[fs] - deltas[fs]
        docs = cs - np.repeat(base, dfs)
        t_stream, _ = _cell_stream(tab["tfs"])
        tfs, _ = vbyte_decode(t_stream, total, 0)
        n_stream, _ = _cell_stream(tab["norms"])
        norms = n_stream.copy()
        p_stream, _ = _cell_stream(tab["poss"])
        if p_stream.size:
            total_tok = int(tfs.sum())
            pdeltas, _ = vbyte_decode(p_stream, total_tok, 0)
            ps = np.concatenate(([0], np.cumsum(tfs)))[:-1]
            pcs = np.cumsum(pdeltas)
            pbase = pcs[ps] - pdeltas[ps]
            flat_pos = pcs - np.repeat(pbase, tfs)
        else:
            flat_pos = None

    lo_sel = docs < split_doc
    subs_all = tab["sub"].to_numpy().astype(np.int32)

    def _child(sel: np.ndarray) -> pa.Table | None:
        new_df = np.add.reduceat(sel.astype(np.int64), cuts[:-1])
        kept = new_df > 0
        if not kept.any():
            return None
        offs = np.concatenate(([0], np.cumsum(new_df[kept])))
        p2 = None
        if flat_pos is not None:
            p2 = flat_pos[np.repeat(sel, tfs)]
        enc = encode_postings_multi(offs, docs[sel], tfs[sel],
                                    norms[sel], p2, codec=codec)
        ki = np.flatnonzero(kept)
        terms = tab["term"].take(pa.array(ki))
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        return _multi_index_table(terms, subs_all[ki], enc)

    return _child(lo_sel), _child(~lo_sel)


def _split_shard_bucket(src_bdir: str, dst_bdirs: list[str],
                        split_doc: int, codec: str
                        ) -> list[dict[str, Any]]:
    if os.path.isdir(src_bdir) and any(
            f.endswith(".parquet") for f in os.listdir(src_bdir)):
        children = _split_shard_table(
            pq.read_table(src_bdir), split_doc, codec)
        for child, d in zip(children, dst_bdirs):
            if child is not None and child.num_rows:
                # dir only exists when it holds data (empty bucket
                # dirs would break schema inference at read time)
                os.makedirs(d, exist_ok=True)
                child = child.sort_by("term")
                pq.write_table(child,
                               os.path.join(d, "split-0.parquet"))
                trigram.write_sidecar(d, child["term"])
    return [_bucket_stats(d) for d in dst_bdirs]


def _range_counts(path: str, col: str, split_doc: int
                  ) -> tuple[int, int, int, int]:
    """(n_lo, n_hi, max_lo, max_hi) of one input file's docIDs."""
    a = pq.read_table(path, columns=[col])[col].to_numpy()
    lo = a < split_doc
    n_lo = int(lo.sum())
    return (n_lo, int(a.size - n_lo),
            int(a[lo].max()) if n_lo else -1,
            int(a[~lo].max()) if n_lo < a.size else -1)


def split_index(index_dir: str, dst_dirs: list[str],
                split_doc: int | None = None) -> dict[str, Any]:
    """SPLITSHARD analog (Solr collections API ``SPLITSHARD`` /
    ``SolrIndexSplitter`` [U]): partition a COMPLETE doc_id-mode index
    into two child indexes covering docID ranges ``[0, split_doc)``
    and ``[split_doc, max]`` WITHOUT re-analyzing any text — postings
    are decoded once per bucket, range-masked, and re-encoded
    (vectorized whole-bucket streams, one parallel Ray task per
    bucket). Each child is a standalone complete index: its collection
    stats (N, sum_cf, avgdl — exact, from a pruned docID-column scan
    plus the split postings) make BM25 over a child bit-identical to
    a fresh build over that half of the corpus.

    Requirements (asserted): doc_id mode, no active deletes (fold with
    ``optimize_index(fold_deletes=True)`` first — Solr's splitter also
    operates on the live view). Children carry no fragment lineage, so
    later appends must use ``append_mode="segment"`` (enforced);
    ``split_doc`` defaults to the docID-range midpoint (the hash-range
    midpoint in Solr's router terms)."""
    man = mf.load(index_dir)
    assert man and man["status"] == "complete", \
        "split_index needs a complete index"
    cfg = IndexConfig.from_json(man["config"])
    assert cfg.doc_id_col, "split_index requires a doc_id-mode index"
    assert not man.get("deletes"), \
        "split_index: fold deletes first (optimize_index)"
    assert len(dst_dirs) == 2, "split_index produces exactly 2 children"
    max_doc = int(man["stats"].get("max_doc", man["stats"]["N"]))
    if split_doc is None:
        split_doc = (max_doc + 1) // 2
    root = mf.shard_root(index_dir, man)

    task = ray.remote(_split_shard_bucket)
    futs = {b: task.remote(
        os.path.join(root, f"bucket={b}"),
        [os.path.join(d, "index", f"bucket={b}") for d in dst_dirs],
        split_doc, cfg.postings_codec) for b in range(cfg.n_buckets)}
    buckets: list[dict[str, Any]] = [{}, {}]
    for b, f in futs.items():
        for c, s in enumerate(ray.get(f)):
            buckets[c][str(b)] = s

    cnt = ray.remote(_range_counts)
    per_file = ray.get([cnt.remote(f, cfg.doc_id_col, split_doc)
                        for f in man["input_files"]])
    n_c = [sum(r[0] for r in per_file), sum(r[1] for r in per_file)]
    max_c = [max((r[2] for r in per_file), default=-1),
             max((r[3] for r in per_file), default=-1)]

    for c, d in enumerate(dst_dirs):
        os.makedirs(d, exist_ok=True)
        m = mf.new_manifest(list(man["input_files"]), man["config"])
        m["parts"] = {str(i): {"input_file": f, "status": "done"}
                      for i, f in enumerate(m["input_files"])}
        m["no_fragments"] = True
        m["split"] = {"source": os.path.abspath(index_dir),
                      "split_doc": split_doc, "child": c}
        m["buckets"] = buckets[c]
        total_cf = sum(v["sum_cf"] for v in buckets[c].values())
        m["stats"] = {
            "N": n_c[c],
            "sum_cf": total_cf,
            "n_terms": sum(v["n_terms"] for v in buckets[c].values()),
            "n_postings": sum(v.get("n_postings", 0)
                              for v in buckets[c].values()),
            "avgdl": (total_cf / n_c[c]) if n_c[c] else 0.0,
            # doc-space bound is EXCLUSIVE (Lucene maxDoc): max id + 1
            "max_doc": max_c[c] + 1,
        }
        m["status"] = "complete"
        mf.save(d, m)
    return {"split_doc": split_doc, "N": n_c}


def _main() -> None:
    """CLI: ``ray job submit -- python -m engine.build IN OUT [opts]``."""
    import argparse
    import json

    ap = argparse.ArgumentParser(description="Build an inverted index")
    ap.add_argument("input", help="parquet dir or file")
    ap.add_argument("out", help="index output dir")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--doc-id-col", default=None,
                    help="direct docID column (else conv mode)")
    ap.add_argument("--conv-cols", default="conv_id,turn_idx")
    ap.add_argument("--n-buckets", type=int, default=8)
    ap.add_argument("--hot-df-threshold", type=int, default=50_000)
    ap.add_argument("--n-salts", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)
    cfg = IndexConfig(
        text_col=args.text_col,
        doc_id_col=args.doc_id_col,
        conv_cols=None if args.doc_id_col else
        tuple(args.conv_cols.split(",")),
        stemming=not args.no_stem,
        n_buckets=args.n_buckets,
        hot_df_threshold=args.hot_df_threshold,
        n_salts=args.n_salts,
        batch_size=args.batch_size,
    )
    inp = args.input if os.path.isdir(args.input) else [args.input]
    man = build_index(inp, args.out, cfg, resume=not args.no_resume)
    print(json.dumps(man["stats"]))
    ray.shutdown()


if __name__ == "__main__":
    _main()
