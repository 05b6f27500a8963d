"""Posting payloads: delimited-payload ingest + payload scoring.

Upstream parity: ``DelimitedPayloadTokenFilter`` (tokens of the form
``term|payload``), ``PayloadScoreQuery`` with ``SumFunction`` /
``MaxFunction`` and includeSpanScore=false, and the codec's dedicated
``.pay`` posting file [U] — payloads live in their own store parallel
to the inverted index, so the main postings stay payload-free and
payload queries pay their cost only when used.

Ray-Data shape: ONE streaming ``map_batches`` pass tokenizes on
whitespace (payload syntax owns the token; the standard tokenizer
would split at the delimiter), splits ``term|payload`` on the LAST
delimiter, and emits (bucket, term, doc_id, pos, payload) rows written
hive-partitioned by the same crc32 term bucket as the inverted index —
a payload lookup for one term reads exactly one bucket directory with
a parquet predicate pushdown on ``term``.
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from engine.build import _term_buckets, term_bucket


def build_payload_index(input_files: list[str] | str, out_dir: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        delimiter: str = "|", default: float = 1.0,
                        n_buckets: int = 4) -> str:
    """Build the payload store. Tokens without a parseable payload
    suffix get ``default`` (upstream filter behavior)."""
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir

    def frags(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        tl = pc.split_pattern_regex(texts, r"\s+")
        tl = tl.combine_chunks() if isinstance(tl, pa.ChunkedArray) else tl
        offs = tl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(tl.values.to_pandas(), dtype=object)
        doc_of = np.repeat(b[id_col].to_numpy(),
                           np.diff(offs))
        keep = np.array([len(t) > 0 for t in flat], dtype=bool)
        flat, doc_of = flat[keep], doc_of[keep]
        # positions restart per doc over the kept tokens
        n_docs = len(offs) - 1
        kept_per_doc = np.bincount(
            np.repeat(np.arange(n_docs), np.diff(offs))[keep],
            minlength=n_docs)
        pos = np.concatenate([np.arange(c) for c in kept_per_doc]) \
            if len(flat) else np.empty(0, np.int64)
        # vocabulary-level parse: token string → (term, payload) is a
        # pure function, so parse each UNIQUE raw token once
        uniq, inv = np.unique(flat, return_inverse=True)
        terms = np.empty(len(uniq), dtype=object)
        pays = np.empty(len(uniq), dtype=np.float32)
        for i, tok in enumerate(uniq):
            head, sep, tail = tok.rpartition(delimiter)
            if sep:
                try:
                    pays[i] = np.float32(tail)
                    terms[i] = head.lower()
                    continue
                except ValueError:
                    pass
            pays[i] = np.float32(default)
            terms[i] = tok.lower()
        # same bucket hash the readers route lookups with — reuse the
        # build helper so writer and reader can never diverge
        buckets = _term_buckets(terms, n_buckets).astype(np.int64)
        return pa.table({
            "bucket": pa.array(buckets[inv]),
            "term": pa.array(terms[inv], type=pa.string()),
            "doc_id": pa.array(doc_of, type=pa.int64()),
            "pos": pa.array(pos.astype(np.int64)),
            "payload": pa.array(pays[inv], type=pa.float32())})

    ds = ray.data.read_parquet(input_files, columns=[id_col, text_col])
    ds.map_batches(frags, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["bucket"])
    with open(done, "w", encoding="utf-8") as f:
        f.write("ok")
    return out_dir


def payload_score_topk(pay_dir: str, term: str, k: int = 10,
                       agg: str = "sum", n_buckets: int = 4) -> pa.Table:
    """PayloadScoreQuery (includeSpanScore=false): per matching doc,
    score = f32 sum/max of the term's occurrence payloads; ties break
    docID-ascending like every other collector."""
    b = term_bucket(term, n_buckets)
    shard = os.path.join(pay_dir, f"bucket={b}")
    if not os.path.isdir(shard):
        docs = np.empty(0, np.int64)
        sc = np.empty(0, np.float32)
    else:
        t = pq.read_table(shard, columns=["term", "doc_id", "payload"],
                          filters=[("term", "==", term)])
        docs_all = t["doc_id"].to_numpy()
        pay = t["payload"].to_numpy()
        docs, inv = np.unique(docs_all, return_inverse=True)
        if agg == "sum":
            # f64 accumulate then one f32 cast (sums of small ints stay
            # exact; general floats follow the engine's discipline)
            acc = np.zeros(len(docs), dtype=np.float64)
            np.add.at(acc, inv, pay.astype(np.float64))
            sc = acc.astype(np.float32)
        elif agg == "max":
            sc = np.full(len(docs), -np.inf, dtype=np.float32)
            np.maximum.at(sc, inv, pay)
        else:
            raise ValueError(f"unknown payload agg {agg!r}")
    order = np.lexsort((docs, -sc.astype(np.float64)))[:k]
    return pa.table({
        "rank": pa.array(np.arange(len(order), dtype=np.int64)),
        "doc_id": pa.array(docs[order], type=pa.int64()),
        "score": pa.array(sc[order], type=pa.float32())})


def payload_check_topk(pay_dir: str, term: str, value: float,
                       k: int = 10, n_buckets: int = 4) -> pa.Table:
    """SpanPayloadCheckQuery (upstream
    ``L/queries/payloads/SpanPayloadCheckQuery`` [U]): only term
    occurrences whose payload EQUALS ``value`` match. Documented
    restatement: doc score = f32 count of matching occurrences (the
    payload store carries no norms, so the span's BM25 weighting is
    out of scope); ties break docID-ascending."""
    b = term_bucket(term, n_buckets)
    shard = os.path.join(pay_dir, f"bucket={b}")
    if not os.path.isdir(shard):
        docs = np.empty(0, np.int64)
        freq = np.empty(0, np.int64)
    else:
        t = pq.read_table(shard, columns=["term", "doc_id", "payload"],
                          filters=[("term", "==", term)])
        m = t["payload"].to_numpy() == value
        docs, freq = np.unique(t["doc_id"].to_numpy()[m],
                               return_counts=True)
    sc = freq.astype(np.float32)
    order = np.lexsort((docs, -sc.astype(np.float64)))[:k]
    return pa.table({
        "rank": pa.array(np.arange(len(order), dtype=np.int64)),
        "doc_id": pa.array(docs[order], type=pa.int64()),
        "score": pa.array(sc[order], type=pa.float32())})
