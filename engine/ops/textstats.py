"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword-overlap heuristic), quality scoring, token
counting, document fingerprinting, per-term df/cf stats and
significant-terms contrast mining (SURVEY.md §2.6 ``significantTerms``;
upstream ``SJ/stream/SignificantTermsStream.java``,
``S/update/processor/`` langid/signature processors [U]).

All transforms are vectorized pyarrow/numpy batch fns; the shared
tokenization rule (lowercase, split on ``[^a-z0-9]+``, drop empties) is
reproducible in ANSI SQL so every op here has a DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from engine.analysis import ENGLISH_STOP_WORDS

TOKEN_SPLIT = r"[^a-z0-9]+"


def _flat_tokens(texts) -> tuple[np.ndarray, pa.Array]:
    """column → (doc offsets int64[n+1], flat non-empty token values)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), TOKEN_SPLIT)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values
    keep = pc.not_equal(flat, "")
    keepn = keep.to_numpy(zero_copy_only=False)
    # per-doc counts of kept tokens
    n = len(texts)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    counts = np.bincount(doc_of[keepn], minlength=n)
    new_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=new_offs[1:])
    return new_offs, flat.filter(keep)


def token_count(ds: ray.data.Dataset, text_col: str,
                id_cols: list[str]) -> ray.data.Dataset:
    """Per-document token count (whitespace/punct tokenizer)."""
    def f(b: pa.Table) -> pa.Table:
        offs, _ = _flat_tokens(b[text_col])
        out = b.select(id_cols)
        return out.append_column(
            "n_tokens", pa.array(np.diff(offs), type=pa.int64()))
    return ds.map_batches(f, batch_format="pyarrow")


def quality_score(ds: ray.data.Dataset, text_col: str,
                  id_cols: list[str]) -> ray.data.Dataset:
    """Heuristic quality features: length, token stats, stopword ratio.

    All ratios are single double divisions per row — bit-identical to
    the same SQL expressions (no order-dependent accumulation).
    """
    stop = pa.array(sorted(ENGLISH_STOP_WORDS), type=pa.string())

    def f(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        offs, flat = _flat_tokens(texts)
        n_tokens = np.diff(offs)
        n = len(n_tokens)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), n_tokens)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        sum_len = np.bincount(doc_of, weights=tok_len, minlength=n)
        is_stop = pc.is_in(flat, value_set=stop).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(doc_of[is_stop], minlength=n)
        n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
        safe = np.maximum(n_tokens, 1).astype(np.float64)
        out = b.select(id_cols)
        out = out.append_column("n_chars_m", pa.array(n_chars.astype(np.int64)))
        out = out.append_column("n_tokens", pa.array(n_tokens.astype(np.int64)))
        out = out.append_column(
            "mean_token_len", pa.array(sum_len.astype(np.float64) / safe))
        out = out.append_column(
            "stopword_ratio", pa.array(n_stop.astype(np.float64) / safe))
        return out
    return ds.map_batches(f, batch_format="pyarrow")


def langid(ds: ray.data.Dataset, text_col: str, id_cols: list[str],
           threshold: float = 0.08) -> ray.data.Dataset:
    """n-gram-free language ID heuristic: English stopword density.

    Documents whose stopword token ratio exceeds ``threshold`` are
    labelled ``en``, else ``unk`` (the shape of the reference's langid
    update processor, with a deterministic, SQL-checkable scorer).
    """
    qs = quality_score(ds, text_col, id_cols)

    def f(b: pa.Table) -> pa.Table:
        ratio = b["stopword_ratio"]
        lab = pc.if_else(pc.greater(ratio, threshold),
                         pa.scalar("en"), pa.scalar("unk"))
        out = b.select(id_cols)
        out = out.append_column("stopword_ratio", ratio)
        return out.append_column("lang_pred", lab)
    return qs.map_batches(f, batch_format="pyarrow")


def fingerprint(ds: ray.data.Dataset, text_col: str,
                id_cols: list[str]) -> ray.data.Dataset:
    """Content fingerprint: md5 of the normalized token stream (the
    reference's ``SignatureUpdateProcessor`` MD5 signature shape [U])."""
    def f(b: pa.Table) -> pa.Table:
        offs, flat = _flat_tokens(b[text_col])
        toks = np.asarray(flat.to_pandas(), dtype=object)
        sigs = []
        for i in range(len(offs) - 1):
            s = " ".join(toks[offs[i]:offs[i + 1]])
            sigs.append(hashlib.md5(s.encode("utf-8")).hexdigest())
        out = b.select(id_cols)
        return out.append_column("fingerprint",
                                 pa.array(sigs, type=pa.string()))
    return ds.map_batches(f, batch_format="pyarrow")


def term_doc_freq(ds: ray.data.Dataset, text_col: str
                  ) -> ray.data.Dataset:
    """(term, df, cf) over a corpus — partial per batch, combined by a
    small grouped sum (docs never split across batches, so per-batch
    distinct (term, doc) counts are exact partials)."""
    def partial(b: pa.Table) -> pa.Table:
        offs, flat = _flat_tokens(b[text_col])
        toks = np.asarray(flat.to_pandas(), dtype=object)
        n = len(offs) - 1
        doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
        uniq, code = np.unique(toks, return_inverse=True)
        pair = code * n + doc_of
        up, cnt = np.unique(pair, return_counts=True)
        t = (up // n).astype(np.int64)
        tdf = np.bincount(t, minlength=len(uniq))
        tcf = np.bincount(t, weights=cnt, minlength=len(uniq))
        return pa.table({
            "term": pa.array(uniq, type=pa.string()),
            "df": pa.array(tdf.astype(np.int64)),
            "cf": pa.array(tcf.astype(np.int64)),
        })
    part = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum
    return part.groupby("term").aggregate(Sum("df"), Sum("cf"))


def significant_terms(ds: ray.data.Dataset, text_col: str,
                      subset_fn, min_df: int = 5) -> ray.data.Dataset:
    """Contrast mining: foreground (subset) df vs background df.

    score = (fg_df / fg_N) / (bg_df / bg_N) — terms over-represented in
    the subset (upstream ``SignificantTermsStream`` [U]).
    """
    fg = ds.filter(subset_fn)
    bg_stats = term_doc_freq(ds, text_col)
    fg_stats = term_doc_freq(fg, text_col)
    fg_n = fg.count()
    bg_n = ds.count()
    joined = fg_stats.join(bg_stats, join_type="inner", num_partitions=4,
                           on=("term",), right_suffix="_bg")

    def score(b: pa.Table) -> pa.Table:
        fgdf = b["sum(df)"].to_numpy().astype(np.float64)
        bgdf = b["sum(df)_bg"].to_numpy().astype(np.float64)
        keep = fgdf >= min_df
        s = (fgdf / fg_n) / (bgdf / bg_n)
        out = pa.table({
            "term": b["term"],
            "fg_df": pa.array(fgdf.astype(np.int64)),
            "bg_df": pa.array(bgdf.astype(np.int64)),
            "score": pa.array(s),
        })
        return out.filter(pa.array(keep))
    return joined.map_batches(score, batch_format="pyarrow")


def text_profile_signature(ds: ray.data.Dataset, text_col: str,
                           id_cols: list[str], quant_rate: float = 0.01
                           ) -> ray.data.Dataset:
    """Fuzzy near-dup signature (upstream ``TextProfileSignature``
    [U]): per-doc token freqs are quantized — ``quant =
    floor(maxfreq*quant_rate + 0.5)`` raised to 2 when maxfreq > 1 (1
    otherwise), tokens with freq < quant dropped, surviving freqs
    rounded DOWN to a multiple of quant — and the profile
    ``"token freq ..."`` sorted by (freq desc, token asc) is md5'd.
    (Upstream sorts by freq only with map order breaking ties; the
    token tie-break here makes the signature deterministic and
    SQL-checkable — documented conformance boundary.)"""
    def f(b: pa.Table) -> pa.Table:
        offs, flat = _flat_tokens(b[text_col])
        toks = np.asarray(flat.to_pandas(), dtype=object)
        sigs = []
        for i in range(len(offs) - 1):
            seg = toks[offs[i]:offs[i + 1]]
            if not len(seg):
                sigs.append(hashlib.md5(b"").hexdigest())
                continue
            terms, counts = np.unique(seg, return_counts=True)
            maxf = int(counts.max())
            quant = int(np.floor(maxf * quant_rate + 0.5))
            if quant < 2:
                quant = 2 if maxf > 1 else 1
            keep = counts >= quant
            t2, c2 = terms[keep], (counts[keep] // quant) * quant
            order = np.lexsort((t2, -c2))
            prof = " ".join(f"{t2[j]} {int(c2[j])}" for j in order)
            sigs.append(hashlib.md5(prof.encode("utf-8")).hexdigest())
        out = b.select(id_cols)
        return out.append_column("sig", pa.array(sigs, type=pa.string()))
    return ds.map_batches(f, batch_format="pyarrow")


def chunk_windows(ds: ray.data.Dataset, text_col: str, id_col: str,
                  window: int = 64, stride: int = 48
                  ) -> ray.data.Dataset:
    """Fixed-window token chunking with overlap — the standard
    RAG/pretraining chunker: chunk i of a doc covers tokens
    ``[i*stride, i*stride + window)``; the last chunk is the first
    one whose window reaches the end (short docs yield exactly one
    chunk). Pure per-doc arithmetic (no positions materialized):
    chunk count = 1 if n <= window else 1 + ceil((n-window)/stride),
    fully vectorized per batch — one streaming pass, no shuffle.
    Emits (id, chunk, start_tok, len_toks)."""
    def f(b: pa.Table) -> pa.Table:
        offs, _ = _flat_tokens(b[text_col])
        n = np.diff(offs).astype(np.int64)
        c = np.where(
            n <= window, 1,
            1 + (np.maximum(n - window, 0) + stride - 1) // stride
        ).astype(np.int64)
        doc_rep = np.repeat(np.arange(len(n)), c)
        csum = np.concatenate(([0], np.cumsum(c)[:-1]))
        idx = np.arange(int(c.sum()), dtype=np.int64) \
            - np.repeat(csum, c)
        start = idx * stride
        ln = np.minimum(window, n[doc_rep] - start)
        ids = b[id_col].to_numpy(zero_copy_only=False)[doc_rep]
        return pa.table({
            id_col: pa.array(ids).cast(b[id_col].type),
            "chunk": pa.array(idx, type=pa.int64()),
            "start_tok": pa.array(start, type=pa.int64()),
            "len_toks": pa.array(ln, type=pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def bigram_lm_score(ds: ray.data.Dataset, text_col: str, id_col: str
                    ) -> ray.data.Dataset:
    """LM-based quality scoring — the CCNet/KenLM pattern: train a
    bigram model on the corpus itself (add-one smoothing), then score
    every doc by its total bigram log-likelihood. Low scores flag
    gibberish / boilerplate for filtering.

    Two streaming passes, no shuffle of the corpus: (1) unigram +
    bigram counts via per-batch pre-aggregated partials → one
    vocabulary-sized groupby; the model table is broadcast once
    (``ray.put``) with each distinct bigram's contribution
    PRE-COMPUTED as f32(ln((c12+1)/(c1+V))); (2) per-doc scoring =
    one ``index_in`` against the bigram dictionary + a left-to-right
    f64 ``np.add.reduceat`` per doc. The f32-contribution +
    position-ordered-f64-sum law is the documented exactness
    boundary: DuckDB replays it with ``list_reduce(list(...
    ORDER BY position))``. At 100 TB the broadcast LM would be
    pruned/quantized (CCNet ships a fixed pretrained model); here the
    model is corpus-trained so the oracle can re-derive it."""
    def pairs(b: pa.Table) -> pa.Table:
        offs, flat = _flat_tokens(b[text_col])
        toks = flat.to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        same = doc_of[1:] == doc_of[:-1]
        w1, w2 = toks[:-1][same], toks[1:][same]
        big = pa.table({"w1": pa.array(w1), "w2": pa.array(w2)}) \
            .group_by(["w1", "w2"]).aggregate([([], "count_all")]) \
            .rename_columns(["w1", "w2", "c"])
        uni = pa.table({"w1": pa.array(toks)}).group_by("w1") \
            .aggregate([([], "count_all")]) \
            .rename_columns(["w1", "c"])
        # "" marks unigram rows (analyzer never emits empty tokens),
        # so one groupby carries both count kinds through the shuffle
        return pa.table({
            "w1": pa.concat_arrays([big["w1"].combine_chunks(),
                                    uni["w1"].combine_chunks()]),
            "w2": pa.concat_arrays(
                [big["w2"].combine_chunks(),
                 pa.array([""] * uni.num_rows, type=pa.string())]),
            "c": pa.concat_arrays([big["c"].combine_chunks(),
                                   uni["c"].combine_chunks()])})

    from engine.ops.classify import _collect
    # materialize the (small) pre-aggregated partials before the
    # groupby: Ray's sort-based shuffle otherwise EXECUTES the lazy
    # upstream a second time to sample boundaries (the documented
    # double-execution pitfall) — one full corpus tokenize+count
    # pass saved per call
    counts = _collect(ds.map_batches(pairs, batch_format="pyarrow")
                      .materialize()
                      .groupby(["w1", "w2"]).sum("c"))
    is_uni = pc.equal(counts["w2"], "")
    uni_t = counts.filter(is_uni)
    big_t = counts.filter(pc.invert(is_uni))
    c1 = dict(zip(uni_t["w1"].to_pylist(),
                  uni_t["sum(c)"].to_pylist()))
    vsize = float(len(c1))
    bw1 = big_t["w1"].to_pylist()
    keys = pa.array([a + "\x00" + b for a, b in
                     zip(bw1, big_t["w2"].to_pylist())])
    c12 = big_t["sum(c)"].to_numpy().astype(np.float64)
    denom = np.array([c1[a] for a in bw1], dtype=np.float64) + vsize
    contrib = np.log((c12 + 1.0) / denom).astype(np.float32) \
        .astype(np.float64)
    model_ref = ray.put((keys, contrib))

    def score(b: pa.Table) -> pa.Table:
        keys_, contrib_ = ray.get(model_ref)
        offs, flat = _flat_tokens(b[text_col])
        toks = flat.to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        same = doc_of[1:] == doc_of[:-1]
        bg = pa.array([a + "\x00" + c for a, c in
                       zip(toks[:-1][same], toks[1:][same])])
        idx = pc.index_in(bg, value_set=keys_) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        lp = contrib_[idx]                 # every corpus bigram hits
        bdoc = doc_of[:-1][same]
        # per-doc LEFT-TO-RIGHT f64 sums (np.add.reduce is sequential)
        ndoc = len(offs) - 1
        nb = np.bincount(bdoc, minlength=ndoc)
        starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
        has = nb > 0
        sums = np.zeros(ndoc, dtype=np.float64)
        if lp.size:
            sums[has] = np.add.reduceat(lp, starts[has])
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[has]).cast(b[id_col].type),
            "n_bigrams": pa.array(nb[has], type=pa.int64()),
            "logprob": pa.array(sums[has], type=pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def ccnet_partition(ds: ray.data.Dataset, text_col: str, id_col: str,
                    k: int = 3) -> pa.Table:
    """CCNet head/middle/tail perplexity partitioning (Wenzek et al.
    2020, "CCNet: Extracting High Quality Monolingual Datasets from
    Web Crawl Data"): score every doc with the corpus-trained bigram
    LM, order by mean per-bigram log-likelihood (higher = more
    fluent) and cut into ``k`` equal-count buckets — bucket 1 = head
    (cleanest), bucket ``k`` = tail. Documented boundary vs upstream:
    CCNet scores with a FIXED pretrained KenLM 5-gram and cuts by
    cumulative BYTE share; the corpus-trained bigram LM and doc-count
    ntile cut keep the whole chain exact and SQL-replayable.

    Distributed shape: scoring is :func:`bigram_lm_score`'s two
    streaming passes; the global cut is ONE distributed sort of the
    narrow (id, n_bigrams, logprob) score table + the O(blocks)
    boundary-stitch — per-block row counts ship to the driver, the
    driver prefix-sums block offsets, each block assigns its ntile
    buckets from the broadcast offset. The corpus itself is never
    collected; driver work is O(blocks)."""
    scored = bigram_lm_score(ds, text_col, id_col)

    def avg(b: pa.Table) -> pa.Table:
        lp = b["logprob"].to_numpy(zero_copy_only=False)
        n = b["n_bigrams"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "avg_lp", pa.array(lp / n, type=pa.float64()))

    mat = scored.map_batches(avg, batch_format="pyarrow") \
        .sort(["avg_lp", id_col], descending=[True, False]) \
        .materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    sizes = ray.get([nrows.remote(r) for r in refs])
    offs = np.concatenate(([0], np.cumsum(sizes)[:-1])).astype(np.int64)
    total = int(sum(sizes))
    q, rem = divmod(total, k)

    @ray.remote
    def assign(t: pa.Table, off: int) -> pa.Table:
        r = off + np.arange(t.num_rows, dtype=np.int64)
        head = rem * (q + 1)
        # ntile(k): the first rem buckets carry one extra row
        b = np.where(r < head, r // max(q + 1, 1),
                     rem + (r - head) // max(q, 1)) + 1
        return pa.table({
            id_col: t[id_col],
            "avg_lp": t["avg_lp"],
            "bucket": pa.array(b, type=pa.int64())})

    out = ray.get([assign.remote(r, int(offs[i]))
                   for i, r in enumerate(refs)])
    return pa.concat_tables(out)


def bpe_train(ds: ray.data.Dataset, text_col: str, num_merges: int
              ) -> pa.Table:
    """BPE tokenizer induction (Sennrich et al. 2016, "Neural Machine
    Translation of Rare Words with Subword Units"): learn the top
    ``num_merges`` byte-pair merges from the corpus. Returns one row
    per merge step: ``(step, w1, w2, cnt)`` — the merged pair and its
    weighted adjacent-occurrence count at selection time.

    Distributed shape — the classic trick that makes BPE tractable:
    training runs over the WORD-TYPE table, not the corpus. Pass 1
    collapses the corpus to (word, count) with per-batch partials +
    ONE vocabulary-sized groupby; each merge iteration is then a
    vocab-sized pair-count groupby + a vectorized
    ``replace_substring`` over the symbol sequences — the corpus is
    never touched again. Symbol sequences are strings with a
    two-space inner boundary (`` a  b  c ``) so one non-overlapping
    left-to-right replace per merge implements EXACTLY the BPE greedy
    merge pass, including same-symbol runs (`` a  a  a  a `` →
    `` aa  aa ``), with identical semantics in pyarrow, Python and
    SQL. Ties break (count desc, w1 asc, w2 asc) — deterministic."""
    def wcount(b: pa.Table) -> pa.Table:
        _, flat = _flat_tokens(b[text_col])
        return pa.table({"w": flat}).group_by("w") \
            .aggregate([([], "count_all")]).rename_columns(["w", "c"])

    words = ds.map_batches(wcount, batch_format="pyarrow") \
        .groupby("w").sum("c")

    def init(b: pa.Table) -> pa.Table:
        # vocab-sized (word TYPES), not corpus-sized: the per-row
        # join here is off the hot path by construction
        seqs = [" " + "  ".join(w) + " "
                for w in b["w"].to_pylist()]
        return pa.table({"seq": pa.array(seqs, type=pa.string()),
                         "c": b["sum(c)"]})

    seqs = words.map_batches(init, batch_format="pyarrow") \
        .materialize()

    def pair_partials(b: pa.Table) -> pa.Table:
        syms = pc.split_pattern(
            pc.utf8_trim_whitespace(b["seq"]), "  ").combine_chunks()
        offs = syms.offsets.to_numpy(zero_copy_only=False)
        flat = syms.values
        per = np.diff(offs)
        row_of = np.repeat(np.arange(len(per)), per)
        same = row_of[1:] == row_of[:-1]
        cnt = b["c"].to_numpy(zero_copy_only=False)
        w = cnt[row_of[:-1][same]]
        t = pa.table({
            "w1": flat.slice(0, max(len(flat) - 1, 0)).filter(
                pa.array(same)),
            "w2": flat.slice(1).filter(pa.array(same)),
            "cw": pa.array(w, type=pa.int64())})
        return t.group_by(["w1", "w2"]).aggregate([("cw", "sum")]) \
            .rename_columns(["w1", "w2", "c"])

    steps = []
    for step in range(num_merges):
        top = seqs.map_batches(pair_partials, batch_format="pyarrow") \
            .groupby(["w1", "w2"]).sum("c") \
            .sort(["sum(c)", "w1", "w2"],
                  descending=[True, False, False]).limit(1).take_all()
        if not top:
            break
        w1, w2, c = top[0]["w1"], top[0]["w2"], int(top[0]["sum(c)"])
        steps.append({"step": step + 1, "w1": w1, "w2": w2, "cnt": c})
        old, new = f" {w1}  {w2} ", f" {w1}{w2} "

        def apply(b: pa.Table, old=old, new=new) -> pa.Table:
            return pa.table({
                "seq": pc.replace_substring(b["seq"], pattern=old,
                                            replacement=new),
                "c": b["c"]})

        seqs = seqs.map_batches(apply, batch_format="pyarrow") \
            .materialize()

    return pa.table({
        "step": pa.array([s["step"] for s in steps], type=pa.int64()),
        "w1": pa.array([s["w1"] for s in steps], type=pa.string()),
        "w2": pa.array([s["w2"] for s in steps], type=pa.string()),
        "cnt": pa.array([s["cnt"] for s in steps], type=pa.int64())})


def bpe_encode_count(ds: ray.data.Dataset, text_col: str, id_col: str,
                     merges: list[tuple[str, str]]) -> ray.data.Dataset:
    """Apply learned BPE merges (from :func:`bpe_train`) to every doc
    and report its post-merge token count — the tokenizer-application
    half of the pair, i.e. what a token-budget planner runs over the
    corpus. One streaming ``map_batches`` with the merge list
    broadcast in the closure; per batch the doc is rendered in the
    same two-space symbol encoding as training, with a ``\\x1f``
    pseudo-symbol between words so merges never cross a word
    boundary, then each merge is ONE vectorized non-overlapping
    ``replace_substring`` — identical greedy semantics to training
    and to the SQL replay."""
    def f(b: pa.Table) -> pa.Table:
        offs, flat = _flat_tokens(b[text_col])
        per = np.diff(offs)
        # 'cat' -> 'c  a  t  ' (RE2 has no lookahead; rtrim later)
        spaced = pc.replace_substring_regex(
            flat, pattern="(.)", replacement="\\1  ")
        lists = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()), spaced)
        joined = pc.binary_join(lists, "\x1f  ")
        seq = pc.binary_join_element_wise(
            " ", pc.utf8_rtrim(joined, characters=" "), " ", "")
        for w1, w2 in merges:
            seq = pc.replace_substring(
                seq, pattern=f" {w1}  {w2} ", replacement=f" {w1}{w2} ")
        syms = pc.split_pattern(pc.utf8_trim(seq, characters=" "), "  ")
        if isinstance(syms, pa.ChunkedArray):
            syms = syms.combine_chunks()
        o = syms.offsets.to_numpy(zero_copy_only=False)
        flat_s = syms.values
        not_sep = pc.not_equal(flat_s, "\x1f") \
            .to_numpy(zero_copy_only=False)
        row_of = np.repeat(np.arange(len(per)), np.diff(o))
        n_bpe = np.bincount(row_of[not_sep], minlength=len(per))
        n_bpe[per == 0] = 0        # empty doc splits to one '' symbol
        return pa.table({
            id_col: b[id_col],
            "n_words": pa.array(per, type=pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, type=pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(ds: ray.data.Dataset, text_col: str, id_col: str
                 ) -> ray.data.Dataset:
    """Gopher quality-filter rules (Rae et al. 2021, "Scaling
    Language Models: ...Gopher", App. A1.1) — the word/n-gram subset
    that applies to single-line documents: word count ∈ [50, 100000],
    mean word length ∈ [3, 10], ≥80% of words contain an alphabetic
    character, ≥2 of the 8 Gopher stop words present, fraction of
    characters in the most-frequent 2-gram ≤ 0.20, fraction of
    characters in duplicated 5-grams ≤ 0.15. Documented boundary vs
    upstream: line/paragraph rules are vacuous here (corpus docs are
    single-line), and the dup-5-gram fraction counts
    ``count × chars`` over duplicated grams rather than masking
    overlapping character positions. Entirely row-local — one
    streaming ``map_batches``, no shuffle; per-doc top-gram selection
    is a vectorized batch-level sort, not a Python loop."""
    def f(b: pa.Table) -> pa.Table:
        import pandas as pd
        offs, flat = _flat_tokens(b[text_col])
        per = np.diff(offs)
        ndoc = len(per)
        doc_of = np.repeat(np.arange(ndoc), per)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nchars = np.zeros(ndoc, dtype=np.int64)
        np.add.at(nchars, doc_of, lens)
        alpha = pc.match_substring_regex(flat, "[a-z]") \
            .to_numpy(zero_copy_only=False)
        nalpha = np.bincount(doc_of[alpha], minlength=ndoc)
        stop_hits = np.zeros(ndoc, dtype=np.int64)
        toks_np = flat.to_numpy(zero_copy_only=False)
        for w in GOPHER_STOPS:
            m = toks_np == w
            present = np.zeros(ndoc, dtype=bool)
            present[doc_of[m]] = True
            stop_hits += present

        def grams(n: int) -> tuple[np.ndarray, pa.Array, np.ndarray]:
            if len(flat) < n:
                return (np.empty(0, dtype=np.int64),
                        pa.array([], type=pa.string()),
                        np.empty(0, dtype=np.int64))
            same = doc_of[n - 1:] == doc_of[:len(doc_of) - n + 1]
            parts = [flat.slice(i, len(flat) - n + 1) for i in range(n)]
            # \x1f separator: below every token byte (so the joined
            # string sorts exactly like the (w1, w2) tuple) and —
            # unlike \x00 — survives the pandas groupby hash
            joined = pc.binary_join_element_wise(*parts, "\x1f")
            gc = sum(lens[i:len(lens) - n + 1 + i] for i in range(n))
            return (doc_of[:len(doc_of) - n + 1][same],
                    joined.filter(pa.array(same)), gc[same])

        top2 = np.zeros(ndoc, dtype=np.int64)
        d2, g2, c2 = grams(2)
        if len(d2):
            df = pd.DataFrame({"d": d2, "g": g2.to_pandas(), "ch": c2})
            agg = df.groupby(["d", "g"], as_index=False) \
                .agg(c=("ch", "size"), ch=("ch", "first"))
            agg = agg.sort_values(["d", "c", "g"],
                                  ascending=[True, False, True])
            head = agg.drop_duplicates("d", keep="first")
            top2[head["d"].to_numpy()] = \
                (head["c"] * head["ch"]).to_numpy()
        dup5 = np.zeros(ndoc, dtype=np.int64)
        d5, g5, c5 = grams(5)
        if len(d5):
            df = pd.DataFrame({"d": d5, "g": g5.to_pandas(), "ch": c5})
            agg = df.groupby(["d", "g"], as_index=False) \
                .agg(c=("ch", "size"), ch=("ch", "first"))
            agg = agg[agg["c"] >= 2]
            if len(agg):
                contrib = (agg["c"] * agg["ch"]).groupby(
                    agg["d"]).sum()
                dup5[contrib.index.to_numpy()] = contrib.to_numpy()

        nw = per.astype(np.float64)
        safe = np.maximum(per, 1).astype(np.float64)
        safec = np.maximum(nchars, 1).astype(np.float64)
        mwl = nchars.astype(np.float64) / safe
        af = nalpha.astype(np.float64) / safe
        t2f = top2.astype(np.float64) / safec
        d5f = dup5.astype(np.float64) / safec
        keep = ((per >= 50) & (per <= 100000)
                & (mwl >= 3.0) & (mwl <= 10.0) & (af >= 0.8)
                & (stop_hits >= 2) & (t2f <= 0.20) & (d5f <= 0.15))
        return pa.table({
            id_col: b[id_col],
            "n_words": pa.array(per, type=pa.int64()),
            "mean_wlen": pa.array(mwl, type=pa.float64()),
            "alpha_frac": pa.array(af, type=pa.float64()),
            "stop_hits": pa.array(stop_hits, type=pa.int64()),
            "top2_frac": pa.array(t2f, type=pa.float64()),
            "dup5_frac": pa.array(d5f, type=pa.float64()),
            "keep": pa.array(keep.astype(np.int64), type=pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def blended_infix_suggest(ds: ray.data.Dataset, text_col: str,
                          id_col: str, weight_col: str, prefix: str,
                          k: int = 10) -> pa.Table:
    """BlendedInfixSuggester (upstream
    ``L/suggest/analyzing/BlendedInfixSuggester.java`` [U],
    ``BlenderType.POSITION_LINEAR``): each document is a suggestion
    entry whose lookup key may match as a PREFIX of ANY token in the
    suggestion text (the infix part); the entry's static weight is
    blended by the position of the FIRST matching token —
    ``blended = weight / (1 + position)`` — so matches near the start
    outrank deep-infix matches of heavier entries. Top-k by blended
    desc, id asc.

    One streaming pass: per-batch vectorized first-match-position
    (prefix mask + grouped min) and partial top-k; the final merge is
    k-sized — no shuffle."""
    def f(b: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          "match_pos": pa.array([], type=pa.int64()),
                          "score": pa.array([], type=pa.float64())})
        offs, flat = _flat_tokens(b[text_col])
        m = pc.starts_with(flat, prefix).to_numpy(zero_copy_only=False)
        if not m.any():
            return empty
        n = len(offs) - 1
        doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
        pos_in_doc = np.arange(len(doc_of), dtype=np.int64) \
            - offs[doc_of]
        first = np.full(n, 1 << 62, dtype=np.int64)
        np.minimum.at(first, doc_of[m], pos_in_doc[m])
        hit = first < (1 << 62)
        ids = b[id_col].to_numpy()[hit]
        w = b[weight_col].to_numpy().astype(np.float64)[hit]
        pos = first[hit]
        score = w / (1.0 + pos)
        order = np.lexsort((ids, -score))[:k]     # partial top-k
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "match_pos": pa.array(pos[order], pa.int64()),
                         "score": pa.array(score[order], pa.float64())})

    parts = ds.map_batches(f, batch_format="pyarrow").take_all()
    if not parts:
        return pa.table({"rank": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "match_pos": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    ids = np.array([r[id_col] for r in parts], dtype=np.int64)
    pos = np.array([r["match_pos"] for r in parts], dtype=np.int64)
    score = np.array([r["score"] for r in parts], dtype=np.float64)
    order = np.lexsort((ids, -score))[:k]
    return pa.table({
        "rank": pa.array(np.arange(len(order), dtype=np.int64)),
        id_col: pa.array(ids[order], pa.int64()),
        "match_pos": pa.array(pos[order], pa.int64()),
        "score": pa.array(score[order], pa.float64())})


def free_text_suggest(ds: ray.data.Dataset, text_col: str,
                      contexts: list[str], k: int = 3) -> pa.Table:
    """FreeTextSuggester (upstream
    ``L/suggest/analyzing/FreeTextSuggester.java`` [U]) at n=2: given
    a context word, suggest the most frequent NEXT words from corpus
    bigram counts — the n-gram-LM completion suggester. Upstream
    builds an FST over n-gram counts with stupid-backoff; here the
    bigram count table IS the model (rank = count desc, word asc; no
    backoff needed since every context is required to appear — the
    documented conformance boundary).

    One streaming pass of per-batch (context, next) count partials
    FILTERED to the context words before the shuffle, then a
    context-sized groupby — no corpus-wide exchange."""
    ctx = pa.array(sorted(set(contexts)), type=pa.string())

    def pairs(b: pa.Table) -> pa.Table:
        empty = pa.table({"w1": pa.array([], type=pa.string()),
                          "w2": pa.array([], type=pa.string()),
                          "c": pa.array([], type=pa.int64())})
        offs, flat = _flat_tokens(b[text_col])
        toks = flat.to_numpy(zero_copy_only=False)
        if len(toks) < 2:
            return empty
        doc_of = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        same = doc_of[1:] == doc_of[:-1]
        w1, w2 = toks[:-1][same], toks[1:][same]
        m = pc.is_in(pa.array(w1, type=pa.string()), value_set=ctx) \
            .to_numpy(zero_copy_only=False)
        if not m.any():
            return empty
        t = pa.table({"w1": pa.array(w1[m], type=pa.string()),
                      "w2": pa.array(w2[m], type=pa.string())}) \
            .group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return t.rename_columns(["w1", "w2", "c"])

    from engine.ops.classify import _collect
    # materialize the (small) pre-aggregated partials before the
    # groupby: Ray's sort-based shuffle otherwise EXECUTES the lazy
    # upstream a second time to sample boundaries (the documented
    # double-execution pitfall) — one full corpus tokenize+count
    # pass saved per call
    counts = _collect(ds.map_batches(pairs, batch_format="pyarrow")
                      .materialize()
                      .groupby(["w1", "w2"]).sum("c"))
    df = counts.to_pandas()
    df = df.rename(columns={"sum(c)": "count"})
    df = df.sort_values(["w1", "count", "w2"],
                        ascending=[True, False, True])
    df["rank"] = df.groupby("w1").cumcount()
    df = df[df["rank"] < k]
    out = pa.Table.from_pandas(
        df[["w1", "rank", "w2", "count"]].reset_index(drop=True),
        preserve_index=False)
    out = out.rename_columns(["context", "rank", "suggestion", "count"])
    return pa.table({
        "context": out["context"],
        "rank": out["rank"].cast(pa.int64()),
        "suggestion": out["suggestion"],
        "count": out["count"].cast(pa.int64())})


def dsir_importance(ds: ray.data.Dataset, text_col: str, id_col: str,
                    is_target_col: str, n_buckets: int = 1024,
                    hash_fn=None) -> ray.data.Dataset:
    """DSIR-style hashed n-gram importance weighting (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling" —
    public paper): per-doc log importance weight log(p_target(x) /
    p_source(x)) under bag-of-hashed-ngram models. Features are
    analyzed unigrams + space-joined bigrams hashed into ``n_buckets``
    buckets; both distributions are add-one smoothed over the bucket
    space. Docs with high weight look like the target stratum
    (``is_target_col`` bool) and get upsampled by importance
    resampling downstream.

    Distributed shape (no corpus shuffle): pass 1 emits per-batch
    bucket-count partials (≤2·n_buckets rows each, output-sized) →
    one tiny groupby; the per-bucket log-ratio table (n_buckets f32
    values, f64 inner math) is broadcast once via ``ray.put``; pass 2
    is one streaming ``map_batches`` scoring each doc as
    Σ_f32_contrib in f64, unigram sum and bigram sum folded
    left-to-right separately then added (the documented exactness
    contract a SQL oracle replays with two ordered list_reduce
    folds). ``hash_fn`` defaults to the md5-low-64 hash that matches
    DuckDB ``md5_number_lower``."""
    if hash_fn is None:
        from engine.registry import _md5_64 as hash_fn
    B = np.uint64(n_buckets)

    def feats(b: pa.Table):
        offs, flat = _flat_tokens(b[text_col])
        toks = flat.to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        same = doc_of[1:] == doc_of[:-1]
        uni_h = (hash_fn(toks) % B).astype(np.int64)
        big = np.char.add(np.char.add(
            toks[:-1][same].astype(str), " "),
            toks[1:][same].astype(str)) if same.any() else \
            np.empty(0, dtype=str)
        big_h = (hash_fn(big) % B).astype(np.int64)
        return offs, doc_of, same, uni_h, big_h

    def counts(b: pa.Table) -> pa.Table:
        offs, doc_of, same, uni_h, big_h = feats(b)
        tgt_doc = b[is_target_col].to_numpy(zero_copy_only=False) \
            .astype(bool)
        h = np.concatenate([uni_h, big_h])
        t = np.concatenate([tgt_doc[doc_of], tgt_doc[doc_of[:-1][same]]])
        cs = np.bincount(h, minlength=n_buckets)
        ct = np.bincount(h[t], minlength=n_buckets)
        return pa.table({
            "b": pa.array(np.arange(n_buckets, dtype=np.int64)),
            "ct": pa.array(ct.astype(np.int64)),
            "cs": pa.array(cs.astype(np.int64))})

    from engine.ops.classify import _collect
    agg = _collect(ds.map_batches(counts, batch_format="pyarrow")
                   .groupby("b").sum(["ct", "cs"]))
    order = np.argsort(agg["b"].to_numpy())
    ct = np.zeros(n_buckets, np.float64)
    cs = np.zeros(n_buckets, np.float64)
    bb = agg["b"].to_numpy()[order]
    ct[bb] = agg["sum(ct)"].to_numpy()[order].astype(np.float64)
    cs[bb] = agg["sum(cs)"].to_numpy()[order].astype(np.float64)
    tt, ts = float(ct.sum()), float(cs.sum())
    ratio = np.log(((ct + 1.0) * (ts + n_buckets))
                   / ((cs + 1.0) * (tt + n_buckets))) \
        .astype(np.float32).astype(np.float64)
    rref = ray.put(ratio)

    def score(b: pa.Table) -> pa.Table:
        r = ray.get(rref)
        offs, doc_of, same, uni_h, big_h = feats(b)
        ndoc = len(offs) - 1

        def part_sums(h: np.ndarray, owner: np.ndarray) -> np.ndarray:
            out = np.zeros(ndoc, dtype=np.float64)
            if not h.size:
                return out
            nb = np.bincount(owner, minlength=ndoc)
            starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
            has = nb > 0
            out[has] = np.add.reduceat(r[h], starts[has])
            return out

        w = part_sums(uni_h, doc_of) \
            + part_sums(big_h, doc_of[:-1][same])
        return pa.table({
            id_col: b[id_col],
            "dsir_logw": pa.array(np.round(w, 3))})

    return ds.map_batches(score, batch_format="pyarrow")


def phrases_identify(ds: ray.data.Dataset, text_col: str,
                     queries: list[str]) -> pa.Table:
    """PhrasesIdentificationComponent (upstream
    ``S/handler/component/PhrasesIdentificationComponent.java`` [U]):
    score each query string's candidate phrases against corpus
    shingle statistics — the `phrases` response section listing every
    candidate with its evidence. Candidates are the query's adjacent
    word pairs (``maxIndexedPositionLength=2`` here); each scores
    ``ttf(pair) / min(ttf(word))`` — the conditional probability of
    the whole phrase given its rarest constituent word. Conformance
    boundary: upstream blends per-field df/ttf skew terms into its
    score; the component surface (scored candidate-phrase list) and
    the stats plumbing (indexed-shingle ttf lookups) are the same.
    Zero-evidence pairs (ttf 0) drop, like upstream's
    score<=0 cut.

    ONE streaming pass emits word- and pair-count partials
    PRE-FILTERED to the candidate sets (tiny) — the corpus is never
    shuffled; the driver folds partial counts bounded by
    |candidates| x blocks."""
    cands: list[tuple[str, int, str, str]] = []   # (query, pos, w1, w2)
    for q in queries:
        ws = [w for w in re.split(TOKEN_SPLIT, q.lower()) if w]
        for i in range(len(ws) - 1):
            cands.append((q, i, ws[i], ws[i + 1]))
    need_w = pa.array(sorted({w for c in cands for w in c[2:]}),
                      type=pa.string())
    need_p = pa.array(sorted({f"{c[2]} {c[3]}" for c in cands}),
                      type=pa.string())

    def partial(b: pa.Table) -> pa.Table:
        keys: list[np.ndarray] = []
        kinds: list[np.ndarray] = []
        cnts: list[np.ndarray] = []
        offs, flat = _flat_tokens(b[text_col])
        toks = flat.to_numpy(zero_copy_only=False)
        wm = pc.is_in(flat, value_set=need_w) \
            .to_numpy(zero_copy_only=False)
        if wm.any():
            u, c = np.unique(toks[wm], return_counts=True)
            keys.append(u)
            kinds.append(np.zeros(len(u), dtype=np.int64))
            cnts.append(c)
        if len(toks) >= 2:
            doc_of = np.repeat(np.arange(len(offs) - 1),
                               np.diff(offs))
            # candidate pairs need BOTH words in need_w: mask before
            # building pair strings so the join is candidate-sized,
            # not corpus-sized
            cand = doc_of[1:] == doc_of[:-1]
            cand &= wm[:-1] & wm[1:]
            if cand.any():
                pair = pc.binary_join_element_wise(
                    pa.array(toks[:-1][cand], type=pa.string()),
                    pa.array(toks[1:][cand], type=pa.string()), " ")
                pm = pc.is_in(pair, value_set=need_p) \
                    .to_numpy(zero_copy_only=False)
                if pm.any():
                    u, c = np.unique(
                        pair.to_numpy(zero_copy_only=False)[pm],
                        return_counts=True)
                    keys.append(u)
                    kinds.append(np.ones(len(u), dtype=np.int64))
                    cnts.append(c)
        if not keys:
            return pa.table({"key": pa.array([], type=pa.string()),
                             "kind": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        return pa.table({
            "key": pa.array(np.concatenate(keys), type=pa.string()),
            "kind": pa.array(np.concatenate(kinds), type=pa.int64()),
            "c": pa.array(np.concatenate(cnts), type=pa.int64())})

    from collections import Counter

    # graph._collect: None-safe on all-empty partials AND
    # materialize()s first (to_arrow_refs on a lazy plan would run
    # the corpus pass twice via the limit-1 schema probe)
    from engine.ops.graph import _collect
    t = _collect(ds.map_batches(partial, batch_format="pyarrow"))
    wc: Counter = Counter()
    bc: Counter = Counter()
    if t is not None:
        for k, kd, c in zip(t["key"].to_pylist(),
                            t["kind"].to_pylist(),
                            t["c"].to_pylist()):
            (wc if kd == 0 else bc)[k] += c
    rows = []
    for q, i, w1, w2 in cands:
        pc_ttf = bc.get(f"{w1} {w2}", 0)
        if pc_ttf < 1:
            continue
        mw = min(wc.get(w1, 0), wc.get(w2, 0))
        rows.append((q, i, f"{w1} {w2}", pc_ttf, mw,
                     float(pc_ttf) / float(mw)))
    rows.sort(key=lambda r: (r[0], r[1]))
    return pa.table({
        "input": pa.array([r[0] for r in rows], type=pa.string()),
        "pos": pa.array([r[1] for r in rows], type=pa.int64()),
        "phrase": pa.array([r[2] for r in rows], type=pa.string()),
        "pair_ttf": pa.array([r[3] for r in rows], type=pa.int64()),
        "min_word_ttf": pa.array([r[4] for r in rows],
                                 type=pa.int64()),
        "score": pa.array([r[5] for r in rows], type=pa.float64())})
