"""Classification operators (upstream ``lucene/classification``:
``SimpleNaiveBayesClassifier``, ``KNearestNeighborClassifier`` [U]).

Multinomial Naive Bayes with add-one smoothing, trained from index-time
statistics exactly like the reference (the classifier there reads term
freqs from an IndexReader; here the same stats come from a distributed
grouped aggregate). Training output is a SMALL model (vocab × classes
log-prob matrix) broadcast via ``ray.put``; classification is a
vectorized actor-pool-free ``map_batches`` (pure numpy gather + add).

Determinism note: class scores are f64 log-prob sums whose addition
order differs from a SQL recomputation; the *predicted label* is the
contract (argmax, ties broken by class name asc). Margins on real data
are ~1e-4 and up while cross-engine f64 noise is ~1e-13, so the label
is stable — the score itself is deliberately not emitted.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from engine.ops.textstats import _flat_tokens


def naive_bayes_train(ds: ray.data.Dataset, text_col: str,
                      label_col: str) -> dict:
    """Train: distributed partial (label, term, tf) counts inside
    ``map_batches`` (pre-aggregated per batch — the combiner), then one
    small ``groupby`` shuffle of unique (label, term) keys only."""
    def partial(b: pa.Table) -> pa.Table:
        offs, flat = _flat_tokens(b[text_col])
        doc_of = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        lab = b[label_col].take(pa.array(doc_of))
        t = pa.table({"label": lab, "term": flat,
                      "tf": pa.array(np.ones(len(flat), dtype=np.int64))})
        return t.group_by(["label", "term"]).aggregate([("tf", "sum")]) \
            .rename_columns(["label", "term", "tf"])

    tf_tab = _collect(ds.map_batches(partial, batch_format="pyarrow")
                      .groupby(["label", "term"]).sum("tf"))
    tf_tab = tf_tab.rename_columns(["label", "term", "tf"])

    doc_tab = _collect(ds.groupby(label_col).count())
    labels = sorted(doc_tab[label_col].to_pylist())
    ndocs = dict(zip(doc_tab[label_col].to_pylist(),
                     doc_tab["count()"].to_pylist()))
    n_total = sum(ndocs.values())

    vocab = pc.unique(tf_tab["term"]).sort()
    v = len(vocab)
    tidx = {t: i for i, t in enumerate(vocab.to_pylist())}
    lidx = {c: j for j, c in enumerate(labels)}
    counts = np.zeros((v, len(labels)), dtype=np.float64)
    li = np.array([lidx[x] for x in tf_tab["label"].to_pylist()])
    ti = np.array([tidx[x] for x in tf_tab["term"].to_pylist()])
    counts[ti, li] = tf_tab["tf"].to_numpy().astype(np.float64)
    cf = counts.sum(axis=0)
    # add-one smoothing over the GLOBAL vocab (reference:
    # SimpleNaiveBayesClassifier#getWordProbability [U])
    logprob = np.log((counts + 1.0) / (cf + v))
    default = np.log(1.0 / (cf + v))      # unseen-term row
    prior = np.log(np.array([ndocs[c] for c in labels]) / n_total)
    return {"classes": labels, "vocab": vocab, "logprob": logprob,
            "default": default, "prior": prior}


def naive_bayes_classify(ds: ray.data.Dataset, text_col: str,
                         id_cols: list[str], model: dict,
                         out_col: str = "label_pred"
                         ) -> ray.data.Dataset:
    """Classify: model broadcast once (``ray.put``), per-batch numpy
    gather of token log-probs + segmented add — no Python loop over
    rows or tokens."""
    lp = np.vstack([model["logprob"], model["default"][None, :]])
    ref = ray.put({"vocab": model["vocab"], "lp": lp,
                   "prior": model["prior"],
                   "classes": np.array(model["classes"])})

    def f(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        offs, flat = _flat_tokens(b[text_col])
        n = len(offs) - 1
        idx = pc.index_in(flat, value_set=m["vocab"])
        ti = idx.to_numpy(zero_copy_only=False).astype(np.float64)
        ti = np.where(np.isnan(ti), len(m["vocab"]), ti).astype(np.int64)
        doc_of = np.repeat(np.arange(n), np.diff(offs))
        scores = np.tile(m["prior"], (n, 1))
        np.add.at(scores, doc_of, m["lp"][ti])
        pred = m["classes"][np.argmax(scores, axis=1)]
        out = b.select(id_cols)
        return out.append_column(out_col, pa.array(pred))

    return ds.map_batches(f, batch_format="pyarrow")


def _collect(ds: ray.data.Dataset) -> pa.Table:
    # materialize() first: to_arrow_refs() on a LAZY dataset runs a
    # limit-1 schema probe as a separate full execution of the plan
    # (observed on Ray 2.49 Aggregate plans); on a MaterializedDataset
    # the refs are returned without re-execution
    tabs = [t for t in ray.get(ds.materialize().to_arrow_refs())
            if t.num_rows]
    return pa.concat_tables(tabs).combine_chunks()


def train_logistic(ds: ray.data.Dataset, text_col: str, label_col: str,
                   pos_label: str, terms: list[str],
                   iterations: int = 3) -> pa.Table:
    """``train``/TextLogitStream analog (upstream
    ``SJ/stream/TextLogitStream.java`` — Solr's iterative distributed
    logistic-regression trainer [U]): binary term-presence features +
    bias, full-batch gradient descent, one streaming pass per
    iteration (per-batch integer gradient partials, tiny final sum),
    weights broadcast back each round — the same shard-partials →
    coordinator-update loop as upstream.

    Conformance boundary (documented): the link is the HARD sigmoid
    ``clamp(z/4 + 1/2, 0, 1)`` in 1e-6 fixed point and the step is
    ``w -= floor(g / 2n)`` — every quantity is an exact integer, so
    the trained weights are bit-reproducible in SQL (upstream trains
    float sigmoids; exactness is traded for an oracle-checkable
    trajectory). Returns (feature, weight_micro) with bias first.
    """
    k = len(terms)
    w = np.zeros(k + 1, dtype=np.int64)   # [bias, terms...] micro-units
    n_total = 0
    for it in range(iterations):
        w_ref = ray.put(w.copy())

        def partial(b: pa.Table) -> pa.Table:
            wv = ray.get(w_ref)
            offs, flat = _flat_tokens(b[text_col])
            nrows = len(offs) - 1
            x = np.zeros((nrows, k), dtype=np.int64)
            doc_of = np.repeat(np.arange(nrows), np.diff(offs))
            # one vectorized dictionary probe for all feature terms
            idx = pc.index_in(flat, value_set=pa.array(terms)) \
                .to_numpy(zero_copy_only=False)
            hit = ~np.isnan(idx)
            x[doc_of[hit], idx[hit].astype(np.int64)] = 1
            y = (b[label_col].to_numpy(zero_copy_only=False)
                 == pos_label).astype(np.int64) * 1_000_000
            z = wv[0] + x @ wv[1:]
            hs = np.minimum(np.maximum(z + 2_000_000, 0), 4_000_000) // 4
            err = hs - y
            g = np.empty(k + 1, dtype=np.int64)
            g[0] = int(err.sum())
            g[1:] = err @ x
            out = {"n": pa.array([nrows], type=pa.int64())}
            for j in range(k + 1):
                out[f"g{j}"] = pa.array([int(g[j])], type=pa.int64())
            return pa.table(out)

        cols = ["n"] + [f"g{j}" for j in range(k + 1)]
        agg = ds.map_batches(partial, batch_format="pyarrow").sum(cols)
        n_total = int(agg["sum(n)"])
        g = np.array([int(agg[f"sum(g{j})"]) for j in range(k + 1)],
                     dtype=object)
        # python-int floor division (SQL replays with a mod-adjusted //)
        w = np.array([int(w[j]) - (int(g[j]) // (2 * n_total))
                      for j in range(k + 1)], dtype=np.int64)
    return pa.table({
        "feature": pa.array(["__bias__"] + list(terms)),
        "weight_micro": pa.array(w, type=pa.int64()),
    })


def features_select(ds: ray.data.Dataset, text_col: str,
                    label_col: str, pos_label: str,
                    k: int = 10) -> pa.Table:
    """``features``/FeaturesSelectionStream analog (upstream
    ``SJ/stream/FeaturesSelectionStream.java`` [U]): rank dictionary
    terms by how well doc-level presence predicts a binary label and
    keep the top k. Conformance boundary (documented): the score is
    the chi-squared statistic of the 2×2 presence/label contingency
    table rather than upstream's information gain — both are standard
    filter-method feature scores, and chi² has a single-division form
    (exact integer numerator/denominator → one f64 divide) that
    replays bit-exactly in SQL, where IG's log sums would not.

    Shape: per-batch doc-level distinct (term, label) counts
    pre-aggregated inside ``map_batches`` (the combiner), one
    ``groupby(term)`` shuffle of the vocabulary-sized count table,
    then the chi² ranking over that VOCAB-sized (not corpus-sized)
    table driver-side in exact Python ints (bignum-safe for any
    corpus; the count table is bounded by the dictionary)."""
    def partial(b: pa.Table) -> pa.Table:
        offs, flat = _flat_tokens(b[text_col])
        doc_of = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        t = pa.table({"doc": pa.array(doc_of), "term": flat}) \
            .group_by(["doc", "term"]).aggregate([])   # presence
        pos = (b[label_col].to_numpy(zero_copy_only=False) == pos_label)
        p = pos[t["doc"].to_numpy()]
        out = pa.table({
            "term": t["term"],
            "n11": pa.array(p.astype(np.int64)),
            "n10": pa.array((~p).astype(np.int64))})
        return out.group_by("term") \
            .aggregate([("n11", "sum"), ("n10", "sum")]) \
            .rename_columns(["term", "n11", "n10"])

    cnt = _collect(ds.map_batches(partial, batch_format="pyarrow")
                   .groupby("term").sum(["n11", "n10"]))
    cnt = cnt.rename_columns(["term", "n11", "n10"])
    lab = _collect(ds.groupby(label_col).count())
    npos = nneg = 0
    for c, n in zip(lab[label_col].to_pylist(),
                    lab["count()"].to_pylist()):
        if c == pos_label:
            npos += n
        else:
            nneg += n
    n_all = npos + nneg
    rows = []
    for term, n11, n10 in zip(cnt["term"].to_pylist(),
                              cnt["n11"].to_pylist(),
                              cnt["n10"].to_pylist()):
        diff = n11 * (nneg - n10) - n10 * (npos - n11)
        num = n_all * diff * diff
        den = (n11 + n10) * (n_all - n11 - n10) * npos * nneg
        chi2 = float(num) / float(den) if den else 0.0
        rows.append((term, n11, n10, chi2))
    rows.sort(key=lambda r: (-r[3], r[0]))
    rows = rows[:k]
    return pa.table({
        "term": pa.array([r[0] for r in rows]),
        "n11": pa.array([r[1] for r in rows], type=pa.int64()),
        "n10": pa.array([r[2] for r in rows], type=pa.int64()),
        "chi2": pa.array([r[3] for r in rows], type=pa.float64()),
    })


def logistic_classify(ds: ray.data.Dataset, text_col: str,
                      id_cols: list[str], weights: pa.Table,
                      ) -> ray.data.Dataset:
    """``classify``/ClassifyStream analog over a trained logistic
    model (upstream ``SJ/stream/ClassifyStream.java`` + ModelStream
    [U]): apply broadcast weights to every doc in one vectorized
    ``map_batches`` pass. Score ``z_micro`` is the exact integer
    logit (1e-6 fixed point, bias first in ``weights``); ``pred`` is
    hard-sigmoid(z) > 1/2  ⇔  z > 0."""
    feats = weights["feature"].to_pylist()
    wv = np.asarray(weights["weight_micro"].to_pylist(), dtype=np.int64)
    assert feats[0] == "__bias__"
    terms = feats[1:]
    k = len(terms)

    def f(b: pa.Table) -> pa.Table:
        offs, flat = _flat_tokens(b[text_col])
        nrows = len(offs) - 1
        x = np.zeros((nrows, k), dtype=np.int64)
        doc_of = np.repeat(np.arange(nrows), np.diff(offs))
        idx = pc.index_in(flat, value_set=pa.array(terms)) \
            .to_numpy(zero_copy_only=False)
        hit = ~np.isnan(idx)
        x[doc_of[hit], idx[hit].astype(np.int64)] = 1
        z = wv[0] + x @ wv[1:]
        out = b.select(id_cols)
        out = out.append_column("z_micro", pa.array(z, type=pa.int64()))
        return out.append_column(
            "pred", pa.array((z > 0).astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow")
