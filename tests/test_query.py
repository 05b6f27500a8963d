"""Query engine tests: dual-execution equivalence (brute oracle vs BMW),
tie-break semantics, actor-pool query path, formula pinning.

The brute-force scorer is the in-sandbox stand-in for the Lucene
reference (SURVEY.md §5 item 2); BMW must be rank- AND score-identical.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from engine.query import K1, B, IndexReader, QueryEngine, idf, norm_cache
from engine.smallfloat import LENGTH_TABLE
from engine.synth import make_queries


@pytest.fixture(scope="session")
def reader(smoke_index):
    idx, _, _ = smoke_index
    return IndexReader(idx)


def test_bm25_formula_pinned():
    """Pin the Lucene 8.x scoring constants (no k1+1 numerator)."""
    assert K1 == 1.2 and B == 0.75
    # idf = ln(1 + (N - df + 0.5)/(df + 0.5)) as float32
    assert idf(100, 10) == np.float32(math.log(1 + (100 - 10 + 0.5) / 10.5))
    # norm cache scores against the decoded lossy length
    c = norm_cache(10.0)
    assert c[3] == K1 * (1 - B + B * (LENGTH_TABLE[3] / 10.0))
    assert LENGTH_TABLE[3] == 3
    # a doc of length 3 with tf=2: exact score path
    w = idf(100, 10)
    s = w * np.float32(2.0 / (2.0 + c[3]))
    assert s.dtype == np.float32


def test_dual_execution_full_query_set(reader):
    """BMW == brute oracle on every reference query, every k."""
    for q in make_queries():
        bf = reader.brute_force_topk(q["query_text"], q["k"])
        bmw = reader.bmw_topk(q["query_text"], q["k"])
        assert bf["doc_id"].to_pylist() == bmw["doc_id"].to_pylist(), q
        assert bf["score"].to_pylist() == bmw["score"].to_pylist(), q


def test_stopword_and_oov_queries_empty(reader):
    for q in ["the", "of to and", "qqqnosuchterm"]:
        assert reader.bmw_topk(q, 10).num_rows == 0
        assert reader.brute_force_topk(q, 10).num_rows == 0


def test_scores_descending_and_tiebreak(reader):
    top = reader.brute_force_topk("running connection index", 50)
    scores = top["score"].to_numpy()
    docs = top["doc_id"].to_numpy()
    assert (np.diff(scores) <= 0).all()
    for i in range(len(scores) - 1):
        if scores[i] == scores[i + 1]:
            assert docs[i] < docs[i + 1]  # lower docID wins ties


def test_duplicate_query_terms_double_score(reader):
    one = reader.brute_force_topk("zephyr", 5)
    two = reader.brute_force_topk("zephyr zephyr", 5)
    assert one["doc_id"].to_pylist() == two["doc_id"].to_pylist()
    a = one["score"].to_numpy().astype(np.float64)
    b = two["score"].to_numpy().astype(np.float64)
    assert np.allclose(b, 2 * a, rtol=1e-6)


def test_resolve_docs_roundtrip(reader, smoke_corpus):
    import glob

    import pyarrow.parquet as pq

    corpus, _ = smoke_corpus
    top = reader.bmw_topk("zephyr", 5)
    res = reader.resolve_docs(top["doc_id"].to_numpy())
    # doc_id must equal rank of (conv_id, turn_idx) in the sorted corpus
    tabs = [pq.read_table(f, columns=["conv_id", "turn_idx"])
            for f in sorted(glob.glob(corpus + "/*.parquet"))]
    full = pa.concat_tables(tabs).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    for row in res.to_pylist():
        got = full.slice(row["doc_id"], 1).to_pylist()[0]
        assert got["conv_id"] == row["conv_id"]
        assert got["turn_idx"] == row["turn_idx"]


def test_query_engine_dataset_path(ray_session, smoke_index):
    """queries as a Dataset through the QueryEngine actor pool."""
    import ray.data

    idx, _, _ = smoke_index
    qs = make_queries()[:8]
    ds = ray.data.from_items(qs)
    res = ds.map_batches(
        QueryEngine, fn_constructor_args=(idx,),
        batch_format="pyarrow", concurrency=2).to_pandas()
    r = IndexReader(idx)
    for q in qs:
        mine = res[res["query_id"] == q["query_id"]].sort_values("rank")
        want = r.bmw_topk(q["query_text"], q["k"]).to_pandas()
        assert mine["doc_id"].tolist() == want["doc_id"].tolist(), q
        assert mine["score"].tolist() == want["score"].tolist(), q


def test_preload_merges_sublists_and_all_strategies_agree(smoke_index):
    """Preloaded reader re-merges salted sub-lists into one compressed
    list per term; auto/TAAT/BMW and the lazy-lookup reader all return
    identical (doc, score) top-k."""
    from engine.query import IndexReader as IR

    idx, _, _ = smoke_index
    pre = IR(idx, preload=True)
    assert all(len(v) == 1 for v in pre._term_cache.values())
    lazy = IR(idx)
    for q in ["running", "error timeout retry", "merge score query",
              "zephyr", "the"]:
        for k in (1, 10, 100):
            ref = lazy.brute_force_topk(q, k)
            for t in (pre.topk(q, k), pre.bmw_topk(q, k),
                      pre.brute_force_topk(q, k), lazy.bmw_topk(q, k)):
                assert t["doc_id"].to_pylist() == ref["doc_id"].to_pylist()
                assert t["score"].to_pylist() == ref["score"].to_pylist()


def test_phrase_query_matches_recount(reader, smoke_corpus):
    """Phrase matcher vs a direct per-doc recount over the corpus."""
    import glob

    import pyarrow.parquet as pq

    corpus, _ = smoke_corpus
    tabs = [pq.read_table(f, columns=["conv_id", "turn_idx", "text"])
            for f in sorted(glob.glob(corpus + "/*.parquet"))]
    full = pa.concat_tables(tabs).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    texts = full["text"].to_pylist()

    phrase = "running connection"
    terms = reader.analyzer.query_terms(phrase)
    assert len(terms) == 2
    want_freq = {}
    for doc_id, t in enumerate(texts):
        toks = [x for x, _ in reader.analyzer.analyze_text(t)]
        # positions skip stopwords, so recount over emitted tokens with
        # their positions
        pos = {p: x for x, p in reader.analyzer.analyze_text(t)}
        n = sum(1 for p, x in pos.items()
                if x == terms[0] and pos.get(p + 1) == terms[1])
        if n:
            want_freq[doc_id] = n
    got = reader.phrase_topk(phrase, k=10_000)
    got_docs = got["doc_id"].to_pylist()
    assert sorted(got_docs) == sorted(want_freq)


def test_boolean_must_subset_of_should(reader):
    must = reader.boolean_topk(must=["running", "index"], k=1000)
    one = reader.brute_force_topk("running", 10_000)
    two = reader.brute_force_topk("index", 10_000)
    inter = set(one["doc_id"].to_pylist()) & set(two["doc_id"].to_pylist())
    assert set(must["doc_id"].to_pylist()) <= inter
    assert must["total_hits"][0].as_py() == len(inter) if must.num_rows else True


def test_wildcard_expansion(reader):
    terms = reader.expand_prefix("con")
    assert any(t.startswith("con") for t in terms)
    top = reader.wildcard_topk("con", k=5)
    assert top.num_rows > 0


def test_k1_b_query_time_knobs(smoke_index):
    """Similarity params are query-time: same index, different k1/b →
    valid but different rankings; b=0 ignores length normalization."""
    from engine.query import IndexReader as IR
    from engine.smallfloat import LENGTH_TABLE  # noqa: F401

    idx, _, _ = smoke_index
    default = IR(idx)
    flat = IR(idx, k1=1.2, b=0.0)
    d = default.brute_force_topk("running connection", 20)
    f = flat.brute_force_topk("running connection", 20)
    assert d.num_rows and f.num_rows
    assert d["score"].to_pylist() != f["score"].to_pylist()
    # b=0: norm cache constant across lengths
    assert len(set(flat.cache.tolist())) == 1


def test_golden_topk_fixture(reader):
    """End-to-end golden (FIXTURES.md F3): the committed
    (query, rank, doc_id, score_f32) table must be reproduced exactly —
    guards analyzer/codec/scoring changes across sessions."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "golden_topk.json")
    with open(path) as f:
        golden = json.load(f)
    got = []
    for q in make_queries():
        top = reader.bmw_topk(q["query_text"], q["k"])
        for row in top.to_pylist():
            got.append({"query_id": q["query_id"], "rank": row["rank"],
                        "doc_id": row["doc_id"],
                        "score": float(row["score"])})
    assert len(got) == len(golden)
    for g, w in zip(got, golden):
        assert g == w, (g, w)


def test_total_hits_brute(reader):
    top = reader.brute_force_topk("zephyr", 3)
    assert top.num_rows == 3
    assert top["total_hits"][0].as_py() >= 3


def test_warm_reader_zero_io(smoke_index):
    """Second phrase/fuzzy/prefix query on a warm reader must hit only
    the in-RAM caches (VERDICT r1 #7): the Parquet-read counter stays
    flat after the first query."""
    from engine.query import IndexReader

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    r.phrase_topk("running connection", k=5)
    r.fuzzy_topk("running", k=5)
    r.wildcard_topk("con", k=5)
    warm = r._io_reads
    t1 = r.phrase_topk("running connection", k=5)
    t2 = r.fuzzy_topk("running", k=5)
    t3 = r.wildcard_topk("con", k=5)
    assert r._io_reads == warm, "warm queries performed Parquet reads"
    # and the answers match a fresh reader's
    r2 = IndexReader(idx)
    assert t1.equals(r2.phrase_topk("running connection", k=5))
    assert t2.equals(r2.fuzzy_topk("running", k=5))
    assert t3.equals(r2.wildcard_topk("con", k=5))


def test_preloaded_reader_phrase_matches_cold(smoke_index):
    """Preload (with salted sub-list re-merge incl. positions) must not
    change phrase/boolean results."""
    from engine.query import IndexReader

    idx, _, _ = smoke_index
    cold = IndexReader(idx)
    warm = IndexReader(idx, preload=True)
    for q in ["running connection", "the running", "index merge"]:
        assert cold.phrase_topk(q, k=10).equals(warm.phrase_topk(q, k=10))
    assert cold.topk("running connection index", 10).equals(
        warm.topk("running connection index", 10))


def test_query_engine_shared_reader(ray_session, smoke_index):
    """QueryEngine(reader_ref=...) must serve from a driver-preloaded
    shared reader and match per-actor construction exactly."""
    import ray
    import ray.data

    from engine.query import IndexReader, QueryEngine

    idx, _, _ = smoke_index
    ref = ray.put(IndexReader(idx, preload=True))
    qs = [{"query_id": i, "query_text": q, "k": 5} for i, q in
          enumerate(["running connection", "zephyr", "index merge score"])]
    shared = ray.data.from_items(qs).map_batches(
        QueryEngine, fn_constructor_args=(idx,),
        fn_constructor_kwargs={"resolve": False, "reader_ref": ref},
        batch_format="pyarrow", concurrency=2).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    local = ray.data.from_items(qs).map_batches(
        QueryEngine, fn_constructor_args=(idx,),
        fn_constructor_kwargs={"resolve": False},
        batch_format="pyarrow", concurrency=2).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert shared.equals(local)


# ------------------- suggest / spellcheck / MLT / highlight / rescore

def test_suggest_prefix_ranked_by_df(reader):
    t = reader.suggest_prefix_topk("s", k=8)
    assert t.num_rows <= 8
    dfs = t["df"].to_pylist()
    terms = t["term"].to_pylist()
    assert all(x.startswith("s") for x in terms)
    assert all(a >= b for a, b in zip(dfs, dfs[1:]))
    # tie-break term asc within equal df
    for i in range(len(dfs) - 1):
        if dfs[i] == dfs[i + 1]:
            assert terms[i] < terms[i + 1]


def test_suggest_no_match_empty(reader):
    assert reader.suggest_prefix_topk("zzzzqq", k=5).num_rows == 0


def test_terms_enum_options(reader):
    # sort=count mirrors suggest ordering on the same prefix
    a = reader.terms_enum(prefix="s", sort="count", k=8)
    b = reader.suggest_prefix_topk("s", k=8)
    assert a.equals(b)
    # sort=index is term order; mincount filters by df
    t = reader.terms_enum(prefix="s", mincount=2, sort="index", k=50)
    terms = t["term"].to_pylist()
    assert terms == sorted(terms)
    assert all(d >= 2 for d in t["df"].to_pylist())
    # regex narrows the dictionary scan (fullmatch semantics)
    r = reader.terms_enum(regex="s.*", sort="index", k=1000)
    assert all(x.startswith("s") for x in r["term"].to_pylist())
    assert reader.terms_enum(prefix="zzzzqq", k=5).num_rows == 0


def test_terms_enum_ttf_matches_decoded_tf_sum(reader):
    # terms.ttf: the metadata cf must equal the decoded tf sum and
    # always be >= df (every matching doc contributes >= 1)
    t = reader.terms_enum(sort="count", k=10, ttf=True)
    assert t.column_names == ["term", "df", "ttf"]
    for term, df, ttf in zip(t["term"].to_pylist(),
                             t["df"].to_pylist(), t["ttf"].to_pylist()):
        assert ttf >= df
        subs = reader.lookup([term])[term]
        decoded = sum(int(s.decode_all()[1].sum()) for s in subs)
        assert ttf == decoded


def test_spellcheck_excludes_exact_and_caps_distance(reader):
    vocab = reader.vocabulary()
    seed = vocab[0]
    t = reader.spellcheck(seed, k=10, max_edits=2)
    assert seed not in t["term"].to_pylist()
    assert all(1 <= d <= 2 for d in t["dist"].to_pylist())


def test_mlt_excludes_seed_and_ranks(smoke_index):
    from engine.build import build_stored_fields

    idx, _, _ = smoke_index
    build_stored_fields(idx)
    r = IndexReader(idx)
    t = r.more_like_this_topk(5, k=10)
    assert 5 not in t["doc_id"].to_pylist()
    assert t["rank"].to_pylist() == list(range(t.num_rows))
    sc = t["score"].to_numpy()
    assert all(a >= b for a, b in zip(sc, sc[1:]))


def test_highlight_snippets_contain_query_term(smoke_index):
    from engine.build import build_stored_fields

    idx, _, _ = smoke_index
    build_stored_fields(idx)
    r = IndexReader(idx)
    top = r.topk("zephyr", 5)
    hl = r.highlight_topk("zephyr", 5, window=2)
    assert hl["doc_id"].to_pylist() == top["doc_id"].to_pylist()
    for s in hl["snippet"].to_pylist():
        assert "zephyr" in s.split()
        assert len(s.split()) <= 5


def test_ltr_rescore_is_permutation_of_first_pass(reader):
    base = reader.brute_force_topk("index merge", 50)
    res = reader.ltr_rescore_topk("index merge", k=50, k0=50)
    assert sorted(res["doc_id"].to_pylist()) == \
        sorted(base["doc_id"].to_pylist())
    # matched-term-count feature dominates at equal bm25 only via
    # the linear blend; final scores must be sorted
    sc = res["score"].to_numpy()
    assert all(a >= b for a, b in zip(sc, sc[1:]))


def test_match_scores_counts_all_matches(reader):
    m = reader.match_scores("zephyr")
    bf = reader.brute_force_topk("zephyr", 10)
    assert m.num_rows == bf["total_hits"][0].as_py()


def test_span_near_two_terms_matches_sloppy_pairs(reader):
    """2-term span_near chain-count == sloppy phrase pair-count (same
    window definition) for every slop."""
    for slop in (0, 1, 3):
        a = reader.span_near_topk(["index", "merge"], slop, k=20)
        b = reader.sloppy_phrase_topk("index", "merge", slop, k=20)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        assert a["score"].to_pylist() == b["score"].to_pylist()


def test_span_near_three_term_recount(reader, smoke_corpus):
    """Brute recount of 3-term chains from raw tokens."""
    import os

    import pyarrow.parquet as pq

    terms, slop = ["index", "merge", "sort"], 2
    res = reader.span_near_topk(terms, slop, k=1000)
    got = dict(zip(res["doc_id"].to_pylist(),
                   [None] * res.num_rows))
    corpus, _ = smoke_corpus
    tabs = [pq.read_table(os.path.join(corpus, f))
            for f in sorted(os.listdir(corpus)) if f.endswith(".parquet")]
    rows = pa.concat_tables(tabs).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    texts = rows["text"].to_pylist()
    expect = {}
    for d, text in enumerate(texts):
        toks = [t for t, _ in reader.analyzer.analyze_text(text)]
        pos = {t: [i for i, x in enumerate(toks) if x == t]
               for t in terms}
        n = 0
        for p1 in pos[terms[0]]:
            for p2 in pos[terms[1]]:
                if not (0 < p2 - p1 <= slop + 1):
                    continue
                for p3 in pos[terms[2]]:
                    if 0 < p3 - p2 <= slop + 1:
                        n += 1
        if n:
            expect[d] = n
    assert set(got) == set(expect)


def test_span_near_missing_term_empty(reader):
    assert reader.span_near_topk(
        ["index", "qqqzz"], 1, k=5).num_rows == 0


def test_interval_maxgaps_brute_recount(reader, smoke_corpus):
    """Total-gap interval triples recounted from raw tokens: doc set
    and per-doc triple counts must match the vectorized pair-expand
    path exactly."""
    import os

    import pyarrow.parquet as pq

    terms, maxgaps = ["index", "merge", "sort"], 2
    res = reader.interval_topk(*terms, maxgaps=maxgaps, k=10_000)
    got = set(res["doc_id"].to_pylist())
    corpus, _ = smoke_corpus
    tabs = [pq.read_table(os.path.join(corpus, f))
            for f in sorted(os.listdir(corpus)) if f.endswith(".parquet")]
    rows = pa.concat_tables(tabs).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    expect = set()
    for d, text in enumerate(rows["text"].to_pylist()):
        toks = [t for t, _ in reader.analyzer.analyze_text(text)]
        pos = {t: [i for i, x in enumerate(toks) if x == t]
               for t in terms}
        if any(
            p1 < p2 < p3 and p3 - p1 - 2 <= maxgaps
            for p1 in pos[terms[0]] for p2 in pos[terms[1]]
                for p3 in pos[terms[2]]):
            expect.add(d)
    assert got == expect


def test_interval_subset_of_span_near(reader):
    """maxgaps bounds the TOTAL interior gap, so every interval match
    also satisfies span_near with per-gap slop = maxgaps."""
    g = 2
    iv = set(reader.interval_topk("index", "merge", "sort",
                                  maxgaps=g, k=10_000)
             ["doc_id"].to_pylist())
    sn = set(reader.span_near_topk(["index", "merge", "sort"], g,
                                   k=10_000)["doc_id"].to_pylist())
    assert iv <= sn


def test_term_in_set_filter_semantics(reader):
    """TermInSet FILTER = should-disjunction scores restricted to the
    set-union docset; the set contributes nothing to the score."""
    scored, sset = ["index", "merge"], ["sort", "flush"]
    full = reader.boolean_topk(should=scored, k=10_000)
    setdocs = set(reader.boolean_topk(should=sset, k=10_000)
                  ["doc_id"].to_pylist())
    want = {d: s for d, s in zip(full["doc_id"].to_pylist(),
                                 full["score"].to_pylist())
            if d in setdocs}
    got = reader.term_in_set_topk(scored, sset, k=10_000)
    assert dict(zip(got["doc_id"].to_pylist(),
                    got["score"].to_pylist())) == want
    assert got["total_hits"][0].as_py() == len(want)


def test_common_terms_demotes_high_df(reader):
    """Candidates = union of LOW-df postings only; every term still
    scores. With the cutoff at 1.0 nothing is demoted and the result
    equals the plain disjunction."""
    terms = ["zephyr", "index", "merge"]   # zephyr is rare
    dfs = {t: len(reader.boolean_topk(should=[t], k=10 ** 6))
           for t in terms}
    frac = (dfs["zephyr"] + 0.5) / reader.N
    res = reader.common_terms_topk(terms, max_tf_fraction=frac,
                                   k=10_000)
    zdocs = set(reader.boolean_topk(should=["zephyr"], k=10 ** 6)
                ["doc_id"].to_pylist())
    assert set(res["doc_id"].to_pylist()) == zdocs
    # scores include the high-df terms' contributions
    zonly = reader.boolean_topk(should=["zephyr"], k=10 ** 6)
    zmap = dict(zip(zonly["doc_id"].to_pylist(),
                    zonly["score"].to_pylist()))
    for d, s in zip(res["doc_id"].to_pylist(),
                    res["score"].to_pylist()):
        assert s >= zmap[d]
    full = reader.boolean_topk(should=terms, k=20)
    same = reader.common_terms_topk(terms, max_tf_fraction=1.0, k=20)
    assert full["doc_id"].to_pylist() == same["doc_id"].to_pylist()
    assert full["score"].to_pylist() == same["score"].to_pylist()


def test_datemath_parser():
    from datetime import datetime

    from engine.ops.datemath import parse

    now = datetime(2024, 1, 25, 13, 47, 9, 123456)
    assert parse("NOW", now) == now
    assert parse("NOW/DAY", now) == datetime(2024, 1, 25)
    assert parse("NOW/HOUR+30MINUTES", now) == \
        datetime(2024, 1, 25, 13, 30)
    assert parse("NOW/DAY-7DAYS+12HOURS", now) == \
        datetime(2024, 1, 18, 12)
    # month clamp like java.time
    jan31 = datetime(2024, 1, 31, 5)
    assert parse("NOW+1MONTH", jan31) == datetime(2024, 2, 29, 5)
    assert parse("NOW-2MONTHS", jan31) == datetime(2023, 11, 30, 5)
    assert parse("NOW/MONTH+1YEAR", jan31) == datetime(2025, 1, 1)
    # ISO anchor with math
    assert parse("2024-01-25T13:47:09Z/HOUR", now) == \
        datetime(2024, 1, 25, 13)
    assert parse("2024-01-25", now) == datetime(2024, 1, 25)
    import pytest as _pt
    for bad in ("NOW/FORTNIGHT", "NOW+3", "NOWx", "NOW/DAY garbage"):
        with _pt.raises(ValueError):
            parse(bad, now)


def test_term_in_set_empty_cases(reader):
    assert reader.term_in_set_topk(["qqqzz"], ["index"],
                                   k=5).num_rows == 0
    assert reader.term_in_set_topk(["index"], ["qqqzz"],
                                   k=5).num_rows == 0


def test_highlight_window_clamps_at_doc_start(smoke_index):
    from engine.build import build_stored_fields

    idx, _, _ = smoke_index
    build_stored_fields(idx)
    r = IndexReader(idx)
    hl = r.highlight_topk("zephyr", 3, window=1000)
    for s, d in zip(hl["snippet"].to_pylist(),
                    hl["doc_id"].to_pylist()):
        # window larger than any doc → snippet is the whole token
        # stream of the doc
        assert s.split() == [t for t, _ in r.analyzer.analyze_text(
            r.fetch_docs(np.array([d]))["text"][0].as_py())]


def test_suggest_k_larger_than_matches(reader):
    vocab = reader.vocabulary()
    pre = vocab[0][:2]
    n = len([t for t in vocab if t.startswith(pre)])
    t = reader.suggest_prefix_topk(pre, k=n + 50)
    assert t.num_rows == n


def test_mlt_unknown_doc_empty(smoke_index):
    from engine.build import build_stored_fields

    idx, _, _ = smoke_index
    build_stored_fields(idx)
    r = IndexReader(idx)
    assert r.more_like_this_topk(10**9, k=5).num_rows == 0


def test_query_engine_type_dispatch(ray_session, smoke_index):
    import ray.data

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    items = [
        {"query_id": 0, "query_text": "zephyr", "k": 5,
         "query_type": "bm25"},
        {"query_id": 1, "query_text": "zeph*", "k": 5,
         "query_type": "wildcard"},
        {"query_id": 2, "query_text": "zephr", "k": 5,
         "query_type": "fuzzy"},
        {"query_id": 3, "query_text": "index merge", "k": 5,
         "query_type": "phrase"},
    ]
    ds = ray.data.from_items(items)
    res = ds.map_batches(
        QueryEngine, fn_constructor_args=(idx,),
        fn_constructor_kwargs={"resolve": False, "preload": False},
        batch_size=4, batch_format="pyarrow", concurrency=1).take_all()
    by_q = {}
    for row in res:
        by_q.setdefault(row["query_id"], []).append(row["doc_id"])
    assert by_q[0] == r.topk("zephyr", 5)["doc_id"].to_pylist()
    assert by_q[1] == r.wildcard_topk("zeph*", 5)["doc_id"].to_pylist()
    assert by_q[2] == r.fuzzy_topk("zephr", 5)["doc_id"].to_pylist()
    assert by_q[3] == r.phrase_topk("index merge", 5)["doc_id"].to_pylist()


def test_similarity_models_rank_differently_but_sanely(reader):
    bm = reader.topk("index merge", 20)
    cl = reader.similarity_topk("index merge", 20, "classic")
    lm = reader.similarity_topk("index merge", 20, "lm_dirichlet")
    # same candidate universe (disjunction), model-specific order
    assert cl["total_hits"][0] == lm["total_hits"][0]
    for t in (cl, lm):
        sc = t["score"].to_numpy()
        assert (sc[:-1] >= sc[1:]).all()
        assert (sc >= 0).all()
    assert bm.num_rows == cl.num_rows == lm.num_rows


def test_similarity_jm_and_boolean(reader):
    lm = reader.similarity_topk("index merge", 20, "lm_dirichlet")
    jm = reader.similarity_topk("index merge", 20, "lm_jm")
    bo = reader.similarity_topk("index merge", 20, "boolean")
    # same candidate universe across models
    assert jm["total_hits"][0] == lm["total_hits"][0]
    assert bo["total_hits"][0] == lm["total_hits"][0]
    sc = jm["score"].to_numpy()
    assert (sc[:-1] >= sc[1:]).all() and (sc > 0).all()
    # boolean scores are exactly the matching-term counts (1 or 2
    # for a two-term query), tie-broken by ascending docID
    bsc = bo["score"].to_numpy()
    assert set(np.unique(bsc)) <= {1.0, 2.0}
    ids = bo["doc_id"].to_numpy()
    for v in np.unique(bsc):
        grp = ids[bsc == v]
        assert (np.diff(grp) > 0).all()


def test_similarity_unknown_raises(reader):
    import pytest as _pt

    with _pt.raises(ValueError):
        reader.similarity_topk("index", 5, "nope")


def test_span_first_recount(reader, smoke_corpus):
    """SpanFirst freq == brute recount of positions < end from raw
    tokens; scores follow the BM25(freq) formula."""
    import os

    import pyarrow.parquet as pq

    term, end = "index", 4
    res = reader.span_first_topk(term, end, k=100000)
    got = set(res["doc_id"].to_pylist())
    corpus, _ = smoke_corpus
    tabs = [pq.read_table(os.path.join(corpus, f))
            for f in sorted(os.listdir(corpus)) if f.endswith(".parquet")]
    rows = pa.concat_tables(tabs).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    expect = set()
    for d, text in enumerate(rows["text"].to_pylist()):
        if any(t == term and p < end
               for t, p in reader.analyzer.analyze_text(text)):
            expect.add(d)
    assert got == expect


def test_span_first_end_zero_empty(reader):
    assert reader.span_first_topk("index", 0, k=5).num_rows == 0


def test_multi_phrase_singleton_equals_phrase(reader):
    """MultiPhrase with singleton steps degenerates to PhraseQuery —
    identical docs AND identical float32 scores."""
    t1, t2 = reader.analyzer.query_terms("index merge")
    mp = reader.multi_phrase_topk([[t1], [t2]], k=50)
    ph = reader.phrase_topk("index merge", k=50)
    assert mp["doc_id"].to_pylist() == ph["doc_id"].to_pylist()
    assert mp["score"].to_pylist() == ph["score"].to_pylist()


def test_multi_phrase_superset_of_each_alternative(reader):
    """Docs matching "index (merge|sort)" == union of the two exact
    phrases; freq adds across alternatives."""
    t1, t2 = reader.analyzer.query_terms("index merge")
    (t3,) = reader.analyzer.query_terms("sort")
    mp = reader.multi_phrase_topk([[t1], [t2, t3]], k=100000)
    p1 = reader.phrase_topk("index merge", k=100000)
    p2 = reader.phrase_topk("index sort", k=100000)
    assert (set(mp["doc_id"].to_pylist())
            == set(p1["doc_id"].to_pylist())
            | set(p2["doc_id"].to_pylist()))


def test_term_automaton_single_path_equals_phrase(reader):
    """A one-path automaton degenerates to PhraseQuery — identical
    docs AND identical float32 scores."""
    t1, t2 = reader.analyzer.query_terms("index merge")
    ta = reader.term_automaton_topk([[t1, t2]], k=50)
    ph = reader.phrase_topk("index merge", k=50)
    assert ta["doc_id"].to_pylist() == ph["doc_id"].to_pylist()
    assert ta["score"].to_pylist() == ph["score"].to_pylist()


def test_term_automaton_optional_token_paths(reader):
    """"a (b)? c" matches the union of both explicit paths, freq sums
    path acceptances, and a path with a missing term contributes
    nothing (without poisoning the live paths)."""
    t1, t2 = reader.analyzer.query_terms("index merge")
    (t3,) = reader.analyzer.query_terms("sort")
    ta = reader.term_automaton_topk([[t1, t2], [t1, t3, t2]],
                                    k=100000)
    p1 = reader.phrase_topk("index merge", k=100000)
    docs3 = set()
    occ3 = reader.term_automaton_topk([[t1, t3, t2]], k=100000)
    docs3 = set(occ3["doc_id"].to_pylist())
    assert (set(ta["doc_id"].to_pylist())
            == set(p1["doc_id"].to_pylist()) | docs3)
    # a variant containing an unindexed term is dropped, not fatal
    ta2 = reader.term_automaton_topk(
        [[t1, t2], [t1, "zzzznotaterm", t2]], k=50)
    assert ta2["doc_id"].to_pylist() == p1.slice(0, 50)["doc_id"] \
        .to_pylist()


def test_term_range_matches_explicit_constant_score(reader):
    import bisect

    vocab = reader.vocabulary()
    lo, hi = "ma", "mo"
    terms = vocab[bisect.bisect_left(vocab, lo):bisect.bisect_left(vocab, hi)]
    assert terms, "smoke vocab should have terms in [ma, mo)"
    a = reader.term_range_topk(lo, hi, k=25)
    b = reader.constant_score_topk(terms, k=25)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert set(a["score"].to_pylist()) == {1.0}


def test_term_range_empty_range(reader):
    assert reader.term_range_topk("zzz", "zzzz", k=5).num_rows == 0


def test_explain_contributions_sum_to_score():
    """Per-term explain contributions (f64-summed then f32-cast, the
    engine's accumulation discipline) reproduce each top doc's score."""
    from engine.registry import BM25_QUERY, explain_topk_docs
    from engine.registry import cached_doc_index
    from engine.query import IndexReader

    sf = "/root/testdata/sf0.001"
    exp = explain_topk_docs(sf).to_pandas()
    r = IndexReader(cached_doc_index(sf, analyzed=False))
    top = r.bmw_topk(BM25_QUERY, 3).to_pandas()
    for _, row in top.iterrows():
        per = exp[exp["doc_id"] == row["doc_id"]]
        s = np.float32(sum(np.float64(c) for c in
                           sorted(per["contrib"].astype(np.float32))))
        assert s == np.float32(row["score"])


def test_span_not_recount(reader, smoke_corpus):
    """SpanNot survivors == brute recount: include positions with no
    exclude position within dist."""
    import glob

    import pyarrow.parquet as pq

    inc, exc, dist = "index", "merge", 2
    res = reader.span_not_topk(inc, exc, dist=dist, k=100000)
    got = set(res["doc_id"].to_pylist())
    corpus, _ = smoke_corpus
    tabs = [pq.read_table(f) for f in sorted(
        glob.glob(corpus + "/*.parquet"))]
    rows = pa.concat_tables(tabs).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    expect = set()
    for d, text in enumerate(rows["text"].to_pylist()):
        toks = reader.analyzer.analyze_text(text)
        a = [p for t, p in toks if t == inc]
        b = [p for t, p in toks if t == exc]
        if any(all(abs(p - q) > dist for q in b) for p in a):
            expect.add(d)
    assert got == expect


def test_span_not_missing_exclude_equals_term(reader):
    """Absent exclude term → SpanNot degenerates to the plain term
    scorer (same docs, same scores)."""
    a = reader.span_not_topk("index", "qqqzz", k=30)
    b = reader.brute_force_topk("index", 30)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_filter_clause_semantics(reader):
    """Occur.FILTER: constrains like MUST, contributes no score, and
    SHOULD becomes optional (score-0 docs match) when present."""
    vocab = sorted(reader.vocabulary())
    f, s0, s1 = vocab[0], vocab[1], vocab[2]
    filt = reader.boolean_topk(should=[s0, s1], filters=[f], k=10**9)
    must = reader.boolean_topk(must=[f], should=[s0, s1], k=10**9)
    # same candidate set (docs containing f), ordered differently
    assert set(filt["doc_id"].to_pylist()) == set(must["doc_id"].to_pylist())
    # filter contributes no score: filt score = must score - f's clause
    sc = dict(zip(must["doc_id"].to_pylist(),
                  must["score"].to_pylist()))
    only_f = reader.boolean_topk(must=[f], k=10**9)
    base = dict(zip(only_f["doc_id"].to_pylist(),
                    only_f["score"].to_pylist()))
    for d, v in zip(filt["doc_id"].to_pylist(),
                    filt["score"].to_pylist()):
        assert v == np.float32(np.float32(sc[d]) - np.float32(base[d])) \
            or abs(v - (sc[d] - base[d])) < 1e-5
    # docs matching the filter but zero SHOULD terms appear at score 0
    if len(filt) > len(reader.boolean_topk(
            must=[f], should=[s0, s1], min_should_match=1, k=10**9)):
        assert min(filt["score"].to_pylist()) == 0.0
    # pure filter, no should: all score 0, docID order
    pure = reader.boolean_topk(filters=[f], k=10**9)
    assert set(pure["score"].to_pylist()) <= {0.0}
    assert pure["doc_id"].to_pylist() == sorted(pure["doc_id"].to_pylist())


def test_osa_distance_transpositions():
    from engine.query import _levenshtein, _osa_distance

    assert _osa_distance("psark", "spark", 2) == 1
    assert _levenshtein("psark", "spark", 2) == 2
    assert _osa_distance("abc", "abc", 2) == 0
    assert _osa_distance("ab", "ba", 2) == 1
    # OSA: substrings can't be edited twice ("ca" -> "abc" is 3, not 2)
    assert _osa_distance("ca", "abc", 3) == 3
    assert _osa_distance("kitten", "sitting", 3) == 3
    # cap early-exit
    assert _osa_distance("aaaa", "zzzz", 1) == 2


def test_query_engine_dispatch_new_types(ray_session, smoke_index):
    """span_or / span_near_unordered / filter dispatch through the
    actor pool must equal the direct reader calls."""
    import ray
    import ray.data

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    vocab = sorted(r.vocabulary())
    a, b = vocab[0], vocab[1]
    qs = [
        {"query_id": 0, "query_text": f"{a} {b}", "k": 5,
         "query_type": "span_or"},
        {"query_id": 1, "query_text": f"{a} {b}", "k": 5,
         "query_type": "span_near_unordered"},
        {"query_id": 2, "query_text": a, "k": 5, "query_type": "filter"},
        {"query_id": 3, "query_text": "index merge sort", "k": 5,
         "query_type": "interval"},
        {"query_id": 4, "query_text": f"{a} {b}|index", "k": 5,
         "query_type": "terms_filter"},
        {"query_id": 5, "query_text": f"{a} {b}", "k": 5,
         "query_type": "common_terms"},
        {"query_id": 6, "query_text": f"{a} {b}", "k": 5,
         "query_type": "covering"},
        {"query_id": 7, "query_text": f"{a[:2]} {b}", "k": 5,
         "query_type": "span_multiterm"},
        {"query_id": 8, "query_text": f"classic | {a} {b}", "k": 5,
         "query_type": "similarity"},
    ]
    t = ray.data.from_items(qs).map_batches(
        QueryEngine, fn_constructor_args=(idx,),
        batch_format="pyarrow", concurrency=2) \
        .materialize().to_pandas()
    want = {
        0: r.span_or_topk([a, b], 5),
        1: r.span_near_unordered_topk(a, b, slop=2, k=5),
        2: r.boolean_topk(filters=[a], k=5),
        3: r.interval_topk("index", "merge", "sort", maxgaps=3, k=5),
        4: r.term_in_set_topk([a, b], ["index"], k=5),
        5: r.common_terms_topk([a, b], k=5),
        6: r.covering_topk([a, b], mod=3, k=5),
        7: r.span_near_or_topk([r.expand_prefix(a[:2]), [b]],
                               slop=3, k=5),
        8: r.similarity_topk(f"{a} {b}", k=5, similarity="classic"),
    }
    for qid, w in want.items():
        sub = t[t["query_id"] == qid].sort_values("rank")
        assert list(sub["doc_id"]) == w["doc_id"].to_pylist(), qid


def test_synonym_vs_span_or_vs_blended_semantics(reader):
    """SynonymQuery = summed tf under idf(max df); SpanOr = summed tf
    under SUMMED idf; BlendedTerm = dismax of per-clause scores all at
    the blended (max) df. Same candidate sets, distinct score laws."""
    vocab = sorted(reader.vocabulary())
    df_of = {}
    for t in vocab[:40]:
        s = reader.lookup([t])[t]
        if s:
            df_of[t] = len(reader._clause_arrays(t, s)[0])
    t0 = next(iter(df_of))
    t1 = next(t for t in df_of if df_of[t] != df_of[t0])
    terms = [t0, t1]
    syn = reader.synonym_topk(terms, k=2000)
    sor = reader.span_or_topk(terms, k=2000)
    bld = reader.blended_term_topk(terms, k=2000, tiebreak=0.0)
    assert (sorted(syn["doc_id"].to_pylist())
            == sorted(sor["doc_id"].to_pylist())
            == sorted(bld["doc_id"].to_pylist()))
    dfs = {t: df_of[t] for t in terms}
    assert dfs[terms[0]] != dfs[terms[1]]  # blending must matter
    smap = dict(zip(syn["doc_id"].to_pylist(), syn["score"].to_pylist()))
    omap = dict(zip(sor["doc_id"].to_pylist(), sor["score"].to_pylist()))
    # summed idf > max-df idf => every span_or score strictly larger
    assert all(omap[d] > smap[d] for d in smap)
    # rank order identical (same freq/norm, weight is a positive scalar)
    assert syn["doc_id"].to_pylist() == sor["doc_id"].to_pylist()
    # blended tiebreak=0 equals max single-clause score at blended df
    from engine.query import idf as _idf
    w = _idf(reader.N, max(dfs.values()))
    d0 = bld["doc_id"][0].as_py()
    per = []
    for t in terms:
        one = reader.blended_term_topk([t], k=2000, tiebreak=0.0)
        m = dict(zip(one["doc_id"].to_pylist(), one["score"].to_pylist()))
        if d0 in m:
            per.append(m[d0])
    assert bld["score"][0].as_py() == max(per)
    assert w > 0


def test_reversed_suffix_wildcard_equivalence(reader):
    """*suffix must produce the same result via the reversed-dictionary
    bisect fast path as via the regex-over-vocabulary scan."""
    import re

    vocab = reader.vocabulary()
    # pick a suffix that matches >1 term if possible
    from collections import Counter
    sufs = Counter(t[-2:] for t in vocab if len(t) >= 3)
    suf = sufs.most_common(1)[0][0]
    fast = reader.wildcard_topk("*" + suf, k=50)
    rx = re.compile(".*" + re.escape(suf))
    terms = [t for t in vocab if rx.fullmatch(t)]
    slow = reader.boolean_topk(should=terms, k=50)
    assert fast["doc_id"].to_pylist() == slow["doc_id"].to_pylist()
    assert fast["score"].to_pylist() == slow["score"].to_pylist()
    assert len(reader._expand_reversed_suffix(suf)) == len(terms)


def test_span_near_or_singleton_equals_span_near(reader):
    """Law: SpanNear over singleton SpanOr clauses is exactly
    SpanNearQuery — same candidates, same f32 scores (the combined
    weight reduces to the same ordered idf sum)."""
    vocab = sorted(reader.vocabulary())
    pairs = [(vocab[i], vocab[j])
             for i, j in [(0, 1), (2, 5), (1, 8)] if j < len(vocab)]
    for a, b in pairs:
        for slop in (0, 2):
            w1 = reader.span_near_topk([a, b], slop=slop, k=100)
            w2 = reader.span_near_or_topk([[a], [b]], slop=slop, k=100)
            assert w1["doc_id"].to_pylist() == w2["doc_id"].to_pylist()
            assert w1["score"].to_pylist() == w2["score"].to_pylist()


def test_covering_matches_python_reference(reader):
    """covering_topk vs a per-doc pure-Python recount of matching
    clauses and the 1 + doc_id % mod threshold."""
    import numpy as np

    vocab = sorted(reader.vocabulary())
    terms = vocab[:3]
    got = reader.covering_topk(terms, mod=3, k=10_000)
    # reference: per-term doc sets
    docsets = {}
    for t in terms:
        subs = reader.lookup([t])[t]
        docsets[t] = set(
            reader._clause_arrays(t, subs)[0].tolist()) if subs else set()
    alldocs = sorted(set().union(*docsets.values()))
    want = [d for d in alldocs
            if sum(d in s for s in docsets.values()) >= 1 + d % 3]
    assert sorted(got["doc_id"].to_pylist()) == want


def test_termfreq_table_and_deletes(ray_session, tmp_path):
    """termfreq() pseudo-field: (doc_id, tf) straight from postings;
    deleted docs are masked like every query path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_index, delete_docs
    from engine.query import IndexReader

    texts = ["fox fox jumps", "lazy dog", "fox", "dog fox fox fox"]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array(texts)}), src)
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2, batch_size=8)
    idx = str(tmp_path / "idx")
    build_index([src], idx, cfg)
    t = IndexReader(idx).termfreq_table("fox").to_pylist()
    assert t == [{"doc_id": 0, "tf": 2}, {"doc_id": 2, "tf": 1},
                 {"doc_id": 3, "tf": 3}]
    assert IndexReader(idx).termfreq_table("absent").to_pylist() == []
    delete_docs(idx, [2])
    t2 = IndexReader(idx).termfreq_table("fox").to_pylist()
    assert [r["doc_id"] for r in t2] == [0, 3]


def test_word_break_suggestions(ray_session, tmp_path):
    """WordBreakSpellChecker: ambiguous compound yields every valid
    split, ranked by df-sum then left half."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_index
    from engine.query import IndexReader

    # vocab dfs: ab=3, cd=2, abc=1, dx=1  -> "abcd" splits ab|cd (df 5)
    # and... abc|d (d too short, dropped). "abdx" -> ab|dx (df 4).
    texts = ["ab cd abc", "ab cd", "ab dx"]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(3), type=pa.int64()),
        "text": pa.array(texts)}), src)
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2, batch_size=8)
    idx = str(tmp_path / "idx")
    build_index([src], idx, cfg)
    r = IndexReader(idx)
    assert r.word_break("abcd").to_pylist() == [
        {"left": "ab", "right": "cd", "freq_sum": 5}]
    assert r.word_break("abdx").to_pylist() == [
        {"left": "ab", "right": "dx", "freq_sum": 4}]
    assert r.word_break("zzzz").num_rows == 0
    # multi-split ambiguity: "abab" -> ab|ab only (a too short)
    assert r.word_break("abab").to_pylist() == [
        {"left": "ab", "right": "ab", "freq_sum": 6}]


def test_explain_sums_to_topk_score(ray_session, smoke_index):
    """Explanation leaf contributions must sum (in f32) to the score
    topk reports for the same doc."""
    import numpy as np

    from engine.query import IndexReader

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    q = "zephyr quark"
    top = r.topk(q, k=3)
    if not top.num_rows:
        q = "the a"
        top = r.topk(q, k=3)
    doc = int(top["doc_id"][0].as_py())
    score = np.float32(top["score"][0].as_py())
    ex = r.explain(q, doc)
    total = np.float32(0.0)
    for c in ex["contrib"].to_pylist():
        total = np.float32(total + np.float32(c))
    assert total == score


def test_index_sorted_topk_early_termination(ray_session, tmp_path):
    """First-k-by-docID collection must be correct AND lazy: with one
    posting block holding 128 docs, collecting k=5 from a 600-doc
    posting list decodes only the first block per sub-list."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_index, delete_docs
    from engine.query import IndexReader

    n = 600
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(["common filler"] * n)}), src)
    cfg = IndexConfig(text_col="text", conv_cols=None,
                      doc_id_col="doc_id", stop_words=None,
                      stemming=False, n_buckets=2,
                      hot_df_threshold=10**9, batch_size=4096)
    idx = str(tmp_path / "idx")
    build_index([src], idx, cfg)
    r = IndexReader(idx)
    t = r.index_sorted_topk("common", k=5)
    assert t["doc_id"].to_pylist() == [0, 1, 2, 3, 4]
    decoded = int(t.schema.metadata[b"decoded_blocks"].decode())
    total_blocks = sum(s.n_blocks for s in r.lookup(["common"])["common"])
    assert decoded < total_blocks and decoded >= 1
    # deletes push the cut past the first block boundary correctly
    delete_docs(idx, list(range(0, 130)))
    r2 = IndexReader(idx)
    t2 = r2.index_sorted_topk("common", k=5)
    assert t2["doc_id"].to_pylist() == [130, 131, 132, 133, 134]


def test_fuzzy_blended_rewrite(reader):
    """TopTermsBlendedFreqScoringRewrite: exact-only expansion equals
    the plain term query bit-for-bit (boost 1, blended df = own df);
    with edits, every expansion scores under the blended max df and
    the max_expansions cut binds."""
    import numpy as np

    from engine.query import _levenshtein, idf

    t = reader.analyzer.query_terms("running")[0]   # dictionary form
    exact = reader.fuzzy_blended_topk(t, k=10, max_edits=0)
    plain = reader.brute_force_topk(t, 10)
    assert exact["doc_id"].to_pylist() == plain["doc_id"].to_pylist()
    assert exact["score"].to_pylist() == plain["score"].to_pylist()

    # expansions within ed<=2 on the smoke vocab
    cands = [v for v in reader.vocabulary()
             if _levenshtein(t, v, 2) <= 2]
    assert len(cands) >= 2, "smoke vocab must give >1 expansion"
    full = reader.fuzzy_blended_topk(t, k=1000, max_edits=2)
    cut = reader.fuzzy_blended_topk(t, k=1000, max_edits=2,
                                    max_expansions=1)
    # the cut keeps only the exact term (boost 1 ranks first), so the
    # blended df collapses to its own df: bit-identical to plain
    plain_full = reader.brute_force_topk(t, 1000)
    assert cut["doc_id"].to_pylist() == plain_full["doc_id"].to_pylist()
    assert cut["score"].to_pylist() == plain_full["score"].to_pylist()
    # blended df >= own df so the exact term's clause weight can only
    # shrink: full-expansion score of a doc matching only the exact
    # term is <= its plain term score
    dfs = {v: reader.global_df(reader.lookup([v])[v]) for v in cands}
    assert max(dfs.values()) >= dfs[t]
    if max(dfs.values()) > dfs[t]:
        pd = dict(zip(plain["doc_id"].to_pylist(),
                      plain["score"].to_pylist()))
        fd = dict(zip(full["doc_id"].to_pylist(),
                      full["score"].to_pylist()))
        others = set()
        for v in cands:
            if v != t:
                subs = reader.lookup([v])[v]
                others |= set(reader._clause_arrays(v, subs)[0].tolist())
        only_exact = [d for d in pd if d not in others]
        assert only_exact, "need a doc matching only the exact term"
        assert all(fd[d] <= pd[d] for d in only_exact if d in fd)


def test_fuzzy_prefix_length(reader):
    """prefixLength: candidates must share the literal prefix; edits
    measured on suffixes only. The prefix must actually exclude some
    ed-2 neighbor on the smoke vocab."""
    from engine.query import _levenshtein

    t = reader.analyzer.query_terms("running")[0]
    all_m = {v for v in reader.vocabulary() if _levenshtein(t, v, 2) <= 2}
    pre_m = {v for v in reader.vocabulary()
             if v.startswith(t[:1])
             and _levenshtein(t[1:], v[1:], 2) <= 2}
    full = reader.fuzzy_topk(t, k=10_000, max_edits=2)
    pref = reader.fuzzy_topk(t, k=10_000, max_edits=2, prefix_len=1)
    assert set(pref["doc_id"].to_pylist()) <= set(full["doc_id"].to_pylist())
    # expansion sets line up with the direct recount
    want = reader.boolean_topk(should=sorted(pre_m), k=10_000)
    assert pref.equals(want)
    if all_m - {v for v in all_m if v.startswith(t[:1])}:
        assert pre_m < all_m


def test_time_limited_partial_results(reader):
    """Block-budget timeAllowed: a binding budget truncates collection
    (partial=true, fewer/changed hits, total_hits lower bound); an
    unlimited budget reproduces the brute ranking exactly with
    partial=false."""
    q = "running connection index"
    full = reader.brute_force_topk(q, 50)
    unlim = reader.time_limited_topk(q, k=50, max_blocks=10_000)
    assert unlim["doc_id"].to_pylist() == full["doc_id"].to_pylist()
    assert unlim["score"].to_pylist() == full["score"].to_pylist()
    assert unlim["partial"][0].as_py() is False

    lim = reader.time_limited_topk(q, k=50, max_blocks=1)
    assert lim["partial"][0].as_py() is True
    assert lim["total_hits"][0].as_py() <= full["total_hits"][0].as_py()
    # every collected doc lies in some clause's first block
    subs = reader.lookup(reader.analyzer.query_terms(q))
    first_docs = set()
    for sl in subs.values():
        for s in sl:
            first_docs |= set(s.decode_block(0)[0].tolist())
    assert set(lim["doc_id"].to_pylist()) <= first_docs


def test_fuzzy_prefix_cap_and_keyword_repeat_guard(reader):
    """Review regressions: prefix_len > len(term) caps at the term
    length (no candidate chars escape the distance measure), and
    keyword_repeat's inner must be a pure rewrite."""
    from engine.analysis import Analyzer
    from engine.query import _levenshtein

    t = reader.analyzer.query_terms("running")[0]
    capped = reader.fuzzy_topk(t, k=10_000, max_edits=1,
                               prefix_len=len(t) + 5)
    # candidates must be true ed<=1 extensions of the full term
    want = {v for v in reader.vocabulary()
            if v.startswith(t) and _levenshtein("", v[len(t):], 1) <= 1}
    got_docs = set(capped["doc_id"].to_pylist())
    ref = reader.boolean_topk(should=sorted(want), k=10_000) \
        if want else None
    if ref is not None:
        assert got_docs == set(ref["doc_id"].to_pylist())

    a = Analyzer(stop_words=None, stemming=False, tokenizer="keyword",
                 filters=({"type": "keyword_repeat",
                           "inner": {"type": "trim"}},))
    import pyarrow as pa
    import pytest as _pt
    with _pt.raises(ValueError, match="pure rewrite"):
        a.analyze_flat(pa.array(["   "]))


def test_complex_phrase_matches_span_near_or(reader):
    """ComplexPhraseQueryParser rewrite ≡ hand-expanded SpanNear(SpanOr)."""
    import re as _re

    from engine.query import _levenshtein as _lev

    vocab = reader.vocabulary()
    g1 = sorted(t for t in vocab if t.startswith("ze"))
    g2 = sorted(t for t in vocab if _lev("quark", t, 1) <= 1)
    if g1 and g2:
        got = reader.complex_phrase_topk("ze* quark~1", slop=2, k=10)
        want = reader.span_near_or_topk([g1, g2], slop=2, k=10)
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
        assert got["score"].to_pylist() == want["score"].to_pylist()
    # literal positions analyze through the chain (stem/lowercase)
    lit = reader.complex_phrase_topk("ZE* Quark~1", slop=2, k=10)
    assert lit.num_rows == reader.complex_phrase_topk(
        "ze* quark~1", slop=2, k=10).num_rows


def test_complex_phrase_boundaries(reader):
    import pytest as _pt

    # a position whose expansion is empty matches nothing
    assert reader.complex_phrase_topk(
        "zzzzqqq* zephyr", slop=1, k=5).num_rows == 0
    # stopword literal contracts out; <2 surviving positions raises
    with _pt.raises(ValueError, match="surviving positions"):
        reader.complex_phrase_topk("the zephyr", slop=0, k=5)
    # ? wildcard expands single-char positions
    t = reader.complex_phrase_topk("z?phyr qu*", slop=3, k=5)
    assert t.column_names == ["rank", "doc_id", "score", "total_hits"]


def test_phrase_wildcard_degenerates_and_unions(ray_session, tmp_path):
    """PhraseWildcard composition: a single-expansion prefix must
    equal the exact PhraseQuery; a multi-expansion prefix must match
    the union of the per-alternative phrase matches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import IndexConfig, build_index
    from engine.query import IndexReader

    docs = ["merge sort fast", "merge stream now", "merge order by",
            "sort merge join", "merge sorted runs"]
    f = str(tmp_path / "pw.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs)}), f)
    idx = str(tmp_path / "pwidx")
    build_index([f], idx, IndexConfig(
        text_col="text", conv_cols=None, doc_id_col="doc_id",
        stop_words=None, stemming=False, n_buckets=2,
        hot_df_threshold=10**9, batch_size=16))
    r = IndexReader(idx)
    # single expansion: "order" is the only o* term
    alts = r.expand_prefix("o")
    assert alts == ["order"]
    a = r.multi_phrase_topk([["merge"], alts], k=10)
    b = r.phrase_topk("merge order", k=10)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    # multi expansion: s* = sort/sorted/stream (and 'sort merge' must
    # NOT match — order matters)
    alts = r.expand_prefix("s")
    assert set(alts) >= {"sort", "sorted", "stream"}
    m = r.multi_phrase_topk([["merge"], alts], k=10)
    assert set(m["doc_id"].to_pylist()) == {0, 1, 4}


def test_dictionary_prefilter_sublinear_touch(smoke_index):
    """Fuzzy/regex expansion must touch a SUBLINEAR slice of the term
    dictionary via the trigram postings (the automaton-intersection
    stand-in), while matching exactly what a full scan matches."""
    import re

    from engine.query import IndexReader, _levenshtein

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    vocab = r.vocabulary()
    nv = len(vocab)
    assert nv > 50

    # regex with a required literal: candidates ≪ vocabulary
    pat = next(t for t in vocab if len(t) >= 5)
    pattern = f".*{re.escape(pat[1:4])}.*"
    r.dict_terms_checked = 0
    out = r.regexp_topk(pattern, k=5)
    checked = r.dict_terms_checked
    rx = re.compile(pattern)
    full = [t for t in vocab if rx.fullmatch(t)]
    assert checked < nv, "prefilter never engaged"
    assert checked >= len(full)
    # candidates are a correct superset: same match behavior
    assert out.num_rows > 0

    # fuzzy: q-gram count filter engages for long terms
    long_t = max(vocab, key=len)
    if len(long_t) >= 6:
        r.dict_terms_checked = 0
        r.fuzzy_topk(long_t, k=5, max_edits=1)
        assert r.dict_terms_checked < nv
        want = [t for t in vocab
                if _levenshtein(long_t, t, 1) <= 1]
        cands = r._fuzzy_candidates(long_t, 1)
        assert set(want) <= set(cands), "q-gram filter lost a match"
