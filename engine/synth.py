"""Deterministic synthetic transcript corpus + query set (FIXTURES.md F1/F2).

Seeded numpy generation only — no wall clock, no external data.  The
schema is the authoritative input shape (BASELINE.json ``input_hint``):
``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]``.  Text is drawn from a fixed vocabulary with
Zipf-ish frequencies and includes stopwords, Porter-stemmable families,
mixed case, punctuation, and exact-duplicate turns (for dedup tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["", "bash", "search", "editor"])

# Fixed vocabulary: stopwords, stemmable families, plain terms.
_STOP = ["the", "a", "of", "to", "and", "in", "is", "that", "it", "for"]
_FAMILIES = [
    "running", "runs", "run", "connection", "connected", "connecting",
    "connections", "index", "indexes", "indexing", "indexed", "query",
    "queries", "querying", "tokenize", "tokenized", "tokens", "merge",
    "merged", "merging", "score", "scoring", "scored",
]
_PLAIN = [
    "ray", "data", "lucene", "solr", "engine", "parquet", "arrow", "batch",
    "actor", "shard", "segment", "posting", "term", "block", "heap", "bm25",
    "wand", "delta", "vbyte", "norm", "stem", "stop", "python", "java",
    "error", "timeout", "retry", "cluster", "node", "driver", "worker",
    "shuffle", "partition", "checkpoint", "manifest", "commit", "flush",
    "buffer", "stream", "window", "join", "filter", "sort", "group",
    "aggregate", "sample", "unique", "facet", "rollup", "fetch", "daemon",
    "zebra", "quartz", "nimbus", "orchid", "falcon", "granite", "harbor",
    "juniper", "krypton", "lantern", "meadow", "nectar", "obsidian",
    "pagoda", "quiver", "raven", "sapphire", "tundra", "umbra", "vortex",
    "willow", "xenon", "yonder", "zephyr",
]
VOCAB = np.array(_STOP + _FAMILIES + _PLAIN)

# Long-tail vocabulary: deterministic hash-suffixed families appended
# after the head VOCAB so term-dictionary code paths (BMW skipping over
# many terms, merge width, vocab scans, salting selectivity) see a
# realistic ≥10^5-term dictionary (VERDICT.md r1 #1). Stems give the
# tail plausible prefix structure for wildcard/fuzzy expansion.
_TAIL_STEMS = ["log", "cfg", "tok", "buf", "sys", "net", "dat", "tmp",
               "usr", "var", "mod", "pkg", "lib", "env", "opt", "reg"]


def tail_vocab(n_tail: int) -> np.ndarray:
    stems = _TAIL_STEMS
    k = len(stems)
    return np.array(
        [f"{stems[i % k]}{i // k:05x}" for i in range(n_tail)], dtype=object)


def full_vocab(n_tail_vocab: int = 0) -> np.ndarray:
    if n_tail_vocab <= 0:
        return VOCAB
    return np.concatenate(
        [VOCAB.astype(object), tail_vocab(n_tail_vocab)])

_CASE_VARIANTS = {"running": "Running", "connection": "Connection",
                  "the": "The", "error": "ERROR", "ray": "Ray"}
_PUNCT = np.array(["", "", "", "", ".", ",", "!", "?", ":", ")"])


def make_transcripts(n_convs: int = 200, seed: int = 42,
                     n_tail_vocab: int = 0) -> pa.Table:
    """Generate a transcript table, sorted by (conv_id, turn_idx).

    ``n_tail_vocab`` appends that many deterministic long-tail terms to
    the head vocabulary (Zipf over the combined ranks), so bench
    corpora exercise a realistic term dictionary while the default (0)
    keeps the small fixed vocab the golden test fixtures pin."""
    rng = np.random.default_rng(seed)
    turns_per_conv = np.clip(
        rng.zipf(1.6, size=n_convs), 2, 40).astype(np.int64)
    n_turns = int(turns_per_conv.sum())

    conv_ids = np.repeat(
        np.array([f"conv{i:08d}" for i in range(n_convs)]), turns_per_conv)
    turn_idx = np.concatenate(
        [np.arange(t, dtype=np.int32) for t in turns_per_conv])
    roles = ROLES[rng.integers(0, len(ROLES), size=n_turns)]
    tools = TOOLS[rng.integers(0, len(TOOLS), size=n_turns)]

    # Zipf(1.1) ranks into the (head + optional long-tail) vocabulary
    vocab = full_vocab(n_tail_vocab)
    toks_per_turn = rng.integers(5, 201, size=n_turns)
    total_toks = int(toks_per_turn.sum())
    zipf_p = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    zipf_p /= zipf_p.sum()
    # inverse-CDF sampling (vectorized; rng.choice(p=...) is too slow
    # for the 100M+-token bench corpora)
    ranks = np.searchsorted(np.cumsum(zipf_p), rng.random(total_toks))
    words = vocab[ranks]

    # sprinkle case variants and punctuation (deterministic); text
    # assembly via Arrow kernels (C++) — the Python join loop was the
    # bottleneck for multi-million-turn bench corpora
    import pyarrow.compute as _pc

    flip = rng.random(total_toks)
    for orig, var in _CASE_VARIANTS.items():
        m = (words == orig) & (flip < 0.3)
        words[m] = var
    punct = _PUNCT[rng.integers(0, len(_PUNCT), size=total_toks)]
    words_pa = _pc.binary_join_element_wise(
        pa.array(words, type=pa.string()).cast(pa.large_string()),
        pa.array(punct, type=pa.string()).cast(pa.large_string()),
        pa.scalar("", type=pa.large_string()))

    if isinstance(words_pa, pa.ChunkedArray):
        words_pa = words_pa.combine_chunks()
    cuts = np.concatenate(([0], np.cumsum(toks_per_turn))).astype(np.int64)
    lists = pa.LargeListArray.from_arrays(pa.array(cuts), words_pa)
    texts = np.asarray(
        _pc.binary_join(lists, pa.scalar(" ", type=pa.large_string()))
        .to_pandas(), dtype=object)

    # exact duplicate turns: ~1% copy the text of an earlier turn
    n_dup = max(2, n_turns // 100)
    dst = rng.choice(n_turns, size=n_dup, replace=False)
    src = rng.integers(0, n_turns, size=n_dup)
    texts[dst] = texts[src]

    base = np.int64(1_700_000_000_000_000)  # fixed epoch µs
    incr = rng.integers(1_000_000, 60_000_000, size=n_turns).astype(np.int64)
    ts = base + np.cumsum(incr)

    return pa.table({
        "conv_id": pa.array(conv_ids, type=pa.string()),
        "turn_idx": pa.array(turn_idx, type=pa.int32()),
        "role": pa.array(roles, type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
        "tool": pa.array(tools, type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    })


def make_queries(seed: int = 42, n_tail_vocab: int = 0) -> list[dict]:
    """Reference query set (FIXTURES.md F2): mixes of hot/rare/stop/stemmed;
    with a long-tail vocab, adds tail-term and head+tail mixed queries."""
    rng = np.random.default_rng(seed + 1)
    queries: list[dict] = []

    def add(text: str, k: int = 10):
        queries.append({"query_id": len(queries), "query_text": text, "k": k})

    add("the")                    # stopword-only -> 0 hits
    add("of to and")              # stopword-only -> 0 hits
    add("running")                # hot stemmed term
    add("connection")
    add("zephyr")                 # rare term
    add("xenon yonder")           # two rare terms
    add("running connection index")
    add("Running CONNECTIONS")    # case + stem variants, same as above family
    add("error timeout retry")
    add("ray data engine", k=1)
    add("merge score query", k=100)
    add("the running of connection")  # stop + content mix
    add("bm25 wand block")
    add("nosuchterm")             # OOV -> 0 hits
    add("nosuchterm zephyr")      # OOV + rare
    for _ in range(15):           # random 1-5 term queries over the vocab
        n = int(rng.integers(1, 6))
        terms = VOCAB[rng.integers(0, len(VOCAB), size=n)]
        add(" ".join(terms), k=int(rng.choice([1, 10, 10, 100])))
    if n_tail_vocab > 0:
        tail = tail_vocab(n_tail_vocab)
        for _ in range(10):       # pure tail: rare-term dictionary hits
            n = int(rng.integers(1, 4))
            terms = tail[rng.integers(0, len(tail), size=n)]
            add(" ".join(terms), k=10)
        for _ in range(5):        # hot head + rare tail mixes (BMW skew)
            h = VOCAB[rng.integers(0, len(VOCAB), size=2)]
            t = tail[rng.integers(0, len(tail), size=2)]
            add(" ".join(np.concatenate([h, t])), k=10)
    return queries


def write_transcripts(path: str, n_convs: int = 200, seed: int = 42,
                      n_files: int = 1, n_tail_vocab: int = 0) -> int:
    """Write the corpus as 1..n parquet files; returns row count."""
    import os

    t = make_transcripts(n_convs, seed, n_tail_vocab=n_tail_vocab)
    os.makedirs(path, exist_ok=True)
    n = t.num_rows
    if n_files == 1:
        pq.write_table(t, os.path.join(path, "transcripts-00000.parquet"))
    else:
        # deterministic row-range split (input files arrive in any order)
        bounds = np.linspace(0, n, n_files + 1).astype(np.int64)
        for i in range(n_files):
            pq.write_table(t.slice(bounds[i], bounds[i + 1] - bounds[i]),
                           os.path.join(path, f"transcripts-{i:05d}.parquet"))
    return n
