"""Index verification — the reference's CheckIndex analog.

Re-derives every stored invariant from the raw shard bytes (SURVEY.md
§2.4 row "CheckIndex"; upstream ``L/index/CheckIndex.java`` [U]):
per-row postings decode cleanly, docIDs strictly increase, the block
directory matches the decoded streams, block-max metadata is truly an
upper bound, salted sub-lists of a term cover disjoint doc ranges, and
global stats (sum_cf, n_terms) match the manifest. Run after every
end-to-end build in tests.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from engine import manifest as mf
from engine import trigram
from engine.build import IndexConfig, term_bucket
from engine.codec import BLOCK_SIZE, decode_positions, vbyte_decode
from engine.smallfloat import LENGTH_TABLE



def _row_decode(row, codec: str):
    """Decode one index row's (docs, tfs) under the manifest codec."""
    df = int(row["df"])
    if codec == "for":
        from engine.codec import for_decode_stream
        deltas = for_decode_stream(
            row["docs"], df, np.frombuffer(row["blk_doc_off"],
                                           dtype=np.int32))
        tfs = for_decode_stream(
            row["tfs"], df, np.frombuffer(row["blk_tf_off"],
                                          dtype=np.int32))
    else:
        deltas, _ = vbyte_decode(row["docs"], df, 0)
        tfs, _ = vbyte_decode(row["tfs"], df, 0)
    return np.cumsum(deltas), tfs


def check_index(index_dir: str) -> dict[str, int]:
    man = mf.load(index_dir)
    assert man is not None, "no manifest"
    assert man["status"] == "complete", f"status={man['status']}"
    cfg = IndexConfig.from_json(man["config"])
    codec = getattr(cfg, "postings_codec", "vbyte")
    N = int(man["stats"]["N"])
    max_doc = int(man["stats"].get("max_doc", N))

    dels = man.get("deletes")
    if dels and dels.get("n"):
        dd = pq.read_table(
            os.path.join(index_dir, dels["file"]))["doc_id"].to_numpy()
        assert len(dd) == dels["n"], "deletes count mismatch"
        assert (np.diff(dd) > 0).all(), "deletes not sorted unique"
        assert dd[0] >= 0 and dd[-1] < max_doc, "deleted docID out of range"

    # numeric-DV update generations (upstream CheckIndex docvalues
    # status): files exist, docIDs sorted unique and in range,
    # generation numbers strictly increase per field
    for field, gens in (man.get("dv_updates") or {}).items():
        last_gen = 0
        for g in gens:
            assert g["gen"] > last_gen, f"dv {field} gens not increasing"
            last_gen = g["gen"]
            t = pq.read_table(os.path.join(index_dir, g["file"]))
            dv = t["doc_id"].to_numpy()
            assert len(dv) == g["n"], f"dv {field} count mismatch"
            if len(dv):
                assert (np.diff(dv) > 0).all(), \
                    f"dv {field} docIDs not sorted unique"
                assert dv[0] >= 0 and dv[-1] < max_doc, \
                    f"dv {field} docID out of range"

    total_cf = 0
    terms_seen: set[str] = set()
    n_rows = 0
    for b in range(cfg.n_buckets):
        shard = os.path.join(mf.shard_root(index_dir, man), f"bucket={b}")
        if not os.path.isdir(shard):
            continue
        files = [os.path.join(shard, f) for f in sorted(os.listdir(shard))
                 if f.endswith(".parquet")]
        if not files:     # emptied by a tiny vocab or an exorcise
            continue
        tab = pq.read_table(files)
        by_term: dict[str, list[tuple[int, int]]] = {}
        for row in tab.to_pylist():
            n_rows += 1
            term = row["term"]
            assert term_bucket(term, cfg.n_buckets) == b, \
                f"term {term!r} in wrong bucket {b}"
            df = int(row["df"])
            assert df > 0
            docs, tfs = _row_decode(row, codec)
            norms = np.frombuffer(row["norms"], dtype=np.uint8)
            assert len(docs) == df and len(norms) == df
            assert (docs >= 0).all() and int(docs[-1]) < max_doc
            assert df == 1 or (docs[1:] > docs[:-1]).all(), \
                f"non-monotone docs for {term!r}"
            assert int(tfs.sum()) == int(row["cf"])
            assert (tfs >= 1).all()
            assert int(docs[0]) == int(row["min_doc"])
            total_cf += int(row["cf"])
            terms_seen.add(term)
            by_term.setdefault(term, []).append(docs)

            # block directory invariants
            blk_last = np.frombuffer(row["blk_last_doc"], dtype=np.int64)
            blk_max_tf = np.frombuffer(row["blk_max_tf"], dtype=np.int32)
            blk_min_norm = np.frombuffer(row["blk_min_norm"], dtype=np.uint8)
            nblocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
            assert len(blk_last) == nblocks
            for k in range(nblocks):
                s, e = k * BLOCK_SIZE, min((k + 1) * BLOCK_SIZE, df)
                assert int(blk_last[k]) == int(docs[e - 1])
                assert int(blk_max_tf[k]) == int(tfs[s:e].max())
                assert int(blk_min_norm[k]) == int(norms[s:e].min())
                # block-max bound: min norm decodes to the smallest length
                assert LENGTH_TABLE[blk_min_norm[k]] <= \
                    LENGTH_TABLE[norms[s:e]].min()

            if cfg.store_positions:
                per_posting = decode_positions(row["poss"], tfs)
                assert len(per_posting) == df
                for pl, tf in zip(per_posting, tfs):
                    assert len(pl) == int(tf)
                    assert (pl >= 0).all()
                    assert len(pl) == 1 or (pl[1:] > pl[:-1]).all()

        # salted sub-lists: disjoint doc SETS per term (intervals may
        # interleave — salt wraps part_id % n_salts by design)
        for term, doc_lists in by_term.items():
            if len(doc_lists) > 1:
                alld = np.concatenate(doc_lists)
                assert len(np.unique(alld)) == len(alld), \
                    f"duplicate doc across sub-lists for {term!r}"

    assert total_cf == int(man["stats"]["sum_cf"]), \
        f"sum_cf mismatch {total_cf} != {man['stats']['sum_cf']}"
    assert len(terms_seen) == int(man["stats"]["n_terms"])
    return {"n_terms": len(terms_seen), "n_rows": n_rows,
            "sum_cf": total_cf}


def dump_postings(index_dir: str) -> dict[str, tuple]:
    """term → (docs, tfs, norms) merged across sub-lists, doc-sorted.

    The *logical* index content — used by the randomized-partitioning
    equivalence tests: any build of the same corpus must dump
    identically regardless of file split / batch size / salting.
    """
    man = mf.load(index_dir)
    cfg = IndexConfig.from_json(man["config"])
    codec = getattr(cfg, "postings_codec", "vbyte")
    out: dict[str, list] = {}
    cols = ["term", "df", "docs", "tfs", "norms"]
    if codec == "for":
        cols += ["blk_doc_off", "blk_tf_off"]
    for b in range(cfg.n_buckets):
        shard = os.path.join(mf.shard_root(index_dir, man), f"bucket={b}")
        if not os.path.isdir(shard):
            continue
        for row in pq.read_table(shard, columns=cols).to_pylist():
            docs, tfs = _row_decode(row, codec)
            norms = np.frombuffer(row["norms"], dtype=np.uint8)
            out.setdefault(row["term"], []).append((docs, tfs, norms))
    merged = {}
    for term, parts in out.items():
        docs = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        norms = np.concatenate([p[2] for p in parts])
        order = np.argsort(docs, kind="stable")
        merged[term] = (docs[order], tfs[order], norms[order])
    return merged


def exorcise_index(index_dir: str) -> dict:
    """CheckIndex ``-exorcise`` analog (upstream ``CheckIndex.java``
    main with ``-exorcise`` [U]): quarantine shard files whose bytes
    no longer read/decode cleanly and rewrite the manifest so the
    SURVIVING index is self-consistent and serveable again.

    Conformance boundary (documented): upstream drops whole corrupt
    *segments*, losing their documents; here the repair unit is a
    bucket shard file — only the postings stored in that file are
    lost (terms whose postings lived solely there vanish from the
    dictionary; doc-level stats N/avgdl are untouched because the
    docmap and other buckets still hold the docs). Global n_terms /
    sum_cf are re-derived from the survivors and the manifest is
    atomically rewritten with an ``exorcised`` audit trail, so a
    subsequent :func:`check_index` passes.
    """
    man = mf.load(index_dir)
    assert man is not None, "no manifest"
    cfg = IndexConfig.from_json(man["config"])
    codec = getattr(cfg, "postings_codec", "vbyte")
    root = mf.shard_root(index_dir, man)
    quarantine = os.path.join(index_dir, "corrupt")
    dropped: list[str] = []

    def _valid(path: str) -> bool:
        try:
            tab = pq.read_table(path)
            for row in tab.to_pylist():
                df = int(row["df"])
                if df <= 0:
                    return False
                docs, tfs = _row_decode(row, codec)
                norms = np.frombuffer(row["norms"], dtype=np.uint8)
                if len(docs) != df or len(tfs) != df or len(norms) != df:
                    return False
                if df > 1 and not (docs[1:] > docs[:-1]).all():
                    return False
                if int(tfs.sum()) != int(row["cf"]):
                    return False
            return True
        except Exception:
            return False

    total_cf = 0
    terms_seen: set[str] = set()
    for b in range(cfg.n_buckets):
        shard = os.path.join(root, f"bucket={b}")
        if not os.path.isdir(shard):
            continue
        b_dropped = len(dropped)
        for fname in sorted(os.listdir(shard)):
            if not fname.endswith(".parquet"):
                continue         # sidecars are advisory, never postings
            fpath = os.path.join(shard, fname)
            if not _valid(fpath):
                os.makedirs(quarantine, exist_ok=True)
                os.replace(fpath, os.path.join(
                    quarantine, f"bucket{b}_{fname}"))
                dropped.append(f"bucket={b}/{fname}")
                continue
            t = pq.read_table(fpath, columns=["term", "cf"])
            total_cf += int(np.sum(t["cf"].to_numpy()))
            terms_seen.update(t["term"].to_pylist())
        if len(dropped) > b_dropped:
            # dictionary shrank: rebuild (or remove) the trigram
            # sidecar so readers never see stale term ordinals
            trigram.write_sidecar(shard)
        if not os.listdir(shard):
            # a fully-quarantined bucket: drop the empty dir so
            # readers (pyarrow dataset scans) skip it cleanly
            os.rmdir(shard)

    if dropped:
        man["stats"]["n_terms"] = len(terms_seen)
        man["stats"]["sum_cf"] = total_cf
        man.setdefault("exorcised", []).extend(dropped)
        mf.save(index_dir, man)
    return {"dropped": dropped, "n_terms": len(terms_seen),
            "sum_cf": total_cf}
