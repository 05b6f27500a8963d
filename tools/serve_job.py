#!/usr/bin/env python
"""`ray job submit` driver for the SHARDED SERVING layer.

The query-side counterpart of ``tools/build_job.py`` (upstream analog:
starting a SolrCloud collection's shard replicas + coordinator
``SearchHandler`` [U]). Two subcommands:

``shard``  — split a Parquet corpus into K doc-range shard indexes
             (one ``build_index`` per slice; each is resumable via its
             own manifest), or K routed shards with ``--route-col``
             (compositeId: all docs sharing a key co-locate):

    ray job submit --working-dir /root/repo -- \
        python tools/serve_job.py shard --input /data/docs \
        --output /shared/cluster --n-shards 16 --stored-fields

``query``  — spin up one ``ShardSearcher`` actor per shard dir (on a
             real cluster: one per node via placement groups), run a
             query file (one query per line) through the two-phase
             global-IDF protocol, print one JSON line of latency
             metrics:

    ray job submit --working-dir /root/repo -- \
        python tools/serve_job.py query --cluster /shared/cluster \
        --queries /data/queries.txt --k 10 --mode topk

Modes map to the coordinator protocols: ``topk`` (BMW-merged search),
``fetch`` (two-phase with stored-field return), ``cursor`` (cursorMark
walk of ``--pages`` pages), ``facet`` (facet.limit refinement on
``--facet-col``). Every mode is exact (see ``engine/sharded.py``).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True)


def _input_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(os.path.join(path, f) for f in os.listdir(path)
                  if f.endswith(".parquet"))


def cmd_shard(args: argparse.Namespace) -> dict:
    import pyarrow.parquet as pq

    from engine.build import (IndexConfig, build_index,
                              build_stored_fields)

    _init_ray()
    files = _input_files(args.input)
    os.makedirs(args.output, exist_ok=True)
    cfg = IndexConfig(
        text_col=args.text_col, conv_cols=None,
        doc_id_col=args.doc_id_col, stop_words=None,
        stemming=not args.no_analysis, n_buckets=args.n_buckets,
        batch_size=args.batch_size)
    t0 = time.perf_counter()
    if args.route_col:
        from engine.sharded import route_corpus

        parts_dir = os.path.join(args.output, "parts")
        # route fresh: route_corpus appends part files, so a resumed
        # run over an existing parts dir would duplicate every row
        if os.path.isdir(parts_dir):
            shutil.rmtree(parts_dir)
        dirs = route_corpus(files, parts_dir,
                            args.route_col, args.n_shards)
        shard_inputs = [
            sorted(os.path.join(d, f) for f in os.listdir(d)
                   if f.endswith(".parquet")) for d in dirs]
    elif len(files) >= args.n_shards:
        # doc-range slicing: whole FILES round-robin per shard — no
        # data movement at all, each shard builds from its own files
        shard_inputs = [files[i::args.n_shards]
                        for i in range(args.n_shards)]
    else:
        # fewer files than shards (e.g. one consolidated Parquet):
        # split by row ranges into per-shard part files once
        import pyarrow.parquet as _pq

        tab = _pq.read_table(files)
        n = tab.num_rows
        cuts = [n * i // args.n_shards
                for i in range(args.n_shards + 1)]
        shard_inputs = []
        for i in range(args.n_shards):
            pf = os.path.join(args.output, f"part{i}.parquet")
            if not os.path.exists(pf):
                tmp = pf + ".tmp"
                _pq.write_table(
                    tab.slice(cuts[i], cuts[i + 1] - cuts[i]), tmp)
                os.replace(tmp, pf)
            shard_inputs.append([pf])
    shard_dirs, n_docs = [], 0
    for i, inp in enumerate(shard_inputs):
        sd = os.path.join(args.output, f"shard{i}")
        if inp:
            build_index(inp, sd, cfg)
            if args.stored_fields:
                build_stored_fields(sd)
            n_docs += sum(pq.read_metadata(f).num_rows for f in inp)
            shard_dirs.append(sd)
    manifest = {"shards": shard_dirs, "n_docs": n_docs,
                "route_col": args.route_col}
    mpath = os.path.join(args.output, "cluster.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)
    return {"metric": "shard build", "n_shards": len(shard_dirs),
            "n_docs": n_docs,
            "wall_sec": round(time.perf_counter() - t0, 3)}


def cmd_query(args: argparse.Namespace) -> dict:
    import numpy as np

    from engine.sharded import DistributedSearcher

    _init_ray()
    with open(os.path.join(args.cluster, "cluster.json")) as f:
        shards = json.load(f)["shards"]
    qs = [q.strip() for q in open(args.queries) if q.strip()]
    if not qs:
        return {"metric": f"sharded {args.mode}", "n_queries": 0,
                "result_rows": 0, "p50_ms": 0.0, "p95_ms": 0.0,
                "qps": 0.0}
    pages = max(1, args.pages)
    searcher = DistributedSearcher(shards)
    lat, rows = [], 0
    try:
        for q in qs:
            t0 = time.perf_counter()
            if args.mode == "topk":
                t = searcher.topk(q, args.k)
            elif args.mode == "fetch":
                t = searcher.topk_fetch(q, args.k)
            elif args.mode == "facet":
                t = searcher.facet_topk(q, args.facet_col, k=args.k)
            else:                                         # cursor
                cur, t = None, None
                for _ in range(pages):
                    t, cur = searcher.cursor_page(q, args.k, cur)
                    if cur is None:
                        break
            lat.append(time.perf_counter() - t0)
            rows += t.num_rows
    finally:
        searcher.shutdown()
    lat_ms = np.array(lat) * 1e3
    return {"metric": f"sharded {args.mode}", "n_queries": len(qs),
            "result_rows": rows,
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
            "p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
            "qps": round(len(qs) / max(sum(lat), 1e-9), 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    sh = sub.add_parser("shard")
    sh.add_argument("--input", required=True)
    sh.add_argument("--output", required=True)
    sh.add_argument("--n-shards", type=int, default=4)
    sh.add_argument("--text-col", default="text")
    sh.add_argument("--doc-id-col", default="doc_id")
    sh.add_argument("--route-col", default=None,
                    help="compositeId routing column (else doc-range)")
    sh.add_argument("--n-buckets", type=int, default=8)
    sh.add_argument("--batch-size", type=int, default=2048)
    sh.add_argument("--no-analysis", action="store_true")
    sh.add_argument("--stored-fields", action="store_true")
    qu = sub.add_parser("query")
    qu.add_argument("--cluster", required=True)
    qu.add_argument("--queries", required=True,
                    help="text file, one query per line")
    qu.add_argument("--k", type=int, default=10)
    qu.add_argument("--mode", default="topk",
                    choices=["topk", "fetch", "cursor", "facet"])
    qu.add_argument("--pages", type=int, default=3)
    qu.add_argument("--facet-col", default="source")
    args = ap.parse_args()
    out = cmd_shard(args) if args.cmd == "shard" else cmd_query(args)
    print(json.dumps(out))

    import ray
    ray.shutdown()


if __name__ == "__main__":
    main()
