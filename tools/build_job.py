#!/usr/bin/env python
"""`ray job submit` driver for the index build (north-rule entry point).

On a real cluster:

    ray job submit --working-dir /root/repo -- \
        python tools/build_job.py --input /data/transcripts \
        --output /shared/index --n-buckets 64 --codec for

Standalone (local mode) it owns its Ray session. The build is
resumable: rerunning the same command skips finished input parts and
merged buckets via the manifest's per-partition lineage
(`engine/manifest.py`), so a preempted job just gets re-submitted.
Prints one JSON line of build metrics (tokens/sec + postings/sec,
per-phase wall) — the metrics feed the N vs 4N scaling comparison
recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="directory of Parquet transcript files")
    ap.add_argument("--output", required=True, help="index directory")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--conv-col", default="conv_id")
    ap.add_argument("--turn-col", default="turn_idx")
    ap.add_argument("--doc-id-col", default=None,
                    help="use this int64 column as docID (doc_id mode)")
    ap.add_argument("--n-buckets", type=int, default=8)
    ap.add_argument("--codec", default="vbyte", choices=["vbyte", "for"])
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--no-freqs", action="store_true",
                    help="IndexOptions.DOCS (implies --no-positions)")
    ap.add_argument("--no-analysis", action="store_true",
                    help="skip stopwords+stemming")
    ap.add_argument("--optimize", action="store_true",
                    help="forceMerge(1) after the build")
    args = ap.parse_args()

    import ray

    owns = not ray.is_initialized()
    if owns:  # job-submit / standalone: the job owns the session
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True)

    from engine.build import IndexConfig, build_index, optimize_index

    cfg = IndexConfig(
        text_col=args.text_col,
        conv_cols=(None if args.doc_id_col
                   else (args.conv_col, args.turn_col)),
        doc_id_col=args.doc_id_col,
        stop_words=None if args.no_analysis else
        IndexConfig().stop_words,
        stemming=not args.no_analysis,
        n_buckets=args.n_buckets,
        postings_codec=args.codec,
        store_positions=not (args.no_positions or args.no_freqs),
        store_freqs=not args.no_freqs,
    )
    inp: str | list[str] = args.input
    if inp.endswith(".parquet"):   # single file or glob result
        import glob as _glob
        inp = sorted(_glob.glob(inp)) or [inp]
    t0 = time.perf_counter()
    man = build_index(inp, args.output, cfg)
    build_sec = time.perf_counter() - t0
    opt_sec = None
    if args.optimize:
        t1 = time.perf_counter()
        optimize_index(args.output)
        opt_sec = time.perf_counter() - t1

    stats = man["stats"]
    out = {
        "status": man["status"],
        "build_sec": round(build_sec, 3),
        "optimize_sec": round(opt_sec, 3) if opt_sec else None,
        "n_docs": stats["N"],
        "n_terms": stats["n_terms"],
        "sum_cf_tokens": stats["sum_cf"],
        "tokens_per_sec": round(stats["sum_cf"] / build_sec, 1),
        "postings_per_sec": round(
            stats.get("n_postings", stats["sum_cf"]) / build_sec, 1),
        "phase_sec": stats.get("phase_sec"),
    }
    print(json.dumps(out))
    if owns:
        ray.shutdown()


if __name__ == "__main__":
    main()
