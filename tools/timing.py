"""Per-entry Ray-side wall-time at a given sf (no oracle) — finds the
slow tail worth optimizing. Usage: python tools/timing.py [--sf DIR]
[entry ...]; prints one line per entry sorted slowest-first.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 log_to_driver=False)
    from engine import registry

    qs = registry.queries()
    names = args.entries or sorted(qs)
    out = []
    for n in names:
        t0 = time.perf_counter()
        try:
            res = qs[n](args.sf)
            rows = res.num_rows if hasattr(res, "num_rows") else len(res)
            err = ""
        except Exception as e:          # noqa: BLE001
            rows, err = -1, f" ERROR {type(e).__name__}: {e}"
        out.append((time.perf_counter() - t0, n, rows, err))
        print(f"{out[-1][0]:8.2f}s {n} ({rows} rows){err}", flush=True)
    print("\n--- slowest first ---")
    for dt, n, rows, err in sorted(out, reverse=True)[:25]:
        print(f"{dt:8.2f}s {n}{err}")
    ray.shutdown()


if __name__ == "__main__":
    main()
