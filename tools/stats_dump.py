"""Dump ray.data stage statistics (``ds.stats()``) for a
representative composed pipeline — the measure-don't-guess artifact:
read → vectorized filter/enrich → exact-dedup groupby → rollup.
Usage: python tools/stats_dump.py [--sf DIR]; prints the stats block
to stdout (redirect into BENCH/ to record)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32,
                 include_dashboard=False, logging_level="ERROR",
                 log_to_driver=False)
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from engine.ops import textstats as tx

    ds = ray.data.read_parquet(
        os.path.join(args.sf, "documents.parquet"),
        columns=["doc_id", "text", "lang"])

    def enrich(b: pa.Table) -> pa.Table:
        offs, _ = tx._flat_tokens(b["text"])
        n = np.diff(offs).astype(np.int64)
        b = b.append_column("n_tokens", pa.array(n, type=pa.int64()))
        return b.filter(pc.greater(pa.array(n), 5))

    out = (ds.map_batches(enrich, batch_format="pyarrow")
           .groupby("lang").sum("n_tokens"))
    mat = out.materialize()
    print(mat.stats())


if __name__ == "__main__":
    main()
