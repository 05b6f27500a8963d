"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB. Implementations live in ``engine/registry.py``; the flagship
pipeline is the full inverted-index build + block-max-WAND BM25 engine
(SURVEY.md §3.1-3.2).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# make `engine` importable regardless of the driver's cwd; Ray local
# workers inherit the driver's sys.path for deserialization
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)


def entry() -> Any:
    """Flagship on /root/testdata/sf0.001: build the analyzed inverted
    index over `documents`, then run BM25 top-k queries through the
    actor-pool query engine; returns the result table."""
    import ray.data

    from engine.query import QueryEngine
    from engine.registry import cached_doc_index

    sf_dir = "/root/testdata/sf0.001"
    idx = cached_doc_index(sf_dir, analyzed=True)
    queries = [
        {"query_id": 0, "query_text": "spark merge window", "k": 10},
        {"query_id": 1, "query_text": "the a of", "k": 10},
        {"query_id": 2, "query_text": "customer orders join", "k": 5},
        {"query_id": 3, "query_text": "scanning filtered sorting", "k": 10},
    ]
    ds = ray.data.from_items(queries)
    res = ds.map_batches(
        QueryEngine, fn_constructor_args=(idx,),
        fn_constructor_kwargs={"resolve": False},
        batch_format="pyarrow", concurrency=2)
    return res


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from engine import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible entry — 385 of
    386 as of r5 (splitmix64 HLL, the transcript flagship and its
    role/SFT siblings all gained full-replay oracles this round). The
    single rows-only holdout is ``tdigest_percentile_by_type``, whose
    centroid set is insertion-order-dependent by design (see its
    docstring)."""
    from engine import registry

    return registry.oracle_sql()
