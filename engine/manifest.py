"""Index manifest: atomic commit point + per-partition build lineage.

Ray-native restatement of the reference's two-phase commit /
``segments_N`` generations (SURVEY.md §2.1 "Commit", §4
"Checkpoint/resume"; upstream ``L/index/SegmentInfos.java#commit`` [U]):
all shard/fragment Parquet files are immutable and the manifest JSON is
written last via write-temp+rename, so a reader (or a resumed build)
only ever sees a consistent published state.

Lineage model:
- ``parts``: one entry per input partition (file), written after its
  fragment shards land — resume skips ``status == "done"`` parts and
  re-cleans/reruns the rest (the reference's tlog-replay analog,
  ``S/update/UpdateLog.java`` [U]).
- ``buckets``: one entry per term-hash bucket after its merged index
  shard lands — the merge stage's checkpoint unit.
- ``status``: "building" until finalize writes "complete" plus global
  stats; query refuses incomplete manifests unless asked.
"""

from __future__ import annotations

import json
import os
from typing import Any

MANIFEST_NAME = "manifest.json"


def _atomic_write_json(path: str, obj: dict[str, Any]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load(index_dir: str) -> dict[str, Any] | None:
    path = os.path.join(index_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def save(index_dir: str, manifest: dict[str, Any]) -> None:
    _atomic_write_json(os.path.join(index_dir, MANIFEST_NAME), manifest)


def new_manifest(input_files: list[str], config: dict[str, Any]) -> dict[str, Any]:
    return {
        "format": "rayindex-v1",
        "status": "building",
        "config": config,
        "input_files": sorted(input_files),
        "parts": {},    # part_id (str) -> {"input_file", "status"}
        "buckets": {},  # bucket id (str) -> {"status", "n_terms", "sum_cf"}
        "stats": {},
    }


def shard_root(index_dir: str, manifest: dict[str, Any] | None) -> str:
    """Current index-shard generation directory.

    ``optimize_index`` publishes a new generation (``index-gN``) by
    writing it fully, then flipping ``index_dir_name`` here in ONE
    atomic manifest commit — readers never see a half-rewritten shard
    (the ``segments_N`` generation-pointer pattern)."""
    name = (manifest or {}).get("index_dir_name", "index")
    return os.path.join(index_dir, name)


def done_parts(manifest: dict[str, Any] | None) -> set[int]:
    if not manifest:
        return set()
    return {int(k) for k, v in manifest["parts"].items() if v.get("status") == "done"}


def done_buckets(manifest: dict[str, Any] | None) -> set[int]:
    if not manifest:
        return set()
    return {int(k) for k, v in manifest["buckets"].items() if v.get("status") == "done"}
