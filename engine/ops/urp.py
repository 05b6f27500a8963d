"""Solr UpdateRequestProcessor chain — vectorized ingest mutations.

Upstream Solr runs every added document through an ordered chain of
UpdateRequestProcessors before indexing (``S/update/processor/*`` [U]:
``CloneFieldUpdateProcessorFactory``, ``RegexReplaceProcessorFactory``,
``TrimFieldUpdateProcessorFactory``, ``LowerCaseField...``,
``DefaultValueUpdateProcessorFactory``, ``TruncateField...``,
``FieldLengthUpdateProcessorFactory``,
``SignatureUpdateProcessorFactory``). The Ray-native restatement
compiles the chain ONCE into a single row-local batch function (all
pyarrow.compute kernels, no Python in the per-row path except the
md5 signature digest) and applies it as ONE fused ``map_batches`` —
an ingest chain must never cost a shuffle.

Spec format (one dict per processor, applied in order):

    {"type": "clone", "src": col, "dest": col}
    {"type": "regex_replace", "field": col, "pattern": p, "repl": r}
    {"type": "trim", "field": col}
    {"type": "lowercase", "field": col}
    {"type": "default_value", "field": col, "value": v}
    {"type": "truncate", "field": col, "max_len": n}
    {"type": "field_length", "src": col, "dest": col}
    {"type": "signature", "fields": [cols...], "dest": col}
    {"type": "uuid", "name_fields": [cols...], "dest": col}
    {"type": "timestamp", "dest": col, "now": iso_string}

UUID (``UUIDUpdateProcessorFactory`` [U]) upstream draws a RANDOM v4 —
useless under distributed retries; the restatement is NAME-BASED
(RFC 4122 layout, md5 of the '|'-joined name fields, version nibble 3,
variant bits 10xx; namespace omitted — single-schema corpus), so the
same doc always gets the same id across batches, retries and cluster
sizes. Timestamp (``TimestampUpdateProcessorFactory`` [U]) upstream
stamps wall-clock receipt time; the caller pins NOW (exactly like the
date-math op) so ingest is replayable.

Signature is the md5 hex digest of the '|'-joined field values (the
``SignatureUpdateProcessorFactory`` shape with a documented md5 in
place of Lookup3 — same dedup semantics, SQL-checkable). Truncation
slices code units; the synthetic corpora are ASCII so this equals
character slicing (documented conformance boundary).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _apply_one(batch: pa.Table, spec: dict) -> pa.Table:
    t = spec["type"]
    if t == "clone":
        col = batch[spec["src"]]
        return batch.append_column(spec["dest"], col)
    if t == "regex_replace":
        f = spec["field"]
        v = pc.replace_substring_regex(
            batch[f], pattern=spec["pattern"],
            replacement=spec["repl"])
        return batch.set_column(batch.schema.get_field_index(f), f, v)
    if t == "trim":
        f = spec["field"]
        v = pc.utf8_trim_whitespace(batch[f])
        return batch.set_column(batch.schema.get_field_index(f), f, v)
    if t == "lowercase":
        f = spec["field"]
        v = pc.utf8_lower(batch[f])
        return batch.set_column(batch.schema.get_field_index(f), f, v)
    if t == "default_value":
        f = spec["field"]
        v = pc.fill_null(batch[f], spec["value"])
        return batch.set_column(batch.schema.get_field_index(f), f, v)
    if t == "truncate":
        f = spec["field"]
        v = pc.utf8_slice_codeunits(batch[f], 0, spec["max_len"])
        return batch.set_column(batch.schema.get_field_index(f), f, v)
    if t == "field_length":
        v = pc.cast(pc.utf8_length(batch[spec["src"]]), pa.int64())
        return batch.append_column(spec["dest"], v)
    if t == "signature":
        joined = pc.binary_join_element_wise(
            *[batch[c].cast(pa.string()) for c in spec["fields"]], "|")
        sig = pa.array([hashlib.md5(s.encode()).hexdigest()
                        for s in joined.to_pylist()], type=pa.string())
        return batch.append_column(spec["dest"], sig)
    if t == "uuid":
        joined = pc.binary_join_element_wise(
            *[batch[c].cast(pa.string()) for c in spec["name_fields"]],
            "|")
        out = []
        for s in joined.to_pylist():
            h = hashlib.md5(s.encode()).hexdigest()
            var = format((int(h[16], 16) & 0x3) | 0x8, "x")
            out.append(f"{h[:8]}-{h[8:12]}-3{h[13:16]}-"
                       f"{var}{h[17:20]}-{h[20:32]}")
        return batch.append_column(spec["dest"],
                                   pa.array(out, type=pa.string()))
    if t == "timestamp":
        v = pa.array([spec["now"]] * batch.num_rows, type=pa.string())
        return batch.append_column(spec["dest"], v)
    raise ValueError(f"unknown processor type {t!r}")


def compile_chain(specs: list[dict]):
    """Compile a processor chain into one batch-level callable."""
    specs = [dict(s) for s in specs]

    def fn(batch: pa.Table) -> pa.Table:
        for s in specs:
            batch = _apply_one(batch, s)
        return batch
    return fn


def apply_chain(ds: ray.data.Dataset, specs: list[dict]
                ) -> ray.data.Dataset:
    """The whole chain as ONE fused row-local map_batches stage."""
    return ds.map_batches(compile_chain(specs), batch_format="pyarrow")
