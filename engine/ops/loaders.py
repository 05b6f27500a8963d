"""Ingest loaders beyond Ray's built-in readers.

JSON/CSV/Parquet ingest IS ``ray.data.read_json/read_csv/read_parquet``
(upstream ``S/handler/loader/JsonLoader.java``/``CSVLoader.java`` [U]);
this module adds the Solr XML update format (upstream
``S/handler/loader/XMLLoader.java`` [U]) which Ray has no reader for:

    <add>
      <doc><field name="id">1</field><field name="text">...</field></doc>
      ...
    </add>

Files are the parallel unit: ``read_binary_files`` streams each file to
a task that parses it with the stdlib ElementTree (documents are the
rows; multi-valued fields join into one value list like Solr's
multiValued). Schema is inferred from the union of field names with
string values — the loader is an ingest adapter, typed casting is the
caller's ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _walk_docs(el, out: list[dict]) -> None:
    """Collect ``<doc>`` records. Only DIRECT ``<field>`` children
    belong to a doc — a nested ``<doc>`` (Solr nested/child document)
    is its own record, not extra multiValued fields of the parent —
    so recursion descends through non-field children only."""
    if el.tag == "doc":
        rec: dict[str, object] = {}
        for f in el.findall("field"):
            name = f.attrib["name"]
            val = f.text or ""
            if name in rec:                # multiValued → list
                prev = rec[name]
                rec[name] = (prev if isinstance(prev, list)
                             else [prev]) + [val]
            else:
                rec[name] = val
        if rec:
            out.append(rec)
    for child in el:
        if child.tag != "field":
            _walk_docs(child, out)


def _parse_solr_xml(row: dict) -> list[dict]:
    import xml.etree.ElementTree as ET

    root = ET.fromstring(bytes(row["bytes"]))
    out: list[dict] = []
    _walk_docs(root, out)
    # a field that is multiValued in ANY doc of this file must be a
    # list in EVERY doc that carries it: Arrow cannot type a column
    # mixing str and list<str> (files are the parse unit; fields
    # should be consistently single- or multi-valued ACROSS files)
    multi = {k for rec in out
             for k, v in rec.items() if isinstance(v, list)}
    if multi:
        for rec in out:
            for k in multi:
                v = rec.get(k)
                if v is not None and not isinstance(v, list):
                    rec[k] = [v]
    return out


def read_solr_xml(paths: str | list[str]) -> ray.data.Dataset:
    """Solr ``<add><doc>`` XML → Dataset, one parse task per file."""
    raw = ray.data.read_binary_files(paths)
    return raw.flat_map(_parse_solr_xml)


def solr_xml_to_table(paths: str | list[str]) -> pa.Table:
    """Small-file convenience: parse + materialize as one Arrow table."""
    ds = read_solr_xml(paths)
    import ray as _ray

    tabs = [t for t in _ray.get(ds.materialize().to_arrow_refs())
            if t.num_rows]   # parse tasks must not run twice
    return pa.concat_tables(tabs, promote_options="default") \
        .combine_chunks() if tabs else pa.table({})


def nested_entity_import(root: ray.data.Dataset, child: ray.data.Dataset,
                         root_key: str, child_key: str,
                         child_aggs: list, transform=None,
                         num_partitions: int = 8,
                         cached: bool = False) -> ray.data.Dataset:
    """Data Import Handler entity + nested child entity (upstream
    ``S/handler/dataimport/DataImportHandler.java``,
    ``SqlEntityProcessor`` with a sub-entity [U]): the root entity's
    rows become documents, the child entity is aggregated per root key
    (DIH's per-parent nested SELECT, expressed as ONE grouped
    aggregation instead of upstream's N+1 per-row queries), and the
    two join on the root key — a distributed hash join, both sides
    shuffled once. ``transform`` is the Transformer chain analog
    (Template/RegexTransformer): a vectorized Arrow-batch callable
    applied after the join.
    """
    if cached:
        # CachedSqlEntityProcessor mode (upstream
        # ``dataimport/CachedSqlEntityProcessor`` caches the whole
        # sub-entity result in memory keyed by the join field [U]):
        # the aggregated child is key-column-sized, so (a) the child
        # aggregation runs as per-batch Arrow COMBINER partials + one
        # key-sized Arrow merge — no Ray groupby shuffle (Ray's
        # multi-aggregate groupby costs ~12s where this costs ~1s at
        # sf0.1) — and (b) the result is broadcast once via
        # ``ray.put`` and probed per root batch with a searchsorted
        # gather. Use only when the aggregated child fits worker
        # memory, exactly the upstream cache's constraint; the
        # default path keeps the both-sides-shuffled hash join.
        # child_aggs here: [(col_or_None, fn, out_name)] with fn in
        # {sum, count_all, min, max}.
        def part(b: pa.Table) -> pa.Table:
            return b.group_by(child_key).aggregate(
                [((c if c else []), f) for c, f, _ in child_aggs])

        tabs = [t for t in ray.get(
            child.map_batches(part, batch_format="pyarrow")
            .materialize().to_arrow_refs()) if t.num_rows]
        merged = pa.concat_tables(tabs).combine_chunks()
        merge_aggs, names = [], [child_key]
        for c, f, out in child_aggs:
            col = f"{c}_{f}" if c else "count_all"
            merge_aggs.append((col, "sum" if f in ("sum", "count_all")
                               else f))
            names.append(out)
        small = merged.group_by(child_key).aggregate(merge_aggs)
        small = small.rename_columns([child_key] + names[1:]) \
            .sort_by(child_key)
        ref = ray.put(small)

        def probe(b: pa.Table) -> pa.Table:
            s = ray.get(ref)
            keys = s[child_key].to_numpy()
            d = b[root_key].to_numpy()
            if not len(keys):
                return b.slice(0, 0)
            pos = np.minimum(np.searchsorted(keys, d), len(keys) - 1)
            hit = keys[pos] == d
            out = b.filter(pa.array(hit))
            take = pa.array(pos[hit])
            for name in s.column_names:
                if name != child_key:
                    out = out.append_column(name, s[name].take(take))
            return out

        joined = root.map_batches(probe, batch_format="pyarrow")
    else:
        # default path: the DIH sub-entity aggregation as a Ray
        # groupby shuffle, then a distributed hash join with the root
        # entity — for children too large for the broadcast cache
        from ray.data.aggregate import Count, Max, Min, Sum

        _mk = {"count_all": lambda c, out: Count(alias_name=out),
               "sum": lambda c, out: Sum(c, alias_name=out),
               "min": lambda c, out: Min(c, alias_name=out),
               "max": lambda c, out: Max(c, alias_name=out)}
        aggs = []
        for c, f, out in child_aggs:
            if f not in _mk:
                raise ValueError(f"unsupported child agg {f!r}")
            aggs.append(_mk[f](c, out))
        agg = child.groupby(child_key).aggregate(*aggs)
        joined = root.join(agg, join_type="inner",
                           num_partitions=num_partitions,
                           on=(root_key,), right_on=(child_key,))
    if transform is not None:
        joined = joined.map_batches(transform, batch_format="pyarrow")
    return joined
