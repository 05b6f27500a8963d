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

import pyarrow as pa

import ray.data


def _parse_solr_xml(row: dict) -> list[dict]:
    import xml.etree.ElementTree as ET

    root = ET.fromstring(bytes(row["bytes"]))
    out = []
    for doc in root.iter("doc"):
        rec: dict[str, object] = {}
        for f in doc.iter("field"):
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
    return out


def read_solr_xml(paths: str | list[str]) -> ray.data.Dataset:
    """Solr ``<add><doc>`` XML → Dataset, one parse task per file."""
    raw = ray.data.read_binary_files(paths)
    return raw.flat_map(_parse_solr_xml)


def solr_xml_to_table(paths: str | list[str]) -> pa.Table:
    """Small-file convenience: parse + materialize as one Arrow table."""
    ds = read_solr_xml(paths)
    import ray as _ray

    tabs = [t for t in _ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tabs, promote_options="default") \
        .combine_chunks() if tabs else pa.table({})


def nested_entity_import(root: ray.data.Dataset, child: ray.data.Dataset,
                         root_key: str, child_key: str,
                         child_aggs: list, transform=None,
                         num_partitions: int = 8) -> ray.data.Dataset:
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
    agg = child.groupby(child_key).aggregate(*child_aggs)
    joined = root.join(agg, join_type="inner",
                       num_partitions=num_partitions,
                       on=(root_key,), right_on=(child_key,))
    if transform is not None:
        joined = joined.map_batches(transform, batch_format="pyarrow")
    return joined
