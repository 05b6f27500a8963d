"""Ray-Data-native full-text indexing + BM25 query engine.

A brand-new engine with the query/data-processing capabilities of the
reference (lucidworks/lucene-solr, Lucene/Solr 8.x line), re-expressed
Ray-Data-first: ``ray.data.Dataset`` pipelines, ``map_batches`` over
Arrow batches, actor pools for stateful stages, explicit hash shuffles
for the wide steps.  See SURVEY.md for the full blueprint and the
reference-parity citations.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` —
sessions are owned by the driver, ``bench.py`` and the test fixture.
"""

__version__ = "0.1.0"
