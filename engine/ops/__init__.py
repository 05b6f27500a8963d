"""Breadth operators: the reference's search-side aggregations (SURVEY.md
§2.5), streaming-expression algebra (§2.6), dedup (§2.8), and the
large-scale training-data ops (text stats, near-dup, vector search).
"""
