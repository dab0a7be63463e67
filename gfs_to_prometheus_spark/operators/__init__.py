"""Large-scale training-data-pipeline operators (first-class components
alongside the time-series engine): deduplication, similarity search,
text analysis, multimodal plumbing.

All hot paths are JVM-side Column expressions (codegen'd) or Arrow-batched
pandas UDFs — never per-row Python. Cross-engine determinism rules follow
queries.py: hashes via md5 (identical in Spark and DuckDB), sums via
scaled int64, fixed-formula double arithmetic.
"""
