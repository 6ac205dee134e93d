"""logging_spark — a PySpark-native log/telemetry analytics engine.

A from-scratch reimplementation of the query & data-processing
capabilities of the reference log collect-and-route control plane
(`/root/reference`, Go) as a batch **parse → enrich → route →
aggregate** pipeline over columnar tables (Parquet locally; Iceberg
on a real cluster) of multi-turn agent transcripts, plus the
training-data operators (dedup, similarity search, text analysis)
a 100 TB-scale corpus pipeline needs.

Design stance (SURVEY.md §7): pure DataFrame API, everything
Catalyst-optimizable; the only Python-side execution is Arrow-batched
pandas UDFs (parser, embedding kernels). No per-row Python anywhere.
"""

__version__ = "0.1.0"
