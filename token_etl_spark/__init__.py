"""token_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``minhtan4711/token-etl`` (a Scala/Spark
batch ETL pipeline for ERC-20 token-transfer analytics), extended with the
operators a large-scale (100 TB design point) training-data pipeline needs:
deduplication, similarity search, text analysis, and multimodal-column
plumbing.

Design stance (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst + AQE do the optimizing.
- Zero row-at-a-time Python UDFs in the core; Pandas UDFs only where
  built-ins genuinely cannot express the semantics.
- External lookup services (Coingecko REST, Web3 RPC in the reference)
  are modeled as broadcast-joined dimension tables.
- Deterministic everywhere: no wall-clock keys, no
  monotonically_increasing_id joins, sort_array around collect_list.
"""

__version__ = "0.1.0"
