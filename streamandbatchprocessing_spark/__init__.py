"""streamandbatchprocessing_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capability surface of the reference system
``lucy-04/StreamAndBatchProcessing`` (a Spark/Scala streaming+batch
analytics service; see /root/repo/SURVEY.md), re-expressed idiomatically
in PySpark and extended with the operator surface a large-scale
training-data pipeline needs (joins over a star schema, dedup,
similarity search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7): declare logical plans with the DataFrame /
SQL API and let Catalyst + Tungsten choose physical strategies; Python
UDFs only where built-ins cannot express the semantics, and then always
Arrow-batched (pandas_udf / mapInPandas), never row-at-a-time.

Layout:
    session       SparkSession factory (AQE, FAIR scheduler, Arrow, Delta-if-present)
    schemas       canonical event schema + Kafka JSON parsing
    sources/      batch + streaming source/sink builders
    operators/    analysis library, joins, dedup, similarity, text ops
    functions/    reusable Column-level function builders (hashing, vectors, text)
    plans/        plan-inspection helpers (pushdown/broadcast assertions)
    streaming/    structured-streaming pipelines (watermark, windows, triggers)
    queries/      the registered correctness-query inventory + DuckDB oracles
    service/      batch-job registry/runner + REST façade (reference §2.9 parity)
"""

__version__ = "0.1.0"
