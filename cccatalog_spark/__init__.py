"""cccatalog_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of cc-archive/cccatalog (reference at
/root/reference), re-expressed Spark-first.

Layers (see SURVEY.md §7.0):

- ``schemas``   — pinned StructTypes for every table/row shape.
- ``functions`` — pure column-expression library (sanitizers, license
  resolution, JSON merge, popularity math, text analysis).
- ``sources``   — scans/sinks (parquet, TSV with ``\\N`` nulls +
  malformed-row quarantine, WAT archive scan).
- ``operators`` — DataFrame→DataFrame transforms (keyed upsert/merge,
  dedup family, similarity search, popularity pipeline, sub-provider
  joins, expiration).
- ``plans``     — named end-to-end queries over the driver's synthetic
  tables; exported through ``__spark_entry__``.
- ``streaming`` — micro-batch loader (file source + foreachBatch merge).

Everything is declarative DataFrame/SQL so Catalyst plans it; Python UDFs
appear only where semantics genuinely require them (Arrow-batched).
"""

__version__ = "0.1.0"
