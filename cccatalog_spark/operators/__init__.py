from cccatalog_spark.operators.merge import (  # noqa: F401
    merge_overwrite,
    merge_upsert,
    replay_collapse,
)
