"""End-to-end catalog pipelines — the reference's DAG graph as three
composable functions (SURVEY §3): a user of cc-archive/cccatalog runs
these instead of the Airflow DAG chain.

    provider APIs → bronze JSON records      (ingestion, out of scope)
    bronze → canonical rows                   ingest_provider_batch
    rows → canonical image table              load_and_merge
    image table → popularity view             refresh_image_view

Each stage is DataFrame→DataFrame; orchestration (cron, retries,
sensors) stays outside, holding zero compute logic (SURVEY §7.0).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cccatalog_spark.operators.merge import image_merge
from cccatalog_spark.operators.normalize import (
    ensure_ingestion_type,
    normalize_image_batch,
    split_rejected,
)
from cccatalog_spark.operators.popularity import build_popularity
from cccatalog_spark.operators.provider_specs import ProviderSpec, apply_spec


def ingest_provider_batch(
    records: DataFrame, spec: ProviderSpec
) -> tuple[DataFrame, DataFrame]:
    """Bronze JSON records → (clean canonical rows, rejected rows).

    Replaces one provider_api_scripts/<provider>.py + ImageStore pass
    (SURVEY §3.2 steps 2-4)."""
    raw = apply_spec(records, spec)
    raw = ensure_ingestion_type(raw, default="provider_api")
    return split_rejected(normalize_image_batch(raw))


def load_and_merge(
    target: DataFrame,
    clean_batch: DataFrame,
    *,
    now: Column | None = None,
) -> DataFrame:
    """Clean rows → merged canonical image table (SURVEY §3.2 steps
    5-6: intra-batch key dedup A5, then the J1 upsert with system
    columns). Write the result bucketed by IMAGE_KEY
    (sources/bucketed.write_bucketed) so the next merge co-locates."""
    from cccatalog_spark.schemas import IMAGE_KEY

    deduped = clean_batch.dropDuplicates(IMAGE_KEY)
    return image_merge(target, deduped, now=now)


def refresh_image_view(
    image: DataFrame,
    metrics: DataFrame,
    *,
    metric_field: str = "views",
) -> DataFrame:
    """image table + metrics dimension → image_view with
    ``standardized_popularity`` (SURVEY §3.3; util/popularity/sql.py).
    ``metrics``: (provider, metric, percentile) rows; the metric value
    is read from meta_data[metric]."""
    value = F.element_at(F.col("meta_data"), metric_field).cast("double")
    return build_popularity(image, metrics, "provider", value)
