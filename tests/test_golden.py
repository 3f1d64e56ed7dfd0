"""Golden-output corpus tests — the reference's strongest test idea
(SURVEY §5: committed expected end-to-end TSVs under
tests/resources/example_output/*.tsv), replayed against our engine.

The committed inputs exercise the full ImageStore rule set in one pass
(sanitize F1, limits F2, int/bool coercion F3/F4, license
canonicalization F9, meta_data license_url enrichment, tag blacklist +
struct enrichment P10/F24, source defaulting F25, required-row
rejection P6/P7) and the J1 merge semantics (newest-non-null scalars,
right-biased null-stripped meta merge, tag distinct union, insert of
unmatched rows). Any behavior drift in those rules changes the wire
bytes and fails the exact-line comparison here.
"""

from __future__ import annotations

import glob
import os

from cccatalog_spark.operators.merge import merge_upsert
from cccatalog_spark.operators.normalize import (
    ensure_ingestion_type,
    normalize_image_batch,
    serialize_image_tsv,
    split_rejected,
)
from cccatalog_spark.schemas import IMAGE_KEY
from cccatalog_spark.sources.tsv import read_tsv, split_quarantine, write_tsv

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _golden_lines(name: str) -> list[str]:
    with open(os.path.join(GOLDEN, name), encoding="utf-8") as f:
        return sorted(f.read().splitlines())


def _written_lines(df, tmp_path, name: str) -> list[str]:
    out = str(tmp_path / name)
    write_tsv(df.coalesce(1), out)
    lines: list[str] = []
    for part in glob.glob(os.path.join(out, "part-*.csv")):
        with open(part, encoding="utf-8") as f:
            lines.extend(f.read().splitlines())
    return sorted(lines)


def _normalized_batch(spark, name: str):
    clean, bad = split_quarantine(
        read_tsv(spark, os.path.join(GOLDEN, name))
    )
    assert bad.count() == 0
    return split_rejected(normalize_image_batch(clean))


def test_normalize_golden(spark, tmp_path):
    good, rejected = _normalized_batch(spark, "image_batch_input.tsv")
    # the two adversarial rows (null url; unknown license -> null) drop
    assert sorted(
        r.foreign_identifier for r in rejected.collect()
    ) == ["fid_badlic", "fid_nourl"]
    produced = _written_lines(
        serialize_image_tsv(ensure_ingestion_type(good)),
        tmp_path,
        "normalized",
    )
    assert produced == _golden_lines("image_batch_expected.tsv")


def test_merge_golden(spark, tmp_path):
    b1, _ = _normalized_batch(spark, "image_batch_input.tsv")
    b2, _ = _normalized_batch(spark, "image_batch2_input.tsv")
    merged = merge_upsert(b1, b2, IMAGE_KEY)
    produced = _written_lines(
        serialize_image_tsv(merged), tmp_path, "merged"
    )
    assert produced == _golden_lines("image_merged_expected.tsv")


def test_normalized_golden_rereads_clean(spark):
    """The committed expected file is itself valid wire format: it
    re-reads with zero quarantined rows and null round-trip intact."""
    clean, bad = split_quarantine(
        read_tsv(spark, os.path.join(GOLDEN, "image_batch_expected.tsv"))
    )
    assert bad.count() == 0
    rows = {r.foreign_identifier: r for r in clean.collect()}
    assert rows["fid_coerce"].thumbnail is None  # \N -> null
    assert rows["fid_clean"].width == "640"  # raw wire is all-string
