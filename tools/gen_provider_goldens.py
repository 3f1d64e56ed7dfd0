"""Generate the per-provider golden TSVs (tests/golden/providers/):
each provider's representative records through apply_spec → normalize
→ serialize, committed as the byte-exact wire expectation — the
engine-side analog of the reference's per-provider
tests/resources/example_output/*.tsv corpus.

Usage: python tools/gen_provider_goldens.py  (re-run only when a spec
or the normalize pipeline intentionally changes behavior; the diff of
the golden files IS the behavior-change review artifact)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

OUT_DIR = os.path.join("tests", "golden", "providers")


def tsv_lines(spark, provider: str, records: list[dict]) -> list[str]:
    from cccatalog_spark.operators.normalize import (
        normalize_image_batch,
        serialize_image_tsv,
        split_rejected,
    )
    from cccatalog_spark.operators.provider_specs import apply_spec
    from cccatalog_spark.operators.provider_specs_ext import (
        all_provider_specs,
    )
    from cccatalog_spark.sources.tsv import write_tsv

    spec = all_provider_specs()[provider]
    df = spark.createDataFrame(
        [(json.dumps(r),) for r in records], "json string"
    )
    good, _bad = split_rejected(normalize_image_batch(apply_spec(df, spec)))
    tmp = tempfile.mkdtemp(prefix=f"golden-{provider}-")
    try:
        out = os.path.join(tmp, "tsv")
        write_tsv(serialize_image_tsv(good).coalesce(1), out)
        lines: list[str] = []
        for part in glob.glob(os.path.join(out, "part-*.csv")):
            with open(part, encoding="utf-8") as f:
                lines.extend(f.read().splitlines())
        return sorted(lines)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    from provider_golden_records import PROVIDER_RECORDS

    from cccatalog_spark.session import get_spark

    spark = get_spark("gen-provider-goldens", cpus=8)
    os.makedirs(OUT_DIR, exist_ok=True)
    for provider, records in sorted(PROVIDER_RECORDS.items()):
        lines = tsv_lines(spark, provider, records)
        if not lines:
            raise SystemExit(f"{provider}: pipeline produced 0 rows")
        path = os.path.join(OUT_DIR, f"{provider}.tsv")
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {path} ({len(lines)} rows)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
