"""Generate the per-site Common Crawl scraper golden TSVs
(tests/golden/cc/): each site's representative pages through
apply_cc_spec → normalize → serialize, committed as the byte-exact
wire expectation — the engine-side analog of the reference's
tests/resources/example_output corpus for its commoncrawl scrapers.

Usage: python tools/gen_cc_goldens.py  (re-run only when a spec or the
capture engine intentionally changes behavior; the golden-file diff IS
the behavior-change review artifact)
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

OUT_DIR = os.path.join("tests", "golden", "cc")


def tsv_lines(spark, site: str, pages: list[tuple[str, str]]) -> list[str]:
    from cccatalog_spark.operators.normalize import (
        normalize_image_batch,
        serialize_image_tsv,
        split_rejected,
    )
    from cccatalog_spark.operators.provider_specs_cc import (
        CC_SCRAPERS,
        apply_cc_spec,
    )
    from cccatalog_spark.sources.tsv import write_tsv

    spec = CC_SCRAPERS[site]()
    df = spark.createDataFrame(pages, "url string, html string")
    good, _bad = split_rejected(
        normalize_image_batch(apply_cc_spec(df, spec))
    )
    tmp = tempfile.mkdtemp(prefix=f"cc-golden-{site}-")
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
    from cc_golden_pages import CC_PAGES

    from cccatalog_spark.session import get_spark

    spark = get_spark("gen_cc_goldens")
    os.makedirs(OUT_DIR, exist_ok=True)
    for site in sorted(CC_PAGES):
        lines = tsv_lines(spark, site, CC_PAGES[site])
        path = os.path.join(OUT_DIR, f"{site}.tsv")
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        print(f"{site}: {len(lines)} rows -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
