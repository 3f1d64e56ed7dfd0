"""Byte-level golden TSVs for ALL 15 Common Crawl scraper specs — the
reference's tests/resources/example_output strategy applied to the
commoncrawl half: representative pages through apply_cc_spec →
normalize → serialize must reproduce the committed wire bytes exactly.
Any drift in a selector rule, the capture engine, a license mapping,
or the shared normalize pipeline changes a line here.

Regenerate intentionally with tools/gen_cc_goldens.py; the golden-file
diff is the behavior-change review artifact."""

from __future__ import annotations

import os
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy sweep; excluded from the fast loop (-m "not slow")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cc_golden_pages import CC_PAGES  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "cc")


def test_golden_corpus_covers_every_cc_scraper():
    from cccatalog_spark.operators.provider_specs_cc import CC_SCRAPERS

    assert set(CC_PAGES) == set(CC_SCRAPERS)
    committed = {
        f[: -len(".tsv")]
        for f in os.listdir(GOLDEN_DIR)
        if f.endswith(".tsv")
    }
    assert committed == set(CC_PAGES)


@pytest.mark.parametrize("site", sorted(CC_PAGES))
def test_cc_scraper_wire_bytes_match_golden(spark, site):
    from tools.gen_cc_goldens import tsv_lines

    with open(
        os.path.join(GOLDEN_DIR, f"{site}.tsv"), encoding="utf-8"
    ) as f:
        expected = sorted(f.read().splitlines())
    got = tsv_lines(spark, site, CC_PAGES[site])
    assert got, f"{site}: golden corpus produced no rows"
    assert got == expected
