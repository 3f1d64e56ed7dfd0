"""Byte-level golden TSVs for ALL 16 provider specs — the reference's
per-provider tests/resources/example_output/*.tsv strategy (SURVEY §5)
applied to every spec: representative records through apply_spec →
normalize → serialize must reproduce the committed wire bytes exactly.
Any drift in a license map, size-preference chain, tag rule, or the
shared normalize pipeline changes a line here.

Regenerate intentionally with tools/gen_provider_goldens.py; the
golden-file diff is the behavior-change review artifact.
"""

from __future__ import annotations

import os
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy sweep; excluded from the fast loop (-m "not slow")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from provider_golden_records import PROVIDER_RECORDS  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "providers")


def test_golden_corpus_covers_every_registered_spec():
    from cccatalog_spark.operators.provider_specs_ext import (
        all_provider_specs,
    )

    assert set(PROVIDER_RECORDS) == set(all_provider_specs())
    committed = {
        f[: -len(".tsv")]
        for f in os.listdir(GOLDEN_DIR)
        if f.endswith(".tsv")
    }
    assert committed == set(PROVIDER_RECORDS)


@pytest.mark.parametrize("provider", sorted(PROVIDER_RECORDS))
def test_provider_wire_bytes_match_golden(spark, provider):
    from tools.gen_provider_goldens import tsv_lines

    with open(
        os.path.join(GOLDEN_DIR, f"{provider}.tsv"), encoding="utf-8"
    ) as f:
        expected = sorted(f.read().splitlines())
    got = tsv_lines(spark, provider, PROVIDER_RECORDS[provider])
    assert got == expected
