"""Property-based spec for merge_upsert: compare against an
independent Python reference model over randomized target/batch pairs
(overlaps, nulls, conflicting maps/arrays — the adversarial surface
SURVEY §7.3 flags as the system's semantic core)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy sweep; excluded from the fast loop (-m "not slow")

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cccatalog_spark.operators.merge import merge_upsert

KEYS = st.integers(min_value=0, max_value=4)
VAL = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
NUM = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
META = st.one_of(
    st.none(),
    st.dictionaries(
        st.sampled_from(["x", "y", "z"]),
        st.one_of(st.none(), st.sampled_from(["1", "2"])),
        max_size=3,
    ),
)
TAGS = st.one_of(
    st.none(), st.lists(st.sampled_from(["t1", "t2", "t3"]), max_size=3)
)

ROW = st.tuples(KEYS, VAL, NUM, META, TAGS)
# unique keys per side: the merge contract assumes key-deduped inputs
# (A5 runs upstream)
SIDE = st.lists(ROW, max_size=5, unique_by=lambda r: r[0])

SCHEMA = (
    "k int, val string, num int, meta map<string,string>, tags array<string>"
)


def _model_merge(target, batch):
    t = {r[0]: r for r in target}
    b = {r[0]: r for r in batch}
    out = {}
    for k in set(t) | set(b):
        tr, br = t.get(k, (k, None, None, None, None)), b.get(
            k, (k, None, None, None, None)
        )
        val = br[1] if br[1] is not None else tr[1]
        num = br[2] if br[2] is not None else tr[2]
        if tr[3] is None and br[3] is None:
            meta = None
        else:
            meta = {
                kk: vv for kk, vv in (tr[3] or {}).items() if vv is not None
            }
            meta.update(
                {kk: vv for kk, vv in (br[3] or {}).items() if vv is not None}
            )
        if tr[4] is None and br[4] is None:
            tags = None
        else:
            seen, tags = set(), []
            for x in (tr[4] or []) + (br[4] or []):
                if x not in seen:
                    seen.add(x)
                    tags.append(x)
        out[k] = (k, val, num, meta, tags)
    return out


VERSIONS = st.lists(
    st.tuples(KEYS, VAL, NUM, META, TAGS), min_size=1, max_size=6
)


@given(SIDE, VERSIONS)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_replay_collapse_equals_sequential_upserts(spark, target_rows, versions):
    """J7 invariant, randomized: collapsing a multi-version batch then
    doing ONE upsert must equal upserting each version in order."""
    from cccatalog_spark.operators.merge import replay_collapse

    schema_v = (
        "k int, ord int, val string, num int, "
        "meta map<string,string>, tags array<string>"
    )
    target = spark.createDataFrame(target_rows, SCHEMA)

    seq = target
    for v in versions:
        seq = merge_upsert(
            seq, spark.createDataFrame([v], SCHEMA), ["k"]
        )

    vrows = [(v[0], i, v[1], v[2], v[3], v[4]) for i, v in enumerate(versions)]
    batch = spark.createDataFrame(vrows, schema_v)
    collapsed = replay_collapse(batch, ["k"], "ord").drop("ord")
    one = merge_upsert(target, collapsed, ["k"])

    def canon(df):
        out = {}
        for r in df.collect():
            out[r["k"]] = (r["val"], r["num"], r["meta"],
                           sorted(r["tags"]) if r["tags"] is not None else None)
        return out

    assert canon(seq) == canon(one)


@given(SIDE, SIDE)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_merge_upsert_matches_model(spark, target_rows, batch_rows):
    target = spark.createDataFrame(target_rows, SCHEMA)
    batch = spark.createDataFrame(batch_rows, SCHEMA)
    got = {
        r["k"]: (
            r["k"],
            r["val"],
            r["num"],
            r["meta"],
            r["tags"],
        )
        for r in merge_upsert(target, batch, ["k"]).collect()
    }
    want = _model_merge(target_rows, batch_rows)
    assert set(got) == set(want)
    for k in want:
        gk, wk = got[k], want[k]
        assert gk[1] == wk[1], f"val k={k}: {gk[1]} != {wk[1]}"
        assert gk[2] == wk[2], f"num k={k}"
        assert gk[3] == wk[3], f"meta k={k}: {gk[3]} != {wk[3]}"
        assert gk[4] == wk[4], f"tags k={k}: {gk[4]} != {wk[4]}"
