"""Unit tests for round-6 batch-9: streaming Page-Hinkley state and
UMass topic coherence."""

from __future__ import annotations

import math
import os
import tempfile
import time
import uuid

import pytest
from pyspark.sql import functions as F


def _run_stream_ph(spark, rows, delta, threshold, n_batches=2):
    from cccatalog_spark.streaming.stateful import page_hinkley_tracker

    base = tempfile.mkdtemp(prefix="t_sph_")
    src = os.path.join(base, "in")
    os.makedirs(src)
    per = max(1, len(rows) // n_batches)
    now = time.time()
    for i in range(n_batches):
        chunk = rows[i * per :] if i == n_batches - 1 else rows[
            i * per : (i + 1) * per
        ]
        if not chunk:
            continue
        path = os.path.join(src, f"b{i}.tsv")
        with open(path, "w") as f:
            for r in chunk:
                f.write("\t".join(map(str, r)) + "\n")
        os.utime(path, (now - 120 + i * 60,) * 2)
    stream = (
        spark.readStream.option("sep", "\t")
        .schema("k long, t long, v double")
        .option("maxFilesPerTrigger", "1")
        .csv(src)
    )
    tracked = page_hinkley_tracker(
        stream, "k", "v", "t", delta=delta, threshold=threshold
    )
    sink = f"t_sph_{uuid.uuid4().hex[:8]}"
    q = (
        tracked.writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return (
        spark.table(sink)
        .groupBy("k")
        .agg(
            F.max("n").alias("n"),
            F.max_by("ph_max", "n").alias("ph_max"),
            F.max_by("n_alarms", "n").alias("n_alarms"),
            F.max_by("first_alarm_ord", "n").alias("first_alarm_ord"),
        )
        .collect()
    )


def _ph_ref(vals, delta):
    s = u = 0.0
    minu = None
    phmax = 0.0
    alarms50 = 0
    for i, x in enumerate(vals, 1):
        s += x
        u += x - s / i - delta
        minu = u if i == 1 else min(minu, u)
        phmax = max(phmax, u - minu)
    return phmax


def test_stream_ph_matches_batch_recursion(spark):
    vals = [0.0] * 10 + [20.0] * 10
    rows = [(7, i, v) for i, v in enumerate(vals)]
    out = _run_stream_ph(spark, rows, delta=1.0, threshold=30.0)
    r = {x["k"]: x for x in out}[7]
    assert r["n"] == 20
    assert r["ph_max"] == pytest.approx(_ph_ref(vals, 1.0), abs=1e-9)
    assert r["n_alarms"] > 0
    assert r["first_alarm_ord"] >= 10  # alarm only after the shift

    # batch twin agrees
    from cccatalog_spark.operators.temporal import page_hinkley

    df = spark.createDataFrame(rows, ["k", "t", "v"])
    b = page_hinkley(df, "k", "t", "v", delta=1.0, threshold=30.0).collect()[
        0
    ]
    assert b["ph_max"] == pytest.approx(r["ph_max"], abs=1e-6)
    assert b["n_alarms"] == r["n_alarms"]
    assert b["first_alarm_ord"] == r["first_alarm_ord"]


def test_stream_ph_state_spans_batches(spark):
    # flat in batch 1, shift only in batch 2: the alarm requires the
    # running mean carried across the trigger boundary
    vals = [5.0] * 8 + [50.0] * 8
    rows = [(1, i, v) for i, v in enumerate(vals)]
    out = _run_stream_ph(spark, rows, delta=0.5, threshold=20.0)
    r = out[0]
    assert r["n"] == 16 and r["n_alarms"] > 0 and r["first_alarm_ord"] >= 8


# ------------------------------------------------------------- coherence
def test_umass_coherence_reference(spark):
    from cccatalog_spark.operators.coherence import umass_coherence

    docs = [
        (1, "g", "apple banana apple"),
        (2, "g", "apple banana"),
        (3, "g", "apple cherry"),
        (4, "g", "dog"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "grp", "text"])
    r = umass_coherence(df, "text", "doc_id", "grp", top_m=2).collect()[0]
    # top-2 by freq: apple (4), banana (2) -> ranks 1, 2
    # pair (banana rank2, apple rank1): ln((D(apple,banana)+1)/D(apple))
    ref = math.log((2 + 1) / 3)
    assert r["n_terms"] == 2 and r["n_pairs"] == 1
    assert r["umass"] == pytest.approx(ref, abs=1e-6)


def test_umass_zero_cooccurrence_smoothed(spark):
    from cccatalog_spark.operators.coherence import umass_coherence

    docs = [(1, "g", "aaa"), (2, "g", "bbb"), (3, "g", "aaa")]
    df = spark.createDataFrame(docs, ["doc_id", "grp", "text"])
    r = umass_coherence(df, "text", "doc_id", "grp", top_m=2).collect()[0]
    # terms aaa (df 2), bbb (df 1); never co-occur: ln((0+1)/D(aaa))
    assert r["umass"] == pytest.approx(math.log(1 / 2), abs=1e-6)


# --------------------------------------------------------------- Wilcoxon
def test_wilcoxon_signed_rank_reference(spark):
    from cccatalog_spark.operators.experiments import wilcoxon_signed_rank

    diffs = [1.0, -2.0, 3.0, -4.0, 5.0, 6.0, 0.0, 2.0]
    df = spark.createDataFrame([(d,) for d in diffs], ["d"])
    r = wilcoxon_signed_rank(df, "d").collect()[0]
    nz = [d for d in diffs if d != 0]
    n = len(nz)
    # average ranks of |d| with the tie at |2|
    by_abs = sorted(nz, key=abs)
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and abs(by_abs[j]) == abs(by_abs[i]):
            j += 1
        for t in range(i, j):
            ranks[t] = (i + 1 + j) / 2.0
        i = j
    wp = sum(ranks[t] for t in range(n) if by_abs[t] > 0)
    assert r["n_nonzero"] == n
    assert r["w_plus"] == pytest.approx(wp, abs=1e-9)
    tsum = sum(
        t**3 - t
        for t in __import__("collections")
        .Counter(abs(d) for d in nz)
        .values()
    )
    mu = n * (n + 1) / 4
    var = n * (n + 1) * (2 * n + 1) / 24 - tsum / 48
    assert r["z"] == pytest.approx((wp - mu) / math.sqrt(var), abs=1e-6)


def test_wilcoxon_symmetric_is_small(spark):
    from cccatalog_spark.operators.experiments import wilcoxon_signed_rank

    diffs = [float(i) for i in range(1, 21)] + [
        -float(i) for i in range(1, 21)
    ]
    df = spark.createDataFrame([(d,) for d in diffs], ["d"])
    r = wilcoxon_signed_rank(df, "d").collect()[0]
    assert abs(r["z"]) < 0.1  # perfectly symmetric differences


# ------------------------------------------------------------ Mood median
def test_mood_median_reference(spark):
    from cccatalog_spark.operators.experiments import mood_median_test

    rows = [("a", float(v)) for v in range(1, 11)] + [
        ("b", float(v)) for v in range(8, 18)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = mood_median_test(df, "g", "v").collect()[0]
    vals = sorted(v for _, v in rows)
    gm = vals[(len(vals) + 1) // 2 - 1]  # lower discrete median
    assert r["grand_median"] == pytest.approx(gm)
    assert r["n"] == 20 and r["k"] == 2 and r["dof"] == 1

    # python contingency chi2
    import collections

    cells = collections.defaultdict(lambda: [0, 0])
    for g, v in rows:
        cells[g][0 if v > gm else 1] += 1
    ta = sum(c[0] for c in cells.values())
    tb = sum(c[1] for c in cells.values())
    n = ta + tb
    chi2 = 0.0
    for c in cells.values():
        rn = c[0] + c[1]
        chi2 += (c[0] - rn * ta / n) ** 2 / (rn * ta / n)
        chi2 += (c[1] - rn * tb / n) ** 2 / (rn * tb / n)
    assert r["chi2"] == pytest.approx(chi2, abs=1e-6)
    assert r["chi2"] > 3.8  # shifted groups disagree with the median


# ------------------------------------------------------------ entropy rate
def test_char_entropy_rate_uniform_vs_constant(spark):
    from cccatalog_spark.operators.corpus_stats import char_entropy_rate

    rows = [
        (1, "g1", "abababababab"),   # deterministic successor: H = 0
        (2, "g2", "aabbabbaabab"),   # mixed successors: H > 0
    ]
    df = spark.createDataFrame(rows, ["id", "g", "text"])
    out = {
        r["group"]: r for r in char_entropy_rate(df, "text", "g").collect()
    }
    assert out["g1"]["entropy_rate"] == pytest.approx(0.0, abs=1e-9)
    assert out["g2"]["entropy_rate"] > 0.3
    assert out["g1"]["n_bigrams"] == 11
    assert out["g1"]["n_contexts"] == 2


def test_char_entropy_rate_reference(spark):
    from collections import Counter

    from cccatalog_spark.operators.corpus_stats import char_entropy_rate

    text = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame([(1, "g", text)], ["id", "g", "text"])
    r = char_entropy_rate(df, "text", "g").collect()[0]
    bigr = [text[i : i + 2] for i in range(len(text) - 1)]
    n12 = Counter(bigr)
    n1 = Counter(b[0] for b in bigr)
    nn = len(bigr)
    h = sum((c / nn) * math.log(n1[b[0]] / c) for b, c in n12.items())
    assert r["entropy_rate"] == pytest.approx(h, abs=1e-6)


# -------------------------------------------------------------- burstiness
def test_term_burstiness_bursty_vs_spread(spark):
    from cccatalog_spark.operators.corpus_stats import term_burstiness

    # 'spam' concentrates 10 hits in one doc; 'the' spreads 1 per doc
    rows = [(0, "spam " * 10)] + [(i, "the story") for i in range(1, 11)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["term"]: r
        for r in term_burstiness(df, "text", "doc_id", top_k=5).collect()
    }
    assert out["spam"]["cf"] == 10 and out["spam"]["df"] == 1
    assert out["the"]["cf"] == 10 and out["the"]["df"] == 10
    assert out["spam"]["fano"] > out["the"]["fano"]
    assert out["spam"]["mean_in_doc"] == pytest.approx(10.0)

    # closed-form Fano for 'the': counts = 1 in 10 of 11 docs
    n = 11
    mean = 10 / n
    var = 10 / n - mean**2
    assert out["the"]["fano"] == pytest.approx(var / mean, abs=1e-6)
