"""anomaly_detector equivalent tests (z-score mode; RCF plug point)."""

import pytest
from pyspark.sql import functions as F

from data_prepper_spark.operators.anomaly import anomaly_rcf, anomaly_zscore


def test_zscore_flags_spike(spark):
    rows = [(i, "g", f"2024-01-01 00:00:{i:02d}", 10.0 + (i % 3) * 0.1) for i in range(20)]
    rows.append((20, "g", "2024-01-01 00:00:20", 500.0))  # spike
    rows.append((21, "g", "2024-01-01 00:00:21", 10.1))
    df = spark.createDataFrame(
        rows, "id int, grp string, ts_s string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = anomaly_zscore(df, ["grp"], "value", "ts", shingle_size=10, threshold=3.0,
                         tiebreak_col="id")
    r = {x["id"]: x for x in out.collect()}
    assert r[20]["grade"] == 1.0
    assert r[20]["deviation_from_expected"] > 400
    assert all(r[i]["grade"] == 0.0 for i in range(20))
    # warm-up rows (no baseline) grade 0
    assert r[0]["grade"] == 0.0 and r[0]["deviation_from_expected"] == 0.0


def test_zscore_per_group_isolation(spark):
    rows = [(i, "a", f"2024-01-01 00:00:{i:02d}", 1.0) for i in range(10)]
    rows += [(100 + i, "b", f"2024-01-01 00:00:{i:02d}", 1000.0) for i in range(10)]
    df = spark.createDataFrame(
        rows, "id int, grp string, ts_s string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = anomaly_zscore(df, ["grp"], "value", "ts", tiebreak_col="id")
    assert all(x["grade"] == 0.0 for x in out.collect())


def _rcf_frame(spark):
    import math

    rows = []
    for k in ("a", "b"):
        for i in range(120):
            v = 10.0 + math.sin(i / 5.0)
            if k == "a" and i == 90:
                v = 500.0  # planted spike in group a only
            rows.append((k, i, float(v)))
    return spark.createDataFrame(rows, "k string, ts long, value double")


def test_rcf_spike_detection(spark):
    df = _rcf_frame(spark)
    out = anomaly_rcf(
        df, ["k"], "value", "ts", shingle_size=4, sample_size=64,
        num_trees=7, threshold=20.0,
    )
    a = out.filter("k = 'a'").orderBy("ts").collect()
    top = max(a, key=lambda r: r["anomaly_score"])
    # the spike shingles (ts 90..93 contain the 500) dominate
    assert top["ts"] in (90, 91, 92, 93)
    graded = {r["ts"] for r in a if r["grade"] > 0}
    assert graded == {90, 91, 92, 93}
    # warm-up rows (shingle not yet full) score 0
    assert all(r["anomaly_score"] == 0.0 for r in a[:3])
    # group b (no spike) stays clean at this threshold
    assert all(r["grade"] == 0.0 for r in out.filter("k = 'b'").collect())


def test_rcf_deterministic_across_partitionings(spark):
    df = _rcf_frame(spark)
    kw = dict(shingle_size=4, sample_size=64, num_trees=7, threshold=20.0)
    a1 = anomaly_rcf(df, ["k"], "value", "ts", **kw).orderBy("k", "ts").collect()
    a2 = anomaly_rcf(df.repartition(7), ["k"], "value", "ts", **kw).orderBy("k", "ts").collect()
    assert [r["anomaly_score"] for r in a1] == [r["anomaly_score"] for r in a2]


def test_rcf_tree_invariants():
    """Tree point-counts stay consistent through a full insert/forget
    cycle (the sliding window churns every node counter)."""
    import numpy as np

    from data_prepper_spark.operators.rcf import RandomCutForest

    f = RandomCutForest(dim=2, num_trees=3, window_size=16, seed=1, key_salt=7)
    rng = np.random.default_rng(0)
    for i in range(100):
        x = rng.standard_normal(2)
        f.score(x)
        f.update(x)
    for t in f.trees:
        assert t.root.n == 16  # window full, counts exact

        def walk(n):
            if hasattr(n, "l"):
                assert n.n == n.l.n + n.r.n
                walk(n.l)
                walk(n.r)

        walk(t.root)


def test_rcf_hot_key_cap(spark):
    """A 100x-skewed identification key must not serialize the task:
    with max_events_per_key set, only the most recent window is scored
    (earlier rows pass through as warm-up-style zeros) and wall time
    stays bounded."""
    import time

    rows = [("hot", t, float((t * 37) % 100)) for t in range(20000)]
    rows += [("cold%d" % g, t, float(t % 50)) for g in range(5) for t in range(200)]
    df = spark.createDataFrame(rows, "k string, ts long, value double")
    t0 = time.monotonic()
    out = (
        anomaly_rcf(
            df, ["k"], "value", "ts",
            shingle_size=4, sample_size=64, num_trees=7,
            max_events_per_key=2000,
        )
        .orderBy("k", "ts")
        .collect()
    )
    elapsed = time.monotonic() - t0
    assert elapsed < 120, f"hot key serialized the task: {elapsed:.0f}s"
    assert len(out) == 20000 + 5 * 200  # every event passes through
    hot = [r for r in out if r["k"] == "hot"]
    # everything before the live window is warm-up-style zero...
    assert all(r["anomaly_score"] == 0.0 for r in hot[:18000])
    # ...and the live window actually scored
    assert any(r["anomaly_score"] > 0.0 for r in hot[18000:])
    # cold keys are under the cap: fully scored as before
    cold = [r for r in out if r["k"] == "cold0"]
    assert any(r["anomaly_score"] > 0.0 for r in cold)
