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


def test_rcf_mode_raises():
    with pytest.raises(NotImplementedError):
        anomaly_rcf(None, ["g"], "v", "ts")
