"""`anomaly_detector` processor equivalent.

The reference wraps AWS Random Cut Forest per identification-key group
(anomaly-detector-processor/.../AnomalyDetectorProcessor.java:27,60-80;
modes/RandomCutForestMode.java:32-53 — shingled RCF emitting
`deviation_from_expected` and `grade`).  RCF has no Spark builtin and no
library in this container, so the engine ships two modes:

  zscore  — per-group rolling mean/std over a trailing window of
            `shingle_size` prior points (window functions, pure JVM);
            grade = 1 if |z| > threshold else 0.  Deterministic and
            SQL-reproducible; this is the default.
  rcf     — REAL random-cut-forest scoring via the self-contained RRCF
            implementation in operators/rcf.py (public Guha et al. 2016
            algorithm), run per key group inside applyInPandas.
            Deterministic (counter-seeded per key/tree) but inherently
            sequential per key — not SQL-reproducible, covered by
            property tests instead of the DuckDB oracle.

Like the reference, events are grouped by identification_keys and
processed in time order; the deviation is attached, events pass through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def anomaly_zscore(
    df: DataFrame,
    identification_keys: list[str],
    key: str,
    ts_col: str,
    shingle_size: int = 10,
    threshold: float = 3.0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Attach `deviation_from_expected` (value − trailing mean) and
    `grade` (1.0 when |z| > threshold) per group, ordered by event time.

    The trailing window excludes the current row (expected value is
    derived from history only, like RCF's score-then-update).  Rows with
    fewer than 2 prior points grade 0 (no baseline yet — mirrors RCF's
    warm-up outputting 0 grade)."""
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = (
        Window.partitionBy(*identification_keys)
        .orderBy(*order)
        .rowsBetween(-shingle_size, -1)
    )
    mean = F.avg(F.col(key)).over(w)
    std = F.stddev_samp(F.col(key)).over(w)
    n = F.count(F.col(key)).over(w)
    dev = F.col(key) - mean
    z = F.when((std.isNotNull()) & (std > 0), dev / std).otherwise(F.lit(0.0))
    return (
        df.withColumn("deviation_from_expected", F.when(n >= 2, dev).otherwise(F.lit(0.0)))
        .withColumn(
            "grade",
            F.when((n >= 2) & (F.abs(z) > threshold), F.lit(1.0)).otherwise(F.lit(0.0)),
        )
    )


def anomaly_rcf(
    df: DataFrame,
    identification_keys: list[str],
    key: str,
    ts_col: str,
    shingle_size: int = 4,
    sample_size: int = 128,
    num_trees: int = 15,
    threshold: float = 5.0,
    seed: int = 42,
    tiebreak_col: str | None = None,
    max_events_per_key: int | None = None,
) -> DataFrame:
    """`random_cut_forest` mode (RandomCutForestMode.java:32-53), backed
    by the self-contained RRCF in :mod:`.rcf` (public Guha et al. 2016
    algorithm — no external library).

    Per identification-key group (applyInPandas; the reference shards by
    the same keys via its hash ring): events in (ts, tiebreak) order are
    shingled into `shingle_size`-dim points, scored against the forest
    BEFORE insertion (score-then-update), then inserted; beyond
    `sample_size` points the oldest is forgotten (sliding window).
    Output adds `anomaly_score` (expected collusive displacement,
    rounded to 6) and `grade` (1.0 when score > threshold).  Deterministic:
    per-(key, tree) counter-seeded RNGs — identical scores at any
    partitioning or cluster size.

    ``max_events_per_key`` is the hot-key guard: RCF is inherently
    sequential per key (same sharding axis as the reference's hash ring),
    so one skewed identification key would otherwise serialize a task for
    arbitrarily long.  Groups larger than the cap score only their most
    recent `max_events_per_key` events (the live window — the reference's
    sample_size bounds retained STATE the same way); earlier rows pass
    through with score 0 / grade 0, exactly like warm-up rows.  Bounded
    per-task wall time, deterministic output.  OFF by default (None) —
    the cap changes output for rows it skips, so it is strictly opt-in;
    set it explicitly on corpora with skewed identification keys."""
    import zlib

    import numpy as np

    order_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    from pyspark.sql.types import DoubleType, StructField, StructType

    # fresh StructType — .add() would mutate the frame's cached schema
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("anomaly_score", DoubleType()), StructField("grade", DoubleType())]
    )

    from .rcf import RandomCutForest

    def fn(pdf):
        pdf = pdf.sort_values(order_cols).reset_index(drop=True)
        vals = pdf[key].to_numpy(dtype=np.float64)
        key_tuple = tuple(str(pdf.iloc[0][k]) for k in identification_keys) if len(pdf) else ()
        salt = zlib.crc32("|".join(key_tuple).encode())
        forest = RandomCutForest(
            dim=shingle_size, num_trees=num_trees, window_size=sample_size,
            seed=seed, key_salt=salt,
        )
        scores = np.zeros(len(vals), dtype=np.float64)
        start = 0
        if max_events_per_key is not None and len(vals) > max_events_per_key:
            start = len(vals) - max_events_per_key
        for i in range(max(start, 0), len(vals)):
            if i - start >= shingle_size - 1:
                x = vals[i - shingle_size + 1 : i + 1]
                scores[i] = forest.score(x)
                forest.update(x)
        pdf["anomaly_score"] = np.round(scores, 6)
        pdf["grade"] = (scores > threshold).astype(np.float64)
        return pdf

    return df.groupBy(*identification_keys).applyInPandas(fn, schema=out_schema)
