"""Training-set decontamination + deterministic stratified sampling.

Decontamination is the benchmark-overlap sweep every LLM data pipeline
runs before training: flag any training document that shares an n-gram
(n=8..13 in public practice; see GPT-3 appendix C / PaLM §App. B) with
an evaluation/benchmark text.  Spark shape: both sides reduce to
DISTINCT n-gram sets; the probe side is usually tiny (benchmarks) so the
join auto-broadcasts, but no hint is forced — at a 10^12-doc training
side the join is a plain shuffle on the gram string (or its hash).

Stratified sampling is the mixture-weights step (per-source / per-lang
rates).  Hash-deterministic: a row's fate depends only on its key, never
on partitioning, ordering, or cluster size — re-running at any scale
reproduces the same sample (the property `percent_sampler` also
guarantees, here per stratum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingle_col, token_hash60


def ngram_overlap(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    bench_text_col: str | None = None,
) -> DataFrame:
    """(doc, n_hits, contaminated): per training doc, the number of
    DISTINCT n-grams it shares with the benchmark set.

    Every training doc appears in the output (n_hits=0 when clean) so the
    result can drive a quarantine split directly."""
    tg = train.select(
        F.col(id_col).alias("doc"),
        F.explode(shingle_col(F.col(text_col), n)).alias("sh"),
    )
    bg = (
        bench.select(
            F.explode(shingle_col(F.col(bench_text_col or text_col), n)).alias("sh")
        )
        .distinct()
    )
    hits = tg.join(bg, "sh").groupBy("doc").agg(F.count(F.lit(1)).alias("n_hits"))
    ids = train.select(F.col(id_col).alias("doc"))
    return (
        ids.join(hits, "doc", "left")
        .fillna({"n_hits": 0})
        .withColumn("contaminated", F.col("n_hits") > 0)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep `rates[stratum]` (fraction in [0,1]) of each stratum,
    deterministically by md5-family hash of the key column — the same
    rows survive at any cluster size, and DuckDB reproduces the exact
    row set (shared token_hash60)."""
    h = F.pmod(token_hash60(F.col(key_col).cast("string")), F.lit(10000))
    cut = None
    for stratum, r in sorted(rates.items()):
        c = F.col(strata_col) == stratum
        v = F.lit(int(round(r * 10000)))
        cut = F.when(c, v) if cut is None else cut.when(c, v)
    cut = cut.otherwise(F.lit(int(round(default_rate * 10000)))) if cut is not None else F.lit(
        int(round(default_rate * 10000))
    )
    return df.filter(h < cut)
