"""Stage 1 — extraction + tokenization (mapInPandas, Arrow-vectorized).

Data Prepper analog: the per-event processor chain
(grok/lower/trim/split — SURVEY.md §2.5) plus conditional routing on
``lang`` (§2.3, RouteEventEvaluator). Here the whole chain is one
columnar pass: JVM-side filter + xxhash64 docID (whole-stage codegen),
then a single mapInPandas that turns each Arrow batch of pages into
(doc, term, tf) rows. No per-row Python in the Spark path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..textproc import extract_text_series, tokenize_counts_arrow
from .config import IndexConfig, TOKENS_SCHEMA


def with_doc_id(pages: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Filter to the indexed language and assign stable docIDs (JVM-side).

    doc_id = xxhash64(url): stable across resume and across cluster sizes
    (never zipWithIndex). The lang filter is pushed down to the parquet/
    Iceberg scan by Catalyst.
    """
    return pages.filter(F.col("lang") == cfg.lang).withColumn(
        "doc_id", F.xxhash64("url")
    )


def range_id_col(cfg: IndexConfig, doc_id_col: str = "doc_id"):
    """Contiguous docID-range id (the skew salt), order-aligned with signed doc_id."""
    if cfg.range_bits == 0:
        return F.lit(0)
    return (
        F.shiftright(F.col(doc_id_col), 64 - cfg.range_bits)
        + (1 << (cfg.range_bits - 1))
    ).cast("int")


def tokenize_stage(pages: DataFrame, cfg: IndexConfig) -> DataFrame:
    """pages(url, html, lang) → tokens(doc_id, term, tf, dl)."""
    src = with_doc_id(pages, cfg).select("doc_id", "html")

    def fn(batches):
        for b in batches:
            texts = extract_text_series(b["html"])
            owners, terms, tfs, lens = tokenize_counts_arrow(texts)
            doc_ids = b["doc_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids[owners],
                    "term": terms,
                    "tf": tfs.astype("int32"),
                    "dl": lens[owners].astype("int32"),
                }
            )

    return src.mapInPandas(fn, schema=TOKENS_SCHEMA)


def doc_src_from_pages(pages: DataFrame, cfg: IndexConfig) -> DataFrame:
    """(doc_id, url) for docmeta — a column-pruned re-scan of pages."""
    return with_doc_id(pages, cfg).select("doc_id", "url")


def tokenize_stage_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pre-extracted-text variant: docs(id, text) → tokens, same schema.

    Used for tables that carry `text` directly (no html extraction step) —
    e.g. the driver's `documents` table.  doc_id is taken from the table
    (caller guarantees stability)."""
    src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )

    def fn(batches):
        for b in batches:
            owners, terms, tfs, lens = tokenize_counts_arrow(b["text"])
            doc_ids = b["doc_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids[owners],
                    "term": terms,
                    "tf": tfs.astype("int32"),
                    "dl": lens[owners].astype("int32"),
                }
            )

    return src.mapInPandas(fn, schema=TOKENS_SCHEMA)
