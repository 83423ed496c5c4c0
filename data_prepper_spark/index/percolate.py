"""Percolate queries — reverse search, re-expressed as query-as-data joins.

OpenSearch's percolator (`percolate` query over an index of registered
queries) answers "which of my saved queries match this document?" — the
engine behind alerting and saved-search notification.  The reference
ships documents TO OpenSearch where registered percolator queries run
per indexed doc (opensearch sink); here the same capability is one
declarative Spark plan over a QUERY TABLE:

    queries: (query_id, must array<string>, should array<string>,
              must_not array<string>, min_should int)

A document matches a query iff ALL must terms appear, NO must_not term
appears, and at least `min_should` DISTINCT should terms appear — the
bool-query filter-context semantics the percolator evaluates.

Scale shape (the part that matters at 10^12 docs × 10^6 queries): docs
explode to DISTINCT (doc_id, term) rows, queries to (query_id, term,
role) rows, then ONE equi-join on term + ONE groupBy(doc_id, query_id)
with conditional counts; the requirements table re-joins broadcast.
Shuffle volume ∝ term-overlap rows — never |docs| × |queries| (Lucene's
percolator applies the same term-extraction prefilter before running
candidate queries).  Queries must therefore carry ≥1 positive
(must/should) term; a pure-must_not query is rejected, like the
percolator's MatchAllDocs-extraction corner it exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..trainprep.textstats import tokens_array

QUERY_SCHEMA = (
    "query_id long, must array<string>, should array<string>, "
    "must_not array<string>, min_should int"
)


def queries_from_specs(spark: SparkSession, specs) -> DataFrame:
    """Registered-query table from (query_id, must, should, must_not,
    min_should) tuples — the percolator's query index."""
    rows = [
        (int(qid), list(must), list(should), list(must_not), int(ms))
        for qid, must, should, must_not, ms in specs
    ]
    for qid, must, should, _, _ in rows:
        if not must and not should:
            raise ValueError(
                f"percolate query {qid} has no positive term "
                "(must/should) — unmatchable by term extraction"
            )
    return spark.createDataFrame(rows, QUERY_SCHEMA)


def percolate(
    queries_df: DataFrame, docs_df: DataFrame,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, query_id) for every registered query matching each doc
    under bool filter-context semantics.  One term equi-join + one
    (doc, query) aggregation; requirements join broadcast."""
    doc_terms = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(tokens_array(F.col(text_col)))
        ).alias("term"),
    )
    parts = []
    for role in ("must", "should", "must_not"):
        parts.append(
            queries_df.select(
                "query_id",
                F.explode(F.array_distinct(F.col(role))).alias("term"),
                F.lit(role).alias("role"),
            )
        )
    q_terms = parts[0].unionByName(parts[1]).unionByName(parts[2])
    hits = (
        doc_terms.join(q_terms, "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.sum(F.when(F.col("role") == "must", 1).otherwise(0))
            .alias("must_hits"),
            F.sum(F.when(F.col("role") == "should", 1).otherwise(0))
            .alias("should_hits"),
            F.sum(F.when(F.col("role") == "must_not", 1).otherwise(0))
            .alias("not_hits"),
        )
    )
    req = queries_df.select(
        "query_id",
        F.size(F.array_distinct("must")).alias("n_must"),
        F.col("min_should"),
    )
    return (
        hits.join(F.broadcast(req), "query_id")
        .filter(
            (F.col("must_hits") == F.col("n_must"))
            & (F.col("not_hits") == 0)
            & (F.col("should_hits") >= F.col("min_should"))
        )
        .select("doc_id", "query_id")
    )
