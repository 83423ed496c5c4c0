"""Inverted-index build + BM25 query engine (the north-star workload).

Stages (SURVEY.md §7; each maps a Data Prepper mechanism to a Spark one):

  tokenize  — mapInPandas extraction+tokenization (≈ DP processor chain)
  build     — groupBy(term, range_id).applyInPandas posting-slice encode
              (≈ aggregate/append action + peer-forwarder shuffle, with the
              doc-range id as the explicit head-term-skew salt)
  segments  — bucket-partitioned parquet/Iceberg write-back (≈ opensearch sink)
  ledger    — per-partition lineage + counts, resume without recompute
              (≈ lease-based source coordinator)
  query     — block-max top-k BM25 (≈ the opensearch query side, inverted)
"""
