"""data_prepper_spark — a brand-new PySpark-native analytics engine.

Recasts the capabilities of the reference (ajeeshakd/data-prepper, a Java
row-at-a-time streaming dataflow engine — see SURVEY.md) as an idiomatic
Spark DataFrame stack, with the north-star workload being an
inverted-index build + BM25 query engine over Common-Crawl-style webtext
(url, warc_ts, html, text, lang).

Layout:
  hashing     — pure-Python XXH64 matching Spark's ``F.xxhash64`` (stable docIDs)
  textproc    — the extraction/tokenization byte-contract (shared with the oracle)
  corpus      — deterministic seed-fixed webtext generator (FIXTURES.md F1/F2)
  oracle      — pure-Python inverted index + textbook BM25 (the golden store,
                playing the role OpenSearch plays in the reference e2e tests)
  index/      — codec (delta+varint), tokenize stage, posting build, WAND query,
                checkpoint ledger
  operators/  — Data Prepper processor equivalents (mutate/strings/dates/
                aggregate/dedup/textstats/similarity/multimodal)
  expression  — Data Prepper expression DSL → Spark Column translator
  plans/      — pipeline-spec → DataFrame compiler (YAML-shaped dicts)
  streaming/  — Structured Streaming parity helpers
"""

__version__ = "0.1.0"
