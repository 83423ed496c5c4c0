"""Training-data pipeline operators over document / embedding tables.

These are first-class engine components beyond the reference's own
operator set: the operations a 100 TB training-data curation pipeline
needs.  Everything is declarative DataFrame work (shuffle-aware,
broadcast-aware); numpy appears only inside Arrow-batched pandas UDFs.

  textstats   — token counts, quality scoring, language-ID, fingerprints
  dedup       — exact, n-gram Jaccard, MinHash+LSH, SimHash
  similarity  — brute-force cosine top-k, hyperplane-LSH buckets, IVF
  multimodal  — binary-column plumbing (decode/feature stubs over mapInPandas)

Shared hashing contract: ``token_hash60`` (md5-prefix-as-int) is
reproducible in ANSI SQL, so even MinHash/SimHash outputs are verified
against a DuckDB oracle bit-for-bit.
"""
