"""Search-hit highlighting — Lucene's plain highlighter re-expressed as
pure Catalyst column expressions (no UDF, no driver loop over text).

The index stores postings and docvalues, not source text (like a Lucene
index without stored fields); highlighting therefore joins the hit list
back to the source table — exactly OpenSearch's model, where highlight
fragments are built from ``_source`` at fetch time.

Deterministic fragment rule (every step SQL-expressible, so the DuckDB
oracle pins snippets byte-for-byte):

- ``p``    = the earliest 1-based position of ANY query term as a
  substring of ``lower(text)`` (ties to the earliest term occurrence —
  the plain highlighter's "best fragment starts at the first match");
- ``start``= ``max(1, p − lead)``; fragment = ``substr(text, start,
  frag_size)`` (character-based on both engines);
- every query-term TOKEN occurrence inside the fragment is wrapped in
  ``pre``/``post`` tags via one case-insensitive word-boundary
  alternation (``(?i)\\b(t1|t2|…)\\b``) — longest-first ordering so no
  alternative shadows another; ``\\b`` treats ``_`` as a word char (a
  documented divergence from the ``[a-z0-9]+`` tokenizer: underscores
  separate tokens but not regex words, identical on both engines).

Reference anchor: the reference delegates search UX to OpenSearch
(opensearch sink); ``highlight`` is part of that serving surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..textproc import tokenize

PRE_TAG = "<em>"
POST_TAG = "</em>"


def highlight_pattern(query_text: str) -> str:
    """The word-boundary alternation for *query_text*'s unique terms,
    longest-first (tokens are [a-z0-9]+, regex-safe by construction)."""
    terms = sorted(set(tokenize(query_text)), key=lambda t: (-len(t), t))
    if not terms:
        raise ValueError("query has no tokens to highlight")
    return r"(?i)\b(" + "|".join(terms) + r")\b"


def highlight_col(
    text_col, query_text: str, frag_size: int = 80, lead: int = 30,
    pre: str = PRE_TAG, post: str = POST_TAG,
):
    """Column expression: deterministic highlight snippet of *text_col*
    for *query_text* (see module docstring for the exact rule).  Pure
    Catalyst — composes into any DataFrame plan and stays inside
    whole-stage codegen at any scale."""
    terms = sorted(set(tokenize(query_text)))
    if not terms:
        raise ValueError("query has no tokens to highlight")
    lower = F.lower(text_col)
    pos = [F.nullif(F.locate(t, lower), F.lit(0)) for t in terms]
    p = F.least(*pos) if len(pos) > 1 else pos[0]
    start = F.greatest(F.lit(1), p - F.lit(lead))
    frag = text_col.substr(start, F.lit(frag_size))
    # Spark regexp_replace replaces every match; $1 is the group ref
    return F.regexp_replace(frag, highlight_pattern(query_text),
                            pre + "$1" + post)


def highlight_hits(
    source_df: DataFrame,
    hits: list[tuple[int, float]],
    query_text: str,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    frag_size: int = 80,
    lead: int = 30,
) -> list[tuple[int, str]]:
    """(doc_id, snippet) for each hit, in the hits' rank order.  The
    fetch is one broadcast-semi-join-shaped scan of the source table
    restricted to the hit docIDs (k docs — always broadcastable), never
    a driver-side loop over text."""
    if not hits:
        return []
    ids = [int(d) for d, _ in hits]
    snip = (
        source_df.filter(F.col(doc_id_col).isin(ids))
        .select(
            F.col(doc_id_col).alias("doc_id"),
            highlight_col(
                F.col(text_col), query_text, frag_size, lead
            ).alias("snippet"),
        )
        .collect()
    )
    by_id = {int(r["doc_id"]): r["snippet"] for r in snip}
    return [(d, by_id[d]) for d in ids if d in by_id]


def term_vectors(
    searcher,
    source_df: DataFrame,
    doc_ids: list[int],
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    term_statistics: bool = True,
) -> list[tuple[int, str, int, int, int]]:
    """OpenSearch ``_termvectors`` API, on-the-fly mode: per requested
    doc, its terms with tf and FIRST position (0-based) from a
    re-tokenization of ``_source`` — exactly what OpenSearch does when
    term vectors aren't stored at index time — plus each term's
    index-wide df when *term_statistics* (the API's
    ``term_statistics=true``).  Returns (doc_id, term, tf, first_pos,
    df) rows sorted by (doc_id, term); absent doc ids are skipped (the
    API returns found=false).

    Scale shape: the fetch is one k-doc-restricted scan of the source
    table (broadcastable ids, never a full scan); tokenization runs on
    the driver over k bounded texts; df lookups hit termstats
    bucket-pruned via term_stats.  Reference behavior: the sink's
    OpenSearch side serves _termvectors over indexed docs
    (OpenSearchSink.java index passthrough)."""
    from ..hashing import pmod, xxh64_signed
    from ..textproc import tokenize

    ids = [int(d) for d in doc_ids]
    if not ids:
        return []
    fetched = (
        source_df.filter(F.col(doc_id_col).isin(ids))
        .select(F.col(doc_id_col).alias("doc_id"), F.col(text_col))
        .collect()
    )
    texts = {int(r["doc_id"]): r[text_col] for r in fetched}
    per_doc: dict[int, dict[str, tuple[int, int]]] = {}
    vocab: set[str] = set()
    for d in ids:
        if d not in texts or d in per_doc:
            continue
        tfs: dict[str, tuple[int, int]] = {}
        for i, t in enumerate(tokenize(texts[d] or "")):
            n, first = tfs.get(t, (0, i))
            tfs[t] = (n + 1, first)
        per_doc[d] = tfs
        vocab |= set(tfs)
    dfs: dict[str, int] = {}
    if term_statistics and vocab:
        tid_by_term = {t: xxh64_signed(t) for t in vocab}
        tids = {tid: t for t, tid in tid_by_term.items()}
        buckets = sorted({pmod(i, searcher.cfg.n_buckets) for i in tids})
        stats = searcher.term_stats(tids, buckets)
        dfs = {t: int(stats.get(tid, 0)) for t, tid in tid_by_term.items()}
    out = []
    for d in sorted(per_doc):
        for t in sorted(per_doc[d]):
            n, first = per_doc[d][t]
            out.append((d, t, n, first, dfs.get(t, 0)))
    return out
