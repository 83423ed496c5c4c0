"""Pure-Python inverted index + textbook BM25 — the golden store.

Plays the role OpenSearch plays in the reference's e2e tests
(/root/reference/e2e-test/log/.../EndToEndBasicLogTest.java:47-90 asserts
document content against the live index): the Spark engine must produce
byte-identical extracted text per url and rank-identical top-k
(docIDs + scores, k1=1.2, b=0.75) against this oracle.

Identical constants and tie-breaking as the engine:
  idf  = ln(1 + (N - df + 0.5) / (df + 0.5))        (Lucene-style)
  score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  order = (score DESC, doc_id ASC), query terms deduped and processed
  in sorted order so float accumulation order is fixed.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd

from .hashing import xxh64_signed
from .textproc import extract_text, tokenize

K1 = 1.2
B = 0.75


@dataclass
class OracleIndex:
    k1: float = K1
    b: float = B
    lang: str = "en"
    n_docs: int = 0
    total_tokens: int = 0
    avgdl: float = 0.0
    postings: dict = field(default_factory=dict)   # term -> {doc_id: tf}
    doc_len: dict = field(default_factory=dict)    # doc_id -> dl
    doc_url: dict = field(default_factory=dict)    # doc_id -> url
    extracted: dict = field(default_factory=dict)  # url -> extracted text

    def build(self, pages: pd.DataFrame) -> "OracleIndex":
        for row in pages.itertuples(index=False):
            text = extract_text(row.html)
            self.extracted[row.url] = text
            if row.lang != self.lang:
                continue  # route semantics: non-lang rows excluded from index
            doc_id = xxh64_signed(row.url)
            toks = tokenize(text)
            self.doc_len[doc_id] = len(toks)
            self.doc_url[doc_id] = row.url
            self.n_docs += 1
            self.total_tokens += len(toks)
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            for t, tf in counts.items():
                self.postings.setdefault(t, {})[doc_id] = tf
        self.avgdl = self.total_tokens / self.n_docs if self.n_docs else 0.0
        return self

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        if df == 0:
            return 0.0
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def topk(self, query_text: str, k: int) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize(query_text)))
        scores: dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf = self.idf(t)
            for doc_id, tf in plist.items():
                dl = self.doc_len[doc_id]
                denom = tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * tf * (self.k1 + 1.0) / denom
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
