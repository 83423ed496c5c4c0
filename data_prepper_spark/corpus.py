"""Deterministic Common-Crawl-style webtext corpus (FIXTURES.md F1/F2).

Schema (BASELINE.json input_hint):
  url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING

Every row is a pure function of its doc index *i* (per-doc counter-based RNG
``default_rng([SEED, i])``), so generation is identical whether it runs on
the driver (oracle/tests) or sharded across Spark partitions (bench) — and
identical across reruns, which the resume/ledger tests rely on.

Reference analog: the synthetic log-generator source
(/root/reference/data-prepper-plugins/log-generator-source/.../LogGeneratorSource.java:26)
and the Gatling fixed request bodies (performance-test/.../Chain.java:20-26).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 5000
MIN_LEN, MAX_LEN = 20, 400
ZIPF_S = 1.07

HEAD_TERMS = ["the", "of", "and", "to", "a", "in", "is", "it", "for", "on"]
MID_TERMS = ["spark", "index", "search", "data", "web", "page", "query", "engine"]
RARE_TERMS = ["zanzibar", "quixote", "melange", "abyssal", "farolito"]
ABSENT_TERM = "qqqabsentterm"  # guaranteed not in the vocabulary
_CATS = ["news", "blog", "docs", "shop", "wiki", "forum", "code", "media"]

_MID_RANK = 100
_RARE_RANK = 4000


def _build_vocab() -> np.ndarray:
    vocab = [f"tok{i:04d}" for i in range(VOCAB_SIZE)]
    for r, t in enumerate(HEAD_TERMS):
        vocab[r] = t
    for j, t in enumerate(MID_TERMS):
        vocab[_MID_RANK + j] = t
    for j, t in enumerate(RARE_TERMS):
        vocab[_RARE_RANK + j] = t
    return np.asarray(vocab, dtype=object)


VOCAB = _build_vocab()
_weights = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_S)
_CDF = np.cumsum(_weights / _weights.sum())
_CDF[-1] = 1.0


def gen_pages(indices: np.ndarray) -> pd.DataFrame:
    """Generate webtext rows for the given doc indices (vectorized per doc)."""
    indices = np.asarray(indices, dtype=np.int64)
    urls, htmls, texts, langs = [], [], [], []
    rare0 = _RARE_RANK
    for i in indices.tolist():
        rng = np.random.default_rng([SEED, i])
        n = int(rng.integers(MIN_LEN, MAX_LEN + 1))
        ids = np.searchsorted(_CDF, rng.random(n), side="right")
        if i % 97 == 0:  # head-term skew docs: very high tf of "the"
            ids = np.concatenate([ids, np.zeros(int(rng.integers(80, 301)), dtype=ids.dtype)])
        if i % 101 == 7:  # pinned docs carrying the rare reference query terms
            extra = [rare0, rare0 + 1] + [rare0] * (i % 3)
            ids = np.concatenate([ids, np.asarray(extra, dtype=ids.dtype)])
        toks = VOCAB[ids]
        text = " ".join(toks.tolist())
        title = " ".join(toks[:3].tolist())
        m = i % 20
        lang = "en" if m < 18 else ("de" if m == 18 else "fr")
        url = f"https://site{i % 1000}.example/{_CATS[i % 8]}/{i}"
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>{text}</p></body></html>"
        ).encode("utf-8")
        urls.append(url)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
    warc_ts = pd.to_datetime("2025-01-01") + pd.to_timedelta(indices, unit="s")
    return pd.DataFrame(
        {
            "url": pd.Series(urls, dtype="object"),
            "warc_ts": warc_ts,
            "html": pd.Series(htmls, dtype="object"),
            "text": pd.Series(texts, dtype="object"),
            "lang": pd.Series(langs, dtype="object"),
        }
    )


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def generate_corpus(spark, path: str, n_docs: int, partitions: int = 32) -> None:
    """Distributed deterministic corpus write (parquet, Iceberg-shaped)."""

    def gen(batches):
        for b in batches:
            yield gen_pages(b["id"].to_numpy())

    (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
        .write.mode("overwrite")
        .parquet(path)
    )


def gen_pages_local(n_docs: int) -> pd.DataFrame:
    """Driver-side generation for unit tests and the oracle."""
    return gen_pages(np.arange(n_docs))


def reference_queries() -> list[dict]:
    """The 50-query reference set (FIXTURES.md F2), deterministic."""
    qs: list[str] = []
    qs += [t for t in RARE_TERMS]                       # single rare
    qs += [t for t in HEAD_TERMS[:5]]                   # single head
    qs += [t for t in MID_TERMS[:5]]                    # single mid
    qs += [ABSENT_TERM, f"{ABSENT_TERM} zanzibar"]      # absent / absent+rare
    qs += [f"{r} {h}" for r, h in zip(RARE_TERMS, HEAD_TERMS)]          # rare+head
    qs += [f"{m} {h}" for m, h in zip(MID_TERMS, HEAD_TERMS)]           # mid+head
    qs += [f"{HEAD_TERMS[i]} {HEAD_TERMS[i+1]}" for i in range(0, 8, 2)]  # all-head pairs
    qs += [f"{MID_TERMS[i]} {MID_TERMS[i+1]} {HEAD_TERMS[i]}" for i in range(4)]
    qs += [f"{RARE_TERMS[i % 5]} {MID_TERMS[i]} {HEAD_TERMS[i]} {HEAD_TERMS[i+1]}" for i in range(4)]
    qs += ["spark index", "web search engine", "data query", "the of and to"]
    qs += ["zanzibar quixote melange", "tok0042", "tok0042 tok0043 the"]
    while len(qs) < 50:
        qs.append(f"tok{(len(qs) * 13) % 200:04d} {HEAD_TERMS[len(qs) % 10]}")
    out = []
    for qid, q in enumerate(qs[:50]):
        k = 10
        if qid % 17 == 3:
            k = 1
        elif qid % 13 == 5:
            k = 100
        out.append({"query_id": qid, "query_text": q, "k": k})
    return out
