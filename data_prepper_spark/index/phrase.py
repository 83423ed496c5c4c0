"""Exact phrase queries over a POSITIONAL index (cfg.positions=True).

Classic positional-postings phrase match: for phrase terms t0..t(m-1),
doc d matches with tf_phrase = |{p : p ∈ P(t0,d), p+j ∈ P(tj,d) ∀j}|,
scored with BM25 where tf is the phrase occurrence count and df is the
number of matching docs (Lucene's PhraseQuery semantics).

Execution is the engine's standard scale shape:
  - partition pruning to the phrase terms' term_bucket dirs;
  - per docID-range applyInPandas kernel — positional decode + adjacency
    intersections stay local to a range, so no term's full posting list
    is ever materialized on one node (same story as distributed BM25);
  - the per-range output is only matching (doc_id, tf_phrase, dl) rows —
    tiny — so the global df count + final top-k run over the match set,
    not the posting lists.

Phrase df/idf need the GLOBAL match count, which no per-range kernel
knows — hence the two-pass shape (count matches, then score with the idf
constant folded into a Catalyst expression).  The intermediate is
localCheckpointed so the two passes share one scan.

Reference anchor: the reference routes full-text queries to OpenSearch/
Lucene (opensearch sink, SURVEY §2.10); PhraseQuery is the Lucene
behavior being recast.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..hashing import pmod, xxh64_signed
from ..textproc import tokenize
from .codec import decode_docids, decode_uints

_POS_COLS = ["term_id", "df_slice", "doc_ids", "tfs", "dls", "positions"]


def _range_kernel(term_seq: list[int]):
    """applyInPandas kernel over one docID-range's slices for the phrase
    terms: decode positions, intersect adjacency, emit matching docs."""
    uniq = sorted(set(term_seq))

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # per term: doc -> (positions array, dl); merged indexes may carry
        # several slices per (term, range) — disjoint docs, so dict update
        # is safe
        per_term: dict[int, dict[int, np.ndarray]] = {t: {} for t in uniq}
        dls: dict[int, int] = {}
        for row in pdf.to_dict("records"):
            tid = int(row["term_id"])
            d = decode_docids(bytes(row["doc_ids"]))
            tf = decode_uints(bytes(row["tfs"]))
            dl = decode_uints(bytes(row["dls"]))
            pos_deltas = decode_uints(bytes(row["positions"]))
            offs = np.concatenate(([0], np.cumsum(tf.astype(np.int64))))
            m = per_term[tid]
            for i in range(d.size):
                pd_i = pos_deltas[offs[i] : offs[i + 1]]
                m[int(d[i])] = np.cumsum(pd_i)
                dls[int(d[i])] = int(dl[i])
        # docs present for every phrase term
        common = None
        for t in term_seq:
            keys = per_term[t].keys()
            common = keys if common is None else (common & keys)
            if not common:
                return pd.DataFrame(
                    {"doc_id": [], "tf_phrase": [], "dl": []}
                ).astype({"doc_id": "int64", "tf_phrase": "int64", "dl": "int64"})
        out_d, out_tf, out_dl = [], [], []
        for doc in common:
            matches = per_term[term_seq[0]][doc]
            for j in range(1, len(term_seq)):
                matches = np.intersect1d(
                    matches, per_term[term_seq[j]][doc] - j, assume_unique=True
                )
                if matches.size == 0:
                    break
            if matches.size:
                out_d.append(doc)
                out_tf.append(int(matches.size))
                out_dl.append(dls[doc])
        return pd.DataFrame(
            {"doc_id": out_d, "tf_phrase": out_tf, "dl": out_dl}
        ).astype({"doc_id": "int64", "tf_phrase": "int64", "dl": "int64"})

    return fn


def phrase_topk(
    searcher,
    phrase_text: str,
    k: int = 10,
    tie_round: int = 4,
) -> list[tuple[int, float]]:
    """Top-k (doc_id, bm25_phrase_score) for an exact phrase, global
    rank by (round(score, tie_round) DESC, doc_id ASC) — the SQL oracle's
    tie rule.  *searcher* is a BM25Searcher over a positional index."""
    if not searcher.stats.get("positions"):
        raise ValueError(
            "phrase queries need a positional index (IndexConfig.positions=True)"
        )
    terms = tokenize(phrase_text)
    if not terms:
        return []
    ids = {xxh64_signed(t): t for t in set(terms)}
    buckets = sorted({pmod(i, searcher.cfg.n_buckets) for i in ids})
    term_seq = [xxh64_signed(t) for t in terms]
    slices = (
        searcher.spark.read.parquet(f"{searcher.index_dir}/postings")
        .filter(
            F.col("term_bucket").isin(buckets)
            & F.col("term_id").isin(list(ids))
        )
        .select("range_id", *_POS_COLS)
    )
    matched = (
        slices.groupBy("range_id")
        .applyInPandas(_range_kernel(term_seq), schema="doc_id long, tf_phrase long, dl long")
        .localCheckpoint()  # two passes (df count + top-k) share one scan
    )
    df_p = matched.count()
    if df_p == 0:
        return []
    n, avgdl, k1, b = searcher.n_docs, searcher.avgdl, searcher.cfg.k1, searcher.cfg.b
    idf = math.log(1.0 + (n - df_p + 0.5) / (df_p + 0.5))
    score = (
        F.lit(idf)
        * F.col("tf_phrase") * F.lit(k1 + 1.0)
        / (F.col("tf_phrase") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)))
    )
    out = (
        matched.withColumn("score", score)
        .orderBy(F.round(F.col("score"), tie_round).desc(), F.asc("doc_id"))
        .limit(k)
        .collect()
    )
    return [(int(r["doc_id"]), float(r["score"])) for r in out]
