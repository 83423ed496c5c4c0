"""Search-relevance evaluation — OpenSearch's _rank_eval API.

Given rated (query, relevant-docs) pairs, score how well the engine's
ranking retrieves them: precision@k, recall@k, and MRR per request plus
micro-averaged totals — the regression harness search teams run against
golden judgments.  All metrics are emitted as EXACT scaled integers
(⌊x·10⁶⌋, truncating division on both engine and SQL sides) so the
oracle contract has no float anywhere; DCG/NDCG (the one inherently
float metric) is intentionally absent — the exact trio covers the
regression-gate use case.

Reference anchor: search UX (including evaluation) is delegated to
OpenSearch by the reference (opensearch sink); RankEvalRequest is part
of that serving surface.
"""

from __future__ import annotations


def rank_eval_metrics(ranked_ids, relevant, k: int) -> dict:
    """Metrics for ONE request from an already-ranked id list and the
    judged-relevant set: hits/precision/recall at *k* and the reciprocal
    rank of the first relevant hit."""
    top = list(ranked_ids)[:k]
    rel = set(relevant)
    hits = sum(1 for d in top if d in rel)
    first = next((i for i, d in enumerate(top, 1) if d in rel), None)
    return {
        "k": k,
        "n_relevant": len(rel),
        "hits": hits,
        "precision_e6": hits * 1_000_000 // k,
        "recall_e6": (hits * 1_000_000 // len(rel)) if rel else None,
        "first_rank": first,
        "mrr_e6": (1_000_000 // first) if first else 0,
    }


def rank_eval(
    searcher, requests, relevant_by_request, k: int = 10,
    distributed: bool = False, tie_round: int | None = None,
) -> list[tuple[int, dict]]:
    """Evaluate the engine's BM25 ranking against judgments:
    *requests* is [(request_id, query_text)], *relevant_by_request*
    maps request_id → iterable of judged-relevant doc_ids.  Returns
    (request_id, metrics) rows in request order.  Each request is one
    ordinary top-k search — the evaluation adds no new distributed
    machinery, by design."""
    out = []
    for rid, qtext in requests:
        hits = searcher.search(
            qtext, k=k, distributed=distributed, tie_round=tie_round)
        out.append((rid, rank_eval_metrics(
            [d for d, _ in hits], relevant_by_request.get(rid, ()), k)))
    return out
