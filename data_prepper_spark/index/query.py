"""Stage 5 — BM25 top-k query path (block-max WAND over pruned segments).

Data Prepper analog: the opensearch *source*'s "read an index back"
lifecycle (/root/reference/data-prepper-plugins/opensearch-source/.../
OpenSearchIndexPartitionCreationSupplier.java — partition per index, then
paged reads), inverted: we read only the term-hash buckets of the query's
terms (partition pruning on `term_bucket`), decode posting slices in
numpy, and run the exact block-max top-k.

Two execution modes:
  driver      — read ONLY the pruned term_bucket partition directories
                with pyarrow (no Spark job: a query-serving layer reads
                index segments directly, the way the reference's
                opensearch sink serves queries without the ingest
                pipeline) and score in-process; ~ms latency.
  distributed — groupBy(range_id).applyInPandas local top-k per docID
                range, then a global orderBy(score DESC, doc_id ASC).limit(k);
                this is the 10^12-doc path: no term's full posting list is
                ever materialized on one node.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..hashing import pmod, xxh64_signed
from ..textproc import tokenize
from .config import IndexConfig
from .deletes import mask_term_slice, read_tombstones
from .scoring import (
    TermSlice,
    decode_slice,
    decode_slice_lazy,
    idf_value,
    score_bmw,
    score_bmw_lazy,
    score_brute,
    topk_select,
)

_SLICE_COLS = [
    "term_id", "range_id", "df_slice", "doc_ids", "tfs", "dls",
    "block_firsts", "block_ubs",
]
# the match-union projection (filtered._UNION_COLS) — the only narrow
# read shape the decoded-union cache admits
_UNION_COL_SET = {"term_id", "range_id", "df_slice", "doc_ids"}


class BM25Searcher:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.stats = (
            pads.dataset(f"{index_dir}/stats").to_table().to_pylist()[0]
        )
        self.cfg = IndexConfig.from_dict(self.stats)
        self.n_docs = int(self.stats["n_docs"])
        self.avgdl = float(self.stats["avgdl"])
        # multi-field index: per-field stats — Lucene's docCount and
        # avgFieldLength (derived from the stored additive sums, which is
        # what lets segment merges combine them exactly); empty for
        # single-field indexes
        import json as _json

        fj = self.stats.get("fields_json")
        self.field_stats: dict = _json.loads(fj) if fj else {}
        for fs in self.field_stats.values():
            fs["avgdl"] = (
                fs["total_tokens"] / fs["n_docs"] if fs["n_docs"] else 0.0
            )
        # indexes written before IndexConfig.codec carry raw (untagged)
        # varint streams — detect from stats so they decode correctly
        self.legacy_codec = "codec" not in self.stats
        # liveDocs mask (index/deletes.py): tombstoned docs are filtered
        # from every result; corpus stats stay full-index until a purge —
        # Lucene's delete semantics.  Sorted int64, usually empty.
        self.deleted = read_tombstones(index_dir)
        # hive-partitioned segment datasets (term_bucket dirs); opening the
        # dataset only lists files — reads stay pruned per query
        self._postings = pads.dataset(f"{index_dir}/postings", partitioning="hive")
        self._termstats = pads.dataset(f"{index_dir}/termstats", partitioning="hive")
        # hot-posting cache (driver serving mode): term_id → its full
        # posting rows, LRU-evicted on a byte budget.  Queries share
        # terms heavily (head terms especially), and a searcher is a
        # SNAPSHOT of the index (stats/tombstones read once at open), so
        # caching rows — and, via the attached stream objects, their
        # decode memos — is exactly Lucene's hot-posting/OS-page-cache
        # behavior with no staleness surface.  DPS_POSTING_CACHE_MB=0
        # disables.
        import os as _os

        # default sized so a head-heavy prefix expansion's working set
        # (e.g. 90 head terms ≈ 30M postings ≈ 1 GB with decode memos at
        # 32 B/posting) stays resident — python-side numpy memory, not
        # JVM heap, on a driver that serves queries
        self.posting_cache_bytes = int(
            float(_os.environ.get("DPS_POSTING_CACHE_MB", "1536")) * 1e6
        )
        from collections import OrderedDict as _OD

        self._rows_cache: dict[int, tuple[list[dict], int]] = _OD()
        self._rows_cache_bytes = 0
        self._df_cache: dict[int, int] = {}
        # decoded docID-union cache: the match-union consumers
        # (aggregations, must_not, pure-should fallbacks) read docID
        # streams only, and the full-row cache deliberately never admits
        # narrow reads (a narrow row would poison later scoring reads) —
        # so a repeated aggregation re-decoded its head terms every
        # query.  This cache stores narrow rows with the raw docID
        # buffer REPLACED by the decoded absolute array (8 B/posting),
        # term-keyed, LRU on its own budget.  Same snapshot argument as
        # the posting cache: stats/tombstones are read once at open, so
        # there is no staleness surface.  DPS_UNION_CACHE_MB=0 disables.
        self.union_cache_bytes = int(
            float(_os.environ.get("DPS_UNION_CACHE_MB", "256")) * 1e6
        )
        self._union_cache: dict[int, tuple[list[dict], int]] = _OD()
        self._union_cache_bytes = 0

    # -------------------------------------------------------------- helpers
    def _terms_buckets(self, query_text: str) -> tuple[list[str], dict[int, str], list[int]]:
        """(sorted terms, term_id→term, pruned buckets).  term_id =
        xxhash64(term) is computed locally — queries never consult the
        term dictionary (pmod(term_id, B) is the bucket)."""
        terms = sorted(set(tokenize(query_text)))
        ids = {xxh64_signed(t): t for t in terms}
        buckets = sorted({pmod(i, self.cfg.n_buckets) for i in ids})
        return terms, ids, buckets

    def term_stats(self, ids: dict[int, str], buckets: list[int]) -> dict[int, int]:
        """df per query term_id, from the bucket-pruned termstats
        partitions (pyarrow direct read — partition pruning, no Spark
        job).  Memoized per searcher: the index is a snapshot, so a
        term's df never changes under an open searcher."""
        if not ids:
            return {}
        missing = [i for i in ids if i not in self._df_cache]
        if missing:
            from ..hashing import pmod as _pmod

            mb = sorted({_pmod(i, self.cfg.n_buckets) for i in missing})
            flt = pads.field("term_bucket").isin(mb) & pads.field(
                "term_id"
            ).isin(missing)
            tbl = self._termstats.to_table(columns=["term_id", "df"], filter=flt)
            got = dict(zip(tbl["term_id"].to_pylist(), tbl["df"].to_pylist()))
            for i in missing:
                self._df_cache[i] = got.get(i, 0)
        return {i: self._df_cache[i] for i in ids if self._df_cache[i] > 0}

    def _read_slice_rows(self, ids, buckets, columns) -> list[dict]:
        flt = pads.field("term_bucket").isin(buckets) & pads.field("term_id").isin(ids)
        return self._postings.to_table(
            columns=columns or _SLICE_COLS, filter=flt
        ).to_pylist()

    def _pruned_slice_rows(
        self, ids: list[int], buckets: list[int], columns: list[str] | None = None
    ) -> list[dict]:
        """Posting rows for *ids*, bucket-pruned, through the hot-posting
        cache.  Narrow-column requests (match-union paths read docID
        streams only) are served from cache when the term is already hot
        (full rows are a superset) but never populate it — caching a
        narrow row would poison later scoring reads."""
        if self.posting_cache_bytes <= 0:
            return self._read_slice_rows(ids, buckets, columns)
        out: list[dict] = []
        missing: list[int] = []
        for i in ids:
            ent = self._rows_cache.get(i)
            if ent is not None:
                self._rows_cache.move_to_end(i)
                out.extend(ent[0])
            else:
                missing.append(i)
        if not missing:
            return out
        mb = sorted({pmod(i, self.cfg.n_buckets) for i in missing})
        if columns is not None:
            if (
                set(columns) != _UNION_COL_SET
                or self.union_cache_bytes <= 0
            ):
                return out + self._read_slice_rows(missing, mb, columns)
            return out + self._union_rows(missing, mb, columns)
        rows = self._read_slice_rows(missing, mb, None)
        by_term: dict[int, list[dict]] = {i: [] for i in missing}
        for r in rows:
            by_term.setdefault(int(r["term_id"]), []).append(r)
        for i, rr in by_term.items():
            # budget = raw payload + decoded-memo worst case (3 int64
            # streams + the hot absolute-docID memo = 32 B/posting,
            # materialized only on dense/promoted access)
            nb = 512 + sum(
                len(r["doc_ids"]) + len(r["tfs"]) + len(r["dls"])
                + len(r["block_firsts"]) + len(r["block_ubs"])
                + 32 * int(r["df_slice"])
                for r in rr
            )
            self._rows_cache[i] = (rr, nb)
            self._rows_cache_bytes += nb
        while (
            self._rows_cache_bytes > self.posting_cache_bytes
            and self._rows_cache
        ):
            _, (_, nb) = self._rows_cache.popitem(last=False)
            self._rows_cache_bytes -= nb
        return out + rows

    def _union_rows(self, ids: list[int], buckets: list[int],
                    columns: list[str]) -> list[dict]:
        """Serve/populate the decoded docID-union cache for terms the
        full-row cache missed: each narrow row's raw docID buffer is
        decoded ONCE and stored as `_doc_abs` (which
        filtered._union_docids_rows consumes by preference)."""
        out: list[dict] = []
        still: list[int] = []
        for i in ids:
            ent = self._union_cache.get(i)
            if ent is not None:
                self._union_cache.move_to_end(i)
                out.extend(ent[0])
            else:
                still.append(i)
        if not still:
            return out
        from .codec import decode_docids, delta_decode_docids

        sb = sorted({pmod(i, self.cfg.n_buckets) for i in still})
        by_term: dict[int, list[dict]] = {i: [] for i in still}
        for r in self._read_slice_rows(still, sb, columns):
            buf = bytes(r.pop("doc_ids"))
            r["_doc_abs"] = (
                delta_decode_docids(buf) if self.legacy_codec
                else decode_docids(buf)
            )
            by_term.setdefault(int(r["term_id"]), []).append(r)
        for i, rr in by_term.items():
            nb = 256 + sum(8 * int(x["_doc_abs"].size) + 128 for x in rr)
            self._union_cache[i] = (rr, nb)
            self._union_cache_bytes += nb
            out.extend(rr)
        while (
            self._union_cache_bytes > self.union_cache_bytes
            and self._union_cache
        ):
            _, (_, nb) = self._union_cache.popitem(last=False)
            self._union_cache_bytes -= nb
        return out

    def _pruned_slices(
        self, ids: list[int], buckets: list[int], columns: list[str] | None = None
    ) -> DataFrame:
        """Spark-side pruned scan (distributed mode)."""
        return (
            self.spark.read.parquet(f"{self.index_dir}/postings")
            .filter(F.col("term_bucket").isin(buckets) & F.col("term_id").isin(ids))
            .select(*(columns or _SLICE_COLS))
        )

    # ---------------------------------------------------------------- search
    def search(
        self,
        query_text: str,
        k: int = 10,
        mode: str = "bmw",
        distributed: bool = False,
        tie_round: int | None = None,
    ) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), rank-identical to the oracle.

        ``tie_round`` (distributed brute mode only): rank globally by
        (round(score, tie_round) DESC, doc_id ASC) over ALL matches —
        the SQL oracle's exact tie rule, with no per-range exact-score
        truncation that could drop a rounded-tie winner."""
        _, ids, buckets = self._terms_buckets(query_text)
        dfs = self.term_stats(ids, buckets)
        ids = {i: t for i, t in ids.items() if dfs.get(i, 0) > 0}
        if not ids:
            return []
        idf = {i: idf_value(self.n_docs, dfs[i]) for i in ids}
        if distributed:
            return self._search_distributed(ids, buckets, idf, k, mode, tie_round)
        return self._score_pruned(ids, buckets, idf, k, mode, self.avgdl)

    def _score_pruned(
        self,
        ids: dict[int, str],
        buckets: list[int],
        idf: dict[int, float],
        k: int | None,
        mode: str,
        avgdl: float,
        ub_scale: float = 1.0,
        theta0: float = float("-inf"),
    ) -> list[tuple[int, float]]:
        """Driver-mode scoring core with EXTERNALLY supplied idf/avgdl —
        `search` passes this segment's own stats; a FamilySearcher
        (index/family.py) passes family-global stats (dfs/N/avgdl summed
        across period segments — Lucene's dfs_query_then_fetch).

        The stored block_ubs are avgdl-baked (index/merge.py
        recompute_ubs_fn), so a non-native avgdl invalidates them as-is;
        a caller overriding avgdl must either use mode="brute" or pass
        ``ub_scale = max(1, avgdl_override / self.avgdl)``: the BM25
        tf-normalization tf·(k1+1)/(tf + k1·(1−b+b·dl/A)) is monotone
        increasing in A and its ratio under A_g vs A_s is bounded above
        by A_g/A_s, so the inflated bound stays a true upper bound and
        BMW pruning stays exact (per-period family serving keeps WAND
        this way — the reference searches `my-index-*` with per-shard
        WAND intact, OpenSearchSink.java:144-150).  k=None returns every
        match (exact cross-segment rounding-tie merges)."""
        if k is None:
            mode = "brute"
        rows = self._pruned_slice_rows(list(ids), buckets)
        # block-lazy scoring (tagged varint OR pfor, non-legacy): decode
        # cost per query ∝ blocks of scored segments, not df — the
        # df-independent path a 10^12-doc index needs.  Falls back to
        # eager decode per row on unknown tags (decode_slice_lazy → None).
        # tombstones force the eager path: masking needs materialized
        # docID arrays (block metadata stays valid — masking only removes
        # postings, see deletes.mask_term_slice)
        # brute mode ALSO decodes via the lazy-stream objects: their
        # decode memos live on the cached posting rows, so a hot term
        # decodes once per searcher lifetime in either mode (the
        # to_term_slice conversion below is memo-backed slicing)
        lazy_ok = not self.legacy_codec and self.deleted.size == 0
        by_range: dict[int, list] = {}
        lazy_by_range: dict[int, bool] = {}
        for r in rows:
            rid = int(r["range_id"])
            s = (
                decode_slice_lazy(
                    r, idf[r["term_id"]], self.cfg.block_size, ids[r["term_id"]]
                )
                if lazy_ok
                else None
            )
            if s is None:
                s = decode_slice(
                    r, idf[r["term_id"]], label=ids[r["term_id"]],
                    legacy=self.legacy_codec,
                )
                if self.deleted.size:
                    s = mask_term_slice(s, self.deleted)
                lazy_by_range[rid] = False
            else:
                lazy_by_range.setdefault(rid, True)
            if ub_scale != 1.0 and mode == "bmw":
                # rebind, never mutate: lazy streams cache the stored ub
                # array across queries (scoring.py decode_slice_lazy).
                # float64 so the inflation never rounds below the true
                # bound (callers also add a relative epsilon).
                s.block_ubs = s.block_ubs.astype(np.float64) * ub_scale
            by_range.setdefault(rid, []).append(s)
        ids_all, sc_all = [], []
        # WAND across ranges: carry the running k-th-score threshold
        # between docID ranges (and, via theta0, between the segments of
        # an index family) — later ranges skip whole block segments the
        # earlier ranges already beat.  Exact: pruning is strict <.
        theta = theta0
        n_collected = 0
        for rid, slices in by_range.items():
            if mode == "bmw" and lazy_by_range.get(rid, False):
                ids, sc = score_bmw_lazy(slices, self.cfg.k1, self.cfg.b,
                                         avgdl, k, theta0=theta)
            elif mode == "bmw":
                slices = [
                    s.to_term_slice() if not isinstance(s, TermSlice) else s
                    for s in slices
                ]
                ids, sc = score_bmw(slices, self.cfg.k1, self.cfg.b, avgdl,
                                    k, theta0=theta)
            else:
                slices = [
                    s.to_term_slice() if not isinstance(s, TermSlice) else s
                    for s in slices
                ]
                ids, sc = score_brute(slices, self.cfg.k1, self.cfg.b, avgdl)
            ids_all.append(ids)
            sc_all.append(sc)
            if mode == "bmw" and k is not None:
                n_collected += sc.size
                if n_collected >= k:
                    allsc = np.concatenate(sc_all)
                    theta = max(
                        theta, -np.partition(-allsc, k - 1)[k - 1]
                    )
        if not ids_all:
            return []
        ids = np.concatenate(ids_all)
        sc = np.concatenate(sc_all)
        if k is not None:
            ids, sc = topk_select(ids, sc, k)
        return list(zip(ids.tolist(), sc.tolist()))

    def _search_distributed(
        self, labels, buckets, idf, k, mode, tie_round: int | None = None
    ) -> list[tuple[int, float]]:
        cfg, avgdl = self.cfg, self.avgdl
        legacy = self.legacy_codec
        deleted = self.deleted  # sorted int64, ships with the task closure

        def score_range(pdf: pd.DataFrame) -> pd.DataFrame:
            slices = [
                decode_slice(
                    row, idf[row["term_id"]], label=labels[row["term_id"]],
                    legacy=legacy,
                )
                for row in pdf.to_dict("records")
            ]
            if deleted.size:
                slices = [mask_term_slice(s, deleted) for s in slices]
            if mode == "bmw":
                ids, sc = score_bmw(slices, cfg.k1, cfg.b, avgdl, k)
            else:
                ids, sc = score_brute(slices, cfg.k1, cfg.b, avgdl)
                if tie_round is None:
                    ids, sc = topk_select(ids, sc, k)
                # tie_round: keep EVERY match — the global rounded-tie
                # rank must see all candidates (a docID-range holds its
                # full candidate set locally; only (doc, score) pairs
                # reach the global TakeOrdered)
            return pd.DataFrame({"doc_id": ids, "score": sc})

        scored = (
            self._pruned_slices(list(labels), buckets)
            .groupBy("range_id")
            .applyInPandas(score_range, schema="doc_id long, score double")
        )
        if tie_round is not None:
            ordered = scored.orderBy(
                F.round(F.col("score"), tie_round).desc(), F.asc("doc_id")
            )
        else:
            ordered = scored.orderBy(F.desc("score"), F.asc("doc_id"))
        out = ordered.limit(k).collect()
        return [(int(r["doc_id"]), float(r["score"])) for r in out]

    def search_all(self, query_text: str) -> list[tuple[int, float]]:
        """ALL matching (doc_id, exact float64 score) pairs, unranked —
        for callers that re-rank under their own tie rule (e.g. the
        round-then-rank contract of the SQL correctness oracle)."""
        _, ids, buckets = self._terms_buckets(query_text)
        dfs = self.term_stats(ids, buckets)
        ids = {i: t for i, t in ids.items() if dfs.get(i, 0) > 0}
        if not ids:
            return []
        idf = {i: idf_value(self.n_docs, dfs[i]) for i in ids}
        rows = self._pruned_slice_rows(list(ids), buckets)
        by_range: dict[int, list[TermSlice]] = {}
        for r in rows:
            s = decode_slice(
                r, idf[r["term_id"]], label=ids[r["term_id"]],
                legacy=self.legacy_codec,
            )
            if self.deleted.size:
                s = mask_term_slice(s, self.deleted)
            by_range.setdefault(int(r["range_id"]), []).append(s)
        out: list[tuple[int, float]] = []
        for slices in by_range.values():
            ids, sc = score_brute(slices, self.cfg.k1, self.cfg.b, self.avgdl)
            out.extend(zip(ids.tolist(), sc.tolist()))
        return out

    def urls_for(self, doc_ids: list[int]) -> dict[int, str]:
        """doc_id → url via the docID-range-sorted docmeta (file skipping)."""
        if not doc_ids:
            return {}
        rows = (
            self.spark.read.parquet(f"{self.index_dir}/docmeta")
            .filter(F.col("doc_id").isin(doc_ids))
            .select("doc_id", "url")
            .collect()
        )
        return {int(r["doc_id"]): r["url"] for r in rows}

    def search_df(self, query_text: str, k: int = 10, mode: str = "bmw") -> DataFrame:
        """Top-k as a DataFrame (query_text, rank, doc_id, url, bm25_score)."""
        hits = self.search(query_text, k=k, mode=mode)
        urls = self.urls_for([d for d, _ in hits])
        rows = [
            (query_text, i + 1, d, urls.get(d, ""), float(s))
            for i, (d, s) in enumerate(hits)
        ]
        return self.spark.createDataFrame(
            rows, "query_text string, rank int, doc_id long, url string, bm25_score double"
        )
