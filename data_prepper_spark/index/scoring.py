"""BM25 scoring kernels (numpy, shared by driver-side and distributed paths).

Two strategies over decoded posting slices of one docID range:

- ``score_brute``: exact term-at-a-time accumulation over the union of
  docIDs (the correctness anchor).
- ``score_bmw``: block-max pruning — segments the range at every term's
  block boundary, upper-bounds each segment by Σ idf·block_ub, processes
  segments in descending bound order and stops when the bound falls below
  the running top-k threshold. Exact top-k (prune is strict ``<`` so
  score ties, broken by doc_id ASC, are never lost).

Accumulation order is fixed (terms processed in sorted order, float64),
so scores are bit-reproducible and rank-identical to the pure-Python
oracle.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .codec import (
    _BIAS,
    _TAG_PFOR,
    _TAG_VARINT,
    decode_docids,
    decode_uints,
    delta_decode_docids,
    pfor_block_index,
    pfor_decode_indexed,
    pfor_decode_range,
    unpack_f32,
    unpack_i64,
    varint_decode,
    varint_decode_range,
    varint_value_ends,
)


class _VarintStream:
    """Random-access view of one tagged-varint value stream: a one-pass
    terminator scan (lazy) yields per-value byte offsets, then any value
    range decodes independently (LEB128 is self-delimiting)."""

    __slots__ = ("b", "_ends", "_all", "_gathered", "_abs")

    def __init__(self, payload: np.ndarray):
        self.b = payload
        self._ends = None
        self._all = None
        self._gathered = 0  # cumulative sub-dense gather work (hot promotion)
        self._abs = None    # doc streams only: memoized absolute docIDs

    def _e(self):
        if self._ends is None:
            self._ends = varint_value_ends(self.b)
        return self._ends

    def decode_range(self, a: int, z: int) -> np.ndarray:
        if self._all is not None:
            return self._all[a:z]
        return varint_decode_range(self.b, self._e(), a, z)

    def gather(self, runs: np.ndarray) -> np.ndarray:
        """Decode many value ranges with ONE varint pass: slice each
        run's byte range and decode the concatenation (per-call
        vectorized-decoder setup paid once, not once per skip-list
        run)."""
        if self._all is not None:
            return np.concatenate(
                [self._all[int(va) : int(vz)] for va, vz in runs]
            )
        ends = self._e()
        parts = []
        for va, vz in runs:
            b0 = 0 if va == 0 else int(ends[va - 1]) + 1
            parts.append(self.b[b0 : int(ends[vz - 1]) + 1])
        return varint_decode(np.concatenate(parts).tobytes())

    def decode_all(self) -> np.ndarray:
        """Full decode, memoized: posting-row caching (BM25Searcher)
        keeps stream objects alive across queries, so a hot term's stream
        decodes at most once per searcher."""
        if self._all is None:
            self._all = varint_decode(self.b.tobytes())
        return self._all


class _PForStream:
    """Random-access view of one tagged-PFor value stream: a one-pass
    header walk (lazy, no value decode) indexes the 128-value blocks,
    then any value range decodes by touching only its covering blocks —
    PFor values are positional (no intra-stream delta chain)."""

    __slots__ = ("b", "_offs", "_cum", "_all", "_gathered", "_abs")

    def __init__(self, payload: np.ndarray):
        self.b = payload
        self._offs = None
        self._cum = None
        self._all = None
        self._gathered = 0  # cumulative sub-dense gather work (hot promotion)
        self._abs = None    # doc streams only: memoized absolute docIDs

    def _idx(self):
        if self._offs is None:
            self._offs, self._cum = pfor_block_index(self.b)
        return self._offs, self._cum

    def decode_range(self, a: int, z: int) -> np.ndarray:
        if self._all is not None:
            return self._all[a:z]
        offs, cum = self._idx()
        return pfor_decode_range(self.b, offs, cum, a, z)

    def gather(self, runs: np.ndarray) -> np.ndarray:
        return np.concatenate(
            [self.decode_range(int(va), int(vz)) for va, vz in runs]
        )

    def decode_all(self) -> np.ndarray:
        """Full decode, memoized (see _VarintStream.decode_all)."""
        if self._all is None:
            offs, cum = self._idx()
            self._all = pfor_decode_indexed(self.b, offs, cum)
        return self._all


def stream_abs_docids(doc_s) -> np.ndarray:
    """Absolute docIDs of a docID delta stream, memoized on the stream.
    The delta stream's first value IS the biased absolute first docID
    (codec.delta_encode_docids stores it full-width), so one cumsum
    reconstructs the whole list; hot slices thereafter serve docID reads
    by pure slicing.  Shared by LazySlice block reads and the match-union
    paths (filtered/sorted/agg), so both memoize into the same array."""
    if doc_s._abs is None:
        vals = doc_s.decode_all()
        u = np.cumsum(vals, dtype=np.uint64)
        doc_s._abs = (u - _BIAS).astype(np.int64)
    return doc_s._abs


def _stream_for(raw: np.ndarray):
    """Tagged payload → stream object, or None for legacy/unknown tags."""
    if raw.size == 0:
        return _VarintStream(raw[1:])
    if raw[0] == _TAG_VARINT:
        return _VarintStream(raw[1:])
    if raw[0] == _TAG_PFOR:
        return _PForStream(raw[1:])
    return None


@dataclass
class TermSlice:
    """One (term, range) posting slice, decoded."""

    term: str
    idf: float
    doc_ids: np.ndarray     # int64, sorted
    tfs: np.ndarray         # int64
    dls: np.ndarray         # int64
    block_firsts: np.ndarray  # int64, doc_ids[::block_size]
    block_ubs: np.ndarray     # float32, per-block max of the tf-normalization
    avgdl: float | None = None  # per-slice override (multi-field: the term's
    #                             FIELD avgdl — Lucene's avgFieldLength)


def decode_slice(
    row, idf: float, label: str | None = None, legacy: bool = False
) -> TermSlice:
    """Decode a postings-slice row (Row / dict / namedtuple-like).

    ``label`` is the term STRING for this row's term_id — slices are
    processed in sorted-label order so float accumulation order matches
    the pure-Python oracle exactly (rank/bit identity).

    ``legacy=True`` reads the pre-tag-byte on-disk format (raw varint
    streams, indexes built before IndexConfig.codec existed) — the
    searcher detects the format from the stats table, so old segments
    never get mis-dispatched on their first payload byte."""
    get = row.__getitem__ if hasattr(row, "__getitem__") else getattr
    if legacy:
        doc_ids = delta_decode_docids(bytes(get("doc_ids")))
        tfs = varint_decode(bytes(get("tfs"))).astype(np.int64)
        dls = varint_decode(bytes(get("dls"))).astype(np.int64)
    else:
        doc_ids = decode_docids(bytes(get("doc_ids")))
        tfs = decode_uints(bytes(get("tfs"))).astype(np.int64)
        dls = decode_uints(bytes(get("dls"))).astype(np.int64)
    return TermSlice(
        term=label if label is not None else str(get("term_id")),
        idf=idf,
        doc_ids=doc_ids,
        tfs=tfs,
        dls=dls,
        block_firsts=unpack_i64(bytes(get("block_firsts"))),
        block_ubs=unpack_f32(bytes(get("block_ubs"))),
    )


class LazySlice:
    """Block-lazy posting slice: holds the RAW tagged streams and decodes
    only the value ranges BMW actually scores.

    Why it exists: eager ``decode_slice`` pays ~10 vectorized passes per
    stream over the FULL posting list of every query term — at 10M docs a
    stopword's slices dominate query latency even though block-max pruning
    scores only a handful of segments.  Properties of the on-disk formats
    make lazy reads free of any format change:

    - LEB128 is self-delimiting, so ONE terminator-scan pass
      (:func:`codec.varint_value_ends`) yields per-value byte offsets and
      any value range decodes independently; PFor values are positional
      (frame-of-reference + patches) so one header-walk pass
      (:func:`codec.pfor_block_index`) makes any range block-addressable;
    - ``block_firsts[j]`` stores block *j*'s first docID uncompressed, so
      a block-aligned range re-anchors the delta chain without decoding
      anything before it (the range's first delta is discarded in favor of
      the stored absolute value — same reconstruction, no prefix scan).

    Decode cost is then ∝ blocks-touched-by-scored-segments, not df —
    the property that holds at 10^12 docs.  Scores are bit-identical to
    the eager path: identical tf/dl/idf values feed the same
    ``score_brute`` accumulation in the same sorted-term order.
    """

    __slots__ = (
        "term", "idf", "n", "block_size", "doc_s", "tf_s", "dl_s",
        "block_firsts", "block_ubs", "_last_doc",
    )

    def __init__(self, term, idf, n, block_size, doc_s, tf_s, dl_s,
                 block_firsts, block_ubs):
        self.term = term
        self.idf = idf
        self.n = n
        self.block_size = block_size
        self.doc_s = doc_s          # _VarintStream | _PForStream
        self.tf_s = tf_s
        self.dl_s = dl_s
        self.block_firsts = block_firsts
        self.block_ubs = block_ubs
        self._last_doc = None

    def _abs_full(self) -> np.ndarray:
        """Full absolute-docID array, memoized on the doc stream once it
        is promoted to a full decode — hot slices then serve every later
        block read by pure slicing (no per-query segmented cumsum).
        Values are bit-identical to the per-run reconstruction: the build
        stores block_firsts = doc_ids[::block_size], so anchoring each
        run at its block's stored absolute equals the cumsum from the
        stream start."""
        return stream_abs_docids(self.doc_s)

    def _ids_range(self, va: int, vz: int) -> np.ndarray:
        """Absolute docIDs for value range [va, vz); va MUST be a block
        start (its stored delta is replaced by block_firsts' absolute)."""
        if self.doc_s._abs is not None:
            return self.doc_s._abs[va:vz]
        vals = self.doc_s.decode_range(va, vz)
        # biased docID of the block's first posting (exact modular wrap)
        first_u = np.uint64(
            (int(self.block_firsts[va // self.block_size]) + (1 << 63)) & ((1 << 64) - 1)
        )
        u = np.empty(vals.size, dtype=np.uint64)
        u[0] = first_u
        np.cumsum(vals[1:], dtype=np.uint64, out=u[1:])
        u[1:] += first_u
        return (u - _BIAS).astype(np.int64)

    def last_doc(self) -> int:
        if self._last_doc is None:
            va = (self.block_firsts.size - 1) * self.block_size
            self._last_doc = int(self._ids_range(va, self.n)[-1])
        return self._last_doc

    def segment_values(self, lo: int, hi: int):
        """(doc_ids, tfs, dls) for postings with lo <= docID < hi —
        decodes only the covering blocks of each stream."""
        bs = self.block_size
        lo_b = int(np.searchsorted(self.block_firsts, lo, side="right")) - 1
        if lo_b < 0:
            lo_b = 0
        hi_b = int(np.searchsorted(self.block_firsts, hi, side="left"))
        va, vz = lo_b * bs, min(hi_b * bs, self.n)
        if vz <= va:
            return (np.empty(0, np.int64),) * 3
        ids = self._ids_range(va, vz)
        a = int(np.searchsorted(ids, lo, side="left"))
        z = int(np.searchsorted(ids, hi, side="left"))
        if z <= a:
            return (np.empty(0, np.int64),) * 3
        tfs = self.tf_s.decode_range(va + a, va + z).astype(np.int64)
        dls = self.dl_s.decode_range(va + a, va + z).astype(np.int64)
        return ids[a:z], tfs, dls

    def covering_blocks(self, cand: np.ndarray) -> np.ndarray:
        """Sorted unique block indices whose docID span may contain any of
        the sorted candidate docIDs *cand* — the skip-pointer lookup: a
        candidate can only live in the block whose first docID is the
        greatest ≤ it."""
        blk = np.searchsorted(self.block_firsts, cand, side="right") - 1
        return np.unique(blk[blk >= 0])

    def _block_runs(self, blocks: np.ndarray):
        """Sorted block indices → (va, vz) value-range array of their
        maximal contiguous runs, shape (n_runs, 2)."""
        bs = self.block_size
        splits = np.flatnonzero(np.diff(blocks) > 1) + 1
        starts = np.concatenate(([0], splits))
        ends = np.concatenate((splits, [blocks.size]))
        va = blocks[starts] * bs
        vz = np.minimum((blocks[ends - 1] + 1) * bs, self.n)
        return np.stack([va, vz], axis=1)

    def _gather_decode(self, stream, runs):
        """Decode many value ranges via the stream's batched gather —
        ONE vectorized pass for varint (byte-slice concatenation: LEB128
        is self-delimiting), covering-blocks-only for PFor.  Returns
        (values, per-run counts, per-run value starts).

        DENSE gathers (≥ half the stream — e.g. a stopword slice whose
        covering blocks are effectively all of them) go through the
        stream's memoized decode_all instead: same values, and with
        posting-row caching a hot term's stream decodes once per searcher
        lifetime rather than once per query.

        HOT promotion (amortized-2×): sub-dense gathers accumulate a
        per-stream work counter; once cumulative gathered values reach
        the stream length, later gathers also switch to the memoized
        full decode — a head term repeatedly probed by conjunctive
        queries decodes once per searcher lifetime instead of ~40% of
        itself per query.  Wasted work before promotion is < one full
        decode; memory is exactly the decoded-memo worst case the
        posting-cache budget already charges (24 B/posting)."""
        counts = (runs[:, 1] - runs[:, 0]).astype(np.int64)
        total = int(counts.sum())
        if 2 * total >= self.n or stream._gathered + total >= self.n:
            full = stream.decode_all()
            vals = (
                full
                if runs.shape[0] == 1 and total == self.n
                else np.concatenate(
                    [full[int(va) : int(vz)] for va, vz in runs]
                )
            )
        else:
            stream._gathered += total
            vals = stream.gather(runs)
        starts = np.concatenate(([0], np.cumsum(counts[:-1])))
        return vals, counts, starts

    def _anchored_ids(self, vals, counts, starts, runs):
        """Delta stream of many block-aligned runs → absolute docIDs via
        a segmented cumsum: each run's first delta is discarded in favor
        of its block's stored absolute first docID (uint64 modular
        arithmetic — bit-identical to the one-run `_ids_range`)."""
        anchors = (
            self.block_firsts[runs[:, 0] // self.block_size].astype(np.uint64)
            + np.uint64(1 << 63)
        )
        d = vals.copy()
        d[starts] = 0
        c = np.cumsum(d, dtype=np.uint64)
        off = anchors - c[starts]
        abs_u = c + np.repeat(off, counts)
        return (abs_u - _BIAS).astype(np.int64)

    def block_docids(self, blocks: np.ndarray) -> np.ndarray:
        """Absolute docIDs of the given sorted block indices only —
        single gathered decode of exactly those blocks' byte ranges.  The
        conjunctive-query analog of BMW's segment decode: cost ∝ blocks
        visited, not df."""
        if blocks.size == 0:
            return np.empty(0, dtype=np.int64)
        runs = self._block_runs(blocks)
        return self._run_ids(runs)

    def _run_ids(self, runs: np.ndarray) -> np.ndarray:
        """Absolute docIDs of the given value-range runs — sliced from
        the memoized absolute array when the doc stream is hot, else the
        gather + segmented-cumsum reconstruction (identical values)."""
        if self.doc_s._all is not None:
            a = self._abs_full()
            if runs.shape[0] == 1:
                return a[int(runs[0, 0]) : int(runs[0, 1])]
            return np.concatenate(
                [a[int(va) : int(vz)] for va, vz in runs]
            )
        vals, counts, starts = self._gather_decode(self.doc_s, runs)
        return self._anchored_ids(vals, counts, starts, runs)

    def block_values(self, blocks: np.ndarray):
        """(doc_ids, tfs, dls) of the given sorted block indices —
        one gathered decode per stream."""
        if blocks.size == 0:
            return (np.empty(0, np.int64),) * 3
        runs = self._block_runs(blocks)
        ids = self._run_ids(runs)
        tfs, _, _ = self._gather_decode(self.tf_s, runs)
        dls, _, _ = self._gather_decode(self.dl_s, runs)
        return ids, tfs.astype(np.int64), dls.astype(np.int64)

    def to_term_slice(self) -> TermSlice:
        """Full eager decode (brute-fallback path) — memo-backed: the
        docID cumsum and value decodes live on the streams (cached
        posting rows keep them across queries), so a hot slice converts
        by reference.  The int64 views share the memo buffers; every
        consumer treats TermSlice arrays as read-only (masking/filtering
        index into fresh arrays)."""
        return TermSlice(
            term=self.term,
            idf=self.idf,
            doc_ids=stream_abs_docids(self.doc_s),
            tfs=self.tf_s.decode_all().view(np.int64),
            dls=self.dl_s.decode_all().view(np.int64),
            block_firsts=self.block_firsts,
            block_ubs=self.block_ubs,
        )


def decode_slice_lazy(row, idf: float, block_size: int, label: str) -> LazySlice | None:
    """LazySlice from a postings row, or None if any stream carries an
    unknown tag (legacy untagged indexes take the eager path).  Both
    tagged codecs are range-addressable — varint via the terminator-scan
    value index, PFor via the block header index — and may mix per stream
    (merged mixed-codec indexes)."""
    # stream objects (and their decode memos) attach to the row dict, so
    # a cached posting row (BM25Searcher._pruned_slice_rows) re-serves
    # later queries without re-indexing or re-decoding; the LazySlice
    # itself is rebuilt per query because idf may carry a query boost
    if isinstance(row, dict):
        hit = row.get("_lazy_streams")
        if hit is not None:
            doc_s, tf_s, dl_s, n, bf, ub = hit
            return LazySlice(
                term=label, idf=idf, n=n, block_size=block_size,
                doc_s=doc_s, tf_s=tf_s, dl_s=dl_s,
                block_firsts=bf, block_ubs=ub,
            )
    get = row.__getitem__ if hasattr(row, "__getitem__") else getattr
    streams = []
    for c in ("doc_ids", "tfs", "dls"):
        s = _stream_for(np.frombuffer(bytes(get(c)), dtype=np.uint8))
        if s is None:
            return None
        streams.append(s)
    n = int(get("df_slice"))
    bf = unpack_i64(bytes(get("block_firsts")))
    ub = unpack_f32(bytes(get("block_ubs")))
    if isinstance(row, dict):
        row["_lazy_streams"] = (streams[0], streams[1], streams[2], n, bf, ub)
    return LazySlice(
        term=label,
        idf=idf,
        n=n,
        block_size=block_size,
        doc_s=streams[0],
        tf_s=streams[1],
        dl_s=streams[2],
        block_firsts=bf,
        block_ubs=ub,
    )


def _member_sorted(ids: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    """Mask over *ids*: membership in the sorted array *sorted_set*."""
    if sorted_set.size == 0:
        return np.zeros(ids.shape, dtype=bool)
    loc = np.clip(np.searchsorted(sorted_set, ids), 0, sorted_set.size - 1)
    return sorted_set[loc] == ids


# Pruning-convergence guard for both BMW kernels: after this many scored
# segments without the threshold beating the remaining upper bounds, the
# kernel concedes and finishes with one exact brute pass (decode memos make
# the concession cheap for hot slices).  Tunable for measurement.
BMW_MAX_SEG = 16


def score_bmw_lazy(
    slices: list[LazySlice], k1: float, b: float, avgdl: float, k: int,
    allowed: np.ndarray | None = None,
    theta0: float = -np.inf,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max top-k over one docID range, block-lazy decode.  Identical
    output to :func:`score_bmw` on the same slices (same segment grid,
    same upper bounds, same exact scoring — only the decode strategy
    differs); pinned by tests/test_index_build.py::test_lazy_bmw_identity.

    ``allowed`` (sorted docIDs) is Lucene's filter-during-WAND: only
    allowed docs are scored/collected, segments still prune on the
    UNFILTERED upper bounds (still valid upper bounds for any allowed
    doc, so the top-k stays exact) — the right strategy for a BROAD
    filter, where candidate-driven decode degenerates to a full decode
    but score pruning still skips most segments."""
    slices = [s for s in slices if s.n]
    if not slices:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    slices = sorted(slices, key=lambda s: s.term)
    bounds = np.unique(np.concatenate([s.block_firsts for s in slices]))
    n_seg = bounds.size
    seg_ub = np.zeros(n_seg, dtype=np.float64)
    for s in slices:
        blk = np.searchsorted(s.block_firsts, bounds, side="right") - 1
        valid = blk >= 0
        valid &= bounds <= s.last_doc()
        contrib = np.zeros(n_seg, dtype=np.float64)
        contrib[valid] = s.idf * s.block_ubs[blk[valid]].astype(np.float64)
        seg_ub += contrib
    seg_order = np.argsort(-seg_ub, kind="stable")

    got_ids: list[np.ndarray] = []
    got_scores: list[np.ndarray] = []
    n_got = 0
    theta = theta0
    seg_end = np.append(bounds[1:], np.iinfo(np.int64).max)
    MAX_SEG = BMW_MAX_SEG  # pruning-convergence guard (see score_bmw)
    for n_seen, si in enumerate(seg_order):
        if seg_ub[si] < theta:
            break
        if n_seen >= MAX_SEG:
            full = [s.to_term_slice() for s in slices]
            if allowed is not None:
                masked = []
                for s in full:
                    keep = _member_sorted(s.doc_ids, allowed)
                    if keep.any():
                        masked.append(
                            TermSlice(
                                s.term, s.idf, s.doc_ids[keep], s.tfs[keep],
                                s.dls[keep], s.block_firsts, s.block_ubs,
                            )
                        )
                full = masked
            if not full:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
            ids, sc = score_brute(full, k1, b, avgdl)
            return topk_select(ids, sc, k)
        lo, hi = bounds[si], seg_end[si]
        sub = []
        for s in slices:
            ids, tfs, dls = s.segment_values(int(lo), int(hi))
            if allowed is not None and ids.size:
                keep = _member_sorted(ids, allowed)
                ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
            if ids.size:
                sub.append(
                    TermSlice(s.term, s.idf, ids, tfs, dls, s.block_firsts, s.block_ubs)
                )
        if not sub:
            continue
        ids, sc = score_brute(sub, k1, b, avgdl)
        got_ids.append(ids)
        got_scores.append(sc)
        n_got += ids.size
        if n_got >= k:
            allsc = np.concatenate(got_scores)
            theta = max(theta, np.partition(-allsc, k - 1)[k - 1] * -1.0)
    if not got_ids:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    return topk_select(np.concatenate(got_ids), np.concatenate(got_scores), k)


def idf_value(n_docs: int, df: int) -> float:
    if df <= 0:
        return 0.0
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _tf_norm(tf: np.ndarray, dl: np.ndarray, k1: float, b: float, avgdl: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl)
    return tf * (k1 + 1.0) / denom


def score_brute(
    slices: list[TermSlice], k1: float, b: float, avgdl: float
) -> tuple[np.ndarray, np.ndarray]:
    """Exact scores for every doc in the union. Returns (doc_ids, scores)."""
    if not slices:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    slices = sorted(slices, key=lambda s: s.term)  # fixed accumulation order
    union = np.unique(np.concatenate([s.doc_ids for s in slices]))
    scores = np.zeros(union.size, dtype=np.float64)
    for s in slices:
        idx = np.searchsorted(union, s.doc_ids)
        s_avgdl = avgdl if s.avgdl is None else s.avgdl
        scores[idx] += s.idf * _tf_norm(s.tfs, s.dls, k1, b, s_avgdl)
    return union, scores


def topk_select(
    doc_ids: np.ndarray, scores: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """(score DESC, doc_id ASC) top-k."""
    if doc_ids.size == 0:
        return doc_ids, scores
    if doc_ids.size > k:
        # candidates = everything ≥ kth score, so boundary ties resolve exactly
        kth = scores[np.argpartition(-scores, k - 1)[k - 1]]
        cand = np.flatnonzero(scores >= kth)
    else:
        cand = np.arange(doc_ids.size)
    order = np.lexsort((doc_ids[cand], -scores[cand]))
    sel = cand[order][:k]
    return doc_ids[sel], scores[sel]


def score_bmw(
    slices: list[TermSlice], k1: float, b: float, avgdl: float, k: int,
    theta0: float = -np.inf,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max top-k over one docID range. Exact (score DESC, doc_id ASC).

    ``theta0``: an externally-known lower bound on the global k-th score
    (WAND across ranges/shards — the caller carries the running top-k
    threshold between docID ranges and index segments).  Segments whose
    upper bound is strictly below it are skipped even before k local
    docs are collected: a doc scoring < theta0 can never enter the
    global top-k, and docs scoring exactly theta0 still survive (prune
    is strict <), so doc_id tie-breaks are never lost."""
    slices = [s for s in slices if s.doc_ids.size]
    if not slices:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    slices = sorted(slices, key=lambda s: s.term)
    # Segment bounds: every block start of every term.
    bounds = np.unique(np.concatenate([s.block_firsts for s in slices]))
    n_seg = bounds.size  # segment s covers [bounds[s], bounds[s+1])
    seg_ub = np.zeros(n_seg, dtype=np.float64)
    for s in slices:
        # block covering each segment start (−1 → before term's first block)
        blk = np.searchsorted(s.block_firsts, bounds, side="right") - 1
        valid = blk >= 0
        # segments past the term's last posting contribute nothing
        valid &= bounds <= s.doc_ids[-1]
        contrib = np.zeros(n_seg, dtype=np.float64)
        contrib[valid] = s.idf * s.block_ubs[blk[valid]].astype(np.float64)
        seg_ub += contrib
    seg_order = np.argsort(-seg_ub, kind="stable")

    got_ids: list[np.ndarray] = []
    got_scores: list[np.ndarray] = []
    n_got = 0
    theta = theta0
    seg_end = np.append(bounds[1:], np.iinfo(np.int64).max)
    # Pruning-convergence guard: a rare term co-occurring with a stopword
    # makes EVERY segment's upper bound exceed theta (the rare term's few
    # wide blocks overlap the whole grid), so the segment loop degenerates
    # to per-segment Python overhead × ~1k segments (measured 2-5 s per
    # query at 1M docs).  After MAX_SEG segments without a break, exact
    # whole-range brute scoring in ONE vectorized pass is strictly
    # cheaper (~ms) — output is identical either way (both paths score
    # exactly; only the pruning strategy differs).
    MAX_SEG = BMW_MAX_SEG
    for n_seen, si in enumerate(seg_order):
        if seg_ub[si] < theta:
            break  # all remaining segments have strictly smaller bounds
        if n_seen >= MAX_SEG:
            ids, sc = score_brute(slices, k1, b, avgdl)
            return topk_select(ids, sc, k)
        lo, hi = bounds[si], seg_end[si]
        sub = []
        for s in slices:
            a = np.searchsorted(s.doc_ids, lo, side="left")
            z = np.searchsorted(s.doc_ids, hi, side="left")
            if z > a:
                sub.append(
                    TermSlice(
                        s.term, s.idf, s.doc_ids[a:z], s.tfs[a:z], s.dls[a:z],
                        s.block_firsts, s.block_ubs,
                    )
                )
        if not sub:
            continue
        ids, sc = score_brute(sub, k1, b, avgdl)
        got_ids.append(ids)
        got_scores.append(sc)
        n_got += ids.size
        if n_got >= k:
            allsc = np.concatenate(got_scores)
            theta = max(theta, np.partition(-allsc, k - 1)[k - 1] * -1.0)
    if not got_ids:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    ids = np.concatenate(got_ids)
    sc = np.concatenate(got_scores)
    return topk_select(ids, sc, k)
