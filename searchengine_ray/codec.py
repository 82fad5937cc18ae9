"""Delta + varbyte posting-list codec with per-block skip/max metadata.

The reference stores postings as exploded SQL rows ``(page_id, lemma_id,
rank)`` (``model/Index.java:12-23``) with no ordering, compression or skip
structure — every search loads full posting rows
(``Repositories/IndexRepository.java:27``, ``SearchServiceImpl.java:121-123``).
The rebuild replaces that with the standard IR layout the north star mandates:
per-lemma docid-sorted posting lists, gap-encoded and varbyte-compressed, cut
into fixed-size blocks carrying ``(last_docid, max_tf, byte offsets)`` so the
query engine can skip whole blocks during conjunctive intersection and bound
scores block-max-style without decoding.

Everything here is vectorized numpy — no Python loop over postings; loops run
over the ≤9 possible varbyte lengths / block count only.

Encoding convention: little-endian 7-bit groups; the high bit is SET on
continuation bytes and CLEAR on the terminal byte of each value.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_THRESHOLDS = [1 << (7 * k) for k in range(1, 9)]  # value widths 2..9 bytes


def vb_encode_with_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Varbyte-encode a uint64-compatible array (vectorized). Returns the
    buffer plus per-value byte offsets (size n+1) so callers can slice out
    any value range without re-encoding."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if a.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    nbytes = np.ones(a.size, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += a >= t
    bounds = np.empty(a.size + 1, dtype=np.int64)
    bounds[0] = 0
    np.cumsum(nbytes, out=bounds[1:])
    offsets = bounds[:-1]
    out = np.zeros(int(bounds[-1]), dtype=np.uint8)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        byte = (a[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[offsets[mask] + j] = byte.astype(np.uint8) | cont
    return out.tobytes(), bounds


def vb_encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a uint64-compatible array (vectorized)."""
    return vb_encode_with_offsets(values)[0]


def vb_decode(buf: bytes | memoryview) -> np.ndarray:
    """Decode a varbyte buffer back to uint64 (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.nonzero((b & 0x80) == 0)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    out = np.zeros(ends.size, dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        out[mask] |= (b[starts[mask] + j].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return out


@dataclass
class EncodedPostings:
    """One lemma's (or one lemma-segment's) compressed posting list."""

    n: int
    doc_blob: bytes  # varbyte gaps of sorted docids (gap 0 = docid[0] + 1)
    tf_blob: bytes  # varbyte term frequencies, posting-aligned
    block_last_docid: bytes  # int64[nblocks] little-endian
    block_max_tf: bytes  # int32[nblocks]
    block_doc_off: bytes  # int64[nblocks] byte offset of block start in doc_blob
    block_tf_off: bytes  # int64[nblocks] byte offset in tf_blob


def encode_postings(docids: np.ndarray, tfs: np.ndarray, block_size: int = 128) -> EncodedPostings:
    """Encode an ascending, duplicate-free docid array + aligned tfs.

    Blocks are encoded back-to-back in one buffer; per-block byte offsets plus
    the previous block's ``last_docid`` make any block independently
    decodable (``decode_blocks``). The first gap is ``docid[0] + 1`` so the
    whole structure is prefix-sum-reconstructible with base -1.
    """
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n = docids.size
    assert tfs.size == n
    if n == 0:
        empty = np.empty(0, dtype=np.int64).tobytes()
        return EncodedPostings(0, b"", b"", empty, empty, empty, empty)
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = np.uint64(docids[0] + 1)
    np.subtract(docids[1:], docids[:-1], out=gaps[1:], casting="unsafe")

    nblocks = (n + block_size - 1) // block_size
    doc_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    doc_off = np.zeros(nblocks, dtype=np.int64)
    tf_off = np.zeros(nblocks, dtype=np.int64)
    last_docid = np.zeros(nblocks, dtype=np.int64)
    max_tf = np.zeros(nblocks, dtype=np.int32)
    dpos = tpos = 0
    for bi in range(nblocks):
        lo, hi = bi * block_size, min((bi + 1) * block_size, n)
        doc_off[bi], tf_off[bi] = dpos, tpos
        dblob = vb_encode(gaps[lo:hi])
        tblob = vb_encode(tfs[lo:hi].astype(np.uint64))
        doc_parts.append(dblob)
        tf_parts.append(tblob)
        dpos += len(dblob)
        tpos += len(tblob)
        last_docid[bi] = docids[hi - 1]
        max_tf[bi] = tfs[lo:hi].max()
    return EncodedPostings(
        n=n,
        doc_blob=b"".join(doc_parts),
        tf_blob=b"".join(tf_parts),
        block_last_docid=last_docid.tobytes(),
        block_max_tf=max_tf.tobytes(),
        block_doc_off=doc_off.tobytes(),
        block_tf_off=tf_off.tobytes(),
    )


def encode_many(
    docids: np.ndarray, tfs: np.ndarray, starts: np.ndarray, block_size: int = 128
) -> list[EncodedPostings]:
    """Encode MANY posting lists in one vectorized pass.

    ``docids``/``tfs`` hold all lists back-to-back; ``starts`` (size m+1)
    bounds each list. Each list must be ascending and duplicate-free. The
    gap transform, varbyte encoding, and per-block metadata (last_docid /
    max_tf via ``np.maximum.reduceat``) are computed over the concatenated
    arrays once; per-list blobs are byte-slices of the shared buffers —
    equivalent to calling ``encode_postings`` per list, ~100× fewer numpy
    dispatches when lists are short (the reduce-side hot path)."""
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    m = starts.size - 1
    n = docids.size
    if n == 0:
        empty = np.empty(0, dtype=np.int64).tobytes()
        return [EncodedPostings(0, b"", b"", empty, empty, empty, empty) for _ in range(m)]

    gaps = np.empty(n, dtype=np.uint64)
    np.subtract(docids[1:], docids[:-1], out=gaps[1:], casting="unsafe")
    heads = starts[:-1][starts[:-1] < n]
    gaps[heads] = (docids[heads] + 1).astype(np.uint64)

    lens = np.diff(starts)
    nblocks = (lens + block_size - 1) // block_size  # 0 for empty lists
    total_blocks = int(nblocks.sum())
    # global posting index of each block start: lemma start + k*block_size
    rep_start = np.repeat(starts[:-1], nblocks)
    block_ord = np.arange(total_blocks, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(nblocks)[:-1])), nblocks
    )
    bstart = rep_start + block_ord * block_size
    bend = np.minimum(bstart + block_size, np.repeat(starts[1:], nblocks))

    block_last = docids[bend - 1]
    block_max_tf = np.maximum.reduceat(tfs, bstart).astype(np.int32) if total_blocks else np.empty(0, np.int32)

    doc_buf, doc_bounds = vb_encode_with_offsets(gaps)
    tf_buf, tf_bounds = vb_encode_with_offsets(tfs.astype(np.uint64))
    doc_view = memoryview(doc_buf)
    tf_view = memoryview(tf_buf)

    # per-list slices
    blk_bounds = np.concatenate(([0], np.cumsum(nblocks)))
    out: list[EncodedPostings] = []
    for i in range(m):
        lo, hi = int(starts[i]), int(starts[i + 1])
        if lo == hi:
            empty = np.empty(0, dtype=np.int64).tobytes()
            out.append(EncodedPostings(0, b"", b"", empty, empty, empty, empty))
            continue
        blo, bhi = int(blk_bounds[i]), int(blk_bounds[i + 1])
        d0 = int(doc_bounds[lo])
        t0 = int(tf_bounds[lo])
        out.append(
            EncodedPostings(
                n=hi - lo,
                doc_blob=bytes(doc_view[d0 : int(doc_bounds[hi])]),
                tf_blob=bytes(tf_view[t0 : int(tf_bounds[hi])]),
                block_last_docid=block_last[blo:bhi].tobytes(),
                block_max_tf=block_max_tf[blo:bhi].tobytes(),
                block_doc_off=(doc_bounds[bstart[blo:bhi]] - d0).tobytes(),
                block_tf_off=(tf_bounds[bstart[blo:bhi]] - t0).tobytes(),
            )
        )
    return out


def decode_postings(enc: EncodedPostings) -> tuple[np.ndarray, np.ndarray]:
    """Full decode → (docids int64 asc, tfs int64)."""
    if enc.n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    gaps = vb_decode(enc.doc_blob).astype(np.int64)
    docids = np.cumsum(gaps) - 1
    tfs = vb_decode(enc.tf_blob).astype(np.int64)
    return docids, tfs


def decode_blocks(enc: EncodedPostings, block_idx: np.ndarray, block_size: int = 128) -> tuple[np.ndarray, np.ndarray]:
    """Decode only the selected blocks — the skip path used by conjunctive
    intersection. Returns concatenated (docids, tfs) of those blocks in
    ascending-block order. ``block_idx`` is normalized with ``np.unique``
    (the contiguous-run gap decoding below REQUIRES sorted unique indices:
    an unsorted array would cumsum runs from the wrong base docid); callers
    like ``blocks_for_candidates`` already pass sorted-unique, for which
    unique is a cheap no-op relative to the decode itself."""
    if enc.n == 0 or block_idx.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    last = np.frombuffer(enc.block_last_docid, dtype=np.int64)
    doc_off = np.frombuffer(enc.block_doc_off, dtype=np.int64)
    tf_off = np.frombuffer(enc.block_tf_off, dtype=np.int64)
    nblocks = last.size
    block_idx = np.unique(block_idx)
    block_idx = block_idx[block_idx < nblocks]
    if block_idx.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    doc_end = np.concatenate((doc_off[1:], [len(enc.doc_blob)]))
    tf_end = np.concatenate((tf_off[1:], [len(enc.tf_blob)]))
    dview = memoryview(enc.doc_blob)
    tview = memoryview(enc.tf_blob)
    # Decode CONTIGUOUS RUNS of selected blocks in one varbyte pass each:
    # gap chains are continuous across adjacent blocks (the encoder slices
    # one gap stream), so a run needs a single cumsum from the run's base.
    # Frequent lemmas select dense runs → ~1 decode per segment instead of
    # one per 128-posting block.
    cuts = np.nonzero(np.diff(block_idx) > 1)[0] + 1
    run_starts = np.concatenate(([0], cuts))
    run_ends = np.concatenate((cuts, [block_idx.size]))
    docs_out: list[np.ndarray] = []
    tfs_out: list[np.ndarray] = []
    for rs, re_ in zip(run_starts.tolist(), run_ends.tolist()):
        b0 = int(block_idx[rs])
        b1 = int(block_idx[re_ - 1])
        gaps = vb_decode(dview[doc_off[b0] : doc_end[b1]]).astype(np.int64)
        base = last[b0 - 1] if b0 > 0 else -1
        docs_out.append(base + np.cumsum(gaps))
        tfs_out.append(vb_decode(tview[tf_off[b0] : tf_end[b1]]).astype(np.int64))
    if len(docs_out) == 1:
        return docs_out[0], tfs_out[0]
    return np.concatenate(docs_out), np.concatenate(tfs_out)


def first_docid(enc: EncodedPostings) -> int:
    """Smallest docid of the segment, decoded from the first varbyte value
    (≤9 bytes) — no full decode. Used to range-narrow candidate arrays
    before block selection."""
    if enc.n == 0:
        return -1
    val = 0
    shift = 0
    for b in enc.doc_blob[:10]:
        val |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return val - 1  # first gap = docid0 + 1


def last_docid(enc: EncodedPostings) -> int:
    """Largest docid of the segment, from block metadata — no decode."""
    if enc.n == 0:
        return -1
    return int(np.frombuffer(enc.block_last_docid, dtype=np.int64)[-1])


def blocks_for_candidates(enc: EncodedPostings, candidates: np.ndarray) -> np.ndarray:
    """Skip selection: which blocks could contain any of the (sorted)
    candidate docids. A block covers ``(prev_last, last]``; binary search on
    ``block_last_docid`` — no decode."""
    last = np.frombuffer(enc.block_last_docid, dtype=np.int64)
    if last.size == 0 or candidates.size == 0:
        return np.empty(0, dtype=np.int64)
    idx = np.searchsorted(last, candidates, side="left")
    idx = idx[idx < last.size]
    return np.unique(idx)
