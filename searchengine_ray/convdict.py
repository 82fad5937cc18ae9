"""Prefix-range-sharded conversation dictionary (docid assignment, pass 0).

The dictionary dense-ranks every distinct ``conv_id`` ascending; a docid is
``(conv_rank << TURN_BITS) | turn_idx`` (``keys.py``), matching the
reference's unique-path doc identity (``model/Page.java:15``). Round 2 kept
the FULL distinct array on the driver (``build.py
_distinct_conv_ids_distributed`` + a driver-side sort/write) — the last
unbounded driver structure on the flagship build: ~100s of GB at the
10^12-turn contract scale. This module is the scale path:

- **Range partitioning.** Boundary conv_ids are chosen from a bounded
  streaming sample (deterministic per block); partition
  ``p(x) = searchsorted(boundaries, x, side="right")`` is order-preserving,
  so ``global_rank(x) = offset[p] + local_rank_within_part(x)`` EXACTLY —
  docids are identical to the single-array layout (equality pytest).
- **Distributed distinct.** One streaming pass: per-batch ``np.unique``
  (map-side combine — under the input contract conv-contiguous blocks make
  per-batch sets nearly disjoint) → low-cardinality ``groupby(part)`` →
  per-part final unique+sort written straight to shared storage as a
  fixed-width ``part-NNNNN.npy``. The driver only ever sees ≤ n_parts
  ``(part, count, is_subset)`` rows.
- **mmap-on-demand readers.** Workers and the query engine open only the
  parts they touch (``np.load(mmap_mode="r")``; the OS page cache shares
  bytes across workers on a node). Build batches are conv-contiguous, so an
  explode/docid task faults in ~one part.
- **Resume.** Boundaries persist in ``meta.json`` and are REUSED on
  rebuild, so the superset check is per-part and fully distributed: each
  part group compares its fresh distinct set against the saved part via one
  ``searchsorted``. All parts subsets ⇒ the saved dictionary (possibly with
  harmless stale entries) keeps serving and shard outputs stay valid —
  byte-for-byte the legacy resume semantics.

Layout (``<index_dir>/conv_dict/``)::

    meta.json            # {"version": 2, "boundaries": [...], "counts": [...]}
    part-00000.npy       # sorted fixed-width unicode, ids < boundaries[0]
    part-00001.npy       # ids in [boundaries[0], boundaries[1]) ...

Small inputs keep the round-2 single-file layout (``conv_dict.npy`` +
``conv_dict.parquet``) — one driver-side read beats a Ray job's fixed
latency there, and the two layouts assign identical docids.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa

DICT_DIRNAME = "conv_dict"
META_FILE = "meta.json"
# one dictionary partition per this many input bytes (⇒ per-part distinct
# sets stay worker-sized: ~256 MB of transcripts ≪ worker heap of ids)
DEFAULT_BYTES_PER_PART = 256 << 20
MAX_PARTS = 4096
# per-block boundary-sample width: n_blocks × 16 ids reach the driver, a
# bounded structure (10^6 blocks ⇒ ~16M short strings worst case; the
# sample is discarded right after the ≤ MAX_PARTS boundaries are cut)
_SAMPLE_PER_BLOCK = 16


def dict_dir(index_dir: str) -> str:
    return os.path.join(index_dir, DICT_DIRNAME)


def _part_path(root: str, p: int) -> str:
    return os.path.join(root, f"part-{p:05d}.npy")


class ShardedConvArray:
    """ndarray-like view over the sharded dictionary: ``size``/``len``,
    ``searchsorted`` (the rank lookup) and ``__getitem__`` (rank → conv_id,
    the hydration lookup) — the exact surface the single sorted array
    serves — with parts memory-mapped lazily on first touch."""

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, META_FILE)) as f:
            meta = json.load(f)
        if meta.get("version") != 2:
            raise ValueError(f"unknown conv_dict version: {meta.get('version')}")
        self.boundaries = np.asarray(meta["boundaries"], dtype=np.str_)
        self.counts = np.asarray(meta["counts"], dtype=np.int64)
        self.offsets = np.concatenate(([0], np.cumsum(self.counts)))  # len P+1
        self._total = int(self.offsets[-1])
        self._parts: dict[int, np.ndarray] = {}

    # identity for worker-process caches (a rewritten dictionary must never
    # serve stale mmaps out of a reused worker — build._CONV_MMAP_CACHE)
    def identity(self) -> tuple:
        st = os.stat(os.path.join(self.root, META_FILE))
        return (self.root, st.st_mtime_ns, st.st_size)

    @property
    def size(self) -> int:
        return self._total

    def __len__(self) -> int:
        return self._total

    def _part(self, p: int) -> np.ndarray:
        arr = self._parts.get(p)
        if arr is None:
            arr = self._parts[p] = np.load(_part_path(self.root, p), mmap_mode="r")
        return arr

    def _locate_values(self, vals: np.ndarray) -> np.ndarray:
        if self.boundaries.size == 0:
            return np.zeros(vals.size, dtype=np.int64)
        return np.searchsorted(self.boundaries, vals, side="right").astype(np.int64)

    def searchsorted(self, values) -> np.ndarray | int:
        """Global insertion ranks, exactly ``np.searchsorted(full_sorted,
        values)``: all of parts < p sort below part p's range, so the global
        rank is the part's base offset + the local insertion point."""
        scalar = np.isscalar(values) or isinstance(values, str)
        vals = np.asarray([values] if scalar else values, dtype=np.str_)
        out = np.empty(vals.size, dtype=np.int64)
        parts = self._locate_values(vals)
        for p in np.unique(parts):
            m = parts == p
            out[m] = self.offsets[p] + np.searchsorted(self._part(int(p)), vals[m])
        return int(out[0]) if scalar else out

    def __getitem__(self, idx):
        if isinstance(idx, (int, np.integer)):
            i = int(idx)
            if i < 0:
                i += self._total
            if not 0 <= i < self._total:
                raise IndexError(f"conv rank {idx} out of range [0, {self._total})")
            p = int(np.searchsorted(self.offsets, i, side="right")) - 1
            return self._part(p)[i - int(self.offsets[p])]
        idx = np.asarray(idx, dtype=np.int64)
        if idx.size and (int(idx.min()) < 0 or int(idx.max()) >= self._total):
            raise IndexError("conv rank out of range")
        out = np.empty(idx.size, dtype=object)
        parts = np.searchsorted(self.offsets, idx, side="right") - 1
        for p in np.unique(parts):
            m = parts == p
            out[m] = np.asarray(self._part(int(p))[idx[m] - int(self.offsets[p])])
        return out

    def gather_all(self) -> np.ndarray:
        """Materialize the full sorted array (tests / small dictionaries
        ONLY — defeats the sharding by construction)."""
        parts = [self._part(p) for p in range(self.counts.size) if self.counts[p]]
        if not parts:
            return np.array([], dtype="<U1")
        return np.concatenate([np.asarray(a) for a in parts])


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------


def _sample_boundaries(files: list[str], fmt: str, num_parts: int) -> list[str]:
    """≤ num_parts-1 boundary conv_ids from a deterministic evenly-spaced
    per-block sample (the same shape Ray Data's sort uses for its range
    partitioner). Skewed id distributions only unbalance part SIZES, never
    correctness — ranks stay exact for any boundary choice."""
    if num_parts <= 1:
        return []
    from searchengine_ray import sources

    ds = sources.read_dataset(files, fmt, ["conv_id"])

    def sample(batch: pa.Table) -> pa.Table:
        a = batch["conv_id"].to_numpy(zero_copy_only=False)
        if a.size == 0:
            return pa.table({"conv_id": pa.array([], type=pa.string())})
        k = min(_SAMPLE_PER_BLOCK, a.size)
        pick = np.linspace(0, a.size - 1, k).astype(np.int64)
        return pa.table({"conv_id": pa.array(np.unique(a[pick]), type=pa.string())})

    chunks = [
        b["conv_id"].to_numpy(zero_copy_only=False)
        for b in ds.map_batches(sample, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not chunks:
        return []
    samples = np.unique(np.concatenate(chunks))
    if samples.size < 2:
        return []
    cuts = samples[
        np.unique((np.arange(1, num_parts) * samples.size) // num_parts)
    ]
    # a cut equal to the global minimum would make part 0 empty — harmless,
    # but dropping duplicates keeps the part list tight
    return [str(c) for c in np.unique(cuts)]


def _distinct_to_parts(
    files: list[str],
    fmt: str,
    boundaries: list[str],
    out_dir: str,
    existing_dir: str | None,
) -> list[dict]:
    """One streaming distinct pass, partitioned by boundary range. Each part
    group writes its sorted distinct ids to ``out_dir`` (shared storage,
    atomic tmp+rename) and reports ``(part, count, subset)`` — subset ⇔ the
    saved dictionary already contains every id of this part, checked
    worker-side against the mmapped saved part."""
    from searchengine_ray import sources

    bnd = np.asarray(boundaries, dtype=np.str_)
    os.makedirs(out_dir, exist_ok=True)

    def part_distinct(batch: pa.Table) -> pa.Table:
        a = np.unique(batch["conv_id"].to_numpy(zero_copy_only=False).astype(np.str_))
        p = (
            np.searchsorted(bnd, a, side="right").astype(np.int64)
            if bnd.size
            else np.zeros(a.size, dtype=np.int64)
        )
        return pa.table(
            {"part": pa.array(p), "conv_id": pa.array(a, type=pa.string())}
        )

    def finalize_part(group: pa.Table) -> pa.Table:
        p = int(group["part"][0].as_py())
        ids = np.unique(
            group["conv_id"].to_numpy(zero_copy_only=False).astype(np.str_)
        )
        subset = False
        if existing_dir is not None:
            try:
                old = np.load(_part_path(existing_dir, p), mmap_mode="r")
                if ids.size == 0:
                    subset = True
                elif old.size:
                    pos = np.minimum(np.searchsorted(old, ids), old.size - 1)
                    subset = bool((old[pos] == ids).all())
            except FileNotFoundError:
                subset = ids.size == 0
        tmp = _part_path(out_dir, p) + f".tmp.{os.getpid()}.npy"
        np.save(tmp, ids)
        os.replace(tmp, _part_path(out_dir, p))
        return pa.table(
            {
                "part": pa.array([p], type=pa.int64()),
                "count": pa.array([ids.size], type=pa.int64()),
                "subset": pa.array([subset], type=pa.bool_()),
            }
        )

    ds = sources.read_dataset(files, fmt, ["conv_id"])
    return (
        ds.map_batches(part_distinct, batch_format="pyarrow")
        .groupby("part")
        .map_groups(finalize_part, batch_format="pyarrow")
        .take_all()
    )


def build_or_reuse(
    files: list[str],
    fmt: str,
    index_dir: str,
    num_parts: int | None = None,
    bytes_per_part: int | None = None,
) -> tuple[ShardedConvArray, bool]:
    """Build (or superset-reuse) the sharded dictionary. Returns
    ``(handle, reused)`` — ``reused=False`` means ranks may have shifted and
    the caller must invalidate shard outputs (same contract as the legacy
    ``build_conv_dict`` rewrite path)."""
    final = dict_dir(index_dir)
    existing = final if os.path.exists(os.path.join(final, META_FILE)) else None

    if existing is not None:
        with open(os.path.join(existing, META_FILE)) as f:
            boundaries = json.load(f)["boundaries"]
    else:
        if num_parts is None:
            total_bytes = sum(os.path.getsize(f) for f in files)
            per = bytes_per_part or DEFAULT_BYTES_PER_PART
            num_parts = int(max(1, min(MAX_PARTS, total_bytes // per)))
        boundaries = _sample_boundaries(files, fmt, num_parts)

    tmp_dir = final + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    rows = _distinct_to_parts(files, fmt, boundaries, tmp_dir, existing)
    by_part = {int(r["part"]): r for r in rows}

    if existing is not None and all(
        by_part.get(p, {"subset": True})["subset"]
        for p in range(len(boundaries) + 1)
    ):
        # saved dictionary is a per-part superset: every rank still valid
        # (vanished convs keep harmless stale entries) — reuse as-is
        shutil.rmtree(tmp_dir, ignore_errors=True)
        return ShardedConvArray(final), True

    counts = []
    for p in range(len(boundaries) + 1):
        r = by_part.get(p)
        if r is None:  # range with zero input rows: write an empty part
            np.save(_part_path(tmp_dir, p) + ".tmp.npy", np.array([], dtype="<U1"))
            os.replace(_part_path(tmp_dir, p) + ".tmp.npy", _part_path(tmp_dir, p))
            counts.append(0)
        else:
            counts.append(int(r["count"]))
    with open(os.path.join(tmp_dir, META_FILE), "w") as f:
        json.dump({"version": 2, "boundaries": list(boundaries), "counts": counts}, f)
    # promote: not atomic across the two steps — a crash in the window
    # leaves no dictionary, and the next build rebuilds it (shard outputs
    # were invalid the moment ranks shifted anyway)
    if existing is not None:
        shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp_dir, final)
    return ShardedConvArray(final), False
