"""Distributed inverted-index build — the Ray-Data rebuild of the reference's
crawl+index lifecycle (``GET /api/startIndexing``,
``services/IndexingServiceImpl.java:73-155`` + ``services/LemmaFinder.java``).

Reference shape: per-site thread pools fetch pages, lemmatize on the fly,
upsert df counters into Postgres row-by-row and accumulate every posting in
JVM heap until one giant flush (SURVEY.md §3.1). The rebuild is a streaming
Ray Data pipeline per input shard::

    read_parquet(shard files, columns=[conv_id, turn_idx, text, role])
      → map_batches(ExplodePostings actor pool)     # tokenize+lemmatize+tf
      → groupby(lemma ⊕ segment).map_groups(encode) # sorted delta+varbyte
      → write_parquet(shards/shard=K/postings)      # hash-bucketed layout

Key scale decisions (SURVEY.md §4, §7):

- **Order-preserving docids**: ``docid = conv_rank << 20 | turn_idx`` where
  ``conv_rank`` is the dense rank of ``conv_id`` (pass 0 builds the
  conversation dictionary). Ascending docids == ascending
  ``(conv_id, turn_idx)`` — so delta encoding works and the canonical
  tie-break needs no key hydration (see keys.py).
- **Range-partitioned segment salt**: the shuffle key is
  ``(lemma, seg)`` with ``seg = conv_rank * S // n_convs``. A stopword's
  postings split into ≤S docid-range-disjoint reduce groups (no single-task
  blowup — the north rule's stopword-skew handling), and because segments
  are *ranges*, per-lemma segment outputs concatenate back into sorted order
  with zero merge work.
- **Doc lengths ride the same shuffle**: each doc emits one sentinel-lemma
  posting ``(lemma="\\x00doclen", tf=dl)``; the reduce encodes doclen
  segments with the same codec. N / avgdl / doclens all derive from the
  encoded output — the input is read exactly once for the postings build.
- **Per-shard checkpoints**: each shard writes to a temp dir, renames
  atomically, then records a manifest entry with lineage (input files, row
  counts, timings). Re-running ``build_index`` skips complete shards —
  partition-exact resume (north rule).

Worker-state rule: the analyzer + memo caches + conversation-rank lookup live
in the actor's ``__init__`` (once per actor), mirroring the reference's
once-per-JVM ``RussianLuceneMorphology`` load (LemmaFinder.java:57-63).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
import uuid as _uuid
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_ray.config import DEFAULT_CONFIG, EngineConfig
from searchengine_ray.keys import TURN_BITS, TURN_MASK
from searchengine_ray.textproc import Analyzer
from searchengine_ray.textproc import morphology_signature as _morph_sig

# Sentinel "lemma" whose postings are (docid, doc_len) pairs; \x00 cannot
# appear in a real token (the tokenizer strips it), so no collision.
DOCLEN_LEMMA = "\x00doclen"
# Per-partition sentinel lemmas ("site" scoping, reference Lemma.site_id):
# postings of "\x00site=<value>" are the (docid, doc_len) pairs of that
# partition's docs — df/sum_tf give per-site n_docs/total_len for free, and
# the decoded docid set is the query-time site filter. Rides the SAME
# shuffle as real postings; no layout change, no extra pass.
SITE_PREFIX = "\x00site="

def _pin_fsspec_http_stub() -> None:
    """Ray Data's path resolution tries ``from fsspec.implementations.http
    import HTTPFileSystem`` on every read/write. When aiohttp is absent that
    import FAILS, Python does not cache failed imports, and concurrent
    shard-build threads re-importing it race — one thread sees the module
    partially initialized and gets an uncaught ImportError. Pin a sentinel
    module once so every later import deterministically succeeds; the class
    is only ever used in isinstance checks, which are False for the local
    filesystems this engine reads."""
    try:
        import fsspec.implementations.http  # noqa: F401
    except ModuleNotFoundError:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel for isinstance checks only
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


_pin_fsspec_http_stub()

# Belt-and-braces: Dataset construction is cheap and lazy — serialize it so
# any remaining lazy-import in the ctor path is single-threaded.
_DATASET_CTOR_LOCK = threading.Lock()


def lemma_bucket(lemma: str, num_buckets: int) -> int:
    """Stable lemma-hash bucket (zlib.crc32 — identical on every worker and
    every run, unlike Python's seeded ``hash``)."""
    return zlib.crc32(lemma.encode("utf-8")) % num_buckets


_SHARD_NAME_RE = __import__("re").compile(r"shard=\d{5}")


def list_shard_names(shards_root: str) -> list[str]:
    """Exact ``shard=NNNNN`` directory names under ``shards/``, sorted.
    Anything else (``*.tmp`` leftovers from a crashed rebuild, stray files)
    is excluded — consuming a stale tmp would silently inflate df/n_docs
    and serve duplicate or partial postings."""
    return sorted(
        n
        for n in os.listdir(shards_root)
        if _SHARD_NAME_RE.fullmatch(n)
        and os.path.isdir(os.path.join(shards_root, n))
    )


def _expand_input(input_path: str | list[str]) -> list[str]:
    if isinstance(input_path, (list, tuple)):
        return sorted(input_path)
    if os.path.isdir(input_path):
        return sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".parquet")
        )
    return [input_path]


# ---------------------------------------------------------------------------
# Pass 0 — conversation dictionary (docid assignment)
# ---------------------------------------------------------------------------


_CONV_DISTINCT_PARTITIONS = 64


def _distinct_conv_ids_distributed(files: list[str], fmt: str = "parquet") -> list[str]:
    """DISTRIBUTED distinct over the conv_id column: batch-local np.unique
    (map-side combine) streamed back to the driver with periodic
    compaction — no shuffle. Under the input contract (stable
    ``(conv_id, turn_idx)`` ordering ⇒ conv-contiguous blocks) per-block
    unique sets are nearly disjoint, so the driver never holds much more
    than the final distinct set; the compaction bound (re-unique every
    ~5M buffered ids) keeps even adversarial layouts at
    O(distinct + 5M) driver memory. Never ``ds.unique`` /
    ``groupby(conv_id)`` — per-group Python dispatch is O(distinct)."""
    from searchengine_ray import sources

    with _DATASET_CTOR_LOCK:
        ds = sources.read_dataset(files, fmt, columns=["conv_id"])

    def part(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["conv_id"].to_numpy(zero_copy_only=False))
        return pa.table({"conv_id": pa.array(u, type=pa.string())})

    out = ds.map_batches(part, batch_format="pyarrow")
    acc: np.ndarray | None = None
    buf: list[np.ndarray] = []
    buf_n = 0
    for b in out.iter_batches(batch_format="pyarrow"):
        arr = b["conv_id"].to_numpy(zero_copy_only=False)
        buf.append(arr)
        buf_n += arr.size
        if buf_n >= 5_000_000:
            parts = ([acc] if acc is not None else []) + buf
            acc = np.unique(np.concatenate(parts))
            buf, buf_n = [], 0
    parts = ([acc] if acc is not None else []) + buf
    if not parts:
        return []
    return np.unique(np.concatenate(parts)).tolist()


_CONV_SMALL_BYTES = 1 << 30


def build_conv_dict(files: list[str], index_dir: str, fmt: str = "parquet"):
    """Dense-rank all conv_ids (ascending). Two layouts, identical docids:

    - **small inputs** (< ``_CONV_SMALL_BYTES``, or resuming a legacy
      index): driver-side single sorted array → ``conv_dict.parquet`` +
      mmap-able ``conv_dict.npy`` sidecar (a Ray job's fixed latency would
      dominate at this size);
    - **large inputs**: the RANGE-SHARDED dictionary
      (``convdict.build_or_reuse`` → ``conv_dict/part-NNNNN.npy`` + per-part
      rank offsets). The distinct, the sort, the subset/resume check and
      the writes all run inside the Ray job — no O(distinct) array ever
      forms on the driver, and workers mmap only the prefix ranges their
      (conv-contiguous) batches touch.

    Returns an array-like handle (``.searchsorted`` / ``__getitem__`` /
    ``len``) over the sorted dictionary."""
    path = os.path.join(index_dir, "conv_dict.parquet")
    from searchengine_ray import convdict

    has_sharded = os.path.exists(
        os.path.join(convdict.dict_dir(index_dir), convdict.META_FILE)
    )
    total_bytes = sum(os.path.getsize(f) for f in files)
    if has_sharded or (
        total_bytes >= _CONV_SMALL_BYTES and not os.path.exists(path)
    ):
        handle, reused = convdict.build_or_reuse(files, fmt, index_dir)
        if not reused:
            # ranks shifted ⇒ every existing shard output is docid-stale
            shutil.rmtree(os.path.join(index_dir, "shards"), ignore_errors=True)
        return handle
    if total_bytes < _CONV_SMALL_BYTES:
        # small input: a column-pruned driver-side read beats a Ray job's
        # fixed latency by ~1s; identical output contract
        import pyarrow.compute as pc

        from searchengine_ray import sources

        t = sources.read_columns_local(files, fmt, ["conv_id"])
        convs = sorted(pc.unique(t["conv_id"].combine_chunks()).to_pylist())
    else:
        convs = _distinct_conv_ids_distributed(files, fmt)

    if os.path.exists(path):
        saved = pq.read_table(path)["conv_id"].to_numpy(zero_copy_only=False)
        saved_set = set(saved.tolist())
        if all(c in saved_set for c in convs):
            # Saved dict is a superset: every rank is still valid (vanished
            # convs keep harmless stale entries), so existing shard outputs
            # stay docid-consistent — resume may proceed.
            npy = os.path.join(index_dir, "conv_dict.npy")
            if not os.path.exists(npy):  # legacy layout: backfill the sidecar
                tmp_npy = npy + ".tmp.npy"
                np.save(tmp_npy.removesuffix(".npy"), np.asarray(saved, dtype=np.str_))
                os.replace(tmp_npy, npy)
            return saved
        # NEW conv_ids shift the dense ranking, which would make resumed
        # shards' docids inconsistent with rebuilt ones — invalidate all
        # shard outputs and re-rank from scratch.
        shutil.rmtree(os.path.join(index_dir, "shards"), ignore_errors=True)

    arr = np.array(convs, dtype=object)
    tmp = path + ".tmp"
    pq.write_table(pa.table({"conv_id": pa.array(arr, type=pa.string())}), tmp)
    os.replace(tmp, path)
    # mmap-able fixed-width sidecar: readers np.load(mmap_mode="r") it —
    # 10^7-conv dictionaries never materialize as Python strings on open
    npy_tmp = os.path.join(index_dir, "conv_dict.npy.tmp.npy")
    np.save(npy_tmp.removesuffix(".npy"), np.asarray(arr, dtype=np.str_))
    os.replace(npy_tmp, os.path.join(index_dir, "conv_dict.npy"))
    return arr


# ---------------------------------------------------------------------------
# Pass 1 — per-shard postings build
# ---------------------------------------------------------------------------


# One memory-mapped view of the conv dictionary per worker PROCESS, keyed
# by file IDENTITY (path, mtime_ns, size) — a rebuild that rewrites the
# sidecar (new conv ids shift dense ranks) must never serve a stale mmap
# out of a reused worker. OS page cache shares the bytes across workers.
_CONV_MMAP_CACHE: dict[tuple[str, int, int], np.ndarray] = {}


def _load_conv_sorted(path: str):
    """Sorted conv dictionary handle for rank lookups: a mmapped single
    array (legacy layout) or a ShardedConvArray over ``conv_dict/`` parts —
    both expose ``.searchsorted`` / ``__getitem__`` / ``.size``."""
    if os.path.isdir(path):
        from searchengine_ray.convdict import ShardedConvArray

        probe = ShardedConvArray(path)  # reads only meta.json
        key = probe.identity()
        arr = _CONV_MMAP_CACHE.get(key)
        if arr is None:
            _CONV_MMAP_CACHE.clear()  # drop stale generations
            arr = _CONV_MMAP_CACHE[key] = probe
        return arr
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    arr = _CONV_MMAP_CACHE.get(key)
    if arr is None:
        _CONV_MMAP_CACHE.clear()  # drop stale generations
        arr = _CONV_MMAP_CACHE[key] = np.load(path, mmap_mode="r")
    return arr


class ExplodePostings:
    """Actor-pool stage: transcripts batch → exploded posting rows.

    Emits one row per (doc, lemma) with tf, plus one sentinel row per doc
    carrying its length. Per-actor memo caches make lemmatization amortized
    O(1) per repeated surface form (Zipf makes the hit rate ~99%).
    """

    def __init__(
        self,
        conv_path: str,
        n_convs: int,
        config: EngineConfig,
        lemma_table: dict[str, str] | None = None,
    ):
        # Morphology state is PROCESS-LOCAL (textproc module globals): a
        # custom table installed on the driver via use_lemma_table would
        # otherwise never reach this actor's process, and the index would
        # be built under the bundled tables while the manifest records the
        # driver's custom signature (code-review r4). None = bundled tables
        # (the module default, identical in every process). Large tables
        # arrive as an ObjectRef (ray.put once per build, fetched from the
        # local object store here) rather than a per-actor pickle.
        if lemma_table is not None:
            import ray

            from searchengine_ray.textproc import use_lemma_table

            if isinstance(lemma_table, ray.ObjectRef):
                lemma_table = ray.get(lemma_table)
            use_lemma_table(lemma_table)
        # Rank lookup over the MEMORY-MAPPED sorted conv sidecar (the index
        # dir is shared storage on a real cluster, same as shard outputs):
        # no broadcast, no per-worker heap copy — the OS pages in only the
        # ranges a worker touches. A dict is ~2× faster per batch, so build
        # one while the dictionary is small.
        conv_arr = _load_conv_sorted(conv_path)
        if len(conv_arr) <= 1_000_000:
            vals = (
                conv_arr.gather_all() if hasattr(conv_arr, "gather_all") else conv_arr
            )
            self.rank: dict[str, int] | None = {
                str(c): i for i, c in enumerate(vals)
            }
            self.conv_sorted = None
        else:
            self.rank = None
            self.conv_sorted = conv_arr
        self.n_convs = max(1, n_convs)
        self.config = config
        self.analyzer = Analyzer(config.analyzer)
        # token → lemma id (-1 = insignificant); lemma id → (string, bucket).
        # Memoized per actor: Zipf makes the distinct-token set tiny relative
        # to the token stream, so all Python-level text work is amortized.
        self._tok_lid: dict[str, int] = {}
        self._lemmas: list[str] = []
        self._lemma_bucket: list[int] = []
        self._lemma_ids: dict[str, int] = {}
        self._doclen_lid = self._lemma_id(DOCLEN_LEMMA)

    def _lemma_id(self, lemma: str) -> int:
        lid = self._lemma_ids.get(lemma)
        if lid is None:
            lid = self._lemma_ids[lemma] = len(self._lemmas)
            self._lemmas.append(lemma)
            self._lemma_bucket.append(lemma_bucket(lemma, self.config.num_buckets))
        return lid

    def _eval_vocab(self, vocab: list[str]) -> np.ndarray:
        """lemma id (or -1) for each distinct token of the batch."""
        out = np.empty(len(vocab), dtype=np.int64)
        memo = self._tok_lid
        analyzer = self.analyzer
        for i, w in enumerate(vocab):
            lid = memo.get(w)
            if lid is None:
                if analyzer.significant(w):
                    lid = self._lemma_id(analyzer.lemma(w))
                else:
                    lid = -1
                memo[w] = lid
            out[i] = lid
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batch → per-(lemma, seg) MINI posting segments (map-side partial
        aggregation): one output row per distinct (lemma, seg) in the batch
        carrying raw little-endian docid/tf arrays. Tokenization runs as
        Arrow kernels (``textproc.tokens_flat_arrow``); Python-level
        significance/lemma logic touches only the batch's DISTINCT tokens
        via dictionary encoding; counting and grouping are pure numpy."""
        from searchengine_ray.textproc import tokens_flat_arrow

        conv_list = batch["conv_id"].to_pylist()
        turn_idx = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = len(conv_list)
        S = self.config.num_segments

        if np.any(turn_idx > TURN_MASK):
            raise ValueError(f"turn_idx exceeds {TURN_MASK} (keys.TURN_BITS)")
        if self.rank is not None:
            rank = self.rank
            ranks = np.fromiter((rank[c] for c in conv_list), dtype=np.int64, count=n_docs)
        else:
            conv_ids = np.asarray(conv_list, dtype=np.str_)
            ranks = self.conv_sorted.searchsorted(conv_ids)
            ranks_c = np.minimum(ranks, self.conv_sorted.size - 1)
            if not (self.conv_sorted[ranks_c] == conv_ids).all():
                missing = conv_ids[self.conv_sorted[ranks_c] != conv_ids][:3]
                raise KeyError(
                    f"conv_ids missing from conv dictionary: {missing.tolist()}"
                )
        docid_by_row = (ranks << TURN_BITS) | turn_idx

        flat, parents = tokens_flat_arrow(batch["text"], self.analyzer.mode)
        enc = flat.dictionary_encode()
        idx = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        vocab_lid = self._eval_vocab(enc.dictionary.to_pylist())

        tok_lid = vocab_lid[idx]
        keep = tok_lid >= 0
        rows = parents[keep]
        lids = tok_lid[keep]

        # tf per (row, lemma): pack into one key, count via np.unique
        pair = (rows << np.int64(32)) | lids
        upair, tf = np.unique(pair, return_counts=True)
        prow = (upair >> np.int64(32)).astype(np.int64)
        plid = (upair & np.int64(0xFFFFFFFF)).astype(np.int64)

        # doc lengths (0 for docs with no significant tokens) → sentinel rows
        dl = np.bincount(rows, minlength=n_docs)
        sentinel_lids = [np.full(n_docs, self._doclen_lid, dtype=np.int64)]
        sentinel_docids = [docid_by_row]
        sentinel_tfs = [dl]

        # Site (corpus-partition) threading: real postings carry their doc's
        # site through the shuffle key so the reduce encodes PER-(lemma,
        # site) segments (the reference's per-site posting layout,
        # model/Lemma.java:14-27); sentinels are site-neutral (""). Plus one
        # extra sentinel per doc carrying (docid, dl) per site for the
        # manifest's per-site n_docs/total_len/avgdl.
        if self.config.site_column:
            site_vals = np.asarray(
                ["" if v is None else str(v) for v in batch[self.config.site_column].to_pylist()],
                dtype=object,
            )
            site_lids = np.fromiter(
                (self._lemma_id(SITE_PREFIX + v) for v in site_vals),
                dtype=np.int64,
                count=n_docs,
            )
            sentinel_lids.append(site_lids)
            sentinel_docids.append(docid_by_row)
            sentinel_tfs.append(dl)
            uniq_sites = np.unique(np.concatenate((site_vals, np.array([""], dtype=object))))
            doc_site_codes = np.searchsorted(uniq_sites, site_vals)
        else:
            uniq_sites = np.array([""], dtype=object)
            doc_site_codes = np.zeros(n_docs, dtype=np.int64)
        nsites = len(uniq_sites)
        empty_code = int(np.searchsorted(uniq_sites, ""))

        all_lids = np.concatenate([plid, *sentinel_lids])
        all_docids = np.concatenate([docid_by_row[prow], *sentinel_docids])
        all_tfs = np.concatenate([tf, *sentinel_tfs]).astype(np.int32)
        n_sentinel = all_lids.size - plid.size
        all_sites = np.concatenate(
            [doc_site_codes[prow], np.full(n_sentinel, empty_code, dtype=np.int64)]
        )

        seg = ((all_docids >> TURN_BITS) * S // self.n_convs).astype(np.int64)
        gkey = (all_lids * nsites + all_sites) * S + seg
        order = np.argsort(gkey, kind="stable")  # docid order kept per group
        gkey_s = gkey[order]
        d_sorted = all_docids[order]
        t_sorted = all_tfs[order]
        starts = np.concatenate(([0], np.nonzero(np.diff(gkey_s))[0] + 1, [gkey_s.size]))

        lemmas_list = self._lemmas
        bucket_list = self._lemma_bucket
        out_pkey: list[int] = []
        out_lemma: list[str] = []
        out_site: list[str] = []
        out_seg: list[int] = []
        out_doc: list[bytes] = []
        out_tf: list[bytes] = []
        for i in range(starts.size - 1):
            lo, hi = starts[i], starts[i + 1]
            g = int(gkey_s[lo])
            s = g % S
            lid_site = g // S
            lid = lid_site // nsites
            out_pkey.append(bucket_list[lid] * S + s)
            out_lemma.append(lemmas_list[lid])
            out_site.append(str(uniq_sites[lid_site % nsites]))
            out_seg.append(s)
            out_doc.append(d_sorted[lo:hi].tobytes())
            out_tf.append(t_sorted[lo:hi].tobytes())
        return pa.table(
            {
                "pkey": pa.array(out_pkey, type=pa.int32()),
                "lemma": pa.array(out_lemma, type=pa.string()),
                "site": pa.array(out_site, type=pa.string()),
                "seg": pa.array(out_seg, type=pa.int32()),
                "docid_raw": pa.array(out_doc, type=pa.binary()),
                "tf_raw": pa.array(out_tf, type=pa.binary()),
            }
        )


def _make_add_docid(conv_path: str):
    """Doc-store docid stage as a plain TASK-pool function (full read-side
    parallelism — an actor pool here serializes half the shard's wall).
    The SORTED fixed-width conv dictionary is MEMORY-MAPPED once per worker
    process (module cache; OS page cache shares the bytes across workers on
    a node), and the rank lookup is one vectorized ``np.searchsorted``."""

    def add_docid(batch: pa.Table) -> pa.Table:
        conv_sorted = _load_conv_sorted(conv_path)
        # own-width U dtype (NOT conv_sorted.dtype): a longer unknown conv id
        # must not silently truncate into a valid-looking prefix
        conv_ids = np.asarray(batch["conv_id"].to_pylist(), dtype=np.str_)
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        ranks = conv_sorted.searchsorted(conv_ids)
        ranks_c = np.minimum(ranks, conv_sorted.size - 1)
        if not (conv_sorted[ranks_c] == conv_ids).all():
            missing = conv_ids[conv_sorted[ranks_c] != conv_ids][:3]
            raise KeyError(f"conv_ids missing from conv dictionary: {missing.tolist()}")
        docid = (ranks << TURN_BITS) | turn
        batch = batch.append_column("docid", pa.array(docid, type=pa.int64()))
        # LOCAL docid sort only — hydration prunes by row-group min/max
        # stats, which need ranges to be tight per group, not globally
        # disjoint. Input files are conv-contiguous (input_hint: stable
        # (conv_id, turn_idx) ordering), so local sorting yields
        # near-disjoint ranges without an all-to-all shuffle of the full
        # text payload.
        order = np.argsort(docid, kind="stable")
        if not np.array_equal(order, np.arange(order.size)):
            batch = batch.take(pa.array(order))
        return batch

    return add_docid


def _make_encode_group(config: EngineConfig):
    """Reduce: one (bucket, seg) group of MINI segments — MANY lemmas, many
    minis per lemma — → one encoded posting-segment row per lemma. The
    minis are concatenated into flat arrays, sorted ONCE by (lemma, docid),
    and encoded in one vectorized ``codec.encode_many`` pass."""
    from searchengine_ray.codec import encode_many

    block_size = config.block_size
    S = config.num_segments

    def encode_group(group: pa.Table) -> pa.Table:
        import pandas as pd

        pkey = int(group["pkey"][0].as_py())
        seg = pkey % S
        bucket = pkey // S
        # pandas' C string hash table stops at an embedded NUL, so the
        # "\x00site=…" / "\x00doclen" sentinel lemmas would all hash EQUAL
        # and their posting lists would silently merge. Escape the NUL
        # prefix to "\x01" (no real token can start with either byte)
        # before factorizing — keeps the C-speed hash path (np.unique's
        # Python-compare sort measured ~2× slower on the build's hot
        # reduce) — and un-escape on the way out.
        lem_raw = group["lemma"].to_numpy(zero_copy_only=False)
        sent_mask = pd.Series(lem_raw, dtype=object).str.startswith("\x00").to_numpy()
        if sent_mask.any():
            lem_escaped = lem_raw.copy()
            lem_escaped[sent_mask] = ["\x01" + s[1:] for s in lem_raw[sent_mask]]
        else:
            lem_escaped = lem_raw
        lem_codes, lem_uniques = pd.factorize(lem_escaped, sort=True)
        lem_uniques = np.asarray(
            ["\x00" + u[1:] if u.startswith("\x01") else u for u in lem_uniques],
            dtype=object,
        )
        site_codes, site_uniques = pd.factorize(
            group["site"].to_numpy(zero_copy_only=False), sort=True
        )
        nsites = max(1, len(site_uniques))
        # one encoded posting list per (lemma, site) — combined code keeps
        # the whole pass vectorized; (lemma, site) order is lexicographic
        combo_codes = lem_codes.astype(np.int64) * nsites + site_codes
        doc_raw = group["docid_raw"].to_pylist()
        tf_raw = group["tf_raw"].to_pylist()
        mini_lens = np.fromiter(
            (len(b) >> 3 for b in doc_raw), dtype=np.int64, count=len(doc_raw)
        )
        docids = np.frombuffer(b"".join(doc_raw), dtype=np.int64)
        tfs = np.frombuffer(b"".join(tf_raw), dtype=np.int32).astype(np.int64)
        post_codes = np.repeat(combo_codes, mini_lens)
        order = np.lexsort((docids, post_codes))
        post_codes = post_codes[order]
        docids = docids[order]
        tfs = tfs[order]
        starts = np.concatenate(
            ([0], np.nonzero(np.diff(post_codes))[0] + 1, [post_codes.size])
        )
        encs = encode_many(docids, tfs, starts, block_size=block_size)

        n_lem = starts.size - 1
        list_combo = post_codes[starts[:-1]] if n_lem else np.empty(0, np.int64)
        lemma_per_list = lem_uniques[list_combo // nsites] if n_lem else []
        site_per_list = site_uniques[list_combo % nsites] if n_lem else []
        df = np.diff(starts)
        sum_tf = np.add.reduceat(tfs, starts[:-1]) if tfs.size else np.empty(0, np.int64)
        return pa.table(
            {
                "lemma": pa.array(list(lemma_per_list), type=pa.string()),
                "site": pa.array(list(site_per_list), type=pa.string()),
                "seg": pa.array(np.full(n_lem, seg, dtype=np.int32)),
                "bucket": pa.array(np.full(n_lem, bucket, dtype=np.int32)),
                "df": pa.array(df, type=pa.int64()),
                "sum_tf": pa.array(sum_tf, type=pa.int64()),
                "doc_blob": pa.array([e.doc_blob for e in encs], type=pa.binary()),
                "tf_blob": pa.array([e.tf_blob for e in encs], type=pa.binary()),
                "block_last_docid": pa.array(
                    [e.block_last_docid for e in encs], type=pa.binary()
                ),
                "block_max_tf": pa.array([e.block_max_tf for e in encs], type=pa.binary()),
                "block_doc_off": pa.array([e.block_doc_off for e in encs], type=pa.binary()),
                "block_tf_off": pa.array([e.block_tf_off for e in encs], type=pa.binary()),
            }
        )

    return encode_group


def _write_norms_sidecar(shard_dir: str) -> None:
    """Decode the shard's doc-length sentinels once at BUILD time into raw
    ``.npy`` sidecars (docid-sorted, aligned). Readers ``np.load(...,
    mmap_mode="r")`` them — opening a 20M-doc index costs milliseconds and
    OS pages norms in on demand, instead of a multi-second full sentinel
    decode into process heap (the BM25-norms analogue of Lucene's norms
    file)."""
    import pyarrow.dataset as pads

    from searchengine_ray.codec import EncodedPostings, decode_postings

    t = pads.dataset(os.path.join(shard_dir, "postings")).to_table(
        columns=["df", "doc_blob", "tf_blob", "block_last_docid",
                 "block_max_tf", "block_doc_off", "block_tf_off"],
        filter=pads.field("lemma") == DOCLEN_LEMMA,
    )
    if t.num_rows == 0:
        docids = np.empty(0, dtype=np.int64)
        dls = np.empty(0, dtype=np.int32)
    else:
        parts = []
        for i in range(t.num_rows):
            enc = EncodedPostings(
                n=int(t["df"][i].as_py()),
                doc_blob=t["doc_blob"][i].as_py(),
                tf_blob=t["tf_blob"][i].as_py(),
                block_last_docid=t["block_last_docid"][i].as_py(),
                block_max_tf=t["block_max_tf"][i].as_py(),
                block_doc_off=t["block_doc_off"][i].as_py(),
                block_tf_off=t["block_tf_off"][i].as_py(),
            )
            parts.append(decode_postings(enc))
        docids = np.concatenate([p[0] for p in parts])
        dls = np.concatenate([p[1] for p in parts]).astype(np.int32)
        order = np.argsort(docids, kind="stable")
        docids, dls = docids[order], dls[order]
    np.save(os.path.join(shard_dir, "norms_docid.npy"), docids)
    np.save(os.path.join(shard_dir, "norms_dl.npy"), dls)


def _config_signature(config: EngineConfig, morph_sig: str | None = None) -> dict:
    """The layout-affecting config fields. A resumed shard is reused only
    when these match — text semantics or on-disk layout changes (analyzer,
    segments, buckets, block size, ingest extraction, morphology tables)
    make old outputs wrong, not just stale.

    ``morph_sig`` pins the morphology signature to the snapshot taken at
    ``build_index`` entry; the default (live-state sample) is only for
    callers outside a build (code-review r4: three independent live samples
    per build let a concurrent ``use_lemma_table`` desync shard sig,
    actor tables, and manifest)."""
    return {
        "analyzer": config.analyzer,
        "num_segments": config.num_segments,
        "num_buckets": config.num_buckets,
        "block_size": config.block_size,
        "site_column": config.site_column,
        "html_content": config.html_content,
        # extraction-rule changes alter the stored text of html_content
        # builds — version the extractor so old shards rebuild, not reuse
        "html_extractor": _extractor_version() if config.html_content else None,
        # the index vocabulary is a function of the lemma tables: postings
        # built under different morphology are WRONG for this query path,
        # not merely stale (same surface word → different lemma key)
        "morphology": morph_sig if morph_sig is not None else _morph_sig(),
    }


def _extractor_version() -> int:
    from searchengine_ray.htmltext import EXTRACTOR_VERSION

    return EXTRACTOR_VERSION


def config_from_manifest(m: dict, **overrides) -> EngineConfig:
    """EngineConfig reconstructed from an index manifest — the round-trip
    used by every rebuild-in-place path (``cmd_reindex``, the HTTP server's
    ``/api/startIndexing``). Layout-affecting fields MUST survive this, or
    ``_config_signature`` mismatches and shards rebuild with the WRONG
    layout (site sentinel postings dropped, html extraction skipped).
    ``overrides`` pass through to ``EngineConfig`` (execution sizing etc.,
    which are not layout-affecting)."""
    return EngineConfig(
        analyzer=m["analyzer"],
        k1=m["k1"],
        b=m["b"],
        search_filter=m["search_filter"],
        num_shards=len(m["shards"]),
        num_segments=m["num_segments"],
        num_buckets=m["num_buckets"],
        block_size=m["block_size"],
        site_column=m.get("site_column"),
        html_content=bool(m.get("html_content", False)),
        **overrides,
    )


def _input_fingerprint(files: list[str]) -> str:
    """Stable lineage fingerprint of a shard's input files (path, size,
    mtime_ns). A resumed build reuses a shard only when its fingerprint
    matches; otherwise the shard is rebuilt — the partition-granular
    incremental-reindex path."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for f in files:
        st = os.stat(f)
        h.update(f"{f}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


def _shard_files(files: list[str], num_shards: int) -> list[list[str]]:
    """Deterministic contiguous split of the sorted file list."""
    num_shards = min(num_shards, len(files))
    per = (len(files) + num_shards - 1) // num_shards
    return [files[i * per : (i + 1) * per] for i in range(num_shards) if files[i * per : (i + 1) * per]]


def _build_shard(
    shard_id: int,
    files: list[str],
    index_dir: str,
    conv_path: str,
    n_convs: int,
    config: EngineConfig,
    fmt: str = "parquet",
    lemma_ref=None,
    morph_sig: str | None = None,
) -> dict:
    """``lemma_ref``/``morph_sig``: the build-entry snapshot of the custom
    lemma table (``ray.ObjectRef`` — ONE object-store copy per build, not
    one pickle per actor per shard pool) and its signature. Defaults sample
    the live module state, for direct callers outside ``build_index``."""
    import ray.data as rd

    shard_dir = os.path.join(index_dir, "shards", f"shard={shard_id:05d}")
    manifest_path = os.path.join(shard_dir, "_MANIFEST.json")
    fingerprint = _input_fingerprint(files)
    cfg_sig = _config_signature(config, morph_sig=morph_sig)
    if os.path.exists(manifest_path):
        # A corrupt checkpoint (half-written JSON from a crash mid-rename
        # window, disk-full truncation) must mean "this shard is not
        # complete — rebuild it", never a raw JSONDecodeError that kills
        # the whole resume (review r5: resume exists precisely for the
        # crash case).
        try:
            with open(manifest_path) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            m = {}
        if (
            m.get("status") == "complete"
            and m.get("input_fingerprint") == fingerprint
            and m.get("config") == cfg_sig
        ):
            # Resume: same input AND same layout config. Clean any stale
            # sibling tmp from a crashed later rebuild so nothing downstream
            # can ever mistake it for shard output.
            shutil.rmtree(shard_dir + ".tmp", ignore_errors=True)
            return m
        # input changed since the last build → rebuild just this shard (the
        # incremental path: reference's updatePage df-decrement dance,
        # services/PageProcessorService.java:34-46, becomes "re-derive the
        # partition", which the doc-disjoint layout makes exact)

    t0 = time.time()
    tmp_dir = shard_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(os.path.join(tmp_dir, "postings"), exist_ok=True)

    from searchengine_ray import sources

    read_cols = ["conv_id", "turn_idx", "text"]
    if config.site_column and config.site_column not in read_cols:
        read_cols.append(config.site_column)
    with _DATASET_CTOR_LOCK:
        ds = sources.read_dataset(files, fmt, read_cols)
    n_input = ds.count()  # parquet: footer metadata, no scan
    if config.html_content:
        # M5 non-identity ingest: HTML → body text ONCE, feeding both the
        # tokenizer and (below) the doc store — the serving-time Jsoup
        # extraction of the reference, hoisted to the build
        from searchengine_ray.htmltext import HtmlToText
        from searchengine_ray.workerstate import per_worker

        ds = ds.map_batches(
            per_worker(HtmlToText), batch_format="pyarrow",
            batch_size=config.batch_size,
        )
    from searchengine_ray import textproc as _tp

    exploded = ds.map_batches(
        ExplodePostings,
        fn_constructor_kwargs={
            "conv_path": conv_path,
            "n_convs": n_convs,
            "config": config,
            # ship any driver-installed custom lemma table to the actors:
            # under build_index (morph_sig given) the build-entry snapshot
            # is AUTHORITATIVE — an object-store ref (one copy per build)
            # or None meaning "bundled tables at snapshot time"; sampling
            # the live module state here instead would let a concurrent
            # use_lemma_table ship later shards a table that disagrees
            # with cfg_sig. Outside build_index, sample live.
            "lemma_table": lemma_ref if morph_sig is not None else _tp._LEMMA_TABLE,
        },
        batch_format="pyarrow",
        batch_size=config.batch_size,
        concurrency=config.lemmatizer_concurrency,
    )
    nparts = config.shuffle_partitions
    if nparts and nparts > 0:
        exploded = exploded.repartition(nparts)
    encoded = exploded.groupby("pkey").map_groups(
        _make_encode_group(config), batch_format="pyarrow"
    )

    with _DATASET_CTOR_LOCK:
        docs = sources.read_dataset(files, fmt, ["conv_id", "turn_idx", "role", "text"])
    if config.html_content:
        from searchengine_ray.htmltext import HtmlToText
        from searchengine_ray.workerstate import per_worker

        docs = docs.map_batches(
            per_worker(HtmlToText), batch_format="pyarrow",
            batch_size=config.batch_size,
        )

    # Postings and doc-store jobs are independent passes over the same input
    # — run them concurrently so the shard's wall is max(), not sum().
    def _write_postings():
        # small row groups → bucket point reads prune to a few row groups
        encoded.write_parquet(os.path.join(tmp_dir, "postings"), row_group_size=512)

    def _write_docs():
        # small row groups → query-time hydration decodes ~one group per hit
        docs.map_batches(
            _make_add_docid(conv_path), batch_format="pyarrow"
        ).write_parquet(os.path.join(tmp_dir, "docs"), row_group_size=2048)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as two:
        fp = two.submit(_write_postings)
        fd = two.submit(_write_docs)
        fp.result()
        fd.result()

    _write_norms_sidecar(tmp_dir)

    manifest = {
        "shard": shard_id,
        "status": "complete",
        "input_files": files,
        "input_fingerprint": fingerprint,
        "n_input_rows": int(n_input),
        "wall_sec": round(time.time() - t0, 3),
        "config": cfg_sig,
    }
    with open(os.path.join(tmp_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    shutil.rmtree(shard_dir, ignore_errors=True)
    os.replace(tmp_dir, shard_dir)
    return manifest


# ---------------------------------------------------------------------------
# Finalize — dictionary + global stats manifest
# ---------------------------------------------------------------------------


def _posting_files(index_dir: str) -> list[str]:
    shards_root = os.path.join(index_dir, "shards")
    out: list[str] = []
    for shard in list_shard_names(shards_root):
        d = os.path.join(shards_root, shard, "postings")
        out.extend(
            os.path.join(d, n) for n in sorted(os.listdir(d)) if n.endswith(".parquet")
        )
    return out


def _replace_path(tmp: str, target: str) -> None:
    """Replace ``target`` (file OR directory) with ``tmp``. Finalize is
    idempotent, so the non-atomic window on the directory case is safe —
    a crash in between just means the next finalize rewrites it."""
    if os.path.isdir(target) and not os.path.islink(target):
        shutil.rmtree(target, ignore_errors=True)
    elif os.path.exists(target):
        os.remove(target)
    os.replace(tmp, target)


# Above this many dictionary rows the finalize merge runs as a Ray job
# (fixed-partition + vectorized pandas combine); below it a driver-side
# pandas pass is faster than a Ray job's fixed latency.
_FINALIZE_DRIVER_MAX_ROWS = 4_000_000


def _finalize_distributed(
    index_dir: str, config: EngineConfig, shard_manifests: list[dict], pfiles: list[str],
    build_id: str | None = None, morph_sig: str | None = None,
) -> dict:
    """Distributed finalize (VERDICT r1 item 8): the dictionary merge is a
    Ray map-combine → fixed-partition shuffle → vectorized pandas reduce
    writing parquet DIRECTLY from the workers; the driver only ever touches
    the tiny sentinel rows (parquet predicate pushdown on lemma < "\\x01")
    and per-file footers. Driver memory is O(sites + shards), never
    O(vocabulary)."""
    import pandas as pd
    import pyarrow.dataset as pads
    import ray.data as rd

    # sentinel stats: pushdown-filtered read — row groups without sentinel
    # lemmas are pruned by their min/max stats
    sent = pads.dataset(pfiles).to_table(
        columns=["lemma", "df", "sum_tf"], filter=pads.field("lemma") < "\x01"
    )
    lem = sent["lemma"].to_numpy(zero_copy_only=False)
    df = sent["df"].to_numpy(zero_copy_only=False)
    sum_tf = sent["sum_tf"].to_numpy(zero_copy_only=False)
    is_doclen = lem == DOCLEN_LEMMA
    n_docs = int(df[is_doclen].sum())
    total_len = int(sum_tf[is_doclen].sum())
    sites: dict[str, dict] = {}
    for l, d, s in zip(lem, df, sum_tf):
        if not l.startswith(SITE_PREFIX):
            continue
        e = sites.setdefault(l[len(SITE_PREFIX):], {"n_docs": 0, "total_len": 0})
        e["n_docs"] += int(d)
        e["total_len"] += int(s)
    for e in sites.values():
        e["avgdl"] = (e["total_len"] / e["n_docs"]) if e["n_docs"] else 0.0

    with _DATASET_CTOR_LOCK:
        ds = rd.read_parquet(pfiles, columns=["lemma", "site", "df", "sum_tf"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sub = batch.filter(pc.invert(pc.starts_with(batch["lemma"], "\x00")))
        g = (
            pd.DataFrame(
                {
                    "lemma": sub["lemma"].to_numpy(zero_copy_only=False),
                    "site": sub["site"].to_numpy(zero_copy_only=False),
                    "df": sub["df"].to_numpy(zero_copy_only=False),
                    "cf": sub["sum_tf"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby(["lemma", "site"], as_index=False)
            .sum()
        )
        g["q"] = np.fromiter(
            (zlib.crc32(w.encode("utf-8")) % 64 for w in g["lemma"]),
            dtype=np.int64,
            count=len(g),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    part = ds.map_batches(partial, batch_format="pyarrow").materialize()

    def final_global(group: pa.Table) -> pa.Table:
        g = (
            group.select(["lemma", "df", "cf"])
            .to_pandas()
            .groupby("lemma", as_index=False)
            .sum()
            .sort_values("lemma", kind="stable")
        )
        g["df"] = g["df"].astype("int64")
        g["cf"] = g["cf"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    dict_tmp = os.path.join(index_dir, "dictionary.parquet.tmpd")
    shutil.rmtree(dict_tmp, ignore_errors=True)
    part.groupby("q").map_groups(final_global, batch_format="pyarrow").write_parquet(
        dict_tmp
    )
    _replace_path(dict_tmp, os.path.join(index_dir, "dictionary.parquet"))
    n_lemmas = sum(
        pq.read_metadata(os.path.join(index_dir, "dictionary.parquet", f)).num_rows
        for f in os.listdir(os.path.join(index_dir, "dictionary.parquet"))
        if f.endswith(".parquet")
    )

    site_dict_path = os.path.join(index_dir, "dictionary_sites.parquet")
    if config.site_column:

        def final_site(group: pa.Table) -> pa.Table:
            g = group.select(["site", "lemma", "df", "cf"]).to_pandas()
            g = g[g["site"] != ""]
            g = (
                g.groupby(["site", "lemma"], as_index=False)
                .sum()
                .sort_values(["site", "lemma"], kind="stable")
            )
            g["df"] = g["df"].astype("int64")
            g["cf"] = g["cf"].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        sd_tmp = site_dict_path + ".tmpd"
        shutil.rmtree(sd_tmp, ignore_errors=True)
        part.groupby("q").map_groups(final_site, batch_format="pyarrow").write_parquet(
            sd_tmp
        )
        _replace_path(sd_tmp, site_dict_path)
    elif os.path.exists(site_dict_path):
        shutil.rmtree(site_dict_path, ignore_errors=True) if os.path.isdir(
            site_dict_path
        ) else os.remove(site_dict_path)

    manifest = {
        "version": 1,
        # build epoch: every finalize mints a fresh id; upsert generations
        # are stamped with it and DeltaView/load_state ignore generations
        # whose epoch doesn't match the loaded manifest — this makes the
        # post-finalize clear_delta logically atomic with finalize (a crash
        # in between can no longer leave stale upserts, keyed to the OLD
        # conv ranking, durably overlaid on the rebuilt index)
        "build_id": build_id or _uuid.uuid4().hex,
        "n_docs": n_docs,
        "total_len": total_len,
        "avgdl": (total_len / n_docs) if n_docs else 0.0,
        "n_lemmas": int(n_lemmas),
        "analyzer": config.analyzer,
        "k1": config.k1,
        "b": config.b,
        "search_filter": config.search_filter,
        "num_segments": config.num_segments,
        "num_buckets": config.num_buckets,
        "block_size": config.block_size,
        "site_column": config.site_column,
        "html_content": config.html_content,
        "morphology": morph_sig if morph_sig is not None else _morph_sig(),
        # which extraction rules produced the stored text of an
        # html_content index (None for plain-text builds): powers the
        # cmd_reindex keep_delta gate exactly like "morphology" does —
        # without it an extractor-rule upgrade would preserve an upsert
        # overlay over shards that all rebuild under different rules
        "html_extractor": _extractor_version() if config.html_content else None,
        "sites": sites,
        "shards": shard_manifests,
    }
    tmp = os.path.join(index_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))
    return manifest


def _finalize(
    index_dir: str,
    config: EngineConfig,
    shard_manifests: list[dict],
    force_distributed: bool = False,
    build_id: str | None = None,
    morph_sig: str | None = None,
) -> dict:
    """Aggregate per-(lemma, site, seg, shard) rows into the term dictionary
    and global BM25 stats. Segments/shards are doc-disjoint, so df sums
    exactly (replaces the reference's concurrent SQL upsert df maintenance,
    Repositories/LemmaRepository.java:25-30). Large vocabularies route to
    ``_finalize_distributed`` (same outputs, driver never holds the
    dictionary)."""
    pfiles = _posting_files(index_dir)
    total_rows = sum(pq.read_metadata(f).num_rows for f in pfiles)
    if force_distributed or total_rows > _FINALIZE_DRIVER_MAX_ROWS:
        return _finalize_distributed(
            index_dir, config, shard_manifests, pfiles, build_id, morph_sig=morph_sig
        )
    t = pa.concat_tables(
        pq.read_table(f, columns=["lemma", "site", "df", "sum_tf"]) for f in pfiles
    )
    lem = t["lemma"].to_numpy(zero_copy_only=False)
    site_arr = t["site"].to_numpy(zero_copy_only=False)
    df = t["df"].to_numpy(zero_copy_only=False)
    sum_tf = t["sum_tf"].to_numpy(zero_copy_only=False)

    is_doclen = lem == DOCLEN_LEMMA
    n_docs = int(df[is_doclen].sum())
    total_len = int(sum_tf[is_doclen].sum())

    import pandas as pd

    # per-site stats from the site sentinels (df = site n_docs, sum_tf =
    # site total_len; shards/segments are doc-disjoint so sums are exact).
    # NB: np.char.startswith treats a "\x00" prefix as empty (NUL-terminated
    # C semantics) and matches EVERYTHING — use pandas str ops instead.
    lem_s = pd.Series(lem, dtype=object)
    is_site = lem_s.str.startswith(SITE_PREFIX).to_numpy()
    sites: dict[str, dict] = {}
    for l, d, s in zip(lem[is_site], df[is_site], sum_tf[is_site]):
        e = sites.setdefault(l[len(SITE_PREFIX):], {"n_docs": 0, "total_len": 0})
        e["n_docs"] += int(d)
        e["total_len"] += int(s)
    for e in sites.values():
        e["avgdl"] = (e["total_len"] / e["n_docs"]) if e["n_docs"] else 0.0

    is_sentinel = lem_s.str.startswith("\x00").to_numpy()
    dict_df = (
        pd.DataFrame(
            {"lemma": lem[~is_sentinel], "df": df[~is_sentinel], "cf": sum_tf[~is_sentinel]}
        )
        .groupby("lemma", as_index=False)
        .sum()
        .sort_values("lemma", kind="stable")
    )
    tmp = os.path.join(index_dir, "dictionary.parquet.tmp")
    pq.write_table(pa.Table.from_pandas(dict_df, preserve_index=False), tmp)
    _replace_path(tmp, os.path.join(index_dir, "dictionary.parquet"))

    # Per-site term dictionary (reference `lemma` table keyed (lemma,
    # site_id), Repositories/LemmaRepository.java:25-30): exact per-site df
    # straight from the per-(lemma, site) encoded segments — this is what
    # makes site-scoped gates/idf identical across shard-subset readers.
    site_dict_path = os.path.join(index_dir, "dictionary_sites.parquet")
    site_rows = (~is_sentinel) & (site_arr != "")
    if site_rows.any():
        sdict = (
            pd.DataFrame(
                {
                    "site": site_arr[site_rows],
                    "lemma": lem[site_rows],
                    "df": df[site_rows],
                    "cf": sum_tf[site_rows],
                }
            )
            .groupby(["site", "lemma"], as_index=False)
            .sum()
            .sort_values(["site", "lemma"], kind="stable")
        )
        tmp = site_dict_path + ".tmp"
        pq.write_table(pa.Table.from_pandas(sdict, preserve_index=False), tmp)
        _replace_path(tmp, site_dict_path)
    elif os.path.isdir(site_dict_path):
        shutil.rmtree(site_dict_path, ignore_errors=True)
    elif os.path.exists(site_dict_path):
        os.remove(site_dict_path)  # idempotent finalize after config change

    manifest = {
        "version": 1,
        # build epoch: every finalize mints a fresh id; upsert generations
        # are stamped with it and DeltaView/load_state ignore generations
        # whose epoch doesn't match the loaded manifest — this makes the
        # post-finalize clear_delta logically atomic with finalize (a crash
        # in between can no longer leave stale upserts, keyed to the OLD
        # conv ranking, durably overlaid on the rebuilt index)
        "build_id": build_id or _uuid.uuid4().hex,
        "n_docs": n_docs,
        "total_len": total_len,
        "avgdl": (total_len / n_docs) if n_docs else 0.0,
        "n_lemmas": int(len(dict_df)),
        "analyzer": config.analyzer,
        "k1": config.k1,
        "b": config.b,
        "search_filter": config.search_filter,
        "num_segments": config.num_segments,
        "num_buckets": config.num_buckets,
        "block_size": config.block_size,
        "site_column": config.site_column,
        "html_content": config.html_content,
        "morphology": morph_sig if morph_sig is not None else _morph_sig(),
        # which extraction rules produced the stored text of an
        # html_content index (None for plain-text builds): powers the
        # cmd_reindex keep_delta gate exactly like "morphology" does —
        # without it an extractor-rule upgrade would preserve an upsert
        # overlay over shards that all rebuild under different rules
        "html_extractor": _extractor_version() if config.html_content else None,
        "sites": sites,
        "shards": shard_manifests,
    }
    tmp = os.path.join(index_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))
    return manifest


STOP_FLAG = "STOP"


def request_stop(index_dir: str) -> str:
    """Cooperative stop (reference ``GET /api/stopIndexing``,
    ``services/IndexingServiceImpl.java:98-107``): drop a flag file the
    running build polls between shards. The build finishes in-flight shards
    (each is an atomic resume unit), skips the rest, and returns a
    resumable partial status — a later ``build_index`` picks up exactly
    where it stopped."""
    os.makedirs(index_dir, exist_ok=True)
    path = os.path.join(index_dir, STOP_FLAG)
    with open(path, "w") as f:
        f.write("stop requested\n")
    return path


def build_index(
    input_path: str | list[str],
    index_dir: str,
    config: EngineConfig = DEFAULT_CONFIG,
    validate_unique_keys: bool = False,
    stop_check=None,
    input_format: str | None = None,
    keep_delta: bool = False,
) -> dict:
    """Build (or resume) the full index. Returns the global manifest.

    Resume contract (SURVEY.md §4 checkpoint row): shards whose
    ``_MANIFEST.json`` is complete are skipped; the finalize step is
    idempotent (recomputed from shard outputs every run). Input must be
    duplicate-free on ``(conv_id, turn_idx)`` — violations silently inflate
    df/doc counts, so ``validate_unique_keys=True`` adds one counting pass
    (a groupby over the key columns) that raises before building. The D4
    first-wins dedup itself is a caller-side
    ``groupby(["conv_id","turn_idx"]).map_groups(take_first)`` when inputs
    may legitimately contain duplicates.

    Cooperative stop: ``stop_check`` (default: the ``STOP`` flag file in
    ``index_dir``, written by ``request_stop`` / the ``stop`` CLI) is polled
    before each shard launch; when it fires, in-flight shards complete,
    remaining shards are skipped, and the return value is
    ``{"stopped": True, "shards": [...completed...]}`` with no finalize —
    the next ``build_index`` resumes partition-exactly.
    """
    from searchengine_ray import sources

    files, fmt = sources.expand_input(input_path, input_format)
    os.makedirs(index_dir, exist_ok=True)

    # Snapshot the morphology state ONCE, at entry: every later consumer —
    # per-shard cfg_sig, the ExplodePostings actor tables, the finalize
    # manifest — uses this snapshot, so a use_lemma_table call concurrent
    # with a running build (e.g. the HTTP server builds in a background
    # thread) can no longer stamp the manifest with a signature that
    # disagrees with the tables the shards were built under (code-review
    # r4). None = bundled tables, identical in every worker process.
    from searchengine_ray import textproc as _tp

    lemma_snapshot = _tp._LEMMA_TABLE
    # sign the RESOLVED dict (bundled when no custom table), not the live
    # global, so the signature is computed from exactly the object shipped
    morph_snapshot = _tp.morphology_signature(
        lemma_snapshot if lemma_snapshot is not None else _tp._lemma_table()
    )

    # A (re)build from inputs supersedes any doc-level upsert overlay: delta
    # generations are relative to the PREVIOUS finalized index (compaction
    # path — delta.py module docstring). The clear is deferred to AFTER a
    # successful finalize: a build that is cooperatively stopped, crashes, or
    # never finalizes must leave the still-serving index's upserts intact.
    # ``keep_delta=True`` (cmd_reindex over unchanged recorded inputs)
    # preserves the overlay even after finalize — the rebuild reproduces the
    # exact index the generations are relative to, so they stay valid.

    stop_path = os.path.join(index_dir, STOP_FLAG)
    if stop_check is None:
        # a fresh build consumes any stale flag, then polls for new ones
        if os.path.exists(stop_path):
            os.remove(stop_path)
        stop_check = lambda: os.path.exists(stop_path)  # noqa: E731

    # Poll once at entry, BEFORE any destructive work: build_conv_dict
    # invalidates all shard outputs when the input introduces new conv_ids
    # (rank shift), so a stop requested before the build starts must win
    # without touching the still-serving index.
    if stop_check():
        return {"stopped": True, "status": "stopped", "shards": [], "n_shards_total": 0}

    if validate_unique_keys:
        with _DATASET_CTOR_LOCK:
            keys = sources.read_dataset(files, fmt, ["conv_id", "turn_idx"])
        n_rows = keys.count()
        n_distinct = keys.groupby(["conv_id", "turn_idx"]).count().count()
        if n_distinct != n_rows:
            raise ValueError(
                f"input has {n_rows - n_distinct} duplicate (conv_id, turn_idx) keys; "
                "dedup first (groupby first-wins) or fix the upstream writer"
            )

    import ray

    conv_arr = build_conv_dict(files, index_dir, fmt)
    # workers memory-map what build_conv_dict wrote (the index dir is
    # shared storage on a real cluster) — no broadcast, no copies: the
    # sharded conv_dict/ part files on the scale path, the single npy
    # sidecar on the small/legacy path
    from searchengine_ray import convdict as _convdict

    _sharded_dir = _convdict.dict_dir(index_dir)
    conv_path = (
        _sharded_dir
        if os.path.exists(os.path.join(_sharded_dir, _convdict.META_FILE))
        else os.path.join(index_dir, "conv_dict.npy")
    )
    n_convs = len(conv_arr)

    shards = _shard_files(files, config.num_shards)
    # Prune shard outputs beyond the current shard count (shrunk input or
    # lowered num_shards): _finalize and IndexReader consume every directory
    # under shards/, so orphans would serve stale/duplicate documents.
    shards_root = os.path.join(index_dir, "shards")
    if os.path.isdir(shards_root):
        expected = {f"shard={i:05d}" for i in range(len(shards))}
        for name in os.listdir(shards_root):
            if name.split(".")[0] not in expected:
                shutil.rmtree(os.path.join(shards_root, name), ignore_errors=True)
    # Shards build concurrently (driver threads, one streaming Dataset job
    # each); Ray's scheduler interleaves their tasks, so a small shard's job
    # overhead overlaps a big shard's compute. On a multi-node cluster this
    # is the per-shard pipeline schedule; each shard stays an independent
    # resume unit either way.
    # guarded auto-init (the driver contract: never OWN a session, but Ray
    # Data would auto-init on the first Dataset op anyway — cluster_resources
    # is just called earlier and doesn't auto-init on its own)
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    cpus = int(ray.cluster_resources().get("CPU", 4))
    # ≥4 CPUs per concurrent shard job, else concurrent fixed-size pools can
    # over-demand a small session and deadlock each other
    workers = max(1, min(config.build_concurrency, len(shards), cpus // 4))
    if isinstance(config.lemmatizer_concurrency, tuple):
        # Re-bound the autoscaling range per concurrent shard job: raise the
        # MIN so the pool starts near its budget (Ray Data's autoscaler
        # ramps far too slowly for short jobs — observed 4× explode-stage
        # underutilization from a min of 2), and cap the MAX so concurrent
        # shard jobs + their doc-store sorts keep CPU headroom.
        lo, hi = config.lemmatizer_concurrency
        budget = max(1, (cpus - 2 * workers) // workers - 1)
        new_lo = max(1, min(max(lo, (2 * budget) // 3), hi, budget))
        new_hi = max(new_lo, min(hi, budget))
        config = config.replace(lemmatizer_concurrency=(new_lo, new_hi))
    if config.shuffle_partitions is None:
        config = config.replace(shuffle_partitions=max(8, min(128, 2 * cpus // workers)))

    # One object-store copy of a custom lemma table per BUILD (actors fetch
    # from their node's store), not one driver pickle per actor per shard
    # pool — a full OpenCorpora-scale table is hundreds of MB.
    lemma_ref = ray.put(lemma_snapshot) if lemma_snapshot is not None else None

    def _guarded(i: int, s: list[str]):
        # polled at shard LAUNCH — in-flight shards always run to completion
        # (each is an atomic checkpoint), so stop never loses work
        if stop_check():
            return None
        return _build_shard(
            i, s, index_dir, conv_path, n_convs, config, fmt,
            lemma_ref=lemma_ref, morph_sig=morph_snapshot,
        )

    if workers <= 1:
        manifests = [_guarded(i, s) for i, s in enumerate(shards)]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            manifests = list(
                pool.map(lambda arg: _guarded(arg[0], arg[1]), enumerate(shards))
            )
    done = [m for m in manifests if m is not None]
    if len(done) < len(shards):
        # no finalize → delta overlay untouched; the serving index keeps its
        # upserts and the next build resumes partition-exactly
        return {
            "stopped": True,
            "status": "stopped",
            "shards": done,
            "n_shards_total": len(shards),
        }
    new_build_id = _uuid.uuid4().hex
    if keep_delta:
        # widen the overlay's epoch stamp to {old, new} BEFORE the manifest
        # replace so a crash on either side of finalize can't drop a
        # provably-valid overlay (collapsed back to {new} below)
        from searchengine_ray.delta import pre_rebind_delta_epoch

        pre_rebind_delta_epoch(index_dir, new_build_id)
    manifest = _finalize(
        index_dir, config, done, build_id=new_build_id, morph_sig=morph_snapshot
    )
    if not keep_delta:
        from searchengine_ray.delta import clear_delta

        clear_delta(index_dir)
    else:
        # the caller proved the overlay survives this finalize (unchanged
        # input fingerprints ⇒ identical conv ranking); adopt the new epoch
        from searchengine_ray.delta import rebind_delta_epoch

        rebind_delta_epoch(index_dir, new_build_id)
    return manifest
