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
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_ray.config import DEFAULT_CONFIG, EngineConfig
from searchengine_ray.keys import TURN_BITS, TURN_MASK
from searchengine_ray.textproc import Analyzer

# Sentinel "lemma" whose postings are (docid, doc_len) pairs; \x00 cannot
# appear in a real token (the tokenizer strips it), so no collision.
DOCLEN_LEMMA = "\x00doclen"
_GKEY_SEP = "\x01"

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


def build_conv_dict(files: list[str], index_dir: str) -> np.ndarray:
    """Dense-rank all conv_ids (ascending) → ``conv_dict.parquet``.

    Column-pruned read of just ``conv_id``. At sandbox scale the distinct set
    comes back to the driver; at 10^12-turn scale this pass would stay
    distributed (sort distinct + cumulative offsets) — the output contract
    (rank = row index of the ascending-sorted parquet) is the same.
    """
    import ray.data as rd

    path = os.path.join(index_dir, "conv_dict.parquet")
    if os.path.exists(path):
        return pq.read_table(path)["conv_id"].to_numpy(zero_copy_only=False)
    ds = rd.read_parquet(files, columns=["conv_id"])
    convs = sorted(ds.unique("conv_id"))
    arr = np.array(convs, dtype=object)
    tmp = path + ".tmp"
    pq.write_table(pa.table({"conv_id": pa.array(arr, type=pa.string())}), tmp)
    os.replace(tmp, path)
    return arr


# ---------------------------------------------------------------------------
# Pass 1 — per-shard postings build
# ---------------------------------------------------------------------------


class ExplodePostings:
    """Actor-pool stage: transcripts batch → exploded posting rows.

    Emits one row per (doc, lemma) with tf, plus one sentinel row per doc
    carrying its length. Per-actor memo caches make lemmatization amortized
    O(1) per repeated surface form (Zipf makes the hit rate ~99%).
    """

    def __init__(self, conv_ranks_ref, n_convs: int, config: EngineConfig):
        import ray

        conv_arr = ray.get(conv_ranks_ref)
        self.rank: dict[str, int] = {c: i for i, c in enumerate(conv_arr)}
        self.n_convs = max(1, n_convs)
        self.config = config
        self.analyzer = Analyzer(config.analyzer)
        self._sig_memo: dict[str, bool] = {}
        self._lem_memo: dict[str, str] = {}

    def _doc_counts(self, text: str) -> dict[str, int]:
        counts: dict[str, int] = {}
        sig, lem = self._sig_memo, self._lem_memo
        analyzer = self.analyzer
        for w in analyzer.tokens(text):
            s = sig.get(w)
            if s is None:
                s = sig[w] = analyzer.significant(w)
            if not s:
                continue
            l = lem.get(w)
            if l is None:
                l = lem[w] = analyzer.lemma(w)
            counts[l] = counts.get(l, 0) + 1
        return counts

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch["conv_id"].to_pylist()
        turn_idx = batch["turn_idx"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        S = self.config.num_segments

        lemmas: list[str] = []
        docids: list[int] = []
        tfs: list[int] = []
        for c, t, x in zip(conv_ids, turn_idx, texts):
            r = self.rank[c]
            t = int(t)
            if t > TURN_MASK:
                raise ValueError(f"turn_idx {t} exceeds {TURN_MASK} (keys.TURN_BITS)")
            docid = (r << TURN_BITS) | t
            counts = self._doc_counts(x or "")
            dl = 0
            for l, tf in counts.items():
                lemmas.append(l)
                docids.append(docid)
                tfs.append(tf)
                dl += tf
            # sentinel doc-length row (also makes empty docs count toward N)
            lemmas.append(DOCLEN_LEMMA)
            docids.append(docid)
            tfs.append(dl)

        docid_arr = np.asarray(docids, dtype=np.int64)
        seg = ((docid_arr >> TURN_BITS) * S // self.n_convs).astype(np.int32)
        gkey = [f"{l}{_GKEY_SEP}{s}" for l, s in zip(lemmas, seg)]
        return pa.table(
            {
                "gkey": pa.array(gkey, type=pa.string()),
                "lemma": pa.array(lemmas, type=pa.string()),
                "seg": pa.array(seg, type=pa.int32()),
                "docid": pa.array(docid_arr, type=pa.int64()),
                "tf": pa.array(np.asarray(tfs, dtype=np.int32)),
            }
        )


def _make_encode_group(config: EngineConfig):
    """Reduce: one (lemma, seg) group → one encoded posting-segment row."""
    from searchengine_ray.codec import encode_postings

    block_size = config.block_size
    num_buckets = config.num_buckets

    def encode_group(group: pa.Table) -> pa.Table:
        lemma = group["lemma"][0].as_py()
        seg = group["seg"][0].as_py()
        docids = group["docid"].to_numpy(zero_copy_only=False)
        tfs = group["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(docids, kind="stable")
        docids, tfs = docids[order], tfs[order]
        enc = encode_postings(docids, tfs, block_size=block_size)
        return pa.table(
            {
                "lemma": pa.array([lemma], type=pa.string()),
                "seg": pa.array([seg], type=pa.int32()),
                "bucket": pa.array([lemma_bucket(lemma, num_buckets)], type=pa.int32()),
                "df": pa.array([int(docids.size)], type=pa.int64()),
                "sum_tf": pa.array([int(tfs.sum()) if tfs.size else 0], type=pa.int64()),
                "doc_blob": pa.array([enc.doc_blob], type=pa.binary()),
                "tf_blob": pa.array([enc.tf_blob], type=pa.binary()),
                "block_last_docid": pa.array([enc.block_last_docid], type=pa.binary()),
                "block_max_tf": pa.array([enc.block_max_tf], type=pa.binary()),
                "block_doc_off": pa.array([enc.block_doc_off], type=pa.binary()),
                "block_tf_off": pa.array([enc.block_tf_off], type=pa.binary()),
            }
        )

    return encode_group


def _shard_files(files: list[str], num_shards: int) -> list[list[str]]:
    """Deterministic contiguous split of the sorted file list."""
    num_shards = min(num_shards, len(files))
    per = (len(files) + num_shards - 1) // num_shards
    return [files[i * per : (i + 1) * per] for i in range(num_shards) if files[i * per : (i + 1) * per]]


def _build_shard(
    shard_id: int,
    files: list[str],
    index_dir: str,
    conv_ref,
    n_convs: int,
    config: EngineConfig,
) -> dict:
    import ray.data as rd

    shard_dir = os.path.join(index_dir, "shards", f"shard={shard_id:05d}")
    manifest_path = os.path.join(shard_dir, "_MANIFEST.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("status") == "complete":
            return m  # resume: partition already built

    t0 = time.time()
    tmp_dir = shard_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(os.path.join(tmp_dir, "postings"), exist_ok=True)

    with _DATASET_CTOR_LOCK:
        ds = rd.read_parquet(files, columns=["conv_id", "turn_idx", "text"])
    n_input = ds.count()  # parquet metadata — no scan
    exploded = ds.map_batches(
        ExplodePostings,
        fn_constructor_kwargs={
            "conv_ranks_ref": conv_ref,
            "n_convs": n_convs,
            "config": config,
        },
        batch_format="pyarrow",
        batch_size=config.batch_size,
        concurrency=config.lemmatizer_concurrency,
    )
    encoded = exploded.groupby("gkey").map_groups(
        _make_encode_group(config), batch_format="pyarrow"
    )
    # small row groups → lemma-filter point reads prune to a few row groups
    encoded.write_parquet(os.path.join(tmp_dir, "postings"), row_group_size=512)

    # Doc store for hydration/snippets: input + docid, sorted by docid so
    # parquet row-group stats give point reads (reference analogue: the
    # `page` table re-read at query time, SearchServiceImpl.java:176).
    def add_docid(batch: pa.Table, conv_ref=conv_ref) -> pa.Table:
        import ray

        conv_arr = ray.get(conv_ref)
        rank = {c: i for i, c in enumerate(conv_arr)}
        conv_ids = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        ranks = np.fromiter((rank[c] for c in conv_ids), dtype=np.int64, count=len(conv_ids))
        docid = (ranks << TURN_BITS) | turn
        return batch.append_column("docid", pa.array(docid, type=pa.int64()))

    with _DATASET_CTOR_LOCK:
        docs = rd.read_parquet(files, columns=["conv_id", "turn_idx", "role", "text"])
    # small row groups → query-time hydration decodes ~one row group per hit
    docs.map_batches(add_docid, batch_format="pyarrow").sort("docid").write_parquet(
        os.path.join(tmp_dir, "docs"), row_group_size=2048
    )

    manifest = {
        "shard": shard_id,
        "status": "complete",
        "input_files": files,
        "n_input_rows": int(n_input),
        "wall_sec": round(time.time() - t0, 3),
        "config": {
            "analyzer": config.analyzer,
            "num_segments": config.num_segments,
            "num_buckets": config.num_buckets,
            "block_size": config.block_size,
        },
    }
    with open(os.path.join(tmp_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    shutil.rmtree(shard_dir, ignore_errors=True)
    os.replace(tmp_dir, shard_dir)
    return manifest


# ---------------------------------------------------------------------------
# Finalize — dictionary + global stats manifest
# ---------------------------------------------------------------------------


def _finalize(index_dir: str, config: EngineConfig, shard_manifests: list[dict]) -> dict:
    """Aggregate per-(lemma, seg, shard) rows into the term dictionary and
    global BM25 stats. Segments/shards are doc-disjoint, so df sums exactly
    (replaces the reference's concurrent SQL upsert df maintenance,
    Repositories/LemmaRepository.java:25-30)."""
    shards_root = os.path.join(index_dir, "shards")
    frames = []
    for shard in sorted(os.listdir(shards_root)):
        p = os.path.join(shards_root, shard, "postings")
        frames.append(pq.read_table(p, columns=["lemma", "df", "sum_tf"]))
    t = pa.concat_tables(frames)
    lem = t["lemma"].to_numpy(zero_copy_only=False)
    df = t["df"].to_numpy(zero_copy_only=False)
    sum_tf = t["sum_tf"].to_numpy(zero_copy_only=False)

    is_doclen = lem == DOCLEN_LEMMA
    n_docs = int(df[is_doclen].sum())
    total_len = int(sum_tf[is_doclen].sum())

    import pandas as pd

    dict_df = (
        pd.DataFrame({"lemma": lem[~is_doclen], "df": df[~is_doclen], "cf": sum_tf[~is_doclen]})
        .groupby("lemma", as_index=False)
        .sum()
        .sort_values("lemma", kind="stable")
    )
    tmp = os.path.join(index_dir, "dictionary.parquet.tmp")
    pq.write_table(pa.Table.from_pandas(dict_df, preserve_index=False), tmp)
    os.replace(tmp, os.path.join(index_dir, "dictionary.parquet"))

    manifest = {
        "version": 1,
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
        "shards": shard_manifests,
    }
    tmp = os.path.join(index_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))
    return manifest


def build_index(
    input_path: str | list[str],
    index_dir: str,
    config: EngineConfig = DEFAULT_CONFIG,
) -> dict:
    """Build (or resume) the full index. Returns the global manifest.

    Resume contract (SURVEY.md §4 checkpoint row): shards whose
    ``_MANIFEST.json`` is complete are skipped; the finalize step is
    idempotent (recomputed from shard outputs every run). Input must be
    duplicate-free on ``(conv_id, turn_idx)``.
    """
    files = _expand_input(input_path)
    if not files:
        raise ValueError(f"no parquet files under {input_path}")
    os.makedirs(index_dir, exist_ok=True)

    import ray

    conv_arr = build_conv_dict(files, index_dir)
    conv_ref = ray.put(conv_arr)
    n_convs = len(conv_arr)

    shards = _shard_files(files, config.num_shards)
    # Shards build concurrently (driver threads, one streaming Dataset job
    # each); Ray's scheduler interleaves their tasks, so a small shard's job
    # overhead overlaps a big shard's compute. On a multi-node cluster this
    # is the per-shard pipeline schedule; each shard stays an independent
    # resume unit either way.
    cpus = int(ray.cluster_resources().get("CPU", 4))
    # ≥4 CPUs per concurrent shard job, else concurrent fixed-size pools can
    # over-demand a small session and deadlock each other
    workers = max(1, min(config.build_concurrency, len(shards), cpus // 4))
    if workers <= 1:
        manifests = [
            _build_shard(i, s, index_dir, conv_ref, n_convs, config)
            for i, s in enumerate(shards)
        ]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            manifests = list(
                pool.map(
                    lambda arg: _build_shard(
                        arg[0], arg[1], index_dir, conv_ref, n_convs, config
                    ),
                    enumerate(shards),
                )
            )
    return _finalize(index_dir, config, manifests)
