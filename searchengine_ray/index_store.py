"""On-disk index layout + reader.

Layout written by :mod:`searchengine_ray.build`::

    index_dir/
      manifest.json            # global stats + per-shard lineage (resume unit)
      conv_dict.parquet        # ascending conv_id; row index == conv_rank
      conv_dict.npy            # mmap-able fixed-width sidecar of the same
      conv_dict/               # OR (large builds) the range-sharded layout:
        meta.json              #   boundaries + per-part counts (convdict.py)
        part-NNNNN.npy         #   sorted fixed-width ids, mmapped on demand
      dictionary.parquet       # (lemma, df, cf) ascending lemma
      shards/shard=K/
        _MANIFEST.json         # shard lineage: input files, counts, timings
        postings/*.parquet     # (lemma, seg, bucket, df, sum_tf, blobs…)
        docs/*.parquet         # doc store sorted by docid (hydration)

Replaces the reference's four Postgres tables (SURVEY.md §1.1): `lemma` →
dictionary.parquet, `index` → encoded posting segments, `page` → doc store,
`site` → manifest. The reader keeps the dictionary + conv dict + doc lengths
warm in memory (ST7 QueryActor state, SURVEY.md §2.3) and point-reads posting
segments per query with an LRU cache — query terms are few, so posting
fetches are targeted parquet reads (row-group pruned by lemma, which the
build's groupby sort clusters), never a shuffle (SURVEY.md §2.4 J1/J2).
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_ray.build import DOCLEN_LEMMA, SITE_PREFIX, list_shard_names
from searchengine_ray.codec import EncodedPostings, decode_postings

_POSTING_COLS = [
    "lemma",
    "site",
    "seg",
    "df",
    "doc_blob",
    "tf_blob",
    "block_last_docid",
    "block_max_tf",
    "block_doc_off",
    "block_tf_off",
]


class IndexReader:
    """Warm-state reader over a built index directory."""

    def __init__(
        self,
        index_dir: str,
        postings_cache_size: int = 256,
        shards: list[str] | None = None,
        delta_docs: bool = True,
    ):
        """``shards`` restricts the reader to a subset of shard directory
        names (e.g. ``["shard=00000"]``) — the partition-serving mode:
        shards are doc-disjoint, so per-shard match sets union exactly, while
        global stats (N, avgdl, df) always come from the full manifest and
        dictionary so BM25 scores are identical to whole-index evaluation.

        ``delta_docs=False`` makes this reader a NON-OWNER of the doc-level
        upsert overlay: supersede filtering and stat/df adjustments still
        apply (score-identical across a fan-out), but delta docs themselves
        are served by exactly one (owner) reader — see
        ``ShardedQueryService``."""
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.n_docs: int = self.manifest["n_docs"]
        self.avgdl: float = self.manifest["avgdl"]

        # conv dictionary: prefer the fixed-width npy sidecar, MEMORY-MAPPED
        # (no per-string Python objects on open); legacy indexes fall back
        # to the parquet column
        conv_sharded = os.path.join(index_dir, "conv_dict")
        conv_npy = os.path.join(index_dir, "conv_dict.npy")
        if os.path.exists(os.path.join(conv_sharded, "meta.json")):
            # range-sharded dictionary (large builds): parts mmap lazily,
            # hydration touches only the parts its ranks land in
            from searchengine_ray.convdict import ShardedConvArray

            self._conv_main = ShardedConvArray(conv_sharded)
        elif os.path.exists(conv_npy):
            self._conv_main = np.load(conv_npy, mmap_mode="r")
        else:
            self._conv_main = pq.read_table(
                os.path.join(index_dir, "conv_dict.parquet")
            )["conv_id"].to_numpy(zero_copy_only=False)
        self.conv_ids = self._conv_main

        # doc-level upsert overlay (delta generations + supersede sets):
        # stats below fold in the delta adjustments so gates/idf/avgdl are
        # exactly those of the UPDATED corpus (delta.py module docstring)
        from searchengine_ray import delta as _delta

        state = _delta.load_state(index_dir)
        self.delta = _delta.DeltaView(index_dir, state, docs=delta_docs) if state else None
        if self.delta is not None:
            self.n_docs += self.delta.n_docs_delta
            total_len = int(self.manifest["total_len"]) + self.delta.total_len_delta
            self.avgdl = (total_len / self.n_docs) if self.n_docs else 0.0
            if self.delta.conv_delta is not None:
                self.conv_ids = _delta.ConvIdsView(
                    self._conv_main, self.delta.conv_delta
                )

        # Dictionary access: small vocabularies load eagerly (one dict, no
        # per-term I/O); past the threshold the reader goes LAZY — per-term
        # pushdown point reads against the lemma-sorted dictionary parquet
        # (row-group stats prune to ~one group), memoized. A query touches
        # a handful of terms, so serving never needs the vocabulary in
        # memory — the 10^9-lemma reader shape.
        self._dict_path = os.path.join(index_dir, "dictionary.parquet")
        n_lemmas = int(self.manifest.get("n_lemmas", 0))
        self._df_cache: dict[str, int] = {}
        self._dict_eager = n_lemmas <= self._EAGER_DICT_MAX
        if self._dict_eager:
            dt = pq.read_table(self._dict_path, columns=["lemma", "df"])
            self._df_cache = dict(
                zip(
                    dt["lemma"].to_pylist(),
                    dt["df"].to_numpy(zero_copy_only=False).tolist(),
                )
            )

        # exact shard=NNNNN names only — never consume a stale .tmp leftover
        all_shards = list_shard_names(os.path.join(index_dir, "shards"))
        if shards is not None:
            unknown = set(shards) - set(all_shards)
            if unknown:
                raise ValueError(f"unknown shards: {sorted(unknown)}")
            all_shards = sorted(shards)
        self.shard_names = all_shards
        self._shard_posting_dirs = [
            os.path.join(index_dir, "shards", s, "postings") for s in all_shards
        ]
        self._doc_dirs = [
            os.path.join(index_dir, "shards", s, "docs") for s in all_shards
        ]

        self._cache: OrderedDict[str, list[EncodedPostings]] = OrderedDict()
        self._cache_size = postings_cache_size

        # Doc lengths (BM25 norms; the Lucene-norms analogue): per-shard
        # docid-sorted ``.npy`` sidecars, MEMORY-MAPPED — opening the reader
        # never decodes or heap-loads the norms; the OS pages them in on
        # demand. Older layouts without sidecars fall back to a one-time
        # sentinel decode.
        self._dl_parts: list[tuple[np.ndarray, np.ndarray]] = []
        sidecars_ok = all(
            os.path.exists(os.path.join(index_dir, "shards", s, "norms_docid.npy"))
            for s in all_shards
        )
        if sidecars_ok and all_shards:
            for s in all_shards:
                d = np.load(
                    os.path.join(index_dir, "shards", s, "norms_docid.npy"),
                    mmap_mode="r",
                )
                l = np.load(
                    os.path.join(index_dir, "shards", s, "norms_dl.npy"),
                    mmap_mode="r",
                )
                if d.size:
                    self._dl_parts.append((d, l))
        else:  # legacy layout: decode the sentinel segments once
            segs = self.postings_segments(DOCLEN_LEMMA)
            if segs:
                parts = [decode_postings(e) for e in segs]
                docids = np.concatenate([p[0] for p in parts])
                dls = np.concatenate([p[1] for p in parts])
                order = np.argsort(docids, kind="stable")
                self._dl_parts.append((docids[order], dls[order]))
        if self.delta is not None:
            # ascending generations AFTER main: ``doc_lengths`` assigns per
            # part in list order, so the latest writer (newest generation)
            # wins for a replaced docid
            self._dl_parts.extend(self.delta.gen_norms)

    # -- dictionary -----------------------------------------------------

    _EAGER_DICT_MAX = 4_000_000  # lemmas; beyond this the dictionary is lazy

    def df(self, lemma: str) -> int:
        base = self._df_base(lemma)
        if self.delta is not None:
            return base + self.delta.df_delta.get(lemma, 0)
        return base

    def _df_base(self, lemma: str) -> int:
        hit = self._df_cache.get(lemma)
        if hit is not None:
            return hit
        if self._dict_eager:
            return 0
        t = pq.read_table(
            self._dict_path, columns=["lemma", "df"], filters=[("lemma", "=", lemma)]
        )
        val = int(t["df"][0].as_py()) if t.num_rows else 0
        self._df_cache[lemma] = val
        return val

    def has(self, lemma: str) -> bool:
        return self.df(lemma) > 0

    @property
    def df_map(self) -> dict[str, int]:
        """Full lemma → df dict (loads the whole dictionary — test/debug
        surface; the serving path uses per-term ``df``)."""
        if not self._dict_eager and len(self._df_cache) < self.manifest.get("n_lemmas", 0):
            dt = pq.read_table(self._dict_path, columns=["lemma", "df"])
            self._df_cache = dict(
                zip(
                    dt["lemma"].to_pylist(),
                    dt["df"].to_numpy(zero_copy_only=False).tolist(),
                )
            )
        if self.delta is not None:
            out = dict(self._df_cache)
            for lemma, ddf in self.delta.df_delta.items():
                out[lemma] = out.get(lemma, 0) + ddf
            return {l: v for l, v in out.items() if v > 0}
        return self._df_cache

    # -- postings -------------------------------------------------------

    def _posting_rg_index(self):
        """Footer-statistics index over the posting files: per row group the
        (bucket_min, bucket_max) range plus (file, rg). Built once — posting
        files are written in (bucket, seg) shuffle-key order with small row
        groups, so a term's segments live in very few row groups and a point
        read decodes only those."""
        if getattr(self, "_prg_meta", None) is not None:
            return self._prg_meta
        files: list[str] = []
        lo: list[int] = []
        hi: list[int] = []
        fidx: list[int] = []
        rgidx: list[int] = []
        for d in self._shard_posting_dirs:
            for name in sorted(os.listdir(d)):
                if not name.endswith(".parquet"):
                    continue
                path = os.path.join(d, name)
                meta = pq.read_metadata(path)
                col = meta.schema.to_arrow_schema().get_field_index("bucket")
                fi = len(files)
                files.append(path)
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(col).statistics
                    lo.append(int(st.min))
                    hi.append(int(st.max))
                    fidx.append(fi)
                    rgidx.append(rg)
        self._prg_meta = (lo, hi, fidx, rgidx, files)
        return self._prg_meta

    def postings_segments(self, lemma: str, site: str | None = None) -> list[EncodedPostings]:
        """All encoded segments of a lemma, in (shard, seg) order. Segments
        within a shard are docid-range-disjoint and ascending (range salt);
        across shards docid ranges may interleave — callers merge. ``site``
        restricts to one corpus partition's per-(lemma, site) segments
        (global reads concatenate every site's segments — identical
        postings either way because sites partition the docs)."""
        from searchengine_ray.build import lemma_bucket

        key = lemma if site is None else f"{site}\x01{lemma}"
        cached = self._cache.get(key)
        if cached is not None:
            self._cache.move_to_end(key)
            return cached
        bucket = lemma_bucket(lemma, self.manifest["num_buckets"])
        lo, hi, fidx, rgidx, files = self._posting_rg_index()
        tables = []
        for i in range(len(lo)):
            if lo[i] <= bucket <= hi[i]:
                path = files[fidx[i]]
                t = pq.ParquetFile(path).read_row_group(rgidx[i], columns=_POSTING_COLS)
                mask = np.asarray(t["lemma"].to_numpy(zero_copy_only=False) == lemma)
                if site is not None:
                    mask &= t["site"].to_numpy(zero_copy_only=False) == site
                if mask.any():
                    tables.append(((path, rgidx[i]), t.filter(pa.array(mask))))
        segs: list[EncodedPostings] = []
        # (shard-path, row-group) sort groups a shard's segments together;
        # consumers re-sort postings by docid, so exact seg order is cosmetic
        for _, t in sorted(tables, key=lambda x: x[0]):
            order = np.argsort(t["seg"].to_numpy(zero_copy_only=False), kind="stable")
            for i in order:
                segs.append(
                    EncodedPostings(
                        n=int(t["df"][int(i)].as_py()),
                        doc_blob=t["doc_blob"][int(i)].as_py(),
                        tf_blob=t["tf_blob"][int(i)].as_py(),
                        block_last_docid=t["block_last_docid"][int(i)].as_py(),
                        block_max_tf=t["block_max_tf"][int(i)].as_py(),
                        block_doc_off=t["block_doc_off"][int(i)].as_py(),
                        block_tf_off=t["block_tf_off"][int(i)].as_py(),
                    )
                )
        if not lemma.startswith("\x00"):  # sentinels have their own caches
            self._cache[key] = segs
            if len(self._cache) > self._cache_size:
                self._cache.popitem(last=False)
        return segs

    # Decoded-postings LRU: hot lemmas (stopword-scale df) cost tens of ms
    # to re-decode per query; cache the decoded arrays under a byte budget.
    # Sized for a dedicated serving actor (a handful of stopword-scale lists
    # on a 10M-doc partition ≈ hundreds of MB); undersizing thrashes — a
    # re-decode costs more than the block path it replaced.
    _DECODED_BUDGET = 1 << 30

    def decode_lemma(self, lemma: str, site: str | None = None) -> tuple[np.ndarray, np.ndarray]:
        """Full (docids, tfs) for a lemma, globally docid-sorted; ``site``
        scopes to one corpus partition's per-(lemma, site) segments. With a
        delta overlay present, main postings of superseded docids drop and
        the generations' postings merge in — the decoded view IS the
        updated corpus. Decoded arrays are LRU-cached under a byte budget
        (callers never mutate them in place)."""
        if not hasattr(self, "_dec_cache"):
            self._dec_cache: OrderedDict[str, tuple[np.ndarray, np.ndarray]] = OrderedDict()
            self._dec_bytes = 0
        key = lemma if site is None else f"{site}\x01{lemma}"
        hit = self._dec_cache.get(key)
        if hit is not None:
            self._dec_cache.move_to_end(key)
            return hit
        segs = self.postings_segments(lemma, site=site)
        parts = [decode_postings(e) for e in segs]
        if parts:
            docids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            if len(parts) > 1:
                order = np.argsort(docids, kind="stable")
                docids, tfs = docids[order], tfs[order]
        else:
            docids = np.empty(0, dtype=np.int64)
            tfs = np.empty(0, dtype=np.int64)
        if self.delta is not None:
            docids, tfs = self.delta.filter_main(docids, tfs)
            gd, gt = self.delta.gen_lemma_postings(lemma, site)
            if gd.size:
                docids = np.concatenate([docids, gd])
                tfs = np.concatenate([tfs, gt])
                order = np.argsort(docids, kind="stable")
                docids, tfs = docids[order], tfs[order]
        if docids.size == 0:
            return docids, tfs
        nbytes = docids.nbytes + tfs.nbytes
        if nbytes < self._DECODED_BUDGET:
            self._dec_cache[key] = (docids, tfs)
            self._dec_bytes += nbytes
            while self._dec_bytes > self._DECODED_BUDGET and self._dec_cache:
                _, (d, t) = self._dec_cache.popitem(last=False)
                self._dec_bytes -= d.nbytes + t.nbytes
        return docids, tfs

    # -- doc lengths ----------------------------------------------------

    def decoded_if_cached(self, lemma: str):
        """Decoded (docids, tfs) if already in the decoded LRU, else None —
        lets the intersection skip block selection for hot cached terms."""
        cache = getattr(self, "_dec_cache", None)
        if cache is None:
            return None
        hit = cache.get(lemma)
        if hit is not None:
            cache.move_to_end(lemma)
        return hit

    def doc_lengths(self, docids: np.ndarray) -> np.ndarray:
        """dl per docid: each shard's sorted norms array is probed with one
        vectorized searchsorted (shards are doc-disjoint, so every docid
        resolves in exactly one part)."""
        out = np.zeros(docids.size, dtype=np.int64)
        for d_arr, l_arr in self._dl_parts:
            pos = np.searchsorted(d_arr, docids)
            pos_c = np.minimum(pos, d_arr.size - 1)
            m = (d_arr[pos_c] == docids) & (pos < d_arr.size)
            if m.any():
                out[m] = l_arr[pos_c[m]]
        return out

    @property
    def _dl_docids(self) -> np.ndarray:
        """Concatenated sorted norms docids (test/debug surface)."""
        if not self._dl_parts:
            return np.empty(0, dtype=np.int64)
        d = np.concatenate([np.asarray(p[0]) for p in self._dl_parts])
        return np.sort(d, kind="stable")

    @property
    def _dl(self) -> np.ndarray:
        """dl aligned with ``_dl_docids`` (test/debug surface)."""
        if not self._dl_parts:
            return np.empty(0, dtype=np.int64)
        d = np.concatenate([np.asarray(p[0]) for p in self._dl_parts])
        l = np.concatenate([np.asarray(p[1]) for p in self._dl_parts])
        return l[np.argsort(d, kind="stable")].astype(np.int64)

    # -- site (corpus-partition) scoping --------------------------------

    @property
    def sites(self) -> dict[str, dict]:
        """Per-site stats from the manifest: {site: {n_docs, total_len,
        avgdl}} (built from the site sentinel postings; empty when the index
        was built without ``site_column``), with delta adjustments folded in."""
        base = self.manifest.get("sites", {}) or {}
        if self.delta is not None:
            return self.delta.adjust_sites(base)
        return base

    def site_df_map(self, site: str) -> dict[str, int]:
        """lemma → df within one site, from the GLOBAL per-site dictionary
        (``dictionary_sites.parquet``) — identical in every shard-subset
        reader, which keeps site-scoped gates/idf exact under partition
        serving. Loaded lazily per site (row-group pushdown on ``site``)."""
        cache = getattr(self, "_site_df_cache", None)
        if cache is None:
            cache = self._site_df_cache = {}
        hit = cache.get(site)
        if hit is not None:
            return hit
        path = os.path.join(self.index_dir, "dictionary_sites.parquet")
        if not os.path.exists(path):
            out: dict[str, int] = {}
        else:
            t = pq.read_table(
                path, columns=["lemma", "df"], filters=[("site", "=", site)]
            )
            out = dict(
                zip(
                    t["lemma"].to_pylist(),
                    t["df"].to_numpy(zero_copy_only=False).tolist(),
                )
            )
        if self.delta is not None:
            for lemma, ddf in self.delta.site_df_delta.get(site, {}).items():
                out[lemma] = out.get(lemma, 0) + ddf
            out = {l: v for l, v in out.items() if v > 0}
        cache[site] = out
        return out

    def site_postings(self, site: str) -> tuple[np.ndarray, np.ndarray]:
        """(docids, dls) of one partition's docs, docid-sorted and aligned —
        the decoded ``\\x00site=<value>`` sentinel. Cached per site (site
        cardinality is low by contract)."""
        cache = getattr(self, "_site_cache", None)
        if cache is None:
            cache = self._site_cache = {}
        hit = cache.get(site)
        if hit is not None:
            return hit
        segs = self.postings_segments(SITE_PREFIX + site)
        parts = [decode_postings(e) for e in segs]
        if parts:
            docids = np.concatenate([p[0] for p in parts])
            dls = np.concatenate([p[1] for p in parts])
        else:
            docids = np.empty(0, dtype=np.int64)
            dls = np.empty(0, dtype=np.int64)
        if self.delta is not None:
            docids, dls = self.delta.filter_main(docids, dls)
            gd, gt = self.delta.gen_lemma_postings(SITE_PREFIX + site, None)
            if gd.size:
                docids = np.concatenate([docids, gd])
                dls = np.concatenate([dls, gt])
        order = np.argsort(docids, kind="stable")
        out = (docids[order], dls[order])
        cache[site] = out
        return out

    # -- doc store ------------------------------------------------------

    _DOC_COLS = ["docid", "conv_id", "turn_idx", "role", "text"]

    def _doc_rg_index(self):
        """Row-group index over the docid-sorted doc store: parallel arrays
        (rg_min_docid, rg_max_docid, file_idx, rg_idx), globally sorted by
        min docid. Built once from parquet footer statistics — O(row groups)
        memory, never O(docs); the scale path is the same metadata held per
        docid-range-owning serving actor."""
        if getattr(self, "_rg_meta", None) is not None:
            return self._rg_meta
        files: list[str] = []
        mins: list[int] = []
        maxs: list[int] = []
        fidx: list[int] = []
        rgidx: list[int] = []
        for d in self._doc_dirs:
            for name in sorted(os.listdir(d)):
                if not name.endswith(".parquet"):
                    continue
                path = os.path.join(d, name)
                meta = pq.read_metadata(path)
                fi = len(files)
                files.append(path)
                col = meta.schema.to_arrow_schema().get_field_index("docid")
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(col).statistics
                    mins.append(int(st.min))
                    maxs.append(int(st.max))
                    fidx.append(fi)
                    rgidx.append(rg)
        order = np.argsort(np.asarray(mins, dtype=np.int64), kind="stable")
        self._rg_meta = (
            np.asarray(mins, dtype=np.int64)[order],
            np.asarray(maxs, dtype=np.int64)[order],
            np.asarray(fidx, dtype=np.int64)[order],
            np.asarray(rgidx, dtype=np.int64)[order],
            files,
        )
        self._rg_cache: OrderedDict[tuple[int, int], dict] = OrderedDict()
        return self._rg_meta

    def _read_row_group(self, fi: int, rg: int, files: list[str]) -> dict:
        """One decoded row group as {docid_sorted: np.ndarray, table}, LRU'd."""
        key = (fi, rg)
        hit = self._rg_cache.get(key)
        if hit is not None:
            self._rg_cache.move_to_end(key)
            return hit
        t = pq.ParquetFile(files[fi]).read_row_group(rg, columns=self._DOC_COLS)
        ids = t["docid"].to_numpy(zero_copy_only=False)
        entry = {"ids": ids, "table": t}
        self._rg_cache[key] = entry
        if len(self._rg_cache) > 64:
            self._rg_cache.popitem(last=False)
        return entry

    def fetch_docs(self, docids: list[int]) -> dict[int, dict]:
        """Point-hydration of result docs (J3, SearchServiceImpl.java:176):
        footer-statistics row-group pruning over the docid-sorted doc store —
        only row groups whose [min, max] straddles a wanted docid are read."""
        out: dict[int, dict] = {}
        if not docids:
            return out
        mins, maxs, fidx, rgidx, files = self._doc_rg_index()
        want = np.unique(np.asarray(docids, dtype=np.int64))
        # a row group is a candidate iff some wanted docid falls in [min, max]
        # (exact even when shard docid ranges interleave)
        lo = np.searchsorted(want, mins, side="left")
        hit = (lo < want.size) & (want[np.minimum(lo, want.size - 1)] <= maxs)
        hit_rg = np.nonzero(hit)[0]
        for p in hit_rg.tolist():
            entry = self._read_row_group(int(fidx[p]), int(rgidx[p]), files)
            ids = entry["ids"]
            # membership test, NOT binary search: a row group's ids are only
            # locally sorted per write batch (the build sorts within batches;
            # blocks may coalesce several), so ordering can't be assumed
            rows = np.nonzero(np.isin(ids, want))[0]
            if rows.size == 0:
                continue
            sub = entry["table"].take(rows)
            for row in sub.to_pylist():
                out[row["docid"]] = row
        if self.delta is not None:
            self.delta.fetch_docs_into(want, out)
        return out
