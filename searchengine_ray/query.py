"""Query engine: multi-lemma AND search with BM25 top-k over the built index.

Reference pipeline reproduced (``services/SearchServiceImpl.java:53-203``,
SURVEY.md §3.2), with the north star's scoring/skipping upgrades:

1. query analysis via the shared analyzer (M7, :91-97),
2. D2 all-lemmas-present gate (:105-107), D3 frequency gate with Java integer
   division + identifier bypass (:108-110, :269-274),
3. O1 rarest-lemma-first ordering (:112) with canonical (df, lemma) tie-break,
4. D1 conjunctive intersection (:126-137) — here over sorted compressed
   posting segments with **block skipping**: after the rarest list seeds the
   candidate set, each further lemma decodes only blocks whose
   ``last_docid`` straddles a candidate (``codec.blocks_for_candidates``) —
   the conjunctive form of block-max evaluation; candidate set shrinks
   monotonically, early exit on empty,
5. BM25 float64 scoring accumulated strictly in canonical term order
   (rank-identical to the oracle; ``tf_sum`` parity mode reproduces the
   reference's normalized tf-sum :141-161),
6. total count + offset/limit pagination (O3, :167-175,199-201),
   top-k ordering ``(score desc, docid asc)`` == ``(score desc, conv_id asc,
   turn_idx asc)`` because docids are order-preserving (keys.py),
7. hydration of only the result page from the doc store + M8 snippets.

Serving state (dictionary, conv dict, doc lengths, posting LRU) loads once in
``__init__`` — wrap in an actor pool (``QueryActor``) for concurrent serving;
a query itself never launches a Ray job (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import numpy as np

from searchengine_ray import scoring
from searchengine_ray.codec import (
    blocks_for_candidates,
    decode_blocks,
    first_docid,
    last_docid,
)
from searchengine_ray.config import EngineConfig
from searchengine_ray.index_store import IndexReader
from searchengine_ray.keys import TURN_BITS, TURN_MASK
from searchengine_ray.results import (
    ERROR_EMPTY_QUERY,
    ERROR_NO_SIGNIFICANT,
    ERROR_NOTHING_FOUND,
    error_response,
    hit,
    ok_response,
)
from searchengine_ray.snippets import build_snippet
from searchengine_ray.textproc import Analyzer


def _topk_order(scores: np.ndarray, docids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (score desc, docid asc) WITHOUT sorting the
    full match set: threshold-select via np.partition (O(n)), lexsort only
    the ≤k-plus-ties survivors. Equal to ``np.lexsort((docids, -scores))[:k]``
    (exact, deterministic — boundary ties are all retained, then broken by
    docid). Falls back to the full lexsort when k covers most of the set."""
    n = scores.size
    if k <= 0:
        return np.empty(0, dtype=np.int64)
    if k >= n or k * 4 >= n:
        return np.lexsort((docids, -scores))
    thresh = np.partition(scores, n - k)[n - k]  # k-th largest
    keep = np.nonzero(scores >= thresh)[0]
    if keep.size * 2 >= n:  # massive tie plateau — full sort is cheaper
        return np.lexsort((docids, -scores))
    sub = np.lexsort((docids[keep], -scores[keep]))
    return keep[sub]


class QueryEngine:
    def __init__(
        self,
        index_dir: str,
        mode: str = "bm25",
        shards: list[str] | None = None,
        delta_docs: bool = True,
    ):
        self.reader = IndexReader(index_dir, shards=shards, delta_docs=delta_docs)
        m = self.reader.manifest
        self.config = EngineConfig(
            analyzer=m["analyzer"],
            search_filter=m["search_filter"],
            k1=m["k1"],
            b=m["b"],
            num_segments=m["num_segments"],
            num_buckets=m["num_buckets"],
            block_size=m["block_size"],
        )
        self.analyzer = Analyzer(self.config.analyzer)
        # The index vocabulary is a function of the morphology tables: a
        # query lemmatized under DIFFERENT tables than the build misses
        # postings silently (zero recall, no error). Warn loudly; older
        # manifests lack the field (recorded since r4) — skip those.
        built_morph = m.get("morphology")
        if built_morph is not None:
            from searchengine_ray.textproc import morphology_signature

            if built_morph != morphology_signature():
                import logging

                logging.getLogger(__name__).warning(
                    "index %s was built under DIFFERENT morphology tables "
                    "than this process (built %s, active %s) — queries may "
                    "silently miss postings; reindex to realign",
                    index_dir, built_morph[:8], morphology_signature()[:8],
                )
        self.mode = mode
        # Per-term BM25 contributions are static for a built index — cache
        # the score vector of hot SINGLE-term queries (aligned with the
        # decoded docid array), bounded by entry count.
        self._term_score_cache: dict[str, np.ndarray] = {}

    # -- retrieval core -------------------------------------------------

    def _match_and_score(self, kept: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """AND-intersect posting lists rarest-first with block skipping;
        return (docids, scores) for every matching doc (unsorted)."""
        reader = self.reader
        order = scoring.canonical_term_order({l: reader.df(l) for l in kept})

        # Seed: full decode of the rarest lemma.
        docids, tf0 = reader.decode_lemma(order[0])
        tf_by_term: list[np.ndarray] = [tf0]
        for lemma in order[1:]:
            if docids.size == 0:
                break
            # When the candidates straddle most blocks, block selection
            # decodes ~the whole list anyway — take the full decode
            # (LRU-cached) instead. Blocks touched ≈ min(candidates, nblocks).
            cached = reader.decoded_if_cached(lemma)
            df_l = reader.df(lemma)
            bs = self.config.block_size
            touched = min(docids.size, df_l // bs + 1) * bs
            # a delta overlay (doc-level upserts) forces the full-decode
            # path: the block path below reads raw MAIN segments, which
            # would miss generation postings and superseded tombstones
            if cached is None and (2 * touched >= df_l or reader.delta is not None):
                cached = reader.decode_lemma(lemma)
            if cached is not None:
                ld, lt = cached
                if ld.size == 0:
                    # Lemma is in the global dictionary (df > 0) but has no
                    # postings in THIS reader's shard subset — empty
                    # intersection, not an index error (partition-serving
                    # mode: rare terms live in few shards).
                    docids = docids[:0]
                    break
                pos = np.searchsorted(ld, docids)
                pos_c = np.minimum(pos, ld.size - 1)
                match = ld[pos_c] == docids
                match &= pos < ld.size
                docids = docids[match]
                tf_by_term = [t[match] for t in tf_by_term]
                tf_by_term.append(lt[pos_c[match]])
                continue
            segs = reader.postings_segments(lemma)
            got_docs: list[np.ndarray] = []
            got_tfs: list[np.ndarray] = []
            for enc in segs:
                # Range-narrow the candidate array to this segment's docid
                # span first (O(log C)) — otherwise every segment pays a
                # full O(C log B) block-selection scan of all candidates.
                lo = np.searchsorted(docids, first_docid(enc), side="left")
                hi = np.searchsorted(docids, last_docid(enc), side="right")
                if lo >= hi:
                    continue
                cand = docids[lo:hi]
                sel = blocks_for_candidates(enc, cand)
                if sel.size == 0:
                    continue
                d, t = decode_blocks(enc, sel, block_size=self.config.block_size)
                got_docs.append(d)
                got_tfs.append(t)
            if not got_docs:
                docids = docids[:0]
                break
            ld = np.concatenate(got_docs)
            lt = np.concatenate(got_tfs)
            if len(got_docs) > 1:
                o = np.argsort(ld, kind="stable")
                ld, lt = ld[o], lt[o]
            pos = np.searchsorted(ld, docids)
            pos_c = np.minimum(pos, ld.size - 1)
            match = ld[pos_c] == docids
            match &= pos < ld.size
            docids = docids[match]
            tf_by_term = [t[match] for t in tf_by_term]
            tf_by_term.append(lt[pos_c[match]])

        if docids.size == 0:
            return docids, np.empty(0, dtype=np.float64)

        if self.mode == "bm25":
            if len(order) == 1:
                cached_scores = self._term_score_cache.get(order[0])
                if cached_scores is not None and cached_scores.size == docids.size:
                    return docids, cached_scores
            dls = reader.doc_lengths(docids)
            k1, b = self.config.k1, self.config.b
            scores = np.zeros(docids.size, dtype=np.float64)
            for lemma, tfs in zip(order, tf_by_term):
                term_idf = scoring.idf(reader.n_docs, reader.df(lemma))
                scores += term_idf * scoring.tf_norm_vec(tfs, dls, reader.avgdl, k1, b)
            if len(order) == 1:
                if len(self._term_score_cache) >= 16:
                    self._term_score_cache.pop(next(iter(self._term_score_cache)))
                self._term_score_cache[order[0]] = scores
        else:  # reference parity: tf-sum / max (A4/A5)
            scores = np.zeros(docids.size, dtype=np.float64)
            for tfs in tf_by_term:
                scores += tfs.astype(np.float64)
            scores = scores / scores.max()
        return docids, scores

    def _decode_site_lemma(self, lemma: str, site: str) -> tuple[np.ndarray, np.ndarray]:
        """Full (docids, tfs) of one lemma WITHIN one site — decodes only the
        per-(lemma, site) segments the build's site-threaded shuffle key
        produced (never the other sites' postings); delta generations and
        supersede filtering are applied by the reader."""
        return self.reader.decode_lemma(lemma, site=site)

    def _match_and_score_site(self, q_lemmas, site: str) -> tuple[np.ndarray, np.ndarray]:
        """Site-scoped evaluation (reference per-site search,
        ``SearchServiceImpl.java:74-82``, with per-site lemma df,
        ``model/Lemma.java:14-27``): terms read their per-(lemma, site)
        posting segments, and gate / BM25 stats (df from the global site
        dictionary, N / avgdl from the manifest's site stats) are the
        PARTITION's — equivalent to searching an index built from that site
        alone, and identical under shard-subset (partition) serving because
        the stats are global. Returns (docids, scores)."""
        reader = self.reader
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        stats = reader.sites.get(site)
        if not stats or stats["n_docs"] == 0:
            return empty
        n_docs_p = stats["n_docs"]
        avgdl_p = stats["avgdl"]
        site_df = reader.site_df_map(site)

        dfs = {l: site_df.get(l, 0) for l in q_lemmas}
        if any(v == 0 for v in dfs.values()):
            return empty  # D2 all-present gate WITHIN the site
        # D3 frequency gate with the SITE's df and n_docs
        kept = {
            l: d
            for l, d in dfs.items()
            if self.analyzer.is_identifier(l)
            or (100 * d) // n_docs_p <= self.config.search_filter
        }
        if not kept:
            return empty

        order = scoring.canonical_term_order(kept)
        docids, tf0 = self._decode_site_lemma(order[0], site)
        tf_by_term: list[np.ndarray] = [tf0]
        for lemma in order[1:]:
            if docids.size == 0:
                return empty
            d, t = self._decode_site_lemma(lemma, site)
            if d.size == 0:
                return empty  # shard subset may lack this site's postings
            pos = np.searchsorted(d, docids)
            pos_c = np.minimum(pos, d.size - 1)
            m = (d[pos_c] == docids) & (pos < d.size)
            docids = docids[m]
            tf_by_term = [x[m] for x in tf_by_term]
            tf_by_term.append(t[pos_c[m]])
        if docids.size == 0:
            return empty

        if self.mode == "bm25":
            dls = reader.doc_lengths(docids)  # dl is per-doc, site-neutral
            k1, b = self.config.k1, self.config.b
            scores = np.zeros(docids.size, dtype=np.float64)
            for lemma, tfs in zip(order, tf_by_term):
                term_idf = scoring.idf(n_docs_p, kept[lemma])
                scores += term_idf * scoring.tf_norm_vec(tfs, dls, avgdl_p, k1, b)
        else:  # tf_sum parity mode (A4/A5) within the site
            scores = np.zeros(docids.size, dtype=np.float64)
            for tfs in tf_by_term:
                scores += tfs.astype(np.float64)
            scores = scores / scores.max()
        return docids, scores

    # -- public API -----------------------------------------------------

    def search(self, query: str, offset: int = 0, limit: int = 10, site: str | None = None) -> dict:
        reader = self.reader
        if query == "":
            return error_response(ERROR_EMPTY_QUERY)
        q_lemmas = self.analyzer.query_lemmas(query)
        if not q_lemmas:
            return error_response(ERROR_NO_SIGNIFICANT)
        if any(not reader.has(l) for l in q_lemmas):
            return error_response(ERROR_NOTHING_FOUND)
        if site is not None:
            docids, scores = self._match_and_score_site(q_lemmas, site)
            if docids.size == 0:
                return error_response(ERROR_NOTHING_FOUND)
        else:
            kept = [
                l
                for l in q_lemmas
                if self.analyzer.is_identifier(l)
                or (100 * reader.df(l)) // reader.n_docs <= self.config.search_filter
            ]
            if not kept:
                return error_response(ERROR_NOTHING_FOUND)

            docids, scores = self._match_and_score(kept)
        if docids.size == 0:
            return error_response(ERROR_NOTHING_FOUND)

        # (score desc, docid asc) — docid order IS (conv_id, turn_idx) order.
        rank = _topk_order(scores, docids, offset + limit)
        total = int(docids.size)
        page_idx = rank[offset : offset + limit]
        page_docids = docids[page_idx]
        page_scores = scores[page_idx]

        docs = reader.fetch_docs(page_docids.tolist())
        data = []
        for docid, score in zip(page_docids.tolist(), page_scores.tolist()):
            row = docs.get(docid)
            if row is None:  # doc store gap — should not happen
                conv_rank, turn = docid >> TURN_BITS, docid & TURN_MASK
                row = {
                    "conv_id": str(reader.conv_ids[conv_rank]),
                    "turn_idx": int(turn),
                    "role": "",
                    "text": "",
                }
            words = self.analyzer.tokens(row["text"] or "")
            snip = build_snippet(
                words,
                q_lemmas,
                self.analyzer,
                window=self.config.snippet_window,
                max_windows=self.config.snippet_max_windows,
            )
            data.append(hit(row["conv_id"], row["turn_idx"], score, snip, row.get("role", "")))
        return ok_response(total, data)

    def search_docids(self, query: str, k: int | None = None, site: str | None = None) -> dict:
        """Hydration-free page candidates: total count + top-k
        ``(docid, score)`` in the canonical (score desc, docid asc) order —
        the partition-serving fan-out unit. Hydration (doc-store point reads
        + snippets) happens once per FINAL page, never per partition: a deep
        offset costs O(offset+limit) int64 rows per partition, not
        O(offset+limit) snippet builds per partition. ``error`` carries the
        gate outcome so the sharded merge can reproduce the exact
        single-process error envelope on zero total matches."""
        reader = self.reader
        empty = {
            "count": 0,
            "docid": np.empty(0, dtype=np.int64),
            "score": np.empty(0, dtype=np.float64),
            "error": None,
        }
        if query == "":
            return {**empty, "error": ERROR_EMPTY_QUERY}
        q_lemmas = self.analyzer.query_lemmas(query)
        if not q_lemmas:
            return {**empty, "error": ERROR_NO_SIGNIFICANT}
        if any(not reader.has(l) for l in q_lemmas):
            return {**empty, "error": ERROR_NOTHING_FOUND}
        if site is not None:
            docids, scores = self._match_and_score_site(q_lemmas, site)
        else:
            kept = [
                l
                for l in q_lemmas
                if self.analyzer.is_identifier(l)
                or (100 * reader.df(l)) // reader.n_docs <= self.config.search_filter
            ]
            if not kept:
                return {**empty, "error": ERROR_NOTHING_FOUND}
            docids, scores = self._match_and_score(kept)
        if docids.size == 0:
            return {**empty, "error": ERROR_NOTHING_FOUND}
        rank = (
            np.lexsort((docids, -scores))
            if k is None
            else _topk_order(scores, docids, k)[:k]
        )
        return {
            "count": int(docids.size),
            "docid": docids[rank],
            "score": scores[rank],
            "error": None,
        }

    def hydrate_hits(self, docids, scores, query: str) -> dict[int, dict]:
        """Full hit rows (doc-store point fetch + M8 snippets) for the
        docids this reader's partitions own (plus delta-overlay docs when it
        holds the overlay), keyed by docid. Docids absent from this reader's
        shards are simply omitted — the partition-serving merge unions the
        per-actor answers."""
        q_lemmas = self.analyzer.query_lemmas(query)
        docs = self.reader.fetch_docs([int(d) for d in docids])
        out: dict[int, dict] = {}
        for d, score in zip(docids, scores):
            row = docs.get(int(d))
            if row is None:
                continue
            words = self.analyzer.tokens(row["text"] or "")
            snip = build_snippet(
                words,
                q_lemmas,
                self.analyzer,
                window=self.config.snippet_window,
                max_windows=self.config.snippet_max_windows,
            )
            out[int(d)] = hit(
                row["conv_id"], row["turn_idx"], float(score), snip, row.get("role", "")
            )
        return out

    def stub_hits(self, docids, scores, query: str) -> dict[int, dict]:
        """Stub rows for doc-store gaps (should not happen): conv_id from
        the conv dictionary, empty text/role, snippet built over zero
        tokens — the exact synthesis the single-process ``search`` path
        uses for the same case, so the sharded envelope cannot diverge
        from it (ADVICE r3)."""
        q_lemmas = self.analyzer.query_lemmas(query)
        out: dict[int, dict] = {}
        for d, score in zip(docids, scores):
            d = int(d)
            conv_rank, turn = d >> TURN_BITS, d & TURN_MASK
            snip = build_snippet(
                [],
                q_lemmas,
                self.analyzer,
                window=self.config.snippet_window,
                max_windows=self.config.snippet_max_windows,
            )
            out[d] = hit(
                str(self.reader.conv_ids[conv_rank]), int(turn), float(score), snip, ""
            )
        return out

    def search_ids(self, query: str, limit: int | None = None, site: str | None = None) -> dict:
        """Hydration-free search: all matching (conv_id, turn_idx, score)
        plus total count — the bulk-evaluation path (no doc-store reads, no
        snippets). Results ordered (score desc, conv_id asc, turn_idx asc).
        ``site`` scopes matching + stats to one corpus partition."""
        reader = self.reader
        empty = {
            "count": 0,
            "conv_id": np.empty(0, dtype=object),
            "turn_idx": np.empty(0, dtype=np.int64),
            "score": np.empty(0, dtype=np.float64),
        }
        if query == "":
            return empty
        q_lemmas = self.analyzer.query_lemmas(query)
        if not q_lemmas or any(not reader.has(l) for l in q_lemmas):
            return empty
        if site is not None:
            docids, scores = self._match_and_score_site(q_lemmas, site)
        else:
            kept = [
                l
                for l in q_lemmas
                if self.analyzer.is_identifier(l)
                or (100 * reader.df(l)) // reader.n_docs <= self.config.search_filter
            ]
            if not kept:
                return empty
            docids, scores = self._match_and_score(kept)
        if docids.size == 0:
            return empty
        rank = np.lexsort((docids, -scores)) if limit is None else _topk_order(
            scores, docids, limit
        )
        if limit is not None:
            rank = rank[:limit]
        conv_rank, turn = docids[rank] >> TURN_BITS, docids[rank] & TURN_MASK
        return {
            "count": int(docids.size),
            "conv_id": reader.conv_ids[conv_rank],
            "turn_idx": turn,
            "score": scores[rank],
        }

    def explain(self, query: str) -> dict:
        """Term-level diagnostics (df, gate decisions, evaluation order) —
        observable rarest-first behavior for tests (SURVEY.md §5.3)."""
        q_lemmas = self.analyzer.query_lemmas(query)
        terms = []
        for l in sorted(q_lemmas):
            df = self.reader.df(l)
            gated = not (
                self.analyzer.is_identifier(l)
                or (100 * df) // self.reader.n_docs <= self.config.search_filter
            )
            terms.append({"lemma": l, "df": df, "present": self.reader.has(l), "gated": gated})
        kept = {t["lemma"]: t["df"] for t in terms if t["present"] and not t["gated"]}
        return {
            "terms": terms,
            "eval_order": scoring.canonical_term_order(kept),
            "n_docs": self.reader.n_docs,
            "avgdl": self.reader.avgdl,
        }


class QueryActor:
    """Actor wrapper for parallel query serving (ST7, SURVEY.md §2.3):
    ``ray.remote(QueryActor).remote(index_dir)`` → pool; each actor holds a
    warm QueryEngine (optionally over a shard subset — the docid-range
    partition-serving mode). Also usable directly via ``map_batches`` over a
    query table for batch evaluation."""

    def __init__(
        self,
        index_dir: str,
        mode: str = "bm25",
        shards: list[str] | None = None,
        delta_docs: bool = True,
        rounded_topk: bool = False,
        lemma_table=None,
    ):
        # Morphology state is PROCESS-LOCAL (textproc module globals), and
        # this __init__ runs in a fresh Ray worker process: a custom table
        # installed on the driver via use_lemma_table must be shipped here
        # or query lemmatization silently runs under the bundled tables —
        # query lemma != index lemma → zero recall (the serving-side twin
        # of the ExplodePostings build-side fix, code-review r4). Large
        # tables arrive as an ObjectRef (one object-store copy per pool).
        if lemma_table is not None:
            import ray

            from searchengine_ray.textproc import use_lemma_table

            if isinstance(lemma_table, ray.ObjectRef):
                lemma_table = ray.get(lemma_table)
            use_lemma_table(lemma_table)
        self.engine = QueryEngine(index_dir, mode=mode, shards=shards, delta_docs=delta_docs)
        # rounded_topk: batch mode ranks by ROUNDED score (half-away, 4 dp)
        # with the canonical (score_r desc, conv_id, turn_idx) tie-break —
        # the oracle-parity ordering (same rule as transcripts._search_frame),
        # immune to float summation-order noise. Default keeps raw-score
        # engine ordering (reference API behavior).
        self.rounded_topk = rounded_topk

    def search(self, query: str, offset: int = 0, limit: int = 10, site: str | None = None) -> dict:
        return self.engine.search(query, offset, limit, site=site)

    def search_ids(self, query: str, limit: int | None = None, site: str | None = None) -> dict:
        return self.engine.search_ids(query, limit, site=site)

    def search_docids(self, query: str, k: int | None = None, site: str | None = None) -> dict:
        return self.engine.search_docids(query, k, site=site)

    def hydrate_hits(self, docids, scores, query: str) -> dict[int, dict]:
        return self.engine.hydrate_hits(docids, scores, query)

    def stub_hits(self, docids, scores, query: str) -> dict[int, dict]:
        return self.engine.stub_hits(docids, scores, query)

    def __call__(self, batch) -> dict:
        """Batch mode: dict/pandas batch with columns (query_id, query,
        offset, limit) → one row per (query, rank) hit."""
        import pandas as pd

        qids, ranks, convs, turns, scores_out = [], [], [], [], []
        counts = []
        df = pd.DataFrame(batch) if not isinstance(batch, pd.DataFrame) else batch
        if self.rounded_topk:
            from searchengine_ray.results import rounded_topk_frame

            frames = [
                rounded_topk_frame(
                    self.engine.search_ids(str(row["query"])),
                    row["query_id"],
                    int(row.get("limit", 10)),
                    int(row.get("offset", 0)),
                )
                for _, row in df.iterrows()
            ]
            if not frames:  # zero-row batch: empty typed frame
                frames = [rounded_topk_frame({"count": 0}, None, 0)]
            return pd.concat(frames, ignore_index=True)
        for _, row in df.iterrows():
            r = self.engine.search(
                str(row["query"]), int(row.get("offset", 0)), int(row.get("limit", 10))
            )
            for i, d in enumerate(r["data"]):
                qids.append(row["query_id"])
                ranks.append(i)
                convs.append(d["conv_id"])
                turns.append(d["turn_idx"])
                scores_out.append(d["relevance"])
                counts.append(r["count"])
        return pd.DataFrame(
            {
                "query_id": qids,
                "rank": ranks,
                "conv_id": convs,
                "turn_idx": turns,
                "score": scores_out,
                "count": counts,
            }
        )



class ShardedQueryService:
    """Partition-serving pool: each `QueryActor` owns a disjoint subset of
    the index's shards (docid ranges); a query fans out to every actor and
    the driver merges — counts sum exactly (shards are doc-disjoint) and
    per-partition top-k lists merge under the same canonical order
    ``(score desc, conv_id asc, turn_idx asc)``, so results are identical to
    single-process evaluation while each actor's decoded-posting cache only
    ever holds its partition's lists. This is the serving shape for indexes
    too large for one process (BASELINE.md scale notes)."""

    def __init__(self, index_dir: str, num_actors: int = 2, mode: str = "bm25"):
        import os

        import ray

        from searchengine_ray.build import list_shard_names

        if mode != "bm25":
            # tf_sum normalizes by the per-evaluation max (A5) — each
            # partition would normalize by ITS max, making merged scores
            # incomparable. Serve tf_sum single-process.
            raise ValueError("ShardedQueryService supports mode='bm25' only")
        shard_names = list_shard_names(os.path.join(index_dir, "shards"))
        num_actors = max(1, min(num_actors, len(shard_names)))
        groups = [shard_names[i::num_actors] for i in range(num_actors)]
        Actor = ray.remote(QueryActor)
        # ship any driver-installed custom lemma table to every actor (one
        # ray.put per pool); without this, actors would lemmatize queries
        # under the bundled tables against an index built under the custom
        # ones — silent zero recall (code-review r4)
        from searchengine_ray import textproc as _tp

        lemma_ref = ray.put(_tp._LEMMA_TABLE) if _tp._LEMMA_TABLE is not None else None
        # Doc-level upsert overlay (delta.py): delta docs are OWNED by the
        # first actor only — every actor still supersede-filters its main
        # postings and shares the adjusted global stats, so the fan-out
        # merge stays exact with no duplicated delta hits.
        self.actors = [
            Actor.remote(
                index_dir, mode=mode, shards=g, delta_docs=(i == 0),
                lemma_table=lemma_ref,
            )
            for i, g in enumerate(g for g in groups if g)
        ]

    def search_ids(self, query: str, limit: int | None = None, site: str | None = None) -> dict:
        import numpy as np
        import ray

        parts = ray.get([a.search_ids.remote(query, limit, site) for a in self.actors])
        count = int(sum(p["count"] for p in parts))
        if count == 0:
            return parts[0] if parts else {"count": 0}
        conv = np.concatenate([np.asarray(p["conv_id"], dtype=object) for p in parts])
        turn = np.concatenate([np.asarray(p["turn_idx"], dtype=np.int64) for p in parts])
        score = np.concatenate([np.asarray(p["score"], dtype=np.float64) for p in parts])
        order = np.lexsort((turn, conv, -score))
        if limit is not None:
            order = order[:limit]
        return {
            "count": count,
            "conv_id": conv[order],
            "turn_idx": turn[order],
            "score": score[order],
        }

    def search(self, query: str, offset: int = 0, limit: int = 10, site: str | None = None) -> dict:
        """Full SearchResponse (hydrated hits + snippets): each actor returns
        its partition's top-(offset+limit) ``(docid, score)`` IDS — no
        hydration — the driver merges under the canonical (score desc,
        docid asc) order (identical scores across partitions: global stats),
        and ONLY the final page hydrates (one doc-store point fetch +
        snippet per RETURNED hit). Deep pagination therefore ships
        O(offset+limit) int64 rows per partition instead of offset+limit
        hydrated pages per partition — at 60M turns, offset=10k over a
        df≈17M term dropped from ~16 s to page-proportional milliseconds.
        Gate errors reproduce the single-process envelope (gates are
        global-stat-driven, so every actor reports the same error)."""
        import ray

        k = offset + limit
        parts = ray.get([a.search_docids.remote(query, k, site) for a in self.actors])
        count = int(sum(p["count"] for p in parts))
        if count == 0:
            if parts and parts[0]["error"]:
                return error_response(parts[0]["error"])
            return {"result": False, "count": 0, "data": []}
        docid = np.concatenate([np.asarray(p["docid"], dtype=np.int64) for p in parts])
        score = np.concatenate([np.asarray(p["score"], dtype=np.float64) for p in parts])
        order = np.lexsort((docid, -score))[offset : offset + limit]
        page_ids = docid[order].tolist()
        page_scores = score[order].tolist()
        hydrated = ray.get(
            [a.hydrate_hits.remote(page_ids, page_scores, query) for a in self.actors]
        )
        rows: dict[int, dict] = {}
        for d in page_ids:
            # actor 0 first: the delta-overlay owner is authoritative for a
            # docid superseded by an upsert (a plain shard owner would
            # hydrate the stale main row)
            for h in hydrated:
                row = h.get(d)
                if row is not None:
                    rows[d] = row
                    break
        missing = [
            (d, s) for d, s in zip(page_ids, page_scores) if d not in rows
        ]
        if missing:
            # doc-store gap (should not happen): synthesize the SAME stub
            # row the single-process engine emits — conv_id from the conv
            # dictionary, empty text/snippet — instead of silently
            # shrinking the page (ADVICE r3 envelope-divergence fix)
            rows.update(
                ray.get(
                    self.actors[0].stub_hits.remote(
                        [d for d, _ in missing], [s for _, s in missing], query
                    )
                )
            )
        data = [rows[d] for d in page_ids]
        return {"result": True, "error": None, "count": count, "data": data}

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []
