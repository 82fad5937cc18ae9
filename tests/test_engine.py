"""Distributed engine vs exact oracle: index content, search ranking,
resume (SURVEY.md §5.2-5.5)."""

import os
import shutil

import numpy as np
import pytest

from searchengine_ray.build import DOCLEN_LEMMA, _build_shard, _expand_input, _shard_files, build_conv_dict, build_index
from searchengine_ray.config import EngineConfig
from searchengine_ray.corpus import reference_queries, write_transcripts
from searchengine_ray.keys import TURN_BITS, TURN_MASK
from searchengine_ray.oracle import OracleIndex, OracleSearcher
from searchengine_ray.query import QueryEngine

CFG = EngineConfig(num_shards=2, num_segments=4, lemmatizer_concurrency=(1, 2), batch_size=512)


@pytest.fixture(scope="module")
def built(ray_session, tiny_corpus, tmp_path_factory):
    """One distributed build of F1-tiny reused by every test in the module."""
    root = tmp_path_factory.mktemp("engine")
    corpus_dir = str(root / "corpus")
    os.makedirs(corpus_dir)
    import pyarrow.parquet as pq

    n = tiny_corpus.num_rows
    per = (n + 7) // 8
    for i in range(8):
        chunk = tiny_corpus.slice(i * per, min(per, n - i * per))
        if chunk.num_rows:
            pq.write_table(chunk, f"{corpus_dir}/part-{i:05d}.parquet")
    index_dir = str(root / "index")
    manifest = build_index(corpus_dir, index_dir, CFG)
    engine = QueryEngine(index_dir)
    oracle = OracleSearcher(OracleIndex(tiny_corpus, CFG))
    return manifest, engine, oracle, corpus_dir, index_dir


class TestIndexContent:
    def test_global_stats_match_oracle(self, built):
        manifest, engine, oracle, *_ = built
        assert engine.reader.n_docs == oracle.index.n_docs
        assert engine.reader.avgdl == oracle.index.avgdl  # exact float equality

    def test_dictionary_matches_oracle(self, built):
        _, engine, oracle, *_ = built
        assert set(engine.reader.df_map) == set(oracle.index.postings)
        for l, post in oracle.index.postings.items():
            assert engine.reader.df_map[l] == len(post), l

    def test_postings_match_oracle_exactly(self, built):
        """Decode every lemma and compare (conv_id, turn_idx, tf) sets."""
        _, engine, oracle, *_ = built
        conv_ids = engine.reader.conv_ids
        for l, expect in oracle.index.postings.items():
            docids, tfs = engine.reader.decode_lemma(l)
            assert np.all(np.diff(docids) > 0), f"postings not strictly sorted for {l}"
            got = {
                (str(conv_ids[d >> TURN_BITS]), int(d & TURN_MASK)): int(tf)
                for d, tf in zip(docids.tolist(), tfs.tolist())
            }
            assert got == dict(expect), l

    def test_doc_lengths_match_oracle(self, built):
        _, engine, oracle, *_ = built
        r = engine.reader
        docids = r._dl_docids
        for d, dl in zip(docids.tolist(), r._dl.tolist()):
            key = (str(r.conv_ids[d >> TURN_BITS]), int(d & TURN_MASK))
            assert oracle.index.doc_len[key] == dl
        assert len(docids) == oracle.index.n_docs

    def test_doclen_sentinel_not_in_dictionary(self, built):
        _, engine, *_ = built
        assert DOCLEN_LEMMA not in engine.reader.df_map


class TestSearchParity:
    def _assert_same(self, r_e, r_o, label=""):
        assert r_e["result"] == r_o["result"], label
        assert r_e["count"] == r_o["count"], label
        assert r_e["error"] == r_o["error"], label
        got = [(d["uri"], d["relevance"], d["snippet"]) for d in r_e["data"]]
        exp = [(d["uri"], d["relevance"], d["snippet"]) for d in r_o["data"]]
        assert got == exp, label  # rank-identical docids + exact float64 scores

    def test_reference_query_set(self, built):
        _, engine, oracle, *_ = built
        for q in reference_queries():
            self._assert_same(
                engine.search(q["query"], q["offset"], q["limit"]),
                oracle.search(q["query"], q["offset"], q["limit"]),
                q["query_id"],
            )

    def test_randomized_queries(self, built):
        """Property layer (SURVEY.md §5.5): random 1-3 term queries drawn from
        corpus vocabulary + unknown words; engine ≡ oracle end-to-end."""
        _, engine, oracle, *_ = built
        rng = np.random.default_rng(123)
        vocab = [
            "суд", "суда", "судом", "дело", "дела", "решение", "закон",
            "договор", "жалоба", "статья", "срок", "штраф", "налог",
            "компания", "работа", "вопрос", "люди", "hello", "337", "105",
            "и", "в", "zzz-неизвестное",
        ]
        for i in range(40):
            k = int(rng.integers(1, 4))
            words = [vocab[int(j)] for j in rng.integers(0, len(vocab), size=k)]
            q = " ".join(words)
            off = int(rng.integers(0, 3)) * 5
            self._assert_same(
                engine.search(q, off, 10), oracle.search(q, off, 10), q
            )

    def test_explain_rarest_first(self, built):
        _, engine, oracle, *_ = built
        ex = engine.explain("суд решение закон")
        dfs = [t["df"] for t in ex["terms"] if t["lemma"] in ex["eval_order"]]
        order_dfs = [engine.reader.df(l) for l in ex["eval_order"]]
        assert order_dfs == sorted(order_dfs)

    def test_tf_sum_parity_mode(self, built):
        """Reference-parity scoring: normalized tf-sum (SearchServiceImpl
        :141-161) must also match the oracle's tf_sum mode."""
        _, engine, oracle, _, index_dir = built
        eng2 = QueryEngine(index_dir, mode="tf_sum")
        or2 = OracleSearcher(oracle.index, mode="tf_sum")
        for q in ["суд", "суд решение", "337"]:
            self._assert_same(eng2.search(q), or2.search(q), q)


class TestResume:
    def test_interrupted_build_resumes_partition_exact(
        self, ray_session, tiny_corpus, tmp_path_factory, built
    ):
        """F6: build killed after shard 0 of 4 → rerun → identical index."""
        import ray

        root = tmp_path_factory.mktemp("resume")
        corpus_dir = str(root / "corpus")
        os.makedirs(corpus_dir)
        import pyarrow.parquet as pq

        n = tiny_corpus.num_rows
        per = (n + 7) // 8
        for i in range(8):
            chunk = tiny_corpus.slice(i * per, min(per, n - i * per))
            if chunk.num_rows:
                pq.write_table(chunk, f"{corpus_dir}/part-{i:05d}.parquet")

        cfg = CFG.replace(num_shards=4)
        files = _expand_input(corpus_dir)

        # simulate the interrupted run: conv dict + shard 0 only, no finalize
        idx_resumed = str(root / "idx_resumed")
        os.makedirs(idx_resumed)
        conv_arr = build_conv_dict(files, idx_resumed)
        conv_path = os.path.join(idx_resumed, "conv_dict.npy")
        shards = _shard_files(files, cfg.num_shards)
        m0 = _build_shard(0, shards[0], idx_resumed, conv_path, len(conv_arr), cfg)
        assert m0["status"] == "complete"
        assert not os.path.exists(os.path.join(idx_resumed, "manifest.json"))

        # resumed run must reuse shard 0 (mtime unchanged) and finish the rest
        mtime_before = os.path.getmtime(
            os.path.join(idx_resumed, "shards", "shard=00000", "_MANIFEST.json")
        )
        manifest_r = build_index(corpus_dir, idx_resumed, cfg)
        assert (
            os.path.getmtime(
                os.path.join(idx_resumed, "shards", "shard=00000", "_MANIFEST.json")
            )
            == mtime_before
        )

        # uninterrupted build for comparison
        idx_full = str(root / "idx_full")
        manifest_f = build_index(corpus_dir, idx_full, cfg)

        assert manifest_r["n_docs"] == manifest_f["n_docs"]
        assert manifest_r["avgdl"] == manifest_f["avgdl"]
        assert manifest_r["n_lemmas"] == manifest_f["n_lemmas"]
        assert len(manifest_r["shards"]) == len(shards)
        assert all(s["status"] == "complete" for s in manifest_r["shards"])

        e_r, e_f = QueryEngine(idx_resumed), QueryEngine(idx_full)
        assert e_r.reader.df_map == e_f.reader.df_map
        for l in list(e_f.reader.df_map)[:50]:
            dr, tr = e_r.reader.decode_lemma(l)
            df_, tf_ = e_f.reader.decode_lemma(l)
            assert np.array_equal(dr, df_) and np.array_equal(tr, tf_), l
        for q in ["суд", "суд решение", "337"]:
            a, b = e_r.search(q), e_f.search(q)
            assert a == b, q


class TestIncrementalReindex:
    def test_changed_input_rebuilds_only_that_shard(
        self, ray_session, tiny_corpus, tmp_path_factory
    ):
        """Reference updatePage analogue: editing one input file rebuilds
        only its shard; the index then matches a from-scratch oracle of the
        edited corpus."""
        import pyarrow.parquet as pq

        root = tmp_path_factory.mktemp("increm")
        corpus_dir = str(root / "corpus")
        os.makedirs(corpus_dir)
        n = tiny_corpus.num_rows
        per = (n + 3) // 4
        for i in range(4):
            chunk = tiny_corpus.slice(i * per, min(per, n - i * per))
            if chunk.num_rows:
                pq.write_table(chunk, f"{corpus_dir}/part-{i:05d}.parquet")

        cfg = CFG.replace(num_shards=4)
        idx = str(root / "idx")
        build_index(corpus_dir, idx, cfg)
        import json

        mtimes = {}
        for s in range(4):
            p = os.path.join(idx, "shards", f"shard={s:05d}", "_MANIFEST.json")
            mtimes[s] = os.path.getmtime(p)

        # edit file 2: drop its last row (a delete/update of those turns)
        t2 = pq.read_table(f"{corpus_dir}/part-00002.parquet")
        edited = t2.slice(0, t2.num_rows - 1)
        pq.write_table(edited, f"{corpus_dir}/part-00002.parquet")

        manifest = build_index(corpus_dir, idx, cfg)
        for s in range(4):
            p = os.path.join(idx, "shards", f"shard={s:05d}", "_MANIFEST.json")
            if s == 2:
                assert os.path.getmtime(p) > mtimes[s], "edited shard must rebuild"
            else:
                assert os.path.getmtime(p) == mtimes[s], "untouched shards must be reused"

        # index content matches the oracle over the edited corpus
        import pyarrow as pa

        frames = [
            pq.read_table(f"{corpus_dir}/part-{i:05d}.parquet") for i in range(4)
        ]
        edited_corpus = pa.concat_tables(frames)
        oracle = OracleIndex(edited_corpus, config=cfg)
        assert manifest["n_docs"] == oracle.n_docs
        eng = QueryEngine(idx)
        osearch = OracleSearcher(oracle)
        for q in reference_queries():
            r1 = eng.search(q["query"], q["offset"], q["limit"])
            r2 = osearch.search(q["query"], q["offset"], q["limit"])
            ids1 = [(d["conv_id"], d["turn_idx"]) for d in r1.get("data", [])]
            ids2 = [(d["conv_id"], d["turn_idx"]) for d in r2.get("data", [])]
            assert ids1 == ids2 and r1["count"] == r2["count"], q["query_id"]


class TestSkew:
    def test_stopword_scale_lemma_splits_into_segments(
        self, ray_session, tmp_path_factory
    ):
        """North-rule skew handling: a lemma present in EVERY doc must build
        as multiple docid-range-disjoint segments (no single reduce group
        holds the whole posting list), and still query correctly."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from searchengine_ray.build import build_index
        from searchengine_ray.index_store import IndexReader
        from searchengine_ray.query import QueryEngine

        root = tmp_path_factory.mktemp("skew")
        n = 600
        rows = {
            "conv_id": [f"conv-{i//4:06d}" for i in range(n)],
            "turn_idx": pa.array([i % 4 for i in range(n)], type=pa.int32()),
            "role": ["user"] * n,
            # "суд" in every turn; "дело" in half
            "text": [("суд дело" if i % 2 == 0 else "суд") for i in range(n)],
            "tool": [""] * n,
            "ts": pa.array([0] * n, type=pa.timestamp("us")),
        }
        corpus = root / "corpus"
        corpus.mkdir()
        t = pa.table(rows)
        for i in range(4):
            pq.write_table(t.slice(i * 150, 150), str(corpus / f"p-{i:05d}.parquet"))

        cfg = CFG.replace(num_shards=2, num_segments=4)
        idx = str(root / "idx")
        build_index(str(corpus), idx, cfg)

        reader = IndexReader(idx)
        segs = reader.postings_segments("суд")
        assert len(segs) >= 4  # ≥ num_segments splits across shards
        assert sum(s.n for s in segs) == n
        assert max(s.n for s in segs) <= n // 2  # no segment holds everything

        eng = QueryEngine(idx)
        r = eng.search_ids("суд")
        assert r["count"] == n
        r2 = eng.search_ids("суд дело")
        assert r2["count"] == n // 2


class TestShardedServing:
    def test_sharded_results_identical_to_single_engine(self, ray_session, built):
        """Partition-serving: per-shard actors + driver merge must equal
        whole-index evaluation exactly (counts, ids, scores)."""
        import numpy as np

        from searchengine_ray.query import QueryEngine, ShardedQueryService

        *_, index_dir = built
        single = QueryEngine(index_dir)
        svc = ShardedQueryService(index_dir, num_actors=2)
        try:
            for q in reference_queries():
                if not q["query"]:
                    continue
                a = single.search_ids(q["query"], limit=10)
                b = svc.search_ids(q["query"], limit=10)
                assert a["count"] == b["count"], q["query_id"]
                if a["count"] == 0:
                    continue
                assert list(a["conv_id"]) == list(b["conv_id"]), q["query_id"]
                assert list(a["turn_idx"]) == list(b["turn_idx"]), q["query_id"]
                assert np.allclose(a["score"], b["score"], rtol=0, atol=0), q["query_id"]
        finally:
            svc.shutdown()


class TestShardedDeepOffset:
    def test_full_search_parity_including_deep_offsets(self, ray_session, built):
        """The hydrated sharded `search` (ids-merge + page-only hydration)
        must equal single-process `search` response-for-response — including
        deep offsets, error envelopes, snippets and role/title fields."""
        from searchengine_ray.query import QueryEngine, ShardedQueryService

        *_, index_dir = built
        single = QueryEngine(index_dir)
        svc = ShardedQueryService(index_dir, num_actors=2)
        try:
            cases = [(q["query"], q["offset"], q["limit"]) for q in reference_queries()]
            cases += [("суд", 50, 10), ("суд", 10_000, 10), ("суд решение", 3, 2)]
            for query, offset, limit in cases:
                a = single.search(query, offset, limit)
                b = svc.search(query, offset, limit)
                assert a == b, (query, offset, limit)
        finally:
            svc.shutdown()


class TestInputValidation:
    def test_duplicate_keys_rejected(self, ray_session, tiny_corpus, tmp_path_factory):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest as _pytest

        root = tmp_path_factory.mktemp("dupes")
        corpus = root / "corpus"
        corpus.mkdir()
        dup = pa.concat_tables([tiny_corpus, tiny_corpus.slice(0, 5)])
        pq.write_table(dup, str(corpus / "p.parquet"))
        with _pytest.raises(ValueError, match="duplicate"):
            build_index(str(corpus), str(root / "idx"), CFG, validate_unique_keys=True)

    def test_clean_input_passes_validation(self, ray_session, tiny_corpus, tmp_path_factory):
        import pyarrow.parquet as pq

        root = tmp_path_factory.mktemp("clean")
        corpus = root / "corpus"
        corpus.mkdir()
        pq.write_table(tiny_corpus, str(corpus / "p.parquet"))
        m = build_index(str(corpus), str(root / "idx"), CFG, validate_unique_keys=True)
        assert m["n_docs"] == tiny_corpus.num_rows


class TestRebuildConsistency:
    def _write_corpus(self, tiny_corpus, corpus_dir, n_files=4):
        import pyarrow.parquet as pq

        n = tiny_corpus.num_rows
        per = (n + n_files - 1) // n_files
        for i in range(n_files):
            chunk = tiny_corpus.slice(i * per, min(per, n - i * per))
            if chunk.num_rows:
                pq.write_table(chunk, f"{corpus_dir}/part-{i:05d}.parquet")

    def test_new_conv_id_triggers_full_rerank(
        self, ray_session, tiny_corpus, tmp_path_factory
    ):
        """A rebuild whose input adds a NEW conv_id must invalidate all
        shards (dense ranks shift) and still match a fresh oracle."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        root = tmp_path_factory.mktemp("newconv")
        corpus_dir = str(root / "corpus")
        os.makedirs(corpus_dir)
        self._write_corpus(tiny_corpus, corpus_dir)
        cfg = CFG.replace(num_shards=4)
        idx = str(root / "idx")
        build_index(corpus_dir, idx, cfg)

        # new conversation whose id sorts BEFORE every existing one
        extra = pa.table(
            {
                "conv_id": pa.array(["aaaa-new-conv"] * 2, type=pa.string()),
                "turn_idx": pa.array([0, 1], type=pa.int32()),
                "role": pa.array(["user", "assistant"], type=pa.string()),
                "text": pa.array(["суд решение", "закон"], type=pa.string()),
                "tool": pa.array(["", ""], type=pa.string()),
                "ts": pa.array([0, 1], type=pa.timestamp("us")),
            }
        )
        pq.write_table(extra, f"{corpus_dir}/part-00000b.parquet")
        manifest = build_index(corpus_dir, idx, cfg)

        combined = pa.concat_tables(
            [extra.cast(tiny_corpus.schema), tiny_corpus]
        ) if extra.schema != tiny_corpus.schema else pa.concat_tables([extra, tiny_corpus])
        oracle = OracleSearcher(OracleIndex(combined, cfg))
        assert manifest["n_docs"] == oracle.index.n_docs
        eng = QueryEngine(idx)
        for q in reference_queries():
            r1 = eng.search(q["query"], q["offset"], q["limit"])
            r2 = oracle.search(q["query"], q["offset"], q["limit"])
            ids1 = [(d["conv_id"], d["turn_idx"]) for d in r1.get("data", [])]
            ids2 = [(d["conv_id"], d["turn_idx"]) for d in r2.get("data", [])]
            assert ids1 == ids2 and r1["count"] == r2["count"], q["query_id"]

    def test_config_change_rebuilds_shards(
        self, ray_session, tiny_corpus, tmp_path_factory
    ):
        """Changing a layout-affecting config field must rebuild shards, not
        silently reuse outputs written under the old layout."""
        root = tmp_path_factory.mktemp("cfgchange")
        corpus_dir = str(root / "corpus")
        os.makedirs(corpus_dir)
        self._write_corpus(tiny_corpus, corpus_dir)
        idx = str(root / "idx")
        build_index(corpus_dir, idx, CFG.replace(num_shards=2, num_buckets=16))
        # different bucket count → same files, different layout
        build_index(corpus_dir, idx, CFG.replace(num_shards=2, num_buckets=4))
        eng = QueryEngine(idx)
        oracle = OracleSearcher(OracleIndex(tiny_corpus, CFG))
        for q in reference_queries():
            r1 = eng.search(q["query"], q["offset"], q["limit"])
            r2 = oracle.search(q["query"], q["offset"], q["limit"])
            ids1 = [(d["conv_id"], d["turn_idx"]) for d in r1.get("data", [])]
            ids2 = [(d["conv_id"], d["turn_idx"]) for d in r2.get("data", [])]
            assert ids1 == ids2 and r1["count"] == r2["count"], q["query_id"]

    def test_shrunk_input_prunes_orphan_shards(
        self, ray_session, tiny_corpus, tmp_path_factory
    ):
        """Removing input files must not leave stale shard outputs serving
        deleted documents."""
        root = tmp_path_factory.mktemp("shrink")
        corpus_dir = str(root / "corpus")
        os.makedirs(corpus_dir)
        self._write_corpus(tiny_corpus, corpus_dir, n_files=8)
        cfg = CFG.replace(num_shards=8)
        idx = str(root / "idx")
        build_index(corpus_dir, idx, cfg)
        # delete the last half of the input
        kept_rows = 0
        import pyarrow.parquet as pq

        for i in range(8):
            p = f"{corpus_dir}/part-{i:05d}.parquet"
            if i >= 4:
                os.remove(p)
            elif os.path.exists(p):
                kept_rows += pq.read_metadata(p).num_rows
        manifest = build_index(corpus_dir, idx, cfg)
        assert manifest["n_docs"] == kept_rows
        assert len(os.listdir(os.path.join(idx, "shards"))) == len(manifest["shards"])

    def test_sharded_full_search_matches_single(self, ray_session, built):
        from searchengine_ray.query import ShardedQueryService

        *_, index_dir = built
        single = QueryEngine(index_dir)
        svc = ShardedQueryService(index_dir, num_actors=2)
        try:
            for q in reference_queries():
                a = single.search(q["query"], q["offset"], q["limit"])
                b = svc.search(q["query"], q["offset"], q["limit"])
                assert a["result"] == b["result"], q["query_id"]
                assert a.get("count", 0) == b.get("count", 0), q["query_id"]
                ga = [(d["conv_id"], d["turn_idx"], d["snippet"]) for d in a.get("data", [])]
                gb = [(d["conv_id"], d["turn_idx"], d["snippet"]) for d in b.get("data", [])]
                assert ga == gb, q["query_id"]
        finally:
            svc.shutdown()

    def test_sharded_rejects_tf_sum(self, ray_session, built):
        import pytest as _pytest

        from searchengine_ray.query import ShardedQueryService

        *_, index_dir = built
        with _pytest.raises(ValueError, match="bm25"):
            ShardedQueryService(index_dir, num_actors=2, mode="tf_sum")


class TestShardSubsetServing:
    def test_lemma_absent_from_shard_subset_is_empty_not_error(
        self, ray_session, tmp_path_factory
    ):
        """ADVICE r1 (high): a query lemma with df>0 in the GLOBAL dictionary
        but no postings in the reader's shard subset must yield an empty
        intersection, not an IndexError — rare terms are exactly the ones
        confined to few shards."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from searchengine_ray.query import ShardedQueryService

        root = tmp_path_factory.mktemp("subset")
        corpus = root / "corpus"
        corpus.mkdir()
        # file 0 → shard 0: alpha+beta together once, beta alone twice
        pq.write_table(
            pa.table(
                {
                    "conv_id": ["c0", "c0", "c1"],
                    "turn_idx": [0, 1, 0],
                    "role": ["user"] * 3,
                    "text": ["alpha beta", "beta beta", "beta"],
                }
            ),
            str(corpus / "part-00000.parquet"),
        )
        # file 1 → shard 1: alpha only — beta has NO postings here
        pq.write_table(
            pa.table(
                {
                    "conv_id": ["c2"],
                    "turn_idx": [0],
                    "role": ["user"],
                    "text": ["alpha"],
                }
            ),
            str(corpus / "part-00001.parquet"),
        )
        idx = str(root / "idx")
        build_index(str(corpus), idx, CFG.replace(analyzer="simple", num_shards=2))
        # global df: alpha=2 < beta=3 → alpha seeds, beta is the later term
        sub = QueryEngine(idx, shards=["shard=00001"])
        r = sub.search_ids("alpha beta")
        assert r["count"] == 0
        assert sub.search("alpha beta")["result"] is False
        # fan-out across both partitions still finds the real match
        svc = ShardedQueryService(idx, num_actors=2)
        try:
            full = svc.search_ids("alpha beta")
            assert full["count"] == 1
            assert list(full["conv_id"]) == ["c0"]
        finally:
            svc.shutdown()


class TestStaleTmpShards:
    def test_tmp_leftovers_ignored_and_cleaned(self, ray_session, built):
        """ADVICE r1 (medium): a crashed rebuild's ``shard=NNNNN.tmp`` dir
        must never be consumed as a real shard by the reader or finalize,
        and a resumed build must clean it up."""
        import shutil as _sh

        manifest, engine, oracle, corpus_dir, index_dir = built
        shards_root = os.path.join(index_dir, "shards")
        real = sorted(os.listdir(shards_root))[0]
        tmp = os.path.join(shards_root, real + ".tmp")
        _sh.copytree(os.path.join(shards_root, real), tmp)
        try:
            from searchengine_ray.index_store import IndexReader

            r = IndexReader(index_dir)
            assert all(not s.endswith(".tmp") for s in r.shard_names)
            # resumed build: same stats as the original, tmp removed
            m2 = build_index(corpus_dir, index_dir, CFG)
            assert m2["n_docs"] == manifest["n_docs"]
            assert m2["n_lemmas"] == manifest["n_lemmas"]
            assert not os.path.exists(tmp)
        finally:
            _sh.rmtree(tmp, ignore_errors=True)


class TestCooperativeStop:
    def test_stop_then_resume_equals_uninterrupted(
        self, ray_session, tiny_corpus, tmp_path_factory
    ):
        """Reference stopIndexing analogue: a build stopped after the first
        shard leaves a resumable partial state; resuming completes it and
        the final index equals an uninterrupted build exactly."""
        import json as _json

        import pyarrow.parquet as pq

        root = tmp_path_factory.mktemp("stop")
        corpus_dir = str(root / "corpus")
        os.makedirs(corpus_dir)
        n = tiny_corpus.num_rows
        per = (n + 3) // 4
        for i in range(4):
            chunk = tiny_corpus.slice(i * per, min(per, n - i * per))
            if chunk.num_rows:
                pq.write_table(chunk, f"{corpus_dir}/part-{i:05d}.parquet")
        cfg = CFG.replace(num_shards=4, build_concurrency=1)

        calls = {"n": 0}

        def stop_after_first():
            calls["n"] += 1
            # call 1 = build_index entry poll, call 2 = shard 0 launch;
            # later launches see True and skip
            return calls["n"] > 2

        idx_a = str(root / "idx_a")
        partial = build_index(corpus_dir, idx_a, cfg, stop_check=stop_after_first)
        assert partial["stopped"] is True
        assert len(partial["shards"]) == 1
        assert not os.path.exists(os.path.join(idx_a, "manifest.json"))

        # resume to completion, compare against a clean uninterrupted build
        done = build_index(corpus_dir, idx_a, cfg)
        assert "stopped" not in done
        idx_b = str(root / "idx_b")
        clean = build_index(corpus_dir, idx_b, cfg)
        assert done["n_docs"] == clean["n_docs"]
        assert done["n_lemmas"] == clean["n_lemmas"]
        da = pq.read_table(os.path.join(idx_a, "dictionary.parquet"))
        db = pq.read_table(os.path.join(idx_b, "dictionary.parquet"))
        assert da.equals(db)
        # resumed shard 0 was NOT rebuilt (manifest identity)
        with open(os.path.join(idx_a, "shards", "shard=00000", "_MANIFEST.json")) as f:
            assert _json.load(f)["wall_sec"] == partial["shards"][0]["wall_sec"]

    def test_stop_flag_file_api(self, ray_session, tiny_corpus, tmp_path_factory):
        """request_stop drops the flag; a fresh build consumes it (stale
        flags never dead-lock the next build)."""
        import pyarrow.parquet as pq

        from searchengine_ray.build import STOP_FLAG, request_stop

        root = tmp_path_factory.mktemp("stopflag")
        corpus_dir = str(root / "corpus")
        os.makedirs(corpus_dir)
        pq.write_table(tiny_corpus, f"{corpus_dir}/p.parquet")
        idx = str(root / "idx")
        request_stop(idx)
        assert os.path.exists(os.path.join(idx, STOP_FLAG))
        m = build_index(corpus_dir, idx, CFG.replace(num_shards=1))
        assert "stopped" not in m and m["n_docs"] == tiny_corpus.num_rows
        assert not os.path.exists(os.path.join(idx, STOP_FLAG))


class TestSiteScoping:
    @pytest.fixture(scope="class")
    def site_built(self, ray_session, tiny_corpus, tmp_path_factory):
        """Full index with site_column=role, plus a control index built from
        ONLY the assistant turns (no site column)."""
        import pyarrow.parquet as pq

        root = tmp_path_factory.mktemp("sites")
        corpus_dir = str(root / "corpus")
        os.makedirs(corpus_dir)
        pq.write_table(tiny_corpus, f"{corpus_dir}/p0.parquet")
        idx_full = str(root / "idx_full")
        cfg = CFG.replace(site_column="role", num_shards=2)
        build_index(corpus_dir, idx_full, cfg)

        sub_dir = str(root / "corpus_assistant")
        os.makedirs(sub_dir)
        mask = [r == "assistant" for r in tiny_corpus["role"].to_pylist()]
        import pyarrow as pa

        pq.write_table(tiny_corpus.filter(pa.array(mask)), f"{sub_dir}/p0.parquet")
        idx_sub = str(root / "idx_sub")
        build_index(sub_dir, idx_sub, CFG.replace(num_shards=2))
        return idx_full, idx_sub

    def test_site_scoped_equals_site_only_index(self, site_built):
        """search(site=X) on the full index must equal searching an index
        built from X's docs alone: same counts, ids, and BM25 scores
        (per-site df/N/avgdl == the sub-index's global stats)."""
        idx_full, idx_sub = site_built
        full = QueryEngine(idx_full)
        sub = QueryEngine(idx_sub)
        n_q = 0
        for q in reference_queries():
            if not q["query"]:
                continue
            a = full.search_ids(q["query"], site="assistant")
            b = sub.search_ids(q["query"])
            assert a["count"] == b["count"], q["query_id"]
            if a["count"] == 0:
                continue
            n_q += 1
            assert list(a["conv_id"]) == list(b["conv_id"]), q["query_id"]
            assert list(a["turn_idx"]) == list(b["turn_idx"]), q["query_id"]
            assert np.allclose(a["score"], b["score"], rtol=0, atol=1e-12), q["query_id"]
        assert n_q >= 3  # the comparison exercised real matches

    def test_site_manifest_and_dictionary(self, site_built):
        idx_full, _ = site_built
        from searchengine_ray.index_store import IndexReader

        r = IndexReader(idx_full)
        assert set(r.sites) == {"user", "assistant", "tool", "system"}
        assert sum(s["n_docs"] for s in r.sites.values()) == r.n_docs
        dfm = r.site_df_map("assistant")
        assert dfm  # non-empty
        # site dfs sum to the global dictionary's df per lemma
        total = {}
        for site in r.sites:
            for l, d in r.site_df_map(site).items():
                total[l] = total.get(l, 0) + d
        for l, d in total.items():
            assert d == r.df(l), l

    def test_sharded_site_scoped_matches_single(self, ray_session, site_built):
        from searchengine_ray.query import ShardedQueryService

        idx_full, _ = site_built
        single = QueryEngine(idx_full)
        svc = ShardedQueryService(idx_full, num_actors=2)
        try:
            for q in reference_queries():
                if not q["query"]:
                    continue
                a = single.search_ids(q["query"], site="assistant")
                b = svc.search_ids(q["query"], site="assistant")
                assert a["count"] == b["count"], q["query_id"]
                if a["count"]:
                    assert list(a["conv_id"]) == list(b["conv_id"]), q["query_id"]
                    assert np.allclose(a["score"], b["score"], rtol=0, atol=0), q["query_id"]
        finally:
            svc.shutdown()

    def test_unknown_site_is_nothing_found(self, site_built):
        idx_full, idx_sub = site_built
        full = QueryEngine(idx_full)
        assert full.search("суд", site="no-such-site")["result"] is False
        # an index built WITHOUT site_column rejects any site= scoping
        sub = QueryEngine(idx_sub)
        assert sub.search("суд", site="assistant")["result"] is False


class TestDistributedFinalize:
    def test_distributed_finalize_equals_driver(
        self, ray_session, tiny_corpus, tmp_path_factory
    ):
        """The Ray-job finalize (vocabulary never on the driver) must produce
        the same dictionary, site dictionary, stats and a working reader."""
        import pyarrow.parquet as pq

        from searchengine_ray.build import _finalize
        from searchengine_ray.index_store import IndexReader

        root = tmp_path_factory.mktemp("dfin")
        corpus_dir = str(root / "corpus")
        os.makedirs(corpus_dir)
        pq.write_table(tiny_corpus, f"{corpus_dir}/p.parquet")
        idx = str(root / "idx")
        cfg = CFG.replace(num_shards=2, site_column="role")
        m1 = build_index(corpus_dir, idx, cfg)
        d1 = (
            pq.read_table(os.path.join(idx, "dictionary.parquet"))
            .to_pandas()
            .sort_values("lemma")
            .reset_index(drop=True)
        )
        s1 = (
            pq.read_table(os.path.join(idx, "dictionary_sites.parquet"))
            .to_pandas()
            .sort_values(["site", "lemma"])
            .reset_index(drop=True)
        )
        m2 = _finalize(idx, cfg, m1["shards"], force_distributed=True)
        assert m2["n_docs"] == m1["n_docs"]
        assert m2["n_lemmas"] == m1["n_lemmas"]
        assert m2["sites"] == m1["sites"]
        d2 = (
            pq.read_table(os.path.join(idx, "dictionary.parquet"))
            .to_pandas()
            .sort_values("lemma")
            .reset_index(drop=True)
        )
        s2 = (
            pq.read_table(os.path.join(idx, "dictionary_sites.parquet"))
            .to_pandas()
            .sort_values(["site", "lemma"])
            .reset_index(drop=True)
        )
        assert d1.equals(d2[d1.columns])
        assert s1.equals(s2[s1.columns])
        # reader works over the directory-shaped dictionary; searches match
        eng = QueryEngine(idx)
        r = eng.search_ids("суд")
        assert r["count"] > 0
        # and a THIRD driver finalize over the directory layout round-trips
        m3 = _finalize(idx, cfg, m1["shards"])
        assert m3["n_lemmas"] == m1["n_lemmas"]

    def test_distributed_conv_distinct_equals_driver(
        self, ray_session, tiny_corpus, tmp_path_factory
    ):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from searchengine_ray.build import _distinct_conv_ids_distributed

        root = tmp_path_factory.mktemp("dconv")
        corpus_dir = str(root / "corpus")
        os.makedirs(corpus_dir)
        n = tiny_corpus.num_rows
        per = (n + 3) // 4
        files = []
        for i in range(4):
            chunk = tiny_corpus.slice(i * per, min(per, n - i * per))
            if chunk.num_rows:
                p = f"{corpus_dir}/part-{i:05d}.parquet"
                pq.write_table(chunk, p)
                files.append(p)
        want = sorted(
            pc.unique(tiny_corpus["conv_id"].combine_chunks()).to_pylist()
        )
        got = _distinct_conv_ids_distributed(files)
        assert got == want


class TestDedupTurns:
    def test_first_wins_then_build(self, ray_session, tiny_corpus, tmp_path_factory):
        """D4 first-wins preparation composes with the build: duplicated
        (conv_id, turn_idx) keys collapse to the EARLIEST (min ts) row and
        the deduped corpus passes strict key validation."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.transcripts import dedup_turns

        root = tmp_path_factory.mktemp("dedupturns")
        corpus = root / "corpus"
        corpus.mkdir()
        # duplicate the first 5 keys with LATER ts and different text —
        # first-wins must keep the originals
        dup = tiny_corpus.slice(0, 5).to_pydict()
        dup["text"] = ["LATER " + (t or "") for t in dup["text"]]
        dup["ts"] = [t.replace(year=2030) for t in dup["ts"]]
        dirty = pa.concat_tables(
            [tiny_corpus, pa.table(dup, schema=tiny_corpus.schema)]
        )
        pq.write_table(dirty, str(corpus / "p.parquet"))

        clean = root / "clean"
        files = dedup_turns(str(corpus), str(clean))
        assert files
        t = pq.read_table(str(clean))
        assert t.num_rows == tiny_corpus.num_rows
        # winners are the ORIGINAL rows (min ts)
        keep = {
            (c, i): x
            for c, i, x in zip(
                t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(), t["text"].to_pylist()
            )
        }
        for c, i, x in zip(
            tiny_corpus["conv_id"].to_pylist()[:5],
            tiny_corpus["turn_idx"].to_pylist()[:5],
            tiny_corpus["text"].to_pylist()[:5],
        ):
            assert keep[(c, i)] == x
        # composes with a strict build
        m = build_index(str(clean), str(root / "idx"), CFG, validate_unique_keys=True)
        assert m["n_docs"] == tiny_corpus.num_rows


class TestLazyDictionary:
    def test_lazy_reader_matches_eager(self, ray_session, built, monkeypatch):
        """Past the vocabulary threshold the reader resolves df via per-term
        pushdown point reads — results must equal the eager dict exactly."""
        from searchengine_ray.index_store import IndexReader
        from searchengine_ray.query import QueryEngine

        *_, index_dir = built
        monkeypatch.setattr(IndexReader, "_EAGER_DICT_MAX", 0)
        lazy = QueryEngine(index_dir)
        assert lazy.reader._dict_eager is False
        eager = QueryEngine(index_dir)  # monkeypatch applies; force eager
        monkeypatch.undo()
        eager2 = QueryEngine(index_dir)
        assert eager2.reader._dict_eager is True
        for q in reference_queries():
            if not q["query"]:
                continue
            a = lazy.search_ids(q["query"], limit=10)
            b = eager2.search_ids(q["query"], limit=10)
            assert a["count"] == b["count"], q["query_id"]
            if a["count"]:
                assert list(a["conv_id"]) == list(b["conv_id"]), q["query_id"]
                assert np.allclose(a["score"], b["score"], rtol=0, atol=0)
        assert lazy.reader.df("qqqzzz-not-a-lemma") == 0
        assert not lazy.reader.has("qqqzzz-not-a-lemma")


class TestSourceFormats:
    def test_jsonl_and_csv_build_equal_parquet(
        self, ray_session, tiny_corpus, tmp_path_factory
    ):
        """JSONL and CSV transcript sources build byte-identical indexes to
        the canonical Parquet source (same dictionary, stats, searches)."""
        import pyarrow.csv as pcsv
        import pyarrow.parquet as pq

        root = tmp_path_factory.mktemp("formats")
        cols = tiny_corpus.select(["conv_id", "turn_idx", "role", "text"])

        pq_dir = root / "pq"
        pq_dir.mkdir()
        pq.write_table(cols, str(pq_dir / "p.parquet"))

        jl_dir = root / "jl"
        jl_dir.mkdir()
        cols.to_pandas().to_json(
            str(jl_dir / "p.jsonl"), orient="records", lines=True, force_ascii=False
        )

        cs_dir = root / "cs"
        cs_dir.mkdir()
        pcsv.write_csv(cols, str(cs_dir / "p.csv"))

        manifests = {}
        dicts = {}
        for name, d in [("parquet", pq_dir), ("json", jl_dir), ("csv", cs_dir)]:
            idx = str(root / f"idx_{name}")
            manifests[name] = build_index(str(d), idx, CFG.replace(num_shards=2))
            dicts[name] = (
                pq.read_table(os.path.join(idx, "dictionary.parquet"))
                .to_pandas()
                .sort_values("lemma")
                .reset_index(drop=True)
            )
        for name in ("json", "csv"):
            assert manifests[name]["n_docs"] == manifests["parquet"]["n_docs"], name
            assert manifests[name]["avgdl"] == manifests["parquet"]["avgdl"], name
            assert dicts[name].equals(dicts["parquet"]), name
        # searches agree end-to-end
        engines = {n: QueryEngine(str(root / f"idx_{n}")) for n in manifests}
        for q in ["суд решение", "337", "закон статья срок"]:
            res = {n: e.search(q) for n, e in engines.items()}
            assert res["json"] == res["parquet"], q
            assert res["csv"] == res["parquet"], q

    def test_mixed_formats_rejected(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from searchengine_ray.sources import expand_input

        d = tmp_path / "mix"
        d.mkdir()
        pq.write_table(pa.table({"a": [1]}), str(d / "x.parquet"))
        (d / "y.jsonl").write_text('{"a": 1}\n')
        # Parquet is canonical: a mixed listing containing parquet resolves
        # to the parquet files (other extensions treated as auxiliary)
        files, fmt = expand_input(str(d))
        assert fmt == "parquet" and len(files) == 1
        # explicit format filters the listing the other way
        files, fmt = expand_input(str(d), "json")
        assert fmt == "json" and len(files) == 1
        # a parquet-less mix is ambiguous and rejected
        (d2 := tmp_path / "mix2").mkdir()
        (d2 / "a.jsonl").write_text('{"a": 1}\n')
        (d2 / "b.csv").write_text("a\n1\n")
        with pytest.raises(ValueError, match="mixed"):
            expand_input(str(d2))


class TestCustomLemmaTableShipping:
    def test_custom_table_reaches_build_workers(self, ray_session, tmp_path):
        """Code-review r4: morphology state is process-local, so a custom
        table installed via use_lemma_table on the driver must be SHIPPED
        to the ExplodePostings actors — otherwise the index is built under
        the bundled tables while the driver (and its manifest signature)
        speak the custom ones: query lemma != index lemma, silent zero
        recall. The custom mapping below disagrees with both the bundled
        table and the suffix-strip fallback for 'решение'."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from searchengine_ray import textproc
        from searchengine_ray.build import build_index
        from searchengine_ray.query import QueryEngine

        corpus = tmp_path / "corpus"
        corpus.mkdir()
        pq.write_table(
            pa.table(
                {
                    "conv_id": pa.array(["c0", "c0", "c1"]),
                    "turn_idx": pa.array([0, 1, 0], type=pa.int64()),
                    "role": pa.array(["user", "assistant", "user"]),
                    "text": pa.array(
                        ["решение суда", "встречный иск", "решение принято"]
                    ),
                }
            ),
            corpus / "part-00000.parquet",
        )
        idx = str(tmp_path / "idx")
        try:
            textproc.use_lemma_table({"решение": "каноник", "принято": "каноник2"})
            build_index(str(corpus), idx, CFG.replace(num_shards=1))
            eng = QueryEngine(idx)
            out = eng.search("решение", 0, 10)
            assert out["count"] == 2, out  # both docs found under the custom lemma
        finally:
            textproc.use_lemma_table(None)

    def test_custom_table_reaches_query_actors(self, ray_session, tmp_path):
        """Serving-side twin of the build fix (code-review r4): QueryActor
        __init__ runs in a fresh Ray worker process, so ShardedQueryService
        must ship the driver's custom table — otherwise actors lemmatize
        queries under the bundled tables against an index built under the
        custom ones: query lemma != index lemma, silent zero recall."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from searchengine_ray import textproc
        from searchengine_ray.build import build_index
        from searchengine_ray.query import ShardedQueryService

        corpus = tmp_path / "corpus"
        corpus.mkdir()
        for i in range(2):
            pq.write_table(
                pa.table(
                    {
                        "conv_id": pa.array([f"c{2 * i}", f"c{2 * i}", f"c{2 * i + 1}"]),
                        "turn_idx": pa.array([0, 1, 0], type=pa.int64()),
                        "role": pa.array(["user", "assistant", "user"]),
                        "text": pa.array(
                            ["решение суда", "встречный иск", "решение принято"]
                        ),
                    }
                ),
                corpus / f"part-{i:05d}.parquet",
            )
        idx = str(tmp_path / "idx")
        try:
            textproc.use_lemma_table({"решение": "каноник", "принято": "каноник2"})
            build_index(str(corpus), idx, CFG.replace(num_shards=2))
            svc = ShardedQueryService(idx, num_actors=2)
            out = svc.search_ids("решение")
            assert out["count"] == 4, out  # all four docs, across both actors
        finally:
            textproc.use_lemma_table(None)
