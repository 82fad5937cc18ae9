"""Doc-level incremental upsert (delta generations, ``delta.py``) vs a
from-scratch rebuild of the updated corpus.

Reference semantics: ``POST /api/indexPage`` replaces ONE page in place —
old postings dropped, dfs decremented, new content indexed
(``services/PageProcessorService.java:34-46``,
``Repositories/LemmaRepository.java:40-47``). The invariant asserted here:
after any sequence of upserts, every search response over the delta-overlaid
index EQUALS the response from an index built from scratch over the updated
corpus (scores, ordering, snippets, counts, stats)."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.build import build_index
from searchengine_ray.config import EngineConfig
from searchengine_ray.corpus import generate_transcripts, reference_queries
from searchengine_ray.delta import clear_delta, load_state, upsert_docs
from searchengine_ray.query import QueryEngine

CFG = EngineConfig(num_shards=2, num_segments=4, lemmatizer_concurrency=(1, 2), batch_size=512)

# texts reuse corpus vocabulary (reference-query hits) plus one lemma that
# exists ONLY via upsert (delta-only dictionary entry)
NEW_TEXT_1 = "суд принял решение по жалобе ответчика в срок"
NEW_TEXT_2 = "статья закона о налогах и новослово"
NEW_TEXT_3 = "вопросы агента и суд"


def _write_corpus(table: pa.Table, out_dir: str, n_files: int = 4) -> None:
    os.makedirs(out_dir)
    n = table.num_rows
    per = (n + n_files - 1) // n_files
    for i in range(n_files):
        chunk = table.slice(i * per, min(per, n - i * per))
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(out_dir, f"part-{i:05d}.parquet"))


def _apply_rows(table: pa.Table, rows: list[dict]) -> pa.Table:
    """The updated-corpus view of an upsert batch: replace matching
    (conv_id, turn_idx) rows, append the rest (insertion order)."""
    df = table.to_pandas()
    added = []
    for r in rows:
        m = (df["conv_id"] == r["conv_id"]) & (df["turn_idx"] == r["turn_idx"])
        if m.any():
            df.loc[m, "text"] = r["text"]
            df.loc[m, "role"] = r["role"]
        else:
            added.append(
                {
                    "conv_id": r["conv_id"],
                    "turn_idx": r["turn_idx"],
                    "role": r["role"],
                    "text": r["text"],
                    "tool": "",
                    "ts": df["ts"].iloc[0],
                }
            )
    if added:
        import pandas as pd

        df = pd.concat([df, pd.DataFrame(added)], ignore_index=True)
    return pa.Table.from_pandas(df, schema=table.schema, preserve_index=False)


def _assert_engines_equal(upserted: QueryEngine, fresh: QueryEngine, queries: list[str], site=None):
    assert upserted.reader.n_docs == fresh.reader.n_docs
    assert upserted.reader.avgdl == fresh.reader.avgdl
    assert upserted.reader.df_map == fresh.reader.df_map
    for q in queries:
        a = upserted.search(q, 0, 10, site=site)
        b = fresh.search(q, 0, 10, site=site)
        assert a == b, f"search({q!r}, site={site!r}) diverged"


@pytest.fixture(scope="module")
def base(ray_session, tiny_corpus, tmp_path_factory):
    """One base build (no sites) shared by the module; tests copytree it."""
    root = tmp_path_factory.mktemp("delta")
    corpus_dir = str(root / "corpus")
    _write_corpus(tiny_corpus, corpus_dir)
    index_dir = str(root / "index")
    build_index(corpus_dir, index_dir, CFG)
    return tiny_corpus, index_dir, root


def _fresh_build(root, name: str, table: pa.Table) -> QueryEngine:
    corpus_dir = str(root / f"corpus-{name}")
    _write_corpus(table, corpus_dir)
    idx = str(root / f"index-{name}")
    build_index(corpus_dir, idx, CFG)
    return QueryEngine(idx)


ALL_QUERIES = [q["query"] for q in reference_queries()] + [
    "жалобе ответчика",
    "новослово",
    "решение срок",
]


class TestUpsertEqualsRebuild:
    def test_replace_and_add_existing_convs(self, base, tmp_path):
        """Replacements + additions confined to existing conversations give
        IDENTICAL docids, hence full response equality (order, scores,
        snippets) on every reference query."""
        table, index_dir, root = base
        idx = str(tmp_path / "idx")
        shutil.copytree(index_dir, idx)
        rows = [
            # replace two docs that exist in main
            {"conv_id": "conv-000000", "turn_idx": 3, "role": "tool", "text": NEW_TEXT_1},
            {"conv_id": "conv-000005", "turn_idx": 0, "role": "user", "text": NEW_TEXT_2},
            # add a new turn to an existing conversation
            {"conv_id": "conv-000002", "turn_idx": 900, "role": "assistant", "text": NEW_TEXT_3},
        ]
        out = upsert_docs(idx, rows)
        assert out == {"generation": 0, "replaced": 2, "added": 1}

        fresh = _fresh_build(root, "g1", _apply_rows(table, rows))
        _assert_engines_equal(QueryEngine(idx), fresh, ALL_QUERIES)

    def test_second_generation_latest_wins(self, base, tmp_path):
        """A second upsert replacing a gen-0 doc supersedes it exactly."""
        table, index_dir, root = base
        idx = str(tmp_path / "idx")
        shutil.copytree(index_dir, idx)
        g0 = [
            {"conv_id": "conv-000000", "turn_idx": 3, "role": "tool", "text": NEW_TEXT_1},
            {"conv_id": "conv-000002", "turn_idx": 900, "role": "assistant", "text": NEW_TEXT_3},
        ]
        upsert_docs(idx, g0)
        g1 = [
            # replace the gen-0 replacement AND the gen-0 addition
            {"conv_id": "conv-000000", "turn_idx": 3, "role": "tool", "text": NEW_TEXT_2},
            {"conv_id": "conv-000002", "turn_idx": 900, "role": "assistant", "text": NEW_TEXT_1},
        ]
        out = upsert_docs(idx, g1)
        assert out == {"generation": 1, "replaced": 2, "added": 0}

        fresh = _fresh_build(root, "g2", _apply_rows(_apply_rows(table, g0), g1))
        _assert_engines_equal(QueryEngine(idx), fresh, ALL_QUERIES)

    def test_new_conversation(self, base, tmp_path):
        """A doc in a brand-new conversation: conv id chosen to sort after
        every main conv id, so the docid⇔(conv_id, turn_idx) isomorphism is
        preserved and full response equality still holds."""
        table, index_dir, root = base
        idx = str(tmp_path / "idx")
        shutil.copytree(index_dir, idx)
        rows = [
            {"conv_id": "zzzz-new-conv", "turn_idx": 0, "role": "user", "text": NEW_TEXT_1},
            {"conv_id": "zzzz-new-conv", "turn_idx": 1, "role": "assistant", "text": NEW_TEXT_2},
        ]
        out = upsert_docs(idx, rows)
        assert out == {"generation": 0, "replaced": 0, "added": 2}

        eng = QueryEngine(idx)
        # conv view covers main + delta
        assert len(eng.reader.conv_ids) == 21
        assert str(eng.reader.conv_ids[20]) == "zzzz-new-conv"

        fresh = _fresh_build(root, "g3", _apply_rows(table, rows))
        _assert_engines_equal(eng, fresh, ALL_QUERIES)

    def test_rebuild_compacts_delta(self, base, tmp_path):
        """A full build over the index dir drops the delta overlay."""
        table, index_dir, root = base
        idx = str(tmp_path / "idx")
        shutil.copytree(index_dir, idx)
        rows = [{"conv_id": "conv-000000", "turn_idx": 3, "role": "tool", "text": NEW_TEXT_1}]
        upsert_docs(idx, rows)
        assert load_state(idx) is not None

        corpus_dir = str(tmp_path / "corpus")
        _write_corpus(_apply_rows(table, rows), corpus_dir)
        build_index(corpus_dir, idx, CFG)
        assert load_state(idx) is None
        eng = QueryEngine(idx)
        assert eng.reader.delta is None
        fresh = _fresh_build(root, "g4", _apply_rows(table, rows))
        _assert_engines_equal(eng, fresh, ALL_QUERIES)

    def test_validation_errors(self, base, tmp_path):
        _, index_dir, _ = base
        idx = str(tmp_path / "idx")
        shutil.copytree(index_dir, idx)
        with pytest.raises(ValueError, match="empty"):
            upsert_docs(idx, [])
        with pytest.raises(ValueError, match="duplicate"):
            upsert_docs(
                idx,
                [
                    {"conv_id": "a", "turn_idx": 0, "role": "user", "text": "x"},
                    {"conv_id": "a", "turn_idx": 0, "role": "user", "text": "y"},
                ],
            )
        # failed validation must leave no delta state behind
        assert load_state(idx) is None


class TestShardedServingWithDelta:
    def test_sharded_equals_single_process(self, base, tmp_path):
        """Partition serving over an upserted index: delta DOC contributions
        must be owned by exactly one actor (others only supersede-filter),
        so the fan-out merge equals single-process evaluation — no
        duplicated delta hits, counts sum exactly."""
        from searchengine_ray.query import ShardedQueryService

        table, index_dir, root = base
        idx = str(tmp_path / "idx")
        shutil.copytree(index_dir, idx)
        rows = [
            {"conv_id": "conv-000000", "turn_idx": 3, "role": "tool", "text": NEW_TEXT_1},
            {"conv_id": "conv-000002", "turn_idx": 900, "role": "assistant", "text": NEW_TEXT_3},
            {"conv_id": "zzzz-new-conv", "turn_idx": 0, "role": "user", "text": NEW_TEXT_2},
        ]
        upsert_docs(idx, rows)

        single = QueryEngine(idx)
        svc = ShardedQueryService(idx, num_actors=2)
        try:
            for q in ALL_QUERIES:
                s = single.search(q, 0, 10)
                m = svc.search(q, 0, 10)
                if not s.get("result"):
                    assert not m.get("result"), q
                    continue
                assert m["count"] == s["count"], q
                assert [(d["conv_id"], d["turn_idx"]) for d in m["data"]] == [
                    (d["conv_id"], d["turn_idx"]) for d in s["data"]
                ], q
                r_ids = svc.search_ids(q)
                s_ids = single.search_ids(q)
                assert r_ids["count"] == s_ids["count"], q
        finally:
            svc.shutdown()


class TestSiteScopedUpsert:
    def test_site_move_matches_rebuild(self, ray_session, tiny_corpus, tmp_path):
        """Replacing a doc with a different role (= site) moves it between
        per-site dictionaries/stats exactly as a rebuild would."""
        cfg = CFG.replace(site_column="role")
        corpus_dir = str(tmp_path / "corpus")
        _write_corpus(tiny_corpus, corpus_dir)
        idx = str(tmp_path / "idx")
        build_index(corpus_dir, idx, cfg)

        rows = [
            # conv-000000/3 is role=tool in the corpus — move it to user
            {"conv_id": "conv-000000", "turn_idx": 3, "role": "user", "text": NEW_TEXT_1},
            {"conv_id": "zzzz-new", "turn_idx": 0, "role": "system", "text": NEW_TEXT_2},
        ]
        upsert_docs(idx, rows)

        corpus2 = str(tmp_path / "corpus2")
        _write_corpus(_apply_rows(tiny_corpus, rows), corpus2)
        idx2 = str(tmp_path / "idx2")
        build_index(corpus2, idx2, cfg)

        eng, fresh = QueryEngine(idx), QueryEngine(idx2)
        assert eng.reader.sites == fresh.reader.sites
        for site in ("user", "tool", "assistant", "system"):
            assert eng.reader.site_df_map(site) == fresh.reader.site_df_map(site), site
            for q in ALL_QUERIES:
                assert eng.search(q, 0, 10, site=site) == fresh.search(q, 0, 10, site=site), (q, site)


class TestUpsertCli:
    def test_cli_upsert_and_stats(self, base, tmp_path, capsys):
        from searchengine_ray.cli import main

        _, index_dir, _ = base
        idx = str(tmp_path / "idx")
        shutil.copytree(index_dir, idx)

        doc = {"conv_id": "conv-000001", "turn_idx": 0, "role": "user", "text": NEW_TEXT_1}
        assert main(["upsert", "--index", idx, "--doc", json.dumps(doc)]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out == {"result": True, "generation": 0, "replaced": 1, "added": 0}

        # JSONL input path; a new doc this time
        path = str(tmp_path / "rows.jsonl")
        with open(path, "w") as f:
            f.write(json.dumps({"conv_id": "zzzz-cli", "turn_idx": 0, "role": "user", "text": NEW_TEXT_2}) + "\n")
        assert main(["upsert", "--index", idx, "--input", path]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["added"] == 1 and out["generation"] == 1

        # stats reflect the overlay (one added doc; avgdl = reader's)
        assert main(["stats", "--index", idx]) == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        eng = QueryEngine(idx)
        total = stats["statistics"]["total"]
        assert total["docs"] == eng.reader.n_docs
        assert total["avgdl"] == round(eng.reader.avgdl, 4)
        assert total["pending_upserts"] == 2

        # search CLI serves the upserted content
        assert main(["search", "--index", idx, "--query", "новослово"]) == 0
        resp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert resp["result"] is True and resp["count"] == 1
        assert resp["data"][0]["conv_id"] == "zzzz-cli"


class TestRandomizedUpsertSequence:
    def test_seeded_random_generations_equal_rebuild(self, base, tmp_path):
        """Four seeded-random generations mixing replacements (of main docs
        AND of docs upserted in earlier generations), added turns, brand-new
        conversations, and an empty-text replacement — the overlaid index
        must equal a from-scratch build of the final corpus on every query."""
        table, index_dir, root = base
        idx = str(tmp_path / "idx")
        shutil.copytree(index_dir, idx)

        rng = np.random.default_rng(2026)
        vocab = [
            "суд", "решение", "жалобе", "ответчика", "закона",
            "налогах", "агента", "срок", "статья", "вопросы",
        ]

        def rand_text() -> str:
            k = int(rng.integers(3, 9))
            return " ".join(vocab[int(j)] for j in rng.integers(0, len(vocab), k))

        cur = table
        prev_upserts: list[tuple[str, int]] = []
        for gen in range(4):
            df = cur.to_pandas()
            rows, seen = [], set()
            for i in range(5):
                kind = int(rng.integers(0, 4))
                if kind == 0 and prev_upserts:  # re-replace an upserted doc
                    conv, turn = prev_upserts[int(rng.integers(0, len(prev_upserts)))]
                elif kind <= 1:  # replace a random existing doc
                    r = int(rng.integers(0, len(df)))
                    conv, turn = str(df["conv_id"].iloc[r]), int(df["turn_idx"].iloc[r])
                elif kind == 2:  # add a new turn to an existing conv
                    r = int(rng.integers(0, len(df)))
                    conv, turn = str(df["conv_id"].iloc[r]), 900 + gen * 10 + i
                else:  # new conversation, sorts after every derived conv id
                    conv, turn = f"zzz-rand-{gen:02d}-{i}", 0
                if (conv, turn) in seen:  # one version per doc per batch
                    continue
                seen.add((conv, turn))
                text = "" if (gen == 2 and i == 0) else rand_text()
                role = ["user", "assistant", "system", "tool"][int(rng.integers(0, 4))]
                rows.append(
                    {"conv_id": conv, "turn_idx": turn, "role": role, "text": text}
                )
                prev_upserts.append((conv, turn))
            upsert_docs(idx, rows)
            cur = _apply_rows(cur, rows)

        fresh = _fresh_build(root, "rand", cur)
        _assert_engines_equal(QueryEngine(idx), fresh, ALL_QUERIES)


class TestDeltaSurvivesRebuildLifecycles:
    """ADVICE r2: the delta overlay must only be dropped when a finalized
    rebuild actually supersedes it — never by a stopped/failed build, and
    never by a no-op reindex over the recorded unchanged inputs."""

    def test_stopped_build_preserves_delta(self, base, tmp_path):
        """A build stopped before finalize leaves the serving index — and
        its upsert overlay — untouched. The replacement edits an EXISTING
        doc (conv dict stays a superset, shards stay valid); the pre-entry
        stop poll also guards the new-conv invalidation path."""
        table, index_dir, root = base
        idx = str(tmp_path / "idx")
        shutil.copytree(index_dir, idx)
        rows = [
            {"conv_id": "conv-000000", "turn_idx": 3, "role": "tool", "text": NEW_TEXT_2}
        ]
        upsert_docs(idx, rows)
        before = QueryEngine(idx).search("новослово", 0, 10)
        assert before["count"] == 1

        corpus_dir = str(tmp_path / "corpus")
        _write_corpus(_apply_rows(table, rows), corpus_dir)
        out = build_index(corpus_dir, idx, CFG, stop_check=lambda: True)
        assert out["stopped"] is True
        # the still-serving index keeps its upserts
        assert load_state(idx) is not None
        assert QueryEngine(idx).search("новослово", 0, 10) == before

    def test_noop_reindex_preserves_delta(self, base, tmp_path, capsys):
        from searchengine_ray.cli import main

        _, index_dir, _ = base
        idx = str(tmp_path / "idx")
        shutil.copytree(index_dir, idx)
        rows = [{"conv_id": "zzzz-keep", "turn_idx": 0, "role": "user", "text": NEW_TEXT_2}]
        upsert_docs(idx, rows)
        before = QueryEngine(idx).search("новослово", 0, 10)
        n_docs_before = QueryEngine(idx).reader.n_docs

        assert main(["reindex", "--index", idx]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rebuilt_shards"] == []
        # overlay intact: generations still present, searches identical
        assert load_state(idx) is not None
        eng = QueryEngine(idx)
        assert eng.reader.n_docs == n_docs_before
        assert eng.search("новослово", 0, 10) == before

    def test_changed_morphology_reindex_supersedes_delta(self, base, tmp_path, capsys):
        """Code-review r4: unchanged INPUTS don't prove the overlay valid —
        changed morphology tables rebuild every shard under NEW lemma keys,
        so keep_delta must be refused (overlay dropped with a warning), not
        rebound onto an index it no longer matches."""
        from searchengine_ray import textproc
        from searchengine_ray.cli import main

        _, index_dir, _ = base
        idx = str(tmp_path / "idx")
        shutil.copytree(index_dir, idx)
        upsert_docs(
            idx, [{"conv_id": "zzzz-morph", "turn_idx": 0, "role": "user", "text": NEW_TEXT_2}]
        )
        assert QueryEngine(idx).search("новослово", 0, 10)["count"] == 1
        try:
            textproc.use_lemma_table({"зюзюка": "зюзюк"})  # different signature
            assert main(["reindex", "--index", idx]) == 0
            err = capsys.readouterr().err
            assert "morphology" in err
            # shards rebuilt under the new tables; overlay dropped
            assert load_state(idx) is None
        finally:
            textproc.use_lemma_table(None)

    def test_changed_input_reindex_supersedes_delta(self, base, tmp_path, capsys):
        """A reindex over CHANGED inputs compacts: the rebuild wins, the
        overlay is dropped after finalize (with a warning)."""
        from searchengine_ray.cli import main

        table, index_dir, root = base
        # private corpus + index (we edit the corpus)
        corpus_dir = str(tmp_path / "corpus")
        _write_corpus(table, corpus_dir)
        idx = str(tmp_path / "idx")
        build_index(corpus_dir, idx, CFG)
        upsert_docs(
            idx, [{"conv_id": "zzzz-gone", "turn_idx": 0, "role": "user", "text": NEW_TEXT_2}]
        )
        assert QueryEngine(idx).search("новослово", 0, 10)["count"] == 1

        # edit one input file
        files = sorted(os.listdir(corpus_dir))
        victim = os.path.join(corpus_dir, files[0])
        t = pq.read_table(victim)
        texts = t["text"].to_pylist()
        texts[0] = (texts[0] or "") + " изменение"
        pq.write_table(
            t.set_column(t.schema.get_field_index("text"), "text", pa.array(texts)),
            victim,
        )
        assert main(["reindex", "--index", idx]) == 0
        err = capsys.readouterr().err
        assert "supersedes" in err
        assert load_state(idx) is None
        # the rebuild (without the upsert) is what serves now
        assert QueryEngine(idx).search("новослово", 0, 10)["count"] == 0


class TestBuildEpochGate:
    """ADVICE r3: a crash in the window between a rebuild's finalize and its
    clear_delta must not leave stale generations — whose docids are relative
    to the OLD conv ranking — durably applied over the new index. Every
    finalize mints a manifest ``build_id``; state from another epoch is
    ignored and physically dropped by the next upsert."""

    def test_crash_window_drops_stale_overlay(self, base, tmp_path, monkeypatch):
        table, index_dir, root = base
        idx = str(tmp_path / "idx")
        shutil.copytree(index_dir, idx)
        upsert_docs(
            idx, [{"conv_id": "zzzz-stale", "turn_idx": 0, "role": "user", "text": NEW_TEXT_2}]
        )
        assert QueryEngine(idx).search("новослово", 0, 10)["count"] == 1

        # simulate the crash: the rebuild finalizes (new epoch) but dies
        # before clear_delta runs
        import searchengine_ray.delta as delta_mod

        monkeypatch.setattr(delta_mod, "clear_delta", lambda _d: None)
        corpus_dir = str(tmp_path / "corpus")
        _write_corpus(table, corpus_dir)
        build_index(corpus_dir, idx, CFG)
        monkeypatch.undo()

        # stale-epoch generations still on disk, but logically absent
        assert os.path.exists(os.path.join(idx, "delta", "state.json")) or load_state(idx) is None
        assert load_state(idx) is None
        assert QueryEngine(idx).search("новослово", 0, 10)["count"] == 0

        # the next upsert physically clears the debris and starts epoch-fresh
        upsert_docs(
            idx, [{"conv_id": "zzzz-fresh", "turn_idx": 0, "role": "user", "text": NEW_TEXT_3}]
        )
        st = load_state(idx)
        assert st is not None and len(st["generations"]) == 1
        with open(os.path.join(idx, "manifest.json")) as f:
            assert st["build_id"] == json.load(f)["build_id"]
        assert QueryEngine(idx).search("новослово", 0, 10)["count"] == 0

    def test_keep_delta_rebinds_epoch(self, base, tmp_path):
        """build_index(keep_delta=True) — the no-op-reindex path — must
        carry the overlay onto the NEW epoch (the caller proved validity)."""
        table, index_dir, root = base
        corpus_dir = str(tmp_path / "corpus")
        _write_corpus(table, corpus_dir)
        idx = str(tmp_path / "idx")
        build_index(corpus_dir, idx, CFG)
        upsert_docs(
            idx, [{"conv_id": "conv-000000", "turn_idx": 3, "role": "tool", "text": NEW_TEXT_2}]
        )
        before = QueryEngine(idx).search("новослово", 0, 10)
        assert before["count"] == 1
        build_index(corpus_dir, idx, CFG, keep_delta=True)
        st = load_state(idx)
        assert st is not None and len(st["generations"]) == 1
        assert QueryEngine(idx).search("новослово", 0, 10) == before

    def test_keep_delta_crash_between_finalize_and_rebind(
        self, base, tmp_path, monkeypatch
    ):
        """Code-review r4: a crash AFTER a keep_delta rebuild's finalize but
        BEFORE rebind_delta_epoch must not drop the (provably valid)
        overlay — the pre-stamp widens the epoch set to {old, new} before
        the manifest replace, so the gate accepts either side."""
        table, index_dir, root = base
        corpus_dir = str(tmp_path / "corpus")
        _write_corpus(table, corpus_dir)
        idx = str(tmp_path / "idx")
        build_index(corpus_dir, idx, CFG)
        upsert_docs(
            idx, [{"conv_id": "conv-000000", "turn_idx": 3, "role": "tool", "text": NEW_TEXT_2}]
        )
        before = QueryEngine(idx).search("новослово", 0, 10)
        assert before["count"] == 1

        import searchengine_ray.delta as delta_mod

        # crash simulation: finalize lands (new manifest build_id) but the
        # post-finalize rebind never runs
        monkeypatch.setattr(delta_mod, "rebind_delta_epoch", lambda _d, _b: None)
        build_index(corpus_dir, idx, CFG, keep_delta=True)
        monkeypatch.undo()
        st = load_state(idx)
        assert st is not None and len(st["generations"]) == 1  # overlay alive
        assert QueryEngine(idx).search("новослово", 0, 10) == before

        # ...and the OTHER side of the window: pre-stamp lands but finalize
        # does not (old manifest still current) — overlay also alive
        from searchengine_ray.delta import pre_rebind_delta_epoch

        pre_rebind_delta_epoch(idx, "deadbeef" * 4)
        assert load_state(idx) is not None
        assert QueryEngine(idx).search("новослово", 0, 10) == before
        # a later NON-keep_delta rebuild mints a third id → gate drops it
        build_index(corpus_dir, idx, CFG)
        assert load_state(idx) is None

    def test_changed_extractor_reindex_supersedes_delta(
        self, ray_session, tmp_path, capsys
    ):
        """Code-review r4 follow-up: for an html_content index, unchanged
        inputs + unchanged morphology still don't prove the overlay valid
        when the HTML-extraction rules changed — every shard rebuilds over
        differently-extracted text while the overlay speaks the old one.
        The manifest records the extractor version for exactly this gate."""
        from searchengine_ray.cli import main
        from searchengine_ray.htmltext import EXTRACTOR_VERSION

        corpus = str(tmp_path / "corpus")
        os.makedirs(corpus)
        pq.write_table(
            pa.table(
                {
                    "conv_id": pa.array(["c0", "c0", "c1"]),
                    "turn_idx": pa.array([0, 1, 0], type=pa.int64()),
                    "role": pa.array(["user", "assistant", "user"]),
                    "text": pa.array(
                        [
                            "<html><body><p>решение суда</p></body></html>",
                            "<html><body>встречный иск</body></html>",
                            "<html><body>решение принято</body></html>",
                        ]
                    ),
                }
            ),
            os.path.join(corpus, "part-00000.parquet"),
        )
        idx = str(tmp_path / "idx")
        build_index(corpus, idx, CFG.replace(num_shards=1, html_content=True))
        mpath = os.path.join(idx, "manifest.json")
        with open(mpath) as f:
            m = json.load(f)
        # the manifest records extraction provenance (plain-text: None)
        assert m["html_extractor"] == EXTRACTOR_VERSION
        upsert_docs(
            idx,
            [
                {
                    "conv_id": "zz",
                    "turn_idx": 0,
                    "role": "user",
                    "text": "<html><body>новослово</body></html>",
                }
            ],
        )
        assert load_state(idx) is not None
        # simulate an index built under an OLDER extractor version
        m["html_extractor"] = 0
        with open(mpath, "w") as f:
            json.dump(m, f)
        assert main(["reindex", "--index", idx]) == 0
        err = capsys.readouterr().err
        assert "HTML-extraction" in err
        assert load_state(idx) is None

    def test_legacy_manifest_reindex_reason(self, base, tmp_path, capsys):
        """A manifest predating the morphology/extractor signature fields
        can't prove overlay validity: the overlay conservatively drops,
        with an honest 'predates signatures' reason instead of the
        misleading 'changed morphology tables' (nothing changed)."""
        from searchengine_ray.cli import main

        _, index_dir, _ = base
        idx = str(tmp_path / "idx")
        shutil.copytree(index_dir, idx)
        upsert_docs(
            idx,
            [{"conv_id": "zzzz-legacy", "turn_idx": 0, "role": "user", "text": NEW_TEXT_2}],
        )
        mpath = os.path.join(idx, "manifest.json")
        with open(mpath) as f:
            m = json.load(f)
        del m["morphology"]
        m.pop("html_extractor", None)
        with open(mpath, "w") as f:
            json.dump(m, f)
        assert main(["reindex", "--index", idx]) == 0
        err = capsys.readouterr().err
        assert "predates" in err and "morphology tables" not in err
        assert load_state(idx) is None


class TestEmptySiteUpsert:
    def test_empty_site_doc_does_not_double_count_global_df(
        self, ray_session, tiny_corpus, tmp_path
    ):
        """ADVICE r2: with site_column set, a doc whose site value is ""
        must bump ONLY the global dict_delta row (site "" IS the global row
        in DeltaView) — pre-fix the global df was double-counted, skewing
        idf after upserts. tool == "" for every non-tool-role row."""
        cfg = CFG.replace(site_column="tool")
        corpus_dir = str(tmp_path / "corpus")
        _write_corpus(tiny_corpus, corpus_dir)
        idx = str(tmp_path / "idx")
        build_index(corpus_dir, idx, cfg)

        rows = [
            # conv-000001/0 is role=user → tool == "" (empty site), replaced
            {"conv_id": "conv-000001", "turn_idx": 0, "role": "user", "text": NEW_TEXT_1},
            # brand-new doc with no tool field → empty site
            {"conv_id": "zzzz-nosite", "turn_idx": 0, "role": "user", "text": NEW_TEXT_2},
        ]
        upsert_docs(idx, rows)

        corpus2 = str(tmp_path / "corpus2")
        _write_corpus(_apply_rows(tiny_corpus, rows), corpus2)
        idx2 = str(tmp_path / "idx2")
        build_index(corpus2, idx2, cfg)

        eng, fresh = QueryEngine(idx), QueryEngine(idx2)
        assert eng.reader.df_map == fresh.reader.df_map
        assert eng.reader.sites == fresh.reader.sites
        _assert_engines_equal(eng, fresh, ALL_QUERIES)
        # per-site search over a REAL site still matches after the upsert
        for site in sorted(s for s in fresh.reader.sites if s):
            assert eng.reader.site_df_map(site) == fresh.reader.site_df_map(site), site
            for q in ALL_QUERIES[:4]:
                assert eng.search(q, 0, 10, site=site) == fresh.search(q, 0, 10, site=site)
