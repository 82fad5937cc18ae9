"""Training-data pipelines vs brute-force oracles at sf0.001
(dedup / similarity / text stats / multimodal; SURVEY.md training-data ops)."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


@pytest.fixture(scope="module")
def emb():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    return t["vec_id"].to_numpy(), np.asarray(t["embedding"].to_pylist(), dtype=np.float64)


class TestDedup:
    def test_exact_dedup(self, ray_session, docs):
        from searchengine_ray.pipelines.dedup import exact_dedup

        out = exact_dedup(SF).to_pandas()
        # every document lands in exactly one group
        assert out["n_dups"].sum() == len(docs)
        # representative is the min doc_id of its text group
        by_text = {}
        for did, text in docs.items():
            by_text.setdefault(text, []).append(did)
        expected_reps = sorted(min(v) for v in by_text.values())
        assert sorted(out["rep_doc_id"].tolist()) == expected_reps

    def test_minhash_sound_and_complete(self, ray_session, docs):
        from searchengine_ray.pipelines.dedup import minhash_dups, word_shingles

        out = minhash_dups(SF, threshold=0.8).to_pandas()
        sh = {d: word_shingles(t or "") for d, t in docs.items()}
        ids = sorted(docs)
        brute = set()
        for a, b in itertools.combinations(ids, 2):
            sa, sb = sh[a], sh[b]
            if sa and sb and len(sa & sb) / len(sa | sb) >= 0.8:
                brute.add((a, b))
        got = set(zip(out["doc_a"].tolist(), out["doc_b"].tolist()))
        assert got <= brute or not brute  # soundness: every pair is a true dup
        assert got == brute  # 16x4 banding at j>=0.8: detection ~0.9998

    def test_hot_bucket_deferred_split_all_identical(
        self, ray_session, tmp_path, monkeypatch
    ):
        """Adversarial all-identical corpus (VERDICT r3 item 7): every band
        bucket holds ALL docs, so the per-task pair budget trips and the
        deferred cell split must (a) keep per-task enumeration bounded by
        design, (b) produce the EXACT K·(K-1)/2 true pairs with no
        duplicates — the verify zip collapses the 16 per-band copies."""
        import pyarrow.parquet as pqw

        import searchengine_ray.pipelines.dedup as dd

        k = 120
        sf = tmp_path / "sf"
        sf.mkdir()
        pqw.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(k), type=pa.int64()),
                    "text": pa.array(
                        ["the same exact document text body repeated verbatim"] * k
                    ),
                    "lang": pa.array(["en"] * k),
                    "source": pa.array(["t"] * k),
                    "n_chars": pa.array([50] * k, type=pa.int64()),
                }
            ),
            sf / "documents.parquet",
        )
        orig = dd._candidate_pairs_ds
        max_task_pairs = 200  # force the deferred path (k²/2 = 7140 ≫ 200)

        def forced(bands_ds, max_bucket=64, min_band_collisions=1, **kw):
            return orig(
                bands_ds,
                max_bucket=16,
                min_band_collisions=min_band_collisions,
                max_bucket_pairs=max_task_pairs,
            )

        monkeypatch.setattr(dd, "_candidate_pairs_ds", forced)
        out = dd.minhash_dups(str(sf), threshold=0.8).to_pandas()
        got = set(zip(out["doc_a"].tolist(), out["doc_b"].tolist()))
        expected = {(a, b) for a in range(k) for b in range(a + 1, k)}
        assert got == expected
        assert len(out) == k * (k - 1) // 2  # no duplicate rows
        assert (out["jaccard_r"] == 1.0).all()

    def test_dedup_substrings_matches_bruteforce(self, ray_session, docs):
        from searchengine_ray.pipelines.dedup import dedup_substrings
        from searchengine_ray.textproc import tokenize_simple

        k = 8
        out = dedup_substrings(SF, k=k)
        # brute force: count k-grams corpus-wide, mark duplicated positions,
        # merge runs with the engine's rule (break where pos > prev + k)
        from collections import Counter

        grams: dict[int, list[tuple[int, ...]]] = {}
        cnt: Counter = Counter()
        for did, text in docs.items():
            ts = tokenize_simple(text or "")
            gs = [tuple(ts[i : i + k]) for i in range(len(ts) - k + 1)]
            grams[did] = gs
            cnt.update(gs)
        expected = []
        for did in sorted(docs):
            dup = [i for i, g in enumerate(grams.get(did, [])) if cnt[g] >= 2]
            if not dup:
                continue
            start, prev, n = dup[0], dup[0], 1
            for p in dup[1:]:
                if p > prev + k:
                    expected.append((did, start, prev + k, n))
                    start, n = p, 0
                prev = p
                n += 1
            expected.append((did, start, prev + k, n))
        got = list(
            zip(out["doc_id"], out["span_start"], out["span_end"], out["n_dup_grams"])
        )
        assert got == expected
        assert len(got) > 0  # non-vacuous on the synthetic corpus

    def test_dedup_substrings_planted_merge_rule(self, ray_session, tmp_path):
        """Two docs share one 8-gram; one doc repeats it twice adjacently —
        the adjacent occurrences merge into ONE span, the cross-doc
        occurrence stands alone."""
        import pyarrow.parquet as pqw

        from searchengine_ray.pipelines.dedup import dedup_substrings

        shared = "q w e r t y u i"  # 8 tokens
        sf = tmp_path / "sf"
        sf.mkdir()
        pqw.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], type=pa.int64()),
                    "text": pa.array(
                        [f"zero one {shared} {shared} tail", f"alpha {shared} omega"]
                    ),
                    "lang": pa.array(["en", "en"]),
                    "source": pa.array(["t", "t"]),
                    "n_chars": pa.array([1, 1], type=pa.int64()),
                }
            ),
            sf / "documents.parquet",
        )
        out = dedup_substrings(str(sf), k=8)
        rows = list(
            zip(out["doc_id"], out["span_start"], out["span_end"], out["n_dup_grams"])
        )
        # doc 0: dup grams at pos 2 and 10 (10 == 2+8 → merge) ⇒ [2, 18)
        # doc 1: dup gram at pos 1 ⇒ [1, 9)
        assert rows == [(0, 2, 18, 2), (1, 1, 9, 1)]

    def test_simhash_pairs_verified(self, ray_session, docs):
        from searchengine_ray.pipelines.dedup import SimHash, simhash_dups

        out = simhash_dups(SF, max_hamming=3).to_pandas()
        s = SimHash()
        for a, b, h in out.itertuples(index=False):
            ha, hb = s.sim64(docs[a] or ""), s.sim64(docs[b] or "")
            assert bin(ha ^ hb).count("1") == h <= 3

    def test_ngram_jaccard_sound(self, ray_session, docs):
        from searchengine_ray.pipelines.dedup import char_shingles, ngram_jaccard_dups

        out = ngram_jaccard_dups(SF, threshold=0.8).to_pandas()
        for a, b, j in out.itertuples(index=False):
            sa, sb = char_shingles(docs[a] or ""), char_shingles(docs[b] or "")
            exact = len(sa & sb) / len(sa | sb)
            assert exact >= 0.8
            assert abs(exact - j) < 1e-3


class TestSimilarity:
    def test_knn_matches_bruteforce(self, ray_session, emb):
        from searchengine_ray.pipelines.similarity import knn_cosine

        ids, mat = emb
        q = mat[ids == 0][0]
        sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        sims_r = np.floor(np.abs(sims) * 1e4 + 0.5) / 1e4 * np.sign(sims)
        order = np.lexsort((ids, -sims_r))[:10]
        out = knn_cosine(SF, 0, 10)
        assert out["vec_id"].tolist() == ids[order].tolist()
        assert np.allclose(out["sim_r"].to_numpy(), sims_r[order])

    def test_lsh_knn_subset_and_sound(self, ray_session, emb):
        from searchengine_ray.pipelines.similarity import lsh_knn

        ids, mat = emb
        out = lsh_knn(SF, 0, 10).to_pandas()
        assert len(out) > 0
        assert int(out["probed"].iloc[0]) < len(ids)  # probed strictly fewer
        assert out["vec_id"].iloc[0] == 0  # query is its own nearest neighbor

    def test_embedding_neardup_planted_bruteforce(self, ray_session, emb):
        """LSH-bucketed near-dup vs brute force on the PLANTED corpus
        (deterministic perturbed copies at cosine ≈ 0.9988, where multi-table
        banding recall ≈ 1 — VERDICT r1 item 2: non-vacuous check)."""
        import pyarrow as pa

        from searchengine_ray.pipelines.similarity import (
            _plant_neardups,
            embedding_neardup,
        )

        ids, mat = emb
        planted = _plant_neardups(
            pa.table(
                {
                    "vec_id": pa.array(ids, type=pa.int64()),
                    "embedding": pa.array(
                        [r.tolist() for r in mat], type=pa.list_(pa.float64())
                    ),
                }
            )
        )
        pids = planted["vec_id"].to_numpy(zero_copy_only=False)
        pm = np.asarray(planted["embedding"].to_pylist(), dtype=np.float64)
        norm = pm / np.linalg.norm(pm, axis=1, keepdims=True)
        sims = norm @ norm.T
        thr = 0.95
        brute = {
            (int(pids[i]), int(pids[j]))
            for i in range(len(pids))
            for j in range(len(pids))
            if pids[i] < pids[j] and sims[i, j] >= thr
        }
        assert brute, "planting must produce near-dup pairs"
        out = embedding_neardup(SF, thr, plant=True)
        got = set(zip(out["doc_a"].tolist(), out["doc_b"].tolist()))
        assert got == brute
        # soundness: reported sims are the exact cosines
        id_pos = {int(v): i for i, v in enumerate(pids)}
        for a, b, s in out.itertuples(index=False):
            assert abs(sims[id_pos[a], id_pos[b]] - s) < 1e-3
        # unplanted corpus has no natural 0.95-dups → empty with stable schema
        empty = embedding_neardup(SF, 0.95)
        assert len(empty) == 0 and list(empty.columns) == ["doc_a", "doc_b", "sim_r"]


class TestSemanticSearch:
    def test_topk_hydration_matches_bruteforce(self, ray_session, docs, emb):
        import numpy as np

        from searchengine_ray.pipelines.fulltext import round_half_away
        from searchengine_ray.pipelines.similarity import semantic_search

        out = semantic_search(SF, query_vec_id=0, k=10)
        ids, mat = emb
        q = mat[list(ids).index(0)]
        sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        order = sorted(
            range(len(ids)),
            key=lambda i: (-round_half_away(sims[i]), ids[i]),
        )[:10]
        assert out["doc_id"].tolist() == [int(ids[i]) for i in order]
        for _, row in out.iterrows():
            assert row["n_chars"] == len(docs[row["doc_id"]] or "")


class TestTextStats:
    def test_token_count_spot(self, ray_session, docs):
        from searchengine_ray.pipelines.textstats import token_count
        from searchengine_ray.textproc import EN_STOPWORDS, tokenize_simple

        out = token_count(SF).to_pandas().set_index("doc_id")
        for did in list(docs)[:20]:
            toks = tokenize_simple(docs[did] or "")
            assert out.loc[did, "n_tokens"] == len(toks)
            assert out.loc[did, "n_unique"] == len(set(toks))
            assert out.loc[did, "n_sig"] == sum(
                1 for t in toks if len(t) >= 2 and t not in EN_STOPWORDS
            )

    def test_repetition_score_brute(self, ray_session, docs):
        from collections import Counter

        from searchengine_ray.pipelines.fulltext import round_half_away
        from searchengine_ray.pipelines.textstats import repetition_score
        from searchengine_ray.textproc import tokenize_simple

        out = repetition_score(SF).to_pandas().set_index("doc_id")
        n_with_tokens = 0
        for did in docs:
            toks = tokenize_simple(docs[did] or "")
            if not toks:
                assert did not in out.index
                continue
            n_with_tokens += 1
            row = out.loc[did]
            assert row["n_words"] == len(toks)
            assert row["dup_word_frac_r"] == round_half_away(
                1.0 - len(set(toks)) / len(toks)
            )
            bigrams = Counter(zip(toks, toks[1:]))
            want_top = (
                max(bigrams.values()) / sum(bigrams.values()) if bigrams else 0.0
            )
            assert row["top_bigram_frac_r"] == round_half_away(want_top)
        assert len(out) == n_with_tokens

    def test_lm_score_brute(self, ray_session, docs):
        import math
        from collections import Counter

        from searchengine_ray.pipelines.fulltext import round_half_away
        from searchengine_ray.pipelines.textstats import lm_score
        from searchengine_ray.textproc import tokenize_simple

        out = lm_score(SF).to_pandas().set_index("doc_id")
        corpus = Counter()
        per_doc = {}
        for did in docs:
            toks = tokenize_simple(docs[did] or "")
            bgs = list(zip(toks, toks[1:]))
            if bgs:
                per_doc[did] = bgs
                corpus.update(bgs)
        T, B = sum(corpus.values()), len(corpus)
        assert len(out) == len(per_doc)
        for did, bgs in per_doc.items():
            row = out.loc[did]
            assert row["n_bigrams"] == len(bgs)
            want = sum(math.log(corpus[bg] + 1) for bg in bgs) / len(bgs) - math.log(T + B)
            assert abs(row["avg_logp_r"] - round_half_away(want)) <= 1e-4

    def test_langid_heuristic(self, ray_session, docs):
        """The testdata `lang` column is random metadata over uniform
        English-ish text, so we verify the heuristic itself: deterministic,
        valid label set, and per-doc agreement with a direct recompute."""
        from searchengine_ray.pipelines.textstats import LANG_VOTES, ZH_ASCII_RATIO, langid
        from searchengine_ray.textproc import tokenize_simple
        import re

        out = langid(SF).to_pandas()
        assert set(out["pred_lang"]) <= set(LANG_VOTES) | {"zh", "unknown"}
        pred = dict(zip(out["doc_id"], out["pred_lang"]))
        for did in list(docs)[:50]:
            text = docs[did] or ""
            if not text:
                expect = "unknown"
            elif len(re.findall("[a-zA-Z]", text)) / len(text) < ZH_ASCII_RATIO:
                expect = "zh"
            else:
                toks = tokenize_simple(text)
                votes = {l: sum(t in set(v) for t in toks) for l, v in LANG_VOTES.items()}
                best = max(votes.values())
                expect = (
                    "unknown" if best == 0 else next(l for l in sorted(votes) if votes[l] == best)
                )
            assert pred[did] == expect, did

    def test_fingerprint_detects_exact_dups(self, ray_session, docs):
        from searchengine_ray.pipelines.textstats import fingerprint

        out = fingerprint(SF).to_pandas()
        fp = dict(zip(out["doc_id"], out["fp"]))
        for a, b in itertools.combinations(list(docs)[:50], 2):
            if docs[a] == docs[b]:
                assert fp[a] == fp[b]

    def test_rolling_fingerprint_shape(self, ray_session, docs):
        from searchengine_ray.pipelines.textstats import fingerprint_rolling

        out = fingerprint_rolling(SF).to_pandas()
        assert len(out) == len(docs)
        row = out.iloc[0]
        assert row["n_grams"] > 0 and len(row["sig"]) > 0
        # identical texts → identical signatures
        fp = {r.doc_id: tuple(r.sig) for r in out.itertuples(index=False)}
        for a, b in itertools.combinations(list(docs)[:50], 2):
            if docs[a] == docs[b]:
                assert fp[a] == fp[b]


class TestMultimodal:
    def test_features(self, ray_session, docs):
        from searchengine_ray.pipelines.multimodal import multimodal_features

        out = multimodal_features(SF).to_pandas().set_index("media_id")
        for did in list(docs)[:20]:
            raw = (docs[did] or "").encode("utf-8")
            assert out.loc[did, "n_bytes"] == len(raw)
            if raw:
                arr = np.frombuffer(raw, dtype=np.uint8)
                assert abs(out.loc[did, "mean_byte_r"] - arr.mean()) < 1e-3
                assert abs(sum(out.loc[did, "hist"]) - 1.0) < 1e-9

    def test_decode_stub_raises(self):
        from searchengine_ray.pipelines.multimodal import decode_image

        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG")


class TestMultimodalFrameSample:
    def test_frame_sample_shape(self, ray_session, docs):
        from searchengine_ray.pipelines.multimodal import FrameSample, frame_sample

        out = frame_sample(SF, stride=4).to_pandas()
        assert set(out.columns) == {"media_id", "frame_idx", "frame"}
        assert (out["frame_idx"] % 4 == 0).all()
        # spot-check one doc against a local run of the stage
        mid = int(out["media_id"].iloc[0])
        payload = (docs[mid] or "").encode("utf-8")
        fs = FrameSample(stride=4)
        import pyarrow as pa

        local = fs(
            pa.table(
                {
                    "media_id": pa.array([mid], type=pa.int64()),
                    "payload": pa.array([payload], type=pa.binary()),
                }
            )
        )
        sub = out[out["media_id"] == mid].reset_index(drop=True)
        assert local["frame_idx"].to_pylist() == sub["frame_idx"].tolist()
        assert local["frame"].to_pylist() == sub["frame"].tolist()


class TestQueryActorBatch:
    def test_actor_pool_matches_inprocess_engine(self, ray_session):
        from searchengine_ray.pipelines.transcripts import (
            transcript_search_actor,
        )

        out = transcript_search_actor("/root/testdata/sf0.001")
        assert not out.empty
        # frame-identical to the in-process rounded-score path (shared SQL
        # oracle): same rows, same order, same dtypes
        from searchengine_ray.pipelines.transcripts import transcript_search

        want = transcript_search("/root/testdata/sf0.001")
        assert list(out.columns) == list(want.columns)
        got_sorted = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
        want_sorted = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert got_sorted.shape == want_sorted.shape
        assert (got_sorted.values == want_sorted.values).all()


class TestRelational:
    def test_windowed_events_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import WINDOW_US, windowed_events

        out = windowed_events(SF)
        t = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
        import pandas as pd

        df = t.to_pandas()
        df["window_us"] = (df["ts"].astype("int64") // WINDOW_US) * WINDOW_US
        brute = df.groupby(["window_us", "event_type"], as_index=False).agg(
            n_events=("value", "size"), sv=("value", "sum")
        )
        merged = out.merge(brute, on=["window_us", "event_type"], how="outer")
        assert len(merged) == len(out) == len(brute)
        assert (merged["n_events_x"] == merged["n_events_y"]).all()
        assert (abs(merged["sum_value_r"] - merged["sv"]) < 1e-3).all()

    def test_broadcast_join_matches_pandas(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import broadcast_join_orders

        out = broadcast_join_orders(SF)
        o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        c = pq.read_table(f"{SF}/customer.parquet").to_pandas()
        n = pq.read_table(f"{SF}/nation.parquet").to_pandas()
        j = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
            n, left_on="c_nationkey", right_on="n_nationkey"
        )
        brute = j.groupby("n_name", as_index=False).agg(
            n_orders=("o_orderkey", "size"), rev=("o_totalprice", "sum")
        )
        merged = out.merge(brute, on="n_name", how="outer")
        assert len(merged) == len(out) == len(brute)
        assert (merged["n_orders_x"] == merged["n_orders_y"]).all()
        assert (abs(merged["revenue_r"] - merged["rev"].round(2)) < 1e-6).all()


class TestIVF:
    def test_ivf_knn_subset_and_sound(self, ray_session, emb):
        import numpy as np

        from searchengine_ray.pipelines.similarity import ivf_knn

        ids, mat = emb
        out = ivf_knn(SF, query_vec_id=0, k=10, nlist=8, nprobe=8).to_pandas()
        # nprobe == nlist probes everything → must equal brute force top-k
        q = mat[ids == 0][0]
        qn = q / np.linalg.norm(q)
        norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = np.round(norm @ qn, 4)
        order = np.lexsort((ids, -sims))[:10]
        assert out["vec_id"].tolist() == ids[order].tolist()

    def test_ivf_assignments_cover_all(self, ray_session, emb):
        from searchengine_ray.pipelines.similarity import ivf_assignments

        ids, _ = emb
        out = ivf_assignments(SF, nlist=8).to_pandas()
        assert sorted(out["vec_id"].tolist()) == sorted(ids.tolist())
        assert out["list_id"].between(0, 7).all()

    def test_sessionize_events_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import SESSION_GAP_US, sessionize_events

        out = sessionize_events(SF).to_pandas()
        t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts"]).to_pandas()
        t["ts_us"] = t["ts"].astype("int64")
        total_sessions = 0
        for uid, grp in t.groupby("user_id"):
            ts = grp["ts_us"].sort_values().to_numpy()
            n_sess = 1 + int(((ts[1:] - ts[:-1]) > SESSION_GAP_US).sum()) if ts.size else 0
            sub = out[out["user_id"] == uid]
            assert len(sub) == n_sess, uid
            assert sub["n_events"].sum() == ts.size
            total_sessions += n_sess
        assert len(out) == total_sessions

    def test_asof_join_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import asof_join_events

        out = asof_join_events(SF).to_pandas()
        t = pq.read_table(
            f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "event_type", "value"]
        ).to_pandas()
        t["ts_us"] = t["ts"].astype("int64")
        got = dict(zip(out["event_id"], out["view_ts_us"]))
        n_matched = 0
        for _, row in t[t["event_type"] == "click"].iterrows():
            views = t[
                (t["user_id"] == row["user_id"])
                & (t["event_type"] == "view")
                & (t["ts_us"] <= row["ts_us"])
            ]
            if views.empty:
                assert row["event_id"] not in got
            else:
                n_matched += 1
                assert got[row["event_id"]] == views["ts_us"].max()
        assert n_matched == len(out)

    def test_range_join_bruteforce_and_boundaries(self, ray_session, tmp_path):
        """Planted events: inclusive [click-1h, click] window, same-user
        only, multi-pair expansion, exact boundary hits on both ends."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import WINDOW_US, range_join_events

        H = WINDOW_US
        base = 1_700_000_000_000_000
        rows = [
            # user 1: click at base+H; views at exactly base (lower boundary,
            # IN), base+1 (in), base+H (equal ts, IN), base-1 (OUT)
            (1, 1, base - 1, "view"), (2, 1, base, "view"),
            (3, 1, base + 1, "view"), (4, 1, base + H, "view"),
            (5, 1, base + H, "click"),
            # user 2: same timestamps — must NOT cross users
            (6, 2, base, "view"), (7, 2, base + 2 * H, "click"),
            # user 1: second click later — only the in-window view
            (8, 1, base + 2 * H + 5, "click"), (9, 1, base + H + 10, "view"),
        ]
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
                "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
                "event_type": pa.array([r[3] for r in rows], type=pa.string()),
                "value": pa.array([0.0] * len(rows)),
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(t, str(sf / "events.parquet"))
        out = range_join_events(str(sf)).to_pandas()
        pairs = set(zip(out["click_id"], out["view_id"]))
        assert pairs == {(5, 2), (5, 3), (5, 4), (8, 9)}
        lag = dict(zip(zip(out["click_id"], out["view_id"]), out["lag_us"]))
        assert lag[(5, 2)] == H and lag[(5, 4)] == 0 and lag[(8, 9)] == H - 5

        # and brute force over the real sf0.001 events
        out2 = range_join_events(SF).to_pandas()
        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
        ).to_pandas()
        ev["ts_us"] = ev["ts"].astype("int64")
        want = set()
        clicks = ev[ev["event_type"] == "click"]
        views = ev[ev["event_type"] == "view"]
        for _, c in clicks.iterrows():
            m = views[
                (views["user_id"] == c["user_id"])
                & (views["ts_us"] <= c["ts_us"])
                & (views["ts_us"] >= c["ts_us"] - H)
            ]
            want |= {(c["event_id"], v) for v in m["event_id"]}
        assert set(zip(out2["click_id"], out2["view_id"])) == want

    def test_distributed_training_matches_quality(self, ray_session, emb):
        """Distributed Lloyd's must produce a comparable-quality quantizer:
        every vector's assigned centroid similarity within a small margin of
        the driver-side k-means result (inits differ, so exact equality is
        not expected)."""
        import numpy as np

        from searchengine_ray.pipelines.similarity import (
            _kmeans_cosine,
            ivf_train_distributed,
        )

        ids, mat = emb
        norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cd = ivf_train_distributed(SF, nlist=8, iters=6)
        cl = _kmeans_cosine(norm, 8, iters=6)
        qd = (norm @ cd.T).max(axis=1).mean()
        ql = (norm @ cl.T).max(axis=1).mean()
        assert qd > ql - 0.05
        # deterministic across runs
        cd2 = ivf_train_distributed(SF, nlist=8, iters=6)
        assert np.array_equal(cd, cd2)

    def test_lsh_assignments_consistent_with_query_path(self, ray_session, emb):
        import numpy as np

        from searchengine_ray.pipelines.similarity import (
            _bucket_of,
            _hyperplanes,
            lsh_assignments,
        )

        ids, mat = emb
        out = lsh_assignments(SF).to_pandas().sort_values("vec_id")
        planes = _hyperplanes(mat.shape[1])
        order = np.argsort(ids)
        want = _bucket_of(mat[order], planes)
        assert out["bucket"].to_numpy().tolist() == want.tolist()

    def test_ann_resolution_scales_with_corpus(self):
        """VERDICT r2 item 4: probe volume must stay bounded as N grows —
        the resolution rule keeps the AVERAGE partition near the target row
        count (until the caps), and equals the round-2 constants at sandbox
        scale so baked-in oracles stay valid."""
        from searchengine_ray.pipelines.similarity import (
            _MAX_LSH_BITS,
            _MAX_NLIST,
            _TARGET_PARTITION_ROWS,
            _lsh_bits_for,
            _nlist_for,
        )

        # sandbox floor (sf tables have ≤ 2000 vectors)
        assert _lsh_bits_for(500) == 8 and _nlist_for(500) == 16
        assert _lsh_bits_for(2000) == 8 and _nlist_for(2000) == 16

        prev_b, prev_n = 0, 0
        for n in [10**6, 10**7, 10**8, 10**9, 10**11]:
            bits, nlist = _lsh_bits_for(n), _nlist_for(n)
            assert bits >= prev_b and nlist >= prev_n  # monotone
            prev_b, prev_n = bits, nlist
            assert (
                n / (1 << bits) <= _TARGET_PARTITION_ROWS or bits == _MAX_LSH_BITS
            ), n
            assert (
                n / nlist <= 2 * _TARGET_PARTITION_ROWS or nlist == _MAX_NLIST
            ), n


class TestRowsOnlyCompleteness:
    def test_winnowing_matches_naive_reference(self, ray_session, docs):
        """The vectorized winnowing fingerprints equal a naive textbook
        implementation (Schleimer et al. 2003, rightmost-min-per-window as
        sliding_window_view.min implements) on every doc."""
        from searchengine_ray.pipelines.textstats import (
            _FP_BASE,
            _FP_K,
            _FP_WINDOW,
            fingerprint_rolling,
            normalize_for_fp,
        )

        out = fingerprint_rolling(SF).to_pandas().set_index("doc_id")

        def naive(text):
            s = normalize_for_fp(text)
            b = s.encode("utf-8")
            if len(b) < _FP_K:
                return 0, []
            hashes = []
            for i in range(len(b) - _FP_K + 1):
                h = 0
                for c in b[i : i + _FP_K]:
                    h = (h * int(_FP_BASE) + c) % (1 << 64)
                hashes.append(h)
            if len(hashes) <= _FP_WINDOW:
                sel = {min(hashes)}
            else:
                sel = set()
                for i in range(len(hashes) - _FP_WINDOW + 1):
                    sel.add(min(hashes[i : i + _FP_WINDOW]))
            # engine sorts as uint64 THEN casts to int64 — mirror that order
            return len(hashes), [
                int(np.uint64(x).astype(np.int64)) for x in sorted(sel)
            ]

        checked = 0
        for did, text in list(docs.items())[:60]:
            n_grams, sig = naive(text or "")
            row = out.loc[did]
            assert row["n_grams"] == n_grams, did
            assert list(row["sig"]) == [int(x) for x in sig], did
            checked += 1
        assert checked == 60

    def test_simhash_pairs_complete_vs_bruteforce(self, ray_session, docs):
        """Pigeonhole banding at Hamming ≤ 3 over 4×16-bit blocks is
        mathematically complete — assert the distributed pipeline finds
        EXACTLY the brute-force pair set."""
        import itertools

        from searchengine_ray.pipelines.dedup import SimHash, simhash_dups

        s = SimHash()
        sims = {d: s.sim64(t or "") for d, t in docs.items()}
        brute = set()
        for a, b in itertools.combinations(sorted(docs), 2):
            if sims[a] == 0 or sims[b] == 0:
                continue  # empty docs don't band
            if bin(sims[a] ^ sims[b]).count("1") <= 3:
                brute.add((a, b))
        out = simhash_dups(SF, max_hamming=3).to_pandas()
        got = set(zip(out["doc_a"].tolist(), out["doc_b"].tolist()))
        assert got == brute


class TestDuplicationRatio:
    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.dedup import (
            duplication_ratio,
            word_shingles,
        )

        docs = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        sets = {r.doc_id: word_shingles(r.text or "") for r in docs.itertuples()}
        df: dict[int, int] = {}
        for s in sets.values():
            for g in s:
                df[g] = df.get(g, 0) + 1
        got = (
            duplication_ratio(SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == sorted(sets)
        for r in got.itertuples():
            s = sets[r.doc_id]
            n_dup = sum(1 for g in s if df[g] >= 2)
            assert r.n_shingles == len(s)
            assert r.n_dup == n_dup, r.doc_id
            want = np.floor((n_dup / len(s) if s else 0.0) * 1e4 + 0.5) / 1e4
            assert r.dup_ratio_r == want
        # non-vacuous: the corpus has cross-doc duplication AND unique grams
        assert got["n_dup"].sum() > 0
        assert (got["n_dup"] < got["n_shingles"]).any()

    def test_empty_and_identical_docs(self, ray_session):
        import tempfile

        import pandas as pd

        from searchengine_ray.pipelines.dedup import duplication_ratio

        tmp = tempfile.mkdtemp()
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "alpha beta gamma delta",  # shares all grams with doc 2
                    "alpha beta gamma delta",
                    "",  # no tokens -> no shingles, ratio 0
                    "unique words entirely here",  # grams seen nowhere else
                ],
            }
        ).to_parquet(f"{tmp}/documents.parquet", index=False)
        out = (
            duplication_ratio(tmp)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [1, 2, 3, 4]
        assert out["dup_ratio_r"].tolist() == [1.0, 1.0, 0.0, 0.0]
        assert out["n_shingles"].tolist() == [2, 2, 0, 2]


class TestDedupCluster:
    def test_matches_union_find(self, ray_session):
        from searchengine_ray.pipelines.dedup import dedup_cluster, minhash_dups

        out = dedup_cluster(SF).to_pandas()
        pairs = minhash_dups(SF).to_pandas()
        parent: dict[int, int] = {}

        def find(x):
            while parent.get(x, x) != x:
                x = parent.get(x, x)
            return x

        for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = sorted(set(pairs["doc_a"]) | set(pairs["doc_b"]))
        want = {n: find(n) for n in nodes}
        got = dict(zip(out["doc_id"], out["rep_doc_id"]))
        assert got == want
        # every component rep is its own rep (labels are fixpoint-consistent)
        assert all(got[r] == r for r in set(got.values()))

    def test_label_propagation_converges_on_path_graph(self, ray_session):
        """A 9-node path needs multiple propagation rounds (~log2 diameter
        with label-link shortcuts) — exercises the iterate-until-no-change
        loop, not just the near-clique fast case."""
        import pyarrow as pa
        import ray.data as rd

        from searchengine_ray.pipelines.dedup import connected_components

        n = 9
        edges = rd.from_arrow(
            pa.table(
                {
                    "a": pa.array(list(range(100, 100 + n - 1)), type=pa.int64()),
                    "b": pa.array(list(range(101, 100 + n)), type=pa.int64()),
                }
            )
        )
        labels = connected_components(edges).to_pandas()
        assert len(labels) == n
        assert (labels["lbl"] == 100).all()


class TestTfidfTopTerms:
    def test_matches_bruteforce(self, ray_session, docs):
        import math

        from searchengine_ray.pipelines.fulltext import tfidf_top_terms
        from searchengine_ray.textproc import EN_STOPWORDS, tokenize_simple

        out = tfidf_top_terms(SF, k=5).to_pandas()
        # brute force: tf per (doc, term) over significant tokens, df per term
        tfs: dict[tuple[int, str], int] = {}
        dfs: dict[str, int] = {}
        for did, text in docs.items():
            seen = set()
            for t in tokenize_simple(text or ""):
                if len(t) < 2 or t in EN_STOPWORDS:
                    continue
                tfs[(did, t)] = tfs.get((did, t), 0) + 1
                seen.add(t)
            for t in seen:
                dfs[t] = dfs.get(t, 0) + 1
        n = len(docs)
        rows = []
        for (did, t), tf in tfs.items():
            s = tf * math.log(n / dfs[t])
            s_r = math.floor(abs(s) * 1e4 + 0.5) / 1e4 * (1 if s >= 0 else -1)
            rows.append((did, t, s_r))
        want = {}
        for did in docs:
            cand = sorted(
                [(t, s) for d, t, s in rows if d == did],
                key=lambda x: (-x[1], x[0]),
            )[:5]
            want[did] = cand
        for did, sub in out.groupby("doc_id"):
            sub = sub.sort_values("rank")
            got = list(zip(sub["term"], sub["tfidf_r"]))
            assert got == want[did], did


class TestExactQuantiles:
    def test_matches_numpy_order_statistics(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import exact_quantiles

        out = exact_quantiles(SF).to_pandas().set_index("q")["value"]
        v = np.sort(
            pq.read_table(f"{SF}/events.parquet", columns=["value"])["value"]
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        n = len(v)
        for q in (0.5, 0.9, 0.99):
            k = max(int(np.ceil(n * q)), 1)
            assert out[q] == v[k - 1], q

    def test_duplicate_heavy_column_recurses_exactly(self, ray_session, tmp_path):
        """A column that crams most mass into one histogram bucket forces the
        refinement recursion; selection must stay exact through it."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import exact_quantiles

        rng = np.random.default_rng(7)
        # 50k copies of ~5 values inside [0, 1e-5], plus outliers up to 1e6
        vals = np.concatenate(
            [
                rng.choice(np.linspace(0, 1e-5, 5), size=50_000),
                rng.uniform(1, 1e6, size=50),
            ]
        )
        pq.write_table(
            pa.table({"value": pa.array(vals)}), str(tmp_path / "events.parquet")
        )
        out = (
            exact_quantiles(str(tmp_path), n_buckets=16, max_pull=1000)
            .to_pandas()
            .set_index("q")["value"]
        )
        s = np.sort(vals)
        n = len(s)
        for q in (0.5, 0.9, 0.99):
            k = max(int(np.ceil(n * q)), 1)
            assert out[q] == s[k - 1], q


class TestBigramCounts:
    def test_matches_bruteforce(self, ray_session, docs):
        from collections import Counter

        from searchengine_ray.pipelines.textstats import bigram_counts
        from searchengine_ray.textproc import tokenize_simple

        out = bigram_counts(SF, k=100).to_pandas()
        c: Counter = Counter()
        for text in docs.values():
            toks = tokenize_simple(text or "")
            c.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
        got = list(zip(out["bigram"], out["n"]))
        assert got == want
        assert out["rank"].tolist() == list(range(len(out)))


class TestDedupTurnsEntry:
    def test_planted_losers_lose_and_winners_win(self, ray_session):
        from searchengine_ray.pipelines.transcripts import (
            DUP_LOSER_EVERY,
            DUP_WINNER_EVERY,
            dedup_turns_check,
        )

        out = dedup_turns_check(SF)
        # exactly one winner per (conv_id, turn_idx)
        assert not out.duplicated(["conv_id", "turn_idx"]).any()
        # later-ts ' DUPLICATE' copies never win
        assert not out["text"].str.endswith(" DUPLICATE").any()
        # earlier-ts 'EARLY ' variants always win at their keys
        doc_id = (
            out["conv_id"].str.slice(5).astype("int64") * 8
            + out["turn_idx"].astype("int64")
        )
        winners = out[doc_id % DUP_WINNER_EVERY == 0]
        assert len(winners) > 0
        assert winners["text"].str.startswith("EARLY ").all()
        # every other key keeps its original row
        rest = out[(doc_id % DUP_WINNER_EVERY != 0)]
        assert not rest["text"].str.startswith("EARLY ").any()


class TestSlidingWindow:
    def test_every_event_lands_in_four_windows(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import (
            SLIDE_US,
            WINDOW_US,
            sliding_window_events,
        )

        out = sliding_window_events(SF)
        t = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_type", "value"]).to_pandas()
        n = len(t)
        k = WINDOW_US // SLIDE_US
        assert out["n_events"].sum() == n * k
        # brute force one (window, type) cell
        row = out.sort_values(["window_us", "event_type"]).iloc[len(out) // 2]
        w0, et = int(row["window_us"]), row["event_type"]
        ts = t["ts"].astype("int64")
        mask = (ts >= w0) & (ts < w0 + WINDOW_US) & (t["event_type"] == et)
        assert int(mask.sum()) == int(row["n_events"])
        assert abs(t.loc[mask, "value"].sum() - row["sum_value_r"]) < 1e-3


class TestHotBuckets:
    """VERDICT r2 items 3+7 / r3 item 7: over-full LSH/SimHash buckets must
    enumerate their pairs EXACTLY — chunked (bounded memory) below the
    per-task pair budget, DEFERRED to distributed grid cells above it
    (bounded per-task work by construction, zero truncation)."""

    def test_candidate_pairs_hot_bucket_all_pairs_surface(self, ray_session):
        import ray.data as rd

        from searchengine_ray.pipelines.dedup import _candidate_pairs_ds

        n = 200  # one bucket of 200 docs, far over the 16-doc chunk edge
        bands = rd.from_arrow(
            pa.table(
                {
                    "band": pa.array(np.zeros(n, dtype=np.int32)),
                    "band_hash": pa.array(np.full(n, 7, dtype=np.int64)),
                    "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                }
            )
        )
        out = _candidate_pairs_ds(bands, max_bucket=16).to_pandas()
        got = set(zip(out["a"].tolist(), out["b"].tolist()))
        want = {(a, b) for a in range(n) for b in range(a + 1, n)}
        assert got == want  # every one of C(200,2)=19900 pairs, no loss

    def test_candidate_pairs_budget_defers_exactly(self, ray_session):
        """A bucket above the per-task budget is NOT truncated: it splits
        into grid cells (each ≤ max_bucket² pairs of work) and still
        surfaces every pair exactly once (r3 item 7 closes the old
        keep-first-K recall loss)."""
        import ray.data as rd

        from searchengine_ray.pipelines.dedup import _candidate_pairs_ds

        n = 200
        bands = rd.from_arrow(
            pa.table(
                {
                    "band": pa.array(np.zeros(n, dtype=np.int32)),
                    "band_hash": pa.array(np.full(n, 7, dtype=np.int64)),
                    "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                }
            )
        )
        # budget 10 ≪ C(200,2)=19900 → deferred cell path, zero loss
        out = _candidate_pairs_ds(bands, max_bucket=16, max_bucket_pairs=10).to_pandas()
        got = set(zip(out["a"].tolist(), out["b"].tolist()))
        assert got == {(a, b) for a in range(n) for b in range(a + 1, n)}
        assert len(out) == len(got)  # no duplicate rows within one bucket

    def test_simhash_hot_bucket_complete(self, ray_session):
        """60 identical texts → identical simhash → one 60-doc bucket in
        each of the 4 blocks; with an 8-doc chunk edge the chunked verify
        must still find all C(60,2) pairs at hamming 0, deduped across
        blocks."""
        import ray.data as rd

        from searchengine_ray.pipelines.dedup import simhash_dups

        n = 60
        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "text": pa.array(["the same identical document text"] * n),
                }
            )
        )
        out = simhash_dups(SF, max_bucket=8, ds=docs).to_pandas()
        assert len(out) == n * (n - 1) // 2
        assert (out["hamming"] == 0).all()
        got = set(zip(out["doc_a"].tolist(), out["doc_b"].tolist()))
        assert got == {(a, b) for a in range(n) for b in range(a + 1, n)}

    def test_simhash_hot_bucket_deferred_exact(self, ray_session):
        """Same adversarial corpus with the per-task pair budget forced
        below the bucket size: the grid-cell deferral must still produce
        every pair exactly once (r3 item 7 — no truncation)."""
        import ray.data as rd

        from searchengine_ray.pipelines.dedup import simhash_dups

        n = 60
        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "text": pa.array(["the same identical document text"] * n),
                }
            )
        )
        out = simhash_dups(SF, max_bucket=8, max_bucket_pairs=50, ds=docs).to_pandas()
        assert len(out) == n * (n - 1) // 2  # exact, no duplicates
        assert (out["hamming"] == 0).all()
        got = set(zip(out["doc_a"].tolist(), out["doc_b"].tolist()))
        assert got == {(a, b) for a in range(n) for b in range(a + 1, n)}


class TestNewTrainingOps:
    def test_knn_batch_matches_per_query_bruteforce(self, ray_session, emb):
        from searchengine_ray.pipelines.similarity import knn_batch

        ids, mat = emb
        out = knn_batch(SF, query_vec_ids=(0, 1, 2), k=4)
        for qid in (0, 1, 2):
            q = mat[ids == qid][0]
            sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
            sims_r = np.floor(np.abs(sims) * 1e4 + 0.5) / 1e4 * np.sign(sims)
            order = np.lexsort((ids, -sims_r))[:4]
            sub = out[out["query_vec_id"] == qid]
            assert sub["vec_id"].tolist() == ids[order].tolist(), qid
            assert sub["rank"].tolist() == [0, 1, 2, 3]

    def test_embedding_cluster_groups_planted_pairs(self, ray_session):
        from searchengine_ray.pipelines.similarity import (
            PLANT_EVERY,
            PLANT_OFFSET,
            embedding_cluster,
            embedding_neardup,
        )

        pairs = embedding_neardup(SF, 0.95, plant=True)
        out = embedding_cluster(SF, 0.95, plant=True).to_pandas()
        # every doc in a pair is labeled; label = min of its component
        import collections

        adj = collections.defaultdict(set)
        for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
            adj[a].add(b)
            adj[b].add(a)
        want = {}
        for start in sorted(adj):
            if start in want:
                continue
            comp, stack = set(), [start]
            while stack:
                x = stack.pop()
                if x in comp:
                    continue
                comp.add(x)
                stack.extend(adj[x])
            rep = min(comp)
            for x in comp:
                want[x] = rep
        got = dict(zip(out["doc_id"], out["rep_doc_id"]))
        assert got == want
        # planted copies cluster with their originals
        orig = next(iter(d for d in want if d < PLANT_OFFSET and d % PLANT_EVERY == 0))
        assert want[orig + PLANT_OFFSET] == want[orig]

    def test_decontaminate_planted_and_unplanted(self, ray_session, docs):
        from searchengine_ray.pipelines.traindata import (
            DECON_BENCH_EVERY,
            DECON_PLANT_SLOT,
            decontaminate,
        )

        out = decontaminate(SF, plant=True).to_pandas().set_index("doc_id")
        # benchmark members never appear as training docs
        assert not any(d % DECON_BENCH_EVERY == 0 for d in out.index)
        # every planted doc is flagged (its donor's marker gram must hit)
        planted = [d for d in out.index if d % DECON_BENCH_EVERY == DECON_PLANT_SLOT]
        assert planted and all(out.loc[d, "n_hits"] >= 1 for d in planted)
        # unplanted run: no markers — planted docs lose their guaranteed hit
        out2 = decontaminate(SF, plant=False).to_pandas().set_index("doc_id")
        assert set(out2.index) == set(out.index)
        assert (out2["n_grams"] <= out["n_grams"]).all()


class TestConversationOps:
    """Conversation-level curation ops vs a brute-force Python rebuild of
    the transcripts derivation (doc_id arithmetic mirror)."""

    @staticmethod
    def _turns(docs):
        roles = ["user", "assistant", "tool", "system"]
        out = {}
        for did in sorted(docs):
            out.setdefault(did // 8, []).append(
                (did % 8, roles[did % 4], docs[did] or "")
            )
        return out  # conv_num -> [(turn_idx, role, text)] in turn order

    def test_conversation_assemble(self, ray_session, docs):
        from searchengine_ray.pipelines.transcripts import conversation_assemble

        out = conversation_assemble(SF).to_pandas()
        turns = self._turns(docs)
        assert len(out) == len(turns)
        got = dict(zip(out["conv_id"], out["convo"]))
        nt = dict(zip(out["conv_id"], out["n_turns"]))
        for conv, ts in turns.items():
            cid = f"conv-{conv:06d}"
            assert nt[cid] == len(ts)
            assert got[cid] == "\n".join(f"{r}: {t}" for _, r, t in ts)

    def test_conversation_stats(self, ray_session, docs):
        from searchengine_ray.pipelines.transcripts import conversation_stats

        out = conversation_stats(SF).to_pandas().set_index("conv_id")
        turns = self._turns(docs)
        assert len(out) == len(turns)
        for conv, ts in turns.items():
            row = out.loc[f"conv-{conv:06d}"]
            assert row["n_turns"] == len(ts)
            assert row["n_assistant"] == sum(1 for _, r, _t in ts if r == "assistant")
            assert row["total_chars"] == sum(len(t) for _, _r, t in ts)

    def test_conv_prefix_dedup(self, ray_session, docs):
        import hashlib

        from searchengine_ray.pipelines.transcripts import conv_prefix_dedup

        k = 2
        out = conv_prefix_dedup(SF, k=k).to_pandas()
        groups = {}
        for conv, ts in self._turns(docs).items():
            pfx = "\n".join(t for ti, _r, t in ts if ti < k)
            if not any(ti < k for ti, _r, _t in ts):
                continue
            h = hashlib.md5(pfx.encode("utf-8")).hexdigest()
            groups.setdefault(h, []).append(conv)
        assert len(out) == len(groups)
        by_h = out.set_index("prefix_md5")
        for h, convs in groups.items():
            assert by_h.loc[h, "n_convs"] == len(convs)
            assert by_h.loc[h, "rep_conv_id"] == f"conv-{min(convs):06d}"


class TestDedupIncremental:
    def test_planted_semantics(self, ray_session, docs):
        """old = doc_id < split, new = rest. Planted %20==7 docs share text
        across halves (all planted NEW docs must drop); planted %20==8 docs
        share text per (side, %40) (first-wins within new); everything else
        in this corpus is unique (no exact dups — verified by dedup_exact)
        so it survives verbatim."""
        import hashlib

        from searchengine_ray.pipelines.dedup import (
            _incremental_plant,
            dedup_incremental,
        )

        out = dedup_incremental(SF, plant=True).to_pandas()
        split = (max(docs) + 1) // 2
        new_ids = [d for d in docs if d >= split]

        # brute-force reference over planted texts
        planted = {d: _incremental_plant(d, docs[d], split) for d in docs}
        old_hashes = {
            hashlib.md5(planted[d].encode()).hexdigest() for d in docs if d < split
        }
        want = {}
        for d in sorted(new_ids):
            h = hashlib.md5(planted[d].encode()).hexdigest()
            if h in old_hashes or h in want:
                continue
            want[h] = d
        got = dict(zip(out["text_hash"], out["doc_id"]))
        assert got == want
        # every planted cross-dup dropped
        assert all(d % 20 != 7 for d in out["doc_id"])
        # within-new plants: exactly one survivor per (%40) residue class
        survivors8 = sorted(d for d in out["doc_id"] if d % 20 == 8)
        assert len(survivors8) == len({d % 40 for d in new_ids if d % 20 == 8})
        # no old-side ids ever appear
        assert (out["doc_id"] >= split).all()

    def test_unplanted_passthrough(self, ray_session, docs):
        """Without plants this corpus has no exact dups: every new doc
        survives with its own hash."""
        import hashlib

        from searchengine_ray.pipelines.dedup import dedup_incremental

        out = dedup_incremental(SF).to_pandas().sort_values("doc_id")
        split = (max(docs) + 1) // 2
        want_ids = sorted(d for d in docs if d >= split)
        assert out["doc_id"].tolist() == want_ids
        for d, h in zip(out["doc_id"], out["text_hash"]):
            assert h == hashlib.md5((docs[d] or "").encode()).hexdigest()


class TestQ3ShippingPriority:
    def test_matches_pandas_reference(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import (
            Q3_CUTOFF_US,
            q3_shipping_priority,
        )

        got = (
            q3_shipping_priority(SF)
            .to_pandas()
            .sort_values("l_orderkey")
            .reset_index(drop=True)
        )
        cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
        orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        items = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        ck = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
        # pandas reads parquet timestamps as ns; engine works in µs
        odate_us = orders["o_orderdate"].values.astype("datetime64[us]").astype("int64")
        o = orders.assign(odate_us=odate_us)
        o = o[(o["odate_us"] < Q3_CUTOFF_US) & o["o_custkey"].isin(ck)]
        ship_us = items["l_shipdate"].values.astype("datetime64[us]").astype("int64")
        li = items.assign(ship_us=ship_us)
        li = li[li["ship_us"] > Q3_CUTOFF_US].copy()
        li["rev"] = (li["l_extendedprice"] * 100).round() * (
            (1 - li["l_discount"]) * 100
        ).round()
        agg = li.groupby("l_orderkey", as_index=False)["rev"].sum()
        ref = agg.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        # half-away-from-zero like the engine's _round_vec (pandas .round is
        # half-to-even) and EXACT equality — np.allclose's default rtol
        # would mask the one-cent class this entry guards against
        x = ref["rev"].to_numpy() / 10000.0
        ref["revenue_r"] = np.floor(x * 100.0 + 0.5) / 100.0
        ref = ref.sort_values("l_orderkey").reset_index(drop=True)
        assert got["l_orderkey"].tolist() == ref["l_orderkey"].tolist()
        assert got["o_orderdate_us"].tolist() == ref["odate_us"].tolist()
        assert got["revenue_r"].tolist() == ref["revenue_r"].tolist()

    def test_empty_segment_yields_empty(self, ray_session):
        from searchengine_ray.pipelines.relational import q3_shipping_priority

        out = q3_shipping_priority(SF, segment="NO-SUCH-SEGMENT").to_pandas()
        assert len(out) == 0
        # Ray's to_pandas drops column names when every block is empty;
        # when columns survive they must be the contract schema
        if len(out.columns):
            assert list(out.columns) == ["l_orderkey", "o_orderdate_us", "revenue_r"]


class TestRunningUserTotals:
    def test_matches_pandas_reference(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import running_user_totals

        got = (
            running_user_totals(SF)
            .to_pandas()
            .sort_values(["user_id", "ts_us"])
            .reset_index(drop=True)
        )
        ev = pq.read_table(
            f"{SF}/events.parquet",
            columns=["user_id", "event_id", "ts", "value"],
        ).to_pandas()
        ev["ts_us"] = ev["ts"].values.astype("datetime64[us]").astype("int64")
        ev["cents"] = (ev["value"] * 100).round().astype("int64")
        ev = ev.sort_values(["user_id", "ts_us"]).reset_index(drop=True)
        g = ev.groupby("user_id", sort=False)["cents"]
        ref_cum_n = g.cumcount().to_numpy() + 1
        ref_cum = g.cumsum().to_numpy()
        ref_max = g.cummax().to_numpy()
        ref_mov4 = (
            g.rolling(4, min_periods=1).sum().reset_index(drop=True).to_numpy()
        )
        assert got["event_id"].tolist() == ev["event_id"].tolist()
        assert got["cum_n"].tolist() == ref_cum_n.tolist()
        # exact equality: int64 cents / 100.0 on both sides
        assert got["cum_value_r"].tolist() == (ref_cum / 100.0).tolist()
        assert got["run_max_r"].tolist() == (ref_max / 100.0).tolist()
        assert got["mov_sum4_r"].tolist() == (ref_mov4 / 100.0).tolist()
        # the mov4 clamp must actually be exercised (users with >4 events);
        # multi-user-per-partition resets are pinned by
        # test_segment_boundaries_reset (sf0.001 has only 15 users, so the
        # 64 fixed partitions hold at most one user each here)
        assert (ev.groupby("user_id").size() > 4).any()

    def test_segment_boundaries_reset(self, ray_session):
        """Two users in ONE partition: the second user's running stats must
        restart (cummax reset even when the first user's max is higher)."""
        import pandas as pd

        from searchengine_ray.pipelines import relational
        from searchengine_ray.pipelines.relational import running_user_totals

        d = pd.DataFrame(
            {
                # both user ids ≡ 1 (mod 64) → same fixed partition
                "user_id": [1, 1, 1, 1, 1, 65, 65],
                "event_id": [0, 1, 2, 3, 4, 5, 6],
                "ts": pd.to_datetime(
                    [f"2024-01-01 00:0{i}:00" for i in range(5)]
                    + ["2024-01-01 00:00:30", "2024-01-01 00:01:30"]
                ),
                "value": [9.99, 1.0, 1.0, 1.0, 1.0, 2.5, 0.5],
            }
        )
        import tempfile, os as _os

        tmp = tempfile.mkdtemp()
        d.to_parquet(_os.path.join(tmp, "events.parquet"), index=False)
        out = (
            running_user_totals(tmp)
            .to_pandas()
            .sort_values(["user_id", "ts_us"])
            .reset_index(drop=True)
        )
        u1 = out[out["user_id"] == 1]
        u65 = out[out["user_id"] == 65]
        # 5th event of user 1: frame is rows 2-5 (9.99 fell out of ROWS 3
        # PRECEDING), running max still 9.99
        assert u1["mov_sum4_r"].tolist() == [9.99, 10.99, 11.99, 12.99, 4.0]
        assert u1["run_max_r"].tolist() == [9.99] * 5
        assert u1["cum_value_r"].tolist() == [9.99, 10.99, 11.99, 12.99, 13.99]
        # user 65 restarts — cummax must NOT inherit user 1's 9.99
        assert u65["run_max_r"].tolist() == [2.5, 2.5]
        assert u65["cum_value_r"].tolist() == [2.5, 3.0]
        assert u65["cum_n"].tolist() == [1, 2]


class TestHllRegisters:
    @staticmethod
    def _brute_regs(values):
        from searchengine_ray.pipelines.relational import _HLL_M, _hll_hash64

        regs = np.zeros(_HLL_M, dtype=np.int64)
        for v in set(values):
            h = _hll_hash64(str(int(v)))
            idx, rem = h >> 56, h & ((1 << 56) - 1)
            rho = 57 - rem.bit_length() if rem else 57
            regs[idx] = max(regs[idx], rho)
        return regs

    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import hll_registers

        users = pq.read_table(
            f"{SF}/events.parquet", columns=["user_id"]
        )["user_id"].to_numpy(zero_copy_only=False)
        want = self._brute_regs(users.tolist())
        got = hll_registers(SF).to_pandas().sort_values("reg_idx")
        assert got["max_rho"].tolist() == want.tolist()
        assert len(got) == 256  # dense, empty registers included

    def test_estimate_within_hll_error(self, ray_session, tmp_path):
        """Large-cardinality fixture exercises the raw-estimate branch
        (n >> 2.5m); the md5-seeded estimator must land within ~3σ of
        exact (σ = 1.04/√256 ≈ 6.5%)."""
        import pandas as pd

        from searchengine_ray.pipelines.relational import hll_estimate

        n = 5000
        tmp = str(tmp_path)
        df = pd.DataFrame(
            {
                "user_id": np.arange(n, dtype=np.int64),
                "ts": pd.Timestamp("2024-01-01"),
            }
        )
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(f"{tmp}/events.parquet", index=False)
        est = hll_estimate(tmp)
        assert abs(est - n) / n < 0.2
        # small range uses linear counting: sf fixture (15 users) is tight
        est_small = hll_estimate(SF)
        assert abs(est_small - 15) / 15 < 0.2

    def test_registers_merge_by_max(self):
        """The sketch property that makes the build distributable: the
        union's registers are the elementwise max of the parts'."""
        a = self._brute_regs(range(0, 400))
        b = self._brute_regs(range(200, 700))
        u = self._brute_regs(range(0, 700))
        assert np.maximum(a, b).tolist() == u.tolist()


class TestCountMin:
    def test_matches_bruteforce_and_mass(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import (
            CM_D,
            CM_W,
            _cm_bucket,
            countmin_cells,
        )

        users = pq.read_table(
            f"{SF}/events.parquet", columns=["user_id"]
        )["user_id"].to_numpy(zero_copy_only=False)
        want = np.zeros((CM_D, CM_W), dtype=np.int64)
        for u in users.tolist():
            for j in range(CM_D):
                want[j, _cm_bucket(j, int(u))] += 1
        got = countmin_cells(SF).to_pandas().sort_values(["row_j", "bucket"])
        assert got["count"].to_numpy().reshape(CM_D, CM_W).tolist() == want.tolist()
        # every row preserves total mass (sum-merge invariant)
        assert (got.groupby("row_j")["count"].sum() == len(users)).all()

    def test_point_query_never_undercounts(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import countmin_query

        users = pq.read_table(
            f"{SF}/events.parquet", columns=["user_id"]
        )["user_id"].to_numpy(zero_copy_only=False)
        uv, cnt = np.unique(users, return_counts=True)
        truth = dict(zip(uv.tolist(), cnt.tolist()))
        est = countmin_query(SF, uv.tolist())
        assert all(est[u] >= truth[u] for u in truth)
        # d=4 rows over 64 buckets with 15 users: at least one value
        # should be exact (min across rows kills most collisions)
        assert any(est[u] == truth[u] for u in truth)


class TestBloomBits:
    @staticmethod
    def _brute_bits(values):
        from searchengine_ray.pipelines.relational import (
            BLOOM_K,
            BLOOM_M,
            _salted_bucket,
        )

        bits = np.zeros(BLOOM_M, dtype=np.int64)
        for v in set(values):
            for j in range(BLOOM_K):
                bits[_salted_bucket(j, int(v), BLOOM_M)] = 1
        return bits

    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import bloom_bits

        users = pq.read_table(
            f"{SF}/events.parquet", columns=["user_id"]
        )["user_id"].to_numpy(zero_copy_only=False)
        want = self._brute_bits(users.tolist())
        got = bloom_bits(SF).to_pandas().sort_values("bit_idx")
        assert got["bit"].tolist() == want.tolist()
        assert len(got) == 512  # dense, unset bits included

    def test_no_false_negatives(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import bloom_contains

        users = np.unique(
            pq.read_table(f"{SF}/events.parquet", columns=["user_id"])
            ["user_id"].to_numpy(zero_copy_only=False)
        )
        member = bloom_contains(SF, users.tolist())
        assert all(member[int(u)] for u in users)  # never a false negative
        # 15 users × 3 hashes over 512 bits: most absent keys must miss
        absent = bloom_contains(SF, range(10_000, 10_100))
        assert sum(absent.values()) < 20

    def test_merge_by_or(self):
        """The property that makes the build distributable: the union's
        bits are the elementwise OR of the parts'."""
        a = self._brute_bits(range(0, 40))
        b = self._brute_bits(range(20, 70))
        u = self._brute_bits(range(0, 70))
        assert np.maximum(a, b).tolist() == u.tolist()


class TestKmvDistinct:
    @staticmethod
    def _brute_bottomk(values, k=64):
        from searchengine_ray.pipelines.relational import _hll_hash64

        hs = sorted(format(_hll_hash64(str(int(v))), "016x")
                    for v in set(values))
        return hs[:k]

    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import kmv_distinct

        users = pq.read_table(
            f"{SF}/events.parquet", columns=["user_id"]
        )["user_id"].to_numpy(zero_copy_only=False)
        want = self._brute_bottomk(users.tolist())
        got = kmv_distinct(SF).to_pandas()
        assert got["h"].tolist() == want
        assert got["pos"].tolist() == list(range(1, len(want) + 1))

    def test_bottomk_is_distributive(self):
        """Bottom-k of a union == bottom-k over the parts' bottom-ks —
        the invariant behind the per-batch cut + single combine."""
        a = self._brute_bottomk(range(0, 300), k=64)
        b = self._brute_bottomk(range(150, 600), k=64)
        u = self._brute_bottomk(range(0, 600), k=64)
        assert sorted(set(a) | set(b))[:64] == u

    def test_estimate_exact_below_k(self, ray_session):
        """Fewer distincts than k ⇒ the sketch holds ALL hashes and the
        estimate is exact (sf fixture: 15 users)."""
        from searchengine_ray.pipelines.relational import kmv_estimate

        assert kmv_estimate(SF) == 15.0

    def test_estimate_bounded_above_k(self, ray_session, tmp_path):
        """n >> k exercises the (k-1)·2^64/h_k branch; k=64 gives
        σ ≈ 1/√(k-2) ≈ 12.7 %, so 3σ ≈ 38 %."""
        import pandas as pd

        from searchengine_ray.pipelines.relational import kmv_estimate

        n = 5000
        df = pd.DataFrame({
            "user_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01"),
        })
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(f"{tmp_path}/events.parquet", index=False)
        est = kmv_estimate(str(tmp_path))
        assert abs(est - n) / n < 0.38


class TestLineDedup:
    @staticmethod
    def _brute(df, line_words=5, min_docs=2):
        from collections import defaultdict

        from searchengine_ray.pipelines.dedup import _doc_lines

        docs_of = defaultdict(set)
        for did, text in zip(df["doc_id"], df["text"]):
            for ln in set(_doc_lines(text, line_words)):
                docs_of[ln].add(did)
        dup = {ln for ln, ds in docs_of.items() if len(ds) >= min_docs}
        rows = []
        for did, text in zip(df["doc_id"], df["text"]):
            lines = _doc_lines(text, line_words)
            kept = [ln for ln in lines if ln not in dup]
            rows.append((did, " ".join(kept), len(lines),
                         len(lines) - len(kept)))
        return sorted(rows)

    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.dedup import line_dedup

        df = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        want = self._brute(df)
        got = line_dedup(SF).to_pandas().sort_values("doc_id")
        assert (
            list(map(tuple, got[["doc_id", "text", "n_lines", "n_dropped"]]
                     .itertuples(index=False))) == want
        )
        # the sf corpus has natural cross-doc duplicate lines — non-vacuous
        assert int(got["n_dropped"].sum()) > 0

    def test_planted_semantics(self, ray_session, tmp_path):
        """Cross-doc duplicate lines drop from EVERY holder; within-doc
        repeats alone survive; a fully-duplicated doc becomes empty text
        (still one output row); partial last lines are lines too."""
        import pandas as pd

        from searchengine_ray.pipelines.dedup import line_dedup

        shared = "alpha beta gamma delta epsilon"
        docs = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": [
                shared + " one two three four five",
                shared,                          # fully duplicated → empty
                "six seven eight nine ten six seven eight nine ten",
                "solo words here",               # short: one partial line
            ],
        })
        docs.to_parquet(f"{tmp_path}/documents.parquet", index=False)
        got = (line_dedup(str(tmp_path)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        # doc 1: shared line dropped, private line kept
        assert got.loc[0, "text"] == "one two three four five"
        assert (got.loc[0, "n_lines"], got.loc[0, "n_dropped"]) == (2, 1)
        # doc 2: all lines duplicated → empty text, row still present
        assert got.loc[1, "text"] == ""
        assert (got.loc[1, "n_lines"], got.loc[1, "n_dropped"]) == (1, 1)
        # doc 3: the repeated line exists ONLY here (df counts DISTINCT
        # docs) → kept twice
        assert got.loc[2, "n_dropped"] == 0
        assert got.loc[2, "text"] == docs.loc[2, "text"]
        # doc 4: 3-word partial line, unique → untouched
        assert got.loc[3, "text"] == "solo words here"
        assert (got.loc[3, "n_lines"], got.loc[3, "n_dropped"]) == (1, 0)


class TestQ12PriorityLines:
    def test_matches_pandas_reference(self, ray_session):
        import pandas as pd
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import (
            Q12_HI_US,
            Q12_LO_US,
            _Q12_HIGH,
            q12_priority_lines,
        )

        o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        li["ship_us"] = li["l_shipdate"].astype("int64")
        li = li[(li["ship_us"] >= Q12_LO_US) & (li["ship_us"] < Q12_HI_US)]
        j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        j["hi"] = j["o_orderpriority"].isin(_Q12_HIGH).astype(int)
        want = (j.groupby("l_returnflag")
                .agg(high_line_count=("hi", "sum"),
                     low_line_count=("hi", lambda s: int((1 - s).sum())))
                .reset_index().sort_values("l_returnflag"))
        got = q12_priority_lines(SF).to_pandas()
        assert got["l_returnflag"].tolist() == want["l_returnflag"].tolist()
        assert got["high_line_count"].tolist() == want["high_line_count"].tolist()
        assert got["low_line_count"].tolist() == want["low_line_count"].tolist()
        assert int(got["high_line_count"].sum() + got["low_line_count"].sum()) == len(li)

    def test_planted_semantics(self, ray_session, tmp_path):
        """High/low classification follows the ORDER's priority; lines
        outside the ship window are excluded entirely."""
        import pandas as pd

        from searchengine_ray.pipelines.relational import q12_priority_lines

        orders = pd.DataFrame({
            "o_orderkey": [1, 2],
            "o_orderpriority": ["1-URGENT", "5-LOW"],
        })
        li = pd.DataFrame({
            "l_orderkey": [1, 1, 2, 2],
            "l_returnflag": ["A", "A", "A", "N"],
            "l_shipdate": pd.to_datetime([
                "1996-06-01",  # in window, high order
                "1995-06-01",  # OUT of window → excluded
                "1996-07-01",  # in window, low order
                "1996-08-01",  # in window, low order
            ]).astype("datetime64[us]"),
        })
        orders.to_parquet(f"{tmp_path}/orders.parquet", index=False)
        li.to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = q12_priority_lines(str(tmp_path)).to_pandas()
        assert got["l_returnflag"].tolist() == ["A", "N"]
        assert got["high_line_count"].tolist() == [1, 0]
        assert got["low_line_count"].tolist() == [1, 1]


class TestEventTransitions:
    @staticmethod
    def _brute(df):
        rows = []
        for _, g in df.sort_values(["user_id", "ts", "event_id"]).groupby(
            "user_id"
        ):
            et = g["event_type"].tolist()
            rows.extend(zip(et[:-1], et[1:]))
        import collections
        c = collections.Counter(rows)
        return sorted((p, n, k) for (p, n), k in c.items())

    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import event_transitions

        df = pq.read_table(f"{SF}/events.parquet").to_pandas()
        want = self._brute(df)
        got = event_transitions(SF).to_pandas()
        assert (list(map(tuple, got.itertuples(index=False))) == want)
        # adjacent-pair conservation: Σn == Σ_user (len - 1)
        per_user = df.groupby("user_id").size()
        assert int(got["n"].sum()) == int((per_user - 1).sum())

    def test_order_and_boundaries(self, ray_session, tmp_path):
        """Tiebreak by event_id at equal ts; no pair across users; a
        single-event user contributes nothing."""
        import pandas as pd

        from searchengine_ray.pipelines.relational import event_transitions

        df = pd.DataFrame({
            "event_id": [10, 11, 20, 30],
            "user_id": [1, 1, 1, 2],
            "event_type": ["view", "click", "purchase", "signup"],
            "ts": pd.to_datetime([
                "2024-01-01", "2024-01-01",  # same ts: event_id orders them
                "2024-01-02", "2024-01-05",
            ]).astype("datetime64[us]"),
        })
        df.to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = event_transitions(str(tmp_path)).to_pandas()
        assert (list(map(tuple, got.itertuples(index=False)))
                == [("click", "purchase", 1), ("view", "click", 1)])

    def test_null_event_type_pairs_drop(self, ray_session, tmp_path):
        """A null event_type must not crash the kernel; pairs touching the
        null row drop (nulls are outside the events contract — this
        mirrors the pandas-groupby dropna behavior the vectorized kernel
        replaced), so A→null→B yields NO transition."""
        import pandas as pd

        from searchengine_ray.pipelines.relational import event_transitions

        df = pd.DataFrame({
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 1, 1],
            "event_type": ["view", None, "click", "purchase"],
            "ts": pd.to_datetime([
                "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
            ]).astype("datetime64[us]"),
        })
        df.to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = event_transitions(str(tmp_path)).to_pandas()
        assert (list(map(tuple, got.itertuples(index=False)))
                == [("click", "purchase", 1)])


class TestPpsSample:
    @staticmethod
    def _brute(df, k=64):
        df = df.sort_values("doc_id")
        wt = df["n_chars"].to_numpy(dtype="int64")
        cum = np.concatenate(([0], np.cumsum(wt)[:-1]))
        W = int(wt.sum())
        pts = ((2 * np.arange(k, dtype="int64") + 1) * W) // (2 * k)
        rows = []
        for did, w, c in zip(df["doc_id"], wt, cum):
            n = int(((pts >= c) & (pts < c + w)).sum())
            if n:
                rows.append((int(did), int(w), n))
        return rows

    def test_matches_bruteforce_and_mass(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.traindata import pps_sample

        df = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]
        ).to_pandas()
        want = self._brute(df)
        got = pps_sample(SF).to_pandas().sort_values("doc_id")
        assert list(map(tuple, got.itertuples(index=False))) == want
        # every midpoint lands in exactly one interval: Σ n_hits == k
        assert int(got["n_hits"].sum()) == 64

    def test_heavy_doc_multiplicity_and_zero_weight(self, ray_session, tmp_path):
        """A doc heavier than W/k catches multiple points; a zero-weight
        doc can never be selected; re-runs are byte-identical."""
        import pandas as pd

        from searchengine_ray.pipelines.traindata import pps_sample

        docs = pd.DataFrame({
            "doc_id": np.arange(10, dtype=np.int64),
            "n_chars": np.array([1000] + [10] * 8 + [0], dtype=np.int64),
        })
        docs.to_parquet(f"{tmp_path}/documents.parquet", index=False)
        got = pps_sample(str(tmp_path), k=8).to_pandas().sort_values("doc_id")
        # doc 0 holds 1000/1080 of the mass → most of the 8 points
        assert int(got.loc[got["doc_id"] == 0, "n_hits"].iloc[0]) >= 6
        assert 9 not in got["doc_id"].tolist()  # zero weight never sampled
        assert int(got["n_hits"].sum()) == 8
        again = pps_sample(str(tmp_path), k=8).to_pandas().sort_values("doc_id")
        assert got.reset_index(drop=True).equals(again.reset_index(drop=True))


class TestRetentionCohorts:
    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import DAY_US, retention_cohorts

        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"]
        ).to_pandas()
        ev["ts_us"] = ev["ts"].values.astype("datetime64[us]").astype("int64")
        sign = ev[ev["event_type"] == "signup"]
        cohort = (sign.groupby("user_id")["ts_us"].min() // DAY_US) * DAY_US
        cells = set()
        for r in ev.itertuples():
            cd = cohort.get(r.user_id)
            if cd is None:
                continue
            day = (r.ts_us // DAY_US) * DAY_US
            if day < cd:
                continue
            cells.add((cd, (day - cd) // (7 * DAY_US), r.user_id))
        want: dict[tuple, int] = {}
        for cd, w, _ in cells:
            want[(cd, w)] = want.get((cd, w), 0) + 1
        got = retention_cohorts(SF).to_pandas()
        assert len(got) == len(want) > 0
        for r in got.itertuples():
            assert want[(r.cohort_day_us, r.week_offset)] == r.n_users
        # non-vacuous: week 0 exists and some cohort retains past week 0
        assert (got["week_offset"] == 0).any()
        assert (got["week_offset"] > 0).any()

    def test_pre_cohort_events_excluded(self, ray_session):
        """Activity before the signup day must not appear in any cell, and
        users who never sign up must be absent entirely."""
        import tempfile

        import pandas as pd

        from searchengine_ray.pipelines.relational import retention_cohorts

        base = pd.Timestamp("2024-03-10")
        d = pd.Timedelta(days=1)
        rows = [
            (1, base - 5 * d, "view"),     # pre-cohort: excluded
            (1, base, "signup"),           # cohort day
            (1, base + 8 * d, "click"),    # week 1
            (2, base + 3 * d, "view"),     # never signs up: absent
        ]
        tmp = tempfile.mkdtemp()
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(f"{tmp}/events.parquet", index=False)
        out = retention_cohorts(tmp).to_pandas()
        cd = int(base.to_datetime64().astype("datetime64[us]").astype("int64"))
        assert [tuple(r) for r in out.itertuples(index=False)] == [
            (cd, 0, 1),  # the signup itself
            (cd, 1, 1),  # the week-1 click
        ]


class TestFunnelDepth:
    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import (
            FUNNEL_GAP_US,
            FUNNEL_STEPS,
            funnel_depth,
        )

        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"]
        ).to_pandas()
        ev["ts_us"] = ev["ts"].values.astype("datetime64[us]").astype("int64")
        got = (
            funnel_depth(SF)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        want_rows = []
        for uid, g in ev.sort_values("ts_us").groupby("user_id"):
            t_prev, depth, ts_steps = None, 0, [-1, -1, -1, -1]
            for k, step in enumerate(FUNNEL_STEPS):
                m = g[g["event_type"] == step]
                if t_prev is not None:
                    m = m[(m["ts_us"] > t_prev) & (m["ts_us"] <= t_prev + FUNNEL_GAP_US)]
                if m.empty:
                    break
                t_prev = int(m["ts_us"].iloc[0])
                depth, ts_steps[k] = k + 1, t_prev
            want_rows.append((uid, depth, *ts_steps))
        for i, (uid, depth, t1, t2, t3, t4) in enumerate(sorted(want_rows)):
            row = got.iloc[i]
            assert (row.user_id, row.depth) == (uid, depth)
            assert [row.ts1_us, row.ts2_us, row.ts3_us, row.ts4_us] == [t1, t2, t3, t4]
        # non-vacuous: more than one depth realized
        assert got["depth"].nunique() > 1

    def test_anchored_semantics_and_window_boundary(self, ray_session):
        """The funnel anchors at the FIRST step-0 event (no re-anchoring,
        even when a later anchor would convert deeper), and the conversion
        window is closed at exactly +gap."""
        import tempfile

        import pandas as pd

        from searchengine_ray.pipelines.relational import funnel_depth

        base = pd.Timestamp("2024-01-01")
        h = pd.Timedelta(hours=1)
        rows = [
            # user 1: first view at t0; only click is 30h later (outside
            # 24h window) but a SECOND view at t0+10h would put the click
            # inside ITS window — anchored semantics must still stop at 1
            (1, base, "view"),
            (1, base + 10 * h, "view"),
            (1, base + 30 * h, "click"),
            # user 2: click exactly AT the +24h boundary — included (<=)
            (2, base, "view"),
            (2, base + 24 * h, "click"),
            # user 3: click one µs past the boundary — excluded
            (3, base, "view"),
            (3, base + 24 * h + pd.Timedelta(microseconds=1), "click"),
        ]
        tmp = tempfile.mkdtemp()
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
        # match the TESTDATA contract: events.ts is timestamp[us] (pandas
        # defaults to ns, which would shrink the µs gap window 1000×)
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(f"{tmp}/events.parquet", index=False)
        out = (
            funnel_depth(tmp)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert out["depth"].tolist() == [1, 2, 1]
        assert out.loc[1, "ts2_us"] == int(
            (base + 24 * h).to_datetime64().astype("datetime64[us]").astype("int64")
        )


class TestQ18LargeOrders:
    def _reference(self, min_qty, limit):
        import pyarrow.parquet as pq

        items = pq.read_table(
            f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
        ).to_pandas()
        orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        cust = pq.read_table(
            f"{SF}/customer.parquet", columns=["c_custkey", "c_name"]
        ).to_pandas()
        big = items.groupby("l_orderkey", as_index=False)["l_quantity"].sum()
        big = big[big["l_quantity"] > min_qty].rename(
            columns={"l_quantity": "sum_qty"}
        )
        ref = big.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        ref = ref.merge(cust, left_on="o_custkey", right_on="c_custkey")
        ref["o_orderdate_us"] = (
            ref["o_orderdate"].values.astype("datetime64[us]").astype("int64")
        )
        return (
            ref.sort_values(
                ["o_totalprice", "o_orderdate_us", "o_orderkey"],
                ascending=[False, True, True],
            )
            .head(limit)
            .reset_index(drop=True)
        )

    def test_matches_pandas_reference(self, ray_session):
        from searchengine_ray.pipelines.relational import q18_large_orders

        got = q18_large_orders(SF)
        ref = self._reference(250, 100)
        assert len(got) == len(ref) > 0
        for col in ["c_name", "c_custkey", "o_orderkey", "o_orderdate_us",
                    "o_totalprice", "sum_qty"]:
            assert got[col].tolist() == ref[col].tolist(), col

    def test_limit_cut_is_deterministic(self, ray_session):
        """With a low threshold the LIMIT binds; the cut must follow the
        full (o_totalprice DESC, o_orderdate_us, o_orderkey) tiebreak."""
        from searchengine_ray.pipelines.relational import q18_large_orders

        got = q18_large_orders(SF, min_qty=150, limit=20)
        ref = self._reference(150, 20)
        assert len(got) == 20
        assert got["o_orderkey"].tolist() == ref["o_orderkey"].tolist()

    def test_having_is_strict(self, ray_session):
        """HAVING > t: an order summing exactly to t must NOT qualify."""
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import q18_large_orders

        items = pq.read_table(
            f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
        ).to_pandas()
        sums = items.groupby("l_orderkey")["l_quantity"].sum()
        t = int(sums.loc[sums > 100].min())  # a realized sum value
        got = q18_large_orders(SF, min_qty=t, limit=10**9)
        assert float(got["sum_qty"].min()) > t
        n_expected = int((sums > t).sum())
        assert len(got) == n_expected


class TestGroupQuantiles:
    def test_matches_numpy_per_group(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import group_quantiles

        out = group_quantiles(SF).to_pandas()
        t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        got = {(r["event_type"], r["q"]): r["value"] for _, r in out.iterrows()}
        for g in np.unique(et):
            vg = np.sort(v[et == g])
            n = vg.size
            for q in (0.5, 0.9, 0.99):
                k = max(int(np.ceil(n * q)), 1)
                assert got[(g, q)] == vg[k - 1], (g, q)
        assert len(out) == 3 * np.unique(et).size

    def test_pathological_group_recurses_exactly(self, ray_session, tmp_path):
        """One group crams its mass into a single histogram bucket (forces
        per-group recursion); another is constant (degenerate short-circuit)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import group_quantiles

        rng = np.random.default_rng(11)
        heavy = np.concatenate((np.full(5000, 1.0), rng.uniform(0, 1e9, 50)))
        const = np.full(300, 42.0)
        et = np.array(["heavy"] * heavy.size + ["const"] * const.size, dtype=object)
        v = np.concatenate((heavy, const))
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table({"event_type": pa.array(et.tolist(), type=pa.string()),
                      "value": pa.array(v)}),
            str(d / "events.parquet"),
        )
        out = group_quantiles(str(d), n_buckets=16, max_pull=100).to_pandas()
        got = {(r["event_type"], r["q"]): r["value"] for _, r in out.iterrows()}
        for g, vg in (("heavy", np.sort(heavy)), ("const", np.sort(const))):
            for q in (0.5, 0.9, 0.99):
                k = max(int(np.ceil(vg.size * q)), 1)
                assert got[(g, q)] == vg[k - 1], (g, q)


class TestQ1PricingSummary:
    def test_matches_pandas_reference(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q1_CUTOFF_US,
            q1_pricing_summary,
        )

        got = q1_pricing_summary(SF).to_pandas().reset_index(drop=True)
        li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        ship_us = li["l_shipdate"].values.astype("datetime64[us]").astype("int64")
        li = li[ship_us <= Q1_CUTOFF_US].copy()
        qty_i = (li["l_quantity"] * 100).round().astype("int64")
        price_i = (li["l_extendedprice"] * 100).round().astype("int64")
        omd = ((1 - li["l_discount"]) * 100).round().astype("int64")
        opt = ((1 + li["l_tax"]) * 100).round().astype("int64")
        ref = pd.DataFrame({
            "g": li["l_returnflag"] + li["l_linestatus"],
            "qty_i": qty_i, "price_i": price_i,
            "dp_i": price_i * omd, "ch_i": price_i * omd * opt,
            "disc_i": (li["l_discount"] * 100).round().astype("int64"),
            "n": 1,
        }).groupby("g", as_index=False).sum().sort_values("g").reset_index(drop=True)

        def hafz(x, dp):  # half-away-from-zero like _round_vec
            s = 10.0 ** dp
            return np.floor(np.asarray(x, dtype=np.float64) * s + 0.5) / s

        assert got["l_returnflag"].tolist() == [g[0] for g in ref["g"]]
        assert got["l_linestatus"].tolist() == [g[1] for g in ref["g"]]
        n = ref["n"].to_numpy(dtype=np.float64)
        assert got["sum_qty"].tolist() == hafz(ref["qty_i"] / 100.0, 2).tolist()
        assert got["sum_base_price"].tolist() == hafz(ref["price_i"] / 100.0, 2).tolist()
        assert got["sum_disc_price"].tolist() == hafz(ref["dp_i"] / 1e4, 2).tolist()
        assert got["sum_charge"].tolist() == hafz(ref["ch_i"] / 1e6, 2).tolist()
        assert got["avg_qty"].tolist() == hafz(ref["qty_i"].to_numpy() / 100.0 / n, 4).tolist()
        assert got["avg_price"].tolist() == hafz(ref["price_i"].to_numpy() / 100.0 / n, 4).tolist()
        assert got["avg_disc"].tolist() == hafz(ref["disc_i"].to_numpy() / 100.0 / n, 4).tolist()
        assert got["count_order"].tolist() == ref["n"].tolist()
        assert got["count_order"].sum() == len(li)  # cutoff actually filtered

    def test_all_filtered_yields_empty(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q1_pricing_summary

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table({
                "l_returnflag": pa.array(["R"], type=pa.string()),
                "l_linestatus": pa.array(["F"], type=pa.string()),
                "l_quantity": pa.array([1.0]),
                "l_extendedprice": pa.array([10.0]),
                "l_discount": pa.array([0.1]),
                "l_tax": pa.array([0.05]),
                "l_shipdate": pa.array([99_999_999_999_999_999],
                                       type=pa.timestamp("us")),
            }),
            str(d / "lineitem.parquet"),
        )
        out = q1_pricing_summary(str(d)).to_pandas()
        assert len(out) == 0


class TestNdistinctUsers:
    def test_matches_pandas_reference(self, ray_session):
        from searchengine_ray.pipelines.relational import ndistinct_users

        got = ndistinct_users(SF).to_pandas()
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "event_type"]).to_pandas()
        ref = ev.groupby("event_type")["user_id"].nunique().sort_index()
        assert got["event_type"].tolist() == ref.index.tolist()
        assert got["n_users"].tolist() == ref.tolist()

    def test_cross_batch_duplicates_count_once(self, ray_session, tmp_path):
        # one user repeats the same type 50k times (spanning many batches) —
        # the co-partition dedup must still count it exactly once
        from searchengine_ray.pipelines.relational import ndistinct_users

        d = tmp_path / "sf"
        d.mkdir()
        n = 50_000
        uid = np.concatenate((np.full(n, 7, dtype=np.int64),
                              np.arange(100, dtype=np.int64)))
        et = np.array(["spam"] * n + ["rare"] * 100, dtype=object)
        pq.write_table(
            pa.table({"user_id": pa.array(uid),
                      "event_type": pa.array(et.tolist(), type=pa.string())}),
            str(d / "events.parquet"),
        )
        out = ndistinct_users(str(d)).to_pandas()
        got = dict(zip(out["event_type"], out["n_users"]))
        assert got == {"spam": 1, "rare": 100}


class TestAntiJoinCustomers:
    def test_matches_pandas_reference(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            ANTI_CUTOFF_US,
            anti_join_customers,
        )

        got = anti_join_customers(SF).to_pandas()
        cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
        orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        nat = pq.read_table(f"{SF}/nation.parquet").to_pandas()
        odate_us = orders["o_orderdate"].values.astype("datetime64[us]").astype("int64")
        have = set(orders.loc[odate_us >= ANTI_CUTOFF_US, "o_custkey"])
        miss = cust[~cust["c_custkey"].isin(have)]
        ref = (miss.groupby("c_nationkey").size().rename("n_customers").reset_index()
               .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
               .sort_values("n_name"))
        assert got["n_name"].tolist() == ref["n_name"].tolist()
        assert got["n_customers"].tolist() == ref["n_customers"].tolist()

    def test_planted_absence(self, ray_session, tmp_path):
        # customers 1,2 in nation 0; 3 in nation 1; only customer 2 ordered
        # after the cutoff → nation A keeps one missing customer, nation B one
        from searchengine_ray.pipelines.relational import (
            ANTI_CUTOFF_US,
            anti_join_customers,
        )

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table({"c_custkey": pa.array([1, 2, 3], type=pa.int64()),
                      "c_nationkey": pa.array([0, 0, 1], type=pa.int64())}),
            str(d / "customer.parquet"),
        )
        pq.write_table(
            pa.table({
                "o_custkey": pa.array([1, 2, 2], type=pa.int64()),
                "o_orderdate": pa.array(
                    [ANTI_CUTOFF_US - 1, ANTI_CUTOFF_US, ANTI_CUTOFF_US + 1],
                    type=pa.timestamp("us")),
            }),
            str(d / "orders.parquet"),
        )
        pq.write_table(
            pa.table({"n_nationkey": pa.array([0, 1], type=pa.int64()),
                      "n_name": pa.array(["ALPHA", "BRAVO"], type=pa.string())}),
            str(d / "nation.parquet"),
        )
        out = anti_join_customers(str(d)).to_pandas()
        assert out["n_name"].tolist() == ["ALPHA", "BRAVO"]
        assert out["n_customers"].tolist() == [1, 1]


class TestCubeEvents:
    def test_matches_pandas_reference(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            CUBE_ALL_DAY,
            CUBE_ALL_TYPE,
            DAY_US,
            cube_events,
        )

        got = cube_events(SF).to_pandas()
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "event_type", "value"]).to_pandas()
        ts_us = ev["ts"].values.astype("datetime64[us]").astype("int64")
        def hafz4(x):  # half-away-from-zero at 4 dp, like _round_vec/DuckDB
            return np.floor(abs(float(x)) * 1e4 + 0.5) / 1e4 * np.sign(x)

        fine = (ev.assign(day_us=(ts_us // DAY_US) * DAY_US)
                .groupby(["event_type", "day_us"])
                .agg(n_events=("value", "size"), sv=("value", "sum"))
                .reset_index())
        fine["svr"] = fine["sv"].map(hafz4)
        rows = {}
        for _, r in fine.iterrows():
            rows[(r["event_type"], int(r["day_us"]))] = (int(r["n_events"]), r["svr"])
        for t, sub in fine.groupby("event_type"):
            rows[(t, CUBE_ALL_DAY)] = (int(sub["n_events"].sum()),
                                       hafz4(sub["svr"].sum()))
        for dd, sub in fine.groupby("day_us"):
            rows[(CUBE_ALL_TYPE, int(dd))] = (int(sub["n_events"].sum()),
                                              hafz4(sub["svr"].sum()))
        rows[(CUBE_ALL_TYPE, CUBE_ALL_DAY)] = (int(fine["n_events"].sum()),
                                               hafz4(fine["svr"].sum()))
        assert len(got) == len(rows)
        for _, r in got.iterrows():
            n, s = rows[(r["event_type"], int(r["day_us"]))]
            assert int(r["n_events"]) == n and r["sum_value_r"] == s


class TestGroupTopkDocs:
    def test_multi_batch_matches_global_selection(self, ray_session):
        # force many small batches: per-batch local top-k unioned at the
        # driver must equal the single-pass global selection
        from searchengine_ray.pipelines.textstats import (
            QualityScore,
            group_topk_docs,
        )

        got = group_topk_docs(SF, k=3, batch_size=16).to_pandas()
        t = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text", "lang"])
        q = QualityScore()(t).to_pandas()
        ref = pd.DataFrame({
            "lang": t["lang"].to_pylist(),
            "doc_id": q["doc_id"],
            "quality_r": q["quality_r"],
        }).sort_values(["lang", "quality_r", "doc_id"],
                       ascending=[True, False, True])
        ref = ref.groupby("lang", as_index=False).head(3).reset_index(drop=True)
        ref["rk"] = ref.groupby("lang").cumcount() + 1
        assert got["lang"].tolist() == ref["lang"].tolist()
        assert got["rk"].tolist() == ref["rk"].tolist()
        assert got["doc_id"].tolist() == ref["doc_id"].tolist()
        assert got["quality_r"].tolist() == ref["quality_r"].tolist()


class TestQ5LocalSupplierVolume:
    def test_matches_pandas_reference(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q5_FROM_US,
            Q5_REGION,
            Q5_TO_US,
            q5_local_supplier_volume,
        )

        got = q5_local_supplier_volume(SF).to_pandas()
        cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
        orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        items = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        sup = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
        nat = pq.read_table(f"{SF}/nation.parquet").to_pandas()
        reg = pq.read_table(f"{SF}/region.parquet").to_pandas()
        nk = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
        nk = nk[nk["r_name"] == Q5_REGION]
        odate_us = orders["o_orderdate"].values.astype("datetime64[us]").astype("int64")
        o = orders[(odate_us >= Q5_FROM_US) & (odate_us < Q5_TO_US)]
        j = (items.merge(o, left_on="l_orderkey", right_on="o_orderkey")
             .merge(cust, left_on="o_custkey", right_on="c_custkey")
             .merge(sup, left_on="l_suppkey", right_on="s_suppkey"))
        j = j[j["c_nationkey"] == j["s_nationkey"]]
        j = j.merge(nk, left_on="s_nationkey", right_on="n_nationkey")
        j["rev"] = ((j["l_extendedprice"] * 100).round()
                    * ((1 - j["l_discount"]) * 100).round())
        ref = (j.groupby("n_name", as_index=False)
               .agg(n_items=("rev", "size"), rev=("rev", "sum"))
               .sort_values("n_name").reset_index(drop=True))
        x = ref["rev"].to_numpy() / 10000.0
        ref["revenue_r"] = np.floor(x * 100.0 + 0.5) / 100.0  # half-away
        assert len(got) > 0  # non-vacuous at sf0.001
        assert got["n_name"].tolist() == ref["n_name"].tolist()
        assert got["n_items"].tolist() == ref["n_items"].tolist()
        assert got["revenue_r"].tolist() == ref["revenue_r"].tolist()

    def test_same_nation_gate(self, ray_session, tmp_path):
        # two qualifying nations whose ALPHABETICAL order (NAT_A key 11,
        # NAT_B key 10) inverts their key order — pins the n_name final
        # sort. Customer 5 (nation 10) orders from supplier 1 (nation 10,
        # kept), supplier 2 (nation 11, different nation → dropped) and
        # supplier 3 (outside the region → dropped at the broadcast
        # filter). Customer 6 (nation 11) orders twice from supplier 2
        # (same nation → both kept).
        from searchengine_ray.pipelines.relational import (
            Q5_FROM_US,
            Q5_REGION,
            q5_local_supplier_volume,
        )

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(pa.table({"r_regionkey": pa.array([0, 1], type=pa.int64()),
                                 "r_name": pa.array([Q5_REGION, "OTHER"])}),
                       str(d / "region.parquet"))
        pq.write_table(pa.table({"n_nationkey": pa.array([10, 11, 20], type=pa.int64()),
                                 "n_name": pa.array(["NAT_B", "NAT_A", "NAT_X"]),
                                 "n_regionkey": pa.array([0, 0, 1], type=pa.int64())}),
                       str(d / "nation.parquet"))
        pq.write_table(pa.table({"c_custkey": pa.array([5, 6], type=pa.int64()),
                                 "c_nationkey": pa.array([10, 11], type=pa.int64())}),
                       str(d / "customer.parquet"))
        pq.write_table(pa.table({
            "o_orderkey": pa.array([100, 200], type=pa.int64()),
            "o_custkey": pa.array([5, 6], type=pa.int64()),
            "o_orderdate": pa.array([Q5_FROM_US, Q5_FROM_US],
                                    type=pa.timestamp("us")),
        }), str(d / "orders.parquet"))
        pq.write_table(pa.table({"s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
                                 "s_nationkey": pa.array([10, 11, 20], type=pa.int64())}),
                       str(d / "supplier.parquet"))
        pq.write_table(pa.table({
            "l_orderkey": pa.array([100, 100, 100, 200, 200], type=pa.int64()),
            "l_suppkey": pa.array([1, 2, 3, 2, 2], type=pa.int64()),
            "l_extendedprice": pa.array([100.0, 100.0, 100.0, 200.0, 50.0]),
            "l_discount": pa.array([0.1, 0.1, 0.1, 0.0, 0.2]),
        }), str(d / "lineitem.parquet"))
        out = q5_local_supplier_volume(str(d)).to_pandas()
        # NAT_A (key 11): 200*1.0 + 50*0.8 = 240; NAT_B (key 10): 100*0.9
        assert out["n_name"].tolist() == ["NAT_A", "NAT_B"]
        assert out["n_items"].tolist() == [2, 1]
        assert out["revenue_r"].tolist() == [240.0, 90.0]


class TestSemanticDedup:
    def test_matches_union_find_reference(self, ray_session, emb):
        # brute-force all-pairs cosine over the planted universe + union-find
        from searchengine_ray.pipelines.similarity import (
            PLANT_EVERY,
            PLANT_OFFSET,
            PLANT_NOISE,
            semantic_dedup,
        )

        got = (semantic_dedup(SF).to_pandas()
               .sort_values("vec_id").reset_index(drop=True))
        ids, m = emb
        ids = ids.astype(np.int64)
        all_ids = [ids]
        all_vecs = [m]
        for i in np.nonzero(ids % PLANT_EVERY == 0)[0]:
            v = m[i]
            s = np.sin(float(ids[i]) + np.arange(v.size, dtype=np.float64))
            noise = s * (PLANT_NOISE * np.linalg.norm(v) / np.linalg.norm(s))
            all_ids.append(np.array([ids[i] + PLANT_OFFSET], dtype=np.int64))
            all_vecs.append((v + noise)[None, :])
        uids = np.concatenate(all_ids)
        mat = np.concatenate(all_vecs, axis=0)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sim = mat @ mat.T
        parent = {int(u): int(u) for u in uids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        n = uids.size
        for i in range(n):
            for j in range(i + 1, n):
                if sim[i, j] >= 0.95:
                    ra, rb = find(int(uids[i])), find(int(uids[j]))
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        ref = {int(u): find(int(u)) for u in uids}
        assert len(got) == n
        assert (got["vec_id"] != got["rep_vec_id"]).sum() > 0  # non-vacuous
        for vid, rep in zip(got["vec_id"], got["rep_vec_id"]):
            assert ref[int(vid)] == int(rep), vid


class TestQ13CustomerDistribution:
    def test_matches_pandas_reference(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import (
            Q13_EXCLUDED_PRIORITY,
            q13_customer_distribution,
        )

        c = pq.read_table(f"{SF}/customer.parquet").to_pandas()
        o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        o = o[o["o_orderpriority"] != Q13_EXCLUDED_PRIORITY]
        per = o.groupby("o_custkey").size()
        counts = c["c_custkey"].map(per).fillna(0).astype("int64")
        want = (counts.value_counts().rename_axis("c_count")
                .reset_index(name="custdist")
                .sort_values(["custdist", "c_count"],
                             ascending=[False, False]))
        got = q13_customer_distribution(SF).to_pandas()
        assert got["c_count"].tolist() == want["c_count"].tolist()
        assert got["custdist"].tolist() == want["custdist"].tolist()
        # every customer lands in exactly one histogram cell
        assert int(got["custdist"].sum()) == len(c)

    def test_zero_extension_and_exclusion(self, ray_session, tmp_path):
        """Customers with no qualifying order surface at c_count 0; orders
        of the excluded priority and of unknown custkeys never count."""
        import pandas as pd

        from searchengine_ray.pipelines.relational import (
            q13_customer_distribution,
        )

        pd.DataFrame({"c_custkey": [1, 2, 3]}).to_parquet(
            f"{tmp_path}/customer.parquet", index=False)
        pd.DataFrame({
            "o_custkey": [1, 1, 2, 2, 99],
            "o_orderpriority": [
                "5-LOW", "3-MEDIUM",   # customer 1 → 2 orders
                "5-LOW", "1-URGENT",   # customer 2 → 1 (URGENT excluded)
                "5-LOW",               # custkey 99 has no customer row
            ],
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        got = q13_customer_distribution(str(tmp_path)).to_pandas()
        # one customer each at counts 2, 1, 0 → custdist ties broken by
        # c_count DESC
        assert got["c_count"].tolist() == [2, 1, 0]
        assert got["custdist"].tolist() == [1, 1, 1]


class TestGroupMoments:
    def test_matches_exact_integer_reference(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import (
            _MOM_SCALE,
            group_moments,
        )

        df = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "value"]).to_pandas()
        got = group_moments(SF).to_pandas()
        assert got["event_type"].tolist() == sorted(df["event_type"].unique())
        for _, row in got.iterrows():
            v = df[df["event_type"] == row["event_type"]]["value"].to_numpy()
            vi = [int(x) for x in np.round(v * _MOM_SCALE)]
            n, s1, s2 = len(vi), sum(vi), sum(x * x for x in vi)
            mean = float(s1) / float(n * _MOM_SCALE)
            var = float(n * s2 - s1 * s1) / float(n * n * _MOM_SCALE**2)
            assert row["n_events"] == n
            assert abs(row["mean_r"] - mean) < 1e-4
            assert abs(row["var_r"] - var) < 1e-4
            assert abs(row["std_r"] - np.sqrt(var)) < 1e-4

    def test_constant_group_has_zero_variance(self, ray_session, tmp_path):
        import pandas as pd

        from searchengine_ray.pipelines.relational import group_moments

        pd.DataFrame({
            "event_type": ["a"] * 5 + ["b"] * 3,
            "value": [2.5] * 5 + [1.0, 2.0, 3.0],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = group_moments(str(tmp_path)).to_pandas()
        a = got[got["event_type"] == "a"].iloc[0]
        assert (a["mean_r"], a["var_r"], a["std_r"]) == (2.5, 0.0, 0.0)
        b = got[got["event_type"] == "b"].iloc[0]
        assert (b["mean_r"], b["var_r"]) == (2.0, 0.6667)  # var = 2/3, 4 dp

    def test_exact_at_envelope_magnitude(self, ray_session, tmp_path):
        # |value| = 2e5 ⇒ vi = 2e9, vi² = 4e18 — two rows overflow a naive
        # int64 Σv² inside one batch; the hi/lo split must stay exact.
        import pandas as pd

        from searchengine_ray.pipelines.relational import group_moments

        vals = [200000.0, -200000.0, 199999.9999, 150000.0003] * 8
        pd.DataFrame({
            "event_type": ["a"] * len(vals), "value": vals,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = group_moments(str(tmp_path)).to_pandas().iloc[0]
        vi = [2_000_000_000, -2_000_000_000, 1_999_999_999, 1_500_000_003] * 8
        n, s1, s2 = len(vi), sum(vi), sum(x * x for x in vi)
        mean = float(s1) / float(n * 10_000)
        var = float(n * s2 - s1 * s1) / float(n * n * 10_000 * 10_000)
        assert got["n_events"] == n
        assert abs(got["mean_r"] - mean) < 1e-4
        assert abs(got["var_r"] - var) <= 0.5e-4 + 1e-9 * abs(var)
        assert abs(got["std_r"] - np.sqrt(var)) < 1e-4

    def test_half_away_rounding_matches_sql(self, ray_session, tmp_path):
        # 0.00025·10⁴ = 2.5 exactly: SQL ROUND gives 3 (half away from
        # zero); np.round would give 2 (banker's). Pin the SQL behavior.
        import pandas as pd

        from searchengine_ray.pipelines.relational import group_moments

        pd.DataFrame({
            "event_type": ["a"], "value": [0.00025],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = group_moments(str(tmp_path)).to_pandas().iloc[0]
        assert got["mean_r"] == 0.0003  # vi = 3, not 2

    def test_empty_events(self, ray_session, tmp_path):
        import pandas as pd

        from searchengine_ray.pipelines.relational import group_moments

        pd.DataFrame({
            "event_type": pd.Series([], dtype=str),
            "value": pd.Series([], dtype=np.float64),
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = group_moments(str(tmp_path))
        assert got.num_rows == 0
        assert got.column_names == [
            "event_type", "n_events", "mean_r", "var_r", "std_r"]


class TestMadOutliers:
    @staticmethod
    def _disc_median(v):
        s = np.sort(np.asarray(v, dtype=np.float64))
        k = max(int(np.ceil(s.size * 0.5)), 1)
        return float(s[k - 1])

    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.relational import MAD_FACTOR, mad_outliers

        df = pq.read_table(
            f"{SF}/events.parquet",
            columns=["event_id", "event_type", "value"]).to_pandas()
        want = []
        for et, g in df.groupby("event_type"):
            med = self._disc_median(g["value"])
            dev = np.abs(g["value"].to_numpy() - med)
            mad = self._disc_median(dev)
            want.extend(g["event_id"].to_numpy()[dev > MAD_FACTOR * mad].tolist())
        got = mad_outliers(SF).to_pandas()
        assert sorted(got["event_id"].tolist()) == sorted(want)

    def test_planted_outliers(self, ray_session, tmp_path):
        """A tight cluster plus one far point per type: only the far point
        trips the MAD gate; a constant-valued type (MAD 0) flags every
        off-median point and nothing else."""
        import pandas as pd

        from searchengine_ray.pipelines.relational import mad_outliers

        pd.DataFrame({
            "event_id": list(range(8)),
            "event_type": ["a"] * 5 + ["c"] * 3,
            "value": [10.0, 10.1, 9.9, 10.05, 500.0,   # 500 is the outlier
                      7.0, 7.0, 7.0],                   # constant: MAD 0
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = mad_outliers(str(tmp_path)).to_pandas()
        assert got["event_id"].tolist() == [4]


class TestPercentRankQuality:
    def test_matches_window_reference(self, ray_session):
        from searchengine_ray.pipelines.textstats import (
            percent_rank_quality,
            quality_score,
        )

        q = quality_score(SF).to_pandas()[["doc_id", "quality_r"]]
        n = len(q)
        # percent_rank(): (count strictly below) / (N - 1); ties share
        pct = (q["quality_r"].rank(method="min") - 1) / (n - 1)
        want = dict(zip(q["doc_id"], np.floor(pct * 10000 + 0.5) / 10000))
        got = percent_rank_quality(SF).to_pandas()
        assert len(got) == n
        for did, p in zip(got["doc_id"], got["pct_rank_r"]):
            assert p == want[int(did)], did
        # extremes: some doc at 0; max-quality docs strictly below 1 only
        # when tied at the top
        assert got["pct_rank_r"].min() == 0.0
        assert got["pct_rank_r"].max() <= 1.0


class TestSourceOverlap:
    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.dedup import (
            source_overlap,
            word_shingle_array,
        )

        df = pq.read_table(f"{SF}/documents.parquet",
                           columns=["text", "source"]).to_pandas()
        per_src = {}
        for src, g in df.groupby("source"):
            s = set()
            for t in g["text"]:
                s.update(word_shingle_array(t or "").tolist())
            per_src[src] = s
        srcs = sorted(per_src)
        want = {(a, b): len(per_src[a] & per_src[b])
                for i, a in enumerate(srcs) for b in srcs[i:]}
        want = {k: v for k, v in want.items() if v > 0}
        got = source_overlap(SF).to_pandas()
        assert dict(zip(zip(got["source_a"], got["source_b"]),
                        got["n_shared"])) == want
        # diagonal is each source's distinct-shingle count
        for a in srcs:
            row = got[(got["source_a"] == a) & (got["source_b"] == a)]
            assert int(row["n_shared"].iloc[0]) == len(per_src[a])

    def test_planted_overlap(self, ray_session, tmp_path):
        """Two sources sharing one doc text overlap by exactly that doc's
        shingles; a disjoint third source has zero off-diagonal rows."""
        import pandas as pd

        from searchengine_ray.pipelines.dedup import (
            source_overlap,
            word_shingle_array,
        )

        shared = "alpha beta gamma delta epsilon"
        pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": [shared, shared + " zeta", "one two three four", shared],
            "source": ["s1", "s1", "s2", "s3"],
        }).to_parquet(f"{tmp_path}/documents.parquet", index=False)
        got = source_overlap(str(tmp_path)).to_pandas()
        m = dict(zip(zip(got["source_a"], got["source_b"]), got["n_shared"]))
        n_shared_doc = word_shingle_array(shared).size
        assert m[("s1", "s3")] == n_shared_doc
        assert ("s1", "s2") not in m and ("s2", "s3") not in m
        assert m[("s2", "s2")] == word_shingle_array("one two three four").size


class TestQ17SmallQuantity:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import q17_small_quantity

        li = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        ).to_pandas()
        li["qi"] = np.rint(li["l_quantity"] * 100).astype(np.int64)
        li["cents"] = np.rint(li["l_extendedprice"] * 100).astype(np.int64)
        st = li.groupby("l_partkey").agg(s=("qi", "sum"), n=("qi", "size"))
        j = li.join(st, on="l_partkey")
        small = j[5 * j["qi"] * j["n"] < j["s"]]
        got = q17_small_quantity(SF).to_pandas().iloc[0]
        assert got["n_small"] == len(small)
        total = sum(int(c) for c in small["cents"])
        from searchengine_ray.pipelines.fulltext import round_half_away
        assert got["avg_yearly_r"] == round_half_away(float(total) / 700.0, 2)

    def test_planted_gate(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q17_small_quantity

        # part 1: quantities (10, 10, 1) → avg 7, 0.2·avg = 1.4 > 1 ⇒ only
        # the qty-1 line qualifies; part 2: (5, 5) → nothing below 1.0
        pd.DataFrame({
            "l_partkey": [1, 1, 1, 2, 2],
            "l_quantity": [10.0, 10.0, 1.0, 5.0, 5.0],
            "l_extendedprice": [100.0, 100.0, 7.0, 50.0, 50.0],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = q17_small_quantity(str(tmp_path)).to_pandas().iloc[0]
        assert got["n_small"] == 1
        assert got["avg_yearly_r"] == 1.0  # 700 cents / 700.0

    def test_empty(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q17_small_quantity

        pd.DataFrame({
            "l_partkey": pd.Series([], dtype=np.int64),
            "l_quantity": pd.Series([], dtype=np.float64),
            "l_extendedprice": pd.Series([], dtype=np.float64),
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = q17_small_quantity(str(tmp_path)).to_pandas().iloc[0]
        assert (got["n_small"], got["avg_yearly_r"]) == (0, 0.0)


class TestGroupCorrelation:
    def test_matches_exact_reference(self, ray_session):
        from searchengine_ray.pipelines.relational import group_correlation

        li = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        ).to_pandas()
        got = group_correlation(SF).to_pandas()
        assert got["l_returnflag"].tolist() == sorted(li["l_returnflag"].unique())
        for _, row in got.iterrows():
            sub = li[li["l_returnflag"] == row["l_returnflag"]]
            x = [int(v) for v in np.rint(sub["l_quantity"] * 100)]
            y = [int(v) for v in np.rint(sub["l_extendedprice"] * 100)]
            n = len(x)
            sx, sy = sum(x), sum(y)
            sxy = sum(a * b for a, b in zip(x, y))
            sxx, syy = sum(a * a for a in x), sum(b * b for b in y)
            num = n * sxy - sx * sy
            dx, dy = n * sxx - sx * sx, n * syy - sy * sy
            cov = float(num) / (float(n) * float(n) * 10000.0)
            corr = float(num) / (np.sqrt(float(dx)) * np.sqrt(float(dy)))
            assert row["n_rows"] == n
            assert abs(row["covar_r"] - cov) < 1e-4
            assert abs(row["corr_r"] - corr) < 1e-4

    def test_constant_column_zero_by_convention(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import group_correlation

        pd.DataFrame({
            "l_returnflag": ["A"] * 4,
            "l_quantity": [3.0] * 4,  # zero variance in x
            "l_extendedprice": [1.0, 2.0, 3.0, 4.0],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = group_correlation(str(tmp_path)).to_pandas().iloc[0]
        assert got["corr_r"] == 0.0
        assert got["covar_r"] == 0.0  # constant x ⇒ covariance 0 too


class TestQ4OrderPriority:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q4_LATE_US,
            q4_order_priority,
        )

        orders = pq.read_table(
            f"{SF}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        ).to_pandas()
        li = pq.read_table(
            f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
        ).to_pandas()
        mx = li.groupby("l_orderkey")["l_shipdate"].max()
        j = orders.join(mx, on="o_orderkey")
        # normalize to µs before the int64 view (the engine does the same)
        # so a ns-resolution fixture can't skew the 30-day constant
        ship_us = j["l_shipdate"].astype("datetime64[us]").astype(np.int64)
        odate_us = j["o_orderdate"].astype("datetime64[us]").astype(np.int64)
        late = j[(j["l_shipdate"].notna())
                 & (ship_us > odate_us + Q4_LATE_US)]
        ref = late.groupby("o_orderpriority").size().sort_index()
        got = q4_order_priority(SF).to_pandas()
        assert got["o_orderpriority"].tolist() == ref.index.tolist()
        assert got["order_count"].tolist() == ref.tolist()

    def test_planted_exists_semantics(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q4_order_priority

        base = pd.Timestamp("1996-01-01")
        pd.DataFrame({
            "o_orderkey": [1, 2, 3],
            "o_orderdate": [base] * 3,
            "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH"],
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        pd.DataFrame({
            # order 1: one on-time + one late line → counted once (EXISTS,
            # not a join multiplicity); order 2: on-time only; order 3: no
            # lines at all
            "l_orderkey": [1, 1, 2],
            "l_shipdate": [base + pd.Timedelta(days=5),
                           base + pd.Timedelta(days=45),
                           base + pd.Timedelta(days=30)],  # exactly 30d: NOT late
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = q4_order_priority(str(tmp_path)).to_pandas()
        assert got["o_orderpriority"].tolist() == ["1-URGENT"]
        assert got["order_count"].tolist() == [1]


class TestEditNeighbors:
    @staticmethod
    def _lev(a, b):
        # full DP Levenshtein, the spec the engine's lev≤1 check must match
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return d[n]

    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.dedup import edit_neighbors
        from searchengine_ray.pipelines.textstats import normalize_for_fp

        docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
        keys = sorted({normalize_for_fp(t or "")[:12]
                       for t in docs["text"].to_pylist()} - {""})
        ref = {(a, b) for i, a in enumerate(keys) for b in keys[i + 1:]
               if self._lev(a, b) == 1}
        got = edit_neighbors(SF).to_pandas()
        assert set(zip(got["key_a"], got["key_b"])) == ref
        assert len(got) == len(ref)  # no duplicate pairs survive

    def test_planted_neighborhood(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.dedup import edit_neighbors

        pd.DataFrame({
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["abcdefghijkl",   # base
                     "abcdefghijkx",   # substitution → lev 1
                     "abcdefghijk",    # deletion → lev 1
                     "abcdefghijkl",   # exact duplicate: collapses
                     "zzzz"],          # far from everything
        }).to_parquet(f"{tmp_path}/documents.parquet", index=False)
        got = edit_neighbors(str(tmp_path)).to_pandas()
        pairs = set(zip(got["key_a"], got["key_b"]))
        assert pairs == {
            ("abcdefghijk", "abcdefghijkl"),
            ("abcdefghijk", "abcdefghijkx"),
            ("abcdefghijkl", "abcdefghijkx"),
        }


class TestQ10ReturnedRevenue:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q10_FROM_US,
            Q10_TO_US,
            q10_returned_revenue,
        )

        orders = pq.read_table(
            f"{SF}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ).to_pandas()
        li = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                     "l_discount"],
        ).to_pandas()
        od_us = orders["o_orderdate"].astype("datetime64[us]").astype(np.int64)
        orders = orders[(od_us >= Q10_FROM_US) & (od_us < Q10_TO_US)]
        li = li[li["l_returnflag"] == "R"].copy()
        li["rev"] = (np.rint(li["l_extendedprice"] * 100).astype(np.int64)
                     * np.rint((1 - li["l_discount"]) * 100).astype(np.int64))
        j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        byc = (j.groupby("o_custkey")["rev"].sum().reset_index()
               .sort_values(["rev", "o_custkey"], ascending=[False, True])
               .head(20))
        got = q10_returned_revenue(SF).to_pandas()
        assert got["c_custkey"].tolist() == byc["o_custkey"].tolist()
        from searchengine_ray.pipelines.fulltext import round_half_away
        assert got["revenue_r"].tolist() == [
            round_half_away(float(r) / 10000.0, 2) for r in byc["rev"]]

    def test_planted_topk_tiebreak(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q10_returned_revenue

        base = pd.Timestamp("1996-02-01")
        # 25 customers, all the SAME revenue — the top-20 cut must take the
        # 20 smallest custkeys (exact-integer tiebreak, not arrival order)
        n = 25
        pd.DataFrame({
            "o_orderkey": range(1, n + 1),
            "o_custkey": range(101, 101 + n),
            "o_orderdate": [base] * n,
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        pd.DataFrame({
            "l_orderkey": range(1, n + 1),
            "l_returnflag": ["R"] * n,
            "l_extendedprice": [100.0] * n,
            "l_discount": [0.0] * n,
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        pd.DataFrame({
            "c_custkey": range(101, 101 + n),
            "c_name": [f"cust-{k}" for k in range(101, 101 + n)],
            "c_nationkey": [0] * n,
        }).to_parquet(f"{tmp_path}/customer.parquet", index=False)
        pd.DataFrame({"n_nationkey": [0], "n_name": ["ZERO"]}).to_parquet(
            f"{tmp_path}/nation.parquet", index=False)
        got = q10_returned_revenue(str(tmp_path)).to_pandas()
        assert got["c_custkey"].tolist() == list(range(101, 121))
        assert got["c_name"].tolist() == [f"cust-{k}" for k in range(101, 121)]
        assert set(got["n_name"]) == {"ZERO"}
        # 10000 cents × 100 hundredths = 10⁶ exact units; /10⁴ → dollars
        assert set(got["revenue_r"]) == {100.0}

    def test_empty_window(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q10_returned_revenue

        pd.DataFrame({
            "o_orderkey": [1],
            "o_custkey": [7],
            "o_orderdate": [pd.Timestamp("1990-01-01")],  # outside window
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        pd.DataFrame({
            "l_orderkey": [1],
            "l_returnflag": ["R"],
            "l_extendedprice": [100.0],
            "l_discount": [0.0],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = q10_returned_revenue(str(tmp_path)).to_pandas()
        assert len(got) == 0


class TestUserEventPaths:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import user_event_paths

        ev = pq.read_table(
            f"{SF}/events.parquet",
            columns=["event_id", "user_id", "ts", "event_type"],
        ).to_pandas().sort_values(["user_id", "ts", "event_id"])
        ev = ev[ev["event_type"].notna()]  # the engine/oracle drop nulls
        ref = ev.groupby("user_id").agg(
            n_events=("event_type", "size"),
            path=("event_type", ",".join)).reset_index()
        got = (user_event_paths(SF).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        assert got["user_id"].tolist() == ref["user_id"].tolist()
        assert got["n_events"].tolist() == ref["n_events"].tolist()
        assert got["path"].tolist() == ref["path"].tolist()

    def test_order_and_null_semantics(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import user_event_paths

        t0 = pd.Timestamp("2026-01-01")
        pd.DataFrame({
            # same ts for events 2,3 → event_id breaks the tie; the null
            # type drops without dropping the user
            "event_id": [3, 2, 1, 9],
            "user_id": [7, 7, 7, 7],
            "ts": [t0 + pd.Timedelta(seconds=5)] * 2 + [t0, t0],
            "event_type": ["c", "b", "a", None],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = user_event_paths(str(tmp_path)).to_pandas()
        assert got["path"].tolist() == ["a,b,c"]
        assert got["n_events"].tolist() == [3]


class TestModeEventType:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import mode_event_type

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "event_type"]).to_pandas()
        c = ev.groupby(["user_id", "event_type"], as_index=False).size()
        ref = (c.sort_values(["user_id", "size", "event_type"],
                             ascending=[True, False, True])
               .drop_duplicates("user_id"))
        got = (mode_event_type(SF).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        assert got["user_id"].tolist() == ref["user_id"].tolist()
        assert got["mode_type"].tolist() == ref["event_type"].tolist()
        assert got["n_mode"].tolist() == ref["size"].tolist()

    def test_tie_breaks_lexicographically(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import mode_event_type

        pd.DataFrame({
            "user_id": [1, 1, 1, 1, 2, 2],
            # user 1: 2×"z", 2×"a" → tie → "a"; user 2: "b" wins outright
            "event_type": ["z", "a", "z", "a", "b", "b"],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = (mode_event_type(str(tmp_path)).to_pandas()
               .sort_values("user_id"))
        assert got["mode_type"].tolist() == ["a", "b"]
        assert got["n_mode"].tolist() == [2, 2]

    def test_cross_batch_counts_combine(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import mode_event_type

        # one user, 30k rows: "rare" leads inside any single batch slice
        # only if partials fail to combine — "common" must win globally
        n = 30000
        types = ["common"] * (n // 2 + 1) + ["rare"] * (n // 2 - 1)
        pd.DataFrame({
            "user_id": [5] * n,
            "event_type": types,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = mode_event_type(str(tmp_path)).to_pandas()
        assert got["mode_type"].tolist() == ["common"]
        assert got["n_mode"].tolist() == [n // 2 + 1]


class TestQ16SupplierVariety:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q16_EXCL_BRAND,
            Q16_SIZES,
            q16_supplier_variety,
        )

        part = pq.read_table(
            f"{SF}/part.parquet",
            columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
        li = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey"]).to_pandas()
        sup = pq.read_table(
            f"{SF}/supplier.parquet",
            columns=["s_suppkey", "s_acctbal"]).to_pandas()
        excl = set(sup.loc[sup["s_acctbal"] < 0, "s_suppkey"])
        part = part[part["p_size"].isin(Q16_SIZES)
                    & (part["p_brand"] != Q16_EXCL_BRAND)]
        li = li[~li["l_suppkey"].isin(excl)]
        j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
        ref = (j.groupby(["p_brand", "p_size"])["l_suppkey"].nunique()
               .reset_index().sort_values(["p_brand", "p_size"]))
        got = q16_supplier_variety(SF).to_pandas()
        assert got["p_brand"].tolist() == ref["p_brand"].tolist()
        assert got["p_size"].tolist() == ref["p_size"].tolist()
        assert got["supplier_cnt"].tolist() == ref["l_suppkey"].tolist()

    def test_planted_distinct_and_exclusion(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q16_supplier_variety

        pd.DataFrame({
            "p_partkey": [1, 2, 3],
            "p_brand": ["Brand#1", "Brand#1", "Brand#13"],  # #13 excluded
            "p_size": [1, 1, 1],
        }).to_parquet(f"{tmp_path}/part.parquet", index=False)
        pd.DataFrame({
            # supplier 10 ships part 1 THREE times and part 2 once → still
            # one distinct supplier per family; supplier 66 (complaint) and
            # the excluded-brand part never count
            "l_partkey": [1, 1, 1, 2, 1, 3],
            "l_suppkey": [10, 10, 10, 10, 66, 20],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        pd.DataFrame({
            "s_suppkey": [10, 20, 66],
            "s_acctbal": [5.0, 5.0, -1.0],
        }).to_parquet(f"{tmp_path}/supplier.parquet", index=False)
        got = q16_supplier_variety(str(tmp_path)).to_pandas()
        # parts 1 and 2 are ONE (brand, size) family; supplier 10's four
        # shipments across them count once
        assert got["p_brand"].tolist() == ["Brand#1"]
        assert got["p_size"].tolist() == [1]
        assert got["supplier_cnt"].tolist() == [1]


class TestHourlyGapFill:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import hourly_gap_fill

        HOUR = 3_600_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "event_type"]).to_pandas()
        ev = ev[ev["event_type"].notna()]
        h = (ev["ts"].astype("datetime64[us]").astype(np.int64)
             // HOUR) * HOUR
        c = (pd.DataFrame({"t": ev["event_type"], "h": h})
             .groupby(["t", "h"]).size())
        hours = range(int(h.min()), int(h.max()) + HOUR, HOUR)
        got = hourly_gap_fill(SF).to_pandas()
        types = sorted(ev["event_type"].unique())
        assert len(got) == len(types) * len(list(hours))
        m = {(t, hh): n for t, hh, n in zip(got["event_type"],
                                            got["hour_us"],
                                            got["n_events"])}
        for t in types:
            for hh in hours:
                assert m[(t, hh)] == c.get((t, hh), 0)

    def test_planted_gaps(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import hourly_gap_fill

        t0 = pd.Timestamp("2026-01-01 00:30:00")
        pd.DataFrame({
            # type "a" at hours 0 and 3 (hours 1,2 are GAPS); type "b"
            # only at hour 1 → zeros at 0, 2, 3
            "ts": [t0, t0 + pd.Timedelta(hours=3), t0 + pd.Timedelta(hours=1)],
            "event_type": ["a", "a", "b"],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = hourly_gap_fill(str(tmp_path)).to_pandas()
        assert len(got) == 8  # 2 types × 4 hours
        a = got[got["event_type"] == "a"].sort_values("hour_us")
        b = got[got["event_type"] == "b"].sort_values("hour_us")
        assert a["n_events"].tolist() == [1, 0, 0, 1]
        assert b["n_events"].tolist() == [0, 1, 0, 0]


    def test_all_null_types_empty(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import hourly_gap_fill

        pd.DataFrame({
            "ts": [pd.Timestamp("2026-01-01")] * 3,
            "event_type": pd.Series([None, None, None], dtype=object),
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = hourly_gap_fill(str(tmp_path)).to_pandas()
        assert len(got) == 0  # the oracle returns zero rows too


class TestCosineShingleJoin:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.dedup import (
            cosine_shingle_join,
            word_shingle_array,
        )

        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        sets = {int(d): set(word_shingle_array(t or "").tolist())
                for d, t in zip(docs["doc_id"], docs["text"])}
        # df-cap the space exactly as the operator defines it
        from collections import Counter
        df = Counter(g for s in sets.values() for g in s)
        sets = {d: {g for g in s if df[g] <= 64} for d, s in sets.items()}
        from searchengine_ray.pipelines.fulltext import round_half_away

        ids = sorted(d for d, s in sets.items() if s)
        ref = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                c = len(sets[a] & sets[b])
                if c and 4 * c * c >= len(sets[a]) * len(sets[b]):
                    # half-away-from-zero, like the engine/oracle (Python
                    # round() is banker's and differs on exact halves)
                    ref[(a, b)] = round_half_away(
                        c / np.sqrt(float(len(sets[a]) * len(sets[b]))), 4)
        got = cosine_shingle_join(SF).to_pandas()
        m = {(int(a), int(b)): r for a, b, r in
             zip(got["doc_a"], got["doc_b"], got["cosine_r"])}
        assert set(m) == set(ref)
        for k in ref:
            assert abs(m[k] - ref[k]) < 1e-9

    def test_exact_boundary_kept(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.dedup import cosine_shingle_join

        pd.DataFrame({
            # A and B: 2 shingles each, share exactly 1 → cosine exactly
            # 0.5 (4·1 ≥ 2·2 holds with equality) — the ≥ gate keeps it
            "doc_id": [1, 2],
            "text": ["w1 w2 w3 w4", "w1 w2 w3 x4"],
        }).to_parquet(f"{tmp_path}/documents.parquet", index=False)
        got = cosine_shingle_join(str(tmp_path)).to_pandas()
        assert got["doc_a"].tolist() == [1]
        assert got["doc_b"].tolist() == [2]
        assert got["cosine_r"].tolist() == [0.5]

    def test_df_cap_excludes_hot_shingles(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.dedup import cosine_shingle_join

        # every doc shares one hot shingle; with df_cap=1 the hot shingle
        # leaves the space entirely, so NO pair can form
        pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["hot one two", "hot one two", "hot one two"],
        }).to_parquet(f"{tmp_path}/documents.parquet", index=False)
        got = cosine_shingle_join(str(tmp_path), df_cap=1).to_pandas()
        assert len(got) == 0
        # and with the default cap the identical docs pair at cosine 1.0
        got2 = cosine_shingle_join(str(tmp_path)).to_pandas()
        assert len(got2) == 3  # all three pairs of identical docs
        assert set(got2["cosine_r"]) == {1.0}


class TestQ22GlobalBalance:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q22_CUTOFF_US,
            q22_global_balance,
        )

        cust = pq.read_table(
            f"{SF}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal"]).to_pandas()
        orders = pq.read_table(
            f"{SF}/orders.parquet",
            columns=["o_custkey", "o_orderdate"]).to_pandas()
        ci = np.rint(cust["c_acctbal"] * 100).astype(np.int64)
        pos = ci[ci > 0]
        s, n = int(pos.sum()), len(pos)
        mask = (ci.to_numpy(dtype=np.int64) * n) > s
        el = cust[mask].copy()
        el["cents"] = ci[mask]
        od_us = orders["o_orderdate"].astype("datetime64[us]").astype(np.int64)
        recent = set(orders.loc[od_us >= Q22_CUTOFF_US, "o_custkey"])
        el = el[~el["c_custkey"].isin(recent)]
        ref = el.groupby("c_nationkey").agg(
            n_cust=("c_custkey", "size"), cents=("cents", "sum")).reset_index()
        got = q22_global_balance(SF).to_pandas().sort_values("c_nationkey")
        assert got["c_nationkey"].tolist() == sorted(ref["c_nationkey"])
        ref = ref.sort_values("c_nationkey")
        assert got["n_cust"].tolist() == ref["n_cust"].tolist()
        from searchengine_ray.pipelines.fulltext import round_half_away
        assert got["total_bal_r"].tolist() == [
            round_half_away(float(c) / 100.0, 2) for c in ref["cents"]]

    def test_planted_gate_and_anti_join(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q22_global_balance

        pd.DataFrame({
            # all four balances are positive → avg = 225; only the two
            # 300s pass the STRICT > gate; customer 3 (dormant) counts,
            # customer 4 (recent order) does not
            "c_custkey": [1, 2, 3, 4],
            "c_nationkey": [7, 7, 7, 7],
            "c_acctbal": [100.0, 200.0, 300.0, 300.0],
        }).to_parquet(f"{tmp_path}/customer.parquet", index=False)
        pd.DataFrame({
            "o_custkey": [3, 4],
            "o_orderdate": [pd.Timestamp("1999-06-01"),   # pre-cutoff
                            pd.Timestamp("2000-06-01")],  # recent
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        got = q22_global_balance(str(tmp_path)).to_pandas()
        assert got["c_nationkey"].tolist() == [7]
        assert got["n_cust"].tolist() == [1]
        assert got["total_bal_r"].tolist() == [300.0]

    def test_no_positive_balances_empty(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q22_global_balance

        pd.DataFrame({
            "c_custkey": [1],
            "c_nationkey": [0],
            "c_acctbal": [-5.0],
        }).to_parquet(f"{tmp_path}/customer.parquet", index=False)
        pd.DataFrame({
            "o_custkey": pd.Series([], dtype=np.int64),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        got = q22_global_balance(str(tmp_path)).to_pandas()
        assert len(got) == 0


class TestInterpQuantiles:
    def test_matches_numpy_linear(self, ray_session):
        from searchengine_ray.pipelines.relational import interp_quantiles

        v = pq.read_table(f"{SF}/events.parquet",
                          columns=["value"]).to_pandas()["value"]
        v = np.sort(v.dropna().to_numpy(dtype=np.float64))
        got = interp_quantiles(SF).to_pandas()
        from searchengine_ray.pipelines.fulltext import round_half_away
        for q, val in zip(got["q"], got["value_r"]):
            h = q * (len(v) - 1)
            f = int(np.floor(h))
            frac = h - f
            ref = (v[f] if frac == 0.0
                   else v[f] * (1.0 - frac) + v[f + 1] * frac)
            assert val == round_half_away(float(ref), 4)

    def test_planted_midpoint(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import interp_quantiles

        pd.DataFrame({
            # n=4 values: q=0.5 → h=1.5 → midpoint of 20 and 30 = 25
            # (quantile_disc would answer 20 or 30, never 25)
            "value": [10.0, 20.0, 30.0, 40.0],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = interp_quantiles(str(tmp_path), qs=(0.5,)).to_pandas()
        assert got["value_r"].tolist() == [25.0]

    def test_exact_rank_no_interpolation(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import interp_quantiles

        pd.DataFrame({
            # n=5, q=0.25 → h=1.0 exactly → the rank-2 element, untouched
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = interp_quantiles(str(tmp_path), qs=(0.25,)).to_pandas()
        assert got["value_r"].tolist() == [2.0]


    def test_all_null_returns_null_rows(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            exact_quantiles,
            interp_quantiles,
        )

        pd.DataFrame({
            "value": pd.Series([None, None], dtype=np.float64),
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        # SQL's quantile_* over no non-NULL rows is NULL per target, not
        # an absent row — the engine mirrors the UNION-of-scalars shape
        gi = interp_quantiles(str(tmp_path), qs=(0.5, 0.9)).to_pandas()
        assert gi["q"].tolist() == [0.5, 0.9]
        assert gi["value_r"].isna().all()
        ge = exact_quantiles(str(tmp_path), qs=(0.5,)).to_pandas()
        assert ge["q"].tolist() == [0.5]
        assert ge["value"].isna().all()


class TestWeightedSample:
    @staticmethod
    def _ref_keys(ids, w):
        import hashlib
        h13 = np.array([int(hashlib.md5(b"%d" % i).hexdigest()[:13], 16)
                        for i in ids], dtype=np.int64)
        return np.log((h13 + 1) / float(1 << 52)) / w

    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.traindata import weighted_sample

        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "n_chars"]).to_pandas()
        docs = docs[docs["n_chars"] > 0]
        key = self._ref_keys(docs["doc_id"].to_numpy(dtype=np.int64),
                             docs["n_chars"].to_numpy(dtype=np.int64))
        docs = docs.assign(key=key).sort_values(
            ["key", "doc_id"], ascending=[False, True]).head(64)
        got = weighted_sample(SF).to_pandas()
        assert got["doc_id"].tolist() == docs["doc_id"].tolist()
        assert got["n_chars"].tolist() == docs["n_chars"].tolist()
        assert got["sample_rank"].tolist() == list(range(1, 65))

    def test_zero_weight_never_sampled_and_deterministic(
            self, ray_session, tmp_path):
        from searchengine_ray.pipelines.traindata import weighted_sample

        pd.DataFrame({
            "doc_id": range(100),
            "n_chars": [0] * 50 + [10] * 50,  # half unsampleable
        }).to_parquet(f"{tmp_path}/documents.parquet", index=False)
        a = weighted_sample(str(tmp_path), k=10).to_pandas()
        b = weighted_sample(str(tmp_path), k=10).to_pandas()
        assert (a["doc_id"] >= 50).all()  # zero-weight docs never drawn
        assert a["doc_id"].tolist() == b["doc_id"].tolist()  # key-stable

    def test_heavy_weight_dominates(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.traindata import weighted_sample

        ids = np.arange(1000, dtype=np.int64)
        w = np.ones(1000, dtype=np.int64)
        w[777] = 1_000_000_000  # key = ln(u)/1e9 ≈ 0⁻ beats every w=1 key
        # confirm via the exact formula (no probabilistic assumption)
        key = self._ref_keys(ids, w)
        assert np.argmax(key) == 777
        pd.DataFrame({"doc_id": ids, "n_chars": w}).to_parquet(
            f"{tmp_path}/documents.parquet", index=False)
        got = weighted_sample(str(tmp_path), k=5).to_pandas()
        assert got.loc[got["sample_rank"] == 1, "doc_id"].tolist() == [777]


class TestEmbeddingDimStats:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.similarity import embedding_dim_stats

        emb = pq.read_table(f"{SF}/embeddings.parquet",
                            columns=["embedding"])["embedding"]
        m = np.array(emb.to_pylist(), dtype=np.float64)
        got = embedding_dim_stats(SF).to_pandas()
        assert got["dim"].tolist() == list(range(1, m.shape[1] + 1))
        assert (got["n_vecs"] == m.shape[0]).all()
        assert np.allclose(got["mean_r"], np.round(m.mean(axis=0), 4),
                           atol=1e-4)
        assert np.allclose(got["std_r"], np.round(m.std(axis=0), 4),
                           atol=1e-4)

    def test_planted_constant_dim(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.similarity import embedding_dim_stats

        pd.DataFrame({
            "vec_id": [1, 2, 3, 4],
            # dim 1 constant (std 0); dim 2 = ±1 (mean 0, std 1)
            "embedding": [[5.0, 1.0], [5.0, -1.0], [5.0, 1.0], [5.0, -1.0]],
        }).to_parquet(f"{tmp_path}/embeddings.parquet", index=False)
        got = embedding_dim_stats(str(tmp_path)).to_pandas()
        assert got["mean_r"].tolist() == [5.0, 0.0]
        assert got["std_r"].tolist() == [0.0, 1.0]
        assert got["n_vecs"].tolist() == [4, 4]


    def test_null_embeddings_dropped(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.similarity import embedding_dim_stats

        t = pa.table({
            "vec_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "embedding": pa.array([[1.0, 2.0], [3.0, 4.0], None, None],
                                  type=pa.list_(pa.float32())),
        })
        pq.write_table(t, f"{tmp_path}/embeddings.parquet")
        got = embedding_dim_stats(str(tmp_path)).to_pandas()
        # nulls drop like the oracle's unnest: 2 vectors, dims [1, 2]
        assert got["dim"].tolist() == [1, 2]
        assert got["n_vecs"].tolist() == [2, 2]
        assert got["mean_r"].tolist() == [2.0, 3.0]


class TestImageResize:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.multimodal import image_resize

        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        ref = {}
        for d, t in zip(docs["doc_id"], docs["text"]):
            b = (t or "").encode("utf-8")
            h_in = len(b) // 16
            if h_in < 1:
                continue
            # independent per-pixel reference: explicit 2-D image slicing
            # (NOT the kernel's flat-index expression) — row i of the
            # thumbnail reads source row floor(i·h_in/8), col floor(j·16/8)
            rows = [b[r * 16:(r + 1) * 16] for r in range(h_in)]
            out = bytearray()
            for i in range(8):
                src_row = rows[(i * h_in) // 8]
                for j in range(8):
                    out.append(src_row[(j * 16) // 8])
            ref[int(d)] = (h_in, bytes(out).hex())
        got = image_resize(SF).to_pandas()
        assert len(got) == len(ref)
        for mid, h_in, hx in zip(got["media_id"], got["h_in"],
                                 got["resized_hex"]):
            assert ref[int(mid)] == (h_in, hx)

    def test_planted_thumbnail(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.multimodal import image_resize

        # 32 ascii bytes = a 2×16 image; the 8×8 thumbnail samples rows
        # (i·2)//8 = [0,0,0,0,1,1,1,1] and cols (j·16)//8 = 0,2,...,14
        text = "ABCDEFGHIJKLMNOPabcdefghijklmnop"
        pd.DataFrame({"doc_id": [1, 2],
                      "text": [text, "short"]}).to_parquet(
            f"{tmp_path}/documents.parquet", index=False)
        got = image_resize(str(tmp_path)).to_pandas()
        assert got["media_id"].tolist() == [1]  # 5 bytes: no image
        assert got["h_in"].tolist() == [2]
        row0 = "ACEGIKMO".encode().hex()
        row1 = "acegikmo".encode().hex()
        assert got["resized_hex"].tolist() == [row0 * 4 + row1 * 4]


class TestJsonlRoundtrip:
    def test_matches_original(self, ray_session):
        import hashlib

        from searchengine_ray.sources import jsonl_roundtrip

        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        got = (jsonl_roundtrip(SF).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert got["doc_id"].tolist() == sorted(docs["doc_id"])
        ref = {int(d): hashlib.md5((t or "").encode()).hexdigest()
               for d, t in zip(docs["doc_id"], docs["text"])}
        assert all(ref[int(d)] == fp
                   for d, fp in zip(got["doc_id"], got["fp_rt"]))

    def test_adversarial_content_survives(self, ray_session, tmp_path):
        import hashlib

        from searchengine_ray.sources import jsonl_roundtrip

        texts = ['quote " and \\ backslash',
                 "юникод кириллица 漢字 🚀",
                 "tab\tand newline\nand   ls",
                 ""]
        pd.DataFrame({"doc_id": range(4), "text": texts}).to_parquet(
            f"{tmp_path}/documents.parquet", index=False)
        got = (jsonl_roundtrip(str(tmp_path)).to_pandas()
               .sort_values("doc_id"))
        assert got["fp_rt"].tolist() == [
            hashlib.md5(t.encode()).hexdigest() for t in texts]
        assert got["n_chars_rt"].tolist() == [len(t) for t in texts]


    def test_csv_leg_adversarial(self, ray_session, tmp_path):
        import hashlib

        from searchengine_ray.sources import csv_roundtrip

        # newlines exercise newlines_in_values across multi-block shards;
        # numeric/datetime/NaN-looking text exercises the pinned schema
        # (per-shard inference would return int64/timestamp/null columns)
        texts = (['comma, and "quotes"', "юникод 🚀", "tab\tchar", "",
                  "multi\nline\ndoc", "123456", "2026-01-01T00:00:00",
                  "NaN"]
                 + [f"filler {i} " * 50 for i in range(3000)])
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(
            f"{tmp_path}/documents.parquet", index=False)
        got = (csv_roundtrip(str(tmp_path)).to_pandas()
               .sort_values("doc_id"))
        # CSV collapses '' to null; both sides coalesce, so the empty doc
        # fingerprints identically
        assert got["fp_rt"].tolist() == [
            hashlib.md5(t.encode()).hexdigest() for t in texts]
        assert got["n_chars_rt"].tolist() == [len(t) for t in texts]


class TestQ6ForecastRevenue:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q6_FROM_US, Q6_TO_US, q6_forecast_revenue)

        li = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_shipdate", "l_discount", "l_quantity",
                     "l_extendedprice"]).to_pandas()
        ship = li["l_shipdate"].astype("int64")
        di = np.rint(li["l_discount"].to_numpy() * 100).astype(np.int64)
        m = ((ship >= Q6_FROM_US) & (ship < Q6_TO_US)
             & (di >= 5) & (di <= 7) & (li["l_quantity"] < 24))
        pi = np.rint(li["l_extendedprice"].to_numpy()[m] * 100).astype(np.int64)
        from searchengine_ray.pipelines.fulltext import round_half_away
        got = q6_forecast_revenue(SF).to_pandas().iloc[0]
        assert got["n_items"] == int(m.sum())
        assert got["revenue_r"] == round_half_away(
            float(int(np.sum(pi * di[m.to_numpy()]))) / 10_000.0, 2)

    def test_empty_window(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q6_forecast_revenue

        pd.DataFrame({
            "l_shipdate": pd.to_datetime(["1994-01-01"]).astype("datetime64[us]"),  # before window
            "l_discount": [0.06], "l_quantity": [5.0],
            "l_extendedprice": [100.0],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = q6_forecast_revenue(str(tmp_path)).to_pandas().iloc[0]
        assert (got["n_items"], got["revenue_r"]) == (0, 0.0)


class TestQ14PromoRevenue:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q14_FROM_US, Q14_TO_US, q14_promo_revenue)

        li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        part = pq.read_table(f"{SF}/part.parquet").to_pandas()
        promo = dict(zip(part["p_partkey"],
                         part["p_type"].str.startswith("PROMO")))
        ship = li["l_shipdate"].astype("int64")
        m = (ship >= Q14_FROM_US) & (ship < Q14_TO_US)
        sub = li[m & li["l_partkey"].isin(promo)]
        rev = (np.rint(sub["l_extendedprice"].to_numpy() * 100).astype(np.int64)
               * np.rint((1 - sub["l_discount"].to_numpy()) * 100).astype(np.int64))
        is_p = sub["l_partkey"].map(promo).to_numpy(dtype=bool)
        p, t = int(rev[is_p].sum()), int(rev.sum())
        from searchengine_ray.pipelines.fulltext import round_half_away
        got = q14_promo_revenue(SF).to_pandas().iloc[0]
        assert got["n_items"] == len(sub)
        assert got["promo_pct_r"] == (
            round_half_away(float(100 * p) / float(t), 6) if t else 0.0)

    def test_planted(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q14_promo_revenue

        pd.DataFrame({"p_partkey": [1, 2, 3],
                      "p_type": ["PROMO", "STANDARD", "PROMO_PLUS"],
                      }).to_parquet(f"{tmp_path}/part.parquet", index=False)
        pd.DataFrame({
            "l_partkey": [1, 2, 3, 9, 1],
            # partkey 9 has no part row → dropped by the inner join;
            # the last line ships outside the window
            "l_shipdate": pd.to_datetime(
                ["1995-09-10", "1995-09-10", "1995-09-10", "1995-09-10",
                 "1996-01-01"]).astype("datetime64[us]"),
            "l_extendedprice": [100.0, 100.0, 100.0, 100.0, 100.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0, 0.0],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = q14_promo_revenue(str(tmp_path)).to_pandas().iloc[0]
        assert got["n_items"] == 3
        # PROMO + PROMO_PLUS = 2 of 3 equal-revenue qualifying lines
        assert got["promo_pct_r"] == round(100 * 2 / 3, 6)


class TestQ15TopSupplier:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q15_FROM_US, Q15_TO_US, q15_top_supplier)

        li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        ship = li["l_shipdate"].astype("int64")
        sub = li[(ship >= Q15_FROM_US) & (ship < Q15_TO_US)].copy()
        sub["rev"] = (
            np.rint(sub["l_extendedprice"].to_numpy() * 100).astype(np.int64)
            * np.rint((1 - sub["l_discount"].to_numpy()) * 100).astype(np.int64))
        tot = sub.groupby("l_suppkey")["rev"].sum()
        best = tot.max()
        winners = sorted(int(k) for k, v in tot.items() if v == best)
        got = q15_top_supplier(SF).to_pandas()
        assert got["s_suppkey"].tolist() == winners
        from searchengine_ray.pipelines.fulltext import round_half_away
        assert got["total_revenue_r"].tolist() == [
            round_half_away(int(best) / 10_000.0, 2)] * len(winners)

    def test_ties_all_surface(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q15_top_supplier

        pd.DataFrame({"s_suppkey": [1, 2, 3],
                      "s_name": ["a", "b", "c"],
                      }).to_parquet(f"{tmp_path}/supplier.parquet", index=False)
        pd.DataFrame({
            "l_suppkey": [2, 1, 3],
            "l_shipdate": pd.to_datetime(["1996-02-01"] * 3).astype("datetime64[us]"),
            "l_extendedprice": [50.0, 50.0, 10.0],
            "l_discount": [0.0, 0.0, 0.0],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = q15_top_supplier(str(tmp_path)).to_pandas()
        assert got["s_suppkey"].tolist() == [1, 2]  # tie, suppkey order
        assert got["s_name"].tolist() == ["a", "b"]
        assert got["total_revenue_r"].tolist() == [50.0, 50.0]


class TestQ19DiscountedRevenue:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q19_BRANCHES, q19_discounted_revenue)

        li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        part = pq.read_table(f"{SF}/part.parquet").to_pandas()
        j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
        keep = np.zeros(len(j), dtype=bool)
        for brand, max_size, qlo, qhi in Q19_BRANCHES:
            keep |= ((j["p_brand"] == brand).to_numpy()
                     & (j["p_size"].to_numpy() >= 1)
                     & (j["p_size"].to_numpy() <= max_size)
                     & (j["l_quantity"].to_numpy() >= qlo)
                     & (j["l_quantity"].to_numpy() <= qhi))
        sub = j[keep]
        rev = int(np.sum(
            np.rint(sub["l_extendedprice"].to_numpy() * 100).astype(np.int64)
            * np.rint((1 - sub["l_discount"].to_numpy()) * 100).astype(np.int64)))
        from searchengine_ray.pipelines.fulltext import round_half_away
        got = q19_discounted_revenue(SF).to_pandas().iloc[0]
        assert got["n_items"] == int(keep.sum())
        assert got["revenue_r"] == round_half_away(rev / 10_000.0, 2)

    def test_branch_boundaries(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q19_discounted_revenue

        pd.DataFrame({
            "p_partkey": [1, 2, 3],
            "p_brand": ["Brand#12", "Brand#23", "Brand#12"],
            "p_size": [5, 11, 3],  # part 2: size 11 > branch-2 max 10
        }).to_parquet(f"{tmp_path}/part.parquet", index=False)
        pd.DataFrame({
            "l_partkey": [1, 1, 2, 3],
            # qty 11 hits branch-1's upper bound; 12 just misses it
            "l_quantity": [11.0, 12.0, 15.0, 1.0],
            "l_extendedprice": [100.0, 100.0, 100.0, 100.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = q19_discounted_revenue(str(tmp_path)).to_pandas().iloc[0]
        assert got["n_items"] == 2  # (1, qty 11) and (3, qty 1)
        assert got["revenue_r"] == 200.0


class TestQ7VolumeShipping:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q7_FROM_US, Q7_NATION_A, Q7_NATION_B, Q7_TO_US,
            q7_volume_shipping)

        nat = pq.read_table(f"{SF}/nation.parquet").to_pandas()
        nk = dict(zip(nat["n_name"], nat["n_nationkey"]))
        name = dict(zip(nat["n_nationkey"], nat["n_name"]))
        sup = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
        cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
        orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        pair = {nk[Q7_NATION_A], nk[Q7_NATION_B]}
        j = (li.merge(sup[["s_suppkey", "s_nationkey"]],
                      left_on="l_suppkey", right_on="s_suppkey")
               .merge(orders[["o_orderkey", "o_custkey"]],
                      left_on="l_orderkey", right_on="o_orderkey")
               .merge(cust[["c_custkey", "c_nationkey"]],
                      left_on="o_custkey", right_on="c_custkey"))
        ship = j["l_shipdate"].astype("int64")
        m = ((ship >= Q7_FROM_US) & (ship < Q7_TO_US)
             & j["s_nationkey"].isin(pair) & j["c_nationkey"].isin(pair)
             & (j["s_nationkey"] != j["c_nationkey"]))
        sub = j[m].copy()
        sub["rev"] = (
            np.rint(sub["l_extendedprice"].to_numpy() * 100).astype(np.int64)
            * np.rint((1 - sub["l_discount"].to_numpy()) * 100).astype(np.int64))
        sub["yr"] = sub["l_shipdate"].dt.year
        exp = (sub.groupby(["s_nationkey", "c_nationkey", "yr"])
               .agg(n=("rev", "size"), rev=("rev", "sum")).reset_index())
        exp["supp_nation"] = exp["s_nationkey"].map(name)
        exp["cust_nation"] = exp["c_nationkey"].map(name)
        exp = exp.sort_values(["supp_nation", "cust_nation", "yr"])
        got = q7_volume_shipping(SF).to_pandas()
        assert got["supp_nation"].tolist() == exp["supp_nation"].tolist()
        assert got["cust_nation"].tolist() == exp["cust_nation"].tolist()
        assert got["l_year"].tolist() == exp["yr"].tolist()
        assert got["n_items"].tolist() == exp["n"].tolist()
        from searchengine_ray.pipelines.fulltext import round_half_away
        assert got["revenue_r"].tolist() == [
            round_half_away(int(v) / 10_000.0, 2) for v in exp["rev"]]


class TestQ8MarketShare:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q8_FROM_US, Q8_NATION, Q8_PTYPE, Q8_REGION, Q8_TO_US,
            q8_market_share)

        nat = pq.read_table(f"{SF}/nation.parquet").to_pandas()
        reg = pq.read_table(f"{SF}/region.parquet").to_pandas()
        rk = set(reg.loc[reg["r_name"] == Q8_REGION, "r_regionkey"])
        region_nk = set(nat.loc[nat["n_regionkey"].isin(rk), "n_nationkey"])
        target_nk = set(nat.loc[nat["n_name"] == Q8_NATION, "n_nationkey"])
        part = pq.read_table(f"{SF}/part.parquet").to_pandas()
        pks = set(part.loc[part["p_type"] == Q8_PTYPE, "p_partkey"])
        sup = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
        cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
        orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        j = (li[li["l_partkey"].isin(pks)]
             .merge(sup[["s_suppkey", "s_nationkey"]],
                    left_on="l_suppkey", right_on="s_suppkey")
             .merge(orders[["o_orderkey", "o_custkey", "o_orderdate"]],
                    left_on="l_orderkey", right_on="o_orderkey")
             .merge(cust[["c_custkey", "c_nationkey"]],
                    left_on="o_custkey", right_on="c_custkey"))
        od = j["o_orderdate"].astype("int64")
        m = ((od >= Q8_FROM_US) & (od < Q8_TO_US)
             & j["c_nationkey"].isin(region_nk))
        sub = j[m].copy()
        sub["rev"] = (
            np.rint(sub["l_extendedprice"].to_numpy() * 100).astype(np.int64)
            * np.rint((1 - sub["l_discount"].to_numpy()) * 100).astype(np.int64))
        sub["yr"] = sub["o_orderdate"].dt.year
        sub["tgt"] = sub["s_nationkey"].isin(target_nk)
        got = q8_market_share(SF).to_pandas()
        from searchengine_ray.pipelines.fulltext import round_half_away
        exp_years = sorted(sub["yr"].unique())
        assert got["o_year"].tolist() == [int(y) for y in exp_years]
        for _, row in got.iterrows():
            s = sub[sub["yr"] == row["o_year"]]
            assert row["n_items"] == len(s)
            num = int(s.loc[s["tgt"], "rev"].sum())
            den = int(s["rev"].sum())
            assert row["mkt_share_r"] == round_half_away(
                float(num) / float(den), 6)


class TestPivotEvents:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            PIVOT_TYPES, pivot_events)

        ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
        got = (pivot_events(SF).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        assert got["user_id"].tolist() == sorted(ev["user_id"].unique())
        # one wide row per user; counts reconstruct the long table exactly
        for t in PIVOT_TYPES:
            exp = ev[ev["event_type"] == t].groupby("user_id").size()
            assert got.set_index("user_id")[f"n_{t}"].to_dict() == {
                int(u): int(exp.get(u, 0)) for u in got["user_id"]}
        from searchengine_ray.pipelines.fulltext import round_half_away
        vi = np.rint(ev["value"].to_numpy() * 10_000).astype(np.int64)
        exp_v = pd.Series(vi).groupby(ev["user_id"].to_numpy()).sum()
        for _, row in got.iterrows():
            assert row["sum_value_r"] == round_half_away(
                int(exp_v[row["user_id"]]) / 10_000.0, 4)

    def test_unknown_type_fails_loudly(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import pivot_events

        pd.DataFrame({
            "user_id": [1], "event_type": ["mystery"], "value": [1.0],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        with pytest.raises(Exception):  # pivot needs a declared column set
            pivot_events(str(tmp_path)).to_pandas()

    def test_zero_columns_planted(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import pivot_events

        pd.DataFrame({
            "user_id": [7, 7, 8],
            "event_type": ["click", "click", "view"],
            "value": [1.5, 2.25, -1.0],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = (pivot_events(str(tmp_path)).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        assert got["user_id"].tolist() == [7, 8]
        assert got["n_click"].tolist() == [2, 0]
        assert got["n_view"].tolist() == [0, 1]
        assert got["n_purchase"].tolist() == [0, 0]
        assert got["sum_value_r"].tolist() == [3.75, -1.0]


class TestJsonExtractStats:
    def test_matches_bruteforce(self, ray_session):
        import json as _json

        from searchengine_ray.pipelines.relational import json_extract_stats

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "props"]).to_pandas()
        rows = {}
        for et, p in zip(ev["event_type"], ev["props"]):
            try:
                kv = _json.loads(p).get("k")
            except (ValueError, TypeError, AttributeError):
                continue
            if isinstance(kv, int) and not isinstance(kv, bool):
                n, s = rows.get(et, (0, 0))
                rows[et] = (n + 1, s + kv)
        got = json_extract_stats(SF).to_pandas()
        assert got["event_type"].tolist() == sorted(rows)
        from searchengine_ray.pipelines.fulltext import round_half_away
        for _, r in got.iterrows():
            n, s = rows[r["event_type"]]
            assert (r["n_valid"], r["sum_k"]) == (n, s)
            assert r["avg_k_r"] == round_half_away(float(s) / n, 4)

    def test_json_semantics_gates(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import json_extract_stats

        pd.DataFrame({
            "event_type": ["a"] * 10,
            # only the integer rows count: floats, bools, numeric strings,
            # nulls, missing keys, malformed JSON and beyond-int64 all drop
            "props": ['{"k": 87}', '{"k": -3}', '{"k": 1.5}', '{"k": true}',
                      '{"k": "5"}', '{"k": null}', '{"x": 1}', 'not json',
                      None, '{"k": 9223372036854775808}'],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = json_extract_stats(str(tmp_path)).to_pandas()
        assert got["event_type"].tolist() == ["a"]
        assert got["n_valid"].tolist() == [2]
        assert got["sum_k"].tolist() == [84]
        assert got["avg_k_r"].tolist() == [42.0]

    def test_all_invalid_empty(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import json_extract_stats

        pd.DataFrame({
            "event_type": ["a", "b"],
            "props": ["nope", '{"k": "str"}'],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = json_extract_stats(str(tmp_path)).to_pandas()
        assert len(got) == 0


class TestSkylineOrders:
    @staticmethod
    def _dominated(p, d):
        """O(n²) brute-force dominance mask via numpy broadcast."""
        dom = ((p[:, None] <= p[None, :]) & (d[:, None] >= d[None, :])
               & ((p[:, None] < p[None, :]) | (d[:, None] > d[None, :])))
        return dom.any(axis=0)

    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import skyline_orders

        o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        got = (skyline_orders(SF).to_pandas()
               .sort_values(["o_orderpriority", "o_orderkey"])
               .reset_index(drop=True))
        exp_keys = []
        for pri, g in o.groupby("o_orderpriority"):
            p = np.rint(g["o_totalprice"].to_numpy() * 100).astype(np.int64)
            d = g["o_orderdate"].astype("int64").to_numpy()
            keep = ~self._dominated(p, d)
            exp_keys += [(pri, int(k)) for k in
                         sorted(g["o_orderkey"].to_numpy()[keep])]
        assert list(zip(got["o_orderpriority"], got["o_orderkey"])) == \
            sorted(exp_keys)
        # per-row values round-trip exactly
        by_key = o.set_index("o_orderkey")
        for _, r in got.iterrows():
            src = by_key.loc[r["o_orderkey"]]
            assert r["price_cents"] == int(
                np.rint(src["o_totalprice"] * 100))
            assert r["o_orderdate_us"] == int(
                pd.Timestamp(src["o_orderdate"]).value // 1000)

    def test_planted_ties_and_duplicates(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import skyline_orders

        # keys 1,2: identical (price, date) — both survive (no strict).
        # key 3: same price as 1/2, earlier date — dominated.
        # key 4: cheaper but earlier — survives (incomparable).
        # key 5: cheaper AND later than everything — dominates 1,2,3 but
        #        they differ in price... no: 5 dominates 4 too; only 5
        #        survives below unless prices differ — use a second
        #        priority class to isolate that case.
        pd.DataFrame({
            "o_orderkey": [1, 2, 3, 4, 10],
            "o_custkey": [1] * 5,
            "o_orderstatus": ["O"] * 5,
            "o_totalprice": [10.00, 10.00, 10.00, 5.00, 1.00],
            "o_orderdate": pd.to_datetime(
                ["2020-01-05", "2020-01-05", "2020-01-01", "2020-01-02",
                 "2020-06-01"]),
            "o_orderpriority": ["A", "A", "A", "A", "B"],
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        got = (skyline_orders(str(tmp_path)).to_pandas()
               .sort_values(["o_orderpriority", "o_orderkey"])
               .reset_index(drop=True))
        assert list(zip(got["o_orderpriority"], got["o_orderkey"])) == [
            ("A", 1), ("A", 2), ("A", 4), ("B", 10)]
        # epoch-µs regardless of the file's unit (pandas writes ns here)
        assert got["o_orderdate_us"].tolist() == [
            int(pd.Timestamp(d).value // 1000)
            for d in ["2020-01-05", "2020-01-05", "2020-01-02",
                      "2020-06-01"]]
        assert got["price_cents"].tolist() == [1000, 1000, 500, 100]

    def test_kernel_algebraic_merge(self):
        from searchengine_ray.pipelines.relational import _skyline_mask

        rng = np.random.RandomState(7)
        for _ in range(20):
            p = rng.randint(0, 30, size=200).astype(np.int64)
            d = rng.randint(0, 30, size=200).astype(np.int64)
            full = _skyline_mask(p, d)
            assert (full == ~self._dominated(p, d)).all()
            # skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B))
            a, b = np.arange(200) < 100, np.arange(200) >= 100
            ka = np.flatnonzero(a)[_skyline_mask(p[a], d[a])]
            kb = np.flatnonzero(b)[_skyline_mask(p[b], d[b])]
            cand = np.concatenate([ka, kb])
            merged = cand[_skyline_mask(p[cand], d[cand])]
            assert sorted(merged) == sorted(np.flatnonzero(full))


def _pagerank_bruteforce(edges, iters, scale, damp_num=85, damp_den=100):
    """The module recurrence in pure-Python ints over an explicit edge
    list [(src, dst)] — independent of the Ray/Arrow implementation."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: scale // n for v in nodes}
    base = (15 * scale) // (100 * n)
    for _ in range(iters):
        share = sum(r[v] for v in nodes if v not in outdeg) // n
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += r[s] // outdeg[s]
        r = {v: base + (damp_num * (inflow[v] + share)) // damp_den
             for v in nodes}
    return nodes, r


class TestPagerankPurchases:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.graph import (
            PR_ITERS, PR_SCALE, pagerank_purchases)

        o = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"]).to_pandas()
        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey", "l_suppkey"]).to_pandas()
        j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        edges = {(int(c) * 2, int(s) * 2 + 1)
                 for c, s in zip(j["o_custkey"], j["l_suppkey"])}
        nodes, r = _pagerank_bruteforce(edges, PR_ITERS, PR_SCALE)
        got = pagerank_purchases(SF)
        assert len(got) == len(nodes)
        for _, row in got.iterrows():
            node = int(row["key"]) * 2 + (row["entity"] == "supplier")
            assert row["entity"] == (
                "customer" if node % 2 == 0 else "supplier")
            assert int(row["rank_scaled"]) == r[node], node

    def test_planted_graph(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.graph import (
            PR_ITERS, PR_SCALE, pagerank_purchases)

        # customers 1,2,3 each bought from supplier 1; customer 3 also
        # from supplier 2 — supplier 1 must out-rank supplier 2, and the
        # duplicate (c1, s1) purchase must NOT double its edge weight
        pd.DataFrame({
            "o_orderkey": [10, 11, 12, 13, 14],
            "o_custkey": [1, 2, 3, 3, 1],
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        pd.DataFrame({
            "l_orderkey": [10, 11, 12, 13, 14],
            "l_suppkey": [1, 1, 1, 2, 1],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        edges = {(2, 3), (4, 3), (6, 3), (6, 5)}
        nodes, r = _pagerank_bruteforce(edges, PR_ITERS, PR_SCALE)
        got = pagerank_purchases(str(tmp_path))
        assert len(got) == 5
        by = {(e, int(k)): int(v) for e, k, v in zip(
            got["entity"], got["key"], got["rank_scaled"])}
        assert by[("supplier", 1)] == r[3]
        assert by[("supplier", 2)] == r[5]
        assert by[("supplier", 1)] > by[("supplier", 2)]
        # customers have no in-links: all mass from teleport + dangling
        assert by[("customer", 1)] == by[("customer", 2)] == r[2]

    def test_empty_graph(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.graph import pagerank_purchases

        pd.DataFrame({"o_orderkey": pd.array([], dtype="int64"),
                      "o_custkey": pd.array([], dtype="int64")}
                     ).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        pd.DataFrame({"l_orderkey": pd.array([], dtype="int64"),
                      "l_suppkey": pd.array([], dtype="int64")}
                     ).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = pagerank_purchases(str(tmp_path))
        assert len(got) == 0
        assert list(got.columns) == ["entity", "key", "rank_scaled"]


class TestSupplierAffinity:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.graph import supplier_affinity

        o = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"]).to_pandas()
        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey", "l_suppkey"]).to_pandas()
        e = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
             [["o_custkey", "l_suppkey"]].drop_duplicates())
        m = e.merge(e, on="o_custkey")
        m = m[m["l_suppkey_x"] < m["l_suppkey_y"]]
        exp = (m.groupby(["l_suppkey_x", "l_suppkey_y"], as_index=False)
               .size()
               .sort_values(["size", "l_suppkey_x", "l_suppkey_y"],
                            ascending=[False, True, True], kind="stable")
               .head(20))
        got = supplier_affinity(SF)
        assert got["supp_a"].tolist() == exp["l_suppkey_x"].tolist()
        assert got["supp_b"].tolist() == exp["l_suppkey_y"].tolist()
        assert got["n_customers"].tolist() == exp["size"].tolist()

    def test_planted_dedup_and_tiebreak(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.graph import supplier_affinity

        # customer 1 buys from suppliers 1,2 TWICE (two orders — the
        # duplicate edge must count once); customer 2 buys from 1,2 and
        # 3,4; customer 3 buys from 3,4 → pairs (1,2) and (3,4) both have
        # n=2, ties broken to the smaller pair first
        pd.DataFrame({
            "o_orderkey": [10, 11, 12, 13, 14],
            "o_custkey": [1, 1, 2, 2, 3],
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        pd.DataFrame({
            "l_orderkey": [10, 10, 11, 11, 12, 12, 13, 13, 14, 14],
            "l_suppkey": [1, 2, 1, 2, 1, 2, 3, 4, 3, 4],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = supplier_affinity(str(tmp_path), k=2)
        assert list(zip(got["supp_a"], got["supp_b"],
                        got["n_customers"])) == [(1, 2, 2), (3, 4, 2)]

    def test_empty(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.graph import supplier_affinity

        pd.DataFrame({"o_orderkey": pd.array([], dtype="int64"),
                      "o_custkey": pd.array([], dtype="int64")}
                     ).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        pd.DataFrame({"l_orderkey": pd.array([], dtype="int64"),
                      "l_suppkey": pd.array([], dtype="int64")}
                     ).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = supplier_affinity(str(tmp_path))
        assert len(got) == 0
        assert list(got.columns) == ["supp_a", "supp_b", "n_customers"]

    def test_hot_customer_split_parity(self, ray_session, tmp_path):
        """Adversarial one-customer-buys-everything: customer 1's degree
        (20 suppliers) blows past a forced degree_cap=3, so its pairs go
        through the grid-cell deferral; light customers share some of the
        same pairs, so deferred and direct partials must total correctly.
        The output must be identical to the pure-direct path (huge cap)
        and to brute force."""
        from searchengine_ray.pipelines.graph import supplier_affinity

        orders, items = [], []
        orders.append({"o_orderkey": 100, "o_custkey": 1})
        for s in range(1, 21):  # hot: customer 1 buys suppliers 1..20
            items.append({"l_orderkey": 100, "l_suppkey": s})
        for c in range(2, 8):  # light: customer c buys {c, c+1, c+2}
            orders.append({"o_orderkey": 100 + c, "o_custkey": c})
            for s in (c, c + 1, c + 2):
                items.append({"l_orderkey": 100 + c, "l_suppkey": s})
        pd.DataFrame(orders).to_parquet(f"{tmp_path}/orders.parquet",
                                        index=False)
        pd.DataFrame(items).to_parquet(f"{tmp_path}/lineitem.parquet",
                                       index=False)

        e = pd.DataFrame([(o["o_custkey"], i["l_suppkey"])
                          for o in orders for i in items
                          if i["l_orderkey"] == o["o_orderkey"]],
                         columns=["c", "s"]).drop_duplicates()
        m = e.merge(e, on="c")
        m = m[m["s_x"] < m["s_y"]]
        exp = (m.groupby(["s_x", "s_y"], as_index=False).size()
               .sort_values(["size", "s_x", "s_y"],
                            ascending=[False, True, True], kind="stable")
               .head(50))
        hot = supplier_affinity(str(tmp_path), k=50, degree_cap=3)
        direct = supplier_affinity(str(tmp_path), k=50, degree_cap=1 << 40)
        for got in (hot, direct):
            assert got["supp_a"].tolist() == exp["s_x"].tolist()
            assert got["supp_b"].tolist() == exp["s_y"].tolist()
            assert got["n_customers"].tolist() == exp["size"].tolist()

    def test_stage1_cell_bound_by_construction(self):
        """No Ray: drive the stage-1 splitter directly and assert the
        per-task bound — every deferred cell carries ≤ cap suppliers per
        side (so stage-2 pair work per cell ≤ cap²), the cell count is
        exactly the ⌈d/cap⌉-triangle number, and the salted q values
        spread cells over multiple partitions."""
        from searchengine_ray.pipelines.graph import (
            _affinity_resolve,
            _affinity_stage1,
        )

        cap, d = 16, 1000  # one customer, degree 1000
        df = pd.DataFrame({"c": np.zeros(d, dtype=np.int64),
                           "s": np.arange(d, dtype=np.int64)})
        t = _affinity_stage1(df, cap)
        assert t["tag"].to_pandas().eq(1).all()  # no direct rows
        g = int(np.ceil(d / cap))
        assert len(t) == g * (g + 1) // 2
        sa, sb = t["sa"].to_pylist(), t["sb"].to_pylist()
        for a, b in zip(sa, sb):
            assert len(a) <= cap
            assert b is None or len(b) <= cap
        assert t["q"].to_pandas().nunique() > 8  # salt spreads the cells

        # resolving every cell reproduces the exact C(d, 2) pair multiset
        out = _affinity_resolve(t).to_pandas().groupby(
            "k", as_index=False)["n"].sum()
        assert len(out) == d * (d - 1) // 2
        assert out["n"].eq(1).all()

    def test_stage1_mixed_light_and_hot(self):
        """Light rows combine map-side (tag 0) while hot rows defer; the
        resolved union must equal the brute-force pair multiset."""
        from searchengine_ray.pipelines.graph import (
            _affinity_resolve,
            _affinity_stage1,
            _PAIR_SHIFT,
        )

        df = pd.DataFrame({
            "c": [1, 1, 1, 1, 1, 2, 2, 3, 3, 3],
            "s": [10, 11, 12, 13, 14, 10, 11, 10, 11, 12],
        })
        t = _affinity_stage1(df, 2)  # customer 1 (d=5) and 3 (d=3) are hot
        tags = t["tag"].to_pandas()
        assert (tags == 0).sum() == 1  # customer 2's single pair, combined
        out = _affinity_resolve(t).to_pandas().groupby(
            "k", as_index=False)["n"].sum()
        m = df.merge(df, on="c")
        m = m[m["s_x"] < m["s_y"]]
        exp = m.groupby(["s_x", "s_y"], as_index=False).size()
        exp["k"] = (exp["s_x"].to_numpy(dtype=np.int64) << _PAIR_SHIFT) \
            | exp["s_y"].to_numpy(dtype=np.int64)
        merged = out.merge(exp[["k", "size"]], on="k", how="outer")
        assert len(merged) == len(exp)
        assert (merged["n"] == merged["size"]).all()


class TestPurchaseHops:
    @staticmethod
    def _bfs(edges, seed):
        """Plain-Python BFS over undirected [(a, b)] from seed."""
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        dist = {seed: 0}
        frontier = [seed]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            frontier = nxt
        return dist

    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.graph import purchase_hops

        o = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"]).to_pandas()
        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey", "l_suppkey"]).to_pandas()
        j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        edges = {(int(c) * 2, int(s) * 2 + 1)
                 for c, s in zip(j["o_custkey"], j["l_suppkey"])}
        dist = self._bfs(edges, 1)  # supplier 0 → node 1
        got = purchase_hops(SF)
        assert len(got) == len(dist)
        for _, r in got.iterrows():
            node = int(r["key"]) * 2 + (r["entity"] == "supplier")
            assert int(r["hops"]) == dist[node], node

    def test_planted_path_and_unreachable(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.graph import purchase_hops

        # s0 -- c1 -- s1 -- c2 -- s2 is a path; (c9, s9) is a separate
        # component and must NOT appear in the output
        pd.DataFrame({
            "o_orderkey": [10, 11, 12, 13, 14],
            "o_custkey": [1, 1, 2, 2, 9],
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        pd.DataFrame({
            "l_orderkey": [10, 11, 12, 13, 14],
            "l_suppkey": [0, 1, 1, 2, 9],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = purchase_hops(str(tmp_path))
        rows = {(e, int(k)): int(h) for e, k, h in
                zip(got["entity"], got["key"], got["hops"])}
        assert rows == {("supplier", 0): 0, ("customer", 1): 1,
                        ("supplier", 1): 2, ("customer", 2): 3,
                        ("supplier", 2): 4}

    def test_isolated_seed(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.graph import purchase_hops

        # supplier 0 has no purchases: the output is the seed alone at 0
        pd.DataFrame({"o_orderkey": [10], "o_custkey": [5]}).to_parquet(
            f"{tmp_path}/orders.parquet", index=False)
        pd.DataFrame({"l_orderkey": [10], "l_suppkey": [7]}).to_parquet(
            f"{tmp_path}/lineitem.parquet", index=False)
        got = purchase_hops(str(tmp_path))
        assert list(zip(got["entity"], got["key"], got["hops"])) == [
            ("supplier", 0, 0)]


class TestTableProfile:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import table_profile

        li = pq.read_table(f"{SF}/lineitem.parquet")
        got = table_profile(SF)
        assert got["column_name"].tolist() == sorted(li.column_names)
        for _, r in got.iterrows():
            col = li[r["column_name"]]
            pdcol = col.to_pandas()
            assert r["n_rows"] == li.num_rows
            assert r["n_null"] == int(pdcol.isna().sum())
            assert r["n_distinct"] == pdcol.nunique(dropna=True)
            typ = col.type
            if pa.types.is_integer(typ):
                assert r["min_s"] == str(int(pdcol.min()))
                assert r["max_s"] == str(int(pdcol.max()))
            elif pa.types.is_timestamp(typ):
                assert r["min_s"] == str(int(pdcol.min().value // 1000))
                assert r["max_s"] == str(int(pdcol.max().value // 1000))
            else:
                assert r["min_s"] == "" and r["max_s"] == ""

    def test_planted_nulls_nan_negzero(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import table_profile

        # written via pyarrow: pandas would silently fold NaN into NULL,
        # but a parquet double column CAN carry a true NaN value
        pq.write_table(pa.table({
            "a": pa.array([5, None, 5, -2], type=pa.int64()),
            # -0.0 == 0.0 collapses; NaN is ONE DISTINCT VALUE (DuckDB's
            # count(DISTINCT) total order), NOT a null
            "b": pa.array([0.0, -0.0, float("nan"), 1.5],
                          type=pa.float64()),
            "c": pa.array(["x", None, "x", "y"], type=pa.string()),
            "t": pa.array([0, 86_400_000_000, None, 86_400_000_000],
                          type=pa.timestamp("us")),
            # ns-unit column: the int64 image must still be epoch-µs
            "tn": pa.array([0, None, 86_400_000_000_000,
                            86_400_000_000_000], type=pa.timestamp("ns")),
        }), f"{tmp_path}/lineitem.parquet")
        got = table_profile(str(tmp_path)).set_index("column_name")
        assert got.loc["a"].tolist() == [4, 1, 2, "-2", "5"]
        assert got.loc["b"].tolist() == [4, 0, 3, "", ""]
        assert got.loc["c"].tolist() == [4, 1, 2, "", ""]
        assert got.loc["t"].tolist() == [4, 1, 2, "0", "86400000000"]
        assert got.loc["tn"].tolist() == [4, 1, 2, "0", "86400000000"]

    def test_all_null_column(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import table_profile

        pd.DataFrame({
            "a": pd.array([None, None], dtype="Int64"),
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = table_profile(str(tmp_path)).set_index("column_name")
        assert got.loc["a"].tolist() == [2, 2, 0, "", ""]


class TestReviewRegressionsR4S11:
    """Planted fixtures for the round-4 session-11 review findings:
    FK-violating q15 winners, q8 zero-denominator, json duplicate keys /
    past-2^53 exactness, pivot hot-user int64 wrap."""

    def test_q15_fk_violating_winner_drops(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q15_top_supplier

        # suppkey 99 wins on revenue but has no supplier row: the inner
        # join drops it entirely (0 rows), it does NOT surface with a
        # NULL name — and the max is NOT re-taken among joined suppliers
        pd.DataFrame({"s_suppkey": [1], "s_name": ["a"]}).to_parquet(
            f"{tmp_path}/supplier.parquet", index=False)
        pd.DataFrame({
            "l_suppkey": [99, 1],
            "l_shipdate": pd.to_datetime(
                ["1996-02-01"] * 2).astype("datetime64[us]"),
            "l_extendedprice": [100.0, 50.0],
            "l_discount": [0.0, 0.0],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = q15_top_supplier(str(tmp_path)).to_pandas()
        assert len(got) == 0

    def test_q8_zero_denominator_year(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q8_market_share

        # every qualifying line item has price 0 → den = 0 for 1996;
        # both the engine and the (now CASE-guarded) oracle publish 0.0
        pd.DataFrame({"r_regionkey": [0], "r_name": ["AMERICA"]}).to_parquet(
            f"{tmp_path}/region.parquet", index=False)
        pd.DataFrame({"n_nationkey": [6], "n_regionkey": [0],
                      "n_name": ["NATION_6"]}).to_parquet(
            f"{tmp_path}/nation.parquet", index=False)
        pd.DataFrame({"p_partkey": [1], "p_type": ["ECONOMY"]}).to_parquet(
            f"{tmp_path}/part.parquet", index=False)
        pd.DataFrame({"s_suppkey": [1], "s_nationkey": [6]}).to_parquet(
            f"{tmp_path}/supplier.parquet", index=False)
        pd.DataFrame({"c_custkey": [1], "c_nationkey": [6]}).to_parquet(
            f"{tmp_path}/customer.parquet", index=False)
        pd.DataFrame({
            "o_orderkey": [10], "o_custkey": [1],
            "o_orderdate": pd.to_datetime(
                ["1996-06-01"]).astype("datetime64[us]"),
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        pd.DataFrame({
            "l_orderkey": [10], "l_partkey": [1], "l_suppkey": [1],
            "l_extendedprice": [0.0], "l_discount": [0.0],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = q8_market_share(str(tmp_path)).to_pandas()
        assert got["o_year"].tolist() == [1996]
        assert got["n_items"].tolist() == [1]
        assert got["mkt_share_r"].tolist() == [0.0]
        # the oracle agrees on the degenerate shape
        import duckdb

        import __ray_entry__ as entry

        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem"]:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{tmp_path}/{t}.parquet')")
        ora = con.execute(entry.oracle_sql()["q8_market_share"]).df()
        assert ora["mkt_share_r"].tolist() == [0.0]
        assert ora["n_items"].tolist() == [1]

    def test_json_duplicate_keys_first_wins(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import json_extract_stats

        # DuckDB's json_extract returns the FIRST duplicate key; bare
        # json.loads keeps the LAST. Row 1: first wins → 1 (not 2).
        # Row 2: first occurrence is a float → gated out entirely (the
        # last-wins reading would wrongly count 2).
        pd.DataFrame({
            "event_type": ["a", "a"],
            "props": ['{"k": 1, "k": 2}', '{"k": 1.5, "k": 2}'],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = json_extract_stats(str(tmp_path)).to_pandas()
        assert got["n_valid"].tolist() == [1]
        assert got["sum_k"].tolist() == [1]
        import duckdb

        import __ray_entry__ as entry

        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/events.parquet')")
        ora = con.execute(entry.oracle_sql()["json_extract_stats"]).df()
        assert ora["sum_k"].tolist() == [1]

    def test_json_exact_past_2_53(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import json_extract_stats

        # two ints far beyond float64's 2^53 integer range whose sum is
        # tiny: any float coercion in the partial path would destroy it
        a, b = 1 << 62, -((1 << 62) - 3)
        pd.DataFrame({
            "event_type": ["a", "a"],
            "props": [f'{{"k": {a}}}', f'{{"k": {b}}}'],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = json_extract_stats(str(tmp_path)).to_pandas()
        assert got["n_valid"].tolist() == [2]
        assert got["sum_k"].tolist() == [3]
        assert got["avg_k_r"].tolist() == [1.5]

    def test_pivot_hot_user_past_int64(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.fulltext import round_half_away
        from searchengine_ray.pipelines.relational import pivot_events

        # one user whose 4-dp value image total exceeds 2^63: the bare
        # int64 accumulator wrapped negative; the (hi, lo) split stays
        # positive and float-exactly reconstructs totals < 2^53 (beyond,
        # it degrades like the oracle's HUGEINT/double division, never
        # to wrapped garbage)
        v = 9.2e14  # vi = 9.2e18, just under 2^63; two rows exceed it
        pd.DataFrame({
            "user_id": [5, 5],
            "event_type": ["click", "view"],
            "value": [v, v],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = pivot_events(str(tmp_path)).to_pandas()
        vi = int(np.rint(v * 10_000.0))
        exp = round_half_away(float(2 * vi) / 10_000.0, 4)
        assert got["sum_value_r"].tolist() == [exp]
        assert got["sum_value_r"].iloc[0] > 0  # the wrap went negative


class TestQ2MinCostSupplier:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q2_MAX_SIZE,
            Q2_REGION,
            Q2_TYPE,
            q2_min_cost_supplier,
        )

        part = pq.read_table(
            f"{SF}/part.parquet",
            columns=["p_partkey", "p_type", "p_size"]).to_pandas()
        li = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice"]).to_pandas()
        sup = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
        nat = pq.read_table(f"{SF}/nation.parquet").to_pandas()
        reg = pq.read_table(f"{SF}/region.parquet").to_pandas()
        es = (sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
              .merge(reg, left_on="n_regionkey", right_on="r_regionkey"))
        es = es[es["r_name"] == Q2_REGION]
        qp = part[(part["p_type"] == Q2_TYPE)
                  & (part["p_size"] <= Q2_MAX_SIZE)]["p_partkey"]
        li = li[li["l_partkey"].isin(set(qp))
                & li["l_suppkey"].isin(set(es["s_suppkey"]))]
        li["c"] = np.rint(li["l_extendedprice"] * 100.0).astype(np.int64)
        cost = (li.groupby(["l_partkey", "l_suppkey"], as_index=False)["c"]
                .min())
        mn = cost.groupby("l_partkey")["c"].transform("min")
        win = cost[cost["c"] == mn].merge(
            es, left_on="l_suppkey", right_on="s_suppkey")
        win = win.sort_values(
            ["s_acctbal", "n_name", "s_name", "l_partkey", "s_suppkey"],
            ascending=[False, True, True, True, True]).head(100)
        got = q2_min_cost_supplier(SF).to_pandas()
        assert got["p_partkey"].tolist() == win["l_partkey"].tolist()
        assert got["s_suppkey"].tolist() == win["s_suppkey"].tolist()
        assert got["min_cost_r"].tolist() == [
            round(c / 100.0, 2) for c in win["c"]]
        assert (got["p_type"] == Q2_TYPE).all()

    def test_planted_ties_and_exclusions(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q2_min_cost_supplier

        # part 1 qualifies; part 2 fails the size gate; part 3 the type
        pd.DataFrame({
            "p_partkey": [1, 2, 3],
            "p_type": ["ECONOMY", "ECONOMY", "LARGE"],
            "p_size": [5, 40, 5],
        }).to_parquet(f"{tmp_path}/part.parquet", index=False)
        # suppliers 10, 11 in-region (nation 0 → region 0 = EUROPE);
        # supplier 20 out-of-region holds the GLOBAL min for part 1 —
        # the correlated min must range over region suppliers only
        pd.DataFrame({
            "s_suppkey": [10, 11, 20],
            "s_name": ["SUP_10", "SUP_11", "SUP_20"],
            "s_nationkey": [0, 0, 1],
            "s_acctbal": [50.0, 50.0, 99.0],
        }).to_parquet(f"{tmp_path}/supplier.parquet", index=False)
        pd.DataFrame({
            "n_nationkey": [0, 1], "n_name": ["N0", "N1"],
            "n_regionkey": [0, 1],
        }).to_parquet(f"{tmp_path}/nation.parquet", index=False)
        pd.DataFrame({
            "r_regionkey": [0, 1], "r_name": ["EUROPE", "ASIA"],
        }).to_parquet(f"{tmp_path}/region.parquet", index=False)
        pd.DataFrame({
            # suppliers 10 and 11 TIE on part 1's min (3.00) — both rows
            # surface; supplier 10's second, cheaper line on part 2 is
            # gated out with the part; supplier 20's 1.00 line never
            # competes (out of region)
            "l_partkey": [1, 1, 1, 2, 1, 3],
            "l_suppkey": [10, 11, 10, 10, 20, 11],
            "l_extendedprice": [3.0, 3.0, 7.0, 0.5, 1.0, 2.0],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = q2_min_cost_supplier(str(tmp_path)).to_pandas()
        assert got["s_suppkey"].tolist() == [10, 11]
        assert got["min_cost_r"].tolist() == [3.0, 3.0]
        assert got["n_name"].tolist() == ["N0", "N0"]


class TestQ21WaitingSuppliers:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import q21_waiting_suppliers

        li = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_returnflag"]).to_pandas()
        orders = pq.read_table(
            f"{SF}/orders.parquet",
            columns=["o_orderkey", "o_orderstatus"]).to_pandas()
        sup = pq.read_table(f"{SF}/supplier.parquet",
                            columns=["s_suppkey", "s_name"]).to_pandas()
        li["f"] = (li["l_returnflag"] == "R").astype(int)
        pairs = (li.groupby(["l_orderkey", "l_suppkey"], as_index=False)["f"]
                 .max())
        fok = set(orders.loc[orders["o_orderstatus"] == "F", "o_orderkey"])
        pairs = pairs[pairs["l_orderkey"].isin(fok)]
        per = pairs.groupby("l_orderkey").agg(
            nsupp=("l_suppkey", "size"), nfail=("f", "sum"))
        live = set(per[(per["nsupp"] >= 2) & (per["nfail"] == 1)].index)
        culprit = pairs[(pairs["f"] == 1) & pairs["l_orderkey"].isin(live)]
        ref = (culprit.groupby("l_suppkey").size().reset_index(name="numwait")
               .merge(sup, left_on="l_suppkey", right_on="s_suppkey")
               .sort_values(["numwait", "s_name"], ascending=[False, True])
               .head(100))
        got = q21_waiting_suppliers(SF).to_pandas()
        assert got["s_suppkey"].tolist() == ref["s_suppkey"].tolist()
        assert got["numwait"].tolist() == ref["numwait"].tolist()

    def test_planted_quantifiers(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q21_waiting_suppliers

        pd.DataFrame({
            "o_orderkey": [1, 2, 3, 4, 5],
            # order 4 is still open → never counted; the rest finished
            "o_orderstatus": ["F", "F", "F", "O", "F"],
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        pd.DataFrame({
            # order 1: suppliers 10 (R + N lines — fault dedups to one)
            #   and 11 (clean) → supplier 10 is the LONE culprit
            # order 2: 10 and 11 BOTH at fault → NOT EXISTS fails, nobody
            # order 3: only supplier 10, at fault → EXISTS fails, nobody
            # order 4: perfect culprit pattern but the order is open
            # order 5: supplier 11 lone culprit among three
            "l_orderkey": [1, 1, 1, 2, 2, 3, 4, 4, 5, 5, 5],
            "l_suppkey": [10, 10, 11, 10, 11, 10, 10, 11, 10, 11, 12],
            "l_returnflag": ["R", "N", "N", "R", "R", "R", "R", "N",
                             "N", "R", "N"],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        pd.DataFrame({
            "s_suppkey": [10, 11, 12],
            "s_name": ["SUP_10", "SUP_11", "SUP_12"],
        }).to_parquet(f"{tmp_path}/supplier.parquet", index=False)
        got = q21_waiting_suppliers(str(tmp_path)).to_pandas()
        assert got["s_suppkey"].tolist() == [10, 11]
        assert got["numwait"].tolist() == [1, 1]  # orders 1 and 5 only


class TestQ20DominantSupplier:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q20_FROM_US,
            Q20_PREFIX,
            Q20_TO_US,
            q20_dominant_supplier,
        )

        part = pq.read_table(f"{SF}/part.parquet",
                             columns=["p_partkey", "p_name"]).to_pandas()
        li = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity",
                     "l_shipdate"]).to_pandas()
        qp = set(part.loc[part["p_name"].str.startswith(Q20_PREFIX),
                          "p_partkey"])
        us = li["l_shipdate"].astype("datetime64[us]").astype(np.int64)
        li = li[li["l_partkey"].isin(qp)
                & (us >= Q20_FROM_US) & (us < Q20_TO_US)]
        li["c"] = np.rint(li["l_quantity"] * 100.0).astype(np.int64)
        pairs = (li.groupby(["l_partkey", "l_suppkey"], as_index=False)["c"]
                 .sum())
        tot = pairs.groupby("l_partkey")["c"].transform("sum")
        dom = pairs[pairs["c"] * 2 > tot]
        ref = (dom.groupby("l_suppkey").size().reset_index(name="n_parts")
               .sort_values("l_suppkey"))
        got = q20_dominant_supplier(SF).to_pandas()
        assert got["s_suppkey"].tolist() == ref["l_suppkey"].tolist()
        assert got["n_parts"].tolist() == ref["n_parts"].tolist()

    def test_planted_share_boundary(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q20_dominant_supplier

        pd.DataFrame({
            "p_partkey": [1, 2, 3],
            # part 3 fails the prefix gate even with a sole supplier
            "p_name": ["red bolt", "red gear", "blue bolt"],
        }).to_parquet(f"{tmp_path}/part.parquet", index=False)
        pd.DataFrame({
            # part 1: supplier 10 ships 10.00 of 20.00 — EXACTLY half,
            #   the strict gate must reject both suppliers
            # part 2: supplier 10 ships 10.01 of 20.01 — just over half
            # the out-of-window line would push supplier 11 over on
            # part 2 if the date gate leaked
            "l_partkey": [1, 1, 2, 2, 2, 3],
            "l_suppkey": [10, 11, 10, 11, 11, 12],
            "l_quantity": [10.0, 10.0, 10.01, 10.0, 50.0, 5.0],
            "l_shipdate": pd.to_datetime(
                ["1997-06-01", "1997-06-02", "1997-06-03", "1997-06-04",
                 "1998-06-01", "1997-06-05"]),
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        pd.DataFrame({
            "s_suppkey": [10, 11, 12],
            "s_name": ["SUP_10", "SUP_11", "SUP_12"],
        }).to_parquet(f"{tmp_path}/supplier.parquet", index=False)
        got = q20_dominant_supplier(str(tmp_path)).to_pandas()
        assert got["s_suppkey"].tolist() == [10]
        assert got["n_parts"].tolist() == [1]  # part 2 only


class TestQ9ProductProfit:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q9_WORD,
            q9_product_profit,
        )

        part = pq.read_table(f"{SF}/part.parquet",
                             columns=["p_partkey", "p_name"]).to_pandas()
        li = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_shipdate",
                     "l_extendedprice", "l_discount"]).to_pandas()
        sup = pq.read_table(f"{SF}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"]).to_pandas()
        nat = pq.read_table(f"{SF}/nation.parquet",
                            columns=["n_nationkey", "n_name"]).to_pandas()
        qp = set(part.loc[part["p_name"].str.contains(Q9_WORD), "p_partkey"])
        li = li[li["l_partkey"].isin(qp)]
        j = (li.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
             .merge(nat, left_on="s_nationkey", right_on="n_nationkey"))
        j["y"] = j["l_shipdate"].dt.year
        j["rev"] = (np.rint(j["l_extendedprice"] * 100.0).astype(np.int64)
                    * np.rint((1 - j["l_discount"]) * 100.0).astype(np.int64))
        ref = (j.groupby(["n_name", "y"], as_index=False)
               .agg(n=("rev", "size"), t=("rev", "sum"))
               .sort_values(["n_name", "y"], ascending=[True, False]))
        got = q9_product_profit(SF).to_pandas()
        assert got["n_name"].tolist() == ref["n_name"].tolist()
        assert got["o_year"].tolist() == ref["y"].tolist()
        from searchengine_ray.pipelines.fulltext import round_half_away

        assert got["n_items"].tolist() == ref["n"].tolist()
        assert got["profit_r"].tolist() == [
            round_half_away(int(t) / 10_000.0, 2) for t in ref["t"]]

    def test_planted_year_split_and_infix_gate(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q9_product_profit

        pd.DataFrame({
            "p_partkey": [1, 2],
            # infix match — 'gear' not at the start; part 2 no match
            "p_name": ["large gearbox", "large box"],
        }).to_parquet(f"{tmp_path}/part.parquet", index=False)
        pd.DataFrame({
            "s_suppkey": [10], "s_nationkey": [0],
        }).to_parquet(f"{tmp_path}/supplier.parquet", index=False)
        pd.DataFrame({
            "n_nationkey": [0], "n_name": ["N0"],
        }).to_parquet(f"{tmp_path}/nation.parquet", index=False)
        pd.DataFrame({
            # New Year's Eve vs New Year's Day — the year key must split
            # them; the part-2 line is gated out
            "l_partkey": [1, 1, 2],
            "l_suppkey": [10, 10, 10],
            "l_shipdate": pd.to_datetime(
                ["1997-12-31 23:59:59", "1998-01-01 00:00:00",
                 "1997-06-01 00:00:00"]),
            "l_extendedprice": [100.0, 200.0, 999.0],
            "l_discount": [0.1, 0.0, 0.0],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = q9_product_profit(str(tmp_path)).to_pandas()
        assert got["o_year"].tolist() == [1998, 1997]  # year DESC
        assert got["profit_r"].tolist() == [200.0, 90.0]
        assert got["n_items"].tolist() == [1, 1]


class TestQ11ImportantParts:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            Q11_MULT_DEN,
            Q11_MULT_NUM,
            Q11_REGION,
            q11_important_parts,
        )

        li = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice",
                     "l_discount"]).to_pandas()
        sup = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
        nat = pq.read_table(f"{SF}/nation.parquet").to_pandas()
        reg = pq.read_table(f"{SF}/region.parquet").to_pandas()
        es = (sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
              .merge(reg, left_on="n_regionkey", right_on="r_regionkey"))
        es = set(es.loc[es["r_name"] == Q11_REGION, "s_suppkey"])
        li = li[li["l_suppkey"].isin(es)]
        li["rev"] = (np.rint(li["l_extendedprice"] * 100.0).astype(np.int64)
                     * np.rint((1 - li["l_discount"]) * 100.0)
                     .astype(np.int64))
        v = li.groupby("l_partkey", as_index=False)["rev"].sum()
        total = int(v["rev"].sum())
        thr = (Q11_MULT_NUM * total) // (Q11_MULT_DEN * len(v))
        win = v[v["rev"] > thr].copy()
        win = win.sort_values(["rev", "l_partkey"], ascending=[False, True])
        from searchengine_ray.pipelines.fulltext import round_half_away

        got = q11_important_parts(SF).to_pandas()
        assert got["p_partkey"].tolist() == win["l_partkey"].tolist()
        assert got["value_r"].tolist() == [
            round_half_away(int(t) / 10_000.0, 2) for t in win["rev"]]

    def test_planted_mean_threshold_boundary(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import q11_important_parts

        pd.DataFrame({
            "s_suppkey": [10], "s_name": ["SUP_10"], "s_nationkey": [0],
            "s_acctbal": [1.0],
        }).to_parquet(f"{tmp_path}/supplier.parquet", index=False)
        pd.DataFrame({
            "n_nationkey": [0], "n_name": ["N0"], "n_regionkey": [0],
        }).to_parquet(f"{tmp_path}/nation.parquet", index=False)
        pd.DataFrame({
            "r_regionkey": [0], "r_name": ["EUROPE"],
        }).to_parquet(f"{tmp_path}/region.parquet", index=False)
        # four parts 1.00/2.00/3.00/6.00 (cents×hundredths 10000..60000):
        # total 120000, n = 4, threshold = 3·120000 // (2·4) = 45000 —
        # only the 6.00 part clears the strict 1.5×-mean gate (45000 is
        # exactly 1.5× the mean, so a hypothetical 4.50 part would fail)
        pd.DataFrame({
            "l_partkey": [1, 2, 3, 4],
            "l_suppkey": [10] * 4,
            "l_extendedprice": [1.0, 2.0, 3.0, 6.0],
            "l_discount": [0.0] * 4,
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = q11_important_parts(str(tmp_path)).to_pandas()
        assert got["p_partkey"].tolist() == [4]
        assert got["value_r"].tolist() == [6.0]



class TestBigramPmi:
    def test_matches_bruteforce(self, ray_session):
        from collections import Counter

        from searchengine_ray.pipelines.fulltext import round_half_away
        from searchengine_ray.pipelines.textstats import (
            PMI_MIN_N12,
            bigram_pmi,
        )
        from searchengine_ray.textproc import tokenize_simple

        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["text"]).to_pandas()
        uni, bi = Counter(), Counter()
        for text in docs["text"]:
            toks = tokenize_simple(text or "")
            uni.update(toks)
            bi.update(zip(toks[:-1], toks[1:]))
        n = sum(uni.values())
        rows = []
        for (w1, w2), n12 in bi.items():
            if n12 < PMI_MIN_N12:
                continue
            x = (float(n12) * float(n)) / (float(uni[w1]) * float(uni[w2]))
            rows.append((f"{w1} {w2}",
                         round_half_away(float(np.log(x)), 4), n12))
        rows.sort(key=lambda r: (-r[1], r[0]))
        rows = rows[:100]
        got = bigram_pmi(SF).to_pandas()
        assert got["bigram"].tolist() == [r[0] for r in rows]
        assert got["pmi_r"].tolist() == [r[1] for r in rows]
        assert got["n12"].tolist() == [r[2] for r in rows]
        assert got["rank"].tolist() == list(range(len(rows)))

    def test_planted_collocation_beats_frequency(self, ray_session,
                                                 tmp_path):
        from searchengine_ray.pipelines.textstats import bigram_pmi

        # 'zig zag' appears 5 times and its words appear NOWHERE else →
        # maximal PMI; 'the cat' appears 20 times but 'the' floods the
        # corpus, diluting its PMI below; 'one off' (4×) misses the
        # min-count gate entirely
        text = ("zig zag . " * 5 + "the cat . " * 20 + "the dog . " * 30
                + "one off . " * 4)
        pd.DataFrame({
            "doc_id": [1], "text": [text], "lang": ["en"],
            "source": ["src0"], "n_chars": [len(text)],
        }).to_parquet(f"{tmp_path}/documents.parquet", index=False)
        got = bigram_pmi(str(tmp_path)).to_pandas()
        assert got["bigram"].iloc[0] == "zig zag"
        assert "one off" not in set(got["bigram"])
        pmis = dict(zip(got["bigram"], got["pmi_r"]))
        assert pmis["zig zag"] > pmis["the cat"]


class TestEmbeddingOutliers:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.fulltext import round_half_away
        from searchengine_ray.pipelines.similarity import embedding_outliers

        emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
        m = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
        lab = emb["label"].to_numpy(dtype=np.int64)
        cent = {}
        for b in np.unique(lab):
            mean = m[lab == b].sum(axis=0) / (lab == b).sum()
            cent[b] = np.asarray([round_half_away(v, 4) for v in mean])
        diff = m - np.stack([cent[b] for b in lab])
        dist = np.sqrt((diff * diff).sum(axis=1))
        ref = pd.DataFrame({
            "vec_id": emb["vec_id"].to_numpy(dtype=np.int64),
            "label": lab,
            "dist_r": [round_half_away(d, 4) for d in dist],
        }).sort_values(["dist_r", "vec_id"], ascending=[False, True],
                       kind="stable").head(20)
        got = embedding_outliers(SF).to_pandas()
        assert got["vec_id"].tolist() == ref["vec_id"].tolist()
        assert got["label"].tolist() == ref["label"].tolist()
        assert got["dist_r"].tolist() == ref["dist_r"].tolist()

    def test_planted_mislabeled_vector(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.similarity import embedding_outliers

        # two tight clusters; vector 99 carries label 0 but sits in
        # cluster 1's position → by far the farthest from ITS OWN
        # centroid even though it is a perfectly normal point globally
        rng = np.random.default_rng(7)
        a = (rng.normal(0.0, 0.01, (50, 8)) + 0.0).astype(np.float32)
        b = (rng.normal(0.0, 0.01, (50, 8)) + 5.0).astype(np.float32)
        vecs = np.vstack([a, b])
        labels = np.array([0] * 50 + [1] * 50, dtype=np.int32)
        labels[99] = 0  # the mislabel
        pd.DataFrame({
            "vec_id": np.arange(100, dtype=np.int64),
            "embedding": [v for v in vecs],
            "label": labels,
        }).to_parquet(f"{tmp_path}/embeddings.parquet", index=False)
        got = embedding_outliers(str(tmp_path)).to_pandas()
        assert got["vec_id"].iloc[0] == 99
        assert got["label"].iloc[0] == 0
        # the mislabel's distance dwarfs every honest point's
        assert got["dist_r"].iloc[0] > 3 * got["dist_r"].iloc[1]


class TestValueHistogram:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            HIST_NBINS,
            value_histogram,
        )

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["value"]).to_pandas()
        v = ev["value"].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        lo, hi = float(v.min()), float(v.max())
        b = np.minimum(np.floor((v - lo) / (hi - lo) * HIST_NBINS),
                       HIST_NBINS - 1).astype(np.int64)
        ref = np.bincount(b, minlength=HIST_NBINS)
        got = value_histogram(SF).to_pandas()
        assert got["bin"].tolist() == list(range(HIST_NBINS))
        assert got["n_events"].tolist() == ref.tolist()
        assert int(got["n_events"].sum()) == v.size  # nothing leaks
        # edges tile the range: first lo, last hi (after 4-dp rounding)
        assert got["lo_edge_r"].iloc[0] == round(lo, 4)

    def test_planted_boundaries_and_zero_bins(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import value_histogram

        # values 0 and 64 pin the range → width 1 per bin; 64 (== hi)
        # must clamp INTO bin 63, not fall off; 63.0 sits exactly on the
        # bin-63 lower edge (floor lands it in 63 too); everything else
        # empty → explicit zeros
        pd.DataFrame({
            "event_id": [1, 2, 3],
            "user_id": [1, 1, 1],
            "ts": pd.to_datetime(["2026-01-01"] * 3),
            "event_type": ["a"] * 3,
            "value": [0.0, 63.0, 64.0],
            "props": ["{}"] * 3,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = value_histogram(str(tmp_path)).to_pandas()
        assert got["n_events"].tolist() == [1] + [0] * 62 + [2]
        assert got["lo_edge_r"].tolist()[:2] == [0.0, 1.0]
        assert got["hi_edge_r"].iloc[-1] == 64.0

    def test_degenerate_single_value(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import value_histogram

        pd.DataFrame({
            "event_id": [1, 2],
            "user_id": [1, 1],
            "ts": pd.to_datetime(["2026-01-01"] * 2),
            "event_type": ["a"] * 2,
            "value": [5.0, 5.0],
            "props": ["{}"] * 2,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = value_histogram(str(tmp_path)).to_pandas()
        assert got["n_events"].tolist() == [2] + [0] * 63
        assert (got["lo_edge_r"] == 5.0).all()  # zero-width bins


class TestPeakConcurrency:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            SESSION_GAP_US,
            WINDOW_US,
            peak_concurrency,
        )

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts"]).to_pandas()
        ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
        deltas = {}
        for _, sub in ev.groupby("user_id"):
            ts = np.sort(sub["ts_us"].to_numpy())
            brk = np.nonzero(np.diff(ts) > SESSION_GAP_US)[0]
            starts = np.concatenate([[0], brk + 1])
            ends = np.concatenate([brk, [ts.size - 1]])
            for s, e in zip(ts[starts], ts[ends]):
                deltas[s] = deltas.get(s, 0) + 1
                deltas[e + 1] = deltas.get(e + 1, 0) - 1
        bts = sorted(deltas)
        level, per_hour_max, per_hour_last = 0, {}, {}
        carry_level = {}
        for t in bts:
            h = (t // WINDOW_US) * WINDOW_US
            if h not in per_hour_max:
                carry_level[h] = level  # level entering the hour
            level += deltas[t]
            per_hour_max[h] = max(per_hour_max.get(h, -10**9), level)
        hours = np.arange(min(per_hour_max), max(per_hour_max) + WINDOW_US,
                          WINDOW_US)
        # walk the scaffold carrying the level through empty hours
        ref, lvl = [], 0
        for h in hours:
            if h in per_hour_max:
                ref.append(max(carry_level[h], per_hour_max[h]))
                lvl = carry_level[h] + sum(
                    d for t, d in deltas.items()
                    if (t // WINDOW_US) * WINDOW_US == h)
            else:
                ref.append(lvl)
        got = peak_concurrency(SF).to_pandas()
        assert got["hour_us"].tolist() == hours.tolist()
        assert got["peak"].tolist() == ref

    def test_planted_carry_and_ties(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import peak_concurrency

        base = 3_600_000_000_000  # an exact hour boundary
        h = 3_600_000_000
        # u1 has two single-event sessions (hours 0 and 3 — the first
        # closes 1 µs after it opens, BEFORE u2/u3 arrive); u2 and u3
        # open at the SAME µs in hour 0 (tie deltas must sum) and close
        # together at the same µs too
        pd.DataFrame({
            "event_id": range(6),
            "user_id": [1, 1, 2, 3, 2, 3],
            "ts": pd.to_datetime([
                base,              # u1 session A start (hour 0)
                base + 3 * h,      # u1 session B (hour 3; gap > 30 min)
                base + 1000,       # u2 opens (hour 0)
                base + 1000,       # u3 opens at the SAME µs
                base + 2000,       # u2 closes
                base + 2000,       # u3 closes (same µs again)
            ], unit="us"),
            "event_type": ["a"] * 6,
            "value": [1.0] * 6,
            "props": ["{}"] * 6,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = peak_concurrency(str(tmp_path)).to_pandas()
        # hour 0: u1 closes at base+1 before u2/u3 open at base+1000,
        # so the peak is the u2+u3 tie → 2; hours 1,2 empty → 0 (the
        # carry through breakpoint-free hours); hour 3: u1 again → 1
        assert got["peak"].tolist() == [2, 0, 0, 1]

    def test_planted_bridge_session(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import peak_concurrency

        base = 7_200_000_000_000  # hour boundary
        h = 3_600_000_000
        ten_min = 600_000_000
        # one user, events every 10 min from hour 0 into hour 2 → ONE
        # session spanning three hours; hour 1 has breakpoints? no —
        # the session is open the whole hour with NO boundary inside
        # hour 1 (events are not boundaries; only start and end+1 are)
        ts = [base + i * ten_min for i in range(13)]  # 0 .. 120 min
        pd.DataFrame({
            "event_id": range(13),
            "user_id": [1] * 13,
            "ts": pd.to_datetime(ts, unit="us"),
            "event_type": ["a"] * 13,
            "value": [1.0] * 13,
            "props": ["{}"] * 13,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = peak_concurrency(str(tmp_path)).to_pandas()
        # start at hour 0, end+1µs falls at hour 2's first µs + ...
        # level is 1 through hours 0,1 and drops in hour 2
        assert got["peak"].tolist() == [1, 1, 1]


class TestWinsorizedStats:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.fulltext import round_half_away
        from searchengine_ray.pipelines.relational import winsorized_stats

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "value"]).to_pandas()
        ev = ev[ev["value"].notna() & ev["event_type"].notna()]
        rows = []
        for et, sub in ev.groupby("event_type"):
            v = np.sort(sub["value"].to_numpy(dtype=np.float64))
            n = v.size
            # quantile_disc: the element at rank ceil(n*q), 1-based
            lo = v[max(int(np.ceil(n * 0.05)) - 1, 0)]
            hi = v[max(int(np.ceil(n * 0.95)) - 1, 0)]
            c = np.clip(sub["value"].to_numpy(dtype=np.float64), lo, hi)
            rows.append((et, n, round_half_away(float(c.mean()), 4),
                         round_half_away(float(c.std()), 4)))
        rows.sort()
        got = winsorized_stats(SF).to_pandas()
        assert got["event_type"].tolist() == [r[0] for r in rows]
        assert got["n_events"].tolist() == [r[1] for r in rows]
        assert got["wins_mean_r"].tolist() == [r[2] for r in rows]
        assert got["wins_std_r"].tolist() == [r[3] for r in rows]

    def test_planted_outlier_suppression(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import winsorized_stats

        # 100 values of 10.0 plus one 1e9 spike: the spike clips to the
        # p95 value (10.0), so the winsorized mean is exactly 10.0 and
        # the std is 0 — the raw mean would be ~10M
        pd.DataFrame({
            "event_id": range(101),
            "user_id": [1] * 101,
            "ts": pd.to_datetime(["2026-01-01"] * 101),
            "event_type": ["click"] * 101,
            "value": [10.0] * 100 + [1e9],
            "props": ["{}"] * 101,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = winsorized_stats(str(tmp_path)).to_pandas()
        assert got["wins_mean_r"].tolist() == [10.0]
        assert got["wins_std_r"].tolist() == [0.0]
        assert got["n_events"].tolist() == [101]

    def test_null_label_rows_drop(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.similarity import embedding_outliers

        # one null label and one null embedding among honest rows: both
        # must DROP (the oracle's join semantics), never crash the
        # pass-2 searchsorted probe
        vecs = [np.full(4, float(i), dtype=np.float32) for i in range(4)]
        pd.DataFrame({
            "vec_id": [0, 1, 2, 3],
            "embedding": [vecs[0], vecs[1], None, vecs[3]],
            "label": pd.array([0, None, 0, 0], dtype="Int32"),
        }).to_parquet(f"{tmp_path}/embeddings.parquet", index=False)
        got = embedding_outliers(str(tmp_path)).to_pandas()
        assert set(got["vec_id"]) == {0, 3}  # rows 1 and 2 dropped


class TestFkAudit:
    def test_clean_corpus_has_no_orphans(self, ray_session):
        from searchengine_ray.pipelines.relational import fk_audit

        got = fk_audit(SF).to_pandas()
        assert len(got) == 7
        assert (got["n_orphans"] == 0).all()  # testdata FKs are intact
        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey"]).num_rows
        edge = got.set_index("fk_edge")
        assert edge.loc["lineitem.l_orderkey->orders", "n_rows"] == li
        assert edge.loc["lineitem.l_partkey->part", "n_rows"] == li

    def test_planted_orphans_both_paths(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import fk_audit

        # orders 1,2 exist; lineitem references 1,2,99 (99 twice → TWO
        # orphan ROWS through the exchange path); part 7 exists; the
        # partkey 88 row is an orphan through the broadcast path
        pd.DataFrame({"o_orderkey": [1, 2], "o_custkey": [10, 20]
                      }).to_parquet(f"{tmp_path}/orders.parquet",
                                    index=False)
        pd.DataFrame({
            "l_orderkey": [1, 2, 99, 99],
            "l_partkey": [7, 7, 88, 7],
            "l_suppkey": [5, 5, 5, 5],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        pd.DataFrame({"p_partkey": [7]}).to_parquet(
            f"{tmp_path}/part.parquet", index=False)
        pd.DataFrame({"s_suppkey": [5], "s_nationkey": [0]}).to_parquet(
            f"{tmp_path}/supplier.parquet", index=False)
        pd.DataFrame({"c_custkey": [10], "c_nationkey": [0]}).to_parquet(
            f"{tmp_path}/customer.parquet", index=False)  # 20 is orphan
        pd.DataFrame({"n_nationkey": [0], "n_regionkey": [0]}).to_parquet(
            f"{tmp_path}/nation.parquet", index=False)
        pd.DataFrame({"r_regionkey": [0]}).to_parquet(
            f"{tmp_path}/region.parquet", index=False)
        got = fk_audit(str(tmp_path)).to_pandas().set_index("fk_edge")
        assert got.loc["lineitem.l_orderkey->orders", "n_orphans"] == 2
        assert got.loc["lineitem.l_partkey->part", "n_orphans"] == 1
        assert got.loc["orders.o_custkey->customer", "n_orphans"] == 1
        assert got.loc["lineitem.l_suppkey->supplier", "n_orphans"] == 0
        assert got.loc["supplier.s_nationkey->nation", "n_orphans"] == 0


class TestKcorePurchases:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.graph import KCORE_K, kcore_purchases

        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey", "l_partkey"]).to_pandas()
        orders = pq.read_table(f"{SF}/orders.parquet",
                               columns=["o_orderkey",
                                        "o_custkey"]).to_pandas()
        e = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
             [["o_custkey", "l_partkey"]].drop_duplicates())
        while True:
            cd = e.groupby("o_custkey")["l_partkey"].transform("size")
            pdg = e.groupby("l_partkey")["o_custkey"].transform("size")
            keep = (cd >= KCORE_K) & (pdg >= KCORE_K)
            if keep.all():
                break
            e = e[keep]
            if e.empty:
                break
        got = kcore_purchases(SF).to_pandas()
        ref_c = (e.groupby("o_custkey").size().sort_index())
        ref_p = (e.groupby("l_partkey").size().sort_index())
        cust = got[got["node_type"] == "customer"]
        part = got[got["node_type"] == "part"]
        assert cust["key"].tolist() == ref_c.index.tolist()
        assert cust["degree"].tolist() == ref_c.tolist()
        assert part["key"].tolist() == ref_p.index.tolist()
        assert part["degree"].tolist() == ref_p.tolist()

    def test_planted_cascade(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.graph import kcore_purchases

        # k = 20: a complete 21×21 biclique (every node degree 21 ≥ 20
        # → the core) plus a two-round CASCADE: customer 100 buys 19
        # core parts + part 999, and 999 has no other customer — round 1
        # peels 999 (degree 1), which drops customer 100 to degree 19 so
        # round 2 peels 100 too
        cks, pks = [], []
        for c in range(21):
            for p in range(21):
                cks.append(c)
                pks.append(p)
        cks += [100] * 20
        pks += list(range(19)) + [999]
        orders = pd.DataFrame({
            "o_orderkey": range(len(cks)),
            "o_custkey": cks,
        })
        li = pd.DataFrame({
            "l_orderkey": range(len(cks)),
            "l_partkey": pks,
        })
        orders.to_parquet(f"{tmp_path}/orders.parquet", index=False)
        li.to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = kcore_purchases(str(tmp_path)).to_pandas()
        cust = got[got["node_type"] == "customer"]["key"].tolist()
        part = got[got["node_type"] == "part"]["key"].tolist()
        assert cust == list(range(21))  # 100 cascaded out
        assert part == list(range(21))  # 999 peeled in round 1
        assert (got["degree"] == 21).all()

    def test_empty_core(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.graph import kcore_purchases

        pd.DataFrame({"o_orderkey": [1], "o_custkey": [1]}).to_parquet(
            f"{tmp_path}/orders.parquet", index=False)
        pd.DataFrame({"l_orderkey": [1], "l_partkey": [7]}).to_parquet(
            f"{tmp_path}/lineitem.parquet", index=False)
        got = kcore_purchases(str(tmp_path)).to_pandas()
        assert got.empty


class TestUserEntropy:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import user_entropy

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "event_type"]).to_pandas()
        ev = ev.dropna(subset=["event_type"])
        got = user_entropy(SF).to_pandas().set_index("user_id")
        for uid, sub in ev.groupby("user_id"):
            c = np.sort(sub.groupby("event_type").size()
                        .to_numpy(dtype=np.float64))
            n = c.sum()
            h = (np.log(n) - float((c * np.log(c)).sum()) / n) / np.log(2.0)
            assert got.loc[uid, "n_events"] == int(n)
            assert abs(got.loc[uid, "entropy_r"] - h) < 5e-5

    def test_planted_extremes(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import user_entropy

        # user 1: uniform over 4 types -> exactly 2 bits; user 2: one
        # type -> 0 bits; user 3: only a NULL type row -> drops entirely
        ts = pd.Timestamp("2024-01-01")
        pd.DataFrame({
            "user_id": [1, 1, 1, 1, 2, 2, 3],
            "event_type": ["a", "b", "c", "d", "x", "x", None],
            "ts": [ts] * 7, "value": [0.0] * 7,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = user_entropy(str(tmp_path)).to_pandas().set_index("user_id")
        assert set(got.index) == {1, 2}
        assert got.loc[1, "entropy_r"] == 2.0
        assert got.loc[1, "n_events"] == 4
        assert got.loc[2, "entropy_r"] == 0.0


class TestHeavyHitters:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import heavy_hitters

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id"]).to_pandas()
        n = len(ev)
        cnt = ev.groupby("user_id").size()
        want = cnt[cnt * 125 > n].sort_index()
        got = heavy_hitters(SF).to_pandas()
        assert got["user_id"].tolist() == want.index.tolist()
        assert got["n_events"].tolist() == want.tolist()

    def test_strict_threshold_boundary(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import heavy_hitters

        # n = 1000; user 7 holds EXACTLY n/125 = 8 rows -> 8*125 == 1000
        # is NOT > 1000, so it must be excluded; user 9 holds 9 -> kept
        uid = np.concatenate([
            np.full(8, 7), np.full(9, 9),
            np.arange(100, 100 + 983),  # 983 singletons
        ])
        ts = pd.Timestamp("2024-01-01")
        pd.DataFrame({"user_id": uid, "event_type": "e",
                      "ts": ts, "value": 0.0}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = heavy_hitters(str(tmp_path)).to_pandas()
        assert got["user_id"].tolist() == [9]
        assert got["n_events"].tolist() == [9]

    def test_truncation_keeps_exactness(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import heavy_hitters

        # cap=4 forces real Misra-Gries truncation in every batch (many
        # distinct singletons), den=4: only the planted heavy user
        # crosses n/4; the exact verify pass must still report its TRUE
        # count even though per-batch estimates undercount
        uid = np.concatenate([np.full(600, 42), np.arange(1000, 1400)])
        rng = np.random.default_rng(0)
        rng.shuffle(uid)
        ts = pd.Timestamp("2024-01-01")
        pd.DataFrame({"user_id": uid, "event_type": "e",
                      "ts": ts, "value": 0.0}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = heavy_hitters(str(tmp_path), den=4, cap=4).to_pandas()
        assert got["user_id"].tolist() == [42]
        assert got["n_events"].tolist() == [600]

    def test_all_tied_above_cap_batch(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import heavy_hitters

        # >cap distinct users with IDENTICAL counts: truncation empties
        # the per-batch summary; the n_row rider must survive so the
        # candidate gate sees the true total (result: nobody is heavy)
        uid = np.repeat(np.arange(50), 2)  # 50 users x 2 events, cap 4
        ts = pd.Timestamp("2024-01-01")
        pd.DataFrame({"user_id": uid, "event_type": "e",
                      "ts": ts, "value": 0.0}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = heavy_hitters(str(tmp_path), den=4, cap=4).to_pandas()
        assert len(got) == 0


class TestNtileOrders:
    @staticmethod
    def _brute(df, ntiles=10):
        cents = np.floor(np.abs(df["o_totalprice"].to_numpy()) * 100.0
                         + 0.5).astype(np.int64) * np.sign(
            df["o_totalprice"].to_numpy()).astype(np.int64)
        order = np.lexsort((df["o_orderkey"].to_numpy(), cents))
        cents = cents[order]
        n = cents.size
        sizes = np.full(ntiles, n // ntiles, dtype=np.int64)
        sizes[: n % ntiles] += 1
        d = np.repeat(np.arange(1, ntiles + 1), sizes)
        out = pd.DataFrame({"decile": d, "cents": cents}).groupby(
            "decile").agg(n_orders=("cents", "size"),
                          s=("cents", "sum"), mn=("cents", "min"),
                          mx=("cents", "max"))
        return out

    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import ntile_orders

        df = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey", "o_totalprice"]).to_pandas()
        want = self._brute(df)
        got = ntile_orders(SF).to_pandas().set_index("decile")
        assert got["n_orders"].tolist() == want["n_orders"].tolist()
        assert np.allclose(got["sum_price_r"], want["s"] / 100.0, atol=0.011)
        assert got["min_price"].tolist() == (want["mn"] / 100.0).tolist()
        assert got["max_price"].tolist() == (want["mx"] / 100.0).tolist()

    def test_boundary_ties_break_by_orderkey(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import ntile_orders

        # 23 orders ALL the same price: deciles are decided purely by
        # o_orderkey, sizes 3,3,3,2,... (n%10=3); planted keys are
        # shuffled so file order can't accidentally match rank order
        keys = np.arange(100, 123)
        rng = np.random.default_rng(1)
        rng.shuffle(keys)
        pd.DataFrame({"o_orderkey": keys, "o_custkey": 1,
                      "o_orderstatus": "O", "o_totalprice": 55.5,
                      "o_orderdate": pd.Timestamp("2024-01-01"),
                      "o_orderpriority": "1-URGENT"}).to_parquet(
            f"{tmp_path}/orders.parquet", index=False)
        got = ntile_orders(str(tmp_path)).to_pandas()
        assert got["n_orders"].tolist() == [3, 3, 3, 2, 2, 2, 2, 2, 2, 2]
        # decile 1 must hold exactly orderkeys 100,101,102
        assert got.loc[0, "sum_price_r"] == round(3 * 55.5, 2)
        assert (got["min_price"] == 55.5).all()

    def test_small_n_fewer_rows_than_tiles(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import ntile_orders

        # n=3 < 10 tiles: SQL NTILE leaves tiles 4..10 EMPTY (no rows),
        # deciles 1..3 hold one row each
        pd.DataFrame({"o_orderkey": [1, 2, 3], "o_custkey": 1,
                      "o_orderstatus": "O",
                      "o_totalprice": [30.0, 10.0, 20.0],
                      "o_orderdate": pd.Timestamp("2024-01-01"),
                      "o_orderpriority": "1-URGENT"}).to_parquet(
            f"{tmp_path}/orders.parquet", index=False)
        got = ntile_orders(str(tmp_path)).to_pandas()
        assert got["decile"].tolist() == [1, 2, 3]
        assert got["min_price"].tolist() == [10.0, 20.0, 30.0]


class TestFirstSeenCurve:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            DAY_US, first_seen_curve)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts"]).to_pandas()
        d = (ev["ts"].astype("int64") // DAY_US) * DAY_US
        first = d.groupby(ev["user_id"]).min()
        got = first_seen_curve(SF).to_pandas()
        # calendar-complete frame, monotone cumulative, totals agree
        assert (np.diff(got["day_us"]) == DAY_US).all()
        assert got["new_users"].sum() == ev["user_id"].nunique()
        assert got["cum_users"].iloc[-1] == ev["user_id"].nunique()
        want = first.value_counts().sort_index()
        sub = got.set_index("day_us").loc[want.index, "new_users"]
        assert sub.tolist() == want.tolist()

    def test_planted_gap_days(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import first_seen_curve

        # users 1,2 first appear day 0; user 1 returns day 3 (no new);
        # user 3 first appears day 3 -> day 1,2 are explicit zero rows
        t0 = pd.Timestamp("2024-01-01")
        pd.DataFrame({
            "user_id": [1, 2, 1, 3],
            "ts": [t0, t0, t0 + pd.Timedelta(days=3),
                   t0 + pd.Timedelta(days=3)],
            "event_type": "e", "value": 0.0,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = first_seen_curve(str(tmp_path)).to_pandas()
        assert got["new_users"].tolist() == [2, 0, 0, 1]
        assert got["cum_users"].tolist() == [2, 2, 2, 3]


class TestWeightedMedian:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import weighted_median

        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_extendedprice",
                                    "l_quantity"]).to_pandas()
        cents = np.floor(li["l_extendedprice"].to_numpy() * 100.0
                         + 0.5).astype(np.int64)
        w = np.rint(li["l_quantity"].to_numpy()).astype(np.int64)
        order = np.argsort(cents, kind="stable")
        cw = np.cumsum(w[order])
        W = int(cw[-1])
        want = cents[order][int(np.searchsorted(cw, (W + 1) // 2))]
        got = weighted_median(SF).to_pandas()
        assert got["total_weight"].iloc[0] == W
        assert got["median_price"].iloc[0] == want / 100.0

    def test_planted_weights_shift_the_median(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import weighted_median

        # unweighted median of {10,20,30} is 20; weight 30 heavily ->
        # weighted median jumps to 30 (cum: 1,2,12; k=(12+1)//2=6 -> 30)
        pd.DataFrame({
            "l_extendedprice": [10.0, 20.0, 30.0],
            "l_quantity": [1.0, 1.0, 10.0],
            "l_orderkey": [1, 2, 3], "l_partkey": 1, "l_suppkey": 1,
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = weighted_median(str(tmp_path)).to_pandas()
        assert got["median_price"].iloc[0] == 30.0
        assert got["total_weight"].iloc[0] == 12

    def test_tie_inclusive_boundary(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import weighted_median

        # W=4, k=2: cumw(10)=2 -> 2*2 >= 4, the LOWER median is 10
        pd.DataFrame({
            "l_extendedprice": [10.0, 10.0, 20.0, 20.0],
            "l_quantity": [1.0, 1.0, 1.0, 1.0],
            "l_orderkey": [1, 2, 3, 4], "l_partkey": 1, "l_suppkey": 1,
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = weighted_median(str(tmp_path)).to_pandas()
        assert got["median_price"].iloc[0] == 10.0


class TestChi2Events:
    def test_matches_scipy_free_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import DAY_US, chi2_events

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "event_type"]).to_pandas()
        ev = ev.dropna(subset=["event_type"])
        dow = ((ev["ts"].astype("int64") // DAY_US) + 3) % 7 + 1
        obs = pd.crosstab(ev["event_type"], dow).to_numpy(dtype=np.float64)
        exp = obs.sum(1)[:, None] * obs.sum(0)[None, :] / obs.sum()
        want = float(((obs - exp) ** 2 / exp).sum())
        got = chi2_events(SF).to_pandas()
        assert abs(got["chi2_r"].iloc[0] - want) < 5e-4
        assert got["dof"].iloc[0] == (obs.shape[0] - 1) * (obs.shape[1] - 1)
        assert got["n"].iloc[0] == len(ev)

    def test_absent_cells_contribute_expected(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import chi2_events

        # 2x2 design with one EMPTY cell: type b never occurs on Tuesday
        # (2024-01-02); brute includes the absent cell's exp term
        mon = pd.Timestamp("2024-01-01")  # Monday
        tue = pd.Timestamp("2024-01-02")
        rows = [("a", mon)] * 4 + [("a", tue)] * 4 + [("b", mon)] * 4
        pd.DataFrame({
            "event_type": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": 1, "value": 0.0,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        obs = np.array([[4.0, 4.0], [4.0, 0.0]])
        exp = obs.sum(1)[:, None] * obs.sum(0)[None, :] / obs.sum()
        want = float(((obs - exp) ** 2 / exp).sum())
        got = chi2_events(str(tmp_path)).to_pandas()
        assert abs(got["chi2_r"].iloc[0] - want) < 5e-4
        assert got["dof"].iloc[0] == 1


class TestActivityIslands:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            DAY_US, activity_islands)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts"]).to_pandas()
        ev["day"] = ev["ts"].astype("int64") // DAY_US
        got = activity_islands(SF).to_pandas().set_index("user_id")
        for uid, sub in ev.groupby("user_id"):
            days = np.sort(sub["day"].unique())
            runs = np.split(days, np.flatnonzero(np.diff(days) > 1) + 1)
            assert got.loc[uid, "n_islands"] == len(runs)
            assert got.loc[uid, "longest_days"] == max(len(r) for r in runs)
            assert got.loc[uid, "active_days"] == days.size

    def test_planted_streaks(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import activity_islands

        t0 = pd.Timestamp("2024-01-01")
        # user 1: days 0,1,2 then 5,6 -> 2 islands, longest 3, active 5
        # (day 1 has TWO events: distinctness must collapse them)
        offs = [0, 1, 1, 2, 5, 6]
        pd.DataFrame({
            "user_id": 1,
            "ts": [t0 + pd.Timedelta(days=o) for o in offs],
            "event_type": "e", "value": 0.0,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = activity_islands(str(tmp_path)).to_pandas()
        assert got.iloc[0].tolist() == [1, 2, 3, 5]


class TestRollupRevenue:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import rollup_revenue

        o = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_orderdate", "o_orderpriority",
                                   "o_totalprice"]).to_pandas()
        o["yr"] = o["o_orderdate"].dt.year
        o["cents"] = np.floor(o["o_totalprice"] * 100.0
                              + 0.5).astype(np.int64)
        got = rollup_revenue(SF).to_pandas()
        fine = got[(got["o_year"] >= 0)
                   & (got["o_orderpriority"] != "ALL")]
        want = o.groupby(["yr", "o_orderpriority"]).agg(
            n=("cents", "size"), c=("cents", "sum"))
        assert len(fine) == len(want)
        grand = got[got["o_year"] == -1]
        assert len(grand) == 1
        assert grand["n_orders"].iloc[0] == len(o)
        assert grand["revenue_r"].iloc[0] == round(
            o["cents"].sum() / 100.0, 2)
        # year margins: n equals the year's row count
        yr_m = got[(got["o_year"] >= 0) & (got["o_orderpriority"] == "ALL")]
        for _, r in yr_m.iterrows():
            assert r["n_orders"] == (o["yr"] == r["o_year"]).sum()

    def test_margin_exactness_int_cents(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import rollup_revenue

        # prices that are float-hostile (x.x5 cents boundaries): margins
        # must equal the integer-cent sums exactly
        pd.DataFrame({
            "o_orderkey": [1, 2, 3],
            "o_custkey": 1, "o_orderstatus": "O",
            "o_totalprice": [0.05, 0.15, 0.25],
            "o_orderdate": pd.Timestamp("2024-06-01"),
            "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH"],
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        got = rollup_revenue(str(tmp_path)).to_pandas()
        grand = got[got["o_year"] == -1]["revenue_r"].iloc[0]
        assert grand == 0.45


class TestUnpivotTypeStats:
    def test_long_form_matches_wide_aggregate(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            UNPIVOT_STATS, unpivot_type_stats)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "value"]).to_pandas()
        ev = ev.dropna()
        got = unpivot_type_stats(SF).to_pandas()
        types = ev["event_type"].nunique()
        assert len(got) == types * len(UNPIVOT_STATS)
        g = got.set_index(["event_type", "stat"])["value"]
        for t, sub in ev.groupby("event_type"):
            assert g.loc[(t, "n_events")] == float(len(sub))
            assert abs(g.loc[(t, "sum_value_r")]
                       - sub["value"].sum()) < 1e-3
            assert g.loc[(t, "min_value_r")] == round(
                sub["value"].min(), 4)


class TestWowGrowth:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            WEEK_US, wow_growth)

        ts = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts"])["ts"].to_pandas().astype("int64")
        day = ts // (WEEK_US // 7)
        wk = (day - (day + 3) % 7) * (WEEK_US // 7)
        counts = wk.value_counts().sort_index()
        grid = np.arange(counts.index.min(),
                         counts.index.max() + WEEK_US, WEEK_US)
        n = counts.reindex(grid, fill_value=0).to_numpy(dtype=np.int64)
        got = wow_growth(SF).to_pandas()
        exp_rows = [(int(grid[i]), int(n[i]),
                     round((n[i] - n[i - 1]) / n[i - 1], 4))
                    for i in range(1, len(grid)) if n[i - 1] > 0]
        assert len(got) == len(exp_rows)
        for (w, ne, p), (_, r) in zip(exp_rows, got.iterrows()):
            assert r["week_us"] == w and r["n_events"] == ne
            assert abs(r["pct_change_r"] - p) < 5e-5

    def test_gap_week_and_zero_prev_drop(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import wow_growth

        # week0 (Mon 2024-01-01): 4 events; week1: none; week2: 2 events
        # -> week1 row emitted (pct = -1.0), week2 dropped (prev == 0)
        mon = pd.Timestamp("2024-01-01")
        rows = [mon + pd.Timedelta(days=d) for d in (0, 1, 2, 3)] + \
               [mon + pd.Timedelta(days=14), mon + pd.Timedelta(days=15)]
        pd.DataFrame({"ts": rows, "user_id": 1, "event_type": "e",
                      "value": 0.0}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = wow_growth(str(tmp_path)).to_pandas()
        assert len(got) == 1
        assert got["n_events"].iloc[0] == 0
        assert got["pct_change_r"].iloc[0] == -1.0


class TestEventsAutocorr:
    def test_matches_numpy_corrcoef(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            DAY_US, events_autocorr)

        ts = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts"])["ts"].to_pandas().astype("int64")
        d = (ts // DAY_US) * DAY_US
        counts = d.value_counts().sort_index()
        grid = np.arange(counts.index.min(),
                         counts.index.max() + DAY_US, DAY_US)
        n = counts.reindex(grid, fill_value=0).to_numpy(dtype=np.float64)
        want = float(np.corrcoef(n[:-1], n[1:])[0, 1])
        got = events_autocorr(SF).to_pandas()
        assert got["n_days"].iloc[0] == len(grid)
        assert abs(got["autocorr_r"].iloc[0] - want) < 5e-4

    def test_planted_alternating_series(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import events_autocorr

        # daily counts 1,3,1,3,1,3 -> lag-1 correlation exactly -1
        t0 = pd.Timestamp("2024-01-01")
        rows = []
        for i in range(6):
            rows += [t0 + pd.Timedelta(days=i)] * (1 if i % 2 == 0 else 3)
        pd.DataFrame({"ts": rows, "user_id": 1, "event_type": "e",
                      "value": 0.0}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = events_autocorr(str(tmp_path)).to_pandas()
        assert got["n_days"].iloc[0] == 6
        assert got["autocorr_r"].iloc[0] == -1.0


class TestTypeOverlap:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import type_overlap

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "event_type"]).to_pandas()
        ev = ev.dropna(subset=["event_type"]).drop_duplicates()
        sets = {t: set(sub["user_id"])
                for t, sub in ev.groupby("event_type")}
        got = type_overlap(SF).to_pandas()
        want = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            c = len(sets[a] & sets[b])
            if c:
                want[(a, b)] = (c, round(c / min(len(sets[a]),
                                                 len(sets[b])), 4))
        assert len(got) == len(want)
        for _, r in got.iterrows():
            c, ov = want[(r["type_a"], r["type_b"])]
            assert r["n_common"] == c
            assert abs(r["overlap_r"] - ov) < 5e-5

    def test_planted_subset_overlap(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import type_overlap

        # users 1..4 do "a"; users 1..2 do "b"; user 9 does "c" only
        # -> (a,b): common 2, min marginal 2 -> overlap 1.0; no (a,c)/(b,c)
        rows = [(u, "a") for u in (1, 2, 3, 4)] + \
               [(u, "b") for u in (1, 2)] + [(9, "c")]
        pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "ts": pd.Timestamp("2024-01-01"), "value": 0.0,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = type_overlap(str(tmp_path)).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert (r["type_a"], r["type_b"]) == ("a", "b")
        assert r["n_common"] == 2 and r["overlap_r"] == 1.0


class TestRegrValueTrend:
    def test_matches_numpy_polyfit(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            DAY_US, regr_value_trend)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "event_type", "value"]).to_pandas()
        ev = ev.dropna(subset=["ts", "event_type", "value"])
        got = regr_value_trend(SF).to_pandas()
        for _, r in got.iterrows():
            sub = ev[ev["event_type"] == r["event_type"]]
            x = (sub["ts"].astype("int64") // DAY_US).to_numpy(np.float64)
            y = sub["value"].to_numpy(np.float64)
            slope, icept = np.polyfit(x, y, 1)
            assert r["n_events"] == len(sub)
            assert abs(r["slope_r"] - slope) < 5e-4
            assert abs(r["intercept_r"] - icept) < max(
                5e-4, abs(icept) * 1e-6)
        # types whose events all land on one epoch-day have zero
        # x-variance and are dropped by design — exclude them here
        days = ev["ts"].astype("int64") // DAY_US
        n_varying = sum(1 for _, s in days.groupby(ev["event_type"])
                        if s.nunique() > 1)
        assert len(got) == n_varying

    def test_planted_exact_line(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import regr_value_trend

        # type "up": value = 2.5 + 0.25/day on days 0..3 -> exact fit;
        # type "flat": all on ONE day -> zero x-variance, dropped
        t0 = pd.Timestamp("1970-01-01")
        rows = [(t0 + pd.Timedelta(days=d), "up", 2.5 + 0.25 * d)
                for d in range(4)]
        rows += [(t0, "flat", 1.0), (t0, "flat", 9.0)]
        pd.DataFrame({"ts": [r[0] for r in rows],
                      "event_type": [r[1] for r in rows],
                      "value": [r[2] for r in rows],
                      "user_id": 1}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = regr_value_trend(str(tmp_path)).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert r["event_type"] == "up" and r["n_events"] == 4
        assert r["slope_r"] == 0.25 and r["intercept_r"] == 2.5


class TestDailyReconcile:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            DAY_US, daily_reconcile)

        od = (pq.read_table(f"{SF}/orders.parquet",
                            columns=["o_orderdate"])["o_orderdate"]
              .to_pandas().astype("int64") // DAY_US * DAY_US)
        sd = (pq.read_table(f"{SF}/lineitem.parquet",
                            columns=["l_shipdate"])["l_shipdate"]
              .to_pandas().astype("int64") // DAY_US * DAY_US)
        a, b = od.value_counts(), sd.value_counts()
        got = daily_reconcile(SF).to_pandas()
        days = sorted(set(a.index) | set(b.index))
        assert got["day_us"].tolist() == days
        for _, r in got.iterrows():
            na = int(a.get(r["day_us"], 0))
            nb = int(b.get(r["day_us"], 0))
            assert r["n_orders"] == na and r["n_ship_lines"] == nb
            assert r["status"] == ("both" if na and nb else
                                   "orders_only" if na else "ship_only")

    def test_planted_disjoint_days(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import daily_reconcile

        d = pd.Timestamp("2024-03-01")
        pd.DataFrame({"o_orderkey": [1, 2], "o_custkey": 1,
                      "o_totalprice": 1.0,
                      "o_orderdate": [d, d + pd.Timedelta(days=1)],
                      "o_orderstatus": "O", "o_orderpriority": "1-URGENT"}
                     ).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        pd.DataFrame({"l_orderkey": [1, 1, 2], "l_partkey": 1,
                      "l_suppkey": 1, "l_linenumber": [1, 2, 1],
                      "l_quantity": 1.0, "l_extendedprice": 1.0,
                      "l_discount": 0.0, "l_tax": 0.0,
                      "l_returnflag": "N", "l_linestatus": "O",
                      "l_shipdate": [d + pd.Timedelta(days=1),
                                     d + pd.Timedelta(days=1),
                                     d + pd.Timedelta(days=9)]}
                     ).to_parquet(f"{tmp_path}/lineitem.parquet",
                                  index=False)
        got = daily_reconcile(str(tmp_path)).to_pandas()
        assert got["status"].tolist() == ["orders_only", "both",
                                          "ship_only"]
        assert got["n_orders"].tolist() == [1, 1, 0]
        assert got["n_ship_lines"].tolist() == [0, 2, 1]


class TestGiniActivity:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import gini_activity

        u = pq.read_table(f"{SF}/events.parquet",
                          columns=["user_id"])["user_id"].to_pandas()
        counts = np.sort(u.value_counts().to_numpy(dtype=np.int64))
        n, tot = counts.size, int(counts.sum())
        iw = int((np.arange(1, n + 1, dtype=np.int64) * counts).sum())
        want = (2 * iw - (n + 1) * tot) / (n * tot)
        got = gini_activity(SF).to_pandas()
        assert got["n_users"].iloc[0] == n
        assert got["n_events"].iloc[0] == tot
        assert abs(got["gini_r"].iloc[0] - want) < 5e-5

    def test_planted_extremes(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import gini_activity

        # perfectly equal: 4 users x 3 events -> gini 0
        t = pd.Timestamp("2024-01-01")
        eq = pd.DataFrame({"user_id": np.repeat([1, 2, 3, 4], 3),
                           "ts": t, "event_type": "e", "value": 0.0})
        eq.to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = gini_activity(str(tmp_path)).to_pandas()
        assert got["gini_r"].iloc[0] == 0.0
        # concentrated: counts [1, 1, 1, 97] -> rank formula exactly
        cc = pd.DataFrame({"user_id": np.concatenate(
            [np.array([1, 2, 3]), np.full(97, 4)]),
            "ts": t, "event_type": "e", "value": 0.0})
        cc.to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = gini_activity(str(tmp_path)).to_pandas()
        n, tot = 4, 100
        iw = 1 * 1 + 2 * 1 + 3 * 1 + 4 * 97
        want = round((2 * iw - (n + 1) * tot) / (n * tot), 4)
        assert got["n_users"].iloc[0] == 4
        assert got["gini_r"].iloc[0] == want


class TestMannWhitneyValue:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import mannwhitney_value

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "value"]).to_pandas()
        ev = ev.dropna()
        cents = np.copysign(np.floor(np.abs(ev["value"].to_numpy() * 100.0)
                                     + 0.5), ev["value"].to_numpy())
        ranks = pd.Series(cents).rank(method="average")
        got = mannwhitney_value(SF).to_pandas()
        N = len(ev)
        T = sum(c ** 3 - c for c in
                pd.Series(cents).value_counts().tolist())
        for _, r in got.iterrows():
            m = (ev["event_type"] == r["event_type"]).to_numpy()
            n1 = int(m.sum())
            R = float(ranks[m].sum())
            u = R - n1 * (n1 + 1) / 2.0
            assert r["n_type"] == n1
            assert r["u2"] == int(round(2 * u))
            n2 = N - n1
            var = n1 * n2 / 12.0 * ((N + 1) - T / (N * (N - 1)))
            z = (u - n1 * n2 / 2.0) / np.sqrt(var)
            assert abs(r["z_r"] - z) < 5e-4
        assert len(got) == ev["event_type"].nunique()

    def test_planted_separated_and_tied(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import mannwhitney_value

        t = pd.Timestamp("2024-01-01")
        # 'a' strictly below 'b': U_a = 0, U_b = 9
        df = pd.DataFrame({
            "ts": t, "user_id": 1,
            "event_type": list("aaabbb"),
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})
        df.to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = mannwhitney_value(str(tmp_path)).to_pandas()
        byt = got.set_index("event_type")
        assert byt.loc["a", "u2"] == 0
        assert byt.loc["b", "u2"] == 18
        assert byt.loc["a", "z_r"] == -byt.loc["b", "z_r"]
        # all values tied -> zero variance -> z NULL, u2 still exact
        df["value"] = 7.0
        df.to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = mannwhitney_value(str(tmp_path)).to_pandas()
        assert got["z_r"].isna().all()
        # avg rank 3.5 each: 2R = 3*7 = 21, u2 = 21 - 3*4 = 9 per type
        assert (got["u2"] == 9).all()
        # single type -> empty rest -> z NULL
        df["event_type"] = "a"
        df.to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = mannwhitney_value(str(tmp_path)).to_pandas()
        assert len(got) == 1 and got["z_r"].isna().all()


class TestSlidingDistinctUsers:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            DAY_US, sliding_distinct_users)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts"]).to_pandas().dropna()
        day = ev["ts"].astype("int64") // DAY_US
        pairs = pd.DataFrame({"u": ev["user_id"], "d": day}
                             ).drop_duplicates()
        got = sliding_distinct_users(SF).to_pandas()
        lo, hi = int(day.min()), int(day.max())
        assert len(got) == hi - lo + 1
        for _, r in got.iterrows():
            g = r["day_us"] // DAY_US
            want = pairs[(pairs["d"] >= g - 6) & (pairs["d"] <= g)][
                "u"].nunique()
            assert r["n_active_7d"] == want

    def test_planted_window_merge(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            DAY_US, sliding_distinct_users)

        t0 = pd.Timestamp("1970-01-01")
        # user 1 on days 0 and 3 (coverage merges to [0, 9]);
        # user 2 on day 10 only
        rows = [(t0, 1), (t0 + pd.Timedelta(days=3), 1),
                (t0 + pd.Timedelta(days=10), 2)]
        pd.DataFrame({"ts": [r[0] for r in rows],
                      "user_id": [r[1] for r in rows],
                      "event_type": "e", "value": 0.0}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = sliding_distinct_users(str(tmp_path)).to_pandas()
        lvl = got.set_index(got["day_us"] // DAY_US)["n_active_7d"]
        assert len(got) == 11
        for d in range(10):
            assert lvl[d] == 1, d     # user 1 covers days 0..9
        assert lvl[10] == 1           # only user 2 (user 1 expired)


class TestEmaDailyValue:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            DAY_US, ema_daily_value)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "value"]).to_pandas().dropna()
        day = (ev["ts"].astype("int64") // DAY_US) * DAY_US
        cents = np.copysign(np.floor(np.abs(ev["value"].to_numpy()
                                            * 100.0) + 0.5),
                            ev["value"].to_numpy()).astype(np.int64)
        per = pd.Series(cents).groupby(day.to_numpy()).sum()
        got = ema_daily_value(SF).to_pandas()
        ema = None
        for _, r in got.iterrows():
            x = int(per.get(r["day_us"], 0)) / 100.0
            assert r["daily_value"] == x
            ema = x if ema is None else 0.2 * x + 0.8 * ema
            assert abs(r["ema_r"] - ema) < 5e-5

    def test_planted_zero_fill(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import ema_daily_value

        t0 = pd.Timestamp("1970-01-01")
        # day 0: 100.0, day 1: ABSENT (zero-filled), day 2: 50.0
        pd.DataFrame({"ts": [t0, t0 + pd.Timedelta(days=2)],
                      "user_id": 1, "event_type": "e",
                      "value": [100.0, 50.0]}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = ema_daily_value(str(tmp_path)).to_pandas()
        assert got["daily_value"].tolist() == [100.0, 0.0, 50.0]
        assert got["ema_r"].tolist() == [100.0, 80.0, 74.0]


class TestSpearmanCorr:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import spearman_corr

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "value"]).to_pandas().dropna()
        cents = np.copysign(np.floor(np.abs(ev["value"].to_numpy()
                                            * 100.0) + 0.5),
                            ev["value"].to_numpy())
        hour = (ev["ts"].astype("int64") // 3_600_000_000) % 24
        rx = pd.Series(cents).rank(method="average").to_numpy()
        ry = pd.Series(hour.to_numpy()).rank(method="average").to_numpy()
        want = np.corrcoef(rx, ry)[0, 1]
        got = spearman_corr(SF).to_pandas()
        assert got["n_events"].iloc[0] == len(ev)
        assert abs(got["rho_r"].iloc[0] - want) < 5e-4

    def test_planted_monotone_and_constant(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import spearman_corr

        t0 = pd.Timestamp("1970-01-01")
        hrs = [t0 + pd.Timedelta(hours=h) for h in range(6)]
        # value strictly increasing with hour -> rho exactly 1
        pd.DataFrame({"ts": hrs, "user_id": 1, "event_type": "e",
                      "value": [float(h + 1) for h in range(6)]}
                     ).to_parquet(f"{tmp_path}/events.parquet",
                                  index=False)
        got = spearman_corr(str(tmp_path)).to_pandas()
        assert got["rho_r"].iloc[0] == 1.0
        # strictly decreasing -> -1
        pd.DataFrame({"ts": hrs, "user_id": 1, "event_type": "e",
                      "value": [float(6 - h) for h in range(6)]}
                     ).to_parquet(f"{tmp_path}/events.parquet",
                                  index=False)
        got = spearman_corr(str(tmp_path)).to_pandas()
        assert got["rho_r"].iloc[0] == -1.0
        # constant value -> zero variance -> NULL
        pd.DataFrame({"ts": hrs, "user_id": 1, "event_type": "e",
                      "value": 3.0}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = spearman_corr(str(tmp_path)).to_pandas()
        assert got["rho_r"].isna().all()


class TestKsTestValue:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import ks_test_value

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "value"]).to_pandas()
        ev = ev.dropna()
        cents = np.copysign(np.floor(np.abs(ev["value"].to_numpy()
                                            * 100.0) + 0.5),
                            ev["value"].to_numpy()).astype(np.int64)
        got = ks_test_value(SF).to_pandas()
        support = np.unique(cents)
        N = len(ev)
        for _, r in got.iterrows():
            m = (ev["event_type"] == r["event_type"]).to_numpy()
            n1, n2 = int(m.sum()), N - int(m.sum())
            cumt = np.searchsorted(np.sort(cents[m]), support, "right")
            cum = np.searchsorted(np.sort(cents), support, "right")
            d_num = int(np.max(np.abs(cumt * n2 - (cum - cumt) * n1)))
            assert r["n_type"] == n1
            assert r["d_num"] == d_num
            assert abs(r["d_r"] - d_num / (n1 * n2)) < 5e-5
        assert len(got) == ev["event_type"].nunique()

    def test_planted_disjoint(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import ks_test_value

        t = pd.Timestamp("2024-01-01")
        # 'a' entirely below 'b' -> D = 1.0 exactly
        pd.DataFrame({"ts": t, "user_id": 1,
                      "event_type": list("aabb"),
                      "value": [1.0, 2.0, 3.0, 4.0]}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = ks_test_value(str(tmp_path)).to_pandas().set_index(
            "event_type")
        assert got.loc["a", "d_num"] == 4 and got.loc["a", "d_r"] == 1.0
        assert got.loc["b", "d_num"] == 4 and got.loc["b", "d_r"] == 1.0
        # identical distributions -> D = 0
        pd.DataFrame({"ts": t, "user_id": 1,
                      "event_type": list("abab"),
                      "value": [5.0, 5.0, 6.0, 6.0]}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = ks_test_value(str(tmp_path)).to_pandas()
        assert (got["d_num"] == 0).all() and (got["d_r"] == 0.0).all()


class TestCrossCorrTypes:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            DAY_US, cross_corr_types)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "ts"]).to_pandas()
        ev = ev.dropna()
        ev = ev[ev["event_type"].isin(["click", "purchase"])]
        day = ev["ts"].astype("int64") // DAY_US
        lo, hi = int(day.min()), int(day.max())
        size = hi - lo + 1
        x = np.zeros(size, dtype=np.int64)
        y = np.zeros(size, dtype=np.int64)
        for (d, et), n in ev.groupby([day, "event_type"]).size().items():
            (x if et == "click" else y)[int(d) - lo] = n
        got = cross_corr_types(SF).to_pandas().set_index("lag")
        for L in range(-3, 4):
            a = x[:size - L] if L > 0 else x[-L:]
            b = y[L:] if L > 0 else y[:size + L] if L < 0 else y
            assert got.loc[L, "n_pairs"] == a.size
            if a.size > 1 and a.std() > 0 and b.std() > 0:
                want = np.corrcoef(a, b)[0, 1]
                assert abs(got.loc[L, "xcorr_r"] - want) < 5e-4

    def test_planted_lead(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import cross_corr_types

        t0 = pd.Timestamp("1970-01-01")
        rows = []
        for d in range(5):  # clicks ramp on days 0-4
            rows += [(t0 + pd.Timedelta(days=d), "click")] * (d + 1)
        for d in range(5):  # purchases repeat the ramp on days 2-6
            rows += [(t0 + pd.Timedelta(days=d + 2), "purchase")] * (d + 1)
        pd.DataFrame({"ts": [r[0] for r in rows],
                      "event_type": [r[1] for r in rows],
                      "user_id": 1, "value": 0.0}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = cross_corr_types(str(tmp_path)).to_pandas().set_index("lag")
        assert got.loc[2, "xcorr_r"] == 1.0   # clicks lead by 2 days
        assert got.loc[2, "n_pairs"] == 5
        assert got.loc[-3, "xcorr_r"] < 1.0


class TestCusumChangepoint:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            DAY_US, cusum_changepoint)

        ts = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts"]).to_pandas()["ts"].dropna()
        day = ts.astype("int64") // DAY_US
        lo, hi = int(day.min()), int(day.max())
        cnt = np.zeros(hi - lo + 1, dtype=np.int64)
        for d, n in day.value_counts().items():
            cnt[int(d) - lo] = n
        D, S = cnt.size, int(cnt.sum())
        cum = np.cumsum(cnt)
        stat = np.abs(D * cum - np.arange(1, D + 1) * S)
        best = int(stat.max())
        got = cusum_changepoint(SF).to_pandas()
        assert got["n_days"].iloc[0] == D
        assert got["peak_num"].iloc[0] == best
        assert got["change_day_us"].iloc[0] == (
            (lo + int(np.argmax(stat))) * DAY_US)
        assert abs(got["peak_r"].iloc[0] - best / D) < 5e-5

    def test_planted_level_shift(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            DAY_US, cusum_changepoint)

        t0 = pd.Timestamp("1970-01-01")
        rows = []
        for d, n in enumerate([1, 1, 1, 5, 5, 5]):
            rows += [t0 + pd.Timedelta(days=d)] * n
        pd.DataFrame({"ts": rows, "user_id": 1, "event_type": "e",
                      "value": 0.0}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = cusum_changepoint(str(tmp_path)).to_pandas()
        # D=6, S=18, peak |6·3 − 3·18| = 36 at day 2 (the last low day)
        assert got["peak_num"].iloc[0] == 36
        assert got["change_day_us"].iloc[0] == 2 * DAY_US
        assert got["peak_r"].iloc[0] == 6.0


class TestBenfordValues:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import benford_values

        v = pq.read_table(f"{SF}/events.parquet",
                          columns=["value"]).to_pandas()["value"].dropna()
        cents = np.copysign(np.floor(np.abs(v.to_numpy() * 100.0) + 0.5),
                            v.to_numpy()).astype(np.int64)
        cents = cents[cents > 0]
        digits = np.array([int(str(c)[0]) for c in cents.tolist()])
        got = benford_values(SF).to_pandas()
        want = pd.Series(digits).value_counts().sort_index()
        assert got["digit"].tolist() == want.index.tolist()
        assert got["n"].tolist() == want.tolist()
        for _, r in got.iterrows():
            assert abs(r["benford_r"]
                       - np.log10(1 + 1 / r["digit"])) < 5e-5

    def test_planted_digits(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import benford_values

        t = pd.Timestamp("2024-01-01")
        # cents: 100 -> 1, 200 -> 2, 999 -> 9; 0.004 -> cents 0 dropped
        pd.DataFrame({"ts": t, "user_id": 1, "event_type": "e",
                      "value": [1.0, 2.0, 9.99, 0.004]}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = benford_values(str(tmp_path)).to_pandas()
        assert got["digit"].tolist() == [1, 2, 9]
        assert got["n"].tolist() == [1, 1, 1]
        assert (got["pct_r"] == 0.3333).all()


class TestErrorBursts:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import error_bursts

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "event_id",
                                    "event_type"]).to_pandas()
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        want: dict[int, int] = {}
        for _, sub in ev.groupby("user_id"):
            run = 0
            for et in sub["event_type"]:
                if et == "error":
                    run += 1
                elif run:
                    want[run] = want.get(run, 0) + 1
                    run = 0
            if run:
                want[run] = want.get(run, 0) + 1
        got = error_bursts(SF).to_pandas()
        assert dict(zip(got["run_len"], got["n_runs"])) == want

    def test_planted_runs(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import error_bursts

        t0 = pd.Timestamp("1970-01-01")
        rows = [(1, 0, "error"), (1, 1, "error"), (1, 2, "click"),
                (1, 3, "error"),
                (2, 0, "error"), (2, 1, "error"), (2, 2, "error")]
        pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": [t0 + pd.Timedelta(seconds=r[1]) for r in rows],
            "event_id": range(len(rows)),
            "event_type": [r[2] for r in rows],
            "value": 0.0}).to_parquet(f"{tmp_path}/events.parquet",
                                      index=False)
        got = error_bursts(str(tmp_path)).to_pandas()
        assert dict(zip(got["run_len"], got["n_runs"])) == {1: 1, 2: 1,
                                                            3: 1}


class TestTheilsenTrend:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            DAY_US, theilsen_trend)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "value"]).to_pandas().dropna()
        day = ev["ts"].astype("int64") // DAY_US
        cents = np.copysign(np.floor(np.abs(ev["value"].to_numpy()
                                            * 100.0) + 0.5),
                            ev["value"].to_numpy()).astype(np.int64)
        per = pd.Series(cents).groupby(day.to_numpy()).sum()
        lo, hi = int(day.min()), int(day.max())
        c = np.zeros(hi - lo + 1, dtype=np.int64)
        for d, s in per.items():
            c[int(d) - lo] = s
        ia, ib = np.triu_indices(c.size, k=1)
        slopes = (c[ib] - c[ia]) / (ib - ia) / 100.0
        got = theilsen_trend(SF).to_pandas()
        assert got["n_days"].iloc[0] == c.size
        assert got["n_pairs"].iloc[0] == slopes.size
        assert abs(got["slope_r"].iloc[0] - np.median(slopes)) < 5e-4

    def test_planted_outlier_robust(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import theilsen_trend

        t0 = pd.Timestamp("1970-01-01")
        # perfect unit line for 4 days, then a wild day-5 spike: the
        # median slope ignores it (least squares would not)
        pd.DataFrame({
            "ts": [t0 + pd.Timedelta(days=d) for d in range(5)],
            "user_id": 1, "event_type": "e",
            "value": [1.0, 2.0, 3.0, 4.0, 1000.0]}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = theilsen_trend(str(tmp_path)).to_pandas()
        assert got["n_pairs"].iloc[0] == 10
        assert got["slope_r"].iloc[0] == 1.0


class TestDivisionUsers:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import division_users

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "event_type"]).to_pandas()
        ev = ev.dropna()
        k = ev["event_type"].nunique()
        per = ev.groupby("user_id")["event_type"].nunique()
        want = sorted(per[per == k].index.tolist())
        got = division_users(SF).to_pandas()
        assert got["user_id"].tolist() == want
        assert (got["n_types"] == k).all()

    def test_planted_division(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import division_users

        t = pd.Timestamp("2024-01-01")
        pd.DataFrame({"user_id": [1, 1, 2], "ts": t,
                      "event_type": ["a", "b", "a"], "value": 0.0,
                      "event_id": [0, 1, 2]}).to_parquet(
            f"{tmp_path}/events.parquet", index=False)
        got = division_users(str(tmp_path)).to_pandas()
        assert got["user_id"].tolist() == [1]
        assert got["n_types"].tolist() == [2]


class TestUserGapQuantiles:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            user_gap_quantiles)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "event_id"]
                           ).to_pandas()
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        gaps = []
        for _, sub in ev.groupby("user_id"):
            t = sub["ts"].astype("int64").to_numpy()
            gaps += (np.diff(t) // 1_000_000).tolist()
        gaps = np.sort(np.array(gaps))
        got = user_gap_quantiles(SF).to_pandas()
        assert got["n_gaps"].iloc[0] == gaps.size
        n = gaps.size
        assert got["p50_gap_s"].iloc[0] == gaps[
            max(int(np.ceil(n * 0.5)), 1) - 1]
        assert got["p90_gap_s"].iloc[0] == gaps[
            max(int(np.ceil(n * 0.9)), 1) - 1]

    def test_planted_gaps(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            user_gap_quantiles)

        t0 = pd.Timestamp("1970-01-01")
        pd.DataFrame({
            "user_id": 1,
            "ts": [t0 + pd.Timedelta(seconds=s) for s in
                   [0, 1, 3, 10]],
            "event_id": range(4), "event_type": "e",
            "value": 0.0}).to_parquet(f"{tmp_path}/events.parquet",
                                      index=False)
        got = user_gap_quantiles(str(tmp_path)).to_pandas()
        # gaps [1, 2, 7]: p50 rank ceil(1.5)=2 -> 2, p90 ceil(2.7)=3 -> 7
        assert got["n_gaps"].iloc[0] == 3
        assert got["p50_gap_s"].iloc[0] == 2
        assert got["p90_gap_s"].iloc[0] == 7


class TestLatestEvents:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import latest_events

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "event_type", "ts",
                                    "event_id", "value"]).to_pandas()
        want = (ev.sort_values(["user_id", "event_type", "ts",
                                "event_id"])
                .drop_duplicates(subset=["user_id", "event_type"],
                                 keep="last")
                .sort_values(["user_id", "event_type"]))
        got = (latest_events(SF).to_pandas()
               .sort_values(["user_id", "event_type"]))
        assert got["event_id"].tolist() == want["event_id"].tolist()
        assert got["value"].tolist() == want["value"].tolist()
        assert got["ts_us"].tolist() == (
            want["ts"].astype("int64") // 1000).tolist() or \
            got["ts_us"].tolist() == want["ts"].astype("int64").tolist()

    def test_tie_break_on_event_id(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import latest_events

        t0 = pd.Timestamp("1970-01-02")
        pd.DataFrame({
            "user_id": [7, 7, 7],
            "event_type": ["click", "click", "click"],
            "ts": [t0, t0, t0 - pd.Timedelta(seconds=1)],
            "event_id": [3, 9, 11],
            "value": [1.0, 2.0, 3.0],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = latest_events(str(tmp_path)).to_pandas()
        # same ts: larger event_id wins; later ts beats larger id
        assert len(got) == 1
        assert got["event_id"].iloc[0] == 9
        assert got["value"].iloc[0] == 2.0


class TestWelchTtest:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import welch_ttest

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "value"]).to_pandas()
        a = ev.loc[ev["event_type"] == "purchase", "value"].to_numpy()
        b = ev.loc[ev["event_type"] == "click", "value"].to_numpy()
        # quantize at 4 dp like the engine contract
        a = np.round(np.copysign(np.floor(np.abs(a) * 1e4 + 0.5), a)) / 1e4
        b = np.round(np.copysign(np.floor(np.abs(b) * 1e4 + 0.5), b)) / 1e4
        v1, v2 = a.var(ddof=1), b.var(ddof=1)
        se1, se2 = v1 / a.size, v2 / b.size
        t = (a.mean() - b.mean()) / np.sqrt(se1 + se2)
        df = (se1 + se2) ** 2 / (se1 ** 2 / (a.size - 1)
                                 + se2 ** 2 / (b.size - 1))
        got = welch_ttest(SF).to_pandas()
        assert got["n_purchase"].iloc[0] == a.size
        assert got["n_click"].iloc[0] == b.size
        assert abs(got["t_r"].iloc[0] - t) < 1e-3
        assert abs(got["df_r"].iloc[0] - df) < max(1e-3 * df, 1e-3)

    def test_degenerate_missing_side(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import welch_ttest

        t0 = pd.Timestamp("1970-01-01")
        pd.DataFrame({
            "user_id": [1, 2, 3],
            "event_type": ["purchase", "purchase", "view"],
            "ts": [t0] * 3, "event_id": [1, 2, 3],
            "value": [1.0, 2.0, 3.0],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = welch_ttest(str(tmp_path)).to_pandas()
        assert got["n_purchase"].iloc[0] == 2
        assert got["n_click"].iloc[0] == 0
        assert pd.isna(got["t_r"].iloc[0])
        assert pd.isna(got["df_r"].iloc[0])


class TestBasketLift:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            BASKET_MIN_SUPPORT, BASKET_TOPK, basket_lift)

        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey", "l_partkey"]
                           ).to_pandas().drop_duplicates()
        n_orders = li["l_orderkey"].nunique()
        pc = li.groupby("l_partkey").size()
        pair_count: dict[tuple[int, int], int] = {}
        for _, seg in li.groupby("l_orderkey"):
            parts = sorted(seg["l_partkey"].tolist())
            for x, y in itertools.combinations(parts, 2):
                pair_count[(x, y)] = pair_count.get((x, y), 0) + 1
        rows = []
        for (x, y), nab in pair_count.items():
            if nab < BASKET_MIN_SUPPORT:
                continue
            lift = round(float(nab * n_orders)
                         / float(int(pc[x]) * int(pc[y])), 4)
            rows.append((x, y, nab, int(pc[x]), int(pc[y]), lift))
        rows.sort(key=lambda r: (-r[5], r[0], r[1]))
        want = rows[:BASKET_TOPK]
        got = basket_lift(SF).to_pandas()
        assert [tuple(r) for r in got.itertuples(index=False)] == want

    def test_planted_baskets(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import basket_lift

        # parts 1,2 co-occur in 2 of 4 baskets; each appears twice
        rows = [(100, 1), (100, 2), (101, 1), (101, 2),
                (102, 3), (103, 3), (102, 4), (103, 4)]
        pd.DataFrame({
            "l_orderkey": [r[0] for r in rows],
            "l_partkey": [r[1] for r in rows],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = basket_lift(str(tmp_path)).to_pandas()
        # (1,2): lift = 2*4/(2*2) = 2.0 ; (3,4): same
        assert len(got) == 2
        assert set(zip(got["part_a"], got["part_b"])) == {(1, 2), (3, 4)}
        assert (got["lift_r"] == 2.0).all()


class TestRollingMedianValue:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            DAY_US, ROLL_MED_WINDOW, rolling_median_value)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "value"]).to_pandas().dropna()
        day = (ev["ts"].astype("int64") // DAY_US) * DAY_US
        cents = np.copysign(
            np.floor(np.abs(ev["value"].to_numpy() * 100.0) + 0.5),
            ev["value"].to_numpy()).astype(np.int64)
        daily = pd.DataFrame({"d": day, "c": cents}).groupby("d")["c"].sum()
        days = np.arange(daily.index.min(),
                         daily.index.max() + DAY_US, DAY_US)
        x = pd.Series(0.0, index=days)
        x.loc[daily.index] = daily.to_numpy() / 100.0
        got = rolling_median_value(SF).to_pandas()
        assert got["day_us"].tolist() == days.tolist()
        for i in range(len(days)):
            w = np.sort(x.iloc[max(0, i - ROLL_MED_WINDOW + 1):i + 1]
                        .to_numpy())
            h = 0.5 * (w.size - 1)
            f = int(np.floor(h))
            frac = h - f
            med = w[f] if frac == 0.0 else (w[f] * (1 - frac)
                                            + w[f + 1] * frac)
            assert got["n_win"].iloc[i] == min(i + 1, ROLL_MED_WINDOW)
            assert abs(got["med_r"].iloc[i] - med) < 1e-6

    def test_planted_series(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            rolling_median_value)

        t0 = pd.Timestamp("1970-01-01")
        # daily totals 1,2,...,10 — trailing-7 median of day i (1-based,
        # i>=7) is i-3
        pd.DataFrame({
            "user_id": 1,
            "ts": [t0 + pd.Timedelta(days=i) for i in range(10)],
            "event_id": range(10), "event_type": "e",
            "value": [float(i + 1) for i in range(10)],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = rolling_median_value(str(tmp_path)).to_pandas()
        assert got["med_r"].tolist()[6:] == [4.0, 5.0, 6.0, 7.0]
        # day 2 (n=2): interpolated median of {1,2} = 1.5
        assert got["med_r"].iloc[1] == 1.5


class TestTriangleCount:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            TRI_MIN_SUPPORT, triangle_count)

        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey", "l_partkey"]
                           ).to_pandas().drop_duplicates()
        pair_count: dict[tuple[int, int], int] = {}
        for _, seg in li.groupby("l_orderkey"):
            for x, y in itertools.combinations(
                    sorted(seg["l_partkey"].tolist()), 2):
                pair_count[(x, y)] = pair_count.get((x, y), 0) + 1
        edges = {p for p, n in pair_count.items()
                 if n >= TRI_MIN_SUPPORT}
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
        tri = sum(1 for a, b in edges
                  for c in adj[a] & adj[b] if c > b)
        got = triangle_count(SF).to_pandas()
        assert got["n_nodes"].iloc[0] == len(adj)
        assert got["n_edges"].iloc[0] == len(edges)
        assert got["n_wedges"].iloc[0] == wedges
        assert got["n_triangles"].iloc[0] == tri

    def test_planted_graph(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import triangle_count

        # K4 on parts 1-4 (each pair in 2 orders) + pendant edge (4,5)
        rows = []
        ok = 0
        for x, y in itertools.combinations([1, 2, 3, 4], 2):
            for _ in range(2):
                rows += [(ok, x), (ok, y)]
                ok += 1
        rows += [(ok, 4), (ok, 5), (ok + 1, 4), (ok + 1, 5)]
        pd.DataFrame({
            "l_orderkey": [r[0] for r in rows],
            "l_partkey": [r[1] for r in rows],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = triangle_count(str(tmp_path)).to_pandas()
        # K4 has 4 triangles; wedges: deg(1..3)=3, deg(4)=4, deg(5)=1
        assert got["n_edges"].iloc[0] == 7
        assert got["n_triangles"].iloc[0] == 4
        assert got["n_wedges"].iloc[0] == 3 * 3 + 6 + 0
        assert got["gcc_r"].iloc[0] == round(12 / 15, 4)


class TestAnovaF:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import anova_f

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "value"]).to_pandas()
        ev["v"] = np.round(np.copysign(
            np.floor(np.abs(ev["value"].to_numpy()) * 1e4 + 0.5),
            ev["value"].to_numpy())) / 1e4
        groups = [g["v"].to_numpy() for _, g in ev.groupby("event_type")]
        n = sum(g.size for g in groups)
        k = len(groups)
        gm = np.concatenate(groups).mean()
        ssb = sum(g.size * (g.mean() - gm) ** 2 for g in groups)
        ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        got = anova_f(SF).to_pandas()
        assert got["k_groups"].iloc[0] == k
        assert got["n_total"].iloc[0] == n
        assert abs(got["f_r"].iloc[0] - f) < max(1e-3, 1e-4 * abs(f))
        assert abs(got["eta2_r"].iloc[0] - ssb / (ssb + ssw)) < 1e-3

    def test_degenerate_one_group(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import anova_f

        t0 = pd.Timestamp("1970-01-01")
        pd.DataFrame({
            "user_id": [1, 2], "event_type": ["view", "view"],
            "ts": [t0] * 2, "event_id": [1, 2], "value": [1.0, 2.0],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = anova_f(str(tmp_path)).to_pandas()
        assert got["k_groups"].iloc[0] == 1
        assert pd.isna(got["f_r"].iloc[0])


class TestConversionLag:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import conversion_lag

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "event_type"]
                           ).to_pandas()
        ev["t"] = ev["ts"].astype("int64")
        lags = []
        n_viewers = 0
        for _, sub in ev.groupby("user_id"):
            views = sub.loc[sub["event_type"] == "view", "t"]
            if views.empty:
                continue
            n_viewers += 1
            vt = views.min()
            purch = sub.loc[(sub["event_type"] == "purchase")
                            & (sub["t"] >= vt), "t"]
            if not purch.empty:
                lags.append((purch.min() - vt) // 1_000_000)
        lags.sort()
        got = conversion_lag(SF).to_pandas()
        assert got["n_viewers"].iloc[0] == n_viewers
        assert got["n_converted"].iloc[0] == len(lags)
        assert got["p50_lag_s"].iloc[0] == lags[
            int(np.ceil(len(lags) * 0.5)) - 1]
        assert got["p90_lag_s"].iloc[0] == lags[
            int(np.ceil(len(lags) * 0.9)) - 1]

    def test_planted_funnel(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import conversion_lag

        t0 = pd.Timestamp("1970-01-01")
        rows = [
            (1, 0, "view"), (1, 5, "purchase"),     # lag 5
            (2, 10, "purchase"), (2, 20, "view"),   # purchase BEFORE
            (3, 0, "view"),                          # never converts
        ]
        pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": [t0 + pd.Timedelta(seconds=r[1]) for r in rows],
            "event_id": range(len(rows)),
            "event_type": [r[2] for r in rows],
            "value": 0.0,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = conversion_lag(str(tmp_path)).to_pandas()
        assert got["n_viewers"].iloc[0] == 3
        assert got["n_converted"].iloc[0] == 1
        assert got["p50_lag_s"].iloc[0] == 5
        assert got["p90_lag_s"].iloc[0] == 5


class TestDailyChurn:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import daily_churn

        DAY = 86_400_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts"]).to_pandas()
        ev["d"] = ev["ts"].astype("int64") // DAY * DAY
        act = {d: set(g["user_id"]) for d, g in ev.groupby("d")}
        rows = {}
        for d, users in act.items():
            prev = act.get(d - DAY, set())
            rows[d] = [len(users), len(users & prev), 0]
        for d, users in act.items():
            gone = users - act.get(d + DAY, set())
            rows.setdefault(d + DAY, [0, 0, 0])[2] += len(gone)
        got = daily_churn(SF).to_pandas().sort_values("day_us")
        assert got["day_us"].tolist() == sorted(rows)
        for _, r in got.iterrows():
            a, ret, chn = rows[r["day_us"]]
            assert (r["active"], r["retained"], r["churned"]) == \
                (a, ret, chn)
            assert r["new_users"] == a - ret

    def test_planted_lifecycle(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import daily_churn

        t0 = pd.Timestamp("1970-01-01")
        rows = [(1, 0), (1, 1), (1, 3), (2, 1)]
        pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": [t0 + pd.Timedelta(days=r[1]) for r in rows],
            "event_id": range(len(rows)), "event_type": "e",
            "value": 0.0,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = daily_churn(str(tmp_path)).to_pandas() \
            .sort_values("day_us").reset_index(drop=True)
        DAY = 86_400_000_000
        assert got["day_us"].tolist() == [0, DAY, 2 * DAY, 3 * DAY,
                                          4 * DAY]
        assert got["active"].tolist() == [1, 2, 0, 1, 0]
        assert got["retained"].tolist() == [0, 1, 0, 0, 0]
        assert got["new_users"].tolist() == [1, 1, 0, 1, 0]
        # both day-1 actives vanish on day 2; the day-3 return churns
        # again past corpus end (the disclosed trailing row)
        assert got["churned"].tolist() == [0, 0, 2, 0, 1]


class TestKaplanMeier:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import kaplan_meier

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "event_type"]
                           ).to_pandas()
        ev["t"] = ev["ts"].astype("int64")
        gmax = ev["t"].max()
        obs = []
        for _, sub in ev.groupby("user_id"):
            views = sub.loc[sub["event_type"] == "view", "t"]
            if views.empty:
                continue
            vt = views.min()
            purch = sub.loc[(sub["event_type"] == "purchase")
                            & (sub["t"] >= vt), "t"]
            if purch.empty:
                obs.append(((gmax - vt) // 1_000_000, 0))
            else:
                obs.append(((purch.min() - vt) // 1_000_000, 1))
        got = kaplan_meier(SF).to_pandas().sort_values("lag_s")
        s = 1.0
        exp = []
        times = sorted({t for t, _ in obs})
        for t in times:
            n = sum(1 for tt, _ in obs if tt >= t)
            d = sum(1 for tt, e in obs if tt == t and e)
            if d:
                s *= 1.0 - d / n
                exp.append((t, n, d, s))
        assert len(got) == len(exp)
        for row, (t, n, d, sv) in zip(got.itertuples(), exp):
            assert (row.lag_s, row.n_risk, row.d_events) == (t, n, d)
            assert abs(row.surv_r - sv) < 1e-3

    def test_planted_censoring(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import kaplan_meier

        t0 = pd.Timestamp("1970-01-01")
        rows = [
            (1, 0, "view"), (1, 10, "purchase"),
            (2, 0, "view"),                      # censored at 100
            (3, 0, "view"), (3, 20, "purchase"),
            (4, 100, "click"),                   # corpus end marker
        ]
        pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": [t0 + pd.Timedelta(seconds=r[1]) for r in rows],
            "event_id": range(len(rows)),
            "event_type": [r[2] for r in rows],
            "value": 0.0,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = kaplan_meier(str(tmp_path)).to_pandas() \
            .sort_values("lag_s").reset_index(drop=True)
        assert got["lag_s"].tolist() == [10, 20]
        assert got["n_risk"].tolist() == [3, 2]
        assert got["d_events"].tolist() == [1, 1]
        assert got["surv_r"].tolist() == [round(2 / 3, 4),
                                          round(1 / 3, 4)]


class TestPsiDrift:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            PSI_NBINS, psi_drift)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["value", "ts"]).to_pandas()
        v = ev["value"].to_numpy()
        tu = ev["ts"].astype("int64").to_numpy()
        lo, hi = v.min(), v.max()
        b = np.minimum(np.floor((v - lo) / (hi - lo) * PSI_NBINS),
                       PSI_NBINS - 1).astype(int)
        h = 2 * tu >= tu.min() + tu.max()
        n1b = np.bincount(b[~h], minlength=PSI_NBINS)
        n2b = np.bincount(b[h], minlength=PSI_NBINS)
        psi = 0.0
        used = 0
        for i in range(PSI_NBINS):
            if n1b[i] and n2b[i]:
                used += 1
                p1, p2 = n1b[i] / n1b.sum(), n2b[i] / n2b.sum()
                psi += (p2 - p1) * np.log(p2 / p1)
        got = psi_drift(SF).to_pandas()
        assert got["n_first"].iloc[0] == int((~h).sum())
        assert got["n_second"].iloc[0] == int(h.sum())
        assert got["n_bins_used"].iloc[0] == used
        assert abs(got["psi_r"].iloc[0] - psi) < 1e-3

    def test_planted_no_drift(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import psi_drift

        t0 = pd.Timestamp("1970-01-01")
        secs = list(range(10)) + list(range(100, 110))
        vals = [float(i + 1) for i in range(10)] * 2
        pd.DataFrame({
            "user_id": 1,
            "ts": [t0 + pd.Timedelta(seconds=s) for s in secs],
            "event_id": range(20), "event_type": "e", "value": vals,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = psi_drift(str(tmp_path)).to_pandas()
        assert got["n_first"].iloc[0] == 10
        assert got["n_second"].iloc[0] == 10
        assert got["psi_r"].iloc[0] == 0.0


class TestFrequentTriples:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            TRIPLE_MIN_SUPPORT, frequent_triples)

        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey", "l_partkey"]
                           ).to_pandas().drop_duplicates()
        support: dict[tuple, int] = {}
        for _, seg in li.groupby("l_orderkey"):
            for tr in itertools.combinations(
                    sorted(seg["l_partkey"].tolist()), 3):
                support[tr] = support.get(tr, 0) + 1
        exp = sorted(t for t, n in support.items()
                     if n >= TRIPLE_MIN_SUPPORT)
        got = frequent_triples(SF).to_pandas() \
            .sort_values(["p1", "p2", "p3"])
        assert [tuple(r) for r in
                got[["p1", "p2", "p3"]].to_numpy()] == exp
        for row in got.itertuples():
            assert row.support == support[(row.p1, row.p2, row.p3)]

    def test_planted_baskets(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            frequent_triples)

        baskets = {1: [1, 2, 3, 4], 2: [1, 2, 3], 3: [2, 3, 4]}
        rows = [(ok, pk) for ok, pks in baskets.items() for pk in pks]
        pd.DataFrame({
            "l_orderkey": [r[0] for r in rows],
            "l_partkey": [r[1] for r in rows],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = frequent_triples(str(tmp_path)).to_pandas() \
            .sort_values(["p1", "p2", "p3"]).reset_index(drop=True)
        assert [tuple(r) for r in got.to_numpy()] == [
            (1, 2, 3, 2), (2, 3, 4, 2)]


class TestStateDurations:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import state_durations

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "event_type",
                                    "event_id"]).to_pandas()
        ev["t"] = ev["ts"].astype("int64")
        exp: dict[str, list[int]] = {}
        for _, sub in ev.groupby("user_id"):
            sub = sub.sort_values(["t", "event_id"])
            t = sub["t"].to_numpy()
            et = sub["event_type"].to_numpy()
            for i in range(len(sub) - 1):
                exp.setdefault(et[i], []).append(int(t[i + 1] - t[i]))
        got = state_durations(SF).to_pandas()
        assert sorted(got["event_type"]) == sorted(exp)
        for row in got.itertuples():
            durs = exp[row.event_type]
            assert row.n_segments == len(durs)
            assert row.total_us == sum(durs)
            assert abs(row.avg_us_r - sum(durs) / len(durs)) < 1e-3

    def test_planted_ties(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import state_durations

        t0 = pd.Timestamp("1970-01-01")
        rows = [(0, "x", 0), (0, "y", 1), (5, "z", 2)]
        pd.DataFrame({
            "user_id": 1,
            "ts": [t0 + pd.Timedelta(seconds=r[0]) for r in rows],
            "event_type": [r[1] for r in rows],
            "event_id": [r[2] for r in rows], "value": 0.0,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = state_durations(str(tmp_path)).to_pandas() \
            .set_index("event_type")
        # tie broken by event_id: x holds 0 µs, y holds 5 s
        assert got.loc["x", "total_us"] == 0
        assert got.loc["y", "total_us"] == 5_000_000
        assert "z" not in got.index


class TestEventTrigrams:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import event_trigrams

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "event_type",
                                    "event_id"]).to_pandas()
        exp: dict[tuple, int] = {}
        for _, sub in ev.groupby("user_id"):
            et = sub.sort_values(["ts", "event_id"])["event_type"] \
                .tolist()
            for i in range(len(et) - 2):
                k = (et[i], et[i + 1], et[i + 2])
                exp[k] = exp.get(k, 0) + 1
        got = event_trigrams(SF).to_pandas()
        assert len(got) == len(exp)
        for row in got.itertuples():
            assert exp[(row.t1, row.t2, row.t3)] == row.n

    def test_planted_sequence(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import event_trigrams

        t0 = pd.Timestamp("1970-01-01")
        types = ["a", "b", "c", "b", "c"]
        pd.DataFrame({
            "user_id": 1,
            "ts": [t0 + pd.Timedelta(seconds=i) for i in range(5)],
            "event_type": types, "event_id": range(5), "value": 0.0,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = event_trigrams(str(tmp_path)).to_pandas()
        assert sorted(map(tuple, got.to_numpy())) == [
            ("a", "b", "c", 1), ("b", "c", "b", 1), ("c", "b", "c", 1)]


class TestTypeCorrMatrix:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import type_corr_matrix

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "ts", "value"]
                           ).to_pandas()
        ev["cents"] = np.rint(ev["value"].to_numpy() * 100).astype(
            np.int64)
        ev["d"] = ev["ts"].astype("int64") // 86_400_000_000
        grid = ev.pivot_table(index="d", columns="event_type",
                              values="cents", aggfunc="sum",
                              fill_value=0)
        got = type_corr_matrix(SF).to_pandas()
        import itertools as it
        pairs = list(it.combinations(sorted(grid.columns), 2))
        assert len(got) == len(pairs)
        for row in got.itertuples():
            r = np.corrcoef(grid[row.type_a], grid[row.type_b])[0, 1]
            assert row.n_days == len(grid)
            assert abs(row.r_r - r) < 1e-3

    def test_planted_perfect_corr(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import type_corr_matrix

        t0 = pd.Timestamp("1970-01-01")
        rows = []
        for d in range(3):
            rows.append((d, "a", float(d + 1)))          # 1, 2, 3
            rows.append((d, "b", float(2 * (d + 1))))    # 2, 4, 6
            rows.append((d, "c", float(3 - d)))          # 3, 2, 1
        pd.DataFrame({
            "user_id": 1,
            "ts": [t0 + pd.Timedelta(days=r[0]) for r in rows],
            "event_type": [r[1] for r in rows],
            "event_id": range(len(rows)),
            "value": [r[2] for r in rows],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = type_corr_matrix(str(tmp_path)).to_pandas() \
            .set_index(["type_a", "type_b"])
        assert got.loc[("a", "b"), "r_r"] == 1.0
        assert got.loc[("a", "c"), "r_r"] == -1.0
        assert got.loc[("b", "c"), "r_r"] == -1.0


class TestCohortLtv:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import cohort_ltv

        DAY = 86_400_000_000
        WEEK = 7 * DAY
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "event_type",
                                    "value"]).to_pandas()
        ev["t"] = ev["ts"].astype("int64")
        gd = ev["t"].max() // DAY * DAY
        sign = ev[ev["event_type"] == "signup"]
        cd = sign.groupby("user_id")["t"].min() // DAY * DAY
        cells: dict[tuple, list] = {}
        p = ev[ev["event_type"] == "purchase"].copy()
        p["cd"] = p["user_id"].map(cd)
        p = p[p["cd"].notna()]
        p["day"] = p["t"] // DAY * DAY
        p = p[p["day"] >= p["cd"]]
        p["wo"] = ((p["day"] - p["cd"]) // WEEK).astype(int)
        p["cents"] = np.rint(p["value"].to_numpy() * 100).astype(
            np.int64)
        agg = p.groupby(["cd", "wo"]).agg(
            cents=("cents", "sum"), buyers=("user_id", "nunique"))
        got = cohort_ltv(SF).to_pandas()
        for cohort, sub in got.groupby("cohort_day_us"):
            sub = sub.sort_values("week_offset")
            assert sub["week_offset"].tolist() == list(
                range((gd - cohort) // WEEK + 1))
            run = 0.0
            for row in sub.itertuples():
                key = (cohort, row.week_offset)
                cents = int(agg.loc[key, "cents"]) \
                    if key in agg.index else 0
                buyers = int(agg.loc[key, "buyers"]) \
                    if key in agg.index else 0
                run += cents / 100.0
                assert row.n_buyers == buyers
                assert abs(row.revenue_r - cents / 100.0) < 1e-9
                assert abs(row.cum_revenue_r - run) < 1e-6

    def test_planted_cohort(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import cohort_ltv

        t0 = pd.Timestamp("1970-01-01")
        rows = [
            (1, 0, "signup", 0.0),
            (1, 0, "purchase", 10.0),
            (1, 8, "purchase", 5.0),
            (2, 1, "purchase", 99.0),   # never signed up — excluded
            (3, 15, "click", 0.0),      # corpus end marker
        ]
        pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": [t0 + pd.Timedelta(days=r[1]) for r in rows],
            "event_id": range(len(rows)),
            "event_type": [r[2] for r in rows],
            "value": [r[3] for r in rows],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = cohort_ltv(str(tmp_path)).to_pandas() \
            .sort_values("week_offset").reset_index(drop=True)
        assert got["cohort_day_us"].nunique() == 1
        assert got["week_offset"].tolist() == [0, 1, 2]
        assert got["revenue_r"].tolist() == [10.0, 5.0, 0.0]
        assert got["cum_revenue_r"].tolist() == [10.0, 15.0, 15.0]
        assert got["n_buyers"].tolist() == [1, 1, 0]


class TestShipLagQuantiles:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            ship_lag_quantiles)

        DAY = 86_400_000_000
        o = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_orderkey", "o_orderdate"]
                          ).to_pandas()
        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey", "l_shipdate"]
                           ).to_pandas()
        first = li.groupby("l_orderkey")["l_shipdate"].min() \
            .astype("int64")
        od = o.set_index("o_orderkey")["o_orderdate"].astype("int64")
        common = first.index.intersection(od.index)
        lags = sorted((first.loc[common].to_numpy()
                       - od.loc[common].to_numpy()) // DAY)
        got = ship_lag_quantiles(SF).to_pandas()
        n = len(lags)
        assert got["n_orders"].iloc[0] == n
        assert abs(got["avg_lag_d_r"].iloc[0] - sum(lags) / n) < 1e-3
        for q, col in [(0.5, "p50_lag_d"), (0.9, "p90_lag_d"),
                       (0.99, "p99_lag_d")]:
            assert got[col].iloc[0] == lags[int(np.ceil(n * q)) - 1]

    def test_planted_orders(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            ship_lag_quantiles)

        t0 = pd.Timestamp("1970-01-01")
        pd.DataFrame({
            "o_orderkey": [1, 2, 3],
            "o_orderdate": [t0, t0 + pd.Timedelta(days=10), t0],
            "o_custkey": 1, "o_totalprice": 1.0,
            "o_orderstatus": "O", "o_orderpriority": "1-URGENT",
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        pd.DataFrame({
            "l_orderkey": [1, 1, 2],
            "l_shipdate": [t0 + pd.Timedelta(days=5),
                           t0 + pd.Timedelta(days=2),
                           t0 + pd.Timedelta(days=10)],
            "l_partkey": 1, "l_suppkey": 1, "l_linenumber": 1,
            "l_quantity": 1.0, "l_extendedprice": 1.0,
            "l_discount": 0.0, "l_tax": 0.0,
            "l_returnflag": "N", "l_linestatus": "O",
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = ship_lag_quantiles(str(tmp_path)).to_pandas()
        # order 1 lag = 2 (earliest line), order 2 lag = 0, order 3
        # has no lines
        assert got["n_orders"].iloc[0] == 2
        assert got["avg_lag_d_r"].iloc[0] == 1.0
        assert got["p50_lag_d"].iloc[0] == 0
        assert got["p90_lag_d"].iloc[0] == 2


class TestSameDayOrders:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import same_day_orders

        DAY = 86_400_000_000
        o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        o["d"] = o["o_orderdate"].astype("int64") // DAY * DAY
        o["cents"] = np.rint(o["o_totalprice"].to_numpy() * 100) \
            .astype(np.int64)
        agg = o.groupby(["o_custkey", "d"]).agg(
            n=("o_orderkey", "size"), cents=("cents", "sum"),
            mok=("o_orderkey", "min"))
        agg = agg[agg["n"] > 1]
        got = same_day_orders(SF).to_pandas()
        assert len(got) == len(agg)
        for row in got.itertuples():
            e = agg.loc[(row.o_custkey, row.order_day_us)]
            assert (row.n_orders, row.total_cents, row.min_orderkey) \
                == (e["n"], e["cents"], e["mok"])

    def test_planted_duplicates(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import same_day_orders

        t0 = pd.Timestamp("1970-01-01")
        pd.DataFrame({
            "o_orderkey": [5, 9, 7],
            "o_custkey": [1, 1, 2],
            "o_orderdate": [t0, t0 + pd.Timedelta(hours=5), t0],
            "o_totalprice": [1.0, 2.0, 3.0],
            "o_orderstatus": "O", "o_orderpriority": "1-URGENT",
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        got = same_day_orders(str(tmp_path)).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert (r["o_custkey"], r["order_day_us"], r["n_orders"],
                r["total_cents"], r["min_orderkey"]) == (1, 0, 2, 300, 5)


class TestLinearInterpHourly:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            HOUR_US, linear_interp_hourly)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "ts", "value"]
                           ).to_pandas()
        p = ev[ev["event_type"] == "purchase"].copy()
        p["h"] = p["ts"].astype("int64") // HOUR_US * HOUR_US
        p["cents"] = np.rint(p["value"].to_numpy() * 100).astype(
            np.int64)
        dt = p.groupby("h")["cents"].sum()
        got = linear_interp_hourly(SF).to_pandas() \
            .sort_values("hour_us").reset_index(drop=True)
        grid = np.arange(dt.index.min(), dt.index.max() + HOUR_US,
                         HOUR_US)
        assert got["hour_us"].tolist() == grid.tolist()
        assert got["interp"].sum() == len(grid) - len(dt)
        for row in got.itertuples():
            if row.interp == 0:
                assert abs(row.revenue_r
                           - dt.loc[row.hour_us] / 100.0) < 1e-6
            else:
                oh = dt.index.to_numpy()
                pi = oh[oh < row.hour_us].max()
                ni = oh[oh > row.hour_us].min()
                expect = (dt.loc[pi] + (dt.loc[ni] - dt.loc[pi])
                          * (row.hour_us - pi) / (ni - pi)) / 100.0
                assert abs(row.revenue_r - expect) < 1e-3

    def test_planted_gap(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            linear_interp_hourly)

        t0 = pd.Timestamp("1970-01-01")
        rows = [
            (0, "purchase", 100.0),
            (1, "view", 999.0),       # non-purchase in the gap
            (3, "purchase", 400.0),
        ]
        pd.DataFrame({
            "user_id": 1,
            "ts": [t0 + pd.Timedelta(hours=r[0]) for r in rows],
            "event_id": range(len(rows)),
            "event_type": [r[1] for r in rows],
            "value": [r[2] for r in rows],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = linear_interp_hourly(str(tmp_path)).to_pandas() \
            .sort_values("hour_us").reset_index(drop=True)
        assert got["revenue_r"].tolist() == [100.0, 200.0, 300.0, 400.0]
        assert got["interp"].tolist() == [0, 1, 1, 0]


class TestBrandReturnRate:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import brand_return_rate

        part = pq.read_table(f"{SF}/part.parquet",
                             columns=["p_partkey", "p_brand"]
                             ).to_pandas()
        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_partkey", "l_returnflag"]
                           ).to_pandas()
        j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
        exp = j.groupby("p_brand").agg(
            n=("l_returnflag", "size"),
            nr=("l_returnflag", lambda s: int((s == "R").sum())))
        got = brand_return_rate(SF).to_pandas()
        assert len(got) == len(exp)
        for row in got.itertuples():
            e = exp.loc[row.p_brand]
            assert (row.n_lines, row.n_returned) == (e["n"], e["nr"])
            assert abs(row.return_rate_r - e["nr"] / e["n"]) < 1e-4

    def test_planted_brands(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import brand_return_rate

        pd.DataFrame({
            "p_partkey": [1, 2], "p_brand": ["B1", "B2"],
            "p_name": "x", "p_mfgr": "m", "p_type": "t",
            "p_size": 1, "p_retailprice": 1.0,
        }).to_parquet(f"{tmp_path}/part.parquet", index=False)
        pd.DataFrame({
            "l_orderkey": [1, 1, 2, 3],
            "l_partkey": [1, 1, 2, 3],   # partkey 3 has no dim row
            "l_returnflag": ["R", "N", "N", "R"],
            "l_suppkey": 1, "l_linenumber": 1, "l_quantity": 1.0,
            "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0,
            "l_linestatus": "O",
            "l_shipdate": pd.Timestamp("1970-01-01"),
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = brand_return_rate(str(tmp_path)).to_pandas() \
            .set_index("p_brand")
        assert got.loc["B1", "n_lines"] == 2
        assert got.loc["B1", "n_returned"] == 1
        assert got.loc["B1", "return_rate_r"] == 0.5
        assert got.loc["B2", "n_returned"] == 0
        assert len(got) == 2


class TestRfmSegments:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import rfm_segments

        DAY = 86_400_000_000
        o = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_custkey", "o_orderdate",
                                   "o_totalprice"]).to_pandas()
        o["t"] = o["o_orderdate"].astype("int64")
        o["cents"] = np.rint(o["o_totalprice"].to_numpy() * 100) \
            .astype(np.int64)
        gd = o["t"].max() // DAY * DAY
        m = o.groupby("o_custkey").agg(
            last=("t", "max"), freq=("t", "size"),
            cents=("cents", "sum"))
        m["rec_d"] = (gd - m["last"] // DAY * DAY) // DAY
        n = len(m)

        def ntile(order_cols, ascending):
            idx = m.sort_values(order_cols, ascending=ascending).index
            sizes = np.full(5, n // 5)
            sizes[: n % 5] += 1
            out = pd.Series(np.repeat(np.arange(1, 6), sizes),
                            index=idx)
            return out

        m = m.reset_index()
        m = m.set_index("o_custkey")
        m["r"] = ntile(["rec_d", "o_custkey"], [True, True])
        m["f"] = ntile(["freq", "o_custkey"], [False, True])
        m["m"] = ntile(["cents", "o_custkey"], [False, True])
        got = rfm_segments(SF).to_pandas().set_index("c_custkey")
        assert len(got) == n
        for ck, row in got.iterrows():
            e = m.loc[ck]
            assert (row["rec_d"], row["n_orders"],
                    row["total_cents"]) == (e["rec_d"], e["freq"],
                                            e["cents"])
            assert (row["r_score"], row["f_score"],
                    row["m_score"]) == (e["r"], e["f"], e["m"])
            assert row["rfm"] == e["r"] * 100 + e["f"] * 10 + e["m"]

    def test_planted_customers(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import rfm_segments

        t0 = pd.Timestamp("1970-01-01")
        # five customers, one order each on days 0..4, prices 1..5 —
        # each lands alone in one ntile bucket per metric
        pd.DataFrame({
            "o_orderkey": range(5),
            "o_custkey": [1, 2, 3, 4, 5],
            "o_orderdate": [t0 + pd.Timedelta(days=d)
                            for d in range(5)],
            "o_totalprice": [float(i + 1) for i in range(5)],
            "o_orderstatus": "O", "o_orderpriority": "1-URGENT",
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        got = rfm_segments(str(tmp_path)).to_pandas() \
            .set_index("c_custkey")
        # recency: cust5 most recent → r=1; monetary: cust5 biggest →
        # m=1; frequency all tie at 1 → custkey ASC → f = custkey
        assert got.loc[5, "r_score"] == 1 and got.loc[1, "r_score"] == 5
        assert got.loc[5, "m_score"] == 1 and got.loc[1, "m_score"] == 5
        assert got["f_score"].tolist() == [1, 2, 3, 4, 5]


class TestNationBalanceMad:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            nation_balance_mad)

        s = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
        nat = pq.read_table(f"{SF}/nation.parquet").to_pandas() \
            .set_index("n_nationkey")["n_name"]
        got = nation_balance_mad(SF).to_pandas().set_index("n_name")
        for nk, sub in s.groupby("s_nationkey"):
            c = np.sort(np.rint(sub["s_acctbal"].to_numpy() * 100)
                        .astype(np.int64))
            med = np.median(c)
            mad = np.median(np.abs(c - med))
            row = got.loc[nat.loc[nk]]
            assert row["n_suppliers"] == len(c)
            assert abs(row["med_bal_r"] - med / 100.0) < 1e-3
            assert abs(row["mad_r"] - mad / 100.0) < 1e-3
            assert row["n_outliers"] == int(
                (np.abs(c - med) > 3 * mad).sum())

    def test_planted_outlier(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            nation_balance_mad)

        pd.DataFrame({
            "n_nationkey": [0], "n_name": ["ATLANTIS"],
            "n_regionkey": [0],
        }).to_parquet(f"{tmp_path}/nation.parquet", index=False)
        pd.DataFrame({
            "s_suppkey": range(5), "s_nationkey": 0,
            "s_name": "s",
            "s_acctbal": [10.0, 11.0, 12.0, 13.0, 100.0],
        }).to_parquet(f"{tmp_path}/supplier.parquet", index=False)
        got = nation_balance_mad(str(tmp_path)).to_pandas()
        r = got.iloc[0]
        # median 12.00, deviations {2,1,0,1,88} → MAD 1.00; only the
        # 100.00 balance exceeds 3 MAD
        assert r["n_name"] == "ATLANTIS"
        assert r["med_bal_r"] == 12.0
        assert r["mad_r"] == 1.0
        assert r["n_outliers"] == 1


class TestBrandPriceRegr:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import brand_price_regr

        part = pq.read_table(f"{SF}/part.parquet",
                             columns=["p_brand", "p_size",
                                      "p_retailprice"]).to_pandas()
        part["y"] = np.rint(part["p_retailprice"].to_numpy() * 100) \
            .astype(np.int64)
        got = brand_price_regr(SF).to_pandas().set_index("p_brand")
        for b, sub in part.groupby("p_brand"):
            x = sub["p_size"].to_numpy(dtype=np.float64)
            y = sub["y"].to_numpy(dtype=np.float64)
            row = got.loc[b]
            assert row["n_parts"] == len(sub)
            if np.ptp(x) == 0:
                assert pd.isna(row["slope_r"])
                continue
            slope, intercept = np.polyfit(x, y, 1)
            assert abs(row["slope_r"] - slope) < 1e-2
            assert abs(row["intercept_r"] - intercept) < 1.0
            r = np.corrcoef(x, y)[0, 1]
            assert abs(row["r2_r"] - r * r) < 1e-3

    def test_planted_perfect_line(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import brand_price_regr

        pd.DataFrame({
            "p_partkey": range(5),
            "p_brand": ["L", "L", "L", "C", "C"],
            "p_size": [1, 2, 3, 7, 7],
            "p_retailprice": [3.0, 5.0, 7.0, 1.0, 2.0],
            "p_name": "x", "p_type": "t",
        }).to_parquet(f"{tmp_path}/part.parquet", index=False)
        got = brand_price_regr(str(tmp_path)).to_pandas() \
            .set_index("p_brand")
        assert got.loc["L", "slope_r"] == 200.0       # cents per size
        assert got.loc["L", "intercept_r"] == 100.0
        assert got.loc["L", "r2_r"] == 1.0
        # constant size → undefined line
        assert pd.isna(got.loc["C", "slope_r"])


class TestWeeklyActiveHistogram:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            WEEK_ANCHOR_US, weekly_active_histogram)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts"]).to_pandas()
        ev["w"] = ev["ts"].astype("int64") // WEEK_ANCHOR_US
        per_user = ev.groupby("user_id")["w"].nunique()
        exp = per_user.value_counts().sort_index()
        got = weekly_active_histogram(SF).to_pandas() \
            .sort_values("n_active_weeks")
        assert got["n_active_weeks"].tolist() == exp.index.tolist()
        assert got["n_users"].tolist() == exp.tolist()

    def test_planted_depths(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            weekly_active_histogram)

        t0 = pd.Timestamp("1970-01-01")
        rows = [(1, 0), (1, 1), (1, 15), (2, 0)]  # u1: 2 weeks, u2: 1
        pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": [t0 + pd.Timedelta(days=r[1]) for r in rows],
            "event_id": range(len(rows)), "event_type": "e",
            "value": 0.0,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = weekly_active_histogram(str(tmp_path)).to_pandas() \
            .sort_values("n_active_weeks")
        assert got["n_active_weeks"].tolist() == [1, 2]
        assert got["n_users"].tolist() == [1, 1]


class TestCentsTailBias:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import cents_tail_bias

        v = pq.read_table(f"{SF}/events.parquet",
                          columns=["value"]).to_pandas()["value"] \
            .to_numpy()
        tails = np.abs(np.rint(v * 100).astype(np.int64)) % 100
        counts = np.bincount(tails, minlength=100)
        got = cents_tail_bias(SF).to_pandas()
        assert got["n_values"].iloc[0] == len(v)
        assert abs(got["share_00_r"].iloc[0]
                   - counts[0] / len(v)) < 1e-4
        assert abs(got["share_50_r"].iloc[0]
                   - counts[50] / len(v)) < 1e-4
        assert got["top_tail"].iloc[0] == int(np.argmax(counts))
        assert got["top_tail_n"].iloc[0] == int(counts.max())

    def test_planted_tails(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import cents_tail_bias

        t0 = pd.Timestamp("1970-01-01")
        pd.DataFrame({
            "user_id": 1, "ts": t0, "event_id": range(4),
            "event_type": "e",
            "value": [1.0, 2.0, 2.5, 3.99],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = cents_tail_bias(str(tmp_path)).to_pandas()
        assert got["n_values"].iloc[0] == 4
        assert got["share_00_r"].iloc[0] == 0.5
        assert got["share_50_r"].iloc[0] == 0.25
        assert got["top_tail"].iloc[0] == 0
        assert got["top_tail_n"].iloc[0] == 2


class TestLabelCentroidDists:
    def test_matches_bruteforce(self, ray_session, emb):
        from searchengine_ray.pipelines.relational import (
            label_centroid_dists)

        t = pq.read_table(f"{SF}/embeddings.parquet")
        labels = t["label"].to_numpy()
        m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        got = label_centroid_dists(SF).to_pandas()
        uls = sorted(set(labels.tolist()))
        assert len(got) == len(uls) * (len(uls) - 1) // 2
        for row in got.itertuples():
            ca = m[labels == row.label_a].mean(axis=0)
            cb = m[labels == row.label_b].mean(axis=0)
            assert row.n_a == int((labels == row.label_a).sum())
            assert abs(row.dist_r
                       - float(np.linalg.norm(ca - cb))) < 1e-3

    def test_planted_triangle(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            label_centroid_dists)

        tbl = pa.table({
            "vec_id": pa.array([1, 2, 3], type=pa.int64()),
            "embedding": pa.array(
                [[0.0, 0.0], [3.0, 4.0], [3.0, 4.0]],
                type=pa.list_(pa.float32())),
            "label": pa.array([0, 1, 1], type=pa.int32()),
        })
        pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")
        got = label_centroid_dists(str(tmp_path)).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert (r["label_a"], r["label_b"], r["n_a"], r["n_b"]) \
            == (0, 1, 1, 2)
        assert r["dist_r"] == 5.0


class TestSeasonalDowIndex:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            seasonal_dow_index)

        DAY = 86_400_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "value"]).to_pandas()
        ev["d"] = ev["ts"].astype("int64") // DAY
        ev["cents"] = np.rint(ev["value"].to_numpy() * 100).astype(
            np.int64)
        dt = ev.groupby("d")["cents"].sum()
        dow = (dt.index.to_numpy() + 3) % 7
        overall = dt.sum() / len(dt)
        got = seasonal_dow_index(SF).to_pandas().set_index("dow")
        for w in sorted(set(dow.tolist())):
            m = dow == w
            row = got.loc[w]
            assert row["n_days"] == int(m.sum())
            assert abs(row["revenue_r"]
                       - dt[m].sum() / 100.0) < 1e-6
            assert abs(row["index_r"]
                       - (dt[m].mean() / overall)) < 1e-3

    def test_planted_weekend_spike(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            seasonal_dow_index)

        t0 = pd.Timestamp("1970-01-01")  # a Thursday → dow 3
        pd.DataFrame({
            "user_id": 1, "event_id": range(2), "event_type": "e",
            "ts": [t0, t0 + pd.Timedelta(days=1)],
            "value": [10.0, 30.0],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = seasonal_dow_index(str(tmp_path)).to_pandas() \
            .set_index("dow")
        assert got.index.tolist() == [3, 4]  # Thursday, Friday
        assert got.loc[3, "revenue_r"] == 10.0
        # overall daily avg 20.0 → indices 0.5 and 1.5
        assert got.loc[3, "index_r"] == 0.5
        assert got.loc[4, "index_r"] == 1.5


class TestMaxEventGap:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import max_event_gap

        u = np.sort(pq.read_table(f"{SF}/events.parquet",
                                  columns=["ts"]).to_pandas()["ts"]
                    .astype("int64").to_numpy())
        d = np.diff(u)
        i = int(np.argmax(d))
        got = max_event_gap(SF).to_pandas()
        assert got["gap_us"].iloc[0] == d[i]
        assert got["start_us"].iloc[0] == u[i]
        assert got["end_us"].iloc[0] == u[i] + d[i]

    def test_planted_gap(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import max_event_gap

        t0 = pd.Timestamp("1970-01-01")
        secs = [0, 1, 2, 100, 101, 500]
        pd.DataFrame({
            "user_id": 1, "event_id": range(len(secs)),
            "event_type": "e", "value": 0.0,
            "ts": [t0 + pd.Timedelta(seconds=s) for s in secs],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = max_event_gap(str(tmp_path)).to_pandas()
        assert got["gap_us"].iloc[0] == 399_000_000
        assert got["start_us"].iloc[0] == 101_000_000

    def test_single_event(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import max_event_gap

        pd.DataFrame({
            "user_id": [1], "event_id": [1], "event_type": "e",
            "value": 0.0, "ts": [pd.Timestamp("1970-01-01")],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        assert len(max_event_gap(str(tmp_path)).to_pandas()) == 0


class TestUserLifespanQuantiles:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            user_lifespan_quantiles)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts"]).to_pandas()
        ev["t"] = ev["ts"].astype("int64")
        g = ev.groupby("user_id")["t"].agg(["min", "max", "size"])
        spans = sorted((g["max"] - g["min"]) // 1_000_000)
        got = user_lifespan_quantiles(SF).to_pandas()
        n = len(spans)
        assert got["n_users"].iloc[0] == n
        assert got["n_single"].iloc[0] == int((g["size"] == 1).sum())
        assert got["p50_span_s"].iloc[0] == spans[
            int(np.ceil(n * 0.5)) - 1]
        assert got["p90_span_s"].iloc[0] == spans[
            int(np.ceil(n * 0.9)) - 1]
        assert got["max_span_s"].iloc[0] == spans[-1]

    def test_planted_lifespans(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            user_lifespan_quantiles)

        t0 = pd.Timestamp("1970-01-01")
        rows = [(1, 0), (1, 100), (2, 5), (3, 0), (3, 10)]
        pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": [t0 + pd.Timedelta(seconds=r[1]) for r in rows],
            "event_id": range(len(rows)), "event_type": "e",
            "value": 0.0,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = user_lifespan_quantiles(str(tmp_path)).to_pandas()
        # spans: u1=100, u2=0 (single), u3=10 → sorted [0, 10, 100]
        assert got["n_users"].iloc[0] == 3
        assert got["n_single"].iloc[0] == 1
        assert got["p50_span_s"].iloc[0] == 10
        assert got["p90_span_s"].iloc[0] == 100
        assert got["max_span_s"].iloc[0] == 100


class TestSessionFunnel:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import session_funnel

        GAP = 1_800_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "event_type"]
                           ).to_pandas()
        ev["t"] = ev["ts"].astype("int64")
        ns = nv = nc = 0
        for _, sub in ev.groupby("user_id"):
            sub = sub.sort_values("t")
            t = sub["t"].to_numpy()
            et = sub["event_type"].to_numpy()
            new = np.concatenate(([True], np.diff(t) > GAP))
            sess = np.cumsum(new) - 1
            for s in range(sess[-1] + 1):
                m = sess == s
                ns += 1
                views = t[m & (et == "view")]
                if views.size:
                    nv += 1
                    if ((et[m] == "purchase")
                            & (t[m] >= views.min())).any():
                        nc += 1
        got = session_funnel(SF).to_pandas()
        assert got["n_sessions"].iloc[0] == ns
        assert got["n_with_view"].iloc[0] == nv
        assert got["n_converted"].iloc[0] == nc
        assert abs(got["conv_rate_r"].iloc[0] - nc / nv) < 1e-4

    def test_planted_sessions(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import session_funnel

        t0 = pd.Timestamp("1970-01-01")
        rows = [
            (1, 0, "view"), (1, 60, "purchase"),        # converts
            (1, 7200, "view"),                           # new session
            (2, 0, "purchase"), (2, 30, "view"),         # view AFTER
            (3, 0, "click"),                             # no view
        ]
        pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": [t0 + pd.Timedelta(seconds=r[1]) for r in rows],
            "event_id": range(len(rows)),
            "event_type": [r[2] for r in rows], "value": 0.0,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = session_funnel(str(tmp_path)).to_pandas()
        assert got["n_sessions"].iloc[0] == 4
        assert got["n_with_view"].iloc[0] == 3
        assert got["n_converted"].iloc[0] == 1
        assert got["conv_rate_r"].iloc[0] == round(1 / 3, 4)


class TestHivePartitionRoundtrip:
    def test_matches_groupby(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            hive_partition_roundtrip)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type"]).to_pandas()
        exp = ev["event_type"].value_counts().sort_index()
        got = hive_partition_roundtrip(SF).to_pandas() \
            .sort_values("event_type")
        assert got["event_type"].tolist() == exp.index.tolist()
        assert got["n_rows"].tolist() == exp.tolist()


class TestOrderPrioritySla:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            order_priority_sla)

        DAY = 86_400_000_000
        o = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_orderkey", "o_orderdate",
                                   "o_orderpriority"]).to_pandas()
        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey", "l_shipdate"]
                           ).to_pandas()
        first = li.groupby("l_orderkey")["l_shipdate"].min() \
            .astype("int64")
        o["t"] = o["o_orderdate"].astype("int64")
        o = o[o["o_orderkey"].isin(first.index)].copy()
        o["lag"] = (first.loc[o["o_orderkey"]].to_numpy()
                    - o["t"].to_numpy()) // DAY
        got = order_priority_sla(SF).to_pandas() \
            .set_index("o_orderpriority")
        for pr, sub in o.groupby("o_orderpriority"):
            lags = sorted(sub["lag"])
            row = got.loc[pr]
            assert row["n_orders"] == len(lags)
            assert row["p50_lag_d"] == lags[
                int(np.ceil(len(lags) * 0.5)) - 1]
            assert row["p90_lag_d"] == lags[
                int(np.ceil(len(lags) * 0.9)) - 1]

    def test_planted_priorities(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            order_priority_sla)

        t0 = pd.Timestamp("1970-01-01")
        pd.DataFrame({
            "o_orderkey": [1, 2], "o_custkey": 1,
            "o_orderdate": [t0, t0],
            "o_orderpriority": ["1-URGENT", "5-LOW"],
            "o_totalprice": 1.0, "o_orderstatus": "O",
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        pd.DataFrame({
            "l_orderkey": [1, 2],
            "l_shipdate": [t0 + pd.Timedelta(days=1),
                           t0 + pd.Timedelta(days=9)],
            "l_partkey": 1, "l_suppkey": 1, "l_linenumber": 1,
            "l_quantity": 1.0, "l_extendedprice": 1.0,
            "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
            "l_linestatus": "O",
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = order_priority_sla(str(tmp_path)).to_pandas() \
            .set_index("o_orderpriority")
        assert got.loc["1-URGENT", "p50_lag_d"] == 1
        assert got.loc["5-LOW", "p50_lag_d"] == 9


class TestKnnLabelPurity:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            PURITY_K, knn_label_purity)

        t = pq.read_table(f"{SF}/embeddings.parquet")
        ids = t["vec_id"].to_numpy()
        labels = t["label"].to_numpy()
        m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1)
        sims = np.round((m @ m.T) / np.outer(norms, norms), 4)
        exp_n: dict[int, int] = {}
        exp_mt: dict[int, int] = {}
        for i in range(len(ids)):
            cand = [j for j in range(len(ids)) if ids[j] != ids[i]]
            cand.sort(key=lambda j: (-sims[i, j], ids[j]))
            top = cand[:PURITY_K]
            exp_n[labels[i]] = exp_n.get(labels[i], 0) + 1
            exp_mt[labels[i]] = exp_mt.get(labels[i], 0) + sum(
                1 for j in top if labels[j] == labels[i])
        got = knn_label_purity(SF).to_pandas().set_index("label")
        for lb in exp_n:
            assert got.loc[lb, "n_vecs"] == exp_n[lb]
            assert got.loc[lb, "matches"] == exp_mt[lb]

    def test_planted_clusters(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            knn_label_purity)

        rng = np.random.default_rng(7)
        a = rng.normal(0, 0.01, (6, 4)) + np.array([1, 0, 0, 0])
        b = rng.normal(0, 0.01, (6, 4)) + np.array([0, 1, 0, 0])
        m = np.vstack([a, b]).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(12), type=pa.int64()),
            "embedding": pa.array([list(r) for r in m],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0] * 6 + [1] * 6, type=pa.int32()),
        })
        pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")
        got = knn_label_purity(str(tmp_path)).to_pandas()
        # two tight, well-separated clusters → perfect purity
        assert got["purity_r"].tolist() == [1.0, 1.0]


class TestRevenueConcentration:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            revenue_concentration)

        o = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_custkey", "o_totalprice"]
                          ).to_pandas()
        o["cents"] = np.rint(o["o_totalprice"].to_numpy() * 100) \
            .astype(np.int64)
        m = o.groupby("o_custkey", as_index=False)["cents"].sum() \
            .sort_values(["cents", "o_custkey"],
                         ascending=[False, True])
        n = len(m)
        total = int(m["cents"].sum())
        got = revenue_concentration(SF).to_pandas()
        assert got["n_customers"].iloc[0] == n
        assert abs(got["total_r"].iloc[0] - total / 100.0) < 1e-6
        for p, col in [(0.01, "top1_share_r"), (0.10, "top10_share_r")]:
            k = int(np.ceil(n * p))
            share = int(m["cents"].head(k).sum()) / total
            assert abs(got[col].iloc[0] - share) < 1e-4

    def test_planted_whale(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            revenue_concentration)

        t0 = pd.Timestamp("1970-01-01")
        # 10 customers: one whale with 910.00, nine with 10.00
        pd.DataFrame({
            "o_orderkey": range(10),
            "o_custkey": range(10),
            "o_orderdate": t0,
            "o_totalprice": [910.0] + [10.0] * 9,
            "o_orderstatus": "O", "o_orderpriority": "1-URGENT",
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        got = revenue_concentration(str(tmp_path)).to_pandas()
        assert got["n_customers"].iloc[0] == 10
        assert got["total_r"].iloc[0] == 1000.0
        assert got["top1_share_r"].iloc[0] == 0.91   # ceil(0.1)=1 cust
        assert got["top10_share_r"].iloc[0] == 0.91


class TestDailyValueBands:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import daily_value_bands

        DAY = 86_400_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "value"]).to_pandas()
        ev["d"] = ev["ts"].astype("int64") // DAY * DAY
        ev["c"] = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        got = daily_value_bands(SF).to_pandas().set_index("day_us")
        for d, sub in ev.groupby("d"):
            cs = np.sort(sub["c"].to_numpy())
            row = got.loc[d]
            assert row["n_events"] == len(cs)
            for q, col in [(0.1, "p10_r"), (0.5, "p50_r"),
                           (0.9, "p90_r")]:
                assert row[col] == cs[
                    int(np.ceil(len(cs) * q)) - 1] / 100.0

    def test_planted_day(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import daily_value_bands

        t0 = pd.Timestamp("1970-01-01")
        pd.DataFrame({
            "user_id": 1, "event_id": range(10), "event_type": "e",
            "ts": [t0 + pd.Timedelta(minutes=i) for i in range(10)],
            "value": [float(i + 1) for i in range(10)],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = daily_value_bands(str(tmp_path)).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert (r["p10_r"], r["p50_r"], r["p90_r"]) == (1.0, 5.0, 9.0)


class TestMultiFormatUnion:
    def test_matches_groupby(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            multi_format_union)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type"]).to_pandas()
        exp = ev["event_type"].value_counts().sort_index()
        got = multi_format_union(SF).to_pandas() \
            .sort_values("event_type")
        assert got["event_type"].tolist() == exp.index.tolist()
        assert got["n_rows"].tolist() == exp.tolist()


class TestBollingerBands:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            BOLL_K, BOLL_WINDOW, bollinger_bands)

        DAY = 86_400_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "value"]).to_pandas()
        ev["d"] = ev["ts"].astype("int64") // DAY * DAY
        ev["c"] = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        dt = ev.groupby("d")["c"].sum()
        grid = np.arange(dt.index.min(), dt.index.max() + DAY, DAY)
        c = np.zeros(grid.size, dtype=np.int64)
        c[(dt.index.to_numpy() - grid[0]) // DAY] = dt.to_numpy()
        got = bollinger_bands(SF).to_pandas().sort_values("day_us") \
            .reset_index(drop=True)
        assert got["day_us"].tolist() == grid.tolist()
        for i, row in got.iterrows():
            w = c[max(0, i - BOLL_WINDOW + 1):i + 1]
            mean = w.mean()
            assert abs(row["mean_r"] - mean / 100.0) < 1e-3
            if w.size > 1:
                sd = w.std(ddof=1)
                assert abs(row["upper_r"]
                           - (mean + BOLL_K * sd) / 100.0) < 1e-3
                assert abs(row["lower_r"]
                           - (mean - BOLL_K * sd) / 100.0) < 1e-3
            else:
                assert row["upper_r"] == row["mean_r"]

    def test_planted_series(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import bollinger_bands

        t0 = pd.Timestamp("1970-01-01")
        # constant 10.00/day → zero std, bands equal mean everywhere
        pd.DataFrame({
            "user_id": 1, "event_id": range(5), "event_type": "e",
            "ts": [t0 + pd.Timedelta(days=i) for i in range(5)],
            "value": 10.0,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = bollinger_bands(str(tmp_path)).to_pandas()
        assert got["mean_r"].tolist() == [10.0] * 5
        assert got["upper_r"].tolist() == [10.0] * 5
        assert got["lower_r"].tolist() == [10.0] * 5


class TestBasketSizeDist:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import basket_size_dist

        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey", "l_partkey"]
                           ).to_pandas().drop_duplicates()
        sizes = li.groupby("l_orderkey")["l_partkey"].size()
        exp = sizes.value_counts().sort_index()
        got = basket_size_dist(SF).to_pandas().sort_values("n_parts")
        assert got["n_parts"].tolist() == exp.index.tolist()
        assert got["n_orders"].tolist() == exp.tolist()

    def test_planted_baskets(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import basket_size_dist

        rows = [(1, 1), (1, 2), (1, 2), (2, 7), (3, 1), (3, 2), (3, 9)]
        pd.DataFrame({
            "l_orderkey": [r[0] for r in rows],
            "l_partkey": [r[1] for r in rows],
        }).to_parquet(f"{tmp_path}/lineitem.parquet", index=False)
        got = basket_size_dist(str(tmp_path)).to_pandas() \
            .sort_values("n_parts")
        # order 1 has 2 DISTINCT parts, order 2 has 1, order 3 has 3
        assert got["n_parts"].tolist() == [1, 2, 3]
        assert got["n_orders"].tolist() == [1, 1, 1]


class TestHoltTrend:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            HOLT_ALPHA, HOLT_BETA, holt_trend)

        DAY = 86_400_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "value"]).to_pandas()
        ev["d"] = ev["ts"].astype("int64") // DAY * DAY
        ev["c"] = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        dt = ev.groupby("d")["c"].sum()
        grid = np.arange(dt.index.min(), dt.index.max() + DAY, DAY)
        c = np.zeros(grid.size, dtype=np.int64)
        c[(dt.index.to_numpy() - grid[0]) // DAY] = dt.to_numpy()
        x = c / 100.0
        lev, tr = x[0], (x[1] - x[0]) if x.size > 1 else 0.0
        exp_l, exp_t = [lev], [tr]
        for i in range(1, x.size):
            prev = lev
            lev = HOLT_ALPHA * x[i] + (1 - HOLT_ALPHA) * (lev + tr)
            tr = HOLT_BETA * (lev - prev) + (1 - HOLT_BETA) * tr
            exp_l.append(lev)
            exp_t.append(tr)
        got = holt_trend(SF).to_pandas().sort_values("day_us") \
            .reset_index(drop=True)
        assert got["day_us"].tolist() == grid.tolist()
        assert np.allclose(got["level_r"], np.round(exp_l, 4),
                           atol=1e-6)
        assert np.allclose(got["trend_r"], np.round(exp_t, 4),
                           atol=1e-6)

    def test_planted_linear_series(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import holt_trend

        t0 = pd.Timestamp("1970-01-01")
        # perfectly linear series 10, 20, 30, ... — Holt tracks it
        # exactly: level = x, trend = 10
        pd.DataFrame({
            "user_id": 1, "event_id": range(6), "event_type": "e",
            "ts": [t0 + pd.Timedelta(days=i) for i in range(6)],
            "value": [10.0 * (i + 1) for i in range(6)],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = holt_trend(str(tmp_path)).to_pandas()
        assert got["level_r"].tolist() == [
            10.0, 20.0, 30.0, 40.0, 50.0, 60.0]
        assert got["trend_r"].tolist() == [10.0] * 6


class TestSegmentValueCv:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import segment_value_cv

        o = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_custkey", "o_totalprice"]
                          ).to_pandas()
        c = pq.read_table(f"{SF}/customer.parquet",
                          columns=["c_custkey", "c_mktsegment"]
                          ).to_pandas()
        j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
        j["cents"] = np.rint(j["o_totalprice"].to_numpy() * 100) \
            .astype(np.int64)
        got = segment_value_cv(SF).to_pandas().set_index("c_mktsegment")
        for s, sub in j.groupby("c_mktsegment"):
            cents = sub["cents"].to_numpy(dtype=np.float64)
            row = got.loc[s]
            assert row["n_orders"] == len(cents)
            assert abs(row["mean_r"] - cents.mean() / 100.0) < 1e-2
            cv = cents.std(ddof=1) / cents.mean()
            assert abs(row["cv_r"] - cv) < 1e-3

    def test_planted_segments(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import segment_value_cv

        pd.DataFrame({
            "c_custkey": [1, 2], "c_mktsegment": ["A", "B"],
            "c_name": "c", "c_nationkey": 0, "c_acctbal": 0.0,
        }).to_parquet(f"{tmp_path}/customer.parquet", index=False)
        t0 = pd.Timestamp("1970-01-01")
        pd.DataFrame({
            "o_orderkey": range(4),
            "o_custkey": [1, 1, 2, 3],    # custkey 3 has no dim row
            "o_orderdate": t0,
            "o_totalprice": [10.0, 30.0, 5.0, 99.0],
            "o_orderstatus": "O", "o_orderpriority": "1-URGENT",
        }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
        got = segment_value_cv(str(tmp_path)).to_pandas() \
            .set_index("c_mktsegment")
        assert got.loc["A", "n_orders"] == 2
        assert got.loc["A", "mean_r"] == 20.0
        # sd of {1000, 3000} cents = 1414.21…, cv ≈ 0.7071
        assert got.loc["A", "cv_r"] == 0.7071
        assert got.loc["B", "n_orders"] == 1
        assert pd.isna(got.loc["B", "cv_r"])
        assert len(got) == 2


class TestLastTouchAttribution:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            last_touch_attribution)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "event_type",
                                    "event_id", "value"]).to_pandas()
        ev["t"] = ev["ts"].astype("int64")
        ev["cents"] = np.rint(ev["value"].to_numpy() * 100).astype(
            np.int64)
        exp_n: dict[str, int] = {}
        exp_c: dict[str, int] = {}
        for _, sub in ev.groupby("user_id"):
            sub = sub.sort_values(["t", "event_id"])
            touch = None
            for row in sub.itertuples():
                if row.event_type == "purchase":
                    if touch is not None:
                        exp_n[touch] = exp_n.get(touch, 0) + 1
                        exp_c[touch] = exp_c.get(touch, 0) + row.cents
                else:
                    touch = row.event_type
        got = last_touch_attribution(SF).to_pandas() \
            .set_index("attributed_type")
        assert sorted(got.index) == sorted(exp_n)
        for t in exp_n:
            assert got.loc[t, "n_purchases"] == exp_n[t]
            assert abs(got.loc[t, "revenue_r"]
                       - exp_c[t] / 100.0) < 1e-6

    def test_planted_journey(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            last_touch_attribution)

        t0 = pd.Timestamp("1970-01-01")
        rows = [
            (1, 0, "click", 0.0), (1, 1, "purchase", 10.0),
            (1, 2, "view", 0.0), (1, 3, "purchase", 5.0),
            (2, 0, "purchase", 99.0),          # no prior touch — drops
            (3, 0, "view", 0.0), (3, 1, "purchase", 1.0),
        ]
        pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": [t0 + pd.Timedelta(seconds=r[1]) for r in rows],
            "event_id": range(len(rows)),
            "event_type": [r[2] for r in rows],
            "value": [r[3] for r in rows],
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = last_touch_attribution(str(tmp_path)).to_pandas() \
            .set_index("attributed_type")
        assert got.loc["click", "n_purchases"] == 1
        assert got.loc["click", "revenue_r"] == 10.0
        assert got.loc["view", "n_purchases"] == 2
        assert got.loc["view", "revenue_r"] == 6.0
        assert len(got) == 2


class TestScd2Intervals:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import scd2_intervals

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "event_type",
                                    "event_id"]).to_pandas()
        ev["t"] = ev["ts"].astype("int64")
        gmax = ev["t"].max()
        exp = []
        for uid, sub in ev.groupby("user_id"):
            sub = sub.sort_values(["t", "event_id"])
            t = sub["t"].tolist()
            et = sub["event_type"].tolist()
            for i in range(len(t)):
                to = t[i + 1] if i + 1 < len(t) else gmax
                exp.append((uid, et[i], t[i], to))
        got = scd2_intervals(SF).to_pandas()
        got_set = sorted(map(tuple, got.to_numpy()))
        assert got_set == sorted(exp)

    def test_planted_history(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import scd2_intervals

        t0 = pd.Timestamp("1970-01-01")
        rows = [(1, 0, "a", 0), (1, 10, "b", 1), (2, 5, "c", 2),
                (3, 20, "d", 3)]   # corpus end = 20 s
        pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": [t0 + pd.Timedelta(seconds=r[1]) for r in rows],
            "event_type": [r[2] for r in rows],
            "event_id": [r[3] for r in rows], "value": 0.0,
        }).to_parquet(f"{tmp_path}/events.parquet", index=False)
        got = scd2_intervals(str(tmp_path)).to_pandas()
        got = sorted(map(tuple, got.to_numpy()))
        S = 1_000_000
        assert got == [
            (1, "a", 0, 10 * S), (1, "b", 10 * S, 20 * S),
            (2, "c", 5 * S, 20 * S), (3, "d", 20 * S, 20 * S)]


class TestLabelSilhouette:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import label_silhouette

        t = pq.read_table(f"{SF}/embeddings.parquet")
        labels = t["label"].to_numpy().astype(np.int64)
        m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        uls = np.asarray(sorted(set(labels.tolist())))
        C = np.vstack([m[labels == lb].mean(axis=0) for lb in uls])
        cn = np.linalg.norm(C, axis=1)
        bn = np.linalg.norm(m, axis=1)
        dd = 1.0 - (m @ C.T) / (bn[:, None] * cn[None, :])
        own = np.searchsorted(uls, labels)
        rows = np.arange(len(labels))
        a = dd[rows, own]
        do = dd.copy()
        do[rows, own] = np.inf
        b = do.min(axis=1)
        sil = (b - a) / np.maximum(a, b)
        got = label_silhouette(SF).to_pandas().set_index("label")
        for i, lb in enumerate(uls):
            msk = labels == lb
            assert got.loc[lb, "n_vecs"] == int(msk.sum())
            assert abs(got.loc[lb, "mean_sil_r"]
                       - sil[msk].mean()) < 1e-3

    def test_planted_orthogonal(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import label_silhouette

        tbl = pa.table({
            "vec_id": pa.array([1, 2, 3], type=pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]],
                type=pa.list_(pa.float32())),
            "label": pa.array([0, 1, 1], type=pa.int32()),
        })
        pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")
        got = label_silhouette(str(tmp_path)).to_pandas() \
            .set_index("label")
        # orthogonal clusters, every vector AT its centroid → a = 0,
        # b = 1, silhouette 1.0
        assert got.loc[0, "mean_sil_r"] == 1.0
        assert got.loc[1, "mean_sil_r"] == 1.0

    def test_single_label_empty(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import label_silhouette

        tbl = pa.table({
            "vec_id": pa.array([1, 2], type=pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([7, 7], type=pa.int32()),
        })
        pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")
        assert len(label_silhouette(str(tmp_path)).to_pandas()) == 0


class TestCdcApply:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import cdc_apply

        ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
        ev = ev.dropna(subset=["user_id", "ts", "event_type",
                               "event_id"])
        ev["ts_us"] = ev["ts"].astype("int64")
        got = cdc_apply(SF).to_pandas().set_index("user_id") \
            .sort_index()
        exp_rows = {}
        for uid, g in ev.groupby("user_id"):
            g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
            last = g.iloc[-1]
            if last["event_type"] != "error":
                exp_rows[int(uid)] = (last["event_type"],
                                      int(last["ts_us"]),
                                      int(last["event_id"]),
                                      float(last["value"]), len(g))
        assert sorted(got.index.tolist()) == sorted(exp_rows)
        for uid, (st, ts, eid, val, nops) in exp_rows.items():
            row = got.loc[uid]
            assert row["state_type"] == st
            assert row["ts_us"] == ts
            assert row["event_id"] == eid
            assert row["state_value"] == val
            assert row["n_ops"] == nops

    def test_planted_tombstone(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import cdc_apply

        S = 1_000_000
        tbl = pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "ts": pa.array([1 * S, 2 * S, 3 * S, 1 * S, 2 * S],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
            "event_type": pa.array(
                ["view", "error", "purchase", "view", "error"]),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
            "props": pa.array(["{}"] * 5),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = cdc_apply(str(tmp_path)).to_pandas()
        # user 1 ends on an upsert (revived after a delete); user 2's
        # final op is the tombstone -> absent
        assert got["user_id"].tolist() == [1]
        assert got.iloc[0]["state_type"] == "purchase"
        assert got.iloc[0]["state_value"] == 3.0
        assert got.iloc[0]["n_ops"] == 3

    def test_tie_breaks_on_event_id(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import cdc_apply

        S = 1_000_000
        tbl = pa.table({
            "event_id": pa.array([7, 9, 8], type=pa.int64()),
            "ts": pa.array([S, S, S], type=pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1], type=pa.int64()),
            "event_type": pa.array(["view", "click", "purchase"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}"] * 3),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = cdc_apply(str(tmp_path)).to_pandas()
        # same ts: highest event_id (9, 'click') wins
        assert got.iloc[0]["state_type"] == "click"
        assert got.iloc[0]["n_ops"] == 3


class TestTypeDowMi:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import type_dow_mi

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "event_type"]).to_pandas()
        ev = ev.dropna()
        dow = (ev["ts"].astype("int64") // 86_400_000_000 + 3) % 7
        joint = pd.crosstab(ev["event_type"], dow).to_numpy() \
            .astype(float)
        n = joint.sum()
        px = joint.sum(axis=1) / n
        py = joint.sum(axis=0) / n
        p = joint / n
        with np.errstate(divide="ignore", invalid="ignore"):
            terms = p * np.log(p / np.outer(px, py))
        mi = np.nansum(terms)
        hx = -(px * np.log(px)).sum()
        hy = -(py * np.log(py)).sum()
        got = type_dow_mi(SF).to_pandas().iloc[0]
        assert got["n_events"] == int(n)
        assert abs(got["mi_r"] - mi) < 1e-3
        assert abs(got["nmi_r"] - mi / np.sqrt(hx * hy)) < 1e-3

    def test_independent_is_zero(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import type_dow_mi

        DAY = 86_400_000_000
        # 2 types x 2 days, perfectly balanced -> MI = 0
        ts, et = [], []
        for d in range(2):
            for t in ("a", "b"):
                for _ in range(5):
                    ts.append(d * DAY + len(ts))
                    et.append(t)
        tbl = pa.table({
            "event_id": pa.array(range(len(ts)), type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array([1] * len(ts), type=pa.int64()),
            "event_type": pa.array(et),
            "value": pa.array([1.0] * len(ts)),
            "props": pa.array(["{}"] * len(ts)),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = type_dow_mi(str(tmp_path)).to_pandas().iloc[0]
        assert got["mi_r"] == 0.0
        assert got["nmi_r"] == 0.0

    def test_deterministic_is_full_dependence(self, ray_session,
                                              tmp_path):
        from searchengine_ray.pipelines.relational import type_dow_mi

        DAY = 86_400_000_000
        # type fully determined by day -> NMI = 1 (symmetric 2x2)
        ts = [0] * 5 + [DAY] * 5
        et = ["a"] * 5 + ["b"] * 5
        tbl = pa.table({
            "event_id": pa.array(range(10), type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array([1] * 10, type=pa.int64()),
            "event_type": pa.array(et),
            "value": pa.array([1.0] * 10),
            "props": pa.array(["{}"] * 10),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = type_dow_mi(str(tmp_path)).to_pandas().iloc[0]
        assert got["nmi_r"] == 1.0


class TestMaxDrawdown:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import max_drawdown

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "value"]).to_pandas()
        ev = ev.dropna()
        day = (ev["ts"].astype("int64") // 86_400_000_000
               * 86_400_000_000)
        cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        daily = pd.DataFrame({"d": day, "c": cents}) \
            .groupby("d")["c"].sum().sort_index()
        grid = np.arange(daily.index[0],
                         daily.index[-1] + 86_400_000_000,
                         86_400_000_000, dtype=np.int64)
        v = np.zeros(grid.size, dtype=np.int64)
        v[(daily.index.to_numpy() - grid[0]) // 86_400_000_000] = \
            daily.to_numpy()
        rm = np.maximum.accumulate(v)
        dd = rm - v
        ti = int(np.argmax(dd))
        got = max_drawdown(SF).to_pandas().iloc[0]
        assert got["trough_day_us"] == grid[ti]
        assert got["drawdown_cents"] == dd[ti]
        assert got["peak_cents"] == rm[ti]

    def test_planted_series(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import max_drawdown

        DAY = 86_400_000_000
        # daily cents: 100, 300, 50, 300, 20 -> max dd = 300-20 = 280
        vals = [1.0, 3.0, 0.5, 3.0, 0.2]
        tbl = pa.table({
            "event_id": pa.array(range(5), type=pa.int64()),
            "ts": pa.array([i * DAY for i in range(5)],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * 5, type=pa.int64()),
            "event_type": pa.array(["view"] * 5),
            "value": pa.array(vals),
            "props": pa.array(["{}"] * 5),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = max_drawdown(str(tmp_path)).to_pandas().iloc[0]
        assert got["drawdown_cents"] == 280
        assert got["trough_day_us"] == 4 * DAY
        # earliest peak attaining 300 is day 1, not day 3
        assert got["peak_day_us"] == 1 * DAY
        assert got["trough_cents"] == 20

    def test_monotone_zero(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import max_drawdown

        DAY = 86_400_000_000
        tbl = pa.table({
            "event_id": pa.array(range(3), type=pa.int64()),
            "ts": pa.array([i * DAY for i in range(3)],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * 3, type=pa.int64()),
            "event_type": pa.array(["view"] * 3),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}"] * 3),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = max_drawdown(str(tmp_path)).to_pandas().iloc[0]
        assert got["drawdown_cents"] == 0
        assert got["peak_day_us"] == 0
        assert got["trough_day_us"] == 0


class TestSeasonalDecompose:
    def test_components_sum_back(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            seasonal_decompose)

        got = seasonal_decompose(SF).to_pandas()
        assert len(got) > 0
        # x = trend + seasonal + resid (to publish rounding)
        recon = got["trend_r"] + got["seasonal_r"] + got["resid_r"]
        assert np.allclose(recon, got["x_r"], atol=5e-4)
        # seasonal is a pure function of dow
        per_dow = got.groupby("dow")["seasonal_r"].nunique()
        assert (per_dow == 1).all()

    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            seasonal_decompose)

        DAY = 86_400_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "value"]).to_pandas().dropna()
        day = ev["ts"].astype("int64") // DAY * DAY
        cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        daily = pd.DataFrame({"d": day, "c": cents}) \
            .groupby("d")["c"].sum().sort_index()
        grid = np.arange(daily.index[0], daily.index[-1] + DAY, DAY,
                         dtype=np.int64)
        c = np.zeros(grid.size, dtype=np.int64)
        c[(daily.index.to_numpy() - grid[0]) // DAY] = daily.to_numpy()
        x = pd.Series(c, index=grid) / 100.0
        trend = x.rolling(7, center=True).mean()
        det = (x - trend).dropna()
        dow = (det.index.to_numpy() // DAY + 3) % 7
        md = pd.Series(det.to_numpy()).groupby(dow).mean()
        seas = md - md.mean()
        got = seasonal_decompose(SF).to_pandas().set_index("day_us")
        assert len(got) == len(det)
        for d in got.index:
            assert abs(got.loc[d, "trend_r"] - trend[d]) < 1e-3
            assert abs(got.loc[d, "seasonal_r"]
                       - seas[(d // DAY + 3) % 7]) < 1e-3

    def test_short_series_empty(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            seasonal_decompose)

        DAY = 86_400_000_000
        tbl = pa.table({
            "event_id": pa.array(range(3), type=pa.int64()),
            "ts": pa.array([i * DAY for i in range(3)],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * 3, type=pa.int64()),
            "event_type": pa.array(["view"] * 3),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}"] * 3),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        assert len(seasonal_decompose(str(tmp_path)).to_pandas()) == 0


class TestCappedInventory:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            INV_CAP, INV_START, capped_inventory)

        DAY = 86_400_000_000
        li = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_shipdate", "l_returnflag", "l_quantity"]
        ).to_pandas().dropna()
        li = li[li["l_returnflag"].isin(["R", "A"])]
        q = np.rint(li["l_quantity"].to_numpy()).astype(np.int64)
        sign = np.where(li["l_returnflag"].to_numpy() == "R", 1, -1)
        day = li["l_shipdate"].astype("int64") // DAY * DAY
        flows = pd.DataFrame({"d": day, "f": sign * q}) \
            .groupby("d")["f"].sum().sort_index()
        grid = np.arange(flows.index[0], flows.index[-1] + DAY, DAY,
                         dtype=np.int64)
        f = np.zeros(grid.size, dtype=np.int64)
        f[(flows.index.to_numpy() - grid[0]) // DAY] = flows.to_numpy()
        s, exp = INV_START, []
        for fl in f:
            s = max(0, min(INV_CAP, s + int(fl)))
            exp.append(s)
        got = capped_inventory(SF).to_pandas()
        assert got["day_us"].tolist() == grid.tolist()
        assert got["flow_units"].tolist() == f.tolist()
        assert got["stock_units"].tolist() == exp

    def test_planted_clamps_both_ways(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            capped_inventory)

        DAY = 86_400_000_000
        # start 1000: +5000 (clamp to 2000), -9999 (clamp to 0), +500
        rows = [("R", 50.0, 0), ("R", 4950.0, 0),
                ("A", 9999.0, 1 * DAY), ("R", 500.0, 2 * DAY)]
        tbl = pa.table({
            "l_orderkey": pa.array(range(len(rows)), type=pa.int64()),
            "l_partkey": pa.array([1] * len(rows), type=pa.int64()),
            "l_suppkey": pa.array([1] * len(rows), type=pa.int64()),
            "l_linenumber": pa.array([1] * len(rows), type=pa.int32()),
            "l_quantity": pa.array([r[1] for r in rows]),
            "l_extendedprice": pa.array([1.0] * len(rows)),
            "l_discount": pa.array([0.0] * len(rows)),
            "l_tax": pa.array([0.0] * len(rows)),
            "l_returnflag": pa.array([r[0] for r in rows]),
            "l_linestatus": pa.array(["O"] * len(rows)),
            "l_shipdate": pa.array([r[2] for r in rows],
                                   type=pa.timestamp("us")),
        })
        pq.write_table(tbl, f"{tmp_path}/lineitem.parquet")
        got = capped_inventory(str(tmp_path)).to_pandas()
        assert got["stock_units"].tolist() == [2000, 0, 500]
        assert got["flow_units"].tolist() == [5000, -9999, 500]


class TestDegreeAssortativity:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.graph import (
            degree_assortativity)

        o = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"]) \
            .to_pandas()
        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey", "l_suppkey"]) \
            .to_pandas()
        e = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")[
            ["o_custkey", "l_suppkey"]].drop_duplicates()
        dc = e.groupby("o_custkey").size()
        ds = e.groupby("l_suppkey").size()
        x = dc.loc[e["o_custkey"]].to_numpy(dtype=float)
        y = ds.loc[e["l_suppkey"]].to_numpy(dtype=float)
        exp = np.corrcoef(x, y)[0, 1]
        got = degree_assortativity(SF).to_pandas().iloc[0]
        assert got["n_edges"] == len(e)
        assert abs(got["assort_r"] - exp) < 1e-3

    def test_regular_graph_zero(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.graph import (
            degree_assortativity)

        # 2 customers x 2 suppliers complete bipartite: all degrees 2
        orders = pa.table({
            "o_orderkey": pa.array([1, 2], type=pa.int64()),
            "o_custkey": pa.array([10, 20], type=pa.int64()),
            "o_orderstatus": pa.array(["F", "F"]),
            "o_totalprice": pa.array([1.0, 1.0]),
            "o_orderdate": pa.array([0, 0], type=pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 2),
        })
        li = pa.table({
            "l_orderkey": pa.array([1, 1, 2, 2], type=pa.int64()),
            "l_partkey": pa.array([1] * 4, type=pa.int64()),
            "l_suppkey": pa.array([100, 200, 100, 200],
                                  type=pa.int64()),
            "l_linenumber": pa.array([1, 2, 1, 2], type=pa.int32()),
            "l_quantity": pa.array([1.0] * 4),
            "l_extendedprice": pa.array([1.0] * 4),
            "l_discount": pa.array([0.0] * 4),
            "l_tax": pa.array([0.0] * 4),
            "l_returnflag": pa.array(["N"] * 4),
            "l_linestatus": pa.array(["O"] * 4),
            "l_shipdate": pa.array([0] * 4, type=pa.timestamp("us")),
        })
        pq.write_table(orders, f"{tmp_path}/orders.parquet")
        pq.write_table(li, f"{tmp_path}/lineitem.parquet")
        got = degree_assortativity(str(tmp_path)).to_pandas().iloc[0]
        assert got["n_edges"] == 4
        assert got["assort_r"] == 0.0


class TestDqRules:
    def test_clean_corpus_matches_counts(self, ray_session):
        from searchengine_ray.pipelines.relational import dq_rules

        got = dq_rules(SF).to_pandas().set_index("rule_id")
        li = pq.read_table(f"{SF}/lineitem.parquet")
        o = pq.read_table(f"{SF}/orders.parquet")
        ev = pq.read_table(f"{SF}/events.parquet")
        assert got.index.tolist() == ["E1", "E2", "J1", "L1", "L2",
                                      "L3", "O1", "O2"]
        assert got.loc["L1", "n_checked"] == li.num_rows
        assert got.loc["O1", "n_checked"] == o.num_rows
        assert got.loc["E1", "n_checked"] == ev.num_rows
        # the synthetic corpus satisfies the range/enum contracts...
        assert (got.drop("J1")["n_violations"] == 0).all()
        # ...but its ship dates are NOT correlated with order dates,
        # so J1 (line ships before its order) fires — check exactly
        od = dict(zip(o["o_orderkey"].to_pylist(),
                      o["o_orderdate"].to_pylist()))
        lo = li["l_orderkey"].to_pylist()
        sd = li["l_shipdate"].to_pylist()
        checked = [(k, s) for k, s in zip(lo, sd) if k in od]
        assert got.loc["J1", "n_checked"] == len(checked)
        assert got.loc["J1", "n_violations"] == sum(
            1 for k, s in checked if s < od[k])

    def test_planted_violations(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import dq_rules

        DAY = 86_400_000_000
        li = pa.table({
            "l_orderkey": pa.array([1, 1, 2], type=pa.int64()),
            "l_partkey": pa.array([1] * 3, type=pa.int64()),
            "l_suppkey": pa.array([1] * 3, type=pa.int64()),
            "l_linenumber": pa.array([1, 2, 1], type=pa.int32()),
            "l_quantity": pa.array([0.0, 25.0, 99.0]),   # 2 x L1
            "l_discount": pa.array([0.5, 0.05, None]),    # 2 x L2
            "l_tax": pa.array([-1.0, 0.0, 0.0]),          # 1 x L3
            "l_returnflag": pa.array(["N"] * 3),
            "l_linestatus": pa.array(["O"] * 3),
            # line 1 of order 1 ships BEFORE the order date
            "l_shipdate": pa.array([0, 5 * DAY, 5 * DAY],
                                   type=pa.timestamp("us")),
        })
        orders = pa.table({
            "o_orderkey": pa.array([1, 2], type=pa.int64()),
            "o_custkey": pa.array([1, 1], type=pa.int64()),
            "o_orderstatus": pa.array(["F", "F"]),
            "o_totalprice": pa.array([-5.0, 10.0]),       # 1 x O1
            "o_orderdate": pa.array([2 * DAY, 2 * DAY],
                                    type=pa.timestamp("us")),
            "o_orderpriority": pa.array(["9-BOGUS", "2-HIGH"]),  # 1 x O2
        })
        ev = pa.table({
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array([0, 0], type=pa.timestamp("us")),
            "user_id": pa.array([1, 1], type=pa.int64()),
            "event_type": pa.array(["view", "teleport"]),  # 1 x E2
            "value": pa.array([-3.0, 1.0]),                # 1 x E1
            "props": pa.array(["{}"] * 2),
        })
        pq.write_table(li, f"{tmp_path}/lineitem.parquet")
        pq.write_table(orders, f"{tmp_path}/orders.parquet")
        pq.write_table(ev, f"{tmp_path}/events.parquet")
        got = dq_rules(str(tmp_path)).to_pandas().set_index("rule_id")
        assert got.loc["L1", "n_violations"] == 2
        assert got.loc["L2", "n_violations"] == 2  # null counts
        assert got.loc["L3", "n_violations"] == 1
        assert got.loc["O1", "n_violations"] == 1
        assert got.loc["O2", "n_violations"] == 1
        assert got.loc["E1", "n_violations"] == 1
        assert got.loc["E2", "n_violations"] == 1
        assert got.loc["J1", "n_violations"] == 1
        assert got.loc["J1", "n_checked"] == 3


class TestBusinessDayLag:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            business_day_lag)

        DAY = 86_400_000_000
        o = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_orderkey", "o_orderdate"]) \
            .to_pandas().dropna()
        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey", "l_shipdate"]) \
            .to_pandas().dropna()
        first = li.groupby("l_orderkey")["l_shipdate"].min()
        j = o.set_index("o_orderkey").join(first.rename("ship"),
                                           how="inner")
        a = j["o_orderdate"].astype("int64").to_numpy() // DAY
        s = j["ship"].astype("int64").to_numpy() // DAY

        def wb(d):
            m = d + 3
            return 5 * (m // 7) + np.minimum(m % 7, 5) - 3

        lag = wb(s + 1) - wb(a + 1)
        exp = pd.Series(lag).value_counts().sort_index()
        got = business_day_lag(SF).to_pandas().set_index("bd_lag")
        assert got["n_orders"].to_dict() == exp.to_dict()

    def test_weekend_span_zero(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            business_day_lag)

        DAY = 86_400_000_000
        # epoch day 2 = Saturday, day 3 = Sunday: order Fri(1),
        # ship Sun(3) -> 0 business days elapse after Friday
        # (Sat/Sun are not business days)
        orders = pa.table({
            "o_orderkey": pa.array([1, 2], type=pa.int64()),
            "o_custkey": pa.array([1, 1], type=pa.int64()),
            "o_orderstatus": pa.array(["F", "F"]),
            "o_totalprice": pa.array([1.0, 1.0]),
            # order 1: Friday (day 1); order 2: Thursday (day 0)
            "o_orderdate": pa.array([1 * DAY, 0],
                                    type=pa.timestamp("us")),
            "o_orderpriority": pa.array(["2-HIGH"] * 2),
        })
        li = pa.table({
            "l_orderkey": pa.array([1, 2], type=pa.int64()),
            "l_partkey": pa.array([1] * 2, type=pa.int64()),
            "l_suppkey": pa.array([1] * 2, type=pa.int64()),
            "l_linenumber": pa.array([1, 1], type=pa.int32()),
            "l_quantity": pa.array([1.0] * 2),
            "l_extendedprice": pa.array([1.0] * 2),
            "l_discount": pa.array([0.0] * 2),
            "l_tax": pa.array([0.0] * 2),
            "l_returnflag": pa.array(["N"] * 2),
            "l_linestatus": pa.array(["O"] * 2),
            # order 1 ships Sunday (day 3): Sat+Sun = 0 bd;
            # order 2 ships next Thursday (day 7): Fri+Mon+Tue+Wed+Thu = 5 bd
            "l_shipdate": pa.array([3 * DAY, 7 * DAY],
                                   type=pa.timestamp("us")),
        })
        pq.write_table(orders, f"{tmp_path}/orders.parquet")
        pq.write_table(li, f"{tmp_path}/lineitem.parquet")
        got = business_day_lag(str(tmp_path)).to_pandas() \
            .set_index("bd_lag")["n_orders"].to_dict()
        assert got == {0: 1, 5: 1}


class TestPriceModelOls:
    def test_matches_lstsq(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            price_model_ols)

        li = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"]
        ).to_pandas().dropna()
        part = pq.read_table(f"{SF}/part.parquet",
                             columns=["p_partkey", "p_retailprice"]) \
            .to_pandas()
        j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
        x1 = np.rint(j["l_quantity"].to_numpy())
        x2 = np.rint(j["p_retailprice"].to_numpy() * 100)
        y = np.rint(j["l_extendedprice"].to_numpy() * 100)
        A = np.column_stack([np.ones(len(j)), x1, x2])
        coef, *_ = np.linalg.lstsq(A, y, rcond=None)
        got = price_model_ols(SF).to_pandas().iloc[0]
        assert got["n"] == len(j)
        assert abs(got["b0_r"] - coef[0]) < max(1e-2 * abs(coef[0]),
                                                1e-2)
        assert abs(got["b1_r"] - coef[1]) < max(1e-3 * abs(coef[1]),
                                                1e-3)
        assert abs(got["b2_r"] - coef[2]) < max(1e-3 * abs(coef[2]),
                                                1e-3)
        pred = A @ coef
        r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
        assert abs(got["r2_r"] - r2) < 1e-3

    def test_planted_exact_plane(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            price_model_ols)

        # y = 100 + 2*x1 + 3*x2 exactly -> r2 = 1, coefs recovered
        x1 = np.array([1, 2, 3, 4, 5, 6], dtype=float)
        x2c = np.array([100, 200, 100, 300, 200, 400], dtype=float)
        y_c = 100 + 2 * x1 + 3 * x2c
        part = pa.table({
            "p_partkey": pa.array(range(6), type=pa.int64()),
            "p_name": pa.array(["p"] * 6),
            "p_brand": pa.array(["b"] * 6),
            "p_type": pa.array(["t"] * 6),
            "p_size": pa.array([1] * 6, type=pa.int32()),
            "p_retailprice": pa.array(x2c / 100.0),
        })
        li = pa.table({
            "l_orderkey": pa.array(range(6), type=pa.int64()),
            "l_partkey": pa.array(range(6), type=pa.int64()),
            "l_suppkey": pa.array([1] * 6, type=pa.int64()),
            "l_linenumber": pa.array([1] * 6, type=pa.int32()),
            "l_quantity": pa.array(x1),
            "l_extendedprice": pa.array(y_c / 100.0),
            "l_discount": pa.array([0.0] * 6),
            "l_tax": pa.array([0.0] * 6),
            "l_returnflag": pa.array(["N"] * 6),
            "l_linestatus": pa.array(["O"] * 6),
            "l_shipdate": pa.array([0] * 6, type=pa.timestamp("us")),
        })
        pq.write_table(part, f"{tmp_path}/part.parquet")
        pq.write_table(li, f"{tmp_path}/lineitem.parquet")
        got = price_model_ols(str(tmp_path)).to_pandas().iloc[0]
        assert abs(got["b0_r"] - 100.0) < 1e-3
        assert abs(got["b1_r"] - 2.0) < 1e-3
        assert abs(got["b2_r"] - 3.0) < 1e-3
        assert got["r2_r"] == 1.0


class TestZipfSlope:
    def test_matches_polyfit(self, ray_session):
        from searchengine_ray.pipelines.fulltext import (
            top_terms, zipf_slope)

        t = top_terms(SF, k=100)
        x = np.log(t["rank"].to_numpy() + 1.0)
        y = np.log(t["cf"].to_numpy().astype(float))
        slope, intercept = np.polyfit(x, y, 1)
        got = zipf_slope(SF).to_pandas().iloc[0]
        assert got["n_terms"] == len(t)
        assert abs(got["slope_r"] - slope) < 1e-3
        assert abs(got["intercept_r"] - intercept) < 1e-3
        # a natural-ish corpus decays: slope must be negative
        assert got["slope_r"] < 0
        assert 0 <= got["r2_r"] <= 1


class TestPcaTopComponent:
    def test_matches_eigh(self, ray_session, emb):
        from searchengine_ray.pipelines.similarity import (
            pca_top_component)

        _, m = emb
        C = np.cov(m, rowvar=False, bias=True)
        w, v = np.linalg.eigh(C)
        top = v[:, -1]
        top = top if np.abs(top).max() == top[np.abs(top).argmax()] \
            else -top
        got = pca_top_component(SF).to_pandas()
        assert len(got) == m.shape[1]
        lo = got["loading_r"].to_numpy()
        # direction matches the dominant eigenvector up to rounding
        # and power-iteration residual (10 iters)
        cos = abs(float(lo @ top)
                  / (np.linalg.norm(lo) * np.linalg.norm(top)))
        assert cos > 0.999
        assert abs(got["eigval_r"].iloc[0] - w[-1]) < 1e-2 * w[-1] \
            + 1e-3

    def test_sign_convention(self, ray_session):
        from searchengine_ray.pipelines.similarity import (
            pca_top_component)

        got = pca_top_component(SF).to_pandas()
        lo = got["loading_r"].to_numpy()
        assert lo[np.abs(lo).argmax()] > 0

    def test_planted_axis(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.similarity import (
            pca_top_component)

        # variance concentrated on dim 1: loadings ≈ e1
        rng = np.random.default_rng(7)
        m = np.zeros((50, 4))
        m[:, 1] = rng.normal(0, 10.0, 50)
        m[:, 0] = rng.normal(0, 0.1, 50)
        tbl = pa.table({
            "vec_id": pa.array(range(50), type=pa.int64()),
            "embedding": pa.array([r.tolist() for r in m],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0] * 50, type=pa.int32()),
        })
        pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")
        got = pca_top_component(str(tmp_path)).to_pandas()
        lo = got["loading_r"].to_numpy()
        assert abs(lo[1]) > 0.99
        assert lo[1] > 0  # sign convention: dominant dim positive


class TestEmbeddingQuantize:
    def test_matches_bruteforce(self, ray_session, emb):
        from searchengine_ray.pipelines.similarity import (
            embedding_quantize)

        ids, m = emb
        mn = m.min(axis=0)
        span = m.max(axis=0) - mn
        q = np.floor((m - mn) * 256.0 / np.where(span > 0, span, 1.0))
        codes = np.where(span > 0, np.clip(q, 0, 255), 0.0)
        recon = np.where(span > 0, mn + (codes + 0.5) * (span / 256.0),
                         mn)
        mse = ((m - recon) ** 2).sum(axis=1) / m.shape[1]
        got = embedding_quantize(SF).to_pandas().set_index("vec_id")
        assert len(got) == len(ids)
        for i, vid in enumerate(ids):
            assert got.loc[vid, "code_sum"] == int(codes[i].sum())
            assert abs(got.loc[vid, "mse_r"] - mse[i]) < 1e-3

    def test_quantization_error_bounded(self, ray_session, emb):
        from searchengine_ray.pipelines.similarity import (
            embedding_quantize)

        _, m = emb
        span = m.max(axis=0) - m.min(axis=0)
        # per-dim error <= half a bin -> mse <= mean((span/256)^2)/4
        bound = float(((span / 256.0) ** 2).mean()) / 4.0 + 1e-9
        got = embedding_quantize(SF).to_pandas()
        assert (got["mse_r"] <= bound + 5e-5).all()

    def test_constant_dim_codes_zero(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.similarity import (
            embedding_quantize)

        tbl = pa.table({
            "vec_id": pa.array([1, 2], type=pa.int64()),
            "embedding": pa.array([[5.0, 0.0], [5.0, 1.0]],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0, 0], type=pa.int32()),
        })
        pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")
        got = embedding_quantize(str(tmp_path)).to_pandas() \
            .set_index("vec_id")
        # dim 0 constant -> code 0, exact reconstruction at mn;
        # dim 1: vec 1 at min (code 0), vec 2 at max (code 255)
        assert got.loc[1, "code_sum"] == 0
        assert got.loc[2, "code_sum"] == 255


class TestBhBrandReturns:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            _erf_as7, bh_brand_returns)

        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_partkey", "l_returnflag"]) \
            .to_pandas().dropna()
        part = pq.read_table(f"{SF}/part.parquet",
                             columns=["p_partkey", "p_brand"]) \
            .to_pandas()
        j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
        g = j.groupby("p_brand").agg(
            n=("l_returnflag", "size"),
            k=("l_returnflag", lambda s: (s == "R").sum()))
        p0 = g["k"].sum() / g["n"].sum()
        z = (g["k"] / g["n"] - p0) / np.sqrt(p0 * (1 - p0) / g["n"])
        p = 1.0 - _erf_as7(np.abs(z.to_numpy()) / np.sqrt(2.0))
        got = bh_brand_returns(SF).to_pandas().set_index("p_brand")
        assert sorted(got.index) == sorted(g.index)
        for b in g.index:
            assert got.loc[b, "n_lines"] == g.loc[b, "n"]
            assert got.loc[b, "n_returns"] == g.loc[b, "k"]
            assert abs(got.loc[b, "z_r"] - z[b]) < 1e-3
        # BH invariants: adj >= raw p, adj <= 1, monotone in p order
        srt = got.sort_values("p_r")
        assert (srt["p_adj_r"] >= srt["p_r"] - 1e-9).all()
        assert (srt["p_adj_r"] <= 1.0).all()
        assert (np.diff(srt["p_adj_r"].to_numpy()) >= -1e-9).all()

    def test_erf_kernel_accuracy(self):
        from math import erf

        from searchengine_ray.pipelines.relational import _erf_as7

        xs = np.linspace(0, 4, 200)
        approx = _erf_as7(xs)
        exact = np.array([erf(x) for x in xs])
        assert np.abs(approx - exact).max() < 1.5e-7

    def test_planted_outlier_brand(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            bh_brand_returns)

        # brand B returns everything, brand A nothing, 200 lines each
        nper = 200
        part = pa.table({
            "p_partkey": pa.array([1, 2], type=pa.int64()),
            "p_name": pa.array(["x", "y"]),
            "p_brand": pa.array(["A", "B"]),
            "p_type": pa.array(["t"] * 2),
            "p_size": pa.array([1] * 2, type=pa.int32()),
            "p_retailprice": pa.array([1.0, 1.0]),
        })
        li = pa.table({
            "l_orderkey": pa.array(range(2 * nper), type=pa.int64()),
            "l_partkey": pa.array([1] * nper + [2] * nper,
                                  type=pa.int64()),
            "l_suppkey": pa.array([1] * (2 * nper), type=pa.int64()),
            "l_linenumber": pa.array([1] * (2 * nper),
                                     type=pa.int32()),
            "l_quantity": pa.array([1.0] * (2 * nper)),
            "l_extendedprice": pa.array([1.0] * (2 * nper)),
            "l_discount": pa.array([0.0] * (2 * nper)),
            "l_tax": pa.array([0.0] * (2 * nper)),
            "l_returnflag": pa.array(["N"] * nper + ["R"] * nper),
            "l_linestatus": pa.array(["O"] * (2 * nper)),
            "l_shipdate": pa.array([0] * (2 * nper),
                                   type=pa.timestamp("us")),
        })
        pq.write_table(part, f"{tmp_path}/part.parquet")
        pq.write_table(li, f"{tmp_path}/lineitem.parquet")
        got = bh_brand_returns(str(tmp_path)).to_pandas() \
            .set_index("p_brand")
        # z = +-sqrt(n) = +-14.1: p ~ 0 -> both reject after BH
        assert got.loc["B", "z_r"] > 14
        assert got.loc["A", "z_r"] < -14
        assert (got["p_adj_r"] < 1e-4).all()


class TestLofOutliers:
    def test_matches_bruteforce(self, ray_session, emb):
        from searchengine_ray.pipelines.fulltext import _round_vec
        from searchengine_ray.pipelines.similarity import (
            LOF_K, lof_outliers)

        ids, m = emb
        order = np.argsort(ids)
        ids_s, ms = ids[order], m[order]
        nrm = np.linalg.norm(ms, axis=1)
        sims = (ms @ ms.T) / np.outer(nrm, nrm)
        di = np.rint(_round_vec((1.0 - sims).ravel(), 4)
                     .reshape(sims.shape) * 10000).astype(np.int64)
        np.fill_diagonal(di, np.iinfo(np.int64).max)
        k = LOF_K
        kdist = np.partition(di, k - 1, axis=1)[:, k - 1]
        got = lof_outliers(SF).to_pandas().set_index("vec_id")
        assert len(got) == len(ids_s)
        for i, vid in enumerate(ids_s[:50]):
            nb = np.nonzero(di[i] <= kdist[i])[0]
            assert got.loc[vid, "n_nb"] == nb.size
            assert got.loc[vid, "k_dist_r"] == kdist[i] / 10000.0
            reach = np.maximum(kdist[nb], di[i, nb])
            lrd_i = nb.size * 10000.0 / reach.sum()
            assert abs(got.loc[vid, "lrd_r"] - lrd_i) < 1e-3
        # LOF of a uniform cloud hovers near 1
        assert 0.5 < got["lof_r"].median() < 2.0

    def test_planted_outlier(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.similarity import lof_outliers

        rng = np.random.default_rng(3)
        # loose-but-coherent cluster + one isolated far point (noise
        # wide enough that rounded 4-dp cosine distances stay nonzero
        # — an ultra-tight cluster trips the zero-reach drop rule)
        base = np.tile([10.0, 0.0, 0.0], (30, 1)) \
            + rng.normal(0, 0.8, (30, 3))
        far = np.array([[0.0, 10.0, 0.1]])
        m = np.vstack([base, far])
        tbl = pa.table({
            "vec_id": pa.array(range(31), type=pa.int64()),
            "embedding": pa.array([r.tolist() for r in m],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0] * 31, type=pa.int32()),
        })
        pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")
        got = lof_outliers(str(tmp_path)).to_pandas() \
            .set_index("vec_id")
        # the isolated vector's LOF dominates the cluster's
        assert got.loc[30, "lof_r"] == got["lof_r"].max()
        assert got.loc[30, "lof_r"] > 2.0

    def test_too_few_vectors_empty(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.similarity import lof_outliers

        tbl = pa.table({
            "vec_id": pa.array(range(3), type=pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0] * 3, type=pa.int32()),
        })
        pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")
        assert len(lof_outliers(str(tmp_path)).to_pandas()) == 0


class TestFisherExact:
    def test_matches_scipy_free_reference(self, ray_session):
        from math import exp, lgamma

        from searchengine_ray.pipelines.relational import fisher_exact

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "event_type"]) \
            .to_pandas().dropna()
        g = ev.groupby("user_id")["event_type"].agg(
            ex=lambda s: int((s == "error").any()),
            oc=lambda s: int((s == "purchase").any()))
        a = int(((g["ex"] == 1) & (g["oc"] == 1)).sum())
        b = int(((g["ex"] == 1) & (g["oc"] == 0)).sum())
        c = int(((g["ex"] == 0) & (g["oc"] == 1)).sum())
        d = int(((g["ex"] == 0) & (g["oc"] == 0)).sum())
        n, r1, c1 = a + b + c + d, a + b, a + c

        def lp(k):
            return (lgamma(r1 + 1) - lgamma(k + 1)
                    - lgamma(r1 - k + 1) + lgamma(n - r1 + 1)
                    - lgamma(c1 - k + 1)
                    - lgamma(n - r1 - (c1 - k) + 1)
                    - (lgamma(n + 1) - lgamma(c1 + 1)
                       - lgamma(n - c1 + 1)))

        lim = exp(lp(a)) * (1 + 1e-7)
        p = sum(exp(lp(k))
                for k in range(max(0, r1 + c1 - n),
                               min(r1, c1) + 1)
                if exp(lp(k)) <= lim)
        got = fisher_exact(SF).to_pandas().iloc[0]
        assert (got["a"], got["b"], got["c"], got["d"]) == (a, b, c, d)
        assert got["n_users"] == n
        assert abs(got["p_r"] - p) < 1e-3
        assert 0.0 <= got["p_r"] <= 1.0

    def test_planted_association(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import fisher_exact

        # 40 users: 20 exposed all purchase, 20 unexposed none ->
        # strongest possible association, tiny p
        rows = []
        eid = 0
        for u in range(20):
            rows.append((eid, u, "error")); eid += 1
            rows.append((eid, u, "purchase")); eid += 1
        for u in range(20, 40):
            rows.append((eid, u, "view")); eid += 1
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows],
                                 type=pa.int64()),
            "ts": pa.array([0] * len(rows), type=pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows],
                                type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = fisher_exact(str(tmp_path)).to_pandas().iloc[0]
        assert (got["a"], got["b"], got["c"], got["d"]) \
            == (20, 0, 0, 20)
        # p = 2/C(40,20) ~ 1.45e-11 -> rounds to 0; odds 0 (b*c = 0)
        assert got["p_r"] == 0.0
        assert got["odds_r"] == 0.0


class TestIsotonicDaily:
    def test_matches_minimax(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            isotonic_daily)

        DAY = 86_400_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "value"]).to_pandas() \
            .dropna()
        day = ev["ts"].astype("int64") // DAY * DAY
        cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        daily = pd.DataFrame({"d": day, "c": cents}) \
            .groupby("d")["c"].sum().sort_index()
        grid = np.arange(daily.index[0], daily.index[-1] + DAY, DAY,
                         dtype=np.int64)
        c = np.zeros(grid.size, dtype=np.int64)
        c[(daily.index.to_numpy() - grid[0]) // DAY] = daily.to_numpy()
        n = c.size
        ps = np.concatenate(([0], np.cumsum(c)))
        fit = np.empty(n)
        for t in range(n):
            best = -np.inf
            for i in range(t + 1):
                lo = min((ps[j + 1] - ps[i]) / (j - i + 1)
                         for j in range(t, n))
                best = max(best, lo)
            fit[t] = best / 100.0
        got = isotonic_daily(SF).to_pandas()
        assert np.allclose(got["fit_r"], fit, atol=1e-3)
        # isotonic invariants
        f = got["fit_r"].to_numpy()
        assert (np.diff(f) >= -1e-9).all()
        # means are preserved blockwise: total fit mass = total mass
        assert abs(f.sum() - (c / 100.0).sum()) < 1e-2

    def test_planted_violation_pool(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            isotonic_daily)

        DAY = 86_400_000_000
        # series 1, 5, 3 -> pool (5,3) -> fit 1, 4, 4
        tbl = pa.table({
            "event_id": pa.array(range(3), type=pa.int64()),
            "ts": pa.array([0, DAY, 2 * DAY],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * 3, type=pa.int64()),
            "event_type": pa.array(["view"] * 3),
            "value": pa.array([1.0, 5.0, 3.0]),
            "props": pa.array(["{}"] * 3),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = isotonic_daily(str(tmp_path)).to_pandas()
        assert got["fit_r"].tolist() == [1.0, 4.0, 4.0]


class TestRecencyWeightedValue:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            recency_weighted_value)

        DAY = 86_400_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "value"]) \
            .to_pandas().dropna()
        T = ev["ts"].astype("int64").max()
        cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        dtd = (T - ev["ts"].astype("int64").to_numpy()) / DAY
        w = cents * np.power(0.5, dtd / 7.0)
        exp = pd.DataFrame({"u": ev["user_id"].to_numpy(),
                            "rc": cents, "dv": w}) \
            .groupby("u").agg(rc=("rc", "sum"), dv=("dv", "sum"))
        got = recency_weighted_value(SF).to_pandas() \
            .set_index("user_id")
        assert len(got) == len(exp)
        for u in exp.index:
            assert got.loc[u, "raw_cents"] == exp.loc[u, "rc"]
            assert abs(got.loc[u, "decayed_r"]
                       - exp.loc[u, "dv"]) < 1e-3
        # decayed value never exceeds raw value
        assert (got["decayed_r"]
                <= got["raw_cents"] + 1e-9).all()

    def test_planted_half_life(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            recency_weighted_value)

        DAY = 86_400_000_000
        # user 1: 100 cents at T (weight 1) + 100 cents 7 days
        # earlier (weight 0.5) -> decayed 150
        tbl = pa.table({
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array([7 * DAY, 0], type=pa.timestamp("us")),
            "user_id": pa.array([1, 1], type=pa.int64()),
            "event_type": pa.array(["view"] * 2),
            "value": pa.array([1.0, 1.0]),
            "props": pa.array(["{}"] * 2),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = recency_weighted_value(str(tmp_path)).to_pandas()
        assert got.iloc[0]["raw_cents"] == 200
        assert abs(got.iloc[0]["decayed_r"] - 150.0) < 1e-9


class TestRollingTypeCorr:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            rolling_type_corr)

        DAY = 86_400_000_000
        ev = pq.read_table(
            f"{SF}/events.parquet",
            columns=["ts", "event_type", "value"]).to_pandas().dropna()
        ev = ev[ev["event_type"].isin(["click", "view"])]
        day = ev["ts"].astype("int64") // DAY * DAY
        cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        piv = pd.DataFrame({"d": day, "et": ev["event_type"],
                            "c": cents}) \
            .groupby(["d", "et"])["c"].sum().unstack(fill_value=0)
        grid = np.arange(piv.index.min(), piv.index.max() + DAY, DAY,
                         dtype=np.int64)
        piv = piv.reindex(grid, fill_value=0)
        a = piv.get("click", pd.Series(0, index=grid)).to_numpy(
            dtype=float)
        b = piv.get("view", pd.Series(0, index=grid)).to_numpy(
            dtype=float)
        got = rolling_type_corr(SF).to_pandas().set_index("day_us")
        assert len(got) == grid.size - 6
        for t in range(6, grid.size):
            wa, wb = a[t - 6:t + 1], b[t - 6:t + 1]
            if wa.std() > 0 and wb.std() > 0:
                exp = np.corrcoef(wa, wb)[0, 1]
            else:
                exp = 0.0
            assert abs(got.loc[grid[t], "corr_r"] - exp) < 1e-3

    def test_planted_perfect_corr(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            rolling_type_corr)

        DAY = 86_400_000_000
        # view = 2 x click on every day -> corr 1 everywhere
        rows = []
        eid = 0
        for dd in range(8):
            rows.append((eid, dd * DAY, "click", float(dd + 1)))
            eid += 1
            rows.append((eid, dd * DAY, "view", 2.0 * (dd + 1)))
            eid += 1
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows],
                                 type=pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([r[3] for r in rows]),
            "props": pa.array(["{}"] * len(rows)),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = rolling_type_corr(str(tmp_path)).to_pandas()
        assert len(got) == 2
        assert (got["corr_r"] == 1.0).all()


class TestMarkovAttribution:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            MARKOV_CHANNELS, MARKOV_ITERS, markov_attribution)

        ev = pq.read_table(
            f"{SF}/events.parquet",
            columns=["user_id", "event_type", "ts", "event_id"]) \
            .to_pandas().dropna()
        ev["ts_us"] = ev["ts"].astype("int64")
        trans = {}
        for _, g in ev.groupby("user_id"):
            g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
            seq = g["event_type"].tolist()
            if "purchase" in seq:
                seq = seq[: seq.index("purchase") + 1]
                path = ["START"] + seq
            else:
                path = ["START"] + seq + ["NULL"]
            for s, t in zip(path[:-1], path[1:]):
                trans[(s, t)] = trans.get((s, t), 0) + 1
        tot = {}
        for (s, _), n in trans.items():
            tot[s] = tot.get(s, 0) + n
        edges = [(s, t, n / tot[s]) for (s, t), n in trans.items()]
        sources = sorted(tot)

        def absorb(masked):
            val = {s: 0.0 for s in sources}
            val["purchase"], val["NULL"] = 1.0, 0.0
            for _ in range(MARKOV_ITERS):
                new = {s: 0.0 for s in sources}
                for s, t, p in edges:
                    new[s] += p * val[t]
                if masked in new:
                    new[masked] = 0.0
                val.update(new)
            return val.get("START", 0.0)

        pb = absorb(None)
        got = markov_attribution(SF).to_pandas().set_index("channel")
        assert abs(got["p_base_r"].iloc[0] - pb) < 1e-3
        effs = {}
        for c in MARKOV_CHANNELS:
            pc = absorb(c)
            assert abs(got.loc[c, "p_removed_r"] - pc) < 1e-3
            effs[c] = (pb - pc) / pb if pb > 0 else 0.0
        se = sum(effs.values())
        for c in MARKOV_CHANNELS:
            assert abs(got.loc[c, "attribution_r"]
                       - (effs[c] / se if se > 0 else 0.0)) < 1e-3
        # shares sum to ~1 when any effect exists
        if se > 0:
            assert abs(got["attribution_r"].sum() - 1.0) < 5e-3

    def test_planted_single_gate(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            markov_attribution)

        # every conversion goes START->click->purchase; view users
        # never convert: click gets 100% attribution
        rows = []
        eid = 0
        for u in range(10):
            rows.append((eid, u, "click", 2 * eid)); eid += 1
            rows.append((eid, u, "purchase", 2 * eid)); eid += 1
        for u in range(10, 20):
            rows.append((eid, u, "view", 2 * eid)); eid += 1
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows],
                                 type=pa.int64()),
            "ts": pa.array([r[3] * 1_000_000 for r in rows],
                           type=pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows],
                                type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = markov_attribution(str(tmp_path)).to_pandas() \
            .set_index("channel")
        assert abs(got["p_base_r"].iloc[0] - 0.5) < 1e-9
        assert got.loc["click", "p_removed_r"] == 0.0
        assert got.loc["click", "attribution_r"] == 1.0
        assert got.loc["view", "attribution_r"] == 0.0
        # removing 'view' doesn't touch the converting path
        assert abs(got.loc["view", "p_removed_r"] - 0.5) < 1e-9


class TestNgramNovelty:
    def test_matches_bruteforce(self, ray_session, docs):
        from searchengine_ray.pipelines.dedup import (
            ngram_novelty, word_shingles)

        sh = {d: word_shingles(t or "") for d, t in docs.items()}
        first = {}
        for d in sorted(sh):
            for g in sh[d]:
                first.setdefault(g, d)
        got = ngram_novelty(SF).to_pandas().set_index("doc_id")
        for d, grams in sh.items():
            if not grams:
                assert d not in got.index
                continue
            novel = sum(1 for g in grams if first[g] == d)
            assert got.loc[d, "n_grams"] == len(grams)
            assert got.loc[d, "n_novel"] == novel
        # doc 0 (no earlier docs) is fully novel
        d0 = min(d for d in sh if sh[d])
        assert got.loc[d0, "novelty_r"] == 1.0

    def test_planted_repeat(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.dedup import ngram_novelty

        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array([
                "alpha beta gamma delta",
                "alpha beta gamma delta",          # pure repeat
                "alpha beta gamma epsilon zeta",   # partial repeat
            ]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([10, 10, 10], type=pa.int64()),
        })
        pq.write_table(tbl, f"{tmp_path}/documents.parquet")
        got = ngram_novelty(str(tmp_path)).to_pandas() \
            .set_index("doc_id")
        assert got.loc[1, "novelty_r"] == 1.0
        assert got.loc[2, "novelty_r"] == 0.0
        # doc 3: grams {abg, bge, gez} — abg seen in doc 1
        assert got.loc[3, "n_grams"] == 3
        assert got.loc[3, "n_novel"] == 2


class TestBurrowsDelta:
    def test_metric_properties(self, ray_session):
        from searchengine_ray.pipelines.textstats import burrows_delta

        got = burrows_delta(SF).to_pandas()
        # all source pairs present, delta symmetric-positive
        n_src = len(set(got["source_a"]) | set(got["source_b"]))
        assert len(got) == n_src * (n_src - 1) // 2
        assert (got["delta_r"] >= 0).all()
        assert (got["n_terms"] <= 50).all()

    def test_planted_styles(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.textstats import burrows_delta

        # two sources share a style (identical term mix), the third
        # is distinct -> within-style delta < cross-style delta
        style_a = "apple banana cherry date " * 20
        style_b = "xylophone yacht zebra walnut " * 20
        tbl = pa.table({
            "doc_id": pa.array(range(6), type=pa.int64()),
            "text": pa.array([style_a, style_a] * 2 + [style_b] * 2),
            "lang": pa.array(["en"] * 6),
            "source": pa.array(["s1", "s2", "s1", "s2", "s3", "s3"]),
            "n_chars": pa.array([100] * 6, type=pa.int64()),
        })
        pq.write_table(tbl, f"{tmp_path}/documents.parquet")
        got = burrows_delta(str(tmp_path)).to_pandas() \
            .set_index(["source_a", "source_b"])
        d12 = got.loc[("s1", "s2"), "delta_r"]
        d13 = got.loc[("s1", "s3"), "delta_r"]
        d23 = got.loc[("s2", "s3"), "delta_r"]
        assert d12 < d13 and d12 < d23


class TestHllSetAlgebra:
    def test_exact_side_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            HLL_TYPES, hll_set_algebra)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "event_type"]) \
            .to_pandas().dropna()
        sets = {t: set(ev.loc[ev["event_type"] == t, "user_id"])
                for t in HLL_TYPES}
        got = hll_set_algebra(SF).to_pandas() \
            .set_index(["type_a", "type_b"])
        assert len(got) == 10
        for (a, b), row in got.iterrows():
            assert row["exact_a"] == len(sets[a])
            assert row["exact_b"] == len(sets[b])
            assert row["exact_union"] == len(sets[a] | sets[b])
            assert row["exact_inter"] == len(sets[a] & sets[b])
            # inclusion-exclusion holds exactly on the exact side
            assert (row["exact_a"] + row["exact_b"]
                    - row["exact_union"] == row["exact_inter"])

    def test_estimator_accuracy(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            hll_set_algebra)

        got = hll_set_algebra(SF).to_pandas()
        # 256-register HLL: relative error ~6.5%; allow 3 sigma and
        # small-count slack on every published estimate
        for _, r in got.iterrows():
            for est, exact in (("est_a_r", "exact_a"),
                               ("est_b_r", "exact_b"),
                               ("est_union_r", "exact_union")):
                if r[exact] > 0:
                    rel = abs(r[est] - r[exact]) / r[exact]
                    assert rel < 0.25, (r[est], r[exact])

    def test_union_register_merge_monotone(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            hll_set_algebra)

        got = hll_set_algebra(SF).to_pandas()
        # union estimate >= each side's estimate (register max-merge
        # can only raise the estimate)
        assert (got["est_union_r"] >= got["est_a_r"] - 1e-9).all()
        assert (got["est_union_r"] >= got["est_b_r"] - 1e-9).all()


class TestDftWeeklyPower:
    def test_matches_numpy_fft(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            dft_weekly_power)

        DAY = 86_400_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "value"]).to_pandas() \
            .dropna()
        day = ev["ts"].astype("int64") // DAY * DAY
        cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        daily = pd.DataFrame({"d": day, "c": cents}) \
            .groupby("d")["c"].sum().sort_index()
        grid = np.arange(daily.index[0], daily.index[-1] + DAY, DAY,
                         dtype=np.int64)
        v = np.zeros(grid.size)
        v[(daily.index.to_numpy() - grid[0]) // DAY] = \
            daily.to_numpy() / 100.0
        got = dft_weekly_power(SF).to_pandas().set_index("k")
        assert len(got) == 7
        t = np.arange(grid.size)
        for k in range(7):
            z = (v * np.exp(2j * np.pi * (k * t % 7) / 7)).sum()
            assert abs(got.loc[k, "re_r"] - z.real) < 1e-2
            assert abs(got.loc[k, "im_r"] - z.imag) < 1e-2
        # k=0 is the plain sum
        assert abs(got.loc[0, "re_r"] - v.sum()) < 1e-2
        assert got.loc[0, "im_r"] == 0.0

    def test_planted_pure_weekly(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            dft_weekly_power)

        DAY = 86_400_000_000
        # cos wave with period 7 (+ constant offset): power
        # concentrates at k=0 and k=1/k=6
        n = 28
        vals = 10.0 + 5.0 * np.cos(2 * np.pi * np.arange(n) / 7)
        tbl = pa.table({
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array([i * DAY for i in range(n)],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * n, type=pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(np.round(vals, 2)),
            "props": pa.array(["{}"] * n),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = dft_weekly_power(str(tmp_path)).to_pandas() \
            .set_index("k")["power_r"]
        assert got.loc[1] > 100 * max(got.loc[2], got.loc[3])


class TestNearestEventJoin:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            nearest_event_join)

        ev = pq.read_table(
            f"{SF}/events.parquet",
            columns=["event_id", "user_id", "ts", "event_type"]) \
            .to_pandas().dropna()
        ev["tu"] = ev["ts"].astype("int64")
        views = ev[ev["event_type"] == "view"]
        clicks = ev[ev["event_type"] == "click"]
        vmap = {u: np.sort(g["tu"].to_numpy())
                for u, g in views.groupby("user_id")}
        got = nearest_event_join(SF).to_pandas() \
            .set_index("event_id")
        n_expected = 0
        for _, c in clicks.iterrows():
            vt = vmap.get(c["user_id"])
            if vt is None:
                assert c["event_id"] not in got.index
                continue
            n_expected += 1
            back = vt[vt <= c["tu"]]
            fwd = vt[vt > c["tu"]]
            cands = []
            if back.size:
                cands.append((c["tu"] - back[-1], back[-1]))
            if fwd.size:
                cands.append((fwd[0] - c["tu"], fwd[0]))
            # min dt; ties -> the backward (earlier) candidate,
            # which sorts first because its ts is smaller
            dt, vts = min(cands, key=lambda x: (x[0], x[1]))
            assert got.loc[c["event_id"], "view_ts_us"] == vts
            assert got.loc[c["event_id"], "dt_us"] == dt
        assert len(got) == n_expected

    def test_planted_tie_backward(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            nearest_event_join)

        S = 1_000_000
        # views at t=10 and t=30; click at t=20 -> equidistant,
        # must pick the earlier view (t=10)
        tbl = pa.table({
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": pa.array([10 * S, 30 * S, 20 * S],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1], type=pa.int64()),
            "event_type": pa.array(["view", "view", "click"]),
            "value": pa.array([1.0] * 3),
            "props": pa.array(["{}"] * 3),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = nearest_event_join(str(tmp_path)).to_pandas()
        assert len(got) == 1
        assert got.iloc[0]["view_ts_us"] == 10 * S
        assert got.iloc[0]["dt_us"] == 10 * S


class TestSeasonalAnomalies:
    def test_consistent_with_decompose(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            seasonal_anomalies, seasonal_decompose)

        dec = seasonal_decompose(SF).to_pandas()
        resid = dec["resid_r"].to_numpy()
        n = resid.size
        med = np.sort(resid)[int(np.ceil(n * 0.5)) - 1]
        ad = np.abs(resid - med)
        mad = np.sort(ad)[int(np.ceil(n * 0.5)) - 1]
        got = seasonal_anomalies(SF).to_pandas()
        if mad > 0:
            exp_days = dec["day_us"].to_numpy()[ad / mad > 3.0]
            assert got["day_us"].tolist() == sorted(exp_days)
            assert (got["score_r"] > 3.0).all()
        else:
            assert len(got) == 0

    def test_planted_spike(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            seasonal_anomalies)

        DAY = 86_400_000_000
        rng = np.random.default_rng(11)
        n = 28
        vals = 100.0 + rng.normal(0, 1.0, n)
        vals[14] = 1000.0  # massive mid-series spike
        tbl = pa.table({
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array([i * DAY for i in range(n)],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * n, type=pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(np.round(vals, 2)),
            "props": pa.array(["{}"] * n),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = seasonal_anomalies(str(tmp_path)).to_pandas()
        assert 14 * DAY in got["day_us"].tolist()


class TestGroupTopkTies:
    def test_matches_rank(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            group_topk_ties)

        o = pq.read_table(
            f"{SF}/orders.parquet",
            columns=["o_orderpriority", "o_orderkey", "o_totalprice"]
        ).to_pandas().dropna()
        o["c"] = np.rint(o["o_totalprice"].to_numpy() * 100) \
            .astype(np.int64)
        got = group_topk_ties(SF).to_pandas()
        for p, g in o.groupby("o_orderpriority"):
            g = g.sort_values("c", ascending=False)
            ranks = g["c"].rank(method="min", ascending=False)
            exp = set(g.loc[ranks <= 3, "o_orderkey"])
            sub = got[got["o_orderpriority"] == p]
            assert set(sub["o_orderkey"]) == exp
            assert (sub["rnk"] <= 3).all()

    def test_planted_ties_kept(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            group_topk_ties)

        # four orders tie at rank 3 -> six rows returned
        prices = [100.0, 90.0, 80.0, 80.0, 80.0, 80.0, 10.0]
        tbl = pa.table({
            "o_orderkey": pa.array(range(len(prices)),
                                   type=pa.int64()),
            "o_custkey": pa.array([1] * len(prices),
                                  type=pa.int64()),
            "o_orderstatus": pa.array(["F"] * len(prices)),
            "o_totalprice": pa.array(prices),
            "o_orderdate": pa.array([0] * len(prices),
                                    type=pa.timestamp("us")),
            "o_orderpriority": pa.array(["2-HIGH"] * len(prices)),
        })
        pq.write_table(tbl, f"{tmp_path}/orders.parquet")
        got = group_topk_ties(str(tmp_path)).to_pandas()
        assert len(got) == 6
        assert (got["rnk"].tolist().count(3)) == 4
        assert 6 not in got["o_orderkey"].tolist()


class TestTrendingTerms:
    def test_matches_bruteforce(self, ray_session, docs):
        from searchengine_ray.pipelines.fulltext import top_terms
        from searchengine_ray.pipelines.textstats import (
            TREND_ALPHA, trending_terms)
        from searchengine_ray.textproc import (is_significant_simple,
                                               tokenize_simple)

        split = (max(docs) + 1) // 2
        top = set(top_terms(SF, k=200)["lemma"].tolist())
        from collections import Counter
        ca, cb = Counter(), Counter()
        na = nb = 0
        for d, t in docs.items():
            toks = [w for w in tokenize_simple(t or "")
                    if is_significant_simple(w)]
            tgt, _ = (ca, 0) if d < split else (cb, 1)
            if d < split:
                na += len(toks)
            else:
                nb += len(toks)
            for w in toks:
                if w in top:
                    tgt[w] += 1
        a0 = TREND_ALPHA * len(top)
        got = trending_terms(SF).to_pandas().set_index("term")
        assert len(got) == 20
        for w in got.index:
            ya, yb = ca.get(w, 0), cb.get(w, 0)
            assert got.loc[w, "y_a"] == ya
            assert got.loc[w, "y_b"] == yb
            d = (np.log((ya + 0.5) / (na + a0 - ya - 0.5))
                 - np.log((yb + 0.5) / (nb + a0 - yb - 0.5)))
            z = d / np.sqrt(1 / (ya + 0.5) + 1 / (yb + 0.5))
            assert abs(got.loc[w, "z_r"] - z) < 1e-3

    def test_planted_drift(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.textstats import (
            trending_terms)

        # 'legacy' dominates the first half, 'shiny' the second
        texts = (["legacy system old stable " * 5] * 10
                 + ["shiny feature new launch " * 5] * 10)
        tbl = pa.table({
            "doc_id": pa.array(range(20), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 20),
            "source": pa.array(["s"] * 20),
            "n_chars": pa.array([50] * 20, type=pa.int64()),
        })
        pq.write_table(tbl, f"{tmp_path}/documents.parquet")
        got = trending_terms(str(tmp_path)).to_pandas() \
            .set_index("term")
        assert got.loc["legacy", "z_r"] > 0   # first-half term
        assert got.loc["shiny", "z_r"] < 0    # second-half term


class TestKendallTauTypes:
    def test_matches_scipy_free_reference(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            kendall_tau_types)

        DAY = 86_400_000_000
        ev = pq.read_table(
            f"{SF}/events.parquet",
            columns=["ts", "event_type", "value"]).to_pandas().dropna()
        ev = ev[ev["event_type"].isin(["click", "view"])]
        day = ev["ts"].astype("int64") // DAY * DAY
        cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        piv = pd.DataFrame({"d": day, "et": ev["event_type"],
                            "c": cents}) \
            .groupby(["d", "et"])["c"].sum().unstack(fill_value=0)
        grid = np.arange(piv.index.min(), piv.index.max() + DAY, DAY,
                         dtype=np.int64)
        piv = piv.reindex(grid, fill_value=0)
        a = piv["click"].to_numpy()
        b = piv["view"].to_numpy()
        # brute-force tau-b (scipy is not in this container)
        n = a.size
        C = D = 0
        for i in range(n):
            for j in range(i + 1, n):
                p = np.sign(a[i] - a[j]) * np.sign(b[i] - b[j])
                C += p > 0
                D += p < 0
        n0 = n * (n - 1) // 2

        def tsum(x):
            _, cc = np.unique(x, return_counts=True)
            return int((cc * (cc - 1) // 2).sum())

        exp = (C - D) / np.sqrt(float(n0 - tsum(a))
                                * float(n0 - tsum(b)))
        got = kendall_tau_types(SF).to_pandas().iloc[0]
        assert got["n_days"] == grid.size
        assert abs(got["tau_r"] - exp) < 1e-3

    def test_planted_perfect_order(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            kendall_tau_types)

        DAY = 86_400_000_000
        rows = []
        eid = 0
        for dd in range(6):
            rows.append((eid, dd * DAY, "click", float(dd + 1)))
            eid += 1
            rows.append((eid, dd * DAY, "view", float(10 * (dd + 1))))
            eid += 1
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows],
                                 type=pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([r[3] for r in rows]),
            "props": pa.array(["{}"] * len(rows)),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = kendall_tau_types(str(tmp_path)).to_pandas().iloc[0]
        assert got["tau_r"] == 1.0
        assert got["discordant"] == 0


class TestRunsTestDaily:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            runs_test_daily)

        DAY = 86_400_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "value"]).to_pandas() \
            .dropna()
        day = ev["ts"].astype("int64") // DAY * DAY
        cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        daily = pd.DataFrame({"d": day, "c": cents}) \
            .groupby("d")["c"].sum().sort_index()
        grid = np.arange(daily.index[0], daily.index[-1] + DAY, DAY,
                         dtype=np.int64)
        c = np.zeros(grid.size, dtype=np.int64)
        c[(daily.index.to_numpy() - grid[0]) // DAY] = daily.to_numpy()
        n = c.size
        med = np.sort(c)[int(np.ceil(n * 0.5)) - 1]
        sgn = np.sign(c - med)
        sgn = sgn[sgn != 0]
        n1, n2 = int((sgn > 0).sum()), int((sgn < 0).sum())
        R = int(1 + (sgn[1:] != sgn[:-1]).sum())
        got = runs_test_daily(SF).to_pandas().iloc[0]
        assert got["n_above"] == n1
        assert got["n_below"] == n2
        assert got["n_runs"] == R
        if n1 * n2:
            mu = 2 * n1 * n2 / (n1 + n2) + 1
            var = (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                   / ((n1 + n2) ** 2 * (n1 + n2 - 1)))
            assert abs(got["z_r"] - (R - mu) / np.sqrt(var)) < 1e-3

    def test_planted_alternating(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            runs_test_daily)

        DAY = 86_400_000_000
        # alternating high/low (jittered so no day ties the median
        # and drops) -> near-maximum runs, z >> 0
        n = 20
        vals = [(10.0 if i % 2 == 0 else 1.0) + i * 0.01
                for i in range(n)]
        tbl = pa.table({
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array([i * DAY for i in range(n)],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * n, type=pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(vals),
            "props": pa.array(["{}"] * n),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = runs_test_daily(str(tmp_path)).to_pandas().iloc[0]
        assert got["n_runs"] >= got["n_used"] - 2
        assert got["z_r"] > 3.0


class TestTimeWeightedValue:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            time_weighted_value)

        ev = pq.read_table(
            f"{SF}/events.parquet",
            columns=["user_id", "ts", "event_id", "value"]) \
            .to_pandas().dropna()
        ev["tu"] = ev["ts"].astype("int64")
        T = ev["tu"].max()
        got = time_weighted_value(SF).to_pandas() \
            .set_index("user_id")
        for u, g in ev.groupby("user_id"):
            g = g.sort_values(["tu", "event_id"], kind="mergesort")
            tu = g["tu"].to_numpy()
            dur = np.concatenate((np.diff(tu), [T - tu[-1]]))
            if dur.sum() == 0:
                assert u not in got.index
                continue
            twap = (g["value"].to_numpy() * dur).sum() / dur.sum()
            assert got.loc[u, "dur_us"] == dur.sum()
            assert abs(got.loc[u, "twap_r"] - twap) < 1e-3

    def test_planted_holding(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            time_weighted_value)

        S = 1_000_000
        # value 10 held 1s, value 2 held 9s (to corpus max) ->
        # twap = (10*1 + 2*9)/10 = 2.8
        tbl = pa.table({
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array([0, 1 * S], type=pa.timestamp("us")),
            "user_id": pa.array([1, 1], type=pa.int64()),
            "event_type": pa.array(["view"] * 2),
            "value": pa.array([10.0, 2.0]),
            "props": pa.array(["{}"] * 2),
        })
        # second user pins the corpus max at t=10s
        tbl2 = pa.table({
            "event_id": pa.array([3], type=pa.int64()),
            "ts": pa.array([10 * S], type=pa.timestamp("us")),
            "user_id": pa.array([2], type=pa.int64()),
            "event_type": pa.array(["view"]),
            "value": pa.array([5.0]),
            "props": pa.array(["{}"]),
        })
        pq.write_table(pa.concat_tables([tbl, tbl2]),
                       f"{tmp_path}/events.parquet")
        got = time_weighted_value(str(tmp_path)).to_pandas() \
            .set_index("user_id")
        assert abs(got.loc[1, "twap_r"] - 2.8) < 1e-9
        # user 2's single event sits AT the corpus max: zero
        # duration, dropped
        assert 2 not in got.index


class TestBitmapIndex:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import bitmap_index

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "user_id"]) \
            .to_pandas().dropna().drop_duplicates()
        got = bitmap_index(SF).to_pandas() \
            .set_index(["event_type", "bucket"])
        exp = {}
        for _, r in ev.iterrows():
            u = int(r["user_id"])
            key = (r["event_type"], u // 32)
            exp[key] = exp.get(key, 0) | (1 << (u % 32))
        assert len(got) == len(exp)
        for key, m in exp.items():
            assert got.loc[key, "mask"] == m

    def test_bitmap_answers_overlap(self, ray_session):
        from searchengine_ray.pipelines.relational import bitmap_index

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "user_id"]) \
            .to_pandas().dropna()
        got = bitmap_index(SF).to_pandas()
        piv = got.pivot(index="bucket", columns="event_type",
                        values="mask").fillna(0).astype(np.int64)
        # AND of the click/view bitmaps == exact user intersection
        inter_bits = int(sum(bin(int(a) & int(b)).count("1")
                             for a, b in zip(piv["click"],
                                             piv["view"])))
        sc = set(ev.loc[ev["event_type"] == "click", "user_id"])
        sv = set(ev.loc[ev["event_type"] == "view", "user_id"])
        assert inter_bits == len(sc & sv)


class TestWeightedJaccardTypes:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            weighted_jaccard_types)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "user_id"]) \
            .to_pandas().dropna()
        piv = ev.groupby(["user_id", "event_type"]).size() \
            .unstack(fill_value=0)
        got = weighted_jaccard_types(SF).to_pandas() \
            .set_index(["type_a", "type_b"])
        assert len(got) == 10
        for (a, b), row in got.iterrows():
            ca = piv.get(a, pd.Series(0, index=piv.index))
            cb = piv.get(b, pd.Series(0, index=piv.index))
            smin = int(np.minimum(ca, cb).sum())
            smax = int(np.maximum(ca, cb).sum())
            assert row["sum_min"] == smin
            assert row["sum_max"] == smax
            if smax:
                assert abs(row["wjacc_r"] - smin / smax) < 1e-3
        # weighted jaccard <= 1, >= 0
        assert ((got["wjacc_r"] >= 0) & (got["wjacc_r"] <= 1)).all()


class TestHist2dQtyDiscount:
    def test_matches_crosstab(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            hist2d_qty_discount)

        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_quantity", "l_discount"]) \
            .to_pandas().dropna()
        qb = np.rint(li["l_quantity"].to_numpy()).astype(np.int64)
        db = np.rint(li["l_discount"].to_numpy() * 100) \
            .astype(np.int64)
        exp = pd.DataFrame({"q": qb, "d": db}).groupby(["q", "d"]) \
            .size()
        got = hist2d_qty_discount(SF).to_pandas() \
            .set_index(["qty_bin", "disc_bin"])["n"]
        assert got.sum() == len(li)
        assert got.to_dict() == exp.to_dict()


class TestWilsonCi:
    def test_matches_closed_form(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            WILSON_Z, wilson_ci)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "event_type"]) \
            .to_pandas().dropna()
        g = ev.groupby("user_id")["event_type"].agg(
            ex=lambda s: int((s == "error").any()),
            oc=lambda s: int((s == "purchase").any()))
        got = wilson_ci(SF).to_pandas().set_index("cohort")
        z = WILSON_Z
        for name, sub in (("exposed", g[g["ex"] == 1]),
                          ("unexposed", g[g["ex"] == 0])):
            if len(sub) == 0:
                assert name not in got.index
                continue
            n, k = len(sub), int(sub["oc"].sum())
            p = k / n
            denom = 1 + z * z / n
            center = (p + z * z / (2 * n)) / denom
            half = z * np.sqrt(p * (1 - p) / n
                               + z * z / (4 * n * n)) / denom
            assert got.loc[name, "n_users"] == n
            assert got.loc[name, "n_converted"] == k
            assert abs(got.loc[name, "lo_r"] - (center - half)) < 1e-3
            assert abs(got.loc[name, "hi_r"] - (center + half)) < 1e-3
            # the interval contains the point estimate
            assert got.loc[name, "lo_r"] <= got.loc[name, "rate_r"] \
                <= got.loc[name, "hi_r"]

    def test_planted_cohorts(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import wilson_ci

        rows = []
        eid = 0
        # 50 exposed users, 40 convert; 50 unexposed, 10 convert
        for u in range(50):
            rows.append((eid, u, "error")); eid += 1
            if u < 40:
                rows.append((eid, u, "purchase")); eid += 1
        for u in range(50, 100):
            rows.append((eid, u, "view")); eid += 1
            if u < 60:
                rows.append((eid, u, "purchase")); eid += 1
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows],
                                 type=pa.int64()),
            "ts": pa.array([0] * len(rows), type=pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows],
                                type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = wilson_ci(str(tmp_path)).to_pandas() \
            .set_index("cohort")
        assert got.loc["exposed", "rate_r"] == 0.8
        assert got.loc["unexposed", "rate_r"] == 0.2
        # clearly separated intervals
        assert got.loc["exposed", "lo_r"] \
            > got.loc["unexposed", "hi_r"]


class TestChi2Residuals:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            chi2_residuals)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "event_type"]).to_pandas() \
            .dropna()
        dow = (ev["ts"].astype("int64") // 86_400_000_000 + 3) % 7
        ct = pd.crosstab(ev["event_type"], dow)
        n = ct.to_numpy().sum()
        got = chi2_residuals(SF).to_pandas() \
            .set_index(["event_type", "dow"])
        for et in ct.index:
            for d in ct.columns:
                o = ct.loc[et, d]
                if o == 0:
                    continue
                rm, cm = ct.loc[et].sum(), ct[d].sum()
                e = rm * cm / n
                den = np.sqrt(e * (1 - rm / n) * (1 - cm / n))
                assert abs(got.loc[(et, d), "resid_r"]
                           - (o - e) / den) < 1e-3
        # adjusted residuals are ~N(0,1) under independence: the
        # observed table's residuals stay in a sane range
        assert got["resid_r"].abs().max() < 50

    def test_planted_hot_cell(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            chi2_residuals)

        DAY = 86_400_000_000
        rows = []
        eid = 0
        # background: types a/b uniform over Mon/Tue; hot cell:
        # type a massively overloaded on Monday (epoch day 4 = Mon)
        for d, t, k in ((4, "a", 50), (4, "b", 10), (5, "a", 10),
                        (5, "b", 10)):
            for _ in range(k):
                rows.append((eid, d * DAY, t)); eid += 1
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows],
                                 type=pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = chi2_residuals(str(tmp_path)).to_pandas() \
            .set_index(["event_type", "dow"])
        # the (a, Monday) cell is the positive outlier
        assert got["resid_r"].idxmax() == ("a", 0)
        assert got.loc[("a", 0), "resid_r"] > 2.0


class TestEventEntropyDaily:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            event_entropy_daily)

        DAY = 86_400_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "event_type"]).to_pandas() \
            .dropna()
        day = ev["ts"].astype("int64") // DAY * DAY
        got = event_entropy_daily(SF).to_pandas() \
            .set_index("day_us")
        for d, g in ev.groupby(day):
            p = g["event_type"].value_counts(normalize=True) \
                .to_numpy()
            h = float(-(p * np.log(p)).sum())
            assert got.loc[d, "n_events"] == len(g)
            assert abs(got.loc[d, "entropy_r"] - h) < 1e-3
        # entropy bounded by ln(5) with 5 types
        assert (got["entropy_r"] <= np.log(5) + 1e-9).all()

    def test_planted_uniform_vs_point(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            event_entropy_daily)

        DAY = 86_400_000_000
        rows = []
        eid = 0
        # day 0: uniform over 4 types -> ln(4); day 1: single type -> 0
        for t in ("a", "b", "c", "d"):
            rows.append((eid, 0, t)); eid += 1
        rows.append((eid, DAY, "a")); eid += 1
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows],
                                 type=pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = event_entropy_daily(str(tmp_path)).to_pandas() \
            .set_index("day_us")
        assert abs(got.loc[0, "entropy_r"] - np.log(4)) < 1e-3
        assert got.loc[DAY, "entropy_r"] == 0.0


class TestValueCcdf:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            CCDF_DECADES, value_ccdf)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["value"]).to_pandas().dropna()
        cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        got = value_ccdf(SF).to_pandas() \
            .set_index("threshold_cents")
        for t in CCDF_DECADES:
            ne = int((cents > t).sum())
            assert got.loc[t, "n_exceed"] == ne
            assert abs(got.loc[t, "frac_r"] - ne / cents.size) < 1e-3
        # CCDF is non-increasing in the threshold
        assert (np.diff(got["n_exceed"].to_numpy()) <= 0).all()


class TestJarqueBeraDaily:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            jarque_bera_daily)

        DAY = 86_400_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "value"]).to_pandas() \
            .dropna()
        day = ev["ts"].astype("int64") // DAY * DAY
        cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        daily = pd.DataFrame({"d": day, "c": cents}) \
            .groupby("d")["c"].sum().sort_index()
        grid = np.arange(daily.index[0], daily.index[-1] + DAY, DAY,
                         dtype=np.int64)
        c = np.zeros(grid.size, dtype=np.int64)
        c[(daily.index.to_numpy() - grid[0]) // DAY] = daily.to_numpy()
        x = c / 100.0
        n = x.size
        mu = x.mean()
        m2 = ((x - mu) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        g1, g2 = m3 / m2 ** 1.5, m4 / m2 ** 2
        jb = n / 6 * (g1 ** 2 + (g2 - 3) ** 2 / 4)
        got = jarque_bera_daily(SF).to_pandas().iloc[0]
        assert got["n_days"] == n
        assert abs(got["skew_r"] - g1) < 1e-3
        assert abs(got["kurt_r"] - g2) < 1e-3
        assert abs(got["jb_r"] - jb) < max(1e-2, 1e-3 * jb)

    def test_planted_symmetric(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            jarque_bera_daily)

        DAY = 86_400_000_000
        # symmetric two-point series: skew exactly 0, kurtosis 1
        vals = [1.0, 3.0] * 6
        tbl = pa.table({
            "event_id": pa.array(range(12), type=pa.int64()),
            "ts": pa.array([i * DAY for i in range(12)],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * 12, type=pa.int64()),
            "event_type": pa.array(["view"] * 12),
            "value": pa.array(vals),
            "props": pa.array(["{}"] * 12),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = jarque_bera_daily(str(tmp_path)).to_pandas().iloc[0]
        assert abs(got["skew_r"]) < 1e-9
        assert abs(got["kurt_r"] - 1.0) < 1e-9


class TestAcfDaily:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import acf_daily

        DAY = 86_400_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "value"]).to_pandas() \
            .dropna()
        day = ev["ts"].astype("int64") // DAY * DAY
        cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        daily = pd.DataFrame({"d": day, "c": cents}) \
            .groupby("d")["c"].sum().sort_index()
        grid = np.arange(daily.index[0], daily.index[-1] + DAY, DAY,
                         dtype=np.int64)
        c = np.zeros(grid.size, dtype=np.int64)
        c[(daily.index.to_numpy() - grid[0]) // DAY] = daily.to_numpy()
        x = c / 100.0
        mu = x.mean()
        d0 = ((x - mu) ** 2).sum()
        got = acf_daily(SF).to_pandas().set_index("lag")
        for k in got.index:
            exp = ((x[k:] - mu) * (x[:-k] - mu)).sum() / d0
            assert abs(got.loc[k, "acf_r"] - exp) < 1e-3
        assert (got["acf_r"].abs() <= 1.0 + 1e-9).all()

    def test_planted_period_two(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import acf_daily

        DAY = 86_400_000_000
        n = 20
        vals = [10.0 if i % 2 == 0 else 1.0 for i in range(n)]
        tbl = pa.table({
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array([i * DAY for i in range(n)],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * n, type=pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(vals),
            "props": pa.array(["{}"] * n),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = acf_daily(str(tmp_path)).to_pandas().set_index("lag")
        # period-2 signal: strongly negative at lag 1, positive at 2
        assert got.loc[1, "acf_r"] < -0.8
        assert got.loc[2, "acf_r"] > 0.8


class TestLjungBoxDaily:
    def test_consistent_with_acf(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            acf_daily, ljung_box_daily)

        acf = acf_daily(SF).to_pandas()
        lb = ljung_box_daily(SF).to_pandas().iloc[0]
        n = lb["n_days"]
        q = n * (n + 2) * sum(
            r * r / (n - k)
            for k, r in zip(acf["lag"], acf["acf_r"]))
        # acf_r is rounded, so allow a loose but meaningful band
        assert abs(lb["q_r"] - q) < max(0.05 * abs(q), 0.5)
        assert lb["n_lags"] == len(acf)

    def test_planted_structure_vs_flatline(self, ray_session,
                                           tmp_path):
        from searchengine_ray.pipelines.relational import (
            ljung_box_daily)

        DAY = 86_400_000_000
        n = 28
        vals = [10.0 if i % 2 == 0 else 1.0 for i in range(n)]
        tbl = pa.table({
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array([i * DAY for i in range(n)],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * n, type=pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(vals),
            "props": pa.array(["{}"] * n),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = ljung_box_daily(str(tmp_path)).to_pandas().iloc[0]
        # alternating series has massive serial structure:
        # Q far beyond any chi2(10) quantile
        assert got["q_r"] > 100.0


class TestDispersionIndex:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            dispersion_index)

        DAY = 86_400_000_000
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts"]).to_pandas().dropna()
        day = ev["ts"].astype("int64") // DAY * DAY
        daily = day.value_counts().sort_index()
        grid = np.arange(daily.index[0], daily.index[-1] + DAY, DAY,
                         dtype=np.int64)
        cnt = np.zeros(grid.size, dtype=np.int64)
        cnt[(daily.index.to_numpy() - grid[0]) // DAY] = \
            daily.to_numpy()
        m = cnt.mean()
        var = cnt.var()
        got = dispersion_index(SF).to_pandas().iloc[0]
        assert got["n_days"] == cnt.size
        assert abs(got["mean_r"] - m) < 1e-3
        assert abs(got["var_r"] - var) < max(1e-3, 1e-4 * var)
        assert abs(got["vmr_r"] - var / m) < 1e-2

    def test_planted_constant_underdispersed(self, ray_session,
                                             tmp_path):
        from searchengine_ray.pipelines.relational import (
            dispersion_index)

        DAY = 86_400_000_000
        # exactly 3 events every day -> variance 0, VMR 0
        rows = []
        eid = 0
        for d in range(10):
            for _ in range(3):
                rows.append((eid, d * DAY)); eid += 1
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows],
                                 type=pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), type=pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = dispersion_index(str(tmp_path)).to_pandas().iloc[0]
        assert got["mean_r"] == 3.0
        assert got["var_r"] == 0.0
        assert got["vmr_r"] == 0.0


class TestPriorityPsi:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import priority_psi

        o = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_orderdate", "o_orderpriority"]) \
            .to_pandas().dropna()
        t = o["o_orderdate"].astype("int64")
        split = (t.min() + t.max()) // 2
        ga = o[t < split]["o_orderpriority"].value_counts()
        gb = o[t >= split]["o_orderpriority"].value_counts()
        cats = sorted(set(ga.index) | set(gb.index))
        na = np.array([ga.get(c, 0) for c in cats], dtype=float)
        nb = np.array([gb.get(c, 0) for c in cats], dtype=float)
        k = len(cats)
        pa_ = (na + 0.5) / (na.sum() + 0.5 * k)
        pb_ = (nb + 0.5) / (nb.sum() + 0.5 * k)
        exp = (pa_ - pb_) * np.log(pa_ / pb_)
        got = priority_psi(SF).to_pandas() \
            .set_index("o_orderpriority")
        assert sorted(got.index) == cats
        for i, c in enumerate(cats):
            assert got.loc[c, "n_a"] == na[i]
            assert got.loc[c, "n_b"] == nb[i]
            assert abs(got.loc[c, "contrib_r"] - exp[i]) < 1e-3
        # every PSI contribution is non-negative by construction
        assert (got["contrib_r"] >= -1e-9).all()

    def test_planted_stable_mix_near_zero(self, ray_session,
                                          tmp_path):
        from searchengine_ray.pipelines.relational import priority_psi

        DAY = 86_400_000_000
        # identical mix in both halves -> PSI ~ 0
        rows = []
        ok = 0
        for half_start in (0, 100 * DAY):
            for p, cnt in (("1-URGENT", 30), ("5-LOW", 70)):
                for i in range(cnt):
                    rows.append((ok, half_start + i * 60_000_000, p))
                    ok += 1
        tbl = pa.table({
            "o_orderkey": pa.array([r[0] for r in rows],
                                   type=pa.int64()),
            "o_custkey": pa.array([1] * len(rows), type=pa.int64()),
            "o_orderstatus": pa.array(["F"] * len(rows)),
            "o_totalprice": pa.array([1.0] * len(rows)),
            "o_orderdate": pa.array([r[1] for r in rows],
                                    type=pa.timestamp("us")),
            "o_orderpriority": pa.array([r[2] for r in rows]),
        })
        pq.write_table(tbl, f"{tmp_path}/orders.parquet")
        got = priority_psi(str(tmp_path)).to_pandas()
        assert got["contrib_r"].abs().sum() < 1e-3


class TestFirstTouchDist:
    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.relational import (
            first_touch_dist)

        ev = pq.read_table(
            f"{SF}/events.parquet",
            columns=["user_id", "event_type", "ts", "event_id"]) \
            .to_pandas().dropna()
        ev["tu"] = ev["ts"].astype("int64")
        first = ev.sort_values(["user_id", "tu", "event_id"],
                               kind="mergesort") \
            .drop_duplicates(subset=["user_id"], keep="first")
        exp = first["event_type"].value_counts()
        got = first_touch_dist(SF).to_pandas() \
            .set_index("event_type")
        assert got["n_users"].sum() == first["user_id"].nunique()
        for t in exp.index:
            assert got.loc[t, "n_users"] == exp[t]
        assert abs(got["share_r"].sum() - 1.0) < 5e-3

    def test_planted_first_event(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.relational import (
            first_touch_dist)

        S = 1_000_000
        # user 1 starts with a view; user 2's first (by event_id
        # tie-break at equal ts) is a signup
        tbl = pa.table({
            "event_id": pa.array([2, 1, 5, 4], type=pa.int64()),
            "ts": pa.array([2 * S, 1 * S, 3 * S, 3 * S],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1, 1, 2, 2], type=pa.int64()),
            "event_type": pa.array(["purchase", "view", "click",
                                    "signup"]),
            "value": pa.array([1.0] * 4),
            "props": pa.array(["{}"] * 4),
        })
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        got = first_touch_dist(str(tmp_path)).to_pandas() \
            .set_index("event_type")
        assert got.loc["view", "n_users"] == 1
        assert got.loc["signup", "n_users"] == 1
        assert "purchase" not in got.index


class TestTranscriptSnippets:
    """M8 snippet surface (SearchServiceImpl.java:218-267 semantics) over
    the planted per-class layouts — the hash-window entry added in r5."""

    def test_planted_classes(self, ray_session):
        from searchengine_ray.pipelines.transcripts import transcript_snippets

        got = transcript_snippets(SF)
        assert list(got.columns) == ["query_id", "conv_id", "turn_idx",
                                     "snippet"]
        # every doc of class 1-4 emits one row per query; class 0 none
        import pyarrow.parquet as _pq

        ids = _pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id"])["doc_id"].to_pylist()
        n_hit = sum(1 for i in ids if i % 5 != 0)
        assert len(got) == 2 * n_hit

        by = {(r.query_id, r.conv_id, r.turn_idx): r.snippet
              for r in got.itertuples()}
        # pick one doc per class and check the exact reference semantics
        def doc(cls):
            did = next(i for i in ids if i % 5 == cls)
            return did, f"conv-{did // 8:06d}", did % 8

        did, cid, t = doc(1)  # single ±5 window, hit bolded
        assert by[("q_single", cid, t)] == (
            "..." + " ".join(
                [f"w{did}x{p}" for p in range(1, 6)] + ["<b>needle</b>"]
                + [f"w{did}x{p}" for p in range(7, 12)]) + "...")

        did, cid, t = doc(2)  # merge rule: q_multi extends, q_single not
        s1 = by[("q_single", cid, t)]
        s2 = by[("q_multi", cid, t)]
        assert "thread" in s1 and "<b>thread</b>" not in s1
        assert "<b>thread</b>" in s2
        assert " ... " not in s2  # extended into ONE fragment
        assert s1.count("<b>") == 1 and s2.count("<b>") == 2
        assert s2.endswith(f"w{did}x15...")  # hi extended to 10+5+1

        _, cid, t = doc(3)  # two disjoint fragments
        assert by[("q_single", cid, t)].count(" ... ") == 1

        _, cid, t = doc(4)  # 3-window cap: 4 hits, only 3 bolded
        s4 = by[("q_single", cid, t)]
        assert s4.count(" ... ") == 2
        assert s4.count("<b>needle</b>") == 3

    def test_class0_docs_emit_nothing(self, ray_session):
        from searchengine_ray.pipelines.transcripts import transcript_snippets

        got = transcript_snippets(SF)
        convs_turns = set(zip(got["conv_id"], got["turn_idx"]))
        import pyarrow.parquet as _pq

        ids = _pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id"])["doc_id"].to_pylist()
        for i in ids:
            key = (f"conv-{i // 8:06d}", i % 8)
            assert (key in convs_turns) == (i % 5 != 0)


class TestTranscriptBlockmax:
    """A6 block-max surface: the stored per-block skip metadata read back
    from the on-disk audit index (block_size=8)."""

    def test_metadata_matches_decoded_postings(self, ray_session):
        from searchengine_ray.pipelines.transcripts import (
            BLOCKMAX_BLOCK_SIZE,
            TRANSCRIPT_CFG,
            ensure_transcript_index,
            transcript_blockmax,
        )
        from searchengine_ray.index_store import IndexReader

        got = transcript_blockmax(SF)
        assert (got["n_postings"] <= BLOCKMAX_BLOCK_SIZE).all()
        assert (got["n_postings"] >= 1).all()
        # the small block size must actually produce multi-block lists
        assert (got["block_ord"] > 0).any()

        # per-list invariants: last_docid strictly increasing over blocks
        for _, sub in got.groupby(["lemma", "site", "shard", "seg"]):
            ld = sub.sort_values("block_ord")["last_docid"].to_numpy()
            assert (np.diff(ld) > 0).all()

        # cross-check the metadata against fully decoded postings for a
        # sample of real lemmas (the codec's own ground truth)
        idx = ensure_transcript_index(
            SF, variant="blockmax8",
            config=TRANSCRIPT_CFG.replace(block_size=BLOCKMAX_BLOCK_SIZE))
        reader = IndexReader(idx)
        sample = got["lemma"].drop_duplicates().head(5).tolist()
        for lemma in sample:
            docids, tfs = reader.decode_lemma(lemma)
            sub = got[got["lemma"] == lemma]
            # block metadata totals the full posting list
            assert int(sub["n_postings"].sum()) == docids.size
            assert int(sub["last_docid"].max()) == int(docids.max())
            assert int(sub["max_tf"].max()) == int(tfs.max())


class TestTranscriptBuildManifest:
    def test_lineage_surface(self, ray_session):
        from searchengine_ray.pipelines.transcripts import (
            transcript_build_manifest,
        )

        got = transcript_build_manifest(SF)
        scopes = got["scope"].tolist()
        assert "total" in scopes
        shard_rows = got[got["scope"].str.startswith("shard=")]
        assert len(shard_rows) == 2
        assert (shard_rows["status"] == "complete").all()
        total = got[got["scope"] == "total"].iloc[0]
        # shard input lineage partitions the corpus exactly
        assert int(shard_rows["n_docs"].sum()) == int(total["n_docs"])
        site_rows = got[got["scope"].str.startswith("site:")]
        assert len(site_rows) == 4
        assert int(site_rows["n_docs"].sum()) == int(total["n_docs"])
        assert int(site_rows["total_len"].sum()) == int(total["total_len"])


class TestTranscriptResumeBuild:
    def test_stop_then_resume_reuses_checkpoint(self, ray_session, tmp_path):
        """The stopped pass persists shard 0; the resume builds ONLY shard 1
        — shard 0's checkpoint manifest is byte-identical after resume."""
        import os

        from searchengine_ray.build import build_index
        from searchengine_ray.corpus import write_transcripts
        from searchengine_ray.pipelines.transcripts import TRANSCRIPT_CFG

        corpus = str(tmp_path / "corpus")
        idx = str(tmp_path / "index")
        write_transcripts(corpus, n_convs=30, n_files=4)
        cfg = TRANSCRIPT_CFG.replace(build_concurrency=1,
                                     site_column=None, analyzer="ru")
        calls = {"n": 0}

        def stop_late():
            calls["n"] += 1
            return calls["n"] >= 3

        first = build_index(corpus, idx, cfg, stop_check=stop_late)
        assert first["stopped"] and len(first["shards"]) == 1
        m0 = open(f"{idx}/shards/shard=00000/_MANIFEST.json").read()
        assert not os.path.exists(f"{idx}/manifest.json")  # no finalize

        second = build_index(corpus, idx, cfg)
        assert len(second["shards"]) == 2
        # shard 0 was REUSED, not rebuilt: checkpoint bytes unchanged
        assert open(f"{idx}/shards/shard=00000/_MANIFEST.json").read() == m0
        # resumed index equals an uninterrupted build of the same corpus
        idx2 = str(tmp_path / "index2")
        clean = build_index(corpus, idx2, cfg)
        assert (second["n_docs"], second["total_len"], second["n_lemmas"]) \
            == (clean["n_docs"], clean["total_len"], clean["n_lemmas"])

    def test_resume_entry_shape(self, ray_session):
        from searchengine_ray.pipelines.transcripts import (
            transcript_resume_build,
        )

        got = transcript_resume_build(SF)
        r = got[got["scope"] == "resume"].iloc[0]
        assert r["status"] == "stopped_then_resumed"
        assert (int(r["n_docs"]), int(r["total_len"])) == (1, 1)
        assert (got[got["scope"].str.startswith("shard=")]["status"]
                == "complete").all()


class TestTranscriptSearchParity:
    def test_parity_scores_are_max_normalized(self, ray_session):
        from searchengine_ray.pipelines.transcripts import (
            transcript_search,
            transcript_search_parity,
        )

        par = transcript_search_parity(SF)
        bm = transcript_search(SF)
        assert list(par.columns) == list(bm.columns)
        # relative relevance: (0, 1], and every query's top hit scores 1.0
        assert (par["score_r"] > 0).all() and (par["score_r"] <= 1.0).all()
        tops = par[par["rank"] == 0]
        assert (tops["score_r"] == 1.0).all()
        # same AND-gate: each query matches the same doc SET as BM25
        for qid in par["query_id"].unique():
            p = set(zip(par[par.query_id == qid]["conv_id"],
                        par[par.query_id == qid]["turn_idx"]))
            b = set(zip(bm[bm.query_id == qid]["conv_id"],
                        bm[bm.query_id == qid]["turn_idx"]))
            # top-10 cut can differ in membership only if > 10 matches;
            # counts (pre-cut totals) must agree exactly
            assert (par[par.query_id == qid]["count"].iloc[0]
                    == bm[bm.query_id == qid]["count"].iloc[0])
            if par[par.query_id == qid]["count"].iloc[0] <= 10:
                assert p == b


class TestTranscriptPostingBytes:
    def test_blob_sizes_match_recount(self, ray_session):
        """The stored blob lengths equal a from-scratch re-encode of the
        decoded postings (the codec's own ground truth)."""
        from searchengine_ray.codec import vb_encode
        from searchengine_ray.index_store import IndexReader
        from searchengine_ray.pipelines.transcripts import (
            ensure_transcript_index,
            transcript_posting_bytes,
        )

        got = transcript_posting_bytes(SF)
        assert (got["doc_bytes"] >= got["df"]).all()  # ≥1 byte per posting
        assert (got["tf_bytes"] >= got["df"]).all()
        reader = IndexReader(ensure_transcript_index(SF))
        sample = got["lemma"].drop_duplicates().head(4).tolist()
        for lemma in sample:
            sub = got[got["lemma"] == lemma]
            docids, tfs = reader.decode_lemma(lemma)
            gaps = np.empty(docids.size, dtype=np.uint64)
            gaps[0] = np.uint64(docids[0] + 1)
            np.subtract(docids[1:], docids[:-1], out=gaps[1:],
                        casting="unsafe")
            # global streams concatenate the per-(site, shard, seg) blobs;
            # re-splitting by segment is the oracle's job — here totals
            # suffice because each segment's gaps re-derive per segment
            assert int(sub["df"].sum()) == docids.size
            assert int(sub["tf_bytes"].sum()) == len(
                vb_encode(tfs.astype(np.uint64)))


class TestConversationWindows:
    def test_windows_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.transcripts import (
            WINDOW_STRIDE,
            WINDOW_TURNS,
            conversation_windows,
        )

        got = conversation_windows(SF).to_pandas().sort_values(
            ["conv_id", "window_id"]).reset_index(drop=True)
        # brute force over the derived corpus
        import pyarrow.parquet as _pq

        docs = _pq.read_table(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"]).to_pandas()
        docs["conv"] = docs["doc_id"] // 8
        docs["turn"] = docs["doc_id"] % 8
        rows = []
        for conv, sub in docs.groupby("conv"):
            sub = sub.sort_values("turn")
            turns = sub["turn"].tolist()
            chars = sub["text"].str.len().tolist()
            n = len(turns)
            for w, start in enumerate(range(0, n, WINDOW_STRIDE)):
                end = min(start + WINDOW_TURNS, n)
                rows.append((f"conv-{conv:06d}", w, turns[start],
                             turns[end - 1], end - start,
                             sum(chars[start:end])))
        exp = pd.DataFrame(rows, columns=["conv_id", "window_id",
                                          "start_turn", "end_turn",
                                          "n_turns", "n_chars"])
        exp = exp.sort_values(["conv_id", "window_id"]).reset_index(drop=True)
        assert got["conv_id"].tolist() == exp["conv_id"].tolist()
        for c in ("window_id", "start_turn", "end_turn", "n_turns",
                  "n_chars"):
            assert got[c].astype("int64").tolist() == exp[c].tolist(), c

    def test_overlap_and_tail(self, ray_session):
        from searchengine_ray.pipelines.transcripts import (
            conversation_windows,
        )

        got = conversation_windows(SF).to_pandas()
        full = got[got["conv_id"] == "conv-000000"].sort_values("window_id")
        # 8 turns, window 4, stride 2 → 4 windows, last one partial (2)
        assert full["n_turns"].tolist() == [4, 4, 4, 2]
        assert full["start_turn"].tolist() == [0, 2, 4, 6]


class TestDialogueLint:
    def test_lint_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.transcripts import dialogue_lint

        got = dialogue_lint(SF).to_pandas().sort_values(
            "conv_id").reset_index(drop=True)
        import pyarrow.parquet as _pq

        docs = _pq.read_table(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"]).to_pandas()
        docs["conv"] = docs["doc_id"] // 8
        docs["role_idx"] = docs["doc_id"] % 4
        docs["chars"] = docs["text"].str.len()
        for conv, sub in docs.groupby("conv"):
            row = got[got["conv_id"] == f"conv-{conv:06d}"].iloc[0]
            assert int(row["n_turns"]) == len(sub)
            assert int(row["longest_turn_chars"]) == int(sub["chars"].max())
            assert int(row["n_empty_turns"]) == int(
                (sub["text"].str.strip() == "").sum())
            total = int(sub["chars"].sum())
            asst = int(sub.loc[sub["role_idx"] == 1, "chars"].sum())
            assert abs(float(row["assistant_char_share_r"])
                       - round(asst / total, 4)) < 1e-9


class TestToolCallStats:
    def test_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.transcripts import (
            _PLANT_TOOLS,
            tool_call_stats,
        )

        got = tool_call_stats(SF).to_pandas().sort_values(
            "conv_id").reset_index(drop=True)
        import collections

        import pyarrow.parquet as _pq

        ids = _pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id"])["doc_id"].to_pylist()
        per_conv = collections.defaultdict(list)
        for did in ids:
            if did % 4 == 2:
                per_conv[did // 8].append((did % 8, _PLANT_TOOLS[did % 3]))
        assert len(got) == len(per_conv)
        for conv, calls in per_conv.items():
            row = got[got["conv_id"] == f"conv-{conv:06d}"].iloc[0]
            assert int(row["n_tool_calls"]) == len(calls)
            tools = [t for _, t in calls]
            assert int(row["n_distinct_tools"]) == len(set(tools))
            cnt = collections.Counter(tools)
            best = min(cnt, key=lambda t: (-cnt[t], t))
            assert row["top_tool"] == best
            assert int(row["first_tool_turn"]) == min(t for t, _ in calls)


class TestImageCodec:
    def test_netpbm_roundtrip_and_errors(self):
        from searchengine_ray.imagecodec import decode_netpbm, encode_netpbm

        rgb = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
        assert np.array_equal(decode_netpbm(encode_netpbm(rgb)), rgb)
        gray = np.arange(20, dtype=np.uint8).reshape(4, 5)
        assert np.array_equal(decode_netpbm(encode_netpbm(gray)), gray)
        # comments and extra whitespace in the header are legal netpbm
        with_comment = b"P6 # trailing\n# full-line comment\n 5\t4\n255\n" \
            + rgb.tobytes()
        assert np.array_equal(decode_netpbm(with_comment), rgb)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            decode_netpbm(b"\x89PNG....")
        with _pytest.raises(ValueError):
            decode_netpbm(encode_netpbm(rgb)[:-1])  # truncated raster

    def test_decode_image_routes(self):
        from searchengine_ray.imagecodec import encode_netpbm
        from searchengine_ray.pipelines.multimodal import decode_image

        rgb = np.zeros((2, 2, 3), dtype=np.uint8)
        assert decode_image(encode_netpbm(rgb)).shape == (2, 2, 3)
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xff\xe0jpeg...")

    def test_pixel_stats_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.multimodal import image_pixel_stats

        got = image_pixel_stats(SF).to_pandas().sort_values(
            "media_id").reset_index(drop=True)
        for _, row in got.head(20).iterrows():
            d = int(row["media_id"])
            w, h = 4 + d % 5, 3 + d % 4
            assert (int(row["width"]), int(row["height"])) == (w, h)
            flat = (d * 7 + np.arange(w * h * 3)) % 256
            exp = flat.reshape(-1, 3).mean(axis=0)
            for c, col in enumerate(("mean_r_r", "mean_g_r", "mean_b_r")):
                assert abs(float(row[col]) - round(exp[c], 4)) < 1e-9


class TestAudioCodec:
    def test_wav_roundtrip_and_errors(self):
        from searchengine_ray.audiocodec import decode_wav, encode_wav

        mono = (np.arange(100, dtype=np.int64) * 99 % 2048 - 1024).astype(
            np.int16)
        out, rate = decode_wav(encode_wav(mono, sample_rate=16000))
        assert rate == 16000
        assert np.array_equal(out[:, 0], mono)
        stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
        out2, _ = decode_wav(encode_wav(stereo))
        assert np.array_equal(out2, stereo)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            decode_wav(b"OggS....not riff")
        with _pytest.raises(ValueError):
            decode_wav(encode_wav(mono)[:-1])  # truncated data chunk

    def test_decode_audio_routes(self):
        from searchengine_ray.audiocodec import encode_wav
        from searchengine_ray.pipelines.multimodal import decode_audio

        s = np.zeros(8, dtype=np.int16)
        assert decode_audio(encode_wav(s)).shape == (8, 1)
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            decode_audio(b"\xff\xfb\x90mp3frame")

    def test_clip_stats_bruteforce(self, ray_session):
        from searchengine_ray.pipelines.multimodal import audio_clip_stats

        got = audio_clip_stats(SF).to_pandas().sort_values(
            "media_id").reset_index(drop=True)
        for _, row in got.head(20).iterrows():
            d = int(row["media_id"])
            n = 64 + d % 37
            a = np.abs(((d * 31 + np.arange(n) * 7) % 2048) - 1024)
            assert int(row["n_samples"]) == n
            assert int(row["peak"]) == int(a.max())
            assert abs(float(row["mean_abs_r"]) - round(a.mean(), 4)) < 1e-9


class TestCorruptCheckpointResume:
    def test_corrupt_shard_manifest_rebuilds_not_crashes(self, ray_session,
                                                         tmp_path):
        """A half-written shard checkpoint (crash mid-write, disk full)
        must read as 'shard incomplete' → that shard rebuilds and the
        resumed index equals the clean build — never a JSONDecodeError
        that kills the whole resume."""
        from searchengine_ray.build import build_index
        from searchengine_ray.config import EngineConfig
        from searchengine_ray.corpus import write_transcripts

        corpus = str(tmp_path / "corpus")
        idx = str(tmp_path / "index")
        write_transcripts(corpus, n_convs=30, n_files=4)
        cfg = EngineConfig(num_shards=2, lemmatizer_concurrency=(1, 2))
        m1 = build_index(corpus, idx, cfg)

        p = f"{idx}/shards/shard=00000/_MANIFEST.json"
        data = open(p).read()
        open(p, "w").write(data[: len(data) // 2])  # truncated JSON

        m2 = build_index(corpus, idx, cfg)
        assert (m2["n_docs"], m2["total_len"], m2["n_lemmas"]) \
            == (m1["n_docs"], m1["total_len"], m1["n_lemmas"])
        # the rebuilt checkpoint is whole again
        import json as _json

        assert _json.load(open(p))["status"] == "complete"
