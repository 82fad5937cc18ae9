"""Training-data preparation operators (traindata.py) vs brute-force
references at sf0.001: deterministic split, sequence packing prefix sums,
PII scrubbing."""

import hashlib
import re

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


class TestSampleSplit:
    def test_matches_per_id_rule_and_is_key_stable(self, ray_session, docs):
        from searchengine_ray.pipelines.traindata import _SPLIT_OF_HEX, sample_split

        out = sample_split(SF).to_pandas()
        assert len(out) == len(docs)
        got = dict(zip(out["doc_id"], out["split"]))
        for did in docs:
            want = _SPLIT_OF_HEX[hashlib.md5(str(did).encode()).hexdigest()[0]]
            assert got[did] == want
        # fractions roughly match the 14/1/1 hex-bucket design
        frac = out["split"].value_counts(normalize=True)
        assert frac.get("train", 0) > 0.8
        assert 0 < frac.get("val", 0) < 0.15
        assert 0 < frac.get("test", 0) < 0.15


class TestPackSequences:
    def test_offsets_are_exact_prefix_sums(self, ray_session, docs):
        from searchengine_ray.pipelines.traindata import pack_sequences

        out = (
            pack_sequences(SF, seq_len=512)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(out) == len(docs)
        tok_re = re.compile(r"[a-z0-9]+")
        ids = sorted(docs)
        n = np.array([len(tok_re.findall((docs[d] or "").lower())) for d in ids])
        want_start = np.concatenate(([0], np.cumsum(n)[:-1]))
        assert (out["doc_id"].to_numpy() == np.array(ids)).all()
        assert (out["n_tokens"].to_numpy() == n).all()
        assert (out["tok_start"].to_numpy() == want_start).all()
        assert (out["seq_id"].to_numpy() == want_start // 512).all()

    def test_seq_ids_are_dense_and_monotone(self, ray_session):
        from searchengine_ray.pipelines.traindata import pack_sequences

        out = pack_sequences(SF, seq_len=128).to_pandas().sort_values("doc_id")
        seq = out["seq_id"].to_numpy()
        assert (np.diff(seq) >= 0).all()
        # every sequence between first and last receives at least one doc
        # start OR is covered by a long doc spanning it; the packing bins
        # derived from a cumsum can never skip backwards
        assert seq[0] == 0


class TestPiiScrub:
    def test_planted_rows_are_scrubbed(self, ray_session, docs):
        from searchengine_ray.pipelines.traindata import (
            PII_PLANT_EVERY,
            PII_PLANT_OFFSET,
            pii_scrub,
        )

        out = pii_scrub(SF, plant=True).to_pandas()
        planted = out[out["doc_id"] >= PII_PLANT_OFFSET]
        n_expected = sum(1 for d in docs if d % PII_PLANT_EVERY == 0)
        assert len(planted) == n_expected > 0
        assert (planted["n_email"] == 1).all()
        assert (planted["n_phone"] == 1).all()
        assert (planted["n_id"] == 1).all()
        for t in planted["text_clean"]:
            assert "<EMAIL>" in t and "<PHONE>" in t and "<ID>" in t
            assert "@" not in t
            assert "555-123-4567" not in t

    def test_clean_corpus_untouched(self, ray_session, docs):
        from searchengine_ray.pipelines.traindata import pii_scrub

        out = pii_scrub(SF).to_pandas()
        assert (out["n_email"] == 0).all()
        assert (out["n_phone"] == 0).all()
        assert (out["n_id"] == 0).all()
        got = dict(zip(out["doc_id"], out["text_clean"]))
        for did, text in docs.items():
            assert got[did] == (text or "")


class TestPackSequencesMultiFile:
    def test_order_independent_across_files(self, ray_session, tmp_path, docs):
        """The distributed prefix sum must produce doc_id-order offsets no
        matter how rows are split across files/blocks: write the corpus as
        4 files in REVERSED doc_id order and compare against the
        single-file result."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.traindata import pack_sequences

        ids = sorted(docs, reverse=True)
        per = (len(ids) + 3) // 4
        for i in range(4):
            chunk = ids[i * per : (i + 1) * per]
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(chunk, type=pa.int64()),
                        "text": pa.array([docs[d] for d in chunk], type=pa.string()),
                    }
                ),
                str(tmp_path / f"part{i}.parquet"),
            )
        import os
        import shutil

        # pack_sequences reads <dir>/documents.parquet; point it at a dir
        # where that path is itself a directory of 4 files
        root = tmp_path / "sf"
        os.makedirs(root / "documents.parquet")
        for i in range(4):
            shutil.move(
                str(tmp_path / f"part{i}.parquet"),
                str(root / "documents.parquet" / f"part{i}.parquet"),
            )
        multi = (
            pack_sequences(str(root))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        single = (
            pack_sequences(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert (multi.values == single.values).all()


class TestStratifiedSample:
    def test_key_stable_per_stratum_topk(self, ray_session):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.traindata import stratified_sample

        out = stratified_sample(SF, k=20).to_pandas()
        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
        t["u"] = [hashlib.md5(str(int(i)).encode()).hexdigest() for i in t["doc_id"]]
        for lang, grp in t.groupby("lang"):
            want = grp.sort_values(["u", "doc_id"]).head(20)["doc_id"].tolist()
            sub = out[out["lang"] == lang].sort_values("rank")
            assert sub["doc_id"].tolist() == want, lang
        # KEY STABILITY: the sample of a stratum restricted to a sub-corpus
        # is a prefix-superset relationship — membership never reshuffles
        half = t[t["doc_id"] < t["doc_id"].median()]
        for lang, grp in half.groupby("lang"):
            sub_sample = grp.sort_values(["u", "doc_id"]).head(20)["doc_id"]
            full_sample = set(out[out["lang"] == lang]["doc_id"])
            kept = [d for d in sub_sample if d in full_sample]
            # every kept doc appears in the same relative order in both
            full_order = out[out["lang"] == lang].sort_values("rank")["doc_id"].tolist()
            assert kept == [d for d in full_order if d in set(sub_sample)]


class TestExportShards:
    def test_roundtrip_and_summary(self, ray_session, docs, tmp_path):
        """Exported shard dirs union back to exactly the input documents;
        the summary matches a brute-force recount; assignment is key-stable
        (first md5 byte mod n_shards)."""
        import os

        from searchengine_ray.pipelines.traindata import export_shards

        out_root = str(tmp_path / "export")
        summary = export_shards(SF, n_shards=8, out_root=out_root).to_pandas()
        want = {}
        for did, text in docs.items():
            k = hashlib.md5(b"%d" % did).digest()[0] % 8
            n, c = want.get(k, (0, 0))
            want[k] = (n + 1, c + len(text or ""))
        assert len(summary) == len(want)
        for _, row in summary.iterrows():
            assert (row["n_docs"], row["n_chars"]) == want[row["shard"]]

        got = {}
        for d in sorted(os.listdir(out_root)):
            assert d.startswith("shard=") and not d.endswith(".tmp")
            t = pq.read_table(os.path.join(out_root, d))
            k = int(d.split("=")[1])
            for r in t.to_pylist():
                assert hashlib.md5(b"%d" % r["doc_id"]).digest()[0] % 8 == k
                got[r["doc_id"]] = r["text"]
        assert got == docs

    def test_rerun_is_idempotent(self, ray_session, tmp_path):
        from searchengine_ray.pipelines.traindata import export_shards

        out_root = str(tmp_path / "export2")
        a = export_shards(SF, n_shards=8, out_root=out_root).to_pandas()
        b = export_shards(SF, n_shards=8, out_root=out_root).to_pandas()
        cols = ["shard", "n_docs", "n_chars"]
        pa_ = a[cols].sort_values("shard").reset_index(drop=True)
        pb_ = b[cols].sort_values("shard").reset_index(drop=True)
        assert pa_.equals(pb_)


class TestQualityFilter:
    def test_matches_bruteforce_quantile(self, ray_session):
        from searchengine_ray.pipelines.textstats import quality_filter, quality_score

        scored = quality_score(SF).to_pandas()[["doc_id", "quality_r", "n_tokens"]]
        v = np.sort(scored["quality_r"].to_numpy())
        thr = v[max(int(np.ceil(v.size * 0.75)), 1) - 1]  # quantile_disc
        want = scored[scored["quality_r"] >= thr].sort_values("doc_id")
        got = (
            quality_filter(SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert got["quality_r"].tolist() == want["quality_r"].tolist()
        assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
        # non-vacuous both ways: something pruned, something kept, and the
        # threshold boundary carries ties (>= keeps every tied doc)
        assert 0 < len(got) < len(scored)
        assert (got["quality_r"] == thr).any()

    def test_extreme_quantiles(self, ray_session):
        from searchengine_ray.pipelines.textstats import quality_filter, quality_score

        n_docs = len(quality_score(SF).to_pandas())
        # q=0: threshold is the minimum -> every doc survives
        assert len(quality_filter(SF, q=0.0).to_pandas()) == n_docs
        # q=1: threshold is the maximum -> only max-tied docs survive
        top = quality_filter(SF, q=1.0).to_pandas()
        assert 0 < len(top) < n_docs
        assert top["quality_r"].nunique() == 1


class TestTokenBudgetSelect:
    @staticmethod
    def _brute(scored, budget_den=4):
        """Reference: global sort by (quality desc, doc_id), prefix under
        total//den."""
        df = scored.sort_values(
            ["quality_r", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        budget = int(df["n_tokens"].sum()) // budget_den
        cum = df["n_tokens"].cumsum()
        keep = df[cum <= budget]
        return keep.sort_values("doc_id").reset_index(drop=True)

    def test_matches_bruteforce_prefix(self, ray_session):
        from searchengine_ray.pipelines.textstats import quality_score
        from searchengine_ray.pipelines.traindata import token_budget_select

        scored = quality_score(SF).to_pandas()[["doc_id", "quality_r", "n_tokens"]]
        want = self._brute(scored)
        got = (
            token_budget_select(SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)[["doc_id", "quality_r", "n_tokens"]]
        )
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
        assert np.allclose(got["quality_r"], want["quality_r"])

    def test_forced_refinement_identical_quality(self, ray_session):
        """200 same-quality docs force the tie bin to hold EVERYTHING; a tiny
        pull_limit forces the doc_id-bucket refinement loop (multiple passes)
        and the prefix must still cut exactly."""
        import pyarrow as pa
        import ray

        from searchengine_ray.pipelines.textstats import QualityScore
        from searchengine_ray.pipelines.traindata import token_budget_select
        from searchengine_ray.workerstate import per_worker

        n = 200
        # identical text -> identical quality; tokens per doc all equal
        docs = pa.table(
            {
                "doc_id": pa.array(list(range(n)), type=pa.int64()),
                "text": pa.array(["alpha beta gamma delta epsilon"] * n),
            }
        )
        ds = ray.data.from_arrow(docs).repartition(8)
        got = (
            token_budget_select(SF, n_buckets=4, pull_limit=2, ds=ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        scored = (
            ds.map_batches(per_worker(QualityScore), batch_format="pyarrow")
            .to_pandas()[["doc_id", "quality_r", "n_tokens"]]
        )
        want = self._brute(scored)
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        # identical quality + identical token counts => exactly the first
        # quarter of doc_ids survive
        assert got["doc_id"].tolist() == list(range(n // 4))

    def test_zero_token_boundary(self, ray_session):
        """Zero-token docs ride free while the running total is within
        budget and stay excluded once it crosses — positional prefix, not
        skip-and-continue."""
        import pyarrow as pa
        import ray

        from searchengine_ray.pipelines.textstats import QualityScore
        from searchengine_ray.pipelines.traindata import token_budget_select
        from searchengine_ray.workerstate import per_worker

        # same quality class: doc 0..9 have 4 sig tokens, docs 10/11 empty
        texts = ["alpha beta gamma delta"] * 10 + ["", ""]
        docs = pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
        ds = ray.data.from_arrow(docs).repartition(4)
        got = (
            token_budget_select(SF, ds=ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        scored = (
            ds.map_batches(per_worker(QualityScore), batch_format="pyarrow")
            .to_pandas()[["doc_id", "quality_r", "n_tokens"]]
        )
        want = self._brute(scored)
        assert got["doc_id"].tolist() == want["doc_id"].tolist()


class TestShuffleRank:
    def test_matches_bruteforce_md5_order(self, ray_session, docs):
        from searchengine_ray.pipelines.traindata import shuffle_rank

        out = (
            shuffle_rank(SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ids = sorted(docs)
        order = sorted(ids, key=lambda d: (hashlib.md5(b"%d" % d).hexdigest(), d))
        want_rank = {d: i for i, d in enumerate(order)}
        assert out["doc_id"].tolist() == ids
        assert out["shuffle_rank"].tolist() == [want_rank[d] for d in ids]
        assert out["shard"].tolist() == [want_rank[d] % 8 for d in ids]

    def test_is_a_permutation_and_rerun_deterministic(self, ray_session, docs):
        from searchengine_ray.pipelines.traindata import shuffle_rank

        a = shuffle_rank(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert sorted(a["shuffle_rank"]) == list(range(len(docs)))
        b = shuffle_rank(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)


class TestCorpusMix:
    def test_mix_l_is_lcm_of_weights(self):
        import math

        from searchengine_ray.pipelines.traindata import (
            MIX_DEFAULT_WEIGHT,
            MIX_L,
            MIX_WEIGHTS,
        )

        assert MIX_L == math.lcm(MIX_DEFAULT_WEIGHT, *MIX_WEIGHTS.values())
        for w in [MIX_DEFAULT_WEIGHT, *MIX_WEIGHTS.values()]:
            assert MIX_L % w == 0  # every stride is an exact integer

    def test_empty_corpus(self, ray_session, tmp_path):
        import pandas as pd

        from searchengine_ray.pipelines.traindata import corpus_mix

        pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "lang": pd.Series([], dtype=str),
        }).to_parquet(f"{tmp_path}/documents.parquet", index=False)
        got = corpus_mix(str(tmp_path))
        assert got.num_rows == 0
        assert got.column_names == [
            "doc_id", "lang", "grp_rank", "mix_key", "mix_rank"]

    def test_matches_bruteforce_interleave(self, ray_session):
        """mix_rank equals the rank in the brute-force sort of the exact
        stride-scheduling keys; prefix mixture tracks the weights."""
        import pandas as pd

        from searchengine_ray.pipelines.traindata import (
            MIX_WEIGHTS,
            _mix_stride,
            corpus_mix,
        )

        t = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "lang"]).to_pandas()
        t["u"] = [hashlib.md5(b"%d" % i).hexdigest() for i in t["doc_id"]]
        t = t.sort_values(["lang", "u", "doc_id"]).reset_index(drop=True)
        t["grp_rank"] = t.groupby("lang").cumcount().astype("int64")
        t["mix_key"] = (2 * t["grp_rank"] + 1) * t["lang"].map(_mix_stride)
        t = t.sort_values(["mix_key", "lang", "grp_rank"]).reset_index(drop=True)
        t["mix_rank"] = np.arange(len(t), dtype=np.int64)

        got = (corpus_mix(SF).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        want = t.sort_values("doc_id").reset_index(drop=True)
        for col in ("lang", "grp_rank", "mix_key", "mix_rank"):
            assert got[col].tolist() == want[col].tolist(), col
        # the interleave is a permutation
        ranks = np.sort(got["mix_rank"].to_numpy())
        assert (ranks == np.arange(len(got))).all()
        # any long-enough prefix tracks the weight mixture: every group's
        # share of the first 2·L·max-stride·10 slots is within one stride
        # of its target
        head = got[got["mix_rank"] < 80]
        for lang, n in head.groupby("lang").size().items():
            w = MIX_WEIGHTS.get(lang, 1)
            assert abs(n - 80 * w / 10) <= 2, (lang, n)

    def test_key_stable_under_corpus_growth(self, ray_session, tmp_path):
        """Dropping documents never reorders the survivors' relative mix
        order (key stability — the property random interleaves lack)."""
        import pandas as pd

        from searchengine_ray.pipelines.traindata import corpus_mix

        t = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "lang"]).to_pandas()
        full = (corpus_mix(SF).to_pandas()
                .sort_values("mix_rank").reset_index(drop=True))
        sub = t[t["doc_id"] % 3 != 0]
        sub.assign(text="x", source="s", n_chars=1).to_parquet(
            f"{tmp_path}/documents.parquet", index=False)
        small = (corpus_mix(str(tmp_path)).to_pandas()
                 .sort_values("mix_rank").reset_index(drop=True))
        keep = full[full["doc_id"].isin(set(sub["doc_id"]))]
        # survivors keep their relative order per group (global order can
        # shift as other groups shrink; WITHIN a group the md5 order is
        # key-stable)
        for lang, g in small.groupby("lang"):
            want = keep[keep["lang"] == lang]["doc_id"].tolist()
            got_ids = g.sort_values("grp_rank")["doc_id"].tolist()
            want_kept = [d for d in want if d in set(got_ids)]
            assert got_ids == want_kept, lang
