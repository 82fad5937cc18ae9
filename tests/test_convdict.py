"""Range-sharded conversation dictionary (``convdict.py``) — the scale path
for docid assignment (VERDICT r2 item 1: no O(distinct-convs) driver state).

Invariant: the sharded layout assigns EXACTLY the docids of the legacy
single-array layout — rank = part base offset + local rank, which equals
``np.searchsorted(full_sorted, id)`` for any boundary choice — so indexes
built under either layout are interchangeable (equal dictionaries, equal
search responses)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray import build as build_mod
from searchengine_ray import convdict
from searchengine_ray.build import build_index
from searchengine_ray.config import EngineConfig
from searchengine_ray.corpus import reference_queries
from searchengine_ray.query import QueryEngine

CFG = EngineConfig(num_shards=2, num_segments=4, lemmatizer_concurrency=(1, 2), batch_size=512)
QUERIES = [q["query"] for q in reference_queries()]


def _write_corpus(table: pa.Table, out_dir: str, n_files: int = 6) -> None:
    os.makedirs(out_dir)
    n = table.num_rows
    per = (n + n_files - 1) // n_files
    for i in range(n_files):
        chunk = table.slice(i * per, min(per, n - i * per))
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(out_dir, f"part-{i:05d}.parquet"))


@pytest.fixture()
def force_sharded(monkeypatch):
    """Route the conv dictionary through the sharded path at test scale:
    size threshold to zero, ~64 ids of input bytes per part so tiny corpora
    still split into several parts."""
    monkeypatch.setattr(build_mod, "_CONV_SMALL_BYTES", 0)
    monkeypatch.setattr(convdict, "DEFAULT_BYTES_PER_PART", 4096)


class TestShardedConvArrayUnit:
    def _make(self, tmp_path, ids: list[str], boundaries: list[str]):
        root = str(tmp_path / "conv_dict")
        os.makedirs(root)
        bnd = np.asarray(boundaries, dtype=np.str_)
        arr = np.asarray(sorted(ids), dtype=np.str_)
        parts = (
            np.searchsorted(bnd, arr, side="right")
            if bnd.size
            else np.zeros(arr.size, dtype=np.int64)
        )
        counts = []
        for p in range(len(boundaries) + 1):
            sub = arr[parts == p]
            np.save(str(tmp_path / "conv_dict" / f"part-{p:05d}.npy.tmp.npy"), sub)
            os.replace(
                str(tmp_path / "conv_dict" / f"part-{p:05d}.npy.tmp.npy"),
                convdict._part_path(root, p),
            )
            counts.append(int(sub.size))
        with open(os.path.join(root, convdict.META_FILE), "w") as f:
            json.dump({"version": 2, "boundaries": boundaries, "counts": counts}, f)
        return convdict.ShardedConvArray(root), arr

    def test_searchsorted_and_getitem_match_single_array(self, tmp_path):
        rng = np.random.default_rng(7)
        ids = [f"conv-{int(i):08d}" for i in rng.choice(10_000_000, 500, replace=False)]
        # boundaries deliberately uneven, including one below all ids and
        # one equal to an existing id (right-exclusive edge)
        present = sorted(ids)
        boundaries = ["aaaa", present[100], present[333], "zzzz"]
        sh, full = self._make(tmp_path, ids, boundaries)
        assert len(sh) == full.size

        queries = np.asarray(
            present[::7] + ["conv-00000000", "zz-not-there", present[100], "m"],
            dtype=np.str_,
        )
        assert np.array_equal(sh.searchsorted(queries), np.searchsorted(full, queries))
        assert sh.searchsorted(str(present[42])) == 42

        ranks = rng.choice(full.size, 64, replace=False).astype(np.int64)
        got = sh[ranks]
        assert [str(x) for x in got] == [str(full[int(r)]) for r in ranks]
        assert str(sh[0]) == str(full[0]) and str(sh[len(sh) - 1]) == str(full[-1])
        with pytest.raises(IndexError):
            sh[len(sh)]
        assert np.array_equal(sh.gather_all(), full)

    def test_empty_parts_and_single_part(self, tmp_path):
        sh, full = self._make(tmp_path, ["b", "c"], ["a", "zz"])  # part 0 empty
        assert sh.counts.tolist() == [0, 2, 0]
        assert sh.searchsorted("b") == 0 and sh.searchsorted("zzz") == 2
        assert str(sh[1]) == "c"


class TestShardedBuildEqualsLegacy:
    def test_docids_dictionary_and_search_identical(
        self, ray_session, tiny_corpus, tmp_path, force_sharded
    ):
        corpus = str(tmp_path / "corpus")
        _write_corpus(tiny_corpus, corpus)

        idx_sh = str(tmp_path / "idx_sharded")
        build_index(corpus, idx_sh, CFG)
        root = convdict.dict_dir(idx_sh)
        assert os.path.exists(os.path.join(root, convdict.META_FILE))
        sh = convdict.ShardedConvArray(root)
        assert sh.counts.size > 1, "test must exercise MULTIPLE parts"

        # legacy build of the same corpus (restore the real threshold for
        # this one build, then re-force it)
        idx_legacy = str(tmp_path / "idx_legacy")
        orig = build_mod._CONV_SMALL_BYTES
        build_mod._CONV_SMALL_BYTES = 1 << 30
        try:
            build_index(corpus, idx_legacy, CFG)
        finally:
            build_mod._CONV_SMALL_BYTES = orig

        legacy = np.load(os.path.join(idx_legacy, "conv_dict.npy"))
        assert np.array_equal(sh.gather_all().astype(legacy.dtype), legacy)

        da = pq.read_table(os.path.join(idx_sh, "dictionary.parquet"))
        db = pq.read_table(os.path.join(idx_legacy, "dictionary.parquet"))
        assert da.equals(db)

        ea, eb = QueryEngine(idx_sh), QueryEngine(idx_legacy)
        assert ea.reader.n_docs == eb.reader.n_docs
        for q in QUERIES:
            assert ea.search(q, 0, 10) == eb.search(q, 0, 10), q

    def test_superset_reuse_and_new_conv_invalidation(
        self, ray_session, tiny_corpus, tmp_path, force_sharded
    ):
        corpus = str(tmp_path / "corpus")
        _write_corpus(tiny_corpus, corpus)
        idx = str(tmp_path / "idx")
        build_index(corpus, idx, CFG)
        root = convdict.dict_dir(idx)
        meta_mtime = os.path.getmtime(os.path.join(root, convdict.META_FILE))
        shard_manifest = os.path.join(idx, "shards", "shard=00000", "_MANIFEST.json")
        shard_mtime = os.path.getmtime(shard_manifest)

        # identical rebuild: dictionary superset-reused, shards resumed
        build_index(corpus, idx, CFG)
        assert os.path.getmtime(os.path.join(root, convdict.META_FILE)) == meta_mtime
        assert os.path.getmtime(shard_manifest) == shard_mtime

        # a NEW conversation shifts ranks: dictionary rewritten (same
        # boundaries), shards invalidated + rebuilt, search serves the doc
        extra = pa.table(
            {
                "conv_id": pa.array(["zzzz-new-conv"], type=pa.string()),
                "turn_idx": pa.array([0], type=pa.int32()),
                "role": pa.array(["user"], type=pa.string()),
                "text": pa.array(["суд принял новослово"], type=pa.string()),
                "tool": pa.array([""], type=pa.string()),
                "ts": tiny_corpus["ts"].slice(0, 1),
            }
        )
        pq.write_table(extra, os.path.join(corpus, "part-00099.parquet"))
        build_index(corpus, idx, CFG)
        sh = convdict.ShardedConvArray(root)
        pos = sh.searchsorted("zzzz-new-conv")
        assert str(sh[pos]) == "zzzz-new-conv"
        r = QueryEngine(idx).search("новослово", 0, 10)
        assert r["count"] == 1 and r["data"][0]["conv_id"] == "zzzz-new-conv"

    def test_upsert_over_sharded_index(
        self, ray_session, tiny_corpus, tmp_path, force_sharded
    ):
        """delta.upsert_docs rank lookups go through the handle's
        .searchsorted; hydration reads back through part mmaps."""
        from searchengine_ray.delta import upsert_docs

        corpus = str(tmp_path / "corpus")
        _write_corpus(tiny_corpus, corpus)
        idx = str(tmp_path / "idx")
        build_index(corpus, idx, CFG)

        rows = [
            {"conv_id": "conv-000000", "turn_idx": 3, "role": "tool", "text": "новослово суд"},
            {"conv_id": "zzzz-upsert", "turn_idx": 0, "role": "user", "text": "новослово закона"},
        ]
        out = upsert_docs(idx, rows)
        assert out == {"generation": 0, "replaced": 1, "added": 1}
        eng = QueryEngine(idx)
        r = eng.search("новослово", 0, 10)
        assert r["count"] == 2
        assert {d["conv_id"] for d in r["data"]} == {"conv-000000", "zzzz-upsert"}
