"""CLI surface tests (reference ApiController analogue, SURVEY.md §2.10)."""

import json

import pytest

from searchengine_ray.cli import main
from searchengine_ray.corpus import write_transcripts


@pytest.fixture(scope="module")
def cli_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    write_transcripts(str(root / "corpus"), n_convs=30)
    rc = main(
        [
            "build",
            "--input", str(root / "corpus"),
            "--index", str(root / "index"),
            "--num-shards", "2",
            "--max-actors", "2",
        ]
    )
    assert rc == 0
    return root / "index"


def test_build_then_search(cli_index, capsys):
    rc = main(["search", "--index", str(cli_index), "--query", "суд решение"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["result"] is True
    assert out["count"] >= 1
    assert out["data"][0]["relevance"] > 0


def test_stats(cli_index, capsys):
    rc = main(["stats", "--index", str(cli_index)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["statistics"]["total"]["docs"] > 0
    assert out["statistics"]["total"]["shards"] == 2
    assert all(s["status"] == "complete" for s in out["statistics"]["detailed"])


def test_clear(cli_index, capsys, tmp_path):
    # clear a copy, not the shared fixture index
    import shutil

    victim = tmp_path / "index_copy"
    shutil.copytree(cli_index, victim)
    rc = main(["clear", "--index", str(victim)])
    assert rc == 0
    assert not victim.exists()


def test_sharded_search_cli(cli_index, capsys):
    rc = main(
        ["search", "--index", str(cli_index), "--query", "суд решение", "--actors", "2"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # compare against the single-engine CLI result
    rc = main(["search", "--index", str(cli_index), "--query", "суд решение"])
    single = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["count"] == single["count"]
    got = [(d["conv_id"], d["turn_idx"]) for d in out["data"]]
    want = [(d["conv_id"], d["turn_idx"]) for d in single["data"]]
    assert got == want


def test_sharded_search_cli_shape_matches_single(cli_index, capsys):
    """ADVICE r1 (low): the CLI response contract (hydrated hits with
    snippet/role, error envelope) must not depend on --actors."""
    rc = main(
        ["search", "--index", str(cli_index), "--query", "суд решение", "--actors", "2"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["result"] is True
    hit = out["data"][0]
    assert {"conv_id", "turn_idx", "relevance", "snippet", "title", "uri"} <= set(hit)
    # error envelope parity on a nothing-found query
    rc = main(
        ["search", "--index", str(cli_index), "--query", "qqqzzzqqq", "--actors", "2"]
    )
    sharded_err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rc = main(["search", "--index", str(cli_index), "--query", "qqqzzzqqq"])
    single_err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sharded_err == single_err


def test_reindex_cli_rebuilds_only_changed_shard(ray_session, tmp_path, capsys):
    """reindex (reference POST /api/indexPage at shard grain): a one-file
    edit rebuilds exactly that shard; the result equals a fresh build."""
    import os

    import pyarrow.parquet as pq

    from searchengine_ray.corpus import write_transcripts

    corpus = tmp_path / "corpus"
    write_transcripts(str(corpus), n_convs=40)
    idx = tmp_path / "index"
    rc = main(
        ["build", "--input", str(corpus), "--index", str(idx),
         "--num-shards", "4", "--max-actors", "2"]
    )
    assert rc == 0
    capsys.readouterr()

    # no-op reindex: everything reused
    rc = main(["reindex", "--index", str(idx)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rebuilt_shards"] == []

    # edit one input file → exactly its shard rebuilds
    files = sorted(os.listdir(corpus))
    victim = corpus / files[-1]
    t = pq.read_table(str(victim))
    texts = t["text"].to_pylist()
    texts[0] = (texts[0] or "") + " новыйтермин"
    import pyarrow as pa

    pq.write_table(
        t.set_column(t.schema.get_field_index("text"), "text", pa.array(texts)),
        str(victim),
    )
    rc = main(["reindex", "--index", str(idx)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["rebuilt_shards"]) == 1

    # final index equals a from-scratch build of the edited corpus
    idx2 = tmp_path / "index2"
    rc = main(
        ["build", "--input", str(corpus), "--index", str(idx2),
         "--num-shards", "4", "--max-actors", "2"]
    )
    assert rc == 0
    capsys.readouterr()
    da = pq.read_table(str(idx / "dictionary.parquet"))
    db = pq.read_table(str(idx2 / "dictionary.parquet"))
    assert da.equals(db)


def test_stop_cli_writes_flag(tmp_path, capsys):
    rc = main(["stop", "--index", str(tmp_path / "idx")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["result"] is True
    import os

    assert os.path.exists(str(tmp_path / "idx" / "STOP"))


def test_stats_includes_sites(ray_session, tmp_path, capsys):
    """stats surfaces per-site detail when the index was built with a
    site column (reference per-site statistics)."""
    from searchengine_ray.corpus import write_transcripts

    corpus = tmp_path / "corpus"
    write_transcripts(str(corpus), n_convs=20)
    idx = tmp_path / "idx"
    rc = main(
        ["build", "--input", str(corpus), "--index", str(idx),
         "--num-shards", "2", "--max-actors", "2", "--site-column", "role"]
    )
    assert rc == 0
    capsys.readouterr()
    rc = main(["stats", "--index", str(idx)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    sites = out["statistics"]["sites"]
    assert set(sites) == {"user", "assistant", "tool", "system"}
    assert sum(s["docs"] for s in sites.values()) == out["statistics"]["total"]["docs"]


def test_search_batch_cli(cli_index, tmp_path, capsys):
    """Bulk evaluation: a query table fans out over the actor pool and the
    ranked hits land as parquet, matching interactive search results."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    qfile = tmp_path / "queries.parquet"
    pq.write_table(
        pa.table(
            {
                "query_id": ["q1", "q2"],
                "query": ["суд решение", "суд"],
                "offset": [0, 0],
                "limit": [5, 3],
            }
        ),
        str(qfile),
    )
    out_dir = tmp_path / "results"
    rc = main(
        ["search-batch", "--index", str(cli_index), "--queries", str(qfile),
         "--output", str(out_dir), "--actors", "2"]
    )
    assert rc == 0
    capsys.readouterr()
    res = pq.read_table(str(out_dir)).to_pandas()
    assert set(res["query_id"]) == {"q1", "q2"}
    assert (res[res["query_id"] == "q1"]["rank"].sort_values().tolist()
            == list(range(len(res[res["query_id"] == "q1"]))))
    # parity with interactive search
    rc = main(["search", "--index", str(cli_index), "--query", "суд решение", "--limit", "5"])
    single = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = [(d["conv_id"], d["turn_idx"]) for d in single["data"]]
    got = [
        (r.conv_id, r.turn_idx)
        for r in res[res["query_id"] == "q1"].sort_values("rank").itertuples()
    ]
    assert got == want


def test_pipeline_cli_writes_partitioned_parquet(ray_session, tmp_path, capsys):
    """`pipeline NAME` runs a registered pipeline over an sf dir and writes
    the result as parquet; `--list` enumerates the registry."""
    import pyarrow.parquet as pq

    rc = main(["pipeline", "--list"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["result"] and "langid" in out["pipelines"]
    assert "sample_split" in out["pipelines"]

    dest = tmp_path / "langid_out"
    rc = main(
        ["pipeline", "langid", "--input", "/root/testdata/sf0.001",
         "--out", str(dest)]
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["result"] and res["rows"] == 500
    t = pq.read_table(str(dest))
    assert t.num_rows == 500
    assert set(t.column_names) == {"doc_id", "pred_lang"}

    rc = main(["pipeline", "nonexistent_pipeline", "--out", str(tmp_path / "x")])
    assert rc == 2


def test_reindex_preserves_site_scoped_index(ray_session, tmp_path, capsys):
    """ADVICE r2: cmd_reindex must round-trip site_column from the manifest.
    Pre-fix, the rebuilt EngineConfig dropped it → config signature mismatch
    → every shard rebuilt WITHOUT site sentinels and --site search died."""
    import os

    from searchengine_ray.corpus import write_transcripts

    corpus = tmp_path / "corpus"
    write_transcripts(str(corpus), n_convs=30)
    idx = tmp_path / "index"
    rc = main(
        ["build", "--input", str(corpus), "--index", str(idx),
         "--num-shards", "3", "--max-actors", "2", "--site-column", "role"]
    )
    assert rc == 0
    capsys.readouterr()

    from searchengine_ray.query import QueryEngine

    q = "суд"
    before = QueryEngine(str(idx)).search(q, 0, 10, site="user")
    assert before["result"] is True and before["count"] > 0

    rc = main(["reindex", "--index", str(idx)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # unchanged inputs + round-tripped layout config ⇒ every shard reused
    assert out["rebuilt_shards"] == []
    with open(os.path.join(str(idx), "manifest.json")) as f:
        m = json.load(f)
    assert m["site_column"] == "role"
    assert QueryEngine(str(idx)).search(q, 0, 10, site="user") == before
