"""CLI entry points — the rebuild of the reference's REST API surface
(``controllers/ApiController.java:26-69``):

=====================  =======================================================
Reference endpoint      CLI command
=====================  =======================================================
GET /api/startIndexing  ``build  --input DIR --index DIR [--analyzer ru]``
GET /api/stopIndexing   ``stop   --index DIR`` (cooperative, resumable)
POST /api/indexPage     ``upsert --index DIR --doc JSON|--input PATH`` (doc-grain)
                        ``reindex --index DIR [--input PATH]`` (shard-grain)
GET /api/search         ``search --index DIR --query Q [--offset N --limit N]``
GET /api/statistics     ``stats  --index DIR``
DELETE /api/deleteAll   ``clear  --index DIR``
(no reference analog)   ``pipeline NAME --input DIR --out DIR`` — run any
                        registered data pipeline, write partitioned parquet
ALL of the above        ``serve --index DIR [--port N --actors K --input DIR]``
                        — the actual HTTP surface (server.py): /api/search,
                        /api/statistics, /api/startIndexing, /api/stopIndexing,
                        /api/indexPage, /api/deleteAll
=====================  =======================================================

Run locally (``python -m searchengine_ray build ...``) or via
``ray job submit -- python -m searchengine_ray build ...`` on a cluster.
The CLI owns its Ray session (guarded init + shutdown); library code never
initialises Ray.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys


_RAY_OWNED = False  # did THIS process's CLI start the Ray session?


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    global _RAY_OWNED
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address="local", **kwargs)
        _RAY_OWNED = True


def cmd_build(args: argparse.Namespace) -> int:
    from searchengine_ray.build import build_index
    from searchengine_ray.config import EngineConfig

    _ensure_ray(args.num_cpus)
    cfg = EngineConfig(
        analyzer=args.analyzer,
        site_column=args.site_column,
        num_shards=args.num_shards,
        num_segments=args.num_segments,
        num_buckets=args.num_buckets,
        batch_size=args.batch_size,
        lemmatizer_concurrency=(1, args.max_actors),
    )
    manifest = build_index(args.input, args.index, cfg, input_format=args.format)
    if manifest.get("stopped"):
        print(
            json.dumps(
                {
                    "result": True,
                    "stopped": True,
                    "shards_complete": len(manifest["shards"]),
                    "shards_total": manifest["n_shards_total"],
                }
            )
        )
        return 0
    print(
        json.dumps(
            {
                "result": True,
                "n_docs": manifest["n_docs"],
                "n_lemmas": manifest["n_lemmas"],
                "avgdl": round(manifest["avgdl"], 4),
                "shards": len(manifest["shards"]),
            }
        )
    )
    return 0


def cmd_stop(args: argparse.Namespace) -> int:
    """Cooperative stop of a running build (reference ``GET
    /api/stopIndexing``): the build finishes in-flight shards and exits
    with a resumable partial state."""
    from searchengine_ray.build import request_stop

    request_stop(args.index)
    print(json.dumps({"result": True}))
    return 0


def cmd_reindex(args: argparse.Namespace) -> int:
    """Incremental re-index (reference ``POST /api/indexPage``,
    ``services/PageProcessorService.java:34-46``, at shard grain): re-run
    the build over the recorded (or given) input; shards whose input
    fingerprint is unchanged are reused, changed ones are rebuilt, and the
    dictionary/stats re-finalize exactly. Reports which shards rebuilt."""
    import os

    from searchengine_ray.build import build_index

    with open(os.path.join(args.index, "manifest.json")) as f:
        m = json.load(f)
    input_path = args.input
    if input_path is None:
        input_path = sorted({f for s in m["shards"] for f in s["input_files"]})
    # Layout-affecting manifest fields MUST round-trip, or
    # _config_signature mismatches and every shard rebuilds with the
    # wrong layout (site sentinel postings dropped → --site search dies;
    # html_content=True index re-tokenized over raw HTML). One shared
    # reconstruction with the HTTP server's /api/startIndexing.
    from searchengine_ray.build import config_from_manifest

    cfg = config_from_manifest(m, lemmatizer_concurrency=(1, args.max_actors))
    pre = {s["shard"]: s["input_fingerprint"] for s in m["shards"]}
    # Doc-level upsert overlay handling: generations are relative to the
    # PREVIOUS finalized index. A reindex over the recorded inputs whose
    # fingerprints are all unchanged reproduces that exact index, so the
    # overlay stays valid and must be preserved; any changed input (or an
    # explicit --input) supersedes the overlay — warn before dropping it.
    from searchengine_ray.build import _input_fingerprint, _shard_files
    from searchengine_ray.delta import load_state

    dstate = load_state(args.index)
    has_delta = bool(dstate and dstate.get("generations"))
    keep_delta = False
    if has_delta:
        from searchengine_ray import sources

        files, _fmt = sources.expand_input(input_path, None)
        cur = {
            i: _input_fingerprint(s)
            for i, s in enumerate(_shard_files(files, cfg.num_shards))
        }
        # the overlay's postings/df adjustments are keyed to the OLD index's
        # LEMMAS as well as its docids — unchanged inputs alone don't prove
        # validity if any text-shaping rule changed since the build:
        # morphology tables (shards rebuild under new lemma keys) OR, for
        # html_content indexes, the HTML-extraction rules (shards rebuild
        # over differently-extracted text). Compare every drifting field of
        # the config signature; manifests predating these fields can't
        # prove validity either way, so they conservatively drop.
        from searchengine_ray.build import _extractor_version
        from searchengine_ray.textproc import morphology_signature

        same_morph = m.get("morphology") == morphology_signature()
        same_extractor = m.get("html_extractor") == (
            _extractor_version() if cfg.html_content else None
        )
        keep_delta = args.input is None and cur == pre and same_morph and same_extractor
        if not keep_delta:
            if not (args.input is None and cur == pre):
                reason = "changed inputs"
            elif "morphology" not in m or (cfg.html_content and "html_extractor" not in m):
                reason = (
                    "a manifest that predates morphology/extractor signatures "
                    "(overlay validity can't be proven)"
                )
            elif not same_morph:
                reason = "changed morphology tables"
            else:
                reason = "changed HTML-extraction rules"
            print(
                f"warning: reindex over {reason} supersedes "
                f"{len(dstate['generations'])} doc-level upsert generation(s); "
                "they will be dropped after the rebuild finalizes",
                file=sys.stderr,
            )
    _ensure_ray(args.num_cpus)
    m2 = build_index(input_path, args.index, cfg, keep_delta=keep_delta)
    if m2.get("stopped"):
        print(json.dumps({"result": True, "stopped": True}))
        return 0
    rebuilt = [
        s["shard"] for s in m2["shards"] if pre.get(s["shard"]) != s["input_fingerprint"]
    ]
    print(
        json.dumps(
            {
                "result": True,
                "n_docs": m2["n_docs"],
                "n_lemmas": m2["n_lemmas"],
                "rebuilt_shards": rebuilt,
                "reused_shards": [s["shard"] for s in m2["shards"] if s["shard"] not in rebuilt],
            }
        )
    )
    return 0


def cmd_upsert(args: argparse.Namespace) -> int:
    """Doc-level insert-or-replace (reference ``POST /api/indexPage``,
    ``services/PageProcessorService.java:34-46``, at document grain): rows
    from ``--doc`` (inline JSON) or ``--input`` (parquet / JSONL) become one
    delta generation over the built index (``delta.py``) — an interactive
    point operation, no Ray session needed. Bulk changes go through
    ``reindex``."""
    from searchengine_ray.delta import upsert_docs

    if args.doc:
        obj = json.loads(args.doc)
        rows = obj if isinstance(obj, list) else [obj]
    elif args.input:
        if args.input.endswith((".jsonl", ".json")):
            with open(args.input) as f:
                rows = [json.loads(line) for line in f if line.strip()]
        else:
            import pyarrow.parquet as pq

            rows = pq.read_table(args.input).to_pylist()
    else:
        print(json.dumps({"result": False, "error": "upsert needs --doc or --input"}))
        return 2
    out = upsert_docs(args.index, rows)
    print(json.dumps({"result": True, **out}))
    return 0


def cmd_search(args: argparse.Namespace) -> int:
    if args.actors > 1:
        # Partition-serving mode: per-shard QueryActors + exact driver merge.
        # Routed through ShardedQueryService.search so the response contract
        # (hydrated hits with snippets/role, error envelope) is IDENTICAL to
        # the single-process path — the CLI shape must not depend on --actors.
        from searchengine_ray.query import ShardedQueryService

        _ensure_ray(args.num_cpus)
        svc = ShardedQueryService(args.index, num_actors=args.actors, mode=args.mode)
        out = svc.search(args.query, args.offset, args.limit, site=args.site)
        svc.shutdown()
        print(json.dumps(out, ensure_ascii=False))
        return 0

    from searchengine_ray.query import QueryEngine

    engine = QueryEngine(args.index, mode=args.mode)
    print(
        json.dumps(
            engine.search(args.query, args.offset, args.limit, site=args.site),
            ensure_ascii=False,
        )
    )
    return 0


def cmd_search_batch(args: argparse.Namespace) -> int:
    """Bulk query evaluation: a parquet of (query_id, query[, offset,
    limit]) rows fans out over a warm ``QueryActor`` POOL via
    ``map_batches`` (engine state loads once per actor) and the ranked
    hits stream straight to parquet — the throughput-oriented counterpart
    of the interactive ``search`` endpoint."""
    import ray.data as rd

    from searchengine_ray.query import QueryActor

    def _lt():
        from searchengine_ray import textproc as _tp

        return _tp._LEMMA_TABLE

    _ensure_ray(args.num_cpus)
    (
        rd.read_parquet(args.queries)
        .map_batches(
            QueryActor,
            # ship any driver-installed custom lemma table (morphology
            # state is process-local; see QueryActor.__init__)
            fn_constructor_kwargs={"index_dir": args.index, "lemma_table": _lt()},
            batch_format="pandas",
            batch_size=args.batch_size,
            concurrency=args.actors,
        )
        .write_parquet(args.output)
    )
    print(json.dumps({"result": True, "output": args.output}))
    return 0


def cmd_stats(args: argparse.Namespace) -> int:
    """Statistics endpoint analogue (``services/StatisticsServiceImpl.java:30-62``):
    global totals + per-shard detail from the lineage manifests, with the
    doc-level upsert overlay folded in (delta.py) exactly like IndexReader
    does for serving. One shared envelope builder with ``GET
    /api/statistics`` (server.py) so the two surfaces cannot drift."""
    from searchengine_ray.server import index_statistics

    print(json.dumps(index_statistics(args.index)))
    return 0


def cmd_serve(args: argparse.Namespace) -> int:
    """HTTP serving (the reference's actual user-facing surface,
    ``controllers/ApiController.java:26-69``): /api/search, /api/statistics,
    /api/startIndexing, /api/stopIndexing, /api/indexPage, /api/deleteAll
    over stdlib ``http.server`` (the sandbox lacks aiohttp, so Ray's
    dashboard/job HTTP stack can't host this — see BASELINE.md)."""
    from searchengine_ray.server import make_server

    if args.actors > 1 or args.input:
        _ensure_ray(args.num_cpus)  # sharded serving / builds need a session
    srv = make_server(
        args.index,
        host=args.host,
        port=args.port,
        input_dir=args.input,
        actors=args.actors,
    )
    host, port = srv.server_address[:2]
    print(json.dumps({"result": True, "listening": f"http://{host}:{port}"}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.service.close()
        srv.server_close()
    return 0


def cmd_clear(args: argparse.Namespace) -> int:
    shutil.rmtree(args.index, ignore_errors=True)
    print(json.dumps({"result": True}))
    return 0


def cmd_pipeline(args: argparse.Namespace) -> int:
    """Run any registered pipeline over an sf-style table directory and
    write the result as PARTITIONED parquet (one file per block — the
    resumable-output layout; never one giant file). ``--list`` enumerates
    the registry."""
    import importlib.util
    import os

    # the registry lives in the driver-contract module at the repo root
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(root, "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    registry = mod.queries()
    if args.list:  # listing needs no Ray session
        print(json.dumps({"result": True, "pipelines": sorted(registry)}))
        return 0
    _ensure_ray(args.num_cpus)
    if args.name not in registry:
        print(json.dumps({"result": False, "error": f"unknown pipeline: {args.name}"}))
        return 2
    res = registry[args.name](args.input)
    import ray.data as rd

    if not isinstance(res, rd.Dataset):
        import pandas as pd
        import pyarrow as pa

        if isinstance(res, pd.DataFrame):
            res = rd.from_pandas(res)
        elif isinstance(res, pa.Table):
            res = rd.from_arrow(res)
        else:
            print(json.dumps({"result": False, "error": f"unwritable result type {type(res)}"}))
            return 2
    shutil.rmtree(args.out, ignore_errors=True)
    res.write_parquet(args.out)
    import pyarrow.parquet as pq

    files = [f for f in os.listdir(args.out) if f.endswith(".parquet")]
    rows = sum(pq.read_metadata(os.path.join(args.out, f)).num_rows for f in files)
    print(json.dumps({"result": True, "pipeline": args.name, "out": args.out,
                      "files": len(files), "rows": rows}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="searchengine_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) the inverted index")
    b.add_argument("--input", required=True, help="parquet file/dir of transcripts")
    b.add_argument("--index", required=True, help="output index directory")
    b.add_argument("--analyzer", default="ru", choices=["ru", "simple"])
    b.add_argument(
        "--site-column", default=None,
        help="input column that partitions docs into sites (enables --site search scoping)",
    )
    b.add_argument(
        "--format", default=None, choices=["parquet", "json", "csv"],
        help="input format (default: detected from file extensions)",
    )
    b.add_argument("--num-shards", type=int, default=4)
    b.add_argument("--num-segments", type=int, default=8)
    b.add_argument("--num-buckets", type=int, default=16)
    b.add_argument("--batch-size", type=int, default=4096)
    b.add_argument("--max-actors", type=int, default=8)
    b.add_argument("--num-cpus", type=int, default=None)
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="query a built index")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--offset", type=int, default=0)
    s.add_argument("--limit", type=int, default=10)
    s.add_argument("--mode", default="bm25", choices=["bm25", "tf_sum"])
    s.add_argument("--site", default=None, help="scope search to one corpus partition")
    s.add_argument("--actors", type=int, default=1, help="shard-serving actor count (>1 needs Ray)")
    s.add_argument("--num-cpus", type=int, default=None)
    s.set_defaults(fn=cmd_search)

    sb = sub.add_parser("search-batch", help="bulk query evaluation over an actor pool")
    sb.add_argument("--index", required=True)
    sb.add_argument("--queries", required=True, help="parquet of (query_id, query[, offset, limit])")
    sb.add_argument("--output", required=True, help="output parquet directory")
    sb.add_argument("--actors", type=int, default=2)
    sb.add_argument("--batch-size", type=int, default=32)
    sb.add_argument("--num-cpus", type=int, default=None)
    sb.set_defaults(fn=cmd_search_batch)

    sv = sub.add_parser("serve", help="HTTP API server (reference REST surface)")
    sv.add_argument("--index", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8080)
    sv.add_argument("--input", default=None, help="corpus dir for /api/startIndexing")
    sv.add_argument("--actors", type=int, default=1, help=">1 = sharded serving")
    sv.add_argument("--num-cpus", type=int, default=None)
    sv.set_defaults(fn=cmd_serve)

    st = sub.add_parser("stats", help="index statistics")
    st.add_argument("--index", required=True)
    st.set_defaults(fn=cmd_stats)

    sp = sub.add_parser("stop", help="cooperatively stop a running build (resumable)")
    sp.add_argument("--index", required=True)
    sp.set_defaults(fn=cmd_stop)

    up = sub.add_parser("upsert", help="doc-level insert-or-replace (delta generation)")
    up.add_argument("--index", required=True)
    up.add_argument("--doc", default=None, help="inline JSON row or array of rows")
    up.add_argument(
        "--input", default=None,
        help="parquet or JSONL file of rows (conv_id, turn_idx, role, text)",
    )
    up.set_defaults(fn=cmd_upsert)

    ri = sub.add_parser("reindex", help="incremental re-index: rebuild only changed shards")
    ri.add_argument("--index", required=True)
    ri.add_argument("--input", default=None, help="parquet file/dir (default: recorded input)")
    ri.add_argument("--max-actors", type=int, default=8)
    ri.add_argument("--num-cpus", type=int, default=None)
    ri.set_defaults(fn=cmd_reindex)

    pl = sub.add_parser(
        "pipeline", help="run a registered pipeline and write partitioned parquet"
    )
    pl.add_argument("name", nargs="?", default="", help="pipeline name (see --list)")
    pl.add_argument("--input", default="/root/testdata/sf0.001",
                    help="sf-style table directory")
    pl.add_argument("--out", default="/tmp/searchengine_ray_pipeline_out",
                    help="output parquet directory")
    pl.add_argument("--list", action="store_true", help="list registered pipelines")
    pl.add_argument("--num-cpus", type=int, default=None)
    pl.set_defaults(fn=cmd_pipeline)

    c = sub.add_parser("clear", help="delete a built index")
    c.add_argument("--index", required=True)
    c.set_defaults(fn=cmd_clear)

    args = p.parse_args(argv)
    rc = args.fn(args)

    # Shut down ONLY a session this CLI started — never a caller's (e.g. a
    # test harness or embedding application that owns its own ray.init).
    global _RAY_OWNED
    if _RAY_OWNED and "ray" in sys.modules:
        import ray

        if ray.is_initialized():
            ray.shutdown()
        _RAY_OWNED = False
    return rc


if __name__ == "__main__":
    sys.exit(main())
