"""Benchmark harness — the driver runs this per round and records the JSON line.

Headline pipeline: inverted-index build (turns/sec) + BM25 query serving
(p50/p99 latency over the reference query set) on the deterministic synthetic
transcripts corpus (corpus.generate_transcripts — same seed → same bytes),
plus wall-time for every driver-table pipeline over ``$GRAFT_SF_DIR``.

Prints ONE JSON line::

    {"metric": "...", "value": <headline build sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N}

``--scaling`` runs the identical headline build+query job twice in FRESH
subprocesses (num_cpus=8 then num_cpus=32; override via
``GRAFT_SCALE_LO/HI``) on the same pre-generated input and reports
throughput at both plus efficiency = (T_hi/T_lo)/(hi/lo). Results land in
BASELINE.md's measured-numbers section (update by hand from the output).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# ~170k turns at the default; scales the synthetic headline corpus. The
# scaling run uses a larger corpus (~1M turns) so compute dominates the
# fixed per-job overhead — efficiency at two CPU counts is meaningless when
# the whole build is overhead-bound.
BENCH_CONVS = int(os.environ.get("GRAFT_BENCH_CONVS", "50000"))
# Scaling corpus: same conv count but long conversations (~20M turns) so the
# build is compute-bound — efficiency between two CPU counts is meaningless
# when fixed per-job latency dominates.
SCALE_CONVS = int(os.environ.get("GRAFT_SCALE_CONVS", "250000"))
SCALE_TURNS = float(os.environ.get("GRAFT_SCALE_TURNS", "80"))


def ensure_bench_corpus(
    n_convs: int = BENCH_CONVS, avg_turns: float = 12.0
) -> tuple[str, int]:
    """Generate (once) the synthetic transcripts corpus; returns (dir, rows)."""
    import pyarrow.parquet as pq

    from searchengine_ray.corpus import write_transcripts

    corpus_dir = f"/tmp/searchengine_ray_bench/corpus_c{n_convs}_t{int(avg_turns)}"
    meta = os.path.join(corpus_dir, "_meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            return corpus_dir, json.load(f)["rows"]
    paths = write_transcripts(
        corpus_dir, n_convs=n_convs, avg_turns=avg_turns, seed=42, n_files=64
    )
    rows = sum(pq.read_metadata(p).num_rows for p in paths)
    with open(meta, "w") as f:
        json.dump({"rows": rows, "n_convs": n_convs}, f)
    return corpus_dir, rows


def _warm_page_cache(corpus_dir: str) -> None:
    """Read every corpus file once so the first timed run isn't penalized
    by cold page cache relative to the second."""
    for name in sorted(os.listdir(corpus_dir)):
        p = os.path.join(corpus_dir, name)
        if name.endswith(".parquet"):
            with open(p, "rb") as f:
                while f.read(1 << 22):
                    pass


def run_headline(
    num_cpus: int, tag: str, n_convs: int = BENCH_CONVS, avg_turns: float = 12.0
) -> dict:
    """Fresh-index build + query latency on the synthetic corpus.
    Assumes ray already initialised in THIS process."""
    import shutil

    import numpy as np
    import ray.data as rd

    from searchengine_ray.build import build_index
    from searchengine_ray.config import EngineConfig
    from searchengine_ray.corpus import reference_queries
    from searchengine_ray.query import QueryEngine

    corpus_dir, rows = ensure_bench_corpus(n_convs, avg_turns)
    index_dir = f"/tmp/searchengine_ray_bench/index_{tag}_c{n_convs}"
    shutil.rmtree(index_dir, ignore_errors=True)
    _warm_page_cache(corpus_dir)

    # Index-layout params are FIXED (independent of num_cpus) so scaling
    # runs build byte-identical indexes; only execution sizing varies.
    # Leave CPU headroom for the read + shuffle stages: a fixed-size actor
    # pool equal to num_cpus starves ReadParquet and stalls the pipeline.
    # Few, large shards: every shard job carries fixed pipeline latency and
    # concurrent streaming executors contend on the driver, so 2 shards ×
    # 2 concurrent jobs beats 8×8 by ~2× at this node size (shard count is
    # a resume-granularity knob, not a parallelism knob — parallelism lives
    # inside the job).
    cfg = EngineConfig(
        analyzer="ru",
        num_shards=2,
        num_segments=32,
        num_buckets=32,
        lemmatizer_concurrency=(2, max(2, num_cpus - 4)),
        batch_size=4096,
        build_concurrency=2,
    )
    # Warm the worker pool outside the timing: process spawn AND the
    # searchengine_ray import cost in each task worker (actors re-import on
    # spawn regardless, but task-pool stages reuse these processes).
    def _warm(b):
        import searchengine_ray.build  # noqa: F401
        import searchengine_ray.textproc  # noqa: F401

        return b

    rd.range(10_000, override_num_blocks=64).map_batches(
        _warm, batch_format="pyarrow"
    ).materialize()
    t0 = time.time()
    manifest = build_index(corpus_dir, index_dir, cfg)
    build_sec = time.time() - t0

    engine = QueryEngine(index_dir)
    queries = [q for q in reference_queries() if q["query"]]
    lat: list[float] = []
    for _ in range(3):  # warm + measured repeats
        for q in queries:
            t1 = time.perf_counter()
            engine.search(q["query"], q["offset"], q["limit"])
            lat.append(time.perf_counter() - t1)
    lat_arr = np.asarray(lat[len(queries):])  # drop cold pass
    out = {
        "build_sec": round(build_sec, 3),
        "turns": rows,
        "turns_per_sec": round(rows / build_sec, 1),
        "n_lemmas": manifest["n_lemmas"],
        "query_p50_ms": round(float(np.percentile(lat_arr, 50)) * 1e3, 3),
        "query_p99_ms": round(float(np.percentile(lat_arr, 99)) * 1e3, 3),
        "num_cpus": num_cpus,
    }
    shutil.rmtree(index_dir, ignore_errors=True)
    return out


def run_driver_pipelines(sf_dir: str) -> dict[str, float]:
    """Wall-time per driver-contract pipeline over the testdata tables."""
    import shutil

    import __ray_entry__ as entrymod

    # transcript pipelines cache their index under /tmp, and the ANN
    # pipelines persist bucket-/list-partitioned indexes — clear BOTH so
    # the bench measures real builds, not cache hits (a warm lsh_knn is
    # ~0.02 s; the honest number includes ensure_*_index).
    shutil.rmtree("/tmp/searchengine_ray_idx", ignore_errors=True)
    shutil.rmtree("/tmp/searchengine_ray_ann", ignore_errors=True)
    times: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        res = fn(sf_dir)
        # force execution for lazy Datasets
        if hasattr(res, "materialize"):
            res = res.materialize()
        times[name] = round(time.time() - t0, 3)
    return times


def main_single() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    headline = run_headline(NUM_CPUS, tag=f"cpu{NUM_CPUS}")
    queries = run_driver_pipelines(SF_DIR)
    queries["index_build"] = headline["build_sec"]
    result = {
        "metric": "index_build_sec_plus_query_latency",
        "value": headline["build_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "headline": headline,
    }
    print(json.dumps(result), flush=True)
    ray.shutdown()
    # Observed rarely in this sandbox: the interpreter lingers in a
    # post-shutdown atexit sleep (single remaining thread), which stalls any
    # caller waiting on process exit. The result line is already flushed —
    # exit deterministically.
    os._exit(0)


def _scaling_leg(n: int, rep: int) -> dict:
    code = (
        "import sys, json, ray; sys.path.insert(0, %r); "
        "ray.init(address='local', num_cpus=%d, include_dashboard=False); "
        "from bench import run_headline; "
        "print('RESULT::' + json.dumps(run_headline(%d, tag='scale%d_r%d', n_convs=%d, avg_turns=%f)), flush=True); "
        "ray.shutdown(); import os as _o; _o._exit(0)"
        % (os.path.dirname(os.path.abspath(__file__)), n, n, n, rep, SCALE_CONVS, SCALE_TURNS)
    )
    # one retry behind a bounded timeout: a Ray worker-pool startup crash
    # (observed rarely in this sandbox: "workers ... have not registered
    # within the timeout") hangs the leg forever; killing and retrying in a
    # fresh process recovers, and a hung leg must not stall the whole sweep.
    # The timeout stays at the original 3000 s (a healthy leg is 30-250 s,
    # the hang is forever): this VM slows 1.8-3.5x in waves, so a tighter
    # bound would kill a slow-but-healthy leg and re-run it under the same
    # degraded conditions.
    for attempt in (0, 1):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=3000,
            )
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"leg num_cpus={n} rep={rep} timed out (attempt {attempt})\n")
            continue
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT::")]
        if line:
            return json.loads(line[0][len("RESULT::"):])
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
    raise RuntimeError(f"scaling run at num_cpus={n} failed twice")


def main_scaling() -> None:
    """Each leg runs REPEATS times in fresh processes, interleaved
    (lo, hi, lo, hi, ...) to decorrelate machine noise; the per-leg
    throughput is the MAX over repeats. On a shared/noisy VM, interference
    only ever slows a run down, so best-of-N is the consistent estimator of
    the true (uncontended) throughput at each CPU count — a single-sample
    ratio instead mixes one leg's noise into the other's signal. All raw
    runs are reported alongside the best-of efficiency."""
    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    repeats = int(os.environ.get("GRAFT_SCALE_REPEATS", "2"))
    ensure_bench_corpus(SCALE_CONVS, SCALE_TURNS)  # generate before timing
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    for rep in range(repeats):
        for n in (lo, hi):
            runs[n].append(_scaling_leg(n, rep))
    best = {n: max(rs, key=lambda r: r["turns_per_sec"]) for n, rs in runs.items()}
    tp_lo, tp_hi = best[lo]["turns_per_sec"], best[hi]["turns_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "efficiency",
                "lo": best[lo],
                "hi": best[hi],
                "throughput_lo_turns_per_sec": tp_lo,
                "throughput_hi_turns_per_sec": tp_hi,
                "cpus": [lo, hi],
                "repeats": repeats,
                "all_runs": {
                    str(n): [r["turns_per_sec"] for r in rs]
                    for n, rs in runs.items()
                },
            }
        )
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()
    if args.scaling:
        main_scaling()
    else:
        main_single()
