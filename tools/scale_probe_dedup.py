"""10× scale probe for the dedup/clustering tail (VERDICT r4 item 5).

Synthesizes a deterministic 10× documents/embeddings corpus from the sf0.01
testdata — the 2M-order graph-probe discipline applied to the banding
family — and times the four flagged entries at 1× and 10×:

* ``dedup_cluster``        (MinHash-LSH + min-label-propagation components)
* ``cosine_shingle_join``  (df-capped sparse cosine inverted-index join)
* ``ngram_jaccard``        (banded LSH + bitmap-Jaccard verify)
* ``semantic_dedup``       (embedding near-dup anti-join)

Corpus construction (pure arithmetic on the base tables — reproducible):

* 10 replicas of every base doc; replica 0 is the original. Replicas r ≥ 1
  mutate the tail of the text with replica-salted tokens → a dense
  near-dup population (every base doc becomes a ~10-member near-dup
  cluster), the worst realistic load for banding + verify.
* every 50th base doc's replicas r ≥ 1 all share ONE boilerplate text →
  a planted ~90-doc identical-text HOT BUCKET (the grid-cell-deferral
  stress; mirrors web boilerplate at scale).
* embeddings: 10 replicas with replica-scaled deterministic perturbation
  (±1e-3 · r on a per-dim sign pattern) — near-identical vectors across
  replicas keep the near-dup threshold path hot.

Usage::

    python tools/scale_probe_dedup.py [--cpus 32] [--sf /root/testdata/sf0.01]

Prints one wall-time table; paste the numbers into BASELINE.md.
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BOILER = (
    "standard footer boilerplate terms of service privacy policy all "
    "rights reserved contact support subscribe newsletter follow us"
)


def build_corpus(sf: str, out_dir: str, reps: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(sf, "documents.parquet")).to_pandas()
    n = len(docs)
    frames = []
    for r in range(reps):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + n * r
        if r > 0:
            base = docs["text"].fillna("")
            mutated = base + f" variant token vr{r} salt{r * 7919}"
            hot = (docs["doc_id"] % 50 == 0)
            d["text"] = np.where(hot, BOILER, mutated)
        frames.append(d)
    import pandas as pd

    big = pd.concat(frames, ignore_index=True)
    big["n_chars"] = big["text"].fillna("").str.len().astype("int64")
    pq.write_table(
        pa.Table.from_pandas(big, preserve_index=False),
        os.path.join(out_dir, "documents.parquet"),
    )

    emb = pq.read_table(os.path.join(sf, "embeddings.parquet")).to_pandas()
    m = len(emb)
    vecs = np.array(emb["embedding"].tolist(), dtype=np.float32)
    dim = vecs.shape[1]
    sign = np.where(np.arange(dim) % 2 == 0, 1.0, -1.0).astype(np.float32)
    eframes = []
    for r in range(reps):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + m * r
        pert = vecs + (1e-3 * r) * sign
        e["embedding"] = list(pert)
        eframes.append(e)
    ebig = pd.concat(eframes, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(ebig, preserve_index=False),
        os.path.join(out_dir, "embeddings.parquet"),
    )


def run_probe(sf: str, cpus: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from searchengine_ray.pipelines import dedup, similarity

    entries = {
        "dedup_cluster": dedup.dedup_cluster,
        "cosine_shingle_join": dedup.cosine_shingle_join,
        "ngram_jaccard": dedup.ngram_jaccard_dups,
        "semantic_dedup": lambda s: similarity.semantic_dedup(s, 0.95, plant=True),
    }
    out = {}
    for name, fn in entries.items():
        t0 = time.monotonic()
        res = fn(sf)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        wall = time.monotonic() - t0
        out[name] = {"wall_sec": round(wall, 2), "rows": int(len(res))}
        print(f"{name:24s} {wall:7.2f} s  rows={len(res)}")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default="/tmp/dedup_probe_10x")
    ap.add_argument("--skip-build", action="store_true")
    ns = ap.parse_args()

    if not ns.skip_build:
        print("building 10x corpus at", ns.out)
        build_corpus(ns.sf, ns.out)

    print(f"--- 1x ({ns.sf}) ---")
    base = run_probe(ns.sf, ns.cpus)
    print(f"--- 10x ({ns.out}) ---")
    big = run_probe(ns.out, ns.cpus)
    print(json.dumps({"1x": base, "10x": big}))
