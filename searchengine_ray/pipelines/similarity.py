"""Similarity search over the ``embeddings`` table (vec_id, embedding:
list<float>[64], label).

- ``knn_cosine``: brute-force cosine top-k against a broadcast query vector —
  numpy matmul per batch, per-batch local top-k, driver merges k·n_batches
  rows (never the full corpus). The scale path for a *batch* of queries is
  the same shape with a query *matrix* broadcast via ``ray.put``.
- ``lsh_knn``: random-hyperplane LSH variant — probes only the query's
  bucket (plus multiprobe neighbors), demonstrating the sublinear path.
- ``embedding_neardup``: all-pairs cosine ≥ threshold via blocked matmul
  against the broadcast normalized matrix (embedding-cosine near-dup).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from searchengine_ray.pipelines.fulltext import _round_vec


def read_embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _embedding_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = t["vec_id"].to_numpy()
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, mat


def _query_vector(sf_dir: str, query_vec_id: int) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", query_vec_id)],
    )
    if t.num_rows == 0:
        raise KeyError(f"vec_id {query_vec_id} not found")
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


def knn_cosine(sf_dir: str, query_vec_id: int = 0, k: int = 10):
    """(rank, vec_id, sim_r): top-k by cosine to the query vector; ties by
    vec_id asc; rounded 4 dp before ranking (mirrors the SQL oracle)."""
    q = _query_vector(sf_dir, query_vec_id)
    qn = np.sqrt((q * q).sum())

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        m = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        sims = (m @ q) / (np.sqrt((m * m).sum(axis=1)) * qn)
        keep = min(k, sims.size)
        part = np.argpartition(-sims, keep - 1)[:keep]
        return pa.table(
            {
                "vec_id": pa.array(ids[part], type=pa.int64()),
                "sim": pa.array(sims[part], type=pa.float64()),
            }
        )

    import pandas as pd

    cand = (
        read_embeddings(sf_dir)
        .map_batches(local_topk, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    cand["sim_r"] = _round_vec(cand["sim"].to_numpy())
    cand = cand.sort_values(["sim_r", "vec_id"], ascending=[False, True], kind="stable").head(k)
    cand = cand.reset_index(drop=True)
    cand["rank"] = cand.index.astype("int64")
    return cand[["rank", "vec_id", "sim_r"]]


# --- LSH-bucketed ANN (scale path) ----------------------------------------

_LSH_BITS = 8


def _hyperplanes(dim: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((_LSH_BITS, dim))


def _bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes.T) > 0
    return (bits * (1 << np.arange(_LSH_BITS))).sum(axis=1).astype(np.int64)


def lsh_assignments(sf_dir: str):
    """(vec_id, bucket) for every vector — the BUILD side of the LSH index
    (at scale: write partitioned by bucket; queries then read only their
    probe buckets). Hyperplanes are seeded constants broadcast via closure;
    assignment is one vectorized ``map_batches`` pass."""
    import pyarrow.parquet as pq

    dim = len(
        pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
        )["embedding"][0].as_py()
    )
    planes = _hyperplanes(dim)

    def assign(batch: pa.Table) -> pa.Table:
        m = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "bucket": pa.array(_bucket_of(m, planes), type=pa.int64()),
            }
        )

    return read_embeddings(sf_dir).map_batches(assign, batch_format="pyarrow", batch_size=4096)


def lsh_knn(sf_dir: str, query_vec_id: int = 0, k: int = 10, multiprobe: int = 1):
    """Approximate top-k: random-hyperplane bucket + Hamming-≤multiprobe
    neighbor buckets only. Returns (rank, vec_id, sim_r, probed)."""
    q = _query_vector(sf_dir, query_vec_id)
    ids, mat = _embedding_matrix(sf_dir)
    planes = _hyperplanes(mat.shape[1])
    buckets = _bucket_of(mat, planes)
    qb = int(_bucket_of(q[None, :], planes)[0])
    probe = {qb}
    if multiprobe >= 1:
        probe |= {qb ^ (1 << i) for i in range(_LSH_BITS)}
    mask = np.isin(buckets, list(probe))
    sub_ids, sub = ids[mask], mat[mask]
    qn = np.sqrt((q * q).sum())
    sims = (sub @ q) / (np.sqrt((sub * sub).sum(axis=1)) * qn)
    sims_r = _round_vec(sims)
    order = np.lexsort((sub_ids, -sims_r))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(order)), type=pa.int64()),
            "vec_id": pa.array(sub_ids[order], type=pa.int64()),
            "sim_r": pa.array(sims_r[order], type=pa.float64()),
            "probed": pa.array([int(mask.sum())] * len(order), type=pa.int64()),
        }
    )


# --- IVF ANN (coarse k-means quantizer; the other scale path) -------------


def _kmeans_cosine(mat_norm: np.ndarray, k: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means on L2-normalized vectors."""
    rng = np.random.default_rng(seed)
    cent = mat_norm[rng.choice(mat_norm.shape[0], size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(mat_norm @ cent.T, axis=1)
        for j in range(k):
            members = mat_norm[assign == j]
            if members.size:
                c = members.sum(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    cent[j] = c / n
    return cent


def ivf_train_distributed(
    sf_dir: str, nlist: int = 16, iters: int = 8, seed: int = 42
) -> np.ndarray:
    """Spherical k-means trained as MAP-REDUCE Lloyd iterations: each pass
    is one ``map_batches`` over the corpus emitting per-centroid partial
    (vector-sum, count) rows with the current centroids broadcast via
    ``ray.put``; the driver reduces ~nlist tiny partials and renormalizes.
    The corpus is never collected — this is the 100-TB training shape
    (deterministic init from the first batch's rows, fixed seed)."""
    import pyarrow.parquet as pq
    import ray

    # deterministic init: nlist rows sampled (seeded) from the FIRST file's
    # footer-known row count — tiny read, no full collect
    first = os.path.join(sf_dir, "embeddings.parquet")
    n_first = pq.read_metadata(first).num_rows
    rng = np.random.default_rng(seed)
    init_rows = np.sort(rng.choice(n_first, size=min(nlist, n_first), replace=False))
    t = pq.read_table(first, columns=["embedding"])
    cent = np.asarray(
        [t["embedding"][int(i)].as_py() for i in init_rows], dtype=np.float64
    )
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial_sums(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            m = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
            m = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
            assign = np.argmax(m @ c.T, axis=1)
            ks, sums, counts = [], [], []
            for k in np.unique(assign):
                members = m[assign == k]
                ks.append(int(k))
                sums.append(members.sum(axis=0).tolist())
                counts.append(int(members.shape[0]))
            return pa.table(
                {
                    "k": pa.array(ks, type=pa.int32()),
                    "vsum": pa.array(sums, type=pa.list_(pa.float64())),
                    "n": pa.array(counts, type=pa.int64()),
                }
            )

        parts = (
            read_embeddings(sf_dir)
            .map_batches(partial_sums, batch_format="pyarrow", batch_size=4096)
            .to_pandas()
        )
        new = cent.copy()
        for k, grp in parts.groupby("k"):
            s = np.sum(np.stack(grp["vsum"].to_numpy()), axis=0)
            nrm = np.linalg.norm(s)
            if nrm > 0:
                new[int(k)] = s / nrm
        cent = new
    return cent


def ivf_assignments(sf_dir: str, nlist: int = 16):
    """(vec_id, list_id) for every vector: centroids trained DISTRIBUTED
    (``ivf_train_distributed`` — map-reduce Lloyd passes), assignment via
    ``map_batches`` with the centroid matrix broadcast once."""
    import ray

    cent = ivf_train_distributed(sf_dir, nlist)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        m = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "list_id": pa.array(np.argmax(m @ c.T, axis=1).astype(np.int32)),
            }
        )

    return read_embeddings(sf_dir).map_batches(assign, batch_format="pyarrow", batch_size=4096)


def ivf_knn(sf_dir: str, query_vec_id: int = 0, k: int = 10, nlist: int = 16, nprobe: int = 4):
    """Approximate top-k: probe the ``nprobe`` centroid lists nearest to the
    query, brute-force only their members. Returns
    (rank, vec_id, sim_r, probed)."""
    q = _query_vector(sf_dir, query_vec_id)
    ids, mat = _embedding_matrix(sf_dir)
    norm = mat / np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    cent = _kmeans_cosine(norm, nlist)
    assign = np.argmax(norm @ cent.T, axis=1)
    qn = q / np.sqrt((q * q).sum())
    probe = np.argsort(-(cent @ qn))[:nprobe]
    mask = np.isin(assign, probe)
    sub_ids, sub = ids[mask], norm[mask]
    sims_r = _round_vec(sub @ qn)
    order = np.lexsort((sub_ids, -sims_r))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(order)), type=pa.int64()),
            "vec_id": pa.array(sub_ids[order], type=pa.int64()),
            "sim_r": pa.array(sims_r[order], type=pa.float64()),
            "probed": pa.array([int(mask.sum())] * len(order), type=pa.int64()),
        }
    )


def embedding_neardup(sf_dir: str, threshold: float = 0.95):
    """All-pairs cosine ≥ threshold (doc_a < doc_b): blocked matmul of each
    batch against the broadcast L2-normalized matrix."""
    import ray

    ids, mat = _embedding_matrix(sf_dir)
    norm = mat / np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    ref = ray.put((ids, norm))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_norm = ray.get(ref)
        bids = batch["vec_id"].to_numpy(zero_copy_only=False)
        m = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        m = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
        sims = m @ all_norm.T
        rows_a, rows_b, vals = [], [], []
        for i in range(bids.size):
            hits = np.nonzero((sims[i] >= threshold) & (all_ids > bids[i]))[0]
            for j in hits:
                rows_a.append(int(bids[i]))
                rows_b.append(int(all_ids[j]))
                vals.append(sims[i, j])
        return pa.table(
            {
                "doc_a": pa.array(rows_a, type=pa.int64()),
                "doc_b": pa.array(rows_b, type=pa.int64()),
                "sim_r": pa.array(
                    _round_vec(np.asarray(vals, dtype=np.float64)), type=pa.float64()
                ),
            }
        )

    import pandas as pd

    out = (
        read_embeddings(sf_dir)
        .map_batches(pairs, batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    if out.empty:  # Ray drops the schema when every block is empty
        out = pd.DataFrame(
            {
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "sim_r": pd.Series(dtype="float64"),
            }
        )
    return out
