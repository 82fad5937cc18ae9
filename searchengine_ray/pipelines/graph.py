"""Graph algorithms over Ray Data on the bipartite customer→supplier
purchase graph: PageRank in EXACT integer fixed-point
(``pagerank_purchases``), BFS shortest hops with data-dependent
termination (``purchase_hops``), and co-purchase pair counting
(``supplier_affinity``) — all over one shared distinct-edge builder.

The iterative entries cover the algorithm family none of the
relational/dedup entries do: synchronous BSP supersteps expressed as ONE
fused co-partition exchange per iteration over the shared
``(q, side, k, a[, b])`` shuffle-row machinery from ``relational.py``
(the same per-round Dataset-materialize discipline as dedup's
connected-components label propagation). PageRank runs a FIXED iteration
count; BFS runs until the frontier drains (the per-round driver scalar
is one newly-settled count).

Why integer fixed-point: classic float PageRank is not oracle-checkable —
summation order perturbs the low bits, so engine-vs-SQL hashes flip on
rounding boundaries. Here every quantity is an int64 (ranks scaled by
10¹²) and every division is a FLOOR division, so the recurrence

    R₀(v)    = SCALE // N
    share_t  = (Σ_{outdeg(u)=0} R_t(u)) // N
    contrib  = R_t(src) // outdeg(src)            per edge
    R_{t+1}(v) = (15·SCALE) // (100·N)
               + (85 · (Σ_in contrib + share_t)) // 100

is exactly reproducible by DuckDB's ``//`` BIGINT division — the oracle
unrolls the same ITERS iterations as CTEs and matches bit-for-bit.
Damping 0.85 appears as the 85/100 integer pair; mass lost to floors is
identical on both sides by construction (everything is positive, so
floor == trunc on both engines).

Scale shape — the BSP superstep fusion: node v's rank update and v's
OUTGOING contributions both live in v's hash partition (ranks partition
by hash(node), edges by hash(src), one shared formula), so each
iteration is a single union(nodes, edges, contrib-partials) →
``groupby(q)`` exchange whose map_groups (a) completes the inflow sums,
(b) applies the recurrence, and (c) emits the NEXT iteration's per-dst
contribution partials plus a per-partition dangling-mass row. The only
driver-side values per iteration are the ≤|partitions| dangling partials
(the global share scalar) — rank and edge state never leaves the
cluster. Edges re-flow through the union each iteration; at 100 TB the
edge partitions would pin in an actor pool instead (the documented
ST-state pattern), with the same superstep semantics.

Edge build: orders ⋈ lineitem on the orderkey co-partition (map-side
pair dedup), then ONE src-hash exchange that both finishes the global
pair distinct (every copy of a (cust, supp) pair shares its src hash)
and counts out-degree partition-locally. A hot customer's edges
concentrate in one partition, bounded by its distinct-supplier count —
the same bound the out-degree itself requires.

Node encoding: customer c → 2c, supplier s → 2s+1 (disjoint id spaces).
Customers always have out-edges (they exist only as edge sources), so
the dangling set is exactly the odd nodes — both sides use ``node % 2``.

Reference anchor: the reference has no graph operator (Java crawl/index
only); this extends the engine the way SURVEY §2's training-data ops do.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from searchengine_ray.pipelines.relational import (
    _exchange_empty,
    _exchange_rows,
    _hash_partition,
    _sorted_probe,
    _split_exchange_group,
)
from searchengine_ray.sources import read_parquet_clean

PR_SCALE = 10**12  # rank fixed-point: 1.0 of total mass = 10^12
PR_DAMP_NUM = 85  # damping 0.85 as an exact integer pair
PR_DAMP_DEN = 100
PR_ITERS = 5

# shuffle-row side tags inside the fused superstep exchange
_SIDE_NODE = 0  # k = node, a = 0 (static node list)
_SIDE_EDGE = 1  # k = src,  a = dst, b = outdeg (static edge list)
_SIDE_CONTRIB = 2  # k = dst, a = inflow partial (produced per iteration)
_SIDE_DANGLING = 3  # k = -1, a = partition dangling-mass partial
_SIDE_RANK = 4  # k = node, a = R_t (the published state)


def _keep_side(tag: int):
    """Batch filter for one exchange-row side tag (shared by the
    iterative entries' per-round state projections)."""
    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["side"], tag))

    return fn


# In-process memo of the materialized edge Dataset per corpus dir: the
# three purchase-graph entries (pagerank / hops / affinity) consume the
# SAME derived edge set, and a materialized Dataset is immutable — the
# first entry in a session pays the two-exchange build, the rest reuse it
# (the ensure_transcript_index discipline; a real pipeline shares the
# lineage stage the same way). Bounded: the bench session touches one
# sf_dir, tests a handful of tmp dirs. Each entry is validated before
# reuse (review r5): the memo stores the Ray session (GCS address — a
# restart strands the materialized blocks) and the input files'
# (mtime_ns, size) signature (an in-place corpus rewrite must rebuild),
# so a stale hit can never serve dead objects or old edges.
_EDGES_MEMO: dict[str, tuple] = {}
_EDGES_MEMO_MAX = 4


def _edges_memo_stamp(sf_dir: str) -> tuple:
    import ray

    sig = []
    for t in ("orders.parquet", "lineitem.parquet"):
        st_ = os.stat(os.path.join(sf_dir, t))
        sig.append((t, st_.st_mtime_ns, st_.st_size))
    return (ray.get_runtime_context().gcs_address, tuple(sig))


def _build_edges(sf_dir: str):
    """Distinct (customer, supplier) purchase edges with out-degree,
    partitioned by hash(src node): orders ⋈ lineitem on the orderkey
    co-partition with map-side pair dedup, then one src-hash exchange
    that finishes the global distinct AND counts degree locally.
    Returns a materialized Dataset of (q, src, dst, od), memoized per
    corpus dir for the session (see ``_EDGES_MEMO``)."""
    import pandas as pd

    memo_key = os.path.abspath(sf_dir)
    stamp = _edges_memo_stamp(sf_dir)
    cached = _EDGES_MEMO.get(memo_key)
    if cached is not None and cached[0] == stamp:
        return cached[1]

    def orders_side(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return _exchange_rows(ok, 0, ck)

    def lineitem_side(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # map-side pair dedup: one (order, supplier) row per batch
        u = pd.DataFrame({"ok": ok, "sk": sk}).drop_duplicates()
        return _exchange_rows(u["ok"].to_numpy(dtype=np.int64), 1,
                              u["sk"].to_numpy(dtype=np.int64))

    def join_orderkey(group: pa.Table) -> pa.Table:
        """orderkey partition → (cust, supp) pairs keyed by hash(src
        node): every duplicate of a pair lands in its src partition."""
        (ok_sorted, ck_sorted, _), (lok, lsk, _, _) = \
            _split_exchange_group(group)
        pos, hit = _sorted_probe(ok_sorted, lok)
        if not hit.any():
            return _exchange_empty(with_b=False)
        u = pd.DataFrame({"c": ck_sorted[pos[hit]],
                          "s": lsk[hit]}).drop_duplicates()
        src = u["c"].to_numpy(dtype=np.int64) * 2  # customer node
        dst = u["s"].to_numpy(dtype=np.int64) * 2 + 1  # supplier node
        return _exchange_rows(src, 1, dst)

    def distinct_outdeg(group: pa.Table) -> pa.Table:
        """Global pair distinct + local out-degree: every edge (and every
        duplicate) of a src is in this partition."""
        src = group["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = group["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
        src = u["src"].to_numpy(dtype=np.int64)
        dst = u["dst"].to_numpy(dtype=np.int64)
        usrc, inv, deg = np.unique(src, return_inverse=True,
                                   return_counts=True)
        return pa.table({"q": pa.array(_hash_partition(src)),
                         "src": pa.array(src), "dst": pa.array(dst),
                         "od": pa.array(deg[inv])})

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    ).map_batches(orders_side, batch_format="pyarrow")
    items = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey"],
    ).map_batches(lineitem_side, batch_format="pyarrow", batch_size=8192)
    edges = (orders.union(items).groupby("q")
             .map_groups(join_orderkey, batch_format="pyarrow")
             .groupby("q")
             .map_groups(distinct_outdeg, batch_format="pyarrow"))
    edges = edges.materialize()
    # compact: map_groups emits one tiny block per partition group, and
    # the iteration loop re-unions this dataset every superstep — block
    # fragmentation, not data volume, dominated the sort cost before this
    edges = edges.repartition(_state_blocks(edges.count())).materialize()
    if len(_EDGES_MEMO) >= _EDGES_MEMO_MAX:
        _EDGES_MEMO.pop(next(iter(_EDGES_MEMO)))
    _EDGES_MEMO[memo_key] = (stamp, edges)
    return edges


def _state_blocks(rows: int) -> int:
    """Block count for the iteration-state datasets: enough blocks for
    the cluster's parallelism, ~1M rows (≈40 MB of shuffle-row int64s)
    per block at scale, and never the one-block-per-group fragmentation
    the exchanges would otherwise accumulate."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(8, cpus, rows // 1_000_000)


def pagerank_purchases(sf_dir: str, iters: int = PR_ITERS):
    """(entity, key, rank_scaled): integer fixed-point PageRank over the
    distinct customer→supplier purchase graph after ``iters`` synchronous
    iterations — rank_scaled is the exact int64 R_iters(v) of the module
    recurrence (mass × 10¹²), matching the unrolled-CTE SQL oracle
    bit-for-bit. One row per graph node, customers and suppliers."""
    empty = pa.table({"entity": pa.array([], type=pa.string()),
                      "key": pa.array([], type=pa.int64()),
                      "rank_scaled": pa.array([], type=pa.int64())})
    edges = _build_edges(sf_dir)
    empty = empty.to_pandas()

    def node_rows(batch: pa.Table) -> pa.Table:
        both = np.concatenate([
            batch["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)])
        u = np.unique(both)
        return pa.table({"q": pa.array(_hash_partition(u)),
                         "node": pa.array(u)})

    def node_distinct(group: pa.Table) -> pa.Table:
        u = np.unique(group["node"].to_numpy(
            zero_copy_only=False).astype(np.int64))
        return pa.table({"q": pa.array(_hash_partition(u)),
                         "node": pa.array(u)})

    def odd_count(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"c": pa.array([int((node % 2 == 1).sum())],
                                       type=pa.int64())})

    nodes = (edges.map_batches(node_rows, batch_format="pyarrow")
             .groupby("q").map_groups(node_distinct, batch_format="pyarrow")
             ).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return empty
    nodes = nodes.repartition(_state_blocks(n_nodes)).materialize()
    n_odd = sum(r["c"] for r in
                nodes.map_batches(odd_count, batch_format="pyarrow")
                .take_all())
    base = (15 * PR_SCALE) // (100 * n_nodes)
    r0 = PR_SCALE // n_nodes

    node_side = nodes.map_batches(
        lambda b: _exchange_rows(
            b["node"].to_numpy(zero_copy_only=False).astype(np.int64),
            _SIDE_NODE, np.zeros(b.num_rows, dtype=np.int64),
            np.zeros(b.num_rows, dtype=np.int64)),
        batch_format="pyarrow")

    def edge_side(batch: pa.Table) -> pa.Table:
        # k = src, a = dst, b = outdeg (q already = hash(src))
        return _exchange_rows(
            batch["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            _SIDE_EDGE,
            batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["od"].to_numpy(zero_copy_only=False).astype(np.int64))

    def contrib_rows(dst: np.ndarray, c: np.ndarray) -> pa.Table:
        """Per-dst combined contribution partials, keyed for the NEXT
        superstep's exchange."""
        ud, inv = np.unique(dst, return_inverse=True)
        partial = np.zeros(ud.size, dtype=np.int64)
        np.add.at(partial, inv, c)
        return _exchange_rows(ud, _SIDE_CONTRIB, partial,
                              np.zeros(ud.size, dtype=np.int64))

    def bootstrap_contribs(batch: pa.Table) -> pa.Table:
        # iteration-1 inflow comes from the uniform R0 — computable
        # map-side from the edge partitions, no extra exchange
        dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = batch["od"].to_numpy(zero_copy_only=False).astype(np.int64)
        return contrib_rows(dst, r0 // od)

    def superstep(emit_contribs: bool, share: int):
        def step(group: pa.Table) -> pa.Table:
            """Fused BSP superstep on one node partition: complete the
            inflow sums, apply the recurrence, emit next contribs +
            the partition's dangling-mass partial + the rank rows."""
            side = group["side"].to_numpy(zero_copy_only=False)
            k = group["k"].to_numpy(zero_copy_only=False).astype(np.int64)
            a = group["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            n_m = side == _SIDE_NODE
            node = np.sort(k[n_m])
            c_m = side == _SIDE_CONTRIB
            inflow = np.zeros(node.size, dtype=np.int64)
            pos, hit = _sorted_probe(node, k[c_m])
            np.add.at(inflow, pos[hit], a[c_m][hit])
            r_new = base + (PR_DAMP_NUM * (inflow + share)) // PR_DAMP_DEN
            out = [_exchange_rows(node, _SIDE_RANK, r_new,
                                  np.zeros(node.size, dtype=np.int64)),
                   _exchange_rows(np.full(1, -1, dtype=np.int64),
                                  _SIDE_DANGLING,
                                  np.asarray([int(r_new[node % 2 == 1]
                                                  .sum())], dtype=np.int64),
                                  np.zeros(1, dtype=np.int64))]
            if emit_contribs:
                e_m = side == _SIDE_EDGE
                src, dst = k[e_m], a[e_m]
                od = group["b"].to_numpy(
                    zero_copy_only=False).astype(np.int64)[e_m]
                spos, shit = _sorted_probe(node, src)
                out.append(contrib_rows(dst[shit],
                                        r_new[spos[shit]] // od[shit]))
            return pa.concat_tables(out)

        return step

    # t = 0 state: uniform ranks, map-side bootstrap contribs
    share = (n_odd * r0) // n_nodes
    contribs = edges.map_batches(bootstrap_contribs, batch_format="pyarrow")
    edge_flow = edges.map_batches(edge_side, batch_format="pyarrow")
    state = None
    state_blocks = _state_blocks(2 * n_nodes)
    for t in range(iters):
        flow = node_side.union(contribs)
        if t + 1 < iters:
            flow = flow.union(edge_flow)
        state = (flow.groupby("q")
                 .map_groups(superstep(t + 1 < iters, share),
                             batch_format="pyarrow")
                 .repartition(state_blocks)).materialize()
        if t + 1 < iters:
            d_mass = sum(
                r["a"] for r in
                state.map_batches(_keep_side(_SIDE_DANGLING),
                                  batch_format="pyarrow").take_all())
            share = d_mass // n_nodes
            contribs = state.map_batches(_keep_side(_SIDE_CONTRIB),
                                         batch_format="pyarrow")

    def publish(batch: pa.Table) -> pa.Table:
        batch = _keep_side(_SIDE_RANK)(batch)
        node = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        ent = np.where(node % 2 == 0, "customer", "supplier")
        return pa.table({"entity": pa.array(ent, type=pa.string()),
                         "key": pa.array(node // 2),
                         "rank_scaled": pa.array(r)})

    out = state.map_batches(publish, batch_format="pyarrow").to_pandas()
    return out.sort_values(["entity", "key"]).reset_index(drop=True)


AFFINITY_TOPK = 20
_PAIR_SHIFT = 32  # suppkey < 2^31 at any TPC-H scale factor; pair packs
# Hot-customer escape hatch: a customer with more than AFFINITY_DEGREE_CAP
# distinct suppliers does NOT enumerate its C(d, 2) pairs in one task —
# its (sorted) supplier list splits into ⌈d / CAP⌉ chunks and each grid
# cell (i, j), i ≤ j, becomes one deferred unit of ≤ CAP² pair work,
# salted across partitions by hash(customer, i, j). This is the dedup
# grid-cell deferral discipline (dedup.py hot-bucket split) applied to
# the butterfly join: per-task pair work ≤ max(C(CAP, 2), CAP²) by
# construction, regardless of the degree distribution. Cell metadata is
# cheap relative to the unavoidable pair volume: a degree-d hot customer
# ships each supplier id in ⌈d/CAP⌉ cells ⇒ O(d²/CAP) ints, a 1/CAP
# fraction of the d²/2 pairs stage 2 must enumerate anyway.
#
# Cap sizing: the unit of deferral should be the LARGEST pair volume one
# vectorized task handles comfortably, not the smallest — 4096 bounds a
# cell at ≤ 16.7M int64 pairs (~270 MB of transient arrays, well inside
# a worker heap), while a tighter cap (64 was the first draft, 1024 the
# second) pushes merely-heavy customers through the deferral exchange
# and pays a full extra shuffle + cell fan-out for skew one pandas merge
# handles fine (C(4096, 2) ≈ 8.4M pairs ≈ milliseconds). Only genuine
# mega-degree keys — the r5 200k-order Zipf probe's 9.8k-degree hot
# customer, or a boilerplate-buyer at web scale — clear 4096 and
# activate the split, and the probe verifies the split's top-k EXACTLY
# against a full-scale DuckDB brute force (tools/scale_probe_graph.py).
AFFINITY_DEGREE_CAP = 4096
_AFF_MIX = 0x9E3779B97F4A7C15  # cell-salt mixer (the splitmix64 increment)


def _affinity_stage1(df, degree_cap: int):
    """Split one customer-co-located (c, s) frame into direct pair
    partials (light customers) and deferred grid cells (hot customers).
    Pure pandas/numpy so the adversarial tests can drive it without Ray.
    Returns an Arrow table with the unified stage-1 exchange schema
    (q, tag, k, n, sa, sb): tag 0 = combined pair partial keyed by the
    packed pair (q = pair-hash), tag 1 = deferred cell (sa/sb = the two
    sorted supplier chunks, sb empty ⇒ within-chunk cell, q = salted
    cell hash)."""
    import pandas as pd

    deg = df.groupby("c")["s"].transform("size")
    light = df[deg <= degree_cap]
    hot = df[deg > degree_cap]

    qs: list[np.ndarray] = []
    tags: list[np.ndarray] = []
    ks: list[np.ndarray] = []
    ns: list[np.ndarray] = []
    sas: list = []
    sbs: list = []

    if not light.empty:
        m = light.merge(light, on="c")
        m = m[m["s_x"] < m["s_y"]]
        if not m.empty:
            g = m.groupby(["s_x", "s_y"], as_index=False).size()
            key = (g["s_x"].to_numpy(dtype=np.int64) << _PAIR_SHIFT) \
                | g["s_y"].to_numpy(dtype=np.int64)
            qs.append(_hash_partition(key))
            tags.append(np.zeros(key.size, dtype=np.int64))
            ks.append(key)
            ns.append(g["size"].to_numpy(dtype=np.int64))
            sas.extend([None] * key.size)
            sbs.extend([None] * key.size)

    if not hot.empty:
        for c, sub in hot.groupby("c"):
            s = np.sort(sub["s"].to_numpy(dtype=np.int64))
            chunks = [s[i:i + degree_cap]
                      for i in range(0, s.size, degree_cap)]
            ncells = 0
            cell_q = []
            for i in range(len(chunks)):
                for j in range(i, len(chunks)):
                    salt = (int(c) * _AFF_MIX
                            + i * len(chunks) + j) & ((1 << 63) - 1)
                    cell_q.append(int(_hash_partition(
                        np.array([salt], dtype=np.int64))[0]))
                    sas.append(chunks[i])
                    sbs.append(chunks[j] if j > i else None)
                    ncells += 1
            qs.append(np.array(cell_q, dtype=np.int64))
            tags.append(np.ones(ncells, dtype=np.int64))
            ks.append(np.full(ncells, int(c), dtype=np.int64))
            ns.append(np.zeros(ncells, dtype=np.int64))

    if not qs:
        z = pa.array([], type=pa.int64())
        zl = pa.array([], type=pa.list_(pa.int64()))
        return pa.table({"q": z, "tag": z, "k": z, "n": z,
                         "sa": zl, "sb": zl})
    return pa.table({
        "q": pa.array(np.concatenate(qs)),
        "tag": pa.array(np.concatenate(tags)),
        "k": pa.array(np.concatenate(ks)),
        "n": pa.array(np.concatenate(ns)),
        "sa": pa.array(sas, type=pa.list_(pa.int64())),
        "sb": pa.array(sbs, type=pa.list_(pa.int64())),
    })


def _affinity_resolve(group: pa.Table) -> pa.Table:
    """Stage 2: enumerate each deferred cell's pairs (≤ CAP² vectorized
    pair work per cell row; the Python loop is over CELLS, not pairs),
    pass direct partials through, and map-side-combine everything into
    (q, k, n) partials keyed by the packed pair for the total exchange."""
    import pandas as pd

    tag = group["tag"].to_numpy(zero_copy_only=False).astype(np.int64)
    keys: list[np.ndarray] = []
    cnts: list[np.ndarray] = []
    direct = np.flatnonzero(tag == 0)
    if direct.size:
        keys.append(group["k"].take(pa.array(direct))
                    .to_numpy(zero_copy_only=False).astype(np.int64))
        cnts.append(group["n"].take(pa.array(direct))
                    .to_numpy(zero_copy_only=False).astype(np.int64))
    cells = np.flatnonzero(tag == 1)
    if cells.size:
        # zero-copy cell access: flatten the list columns ONCE and slice
        # numpy views by offset — per-element as_py() conversion was the
        # hot-path cost at probe scale (Python object churn per supplier)
        sa_col = group["sa"].take(pa.array(cells)).combine_chunks()
        sb_col = group["sb"].take(pa.array(cells)).combine_chunks()
        sa_flat = sa_col.flatten().to_numpy(zero_copy_only=False)
        sb_flat = sb_col.flatten().to_numpy(zero_copy_only=False)
        sa_off = sa_col.offsets.to_numpy(zero_copy_only=False)
        sb_off = sb_col.offsets.to_numpy(zero_copy_only=False)
        sb_null = pc.is_null(sb_col).to_numpy(zero_copy_only=False)
        for i in range(len(cells)):
            a = sa_flat[sa_off[i]:sa_off[i + 1]]
            if sb_null[i]:  # within-chunk cell: pairs inside a
                ia, ib = np.triu_indices(a.size, k=1)
                px, py = a[ia], a[ib]
            else:  # cross cell: every a < every b (chunks sorted by rank)
                b = sb_flat[sb_off[i]:sb_off[i + 1]]
                px = np.repeat(a, b.size)
                py = np.tile(b, a.size)
            if px.size:
                keys.append((px << _PAIR_SHIFT) | py)
                cnts.append(np.ones(px.size, dtype=np.int64))
    if not keys:
        z = pa.array([], type=pa.int64())
        return pa.table({"q": z, "k": z, "n": z})
    g = pd.DataFrame({"k": np.concatenate(keys),
                      "n": np.concatenate(cnts)}) \
        .groupby("k", as_index=False)["n"].sum()
    key = g["k"].to_numpy(dtype=np.int64)
    return pa.table({"q": pa.array(_hash_partition(key)),
                     "k": pa.array(key),
                     "n": pa.array(g["n"].to_numpy(dtype=np.int64))})


def supplier_affinity(sf_dir: str, k: int = AFFINITY_TOPK,
                      degree_cap: int = AFFINITY_DEGREE_CAP):
    """(supp_a, supp_b, n_customers): the ``k`` supplier pairs sharing the
    most distinct purchasing customers, ties to the smaller (a, b) — the
    bipartite co-occurrence / butterfly self-join (graph family #2: the
    pairwise-enumeration shape the dedup verify joins use, applied to the
    purchase graph instead of signatures).

    Scale shape: the distinct customer→supplier edges come co-located by
    hash(customer) from ``_build_edges``. Stage 1 splits by per-customer
    distinct-supplier degree: customers with d ≤ ``degree_cap`` self-merge
    locally (pair volume Σ_c C(d_c, 2) with d_c bounded) and their pair
    counts combine map-side; customers above it emit ⌈d/CAP⌉²/2 deferred
    grid cells salted by hash(customer, i, j) — so a mega-degree customer
    spreads its quadratic pair work across the cluster in ≤ CAP²-pair
    units instead of one unbounded task (the dedup hot-bucket grid-cell
    discipline; see AFFINITY_DEGREE_CAP). Stage 2 enumerates the cells
    and combines; stage 3 is ONE pair-hash exchange totaling the
    partials. Per-partition top-k under the final total order (n desc,
    a asc, b asc) collect ≤ partitions × k rows to the driver for the
    global cut — never the pair table.

    The deferral exchange is GATED on the graph's actual skew: edges
    carry the per-customer distinct degree (``od`` from
    ``_build_edges``'s one exchange), so one cheap partial-max pass
    decides up front whether any customer exceeds the cap. A
    homogeneous-degree corpus keeps the original two-exchange plan
    (defer-only-when-hot, the dedup discipline); the three-exchange
    split activates exactly when the unbounded-task risk exists."""
    import pandas as pd

    edges = _build_edges(sf_dir)
    empty = pd.DataFrame({"supp_a": pd.array([], dtype="int64"),
                          "supp_b": pd.array([], dtype="int64"),
                          "n_customers": pd.array([], dtype="int64")})

    def dmax_partial(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = batch["od"].to_numpy(zero_copy_only=False).astype(np.int64)
        # defensive: _build_edges emits only customer-src rows today
        # (src = custkey * 2, always even); the filter future-proofs the
        # gate against a bidirectional edge table
        cust = od[src % 2 == 0]
        return pa.table({"m": pa.array(
            [int(cust.max()) if cust.size else 0], type=pa.int64())})

    dmax = max((r["m"] for r in
                edges.map_batches(dmax_partial,
                                  batch_format="pyarrow").take_all()),
               default=0)

    def pair_direct(group: pa.Table) -> pa.Table:
        # no customer above the cap: the original single-task-per-customer
        # self-merge, keyed by pair hash for the one total exchange
        df = pd.DataFrame({
            "c": group["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            "s": group["dst"].to_numpy(
                zero_copy_only=False).astype(np.int64) >> 1,
        })
        m = df.merge(df, on="c")
        m = m[m["s_x"] < m["s_y"]]
        if m.empty:
            z = pa.array([], type=pa.int64())
            return pa.table({"q": z, "k": z, "n": z})
        g = m.groupby(["s_x", "s_y"], as_index=False).size()
        key = (g["s_x"].to_numpy(dtype=np.int64) << _PAIR_SHIFT) \
            | g["s_y"].to_numpy(dtype=np.int64)
        return pa.table({"q": pa.array(_hash_partition(key)),
                         "k": pa.array(key),
                         "n": pa.array(g["size"].to_numpy(dtype=np.int64))})

    def pair_or_defer(group: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "c": group["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            "s": group["dst"].to_numpy(
                zero_copy_only=False).astype(np.int64) >> 1,
        })
        return _affinity_stage1(df, degree_cap)

    def total_topk(group: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": group["k"].to_numpy(zero_copy_only=False).astype(np.int64),
            "n": group["n"].to_numpy(zero_copy_only=False).astype(np.int64),
        }).groupby("k", as_index=False).sum()
        df["supp_a"] = df["k"].to_numpy() >> _PAIR_SHIFT
        df["supp_b"] = df["k"].to_numpy() & ((1 << _PAIR_SHIFT) - 1)
        df = df.sort_values(["n", "supp_a", "supp_b"],
                            ascending=[False, True, True],
                            kind="stable").head(k)
        return pa.table({
            "supp_a": pa.array(df["supp_a"].to_numpy(dtype=np.int64)),
            "supp_b": pa.array(df["supp_b"].to_numpy(dtype=np.int64)),
            "n_customers": pa.array(df["n"].to_numpy(dtype=np.int64))})

    if dmax > degree_cap:
        # Split by degree so the deferral exchanges touch ONLY the hot
        # slice: a customer's edges carry its distinct degree (od), so a
        # cheap filter cleaves the corpus all-or-none per customer. Light
        # customers keep the original one-pair-exchange plan; hot
        # customers' cells + resolved pairs flow through the two extra
        # exchanges, whose volume is proportional to the SKEW, not the
        # corpus (the first draft pushed every pair partial through the
        # resolve exchange — 2× the full pair volume shuffled; probe
        # r5: 74 s → this design at the same scale).
        def _keep_light(batch: pa.Table) -> pa.Table:
            od = batch["od"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(od <= degree_cap))

        def _keep_hot(batch: pa.Table) -> pa.Table:
            od = batch["od"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(od > degree_cap))

        light_part = (edges.map_batches(_keep_light, batch_format="pyarrow")
                      .groupby("q")
                      .map_groups(pair_direct, batch_format="pyarrow"))
        hot_part = (edges.map_batches(_keep_hot, batch_format="pyarrow")
                    .groupby("q")
                    .map_groups(pair_or_defer, batch_format="pyarrow")
                    .groupby("q")
                    .map_groups(_affinity_resolve, batch_format="pyarrow"))
        partials = light_part.union(hot_part)
    else:
        partials = edges.groupby("q").map_groups(pair_direct,
                                                 batch_format="pyarrow")
    cand = (partials.groupby("q")
            .map_groups(total_topk, batch_format="pyarrow")).to_pandas()
    if cand.empty:
        return empty
    return (cand.sort_values(["n_customers", "supp_a", "supp_b"],
                             ascending=[False, True, True], kind="stable")
            .head(k).reset_index(drop=True)
            [["supp_a", "supp_b", "n_customers"]])


HOPS_MAX_ROUNDS = 16  # hard cap mirrored by the oracle's recursion guard

# BFS exchange side tags
_H_ADJ = 0  # k = a, a = b (undirected adjacency, partitioned by hash(a))
_H_DIST = 1  # k = node, a = hop distance (settled state)
_H_CAND = 2  # k = node, a = candidate distance (frontier proposals)
_H_NEW = 3  # k = -1, a = partition newly-settled count


def purchase_hops(sf_dir: str, seed_supplier: int = 0,
                  max_rounds: int = HOPS_MAX_ROUNDS):
    """(entity, key, hops): unweighted shortest-path distance from the
    seed supplier to every reachable node of the UNDIRECTED purchase
    graph, capped at ``max_rounds`` — the traversal family: unlike
    ``pagerank_purchases``' fixed iteration count, BFS runs a DATA-
    DEPENDENT number of supersteps and terminates when the frontier
    drains (the per-round driver scalar is one newly-settled count, the
    pagerank dangling-mass discipline).

    Scale shape: adjacency partitions by hash(node) once (both edge
    directions); each superstep unions (adjacency, settled distances,
    frontier candidates) into ONE groupby(q) exchange whose map_groups
    settles new nodes (candidate − settled), emits their neighbors as
    next-round candidates, and reports the partition's newly-settled
    count. Settled state never leaves its partition; candidate volume
    per round is bounded by the frontier's out-degree sum. The oracle is
    the same BFS as a recursive CTE (UNION-dedup on (node, depth), depth
    < max_rounds), min(depth) per node."""
    import pandas as pd
    import ray

    seed = np.int64(seed_supplier * 2 + 1)
    edges = _build_edges(sf_dir)

    def adj_from(parity: int):
        """Adjacency rows whose SOURCE endpoint has the given parity —
        the graph is bipartite, so a round's frontier is entirely one
        side and only that side's outgoing edges need to flow."""
        def fn(batch: pa.Table) -> pa.Table:
            src = batch["src"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            dst = batch["dst"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            a, b = (dst, src) if parity == 1 else (src, dst)
            return _exchange_rows(a, _H_ADJ, b,
                                  np.zeros(a.size, dtype=np.int64))

        return fn

    # customers are even nodes (edge sources), suppliers odd (targets)
    adj_half = {}
    for parity in (0, 1):
        h = edges.map_batches(adj_from(parity),
                              batch_format="pyarrow").materialize()
        n = h.count()
        adj_half[parity] = (h.repartition(_state_blocks(n)).materialize()
                            if n else h)
    if adj_half[0].count() == 0:
        return pd.DataFrame({"entity": ["supplier"],
                             "key": [int(seed_supplier)], "hops": [0]})

    def superstep(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = group["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        d_m = side == _H_DIST
        settled_k, settled_d = k[d_m], a[d_m]
        c_m = side == _H_CAND
        cand_k, cand_d = k[c_m], a[c_m]
        # settle: candidates not already settled, min distance per node
        if cand_k.size:
            fresh = ~np.isin(cand_k, settled_k)
            ck, cd = cand_k[fresh], cand_d[fresh]
            if ck.size:
                uk, inv = np.unique(ck, return_inverse=True)
                ud = np.full(uk.size, np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(ud, inv, cd)
                ck, cd = uk, ud
        else:
            ck = cd = np.zeros(0, dtype=np.int64)
        new_k, new_d = ck, cd
        all_k = np.concatenate([settled_k, new_k])
        all_d = np.concatenate([settled_d, new_d])
        out = [_exchange_rows(all_k, _H_DIST, all_d,
                              np.zeros(all_k.size, dtype=np.int64)),
               _exchange_rows(np.full(1, -1, dtype=np.int64), _H_NEW,
                              np.asarray([new_k.size], dtype=np.int64),
                              np.zeros(1, dtype=np.int64))]
        if new_k.size:
            # newly settled nodes propose their neighbors for next round
            adj_m = side == _H_ADJ
            aa, ab = k[adj_m], a[adj_m]
            new_order = np.argsort(new_k, kind="stable")
            nk_sorted, nd_by_k = new_k[new_order], new_d[new_order]
            pos, hit = _sorted_probe(nk_sorted, aa)
            nb = ab[hit]
            nd = nd_by_k[pos[hit]] + 1
            # partition-local candidate dedup: a node neighboring many
            # frontier members ships once, with the min proposal
            unb, inv = np.unique(nb, return_inverse=True)
            und = np.full(unb.size, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(und, inv, nd)
            out.append(_exchange_rows(unb, _H_CAND, und,
                                      np.zeros(unb.size, dtype=np.int64)))
        return pa.concat_tables(out)

    cand = ray.data.from_arrow(_exchange_rows(
        np.asarray([seed], dtype=np.int64), _H_CAND,
        np.zeros(1, dtype=np.int64), np.zeros(1, dtype=np.int64)))
    state = None
    state_blocks = _state_blocks(2 * adj_half[0].count())
    for rnd in range(max_rounds + 1):
        # round rnd settles nodes at distance rnd; the seed (distance 0)
        # is a supplier = odd node, so the settling side alternates and
        # only that side's outgoing adjacency joins the exchange
        flow = adj_half[1 if rnd % 2 == 0 else 0].union(cand)
        if state is not None:
            flow = flow.union(state.map_batches(_keep_side(_H_DIST),
                                                batch_format="pyarrow"))
        # repartition each round: sort output block count tracks its
        # input's, and state feeds the next union twice — without this
        # the block count (and exchange latency) compounds per round
        nxt = (flow.groupby("q")
               .map_groups(superstep, batch_format="pyarrow")
               .repartition(state_blocks)).materialize()
        n_new = sum(r["a"] for r in
                    nxt.map_batches(_keep_side(_H_NEW),
                                    batch_format="pyarrow").take_all())
        state = nxt
        if n_new == 0:
            break
        cand = state.map_batches(_keep_side(_H_CAND),
                                 batch_format="pyarrow")

    def publish(batch: pa.Table) -> pa.Table:
        batch = _keep_side(_H_DIST)(batch)
        node = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        ent = np.where(node % 2 == 0, "customer", "supplier")
        return pa.table({"entity": pa.array(ent, type=pa.string()),
                         "key": pa.array(node // 2),
                         "hops": pa.array(d)})

    out = state.map_batches(publish, batch_format="pyarrow").to_pandas()
    if not (out["key"].to_numpy()[out["entity"].to_numpy() == "supplier"]
            == seed_supplier).any():
        # isolated seed: the oracle's recursion base still emits it at 0
        out = pd.concat([out, pd.DataFrame(
            {"entity": ["supplier"], "key": [int(seed_supplier)],
             "hops": [0]})], ignore_index=True)
    return out.sort_values(["entity", "key"]).reset_index(drop=True)


KCORE_K = 20
KCORE_MAX_ROUNDS = 30


def kcore_purchases(sf_dir: str, k: int = KCORE_K,
                    max_rounds: int = KCORE_MAX_ROUNDS):
    """(node_type, key, degree): the bipartite k-core of the
    customer–part purchase graph — every customer with ≥ k distinct
    surviving parts and every part with ≥ k distinct surviving
    customers, peeled iteratively until STABLE, with each node's degree
    inside the core. The iterative-filtering primitive a training-data
    pipeline runs to prune low-activity users and low-coverage items
    before collaborative filtering (and the text analogue: drop rare
    n-grams / thin documents until both stabilize). The family surface
    no other graph entry has: a NON-MONOTONE fixpoint (pagerank runs a
    fixed count, BFS grows a monotone frontier; peeling REMOVES state
    until a full round removes nothing).

    Scale shape: distinct (customer, part) edges build on the orderkey
    co-partition (the _build_edges discipline, part flavor); each
    peeling round is two alternating halves — re-key edges by the side
    being peeled, each partition owns EVERY edge of its nodes so the
    degree test and the filter are partition-local, then re-key by the
    other side — one exchange per half, NO broadcast of removal sets
    (node-scale at 100 TB). The driver sees one edge count per half
    (the BFS newly-settled discipline) and stops when a full round
    holds the count; per-round repartition to the fixed state block
    count prevents the block-compounding the BFS fix documented.
    Peeling order cannot change the answer: the k-core is the unique
    maximal subgraph with min-degree ≥ k, so alternating halves and the
    oracle's simultaneous rounds converge to the SAME fixpoint."""
    import pandas as pd

    def orders_side(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return _exchange_rows(ok, 0, ck)

    def lineitem_side(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = pd.DataFrame({"ok": ok, "pk": pk}).drop_duplicates()
        return _exchange_rows(u["ok"].to_numpy(dtype=np.int64), 1,
                              u["pk"].to_numpy(dtype=np.int64))

    def join_orderkey(group: pa.Table) -> pa.Table:
        (ok_sorted, ck_sorted, _), (lok, lpk, _, _) = \
            _split_exchange_group(group)
        pos, hit = _sorted_probe(ok_sorted, lok)
        if not hit.any():
            return _exchange_empty(with_b=False)
        u = pd.DataFrame({"c": ck_sorted[pos[hit]],
                          "p": lpk[hit]}).drop_duplicates()
        # keyed by customer for the first peeling half
        return _exchange_rows(u["c"].to_numpy(dtype=np.int64), 1,
                              u["p"].to_numpy(dtype=np.int64))

    def global_distinct(group: pa.Table) -> pa.Table:
        ck = group["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = group["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = pd.DataFrame({"ck": ck, "pk": pk}).drop_duplicates()
        cks = u["ck"].to_numpy(dtype=np.int64)
        return pa.table({"q": pa.array(_hash_partition(cks)),
                         "ck": pa.array(cks),
                         "pk": pa.array(u["pk"].to_numpy(dtype=np.int64))})

    def peel_half(side: str, other: str):
        """Drop edges whose ``side`` node has degree < k; re-key the
        survivors by ``other`` for the next half. Partition-local: the
        q key co-locates every edge of each ``side`` node."""
        def fn(group: pa.Table) -> pa.Table:
            s = group[side].to_numpy(zero_copy_only=False).astype(np.int64)
            o = group[other].to_numpy(zero_copy_only=False).astype(np.int64)
            un, inv, deg = np.unique(s, return_inverse=True,
                                     return_counts=True)
            keep = deg[inv] >= k
            s, o = s[keep], o[keep]
            return pa.table({"q": pa.array(_hash_partition(o)),
                             side: pa.array(s), other: pa.array(o)})
        return fn

    edges = (read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"])
        .map_batches(orders_side, batch_format="pyarrow")
        .union(read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"])
            .map_batches(lineitem_side, batch_format="pyarrow",
                         batch_size=8192))
        .groupby("q").map_groups(join_orderkey, batch_format="pyarrow")
        .groupby("q").map_groups(global_distinct, batch_format="pyarrow")
        .materialize())
    n_edges = edges.count()
    empty = pa.table({"node_type": pa.array([], type=pa.string()),
                      "key": pa.array([], type=pa.int64()),
                      "degree": pa.array([], type=pa.int64())})
    if n_edges == 0:
        return empty
    blocks = _state_blocks(n_edges)
    edges = edges.repartition(blocks).materialize()
    # peeling loop: customer half re-keys by part, part half re-keys
    # back by customer — state ends each full round customer-keyed
    for _ in range(max_rounds):
        before = n_edges
        edges = (edges.groupby("q")
                 .map_groups(peel_half("ck", "pk"), batch_format="pyarrow")
                 .repartition(blocks).materialize())
        edges = (edges.groupby("q")
                 .map_groups(peel_half("pk", "ck"), batch_format="pyarrow")
                 .repartition(blocks).materialize())
        n_edges = edges.count()
        if n_edges == before:  # a full round removed nothing: stable
            break
    if n_edges == 0:
        return empty

    def degrees(group: pa.Table) -> pa.Table:
        ck = group["ck"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = group["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        uc, dc = np.unique(ck, return_counts=True)
        return pa.table({
            "node_type": pa.array(["customer"] * uc.size, type=pa.string()),
            "key": pa.array(uc), "degree": pa.array(dc.astype(np.int64)),
        })

    def part_keyed(batch: pa.Table) -> pa.Table:
        pk = batch["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"q": pa.array(_hash_partition(pk)),
                         "ck": batch["ck"], "pk": batch["pk"]})

    def part_degrees(group: pa.Table) -> pa.Table:
        pk = group["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        up, dp = np.unique(pk, return_counts=True)
        return pa.table({
            "node_type": pa.array(["part"] * up.size, type=pa.string()),
            "key": pa.array(up), "degree": pa.array(dp.astype(np.int64)),
        })

    cust = (edges.groupby("q").map_groups(degrees, batch_format="pyarrow")
            .to_pandas())
    part = (edges.map_batches(part_keyed, batch_format="pyarrow")
            .groupby("q").map_groups(part_degrees, batch_format="pyarrow")
            .to_pandas())
    out = (pd.concat([cust, part], ignore_index=True)
           .sort_values(["node_type", "key"]))
    return pa.table({
        "node_type": pa.array(out["node_type"].tolist(), type=pa.string()),
        "key": pa.array(out["key"].to_numpy(dtype=np.int64)),
        "degree": pa.array(out["degree"].to_numpy(dtype=np.int64)),
    })


def degree_assortativity(sf_dir: str):
    """(n_edges, assort_r): degree assortativity of the distinct
    customer→supplier purchase graph — the Pearson correlation,
    over edges, between the customer endpoint's degree and the
    supplier endpoint's degree. Negative = high-degree customers
    buy from low-degree suppliers (hub-to-leaf mixing), the one
    global mixing number the per-node views (``kcore_purchases``,
    ``pagerank_purchases``) don't expose. Moments fold EXACT
    integers (degrees are counts): Σx, Σy, Σx², Σy², Σxy per batch
    in int64, Python-int fold on the driver, one float division at
    the end — 4-dp publish. Zero variance on either side (a
    degree-regular graph) publishes 0.

    Scale shape: the edge build is ``_build_edges``' shared
    orderkey co-partition + src-hash distinct (out-degree arrives
    free on every edge row); supplier in-degrees are one
    ≤|suppliers|-group combine broadcast back as a sorted lookup;
    the moment pass is map-side partials only — no further
    exchange. Reference parity: the graph is the same distinct
    purchase relation ``pagerank_purchases`` walks."""
    import math

    edges = _build_edges(sf_dir)
    sd = edges.groupby("dst").count().to_pandas()
    if sd.empty:
        return pa.table({"n_edges": pa.array([], type=pa.int64()),
                         "assort_r": pa.array([], type=pa.float64())})
    dst_keys = np.sort(sd["dst"].to_numpy(dtype=np.int64))
    deg_s = sd.sort_values("dst")["count()"] \
        .to_numpy(dtype=np.int64)

    def moments(batch: pa.Table) -> pa.Table:
        x = batch["od"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch["dst"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        y = deg_s[np.searchsorted(dst_keys, dst)]
        return pa.table({
            "n": pa.array([x.size], type=pa.int64()),
            "sx": pa.array([int(x.sum())], type=pa.int64()),
            "sy": pa.array([int(y.sum())], type=pa.int64()),
            "sxx": pa.array([int((x * x).sum())], type=pa.int64()),
            "syy": pa.array([int((y * y).sum())], type=pa.int64()),
            "sxy": pa.array([int((x * y).sum())], type=pa.int64()),
        })

    parts = edges.map_batches(moments, batch_format="pyarrow",
                              batch_size=8192).to_pandas()
    n = int(parts["n"].sum())
    sx, sy = int(parts["sx"].sum()), int(parts["sy"].sum())
    sxx, syy = int(parts["sxx"].sum()), int(parts["syy"].sum())
    sxy = int(parts["sxy"].sum())
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    r = float(num) / math.sqrt(float(d1 * d2)) \
        if d1 > 0 and d2 > 0 else 0.0
    from searchengine_ray.pipelines.fulltext import round_half_away
    return pa.table({
        "n_edges": pa.array([n], type=pa.int64()),
        "assort_r": pa.array([round_half_away(r, 4)]),
    })
