"""Doc-level incremental upsert: generation-based delta segments + supersede
sets over a built index.

Reference semantics: ``POST /api/indexPage`` re-indexes ONE page in place —
decrement the old page's lemma dfs, delete its postings, tokenize the new
content and insert fresh postings + updated dfs
(``services/PageProcessorService.java:34-46``,
``Repositories/LemmaRepository.java:40-47``). The round-1 rebuild only
offered this at shard grain (``reindex`` fingerprint diff); this module is
the true per-document path, shaped like Lucene's delta-segment + deletes
model rather than in-place mutation (immutable posting segments can't be
edited, and at 100 TB you wouldn't want to):

- each ``upsert_docs`` call writes one **generation** under
  ``index_dir/delta/gen=NNNNN/``: encoded postings for just the upserted
  docs (same codec as shard segments), a doc-store fragment, norms
  sidecars, and the sorted docid set of the generation;
- a doc's **winning version is its latest generation** (or the main shards
  if never upserted): readers drop a source's postings for any docid that
  appears in a LATER generation (the supersede set — a sorted int64 array
  probed with one ``searchsorted``). There is no delete API, matching the
  reference (``indexPage`` only replaces);
- dictionary / per-site stats adjust EXACTLY: the writer re-tokenizes the
  replaced doc's current text (fetched from the doc store — the reference
  reads the old page row the same way) and applies ±df/±cf per lemma to
  ``delta/dict_delta.parquet``; ``n_docs``/``total_len``/site stats adjust
  in ``delta/state.json``. Searches over an upserted index are therefore
  score-identical to a from-scratch build of the updated corpus (pytest
  asserts full-response equality);
- new conversations append to ``delta/conv_delta.npy`` with ranks AFTER the
  main dictionary (docids stay unique and stable; within-delta ordering is
  insertion order, so the docid⇔(conv_id, turn_idx) order-isomorphism holds
  per source — cross-source rank order is restored at hydration);
- **compaction** is the existing shard machinery: ``reindex``/``build`` from
  the updated corpus drops ``delta/`` (``clear_delta``).

Scale shape: an upsert is an interactive point operation (one page per HTTP
call in the reference) — the writer runs driver-side on a handful of rows,
never a Ray job. Generations stay small by contract; serving cost is one
extra searchsorted per decoded source. Bulk changes go through ``reindex``.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_ray.build import SITE_PREFIX
from searchengine_ray.codec import EncodedPostings, encode_postings
from searchengine_ray.keys import TURN_BITS, TURN_MASK
from searchengine_ray.textproc import Analyzer

DELTA_DIR = "delta"
STATE_FILE = "state.json"

_GEN_POSTING_COLS = [
    "lemma",
    "site",
    "df",
    "doc_blob",
    "tf_blob",
    "block_last_docid",
    "block_max_tf",
    "block_doc_off",
    "block_tf_off",
]


# ---------------------------------------------------------------------------
# shared tokenization (must equal build.ExplodeTokens per-doc semantics)
# ---------------------------------------------------------------------------


def doc_lemma_tfs(analyzer: Analyzer, text: str) -> tuple[dict[str, int], int]:
    """(lemma → tf, dl) for one document — the per-doc view of the build's
    explode stage (``build.py`` ExplodeTokens.__call__): significant tokens
    only, lemma-normalized, dl = total significant token count."""
    tfs: dict[str, int] = {}
    dl = 0
    for w in analyzer.tokens(text or ""):
        if not analyzer.significant(w):
            continue
        lemma = analyzer.lemma(w)
        tfs[lemma] = tfs.get(lemma, 0) + 1
        dl += 1
    return tfs, dl


# ---------------------------------------------------------------------------
# delta state
# ---------------------------------------------------------------------------


def delta_root(index_dir: str) -> str:
    return os.path.join(index_dir, DELTA_DIR)


def load_state(index_dir: str) -> dict | None:
    path = os.path.join(delta_root(index_dir), STATE_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        state = json.load(f)
    # Epoch gate: a crash in the window between a full rebuild's _finalize
    # and its clear_delta would otherwise leave generations — whose docids
    # are relative to the OLD conv ranking — durably applied over the new
    # index. Each finalize mints a manifest build_id; upserts stamp it into
    # state, and state from a different epoch is treated as absent (the
    # next upsert physically clears it). Legacy manifests without build_id
    # keep the old behavior.
    mpath = os.path.join(index_dir, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            mid = json.load(f).get("build_id")
        ids = state.get("build_id")
        # a keep_delta rebuild PRE-stamps [old, new] before finalize so the
        # overlay survives a crash on either side of the manifest replace
        ids = ids if isinstance(ids, list) else [ids]
        if mid is not None and mid not in ids:
            return None
    return state


def clear_delta(index_dir: str) -> None:
    """Drop all delta generations (called by full rebuild / compaction)."""
    shutil.rmtree(delta_root(index_dir), ignore_errors=True)


def rebind_delta_epoch(index_dir: str, build_id: str | None) -> None:
    """Re-stamp the delta state onto a new build epoch. ONLY for callers
    that have PROVEN the overlay is still valid against the new finalize —
    ``build_index(keep_delta=True)``, i.e. cmd_reindex over unchanged input
    fingerprints (identical conv ranking ⇒ identical docids). Every other
    rebuild path lets the epoch gate in ``load_state`` drop stale
    generations. Reads the raw state file (NOT load_state, which would
    already gate on the new manifest)."""
    path = os.path.join(delta_root(index_dir), STATE_FILE)
    if not os.path.exists(path):
        return
    with open(path) as f:
        state = json.load(f)
    state["build_id"] = build_id
    _write_state(index_dir, state)


def pre_rebind_delta_epoch(index_dir: str, new_build_id: str) -> None:
    """PRE-stamp the delta state with {current, new} epochs BEFORE a
    keep_delta rebuild's finalize replaces the manifest: whichever side of
    the ``os.replace`` a crash lands on, ``load_state``'s gate accepts the
    loaded manifest's build_id, so a provably-valid overlay is never
    dropped (the post-finalize ``rebind_delta_epoch`` collapses the stamp
    back to the single new epoch). A crash before finalize leaves the OLD
    manifest + the widened stamp — still gated correctly, and any LATER
    non-keep_delta rebuild mints a third id that matches neither."""
    path = os.path.join(delta_root(index_dir), STATE_FILE)
    if not os.path.exists(path):
        return
    with open(path) as f:
        state = json.load(f)
    ids = state.get("build_id")
    ids = ids if isinstance(ids, list) else [ids]
    if new_build_id not in ids:
        ids.append(new_build_id)
    state["build_id"] = ids
    _write_state(index_dir, state)


def _write_state(index_dir: str, state: dict) -> None:
    root = delta_root(index_dir)
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, STATE_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, os.path.join(root, STATE_FILE))


def _load_conv_delta(index_dir: str) -> np.ndarray:
    path = os.path.join(delta_root(index_dir), "conv_delta.npy")
    if os.path.exists(path):
        return np.load(path)
    return np.empty(0, dtype="U1")


# ---------------------------------------------------------------------------
# upsert writer
# ---------------------------------------------------------------------------


def upsert_docs(index_dir: str, rows: list[dict]) -> dict:
    """Insert-or-replace documents in a built index (reference ``indexPage``
    at document grain). ``rows``: dicts with ``conv_id``, ``turn_idx``,
    ``role``, ``text`` (``role`` doubles as the site value when the index
    was built site-scoped with ``site_column='role'``; for other site
    columns pass the value under that column name).

    Returns {"generation": n, "replaced": k, "added": m}.
    """
    from searchengine_ray.index_store import IndexReader

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    analyzer = Analyzer(manifest["analyzer"])
    block_size = int(manifest["block_size"])
    site_column = manifest.get("site_column")

    if not rows:
        raise ValueError("upsert_docs: empty row list")
    if manifest.get("html_content"):
        # the index was built over EXTRACTED body text (EngineConfig
        # .html_content) — an upserted raw-HTML doc must go through the
        # same ingest stage or its postings/doc-store diverge from every
        # built document (reference indexPage parses HTML too)
        from searchengine_ray.htmltext import EXTRACTOR_VERSION, html_body_text

        built_under = manifest.get("html_extractor")
        if built_under is not None and built_under != EXTRACTOR_VERSION:
            # same contract as the QueryEngine morphology warning: mixing
            # extraction provenances is silently wrong, so say so — the
            # remedy is a reindex (which rebuilds every shard under the
            # current rules, the manifest field having joined cfg_sig)
            import logging

            logging.getLogger(__name__).warning(
                "upsert_docs: index was built under HTML extractor v%s but "
                "this process runs v%s — upserted docs will mix extraction "
                "provenances; reindex to converge",
                built_under,
                EXTRACTOR_VERSION,
            )
        rows = [{**r, "text": html_body_text(str(r.get("text") or ""))} for r in rows]
    for r in rows:
        t = int(r["turn_idx"])
        if t < 0 or t > TURN_MASK:
            raise ValueError(f"turn_idx {t} out of range (keys.TURN_BITS)")
    keys = {(str(r["conv_id"]), int(r["turn_idx"])) for r in rows}
    if len(keys) != len(rows):
        raise ValueError("upsert_docs: duplicate (conv_id, turn_idx) in batch")

    # reader over main + existing deltas = the CURRENT index state
    reader = IndexReader(index_dir)
    state = load_state(index_dir)
    if state is None:
        # either no delta yet, or stale-epoch debris from a crash between a
        # rebuild's finalize and its clear_delta — physically drop it before
        # writing generation 0 of the new epoch
        clear_delta(index_dir)
        state = {
            "build_id": manifest.get("build_id"),
            "generations": [],
            "n_docs_delta": 0,
            "total_len_delta": 0,
            "sites_delta": {},
            "n_convs_delta": 0,
        }
    gen_no = len(state["generations"])

    # -- docid assignment (existing conv rank, delta conv rank, or new) ----
    conv_main = reader._conv_main  # sorted main conv ids (mmap)
    conv_delta = list(_load_conv_delta(index_dir))
    n_main = int(conv_main.size)
    delta_rank = {str(c): n_main + i for i, c in enumerate(conv_delta)}
    new_convs: list[str] = []

    def conv_rank(cid: str) -> int:
        # .searchsorted METHOD: conv_main may be the range-sharded handle
        # (convdict.ShardedConvArray), which np.searchsorted can't consume
        pos = int(conv_main.searchsorted(cid))
        if pos < n_main and str(conv_main[pos]) == cid:
            return pos
        r = delta_rank.get(cid)
        if r is None:
            r = n_main + len(conv_delta) + len(new_convs)
            delta_rank[cid] = r
            new_convs.append(cid)
        return r

    docids = np.asarray(
        [
            (conv_rank(str(r["conv_id"])) << TURN_BITS) | int(r["turn_idx"])
            for r in rows
        ],
        dtype=np.int64,
    )

    # -- replaced docs: fetch current versions, compute decrements ---------
    existing = reader.fetch_docs(docids.tolist())
    dict_delta: dict[tuple[str, str], list[int]] = {}  # (lemma, site) → [ddf, dcf]

    def bump(lemma: str, site: str, ddf: int, dcf: int) -> None:
        e = dict_delta.setdefault((lemma, site), [0, 0])
        e[0] += ddf
        e[1] += dcf

    sites_delta: dict[str, list[int]] = {}  # site → [dn_docs, dtotal_len]

    def bump_site(site: str, dn: int, dlen: int) -> None:
        e = sites_delta.setdefault(site, [0, 0])
        e[0] += dn
        e[1] += dlen

    n_docs_add = 0
    total_len_delta = 0
    replaced = 0
    for r, did in zip(rows, docids.tolist()):
        old = existing.get(did)
        new_site = "" if site_column is None else str(r.get(site_column, "") or "")
        new_tfs, new_dl = doc_lemma_tfs(analyzer, str(r.get("text") or ""))
        if old is not None:
            replaced += 1
            old_site = "" if site_column is None else str(old.get(site_column, "") or "")
            old_tfs, old_dl = doc_lemma_tfs(analyzer, str(old.get("text") or ""))
            for lemma, tf in old_tfs.items():
                bump(lemma, "", -1, -tf)
                # site == "" is the GLOBAL row in dict_delta (DeltaView) and
                # is excluded from build-side dictionary_sites — an empty-site
                # doc must not write a per-site bump or global df double-counts
                if site_column is not None and old_site:
                    bump(lemma, old_site, -1, -tf)
            total_len_delta -= old_dl
            if site_column is not None:
                bump_site(old_site, -1, -old_dl)
        else:
            n_docs_add += 1
        for lemma, tf in new_tfs.items():
            bump(lemma, "", 1, tf)
            if site_column is not None and new_site:
                bump(lemma, new_site, 1, tf)
        total_len_delta += new_dl
        if site_column is not None:
            bump_site(new_site, 1, new_dl)

    # -- build the generation: postings, docs, norms, docid set ------------
    order = np.argsort(docids, kind="stable")
    sorted_docids = docids[order]
    sorted_rows = [rows[int(i)] for i in order]

    # per-(lemma, site) docid-sorted postings; site sentinels carry (docid,
    # dl) per site exactly like the build's explode stage
    per_lemma: dict[tuple[str, str], list[tuple[int, int]]] = {}
    dls = np.zeros(sorted_docids.size, dtype=np.int64)
    for i, (r, did) in enumerate(zip(sorted_rows, sorted_docids.tolist())):
        tfs, dl = doc_lemma_tfs(analyzer, str(r.get("text") or ""))
        dls[i] = dl
        site = "" if site_column is None else str(r.get(site_column, "") or "")
        for lemma, tf in tfs.items():
            per_lemma.setdefault((lemma, site), []).append((did, tf))
        if site_column is not None:
            per_lemma.setdefault((SITE_PREFIX + site, ""), []).append((did, dl))

    out = {c: [] for c in _GEN_POSTING_COLS}
    for (lemma, site), posts in sorted(per_lemma.items()):
        d = np.asarray([p[0] for p in posts], dtype=np.int64)
        t = np.asarray([p[1] for p in posts], dtype=np.int64)
        enc = encode_postings(d, t, block_size=block_size)
        out["lemma"].append(lemma)
        out["site"].append(site)
        out["df"].append(enc.n)
        out["doc_blob"].append(enc.doc_blob)
        out["tf_blob"].append(enc.tf_blob)
        out["block_last_docid"].append(enc.block_last_docid)
        out["block_max_tf"].append(enc.block_max_tf)
        out["block_doc_off"].append(enc.block_doc_off)
        out["block_tf_off"].append(enc.block_tf_off)

    root = delta_root(index_dir)
    gen_dir = os.path.join(root, f"gen={gen_no:05d}")
    tmp_dir = gen_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir)
    pq.write_table(
        pa.table(
            {
                "lemma": pa.array(out["lemma"], type=pa.string()),
                "site": pa.array(out["site"], type=pa.string()),
                "df": pa.array(out["df"], type=pa.int64()),
                "doc_blob": pa.array(out["doc_blob"], type=pa.binary()),
                "tf_blob": pa.array(out["tf_blob"], type=pa.binary()),
                "block_last_docid": pa.array(out["block_last_docid"], type=pa.binary()),
                "block_max_tf": pa.array(out["block_max_tf"], type=pa.binary()),
                "block_doc_off": pa.array(out["block_doc_off"], type=pa.binary()),
                "block_tf_off": pa.array(out["block_tf_off"], type=pa.binary()),
            }
        ),
        os.path.join(tmp_dir, "postings.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "docid": pa.array(sorted_docids, type=pa.int64()),
                "conv_id": pa.array([str(r["conv_id"]) for r in sorted_rows], type=pa.string()),
                "turn_idx": pa.array([int(r["turn_idx"]) for r in sorted_rows], type=pa.int32()),
                "role": pa.array([str(r.get("role") or "") for r in sorted_rows], type=pa.string()),
                "text": pa.array([str(r.get("text") or "") for r in sorted_rows], type=pa.string()),
            }
        ),
        os.path.join(tmp_dir, "docs.parquet"),
    )
    np.save(os.path.join(tmp_dir, "docids.npy"), sorted_docids)
    np.save(os.path.join(tmp_dir, "norms_docid.npy"), sorted_docids)
    np.save(os.path.join(tmp_dir, "norms_dl.npy"), dls)
    shutil.rmtree(gen_dir, ignore_errors=True)
    os.replace(tmp_dir, gen_dir)

    # -- conv delta + cumulative dict delta --------------------------------
    if new_convs:
        all_convs = conv_delta + new_convs
        width = max(len(c) for c in all_convs)
        np.save(
            os.path.join(root, "conv_delta.npy"),
            np.asarray(all_convs, dtype=f"U{width}"),
        )

    dd_path = os.path.join(root, "dict_delta.parquet")
    merged: dict[tuple[str, str], list[int]] = {}
    if os.path.exists(dd_path):
        prev = pq.read_table(dd_path)
        for lemma, site, ddf, dcf in zip(
            prev["lemma"].to_pylist(),
            prev["site"].to_pylist(),
            prev["ddf"].to_pylist(),
            prev["dcf"].to_pylist(),
        ):
            merged[(lemma, site)] = [int(ddf), int(dcf)]
    for k, (ddf, dcf) in dict_delta.items():
        e = merged.setdefault(k, [0, 0])
        e[0] += ddf
        e[1] += dcf
    merged = {k: v for k, v in merged.items() if v[0] != 0 or v[1] != 0}
    items = sorted(merged.items())
    tmp = dd_path + ".tmp"
    pq.write_table(
        pa.table(
            {
                "lemma": pa.array([k[0] for k, _ in items], type=pa.string()),
                "site": pa.array([k[1] for k, _ in items], type=pa.string()),
                "ddf": pa.array([v[0] for _, v in items], type=pa.int64()),
                "dcf": pa.array([v[1] for _, v in items], type=pa.int64()),
            }
        ),
        tmp,
    )
    os.replace(tmp, dd_path)

    # -- state (atomic last: a generation is live only once referenced) ----
    state["generations"].append(
        {"dir": f"gen={gen_no:05d}", "n_docs": int(sorted_docids.size)}
    )
    state["n_docs_delta"] = int(state["n_docs_delta"]) + n_docs_add
    state["total_len_delta"] = int(state["total_len_delta"]) + total_len_delta
    sd = state["sites_delta"]
    for site, (dn, dlen) in sites_delta.items():
        e = sd.setdefault(site, [0, 0])
        e[0] += dn
        e[1] += dlen
    state["n_convs_delta"] = len(conv_delta) + len(new_convs)
    _write_state(index_dir, state)
    return {"generation": gen_no, "replaced": replaced, "added": n_docs_add}


# ---------------------------------------------------------------------------
# reader-side delta view
# ---------------------------------------------------------------------------


class DeltaView:
    """Loaded delta state for an ``IndexReader``: per-generation postings
    (eager — generations are small by contract), supersede sets, doc-store
    fragments, stat adjustments.

    ``docs=False`` is the NON-OWNER partition-serving mode
    (``ShardedQueryService``): supersede sets and dictionary/stat
    adjustments stay active (identical gating/BM25 stats in every actor;
    replaced main docs drop everywhere), but doc-level contributions — gen
    postings, gen norms, doc fragments, the conv-rank extension — are
    suppressed so exactly ONE reader in a fan-out serves each delta doc."""

    def __init__(self, index_dir: str, state: dict, docs: bool = True):
        root = delta_root(index_dir)
        self.state = state
        self.docs = docs
        self.gen_docids: list[np.ndarray] = []
        self.gen_postings: list[dict[tuple[str, str], EncodedPostings]] = []
        self.gen_docs: list[pa.Table] = []
        self.gen_norms: list[tuple[np.ndarray, np.ndarray]] = []
        for g in state["generations"]:
            d = os.path.join(root, g["dir"])
            self.gen_docids.append(np.load(os.path.join(d, "docids.npy")))
            if not docs:
                continue
            t = pq.read_table(os.path.join(d, "postings.parquet"))
            posts: dict[tuple[str, str], EncodedPostings] = {}
            for i in range(t.num_rows):
                posts[(t["lemma"][i].as_py(), t["site"][i].as_py())] = EncodedPostings(
                    n=int(t["df"][i].as_py()),
                    doc_blob=t["doc_blob"][i].as_py(),
                    tf_blob=t["tf_blob"][i].as_py(),
                    block_last_docid=t["block_last_docid"][i].as_py(),
                    block_max_tf=t["block_max_tf"][i].as_py(),
                    block_doc_off=t["block_doc_off"][i].as_py(),
                    block_tf_off=t["block_tf_off"][i].as_py(),
                )
            self.gen_postings.append(posts)
            self.gen_docs.append(pq.read_table(os.path.join(d, "docs.parquet")))
            self.gen_norms.append(
                (
                    np.load(os.path.join(d, "norms_docid.npy")),
                    np.load(os.path.join(d, "norms_dl.npy")),
                )
            )
        # supersede set per source: source k (main = -1 → index 0) drops
        # docids appearing in any LATER generation
        G = len(self.gen_docids)
        self._sup: list[np.ndarray] = []
        acc = np.empty(0, dtype=np.int64)
        for k in range(G - 1, -2, -1):
            self._sup.append(acc)
            if k >= 0:
                acc = np.union1d(acc, self.gen_docids[k])
        self._sup.reverse()  # _sup[0] = for main, _sup[k+1] = for gen k

        dd_path = os.path.join(root, "dict_delta.parquet")
        self.df_delta: dict[str, int] = {}
        self.site_df_delta: dict[str, dict[str, int]] = {}
        if os.path.exists(dd_path):
            t = pq.read_table(dd_path)
            for lemma, site, ddf in zip(
                t["lemma"].to_pylist(), t["site"].to_pylist(), t["ddf"].to_pylist()
            ):
                if site == "":
                    self.df_delta[lemma] = self.df_delta.get(lemma, 0) + int(ddf)
                else:
                    m = self.site_df_delta.setdefault(site, {})
                    m[lemma] = m.get(lemma, 0) + int(ddf)
        conv_path = os.path.join(root, "conv_delta.npy")
        self.conv_delta = (
            np.load(conv_path) if docs and os.path.exists(conv_path) else None
        )

    # -- stat adjustments ------------------------------------------------

    @property
    def n_docs_delta(self) -> int:
        return int(self.state["n_docs_delta"])

    @property
    def total_len_delta(self) -> int:
        return int(self.state["total_len_delta"])

    def adjust_sites(self, sites: dict) -> dict:
        out = {k: dict(v) for k, v in sites.items()}
        for site, (dn, dlen) in self.state.get("sites_delta", {}).items():
            e = out.setdefault(site, {"n_docs": 0, "total_len": 0, "avgdl": 0.0})
            e["n_docs"] = int(e.get("n_docs", 0)) + int(dn)
            e["total_len"] = int(e.get("total_len", 0)) + int(dlen)
            e["avgdl"] = (e["total_len"] / e["n_docs"]) if e["n_docs"] else 0.0
        return {k: v for k, v in out.items() if v["n_docs"] > 0}

    # -- postings --------------------------------------------------------

    def filter_main(self, docids: np.ndarray, *arrays: np.ndarray):
        """Drop main-source rows superseded by any generation."""
        return self._filter(0, docids, *arrays)

    def _filter(self, src: int, docids: np.ndarray, *arrays: np.ndarray):
        sup = self._sup[src]
        if sup.size == 0 or docids.size == 0:
            return (docids, *arrays)
        pos = np.searchsorted(sup, docids)
        pos_c = np.minimum(pos, sup.size - 1)
        dead = (sup[pos_c] == docids) & (pos < sup.size)
        keep = ~dead
        return (docids[keep], *[a[keep] for a in arrays])

    def gen_lemma_postings(self, lemma: str, site: str | None):
        """Decoded (docids, tfs) contributed by the generations for a lemma
        (already supersede-filtered per generation). ``site=None`` = global
        (all sites); ``site=s`` = that site's per-(lemma, site) postings."""
        from searchengine_ray.codec import decode_postings

        parts_d: list[np.ndarray] = []
        parts_t: list[np.ndarray] = []
        for k, posts in enumerate(self.gen_postings):
            if site is None:
                encs = [e for (l, s), e in posts.items() if l == lemma]
            else:
                e1 = posts.get((lemma, site))
                encs = [e1] if e1 is not None else []
            for enc in encs:
                d, t = decode_postings(enc)
                d, t = self._filter(k + 1, d, t)
                if d.size:
                    parts_d.append(d)
                    parts_t.append(t)
        if not parts_d:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        d = np.concatenate(parts_d)
        t = np.concatenate(parts_t)
        if len(parts_d) > 1:
            o = np.argsort(d, kind="stable")
            d, t = d[o], t[o]
        return d, t

    # -- docs ------------------------------------------------------------

    def fetch_docs_into(self, want: np.ndarray, out: dict) -> None:
        """Overlay delta doc versions (ascending generation → latest wins)."""
        for t in self.gen_docs:
            ids = t["docid"].to_numpy(zero_copy_only=False)
            rows = np.nonzero(np.isin(ids, want))[0]
            if rows.size == 0:
                continue
            for row in t.take(pa.array(rows)).to_pylist():
                out[row["docid"]] = row


class ConvIdsView:
    """conv_rank → conv_id across main (mmapped, sorted) + delta (appended)
    without concatenating — main may be huge; delta is small."""

    def __init__(self, main: np.ndarray, delta: np.ndarray):
        self._main = main
        self._delta = delta
        self._n = int(main.size)

    def __len__(self) -> int:
        return self._n + int(self._delta.size)

    @property
    def size(self) -> int:
        return len(self)

    def __getitem__(self, idx):
        if isinstance(idx, (int, np.integer)):
            i = int(idx)
            return self._main[i] if i < self._n else self._delta[i - self._n]
        idx = np.asarray(idx, dtype=np.int64)
        lo = idx < self._n
        out = np.empty(idx.size, dtype=object)
        out[lo] = self._main[idx[lo]]
        out[~lo] = self._delta[idx[~lo] - self._n]
        return out
