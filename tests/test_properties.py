"""Property-based tests (hypothesis) for the invariants everything else
rests on: codec round-trips, Arrow/Python tokenizer parity, top-k selection
equivalence, pair-dedup exactness. Pure-CPU — no Ray session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_ray.codec import (
    blocks_for_candidates,
    decode_blocks,
    decode_postings,
    encode_many,
    encode_postings,
    vb_decode,
    vb_encode,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 62)), max_size=200))
def test_varbyte_roundtrip(values):
    arr = np.asarray(values, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(arr)), arr)


@st.composite
def posting_list(draw, max_n=300):
    gaps = draw(
        st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=max_n)
    )
    start = draw(st.integers(min_value=0, max_value=1 << 40))
    docids = start + np.cumsum(np.asarray(gaps, dtype=np.int64)) - gaps[0]
    tfs = np.asarray(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=1 << 20),
                min_size=len(gaps),
                max_size=len(gaps),
            )
        ),
        dtype=np.int64,
    )
    return docids, tfs


@settings(max_examples=100, deadline=None)
@given(posting_list(), st.integers(min_value=1, max_value=64))
def test_encode_decode_roundtrip_any_block_size(pl, block_size):
    docids, tfs = pl
    enc = encode_postings(docids, tfs, block_size=block_size)
    d, t = decode_postings(enc)
    assert np.array_equal(d, docids)
    assert np.array_equal(t, tfs)


@settings(max_examples=100, deadline=None)
@given(posting_list(), st.integers(min_value=1, max_value=32), st.data())
def test_decode_blocks_equals_slices(pl, block_size, data):
    docids, tfs = pl
    enc = encode_postings(docids, tfs, block_size=block_size)
    nblocks = (docids.size + block_size - 1) // block_size
    sel = sorted(
        data.draw(
            st.sets(st.integers(min_value=0, max_value=nblocks - 1), max_size=nblocks)
        )
    )
    d, t = decode_blocks(enc, np.asarray(sel, dtype=np.int64), block_size=block_size)
    want_d = np.concatenate(
        [docids[b * block_size : (b + 1) * block_size] for b in sel]
    ) if sel else np.empty(0, dtype=np.int64)
    want_t = np.concatenate(
        [tfs[b * block_size : (b + 1) * block_size] for b in sel]
    ) if sel else np.empty(0, dtype=np.int64)
    assert np.array_equal(d, want_d)
    assert np.array_equal(t, want_t)


@settings(max_examples=60, deadline=None)
@given(posting_list(max_n=100), st.data())
def test_block_skip_never_misses_a_candidate(pl, data):
    """blocks_for_candidates must select a superset of the blocks holding
    any candidate — the conjunctive skip path can over-read, never drop."""
    docids, tfs = pl
    enc = encode_postings(docids, tfs, block_size=16)
    cand = np.asarray(
        sorted(
            data.draw(st.sets(st.sampled_from(docids.tolist()), max_size=docids.size))
        ),
        dtype=np.int64,
    )
    if cand.size == 0:
        return
    sel = blocks_for_candidates(enc, cand)
    d, _ = decode_blocks(enc, sel, block_size=16)
    pos = np.searchsorted(d, cand)
    assert (pos < d.size).all()
    assert np.array_equal(d[pos], cand)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=1, max_value=5000), min_size=0, max_size=50),
        min_size=1,
        max_size=8,
    )
)
def test_encode_many_matches_per_list(gap_lists):
    all_d, all_t, starts = [], [], [0]
    rng = np.random.default_rng(0)
    per_list = []
    for gaps in gap_lists:
        d = np.cumsum(np.asarray(gaps, dtype=np.int64)) if gaps else np.empty(0, np.int64)
        t = rng.integers(1, 100, size=len(gaps)).astype(np.int64)
        per_list.append((d, t))
        all_d.append(d)
        all_t.append(t)
        starts.append(starts[-1] + len(gaps))
    docids = np.concatenate(all_d) if all_d else np.empty(0, np.int64)
    tfs = np.concatenate(all_t) if all_t else np.empty(0, np.int64)
    encs = encode_many(docids, tfs, np.asarray(starts, dtype=np.int64), block_size=8)
    for (d, t), enc in zip(per_list, encs):
        single = encode_postings(d, t, block_size=8)
        assert enc.doc_blob == single.doc_blob
        assert enc.tf_blob == single.tf_blob
        assert enc.block_last_docid == single.block_last_docid
        assert enc.block_max_tf == single.block_max_tf


_text = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2100), max_size=120
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_text, min_size=1, max_size=20), st.sampled_from(["ru", "simple"]))
def test_tokens_flat_arrow_matches_python(texts, mode):
    from searchengine_ray.textproc import tokenize, tokenize_simple, tokens_flat_arrow

    flat, parents = tokens_flat_arrow(texts, mode)
    got: dict[int, list[str]] = {}
    for tok, row in zip(flat.to_pylist(), parents.tolist()):
        got.setdefault(row, []).append(tok)
    py = tokenize if mode == "ru" else tokenize_simple
    for i, t in enumerate(texts):
        assert got.get(i, []) == py(t), (i, t)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.floats(min_value=0, max_value=100), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=50),
)
def test_topk_order_equals_full_lexsort_prefix(scores, k):
    from searchengine_ray.query import _topk_order

    s = np.asarray(scores, dtype=np.float64)
    docids = np.arange(s.size, dtype=np.int64)[::-1].copy()  # anti-sorted ids
    got = _topk_order(s, docids, k)[:k]
    want = np.lexsort((docids, -s))[:k]
    assert np.array_equal(got, want)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=6),
                  st.integers(min_value=0, max_value=400)),
        min_size=1, max_size=300, unique=True,
    ),
    st.integers(min_value=2, max_value=16),
)
def test_affinity_split_reproduces_pair_multiset(edges, cap):
    """For ANY (customer, supplier) edge set and ANY cap, stage-1 split +
    cell resolution reproduces exactly the brute-force per-customer pair
    multiset, and every deferred cell stays within the cap bound."""
    import pandas as pd

    from searchengine_ray.pipelines.graph import (
        _affinity_resolve,
        _affinity_stage1,
        _PAIR_SHIFT,
    )

    df = pd.DataFrame(edges, columns=["c", "s"]).drop_duplicates()
    t = _affinity_stage1(df, cap)
    # cap bound on every deferred cell
    for a, b in zip(t["sa"].to_pylist(), t["sb"].to_pylist()):
        if a is not None:
            assert len(a) <= cap
        if b is not None:
            assert len(b) <= cap
    out = _affinity_resolve(t).to_pandas().groupby(
        "k", as_index=False)["n"].sum()
    m = df.merge(df, on="c")
    m = m[m["s_x"] < m["s_y"]]
    exp = m.groupby(["s_x", "s_y"], as_index=False).size()
    want = {
        (int(a) << _PAIR_SHIFT) | int(b): int(n)
        for a, b, n in zip(exp["s_x"], exp["s_y"], exp["size"])
    }
    got = dict(zip(out["k"].astype(int), out["n"].astype(int)))
    assert got == want


_snippet_word = st.one_of(
    st.sampled_from(["needle", "thread", "the", "a"]),
    st.text(alphabet="abcdefg", min_size=2, max_size=6),
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_snippet_word, min_size=0, max_size=60))
def test_snippet_invariants(words):
    """Reference snippet-rule invariants for ANY word sequence: at most 3
    fragments, every <b>-wrapped token is a query lemma, non-hit docs
    yield the empty snippet, and the snippet is framed by '...'."""
    from searchengine_ray.snippets import build_snippet
    from searchengine_ray.textproc import Analyzer

    an = Analyzer("simple")
    q = {"needle", "thread"}
    s = build_snippet(words, q, an, window=5, max_windows=3)
    hits = [w for w in words if an.safe_lemma(w) in q]
    if not hits:
        assert s == ""
        return
    assert s.startswith("...") and s.endswith("...")
    assert s.count(" ... ") <= 2  # ≤ 3 fragments
    import re

    for frag in re.findall(r"<b>([^<]*)</b>", s):
        assert an.safe_lemma(frag) in q
    # bold count never exceeds the number of hit tokens in the doc
    assert s.count("<b>") <= len(hits)
