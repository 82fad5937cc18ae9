"""Varbyte/delta posting codec round-trip + block metadata (SURVEY.md §5.2)."""

import numpy as np
import pytest

from searchengine_ray.codec import (
    blocks_for_candidates,
    decode_blocks,
    decode_postings,
    encode_postings,
    vb_decode,
    vb_encode,
)


class TestVarbyte:
    def test_roundtrip_small(self):
        a = np.array([0, 1, 127, 128, 300, 16383, 16384], dtype=np.uint64)
        assert np.array_equal(vb_decode(vb_encode(a)), a)

    def test_roundtrip_large_values(self):
        a = np.array([2**62, 2**63 - 1, 1, 2**56 - 1, 2**56], dtype=np.uint64)
        assert np.array_equal(vb_decode(vb_encode(a)), a)

    def test_empty(self):
        assert vb_encode(np.empty(0, dtype=np.uint64)) == b""
        assert vb_decode(b"").size == 0

    def test_random_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            a = rng.integers(0, 2**50, size=1000).astype(np.uint64)
            assert np.array_equal(vb_decode(vb_encode(a)), a)

    def test_single_byte_density(self):
        # values < 128 must cost exactly 1 byte
        a = np.arange(128, dtype=np.uint64)
        assert len(vb_encode(a)) == 128


class TestPostings:
    def _make(self, n, seed=1, block_size=16):
        rng = np.random.default_rng(seed)
        docids = np.unique(rng.integers(0, 10 * n + 1, size=n).astype(np.int64))
        tfs = rng.integers(1, 50, size=docids.size).astype(np.int64)
        return docids, tfs, encode_postings(docids, tfs, block_size=block_size)

    def test_roundtrip(self):
        docids, tfs, enc = self._make(1000)
        d, t = decode_postings(enc)
        assert np.array_equal(d, docids)
        assert np.array_equal(t, tfs)

    def test_empty(self):
        enc = encode_postings(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        d, t = decode_postings(enc)
        assert d.size == 0 and t.size == 0

    def test_docid_zero(self):
        enc = encode_postings(np.array([0, 5], dtype=np.int64), np.array([1, 2], dtype=np.int64))
        d, t = decode_postings(enc)
        assert d.tolist() == [0, 5]

    def test_block_metadata(self):
        docids, tfs, enc = self._make(100, block_size=16)
        last = np.frombuffer(enc.block_last_docid, dtype=np.int64)
        maxtf = np.frombuffer(enc.block_max_tf, dtype=np.int32)
        nblocks = (docids.size + 15) // 16
        assert last.size == nblocks
        for bi in range(nblocks):
            lo, hi = bi * 16, min((bi + 1) * 16, docids.size)
            assert last[bi] == docids[hi - 1]
            assert maxtf[bi] == tfs[lo:hi].max()

    def test_decode_selected_blocks(self):
        docids, tfs, enc = self._make(500, block_size=32)
        idx = np.array([0, 3, 7], dtype=np.int64)
        d, t = decode_blocks(enc, idx, block_size=32)
        expect_d, expect_t = [], []
        for bi in idx:
            lo, hi = bi * 32, min((bi + 1) * 32, docids.size)
            expect_d.append(docids[lo:hi])
            expect_t.append(tfs[lo:hi])
        assert np.array_equal(d, np.concatenate(expect_d))
        assert np.array_equal(t, np.concatenate(expect_t))

    def test_blocks_for_candidates_skip_correctness(self):
        """Skip-selected blocks must contain every true intersection hit."""
        docids, tfs, enc = self._make(2000, seed=3, block_size=64)
        rng = np.random.default_rng(9)
        candidates = np.unique(rng.choice(docids, size=40, replace=False))
        sel = blocks_for_candidates(enc, candidates)
        d, _ = decode_blocks(enc, sel, block_size=64)
        assert np.isin(candidates, d).all()

    def test_blocks_for_candidates_skips_something(self):
        docids, tfs, enc = self._make(5000, seed=4, block_size=64)
        candidates = docids[:3]  # all in the first block(s)
        sel = blocks_for_candidates(enc, candidates)
        nblocks = len(np.frombuffer(enc.block_last_docid, dtype=np.int64))
        assert sel.size < nblocks


@pytest.mark.parametrize("n", [1, 15, 16, 17, 128, 129])
def test_boundary_sizes(n):
    docids = np.arange(0, 3 * n, 3, dtype=np.int64)
    tfs = np.ones(docids.size, dtype=np.int64)
    enc = encode_postings(docids, tfs, block_size=16)
    d, t = decode_postings(enc)
    assert np.array_equal(d, docids)


class TestEncodeMany:
    def test_matches_per_list_encode(self):
        import numpy as np

        from searchengine_ray.codec import decode_postings, encode_many, encode_postings

        rng = np.random.default_rng(7)
        lists = []
        for n in (0, 1, 5, 127, 128, 129, 1000):
            d = np.unique(rng.integers(0, 1 << 40, size=n))
            t = rng.integers(1, 1000, size=d.size)
            lists.append((d.astype(np.int64), t.astype(np.int64)))
        docids = np.concatenate([d for d, _ in lists])
        tfs = np.concatenate([t for _, t in lists])
        starts = np.concatenate(([0], np.cumsum([d.size for d, _ in lists])))
        many = encode_many(docids, tfs, starts, block_size=128)
        assert len(many) == len(lists)
        for (d, t), enc in zip(lists, many):
            ref = encode_postings(d, t, block_size=128)
            assert enc.n == ref.n
            assert enc.doc_blob == ref.doc_blob
            assert enc.tf_blob == ref.tf_blob
            assert enc.block_last_docid == ref.block_last_docid
            assert enc.block_max_tf == ref.block_max_tf
            assert enc.block_doc_off == ref.block_doc_off
            assert enc.block_tf_off == ref.block_tf_off
            dd, tt = decode_postings(enc)
            assert np.array_equal(dd, d) and np.array_equal(tt, t)


def test_decode_blocks_order_independent():
    """ADVICE r1 (low): decode_blocks must normalize unsorted block indices
    (the run-decoder cumsums from each run's base docid)."""
    import numpy as np

    from searchengine_ray.codec import decode_blocks, encode_postings

    rng = np.random.default_rng(3)
    docids = np.cumsum(rng.integers(1, 50, size=1000)).astype(np.int64)
    tfs = rng.integers(1, 9, size=1000).astype(np.int64)
    enc = encode_postings(docids, tfs, block_size=64)
    sel_sorted = np.array([0, 3, 4, 9, 10], dtype=np.int64)
    d1, t1 = decode_blocks(enc, sel_sorted, block_size=64)
    d2, t2 = decode_blocks(enc, sel_sorted[::-1].copy(), block_size=64)
    d3, t3 = decode_blocks(enc, np.array([4, 0, 10, 3, 9, 4], dtype=np.int64), block_size=64)
    assert np.array_equal(d1, d2) and np.array_equal(t1, t2)
    assert np.array_equal(d1, d3) and np.array_equal(t1, t3)
