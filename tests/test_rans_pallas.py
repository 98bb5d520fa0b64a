"""Pallas decode kernels vs the v2 engines (interpret mode on CPU).

Tiny shapes only: interpret mode executes the kernel op-by-op, so a
case costs ~15 s.  Full-scale validation runs on the TPU in bench.py
(on-device mismatch counts at B=12288 x 64 KiB).
"""

import numpy as np
import pytest

from htscodecs_tpu.ops import rans_v2, rans_pallas
from htscodecs_tpu.parallel import pipeline
from htscodecs_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native table builders unavailable")


def _mk(B, N, nsym, seed=2):
    rng = np.random.default_rng(seed)
    syms = (np.arange(nsym, dtype=np.uint8) * 7 + 35)
    return syms[rng.integers(0, nsym, (B, N))]


def test_dec_o1_matches_v2_roundtrip():
    blocks = _mk(4, 256, 4)
    alpha, packed, shift, _ = pipeline.build_o1_tables_dense(
        blocks, threads=False)
    st, w, n = rans_v2.enc_o1_batch(blocks, alpha, packed, shift)
    out = rans_pallas.dec_o1_batch(
        st, w[:, :int(n.max())], 256, alpha, packed, shift)
    assert np.array_equal(out, blocks)


def test_dec_o1_tail_lane3():
    # N % 4 != 0 exercises the lane-3 tail steps
    blocks = _mk(3, 253, 6, seed=5)
    alpha, packed, shift, _ = pipeline.build_o1_tables_dense(
        blocks, threads=False)
    st, w, n = rans_v2.enc_o1_batch(blocks, alpha, packed, shift)
    out = rans_pallas.dec_o1_batch(
        st, w[:, :int(n.max())], 253, alpha, packed, shift)
    assert np.array_equal(out, blocks)


def test_dec_o0_matches_v2_roundtrip():
    blocks = _mk(4, 256, 5, seed=7)
    res = [native.build_tables_o0(b) for b in blocks]
    builds = [(np.flatnonzero(fr > 0).astype(np.uint8),) for _, _, fr in res]
    # assemble dense O0 tables the same way models/batch.py does
    from htscodecs_tpu.ops.rans_v2 import densify_group_o0
    starts = np.stack([st for _, st, _ in res])
    freqs = np.stack([fr for _, _, fr in res])
    dense = densify_group_o0(freqs, starts)
    assert dense is not None
    alpha, packed, _ = dense
    st4, w, n = rans_v2.enc_o0_batch(blocks, alpha, packed, 12)
    out = rans_pallas.dec_o0_batch(
        st4, w[:, :int(n.max())], 256, alpha, packed, 12)
    assert np.array_equal(out, blocks)


def test_pallas_encode_matches_v2():
    """Encode kernels: byte-exact against the v2 scan engines."""
    import numpy as np
    import pytest
    from htscodecs_tpu import native
    from htscodecs_tpu.ops import rans_pallas, rans_v2, tables_v2
    if not native.available():
        pytest.skip("native unavailable")
    rng = np.random.default_rng(4)
    N, B = 2048, 24
    blocks = (rng.integers(0, 8, (B, N)) + 33).astype(np.uint8)
    r = tables_v2.build_o1_device(blocks)
    assert r is not None
    alpha_d, packed_d, asz, fhdr, shift, flag, A = r
    assert not flag.any()
    sv = int(shift[0])
    assert (shift == sv).all()
    alpha = np.asarray(alpha_d)
    packed = np.asarray(packed_d)
    for order in (1, 0):
        if order == 0:
            r0 = tables_v2.build_o0_device(blocks)
            alpha0, packed0, _asz, _fh, _A = r0
            a_np, p_np = np.asarray(alpha0), np.asarray(packed0)
            s2, w2, n2 = rans_v2.enc_o0_batch(blocks, a_np, p_np)
            sp, wp, np_ = rans_pallas.enc_o0_batch(blocks, a_np, p_np, 12)
        else:
            s2, w2, n2 = rans_v2.enc_o1_batch(blocks, alpha, packed, sv)
            sp, wp, np_ = rans_pallas.enc_o1_batch(blocks, alpha, packed, sv)
        assert np.array_equal(n2, np_), order
        assert np.array_equal(s2, sp), order
        for b in range(B):
            assert np.array_equal(w2[b, :n2[b]], wp[b, :np_[b]]), (order, b)
