"""Pallas VMEM-engine conformance (ops/rans_vmem.py).

The VMEM kernels must produce byte-identical streams/bytes to the v2
XLA engines (themselves golden-tested against the C reference) across
alphabet sizes, shifts, tail lengths and multi-tile batches.  On the
CPU test backend the kernels run in Pallas interpret mode (slow), so
the sweep here is small; the real-chip sweep is bench.py's autotune +
docs/ubench_vmem_r3.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from htscodecs_tpu import native
from htscodecs_tpu.ops import rans_v2, rans_vmem, tables_v2

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native host kernels unavailable")

rng = np.random.default_rng(11)


def _o1_setup(B, N, a):
    blocks = rng.integers(33, 33 + a, size=(B, N)).astype(np.uint8)
    half = blocks[:, 0::2][:, :blocks[:, 1::2].shape[1]]
    blocks[:, 1::2] = half                      # run structure
    st = tables_v2.build_o1_device_async(jnp.asarray(blocks))
    alpha, packed, _, meta = (np.asarray(st[0]), np.asarray(st[1]),
                              st[2], np.asarray(st[3]))
    return blocks, alpha, packed, meta[:, 1].astype(np.int32)


def _o0_setup(B, N, A):
    alpha = np.tile(np.arange(A, dtype=np.uint8)[None] + 33, (B, 1))
    fr = np.full((B, A), (1 << 12) // A, np.int32)
    fr[:, 0] += (1 << 12) - fr.sum(axis=1)
    bs = np.cumsum(fr, axis=1) - fr
    packed = (bs << rans_v2.PACK_SHIFT) | fr
    data = (rng.integers(0, A, size=(B, N)).astype(np.uint8) + 33)
    return data, alpha, packed, np.full(B, 12, np.int32)


@pytest.mark.parametrize("B,N,a", [(128, 512, 40), (256, 511, 6),
                                   (128, 514, 14)])
def test_vmem_dec_o1_matches_v2(B, N, a):
    blocks, alpha, packed, shiftv = _o1_setup(B, N, a)
    xf, words, n, ovf = map(np.asarray, rans_v2._enc_scan_v2_pb(
        jnp.asarray(blocks), jnp.asarray(alpha), jnp.asarray(packed),
        jnp.asarray(shiftv), 1, seg_cap=rans_v2.SEG))
    assert not ovf
    out = rans_vmem.dec_o1_batch(xf, words, N, alpha, packed, shiftv,
                                 interpret=True)
    np.testing.assert_array_equal(out, blocks)


def test_vmem_dec_o0_matches_v2():
    B, N, A = 128, 509, 16
    data, alpha, packed, shiftv = _o0_setup(B, N, A)
    xf, words, n, ovf = map(np.asarray, rans_v2._enc_scan_v2_pb(
        jnp.asarray(data), jnp.asarray(alpha), jnp.asarray(packed),
        jnp.asarray(shiftv), 0, seg_cap=rans_v2.SEG))
    assert not ovf
    out = rans_vmem.dec_o0_batch(xf, words, N, alpha, packed, shiftv,
                                 interpret=True)
    np.testing.assert_array_equal(out, data)


@pytest.mark.parametrize("N", [512, 511])
def test_vmem_enc_o1_matches_v2(N):
    B = 128
    blocks, alpha, packed, shiftv = _o1_setup(B, N, 24)
    xf_r, w_r, n_r, _ = map(np.asarray, rans_v2._enc_scan_v2_pb(
        jnp.asarray(blocks), jnp.asarray(alpha), jnp.asarray(packed),
        jnp.asarray(shiftv), 1, seg_cap=rans_v2.SEG))
    xf, words, n = rans_vmem._enc_batch(blocks, alpha, packed, shiftv,
                                        1, True)
    np.testing.assert_array_equal(xf, xf_r)
    np.testing.assert_array_equal(n, n_r)
    for b in range(B):
        np.testing.assert_array_equal(words[b, :n[b]], w_r[b, :n_r[b]])


def test_vmem_enc_o0_matches_v2():
    B, N, A = 128, 510, 8
    data, alpha, packed, shiftv = _o0_setup(B, N, A)
    xf_r, w_r, n_r, _ = map(np.asarray, rans_v2._enc_scan_v2_pb(
        jnp.asarray(data), jnp.asarray(alpha), jnp.asarray(packed),
        jnp.asarray(shiftv), 0, seg_cap=rans_v2.SEG))
    xf, words, n = rans_vmem._enc_batch(data, alpha, packed, shiftv,
                                        0, True)
    np.testing.assert_array_equal(xf, xf_r)
    np.testing.assert_array_equal(n, n_r)
    for b in range(B):
        np.testing.assert_array_equal(words[b, :n[b]], w_r[b, :n_r[b]])


def test_vmem_roundtrip_nonpadded_batch():
    """Non-BT-multiple batches go through the pad/strip path."""
    B, N, a = 40, 257, 9
    blocks, alpha, packed, shiftv = _o1_setup(B, N, a)
    xf, words, n = rans_vmem._enc_batch(blocks, alpha, packed, shiftv,
                                        1, True)
    out = rans_vmem.dec_o1_batch(xf, words, N, alpha, packed, shiftv,
                                 interpret=True)
    np.testing.assert_array_equal(out, blocks)


# ---------------------------------------------------------------------------
# 4x8 (CRAM 3.0) VMEM engines vs the XLA byte engines


def _o1_setup8(B, N, a):
    from htscodecs_tpu import native
    blocks = rng.integers(33, 33 + a, size=(B, N)).astype(np.uint8)
    half = blocks[:, 0::2][:, :blocks[:, 1::2].shape[1]]
    blocks[:, 1::2] = half
    alps, pks = [], []
    amax = 0
    for b in range(B):
        r = native.r8_build_tables_dense(blocks[b], 1)
        assert r is not None
        _t, al, pk = r
        alps.append(al)
        pks.append(pk)
        amax = max(amax, len(al))
    A = rans_v2._round_a(amax)
    alpha = np.zeros((B, A), np.uint8)
    packed = np.zeros((B, A, A), np.int32)
    for b in range(B):
        al, pk = alps[b], pks[b]
        alpha[b, :len(al)] = al
        alpha[b, len(al):] = al[-1] if len(al) else 0
        packed[b, :len(al), :len(al)] = pk
    return blocks, alpha, packed


@pytest.mark.parametrize("B,N,a", [(128, 255, 40), (128, 256, 6)])
def test_vmem8_roundtrip_o1(B, N, a):
    from htscodecs_tpu.ops import rans8_v2, rans8_vmem
    blocks, alpha, packed = _o1_setup8(B, N, a)
    xf_r, w_r, n_r, ovf = map(np.asarray, rans8_v2._enc_scan8(
        jnp.asarray(blocks), jnp.asarray(alpha), jnp.asarray(packed),
        1, seg_cap=rans_v2.SEG))
    assert not ovf
    xf, out, n = rans8_vmem._enc_batch(blocks, alpha, packed, 1, True)
    np.testing.assert_array_equal(xf, xf_r)
    np.testing.assert_array_equal(n, n_r)
    for b in range(B):
        np.testing.assert_array_equal(out[b, :n[b]], w_r[b, :n_r[b]])
    dec = rans8_vmem.dec_o1_batch(
        xf, out.astype(np.uint8), N, alpha, packed, interpret=True)
    np.testing.assert_array_equal(dec, blocks)


def test_vmem8_roundtrip_o0_tail():
    from htscodecs_tpu.ops import rans8_v2, rans8_vmem
    from htscodecs_tpu import native
    B, N, a = 128, 258, 14          # N & 3 == 2: no-advance tail
    blocks = rng.integers(33, 33 + a, size=(B, N)).astype(np.uint8)
    A = 16
    alps, pks = [], []
    for b in range(B):
        r = native.r8_build_tables_dense(blocks[b], 0)
        assert r is not None
        _t, al, pk = r
        alps.append(al)
        pks.append(pk)
    A = rans_v2._round_a(max(len(a_) for a_ in alps))
    alpha = np.zeros((B, A), np.uint8)
    packed = np.zeros((B, A), np.int32)
    for b in range(B):
        al, pk = alps[b], pks[b]
        alpha[b, :len(al)] = al
        alpha[b, len(al):] = al[-1] if len(al) else 0
        packed[b, :len(al)] = pk
    xf_r, w_r, n_r, ovf = map(np.asarray, rans8_v2._enc_scan8(
        jnp.asarray(blocks), jnp.asarray(alpha), jnp.asarray(packed),
        0, seg_cap=rans_v2.SEG))
    assert not ovf
    xf, out, n = rans8_vmem._enc_batch(blocks, alpha, packed, 0, True)
    np.testing.assert_array_equal(xf, xf_r)
    np.testing.assert_array_equal(n, n_r)
    for b in range(B):
        np.testing.assert_array_equal(out[b, :n[b]], w_r[b, :n_r[b]])
    dec = rans8_vmem.dec_o0_batch(
        xf, out.astype(np.uint8), N, alpha, packed, interpret=True)
    np.testing.assert_array_equal(dec, blocks)
