"""Batched device rANS 4x8 engine conformance (CRAM 3.0).

ops/rans8_v2.py and the batch API must be byte-identical to the host
oracle (models/rans4x8.py, golden-tested vs the C reference) across
orders, tails (incl. the order-0 no-advance tail peek), and alphabets.
"""

import numpy as np
import pytest

from htscodecs_tpu.models import batch, rans4x8
from htscodecs_tpu.ops import rans8_core as core8
from htscodecs_tpu.ops import rans8_v2, rans_v2

rng = np.random.default_rng(41)


def mkdata(n, a, runs):
    if runs:
        v = rng.choice(a, size=n // 2 + 1)
        l = rng.geometric(0.3, size=n // 2 + 1).clip(1, 20)
        d = np.repeat(v, l)[:n]
        if len(d) < n:
            d = np.pad(d, (0, n - len(d)))
    else:
        d = rng.integers(0, a, n)
    return (d + 33).astype(np.uint8)


@pytest.mark.parametrize("n,a,runs", [(64, 3, False), (103, 5, False),
                                      (1024, 9, True), (4097, 40, True)])
def test_o0_engine_matches_oracle(n, a, runs):
    B = 3
    blocks = np.stack([mkdata(n, a, runs) for _ in range(B)])
    res = [rans4x8.build_tables_o0(b) for b in blocks]
    alpha, packed, _ = rans_v2.densify_group_o0(
        np.stack([r[1] for r in res]), np.stack([r[2] for r in res]))
    st, w, cnt = rans8_v2.enc_o0_batch(blocks, alpha, packed)
    pay = [core8.enc_o0(blocks[b], res[b][2], res[b][1], 12)
           for b in range(B)]
    for b in range(B):
        got = (st[b].astype("<u4").tobytes()
               + w[b, :cnt[b]].astype(np.uint8).tobytes())
        assert got == pay[b]
    W = max(len(p) - 16 for p in pay)
    stream = np.zeros((B, max(W, 1)), np.uint8)
    X = np.zeros((B, 4), np.uint32)
    for b, p in enumerate(pay):
        X[b] = np.frombuffer(p[:16], "<u4")
        stream[b, :len(p) - 16] = np.frombuffer(p[16:], np.uint8)
    dec = rans8_v2.dec_o0_batch(X, stream, n, alpha, packed)
    assert np.array_equal(dec, blocks)


@pytest.mark.parametrize("n,a,runs", [(64, 3, False), (103, 5, False),
                                      (1024, 9, True), (4097, 40, True)])
def test_o1_engine_matches_oracle(n, a, runs):
    B = 3
    blocks = np.stack([mkdata(n, a, runs) for _ in range(B)])
    res = [rans4x8.build_tables_o1(b) for b in blocks]
    alpha, packed, _ = rans_v2.densify_builds((r[1], r[2]) for r in res)
    st, w, cnt = rans8_v2.enc_o1_batch(blocks, alpha, packed)
    pay = [core8.enc_o1(blocks[b], res[b][2], res[b][1], 12)
           for b in range(B)]
    for b in range(B):
        got = (st[b].astype("<u4").tobytes()
               + w[b, :cnt[b]].astype(np.uint8).tobytes())
        assert got == pay[b]
    W = max(len(p) - 16 for p in pay)
    stream = np.zeros((B, max(W, 1)), np.uint8)
    X = np.zeros((B, 4), np.uint32)
    for b, p in enumerate(pay):
        X[b] = np.frombuffer(p[:16], "<u4")
        stream[b, :len(p) - 16] = np.frombuffer(p[16:], np.uint8)
    dec = rans8_v2.dec_o1_batch(X, stream, n, alpha, packed)
    assert np.array_equal(dec, blocks)


@pytest.mark.parametrize("win", ["fine", "xfine"])
def test_o1_decode_window_variants(win):
    """The fine/xfine byte windows must decode identically to coarse."""
    n, B = 2049, 3
    blocks = np.stack([mkdata(n, 40, True) for _ in range(B)])
    res = [rans4x8.build_tables_o1(b) for b in blocks]
    alpha, packed, _ = rans_v2.densify_builds((r[1], r[2]) for r in res)
    pay = [core8.enc_o1(blocks[b], res[b][2], res[b][1], 12)
           for b in range(B)]
    W = max(len(p) - 16 for p in pay)
    stream = np.zeros((B, max(W, 1)), np.uint8)
    X = np.zeros((B, 4), np.uint32)
    for b, p in enumerate(pay):
        X[b] = np.frombuffer(p[:16], "<u4")
        stream[b, :len(p) - 16] = np.frombuffer(p[16:], np.uint8)
    saved = rans_v2.get_dec_variant()
    try:
        rans_v2.set_dec_variant(win=win)
        dec = rans8_v2.dec_o1_batch(X, stream, n, alpha, packed)
    finally:
        rans_v2.set_dec_variant(**saved)
    assert np.array_equal(dec, blocks)


@pytest.mark.parametrize("order", [0, 1])
def test_batch_api(order):
    blocks = [mkdata(500, 7, True) for _ in range(20)] + [mkdata(501, 7, True)]
    streams = batch.r4x8_compress_blocks(blocks, order, engine="device")
    for b, s in zip(blocks, streams):
        assert s == rans4x8.compress(b, order)
    dec = batch.r4x8_uncompress_blocks(streams, engine="device")
    for b, d in zip(blocks, dec):
        assert d == b.tobytes()


def test_batch_api_decodes_host_streams():
    blocks = [mkdata(512, 5, True) for _ in range(18)]
    streams = [rans4x8.compress(b, 1) for b in blocks]
    dec = batch.r4x8_uncompress_blocks(streams, engine="device")
    for b, d in zip(blocks, dec):
        assert d == b.tobytes()


def test_native_dense_builders_match_python():
    from htscodecs_tpu import native
    if not native.available():
        pytest.skip("native unavailable")
    for n, a in [(64, 2), (1000, 9), (4097, 40)]:
        d = mkdata(n, a, True)
        tab_p, F, start = rans4x8.build_tables_o0(d)
        r = native.r8_build_tables_dense(d, 0)
        assert r is not None and r[0] == tab_p
        alpha_p, packed_p, _ = rans_v2.densify_group_o0(F[None], start[None])
        na = len(r[1])
        assert np.array_equal(r[1], alpha_p[0][:na])
        assert np.array_equal(r[2], packed_p[0][:na])
        tab_p1, fr, st = rans4x8.build_tables_o1(d)
        r1 = native.r8_build_tables_dense(d, 1)
        assert r1 is not None and r1[0] == tab_p1
        alpha1, packed1, _ = rans_v2.densify_builds([(fr, st)])
        a_n = len(r1[1])
        assert np.array_equal(r1[1], alpha1[0][:a_n])
        assert np.array_equal(r1[2], packed1[0][:a_n, :a_n])
    wide = np.arange(200, dtype=np.uint8).repeat(8)
    assert native.r8_build_tables_dense(wide, 1) is None
