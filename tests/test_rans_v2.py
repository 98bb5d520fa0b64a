"""Dense-alphabet (v2) batched engine conformance.

The v2 engines (ops/rans_v2.py) must be byte-identical to the host
oracle (models/rans4x16.py, itself golden-tested against the C
reference) on both encode and decode, across alphabet sizes, block
lengths (incl. non-multiple-of-4 tails), shifts, and run structures.
"""

import numpy as np
import pytest

from htscodecs_tpu import native
from htscodecs_tpu.models import rans4x16
from htscodecs_tpu.ops import rans_v2
from htscodecs_tpu.utils import varint

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native host kernels unavailable")

rng = np.random.default_rng(7)


def mkdata(n, a, runs):
    if runs:
        vals = rng.choice(a, size=max(n // 4, 1))
        lens = rng.geometric(0.3, size=max(n // 4, 1)).clip(1, 50)
        seq = np.repeat(vals, lens)[:n]
        if len(seq) < n:
            seq = np.pad(seq, (0, n - len(seq)))
        return (seq + 33).astype(np.uint8)
    return (rng.integers(0, a, n) + 33).astype(np.uint8)


def _o1_group(blocks):
    B, N = blocks.shape
    hdrs, shs = [], np.zeros(B, np.int32)
    sts = np.zeros((B, 256, 256), np.uint32)
    frs = np.zeros_like(sts)
    for b in range(B):
        h, s, f, sh = native.build_tables_o1(blocks[b])
        hdrs.append(h)
        sts[b], frs[b], shs[b] = s, f, sh
    return hdrs, sts, frs, shs


@pytest.mark.parametrize("n", [64, 101, 1023, 4096])
@pytest.mark.parametrize("a", [2, 9, 40])
@pytest.mark.parametrize("runs", [False, True])
def test_o1_encode_matches_oracle(n, a, runs):
    B = 4
    blocks = np.stack([mkdata(n, a, runs) for _ in range(B)])
    ref = [rans4x16.compress(blocks[b], 1) for b in range(B)]
    hdrs, sts, frs, shs = _o1_group(blocks)
    for shift in np.unique(shs):
        sel = np.flatnonzero(shs == shift)
        r = rans_v2.densify_group(frs[sel].astype(np.uint16),
                                  sts[sel].astype(np.uint16))
        assert r is not None
        alpha, packed, _ = r
        states, words, counts = rans_v2.enc_o1_batch(
            blocks[sel], alpha, packed, int(shift))
        for k, b in enumerate(sel):
            head = bytearray([1])
            varint.put_uint(head, n)
            body = (hdrs[b] + states[k].astype("<u4").tobytes()
                    + words[k, :counts[k]].astype("<u2").tobytes())
            if len(body) >= n:       # oracle falls back to CAT
                continue
            assert bytes(head) + body == ref[b]


@pytest.mark.parametrize("n", [64, 101, 1023, 4096])
@pytest.mark.parametrize("a", [2, 9, 40])
def test_o1_decode_matches_oracle(n, a):
    B = 4
    blocks = np.stack([mkdata(n, a, True) for _ in range(B)])
    ref = [rans4x16.compress(blocks[b], 1) for b in range(B)]
    if any(s[0] != 1 for s in ref):
        pytest.skip("CAT fallback stream")
    parsed = []
    for s in ref:
        osz, pos = varint.get_uint(s, 1, len(s))
        off, _sfb, f2d, b2d, sh = native.parse_tables_o1(s[pos:])
        parsed.append((s, pos + off, f2d, b2d, sh))
    shift = parsed[0][4]
    assert all(p[4] == shift for p in parsed)
    Wmax = max((len(s) - o - 16) // 2 for s, o, *_ in parsed)
    X = np.zeros((B, 4), np.uint32)
    wbuf = np.zeros((B, max(Wmax, 1)), "<u2")
    for b, (s, o, *_t) in enumerate(parsed):
        X[b] = np.frombuffer(s[o:o + 16], "<u4")
        w = np.frombuffer(s[o + 16:o + 16 + 2 * ((len(s) - o - 16) // 2)],
                          "<u2")
        wbuf[b, :len(w)] = w
    alpha, packed, _ = rans_v2.densify_group(
        np.stack([p[2] for p in parsed]), np.stack([p[3] for p in parsed]))
    dec = rans_v2.dec_o1_batch(X, wbuf, n, alpha, packed, shift)
    assert np.array_equal(dec, blocks)


@pytest.mark.parametrize("n", [64, 103, 1024, 4097])
@pytest.mark.parametrize("a", [2, 17, 60])
def test_o0_roundtrip_matches_oracle(n, a):
    B = 4
    blocks = np.stack([mkdata(n, a, False) for _ in range(B)])
    ref = [rans4x16.compress(blocks[b], 0) for b in range(B)]
    if any(s[0] != 0 for s in ref):
        pytest.skip("CAT fallback stream")
    hdrs = []
    sts = np.zeros((B, 256), np.uint32)
    frs = np.zeros((B, 256), np.uint32)
    for b in range(B):
        h, s, f = native.build_tables_o0(blocks[b])
        hdrs.append(h)
        sts[b], frs[b] = s, f
    r = rans_v2.densify_group_o0(frs, sts)
    assert r is not None
    alpha, packed, _ = r
    states, words, counts = rans_v2.enc_o0_batch(blocks, alpha, packed)
    for b in range(B):
        head = bytearray([0])
        varint.put_uint(head, n)
        body = (hdrs[b] + states[b].astype("<u4").tobytes()
                + words[b, :counts[b]].astype("<u2").tobytes())
        if len(body) >= n:
            continue
        assert bytes(head) + body == ref[b]
    # decode side from the reference streams
    parsed = []
    for s in ref:
        osz, pos = varint.get_uint(s, 1, len(s))
        off, ssym, sfreq, sbase = native.parse_tables_o0(s[pos:])
        parsed.append((s, pos + off, sfreq, sbase))
    # rebuild per-symbol tables from the slot LUTs: sbase[m] is the
    # in-symbol offset m - start, so start = m - sbase[m] (any slot)
    frs2 = np.zeros((B, 256), np.uint32)
    sts2 = np.zeros((B, 256), np.uint32)
    for b, s in enumerate(ref):
        osz, pos = varint.get_uint(s, 1, len(s))
        off, ssym, sfreq, sbase = native.parse_tables_o0(s[pos:])
        sym = ssym.astype(np.int64)
        frs2[b, sym] = sfreq
        sts2[b, sym] = np.arange(len(ssym), dtype=np.uint32) - sbase
    alpha2, packed2, _ = rans_v2.densify_group_o0(frs2, sts2)
    Wmax = max((len(s) - o - 16) // 2 for s, o, *_ in parsed)
    X = np.zeros((B, 4), np.uint32)
    wbuf = np.zeros((B, max(Wmax, 1)), "<u2")
    for b, (s, o, *_t) in enumerate(parsed):
        X[b] = np.frombuffer(s[o:o + 16], "<u4")
        w = np.frombuffer(s[o + 16:o + 16 + 2 * ((len(s) - o - 16) // 2)],
                          "<u2")
        wbuf[b, :len(w)] = w
    dec = rans_v2.dec_o0_batch(X, wbuf, n, alpha2, packed2)
    assert np.array_equal(dec, blocks)


def test_compaction_overflow_fallback():
    """The two-level compaction must flag segment overflow and the
    exact single-sort path (seg_cap=SEG) must stay byte-identical."""
    import jax.numpy as jnp
    data = mkdata(8192, 40, False)
    blocks = np.stack([data] * 3)
    r = native.build_tables_o1_dense(data)
    assert r is not None
    _h, al, pk, sh = r
    alpha, packed, _ = rans_v2.densify_builds([(al, pk)] * 3)
    jb = jnp.asarray(blocks)
    ja, jp = jnp.asarray(alpha), jnp.asarray(packed)
    # a tiny cap must trip the overflow flag
    _, _, _, ovf = rans_v2._enc_scan_v2(jb, ja, jp, sh, 1, seg_cap=4)
    assert bool(np.asarray(ovf))
    # and the exact path must match the oracle stream
    st, w, cnt, ovf = rans_v2._enc_scan_v2(jb, ja, jp, sh, 1,
                                           seg_cap=rans_v2.SEG)
    assert not bool(np.asarray(ovf))
    st, w, cnt = np.asarray(st), np.asarray(w), np.asarray(cnt)
    ref = rans4x16.compress(data, 1)
    _osz, pos = varint.get_uint(ref, 1, len(ref))
    off, *_t = native.parse_tables_o1(ref[pos:])
    body = (st[0].astype("<u4").tobytes()
            + w[0, :cnt[0]].astype("<u2").tobytes())
    assert ref[pos + off:] == body


def test_dense_native_matches_sparse():
    """r16_build/parse_tables_o1_dense must agree with the sparse
    builders they replace."""
    data = mkdata(4096, 30, True)
    h1, st, fr, sh1 = native.build_tables_o1(data)
    al1, p1 = rans_v2.extract_dense(fr, st)
    r2 = native.build_tables_o1_dense(data)
    assert r2 is not None
    h2, al2, p2, sh2 = r2
    assert h1 == h2 and sh1 == sh2
    assert np.array_equal(al1, al2) and np.array_equal(p1, p2)
    s = rans4x16.compress(data, 1)
    if s[0] == 1:
        _osz, pos = varint.get_uint(s, 1, len(s))
        off1, _sfb, f2d, b2d, psh = native.parse_tables_o1(s[pos:])
        al3, p3 = rans_v2.extract_dense(f2d.astype(np.uint32),
                                        b2d.astype(np.uint32))
        off2, al4, p4, psh2 = native.parse_tables_o1_dense(s[pos:])
        assert off1 == off2 and psh == psh2
        idx = np.searchsorted(al4, al3)
        assert np.array_equal(p4[np.ix_(idx, idx)], p3)


@pytest.mark.parametrize("row_fetch", ["onehot", "take", "fma", "fma2",
                                       "b16", "mxu"])
@pytest.mark.parametrize("win", ["coarse", "fine", "xfine", "fine4",
                                 "w256", "w128", "w64", "w128u4"])
@pytest.mark.parametrize("a", [3, 44])
def test_decode_variants_byte_exact(row_fetch, win, a):
    """Every (row_fetch, win) decode formulation must produce
    identical bytes (they only reschedule arithmetic)."""
    n, B = 2049, 4
    blocks = np.stack([mkdata(n, a, True) for _ in range(B)])
    ref = [rans4x16.compress(blocks[b], 1) for b in range(B)]
    if any(s[0] != 1 for s in ref):
        pytest.skip("CAT fallback stream")
    parsed = []
    for s in ref:
        _osz, pos = varint.get_uint(s, 1, len(s))
        off, _sfb, f2d, b2d, sh = native.parse_tables_o1(s[pos:])
        parsed.append((s, pos + off, f2d, b2d, sh))
    shift = parsed[0][4]
    if any(p[4] != shift for p in parsed):
        pytest.skip("mixed shifts")
    if row_fetch == "fma" and shift > 10:
        pytest.skip("fma single-chain requires shift <= 10")
    Wmax = max((len(s) - o - 16) // 2 for s, o, *_ in parsed)
    X = np.zeros((B, 4), np.uint32)
    wbuf = np.zeros((B, max(Wmax, 1)), "<u2")
    for b, (s, o, *_t) in enumerate(parsed):
        X[b] = np.frombuffer(s[o:o + 16], "<u4")
        w = np.frombuffer(s[o + 16:o + 16 + 2 * ((len(s) - o - 16) // 2)],
                          "<u2")
        wbuf[b, :len(w)] = w
    alpha, packed, _ = rans_v2.densify_group(
        np.stack([p[2] for p in parsed]), np.stack([p[3] for p in parsed]))
    saved = rans_v2.get_dec_variant()
    try:
        rans_v2.set_dec_variant(row_fetch=row_fetch, win=win)
        dec = rans_v2.dec_o1_batch(X, wbuf, n, alpha, packed, shift)
    finally:
        rans_v2.set_dec_variant(**saved)
    assert np.array_equal(dec, blocks)


@pytest.mark.parametrize("row_fetch", ["take", "fma", "fma2", "b16", "mxu"])
@pytest.mark.parametrize("a", [3, 44])
def test_encode_variant_byte_exact(row_fetch, a):
    """Every alternative encode row fetch must emit the identical
    stream as the onehot baseline."""
    n, B = 2049, 4
    blocks = np.stack([mkdata(n, a, True) for _ in range(B)])
    _h, sts, frs, shs = _o1_group(blocks)
    if not (shs == shs[0]).all():
        pytest.skip("mixed shifts")
    if row_fetch == "fma" and int(shs[0]) > 10:
        pytest.skip("fma single-chain requires shift <= 10")
    r = rans_v2.densify_group(frs.astype(np.uint16), sts.astype(np.uint16))
    assert r is not None
    alpha, packed, _ = r
    saved = rans_v2.get_enc_variant()
    try:
        rans_v2.set_enc_variant(row_fetch="onehot")
        s1, w1, c1 = rans_v2.enc_o1_batch(blocks, alpha, packed, int(shs[0]))
        rans_v2.set_enc_variant(row_fetch=row_fetch)
        s2, w2, c2 = rans_v2.enc_o1_batch(blocks, alpha, packed, int(shs[0]))
    finally:
        rans_v2.set_enc_variant(**saved)
    assert np.array_equal(s1, s2) and np.array_equal(c1, c2)
    for b in range(B):
        assert np.array_equal(w1[b, :c1[b]], w2[b, :c2[b]])


@pytest.mark.parametrize("seg_cap", [rans_v2.SEG_CAP, rans_v2.SEG_CAP2,
                                     rans_v2.SEG])
@pytest.mark.parametrize("a", [3, 44])
def test_encode_compact_col_byte_exact(seg_cap, a):
    """The scan-layout ('col') compaction must emit the identical
    stream as the row-transpose scheme at every cap tier."""
    import jax.numpy as jnp
    n, B = 2049, 4
    blocks = np.stack([mkdata(n, a, True) for _ in range(B)])
    _h, sts, frs, shs = _o1_group(blocks)
    if not (shs == shs[0]).all():
        pytest.skip("mixed shifts")
    r = rans_v2.densify_group(frs.astype(np.uint16), sts.astype(np.uint16))
    assert r is not None
    alpha, packed, _ = r
    args = (jnp.asarray(blocks), jnp.asarray(alpha), jnp.asarray(packed),
            int(shs[0]), 1)
    s1, w1, c1, o1 = rans_v2._enc_scan_v2(*args, seg_cap=seg_cap,
                                          compact="row")
    s2, w2, c2, o2 = rans_v2._enc_scan_v2(*args, seg_cap=seg_cap,
                                          compact="col")
    assert bool(np.asarray(o1)) == bool(np.asarray(o2))
    if bool(np.asarray(o1)):
        pytest.skip("segment overflow at this cap")
    c1, c2 = np.asarray(c1), np.asarray(c2)
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert np.array_equal(c1, c2)
    w1, w2 = np.asarray(w1), np.asarray(w2)
    for b in range(B):
        assert np.array_equal(w1[b, :c1[b]], w2[b, :c2[b]])


def test_wide_alphabet_rejected():
    blocks = np.stack([np.arange(256, dtype=np.uint8)] * 2)
    _h, sts, frs, _sh = _o1_group(blocks)
    assert rans_v2.densify_group(frs.astype(np.uint16),
                                 sts.astype(np.uint16)) is None
