"""Conformance tests for the on-device table builders (ops/tables_v2).

Every device-built table must match the native C builder bit-for-bit:
serialized header bytes, packed dense tables, alphabet, and the 10/12
shift decision (reference rANS_static4x16pr.c:116-161,629-691).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from htscodecs_tpu import native
from htscodecs_tpu.models import batch as batchmod
from htscodecs_tpu.models import rans4x16
from htscodecs_tpu.ops import tables_v2

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native kernels unavailable")


def _cases():
    # shapes are deliberately uniform (B=4, N=2048 except two odd-size
    # cases): every distinct (B, N, A-bucket) costs a fresh CPU jit
    rng = np.random.default_rng(123)
    N, B = 2048, 4
    out = []
    syms = np.array([35, 45, 56, 70], np.uint8)
    vals = rng.choice(4, size=(B, N), p=[.05, .1, .15, .7])
    out.append(("a4", syms[vals]))
    out.append(("a8uni", (rng.integers(0, 8, (B, N)) + 33).astype(np.uint8)))
    p = np.exp(-0.2 * np.arange(40)); p /= p.sum()
    out.append(("a40", (rng.choice(40, size=(B, N), p=p) + 33).astype(np.uint8)))
    out.append(("single", np.full((B, N), 77, np.uint8)))
    out.append(("two", np.where(rng.random((B, N)) < 0.999, 40, 41).astype(np.uint8)))
    out.append(("zero", (rng.integers(0, 5, (B, N)) * 7).astype(np.uint8)))
    out.append(("a90", (rng.integers(0, 90, (B, N)) + 33).astype(np.uint8)))
    out.append(("odd", rng.integers(33, 43, (B, 1237)).astype(np.uint8)))
    # flat small rows stress the normaliser's retry/redistribute paths
    out.append(("flat", (rng.integers(0, 64, (B, 300)) + 33).astype(np.uint8)))
    return out


@pytest.mark.parametrize("name,blocks", _cases())
def test_o1_build_matches_native(name, blocks):
    r = tables_v2.build_o1_device(blocks)
    assert r is not None
    alpha_d, packed_d, asz, fhdr, shift, flag, A = r
    alpha_d = np.asarray(alpha_d)
    packed_d = np.asarray(packed_d)
    hdrs = native.serialize_o1_dense_batch(alpha_d, asz, fhdr, shift)
    assert hdrs is not None
    for b in range(blocks.shape[0]):
        ref = native.build_tables_o1_dense(blocks[b])
        assert ref is not None
        h_ref, al_ref, pk_ref, sh_ref = ref
        if flag[b]:
            continue  # near-band: wrapper rebuilds on host
        a = len(al_ref)
        assert asz[b] == a, name
        assert np.array_equal(alpha_d[b, :a], al_ref), name
        assert shift[b] == sh_ref, name
        assert np.array_equal(packed_d[b, :a, :a], pk_ref), name
        assert hdrs[b] == h_ref, name


@pytest.mark.parametrize("name,blocks", _cases())
def test_o0_build_matches_native(name, blocks):
    r = tables_v2.build_o0_device(blocks)
    assert r is not None
    alpha_d, packed_d, asz, fhdr, A = r
    hdrs = native.serialize_o0_batch(fhdr)
    assert hdrs is not None
    for b in range(blocks.shape[0]):
        h_ref, st_ref, fr_ref = native.build_tables_o0(blocks[b])
        assert hdrs[b] == h_ref, name
        a = asz[b]
        al = np.asarray(alpha_d)[b, :a]
        exp = ((st_ref[al].astype(np.int64) << 13) | fr_ref[al]).astype(np.int32)
        assert np.array_equal(np.asarray(packed_d)[b, :a], exp), name


@pytest.mark.parametrize("order", [0, 1])
def test_wrapper_devtables_streams_byte_exact(order, monkeypatch):
    """compress_blocks through the device-table path emits the same
    streams as the per-block host encoder."""
    monkeypatch.setattr(batchmod, "TABLES_DEVICE_MIN", 8)
    rng = np.random.default_rng(5)
    N, B = 640, 24
    blocks = (rng.integers(0, 10, (B, N)) + 33).astype(np.uint8)
    got = batchmod.compress_blocks(list(blocks), order,
                                   engine="device")
    for b in range(B):
        assert got[b] == rans4x16.compress(blocks[b], order), b
    back = batchmod.uncompress_blocks(got)
    for b in range(B):
        assert back[b] == blocks[b].tobytes()


def test_shift_band_resolution():
    """Run-structured quality data sits right at the e10/e12=1.01
    boundary; banded blocks must resolve via the exact f64 replay so
    that every unflagged block's shift matches the C builder."""
    rng = np.random.default_rng(11)
    N, B = 16384, 6
    syms = np.array([35, 45, 56, 70], np.uint8)
    blocks = np.empty((B, N), np.uint8)
    for b in range(B):
        vals = rng.choice(4, size=N // 8, p=[.05, .1, .15, .7])
        lens = rng.geometric(0.25, size=N // 8).clip(1, 60)
        seq = np.repeat(vals, lens)[:N]
        if len(seq) < N:
            seq = np.pad(seq, (0, N - len(seq)), constant_values=3)
        blocks[b] = syms[seq]
    r = tables_v2.build_o1_device(blocks)
    assert r is not None
    alpha_d, packed_d, asz, fhdr, shift, flag, A = r
    hdrs = native.serialize_o1_dense_batch(
        np.asarray(alpha_d), asz, fhdr, shift)
    for b in range(B):
        ref = native.build_tables_o1_dense(blocks[b])
        if flag[b]:
            continue
        assert shift[b] == ref[3], b
        assert hdrs[b] == ref[0], b


def test_devtables_random_fuzz():
    """Randomised distributions: device tables must match the host
    builder (or flag out) on every block."""
    rng = np.random.default_rng(999)
    for trial in range(8):
        N, B = 777, 4         # fixed shape: one jit variant per bucket
        a = int(rng.integers(1, 90))
        logits = rng.normal(0, rng.uniform(0.2, 4.0), a)
        p = np.exp(logits); p /= p.sum()
        lo = int(rng.integers(0, 120))
        blocks = (rng.choice(a, size=(B, N), p=p) + lo).astype(np.uint8)
        r = tables_v2.build_o1_device(blocks)
        assert r is not None
        alpha_d, packed_d, asz, fhdr, shift, flag, A = r
        hdrs = native.serialize_o1_dense_batch(
            np.asarray(alpha_d), asz, fhdr, shift)
        for b in range(B):
            if flag[b]:
                continue
            ref = native.build_tables_o1_dense(blocks[b])
            h_ref, al_ref, pk_ref, sh_ref = ref
            assert shift[b] == sh_ref, (trial, b)
            assert hdrs[b] == h_ref, (trial, b)
            aa = len(al_ref)
            assert np.array_equal(
                np.asarray(packed_d)[b, :aa, :aa], pk_ref), (trial, b)


def test_pack_freqs12_transport_roundtrip():
    """The 12-bit header-frequency transport (bench's 'p12' hdr_src)
    must reproduce the u16 table exactly and serialize to identical
    header bytes."""
    rng = np.random.default_rng(3)
    B, N = 8, 4096
    blocks = rng.choice(
        np.arange(64, 72, dtype=np.uint8), size=(B, N),
        p=[0.4, 0.3, 0.1, 0.1, 0.05, 0.025, 0.02, 0.005])
    # symbol 90 is always followed by 91: a deterministic context row
    blocks[:, 100:900:2] = 90
    blocks[:, 101:901:2] = 91
    r = tables_v2.build_o1_device(blocks)
    assert r is not None
    alpha_d, packed_d, asz, fhdr, shift, flag, A = r
    pk = np.asarray(tables_v2.pack_freqs12(fhdr))
    back = tables_v2.unpack_freqs12_host(pk, fhdr.shape[1])
    np.testing.assert_array_equal(back, fhdr)
    h_ref = native.serialize_o1_dense_batch(
        np.asarray(alpha_d), asz, fhdr, shift)
    h_p12 = native.serialize_o1_dense_batch(
        np.asarray(alpha_d), asz, back, shift)
    assert h_p12 == h_ref


def test_pack_freqs12_restores_4096():
    """A one-symbol context row normalised to the full 1<<12 packs as
    4095 and must come back as 4096 (rows legitimately sum to powers
    of two, so the 4095 row sum is unambiguous)."""
    A = 5
    f = np.zeros((2, A, A), np.uint16)
    f[0, 0, 2] = 4096                      # deterministic row
    f[0, 1] = [1024, 1024, 1024, 512, 512]
    f[0, 2] = [4095, 1, 0, 0, 0]           # legitimate 4095 entry
    f[1, 3] = [2, 2, 0, 0, 0]
    pk = np.asarray(tables_v2.pack_freqs12(jnp.asarray(f)))
    back = tables_v2.unpack_freqs12_host(pk, A)
    np.testing.assert_array_equal(back, f)


def test_pack_freqs_sparse12_roundtrip():
    """The sparse 12-bit transport (bench's 's12' hdr_src): presence
    bitmap + front-compacted nonzeros must reproduce the u16 table
    exactly, including when the host pulls only a tier prefix of the
    value rows."""
    rng = np.random.default_rng(7)
    B, N = 8, 4096
    blocks = rng.choice(
        np.arange(64, 72, dtype=np.uint8), size=(B, N),
        p=[0.4, 0.3, 0.1, 0.1, 0.05, 0.025, 0.02, 0.005])
    blocks[:, 100:900:2] = 90
    blocks[:, 101:901:2] = 91
    r = tables_v2.build_o1_device(blocks)
    assert r is not None
    alpha_d, packed_d, asz, fhdr, shift, flag, A = r
    bm, v12, cnts, mx = tables_v2.pack_freqs_sparse12(jnp.asarray(fhdr))
    bm, v12 = np.asarray(bm), np.asarray(v12)
    mx = int(np.asarray(mx))
    assert int(np.asarray(cnts).max()) == mx
    # full-width pull
    back = tables_v2.unpack_freqs_sparse12_host(bm, v12, fhdr.shape[1])
    np.testing.assert_array_equal(back, fhdr)
    # tier-prefix pull: the narrowest 3-byte-group prefix covering mx
    tp = -(-mx // 2)
    back2 = tables_v2.unpack_freqs_sparse12_host(
        bm, v12[:, :3 * tp], fhdr.shape[1])
    np.testing.assert_array_equal(back2, fhdr)
    # a prefix narrower than the max count must fail loudly
    if tp > 1:
        with pytest.raises(ValueError):
            tables_v2.unpack_freqs_sparse12_host(
                bm, v12[:, :3 * (tp - 1)], fhdr.shape[1])


def test_pack_freqs_sparse12_restores_4096():
    """4096 packs as 4095 in the sparse form too and is restored via
    the power-of-two row-sum invariant."""
    A = 5
    f = np.zeros((2, A, A), np.uint16)
    f[0, 0, 2] = 4096
    f[0, 1] = [1024, 1024, 1024, 512, 512]
    f[0, 2] = [4095, 1, 0, 0, 0]
    f[1, 3] = [2, 2, 0, 0, 0]
    bm, v12, cnts, mx = tables_v2.pack_freqs_sparse12(jnp.asarray(f))
    back = tables_v2.unpack_freqs_sparse12_host(
        np.asarray(bm), np.asarray(v12), A)
    np.testing.assert_array_equal(back, f)


def test_serialize_o1_sparse12_matches_dense():
    """The native C sparse-transport consumer
    (r16_serialize_o1_sparse12_batch) must emit byte-identical headers
    to the dense serializer, for full-width AND tier-prefix value
    pulls, and reject a too-narrow prefix / corrupt rows loudly."""
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(11)
    B, N = 16, 8192
    p = np.exp(-np.arange(40) / 9.0)
    p /= p.sum()
    blocks = rng.choice(np.arange(33, 73, dtype=np.uint8), (B, N), p=p)
    r = tables_v2.build_o1_device(blocks)
    assert r is not None
    alpha_d, packed_d, asz, fhdr, shift, flag, A = r
    alpha = np.asarray(alpha_d)
    dense = native.serialize_o1_dense_batch(alpha, asz, fhdr, shift)
    bm, v12, cnts, mx = tables_v2.pack_freqs_sparse12(jnp.asarray(fhdr))
    bm, v12 = np.asarray(bm), np.asarray(v12)
    sparse = native.serialize_o1_sparse12_batch(alpha, asz, bm, v12,
                                                shift)
    assert sparse == dense
    tp = -(-int(np.asarray(mx)) // 2)
    sparse2 = native.serialize_o1_sparse12_batch(
        alpha, asz, bm, v12[:, :3 * tp], shift)
    assert sparse2 == dense
    if tp > 1:
        with pytest.raises(ValueError):
            native.serialize_o1_sparse12_batch(
                alpha, asz, bm, v12[:, :3 * (tp - 1)], shift)
    # corrupt one value -> the row total stops being a power of two
    bad = v12.copy()
    bad[0, 0] ^= 0x3F
    with pytest.raises(ValueError):
        native.serialize_o1_sparse12_batch(alpha, asz, bm, bad, shift)


def test_serialize_o1_sparse12_restores_4096():
    """A deterministic context row (single freq 4096) survives the
    12-bit wrap through the C consumer."""
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    A = 5
    f = np.zeros((2, A, A), np.uint16)
    f[0, 0, 2] = 4096
    f[0, 1] = [1024, 1024, 1024, 512, 512]
    f[0, 2] = [4095, 1, 0, 0, 0]
    f[1, 3] = [2, 2, 0, 0, 0]
    alpha = np.tile(np.arange(33, 33 + A, dtype=np.uint8), (2, 1))
    asz = np.full(2, A, np.int32)
    shift = np.full(2, 12, np.int32)
    dense = native.serialize_o1_dense_batch(alpha, asz, f, shift)
    bm, v12, cnts, mx = tables_v2.pack_freqs_sparse12(jnp.asarray(f))
    sparse = native.serialize_o1_sparse12_batch(
        alpha, asz, np.asarray(bm), np.asarray(v12), shift)
    assert sparse == dense
