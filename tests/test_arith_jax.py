"""Batched device adaptive-arith engine conformance.

ops/arith_jax.py must be bitstream-identical to the host oracle
(models/arith.py, golden-tested against the C reference) for both
orders, on encode and decode, including the carry/0xFF-run deferral
and the max-symbol fallback.
"""

import numpy as np
import pytest

from htscodecs_tpu.models import arith as arithmod
from htscodecs_tpu.models import batch
from htscodecs_tpu.models.arith import _enc_o0, _enc_o1
from htscodecs_tpu.ops import arith_jax

rng = np.random.default_rng(23)


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


@pytest.mark.parametrize("order", [0, 1])
@pytest.mark.parametrize("n,a,runs", [(64, 3, False), (257, 9, False),
                                      (1000, 40, True), (4097, 60, True)])
def test_engine_matches_oracle(order, n, a, runs):
    B = 3
    blocks = np.stack([mkdata(n, a, runs) for _ in range(B)])
    ms = blocks.max(axis=1).astype(np.int32) + 1
    lens = np.full(B, n, np.int32)
    enc_fn = _enc_o1 if order else _enc_o0
    refs = [enc_fn(list(b)) for b in blocks]
    res = arith_jax.enc_batch(blocks, lens, ms, order)
    assert res is not None
    for b in range(B):
        assert bytes([int(ms[b]) & 0xFF]) + res[b] == refs[b]
    dec = arith_jax.dec_batch([r[1:] for r in refs], [n] * B, list(ms),
                              order)
    assert dec is not None
    for b in range(B):
        assert np.array_equal(dec[b][:n], blocks[b])


def test_wide_max_sym_falls_back():
    blocks = np.stack([(rng.integers(0, 70, 512) + 150).astype(np.uint8)] * 2)
    ms = blocks.max(axis=1).astype(np.int32) + 1
    assert arith_jax.enc_batch(blocks, np.full(2, 512, np.int32),
                               ms, 0) is None
    assert arith_jax.dec_batch([b"x" * 64] * 2, [512] * 2,
                               list(ms), 0) is None


@pytest.mark.parametrize("order", [0, 1])
def test_batch_api_device_engine(order):
    blocks = [mkdata(n, 7, True) for n in (512, 512, 300, 4)]
    streams = batch.arith_compress_blocks(blocks, order, engine="device")
    for b, s in zip(blocks, streams):
        assert s == arithmod.compress(b, order)
    dec = batch.arith_uncompress_blocks(streams, engine="device")
    for b, d in zip(blocks, dec):
        assert d == b.tobytes()


def test_ff_run_expansion():
    evt = np.array([(0 << 9) | 0x41, (3 << 9) | 0x42,
                    (2 << 9) | 0x100 | 0x43], np.uint32)
    got = arith_jax._expand_events(evt, b"T")
    assert got == b"\x41\x42\xff\xff\xff\x43\x00\x00T"
