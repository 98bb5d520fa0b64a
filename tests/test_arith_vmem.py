"""VMEM adaptive range-coder engine (ops/arith_vmem.py), interpret
mode: byte-exact vs the XLA scan engine (itself validated against the
C oracles) and the host codec, both directions.

Reference semantics: htscodecs/c_range_coder.h:46-127,
htscodecs/c_simple_model.h:85-179, arith_dynamic.c:98-158 (order 0).
"""

import numpy as np
import pytest

from htscodecs_tpu.ops import arith_jax, arith_vmem
from htscodecs_tpu.models import arith as arithmod


def _mk(B, N, A, seed):
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, A, (B, N)).astype(np.uint8)
    blocks = (blocks * blocks // max(A // 3, 1) % A).astype(np.uint8)
    lens = np.full(B, N, np.int32)
    lens[1 % B] = max(N - 7, 1)
    ms = blocks.max(axis=1).astype(np.int32) + 1
    return blocks, lens, ms


@pytest.mark.parametrize("B,N,A", [(128, 100, 6), (130, 64, 40)])
def test_enc_matches_xla_and_host(B, N, A):
    blocks, lens, ms = _mk(B, N, A, 3)
    ref = arith_jax.enc_batch(blocks, lens, ms, 0)
    got = arith_vmem.enc_batch(blocks, lens, ms, 0, interpret=True)
    assert got is not None
    for k, (a, b) in enumerate(zip(ref, got)):
        assert a == b, k
    for b in (0, 1, B - 1):
        full = arithmod.compress(blocks[b][:lens[b]].tobytes(), 0)
        assert full.endswith(got[b]), b


@pytest.mark.parametrize("B,N,A", [(128, 100, 6), (130, 64, 40)])
def test_dec_roundtrip(B, N, A):
    blocks, lens, ms = _mk(B, N, A, 5)
    enc = arith_vmem.enc_batch(blocks, lens, ms, 0, interpret=True)
    dec = arith_vmem.dec_batch(enc, lens.tolist(), ms.tolist(), 0,
                               interpret=True)
    assert dec is not None
    for b in range(B):
        assert np.array_equal(dec[b][:lens[b]], blocks[b][:lens[b]]), b


def test_dec_matches_host_streams():
    """Decode C-oracle-equivalent streams produced by the host codec."""
    rng = np.random.default_rng(9)
    B, N = 128, 160
    blocks = (rng.integers(0, 5, (B, N)) ** 2 % 11).astype(np.uint8)
    streams = []
    ms = []
    for b in range(B):
        full = arithmod.compress(blocks[b].tobytes(), 0)
        # frame: order byte, varint osz, max-sym byte, payload
        from htscodecs_tpu.utils import varint
        osz, pos = varint.get_uint(full, 1, len(full))
        assert osz == N
        ms.append(full[pos])
        streams.append(full[pos + 1:])
    dec = arith_vmem.dec_batch(streams, [N] * B, ms, 0, interpret=True)
    assert dec is not None
    for b in range(B):
        assert np.array_equal(dec[b], blocks[b]), b


def test_order1_and_wide_fall_back():
    blocks, lens, ms = _mk(64, 32, 6, 1)
    assert arith_vmem.enc_batch(blocks, lens, ms, 1) is None
    ms_wide = np.full_like(ms, 200)
    assert arith_vmem.enc_batch(blocks, lens, ms_wide, 0) is None
