"""Pipelined small-batch stream encoder (parallel/streaming.py).

Streams must be byte-identical to rans4x16.compress for plain order
0/1 across pipelined batches, including the host-fallback (wide
alphabet) and CAT-expansion paths.
"""

import numpy as np
import pytest

from htscodecs_tpu import native
from htscodecs_tpu.models import rans4x16
from htscodecs_tpu.parallel import streaming

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native host kernels unavailable")

rng = np.random.default_rng(21)


def _mk_batch(B, N, a, seed):
    r = np.random.default_rng(seed)
    b = r.integers(33, 33 + a, size=(B, N)).astype(np.uint8)
    half = b[:, 0::2][:, :b[:, 1::2].shape[1]]
    b[:, 1::2] = half
    return b


@pytest.mark.parametrize("order", [0, 1])
def test_stream_encoder_matches_single_block(order):
    batches = [_mk_batch(8, 512, a, s)
               for a, s in ((6, 1), (24, 2), (40, 3))]
    got = list(streaming.encode_batches(iter(batches), order=order,
                                        depth=2))
    assert len(got) == len(batches)
    for batch, streams in zip(batches, got):
        for b in range(batch.shape[0]):
            assert streams[b] == rans4x16.compress(batch[b], order)


def test_stream_encoder_wide_alphabet_fallback():
    batch = rng.integers(0, 250, size=(4, 400)).astype(np.uint8)
    enc = streaming.StreamEncoder(order=1, depth=2)
    enc.submit(batch)
    (streams,) = enc.finish()
    for b in range(4):
        assert streams[b] == rans4x16.compress(batch[b], 1)


def test_stream_encoder_depth_bounds_in_flight():
    enc = streaming.StreamEncoder(order=1, depth=2)
    batches = [_mk_batch(8, 256, 8, 10 + k) for k in range(4)]
    outs = []
    for bt in batches:
        enc.submit(bt)
        outs += enc.drain_ready()
        assert len(enc._q) <= 2
    outs += enc.finish()
    assert len(outs) == 4
    for batch, streams in zip(batches, outs):
        for b in range(batch.shape[0]):
            assert streams[b] == rans4x16.compress(batch[b], 1)


def test_stream_encoder_s12_prefix_learning():
    """The sparse header transport learns a value-prefix width from
    batch k and re-pulls the full width when batch k+1's tables are
    denser — streams stay byte-identical either way."""
    enc = streaming.StreamEncoder(order=1, depth=2, hdr="s12")
    sparse = _mk_batch(8, 2048, 6, 31)     # few nonzeros -> narrow
    dense = _mk_batch(8, 2048, 48, 32)     # many nonzeros -> re-pull
    outs = []
    for bt in (sparse, dense, sparse):
        enc.submit(bt)
        outs += enc.drain_ready()
    outs += enc.finish()
    assert enc._nzpairs is not None
    for batch, streams in zip((sparse, dense, sparse), outs):
        for b in range(batch.shape[0]):
            assert streams[b] == rans4x16.compress(batch[b], 1)
