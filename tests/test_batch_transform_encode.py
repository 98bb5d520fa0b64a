"""Batched transform-flagged ENCODE (models/batch.py deferred-entropy
path) must emit byte-identical streams to the per-block encoder for
every make-check order (reference tests/rans4x16.test:12)."""

import pathlib

import numpy as np
import pytest

from htscodecs_tpu.models import batch as batchmod
from htscodecs_tpu.models import rans4x16

ORDERS = [0, 1, 64, 65, 128, 129, 192, 193, 8, 9,
          9 + (2 << 8), 8 + (8 << 8), 65 + (4 << 8) + 8,
          2, 66, 130]  # odd low-nibble values code order-0 bodies

DAT = pathlib.Path("/root/reference/tests/dat")


def _blocks():
    rng = np.random.default_rng(17)
    out = []
    # real quality data when available (packable alphabets)
    for nm in ("q4", "q8"):
        f = DAT / nm
        if f.exists():
            raw = np.frombuffer(f.read_bytes(), np.uint8)
            n = 1999
            nb = min(len(raw) // n, 20)
            out += list(raw[:nb * n].reshape(nb, n))
    if not out:
        out = list((rng.integers(0, 4, (20, 1999)) * 3 + 33).astype(np.uint8))
    # synthetic runs (RLE-friendly)
    v = rng.choice(3, size=(10, 731), p=[.8, .1, .1]).astype(np.uint8)
    out += list(np.repeat(v, 3, axis=1)[:, :731] + 60)
    # a couple of tiny blocks (<=20 strips STRIPE)
    out += list(rng.integers(33, 40, (3, 11)).astype(np.uint8))
    return out


@pytest.mark.parametrize("order", ORDERS)
def test_transform_encode_matches_host(order, monkeypatch):
    monkeypatch.setattr(batchmod, "DEVICE_MIN_GROUP", 4)
    blocks = _blocks()
    got = batchmod.compress_blocks(blocks, order, engine="device")
    for i, b in enumerate(blocks):
        exp = rans4x16.compress(b, order)
        assert got[i] == exp, (order, i, len(got[i]), len(exp))
    # and they round-trip through the batched decoder
    back = batchmod.uncompress_blocks(got)
    for i, b in enumerate(blocks):
        assert back[i] == b.tobytes(), (order, i)
