"""Native host kernels must agree byte-for-byte with the Python oracle."""

import numpy as np
import pytest

from htscodecs_tpu import native
from htscodecs_tpu.models import rans4x16
from htscodecs_tpu.utils import varint

pytestmark = pytest.mark.skipif(not native.available(), reason="no compiler")


def _body(stream: bytes) -> bytes:
    # strip the wrapper's order byte + varint size
    _, pos = varint.get_uint(stream, 1, len(stream))
    return stream[pos:]


@pytest.mark.parametrize("order", [0, 1])
def test_native_matches_python_oracle(order):
    import htscodecs_tpu.models.rans4x16 as m
    rng = np.random.default_rng(order)
    cases = [
        rng.integers(0, 40, 512, dtype=np.uint8) + 33,
        rng.integers(0, 4, 8191, dtype=np.uint8) * 60,
        np.repeat(rng.integers(0, 16, 100, dtype=np.uint8), rng.integers(1, 40, 100)).astype(np.uint8),
        np.full(999, 7, dtype=np.uint8),
        rng.integers(0, 256, 10000, dtype=np.uint8),
    ]
    saved = m._USE_NATIVE
    try:
        for data in cases:
            m._USE_NATIVE = True
            nat = rans4x16.compress(data, order)
            m._USE_NATIVE = False
            pyo = rans4x16.compress(data, order)
            assert nat == pyo

            m._USE_NATIVE = True
            assert rans4x16.uncompress(nat) == data.tobytes()
            m._USE_NATIVE = False
            assert rans4x16.uncompress(nat) == data.tobytes()
    finally:
        m._USE_NATIVE = saved


def test_table_prep_matches_full_encode():
    rng = np.random.default_rng(9)
    data = (rng.integers(0, 30, 4096, dtype=np.uint8) + 33)
    hdr, st, fr = native.build_tables_o0(data)
    full = native.enc_o0(data)
    assert full.startswith(hdr)
    r = native.build_tables_o1(data)
    hdr1, st1, fr1, shift = r
    full1 = native.enc_o1(data)
    assert full1.startswith(hdr1)
    # parse side must invert build side
    off, ssym, sfreq, sbase = native.parse_tables_o0(full)
    assert off == len(hdr)
    off1, sfb, f2d, b2d, shift2 = native.parse_tables_o1(full1)
    assert off1 == len(hdr1) and shift2 == shift
    assert (f2d == fr1.astype(np.uint16)).all()
    used = fr1 > 0  # zero-freq slots are never coded; fill values differ
    assert (b2d[used] == st1.astype(np.uint16)[used]).all()
