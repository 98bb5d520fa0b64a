"""Conformance tests for the rANS 4x8 codec (rans4x8.test parity)."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from htscodecs_tpu.models import rans4x8


def c_compress(ref_tools, data: bytes, order: int) -> bytes:
    with tempfile.TemporaryDirectory() as td:
        fi, fo = os.path.join(td, "i"), os.path.join(td, "o")
        open(fi, "wb").write(data)
        subprocess.run(
            [str(ref_tools / "rANS_static_test"), "-r", f"-o{order}", fi, fo],
            check=True, capture_output=True,
        )
        return open(fo, "rb").read()


@pytest.mark.parametrize("order", [0, 1])
def test_golden_fixtures(qdata, dat_dir, order):
    for name, data in qdata.items():
        golden = dat_dir / "r4x8" / f"{name}.{order}"
        if not golden.exists():
            continue
        ref = golden.read_bytes()
        mine = rans4x8.compress(np.frombuffer(data, np.uint8), order)
        assert mine == ref, f"encode mismatch: {name} order {order}"
        assert rans4x8.uncompress(ref) == data, f"decode mismatch: {name}"


@pytest.mark.parametrize("order", [0, 1])
def test_oracle_edge_sizes(ref_tools, order):
    rng = np.random.default_rng(3 + order)
    for n in (1, 2, 3, 4, 5, 6, 7, 8, 9, 63, 100, 4095, 4096, 4097):
        data = bytes(rng.integers(0, 40, n, dtype=np.uint8) + 33)
        ref = c_compress(ref_tools, data, order)
        mine = rans4x8.compress(np.frombuffer(data, np.uint8), order)
        assert mine == ref, f"n={n}"
        assert rans4x8.uncompress(mine) == data


@pytest.mark.parametrize("order", [0, 1])
def test_oracle_distributions(ref_tools, order):
    rng = np.random.default_rng(17)
    cases = [
        np.full(1000, 7, dtype=np.uint8),                       # constant
        (rng.integers(0, 2, 999, dtype=np.uint8) * 200 + 1),    # 2 symbols
        np.repeat(rng.integers(0, 8, 64, dtype=np.uint8), 97),  # runs
        rng.integers(0, 256, 2048, dtype=np.uint8),             # uniform
    ]
    for arr in cases:
        data = bytes(arr.astype(np.uint8))
        ref = c_compress(ref_tools, data, order)
        mine = rans4x8.compress(np.frombuffer(data, np.uint8), order)
        assert mine == ref
        assert rans4x8.uncompress(mine) == data


def test_malformed_rejected():
    for blob in (b"", b"\x02" + bytes(30), bytes(9), b"\x00" + bytes(30)):
        with pytest.raises(ValueError):
            rans4x8.uncompress(blob)
