"""Conformance tests for the rANS 4x16 codec.

Mirrors the reference's make-check strategy (rans4x16.test): encoder
output must be byte-identical to the C reference (golden files and
oracle runs), and pre-compressed golden streams must decode back to the
original input.
"""

import subprocess

import numpy as np
import pytest

from htscodecs_tpu.models import rans4x16

ORDERS = [0, 1, 64, 65, 128, 129, 192, 193, 8, 9]


def c_compress(ref_tools, data: bytes, order: int) -> bytes:
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        fi = os.path.join(td, "in")
        fo = os.path.join(td, "out")
        open(fi, "wb").write(data)
        subprocess.run(
            [str(ref_tools / "rANS_static4x16pr_test"), "-r", f"-o{order}", fi, fo],
            check=True, capture_output=True,
        )
        return open(fo, "rb").read()


def c_uncompress(ref_tools, blob: bytes) -> bytes:
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        fi = os.path.join(td, "in")
        fo = os.path.join(td, "out")
        open(fi, "wb").write(blob)
        subprocess.run(
            [str(ref_tools / "rANS_static4x16pr_test"), "-r", "-d", fi, fo],
            check=True, capture_output=True,
        )
        return open(fo, "rb").read()


@pytest.mark.parametrize("order", ORDERS)
def test_golden_fixtures(qdata, dat_dir, order):
    """Byte-exact encode + golden decode on every checked-in vector."""
    for name, data in qdata.items():
        golden = dat_dir / "r4x16" / f"{name}.{order}"
        if not golden.exists():
            continue
        ref = golden.read_bytes()
        mine = rans4x16.compress(np.frombuffer(data, np.uint8), order)
        assert mine == ref, f"encode mismatch: {name} order {order}"
        assert rans4x16.uncompress(ref) == data, f"decode mismatch: {name} order {order}"


@pytest.mark.parametrize("order", ORDERS)
def test_oracle_small_inputs(ref_tools, order):
    """Edge sizes and synthetic distributions against the C oracle."""
    rng = np.random.default_rng(42 + order)
    cases = [
        b"",
        b"A",
        b"AB",
        b"ABAB" * 3,
        bytes(rng.integers(0, 4, 21, dtype=np.uint8) + 33),
        bytes(rng.integers(0, 2, 100, dtype=np.uint8) * 9 + 33),
        bytes(np.repeat(rng.integers(0, 16, 40, dtype=np.uint8), rng.integers(1, 20, 40)).astype(np.uint8)),
        bytes(rng.integers(0, 256, 1000, dtype=np.uint8)),
        bytes(np.full(500, 77, dtype=np.uint8)),
        bytes(rng.integers(0, 40, 4097, dtype=np.uint8) + 33),
    ]
    for data in cases:
        ref = c_compress(ref_tools, data, order)
        mine = rans4x16.compress(np.frombuffer(data, np.uint8), order)
        assert mine == ref, f"encode mismatch len={len(data)} order={order}"
        if data:
            assert rans4x16.uncompress(mine) == data


def test_stripe_n_variants(ref_tools):
    rng = np.random.default_rng(7)
    data = bytes((rng.integers(0, 64, 4000, dtype=np.uint8) + 33))
    for n in (2, 3, 4, 5, 7, 8):
        order = 8 + (n << 8)
        mine = rans4x16.compress(np.frombuffer(data, np.uint8), order)
        assert rans4x16.uncompress(mine) == data
        # cross-validate against the C decoder
        assert c_uncompress(ref_tools, mine) == data


def test_malformed_streams_rejected():
    # The C reference either errors on these or (for the stripe one)
    # hits undefined behaviour; we must reject them all cleanly.
    for blob in (b"", b"\x00\x05abc", b"\x08\x10\x00", bytes(20)):
        with pytest.raises(ValueError):
            rans4x16.uncompress(blob)
    # A bare order byte with varint size 0 decodes to empty, as in C.
    assert rans4x16.uncompress(b"\x01") == b""


def test_nosz_needs_out_size():
    data = b"hello world" * 10
    blob = rans4x16.compress(np.frombuffer(data, np.uint8), 0x10)
    with pytest.raises(ValueError):
        rans4x16.uncompress(blob)
    assert rans4x16.uncompress(blob, len(data)) == data
