"""Decoder robustness (the reference's libFuzzer-target contract):
arbitrary bytes must produce either a clean error or bounded output —
never a crash, hang, or out-of-bounds access.

Deterministic corpus: random bytes, bit-flipped valid streams, and
truncations of valid streams, across all five codecs.
"""

import numpy as np
import pytest

from htscodecs_tpu.models import arith, fqz, rans4x8, rans4x16, tok3


def _mutations(blob: bytes, rng, n=30):
    yield b""
    for k in (1, 2, 7, 16):
        yield bytes(rng.integers(0, 256, k, dtype=np.uint8))
    for _ in range(n):
        m = bytearray(blob)
        for _ in range(int(rng.integers(1, 6))):
            if m:
                m[int(rng.integers(0, len(m)))] ^= 1 << int(rng.integers(0, 8))
        yield bytes(m)
    for _ in range(n // 2):
        cut = int(rng.integers(0, max(1, len(blob))))
        yield blob[:cut]
    for _ in range(n // 2):
        yield bytes(rng.integers(0, 256, int(rng.integers(1, 400)), dtype=np.uint8))


def _exercise(decode, blob, rng):
    for mut in _mutations(blob, rng):
        try:
            out = decode(mut)
            # bounded output only (a stream may legitimately claim any
            # u32 size — the reference contract caps at the claim)
            assert out is None or len(out) < 2**31
        except (ValueError, OverflowError):
            pass


@pytest.fixture(scope="module")
def sample():
    rng = np.random.default_rng(0)
    return (rng.integers(0, 24, 3000, dtype=np.uint8) + 33).astype(np.uint8)


def test_fuzz_rans4x16(sample):
    rng = np.random.default_rng(1)
    for order in (0, 1, 129, 193, 8):
        blob = rans4x16.compress(sample, order)
        _exercise(lambda b: rans4x16.uncompress(b), blob, rng)


def test_fuzz_rans4x8(sample):
    rng = np.random.default_rng(2)
    for order in (0, 1):
        blob = rans4x8.compress(sample, order)
        _exercise(lambda b: rans4x8.uncompress(b), blob, rng)


def test_fuzz_arith(sample):
    rng = np.random.default_rng(3)
    for order in (0, 1, 65, 128, 9):
        blob = arith.compress(sample, order)
        _exercise(lambda b: arith.uncompress(b), blob, rng)


def test_fuzz_fqz(sample):
    rng = np.random.default_rng(4)
    lens = [100] * 30
    blob = fqz.compress(bytes(sample[:3000] % 40), lens, [0] * 30, strat=1)
    _exercise(lambda b: fqz.decompress(b), blob, rng)


def test_fuzz_tok3():
    rng = np.random.default_rng(5)
    names = b"".join(b"read%d:%d:%d\n" % (i, i * 7 % 100, i * 13 % 997)
                     for i in range(100))
    blob = tok3.encode_names(names, 5, False)
    _exercise(lambda b: tok3.decode_names(b), blob, rng)


def test_batched_decode_corruption_isolation():
    """Corrupted streams inside a batch must not crash the grouped
    decode, and intact neighbours must still decode byte-exact."""
    import numpy as np
    from htscodecs_tpu.models import batch
    rng = np.random.default_rng(99)
    blocks = [(rng.choice(5, 700) * 9 + 35).astype(np.uint8)
              for _ in range(24)]
    streams = batch.compress_blocks(blocks, 1, engine="device")
    bad = []
    for k, s in enumerate(streams):
        b = bytearray(s)
        if k % 3 == 0 and len(b) > 8:
            b[rng.integers(1, len(b))] ^= 0xFF
        if k % 5 == 0:
            b = b[:max(4, len(b) - 5)]
        bad.append(bytes(b))
    try:
        out = batch.uncompress_blocks(bad, engine="device")
        for k in range(24):
            if k % 3 and k % 5:       # untouched streams
                assert out[k] == blocks[k].tobytes()
    except ValueError:
        # grouped decode may reject the whole call on a corrupt
        # member; per-stream behaviour is covered by the host fuzz
        # tests.  Intact members must then decode alone:
        ok = [bad[k] for k in range(24) if k % 3 and k % 5]
        out = batch.uncompress_blocks(ok, engine="device")
        idx = 0
        for k in range(24):
            if k % 3 and k % 5:
                assert out[idx] == blocks[k].tobytes()
                idx += 1
