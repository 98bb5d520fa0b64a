import pytest

from htscodecs_tpu.utils import varint


@pytest.mark.parametrize(
    "value,encoding",
    [
        (0, b"\x00"),
        (1, b"\x01"),
        (127, b"\x7f"),
        (128, b"\x81\x00"),
        (255, b"\x81\x7f"),
        (16383, b"\xff\x7f"),
        (16384, b"\x81\x80\x00"),
        (1 << 28, b"\x81\x80\x80\x80\x00"),
        ((1 << 32) - 1, b"\x8f\xff\xff\xff\x7f"),
    ],
)
def test_known_encodings(value, encoding):
    out = bytearray()
    n = varint.put_uint(out, value)
    assert bytes(out) == encoding
    assert n == len(encoding)
    got, pos = varint.get_uint(out, 0)
    assert got == value
    assert pos == len(encoding)
    assert varint.size_uint(value) == len(encoding)


def test_round_trip_sweep():
    for v in list(range(0, 4096)) + [2**k + d for k in range(7, 63) for d in (-1, 0, 1)]:
        out = bytearray()
        varint.put_uint(out, v)
        got, pos = varint.get_uint(out, 0)
        assert got == v and pos == len(out), v


def test_signed_zigzag():
    for v in (0, -1, 1, -2, 2, -(2**31), 2**31 - 1):
        out = bytearray()
        varint.put_sint(out, v)
        got, _ = varint.get_sint(out, 0)
        assert got == v


def test_truncated_read_is_bounded():
    # A continuation byte at the end of the buffer must not read past it.
    got, pos = varint.get_uint(b"\xff", 0)
    assert pos == 1 and got == 0x7F
    got, pos = varint.get_uint(b"", 0)
    assert pos == 0 and got == 0
