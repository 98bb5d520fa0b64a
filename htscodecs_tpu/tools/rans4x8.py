"""CLI for the rANS 4x8 codec (reference rans4x8 tool parity)."""
import argparse
import numpy as np
from ._common import add_common, run_block_tool
from ..models import rans4x8


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="rans4x8")
    ap.add_argument("-o", type=int, default=0)
    add_common(ap)
    args = ap.parse_args(argv)
    return run_block_tool(
        lambda d: rans4x8.compress(np.frombuffer(d, np.uint8), args.o),
        lambda d, sz: rans4x8.uncompress(d),
        args)


if __name__ == "__main__":
    raise SystemExit(main())
