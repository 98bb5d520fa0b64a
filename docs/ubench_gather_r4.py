"""Round-4 microbench: tpu.dynamic_gather vs the where-chain.

Probed support (real v5e chip, jax 0.9.0 Mosaic):
  - sublane-gather: take_along_axis(x,(idx,axis=0)) lowers iff the
    gather dim fits ONE vreg -> (8, M) i32 operands only.
  - lane-gather: axis=1 lowers for (T, 128) i32 — any T, each row
    gathers independently within its own 128 lanes.
  - anything wider along the gather dim: "Multiple source vregs along
    gather dimension" — unsupported.

This bench answers: what does ONE dynamic_gather cost relative to ONE
compare+select row, on-chip?  That sets the design for the round-4
encode prefetch kernel (hoist the (start,freq) table fetch out of the
sequential scan into batched lane-gathers over transposed tables).

Run on the real chip:  python docs/ubench_gather_r4.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 512
REPS = 256         # inner unrolled ops per grid step
STEPS = 400


def timed(fn, *args):
    o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = fn(*args)
    jax.block_until_ready(o)
    return time.perf_counter() - t0


def run_kernel(name, body, shapes, elems_per_op):
    """body(tensors, u) -> (1, M) row to accumulate."""
    def kern(*refs):
        (*ins, out_ref, acc) = refs
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc[:] = jnp.zeros((1, M), jnp.int32)

        vals = [r[:] for r in ins]
        a0 = acc[:]
        for u in range(REPS):
            a0 = a0 + body(vals, a0, u)
        acc[:] = a0
        out_ref[:] = a0

    args = [jnp.asarray(np.random.randint(0, 8, s), jnp.int32)
            for s in shapes]

    @jax.jit
    def run(*args):
        return pl.pallas_call(
            kern,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec(s, lambda j: tuple(0 for _ in s),
                                   memory_space=pltpu.VMEM)
                      for s in shapes],
            out_specs=pl.BlockSpec((1, M), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, M), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, M), jnp.int32)],
        )(*args)

    try:
        dt = timed(run, *args)
    except Exception as e:
        print(f"{name:34s} FAIL {str(e).splitlines()[0][:100]}")
        return None
    ops = STEPS * REPS
    print(f"{name:34s} {dt*1e3:8.2f} ms  {dt/ops*1e9:7.2f} ns/op "
          f"({dt/(ops*elems_per_op)*1e12:6.2f} ps/elem)")
    return dt / ops


def main():
    print("backend:", jax.devices())

    # 1 select row (8, M): the where-chain unit
    def sel8(vals, a0, u):
        t, c = vals
        cond = (c + a0[0:1]) % 7 == (u % 7)
        r = jnp.where(cond, t[0:8], t[8:16])
        return r[0:1]
    run_kernel("select (8,M) where", sel8, [(16, M), (1, M)], 8 * M)

    # select (1, M) row
    def sel1(vals, a0, u):
        t, c = vals
        cond = (c + a0[0:1]) % 7 == (u % 7)
        return jnp.where(cond, t[0:1], t[1:2])
    run_kernel("select (1,M) where", sel1, [(2, M), (1, M)], M)

    # sublane-gather (8, M) i32 (M=512 -> 4 lane vregs, 1 sublane vreg)
    def sg(vals, a0, u):
        t, c = vals
        idx = jnp.broadcast_to((c + a0[0:1]) % 8, (8, M))
        return jnp.take_along_axis(t[0:8], idx, axis=0)[0:1]
    run_kernel("sublane-gather (8,M)", sg, [(8, M), (1, M)], 8 * M)

    # lane-gather (T, 128) for several T — per-row independent
    for T in (8, 32, 128):
        def lg(vals, a0, u, T=T):
            t, c = vals
            idx = (c[:, :128] + a0[0:1, :128]) % 128
            idxT = jnp.broadcast_to(idx, (T, 128))
            g = jnp.take_along_axis(t, idxT, axis=1)
            s = jnp.sum(g, axis=0, keepdims=True)
            return jnp.concatenate([s] * (M // 128), axis=1)
        run_kernel(f"lane-gather ({T},128)+sum", lg,
                   [(T, 128), (1, M)], T * 128)

    # chain fetch reference: A=48 pair-packed where-chain (1 step)
    A, NP = 48, 25

    def chain(vals, a0, u):
        t, c = vals
        tbl = t.reshape(A, NP, M)
        ctx = (c + a0[0:1]) % A
        row = tbl[A - 1]
        for a in range(A - 2, -1, -1):
            row = jnp.where(ctx == a, tbl[a], row)
        return row[0:1]
    global REPS
    old = REPS
    REPS = 16
    run_kernel("chain fetch A=48 (47 sel of 25,M)", chain,
               [(A * NP, M), (1, M)], 47 * 25 * M)
    REPS = old


if __name__ == "__main__":
    main()
