"""Measure VPU serial-dependency-chain throughput vs sublane batch size.

The fused kernels' per-particle physics is one long serial op chain on
[R, C] tiles. At R=8 each op is ONE native (8, 128) vreg — every op pays
its full latency. At R=32/64 each op covers 4/8 independent vregs, so the
chain pipelines. This probe times an N-op multiply-add chain (plus an
exp-chain variant) inside a Pallas kernel at several R, holding total
element count constant — if the chain is latency-bound, bigger R wins by
~R/8 up to the issue-rate floor.

Usage: python scripts/vreg_probe.py  (needs the TPU; ~30 s)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TOTAL_ROWS = 8192          # total sublanes of work, constant across R
C = 128
N_OPS = 1024               # serial chain length


def _chain_kernel(n_ops, transcend, x_ref, o_ref):
    x = x_ref[...]
    if transcend:
        for _ in range(n_ops // 16):
            # 16-op body: keeps values bounded; exp dominates.
            x = jnp.exp(-jnp.abs(x)) + 0.1 * x
    else:
        for _ in range(n_ops):
            x = x * 0.999 + 0.001
    o_ref[...] = x


def probe(r, transcend):
    kernel = functools.partial(_chain_kernel, N_OPS, transcend)
    x = jnp.ones((TOTAL_ROWS, C), jnp.float32)
    f = jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            grid=(TOTAL_ROWS // r,),
            in_specs=[pl.BlockSpec((r, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((r, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TOTAL_ROWS, C), jnp.float32),
        )(x)
    )
    f(x).block_until_ready()
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return dt


def main():
    for transcend in (False, True):
        name = "exp-chain" if transcend else "fma-chain"
        base = None
        for r in (8, 16, 32, 64, 128):
            dt = probe(r, transcend)
            base = base or dt
            print(
                f"{name} R={r:3d}: {dt*1e6:8.1f} us/call  "
                f"speedup vs R=8: {base/dt:5.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
