"""Isolate the run_frames wall-time gap at sand3@1M: the jitted frame
program vs the eager pack/unpack + host syncs around it.

diag_bench1m.py showed substep stages summing to ~15 ms with zero resorts,
yet run_frames measuring ~107 ms/substep — the difference must be paid by
the NON-jitted parts of run_frames (L.pack / L.unpack run op-by-op over the
tunnel, plus the capacity-check scalar reads). This measures each piece.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/tmp/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp
import numpy as np

import sparkl_tpu.scenes as scenes
from sparkl_tpu.fused.pipeline import FusedMpmPipeline
from sparkl_tpu.fused import layout as L


def sync(x):
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a,
        x,
    )


def main():
    frames = 5
    b = scenes.build("sand3", nx=100, ny=50, nz=100)
    pipe = FusedMpmPipeline(
        b.grid, b.models, b.colliders, b.params, b.gravity, b.hooks
    )
    p = b.particles
    p, _ = pipe.run_frames(p, frames)  # warm to the bench state + compile
    sync(p)

    # 1. eager pack
    t0 = time.perf_counter()
    state = pipe._pack(p)
    sync(state)
    t_pack_eager = (time.perf_counter() - t0) * 1e3

    # 2. jitted frame program alone
    st, total = None, 0
    t0 = time.perf_counter()
    out = pipe._jit(state, frames)
    sync(out)
    t_prog = (time.perf_counter() - t0) * 1e3
    state2, total, ov, peak, nres = out
    total = int(total)

    # need a fresh state for the next timings (state was donated)
    state = pipe._pack(p)
    sync(state)

    # 3. eager unpack
    t0 = time.perf_counter()
    q = pipe._unpack(state, p.capacity)
    sync(q)
    t_unpack_eager = (time.perf_counter() - t0) * 1e3

    # 4. jitted pack / unpack for comparison
    jpack = jax.jit(pipe._pack)
    jq = jpack(p)
    sync(jq)
    t0 = time.perf_counter()
    jq = jpack(p)
    sync(jq)
    t_pack_jit = (time.perf_counter() - t0) * 1e3

    junpack = jax.jit(lambda s: pipe._unpack(s, p.capacity))
    uq = junpack(jq)
    sync(uq)
    t0 = time.perf_counter()
    uq = junpack(jq)
    sync(uq)
    t_unpack_jit = (time.perf_counter() - t0) * 1e3

    print(f"pack eager   : {t_pack_eager:8.1f} ms")
    print(f"pack jitted  : {t_pack_jit:8.1f} ms")
    print(f"unpack eager : {t_unpack_eager:8.1f} ms")
    print(f"unpack jitted: {t_unpack_jit:8.1f} ms")
    print(f"frame program: {t_prog:8.1f} ms for {total} substeps "
          f"-> {t_prog/max(total,1):.2f} ms/substep")


if __name__ == "__main__":
    main()
