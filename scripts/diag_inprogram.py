"""Bisect the in-program substep cost at sand3@1M (fallen state).

diag_packcost.py: the jitted 5-frame program costs ~35 ms/substep while the
isolated per-stage profile sums to ~15 ms. This times jitted programs of
increasing integration level on the SAME state:

  A. bare chain of K substeps (fixed dt, no cond/resort, no dt-min)
  B. + per-substep dt-min from the carried bound rows
  C. + the lazy-resort lax.cond (need always False on this state)
  D. the real _step_impl (while_loop, 1 frame)
  E. the real _frames_impl (scan of while_loop, 5 frames)
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
from sparkl_tpu.fused.pipeline import FusedMpmPipeline, DRIFT_FRACTION
from sparkl_tpu.fused import layout as L

K_SUB = 12


def sync(x):
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a,
        x,
    )


def timeit(f, *a, iters=3):
    r = f(*a)
    sync(r)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        r = f(*a)
        sync(r)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, r


def main():
    b = scenes.build("sand3", nx=100, ny=50, nz=100)
    pipe = FusedMpmPipeline(
        b.grid, b.models, b.colliders, b.params, b.gravity, b.hooks
    )
    p = b.particles
    p, _ = pipe.run_frames(p, 5)  # warm to the bench state
    state = pipe._jit_pack(p)
    sync(state)
    r = pipe._rows
    dt = jnp.asarray(1e-3, jnp.float32)

    def bare(state):
        def body(s, _):
            s2, _ = pipe._substep(s, dt)
            return s2, None
        s, _ = jax.lax.scan(body, state, None, length=K_SUB)
        return s

    ms, _ = timeit(jax.jit(bare), state)
    print(f"A bare {K_SUB}x substep       : {ms:8.1f} ms -> {ms/K_SUB:6.2f} ms/substep", flush=True)

    def with_dtmin(state):
        def body(s, _):
            occupied = pipe._occupied(s)
            dtb = jnp.where(occupied, s.slots[:, r.dtb, :], jnp.inf)
            d = jnp.minimum(jnp.min(dtb), jnp.float32(1e-3))
            s2, _ = pipe._substep(s, d)
            return s2, None
        s, _ = jax.lax.scan(body, state, None, length=K_SUB)
        return s

    ms, _ = timeit(jax.jit(with_dtmin), state)
    print(f"B + dt-min                 : {ms:8.1f} ms -> {ms/K_SUB:6.2f} ms/substep", flush=True)

    def with_cond(state):
        def body(s, _):
            need = s.cum_disp >= DRIFT_FRACTION * pipe.grid.cell_width

            def do_resort(ss):
                s2, _ = L.resort(
                    pipe.grid, pipe._cfg, ss, pipe.grid.dim,
                    interpret=pipe._interpret, cache_fn=pipe._grid_cache,
                )
                return s2

            s = jax.lax.cond(need, do_resort, lambda ss: ss, s)
            occupied = pipe._occupied(s)
            dtb = jnp.where(occupied, s.slots[:, r.dtb, :], jnp.inf)
            d = jnp.minimum(jnp.min(dtb), jnp.float32(1e-3))
            s2, _ = pipe._substep(s, d)
            return s2, None
        s, _ = jax.lax.scan(body, state, None, length=K_SUB)
        return s

    ms, _ = timeit(jax.jit(with_cond), state)
    print(f"C + resort cond (not taken): {ms:8.1f} ms -> {ms/K_SUB:6.2f} ms/substep", flush=True)

    jstep = jax.jit(pipe._step_impl)
    ms, out = timeit(jstep, state)
    n = int(out[1])
    print(f"D _step_impl (1 frame)     : {ms:8.1f} ms for {n} substeps -> {ms/max(n,1):6.2f} ms/substep", flush=True)

    jframes = jax.jit(pipe._frames_impl, static_argnums=(1,))
    ms, out = timeit(jframes, state, 5)
    n = int(out[1])
    print(f"E _frames_impl (5 frames)  : {ms:8.1f} ms for {n} substeps -> {ms/max(n,1):6.2f} ms/substep", flush=True)


if __name__ == "__main__":
    main()
