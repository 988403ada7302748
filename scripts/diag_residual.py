"""Bisect the in-program substep residual at the sand3@1M fallen state.

Round-4 finding: the per-stage profile sums to ~7.3 ms/substep (post
live-chunk gating) but the in-program span measures 13-14 ms/substep. This
script isolates where the extra time lives by timing jitted scans of
increasingly complete substep variants, all on the SAME fallen state and
all synced by a value read (block_until_ready is unreliable through the
tunnel, utils/timings.py:9):

  A  bare _substep scan (fixed dt, no resort cond, no dt logic)
  B  + the dt-bound reduction and dt selection of _step_body
  C  + the (never-taken) lazy-resort lax.cond
  D  the real _step_body under a fori-like scan (fixed substep count)
  E  the shipped _frames_impl while_loop (per-substep cost over a frame)

Usage: python scripts/diag_residual.py [n_substeps]
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


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))


def timeit(name, jf, *args, n_sub=1):
    r = jf(*args)
    sync(r)
    reps = []
    for _ in range(4):
        t0 = time.perf_counter()
        r = jf(*args)
        sync(r)
        reps.append(time.perf_counter() - t0)
    reps.sort()
    med = reps[len(reps) // 2]
    print(f"{name:44s} {med*1e3:8.1f} ms -> {med/n_sub*1e3:6.2f} ms/substep",
          flush=True)
    return r


def main():
    n_sub = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    b = scenes.build("sand3", nx=100, ny=50, nz=100)
    pipe = FusedMpmPipeline(
        b.grid, b.models, b.colliders, b.params, b.gravity, b.hooks
    )
    state = pipe.pack_state(b.particles)
    state, _ = pipe.run_frames_state(state, 5)  # fall to the bench state
    sync(state.slots)
    dt_fixed = jnp.asarray(float(b.params.dt) / 40.0, jnp.float32)
    r = pipe._rows

    def scan_substep(state):
        def body(s, _):
            s2, _ = pipe._substep(s, dt_fixed)
            return s2, ()
        return jax.lax.scan(body, state, None, length=n_sub)[0]

    def scan_substep_dt(state):
        def body(carry, _):
            s, remaining = carry
            occupied = pipe._occupied(s)
            dtb = jnp.where(occupied, s.slots[:, r.dtb, :], jnp.inf)
            max_dt = jnp.minimum(remaining, pipe.params.max_substep_dt)
            dt = jnp.minimum(jnp.min(dtb), max_dt)
            s2, _ = pipe._substep(s, dt)
            return (s2, remaining - dt), ()
        return jax.lax.scan(
            body, (state, jnp.float32(1e9)), None, length=n_sub
        )[0][0]

    def scan_substep_dt_cond(state):
        import sparkl_tpu.fused.layout as L
        def body(carry, _):
            s, remaining = carry
            need = s.cum_disp >= 1e30  # never taken; keeps the cond program
            def do_resort(s):
                s2, _ = L.resort(
                    pipe.grid, pipe._cfg, s, pipe.grid.dim,
                    interpret=pipe._interpret, vma=pipe._kernel_vma,
                    cache_fn=pipe._grid_cache,
                )
                return s2
            s = jax.lax.cond(need, do_resort, lambda s: s, s)
            occupied = pipe._occupied(s)
            dtb = jnp.where(occupied, s.slots[:, r.dtb, :], jnp.inf)
            max_dt = jnp.minimum(remaining, pipe.params.max_substep_dt)
            dt = jnp.minimum(jnp.min(dtb), max_dt)
            s2, _ = pipe._substep(s, dt)
            return (s2, remaining - dt), ()
        return jax.lax.scan(
            body, (state, jnp.float32(1e9)), None, length=n_sub
        )[0][0]

    def scan_step_body(state):
        def body(carry, _):
            s, remaining, ov, peak = carry
            s, remaining, ov, peak, _ = pipe._step_body(s, remaining, ov, peak)
            return (s, remaining, ov, peak), ()
        carry = (
            state, jnp.float32(1e9), jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
        )
        return jax.lax.scan(body, carry, None, length=n_sub)[0][0]

    timeit("A bare _substep scan (fixed dt)",
           jax.jit(scan_substep), state, n_sub=n_sub)
    timeit("B + dt-bound reduction",
           jax.jit(scan_substep_dt), state, n_sub=n_sub)
    timeit("C + never-taken resort cond",
           jax.jit(scan_substep_dt_cond), state, n_sub=n_sub)
    timeit("D real _step_body scan",
           jax.jit(scan_step_body), state, n_sub=n_sub)

    def frame(state):
        return pipe._jit(state, 1)[0] if hasattr(pipe, "_jit") else None

    # E: the shipped span (counts substeps itself)
    t0 = time.perf_counter()
    state2, total = pipe.run_frames_state(state, 5)
    dt_wall = time.perf_counter() - t0
    print(f"E shipped run_frames_state span: {dt_wall*1e3:8.1f} ms, "
          f"{int(total)} substeps -> {dt_wall/max(int(total),1)*1e3:6.2f} "
          f"ms/substep", flush=True)


if __name__ == "__main__":
    main()
