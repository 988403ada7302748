"""Localize the composed-substep overhead (diag_residual.py stage 2).

Finding so far: the per-stage profile of the fused substep sums to ~7.3 ms
at the sand3@1M fallen state, but a jitted scan of the SAME `_substep` runs
at ~12.4 ms/substep — the loop machinery (dt logic, resort cond,
while_loop) adds nothing. So XLA composes the stages ~5 ms/substep worse
than it runs them standalone (layout conversions, fusion choices, or
carry copies).

This script times cumulative prefixes of the substep under the same scan
harness. Each prefix folds its outputs back into the carry through a
1e-30-scaled sum so the loop has a real data dependency (XLA would
otherwise hoist or DCE the work) while the state numerics stay ~frozen.

Usage: python scripts/diag_residual2.py [n_substeps]
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
import sparkl_tpu.sparse.transfer as T
import sparkl_tpu.solver.dense as dense
from sparkl_tpu.core.grid import GridState
from sparkl_tpu.fused import kernels as K
from sparkl_tpu.fused.pipeline import FusedMpmPipeline
from sparkl_tpu.math import linalg
from sparkl_tpu.sparse import blocks as B


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
    print(f"{name:34s} {med*1e3:8.1f} ms -> {med/n_sub*1e3:6.2f} ms/substep",
          flush=True)


def main():
    n_sub = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    b = scenes.build("sand3", nx=100, ny=50, nz=100)
    pipe = FusedMpmPipeline(
        b.grid, b.models, b.colliders, b.params, b.gravity, b.hooks
    )
    state = pipe.pack_state(b.particles)
    state, _ = pipe.run_frames_state(state, 5)
    sync(state.slots)
    dt = jnp.asarray(float(b.params.dt) / 40.0, jnp.float32)

    grid, cfg, params = pipe.grid, pipe._cfg, pipe.params
    dim = grid.dim
    cpb = B.cells_per_block(dim)
    nf = 1 + dim  # sand3: no psi
    cell_order = T.ZMAJOR_ORDER_3D if dim == 3 else None
    nc = state.structure.num_chunks

    def stage_a(s):
        return K.p2g_fused(
            grid, cfg, pipe._meta, s.slots, s.ints, dt, pipe._tab_f,
            pipe._tab_i, nchunks=nc,
        )

    def stage_m(s, images):
        return T.merge_images_to_grid(
            grid, cfg, s.structure, images, cell_order=cell_order,
            gather=True, dma=True, overflow_out=True,
        )[0]

    def stage_g(s, node):
        nodef = node.reshape(cfg.max_grid_blocks + 1, nf, cpb)
        mass = nodef[:, 0, :]
        mom = jnp.moveaxis(nodef[:, 1 : 1 + dim, :], 1, -1)
        inv_mass = linalg.inv_exact(mass)
        velocity = (mom + mass[..., None] * pipe.gravity * dt) * inv_mass[..., None]
        node_pos, projections = s.grid_cache
        gstate = GridState(
            mass=mass, momentum=mom, velocity=velocity,
            psi_momentum=jnp.zeros_like(mass), psi_mass=jnp.zeros_like(mass),
        )
        gstate = dense.grid_update(
            grid, gstate, pipe.colliders, dt, params.boundary_handling,
            params.simulation_dofs, node_positions=node_pos,
            projections=projections,
            gpu_boundary_semantics=params.gpu_boundary_semantics,
        )
        return gstate.velocity.at[cfg.max_grid_blocks].set(0.0)

    def stage_w(s, velocity):
        win_fields = jnp.moveaxis(velocity, -1, 1).reshape(
            cfg.max_grid_blocks + 1, dim * cpb
        )
        return T.gather_grid_windows(
            grid, cfg, s.structure, win_fields, cell_order=cell_order
        )

    def stage_b(s, windows):
        return K.g2p_fused(
            grid, cfg, pipe._meta, pipe._kparams, s.slots, s.ints, windows,
            dt, pipe._tab_f, pipe._tab_i, nchunks=nc,
        )

    def dep(s, x):
        """Fold x into the carry with ~zero numeric effect."""
        t = 1e-30 * jnp.sum(x.astype(jnp.float32).ravel()[:8])
        return s.replace(slots=s.slots + t)

    def scan_of(body):
        def run(state):
            def step(s, _):
                return body(s), ()
            return jax.lax.scan(step, state, None, length=n_sub)[0]
        return jax.jit(run)

    timeit("S1 A", scan_of(lambda s: dep(s, stage_a(s))), state, n_sub=n_sub)
    timeit("S2 A+merge",
           scan_of(lambda s: dep(s, stage_m(s, stage_a(s)))), state, n_sub=n_sub)
    timeit("S3 A+merge+grid",
           scan_of(lambda s: dep(s, stage_g(s, stage_m(s, stage_a(s))))),
           state, n_sub=n_sub)
    timeit("S4 A+merge+grid+windows",
           scan_of(lambda s: dep(
               s, stage_w(s, stage_g(s, stage_m(s, stage_a(s)))))),
           state, n_sub=n_sub)
    timeit("S5 +kernel B (full chain)",
           scan_of(lambda s: s.replace(slots=stage_b(
               s, stage_w(s, stage_g(s, stage_m(s, stage_a(s))))))),
           state, n_sub=n_sub)
    timeit("S6 shipped _substep",
           scan_of(lambda s: pipe._substep(s, dt)[0]), state, n_sub=n_sub)


if __name__ == "__main__":
    main()
