"""Per-stage pipeline timing — the reference's timing-struct API on TPU.

Ref: sparkl `src/cuda/cuda_mpm_pipeline.rs:30-136` (CudaTimestepTimings /
CudaSubstepTimings / EventTimer measured with CUDA events, surfaced in the
testbed's "Pipeline Timings" panel, testbed_plugin.rs:778-855).

On TPU the production step is ONE fused jit program, so stage timings are a
profiling mode: each stage is jitted separately and wall-timed with a forced
host sync (block_until_ready is insufficient through remote tunnels — we
force a tiny host read). Numbers therefore carry ~one RTT of constant bias
each; use them for relative stage weights, and `jax.profiler.trace` for
exact device timelines.
"""

import time
from dataclasses import dataclass, field, fields
from typing import List, Optional

import jax
import jax.numpy as jnp


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))


def _null_ms(iters: int) -> float:
    """Measured per-call cost of the dispatch+sync harness itself (tunnel
    RTT through remote backends) — subtracted from every stage so the
    reported numbers approximate device time, not wire time."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    best = float("inf")
    for _ in range(3):
        r = f(x)
        _sync(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(r)
        _sync(r)
        best = min(best, (time.perf_counter() - t0) / iters * 1000.0)
    return best


@dataclass
class SubstepTimings:
    """One substep's stage breakdown, in milliseconds.

    Field names mirror CudaSubstepTimings (sort/grid-resize, reset+transfer,
    timestep estimation, the fused transfer kernels, grid update)."""

    grid_resize_and_sort: float = 0.0
    estimate_timestep: float = 0.0
    stress_update: float = 0.0
    p2g: float = 0.0
    grid_update: float = 0.0
    g2p: float = 0.0
    particle_update: float = 0.0
    total: float = 0.0

    def as_dict(self):
        return {f.name: getattr(self, f.name) for f in fields(self)}

    def pretty(self):
        rows = []
        for f in fields(self):
            if f.name == "total":
                continue
            v = getattr(self, f.name)
            pct = 100.0 * v / self.total if self.total else 0.0
            rows.append(f"  {f.name:<22s} {v:8.2f} ms  {pct:5.1f}%")
        rows.append(f"  {'total':<22s} {self.total:8.2f} ms")
        return "\n".join(rows)


@dataclass
class FusedSubstepTimings:
    """Per-stage breakdown of one FusedMpmPipeline substep, milliseconds.

    Stage names mirror the fused architecture (BASELINE.md round-2 table):
    kernel A = stress + P2G window images (Pallas), merge = window-image
    scatter into the block grid, grid_update (with the cached collider
    projections), windows = grid window gather, kernel B = G2P + full
    particle update + next dt bound (Pallas), resort = structure rebuild +
    slot permute (the lazy path pays this only on drift), eigen_pool = the
    pairwise damage pooling kernel (eigenerosion scenes only).
    Same ~RTT-per-stage bias caveat as SubstepTimings."""

    kernel_a: float = 0.0
    merge: float = 0.0
    grid_update: float = 0.0
    windows: float = 0.0
    kernel_b: float = 0.0
    resort: float = 0.0
    eigen_pool: float = 0.0
    total: float = 0.0

    as_dict = SubstepTimings.as_dict
    pretty = SubstepTimings.pretty


def profile_fused_substep(pipe, particles, dt=1e-3, iters=20) -> FusedSubstepTimings:
    """Stage-by-stage timing of one FusedMpmPipeline substep (reproduces
    every per-stage fused number in BASELINE.md; ref: the reference's
    always-on CudaTimestepTimings discipline, cuda_mpm_pipeline.rs:30-85)."""
    from sparkl_tpu.core.grid import GridState
    from sparkl_tpu.core.params import DamageModel
    from sparkl_tpu.math import linalg
    from sparkl_tpu.sparse import blocks as B, transfer as T
    from sparkl_tpu.solver import dense
    from sparkl_tpu.fused import kernels as K, layout as L

    pipe._ensure_cfg(particles)
    grid, cfg, params = pipe.grid, pipe._cfg, pipe.params
    dim = grid.dim
    cpb = B.cells_per_block(dim)
    with_psi = pipe._meta["with_psi"]
    nf = 1 + dim + (2 if with_psi else 0)
    interp = pipe._interpret

    state = pipe._pack(particles)
    dtj = jnp.asarray(dt, jnp.float32)
    null = _null_ms(iters)

    def timeit(f, *a):
        r = f(*a)
        _sync(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*a)
        _sync(r)
        return max((time.perf_counter() - t0) / iters * 1000.0 - null, 0.0), r

    t = FusedSubstepTimings()

    f_a = jax.jit(
        lambda slots, ints, d: K.p2g_fused(
            grid, cfg, pipe._meta, slots, ints, d, pipe._tab_f, pipe._tab_i,
            interpret=interp, nchunks=state.structure.num_chunks,
        )
    )
    t.kernel_a, images = timeit(f_a, state.slots, state.ints, dtj)

    cell_order = T.ZMAJOR_ORDER_3D if dim == 3 else None
    f_m = jax.jit(
        lambda im: T.merge_images_to_grid(
            grid, cfg, state.structure, im, cell_order=cell_order,
            gather=True, dma=not interp, interpret=interp,
        )
    )
    t.merge, node = timeit(f_m, images)

    nodef = node.reshape(cfg.max_grid_blocks + 1, nf, cpb)
    mass = nodef[:, 0, :]
    mom = jnp.moveaxis(nodef[:, 1 : 1 + dim, :], 1, -1)
    psi_mom_g = nodef[:, 1 + dim, :] if with_psi else jnp.zeros_like(mass)
    psi_mass_g = nodef[:, 2 + dim, :] if with_psi else jnp.zeros_like(mass)
    node_pos, projections = state.grid_cache

    def f_gu(mass, mom):
        vel = (mom + mass[..., None] * pipe.gravity * dt) * linalg.inv_exact(
            mass
        )[..., None]
        gs = GridState(mass=mass, momentum=mom, velocity=vel,
                       psi_momentum=psi_mom_g, psi_mass=psi_mass_g)
        gs = dense.grid_update(
            grid, gs, pipe.colliders, dt, params.boundary_handling,
            params.simulation_dofs, node_positions=node_pos,
            projections=projections,
            gpu_boundary_semantics=params.gpu_boundary_semantics,
        )
        return gs.velocity.at[cfg.max_grid_blocks].set(0.0)

    t.grid_update, velocity = timeit(jax.jit(f_gu), mass, mom)

    def f_w(velocity):
        win_parts = [jnp.moveaxis(velocity, -1, 1)]
        if with_psi:
            win_parts.append(
                (psi_mom_g * linalg.inv_exact(psi_mass_g))[:, None, :]
            )
        n_win = dim + (1 if with_psi else 0)
        win_fields = jnp.concatenate(win_parts, axis=1).reshape(
            cfg.max_grid_blocks + 1, n_win * cpb
        )
        return T.gather_grid_windows(
            grid, cfg, state.structure, win_fields, cell_order=cell_order
        )

    t.windows, windows = timeit(jax.jit(f_w), velocity)

    f_b = jax.jit(
        lambda slots, ints, win, d: K.g2p_fused(
            grid, cfg, pipe._meta, pipe._kparams, slots, ints, win, d,
            pipe._tab_f, pipe._tab_i, interpret=interp,
            nchunks=state.structure.num_chunks,
        )
    )
    t.kernel_b, _ = timeit(f_b, state.slots, state.ints, windows, dtj)

    f_r = jax.jit(
        lambda s: L.resort(
            grid, cfg, s, dim, interpret=interp, cache_fn=pipe._grid_cache
        )[0].slots
    )
    t.resort, _ = timeit(f_r, state)

    if params.damage_model == DamageModel.EIGENEROSION:
        f_e = jax.jit(lambda s: pipe._evolve_eigenerosion(s)[0].slots)
        t.eigen_pool, _ = timeit(f_e, state)

    # total = the per-substep cost on the lazy path (resort amortized out);
    # add `resort` when estimating a falling-phase (resort-heavy) substep.
    t.total = t.kernel_a + t.merge + t.grid_update + t.windows + t.kernel_b \
        + t.eigen_pool
    return t


@dataclass
class ResortTimings:
    """Per-stage breakdown of one fused-path resort, milliseconds.

    relabel = the sort-free fast path (key check + structure from chunk
    keys + drift/origin finalize) taken on coherent-motion resorts,
    build = build_slot_structure (global key sort + compactions),
    src = per-chunk source-slot extraction (row gather + lane-shift kernel),
    permute_pure = the single-chunk-row-gather relabel shortcut,
    permute_mixed = the in-kernel DMA permute (src analysis + kernel),
    grid_cache = node positions + collider projection rebuild."""

    relabel: float = 0.0
    build: float = 0.0
    src: float = 0.0
    permute_pure: float = 0.0
    permute_mixed: float = 0.0
    grid_cache: float = 0.0
    total: float = 0.0

    as_dict = SubstepTimings.as_dict
    pretty = SubstepTimings.pretty


def profile_resort(pipe, particles, iters=20) -> ResortTimings:
    """Stage-by-stage timing of the fused-path resort on the CURRENT state
    (the bench falling phase pays this every few substeps; see
    layout.resort for the staged structure this mirrors)."""
    from sparkl_tpu.fused import kernels as K, layout as L, structure as S

    pipe._ensure_cfg(particles)
    grid, cfg = pipe.grid, pipe._cfg
    dim = grid.dim
    interp = pipe._interpret
    r = L.Rows(dim)
    c, d_ = cfg.chunk_size, cfg.max_chunks

    state = pipe._pack(particles)
    null = _null_ms(iters)

    def timeit(f, *a):
        jf = jax.jit(f)
        res = jf(*a)
        _sync(res)
        t0 = time.perf_counter()
        for _ in range(iters):
            res = jf(*a)
        _sync(res)
        return max((time.perf_counter() - t0) / iters * 1000.0 - null, 0.0), res

    t = ResortTimings()

    def f_relabel(slots, ints):
        # The sort-free coherent-motion path, forced (detection + structure
        # from chunk keys + finalize), regardless of whether THIS state
        # would pass detection — the per-stage cost is state-independent.
        pos = jnp.stack(
            [slots[:, r.pos + ax, :].reshape(-1) for ax in range(dim)], axis=-1
        )
        flags = ints[:, L.I_FLAGS, :].reshape(-1)
        occupied = (flags & L.OCCUPIED) != 0
        active = occupied & ((flags & L.ACTIVE) != 0)
        key_eff = S.slot_key_rows(grid, cfg, pos, active, occupied)
        occ2 = occupied.reshape(d_, c)
        ok, ckey, occ_count = S.detect_chunk_relabel(grid, cfg, key_eff, occ2)
        st = S.structure_from_chunk_keys(grid, cfg, ckey, occ_count)
        # Mirror layout.resort's relabel branch exactly, including the
        # occupancy-masked pad zeroing over the full slot tensors.
        om = occ2[:, None, :]
        slots = jnp.where(om, slots, 0.0).at[:, r.cumd, :].set(0.0)
        ints = L._write_origin_rows(jnp.where(om, ints, 0), st, dim)
        return ok, slots, ints, st.num_blocks

    t.relabel, _ = timeit(f_relabel, state.slots, state.ints)

    def f_build(slots, ints):
        pos = jnp.stack(
            [slots[:, r.pos + ax, :].reshape(-1) for ax in range(dim)], axis=-1
        )
        flags = ints[:, L.I_FLAGS, :].reshape(-1)
        occupied = (flags & L.OCCUPIED) != 0
        active = occupied & ((flags & L.ACTIVE) != 0)
        return S.build_slot_structure(grid, cfg, pos, active, occupied)

    t.build, (structure, sort_order, chunk_start) = timeit(
        f_build, state.slots, state.ints
    )

    def f_src(order, start):
        start = jnp.minimum(start, jnp.int32(d_ * c - c))
        ord2d = order.reshape(d_, c)
        r0 = start // c
        g2 = ord2d[
            jnp.stack([r0, jnp.minimum(r0 + 1, d_ - 1)], axis=1).reshape(-1)
        ].reshape(d_, 2, c)
        return K.src_rows_from_order(cfg, g2, start % c, interpret=interp)[:, 0, :]

    t.src, src = timeit(f_src, sort_order, chunk_start)

    lanes = jnp.arange(c, dtype=jnp.int32)[None, :]
    valid = lanes < structure.chunk_count[:, None]
    first_chunk = src[:, 0] // c

    def f_pure(slots, ints):
        ids0 = jnp.clip(first_chunk, 0, d_ - 1)
        vm = valid[:, None, :]
        return jnp.where(vm, slots[ids0], 0.0), jnp.where(vm, ints[ids0], 0)

    t.permute_pure, _ = timeit(f_pure, state.slots, state.ints)

    sentinel = jnp.int32(2**30)
    src_chunk = jnp.where(valid, src // c, sentinel)
    src_lane = jnp.where(valid, src % c, 0)
    k_src = L.PERMUTE_SRC_CHUNKS

    def f_mixed(slots, ints):
        sc_sorted = jnp.sort(src_chunk, axis=1)
        prev = jnp.concatenate(
            [jnp.full((d_, 1), -1, jnp.int32), sc_sorted[:, :-1]], axis=1
        )
        flag = (sc_sorted != prev) & (sc_sorted < sentinel)
        rank = jnp.cumsum(flag.astype(jnp.int32), axis=1) - 1
        kr = jnp.arange(k_src, dtype=jnp.int32)
        onehot = (rank[:, :, None] == kr[None, None, :]) & flag[:, :, None]
        uniq = jnp.sum(jnp.where(onehot, sc_sorted[:, :, None], 0), axis=1)
        nuniq = jnp.sum(flag.astype(jnp.int32), axis=1)
        uniq = jnp.where(kr[None, :] < nuniq[:, None], uniq, -1)
        eq = src_chunk[:, :, None] == uniq[:, None, :]
        k_of = jnp.sum(jnp.where(eq, kr[None, None, :], 0), axis=-1)
        has = jnp.any(eq, axis=-1) & valid
        target = jnp.where(has, k_of * c + src_lane, k_src * c)
        return K.permute_chunks_dma(
            cfg, slots, ints, uniq, target, structure.chunk_origin, r.cumd,
            interpret=interp,
        )[0]

    t.permute_mixed, _ = timeit(f_mixed, state.slots, state.ints)

    if pipe._grid_cache is not None:
        t.grid_cache, _ = timeit(lambda s: pipe._grid_cache(s), structure)

    t.total = t.build + t.src + t.permute_mixed + t.grid_cache
    return t


def profile_sparse_substep(pipe, particles, dt=1e-3, iters=5) -> SubstepTimings:
    """Stage-by-stage timing of one SparseMpmPipeline substep."""
    from sparkl_tpu.sparse import blocks as B, transfer as T
    from sparkl_tpu.solver import dense
    from sparkl_tpu.models import registry
    from sparkl_tpu.math.kernel import inv_d as kernel_inv_d
    from sparkl_tpu.math import linalg
    from sparkl_tpu.core.grid import GridState

    pipe._ensure_cfg(particles)
    grid, models, cfg, params = pipe.grid, pipe.models, pipe._cfg, pipe.params
    dim = grid.dim
    cpb = B.cells_per_block(dim)
    nf = 1 + dim + 2
    p = particles

    def timeit(f, *a):
        r = f(*a)
        _sync(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*a)
        _sync(r)
        return (time.perf_counter() - t0) / iters * 1000.0, r

    t = SubstepTimings()

    f_s = jax.jit(lambda pos, act: B.build_structure(grid, cfg, pos, act))
    t.grid_resize_and_sort, s = timeit(f_s, p.position, p.active)

    f_dt = jax.jit(lambda p: dense.adaptive_timestep(grid, p, models, params.dt))
    t.estimate_timestep, _ = timeit(f_dt, p)

    f_stress = jax.jit(
        lambda p: registry.kirchhoff_stress(
            models, p.model_id, p.phase, p.elastic_hardening,
            p.deformation_gradient, p.velocity_gradient, p.mass, p.volume0,
        )
    )
    t.stress_update, stress = timeit(f_stress, p)

    invd = kernel_inv_d(grid.cell_width)
    affine = (
        p.mass[:, None, None] * p.velocity_gradient
        - (p.volume0 * invd * dt)[:, None, None] * stress
    )
    zero = jnp.zeros_like(p.mass)

    if pipe.use_pallas:
        from sparkl_tpu.ops import transfer_kernels as K

        def f_p2g(pos, m, v, a):
            packed = K.pack_p2g_inputs(pos, m, v, a, zero, zero)
            slot_data = K.gather_slot_data(cfg, s, packed)
            images = K.p2g_windows_pallas(
                grid, cfg, slot_data, interpret=(pipe.use_pallas == "interpret")
            )
            return T.merge_images_to_grid(grid, cfg, s, images)
    else:
        def f_p2g(pos, m, v, a):
            images = T.p2g_images(grid, cfg, s, pos, m, v, a, zero, zero,
                                  group_size=pipe.group_size)
            return T.merge_images_to_grid(grid, cfg, s, images)

    t.p2g, node = timeit(jax.jit(f_p2g), p.position, p.mass, p.velocity, affine)

    nodef = node.reshape(cfg.max_grid_blocks + 1, nf, cpb)
    mass = nodef[:, 0, :]
    mom = jnp.moveaxis(nodef[:, 1 : 1 + dim, :], 1, -1)
    vel = (mom + mass[..., None] * pipe.gravity * dt) * linalg.inv_exact(mass)[..., None]
    npos = jnp.concatenate(
        [B.block_node_positions(grid, s.grid_keys),
         jnp.full((1, cpb, dim), 1e10, jnp.float32)], 0,
    )
    gs = GridState(mass=mass, momentum=mom, velocity=vel,
                   psi_momentum=nodef[:, 1 + dim, :], psi_mass=nodef[:, 2 + dim, :])
    f_gu = jax.jit(
        lambda gs: dense.grid_update(
            grid, gs, pipe.colliders, dt, params.boundary_handling,
            params.simulation_dofs, npos,
        )
    )
    t.grid_update, gs2 = timeit(f_gu, gs)

    winf = jnp.concatenate(
        [jnp.moveaxis(gs2.velocity, -1, 1),
         (nodef[:, 1 + dim, :] * linalg.inv_exact(nodef[:, 2 + dim, :]))[:, None, :]],
        1,
    ).reshape(cfg.max_grid_blocks + 1, (dim + 1) * cpb)

    if pipe.use_pallas:
        from sparkl_tpu.ops import transfer_kernels as K
        dim = grid.dim

        def f_g2p(pos, w):
            windows = T.gather_grid_windows(grid, cfg, s, w)
            packed = K.pack_p2g_inputs(
                pos, jnp.zeros_like(pos[:, 0]), jnp.zeros_like(pos),
                jnp.zeros(pos.shape + (dim,)), zero, zero,
            )
            slot_data = K.gather_slot_data(cfg, s, packed)
            out = K.g2p_windows_pallas(
                grid, cfg, slot_data, windows,
                interpret=(pipe.use_pallas == "interpret"),
            )
            vel_s = jnp.moveaxis(out[:, :dim, :], 1, -1)
            grad_cols = out[:, dim : dim + dim * dim, :].reshape(
                cfg.max_chunks, dim, dim, cfg.chunk_size
            )
            det_s = sum(grad_cols[:, j, j, :] for j in range(dim))
            grad_s = jnp.moveaxis(jnp.moveaxis(grad_cols, (1, 2), (2, 1)), -1, 1)
            psi_s = out[:, dim + dim * dim, :]
            return vel_s, grad_s, det_s, psi_s
    else:
        def f_g2p(pos, w):
            windows = T.gather_grid_windows(grid, cfg, s, w)
            return T.g2p_from_windows(grid, cfg, s, pos, windows,
                                      group_size=pipe.group_size)[:4]

    t.g2p, outs = timeit(jax.jit(f_g2p), p.position, winf)

    inv_perm = jnp.argsort(s.sorted_ids)
    got = T.scatter_slots_to_particles(cfg, s, inv_perm, *outs)
    f_up = jax.jit(
        lambda p, v, g, de, ps: dense.particle_update_after_gather(
            grid, p, models, dt, v, g, de, ps, colliders=pipe.colliders,
            damage_model=params.damage_model,
        )
    )
    t.particle_update, _ = timeit(f_up, p, *got)

    t.total = sum(
        getattr(t, f.name) for f in fields(t) if f.name != "total"
    )
    return t
