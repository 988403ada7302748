"""Block-sparse MPM pipeline — the TPU performance path.

Equivalent role to the reference's `CudaMpmPipeline::step` (ref: sparkl
`src/cuda/cuda_mpm_pipeline.rs:262-645`): per substep — sparse structure
rebuild (sort), dt estimation, transfers, grid update — but with zero
per-substep host synchronization (the reference syncs to read block counts
and dt; here both stay on device, and capacity overflow is detected after
the frame and retried host-side with a bigger table, mirroring the hashmap
regrow loop in cuda_sparse_grid.rs:161-253).

Semantics match sparkl_tpu.solver.dense (and therefore the reference CPU
pipeline); tests/test_sparse.py enforces dense<->sparse equivalence.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.core.params import DamageModel, SolverParameters
from sparkl_tpu.core.grid import GridState
from sparkl_tpu.math import linalg
from sparkl_tpu.math.kernel import inv_d as kernel_inv_d
from sparkl_tpu.models import registry
from sparkl_tpu.solver import dense
from sparkl_tpu.solver.pipeline import MpmHooks
from sparkl_tpu.sparse import blocks as B
from sparkl_tpu.sparse import transfer as T

# Overflow flag bits (int32 scalar threaded through the substep loop): the
# host regrow-retry loop grows the capacity that actually tripped.
OVERFLOW_TABLES = 1  # block/chunk/grid tables or halo/migration buffers
OVERFLOW_EIGEN = 2  # eigenerosion per-cell neighbor buckets
OVERFLOW_MERGE = 4  # a block compressed past MERGE_KMAX chunks (fused merge)


class SparseMpmPipeline:
    """Same API as MpmPipeline; block-sparse MXU transfer path."""

    def __init__(
        self,
        grid: GridParams,
        models: registry.ModelSet,
        colliders=(),
        params: SolverParameters = SolverParameters(),
        gravity=None,
        hooks: Optional[MpmHooks] = None,
        config: Optional[B.BlockConfig] = None,
        capacity_hint: Optional[int] = None,
        group_size: int = 256,
        donate: bool = False,
        use_pallas=None,  # None = auto (TPU backend); "interpret" for tests
        calibration_slack: float = 1.4,
    ):
        self.grid = grid
        self.models = models
        self.colliders = tuple(colliders)
        self.params = params
        d = grid.dim
        if gravity is None:
            gravity = [0.0, -9.81] if d == 2 else [0.0, -9.81, 0.0]
        self.gravity = jnp.asarray(gravity, jnp.float32)
        self.hooks = hooks or MpmHooks()
        self.group_size = group_size
        self._cfg = config
        self._capacity_hint = capacity_hint
        self._calibration_slack = calibration_slack
        self._jit = None
        self._donate = donate
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        # Injection points for the domain-decomposed subclass
        # (sparkl_tpu.parallel.domain): cross-device halo merge, dt reduction,
        # and per-substep particle migration.
        self._halo_fn = None       # (node_table, structure) -> node_table
        self._dt_reduce = None     # dt -> dt  (e.g. lax.pmin)
        self._migrate_fn = None    # particles -> (particles, overflow_bool)
        self._pvary = None         # mark a scalar as device-varying (shard_map)
        from sparkl_tpu.solver.eigenerosion import default_max_per_cell

        self._eigen_k = default_max_per_cell(grid.dim)
        self._kernel_vma = None    # mesh axes pallas outputs vary over

    # -- capacity management (host-side regrow & retry) ----------------------

    def _ensure_cfg(self, p):
        if self._cfg is None:
            # Measure the actual distribution once (host-side) instead of
            # guessing: padded chunks cost real einsum time every substep.
            # Generous slack: a mid-run overflow costs a full recompile
            # (~40-60s through the remote-compile tunnel).
            self._cfg = B.BlockConfig.calibrate(
                self.grid, p.position, p.active, slack=self._calibration_slack
            )
        if self._jit is None:
            self._jit = jax.jit(
                self._step_impl, donate_argnums=(0,) if self._donate else ()
            )

    def _grow(self, factor=1.6):
        c = self._cfg
        self._cfg = B.BlockConfig(
            max_blocks=int(c.max_blocks * factor) + 64,
            max_chunks=int(c.max_chunks * factor) + 64,
            chunk_size=c.chunk_size,
            max_grid_blocks=int(c.max_grid_blocks * factor) + 64,
        )
        self._jit = jax.jit(
            self._step_impl, donate_argnums=(0,) if self._donate else ()
        )

    # -- one substep (traced) -------------------------------------------------

    def _recompute_fluids_sparse(self, p, structure, inv_perm):
        """Fluid volume recomputation on the block-sparse transfers:
        mass-only P2G, then a mass gather per particle; sets F00 = V_new/V0
        for fluids (ref: fluids_volume.rs recompute_fluids_volumes)."""
        grid, models, cfg = self.grid, self.models, self._cfg
        dim = grid.dim
        cpb = B.cells_per_block(dim)
        zero = jnp.zeros_like(p.mass)
        zvec = jnp.zeros_like(p.velocity)
        zmat = jnp.zeros_like(p.velocity_gradient)

        images = T.p2g_images(
            grid, cfg, structure, p.position, p.mass, zvec, zmat, zero, zero,
            group_size=self.group_size, with_psi=True,
        )
        nf_psi = 1 + dim + 2
        node = T.merge_images_to_grid(grid, cfg, structure, images)
        halo_ov = jnp.asarray(False)
        if self._halo_fn is not None:
            # Mass-channel halo: boundary columns' partial masses summed
            # across shards before the density gather (the multi-chip
            # extension of fluids_volume.rs).
            node, halo_ov = self._halo_fn(node, structure)
        node = node.reshape(cfg.max_grid_blocks + 1, nf_psi, cpb)
        mass_g = node[:, 0, :]
        # Gather through the psi channel of the window machinery.
        win_fields = jnp.concatenate(
            [jnp.zeros((cfg.max_grid_blocks + 1, dim, cpb), jnp.float32),
             mass_g[:, None, :]],
            axis=1,
        ).reshape(cfg.max_grid_blocks + 1, (dim + 1) * cpb)
        windows = T.gather_grid_windows(grid, cfg, structure, win_fields)
        _, _, _, mass_s, _ = T.g2p_from_windows(
            grid, cfg, structure, p.position, windows,
            group_size=self.group_size, with_psi=True,
        )
        (new_mass,) = T.scatter_slots_to_particles(cfg, structure, inv_perm, mass_s)

        h = grid.cell_width
        new_density = new_mass / (h**dim)
        new_volume = p.mass / jnp.maximum(new_density, 1e-20)
        is_fluid = models.is_fluid(p.model_id)
        f = p.deformation_gradient
        f = f.at[:, 0, 0].set(
            jnp.where(is_fluid & p.active, new_volume / p.volume0, f[:, 0, 0])
        )
        return p.replace(deformation_gradient=f), halo_ov

    def _evolve_eigenerosion_p(self, p):
        """Eigenerosion damage pass returning (p, overflow_flags int32);
        the domain subclass overrides this to exchange boundary-strip ghost
        particles first."""
        from sparkl_tpu.solver.eigenerosion import evolve_eigenerosion

        p, ov = evolve_eigenerosion(self.grid, p, self._eigen_k)
        return p, ov.astype(jnp.int32) * OVERFLOW_EIGEN

    def _update_phase_field_p(self, p, dt, structure=None):
        """CD-MPM phase-field CG on the active-block node table (the CG work
        arrays shrink from res^d to active_blocks*4^d — the reference's
        phase field lives on its sparse SpGrid too, phase_field.rs); the
        domain subclass overrides with the dense space + psum."""
        from sparkl_tpu.solver.phase_field import (
            BlockNodeSpace,
            update_phase_field,
        )

        space = None
        if structure is not None:
            space = BlockNodeSpace(
                self.grid, structure.grid_keys, B._block_space(self.grid),
                block_offset=0,
            )
        return update_phase_field(
            self.grid, p, self.models, dt, node_space=space
        )

    @property
    def _with_psi(self):
        # psi (crack energy) transfer channels exist only for the
        # eigenerosion damage family; skipping them saves a third of the
        # transfer payload traffic for plain scenes.
        return self.params.damage_model in (
            DamageModel.EIGENEROSION,
            DamageModel.MODIFIED_EIGENEROSION,
        )

    def _substep(self, p, dt, structure, inv_perm, poses=None):
        grid, models, params, cfg = self.grid, self.models, self.params, self._cfg
        dim = grid.dim
        cpb = B.cells_per_block(dim)
        h = grid.cell_width
        invd = kernel_inv_d(h)
        with_psi = self._with_psi
        nf = 1 + dim + (2 if with_psi else 0)

        # Stress + affine in flat layout.
        stress = registry.kirchhoff_stress(
            models,
            p.model_id,
            p.phase,
            p.elastic_hardening,
            p.deformation_gradient,
            p.velocity_gradient,
            p.mass,
            p.volume0,
        )
        stress = jnp.where(p.failed[..., None, None], 0.0, stress)
        affine = (
            p.mass[..., None, None] * p.velocity_gradient
            - (p.volume0 * invd * dt)[..., None, None] * stress
        )
        psi_mass_p = jnp.where(
            (p.phase > 0.0) & (p.crack_propagation_factor != 0.0) & ~p.failed,
            p.mass,
            0.0,
        )
        psi_mom_p = psi_mass_p * p.psi_pos

        # Penalty-stiffness collider coupling rides the momentum channel as
        # an effective velocity: m*(v + dv) = m*v + force*dt (dense.p2g's
        # contract; None unless a collider opts in).
        velocity_p2g = p.velocity
        pen = dense.penalty_velocity_delta(
            self.colliders, p.position, p.mass, dt, poses
        )
        if pen is not None:
            velocity_p2g = velocity_p2g + pen

        # P2G.
        if self.use_pallas:
            from sparkl_tpu.ops import transfer_kernels as K

            # One wide-row gather into f-major chunk-slot layout, then the
            # double-buffered window kernel (weights live only in VMEM).
            packed = K.pack_p2g_inputs(
                p.position, p.mass, velocity_p2g, affine, psi_mass_p, psi_mom_p
            )
            slot_data = K.gather_slot_data(cfg, structure, packed)
            images = K.p2g_windows_pallas(
                grid, cfg, slot_data,
                interpret=(self.use_pallas == "interpret"),
                with_psi=with_psi,
                vma=self._kernel_vma,
            )
        else:
            slot_data = None
            images = T.p2g_images(
                grid,
                cfg,
                structure,
                p.position,
                p.mass,
                velocity_p2g,
                affine,
                psi_mass_p,
                psi_mom_p,
                group_size=self.group_size,
                with_psi=with_psi,
            )
        node = T.merge_images_to_grid(grid, cfg, structure, images)
        halo_overflow = jnp.asarray(False)
        if self._halo_fn is not None:
            # Cross-device additive merge of boundary-column block rows
            # (ref: sort.rs merge_halo_blocks).
            node, halo_overflow = self._halo_fn(node, structure)
        node = node.reshape(cfg.max_grid_blocks + 1, nf, cpb)

        mass = node[:, 0, :]
        mom = jnp.moveaxis(node[:, 1 : 1 + dim, :], 1, -1)  # [MGB+1, cpb, d]
        if with_psi:
            psi_mom_g = node[:, 1 + dim, :]
            psi_mass_g = node[:, 2 + dim, :]
        else:
            psi_mom_g = jnp.zeros_like(mass)
            psi_mass_g = jnp.zeros_like(mass)

        inv_mass = linalg.inv_exact(mass)
        velocity = (mom + mass[..., None] * self.gravity * dt) * inv_mass[..., None]

        # Grid update (reuses the dense stage; leading dims are (MGB+1, cpb)).
        node_pos = B.block_node_positions(grid, structure.grid_keys)
        node_pos = jnp.concatenate(
            [node_pos, jnp.full((1, cpb, dim), 1.0e10, jnp.float32)], axis=0
        )
        gstate = GridState(
            mass=mass,
            momentum=mom,
            velocity=velocity,
            psi_momentum=psi_mom_g,
            psi_mass=psi_mass_g,
        )
        gstate = dense.grid_update(
            grid,
            gstate,
            self.colliders,
            dt,
            params.boundary_handling,
            params.simulation_dofs,
            node_positions=node_pos,
            gpu_boundary_semantics=params.gpu_boundary_semantics,
            poses=poses,
        )
        gstate = self.hooks.post_grid_update(gstate, grid, dt, node_pos)
        velocity = gstate.velocity.at[cfg.max_grid_blocks].set(0.0)

        # G2P windows: channels [vel(d)[, psi_ratio]].
        win_parts = [jnp.moveaxis(velocity, -1, 1)]
        if with_psi:
            win_parts.append((psi_mom_g * linalg.inv_exact(psi_mass_g))[:, None, :])
        n_win = dim + (1 if with_psi else 0)
        win_fields = jnp.concatenate(win_parts, axis=1).reshape(
            cfg.max_grid_blocks + 1, n_win * cpb
        )
        windows = T.gather_grid_windows(grid, cfg, structure, win_fields)

        if self.use_pallas:
            from sparkl_tpu.ops import transfer_kernels as K

            out = K.g2p_windows_pallas(
                grid, cfg, slot_data, windows,
                interpret=(self.use_pallas == "interpret"),
                with_psi=with_psi,
                vma=self._kernel_vma,
            )  # [D, d + d*d (+1), C]
            # ONE wide row-gather back to particle order, then split fields
            # (per-field narrow gathers cost per-row on TPU).
            nf_out = out.shape[1]
            rows = jnp.moveaxis(out, 1, 2).reshape(
                cfg.max_chunks * cfg.chunk_size, nf_out
            )
            got = T.gather_slot_rows(cfg, structure, inv_perm, rows)  # [N, nf]
            velocity_p = got[:, :dim]
            grad_cols = got[:, dim : dim + dim * dim].reshape(-1, dim, dim)
            grad_p = jnp.swapaxes(grad_cols, 1, 2)  # rows were j-major
            det_p = sum(grad_cols[:, j, j] for j in range(dim))
            psi_p = (
                got[:, dim + dim * dim]
                if with_psi
                else jnp.zeros_like(det_p)
            )
        else:
            vel_s, grad_s, det_s, psi_s, _valid = T.g2p_from_windows(
                grid, cfg, structure, p.position, windows,
                group_size=self.group_size, with_psi=with_psi,
            )
            velocity_p, grad_p, det_p, psi_p = T.scatter_slots_to_particles(
                cfg, structure, inv_perm, vel_s, grad_s, det_s, psi_s
            )

        p = dense.particle_update_after_gather(
            grid,
            p,
            models,
            dt,
            velocity_p,
            grad_p,
            det_p,
            psi_p,
            colliders=self.colliders,
            damage_model=params.damage_model,
            enable_boundary_particle_projection=params.enable_boundary_particle_projection,
            gpu_velocity_clamp=params.gpu_velocity_clamp,
            poses=poses,
        )
        overflow = (
            (structure.num_blocks > cfg.max_blocks)
            | (structure.num_grid_blocks > cfg.max_grid_blocks)
            | (structure.num_chunks > cfg.max_chunks)
            | halo_overflow
        )
        return p, overflow.astype(jnp.int32) * OVERFLOW_TABLES

    def _step_impl(self, p, poses=None):
        grid, models, params = self.grid, self.models, self.params
        min_dt = params.dt / params.max_num_substeps

        def cond(carry):
            _, remaining, niter, _, _ = carry
            return (remaining > 0.0) & (niter < params.max_num_substeps)

        def body(carry):
            p, remaining, niter, overflow, peak = carry
            p = dense.mark_out_of_grid_failed(grid, p)

            if self._migrate_fn is not None:
                p, mig_overflow = self._migrate_fn(p)
                overflow = overflow | mig_overflow

            # One structure build per substep, shared by the fluid-volume
            # recompute and the transfer stages (the reference sorts once per
            # substep too, mls_solver.rs:36-47).
            structure = B.build_structure(grid, self._cfg, p.position, p.active)
            inv_perm = jnp.argsort(structure.sorted_ids)
            peak = jnp.maximum(peak, structure.num_chunks)

            if params.force_fluids_volume_recomputation:
                p, fv_ov = self._recompute_fluids_sparse(p, structure, inv_perm)
                overflow = overflow | fv_ov.astype(jnp.int32) * OVERFLOW_TABLES

            max_dt = jnp.minimum(remaining, params.max_substep_dt)
            dt = dense.adaptive_timestep(grid, p, models, max_dt)
            if self._dt_reduce is not None:
                dt = self._dt_reduce(dt)
            dt = jnp.where((dt < min_dt) & (remaining > min_dt), min_dt, dt)

            if params.damage_model == DamageModel.EIGENEROSION:
                p, eig_flags = self._evolve_eigenerosion_p(p)
                overflow = overflow | eig_flags
            elif params.damage_model == DamageModel.CD_MPM:
                p = self._update_phase_field_p(p, dt, structure)

            p, ov = self._substep(p, dt, structure, inv_perm, poses)
            remaining = jnp.where(params.stop_after_one_substep, 0.0, remaining - dt)
            return (p, remaining, niter + 1, overflow | ov, peak)

        overflow0 = jnp.asarray(0, jnp.int32)
        peak0 = jnp.asarray(0, jnp.int32)
        if self._pvary is not None:
            # Under shard_map these are device-varying; the while_loop carry
            # must start with matching axis metadata.
            overflow0 = self._pvary(overflow0)
            peak0 = self._pvary(peak0)
        carry = (
            p,
            jnp.asarray(params.dt, jnp.float32),
            jnp.asarray(0, jnp.int32),
            overflow0,
            peak0,
        )
        p, _, niter, overflow, peak = jax.lax.while_loop(cond, body, carry)
        return p, niter, overflow, peak

    # -- public API -----------------------------------------------------------

    def step(self, particles):
        p, niter = self.step_with_stats(particles)
        return p

    def step_with_stats(self, particles, poses=None):
        """One frame; `poses` optionally overrides collider isometries for
        this frame with runtime (traced) arrays — tuple aligned with the
        collider set, None entries keep the baked static pose (ref: the CPU
        solver reads the live rapier pose every step, mls_solver.rs:7-9)."""
        self._ensure_cfg(particles)
        # poses=None stays OUT of the call: the domain subclass's shard_map
        # wrapper declares a single (particles,) input spec, and the default
        # argument covers the static case identically.
        args = (particles,) if poses is None else (particles, poses)
        for _attempt in range(6):
            p, niter, overflow, peak = self._jit(*args)
            flags = int(overflow)
            if flags == 0:
                self._adapt_capacity(int(peak), p)
                return p, niter
            # Capacity overflow: grow whichever table tripped and retry the
            # whole frame from the saved input (ref: cuda_sparse_grid.rs
            # regrow-and-retry).
            self._handle_overflow(flags)
        raise RuntimeError("block table capacity still overflowing after regrows")

    def _handle_overflow(self, flags):
        if flags & OVERFLOW_EIGEN:
            # A cell exceeded the eigenerosion neighbor-bucket capacity:
            # pooling would silently drop neighbors (the reference never
            # does, eigenerosion.rs). Double the bucket depth and recompile.
            self._eigen_k *= 2
            self._jit = None
            self._jit_frames = {}
            self._ensure_cfg(None)
        if flags & OVERFLOW_TABLES:
            self._grow()

    def _adapt_capacity(self, peak_chunks, p):
        """Preemptive capacity management (the reference regrows its hashmap
        at >50% load, cuda_sparse_grid.rs:217-221): re-calibrate from the
        CURRENT particle distribution when chunk occupancy crosses 85%
        (before an overflow wastes a frame) or stays under 45% for a while
        (padding costs real compute in every per-slot stage)."""
        cap = self._cfg.max_chunks
        self._low_use_frames = getattr(self, "_low_use_frames", 0)
        if peak_chunks > 0.85 * cap:
            self._recalibrate(p)
        elif peak_chunks < 0.45 * cap:
            self._low_use_frames += 1
            if self._low_use_frames >= 20:
                self._recalibrate(p)
        else:
            self._low_use_frames = 0

    def _recalibrate(self, p):
        self._cfg = B.BlockConfig.calibrate(
            self.grid, p.position, p.active, slack=self._calibration_slack
        )
        self._jit = None
        self._jit_frames = {}
        self._low_use_frames = 0
        self._ensure_cfg(p)

    def run_frames(
        self, particles, num_frames: int, frames_per_launch: int | None = None
    ):
        """Advance `num_frames` frames in ONE device program (a lax.scan of
        frames around the substep while_loop) — no per-frame host round trips
        (each costs ~26ms through a tunneled chip). Returns
        (particles, total_substeps). Capacity overflow in any frame aborts to
        the host regrow-retry loop with the ORIGINAL input.

        `frames_per_launch` splits the span into several device programs of at
        most that many frames (all chunks share one compiled shape). Use it
        when a single program would run for minutes — remote/tunneled runtimes
        enforce per-execution RPC deadlines (observed worker restarts past
        ~90s on the tunneled v5e), and it bounds recompile waste when adaptive
        capacity regrows mid-span."""
        if frames_per_launch is not None and frames_per_launch < num_frames:
            total = 0
            done = 0
            while done < num_frames:
                k = min(frames_per_launch, num_frames - done)
                particles, t = self.run_frames(particles, k)
                total += int(t)
                done += k
            return particles, total
        self._ensure_cfg(particles)
        if not hasattr(self, "_jit_frames"):
            self._jit_frames = {}
        key = (num_frames, self._cfg)

        def frames_fn(p):
            def body(carry, _):
                p, total, ov, peak = carry
                p, niter, ov2, pk = self._step_impl(p)
                return (p, total + niter, ov | ov2, jnp.maximum(peak, pk)), None

            ov0 = jnp.asarray(0, jnp.int32)
            pk0 = jnp.asarray(0, jnp.int32)
            if self._pvary is not None:
                ov0 = self._pvary(ov0)
                pk0 = self._pvary(pk0)
            (p, total, ov, peak), _ = jax.lax.scan(
                body, (p, jnp.asarray(0, jnp.int32), ov0, pk0), None,
                length=num_frames,
            )
            return p, total, ov, peak

        if key not in self._jit_frames:
            self._jit_frames[key] = jax.jit(frames_fn)
        for _attempt in range(6):
            p, total, overflow, peak = self._jit_frames[key](particles)
            flags = int(overflow)
            if flags == 0:
                self._adapt_capacity(int(peak), p)
                return p, total
            self._handle_overflow(flags)
            key = (num_frames, self._cfg)
            if key not in self._jit_frames:
                self._jit_frames[key] = jax.jit(frames_fn)
        raise RuntimeError("block table capacity still overflowing after regrows")
