"""The MPM pipeline: CFL-adaptive substepping around the dense solver stages.

Ref: sparkl `src/pipelines/mpm_pipeline.rs` (facade) +
`src/dynamics/solver/mls_solver.rs:15-139` (substep loop:
sort → fluid volume recompute → adaptive dt → damage → P2G → grid update →
hook → G2P, until the frame time is consumed).

TPU design: the whole frame — including the data-dependent substep loop — is
ONE jitted function using `lax.while_loop` with a traced dt. Buffer donation
reuses particle memory across frames. No host synchronization per substep
(the reference syncs twice per substep to read dt and block counts; here dt
stays on device).
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sparkl_tpu.core.grid import GridParams, GridState
from sparkl_tpu.core.params import DamageModel, SolverParameters
from sparkl_tpu.models.registry import ModelSet
from sparkl_tpu.solver import dense
from sparkl_tpu.solver.eigenerosion import evolve_eigenerosion
from sparkl_tpu.solver.phase_field import update_phase_field


class MpmHooks:
    """User hook points (ref: src/dynamics/solver/mpm_hooks.rs MpmHooks).

    `post_grid_update(state, grid, dt, node_positions) -> state` runs inside
    the jitted substep — use it for Dirichlet grid BCs (ref: l_panel2.rs
    post_grid_update_hook usage). `node_positions` has the same leading shape
    as the state's node fields (dense: [*res, d]; block-sparse:
    [blocks, 4^d, d]), so hooks written against positions work on both
    layouts.
    """

    def post_grid_update(
        self, state: GridState, grid: GridParams, dt, node_positions=None
    ) -> GridState:
        return state


class DirichletVelocityHook(MpmHooks):
    """Prescribe grid velocity at the cells containing given world points.

    Ref: l_panel2.rs BoundaryConditions::post_grid_update_hook — the loading
    is applied by pinning the velocity of one grid node.
    """

    def __init__(self, points, velocities):
        import numpy as np

        self.points = np.asarray(points, np.float32)  # [K, d]
        self.velocities = np.asarray(velocities, np.float32)  # [K, d]

    def post_grid_update(self, state, grid, dt, node_positions=None):
        vel = state.velocity
        half = 0.5 * grid.cell_width
        for pt, v in zip(self.points, self.velocities):
            near = jnp.all(
                jnp.abs(node_positions - jnp.asarray(pt)) < half, axis=-1
            )
            vel = jnp.where(near[..., None], jnp.asarray(v), vel)
        return state.replace(velocity=vel)


class MpmPipeline:
    """Owns the jitted step function for a fixed scene configuration."""

    def __init__(
        self,
        grid: GridParams,
        models: ModelSet,
        colliders=(),
        params: SolverParameters = SolverParameters(),
        gravity=None,
        hooks: Optional[MpmHooks] = None,
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
        self._node_positions = grid.node_positions()
        from sparkl_tpu.solver.eigenerosion import default_max_per_cell

        self._eigen_k = default_max_per_cell(grid.dim)
        self._step = jax.jit(self._step_impl, donate_argnums=(0,))
        # Simulation clock for runtime collider poses (step_with_stats'
        # `poses` argument) — only bookkeeping here; poses enter as traced
        # values so animated colliders never re-jit.
        self.sim_time = 0.0

    # -- one substep (traced) ------------------------------------------------

    def _substep(self, p, dt, poses=None):
        grid, models, params = self.grid, self.models, self.params
        state = dense.p2g(grid, p, models, dt, self.gravity, self.colliders,
                          poses)
        state = dense.grid_update(
            grid,
            state,
            self.colliders,
            dt,
            params.boundary_handling,
            params.simulation_dofs,
            node_positions=self._node_positions,
            gpu_boundary_semantics=params.gpu_boundary_semantics,
            poses=poses,
        )
        state = self.hooks.post_grid_update(state, grid, dt, self._node_positions)
        p = dense.g2p_update(
            grid,
            state,
            p,
            models,
            dt,
            colliders=self.colliders,
            damage_model=params.damage_model,
            enable_boundary_particle_projection=params.enable_boundary_particle_projection,
            gpu_velocity_clamp=params.gpu_velocity_clamp,
            poses=poses,
        )
        return p

    def _step_impl(self, p, poses=None):
        grid, models, params = self.grid, self.models, self.params
        min_dt = params.dt / params.max_num_substeps

        def cond(carry):
            p, remaining, niter, _ = carry
            return (remaining > 0.0) & (niter < params.max_num_substeps)

        def body(carry):
            p, remaining, niter, eig_ov = carry
            p = dense.mark_out_of_grid_failed(grid, p)

            if params.force_fluids_volume_recomputation:
                p = dense.recompute_fluids_volumes(grid, p, models)

            max_dt = jnp.minimum(remaining, params.max_substep_dt)
            dt = dense.adaptive_timestep(grid, p, models, max_dt)
            dt = jnp.where((dt < min_dt) & (remaining > min_dt), min_dt, dt)

            if params.damage_model == DamageModel.EIGENEROSION:
                p, ov = evolve_eigenerosion(grid, p, self._eigen_k)
                eig_ov = eig_ov | ov
            elif params.damage_model == DamageModel.CD_MPM:
                p = update_phase_field(grid, p, models, dt)

            p = self._substep(p, dt, poses)
            remaining = jnp.where(
                params.stop_after_one_substep, 0.0, remaining - dt
            )
            return (p, remaining, niter + 1, eig_ov)

        carry = (
            p,
            jnp.asarray(params.dt, jnp.float32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
        )
        p, _, niter, eig_ov = jax.lax.while_loop(cond, body, carry)
        return p, niter, eig_ov

    # -- public API -----------------------------------------------------------

    def step(self, particles):
        """Advance one frame of params.dt (adaptive substeps inside).

        Ref: MpmPipeline::step / MlsSolver::step."""
        p, niter = self.step_with_stats(particles)
        return p

    def step_with_stats(self, particles, poses=None):
        """One frame; `poses` optionally overrides collider isometries for
        this frame with runtime arrays (tuple aligned with the collider set,
        None entries = static baked pose) — the moving-collider path (ref:
        the CPU solver reads the live rapier pose every step,
        mls_solver.rs:7-9)."""
        eigen = self.params.damage_model == DamageModel.EIGENEROSION
        for _attempt in range(6):
            # Input is donated; keep a copy while a bucket-overflow retry is
            # possible (only the eigenerosion family can trip it).
            backup = (
                jax.tree_util.tree_map(jnp.array, particles) if eigen else None
            )
            p, niter, eig_ov = self._step(particles, poses)
            self.sim_time += float(self.params.dt)
            if not eigen or not bool(eig_ov):
                return p, niter
            # A cell held more than _eigen_k eligible neighbors: pooling was
            # incomplete. Double the bucket depth, recompile, retry (the
            # reference never drops neighbors, eigenerosion.rs:9-58).
            self._eigen_k *= 2
            self._step = jax.jit(self._step_impl, donate_argnums=(0,))
            particles = backup
            self.sim_time -= float(self.params.dt)
        raise RuntimeError("eigenerosion buckets still overflowing after regrows")
