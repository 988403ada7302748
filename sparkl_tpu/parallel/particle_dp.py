"""Multi-chip particle data parallelism: particles sharded, grid all-reduced.

First-tier scaling strategy (the block-sparse domain decomposition with halo
`ppermute` lands in sparkl_tpu.parallel.domain). Equivalent role to the
reference's multi-GPU split of particles across devices (ref: sparkl
`src/third_party/rapier/testbed_plugin.rs:182-204` partitions particles per
device; halo merge is additive — `src_kernels/cuda/sort.rs merge_halo_blocks`).
Here the "halo" is the entire grid: each chip scatters its particles into a
local grid copy and a `psum` over the mesh axis produces the global grid —
exact (addition is the same reduction), simple, and bandwidth-bound only in
the grid size, not particle count. Grid update is computed redundantly per
chip (cheap, avoids a broadcast); G2P reads the replicated grid locally.

dt reduction = `lax.pmin`, matching the reference's cross-device fixed-point
atomic min (`src_kernels/cuda/timestep.rs` + min across devices in
`cuda_mpm_pipeline.rs:381-398`).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.core.params import DamageModel, SolverParameters
from sparkl_tpu.models.registry import ModelSet
from sparkl_tpu.solver import dense
from sparkl_tpu.solver.pipeline import MpmHooks, MpmPipeline


def pad_capacity(particles, multiple):
    """Pad particle capacity up to a multiple (for even sharding)."""
    import numpy as np
    from sparkl_tpu.core.particles import Particles

    cap = particles.capacity
    target = -(-cap // multiple) * multiple
    if target == cap:
        return particles
    pad = target - cap
    out = {}
    for name in particles.__dataclass_fields__:
        arr = getattr(particles, name)
        widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        if name == "deformation_gradient":
            d = arr.shape[-1]
            eye = jnp.broadcast_to(jnp.eye(d, dtype=arr.dtype), (pad, d, d))
            out[name] = jnp.concatenate([arr, eye], axis=0)
        elif name in ("plastic_def_det", "elastic_hardening", "plastic_hardening", "phase", "volume0"):
            out[name] = jnp.concatenate(
                [arr, jnp.ones((pad,) + arr.shape[1:], arr.dtype)], axis=0
            )
        else:
            out[name] = jnp.pad(arr, widths)
    return type(particles)(**out)


class ParticleDpPipeline(MpmPipeline):
    """MpmPipeline sharded over a 1D mesh axis of particles."""

    def __init__(
        self,
        grid: GridParams,
        models: ModelSet,
        colliders=(),
        params: SolverParameters = SolverParameters(),
        gravity=None,
        hooks=None,
        mesh: Mesh = None,
        axis: str = "p",
    ):
        if mesh is None:
            mesh = Mesh(jax.devices(), (axis,))
        if params.damage_model in (DamageModel.EIGENEROSION, DamageModel.CD_MPM):
            raise NotImplementedError(
                "neighbor-based damage models require the domain-decomposed "
                "path (sparkl_tpu.parallel.domain)"
            )
        self.mesh = mesh
        self.axis = axis
        super().__init__(grid, models, colliders, params, gravity, hooks)
        sharded = jax.shard_map(
            self._sharded_step_impl,
            mesh=mesh,
            in_specs=(P(axis),),
            out_specs=(P(axis), P()),
        )
        self._step = jax.jit(sharded, donate_argnums=(0,))

    def shard(self, particles):
        """Pad + device_put particles with the particle axis sharded."""
        particles = pad_capacity(particles, self.mesh.devices.size)
        sharding = NamedSharding(self.mesh, P(self.axis))
        return jax.device_put(particles, sharding)

    def _psum_grid(self, state):
        ax = self.axis
        return state.replace(
            mass=jax.lax.psum(state.mass, ax),
            momentum=jax.lax.psum(state.momentum, ax),
            psi_momentum=jax.lax.psum(state.psi_momentum, ax),
            psi_mass=jax.lax.psum(state.psi_mass, ax),
        )

    def _sharded_step_impl(self, p):
        grid, models, params = self.grid, self.models, self.params
        min_dt = params.dt / params.max_num_substeps
        ax = self.axis

        def cond(carry):
            _, remaining, niter = carry
            return (remaining > 0.0) & (niter < params.max_num_substeps)

        def body(carry):
            p, remaining, niter = carry
            p = dense.mark_out_of_grid_failed(grid, p)
            if params.force_fluids_volume_recomputation:
                p = dense.recompute_fluids_volumes(
                    grid, p, models, reduce_fn=lambda m: jax.lax.psum(m, ax)
                )

            max_dt = jnp.minimum(remaining, params.max_substep_dt)
            dt = dense.adaptive_timestep(grid, p, models, max_dt)
            dt = jax.lax.pmin(dt, ax)
            dt = jnp.where((dt < min_dt) & (remaining > min_dt), min_dt, dt)

            state = dense.p2g_scatter(grid, p, models, dt, self.colliders)
            state = self._psum_grid(state)
            state = dense.p2g_finalize(state, dt, self.gravity)
            state = dense.grid_update(
                grid,
                state,
                self.colliders,
                dt,
                params.boundary_handling,
                params.simulation_dofs,
                node_positions=self._node_positions,
                gpu_boundary_semantics=params.gpu_boundary_semantics,
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
            )
            remaining = jnp.where(params.stop_after_one_substep, 0.0, remaining - dt)
            return (p, remaining, niter + 1)

        carry = (p, jnp.asarray(params.dt, jnp.float32), jnp.asarray(0, jnp.int32))
        p, _, niter = jax.lax.while_loop(cond, body, carry)
        return p, niter
