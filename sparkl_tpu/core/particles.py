"""Particle state: a fixed-capacity structure-of-arrays pytree.

TPU-first design: instead of growable AoS storage + device SoA mirrors
(ref: sparkl `src/dynamics/particle.rs` Particle, `src/cuda/cuda_particle_set.rs`
CudaParticleSet), the whole particle population lives in one pytree of
fixed-shape arrays with an `active` mask. Append = writing into padding;
remove = clearing mask bits. Static shapes keep everything jit-compatible and
donation-friendly.

Field semantics follow particle.rs:7-149 (same defaults: F = I, phase = 1,
nacc_alpha = -0.01, hardening = 1, crack_threshold = +inf, ...).
"""

from dataclasses import dataclass, field, fields, replace
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Particles:
    # Geometry / kinematics
    position: jax.Array  # [N, d] f32
    velocity: jax.Array  # [N, d] f32
    velocity_gradient: jax.Array  # [N, d, d] f32 (APIC affine = velocity gradient)
    deformation_gradient: jax.Array  # [N, d, d] f32 (elastic part)
    plastic_def_det: jax.Array  # [N] f32 det(F_plastic)

    # Mass properties
    mass: jax.Array  # [N] f32
    volume0: jax.Array  # [N] f32
    radius0: jax.Array  # [N] f32

    # Classification / status
    model_id: jax.Array  # [N] i32
    active: jax.Array  # [N] bool (within-capacity occupancy)
    failed: jax.Array  # [N] bool
    is_static: jax.Array  # [N] bool
    kinematic_enabled: jax.Array  # [N] bool
    kinematic_vel: jax.Array  # [N, d] f32

    # Fracture / damage
    phase: jax.Array  # [N] f32 in [0, 1]
    psi_pos: jax.Array  # [N] f32
    parameter1: jax.Array  # [N] f32 (eigenerosion scratch: sum m psi)
    parameter2: jax.Array  # [N] f32 (eigenerosion scratch: sum m)
    crack_propagation_factor: jax.Array  # [N] f32
    crack_threshold: jax.Array  # [N] f32
    m_c: jax.Array  # [N] f32 (CD-MPM mobility)
    g: jax.Array  # [N] f32 (CD-MPM energy release rate)

    # Plasticity state
    nacc_alpha: jax.Array  # [N] f32
    plastic_hardening: jax.Array  # [N] f32
    elastic_hardening: jax.Array  # [N] f32
    log_vol_gain: jax.Array  # [N] f32

    # User data / debugging
    user_data: jax.Array  # [N] i32
    debug_val: jax.Array  # [N] f32

    @property
    def capacity(self) -> int:
        return self.position.shape[0]

    @property
    def dim(self) -> int:
        return self.position.shape[1]

    @property
    def num_active(self):
        return jnp.sum(self.active.astype(jnp.int32))

    def density0(self):
        return self.mass / self.volume0

    def replace(self, **kw):
        return replace(self, **kw)

    # -- runtime add/remove (ref: src/cuda/cuda_particle_set.rs:81-136
    # truncate/remove_range; JAX shapes are static, so removal is
    # deactivation — `compact` physically drops rows host-side) ------------

    def remove_range(self, start: int, end: int) -> "Particles":
        """Deactivate particles [start, end) (slot indices). Jit-safe for
        static bounds; the slots stay allocated with zero mass."""
        idx = jnp.arange(self.capacity)
        keep = (idx < start) | (idx >= end)
        return self.replace(
            active=self.active & keep,
            mass=jnp.where(keep, self.mass, 0.0),
        )

    def truncate(self, new_len: int) -> "Particles":
        """Deactivate every particle at slot >= new_len."""
        return self.remove_range(new_len, self.capacity)

    def compact(self, capacity=None) -> "Particles":
        """Physically drop inactive rows (host-side; returns a new set whose
        capacity defaults to the active count)."""
        return Particles.concatenate((self,), capacity=capacity)

    # -- construction -------------------------------------------------------

    @staticmethod
    def empty(capacity: int, dim: int, dtype=jnp.float32) -> "Particles":
        n, d = capacity, dim
        z = lambda *s: jnp.zeros(s, dtype)
        eye = jnp.broadcast_to(jnp.eye(d, dtype=dtype), (n, d, d))
        return Particles(
            position=z(n, d),
            velocity=z(n, d),
            velocity_gradient=z(n, d, d),
            deformation_gradient=eye,
            plastic_def_det=jnp.ones((n,), dtype),
            mass=z(n),
            volume0=jnp.ones((n,), dtype),
            radius0=z(n),
            model_id=jnp.zeros((n,), jnp.int32),
            active=jnp.zeros((n,), bool),
            failed=jnp.zeros((n,), bool),
            is_static=jnp.zeros((n,), bool),
            kinematic_enabled=jnp.zeros((n,), bool),
            kinematic_vel=z(n, d),
            phase=jnp.ones((n,), dtype),
            psi_pos=z(n),
            parameter1=z(n),
            parameter2=z(n),
            crack_propagation_factor=z(n),
            crack_threshold=jnp.full((n,), jnp.inf, dtype),
            m_c=jnp.full((n,), jnp.finfo(dtype).max, dtype),
            g=z(n),
            nacc_alpha=jnp.full((n,), -0.01, dtype),
            plastic_hardening=jnp.ones((n,), dtype),
            elastic_hardening=jnp.ones((n,), dtype),
            log_vol_gain=z(n),
            user_data=jnp.zeros((n,), jnp.int32),
            debug_val=z(n),
        )

    @staticmethod
    def from_positions(
        positions, model_id, radius, density0, capacity=None, **overrides
    ) -> "Particles":
        """Create particles at given positions.

        volume0 = (2r)^d, mass = volume0 * density0
        (ref: particle.rs `Particle::with_internal_energy`).
        """
        positions = np.asarray(positions, np.float32)
        n, d = positions.shape
        capacity = capacity or n
        assert capacity >= n
        p = Particles.empty(capacity, d)
        volume0 = float((2.0 * radius) ** d)
        mass = volume0 * density0
        idx = np.arange(n)
        p = p.replace(
            position=p.position.at[idx].set(positions),
            mass=p.mass.at[idx].set(mass),
            volume0=p.volume0.at[idx].set(volume0),
            radius0=p.radius0.at[idx].set(radius),
            model_id=p.model_id.at[idx].set(int(model_id)),
            active=p.active.at[idx].set(True),
        )
        for k, v in overrides.items():
            arr = getattr(p, k)
            p = p.replace(**{k: arr.at[idx].set(v)})
        return p

    @staticmethod
    def concatenate(parts: Tuple["Particles", ...], capacity=None) -> "Particles":
        """Concatenate particle sets (ref: ParticleSet::insert_batch)."""
        total = sum(int(np.sum(np.asarray(q.active))) for q in parts)
        capacity = capacity or total
        d = parts[0].dim
        out = Particles.empty(capacity, d)
        cursor = 0
        merged = {}
        for f in fields(Particles):
            merged[f.name] = np.array(np.asarray(getattr(out, f.name)))
        for q in parts:
            act = np.asarray(q.active)
            n = int(np.sum(act))
            sel = np.nonzero(act)[0]
            for f in fields(Particles):
                merged[f.name][cursor : cursor + n] = np.asarray(getattr(q, f.name))[sel]
            cursor += n
        return Particles(**{k: jnp.asarray(v) for k, v in merged.items()})


# ---------------------------------------------------------------------------
# Samplers (ref: examples2d/helper.rs, examples3d/helper.rs)
# ---------------------------------------------------------------------------


def cube_particles(origin, counts, model_id, particle_radius, density0, randomize=False, seed=0, capacity=None, **overrides):
    """Regular (optionally jittered) lattice of particles with spacing 2r.

    Ref: helper.rs `cube_particles` — particles at origin + (2r)*(i,j,k).
    `counts` is a tuple of per-axis counts; dim inferred from its length.
    """
    # Prefer the C++ host sampler (native/sparkl_host.cpp); numpy fallback.
    pts = None
    try:
        from sparkl_tpu import native

        pts = native.cube_particles(origin, counts, particle_radius, randomize, seed)
    except Exception:
        pts = None
    if pts is None:
        rng = np.random.default_rng(seed)
        axes = [np.arange(c, dtype=np.float32) for c in counts]
        mesh = np.meshgrid(*axes, indexing="ij")
        pts = np.stack([m.reshape(-1) for m in mesh], axis=-1) * (
            2.0 * particle_radius
        )
        pts += np.asarray(origin, np.float32)
        if randomize:
            pts += rng.uniform(
                -particle_radius, particle_radius, size=pts.shape
            ).astype(np.float32)
    return Particles.from_positions(
        pts, model_id, particle_radius, density0, capacity=capacity, **overrides
    )


def sample_sdf(
    sdf_fn,
    lo,
    hi,
    model_id,
    particle_radius,
    density0,
    randomize=False,
    seed=0,
    capacity=None,
    **overrides,
):
    """Rejection-sample a lattice inside an SDF (negative = inside).

    Ref: helper.rs `sample_shape` (rejection sampling inside a parry shape).
    """
    rng = np.random.default_rng(seed)
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    d = lo.shape[0]
    step = 2.0 * particle_radius
    axes = [np.arange(lo[i] + particle_radius, hi[i], step, dtype=np.float32) for i in range(d)]
    mesh = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([m.reshape(-1) for m in mesh], axis=-1)
    if randomize:
        pts += rng.uniform(-particle_radius, particle_radius, size=pts.shape).astype(
            np.float32
        )
    dist = np.asarray(sdf_fn(pts))
    pts = pts[dist < 0.0]
    return Particles.from_positions(
        pts, model_id, particle_radius, density0, capacity=capacity, **overrides
    )
