"""Dense-grid MLS-MPM solver stages (single chip, pure jnp).

This is the semantic reference implementation of the pipeline — the same role
sparkl's CPU `MlsSolver` plays against its CUDA pipeline (ref:
`src/dynamics/solver/mls_solver.rs`, `particle_to_grid.rs`, `grid_update.rs`,
`grid_to_particle.rs`, `timestep_estimator.rs`). Stage math matches the
reference CPU path exactly; parallel-reduction order differs (XLA scatter-add
is deterministic — no region coloring / spinlocks needed, a design win on TPU).

The Pallas block-sparse path (sparkl_tpu.ops / sparkl_tpu.sparse) must agree
with these functions to tolerance; tests enforce that.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sparkl_tpu.core.grid import GridParams, GridState, stencil_offsets
from sparkl_tpu.core.params import BoundaryHandling, SimulationDofs, DamageModel
from sparkl_tpu.math import linalg
from sparkl_tpu.math.kernel import quadratic_weights_1d, inv_d as kernel_inv_d
from sparkl_tpu.models import registry


def base_cell_and_fx(grid: GridParams, position):
    """Associated ("base") node index and fractional offset.

    base = round(x/h) - 1 per axis (ref: particle.rs
    `dir_to_associated_grid_node`), expressed in grid-local node indices;
    fx = (x - origin)/h - base in [0.5, 1.5).
    """
    origin = jnp.asarray(grid.origin, position.dtype)
    xg = (position - origin) / grid.cell_width
    base = jnp.round(xg).astype(jnp.int32) - 1
    fx = xg - base.astype(position.dtype)
    res = jnp.asarray(grid.res, jnp.int32)
    in_bounds = jnp.all((base >= 0) & (base + 2 <= res - 1), axis=-1)
    return base, fx, in_bounds


def _flat_index(grid: GridParams, idx):
    """Ravel [..., d] node indices (clipped) into flat indices."""
    res = grid.res
    idx = jnp.clip(idx, 0, jnp.asarray(res, jnp.int32) - 1)
    flat = idx[..., 0]
    for ax in range(1, len(res)):
        flat = flat * res[ax] + idx[..., ax]
    return flat


def mark_out_of_grid_failed(grid: GridParams, p):
    """Particles whose stencil leaves the grid are marked failed
    (ref: particle_set.rs:132-135 sort -> failed on out-of-bounds)."""
    _, _, ok = base_cell_and_fx(grid, p.position)
    return p.replace(failed=p.failed | (p.active & ~ok))


def _pose_of(poses, ci):
    """Runtime pose override for collider `ci` from a `poses` tuple aligned
    with the collider set (entries None for static colliders)."""
    if poses is None:
        return None
    return poses[ci]


def penalty_velocity_delta(colliders, position, mass, dt, poses=None):
    """Per-particle velocity-equivalent of the collider penalty force:
    delta_v = (sum over penalty colliders of (proj - pos) * stiffness,
    inside only) * dt / m — so that m * (v + delta_v) = m*v + force*dt, the
    momentum the reference's g2p2g scatters (ref: particle_updater.rs:203-232
    computes the force, g2p2g.rs:287 adds force*dt to the scattered momentum;
    the reference gates the block on a hardcoded `if false`, so stiffness 0 —
    the default — reproduces its effective behavior). Returns None when no
    collider opts in (zero-cost static gate)."""
    pen = [(ci, c) for ci, c in enumerate(colliders)
           if float(c.penalty_stiffness) > 0.0]
    if not pen:
        return None
    force = jnp.zeros_like(position)
    for ci, c in pen:
        proj, inside = c.project_point(position, _pose_of(poses, ci))
        force = force + jnp.where(
            inside[..., None], (proj - position) * c.penalty_stiffness, 0.0
        )
    return force * (dt * linalg.inv_exact(mass))[..., None]


def p2g_scatter(grid: GridParams, p, models: registry.ModelSet, dt,
                colliders=(), poses=None):
    """APIC particle-to-grid scatter (raw sums, no velocity yet).

    Ref: particle_to_grid.rs `particle_to_grid_scatter` — per-particle stress
    via the constitutive model, affine = m·C − V0·D⁻¹·dt·σ, scatter of
    {mass, momentum, psi} over the 3^d stencil. `colliders` only contribute
    here through penalty stiffness (see penalty_velocity_delta).

    Split from `p2g_finalize` so the multi-chip path can psum partial grids
    between the two (ref: the halo-merge additive reduction in
    src_kernels/cuda/sort.rs `merge_halo_blocks`).
    """
    d = p.dim
    h = grid.cell_width
    invd = kernel_inv_d(h)

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
    velocity = p.velocity
    pen = penalty_velocity_delta(colliders, p.position, p.mass, dt, poses)
    if pen is not None:
        velocity = velocity + pen
    momentum = p.mass[..., None] * velocity

    psi_mass_p = jnp.where(
        (p.phase > 0.0) & (p.crack_propagation_factor != 0.0) & ~p.failed,
        p.mass,
        0.0,
    )
    psi_mom_p = psi_mass_p * p.psi_pos

    base, fx, in_bounds = base_cell_and_fx(grid, p.position)
    contributes = p.active & in_bounds
    w1d = quadratic_weights_1d(fx)  # [N, d, 3]

    offsets = stencil_offsets(d)  # [3^d, d]
    n = p.capacity
    k = offsets.shape[0]

    # Build [N, 3^d] weights, flat indices, and packed node payloads.
    weights = jnp.ones((n, k), p.position.dtype)
    for ax in range(d):
        weights = weights * w1d[:, ax, offsets[:, ax]]
    weights = weights * contributes[:, None]

    idx = base[:, None, :] + jnp.asarray(offsets, jnp.int32)[None, :, :]  # [N,K,d]
    flat = _flat_index(grid, idx)  # [N, K]

    dpt = (jnp.asarray(offsets, fx.dtype)[None] - fx[:, None, :]) * h  # [N,K,d]
    mom_c = (
        jnp.einsum("nij,nkj->nki", affine, dpt) + momentum[:, None, :]
    ) * weights[..., None]

    payload = jnp.concatenate(
        [
            (weights * p.mass[:, None])[..., None],
            mom_c,
            (weights * psi_mom_p[:, None])[..., None],
            (weights * psi_mass_p[:, None])[..., None],
        ],
        axis=-1,
    )  # [N, K, d+3]

    flat_all = flat.reshape(-1)
    payload_all = payload.reshape(-1, d + 3)
    nodes = jnp.zeros((grid.num_nodes, d + 3), p.position.dtype)
    nodes = nodes.at[flat_all].add(payload_all, mode="drop")

    mass = nodes[:, 0].reshape(grid.res)
    mom = nodes[:, 1 : 1 + d].reshape(grid.res + (d,))
    psi_mom = nodes[:, 1 + d].reshape(grid.res)
    psi_mass = nodes[:, 2 + d].reshape(grid.res)

    return GridState(
        mass=mass,
        momentum=mom,
        velocity=jnp.zeros_like(mom),
        psi_momentum=psi_mom,
        psi_mass=psi_mass,
    )


def p2g_finalize(state: GridState, dt, gravity):
    """velocity = (momentum + m·g·dt) / m on occupied nodes
    (ref: particle_to_grid.rs:88-89, folded into the scatter there)."""
    gravity = jnp.asarray(gravity, state.momentum.dtype)
    inv_mass = linalg.inv_exact(state.mass)
    velocity = (state.momentum + state.mass[..., None] * gravity * dt) * inv_mass[
        ..., None
    ]
    return state.replace(velocity=velocity)


def p2g(grid: GridParams, p, models: registry.ModelSet, dt, gravity,
        colliders=(), poses=None):
    """Full P2G: scatter + gravity/mass normalization."""
    return p2g_finalize(
        p2g_scatter(grid, p, models, dt, colliders, poses), dt, gravity
    )


def grid_node_projections(colliders, node_positions, poses=None,
                          only=None):
    """Per-collider (proj, inside) for every node. A pure function of node
    positions (collider geometry is a trace-time constant), so sparse
    pipelines can compute it once per structure rebuild and carry it across
    substeps — the reference's projection cache (ref: reset_grid.rs:29-63
    copy_grid_projection_data carries per-node projections forward).

    `poses` optionally overrides per-collider isometries with runtime arrays
    (moving colliders — those entries must then be recomputed per substep,
    not cached). `only` restricts computation to the given collider indices
    (others get None placeholders) so callers can cache static colliders and
    recompute dynamic ones."""
    return tuple(
        c.project_point(node_positions, _pose_of(poses, ci))
        if (only is None or ci in only)
        else None
        for ci, c in enumerate(colliders)
    )


def _effective_bh(collider, boundary_handling):
    return (
        BoundaryHandling(collider.boundary_handling)
        if collider.boundary_handling is not None
        else boundary_handling
    )


def gpu_grid_projection_data(grid, colliders, node_positions, boundary_handling,
                             poses=None):
    """GPU-pipeline per-node projection data: the single BEST collider
    (nearest projection within the 2-cell cutoff) plus a contact normal from
    the central finite difference of the min signed SDF over all
    boundary-enabled colliders (ref GPU path:
    src_kernels/cuda/grid_update.rs:43-141 — projection_status / sdf /
    sdf_gradient; the CPU reference instead applies every collider
    sequentially with projection-delta normals, grid_update.rs:43-132 in
    src/dynamics/solver/).

    Returns (best_id i32, inside bool, dist f32, normal f32[..., d]);
    best_id = -1 where no collider projects within 2*cell_width (the
    reference's GpuGridProjectionStatus::TooFar). Cacheable across substeps
    exactly like grid_node_projections (the reference recomputes only when
    projection_status == NotComputed, i.e. after a grid remap = our resort).
    """
    h = grid.cell_width
    max_dist = 2.0 * h
    dim = node_positions.shape[-1]
    base_shape = node_positions.shape[:-1]

    enabled = [
        (ci, c) for ci, c in enumerate(colliders)
        if _effective_bh(c, boundary_handling) != BoundaryHandling.NONE
    ]

    def signed_min_sdf(q):
        """min over enabled colliders of signed distance; +inf where no
        collider projects within the cutoff (the reference's Option chain)."""
        best = jnp.full(q.shape[:-1], jnp.inf, jnp.float32)
        for ci, c in enabled:
            proj, inside = c.project_point(q, _pose_of(poses, ci))
            d = jnp.linalg.norm(q - proj, axis=-1)
            s = jnp.where(inside, -d, d)
            s = jnp.where(d <= max_dist, s, jnp.inf)
            best = jnp.minimum(best, s)
        return best

    best_id = jnp.full(base_shape, -1, jnp.int32)
    best_dist = jnp.full(base_shape, 1.0e10, jnp.float32)
    best_inside = jnp.zeros(base_shape, bool)
    for ci, c in enumerate(colliders):
        if _effective_bh(c, boundary_handling) == BoundaryHandling.NONE:
            continue
        proj, inside = c.project_point(node_positions, _pose_of(poses, ci))
        d = jnp.linalg.norm(node_positions - proj, axis=-1)
        better = (d <= max_dist) & (d < best_dist)
        best_id = jnp.where(better, ci, best_id)
        best_dist = jnp.where(better, d, best_dist)
        best_inside = jnp.where(better, inside, best_inside)

    # collision_normal = normalize(grad sdf), sampled at +-0.1*h per axis;
    # an axis with a missing sample contributes 0 (reference's match arms).
    eps = h * 0.1
    grads = []
    for ax in range(dim):
        off = np.zeros((dim,), np.float32)
        off[ax] = eps
        sp = signed_min_sdf(node_positions + off)
        sn = signed_min_sdf(node_positions - off)
        ok = jnp.isfinite(sp) & jnp.isfinite(sn)
        grads.append(jnp.where(ok, (sp - sn) / (2.0 * eps), 0.0))
    normal = jnp.stack(grads, axis=-1)
    nn = jnp.linalg.norm(normal, axis=-1)
    normal = jnp.where(
        (nn > 1.0e-5)[..., None],
        normal / jnp.maximum(nn, 1.0e-30)[..., None],
        0.0,
    )
    return best_id, best_inside, best_dist, normal


def grid_update(
    grid: GridParams,
    state: GridState,
    colliders,
    dt,
    boundary_handling: BoundaryHandling,
    simulation_dofs: SimulationDofs,
    node_positions=None,
    projections=None,
    gpu_boundary_semantics: bool = False,
    poses=None,
):
    """Per-node DOF locking + collider boundary conditions.

    Default (CPU reference semantics, src/dynamics/solver/grid_update.rs:43-132):
    every collider is applied SEQUENTIALLY with projection-delta normals;
    Stick zeroes velocity inside; Friction projects out approaching normal
    velocity with Coulomb tangential decay and a penetration-margin
    correction one cell ahead of the surface; FrictionZUp aliases Friction
    (grid_update.rs:95).

    With `gpu_boundary_semantics`, the reference's GPU pipeline behavior
    (src_kernels/cuda/grid_update.rs:43-195): only the single BEST collider
    (nearest within 2 cells) responds, the contact normal is the
    central-difference gradient of the min signed SDF over all colliders,
    and FrictionZUp in 3D gates friction on normal.z >= 0.

    `projections` skips the per-substep collider projection when the caller
    caches it: `grid_node_projections(...)` output for the default path,
    `gpu_grid_projection_data(...)` output under gpu_boundary_semantics.
    """
    vel = state.velocity
    mom = state.momentum
    h = grid.cell_width

    if simulation_dofs & SimulationDofs.LOCK_X:
        vel = vel.at[..., 0].set(0.0)
        mom = mom.at[..., 0].set(0.0)
    if simulation_dofs & SimulationDofs.LOCK_Y:
        vel = vel.at[..., 1].set(0.0)
        mom = mom.at[..., 1].set(0.0)
    if (simulation_dofs & SimulationDofs.LOCK_Z) and grid.dim == 3:
        vel = vel.at[..., 2].set(0.0)
        mom = mom.at[..., 2].set(0.0)

    if node_positions is None:
        node_positions = grid.node_positions()

    if gpu_boundary_semantics and colliders:
        data = (
            projections
            if projections is not None
            else gpu_grid_projection_data(
                grid, colliders, node_positions, boundary_handling, poses
            )
        )
        vel = _gpu_boundary_response(
            grid, vel, dt, colliders, boundary_handling, data
        )
        return state.replace(velocity=vel, momentum=mom)

    for ci, collider in enumerate(colliders):
        bh = _effective_bh(collider, boundary_handling)
        if bh == BoundaryHandling.NONE:
            continue
        if projections is not None and projections[ci] is not None:
            proj, inside = projections[ci]
        else:
            proj, inside = collider.project_point(
                node_positions, _pose_of(poses, ci)
            )

        if bh == BoundaryHandling.STICK:
            vel = jnp.where(inside[..., None], 0.0, vel)
            continue

        # Friction / FrictionZUp.
        delta = node_positions - proj
        dist = jnp.linalg.norm(delta, axis=-1)
        has_normal = dist > 1.0e-5
        safe_dist = jnp.where(has_normal, dist, 1.0)
        normal = delta / safe_dist[..., None]
        normal = jnp.where(inside[..., None], -normal, normal)

        normal_vel = jnp.sum(vel * normal, axis=-1)
        approaching = normal_vel < 0.0
        dist_with_margin = dist - h

        tangent = vel - normal_vel[..., None] * normal
        tangent_norm = jnp.linalg.norm(tangent, axis=-1)
        safe_t = jnp.where(tangent_norm > 1.0e-10, tangent_norm, 1.0)
        friction_vel = (
            tangent
            / safe_t[..., None]
            * jnp.maximum(tangent_norm + normal_vel * collider.friction, 0.0)[..., None]
        )
        contact_vel = jnp.where(
            (tangent_norm > 1.0e-10)[..., None], friction_vel, tangent
        )

        in_contact = inside | (dist_with_margin <= 0.0)
        # Margin correction: stop the node from tunnelling within one cell.
        tunnel = (-normal_vel * dt) > dist_with_margin
        corrected = vel - (dist_with_margin / dt + normal_vel)[..., None] * normal

        new_vel = jnp.where(
            in_contact[..., None],
            contact_vel,
            jnp.where(tunnel[..., None], corrected, vel),
        )
        apply = has_normal & approaching
        vel = jnp.where(apply[..., None], new_vel, vel)

    return state.replace(velocity=vel, momentum=mom)


def _gpu_boundary_response(grid, vel, dt, colliders, boundary_handling, data):
    """Single-best-collider boundary response with SDF-gradient normals
    (ref: src_kernels/cuda/grid_update.rs update_single_cell :141-195):
    Stick zeroes inside nodes; Friction/FrictionZUp respond only while
    approaching (normal_vel < 0), with the friction projection in contact
    (inside or within one cell) and the tunnel-margin correction otherwise;
    FrictionZUp in 3D additionally requires normal.z >= 0 (:160-165)."""
    h = grid.cell_width
    best_id, inside, dist, normal = data

    friction = jnp.zeros_like(dist)
    bh_code = jnp.full(best_id.shape, int(BoundaryHandling.NONE), jnp.int32)
    for ci, collider in enumerate(colliders):
        bh = _effective_bh(collider, boundary_handling)
        sel = best_id == ci
        friction = jnp.where(sel, collider.friction, friction)
        bh_code = jnp.where(sel, int(bh), bh_code)
    has = best_id >= 0

    stick = has & (bh_code == int(BoundaryHandling.STICK)) & inside
    vel = jnp.where(stick[..., None], 0.0, vel)

    fric_bh = (bh_code == int(BoundaryHandling.FRICTION)) | (
        bh_code == int(BoundaryHandling.FRICTION_Z_UP)
    )
    has_normal = jnp.sum(normal * normal, axis=-1) > 0.0
    apply_f = has & fric_bh & has_normal
    if grid.dim == 3:
        apply_f = apply_f & (
            (bh_code == int(BoundaryHandling.FRICTION)) | (normal[..., 2] >= 0.0)
        )

    normal_vel = jnp.sum(vel * normal, axis=-1)
    approaching = normal_vel < 0.0
    dist_with_margin = dist - h
    tangent = vel - normal_vel[..., None] * normal
    tangent_norm = jnp.linalg.norm(tangent, axis=-1)
    safe_t = jnp.where(tangent_norm > 1.0e-10, tangent_norm, 1.0)
    friction_vel = (
        tangent
        / safe_t[..., None]
        * jnp.maximum(tangent_norm + normal_vel * friction, 0.0)[..., None]
    )
    contact_vel = jnp.where(
        (tangent_norm > 1.0e-10)[..., None], friction_vel, tangent
    )
    in_contact = inside | (dist_with_margin <= 0.0)
    tunnel = (-normal_vel * dt) > dist_with_margin
    corrected = vel - (dist_with_margin / dt + normal_vel)[..., None] * normal
    new_vel = jnp.where(
        in_contact[..., None],
        contact_vel,
        jnp.where(tunnel[..., None], corrected, vel),
    )
    return jnp.where((apply_f & approaching)[..., None], new_vel, vel)


def g2p_gather(grid: GridParams, state: GridState, p):
    """APIC grid-to-particle gather.

    Returns (velocity, velocity_gradient, velocity_gradient_det,
    psi_pos_momentum). Ref: grid_to_particle.rs:38-61.
    """
    d = p.dim
    h = grid.cell_width
    invd = kernel_inv_d(h)

    base, fx, in_bounds = base_cell_and_fx(grid, p.position)
    w1d = quadratic_weights_1d(fx)
    offsets = stencil_offsets(d)
    n = p.capacity
    k = offsets.shape[0]

    weights = jnp.ones((n, k), p.position.dtype)
    for ax in range(d):
        weights = weights * w1d[:, ax, offsets[:, ax]]
    weights = weights * (p.active & in_bounds)[:, None]

    idx = base[:, None, :] + jnp.asarray(offsets, jnp.int32)[None, :, :]
    flat = _flat_index(grid, idx)  # [N, K]

    vel_flat = state.velocity.reshape(-1, d)
    psi_mom_flat = state.psi_momentum.reshape(-1)
    psi_mass_flat = state.psi_mass.reshape(-1)

    cell_vel = vel_flat[flat]  # [N, K, d]
    dpt = (jnp.asarray(offsets, fx.dtype)[None] - fx[:, None, :]) * h  # [N,K,d]

    velocity = jnp.sum(weights[..., None] * cell_vel, axis=1)
    velocity_gradient = invd * jnp.einsum("nk,nki,nkj->nij", weights, cell_vel, dpt)
    velocity_gradient_det = invd * jnp.sum(
        weights * jnp.sum(cell_vel * dpt, axis=-1), axis=1
    )
    psi_cell = psi_mom_flat[flat] * linalg.inv_exact(psi_mass_flat[flat])
    psi_pos_momentum = jnp.sum(weights * psi_cell, axis=1)
    return velocity, velocity_gradient, velocity_gradient_det, psi_pos_momentum


def g2p_update(
    grid: GridParams,
    state: GridState,
    p,
    models: registry.ModelSet,
    dt,
    colliders=(),
    damage_model: DamageModel = DamageModel.NONE,
    enable_boundary_particle_projection: bool = False,
    gpu_velocity_clamp: bool = False,
    poses=None,
):
    """Full grid-to-particle transfer + particle state update.

    Follows grid_to_particle.rs:10-167 stage by stage: gather → (modified
    eigenerosion) → advection → F update → plasticity → static reset →
    failure guards → pos-energy → failure model → particle projection.
    """
    velocity, velocity_gradient, velocity_gradient_det, psi_pos_momentum = g2p_gather(
        grid, state, p
    )
    return particle_update_after_gather(
        grid,
        p,
        models,
        dt,
        velocity,
        velocity_gradient,
        velocity_gradient_det,
        psi_pos_momentum,
        colliders=colliders,
        damage_model=damage_model,
        enable_boundary_particle_projection=enable_boundary_particle_projection,
        gpu_velocity_clamp=gpu_velocity_clamp,
        poses=poses,
    )


def particle_update_after_gather(
    grid: GridParams,
    p,
    models: registry.ModelSet,
    dt,
    velocity,
    velocity_gradient,
    velocity_gradient_det,
    psi_pos_momentum,
    colliders=(),
    damage_model: DamageModel = DamageModel.NONE,
    enable_boundary_particle_projection: bool = False,
    gpu_velocity_clamp: bool = False,
    compute_dt_bound: bool = False,
    poses=None,
):
    """Particle state update given gathered grid quantities (shared by the
    dense reference path and the block-sparse MXU path). With
    compute_dt_bound, also returns the NEXT substep's per-particle dt bound
    (saves a standalone pass over the particle arrays)."""
    is_fluid = models.is_fluid(p.model_id)
    d = p.dim

    # Modified eigenerosion (in-transfer damage; ref :66-78).
    phase = p.phase
    if damage_model == DamageModel.MODIFIED_EIGENEROSION:
        crack_energy = p.crack_propagation_factor * grid.cell_width * psi_pos_momentum
        trip = (
            (p.crack_propagation_factor != 0.0)
            & (phase > 0.0)
            & (crack_energy > p.crack_threshold)
        )
        phase = jnp.where(trip, 0.0, phase)

    # Advection (kinematic override; ref :81-89).
    velocity = jnp.where(p.kinematic_enabled[..., None], p.kinematic_vel, velocity)
    if gpu_velocity_clamp:
        # GPU-path CFL clamp: if ANY component would cross a cell this
        # substep, clamp ALL components to +-h/dt (particle_updater.rs:113-121).
        h = grid.cell_width
        over = jnp.any(jnp.abs(velocity) * dt >= h, axis=-1)
        clamped = jnp.sign(velocity) * (h / dt)
        velocity = jnp.where(over[..., None], clamped, velocity)
    position = p.position + velocity * dt

    # Deformation gradient update (ref :91-105).
    f = p.deformation_gradient
    f_solid = f + dt * jnp.einsum("nij,njk->nik", velocity_gradient, f)
    f_fluid = f.at[:, 0, 0].add(velocity_gradient_det * dt * f[:, 0, 0])
    f = jnp.where(is_fluid[..., None, None], f_fluid, f_solid)

    # Plastic return mapping (ref :107-109).
    (
        f,
        plastic_def_det,
        plastic_hardening,
        elastic_hardening,
        log_vol_gain,
        nacc_alpha,
    ) = registry.apply_plasticity(
        models,
        p.model_id,
        phase,
        f,
        p.plastic_def_det,
        p.plastic_hardening,
        p.elastic_hardening,
        p.log_vol_gain,
        p.nacc_alpha,
    )

    # Static particles (ref :111-114).
    velocity = jnp.where(p.is_static[..., None], 0.0, velocity)
    velocity_gradient = jnp.where(p.is_static[..., None, None], 0.0, velocity_gradient)

    # Failure guards (ref :116-127): det(F)=0, already failed, |F00| blowup.
    detf = linalg.det(f)
    broken = (detf == 0.0) | p.failed | (~is_fluid & (jnp.abs(f[:, 0, 0]) > 1.0e4))
    failed = p.failed | broken
    eye = jnp.broadcast_to(jnp.eye(d, dtype=f.dtype), f.shape)
    f = jnp.where(broken[..., None, None], eye, f)
    velocity_gradient = jnp.where(broken[..., None, None], 0.0, velocity_gradient)

    # Pos energy accumulation (ref :129-138).
    energy = registry.pos_energy(models, p.model_id, phase, elastic_hardening, f)
    psi_pos = jnp.maximum(p.psi_pos, energy)
    parameter1 = psi_pos * p.mass
    parameter2 = p.mass

    # Failure model (ref :140-149).
    if models.present_f:
        stress = registry.kirchhoff_stress(
            models,
            p.model_id,
            phase,
            elastic_hardening,
            f,
            velocity_gradient,
            p.mass,
            p.volume0,
        )
        phase = registry.apply_failure(models, p.model_id, phase, stress)

    # Boundary particle projection (ref :151-166).
    if enable_boundary_particle_projection:
        for ci, collider in enumerate(colliders):
            proj, inside = collider.project_point(position, _pose_of(poses, ci))
            velocity = jnp.where(
                inside[..., None], velocity + (proj - position) / dt, velocity
            )
            position = jnp.where(inside[..., None], proj, position)

    out = p.replace(
        position=position,
        velocity=velocity,
        velocity_gradient=velocity_gradient,
        deformation_gradient=f,
        plastic_def_det=plastic_def_det,
        plastic_hardening=plastic_hardening,
        elastic_hardening=elastic_hardening,
        log_vol_gain=log_vol_gain,
        nacc_alpha=nacc_alpha,
        phase=phase,
        psi_pos=psi_pos,
        parameter1=parameter1,
        parameter2=parameter2,
        failed=failed,
    )
    if compute_dt_bound:
        bound = particle_dt_bounds(
            grid, p, models,
            velocity=velocity, velocity_gradient=velocity_gradient,
            failed=failed, deformation_gradient=f,
            elastic_hardening=elastic_hardening, phase=phase,
        )
        return out, bound
    return out


def particle_dt_bounds(grid: GridParams, p, models: registry.ModelSet,
                       velocity=None, velocity_gradient=None, failed=None,
                       deformation_gradient=None, elastic_hardening=None,
                       phase=None):
    """Per-particle dt bound [N] (velocity/APIC + constitutive), inf where
    inactive. Overridable fields let the particle-update stage compute the
    NEXT substep's bounds from its freshly-updated state without a second
    pass over the particle arrays. Ref: timestep_estimator.rs."""
    h = grid.cell_width
    d_coeff = (h * h) / 4.0
    dim = p.dim
    velocity = p.velocity if velocity is None else velocity
    velocity_gradient = (
        p.velocity_gradient if velocity_gradient is None else velocity_gradient
    )
    failed = p.failed if failed is None else failed
    f = p.deformation_gradient if deformation_gradient is None else deformation_gradient
    eh = p.elastic_hardening if elastic_hardening is None else elastic_hardening
    phase = p.phase if phase is None else phase

    norm_b = d_coeff * jnp.sqrt(
        jnp.sum(velocity_gradient * velocity_gradient, axis=(-2, -1))
    )
    apic_v = norm_b * 6.0 * np.sqrt(dim) / h
    v = jnp.linalg.norm(velocity, axis=-1) + apic_v
    vel_bound = h / jnp.maximum(v, 1e-20)
    vel_bound = jnp.where(v > 0.0, vel_bound, jnp.inf)

    con_bound = registry.timestep_bound(
        models, p.model_id, phase, eh, f, p.mass, p.volume0, velocity, h,
    )
    con_bound = jnp.where(failed, jnp.inf, con_bound)

    bound = jnp.minimum(vel_bound, con_bound)
    return jnp.where(p.active, bound, jnp.inf)


def adaptive_timestep(grid: GridParams, p, models: registry.ModelSet, max_dt):
    """min over particles of velocity/APIC bound and constitutive bound.

    Ref: timestep_estimator.rs `adaptive_timestep_length`.
    """
    return jnp.minimum(jnp.min(particle_dt_bounds(grid, p, models)), max_dt)


def recompute_fluids_volumes(grid: GridParams, p, models: registry.ModelSet, reduce_fn=None):
    """Position-based fluid volume estimate: scatter mass, gather density,
    set F00 = V_new / V0 for fluid particles.

    Ref: fluids_volume.rs `recompute_fluids_volumes`.
    """
    d = p.dim
    h = grid.cell_width
    base, fx, in_bounds = base_cell_and_fx(grid, p.position)
    w1d = quadratic_weights_1d(fx)
    offsets = stencil_offsets(d)
    n = p.capacity
    k = offsets.shape[0]

    weights = jnp.ones((n, k), p.position.dtype)
    for ax in range(d):
        weights = weights * w1d[:, ax, offsets[:, ax]]
    weights = weights * (p.active & in_bounds)[:, None]

    idx = base[:, None, :] + jnp.asarray(offsets, jnp.int32)[None, :, :]
    flat = _flat_index(grid, idx)

    mass_grid = jnp.zeros((grid.num_nodes,), p.position.dtype)
    mass_grid = mass_grid.at[flat.reshape(-1)].add(
        (weights * p.mass[:, None]).reshape(-1), mode="drop"
    )
    if reduce_fn is not None:  # multi-chip: sum partial mass grids
        mass_grid = reduce_fn(mass_grid)

    new_mass = jnp.sum(weights * mass_grid[flat], axis=1)
    new_density = new_mass / (h**d)
    new_volume = p.mass / jnp.maximum(new_density, 1e-20)
    is_fluid = models.is_fluid(p.model_id)
    f = p.deformation_gradient
    f = f.at[:, 0, 0].set(
        jnp.where(is_fluid & p.active, new_volume / p.volume0, f[:, 0, 0])
    )
    return p.replace(deformation_gradient=f)
