import numpy as np
import jax
import jax.numpy as jnp

import sparkl_tpu as sk
from sparkl_tpu.core.grid import GridParams, GridState
from sparkl_tpu.models import registry
from sparkl_tpu.solver import dense

E, NU = 2.0e4, 0.35


def _models():
    return registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(E, NU))]
    )


def _block(grid, n=10, v0=(0.0, 0.0)):
    h = grid.cell_width
    p = sk.cube_particles(
        origin=(0.5, 0.5),
        counts=(n, n),
        model_id=0,
        particle_radius=h / 4,
        density0=1000.0,
    )
    return p.replace(velocity=jnp.broadcast_to(jnp.asarray(v0, jnp.float32), p.velocity.shape))


def test_p2g_conserves_mass_and_momentum():
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.05, res=(64, 64))
    models = _models()
    p = _block(grid, v0=(0.3, -0.2))
    dt = 1e-3
    g = jnp.asarray([0.0, -9.81])
    state = dense.p2g(grid, p, models, dt, g)

    total_mass = float(jnp.sum(state.mass))
    np.testing.assert_allclose(total_mass, float(jnp.sum(p.mass)), rtol=1e-5)

    grid_mom = np.asarray(jnp.sum(state.momentum, axis=tuple(range(2))))
    part_mom = np.asarray(jnp.sum(p.mass[:, None] * p.velocity, axis=0))
    np.testing.assert_allclose(grid_mom, part_mom, rtol=1e-4, atol=1e-8)

    # velocity = (momentum + m g dt)/m on occupied nodes.
    vel_mom = np.asarray(
        jnp.sum(state.velocity * state.mass[..., None], axis=tuple(range(2)))
    )
    want = part_mom + total_mass * np.asarray(g) * dt
    np.testing.assert_allclose(vel_mom, want, rtol=1e-4, atol=1e-6)


def test_g2p_reproduces_rigid_motion():
    # A grid with a uniform velocity field must give every particle that
    # velocity and a zero velocity gradient (partition of unity + linear
    # completeness of the quadratic B-spline APIC transfer).
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.05, res=(64, 64))
    p = _block(grid)
    v_uniform = jnp.asarray([0.4, -0.1])
    state = GridState.zeros(grid)
    state = state.replace(
        velocity=jnp.broadcast_to(v_uniform, state.velocity.shape),
        mass=jnp.ones_like(state.mass),
    )
    vel, grad, grad_det, _ = dense.g2p_gather(grid, state, p)
    act = np.asarray(p.active)
    np.testing.assert_allclose(
        np.asarray(vel)[act], np.tile(np.asarray(v_uniform), (act.sum(), 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(grad)[act], 0.0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(grad_det)[act], 0.0, atol=2e-4)


def test_g2p_linear_velocity_field():
    # v(x) = A x must be reproduced exactly: velocity gradient == A.
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.05, res=(64, 64))
    p = _block(grid)
    a_mat = np.array([[0.3, -0.2], [0.1, 0.5]], np.float32)
    pos = grid.node_positions()
    vel_field = jnp.einsum("ij,xyj->xyi", jnp.asarray(a_mat), pos)
    state = GridState.zeros(grid).replace(
        velocity=vel_field, mass=jnp.ones_like(GridState.zeros(grid).mass)
    )
    vel, grad, grad_det, _ = dense.g2p_gather(grid, state, p)
    act = np.asarray(p.active)
    want_vel = np.asarray(p.position)[act] @ a_mat.T
    np.testing.assert_allclose(np.asarray(vel)[act], want_vel, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(grad)[act], np.tile(a_mat, (act.sum(), 1, 1)), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(grad_det)[act], np.trace(a_mat), atol=2e-3
    )


def test_adaptive_timestep_finite_positive():
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.05, res=(64, 64))
    p = _block(grid, v0=(1.0, 0.0))
    dt = dense.adaptive_timestep(grid, p, _models(), 1.0 / 60.0)
    val = float(dt)
    assert 0.0 < val <= 1.0 / 60.0


def test_grid_update_stick_and_friction():
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.1, res=(16, 16))
    ground = sk.cuboid(half_extents=(10.0, 0.3), translation=(0.0, 0.0), friction=0.0)
    state = GridState.zeros(grid)
    vel = jnp.broadcast_to(jnp.asarray([0.5, -1.0]), state.velocity.shape)
    state = state.replace(velocity=vel, mass=jnp.ones_like(state.mass))

    # Stick: nodes inside the box get zero velocity.
    out = dense.grid_update(
        grid, state, [ground], 1e-3, sk.BoundaryHandling.STICK, sk.SimulationDofs.LOCK_NONE
    )
    v = np.asarray(out.velocity)
    pos = np.asarray(grid.node_positions())
    inside = np.abs(pos[..., 1]) < 0.3 - 1e-6
    inside &= np.abs(pos[..., 0]) < 10.0 - 1e-6
    assert np.allclose(v[inside], 0.0)
    # Far-away nodes untouched.
    far = pos[..., 1] > 0.8
    assert np.allclose(v[far], np.array([0.5, -1.0]), atol=1e-6)

    # Frictionless friction-mode contact: removes approaching normal velocity,
    # keeps tangential.
    out = dense.grid_update(
        grid, state, [ground], 1e-3, sk.BoundaryHandling.FRICTION, sk.SimulationDofs.LOCK_NONE
    )
    v = np.asarray(out.velocity)
    # Node one row above the surface (y=0.4, dist=h): within the contact
    # margin (dist - h <= 0), normal (0,1). (A node exactly on the surface has
    # dist < 1e-5 and gets no boundary, matching the reference's
    # Unit::try_new_and_get guard.)
    near = (np.abs(pos[..., 1] - 0.4) < 0.05) & (np.abs(pos[..., 0]) < 5.0)
    np.testing.assert_allclose(v[near][:, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(v[near][:, 0], 0.5, atol=1e-6)


def test_pipeline_block_drop_2d():
    """elasticity2-style smoke test: elastic block dropped on a cuboid floor."""
    h = 0.05
    grid = GridParams.for_domain((0.0, 0.0), (3.2, 3.2), h, pad=2)
    models = _models()
    ground_top = 1.0
    colliders = [
        sk.cuboid(half_extents=(100.0, ground_top / 2), translation=(0.0, ground_top / 2), friction=0.2)
    ]
    p = sk.cube_particles(
        origin=(1.5, 1.8),
        counts=(12, 12),
        model_id=0,
        particle_radius=h / 4,
        density0=1000.0,
    )
    pipe = sk.MpmPipeline(
        grid,
        models,
        colliders,
        sk.SolverParameters(dt=1.0 / 60.0),
        gravity=[0.0, -9.81],
    )
    y0 = float(jnp.min(p.position[:, 1]))
    for _ in range(30):
        p = pipe.step(p)

    pos = np.asarray(p.position)[np.asarray(p.active)]
    assert np.isfinite(pos).all()
    # Fell, but did not tunnel through the floor (small margin).
    assert pos[:, 1].min() < y0
    assert pos[:, 1].min() > ground_top - 3 * h
    # Nothing exploded sideways.
    assert pos[:, 0].min() > 0.5 and pos[:, 0].max() < 2.8
    assert not bool(np.asarray(p.failed)[np.asarray(p.active)].any())


def test_pipeline_fluid_smoke_2d():
    """fluids2-style smoke test: small EOS fluid blob in a box."""
    h = 0.1
    grid = GridParams.for_domain((0.0, 0.0), (6.4, 6.4), h, pad=2)
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.monaghan_sph_eos(1.0e4, 7, 1.01e-3))]
    )
    colliders = [
        sk.cuboid(half_extents=(100.0, 1.0), translation=(0.0, 0.0), friction=0.0),
        sk.cuboid(half_extents=(1.0, 100.0), translation=(0.0, 0.0), friction=0.0),
        sk.cuboid(half_extents=(1.0, 100.0), translation=(6.0, 0.0), friction=0.0),
    ]
    p = sk.cube_particles(
        origin=(1.5, 1.5),
        counts=(20, 20),
        model_id=0,
        particle_radius=h / 4,
        density0=1000.0,
    )
    pipe = sk.MpmPipeline(
        grid,
        models,
        colliders,
        sk.SolverParameters(dt=1.0 / 60.0, force_fluids_volume_recomputation=True),
        gravity=[0.0, -9.81],
    )
    for _ in range(10):
        p = pipe.step(p)
    pos = np.asarray(p.position)[np.asarray(p.active)]
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() > 0.5


def test_gpu_velocity_clamp():
    """GPU-path CFL clamp (particle_updater.rs:113-121): if any velocity
    component would cross a cell per substep, all components clamp to h/dt."""
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.05, res=(64, 64))
    models = _models()
    p = _block(grid, n=4)
    n = p.capacity
    vel = jnp.zeros((n, 2)).at[:, 0].set(100.0).at[:, 1].set(0.01)
    state = GridState.zeros(grid).replace(
        velocity=jnp.broadcast_to(jnp.asarray([100.0, 0.01]), (64, 64, 2)),
        mass=jnp.ones((64, 64)),
    )
    dt = 1e-3  # 100 * 1e-3 = 0.1 >= h = 0.05 -> clamp
    out = dense.g2p_update(grid, state, p, models, dt)
    # Un-clamped: velocity = grid velocity.
    v = np.asarray(out.velocity)[np.asarray(out.active)]
    np.testing.assert_allclose(v[:, 0], 100.0, rtol=1e-4)

    out2 = dense.particle_update_after_gather(
        grid, p, models, dt,
        jnp.broadcast_to(jnp.asarray([100.0, 0.01]), (n, 2)),
        jnp.zeros((n, 2, 2)), jnp.zeros(n), jnp.zeros(n),
        gpu_velocity_clamp=True,
    )
    v2 = np.asarray(out2.velocity)[np.asarray(out2.active)]
    np.testing.assert_allclose(v2[:, 0], 0.05 / dt, rtol=1e-5)
    # ALL components clamp when any exceeds (reference semantics).
    np.testing.assert_allclose(v2[:, 1], 0.05 / dt, rtol=1e-5)


def test_trimesh_collider_matches_cuboid():
    """A cube trimesh must agree with the analytic cuboid projection."""
    rng = np.random.default_rng(0)
    he = np.array([0.5, 0.4, 0.3], np.float32)
    # 8 vertices, 12 triangles of the box [-he, he].
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float32,
    ) * he
    # Triangles (consistent outward winding not required for parity test).
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    tris = []
    for (a, b, c, d) in quads:
        tris += [(a, b, c), (a, c, d)]
    mesh = sk.trimesh(corners, np.asarray(tris))
    box = sk.cuboid(he)

    pts = jnp.asarray(rng.uniform(-1.0, 1.0, size=(500, 3)), jnp.float32)
    pm, im = mesh.project_point(pts)
    pb, ib = box.project_point(pts)
    np.testing.assert_array_equal(np.asarray(im), np.asarray(ib))
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pb), atol=1e-5)


def test_simulation_dofs_lock_x():
    """LOCK_X zeroes the grid x DOF: particles with initial x velocity stop
    moving in x after the first transfer cycle (ref: SimulationDofs lock
    flags applied in grid_update.rs)."""
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.05, res=(64, 64))
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(2.0e4, 0.3))]
    )
    p = sk.cube_particles(
        origin=(1.0, 1.5), counts=(8, 8), model_id=0,
        particle_radius=0.0125, density0=1000.0,
    )
    p = p.replace(velocity=jnp.broadcast_to(
        jnp.asarray([1.5, 0.0], jnp.float32), (p.capacity, 2)))
    params = sk.SolverParameters(
        dt=1.0 / 60.0, simulation_dofs=sk.SimulationDofs.LOCK_X,
    )
    pipe = sk.MpmPipeline(grid, models, [], params, [0.0, -9.81])
    x0 = np.asarray(p.position)[:, 0].copy()
    for _ in range(3):
        p, _ = pipe.step_with_stats(p)
    vel = np.asarray(p.velocity)
    pos = np.asarray(p.position)
    assert np.abs(vel[:, 0]).max() < 1e-4
    # Only pre-lock advection (< one substep of drift) in x; y fell freely.
    assert np.abs(pos[:, 0] - x0).max() < 0.05
    assert vel[:, 1].min() < -0.3


def test_boundary_particle_projection_flag():
    """enable_boundary_particle_projection pushes penetrating particles back
    to the collider surface each substep (ref grid_to_particle.rs final
    stage); with the flag on, no particle ends up meaningfully inside."""
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.05, res=(64, 64))
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(1.0e4, 0.3))]
    )

    def run(flag):
        p = sk.cube_particles(
            origin=(1.0, 0.62), counts=(10, 10), model_id=0,
            particle_radius=0.0125, density0=1000.0,
        )
        p = p.replace(velocity=jnp.broadcast_to(
            jnp.asarray([0.0, -2.0], jnp.float32), (p.capacity, 2)))
        colliders = [sk.cuboid((100.0, 0.5), translation=(0.0, 0.25), friction=0.0)]
        params = sk.SolverParameters(
            dt=1.0 / 60.0, enable_boundary_particle_projection=flag,
        )
        pipe = sk.MpmPipeline(grid, models, colliders, params, [0.0, -9.81])
        for _ in range(6):
            p, _ = pipe.step_with_stats(p)
        return np.asarray(p.position)

    pos_on = run(True)
    # Collider surface is y = 0.5; with projection on, nothing sinks below.
    assert pos_on[:, 1].min() > 0.5 - 1e-4
