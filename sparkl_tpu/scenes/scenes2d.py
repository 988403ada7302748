"""2D scenes. Ref: examples2d/{elasticity2,fluids2,basic2,l_panel2}.rs."""

import numpy as np

import sparkl_tpu.scenes as sc
from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.core.params import (
    BoundaryHandling,
    DamageModel,
    SolverParameters,
)
from sparkl_tpu.core.particles import Particles, cube_particles
from sparkl_tpu.geometry.colliders import cuboid, heightfield
from sparkl_tpu.models import registry as reg


def _star_points(w):
    """8-point star from elasticity2.rs:52-60."""
    return np.array(
        [
            [w, -w],
            [w * 0.5, 0.0],
            [w, w],
            [0.0, w * 0.5],
            [-w, w],
            [-w * 0.5, 0.0],
            [-w, -w],
            [0.0, -w * 0.5],
        ],
        np.float32,
    )


def _polygon_contains(poly, pts):
    """Even-odd test, vectorized numpy."""
    a = poly
    b = np.roll(poly, -1, axis=0)
    inside = np.zeros(len(pts), bool)
    for (ax, ay), (bx, by) in zip(a, b):
        cond = (ay <= pts[:, 1]) != (by <= pts[:, 1])
        denom = np.where(np.abs(by - ay) < 1e-20, 1e-20, by - ay)
        xint = ax + (pts[:, 1] - ay) / denom * (bx - ax)
        inside ^= cond & (xint > pts[:, 0])
    return inside


def _sample_polygon(poly, offset, model_id, radius, density, **overrides):
    lo = poly.min(axis=0) - radius
    hi = poly.max(axis=0) + radius
    xs = np.arange(lo[0], hi[0], 2 * radius, dtype=np.float32)
    ys = np.arange(lo[1], hi[1], 2 * radius, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    pts = pts[_polygon_contains(poly, pts)]
    return Particles.from_positions(
        pts + np.asarray(offset, np.float32), model_id, radius, density, **overrides
    )


@sc.register_scene("elasticity2")
def elasticity2(seed=42):
    """5 star-shaped corotated+Rankine blocks dropping (the 2D baseline scene).

    Ref: examples2d/elasticity2.rs (E=2e4, nu=0.35, Rankine(1e2, 5.0),
    cell_width=0.05, r=h/4, density=2, crack factor 0.9 / threshold 1 /
    m_c 0.01 / g 20000).
    """
    e, nu = 2.0e4, 0.35
    h = 0.05
    ground_height = h * 10.0
    ground_shift = h * 40.0

    colliders = (
        cuboid((1000.0, ground_height), translation=(0.0, ground_shift - ground_height)),
        cuboid((ground_height, 1000.0), translation=(ground_shift - ground_height, 0.0)),
        cuboid(
            (ground_height, 1000.0),
            translation=(ground_shift - ground_height + ground_shift * 8.0, 0.0),
        ),
    )

    models = reg.ModelSet.pack(
        [
            reg.ParticleModel(
                reg.corotated_linear_elasticity(e, nu),
                reg.rankine_plasticity(e, nu, 1.0e2, 5.0),
            )
        ]
    )

    rng = np.random.default_rng(seed)
    star = _star_points(h * 20.0)
    blocks = []
    for _ in range(5):
        cx = ground_shift + h * 40.0 * (rng.integers(0, 5) + 1)
        cy = ground_shift + h * 40.0 * (rng.integers(0, 5) + 1)
        blocks.append(
            _sample_polygon(
                star,
                (cx, cy),
                0,
                h / 4.0,
                2.0,
                crack_propagation_factor=0.9,
                crack_threshold=1.0,
                m_c=0.01,
                g=20000.0,
            )
        )
    particles = Particles.concatenate(tuple(blocks))

    grid = GridParams.for_domain((1.0, 1.0), (14.5, 14.5), h, pad=3)
    return sc.SceneBundle(
        name="elasticity2",
        grid=grid,
        models=models,
        colliders=colliders,
        particles=particles,
        params=SolverParameters(dt=1.0 / 60.0),
        gravity=(0.0, -9.81),
    )


@sc.register_scene("fluids2")
def fluids2(n=300):
    """90k-particle SPH-EOS dam break. Ref: examples2d/fluids2.rs."""
    h = 0.1
    ground_height = h * 10.0
    ground_shift = h * 40.0
    colliders = (
        cuboid((1000.0, ground_height), translation=(0.0, ground_shift - ground_height)),
        cuboid((ground_height, 1000.0), translation=(ground_shift - ground_height, 0.0)),
        cuboid(
            (ground_height, 1000.0),
            translation=(ground_shift - ground_height + ground_shift * 8.0, 0.0),
        ),
    )
    models = reg.ModelSet.pack(
        [reg.ParticleModel(reg.monaghan_sph_eos(1.0e4, 7, 1.01e-3, 1.0))]
    )
    particles = cube_particles(
        origin=(
            ground_shift + h * 2.0 + h / 4.0,
            ground_shift + h * 2.0 + h / 4.0,
        ),
        counts=(n, n),
        model_id=0,
        particle_radius=h / 4.0,
        density0=1000.0,
    )
    grid = GridParams.for_domain((2.5, 2.5), (36.5, 24.0), h, pad=3)
    return sc.SceneBundle(
        name="fluids2",
        grid=grid,
        models=models,
        colliders=colliders,
        particles=particles,
        params=SolverParameters(dt=1.0 / 60.0, force_fluids_volume_recomputation=True),
        gravity=(0.0, -9.81),
    )


@sc.register_scene("l_panel2")
def l_panel2(cell_width=0.005, dt=1.0 / 6000.0):
    """Quasi-brittle L-panel fracture: two L-shaped concrete panels, one with
    Eigenerosion global crack propagation, one with MaximumStress local
    failure; Stick boundary, zero gravity, velocity-driven loading via a grid
    Dirichlet hook. Ref: examples2d/l_panel2.rs (E=25.85e9, nu=0.18,
    cell_width=0.005, dt=1/6000, crack factor 4.5 / threshold 89,
    MaxStress(2.7e6)). The cell_width/dt knobs scale the discretization for
    tests/goldens; defaults match the reference exactly."""
    from sparkl_tpu.solver.pipeline import DirichletVelocityHook

    e, nu = 25.85e9, 0.18
    h = cell_width
    ground_height = h * 10.0
    ground_shift = h * 40.0

    colliders = (
        cuboid((1000.0, ground_height), translation=(0.0, ground_shift - ground_height)),
    )

    panel_poly = np.array(
        [
            [0.0, 0.0],
            [0.25, 0.0],
            [0.25, 0.25],
            [0.5, 0.25],
            [0.5, 0.5],
            [0.0, 0.5],
        ],
        np.float32,
    )

    m1 = reg.ParticleModel(reg.corotated_linear_elasticity(e, nu))
    m2 = reg.ParticleModel(
        reg.corotated_linear_elasticity(e, nu),
        failure=reg.maximum_stress_failure(2.7e6, np.finfo(np.float32).max),
    )
    models = reg.ModelSet.pack([m1, m2])

    origins = [
        (ground_shift, ground_shift),
        (ground_shift * 8.0, ground_shift),
    ]
    panel1 = _sample_polygon(
        panel_poly,
        origins[0],
        0,
        h / 4.0,
        2500.0,
        crack_propagation_factor=4.5,
        crack_threshold=89.0,
        m_c=0.0,
        g=10.0,
    )
    panel2 = _sample_polygon(panel_poly, origins[1], 1, h / 4.0, 2500.0)
    particles = Particles.concatenate((panel1, panel2))

    load = np.array([0.47, 0.25], np.float32)
    hooks = DirichletVelocityHook(
        points=[np.asarray(o, np.float32) + load for o in origins],
        velocities=[[0.0, 0.1], [0.0, 0.1]],
    )

    grid = GridParams.for_domain((0.05, 0.05), (2.2, 0.95), h, pad=3)
    return sc.SceneBundle(
        name="l_panel2",
        grid=grid,
        models=models,
        colliders=colliders,
        particles=particles,
        params=SolverParameters(
            dt=dt,
            boundary_handling=BoundaryHandling.STICK,
            damage_model=DamageModel.EIGENEROSION,
        ),
        gravity=(0.0, 0.0),
        hooks=hooks,
    )


@sc.register_scene("basic2")
def basic2():
    """Snow + sand + breakable star on a sine heightfield.

    Ref: examples2d/basic2.rs — cell_width = 1/128; snow = corotated(1e5, 0.2)
    + SnowPlasticity in a 0.1x0.2 cuboid at (40h, ground_shift + 0.8),
    density 1000; sand = same block shifted +0.5 y with DruckerPrager; star =
    corotated(1e5, 0.2) + MaximumStress(1e5) at (40h, 1.7), density 4000;
    heightfield scale (2, 1) at (0.5, 1.5); max_num_substeps = 50."""
    e, nu = 1.0e5, 0.2
    h = 1.0 / 128.0
    ground_shift = h * 10.0
    n = 40
    heights = -np.sin(np.arange(n + 1, dtype=np.float32) * np.pi / n)
    colliders = (
        heightfield(heights, scale=(2.0, 1.0), translation=(0.5, 1.5)),
    )
    snow = reg.ParticleModel(
        reg.corotated_linear_elasticity(e, nu), reg.snow_plasticity()
    )
    sand = reg.ParticleModel(
        reg.corotated_linear_elasticity(e, nu),
        reg.drucker_prager_plasticity(e, nu),
    )
    star_model = reg.ParticleModel(
        reg.corotated_linear_elasticity(e, nu),
        failure=reg.maximum_stress_failure(1.0e5, np.finfo(np.float32).max),
    )
    models = reg.ModelSet.pack([snow, sand, star_model])

    r = h / 4.0
    cx = h * 40.0
    cy = ground_shift + 0.8

    def box_pts(hw, hh, center):
        xs = np.arange(-hw + r, hw, 2 * r, dtype=np.float32)
        ys = np.arange(-hh + r, hh, 2 * r, dtype=np.float32)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        return np.stack([gx.reshape(-1), gy.reshape(-1)], -1) + np.asarray(
            center, np.float32
        )

    snow_pts = box_pts(0.1, 0.2, (cx, cy))
    blocks = [
        Particles.from_positions(snow_pts, 0, r, 1000.0),
        Particles.from_positions(snow_pts + np.asarray([0.0, 0.5], np.float32), 1, r, 1000.0),
        _sample_polygon(_star_points(h * 10.0), (cx, 1.7), 2, r, 4000.0),
    ]
    particles = Particles.concatenate(tuple(blocks))
    grid = GridParams.for_domain((-0.8, 0.3), (1.8, 2.6), h, pad=3)
    return sc.SceneBundle(
        name="basic2",
        grid=grid,
        models=models,
        colliders=colliders,
        particles=particles,
        params=SolverParameters(dt=1.0 / 60.0, max_num_substeps=50),
        gravity=(0.0, -9.81),
    )


@sc.register_scene("sweep2")
def sweep2(n=60, amp=None, period=1.0):
    """Sand bed swept by an oscillating cuboid paddle — the moving-collider
    scene (no direct reference example; exercises the runtime-pose path the
    reference gets for free by reading the live rapier ColliderSet every
    step, src/dynamics/solver/mls_solver.rs:7-9 + testbed_plugin.rs:452-456).

    The paddle's pose is a function of simulation time via the bundle's
    `collider_pose_fn`: x(t) = x0 + amp * sin(2*pi*t/period), constant
    rotation. Poses are traced values — animation never re-jits.
    """
    import jax.numpy as jnp

    e, nu = 1.0e5, 0.2
    h = 1.0 / 128.0
    ground_shift = h * 10.0

    paddle_half = (h * 3.0, h * 24.0)
    paddle_x0 = 0.5
    paddle_y = ground_shift + paddle_half[1] * 0.8
    if amp is None:
        amp = h * 16.0

    colliders = (
        # Floor (static).
        cuboid((1000.0, ground_shift), translation=(0.0, 0.0)),
        # Paddle (dynamic: pose driven by collider_pose_fn below).
        cuboid(paddle_half, translation=(paddle_x0, paddle_y), friction=0.3),
    )

    def collider_pose_fn(t):
        x = paddle_x0 + amp * jnp.sin(
            2.0 * jnp.pi * jnp.asarray(t, jnp.float32) / period
        )
        trans = jnp.stack([x, jnp.asarray(paddle_y, jnp.float32)])
        rot = jnp.eye(2, dtype=jnp.float32)
        return (None, (trans, rot))

    models = reg.ModelSet.pack(
        [
            reg.ParticleModel(
                reg.corotated_linear_elasticity(e, nu),
                reg.drucker_prager_plasticity(e, nu),
            )
        ]
    )
    particles = cube_particles(
        origin=(paddle_x0 - h * n / 4.0, ground_shift + h / 4.0),
        counts=(n, n // 3),
        model_id=0,
        particle_radius=h / 4.0,
        density0=2700.0,
    )
    grid = GridParams.for_domain((0.0, 0.0), (1.0 + ground_shift * 2, 1.0), h, pad=3)
    return sc.SceneBundle(
        name="sweep2",
        grid=grid,
        models=models,
        colliders=colliders,
        particles=particles,
        params=SolverParameters(dt=1.0 / 60.0),
        gravity=(0.0, -9.81),
        collider_pose_fn=collider_pose_fn,
    )
