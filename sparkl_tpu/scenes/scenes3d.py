"""3D scenes. Ref: examples3d/{sand3,cube_through_sand3,sand_penetration3,fluids3}.rs."""

import numpy as np

import sparkl_tpu.scenes as sc
from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.core.params import SolverParameters
from sparkl_tpu.core.particles import Particles, cube_particles
from sparkl_tpu.geometry.colliders import cuboid, heightfield
from sparkl_tpu.models import registry as reg


@sc.register_scene("sand3")
def sand3(nx=100, ny=50, nz=50):
    """500k-particle sand column on a sine-valley heightfield — THE 3D
    benchmark scene. Ref: examples3d/sand3.rs (E=1e7, nu=0.2,
    corotated+DruckerPrager sand block above a plain corotated block,
    cell_width=0.2, r=h/4, density=2700)."""
    e, nu = 1.0e7, 0.2
    h = 0.2
    r = h / 4.0

    hf_n = 40
    i = np.arange(hf_n + 1, dtype=np.float32)
    heights = np.broadcast_to(
        -np.sin(i[:, None] * np.pi / hf_n), (hf_n + 1, hf_n + 1)
    ).astype(np.float32)
    ground_half_side = 20.0
    colliders = (
        heightfield(
            heights,
            scale=(ground_half_side * 2.0, 10.0, ground_half_side * 2.0),
            translation=(0.0, 10.0, 0.0),
        ),
    )

    sand = reg.ParticleModel(
        reg.corotated_linear_elasticity(e, nu),
        reg.drucker_prager_plasticity(e, nu),
    )
    block = reg.ParticleModel(reg.corotated_linear_elasticity(e, nu))
    models = reg.ModelSet.pack([sand, block])

    y0 = h * 3.0 + 2.0 + r * 2.0 * ny
    sand_particles = cube_particles(
        origin=(0.0, y0, 0.0), counts=(nx, ny, nz), model_id=0,
        particle_radius=r, density0=2700.0,
    )
    block_particles = cube_particles(
        origin=(0.0, h * 3.0 + 2.0, 0.0), counts=(nx, ny, nz), model_id=1,
        particle_radius=r, density0=2700.0,
    )
    particles = Particles.concatenate((sand_particles, block_particles))

    # Column spans x in [0, nx*2r], y up to y0 + ny*2r; leave room to spread.
    x_hi = nx * 2 * r
    grid = GridParams.for_domain(
        (-6.0, -1.0, -6.0), (x_hi + 6.0, y0 + ny * 2 * r + 1.0, nz * 2 * r + 6.0), h, pad=2
    )
    return sc.SceneBundle(
        name="sand3",
        grid=grid,
        models=models,
        colliders=colliders,
        particles=particles,
        params=SolverParameters(dt=1.0 / 60.0),
        gravity=(0.0, -9.81, 0.0),
    )


@sc.register_scene("cube_through_sand3")
def cube_through_sand3(nx=100, ny=50, nz=50):
    """Kinematic block (kinematic_vel = 10 x̂) driven through the sand bed on
    the sine-valley heightfield.

    Ref: examples3d/cube_through_sand3.rs — same heightfield/material as
    sand3 (E=1e7, nu=0.2, density 2700, h=0.2); sand 100x50x50 at
    (0, 2.6, 0); kinematic 25^3 block at (-10, 2.6, 0)."""
    e, nu = 1.0e7, 0.2
    h = 0.2
    r = h / 4.0

    hf_n = 40
    i = np.arange(hf_n + 1, dtype=np.float32)
    heights = np.broadcast_to(
        -np.sin(i[:, None] * np.pi / hf_n), (hf_n + 1, hf_n + 1)
    ).astype(np.float32)
    colliders = (
        heightfield(heights, scale=(40.0, 10.0, 40.0), translation=(0.0, 10.0, 0.0)),
    )

    sand = reg.ParticleModel(
        reg.corotated_linear_elasticity(e, nu),
        reg.drucker_prager_plasticity(e, nu),
    )
    block = reg.ParticleModel(reg.corotated_linear_elasticity(e, nu))
    models = reg.ModelSet.pack([sand, block])

    y0 = h * 3.0 + 2.0
    sand_particles = cube_particles(
        origin=(0.0, y0, 0.0), counts=(nx, ny, nz), model_id=0,
        particle_radius=r, density0=2700.0,
    )
    block_particles = cube_particles(
        origin=(-10.0, y0, 0.0), counts=(25, 25, 25), model_id=1,
        particle_radius=r, density0=2700.0,
        kinematic_enabled=True,
        kinematic_vel=np.asarray((10.0, 0.0, 0.0), np.float32),
    )
    particles = Particles.concatenate((sand_particles, block_particles))
    grid = GridParams.for_domain(
        (-12.0, -1.0, -6.0), (nx * 2 * r + 8.0, y0 + ny * 2 * r + 2.0, nz * 2 * r + 6.0),
        h, pad=2,
    )
    return sc.SceneBundle(
        name="cube_through_sand3",
        grid=grid,
        models=models,
        colliders=colliders,
        particles=particles,
        params=SolverParameters(dt=1.0 / 60.0),
        gravity=(0.0, -9.81, 0.0),
    )


@sc.register_scene("fluids3")
def fluids3():
    """15.2k-particle free-falling EOS fluid blob (no colliders).

    Ref: examples3d/fluids3.rs — cell_width 0.8, particle radius 0.1 (NOT
    h/4), p0 = 1e6, gamma 7, viscosity 1.01e-3, origin (1.6, 1.6, 1.6),
    density 1000, fluid volume recomputation forced, no colliders (the blob
    falls and expands under gravity)."""
    h = 0.8
    r = 0.1
    colliders = ()
    models = reg.ModelSet.pack(
        [reg.ParticleModel(reg.monaghan_sph_eos(1.0e6, 7, 1.01e-3, 1.0))]
    )
    particles = cube_particles(
        origin=(1.6, 1.6, 1.6), counts=(38, 20, 20), model_id=0,
        particle_radius=r, density0=1000.0,
    )
    # Generous fall room below (particles leaving the grid are marked failed,
    # matching the reference's unbounded-grid fall semantics only finitely).
    grid = GridParams.for_domain((-8.0, -40.0, -8.0), (18.0, 8.0, 14.0), h, pad=2)
    return sc.SceneBundle(
        name="fluids3",
        grid=grid,
        models=models,
        colliders=colliders,
        particles=particles,
        params=SolverParameters(
            dt=1.0 / 60.0, force_fluids_volume_recomputation=True
        ),
        gravity=(0.0, -9.81, 0.0),
    )


@sc.register_scene("sand_penetration3")
def sand_penetration3(nx=100, ny=50, nz=50):
    """Sand column dropped through four rippled heightfield plates.

    Ref: examples3d/sand_penetration3.rs — heights sin(10·pi·i/40) with
    scale (40, 1, 40): plate at y=10, inverted plate at y=12 (rot pi about
    x), and two vertical plates at z=+-5 (rot -+pi/2 about x); sand
    100x50x50 (E=1e7, nu=0.2, rho=2700, h=0.2, r=h/4) dropped from
    y = 2(3h + 2 + 50·2r) = 15.2."""
    e, nu = 1.0e7, 0.2
    h = 0.2
    r = h / 4.0

    n = 40
    i = np.arange(n + 1, dtype=np.float32)
    heights = np.broadcast_to(
        np.sin(i[:, None] * np.pi / n * 10.0), (n + 1, n + 1)
    ).astype(np.float32)
    scale = (40.0, 1.0, 40.0)

    def rot_x(theta):
        c, s = np.cos(theta), np.sin(theta)
        return np.array(
            [[1, 0, 0], [0, c, -s], [0, s, c]], np.float32
        )

    colliders = (
        heightfield(heights, scale=scale, translation=(0.0, 10.0, 0.0)),
        heightfield(heights, scale=scale, translation=(0.0, 12.0, 0.0),
                    rotation=rot_x(np.pi)),
        heightfield(heights, scale=scale, translation=(0.0, 0.0, 5.0),
                    rotation=rot_x(-np.pi / 2.0)),
        heightfield(heights, scale=scale, translation=(0.0, 0.0, -5.0),
                    rotation=rot_x(np.pi / 2.0)),
    )
    sand = reg.ParticleModel(
        reg.corotated_linear_elasticity(e, nu),
        reg.drucker_prager_plasticity(e, nu),
    )
    models = reg.ModelSet.pack([sand])
    y0 = 2.0 * (h * 3.0 + 2.0 + r * 2.0 * ny)
    particles = cube_particles(
        origin=(0.0, y0, 0.0), counts=(nx, ny, nz), model_id=0,
        particle_radius=r, density0=2700.0,
    )
    grid = GridParams.for_domain(
        (-8.0, -2.0, -8.0), (nx * 2 * r + 8.0, y0 + ny * 2 * r + 1.0, nz * 2 * r + 8.0),
        h, pad=2,
    )
    return sc.SceneBundle(
        name="sand_penetration3",
        grid=grid,
        models=models,
        colliders=colliders,
        particles=particles,
        params=SolverParameters(dt=1.0 / 60.0),
        gravity=(0.0, -9.81, 0.0),
    )
