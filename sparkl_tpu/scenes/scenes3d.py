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
def cube_through_sand3():
    """Kinematic block driven through a sand bed.

    Ref: examples3d/cube_through_sand3.rs — a block of particles with
    kinematic_vel pushes through DruckerPrager sand on a flat ground."""
    e, nu = 1.0e7, 0.2
    h = 0.2
    r = h / 4.0
    colliders = (cuboid((40.0, 2.0, 40.0), translation=(0.0, -2.0, 0.0)),)

    sand = reg.ParticleModel(
        reg.corotated_linear_elasticity(e, nu),
        reg.drucker_prager_plasticity(e, nu),
    )
    block = reg.ParticleModel(reg.corotated_linear_elasticity(1.0e8, 0.3))
    models = reg.ModelSet.pack([sand, block])

    sand_particles = cube_particles(
        origin=(0.0, 0.0, 0.0), counts=(60, 12, 30), model_id=0,
        particle_radius=r, density0=2700.0,
    )
    kin_vel = (3.0, 0.0, 0.0)
    block_particles = cube_particles(
        origin=(-4.0, 0.5, 1.5), counts=(10, 10, 10), model_id=1,
        particle_radius=r, density0=8000.0,
        kinematic_enabled=True,
        kinematic_vel=np.asarray(kin_vel, np.float32),
    )
    particles = Particles.concatenate((sand_particles, block_particles))
    grid = GridParams.for_domain((-6.0, -1.0, -2.0), (26.0, 6.0, 11.0), h, pad=2)
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
    """15.2k-particle EOS fluid blob in a box. Ref: examples3d/fluids3.rs."""
    h = 0.2
    r = h / 4.0
    colliders = (
        cuboid((40.0, 1.0, 40.0), translation=(0.0, -1.0, 0.0), friction=0.0),
        cuboid((1.0, 40.0, 40.0), translation=(-1.0, 0.0, 0.0), friction=0.0),
        cuboid((1.0, 40.0, 40.0), translation=(9.0, 0.0, 0.0), friction=0.0),
        cuboid((40.0, 40.0, 1.0), translation=(0.0, 0.0, -1.0), friction=0.0),
        cuboid((40.0, 40.0, 1.0), translation=(0.0, 0.0, 9.0), friction=0.0),
    )
    models = reg.ModelSet.pack(
        [reg.ParticleModel(reg.monaghan_sph_eos(1.0e4, 7, 1.01e-3, 1.0))]
    )
    particles = cube_particles(
        origin=(0.5, 0.5, 0.5), counts=(38, 20, 20), model_id=0,
        particle_radius=r, density0=1000.0,
    )
    grid = GridParams.for_domain((-1.0, -1.0, -1.0), (10.0, 8.0, 10.0), h, pad=2)
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
def sand_penetration3():
    """Sand dropped between heightfield walls.
    Ref: examples3d/sand_penetration3.rs (4 heightfields forming a funnel)."""
    e, nu = 1.0e7, 0.2
    h = 0.2
    r = h / 4.0
    n = 20
    i = np.arange(n + 1, dtype=np.float32)
    slope = np.broadcast_to((i[:, None] / n), (n + 1, n + 1)).astype(np.float32)
    colliders = (
        heightfield(slope, scale=(16.0, 4.0, 16.0), translation=(-8.0, 0.0, 0.0)),
        heightfield(slope[::-1].copy(), scale=(16.0, 4.0, 16.0), translation=(8.0, 0.0, 0.0)),
        cuboid((40.0, 1.0, 40.0), translation=(0.0, -4.0, 0.0)),
    )
    sand = reg.ParticleModel(
        reg.corotated_linear_elasticity(e, nu),
        reg.drucker_prager_plasticity(e, nu),
    )
    models = reg.ModelSet.pack([sand])
    particles = cube_particles(
        origin=(-2.0, 6.0, -2.0), counts=(40, 40, 40), model_id=0,
        particle_radius=r, density0=2700.0,
    )
    grid = GridParams.for_domain((-17.0, -4.0, -9.0), (17.0, 11.0, 9.0), h, pad=2)
    return sc.SceneBundle(
        name="sand_penetration3",
        grid=grid,
        models=models,
        colliders=colliders,
        particles=particles,
        params=SolverParameters(dt=1.0 / 60.0),
        gravity=(0.0, -9.81, 0.0),
    )
