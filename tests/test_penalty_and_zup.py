"""Penalty-stiffness collider coupling + GPU FrictionZUp boundary semantics.

Ref: the penalty force is computed in particle_updater.rs:203-232 and added
to the scattered momentum in g2p2g.rs:287 (`mass*vel + force*dt`); the
reference hardcodes the enabling branch to `if false`, so stiffness 0 (our
default) reproduces its effective behavior and stiffness > 0 is the
documented per-collider opt-in (CudaColliderOptions.penalty_stiffness,
cuda_collider_set.rs:22-39). The GPU FrictionZUp z-gate is
grid_update.rs:160-165; the CPU reference aliases FrictionZUp to Friction
(src/dynamics/solver/grid_update.rs:95).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sparkl_tpu as sk
from sparkl_tpu.core.grid import GridParams, GridState
from sparkl_tpu.core.params import BoundaryHandling, SimulationDofs
from sparkl_tpu.models import registry
from sparkl_tpu.solver import dense


def _scene2d(stiffness):
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.1, res=(64, 64))
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(1.0e4, 0.3))]
    )
    p = sk.cube_particles(
        origin=(2.0, 2.0), counts=(8, 8), model_id=0,
        particle_radius=0.025, density0=1000.0,
    )
    # A cuboid overlapping the particle block: penalty pushes insiders out.
    col = sk.cuboid((0.4, 0.4), translation=(2.0, 2.0), friction=0.0,
                    penalty_stiffness=stiffness,
                    boundary_handling=int(BoundaryHandling.NONE))
    params = sk.SolverParameters(dt=1.0 / 60.0, stop_after_one_substep=True)
    return grid, models, [col], params, [0.0, 0.0], p


def test_penalty_force_pushes_momentum_outward():
    """With stiffness > 0 the scattered momentum gains (proj - pos)*k*dt:
    particles inside the collider accelerate toward its boundary; with
    stiffness 0 (reference default) nothing moves (no gravity here)."""
    grid, models, cols0, params, gravity, p = _scene2d(0.0)
    pipe0 = sk.MpmPipeline(grid, models, cols0, params, gravity)
    p0 = pipe0.step(jax.tree_util.tree_map(jnp.array, p))
    v0 = np.asarray(p0.velocity)[np.asarray(p0.active)]
    assert np.abs(v0).max() < 1e-6  # no forces at all

    grid, models, cols1, params, gravity, p = _scene2d(5.0e3)
    pipe1 = sk.MpmPipeline(grid, models, cols1, params, gravity)
    p1 = pipe1.step(jax.tree_util.tree_map(jnp.array, p))
    act = np.asarray(p1.active)
    pos = np.asarray(p1.position)[act]
    vel = np.asarray(p1.velocity)[act]
    # Velocities point away from the collider center (2, 2) on average.
    outward = np.sum((pos - np.array([2.0, 2.0])) * vel, axis=1)
    assert np.abs(vel).max() > 1e-4
    assert outward.mean() > 0.0


def test_penalty_dense_sparse_fused_agree():
    from sparkl_tpu.sparse.pipeline import SparseMpmPipeline
    from sparkl_tpu.fused.pipeline import FusedMpmPipeline

    grid, models, cols, params, gravity, p = _scene2d(2.0e3)
    pd = sk.MpmPipeline(grid, models, cols, params, gravity).step(
        jax.tree_util.tree_map(jnp.array, p)
    )
    ps = SparseMpmPipeline(grid, models, cols, params, gravity).step(
        jax.tree_util.tree_map(jnp.array, p)
    )
    pf = FusedMpmPipeline(grid, models, cols, params, gravity).step(
        jax.tree_util.tree_map(jnp.array, p)
    )
    np.testing.assert_allclose(
        np.asarray(pd.velocity), np.asarray(ps.velocity), atol=1e-5
    )
    o = np.argsort(np.asarray(pf.position)[:, 0] * 1e3 + np.asarray(pf.position)[:, 1])
    od = np.argsort(np.asarray(pd.position)[:, 0] * 1e3 + np.asarray(pd.position)[:, 1])
    np.testing.assert_allclose(
        np.asarray(pd.velocity)[od], np.asarray(pf.velocity)[o], atol=1e-5
    )


def _zup_state(grid):
    shape = grid.res
    vel = jnp.zeros(shape + (3,), jnp.float32)
    # All nodes move +x (tangential) and -y slightly; what matters is the
    # response where the contact normal points downward.
    vel = vel.at[..., 0].set(1.0)
    mass = jnp.ones(shape, jnp.float32)
    return GridState(
        mass=mass, momentum=vel * mass[..., None], velocity=vel,
        psi_momentum=jnp.zeros(shape), psi_mass=jnp.zeros(shape),
    )


def test_friction_zup_gpu_gate_3d():
    """gpu_boundary_semantics: under FRICTION_Z_UP, nodes whose contact
    normal has negative z keep their velocity; with CPU semantics (default)
    FrictionZUp == Friction everywhere."""
    grid = GridParams(origin=(0.0, 0.0, 0.0), cell_width=0.25, res=(8, 8, 8))
    # Slab spanning z in [0.75, 1.25]: nodes below it project upward
    # (normal -z), nodes above it project downward (normal +z).
    col = sk.cuboid((10.0, 10.0, 0.25), translation=(1.0, 1.0, 1.0),
                    friction=0.5)
    node_pos = grid.node_positions()

    def run(gpu_semantics):
        st = _zup_state(grid)
        # Approaching velocity toward the slab from both sides.
        vel = st.velocity
        z = node_pos[..., 2]
        vel = vel.at[..., 2].set(jnp.where(z < 1.0, 1.0, -1.0))
        st = st.replace(velocity=vel)
        out = dense.grid_update(
            grid, st, [col], 1e-3, BoundaryHandling.FRICTION_Z_UP,
            SimulationDofs.LOCK_NONE, node_positions=node_pos,
            gpu_boundary_semantics=gpu_semantics,
        )
        return np.asarray(out.velocity)

    v_cpu = run(False)
    v_gpu = run(True)
    z = np.asarray(node_pos[..., 2])
    below = z == 0.5  # contact normal points down (-z): gated on GPU
    above = z == 1.5  # contact normal points up (+z): identical both ways
    assert below.any() and above.any()
    np.testing.assert_allclose(v_cpu[above], v_gpu[above], atol=1e-6)
    # CPU semantics applied friction below the slab; the GPU gate skips it.
    assert not np.allclose(v_cpu[below], v_gpu[below])
    np.testing.assert_allclose(
        v_gpu[below, 0], 1.0, atol=1e-6
    )  # untouched by the gate


# ---------------------------------------------------------------------------
# GPU boundary semantics: best-collider selection + sdf-gradient normals
# (ref: src_kernels/cuda/grid_update.rs:43-195)
# ---------------------------------------------------------------------------


def _flat_state2d(grid, vel_xy):
    shape = grid.res
    vel = jnp.zeros(shape + (2,), jnp.float32)
    vel = vel.at[..., 0].set(vel_xy[0])
    vel = vel.at[..., 1].set(vel_xy[1])
    mass = jnp.ones(shape, jnp.float32)
    return GridState(
        mass=mass, momentum=vel * mass[..., None], velocity=vel,
        psi_momentum=jnp.zeros(shape), psi_mass=jnp.zeros(shape),
    )


def test_gpu_semantics_planar_matches_cpu():
    """For a single planar collider the sdf-gradient normal equals the
    projection-delta normal, so GPU and CPU responses agree on every node
    within the GPU path's 2-cell cutoff."""
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.25, res=(8, 8))
    col = sk.halfspace((0.0, 1.0), translation=(0.0, 0.5), friction=0.3)
    node_pos = grid.node_positions()

    def run(gpu):
        st = _flat_state2d(grid, (1.0, -0.4))
        out = dense.grid_update(
            grid, st, [col], 1e-3, BoundaryHandling.FRICTION,
            SimulationDofs.LOCK_NONE, node_positions=node_pos,
            gpu_boundary_semantics=gpu,
        )
        return np.asarray(out.velocity)

    v_cpu, v_gpu = run(False), run(True)
    y = np.asarray(node_pos[..., 1])
    # Within the GPU cutoff (with 0.1h slack so the gradient samples stay
    # inside it too — at the cutoff edge the reference's sdf samples go
    # Option::None and the normal zeroes), excluding nodes exactly ON the
    # surface: there the reference paths genuinely differ (the CPU normal is
    # the projection delta, undefined at distance 0 — grid_update.rs
    # `has_normal`; the GPU sdf gradient is well-defined and responds).
    near = (np.abs(y - 0.5) <= 2 * 0.25 - 0.1 * 0.25) & (np.abs(y - 0.5) > 1e-6)
    assert near.any()
    np.testing.assert_allclose(v_cpu[near], v_gpu[near], atol=1e-5)
    on_surface = np.abs(y - 0.5) <= 1e-6
    assert on_surface.any()
    np.testing.assert_allclose(v_cpu[on_surface, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(v_gpu[on_surface, 1], 0.0, atol=1e-6)


def test_gpu_semantics_2h_cutoff():
    """Nodes farther than 2 cells from every collider are TooFar on the GPU
    path (no response at all), while the CPU path still applies its
    tunnel-margin correction to fast approaching nodes."""
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.25, res=(16, 16))
    col = sk.halfspace((0.0, 1.0), translation=(0.0, 0.5), friction=0.0)
    node_pos = grid.node_positions()

    def run(gpu):
        st = _flat_state2d(grid, (0.0, -100.0))  # tunnels in one dt
        out = dense.grid_update(
            grid, st, [col], 1e-1, BoundaryHandling.FRICTION,
            SimulationDofs.LOCK_NONE, node_positions=node_pos,
            gpu_boundary_semantics=gpu,
        )
        return np.asarray(out.velocity)

    v_cpu, v_gpu = run(False), run(True)
    y = np.asarray(node_pos[..., 1])
    far = y - 0.5 > 2 * 0.25 + 1e-6
    assert far.any()
    # CPU margin-corrects the fast approach even beyond 2 cells ...
    assert not np.allclose(v_cpu[far, 1], -100.0)
    # ... the GPU path's projection cutoff leaves those nodes untouched.
    np.testing.assert_allclose(v_gpu[far, 1], -100.0, atol=1e-6)


def test_gpu_semantics_best_collider_only():
    """Two stacked floors: the GPU path responds with the NEAREST collider's
    friction only; the CPU path applies colliders sequentially (first
    projection already removes the approach, so the first-listed collider
    wins there)."""
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.25, res=(8, 8))
    # Probe node y=0.75: dist 0.24 to the frictionless floor (in contact,
    # listed first) and 0.23 to the rough one (nearest).
    far_frictionless = sk.halfspace((0.0, 1.0), translation=(0.0, 0.51),
                                    friction=0.0)
    near_rough = sk.halfspace((0.0, 1.0), translation=(0.0, 0.52),
                              friction=1.0)
    cols = [far_frictionless, near_rough]
    node_pos = grid.node_positions()

    def run(gpu):
        st = _flat_state2d(grid, (1.0, -1.0))
        out = dense.grid_update(
            grid, st, cols, 1e-3, BoundaryHandling.FRICTION,
            SimulationDofs.LOCK_NONE, node_positions=node_pos,
            gpu_boundary_semantics=gpu,
        )
        return np.asarray(out.velocity)

    v_cpu, v_gpu = run(False), run(True)
    y = np.asarray(node_pos[..., 1])
    probe = y == 0.75  # dist 0.25 to near floor, 0.30 to far one; in contact
    assert probe.any()
    # CPU: far frictionless floor responds first (tangential preserved).
    np.testing.assert_allclose(v_cpu[probe, 0], 1.0, atol=1e-5)
    # GPU: only the nearest (rough) floor responds; friction 1 with equal
    # tangential/normal speed kills the tangential component too.
    np.testing.assert_allclose(v_gpu[probe, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(v_gpu[probe, 1], 0.0, atol=1e-5)


def test_gpu_semantics_dense_fused_agree():
    """The fused path's resort-cached gpu projection data produces the same
    trajectories as the dense pipeline with the flag on."""
    from sparkl_tpu.fused.pipeline import FusedMpmPipeline

    grid = GridParams(origin=(0.0, 0.0), cell_width=0.1, res=(64, 64))
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(1.0e4, 0.3))]
    )
    p = sk.cube_particles(
        origin=(2.0, 3.0), counts=(8, 8), model_id=0,
        particle_radius=0.025, density0=1000.0,
    )
    col = sk.cuboid((10.0, 1.0), translation=(3.0, 1.5), friction=0.4)
    params = sk.SolverParameters(dt=1.0 / 60.0, gpu_boundary_semantics=True)
    gravity = [0.0, -9.81]
    pd = sk.MpmPipeline(grid, models, [col], params, gravity)
    pf = FusedMpmPipeline(grid, models, [col], params, gravity)
    a = jax.tree_util.tree_map(jnp.array, p)
    b = jax.tree_util.tree_map(jnp.array, p)
    for _ in range(3):
        a = pd.step(a)
        b = pf.step(b)
    o = np.argsort(np.asarray(b.position)[:, 0] * 1e3 + np.asarray(b.position)[:, 1])
    od = np.argsort(np.asarray(a.position)[:, 0] * 1e3 + np.asarray(a.position)[:, 1])
    np.testing.assert_allclose(
        np.asarray(a.position)[od], np.asarray(b.position)[o], atol=2e-5
    )
