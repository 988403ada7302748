"""External oracles de-circularizing the golden replays.

The golden trajectories (tests/golden_scenes.json) pin the repo's own dense
pipeline; these tests instead check against quantities derivable WITHOUT the
repo's solver code: closed-form free fall, exact conservation laws of the
MLS-MPM transfer pair, and an independent pure-numpy MLS-MPM step written
directly from the reference equations (SURVEY §3.1 call stack;
`src/dynamics/solver/particle_to_grid.rs`, `grid_to_particle.rs`,
`src_core/dynamics/models/elasticity_corotated_linear.rs`,
`src_core/dynamics/solver/kernel.rs:6-136`). A systematic mistranscription of
e.g. the APIC affine term would pass every self-referential golden but fail
here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sparkl_tpu as sk
from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.models import registry


def _pipe(grid, models, params, gravity, colliders=()):
    return sk.MpmPipeline(grid, models, colliders, params, gravity)


def test_free_fall_closed_form():
    """A particle block far from boundaries in pure gravity follows the
    symplectic-Euler closed form exactly: v_k = v0 + k g dt,
    x_k = x0 + sum_i v_i dt (P2G/G2P are exact for rigid translation)."""
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.1, res=(64, 64))
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(1.0e4, 0.3))]
    )
    p = sk.cube_particles(
        origin=(3.0, 4.0), counts=(4, 4), model_id=0,
        particle_radius=0.025, density0=1000.0,
    )
    dt = 1e-3
    params = sk.SolverParameters(dt=dt, stop_after_one_substep=True)
    g = -9.81
    pipe = _pipe(grid, models, params, [0.0, g])

    x0 = np.asarray(p.position).copy()
    k = 5
    pj = jax.tree_util.tree_map(jnp.array, p)
    for _ in range(k):
        pj = pipe.step(pj)
    act = np.asarray(pj.active)
    # v_k = k g dt; x_k = x0 + sum_{i=1..k} (i g dt) dt
    v_expect = k * g * dt
    y_expect = x0[act, 1] + sum((i * g * dt) * dt for i in range(1, k + 1))
    np.testing.assert_allclose(np.asarray(pj.velocity)[act, 1], v_expect, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pj.velocity)[act, 0], 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pj.position)[act, 1], y_expect, rtol=1e-5)
    # Rigid translation: F stays identity, no internal stress excited.
    f = np.asarray(pj.deformation_gradient)[act]
    np.testing.assert_allclose(f, np.broadcast_to(np.eye(2), f.shape), atol=1e-5)


def test_transfer_pair_conserves_mass_and_momentum():
    """Total mass is invariant and the P2G -> gravity -> G2P chain changes
    total momentum by EXACTLY M*g*dt per substep (partition of unity + mass
    consistency of the quadratic B-spline transfers) — independent of any
    golden trajectory. A deforming, rotating blob exercises stress + APIC."""
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.1, res=(64, 64))
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(5.0e4, 0.3))]
    )
    p = sk.cube_particles(
        origin=(3.0, 3.0), counts=(10, 10), model_id=0,
        particle_radius=0.025, density0=1000.0,
    )
    # Shearing + rotating initial velocity field excites off-diagonal APIC
    # and stress terms.
    pos = np.asarray(p.position)
    c = pos - pos.mean(axis=0)
    vel = np.stack([-1.5 * c[:, 1], 1.5 * c[:, 0]], axis=1)
    vel[:, 0] += 2.0 * c[:, 0]
    p = p.replace(velocity=jnp.asarray(vel.astype(np.float32)))

    dt = 2e-4
    g = np.array([0.3, -9.81], np.float32)
    params = sk.SolverParameters(dt=dt, stop_after_one_substep=True)
    pipe = _pipe(grid, models, params, list(g))

    pj = jax.tree_util.tree_map(jnp.array, p)
    act = np.asarray(pj.active)
    mass = np.asarray(pj.mass)[act]
    m_tot = mass.sum()
    mom = (mass[:, None] * np.asarray(pj.velocity)[act]).sum(axis=0)
    for i in range(4):
        pj = pipe.step(pj)
        act = np.asarray(pj.active)
        m_now = np.asarray(pj.mass)[act].sum()
        mom_now = (np.asarray(pj.mass)[act, None] * np.asarray(pj.velocity)[act]).sum(axis=0)
        np.testing.assert_allclose(m_now, m_tot, rtol=1e-6)
        # Exact in real arithmetic; the bound is f32 roundoff accumulated
        # over ~3^d*N scatter/gather terms of O(0.5) magnitude.
        np.testing.assert_allclose(
            mom_now, mom + m_tot * g * dt * (i + 1), rtol=2e-3, atol=5e-5
        )


def _numpy_mls_mpm_substep(grid_res, origin, h, x, v, C, F, mass, vol0,
                           mu, lam, dt, gravity):
    """Independent MLS-MPM + APIC substep in pure numpy, transcribed from the
    reference equations (NOT from sparkl_tpu code):

      weights    kernel.rs:6-136  w = [.5(1.5-fx)^2, .75-(fx-1)^2, .5(fx-.5)^2]
      stress     elasticity_corotated_linear.rs:31-46
                 2*mu*(F - R)*F^T + lam*(J-1)*J*I   (phase == 1 branch,
                 U(S-1)V^T recomposed == F - R, R = polar rotation)
      P2G        particle_to_grid.rs: affine = m*C - vol0*(4/h^2)*dt*stress;
                 node_mom += w*(m*v + affine*dpt); node_mass += w*m
      grid       v = (mom + m*g*dt)/m
      G2P        grid_to_particle.rs: v' = sum w*v_i;
                 C' = (4/h^2) * sum w * v_i (x_i - x_p)^T
      advect     x += v'*dt;  F += dt * C' * F
    """
    n = x.shape[0]
    nodes_mass = np.zeros(grid_res)
    nodes_mom = np.zeros(grid_res + (2,))

    def weights_of(xp):
        xg = (xp - origin) / h
        base = np.round(xg).astype(int) - 1
        fx = xg - base
        w = np.stack([
            0.5 * (1.5 - fx) ** 2,
            0.75 - (fx - 1.0) ** 2,
            0.5 * (fx - 0.5) ** 2,
        ])  # [3, 2]
        return base, fx, w

    for p_i in range(n):
        Fp = F[p_i]
        J = np.linalg.det(Fp)
        U, S, Vt = np.linalg.svd(Fp)
        R = U @ Vt  # polar rotation (det > 0 for near-identity F)
        stress = 2.0 * mu * (Fp - R) @ Fp.T + lam * (J - 1.0) * J * np.eye(2)
        affine = mass[p_i] * C[p_i] - vol0[p_i] * (4.0 / h**2) * dt * stress
        base, fx, w = weights_of(x[p_i])
        for i in range(3):
            for j in range(3):
                node = (base[0] + i, base[1] + j)
                dpt = (np.array([i, j]) - fx) * h
                wij = w[i, 0] * w[j, 1]
                nodes_mass[node] += wij * mass[p_i]
                nodes_mom[node] += wij * (mass[p_i] * v[p_i] + affine @ dpt)

    vel_nodes = np.zeros_like(nodes_mom)
    nz = nodes_mass > 0
    vel_nodes[nz] = (
        nodes_mom[nz] + nodes_mass[nz, None] * gravity * dt
    ) / nodes_mass[nz, None]

    x2, v2, C2, F2 = x.copy(), v.copy(), C.copy(), F.copy()
    for p_i in range(n):
        base, fx, w = weights_of(x[p_i])
        vp = np.zeros(2)
        Cp = np.zeros((2, 2))
        for i in range(3):
            for j in range(3):
                node = (base[0] + i, base[1] + j)
                dpt = (np.array([i, j]) - fx) * h
                wij = w[i, 0] * w[j, 1]
                vp += wij * vel_nodes[node]
                Cp += wij * np.outer(vel_nodes[node], dpt)
        Cp *= 4.0 / h**2
        v2[p_i] = vp
        x2[p_i] = x[p_i] + vp * dt
        F2[p_i] = F[p_i] + dt * Cp @ F[p_i]
        C2[p_i] = Cp
    return x2, v2, C2, F2


def test_dense_pipeline_matches_independent_numpy_mlsmpm():
    """3 substeps of the dense pipeline vs the independent numpy MLS-MPM
    implementation above: positions, velocities, F, and the APIC matrix all
    agree. This is the non-self-referential anchor for the core transfer +
    constitutive math."""
    h = 0.1
    grid = GridParams(origin=(0.0, 0.0), cell_width=h, res=(64, 64))
    E, nu = 2.0e4, 0.3
    mu = E / (2.0 * (1.0 + nu))
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(E, nu))]
    )
    p = sk.cube_particles(
        origin=(3.02, 3.01), counts=(3, 2), model_id=0,
        particle_radius=0.025, density0=1200.0,
    )
    rng = np.random.default_rng(7)
    vel0 = rng.normal(scale=0.5, size=(p.capacity, 2)).astype(np.float32)
    p = p.replace(velocity=jnp.asarray(vel0))

    dt = 5e-4
    gravity = np.array([0.0, -9.81])
    params = sk.SolverParameters(dt=dt, stop_after_one_substep=True)
    pipe = _pipe(grid, models, params, list(gravity))

    act = np.asarray(p.active)
    x = np.asarray(p.position)[act].astype(np.float64)
    v = np.asarray(p.velocity)[act].astype(np.float64)
    C = np.zeros((x.shape[0], 2, 2))
    F = np.broadcast_to(np.eye(2), (x.shape[0], 2, 2)).copy()
    mass = np.asarray(p.mass)[act].astype(np.float64)
    vol0 = np.asarray(p.volume0)[act].astype(np.float64)

    pj = jax.tree_util.tree_map(jnp.array, p)
    for _ in range(3):
        pj = pipe.step(pj)
        x, v, C, F = _numpy_mls_mpm_substep(
            grid.res, np.array(grid.origin), h, x, v, C, F, mass, vol0,
            mu, lam, dt, gravity,
        )

    actj = np.asarray(pj.active)
    xj = np.asarray(pj.position)[actj]
    vj = np.asarray(pj.velocity)[actj]
    fj = np.asarray(pj.deformation_gradient)[actj]
    cj = np.asarray(pj.velocity_gradient)[actj]
    # Same construction order: cube_particles emits row-major lattice; both
    # sides kept that order.
    np.testing.assert_allclose(xj, x, atol=1e-6)
    np.testing.assert_allclose(vj, v, atol=1e-5)
    np.testing.assert_allclose(fj, F, atol=1e-6)
    np.testing.assert_allclose(cj, C, atol=1e-4)


def test_elastic_vibration_period_closed_form():
    """Free-free longitudinal vibration of an elastic bar: the fundamental
    period is T = 2L/c with c = sqrt(E/rho0) (nu = 0 makes the thin-rod and
    plane-strain sound speeds coincide and kills Poisson coupling). The
    initial velocity is the exact mode-1 profile v_x = A cos(pi x_hat / L),
    and the modal coordinate q(t) = sum m v_x cos(pi x_hat / L) evolves as
    cos(omega t). This pins the E,nu,rho -> Lame -> stress -> wave-speed
    chain to an analytic value: e.g. a mu/lambda swap shifts the measured
    period by sqrt(2) and fails this test, while passing every
    self-referential golden replay."""
    E, nu, rho0 = 1.0e4, 0.0, 1000.0
    c = np.sqrt(E / rho0)               # 3.1623 m/s
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.05, res=(128, 128))
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(E, nu))]
    )
    r = 0.0125  # spacing 0.025 -> 32 particles across L, 16 cells across L
    nx, ny = 32, 4
    p = sk.cube_particles(
        origin=(2.0, 3.0), counts=(nx, ny), model_id=0,
        particle_radius=r, density0=rho0,
    )
    pos0 = np.asarray(p.position).copy()
    # Physical bar length: center extent + one particle radius each side.
    L = pos0[:, 0].max() - pos0[:, 0].min() + 2.0 * r
    xhat = (pos0[:, 0] - pos0[:, 0].min() + r) / L  # material coord in [0,1]
    mode = np.cos(np.pi * xhat).astype(np.float32)
    A = 0.05
    vel = np.zeros_like(pos0)
    vel[:, 0] = A * mode
    p = p.replace(velocity=jnp.asarray(vel))

    dt = 1e-3  # well under the sound CFL bound h/c ~ 0.016
    params = sk.SolverParameters(dt=dt, stop_after_one_substep=True)
    pipe = _pipe(grid, models, params, [0.0, 0.0])

    T_expect = 2.0 * L / c
    mass = np.asarray(p.mass)
    pj = jax.tree_util.tree_map(jnp.array, p)
    crossings = []
    q_prev = float(np.sum(mass * vel[:, 0] * mode))
    assert q_prev > 0.0
    n_steps = int(1.2 * T_expect / dt)
    for k in range(1, n_steps + 1):
        pj = pipe.step(pj)
        q = float(np.sum(mass * np.asarray(pj.velocity)[:, 0] * mode))
        if q_prev != 0.0 and (q < 0.0) != (q_prev < 0.0):
            # Linear interpolation of the crossing time inside the step.
            frac = q_prev / (q_prev - q)
            crossings.append((k - 1 + frac) * dt)
            if len(crossings) == 2:
                break
        q_prev = q
    assert len(crossings) == 2, f"only {len(crossings)} zero crossings seen"
    T_measured = 2.0 * (crossings[1] - crossings[0])
    # Quadratic B-spline MPM at 16 cells/wavelength carries a few percent of
    # numerical dispersion and the bar-length definition another ~2%; 10%
    # still distinguishes every plausible formula error (mu/lambda swap:
    # +41%, E vs 2mu: +-29%, plane-strain vs rod: exact here since nu = 0).
    assert abs(T_measured - T_expect) / T_expect < 0.10, (
        f"period {T_measured:.4f}s vs analytic {T_expect:.4f}s"
    )
