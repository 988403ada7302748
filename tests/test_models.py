import numpy as np
import jax.numpy as jnp
import pytest

from sparkl_tpu.math.lame import lame_lambda_mu
from sparkl_tpu.models import constitutive as con
from sparkl_tpu.models import plasticity as plas
from sparkl_tpu.models import failure as fail
from sparkl_tpu.models import registry

E, NU = 2.0e4, 0.35
LAM, MU = lame_lambda_mu(E, NU)


def _np_corotated_stress(lam, mu, f):
    """Float64 numpy oracle for the un-split corotated Kirchhoff stress."""
    f = np.asarray(f, np.float64)
    j = np.linalg.det(f)
    u, s, vt = np.linalg.svd(f)
    rec = u @ np.diag(s - 1.0) @ vt
    return 2.0 * mu * rec @ f.T + lam * (j - 1.0) * j * np.eye(f.shape[0])


@pytest.mark.parametrize("d", [2, 3])
def test_corotated_stress_matches_oracle(d):
    rng = np.random.default_rng(0)
    f = (np.eye(d) + 0.2 * rng.normal(size=(64, d, d))).astype(np.float32)
    lam = jnp.full((64,), LAM, jnp.float32)
    mu = jnp.full((64,), MU, jnp.float32)
    got = con.corotated_kirchhoff_stress(
        lam, mu, jnp.ones(64), jnp.ones(64), jnp.ones(64), jnp.asarray(f)
    )
    want = np.stack([_np_corotated_stress(LAM, MU, fi) for fi in f])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3 * E)


def test_corotated_identity_is_stress_free():
    f = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    got = con.corotated_kirchhoff_stress(
        jnp.full(4, LAM), jnp.full(4, MU), jnp.ones(4), jnp.ones(4), jnp.ones(4), f
    )
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-2)


def test_corotated_failed_split_zeroes_tension():
    # phase=0 + split flag: stretched (J>1) particle must lose its positive part.
    f = jnp.broadcast_to(jnp.diag(jnp.array([1.5, 1.5])), (1, 2, 2))
    full = con.corotated_kirchhoff_stress(
        jnp.full(1, LAM), jnp.full(1, MU), jnp.ones(1), jnp.ones(1), jnp.ones(1), f
    )
    split = con.corotated_kirchhoff_stress(
        jnp.full(1, LAM), jnp.full(1, MU), jnp.ones(1), jnp.zeros(1), jnp.ones(1), f
    )
    # All-tension state: split form with phase=0 is exactly zero.
    np.testing.assert_allclose(np.asarray(split), 0.0, atol=1e-3)
    assert np.abs(np.asarray(full)).max() > 1.0


def _np_neo_hookean_stress(lam, mu, phase, f):
    f = np.asarray(f, np.float64)
    d = f.shape[0]
    r = 0.001
    pc = (1 - r) * phase * phase + r
    j = np.linalg.det(f)
    k = 2.0 / 3.0 * mu + lam
    cg = f @ f.T
    dev = mu * j ** (-2.0 / d) * (cg - np.trace(cg) / d * np.eye(d))
    vol = k / 2.0 * (j * j - 1.0) * np.eye(d)
    if j >= 1.0:
        pos, neg = dev + vol, np.zeros((d, d))
    else:
        pos, neg = dev, vol
    return pos * pc + neg


@pytest.mark.parametrize("d", [2, 3])
@pytest.mark.parametrize("phase", [1.0, 0.5])
def test_neo_hookean_stress_matches_oracle(d, phase):
    rng = np.random.default_rng(1)
    f = (np.eye(d) + 0.2 * rng.normal(size=(32, d, d))).astype(np.float32)
    got = con.neo_hookean_kirchhoff_stress(
        jnp.full(32, LAM),
        jnp.full(32, MU),
        jnp.full(32, phase),
        jnp.ones(32),
        jnp.asarray(f),
    )
    want = np.stack([_np_neo_hookean_stress(LAM, MU, phase, fi) for fi in f])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3 * E)


def test_eos_pressure_and_stress():
    p0, gamma, visc = 1.0e4, 7.0, 0.0
    mass, vol0 = jnp.asarray([2.0]), jnp.asarray([2.0])  # rho0 = 1
    # Compressed 10%: rho/rho0 = 1/0.9
    rho = jnp.asarray([1.0 / 0.9])
    p = con.eos_pressure(jnp.full(1, p0), jnp.full(1, gamma), jnp.ones(1), mass, vol0, rho)
    want = p0 * ((1 / 0.9) ** 7 - 1.0)
    np.testing.assert_allclose(np.asarray(p), want, rtol=1e-5)

    # Negative pressure clamps at -max_neg_pressure.
    rho_exp = jnp.asarray([0.5])
    p = con.eos_pressure(jnp.full(1, p0), jnp.full(1, gamma), jnp.ones(1), mass, vol0, rho_exp)
    np.testing.assert_allclose(np.asarray(p), -1.0, rtol=1e-5)

    # Stress: -p J I for zero viscosity.
    j = jnp.asarray([0.9])
    lgrad = jnp.zeros((1, 2, 2))
    s = con.eos_kirchhoff_stress(
        jnp.full(1, p0), jnp.full(1, gamma), jnp.full(1, visc), jnp.ones(1),
        mass, vol0, rho, j, lgrad,
    )
    want_s = -want * 0.9 * np.eye(2)
    np.testing.assert_allclose(np.asarray(s)[0], want_s, rtol=1e-5)


def _dp_params(n):
    import math

    return jnp.broadcast_to(
        jnp.asarray(
            [
                math.radians(35.0),
                math.radians(9.0),
                0.2,
                math.radians(10.0),
                LAM,
                MU,
                0.0,
                1.0,
            ],
            jnp.float32,
        ),
        (n, 8),
    )


def test_drucker_prager_expansion_projects_to_rest():
    # Pure expansion (strain trace > 0, deviatoric zero) -> F projected to rotation.
    f = jnp.broadcast_to(jnp.eye(3) * 1.2, (1, 3, 3))
    fn, pdd, ph, lvg = plas.drucker_prager_update(
        _dp_params(1), jnp.ones(1), f, jnp.ones(1), jnp.zeros(1), jnp.zeros(1)
    )
    np.testing.assert_allclose(np.asarray(fn)[0], np.eye(3), atol=1e-5)
    # Volume moved to plastic part: det ratio = 1.2^3.
    np.testing.assert_allclose(np.asarray(pdd)[0], 1.2**3, rtol=1e-4)
    # dq = |strain|
    np.testing.assert_allclose(
        np.asarray(ph)[0], np.sqrt(3) * np.log(1.2), rtol=1e-4
    )


def test_drucker_prager_elastic_region_untouched():
    # Tiny compressive shear well inside the cone -> unchanged.
    f0 = np.eye(3)
    f0[0, 0] = 0.9999
    f = jnp.asarray(f0[None], jnp.float32)
    fn, pdd, ph, lvg = plas.drucker_prager_update(
        _dp_params(1), jnp.ones(1), f, jnp.ones(1), jnp.zeros(1), jnp.zeros(1)
    )
    np.testing.assert_allclose(np.asarray(fn)[0], f0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pdd)[0], 1.0, atol=1e-6)


def test_snow_clamps_and_hardens():
    params = jnp.broadcast_to(jnp.asarray([2.5e-2, 4.5e-3, 10.0]), (1, 3))
    f = jnp.asarray(np.diag([0.9, 1.1]).astype(np.float32)[None])
    fn, eh, pdd = plas.snow_update(params, f, jnp.ones(1), jnp.ones(1))
    s = np.linalg.svd(np.asarray(fn)[0], compute_uv=False)
    np.testing.assert_allclose(np.sort(s), [1.0 - 2.5e-2, 1.0 + 4.5e-3], rtol=1e-5)
    want_pdd = (0.9 * 1.1) / ((1 - 2.5e-2) * (1 + 4.5e-3))
    np.testing.assert_allclose(np.asarray(pdd)[0], want_pdd, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(eh)[0], np.exp(10.0 * (1.0 - want_pdd)), rtol=1e-4
    )


def test_rankine_noop_below_strength():
    params = jnp.broadcast_to(jnp.asarray([MU, LAM, 1.0e6, 5.0]), (1, 4))
    f = jnp.asarray((np.eye(2) * 1.01).astype(np.float32)[None])
    fn, ph = plas.rankine_update(params, f, jnp.ones(1))
    np.testing.assert_allclose(np.asarray(fn)[0], np.asarray(f)[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ph)[0], 1.0, atol=1e-6)


def test_rankine_caps_tension():
    ts = 1.0e2
    params = jnp.broadcast_to(jnp.asarray([MU, LAM, ts, 5.0], jnp.float32), (1, 4))
    f = jnp.asarray((np.diag([1.5, 1.0])).astype(np.float32)[None])
    fn, ph = plas.rankine_update(params, f, jnp.ones(1))
    # Hardening accumulated, F pulled back toward the yield surface.
    assert float(ph[0]) > 1.0
    s_new = np.linalg.svd(np.asarray(fn)[0], compute_uv=False)
    assert s_new.max() < 1.5


def test_nacc_inside_yield_unchanged():
    params = jnp.broadcast_to(
        jnp.asarray([MU, LAM + 2 * MU / 3, 0.0, 0.0, 0.005, 1.85], jnp.float32), (1, 6)
    )
    f0 = np.eye(3) * 0.9999
    f = jnp.asarray(f0.astype(np.float32)[None])
    fn, na = plas.nacc_update(params, f, jnp.full(1, -0.01))
    # Small perturbation: either unchanged or projected consistently; alpha finite.
    assert np.isfinite(np.asarray(fn)).all()
    assert np.isfinite(np.asarray(na)).all()


def test_maximum_stress_failure():
    params = jnp.broadcast_to(jnp.asarray([100.0, 1.0e9], jnp.float32), (2, 2))
    stress = jnp.asarray(
        np.stack([np.diag([50.0, 0.0]), np.diag([150.0, 0.0])]).astype(np.float32)
    )
    failed = fail.maximum_stress_failed(params, stress)
    assert not bool(failed[0])
    assert bool(failed[1])
    # Shear criterion.
    params = jnp.broadcast_to(jnp.asarray([1.0e9, 40.0], jnp.float32), (1, 2))
    stress = jnp.asarray(np.diag([100.0, -100.0]).astype(np.float32)[None])
    assert bool(fail.maximum_stress_failed(params, stress)[0])


def test_registry_dispatch_mixed_models():
    models = registry.ModelSet.pack(
        [
            registry.ParticleModel(
                registry.corotated_linear_elasticity(E, NU),
                registry.drucker_prager_plasticity(E, NU),
            ),
            registry.ParticleModel(registry.monaghan_sph_eos(1.0e4, 7, 0.0)),
        ]
    )
    assert models.present_c == (con.COROTATED, con.EOS_MONAGHAN_SPH)
    assert models.present_p == (plas.DRUCKER_PRAGER,)

    n = 4
    model_id = jnp.asarray([0, 0, 1, 1], jnp.int32)
    f = jnp.broadcast_to(jnp.eye(2) * 1.05, (n, 2, 2))
    stress = registry.kirchhoff_stress(
        models,
        model_id,
        jnp.ones(n),
        jnp.ones(n),
        f,
        jnp.zeros((n, 2, 2)),
        jnp.ones(n),
        jnp.ones(n),
    )
    s = np.asarray(stress)
    # Elastic particles under stretch -> tensile (positive) stress.
    assert s[0, 0, 0] > 0
    # Fluid particles with J=F00=1.05 (expansion) -> clamped small negative pressure.
    np.testing.assert_allclose(s[2], s[3], atol=1e-6)
    assert abs(s[2, 0, 1]) < 1e-6

    fluid = np.asarray(models.is_fluid(model_id))
    np.testing.assert_array_equal(fluid, [False, False, True, True])


def test_timestep_bound_scales():
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(E, NU))]
    )
    n = 2
    bound = registry.timestep_bound(
        models,
        jnp.zeros(n, jnp.int32),
        jnp.ones(n),
        jnp.ones(n),
        jnp.broadcast_to(jnp.eye(2), (n, 2, 2)),
        jnp.ones(n) * 2.0,
        jnp.ones(n),
        jnp.zeros((n, 2)),
        0.1,
    )
    k = LAM + 2 * MU / 3
    c = np.sqrt((k + 4.0 / 3.0 * MU) / 2.0)
    np.testing.assert_allclose(np.asarray(bound), 0.9 * 0.1 / c, rtol=1e-5)


def test_external_and_custom_models():
    """Extension points: ExternalModel (zero stress, no dt bound) and custom
    constitutive/plasticity/failure callables (ref: external_model.rs,
    CoreConstitutiveModel::Custom, ParticleUpdater trait)."""
    # Custom: simple linear elasticity sigma = k * (F - I) @ F^T.
    def my_stress(params, ctx):
        f = ctx["deformation_gradient"]
        d = f.shape[-1]
        eye = jnp.eye(d, dtype=f.dtype)
        return params[..., 0][..., None, None] * jnp.einsum(
            "...ik,...jk->...ij", f - eye, f
        )

    my_spec = registry.register_custom_constitutive(1, my_stress)

    def my_failure(params, stress):
        return stress[..., 0, 0] > params[..., 0]

    my_fail_spec = registry.register_custom_failure(1, my_failure)

    models = registry.ModelSet.pack(
        [
            registry.ParticleModel(registry.external_model()),
            registry.ParticleModel(my_spec(1000.0), failure=my_fail_spec(5.0)),
        ]
    )
    n = 4
    model_id = jnp.asarray([0, 0, 1, 1], jnp.int32)
    f = jnp.broadcast_to(jnp.eye(2), (n, 2, 2)).at[2, 0, 0].set(1.5).at[3, 0, 0].set(1.01)
    stress = registry.kirchhoff_stress(
        models, model_id, jnp.ones(n), jnp.ones(n), f,
        jnp.zeros((n, 2, 2)), jnp.ones(n), jnp.ones(n),
    )
    s = np.asarray(stress)
    np.testing.assert_allclose(s[0], 0.0)  # external: zero stress
    np.testing.assert_allclose(s[2, 0, 0], 1000.0 * 0.5 * 1.5, rtol=1e-5)

    # External model: no dt bound.
    bound = registry.timestep_bound(
        models, model_id, jnp.ones(n), jnp.ones(n), f,
        jnp.ones(n), jnp.ones(n), jnp.zeros((n, 2)), 0.1,
    )
    assert np.isinf(np.asarray(bound)[0])

    # Custom failure trips phase only where stress00 exceeds the threshold.
    phase = registry.apply_failure(models, model_id, jnp.ones(n), stress)
    ph = np.asarray(phase)
    assert ph[2] == 0.0  # 750 > 5
    assert ph[0] == 1.0  # external, no failure model


def test_nacc_tip_projections():
    """NACC: compression past the yield-surface tip projects to the uniform
    stretch with J_e = sqrt(-2 p0/kappa + 1); hardening accumulates alpha.
    Ref: plasticity_nacc.rs project_deformation_gradient cases A/B."""
    mu, kappa = 1.0e5, 2.0e5
    beta, xi, m = 0.5, 3.0, 1.85
    params = jnp.broadcast_to(
        jnp.asarray([mu, kappa, 1.0, xi, beta, m], jnp.float32), (1, 6)
    )
    alpha0 = -0.01
    p0 = kappa * (1e-5 + np.sinh(xi * max(-alpha0, 0.0)))

    # Strong compression: p_tr > p0 -> project to max tip (case A).
    f = jnp.asarray((np.eye(3) * 0.5).astype(np.float32)[None])
    fn, na = plas.nacc_update(params, f, jnp.full(1, alpha0))
    s = np.linalg.svd(np.asarray(fn)[0], compute_uv=False)
    j_tip = np.sqrt(-2.0 * p0 / kappa + 1.0)
    np.testing.assert_allclose(s, j_tip ** (1.0 / 3.0), rtol=1e-3)
    # Hardening: alpha increased by ln(J_tr / J_tip).
    want_alpha = alpha0 + np.log(0.5**3 / j_tip)
    np.testing.assert_allclose(float(na[0]), want_alpha, rtol=1e-3)

    # Strong expansion: p_tr < -beta p0 -> min tip (case B).
    f = jnp.asarray((np.eye(3) * 1.8).astype(np.float32)[None])
    fn, na = plas.nacc_update(params, f, jnp.full(1, alpha0))
    s = np.linalg.svd(np.asarray(fn)[0], compute_uv=False)
    j_tip_b = np.sqrt(2.0 * beta * p0 / kappa + 1.0)
    np.testing.assert_allclose(s, j_tip_b ** (1.0 / 3.0), rtol=1e-3)
