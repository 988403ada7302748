"""Constitutive models: Kirchhoff stress, energies, timestep bounds.

Vectorized over arbitrary leading axes; every function takes raw parameter
arrays (gathered per-particle by the registry) rather than objects, so the
same code path runs in jnp reference solvers and inside Pallas kernels.

Reference semantics:
  * corotated linear elasticity — sparkl
    `src_core/dynamics/models/elasticity_corotated_linear.rs:12-147`
  * neo-hookean elasticity — `elasticity_neo_hookean.rs:11-166`
  * Monaghan SPH EOS (weakly-compressible fluid) — `eos_monaghan_sph.rs`
  * sound-speed CFL bound —
    `src_core/dynamics/timestep/elasticity_sound_speed_timestep_bound.rs`
"""

import jax.numpy as jnp

from sparkl_tpu.math import cmat
from sparkl_tpu.math import linalg
from sparkl_tpu.math import matops
from sparkl_tpu.math.svd import svd, svd_c

# Constitutive type codes (stable ABI for the model tables / checkpoints).
COROTATED = 0
NEO_HOOKEAN = 1
EOS_MONAGHAN_SPH = 2
CUSTOM_BASE = 16


_recompose = matops.recompose


# ---------------------------------------------------------------------------
# Corotated linear elasticity
# ---------------------------------------------------------------------------


def corotated_kirchhoff_stress(lam, mu, split_on_failure, phase, hardening, f):
    """Kirchhoff stress 2µh·U(Σ-1)Vᵀ·Fᵀ + λh(J-1)J·I with positive/negative
    split degradation when fractured (phase < 1).

    Ref: elasticity_corotated_linear.rs `kirchhoff_stress`. The phase == 1
    branch there equals the split form with phase_coeff = 1, so a single
    branch-free expression suffices.
    """
    return cmat.pack(
        corotated_kirchhoff_stress_c(
            lam, mu, split_on_failure, phase, hardening, cmat.unpack(f)
        )
    )


def corotated_kirchhoff_stress_c(lam, mu, split_on_failure, phase, hardening, f):
    """Component-wise core (nested-list matrices; Pallas-kernel safe)."""
    u, s, v = svd_c(f)
    return corotated_kirchhoff_stress_from_svd_c(
        lam, mu, split_on_failure, phase, hardening, f, u, s, v
    )


def corotated_kirchhoff_stress_from_svd_c(
    lam, mu, split_on_failure, phase, hardening, f, u, s, v
):
    """corotated_kirchhoff_stress_c with a caller-supplied SVD of f — lets a
    kernel that already decomposed F (plasticity, pos-energy) amortize the
    one genuinely expensive step of the stress evaluation."""
    d = len(f)
    j = cmat.det_c(f)
    pos = [jnp.maximum(si - 1.0, 0.0) for si in s]
    neg = [jnp.minimum(si - 1.0, 0.0) for si in s]
    coeff = 2.0 * mu * hardening
    pos_dev = cmat.scale_c(cmat.matmul_nt_c(cmat.recompose_c(u, pos, v), f), coeff)
    neg_dev = cmat.scale_c(cmat.matmul_nt_c(cmat.recompose_c(u, neg, v), f), coeff)
    spherical = lam * hardening * (j - 1.0) * j

    compressed = j < 1.0
    sph_pos = jnp.where(compressed, 0.0, spherical)
    sph_neg = jnp.where(compressed, spherical, 0.0)
    pos_part = cmat.add_diag_c(pos_dev, sph_pos)
    neg_part = cmat.add_diag_c(neg_dev, sph_neg)

    phase_coeff = jnp.where((split_on_failure != 0.0) & (phase == 0.0), 0.0, 1.0)
    return cmat.add_c(cmat.scale_c(pos_part, phase_coeff), neg_part)


def corotated_kirchhoff_stress_eigfree_c(
    lam, mu, split_on_failure, phase, hardening, f, s, papply
):
    """Eigenvector-free corotated Kirchhoff stress (fused-kernel fast path).

    Same value as corotated_kirchhoff_stress_from_svd_c, computed without
    U/V: for any per-singular-value weights w, U·diag(w)·Vᵀ·Fᵀ =
    F·p(C)·Fᵀ with C = FᵀF and p the polynomial interpolating w_i/s_i at
    C's eigenvalues (u_k = F v_k / s_k). The pos/neg split and the phase
    coefficient fold into ONE set of node values, so the whole deviatoric
    part costs one polynomial + one congruence F·W·Fᵀ.

    `s` must be the singular values of THIS f (e.g. post-projection s_sel
    with broken slots forced to 1) and `papply` the spd_poly3_prepare_c
    apply for a C sharing f's right-singular-vectors (the DP return map
    only rescales singular values, so the pre-projection basis is valid).
    Node denominators are clamped at 1e-5·s₀: below that (a >10⁵:1 crushed
    principal stretch) the stress in the crushed direction — which tends
    to 0 like s·(s-1) — is underestimated rather than amplified into f32
    garbage.
    """
    j = cmat.det_c(f)
    phase_coeff = jnp.where((split_on_failure != 0.0) & (phase == 0.0), 0.0, 1.0)
    sden = [jnp.maximum(si, 1e-5 * s[0] + 1e-30) for si in s]
    w = [
        (phase_coeff * jnp.maximum(si - 1.0, 0.0) + jnp.minimum(si - 1.0, 0.0)) / dn
        for si, dn in zip(s, sden)
    ]
    wmat = papply(w)
    dev = cmat.scale_c(
        cmat.matmul_nt_c(cmat.matmul_c(f, wmat), f), 2.0 * mu * hardening
    )
    spherical = lam * hardening * (j - 1.0) * j
    sph = jnp.where(j < 1.0, spherical, phase_coeff * spherical)
    return cmat.add_diag_c(dev, sph)


def corotated_elastic_energy_density(lam, mu, hardening, f):
    """µh Σ(σᵢ-1)² + λh/2 (J-1)². Ref: `elastic_energy_density`."""
    _, s, _ = svd(f)
    j = jnp.prod(s, axis=-1)
    return mu * hardening * jnp.sum((s - 1.0) ** 2, axis=-1) + lam * hardening / 2.0 * (
        j - 1.0
    ) ** 2


def corotated_pos_energy(lam, mu, hardening, f):
    """Tensile part of the energy (for eigenerosion). Ref: `pos_energy`."""
    return corotated_pos_energy_c(lam, mu, hardening, cmat.unpack(f))


def corotated_pos_energy_c(lam, mu, hardening, f):
    from sparkl_tpu.math.svd import svd_values_c

    s = svd_values_c(f)  # order-free use; skips the U/V construction
    return corotated_pos_energy_from_s_c(lam, mu, hardening, f, s)


def corotated_pos_energy_from_s_c(lam, mu, hardening, f, s):
    """corotated_pos_energy_c with caller-supplied singular values of f
    (order-free use), so one SVD can serve both stress and energy."""
    j = cmat.det_c(f)
    pos_dev = mu * hardening * sum(jnp.maximum(si - 1.0, 0.0) ** 2 for si in s)
    spherical = lam * hardening / 2.0 * (j - 1.0) ** 2
    return jnp.where(j < 1.0, pos_dev, pos_dev + spherical)


def sound_speed_timestep_bound(alpha, bulk, shear, density0, velocity, cell_width):
    """dt ≤ α·h / max(‖v‖, c) with c = √((K + 4/3 G)/ρ₀).

    Ref: elasticity_sound_speed_timestep_bound.rs `timestep_bound`.
    """
    vnorm = jnp.linalg.norm(velocity, axis=-1)
    return sound_speed_timestep_bound_c(alpha, bulk, shear, density0, vnorm, cell_width)


def sound_speed_timestep_bound_c(alpha, bulk, shear, density0, vnorm, cell_width):
    c = jnp.sqrt((bulk + 4.0 / 3.0 * shear) / density0)
    return alpha * cell_width / jnp.maximum(vnorm, c)


def corotated_timestep_bound(lam, mu, cfl, hardening, density0, velocity, cell_width):
    bulk = (lam + 2.0 * mu / 3.0) * hardening
    shear = mu * hardening
    return sound_speed_timestep_bound(cfl, bulk, shear, density0, velocity, cell_width)


# ---------------------------------------------------------------------------
# Neo-Hookean elasticity
# ---------------------------------------------------------------------------


def neo_hookean_phase_coeff(phase):
    """(1-r)·c² + r with r = 0.001. Ref: elasticity_neo_hookean.rs `phase_coeff`."""
    r = 0.001
    return (1.0 - r) * phase * phase + r


def neo_hookean_kirchhoff_stress(lam, mu, phase, hardening, f):
    """Deviatoric/volumetric Kirchhoff stress with phase degradation.

    Ref: elasticity_neo_hookean.rs `kirchhoff_stress`.
    """
    return cmat.pack(
        neo_hookean_kirchhoff_stress_c(lam, mu, phase, hardening, cmat.unpack(f))
    )


def neo_hookean_kirchhoff_stress_c(lam, mu, phase, hardening, f):
    """Component-wise core (Pallas-kernel safe; pow via exp/log)."""
    d = len(f)
    phase_coeff = neo_hookean_phase_coeff(phase)
    j = cmat.det_c(f)
    k = 2.0 / 3.0 * mu * hardening + lam * hardening
    cg = cmat.aat_c(f)  # F Fᵀ
    # J should be > 0 for valid states; guard against NaN from negative J.
    jpow = jnp.where(j > 0.0, cmat.pow_pos(j, -2.0 / d), 1.0)
    dev = cmat.scale_c(cmat.deviatoric_c(cg), mu * hardening * jpow)
    vol = k / 2.0 * (j * j - 1.0)

    expanded = j >= 1.0
    # pos = dev (+ vol I when expanded); neg = vol I when compressed.
    pos_part = cmat.add_diag_c(dev, jnp.where(expanded, vol, 0.0))
    neg_diag = jnp.where(expanded, 0.0, vol)
    out = cmat.scale_c(pos_part, phase_coeff)
    return cmat.add_diag_c(out, neg_diag)


def neo_hookean_pos_energy(lam, mu, phase, hardening, f):
    """Ref: elasticity_neo_hookean.rs `pos_energy` (incl. its phase quirks)."""
    return neo_hookean_pos_energy_c(lam, mu, phase, hardening, cmat.unpack(f))


def neo_hookean_pos_energy_c(lam, mu, phase, hardening, f):
    d = len(f)
    phase_coeff = neo_hookean_phase_coeff(phase)
    j = cmat.det_c(f)
    k = 2.0 / 3.0 * mu * hardening + lam * hardening
    cg_trace = cmat.frob2_c(f)
    jpow = jnp.where(j > 0.0, cmat.pow_pos(j, -2.0 / d), 1.0)
    dev = hardening * mu / 2.0 * (cg_trace * jpow - d)
    safe_j = jnp.where(j > 0.0, j, 1.0)
    vol = k / 2.0 * ((j * j - 1.0) / 2.0 - jnp.log(safe_j))
    return jnp.where(j < 1.0, dev * phase_coeff, (dev + vol) * phase)


def neo_hookean_timestep_bound(lam, mu, cfl, hardening, density0, velocity, cell_width):
    bulk = (lam + 2.0 * mu / 3.0) * hardening
    shear = mu * hardening
    return sound_speed_timestep_bound(cfl, bulk, shear, density0, velocity, cell_width)


# ---------------------------------------------------------------------------
# Monaghan SPH equation of state (weakly-compressible fluid)
# ---------------------------------------------------------------------------


def eos_pressure(pressure0, gamma, max_neg_pressure, mass, volume0, density_fluid):
    """p = max(p₀((ρ/ρ₀)^γ - 1), -p_neg_max). Ref: eos_monaghan_sph.rs `pressure`."""
    density0 = mass / volume0
    ratio = density_fluid / density0
    return jnp.maximum(
        pressure0 * (cmat.pow_pos(ratio, gamma) - 1.0), -max_neg_pressure
    )


def eos_kirchhoff_stress(
    pressure0,
    gamma,
    viscosity,
    max_neg_pressure,
    mass,
    volume0,
    density_fluid,
    fluid_j,
    velocity_gradient,
):
    """-p·J·I + 2µ_visc·J·dev(strain rate). Ref: eos_monaghan_sph.rs `kirchhoff_stress`."""
    return cmat.pack(
        eos_kirchhoff_stress_c(
            pressure0, gamma, viscosity, max_neg_pressure, mass, volume0,
            density_fluid, fluid_j, cmat.unpack(velocity_gradient),
        )
    )


def eos_kirchhoff_stress_c(
    pressure0, gamma, viscosity, max_neg_pressure, mass, volume0,
    density_fluid, fluid_j, velocity_gradient,
):
    p = eos_pressure(pressure0, gamma, max_neg_pressure, mass, volume0, density_fluid)
    sr_dev = cmat.deviatoric_c(cmat.strain_rate_c(velocity_gradient))
    visc = jnp.where(viscosity != 0.0, 2.0 * viscosity * fluid_j, 0.0)
    out = cmat.scale_c(sr_dev, visc)
    return cmat.add_diag_c(out, -p * fluid_j)


def eos_timestep_bound(
    pressure0,
    gamma,
    max_neg_pressure,
    fluid_j,
    mass,
    volume0,
    density_fluid,
    velocity,
    cell_width,
):
    """Single-particle stability + CFL bound. Ref: eos_monaghan_sph.rs `timestep_bound`."""
    d = velocity.shape[-1]
    vsq = jnp.sum(velocity * velocity, axis=-1)
    return eos_timestep_bound_c(
        pressure0, gamma, max_neg_pressure, fluid_j, mass, volume0,
        density_fluid, vsq, cell_width, d,
    )


def eos_timestep_bound_c(
    pressure0, gamma, max_neg_pressure, fluid_j, mass, volume0,
    density_fluid, velocity_sq, cell_width, dim,
):
    j = fluid_j
    density0 = mass / volume0
    k = 6.0  # quadratic splines
    p = -eos_pressure(pressure0, gamma, max_neg_pressure, mass, volume0, density_fluid)

    arg = cmat.safe_div(density0 * (j - 1.0), k * p * dim)
    safe_j = jnp.where(j > 0.0, j, 1.0)
    single = (cell_width / safe_j) * jnp.sqrt(jnp.maximum(arg, 0.0))
    single = jnp.where((arg > 0.0) & (j > 0.0), single, jnp.inf)
    # NaN-free: reference relies on f32 sqrt(neg) = NaN then min() keeping the
    # other bound; we make it explicit with +inf.

    density_fluctuation = 0.1
    c_sq = jnp.maximum(velocity_sq, 1.0) / density_fluctuation
    cfl = cell_width / jnp.sqrt(c_sq)
    return jnp.minimum(single, cfl)
