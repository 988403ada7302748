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

from sparkl_tpu.math import linalg
from sparkl_tpu.math import matops
from sparkl_tpu.math.svd import svd

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
    d = f.shape[-1]
    j = linalg.det(f)
    u, s, v = svd(f)
    sm1 = s - 1.0

    pos = jnp.maximum(sm1, 0.0)
    neg = jnp.minimum(sm1, 0.0)
    coeff = (2.0 * mu * hardening)[..., None, None]
    pos_dev = coeff * matops.matmul_nt(_recompose(u, pos, v), f)
    neg_dev = coeff * matops.matmul_nt(_recompose(u, neg, v), f)
    spherical = (lam * hardening * (j - 1.0) * j)[..., None, None] * jnp.eye(
        d, dtype=f.dtype
    )

    compressed = (j < 1.0)[..., None, None]
    pos_part = jnp.where(compressed, pos_dev, pos_dev + spherical)
    neg_part = jnp.where(compressed, neg_dev + spherical, neg_dev)

    phase_coeff = jnp.where((split_on_failure != 0.0) & (phase == 0.0), 0.0, 1.0)
    return pos_part * phase_coeff[..., None, None] + neg_part


def corotated_elastic_energy_density(lam, mu, hardening, f):
    """µh Σ(σᵢ-1)² + λh/2 (J-1)². Ref: `elastic_energy_density`."""
    _, s, _ = svd(f)
    j = jnp.prod(s, axis=-1)
    return mu * hardening * jnp.sum((s - 1.0) ** 2, axis=-1) + lam * hardening / 2.0 * (
        j - 1.0
    ) ** 2


def corotated_pos_energy(lam, mu, hardening, f):
    """Tensile part of the energy (for eigenerosion). Ref: `pos_energy`."""
    j = linalg.det(f)
    _, s, _ = svd(f)
    pos = jnp.maximum(s - 1.0, 0.0)
    pos_dev = mu * hardening * jnp.sum(pos * pos, axis=-1)
    spherical = lam * hardening / 2.0 * (j - 1.0) ** 2
    return jnp.where(j < 1.0, pos_dev, pos_dev + spherical)


def sound_speed_timestep_bound(alpha, bulk, shear, density0, velocity, cell_width):
    """dt ≤ α·h / max(‖v‖, c) with c = √((K + 4/3 G)/ρ₀).

    Ref: elasticity_sound_speed_timestep_bound.rs `timestep_bound`.
    """
    c = jnp.sqrt((bulk + 4.0 / 3.0 * shear) / density0)
    vnorm = jnp.linalg.norm(velocity, axis=-1)
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
    d = f.shape[-1]
    phase_coeff = neo_hookean_phase_coeff(phase)
    j = linalg.det(f)
    k = 2.0 / 3.0 * mu * hardening + lam * hardening
    cg = matops.aat(f)  # F Fᵀ
    # J should be > 0 for valid states; guard against NaN from negative J.
    jpow = jnp.where(j > 0.0, jnp.power(jnp.maximum(j, 1e-30), -2.0 / d), 1.0)
    dev = (mu * hardening * jpow)[..., None, None] * linalg.deviatoric_part(cg)
    vol = (k / 2.0 * (j * j - 1.0))[..., None, None] * jnp.eye(d, dtype=f.dtype)

    expanded = (j >= 1.0)[..., None, None]
    pos_part = jnp.where(expanded, dev + vol, dev)
    neg_part = jnp.where(expanded, jnp.zeros_like(vol), vol)
    return pos_part * phase_coeff[..., None, None] + neg_part


def neo_hookean_pos_energy(lam, mu, phase, hardening, f):
    """Ref: elasticity_neo_hookean.rs `pos_energy` (incl. its phase quirks)."""
    d = f.shape[-1]
    phase_coeff = neo_hookean_phase_coeff(phase)
    j = linalg.det(f)
    k = 2.0 / 3.0 * mu * hardening + lam * hardening
    cg_trace = jnp.sum(f * f, axis=(-2, -1))
    jpow = jnp.where(j > 0.0, jnp.power(j, -2.0 / d), 1.0)
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
        pressure0 * (jnp.power(ratio, gamma) - 1.0), -max_neg_pressure
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
    d = velocity_gradient.shape[-1]
    p = eos_pressure(pressure0, gamma, max_neg_pressure, mass, volume0, density_fluid)
    stress = (-p * fluid_j)[..., None, None] * jnp.eye(d, dtype=velocity_gradient.dtype)
    sr_dev = linalg.deviatoric_part(linalg.strain_rate(velocity_gradient))
    visc_term = (2.0 * viscosity * fluid_j)[..., None, None] * sr_dev
    return stress + jnp.where((viscosity != 0.0)[..., None, None], visc_term, 0.0)


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
    j = fluid_j
    density0 = mass / volume0
    k = 6.0  # quadratic splines
    p = -eos_pressure(pressure0, gamma, max_neg_pressure, mass, volume0, density_fluid)

    arg = density0 * (j - 1.0) / (k * p * d)
    single = (cell_width / j) * jnp.sqrt(jnp.maximum(arg, 0.0))
    single = jnp.where((arg > 0.0) & (j > 0.0), single, jnp.inf)
    # NaN-free: reference relies on f32 sqrt(neg) = NaN then min() keeping the
    # other bound; we make it explicit with +inf.

    density_fluctuation = 0.1
    c_sq = jnp.maximum(jnp.sum(velocity * velocity, axis=-1), 1.0) / density_fluctuation
    cfl = cell_width / jnp.sqrt(c_sq)
    return jnp.minimum(single, cfl)
