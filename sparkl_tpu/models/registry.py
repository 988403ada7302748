"""Model registry: packs per-model parameters into device tables and provides
vectorized per-particle dispatch.

Design (TPU-first): instead of trait objects / device enums
(ref: sparkl `src/dynamics/particle_model.rs`, `src_kernels/gpu_*_model.rs`),
models live in small [M, K] parameter tables; particles carry an int32
model_id. Dispatch computes each *present* model type for the whole batch and
selects with masks — fully vectorized, no gathers beyond the [M, K] parameter
lookup, and XLA fuses the branches. The set of present types is static
metadata so absent branches are skipped at trace time.

Custom models (ref: `CoreConstitutiveModel::Custom`, `ParticleUpdater` trait)
register Python callables under type codes >= 16.
"""

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from sparkl_tpu.models import constitutive as con
from sparkl_tpu.models import failure as fail
from sparkl_tpu.models import plasticity as plas
from sparkl_tpu.math.lame import lame_lambda_mu, shear_modulus, bulk_modulus

# Re-exported type-code namespaces.
ConstitutiveType = con
PlasticType = plas
FailureType = fail

_N_CPARAMS = 4
_N_PPARAMS = 8
_N_FPARAMS = 2


# ---------------------------------------------------------------------------
# Python-side model specs (scene-construction API)
# ---------------------------------------------------------------------------


def corotated_linear_elasticity(
    young_modulus, poisson_ratio, split_stress_on_failure=True, cfl_coeff=0.9
):
    """Ref: elasticity_corotated_linear.rs `CorotatedLinearElasticity::new`."""
    lam, mu = lame_lambda_mu(young_modulus, poisson_ratio)
    return (
        con.COROTATED,
        (lam, mu, cfl_coeff, 1.0 if split_stress_on_failure else 0.0),
    )


def neo_hookean_elasticity(young_modulus, poisson_ratio, cfl_coeff=0.5):
    """Ref: elasticity_neo_hookean.rs `NeoHookeanElasticity::new`."""
    lam, mu = lame_lambda_mu(young_modulus, poisson_ratio)
    return (con.NEO_HOOKEAN, (lam, mu, cfl_coeff, 0.0))


def monaghan_sph_eos(pressure0, gamma, viscosity, max_neg_pressure=1.0):
    """Ref: eos_monaghan_sph.rs `MonaghanSphEos::new`."""
    return (con.EOS_MONAGHAN_SPH, (pressure0, float(gamma), viscosity, max_neg_pressure))


def drucker_prager_plasticity(
    young_modulus,
    poisson_ratio,
    h0_deg=35.0,
    h1_deg=9.0,
    h2=0.2,
    h3_deg=10.0,
    only_active_when_failed=False,
    volume_correction=1.0,
):
    """Ref: plasticity_drucker_prager.rs `DruckerPragerPlasticity::new`."""
    import math

    lam, mu = lame_lambda_mu(young_modulus, poisson_ratio)
    return (
        plas.DRUCKER_PRAGER,
        (
            math.radians(h0_deg),
            math.radians(h1_deg),
            h2,
            math.radians(h3_deg),
            lam,
            mu,
            1.0 if only_active_when_failed else 0.0,
            volume_correction,
        ),
    )


def nacc_plasticity(
    young_modulus,
    poisson_ratio,
    cohesion,
    hardening_enabled,
    hardening_factor,
    friction_angle=None,
    m=None,
    dim=3,
):
    """Ref: plasticity_nacc.rs `NaccPlasticity::{new, with_m}`."""
    import math

    mu = shear_modulus(young_modulus, poisson_ratio)
    kappa = bulk_modulus(young_modulus, poisson_ratio)
    if m is None:
        sin_f = math.sin(friction_angle)
        d = float(dim)
        m = (
            math.sqrt(2.0 / 3.0)
            * 2.0
            * sin_f
            / (3.0 - sin_f)
            * d
            / math.sqrt(2.0 / (6.0 - d))
        )
    return (
        plas.NACC,
        (mu, kappa, 1.0 if hardening_enabled else 0.0, hardening_factor, cohesion, m),
    )


def rankine_plasticity(young_modulus, poisson_ratio, tensile_strength, softening_rate):
    """Ref: plasticity_rankine.rs `RankinePlasticity::new`."""
    lam, mu = lame_lambda_mu(young_modulus, poisson_ratio)
    return (plas.RANKINE, (mu, lam, tensile_strength, softening_rate))


def snow_plasticity(min_epsilon=2.5e-2, max_epsilon=4.5e-3, hardening_coeff=10.0):
    """Ref: plasticity_snow.rs `SnowPlasticity::new`."""
    return (plas.SNOW, (min_epsilon, max_epsilon, hardening_coeff))


def maximum_stress_failure(max_principal_stress, max_shear_stress):
    """Ref: failure_maximum_stress.rs `MaximumStressFailure::new`."""
    return (fail.MAXIMUM_STRESS, (max_principal_stress, max_shear_stress))


# ---------------------------------------------------------------------------
# Extension points: external + custom models
# (ref: src/dynamics/models/external_model.rs ExternalModel,
#  CoreConstitutiveModel::Custom(u32) and the ParticleUpdater /
#  CudaParticleKernelsLauncher custom-physics traits)
# ---------------------------------------------------------------------------

EXTERNAL = 15  # stress computed outside the solver: zero stress, no dt bound

_custom_constitutive = {}
_custom_plastic = {}
_custom_failure = {}


def external_model():
    """Constitutive model that contributes nothing — stress is supplied by
    user code between steps. Ref: external_model.rs ExternalModel."""
    return (EXTERNAL, ())


def register_custom_constitutive(
    tag, stress_fn, is_fluid=False, pos_energy_fn=None, timestep_fn=None
):
    """Register a user constitutive model under type code CUSTOM_BASE + tag.

    stress_fn(params[N, 4], ctx) -> [N, d, d] Kirchhoff stress, where ctx is
    a dict with phase, elastic_hardening, deformation_gradient,
    velocity_gradient, mass, volume0 (all batched). Traced under jit —
    must be pure jnp. Returns the spec tuple for ParticleModel.
    """
    code = con.CUSTOM_BASE + int(tag)
    _custom_constitutive[code] = dict(
        stress=stress_fn,
        is_fluid=bool(is_fluid),
        pos_energy=pos_energy_fn,
        timestep=timestep_fn,
    )

    def spec(*params):
        return (code, tuple(params))

    return spec


def register_custom_plasticity(tag, update_fn):
    """update_fn(params[N, 8], ctx) -> dict of updated fields among
    {deformation_gradient, plastic_def_det, plastic_hardening,
     elastic_hardening, log_vol_gain, nacc_alpha}."""
    code = plas.PLASTIC_CUSTOM_BASE + int(tag)
    _custom_plastic[code] = update_fn

    def spec(*params):
        return (code, tuple(params))

    return spec


def register_custom_failure(tag, failed_fn):
    """failed_fn(params[N, 2], stress[N, d, d]) -> bool[N]."""
    code = fail.FAILURE_CUSTOM_BASE + int(tag)
    _custom_failure[code] = failed_fn

    def spec(*params):
        return (code, tuple(params))

    return spec


@dataclass(frozen=True)
class ParticleModel:
    """One material = constitutive model (+ optional plasticity / failure).

    Ref: sparkl `src/dynamics/particle_model.rs` ParticleModel::{new,
    with_plasticity, with_failure}.
    """

    constitutive: Tuple[int, Tuple[float, ...]]
    plastic: Optional[Tuple[int, Tuple[float, ...]]] = None
    failure: Optional[Tuple[int, Tuple[float, ...]]] = None


# ---------------------------------------------------------------------------
# Packed device-side model tables
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ModelSet:
    ctype: jax.Array  # [M] int32
    cparams: jax.Array  # [M, 4] f32
    ptype: jax.Array  # [M] int32
    pparams: jax.Array  # [M, 8] f32
    ftype: jax.Array  # [M] int32
    fparams: jax.Array  # [M, 2] f32
    present_c: Tuple[int, ...] = field(metadata=dict(static=True), default=())
    present_p: Tuple[int, ...] = field(metadata=dict(static=True), default=())
    present_f: Tuple[int, ...] = field(metadata=dict(static=True), default=())

    @staticmethod
    def pack(models):
        """Pack a list of ParticleModel into device tables."""
        import numpy as np

        m = len(models)
        ctype = np.zeros((m,), np.int32)
        cparams = np.zeros((m, _N_CPARAMS), np.float32)
        ptype = np.zeros((m,), np.int32)
        pparams = np.zeros((m, _N_PPARAMS), np.float32)
        ftype = np.zeros((m,), np.int32)
        fparams = np.zeros((m, _N_FPARAMS), np.float32)
        for i, pm in enumerate(models):
            ct, cp = pm.constitutive
            ctype[i] = ct
            cparams[i, : len(cp)] = cp
            if pm.plastic is not None:
                pt, pp = pm.plastic
                ptype[i] = pt
                pparams[i, : len(pp)] = pp
            if pm.failure is not None:
                ft, fp = pm.failure
                ftype[i] = ft
                fparams[i, : len(fp)] = fp
        return ModelSet(
            ctype=jnp.asarray(ctype),
            cparams=jnp.asarray(cparams),
            ptype=jnp.asarray(ptype),
            pparams=jnp.asarray(pparams),
            ftype=jnp.asarray(ftype),
            fparams=jnp.asarray(fparams),
            present_c=tuple(sorted(set(int(t) for t in ctype))),
            present_p=tuple(sorted(set(int(t) for t in ptype) - {plas.PLASTIC_NONE})),
            present_f=tuple(sorted(set(int(t) for t in ftype) - {fail.FAILURE_NONE})),
        )

    @property
    def num_models(self):
        return self.ctype.shape[0]

    def is_fluid(self, model_id):
        """bool[N]: particle's constitutive model is a fluid."""
        ct = self.ctype[model_id]
        fluid = ct == con.EOS_MONAGHAN_SPH
        for code in self.present_c:
            if code in _custom_constitutive and _custom_constitutive[code]["is_fluid"]:
                fluid = fluid | (ct == code)
        return fluid


# ---------------------------------------------------------------------------
# Vectorized dispatch
# ---------------------------------------------------------------------------


def kirchhoff_stress(
    ms: ModelSet,
    model_id,
    phase,
    elastic_hardening,
    f,
    velocity_gradient,
    mass,
    volume0,
):
    """Per-particle Kirchhoff stress. Fluids read J from F[0,0]
    (ref: particle.rs `fluid_deformation_gradient_det`)."""
    ct = ms.ctype[model_id]
    cp = ms.cparams[model_id]
    out = jnp.zeros_like(f)
    if con.COROTATED in ms.present_c:
        s = con.corotated_kirchhoff_stress(
            cp[..., 0], cp[..., 1], cp[..., 3], phase, elastic_hardening, f
        )
        out = jnp.where((ct == con.COROTATED)[..., None, None], s, out)
    if con.NEO_HOOKEAN in ms.present_c:
        s = con.neo_hookean_kirchhoff_stress(
            cp[..., 0], cp[..., 1], phase, elastic_hardening, f
        )
        out = jnp.where((ct == con.NEO_HOOKEAN)[..., None, None], s, out)
    if con.EOS_MONAGHAN_SPH in ms.present_c:
        fluid_j = f[..., 0, 0]
        density_fluid = (mass / volume0) / jnp.maximum(fluid_j, 1e-20)
        s = con.eos_kirchhoff_stress(
            cp[..., 0],
            cp[..., 1],
            cp[..., 2],
            cp[..., 3],
            mass,
            volume0,
            density_fluid,
            fluid_j,
            velocity_gradient,
        )
        out = jnp.where((ct == con.EOS_MONAGHAN_SPH)[..., None, None], s, out)
    for code in ms.present_c:
        if code in _custom_constitutive:
            ctx = dict(
                phase=phase, elastic_hardening=elastic_hardening,
                deformation_gradient=f, velocity_gradient=velocity_gradient,
                mass=mass, volume0=volume0,
            )
            s = _custom_constitutive[code]["stress"](cp, ctx)
            out = jnp.where((ct == code)[..., None, None], s, out)
    # EXTERNAL contributes zero stress (out already zero there).
    return out


def pos_energy(ms: ModelSet, model_id, phase, elastic_hardening, f):
    """Tensile energy density for crack propagation (0 for fluids).

    Ref: ConstitutiveModel::pos_energy (default 0, elastic overrides)."""
    ct = ms.ctype[model_id]
    cp = ms.cparams[model_id]
    out = jnp.zeros(f.shape[:-2], f.dtype)
    if con.COROTATED in ms.present_c:
        e = con.corotated_pos_energy(cp[..., 0], cp[..., 1], elastic_hardening, f)
        out = jnp.where(ct == con.COROTATED, e, out)
    if con.NEO_HOOKEAN in ms.present_c:
        e = con.neo_hookean_pos_energy(cp[..., 0], cp[..., 1], phase, elastic_hardening, f)
        out = jnp.where(ct == con.NEO_HOOKEAN, e, out)
    for code in ms.present_c:
        cc = _custom_constitutive.get(code)
        if cc and cc["pos_energy"] is not None:
            e = cc["pos_energy"](cp, dict(phase=phase,
                                          elastic_hardening=elastic_hardening,
                                          deformation_gradient=f))
            out = jnp.where(ct == code, e, out)
    return out


def timestep_bound(
    ms: ModelSet,
    model_id,
    phase,
    elastic_hardening,
    f,
    mass,
    volume0,
    velocity,
    cell_width,
):
    ct = ms.ctype[model_id]
    cp = ms.cparams[model_id]
    density0 = mass / volume0
    out = jnp.full(model_id.shape, jnp.inf, dtype=velocity.dtype)
    if con.COROTATED in ms.present_c:
        b = con.corotated_timestep_bound(
            cp[..., 0],
            cp[..., 1],
            cp[..., 2],
            elastic_hardening,
            density0,
            velocity,
            cell_width,
        )
        out = jnp.where(ct == con.COROTATED, b, out)
    if con.NEO_HOOKEAN in ms.present_c:
        b = con.neo_hookean_timestep_bound(
            cp[..., 0],
            cp[..., 1],
            cp[..., 2],
            elastic_hardening,
            density0,
            velocity,
            cell_width,
        )
        out = jnp.where(ct == con.NEO_HOOKEAN, b, out)
    if con.EOS_MONAGHAN_SPH in ms.present_c:
        fluid_j = f[..., 0, 0]
        density_fluid = density0 / jnp.maximum(fluid_j, 1e-20)
        b = con.eos_timestep_bound(
            cp[..., 0],
            cp[..., 1],
            cp[..., 3],
            fluid_j,
            mass,
            volume0,
            density_fluid,
            velocity,
            cell_width,
        )
        out = jnp.where(ct == con.EOS_MONAGHAN_SPH, b, out)
    for code in ms.present_c:
        cc = _custom_constitutive.get(code)
        if cc and cc["timestep"] is not None:
            b = cc["timestep"](cp, dict(deformation_gradient=f, mass=mass,
                                        volume0=volume0, velocity=velocity,
                                        cell_width=cell_width))
            out = jnp.where(ct == code, b, out)
    return out


def apply_plasticity(
    ms: ModelSet,
    model_id,
    phase,
    f,
    plastic_def_det,
    plastic_hardening,
    elastic_hardening,
    log_vol_gain,
    nacc_alpha,
):
    """Run every present plastic return map, masked per particle.

    Returns (f, plastic_def_det, plastic_hardening, elastic_hardening,
    log_vol_gain, nacc_alpha)."""
    pt = ms.ptype[model_id]
    pp = ms.pparams[model_id]

    if plas.DRUCKER_PRAGER in ms.present_p:
        f2, pdd2, ph2, lvg2 = plas.drucker_prager_update(
            pp, phase, f, plastic_def_det, plastic_hardening, log_vol_gain
        )
        m = pt == plas.DRUCKER_PRAGER
        f = jnp.where(m[..., None, None], f2, f)
        plastic_def_det = jnp.where(m, pdd2, plastic_def_det)
        plastic_hardening = jnp.where(m, ph2, plastic_hardening)
        log_vol_gain = jnp.where(m, lvg2, log_vol_gain)
    if plas.NACC in ms.present_p:
        f2, na2 = plas.nacc_update(pp[..., :6], f, nacc_alpha)
        m = pt == plas.NACC
        f = jnp.where(m[..., None, None], f2, f)
        nacc_alpha = jnp.where(m, na2, nacc_alpha)
    if plas.RANKINE in ms.present_p:
        f2, ph2 = plas.rankine_update(pp[..., :4], f, plastic_hardening)
        m = pt == plas.RANKINE
        f = jnp.where(m[..., None, None], f2, f)
        plastic_hardening = jnp.where(m, ph2, plastic_hardening)
    if plas.SNOW in ms.present_p:
        f2, eh2, pdd2 = plas.snow_update(
            pp[..., :3], f, elastic_hardening, plastic_def_det
        )
        m = pt == plas.SNOW
        f = jnp.where(m[..., None, None], f2, f)
        elastic_hardening = jnp.where(m, eh2, elastic_hardening)
        plastic_def_det = jnp.where(m, pdd2, plastic_def_det)

    for code in ms.present_p:
        if code in _custom_plastic:
            ctx = dict(
                phase=phase,
                deformation_gradient=f,
                plastic_def_det=plastic_def_det,
                plastic_hardening=plastic_hardening,
                elastic_hardening=elastic_hardening,
                log_vol_gain=log_vol_gain,
                nacc_alpha=nacc_alpha,
            )
            upd = _custom_plastic[code](pp, ctx)
            m = pt == code
            if "deformation_gradient" in upd:
                f = jnp.where(m[..., None, None], upd["deformation_gradient"], f)
            plastic_def_det = jnp.where(m, upd.get("plastic_def_det", plastic_def_det), plastic_def_det)
            plastic_hardening = jnp.where(m, upd.get("plastic_hardening", plastic_hardening), plastic_hardening)
            elastic_hardening = jnp.where(m, upd.get("elastic_hardening", elastic_hardening), elastic_hardening)
            log_vol_gain = jnp.where(m, upd.get("log_vol_gain", log_vol_gain), log_vol_gain)
            nacc_alpha = jnp.where(m, upd.get("nacc_alpha", nacc_alpha), nacc_alpha)

    return (
        f,
        plastic_def_det,
        plastic_hardening,
        elastic_hardening,
        log_vol_gain,
        nacc_alpha,
    )


def apply_failure(ms: ModelSet, model_id, phase, stress):
    """phase := 0 where the failure model trips.

    Ref: grid_to_particle.rs "Apply failure model" block."""
    if not ms.present_f:
        return phase
    ft = ms.ftype[model_id]
    fp = ms.fparams[model_id]
    failed = jnp.zeros(phase.shape, bool)
    if fail.MAXIMUM_STRESS in ms.present_f:
        trip = fail.maximum_stress_failed(fp, stress)
        failed = failed | ((ft == fail.MAXIMUM_STRESS) & trip)
    for code in ms.present_f:
        if code in _custom_failure:
            trip = _custom_failure[code](fp, stress)
            failed = failed | ((ft == code) & trip)
    return jnp.where(failed, 0.0, phase)
