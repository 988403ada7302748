"""Plastic return maps on the singular values of the deformation gradient.

All maps are vectorized and branch-free (where-selects instead of early
returns) so one call handles a whole particle batch. Each returns the
projected deformation gradient plus updated per-particle plastic state.

Reference semantics:
  * Drucker-Prager (sand) — sparkl
    `src_core/dynamics/models/plasticity_drucker_prager.rs:10-105`
  * NACC (non-associated Cam-Clay) — `plasticity_nacc.rs:12-166`
  * Rankine (tensile softening) — `plasticity_rankine.rs`
  * Snow — `plasticity_snow.rs`
"""

import jax.numpy as jnp

from sparkl_tpu.math import matops
from sparkl_tpu.math.svd import svd

PLASTIC_NONE = 0
DRUCKER_PRAGER = 1
NACC = 2
RANKINE = 3
SNOW = 4
PLASTIC_CUSTOM_BASE = 16


_recompose = matops.recompose


def _safe_div(a, b, eps=1e-20):
    good = jnp.abs(b) > eps
    return jnp.where(good, a / jnp.where(good, b, 1.0), 0.0)


# ---------------------------------------------------------------------------
# Drucker-Prager
# ---------------------------------------------------------------------------


def drucker_prager_alpha(h0, h1, h2, h3, q):
    """Hardening-dependent friction coefficient α(q).

    Ref: plasticity_drucker_prager.rs `alpha` — angle = h0 + (h1·q - h3)e^(-h2·q),
    α = √(2/3)·2 sin/ (3 - sin).
    """
    angle = h0 + (h1 * q - h3) * jnp.exp(-h2 * q)
    s = jnp.sin(angle)
    return jnp.sqrt(2.0 / 3.0) * (2.0 * s) / (3.0 - s)


def drucker_prager_update(
    params, phase, f, plastic_def_det, plastic_hardening, log_vol_gain
):
    """DP return map. params rows: [h0,h1,h2,h3,lambda,mu,only_when_failed,vol_corr].

    Ref: plasticity_drucker_prager.rs `project_deformation_gradient` +
    `update_particle`.
    """
    h0, h1, h2, h3 = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    lam, mu = params[..., 4], params[..., 5]
    only_when_failed = params[..., 6]
    vol_corr = params[..., 7]
    d = f.shape[-1]

    u, s, v = svd(f)
    alpha = drucker_prager_alpha(h0, h1, h2, h3, plastic_hardening)

    safe_s = jnp.maximum(s, 1e-20)
    strain = jnp.log(safe_s) + (log_vol_gain / d)[..., None]
    strain_trace = jnp.sum(strain, axis=-1)
    dev = strain - (strain_trace / d)[..., None]
    dev_norm = jnp.sqrt(jnp.sum(dev * dev, axis=-1))

    # Case A: zero deviatoric strain or expanding trace -> project to identity.
    case_a = (dev_norm == 0.0) | (strain_trace > 0.0)
    dq_a = jnp.sqrt(jnp.sum(strain * strain, axis=-1))

    # Case B: inside yield surface (gamma <= 0) -> no change.
    gamma = dev_norm + (d * lam + 2.0 * mu) / (2.0 * mu) * strain_trace * alpha
    case_b = (~case_a) & (gamma <= 0.0)

    # Case C: project onto the cone.
    h_strain = strain - gamma[..., None] * _safe_div(dev, dev_norm[..., None])
    s_c = jnp.exp(h_strain)

    new_s = jnp.where(case_a[..., None], jnp.ones_like(s), s_c)
    dq = jnp.where(case_a, dq_a, gamma)

    applied = ~case_b
    gate = (only_when_failed == 0.0) | (phase == 0.0)
    applied = applied & gate

    prev_det = jnp.prod(s, axis=-1)
    new_det0 = jnp.prod(new_s, axis=-1)
    diff = new_det0 - prev_det
    new_det = jnp.where(diff > 0.0, new_det0, prev_det + diff * vol_corr)

    det_ratio = _safe_div(prev_det, new_det)
    new_plastic_def_det = plastic_def_det * jnp.where(applied, det_ratio, 1.0)
    new_log_vol_gain = log_vol_gain + jnp.where(
        applied,
        jnp.log(jnp.maximum(prev_det, 1e-30)) - jnp.log(jnp.maximum(new_det, 1e-30)),
        0.0,
    )
    new_hardening = plastic_hardening + jnp.where(applied, dq, 0.0)
    f_proj = _recompose(u, new_s, v)
    f_new = jnp.where(applied[..., None, None], f_proj, f)
    return f_new, new_plastic_def_det, new_hardening, new_log_vol_gain


# ---------------------------------------------------------------------------
# NACC
# ---------------------------------------------------------------------------


def nacc_update(params, f, nacc_alpha):
    """NACC return map. params rows: [mu,kappa,hardening_enabled,xi,beta,M].

    Ref: plasticity_nacc.rs `project_deformation_gradient`.
    """
    mu, kappa = params[..., 0], params[..., 1]
    hardening_enabled = params[..., 2] != 0.0
    xi, beta, m = params[..., 3], params[..., 4], params[..., 5]
    d = float(f.shape[-1])

    u, s, v = svd(f)
    sq = s * s
    sq_trace = jnp.sum(sq, axis=-1)

    p0 = kappa * (1.0e-5 + jnp.sinh(xi * jnp.maximum(-nacc_alpha, 0.0)))
    j_e_tr = jnp.prod(s, axis=-1)
    safe_j = jnp.maximum(j_e_tr, 1e-20)
    s_tr = (mu * jnp.power(safe_j, -2.0 / d))[..., None] * (
        sq - (sq_trace / d)[..., None]
    )
    psi_kappa = kappa / 2.0 * (j_e_tr - 1.0 / safe_j)
    p_tr = -psi_kappa * j_e_tr

    # Case A: p_tr > p0 -> max tip of the yield surface.
    j_a = jnp.sqrt(jnp.maximum(-2.0 * p0 / kappa + 1.0, 0.0))
    s_a = jnp.power(jnp.maximum(j_a, 1e-20), 1.0 / d)
    alpha_a = nacc_alpha + jnp.where(
        hardening_enabled, jnp.log(safe_j / jnp.maximum(j_a, 1e-20)), 0.0
    )

    # Case B: p_tr < -beta p0 -> min tip.
    j_b = jnp.sqrt(2.0 * beta * p0 / kappa + 1.0)
    s_b = jnp.power(jnp.maximum(j_b, 1e-20), 1.0 / d)
    alpha_b = nacc_alpha + jnp.where(
        hardening_enabled, jnp.log(safe_j / jnp.maximum(j_b, 1e-20)), 0.0
    )

    # Yield test.
    y0 = (1.0 + 2.0 * beta) * ((6.0 - d) / 2.0)
    y1 = m * m * (p_tr + beta * p0) * (p_tr - p0)
    s_tr_norm_sq = jnp.sum(s_tr * s_tr, axis=-1)
    y = y0 * s_tr_norm_sq + y1

    # Case C: inside the yield surface -> unchanged.
    # Case D: projection onto the yield surface, with optional hardening.
    p_c = (1.0 - beta) * p0 / 2.0
    q_tr = jnp.sqrt((6.0 - d) / 2.0) * jnp.sqrt(s_tr_norm_sq)
    dir0 = p_c - p_tr
    dir1 = 0.0 - q_tr
    dir_norm = jnp.sqrt(dir0 * dir0 + dir1 * dir1)
    dir0 = _safe_div(dir0, dir_norm)
    dir1 = _safe_div(dir1, dir_norm)
    c_q = m * m * (p_c + beta * p0) * (p_c - p0)
    b_q = m * m * dir0 * (2.0 * p_c - p0 + beta * p0)
    a_q = m * m * dir0 * dir0 + (1.0 + 2.0 * beta) * dir1 * dir1
    discr = jnp.sqrt(jnp.maximum(b_q * b_q - 4.0 * a_q * c_q, 0.0))
    l1 = _safe_div(-b_q + discr, 2.0 * a_q)
    l2 = _safe_div(-b_q - discr, 2.0 * a_q)
    p1 = p_c + l1 * dir0
    p2 = p_c + l2 * dir0
    p_x = jnp.where((p_tr - p_c) * (p1 - p_c) > 0.0, p1, p2)
    j_e_x = jnp.sqrt(jnp.abs(-2.0 * p_x / kappa + 1.0))
    do_hardening = (
        hardening_enabled
        & (p0 > 1.0e-4)
        & (p_tr < p0 - 1.0e-4)
        & (p_tr > -beta * p0 + 1.0e-4)
        & (j_e_x > 1.0e-4)
    )
    alpha_d = nacc_alpha + jnp.where(
        do_hardening, jnp.log(safe_j / jnp.maximum(j_e_x, 1e-20)), 0.0
    )

    s_tr_norm = jnp.sqrt(s_tr_norm_sq)
    s_tr_unit = _safe_div(s_tr, s_tr_norm[..., None])
    b_e_n1 = (
        jnp.sqrt(jnp.maximum(_safe_div(-y1, y0), 0.0))
        * jnp.power(safe_j, 2.0 / d)
        / jnp.maximum(mu, 1e-20)
    )[..., None] * s_tr_unit + (sq_trace / d)[..., None]
    s_d = jnp.sqrt(jnp.maximum(b_e_n1, 0.0))

    case_a = p_tr > p0
    case_b = (~case_a) & (p_tr < -beta * p0)
    case_c = (~case_a) & (~case_b) & (y < 1.0e-4)
    case_d = (~case_a) & (~case_b) & (~case_c)

    new_s = jnp.where(
        case_a[..., None],
        s_a[..., None] * jnp.ones_like(s),
        jnp.where(
            case_b[..., None],
            s_b[..., None] * jnp.ones_like(s),
            jnp.where(case_d[..., None], s_d, s),
        ),
    )
    new_alpha = jnp.where(
        case_a, alpha_a, jnp.where(case_b, alpha_b, jnp.where(case_d, alpha_d, nacc_alpha))
    )
    changed = ~case_c
    f_new = jnp.where(changed[..., None, None], _recompose(u, new_s, v), f)
    return f_new, new_alpha


# ---------------------------------------------------------------------------
# Rankine (tensile softening)
# ---------------------------------------------------------------------------


def rankine_update(params, f, plastic_hardening):
    """Rankine return map. params rows: [mu,lambda,tensile_strength,softening_rate].

    Caps principal Hencky strains at the softened tensile strength; accumulates
    softening into plastic_hardening. Ref: plasticity_rankine.rs `update_particle`.
    """
    mu, lam = params[..., 0], params[..., 1]
    tensile_strength, softening_rate = params[..., 2], params[..., 3]
    d = f.shape[-1]

    u, s, v = svd(f)
    eigv = jnp.log(jnp.maximum(s, 1e-20))  # Hencky strain eigenvalues
    prev_eigv = eigv

    # Sort ascending; work on sorted copy, then scatter back.
    order = jnp.argsort(eigv, axis=-1)
    inv_order = jnp.argsort(order, axis=-1)
    es = jnp.take_along_axis(eigv, order, axis=-1)  # [e3(min) ... e1(max)]
    e_sum = jnp.sum(eigv, axis=-1)
    e1 = es[..., -1]
    # d=3: middle value. d=2: the reference's idx list [0,1,DIM-1]=[0,1,1]
    # makes e2 alias the *smaller* eigenvalue after its sort — es[-2] matches.
    e2 = es[..., -2]
    e3 = es[..., 0]

    soft = tensile_strength - (plastic_hardening - 1.0)

    # Case 0: elastic (no projection).
    case0 = lam * e_sum + 2.0 * mu * e1 <= soft

    # Case 1: cap the largest eigenvalue.
    cond1 = (2.0 * mu + lam) * e2 + lam * (e_sum - e1) <= soft
    new_e1_c1 = (soft - lam * (e_sum - e1)) / (2.0 * mu + lam)

    if d == 3:
        # Case 2: cap the two largest.
        cond2 = (2.0 * mu + 3.0 * lam) * e3 <= soft
        new_e12_c2 = (soft - lam * (e_sum - e1 - e2)) / (2.0 * mu + 2.0 * lam)
    else:
        cond2 = jnp.zeros_like(case0)
        new_e12_c2 = jnp.zeros_like(e1)

    # Case 3: uniform cap.
    new_e_c3 = soft / (2.0 * mu + 3.0 * lam)

    es_c1 = es.at[..., -1].set(new_e1_c1)
    if d == 3:
        es_c2 = es.at[..., -1].set(new_e12_c2).at[..., -2].set(new_e12_c2)
    else:
        es_c2 = es
    es_c3 = jnp.broadcast_to(new_e_c3[..., None], es.shape)

    es_new = jnp.where(
        case0[..., None],
        es,
        jnp.where(
            cond1[..., None], es_c1, jnp.where(cond2[..., None], es_c2, es_c3)
        ),
    )
    eigv_new = jnp.take_along_axis(es_new, inv_order, axis=-1)

    delta = prev_eigv - eigv_new
    dh = softening_rate * jnp.sqrt(jnp.sum(delta * delta, axis=-1))
    new_hardening = jnp.where(case0, plastic_hardening, plastic_hardening + dh)
    new_hardening = jnp.minimum(new_hardening, tensile_strength)

    f_proj = _recompose(u, jnp.exp(eigv_new), v)
    f_new = jnp.where(case0[..., None, None], f, f_proj)
    return f_new, new_hardening


# ---------------------------------------------------------------------------
# Snow
# ---------------------------------------------------------------------------


def snow_update(params, f, elastic_hardening, plastic_def_det):
    """Snow clamp. params rows: [min_epsilon, max_epsilon, hardening_coeff].

    Clamps singular values to [1-θc, 1+θs] and applies exponential hardening
    e^(ξ(1-J_p)). Ref: plasticity_snow.rs `update_particle`.
    """
    min_eps, max_eps, hard_coeff = params[..., 0], params[..., 1], params[..., 2]

    u, s, v = svd(f)
    new_s = jnp.clip(
        s, (1.0 - min_eps)[..., None], (1.0 + max_eps)[..., None]
    )
    new_plastic_def_det = plastic_def_det * _safe_div(
        jnp.prod(s, axis=-1), jnp.prod(new_s, axis=-1)
    )
    new_elastic_hardening = jnp.exp(hard_coeff * (1.0 - new_plastic_def_det))
    f_new = _recompose(u, new_s, v)
    return f_new, new_elastic_hardening, new_plastic_def_det
