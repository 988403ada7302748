"""Plastic return maps on the singular values of the deformation gradient.

All maps are vectorized and branch-free (where-selects instead of early
returns) so one call handles a whole particle batch. Each returns the
projected deformation gradient plus updated per-particle plastic state.

Every map has a component-wise core (`*_update_c`, nested-list matrices and
unpacked scalar params) that also runs inside the fused Pallas kernels
(sparkl_tpu/fused); the array API wraps it.

Reference semantics:
  * Drucker-Prager (sand) — sparkl
    `src_core/dynamics/models/plasticity_drucker_prager.rs:10-105`
  * NACC (non-associated Cam-Clay) — `plasticity_nacc.rs:12-166`
  * Rankine (tensile softening) — `plasticity_rankine.rs`
  * Snow — `plasticity_snow.rs`
"""

import jax.numpy as jnp

from sparkl_tpu.math import cmat
from sparkl_tpu.math.svd import svd_c

PLASTIC_NONE = 0
DRUCKER_PRAGER = 1
NACC = 2
RANKINE = 3
SNOW = 4
PLASTIC_CUSTOM_BASE = 16


_safe_div = cmat.safe_div


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
    fc, pdd, ph, lvg = drucker_prager_update_c(
        [params[..., k] for k in range(8)],
        phase,
        cmat.unpack(f),
        plastic_def_det,
        plastic_hardening,
        log_vol_gain,
    )
    return cmat.pack(fc), pdd, ph, lvg


def drucker_prager_update_c(
    params, phase, f, plastic_def_det, plastic_hardening, log_vol_gain
):
    """Component-wise core. params = list of 8 scalars."""
    out = drucker_prager_update_with_svd_c(
        params, phase, f, plastic_def_det, plastic_hardening, log_vol_gain,
        svd_c(f),
    )
    return out[:4]


def drucker_prager_project_s_c(
    params, phase, s, plastic_def_det, plastic_hardening, log_vol_gain
):
    """Scalar core of the DP return map: acts on the singular values only
    (no matrices). Returns (s_sel, new_pdd, new_ph, new_lvg, applied) where
    s_sel = projected singular values where `applied`, else s. Shared by the
    SVD recompose path (drucker_prager_update_with_svd_c) and the
    eigenvector-free fused-kernel path (F' = F·p(FᵀF) with node values
    s_sel/s — see math/svd.spd_poly3_prepare_c)."""
    h0, h1, h2, h3, lam, mu, only_when_failed, vol_corr = params
    d = len(s)
    alpha = drucker_prager_alpha(h0, h1, h2, h3, plastic_hardening)

    strain = [jnp.log(jnp.maximum(si, 1e-20)) + log_vol_gain / d for si in s]
    strain_trace = sum(strain)
    dev = [e - strain_trace / d for e in strain]
    dev_norm = jnp.sqrt(sum(e * e for e in dev))

    # Case A: zero deviatoric strain or expanding trace -> project to identity.
    case_a = (dev_norm == 0.0) | (strain_trace > 0.0)
    dq_a = jnp.sqrt(sum(e * e for e in strain))

    # Case B: inside yield surface (gamma <= 0) -> no change.
    gamma = dev_norm + (d * lam + 2.0 * mu) / (2.0 * mu) * strain_trace * alpha
    case_b = (~case_a) & (gamma <= 0.0)

    # Case C: project onto the cone.
    s_c = [
        jnp.exp(e - gamma * _safe_div(dv, dev_norm)) for e, dv in zip(strain, dev)
    ]

    one = jnp.ones_like(s[0])
    new_s = [jnp.where(case_a, one, sc) for sc in s_c]
    dq = jnp.where(case_a, dq_a, gamma)

    applied = ~case_b
    gate = (only_when_failed == 0.0) | (phase == 0.0)
    applied = applied & gate

    prev_det = s[0]
    new_det0 = new_s[0]
    for k in range(1, d):
        prev_det = prev_det * s[k]
        new_det0 = new_det0 * new_s[k]
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
    s_sel = [jnp.where(applied, ns, si) for ns, si in zip(new_s, s)]
    return s_sel, new_plastic_def_det, new_hardening, new_log_vol_gain, applied


def drucker_prager_update_with_svd_c(
    params, phase, f, plastic_def_det, plastic_hardening, log_vol_gain, usv
):
    """drucker_prager_update_c with a caller-supplied SVD of f. Additionally
    returns the projected singular values s_sel (f_new = U diag(s_sel) Vᵀ
    exactly, since the return map only rescales singular values) — lets the
    caller carry a valid SVD of the projected F without re-decomposing."""
    u, s, v = usv
    s_sel, new_pdd, new_ph, new_lvg, applied = drucker_prager_project_s_c(
        params, phase, s, plastic_def_det, plastic_hardening, log_vol_gain
    )
    f_proj = cmat.recompose_c(u, s_sel, v)
    f_new = cmat.where_mat(applied, f_proj, f)
    return f_new, new_pdd, new_ph, new_lvg, s_sel


# ---------------------------------------------------------------------------
# NACC
# ---------------------------------------------------------------------------


def nacc_update(params, f, nacc_alpha):
    """NACC return map. params rows: [mu,kappa,hardening_enabled,xi,beta,M].

    Ref: plasticity_nacc.rs `project_deformation_gradient`.
    """
    fc, na = nacc_update_c(
        [params[..., k] for k in range(6)], cmat.unpack(f), nacc_alpha
    )
    return cmat.pack(fc), na


def nacc_update_c(params, f, nacc_alpha):
    """Component-wise core. params = list of 6 scalars."""
    mu, kappa, hardening_flag, xi, beta, m = params
    hardening_enabled = hardening_flag != 0.0
    d = float(len(f))

    u, s, v = svd_c(f)
    sq = [si * si for si in s]
    sq_trace = sum(sq)

    p0 = kappa * (1.0e-5 + cmat.sinh_c(xi * jnp.maximum(-nacc_alpha, 0.0)))
    j_e_tr = s[0]
    for si in s[1:]:
        j_e_tr = j_e_tr * si
    safe_j = jnp.maximum(j_e_tr, 1e-20)
    s_tr_coeff = mu * cmat.pow_pos(safe_j, -2.0 / d)
    s_tr = [s_tr_coeff * (q - sq_trace / d) for q in sq]
    psi_kappa = kappa / 2.0 * (j_e_tr - 1.0 / safe_j)
    p_tr = -psi_kappa * j_e_tr

    # Case A: p_tr > p0 -> max tip of the yield surface.
    j_a = jnp.sqrt(jnp.maximum(-2.0 * p0 / kappa + 1.0, 0.0))
    s_a = cmat.pow_pos(jnp.maximum(j_a, 1e-20), 1.0 / d)
    alpha_a = nacc_alpha + jnp.where(
        hardening_enabled, jnp.log(safe_j / jnp.maximum(j_a, 1e-20)), 0.0
    )

    # Case B: p_tr < -beta p0 -> min tip.
    j_b = jnp.sqrt(2.0 * beta * p0 / kappa + 1.0)
    s_b = cmat.pow_pos(jnp.maximum(j_b, 1e-20), 1.0 / d)
    alpha_b = nacc_alpha + jnp.where(
        hardening_enabled, jnp.log(safe_j / jnp.maximum(j_b, 1e-20)), 0.0
    )

    # Yield test.
    y0 = (1.0 + 2.0 * beta) * ((6.0 - d) / 2.0)
    y1 = m * m * (p_tr + beta * p0) * (p_tr - p0)
    s_tr_norm_sq = sum(x * x for x in s_tr)
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
    b_coeff = (
        jnp.sqrt(jnp.maximum(_safe_div(-y1, y0), 0.0))
        * cmat.pow_pos(safe_j, 2.0 / d)
        / jnp.maximum(mu, 1e-20)
    )
    s_d = [
        jnp.sqrt(
            jnp.maximum(b_coeff * _safe_div(x, s_tr_norm) + sq_trace / d, 0.0)
        )
        for x in s_tr
    ]

    case_a = p_tr > p0
    case_b = (~case_a) & (p_tr < -beta * p0)
    case_c = (~case_a) & (~case_b) & (y < 1.0e-4)
    case_d = (~case_a) & (~case_b) & (~case_c)

    new_s = [
        jnp.where(case_a, s_a, jnp.where(case_b, s_b, jnp.where(case_d, sd, si)))
        for sd, si in zip(s_d, s)
    ]
    new_alpha = jnp.where(
        case_a, alpha_a, jnp.where(case_b, alpha_b, jnp.where(case_d, alpha_d, nacc_alpha))
    )
    changed = ~case_c
    f_new = cmat.where_mat(changed, cmat.recompose_c(u, new_s, v), f)
    return f_new, new_alpha


# ---------------------------------------------------------------------------
# Rankine (tensile softening)
# ---------------------------------------------------------------------------


def rankine_update(params, f, plastic_hardening):
    """Rankine return map. params rows: [mu,lambda,tensile_strength,softening_rate].

    Caps principal Hencky strains at the softened tensile strength; accumulates
    softening into plastic_hardening. Ref: plasticity_rankine.rs `update_particle`.
    """
    fc, ph = rankine_update_c(
        [params[..., k] for k in range(4)], cmat.unpack(f), plastic_hardening
    )
    return cmat.pack(fc), ph


def rankine_update_c(params, f, plastic_hardening):
    """Component-wise core. Ascending sort + inverse scatter are done with
    comparison networks (no argsort/take_along_axis: tiny-axis gathers are
    pathological on TPU and unsupported in kernels)."""
    mu, lam, tensile_strength, softening_rate = params
    d = len(f)

    u, s, v = svd_c(f)
    eigv = [jnp.log(jnp.maximum(si, 1e-20)) for si in s]  # Hencky eigenvalues

    # Stable ascending rank of each component (ties keep original order —
    # replicates jnp.argsort used by the array formulation).
    def rank_of(i):
        r = jnp.zeros_like(eigv[0], dtype=jnp.int32)
        for jj in range(d):
            if jj == i:
                continue
            less = (eigv[jj] < eigv[i]) | ((eigv[jj] == eigv[i]) & (jj < i))
            r = r + less.astype(jnp.int32)
        return r

    ranks = [rank_of(i) for i in range(d)]
    # Sorted values es[r] (ascending), via masked sums over components.
    es = []
    for r in range(d):
        val = jnp.zeros_like(eigv[0])
        for i in range(d):
            val = val + jnp.where(ranks[i] == r, eigv[i], 0.0)
        es.append(val)

    e_sum = sum(eigv)
    e1 = es[-1]
    # d=3: middle value. d=2: the reference's idx list [0,1,DIM-1]=[0,1,1]
    # makes e2 alias the *smaller* eigenvalue after its sort — es[-2] matches.
    e2 = es[-2]
    e3 = es[0]

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

    # Sorted new values per case.
    es_new = []
    for r in range(d):
        base = es[r]
        c1 = new_e1_c1 if r == d - 1 else base
        if d == 3:
            c2 = new_e12_c2 if r >= d - 2 else base
        else:
            c2 = base
        val = jnp.where(
            case0, base, jnp.where(cond1, c1, jnp.where(cond2, c2, new_e_c3))
        )
        es_new.append(val)

    # Scatter back: component i takes es_new[ranks[i]].
    eigv_new = []
    for i in range(d):
        val = jnp.zeros_like(eigv[0])
        for r in range(d):
            val = val + jnp.where(ranks[i] == r, es_new[r], 0.0)
        eigv_new.append(val)

    delta_sq = sum((a - b) ** 2 for a, b in zip(eigv, eigv_new))
    dh = softening_rate * jnp.sqrt(delta_sq)
    new_hardening = jnp.where(case0, plastic_hardening, plastic_hardening + dh)
    new_hardening = jnp.minimum(new_hardening, tensile_strength)

    f_proj = cmat.recompose_c(u, [jnp.exp(e) for e in eigv_new], v)
    f_new = cmat.where_mat(case0, f, f_proj)
    return f_new, new_hardening


# ---------------------------------------------------------------------------
# Snow
# ---------------------------------------------------------------------------


def snow_update(params, f, elastic_hardening, plastic_def_det):
    """Snow clamp. params rows: [min_epsilon, max_epsilon, hardening_coeff].

    Clamps singular values to [1-θc, 1+θs] and applies exponential hardening
    e^(ξ(1-J_p)). Ref: plasticity_snow.rs `update_particle`.
    """
    fc, eh, pdd = snow_update_c(
        [params[..., k] for k in range(3)],
        cmat.unpack(f),
        elastic_hardening,
        plastic_def_det,
    )
    return cmat.pack(fc), eh, pdd


def snow_update_c(params, f, elastic_hardening, plastic_def_det):
    min_eps, max_eps, hard_coeff = params
    u, s, v = svd_c(f)
    new_s = [jnp.clip(si, 1.0 - min_eps, 1.0 + max_eps) for si in s]
    prod_s = s[0]
    prod_new = new_s[0]
    for k in range(1, len(s)):
        prod_s = prod_s * s[k]
        prod_new = prod_new * new_s[k]
    new_plastic_def_det = plastic_def_det * _safe_div(prod_s, prod_new)
    new_elastic_hardening = jnp.exp(hard_coeff * (1.0 - new_plastic_def_det))
    f_new = cmat.recompose_c(u, new_s, v)
    return f_new, new_elastic_hardening, new_plastic_def_det
