"""Batched, branch-free 2x2 / 3x3 SVD for MPM constitutive models.

This is the numerics hot spot of the whole framework: every elastic particle
runs one SVD per substep for stress (corotated split) and another for the
plastic return map (Drucker-Prager / NACC / Rankine / Snow all operate on
singular values — ref: sparkl `src_core/dynamics/models/plasticity_*.rs`).

Semantics match nalgebra's `svd_unordered` as used by the reference:
  * singular values are non-negative (reflections are pushed into U),
  * values are NOT sorted in any particular order guaranteed to callers
    (all reference return maps are order-independent; Rankine sorts itself),
  * recompose(U, s, V) = U @ diag(s) @ V^T reproduces the input.

Everything is pure jnp on [..., d, d] arrays — usable under vmap/jit and
inside Pallas kernel bodies (no lax.linalg, no LAPACK custom calls).

Algorithms:
  2x2 — polar decomposition (closed form) + closed-form symmetric eigen.
  3x3 — cyclic Jacobi diagonalization of F^T F (fixed sweep count, branchless
        rotations) followed by robust construction of U with orthonormal
        fallbacks for (near-)singular F.
"""

import jax
import jax.numpy as jnp

# Sweeps x 3 rotations (sqrt-only algebraic Givens). Measured convergence:
# on deformation-gradient-like inputs (I + 0.05N through 2N extremes, f32)
# max |sigma - sigma_ref| and reconstruction error hit the f32 floor at 3
# sweeps and do not improve through 7; 4 keeps one sweep of margin for
# pathological inputs at ~40% less Jacobi work than the previous 7.
_JACOBI_SWEEPS = 4


def svd2x2(f):
    """SVD of [..., 2, 2] matrices. Returns (u, s, v) with f = u @ diag(s) @ v^T.

    s >= 0 always; det(u)*det(v) = sign(det f).
    """
    u, s, v = svd2x2_c([[f[..., 0, 0], f[..., 0, 1]], [f[..., 1, 0], f[..., 1, 1]]])
    return _pack2(u), jnp.stack(s, axis=-1), _pack2(v)


def _pack2(rows):
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def svd2x2_c(f):
    """Component-wise SVD core on a nested-list 2x2 matrix (same math as
    svd2x2; usable inside Pallas kernels). Returns (u, s, v) as nested
    lists / a list of 2 singular values."""
    a, b = f[0][0], f[0][1]
    c, d = f[1][0], f[1][1]

    # Polar decomposition F = R S with R a rotation (closed form, 2x2).
    x = a + d
    y = c - b
    r = jnp.sqrt(x * x + y * y)
    ok = r > 1e-20
    cr = jnp.where(ok, x / jnp.where(ok, r, 1.0), 1.0)
    sr = jnp.where(ok, y / jnp.where(ok, r, 1.0), 0.0)
    # S = R^T F (symmetric).
    s00 = cr * a + sr * c
    s01 = cr * b + sr * d
    s11 = -sr * b + cr * d

    # Symmetric eigendecomposition of S: S = G diag(l) G^T.
    # Algebraic Givens (see svd3x3.rotate): sqrt-only, no trig.
    diff = s00 - s11
    denom_ok = jnp.abs(s01) > 1e-30
    tau = diff / jnp.where(denom_ok, 2.0 * s01, 1.0)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)
    t = jnp.where(denom_ok, t, 0.0)
    ct = jax.lax.rsqrt(1.0 + t * t)
    st = t * ct
    l0 = ct * ct * s00 + 2.0 * ct * st * s01 + st * st * s11
    l1 = st * st * s00 - 2.0 * ct * st * s01 + ct * ct * s11

    # V = G ; U = R G ; sigma = l (may be negative iff det F < 0 -> flip into U).
    v00, v01 = ct, -st
    v10, v11 = st, ct
    u00 = cr * v00 - sr * v10
    u01 = cr * v01 - sr * v11
    u10 = sr * v00 + cr * v10
    u11 = sr * v01 + cr * v11

    sign0 = jnp.where(l0 < 0.0, -1.0, 1.0)
    sign1 = jnp.where(l1 < 0.0, -1.0, 1.0)
    s0 = l0 * sign0
    s1 = l1 * sign1
    u00 = u00 * sign0
    u10 = u10 * sign0
    u01 = u01 * sign1
    u11 = u11 * sign1

    return [[u00, u01], [u10, u11]], [s0, s1], [[v00, v01], [v10, v11]]


def svd3x3(f):
    """SVD of [..., 3, 3] matrices. Returns (u, s, v) with f = u @ diag(s) @ v^T.

    s >= 0, sorted descending; det(u)*det(v) = sign(det f). Robust to
    rank-deficient and inverted (det < 0) inputs.

    Fully component-wise (scalar arrays throughout): no [.., 3, 3] einsums or
    .at[] index updates, which XLA:TPU lowers to catastrophically slow
    scatters/layout shuffles in a batched setting (measured ~200x slower than
    this formulation at 50k particles).
    """
    fc = [[f[..., i, j] for j in range(3)] for i in range(3)]
    u, s, v = svd3x3_c(fc)
    stack = lambda rows: jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )
    return stack(u), jnp.stack(s, axis=-1), stack(v)


def svd3x3_c(f):
    """Component-wise SVD core on a nested-list 3x3 matrix (same math as
    svd3x3; usable inside Pallas kernels)."""
    f00, f01, f02 = f[0][0], f[0][1], f[0][2]
    f10, f11, f12 = f[1][0], f[1][1], f[1][2]
    f20, f21, f22 = f[2][0], f[2][1], f[2][2]

    # A = F^T F (symmetric): 6 unique components.
    a00 = f00 * f00 + f10 * f10 + f20 * f20
    a11 = f01 * f01 + f11 * f11 + f21 * f21
    a22 = f02 * f02 + f12 * f12 + f22 * f22
    a01 = f00 * f01 + f10 * f11 + f20 * f21
    a02 = f00 * f02 + f10 * f12 + f20 * f22
    a12 = f01 * f02 + f11 * f12 + f21 * f22

    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(a00), jnp.abs(a11)), jnp.abs(a22)), 1e-30
    )
    inv_scale = 1.0 / scale
    a00, a11, a22 = a00 * inv_scale, a11 * inv_scale, a22 * inv_scale
    a01, a02, a12 = a01 * inv_scale, a02 * inv_scale, a12 * inv_scale

    one = jnp.ones_like(a00)
    zero = jnp.zeros_like(a00)

    def rotate(a, v, p, q):
        r = 3 - p - q  # the untouched index
        app, aqq, apq = a[p][p], a[q][q], a[p][q]
        # Algebraic Givens (Rutishauser): zeroes a_pq with only sqrt —
        # atan2/sin/cos here cost ~60 transcendentals per SVD and made the
        # particle update transcendental-bound on the VPU.
        diff = app - aqq
        denom_ok = jnp.abs(apq) > 1e-30
        tau = diff / jnp.where(denom_ok, 2.0 * apq, 1.0)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        # sign(0) = 0 would zero t for tau == 0 (a valid 45-degree rotation);
        # force +1 there.
        t = jnp.where(tau == 0.0, 1.0, t)
        t = jnp.where(denom_ok, t, 0.0)
        c = jax.lax.rsqrt(1.0 + t * t)
        s = t * c
        cc, ss, cs = c * c, s * s, c * s
        new_pp = cc * app + 2.0 * cs * apq + ss * aqq
        new_qq = ss * app - 2.0 * cs * apq + cc * aqq
        arp, arq = a[r][p], a[r][q]
        new_rp = c * arp + s * arq
        new_rq = -s * arp + c * arq
        a[p][p], a[q][q] = new_pp, new_qq
        a[p][q] = jnp.zeros_like(apq)
        a[q][p] = a[p][q]
        a[r][p] = new_rp
        a[p][r] = new_rp
        a[r][q] = new_rq
        a[q][r] = new_rq
        for i in range(3):
            vip, viq = v[i][p], v[i][q]
            v[i][p] = c * vip + s * viq
            v[i][q] = -s * vip + c * viq
        return a, v

    # fori_loop over sweeps keeps the traced graph ~_JACOBI_SWEEPS times
    # smaller — a fully unrolled component graph sends XLA:CPU's fusion
    # passes into multi-minute compiles (TPU compiles either form fine).
    def sweep(_, carry):
        (a00, a01, a02, a11, a12, a22, v00, v01, v02, v10, v11, v12, v20, v21, v22) = carry
        a = [[a00, a01, a02], [a01, a11, a12], [a02, a12, a22]]
        v = [[v00, v01, v02], [v10, v11, v12], [v20, v21, v22]]
        a, v = rotate(a, v, 0, 1)
        a, v = rotate(a, v, 0, 2)
        a, v = rotate(a, v, 1, 2)
        return (
            a[0][0], a[0][1], a[0][2], a[1][1], a[1][2], a[2][2],
            v[0][0], v[0][1], v[0][2],
            v[1][0], v[1][1], v[1][2],
            v[2][0], v[2][1], v[2][2],
        )

    carry = (
        a00, a01, a02, a11, a12, a22,
        one, zero, zero, zero, one, zero, zero, zero, one,
    )
    carry = jax.lax.fori_loop(0, _JACOBI_SWEEPS, sweep, carry)
    (a00, a01, a02, a11, a12, a22, v00, v01, v02, v10, v11, v12, v20, v21, v22) = carry
    a = [[a00, a01, a02], [a01, a11, a12], [a02, a12, a22]]
    v = [[v00, v01, v02], [v10, v11, v12], [v20, v21, v22]]

    sig2 = [jnp.maximum(a[0][0], 0.0) * scale,
            jnp.maximum(a[1][1], 0.0) * scale,
            jnp.maximum(a[2][2], 0.0) * scale]

    # Sort the 3 eigenpairs descending with a 3-element sorting network
    # (component-wise swaps — no gathers).
    cols = [[v[0][k], v[1][k], v[2][k]] for k in range(3)]

    def cswap(k0, k1):
        swap = sig2[k0] < sig2[k1]
        s0 = jnp.where(swap, sig2[k1], sig2[k0])
        s1 = jnp.where(swap, sig2[k0], sig2[k1])
        sig2[k0], sig2[k1] = s0, s1
        for i in range(3):
            c0 = jnp.where(swap, cols[k1][i], cols[k0][i])
            c1 = jnp.where(swap, cols[k0][i], cols[k1][i])
            cols[k0][i], cols[k1][i] = c0, c1

    cswap(0, 1)
    cswap(0, 2)
    cswap(1, 2)

    s0 = jnp.sqrt(sig2[0])
    s1 = jnp.sqrt(sig2[1])
    s2 = jnp.sqrt(sig2[2])

    # fv_k = F @ v_k, componentwise.
    def matvec(x0, x1, x2):
        return (
            f00 * x0 + f01 * x1 + f02 * x2,
            f10 * x0 + f11 * x1 + f12 * x2,
            f20 * x0 + f21 * x1 + f22 * x2,
        )

    fv0 = matvec(*cols[0])
    fv1 = matvec(*cols[1])
    fv2 = matvec(*cols[2])
    eps = 1e-12

    def norm3(x):
        return jnp.sqrt(x[0] * x[0] + x[1] * x[1] + x[2] * x[2])

    def scale3(x, k):
        return (x[0] * k, x[1] * k, x[2] * k)

    def normalize3(x):
        n = norm3(x)
        good = n > eps
        inv = jnp.where(good, 1.0 / jnp.where(good, n, 1.0), 0.0)
        return scale3(x, inv), n, good

    u0, n0, good0 = normalize3(fv0)
    # Fallback for F ~ 0: e0.
    u0 = (
        jnp.where(good0, u0[0], 1.0),
        jnp.where(good0, u0[1], 0.0),
        jnp.where(good0, u0[2], 0.0),
    )

    dot01 = u0[0] * fv1[0] + u0[1] * fv1[1] + u0[2] * fv1[2]
    u1r = (fv1[0] - dot01 * u0[0], fv1[1] - dot01 * u0[1], fv1[2] - dot01 * u0[2])
    u1, n1, good1 = normalize3(u1r)

    def cross3(x, y):
        return (
            x[1] * y[2] - x[2] * y[1],
            x[2] * y[0] - x[0] * y[2],
            x[0] * y[1] - x[1] * y[0],
        )

    # Fallback: unit vector orthogonal to u0 via cross with the least-aligned
    # basis axis (branch-free: pick e_k with minimal |u0_k|).
    au = (jnp.abs(u0[0]), jnp.abs(u0[1]), jnp.abs(u0[2]))
    pick0 = (au[0] <= au[1]) & (au[0] <= au[2])
    pick1 = (~pick0) & (au[1] <= au[2])
    e = (
        jnp.where(pick0, 1.0, 0.0),
        jnp.where(pick1, 1.0, 0.0),
        jnp.where(pick0 | pick1, 0.0, 1.0),
    )
    fb = cross3(u0, e)
    fb, _, _ = normalize3(fb)
    u1 = (
        jnp.where(good1, u1[0], fb[0]),
        jnp.where(good1, u1[1], fb[1]),
        jnp.where(good1, u1[2], fb[2]),
    )

    u2d = cross3(u0, u1)
    sgn = u2d[0] * fv2[0] + u2d[1] * fv2[1] + u2d[2] * fv2[2]
    sgn = jnp.where(sgn < 0.0, -1.0, 1.0)
    u2 = scale3(u2d, sgn)

    def cols_to_rows(c0, c1, c2):
        return [[c0[i], c1[i], c2[i]] for i in range(3)]

    return (
        cols_to_rows(u0, u1, u2),
        [s0, s1, s2],
        cols_to_rows(cols[0], cols[1], cols[2]),
    )


def svd_c(f):
    """Component-core dispatch on nested-list size (2 or 3)."""
    if len(f) == 2:
        return svd2x2_c(f)
    return svd3x3_c(f)


def svd_values_c(f):
    """Singular values only (unordered), skipping the U/V construction —
    ~2x cheaper than svd_c; used where only invariants of F are needed
    (corotated pos-energy)."""
    d = len(f)
    if d == 2:
        _, s, _ = svd2x2_c(f)  # 2x2 closed form is already cheap
        return s
    # A = F^T F (symmetric), Jacobi eigenvalues, sqrt.
    a = [
        [sum(f[k][i] * f[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]
    lam = sym_eigvals3x3_c(a)
    return [jnp.sqrt(jnp.maximum(x, 0.0)) for x in lam]


def sym_eigvals2x2_c(m):
    """Eigenvalues of a symmetric 2x2 nested-list matrix (closed form)."""
    a, b, c = m[0][0], m[0][1], m[1][1]
    mean = 0.5 * (a + c)
    r = jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b * b, 0.0))
    return [mean - r, mean + r]


def sym_eigvals3x3_c(m):
    """Eigenvalues of a symmetric 3x3 nested-list matrix via cyclic Jacobi.

    Unordered, possibly negative (unlike svd singular values). Used by the
    maximum-stress failure model inside the fused kernels, where the trig
    closed form (arccos) of math/linalg.py is unavailable.
    """
    a00, a11, a22 = m[0][0], m[1][1], m[2][2]
    a01, a02, a12 = m[0][1], m[0][2], m[1][2]
    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(a00), jnp.abs(a11)), jnp.abs(a22)), 1e-30
    )
    inv = 1.0 / scale
    a00, a11, a22 = a00 * inv, a11 * inv, a22 * inv
    a01, a02, a12 = a01 * inv, a02 * inv, a12 * inv

    def rot(a, p, q):
        r = 3 - p - q
        app, aqq, apq = a[p][p], a[q][q], a[p][q]
        diff = app - aqq
        denom_ok = jnp.abs(apq) > 1e-30
        tau = diff / jnp.where(denom_ok, 2.0 * apq, 1.0)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0.0, 1.0, t)
        t = jnp.where(denom_ok, t, 0.0)
        c = jax.lax.rsqrt(1.0 + t * t)
        s = t * c
        cc, ss, cs = c * c, s * s, c * s
        new_pp = cc * app + 2.0 * cs * apq + ss * aqq
        new_qq = ss * app - 2.0 * cs * apq + cc * aqq
        arp, arq = a[r][p], a[r][q]
        new_rp = c * arp + s * arq
        new_rq = -s * arp + c * arq
        a[p][p], a[q][q] = new_pp, new_qq
        a[p][q] = jnp.zeros_like(apq)
        a[q][p] = a[p][q]
        a[r][p] = a[p][r] = new_rp
        a[r][q] = a[q][r] = new_rq
        return a

    def sweep(_, carry):
        a00, a01, a02, a11, a12, a22 = carry
        a = [[a00, a01, a02], [a01, a11, a12], [a02, a12, a22]]
        a = rot(a, 0, 1)
        a = rot(a, 0, 2)
        a = rot(a, 1, 2)
        return (a[0][0], a[0][1], a[0][2], a[1][1], a[1][2], a[2][2])

    carry = jax.lax.fori_loop(
        0, _JACOBI_SWEEPS, sweep, (a00, a01, a02, a11, a12, a22)
    )
    return [carry[0] * scale, carry[3] * scale, carry[5] * scale]


def svd(f):
    """Dispatch on trailing matrix size (2 or 3)."""
    d = f.shape[-1]
    if d == 2:
        return svd2x2(f)
    if d == 3:
        return svd3x3(f)
    raise ValueError(f"unsupported dim {d}")
