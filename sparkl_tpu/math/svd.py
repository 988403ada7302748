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

# 3x3 eigensolver backend for svd3x3_c: "jacobi" (iterative, most accurate)
# or "cardano" (closed-form trig eigenvalues + cross-product eigenvectors —
# ~2x fewer VPU ops; the in-kernel SVD is the dominant per-particle cost).
# Default measured round 4 (scripts/measure_round4.log): cardano cuts
# kernel B 4.67 -> 2.97 ms @500k and the sand3@1M bench 59.4 -> 67.1 M
# pups/s, with accuracy green on the fused-vs-dense and oracle suites.
# Switch with set_eig3_method; per-call override via svd3x3_c(f, method=...);
# SPARKL_EIG3=jacobi restores the iterative backend.
_EIG3_METHOD = __import__("os").environ.get("SPARKL_EIG3", "cardano")
if _EIG3_METHOD not in ("jacobi", "cardano"):
    raise ValueError(f"SPARKL_EIG3 must be jacobi|cardano, got {_EIG3_METHOD}")


def set_eig3_method(method: str):
    """Select the 3x3 symmetric-eigensolver backend ("jacobi"/"cardano")
    used by svd3x3 / svd_c. Returns the previous setting."""
    global _EIG3_METHOD
    if method not in ("jacobi", "cardano"):
        raise ValueError(method)
    prev = _EIG3_METHOD
    _EIG3_METHOD = method
    return prev


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


def _cos_acos3(r):
    """cos(acos(r)/3) for r in [-1, 1] WITHOUT acos (Mosaic lowers cos/sin
    but not acos/atan): the value is the root of 4x^3 - 3x = r in [1/2, 1] —
    a degree-4 polynomial seed in u = sqrt(1+r) (smooth through the r = -1
    branch point) + 2 clamped Newton steps. f32-exact except at the double
    root r = -1 itself (~2e-5, the clustered-eigenvalue case the invariant
    refinement absorbs)."""
    u = jnp.sqrt(jnp.maximum(r + 1.0, 0.0))
    x = 0.500019159 + u * (
        0.407814278 + u * (-0.0531768362 + u * (0.0135525949 + u * -0.00218724162))
    )
    x = jnp.clip(x, 0.5, 1.0)
    for _ in range(2):
        g = 4.0 * x * x * x - 3.0 * x - r
        gp = jnp.maximum(12.0 * x * x - 3.0, 0.075)
        x = jnp.clip(x - g / gp, 0.5, 1.0)
    return x


def _cardano_trig_vals(a00, a01, a02, a11, a12, a22):
    """Raw trigonometric-Cardano eigenvalues of a symmetric 3x3 (components
    already scale-normalized), descending. No PSD assumptions and no
    invariant refinement: valid for ANY symmetric matrix (e.g. a Kirchhoff
    stress with negative principal values). The small eigenvalues lose f32
    accuracy when the spectrum spans orders of magnitude (they come out as
    differences of O(trace) quantities) — callers that need them exact on a
    PSD matrix apply the refinement in _sym_eig3x3_cardano."""
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (
        a01 * a01 + a02 * a02 + a12 * a12
    )
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    p_ok = p > 1e-30
    pinv = jnp.where(p_ok, 1.0 / jnp.where(p_ok, p, 1.0), 0.0)
    # r = det(B)/2 with B = (A - qI)/p, clamped into acos range.
    c00, c11, c22 = b00 * pinv, b11 * pinv, b22 * pinv
    c01, c02, c12 = a01 * pinv, a02 * pinv, a12 * pinv
    detb = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(0.5 * detb, -1.0, 1.0)
    cphi = _cos_acos3(r)
    sphi = jnp.sqrt(jnp.maximum(1.0 - cphi * cphi, 0.0))  # phi in [0, pi/3]
    l0 = q + 2.0 * p * cphi
    # cos(phi + 2pi/3) = -cphi/2 - sphi*sqrt(3)/2
    l2 = q + 2.0 * p * (-0.5 * cphi - 0.8660254037844386 * sphi)
    l1 = 3.0 * q - l0 - l2
    return l0, l1, l2


def _cardano_refined_vals(a00, a01, a02, a11, a12, a22):
    """Descending eigenvalues of a PSD symmetric 3x3 (components already
    scale-normalized): trigonometric Cardano + invariant refinement.

    The trig formula loses the SMALL eigenvalues to f32 cancellation when
    the spectrum spans orders of magnitude (they come out as differences of
    O(q) quantities). l0 is always accurate; recover l2 from the determinant
    (l0*l1*l2 = det A, a well-conditioned product) and l1 from the second
    invariant (l0*l1 + l0*l2 + l1*l2 = I2), then re-refine l2. Skipped where
    denominators are degenerate."""
    l0, l1, l2 = _cardano_trig_vals(a00, a01, a02, a11, a12, a22)

    i2 = (
        a00 * a11 - a01 * a01
        + a00 * a22 - a02 * a02
        + a11 * a22 - a12 * a12
    )
    i3 = (
        a00 * (a11 * a22 - a12 * a12)
        - a01 * (a01 * a22 - a12 * a02)
        + a02 * (a01 * a12 - a11 * a02)
    )
    tiny = 1e-30

    def _refine_l2(l1v):
        den = l0 * l1v
        ok = den > tiny
        out = jnp.clip(i3 / jnp.where(ok, den, 1.0), 0.0, l1v)
        return jnp.where(ok, out, jnp.maximum(l2, 0.0))

    l2r = _refine_l2(jnp.maximum(l1, 0.0))
    den1 = l0 + l2r
    ok1 = den1 > tiny
    l1r = jnp.clip(
        (i2 - l0 * l2r) / jnp.where(ok1, den1, 1.0), l2r, l0
    )
    l1 = jnp.where(ok1, l1r, jnp.maximum(l1, 0.0))
    l2 = _refine_l2(l1)
    return l0, l1, l2


def spd_poly3_prepare_c(f, tau=1e-3):
    """Eigenvector-free symmetric-function machinery for a nested-list 3x3 F.

    Computes C = FᵀF (scale-normalized), its refined descending eigenvalues
    λ₀ ≥ λ₁ ≥ λ₂, and returns ``(s, apply)`` where ``s`` are F's singular
    values (identical to svd3x3_c's cardano-path values) and ``apply(w)``
    evaluates V·diag(w)·Vᵀ — the unique quadratic matrix polynomial in C
    interpolating node values w_i at λ_i — WITHOUT ever constructing the
    eigenvector columns:

        p(C) = w₀·I + w[01]·(C−λ₀I) + w[012]·(C−λ₀I)(C−λ₁I)

    (Newton form; exact at the three nodes, which is all a matrix function
    of C needs.) Every U/V consumer in the fused kernel B factors through
    this: the DP return map is F' = F·apply(new_s/s) and the corotated
    stress deviator is F·apply(w(s)/s)·Fᵀ — so the expensive eigenvector
    construction (cross-product null spaces + Gram-Schmidt U, measured
    0.60 + 0.36 ms @852k in scripts/ablate_svd.py) disappears entirely.

    Safeguard: divided-difference denominators are clamped at tau·λ₀. For
    clustered eigenvalues any node function Lipschitz in λ (all uses here)
    then incurs O(tau) relative error instead of f32 cancellation blowup —
    the same subspace-degeneracy argument that makes clustered eigenvectors
    non-unique makes the clamped polynomial equally valid on the cluster.
    When all w_i are equal the result is EXACTLY w·I (dd terms vanish
    identically), so masked-out particles passing w≡1 round-trip F·I = F
    bit-exactly.
    """
    f00, f01, f02 = f[0][0], f[0][1], f[0][2]
    f10, f11, f12 = f[1][0], f[1][1], f[1][2]
    f20, f21, f22 = f[2][0], f[2][1], f[2][2]

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

    l0, l1, l2 = _cardano_refined_vals(a00, a01, a02, a11, a12, a22)
    l0 = jnp.maximum(l0, 0.0)
    s0 = jnp.sqrt(l0 * scale)
    s1 = jnp.sqrt(jnp.maximum(l1, 0.0) * scale)
    s2 = jnp.sqrt(jnp.maximum(l2, 0.0) * scale)
    # The smallest singular value from det(F) instead of the eigenvalues of
    # C = FᵀF: λ₂ = det(C)/(λ₀λ₁) SQUARES the condition number (f32 loses
    # all digits below s₂/s₀ ~ 1e-3), while det(F) = ±s₀s₁s₂ is computed on
    # F itself and stays relatively accurate down to underflow. s₀,s₁ are
    # well-conditioned in λ, so divide det by them. (The svd3x3_c path keeps
    # the λ-based s₂ — its U/V reconstruction never divides by it.)
    detf = (
        f00 * (f11 * f22 - f12 * f21)
        - f01 * (f10 * f22 - f12 * f20)
        + f02 * (f10 * f21 - f11 * f20)
    )
    den = s0 * s1
    det_ok = den > 1e-30
    s2d = jnp.abs(detf) / jnp.where(det_ok, den, 1.0)
    s2 = jnp.where(det_ok, jnp.minimum(s2d, s1), s2)
    s = [s0, s1, s2]

    # Newton basis on the NORMALIZED C (same eigenvectors; better f32
    # conditioning): B1 = C − λ₀I and B2 = B1·(C − λ₁I), symmetric.
    b00, b11, b22 = a00 - l0, a11 - l0, a22 - l0
    c00, c11, c22 = a00 - l1, a11 - l1, a22 - l1
    m00 = b00 * c00 + a01 * a01 + a02 * a02
    m11 = a01 * a01 + b11 * c11 + a12 * a12
    m22 = a02 * a02 + a12 * a12 + b22 * c22
    m01 = b00 * a01 + a01 * c11 + a02 * a12
    m02 = b00 * a02 + a01 * a12 + a02 * c22
    m12 = a01 * a02 + b11 * a12 + a12 * c22

    guard = tau * jnp.maximum(l0, 1e-20)
    den01 = jnp.maximum(l0 - l1, guard)
    den12 = jnp.maximum(l1 - l2, guard)
    den02 = jnp.maximum(l0 - l2, guard)

    def apply(w):
        w0, w1, w2 = w
        dd01 = (w0 - w1) / den01
        dd12 = (w1 - w2) / den12
        dd2 = (dd01 - dd12) / den02
        # Amplification caps: the Newton basis matrices carry irreducible f32
        # rounding ~eps·λ₀ (B1) / ~eps·λ₀² (B2) OUTSIDE the subspace they
        # annihilate exactly in exact arithmetic, so a divided difference of
        # magnitude D leaks ~D·eps noise into the LARGE-eigenvalue directions
        # (whose target values are w₀, w₁). Cap |dd| relative to those
        # targets: leak stays ≲3e-3·max(|w₀|,|w₁|,1) while the cap can only
        # engage when the spectrum spans >4 orders of magnitude AND the node
        # function is 1/s-like on the smallest eigenvalue — an extreme-crush
        # corner where under-reconstructing w₂ is benign (the crushed
        # principal stretch gets partially instead of fully restored,
        # bounded; the next substep re-projects). p(λ₀), p(λ₁) stay exact
        # under a dd2 cap. (λ₀ ∈ [1, 3] after the max-diagonal
        # normalization, absorbed into the constants.)
        cap1 = 5e4 * jnp.maximum(jnp.abs(w0), 1.0)
        cap2 = 2e4 * jnp.maximum(jnp.maximum(jnp.abs(w0), jnp.abs(w1)), 1.0)
        dd01 = jnp.clip(dd01, -cap1, cap1)
        dd2 = jnp.clip(dd2, -cap2, cap2)
        o00 = w0 + dd01 * b00 + dd2 * m00
        o11 = w0 + dd01 * b11 + dd2 * m11
        o22 = w0 + dd01 * b22 + dd2 * m22
        o01 = dd01 * a01 + dd2 * m01
        o02 = dd01 * a02 + dd2 * m02
        o12 = dd01 * a12 + dd2 * m12
        return [[o00, o01, o02], [o01, o11, o12], [o02, o12, o22]]

    return s, apply


def _sym_eig3x3_cardano(a00, a01, a02, a11, a12, a22):
    """Closed-form eigendecomposition of a symmetric 3x3 (components already
    scale-normalized): eigenvalues by the trigonometric Cardano formula,
    eigenvectors by max-norm row cross products of (A - lambda I) anchored at
    the better-separated end of the spectrum (clustered eigenvalues have
    ill-conditioned individual eigenvectors but any orthonormal basis of the
    cluster subspace is equally valid — the Gram-Schmidt fallbacks pick one).
    Returns ([l0, l1, l2] descending, cols = [v0, v1, v2] as 3-tuples)."""
    one = jnp.ones_like(a00)
    zero = jnp.zeros_like(a00)

    l0, l1, l2 = _cardano_refined_vals(a00, a01, a02, a11, a12, a22)

    def row_cross_null(l):
        """Max-norm cross product of rows of (A - l I) — the null direction
        when the matrix has rank 2."""
        m00, m11, m22 = a00 - l, a11 - l, a22 - l
        r0 = (m00, a01, a02)
        r1 = (a01, m11, a12)
        r2 = (a02, a12, m22)

        def cross(x, y):
            return (
                x[1] * y[2] - x[2] * y[1],
                x[2] * y[0] - x[0] * y[2],
                x[0] * y[1] - x[1] * y[0],
            )

        c01_, c02_, c12_ = cross(r0, r1), cross(r0, r2), cross(r1, r2)

        def n2(x):
            return x[0] * x[0] + x[1] * x[1] + x[2] * x[2]

        n01, n02, n12 = n2(c01_), n2(c02_), n2(c12_)
        use02 = n02 > n01
        best = tuple(jnp.where(use02, c02_[i], c01_[i]) for i in range(3))
        bestn = jnp.where(use02, n02, n01)
        use12 = n12 > bestn
        best = tuple(jnp.where(use12, c12_[i], best[i]) for i in range(3))
        bestn = jnp.where(use12, n12, bestn)
        return best, bestn

    cand_t, _ = row_cross_null(l0)
    cand_b, _ = row_cross_null(l2)
    use_top = (l0 - l1) >= (l1 - l2)
    anchor_raw = tuple(jnp.where(use_top, cand_t[i], cand_b[i]) for i in range(3))
    other_raw = tuple(jnp.where(use_top, cand_b[i], cand_t[i]) for i in range(3))

    eps = 1e-20

    def normalize(x):
        n2v = x[0] * x[0] + x[1] * x[1] + x[2] * x[2]
        good = n2v > eps
        inv = jnp.where(good, jax.lax.rsqrt(jnp.where(good, n2v, 1.0)), 0.0)
        return tuple(xi * inv for xi in x), good

    anchor, a_good = normalize(anchor_raw)
    anchor = (
        jnp.where(a_good, anchor[0], one),
        jnp.where(a_good, anchor[1], zero),
        jnp.where(a_good, anchor[2], zero),
    )
    dot = sum(o * a for o, a in zip(other_raw, anchor))
    other_o = tuple(o - dot * a for o, a in zip(other_raw, anchor))
    other, o_good = normalize(other_o)
    # Fallback: unit vector orthogonal to anchor via the least-aligned axis.
    au = (jnp.abs(anchor[0]), jnp.abs(anchor[1]), jnp.abs(anchor[2]))
    pick0 = (au[0] <= au[1]) & (au[0] <= au[2])
    pick1 = (~pick0) & (au[1] <= au[2])
    e = (
        jnp.where(pick0, one, zero),
        jnp.where(pick1, one, zero),
        jnp.where(pick0 | pick1, zero, one),
    )
    fb = (
        anchor[1] * e[2] - anchor[2] * e[1],
        anchor[2] * e[0] - anchor[0] * e[2],
        anchor[0] * e[1] - anchor[1] * e[0],
    )
    fb, _ = normalize(fb)
    other = tuple(jnp.where(o_good, other[i], fb[i]) for i in range(3))

    # Middle column = cross of the outer two, signed so det(V) = +1 in both
    # orderings (det[a, a x o, o] = -1 but det[a, o x a, o] = +1).
    ms = jnp.where(use_top, -1.0, 1.0)
    mid = (
        ms * (anchor[1] * other[2] - anchor[2] * other[1]),
        ms * (anchor[2] * other[0] - anchor[0] * other[2]),
        ms * (anchor[0] * other[1] - anchor[1] * other[0]),
    )
    v0 = tuple(jnp.where(use_top, anchor[i], other[i]) for i in range(3))
    v2 = tuple(jnp.where(use_top, other[i], anchor[i]) for i in range(3))
    return [l0, l1, l2], [v0, mid, v2]


def svd3x3_c(f, method=None):
    """Component-wise SVD core on a nested-list 3x3 matrix (same math as
    svd3x3; usable inside Pallas kernels). `method` overrides the module
    eigensolver backend ("jacobi"/"cardano", see set_eig3_method)."""
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

    if (method or _EIG3_METHOD) == "cardano":
        lam, vcols = _sym_eig3x3_cardano(a00, a01, a02, a11, a12, a22)
        sig2 = [jnp.maximum(l, 0.0) * scale for l in lam]  # already descending
        cols = [list(v) for v in vcols]
        return _svd3x3_from_eig(f, sig2, cols)

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

    return _svd3x3_from_eig(f, sig2, cols)


def _svd3x3_from_eig(f, sig2, cols):
    """Shared SVD tail: sigma = sqrt(eig), robust U construction from F @ v_k
    with orthonormal fallbacks for (near-)singular F. `cols` = descending
    eigenvector columns of F^T F."""
    f00, f01, f02 = f[0][0], f[0][1], f[0][2]
    f10, f11, f12 = f[1][0], f[1][1], f[1][2]
    f20, f21, f22 = f[2][0], f[2][1], f[2][2]

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
    # A = F^T F (symmetric), backend (cardano/jacobi) eigenvalues, sqrt.
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


def sym_eigvals3x3_c(m, method=None):
    """Eigenvalues of a symmetric 3x3 nested-list matrix (possibly negative,
    unlike svd singular values). Used by the maximum-stress failure model
    inside the fused kernels, where the arccos closed form of math/linalg.py
    is unavailable (Mosaic lowers cos but not acos).

    Backend follows the module eig3 default: "cardano" = the acos-free trig
    closed form (_cardano_trig_vals, ~2.5x fewer serial VPU ops than 4
    Jacobi sweeps — the failure check runs inside kernel B's latency-bound
    chain); "jacobi" = cyclic Jacobi. Both are exact on the dominant
    eigenvalue; cardano's small-eigenvalue cancellation (~1e-6 relative to
    max|eig|) is far inside the failure thresholds' tolerance.
    """
    a00, a11, a22 = m[0][0], m[1][1], m[2][2]
    a01, a02, a12 = m[0][1], m[0][2], m[1][2]
    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(a00), jnp.abs(a11)), jnp.abs(a22)), 1e-30
    )
    inv = 1.0 / scale
    a00, a11, a22 = a00 * inv, a11 * inv, a22 * inv
    a01, a02, a12 = a01 * inv, a02 * inv, a12 * inv

    if (method or _EIG3_METHOD) == "cardano":
        l0, l1, l2 = _cardano_trig_vals(a00, a01, a02, a11, a12, a22)
        return [l0 * scale, l1 * scale, l2 * scale]

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
