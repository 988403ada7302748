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

import jax.numpy as jnp

_JACOBI_SWEEPS = 7  # 7 sweeps x 3 rotations: off-diagonal < 1e-7 * ||A|| in f32


def svd2x2(f):
    """SVD of [..., 2, 2] matrices. Returns (u, s, v) with f = u @ diag(s) @ v^T.

    s >= 0 always; det(u)*det(v) = sign(det f).
    """
    a = f[..., 0, 0]
    b = f[..., 0, 1]
    c = f[..., 1, 0]
    d = f[..., 1, 1]

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
    theta = 0.5 * jnp.arctan2(2.0 * s01, s00 - s11)
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
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

    u = jnp.stack(
        [jnp.stack([u00, u01], axis=-1), jnp.stack([u10, u11], axis=-1)], axis=-2
    )
    v = jnp.stack(
        [jnp.stack([v00, v01], axis=-1), jnp.stack([v10, v11], axis=-1)], axis=-2
    )
    s = jnp.stack([s0, s1], axis=-1)
    return u, s, v


def _jacobi_rotate(a, v, p, q):
    """One batched Jacobi rotation zeroing a[p,q]; updates (a, v) in plane (p,q)."""
    apq = a[..., p, q]
    app = a[..., p, p]
    aqq = a[..., q, q]
    theta = 0.5 * jnp.arctan2(2.0 * apq, app - aqq)
    c = jnp.cos(theta)
    s = jnp.sin(theta)

    # Build the rotation as a full (3,3) batched matrix at static indices.
    j = jnp.zeros(a.shape, a.dtype)
    for k in range(a.shape[-1]):
        j = j.at[..., k, k].set(1.0)
    j = j.at[..., p, p].set(c).at[..., q, q].set(c)
    j = j.at[..., p, q].set(-s).at[..., q, p].set(s)

    a = jnp.einsum("...ji,...jk,...kl->...il", j, a, j)
    v = jnp.einsum("...ij,...jk->...ik", v, j)
    return a, v


def svd3x3(f):
    """SVD of [..., 3, 3] matrices. Returns (u, s, v) with f = u @ diag(s) @ v^T.

    s >= 0, sorted descending; det(u)*det(v) = sign(det f). Robust to
    rank-deficient and inverted (det < 0) inputs.
    """
    dtype = f.dtype
    a = jnp.einsum("...ji,...jk->...ik", f, f)  # F^T F, symmetric PSD
    scale = jnp.maximum(jnp.max(jnp.abs(a), axis=(-2, -1), keepdims=True), 1e-30)
    a = a / scale
    v = jnp.broadcast_to(jnp.eye(3, dtype=dtype), f.shape).astype(dtype)
    v = v + jnp.zeros_like(f)

    for _ in range(_JACOBI_SWEEPS):
        a, v = _jacobi_rotate(a, v, 0, 1)
        a, v = _jacobi_rotate(a, v, 0, 2)
        a, v = _jacobi_rotate(a, v, 1, 2)

    sig2 = jnp.stack([a[..., 0, 0], a[..., 1, 1], a[..., 2, 2]], axis=-1)
    sig2 = jnp.maximum(sig2, 0.0) * scale[..., 0]
    # Sort descending; permute V columns accordingly.
    order = jnp.argsort(-sig2, axis=-1)
    sig2 = jnp.take_along_axis(sig2, order, axis=-1)
    v = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    s = jnp.sqrt(sig2)

    # U columns: u_i = F v_i / s_i with orthonormal fallbacks.
    fv = jnp.einsum("...ij,...jk->...ik", f, v)  # columns F v_i
    eps = 1e-12

    def _normalize(x):
        n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        good = n > eps
        return jnp.where(good, x / jnp.where(good, n, 1.0), x), n[..., 0]

    u0_raw = fv[..., :, 0]
    u0, n0 = _normalize(u0_raw)
    # Fallback for F ~ 0: e0.
    e0 = jnp.zeros_like(u0).at[..., 0].set(1.0)
    u0 = jnp.where((n0 > eps)[..., None], u0, e0)

    u1_raw = fv[..., :, 1]
    u1_raw = u1_raw - jnp.sum(u1_raw * u0, axis=-1, keepdims=True) * u0
    u1, n1 = _normalize(u1_raw)
    # Fallback: unit vector orthogonal to u0 via cross with the least-aligned axis.
    least = jnp.argmin(jnp.abs(u0), axis=-1)
    basis = jnp.eye(3, dtype=dtype)
    e_pick = basis[least]
    u1_fb, _ = _normalize(jnp.cross(u0, e_pick))
    u1 = jnp.where((n1 > eps)[..., None], u1, u1_fb)

    u2_dir = jnp.cross(u0, u1)
    # Sign: match F v2 (negative when det F < 0 => reflection lives in U).
    sgn = jnp.sum(fv[..., :, 2] * u2_dir, axis=-1)
    sgn = jnp.where(sgn < 0.0, -1.0, 1.0)
    u2 = u2_dir * sgn[..., None]

    u = jnp.stack([u0, u1, u2], axis=-1)
    return u, s, v


def svd(f):
    """Dispatch on trailing matrix size (2 or 3)."""
    d = f.shape[-1]
    if d == 2:
        return svd2x2(f)
    if d == 3:
        return svd3x3(f)
    raise ValueError(f"unsupported dim {d}")
