"""Batched small-matrix linear algebra for [..., d, d] arrays (d = 2 or 3).

These are the TPU-friendly (branch-free, vectorized over leading axes)
equivalents of the nalgebra helpers sparkl uses in `src_core/utils/physics.rs`
and `src_core/lib.rs` (DecomposedTensor).
"""

import jax.numpy as jnp


def eye(d, dtype=jnp.float32):
    return jnp.eye(d, dtype=dtype)


def identity_like(m):
    d = m.shape[-1]
    return jnp.broadcast_to(jnp.eye(d, dtype=m.dtype), m.shape)


def transpose(m):
    return jnp.swapaxes(m, -1, -2)


def trace(m):
    return jnp.trace(m, axis1=-2, axis2=-1)


def det(m):
    """Closed-form determinant for 2x2 / 3x3 batched matrices."""
    d = m.shape[-1]
    if d == 2:
        return m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    elif d == 3:
        return (
            m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
            - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
            + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
        )
    raise ValueError(f"unsupported dim {d}")


def inverse(m, eps=0.0):
    """Closed-form inverse (adjugate / det). Division by zero det yields inf;
    callers that need nalgebra's `try_inverse` fallback should mask on det."""
    d = m.shape[-1]
    dt = det(m)
    if d == 2:
        adj = jnp.stack(
            [
                jnp.stack([m[..., 1, 1], -m[..., 0, 1]], axis=-1),
                jnp.stack([-m[..., 1, 0], m[..., 0, 0]], axis=-1),
            ],
            axis=-2,
        )
    elif d == 3:
        c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
        c01 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
        c02 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
        c10 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
        c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
        c12 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
        c20 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
        c21 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
        c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
        adj = jnp.stack(
            [
                jnp.stack([c00, c01, c02], axis=-1),
                jnp.stack([c10, c11, c12], axis=-1),
                jnp.stack([c20, c21, c22], axis=-1),
            ],
            axis=-2,
        )
    else:
        raise ValueError(f"unsupported dim {d}")
    return adj / (dt[..., None, None] + eps)


def inv_exact(e):
    """1/e with the exact-zero convention 1/0 := 0.

    Ref: physics.rs `inv_exact` — used to normalize grid momentum by mass
    without NaNs on empty cells.
    """
    return jnp.where(e == 0.0, 0.0, 1.0 / jnp.where(e == 0.0, 1.0, e))


def spherical_part(m):
    """tr(m)/d. Ref: physics.rs `spherical_part`."""
    d = m.shape[-1]
    return trace(m) / d


def deviatoric_part(m):
    """m - (tr(m)/d) I. Ref: physics.rs `deviatoric_part` / DecomposedTensor."""
    return m - spherical_part(m)[..., None, None] * identity_like(m)


def strain_rate(velocity_gradient):
    """Symmetric part. Ref: physics.rs `strain_rate`."""
    return 0.5 * (velocity_gradient + transpose(velocity_gradient))


def spin_tensor(velocity_gradient):
    """Antisymmetric part. Ref: physics.rs `spin_tensor`."""
    return 0.5 * (velocity_gradient - transpose(velocity_gradient))


def sym_eigvals_2x2(m):
    """Eigenvalues of a symmetric 2x2 matrix, closed form. Returns (..., 2)."""
    a = m[..., 0, 0]
    b = m[..., 0, 1]
    c = m[..., 1, 1]
    mean = 0.5 * (a + c)
    r = jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b * b, 0.0))
    return jnp.stack([mean - r, mean + r], axis=-1)


def sym_eigvals_3x3(m):
    """Eigenvalues of a symmetric 3x3 matrix (trigonometric closed form).

    Branch-free Deledalle/Smith-style formula; adequate for the maximum-stress
    failure check (ref: failure_maximum_stress.rs uses try_symmetric_eigen).
    Returns (..., 3), unordered (ascending by construction of the formula).
    """
    a = m[..., 0, 0]
    b = m[..., 1, 1]
    c = m[..., 2, 2]
    d_ = m[..., 0, 1]
    e_ = m[..., 1, 2]
    f_ = m[..., 0, 2]
    q = (a + b + c) / 3.0
    p1 = d_ * d_ + e_ * e_ + f_ * f_
    p2 = (a - q) ** 2 + (b - q) ** 2 + (c - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    inv_p = 1.0 / p
    bmat = (m - q[..., None, None] * identity_like(m)) * inv_p[..., None, None]
    r = det(bmat) / 2.0
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    eig1 = q + 2.0 * p * jnp.cos(phi)
    eig3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    eig2 = 3.0 * q - eig1 - eig3
    # Degenerate (diagonal multiple of I) case: p2 == 0.
    is_diag = p2 <= 1e-30
    eig1 = jnp.where(is_diag, q, eig1)
    eig2 = jnp.where(is_diag, q, eig2)
    eig3 = jnp.where(is_diag, q, eig3)
    return jnp.stack([eig3, eig2, eig1], axis=-1)
