"""Component-matrix helpers: small matrices as nested lists of scalar arrays.

The fused Pallas kernels (sparkl_tpu/fused) keep per-particle matrices as
d*d separate [.., C]-shaped rows — Mosaic tiles the LAST TWO dims onto
(sublane, lane) vector registers, so a [C, d, d] array would waste >99% of
each register on padding. These helpers implement the small-matrix algebra
of math/linalg.py and math/matops.py on the nested-list representation
(`m[i][j]` is a broadcastable scalar array); the same code runs unmodified
in plain jnp (tests) and inside Pallas kernel bodies.

Ref semantics: nalgebra helpers used by sparkl `src_core/utils/physics.rs`.
"""

import jax.numpy as jnp


def unpack(m):
    """[..., d, d] array -> nested list of [...] scalars."""
    d = m.shape[-1]
    return [[m[..., i, j] for j in range(d)] for i in range(d)]


def pack(rows):
    """Nested list -> [..., d, d] array."""
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def unpack_vec(v):
    d = v.shape[-1]
    return [v[..., i] for i in range(d)]


def pack_vec(comps):
    return jnp.stack(comps, axis=-1)


def zeros_like_mat(m):
    z = jnp.zeros_like(m[0][0])
    d = len(m)
    return [[z for _ in range(d)] for _ in range(d)]


def identity_c(d, like):
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return [[one if i == j else zero for j in range(d)] for i in range(d)]


def transpose_c(m):
    d = len(m)
    return [[m[j][i] for j in range(d)] for i in range(d)]


def det_c(m):
    d = len(m)
    if d == 2:
        return m[0][0] * m[1][1] - m[0][1] * m[1][0]
    return (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
        + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
    )


def trace_c(m):
    return sum(m[i][i] for i in range(len(m)))


def matmul_c(a, b):
    d = len(a)
    return [
        [sum(a[i][k] * b[k][j] for k in range(d)) for j in range(d)]
        for i in range(d)
    ]


def matmul_nt_c(a, b):
    """a @ b^T."""
    d = len(a)
    return [
        [sum(a[i][k] * b[j][k] for k in range(d)) for j in range(d)]
        for i in range(d)
    ]


def recompose_c(u, s, v):
    """u @ diag(s) @ v^T (nalgebra SVD::recompose)."""
    d = len(u)
    return [
        [sum(u[i][k] * s[k] * v[j][k] for k in range(d)) for j in range(d)]
        for i in range(d)
    ]


def aat_c(a):
    return matmul_nt_c(a, a)


def scale_c(m, k):
    return [[mij * k for mij in row] for row in m]


def add_c(a, b):
    d = len(a)
    return [[a[i][j] + b[i][j] for j in range(d)] for i in range(d)]


def sub_c(a, b):
    d = len(a)
    return [[a[i][j] - b[i][j] for j in range(d)] for i in range(d)]


def add_diag_c(m, k):
    d = len(m)
    return [
        [m[i][j] + k if i == j else m[i][j] for j in range(d)] for i in range(d)
    ]


def where_mat(cond, a, b):
    d = len(a)
    return [
        [jnp.where(cond, a[i][j], b[i][j]) for j in range(d)] for i in range(d)
    ]


def where_vec(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def deviatoric_c(m):
    """m - (tr(m)/d) I. Ref: physics.rs `deviatoric_part`."""
    d = len(m)
    sph = trace_c(m) / d
    return add_diag_c(m, -sph)


def strain_rate_c(g):
    """Symmetric part. Ref: physics.rs `strain_rate`."""
    d = len(g)
    return [[0.5 * (g[i][j] + g[j][i]) for j in range(d)] for i in range(d)]


def frob2_c(m):
    """Squared Frobenius norm."""
    return sum(sum(x * x for x in row) for row in m)


def norm_vec(v):
    return jnp.sqrt(sum(x * x for x in v))


def safe_div(a, b, eps=1e-20):
    good = jnp.abs(b) > eps
    return jnp.where(good, a / jnp.where(good, b, 1.0), 0.0)


def pow_pos(x, p, tiny=1e-30):
    """x**p for x > 0, via exp/log (Mosaic-safe; avoids the pow intrinsic)."""
    return jnp.exp(p * jnp.log(jnp.maximum(x, tiny)))


def sinh_c(x):
    """sinh via exp (Mosaic-safe)."""
    e = jnp.exp(x)
    return 0.5 * (e - 1.0 / e)
