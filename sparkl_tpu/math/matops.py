"""Component-wise batched small-matrix products (d = 2 or 3).

XLA:TPU lowers batched [..., d, d] einsum/matmul on tiny trailing dims to
layout-shuffling code that is 10-100x slower than explicit component
arithmetic at particle-batch sizes (see math/svd.py for measurements).
These helpers unpack to [...,] component arrays, do the scalar math on the
VPU, and restack — the restack is a cheap minor-dim interleave and the
compute fuses with neighboring elementwise ops.
"""

import jax.numpy as jnp


def _unpack(m):
    d = m.shape[-1]
    return [[m[..., i, j] for j in range(d)] for i in range(d)], d


def _pack(rows):
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows],
        axis=-2,
    )


def matmul(a, b):
    """a @ b for [..., d, d] batched matrices, component-wise."""
    am, d = _unpack(a)
    bm, _ = _unpack(b)
    rows = [
        [sum(am[i][k] * bm[k][j] for k in range(d)) for j in range(d)]
        for i in range(d)
    ]
    return _pack(rows)


def matmul_tn(a, b):
    """a^T @ b."""
    am, d = _unpack(a)
    bm, _ = _unpack(b)
    rows = [
        [sum(am[k][i] * bm[k][j] for k in range(d)) for j in range(d)]
        for i in range(d)
    ]
    return _pack(rows)


def matmul_nt(a, b):
    """a @ b^T."""
    am, d = _unpack(a)
    bm, _ = _unpack(b)
    rows = [
        [sum(am[i][k] * bm[j][k] for k in range(d)) for j in range(d)]
        for i in range(d)
    ]
    return _pack(rows)


def recompose(u, s, v):
    """u @ diag(s) @ v^T — the SVD recomposition used by every return map
    (ref: nalgebra SVD::recompose)."""
    um, d = _unpack(u)
    vm, _ = _unpack(v)
    sc = [s[..., k] for k in range(d)]
    rows = [
        [sum(um[i][k] * sc[k] * vm[j][k] for k in range(d)) for j in range(d)]
        for i in range(d)
    ]
    return _pack(rows)


def aat(a):
    """a @ a^T (symmetric output)."""
    return matmul_nt(a, a)
