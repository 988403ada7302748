"""Quadratic B-spline interpolation kernel.

Reference semantics: sparkl `src_core/dynamics/solver/kernel.rs:6-136`
(QuadraticKernel). The MLS-MPM transfer uses a quadratic B-spline with a
3-node-per-axis stencil anchored at the "associated" grid node
`round(x/h) - 1`, so the normalized particle offset `fx = x/h - (round(x/h)-1)`
always lies in [0.5, 1.5) and the three per-axis weights are

    w0 = 0.5 (1.5 - fx)^2
    w1 = 0.75 - (fx - 1)^2
    w2 = 0.5 (fx - 0.5)^2

All functions are shape-polymorphic jnp (vectorized over any leading axes) so
they can be used both in reference jnp solvers and inside Pallas kernels.
"""

import jax.numpy as jnp


def inv_d(cell_width):
    """APIC inertia-tensor inverse D^-1 = 4/h^2 for quadratic B-splines.

    Ref: kernel.rs `QuadraticKernel::inv_d`.
    """
    return 4.0 / (cell_width * cell_width)


def quadratic_weights_1d(fx):
    """Per-axis stencil weights for offsets {0,1,2} from the associated node.

    fx: (...,) normalized distance from the associated node, in [0.5, 1.5).
    Returns (..., 3). Ref: kernel.rs `QuadraticKernel::eval_all`.
    """
    w0 = 0.5 * (1.5 - fx) ** 2
    w1 = 0.75 - (fx - 1.0) ** 2
    w2 = 0.5 * (fx - 0.5) ** 2
    return jnp.stack([w0, w1, w2], axis=-1)


def quadratic_eval(x):
    """The full quadratic B-spline N(x). Ref: kernel.rs `QuadraticKernel::eval`."""
    ax = jnp.abs(x)
    inner = 0.75 - ax * ax
    outer = 0.5 * (1.5 - ax) ** 2
    return jnp.where(ax < 0.5, inner, jnp.where(ax < 1.5, outer, 0.0))


def quadratic_eval_derivative(x):
    """dN/dx. Ref: kernel.rs `QuadraticKernel::eval_derivative`."""
    ax = jnp.abs(x)
    s = jnp.sign(x)
    inner = -2.0 * s * ax
    outer = -s * (1.5 - ax)
    return jnp.where(ax < 0.5, inner, jnp.where(ax < 1.5, outer, 0.0))
