"""Failure models.

Ref: sparkl `src_core/dynamics/models/failure_maximum_stress.rs`.
"""

import jax.numpy as jnp

from sparkl_tpu.math import linalg

FAILURE_NONE = 0
MAXIMUM_STRESS = 1
FAILURE_CUSTOM_BASE = 16


def maximum_stress_failed(params, stress):
    """True where the particle's stress exceeds the failure envelope.

    params rows: [max_principal_stress, max_shear_stress].
    Ref: failure_maximum_stress.rs `particle_failed` — symmetric eigenvalues of
    the (symmetric) Kirchhoff stress; fail if max eig > σ_max or
    (max-min)/2 > τ_max.
    """
    max_principal, max_shear = params[..., 0], params[..., 1]
    d = stress.shape[-1]
    sym = 0.5 * (stress + linalg.transpose(stress))
    if d == 2:
        eig = linalg.sym_eigvals_2x2(sym)
    else:
        eig = linalg.sym_eigvals_3x3(sym)
    emin = jnp.min(eig, axis=-1)
    emax = jnp.max(eig, axis=-1)
    return (emax > max_principal) | ((emax - emin) / 2.0 > max_shear)
