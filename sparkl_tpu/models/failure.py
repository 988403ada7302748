"""Failure models.

Ref: sparkl `src_core/dynamics/models/failure_maximum_stress.rs`.
"""

import jax.numpy as jnp

from sparkl_tpu.math import cmat, linalg
from sparkl_tpu.math.svd import sym_eigvals2x2_c, sym_eigvals3x3_c

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
    return maximum_stress_failed_c(
        params[..., 0], params[..., 1], cmat.unpack(stress)
    )


def maximum_stress_failed_c(max_principal, max_shear, stress):
    """Component-wise core (Pallas-kernel safe: Jacobi eigenvalues instead of
    the arccos closed form)."""
    d = len(stress)
    sym = cmat.strain_rate_c(stress)  # 0.5 (S + S^T)
    if d == 2:
        eig = sym_eigvals2x2_c(sym)
    else:
        eig = sym_eigvals3x3_c(sym)
    emin = eig[0]
    emax = eig[0]
    for e in eig[1:]:
        emin = jnp.minimum(emin, e)
        emax = jnp.maximum(emax, e)
    return (emax > max_principal) | ((emax - emin) / 2.0 > max_shear)
