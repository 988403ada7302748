"""CD-MPM phase-field damage (matrix-free CG on grid DOFs).

Ref: sparkl `src/dynamics/phase_field.rs:11-317` — init P2G, Jacobi
preconditioning, <=25 CG iterations with matrix-free A·p via G2P2G products,
then monotone-decreasing clamped phase collection.

Implemented in the damage milestone; the API is stable now.
"""

from sparkl_tpu.core.grid import GridParams


def update_phase_field(grid: GridParams, p, models, dt):
    raise NotImplementedError(
        "CD-MPM phase field lands with the damage milestone; "
        "use DamageModel.EIGENEROSION or MODIFIED_EIGENEROSION meanwhile."
    )
