"""Eigenerosion damage evolution.

Ref: sparkl `src/dynamics/solver/eigenerosion.rs` — neighborhood energy
averaging: particles within one cell_width of each other (via the 3^d cell
neighborhood) pool `m·ψ_pos`; a particle fails (phase = 0) when
`factor · h · pooled_avg > threshold`.

Implemented on top of the cell-sorted neighbor machinery in
sparkl_tpu.sparse.neighbors (counting sort by cell, fixed per-cell capacity).
"""

import jax.numpy as jnp

from sparkl_tpu.core.grid import GridParams


def default_max_per_cell(dim):
    # Seeding is 2 particles per cell axis (4/cell 2D, 8/cell 3D); 2x
    # headroom for compression. The [N, 3^d * L] candidate gathers are the
    # whole cost of this pass, so L is kept as tight as safety allows —
    # overflow is DETECTED (never silent) and callers regrow + retry.
    return 8 if dim == 2 else 16


def evolve_eigenerosion(grid: GridParams, p, max_per_cell: int | None = None):
    """Returns (particles, bucket_overflow). An overflow means some cell held
    more than max_per_cell eligible particles and pooling was incomplete —
    callers must regrow max_per_cell and retry (the reference never drops
    neighbors, eigenerosion.rs:9-58)."""
    from sparkl_tpu.sparse.neighbors import neighbor_pair_sums

    if max_per_cell is None:
        max_per_cell = default_max_per_cell(p.position.shape[1])
    eligible = (
        (p.crack_propagation_factor != 0.0) & (p.phase > 0.0) & ~p.failed & p.active
    )
    # Pool m·psi and m over neighbors within cell_width (incl. self; the G2P
    # stage already initialized parameter1/2 with the self contribution).
    vals = jnp.stack([p.mass * p.psi_pos, p.mass], axis=-1)
    pooled, overflow = neighbor_pair_sums(
        grid,
        p.position,
        vals,
        include_mask=eligible,
        radius=grid.cell_width,
        max_per_cell=max_per_cell,
    )
    parameter1 = p.parameter1 + jnp.where(eligible, pooled[:, 0], 0.0)
    parameter2 = p.parameter2 + jnp.where(eligible, pooled[:, 1], 0.0)

    has_crack = p.crack_propagation_factor != 0.0
    safe2 = jnp.where(parameter2 > 0.0, parameter2, 1.0)
    energy = parameter1 * p.crack_propagation_factor * grid.cell_width / safe2
    trip = has_crack & (energy > p.crack_threshold)
    return (
        p.replace(
            parameter1=jnp.where(has_crack, energy, parameter1),
            phase=jnp.where(trip, 0.0, p.phase),
        ),
        overflow,
    )
