"""Cell-bucketed particle neighborhood machinery (fixed capacity, jit-static).

TPU-first replacement for the reference's sorted particle ranges per cell
(ref: sparkl `src/dynamics/particle_set.rs` sort → per-cell (start, end)
ranges consumed by eigenerosion.rs). Instead of variable-length ranges we
build a [num_cells, max_per_cell] bucket table with a counting-sort rank;
overflowing particles are dropped from *neighbor enumeration* (never from the
simulation itself) — with MPM's ~2-per-axis seeding (4/cell 2D, 8/cell 3D),
2x headroom covers the packing the reference ever sees.
"""

import jax.numpy as jnp
import numpy as np

from sparkl_tpu.core.grid import GridParams, stencil_offsets


def cell_index(grid: GridParams, position):
    """Cell (= floor) index per particle and in-bounds mask."""
    origin = jnp.asarray(grid.origin, position.dtype)
    ix = jnp.floor((position - origin) / grid.cell_width).astype(jnp.int32)
    res = jnp.asarray(grid.res, jnp.int32)
    ok = jnp.all((ix >= 0) & (ix < res), axis=-1)
    return ix, ok


def _flat_cell(grid: GridParams, ix):
    res = grid.res
    ix = jnp.clip(ix, 0, jnp.asarray(res, jnp.int32) - 1)
    flat = ix[..., 0]
    for ax in range(1, len(res)):
        flat = flat * res[ax] + ix[..., ax]
    return flat


def build_buckets(grid: GridParams, position, valid, max_per_cell: int):
    """Returns (bucket table [num_cells * max_per_cell] of particle ids
    (-1 empty), cell index, ok mask, overflow flag).

    `overflow` is True when any cell holds more than max_per_cell valid
    particles — those extras would silently vanish from neighbor enumeration,
    so callers must regrow max_per_cell and retry (the reference never drops
    neighbors: eigenerosion.rs iterates exact per-cell ranges)."""
    n = position.shape[0]
    ix, ok = cell_index(grid, position)
    ok = ok & valid
    flat = jnp.where(ok, _flat_cell(grid, ix), grid.num_nodes)  # invalid -> sentinel

    order = jnp.argsort(flat)
    sorted_cells = flat[order]
    # rank within cell = position in sorted order minus first occurrence.
    first = jnp.searchsorted(sorted_cells, sorted_cells, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)

    k = max_per_cell
    in_cell = sorted_cells < grid.num_nodes
    overflow = jnp.any(in_cell & (rank >= k))
    slot = jnp.where(
        in_cell & (rank < k),
        sorted_cells * k + rank,
        grid.num_nodes * k,
    )
    buckets = jnp.full((grid.num_nodes * k + 1,), -1, jnp.int32)
    buckets = buckets.at[slot].set(order.astype(jnp.int32))
    return buckets[:-1], ix, ok, overflow


def neighbor_pair_sums(
    grid: GridParams,
    position,
    values,
    include_mask,
    radius,
    max_per_cell: int = 8,
):
    """For each particle i: sum over j != i of values[j] where
    |x_i - x_j| <= radius, both include_mask, j within the 3^d cell
    neighborhood. Returns ([N, V] sums, overflow flag).

    Cost is dominated by the [N, 3^d * L] candidate lookups (per-row gather
    cost on TPU), so candidates carry ONE packed row [id | pos | vals] and L
    defaults to 8 (MPM seeds 2 particles per cell axis = <= 4/cell in 2D,
    8/cell in 3D). Cells exceeding max_per_cell raise the overflow flag so
    the caller can regrow instead of silently mis-pooling.
    """
    n, d = position.shape
    v = values.shape[1]
    k = max_per_cell
    buckets, ix, ok, overflow = build_buckets(grid, position, include_mask, k)

    # Packed candidate payload [N + 1, 1 + d + V]: id, position, values; the
    # trailing row backs empty slots (id -1).
    ids_f = jnp.arange(n, dtype=jnp.float32)
    packed = jnp.concatenate([ids_f[:, None], position, values], axis=1)
    packed = jnp.concatenate(
        [packed, jnp.full((1, 1 + d + v), -1.0, packed.dtype)], axis=0
    )

    offsets = jnp.asarray(stencil_offsets(d) - 1, jnp.int32)  # {-1,0,1}^d

    nbr_cells = ix[:, None, :] + offsets[None, :, :]  # [N, O, d]
    res = jnp.asarray(grid.res, jnp.int32)
    nbr_ok = jnp.all((nbr_cells >= 0) & (nbr_cells < res), axis=-1)  # [N, O]
    nbr_flat = _flat_cell(grid, nbr_cells)  # [N, O]

    slot_base = nbr_flat * k  # [N, O]
    slots = slot_base[..., None] + jnp.arange(k, dtype=jnp.int32)  # [N, O, K]
    cand_id = buckets[slots.reshape(n, -1)]  # [N, O*K] (row gather #1: ids)
    row = jnp.where(cand_id >= 0, cand_id, n)
    cand = packed[row]  # [N, O*K, 1+d+V] (row gather #2: everything else)

    cand_valid = (cand_id >= 0) & nbr_ok[..., None].repeat(k, axis=-1).reshape(n, -1)
    self_id = jnp.arange(n, dtype=jnp.int32)[:, None]
    cand_valid = cand_valid & (cand_id != self_id)

    cand_pos = cand[..., 1 : 1 + d]
    dist2 = jnp.sum((cand_pos - position[:, None, :]) ** 2, axis=-1)
    cand_valid = (
        cand_valid & (dist2 <= radius * radius) & include_mask[:, None] & ok[:, None]
    )
    return jnp.sum(cand[..., 1 + d :] * cand_valid[..., None], axis=1), overflow
