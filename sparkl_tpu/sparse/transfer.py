"""Block-sparse APIC transfers as batched MXU matmuls.

The TPU-native answer to the reference's fused g2p2g CUDA kernel
(ref: sparkl `src_kernels/cuda/g2p2g.rs` — shared-memory staging of the 2^d
neighbor blocks, per-particle 3^d scatter guarded by spinlocks): instead of
atomics, each dispatch chunk's 3^d-stencil scatter over its 8^d cell window
is ONE dense contraction

    grid_window[f, 8^d] += payload[f, C] @ W[C, 8^d]

where W is the (separable) tensor-product of per-axis quadratic B-spline
weights — a deterministic, race-free reduction that runs on the MXU.
G2P is the transposed contraction against the same W. Gradient transfers use
dpt-weighted variants of W (one per axis). Layouts keep the field axis in the
matmul M position and cells/particles as K/N so the 128-lane MXU is fed
(f-major [D, F, C] / [D, F, 8^d]); measured ~4x faster than the naive
[D, C, F] layout.

Window-to-grid merging is row-granular: the 8^d window splits into 2^d
blocks of 4^d cells, scattered/gathered by dense block index in rows of
64*F floats (the reference's additive halo-merge, `sort.rs merge_halo_blocks`,
without the multi-stream choreography).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.math import linalg
from sparkl_tpu.math.kernel import quadratic_weights_1d, inv_d as kernel_inv_d
from sparkl_tpu.sparse.blocks import (
    BLOCK_SIDE,
    BlockConfig,
    BlockStructure,
    cells_per_block,
    region_cells,
    region_maps,
    region_side,
)


def gather_chunks(cfg: BlockConfig, structure: BlockStructure, *arrays):
    """Gather particle arrays (original order) into chunk-slot layout [D, C, ...].

    The chunk layout addresses sorted space; composition with sorted_ids maps
    to the original particle order in one gather (avoids materializing a
    permuted copy of the whole particle pytree — that permute measured ~13ms
    at 55k particles, more than the entire transfer math).

    Returns (slot_valid [D, C] bool, gathered arrays...). Invalid slots read
    row 0 (masked by slot_valid).
    """
    d_, c = cfg.max_chunks, cfg.chunk_size
    src = structure.chunk_start[:, None] + jnp.arange(c, dtype=jnp.int32)[None, :]
    valid = jnp.arange(c, dtype=jnp.int32)[None, :] < structure.chunk_count[:, None]
    src = jnp.where(valid, src, 0)
    src = structure.sorted_ids[src.reshape(-1)]
    out = tuple(a[src].reshape((d_, c) + a.shape[1:]) for a in arrays)
    return (valid,) + out


def window_coords(grid: GridParams, pos):
    """Per-axis region weights and dpt values for positions [..., d].

    Returns (w_ax [..., d, 8], dpt_ax [..., d, 8] in world units).
    w_ax[..., r] is the particle's B-spline weight for region coordinate r
    (zero outside its 3-cell stencil); dpt_ax[..., r] = (r - px) * h where
    px is the particle's position in region units. Computed group-local so
    the full [D, C, d, 8] tensors never materialize in HBM.
    """
    dim = grid.dim
    h = grid.cell_width
    origin = jnp.asarray(grid.origin, jnp.float32)

    xg = (pos - origin) / h
    base = jnp.round(xg).astype(jnp.int32) - 1  # global base cell
    fx = xg - base.astype(jnp.float32)  # in [0.5, 1.5)
    lb = base - (base // BLOCK_SIDE) * BLOCK_SIDE  # local cell in block, 0..3
    px = lb.astype(jnp.float32) + fx  # particle pos in region units

    w1 = quadratic_weights_1d(fx)  # [..., d, 3]

    r = jnp.arange(region_side(), dtype=jnp.int32)  # [8]
    rel = r - lb[..., None]  # [..., d, 8]
    # Branch-free select instead of take_along_axis (gathers on small trailing
    # axes are pathologically slow on XLA:TPU).
    w_ax = (
        w1[..., 0:1] * (rel == 0)
        + w1[..., 1:2] * (rel == 1)
        + w1[..., 2:3] * (rel == 2)
    )
    dpt_ax = (r.astype(jnp.float32) - px[..., None]) * h
    return w_ax, dpt_ax


def _outer_weights(w_ax):
    """Tensor-product region weights: [D, C, d, 8] -> [D, C, 8^d]."""
    dim = w_ax.shape[2]
    if dim == 2:
        w = w_ax[:, :, 0, :, None] * w_ax[:, :, 1, None, :]
        return w.reshape(w.shape[0], w.shape[1], -1)
    w = (
        w_ax[:, :, 0, :, None, None]
        * w_ax[:, :, 1, None, :, None]
        * w_ax[:, :, 2, None, None, :]
    )
    return w.reshape(w.shape[0], w.shape[1], -1)


def _outer_weights_d(w_ax, dpt_ax, axis):
    """Like _outer_weights but with axis `axis` weighted by dpt."""
    dim = w_ax.shape[2]
    parts = []
    for ax in range(dim):
        p = w_ax[:, :, ax, :]
        if ax == axis:
            p = p * dpt_ax[:, :, ax, :]
        parts.append(p)
    if dim == 2:
        w = parts[0][..., :, None] * parts[1][..., None, :]
    else:
        w = (
            parts[0][..., :, None, None]
            * parts[1][..., None, :, None]
            * parts[2][..., None, None, :]
        )
    return w.reshape(w.shape[0], w.shape[1], -1)


# ---------------------------------------------------------------------------
# P2G
# ---------------------------------------------------------------------------


def p2g_images(
    grid: GridParams,
    cfg: BlockConfig,
    structure: BlockStructure,
    position_sorted,
    mass_sorted,
    velocity_sorted,
    affine_sorted,
    psi_mass_sorted,
    psi_mom_sorted,
    group_size: int = 256,
    with_psi: bool = True,
):
    """Per-chunk 8^d window images [D, F, 8^d] with F = 1+d(+2) channels
    (mass, momentum[, psi_momentum, psi_mass]); the psi channels exist only
    for the eigenerosion damage family (with_psi)."""
    dim = grid.dim
    rc = region_cells(dim)
    d_, c = cfg.max_chunks, cfg.chunk_size

    (valid, pos, m, v, a_mat, psi_m, psi_mom) = gather_chunks(
        cfg,
        structure,
        position_sorted,
        mass_sorted,
        velocity_sorted,
        affine_sorted,
        psi_mass_sorted,
        psi_mom_sorted,
    )
    m = m * valid  # zero padded slots

    # f-major payloads.
    mv = m[:, None, :] * jnp.moveaxis(v, -1, 1)  # [D, d, C]
    parts = [m[:, None, :], mv]
    if with_psi:
        parts += [(psi_mom * valid)[:, None, :], (psi_m * valid)[:, None, :]]
    p0 = jnp.concatenate(parts, axis=1)  # [D, 1+d(+2), C]
    # affine [D, C, d, d] -> field-major [D, d(i), d(j), C]
    a_fm = jnp.moveaxis(a_mat, 1, -1)

    nf = 1 + dim + (2 if with_psi else 0)

    def body(carry, inputs):
        pos_g, p0_g, a_g, valid_g = inputs
        w_ax_g, dpt_ax_g = window_coords(grid, pos_g)
        w = _outer_weights(w_ax_g) * valid_g[..., None]  # [G, C, RC]
        out = jnp.einsum(
            "gfc,gcp->gfp", p0_g, w, preferred_element_type=jnp.float32
        )
        for j in range(dim):
            wd = _outer_weights_d(w_ax_g, dpt_ax_g, j) * valid_g[..., None]
            contrib = jnp.einsum(
                "gfc,gcp->gfp",
                a_g[:, :, j, :],
                wd,
                preferred_element_type=jnp.float32,
            )
            out = out.at[:, 1 : 1 + dim, :].add(contrib)
        return carry, out

    g = group_size
    n_groups = -(-d_ // g)
    pad = n_groups * g - d_

    def pad_g(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)).reshape(
            (n_groups, g) + x.shape[1:]
        )

    _, images = jax.lax.scan(
        body,
        None,
        (pad_g(pos), pad_g(p0), pad_g(a_fm), pad_g(valid)),
    )
    return images.reshape(n_groups * g, nf, rc)[:d_]


def _zmajor_order_3d():
    q = np.arange(region_cells(3))
    x, y, z = q // 64, (q // 8) % 8, q % 8
    return z * 64 + x * 8 + y


# Region-cell relabel for the fused 3D kernels: ZMAJOR_ORDER_3D[q_row] is the
# z-major position (q = z*64 + x*8 + y) of row-major region cell q_row.
# p2g_fused emits its image lanes xy-sheet-major (rows (flavor, z)), so its
# region-cell axis is z-major; merge/windows fold the relabel into their
# existing constant permutations at zero runtime cost (cell_order=).
ZMAJOR_ORDER_3D = _zmajor_order_3d()


# Static bound on chunks per owner block for the gather-based merge. A block
# has 4^d cells; nominal seeding is 2^d particles/cell => <= 512 particles =
# 4 chunks in 3D. 8 leaves 2x headroom for compression; denser blocks trip
# the (compiled-but-rare) scatter fallback, not an error.
MERGE_KMAX = 8


def _merge_scatter(cfg, structure, rows, nf, cpb, ncorners):
    """Round-2 formulation: duplicate-index row scatter-add (XLA serializes
    these on TPU — kept only as the fallback for blocks denser than
    MERGE_KMAX chunks)."""
    dest = structure.nbr_index[structure.chunk_block].reshape(-1)
    out = jnp.zeros((cfg.max_grid_blocks + 1, nf * cpb), jnp.float32)
    out = out.at[dest].add(rows.reshape(cfg.max_chunks * ncorners, nf * cpb))
    return out


def _merge_gather(cfg, structure, rows, nf, cpb, ncorners, first, nchunks,
                  dma=False, interpret=False, vma=None):
    """Scatter-free merge: per-owner-block segment sum over the contiguous
    chunk range (bounded KMAX gather; masked lanes hit one shared zero row),
    then a 2^d inverse-corner GATHER into the storage table. corner_owner is
    the inverse of nbr_index — unique per (g, k) because distinct owner
    blocks have distinct corner keys; collisions only land on the trash row,
    which the caller zeroes.

    dma=True runs the segment sum as an in-kernel-DMA Pallas kernel
    (fused/kernels.merge_blocks_dma): each block fetches only its ACTUAL
    1-4 chunk rows from HBM instead of paying the full-KMAX gather padding
    (~3x the streamed bytes). Same summation order (chunk-ascending)."""
    dmax = cfg.max_chunks
    width = ncorners * nf * cpb
    if dma:
        from sparkl_tpu.fused import kernels as FK

        blk = FK.merge_blocks_dma(
            cfg, rows.reshape(dmax, ncorners, nf * cpb), first, nchunks,
            MERGE_KMAX, interpret=interpret, vma=vma,
        )
    else:
        rows = rows.reshape(dmax, width)
        rows = jnp.concatenate([rows, jnp.zeros((1, width), rows.dtype)], 0)

        idx = first[:, None] + jnp.arange(MERGE_KMAX, dtype=jnp.int32)[None, :]
        idx = jnp.where(
            jnp.arange(MERGE_KMAX, dtype=jnp.int32)[None, :] < nchunks[:, None],
            idx, dmax,
        )  # [MB, KMAX]; masked -> shared zero row
        blk = jnp.sum(rows[idx], axis=1)  # [MB, nc*nf*cpb]
        blk = blk.reshape(cfg.max_blocks, ncorners, nf * cpb)
    blk = jnp.concatenate(
        [blk, jnp.zeros((1, ncorners, nf * cpb), blk.dtype)], 0
    )  # pad row cfg.max_blocks = zero

    nbr = structure.nbr_index  # [MB or MB+1, 2^d]
    co = jnp.full((cfg.max_grid_blocks + 1, ncorners), cfg.max_blocks, jnp.int32)
    bidx = jnp.minimum(
        jnp.arange(nbr.shape[0], dtype=jnp.int32), cfg.max_blocks
    )[:, None]
    kidx = jnp.arange(ncorners, dtype=jnp.int32)[None, :]
    co = co.at[nbr, jnp.broadcast_to(kidx, nbr.shape)].set(
        jnp.broadcast_to(bidx, nbr.shape)
    )

    out = jnp.zeros((cfg.max_grid_blocks + 1, nf * cpb), jnp.float32)
    for k in range(ncorners):
        out = out + blk[co[:, k], k]
    return out


def merge_images_to_grid(
    grid: GridParams, cfg: BlockConfig, structure: BlockStructure, images,
    cell_order=None, gather=False, dma=False, interpret=False, vma=None,
    overflow_out=False, force_scatter=False,
):
    """Merge chunk window images into the block grid.

    images [D, F, 8^d] -> grid [MAX_GRID_BLOCKS + 1, 4^d * F] (last block =
    trash). The additive halo merge of ref: sort.rs merge_halo_blocks.

    gather=True uses the scatter-free form (per-block segment sum + bounded
    inverse-corner gather, see _merge_gather; blocks denser than MERGE_KMAX
    chunks fall back to the scatter under lax.cond) — ~6x faster on TPU,
    where XLA serializes duplicate-index scatters. The fused pipeline uses
    it. The default stays the chunk-major scatter-add: its summation order
    matches the shard partition of the domain decomposition almost exactly,
    which keeps single-vs-multi-device trajectories bitwise-close — the
    gather's corner-major order interleaves shards and its ~1e-7 reordering
    noise can flip discrete damage thresholds between decompositions
    (observed on the MODIFIED_EIGENEROSION domain equivalence test).

    cell_order: optional permutation p with p[q_row] = position of row-major
    region cell q_row in the images' cell axis (e.g. ZMAJOR_ORDER_3D for the
    fused 3D kernel's layout); folded into the constant reorder below.
    """
    dim = grid.dim
    nf = images.shape[1]
    cpb = cells_per_block(dim)
    corner_of_region, cell_of_region = region_maps(dim)
    ncorners = 2**dim

    # Reorder region cells into (corner, cell) order. ONE static flat-lane
    # take instead of perm-gather + reshape + moveaxis: the consumer is an
    # opaque pallas call (or scatter), so XLA cannot fuse a chain of
    # reorders into it — each materialized ~100 MB at sand3@1M
    # (scripts/diag_trace.py round 5: ~1 ms/substep of transpose copies on
    # this path alone).
    perm = np.argsort(corner_of_region * cpb + cell_of_region)
    if cell_order is not None:
        perm = cell_order[perm]
    rc = images.shape[2]
    k_i, f_i, c_i = np.meshgrid(
        np.arange(ncorners), np.arange(nf), np.arange(cpb), indexing="ij"
    )
    comb = (f_i * rc + perm[k_i * cpb + c_i]).reshape(-1)
    rows = images.reshape(cfg.max_chunks, nf * rc)[:, comb].reshape(
        cfg.max_chunks, ncorners, nf, cpb
    )  # [D, corners, F, cpb] -> rows per corner

    ovf = jnp.asarray(False)
    if gather and not force_scatter:
        first = structure.block_first_chunk
        nchunks = getattr(structure, "block_num_chunks", None)
        if nchunks is None:
            # blocks.BlockStructure: block_first_chunk is the exclusive
            # prefix sum of per-block chunk counts, so the next block's
            # start is this one's end.
            nchunks = (
                jnp.concatenate([first[1:], structure.num_chunks[None]])
                - first
            )
        if overflow_out:
            # No per-substep lax.cond (the cond wrapper forces a materialized
            # output + blocks fusion — ~0.4 ms/substep at sand3@1M,
            # scripts/diag_trace.py round 5): ALWAYS take the gather form and
            # FLAG blocks denser than MERGE_KMAX instead. The flagged span's
            # results are discarded and the pipeline retries with the scatter
            # fallback pinned (the same discard-and-retry contract as the
            # capacity overflows, ref: cuda_sparse_grid.rs:161-253).
            ovf = jnp.max(nchunks) > MERGE_KMAX
            out = _merge_gather(
                cfg, structure, rows, nf, cpb, ncorners, first, nchunks,
                dma=dma, interpret=interpret, vma=vma,
            )
        else:
            out = jax.lax.cond(
                jnp.max(nchunks) <= MERGE_KMAX,
                lambda r: _merge_gather(
                    cfg, structure, r, nf, cpb, ncorners, first, nchunks,
                    dma=dma, interpret=interpret, vma=vma,
                ),
                lambda r: _merge_scatter(cfg, structure, r, nf, cpb, ncorners),
                rows,
            )
    else:
        out = _merge_scatter(cfg, structure, rows, nf, cpb, ncorners)
    # Trash block (index MAX_GRID_BLOCKS) collects out-of-table writes; zero it.
    out = out.at[cfg.max_grid_blocks].set(0.0)
    if overflow_out:
        return out, ovf  # [MGB+1, F*cpb] with F-major per block
    return out


def gather_grid_windows(
    grid: GridParams, cfg: BlockConfig, structure: BlockStructure, node_fields,
    cell_order=None,
):
    """Inverse of merge: node_fields [MGB+1, F*4^d] -> window images [D, F, 8^d].

    cell_order: optional permutation p with p[q_row] = output position of
    row-major region cell q_row (e.g. ZMAJOR_ORDER_3D to feed g2p_fused's
    3D layout); folded into the constant reorder below."""
    dim = grid.dim
    cpb = cells_per_block(dim)
    nf = node_fields.shape[1] // cpb
    corner_of_region, cell_of_region = region_maps(dim)
    ncorners = 2**dim

    dest_blocks = structure.nbr_index[structure.chunk_block]  # [D, 2^d]
    rows = node_fields[dest_blocks.reshape(-1)]  # [D*2^d, F*cpb]
    # ONE static flat-lane take instead of reshape + moveaxis + inv_perm
    # (see merge_images_to_grid — the same opaque-consumer materialization
    # argument, on the window path).
    inv_perm = np.argsort(np.argsort(corner_of_region * cpb + cell_of_region))
    if cell_order is not None:
        inv_perm = inv_perm[np.argsort(cell_order)]
    rc = ncorners * cpb
    f_i, q_i = np.meshgrid(np.arange(nf), np.arange(rc), indexing="ij")
    qp = inv_perm[q_i]
    comb = ((qp // cpb) * nf * cpb + f_i * cpb + qp % cpb).reshape(-1)
    flat = rows.reshape(cfg.max_chunks, ncorners * nf * cpb)
    return flat[:, comb].reshape(cfg.max_chunks, nf, rc)  # [D, F, 8^d]


# ---------------------------------------------------------------------------
# G2P
# ---------------------------------------------------------------------------


def g2p_from_windows(
    grid: GridParams,
    cfg: BlockConfig,
    structure: BlockStructure,
    position_sorted,
    windows,
    group_size: int = 256,
    with_psi: bool = True,
):
    """APIC gather from window images.

    windows [D, d(+1), 8^d]: velocity (d channels) [+ psi ratio].
    Returns per-chunk-slot (velocity [D, C, d], velocity_gradient [D, C, d, d],
    velocity_gradient_det [D, C], psi_gather [D, C]).
    """
    dim = grid.dim
    h = grid.cell_width
    invd = kernel_inv_d(h)
    d_, c = cfg.max_chunks, cfg.chunk_size

    (valid, pos) = gather_chunks(cfg, structure, position_sorted)

    def body(carry, inputs):
        pos_g, win_g = inputs
        w_ax_g, dpt_ax_g = window_coords(grid, pos_g)
        w = _outer_weights(w_ax_g)  # [G, C, RC]
        vel_psi = jnp.einsum(
            "gfp,gcp->gfc", win_g, w, preferred_element_type=jnp.float32
        )  # [G, d(+1), C]
        grads = []
        det = 0.0
        for j in range(dim):
            wd = _outer_weights_d(w_ax_g, dpt_ax_g, j)
            gj = jnp.einsum(
                "gfp,gcp->gfc",
                win_g[:, :dim, :],
                wd,
                preferred_element_type=jnp.float32,
            )  # [G, d(i), C] = sum w*dpt_j*v_i
            grads.append(gj)
            det = det + gj[:, j, :]
        grad = jnp.stack(grads, axis=2) * invd  # [G, d(i), d(j), C]
        det = det * invd
        return carry, (vel_psi, grad, det)

    g = group_size
    n_groups = -(-d_ // g)
    pad = n_groups * g - d_

    def pad_g(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)).reshape(
            (n_groups, g) + x.shape[1:]
        )

    _, (vel_psi, grad, det) = jax.lax.scan(
        body, None, (pad_g(pos), pad_g(windows))
    )
    nchan = dim + (1 if with_psi else 0)
    vel_psi = vel_psi.reshape(n_groups * g, nchan, c)[:d_]
    grad = grad.reshape(n_groups * g, dim, dim, c)[:d_]
    det = det.reshape(n_groups * g, c)[:d_]

    velocity = jnp.moveaxis(vel_psi[:, :dim, :], 1, -1)  # [D, C, d]
    psi = vel_psi[:, dim, :] if with_psi else jnp.zeros_like(det)
    grad = jnp.moveaxis(grad, -1, 1)  # [D, C, d, d]
    return velocity, grad, det, psi, valid


def slot_flat_index(cfg: BlockConfig, structure: BlockStructure, inv_perm):
    """[N] flat chunk-slot index of every particle (original order) + mask."""
    c = cfg.chunk_size
    s = inv_perm
    b = structure.sorted_block[s]
    bsafe = jnp.clip(b, 0, cfg.max_blocks - 1)
    rank = s - structure.block_start[bsafe]
    chunk = structure.block_first_chunk[bsafe] + rank // c
    slot = rank % c
    flat = jnp.clip(chunk, 0, cfg.max_chunks - 1) * c + slot
    ok = b >= 0
    return jnp.where(ok, flat, 0), ok


def gather_slot_rows(cfg: BlockConfig, structure: BlockStructure, inv_perm, slot_rows):
    """One row-gather mapping packed slot outputs [D*C, F] back to particles
    [N, F] (row gathers cost per-row on TPU, so one wide gather beats one
    narrow gather per field)."""
    flat, ok = slot_flat_index(cfg, structure, inv_perm)
    vals = slot_rows[flat]
    return jnp.where(ok[:, None], vals, 0.0)


def scatter_slots_to_particles(
    cfg: BlockConfig, structure: BlockStructure, inv_perm, *slot_arrays
):
    """Map chunk-slot values back to particles (original order) via gather.

    Original particle i sits at sorted position s = inv_perm[i] in block b;
    its chunk slot is (block_first_chunk[b] + rank//C, rank%C) with
    rank = s - block_start[b]. One composed narrow gather per array.
    """
    c = cfg.chunk_size
    n = inv_perm.shape[0]
    s = inv_perm
    b = structure.sorted_block[s]  # [N] dense block id or -1
    bsafe = jnp.clip(b, 0, cfg.max_blocks - 1)
    rank = s - structure.block_start[bsafe]
    chunk = structure.block_first_chunk[bsafe] + rank // c
    slot = rank % c
    flat = jnp.clip(chunk, 0, cfg.max_chunks - 1) * c + slot
    ok = b >= 0
    flat = jnp.where(ok, flat, 0)
    out = []
    for a in slot_arrays:
        flatarr = a.reshape((cfg.max_chunks * c,) + a.shape[2:])
        val = flatarr[flat]
        val = jnp.where(ok.reshape((n,) + (1,) * (val.ndim - 1)), val, 0.0)
        out.append(val)
    return tuple(out)
