"""Pallas TPU kernels for the fused APIC window transfers.

The TPU counterpart of the reference's fused `g2p2g` CUDA kernel
(ref: sparkl `src_kernels/cuda/g2p2g.rs:64-553`): one program per dispatch
chunk; the 8^d-cell window weight matrices are built **in VMEM** and
immediately consumed by MXU dots, so the [C, 8^d] weight tensors never hit
HBM (the pure-XLA path materializes ~30 GB/substep of them at 500k
particles — the dominant cost). Slot data arrives through the normal Pallas
input pipeline (double-buffered automatically) from a pre-gathered f-major
chunk-slot array; invalid slots are zeroed at gather time so the kernels are
completely branch-free.

Two kernels per substep (grid update must complete globally in between):
  * p2g_window_kernel : particle slots -> per-chunk window images [D, 1+d+2, 8^d]
  * g2p_window_kernel : window velocity/psi images -> per-slot gathers

Outputs feed the same row-granular merge/scatter machinery as the XLA path
(sparse/transfer.py), which stays the single source of truth for layouts.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.math.kernel import inv_d as kernel_inv_d
from sparkl_tpu.sparse.blocks import BLOCK_SIDE, region_cells, region_side

# Packed slot row layout (f-major [D, NF_IN, C]):
#   0..d-1   position
#   d        mass
#   d+1..2d  velocity
#   2d+1..   affine (row-major d*d)
#   ..       psi_mass, psi_momentum
def packed_rows(dim):
    # Rounded up to the f32 sublane tile (8).
    n = 2 * dim + dim * dim + 3
    return -(-n // 8) * 8


def pack_p2g_inputs(position, mass, velocity, affine, psi_mass, psi_mom):
    """Packed per-particle transfer fields [N, NF_IN]."""
    n, d = position.shape
    cols = [position[:, ax] for ax in range(d)]
    cols.append(mass)
    cols += [velocity[:, ax] for ax in range(d)]
    for i in range(d):
        for j in range(d):
            cols.append(affine[:, i, j])
    cols.append(psi_mass)
    cols.append(psi_mom)
    while len(cols) < packed_rows(d):
        cols.append(jnp.zeros_like(mass))
    return jnp.stack(cols, axis=1)


def gather_slot_data(cfg, structure, packed):
    """[N, NF] packed fields -> f-major chunk-slot layout [D, NF, C].

    Invalid slots (padding past chunk_count) are zeroed — downstream kernels
    rely on zero payloads instead of masks.
    """
    d_, c = cfg.max_chunks, cfg.chunk_size
    src = structure.chunk_start[:, None] + jnp.arange(c, dtype=jnp.int32)[None, :]
    valid = jnp.arange(c, dtype=jnp.int32)[None, :] < structure.chunk_count[:, None]
    src = jnp.where(valid, src, 0)
    src = structure.sorted_ids[src.reshape(-1)]
    slots = packed[src].reshape(d_, c, packed.shape[1])
    slots = slots * valid[..., None]
    return jnp.moveaxis(slots, 1, 2)  # [D, NF, C]


def _axis_weights(grid: GridParams, pos_ax, ax):
    """Region-axis weights/dpt for one axis: pos_ax [C] -> ([8, C], [8, C])."""
    h = grid.cell_width
    origin = grid.origin[ax]
    xg = (pos_ax - origin) / h
    base = jnp.round(xg).astype(jnp.int32) - 1
    fx = xg - base.astype(jnp.float32)
    lb = base - (base // BLOCK_SIDE) * BLOCK_SIDE  # 0..3

    c = pos_ax.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (region_side(), c), 0)  # [8, C]
    rel = r - lb[None, :]
    w0 = 0.5 * (1.5 - fx) ** 2
    w1 = 0.75 - (fx - 1.0) ** 2
    w2 = 0.5 * (fx - 0.5) ** 2
    w = (
        w0[None, :] * (rel == 0)
        + w1[None, :] * (rel == 1)
        + w2[None, :] * (rel == 2)
    )
    px = lb.astype(jnp.float32) + fx
    dpt = (r.astype(jnp.float32) - px[None, :]) * h
    return w, dpt


def _outer3(a, b, c_):
    rs, c = a.shape
    w = a[:, None, None, :] * b[None, :, None, :] * c_[None, None, :, :]
    return w.reshape(rs * rs * rs, c)


def _outer2(a, b):
    rs, c = a.shape
    w = a[:, None, :] * b[None, :, :]
    return w.reshape(rs * rs, c)


def _window_tensors(grid, pos_rows, dim):
    """Per-axis weights -> (W, [Wd_ax...]) each [8^d, C], VMEM-resident."""
    ws, dpts = [], []
    for ax in range(dim):
        w, dpt = _axis_weights(grid, pos_rows[ax], ax)
        ws.append(w)
        dpts.append(dpt)
    if dim == 2:
        w_full = _outer2(ws[0], ws[1])
        wd = [
            _outer2(ws[0] * dpts[0], ws[1]),
            _outer2(ws[0], ws[1] * dpts[1]),
        ]
    else:
        w_full = _outer3(ws[0], ws[1], ws[2])
        wd = [
            _outer3(ws[0] * dpts[0], ws[1], ws[2]),
            _outer3(ws[0], ws[1] * dpts[1], ws[2]),
            _outer3(ws[0], ws[1], ws[2] * dpts[2]),
        ]
    return w_full, wd


def _dot(a, b):
    """a [M, K] x b [K, N] -> [M, N]."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_nt(a, b):
    """a [M, K] x b [N, K] -> [M, N] (contract last dims, no transpose op)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# P2G
# ---------------------------------------------------------------------------


def _p2g_kernel(grid, dim, with_psi, slots_ref, out_ref):
    data = slots_ref[0]  # [NF_IN, C]
    pos_rows = [data[ax, :] for ax in range(dim)]
    w_full, wd = _window_tensors(grid, pos_rows, dim)  # [RC, C] each

    m = data[dim, :]
    vel = data[dim + 1 : 2 * dim + 1, :]  # [d, C]
    a_off = 2 * dim + 1
    psi_m = data[a_off + dim * dim, :]
    psi_mom = data[a_off + dim * dim + 1, :]

    # [m, m*v...[, psi_mom, psi_m]] through plain W; momentum additionally
    # gets the affine columns through the dpt-weighted windows. Channels
    # assembled by concatenation (Mosaic has no scatter/in-place add).
    parts = [m[None, :], m[None, :] * vel]
    if with_psi:
        parts += [psi_mom[None, :], psi_m[None, :]]
    p0 = jnp.concatenate(parts, axis=0)  # [1+d(+2), C]
    base_img = _dot_nt(p0, w_full)  # [(1+d+2), RC]

    mom = base_img[1 : 1 + dim, :]
    for j in range(dim):
        a_col = jnp.concatenate(
            [data[a_off + r * dim + j : a_off + r * dim + j + 1, :] for r in range(dim)],
            axis=0,
        )  # affine column j, rows i
        mom = mom + _dot_nt(a_col, wd[j])

    out_parts = [base_img[:1, :], mom]
    if with_psi:
        out_parts.append(base_img[1 + dim :, :])
    out_ref[0] = jnp.concatenate(out_parts, axis=0)


def _out_shape(shape, vma):
    # Inside shard_map, pallas_call outputs must declare how they vary over
    # the mesh (check_vma): the caller passes its mesh axis names via `vma`.
    if vma:
        return jax.ShapeDtypeStruct(shape, jnp.float32, vma=frozenset(vma))
    return jax.ShapeDtypeStruct(shape, jnp.float32)


def p2g_windows_pallas(
    grid: GridParams, cfg, slot_data, interpret=False, with_psi=True, vma=None
):
    """slot_data [D, NF_IN, C] -> window images [D, 1+d(+2), 8^d]."""
    dim = grid.dim
    c = cfg.chunk_size
    rc = region_cells(dim)
    nf = 1 + dim + (2 if with_psi else 0)
    d_ = cfg.max_chunks
    nf_in = packed_rows(dim)

    kernel = functools.partial(_p2g_kernel, grid, dim, with_psi)
    return pl.pallas_call(
        kernel,
        grid=(d_,),
        in_specs=[
            pl.BlockSpec((1, nf_in, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, nf, rc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=_out_shape((d_, nf, rc), vma),
        interpret=interpret,
    )(slot_data)


# ---------------------------------------------------------------------------
# G2P
# ---------------------------------------------------------------------------


def _g2p_kernel(grid, dim, with_psi, slots_ref, win_ref, out_ref):
    data = slots_ref[0]
    pos_rows = [data[ax, :] for ax in range(dim)]
    w_full, wd = _window_tensors(grid, pos_rows, dim)  # [RC, C]

    win = win_ref[0]  # [d(+1), RC]
    win_v = win[:dim, :]

    invd = kernel_inv_d(grid.cell_width)

    vel = _dot(win_v, w_full)  # [d, C]
    grads = [invd * _dot(win_v, wd[j]) for j in range(dim)]  # each [d(i), C]
    parts = [vel] + grads
    if with_psi:
        parts.append(_dot(win[dim : dim + 1, :], w_full))  # [1, C]
    out_ref[0] = jnp.concatenate(parts, axis=0)


def g2p_windows_pallas(
    grid: GridParams, cfg, slot_data, windows, interpret=False, with_psi=True, vma=None
):
    """windows [D, d(+1), 8^d] (velocity [+ psi ratio]) -> slot outputs
    [D, d + d*d (+1), C]; rows = [vel(d), grad cols j-major (d*d)[, psi]]."""
    dim = grid.dim
    c = cfg.chunk_size
    rc = region_cells(dim)
    d_ = cfg.max_chunks
    nf_in = packed_rows(dim)
    n_win = dim + (1 if with_psi else 0)
    nf_out = dim + dim * dim + (1 if with_psi else 0)

    kernel = functools.partial(_g2p_kernel, grid, dim, with_psi)
    return pl.pallas_call(
        kernel,
        grid=(d_,),
        in_specs=[
            pl.BlockSpec((1, nf_in, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_win, rc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, nf_out, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=_out_shape((d_, nf_out, c), vma),
        interpret=interpret,
    )(slot_data, windows)
