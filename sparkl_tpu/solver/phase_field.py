"""CD-MPM phase-field damage: matrix-free Jacobi-preconditioned CG on grid DOFs.

Ref: sparkl `src/dynamics/phase_field.rs:11-317` — per substep:
  init P2G (cell phase average + RHS), Jacobi diag (Mii + Hii)^-1,
  <=25 PCG iterations with matrix-free A·p via a G2P (particle phase_buf
  gradient gather) followed by a P2G (cell gather), then a monotone,
  [0,1]-clamped phase collection back to particles (phase only decreases —
  phase_field.rs:314 `particle.phase.min(new_phase).max(0.0)`).

All transfers are the standard quadratic-B-spline stencil with scalar (or
gradient) payloads, expressed as dense scatter/gathers; deterministic — no
region coloring needed. The m_c > 0 / <= 0 branch split (mobile vs driven
particles) follows the reference exactly, including its asymmetric Mii
between preconditioner and operator (the preconditioner is approximate; any
SPD diagonal is valid).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sparkl_tpu.core.grid import GridParams, stencil_offsets
from sparkl_tpu.math import linalg
from sparkl_tpu.math.kernel import quadratic_weights_1d, inv_d as kernel_inv_d
from sparkl_tpu.solver.dense import base_cell_and_fx, _flat_index

NUM_CG_STEPS = 25
RESIDUAL_PHASE = 0.0
CG_TOL = 1.0e-6


class DenseNodeSpace:
    """CG work arrays over the full dense grid (one slot per node)."""

    def __init__(self, grid: GridParams):
        self.grid = grid
        self.size = grid.num_nodes

    def flat(self, idx):
        return _flat_index(self.grid, idx)


class BlockNodeSpace:
    """CG work arrays over the active-block node table: one slot per cell of
    each active grid block (+ one trash row for out-of-table nodes). This is
    the TPU-first replacement for the reference's SpGrid-resident phase
    field (phase_field.rs runs on the sparse grid, never a dense one):
    work arrays shrink from res^d to (active_blocks+1)*4^d.

    `block_offset` selects the key geometry: 0 for the round-1 space
    (block b stores cells [4b, 4b+4)), 1 for the fused ob2 space (block bc
    stores cells [4(bc-1), 4bc) — structure.py block_space_ob2).
    """

    def __init__(self, grid: GridParams, grid_keys, bspace, block_offset=0):
        from sparkl_tpu.sparse.blocks import BLOCK_SIDE

        self.grid = grid
        self.keys = grid_keys  # [MGB] sorted, sentinel-padded
        self.bspace = tuple(bspace)
        self.off = block_offset
        self.cpb = BLOCK_SIDE ** grid.dim
        self.mgb = int(grid_keys.shape[0])
        self.size = (self.mgb + 1) * self.cpb

    def flat(self, idx):
        from sparkl_tpu.sparse.blocks import BLOCK_SIDE

        d = self.grid.dim
        res = jnp.asarray(self.grid.res, jnp.int32)
        ok = jnp.all((idx >= 0) & (idx < res), axis=-1)
        idxc = jnp.clip(idx, 0, res - 1)
        b = idxc // BLOCK_SIDE + self.off
        local = idxc % BLOCK_SIDE
        key = b[..., 0]
        lflat = local[..., 0]
        for ax in range(1, d):
            key = key * self.bspace[ax] + b[..., ax]
            lflat = lflat * BLOCK_SIDE + local[..., ax]
        row = jnp.searchsorted(self.keys, key).astype(jnp.int32)
        row = jnp.clip(row, 0, self.mgb - 1)
        hit = (self.keys[row] == key) & ok
        row = jnp.where(hit, row, self.mgb)  # trash row
        return row * self.cpb + lflat


def _transfer_geometry(grid: GridParams, position, active, capacity, space):
    """Phase-field transfer stencil.

    The reference's phase-field code mixes the closest-node offset
    (`dir_to_closest_grid_node`) with associated-cell neighbor iteration
    (phase_field.rs:52-56,241-246), which — consistently across init, A·p,
    preconditioner and collect — weights node (c+1) while indexing cell c.
    Net effect: each particle couples to the nodes base+1, base+2 per axis
    with weights w1, w2 (the w0 tap drops out as N(dist>1.5h)=0). We mirror
    that exactly: nodes base+1+off with per-axis weights [w1, w2, 0].
    """
    d = position.shape[-1]
    h = grid.cell_width
    base, fx, in_bounds = base_cell_and_fx(grid, position)
    w1d = quadratic_weights_1d(fx)  # [N, d, 3] = [w0, w1, w2]
    # Shifted taps: [w1, w2, 0].
    w1d = jnp.concatenate([w1d[..., 1:], jnp.zeros_like(w1d[..., :1])], axis=-1)
    offsets = stencil_offsets(d)
    n = capacity
    k = offsets.shape[0]
    weights = jnp.ones((n, k), jnp.float32)
    for ax in range(d):
        weights = weights * w1d[:, ax, offsets[:, ax]]
    weights = weights * (active & in_bounds)[:, None]
    idx = base[:, None, :] + jnp.asarray(offsets, jnp.int32)[None, :, :] + 1
    flat = space.flat(idx)  # [N, K]
    # Geometric distance to the node actually weighted (base+1+off).
    dpt = (jnp.asarray(offsets, jnp.float32)[None] + 1.0 - fx[:, None, :]) * h
    return weights, flat, dpt


def update_phase_field(grid: GridParams, p, models, dt, reduce_fn=None,
                       node_space=None):
    """Particle-pytree wrapper around update_phase_field_arrays."""
    act = p.active
    volume = jnp.where(act, p.volume0 * linalg.det(p.deformation_gradient), 0.0)
    phase = update_phase_field_arrays(
        grid, p.position, act, p.phase, p.psi_pos, p.m_c, p.g, volume, dt,
        reduce_fn=reduce_fn, node_space=node_space,
    )
    return p.replace(phase=phase)


def update_phase_field_arrays(grid: GridParams, position, active, phase0,
                              psi_pos, m_c, g_res, volume, dt,
                              reduce_fn=None, node_space=None):
    """`reduce_fn` sums node-table-sized partial scatters across devices
    (e.g. lax.psum under shard_map) — with it, every shard runs an identical
    CG on the globally-reduced table and only the matrix-free A·p scatter
    needs one reduction per iteration; cross-device reduction requires the
    DENSE node space (block tables have shard-local row layouts). Ref: the
    reference runs CD-MPM single-GPU only; this is the multi-chip extension
    (SURVEY §2.6). `node_space` (default dense) selects the CG work-array
    layout; pass a BlockNodeSpace to keep everything block-sparse."""
    if reduce_fn is None:
        reduce_fn = lambda x: x
    elif isinstance(node_space, BlockNodeSpace):
        raise ValueError("cross-device CD-MPM requires the dense node space")
    space = node_space or DenseNodeSpace(grid)
    h = grid.cell_width
    invd = kernel_inv_d(h)
    l0 = 0.5 * h

    def _scatter(grid_, flat_, vals):
        out = jnp.zeros((space.size,), jnp.float32)
        return out.at[flat_.reshape(-1)].add(vals.reshape(-1), mode="drop")

    weights, flat, dpt = _transfer_geometry(
        grid, position, active, position.shape[0], space
    )  # [N,K], [N,K], [N,K,d]
    dpt2 = jnp.sum(dpt * dpt, axis=-1)  # [N,K]

    # Inactive padding rows carry m_c = f32max (the reference's Real::MAX
    # default); any addition overflows to inf and 0-weight * inf would
    # poison the grids with NaN — zero their coefficient inputs instead.
    act = active
    p_phase = phase0
    mobile = (m_c > 0.0) & act  # the reference's `m_c > 0` branch
    volume = jnp.where(act, volume, 0.0)
    mc = jnp.where(act, jnp.minimum(m_c, 1e30), 0.0)
    inv_g = linalg.inv_exact(g_res)

    # ---- init P2G (phase_field.rs init_conjugate_gradient_p2g) ------------
    w_mobile = weights * mobile[:, None]
    # One bundled cross-device reduction for every init scatter.
    init = reduce_fn(jnp.stack([
        _scatter(grid, flat, w_mobile),
        _scatter(grid, flat, w_mobile * p_phase[:, None]),
        _scatter(grid, flat, w_mobile * (volume * mc)[:, None]),
        _scatter(grid, flat, w_mobile * volume[:, None]),
        _scatter(grid, flat, (weights * (~mobile)[:, None]) * volume[:, None]),
    ]))
    weight_sum, phase_num, r_a, r_b, r_c = init
    cell_phase = phase_num * linalg.inv_exact(weight_sum)  # cg_init_c

    # r = sum_p V*(m_c)*w [mobile] + (sum_p V*w [mobile]) * cell_phase/dt
    #   + sum_p V*w [driven]
    cg_r = r_a + r_b * cell_phase / dt + r_c

    # ---- Jacobi preconditioner (perform_preconditioning) -------------------
    mii_coeff = jnp.where(
        mobile,
        volume * (4.0 * l0 * mc * (1.0 - RESIDUAL_PHASE) * psi_pos * inv_g + mc + 1.0 / dt),
        volume * (4.0 * l0 * (1.0 - RESIDUAL_PHASE) * psi_pos * inv_g),
    )
    hii_coeff = jnp.where(mobile, volume * 4.0 * l0 * l0 * mc, volume * 4.0 * l0 * l0)
    mii_hii = reduce_fn(
        _scatter(grid, flat, weights * mii_coeff[:, None])
        + _scatter(
            grid, flat,
            (weights * invd) * (weights * invd) * dpt2 * hii_coeff[:, None],
        )
    )
    cg_prec = linalg.inv_exact(mii_hii)
    cg_p = cg_prec * cg_r

    # Operator Mii coefficient (compute_ap_g2p2g; note the +1 on the driven
    # branch, unlike the preconditioner — mirrored from the reference).
    m_op_coeff = jnp.where(
        mobile,
        volume * (4.0 * l0 * mc * (1.0 - RESIDUAL_PHASE) * psi_pos * inv_g + mc + 1.0 / dt),
        volume * (4.0 * l0 * (1.0 - RESIDUAL_PHASE) * psi_pos * inv_g + 1.0),
    )
    m_op_sum = reduce_fn(_scatter(grid, flat, weights * m_op_coeff[:, None]))
    grad_coeff = volume * 4.0 * l0 * l0 * jnp.where(mobile, mc, 1.0)  # [N]

    def apply_a(cg_p_grid):
        # G2P: phase_buf = sum_cells grad_coeff * cg_p * inv_d * w * dpt  [N,d]
        cell_p = cg_p_grid[flat]  # [N, K]
        phase_buf = jnp.sum(
            (grad_coeff[:, None] * invd * weights * cell_p)[..., None] * dpt, axis=1
        )
        # P2G: ap = Mii_sum * cg_p + sum_p inv_d * w * (phase_buf . dpt)
        hterm = reduce_fn(_scatter(
            grid, flat, invd * weights * jnp.sum(phase_buf[:, None, :] * dpt, axis=-1)
        ))
        return m_op_sum * cg_p_grid + hterm

    # ---- PCG loop (conjugate_gradient_step) --------------------------------
    def cond(carry):
        _, r, _, _, it, res = carry
        return (it < NUM_CG_STEPS) & (res >= CG_TOL)

    def body(carry):
        c, r, pvec, prec, it, _ = carry
        ap = apply_a(pvec)
        rz = jnp.sum(r * prec * r)
        pap = jnp.sum(pvec * ap)
        ok = pap != 0.0
        alpha = jnp.where(ok, rz / jnp.where(ok, pap, 1.0), 0.0)
        c = c + alpha * pvec
        r = r - alpha * ap
        r1r1 = jnp.sum(r * r)
        r1z1 = jnp.sum(r * prec * r)
        beta = jnp.where(rz != 0.0, r1z1 / jnp.where(rz != 0.0, rz, 1.0), 0.0)
        pvec = prec * r + beta * pvec
        res = jnp.where(ok, r1r1, 0.0)
        return (c, r, pvec, prec, it + 1, res)

    cg_c = jnp.zeros_like(cg_r)
    carry = (cg_c, cg_r, cg_p, cg_prec, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf))
    cg_c, _, _, _, _, _ = jax.lax.while_loop(cond, body, carry)

    # ---- collect (collect_results_g2p) --------------------------------------
    delta = cg_c - cell_phase  # (cg_c - cg_init_c) for the mobile branch
    cell_vals_mobile = delta[flat]
    cell_vals_driven = cg_c[flat]
    gathered = jnp.where(
        mobile[:, None], cell_vals_mobile, cell_vals_driven
    )
    new_phase = jnp.where(mobile, p_phase, 0.0) + jnp.sum(weights * gathered, axis=1)
    phase = jnp.maximum(jnp.minimum(p_phase, new_phase), 0.0)
    return jnp.where(act, phase, p_phase)
