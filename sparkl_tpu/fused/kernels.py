"""Fused Pallas substep kernels over persistent slot state.

The TPU counterpart of the reference's single fused g2p2g CUDA kernel
(ref: sparkl `src_kernels/cuda/g2p2g.rs:64-553` + the full particle physics
in `src_kernels/cuda/particle_updater.rs:72-236`). Split into two kernels at
the grid-update barrier — the reference rotates its substep loop so gather
and scatter share one kernel across that barrier, which changes first-substep
semantics; keeping the CPU pipeline's stage order (P2G -> grid update -> G2P,
ref `src/dynamics/solver/mls_solver.rs:36-130`) costs one extra pass over
slot state (~0.5 ms/1M at HBM bandwidth) and keeps trajectories identical to
the reference CPU semantics that the test suite pins:

  * p2g_fused — constitutive Kirchhoff stress (with SVD), APIC affine, psi
    channels, and the 8^d window scatter images, all in VMEM.
  * g2p_fused — window gather, advection, F update, plastic return maps,
    failure guards + failure model, pos-energy, out-of-grid marking, and the
    NEXT substep's dt bound, writing the new slot tensor in one pass.

Each program processes R = 8 chunks so per-particle math runs on [8, C]
tiles (full VPU sublane utilization — [1, C] rows would idle 7/8 of the
vector unit); the per-chunk window matmuls are statically unrolled over R.
Matrices live as nested lists of [R, C] rows via the component-wise cores in
models/ (the same code tested against the array implementations); trailing
small dims never materialize.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.math import cmat
from sparkl_tpu.math.kernel import inv_d as kernel_inv_d
from sparkl_tpu.math.svd import svd_c
from sparkl_tpu.models import constitutive as con
from sparkl_tpu.models import failure as fail
from sparkl_tpu.models import plasticity as plas
from sparkl_tpu.sparse.blocks import region_cells, region_side
from sparkl_tpu.fused import layout as L

# Chunks per Pallas program. The per-chunk loop keeps per-particle math on
# [8, C] tiles either way; LARGER values amortize per-program fixed costs
# (block DMA issue, gate check, weight-table SMEM reads) over more chunks.
# Round-3b measured nr=8 best on the THEN-kernels; round 5 re-measured on
# the aliased/gated kernels at sand3@1M: nr=8 93.4 M pups/s median,
# nr=32 99.2, nr=64 99.0 (the round-3 nr=64 scoped-VMEM OOM is gone — the
# in-place slot aliasing halved resident VMEM). Default 32. Env-overridable
# (SPARKL_CHUNKS_PER_PROGRAM); _r_of halves it until it divides max_chunks,
# so any power-of-two works with any capacity quantum.
CHUNKS_PER_PROGRAM = int(__import__("os").environ.get(
    "SPARKL_CHUNKS_PER_PROGRAM", "32"))
if CHUNKS_PER_PROGRAM < 1 or (CHUNKS_PER_PROGRAM & (CHUNKS_PER_PROGRAM - 1)):
    raise ValueError(
        "SPARKL_CHUNKS_PER_PROGRAM must be a positive power of two "
        f"(got {CHUNKS_PER_PROGRAM}); non-power-of-two values would "
        "silently decay to a smaller batch in _r_of"
    )

# Packed model-table columns (SMEM): f32 [M, 16] = cparams(0:4) | pparams(4:12)
# | fparams(12:14) | pad; i32 [M, 4] = ctype | ptype | ftype | pad.
TAB_C = 0
TAB_P = 4
TAB_F = 12


def pack_model_tables(models):
    """ModelSet -> (tab_f32 [M, 16], tab_i32 [M, 4]) for SMEM prefetch."""
    tab_f = jnp.concatenate([models.cparams, models.pparams, models.fparams], axis=1)
    pad = 16 - tab_f.shape[1]
    if pad > 0:
        tab_f = jnp.concatenate(
            [tab_f, jnp.zeros((tab_f.shape[0], pad), tab_f.dtype)], axis=1
        )
    tab_i = jnp.stack(
        [models.ctype, models.ptype, models.ftype, jnp.zeros_like(models.ctype)],
        axis=1,
    )
    return tab_f.astype(jnp.float32), tab_i.astype(jnp.int32)


def _vary(vma, *arrays):
    """Under shard_map with check_vma, all pallas_call operands must share
    mesh-axis variance (interpret mode evaluates the kernel jaxpr, where
    mixed replicated/varying refs trip dynamic_slice's vma check). pcast the
    replicated ones (constant tables, traced scalars) up to `vma` — a no-op
    at runtime."""
    if not vma:
        return arrays
    want = frozenset(vma)
    out = []
    for x in arrays:
        have = frozenset(getattr(jax.typeof(x), "vma", frozenset()))
        missing = tuple(sorted(want - have))
        out.append(
            jax.lax.pcast(x, missing, to="varying") if missing else x
        )
    return tuple(out)


def _out_shape(shape, dtype, vma):
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))
    return jax.ShapeDtypeStruct(shape, dtype)


def _r_of(cfg, interpret=False, cap=None):
    # Interpreter mode (CPU CI): nr=1 — the kernel body is traced per chunk
    # in a Python loop, so R=8 unrolling octuples trace/compile time for
    # zero benefit off-hardware.
    if interpret:
        return 1
    r = CHUNKS_PER_PROGRAM if cap is None else min(CHUNKS_PER_PROGRAM, cap)
    while r > 1 and cfg.max_chunks % r != 0:
        r //= 2
    return r


def _mat(row, base, d):
    return [[row(base + i * d + j) for j in range(d)] for i in range(d)]


def _select_param(tab_ref, mid, m_count, col):
    """Per-slot parameter: masked blend over the model table rows.

    m_count == 1 returns the SMEM scalar itself (every slot, active or
    garbage, has mid == 0): parameter-only math (e.g. the DP alpha's
    exp/sin) then runs on the scalar core and stays out of the vector
    dependency chain, and [R, C] parameter tiles stop occupying vregs."""
    if m_count == 1:
        return tab_ref[0, col]
    acc = jnp.zeros(mid.shape, jnp.float32)
    for m in range(m_count):
        acc = jnp.where(mid == m, tab_ref[m, col], acc)
    return acc


def _select_itype(tab_ref, mid, m_count, col):
    if m_count == 1:
        return tab_ref[0, col]
    acc = jnp.zeros(mid.shape, jnp.int32)
    for m in range(m_count):
        acc = jnp.where(mid == m, tab_ref[m, col], acc)
    return acc


def _transfer_masks(grid: GridParams, data, iref, dim, rows: "L.Rows"):
    """Batched per-slot masks [R, C]: window membership (the +-1 drift slack
    of the off-by-two association) and stencil-in-grid."""
    h = grid.cell_width
    rs = region_side()
    in_window = None
    in_bounds = None
    for ax in range(dim):
        xg = (data[:, rows.pos + ax, :] - grid.origin[ax]) / h
        base = jnp.round(xg).astype(jnp.int32) - 1
        rel = base - iref[:, L.I_ORIGIN + ax, :]
        okw = (rel >= 0) & (rel <= rs - 3)
        okb = (base >= 0) & (base + 2 <= grid.res[ax] - 1)
        in_window = okw if in_window is None else (in_window & okw)
        in_bounds = okb if in_bounds is None else (in_bounds & okb)
    return in_window, in_bounds


def _axis_weights_chunk(grid: GridParams, data, iref, dim, rows: "L.Rows", i):
    """Per-axis window weight rows for chunk i of the program's R chunks.

    Weight placement is the particle's base cell RELATIVE TO THE CHUNK'S
    window origin (int rows written at sort time) — valid for +-1 cell of
    drift past the sort, the slack the reference's g2p2g exploits for
    particles that moved cells (`g2p2g.rs:297-309`). Out-of-window lanes
    produce zero weights. Returns (w_axes, wd_axes): per-axis lists of
    [8, C] tensors, wd_axes[ax] = w_axes[ax] * dpt_axes[ax] (the dpt-weighted
    taps the APIC gradient transfers use).
    """
    h = grid.cell_width
    rs = region_side()
    c = data.shape[2]
    r2 = jax.lax.broadcasted_iota(jnp.int32, (rs, c), 0)

    w_axes, wd_axes = [], []
    for ax in range(dim):
        xg = (data[i, rows.pos + ax, :] - grid.origin[ax]) / h  # [C]
        base = jnp.round(xg).astype(jnp.int32) - 1
        fx = xg - base.astype(jnp.float32)
        rel = base - iref[i, L.I_ORIGIN + ax, :]

        rr = r2 - rel[None, :]
        w0 = 0.5 * (1.5 - fx) ** 2
        w1 = 0.75 - (fx - 1.0) ** 2
        w2 = 0.5 * (fx - 0.5) ** 2
        w = (
            w0[None, :] * (rr == 0)
            + w1[None, :] * (rr == 1)
            + w2[None, :] * (rr == 2)
        )
        px = rel.astype(jnp.float32) + fx
        dpt = (r2.astype(jnp.float32) - px[None, :]) * h
        w_axes.append(w)
        wd_axes.append(w * dpt)
    return w_axes, wd_axes


def _dot(a, b):
    """[M, K] x [K, N] -> [M, N] on the MXU."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_nt(a, b):
    """[M, K] x [N, K] -> [M, N]."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _acc(acc, v):
    return v if acc is None else acc + v


def _type_mask(sel, code, present, m_count, exhaustive=False):
    """Per-slot mask for "model type == code", folded to a STATIC bool when
    the scene makes it knowable at trace time: single-model scenes (the
    flagship bench shape) then skip every masked type blend in the kernels —
    the where_mat selects, the unused-branch math (e.g. the solid F-update
    matmul in a fluid scene), and the zeros/inf default broadcasts.

    Returns True (statically all slots), False (statically none), or the
    runtime [R, C] / scalar compare. `sel` is _select_itype's result; with
    m_count == 1 it is the single model's SMEM scalar, and `present` (a
    static tuple from ModelSet.pack) pins its value at trace time.

    `exhaustive=True` asserts `present` covers EVERY model (true for
    present_c — every model has a ctype; NOT for present_p/present_f, which
    exclude the NONE codes), letting multi-model single-type scenes fold
    statically too."""
    if code not in present:
        return False
    if m_count == 1 or (exhaustive and len(present) == 1):
        return True
    return sel == code


def _where_t(m, a, b):
    """jnp.where with a _type_mask predicate (static bools short-circuit)."""
    if m is True:
        return a
    if m is False:
        return b
    return jnp.where(m, a, b)


def _where_mat_t(m, a, b):
    if m is True:
        return a
    if m is False:
        return b
    return cmat.where_mat(m, a, b)


def _kirchhoff_stress_c(meta, tab_f, tab_i, mid, phase, eh, f, g, mass, vol0):
    """In-kernel mirror of registry.kirchhoff_stress (component-wise)."""
    m_count, present_c = meta["m_count"], meta["present_c"]
    ct = _select_itype(tab_i, mid, m_count, 0)
    p = [_select_param(tab_f, mid, m_count, TAB_C + k) for k in range(4)]
    stress = cmat.zeros_like_mat(f)
    if con.COROTATED in present_c:
        s = con.corotated_kirchhoff_stress_c(p[0], p[1], p[3], phase, eh, f)
        stress = _where_mat_t(
            _type_mask(ct, con.COROTATED, present_c, m_count, exhaustive=True), s, stress)
    if con.NEO_HOOKEAN in present_c:
        s = con.neo_hookean_kirchhoff_stress_c(p[0], p[1], phase, eh, f)
        stress = _where_mat_t(
            _type_mask(ct, con.NEO_HOOKEAN, present_c, m_count, exhaustive=True), s, stress)
    if con.EOS_MONAGHAN_SPH in present_c:
        fluid_j = f[0][0]
        density_fluid = (mass / jnp.maximum(vol0, 1e-30)) / jnp.maximum(
            fluid_j, 1e-20
        )
        s = con.eos_kirchhoff_stress_c(
            p[0], p[1], p[2], p[3], mass, vol0, density_fluid, fluid_j, g
        )
        stress = _where_mat_t(
            _type_mask(ct, con.EOS_MONAGHAN_SPH, present_c, m_count, exhaustive=True), s, stress)
    return stress


def _pos_energy_c(meta, tab_f, tab_i, mid, phase, eh, f, s=None):
    """s: optional precomputed singular values of f (order-free use) — lets
    the stress-cache epilogue share ONE SVD between energy and stress."""
    m_count, present_c = meta["m_count"], meta["present_c"]
    ct = _select_itype(tab_i, mid, m_count, 0)
    p = [_select_param(tab_f, mid, m_count, TAB_C + k) for k in range(2)]
    out = jnp.zeros_like(phase)
    if con.COROTATED in present_c:
        if s is not None:
            e = con.corotated_pos_energy_from_s_c(p[0], p[1], eh, f, s)
        else:
            e = con.corotated_pos_energy_c(p[0], p[1], eh, f)
        out = _where_t(_type_mask(ct, con.COROTATED, present_c, m_count, exhaustive=True), e, out)
    if con.NEO_HOOKEAN in present_c:
        e = con.neo_hookean_pos_energy_c(p[0], p[1], phase, eh, f)
        out = _where_t(_type_mask(ct, con.NEO_HOOKEAN, present_c, m_count, exhaustive=True), e, out)
    return out


def _sym_expand(st, dim):
    """Upper-triangle stress rows -> full nested-list matrix."""
    if dim == 2:
        return [[st[0], st[1]], [st[1], st[2]]]
    return [
        [st[0], st[1], st[2]],
        [st[1], st[3], st[4]],
        [st[2], st[4], st[5]],
    ]


def _cached_stress_epilogue_c(meta, tab_f, tab_i, mid, phase, eh, f, usv):
    """Stress for the cache rows (kernel B epilogue): corotated from the
    shared SVD, neo-hookean closed-form. EOS fluids are left ZERO — their
    F00 is refreshed by the inter-kernel fluids-volume pass, so kernel A
    computes EOS stress fresh (it needs no SVD)."""
    m_count, present_c = meta["m_count"], meta["present_c"]
    ct = _select_itype(tab_i, mid, m_count, 0)
    p = [_select_param(tab_f, mid, m_count, TAB_C + k) for k in range(4)]
    stress = cmat.zeros_like_mat(f)
    if con.COROTATED in present_c:
        u, s, v = usv
        st = con.corotated_kirchhoff_stress_from_svd_c(
            p[0], p[1], p[3], phase, eh, f, u, s, v
        )
        stress = _where_mat_t(
            _type_mask(ct, con.COROTATED, present_c, m_count, exhaustive=True), st, stress)
    if con.NEO_HOOKEAN in present_c:
        st = con.neo_hookean_kirchhoff_stress_c(p[0], p[1], phase, eh, f)
        stress = _where_mat_t(
            _type_mask(ct, con.NEO_HOOKEAN, present_c, m_count, exhaustive=True), st, stress)
    return stress


def _cached_stress_read_c(meta, tab_f, tab_i, mid, row, rows, f, g, mass, vol0):
    """Kernel A's stress under meta["stress_cache"]: read the symmetric
    cache rows written by the previous kernel B (or pack), then overlay a
    fresh EOS evaluation for fluids (see _cached_stress_epilogue_c)."""
    dim = len(f)
    m_count, present_c = meta["m_count"], meta["present_c"]
    st = [row(rows.stress + k) for k in range(rows.nstress)]
    stress = _sym_expand(st, dim)
    if con.EOS_MONAGHAN_SPH in present_c:
        ct = _select_itype(tab_i, mid, m_count, 0)
        p = [_select_param(tab_f, mid, m_count, TAB_C + k) for k in range(4)]
        fluid_j = f[0][0]
        density_fluid = (mass / jnp.maximum(vol0, 1e-30)) / jnp.maximum(
            fluid_j, 1e-20
        )
        s_eos = con.eos_kirchhoff_stress_c(
            p[0], p[1], p[2], p[3], mass, vol0, density_fluid, fluid_j, g
        )
        stress = _where_mat_t(
            _type_mask(ct, con.EOS_MONAGHAN_SPH, present_c, m_count, exhaustive=True),
            s_eos, stress)
    return stress


def _timestep_bound_c(meta, tab_f, tab_i, mid, phase, eh, f, mass, vol0,
                      vnorm, vsq, cell_width, dim):
    m_count, present_c = meta["m_count"], meta["present_c"]
    ct = _select_itype(tab_i, mid, m_count, 0)
    p = [_select_param(tab_f, mid, m_count, TAB_C + k) for k in range(4)]
    density0 = mass / jnp.maximum(vol0, 1e-30)
    out = jnp.full(phase.shape, jnp.inf, jnp.float32)
    if con.COROTATED in present_c:
        bulk = (p[0] + 2.0 * p[1] / 3.0) * eh
        shear = p[1] * eh
        b = con.sound_speed_timestep_bound_c(p[2], bulk, shear, density0, vnorm, cell_width)
        out = _where_t(_type_mask(ct, con.COROTATED, present_c, m_count, exhaustive=True), b, out)
    if con.NEO_HOOKEAN in present_c:
        bulk = (p[0] + 2.0 * p[1] / 3.0) * eh
        shear = p[1] * eh
        b = con.sound_speed_timestep_bound_c(p[2], bulk, shear, density0, vnorm, cell_width)
        out = _where_t(_type_mask(ct, con.NEO_HOOKEAN, present_c, m_count, exhaustive=True), b, out)
    if con.EOS_MONAGHAN_SPH in present_c:
        fluid_j = f[0][0]
        density_fluid = density0 / jnp.maximum(fluid_j, 1e-20)
        b = con.eos_timestep_bound_c(
            p[0], p[1], p[3], fluid_j, mass, vol0, density_fluid, vsq,
            cell_width, dim,
        )
        out = _where_t(
            _type_mask(ct, con.EOS_MONAGHAN_SPH, present_c, m_count, exhaustive=True), b, out)
    return out


# ---------------------------------------------------------------------------
# Kernel A: stress + P2G window images
# ---------------------------------------------------------------------------


def _p2g_kernel(grid, meta, nr, slots_ref, ints_ref, dt_ref, nc_ref, tab_f,
                tab_i, out_ref):
    # Live-program gate: chunks >= num_chunks are capacity padding (slot
    # rows zeroed at resort; calibration slack keeps ~1/3 of capacity
    # dead at steady state) — skip their whole per-particle chain. Their
    # images are never merged (the structure tables index live chunks
    # only), so zeros keep the output deterministic and inf/NaN-free.
    live = pl.program_id(0) * nr < nc_ref[0, 0]

    @pl.when(jnp.logical_not(live))
    def _dead():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(live)
    def _live():
        dim = grid.dim
        r = L.Rows(dim)
        data = slots_ref[...]  # [R, NF, C]
        iref = ints_ref[...]  # [R, NI, C]
        dt = dt_ref[0, 0]
        with_psi = meta["with_psi"]
        invd = kernel_inv_d(grid.cell_width)
        row = lambda k: data[:, k, :]  # [R, C]

        mid = iref[:, L.I_MODEL, :]
        flags = iref[:, L.I_FLAGS, :]
        active = (flags & L.ACTIVE) != 0
        failed = row(r.failed) != 0.0
        phase = row(r.phase)
        eh = row(r.eh)
        mass = row(r.mass)
        vol0 = row(r.vol0)
        f = _mat(row, r.defgrad, dim)
        g = _mat(row, r.grad, dim)

        if meta.get("stress_cache"):
            # Stress was computed by the PREVIOUS kernel B (or pack) from the
            # same F this kernel reads — skips this kernel's SVD entirely
            # (measured ~70% of kernel A at 500k). Gated off for damage/failure
            # scenes, whose phase can change between the kernels.
            stress = _cached_stress_read_c(
                meta, tab_f, tab_i, mid, row, r, f, g, mass, vol0
            )
        else:
            stress = _kirchhoff_stress_c(
                meta, tab_f, tab_i, mid, phase, eh, f, g, mass, vol0
            )
        # affine = m*C - V0*invd*dt*sigma, zero stress for failed debris
        # (ref: particle_to_grid.rs / dense.p2g_scatter).
        coeff = vol0 * invd * dt
        affine = [
            [
                mass * g[i][j] - jnp.where(failed, 0.0, coeff * stress[i][j])
                for j in range(dim)
            ]
            for i in range(dim)
        ]

        in_window, in_bounds = _transfer_masks(grid, data, iref, dim, r)
        contrib = (active & in_window & in_bounds).astype(jnp.float32)

        m_c = mass * contrib
        parts = [m_c] + [m_c * row(r.vel + ax) for ax in range(dim)]
        if with_psi:
            cpf = row(r.cpf)
            psi_mass = jnp.where((phase > 0.0) & (cpf != 0.0) & ~failed, mass, 0.0)
            psi_mom = psi_mass * row(r.psi_pos)
            parts += [psi_mom * contrib, psi_mass * contrib]
        p0 = jnp.stack(parts, axis=1)  # [R, 1+d(+2), C]
        a_cols = [
            jnp.stack([contrib * affine[i][j] for i in range(dim)], axis=1)
            for j in range(dim)
        ]  # per j: [R, d, C]

        rs = region_side()
        c = data.shape[2]
        nf0 = 1 + dim + (2 if with_psi else 0)
        for i in range(nr):
            w_ax, wd_ax = _axis_weights_chunk(grid, data, iref, dim, r, i)
            p0_i = p0[i]  # [F0, C]
            acol = [a_cols[j][i] for j in range(dim)]  # per axis j: [d, C]
            td = meta.get("tdtype", jnp.float32)
            if dim == 2:
                # x expansion [F0, 8, C]; affine x-column rides the wdx taps.
                # (Mixed bounded-slice + newaxis indexing lowers through gather
                # in Mosaic — expand first, slice after.)
                base = p0_i[:, None, :] * w_ax[0][None]  # [F0, 8, C]
                extra = acol[0][:, None, :] * wd_ax[0][None]  # [d, 8, C]
                b = jnp.concatenate(
                    [base[0:1], base[1 : 1 + dim] + extra]
                    + ([base[1 + dim :]] if with_psi else []),  # 0-size slices
                    axis=0,                                     # invalid in Mosaic
                )
                b_al = acol[1][:, None, :] * w_ax[0][None]
                out1 = _dot_nt(b.reshape(nf0 * rs, c).astype(td), w_ax[1].astype(td))
                out2 = _dot_nt(
                    b_al.reshape(dim * rs, c).astype(td), wd_ax[1].astype(td)
                )
                out_ref[i] = jnp.concatenate(
                    [out1[:rs], out1[rs : rs * (1 + dim)] + out2]
                    + ([out1[rs * (1 + dim) :]] if with_psi else []),
                    axis=0,
                )
            else:
                # z-major factorization: expand the CHEAP axis (8 z-taps) on the
                # VPU and contract the 64-wide xy sheet on the MXU — output rows
                # (flavor, z), lanes xy. vs the round-3a form ([F*64, C] @ [C, 8])
                # this is ~4x fewer streamed MXU rows (104 vs 448 per chunk; dot
                # cost is M-bound on the MXU) and ~8x less VPU expansion. The
                # emitted region-cell order is z-major (q = z*64 + x*8 + y);
                # merge/windows fold the relabel into their existing constant
                # permutations (transfer.ZMAJOR_ORDER_3D).
                w_xy = (w_ax[0][:, None, :] * w_ax[1][None, :, :]).reshape(
                    rs * rs, c
                )
                wd_xy_x = (wd_ax[0][:, None, :] * w_ax[1][None, :, :]).reshape(
                    rs * rs, c
                )
                wd_xy_y = (w_ax[0][:, None, :] * wd_ax[1][None, :, :]).reshape(
                    rs * rs, c
                )
                wz, wdz = w_ax[2], wd_ax[2]
                bz = p0_i[:, None, :] * wz[None]  # [F0, 8, C]
                az_x = acol[0][:, None, :] * wz[None]  # [d, 8, C] vs wd_xy_x
                az_y = acol[1][:, None, :] * wz[None]  # [d, 8, C] vs wd_xy_y
                az_d = acol[2][:, None, :] * wdz[None]  # [d, 8, C] vs w_xy
                m1 = jnp.concatenate(
                    [bz.reshape(nf0 * rs, c), az_d.reshape(dim * rs, c)], axis=0
                )
                o1 = _dot_nt(m1.astype(td), w_xy.astype(td))  # [(F0+d)*8, 64]
                o2 = _dot_nt(az_x.reshape(dim * rs, c).astype(td), wd_xy_x.astype(td))
                o3 = _dot_nt(az_y.reshape(dim * rs, c).astype(td), wd_xy_y.astype(td))
                mom = (
                    o1[rs : rs * (1 + dim)]
                    + o1[nf0 * rs : (nf0 + dim) * rs]
                    + o2
                    + o3
                )
                out_ref[i] = jnp.concatenate(
                    [o1[:rs], mom]
                    + ([o1[rs * (1 + dim) : nf0 * rs]] if with_psi else []),
                    axis=0,
                )


def p2g_fused(grid: GridParams, cfg, meta, slots, ints, dt, tab_f, tab_i,
              interpret=False, vma=None, nchunks=None):
    """Slot state -> window images [D, 1+d(+2), 8^d].

    The kernel emits rows = (flavor, leading axes), lanes = final dot axis —
    in 3D rows (f, z) and lanes xy, making the image region-cell order
    z-major (q = z*64 + x*8 + y, transfer.ZMAJOR_ORDER_3D); in 2D rows
    (f, x), lanes y (plain row-major). The trailing reshape is a free
    linear-order reinterpretation.

    nchunks (traced scalar, structure.num_chunks) gates the per-program
    physics chain to LIVE chunks: capacity padding (~1/3 of programs at
    calibration slack 1.4) writes zero images and skips everything else.
    None = all programs live (the pre-gate behavior)."""
    dim = grid.dim
    r = L.Rows(dim)
    rc = region_cells(dim)
    rs = region_side()
    nf_out = 1 + dim + (2 if meta["with_psi"] else 0)
    d_ = cfg.max_chunks
    c = cfg.chunk_size
    m = tab_f.shape[0]
    nr = _r_of(cfg, interpret)
    rows_out = nf_out * rs if dim == 3 else nf_out * (rc // rs)

    if nchunks is None:
        nchunks = jnp.asarray(d_, jnp.int32)
    kernel = functools.partial(_p2g_kernel, grid, meta, nr)
    out = pl.pallas_call(
        kernel,
        grid=(d_ // nr,),
        in_specs=[
            pl.BlockSpec((nr, r.nf, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, L.NI, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((m, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((m, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (nr, rows_out, rc * nf_out // rows_out),
            lambda i: (i, 0, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=_out_shape(
            (d_, rows_out, rc * nf_out // rows_out), jnp.float32, vma
        ),
        interpret=interpret,
    )(*_vary(vma, slots, ints, dt.reshape(1, 1),
             nchunks.astype(jnp.int32).reshape(1, 1), tab_f, tab_i))
    return out.reshape(d_, nf_out, rc)


# ---------------------------------------------------------------------------
# Mass-only transfer kernels (fluid volume recomputation,
# ref: fluids_volume.rs recompute_fluids_volumes)
# ---------------------------------------------------------------------------


def _mass_p2g_kernel(grid, nr, slots_ref, ints_ref, nc_ref, out_ref):
    # Live-program gate (see _p2g_kernel): dead capacity chunks would emit
    # all-zero images anyway (contrib masks to 0) — skip the weight math.
    live = pl.program_id(0) * nr < nc_ref[0, 0]

    @pl.when(jnp.logical_not(live))
    def _dead():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(live)
    def _live():
        _mass_p2g_live(grid, nr, slots_ref, ints_ref, out_ref)


def _mass_p2g_live(grid, nr, slots_ref, ints_ref, out_ref):
    dim = grid.dim
    r = L.Rows(dim)
    rs = region_side()
    data = slots_ref[...]
    iref = ints_ref[...]
    c = data.shape[2]
    active = (iref[:, L.I_FLAGS, :] & L.ACTIVE) != 0
    in_window, in_bounds = _transfer_masks(grid, data, iref, dim, r)
    contrib = (active & in_window & in_bounds).astype(jnp.float32)
    m_c = contrib * data[:, r.mass, :]
    for i in range(nr):
        w_ax, _ = _axis_weights_chunk(grid, data, iref, dim, r, i)
        if dim == 2:
            # rows x, lanes y (row-major q = x*8 + y).
            b = m_c[i : i + 1, :] * w_ax[0]  # [8, C]
            out_ref[i] = _dot_nt(b, w_ax[1])
        else:
            # rows z, lanes xy (z-major q = z*64 + x*8 + y, the main
            # kernels' order) — same factorization as kernel A: ~8x less
            # VPU expansion than the full [512, C] tensor product this
            # replaces, one [8, C] @ [64, C]ᵀ MXU dot per chunk.
            w_xy = (w_ax[0][:, None, :] * w_ax[1][None, :, :]).reshape(
                rs * rs, c
            )
            bz = m_c[i : i + 1, :] * w_ax[2]  # [8, C]
            out_ref[i] = _dot_nt(bz, w_xy)


def _mass_g2p_kernel(grid, nr, slots_ref, ints_ref, win_ref, nc_ref, out_ref):
    # Live-program gate (see _p2g_kernel); dead rows were zeros before too.
    live = pl.program_id(0) * nr < nc_ref[0, 0]

    @pl.when(jnp.logical_not(live))
    def _dead():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(live)
    def _live():
        _mass_g2p_live(grid, nr, slots_ref, ints_ref, win_ref, out_ref)


def _mass_g2p_live(grid, nr, slots_ref, ints_ref, win_ref, out_ref):
    dim = grid.dim
    r = L.Rows(dim)
    rs = region_side()
    data = slots_ref[...]
    iref = ints_ref[...]
    c = data.shape[2]
    active = (iref[:, L.I_FLAGS, :] & L.ACTIVE) != 0
    in_window, in_bounds = _transfer_masks(grid, data, iref, dim, r)
    contrib = (active & in_window & in_bounds).astype(jnp.float32)
    for i in range(nr):
        w_ax, _ = _axis_weights_chunk(grid, data, iref, dim, r, i)
        if dim == 2:
            t = _dot(win_ref[i], w_ax[1])  # [8_x, 8_y] @ [8_y, C] -> [8, C]
            out = jnp.sum(t * w_ax[0], axis=0, keepdims=True)
        else:
            w_xy = (w_ax[0][:, None, :] * w_ax[1][None, :, :]).reshape(
                rs * rs, c
            )
            t = _dot(win_ref[i], w_xy)  # [8_z, 64] @ [64, C] -> [8, C]
            out = jnp.sum(t * w_ax[2], axis=0, keepdims=True)
        out_ref[i] = contrib[i : i + 1, :] * out


def mass_p2g_fused(grid, cfg, slots, ints, interpret=False, vma=None,
                   nchunks=None):
    """Mass-only window images [D, 1, 8^d] (3D cell order = z-major,
    transfer.ZMAJOR_ORDER_3D — pass cell_order to merge)."""
    r = L.Rows(grid.dim)
    rc = region_cells(grid.dim)
    rs = region_side()
    d_ = cfg.max_chunks
    c = cfg.chunk_size
    nr = _r_of(cfg, interpret)
    if nchunks is None:
        nchunks = jnp.asarray(d_, jnp.int32)
    kernel = functools.partial(_mass_p2g_kernel, grid, nr)
    out = pl.pallas_call(
        kernel,
        grid=(d_ // nr,),
        in_specs=[
            pl.BlockSpec((nr, r.nf, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, L.NI, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (nr, rs, rc // rs), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=_out_shape((d_, rs, rc // rs), jnp.float32, vma),
        interpret=interpret,
    )(*_vary(vma, slots, ints, nchunks.astype(jnp.int32).reshape(1, 1)))
    return out.reshape(d_, 1, rc)


def mass_g2p_fused(grid, cfg, slots, ints, windows, interpret=False, vma=None,
                   nchunks=None):
    """Mass gather per slot [D, 1, C] from mass windows [D, 1, 8^d]
    (3D windows must be z-major — gather with cell_order=ZMAJOR_ORDER_3D)."""
    r = L.Rows(grid.dim)
    rc = region_cells(grid.dim)
    rs = region_side()
    d_ = cfg.max_chunks
    c = cfg.chunk_size
    nr = _r_of(cfg, interpret)
    if nchunks is None:
        nchunks = jnp.asarray(d_, jnp.int32)
    kernel = functools.partial(_mass_g2p_kernel, grid, nr)
    return pl.pallas_call(
        kernel,
        grid=(d_ // nr,),
        in_specs=[
            pl.BlockSpec((nr, r.nf, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, L.NI, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nr, rs, rc // rs), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((nr, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=_out_shape((d_, 1, c), jnp.float32, vma),
        interpret=interpret,
    )(*_vary(vma, slots, ints, windows.reshape(d_, rs, rc // rs),
             nchunks.astype(jnp.int32).reshape(1, 1)))


# ---------------------------------------------------------------------------
# Sorted-slice shift kernel (resort source-index extraction)
# ---------------------------------------------------------------------------


def _src_rows_kernel(nr, g2_ref, shift_ref, out_ref):
    """out[i] = concat(g2[i,0], g2[i,1])[shift_i : shift_i + C].

    The per-chunk variable lane shift is expressed as TWO one-hot [C, C]
    selection matmuls (one per source row; values are slot indices < 2^24,
    exact in f32) rather than a single [2C, C] matmul over the concatenated
    rows — Mosaic does not implement 1-D vector concatenate across lane
    tiles. An XLA element gather here costs ~12 ns/element; this is ~1 ms
    total at 500k."""
    c = out_ref.shape[2]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)  # source lane j
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)  # dest lane k
    for i in range(nr):
        sh = shift_ref[i, 0]
        # route0[j, k] = 1 iff j == k + sh (pulls from row 0 while k + sh < C)
        # route1[j, k] = 1 iff j == k + sh - C (wraps into row 1 afterwards)
        route0 = (iota_r == iota_c + sh).astype(jnp.float32)
        route1 = (iota_r == iota_c + (sh - c)).astype(jnp.float32)
        row0 = g2_ref[i, 0, :].astype(jnp.float32)[None, :]  # [1, C]
        row1 = g2_ref[i, 1, :].astype(jnp.float32)[None, :]
        out_ref[i] = (_dot(row0, route0) + _dot(row1, route1)).astype(jnp.int32)


def src_rows_from_order(cfg, order2, shifts, interpret=False, vma=None):
    """order2 [D, 2, C] i32 (the two sorted-order rows each destination chunk
    spans) + shifts [D] i32 -> per-chunk source slots [D, 1, C] i32."""
    d_, _, c = order2.shape
    nr = _r_of(cfg, interpret)
    kernel = functools.partial(_src_rows_kernel, nr)
    return pl.pallas_call(
        kernel,
        grid=(d_ // nr,),
        in_specs=[
            pl.BlockSpec((nr, 2, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((nr, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=_out_shape((d_, 1, c), jnp.int32, vma),
        interpret=interpret,
    )(*_vary(vma, order2, shifts.reshape(d_, 1)))


# ---------------------------------------------------------------------------
# Eigenerosion pairwise pooling kernel
# ---------------------------------------------------------------------------

# Rows of the packed eigen tensor: pos(d), val0 = m*psi_pos, val1 = m,
# eligible flag; row 7 of the CANDIDATE tensor additionally carries the
# "candidate == own chunk" flag for diagonal self-exclusion.
EIG_ROWS = 8
EIG_SELF = 7


def _eigen_pool_kernel(dim, radius, kn, nr, e_ref, g_ref, out_ref):
    """Exact pairwise neighbor pooling (ref: eigenerosion.rs:9-58 pools
    m*psi and m over particles within cell_width). Per chunk, the [C, C]
    distance tile against each candidate chunk runs on the VPU — no bucket
    tables, no gathers, no silent capacity drops (the generic bucket path
    costs ~90 ms at l_panel2 scale in element gathers; this is ~2 ms)."""
    c = out_ref.shape[2]
    r2 = radius * radius
    # All mask math in f32: Mosaic only supports broadcast minor-dim inserts
    # for 32-bit types (bools are packed).
    eye_f = (
        jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    ).astype(jnp.float32)
    for i in range(nr):
        my_elig = e_ref[i, dim + 2, :]  # [C] f32 0/1 (lane dim = my lanes)
        my_pos = [e_ref[i, ax, :] for ax in range(dim)]

        def body(k, acc):
            acc0, acc1 = acc
            gk = g_ref[i, k]  # [EIG_ROWS, C]
            # Pair tiles as [C_candidate (sublane), C_mine (lane)] so the
            # reduction over candidates is a cheap sublane sum.
            d2 = None
            for ax in range(dim):
                diff = gk[ax, :][:, None] - my_pos[ax][None, :]
                d2 = diff * diff if d2 is None else d2 + diff * diff
            pf = (
                (d2 <= r2).astype(jnp.float32)
                * my_elig[None, :]
                * gk[dim + 2, :][:, None]
            )
            pf = pf * (1.0 - eye_f * gk[EIG_SELF, 0])
            acc0 = acc0 + jnp.sum(pf * gk[dim, :][:, None], axis=0, keepdims=True)
            acc1 = acc1 + jnp.sum(pf * gk[dim + 1, :][:, None], axis=0, keepdims=True)
            return (acc0, acc1)

        acc0, acc1 = jax.lax.fori_loop(
            0, kn, body,
            (jnp.zeros((1, c), jnp.float32), jnp.zeros((1, c), jnp.float32)),
        )
        out = [acc0, acc1]
        out += [jnp.zeros((1, c), jnp.float32)] * (EIG_ROWS - 2)
        out_ref[i] = jnp.concatenate(out, axis=0)


def eigen_pool_fused(grid: GridParams, cfg, e, g, interpret=False, vma=None):
    """e [D, 8, C] own-chunk eigen rows + g [D, KN, 8, C] candidate rows ->
    pooled [D, 8, C] (rows 0/1 = neighbor sums of val0/val1)."""
    d_, kn = g.shape[0], g.shape[1]
    c = cfg.chunk_size
    nr = _r_of(cfg, interpret, cap=8)  # [nr, K, ., C] block: VMEM-bound
    kernel = functools.partial(
        _eigen_pool_kernel, grid.dim, float(grid.cell_width), kn, nr
    )
    return pl.pallas_call(
        kernel,
        grid=(d_ // nr,),
        in_specs=[
            pl.BlockSpec((nr, EIG_ROWS, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, kn, EIG_ROWS, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nr, EIG_ROWS, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=_out_shape((d_, EIG_ROWS, c), jnp.float32, vma),
        interpret=interpret,
    )(*_vary(vma, e, g))


# ---------------------------------------------------------------------------
# Slot permute kernel (the data movement of a resort)
# ---------------------------------------------------------------------------


def _permute_kernel(k_src, nr, g_ref, gi_ref, target_ref, out_ref, outi_ref):
    """out[i][:, c] = g[i][target[c] // C, :, target[c] % C] (f32 rows), and
    the same routing for the int rows.

    The lane shuffle is a 0/1 selection matmul on the MXU: for each of the
    K gathered source chunks, build the [C, C] routing matrix from the
    target row and accumulate dot(src_k, route_k). Out-of-range targets
    (empty slots / overflow) select nothing -> zero rows. Int rows are split
    into exact 16-bit float halves in VMEM (a raw f32 bitcast would corrupt
    NaN patterns under the x*1 + y*0 arithmetic) and recombined after.
    """
    c = out_ref.shape[2]
    iota_src = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    for i in range(nr):
        tgt = target_ref[i, 0, :]  # [C] i32
        acc = None
        acc_lo = None
        acc_hi = None
        for k in range(k_src):
            route = (iota_src + k * c == tgt[None, :]).astype(jnp.float32)
            part = _dot(g_ref[i, k], route)  # [F, C]
            acc = part if acc is None else acc + part
            # int32 arithmetic throughout (Mosaic has no uint32<->f32 casts);
            # the logical shift keeps the sign bit as data.
            gi = gi_ref[i, k]
            lo = _dot((gi & jnp.int32(0xFFFF)).astype(jnp.float32), route)
            hi = _dot(
                jax.lax.shift_right_logical(gi, 16).astype(jnp.float32), route
            )
            acc_lo = lo if acc_lo is None else acc_lo + lo
            acc_hi = hi if acc_hi is None else acc_hi + hi
        out_ref[i] = acc
        outi_ref[i] = acc_lo.astype(jnp.int32) | jax.lax.shift_left(
            acc_hi.astype(jnp.int32), 16
        )


# Destination chunks per DMA-permute program: all ND x <= K source fetches
# start before the first wait, so HBM latency (~1 us) amortizes over the
# batch instead of gating every destination chunk.
PERMUTE_DESTS_PER_PROGRAM = 8


def _permute_dma_kernel(k_src, dim, r_cumd, nd, uniq_ref, org_ref, tgt_ref,
                        slots_hbm, ints_hbm, out_f, out_i, scr_f, scr_i, sems):
    """DMA-permute: for each destination chunk in the nd-batch, fetch its
    (<= K, typically 1-3) source chunk rows straight from HBM with predicated
    async copies, route lanes by 0/1-selection matmuls, and finalize the
    drift/origin rows in-kernel. Replaces the XLA pre-gather that amplified
    resort HBM traffic 8x (every destination paid the full K padding) and the
    two whole-tensor copies for the cumd-zero and origin-row writes (ref: the
    reference pays its sort in kernels, not host round-trips,
    cuda_sparse_grid.rs:324-427)."""
    c = out_f.shape[-1]
    nf = out_f.shape[1]
    ni = out_i.shape[1]
    iota_src = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (nf, c), 0)
    irow_iota = jax.lax.broadcasted_iota(jnp.int32, (ni, c), 0)

    for d in range(nd):
        for k in range(k_src):
            cid = uniq_ref[d, 0, k]

            @pl.when(cid >= 0)
            def _():
                pltpu.make_async_copy(
                    slots_hbm.at[cid], scr_f.at[d, k], sems.at[d, 0, k]
                ).start()
                pltpu.make_async_copy(
                    ints_hbm.at[cid], scr_i.at[d, k], sems.at[d, 1, k]
                ).start()

    for d in range(nd):
        for k in range(k_src):
            cid = uniq_ref[d, 0, k]

            @pl.when(cid >= 0)
            def _():
                pltpu.make_async_copy(
                    slots_hbm.at[cid], scr_f.at[d, k], sems.at[d, 0, k]
                ).wait()
                pltpu.make_async_copy(
                    ints_hbm.at[cid], scr_i.at[d, k], sems.at[d, 1, k]
                ).wait()

        tgt = tgt_ref[d]  # [1, C] -> row

        def routed(k, d=d, tgt=tgt):
            route = (iota_src + k * c == tgt).astype(jnp.float32)
            part = _dot(scr_f[d, k], route)
            gi = scr_i[d, k]
            lo = _dot((gi & jnp.int32(0xFFFF)).astype(jnp.float32), route)
            hi = _dot(
                jax.lax.shift_right_logical(gi, 16).astype(jnp.float32), route
            )
            return part, lo, hi

        def zero3():
            return (
                jnp.zeros((nf, c), jnp.float32),
                jnp.zeros((ni, c), jnp.float32),
                jnp.zeros((ni, c), jnp.float32),
            )

        acc = None
        acc_lo = None
        acc_hi = None
        for k in range(k_src):
            cid = uniq_ref[d, 0, k]
            part, lo, hi = jax.lax.cond(
                cid >= 0, lambda k=k: routed(k), zero3
            )
            acc = part if acc is None else acc + part
            acc_lo = lo if acc_lo is None else acc_lo + lo
            acc_hi = hi if acc_hi is None else acc_hi + hi

        # Finalize: drift row resets at a sort; origin rows come from the NEW
        # structure (scalar-prefetched per chunk).
        out_f[d] = jnp.where(row_iota == r_cumd, 0.0, acc)
        ints_out = acc_lo.astype(jnp.int32) | jax.lax.shift_left(
            acc_hi.astype(jnp.int32), 16
        )
        for ax in range(dim):
            ints_out = jnp.where(
                irow_iota == L.I_ORIGIN + ax, org_ref[d, 0, ax], ints_out
            )
        out_i[d] = ints_out


def permute_chunks_dma(cfg, slots, ints, uniq, target, origin, r_cumd,
                       interpret=False, vma=None):
    """slots [D, NF, C] + ints [D, NI, C] (HBM-resident) + uniq [D, K] i32
    source-chunk ids (-1 = unused) + target [D, C] routing (k*C + lane) +
    origin [D, d] window-origin cells -> permuted (slots', ints') with the
    drift row zeroed and origin rows written."""
    d_, nf, c = slots.shape
    ni = ints.shape[1]
    k_src = uniq.shape[1]
    dim = origin.shape[1]
    # interpret: nd=2 still exercises the batch indexing on CPU CI without
    # the full unroll cost.
    nd = 2 if interpret else PERMUTE_DESTS_PER_PROGRAM
    while nd > 1 and d_ % nd != 0:
        nd //= 2
    kernel = functools.partial(_permute_dma_kernel, k_src, dim, r_cumd, nd)
    # Per-program SMEM blocks for the source ids / origins (NOT whole-array
    # scalar prefetch: uniq is [D, K] and SMEM is ~1MB — a 1M-particle
    # config blew the budget 6.5x).
    return pl.pallas_call(
        kernel,
        grid=(d_ // nd,),
        in_specs=[
            pl.BlockSpec((nd, 1, k_src), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nd, 1, dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nd, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((nd, nf, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((nd, ni, c), lambda i: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((nd, k_src, nf, c), jnp.float32),
            pltpu.VMEM((nd, k_src, ni, c), jnp.int32),
            pltpu.SemaphoreType.DMA((nd, 2, k_src)),
        ],
        out_shape=(
            _out_shape((d_, nf, c), jnp.float32, vma),
            _out_shape((d_, ni, c), jnp.int32, vma),
        ),
        interpret=interpret,
    )(*_vary(vma, uniq.reshape(d_, 1, k_src), origin.reshape(d_, 1, dim),
             target.reshape(d_, 1, c), slots, ints))


# Owner blocks per DMA-merge program: all NB x <= KMAX fetches are started
# before the first wait, so HBM latency (~1 us) amortizes over the batch
# instead of gating every block.
MERGE_BLOCKS_PER_PROGRAM = 8


def _merge_dma_kernel(kmax, nb, fn_ref, rows_hbm, out_ref, scr, sems):
    """Per batch of nb owner blocks: DMA each block's (<= kmax, typically
    1-4) contiguous chunk image rows straight from HBM and sum them in VMEM.
    Replaces the XLA [MB, KMAX, width] gather that made every block pay the
    full-KMAX padding (~3x the streamed bytes at nominal 2-4 chunks/block)."""
    nc, w = out_ref.shape[1], out_ref.shape[2]

    for b in range(nb):
        first = fn_ref[b, 0, 0]
        n = fn_ref[b, 0, 1]
        for k in range(kmax):
            @pl.when(k < n)
            def _():
                pltpu.make_async_copy(
                    rows_hbm.at[first + k], scr.at[b, k], sems.at[b, k]
                ).start()

    zero = jnp.zeros((nc, w), jnp.float32)
    for b in range(nb):
        first = fn_ref[b, 0, 0]
        n = fn_ref[b, 0, 1]
        for k in range(kmax):
            @pl.when(k < n)
            def _():
                pltpu.make_async_copy(
                    rows_hbm.at[first + k], scr.at[b, k], sems.at[b, k]
                ).wait()
        acc = zero
        for k in range(kmax):
            acc = acc + jax.lax.cond(
                k < n, lambda b=b, k=k: scr[b, k], lambda: zero
            )
        out_ref[b] = acc


def merge_blocks_dma(cfg, rows, first, nchunks, kmax, interpret=False,
                     vma=None):
    """rows [D, ncorners, W] chunk window images (corner-major, merge cell
    order) + per-block contiguous chunk ranges (first[MB], nchunks[MB],
    nchunks <= kmax) -> per-owner-block corner sums [MB, ncorners, W].

    The in-kernel-DMA half of the scatter-free merge (see
    transfer._merge_gather); the caller keeps the 2^d inverse-corner gather
    and the dense-block scatter fallback."""
    d_, ncorners, w = rows.shape
    # Mosaic requires the in-kernel row DMA (`rows_hbm.at[first + k]`) to
    # slice whole 128-lane tiles: a 2D merge row is nf*16 lanes (48/16/80
    # depending on channel count) and fluids' 3D mass merge is 64 — both
    # fail to lower ("Slice shape along dimension 2 must be aligned to
    # tiling (128)"). Pad the lane dim to the tile boundary; the zero lanes
    # sum to zero and are dropped on return.
    w_in = w
    w_pad = ((w + 127) // 128) * 128
    if w_pad != w:
        rows = jnp.concatenate(
            [rows, jnp.zeros((d_, ncorners, w_pad - w), rows.dtype)], axis=-1
        )
        w = w_pad
    mb = cfg.max_blocks
    # interpret: nb=2 still exercises the batch indexing on CPU CI without
    # the full unroll cost.
    nb = MERGE_BLOCKS_PER_PROGRAM if not interpret else 2
    mb_pad = ((mb + nb - 1) // nb) * nb
    fn = jnp.stack(
        [first.astype(jnp.int32), nchunks.astype(jnp.int32)], axis=-1
    )
    if mb_pad != mb:
        fn = jnp.concatenate(
            [fn, jnp.zeros((mb_pad - mb, 2), jnp.int32)], axis=0
        )  # padded blocks: n = 0 -> zero output row
    fn = fn.reshape(mb_pad, 1, 2)
    kernel = functools.partial(_merge_dma_kernel, kmax, nb)
    out = pl.pallas_call(
        kernel,
        grid=(mb_pad // nb,),
        in_specs=[
            pl.BlockSpec((nb, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((nb, ncorners, w), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nb, kmax, ncorners, w), jnp.float32),
            pltpu.SemaphoreType.DMA((nb, kmax)),
        ],
        out_shape=_out_shape((mb_pad, ncorners, w), jnp.float32, vma),
        interpret=interpret,
    )(*_vary(vma, fn, rows))
    if mb_pad != mb:
        out = out[:mb]
    return out[:, :, :w_in] if w_in != w else out


def permute_chunks(cfg, gathered, gathered_i, target, interpret=False, vma=None):
    """gathered [D, K, F, C] f32 + gathered_i [D, K, NI, C] i32 + target
    [D, C] (k*C + lane, or >= K*C for 'empty') -> (permuted f32 [D, F, C],
    permuted i32 [D, NI, C])."""
    d_, k_src, f, c = gathered.shape
    ni = gathered_i.shape[2]
    nr = _r_of(cfg, interpret, cap=8)  # [nr, K, ., C] block: VMEM-bound
    kernel = functools.partial(_permute_kernel, k_src, nr)
    return pl.pallas_call(
        kernel,
        grid=(d_ // nr,),
        in_specs=[
            pl.BlockSpec((nr, k_src, f, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, k_src, ni, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nr, f, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, ni, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            _out_shape((d_, f, c), jnp.float32, vma),
            _out_shape((d_, ni, c), jnp.int32, vma),
        ),
        interpret=interpret,
    )(*_vary(vma, gathered, gathered_i, target.reshape(d_, 1, c)))


# ---------------------------------------------------------------------------
# Kernel B: G2P + full particle update + next dt bound
# ---------------------------------------------------------------------------


def _g2p_kernel(grid, meta, params, nr, slots_ref, ints_ref, win_ref, dt_ref,
                nc_ref, tab_f, tab_i, out_ref):
    # Live-program gate (see _p2g_kernel): dead capacity chunks pass
    # their (resort-zeroed) slot rows through untouched — cum_disp,
    # keys, and unpack all mask by the int flags, so zeros stay inert.
    live = pl.program_id(0) * nr < nc_ref[0, 0]

    @pl.when(jnp.logical_not(live))
    def _dead():
        out_ref[...] = slots_ref[...]

    @pl.when(live)
    def _live():
        dim = grid.dim
        r = L.Rows(dim)
        h = grid.cell_width
        invd = kernel_inv_d(h)
        data = slots_ref[...]  # [R, NF, C]
        iref = ints_ref[...]
        dt = dt_ref[0, 0]
        with_psi = meta["with_psi"]
        m_count = meta["m_count"]
        present_p = meta["present_p"]
        present_f = meta["present_f"]
        row = lambda k: data[:, k, :]  # [R, C]

        mid = iref[:, L.I_MODEL, :]
        flags = iref[:, L.I_FLAGS, :]
        active = (flags & L.ACTIVE) != 0
        is_static = (flags & L.STATIC) != 0
        kinematic = (flags & L.KINEMATIC) != 0

        # --- gather (factorized: last-axis contraction as [M, 8] @ [8, C] MXU
        # dots — the per-particle weight matrix IS the right operand — then
        # per-axis VPU reductions; ~5x fewer MXU passes than full-window dots) --
        in_window, in_bounds = _transfer_masks(grid, data, iref, dim, r)
        contrib = active & in_window & in_bounds
        contrib_f = contrib.astype(jnp.float32)
        rs = region_side()
        n_win = dim + (1 if with_psi else 0)
        rpf = rs ** (dim - 1)

        gathered = []  # per chunk: [d + d*d (+1), C]
        for i in range(nr):
            w_ax, wd_ax = _axis_weights_chunk(grid, data, iref, dim, r, i)
            td = meta.get("tdtype", jnp.float32)
            c_ = data.shape[2]
            if dim == 2:
                win = win_ref[i].astype(td)  # [n_win*8, 8] (y on lanes)
                t1 = _dot(win, w_ax[-1].astype(td))  # [n_win*8, C]
                t1l = _dot(win[: dim * rpf], wd_ax[-1].astype(td))  # [d*8, C]
                wsh = w_ax[0]  # [8, C]
                wsh_d0 = wd_ax[0]
                t1r = t1.reshape(n_win, rpf, t1.shape[-1])
                t1lr = t1l.reshape(dim, rpf, t1.shape[-1])
                velpsi = jnp.sum(t1r * wsh[None], axis=1)  # [n_win, C]
                g0 = invd * jnp.sum(t1r[:dim] * wsh_d0[None], axis=1)
                glast = invd * jnp.sum(t1lr * wsh[None], axis=1)
                cols = [g0, glast]
            else:
                # z-major gather (window rows (flavor, z), lanes xy — the order
                # kernel A emits): contract the 64-wide xy sheet on the MXU
                # (K=64 vs the previous K=8 against the z taps — 5x fewer
                # streamed rows), then reduce the 8 z taps on the VPU.
                win = win_ref[i].astype(td)  # [n_win*8, 64]
                w_xy = (w_ax[0][:, None, :] * w_ax[1][None, :, :]).reshape(
                    rs * rs, c_
                )
                wd_xy_x = (wd_ax[0][:, None, :] * w_ax[1][None, :, :]).reshape(
                    rs * rs, c_
                )
                wd_xy_y = (w_ax[0][:, None, :] * wd_ax[1][None, :, :]).reshape(
                    rs * rs, c_
                )
                wz, wdz = w_ax[2], wd_ax[2]
                t = _dot(win, w_xy.astype(td))  # [n_win*8, C]
                t_x = _dot(win[: dim * rs], wd_xy_x.astype(td))  # [d*8, C]
                t_y = _dot(win[: dim * rs], wd_xy_y.astype(td))  # [d*8, C]
                tr = t.reshape(n_win, rs, c_)
                velpsi = jnp.sum(tr * wz[None], axis=1)  # [n_win, C]
                g0 = invd * jnp.sum(t_x.reshape(dim, rs, c_) * wz[None], axis=1)
                g1 = invd * jnp.sum(t_y.reshape(dim, rs, c_) * wz[None], axis=1)
                glast = invd * jnp.sum(tr[:dim] * wdz[None], axis=1)
                cols = [g0, g1, glast]
            parts = [velpsi[:dim]] + cols
            if with_psi:
                parts.append(velpsi[dim:])
            gathered.append(jnp.concatenate(parts, axis=0))
        gath = jnp.stack(gathered, axis=0)  # [R, d + d*d (+1), C]

        vel = [contrib_f * gath[:, i, :] for i in range(dim)]
        # gath rows d.. are column-major blocks: block j holds rows i of grad[i][j].
        g = [
            [contrib_f * gath[:, dim + j * dim + i, :] for j in range(dim)]
            for i in range(dim)
        ]
        det = sum(g[j][j] for j in range(dim))
        if with_psi:
            psi_mom = contrib_f * gath[:, dim + dim * dim, :]
        else:
            psi_mom = jnp.zeros_like(vel[0])

        # --- particle update (mirrors dense.particle_update_after_gather) ------
        phase = row(r.phase)
        failed = row(r.failed) != 0.0
        mass = row(r.mass)
        vol0 = row(r.vol0)
        eh = row(r.eh)
        ph = row(r.ph)
        pdd = row(r.pdd)
        lvg = row(r.lvg)
        nacc_a = row(r.nacc)
        psi_pos = row(r.psi_pos)
        f = _mat(row, r.defgrad, dim)
        ct = _select_itype(tab_i, mid, m_count, 0)
        is_fluid = _type_mask(ct, con.EOS_MONAGHAN_SPH, meta["present_c"], m_count, exhaustive=True)

        if meta["damage_model"] == 3:  # DamageModel.MODIFIED_EIGENEROSION
            cpf = row(r.cpf)
            crack_energy = cpf * h * psi_mom
            trip = (cpf != 0.0) & (phase > 0.0) & (crack_energy > row(r.cthr))
            phase = jnp.where(trip, 0.0, phase)

        # Advection (kinematic override + optional GPU CFL clamp).
        kin = [row(r.kinvel + ax) for ax in range(dim)]
        vel = [jnp.where(kinematic, kin[i], vel[i]) for i in range(dim)]
        if params["gpu_velocity_clamp"]:
            over = None
            for i in range(dim):
                o = jnp.abs(vel[i]) * dt >= h
                over = o if over is None else (over | o)
            vel = [
                jnp.where(over, jnp.sign(vel[i]) * (h / dt), vel[i]) for i in range(dim)
            ]
        pos = [row(r.pos + ax) + vel[ax] * dt for ax in range(dim)]

        # Deformation gradient update (all-fluid scenes skip the solid F-update
        # matmul statically; all-solid scenes skip the fluid-J row and blends).
        if is_fluid is True:
            f = [list(fr) for fr in f]
            f[0][0] = f[0][0] + det * dt * f[0][0]
        elif is_fluid is False:
            gf = cmat.matmul_c(g, f)
            f = [[f[i][j] + dt * gf[i][j] for j in range(dim)] for i in range(dim)]
        else:
            gf = cmat.matmul_c(g, f)
            f_solid = [
                [f[i][j] + dt * gf[i][j] for j in range(dim)] for i in range(dim)
            ]
            f00_fluid = f[0][0] + det * dt * f[0][0]
            f = cmat.where_mat(is_fluid, f, f_solid)
            f[0][0] = jnp.where(is_fluid, f00_fluid, f[0][0])

        # Plastic return mapping (masked per present type).
        pt = _select_itype(tab_i, mid, m_count, 1)
        pp = [_select_param(tab_f, mid, m_count, TAB_P + k) for k in range(8)]
        stress_cache = meta.get("stress_cache")
        # SVD-reuse fast path: when Drucker-Prager is the only plasticity, ONE
        # SVD of the post-update F serves the return map, the pos energy, AND
        # the cached stress — DP only rescales singular values, so
        # (U, s_sel, V) stays an exact SVD of the projected F. (Other plasticity
        # models re-decompose internally; they fall back to a post-guard SVD.)
        svd_reuse = (
            stress_cache
            and con.COROTATED in meta["present_c"]
            and set(present_p) <= {plas.DRUCKER_PRAGER}
        )
        usv = svd_c(f) if svd_reuse else None
        if plas.DRUCKER_PRAGER in present_p:
            if svd_reuse:
                f2, pdd2, ph2, lvg2, s_sel = plas.drucker_prager_update_with_svd_c(
                    pp, phase, f, pdd, ph, lvg, usv
                )
            else:
                f2, pdd2, ph2, lvg2 = plas.drucker_prager_update_c(
                    pp, phase, f, pdd, ph, lvg
                )
            m = _type_mask(pt, plas.DRUCKER_PRAGER, present_p, m_count)
            if svd_reuse:
                usv = (
                    usv[0],
                    [_where_t(m, ss, s0) for ss, s0 in zip(s_sel, usv[1])],
                    usv[2],
                )
            f = _where_mat_t(m, f2, f)
            pdd = _where_t(m, pdd2, pdd)
            ph = _where_t(m, ph2, ph)
            lvg = _where_t(m, lvg2, lvg)
        if plas.NACC in present_p:
            f2, na2 = plas.nacc_update_c(pp[:6], f, nacc_a)
            m = _type_mask(pt, plas.NACC, present_p, m_count)
            f = _where_mat_t(m, f2, f)
            nacc_a = _where_t(m, na2, nacc_a)
        if plas.RANKINE in present_p:
            f2, ph2 = plas.rankine_update_c(pp[:4], f, ph)
            m = _type_mask(pt, plas.RANKINE, present_p, m_count)
            f = _where_mat_t(m, f2, f)
            ph = _where_t(m, ph2, ph)
        if plas.SNOW in present_p:
            f2, eh2, pdd2 = plas.snow_update_c(pp[:3], f, eh, pdd)
            m = _type_mask(pt, plas.SNOW, present_p, m_count)
            f = _where_mat_t(m, f2, f)
            eh = _where_t(m, eh2, eh)
            pdd = _where_t(m, pdd2, pdd)

        # Static particles.
        zero = jnp.zeros_like(vel[0])
        vel = [jnp.where(is_static, 0.0, v) for v in vel]
        g = cmat.where_mat(is_static, cmat.zeros_like_mat(g), g)

        # Failure guards: det(F)=0, already failed, |F00| blowup (solids only).
        detf = cmat.det_c(f)
        broken = (detf == 0.0) | failed
        if is_fluid is not True:
            blow = jnp.abs(f[0][0]) > 1.0e4
            if is_fluid is not False:
                blow = ~is_fluid & blow
            broken = broken | blow
        f = cmat.where_mat(broken, cmat.identity_c(dim, zero), f)
        g = cmat.where_mat(broken, cmat.zeros_like_mat(g), g)
        failed_new = failed | broken
        if usv is not None:
            # Broken slots snapped F to identity above: force unit singular
            # values so energy is 0 there (U/V go stale but their stress is
            # both zero-valued and masked by `failed` in kernel A).
            usv = (
                usv[0],
                [jnp.where(broken, 1.0, si) for si in usv[1]],
                usv[2],
            )

        # Pos energy accumulation. Under the stress cache, ONE SVD of the final
        # F serves both the energy and the cached stress for the next kernel A
        # (the reference's g2p2g computes stress once per substep in-kernel for
        # the same reason, g2p2g.rs).
        if stress_cache and usv is None and con.COROTATED in meta["present_c"]:
            usv = svd_c(f)
        energy = _pos_energy_c(
            meta, tab_f, tab_i, mid, phase, eh, f,
            s=(usv[1] if usv is not None else None),
        )
        psi_pos = jnp.maximum(psi_pos, energy)
        par1 = psi_pos * mass
        par2 = mass

        # Failure model.
        if present_f:
            stress = _kirchhoff_stress_c(
                meta, tab_f, tab_i, mid, phase, eh, f, g, mass, vol0
            )
            ft = _select_itype(tab_i, mid, m_count, 2)
            fp = [_select_param(tab_f, mid, m_count, TAB_F + k) for k in range(2)]
            tripped = jnp.zeros_like(phase, dtype=bool)
            if fail.MAXIMUM_STRESS in present_f:
                t = fail.maximum_stress_failed_c(fp[0], fp[1], stress)
                m = _type_mask(ft, fail.MAXIMUM_STRESS, present_f, m_count)
                tripped = tripped | (t if m is True else (m & t))
            phase = jnp.where(tripped, 0.0, phase)

        # Out-of-grid marking from the NEW positions — identical to the dense
        # pipeline's top-of-next-substep mark (ref: particle_set.rs:132-135),
        # applied one stage early so no extra pass over slot state is needed.
        oob = None
        for ax in range(dim):
            xg = (pos[ax] - grid.origin[ax]) / h
            base = jnp.round(xg).astype(jnp.int32) - 1
            o = (base >= 0) & (base + 2 <= grid.res[ax] - 1)
            oob = ~o if oob is None else (oob | ~o)
        failed_new = failed_new | (active & oob)

        # Next substep's dt bound (ref: timestep_estimator.rs, fused to skip a
        # standalone pass over particle state).
        d_coeff = (h * h) / 4.0
        norm_b = d_coeff * jnp.sqrt(cmat.frob2_c(g))
        apic_v = norm_b * 6.0 * float(np.sqrt(dim)) / h
        vsq = sum(v * v for v in vel)
        vnorm = jnp.sqrt(vsq)
        vtot = vnorm + apic_v
        vel_bound = jnp.where(vtot > 0.0, h / jnp.maximum(vtot, 1e-20), jnp.inf)
        con_bound = _timestep_bound_c(
            meta, tab_f, tab_i, mid, phase, eh, f, mass, vol0, vnorm, vsq, h, dim
        )
        con_bound = jnp.where(failed_new, jnp.inf, con_bound)
        bound = jnp.minimum(vel_bound, con_bound)
        # Slot rows are inf-free (layout.BIGF): inf would become NaN under the
        # resort's selection matmuls.
        bound = jnp.where(active, bound, jnp.inf)
        bound = jnp.minimum(bound, L.BIGF)

        # Per-slot drift accumulation (lazy-resort trigger; conservative
        # max-axis step displacement added to the running per-particle total).
        step_disp = None
        for i2 in range(dim):
            a = jnp.abs(vel[i2]) * dt
            step_disp = a if step_disp is None else jnp.maximum(step_disp, a)
        cumd = row(r.cumd) + step_disp

        # --- write the new slot tensor (row order = layout.Rows) ----------------
        rows = list(pos)
        rows += vel
        rows += [g[i][j] for i in range(dim) for j in range(dim)]
        rows += [f[i][j] for i in range(dim) for j in range(dim)]
        rows += [mass, vol0, phase, psi_pos, pdd, ph, eh, lvg, nacc_a]
        rows += kin
        rows += [row(r.cpf), row(r.cthr), bound,
                 failed_new.astype(jnp.float32), row(r.radius0), par1, par2,
                 row(r.m_c), row(r.g), row(r.debug), cumd]
        if stress_cache:
            st = _cached_stress_epilogue_c(
                meta, tab_f, tab_i, mid, phase, eh, f, usv
            )
            # Upper triangle, clipped inf-free (slot-row contract, layout.BIGF).
            rows += [
                jnp.clip(st[i2][j2], -L.BIGF, L.BIGF)
                for i2 in range(dim) for j2 in range(i2, dim)
            ]
        while len(rows) < r.nf:
            rows.append(zero)
        out_ref[...] = jnp.stack(rows, axis=1)


def g2p_fused(grid: GridParams, cfg, meta, params, slots, ints, windows, dt,
              tab_f, tab_i, interpret=False, vma=None, nchunks=None):
    """Slot state + grid windows [D, d(+1), 8^d] -> new slot state.

    3D windows must be in z-major region-cell order (what
    gather_grid_windows(cell_order=ZMAJOR_ORDER_3D) emits): the re-view to
    [D, F*8, 64] puts (flavor, z) on rows and the xy sheet on lanes for the
    kernel's K=64 MXU contraction. 2D windows are row-major, re-viewed to
    [D, F*8, 8]."""
    dim = grid.dim
    r = L.Rows(dim)
    rc = region_cells(dim)
    rs = region_side()
    d_ = cfg.max_chunks
    c = cfg.chunk_size
    n_win = dim + (1 if meta["with_psi"] else 0)
    m = tab_f.shape[0]
    nr = _r_of(cfg, interpret)
    rows_win = n_win * rs if dim == 3 else n_win * (rc // rs)
    windows = windows.reshape(d_, rows_win, rc * n_win // rows_win)

    if nchunks is None:
        nchunks = jnp.asarray(d_, jnp.int32)
    kernel = functools.partial(_g2p_kernel, grid, meta, params, nr)
    return pl.pallas_call(
        kernel,
        grid=(d_ // nr,),
        in_specs=[
            pl.BlockSpec((nr, r.nf, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, L.NI, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nr, rows_win, rc * n_win // rows_win),
                lambda i: (i, 0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((m, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((m, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (nr, r.nf, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=_out_shape((d_, r.nf, c), jnp.float32, vma),
        # The new slot tensor overwrites the old IN PLACE (each program
        # reads only its own [nr, NF, C] block before writing it): inside
        # the substep loop this removes XLA's back-edge carry copy of the
        # full [D, NF, C] tensor (measured 1.1 ms/substep at sand3@1M,
        # scripts/diag_trace.py round 5) and a whole HBM allocation.
        input_output_aliases={0: 0},
        interpret=interpret,
    )(*_vary(vma, slots, ints, windows, dt.reshape(1, 1),
             nchunks.astype(jnp.int32).reshape(1, 1), tab_f, tab_i))
