"""Persistent chunk-slot particle layout.

Particle state lives BETWEEN substeps in an f-major slot tensor
[MAX_CHUNKS, NF, CHUNK] (one row per scalar field, chunks grouped by grid
block) plus an int tensor for ids/flags — the layout the fused Pallas
kernels consume directly, so nothing is marshalled per substep. This is the
TPU answer to the reference's sorted SoA device buffers that its g2p2g kernel
indexes through `sorted_particle_ids` (ref: sparkl
`src/cuda/cuda_particle_set.rs`, `src_kernels/cuda/g2p2g.rs:141-171`) — here
the sort IS the storage order, and re-sorts are one wide row-permute applied
lazily (see fused/pipeline.py).

Conversion to/from the Particles pytree happens only at API boundaries.
Inactive pytree rows (capacity padding) are not carried: unpacking restores
them to Particles.empty defaults.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.core.particles import Particles
from sparkl_tpu.sparse.blocks import BlockConfig
from sparkl_tpu.fused import structure as S

# Flag bits (int row FLAGS).
ACTIVE = 1
STATIC = 2
KINEMATIC = 4
OCCUPIED = 8

# Slot rows never hold inf: the resort's 0/1-selection matmuls would turn
# inf * 0 into NaN. Infinite values (crack_threshold, dt bounds) are stored
# as the largest finite f32 — every comparison/min they participate in is
# unchanged — and restored to inf on unpack.
BIGF = float(np.finfo(np.float32).max)

# Int row indices.
I_MODEL = 0
I_FLAGS = 1
I_ORIG = 2
I_USER = 3
I_ORIGIN = 4  # .. I_ORIGIN + d
NI = 8


def _round8(x):
    return -(-x // 8) * 8


@dataclass(frozen=True)
class Rows:
    """Row offsets of every scalar field in the f32 slot tensor."""

    dim: int

    @property
    def pos(self):
        return 0

    @property
    def vel(self):
        return self.dim

    @property
    def grad(self):
        return 2 * self.dim

    @property
    def defgrad(self):
        return 2 * self.dim + self.dim * self.dim

    @property
    def _scalars(self):
        return 2 * self.dim + 2 * self.dim * self.dim

    # Scalar rows, in order.
    @property
    def mass(self):
        return self._scalars

    @property
    def vol0(self):
        return self._scalars + 1

    @property
    def phase(self):
        return self._scalars + 2

    @property
    def psi_pos(self):
        return self._scalars + 3

    @property
    def pdd(self):
        return self._scalars + 4

    @property
    def ph(self):
        return self._scalars + 5

    @property
    def eh(self):
        return self._scalars + 6

    @property
    def lvg(self):
        return self._scalars + 7

    @property
    def nacc(self):
        return self._scalars + 8

    @property
    def kinvel(self):
        return self._scalars + 9

    @property
    def cpf(self):
        return self._scalars + 9 + self.dim

    @property
    def cthr(self):
        return self._scalars + 10 + self.dim

    @property
    def dtb(self):
        return self._scalars + 11 + self.dim

    @property
    def failed(self):
        return self._scalars + 12 + self.dim

    @property
    def radius0(self):
        return self._scalars + 13 + self.dim

    @property
    def par1(self):
        return self._scalars + 14 + self.dim

    @property
    def par2(self):
        return self._scalars + 15 + self.dim

    @property
    def m_c(self):
        return self._scalars + 16 + self.dim

    @property
    def g(self):
        return self._scalars + 17 + self.dim

    @property
    def debug(self):
        return self._scalars + 18 + self.dim

    @property
    def cumd(self):
        # Per-slot accumulated drift since the last sort (NOT a particle
        # field): the lazy-resort trigger is max-over-slots of this row — a
        # maximum of per-particle sums, far tighter than summing the global
        # per-substep maxima when only a few particles move fast.
        return self._scalars + 19 + self.dim

    @property
    def stress(self):
        # Cached Kirchhoff stress (symmetric upper triangle, row-major:
        # 3D (00,01,02,11,12,22); 2D (00,01,11)) of the CURRENT deformation
        # gradient — written by kernel B from its consolidated SVD, consumed
        # by the next substep's kernel A so the stress SVD runs once per
        # substep instead of twice (the reference's g2p2g computes stress in
        # the same kernel as the scatter for the same reason, g2p2g.rs).
        # Valid only under meta["stress_cache"]; zeros otherwise.
        return self._scalars + 20 + self.dim

    @property
    def nstress(self):
        return self.dim * (self.dim + 1) // 2

    @property
    def nf(self):
        return _round8(self._scalars + 20 + self.dim + self.nstress)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SlotState:
    """Slot-resident particle population + its sparse structure.

    `grid_cache` holds structure-derived grid data (node positions and the
    per-collider node projections) computed once per resort and carried
    across substeps — the reference's projection cache
    (ref: reset_grid.rs copy_grid_projection_data)."""

    slots: jax.Array  # [D, NF, C] f32
    ints: jax.Array  # [D, NI, C] i32
    structure: S.SlotStructure
    cum_disp: jax.Array  # [] f32 — max displacement accumulated since sort
    grid_cache: tuple

    def replace(self, **kw):
        from dataclasses import replace as _r

        return _r(self, **kw)


def _field_columns(r: Rows, p: Particles, dtb, stress=None):
    """Particles pytree -> list of NF [N] f32 columns (row order of Rows).

    stress: optional [N, d, d] Kirchhoff stress for the cache rows (see
    Rows.stress); zeros when absent (non-cache pipelines)."""
    d = p.dim
    cols = [p.position[:, ax] for ax in range(d)]
    cols += [p.velocity[:, ax] for ax in range(d)]
    cols += [p.velocity_gradient[:, i, j] for i in range(d) for j in range(d)]
    cols += [p.deformation_gradient[:, i, j] for i in range(d) for j in range(d)]
    cols += [p.mass, p.volume0, p.phase, p.psi_pos, p.plastic_def_det,
             p.plastic_hardening, p.elastic_hardening, p.log_vol_gain,
             p.nacc_alpha]
    cols += [p.kinematic_vel[:, ax] for ax in range(d)]
    cols += [p.crack_propagation_factor, p.crack_threshold, dtb,
             p.failed.astype(jnp.float32), p.radius0, p.parameter1,
             p.parameter2, p.m_c, p.g, p.debug_val]
    cols.append(jnp.zeros_like(p.mass))  # cumd starts at zero
    if stress is not None:
        cols += [stress[:, i, j] for i in range(d) for j in range(i, d)]
    while len(cols) < r.nf:
        cols.append(jnp.zeros_like(p.mass))
    return cols


def pack(grid: GridParams, cfg: BlockConfig, p: Particles, dtb,
         cache_fn=None, stress=None) -> SlotState:
    """Particles (original order) -> slot state. `dtb` = per-particle dt
    bounds [N] (dense.particle_dt_bounds), carried as a state row; `cache_fn`
    (structure -> grid_cache) builds the carried grid-side cache; `stress`
    [N, d, d] seeds the stress-cache rows (see Rows.stress)."""
    r = Rows(p.dim)
    d = p.dim

    structure, sort_order, chunk_start = S.build_slot_structure(
        grid, cfg, p.position, p.active, p.active
    )
    src, slot_valid = S.slot_source_index(
        cfg, sort_order, chunk_start, structure.chunk_count
    )

    packed = jnp.stack(_field_columns(r, p, dtb, stress=stress), axis=1)  # [N, NF]
    packed = jnp.clip(packed, -BIGF, BIGF)  # inf-free slots (see BIGF)
    flat = jnp.where(slot_valid[:, None], packed[src], 0.0)
    slots = jnp.moveaxis(
        flat.reshape(cfg.max_chunks, cfg.chunk_size, r.nf), 1, 2
    )

    flags = (
        p.active.astype(jnp.int32) * ACTIVE
        + p.is_static.astype(jnp.int32) * STATIC
        + p.kinematic_enabled.astype(jnp.int32) * KINEMATIC
        + p.active.astype(jnp.int32) * OCCUPIED
    )
    icols = [p.model_id, flags, jnp.arange(p.capacity, dtype=jnp.int32),
             p.user_data]
    while len(icols) < NI:
        icols.append(jnp.zeros_like(p.model_id))
    ipacked = jnp.stack(icols, axis=1)  # [N, NI]
    iflat = jnp.where(slot_valid[:, None], ipacked[src], 0)
    ints = jnp.moveaxis(
        iflat.reshape(cfg.max_chunks, cfg.chunk_size, NI), 1, 2
    )
    ints = _write_origin_rows(ints, structure, d)

    return SlotState(
        slots=slots,
        ints=ints,
        structure=structure,
        cum_disp=jnp.asarray(0.0, jnp.float32),
        grid_cache=cache_fn(structure) if cache_fn else (),
    )


def _write_origin_rows(ints, structure, d):
    origin = structure.chunk_origin  # [D, d] i32
    c = ints.shape[2]
    for ax in range(d):
        ints = ints.at[:, I_ORIGIN + ax, :].set(
            jnp.broadcast_to(origin[:, ax : ax + 1], (ints.shape[0], c))
        )
    return ints


def unpack(grid: GridParams, cfg: BlockConfig, state: SlotState, capacity: int,
           dim: int, compact_ids: bool = False) -> Particles:
    """Slot state -> Particles pytree in original order. Slots that hold no
    particle leave their pytree row at Particles.empty defaults.

    `compact_ids` assigns pytree rows by slot order instead of the original
    index — required under domain decomposition, where migration makes
    original indices collide across shards (two shards can each hold a
    particle packed at the same source row)."""
    r = Rows(dim)
    flat = jnp.moveaxis(state.slots, 1, 2).reshape(-1, r.nf)  # [S, NF]
    iflat = jnp.moveaxis(state.ints, 1, 2).reshape(-1, NI)
    occupied = (iflat[:, I_FLAGS] & OCCUPIED) != 0
    if compact_ids:
        rank = jnp.cumsum(occupied.astype(jnp.int32)) - 1
        ids = jnp.where(occupied, rank, capacity)  # drop empties
    else:
        ids = jnp.where(occupied, iflat[:, I_ORIG], capacity)  # drop empties

    empty = Particles.empty(capacity, dim)
    dtb0 = jnp.zeros((capacity,), jnp.float32)
    defaults = jnp.stack(_field_columns(r, empty, dtb0), axis=1)
    mat = defaults.at[ids].set(flat, mode="drop")  # [N, NF]
    idefaults = jnp.stack(
        [empty.model_id, jnp.zeros((capacity,), jnp.int32),
         jnp.arange(capacity, dtype=jnp.int32), empty.user_data]
        + [jnp.zeros((capacity,), jnp.int32)] * (NI - 4),
        axis=1,
    )
    imat = idefaults.at[ids].set(iflat, mode="drop")

    d = dim

    def vec(row):
        return mat[:, row : row + d]

    def matx(row):
        return mat[:, row : row + d * d].reshape(-1, d, d)

    flags = imat[:, I_FLAGS]
    return Particles(
        position=vec(r.pos),
        velocity=vec(r.vel),
        velocity_gradient=matx(r.grad),
        deformation_gradient=jnp.where(
            ((flags & OCCUPIED) != 0)[:, None, None],
            matx(r.defgrad),
            empty.deformation_gradient,
        ),
        plastic_def_det=jnp.where(
            (flags & OCCUPIED) != 0, mat[:, r.pdd], empty.plastic_def_det
        ),
        mass=mat[:, r.mass],
        volume0=jnp.where((flags & OCCUPIED) != 0, mat[:, r.vol0], empty.volume0),
        radius0=mat[:, r.radius0],
        model_id=imat[:, I_MODEL],
        active=(flags & ACTIVE) != 0,
        failed=mat[:, r.failed] != 0.0,
        is_static=(flags & STATIC) != 0,
        kinematic_enabled=(flags & KINEMATIC) != 0,
        kinematic_vel=vec(r.kinvel),
        phase=jnp.where((flags & OCCUPIED) != 0, mat[:, r.phase], empty.phase),
        psi_pos=mat[:, r.psi_pos],
        parameter1=mat[:, r.par1],
        parameter2=mat[:, r.par2],
        crack_propagation_factor=mat[:, r.cpf],
        crack_threshold=jnp.where(
            (flags & OCCUPIED) != 0,
            jnp.where(mat[:, r.cthr] >= BIGF, jnp.inf, mat[:, r.cthr]),
            empty.crack_threshold,
        ),
        m_c=jnp.where((flags & OCCUPIED) != 0, mat[:, r.m_c], empty.m_c),
        g=mat[:, r.g],
        nacc_alpha=jnp.where(
            (flags & OCCUPIED) != 0, mat[:, r.nacc], empty.nacc_alpha
        ),
        plastic_hardening=jnp.where(
            (flags & OCCUPIED) != 0, mat[:, r.ph], empty.plastic_hardening
        ),
        elastic_hardening=jnp.where(
            (flags & OCCUPIED) != 0, mat[:, r.eh], empty.elastic_hardening
        ),
        log_vol_gain=mat[:, r.lvg],
        user_data=imat[:, I_USER],
        debug_val=mat[:, r.debug],
    )


# Source-chunk locality bound for the fast resort permute: with the lazy
# <1-cell-drift trigger, a destination chunk's particles come from its own
# block's chunks plus immediate neighbors' — typically 2-6 source chunks.
# Destinations needing more fall back (whole resort) to the generic
# row-gather path via lax.cond.
PERMUTE_SRC_CHUNKS = 8


def _ints_to_f32(ints):
    """[D, NI, C] i32 -> [D, 2*NI, C] f32 (exact 16-bit halves) so int rows
    can ride the 0/1-selection-matmul permute (a direct f32 bitcast would
    corrupt NaN patterns under x*1+0*y arithmetic)."""
    u = jax.lax.bitcast_convert_type(ints, jnp.uint32)
    lo = (u & jnp.uint32(0xFFFF)).astype(jnp.float32)
    hi = (u >> 16).astype(jnp.float32)
    return jnp.concatenate([lo, hi], axis=1)


def _f32_to_ints(x):
    ni = x.shape[1] // 2
    lo = x[:, :ni].astype(jnp.uint32)
    hi = x[:, ni:].astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(lo | (hi << 16), jnp.int32)


def resort(grid: GridParams, cfg: BlockConfig, state: SlotState, dim: int,
           interpret=False, vma=None, cache_fn=None):
    """Rebuild the block structure from current slot positions and permute
    the packed state into the new slot order. Returns (state, overflow).

    The permute exploits drift locality: whole source chunks are fetched
    with ONE large-row gather ([D, K] rows of F*C floats) and lanes are
    routed inside a Pallas kernel by 0/1-selection matmuls on the MXU —
    ~6x cheaper than the naive per-slot row-gather, which remains as the
    lax.cond fallback for pathological mixing (> K source chunks for some
    destination chunk)."""
    from sparkl_tpu.fused import kernels as K2

    r = Rows(dim)
    c = cfg.chunk_size
    d_ = cfg.max_chunks
    k_src = PERMUTE_SRC_CHUNKS

    pos = jnp.stack(
        [state.slots[:, r.pos + ax, :].reshape(-1) for ax in range(dim)], axis=-1
    )
    flags = state.ints[:, I_FLAGS, :].reshape(-1)
    occupied = (flags & OCCUPIED) != 0
    active = occupied & ((flags & ACTIVE) != 0)

    # Chunk-relabel fast path: when the stable sort of the new keys would
    # reproduce the current slot order verbatim (the common coherent-motion
    # resort — a uniform fall shifts every key by the same block offset),
    # the ENTIRE sorted rebuild is skipped: no global [D*C] lax.sort, no
    # source extraction, no permute — the new structure is derived from the
    # D per-chunk keys alone and the slot tensors change only in the drift /
    # origin rows. Detection is O(D*C) elementwise.
    key_eff = S.slot_key_rows(
        grid, cfg, pos, active, occupied
    )
    occ2 = occupied.reshape(d_, c)
    relabel_ok, ckey, occ_count = S.detect_chunk_relabel(
        grid, cfg, key_eff, occ2
    )

    def relabel(_):
        structure = S.structure_from_chunk_keys(grid, cfg, ckey, occ_count)
        # Zero pad lanes (kernel B leaves identity-F debris there) so both
        # resort paths restore the same "pads are zero" invariant bit-exactly.
        om = occ2[:, None, :]
        slots = jnp.where(om, state.slots, 0.0).at[:, r.cumd, :].set(0.0)
        ints = _write_origin_rows(
            jnp.where(om, state.ints, 0), structure, dim
        )
        return slots, ints, structure

    def rebuild(_):
        structure, sort_order, chunk_start = S.build_slot_structure(
            grid, cfg, pos, active, occupied
        )
        # Per-destination-chunk source slots: chunk j's slice
        # sort_order[start_j : start_j + C] spans exactly two rows of the
        # [D, C]-shaped order; gather those (a cheap row gather) and apply
        # the per-chunk lane shift inside a kernel. Slot indices exceed
        # f32's exact integer range only past 16M slots — fall back to the
        # elementwise slice there.
        start = jnp.minimum(chunk_start, jnp.int32(d_ * c - c))
        if d_ * c < (1 << 24):
            ord2d = sort_order.reshape(d_, c)
            r0 = start // c
            g2 = ord2d[
                jnp.stack([r0, jnp.minimum(r0 + 1, d_ - 1)], axis=1).reshape(-1)
            ].reshape(d_, 2, c)
            src = K2.src_rows_from_order(
                cfg, g2, start % c, interpret=interpret, vma=vma
            )[:, 0, :]
        else:
            src = jax.vmap(
                lambda s: jax.lax.dynamic_slice(sort_order, (s,), (c,))
            )(start)  # [D, C]
        lanes = jnp.arange(c, dtype=jnp.int32)[None, :]
        valid = lanes < structure.chunk_count[:, None]

        sentinel = jnp.int32(2**30)
        src_chunk = jnp.where(valid, src // c, sentinel)
        src_lane = jnp.where(valid, src % c, 0)

        # Pure chunk relabeling WITH reorder: every destination chunk is an
        # in-order copy of exactly one source chunk (lane i from lane i),
        # but chunks may have swapped places (else the relabel fast path
        # above would have taken it). One chunk-row gather; the per-chunk
        # source analysis in mixed() is skipped via lax.cond. Lane 0 is
        # valid whenever any lane is (valid is a prefix mask), so src[:, 0]
        # names the single source chunk.
        first_chunk = src[:, 0] // c
        pure_relabel = jnp.all(
            jnp.where(
                valid,
                (src_lane == lanes) & (src_chunk == first_chunk[:, None]),
                True,
            )
        )

        def _finalize(slots, ints):
            slots = slots.at[:, r.cumd, :].set(0.0)  # drift resets at a sort
            return slots, _write_origin_rows(ints, structure, dim)

        def pure(_):
            ids0 = jnp.clip(first_chunk, 0, d_ - 1)
            vm = valid[:, None, :]
            return _finalize(
                jnp.where(vm, state.slots[ids0], 0.0),
                jnp.where(vm, state.ints[ids0], 0),
            )

        def mixed(_):
            # Per-destination-chunk unique source chunks (row-sorted run
            # compaction) -> gathered-source index per lane.
            sc_sorted = jnp.sort(src_chunk, axis=1)
            prev = jnp.concatenate(
                [jnp.full((d_, 1), -1, jnp.int32), sc_sorted[:, :-1]], axis=1
            )
            flag = (sc_sorted != prev) & (sc_sorted < sentinel)
            rank = jnp.cumsum(flag.astype(jnp.int32), axis=1) - 1
            kr = jnp.arange(k_src, dtype=jnp.int32)
            onehot = (rank[:, :, None] == kr[None, None, :]) & flag[:, :, None]
            uniq = jnp.sum(
                jnp.where(onehot, sc_sorted[:, :, None], 0), axis=1
            )  # [D, K]
            nuniq = jnp.sum(flag.astype(jnp.int32), axis=1)
            uniq = jnp.where(kr[None, :] < nuniq[:, None], uniq, -1)
            k_overflow = jnp.any(nuniq > k_src)

            eq = src_chunk[:, :, None] == uniq[:, None, :]  # [D, C, K]
            k_of = jnp.sum(jnp.where(eq, kr[None, None, :], 0), axis=-1)
            has = jnp.any(eq, axis=-1) & valid
            target = jnp.where(has, k_of * c + src_lane, k_src * c)

            def fast(_):
                # In-kernel DMA of each destination's (typically 1-3) source
                # chunks straight from HBM — no 8x-padded XLA pre-gather, and
                # the drift/origin finalization happens in the same kernel
                # (the .at[].set() versions copied the whole slot tensor
                # twice).
                return K2.permute_chunks_dma(
                    cfg, state.slots, state.ints, uniq, target,
                    structure.chunk_origin, r.cumd,
                    interpret=interpret, vma=vma,
                )

            def slow(_):
                big = jnp.concatenate(
                    [state.slots, _ints_to_f32(state.ints)], axis=1
                )
                f_all = big.shape[1]
                flat = jnp.moveaxis(big, 1, 2).reshape(-1, f_all)
                sflat = jnp.where(valid, src, 0).reshape(-1)
                nf = jnp.where(valid.reshape(-1)[:, None], flat[sflat], 0.0)
                newbig = jnp.moveaxis(nf.reshape(d_, c, f_all), 1, 2)
                return _finalize(
                    newbig[:, : r.nf, :], _f32_to_ints(newbig[:, r.nf :, :])
                )

            # Mosaic DMA slices (`slots.at[cid]`) must cover whole 128-lane
            # tiles: 3D chunks are C=128 (aligned), 2D chunks are C=64 —
            # the DMA fast path fails to compile there ("Slice shape along
            # dimension 2 must be aligned to tiling (128)"), so 2D statically
            # takes the XLA-gather form (identical values; 2D scenes are
            # small-N and resort-cheap). Interpret mode keeps the DMA path
            # so CPU CI still covers its indexing in both dims.
            if c % 128 != 0 and not interpret:
                return slow(None)
            return jax.lax.cond(k_overflow, slow, fast, None)

        slots, ints = jax.lax.cond(pure_relabel, pure, mixed, None)
        return slots, ints, structure

    slots, ints, structure = jax.lax.cond(relabel_ok, relabel, rebuild, None)

    overflow = (
        (structure.num_blocks > cfg.max_blocks)
        | (structure.num_grid_blocks > cfg.max_grid_blocks)
        | (structure.num_chunks > cfg.max_chunks)
    )
    new_state = SlotState(
        slots=slots,
        ints=ints,
        structure=structure,
        cum_disp=jnp.asarray(0.0, jnp.float32),
        grid_cache=cache_fn(structure) if cache_fn else (),
    )
    return new_state, overflow
