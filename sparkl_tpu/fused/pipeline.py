"""Fused MPM pipeline: persistent slot state + fused Pallas substep kernels.

The flagship single-chip performance path. Differences from
sparse.SparseMpmPipeline (same physics, same trajectories):

  * particle state lives in chunk-slot layout BETWEEN substeps — no
    per-substep marshalling between particle order and kernel layout;
  * stress, particle update, plasticity, failure, and the next dt bound run
    INSIDE the two Pallas transfer kernels (fused/kernels.py) instead of as
    separate XLA passes over particle arrays;
  * re-sorting is LAZY: the off-by-two window association
    (fused/structure.py) tolerates +-1 cell of drift, so the structure is
    rebuilt only when accumulated peak displacement approaches one cell —
    one wide row-permute, amortized over many substeps (the reference
    re-sorts every substep, `src/cuda/cuda_sparse_grid.rs launch_sort`).

Supported: all built-in constitutive/plastic/failure models, the full
damage family (eigenerosion, modified eigenerosion, CD-MPM phase field on
the ob2 block node table), fluid volume recomputation, grid hooks, all
collider boundary handling, boundary particle projection, and multi-chip
domain decomposition (via the parallel.domain.DomainFusedPipeline subclass,
which injects halo merge / dt pmin / slot migration through the hook
attributes below). NOT supported (falls back to SparseMpmPipeline via
`supports()`): custom Python models.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sparkl_tpu.core.grid import GridParams, GridState
from sparkl_tpu.core.params import DamageModel, SolverParameters
from sparkl_tpu.math import linalg
from sparkl_tpu.models import registry
from sparkl_tpu.models import constitutive as con
from sparkl_tpu.models import plasticity as plas
from sparkl_tpu.models import failure as fail
from sparkl_tpu.solver import dense
from sparkl_tpu.solver.pipeline import MpmHooks
from sparkl_tpu.sparse import blocks as B
from sparkl_tpu.sparse import transfer as T
from sparkl_tpu.sparse.pipeline import (
    OVERFLOW_TABLES,
    OVERFLOW_EIGEN,
    OVERFLOW_MERGE,
)
from sparkl_tpu.fused import kernels as K
from sparkl_tpu.fused import layout as L
from sparkl_tpu.fused import structure as S

# Resort when accumulated displacement reaches this fraction of a cell (the
# off-by-two window guarantees correctness up to one full cell).
DRIFT_FRACTION = 0.9


class FusedMpmPipeline:
    """Same public API as SparseMpmPipeline (step / step_with_stats /
    run_frames on a Particles pytree); slot state is an internal detail."""

    def __init__(
        self,
        grid: GridParams,
        models: registry.ModelSet,
        colliders=(),
        params: SolverParameters = SolverParameters(),
        gravity=None,
        hooks: Optional[MpmHooks] = None,
        config: Optional[B.BlockConfig] = None,
        donate: bool = True,
        use_pallas=None,  # None = auto (TPU backend); "interpret" for tests
        calibration_slack: float = 1.4,
        transfer_dtype: str = "float32",
        collider_pose_fn=None,
    ):
        ok, why = FusedMpmPipeline.supports(models, params)
        if not ok:
            raise ValueError(f"FusedMpmPipeline does not support: {why}")
        self.grid = grid
        self.models = models
        self.colliders = tuple(colliders)
        self.params = params
        d = grid.dim
        if gravity is None:
            gravity = [0.0, -9.81] if d == 2 else [0.0, -9.81, 0.0]
        self.gravity = jnp.asarray(gravity, jnp.float32)
        self.hooks = hooks or MpmHooks()
        self._cfg = config
        self._calibration_slack = calibration_slack
        self._jit = None
        self._jit_frames = {}
        self._donate = donate
        if use_pallas is None:
            # Off-TPU there is no Mosaic lowering: run the kernels in
            # interpreter mode (CPU CI / debugging).
            use_pallas = True if jax.default_backend() == "tpu" else "interpret"
        self._interpret = use_pallas == "interpret"
        self._kernel_vma = None
        tab_f, tab_i = K.pack_model_tables(models)
        self._tab_f, self._tab_i = tab_f, tab_i
        self._meta = dict(
            with_psi=params.damage_model
            in (DamageModel.EIGENEROSION, DamageModel.MODIFIED_EIGENEROSION),
            m_count=models.num_models,
            present_c=models.present_c,
            present_p=models.present_p,
            present_f=models.present_f,
            damage_model=int(params.damage_model),
            # Kernel B writes next-substep Kirchhoff stress into slot rows
            # from its consolidated SVD; kernel A reads instead of re-decomposing
            # (one SVD/substep instead of ~2.5 — the dominant in-kernel cost).
            # Requires phase/eh to be kernel-only state: damage pools and
            # failure models mutate phase between the kernels, so they keep
            # the compute-in-A path.
            stress_cache=(
                params.damage_model == DamageModel.NONE
                and not models.present_f
            ),
            # Transfer-dot operand dtype: bfloat16 doubles MXU rate and
            # halves the dot-operand traffic at ~3 decimal digits of weight
            # precision — an explicit speed/accuracy knob (default f32 keeps
            # reference-exact trajectories; the reference is f32 throughout).
            tdtype=jnp.bfloat16 if transfer_dtype == "bfloat16" else jnp.float32,
        )
        self._kparams = dict(gpu_velocity_clamp=params.gpu_velocity_clamp)
        # Candidate-list depth for the pairwise eigenerosion pooling:
        # chunks per block (nominal packing fills a block with <= 2 chunks in
        # 2D / 4 in 3D; compression can exceed it -> detected + regrown).
        self._eigen_mcb = 2 if grid.dim == 2 else 4
        # Injection points for the domain-decomposed subclass
        # (parallel.domain.DomainFusedPipeline) — mirrors the sparse
        # pipeline's hooks so the SAME halo/migration machinery drives the
        # flagship kernels (ref: the reference runs its one hot pipeline
        # under the multi-GPU halo path, cuda_mpm_pipeline.rs:407-533).
        # In-kernel-DMA merge (merge_blocks_dma) on real hardware; the
        # XLA KMAX-gather under interpret (identical values, far cheaper to
        # interpret). Tests may force True to cover DMA+vma on the CPU mesh.
        self._merge_dma = not self._interpret
        # Sticky scatter fallback for the merge: flipped on (host-side, with
        # a span retry) the first time any block exceeds MERGE_KMAX chunks —
        # the common case then runs the gather form with NO per-substep
        # density cond (see transfer.merge_images_to_grid overflow_out).
        self._merge_force_scatter = False
        # Runtime collider poses: `collider_pose_fn(t) -> tuple` aligned with
        # the collider set, entries None (static, baked pose) or
        # (translation [d], rotation [d, d]) as functions of simulation time
        # `t` — traced, so animated colliders run WITHOUT re-jit (ref: the
        # CPU solver reads the live rapier pose every step,
        # mls_solver.rs:7-9; poses update per frame in the testbed,
        # testbed_plugin.rs:452-456). Dynamic colliders are excluded from
        # the resort-time projection cache and re-projected every substep.
        self._pose_fn = collider_pose_fn
        if collider_pose_fn is not None:
            probe = collider_pose_fn(0.0)
            if len(probe) != len(self.colliders):
                raise ValueError(
                    f"collider_pose_fn returned {len(probe)} entries for "
                    f"{len(self.colliders)} colliders"
                )
            self._dynamic_ids = frozenset(
                i for i, e in enumerate(probe) if e is not None
            )
        else:
            self._dynamic_ids = frozenset()
        self._sim_time = 0.0          # running clock for collider_pose_fn
        self._pvary = None            # mark a scalar as device-varying (shard_map)
        self._halo_fn = None          # (node_table, structure) -> (node, ovf)
        self._dt_reduce = None        # dt -> dt (lax.pmin)
        self._need_sync = None        # resort trigger bool -> global bool
        self._emigrants_fn = None     # state -> bool (any slot left my tile)
        self._slot_migrate_fn = None  # SlotState -> (SlotState, ovf_bool)
        self._eigen_ghost_fn = None   # (state, eligible) -> (g0, g1, flags)

    @staticmethod
    def supports(models: registry.ModelSet, params: SolverParameters):
        """(ok, reason): can this scene run on the fused path?"""
        for t in models.present_c:
            if t >= con.CUSTOM_BASE:
                return False, f"custom constitutive model {t}"
        for t in models.present_p:
            if t >= plas.PLASTIC_CUSTOM_BASE:
                return False, f"custom plastic model {t}"
        for t in models.present_f:
            if t >= fail.FAILURE_CUSTOM_BASE:
                return False, f"custom failure model {t}"
        return True, ""

    # -- capacity management --------------------------------------------------

    def _ensure_cfg(self, p):
        if self._cfg is None:
            self._cfg = S.calibrate_ob2(
                self.grid, p.position, p.active, slack=self._calibration_slack
            )
        if self._jit is None:
            self._jit = jax.jit(
                self._frames_impl,
                static_argnums=(1,),
                donate_argnums=(0,) if self._donate else (),
            )
            # Pack/unpack as single compiled programs: un-jitted they run
            # op-by-op (dt bounds + stress seed + sort + 64-row gathers are
            # hundreds of dispatches), which over the tunneled device costs
            # more wall time than the whole multi-frame substep program at
            # 1M particles (measured: ~90 of ~107 ms/substep in the round-3
            # bench was this host-side dispatch, not device compute).
            self._jit_pack = jax.jit(self._pack)
            self._jit_unpack = jax.jit(
                self._unpack, static_argnums=(1,),
                donate_argnums=(0,) if self._donate else (),
            )

    def _grow(self, factor=1.6):
        c = self._cfg
        q = lambda x, step: -(-int(x) // step) * step
        # max_chunks stays a multiple of 512 (calibrate_ob2's quantum) so
        # the kernels keep their full CHUNKS_PER_PROGRAM batch after regrow.
        self._cfg = B.BlockConfig(
            max_blocks=q(c.max_blocks * factor + 64, 256),
            max_chunks=q(c.max_chunks * factor + 64, 512),
            chunk_size=c.chunk_size,
            max_grid_blocks=q(c.max_grid_blocks * factor + 64, 256),
        )
        self._jit = None
        self._ensure_cfg(None)

    # -- row helpers ----------------------------------------------------------

    @property
    def _rows(self):
        return L.Rows(self.grid.dim)

    def _occupied(self, state):
        return (state.ints[:, L.I_FLAGS, :] & L.OCCUPIED) != 0

    def _active(self, state):
        return (state.ints[:, L.I_FLAGS, :] & L.ACTIVE) != 0

    # -- optional per-substep stages -------------------------------------------

    def _recompute_fluids(self, state):
        """Fluid volume recomputation on slot rows (mass-only P2G + gather;
        ref: fluids_volume.rs recompute_fluids_volumes)."""
        grid, cfg, r = self.grid, self._cfg, self._rows
        d = grid.dim
        cell_order = T.ZMAJOR_ORDER_3D if d == 3 else None
        images = K.mass_p2g_fused(
            grid, cfg, state.slots, state.ints, interpret=self._interpret,
            vma=self._kernel_vma, nchunks=state.structure.num_chunks,
        )
        node, merge_ov = T.merge_images_to_grid(
            grid, cfg, state.structure, images, gather=True,
            cell_order=cell_order, dma=self._merge_dma,
            interpret=self._interpret, vma=self._kernel_vma,
            overflow_out=True, force_scatter=self._merge_force_scatter,
        )
        halo_ov = jnp.asarray(False)
        if self._halo_fn is not None:
            # Boundary-column partial masses summed across shards before the
            # density gather (the multi-chip extension of fluids_volume.rs).
            node, halo_ov = self._halo_fn(node, state.structure)
        windows = T.gather_grid_windows(
            grid, cfg, state.structure, node, cell_order=cell_order
        )
        out = K.mass_g2p_fused(
            grid, cfg, state.slots, state.ints, windows,
            interpret=self._interpret, vma=self._kernel_vma,
            nchunks=state.structure.num_chunks,
        )
        new_mass = out[:, 0, :]

        h = grid.cell_width
        new_density = new_mass / (h**d)
        mass_row = state.slots[:, r.mass, :]
        vol0 = state.slots[:, r.vol0, :]
        new_volume = mass_row / jnp.maximum(new_density, 1e-20)
        ct = self._tab_i[:, 0][state.ints[:, L.I_MODEL, :]]
        is_fluid = (ct == con.EOS_MONAGHAN_SPH) & self._active(state)
        f00 = state.slots[:, r.defgrad, :]
        f00 = jnp.where(
            is_fluid, new_volume / jnp.maximum(vol0, 1e-30), f00
        )
        slots = state.slots.at[:, r.defgrad, :].set(f00)

        # The EOS dt bound depends on F00 — refresh the carried bound row
        # (the sparse pipeline recomputes bounds after the volume pass too).
        slots = self._refresh_dtb_rows(state.replace(slots=slots))
        flags = (
            halo_ov.astype(jnp.int32) * OVERFLOW_TABLES
            | merge_ov.astype(jnp.int32) * OVERFLOW_MERGE
        )
        return state.replace(slots=slots), flags

    def _refresh_dtb_rows(self, state):
        """Recompute the dt-bound row from current slot rows in XLA (only
        used on the fluids path; ref: timestep_estimator.rs)."""
        grid, r = self.grid, self._rows
        d = grid.dim
        h = grid.cell_width
        slots, ints = state.slots, state.ints
        mid = ints[:, L.I_MODEL, :]
        g = [
            [slots[:, r.grad + i * d + j, :] for j in range(d)] for i in range(d)
        ]
        f = [
            [slots[:, r.defgrad + i * d + j, :] for j in range(d)]
            for i in range(d)
        ]
        vel = [slots[:, r.vel + ax, :] for ax in range(d)]
        from sparkl_tpu.math import cmat

        d_coeff = (h * h) / 4.0
        norm_b = d_coeff * jnp.sqrt(cmat.frob2_c(g))
        apic_v = norm_b * 6.0 * float(np.sqrt(d)) / h
        vsq = sum(v * v for v in vel)
        vnorm = jnp.sqrt(vsq)
        vtot = vnorm + apic_v
        vel_bound = jnp.where(vtot > 0.0, h / jnp.maximum(vtot, 1e-20), jnp.inf)
        con_bound = K._timestep_bound_c(
            self._meta, self._tab_f, self._tab_i, mid,
            slots[:, r.phase, :], slots[:, r.eh, :], f,
            slots[:, r.mass, :], slots[:, r.vol0, :], vnorm, vsq, h, d,
        )
        failed = slots[:, r.failed, :] != 0.0
        con_bound = jnp.where(failed, jnp.inf, con_bound)
        bound = jnp.minimum(vel_bound, con_bound)
        bound = jnp.where(self._active(state), bound, jnp.inf)
        return slots.at[:, r.dtb, :].set(jnp.minimum(bound, L.BIGF))

    def _eigen_candidates(self, structure):
        """Per-chunk candidate chunk ids for pairwise pooling: all chunks of
        the 3^d neighbor blocks (own included), up to _eigen_mcb chunks per
        block. Returns ([D, KN] i32 ids with D = pad row, overflow flag)."""
        from sparkl_tpu.core.grid import stencil_offsets

        grid, cfg = self.grid, self._cfg
        dim = grid.dim
        d_ = cfg.max_chunks
        mb = cfg.max_blocks
        bspace = S.block_space_ob2(grid)
        strides = np.ones(dim, np.int64)
        for ax in range(dim - 2, -1, -1):
            strides[ax] = strides[ax + 1] * bspace[ax + 1]
        sentinel = jnp.int32(np.prod(bspace))

        bk = structure.block_keys  # [MB] sorted, sentinel pad
        coords = []
        rem = bk
        for ax in range(dim):
            coords.append(rem // int(strides[ax]))
            rem = rem % int(strides[ax])
        coords = jnp.stack(coords, axis=-1)  # [MB, d]
        offs = jnp.asarray(stencil_offsets(dim) - 1, jnp.int32)  # {-1,0,1}^d
        nco = coords[:, None, :] + offs[None, :, :]  # [MB, 3^d, d]
        in_space = (
            jnp.all(nco >= 0, axis=-1)
            & jnp.all(nco < jnp.asarray(bspace, jnp.int32), axis=-1)
            & (bk < sentinel)[:, None]
        )
        nkeys = (nco * jnp.asarray(strides, jnp.int32)[None, None, :]).sum(-1)
        nkeys = jnp.where(in_space, nkeys, sentinel)
        found = jnp.searchsorted(bk, nkeys.reshape(-1)).astype(jnp.int32)
        found = jnp.clip(found, 0, mb - 1)
        hit = (bk[found] == nkeys.reshape(-1)) & (nkeys.reshape(-1) < sentinel)
        nblk = jnp.where(hit, found, mb).reshape(mb, -1)  # [MB, 3^d]

        mcb = self._eigen_mcb
        first = jnp.concatenate(
            [structure.block_first_chunk, jnp.full((1,), d_, jnp.int32)]
        )[nblk]  # [MB, 3^d]
        nch = jnp.concatenate(
            [structure.block_num_chunks, jnp.zeros((1,), jnp.int32)]
        )[nblk]
        overflow = jnp.any(nch > mcb)
        t = jnp.arange(mcb, dtype=jnp.int32)
        cand_blk = jnp.where(
            t[None, None, :] < nch[:, :, None],
            first[:, :, None] + t[None, None, :],
            d_,
        ).reshape(mb, -1)  # [MB, KN]
        cand_blk = jnp.concatenate(
            [cand_blk, jnp.full((1, cand_blk.shape[1]), d_, jnp.int32)]
        )  # row MB = pad (tail/pad chunks)
        cand = cand_blk[jnp.clip(structure.chunk_block, 0, mb)]  # [D, KN]
        return cand, overflow

    def _evolve_eigenerosion(self, state):
        """Eigenerosion on slot rows via EXACT pairwise pooling over the 3^d
        neighbor blocks (fused/kernels.eigen_pool_fused) — no bucket tables,
        no per-cell capacity to overflow (ref: eigenerosion.rs:9-58 pools
        exact neighborhoods). The only capacity is chunks-per-block in the
        candidate list (_eigen_mcb), detected and regrown."""
        grid, cfg, r = self.grid, self._cfg, self._rows
        d = grid.dim
        d_ = cfg.max_chunks
        c = cfg.chunk_size
        slots, ints = state.slots, state.ints
        structure = state.structure

        cpf = slots[:, r.cpf, :]
        phase = slots[:, r.phase, :]
        failed = slots[:, r.failed, :] != 0.0
        active = self._active(state)
        mass = slots[:, r.mass, :]
        psi_pos = slots[:, r.psi_pos, :]
        eligible = (cpf != 0.0) & (phase > 0.0) & ~failed & active

        # Packed eigen rows [D, 8, C]: pos(d), m*psi, m, eligible.
        e_rows = [slots[:, r.pos + ax, :] for ax in range(d)]
        e_rows += [mass * psi_pos, mass, eligible.astype(jnp.float32)]
        while len(e_rows) < K.EIG_ROWS:
            e_rows.append(jnp.zeros_like(mass))
        e = jnp.stack(e_rows, axis=1)

        cand, cand_ov = self._eigen_candidates(structure)
        kn = cand.shape[1]
        e_pad = jnp.concatenate(
            [e, jnp.zeros((1, K.EIG_ROWS, c), jnp.float32)], axis=0
        )
        g = e_pad.reshape(d_ + 1, K.EIG_ROWS * c)[cand.reshape(-1)].reshape(
            d_, kn, K.EIG_ROWS, c
        )
        # Self flag (row 7): candidate chunk == own chunk.
        own = jnp.arange(d_, dtype=jnp.int32)[:, None]
        selfflag = (cand == own).astype(jnp.float32)  # [D, KN]
        g = g.at[:, :, K.EIG_SELF, :].set(
            jnp.broadcast_to(selfflag[:, :, None], (d_, kn, c))
        )

        pooled = K.eigen_pool_fused(
            grid, cfg, e, g, interpret=self._interpret, vma=self._kernel_vma
        )
        pool0 = pooled[:, 0, :]
        pool1 = pooled[:, 1, :]
        cand_ov = cand_ov.astype(jnp.int32) * OVERFLOW_EIGEN
        if self._eigen_ghost_fn is not None:
            # Cross-shard ghost contributions: exact pairwise sums against
            # boundary-strip particles of neighbor tiles (domain subclass).
            g0, g1, gov = self._eigen_ghost_fn(state, eligible)
            pool0 = pool0 + g0
            pool1 = pool1 + g1
            cand_ov = cand_ov | gov

        par1 = slots[:, r.par1, :] + jnp.where(eligible, pool0, 0.0)
        par2 = slots[:, r.par2, :] + jnp.where(eligible, pool1, 0.0)
        has_crack = cpf != 0.0
        safe2 = jnp.where(par2 > 0.0, par2, 1.0)
        energy = par1 * cpf * grid.cell_width / safe2
        trip = has_crack & (energy > slots[:, r.cthr, :])
        slots = slots.at[:, r.par1, :].set(jnp.where(has_crack, energy, par1))
        slots = slots.at[:, r.phase, :].set(jnp.where(trip, 0.0, phase))
        return state.replace(slots=slots), cand_ov

    def _update_phase_field_slots(self, state, dt):
        """CD-MPM phase field on slot rows: the CG runs on the ob2
        active-block node table (no dense grid anywhere; ref:
        phase_field.rs:11-317 runs on the sparse SpGrid). The phase stencil
        (base+1, base+2 per axis — the shifted-tap geometry in
        solver/phase_field.py) stays inside the owner + corner blocks even
        at maximal (<1 cell) slot drift, so no resort is forced."""
        from sparkl_tpu.math import cmat
        from sparkl_tpu.solver import phase_field as PF

        grid, cfg, r = self.grid, self._cfg, self._rows
        d = grid.dim
        slots = state.slots
        row = lambda k: slots[:, k, :].reshape(-1)
        pos = jnp.stack([row(r.pos + ax) for ax in range(d)], axis=-1)
        active = self._active(state).reshape(-1)
        f = [[row(r.defgrad + i * d + j) for j in range(d)] for i in range(d)]
        volume = jnp.where(active, row(r.vol0) * cmat.det_c(f), 0.0)
        space = PF.BlockNodeSpace(
            grid, state.structure.grid_keys, S.block_space_ob2(grid),
            block_offset=1,
        )
        phase = PF.update_phase_field_arrays(
            grid, pos, active, row(r.phase), row(r.psi_pos), row(r.m_c),
            row(r.g), volume, dt, node_space=space,
        )
        c = cfg.chunk_size
        return state.replace(
            slots=slots.at[:, r.phase, :].set(phase.reshape(cfg.max_chunks, c))
        )

    def _project_boundary_slots(self, slots, ints, dt, poses=None):
        """Boundary particle projection on slot rows (post-advection, the
        same stage the reference runs it: grid_to_particle.rs:151-166 —
        penetrating particles snap to the collider surface with the matching
        velocity correction). The projection displacement feeds the drift
        row so the lazy-resort trigger accounts for it, and the carried dt
        bound is refreshed from the corrected velocities."""
        r, d = self._rows, self.grid.dim
        active = (ints[:, L.I_FLAGS, :] & L.ACTIVE) != 0
        pos = jnp.stack([slots[:, r.pos + ax, :] for ax in range(d)], axis=-1)
        vel = jnp.stack([slots[:, r.vel + ax, :] for ax in range(d)], axis=-1)
        disp = jnp.zeros(active.shape, jnp.float32)
        for ci, col in enumerate(self.colliders):
            proj, inside = col.project_point(pos, dense._pose_of(poses, ci))
            inside = inside & active
            delta = proj - pos
            vel = jnp.where(inside[..., None], vel + delta / dt, vel)
            disp = disp + jnp.where(
                inside, jnp.max(jnp.abs(delta), axis=-1), 0.0
            )
            pos = jnp.where(inside[..., None], proj, pos)
        for ax in range(d):
            slots = slots.at[:, r.pos + ax, :].set(pos[..., ax])
            slots = slots.at[:, r.vel + ax, :].set(vel[..., ax])
        slots = slots.at[:, r.cumd, :].add(disp)
        # Velocity changed -> the carried dt-bound row is stale; recompute
        # from the corrected rows (same helper the fluids pass uses).
        from types import SimpleNamespace

        return self._refresh_dtb_rows(SimpleNamespace(slots=slots, ints=ints))

    # -- one substep (traced) --------------------------------------------------

    def _substep(self, state, dt, poses=None):
        grid, cfg, params, r = self.grid, self._cfg, self.params, self._rows
        dim = grid.dim
        cpb = B.cells_per_block(dim)
        with_psi = self._meta["with_psi"]
        nf = 1 + dim + (2 if with_psi else 0)

        slots_p2g = state.slots
        if any(float(c.penalty_stiffness) > 0.0 for c in self.colliders):
            # Penalty-stiffness coupling: adjust the velocity rows seen by
            # kernel A so the scattered momentum is m*v + force*dt
            # (dense.penalty_velocity_delta's contract); particle state is
            # untouched.
            pos = jnp.stack(
                [state.slots[:, r.pos + ax, :] for ax in range(dim)], axis=-1
            )
            pen = dense.penalty_velocity_delta(
                self.colliders, pos, state.slots[:, r.mass, :], dt, poses
            )
            for ax in range(dim):
                slots_p2g = slots_p2g.at[:, r.vel + ax, :].add(pen[..., ax])

        images = K.p2g_fused(
            grid, cfg, self._meta, slots_p2g, state.ints, dt,
            self._tab_f, self._tab_i, interpret=self._interpret,
            vma=self._kernel_vma, nchunks=state.structure.num_chunks,
        )
        # The fused 3D kernels emit/consume z-major region cells; the relabel
        # is folded into merge/windows' constant permutations (free).
        cell_order = T.ZMAJOR_ORDER_3D if dim == 3 else None
        node, merge_ov = T.merge_images_to_grid(
            grid, cfg, state.structure, images, cell_order=cell_order,
            gather=True, dma=self._merge_dma,
            interpret=self._interpret, vma=self._kernel_vma,
            overflow_out=True, force_scatter=self._merge_force_scatter,
        )
        halo_ov = jnp.asarray(False)
        if self._halo_fn is not None:
            # Cross-device additive merge of boundary-layer block rows
            # (ref: sort.rs merge_halo_blocks) — boundary storage columns end
            # up replicated-and-complete on both owners, so the per-shard
            # grid update + G2P below see identical values.
            node, halo_ov = self._halo_fn(node, state.structure)
        node = node.reshape(cfg.max_grid_blocks + 1, nf, cpb)

        mass = node[:, 0, :]
        mom = jnp.moveaxis(node[:, 1 : 1 + dim, :], 1, -1)
        if with_psi:
            psi_mom_g = node[:, 1 + dim, :]
            psi_mass_g = node[:, 2 + dim, :]
        else:
            psi_mom_g = jnp.zeros_like(mass)
            psi_mass_g = jnp.zeros_like(mass)

        inv_mass = linalg.inv_exact(mass)
        velocity = (mom + mass[..., None] * self.gravity * dt) * inv_mass[..., None]

        node_pos, projections = state.grid_cache
        if self._dynamic_ids:
            # Moving colliders: re-project the dynamic entries at the live
            # pose (the static ones keep their resort-time cache rows —
            # under gpu semantics the combined data is rebuilt whole).
            if params.gpu_boundary_semantics:
                projections = dense.gpu_grid_projection_data(
                    grid, self.colliders, node_pos,
                    params.boundary_handling, poses,
                )
            else:
                dyn = dense.grid_node_projections(
                    self.colliders, node_pos, poses, only=self._dynamic_ids
                )
                projections = tuple(
                    dyn[i] if i in self._dynamic_ids else projections[i]
                    for i in range(len(self.colliders))
                )
        gstate = GridState(
            mass=mass,
            momentum=mom,
            velocity=velocity,
            psi_momentum=psi_mom_g,
            psi_mass=psi_mass_g,
        )
        gstate = dense.grid_update(
            grid, gstate, self.colliders, dt, params.boundary_handling,
            params.simulation_dofs, node_positions=node_pos,
            projections=projections,
            gpu_boundary_semantics=params.gpu_boundary_semantics,
            poses=poses,
        )
        gstate = self.hooks.post_grid_update(gstate, grid, dt, node_pos)
        velocity = gstate.velocity.at[cfg.max_grid_blocks].set(0.0)

        win_parts = [jnp.moveaxis(velocity, -1, 1)]
        if with_psi:
            win_parts.append(
                (psi_mom_g * linalg.inv_exact(psi_mass_g))[:, None, :]
            )
        n_win = dim + (1 if with_psi else 0)
        win_fields = jnp.concatenate(win_parts, axis=1).reshape(
            cfg.max_grid_blocks + 1, n_win * cpb
        )
        windows = T.gather_grid_windows(
            grid, cfg, state.structure, win_fields, cell_order=cell_order
        )

        new_slots = K.g2p_fused(
            grid, cfg, self._meta, self._kparams, state.slots, state.ints,
            windows, dt, self._tab_f, self._tab_i, interpret=self._interpret,
            vma=self._kernel_vma, nchunks=state.structure.num_chunks,
        )

        if params.enable_boundary_particle_projection and self.colliders:
            new_slots = self._project_boundary_slots(
                new_slots, state.ints, dt, poses
            )

        # Lazy-resort trigger: the kernel accumulates per-slot drift; the
        # trigger scalar is its maximum (max of per-particle sums — much
        # tighter than summing global per-substep maxima when only a few
        # particles move fast, e.g. surface flow on settled sand).
        flags = (
            halo_ov.astype(jnp.int32) * OVERFLOW_TABLES
            | merge_ov.astype(jnp.int32) * OVERFLOW_MERGE
        )
        return state.replace(
            slots=new_slots,
            cum_disp=jnp.max(new_slots[:, r.cumd, :]),
        ), flags

    def _step_body(self, state, remaining, overflow, peak, poses=None):
        """One substep incl. the lazy resort; returns (state, dt, ...)."""
        grid, params, cfg, r = self.grid, self.params, self._cfg, self._rows
        min_dt = params.dt / params.max_num_substeps

        # Lazy resort: the ob2 window is valid while accumulated drift stays
        # under one cell; rebuild + permute only when needed.
        need_local = state.cum_disp >= DRIFT_FRACTION * grid.cell_width

        vary = (
            (lambda t: jax.tree_util.tree_map(self._pvary, t))
            if self._pvary is not None
            else (lambda t: t)
        )

        def local_resort(s):
            s2, ov = L.resort(
                grid, cfg, s, grid.dim,
                interpret=self._interpret, vma=self._kernel_vma,
                cache_fn=self._grid_cache,
            )
            return vary(s2), ov.astype(jnp.int32) * OVERFLOW_TABLES

        def no_resort(s):
            zero = jnp.asarray(0, jnp.int32)
            if self._pvary is not None:
                # cond branches must agree on mesh-axis variance: the resort
                # branch's overflow flag is device-varying (check_vma).
                zero = self._pvary(zero)
            return s, zero

        if self._slot_migrate_fn is None:
            state, ov = jax.lax.cond(need_local, local_resort, no_resort, state)
            overflow = overflow | ov
            nresort = need_local.astype(jnp.int32)
            dt_pre = None
        else:
            # Domain decomposition: resorts are PER-SHARD lazy (chunk keys
            # are global, so shards may rebuild at different substeps — the
            # halo merge contract is unaffected). Only slot MIGRATION is a
            # collective epoch: when any shard holds emigrant rows (ob2
            # block outside its tile), every shard enters the ppermutes +
            # rebuild together. The reference's analog runs the halo
            # choreography every substep on all devices
            # (cuda_mpm_pipeline.rs:407-533); here the common case is the
            # cheap shard-local rebuild and no cross-shard stall.
            def migrate_resort(s):
                s, mov = self._slot_migrate_fn(s)
                s2, ov = L.resort(
                    grid, cfg, s, grid.dim,
                    interpret=self._interpret, vma=self._kernel_vma,
                    cache_fn=self._grid_cache,
                )
                return vary(s2), (mov | ov).astype(jnp.int32) * OVERFLOW_TABLES

            # ONE collective decides both the global dt and the migration
            # epoch: the local dt bound rides the same pmin as the emigrant
            # bit (encoded as +-1 in lane 1). Valid because neither resort
            # nor migration changes the global multiset of occupied rows'
            # carried dt bounds — only the fluids volume pass rewrites them,
            # so that path keeps the post-pass reduction below. (VERDICT r4
            # item 1: one fewer rendezvous per substep.)
            dt_pre = None
            if not params.force_fluids_volume_recomputation:
                occ0 = self._occupied(state)
                local_dt = jnp.min(
                    jnp.where(occ0, state.slots[:, r.dtb, :], jnp.inf)
                )
                emig = self._emigrants_fn(state)
                packed = self._dt_reduce(
                    jnp.stack([local_dt, jnp.where(emig, -1.0, 1.0)])
                )
                dt_pre = packed[0]
                need_mig = packed[1] < 0.0
            else:
                need_mig = self._need_sync(self._emigrants_fn(state))
            state, ov_m = jax.lax.cond(
                need_mig, migrate_resort, no_resort, state
            )
            # Shard-local drift rebuild (skipped when the collective epoch
            # already resorted this substep — it reset cum_disp).
            need_local = need_local & ~need_mig
            state, ov_l = jax.lax.cond(
                need_local, local_resort, no_resort, state
            )
            overflow = overflow | ov_m | ov_l
            nresort = (need_mig | need_local).astype(jnp.int32)
        peak = jnp.maximum(peak, state.structure.num_chunks)

        # Out-of-grid marking is folded into kernel B (from post-advection
        # positions == the dense pipeline's top-of-next-substep mark).

        if params.force_fluids_volume_recomputation:
            state, fv_flags = self._recompute_fluids(state)
            overflow = overflow | fv_flags

        max_dt = jnp.minimum(remaining, params.max_substep_dt)
        if dt_pre is not None:
            # Already pmin-reduced (folded with the emigrant bit above).
            dt = jnp.minimum(dt_pre, max_dt)
        else:
            occupied = self._occupied(state)
            dtb = jnp.where(occupied, state.slots[:, r.dtb, :], jnp.inf)
            dt = jnp.minimum(jnp.min(dtb), max_dt)
            if self._dt_reduce is not None:
                dt = self._dt_reduce(dt)
        dt = jnp.where((dt < min_dt) & (remaining > min_dt), min_dt, dt)

        if params.damage_model == DamageModel.EIGENEROSION:
            state, eig_ov = self._evolve_eigenerosion(state)
            overflow = overflow | eig_ov
        elif params.damage_model == DamageModel.CD_MPM:
            state = self._update_phase_field_slots(state, dt)

        state, sub_flags = self._substep(state, dt, poses)
        overflow = overflow | sub_flags
        remaining = jnp.where(params.stop_after_one_substep, 0.0, remaining - dt)
        return state, remaining, overflow, peak, nresort

    def _step_impl(self, state, poses=None):
        params = self.params
        if self._pvary is not None:
            # Loop carries must have uniform mesh-axis variance; freshly
            # packed state carries replicated scalars (cum_disp etc.).
            state = jax.tree_util.tree_map(self._pvary, state)

        def cond(carry):
            remaining, niter = carry[1], carry[2]
            return (remaining > 0.0) & (niter < params.max_num_substeps)

        def body(carry):
            state, remaining, niter, overflow, peak, nres = carry
            state, remaining, overflow, peak, nr1 = self._step_body(
                state, remaining, overflow, peak, poses
            )
            return (state, remaining, niter + 1, overflow, peak, nres + nr1)

        zero = jnp.asarray(0, jnp.int32)
        zvar = zero if self._pvary is None else self._pvary(zero)
        carry = (
            state,
            jnp.asarray(params.dt, jnp.float32),
            zero,   # niter: replicated (dt is pmin-global)
            zvar,   # overflow: per-shard flag bits
            zvar,   # peak chunks: per-shard
            zvar,   # resorts taken: per-shard (lazy resorts desynchronize)
        )
        state, _, niter, overflow, peak, nres = jax.lax.while_loop(cond, body, carry)
        return state, niter, overflow, peak, nres

    def _frames_impl(self, state, num_frames, t0=0.0):
        if self._pvary is not None:
            state = jax.tree_util.tree_map(self._pvary, state)

        def body(carry, frame_idx):
            state, total, ov, peak, nres = carry
            poses = None
            if self._pose_fn is not None:
                # Poses are per-frame values, like the reference's rapier
                # step -> collider-set update cadence
                # (testbed_plugin.rs:452-456): evaluated from simulation
                # time at the frame start, constant across its substeps.
                t = jnp.asarray(t0, jnp.float32) + (
                    frame_idx.astype(jnp.float32) * self.params.dt
                )
                poses = self._pose_fn(t)
            state, niter, ov2, pk, nr1 = self._step_impl(state, poses)
            return (
                state, total + niter, ov | ov2, jnp.maximum(peak, pk),
                nres + nr1,
            ), None

        zero = jnp.asarray(0, jnp.int32)
        zvar = zero if self._pvary is None else self._pvary(zero)
        (state, total, ov, peak, nres), _ = jax.lax.scan(
            body,
            (state, zero, zvar, zvar, zvar),
            jnp.arange(num_frames, dtype=jnp.int32),
            length=num_frames,
        )
        return state, total, ov, peak, nres

    # -- public API -------------------------------------------------------------

    def _grid_cache(self, structure):
        """Structure-derived grid data carried across substeps: node
        positions + per-collider node projections (the reference's
        projection cache, reset_grid.rs:29-63)."""
        grid, cfg = self.grid, self._cfg
        dim = grid.dim
        cpb = B.cells_per_block(dim)
        node_pos = S.block_node_positions_ob2(grid, structure.grid_keys)
        node_pos = jnp.concatenate(
            [node_pos, jnp.full((1, cpb, dim), 1.0e10, jnp.float32)], axis=0
        )
        if self.params.gpu_boundary_semantics and self.colliders:
            if self._dynamic_ids:
                # The best-collider/sdf-gradient data mixes ALL colliders,
                # so any dynamic collider makes the whole product
                # pose-dependent: recomputed per substep instead (see
                # _substep), nothing cacheable here.
                projections = None
            else:
                # GPU-pipeline semantics: best-collider status + sdf-gradient
                # normals, recomputed per resort exactly like the reference's
                # NotComputed-gated cache (src_kernels/cuda/grid_update.rs:106-140).
                projections = dense.gpu_grid_projection_data(
                    grid, self.colliders, node_pos, self.params.boundary_handling
                )
        else:
            # Cache only the static colliders' projections; dynamic entries
            # stay None and are re-projected at the live pose every substep.
            static = frozenset(range(len(self.colliders))) - self._dynamic_ids
            projections = dense.grid_node_projections(
                self.colliders, node_pos, only=static
            )
        return (node_pos, projections)

    def _pack(self, particles):
        particles = dense.mark_out_of_grid_failed(self.grid, particles)
        dtb = dense.particle_dt_bounds(self.grid, particles, self.models)
        stress = None
        if self._meta.get("stress_cache"):
            # Seed the cache rows so the FIRST kernel A reads valid stress
            # (kernel B maintains them from then on).
            stress = registry.kirchhoff_stress(
                self.models, particles.model_id, particles.phase,
                particles.elastic_hardening, particles.deformation_gradient,
                particles.velocity_gradient, particles.mass,
                particles.volume0,
            )
        return L.pack(self.grid, self._cfg, particles, dtb,
                      cache_fn=self._grid_cache, stress=stress)

    def _unpack(self, state, capacity):
        return L.unpack(self.grid, self._cfg, state, capacity, self.grid.dim)

    def step(self, particles):
        p, _ = self.step_with_stats(particles)
        return p

    def step_with_stats(self, particles):
        p, n = self.run_frames(particles, 1)
        return p, n

    # -- state-resident API -----------------------------------------------------
    #
    # The Particles pytree is the API-boundary format; converting to/from it
    # costs real device programs (pack: dt bounds + stress seed + sort +
    # row gathers; unpack: the inverse permutation). A simulation session
    # should pay that ONCE, not per frame span — the reference keeps its
    # state device-resident the same way and reads back only what rendering
    # needs per frame (testbed_plugin.rs:533-588 pinned-staging readback).

    def pack_state(self, particles, sim_time: float | None = None):
        """Particles -> resident SlotState (capacity-checked, regrown to
        fit). Advance it with run_frames_state; read back with unpack_state.
        `sim_time` seeds the clock collider_pose_fn is evaluated against;
        None (default) KEEPS the pipeline's running clock, so repeated
        run_frames / step_with_stats calls on animated scenes continue the
        animation instead of silently replaying t=0 poses (advisor r4)."""
        self._ensure_cfg(particles)
        self._state_capacity = particles.capacity
        if sim_time is not None:
            self._sim_time = float(sim_time)
        for _attempt in range(6):
            state = self._jit_pack(particles)
            s = state.structure
            # One batched host read instead of three round-trips.
            nb, ngb, nc = jax.device_get(
                (s.num_blocks, s.num_grid_blocks, s.num_chunks)
            )
            if (
                int(nb) > self._cfg.max_blocks
                or int(ngb) > self._cfg.max_grid_blocks
                or int(nc) > self._cfg.max_chunks
            ):
                self._grow()
                continue
            return state
        raise RuntimeError("block table capacity still overflowing after regrows")

    def unpack_state(self, state, capacity: int | None = None):
        """Resident SlotState -> Particles pytree (original-order rows)."""
        if capacity is None:
            capacity = self._state_capacity
        return self._jit_unpack(state, capacity)

    def _repack_state(self, state):
        """Unpack at the current cfg, regrow tables, repack at the new cfg
        (state-resident counterpart of the regrow-retry in the reference's
        launch_sort loop, cuda_sparse_grid.rs:161-253)."""
        particles = self.unpack_state(state)
        self._grow()
        return self._jit_pack(particles)

    def run_frames_state(self, state, num_frames: int):
        """Advance a resident SlotState by `num_frames` frames in ONE device
        program; returns (state, total_substeps). Capacity overflow restores
        the pre-span snapshot, regrows, and retries the span. Simulation
        time advances num_frames * params.dt (collider_pose_fn sees it as
        a traced input — changing poses never re-jits)."""
        t0 = getattr(self, "_sim_time", 0.0)
        for _attempt in range(6):
            # Donation insurance: _jit consumes `state`'s buffers; keep a
            # device copy so an overflowed span can be retried.
            backup = (
                jax.tree_util.tree_map(jnp.copy, state) if self._donate else state
            )
            state, total, overflow, peak, nres = self._jit(
                state, num_frames, jnp.float32(t0)
            )
            total_, flags, peak_, nres_ = map(
                int, jax.device_get((total, overflow, peak, nres))
            )
            if flags == 0:
                del backup
                # Diagnostics: resorts actually taken in the span.
                self.last_resorts = nres_
                if peak_ > 0.85 * self._cfg.max_chunks:
                    # Preemptive regrow before an overflow wastes a span
                    # (ref: cuda_sparse_grid.rs regrows at >50% load).
                    state = self._repack_state(state)
                self._sim_time = t0 + num_frames * float(self.params.dt)
                return state, total_
            state = backup
            if flags & OVERFLOW_EIGEN:
                # Eigenerosion candidate-list overflow: a block held more
                # chunks than _eigen_mcb. Double it and recompile (never
                # silently mis-pool).
                self._eigen_mcb *= 2
                self._jit = None
                self._ensure_cfg(None)
            if flags & OVERFLOW_MERGE:
                # A block compressed past MERGE_KMAX chunks: pin the scatter
                # merge (density is physics, not capacity — regrowing tables
                # would not help) and retry the span.
                self._merge_force_scatter = True
                self._jit = None
                self._ensure_cfg(None)
            if flags & OVERFLOW_TABLES:
                state = self._repack_state(state)
        raise RuntimeError("block table capacity still overflowing after regrows")

    def run_frames(self, particles, num_frames: int,
                   frames_per_launch: int | None = None):
        """Advance `num_frames` frames in ONE device program; slot state is
        packed once, carried across frames, unpacked once. Capacity overflow
        retries the whole span with grown tables (ref: the hashmap regrow
        loop, cuda_sparse_grid.rs:161-253)."""
        if frames_per_launch is not None and frames_per_launch < num_frames:
            total = 0
            done = 0
            while done < num_frames:
                k = min(frames_per_launch, num_frames - done)
                particles, t = self.run_frames(particles, k)
                total += int(t)
                done += k
            return particles, total
        capacity = particles.capacity
        state = self.pack_state(particles)
        state, total = self.run_frames_state(state, num_frames)
        return self.unpack_state(state, capacity), total

    def _adapt_capacity(self, peak_chunks):
        """Preemptive regrow before an overflow wastes a frame (ref:
        cuda_sparse_grid.rs regrows its hashmap at >50% load)."""
        cap = self._cfg.max_chunks
        if peak_chunks > 0.85 * cap:
            self._grow(1.4)
