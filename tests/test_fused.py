"""Fused (persistent-slot) pipeline: pack round-trip + dense equivalence.

The fused path must reproduce the dense reference pipeline's trajectories —
the same bar test_sparse.py holds the block-sparse path to. Kernels run in
interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sparkl_tpu as sk
from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.models import registry
from sparkl_tpu.fused import layout as L
from sparkl_tpu.fused import structure as FS
from sparkl_tpu.fused.pipeline import FusedMpmPipeline
from sparkl_tpu.solver import dense
from sparkl_tpu.solver.pipeline import MpmPipeline
from sparkl_tpu.sparse.blocks import BlockConfig

E, NU = 2.0e4, 0.35


def _scene2d(n=12, with_velocity=True):
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.05, res=(64, 64))
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(E, NU))]
    )
    p = sk.cube_particles(
        origin=(0.8, 1.2), counts=(n, n), model_id=0,
        particle_radius=0.05 / 4, density0=1000.0,
    )
    if with_velocity:
        rng = np.random.default_rng(0)
        vel = rng.normal(scale=0.5, size=(p.capacity, 2)).astype(np.float32)
        p = p.replace(velocity=jnp.asarray(vel))
    return grid, models, p


def _scene3d(n=8):
    grid = GridParams(origin=(0.0, 0.0, 0.0), cell_width=0.1, res=(40, 40, 40))
    models = registry.ModelSet.pack(
        [
            registry.ParticleModel(
                registry.corotated_linear_elasticity(1.0e5, 0.2),
                registry.drucker_prager_plasticity(1.0e5, 0.2),
            )
        ]
    )
    p = sk.cube_particles(
        origin=(1.2, 2.0, 1.2), counts=(n, n, n), model_id=0,
        particle_radius=0.025, density0=2700.0,
    )
    return grid, models, p


def _compare(pd, pf, atol_pos=5e-5, atol_vel=5e-4, atol_f=5e-4):
    """Fused output is in original particle order — compare directly."""
    act_d = np.asarray(pd.active)
    act_f = np.asarray(pf.active)
    np.testing.assert_array_equal(act_d, act_f)
    sel = act_d
    np.testing.assert_allclose(
        np.asarray(pd.position)[sel], np.asarray(pf.position)[sel], atol=atol_pos
    )
    np.testing.assert_allclose(
        np.asarray(pd.velocity)[sel], np.asarray(pf.velocity)[sel], atol=atol_vel
    )
    np.testing.assert_allclose(
        np.asarray(pd.deformation_gradient)[sel],
        np.asarray(pf.deformation_gradient)[sel],
        atol=atol_f,
    )
    np.testing.assert_array_equal(
        np.asarray(pd.failed)[sel], np.asarray(pf.failed)[sel]
    )


def test_pack_unpack_roundtrip():
    grid, models, p = _scene2d(10)
    # A few inactive padding rows + one failed particle.
    p = sk.cube_particles(
        origin=(0.8, 1.2), counts=(10, 10), model_id=0,
        particle_radius=0.05 / 4, density0=1000.0, capacity=120,
    )
    p = p.replace(failed=p.failed.at[7].set(True))
    cfg = FS.calibrate_ob2(grid, p.position, p.active)
    dtb = dense.particle_dt_bounds(grid, p, models)
    state = L.pack(grid, cfg, p, dtb)
    q = L.unpack(grid, cfg, state, p.capacity, p.dim)

    for name in [
        "position", "velocity", "velocity_gradient", "deformation_gradient",
        "plastic_def_det", "mass", "volume0", "radius0", "phase", "psi_pos",
        "crack_propagation_factor", "crack_threshold", "nacc_alpha",
        "plastic_hardening", "elastic_hardening", "log_vol_gain",
        "kinematic_vel", "parameter1", "parameter2", "m_c", "g", "debug_val",
    ]:
        np.testing.assert_allclose(
            np.asarray(getattr(p, name)), np.asarray(getattr(q, name)),
            err_msg=name,
        )
    for name in ["active", "failed", "is_static", "kinematic_enabled",
                 "model_id", "user_data"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(p, name)), np.asarray(getattr(q, name)),
            err_msg=name,
        )


@pytest.mark.parametrize("dim", [2, 3])
def test_fused_matches_dense_one_frame(dim):
    if dim == 2:
        grid, models, p = _scene2d(14)
        colliders = [sk.cuboid((100.0, 0.5), translation=(0.0, 0.25), friction=0.3)]
        gravity = [0.0, -9.81]
    else:
        grid, models, p = _scene3d(8)
        colliders = [
            sk.cuboid((100.0, 0.5, 100.0), translation=(0.0, 0.25, 0.0), friction=0.3)
        ]
        gravity = [0.0, -9.81, 0.0]

    params = sk.SolverParameters(dt=1.0 / 60.0)
    dpipe = MpmPipeline(grid, models, colliders, params, gravity)
    fpipe = FusedMpmPipeline(
        grid, models, colliders, params, gravity, use_pallas="interpret"
    )
    pd = dpipe.step(jax.tree_util.tree_map(jnp.array, p))
    pf = fpipe.step(p)
    _compare(pd, pf)


def test_fused_matches_dense_multi_frame_with_resort():
    """Several frames of a falling block: accumulated drift crosses cells so
    the lazy resort path is exercised."""
    grid, models, p = _scene2d(12)
    colliders = [sk.cuboid((100.0, 0.5), translation=(0.0, 0.25), friction=0.3)]
    gravity = [0.0, -9.81]
    params = sk.SolverParameters(dt=1.0 / 60.0)

    dpipe = MpmPipeline(grid, models, colliders, params, gravity)
    fpipe = FusedMpmPipeline(
        grid, models, colliders, params, gravity, use_pallas="interpret"
    )
    pd = jax.tree_util.tree_map(jnp.array, p)
    for _ in range(5):
        pd = dpipe.step(pd)
    pf, _total = fpipe.run_frames(p, 5)
    _compare(pd, pf, atol_pos=2e-4, atol_vel=2e-3, atol_f=2e-3)


def test_fused_fluids_volume_matches_dense():
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.1, res=(64, 64))
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.monaghan_sph_eos(1.0e4, 7, 1.01e-3))]
    )
    p = sk.cube_particles(
        origin=(1.5, 1.5), counts=(20, 20), model_id=0,
        particle_radius=0.025, density0=1000.0,
    )
    colliders = [sk.cuboid((100.0, 0.5), translation=(0.0, 0.25), friction=0.0)]
    params = sk.SolverParameters(dt=1.0 / 60.0, force_fluids_volume_recomputation=True)
    gravity = [0.0, -9.81]

    dpipe = MpmPipeline(grid, models, colliders, params, gravity)
    fpipe = FusedMpmPipeline(
        grid, models, colliders, params, gravity, use_pallas="interpret"
    )
    pd = dpipe.step(jax.tree_util.tree_map(jnp.array, p))
    pf = fpipe.step(p)
    sel = np.asarray(pd.active)
    np.testing.assert_allclose(
        np.asarray(pd.position)[sel], np.asarray(pf.position)[sel], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pd.deformation_gradient)[sel][:, 0, 0],
        np.asarray(pf.deformation_gradient)[sel][:, 0, 0],
        atol=1e-4,
    )


def test_fused_modified_eigenerosion_matches_dense():
    grid, models, _ = _scene2d(10)
    models = registry.ModelSet.pack(
        [
            registry.ParticleModel(
                registry.corotated_linear_elasticity(E, NU),
                failure=registry.maximum_stress_failure(1.0e5, 1.0e5),
            )
        ]
    )
    p = sk.cube_particles(
        origin=(0.8, 1.2), counts=(10, 10), model_id=0,
        particle_radius=0.05 / 4, density0=1000.0,
        crack_propagation_factor=0.1, crack_threshold=50.0,
    )
    params = sk.SolverParameters(
        dt=1.0 / 60.0, damage_model=sk.DamageModel.MODIFIED_EIGENEROSION
    )
    gravity = [0.0, -9.81]
    colliders = [sk.cuboid((100.0, 0.5), translation=(0.0, 0.25), friction=0.3)]
    dpipe = MpmPipeline(grid, models, colliders, params, gravity)
    fpipe = FusedMpmPipeline(
        grid, models, colliders, params, gravity, use_pallas="interpret"
    )
    pd = dpipe.step(jax.tree_util.tree_map(jnp.array, p))
    pf = fpipe.step(p)
    _compare(pd, pf)
    np.testing.assert_allclose(
        np.asarray(pd.phase), np.asarray(pf.phase), atol=1e-6
    )


def test_fused_eigenerosion_matches_dense():
    grid, _, _ = _scene2d(10)
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(E, NU))]
    )
    p = sk.cube_particles(
        origin=(0.8, 1.2), counts=(10, 10), model_id=0,
        particle_radius=0.05 / 4, density0=1000.0,
        crack_propagation_factor=0.5, crack_threshold=1.0e-4,
    )
    rng = np.random.default_rng(1)
    vel = rng.normal(scale=1.0, size=(p.capacity, 2)).astype(np.float32)
    p = p.replace(velocity=jnp.asarray(vel))
    params = sk.SolverParameters(
        dt=1.0 / 120.0, damage_model=sk.DamageModel.EIGENEROSION
    )
    gravity = [0.0, -9.81]
    dpipe = MpmPipeline(grid, models, [], params, gravity)
    fpipe = FusedMpmPipeline(
        grid, models, [], params, gravity, use_pallas="interpret"
    )
    pd = dpipe.step(jax.tree_util.tree_map(jnp.array, p))
    pf = fpipe.step(p)
    _compare(pd, pf)
    np.testing.assert_allclose(
        np.asarray(pd.phase), np.asarray(pf.phase), atol=1e-6
    )


def test_fused_capacity_regrow():
    grid, models, p = _scene2d(16)
    cfg = BlockConfig(max_blocks=4, max_chunks=8, chunk_size=16)
    fpipe = FusedMpmPipeline(
        grid, models, [],
        sk.SolverParameters(dt=1.0 / 240.0, max_num_substeps=4),
        [0.0, -9.81], config=cfg, use_pallas="interpret",
    )
    pf = fpipe.step(p)
    assert np.isfinite(np.asarray(pf.position)[np.asarray(pf.active)]).all()
    assert fpipe._cfg.max_blocks > 4


def test_fused_rejects_unsupported():
    # CD-MPM and boundary particle projection became supported in round 3;
    # custom Python models remain the sparse-pipeline fallback (kernels
    # cannot trace user callables).
    from sparkl_tpu.models import registry as reg

    grid, models, p = _scene2d(8)
    spec = reg.register_custom_constitutive(
        7, lambda params, ctx: jnp.zeros_like(ctx["deformation_gradient"])
    )
    custom = reg.ModelSet.pack([reg.ParticleModel(spec(1.0))])
    with pytest.raises(ValueError):
        FusedMpmPipeline(grid, custom, [], sk.SolverParameters(),
                         use_pallas="interpret")
    for params in (
        sk.SolverParameters(damage_model=sk.DamageModel.CD_MPM),
        sk.SolverParameters(enable_boundary_particle_projection=True),
    ):
        ok, why = FusedMpmPipeline.supports(models, params)
        assert ok, why


def test_resort_fallback_matches_fast_path(monkeypatch):
    """Force the >K-source-chunks fallback (generic row gather) and check it
    produces the same slot state as the fast selection-matmul permute."""
    grid, models, p = _scene2d(12)
    cfg = FS.calibrate_ob2(grid, p.position, p.active)
    dtb = dense.particle_dt_bounds(grid, p, models)
    state = L.pack(grid, cfg, p, dtb)
    # Scramble positions slightly so the resort actually permutes.
    r = L.Rows(2)
    slots = state.slots.at[:, r.pos, :].add(0.013)
    state = state.replace(slots=slots)

    fast, ov_fast = jax.jit(lambda s: L.resort(grid, cfg, s, 2, interpret=True))(state)

    monkeypatch.setattr(L, "PERMUTE_SRC_CHUNKS", 1)  # force k-overflow path
    slow, ov_slow = jax.jit(lambda s: L.resort(grid, cfg, s, 2, interpret=True))(state)

    np.testing.assert_allclose(
        np.asarray(fast.slots), np.asarray(slow.slots), atol=0.0
    )
    np.testing.assert_array_equal(np.asarray(fast.ints), np.asarray(slow.ints))
    assert bool(ov_fast) == bool(ov_slow) == False


def test_resort_pure_relabel_shortcut():
    """A uniform whole-block translation leaves the stable sort order intact,
    so the resort collapses to the pure chunk-relabel branch (one row gather,
    no permute kernel). Every particle field must survive bit-exactly and the
    window origins must track the shifted blocks."""
    grid, models, p = _scene2d(12)
    cfg = FS.calibrate_ob2(grid, p.position, p.active)
    dtb = dense.particle_dt_bounds(grid, p, models)
    state = L.pack(grid, cfg, p, dtb)
    # Shift every particle by exactly one block (4 cells) downward: block
    # labels move, relative order doesn't.
    r = L.Rows(2)
    slots = state.slots.at[:, r.pos + 1, :].add(-4.0 * grid.cell_width)
    state = state.replace(slots=slots)

    out, ov = jax.jit(lambda s: L.resort(grid, cfg, s, 2, interpret=True))(state)
    assert not bool(ov)

    q0 = L.unpack(grid, cfg, state, p.capacity, 2)
    q1 = L.unpack(grid, cfg, out, p.capacity, 2)
    for name in ["position", "velocity", "deformation_gradient", "mass",
                 "phase", "plastic_hardening", "log_vol_gain", "debug_val"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(q0, name)), np.asarray(getattr(q1, name)),
            err_msg=name,
        )
    for name in ["active", "failed", "model_id", "user_data"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(q0, name)), np.asarray(getattr(q1, name)),
            err_msg=name,
        )
    # The structure moved with the particles: per-slot window origins must
    # place every particle's stencil inside its 8^d window again.
    act = np.asarray(out.ints[:, L.I_FLAGS, :]) & L.ACTIVE
    pos_y = np.asarray(out.slots[:, r.pos + 1, :])
    base = np.round((pos_y - grid.origin[1]) / grid.cell_width).astype(int) - 1
    rel = base - np.asarray(out.ints[:, L.I_ORIGIN + 1, :])
    ok = (rel >= 1) & (rel <= 4)
    assert np.all(ok[act != 0])


def test_fused_boundary_particle_projection_matches_dense():
    """Boundary particle projection on slot rows (post-advection snap +
    velocity correction, ref grid_to_particle.rs:151-166) matches the dense
    pipeline, and no particle ends up inside the collider."""
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.05, res=(64, 64))
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(1.0e4, 0.3))]
    )

    def make_p():
        p = sk.cube_particles(
            origin=(1.0, 0.62), counts=(10, 10), model_id=0,
            particle_radius=0.0125, density0=1000.0,
        )
        return p.replace(velocity=jnp.broadcast_to(
            jnp.asarray([0.0, -2.0], jnp.float32), (p.capacity, 2)))

    colliders = [sk.cuboid((100.0, 0.5), translation=(0.0, 0.25), friction=0.0)]
    params = sk.SolverParameters(
        dt=1.0 / 60.0, enable_boundary_particle_projection=True,
    )
    ok, why = FusedMpmPipeline.supports(models, params)
    assert ok, why
    dense_pipe = sk.MpmPipeline(grid, models, colliders, params, [0.0, -9.81])
    fused_pipe = FusedMpmPipeline(
        grid, models, colliders, params, [0.0, -9.81], use_pallas="interpret"
    )
    pd = make_p()
    pf = make_p()
    for _ in range(4):
        pd, _ = dense_pipe.step_with_stats(pd)
        pf, _ = fused_pipe.step_with_stats(pf)
    act_d = np.asarray(pd.active)
    act_f = np.asarray(pf.active)
    pos_d = np.asarray(pd.position)[act_d]
    pos_f = np.asarray(pf.position)[act_f]
    assert pos_f[:, 1].min() > 0.5 - 1e-4  # nothing inside the floor
    od, of = np.lexsort(pos_d.T), np.lexsort(pos_f.T)
    np.testing.assert_allclose(pos_d[od], pos_f[of], atol=1e-5)
    vd = np.asarray(pd.velocity)[act_d][od]
    vf = np.asarray(pf.velocity)[act_f][of]
    np.testing.assert_allclose(vd, vf, atol=1e-4)


def _slot_keys_occ(grid, cfg, state):
    r = L.Rows(grid.dim)
    pos = jnp.stack(
        [state.slots[:, r.pos + ax, :].reshape(-1) for ax in range(grid.dim)],
        axis=-1,
    )
    flags = state.ints[:, L.I_FLAGS, :].reshape(-1)
    occupied = (flags & L.OCCUPIED) != 0
    active = occupied & ((flags & L.ACTIVE) != 0)
    key_eff = FS.slot_key_rows(grid, cfg, pos, active, occupied)
    occ2 = occupied.reshape(cfg.max_chunks, cfg.chunk_size)
    return pos, active, occupied, key_eff, occ2


def _scene2d_exact(n=12):
    """Binary-exact geometry (power-of-two cell width, lattice positions):
    a shift by a whole number of cells moves every key uniformly — no
    rounding flips at cell boundaries (0.05-width grids split chunks under
    f32 shift arithmetic, which correctly rejects the relabel path)."""
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.0625, res=(64, 64))
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(E, NU))]
    )
    p = sk.cube_particles(
        origin=(0.8125, 1.25), counts=(n, n), model_id=0,
        particle_radius=0.0625 / 4, density0=1000.0,
    )
    return grid, models, p


def test_resort_relabel_structure_matches_rebuild():
    """Under a uniform one-block shift the sort-free chunk-relabel path must
    (a) detect, and (b) produce a structure FIELD-FOR-FIELD identical to the
    full sorted rebuild of the same population."""
    grid, models, p = _scene2d_exact(12)
    cfg = FS.calibrate_ob2(grid, p.position, p.active)
    dtb = dense.particle_dt_bounds(grid, p, models)
    state = L.pack(grid, cfg, p, dtb)
    r = L.Rows(2)
    slots = state.slots.at[:, r.pos + 1, :].add(-4.0 * grid.cell_width)
    state = state.replace(slots=slots)

    pos, active, occupied, key_eff, occ2 = _slot_keys_occ(grid, cfg, state)
    ok, ckey, occ_count = jax.jit(
        lambda k, o: FS.detect_chunk_relabel(grid, cfg, k, o)
    )(key_eff, occ2)
    assert bool(ok)

    fast = jax.jit(
        lambda k, o: FS.structure_from_chunk_keys(grid, cfg, k, o)
    )(ckey, occ_count)
    full, _, _ = jax.jit(
        lambda q, a, o: FS.build_slot_structure(grid, cfg, q, a, o)
    )(pos, active, occupied)

    for f in (
        "block_keys", "grid_keys", "nbr_index", "chunk_block", "chunk_count",
        "chunk_origin", "block_first_chunk", "block_num_chunks",
        "num_blocks", "num_grid_blocks", "num_chunks",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(fast, f)), np.asarray(getattr(full, f)),
            err_msg=f,
        )


def test_resort_relabel_detection_rejects_mixing():
    """Scrambled positions (chunks split across blocks) must fall back to
    the sorted rebuild."""
    grid, models, p = _scene2d(12)
    cfg = FS.calibrate_ob2(grid, p.position, p.active)
    dtb = dense.particle_dt_bounds(grid, p, models)
    state = L.pack(grid, cfg, p, dtb)
    r = L.Rows(2)
    # Per-lane alternating +-1-cell jitter splits every chunk's key set.
    c = cfg.chunk_size
    jit_y = (jnp.arange(c) % 2).astype(jnp.float32) * 2.0 - 1.0
    slots = state.slots.at[:, r.pos + 1, :].add(
        jit_y[None, :] * grid.cell_width * 4.0
    )
    state = state.replace(slots=slots)
    _, _, _, key_eff, occ2 = _slot_keys_occ(grid, cfg, state)
    ok, _, _ = jax.jit(
        lambda k, o: FS.detect_chunk_relabel(grid, cfg, k, o)
    )(key_eff, occ2)
    assert not bool(ok)


def test_resort_relabel_end_to_end_matches_rebuild(monkeypatch):
    """L.resort through the sort-free path must equal the full rebuild path
    bit-for-bit (slots, ints, and every structure field)."""
    grid, models, p = _scene2d_exact(12)
    cfg = FS.calibrate_ob2(grid, p.position, p.active)
    dtb = dense.particle_dt_bounds(grid, p, models)
    state = L.pack(grid, cfg, p, dtb)
    r = L.Rows(2)
    slots = state.slots.at[:, r.pos + 1, :].add(-4.0 * grid.cell_width)
    state = state.replace(slots=slots)

    out_fast, ov_fast = jax.jit(
        lambda s: L.resort(grid, cfg, s, 2, interpret=True)
    )(state)

    orig = FS.detect_chunk_relabel

    def never(*a, **kw):
        ok, ckey, occ = orig(*a, **kw)
        return jnp.asarray(False), ckey, occ

    monkeypatch.setattr(FS, "detect_chunk_relabel", never)
    out_full, ov_full = jax.jit(
        lambda s: L.resort(grid, cfg, s, 2, interpret=True)
    )(state)

    np.testing.assert_array_equal(
        np.asarray(out_fast.slots), np.asarray(out_full.slots)
    )
    np.testing.assert_array_equal(
        np.asarray(out_fast.ints), np.asarray(out_full.ints)
    )
    for f in (
        "block_keys", "grid_keys", "nbr_index", "chunk_block", "chunk_count",
        "chunk_origin", "block_first_chunk", "block_num_chunks",
        "num_blocks", "num_grid_blocks", "num_chunks",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(out_fast.structure, f)),
            np.asarray(getattr(out_full.structure, f)),
            err_msg=f,
        )
    assert bool(ov_fast) == bool(ov_full) == False


def test_fused_cardano_matches_dense_jacobi():
    """Physics bar for flipping the in-kernel eigensolver default: one 3D
    frame of the corotated+Drucker-Prager sand scene traced with the Cardano
    backend (fused side only) must stay within slightly loosened tolerances
    of the dense reference running the Jacobi default. Near-identity F is
    the clustered-eigenvalue worst case for closed-form eigenvectors."""
    import importlib

    svd_mod = importlib.import_module("sparkl_tpu.math.svd")

    grid, models, p = _scene3d(8)
    colliders = [
        sk.cuboid((100.0, 0.5, 100.0), translation=(0.0, 0.25, 0.0), friction=0.3)
    ]
    gravity = [0.0, -9.81, 0.0]
    params = sk.SolverParameters(dt=1.0 / 60.0)

    dpipe = MpmPipeline(grid, models, colliders, params, gravity)
    pd = dpipe.step(jax.tree_util.tree_map(jnp.array, p))

    prev = svd_mod.set_eig3_method("cardano")
    try:
        fpipe = FusedMpmPipeline(
            grid, models, colliders, params, gravity, use_pallas="interpret"
        )
        pf = fpipe.step(p)
    finally:
        svd_mod.set_eig3_method(prev)
    _compare(pd, pf, atol_pos=5e-5, atol_vel=1e-3, atol_f=1e-3)


@pytest.mark.parametrize("dim", [2, 3])
def test_merge_dma_matches_gather(dim):
    """The in-kernel-DMA merge (fused path) must reproduce the XLA
    KMAX-gather merge exactly: identical summation order, only the fetch
    mechanism differs."""
    from sparkl_tpu.fused import structure as S
    from sparkl_tpu.sparse import transfer as T
    from sparkl_tpu.solver import dense as D

    if dim == 2:
        grid, models, p = _scene2d(n=14)
    else:
        grid, models, p = _scene3d(n=9)
    cfg = S.calibrate_ob2(grid, p.position, p.active)
    dtb = D.particle_dt_bounds(grid, p, models)
    state = L.pack(grid, cfg, p, dtb)
    rng = np.random.default_rng(3)
    nf = 1 + dim
    images = jnp.asarray(
        rng.normal(size=(cfg.max_chunks, nf, 8**dim)).astype(np.float32)
    )
    ref = T.merge_images_to_grid(
        grid, cfg, state.structure, images, gather=True
    )
    out = T.merge_images_to_grid(
        grid, cfg, state.structure, images, gather=True, dma=True,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=0)


@pytest.mark.parametrize("dim,nr", [(2, 8), (2, 16), (2, 32), (2, 64), (3, 8)])
def test_fused_matches_dense_batched_programs(dim, nr, monkeypatch):
    """Numerical equivalence with chunk batching ACTIVE (nr chunks per Pallas
    program). Interpret mode normally forces nr=1, so the per-program batch
    logic — sublane-stacked [nr, C] physics tiles, the per-chunk window-dot
    loops, per-chunk SMEM scalar indexing — is otherwise only ever *lowered*
    in CI (test_lowering), never executed. This pins the TPU default (nr=8)
    and the latency-hiding candidate (nr=32) to the dense reference."""
    from sparkl_tpu.fused import kernels as K

    def _r_batched(cfg, interpret=False, cap=None):
        r = nr if cap is None else min(nr, cap)
        while r > 1 and cfg.max_chunks % r != 0:
            r //= 2
        return r

    monkeypatch.setattr(K, "_r_of", _r_batched)

    if dim == 2:
        grid, models, p = _scene2d(14)
        colliders = [sk.cuboid((100.0, 0.5), translation=(0.0, 0.25), friction=0.3)]
        gravity = [0.0, -9.81]
    else:
        grid, models, p = _scene3d(8)
        colliders = [
            sk.cuboid((100.0, 0.5, 100.0), translation=(0.0, 0.25, 0.0), friction=0.3)
        ]
        gravity = [0.0, -9.81, 0.0]

    params = sk.SolverParameters(dt=1.0 / 60.0)
    dpipe = MpmPipeline(grid, models, colliders, params, gravity)
    fpipe = FusedMpmPipeline(
        grid, models, colliders, params, gravity, use_pallas="interpret"
    )
    pd = dpipe.step(jax.tree_util.tree_map(jnp.array, p))
    pf = fpipe.step(p)
    _compare(pd, pf)
