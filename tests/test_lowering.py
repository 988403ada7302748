"""Mosaic (TPU) lowering checks for every fused Pallas kernel, run on CPU.

Interpret mode validates semantics but not Mosaic lowering (unsupported ops
like mixed slice+newaxis indexing or 0-size vector slices only fail on the
real lowering path). `jax.jit(...).trace(...).lower(lowering_platforms=
('tpu',))` exercises the Mosaic pipeline without TPU hardware, so CI catches
kernel-lowering regressions that CPU equivalence tests cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sparkl_tpu as sk
from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.models import registry
from sparkl_tpu.fused import kernels as K, layout as L, structure as S
from sparkl_tpu.sparse.blocks import region_cells
from sparkl_tpu.solver import dense


def _lower(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def _setup(dim, with_psi):
    if dim == 2:
        grid = GridParams(origin=(0.0, 0.0), cell_width=0.1, res=(32, 32))
        counts = (12, 12)
        origin = (1.0, 1.0)
    else:
        grid = GridParams(origin=(0.0, 0.0, 0.0), cell_width=0.1, res=(32, 32, 32))
        counts = (8, 8, 8)
        origin = (1.0, 1.0, 1.0)
    models = registry.ModelSet.pack(
        [
            registry.ParticleModel(
                registry.corotated_linear_elasticity(1e5, 0.2),
                registry.drucker_prager_plasticity(1e5, 0.2),
            )
        ]
    )
    p = sk.cube_particles(origin=origin, counts=counts, model_id=0,
                          particle_radius=0.025, density0=2700.0)
    cfg = S.calibrate_ob2(grid, p.position, p.active)
    dtb = dense.particle_dt_bounds(grid, p, models)
    state = L.pack(grid, cfg, p, dtb)
    tab_f, tab_i = K.pack_model_tables(models)
    meta = dict(
        with_psi=with_psi, m_count=1, present_c=models.present_c,
        present_p=models.present_p, present_f=models.present_f,
        damage_model=2 if with_psi else 0,
    )
    return grid, cfg, state, tab_f, tab_i, meta


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("with_psi", [False, True])
def test_transfer_kernels_lower_for_tpu(dim, with_psi):
    grid, cfg, state, tab_f, tab_i, meta = _setup(dim, with_psi)
    dt = jnp.asarray(1e-3)
    _lower(
        lambda s, i, d: K.p2g_fused(grid, cfg, meta, s, i, d, tab_f, tab_i),
        state.slots, state.ints, dt,
    )
    n_win = dim + (1 if with_psi else 0)
    win = jnp.zeros((cfg.max_chunks, n_win, region_cells(dim)), jnp.float32)
    params = dict(gpu_velocity_clamp=False)
    _lower(
        lambda s, i, w, d: K.g2p_fused(
            grid, cfg, meta, params, s, i, w, d, tab_f, tab_i
        ),
        state.slots, state.ints, win, dt,
    )


@pytest.mark.parametrize("dim", [2, 3])
def test_aux_kernels_lower_for_tpu(dim):
    grid, cfg, state, tab_f, tab_i, meta = _setup(dim, False)
    _lower(
        lambda s, i: K.mass_p2g_fused(grid, cfg, s, i),
        state.slots, state.ints,
    )
    win1 = jnp.zeros((cfg.max_chunks, 1, region_cells(dim)), jnp.float32)
    _lower(
        lambda s, i, w: K.mass_g2p_fused(grid, cfg, s, i, w),
        state.slots, state.ints, win1,
    )
    d_ = cfg.max_chunks
    c = cfg.chunk_size
    order2 = jnp.zeros((d_, 2, c), jnp.int32)
    shifts = jnp.zeros((d_,), jnp.int32)
    _lower(lambda o, s: K.src_rows_from_order(cfg, o, s), order2, shifts)
    k_src = L.PERMUTE_SRC_CHUNKS
    r = L.Rows(dim)
    g = jnp.zeros((d_, k_src, r.nf, c), jnp.float32)
    gi = jnp.zeros((d_, k_src, L.NI, c), jnp.int32)
    tgt = jnp.zeros((d_, c), jnp.int32)
    _lower(lambda a, b, t: K.permute_chunks(cfg, a, b, t), g, gi, tgt)
    uniq = jnp.full((d_, k_src), -1, jnp.int32).at[:, 0].set(0)
    org = jnp.zeros((d_, dim), jnp.int32)
    _lower(
        lambda s, ii, u, t, o: K.permute_chunks_dma(
            cfg, s, ii, u, t, o, r.cumd
        ),
        jnp.zeros((d_, r.nf, c), jnp.float32),
        jnp.zeros((d_, L.NI, c), jnp.int32),
        uniq, tgt, org,
    )
    kn = 3 ** dim * 2
    e = jnp.zeros((d_, K.EIG_ROWS, c), jnp.float32)
    gg = jnp.zeros((d_, kn, K.EIG_ROWS, c), jnp.float32)
    _lower(lambda a, b: K.eigen_pool_fused(grid, cfg, a, b), e, gg)
    from sparkl_tpu.sparse import transfer as T

    nc = 2 ** dim
    rows = jnp.zeros(
        (d_, nc, (1 + dim) * (4 ** dim)), jnp.float32
    )
    first = jnp.zeros((cfg.max_blocks,), jnp.int32)
    nch = jnp.ones((cfg.max_blocks,), jnp.int32)
    _lower(
        lambda r_, f_, n_: K.merge_blocks_dma(cfg, r_, f_, n_, T.MERGE_KMAX),
        rows, first, nch,
    )


def test_bf16_transfer_dtype_lowers_and_stays_close():
    """transfer_dtype='bfloat16': kernels lower for TPU and a short 2D run
    stays within loose tolerance of the f32 fused path (speed/accuracy knob;
    the default f32 path keeps exact reference parity)."""
    from sparkl_tpu.fused.pipeline import FusedMpmPipeline

    grid = GridParams(origin=(0.0, 0.0), cell_width=0.05, res=(64, 64))
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(2e4, 0.35))]
    )
    p = sk.cube_particles((0.8, 1.2), (12, 12), 0, 0.0125, 1000.0)
    colliders = [sk.cuboid((100.0, 0.5), translation=(0.0, 0.25), friction=0.3)]
    params = sk.SolverParameters(dt=1.0 / 60.0)
    f32 = FusedMpmPipeline(grid, models, colliders, params, [0.0, -9.81],
                           use_pallas="interpret")
    bf16 = FusedMpmPipeline(grid, models, colliders, params, [0.0, -9.81],
                            use_pallas="interpret", transfer_dtype="bfloat16")
    pa = f32.step(jax.tree_util.tree_map(jnp.array, p))
    pb = bf16.step(jax.tree_util.tree_map(jnp.array, p))
    act = np.asarray(pa.active)
    np.testing.assert_array_equal(act, np.asarray(pb.active))
    # bf16 weights carry ~3 decimal digits; one frame stays within ~1e-2.
    np.testing.assert_allclose(
        np.asarray(pa.position)[act], np.asarray(pb.position)[act], atol=1e-2
    )
    d = np.abs(np.asarray(pa.position)[act] - np.asarray(pb.position)[act])
    assert np.median(d) < 2e-3

    # And the bf16 variant must lower for TPU.
    grid3, cfg, state, tab_f, tab_i, meta = _setup(3, False)
    meta = dict(meta, tdtype=jnp.bfloat16)
    dt = jnp.asarray(1e-3)
    _lower(
        lambda s, i, d_: K.p2g_fused(grid3, cfg, meta, s, i, d_, tab_f, tab_i),
        state.slots, state.ints, dt,
    )
    win = jnp.zeros((cfg.max_chunks, 3, region_cells(3)), jnp.float32)
    _lower(
        lambda s, i, w, d_: K.g2p_fused(
            grid3, cfg, meta, dict(gpu_velocity_clamp=False), s, i, w, d_,
            tab_f, tab_i,
        ),
        state.slots, state.ints, win, dt,
    )


def test_g2p_cardano_svd_lowers_for_tpu():
    """Kernel B with the closed-form Cardano eigensolver must lower through
    Mosaic (it exists because acos/atan do NOT lower — the solver uses a
    polynomial-seeded Newton iterate instead, math/svd.py _cos_acos3)."""
    import importlib

    svd_mod = importlib.import_module("sparkl_tpu.math.svd")
    grid, cfg, state, tab_f, tab_i, meta = _setup(3, False)
    meta = dict(meta, stress_cache=True)
    dt = jnp.asarray(1e-3)
    win = jnp.zeros((cfg.max_chunks, 3, region_cells(3)), jnp.float32)
    params = dict(gpu_velocity_clamp=False)
    prev = svd_mod.set_eig3_method("cardano")
    try:
        _lower(
            lambda s, i, w, d: K.g2p_fused(
                grid, cfg, meta, params, s, i, w, d, tab_f, tab_i
            ),
            state.slots, state.ints, win, dt,
        )
    finally:
        svd_mod.set_eig3_method(prev)


import pytest


@pytest.mark.parametrize("nr", [16, 32, 64])
def test_sublane_stacked_kernels_lower_for_tpu(monkeypatch, nr):
    """Every sweep candidate for CHUNKS_PER_PROGRAM ([nr, C] per-particle
    tiles = nr/8 vregs/op for ILP inside the serial physics chain) must
    lower through Mosaic and fit VMEM-side checks — a lowering failure must
    surface here on CPU, not burn a tunnel-up slot in the TPU sweep."""
    monkeypatch.setattr(K, "CHUNKS_PER_PROGRAM", nr)
    grid, cfg, state, tab_f, tab_i, meta = _setup(3, False)
    assert K._r_of(cfg) == nr
    meta = dict(meta, stress_cache=True)
    dt = jnp.asarray(1e-3)
    _lower(
        lambda s, i, d: K.p2g_fused(grid, cfg, meta, s, i, d, tab_f, tab_i),
        state.slots, state.ints, dt,
    )
    win = jnp.zeros((cfg.max_chunks, 3, region_cells(3)), jnp.float32)
    _lower(
        lambda s, i, w, d: K.g2p_fused(
            grid, cfg, meta, dict(gpu_velocity_clamp=False), s, i, w, d,
            tab_f, tab_i,
        ),
        state.slots, state.ints, win, dt,
    )
