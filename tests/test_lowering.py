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
    kn = 3 ** dim * 2
    e = jnp.zeros((d_, K.EIG_ROWS, c), jnp.float32)
    gg = jnp.zeros((d_, kn, K.EIG_ROWS, c), jnp.float32)
    _lower(lambda a, b: K.eigen_pool_fused(grid, cfg, a, b), e, gg)
