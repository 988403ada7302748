"""Block-sparse structure invariants + dense<->sparse pipeline equivalence.

The structure checks replicate the reference's `check_active_blocks`
debug validator (sparkl src/cuda/cuda_sparse_grid.rs:491-652): unique sorted
ids, block<->particle range consistency, neighbor resolution, dispatch-chunk
coverage/multiplicity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sparkl_tpu as sk
from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.models import registry
from sparkl_tpu.sparse import blocks as B
from sparkl_tpu.sparse.pipeline import SparseMpmPipeline
from sparkl_tpu.solver.pipeline import MpmPipeline

E, NU = 2.0e4, 0.35


def _scene2d(n=12, with_velocity=True):
    grid = GridParams(origin=(0.0, 0.0), cell_width=0.05, res=(64, 64))
    models = registry.ModelSet.pack(
        [registry.ParticleModel(registry.corotated_linear_elasticity(E, NU))]
    )
    p = sk.cube_particles(
        origin=(0.8, 1.2),
        counts=(n, n),
        model_id=0,
        particle_radius=0.05 / 4,
        density0=1000.0,
    )
    if with_velocity:
        rng = np.random.default_rng(0)
        vel = rng.normal(scale=0.5, size=(p.capacity, 2)).astype(np.float32)
        p = p.replace(velocity=jnp.asarray(vel))
    return grid, models, p


def test_structure_invariants_2d():
    grid, _, p = _scene2d(16)
    cfg = B.BlockConfig(max_blocks=128, max_chunks=256, chunk_size=16)
    s = jax.jit(lambda pos, act: B.build_structure(grid, cfg, pos, act))(
        p.position, p.active
    )
    n = p.capacity
    nb = int(s.num_blocks)
    assert 0 < nb <= cfg.max_blocks

    sorted_ids = np.asarray(s.sorted_ids)
    assert sorted(sorted_ids.tolist()) == list(range(n))  # a permutation

    key, ok = B.particle_block_key(grid, p.position, p.active)
    key = np.asarray(key)
    block_keys = np.asarray(s.block_keys)
    sorted_block = np.asarray(s.sorted_block)
    start = np.asarray(s.block_start)
    count = np.asarray(s.block_count)

    # Every valid particle's key appears; range membership is exact.
    for b in range(nb):
        seg = sorted_ids[start[b] : start[b] + count[b]]
        assert len(seg) > 0
        assert np.all(key[seg] == block_keys[b])
        assert np.all(sorted_block[start[b] : start[b] + count[b]] == b)
    assert count[:nb].sum() == int(np.asarray(ok).sum())
    # Padding blocks empty.
    assert np.all(count[nb:] == 0)
    # Keys strictly increasing (sorted unique).
    assert np.all(np.diff(block_keys[:nb]) > 0)

    # Grid table: owner keys plus their in-space corner neighbors, sorted.
    bspace = tuple(-(-r // B.BLOCK_SIDE) for r in grid.res)
    ngb = int(s.num_grid_blocks)
    grid_keys = np.asarray(s.grid_keys)
    want_grid = set()
    for b in range(nb):
        bx, by = divmod(int(block_keys[b]), bspace[1])
        for ox, oy in [(0, 0), (0, 1), (1, 0), (1, 1)]:
            if bx + ox < bspace[0] and by + oy < bspace[1]:
                want_grid.add((bx + ox) * bspace[1] + by + oy)
    assert set(grid_keys[:ngb].tolist()) == want_grid
    assert np.all(np.diff(grid_keys[:ngb]) > 0)

    # Neighbor table resolves into the grid table (or trash = MAX_GRID_BLOCKS).
    nbr = np.asarray(s.nbr_index)
    for b in range(nb):
        bx, by = divmod(int(block_keys[b]), bspace[1])
        for ci, (ox, oy) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            nx_, ny_ = bx + ox, by + oy
            if nx_ >= bspace[0] or ny_ >= bspace[1]:
                assert nbr[b, ci] == cfg.max_grid_blocks
                continue
            k = nx_ * bspace[1] + ny_
            assert grid_keys[nbr[b, ci]] == k

    # Chunk coverage: every valid particle in exactly one chunk slot.
    nchunks = int(s.num_chunks)
    cb = np.asarray(s.chunk_block)
    cs = np.asarray(s.chunk_start)
    cc = np.asarray(s.chunk_count)
    covered = np.zeros(n, bool)
    for j in range(nchunks):
        assert cb[j] < cfg.max_blocks
        seg = np.arange(cs[j], cs[j] + cc[j])
        assert not covered[seg].any()
        covered[seg] = True
        assert np.all(sorted_block[seg] == cb[j])
    assert covered.sum() == int(np.asarray(ok).sum())
    # Multiplicity: ceil(count/C) per block.
    for b in range(nb):
        assert (cb[:nchunks] == b).sum() == -(-count[b] // cfg.chunk_size)
    # first chunk table consistent.
    fc = np.asarray(s.block_first_chunk)
    for b in range(nb):
        if count[b]:
            assert cb[fc[b]] == b


@pytest.mark.parametrize("dim", [2, 3])
def test_sparse_matches_dense_one_frame(dim):
    if dim == 2:
        grid, models, p = _scene2d(14)
        colliders = [sk.cuboid((100.0, 0.5), translation=(0.0, 0.25), friction=0.3)]
        gravity = [0.0, -9.81]
    else:
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
            origin=(1.2, 2.0, 1.2),
            counts=(8, 8, 8),
            model_id=0,
            particle_radius=0.025,
            density0=2700.0,
        )
        colliders = [sk.cuboid((100.0, 0.5, 100.0), translation=(0.0, 0.25, 0.0), friction=0.3)]
        gravity = [0.0, -9.81, 0.0]

    params = sk.SolverParameters(dt=1.0 / 60.0)
    dpipe = MpmPipeline(grid, models, colliders, params, gravity)
    spipe = SparseMpmPipeline(grid, models, colliders, params, gravity)

    # Dense pipeline donates its input; give it a copy.
    pd = dpipe.step(jax.tree_util.tree_map(jnp.array, p))
    ps = spipe.step(p)

    act = np.asarray(p.active)
    # Match particles via user_data? Order differs (sparse sorts). Use
    # lexicographic sort of positions on both sides.
    pos_d = np.asarray(pd.position)[np.asarray(pd.active)]
    pos_s = np.asarray(ps.position)[np.asarray(ps.active)]
    assert pos_d.shape == pos_s.shape
    od = np.lexsort(pos_d.T)
    os_ = np.lexsort(pos_s.T)
    np.testing.assert_allclose(pos_d[od], pos_s[os_], atol=5e-5)

    vd = np.asarray(pd.velocity)[np.asarray(pd.active)][od]
    vs = np.asarray(ps.velocity)[np.asarray(ps.active)][os_]
    np.testing.assert_allclose(vd, vs, atol=5e-4)

    fd = np.asarray(pd.deformation_gradient)[np.asarray(pd.active)][od]
    fs = np.asarray(ps.deformation_gradient)[np.asarray(ps.active)][os_]
    np.testing.assert_allclose(fd, fs, atol=5e-4)


def test_sparse_capacity_regrow():
    grid, models, p = _scene2d(16)
    # Deliberately tiny capacity: must regrow and still produce a result.
    cfg = B.BlockConfig(max_blocks=4, max_chunks=8, chunk_size=16)
    spipe = SparseMpmPipeline(
        grid, models, [], sk.SolverParameters(dt=1.0 / 240.0, max_num_substeps=4), [0.0, -9.81],
        config=cfg,
    )
    ps = spipe.step(p)
    assert np.isfinite(np.asarray(ps.position)[np.asarray(ps.active)]).all()
    assert spipe._cfg.max_blocks > 4


@pytest.mark.parametrize("dim", [2, 3])
def test_pallas_kernels_match_xla_path(dim):
    """The fused Pallas window kernels (interpret mode on CPU) must agree
    with the XLA einsum path bit-for-bit (same dot shapes/order)."""
    if dim == 2:
        grid, models, p = _scene2d(10)
        colliders = [sk.cuboid((100.0, 0.5), translation=(0.0, 0.25), friction=0.3)]
        gravity = [0.0, -9.81]
    else:
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
            origin=(1.2, 2.0, 1.2), counts=(6, 6, 6), model_id=0,
            particle_radius=0.025, density0=2700.0,
        )
        colliders = [sk.cuboid((100.0, 0.5, 100.0), translation=(0.0, 0.25, 0.0), friction=0.3)]
        gravity = [0.0, -9.81, 0.0]

    params = sk.SolverParameters(dt=1.0 / 60.0)
    xla = SparseMpmPipeline(grid, models, colliders, params, gravity, use_pallas=False)
    pal = SparseMpmPipeline(grid, models, colliders, params, gravity, use_pallas="interpret")
    p_x = xla.step(jax.tree_util.tree_map(jnp.array, p))
    p_p = pal.step(p)

    px = np.asarray(p_x.position)[np.asarray(p_x.active)]
    pq = np.asarray(p_p.position)[np.asarray(p_p.active)]
    ox, oq = np.lexsort(px.T), np.lexsort(pq.T)
    np.testing.assert_allclose(px[ox], pq[oq], atol=1e-6)
    vx = np.asarray(p_x.velocity)[np.asarray(p_x.active)][ox]
    vq = np.asarray(p_p.velocity)[np.asarray(p_p.active)][oq]
    np.testing.assert_allclose(vx, vq, atol=1e-5)


def test_sparse_fluids_volume_matches_dense():
    """Fluids with force_fluids_volume_recomputation: sparse mass-gather
    path must reproduce the dense scatter/gather (fluids_volume.rs)."""
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
    spipe = SparseMpmPipeline(grid, models, colliders, params, gravity)
    pd = dpipe.step(jax.tree_util.tree_map(jnp.array, p))
    ps = spipe.step(p)

    pos_d = np.asarray(pd.position)[np.asarray(pd.active)]
    pos_s = np.asarray(ps.position)[np.asarray(ps.active)]
    od, os_ = np.lexsort(pos_d.T), np.lexsort(pos_s.T)
    np.testing.assert_allclose(pos_d[od], pos_s[os_], atol=1e-5)
    fd = np.asarray(pd.deformation_gradient)[np.asarray(pd.active)][od]
    fs = np.asarray(ps.deformation_gradient)[np.asarray(ps.active)][os_]
    np.testing.assert_allclose(fd[:, 0, 0], fs[:, 0, 0], atol=1e-4)
