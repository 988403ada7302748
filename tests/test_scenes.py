"""One-substep smoke tests for every reference scene (the reference's
de-facto integration suite is its 8 example scenes — SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

import sparkl_tpu as sk
import sparkl_tpu.scenes as scenes
from sparkl_tpu.sparse.pipeline import SparseMpmPipeline

CASES = [
    ("elasticity2", {}),
    ("fluids2", {"n": 100}),
    ("basic2", {}),
    ("l_panel2", {}),
    ("sand3", {"nx": 16, "ny": 8, "nz": 8}),
    ("cube_through_sand3", {"nx": 16, "ny": 8, "nz": 8}),
    ("fluids3", {}),
    ("sand_penetration3", {"nx": 16, "ny": 8, "nz": 8}),
]


@pytest.mark.parametrize("name,kw", CASES, ids=[c[0] for c in CASES])
def test_scene_one_substep(name, kw):
    b = scenes.build(name, **kw)
    n = int(np.asarray(b.particles.num_active))
    assert n > 100

    params = sk.SolverParameters(
        dt=b.params.dt,
        boundary_handling=b.params.boundary_handling,
        damage_model=b.params.damage_model,
        force_fluids_volume_recomputation=b.params.force_fluids_volume_recomputation,
        simulation_dofs=b.params.simulation_dofs,
        stop_after_one_substep=True,
    )
    pipe = SparseMpmPipeline(
        b.grid, b.models, b.colliders, params, b.gravity, b.hooks
    )
    p, niter = pipe.step_with_stats(b.particles)
    assert int(niter) == 1
    act = np.asarray(p.active)
    pos = np.asarray(p.position)[act]
    assert np.isfinite(pos).all()
    assert not np.asarray(p.failed)[act].any()
    # Everything inside the scene grid.
    lo = np.asarray(b.grid.origin)
    hi = lo + (np.asarray(b.grid.res) - 1) * b.grid.cell_width
    assert (pos >= lo - 1e-3).all() and (pos <= hi + 1e-3).all()
