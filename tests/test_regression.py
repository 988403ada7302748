"""Golden-trajectory regression: catches silent physics changes.

The fixture (tests/golden_elasticity2.json) records robust summary statistics
of the dense CPU pipeline on the elasticity2 baseline scene. Both pipelines
must keep reproducing it. Regenerate deliberately (see the script in the
git history / this file's docstring) when semantics intentionally change.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sparkl_tpu.scenes as scenes
from sparkl_tpu.solver.pipeline import MpmPipeline
from sparkl_tpu.sparse.pipeline import SparseMpmPipeline

GOLD = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden_elasticity2.json"))
)
GOLD_SAND3 = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden_sand3_small.json"))
)


def _stats(p):
    act = np.asarray(p.active)
    pos = np.asarray(p.position)[act]
    vel = np.asarray(p.velocity)[act]
    ke = float(0.5 * np.sum(np.asarray(p.mass)[act][:, None] * vel**2))
    return pos.mean(axis=0), pos.min(axis=0), pos.max(axis=0), ke


@pytest.mark.parametrize("pipeline", ["dense", "sparse"])
def test_elasticity2_golden_trajectory(pipeline):
    b = scenes.build("elasticity2")
    cls = MpmPipeline if pipeline == "dense" else SparseMpmPipeline
    pipe = cls(b.grid, b.models, b.colliders, b.params, b.gravity)
    p = b.particles
    for frame, gold in enumerate(GOLD):
        p, niter = pipe.step_with_stats(p)
        assert int(niter) == gold["substeps"], f"frame {frame} substep count"
        com, lo, hi, ke = _stats(p)
        np.testing.assert_allclose(com, gold["com"], atol=1e-3)
        np.testing.assert_allclose(lo, gold["pos_min"], atol=2e-3)
        np.testing.assert_allclose(hi, gold["pos_max"], atol=2e-3)
        np.testing.assert_allclose(ke, gold["ke"], rtol=2e-2)


@pytest.mark.parametrize("pipeline", ["dense", "sparse"])
def test_sand3_small_golden_trajectory(pipeline):
    b = scenes.build("sand3", nx=12, ny=6, nz=6)
    cls = MpmPipeline if pipeline == "dense" else SparseMpmPipeline
    pipe = cls(b.grid, b.models, b.colliders, b.params, b.gravity)
    p = b.particles
    for frame, gold in enumerate(GOLD_SAND3):
        p, niter = pipe.step_with_stats(p)
        assert int(niter) == gold["substeps"]
        com, lo, hi, ke = _stats(p)
        np.testing.assert_allclose(com, gold["com"], atol=1e-3)
        np.testing.assert_allclose(lo, gold["pos_min"], atol=2e-3)
        np.testing.assert_allclose(hi, gold["pos_max"], atol=2e-3)
        np.testing.assert_allclose(ke, gold["ke"], rtol=2e-2)
