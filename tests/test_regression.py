"""Golden-trajectory regression: catches silent physics changes.

tests/golden_scenes.json pins >=10-frame summary statistics of the dense CPU
pipeline on reduced configs of ALL EIGHT reference example scenes
(ref: examples2d/*.rs, examples3d/*.rs). The dense pipeline must reproduce
them exactly-ish (float nondeterminism across XLA versions aside), the fused
persistent-slot pipeline within physics tolerances, and the block-sparse
pipeline is spot-checked on two scenes (its per-scene equivalence to dense
is separately enforced by test_sparse.py).

Regenerate deliberately when semantics intentionally change:
    JAX_PLATFORMS=cpu python tests/make_goldens.py
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
from sparkl_tpu.fused.pipeline import FusedMpmPipeline

GOLD = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden_scenes.json"))
)
SCENES = sorted(GOLD.keys())


def _stats(p):
    act = np.asarray(p.active)
    pos = np.asarray(p.position)[act]
    vel = np.asarray(p.velocity)[act]
    ke = float(0.5 * np.sum(np.asarray(p.mass)[act][:, None] * vel**2))
    failed = int(np.asarray(p.failed)[act].sum())
    broken = int((np.asarray(p.phase)[act] == 0.0).sum())
    mass = float(np.asarray(p.mass)[act].sum())
    return pos.mean(axis=0), pos.min(axis=0), pos.max(axis=0), ke, failed, broken, mass


def _make_pipe(kind, b):
    if kind == "dense":
        return MpmPipeline(b.grid, b.models, b.colliders, b.params, b.gravity, b.hooks)
    if kind == "sparse":
        return SparseMpmPipeline(
            b.grid, b.models, b.colliders, b.params, b.gravity, b.hooks,
            use_pallas="interpret",
        )
    return FusedMpmPipeline(
        b.grid, b.models, b.colliders, b.params, b.gravity, b.hooks,
        use_pallas="interpret",
    )


def _replay(scene, kind, max_frames=None):
    gold = GOLD[scene]
    b = scenes.build(scene, **gold["config"])
    pipe = _make_pipe(kind, b)
    p = jax.tree_util.tree_map(jnp.array, b.particles)
    n0 = int(np.asarray(b.particles.active).sum())
    act0 = np.asarray(b.particles.active)
    mass0 = float(np.asarray(b.particles.mass)[act0].sum())
    per_mass = np.asarray(b.particles.mass)
    frames = gold["frames"][:max_frames] if max_frames else gold["frames"]
    for rec in frames:
        p, niter = pipe.step_with_stats(p)
        frame = rec["frame"]
        if kind == "dense":
            assert int(niter) == rec["substeps"], f"{scene} frame {frame} substeps"
        else:
            # fp jitter in the dt bound can flip a sliver-length final
            # substep (remaining ~ 1e-7 s) on or off; physics is unchanged.
            assert abs(int(niter) - rec["substeps"]) <= 1, (
                f"{scene} frame {frame} substeps"
            )
        com, lo, hi, ke, failed, broken, mass = _stats(p)
        # Conservation invariant (independent of the goldens): MPM transfers
        # never create or destroy mass — the only sink is deactivation
        # (out-of-grid particles, ref particle_set.rs:132-135), so total
        # active mass must equal the initial total minus exactly the mass of
        # the since-deactivated particles.
        act_now = np.asarray(p.active)
        deact = float(per_mass[act0 & ~act_now].sum())
        np.testing.assert_allclose(
            mass, mass0 - deact, rtol=1e-6,
            err_msg=f"{scene} frame {frame} mass conservation",
        )
        np.testing.assert_allclose(
            com, rec["com"], atol=3e-3, rtol=1e-3,
            err_msg=f"{scene} frame {frame} com",
        )
        np.testing.assert_allclose(
            lo, rec["pos_min"], atol=8e-3, rtol=1e-3,
            err_msg=f"{scene} frame {frame} pos_min",
        )
        np.testing.assert_allclose(
            hi, rec["pos_max"], atol=8e-3, rtol=1e-3,
            err_msg=f"{scene} frame {frame} pos_max",
        )
        np.testing.assert_allclose(
            ke, rec["ke"], rtol=3e-2, atol=1e-8,
            err_msg=f"{scene} frame {frame} ke",
        )
        slack = max(2, int(0.02 * n0))
        assert abs(failed - rec["failed"]) <= slack, f"{scene} frame {frame} failed"
        assert abs(broken - rec["broken"]) <= slack, f"{scene} frame {frame} broken"


@pytest.mark.parametrize("scene", SCENES)
def test_golden_dense(scene):
    _replay(scene, "dense")


# Interpret-mode Pallas replays cost ~4 min/scene on CPU; two scenes cover
# the fused path's heavy regimes (3D sand + heightfield + plasticity, and 3D
# fluid volume recompute). The eigenerosion/hook/Stick path is pinned against
# dense by test_fused.py's per-feature equivalence tests (interpret replay of
# the full l_panel2 scene graph compiles for ~10 min on XLA:CPU).
@pytest.mark.parametrize("scene,frames", [("sand3", 4), ("fluids3", 4)])
def test_golden_fused(scene, frames):
    _replay(scene, "fused", max_frames=frames)


@pytest.mark.parametrize("scene", ["elasticity2", "sand3"])
def test_golden_sparse(scene):
    _replay(scene, "sparse", max_frames=6)
