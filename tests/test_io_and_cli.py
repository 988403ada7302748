import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

import sparkl_tpu as sk
from sparkl_tpu.io import checkpoint
from sparkl_tpu.models import registry


def test_checkpoint_roundtrip(tmp_path):
    models = registry.ModelSet.pack(
        [
            registry.ParticleModel(
                registry.corotated_linear_elasticity(2e4, 0.35),
                registry.drucker_prager_plasticity(2e4, 0.35),
                registry.maximum_stress_failure(1e5, 1e5),
            )
        ]
    )
    grid = sk.GridParams(origin=(0.0, 0.0), cell_width=0.05, res=(32, 32))
    params = sk.SolverParameters(dt=1 / 120, damage_model=sk.DamageModel.MODIFIED_EIGENEROSION)
    p = sk.cube_particles((0.5, 0.5), (6, 6), 0, 0.0125, 1000.0)
    p = p.replace(velocity=p.velocity + 0.5, phase=p.phase * 0.7)

    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, p, models, grid, params, extra={"frame": 7})
    p2, m2, g2, q2, extra = checkpoint.load(path)

    for name in ("position", "velocity", "phase", "deformation_gradient", "model_id", "active"):
        np.testing.assert_array_equal(
            np.asarray(getattr(p, name)), np.asarray(getattr(p2, name))
        )
    assert g2 == grid
    assert q2.dt == params.dt
    assert q2.damage_model == sk.DamageModel.MODIFIED_EIGENEROSION
    assert m2.present_p == models.present_p
    np.testing.assert_allclose(np.asarray(m2.cparams), np.asarray(models.cparams))
    assert extra == {"frame": 7}


def test_cli_runner(tmp_path):
    out = str(tmp_path / "run")
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "sparkl_tpu.run",
            "--scene",
            "elasticity2",
            "--frames",
            "2",
            "--pipeline",
            "dense",
            "--platform",
            "cpu",
            "--out",
            out,
            "--save-every",
            "1",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "done: 2 frames" in r.stdout
    assert os.path.exists(os.path.join(out, "frame_00000.npz"))
    assert os.path.exists(os.path.join(out, "final.npz"))
    p, m, g, q, extra = checkpoint.load(os.path.join(out, "final.npz"))
    assert extra["scene"] == "elasticity2"
    assert np.isfinite(np.asarray(p.position)[np.asarray(p.active)]).all()


def test_scene_list():
    import sparkl_tpu.scenes as scenes

    names = scenes.scene_names()
    for expected in (
        "elasticity2",
        "fluids2",
        "basic2",
        "sand3",
        "cube_through_sand3",
        "fluids3",
        "sand_penetration3",
    ):
        assert expected in names


def test_viz_render(tmp_path):
    """Headless renderer: every rendering mode produces a PNG
    (parity with ParticlesRenderingMode, testbed_plugin.rs:38-58)."""
    from sparkl_tpu import viz

    grid = sk.GridParams(origin=(0.0, 0.0), cell_width=0.1, res=(32, 32))
    p = sk.cube_particles((1.0, 1.0), (10, 10), 0, 0.025, 1000.0)
    p = p.replace(velocity=p.velocity + 0.3)
    for mode in viz.MODES:
        out = viz.render(p, str(tmp_path / f"{mode}.png"), mode=mode, grid=grid)
        assert os.path.getsize(out) > 1000


def test_orbax_checkpoint_roundtrip(tmp_path):
    from sparkl_tpu.io import checkpoint

    p = sk.cube_particles((0.5, 0.5), (6, 6), 0, 0.0125, 1000.0)
    path = str(tmp_path / "orbax_ckpt")
    checkpoint.save_orbax(path, p)
    p2 = checkpoint.load_orbax(path, p)
    np.testing.assert_array_equal(np.asarray(p.position), np.asarray(p2.position))
    np.testing.assert_array_equal(np.asarray(p.active), np.asarray(p2.active))
