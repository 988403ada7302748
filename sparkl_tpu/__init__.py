"""sparkl_tpu — a TPU-native Material Point Method (MPM) physics framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of dimforge/sparkl
(MLS-MPM with APIC transfer; hyperelastic / fluid constitutive models; plastic
return mapping; damage / fracture; rigid-collider coupling; CFL-adaptive
substepping; 2D + 3D; multi-chip domain decomposition).

Reference semantics: /root/reference (sparkl @ 2024-08-07); see SURVEY.md.
This is NOT a port — the compute path is jnp + Pallas TPU kernels, scaling is
jax.sharding over device meshes, and sparsity is fixed-capacity block tables
instead of hashmaps/mmap.
"""

from sparkl_tpu.core.params import (
    BoundaryHandling,
    DamageModel,
    SimulationDofs,
    SolverParameters,
)
from sparkl_tpu.core.particles import Particles, cube_particles, sample_sdf
from sparkl_tpu.models.registry import (
    ConstitutiveType,
    PlasticType,
    FailureType,
    ParticleModel,
    ModelSet,
    corotated_linear_elasticity,
    neo_hookean_elasticity,
    monaghan_sph_eos,
    drucker_prager_plasticity,
    nacc_plasticity,
    rankine_plasticity,
    snow_plasticity,
    maximum_stress_failure,
)
from sparkl_tpu.geometry.colliders import (
    ColliderSet,
    cuboid,
    halfspace,
    ball,
    capsule,
    heightfield,
    polyline,
    trimesh,
)
from sparkl_tpu.solver.pipeline import MpmPipeline, MpmHooks
from sparkl_tpu.core.grid import GridParams

__version__ = "0.1.0"


def auto_pipeline(bundle, prefer="auto", **kw):
    """Build the best pipeline for a scene bundle.

    "auto" = the fused persistent-slot pipeline whenever the configuration
    supports it, the block-sparse split pipeline otherwise (custom Python
    models only, since round 3). The round-2/3 regime switch is retired:
    since the round-4 Mosaic 2D fix + state-resident spans + cardano eig3,
    fused measures faster than sparse on ALL eight reference scenes
    (BASELINE.md round-4 per-scene table: elasticity2 1.20 vs 3.24,
    fluids2 7.88 vs 26.13, basic2 1.93 vs 4.31, l_panel2 10.52 vs 53.87,
    sand3 14.35 vs 85.99 ms/substep) — one GPU-class path for every scene,
    like the reference's single CudaMpmPipeline (cuda_mpm_pipeline.rs).
    `prefer` in {"auto", "fused", "sparse", "dense"} forces a path.
    """
    from sparkl_tpu.fused.pipeline import FusedMpmPipeline
    from sparkl_tpu.sparse.pipeline import SparseMpmPipeline
    from sparkl_tpu.solver.pipeline import MpmPipeline

    args = (bundle.grid, bundle.models, bundle.colliders, bundle.params,
            bundle.gravity, bundle.hooks)
    pose_fn = getattr(bundle, "collider_pose_fn", None)
    fused_kw = dict(kw)
    if pose_fn is not None:
        # Animated colliders (sweep2-style scenes): the fused path takes the
        # pose schedule at construction; the dense/sparse paths take poses
        # per step_with_stats call instead.
        fused_kw["collider_pose_fn"] = pose_fn
    def _warn_pose_drop(path):
        if pose_fn is not None:
            import warnings

            warnings.warn(
                f"auto_pipeline: scene has collider_pose_fn but the {path} "
                "path takes poses per step_with_stats(poses=...) call — the "
                "schedule is NOT applied automatically; pass poses yourself "
                "or the colliders stay at their static pose",
                stacklevel=3,
            )

    if prefer == "dense":
        _warn_pose_drop("dense")
        return MpmPipeline(*args)
    if prefer == "sparse":
        _warn_pose_drop("sparse")
        return SparseMpmPipeline(*args, **kw)
    ok, _why = FusedMpmPipeline.supports(bundle.models, bundle.params)
    if prefer == "fused":
        if not ok:
            raise ValueError(f"fused pipeline unsupported here: {_why}")
        return FusedMpmPipeline(*args, **fused_kw)

    if ok:
        return FusedMpmPipeline(*args, **fused_kw)
    _warn_pose_drop("sparse (custom-model fallback)")
    return SparseMpmPipeline(*args, **kw)
