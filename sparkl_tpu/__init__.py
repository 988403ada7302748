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

    "auto" picks by measured regimes on TPU v5e (BASELINE.md):
      * the fused persistent-slot pipeline for 3D scenes, large scenes, and
        anything in the eigenerosion family (its pairwise pooling kernel is
        ~8x faster than the bucket path);
      * the block-sparse split pipeline for small 2D scenes and 2D fluids
        with volume recomputation, where per-substep fixed costs dominate
        and the fused path's resort machinery does not pay for itself;
      * the sparse pipeline whenever the fused path does not support the
        configuration (custom Python models only, since round 3 — CD-MPM
        and boundary particle projection run fused now).
    `prefer` in {"auto", "fused", "sparse", "dense"} forces a path.
    """
    import numpy as _np
    from sparkl_tpu.fused.pipeline import FusedMpmPipeline
    from sparkl_tpu.sparse.pipeline import SparseMpmPipeline
    from sparkl_tpu.solver.pipeline import MpmPipeline

    args = (bundle.grid, bundle.models, bundle.colliders, bundle.params,
            bundle.gravity, bundle.hooks)
    if prefer == "dense":
        return MpmPipeline(*args)
    if prefer == "sparse":
        return SparseMpmPipeline(*args, **kw)
    ok, _why = FusedMpmPipeline.supports(bundle.models, bundle.params)
    if prefer == "fused":
        if not ok:
            raise ValueError(f"fused pipeline unsupported here: {_why}")
        return FusedMpmPipeline(*args, **kw)

    n = int(_np.asarray(bundle.particles.num_active))
    dim = bundle.grid.dim
    eigen = bundle.params.damage_model in (
        DamageModel.EIGENEROSION, DamageModel.MODIFIED_EIGENEROSION
    )
    use_fused = ok and (
        eigen
        or dim == 3
        or (n >= 200_000 and not bundle.params.force_fluids_volume_recomputation)
    )
    if use_fused:
        return FusedMpmPipeline(*args, **kw)
    return SparseMpmPipeline(*args, **kw)
