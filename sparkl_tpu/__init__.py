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
