from sparkl_tpu.core.params import (
    SolverParameters,
    BoundaryHandling,
    DamageModel,
    SimulationDofs,
)
from sparkl_tpu.core.particles import Particles, cube_particles, sample_sdf
from sparkl_tpu.core.grid import GridParams, GridState, stencil_offsets
