from sparkl_tpu.solver import dense
from sparkl_tpu.solver.pipeline import MpmPipeline, MpmHooks
