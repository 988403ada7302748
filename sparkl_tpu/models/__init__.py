from sparkl_tpu.models import constitutive, plasticity, failure, registry
from sparkl_tpu.models.registry import ModelSet, ParticleModel
