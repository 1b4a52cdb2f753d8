from mvoc_tpu.pipeline.core import (  # noqa: F401
    CompositeSchedule,
    UNetConditioning,
    ddim_inversion_core,
    ddim_sampling_core,
    pnp_composite_core,
    prepare_image_latents,
)
from mvoc_tpu.pipeline.i2vgen import I2VGenXLPipeline  # noqa: F401
