"""bevgen_tpu — TPU-native multi-view BEV-conditioned image generation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of BEVGen
(alexanderswerdlow/BEVGen): two-stage discrete generative modeling of
mutually-consistent street-view camera images from a bird's-eye-view
semantic layout.

  Stage 1: RGB VQ-GAN + BEV VQ-VAE  (bevgen_tpu.models.stage1)
  Stage 2: multi-view MaskGIT transformer w/ camera-geometry embeddings
           and block-sparse cross-camera attention (bevgen_tpu.models.stage2)

Everything on the compute path is functional JAX (flax.linen modules +
pure functions), jit/pjit-compiled, laid out for the MXU (bf16, static
shapes, NHWC convs) and sharded over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from bevgen_tpu.core.config import (  # noqa: F401
    MultiViewConfig,
    Stage1Config,
    MuseConfig,
    PipelineConfig,
    CAMERA_SETS,
)
