"""lvd_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for LLM-grounded
video diffusion.

Capabilities mirror TonyLianLong/LLM-groundedVideoDiffusion (ICLR 2024):

* Stage 1: an LLM is prompted with a fixed few-shot template and returns a
  Dynamic Scene Layout (6 frames of captioned bounding boxes + a background
  keyword); responses are parsed and disk-cached.
* Stage 2: the layout conditions a text-to-video latent-diffusion model
  (ModelScope 1.7B / Zeroscope 3D-UNet) via either training-free
  cross-attention energy guidance or GLIGEN gated self-attention adapters.
* Evaluation: a 500-prompt, 5-task benchmark scored with predicates over
  layouts (stage 1) or OWL-ViT detections (stage 2).

The design is TPU-first, not a port: the compute path is functional JAX
(pure pytree parameters, `lax.scan` denoising, attention maps as functional
aux outputs differentiated with `jax.grad`), hot attention ops have Pallas
TPU kernels, and scaling is expressed with `jax.sharding` meshes.
"""

__version__ = "0.1.0"
