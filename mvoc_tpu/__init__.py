"""mvoc_tpu — TPU-native multiple-video-object-composition framework.

A ground-up JAX / XLA / Pallas / pjit re-design of the capabilities of
SobeyMIL/MVOC (training-free multi-object video composition on top of the
I2VGen-XL image-to-video diffusion model; see /root/repo/SURVEY.md for the
structural analysis of the reference).

Layering (bottom → top):
  ops/        pure compute: DDIM schedulers, fused attention, injection math
  models/     I2VGen-XL UNet3D, AutoencoderKL VAE, CLIP text/vision — all
              functional (params pytree in, arrays out), channels-last
  pipelines/  inversion (lax.scan over steps), PnP composite sampler
  parallel/   mesh + NamedSharding rules for multi-chip execution
  io/         host-side media/mask IO, latent trajectory store
  cli/        drivers compatible with the reference's YAML+JSON config surface
"""

__version__ = "0.1.0"
