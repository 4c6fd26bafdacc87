"""duodiff_tpu — a TPU-native (JAX/XLA/Pallas) image-diffusion framework.

Re-implements the full capability surface of the DuoDiff reference
(razvanmatisan/duodiff): U-ViT DDPM/DDIM training & sampling, DeeDiff/AdaDiff
early exit, the DuoDiff shallow->full dual-backbone sampler, latent-space
ImageNet-256 via a frozen KL autoencoder, FID evaluation — designed TPU-first:

- every hot path is jitted; the 1000-step samplers run as on-device
  ``lax.scan`` loops with zero host round-trips per step
  (vs the reference's host-driven Python loops, sampler.py:129 / eesampler.py:57),
- data parallel training over a ``jax.sharding.Mesh`` with optional tensor
  parallelism (XLA collectives over ICI),
- per-timestep probe tables as stacked weight arrays with gathers
  (vs the reference's 13,000-module ``nn.ModuleDict``, models/early_exit.py:228),
- Pallas fused-attention kernels for the U-ViT sequence lengths.
"""

__version__ = "0.1.0"
