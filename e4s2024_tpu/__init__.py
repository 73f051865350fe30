"""e4s2024_tpu — a TPU-native regional-GAN-inversion face swapping/editing framework.

Built from scratch in JAX (Flax + pjit + Pallas), providing the full capabilities of the
reference system e4s2024/E4S2024 ("Fine-Grained Face Swapping via Regional GAN Inversion"):

- a mask-conditioned StyleGAN2 generator with per-region style modulation
  (cf. reference models/stylegan2/model.py:482) driven by 12-class segmentation maps,
- a mask-guided pSp-style encoder producing per-region style vectors
  (cf. reference models/encoders/psp_encoders.py:319),
- face parsing, mask-merge face swapping, compositing (multi-band blending, color
  transfer, morphology), PTI per-video generator tuning, latent editing, and a
  data-parallel GAN training loop.

Everything on the compute path is jit-compiled XLA with Pallas TPU kernels for the
hot resampling/activation ops; parallelism is expressed with jax.sharding Meshes.
Layout convention: images are NHWC float32/bfloat16 in [-1, 1] unless stated otherwise.
"""

__version__ = "0.1.0"
