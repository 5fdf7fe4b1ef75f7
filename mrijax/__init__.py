"""mrijax — TPU-native BraTS MRI diffusion framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
reference PyTorch project ``NickB42/mri-image-generation`` (see SURVEY.md):

* ``mrijax.models``    — 2D slice-conditioned UNet, 2.5D context UNet, 3D UNet
  (plain + bottleneck attention), 3D VAE (all channels-last, bf16-ready).
* ``mrijax.diffusion`` — beta schedules (linear/cosine), q_sample, losses
  (plain MSE / min-SNR), ancestral + DDIM samplers compiled as ``lax.scan``.
* ``mrijax.ops``       — core tensor ops: time embeddings, group norm,
  resize, attention (XLA reference path).
* ``mrijax.kernels``   — Pallas TPU kernels (flash attention for the latent
  bottleneck, fused GroupNorm+SiLU) with XLA fallbacks for CPU tests.
* ``mrijax.data``      — NIfTI ingest (pure numpy + optional C++ reader),
  normalization pipelines, slice/volume datasets, splitter, packed shards.
* ``mrijax.parallel``  — device meshes, data-parallel shard_map train steps,
  ICI/DCN collectives (replaces the reference's DataParallel/DDP-NCCL).
* ``mrijax.train``     — TrainState, trainers for all three model families,
  early stopping, plateau LR, preemption handling, checkpoint/resume.
* ``mrijax.evals``     — FID/KID/MS-SSIM/LPIPS-style metrics, improved
  precision/recall, memorization, Dice/HD95.
* ``mrijax.obs``       — metrics logging (MLflow-compatible JSONL), timing,
  pluggable energy accounting, signal handling.
"""

__version__ = "0.1.0"
