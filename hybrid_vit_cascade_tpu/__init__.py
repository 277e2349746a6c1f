"""hybrid_vit_cascade_tpu — TPU-native X-ray → CT reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the PyTorch
reference `kanadm12/Hybrid-ViT-Cascade` (bi-planar 512x512 AP/Lateral X-rays →
64³/128³/256³ CT volumes): direct-regression hybrid CNN + 3D-ViT models, the
progressive 64→128→256 cascade with frequency-aware losses, the CNN decoder
family, and the legacy diffusion family — built TPU-first:

* compute path: jnp/XLA with Pallas kernels for the hot ops (flash 3D-token
  attention, fused DRR projections, windowed SSIM statistics),
* parallelism: `jax.sharding.Mesh` + pjit/shard_map over ICI (replaces the
  reference's DDP/NCCL; see `parallel/`),
* precision: bf16 compute with fp32 parameters and fp32 loss reductions
  (replaces AMP + GradScaler),
* checkpointing: Orbax with per-stage subtrees (replaces `torch.save` dicts +
  key-prefix filtering).

Layer map (mirrors SURVEY.md §1): data/ (L0) → ops/ (L1) → models/ (L2) →
losses/ (L2b) → training/ (L3) → inference/ (L4) → utils/ (L5) → config (L6).
"""

__version__ = "0.1.0"
