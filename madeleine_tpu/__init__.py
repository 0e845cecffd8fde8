"""madeleine_tpu — TPU-native (JAX/XLA/Pallas) multistain slide-representation framework.

A from-scratch rebuild of the capabilities of mahmoodlab/MADELEINE (ECCV'24,
"Multistain Pretraining for Slide Representation Learning in Pathology"),
designed TPU-first:

- functional core: pure jitted step functions over explicit parameter pytrees
- multi-head gated-attention MIL pooling fused into a Pallas online-softmax
  kernel that streams arbitrary-length patch bags in fixed VMEM
- dual global/local cross-stain objective (symmetric InfoNCE with cross-chip
  all-gather negatives + Graph-Optimal-Transport token alignment) fully under jit
- scale-out via jax.sharding.Mesh + XLA collectives (no DataParallel translation)

File-format compatible at the edges: HDF5 {features, coords} bags in,
{embeds, slide_ids} pkl out, and the reference torch ``model.pt`` checkpoints
load directly (see madeleine_tpu.models.factory).
"""

__version__ = "0.1.0"

from madeleine_tpu.config import MadeleineConfig  # noqa: F401
