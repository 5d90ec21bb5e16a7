"""Hand-written Pallas TPU kernels with XLA fallbacks.

Kernels:
  flash_attention   — blockwise O(S) memory attention for the VAE mid-block
                      (replaces the reference's xformers opt-in,
                      ``/root/reference/train_full.py:55-57``)
  groupnorm_silu    — fused GroupNorm+SiLU epilogue for the resnet stacks
"""
