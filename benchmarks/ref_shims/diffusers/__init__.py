"""Minimal diffusers shim for running the REFERENCE trainers on this host.

diffusers is not installed here (SURVEY.md §7); the reference code needs
exactly two pieces of it: ``diffusers.models.AutoencoderKL``
(/root/reference/diffusers_vae_loader.py:4) and
``diffusers.optimization.get_scheduler``
(/root/reference/train_decoder.py:8).  This package provides both —
AutoencoderKL backed by the repo's independent torch oracle
(tests/torch_oracle/vae_torch.py, whose state_dict keys already mirror the
diffusers layout, as the parity tests prove) — so
benchmarks/ref_accuracy_cpu.py can train the reference END TO END on CPU
and compare trained tag-F1 head-to-head with our framework on identical
data and identical seed weights.

Test-harness code only: nothing in vae_tagger_tpu imports this.
"""

from . import models, optimization  # noqa: F401
