from .engine import TaggerEngine, load_vae_bundle
from .classify import infer_and_classify
from .latents import infer_and_save_latents

__all__ = [
    "TaggerEngine",
    "load_vae_bundle",
    "infer_and_classify",
    "infer_and_save_latents",
]
