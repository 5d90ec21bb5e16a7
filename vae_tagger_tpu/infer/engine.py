"""Model loading + the jitted encode/classify engine.

The reference runs inference image-by-image at batch size 1
(``/root/reference/infer_full.py:94-105``) — the single biggest throughput
sin on accelerators (SURVEY.md §3 hot-loop summary).  The engine here:

- loads the same checkpoint formats (VAE safetensors/bin + config JSON,
  decoder ``pytorch_model.bin``);
- compiles ONE program per (batch, H, W) shape: uint8 in, on-device
  normalize -> VAE encode -> scale/shift -> tagger head -> sigmoid probs;
- batches the image stream per shape and pads the tail batch (results of
  padded rows are dropped), so adding images costs throughput, not compiles.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import (
    AttentionDecoderConfig,
    VAEConfig,
    default_flux_vae_config,
    vae_config_from_file,
)
from ..core.precision import Policy, resolve_mixed_precision
from ..io.safetensors_io import load_vae_params
from ..io.torch_bin import load_decoder_params
from ..models.autoencoder_kl import AutoencoderKL, encode_scaled
from ..models.taggers import (
    AttentionClassificationDecoder,
    ClassificationDecoder,
)
from ..ops.image import normalize_uint8, yuv420_to_normalized_rgb


def _init_vae_params(model: AutoencoderKL, sample_hw: int = 32):
    x = jnp.zeros((1, sample_hw, sample_hw, model.config.in_channels))
    return jax.jit(model.init)({"params": jax.random.key(0)}, x,
                               jax.random.key(1))["params"]


def load_vae_bundle(vae_checkpoint: Optional[str] = None,
                    vae_config_path: Optional[str] = None,
                    policy: Policy = Policy(),
                    require_checkpoint: bool = False,
                    resolution: Optional[int] = None,
                    remat: bool = False,
                    use_quant_conv: bool = False,
                    use_post_quant_conv: bool = False,
                    ) -> Tuple[AutoencoderKL, dict]:
    """Reference loading precedence (infer_full.py:16-26, train_full.py:40-53):
    config JSON if given, else the hardcoded FLUX config; weights from the
    checkpoint when present, else fresh initialization."""
    if vae_config_path and os.path.exists(vae_config_path):
        print(f"creating VAE from config file: {vae_config_path}")
        config = vae_config_from_file(vae_config_path)
    else:
        config = default_flux_vae_config()
        if resolution is not None:
            config = dataclasses.replace(config, sample_size=resolution)
    if use_quant_conv or use_post_quant_conv:
        # CLI override: build the SD-style quant convs even when the config
        # (or the hardcoded FLUX fallback) disables them
        config = dataclasses.replace(config, use_quant_conv=use_quant_conv,
                                     use_post_quant_conv=use_post_quant_conv)

    model = AutoencoderKL(config, dtype=policy.compute_dtype,
                          param_dtype=policy.param_dtype, remat=remat)
    if vae_checkpoint and os.path.exists(vae_checkpoint):
        print(f"loading pretrained VAE weights: {vae_checkpoint}")
        from ..io.safetensors_io import diff_trees, merge_into_reference

        loaded = load_vae_params(vae_checkpoint)
        # strict=False with key-diff reporting (the reference's semantics);
        # shape checks run against an abstract init (no compute) and fresh
        # initialization is only paid when keys are actually missing
        from ..io.safetensors_io import warn_if_quant_convs_missing

        abstract = jax.eval_shape(lambda: _init_vae_params(model))
        missing, _ = diff_trees(abstract, loaded, label="VAE ")
        warn_if_quant_convs_missing(missing)
        if missing:
            print("initializing missing VAE keys fresh (strict=False load)")
            params = merge_into_reference(_init_vae_params(model), loaded)
        else:
            params = merge_into_reference(abstract, loaded)
    elif require_checkpoint:
        raise RuntimeError("a VAE checkpoint or config file is required")
    else:
        print("creating new VAE with default config")
        params = _init_vae_params(model)
    return model, params


def build_decoder(num_classes: int, use_attention: bool = True,
                  attention_config: Optional[dict] = None,
                  latent_channels: int = 16,
                  policy: Policy = Policy()):
    """Decoder factory mirroring infer_full.py:33-57."""
    if use_attention:
        cfg = AttentionDecoderConfig(**(attention_config or {}))
        return AttentionClassificationDecoder(
            latent_channels=latent_channels, num_classes=num_classes,
            attention=cfg, dtype=policy.compute_dtype,
            param_dtype=policy.param_dtype)
    return ClassificationDecoder(num_classes=num_classes,
                                 dtype=policy.compute_dtype,
                                 param_dtype=policy.param_dtype)


@dataclasses.dataclass(eq=False)  # identity hash: instances are jit static args
class TaggerEngine:
    """VAE + tagger head with jitted batched forward functions.

    With ``mesh`` set (``parallel.mesh.make_mesh()``), inference runs SPMD
    data-parallel: params are replicated, pixel batches are sharded
    ``P('data')`` across the mesh and padded to ``8 x device_count`` rows
    (8 sublane rows per device), and jit compiles one program spanning all
    devices — the TPU-native equivalent of the reference's
    ``accelerate launch`` multi-GPU inference inheritance.
    """

    vae: AutoencoderKL
    vae_params: dict
    decoder: object  # linen module
    decoder_variables: dict
    tag_names: list
    policy: Policy = Policy()
    mesh: Optional[object] = None  # jax.sharding.Mesh
    # spatial (latency-mode) partitioning: name of the mesh axis the image
    # H dimension is sharded over (None = throughput-mode data parallelism)
    spatial_axis: Optional[str] = None
    batch_axis: Optional[str] = "data"

    @classmethod
    def load(cls, vae_checkpoint: str, decoder_checkpoint: str,
             tags_csv_path: str, vae_config_path: Optional[str] = None,
             use_attention: bool = True,
             attention_config: Optional[dict] = None,
             mixed_precision: Optional[str] = None,
             mesh: Optional[object] = None) -> "TaggerEngine":
        from ..data.dataset import load_tag_names

        policy = resolve_mixed_precision(mixed_precision)
        vae, vae_params = load_vae_bundle(
            vae_checkpoint, vae_config_path, policy=policy,
            require_checkpoint=True)
        tag_names = load_tag_names(tags_csv_path)
        decoder = build_decoder(len(tag_names), use_attention,
                                attention_config,
                                latent_channels=vae.config.latent_channels,
                                policy=policy)
        if not os.path.exists(decoder_checkpoint):
            raise RuntimeError(
                f"decoder checkpoint not found: {decoder_checkpoint}")
        from ..io.safetensors_io import diff_trees, merge_into_reference
        from ..train.train_decoder import _init_decoder_variables

        loaded_params, loaded_stats = load_decoder_params(decoder_checkpoint)
        init_vars = _init_decoder_variables(
            decoder, vae.config.latent_channels)
        diff_trees(init_vars["params"], loaded_params, label="decoder ")
        params = merge_into_reference(init_vars["params"], loaded_params)
        variables = {"params": params}
        if "batch_stats" in init_vars or loaded_stats:
            variables["batch_stats"] = merge_into_reference(
                init_vars.get("batch_stats", {}), loaded_stats or {})
        engine = cls(vae=vae, vae_params=vae_params, decoder=decoder,
                     decoder_variables=variables, tag_names=tag_names,
                     policy=policy)
        return engine.with_mesh(mesh) if mesh is not None else engine

    def with_mesh(self, mesh) -> "TaggerEngine":
        """A copy of this engine that runs SPMD over ``mesh`` (params
        replicated, batches sharded on the ``data`` axis)."""
        from ..parallel.mesh import replicate

        return dataclasses.replace(
            self, mesh=mesh, spatial_axis=None,
            vae_params=replicate(self.vae_params, mesh),
            decoder_variables=replicate(self.decoder_variables, mesh))

    def with_spatial_mesh(self, mesh, spatial_axis: str = "model",
                          batch_axis: Optional[str] = None) -> "TaggerEngine":
        """A copy of this engine that shards the image HEIGHT over
        ``spatial_axis`` — latency-mode parallelism.

        ``with_mesh`` (data parallelism) scales throughput but a single
        image still runs on one chip; here GSPMD spatially partitions the
        conv stack (halo exchanges for the 3x3 windows), the GroupNorm
        reductions become psums, and the mid-block attention all-gathers
        K/V — so one image's encode drops to ~1/n per chip.  The reference
        has no equivalent (Accelerate DDP is data-parallel only).

        ``batch_axis`` optionally shards the batch too (2-D latency x
        throughput mesh); default: the mesh's ``data`` axis when present.
        Traces force the XLA kernel path — hand-written Pallas kernels do
        not compose with GSPMD-sharded operands (docs/PERF.md records the
        flash-attention tradeoff this implies at 16k tokens).
        """
        from ..parallel.mesh import replicate

        if spatial_axis not in mesh.axis_names:
            raise ValueError(f"mesh has no axis {spatial_axis!r} "
                             f"(axes: {mesh.axis_names})")
        if batch_axis is None and "data" in mesh.axis_names:
            batch_axis = "data"
        return dataclasses.replace(
            self, mesh=mesh, spatial_axis=spatial_axis, batch_axis=batch_axis,
            vae_params=replicate(self.vae_params, mesh),
            decoder_variables=replicate(self.decoder_variables, mesh))

    # -- jitted forwards ----------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def _encode_fn(self, vae_params, pixels_uint8):
        x = normalize_uint8(pixels_uint8, self.policy.compute_dtype)
        posterior = self.vae.apply({"params": vae_params}, x,
                                   method=AutoencoderKL.encode)
        return encode_scaled(posterior.mode(), self.vae.config)

    @partial(jax.jit, static_argnums=0)
    def _encode_classify_fn(self, vae_params, decoder_variables, pixels_uint8):
        latents = self._encode_fn(vae_params, pixels_uint8)
        logits = self.decoder.apply(
            decoder_variables, latents.astype(self.policy.compute_dtype),
            deterministic=True)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        return latents, probs

    @partial(jax.jit, static_argnums=0)
    def _encode_yuv_fn(self, vae_params, y_uint8, cbcr_uint8):
        """Encode-only YUV 4:2:0 path (latent extraction over the half-byte
        wire format; conversion fused on device like the classify path)."""
        x = yuv420_to_normalized_rgb(y_uint8, cbcr_uint8,
                                     self.policy.compute_dtype)
        posterior = self.vae.apply({"params": vae_params}, x,
                                   method=AutoencoderKL.encode)
        return encode_scaled(posterior.mode(), self.vae.config)

    @partial(jax.jit, static_argnums=0)
    def _encode_classify_yuv_fn(self, vae_params, decoder_variables,
                                y_uint8, cbcr_uint8):
        """Planar YUV 4:2:0 input (half the transfer bytes of RGB): chroma
        upsample + BT.601 conversion run on device, fused ahead of the
        encoder (ops/image.py::yuv420_to_normalized_rgb)."""
        x = yuv420_to_normalized_rgb(y_uint8, cbcr_uint8,
                                     self.policy.compute_dtype)
        posterior = self.vae.apply({"params": vae_params}, x,
                                   method=AutoencoderKL.encode)
        latents = encode_scaled(posterior.mode(), self.vae.config)
        logits = self.decoder.apply(
            decoder_variables, latents.astype(self.policy.compute_dtype),
            deterministic=True)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        return latents, probs

    @staticmethod
    def _pad_batch(pixels_uint8: np.ndarray, multiple: Optional[int] = None):
        """Round sub-multiple batches up (zeros appended).

        Default multiple: 8 on TPU (sublane packing — off-multiple batches
        measured ~3x lower throughput per pixel on v5e), 1 elsewhere.  With
        a mesh, callers pass 8 x device_count so every device gets full
        sublane rows.  Padded rows are zeros and their results are dropped
        (the VAE's GroupNorm and the eval-mode head are per-sample, so pads
        cannot affect real rows).  Returns (padded, real_count)."""
        if multiple is None:
            multiple = 8 if jax.default_backend() == "tpu" else 1
        b = pixels_uint8.shape[0]
        if multiple <= 1 or b % multiple == 0:
            return pixels_uint8, b
        padded = -(-b // multiple) * multiple
        pad = np.zeros((padded - b, *pixels_uint8.shape[1:]),
                       pixels_uint8.dtype)
        return np.concatenate([np.asarray(pixels_uint8), pad], axis=0), b

    def _pad_multiple(self) -> Optional[int]:
        if self.mesh is None:
            return None  # backend default
        if self.spatial_axis is not None:
            # latency mode: the batch is NOT spread over the spatial axis, so
            # it only needs to divide the batch axis; padding a lone image up
            # to 8 sublane rows would multiply its latency, not hide it
            return self.mesh.shape[self.batch_axis] if self.batch_axis else 1
        sub = 8 if jax.default_backend() == "tpu" else 1
        return sub * self.mesh.size

    def pad_multiple(self) -> int:
        """The resolved batch pad multiple (_pad_batch rounds every batch up
        to this), public so callers (e.g. the server's warmup) can enumerate
        exactly the compiled batch shapes this engine produces."""
        explicit = self._pad_multiple()
        if explicit:
            return explicit
        return 8 if jax.default_backend() == "tpu" else 1

    def _place(self, pixels_uint8):
        """Host batch -> device array; sharded under a mesh (jit then
        compiles SPMD from the committed input sharding): P('data') in
        throughput mode, P(batch_axis, spatial_axis) over (B, H) in
        latency mode."""
        if self.mesh is None:
            return jnp.asarray(pixels_uint8)
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self.spatial_axis is not None:
            n = self.mesh.shape[self.spatial_axis]
            h = pixels_uint8.shape[1]
            # require the LATENT grid (H / 2^(stages-1)) to split evenly so
            # every stage keeps whole rows per shard (all bucket dims are
            # multiples of 64, so 1024px over 8 chips is 128/16 rows/chip)
            down = 2 ** (len(self.vae.config.block_out_channels) - 1)
            if h % (down * n) != 0:
                raise ValueError(
                    f"spatial parallelism needs H divisible by "
                    f"{down * n} (downsample {down} x {n} shards), got {h}")
            spec = P(self.batch_axis, self.spatial_axis)
            return jax.device_put(pixels_uint8, NamedSharding(self.mesh, spec))
        from ..parallel.mesh import batch_sharding

        return jax.device_put(pixels_uint8, batch_sharding(self.mesh))

    def _trace_backend(self):
        """Kernel-dispatch context for jit traces of this engine's programs.

        Spatial mode forces the XLA op path at trace time (Pallas kernels
        cannot be partitioned by GSPMD) with ONE exception: the mid-block
        attention enters spatial_attention_trace, which routes to a
        shard_map all-gather-K/V + local-q flash-kernel form whenever the
        LOCAL per-shard sequence clears the measured crossover — e.g.
        1024px over model-axis 2 leaves 8192 local rows, kernel territory;
        16384/8 = 2048 local rows stays on XLA (ops/attention.py)."""
        if self.spatial_axis is None:
            return contextlib.nullcontext()
        from ..ops import backend
        from ..ops.attention import spatial_attention_trace

        stack = contextlib.ExitStack()
        stack.enter_context(spatial_attention_trace(
            self.mesh, spatial_axis=self.spatial_axis,
            batch_axis=self.batch_axis))
        stack.enter_context(backend.backend("xla"))
        return stack

    def encode_async(self, pixels_uint8: np.ndarray):
        """Dispatch the encode without fetching: (device_latents, count).

        Same contract as classify_async — the caller flattens/serializes the
        previous batch while this one runs on the device."""
        px, b = self._pad_batch(pixels_uint8, self._pad_multiple())
        with self._trace_backend():
            return self._encode_fn(self.vae_params, self._place(px)), b

    def encode(self, pixels_uint8: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 -> (B, h, w, C) scaled/shifted latents."""
        latents, b = self.encode_async(pixels_uint8)
        return np.asarray(latents)[:b]

    def classify(self, pixels_uint8: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 -> (B, num_tags) sigmoid probabilities."""
        probs, b = self.classify_async(pixels_uint8)
        return np.asarray(probs)[:b]

    def classify_async(self, pixels_uint8: np.ndarray):
        """Dispatch without fetching: returns (device_probs, real_count).

        jax dispatch is async — the caller can decode/format the previous
        batch while this one runs, then ``np.asarray(device_probs)[:count]``
        when it actually needs the numbers (used by infer/classify.py to
        keep one batch in flight)."""
        px, b = self._pad_batch(pixels_uint8, self._pad_multiple())
        with self._trace_backend():
            _, probs = self._encode_classify_fn(
                self.vae_params, self.decoder_variables, self._place(px))
        return probs, b

    def encode_yuv_async(self, y_uint8: np.ndarray, cbcr_uint8: np.ndarray):
        """YUV 4:2:0 analogue of :meth:`encode_async`: planar (Y, CbCr)
        uint8 pair in, (device_latents, real_count) out.  Same spatial-mode
        restriction as classify_yuv_async."""
        if self.spatial_axis is not None:
            raise NotImplementedError(
                "YUV transfer is not supported with spatial parallelism")
        mult = self._pad_multiple()
        y, b = self._pad_batch(np.asarray(y_uint8), mult)
        cbcr, _ = self._pad_batch(np.asarray(cbcr_uint8), mult)
        return self._encode_yuv_fn(self.vae_params, self._place(y),
                                   self._place(cbcr)), b

    def classify_yuv_async(self, y_uint8: np.ndarray,
                           cbcr_uint8: np.ndarray):
        """YUV 4:2:0 analogue of :meth:`classify_async`.

        Takes the planar pair from the YUV transfer path — (B, H, W) luma
        and (B, 2, H/2, W/2) chroma uint8, 1.5 B/px on the wire — and
        returns (device_probs, real_count).  Not supported in spatial
        (latency) mode: the H-sharded trace would halo-exchange the chroma
        upsample for no latency benefit; use RGB transfer there."""
        if self.spatial_axis is not None:
            raise NotImplementedError(
                "YUV transfer is not supported with spatial parallelism")
        mult = self._pad_multiple()
        y, b = self._pad_batch(np.asarray(y_uint8), mult)
        cbcr, _ = self._pad_batch(np.asarray(cbcr_uint8), mult)
        probs = self._encode_classify_yuv_fn(
            self.vae_params, self.decoder_variables,
            self._place(y), self._place(cbcr))[1]
        return probs, b

    def encode_and_classify(self, pixels_uint8: np.ndarray):
        px, b = self._pad_batch(pixels_uint8, self._pad_multiple())
        with self._trace_backend():
            latents, probs = self._encode_classify_fn(
                self.vae_params, self.decoder_variables, self._place(px))
        return np.asarray(latents)[:b], np.asarray(probs)[:b]

    def get_attention_maps(self, pixels_uint8: np.ndarray) -> dict:
        """Attention maps of the tagger head for a pixel batch.

        Implements what the reference stubs out
        (``/root/reference/modules.py:477-485``): returns the CBAM
        channel/spatial gates and MHSA/cross-attention softmax weights
        captured via nn.sow (models/taggers.py::get_attention_maps)."""
        from ..models.taggers import get_attention_maps

        px, b = self._pad_batch(pixels_uint8, self._pad_multiple())
        with self._trace_backend():
            latents = self._encode_fn(self.vae_params, self._place(px))
            maps = get_attention_maps(
                self.decoder, self.decoder_variables,
                latents.astype(self.policy.compute_dtype))
        return {k: np.asarray(v)[:b] for k, v in maps.items()}

    def get_confidence(self, pixels_uint8: np.ndarray):
        """Descending (confidences, indices) per image — the reference's
        ``decoder.get_confidence`` API (modules.py:470-475), but batched and
        starting from pixels."""
        probs = self.classify(pixels_uint8)
        indices = np.argsort(-probs, axis=-1, kind="stable")
        sorted_conf = np.take_along_axis(probs, indices, axis=-1)
        return sorted_conf, indices
