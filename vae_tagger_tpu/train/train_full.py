"""End-to-end VAE + tagger training (reference: train_full.py:30-399).

One jitted step runs: (3B) triplet encode -> sample -> [anchor decode when
the full loss needs it] -> stop-gradient scaled anchor latents -> decoder ->
simplified or full combined loss (optionally with learnable adaptive
weights, trained jointly, train_full.py:177-178) -> AdamW over VAE + decoder
(+ adaptive) params.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..core.cli import resolve_attention_flags
from ..core.config import get_vae_latent_info
from ..core.precision import resolve_mixed_precision
from ..eval import (
    collect_predictions,
    evaluate_model,
    find_optimal_threshold,
)
from ..infer.engine import build_decoder, load_vae_bundle
from ..io.orbax_io import restore_train_state, save_train_state
from ..io.safetensors_io import save_vae_pretrained
from ..io.torch_bin import load_decoder_params, save_decoder_bin
from ..losses.classification import class_balanced_weights
from ..losses.combined import AdaptiveLossWeights, LossConfig
from ..parallel.mesh import (
    initialize_distributed,
    is_main_process,
    make_mesh,
    replicate,
    shard_batch,
    shard_batch_spatial,
)
from .loop import (
    EpochLoop,
    build_dataset_and_loaders,
    spatial_parallel_enabled,
    validate_spatial_resolutions,
)
from .schedule import build_lr_schedule
from .state import TrainState, build_optimizer
from .steps import make_full_steps
from .train_decoder import _init_decoder_variables


def train_full(args):
    initialize_distributed()
    os.makedirs(args.output_dir, exist_ok=True)
    policy = resolve_mixed_precision(args.mixed_precision)
    attention_config = resolve_attention_flags(args)

    vae, vae_params = load_vae_bundle(
        args.vae_checkpoint, args.vae_config_path, policy=policy,
        require_checkpoint=False, resolution=args.resolution,
        remat=getattr(args, "remat", False),
        use_quant_conv=getattr(args, "use_quant_conv", False),
        use_post_quant_conv=getattr(args, "use_post_quant_conv", False))
    print(f"VAE latent info: "
          f"{get_vae_latent_info(args.resolution, vae.config.latent_channels, vae.config.downsample_factor)}")

    # --spatial_parallel: shard each image's HEIGHT over all devices (the
    # 1024px bs1 preset cannot data-parallelize — this is its scaling axis)
    spatial = spatial_parallel_enabled(args)
    if spatial:
        validate_spatial_resolutions(args, vae.config.downsample_factor)

    dataset, train_loader, val_loader = build_dataset_and_loaders(
        args, return_triplets=True)
    class_names = dataset.tags

    decoder = build_decoder(len(class_names), args.use_attention,
                            attention_config,
                            latent_channels=vae.config.latent_channels,
                            policy=policy)
    variables = _init_decoder_variables(decoder, vae.config.latent_channels,
                                        seed=args.seed or 0)
    decoder_params = variables["params"]
    batch_stats = variables.get("batch_stats")
    if args.decoder_checkpoint and os.path.exists(args.decoder_checkpoint):
        print(f"loading pretrained decoder: {args.decoder_checkpoint}")
        try:
            from ..io.safetensors_io import diff_trees, merge_into_reference

            loaded_params, loaded_stats = load_decoder_params(
                args.decoder_checkpoint)
            diff_trees(decoder_params, loaded_params, label="decoder ")
            decoder_params = merge_into_reference(decoder_params,
                                                  loaded_params)
            if loaded_stats and batch_stats is not None:
                batch_stats = merge_into_reference(batch_stats, loaded_stats)
        except Exception as e:
            print(f"decoder load failed, training from scratch: {e}")

    cfg = LossConfig(
        classification_weight=args.bce_weight,
        triplet_weight=args.triplet_weight,
        reconstruction_weight=args.reconstruction_weight,
        kl_weight=args.kl_weight,
        use_focal_loss=args.use_focal_loss,
        use_class_balanced=args.use_class_balanced,
        use_adaptive_weights=args.use_adaptive_weights,
        focal_alpha=args.focal_alpha,
        focal_gamma=args.focal_gamma,
        triplet_margin=args.triplet_margin,
        similarity_type=args.similarity_type,
    )
    cb_weights = (class_balanced_weights(dataset.class_distribution())
                  if args.use_class_balanced else None)

    params = {"vae": vae_params, "decoder": decoder_params}
    adaptive_module = None
    if not args.use_simplified_loss and args.use_adaptive_weights:
        adaptive_module = AdaptiveLossWeights(num_losses=4)
        params["adaptive"] = adaptive_module.init(
            jax.random.key(0), [0.0, 0.0, 0.0, 0.0])["params"]
        print("adaptive loss weights enabled (trained jointly)")

    total_steps = args.num_epochs * len(train_loader)
    schedule = build_lr_schedule(args.lr_scheduler_type, args.learning_rate,
                                 args.lr_warmup_steps, total_steps)
    tx = build_optimizer(schedule, args.weight_decay, args.max_grad_norm,
                         args.gradient_accumulation_steps)
    state = TrainState.create(params, tx, batch_stats=batch_stats)

    mesh = make_mesh(("model",)) if spatial else make_mesh()
    state = replicate(state, mesh)

    train_step, eval_step = make_full_steps(
        vae, decoder, cfg, use_simplified=args.use_simplified_loss,
        adaptive_module=adaptive_module, cb_weights=cb_weights,
        compute_dtype=policy.compute_dtype,
        checkpoint_encode=getattr(args, "remat", False),
        force_xla_kernels=spatial,
        spatial_mesh=mesh if spatial else None)
    base_rng = jax.random.key(args.seed or 0)

    def run_train(state, batch, global_step):
        return train_step(state, batch,
                          jax.random.fold_in(base_rng, global_step))

    def run_eval(state, batch, global_step):
        return eval_step(state, batch,
                         jax.random.fold_in(base_rng, 10_000_000 + global_step))

    def export_models(state, vae_dir, decoder_dir):
        if not is_main_process():
            return  # file writes; the callers' orbax save is the collective
        host = jax.device_get(state)
        vae_out = os.path.join(args.output_dir, vae_dir)
        dec_out = os.path.join(args.output_dir, decoder_dir)
        os.makedirs(dec_out, exist_ok=True)
        save_vae_pretrained(host.params["vae"], vae.config, vae_out)
        save_decoder_bin(host.params["decoder"], host.batch_stats,
                         os.path.join(dec_out, "pytorch_model.bin"))
        print(f"VAE saved to: {vae_out}")
        print(f"decoder saved to: {dec_out}")

    def on_best(state, epoch):
        save_train_state(state,
                         os.path.join(args.output_dir, "best_checkpoint"))
        export_models(state, "best_vae", "best_decoder")

    def on_periodic(state, epoch):
        save_train_state(state,
                         os.path.join(args.output_dir, f"checkpoint-{epoch}"))
        export_models(state, "vae", "decoder")

    log_keys = (("loss", "triplet_loss", "classification_loss")
                if args.use_simplified_loss else
                ("loss", "reconstruction_loss", "kl_loss", "triplet_loss",
                 "classification_loss"))
    loop = EpochLoop(args, train_loader, val_loader, run_train, run_eval,
                     on_best, on_periodic, log_metric_keys=log_keys)
    if getattr(args, "resume_from", None):
        state = restore_train_state(state, args.resume_from)
        resume_step = int(jax.device_get(state.step))
        print(f"resumed from {args.resume_from} at step {resume_step}")
        # extend the LR schedule horizon: the restored optimizer count
        # continues past a fresh run's total_steps, which would pin the
        # default cosine/linear schedules at their fully-decayed (~0) tail
        # for the whole resumed run
        schedule = build_lr_schedule(args.lr_scheduler_type,
                                     args.learning_rate,
                                     args.lr_warmup_steps,
                                     resume_step + total_steps)
        state = state.replace(tx=build_optimizer(
            schedule, args.weight_decay, args.max_grad_norm,
            args.gradient_accumulation_steps))
    state = loop.run(state, lr_schedule=schedule)
    if loop.interrupted:  # preempted: state is checkpointed, exit fast
        loop.save_history(args.output_dir)
        print("training interrupted; skipping final evaluation")
        return state

    print("training complete; final evaluation...")
    loop.save_history(args.output_dir)

    # anchor-only encode+classify for evaluation: the training eval_step
    # runs the full 3x triplet forward just to produce probabilities
    import jax.numpy as jnp

    from ..models.autoencoder_kl import encode_scaled
    from ..ops.image import normalize_uint8

    @jax.jit
    def _predict(params, batch_stats, pix):
        from .steps import resolve_transfer_format

        pixels = resolve_transfer_format(pix)["pixel_values"]
        x = normalize_uint8(pixels, policy.compute_dtype)
        posterior = vae.apply({"params": params["vae"]}, x,
                              method=type(vae).encode)
        latents = encode_scaled(posterior.mode(), vae.config).astype(
            policy.compute_dtype)
        variables = {"params": params["decoder"]}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        logits = decoder.apply(variables, latents, deterministic=True)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    def predict_fn(batch):
        # only what's used travels: the anchor image in its wire format
        if "anchor_y" in batch:
            pix = {"pixel_values_y": batch["anchor_y"],
                   "pixel_values_cbcr": batch["anchor_cbcr"]}
        else:
            pix = {"pixel_values": batch.get("pixel_values",
                                             batch["anchor"])}
        sb = ((shard_batch_spatial if spatial else shard_batch)(pix, mesh))
        from .steps import _kernel_ctx

        with _kernel_ctx(spatial, training=False,
                         spatial_mesh=mesh if spatial else None):
            return _predict(state.params, state.batch_stats, sb)

    # ONE val inference pass shared by threshold search and final eval
    # (the reference runs two back-to-back, evaluation.py:209-222 + 173-200)
    collected = collect_predictions(predict_fn, val_loader)
    thresholds = find_optimal_threshold(predict_fn, val_loader, class_names,
                                        output_dir=args.output_dir,
                                        collected=collected)
    evaluate_model(predict_fn, val_loader, class_names,
                   threshold=thresholds["global_threshold"],
                   output_dir=args.output_dir, collected=collected)
    print("training and evaluation complete")
    return state
