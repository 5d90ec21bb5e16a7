"""VAE-only triplet training (reference: train_vae.py:28-299).

Loss = w_recon * MSE(recon_a, anchor) + w_triplet * triplet(z_a, z_p, z_n)
[+ w_kl * log-damped KL unless ``--use_simplified_vae_loss``, which keeps KL
for monitoring only].  The triplet runs as one (3B) encoder batch and only
the anchor is decoded (the reference decodes all three and discards two).
"""

from __future__ import annotations

import os

import jax

from ..core.precision import resolve_mixed_precision
from ..infer.engine import load_vae_bundle
from ..io.orbax_io import restore_train_state, save_train_state
from ..io.safetensors_io import save_vae_pretrained
from ..losses.combined import LossConfig
from ..parallel.mesh import (
    initialize_distributed,
    is_main_process,
    make_mesh,
    replicate,
)
from .loop import (
    EpochLoop,
    build_dataset_and_loaders,
    spatial_parallel_enabled,
    validate_spatial_resolutions,
)
from .schedule import build_lr_schedule
from .state import TrainState, build_optimizer
from .steps import make_vae_steps


def train_vae(args):
    initialize_distributed()
    os.makedirs(args.output_dir, exist_ok=True)
    policy = resolve_mixed_precision(args.mixed_precision)

    vae, vae_params = load_vae_bundle(
        args.vae_checkpoint, args.vae_config_path, policy=policy,
        require_checkpoint=False, resolution=args.resolution,
        remat=getattr(args, "remat", False),
        use_quant_conv=getattr(args, "use_quant_conv", False),
        use_post_quant_conv=getattr(args, "use_post_quant_conv", False))

    spatial = spatial_parallel_enabled(args)
    if spatial:
        validate_spatial_resolutions(args, vae.config.downsample_factor)

    dataset, train_loader, val_loader = build_dataset_and_loaders(
        args, return_triplets=True)

    cfg = LossConfig(
        reconstruction_weight=args.reconstruction_weight,
        kl_weight=args.kl_weight,
        triplet_weight=args.triplet_weight,
        triplet_margin=args.triplet_margin,
        similarity_type=args.similarity_type,
    )

    total_steps = args.num_epochs * len(train_loader)
    schedule = build_lr_schedule(args.lr_scheduler_type, args.learning_rate,
                                 args.lr_warmup_steps, total_steps)
    # NOTE: the reference's train_vae steps the optimizer every batch with no
    # accumulation (train_vae.py:184-186); we honor the flag anyway.
    tx = build_optimizer(schedule, args.weight_decay, args.max_grad_norm,
                         getattr(args, "gradient_accumulation_steps", 1))
    state = TrainState.create(vae_params, tx)

    mesh = make_mesh(("model",)) if spatial else make_mesh()
    state = replicate(state, mesh)

    train_step, eval_step = make_vae_steps(
        vae, cfg, use_simplified=args.use_simplified_vae_loss,
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

    def export_vae(state, subdir):
        if not is_main_process():
            return  # file write; the callers' orbax save is the collective
        host_params = jax.device_get(state.params)
        out = os.path.join(args.output_dir, subdir)
        save_vae_pretrained(host_params, vae.config, out)
        print(f"VAE saved to: {out}")

    def on_best(state, epoch):
        save_train_state(state, os.path.join(args.output_dir,
                                             "best_checkpoint"))
        export_vae(state, "best_vae")

    def on_periodic(state, epoch):
        save_train_state(state,
                         os.path.join(args.output_dir, f"checkpoint-{epoch}"))
        export_vae(state, "vae")

    loop = EpochLoop(args, train_loader, val_loader, run_train, run_eval,
                     on_best, on_periodic,
                     log_metric_keys=("loss", "reconstruction_loss",
                                      "triplet_loss", "kl_loss"))
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
            getattr(args, "gradient_accumulation_steps", 1)))
    state = loop.run(state, lr_schedule=schedule)
    loop.save_history(args.output_dir)
    if loop.interrupted:  # preempted: state is checkpointed, exit fast
        # (train_vae has no final-eval phase, but keep the three trainers'
        # completion messaging consistent)
        print("training interrupted; history saved")
        return state
    print("VAE training complete")
    return state
