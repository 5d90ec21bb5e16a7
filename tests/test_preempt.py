"""Preemption-safe checkpointing: TPU VMs receive SIGTERM with a short
grace window when preempted.  EpochLoop must finish the in-flight step,
write the full train state to <output_dir>/interrupt_checkpoint, and exit
fast (skipping the trainers' final-eval phase); a --resume_from of that
checkpoint must continue the run exactly.

The reference has no preemption story at all (its trainers only checkpoint
at epoch boundaries, /root/reference/train_full.py:192-382); on preemptible
TPU capacity this is the difference between losing an epoch and losing
nothing.
"""

import json
import os
import signal

import jax
import pytest
from conftest import make_trainer_args

from vae_tagger_tpu.utils import create_synthetic_dataset


@pytest.fixture(scope="module")
def small_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("preempt_ds")
    return create_synthetic_dataset(str(root), num_images=10,
                                    img_size=32, seed=0)


def test_preempt_drill_saves_and_resumes(tmp_path, workspace_vae, small_ds,
                                         monkeypatch, capsys):
    """The deterministic drill hook (VAE_TAGGER_PREEMPT_AFTER_STEPS) takes
    the exact SIGTERM code path: interrupt checkpoint written after N
    steps, final eval skipped, and the checkpoint resumes."""
    from vae_tagger_tpu.train.train_decoder import train_decoder

    out = tmp_path / "out"
    monkeypatch.setenv("VAE_TAGGER_PREEMPT_AFTER_STEPS", "2")
    args = make_trainer_args(workspace_vae, small_ds, out, num_epochs=5)
    state = train_decoder(args)
    monkeypatch.delenv("VAE_TAGGER_PREEMPT_AFTER_STEPS")

    assert int(jax.device_get(state.step)) == 2
    ckpt = out / "interrupt_checkpoint"
    assert ckpt.exists()
    # the expensive final phase was skipped (no thresholds/eval artifacts)
    assert not (out / "optimal_thresholds.json").exists()
    out_text = capsys.readouterr().out
    assert "interrupt checkpoint saved at step 2" in out_text
    assert "skipping final evaluation" in out_text

    # resume: optimizer step count continues, run completes normally
    args2 = make_trainer_args(workspace_vae, small_ds, tmp_path / "out2",
                              num_epochs=1, resume_from=str(ckpt))
    state2 = train_decoder(args2)
    assert int(jax.device_get(state2.step)) > 2
    assert (tmp_path / "out2" / "best_pytorch_model.bin").exists()
    hist = json.loads((tmp_path / "out2" /
                       "training_history.json").read_text())
    assert len(hist["train_loss"]) == 1


def test_real_sigterm_mid_training(tmp_path, workspace_vae, small_ds,
                                   monkeypatch):
    """A REAL SIGTERM delivered mid-run (raised synchronously from the
    metric-drain path, i.e. between steps) lands in the installed handler
    and produces the interrupt checkpoint."""
    from vae_tagger_tpu.train.loop import EpochLoop
    from vae_tagger_tpu.train.train_decoder import train_decoder

    fired = []
    orig_drain = EpochLoop._drain

    def drain_then_sigterm(self, *a, **k):
        orig_drain(self, *a, **k)
        if not fired:
            fired.append(1)
            signal.raise_signal(signal.SIGTERM)

    monkeypatch.setattr(EpochLoop, "_drain", drain_then_sigterm)
    out = tmp_path / "out"
    args = make_trainer_args(workspace_vae, small_ds, out, num_epochs=5)
    before = signal.getsignal(signal.SIGTERM)
    state = train_decoder(args)
    assert fired
    assert (out / "interrupt_checkpoint").exists()
    # stopped within a step or two of the signal, not after 5 epochs
    assert int(jax.device_get(state.step)) <= 4
    # run() restored the previous SIGTERM disposition on exit
    assert signal.getsignal(signal.SIGTERM) == before


def test_no_handler_leak_after_normal_run(tmp_path, workspace_vae, small_ds):
    """A run that completes normally must leave the process SIGTERM
    disposition untouched."""
    from vae_tagger_tpu.train.train_decoder import train_decoder

    before = signal.getsignal(signal.SIGTERM)
    args = make_trainer_args(workspace_vae, small_ds, tmp_path / "out",
                             num_epochs=1)
    train_decoder(args)
    assert signal.getsignal(signal.SIGTERM) == before


@pytest.fixture(scope="module")
def multi_batch_ds(tmp_path_factory):
    # 40 images -> 36 train -> 3 global batches of 16 (2 x 8 devices)
    root = tmp_path_factory.mktemp("preempt_ds_multi")
    return create_synthetic_dataset(str(root), num_images=40,
                                    img_size=32, seed=0)


def test_mid_epoch_resume_skips_trained_batches(tmp_path, workspace_vae,
                                                multi_batch_ds, monkeypatch,
                                                capsys):
    """Resuming from a mid-epoch interrupt replays the interrupted epoch's
    shuffle and skips the already-trained batches: the data position, not
    just the optimizer state, is exact."""
    from vae_tagger_tpu.train.train_decoder import train_decoder

    out = tmp_path / "out"
    monkeypatch.setenv("VAE_TAGGER_PREEMPT_AFTER_STEPS", "2")
    args = make_trainer_args(workspace_vae, multi_batch_ds, out,
                             num_epochs=2)
    state = train_decoder(args)
    monkeypatch.delenv("VAE_TAGGER_PREEMPT_AFTER_STEPS")
    assert int(jax.device_get(state.step)) == 2

    args2 = make_trainer_args(workspace_vae, multi_batch_ds,
                              tmp_path / "out2", num_epochs=1,
                              resume_from=str(out / "interrupt_checkpoint"))
    state2 = train_decoder(args2)
    out_text = capsys.readouterr().out
    assert "mid-epoch resume: skipping 2 already-trained batches" in out_text
    # the resumed epoch trains only the 1 remaining batch of epoch 0's
    # 3-batch stream: 2 (restored) + 1 = 3 total steps
    assert int(jax.device_get(state2.step)) == 3


def test_sigterm_during_validation_saves_immediately(tmp_path, workspace_vae,
                                                     small_ds, monkeypatch,
                                                     capsys):
    """A SIGTERM landing during the validation loop must checkpoint at the
    end of that val pass — not wait for the next epoch's first train step
    (a slow val pass could outlast the preemption grace window)."""
    from vae_tagger_tpu.train.train_decoder import train_decoder
    from vae_tagger_tpu.utils.pipelining import OneInFlight

    fired = []
    orig_submit = OneInFlight.submit

    def submit_then_sigterm(self, *a, **k):
        orig_submit(self, *a, **k)
        if not fired:
            fired.append(1)
            signal.raise_signal(signal.SIGTERM)

    monkeypatch.setattr(OneInFlight, "submit", submit_then_sigterm)
    out = tmp_path / "out"
    args = make_trainer_args(workspace_vae, small_ds, out, num_epochs=5)
    state = train_decoder(args)
    assert fired
    assert (out / "interrupt_checkpoint").exists()
    # small_ds trains 1 batch/epoch; the signal fired in epoch 0's val, so
    # exactly one train step ran — no second epoch started
    assert int(jax.device_get(state.step)) == 1
    out_text = capsys.readouterr().out
    assert "skipping final evaluation" in out_text


def test_sigterm_during_checkpoint_callbacks_saves_immediately(
        tmp_path, workspace_vae, small_ds, monkeypatch):
    """A SIGTERM arriving while epoch-end checkpoint callbacks run must
    produce the interrupt checkpoint right after them, not an epoch later."""
    from vae_tagger_tpu.train.loop import EpochLoop
    from vae_tagger_tpu.train.train_decoder import train_decoder

    fired = []
    orig_ckpt = EpochLoop._checkpoint

    def ckpt_then_sigterm(self, *a, **k):
        orig_ckpt(self, *a, **k)
        if not fired:
            fired.append(1)
            signal.raise_signal(signal.SIGTERM)

    monkeypatch.setattr(EpochLoop, "_checkpoint", ckpt_then_sigterm)
    out = tmp_path / "out"
    args = make_trainer_args(workspace_vae, small_ds, out, num_epochs=5)
    state = train_decoder(args)
    assert fired
    assert (out / "interrupt_checkpoint").exists()
    # epoch 0 (1 batch) completed and checkpointed, then the save fired:
    # exactly one train step, not five epochs
    assert int(jax.device_get(state.step)) == 1


def test_train_vae_interrupted_message(tmp_path, workspace_vae, small_ds,
                                       monkeypatch, capsys):
    """An interrupted train_vae run reports the interruption (not 'VAE
    training complete'), consistent with the other two trainers."""
    from vae_tagger_tpu.train.train_vae import train_vae

    out = tmp_path / "out"
    monkeypatch.setenv("VAE_TAGGER_PREEMPT_AFTER_STEPS", "1")
    args = make_trainer_args(workspace_vae, small_ds, out, num_epochs=3)
    train_vae(args)
    monkeypatch.delenv("VAE_TAGGER_PREEMPT_AFTER_STEPS")
    out_text = capsys.readouterr().out
    assert "training interrupted; history saved" in out_text
    assert "VAE training complete" not in out_text
    assert (out / "interrupt_checkpoint").exists()
    assert (out / "training_history.json").exists()
