"""Orbax train-state checkpointing.

The reference saves full Accelerate state (model+optimizer+scaler) via
``accelerator.save_state`` but never implements resume (SURVEY.md §5:
``load_state`` is never called).  Here train state (params, optimizer state,
step, batch stats) goes through Orbax, and resume is a first-class flag on
every trainer (``--resume_from``).
"""

from __future__ import annotations

import os

import jax


def save_train_state(state, path: str) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    payload = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    if state.batch_stats is not None:
        payload["batch_stats"] = state.batch_stats
    checkpointer.save(path, payload, force=True)
    checkpointer.wait_until_finished()


def restore_train_state(state, path: str):
    """Restore into the structure of ``state`` (same models/optimizer)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    template = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    if state.batch_stats is not None:
        template["batch_stats"] = state.batch_stats
    restored = checkpointer.restore(path, template)
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
        batch_stats=restored.get("batch_stats", state.batch_stats),
    )
