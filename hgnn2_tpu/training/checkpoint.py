"""Checkpointing: params + optimizer state + step/epoch via orbax.

The reference saves only the final whole torch module (functions/logs.py:
99-111) and cannot resume optimizer state or schedule position; here the
full TrainState (params, batch stats, optimizer moments, step) and the
epoch counter round-trip, with retention of the latest checkpoints.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, state, epoch: int) -> None:
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": epoch,
        }
        self.manager.save(epoch, args=ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()

    def save_tree(self, tree: dict, step: int) -> None:
        """Save an arbitrary pytree payload (the sharded trainer's
        params/batch_stats/opt_state dict) at step."""
        self.manager.save(step, args=ocp.args.StandardSave(tree))
        self.manager.wait_until_finished()

    def restore_tree(self, template: dict) -> tuple[dict, int] | None:
        """Restore the latest payload into template's structure; returns
        (payload, step) or None when no checkpoint exists."""
        latest = self.manager.latest_step()
        if latest is None:
            return None
        restored = self.manager.restore(
            latest, args=ocp.args.StandardRestore(template)
        )
        return restored, int(latest)

    def restore(self, state) -> tuple[Any, int] | None:
        """Restore into the structure of `state`; returns (state, epoch)."""
        latest = self.manager.latest_step()
        if latest is None:
            return None
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": 0,
        }
        restored = self.manager.restore(
            latest, args=ocp.args.StandardRestore(template)
        )
        new_state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        return new_state, int(restored["epoch"])
