"""Checkpoint/resume via orbax (SURVEY.md section 5 item 4).

Strictly stronger than the reference's tf.train.Saver (agents/models.py
save/load, keep ~5 checkpoints): the FULL TrainState — params, optimizer
state, batched env state, LSTM carries, fingerprints, PRNG key, step —
round-trips, so resume continues mid-episode exactly (the reference
dropped carried LSTM state and buffers on restore)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, model_dir: str, max_to_keep: int = 5):
        self.path = os.path.abspath(model_dir)
        os.makedirs(self.path, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.path,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, train_state: Any) -> None:
        self.mngr.save(step, args=ocp.args.StandardSave(train_state))
        self.mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, train_state_like: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None
        return self.mngr.restore(
            step, args=ocp.args.StandardRestore(train_state_like))

    def restore_params(self, params_like: Any,
                       step: Optional[int] = None) -> Any:
        """Restore ONLY the policy params, regardless of how the rest of
        the TrainState was shaped at save time (a checkpoint written by a
        data-parallel run carries a global env batch; evaluation needs
        none of it). Reads the raw stored tree and rebuilds the params
        NamedTuple structure by field name."""
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None
        raw = self.mngr.restore(step)   # nested dicts of host arrays
        raw_params = raw["params"]

        def pick(like, node, path):
            if like is None:
                return None
            if node is None:
                raise ValueError(
                    f"checkpoint params missing a leaf at {path!r} that "
                    f"the current model requires (stored None / absent); "
                    f"model and checkpoint disagree structurally")
            if hasattr(like, "_fields"):      # NamedTuple
                vals = []
                for f in like._fields:
                    want = getattr(like, f)
                    # tolerate fields added after the checkpoint was
                    # written ONLY when the template says they are unused
                    if f not in node:
                        if want is None:
                            vals.append(None)
                            continue
                        raise ValueError(
                            f"checkpoint params missing field "
                            f"{path + '.' + f!r} required by the model")
                    vals.append(pick(want, node[f], path + "." + f))
                return type(like)(*vals)
            if isinstance(like, dict):
                return {k: pick(v, node.get(k), path + "." + k)
                        for k, v in like.items()}
            arr = jax.numpy.asarray(node)
            if arr.shape != like.shape:
                raise ValueError(
                    f"checkpoint param {path!r} has shape {arr.shape}, "
                    f"model expects {like.shape} (different topology or "
                    f"model config?)")
            return arr

        return pick(params_like, raw_params, "params")
