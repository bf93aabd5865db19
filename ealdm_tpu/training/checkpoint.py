"""Orbax checkpointing with the reference's retention semantics.

Parity target: Lightning ModelCheckpoint as configured by the reference
(`/root/reference/main.py:625-705`): save_last + top-k on a monitored metric
(default `val/loss_simple_ema`), optional every-N-steps trainstep
checkpoints; resume via `-r` (`main.py:533-551`); crash-path save
(`melk`, `main.py:753-779`) maps to `save_on_exception`.

The checkpoint payload is the full TrainState pytree (params + EMA shadow +
optimizer state + step), so EMA rides along exactly as the reference's
buffer-based LitEma does.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        save_top_k: int = 3,
        monitor: Optional[str] = "val/loss_simple_ema",
        mode: str = "min",
        every_n_train_steps: Optional[int] = None,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.every_n_train_steps = every_n_train_steps
        options = ocp.CheckpointManagerOptions(
            max_to_keep=save_top_k,
            best_fn=(lambda m: m.get(monitor, float("inf"))) if monitor else None,
            best_mode=mode if monitor else "min",
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self._last_dir = os.path.join(self.directory, "last")

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        metrics = {
            k: float(v) for k, v in (metrics or {}).items()
            if np.isscalar(v) or getattr(v, "ndim", 1) == 0
        }
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics or None
        )
        self._mgr.wait_until_finished()
        self.save_last(state, step)

    def save_last(self, state: Any, step: int):
        """Unconditional `last.ckpt` equivalent (also the crash-path save)."""
        ckptr = ocp.StandardCheckpointer()
        path = os.path.join(self._last_dir, "state")
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        with open(os.path.join(self._last_dir, "meta.json"), "w") as f:
            json.dump({"step": int(step)}, f)

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return self.restore_last(state_template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def restore_last(self, state_template: Any) -> Any:
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(
            os.path.join(self._last_dir, "state"), state_template
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def should_save_every_n(self, step: int) -> bool:
        n = self.every_n_train_steps
        return bool(n) and step > 0 and step % n == 0

    def close(self):
        self._mgr.close()
