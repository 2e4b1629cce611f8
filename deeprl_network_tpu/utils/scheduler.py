"""lr / entropy-beta schedules (reference agents/utils.py Scheduler ~L200).

The reference Scheduler supports constant / linear(-decay) schedules over
``total_step``. Here a schedule is a pure function of the global step so it
can live inside the jitted train step.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def make_schedule(kind: str, init: float, total_step: int,
                  min_value: float = 0.0, ratio: float = 1.0
                  ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """kind in {constant, linear, decay}; ``ratio`` scales the horizon over
    which a linear schedule anneals (reference entropy_ratio)."""
    kind = (kind or "constant").lower()
    if kind == "constant":
        return lambda step: jnp.asarray(init, jnp.float32)
    if kind in ("linear", "decay"):
        horizon = max(int(total_step * ratio), 1)

        def sched(step):
            frac = jnp.clip(step.astype(jnp.float32) / horizon, 0.0, 1.0)
            return jnp.maximum(init * (1.0 - frac), min_value)

        return sched
    raise ValueError(f"unknown schedule {kind}")


class Scheduler:
    """Host-side convenience mirror of the reference Scheduler API."""

    def __init__(self, kind: str, init: float, total_step: int,
                 min_value: float = 0.0, ratio: float = 1.0):
        self._fn = make_schedule(kind, init, total_step, min_value, ratio)

    def get(self, step) -> float:
        return float(self._fn(jnp.asarray(step)))
