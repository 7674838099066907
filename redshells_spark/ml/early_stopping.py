"""Early stopping with retry + learning-rate decay — §2.H
``early_stopping``.

Reference ``contrib/model/early_stopping.py:13-45``: when the
monitored value fails to improve by a relative ``threshold``, restore
the best checkpoint, decrement ``try_count``, divide the learning rate
by ``decay_speed`` and continue; stop only when the retries are
exhausted. Improvements checkpoint the parameters.

The reference checkpoints TF sessions to disk; the driver-side numpy
trainers here snapshot parameter arrays in memory (same observable
semantics: training resumes from the best state with a decayed lr).
"""

from __future__ import annotations

import sys

import numpy as np


class EarlyStopping:
    def __init__(
        self,
        try_count: int = 1,
        learning_rate: float = 0.0,
        decay_speed: float = 2.0,
        threshold: float = 0.001,
        enabled: bool = True,
    ):
        self._try_count = try_count
        self._learning_rate = learning_rate
        self._decay_speed = decay_speed
        self._threshold = threshold
        self._enabled = enabled
        self._last_value = sys.float_info.max
        self._snapshot: list[list[np.ndarray]] | None = None

    def does_stop(self, value: float, *param_lists: list[np.ndarray]) -> bool:
        """True when training should stop. ``param_lists`` are lists of
        numpy arrays (model params, optimizer state, ...) snapshotted
        on improvement and restored IN PLACE on regression — callers
        keep using the same array objects, mirroring the reference's
        ``saver.restore(session)``."""
        if not self._enabled:
            return False

        if self._last_value * (1.0 - self._threshold) < value:
            # regression: restore best, spend a retry, decay the lr
            if self._snapshot is not None:
                for live, saved in zip(param_lists, self._snapshot):
                    for arr, s in zip(live, saved):
                        arr[...] = s
            self._try_count -= 1
            if self._try_count <= 0:
                return True
            self._learning_rate /= self._decay_speed
            # NB: _last_value intentionally not updated (reference :38)
            return False

        self._last_value = value
        self._snapshot = [[np.copy(a) for a in lst] for lst in param_lists]
        return False

    @property
    def learning_rate(self) -> float:
        return self._learning_rate
