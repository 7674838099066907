"""EarlyStopping retry semantics (reference
contrib/model/early_stopping.py:13-45): regressions restore the best
snapshot IN PLACE, spend a retry, and decay the learning rate; stop
only when retries are exhausted."""

from __future__ import annotations

import numpy as np

from redshells_spark.ml.early_stopping import EarlyStopping


def test_improvement_snapshots_and_continues():
    es = EarlyStopping(try_count=2, learning_rate=0.1, decay_speed=2.0, threshold=0.01)
    p = [np.array([1.0, 2.0])]
    assert not es.does_stop(10.0, p)
    assert es.learning_rate == 0.1
    p[0][:] = [3.0, 4.0]
    assert not es.does_stop(5.0, p)  # improved → snapshot [3,4]


def test_regression_restores_decays_and_retries():
    es = EarlyStopping(try_count=2, learning_rate=0.1, decay_speed=2.0, threshold=0.01)
    p = [np.array([1.0, 2.0])]
    es.does_stop(10.0, p)  # snapshot [1,2] at 10.0
    p[0][:] = [9.0, 9.0]  # diverging params
    assert not es.does_stop(11.0, p)  # regression: retry 1 spent
    assert p[0].tolist() == [1.0, 2.0]  # restored in place
    assert es.learning_rate == 0.05  # decayed

    p[0][:] = [8.0, 8.0]
    assert es.does_stop(12.0, p)  # retry 2 spent → stop
    assert p[0].tolist() == [1.0, 2.0]  # restored again


def test_threshold_is_relative():
    es = EarlyStopping(try_count=1, learning_rate=0.1, threshold=0.1)
    p = [np.array([0.0])]
    es.does_stop(10.0, p)
    # 9.5 is within 10·(1-0.1)=9.0..10 → NOT an improvement → stop
    assert es.does_stop(9.5, p)

    es2 = EarlyStopping(try_count=1, learning_rate=0.1, threshold=0.1)
    es2.does_stop(10.0, p)
    assert not es2.does_stop(8.5, p)  # beats the 9.0 bar → continue


def test_disabled_never_stops():
    es = EarlyStopping(enabled=False)
    p = [np.array([1.0])]
    for v in [5.0, 6.0, 7.0, 8.0]:
        assert not es.does_stop(v, p)
