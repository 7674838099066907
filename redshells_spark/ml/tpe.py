"""Tree-structured Parzen Estimator hyperparameter search (driver-side).

The reference optimizes classifiers with a 100-trial Optuna TPE study
(``train/utils/utils.py:40-58``) over define-by-run search spaces
(``factory/optuna_param_factory.py:8-62``). Optuna is not available in
this environment, so this module implements the TPE algorithm itself
(Bergstra et al., "Algorithms for Hyper-Parameter Optimization",
NeurIPS 2011 — the published algorithm Optuna's default sampler uses)
with an Optuna-like ``Trial`` API, so reference-style search-space
functions port verbatim.

Scale note: the *search loop* is driver-side by design — each trial
fits a distributed Spark estimator on the cluster; only the handful of
(params, score) tuples live on the driver. That matches the
reference's own structure (Optuna study on the driver, model fits
wherever the model runs).

Algorithm (univariate TPE, independent per parameter, minimizing):
- first ``n_startup_trials`` are seeded random draws;
- afterwards observations are split at the ``gamma`` quantile of the
  objective into "good" and "bad" sets; each set is modeled with a
  Parzen window (Gaussian KDE + a uniform prior component for numeric
  params; Laplace-smoothed frequencies for categorical);
- ``n_ei_candidates`` draws from the good model are scored by
  l(x)/g(x) and the argmax is proposed (equivalent to maximizing
  expected improvement under the TPE factorization).
"""

from __future__ import annotations

import math
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

import numpy as np


@dataclass(frozen=True)
class _Dist:
    kind: str  # "uniform" | "loguniform" | "int" | "categorical"
    low: float = 0.0
    high: float = 1.0
    choices: tuple = ()


@dataclass
class FrozenTrial:
    params: dict[str, Any]
    distributions: dict[str, _Dist]
    value: float | None = None


class Trial:
    """Define-by-run parameter sampler handed to the objective.

    Mirrors the Optuna ``Trial`` surface the reference's search spaces
    use: ``suggest_uniform`` / ``suggest_loguniform`` / ``suggest_int``
    / ``suggest_categorical``.
    """

    def __init__(self, study: "Study", rng: np.random.Generator):
        self._study = study
        self._rng = rng
        self.params: dict[str, Any] = {}
        self.distributions: dict[str, _Dist] = {}

    def _suggest(self, name: str, dist: _Dist) -> Any:
        if name in self.params:
            return self.params[name]
        value = self._study._sample(name, dist, self._rng)
        self.params[name] = value
        self.distributions[name] = dist
        return value

    def suggest_uniform(self, name: str, low: float, high: float) -> float:
        return self._suggest(name, _Dist("uniform", low, high))

    # optuna v3 spelling
    def suggest_float(
        self, name: str, low: float, high: float, *, log: bool = False
    ) -> float:
        kind = "loguniform" if log else "uniform"
        return self._suggest(name, _Dist(kind, low, high))

    def suggest_loguniform(self, name: str, low: float, high: float) -> float:
        return self._suggest(name, _Dist("loguniform", low, high))

    def suggest_int(self, name: str, low: int, high: int) -> int:
        return int(self._suggest(name, _Dist("int", low, high)))

    def suggest_categorical(self, name: str, choices: Sequence[Any]) -> Any:
        return self._suggest(name, _Dist("categorical", choices=tuple(choices)))


def _kde_logpdf(x: np.ndarray, centers: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Log density of a Parzen mixture: one Gaussian per observation +
    one uniform prior component, all equally weighted."""
    span = max(hi - lo, 1e-12)
    n = len(centers)
    comps = [np.full((len(x), 1), -math.log(span))]  # the uniform prior
    if n:
        sigma = max(span / math.sqrt(n + 1), 1e-8 * span)
        z = (x[:, None] - centers[None, :]) / sigma
        comps.append(-0.5 * z * z - math.log(sigma * math.sqrt(2 * math.pi)))
    logps = np.concatenate(comps, axis=1) - math.log(n + 1)
    m = logps.max(axis=1, keepdims=True)
    return (m + np.log(np.exp(logps - m).sum(axis=1, keepdims=True))).ravel()


class Study:
    """Minimizing TPE study. ``optimize(objective, n_trials)`` then
    ``best_params`` / ``best_value`` / ``trials`` — the subset of the
    Optuna surface the reference uses."""

    def __init__(
        self,
        seed: int = 42,
        n_startup_trials: int = 10,
        gamma: float = 0.25,
        n_ei_candidates: int = 24,
    ):
        self._rng = np.random.default_rng(seed)
        self.n_startup_trials = n_startup_trials
        self.gamma = gamma
        self.n_ei_candidates = n_ei_candidates
        self.trials: list[FrozenTrial] = []

    # -- sampling ---------------------------------------------------

    def _observations(self, name: str, dist: _Dist) -> tuple[list[Any], list[float]]:
        vals, losses = [], []
        for t in self.trials:
            if t.value is not None and name in t.params and t.distributions.get(name) == dist:
                vals.append(t.params[name])
                losses.append(t.value)
        return vals, losses

    def _random(self, dist: _Dist, rng: np.random.Generator) -> Any:
        if dist.kind == "categorical":
            return dist.choices[int(rng.integers(0, len(dist.choices)))]
        if dist.kind == "loguniform":
            return float(np.exp(rng.uniform(math.log(dist.low), math.log(dist.high))))
        if dist.kind == "int":
            return int(rng.integers(int(dist.low), int(dist.high) + 1))
        return float(rng.uniform(dist.low, dist.high))

    def _sample(self, name: str, dist: _Dist, rng: np.random.Generator) -> Any:
        vals, losses = self._observations(name, dist)
        if len(vals) < self.n_startup_trials:
            return self._random(dist, rng)
        order = np.argsort(losses, kind="stable")
        n_good = max(1, int(math.ceil(self.gamma * len(vals))))
        good_idx, bad_idx = order[:n_good], order[n_good:]

        if dist.kind == "categorical":
            k = len(dist.choices)
            idx = {c: i for i, c in enumerate(dist.choices)}
            obs = np.array([idx[v] for v in vals])
            pg = np.bincount(obs[good_idx], minlength=k) + 1.0
            pb = np.bincount(obs[bad_idx], minlength=k) + 1.0
            pg, pb = pg / pg.sum(), pb / pb.sum()
            cand = rng.choice(k, size=self.n_ei_candidates, p=pg)
            best = cand[np.argmax(np.log(pg[cand]) - np.log(pb[cand]))]
            return dist.choices[int(best)]

        log_scale = dist.kind == "loguniform"
        xs = np.array(vals, dtype=np.float64)
        lo, hi = float(dist.low), float(dist.high)
        if log_scale:
            xs, lo, hi = np.log(xs), math.log(lo), math.log(hi)
        good, bad = xs[good_idx], xs[bad_idx]
        # draw candidates from the good mixture (prior → uniform draw)
        n_cand = self.n_ei_candidates
        pick = rng.integers(0, len(good) + 1, size=n_cand)
        sigma = max((hi - lo) / math.sqrt(len(good) + 1), 1e-8 * (hi - lo))
        cand = np.where(
            pick == len(good),
            rng.uniform(lo, hi, size=n_cand),
            good[np.minimum(pick, len(good) - 1)] + rng.normal(0.0, sigma, size=n_cand),
        )
        cand = np.clip(cand, lo, hi)
        score = _kde_logpdf(cand, good, lo, hi) - _kde_logpdf(cand, bad, lo, hi)
        x = float(cand[int(np.argmax(score))])
        if log_scale:
            x = math.exp(x)
        if dist.kind == "int":
            return int(np.clip(round(x), int(dist.low), int(dist.high)))
        return x

    # -- driving ----------------------------------------------------

    def optimize(
        self, objective: Callable[[Trial], float], n_trials: int = 100
    ) -> None:
        for _ in range(n_trials):
            trial = Trial(self, self._rng)
            value = float(objective(trial))
            self.trials.append(
                FrozenTrial(params=trial.params, distributions=trial.distributions, value=value)
            )

    @property
    def best_trial(self) -> FrozenTrial:
        done = [t for t in self.trials if t.value is not None]
        if not done:
            raise ValueError("no completed trials")
        return min(done, key=lambda t: t.value)

    @property
    def best_params(self) -> dict[str, Any]:
        return self.best_trial.params

    @property
    def best_value(self) -> float:
        return float(self.best_trial.value)


def create_study(seed: int = 42, **kwargs: Any) -> Study:
    return Study(seed=seed, **kwargs)


# ---------------------------------------------------------------------------
# Per-model search spaces (reference factory/optuna_param_factory.py:8-62),
# adapted to the MLlib estimators that actually run here. Same define-by-
# run registry contract: get_tpe_param(key, trial) -> params dict, and
# register_tpe_param_rule to extend.
# ---------------------------------------------------------------------------


def _gbt_default(trial: Trial) -> dict[str, Any]:
    """GBTClassifier space mirroring the reference XGB ranges that map
    onto MLlib GBT: max_depth 1..9 → maxDepth, eta → stepSize,
    subsampling and feature subset as the regularization analogues."""
    return {
        "maxDepth": trial.suggest_int("maxDepth", 1, 9),
        "stepSize": trial.suggest_loguniform("stepSize", 1e-3, 1.0),
        "subsamplingRate": trial.suggest_uniform("subsamplingRate", 0.5, 1.0),
        "minInfoGain": trial.suggest_loguniform("minInfoGain", 1e-8, 1.0),
    }


def _rf_default(trial: Trial) -> dict[str, Any]:
    return {
        "maxDepth": trial.suggest_int("maxDepth", 1, 9),
        "numTrees": trial.suggest_int("numTrees", 10, 200),
        "subsamplingRate": trial.suggest_uniform("subsamplingRate", 0.5, 1.0),
    }


def _lr_default(trial: Trial) -> dict[str, Any]:
    return {
        "regParam": trial.suggest_loguniform("regParam", 1e-8, 1.0),
        "elasticNetParam": trial.suggest_uniform("elasticNetParam", 0.0, 1.0),
    }


_TPE_PARAM_RULES: dict[str, Callable[[Trial], dict[str, Any]]] = {
    "GBTClassifier_default": _gbt_default,
    "RandomForestClassifier_default": _rf_default,
    "LogisticRegression_default": _lr_default,
}


def get_tpe_param(key: str, trial: Trial) -> dict[str, Any]:
    if key not in _TPE_PARAM_RULES:
        raise KeyError(
            f"{key!r} is not registered; call register_tpe_param_rule first. "
            f"Registered: {sorted(_TPE_PARAM_RULES)}"
        )
    return _TPE_PARAM_RULES[key](trial)


def register_tpe_param_rule(key: str, rule: Callable[[Trial], dict[str, Any]]) -> None:
    _TPE_PARAM_RULES[key] = rule
