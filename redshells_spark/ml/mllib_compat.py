"""MLlib compatibility shims.

``strip_training_summary``: Spark 4.1's ``classic.SparkSession``
lazily creates an ``ObservationManager`` (not ``Serializable``) the
first time any ``df.observe`` runs in the session. Training summaries
(LogisticRegression, LinearRegression, …) hold their ``predictions``
DataFrame, which holds the SparkSession — so once ANY observation has
ever run, serializing a summary-carrying model into a task closure
(which ``model.transform``'s internal UDF does) dies with
``NotSerializableException: ObservationManager``. Dropping the summary
after fit removes the session from the model's object graph; nothing
in this repo reads training summaries (metrics come from explicit
evaluators), so this is free.

Root-caused in tests/test_observe.py + tests/test_quality_model.py
interaction; the minimal repro is observe() → LR fit → transform →
count in one session.
"""

from __future__ import annotations

from typing import Any


def strip_training_summary(model: Any) -> Any:
    """Drop the training summary from an MLlib model (or every stage
    of a PipelineModel), in place. Safe no-op for models without one.
    Returns the model for chaining."""
    stages = getattr(model, "stages", None)
    targets = list(stages) if stages is not None else [model]
    for m in targets:
        jobj = getattr(m, "_java_obj", None)
        if jobj is None or not getattr(m, "hasSummary", False):
            continue
        try:
            from pyspark.sql import SparkSession

            jvm = SparkSession.getActiveSession()._jvm  # type: ignore[union-attr]
            jobj.setSummary(jvm.scala.Option.empty())
        except Exception:  # noqa: BLE001 — future Spark may rename; summary is optional
            pass
    return model
