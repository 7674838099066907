"""Gokart-style cached task wrapper: parquet targets keyed by param hash.

The reference's only "optimizer" is task-level memoization: a task is
skipped when its ``output()`` target exists, and target paths embed a
hash of all significant parameters (reference
``data/data_frame_utils.py:23-28`` ``make_target``/``dump``/``load``;
unique-id usage ``app/word_item_similarity/make_similarity_data.py:52``).

Spark-first equivalent: each task materializes a DataFrame to a
parquet path derived from a stable hash of (task name, params); on
re-run the path is read back instead of recomputed. Within a task the
plan stays lazy so Catalyst optimizes whole segments; parquet
materialization points are exactly the task edges, which at 100 TB is
what you want anyway (restartability + shuffle reuse across runs).
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_DEFAULT_CACHE_ROOT = os.environ.get("REDSHELLS_SPARK_CACHE", "/tmp/redshells_spark_cache")


def make_unique_id(task_name: str, params: dict[str, Any]) -> str:
    """Stable hex id from task name + json-serialized params.

    Mirrors gokart's ``make_unique_id`` role (param-addressed targets)
    without depending on luigi. Non-serializable params are repr()'d.
    """

    def _default(o: Any) -> str:
        return repr(o)

    blob = json.dumps({"task": task_name, "params": params}, sort_keys=True, default=_default)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


@dataclass
class SparkTask:
    """A cached, parameter-addressed computation stage.

    ``build`` receives (spark, inputs: dict[str, DataFrame]) and
    returns the output DataFrame (lazy). ``run`` materializes it to
    parquet at the param-hash path unless the target already exists.
    """

    name: str
    params: dict[str, Any]
    build: Callable[[SparkSession, dict[str, DataFrame]], DataFrame]
    requires: dict[str, "SparkTask"] = field(default_factory=dict)
    cache_root: str = _DEFAULT_CACHE_ROOT
    use_unique_id: bool = True

    def output_path(self) -> str:
        if self.use_unique_id:
            uid = make_unique_id(
                self.name,
                {**self.params, "__requires__": {k: t.output_path() for k, t in self.requires.items()}},
            )
            return os.path.join(self.cache_root, self.name, uid)
        return os.path.join(self.cache_root, self.name)

    def complete(self) -> bool:
        # parquet writes are atomic via _SUCCESS marker
        return os.path.exists(os.path.join(self.output_path(), "_SUCCESS"))

    def run(self, spark: SparkSession, force: bool = False) -> DataFrame:
        path = self.output_path()
        if not force and self.complete():
            return spark.read.parquet(path)
        inputs = {k: t.run(spark, force=force) for k, t in self.requires.items()}
        out = self.build(spark, inputs)
        out.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)


def task(
    name: str,
    build: Callable[[SparkSession, dict[str, DataFrame]], DataFrame],
    params: dict[str, Any] | None = None,
    requires: dict[str, SparkTask] | None = None,
    **kwargs: Any,
) -> SparkTask:
    return SparkTask(name=name, params=params or {}, build=build, requires=requires or {}, **kwargs)


@dataclass
class MultiOutputSparkTask(SparkTask):
    """Task whose ``build`` returns a dict of named DataFrames, each
    materialized under ``<target>/<output_name>`` (reference multi-
    output tasks, e.g. train/test splits ``data/data_frame_utils.py:
    165-183``). ``requires`` entries may address one output as
    ``(task, output_name)`` via :func:`load_data_of_task`."""

    output_names: tuple[str, ...] = ()

    def complete(self) -> bool:
        return all(
            os.path.exists(os.path.join(self.output_path(), n, "_SUCCESS"))
            for n in self.output_names
        )

    def run_all(self, spark: SparkSession, force: bool = False) -> dict[str, DataFrame]:
        path = self.output_path()
        if not force and self.complete():
            return {n: spark.read.parquet(os.path.join(path, n)) for n in self.output_names}
        inputs = {k: t.run(spark, force=force) for k, t in self.requires.items()}
        outs = self.build(spark, inputs)
        if set(outs) != set(self.output_names):
            raise ValueError(f"build returned {sorted(outs)}, declared {sorted(self.output_names)}")
        for n, df in outs.items():
            df.write.mode("overwrite").parquet(os.path.join(path, n))
        return {n: spark.read.parquet(os.path.join(path, n)) for n in self.output_names}

    def run(self, spark: SparkSession, force: bool = False) -> DataFrame:
        return self.run_all(spark, force=force)[self.output_names[0]]


def load_data_of_task(
    multi_task: MultiOutputSparkTask, target_name: str
) -> SparkTask:
    """Select one named output of a multi-output task as a dependency
    (reference ``LoadDataOfTask``, ``data/load_data_of_task.py:5-14``).

    The wrapper's params include the parent's param-hash output path so
    that changing the parent's params invalidates the wrapper's cache
    too — otherwise a stale ``_SUCCESS`` under the old wrapper path
    would silently serve the previous parent's data."""
    return SparkTask(
        name=f"{multi_task.name}__{target_name}",
        params={"target": target_name, "parent": multi_task.output_path()},
        build=lambda spark, _inputs: multi_task.run_all(spark)[target_name],
        requires={},
        cache_root=multi_task.cache_root,
    )
