"""Lightweight pipeline task-graph runner (reference DAG parity, D1-D4).

The reference orchestrates with Airflow (``procurement_dag.py:379``:
``sync >> aggregate >> net_demand >> [export, quality] >> copy``). This
runner reproduces the semantics that matter — explicit dependencies,
topological execution, fan-out/fan-in, retries, inter-task results — as
plain Python with no scheduler dependency. Tasks exchange DataFrames/values
through a shared context dict (the XCom analogue, D2).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Any


@dataclass
class Task:
    name: str
    fn: Callable[[dict[str, Any]], Any]
    deps: tuple[str, ...] = ()
    retries: int = 0
    retry_delay_sec: float = 0.0


@dataclass
class TaskResult:
    name: str
    status: str  # "success" | "failed" | "skipped"
    attempts: int
    elapsed_sec: float
    error: str | None = None


@dataclass
class Pipeline:
    name: str
    tasks: dict[str, Task] = field(default_factory=dict)

    def task(
        self,
        name: str,
        deps: tuple[str, ...] = (),
        retries: int = 0,
        retry_delay_sec: float = 0.0,
    ) -> Callable[[Callable], Callable]:
        """Decorator registration: ``@pipe.task("agg", deps=("sync",))``."""

        def deco(fn: Callable) -> Callable:
            self.add(Task(name, fn, deps, retries, retry_delay_sec))
            return fn

        return deco

    def add(self, task: Task) -> None:
        if task.name in self.tasks:
            raise ValueError(f"duplicate task: {task.name}")
        unknown = [d for d in task.deps if d not in self.tasks]
        if unknown:
            raise ValueError(f"{task.name}: unknown deps {unknown}")
        self.tasks[task.name] = task

    def run(self, context: dict[str, Any] | None = None) -> dict[str, TaskResult]:
        """Execute in topological order; a failed task (after retries) skips
        its transitive dependents but independent branches continue —
        Airflow's default trigger-rule semantics."""
        ctx = context if context is not None else {}
        graph = {n: set(t.deps) for n, t in self.tasks.items()}
        order = list(TopologicalSorter(graph).static_order())
        results: dict[str, TaskResult] = {}
        failed: set[str] = set()
        for name in order:
            task = self.tasks[name]
            if any(d in failed for d in task.deps):
                results[name] = TaskResult(name, "skipped", 0, 0.0)
                failed.add(name)  # propagate to dependents
                continue
            t0 = time.perf_counter()
            attempts = 0
            error: str | None = None
            while attempts <= task.retries:
                attempts += 1
                try:
                    ctx[name] = task.fn(ctx)
                    error = None
                    break
                except Exception as e:  # noqa: BLE001 — report, don't crash the graph
                    error = f"{type(e).__name__}: {e}"
                    if attempts <= task.retries:
                        time.sleep(task.retry_delay_sec)
            elapsed = time.perf_counter() - t0
            if error is None:
                results[name] = TaskResult(name, "success", attempts, elapsed)
            else:
                results[name] = TaskResult(name, "failed", attempts, elapsed, error)
                failed.add(name)
        return results
