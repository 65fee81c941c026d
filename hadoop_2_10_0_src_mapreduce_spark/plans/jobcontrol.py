"""JobControl / ControlledJob analog (SURVEY.md §2.8).

The reference ran multi-job workflows through a DAG scheduler
(CORE/mapreduce/lib/jobcontrol/JobControl.java [H]) because every MR
job materialized its output to HDFS. In Spark one DataFrame program is
already a DAG and intermediate materialization is opt-in (cache /
checkpoint / write), so this class exists for users migrating
JobControl pipelines: each "job" is a Python callable producing a
DataFrame (or any side effect); dependencies gate execution order;
states mirror the reference's READY/RUNNING/SUCCESS/FAILED/
DEPENDENT_FAILED.

Unlike the reference there is no polling thread — the DAG is resolved
with a topological walk at ``run()``; Spark's own scheduler handles all
intra-job parallelism, which is where the actual concurrency lives.
"""

from __future__ import annotations

import enum
from collections.abc import Callable
from dataclasses import dataclass, field
from graphlib import CycleError, TopologicalSorter
from typing import Any


class JobState(enum.Enum):
    WAITING = "WAITING"
    READY = "READY"
    RUNNING = "RUNNING"
    SUCCESS = "SUCCESS"
    FAILED = "FAILED"
    DEPENDENT_FAILED = "DEPENDENT_FAILED"


@dataclass
class ControlledJob:
    name: str
    fn: Callable[[dict[str, Any]], Any]
    depends_on: tuple[str, ...] = ()
    state: JobState = JobState.WAITING
    result: Any = None
    error: BaseException | None = None


@dataclass
class JobControl:
    jobs: dict[str, ControlledJob] = field(default_factory=dict)

    def add(self, name: str, fn: Callable[[dict[str, Any]], Any], *, depends_on: tuple[str, ...] = ()) -> ControlledJob:
        if name in self.jobs:
            raise ValueError(f"duplicate job: {name}")
        job = ControlledJob(name=name, fn=fn, depends_on=depends_on)
        self.jobs[name] = job
        return job

    def run(self) -> dict[str, Any]:
        """Execute jobs in dependency order. A job receives a dict of
        its dependencies' results. Returns {name: result} for
        successful jobs; failures propagate DEPENDENT_FAILED downstream
        instead of raising, like the reference."""
        graph = {name: set(j.depends_on) for name, j in self.jobs.items()}
        try:
            order = list(TopologicalSorter(graph).static_order())
        except CycleError as e:
            raise ValueError(f"dependency cycle: {e}") from e
        results: dict[str, Any] = {}
        for name in order:
            job = self.jobs[name]
            failed_deps = [d for d in job.depends_on
                           if self.jobs[d].state is not JobState.SUCCESS]
            if failed_deps:
                job.state = JobState.DEPENDENT_FAILED
                continue
            job.state = JobState.RUNNING
            try:
                job.result = job.fn({d: results[d] for d in job.depends_on})
            except Exception as ex:  # noqa: BLE001 — mirror reference: record, don't raise
                job.state = JobState.FAILED
                job.error = ex
                continue
            job.state = JobState.SUCCESS
            results[name] = job.result
        return results

    def states(self) -> dict[str, JobState]:
        return {name: j.state for name, j in self.jobs.items()}
