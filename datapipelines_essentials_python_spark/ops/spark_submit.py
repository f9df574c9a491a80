"""spark-submit command building + backfill splitting + parallel execution.

Capability parity (SURVEY.md §2.13 X4): reference
``utils/spark_submit_utils.py:14-80`` builds spark-submit command strings,
splits backfill date ranges into per-window submissions, and runs them
through a multiprocess pool scraping YARN app ids
(``Utilities.py:417-457``). Re-derived as a typed builder + a
``ThreadPoolExecutor`` pool (the work is subprocess-bound; threads avoid
fork+pickle overhead).
"""

from __future__ import annotations

import shlex
import subprocess
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from datetime import date

from datapipelines_essentials_python_spark.functions.datetime_fns import date_ranges


@dataclass
class SparkSubmitCommand:
    """Declarative spark-submit invocation."""

    application: str
    app_args: list[str] = field(default_factory=list)
    master: str | None = None
    deploy_mode: str | None = None
    name: str | None = None
    conf: dict[str, str] = field(default_factory=dict)
    packages: list[str] = field(default_factory=list)
    py_files: list[str] = field(default_factory=list)
    files: list[str] = field(default_factory=list)
    driver_memory: str | None = None
    executor_memory: str | None = None
    executor_cores: int | None = None
    num_executors: int | None = None
    spark_submit_bin: str = "spark-submit"

    def build(self) -> list[str]:
        cmd = [self.spark_submit_bin]
        if self.master:
            cmd += ["--master", self.master]
        if self.deploy_mode:
            cmd += ["--deploy-mode", self.deploy_mode]
        if self.name:
            cmd += ["--name", self.name]
        for k, v in self.conf.items():
            cmd += ["--conf", f"{k}={v}"]
        if self.packages:
            cmd += ["--packages", ",".join(self.packages)]
        if self.py_files:
            cmd += ["--py-files", ",".join(self.py_files)]
        if self.files:
            cmd += ["--files", ",".join(self.files)]
        if self.driver_memory:
            cmd += ["--driver-memory", self.driver_memory]
        if self.executor_memory:
            cmd += ["--executor-memory", self.executor_memory]
        if self.executor_cores is not None:
            cmd += ["--executor-cores", str(self.executor_cores)]
        if self.num_executors is not None:
            cmd += ["--num-executors", str(self.num_executors)]
        cmd.append(self.application)
        cmd += [str(a) for a in self.app_args]
        return cmd

    def build_str(self) -> str:
        return " ".join(shlex.quote(part) for part in self.build())


def backfill_commands(
    base: SparkSubmitCommand,
    start: date | str,
    end: date | str,
    interval_days: int,
    start_flag: str = "--startDate",
    end_flag: str = "--endDate",
) -> list[SparkSubmitCommand]:
    """One command per backfill window (parity: date-splitting submission at
    ``spark_submit_utils.py:40-80``)."""
    out = []
    for window in date_ranges(start, end, interval_days):
        cmd = SparkSubmitCommand(**{**base.__dict__})
        cmd.app_args = list(base.app_args) + [
            start_flag,
            window["startDate"],
            end_flag,
            window["endDate"],
        ]
        out.append(cmd)
    return out


@dataclass
class ExecutionResult:
    command: str
    returncode: int
    stdout: str
    stderr: str

    @property
    def succeeded(self) -> bool:
        return self.returncode == 0


def run_execution_pool(
    commands: list[SparkSubmitCommand | list[str] | str],
    max_parallel: int = 2,
    timeout: float | None = None,
) -> list[ExecutionResult]:
    """Run submissions concurrently; never raises on job failure — results
    carry per-command return codes (parity: pool success/failure paths
    tested at ``tests/test_spark_submit_execution_pool.py`` in the ref)."""

    def _run(cmd) -> ExecutionResult:
        if isinstance(cmd, SparkSubmitCommand):
            argv = cmd.build()
        elif isinstance(cmd, str):
            argv = shlex.split(cmd)
        else:
            argv = list(cmd)
        try:
            proc = subprocess.run(
                argv, capture_output=True, text=True, timeout=timeout
            )
            return ExecutionResult(" ".join(argv), proc.returncode, proc.stdout, proc.stderr)
        except subprocess.TimeoutExpired as exc:
            return ExecutionResult(" ".join(argv), -1, exc.stdout or "", "timeout")
        except FileNotFoundError as exc:
            return ExecutionResult(" ".join(argv), 127, "", str(exc))

    with ThreadPoolExecutor(max_workers=max(1, max_parallel)) as pool:
        return list(pool.map(_run, commands))
