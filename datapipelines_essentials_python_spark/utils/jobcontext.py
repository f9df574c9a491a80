"""Named job counters.

Capability parity (SURVEY.md §2.4 A7): reference ``JobContext`` keeps named
``sc.accumulator`` counters and prints a table (``Utilities.py:300-322``).
Modernized on ``DataFrame.observe`` — metrics ride the existing action
instead of requiring executor-side ``+=`` in UDFs, so they're free at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class JobContext:
    """Collects named observations across a job and tabulates them."""

    def __init__(self) -> None:
        self._observations: dict[str, Observation] = {}

    def observe_counts(self, df: DataFrame, name: str, **metrics) -> DataFrame:
        """Attach an Observation; ``metrics`` maps metric name → Column agg.
        Default: row count."""
        if not metrics:
            metrics = {"rows": F.count(F.lit(1))}
        obs = Observation(name)
        self._observations[name] = obs
        aggs = [v.alias(k) for k, v in metrics.items()]
        return df.observe(obs, *aggs)

    def results(self) -> dict[str, dict]:
        return {name: obs.get for name, obs in self._observations.items()}

    def print_table(self) -> str:
        lines = ["metric\tvalue"]
        for name, vals in self.results().items():
            for k, v in vals.items():
                lines.append(f"{name}.{k}\t{v}")
        out = "\n".join(lines)
        print(out)
        return out
