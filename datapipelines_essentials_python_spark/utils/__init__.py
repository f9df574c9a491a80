"""Driver-side utilities: column hygiene, repartitioning, job metrics."""
