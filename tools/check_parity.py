"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given scale factor, then compares
row count, schema (column names), and order-insensitive values — the same
contract CORRECTNESS_r{N}.json records.

Usage: python tools/check_parity.py [--since PARITY_FILE] [sf_dir] [query ...]

``--since PARITY_FILE`` runs only the registry queries NOT already
attested (a ``PASS <name>:`` line) in the given parity log — the
batch-addendum mode (r8 verdict item 7): each late-round operator batch
gets a reproducible incremental attestation, and the single full-cost
sweep stays the only run that touches every query.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datapipelines_essentials_python_spark import get_or_create_spark_session  # noqa: E402
from datapipelines_essentials_python_spark.tables import TABLES  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical text form for order-insensitive compare
    as_str = df.astype(str)
    order = as_str.sort_values(by=list(as_str.columns)).index
    return df.loc[order].reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col], o[col]
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            sv_f = pd.to_numeric(sv, errors="coerce")
            ov_f = pd.to_numeric(ov, errors="coerce")
            neq = ~((sv_f == ov_f) | (sv_f.isna() & ov_f.isna()))
            if neq.any():
                i = neq.idxmax()
                problems.append(
                    f"float col {col!r}: {int(neq.sum())} diffs, first at row {i}: "
                    f"spark={sv_f[i]!r} oracle={ov_f[i]!r}"
                )
        else:
            neq = ~((sv.astype(str) == ov.astype(str)) | (sv.isna() & ov.isna()))
            if neq.any():
                i = neq.idxmax()
                problems.append(
                    f"col {col!r}: {int(neq.sum())} diffs, first at row {i}: "
                    f"spark={sv[i]!r} oracle={ov[i]!r}"
                )
    return problems


def attested_in(parity_file: str) -> set[str]:
    """Query names with a PASS line in a committed parity log."""
    import re

    names = set()
    for line in Path(parity_file).read_text().splitlines():
        m = re.match(r"PASS (\S+):", line.strip())
        if m:
            names.add(m.group(1))
    return names


def main() -> int:
    argv = sys.argv[1:]
    since: set[str] | None = None
    if argv and argv[0] == "--since":
        since_file = argv[1]
        since = attested_in(since_file)
        print(f"--since {since_file}: {len(since)} queries already attested")
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    spark = get_or_create_spark_session()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed, passed, skipped = [], [], []
    n_run = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if since is not None and name in since:
            continue
        # Long-sweep hygiene: a 200+-query single session accumulates
        # localCheckpoint RDD blocks whose release waits on PYTHON GC of
        # the DataFrame refs — at the sf1 tier the executor store
        # eventually buckles under the residue (observed: tail-of-sweep
        # "error occurred while calling ...getResult" on the heaviest
        # query, then a wedged session). gc.collect() lets Spark's
        # ContextCleaner actually drop the dead blocks; the shared LSH
        # caches keep live module-level refs, so they are untouched
        # (clearCache() would evict them and force family rebuilds).
        n_run += 1
        if n_run % 5 == 0:
            import gc

            gc.collect()
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error: {exc}", flush=True)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            skipped.append(name)
            print(f"SKIP {name}: no oracle (rows={len(spark_pdf)}, {t_spark:.1f}s)", flush=True)
            continue
        t0 = time.time()
        try:
            oracle_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: oracle error: {exc}", flush=True)
            continue
        t_oracle = time.time() - t0
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            failed.append(name)
            print(f"FAIL {name} ({t_spark:.1f}s/{t_oracle:.1f}s):", flush=True)
            for p in problems:
                print(f"  - {p}")
        else:
            passed.append(name)
            print(
                f"PASS {name}: rows={len(spark_pdf)} "
                f"(spark {t_spark:.1f}s, duckdb {t_oracle:.1f}s)",
                flush=True,
            )

    print(
        f"\n{len(passed)} passed, {len(failed)} failed, {len(skipped)} rows-only "
        f"out of {len(queries)} at {sf_dir}"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
