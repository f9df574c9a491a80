"""Driver-contract meta-tests: the queries()/oracle_sql() registry is the
runtime surface the correctness gate consumes — pin its invariants so a
refactor can't silently break the gate's assumptions."""

import inspect

import __spark_entry__ as entry_mod


def test_every_query_has_an_oracle_and_vice_versa():
    qs = entry_mod.queries()
    os = entry_mod.oracle_sql()
    assert set(qs) == set(os), (
        sorted(set(qs) - set(os)),
        sorted(set(os) - set(qs)),
    )


def test_registry_has_no_shadowed_keys():
    """dict literals silently keep the last duplicate key; parse the
    source to prove each registry key appears exactly once."""
    import ast

    src = inspect.getsource(entry_mod.queries)
    tree = ast.parse(src.lstrip())
    dicts = [n for n in ast.walk(tree) if isinstance(n, ast.Dict)]
    assert dicts
    keys = [
        k.value
        for d in dicts
        for k in d.keys
        if isinstance(k, ast.Constant) and isinstance(k.value, str)
    ]
    assert len(keys) == len(set(keys)), sorted(
        k for k in set(keys) if keys.count(k) > 1
    )


def test_driver_window_is_exactly_50_and_spine_loaded():
    """The driver gate records the FIRST 50 entries; the §2 spine must
    stay inside it (the round-3 verdict contract) and the window must be
    exactly 50 before the parity-checked tail begins."""
    names = list(entry_mod.queries())
    window = names[:50]
    spine = {
        "q1_pricing_summary",
        "q5_nation_revenue",
        "metadata_pipeline",
        "filter_dsl_scan",
        "agg_dispatch",
        "duration_buckets",
        "dq_summary",
        "json_flatten",
        "word_count",
        "exact_dedup",
        "window_latest_order",
        "top_k_per_group",
        "cdc_merge",
        "scd2_merge",
    }
    assert spine <= set(window), spine - set(window)


def test_query_callables_accept_spark_and_sf_dir():
    for name, fn in entry_mod.queries().items():
        params = inspect.signature(fn).parameters
        assert len(params) == 2, (name, list(params))


def test_oracle_sql_strings_are_nonempty_selects():
    for name, sql in entry_mod.oracle_sql().items():
        s = sql.strip().lower()
        assert s.startswith(("select", "with")), name


def test_bench_headline_is_subset_of_registry():
    import bench

    missing = [n for n in bench.HEADLINE if n not in entry_mod.queries()]
    assert not missing, missing
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
