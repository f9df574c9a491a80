"""Physical-plan pins for the round-10 rotation-pool queries — the
scale properties that make them 100 TB-safe, asserted on the plans
(the test_plans_quality.py discipline applied to the pool):

- the Pareto frontier never degrades to the O(n²) NOT-EXISTS shape;
- hard-negative mining is the INTENDED bounded-broadcast nested loop
  (non-equi label predicate over a ≤1000-row query side), not a
  cartesian product;
- basket co-occurrence pair joins stay hash-equi, with the scalar
  totals as the only nested-loop rows, and the two rule directions
  share the corpus aggregations via runtime exchange reuse instead of
  re-scanning;
- the sweep-line and the narrow encoders never leave the JVM and
  never funnel through a single-partition exchange.
"""

import io
import contextlib
import re

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_skyline_never_all_pairs(spark):
    """The distributed sweep must never plan the O(n²) NOT-EXISTS
    self-join its oracle twin uses."""
    plan = plan_of(entry_mod.queries()["skyline_parts"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_hard_negatives_bounded_broadcast_loop(spark):
    """labeled_topk's non-equi label predicate makes a nested-loop join
    the correct physical choice — but ONLY with the bounded query side
    broadcast; a cartesian product would mean the bound was lost."""
    plan = plan_of(entry_mod.queries()["hard_negatives"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_basket_pair_joins_stay_hash_equi(spark):
    """association_rules / event_lift: the pair self-joins must be
    hash equi-joins; nested-loop rows are only the broadcast 1-row
    totals (the scalar-join idiom)."""
    qs = entry_mod.queries()
    for name in ("association_rules_events", "event_lift"):
        plan = plan_of(qs[name](spark, SF_DIR))
        tree = plan.split("\n\n")[0]
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert len(re.findall(r"BroadcastHashJoin", tree)) >= 1, name
        # every nested-loop join is a cross with a BuildRight scalar
        for line in tree.splitlines():
            if "BroadcastNestedLoopJoin" in line:
                assert "Cross BuildRight" in line, (name, line)


def test_association_rules_reuses_exchanges_at_runtime(spark):
    """The fwd/rev rule-direction union re-references the corpus
    aggregations; AQE must REUSE their exchanges, not re-scan — the
    difference between 1× and 2× corpus cost at 100 TB."""
    df = entry_mod.queries()["association_rules_events"](spark, SF_DIR)
    df.collect()  # reuse nodes only appear in the final adaptive plan
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert len(re.findall(r"ReusedExchange", tree)) >= 1


def test_sweep_line_is_keyed_windows_only(spark):
    """peak_concurrency: two keyed windows, zero joins, and no
    single-partition funnel — the whole point of the sweep-line over a
    pairwise overlap join."""
    plan = plan_of(entry_mod.queries()["peak_concurrency_daily"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree
    assert "Exchange SinglePartition" not in tree
    assert "BatchEvalPython" not in plan


def test_narrow_encoders_stay_jvm_side(spark):
    """kfold / OOF target encoding / calibration / Hilbert layout:
    no Python workers, no cartesian products anywhere."""
    qs = entry_mod.queries()
    for name in (
        "kfold_balance",
        "target_encode_segment",
        "quality_calibration",
        "hilbert_layout",
    ):
        plan = plan_of(qs[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
