"""Ops layer: spark-submit builder/pool, logging, env detection, mockup data."""

import logging

import pytest
from pyspark.sql import types as T

from datapipelines_essentials_python_spark.ops.environment import (
    ENV_VAR,
    Environment,
    detect_environment,
)
from datapipelines_essentials_python_spark.ops.logging_util import audit_action, init_logging
from datapipelines_essentials_python_spark.ops.mockup_data import (
    generate_dataframe,
    generate_rows,
    random_schema,
)
from datapipelines_essentials_python_spark.ops.spark_submit import (
    SparkSubmitCommand,
    backfill_commands,
    run_execution_pool,
)


def test_spark_submit_build():
    cmd = SparkSubmitCommand(
        application="job.py",
        app_args=["--table", "invoice"],
        master="yarn",
        deploy_mode="cluster",
        conf={"spark.sql.shuffle.partitions": "64"},
        driver_memory="2g",
        executor_memory="4g",
        executor_cores=2,
        num_executors=10,
    )
    argv = cmd.build()
    assert argv[0] == "spark-submit"
    assert "--conf" in argv and "spark.sql.shuffle.partitions=64" in argv
    assert argv[-2:] == ["--table", "invoice"]
    assert "job.py" in cmd.build_str()


def test_backfill_commands():
    base = SparkSubmitCommand(application="job.py", app_args=["--mode", "backfill"])
    cmds = backfill_commands(base, "2024-01-01", "2024-01-10", 5)
    assert len(cmds) == 2
    assert cmds[0].app_args[-4:] == ["--startDate", "2024-01-01", "--endDate", "2024-01-05"]
    assert cmds[1].app_args[-4:] == ["--startDate", "2024-01-06", "--endDate", "2024-01-10"]
    assert base.app_args == ["--mode", "backfill"]  # base untouched


def test_execution_pool_success_and_failure():
    results = run_execution_pool(
        [["true"], ["false"], ["definitely-not-a-binary-xyz"]], max_parallel=3
    )
    assert [r.succeeded for r in results] == [True, False, False]
    assert results[2].returncode == 127


def test_init_logging_returns_logger():
    log = init_logging("INFO")
    assert log.name == "datapipelines_essentials_python_spark"


def test_audit_action(caplog):
    @audit_action("unit_op")
    def op(x):
        return x * 2

    with caplog.at_level(logging.INFO, logger="datapipelines_essentials_python_spark.audit"):
        assert op(21) == 42
    msgs = " ".join(r.getMessage() for r in caplog.records)
    assert "start unit_op" in msgs and "done unit_op" in msgs

    @audit_action("boom_op")
    def boom():
        raise ValueError("nope")

    with caplog.at_level(
        logging.INFO, logger="datapipelines_essentials_python_spark.audit"
    ), pytest.raises(ValueError):
        boom()
    assert any("failed boom_op" in r.getMessage() for r in caplog.records)


def test_detect_environment(monkeypatch):
    monkeypatch.setenv(ENV_VAR, "prod")
    assert detect_environment("whatever") == Environment.PROD
    monkeypatch.delenv(ENV_VAR)
    assert detect_environment("etl-prd-001.example.com") == Environment.PROD
    assert detect_environment("app.stage.internal") == Environment.STAGE
    assert detect_environment("dev-box") == Environment.DEV
    assert detect_environment("laptop") == Environment.LOCAL


def test_mockup_rows_deterministic():
    import random

    schema = random_schema(random.Random(7), n_cols=6)
    assert generate_rows(schema, 50, seed=1) == generate_rows(schema, 50, seed=1)
    assert generate_rows(schema, 50, seed=1) != generate_rows(schema, 50, seed=2)


def test_mockup_dataframe(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField(
                "nested", T.StructType([T.StructField("x", T.IntegerType())])
            ),
        ]
    )
    df = generate_dataframe(spark, schema, n_rows=25, seed=3)
    assert df.count() == 25
    assert df.schema == schema


# --------------------------------------------------------------------------
# sizing calculators (ops.tuning)
# --------------------------------------------------------------------------
def test_recommend_shuffle_partitions():
    from datapipelines_essentials_python_spark.ops.tuning import (
        MB,
        recommend_shuffle_partitions,
    )

    assert recommend_shuffle_partitions(0) == 1
    assert recommend_shuffle_partitions(256 * MB) == 1
    assert recommend_shuffle_partitions(256 * MB + 1) == 2
    # 10 GB at 256 MB → 40; rounded up to full 32-core waves → 64
    assert recommend_shuffle_partitions(10 * 1024 * MB, round_to_cores=32) == 64


def test_recommend_max_partition_bytes_clamps():
    from datapipelines_essentials_python_spark.ops.tuning import (
        MB,
        recommend_max_partition_bytes,
    )

    # tiny input clamps to the floor, huge input to the ceiling
    assert recommend_max_partition_bytes(1 * MB, cores=32) == 16 * MB
    assert recommend_max_partition_bytes(10_000_000 * MB, cores=32) == 512 * MB
    # mid-range: ~3 waves of 32 cores
    v = recommend_max_partition_bytes(9600 * MB, cores=32, waves=3)
    assert v == 100 * MB


def test_recommend_num_buckets_power_of_two():
    from datapipelines_essentials_python_spark.ops.tuning import (
        GB,
        recommend_num_buckets,
    )

    assert recommend_num_buckets(1 * GB) == 4
    assert recommend_num_buckets(100 * GB) == 512
    assert recommend_num_buckets(100 * GB, power_of_two=False) == 400


def test_recommend_output_files():
    from datapipelines_essentials_python_spark.ops.tuning import (
        MB,
        recommend_output_files,
    )

    assert recommend_output_files(0) == 1
    assert recommend_output_files(1024 * MB) == 2
