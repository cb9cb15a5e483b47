"""Pipeline runner (§2.10 O1/O3/O4/O5): composition, checkpoints,
retries, and gate-halts-downstream semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from automated_batch_data_pipeline_nyc_spark.plans import run_reference_pipeline
from automated_batch_data_pipeline_nyc_spark.plans.pipeline import Pipeline
from automated_batch_data_pipeline_nyc_spark.sources import read_parquet

from .conftest import SF_SMOKE


@pytest.fixture()
def events(spark):
    return read_parquet(spark, f"{SF_SMOKE}/events.parquet")


def test_reference_pipeline_model_matches_direct_computation(spark, events):
    from automated_batch_data_pipeline_nyc_spark.functions import time_bucket
    from automated_batch_data_pipeline_nyc_spark.operators.cleaning import clean_pipeline

    results = run_reference_pipeline(spark, events)
    assert list(results) == ["clean", "quality", "enrich", "model"]
    direct = (
        clean_pipeline(events, ts_col="ts", month_col="event_month")
        .withColumn("time_bucket", time_bucket("ts"))
        .groupBy("time_bucket", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )
    assert sorted(map(tuple, results["model"].collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_checkpoint_materializes_stage(spark, events, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    results = run_reference_pipeline(spark, events, checkpoint_dir=ckpt)
    assert os.path.isdir(os.path.join(ckpt, "clean"))
    # the checkpointed stage must re-read from parquet (fresh lineage)
    assert results["clean"].count() > 0


def test_stage_retries_then_succeeds(spark):
    pipe = Pipeline()
    attempts = {"n": 0}

    @pipe.stage("flaky", retries=2)
    def _flaky(spark, res):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")
        return spark.range(5)

    pipe.stages[0].retry_delay_s = 0.01
    results = pipe.run(spark)
    assert attempts["n"] == 3
    assert results["flaky"].count() == 5


def test_failing_gate_halts_downstream(spark):
    pipe = Pipeline()
    ran = []

    @pipe.stage("gate")
    def _gate(spark, res):
        raise ValueError("quality gate failed")

    @pipe.stage("downstream")
    def _downstream(spark, res):
        ran.append(True)
        return spark.range(1)

    with pytest.raises(ValueError, match="quality gate failed"):
        pipe.run(spark)
    assert not ran, "downstream stage must not run after a failed gate"


def test_extended_quality_gates(spark, events):
    from automated_batch_data_pipeline_nyc_spark.operators.quality import (
        QualityGateError,
        expect_referential_integrity,
        expect_unique_key,
        expect_values_between,
    )
    from automated_batch_data_pipeline_nyc_spark.sources import read_parquet

    clean = events.dropna()
    # unique key holds on event_id, fails on event_type
    expect_unique_key(clean, ["event_id"])
    with pytest.raises(QualityGateError, match="duplicate keys"):
        expect_unique_key(clean, ["event_type"])
    # range gate
    expect_values_between(clean, "value", -1e9, 1e9)
    with pytest.raises(QualityGateError, match="outside"):
        expect_values_between(clean, "value", 0, 1)
    # referential integrity: orders.o_custkey -> customer.c_custkey holds
    orders = read_parquet(spark, f"{SF_SMOKE}/orders.parquet")
    customer = read_parquet(spark, f"{SF_SMOKE}/customer.parquet")
    expect_referential_integrity(orders, "o_custkey", customer, "c_custkey")
    with pytest.raises(QualityGateError, match="no match"):
        expect_referential_integrity(
            orders, "o_custkey", customer.filter("c_custkey < 100"), "c_custkey"
        )
