"""Skew operators: salted forms must equal their plain equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_batch_data_pipeline_nyc_spark.operators.skew import (
    salted_join,
    salted_two_stage_agg,
)
from automated_batch_data_pipeline_nyc_spark.sources import read_parquet

from .conftest import SF_SMOKE


@pytest.fixture()
def orders(spark):
    return read_parquet(spark, f"{SF_SMOKE}/orders.parquet")


@pytest.fixture()
def customer(spark):
    return read_parquet(spark, f"{SF_SMOKE}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain_join(spark, orders, customer, how):
    plain = orders.join(customer, on="o_custkey", how=how)
    salted = salted_join(orders, customer, on="o_custkey", how=how, salt_buckets=5)
    assert sorted(plain.columns) == sorted(salted.columns)
    cols = sorted(plain.columns)
    assert _rows(salted.select(*cols)) == _rows(plain.select(*cols))


def test_salted_join_rejects_unsupported_how(orders, customer):
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(orders, customer, on="o_custkey", how="right")


def test_salted_two_stage_agg_equals_plain_agg(spark, orders):
    plain = orders.groupBy("o_orderstatus").agg(
        F.count("o_orderkey").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )
    salted = salted_two_stage_agg(
        orders.withColumn("o_totalprice", F.col("o_totalprice").cast("decimal(18,2)")),
        keys=["o_orderstatus"],
        aggs={
            "n": ("count", "o_orderkey"),
            "total": ("sum", "o_totalprice"),
            "min_key": ("min", "o_orderkey"),
            "max_key": ("max", "o_orderkey"),
        },
        salt_buckets=7,
    )
    # decimal sums are order-independent, so equality is exact
    plain_rows = {r["o_orderstatus"]: (r["n"], r["total"], r["min_key"], r["max_key"]) for r in plain.collect()}
    salted_rows = {r["o_orderstatus"]: (r["n"], r["total"], r["min_key"], r["max_key"]) for r in salted.collect()}
    assert plain_rows == salted_rows


def test_salted_two_stage_agg_rejects_nondecomposable(spark, orders):
    with pytest.raises(ValueError, match="not decomposable"):
        salted_two_stage_agg(
            orders, keys=["o_orderstatus"], aggs={"a": ("avg", "o_totalprice")}
        )
