"""The four dbt-core-style constraints as Spark assertions (checks.py):
unique / not_null (the reference's seven declared tests) plus
accepted_values / relationships (the remaining dbt core four — what a
reference user's schema.yml would grow into)."""

from __future__ import annotations

import pytest

from gpu_telemetry_lakehouse_spark.checks import (
    CheckError,
    expect_accepted_values,
    expect_not_null,
    expect_relationship,
    expect_unique,
)


@pytest.fixture(scope="module")
def frames(spark):
    jobs = spark.createDataFrame(
        [("j1", "u1", "Terminated"), ("j2", "u2", "Running"), ("j3", None, "Failed")],
        "job_id string, user_id string, status string",
    )
    users = spark.createDataFrame([("u1",), ("u2",)], "user_id string")
    return jobs, users


def test_unique_and_not_null(spark, frames):
    jobs, _ = frames
    expect_unique(jobs, "job_id")
    expect_not_null(jobs, "job_id")
    with pytest.raises(CheckError):
        expect_not_null(jobs, "user_id")
    dup = jobs.union(jobs.limit(1))
    with pytest.raises(CheckError):
        expect_unique(dup, "job_id")


def test_accepted_values(spark, frames):
    jobs, _ = frames
    expect_accepted_values(jobs, "status", ["Terminated", "Running", "Failed"])
    with pytest.raises(CheckError):
        expect_accepted_values(jobs, "status", ["Terminated", "Running"])


def test_relationships(spark, frames):
    jobs, users = frames
    # NULL child keys are ignored (dbt semantics); u1/u2 resolve.
    expect_relationship(jobs, "user_id", users, "user_id")
    orphan = spark.createDataFrame([("j9", "u9", "Running")], jobs.schema)
    with pytest.raises(CheckError):
        expect_relationship(jobs.union(orphan), "user_id", users, "user_id")


def test_expect_finite(spark):
    from gpu_telemetry_lakehouse_spark.checks import CheckError, expect_finite

    clean = spark.createDataFrame(
        [(1.0,), (None,), (-2.5,)], "v double"
    )
    expect_finite(clean, "v", "m")  # NULL allowed, finite values allowed
    for poison in (float("nan"), float("inf"), float("-inf")):
        dirty = clean.union(spark.createDataFrame([(poison,)], "v double"))
        with pytest.raises(CheckError, match="non-finite"):
            expect_finite(dirty, "v", "m")
