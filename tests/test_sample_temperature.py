"""Temperature remixing (curate.sample_temperature): integer-exact target
math vs a python oracle, flattening property, determinism, downsample cap."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from medical_doc_knowledge_graph_system_spark.functions.curate import (
    _TEMP_WEIGHT_SCALE,
    sample_temperature,
)

pytestmark = pytest.mark.usefixtures("spark")


def _docs_df(spark, sizes):
    rows = []
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def _expected_targets(sizes, target_total):
    s = {g: math.floor(math.sqrt(float(c)) * _TEMP_WEIGHT_SCALE) for g, c in sizes.items()}
    tot = sum(s.values())
    return {g: min(target_total * s[g] // tot, sizes[g]) for g in sizes}


def test_group_sizes_match_python_oracle(spark):
    sizes = {"en": 400, "de": 100, "fr": 25, "zh": 9}
    df = sample_temperature(_docs_df(spark, sizes), target_total=120)
    got = {
        r.lang: r.n for r in df.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == {g: n for g, n in _expected_targets(sizes, 120).items() if n > 0}


def test_flattens_toward_uniform(spark):
    # natural mix 16:1; sqrt remix must be 4:1 (± the floor-division doc)
    sizes = {"en": 1600, "fr": 100}
    got = {
        r.lang: r.n
        for r in sample_temperature(_docs_df(spark, sizes), target_total=100)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert abs(got["en"] / got["fr"] - 4.0) < 0.2


def test_cap_at_group_size(spark):
    sizes = {"en": 3, "fr": 3}
    df = sample_temperature(_docs_df(spark, sizes), target_total=1000)
    assert df.count() == 6  # downsample-only: never more than the corpus


def test_deterministic_across_partitionings(spark):
    sizes = {"en": 200, "de": 50}
    base = _docs_df(spark, sizes)
    a = {tuple(r) for r in sample_temperature(base, target_total=60).collect()}
    b = {
        tuple(r)
        for r in sample_temperature(base.repartition(7), target_total=60).collect()
    }
    assert a == b and len(a) > 0
