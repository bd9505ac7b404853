"""Registry lint: structural invariants of the driver-facing query window.

The driver's correctness harness canonicalizes each query's result with
pandas ``sort_values`` -> ``Categorical`` -> ``factorize``, which raises
``TypeError: unhashable type: 'list'`` on Array/Map cells and silently
misbehaves on Struct cells (CORRECTNESS_r04.json, q_inverted_index
traceback).  Any WINDOW query emitting a complex-typed column is
therefore driver-red regardless of value correctness.  This lint makes
that class of contract break impossible to reintroduce via rotation.

Schema-only: building the DataFrame analyzes the plan without running a
job, so the whole window lints in seconds at sf0.001 (except the few
eager queries, which run tiny).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from rendler_spark.queries import ORACLE, QUERIES, WINDOW

SF = "/root/testdata/sf0.001"

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_window_is_50_unique_registered():
    assert len(WINDOW) == 50
    assert len(set(WINDOW)) == 50
    assert all(name in QUERIES for name in WINDOW)
    # registration order: the driver sees exactly the first 50
    assert list(QUERIES)[:50] == WINDOW


@pytest.mark.parametrize("name", WINDOW)
def test_window_query_emits_driver_hashable_columns(spark, name):
    df = QUERIES[name](spark, SF)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, _COMPLEX)
    ]
    assert not bad, (
        f"{name} emits complex-typed columns {bad}; the driver's pandas "
        "canonicalizer cannot sort/hash them — project to scalars "
        "(e.g. F.array_join) before registering"
    )


@pytest.mark.parametrize(
    "name", [n for n in WINDOW if n in ORACLE]
)
def test_window_oracled_query_is_not_vacuous(spark, name):
    """An oracled query returning 0 rows passes the driver compare as
    0 == 0 and proves nothing (ADVICE r4: q_tpch_q4_shape's out-of-range
    date window).  Every oracled window row must carry real rows."""
    assert QUERIES[name](spark, SF).limit(1).count() > 0, (
        f"{name} returns 0 rows at sf0.001 — its oracle match is vacuous"
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_row_at_a_time_python_in_any_registered_plan(spark, name):
    """Global hot-path guarantee: NO registered query plans a
    row-at-a-time Python UDF (BatchEvalPython).  Python appears only as
    Arrow-vectorized stages (ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas / MapInArrow) where binary decode or matmul
    genuinely needs it — the 10-100x UDF cliff stays structurally
    impossible to reintroduce anywhere in the registry."""
    plan = _plan(QUERIES[name](spark, SF))
    assert "BatchEvalPython" not in plan, (
        f"{name} plans a row-at-a-time Python UDF"
    )
