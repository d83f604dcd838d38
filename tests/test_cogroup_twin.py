"""cogroup_reconcile: the registered JVM rank-match form must be
value-identical to the cogroup/applyInPandas kernel twin (the API-coverage
form), and its physical plan must contain no Python cogroup node."""
import os

from pdf_extractor_spark.operators.joins import (
    cogroup_reconcile_kernel,
    q_cogroup_reconcile,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_jvm_form_equals_cogroup_kernel(spark):
    jvm = q_cogroup_reconcile(spark, SF_DIR)
    twin = cogroup_reconcile_kernel(spark, SF_DIR)
    assert jvm.columns == twin.columns
    a = sorted(tuple(r) for r in jvm.collect())
    b = sorted(tuple(r) for r in twin.collect())
    assert a == b
    assert len(a) > 0


def test_registered_plan_is_all_jvm(spark):
    plan = q_cogroup_reconcile(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    # and the twin really is the cogroup shape
    twin_plan = cogroup_reconcile_kernel(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in twin_plan
