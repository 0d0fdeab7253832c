"""A7 error-budget tests."""

import pandas as pd
import pytest


def _proc_factory(bad_ids):
    def process(pdf):
        ok = ~pdf["doc_id"].isin(bad_ids)
        out = pdf[ok][["doc_id"]].copy()
        out["status"] = "ok"
        return out, int((~ok).sum())

    return process


class TestErrorBudget:
    def test_under_budget_passes(self, spark):
        from overmatch_spark.operators.errors import run_with_error_budget

        df = spark.createDataFrame(pd.DataFrame({"doc_id": range(100)}))
        res, n_err = run_with_error_budget(
            spark, df, _proc_factory(set(range(5))),
            "doc_id long, status string", max_errors=10,
        )
        assert n_err == 5
        assert res.count() == 95

    def test_over_budget_aborts(self, spark):
        from overmatch_spark.operators.errors import (
            ErrorBudgetExceeded,
            run_with_error_budget,
        )

        df = spark.createDataFrame(pd.DataFrame({"doc_id": range(300)}))
        with pytest.raises((ErrorBudgetExceeded, Exception)):
            run_with_error_budget(
                spark, df, _proc_factory(set(range(200))),
                "doc_id long, status string", max_errors=100,
            )
