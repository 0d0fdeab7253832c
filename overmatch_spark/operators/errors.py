"""Error budget (SURVEY.md A7).

The reference tolerates per-row failures but aborts the whole run
after >100 of them (/root/reference/scripts/match.py:464-469). The
distributed translation: per-row failures are captured (not thrown)
inside the Arrow batch, counted through a Spark accumulator, and the
job-level guard aborts after the action if the global budget is
blown — plus a task-local fail-fast so a systematically-broken input
doesn't burn a full pass before aborting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ErrorBudgetExceeded(RuntimeError):
    pass


def run_with_error_budget(
    spark: SparkSession,
    df: DataFrame,
    process_batch,
    out_schema,
    max_errors: int = 100,
):
    """Apply `process_batch(pdf) -> (result_pdf, n_errors)` over Arrow
    batches via mapInPandas; materializes the result and raises
    ErrorBudgetExceeded if total errors exceed the budget.

    Returns (result DataFrame [materialized via cache], error_count).
    """
    acc = spark.sparkContext.accumulator(0)

    def gen(batches):
        local = 0
        for pdf in batches:
            out, n_err = process_batch(pdf)
            if n_err:
                local += n_err
                acc.add(n_err)
                if local > max_errors:
                    # mirror the reference's sequential abort
                    raise ErrorBudgetExceeded(
                        f"more than {max_errors} row errors in one task"
                    )
            yield out

    result = df.mapInPandas(gen, out_schema)
    result = result.cache()
    result.count()  # materialize so the accumulator is final
    if acc.value > max_errors:
        result.unpersist()
        raise ErrorBudgetExceeded(
            f"{acc.value} row errors exceeded budget of {max_errors}"
        )
    return result, acc.value
