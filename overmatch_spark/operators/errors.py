"""Error budget (SURVEY.md A7).

The reference tolerates per-row failures but aborts the whole run
after >100 of them (/root/reference/scripts/match.py:464-469). The
distributed translation: per-row failures are captured (not thrown)
inside the Arrow batch and counted AS DATA — an `_n_err` column
carried on the output rows — so the abort decision is exactly-once by
construction (task retries, speculation, and cache recomputation
replace, never double-count, a partition's rows; a Spark accumulator
would over-count under any of those). A task-local fail-fast still
aborts early when a single task's input is systematically broken.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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

    def gen(batches):
        local = 0
        for pdf in batches:
            out, n_err = process_batch(pdf)
            if n_err:
                local += n_err
                if local > max_errors:
                    # mirror the reference's sequential abort
                    raise ErrorBudgetExceeded(
                        f"more than {max_errors} row errors in one task"
                    )
            # errors ride the data: the batch's count on its first row
            # (or on a payload-free carrier row if the batch produced
            # none) — summing the column is exactly-once because it is
            # recomputed WITH the rows on any retry
            out = out.assign(_n_err=0, _carrier=False)
            if n_err:
                if len(out):
                    out.iloc[0, out.columns.get_loc("_n_err")] = n_err
                else:
                    carrier = pd.DataFrame(
                        {c: [None] for c in out.columns}
                    )
                    carrier["_n_err"] = n_err
                    carrier["_carrier"] = True
                    out = carrier
            yield out

    tagged = df.mapInPandas(
        gen, f"{out_schema}, _n_err int, _carrier boolean"
    ).cache()
    n_err = tagged.agg(F.sum("_n_err")).collect()[0][0] or 0
    if n_err > max_errors:
        tagged.unpersist()
        raise ErrorBudgetExceeded(
            f"{n_err} row errors exceeded budget of {max_errors}"
        )
    result = tagged.filter(~F.col("_carrier")).drop("_n_err", "_carrier")
    return result, n_err
