"""agg_linear_regression must agree with an independent OLS fit —
the oracle gate only proves Spark==DuckDB on the shared formula, so
this pins that the formula IS ordinary least squares."""

import numpy as np


def test_ols_matches_numpy(spark, sf_dir, tables):
    from algebraicdb_spark.operators.aggregates import agg_linear_regression

    got = {r["flag"]: r for r in agg_linear_regression(spark, sf_dir).collect()}
    pdf = tables["lineitem"].select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        x, y = grp["l_quantity"].to_numpy(), grp["l_extendedprice"].to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        assert abs(got[flag]["slope"] - slope) < 1e-2 * max(1, abs(slope))
        assert abs(got[flag]["intercept"] - intercept) < 1e-2 * max(1, abs(intercept))
        assert abs(got[flag]["r2"] - r * r) < 1e-3
        assert got[flag]["n_rows"] == len(grp)
