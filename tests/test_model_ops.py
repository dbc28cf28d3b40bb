"""Sanity tests for the ML operators (rows-only at the driver)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_glm_poisson_recovers_sane_coefficients(spark, sf_dir):
    from engage_spark.registry import load_all

    out = load_all()["m1_glm_poisson"].fn(spark, sf_dir).toPandas()
    coefs = dict(zip(out.coef_name, out.coef_value))
    assert "Intercept" in coefs and len(coefs) >= 3
    # quantity is ~uniform(1..50): log-mean intercept near log(25)
    assert 2.0 < coefs["Intercept"] < 4.0
    assert all(np.isfinite(v) for v in coefs.values())


def test_mixed_effects_shrinks_toward_fixed(spark, sf_dir):
    from engage_spark.registry import load_all

    out = load_all()["m2_mixed_effects"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    # one fixed effect shared by all groups
    assert out.fe_intercept.nunique() == 1 and out.fe_lag.nunique() == 1
    # random effects are centered-ish and bounded (ridge shrinkage)
    assert abs(out.re_lag.mean()) < 0.5
    # total = fixed + random, exactly
    pd.testing.assert_series_equal(
        out.intercept, out.fe_intercept + out.re_intercept,
        check_names=False,
    )


def test_mixed_effects_pooled_fit_matches_numpy(spark, sf_dir):
    """Stage-1 fixed effects must equal a local lstsq on the same rows."""
    from engage_spark.registry import load_all

    out = load_all()["m2_mixed_effects"].fn(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    ev["x"] = ev.groupby("user_id")["value"].shift(1).fillna(0.0)
    X = np.column_stack([np.ones(len(ev)), ev["x"].to_numpy()])
    fe, *_ = np.linalg.lstsq(X, ev["value"].to_numpy(), rcond=None)
    assert abs(out.fe_intercept.iloc[0] - fe[0]) < 1e-6
    assert abs(out.fe_lag.iloc[0] - fe[1]) < 1e-6


def test_govflags_glm_fits_all_eight_regressors(spark, sf_dir):
    from engage_spark.registry import load_all

    out = load_all()["m1b_glm_poisson_govflags"].fn(spark, sf_dir).toPandas()
    coefs = dict(zip(out.coef_name, out.coef_value))
    # intercept + d_temp + period_group + six policy flags
    assert set(coefs) == {
        "Intercept", "d_temp", "period_group", "CS", "ED", "GP", "NEBC", "OTH", "SAH"
    }
    assert all(np.isfinite(v) for v in coefs.values())
    # y = ceil(value+0.5), d_temp = value-50: strong positive covariate
    assert coefs["d_temp"] > 0
    # flags are independent hash bits uncorrelated with y -> near zero
    for fl in ["CS", "ED", "GP", "NEBC", "OTH", "SAH"]:
        assert abs(coefs[fl]) < 0.2, (fl, coefs[fl])


def test_gauss_solver_property_matches_numpy_on_spd():
    """Property: the fixed-order no-pivot elimination (_gauss_solve_py,
    the Python half of the oracle twin) solves ANY well-conditioned SPD
    system to numpy accuracy — the class every IRLS normal matrix
    belongs to."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from engage_spark.queries.model_ops import _gauss_solve_py

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.floats(-2, 2, allow_nan=False), min_size=30, max_size=30
        ),
        st.lists(
            st.floats(-3, 3, allow_nan=False), min_size=5, max_size=5
        ),
    )
    def check(mvals, bvals):
        m = np.array(mvals).reshape(5, 6)
        a = m @ m.T + np.eye(5)  # SPD, condition bounded by +I
        x = _gauss_solve_py(a.tolist(), list(bvals))
        want = np.linalg.solve(a, np.array(bvals))
        assert np.allclose(x, want, rtol=1e-9, atol=1e-9)

    check()


def test_m1b_chained_irls_matches_mllib_glm(spark, sf_dir):
    """The gov-flags fit must also BE the GLM: MLlib on the identical
    9-regressor design (md5 flag bits included) agrees to ~moment-
    rounding tolerance — pinning the Gaussian-elimination solver the
    9-wide design forced (Cramer would need 9! terms)."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GeneralizedLinearRegression
    from pyspark.sql import functions as F

    from engage_spark.io import table
    from engage_spark.queries.model_ops import _M1B_FLAGS
    from engage_spark.registry import load_all

    got = {
        r.coef_name: r.coef_value
        for r in load_all()["m1b_glm_poisson_govflags"]
        .fn(spark, sf_dir)
        .collect()
    }
    ev = table(spark, sf_dir, "events").select(
        F.ceil(F.col("value") + 0.5).cast("double").alias("label"),
        (F.col("value") - 50.0).alias("d_temp"),
        F.pmod(F.dayofmonth("ts"), F.lit(3)).cast("double").alias(
            "period_group"
        ),
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "|", F.lit(fl), F.col("user_id").cast("string")
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
            )
            .cast("double")
            .alias(fl)
            for fl in _M1B_FLAGS
        ],
    )
    feats = ["d_temp", "period_group", *_M1B_FLAGS]
    data = VectorAssembler(inputCols=feats, outputCol="features").transform(ev)
    model = GeneralizedLinearRegression(
        family="poisson", link="log", maxIter=50, regParam=0.0, tol=1e-10
    ).fit(data)
    want = dict(
        zip(feats, [float(c) for c in model.coefficients]),
        Intercept=float(model.intercept),
    )
    for k in got:
        assert abs(got[k] - want[k]) < 2e-3, (k, got[k], want[k])


def test_m1_chained_irls_matches_mllib_glm(spark, sf_dir):
    """The hash-oracled chained-IRLS fit must BE the Poisson GLM: MLlib
    GeneralizedLinearRegression on the identical design (assembled
    manually so the encoding matches: rf_a/rf_n, R baseline) must agree
    to ~the 6dp-moment-rounding tolerance."""
    import numpy as np
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GeneralizedLinearRegression
    from pyspark.sql import functions as F

    from engage_spark.io import table
    from engage_spark.registry import load_all

    got = {
        r.coef_name: r.coef_value
        for r in load_all()["m1_glm_poisson"].fn(spark, sf_dir).collect()
    }
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("label"),
        "l_discount",
        "l_tax",
        F.when(F.col("l_returnflag") == "A", 1.0).otherwise(0.0).alias("rf_a"),
        F.when(F.col("l_returnflag") == "N", 1.0).otherwise(0.0).alias("rf_n"),
    )
    data = VectorAssembler(
        inputCols=["l_discount", "l_tax", "rf_a", "rf_n"],
        outputCol="features",
    ).transform(li)
    model = GeneralizedLinearRegression(
        family="poisson", link="log", maxIter=50, regParam=0.0, tol=1e-10
    ).fit(data)
    want = dict(
        zip(
            ["l_discount", "l_tax", "rf_a", "rf_n"],
            [float(c) for c in model.coefficients],
        ),
        Intercept=float(model.intercept),
    )
    for k in got:
        assert abs(got[k] - want[k]) < 2e-3, (k, got[k], want[k])
    assert np.isfinite(list(got.values())).all()


def test_m1d_matches_numpy_irls_step(spark, sf_dir):
    """The Cramer-solved step must BE the IRLS step: from beta=0 the
    Poisson/log update is OLS of (y-1) on the design, so numpy lstsq
    over the raw (unrounded) data must agree to ~the moment-rounding
    tolerance."""
    import numpy as np

    from engage_spark.io import table
    from engage_spark.registry import load_all

    got = {
        r.coef_name: r.coef_value
        for r in load_all()["m1d_glm_irls_step"].fn(spark, sf_dir).collect()
    }
    pdf = table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_tax", "l_returnflag"
    ).toPandas()
    X = np.column_stack([
        np.ones(len(pdf)),
        pdf.l_discount.to_numpy(float),
        pdf.l_tax.to_numpy(float),
        (pdf.l_returnflag == "A").to_numpy(float),
        (pdf.l_returnflag == "N").to_numpy(float),
    ])
    z = pdf.l_quantity.to_numpy(float) - 1.0
    names = ["Intercept", "l_discount", "l_tax", "rf_a", "rf_n"]

    # (1) solver correctness: numpy solve over the SAME 6dp-rounded
    # moments must match the Cramer expansion almost exactly
    A_r = np.round(X.T @ X / len(pdf) + 1e-9, 6)
    b_r = np.round(X.T[:, :] @ z[:, None] / len(pdf) + 1e-9, 6).ravel()
    # the query derives X'z means from rounded m_y* minus rounded m_*;
    # rebuild them the same way for an apples-to-apples solve
    y = pdf.l_quantity.to_numpy(float)
    m = lambda v: float(np.round(v.mean() + 1e-9, 6))  # noqa: E731
    b_r = np.array([
        m(y) - 1.0,
        m(y * X[:, 1]) - m(X[:, 1]),
        m(y * X[:, 2]) - m(X[:, 2]),
        m(y * X[:, 3]) - m(X[:, 3]),
        m(y * X[:, 4]) - m(X[:, 4]),
    ])
    beta_r = np.linalg.solve(A_r, b_r)
    for n, b in zip(names, beta_r):
        assert abs(got[n] - b) < 1e-4, f"{n}: {got[n]} vs rounded-solve {b}"

    # (2) raw-data sanity: the step IS the OLS of (y-1) on X — the 6dp
    # moment rounding amplifies through the solve's conditioning, so
    # the raw comparison is loose
    beta, *_ = np.linalg.lstsq(X, z, rcond=None)
    for n, b in zip(names, beta):
        assert abs(got[n] - b) < 0.05, f"{n}: {got[n]} vs numpy {b}"
