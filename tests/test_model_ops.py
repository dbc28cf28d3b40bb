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
