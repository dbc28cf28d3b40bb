"""Exact-parity and property tests for the applyInPandas kernels —
the correctness gate for the non-SQL-expressible recurrences
(driver only rows-checks these)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engage_spark.queries.kernels import (
    ar_fit_forecast,
    interpolate_series,
    sir_simulate,
)

# ---------------------------------------------------------------------------
# W9 interpolation — exact reference semantics


def test_interp_all_nan_becomes_zeros():
    out = interpolate_series(pd.Series([np.nan, np.nan, np.nan, np.nan]))
    assert out.tolist() == [0.0, 0.0, 0.0, 0.0]


def test_interp_is_a_smoothing_pass_not_nan_fill():
    # reference interior branch has no NaN guard: [10, 20, 10] → v1
    # overwritten with (10+10)/2 even though it wasn't missing
    out = interpolate_series(pd.Series([10.0, 20.0, 10.0]))
    assert out.tolist() == [10.0, 10.0, 10.0]


def test_interp_interior_gap_uses_prev_rewritten_and_next_raw():
    out = interpolate_series(pd.Series([2.0, np.nan, 4.0]))
    assert out.tolist() == [2.0, 3.0, 4.0]


def test_interp_left_to_right_recurrence_on_consecutive_values():
    # [8, NaN, NaN, 4]: v1 = 8/2 = 4 (next raw NaN), v2 = (4+4)/2 = 4
    out = interpolate_series(pd.Series([8.0, np.nan, np.nan, 4.0]))
    assert out.tolist() == [8.0, 4.0, 4.0, 4.0]
    # prev is the REWRITTEN value: [4, 1, 1, 8] → v1=(4+1)/2=2.5,
    # v2=(2.5+8)/2=5.25 — not the raw 1
    out2 = interpolate_series(pd.Series([4.0, 1.0, 1.0, 8.0]))
    assert out2.tolist() == [4.0, 2.5, 5.25, 8.0]


def test_interp_nan_endpoints_zeroed():
    out = interpolate_series(pd.Series([np.nan, 2.0, np.nan]))
    # v1 is interior: next raw is NaN → v0/2 = 0.0
    assert out.tolist() == [0.0, 0.0, 0.0]


def _reference_interp_oracle(vals: pd.Series) -> list[float]:
    """Literal transcription of the reference loop semantics
    (covid_data_transform.py:217-231) for property comparison."""
    import math

    col = vals.copy().reset_index(drop=True)
    if col.isnull().all():
        return col.fillna(0).tolist()
    for i in range(len(col)):
        if i == 0 or i == len(col) - 1:
            if math.isnan(col[i]):
                col.iloc[i] = 0
        else:
            previous_v = col.iloc[i - 1]
            next_v = col.iloc[i + 1]
            if math.isnan(next_v):
                col.iloc[i] = previous_v / 2
            else:
                col.iloc[i] = (previous_v + next_v) / 2
    return col.tolist()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),
        min_size=1,
        max_size=40,
    )
)
def test_interp_matches_reference_loop(vals):
    s = pd.Series([np.nan if v is None else v for v in vals], dtype="float64")
    out = interpolate_series(s)
    exp = _reference_interp_oracle(s)
    assert out.tolist() == pytest.approx(exp, nan_ok=True)
    # endpoints that were NaN are exactly 0; endpoints that weren't are raw
    if np.isnan(s.iloc[0]):
        assert out.iloc[0] == 0.0
    else:
        assert out.iloc[0] == s.iloc[0]


# ---------------------------------------------------------------------------
# SIR recurrence


def test_sir_conserves_population():
    sim = sir_simulate(100, 1000.0, 10.0, 0.3, 0.1)
    totals = sim.sum(axis=1)
    assert np.allclose(totals, 1000.0)


def test_sir_monotone_removed_and_susceptible():
    sim = sir_simulate(100, 1000.0, 10.0, 0.3, 0.1)
    assert (np.diff(sim[:, 2]) >= -1e-9).all()  # removed grows
    assert (np.diff(sim[:, 0]) <= 1e-9).all()  # susceptible shrinks


def test_sir_no_transmission_decays_exponentially():
    sim = sir_simulate(10, 1000.0, 100.0, 0.0, 0.5)
    assert np.allclose(sim[:, 1], 100.0 * 0.5 ** np.arange(10))


# ---------------------------------------------------------------------------
# AR recursive forecast


def test_ar_constant_series_forecasts_constant():
    preds = ar_fit_forecast(np.full(50, 7.5), order=7, horizon=10)
    assert np.allclose(preds, 7.5, atol=1e-6)


def test_ar_linear_trend_extrapolates():
    preds = ar_fit_forecast(np.arange(60, dtype="float64"), order=7, horizon=5)
    assert np.allclose(preds, [60, 61, 62, 63, 64], atol=1e-4)


def test_ar_short_series_falls_back_to_last_value():
    preds = ar_fit_forecast(np.array([3.0, 4.0]), order=7, horizon=3)
    assert preds.tolist() == [4.0, 4.0, 4.0]


def test_ar_deterministic():
    x = np.sin(np.arange(100) / 5.0) * 10
    a = ar_fit_forecast(x, 7, 20)
    b = ar_fit_forecast(x, 7, 20)
    assert (a == b).all()


# ---------------------------------------------------------------------------
# Spark-side: kernels through applyInPandas match local pandas execution


@pytest.mark.parametrize("qname", ["k_w9_interpolate", "k_m4_sir_simulate",
                                   "k_w11_ar_forecast"])
def test_kernel_queries_run_and_are_deterministic(spark, sf_dir, qname):
    from engage_spark.registry import load_all

    fn = load_all()[qname].fn
    a = fn(spark, sf_dir).toPandas()
    b = fn(spark, sf_dir).toPandas()
    key = sorted(a.columns)
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_spark_interp_matches_local_pandas(spark, sf_dir):
    from engage_spark.registry import load_all

    out = (
        load_all()["k_w9_interpolate"].fn(spark, sf_dir).toPandas()
        .sort_values(["user_id", "event_id"]).reset_index(drop=True)
    )
    # local oracle: same masking + same kernel, pure pandas
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["value_gapped"] = ev["value"].where(ev["event_id"] % 7 != 0)
    expected = []
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        expected.append(
            pd.DataFrame(
                {
                    "user_id": uid,
                    "event_id": g["event_id"].to_numpy(),
                    "value_filled": interpolate_series(g["value_gapped"]).to_numpy(),
                }
            )
        )
    exp = (
        pd.concat(expected)
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
