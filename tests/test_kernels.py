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
# Batch-vectorized kernel twins (the mapInPandas cores of the oracled
# registered queries — must match the scalar semantic references)


def test_sir_discrete_batch_matches_scalar_bitwise():
    from engage_spark.queries.kernels import sir_discrete_batch

    beta = np.array([0.3, 0.05, 1.0])
    i0 = np.array([10.0, 1.0, 250.0])
    batch = sir_discrete_batch(beta, 0.1, i0, 10_000.0, 60)
    for b in range(3):
        scalar = sir_simulate(60, 10_000.0, float(i0[b]), float(beta[b]), 0.1)
        # bit-identical, not just close: the batch form is the same
        # left-to-right expression per element (the oracle-parity claim)
        assert (batch[b] == scalar).all(), b


def test_levinson_matches_toeplitz_solve():
    from engage_spark.queries.kernels import levinson_durbin_batch

    # WELL-CONDITIONED autocovariance sequence (geometric decay, the
    # AR(1) shape; cond(T) ~ 9): Levinson-Durbin must agree with a
    # direct Toeplitz solve to within the deterministic 1e-6 E0
    # stabilizer's effect (which scales with cond(T) — a near-singular
    # T legitimately diverges from the unstabilized solve)
    r = np.array([[100.0 * 0.5**k for k in range(8)]])
    a = levinson_durbin_batch(r)[0]
    T = np.array([[r[0, abs(i - j)] for j in range(7)] for i in range(7)])
    direct = np.linalg.solve(T, r[0, 1:8])
    assert np.allclose(a, direct, rtol=1e-4, atol=1e-6)


def test_yw_constant_series_forecasts_mean():
    from engage_spark.queries.kernels import (
        ar_forecast_recursion_batch,
        levinson_durbin_batch,
    )

    # constant series: all deviations 0 → all autocovariances 0 →
    # coefficients 0 → the forecast is exactly mu
    r = np.zeros((1, 8))
    a = levinson_durbin_batch(r)
    assert (a == 0).all()
    h = np.zeros((1, 7))
    preds = ar_forecast_recursion_batch(
        a, h, np.array([7.5]), np.array([2.5]), np.array([12.5]), 10
    )
    assert (preds == 7.5).all()


def test_ar_forecast_recursion_clamps_to_bounds():
    from engage_spark.queries.kernels import ar_forecast_recursion_batch

    # explosive coefficient: predictions must saturate at hi_b, not blow up
    a = np.array([[2.0, 0, 0, 0, 0, 0, 0]], dtype="float64")
    h = np.array([[5.0, 0, 0, 0, 0, 0, 0]], dtype="float64")
    preds = ar_forecast_recursion_batch(
        a, h, np.array([10.0]), np.array([0.0]), np.array([40.0]), 30
    )
    assert preds.max() <= 40.0 and np.isfinite(preds).all()


# ---------------------------------------------------------------------------
# Spark-side: kernels through applyInPandas match local pandas execution


@pytest.mark.parametrize("qname", ["k_w9_interpolate", "k_m4_sir_simulate", "k_m4b_sir_continuous",
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


# ---------------------------------------------------------------------------
# M4b continuous SIR (odeint semantics; RK4 fallback without scipy)


def _euler_transcription(n_steps, pop, i0, r0, alpha, beta, z, substeps=20000):
    """Literal tiny-step Euler integration of the reference's mysysfunc
    RHS (covid_simulator.py:124-143) — the independent oracle for the
    RK4 path."""
    from engage_spark.queries.kernels import sir_rhs

    y = np.empty((n_steps, 3))
    cur = np.array([pop - i0 - r0, i0, r0], dtype="float64")
    y[0] = cur
    for k in range(1, n_steps):
        h = 1.0 / substeps
        s = float(k - 1)
        for _ in range(substeps):
            cur = cur + h * np.asarray(sir_rhs(cur, s, alpha, beta, pop, z))
            s += h
        y[k] = cur
    return np.where(y < 0, 0, y)


def test_continuous_sir_matches_euler_transcription():
    from engage_spark.queries.kernels import sir_solve_continuous

    z = np.concatenate([np.zeros(5), np.full(15, 2.0)])  # step forcing
    got = sir_solve_continuous(20, 10_000.0, 50.0, 0.0, 0.35, 0.1, z)
    want = _euler_transcription(20, 10_000.0, 50.0, 0.0, 0.35, 0.1, z)
    assert np.allclose(got, want, rtol=1e-4, atol=1e-3)


def test_continuous_sir_conserves_population_before_clamp():
    from engage_spark.queries.kernels import sir_solve_continuous

    z = np.zeros(30)
    y = sir_solve_continuous(30, 10_000.0, 10.0, 0.0, 0.3, 0.1, z)
    # with zero forcing nothing goes negative, so conservation is exact
    assert np.allclose(y.sum(axis=1), 10_000.0, rtol=1e-9)


def test_continuous_sir_forcing_suppresses_epidemic():
    from engage_spark.queries.kernels import sir_solve_continuous

    z0 = sir_solve_continuous(30, 10_000.0, 100.0, 0.0, 0.3, 0.1, np.zeros(30))
    zf = sir_solve_continuous(30, 10_000.0, 100.0, 0.0, 0.3, 0.1, np.full(30, 1.0))
    # the z1 term drains infected directly (the reference's intervention
    # covariate), damping transmission: more susceptibles never infected
    assert zf[-1, 1] < z0[-1, 1]
    assert zf[-1, 0] > z0[-1, 0]


def test_continuous_sir_clamps_negative_to_zero():
    from engage_spark.queries.kernels import odeint_compat, sir_rhs, sir_solve_continuous

    # forcing larger than the infected pool drives I negative in the raw
    # integration (the reference's RHS has no floor; only the post-hoc
    # np.where clamp fixes signs, covid_simulator.py:152)
    z = np.full(15, 2.0)
    t = np.arange(15, dtype="float64")
    raw = odeint_compat(
        lambda h, s: sir_rhs(h, s, 0.2, 0.1, 1000.0, z), [995.0, 5.0, 0.0], t
    )
    assert raw.min() < 0  # the quirk is real...
    y = sir_solve_continuous(15, 1_000.0, 5.0, 0.0, 0.2, 0.1, z)
    assert (y >= 0).all() and np.isfinite(y).all()  # ...and clamped


# ---------------------------------------------------------------------------
# M3 LSTM stub: the guarded optional-dependency path


def test_lstm_kernel_raises_cleanly_without_tensorflow():
    from engage_spark.queries.kernels import lstm_fit_forecast

    try:
        import tensorflow  # noqa: F401

        pytest.skip("tensorflow present; stub path not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="tensorflow"):
        lstm_fit_forecast(np.arange(50.0), 7, 5)


def test_forecast_kernel_factory_default_is_ar():
    from engage_spark.queries.kernels import forecast_kernel_fn

    pdf = pd.DataFrame(
        {
            "user_id": np.ones(40, dtype="int64"),
            "event_id": np.arange(40),
            "ts": pd.date_range("2024-01-01", periods=40),
            "value": np.linspace(1, 40, 40),
        }
    )
    out = forecast_kernel_fn(use_lstm=False)(pdf)
    assert list(out.columns) == ["user_id", "step", "pred"]
    assert len(out) == 30
    direct = ar_fit_forecast(pdf["value"].to_numpy(), 7, 30)
    assert np.allclose(out["pred"].to_numpy(), direct)


def test_batch_integrator_matches_scalar_solver():
    """sir_integrate_batch (the vectorized mapInPandas core) must agree
    with sir_solve_continuous (the scalar odeint-compat twin) system by
    system."""
    from engage_spark.queries.kernels import sir_integrate_batch, sir_solve_continuous

    alpha = np.array([0.2, 0.35, 0.01])
    beta = np.array([0.1, 0.1, 0.1])
    i0 = np.array([5.0, 100.0, 1.0])
    z = np.array([0.0, 2.0, 5.0])
    batch = sir_integrate_batch(alpha, beta, i0, z, 10_000.0, 25)
    for b in range(3):
        scalar = sir_solve_continuous(
            25, 10_000.0, float(i0[b]), 0.0, float(alpha[b]), float(beta[b]),
            np.full(25, z[b]),
        )
        assert np.allclose(batch[b], scalar, rtol=1e-9, atol=1e-9), b


def test_sir_query_matches_scalar_reference_path(spark, sf_dir):
    """End-to-end parity of the registered k_m4_sir_simulate against
    the SCALAR reference path: fit per user with _sir_fit_params, round
    beta like the query does, run sir_simulate — the JVM window fit +
    batch-vectorized recurrence must reproduce it."""
    from engage_spark.queries.kernels import _sir_fit_params
    from engage_spark.registry import load_all

    got = (
        load_all()["k_m4_sir_simulate"].fn(spark, sf_dir).toPandas()
        .sort_values(["user_id", "step"]).reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    exp = []
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        beta, gamma, i0 = _sir_fit_params(g["value"].to_numpy("float64"))
        beta = round(beta + 1e-9, 6)
        sim = sir_simulate(60, 10_000.0, i0, beta, gamma)
        exp.append(
            pd.DataFrame(
                {
                    "user_id": uid,
                    "step": np.arange(60, dtype="int32"),
                    "susceptible": sim[:, 0],
                    "infected": sim[:, 1],
                    "removed": sim[:, 2],
                }
            )
        )
    expdf = (
        pd.concat(exp).sort_values(["user_id", "step"]).reset_index(drop=True)
    )
    for c in ("susceptible", "infected", "removed"):
        # 1e-5: JVM vs numpy float-sum order can nudge beta's pre-round
        # value across a 6dp boundary in principle; values themselves
        # are rounded to 6dp by the query
        assert np.allclose(got[c], expdf[c].round(6), atol=1e-4), c


# ---------------------------------------------------------------------------
# Property tests for the oracled kernel math (round 7)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.floats(-1e3, 1e3, allow_nan=False), min_size=8, max_size=120)
)
def test_yw_pipeline_is_finite_and_clamped_on_any_series(vals):
    """The registered W11 math end-to-end on arbitrary series: rounded
    autocovariances -> Levinson-Durbin -> clamped recursion must stay
    finite and inside the documented [lo-5*span, hi+5*span] envelope —
    the guarantee that lets the forecast run unsupervised per group at
    any corpus scale."""
    from engage_spark.queries.kernels import (
        ar_forecast_recursion_batch,
        levinson_durbin_batch,
    )

    x = np.asarray(vals, dtype="float64")
    mu = round(float(x.mean()) + 1e-9, 6)
    dev = x - mu
    r = np.array(
        [[round(float((dev[: len(dev) - k] * dev[k:]).sum()) + 1e-9, 6)
          for k in range(8)]]
    )
    a = levinson_durbin_batch(r)
    assert np.isfinite(a).all()
    lo, hi = float(x.min()), float(x.max())
    span = max(hi - lo, 1.0)
    h = np.array([[float(d) for d in dev[::-1][:7]]])
    if h.shape[1] < 7:
        h = np.pad(h, ((0, 0), (0, 7 - h.shape[1])))
    preds = ar_forecast_recursion_batch(
        a, h, np.array([mu]), np.array([lo - 5 * span]),
        np.array([hi + 5 * span]), 30,
    )
    assert np.isfinite(preds).all()
    assert (preds >= lo - 5 * span - 1e-9).all()
    assert (preds <= hi + 5 * span + 1e-9).all()


@settings(max_examples=100, deadline=None)
@given(
    beta=st.floats(0.01, 1.0),
    i0=st.floats(1.0, 5000.0),
)
def test_sir_discrete_batch_stays_finite(beta, i0):
    from engage_spark.queries.kernels import sir_discrete_batch

    sim = sir_discrete_batch(
        np.array([beta]), 0.1, np.array([i0]), 10_000.0, 60
    )
    assert np.isfinite(sim).all()
    # population is conserved exactly by the update's telescoping sums
    assert np.allclose(sim.sum(axis=2), 10_000.0)


def test_numpy_lstm_contract_and_determinism():
    """The hermetic LSTM kernel honors the forecast contract (horizon
    outputs, recursion bounded to the observed range by the tanh head)
    and is bit-deterministic across runs (fixed seed/epochs)."""
    import numpy as np

    from engage_spark.queries.kernels import numpy_lstm_fit_forecast

    rng = np.random.RandomState(3)
    series = np.sin(np.linspace(0, 12, 200)) * 10 + 25 + rng.randn(200) * 0.1
    a = numpy_lstm_fit_forecast(series, 7, 30)
    b = numpy_lstm_fit_forecast(series, 7, 30)
    assert a.shape == (30,)
    assert np.array_equal(a, b), "fixed-seed LSTM fit is not deterministic"
    lo, hi = series.min(), series.max()
    assert (a >= lo - 1e-9).all() and (a <= hi + 1e-9).all(), (
        "tanh head must bound predictions to the observed range"
    )
    # degenerate short series: last-value fallback like the AR kernel
    short = numpy_lstm_fit_forecast(np.array([5.0, 6.0]), 7, 4)
    assert np.array_equal(short, np.full(4, 6.0))


def test_numpy_lstm_monotone_series_sanity():
    """On a clean monotone ramp the LSTM forecast must keep moving in
    the ramp's direction from the last observed level (within the tanh
    bound), not collapse toward the series mean."""
    import numpy as np

    from engage_spark.queries.kernels import numpy_lstm_fit_forecast

    series = np.linspace(0.0, 100.0, 240)
    preds = numpy_lstm_fit_forecast(series, 7, 10)
    assert preds[0] > 75.0, (
        f"first forecast {preds[0]:.1f} fell far below the ramp's end"
    )
    assert (np.diff(preds[:5]) > -5.0).all(), "forecast immediately crashed"


def test_k_w11b_matches_ar_twin_contract(spark, sf_dir):
    """k_w11b_lstm_forecast mirrors k_w11_ar_forecast's contract:
    same schema, 30 steps per group, same group set, finite values."""
    from engage_spark.registry import load_all

    reg = load_all()
    lstm = reg["k_w11b_lstm_forecast"].fn(spark, sf_dir)
    ar = reg["k_w11_ar_forecast"].fn(spark, sf_dir)
    assert [f.name for f in lstm.schema.fields] == [
        f.name for f in ar.schema.fields
    ]
    import pyspark.sql.functions as F

    g = lstm.groupBy("user_id").count().collect()
    assert all(r["count"] == 30 for r in g)
    assert {r.user_id for r in g} == {
        r.user_id for r in ar.select("user_id").distinct().collect()
    }
    bad = lstm.filter(F.isnan("pred") | F.col("pred").isNull()).count()
    assert bad == 0
