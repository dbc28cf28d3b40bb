"""Per-group sequential kernels via applyInPandas (SURVEY.md §2.5 W9-W11, §2.10 M4).

The reference's heart is `for country: for state:` Python loops over
date-sorted slices (covid_data_transform.py:204-237,
covid_simulator.py:158-240, weather_pred.py:352-374). Here each loop
body becomes a pandas kernel with a pinned output StructType, shipped
to executors over Arrow by `groupBy(keys).applyInPandas` — one task
per group cluster, embarrassingly parallel, no driver loop.

Kernels sort by (ts, event_id) as their first line (deterministic
group ordering, SURVEY.md §4.3); groups here are single-user event
series — thousands of rows at most — so per-task memory is bounded
regardless of corpus scale.

These recurrences are not SQL-expressible → no DuckDB oracle
(rows-only driver check); exact-parity pytest + hypothesis property
tests in tests/test_kernels.py are the correctness gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from engage_spark.io import table
from engage_spark.registry import query

# ---------------------------------------------------------------------------
# W9 — sequential gap interpolation (covid_data_transform.py:204-237)


def interpolate_series(vals: pd.Series) -> pd.Series:
    """Reference 'interpolation' recurrence, exact semantics
    (covid_data_transform.py:204-237; duplicated weather_pred.py:210-235).

    NOTE it is really a smoothing pass: the reference's interior branch
    has NO NaN guard on the current value, so EVERY interior value is
    overwritten, left to right:

      - all-NaN series → all zeros
      - endpoints: NaN → 0.0, else kept raw
      - every interior i: v[i] = (v[i-1] + next_raw) / 2, where v[i-1]
        is the ALREADY-REWRITTEN previous value and next_raw is the
        untouched original right neighbour; if next_raw is NaN,
        v[i] = v[i-1] / 2
    """
    v = vals.to_numpy(dtype="float64", copy=True)
    n = len(v)
    if n == 0:
        return pd.Series(v)
    if np.isnan(v).all():
        return pd.Series(np.zeros(n))
    for i in range(n):
        if i == 0 or i == n - 1:
            if np.isnan(v[i]):
                v[i] = 0.0
        else:
            nxt = vals.iloc[i + 1]  # raw right neighbour, may be NaN
            if pd.isna(nxt):
                v[i] = v[i - 1] / 2.0
            else:
                v[i] = (v[i - 1] + float(nxt)) / 2.0
    return pd.Series(v)


_INTERP_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value_filled", T.DoubleType()),
    ]
)


def _interp_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"])
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"].to_numpy(),
            "event_id": pdf["event_id"].to_numpy(),
            "value_filled": interpolate_series(pdf["value_gapped"]).to_numpy(),
        }
    )


@query("k_w9_interpolate", oracle=None, covers=["W9", "U3"])
def k_w9_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap interpolation over per-user event series. The kernel output
    IS the union the reference builds by appending per-group results in
    a loop (U3, covid_data_transform.py:233) — accumulate-union is
    eliminated, not ported. Gaps are synthesized
    deterministically (every event_id ≡ 0 mod 7 masked) so the kernel
    has real work; the recurrence itself matches the reference exactly
    (see interpolate_series)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.pmod("event_id", F.lit(7)) == 0, None)
        .otherwise(F.col("value"))
        .alias("value_gapped"),
    )
    return ev.groupBy("user_id").applyInPandas(_interp_kernel, _INTERP_SCHEMA)


# ---------------------------------------------------------------------------
# W10/M4 — discrete SIR recurrence (covid_simulator.py:158-240)


def sir_simulate(
    n_steps: int, population: float, i0: float, beta: float, gamma: float
) -> np.ndarray:
    """Discrete SIR: S' = -βSI/N, I' = βSI/N - γI, R' = γI.
    Returns (n_steps, 3) array of [S, I, R]. Pure numpy — the scipy
    odeint of the reference (covid_simulator.py:123-154) is unavailable
    in this container; the reference itself ships this discrete variant
    (covid_simulator.py:198-212)."""
    out = np.empty((n_steps, 3))
    s, i, r = population - i0, i0, 0.0
    for t in range(n_steps):
        out[t] = (s, i, r)
        new_inf = beta * s * i / population
        new_rec = gamma * i
        s, i, r = s - new_inf, i + new_inf - new_rec, r + new_rec
    return out


_SIR_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("step", T.IntegerType()),
        T.StructField("susceptible", T.DoubleType()),
        T.StructField("infected", T.DoubleType()),
        T.StructField("removed", T.DoubleType()),
    ]
)

_SIR_STEPS = 60
_SIR_POP = 10_000.0


def _sir_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"])
    v = pdf["value"].to_numpy(dtype="float64")
    # per-group parameters estimated from the series (R0-style ratio of
    # positive increases, covid_simulator.py:396-409), clamped to sane
    # epidemic ranges so the recurrence stays stable
    dv = np.diff(v[: min(len(v), 30)])
    pos = dv[dv > 0].sum()
    neg = -dv[dv < 0].sum()
    gamma = 0.1
    r0 = pos / neg if neg > 0 else 2.0
    beta = float(np.clip(r0 * gamma, 0.01, 1.0))
    i0 = max(float(v[0]) if len(v) else 1.0, 1.0)
    sim = sir_simulate(_SIR_STEPS, _SIR_POP, i0, beta, gamma)
    uid = pdf["user_id"].iloc[0]
    return pd.DataFrame(
        {
            "user_id": np.full(_SIR_STEPS, uid),
            "step": np.arange(_SIR_STEPS, dtype="int32"),
            "susceptible": sim[:, 0],
            "infected": sim[:, 1],
            "removed": sim[:, 2],
        }
    )


@query("k_m4_sir_simulate", oracle=None, covers=["W10", "M4"])
def k_m4_sir_simulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group discrete SIR simulation: parameters fitted from each
    user's series, 60-step recurrence inside the kernel. One Arrow task
    per group — the reference's serial `for state:` loop
    (covid_simulator.py:261-330) parallelized across executors."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    return ev.groupBy("user_id").applyInPandas(_sir_kernel, _SIR_SCHEMA)


# ---------------------------------------------------------------------------
# W11/M3 — recursive multi-step forecast (weather_pred.py:352-374)


def ar_fit_forecast(series: np.ndarray, order: int, horizon: int) -> np.ndarray:
    """Deterministic AR(p) by least squares + recursive multi-step
    forecast, feeding each prediction back into the window — the same
    loop shape as the reference's LSTM forecast (weather_pred.py:352-374)
    with a hermetic model (no TF in this container; SURVEY.md §7.3 M3:
    parity is schema+contract, not bitwise)."""
    x = series.astype("float64")
    if len(x) <= order + 1:
        last = x[-1] if len(x) else 0.0
        return np.full(horizon, last)
    # design matrix of trailing windows
    rows = len(x) - order
    X = np.empty((rows, order + 1))
    X[:, 0] = 1.0
    for j in range(order):
        X[:, j + 1] = x[j : j + rows]
    y = x[order:]
    # tiny RELATIVE ridge: noise-free periodic series make X'X exactly
    # singular, where plain lstsq can return a min-norm solution whose
    # recursion diverges; 1e-8-scale shrinkage is invisible on real
    # data but pins the solution deterministically
    xtx = X.T @ X
    lam = 1e-8 * (np.trace(xtx) / xtx.shape[0] + 1.0)
    coef = np.linalg.solve(xtx + lam * np.eye(xtx.shape[0]), X.T @ y)
    # recursion guard: the reference's tanh LSTM output is bounded by
    # construction; bound the AR recursion to a generous envelope of
    # the observed range so a marginal root can't overflow 180 steps out
    lo, hi = float(x.min()), float(x.max())
    span = max(hi - lo, 1.0)
    lo_b, hi_b = lo - 5 * span, hi + 5 * span
    hist = list(x[-order:])
    out = np.empty(horizon)
    for t in range(horizon):
        pred = coef[0] + float(np.dot(coef[1:], hist))
        pred = min(max(pred, lo_b), hi_b)
        out[t] = pred
        hist = hist[1:] + [pred]  # recursive: prediction feeds the window
    return out


_FC_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("step", T.IntegerType()),
        T.StructField("pred", T.DoubleType()),
    ]
)

_FC_ORDER = 7
_FC_HORIZON = 30


def _forecast_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"])
    preds = ar_fit_forecast(pdf["value"].to_numpy(), _FC_ORDER, _FC_HORIZON)
    uid = pdf["user_id"].iloc[0]
    return pd.DataFrame(
        {
            "user_id": np.full(_FC_HORIZON, uid),
            "step": np.arange(_FC_HORIZON, dtype="int32"),
            "pred": preds,
        }
    )


@query("k_w11_ar_forecast", oracle=None, covers=["W11", "M3"])
def k_w11_ar_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group train → recursive-forecast kernel (the reference's
    per-location LSTM stage re-expressed): AR(7) fit per user, 30-step
    recursive forecast, one Arrow task per group. Swap ar_fit_forecast
    for a Keras kernel behind the same schema in a GPU environment."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    return ev.groupBy("user_id").applyInPandas(_forecast_kernel, _FC_SCHEMA)
