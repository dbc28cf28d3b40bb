"""Per-group sequential kernels via applyInPandas (SURVEY.md §2.5 W9-W11, §2.10 M4).

The reference's heart is `for country: for state:` Python loops over
date-sorted slices (covid_data_transform.py:204-237,
covid_simulator.py:158-240, weather_pred.py:352-374). Here each loop
body becomes a pandas kernel with a pinned output StructType, shipped
to executors over Arrow — embarrassingly parallel, no driver loop.
Registered queries batch groups with `grouped_series` (collect_list →
mapInPandas: one Python call per Arrow batch, measured ~2x faster than
per-group applyInPandas at 1500 groups); the applyInPandas twins remain
for the pipeline modules and as the semantic reference.

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
    raw = vals.to_numpy(dtype="float64")  # untouched right neighbours
    n = len(v)
    if n == 0:
        return pd.Series(v)
    if np.isnan(v).all():
        return pd.Series(np.zeros(n))
    # plain-float loop (no pandas .iloc in the recurrence: ~7x faster on
    # 100k rows, bit-identical — the operation order (v[i-1] + nxt) / 2
    # is unchanged, which the hypothesis parity test pins down)
    nxt_nan = np.isnan(raw)
    if np.isnan(v[0]):
        v[0] = 0.0
    for i in range(1, n - 1):
        if nxt_nan[i + 1]:
            v[i] = v[i - 1] / 2.0
        else:
            v[i] = (v[i - 1] + raw[i + 1]) / 2.0
    if n > 1 and np.isnan(v[n - 1]):
        v[n - 1] = 0.0
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


def grouped_series(df: DataFrame, key: str, payload: list[str]) -> DataFrame:
    """Collapse a (key, ts, event_id, payload...) event table to one row
    per group carrying the date-sorted series as an array<struct>.

    This is the batching half of the kernel pattern: applyInPandas pays
    one Python call + pandas frame per GROUP (measured ~2x the total
    kernel wall-clock at 1500 groups/100k rows), while collect_list +
    mapInPandas pays one call per Arrow BATCH with the same shuffle
    volume and the same per-group memory bound (one group's series must
    fit either way). Sort order inside sort_array is struct-lexicographic
    (ts, event_id, ...) — (ts, event_id) is a unique key, so payload
    nulls never decide placement."""
    return df.groupBy(key).agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", *payload))).alias(
            "series"
        )
    )


def _interp_batches(batches):
    for pdf in batches:
        outs = []
        for uid, series in zip(pdf["user_id"], pdf["series"]):
            ev_ids = np.fromiter((s["event_id"] for s in series), dtype="int64")
            vals = pd.Series(
                [s["value_gapped"] for s in series], dtype="float64"
            )
            outs.append(
                pd.DataFrame(
                    {
                        "user_id": np.full(len(ev_ids), uid),
                        "event_id": ev_ids,
                        "value_filled": interpolate_series(vals).to_numpy(),
                    }
                )
            )
        if outs:
            yield pd.concat(outs)


@query(
    "k_w9_interpolate",
    # The W9 recurrence is LINEAR (y_i = (y_{i-1} + nxt_i)/2 with
    # nxt_i = coalesce(x_{i+1}, 0); endpoints coalesce(x, 0) raw), so
    # like the EWMA it has a closed form a SQL window can compute:
    #   y_i = y_1·2^{-(i-1)} + 2^{-(i+1)} · Σ_{j=2..i} nxt_j·2^j
    # The 2^j/2^-i split keeps the inner term a plain prefix sum; the
    # dynamic range stays far inside float64 for driver-testdata
    # series lengths (≤ ~90 events/user at sf0.01; 2^92 ≪ 1e308), and
    # terms that underflow the sum are exactly the ones the sequential
    # recurrence has already rounded away relative to y_i. Both sides
    # nudge+round to 6dp (binary-exact .5 boundaries).
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS x
        FROM events
    ), o AS (
        SELECT user_id, event_id, ts, x,
               row_number() OVER w AS rn,
               count(*) OVER (PARTITION BY user_id) AS n,
               coalesce(first_value(x) OVER w, 0.0) AS y1,
               coalesce(lead(x) OVER w, 0.0) AS nxt
        FROM g
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, event_id, x, rn, n, y1,
               sum(CASE WHEN rn >= 2 THEN nxt * pow(2.0, rn) ELSE 0.0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS s2
        FROM o
    )
    SELECT user_id, event_id,
           round(CASE
               WHEN rn = 1 OR rn = n THEN coalesce(x, 0.0)
               ELSE y1 * pow(0.5, rn - 1) + s2 * pow(0.5, rn + 1)
           END + 1e-9, 6) AS value_filled
    FROM s
    """,
    covers=["W9", "U3"],
)
def k_w9_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap interpolation over per-user event series. The kernel output
    IS the union the reference builds by appending per-group results in
    a loop (U3, covid_data_transform.py:233) — accumulate-union is
    eliminated, not ported. Gaps are synthesized
    deterministically (every event_id ≡ 0 mod 7 masked) so the kernel
    has real work; the recurrence itself matches the reference exactly
    (see interpolate_series) and is EXECUTED by the kernel — the
    closed-form oracle above exists because the recurrence is linear,
    giving this kernel a full driver hash check instead of rows-only.
    Series are batched via grouped_series → mapInPandas (many groups
    per Python call; see grouped_series)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.pmod("event_id", F.lit(7)) == 0, None)
        .otherwise(F.col("value"))
        .alias("value_gapped"),
    )
    out = grouped_series(ev, "user_id", ["value_gapped"]).mapInPandas(
        _interp_batches, _INTERP_SCHEMA
    )
    return out.select(
        "user_id",
        "event_id",
        F.round(F.col("value_filled") + F.lit(1e-9), 6).alias("value_filled"),
    )


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


def _sir_fit_params(v: np.ndarray) -> tuple[float, float, float]:
    """(beta, gamma, i0) from a sorted series — R0-style ratio of
    positive increases (covid_simulator.py:396-409), clamped stable."""
    dv = np.diff(v[: min(len(v), 30)])
    pos = dv[dv > 0].sum()
    neg = -dv[dv < 0].sum()
    gamma = 0.1
    r0 = pos / neg if neg > 0 else 2.0
    beta = float(np.clip(r0 * gamma, 0.01, 1.0))
    i0 = max(float(v[0]) if len(v) else 1.0, 1.0)
    return beta, gamma, i0


def _sir_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"])
    beta, gamma, i0 = _sir_fit_params(pdf["value"].to_numpy(dtype="float64"))
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


def _sir_batches(batches):
    for pdf in batches:
        outs = []
        for uid, series in zip(pdf["user_id"], pdf["series"]):
            v = np.fromiter((s["value"] for s in series), dtype="float64")
            beta, gamma, i0 = _sir_fit_params(v)
            sim = sir_simulate(_SIR_STEPS, _SIR_POP, i0, beta, gamma)
            outs.append(
                pd.DataFrame(
                    {
                        "user_id": np.full(_SIR_STEPS, uid),
                        "step": np.arange(_SIR_STEPS, dtype="int32"),
                        "susceptible": sim[:, 0],
                        "infected": sim[:, 1],
                        "removed": sim[:, 2],
                    }
                )
            )
        if outs:
            yield pd.concat(outs)


@query("k_m4_sir_simulate", oracle=None, covers=["W10", "M4"])
def k_m4_sir_simulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group discrete SIR simulation: parameters fitted from each
    user's series, 60-step recurrence inside the kernel — the
    reference's serial `for state:` loop (covid_simulator.py:261-330)
    parallelized across executors, batched via grouped_series →
    mapInPandas (many groups per Python call)."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    return grouped_series(ev, "user_id", ["value"]).mapInPandas(
        _sir_batches, _SIR_SCHEMA
    )


# ---------------------------------------------------------------------------
# M4 continuous variant — odeint SIR (covid_simulator.py:123-154 solve_one)


def sir_rhs(h, s, alpha, beta, n_pop, z_forcing):
    """Right-hand side of the reference's continuous SIR system, literal
    semantics of `mysysfunc` inside solve_one (covid_simulator.py:124-143):

      dS/dt = -(alpha/N)·S·I
      dI/dt =  (alpha/N)·S·I - beta·I - z1
      dR/dt =  z1 + beta·I

    where z1 is the covariate forcing term looked up at the *integer*
    time step tt = int(s), clamped to the last step — the reference
    indexes df[c_names[i]].values[tt] the same way. Conserves S+I+R.
    """
    tt = min(int(s), len(z_forcing) - 1)
    z1 = float(z_forcing[tt])
    s_, i_ = h[0], h[1]
    dsdt = -(alpha / n_pop) * s_ * i_
    didt = (alpha / n_pop) * s_ * i_ - beta * i_ - z1
    drdt = z1 + beta * i_
    return [dsdt, didt, drdt]


def odeint_compat(func, y0, t, substeps: int = 64) -> np.ndarray:
    """`scipy.integrate.odeint` when scipy is available, else classical
    RK4 with `substeps` fixed steps per output interval.

    Numerical delta of the fallback vs LSODA on the (smooth, non-stiff)
    SIR system: both are well inside 1e-6 relative at substeps=64 —
    asserted against a tiny-step Euler transcription in
    tests/test_kernels.py. The piecewise-constant z-forcing makes the
    RHS discontinuous at integer t; fixed-step RK4 lands exactly on
    those boundaries, which adaptive LSODA also handles (it was the
    reference's choice for the same RHS)."""
    try:  # pragma: no cover - scipy not shipped in this container
        from scipy.integrate import odeint

        return odeint(func, y0, t)
    except ImportError:
        pass
    y = np.empty((len(t), len(y0)))
    y[0] = y0
    cur = np.asarray(y0, dtype="float64")
    for k in range(1, len(t)):
        h = (t[k] - t[k - 1]) / substeps
        s = float(t[k - 1])
        for _ in range(substeps):
            k1 = np.asarray(func(cur, s))
            k2 = np.asarray(func(cur + 0.5 * h * k1, s + 0.5 * h))
            k3 = np.asarray(func(cur + 0.5 * h * k2, s + 0.5 * h))
            k4 = np.asarray(func(cur + h * k3, s + h))
            cur = cur + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            s += h
        y[k] = cur
    return y


def sir_solve_continuous(
    n_steps: int,
    population: float,
    i0: float,
    r0_init: float,
    alpha: float,
    beta: float,
    z_forcing: np.ndarray,
) -> np.ndarray:
    """Continuous SIR over integer output steps, with the reference's
    post-hoc negativity clamp (`np.where(y<0,0,y)`,
    covid_simulator.py:152)."""
    t = np.arange(n_steps, dtype="float64")
    h0 = [population - i0 - r0_init, i0, r0_init]
    y = odeint_compat(
        lambda h, s: sir_rhs(h, s, alpha, beta, population, z_forcing), h0, t
    )
    return np.where(y < 0, 0, y)


def sir_integrate_batch(
    alpha: np.ndarray,
    beta: np.ndarray,
    i0: np.ndarray,
    z_level: np.ndarray,
    n_pop: float,
    n_steps: int,
    substeps: int = 64,
) -> np.ndarray:
    """RK4-integrate MANY SIR systems simultaneously: state is a
    (B, 3) array, every RK4 stage is one numpy broadcast over the whole
    batch. Identical math to sir_solve_continuous with constant
    per-system forcing z_level — asserted equal in tests/test_kernels.py
    — but the interpreter cost is O(steps·substeps) regardless of how
    many groups ride in the batch (the per-group scalar loop paid it
    O(groups·steps·substeps): ~2M Python calls for 150 groups at
    sf0.01, ~4x more wall-clock). Returns (B, n_steps, 3), clamped >= 0
    like the reference (covid_simulator.py:152)."""
    B = len(alpha)
    s = n_pop - i0.astype("float64")
    i = i0.astype("float64")
    r = np.zeros(B)
    out = np.empty((B, n_steps, 3))

    def rhs(sv, iv):
        inf = (alpha / n_pop) * sv * iv
        return -inf, inf - beta * iv - z_level, z_level + beta * iv

    h = 1.0 / substeps
    for t in range(n_steps):
        out[:, t, 0], out[:, t, 1], out[:, t, 2] = s, i, r
        if t == n_steps - 1:
            break
        for _ in range(substeps):
            ds1, di1, dr1 = rhs(s, i)
            ds2, di2, dr2 = rhs(s + 0.5 * h * ds1, i + 0.5 * h * di1)
            ds3, di3, dr3 = rhs(s + 0.5 * h * ds2, i + 0.5 * h * di2)
            ds4, di4, dr4 = rhs(s + h * ds3, i + h * di3)
            s = s + (h / 6.0) * (ds1 + 2 * ds2 + 2 * ds3 + ds4)
            i = i + (h / 6.0) * (di1 + 2 * di2 + 2 * di3 + di4)
            r = r + (h / 6.0) * (dr1 + 2 * dr2 + 2 * dr3 + dr4)
    return np.where(out < 0, 0, out)


def _sir_batch_integrator(batches):
    for pdf in batches:
        if not len(pdf):
            continue
        sim = sir_integrate_batch(
            pdf["alpha"].to_numpy(),
            pdf["beta"].to_numpy(),
            pdf["i0"].to_numpy(),
            pdf["z_level"].to_numpy(),
            _SIR_POP,
            _SIR_STEPS,
        )
        B = len(pdf)
        yield pd.DataFrame(
            {
                "user_id": np.repeat(pdf["user_id"].to_numpy(), _SIR_STEPS),
                "step": np.tile(np.arange(_SIR_STEPS, dtype="int32"), B),
                "susceptible": sim[:, :, 0].ravel(),
                "infected": sim[:, :, 1].ravel(),
                "removed": sim[:, :, 2].ravel(),
            }
        )


@query("k_m4b_sir_continuous", oracle=None, covers=["M4", "W10"])
def k_m4b_sir_continuous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-time SIR via odeint semantics (the reference's LIVE
    runSimulator path, covid_simulator.py:123-154 + :244-330).

    Two stages, both scale-shaped: (1) per-group parameter fitting is
    pure JVM — a window pass computes first-value/positive-increase
    sums per user (no Python), reducing the event table to one 5-double
    row per group; (2) integration runs BATCH-VECTORIZED in mapInPandas
    (sir_integrate_batch): every RK4 stage is one numpy broadcast over
    all groups in the Arrow batch, so interpreter cost does not grow
    with group count — the property that matters at millions of groups.
    scipy.integrate.odeint replaces the RK4 core when importable
    (odeint_compat / sir_solve_continuous are the scalar twins used by
    the parity tests). Same _SIR_SCHEMA as the discrete k_m4 variant."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        (F.col("value") - F.lag("value").over(w)).alias("dv"),
    )
    params = seq.groupBy("user_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("v0"),
        F.sum(
            F.when((F.col("rn") <= 30) & (F.col("dv") > 0), F.col("dv")).otherwise(0.0)
        ).alias("pos"),
        F.sum(
            F.when((F.col("rn") <= 30) & (F.col("dv") < 0), -F.col("dv")).otherwise(0.0)
        ).alias("neg"),
        F.avg("value").alias("vmean"),
    )
    beta = F.lit(0.1)
    r0 = F.when(F.col("neg") > 0, F.col("pos") / F.col("neg")).otherwise(F.lit(2.0))
    fitted = params.select(
        "user_id",
        F.least(F.greatest(r0 * beta, F.lit(0.01)), F.lit(1.0)).alias("alpha"),
        beta.alias("beta"),
        F.greatest(F.coalesce(F.col("v0"), F.lit(1.0)), F.lit(1.0)).alias("i0"),
        # deterministic stand-in for the reference's gov-action forcing
        F.least(F.greatest(F.col("vmean"), F.lit(0.0)), F.lit(5.0)).alias("z_level"),
    )
    return fitted.mapInPandas(_sir_batch_integrator, _SIR_SCHEMA)


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


# default kernel (AR); the LSTM twin comes from forecast_kernel_fn below
def _forecast_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    return forecast_kernel_fn(use_lstm=False)(pdf)


def lstm_fit_forecast(
    series: np.ndarray, order: int, horizon: int
) -> np.ndarray:  # pragma: no cover - TF not in container
    """Keras/LSTM per-group forecast — the reference's actual model
    (weather_pred.py:108-116 generate_model: LSTM(50) → Dense(1, tanh),
    adam/mse; recursive multi-step loop weather_pred.py:352-374).
    Requires tensorflow, which this container does not ship; the tested
    hermetic default is ar_fit_forecast (same contract: series → horizon
    predictions, each fed back into the input window). Same guarded-
    optional-dependency pattern as multimodal.decode_image."""
    try:
        import tensorflow as tf  # noqa: F401
        from tensorflow.keras.layers import LSTM, Dense
        from tensorflow.keras.models import Sequential
    except ImportError as e:
        raise NotImplementedError(
            "LSTM forecast kernel needs tensorflow; container ships none — "
            "use ar_fit_forecast (the default in k_w11_ar_forecast)"
        ) from e
    x = series.astype("float32")
    lo, hi = float(x.min()), float(x.max())
    span = max(hi - lo, 1e-9)
    scaled = 2.0 * (x - lo) / span - 1.0  # tanh head wants [-1, 1]
    rows = len(scaled) - order
    X = np.stack([scaled[j : j + rows] for j in range(order)], axis=1)[..., None]
    y = scaled[order:]
    model = Sequential([LSTM(50, input_shape=(order, 1)), Dense(1, activation="tanh")])
    model.compile(optimizer="adam", loss="mse")
    model.fit(X, y, epochs=50, verbose=0)
    hist = list(scaled[-order:])
    out = np.empty(horizon)
    for t in range(horizon):
        pred = float(model.predict(np.array(hist)[None, :, None], verbose=0))
        out[t] = (pred + 1.0) / 2.0 * span + lo
        hist = hist[1:] + [pred]
    return out


def forecast_kernel_fn(use_lstm: bool = False):
    """Kernel factory: AR(7) default, Keras LSTM behind the flag (raises
    NotImplementedError without tensorflow)."""
    fit = lstm_fit_forecast if use_lstm else ar_fit_forecast

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        preds = fit(pdf["value"].to_numpy(), _FC_ORDER, _FC_HORIZON)
        uid = pdf["user_id"].iloc[0]
        return pd.DataFrame(
            {
                "user_id": np.full(_FC_HORIZON, uid),
                "step": np.arange(_FC_HORIZON, dtype="int32"),
                "pred": preds,
            }
        )

    return _kernel


def _forecast_batches(batches):
    for pdf in batches:
        outs = []
        for uid, series in zip(pdf["user_id"], pdf["series"]):
            v = np.fromiter((s["value"] for s in series), dtype="float64")
            preds = ar_fit_forecast(v, _FC_ORDER, _FC_HORIZON)
            outs.append(
                pd.DataFrame(
                    {
                        "user_id": np.full(_FC_HORIZON, uid),
                        "step": np.arange(_FC_HORIZON, dtype="int32"),
                        "pred": preds,
                    }
                )
            )
        if outs:
            yield pd.concat(outs)


@query("k_w11_ar_forecast", oracle=None, covers=["W11", "M3"])
def k_w11_ar_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group train → recursive-forecast kernel (the reference's
    per-location LSTM stage re-expressed): AR(7) fit per user, 30-step
    recursive forecast, batched via grouped_series → mapInPandas (many
    groups per Python call). The Keras model itself is available behind
    forecast_kernel_fn(use_lstm=True) in a TF environment
    (lstm_fit_forecast)."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    return grouped_series(ev, "user_id", ["value"]).mapInPandas(
        _forecast_batches, _FC_SCHEMA
    )
