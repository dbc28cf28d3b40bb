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

Every registered kernel query carries a FULL DuckDB oracle as of
round 7: each recurrence is a fixed sequence of +-*/ steps per
iteration, so a recursive CTE (or, for W9, a closed form) replays it
exactly once the float-order-sensitive fitted parameters are rounded
identically on both sides. The structure that makes this work is
two-stage: (1) parameter fitting / sufficient statistics in pure JVM
expressions, rounded 6dp; (2) the recurrence batch-vectorized in
mapInPandas with the same left-to-right IEEE expression order as the
generated SQL. Exact-parity pytest + hypothesis property tests in
tests/test_kernels.py additionally pin the scalar semantic references.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

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


def sir_discrete_batch(
    beta: np.ndarray, gamma: float, i0: np.ndarray, pop: float, n_steps: int
) -> np.ndarray:
    """Vectorized discrete SIR over B systems at once: state is (B,)
    arrays, each step one numpy broadcast — interpreter cost O(n_steps)
    regardless of group count (same batching argument as
    sir_integrate_batch). Per system BIT-IDENTICAL to sir_simulate
    (pytest-pinned): every update is the same left-to-right elementwise
    expression, so IEEE evaluation order per element is unchanged.
    Returns (B, n_steps, 3) of [S, I, R]."""
    s = pop - i0.astype("float64")
    i = i0.astype("float64")
    r = np.zeros(len(i))
    out = np.empty((len(i), n_steps, 3))
    for t in range(n_steps):
        out[:, t, 0], out[:, t, 1], out[:, t, 2] = s, i, r
        new_inf = beta * s * i / pop
        new_rec = gamma * i
        s, i, r = s - new_inf, i + new_inf - new_rec, r + new_rec
    return out


def _sir_discrete_param_batches(batches):
    for pdf in batches:
        if not len(pdf):
            continue
        sim = sir_discrete_batch(
            pdf["beta"].to_numpy("float64"),
            0.1,
            pdf["i0"].to_numpy("float64"),
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


@query(
    "k_m4_sir_simulate",
    # Full oracle (round 7; was rows-only): the discrete SIR step is
    # DETERMINISTIC ARITHMETIC per t, so a DuckDB recursive CTE replays
    # the exact recurrence — the same technique as the transitive-
    # closure oracle (llm_curation.py) and the W9 closed form. The
    # fitted beta is rounded to 6dp on BOTH sides before the recurrence
    # (float-sum order across engines differs at ~1e-12; rounding pins
    # the recurrence inputs bit-identically, after which both engines
    # run the same IEEE-double expression left-to-right), i0 is a raw
    # parquet value (exact in both engines). 60 steps * n_groups rows.
    oracle=f"""
    WITH RECURSIVE o AS (
        SELECT user_id, value,
               row_number() OVER w AS rn,
               value - lag(value) OVER w AS dv
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), p AS (
        SELECT user_id,
               sum(CASE WHEN rn <= 30 AND dv > 0 THEN dv ELSE 0.0 END) AS pos,
               sum(CASE WHEN rn <= 30 AND dv < 0 THEN -dv ELSE 0.0 END) AS neg,
               max(CASE WHEN rn = 1 THEN value END) AS v0
        FROM o GROUP BY user_id
    ), params AS (
        SELECT user_id,
               round(least(greatest(
                   CASE WHEN neg > 0 THEN pos / neg ELSE 2.0 END * 0.1,
                   0.01), 1.0) + 1e-9, 6) AS beta,
               greatest(coalesce(v0, 1.0), 1.0) AS i0
        FROM p
    ), sim AS (
        SELECT user_id, 0 AS step,
               {_SIR_POP} - i0 AS s, i0 AS i, 0.0::DOUBLE AS r, beta
        FROM params
        UNION ALL
        SELECT user_id, step + 1,
               s - beta * s * i / {_SIR_POP},
               i + beta * s * i / {_SIR_POP} - 0.1 * i,
               r + 0.1 * i,
               beta
        FROM sim WHERE step < {_SIR_STEPS - 1}
    )
    SELECT user_id, step,
           round(s + 1e-9, 6) AS susceptible,
           round(i + 1e-9, 6) AS infected,
           round(r + 1e-9, 6) AS removed
    FROM sim
    """,
    covers=["W10", "M4"],
)
def k_m4_sir_simulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group discrete SIR simulation — the reference's serial
    `for state:` loop (covid_simulator.py:261-330) over the discrete
    recurrence it ships at covid_simulator.py:198-212, parallelized.

    Two stages, both scale-shaped (restructured round 7 to earn a full
    driver hash check): (1) parameter fitting is pure JVM — one window
    pass computes first-value / positive-increase sums per user
    (_sir_fit_params semantics: beta = clip(r0*gamma, 0.01, 1), gamma
    0.1, i0 = max(v0, 1)), reducing the event table to one 3-double row
    per group, with beta ROUNDED to 6dp so the oracle's recurrence
    starts from bit-identical inputs; (2) the 60-step recurrence runs
    batch-vectorized in mapInPandas (sir_discrete_batch: every step one
    numpy broadcast over all groups in the Arrow batch — interpreter
    cost independent of group count). sir_simulate/_sir_fit_params
    remain the scalar semantic reference (pipelines + parity pytest)."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        (F.col("value") - F.lag("value").over(w)).alias("dv"),
    )
    p = seq.groupBy("user_id").agg(
        F.sum(
            F.when((F.col("rn") <= 30) & (F.col("dv") > 0), F.col("dv")).otherwise(0.0)
        ).alias("pos"),
        F.sum(
            F.when((F.col("rn") <= 30) & (F.col("dv") < 0), -F.col("dv")).otherwise(0.0)
        ).alias("neg"),
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("v0"),
    )
    r0 = F.when(F.col("neg") > 0, F.col("pos") / F.col("neg")).otherwise(F.lit(2.0))
    params = p.select(
        "user_id",
        F.round(
            F.least(F.greatest(r0 * F.lit(0.1), F.lit(0.01)), F.lit(1.0)) + F.lit(1e-9),
            6,
        ).alias("beta"),
        F.greatest(F.coalesce(F.col("v0"), F.lit(1.0)), F.lit(1.0)).alias("i0"),
    )
    out = params.mapInPandas(_sir_discrete_param_batches, _SIR_SCHEMA)
    return out.select(
        "user_id",
        "step",
        F.round(F.col("susceptible") + F.lit(1e-9), 6).alias("susceptible"),
        F.round(F.col("infected") + F.lit(1e-9), 6).alias("infected"),
        F.round(F.col("removed") + F.lit(1e-9), 6).alias("removed"),
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


def _rk4_oracle_sql(n_steps: int, substeps: int, pop: float) -> str:
    """Full DuckDB oracle for k_m4b_sir_continuous: the fixed-step RK4
    integrator replayed as a recursive CTE at SUBSTEP granularity
    (n_steps-1 x substeps iterations), the four stage derivatives
    computed in nested derived tables with the exact left-to-right
    expression order of sir_integrate_batch. h = 1/substeps is binary-
    exact (1/64), so every scalar literal folds to the same double the
    numpy kernel uses."""
    h = 1.0 / substeps
    assert h == 0.015625, "substeps must keep h binary-exact (see docstring)"

    def rhs(tag: str, sv: str, iv: str) -> str:
        return (
            f"-((alpha / {pop}) * {sv} * {iv}) AS ds{tag}, "
            f"(alpha / {pop}) * {sv} * {iv} - 0.1 * {iv} - z AS di{tag}, "
            f"z + 0.1 * {iv} AS dr{tag}"
        )

    return f"""
    WITH RECURSIVE o AS (
        SELECT user_id, value,
               row_number() OVER w AS rn,
               value - lag(value) OVER w AS dv
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), p AS (
        SELECT user_id,
               sum(CASE WHEN rn <= 30 AND dv > 0 THEN dv ELSE 0.0 END) AS pos,
               sum(CASE WHEN rn <= 30 AND dv < 0 THEN -dv ELSE 0.0 END) AS neg,
               max(CASE WHEN rn = 1 THEN value END) AS v0,
               avg(value) AS vmean
        FROM o GROUP BY user_id
    ), params AS (
        SELECT user_id,
               round(least(greatest(
                   CASE WHEN neg > 0 THEN pos / neg ELSE 2.0 END * 0.1,
                   0.01), 1.0) + 1e-9, 6) AS alpha,
               greatest(coalesce(v0, 1.0), 1.0) AS i0,
               round(least(greatest(vmean, 0.0), 5.0) + 1e-9, 6) AS z
        FROM p
    ), sim AS (
        SELECT user_id, alpha, z, 0 AS t, 0 AS k,
               {pop} - i0 AS s, i0 AS i, 0.0::DOUBLE AS r
        FROM params
        UNION ALL
        SELECT user_id, alpha, z,
               CASE WHEN k = {substeps - 1} THEN t + 1 ELSE t END,
               CASE WHEN k = {substeps - 1} THEN 0 ELSE k + 1 END,
               s + ({h} / 6.0) * (ds1 + 2.0 * ds2 + 2.0 * ds3 + ds4),
               i + ({h} / 6.0) * (di1 + 2.0 * di2 + 2.0 * di3 + di4),
               r + ({h} / 6.0) * (dr1 + 2.0 * dr2 + 2.0 * dr3 + dr4)
        FROM (
          SELECT *, {rhs("4", "s4", "i4")} FROM (
            SELECT *, s + {h} * ds3 AS s4, i + {h} * di3 AS i4 FROM (
              SELECT *, {rhs("3", "s3", "i3")} FROM (
                SELECT *, s + 0.5 * {h} * ds2 AS s3, i + 0.5 * {h} * di2 AS i3
                FROM (
                  SELECT *, {rhs("2", "s2", "i2")} FROM (
                    SELECT *, s + 0.5 * {h} * ds1 AS s2,
                           i + 0.5 * {h} * di1 AS i2 FROM (
                      SELECT *, {rhs("1", "s", "i")}
                      FROM sim WHERE t < {n_steps - 1}
        ))))))) stages
    )
    SELECT user_id, t AS step,
           round(CASE WHEN s < 0 THEN 0.0 ELSE s END + 1e-9, 6) AS susceptible,
           round(CASE WHEN i < 0 THEN 0.0 ELSE i END + 1e-9, 6) AS infected,
           round(CASE WHEN r < 0 THEN 0.0 ELSE r END + 1e-9, 6) AS removed
    FROM sim WHERE k = 0
    """


@query(
    "k_m4b_sir_continuous",
    # Full oracle (round 7; was rows-only — the last convertible one):
    # fixed-step RK4 is a FINITE sequence of +-*/ per substep, so the
    # whole integration unrolls into a recursive CTE the same way the
    # discrete k_m4 recurrence does; only the stage count differs
    # (59 x 64 substep iterations, 4 nested derived tables computing
    # the RK stages per iteration). Fitted alpha / z round to 6dp on
    # both sides; i0 is exact; after that both engines run the same
    # IEEE-double expressions left-to-right.
    oracle=_rk4_oracle_sql(_SIR_STEPS, 64, _SIR_POP),
    covers=["M4", "W10"],
)
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
        # alpha and z_level derive from float SUMS (order-sensitive
        # across engines) — rounded 6dp on both sides so the RK4
        # recursion starts from bit-identical inputs; i0 is a raw
        # parquet value (exact in both engines)
        F.round(
            F.least(F.greatest(r0 * beta, F.lit(0.01)), F.lit(1.0)) + F.lit(1e-9), 6
        ).alias("alpha"),
        beta.alias("beta"),
        F.greatest(F.coalesce(F.col("v0"), F.lit(1.0)), F.lit(1.0)).alias("i0"),
        # deterministic stand-in for the reference's gov-action forcing
        F.round(
            F.least(F.greatest(F.col("vmean"), F.lit(0.0)), F.lit(5.0)) + F.lit(1e-9),
            6,
        ).alias("z_level"),
    )
    out = fitted.mapInPandas(_sir_batch_integrator, _SIR_SCHEMA)
    return out.select(
        "user_id",
        "step",
        F.round(F.col("susceptible") + F.lit(1e-9), 6).alias("susceptible"),
        F.round(F.col("infected") + F.lit(1e-9), 6).alias("infected"),
        F.round(F.col("removed") + F.lit(1e-9), 6).alias("removed"),
    )


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


def numpy_lstm_fit_forecast(
    series: np.ndarray,
    order: int,
    horizon: int,
    hidden: int = 8,
    epochs: int = 80,
    lr: float = 0.25,
    seed: int = 7,
) -> np.ndarray:
    """Hermetic DETERMINISTIC LSTM forecast — the reference's actual
    M3 model family (weather_pred.py:108-116: LSTM -> Dense(1, tanh),
    mse; recursive multi-step loop :352-374) executing in-container
    with numpy only: a single-layer LSTM trained by full-batch
    gradient descent with hand-rolled BPTT, fixed-seed init and fixed
    epochs so every run is bit-reproducible (the Keras path,
    lstm_fit_forecast, stays behind its TF import guard for
    environments that have it). Same contract as ar_fit_forecast:
    series -> horizon predictions, each fed back into the window.

    The tanh head bounds scaled predictions to [-1, 1], i.e. raw
    predictions to the observed [lo, hi] — the recursion cannot
    diverge by construction (the property the AR kernel needs an
    explicit clamp envelope for)."""
    x = series.astype("float64")
    if len(x) <= order + 1:
        last = x[-1] if len(x) else 0.0
        return np.full(horizon, last)
    lo, hi = float(x.min()), float(x.max())
    span = max(hi - lo, 1e-9)
    s = 2.0 * (x - lo) / span - 1.0  # tanh head wants [-1, 1]
    rows = len(s) - order
    xw = np.stack([s[j : j + rows] for j in range(order)], axis=1)  # (N, T)
    y = s[order:]
    hdim = hidden
    rng = np.random.RandomState(seed)
    sc = 0.5 / np.sqrt(hdim)
    wx = rng.uniform(-sc, sc, (1, 4 * hdim))
    wh = rng.uniform(-sc, sc, (hdim, 4 * hdim))
    b = np.zeros(4 * hdim)
    b[hdim : 2 * hdim] = 1.0  # standard forget-gate bias init
    wy = rng.uniform(-sc, sc, hdim)
    by = 0.0

    def _sig(v: np.ndarray) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-v))

    def _forward(xb: np.ndarray):
        n = xb.shape[0]
        h = np.zeros((n, hdim))
        c = np.zeros((n, hdim))
        cache = []
        for t in range(xb.shape[1]):
            z = xb[:, t : t + 1] @ wx + h @ wh + b
            i = _sig(z[:, :hdim])
            f = _sig(z[:, hdim : 2 * hdim])
            g = np.tanh(z[:, 2 * hdim : 3 * hdim])
            o = _sig(z[:, 3 * hdim :])
            c_new = f * c + i * g
            cache.append((xb[:, t : t + 1], h, c, i, f, g, o, c_new))
            h = o * np.tanh(c_new)
            c = c_new
        u = h @ wy + by
        return np.tanh(u), u, h, cache

    for _ in range(epochs):
        yhat, u, h_t, cache = _forward(xw)
        n = len(y)
        du = (yhat - y) / n * (1.0 - np.tanh(u) ** 2)  # d(mse/2)/du
        g_wy = np.clip(h_t.T @ du, -1.0, 1.0)
        g_by = float(np.clip(du.sum(), -1.0, 1.0))
        dh = np.outer(du, wy)
        dc = np.zeros_like(dh)
        g_wx = np.zeros_like(wx)
        g_wh = np.zeros_like(wh)
        g_b = np.zeros_like(b)
        for t in reversed(range(order)):
            xt, h_prev, c_prev, i, f, g, o, c_new = cache[t]
            tc = np.tanh(c_new)
            do = dh * tc
            dc = dc + dh * o * (1.0 - tc**2)
            dz = np.concatenate(
                [
                    dc * g * i * (1.0 - i),
                    dc * c_prev * f * (1.0 - f),
                    dc * i * (1.0 - g**2),
                    do * o * (1.0 - o),
                ],
                axis=1,
            )
            g_wx += xt.T @ dz
            g_wh += h_prev.T @ dz
            g_b += dz.sum(axis=0)
            dh = dz @ wh.T
            dc = dc * f
        np.clip(g_wx, -1.0, 1.0, out=g_wx)
        np.clip(g_wh, -1.0, 1.0, out=g_wh)
        np.clip(g_b, -1.0, 1.0, out=g_b)
        wx -= lr * g_wx
        wh -= lr * g_wh
        b -= lr * g_b
        wy -= lr * g_wy
        by -= lr * g_by
    hist = list(s[-order:])
    out = np.empty(horizon)
    for t in range(horizon):
        pred, _, _, _ = _forward(np.array(hist)[None, :])
        p = float(pred[0])
        out[t] = (p + 1.0) / 2.0 * span + lo
        hist = hist[1:] + [p]  # recursive: prediction feeds the window
    return out


def forecast_kernel_fn(use_lstm: bool = False, model: str | None = None):
    """Kernel factory behind ONE contract (pdf sorted by ts ->
    (user_id, step, pred) rows). `model`: "ar" (default, OLS AR(7)),
    "lstm" (hermetic deterministic numpy LSTM — the reference's model
    family, in-container), or "keras_lstm" (the TF path; raises
    NotImplementedError without tensorflow). use_lstm=True is the
    pre-r11 spelling of model="keras_lstm"."""
    if model is None:
        model = "keras_lstm" if use_lstm else "ar"
    fit = {
        "ar": ar_fit_forecast,
        "lstm": numpy_lstm_fit_forecast,
        "keras_lstm": lstm_fit_forecast,
    }[model]

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


def levinson_durbin_batch(r: np.ndarray, k_clip: float = 0.9999) -> np.ndarray:
    """Yule-Walker AR(p) coefficients from autocovariances, Levinson-
    Durbin recursion VECTORIZED across B groups: r is (B, p+1) with
    r[:, 0] the zero-lag sum; returns (B, p) where column j-1 is the
    coefficient of the j-th most recent value. Every operation is a
    fixed left-to-right elementwise expression, so given bit-identical
    r both engines (this kernel and the unrolled SQL twin from
    _levinson_sql) produce bit-identical coefficients:

      E_0 = r_0 * 1.000001 + 1e-9          (keeps E > 0 for r_0 >= 0)
      k_m = clip((r_m - sum_{j<m} a_j r_{m-j}) / E_{m-1}, +-k_clip)
      a'_j = a_j - k_m a_{m-j};  a'_m = k_m;  E_m = E_{m-1} (1 - k_m^2)

    The reflection-coefficient clip bounds the recursion when rounding
    makes the (sum-based, unnormalized) autocovariance sequence
    slightly non-PSD — deterministic on both sides, so it cannot break
    parity."""
    B, p1 = r.shape
    p = p1 - 1
    a = np.zeros((B, p + 1))
    e = r[:, 0] * 1.000001 + 1e-9
    for m in range(1, p + 1):
        acc = np.zeros(B)
        for j in range(1, m):
            acc = acc + a[:, j] * r[:, m - j]
        k = (r[:, m] - acc) / e
        k = np.minimum(np.maximum(k, -k_clip), k_clip)
        new_a = a.copy()
        for j in range(1, m):
            new_a[:, j] = a[:, j] - k * a[:, m - j]
        new_a[:, m] = k
        a = new_a
        e = e * (1.0 - k * k)
    return a[:, 1:]


def ar_forecast_recursion_batch(
    a: np.ndarray,
    h: np.ndarray,
    mu: np.ndarray,
    lo_b: np.ndarray,
    hi_b: np.ndarray,
    horizon: int,
) -> np.ndarray:
    """Recursive multi-step AR forecast, vectorized across B groups:
    a is (B, p) coefficients, h is (B, p) the most-recent-first
    DEVIATIONS from mu, each prediction clamps to [lo_b, hi_b] and
    feeds back into the window (the reference's loop shape,
    weather_pred.py:352-374). Fixed left-to-right expression order —
    the bit-exact twin of the recursive-CTE oracle."""
    B, p = a.shape
    out = np.empty((B, horizon))
    for t in range(horizon):
        d = a[:, 0] * h[:, 0]
        for j in range(1, p):
            d = d + a[:, j] * h[:, j]
        pred = np.minimum(np.maximum(mu + d, lo_b), hi_b)
        out[:, t] = pred
        h = np.concatenate([(pred - mu)[:, None], h[:, :-1]], axis=1)
    return out


def _yw_forecast_batches(batches):
    for pdf in batches:
        if not len(pdf):
            continue
        r = np.stack(
            [pdf[f"r{k}"].to_numpy("float64") for k in range(_FC_ORDER + 1)], axis=1
        )
        h = np.stack(
            [pdf[f"h{j}"].to_numpy("float64") for j in range(1, _FC_ORDER + 1)], axis=1
        )
        a = levinson_durbin_batch(r)
        preds = ar_forecast_recursion_batch(
            a,
            h,
            pdf["mu"].to_numpy("float64"),
            pdf["lo_b"].to_numpy("float64"),
            pdf["hi_b"].to_numpy("float64"),
            _FC_HORIZON,
        )
        B = len(pdf)
        yield pd.DataFrame(
            {
                "user_id": np.repeat(pdf["user_id"].to_numpy(), _FC_HORIZON),
                "step": np.tile(np.arange(_FC_HORIZON, dtype="int32"), B),
                "pred": preds.ravel(),
            }
        )


def _levinson_sql(p: int) -> str:
    """The unrolled-CTE twin of levinson_durbin_batch: p chained CTE
    pairs (k_m, then the coefficient/E update), every expression the
    same left-to-right order as the numpy kernel."""
    parts = [
        "lv0 AS (SELECT *, r0 * 1.000001 + 1e-9 AS e0 FROM bounds)",
        "lv1 AS (SELECT *, least(greatest(r1 / e0, -0.9999), 0.9999) AS k1 FROM lv0)",
        "cf1 AS (SELECT *, k1 AS a1_1, e0 * (1.0 - k1 * k1) AS e1 FROM lv1)",
    ]
    for m in range(2, p + 1):
        acc = " + ".join(f"a{m-1}_{j} * r{m-j}" for j in range(1, m))
        parts.append(
            f"lv{m} AS (SELECT *, least(greatest((r{m} - ({acc})) / e{m-1}, "
            f"-0.9999), 0.9999) AS k{m} FROM cf{m-1})"
        )
        upd = ", ".join(
            f"a{m-1}_{j} - k{m} * a{m-1}_{m-j} AS a{m}_{j}" for j in range(1, m)
        )
        parts.append(
            f"cf{m} AS (SELECT *, {upd}, k{m} AS a{m}_{m}, "
            f"e{m-1} * (1.0 - k{m} * k{m}) AS e{m} FROM lv{m})"
        )
    return ",\n    ".join(parts)


def _yw_oracle_sql(p: int, horizon: int) -> str:
    """Full DuckDB oracle for k_w11_ar_forecast: windowed stats →
    unrolled Levinson-Durbin → recursive-CTE forecast recursion."""
    lags = ", ".join(f"lag(value, {k}) OVER w AS l{k}" for k in range(1, p + 1))
    rs = ", ".join(
        f"round(coalesce(sum((value - mu) * (l{k} - mu)), 0.0) + 1e-9, 6) AS r{k}"
        for k in range(1, p + 1)
    )
    hs = ", ".join(
        f"coalesce(max(CASE WHEN rnd = {j} THEN value END) - max(mu), 0.0) AS h{j}"
        for j in range(1, p + 1)
    )
    a = [f"a{p}_{j}" for j in range(1, p + 1)]
    hcols = [f"h{j}" for j in range(1, p + 1)]
    base_dot = " + ".join(f"{aj} * {hj}" for aj, hj in zip(a, hcols))
    step_terms = [f"{a[0]} * (pred - mu)"] + [
        f"{a[j]} * h{j}" for j in range(1, p)
    ]
    step_dot = " + ".join(step_terms)
    new_h = ", ".join(
        ["pred - mu AS h1"] + [f"h{j - 1} AS h{j}" for j in range(2, p + 1)]
    )
    carry = "mu, lo_b, hi_b, " + ", ".join(a)
    return f"""
    WITH RECURSIVE o AS (
        SELECT user_id, value,
               row_number() OVER wd AS rnd,
               round(avg(value) OVER (PARTITION BY user_id) + 1e-9, 6) AS mu,
               {lags}
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               wd AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
    ), stats AS (
        SELECT user_id, max(mu) AS mu,
               round(sum((value - mu) * (value - mu)) + 1e-9, 6) AS r0,
               {rs},
               min(value) AS lo, max(value) AS hi,
               {hs}
        FROM o GROUP BY user_id
    ), bounds AS (
        SELECT *, lo - 5.0 * greatest(hi - lo, 1.0) AS lo_b,
                  hi + 5.0 * greatest(hi - lo, 1.0) AS hi_b
        FROM stats
    ),
    {_levinson_sql(p)},
    fc AS (
        SELECT user_id, {carry}, {", ".join(hcols)},
               0 AS step,
               least(greatest(mu + ({base_dot}), lo_b), hi_b) AS pred
        FROM cf{p}
        UNION ALL
        SELECT user_id, {carry}, {new_h},
               step + 1,
               least(greatest(mu + ({step_dot}), lo_b), hi_b) AS pred
        FROM fc WHERE step < {horizon - 1}
    )
    SELECT user_id, step, round(pred + 1e-9, 6) AS pred FROM fc
    """


@query(
    "k_w11_ar_forecast",
    # Full oracle (round 7; was rows-only). The fit is Yule-Walker
    # AR(7) solved by Levinson-Durbin — chosen over the OLS fit of
    # ar_fit_forecast precisely because its linear algebra is a FIXED
    # sequence of +-*/ steps that unrolls into SQL (an 8x8 lstsq solve
    # does not). The autocovariance SUMS and the series mean are the
    # only float-order-sensitive quantities; both sides round them to
    # 6dp, after which Levinson-Durbin and the 30-step recursion are
    # bit-identical deterministic arithmetic (same left-to-right order
    # in the numpy kernel and the generated SQL).
    oracle=_yw_oracle_sql(_FC_ORDER, _FC_HORIZON),
    covers=["W11", "M3"],
)
def k_w11_ar_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group train → recursive-forecast kernel (the reference's
    per-location LSTM stage, weather_pred.py:352-374, re-expressed;
    SURVEY §7.3 M3: the model is a hermetic deterministic stand-in —
    here Yule-Walker AR(7), fully oracle-checkable; ar_fit_forecast
    keeps the OLS variant for the pipelines and
    forecast_kernel_fn(use_lstm=True) the Keras model for TF
    environments).

    Scale shape: (1) sufficient statistics are pure JVM — one window
    pass (lags 1..7 share a single Window operator) plus one group agg
    reduces the event table to ONE ~18-double row per group, the only
    shuffle; autocovariances and the mean are rounded to 6dp so the
    oracle recurses from bit-identical inputs; (2) Levinson-Durbin +
    the 30-step recursive forecast run batch-vectorized in mapInPandas
    (every step one numpy broadcast over all groups in the Arrow
    batch — interpreter cost O(p^2 + horizon*p) per batch regardless
    of group count)."""
    p, horizon = _FC_ORDER, _FC_HORIZON
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    # rnd (rank from the END) comes from count - row_number + 1 rather
    # than a descending-ordered window: exact integer arithmetic, and it
    # keeps every window function on ONE sort order (a desc window would
    # add a second sort to the stats pass — measured +0.2 s at sf0.1)
    o = ev.select(
        "user_id",
        "value",
        (
            F.count(F.lit(1)).over(wall) - F.row_number().over(w) + F.lit(1)
        ).alias("rnd"),
        F.round(F.avg("value").over(wall) + F.lit(1e-9), 6).alias("mu"),
        *[F.lag("value", k).over(w).alias(f"l{k}") for k in range(1, p + 1)],
    )
    dev = F.col("value") - F.col("mu")
    stats = o.groupBy("user_id").agg(
        F.max("mu").alias("mu"),
        F.round(F.sum(dev * dev) + F.lit(1e-9), 6).alias("r0"),
        *[
            F.round(
                F.coalesce(F.sum(dev * (F.col(f"l{k}") - F.col("mu"))), F.lit(0.0))
                + F.lit(1e-9),
                6,
            ).alias(f"r{k}")
            for k in range(1, p + 1)
        ],
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        *[
            F.coalesce(
                F.max(F.when(F.col("rnd") == j, F.col("value"))) - F.max("mu"),
                F.lit(0.0),
            ).alias(f"h{j}")
            for j in range(1, p + 1)
        ],
    )
    span = F.greatest(F.col("hi") - F.col("lo"), F.lit(1.0))
    params = stats.select(
        "user_id",
        "mu",
        *[f"r{k}" for k in range(p + 1)],
        (F.col("lo") - F.lit(5.0) * span).alias("lo_b"),
        (F.col("hi") + F.lit(5.0) * span).alias("hi_b"),
        *[f"h{j}" for j in range(1, p + 1)],
    )
    out = params.mapInPandas(_yw_forecast_batches, _FC_SCHEMA)
    return out.select(
        "user_id", "step", F.round(F.col("pred") + F.lit(1e-9), 6).alias("pred")
    )


@query(
    "k_w11b_lstm_forecast",
    # rows-only BY NATURE: the LSTM fit is 80 epochs of BPTT gradient
    # descent — deterministic (fixed seed/epochs, numpy only) but not
    # SQL-expressible. The pipeline it shares with k_w11_ar_forecast
    # (per-group series -> recursive 30-step feedback forecast, same
    # schema) is hash-verified there; this query's own guarantees are
    # pytest-pinned (test_kernels: contract parity with the AR twin,
    # determinism, tanh-bounded recursion, monotone-series sanity).
    oracle=None,
    covers=["M3", "W11"],
)
def k_w11b_lstm_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group LSTM train -> recursive forecast — the reference's
    ACTUAL M3 model family (weather_pred.py:108-116 LSTM(50) ->
    Dense(1, tanh), recursive loop :352-374) executing hermetically:
    numpy_lstm_fit_forecast is a fixed-seed single-layer LSTM with
    hand-rolled BPTT, so the model family is tested in-container
    rather than import-guarded (the Keras kernel stays available via
    forecast_kernel_fn(model='keras_lstm') for TF environments).

    Scale shape: one shuffle groups events by user_id; training is
    per-group inside applyInPandas (Arrow batches, numpy matmuls over
    all windows at once — each group's fit is independent, the
    embarrassingly parallel per-entity model pattern). Output contract
    identical to k_w11_ar_forecast: (user_id, step 0..29, pred)."""
    from pyspark.sql.pandas.functions import PandasUDFType  # noqa: F401

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    kernel = forecast_kernel_fn(model="lstm")
    return ev.groupBy("user_id").applyInPandas(kernel, _FC_SCHEMA)
