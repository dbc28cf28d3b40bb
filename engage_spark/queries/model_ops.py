"""ML / statistical operators (SURVEY.md §2.10, M1-M2, M5-M8).

M5-M7 are pure window/agg pipelines → oracle-checked. M1 (GLM) runs on
MLlib's GeneralizedLinearRegression. M2 (mixed effects) has no MLlib
equivalent and statsmodels is absent from this container, so it is a
two-stage estimator whose heavy pass is fully distributed: fixed
effects from normal equations (X'X, X'y accumulated as Spark
aggregates — one shuffle of a handful of doubles regardless of row
count), then per-group ridge-shrunk random effects via applyInPandas.
Output contract matches the reference's per-state coefficient table
(recover_coefs.csv; covid_simulator.py:488-502).
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

_ORD = "ORDER BY ts, event_id"


def _w(*keys):
    return Window.partitionBy(*keys).orderBy("ts", "event_id")


# ---------------------------------------------------------------------------
# M5 — R0 estimation (covid_simulator.py:384-446)


@query(
    "m5_r0_estimation",
    oracle=f"""
    WITH d AS (
        SELECT user_id,
               value - lag(value) OVER (PARTITION BY user_id {_ORD}) AS dv,
               row_number() OVER (PARTITION BY user_id {_ORD}) AS rn
        FROM events
    ), per_grp AS (
        SELECT user_id,
               sum(CASE WHEN dv > 0 THEN dv ELSE 0 END) AS pos,
               sum(CASE WHEN dv < 0 THEN -dv ELSE 0 END) AS neg
        FROM d WHERE rn <= 30 GROUP BY user_id
    ), raw AS (
        SELECT user_id,
               CASE WHEN neg > 0 THEN (pos + neg) / neg ELSE 0.0 END AS r0_raw
        FROM per_grp
    )
    SELECT user_id,
           round(CASE WHEN r0_raw > 0 THEN r0_raw
                 ELSE (SELECT avg(r0_raw) FROM raw WHERE r0_raw > 0) END, 6)
               AS r0
    FROM raw
    """,
    covers=["M5", "W7"],
)
def m5_r0_estimation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R0 per group, reference formula shape (covid_simulator.py:
    411-413): rho = (numerator + denominator) / denominator over the
    positive increases of the first 30 rows; zero/undefined ratios
    filled with the global mean of the positive ones (:445-446). The
    global mean joins back as a broadcast scalar — no second shuffle
    of the big table."""
    ev = table(spark, sf_dir, "events")
    w = _w("user_id")
    d = ev.select(
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("dv"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= 30)
    per_grp = d.groupBy("user_id").agg(
        F.sum(F.when(F.col("dv") > 0, F.col("dv")).otherwise(0.0)).alias("pos"),
        F.sum(F.when(F.col("dv") < 0, -F.col("dv")).otherwise(0.0)).alias("neg"),
    )
    raw = per_grp.select(
        "user_id",
        F.when(F.col("neg") > 0, (F.col("pos") + F.col("neg")) / F.col("neg"))
        .otherwise(0.0)
        .alias("r0_raw"),
    )
    mean_pos = raw.filter(F.col("r0_raw") > 0).agg(
        F.avg("r0_raw").alias("fill")
    )
    return raw.crossJoin(F.broadcast(mean_pos)).select(
        "user_id",
        F.round(
            F.when(F.col("r0_raw") > 0, F.col("r0_raw")).otherwise(F.col("fill")), 6
        ).alias("r0"),
    )


# ---------------------------------------------------------------------------
# M6 — bias correction (covid_simulator.py:520-561)


@query(
    "m6_bias_correction",
    oracle=f"""
    WITH p AS (
        SELECT user_id, event_id, value,
               coalesce(lag(value) OVER (PARTITION BY user_id {_ORD}), 0.0) AS pred
        FROM events
    ), b AS (
        SELECT user_id, avg(pred - value) AS bias FROM p GROUP BY user_id
    )
    SELECT p.user_id, p.event_id,
           round((CASE WHEN b.bias > 0 THEN p.pred - b.bias
                      WHEN b.bias < 0 THEN p.pred + b.bias
                      ELSE p.pred END) + 1e-9, 6) AS pred_adj
    FROM p JOIN b ON p.user_id = b.user_id
    """,
    covers=["M6", "A4"],
)
def m6_bias_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-residual bias per group, reference branches verbatim
    (covid_simulator.py:526-536): bias>0 → pred-bias, bias<0 →
    pred+bias — both branches subtract |bias| (the negative branch
    moves predictions AWAY from actuals; reference quirk preserved).
    Naive lag-1 prediction stands in for the simulator output."""
    ev = table(spark, sf_dir, "events")
    p = ev.select(
        "user_id",
        "event_id",
        "value",
        F.coalesce(F.lag("value").over(_w("user_id")), F.lit(0.0)).alias("pred"),
    )
    b = p.groupBy("user_id").agg(F.avg(F.col("pred") - F.col("value")).alias("bias"))
    return p.join(b, on="user_id").select(
        "user_id",
        "event_id",
        F.round(
            F.when(F.col("bias") > 0, F.col("pred") - F.col("bias"))
            .when(F.col("bias") < 0, F.col("pred") + F.col("bias"))
            .otherwise(F.col("pred"))
            + 1e-9,  # nudge off exact .5 ulp boundaries (rounding-mode parity)
            6,
        ).alias("pred_adj"),
    )


# ---------------------------------------------------------------------------
# M7 — train/holdout split by date flag (covid_simulator.py:377,450-454)


@query(
    "m7_train_holdout_split",
    oracle="""
    SELECT user_id,
           sum(CASE WHEN ts >= TIMESTAMP '2024-06-01' THEN 1 ELSE 0 END)::BIGINT
               AS holdout_rows,
           sum(CASE WHEN ts < TIMESTAMP '2024-06-01' THEN 1 ELSE 0 END)::BIGINT
               AS train_rows
    FROM events GROUP BY user_id
    """,
    covers=["M7", "P8"],
)
def m7_train_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holdout flag by date cutoff + per-group split sizes."""
    ev = table(spark, sf_dir, "events")
    hold = F.when(F.col("ts") >= "2024-06-01", 1).otherwise(0)
    return ev.groupBy("user_id").agg(
        F.sum(hold).cast("long").alias("holdout_rows"),
        F.sum(1 - hold).cast("long").alias("train_rows"),
    )


# ---------------------------------------------------------------------------
# M1 — GLM Poisson regression (covid_simulator.py:76-94) via MLlib


@query("m1_glm_poisson", oracle=None, covers=["M1"])
def m1_glm_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson GLM on lineitem (quantity ~ discount + tax + returnflag),
    MLlib GeneralizedLinearRegression — the distributed replacement for
    statsmodels GLM (covid_simulator.py:76-94: IRLS over the cluster,
    coefficient table out). Deterministic given fixed data → rows-only
    check plus pytest assertions on coefficient sanity."""
    from pyspark.ml.feature import RFormula
    from pyspark.ml.regression import GeneralizedLinearRegression

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("qty"),
        "l_discount",
        "l_tax",
        "l_returnflag",
    )
    data = RFormula(
        formula="qty ~ l_discount + l_tax + l_returnflag",
        featuresCol="features",
        labelCol="label",
    ).fit(li).transform(li)
    model = GeneralizedLinearRegression(
        family="poisson", link="log", maxIter=25, regParam=0.0
    ).fit(data)
    names = ["l_discount", "l_tax"] + [
        f"l_returnflag_{v}" for v in ["first", "second"]
    ]
    rows = [("Intercept", float(model.intercept))] + [
        (n, float(c)) for n, c in zip(names, model.coefficients)
    ]
    return spark.createDataFrame(rows, ["coef_name", "coef_value"]).select(
        "coef_name", F.round("coef_value", 6).alias("coef_value")
    )


@query("m1b_glm_poisson_govflags", oracle=None, covers=["M1"])
def m1b_glm_poisson_govflags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's test_gov_covid GLM variant
    (covid_simulator.py:104-119): Poisson regression with a battery of
    binary policy-flag regressors (`CS+ED+GP+NEBC+OTH+SAH`) alongside a
    continuous covariate and a period term. Here the six flags are
    synthesized deterministically from event attributes (hash-bit per
    flag name — the capability under test is the multi-flag design
    matrix + IRLS, not the COVID csv), then MLlib
    GeneralizedLinearRegression fits the same formula shape. Dead code
    in the reference; implemented as a capability per SURVEY §2.10."""
    from pyspark.ml.feature import RFormula
    from pyspark.ml.regression import GeneralizedLinearRegression

    flags = ["CS", "ED", "GP", "NEBC", "OTH", "SAH"]
    ev = table(spark, sf_dir, "events").select(
        F.ceil(F.col("value") + 0.5).cast("double").alias("y"),  # positive count
        (F.col("value") - 50.0).alias("d_temp"),
        F.pmod(F.dayofmonth("ts"), F.lit(3)).cast("double").alias("period_group"),
        *[
            F.pmod(F.xxhash64(F.lit(fl), F.col("user_id")), F.lit(2))
            .cast("double")
            .alias(fl)
            for fl in flags
        ],
    )
    data = RFormula(
        formula="y ~ d_temp + period_group + " + " + ".join(flags),
        featuresCol="features",
        labelCol="label",
    ).fit(ev).transform(ev)
    model = GeneralizedLinearRegression(
        family="poisson", link="log", maxIter=25, regParam=0.0
    ).fit(data)
    names = ["d_temp", "period_group", *flags]
    rows = [("Intercept", float(model.intercept))] + [
        (n, float(c)) for n, c in zip(names, model.coefficients)
    ]
    return spark.createDataFrame(rows, ["coef_name", "coef_value"]).select(
        "coef_name", F.round("coef_value", 6).alias("coef_value")
    )


# ---------------------------------------------------------------------------
# M2 — mixed-effects (random intercept + slope by group)

_COEF_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("fe_intercept", T.DoubleType()),
        T.StructField("fe_lag", T.DoubleType()),
        T.StructField("re_intercept", T.DoubleType()),
        T.StructField("re_lag", T.DoubleType()),
        T.StructField("intercept", T.DoubleType()),
        T.StructField("lag_coef", T.DoubleType()),
    ]
)


@query("m2_mixed_effects", oracle=None, covers=["M2"])
def m2_mixed_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage mixed-effects estimator (endog value ~ 1 + lag_value,
    random intercept+slope by user): statsmodels MixedLM is unavailable
    here, so stage 1 gets the fixed effects from normal equations whose
    X'X / X'y sums are Spark aggregates (the 100 TB-safe pass: the big
    table reduces to five doubles), and stage 2 fits ridge-shrunk
    per-group OLS on residuals inside applyInPandas. Output schema
    mirrors recover_coefs.csv (covid_simulator.py:488-502):
    total coefficient = fixed + random per group."""
    ev = table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.col("value").alias("y"),
        F.coalesce(F.lag("value").over(_w("user_id")), F.lit(0.0)).alias("x"),
    )
    # stage 1: pooled OLS via distributed moment sums. The collect below
    # is bounded by construction: a global agg returns EXACTLY ONE row of
    # five doubles no matter the input size (the 100 TB table reduces
    # map-side; only partials cross the wire) — this is a scalar fetch,
    # not a table collect.
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).collect()[0]
    xtx = np.array([[m.n, m.sx], [m.sx, m.sxx]], dtype="float64")
    xty = np.array([m.sy, m.sxy], dtype="float64")
    fe = np.linalg.solve(xtx, xty)  # [intercept, lag coef]
    fe_i, fe_l = float(fe[0]), float(fe[1])

    lam = 10.0  # ridge shrinkage toward the fixed effect

    def _re_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x"].to_numpy("float64")
        resid = pdf["y"].to_numpy("float64") - (fe_i + fe_l * x)
        X = np.column_stack([np.ones_like(x), x])
        A = X.T @ X + lam * np.eye(2)
        re = np.linalg.solve(A, X.T @ resid)
        uid = pdf["user_id"].iloc[0]
        return pd.DataFrame(
            [
                {
                    "user_id": uid,
                    "fe_intercept": fe_i,
                    "fe_lag": fe_l,
                    "re_intercept": float(re[0]),
                    "re_lag": float(re[1]),
                    "intercept": fe_i + float(re[0]),
                    "lag_coef": fe_l + float(re[1]),
                }
            ]
        )

    return d.groupBy("user_id").applyInPandas(_re_kernel, _COEF_SCHEMA)


# ---------------------------------------------------------------------------
# M8 — scenario simulation + before/after compare (covid_simulator.py:599-628)


@query(
    "m8_scenario_compare",
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_id, ts, value,
               coalesce(lag(value) OVER (PARTITION BY user_id {_ORD}), 0.0) AS lagv
        FROM events
    ), before AS (
        SELECT user_id, event_id, value + 0.5 * lagv AS pred FROM base
    ), after AS (
        SELECT user_id, event_id,
               value + 0.5 * CASE WHEN ts >= TIMESTAMP '2024-06-01' THEN 0.0
                                  ELSE lagv END AS pred
        FROM base
    )
    SELECT b.user_id, b.event_id,
           round(b.pred, 6) AS pred_before,
           round(a.pred, 6) AS pred_after,
           round(a.pred - b.pred, 6) AS effect
    FROM before b JOIN after a
      ON b.user_id = a.user_id AND b.event_id = a.event_id
    """,
    covers=["M8", "J5"],
)
def m8_scenario_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scenario compare: the same model evaluated with an intervention
    signal zeroed after a cutoff (covid_simulator.py:249-250,599-628),
    then a self-join on the run keys with before/after suffixes and the
    effect diff. Both scenario branches come off one cached base scan."""
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.coalesce(F.lag("value").over(_w("user_id")), F.lit(0.0)).alias("lagv"),
    )
    before = base.select(
        "user_id", "event_id",
        (F.col("value") + 0.5 * F.col("lagv")).alias("pred_before"),
    )
    after = base.select(
        "user_id", "event_id",
        (
            F.col("value")
            + 0.5
            * F.when(F.col("ts") >= "2024-06-01", 0.0).otherwise(F.col("lagv"))
        ).alias("pred_after"),
    )
    return (
        before.join(after, on=["user_id", "event_id"])
        .select(
            "user_id",
            "event_id",
            F.round("pred_before", 6).alias("pred_before"),
            F.round("pred_after", 6).alias("pred_after"),
            F.round(F.col("pred_after") - F.col("pred_before"), 6).alias("effect"),
        )
    )
