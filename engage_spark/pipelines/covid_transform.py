"""EP1 — covid data transform (reference: covid_data_transform.py:56-286).

Wide JHU snapshots + US-state dailies + GHCN weather → one long-format
(location, date) table `dataset_full`. Every reference row-loop becomes
a declarative op:

  melt loop (:85-92)            → stack() unpivot
  rename_location loop (:16-22) → mapping-table join + coalesce
  aggregate_loc_* delete+insert (:25-52) → re-key + groupBy agg
  interpolation loop (:204-237) → applyInPandas kernel (exact recurrence)
  list_loc membership (:241-260)→ left_semi join
  population gate (:262-281)    → left_semi join on qualifying keys

The whole stage is one lazy DAG; Catalyst prunes columns into the CSV
scans and pushes the `date >= first_covid_date` filter below the pivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from engage_spark.queries.kernels import interpolate_series

GROUP_KEYS = ["country_region", "province_state"]


def melt_wide_covid(df: DataFrame, value_name: str) -> DataFrame:
    """Wide date-pivoted JHU table (one `_M_D_YY` column per day) → long
    (province_state, country_region, date_int, value).
    Reference: covid_data_transform.py:85-92."""
    date_cols = [c for c in df.columns if c.startswith("_")]
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in date_cols)
    long = df.selectExpr(
        "province_state",
        "country_region",
        f"stack({len(date_cols)}, {stack_expr}) as (date_raw, {value_name})",
    )
    # '_4_26_20' → 20200426 (F10: to_date '_M_d_yy' → yyyyMMdd int)
    return long.withColumn(
        "date",
        F.date_format(F.to_date("date_raw", "_M_d_yy"), "yyyyMMdd").cast("int"),
    ).drop("date_raw")


def rename_locations(df: DataFrame, mapping: DataFrame) -> DataFrame:
    """Dimension-driven rename (P9): the reference loops over
    location_match.csv updating rows in place
    (covid_data_transform.py:16-22); here one broadcast left join +
    coalesce replaces the loop."""
    m = mapping.select(
        F.col("country_region_old"),
        F.col("province_state_old"),
        F.col("country_region_new"),
        F.col("province_state_new"),
    )
    joined = df.join(
        F.broadcast(m),
        on=(df["country_region"] == m["country_region_old"])
        & (df["province_state"] == m["province_state_old"]),
        how="left",
    )
    return joined.select(
        *[c for c in df.columns if c not in GROUP_KEYS],
        F.coalesce("country_region_new", "country_region").alias("country_region"),
        F.coalesce("province_state_new", "province_state").alias("province_state"),
    )


def join_jhu(conf: DataFrame, rec: DataFrame, death: DataFrame) -> DataFrame:
    """3-key inner join of the three melted JHU tables (J1,
    covid_data_transform.py:95-96).

    NULL-SAFE on the keys: pandas `merge` matches NaN==NaN, and the
    reference depends on it — JHU country-level rows carry NaN
    province_state and must still join across the three tables. Spark's
    plain equi-join would silently drop every country-level row."""
    keys = ["province_state", "country_region", "date"]

    def nsjoin(a: DataFrame, b: DataFrame) -> DataFrame:
        cond = [a[k].eqNullSafe(b[k]) for k in keys]
        joined = a.join(b, on=cond, how="inner")
        return joined.select(
            *[a[k] for k in keys],
            *[a[c] for c in a.columns if c not in keys],
            *[b[c] for c in b.columns if c not in keys],
        )

    return nsjoin(nsjoin(conf, rec), death)


def collapse_non_us(df: DataFrame, agg: str = "sum") -> DataFrame:
    """Replace-group pattern (U4, covid_data_transform.py:25-52):
    every country except 'United States' collapses to country level
    with province 'UNK' (the reference removes exactly "United States"
    from its collapse list, :26/:42 — the US→'United States' rename at
    :98-99 runs first) — a re-key + one aggregation pass instead of the
    reference's delete+insert loop."""
    rekeyed = df.withColumn(
        "province_state",
        F.when(
            F.col("country_region") == "United States", F.col("province_state")
        ).otherwise(F.lit("UNK")),
    )
    nums = [
        f.name
        for f in rekeyed.schema.fields
        if isinstance(f.dataType, (T.LongType, T.DoubleType, T.IntegerType))
        and f.name != "date"
    ]
    fn = F.sum if agg == "sum" else F.avg
    return rekeyed.groupBy("country_region", "province_state", "date").agg(
        *[fn(c).alias(c) for c in nums]
    )


def us_states_covid(us_daily: DataFrame, county_pop: DataFrame) -> DataFrame:
    """US per-state block (covid_data_transform.py:70-78): project,
    rename, null-fill, join summed county population."""
    us = us_daily.select(
        F.col("date").cast("int").alias("date"),
        F.col("state").alias("province_state"),
        F.col("positive").alias("confirmed"),
        "recovered",
        "death",
    ).na.fill({"confirmed": 0, "recovered": 0, "death": 0})
    pop = county_pop.groupBy(F.col("State").alias("province_state")).agg(
        F.sum("population").alias("population")
    )
    return (
        us.join(pop, on="province_state", how="inner")
        .withColumn("country_region", F.lit("United States"))  # :72
    )


def country_population(jhu_countries: DataFrame) -> DataFrame:
    """Country population dim (covid_data_transform.py:105-110):
    underscores→spaces, project, dedup."""
    return (
        jhu_countries.select(
            F.regexp_replace("countries_and_territories", "_", " ").alias(
                "country_region"
            ),
            F.col("pop_data_2018").alias("population"),
        )
        .dropDuplicates()
    )


def weather_tavg(
    weather: DataFrame, stations: DataFrame, countries: DataFrame,
    first_covid_date: int,
) -> DataFrame:
    """GHCN long weather → per-(country,state,date) mean TAVG
    (covid_data_transform.py:144-173).

    Order of ops is the scale-relevant piece: the date filter lands on
    the scan (predicate pushdown), the element pivot keeps only TAVG,
    and the station dim broadcasts."""
    w = (
        weather.select("id", "date", "element", "value")
        .withColumn(
            "date", F.regexp_replace("date", "-", "").cast("int")  # F4/P10
        )
        .filter(F.col("date") >= first_covid_date)  # pushed below the pivot
        .filter(F.col("element") == "TAVG")
        .withColumnRenamed("value", "TAVG")
    )
    st = stations.select(
        "id",
        # CSV blanks arrive as NULL: coalesce before the ''→UNK rule
        F.when(F.coalesce(F.trim("state"), F.lit("")) == "", "UNK")
        .otherwise(F.trim("state"))
        .alias("province_state"),
        F.substring("id", 1, 2).alias("code"),  # F7
    )
    joined = w.join(F.broadcast(st), on="id", how="left")
    mean = joined.groupBy("code", "province_state", "date").agg(
        F.avg("TAVG").alias("TAVG")
    )
    c = countries.select("code", F.trim("name").alias("country_region"))
    return mean.join(F.broadcast(c), on="code", how="inner").select(
        "country_region", "province_state", "date", "TAVG"
    )


def union_with_forecast(hist: DataFrame, future_pred: DataFrame) -> DataFrame:
    """Historical ∪ predicted weather (U2, covid_data_transform.py:176-180):
    forecast rows carry date_idx 0..179, historical -1."""
    fut = future_pred.select(
        F.col("country").alias("country_region"),
        F.col("state").alias("province_state"),
        F.col("date").cast("int").alias("date"),
        F.col("TAVG_pred").alias("TAVG"),
        F.col("date_idx").cast("double").alias("date_idx"),
    )
    return hist.withColumn("date_idx", F.lit(-1.0)).unionByName(fut)


_INTERP_SCHEMA = T.StructType(
    [
        T.StructField("country_region", T.StringType()),
        T.StructField("province_state", T.StringType()),
        T.StructField("date", T.IntegerType()),
        T.StructField("TAVG", T.DoubleType()),
        T.StructField("date_idx", T.DoubleType()),
    ]
)


def interpolate_weather(df: DataFrame) -> DataFrame:
    """W9 interpolation per (country,state), exact reference recurrence
    (covid_data_transform.py:204-237) via the shared kernel."""

    def kernel(pdf):
        pdf = pdf.sort_values("date")
        pdf["TAVG"] = interpolate_series(pdf["TAVG"]).to_numpy()
        return pdf[["country_region", "province_state", "date", "TAVG", "date_idx"]]

    return df.groupBy(*GROUP_KEYS).applyInPandas(kernel, _INTERP_SCHEMA)


def assemble_dataset_full(
    covid: DataFrame, weather: DataFrame, populations: DataFrame
) -> DataFrame:
    """Final assembly (covid_data_transform.py:239-286):
    right join covid→weather (J4), keep groups with a complete 180-day
    forecast (J7 semi join), keep groups with population (J8 semantics
    via semi join on qualifying keys), label location_name (F8)."""
    keys = ["country_region", "province_state", "date"]
    full = covid.join(weather, on=keys, how="right")

    complete = (
        full.filter(F.col("date_idx") == 179)
        .select(*GROUP_KEYS)
        .distinct()
    )
    full = full.join(complete, on=GROUP_KEYS, how="left_semi")

    with_pop = populations.filter(F.col("population").isNotNull()).select(
        *GROUP_KEYS, "population"
    )
    full = full.join(
        with_pop.select(*GROUP_KEYS).distinct(), on=GROUP_KEYS, how="left_semi"
    ).join(with_pop, on=GROUP_KEYS, how="left")

    return full.withColumn(
        "location_name",
        F.concat_ws(" : ", "country_region", "province_state"),
    )


def run(
    spark: SparkSession,
    jhu_confirmed: DataFrame,
    jhu_recovered: DataFrame,
    jhu_death: DataFrame,
    location_match: DataFrame,
    us_daily: DataFrame,
    county_pop: DataFrame,
    jhu_countries: DataFrame,
    weather: DataFrame,
    stations: DataFrame,
    countries: DataFrame,
    future_pred: DataFrame,
) -> DataFrame:
    """EP1 end-to-end: returns the dataset_full DataFrame (caller sinks
    it with io.write_parquet, replacing the reference's CSV sink :286)."""
    conf = melt_wide_covid(jhu_confirmed, "confirmed")
    rec = melt_wide_covid(jhu_recovered, "recovered")
    death = melt_wide_covid(jhu_death, "death")
    covid = join_jhu(conf, rec, death)
    # US → 'United States' BEFORE mapping + collapse (reference :98-99;
    # the collapse exempts 'United States', and the GHCN country dim
    # maps code US to 'United States', so this rename is what keeps US
    # per-state rows alive through the weather join)
    covid = covid.withColumn(
        "country_region",
        F.when(F.col("country_region") == "US", "United States").otherwise(
            F.col("country_region")
        ),
    )
    covid = rename_locations(covid, location_match)
    covid = collapse_non_us(covid, agg="sum")

    us = us_states_covid(us_daily, county_pop)
    covid = covid.unionByName(us.drop("population"), allowMissingColumns=True)
    covid = covid.na.fill({"province_state": "UNK"})  # :118

    first_date = covid.agg(F.min("date")).collect()[0][0]  # A5
    wx = weather_tavg(weather, stations, countries, first_date)
    # reference order (:176-187): union with forecast first, THEN
    # rename + collapse, then interpolate
    wx = union_with_forecast(wx, future_pred)
    wx = rename_locations(wx, location_match)  # :185
    wx = collapse_non_us(wx, agg="avg")
    wx = interpolate_weather(wx)

    pops = country_population(jhu_countries).withColumn(
        "province_state", F.lit("UNK")
    ).select(*GROUP_KEYS, "population").unionByName(
        us.select(*GROUP_KEYS, "population").distinct()
    )
    return assemble_dataset_full(covid, wx, pops)
