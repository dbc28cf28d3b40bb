"""End-to-end tests for the three pipeline stages on synthetic fixtures
shaped exactly like the reference inputs (FIXTURES.md)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

RNG = np.random.RandomState(42)

_DATES = pd.date_range("2020-01-22", periods=96)
_DATE_COLS = [d.strftime("_%-m_%-d_%y") for d in _DATES]


def _wide_jhu(locs):
    rows = []
    for country, prov in locs:
        base = RNG.randint(0, 5, size=len(_DATE_COLS)).cumsum()
        rows.append([prov, country, *base.tolist()])
    return pd.DataFrame(rows, columns=["province_state", "country_region", *_DATE_COLS])


@pytest.fixture(scope="module")
def ep1_inputs(spark):
    locs = [("Albania", "UNK"), ("Algeria", "UNK"), ("Old Country", "UNK"),
            ("US", "NY"), ("US", "CA")]
    jhu = {k: spark.createDataFrame(_wide_jhu(locs)) for k in
           ["confirmed", "recovered", "death"]}
    location_match = spark.createDataFrame(
        [("Old Country", "UNK", "New Country", "UNK")],
        ["country_region_old", "province_state_old",
         "country_region_new", "province_state_new"],
    )
    dates_int = [int(d.strftime("%Y%m%d")) for d in _DATES]
    us_daily = spark.createDataFrame(pd.DataFrame({
        "date": dates_int * 2,
        "state": ["NY"] * len(dates_int) + ["CA"] * len(dates_int),
        "positive": RNG.randint(0, 100, 2 * len(dates_int)).astype(float),
        "recovered": RNG.randint(0, 50, 2 * len(dates_int)).astype(float),
        "death": RNG.randint(0, 10, 2 * len(dates_int)).astype(float),
    }))
    county_pop = spark.createDataFrame(pd.DataFrame({
        "countyFIPS": range(6),
        "County Name": [f"c{i}" for i in range(6)],
        "State": ["NY", "NY", "NY", "CA", "CA", "CA"],
        "population": [100000] * 6,
    }))
    jhu_countries = spark.createDataFrame(pd.DataFrame({
        "countries_and_territories": ["Albania", "Algeria", "New_Country"],
        "pop_data_2018": [2_800_000, 42_000_000, 1_000_000],
    }))
    # GHCN long weather: one station per location, daily TAVG with gaps
    wrows = []
    station_meta = []
    for code, st in [("AL", "UNK"), ("AG", "UNK"), ("NC", "UNK"),
                     ("US", "NY"), ("US", "CA")]:
        sid = f"{code}000{st}1234"[:11].ljust(11, "0")
        station_meta.append((sid, st if code == "US" else ""))
        for d in _DATES:
            if RNG.rand() < 0.1:
                continue  # missing day
            wrows.append((sid, d.strftime("%Y-%m-%d"), "TAVG",
                          float(RNG.randint(-50, 300))))
            wrows.append((sid, d.strftime("%Y-%m-%d"), "PRCP", 1.0))
    weather = spark.createDataFrame(wrows, ["id", "date", "element", "value"])
    stations = spark.createDataFrame(station_meta, ["id", "state"])
    countries = spark.createDataFrame(
        [("AL", "Albania "), ("AG", "Algeria"), ("NC", "New Country"),
         ("US", "United States")],  # real GHCN maps US -> United States
        ["code", "name"],
    )
    # complete 180-day forecast for every location (date_idx 0..179)
    frows = []
    start = _DATES[-1]
    for country, st in [("Albania", "UNK"), ("Algeria", "UNK"),
                        ("New Country", "UNK"),
                        ("United States", "NY"), ("United States", "CA")]:
        for i in range(180):
            d = int((start + pd.Timedelta(days=i + 1)).strftime("%Y%m%d"))
            frows.append((float(RNG.randint(-50, 300)), st, d, country, i))
    future_pred = spark.createDataFrame(
        frows, ["TAVG_pred", "state", "date", "country", "date_idx"]
    )
    return dict(
        jhu_confirmed=jhu["confirmed"], jhu_recovered=jhu["recovered"],
        jhu_death=jhu["death"], location_match=location_match,
        us_daily=us_daily, county_pop=county_pop, jhu_countries=jhu_countries,
        weather=weather, stations=stations, countries=countries,
        future_pred=future_pred,
    )


def test_ep1_covid_transform(spark, ep1_inputs):
    from engage_spark.pipelines import covid_transform

    out = covid_transform.run(spark, **ep1_inputs).cache()
    pdf = out.toPandas()
    assert len(pdf) > 0
    # schema contract of dataset_full (FIXTURES.md §10)
    assert {"date", "province_state", "country_region", "confirmed",
            "recovered", "death", "population", "TAVG", "date_idx",
            "location_name"} <= set(pdf.columns)
    # location renaming applied (P9): no 'Old Country' survives
    assert "Old Country" not in set(pdf.country_region)
    # every kept group has a complete forecast (J7 gate)
    by_grp = pdf.groupby(["country_region", "province_state"]).date_idx.max()
    assert (by_grp == 179).all()
    # interpolation leaves no NaN TAVG (W9)
    assert pdf.TAVG.notna().all()
    # location_name is 'country : state' (F8)
    sample = pdf.iloc[0]
    assert sample.location_name == f"{sample.country_region} : {sample.province_state}"
    # US (renamed 'United States', reference :98-99) keeps per-state
    # rows; others collapse to UNK (U4)
    us_states = set(pdf[pdf.country_region == "United States"].province_state)
    assert us_states == {"NY", "CA"}
    assert set(pdf[pdf.country_region != "United States"].province_state) == {"UNK"}


@pytest.fixture(scope="module")
def ep2_inputs(spark):
    dates = pd.date_range("2018-01-01", "2020-04-15")  # > 730 rows
    rows, meta = [], []
    for code, st, fresh in [("AL", "", True), ("AG", "", True),
                            ("ST", "", False)]:  # ST: stale → gated out
        sid = f"{code}STN000001"[:11]
        meta.append((sid, st))
        use = dates if fresh else dates[:400]
        for d in use:
            t = 100 + 100 * np.sin(2 * np.pi * d.dayofyear / 365.0)
            rows.append((sid, d.strftime("%Y-%m-%d"), "TAVG", float(t)))
    weather = spark.createDataFrame(rows, ["id", "date", "element", "value"])
    stations = spark.createDataFrame(meta, ["id", "state"])
    countries = spark.createDataFrame(
        [("AL", "Albania"), ("AG", "Algeria"), ("ST", "Staleland")],
        ["code", "name"],
    )
    return dict(weather=weather, stations=stations, countries=countries)


def test_ep2_weather_forecast(spark, ep2_inputs):
    from engage_spark.pipelines import weather_forecast

    out = weather_forecast.run(spark, **ep2_inputs)
    fut = out["future_pred"].toPandas()
    pa = out["pred_actual"].toPandas()
    rmse = out["rsme_score"].toPandas()
    # stale group gated out (J8): only 2 locations survive
    assert set(rmse.country) == {"Albania", "Algeria"}
    # contract volumes: 180 forecast rows and 30 test rows per location
    assert fut.groupby(["country", "state"]).size().eq(180).all()
    assert pa.groupby(["country", "state"]).size().eq(30).all()
    # forecasts stay within the physical range of the series (sanity:
    # AR on a clean seasonal signal shouldn't blow up)
    assert fut.TAVG_pred.between(-250, 450).all()
    # a clean sinusoid is easy: normalized RMSE is small
    assert (rmse.TAVG_rmse < 0.25).all()


@pytest.fixture(scope="module")
def dataset_full_fixture(spark):
    rows = []
    for country, st, pop in [("Albania", "UNK", 2.8e6), ("US", "NY", 2e7),
                             ("US", "CA", 4e7)]:
        conf = 0.0
        dates = pd.date_range("2020-03-01", periods=120)
        for i, d in enumerate(dates):
            conf += max(0.0, RNG.normal(40, 15))
            rec = conf * 0.4
            dth = conf * 0.05
            rows.append((
                int(d.strftime("%Y%m%d")), st, country,
                float(conf), float(rec), float(dth), pop,
                float(RNG.randint(-50, 300)),
                -1.0 if i < 90 else float(i - 90),
            ))
    return spark.createDataFrame(rows, [
        "date", "province_state", "country_region", "confirmed",
        "recovered", "death", "population", "TAVG", "date_idx",
    ])


def test_ep3_simulator(spark, dataset_full_fixture):
    from engage_spark.pipelines import simulator

    out = simulator.run(spark, dataset_full_fixture)
    coefs = out["recover_coefs"].toPandas()
    # recover_coefs.csv schema contract (FIXTURES.md §12)
    assert {"state", "coef_name", "coef_value", "re_lag_confirmed",
            "fe_Intercept", "Intercept", "lag_confirmed", "gov_action",
            "TAVG"} == set(coefs.columns)
    assert len(coefs) == 3  # one row per state
    assert coefs.fe_Intercept.nunique() == 1  # fixed effect shared
    # total = fixed + random
    assert np.allclose(coefs.Intercept, coefs.fe_Intercept + coefs.coef_value)

    sim = out["simulation"].toPandas()
    assert set(sim.state) == set(coefs.state)
    assert sim.pred_confirmed.notna().all()
    # cumulative predictions are non-decreasing per state (SIR: I+R grows)
    for _, g in sim.sort_values("dateval").groupby("state"):
        assert (np.diff(g.pred_confirmed) >= -1e-6).all()

    cmp_ = out["scenario_compare"].toPandas()
    assert {"pred_confirmed_before", "pred_confirmed_after", "gov_effect"} <= set(
        cmp_.columns
    )
    # scenarios only diverge after the gov date
    pre = cmp_[cmp_.dateval < 20200323]
    assert np.allclose(pre.gov_effect, 0.0)

    corr = out["simulation_corrected"].toPandas()
    assert "pred_confirmed_adj" in corr.columns and len(corr) > 0


def test_pipeline_plot_sinks(spark, ep2_inputs, dataset_full_fixture, tmp_path):
    """S6 through the pipelines: EP2 renders one actual-vs-prediction
    chart per surviving (country, state) and EP3 one prediction chart
    per state — valid SVG with one polyline per plotted series, the
    reference's per-group-file contract."""
    import glob
    import xml.etree.ElementTree as ET

    from engage_spark.pipelines import simulator, weather_forecast

    d2 = str(tmp_path / "ep2_plots")
    out2 = weather_forecast.run(spark, **ep2_inputs, plot_dir=d2)
    states = {
        (r.country, r.state)
        for r in out2["rsme_score"].select("country", "state").collect()
    }
    files2 = sorted(glob.glob(f"{d2}/*.svg"))
    assert len(files2) == len(states)
    for f in files2:
        polys = [
            e for e in ET.parse(f).getroot().iter()
            if e.tag.endswith("polyline")
        ]
        assert len(polys) == 2  # actual + prediction

    d3 = str(tmp_path / "ep3_plots")
    out3 = simulator.run(spark, dataset_full_fixture, plot_dir=d3)
    n_states = out3["simulation"].select("state").distinct().count()
    files3 = sorted(glob.glob(f"{d3}/*.svg"))
    assert len(files3) == n_states
    for f in files3:
        polys = [
            e for e in ET.parse(f).getroot().iter()
            if e.tag.endswith("polyline")
        ]
        assert len(polys) == 2  # Confirmed + removed
