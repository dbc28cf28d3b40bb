"""The reference's pandasql queries run verbatim through the shim."""

from __future__ import annotations

from pyspark.sql import functions as F

from engage_spark.sql_dialect import sqldf, translate_sqlite

# the live reference query, verbatim shape (covid_simulator.py:359-372)
REFERENCE_SQL = """
select date as dateval, confirmed, recovered, death, population,
TAVG/10 as TAVG,
country_region ||'-'|| province_state as state,
case when TAVG <= 0 then 1 else 0 end as is_freezing,
case when TAVG > 0 and TAVG <= 10 then 1 else 0 end as is_cold,
case when julianday(dt) > julianday(gov_dt) then 1 else 0 end as gov_action
from data
"""


def test_translate_julianday_comparison():
    out = translate_sqlite("select case when julianday(a) > julianday(b) then 1 end")
    assert "datediff(a, b) > 0" in out


def test_translate_concat_chain():
    out = translate_sqlite("select a ||'-'|| b as s")
    assert out == "select concat(a, '-', b) as s"


def test_reference_query_runs_verbatim(spark):
    df = spark.createDataFrame(
        [
            (20200310, 10.0, 2.0, 1.0, 1000.0, 150.0, "Albania", "UNK",
             "2020-03-10", "2020-03-23"),
            (20200324, 20.0, 5.0, 2.0, 1000.0, -30.0, "Albania", "UNK",
             "2020-03-24", "2020-03-23"),
        ],
        ["date", "confirmed", "recovered", "death", "population", "TAVG",
         "country_region", "province_state", "dt", "gov_dt"],
    ).withColumn("dt", F.to_date("dt")).withColumn("gov_dt", F.to_date("gov_dt"))

    out = sqldf(spark, REFERENCE_SQL, {"data": df}).collect()
    by_date = {r.dateval: r for r in out}
    assert by_date[20200310].state == "Albania-UNK"     # || concat
    assert by_date[20200310].TAVG == 15.0               # TAVG/10 projection
    assert by_date[20200310].gov_action == 0            # before gov date
    assert by_date[20200324].gov_action == 1            # after gov date
    assert by_date[20200324].is_freezing == 1           # raw-TAVG band quirk


def test_ifnull_and_ordinal_groupby_pass_through(spark):
    df = spark.createDataFrame([("a", None), ("a", 2.0), ("b", None)],
                               ["k", "v"])
    out = sqldf(
        spark,
        "select k, avg(ifnull(v, 0)) as m from data group by 1",
        {"data": df},
    ).collect()
    m = {r.k: r.m for r in out}
    assert m == {"a": 1.0, "b": 0.0}
