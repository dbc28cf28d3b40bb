"""End-to-end re-creations of the reference's three pipeline stages
(SURVEY.md §3) on Spark:

  covid_transform  — EP1: covid_data_transform.py (ETL → dataset_full)
  weather_forecast — EP2: weather_pred.py (series prep → per-group forecast)
  simulator        — EP3: covid_simulator.py (SQL features → mixed-effects
                     → SIR simulation → bias/scenario compare)

Each stage is a pure DataFrame→DataFrame function; `run()` composes
them into one lazy DAG per stage boundary. A user of the reference
runs the same three entry points with the same table contracts, but
distributed: every `for country: for state:` loop is a groupBy, every
eager materialization a Catalyst plan node.
"""

from engage_spark.pipelines import covid_transform, simulator, weather_forecast  # noqa: F401
