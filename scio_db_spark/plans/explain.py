"""Physical-plan introspection helper.

One home for the private-API incantation (``_jvm``/``_jdf``) that
renders a DataFrame's physical plan as text — plan-hygiene tests, the
audit tool, and the CLI all go through here so a Spark upgrade that
moves the API breaks exactly one function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )
