"""JVM-backed local relations for small driver-side dimension tables.

``spark.createDataFrame(rows, schema)`` on a plain Python list builds a
PICKLED Python RDD (``applySchemaToPythonRDD``): every execution of the
consuming plan ships the pickle bytes to a plain (non-Arrow) Python
worker lane to deserialize — the FIRST such execution in a session pays
~1.7s spinning that lane up (measured on dedup_clusters' component
relation at sf0.1: exec1 2.04s vs exec2 0.37s for a noop of the same
tiny frame), and every execution keeps Python workers in a path that is
conceptually a constant table.  Routing the same rows through pandas +
Arrow instead (``createDataFrame(pandas_df, schema)``) converts ONCE in
the driver to JVM internal rows, so executions are pure JVM iteration —
no Python anywhere in the plan, no worker-lane spin-up.

Results are identical by construction: same rows, same positional
schema; only the serialization vehicle changes.  Falls back to the
plain path when pandas/Arrow cannot represent the input (and for empty
row lists, where both paths need an explicit schema anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Arrow-backed twin of ``spark.createDataFrame(rows, schema)`` for
    bounded driver-side row lists (dimension tables, probe results).

    ``schema`` may be a StructType, a DDL string, or a list of column
    names (same forms ``createDataFrame`` accepts); rows map to schema
    columns positionally in every form, exactly as the plain path does.
    """
    rows = rows if isinstance(rows, list) else list(rows)
    if rows:
        try:
            import pandas as pd
            return spark.createDataFrame(pd.DataFrame(rows), schema=schema)
        except Exception:
            pass
    return spark.createDataFrame(rows, schema)
