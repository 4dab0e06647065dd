"""Iceberg source gating: the runtime jar is not in this image, so the
integration itself is UNTESTED here (documented in COVERAGE.md); what is
tested is the honest failure mode and that the reader option plumbing is
what the Iceberg docs specify."""

import pytest


def test_read_table_raises_clear_error_without_jar(spark):
    from outliertree_spark.sources.iceberg import iceberg_available, read_table

    assert iceberg_available(spark) is False  # this image has no jar
    with pytest.raises(RuntimeError, match="Iceberg runtime jar"):
        read_table(spark, "warehouse.db.docs")


def test_conf_hint_names_the_public_iceberg_classes():
    from outliertree_spark.sources.iceberg import ICEBERG_CONF_HINT

    assert ICEBERG_CONF_HINT["spark.sql.extensions"].endswith(
        "IcebergSparkSessionExtensions")
    assert ICEBERG_CONF_HINT["spark.sql.catalog.warehouse"].endswith(
        "SparkCatalog")
