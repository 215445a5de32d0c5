"""S4: facility-identity lookup (SURVEY.md §2a S4).

The reference derives the four identity constants from the warehouse
before running any report (/root/reference/export.py:123-141, executed
at :257-279):

- Region/Woreda/Facility come from a 3-way join: the location tag named
  ``'Facility Location'`` → ``mamba_fact_location_tag_map`` →
  ``mamba_dim_location`` (``state_province``/``city_village``/``name``);
- HMISCode comes from ``mamba_fact_location_attribute`` joined to
  ``mamba_fact_location_attribute_type`` where the type ``name`` is
  ``'hmiscode'`` (``value_reference``).

It then takes the FIRST returned row of each (export.py:266-268,279 —
``fetchall()[0]`` with no ORDER BY; a real OpenMRS install has exactly
one facility-tagged location). The engine pins a deterministic order
(``location_id`` ascending for the details query, ``value_reference``
for the code) so retries and multi-partition reads can't flip the
answer — same result on the single-facility case, deterministic instead
of arbitrary on the degenerate multi-row case.

Scale note: these are tiny dimension lookups (a handful of rows);
Catalyst broadcast-joins them automatically and the ``limit(1)``
collect moves four strings to the driver, once per export run.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_export_tool_spark.plans.registry import FacilityIdentity

#: table name → DataFrame resolver (``spark.table`` for temp views, a
#: ``Catalog.load`` bound method for parquet, a dict lookup for tests)
TableResolver = Callable[[str], DataFrame]


def sanitize(value: str) -> str:
    """The reference's filename sanitization: strip spaces and
    underscores (export.py:269,279)."""
    return value.replace(" ", "").replace("_", "")


def facility_details_df(resolve: TableResolver) -> DataFrame:
    """The Region/Woreda/Facility lookup (export.py:123-133), as a
    DataFrame plan: filter the tag dimension first so the two joins run
    over one tag row (broadcast, no shuffle)."""
    tag = resolve("mamba_fact_location_tag")
    tag_map = resolve("mamba_fact_location_tag_map")
    loc = resolve("mamba_dim_location")
    # the hint goes on the FILTERED one-row tag side — broadcasting the
    # unfiltered map/dim side would ship the big table to the driver
    return (
        F.broadcast(
            tag.where(F.col("name") == "Facility Location").select(
                "location_tag_id"
            )
        )
        .join(tag_map, "location_tag_id")
        .join(loc, "location_id")
        .select(
            F.col("state_province").alias("Region"),
            F.col("city_village").alias("Woreda"),
            F.col("name").alias("Facility"),
            "location_id",
        )
    )


def hmis_code_df(resolve: TableResolver) -> DataFrame:
    """The HMISCode lookup (export.py:134-141)."""
    attr = resolve("mamba_fact_location_attribute")
    attr_type = resolve("mamba_fact_location_attribute_type")
    return (
        F.broadcast(
            attr_type.where(F.col("name") == "hmiscode").select(
                F.col("location_attribute_type_id").alias("attribute_type_id")
            )
        )
        .join(attr, "attribute_type_id")
        .select(F.col("value_reference").alias("HMISCode"))
    )


def lookup_facility_identity(
    source: TableResolver | SparkSession,
) -> FacilityIdentity:
    """Resolve the four identity constants from the warehouse tables.

    ``source`` is a SparkSession (tables resolved as temp/catalog views,
    the transpile-path default) or any table-name → DataFrame resolver.
    Raises ``ValueError`` when either lookup is empty — the reference
    aborts the export in both cases (export.py:261-264,274-277).

    Column order parity: the appended columns use the RAW region/woreda/
    facility strings but the SANITIZED hmis code (export.py:294-296).
    """
    resolve = source.table if isinstance(source, SparkSession) else source

    details = facility_details_df(resolve).orderBy("location_id").limit(1).collect()
    if not details:
        raise ValueError(
            "No facility details found (no 'Facility Location'-tagged "
            "location) — cannot proceed with export [export.py:261-264]"
        )
    row = details[0]

    codes = hmis_code_df(resolve).orderBy("HMISCode").limit(1).collect()
    if not codes:
        raise ValueError(
            "No HMIS code found (no 'hmiscode' location attribute) — "
            "cannot proceed with export [export.py:274-277]"
        )

    return FacilityIdentity(
        region=row["Region"],
        woreda=row["Woreda"],
        facility=row["Facility"],
        hmis_code=sanitize(codes[0]["HMISCode"]),
    )
