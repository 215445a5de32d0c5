"""Export pipeline parity tests (SURVEY.md §5.4): facility-column
append order, CSV naming contract, empty-result skip, zip/checksum
structure, report-window resolution, dialect shim."""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import zipfile

import pytest

from data_export_tool_spark.plans.dialect import shim_mysql_sql, substitute_params
from data_export_tool_spark.plans.registry import (
    FacilityIdentity,
    ReportRegistry,
    run_export,
)
from data_export_tool_spark.plans.report_window import resolve_report_window
from data_export_tool_spark.sources.csv_sink import (
    csv_name,
    with_facility_columns,
    write_query_csv,
)
from data_export_tool_spark.sources.packaging import zip_files_with_checksum


# ---- report window (U3; export.py:360-375) --------------------------------


def test_report_window_mid_year():
    # Sene 2015: end = Eth 20/10/2015, start = Eth 21/9/2015
    w = resolve_report_window("Sene", 2015)
    assert w.end == dt.date(2023, 6, 27)
    assert w.start == dt.date(2023, 5, 29)
    assert (w.end - w.start).days == 29


def test_report_window_meskerem_wraps_to_pagume():
    w = resolve_report_window(1, 2016)
    # end: Eth 20/1/2016 = 2023-10-01; start: Eth 21/13/2015 (Pagume
    # overflow, bug-compatible with the reference's EthDate(21,13,y-1))
    assert w.end == dt.date(2023, 10, 1)
    assert w.start < w.end
    assert w.as_params()["REPORT_END_DATE"] == "2023-10-01"


# ---- facility columns + CSV contract (S5/S6; export.py:294-308) -----------


def test_facility_columns_appended_after_query_columns(spark):
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    out = with_facility_columns(df, "Oromia", "Adama", "Adama General", "H123")
    assert out.columns == ["id", "v", "Region", "Woreda", "Facility", "HMISCode"]
    row = out.first()
    assert (row.Region, row.HMISCode) == ("Oromia", "H123")


def test_csv_name_contract():
    assert (
        csv_name("Tx_Curr_LineList", "Adama General", "H123", "Sene", 2015)
        == "Tx_Curr_LineList_Adama GeneralH123_Sene_2015.csv"
    )


def test_empty_result_skipped(spark, tmp_path):
    df = spark.createDataFrame([], "id long, v string")
    path = write_query_csv(df, str(tmp_path), "Q", "F", "H", "Sene", 2015)
    assert path is None
    assert list(tmp_path.iterdir()) == []


# ---- zip + checksum (S7; export.py:145-210) -------------------------------


def test_zip_checksum_structure(tmp_path):
    (tmp_path / "a.csv").write_text("x,y\n1,2\n")
    (tmp_path / "b.csv").write_text("x\n9\n")
    final = zip_files_with_checksum(str(tmp_path), "run1")
    assert os.path.basename(final) == "run1_packaged18.zip"
    with zipfile.ZipFile(final) as zf:
        names = sorted(zf.namelist())
        assert names == ["run1.zip", "run1_checksum.txt"]
        checksum = zf.read("run1_checksum.txt").decode()
        inner = zf.read("run1.zip")
        assert checksum == hashlib.sha256(inner).hexdigest()
        with zipfile.ZipFile(zf.open("run1.zip")) as inner_zf:
            assert sorted(inner_zf.namelist()) == ["a.csv", "b.csv"]
    # temporaries removed (export.py finally-block parity)
    assert not (tmp_path / "run1.zip").exists()
    assert not (tmp_path / "run1_checksum.txt").exists()


# ---- facility-identity lookup (S4; export.py:123-141,257-279) -------------


def _location_frames(spark):
    from data_export_tool_spark.mamba import fixtures as FX
    from data_export_tool_spark.mamba import schemas as S

    schemas = S.all_table_schemas()
    return {
        name: spark.createDataFrame(rows, schemas[name])
        for name, rows in FX.FixtureGen(42, 1).locations().items()
    }


def test_facility_identity_lookup(spark):
    from data_export_tool_spark.mamba.facility import lookup_facility_identity

    frames = _location_frames(spark)
    fac = lookup_facility_identity(frames.__getitem__)
    # fixture: tag 'Facility Location' → location 1; attribute type
    # 'hmiscode' → 'H-12345' (fixtures.py locations())
    assert fac.region == "Oromia"
    assert fac.woreda == "Adama"
    assert fac.facility == "Adama General Hospital"
    assert fac.hmis_code == "H-12345"
    assert fac.facility_sanitized == "AdamaGeneralHospital"


def test_facility_identity_from_session_views(spark):
    from data_export_tool_spark.mamba.facility import lookup_facility_identity

    for name, df in _location_frames(spark).items():
        df.createOrReplaceTempView(name)
    fac = lookup_facility_identity(spark)
    assert fac.facility == "Adama General Hospital"


def test_facility_identity_missing_tag_raises(spark):
    from data_export_tool_spark.mamba.facility import lookup_facility_identity

    frames = _location_frames(spark)
    frames["mamba_fact_location_tag"] = spark.createDataFrame(
        [(9, "Ward")], "location_tag_id long, name string"
    )
    with pytest.raises(ValueError, match="No facility details"):
        lookup_facility_identity(frames.__getitem__)


def test_facility_identity_missing_hmiscode_raises(spark):
    from data_export_tool_spark.mamba.facility import lookup_facility_identity

    frames = _location_frames(spark)
    frames["mamba_fact_location_attribute_type"] = spark.createDataFrame(
        [], "location_attribute_type_id long, name string"
    )
    with pytest.raises(ValueError, match="No HMIS code"):
        lookup_facility_identity(frames.__getitem__)


def test_run_export_looks_up_facility_when_none(spark, tmp_path):
    # facility=None → S4 lookup from session views (export.py:257-279)
    for name, df in _location_frames(spark).items():
        df.createOrReplaceTempView(name)
    spark.createDataFrame([(1,)], "id long").createOrReplaceTempView("src5")
    reg = ReportRegistry()
    reg.register_sql("R", "SELECT id FROM src5")
    written = run_export(
        spark, reg, None, "Sene", 2015, str(tmp_path),
        month_label="Sene", cleanup_csvs=False,
    )
    path = written["R"]
    assert os.path.basename(path) == "R_AdamaGeneralHospitalH-12345_Sene_2015.csv"
    lines = open(path).read().splitlines()
    assert lines[0].split(",")[1:] == ["Region", "Woreda", "Facility", "HMISCode"]
    assert lines[1].split(",")[1:] == [
        "Oromia", "Adama", "Adama General Hospital", "H-12345",
    ]


# ---- db_properties → JDBC wiring (export.py:89-93,232-238) ----------------


def test_mysql_jdbc_option_mapping():
    from data_export_tool_spark.catalog import mysql_jdbc_options

    url, props = mysql_jdbc_options(
        {"DB_HOST": "db.example", "DB_USER": "u1", "DB_PASS": "p#1", "DB_NAME": "adb"}
    )
    assert url == "jdbc:mysql://db.example:3306/adb"
    assert props == {"user": "u1", "password": "p#1", "driver": "com.mysql.cj.jdbc.Driver"}
    # defaults mirror the reference (export.py:90-93)
    url, props = mysql_jdbc_options({})
    assert url == "jdbc:mysql://localhost:3306/analytics_db"
    assert props["user"] == "openmrs" and props["password"] == ""


def test_config_to_export_end_to_end(spark, tmp_path):
    """The single-run S2+S4+S5+S6+S7 integration: export_config.json
    (queries_path + db_properties) → registry → warehouse views
    (parquet-backed JDBC stand-in) → facility lookup → CSV with
    facility columns → checksummed zip package with the reference's
    naming, source CSVs cleaned up."""
    import hashlib
    import json
    import zipfile

    (tmp_path / "q").mkdir()
    (tmp_path / "q" / "Loc.sql").write_text(
        "SELECT location_id, name FROM mamba_dim_location "
        "WHERE REPORT_END_DATE >= REPORT_START_DATE"
    )
    cfg = {
        "queries_path": {"Loc": "q/Loc.sql"},
        "db_properties": {
            "DB_HOST": "h",
            "DB_USER": "u",
            "DB_PASS": "p",
            "DB_NAME": "d",
        },
    }
    (tmp_path / "export_config.json").write_text(json.dumps(cfg))

    reg = ReportRegistry.from_config(str(tmp_path / "export_config.json"))
    assert reg.db_properties["DB_HOST"] == "h"
    assert list(reg.sql_queries) == ["Loc"]

    frames = _location_frames(spark)
    seen = {}

    def fake_jdbc_reader(s, url, table, properties, partition_column=None, **kw):
        seen[table] = (url, properties, partition_column)
        return frames[table]

    reg.connect_warehouse(
        spark, tables=sorted(frames), reader=fake_jdbc_reader
    )
    assert seen["mamba_dim_location"][0] == "jdbc:mysql://h:3306/d"
    assert seen["mamba_dim_location"][1]["user"] == "u"

    out = run_export(
        spark, reg, None, "Sene", 2015, str(tmp_path / "out"),
        zip_name="AdamaGeneralHospitalH-12345_Sene_2015",
        month_label="Sene",
    )
    # S6 naming contract (facility sanitized in the file name)
    path = out["Loc"]
    assert os.path.basename(path) == "Loc_AdamaGeneralHospitalH-12345_Sene_2015.csv"
    # S7: checksummed double-zip package; source CSVs cleaned up after
    final = tmp_path / "out" / "AdamaGeneralHospitalH-12345_Sene_2015_packaged18.zip"
    assert final.exists()
    assert not os.path.exists(path)
    with zipfile.ZipFile(final) as zf:
        names = sorted(zf.namelist())
        assert names == [
            "AdamaGeneralHospitalH-12345_Sene_2015.zip",
            "AdamaGeneralHospitalH-12345_Sene_2015_checksum.txt",
        ]
        inner = zf.read(names[0])
        assert zf.read(names[1]).decode() == hashlib.sha256(inner).hexdigest()
        with zipfile.ZipFile(zf.open(names[0])) as inner_zf:
            data = inner_zf.read("Loc_AdamaGeneralHospitalH-12345_Sene_2015.csv")
    # S5: facility-identity columns appended after the query columns,
    # raw facility name in the column values (S4 looked it up)
    lines = data.decode().splitlines()
    assert lines[0].split(",") == [
        "location_id", "name", "Region", "Woreda", "Facility", "HMISCode",
    ]
    assert lines[1].split(",")[2:] == [
        "Oromia", "Adama", "Adama General Hospital", "H-12345",
    ]


def test_connect_warehouse_partitions_follow_up_shards(spark):
    from data_export_tool_spark.mamba.schemas import all_table_schemas

    reg = ReportRegistry(db_properties={"DB_NAME": "d"})
    calls = {}

    def fake_reader(s, url, table, properties, partition_column=None, **kw):
        calls[table] = partition_column
        return spark.range(1).withColumnRenamed("id", "x")

    reg.connect_warehouse(spark, reader=fake_reader)
    assert set(calls) == set(all_table_schemas())
    assert calls["mamba_flat_encounter_follow_up"] == "client_id"
    assert calls["mamba_flat_encounter_follow_up_1"] == "client_id"
    assert calls["mamba_dim_location"] is None


# ---- CLI: reference config end-to-end -------------------------------------


@pytest.mark.skipif(
    not os.path.exists("/root/reference/export_config.json"),
    reason="reference tree not available",
)
def test_cli_reference_config_end_to_end(spark, tmp_path):
    """python -m data_export_tool_spark against the REFERENCE'S OWN
    export_config.json over a parquet warehouse: all 12 reports run
    through the shim, facility identity is looked up (S4), and the
    checksummed package lands with the reference's naming."""
    from data_export_tool_spark.__main__ import main
    from data_export_tool_spark.mamba.fixture_store import (
        ensure_fixture_parquet,
        fixture_dir,
    )

    ensure_fixture_parquet()
    rc = main(
        [
            "--config", "/root/reference/export_config.json",
            "--month", "Sene",
            "--year", "2015",
            "--out", str(tmp_path),
            "--parquet-warehouse", fixture_dir(),
        ]
    )
    assert rc == 0
    zips = list(tmp_path.glob("*_packaged18.zip"))
    assert len(zips) == 1
    assert zips[0].name == "AdamaGeneralHospitalH-12345_Sene_2015_packaged18.zip"
    # CSVs deleted after packaging (reference parity)
    assert not list(tmp_path.glob("*.csv"))


# ---- dialect shim (§4/§7.4) ------------------------------------------------


def test_shim_strips_hash_comments():
    sql = "SELECT a # trailing comment\nFROM t WHERE s = 'keep # this'"
    out = shim_mysql_sql(sql)
    assert "trailing" not in out
    assert "keep # this" in out


def test_shim_isnull_rewrite(spark):
    out = shim_mysql_sql("SELECT ISNULL(x) FROM t")
    assert "CASE WHEN x IS NULL THEN 1 ELSE 0 END" in out
    spark.createDataFrame([(None,), (5,)], "x int").createOrReplaceTempView("t")
    vals = sorted(r[0] for r in spark.sql(out).collect())
    assert vals == [0, 1]


def test_shim_period_diff(spark):
    sql = "SELECT PERIOD_DIFF(DATE_FORMAT(b, '%Y%m'), DATE_FORMAT(a, '%Y%m')) AS m FROM t"
    spark.createDataFrame(
        [(dt.date(2020, 1, 31), dt.date(2020, 3, 1))], "a date, b date"
    ).createOrReplaceTempView("t")
    assert spark.sql(shim_mysql_sql(sql)).first().m == 2


def test_shim_date_add_expression(spark):
    # computed interval (Tx_Curr_VLEligible_LineList.sql:152-153 shape)
    sql = "SELECT DATE_ADD(d, INTERVAL 365 * n DAY) AS x, DATE_ADD(d, INTERVAL -6 MONTH) AS y FROM t"
    spark.createDataFrame(
        [(dt.date(2020, 1, 1), 2)], "d date, n int"
    ).createOrReplaceTempView("t")
    row = spark.sql(shim_mysql_sql(sql)).first()
    assert row.x == dt.date(2021, 12, 31)
    assert row.y == dt.date(2019, 7, 1)


def test_shim_param_substitution():
    out = substitute_params(
        "WHERE d BETWEEN REPORT_START_DATE AND REPORT_END_DATE",
        {"REPORT_START_DATE": "2023-05-29", "REPORT_END_DATE": "2023-06-27"},
    )
    assert out == "WHERE d BETWEEN '2023-05-29' AND '2023-06-27'"


def test_shim_curdate(spark):
    out = shim_mysql_sql("SELECT CURDATE() AS today")
    assert "current_date()" in out
    assert spark.sql(out).first().today == dt.date.today()


# ---- end-to-end export run (registry) --------------------------------------


def test_run_export_end_to_end(spark, tmp_path):
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).createOrReplaceTempView("src")
    reg = ReportRegistry()
    reg.register_sql("MyReport", "SELECT id, v FROM src WHERE REPORT_END_DATE > ''")
    reg.register_sql("EmptyReport", "SELECT id, v FROM src WHERE id > 99")
    fac = FacilityIdentity("Oromia", "Adama", "AdamaGen", "H1")

    written = run_export(
        spark,
        reg,
        fac,
        "Sene",
        2015,
        str(tmp_path),
        zip_name="exp",
        month_label="Sene",
        cleanup_csvs=False,
    )
    assert written["EmptyReport"] is None
    csv_path = written["MyReport"]
    assert csv_path and os.path.basename(csv_path) == "MyReport_AdamaGenH1_Sene_2015.csv"
    header = open(csv_path).readline().strip().split(",")
    assert header == ["id", "v", "Region", "Woreda", "Facility", "HMISCode"]
    assert os.path.exists(tmp_path / "exp_packaged18.zip")


def test_run_export_cleans_csvs_after_packaging(spark, tmp_path):
    # post-zip CSV deletion parity (export.py:317-326)
    spark.createDataFrame([(1,)], "id long").createOrReplaceTempView("src2")
    reg = ReportRegistry()
    reg.register_sql("R", "SELECT id FROM src2")
    fac = FacilityIdentity("Oromia", "Adama", "AdamaGen", "H1")
    written = run_export(
        spark, reg, fac, "Sene", 2015, str(tmp_path), zip_name="exp2", month_label="Sene"
    )
    assert not os.path.exists(written["R"])
    assert os.path.exists(tmp_path / "exp2_packaged18.zip")


def test_run_export_restores_ansi_conf(spark, tmp_path):
    prior = spark.conf.get("spark.sql.ansi.enabled")
    spark.createDataFrame([(1,)], "id long").createOrReplaceTempView("src3")
    reg = ReportRegistry()
    reg.register_sql("R", "SELECT id FROM src3")
    fac = FacilityIdentity("O", "A", "F", "H")
    run_export(spark, reg, fac, "Sene", 2015, str(tmp_path), month_label="Sene")
    assert spark.conf.get("spark.sql.ansi.enabled") == prior


def test_run_export_raw_facility_in_columns_sanitized_in_name(spark, tmp_path):
    # export.py:294-298 — raw name in the column, sanitized in the file
    spark.createDataFrame([(1,)], "id long").createOrReplaceTempView("src4")
    reg = ReportRegistry()
    reg.register_sql("R", "SELECT id FROM src4")
    fac = FacilityIdentity("Oromia", "Adama", "Adama General_Hosp", "H9")
    written = run_export(
        spark, reg, fac, "Sene", 2015, str(tmp_path),
        month_label="Sene", cleanup_csvs=False,
    )
    path = written["R"]
    assert os.path.basename(path) == "R_AdamaGeneralHospH9_Sene_2015.csv"
    lines = open(path).read().splitlines()
    assert lines[1].split(",")[3] == "Adama General_Hosp"


def test_rewrite_follow_up_assembly_hvl_text():
    """The FollowUp CTE's 10-shard assembly must collapse to one scan
    of the cached wide view; qualified shard refs re-point to the wide
    alias (VERDICT r9 weak-#1: ~130 broadcast maps per HVL plan)."""
    import os

    import pytest as _pytest

    from data_export_tool_spark.mamba.reports import (
        REFERENCE_SQL_DIR,
        rewrite_follow_up_assembly,
    )

    path = os.path.join(REFERENCE_SQL_DIR, "Tx_Curr_HVL_LineList.sql")
    if not os.path.exists(path):
        _pytest.skip("reference checkout not available")
    with open(path) as fh:
        sql = fh.read()
    out = rewrite_follow_up_assembly(sql)
    assert "__followup_wide" in out
    assert "LEFT JOIN mamba_flat_encounter_follow_up_" not in out
    # base-table reads outside the assembly (none in HVL) stay intact;
    # the CTE alias survives so column qualifiers still resolve
    assert "FROM __followup_wide follow_up" in out


def test_rewrite_follow_up_assembly_repoints_qualifiers():
    import os

    import pytest as _pytest

    from data_export_tool_spark.mamba.reports import (
        REFERENCE_SQL_DIR,
        rewrite_follow_up_assembly,
    )

    path = os.path.join(REFERENCE_SQL_DIR, "Tx_Curr_LineList.sql")
    if not os.path.exists(path):
        _pytest.skip("reference checkout not available")
    with open(path) as fh:
        sql = fh.read()
    out = rewrite_follow_up_assembly(sql)
    import re

    assert not re.search(r"\bfollow_up_\d+\s*\.", out)
    assert "follow_up.regimen" in out


def test_rewrite_follow_up_assembly_refuses_unknown_shard():
    from data_export_tool_spark.mamba.reports import (
        rewrite_follow_up_assembly,
    )

    sql = (
        "WITH FollowUp AS (SELECT follow_up.encounter_id, x "
        "FROM mamba_flat_encounter_follow_up follow_up "
        "LEFT JOIN mamba_flat_encounter_follow_up_11 follow_up_11 "
        "ON follow_up.encounter_id = follow_up_11.encounter_id) "
        "SELECT * FROM FollowUp"
    )
    assert rewrite_follow_up_assembly(sql) == sql


def test_shim_plan_reads_wide_view_from_cache(spark):
    """Plan pin for the transpile path: with the wide view registered,
    a shimmed report's physical plan reads InMemoryTableScan and never
    re-assembles the 11 shards per CTE alias."""
    import os

    import pytest as _pytest

    from data_export_tool_spark.mamba.fixture_store import (
        ensure_fixture_parquet,
    )
    from data_export_tool_spark.mamba.fixtures import WINDOW_END, WINDOW_START
    from data_export_tool_spark.mamba.reports import (
        REFERENCE_SQL_DIR,
        run_reference_report,
    )

    params = {
        "REPORT_START_DATE": WINDOW_START.isoformat(),
        "REPORT_END_DATE": WINDOW_END.isoformat(),
    }

    if not os.path.exists(
        os.path.join(REFERENCE_SQL_DIR, "Tx_Curr_HVL_LineList.sql")
    ):
        _pytest.skip("reference checkout not available")
    paths = ensure_fixture_parquet(seed=7, n_patients=40)
    df = run_reference_report(
        spark, "Tx_Curr_HVL_LineList", params, parquet_views=paths
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "InMemoryTableScan" in plan
    body = plan.split("InMemoryRelation")[0]
    # the assembly is 10 equi-joins; even ONE full re-assembly in the
    # plan body would put 10+ extra joins here
    assert body.count("SortMergeJoin") + body.count(
        "BroadcastHashJoin"
    ) < 60, "shard assembly re-inlined per CTE alias"
