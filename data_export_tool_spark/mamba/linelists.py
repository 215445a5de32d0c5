"""Reference line-list reports as Spark DataFrame pipelines.

Each function reproduces one query from
/root/reference/sql_queries/*.sql — semantics, column names, and
documented quirks — re-expressed Spark-first (window dedup operators,
broadcast dim joins, pure-column Ethiopian dates). Citations point at
the reference lines being mirrored; no SQL text is copied.

Dialect/collation policy (SURVEY.md §4.7): string comparisons are
**case-sensitive** (Spark/ANSI semantics). MySQL's default collation
is case-insensitive, so rows carrying case-variant codes
('Restart Medication', 'Female') fall out of cohorts here — a
documented, test-pinned deviation; the DuckDB oracle agrees with this
engine.

MySQL truthiness quirks are reproduced bug-compatibly where the
reference relies on them (constant-string CASE conditions are
never-true — SURVEY.md §4.1/§4.2); the oracle shim rewrites them to
FALSE so both sides agree on the reference's *actual* behavior.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_export_tool_spark.functions.datetime_ext import (
    complete_years_between,
    period_diff_months,
)
from data_export_tool_spark.functions.ethiopian import eth_date_str
from data_export_tool_spark.mamba.follow_up import assemble_follow_up
from data_export_tool_spark.operators.window_dedup import latest_per_key


def _eth_pair(col, et_name: str, gc_name: str):
    """The reference's twin-column pattern: Ethiopian 'D/M/Y' string +
    Gregorian date (Tx_Curr_LineList.sql:94-95)."""
    return [eth_date_str(col).alias(et_name), col.alias(gc_name)]


def tx_curr_linelist(
    tables: Mapping[str, DataFrame],
    report_start: dt.date,
    report_end: dt.date,
    follow_up: DataFrame | None = None,
) -> DataFrame:
    """Tx_Curr_LineList — one row per current-on-ART patient
    (Tx_Curr_LineList.sql:1-157).

    Pipeline: wide FollowUp (+ latest intake_b per client,
    :48-56) → tx_curr cohort = latest eligible visit per patient
    (W1 dedup, :58-68) filtered to on-treatment statuses (:80-85) →
    re-join the full visit row (:153-154) → broadcast dim_client
    (:156) → the 40-column projection (:88-152).
    """
    end = F.lit(report_end.isoformat()).cast("date")
    fu_wide = follow_up if follow_up is not None else assemble_follow_up(tables)

    # FollowUp CTE projection (:1-28) — rename to the reference's aliases
    fu = fu_wide.select(
        F.col("encounter_id"),
        F.col("client_id").alias("PatientId"),
        F.col("follow_up_status"),
        F.col("follow_up_date_followup_").alias("follow_up_date"),
        F.col("art_antiretroviral_start_date").alias("art_start_date"),
        F.col("assessment_date"),
        F.col("treatment_end_date"),
        F.col("antiretroviral_art_dispensed_dose_i").alias("ARTDoseDays"),
        F.col("weight_text_").alias("Weight"),
        F.col("screening_test_result_tuberculosis").alias("TB_SreeningStatus"),
        F.col("date_of_last_menstrual_period_lmp_").alias("LMP_Date"),
        F.col("anitiretroviral_adherence_level").alias("AdherenceLevel"),
        F.col("next_visit_date"),
        F.col("regimen"),
        F.col("currently_breastfeeding_child").alias("breast_feeding_status"),
        F.col("pregnancy_status"),
        F.col("diagnosis_date").alias("ActiveTBDiagnoseddate"),
        F.col("nutritional_status_of_adult"),
        F.col("nutritional_supplements_provided"),
        F.col("stages_of_disclosure"),
        F.col("date_started_on_tuberculosis_prophy"),
        F.col("method_of_family_planning"),
        F.col("patient_diagnosed_with_active_tuber").alias("ActiveTBDiagnosed"),
        F.col("dsd_category"),
        F.col("nutritional_screening_result"),
        F.col("eats_nutritious_foods"),
    )
    # latest intake_b per client (:48-56): ROW_NUMBER by encounter_id DESC
    intake = latest_per_key(
        tables["mamba_flat_encounter_intake_b"].select(
            "client_id", "encounter_id", "inh_start_date", "inh_date_completed"
        ),
        keys=["client_id"],
        order_by=["encounter_id"],
    ).select(
        F.col("client_id").alias("PatientId"), "inh_start_date", "inh_date_completed"
    )
    fu = fu.join(F.broadcast(intake), on="PatientId", how="left")

    # tx_curr_all (:58-68): latest eligible visit per patient
    eligible = fu.filter(
        F.col("follow_up_status").isNotNull()
        & F.col("art_start_date").isNotNull()
        & (F.col("follow_up_date") <= end)
    )
    w = Window.partitionBy("PatientId").orderBy(
        F.col("follow_up_date").desc(), F.col("encounter_id").desc()
    )
    tx_curr = (
        eligible.withColumn("row_num", F.row_number().over(w))
        .filter(
            (F.col("row_num") == 1)
            # on-treatment gate (:83-85)
            & (F.col("treatment_end_date") >= end)
            & F.col("follow_up_status").isin("Alive", "Restart medication")
            & (F.datediff(end, F.col("art_start_date")) >= 0)
        )
        .select("encounter_id", "PatientId", "follow_up_status", "art_start_date")
        .withColumnRenamed("follow_up_status", "tc_follow_up_status")
        .withColumnRenamed("art_start_date", "tc_art_start_date")
    )

    # FollowUp ⋈ tx_curr on encounter_id (:153-154) + dim_client (:156)
    client = tables["mamba_dim_client"]
    joined = (
        fu.join(tx_curr.drop("PatientId"), on="encounter_id", how="inner")
        .join(
            F.broadcast(client),
            fu["PatientId"] == client["client_id"],
            "left",
        )
    )

    age = complete_years_between(F.col("date_of_birth"), end)
    fp = F.col("method_of_family_planning")
    sex_for_nutrition = F.when(
        F.col("nutritional_status_of_adult").isNotNull(),
        # inner CASE (:130-141): the 15-49 branch tests the constant
        # 'FEMALE' — never true under MySQL truthiness (SURVEY §4.1) —
        # so every arm collapses to client.Sex. Reproduced faithfully.
        F.col("sex"),
    )

    return joined.select(
        F.when(F.col("sex") == "FEMALE", "F")
        .when(F.col("sex") == "MALE", "M")
        .alias("Sex"),
        F.col("Weight"),
        age.alias("Age"),
        eth_date_str(F.col("follow_up_date")).alias("FollowUpDate"),
        F.col("follow_up_date").alias("FollowUpDate_GC"),
        eth_date_str(F.col("next_visit_date")).alias("Next_visit_Date"),
        F.col("next_visit_date").alias("Next_visit_Date_GC"),
        F.substring(F.col("regimen"), 1, 2).alias("ARVRegimen"),
        F.substring(F.col("regimen"), 1, 1).alias("RegimensLine"),
        F.col("ARTDoseDays"),
        F.col("tc_follow_up_status").alias("FollowupStatus"),
        eth_date_str(F.col("treatment_end_date")).alias("ARTDoseEndDate"),
        F.col("treatment_end_date").alias("ARTDoseEndDate_DC"),
        F.col("AdherenceLevel").alias("AdheranceLevel"),
        eth_date_str(F.col("tc_art_start_date")).alias("ARTStartDate"),
        F.col("tc_art_start_date").alias("ARTStartDate_GC"),
        eth_date_str(F.col("inh_start_date")).alias("INH_Start_Date"),
        F.col("inh_start_date").alias("INH_Start_Date_GC"),
        eth_date_str(F.col("inh_date_completed")).alias("INH_Completed_Date"),
        F.col("inh_date_completed").alias("INH_Completed_Date_GC"),
        F.when(
            fp.isin(
                "Intrauterine device",
                "Vasectomy",
                "Tubal ligation procedure",
                "Implantable contraceptive (unspecified type)",
                "None",
            ),
            "LongTermFP",
        )
        .when(
            fp.isin(
                "Diaphragm",
                "Oral contraception",
                "Injectable contraceptives",
                "Condoms",
            ),
            "ShortTermFP",
        )
        .alias("FP_Status"),
        F.when(F.col("TB_SreeningStatus") == "Positive", "TB_Positive")
        .otherwise(F.col("TB_SreeningStatus"))
        .alias("TB_SreeningStatus"),
        F.col("ActiveTBDiagnosed"),
        F.col("nutritional_screening_result").alias("NutritionalScrenningStatus"),
        sex_for_nutrition.alias("SexForNutrition"),
        F.col("eats_nutritious_foods").alias("TherapeuticFoodProvided"),
        F.col("patient_uuid").alias("PatientGUID"),
        F.col("pregnancy_status").alias("IsPregnant"),
        F.col("breast_feeding_status").alias("BreastFeeding"),
        eth_date_str(F.col("LMP_Date")).alias("LMP_Date"),
        F.col("LMP_Date").alias("LMP_Date_GC"),
        period_diff_months(end, F.col("tc_art_start_date")).alias("MonthsOnART"),
        F.col("dsd_category").alias("DSD_Category"),
        F.col("stages_of_disclosure").alias("ChildDisclosueStatus"),
    )
