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
    complete_months_between,
    complete_weeks_between,
    complete_years_between,
    period_diff_months,
)
from data_export_tool_spark.functions.ethiopian import eth_date_str
from data_export_tool_spark.mamba.follow_up import assemble_follow_up
from data_export_tool_spark.mamba.schemas import HEI_IMMUNIZATION_FLAGS
from data_export_tool_spark.operators.pivot import conditional_agg
from data_export_tool_spark.operators.window_dedup import latest_per_key, ranked


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


def tx_curr_outcome(
    tables: Mapping[str, DataFrame],
    report_start: dt.date,
    report_end: dt.date,
    follow_up: DataFrame | None = None,
) -> DataFrame:
    """Tx_Curr_OutComeList — single-row cohort-transition counters
    (Tx_Curr_OutComeList.sql:1-259).

    Operator mix per SURVEY.md §2: A3 conditional pivots (SUM(IF)),
    A4 group-then-aggregate-then-aggregate, J6 anti-joins ("in current
    cohort but not previous" and vice-versa), J8 cross join of five
    1-row aggregates, U2 de-correlated TI-status.

    Spark-first shape: the cohort CTEs are computed once from the cached
    wide view; each counter block is one conditional_agg over an
    anti-joined cohort; the five 1-row results cross-join (trivially
    broadcast).
    """
    start = F.lit(report_start.isoformat()).cast("date")
    end = F.lit(report_end.isoformat()).cast("date")
    prev_end = F.date_add(F.lit(report_start.isoformat()).cast("date"), -1)

    fu_wide = follow_up if follow_up is not None else assemble_follow_up(tables)
    client = tables["mamba_dim_client"]
    fu = fu_wide.join(
        F.broadcast(client.select("client_id", "date_of_birth")), "client_id", "inner"
    ).select(
        "encounter_id",
        "client_id",
        F.col("follow_up_date_followup_").alias("follow_up_date"),
        "follow_up_status",
        F.col("art_antiretroviral_start_date").alias("art_start_date"),
        F.col("treatment_end_date").alias("art_dose_end"),
        complete_years_between(F.col("date_of_birth"), end).alias("age"),
        "date_of_birth",
        F.col("transferred_in_check_this_for_all_t").alias("__ti_flag"),
    )

    def cohort_at(cutoff) -> DataFrame:
        """latest eligible visit per client at a cutoff date
        (:32-49/:68-85); returns the rn=1 rows (unfiltered by status)."""
        eligible = fu.filter(
            F.col("follow_up_status").isNotNull()
            & F.col("art_start_date").isNotNull()
            & (F.col("follow_up_date") <= cutoff)
        )
        return ranked(
            eligible, ["client_id"], ["follow_up_date"], tiebreak="encounter_id"
        ).filter(F.col("row_num") == 1)

    def on_treatment(df: DataFrame, cutoff) -> DataFrame:
        return df.filter(
            F.col("follow_up_status").isin("Alive", "Restart medication")
            & (F.col("art_start_date") <= cutoff)
            & (F.col("follow_up_date") <= cutoff)
            & (F.col("art_dose_end") >= cutoff)
        )

    latest_rn1 = cohort_at(end).cache()
    latest = on_treatment(latest_rn1, end)
    latest_pedi = latest.filter(F.col("age") < 15)
    latest_2 = latest_rn1.filter(F.col("art_start_date") <= end)
    previous_rn1 = cohort_at(prev_end)
    previous = on_treatment(previous_rn1, prev_end)
    previous_pedi = previous.filter(F.col("age") < 15)

    # U2 reconstruction (pinned; see reports._ti_status_patches):
    # transferred-in flag on any follow-up inside [start-1, end]
    ti_clients = (
        fu.filter(
            (F.col("__ti_flag") == "Yes")
            & F.col("follow_up_date").between(prev_end, end)
        )
        .select("client_id")
        .distinct()
        .withColumn("__is_ti", F.lit(1))
    )

    status_code = (
        F.when(F.col("follow_up_status") == "Transferred out", 0)
        .when(F.col("follow_up_status") == "Stop all", 1)
        .when(F.col("follow_up_status") == "Loss to follow-up (LTFU)", 2)
        .when(F.col("follow_up_status") == "Ran away", 3)
        .when(F.col("follow_up_status") == "Dead", 4)
        .when(F.col("follow_up_status") == "Alive", 5)
        .when(F.col("follow_up_status") == "Restart medication", 6)
    )

    def added_block(latest_cohort: DataFrame, suffix: str) -> DataFrame:
        """in latest cohort but not previous (:100-142 / :143-186):
        anti-join → classify (status code, New/Established, TI/NTI) →
        count per class → pivot to fixed columns."""
        n = (
            latest_cohort.join(
                previous.select("client_id"), "client_id", "left_anti"
            )
            .join(F.broadcast(ti_clients), "client_id", "left")
            .select(
                status_code.alias("status_code"),
                F.when(
                    (F.col("art_start_date") > prev_end)
                    & (F.col("art_start_date") <= end),
                    "N",
                )
                .otherwise("E")
                .alias("new"),
                F.when(F.col("__is_ti").isNotNull(), "TI")
                .otherwise("NTI")
                .alias("TI"),
            )
        )
        grouped = n.groupBy("TI", "new", "status_code").agg(
            F.count(F.lit(1)).alias("total")
        )
        return conditional_agg(
            grouped,
            group_by=[],
            cases={
                f"Traced_Back{suffix}": (
                    (F.col("TI") == "NTI")
                    & (F.col("new") == "E")
                    & (F.col("status_code") == 5),
                    F.col("total"),
                ),
                f"Restarts{suffix}": (
                    (F.col("TI") == "NTI")
                    & (F.col("new") == "E")
                    & (F.col("status_code") == 6),
                    F.col("total"),
                ),
                f"TI{suffix}": (
                    (F.col("TI") == "TI")
                    & (F.col("new") == "E")
                    & (F.col("status_code") == 5),
                    F.col("total"),
                ),
                f"New{suffix}": (
                    (F.col("TI") == "NTI")
                    & (F.col("new") == "N")
                    & (F.col("status_code") == 5),
                    F.col("total"),
                ),
            },
        )

    def deducted_block(previous_cohort: DataFrame, suffix: str) -> DataFrame:
        """in previous cohort but not latest (:187-217 / :218-248):
        anti-join, then the client's current unfiltered latest status
        (latest_follow_up_2) is what they transitioned to."""
        dropped = previous_cohort.join(
            latest.select("client_id"), "client_id", "left_anti"
        ).select("client_id")
        fb = dropped.join(
            latest_2.select("client_id", "follow_up_status"), "client_id", "inner"
        )
        grouped = fb.select(status_code.alias("status_code")).groupBy(
            "status_code"
        ).agg(F.count(F.lit(1)).alias("total"))
        names = ["TOs", "Losts", "Drops", "Deads", "Stops", "Not_Updated"]
        codes = [0, 2, 3, 4, 1, 5]
        return conditional_agg(
            grouped,
            group_by=[],
            cases={
                f"{name}{suffix}": (F.col("status_code") == code, F.col("total"))
                for name, code in zip(names, codes)
            },
        )

    age_out = (
        latest.select("client_id", "date_of_birth")
        .join(previous.select("client_id"), "client_id", "inner")
        .filter(
            F.add_months(F.col("date_of_birth"), 15 * 12).between(start, end)
        )
        .agg(F.count(F.lit(1)).alias("AgeOut"))
    )

    return (
        added_block(latest, "")
        .crossJoin(deducted_block(previous, ""))
        .crossJoin(added_block(latest_pedi, "Pedi"))
        .crossJoin(deducted_block(previous_pedi, "Pedi"))
        .crossJoin(age_out)
    )


def tx_curr_vl_received_linelist(
    tables: Mapping[str, DataFrame],
    report_start: dt.date,
    report_end: dt.date,
    follow_up: DataFrame | None = None,
) -> DataFrame:
    """Tx_Curr_VLTestReceived_LineList — one row per patient with a VL
    result in the last 365 days (Tx_Curr_VLTestReceived_LineList.sql).

    Notable shapes: two W1 dedup stacks (latest visit, latest VL
    result), the 11-way routine-indication COALESCE chain (F3), loose
    numeric text (`hiv_viral_load`) compared and cast on use — done
    with try_cast so behavior is lenient (MySQL-like) regardless of
    the session's ANSI mode. The reference's no-op
    ``GROUP BY client_id, encounter_id`` (A5) is dropped.
    """
    end = F.lit(report_end.isoformat()).cast("date")
    fu_wide = follow_up if follow_up is not None else assemble_follow_up(tables)

    fu = fu_wide.select(
        "client_id",
        "encounter_id",
        F.col("date_viral_load_results_received").alias("viral_load_perform_date"),
        "follow_up_status",
        F.col("follow_up_date_followup_").alias("follow_up_date"),
        F.col("art_antiretroviral_start_date").alias("art_start_date"),
        "viral_load_test_status",
        F.col("hiv_viral_load").alias("viral_load_count"),
        F.coalesce(
            "at_3436_weeks_of_gestation",
            "viral_load_after_eac_confirmatory_viral_load_where_initial_v",
            "viral_load_after_eac_repeat_viral_load_where_initial_viral_l",
            "every_six_months_until_mtct_ends",
            "six_months_after_the_first_viral_load_test_at_postnatal_peri",
            "three_months_after_delivery",
            "at_the_first_antenatal_care_visit",
            "annual_viral_load_test",
            "second_viral_load_test_at_12_months_post_art",
            "first_viral_load_test_at_6_months_or_longer_post_art",
            "first_viral_load_test_at_3_months_or_longer_post_art",
        ).alias("routine_viral_load_test_indication"),
        F.coalesce(
            "repeat_or_confirmatory_vl_initial_viral_load_greater_than_10",
            "suspected_antiretroviral_failure",
        ).alias("targeted_viral_load_test_indication"),
        "pregnancy_status",
        F.col("currently_breastfeeding_child").alias("breastfeeding_status"),
        F.col("antiretroviral_art_dispensed_dose_i").alias("arv_dispensed_dose"),
        "regimen",
        "next_visit_date",
        "treatment_end_date",
        F.col("date_of_event").alias("date_hiv_confirmed"),
        F.col("weight_text_").alias("weight"),
    )

    eligible = fu.filter(
        F.col("follow_up_status").isNotNull() & F.col("art_start_date").isNotNull()
    )
    vlperf = (
        ranked(
            eligible.filter(F.col("viral_load_perform_date") <= end),
            keys=["client_id"],
            order_by=["viral_load_perform_date"],
            tiebreak="encounter_id",
        )
        .filter(F.col("row_num") == 1)
        .select(
            F.col("client_id").alias("vp_client_id"),
            F.when(
                F.col("viral_load_count").try_cast("double") > 0,
                F.col("viral_load_count").try_cast("decimal(12,0)"),
            ).alias("vp_viral_load_count"),
            F.col("viral_load_perform_date").alias("vp_viral_load_perform_date"),
            F.col("viral_load_perform_date").alias("vp_viral_load_ref_date"),
            F.col("viral_load_test_status").alias("vp_viral_load_test_status"),
            F.col("routine_viral_load_test_indication").alias("vp_routine_ind"),
            F.col("targeted_viral_load_test_indication").alias("vp_targeted_ind"),
        )
    )
    latest = (
        ranked(
            eligible.filter(F.col("follow_up_date") <= end),
            keys=["client_id"],
            order_by=["follow_up_date"],
            tiebreak="encounter_id",
        )
        .filter(F.col("row_num") == 1)
        .select(F.col("encounter_id").alias("lf_encounter_id"))
    )

    client = tables["mamba_dim_client"]
    out = (
        fu.join(latest, fu["encounter_id"] == latest["lf_encounter_id"], "inner")
        .join(vlperf, fu["client_id"] == vlperf["vp_client_id"], "left")
        .join(F.broadcast(client), "client_id", "left")
    )
    return (
        out.filter(
            F.col("vp_viral_load_perform_date").isNotNull()
            & (F.col("vp_viral_load_perform_date") >= F.date_add(end, -365))
            & (F.col("vp_viral_load_perform_date") <= end)
        )
        .select(
            F.when(F.col("sex") == "FEMALE", "F")
            .when(F.col("sex") == "MALE", "M")
            .alias("Sex"),
            F.col("weight").alias("Weight"),
            complete_years_between(F.col("date_of_birth"), end).alias("Age"),
            "date_hiv_confirmed",
            F.col("art_start_date").alias("art_start_date"),
            F.col("follow_up_date").alias("FollowUpDate"),
            F.col("pregnancy_status").alias("IsPregnant"),
            F.col("breastfeeding_status").alias("Breastfeeding"),
            F.col("regimen").alias("ARVDispendsedDose"),
            F.substring(F.col("regimen"), 1, 1).alias("ARVRegimensLine"),
            F.col("arv_dispensed_dose").alias("ARTDoseDays"),
            "next_visit_date",
            "follow_up_status",
            F.col("treatment_end_date").alias("art_dose_End"),
            F.col("vp_viral_load_perform_date").alias("viral_load_perform_date"),
            F.col("vp_viral_load_test_status").alias("viral_load_status"),
            F.col("vp_viral_load_count").alias("viral_load_count"),
            F.col("vp_viral_load_ref_date").alias("viral_load_ref_date"),
            F.concat(
                F.coalesce(F.col("vp_routine_ind"), F.lit("")),
                F.lit(" "),
                F.coalesce(F.col("vp_targeted_ind"), F.lit("")),
            ).alias("ReasonForVLTest"),
            F.when(F.col("pregnancy_status") == "Yes", "Yes")
            .when(F.col("breastfeeding_status") == "Yes", "Yes")
            .otherwise("No")
            .alias("PMTCT_ART"),
            F.col("patient_uuid").alias("PatientGUID"),
        )
    )


def tx_curr_cca_linelist(
    tables: Mapping[str, DataFrame],
    report_start: dt.date,
    report_end: dt.date,
    follow_up: DataFrame | None = None,
) -> DataFrame:
    """Tx_Curr_CCA_LineList — cervical-cancer screening line list
    (Tx_Curr_CCA_LineList.sql).

    Note the final ``client.Sex = 'Female'`` filter (:175): the data
    carries 'FEMALE'; MySQL's case-insensitive collation matches both,
    this engine's ANSI comparison matches only the literal-cased rows —
    the documented collation policy (SURVEY.md §4.7), identical on the
    oracle. The self-conjunct duplicate null-guard (:48-49) folds away.
    """
    end = F.lit(report_end.isoformat()).cast("date")
    fu_wide = follow_up if follow_up is not None else assemble_follow_up(tables)

    screen_date = (
        F.when(F.col("colposcopy_exam_date").isNotNull(), F.col("colposcopy_exam_date"))
        .when(
            F.col("date_cytology_result_received").isNotNull(),
            F.col("date_cytology_result_received"),
        )
        .when(
            F.col("date_visual_inspection_of_the_cervi").isNotNull(),
            F.col("date_visual_inspection_of_the_cervi"),
        )
        .when(
            F.col("hpv_dna_result_received_date").isNotNull(),
            F.col("hpv_dna_result_received_date"),
        )
        .when(
            F.col("follow_up_date_followup_").isNotNull()
            & (
                F.col("cervical_cancer_screening_status")
                == "Cervical cancer screening performed"
            ),
            F.col("follow_up_date_followup_"),
        )
    )
    fu = fu_wide.select(
        "encounter_id",
        "client_id",
        F.col("follow_up_date_followup_").alias("follow_up_date"),
        "follow_up_status",
        F.col("treatment_end_date").alias("art_end_date"),
        F.col("weight_text_").alias("weight"),
        F.col("next_follow_up_screening_date").alias("CCS_Next_Date"),
        F.col("cervical_cancer_screening_status").alias("screening_status"),
        F.col("hpv_dna_screening_result").alias("CCS_HPV_Result"),
        F.col("via_screening_result").alias("CCS_VIA_Result"),
        F.col("treatment_start_date").alias("CCS_Treat_Received_Date"),
        F.col("purpose_for_visit_cervical_screening").alias("screening_type"),
        F.col("cervical_cancer_screening_method_strategy").alias("screening_method"),
        F.col("treatment_of_precancerous_lesions_of_the_cervix").alias(
            "CCS_Precancerous_Treat"
        ),
        F.col("confirmed_cervical_cancer_cases_bas").alias("CCS_Suspicious_Treat"),
        F.col("reason_for_referral_cacx").alias("reason_for_eligibility_transfer_in"),
        F.col("art_antiretroviral_start_date").alias("art_start_date"),
        "next_visit_date",
        F.col("antiretroviral_art_dispensed_dose_i").alias("dose_days"),
        F.col("pre_test_counselling_for_cervical_c").alias("CCaCounsellingGiven"),
        F.col("ready_for_cervical_cancer_screening").alias("Accepted"),
        F.col("date_of_event").alias("date_hiv_confirmed"),
        F.col("transferred_in_check_this_for_all_t").alias("transfer_in"),
        "currently_breastfeeding_child",
        "pregnancy_status",
        screen_date.alias("CSS_Screen_Done_Date_Calculated"),
    )

    yn = lambda cond: F.when(cond, "Yes").otherwise("No")  # noqa: E731
    cca = (
        ranked(
            fu.filter(
                (F.col("CCaCounsellingGiven") == "Yes")
                & (F.col("CSS_Screen_Done_Date_Calculated") <= end)
            ),
            keys=["client_id"],
            order_by=["follow_up_date"],
            tiebreak="encounter_id",
        )
        .filter(F.col("row_num") == 1)
        .select(
            # cca_ prefix: the cca and latest frames share fu's lineage
            # (a self-join); disjoint names avoid ambiguous attributes
            F.col("client_id").alias("cca_client_id"),
            yn(F.col("CCaCounsellingGiven") == "Yes").alias("cca_OfferedYes"),
            yn(F.col("CCaCounsellingGiven") == "No").alias("cca_OfferedNo"),
            yn(F.col("Accepted") == "Yes").alias("cca_AcceptedYes"),
            F.lit("No").alias("cca_AcceptedNo"),  # reference: both arms 'No' (:85)
            yn(
                F.col("screening_status") == "Cervical cancer screening performed"
            ).alias("cca_ScreenDoneYes"),
            F.lit("No").alias("cca_ScreenDoneNo"),  # both arms 'No' (:89-91)
            F.col("CSS_Screen_Done_Date_Calculated").alias("cca_ScreenDone_Date"),
            F.col("screening_type").alias("cca_Screen_Type"),
            F.col("screening_method").alias("cca_Screen_Method"),
            F.col("CCS_HPV_Result").alias("cca_HPV_Result"),
            F.col("CCS_VIA_Result").alias("cca_VIA_Result"),
            F.col("CCS_Precancerous_Treat").alias("cca_Precancerous_Treat"),
            F.col("CCS_Suspicious_Treat").alias("cca_Suspicious_Treat"),
            F.col("CCS_Treat_Received_Date").alias("cca_Treat_Received_Date"),
            F.col("CCS_Next_Date").alias("cca_Next_Date"),
        )
    )

    latest = (
        ranked(
            fu.filter(
                (F.col("follow_up_date") <= end)
                & F.col("follow_up_status").isNotNull()
            ),
            keys=["client_id"],
            order_by=["follow_up_date"],
            tiebreak="encounter_id",
        )
        .filter(F.col("row_num") == 1)
        .select(F.col("encounter_id").alias("lf_encounter_id"))
    )
    lfa = fu.join(latest, fu["encounter_id"] == latest["lf_encounter_id"], "inner")

    client = tables["mamba_dim_client"]
    return (
        lfa.join(F.broadcast(client), "client_id", "inner")
        .join(cca, lfa["client_id"] == cca["cca_client_id"], "left")
        .filter(
            ((F.col("art_start_date") <= end) | F.col("art_start_date").isNull())
            & (F.col("sex") == "Female")
        )
        .select(
            F.when(F.col("sex") == "FEMALE", "F")
            .when(F.col("sex") == "MALE", "M")
            .alias("Sex"),
            F.col("weight"),
            complete_years_between(F.col("date_of_birth"), end).alias("Age"),
            F.col("cca_OfferedYes").alias("CCS_OfferedYes"),
            F.col("cca_OfferedNo").alias("CCS_OfferedNo"),
            F.col("cca_AcceptedYes").alias("CCS_AcceptedYes"),
            F.col("cca_AcceptedNo").alias("CCS_AcceptedNo"),
            F.col("cca_ScreenDoneYes").alias("CCS_ScreenDoneYes"),
            F.col("cca_ScreenDoneNo").alias("CCS_ScreenDoneNo"),
            F.col("cca_ScreenDone_Date").alias("CCS_ScreenDone_Date"),
            F.col("cca_Screen_Type").alias("CCS_Screen_Type"),
            F.col("cca_Screen_Method").alias("CCS_Screen_Method"),
            F.col("cca_HPV_Result").alias("CCS_HPV_Result"),
            F.col("cca_VIA_Result").alias("CCS_VIA_Result"),
            F.col("cca_Precancerous_Treat").alias("CCS_Precancerous_Treat"),
            F.col("cca_Suspicious_Treat").alias("CCS_Suspicious_Treat"),
            F.col("cca_Treat_Received_Date").alias("CCS_Treat_Received_Date"),
            F.col("cca_Next_Date").alias("CCS_Next_Date"),
            "date_hiv_confirmed",
            "art_start_date",
            F.col("follow_up_date").alias("FollowUpDate"),
            F.col("transfer_in").alias("Transfer_In"),
            F.col("dose_days").alias("ARTDoseDays"),
            "next_visit_date",
            "follow_up_status",
            F.col("follow_up_status").alias("FollowupStatusChar"),
            F.col("art_end_date").alias("ARTDoseEndDate"),
            F.col("patient_uuid").alias("PatientGUID"),
            F.col("currently_breastfeeding_child").alias("IsBreastfeeding"),
            F.when(
                (F.col("currently_breastfeeding_child") == "Yes")
                | (F.col("pregnancy_status") == "Yes"),
                "YES",
            )
            .otherwise("No")
            .alias("PMTCT_ART"),
        )
    )


def tx_curr_tpt_linelist(
    tables: Mapping[str, DataFrame],
    report_start: dt.date,
    report_end: dt.date,
    follow_up: DataFrame | None = None,
) -> DataFrame:
    """Tx_Curr_TPT_LineList — TB-preventive-therapy line list, one row
    per on-treatment patient (Tx_Curr_TPT_LineList.sql:1-201).

    Four W1 dedup stacks over one FollowUp selection (latest visit,
    latest TPT-type row, latest TPT start, latest TPT completion,
    :61-97), joined per client (:192-197). Mixed-type CASE branches
    (``TPT_Type`` yields 0/2/1 or the raw string, :140-144) are emitted
    as strings — MySQL/DuckDB coerce such CASEs to text anyway. The
    final day-diff guard (:201) is redundant with
    ``art_start_date <= REPORT_END_DATE`` and folds away.
    """
    end = F.lit(report_end.isoformat()).cast("date")
    fu_wide = follow_up if follow_up is not None else assemble_follow_up(tables)

    fu = fu_wide.select(
        "encounter_id",
        "client_id",
        F.col("date_of_event").alias("hiv_confirmed_date"),
        F.col("art_antiretroviral_start_date").alias("art_start_date"),
        F.col("follow_up_date_followup_").alias("followup_date"),
        F.col("weight_text_").alias("weight_in_kg"),
        F.col("antiretroviral_art_dispensed_dose_i").alias("art_dose_days"),
        "follow_up_status",
        "next_visit_date",
        F.col("date_started_on_tuberculosis_prophy").alias(
            "inhprophylaxis_started_date"
        ),
        F.col("date_completed_tuberculosis_prophyl").alias(
            "InhprophylaxisCompletedDate"
        ),
        F.col("treatment_end_date").alias("art_end_date"),
        "current_who_hiv_stage",
        "cd4_count",
        "cd4_",
        "cotrimoxazole_prophylaxis_start_dat",
        "cotrimoxazole_prophylaxis_stop_date",
        F.col("patient_diagnosed_with_active_tuber").alias("active_tb_dx"),
        "diagnosis_date",
        "tuberculosis_drug_treatment_start_d",
        "date_active_tbrx_completed",
        F.col("tb_prophylaxis_type").alias("TB_ProphylaxisType"),
        F.col("tb_prophylaxis_type_alternate_").alias("TB_ProphylaxisTypeALT"),
        F.col("tpt_followup_6h_").alias("tpt_follow_up_inh"),
        "why_eligible_reason_",
        F.col("diagnostic_test").alias("tb_specimen_type"),
        F.col("fluconazole_start_date").alias("Fluconazole_Start_Date"),
        F.col("fluconazole_stop_date").alias("Fluconazole_End_Date"),
        F.col("transferred_in_check_this_for_all_t").alias("Transfer_In"),
    )

    def _latest(df: DataFrame, order_col: str, prefix: str, cols: list[str]):
        """W1 dedup: latest row per client by ``order_col`` DESC,
        encounter_id DESC (:61-97), projected with disjoint names."""
        return (
            ranked(df, keys=["client_id"], order_by=[order_col], tiebreak="encounter_id")
            .filter(F.col("row_num") == 1)
            .select(
                F.col("client_id").alias(f"{prefix}_client_id"),
                *[F.col(c).alias(f"{prefix}_{c}") for c in cols],
            )
        )

    tpt_type = _latest(
        fu.filter(
            (F.col("followup_date") <= end) & F.col("TB_ProphylaxisType").isNotNull()
        ),
        "followup_date",
        "tt",
        ["TB_ProphylaxisType", "TB_ProphylaxisTypeALT", "tpt_follow_up_inh"],
    )
    tpt_start = _latest(
        fu.filter(
            F.col("inhprophylaxis_started_date").isNotNull()
            & (F.col("followup_date") <= end)
        ),
        "inhprophylaxis_started_date",
        "ts",
        ["inhprophylaxis_started_date"],
    )
    tpt_completed = _latest(
        fu.filter(
            F.col("InhprophylaxisCompletedDate").isNotNull()
            & (F.col("followup_date") <= end)
        ),
        "InhprophylaxisCompletedDate",
        "tc",
        ["InhprophylaxisCompletedDate"],
    )
    latest_visit = (
        ranked(
            fu.filter(
                F.col("follow_up_status").isNotNull() & (F.col("followup_date") <= end)
            ),
            keys=["client_id"],
            order_by=["followup_date"],
            tiebreak="encounter_id",
        )
        .filter(F.col("row_num") == 1)
        .select(F.col("encounter_id").alias("lf_encounter_id"))
    )

    client = tables["mamba_dim_client"]
    cohort = (
        fu.join(latest_visit, fu["encounter_id"] == latest_visit["lf_encounter_id"], "inner")
        .join(F.broadcast(client), "client_id", "left")
        .filter(
            (F.col("art_end_date") >= end)
            & F.col("follow_up_status").isin("Alive", "Restart medication")
            & (F.col("art_start_date") <= end)
        )
    )

    out = (
        cohort.join(tpt_start, cohort["client_id"] == tpt_start["ts_client_id"], "left")
        .join(tpt_completed, cohort["client_id"] == tpt_completed["tc_client_id"], "left")
        .join(tpt_type, cohort["client_id"] == tpt_type["tt_client_id"], "left")
    )
    tpt_type_col = F.col("tt_TB_ProphylaxisType")
    tpt_type_alt = F.col("tt_TB_ProphylaxisTypeALT")
    return out.select(
        F.when(F.col("sex") == "FEMALE", "F")
        .when(F.col("sex") == "MALE", "M")
        .alias("Sex"),
        F.col("weight_in_kg").alias("Weight"),
        complete_years_between(F.col("date_of_birth"), end).alias("Age"),
        F.col("ts_inhprophylaxis_started_date").alias("TPT_Started_Date"),
        F.col("tc_InhprophylaxisCompletedDate").alias("TPT_Completed_Date"),
        F.when(tpt_type_col == "6H", "0")
        .when(tpt_type_col == "3HP", "2")
        .when(tpt_type_col == "Continuous", "1")
        .otherwise(tpt_type_col)
        .alias("TPT_Type"),
        F.when(tpt_type_alt == "3HP", "0")
        .when(tpt_type_alt == "3HR", "1")
        .otherwise(tpt_type_alt)
        .alias("TPT_TypeAlt"),
        F.when(tpt_type_col == "6H", "INH")
        .when(tpt_type_col == "3HP", "3HP")
        .otherwise("")
        .alias("TPT_TypeChar"),
        F.col("hiv_confirmed_date").alias("HIV_Confirmed_Date"),
        F.col("art_start_date").alias("ART_Start_Date"),
        F.col("followup_date").alias("FollowUpDate"),
        "Transfer_In",
        F.col("art_dose_days").alias("ARTDoseDays"),
        F.col("next_visit_date").alias("Next_visit_Date"),
        F.when(F.col("follow_up_status") == "Transferred out", 0)
        .when(F.col("follow_up_status") == "Stop all", 1)
        .when(F.col("follow_up_status") == "Loss to follow-up (LTFU)", 2)
        .when(F.col("follow_up_status") == "Ran away", 3)
        .when(F.col("follow_up_status") == "Dead", 4)
        .when(F.col("follow_up_status") == "Alive", 5)
        .when(F.col("follow_up_status") == "Restart medication", 6)
        .alias("FollowupStatus"),
        F.col("follow_up_status").alias("FollowupStatusChar"),
        F.col("art_end_date").alias("ARTDoseEndDate"),
        F.col("patient_uuid").alias("PatientGUID"),
        F.col("current_who_hiv_stage").alias("WHOStage"),
        F.col("cd4_count").alias("AdultCD4Count"),
        F.col("cd4_").alias("ChildCD4Count"),
        *_eth_pair(
            F.col("cotrimoxazole_prophylaxis_start_dat"),
            "CPT_StartDate",
            "CPT_StartDate_GC",
        ),
        *_eth_pair(
            F.col("cotrimoxazole_prophylaxis_stop_date"),
            "CPT_StopDate",
            "CPT_StopDate_GC",
        ),
        F.col("tb_specimen_type").alias("TB_SpecimenType"),
        F.col("active_tb_dx").alias("ActiveTBDiagnosed"),
        *_eth_pair(
            F.col("diagnosis_date"), "ActiveTBDignosedDate", "ActiveTBDignosedDate_GC"
        ),
        *_eth_pair(
            F.col("tuberculosis_drug_treatment_start_d"),
            "TBTx_StartDate",
            "TBTx_StartDate_GC",
        ),
        *_eth_pair(
            F.col("date_active_tbrx_completed"),
            "TBTx_CompletedDate",
            "TBTx_CompletedDate_GC",
        ),
        *_eth_pair(
            F.col("Fluconazole_Start_Date"),
            "FluconazoleStartDate",
            "FluconazoleStartDate_GC",
        ),
        *_eth_pair(
            F.col("Fluconazole_End_Date"), "FluconazoleEndDate", "FluconazoleEndDate_GC"
        ),
    )


def pmtct_maternal_linelist(
    tables: Mapping[str, DataFrame],
    report_start: dt.date,
    report_end: dt.date,
    follow_up: DataFrame | None = None,
) -> DataFrame:
    """PMTCT_Maternal_LineList — one row per PMTCT enrollment episode
    (PMTCT_Maternal_LineList.sql:1-177).

    Operator mix per SURVEY.md §2: J4 positional episode join
    (enrollment↔discharge matched by client + row_num + date
    inequality), W3 conditional-ORDER-BY windows (rank only in-episode
    events), W4 four ROW_NUMBERs in one pass consumed by four aliases
    of the ranked relation, J3 rank-predicate joins.

    Spark-first shape: the four windows share one
    ``Window.partitionBy(enrollment_id)`` Exchange; each consumer is a
    rank-filtered self-reference of the single ranked DataFrame. The
    tie-break pins from reports.QUERY_PATCHES apply here natively
    (encounter_id DESC on the VL windows).
    """
    end = F.lit(report_end.isoformat()).cast("date")
    fu_wide = follow_up if follow_up is not None else assemble_follow_up(tables)

    # Enrollment / Discharge ranked positionally (:1-22)
    enr = ranked(
        tables["mamba_flat_encounter_pmtct_enrollment"],
        keys=["client_id"],
        order_by=["date_of_enrollment_or_booking"],
        descending=False,
        tiebreak="encounter_id",
    )
    dis = ranked(
        tables["mamba_flat_encounter_pmtct_discharge"],
        keys=["client_id"],
        order_by=["discharge_date"],
        descending=False,
        tiebreak="encounter_id",
    ).select(
        F.col("client_id").alias("d_client_id"),
        F.col("row_num").alias("d_row_num"),
        "discharge_date",
        "reason_for_discharge_from_pmtct",
    )

    # Episode_Window (:23-42): positional pairing + date inequality (J4)
    ew = (
        enr.join(
            dis,
            on=(enr["client_id"] == dis["d_client_id"])
            & (enr["row_num"] == dis["d_row_num"])
            & (dis["discharge_date"] > enr["date_of_enrollment_or_booking"]),
            how="left",
        )
        .select(
            enr["client_id"],
            enr["encounter_id"].alias("enrollment_id"),
            "antenatal_care_provider",
            "ld_client",
            "post_natal_care",
            "art_clinic",
            enr["date_of_enrollment_or_booking"].alias("start_date"),
            "discharge_date",
            "reason_for_discharge_from_pmtct",
            F.col("reason_for_discharge_from_pmtct").alias("discharge_outcome"),
            enr["currently_breastfeeding_child"].alias("ew_breastfeeding"),
            enr["pregnancy_status"].alias("ew_pregnancy"),
            enr["date_referred_to_pmtct"].alias("ew_date_referred"),
            F.coalesce("discharge_date", end).alias("effective_end_date"),
        )
    )

    # FollowUp projection (:44-100) from the cached wide view
    fu = fu_wide.select(
        "encounter_id",
        F.col("client_id").alias("PatientId"),
        "follow_up_status",
        F.col("follow_up_date_followup_").alias("follow_up_date"),
        F.col("art_antiretroviral_start_date").alias("art_start_date"),
        F.col("antiretroviral_art_dispensed_dose_i").alias("ARTDoseDays"),
        F.col("anitiretroviral_adherence_level").alias("AdherenceLevel"),
        "regimen",
        "pregnancy_status",
        "nutritional_status_of_adult",
        F.col("cd4_count"),
        F.col("date_of_reported_hiv_viral_load").alias("viral_load_sent_date"),
        F.col("date_viral_load_results_received").alias("viral_load_perform_date"),
        "dsd_category",
        "next_visit_date",
        "weight_text_",
        F.coalesce(
            "at_3436_weeks_of_gestation",
            "viral_load_after_eac_confirmatory_viral_load_where_initial_v",
            "viral_load_after_eac_repeat_viral_load_where_initial_viral_l",
            "every_six_months_until_mtct_ends",
            "six_months_after_the_first_viral_load_test_at_postnatal_peri",
            "three_months_after_delivery",
            "at_the_first_antenatal_care_visit",
            "annual_viral_load_test",
            "second_viral_load_test_at_12_months_post_art",
            "first_viral_load_test_at_6_months_or_longer_post_art",
            "first_viral_load_test_at_3_months_or_longer_post_art",
        ).alias("routine_viral_load_test_indication"),
        F.coalesce(
            "repeat_or_confirmatory_vl_initial_viral_load_greater_than_10",
            "suspected_antiretroviral_failure",
        ).alias("targeted_viral_load_test_indication"),
        "viral_load_test_status",
    )

    # Events_Ranked (:102-139): 4 windows over one episode-joined
    # relation — one partitioning, four row_numbers (W3/W4). The VL
    # windows carry the canonical encounter tie-break the engine pins
    # (reports.QUERY_PATCHES, SURVEY.md §4.8).
    events = ew.select(
        "enrollment_id", "client_id", "start_date", "effective_end_date"
    ).join(fu, ew["client_id"] == fu["PatientId"], "left")

    def in_episode(col):
        return F.when(
            F.col(col).between(F.col("start_date"), F.col("effective_end_date")),
            F.col(col),
        )

    w = Window.partitionBy("enrollment_id")
    events = events.select(
        "*",
        F.row_number()
        .over(
            w.orderBy(
                in_episode("follow_up_date").desc(), F.col("encounter_id").desc()
            )
        )
        .alias("rn_latest_visit"),
        F.row_number()
        .over(
            w.orderBy(
                in_episode("viral_load_sent_date").desc(),
                F.col("encounter_id").desc(),
            )
        )
        .alias("rn_latest_vl_sent"),
        F.row_number()
        .over(
            w.orderBy(
                in_episode("viral_load_perform_date").desc(),
                F.col("encounter_id").desc(),
            )
        )
        .alias("rn_latest_vl_res"),
    )

    visit = events.filter(F.col("rn_latest_visit") == 1).select(
        F.col("enrollment_id").alias("v_eid"),
        "weight_text_",
        "art_start_date",
        "follow_up_date",
        "follow_up_status",
        "regimen",
        "ARTDoseDays",
        "nutritional_status_of_adult",
        "AdherenceLevel",
        "next_visit_date",
    )
    vl_s = events.filter(F.col("rn_latest_vl_sent") == 1).select(
        F.col("enrollment_id").alias("s_eid"),
        "viral_load_sent_date",
        "routine_viral_load_test_indication",
        "targeted_viral_load_test_indication",
        "cd4_count",
    )
    vl_r = events.filter(F.col("rn_latest_vl_res") == 1).select(
        F.col("enrollment_id").alias("r_eid"),
        "viral_load_perform_date",
        "viral_load_test_status",
    )
    # the reference also computes rn_latest_dsd and joins a `dsd` alias
    # (:127-139,:176-177) but never selects any of its columns; since
    # rn=1 is unique per enrollment the join can't change cardinality,
    # so the engine omits that window and join entirely.

    client = tables["mamba_dim_client"]
    return (
        ew.join(F.broadcast(client), "client_id", "left")
        .join(visit, ew["enrollment_id"] == visit["v_eid"], "left")
        .join(vl_s, ew["enrollment_id"] == vl_s["s_eid"], "left")
        .join(vl_r, ew["enrollment_id"] == vl_r["r_eid"], "left")
        .select(
            F.col("patient_uuid").alias("PatientGUID"),
            F.col("sex").alias("Sex"),
            complete_years_between(F.col("date_of_birth"), end).alias("Age"),
            F.col("weight_text_").alias("Weight"),
            F.col("start_date").alias("BookingDate"),
            F.col("art_start_date").alias("ArtStartDate"),
            # the reference emits BookingDate twice (:144,:146)
            F.col("start_date").alias("BookingDate"),
            F.coalesce(
                "art_clinic", "antenatal_care_provider", "ld_client", "post_natal_care"
            ).alias("StatusatEnrollment"),
            F.col("ew_date_referred").alias("DateReferredtoPMTCT"),
            F.col("ew_pregnancy").alias("IsPregnant"),
            F.col("ew_breastfeeding").alias("IsBreastfeeding"),
            F.col("discharge_date").alias("DateofDischarge"),
            F.col("reason_for_discharge_from_pmtct").alias("ReasonforDischarge"),
            F.col("discharge_outcome").alias("MaternalPMTCTFinalOutcome"),
            F.col("follow_up_date").alias("LatestFollowupDate"),
            F.col("follow_up_status").alias("LatestFollowupStatus"),
            F.col("regimen").alias("Regimen"),
            F.col("ARTDoseDays").alias("Dose"),
            F.col("nutritional_status_of_adult").alias("NutritionalStatus"),
            F.col("AdherenceLevel").alias("Adherence"),
            F.col("viral_load_sent_date").alias("Viral_Load_Sent_Date"),
            F.coalesce(
                "routine_viral_load_test_indication",
                "targeted_viral_load_test_indication",
            ).alias("Viral_Load_Indication"),
            F.col("viral_load_perform_date").alias("Viral_Load_Received_Date"),
            F.col("viral_load_test_status").alias("LatestVLStatus"),
            F.col("cd4_count").alias("CD4Count"),
            F.col("next_visit_date").alias("NextVisitDate"),
        )
    )


#: immunization flag column → output label (PMTCT_HEI_LineList.sql:64-83)
_IMMUNIZATION_LABELS = {
    flag: flag.replace("_taken", "").replace("_", "").upper()
    for flag in HEI_IMMUNIZATION_FLAGS
}


def pmtct_hei_linelist(
    tables: Mapping[str, DataFrame],
    report_start: dt.date,
    report_end: dt.date,
) -> DataFrame:
    """PMTCT_HEI_LineList — one row per HIV-exposed infant with an
    in-window follow-up (PMTCT_HEI_LineList.sql:1-204).

    Operator mix per SURVEY.md §2: W1 dedup (enrollment, lab, final
    outcome), W2 earliest (CPT start), A1 MAX-flag aggregation rolled
    into CONCAT_WS (immunizations), J6 anti-join shape (Future_Visit
    existence → missed days), plus the 22-branch CASE ladders.
    """
    start = F.lit(report_start.isoformat()).cast("date")
    end = F.lit(report_end.isoformat()).cast("date")

    # HEI_Enrollment (:1-15): latest enrollment ≤ end
    enr = ranked(
        tables["mamba_flat_encounter_hei_enrollment"].filter(
            F.col("date_enrolled_in_care") <= end
        ),
        keys=["client_id"],
        order_by=["date_enrolled_in_care"],
        tiebreak="encounter_id",
    )

    # HEI_FollowUp (:16-46): in-window visits ranked latest-first, with
    # the followup_1 shard attached
    fu = (
        tables["mamba_flat_encounter_hei_followup"]
        .join(tables["mamba_flat_encounter_hei_followup_1"], "encounter_id", "left")
        .filter(F.col("followup_date_followup").between(start, end))
        .withColumnRenamed("followup_date_followup", "follow_up_date")
        .withColumn(
            "infant_feeding_practice",
            F.coalesce(
                F.col("infant_feeding_practice_within_the_first_6_months_of_life"),
                F.col("infant_feeding_practice_older_than_6_months_of_life"),
            ),
        )
    )
    fu = ranked(fu, ["client_id"], ["follow_up_date"], tiebreak="encounter_id").filter(
        F.col("row_num") == 1
    )

    # HEI_Lab (:47-59): latest DNA-PCR sample ≤ end
    lab = ranked(
        tables["mamba_flat_encounter_hei_hiv_test"].filter(
            F.col("dna_pcr_sample_collection_date") <= end
        ),
        keys=["client_id"],
        order_by=["dna_pcr_sample_collection_date"],
        tiebreak="encounter_id",
    ).filter(F.col("row_num") == 1)

    # Immunization (:61-85): MAX flag per client → CONCAT_WS label list
    imm_src = tables["mamba_flat_encounter_hei_immunization"]
    imm = imm_src.groupBy("client_id").agg(
        F.concat_ws(
            ", ",
            *[
                F.when(F.max(flag) == "Yes", F.lit(label))
                for flag, label in _IMMUNIZATION_LABELS.items()
            ],
        ).alias("Immunizations")
    )

    # CPT_Start (:86-102): earliest dosed follow-up (NULL dates sort
    # first under ASC — MySQL/Spark agree); CPT_Stop (:103-111): MAX
    # date with dose = 'DC'
    hei_fu_all = tables["mamba_flat_encounter_hei_followup"].join(
        tables["mamba_flat_encounter_hei_followup_1"], "encounter_id"
    )
    cpt_start = (
        ranked(
            hei_fu_all.filter(
                F.col("cotrimoxazole_prophylaxis_dose").isNotNull()
                & (F.col("cotrimoxazole_prophylaxis_dose") != "")
            ),
            keys=["client_id"],
            order_by=["followup_date_followup"],
            descending=False,
        )
        .filter(F.col("row_num") == 1)
        .select(
            "client_id",
            F.col("followup_date_followup").alias("CPTStartDate"),
            F.col("cotrimoxazole_prophylaxis_dose").alias("CPTDose"),
        )
    )
    cpt_stop = (
        hei_fu_all.filter(F.col("cotrimoxazole_prophylaxis_dose") == "DC")
        .groupBy("client_id")
        .agg(F.max("followup_date_followup").alias("CPTDiscontinuedDate"))
    )

    # FinalOutcome (:112-121) / Future_Visit (:122-128)
    fo = ranked(
        tables["mamba_flat_encounter_hei_final_outcome"].filter(
            F.col("date_when_final_outcome_was_known") <= end
        ),
        keys=["client_id"],
        order_by=["date_when_final_outcome_was_known"],
    ).filter(F.col("row_num") == 1)
    future = (
        tables["mamba_flat_encounter_hei_followup"]
        .filter(F.col("followup_date_followup") > end)
        .select("client_id")
        .distinct()
        .withColumn("has_future_visit", F.lit(1))
    )

    client = tables["mamba_dim_client"]
    j = (
        fu.alias("f")
        .join(client.alias("client"), "client_id", "inner")
        .join(
            enr.filter(F.col("row_num") == 1)
            .select(
                "client_id", "date_enrolled_in_care", "hei_code", "infant_referred",
                "referring_facility_name", "arv_prophylaxis",
                F.col("weight_text").alias("birth_weight"),
                "mothers_pmtct_interventions",
            )
            .alias("enr"),
            "client_id",
            "left",
        )
        .join(
            lab.select(
                "client_id", "dna_pcr_sample_collection_date",
                "date_dbs_result_received", "hiv_test_result",
                "rapid_antibody_result", "test_type",
                "reason_sample_rejected_or_test_not_done",
            ).alias("lab"),
            "client_id",
            "left",
        )
        .join(F.broadcast(imm), "client_id", "left")
        .join(F.broadcast(cpt_start), "client_id", "left")
        .join(F.broadcast(cpt_stop), "client_id", "left")
        .join(
            fo.select(
                "client_id", "hei_pmtct_final_outcome",
                "date_when_final_outcome_was_known",
                "name_of_where_patient_was_referred_to",
            ).alias("fo"),
            "client_id",
            "left",
        )
        .join(F.broadcast(future), "client_id", "left")
    )

    conclusion = (
        F.when(
            F.col("no_clinical_or_laboratory_evidence_of_hiv") == "Yes",
            "No Clinical or laboratory evidence of HIV",
        )
        .when(F.col("clinical_evidence_of_hiv") == "Yes", "Clinical evidence of HIV")
        .when(
            F.col("laboratory_evidence_of_hiv_dna_pcr_antibody_tests") == "Yes",
            "Laboratory evidence of HIV(DNA PCR Test)",
        )
        .otherwise("")
    )
    decision = (
        F.when(
            F.col("continue_to_followup") == "Yes",
            "Continue follow-up – Still on BF/Exposed",
        )
        .when(F.col("transferred_out") == "Yes", "TO")
        .when(F.col("lost_to_followup") == "Yes", "Lost to follow up")
        .when(F.col("died") == "Yes", "Died")
        .when(
            F.col("referred_for_pediatric_hiv_care_within_facility") == "Yes",
            "Positive - Referred for Pediatric HIV care within facility",
        )
        .when(
            F.col("referred_pediatric_hiv_care_outside_facility") == "Yes",
            "Positive - Referred for Pediatric HIV care outside facility",
        )
        .when(
            F.col("discharged_negative_form_care_hiv_free") == "Yes",
            "Discharged Negative from care (HIV Free)",
        )
        .otherwise(F.col("decision"))
    )

    return j.select(
        F.col("patient_uuid").alias("PatientGUID"),
        F.when(F.col("sex") == "FEMALE", "F")
        .when(F.col("sex") == "MALE", "M")
        .alias("Sex"),
        F.col("date_of_birth").alias("DOB"),
        complete_years_between(F.col("date_of_birth"), end).alias("AgeYear"),
        complete_months_between(F.col("date_of_birth"), F.col("follow_up_date")).alias(
            "AgeMonth"
        ),
        complete_weeks_between(F.col("date_of_birth"), F.col("follow_up_date")).alias(
            "AgeInWeeks"
        ),
        F.col("birth_weight").alias("BirthWeight"),
        F.col("hei_code").alias("HEICode"),
        F.col("infant_referred").alias("InfantReferred"),
        F.col("referring_facility_name").alias("InfantReferingFacility"),
        F.col("date_enrolled_in_care").alias("EnrollmentDate"),
        eth_date_str(F.col("date_enrolled_in_care")).alias("EnrollmentDateET"),
        F.col("arv_prophylaxis").alias("InfantARVProphylaxis"),
        F.col("mothers_pmtct_interventions").alias("MotherPMTCTIntervention"),
        F.col("follow_up_date").alias("FollowupDate"),
        eth_date_str(F.col("follow_up_date")).alias("FollowupDateET"),
        F.col("weight_text_").alias("Weight"),
        F.col("growth_pattern").alias("GrowthPattern"),
        F.col("reason_for_growth_failure").alias("ReasonforGrowthFailure"),
        F.col("developmental_milestone_for_children").alias("DevelopmentMilestone"),
        F.col("reason_for_red_flag").alias("ReasonforRedFlag"),
        F.col("infant_feeding_practice").alias("InfantFeedingPractice"),
        F.col("mother_s_breast_condition").alias("MotherBreastCondition"),
        F.col("rapid_antibody_result").alias("RapidAntibodyTest"),
        F.col("test_type").alias("TestIndication"),
        F.col("dna_pcr_sample_collection_date").alias("DNAPCRSampleCollectionDate"),
        eth_date_str(F.col("dna_pcr_sample_collection_date")).alias(
            "DNAPCRSampleCollectionDateET"
        ),
        F.col("date_dbs_result_received").alias("DateofDBSResultReceived"),
        F.col("hiv_test_result").alias("DNAPCRResult"),
        F.datediff(
            F.col("date_dbs_result_received"),
            F.col("dna_pcr_sample_collection_date"),
        ).alias("TAT"),
        F.col("reason_sample_rejected_or_test_not_done").alias("Reason"),
        F.col("CPTStartDate"),
        F.col("CPTDose"),
        eth_date_str(F.col("CPTDiscontinuedDate")).alias("CPTDiscontinuedDate"),
        conclusion.alias("Conclusion"),
        decision.alias("Decision"),
        F.col("next_visit_date").alias("NextVisitDate"),
        F.col("hei_pmtct_final_outcome").alias("HEIPMTCTFinalOutcome"),
        F.col("date_when_final_outcome_was_known").alias("DateofFinalOutcome"),
        eth_date_str(F.col("date_when_final_outcome_was_known")).alias(
            "DateofFinalOutcomeET"
        ),
        F.col("Immunizations").alias("IMMUNIZATION"),
        F.when(
            (F.col("next_visit_date") < end) & F.col("has_future_visit").isNull(),
            F.datediff(end, F.col("next_visit_date")),
        ).alias("Missed_Days"),
        F.col("name_of_where_patient_was_referred_to").alias("ReferredTo"),
        complete_months_between(
            F.col("date_of_birth"), F.col("dna_pcr_sample_collection_date")
        ).alias("AgeSampleCollectionMonth"),
        complete_weeks_between(
            F.col("date_of_birth"), F.col("dna_pcr_sample_collection_date")
        ).alias("AgeSampleCollectionInWeeks"),
        complete_years_between(
            F.col("date_of_birth"), F.col("dna_pcr_sample_collection_date")
        ).alias("AgeSampleCollectionYear"),
    )
