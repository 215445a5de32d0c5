"""Explicit schemas for the MambaETL clinical star schema.

Column inventory distilled from every column the 12 reference queries
touch (FIXTURES.md; sites cited there). The logical ``follow_up``
encounter is one wide row physically sharded across 11 tables keyed by
``encounter_id`` (the reference reassembles them with an 11-way LEFT
JOIN in every query, Tx_Curr_LineList.sql:29-47). Shard pins that the
reference names explicitly are preserved
(`_1.regimen`, `_2.weight_text_`, `_4.pregnancy_status`,
`_7.art_antiretroviral_start_date`,
`_8.date_of_last_menstrual_period_lmp_` — Tx_Curr_LineList.sql:5-16);
everything else is distributed round-robin, which queries never depend
on.

Types follow reference usage (SURVEY.md §1): ``long`` ids, ``date``
event dates, ``string`` coded answers, and **string for numerics the
reference casts on use** (``hiv_viral_load``, ``cd4_count``,
``weight_text_``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---- follow_up logical columns -------------------------------------------

#: date-typed follow-up columns
FOLLOW_UP_DATE_COLS: tuple[str, ...] = (
    "follow_up_date_followup_",
    "art_antiretroviral_start_date",
    "treatment_end_date",
    "next_visit_date",
    "assessment_date",
    "date_of_last_menstrual_period_lmp_",
    "date_of_event",
    "date_of_reported_hiv_viral_load",
    "date_viral_load_results_received",
    "visitect_cd4_test_date",
    "diagnosis_date",
    "tuberculosis_drug_treatment_start_d",
    "date_active_tbrx_completed",
    "date_active_tbrx_dc",
    "date_started_on_tuberculosis_prophy",
    "date_completed_tuberculosis_prophyl",
    "date_discontinued_tuberculosis_prop",
    "cotrimoxazole_prophylaxis_start_dat",
    "cotrimoxazole_prophylaxis_stop_date",
    "fluconazole_start_date",
    "fluconazole_stop_date",
    "date_first_enhanced_adherence_counseling_provided",
    "date_second_enhanced_adherence_counseling_provided",
    "date_third_enhanced_adherence_counseling_provided",
    # cervical-cancer screening dates
    "date_hpv_test_was_done",
    "hpv_dna_result_received_date",
    "date_visual_inspection_of_the_cervi",
    "cytology_sample_collection_date",
    "date_cytology_result_received",
    "colposcopy_exam_date",
    "biopsy_sample_collected_date",
    "biopsy_result_received_date",
    "treatment_start_date",
    "next_follow_up_screening_date",
    "date_patient_referred_out",
    "date_client_arrived_in_the_referred",
    "date_client_served_in_the_referred_",
    "date_counseling_given",
    # also present on the follow-up form (referenced bare inside the
    # Maternal FollowUp CTE, PMTCT_Maternal_LineList.sql:59)
    "date_referred_to_pmtct",
)

#: opportunistic-infection Yes/No flags (Tx_Curr_AHD_LineList.sql:49-67)
OI_FLAG_COLS: tuple[str, ...] = (
    "are_there_any_ois_",
    "herpes_zoster",
    "bacterial_pneumonia",
    "extra_pulmonary_tuberculosis_tb",
    "candidiasis_of_the_esophagus",
    "candidiasis_vaginal",
    "mouth_ulcer",
    "diarrhea_chronic",
    "acute_diarrhea",
    "toxoplasmosis",
    "meningitis_cryptococcal",
    "kaposi_sarcoma_oral",
    "suspected_cervical_cancer",
    "pulmonary_tuberculosis_tb",
    "candidiasis_oral",
    "pneumocystis_carinii_pneumonia_pcp",
    "malignant_lymphoma_nonhodgkins",
    "female_genital_ulcer_disease",
    "other_opportunistic_illnesses",
)

#: the 11-way routine VL-indication COALESCE chain
#: (Tx_Curr_VLTestReceived_LineList.sql:10-22)
VL_ROUTINE_INDICATION_COLS: tuple[str, ...] = (
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
)

#: string-typed follow-up columns (coded answers + loose numerics)
FOLLOW_UP_STRING_COLS: tuple[str, ...] = (
    "follow_up_status",
    "antiretroviral_art_dispensed_dose_i",
    "weight_text_",
    "height",
    "regimen",
    "regimen_change",
    "anitiretroviral_adherence_level",  # sic — reference typo preserved
    "pregnancy_status",
    "currently_breastfeeding_child",
    "dsd_category",
    "transferred_in_check_this_for_all_t",
    "current_who_hiv_stage",
    "cd4_count",
    "cd4_",
    "current_functional_status",
    "method_of_family_planning",
    "nutritional_status_of_adult",
    "nutritional_status_of_older_child_a",
    "weight_for_age_status",
    "nutritional_screening_result",
    "nutritional_supplements_provided",
    "eats_nutritious_foods",
    "stages_of_disclosure",
    "crag",
    "visitect_cd4_result",
    "other_medications_med_1",
    "other_medications_med2",
    "viral_load_received_",
    "viral_load_test_status",
    "hiv_viral_load",
    "hiv_viral_load_status",
    "viral_load_test_indication",
    "repeat_or_confirmatory_vl_initial_viral_load_greater_than_10",
    "suspected_antiretroviral_failure",
    "screening_test_result_tuberculosis",
    "was_the_patient_screened_for_tuberc",
    "patient_diagnosed_with_active_tuber",
    "tb_prophylaxis_type",
    "tb_prophylaxis_type_alternate_",
    "tpt_followup_6h_",
    "eligible_for_tpt",
    "why_eligible_reason_",
    "tpt_dispensed_dose_in_days_inh_",
    "tpt_dispensed_dose_in_days_alternat",
    "tpt_side_effects",
    "Adherence",
    "diagnostic_test",
    "tb_diagnostic_test_result",
    "lf_lam_result",
    "gene_xpert_result",
    # cervical-cancer screening
    "cervical_cancer_screening_status",
    "purpose_for_visit_cervical_screening",
    "cervical_cancer_screening_method_strategy",
    "hpv_dna_screening_result",
    "hpv_subtype",
    "via_done_",
    "via_screening_result",
    "cytology_result",
    "colposcopy_of_cervix_findings",
    "biopsy_result",
    "treatment_of_precancerous_lesions_of_the_cervix",
    "confirmed_cervical_cancer_cases_bas",
    "referral_or_linkage_status",
    "reason_for_referral_cacx",
    "prep_offered",
    "pre_test_counselling_for_cervical_c",
    "ready_for_cervical_cancer_screening",
) + OI_FLAG_COLS + VL_ROUTINE_INDICATION_COLS

#: reference-pinned shard placements (Tx_Curr_LineList.sql:5-16)
SHARD_PINS: dict[str, int] = {
    "follow_up_status": 0,
    "follow_up_date_followup_": 0,
    "regimen": 1,
    "weight_text_": 2,
    "pregnancy_status": 4,
    "art_antiretroviral_start_date": 7,
    "date_of_last_menstrual_period_lmp_": 8,
}

NUM_SHARDS = 11  # mamba_flat_encounter_follow_up + _1 ... _10


def follow_up_shard_assignment() -> dict[str, int]:
    """column → shard index for every logical follow-up column.

    Non-pinned columns round-robin over shards 0-9 only: every
    reference query joins shards 1-9 but only four join ``_10``
    (grep over sql_queries/), and bare column references must resolve
    in every query that uses them. Shard 10 therefore carries only
    ``encounter_id`` in the fixture schema — its join stays exercised,
    its columns are never referenced.
    """
    assignment: dict[str, int] = dict(SHARD_PINS)
    rr = 0
    for col in FOLLOW_UP_DATE_COLS + FOLLOW_UP_STRING_COLS:
        if col in assignment:
            continue
        assignment[col] = rr % (NUM_SHARDS - 1)
        rr += 1
    return assignment


def follow_up_shard_schemas() -> dict[str, StructType]:
    """table name → schema for the 11 physical shard tables."""
    assignment = follow_up_shard_assignment()
    date_set = set(FOLLOW_UP_DATE_COLS)
    shards: dict[int, list[StructField]] = {
        i: [StructField("encounter_id", LongType())] for i in range(NUM_SHARDS)
    }
    shards[0].append(StructField("client_id", LongType()))
    for col, shard in sorted(assignment.items()):
        typ = DateType() if col in date_set else StringType()
        shards[shard].append(StructField(col, typ))
    out: dict[str, StructType] = {}
    for i, fields in shards.items():
        name = "mamba_flat_encounter_follow_up" + ("" if i == 0 else f"_{i}")
        out[name] = StructType(fields)
    return out


# ---- dimensions & other encounter tables ---------------------------------

DIM_CLIENT = StructType(
    [
        StructField("client_id", LongType()),
        StructField("patient_uuid", StringType()),
        StructField("sex", StringType()),
        StructField("date_of_birth", DateType()),
        StructField("current_age", IntegerType()),
        StructField("mrn", StringType()),
        StructField("patient_name", StringType()),
        StructField("mobile_no", StringType()),
    ]
)

INTAKE_B = StructType(
    [
        StructField("encounter_id", LongType()),
        StructField("client_id", LongType()),
        StructField("inh_start_date", DateType()),
        StructField("inh_date_completed", DateType()),
    ]
)

PMTCT_ENROLLMENT = StructType(
    [
        StructField("client_id", LongType()),
        StructField("encounter_id", LongType()),
        StructField("antenatal_care_provider", StringType()),
        StructField("ld_client", StringType()),
        StructField("post_natal_care", StringType()),
        StructField("art_clinic", StringType()),
        StructField("location_of_birth", StringType()),
        StructField("date_of_enrollment_or_booking", DateType()),
        StructField("currently_breastfeeding_child", StringType()),
        StructField("pregnancy_status", StringType()),
        StructField("date_referred_to_pmtct", DateType()),
    ]
)

PMTCT_DISCHARGE = StructType(
    [
        StructField("client_id", LongType()),
        StructField("encounter_id", LongType()),
        StructField("discharge_date", DateType()),
        StructField("reason_for_discharge_from_pmtct", StringType()),
    ]
)

HEI_ENROLLMENT = StructType(
    [
        StructField("client_id", LongType()),
        StructField("encounter_id", LongType()),
        StructField("date_enrolled_in_care", DateType()),
        StructField("hei_code", StringType()),
        StructField("infant_referred", StringType()),
        StructField("referring_facility_name", StringType()),
        StructField("arv_prophylaxis", StringType()),
        StructField("weight_text", StringType()),
        StructField("mothers_pmtct_interventions", StringType()),
    ]
)

HEI_FOLLOWUP = StructType(
    [
        StructField("encounter_id", LongType()),
        StructField("client_id", LongType()),
        StructField("followup_date_followup", DateType()),
        StructField("weight_text_", StringType()),
        StructField("growth_pattern", StringType()),
        StructField("reason_for_growth_failure", StringType()),
        StructField("reason_for_red_flag", StringType()),
        StructField("mother_s_breast_condition", StringType()),
        StructField("conclusion", StringType()),
        StructField("decision", StringType()),
        StructField("clinical_evidence_of_hiv", StringType()),
        StructField("next_visit_date", DateType()),
        StructField("continue_to_followup", StringType()),
        StructField("transferred_out", StringType()),
        StructField("lost_to_followup", StringType()),
        StructField("died", StringType()),
    ]
)

HEI_FOLLOWUP_1 = StructType(
    [
        StructField("encounter_id", LongType()),
        StructField("cotrimoxazole_prophylaxis_dose", StringType()),
        StructField("developmental_milestone_for_children", StringType()),
        StructField("infant_feeding_practice_within_the_first_6_months_of_life", StringType()),
        StructField("infant_feeding_practice_older_than_6_months_of_life", StringType()),
        StructField("no_clinical_or_laboratory_evidence_of_hiv", StringType()),
        StructField("laboratory_evidence_of_hiv_dna_pcr_antibody_tests", StringType()),
        StructField("referred_for_pediatric_hiv_care_within_facility", StringType()),
        StructField("referred_pediatric_hiv_care_outside_facility", StringType()),
        StructField("discharged_negative_form_care_hiv_free", StringType()),
    ]
)

HEI_HIV_TEST = StructType(
    [
        StructField("client_id", LongType()),
        StructField("encounter_id", LongType()),
        StructField("dna_pcr_sample_collection_date", DateType()),
        StructField("date_dbs_result_received", DateType()),
        StructField("hiv_test_result", StringType()),
        StructField("rapid_antibody_result", StringType()),
        StructField("test_type", StringType()),
        StructField("reason_sample_rejected_or_test_not_done", StringType()),
    ]
)

HEI_IMMUNIZATION_FLAGS: tuple[str, ...] = (
    "bcg_taken", "opv_0_taken", "opv_1_taken", "opv_2_taken", "opv_3_taken",
    "ipv_taken", "pcv_0_taken", "pcv_1_taken", "pcv_2_taken", "pcv_3_taken",
    "rota_0_taken", "rota_1_taken", "rota_2_taken", "penta_1_taken",
    "penta_2_taken", "penta_3_taken", "mcv_1_taken", "mcv_2_taken",
)

HEI_IMMUNIZATION = StructType(
    [StructField("client_id", LongType()), StructField("encounter_id", LongType())]
    + [StructField(c, StringType()) for c in HEI_IMMUNIZATION_FLAGS]
)

HEI_FINAL_OUTCOME = StructType(
    [
        StructField("client_id", LongType()),
        StructField("encounter_id", LongType()),
        StructField("hei_pmtct_final_outcome", StringType()),
        StructField("date_when_final_outcome_was_known", DateType()),
        StructField("name_of_where_patient_was_referred_to", StringType()),
    ]
)

DIM_LOCATION = StructType(
    [
        StructField("location_id", LongType()),
        StructField("name", StringType()),
        StructField("state_province", StringType()),
        StructField("city_village", StringType()),
    ]
)

FACT_LOCATION_TAG = StructType(
    [StructField("location_tag_id", LongType()), StructField("name", StringType())]
)

FACT_LOCATION_TAG_MAP = StructType(
    [
        StructField("location_tag_id", LongType()),
        StructField("location_id", LongType()),
    ]
)

FACT_LOCATION_ATTRIBUTE = StructType(
    [
        StructField("location_id", LongType()),
        StructField("attribute_type_id", LongType()),
        StructField("value_reference", StringType()),
    ]
)

FACT_LOCATION_ATTRIBUTE_TYPE = StructType(
    [
        StructField("location_attribute_type_id", LongType()),
        StructField("name", StringType()),
    ]
)


def all_table_schemas() -> dict[str, StructType]:
    out = dict(follow_up_shard_schemas())
    out.update(
        {
            "mamba_dim_client": DIM_CLIENT,
            "mamba_flat_encounter_intake_b": INTAKE_B,
            "mamba_flat_encounter_pmtct_enrollment": PMTCT_ENROLLMENT,
            "mamba_flat_encounter_pmtct_discharge": PMTCT_DISCHARGE,
            "mamba_flat_encounter_hei_enrollment": HEI_ENROLLMENT,
            "mamba_flat_encounter_hei_followup": HEI_FOLLOWUP,
            "mamba_flat_encounter_hei_followup_1": HEI_FOLLOWUP_1,
            "mamba_flat_encounter_hei_hiv_test": HEI_HIV_TEST,
            "mamba_flat_encounter_hei_immunization": HEI_IMMUNIZATION,
            "mamba_flat_encounter_hei_final_outcome": HEI_FINAL_OUTCOME,
            "mamba_dim_location": DIM_LOCATION,
            "mamba_fact_location_tag": FACT_LOCATION_TAG,
            "mamba_fact_location_tag_map": FACT_LOCATION_TAG_MAP,
            "mamba_fact_location_attribute": FACT_LOCATION_ATTRIBUTE,
            "mamba_fact_location_attribute_type": FACT_LOCATION_ATTRIBUTE_TYPE,
        }
    )
    return out
