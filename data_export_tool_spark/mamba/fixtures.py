"""Deterministic synthetic clinical fixtures (seed 42) for
reference-parity testing (SURVEY.md §5.2, FIXTURES.md).

Generates the full mamba_* star schema: NULL-heavy event dates,
``row_num`` ties (same-day encounters), status-case variants
('FEMALE'/'Female', 'Restart medication'/'Restart Medication'),
sentinel-adjacent values, and VL counts spanning the 50/51/1000
banding boundaries — the edge rows SURVEY.md §5 says the tests must
hit. Event dates center on the reference window 2023-07-28..2023-08-26
(Hamle 21 – Nehassie 20, 2015 EC).
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession

from data_export_tool_spark.mamba import schemas as S

WINDOW_START = dt.date(2023, 7, 28)
WINDOW_END = dt.date(2023, 8, 26)

_STATUSES = [
    "Alive", "Alive", "Alive", "Restart medication", "Restart Medication",
    "Transferred out", "Stop all", "Loss to follow-up (LTFU)", "Ran away",
    "Dead", None,
]
_REGIMENS = ["1e", "1d", "1j", "2f", "2g", "3a", "4c", "5b", None]
_YN = ["Yes", "No", None]
_FP_METHODS = [
    "Intrauterine device", "Vasectomy", "Tubal ligation procedure",
    "Implantable contraceptive (unspecified type)", "None", "Diaphragm",
    "Oral contraception", "Injectable contraceptives", "Condoms", None,
]
_VL_COUNTS = ["0", "25", "50", "51", "999", "1000", "1001", "5000", "12.5", None]
_VL_STATUS = [
    "Suppressed", "Undetectable", "Detectable", "Unsuppressed",
    "High VL and need EAC", "Low Level Viremia (LV)", None,
]
_VL_INDICATIONS = [
    "Routine viral load test indication",
    "Targeted viral load test indication",
    None,
]
_WHO_STAGES = [
    "WHO stage 1", "WHO stage 2", "WHO stage 3 adult", "WHO stage 3 peds",
    "WHO stage 4 adult", "WHO stage 4 peds", None,
]
_TPT_TYPES = ["6H", "3HP", "Continuous", None]
_TPT_ALT = ["3HP", "3HR", None]
_SCREEN_RESULT = ["Positive", "Negative", None]
_DSD = ["ASM", "3MMD", "6MMD", "FTAR", None]
_NUTRITION = ["Normal", "Moderate malnutrition", "Severe malnutrition", None]
_GENERIC = ["Yes", "No", "Unknown", "Other", None, None]

_CCA_METHOD = [
    "Human Papillomavirus test",
    "Visual Inspection of the Cervix with Acetic Acid (VIA)",
    "Cytology", "Post-treatment follow-up at 1 year", None,
]
_VIA_RESULT = [
    "VIA negative", "VIA positive: eligible for cryo/thermo-coagula",
    "VIA positive: non-eligible for cryo/thermo-coagula", "Unknown", None,
]
_CYTOLOGY = [
    "Negative result", "> Ascus",
    "ASCUS (Atypical Squamous Cells of Undetermined Significance) on Pap Smear",
    None,
]


class FixtureGen:
    def __init__(self, seed: int = 42, n_patients: int = 200):
        self.rng = random.Random(seed)
        self.n_patients = n_patients
        self._eid = 1000

    # --- helpers ----------------------------------------------------------

    def _next_eid(self) -> int:
        self._eid += 1
        return self._eid

    def _maybe(self, value, p_null: float = 0.5):
        return None if self.rng.random() < p_null else value

    def _date_near_window(self, spread_days: int = 420) -> dt.date:
        off = int(self.rng.gauss(0, spread_days / 3))
        return WINDOW_END + dt.timedelta(days=max(-spread_days, min(off, spread_days)))

    def _pick(self, domain):
        return self.rng.choice(domain)

    # --- tables -----------------------------------------------------------

    def dim_client(self) -> list[tuple]:
        rows = []
        # HEI infants (id space 10000+) need demographics too — the HEI
        # report's final join resolves client.date_of_birth/sex for them
        for i in range(self.n_patients // 4):
            cid = 10_000 + i
            dob = WINDOW_END - dt.timedelta(days=self.rng.randint(30, 1100))
            rows.append(
                (
                    cid,
                    f"uuid-hei-{i:05d}",
                    self.rng.choice(["FEMALE", "MALE"]),
                    dob,
                    0,
                    f"MRNH{i:05d}",
                    f"Infant {i}",
                    None,
                )
            )
        for cid in range(1, self.n_patients + 1):
            sex = self.rng.choices(
                ["FEMALE", "MALE", "Female"], weights=[52, 44, 4]
            )[0]
            # include patients turning 15 inside the window
            if cid % 37 == 0:
                dob = WINDOW_START.replace(year=WINDOW_START.year - 15) + dt.timedelta(
                    days=self.rng.randint(0, 28)
                )
            else:
                dob = dt.date(1950, 1, 1) + dt.timedelta(
                    days=self.rng.randint(0, 26000)
                )
            rows.append(
                (
                    cid,
                    f"uuid-{cid:06d}",
                    sex,
                    dob,
                    (WINDOW_END - dob).days // 365,
                    f"MRN{cid:06d}",
                    f"Patient {cid}",
                    self._maybe(f"09{self.rng.randint(10000000, 99999999)}", 0.3),
                )
            )
        return rows

    def follow_up_logical(self) -> list[dict]:
        """One dict per encounter with every logical column filled."""
        date_cols = set(S.FOLLOW_UP_DATE_COLS)
        rows: list[dict] = []
        for cid in range(1, self.n_patients + 1):
            n_enc = self.rng.randint(1, 12)
            art_start = self._maybe(
                self._date_near_window(900) - dt.timedelta(days=400), 0.15
            )
            visit_dates = sorted(
                self._date_near_window() for _ in range(n_enc)
            )
            if n_enc >= 3 and cid % 5 == 0:
                visit_dates[1] = visit_dates[0]  # ⚑ tie on follow_up_date
            for d in visit_dates:
                r: dict = {c: None for c in S.FOLLOW_UP_DATE_COLS}
                r.update({c: None for c in S.FOLLOW_UP_STRING_COLS})
                r["encounter_id"] = self._next_eid()
                r["client_id"] = cid
                r["follow_up_date_followup_"] = d
                r["follow_up_status"] = self._pick(_STATUSES)
                r["art_antiretroviral_start_date"] = art_start
                r["treatment_end_date"] = self._maybe(
                    d + dt.timedelta(days=self._pick([15, 30, 90, 180])), 0.2
                )
                r["next_visit_date"] = self._maybe(d + dt.timedelta(days=30), 0.4)
                r["assessment_date"] = self._maybe(d, 0.6)
                r["antiretroviral_art_dispensed_dose_i"] = self._maybe(
                    str(self._pick([30, 60, 90, 180])), 0.4
                )
                r["weight_text_"] = self._maybe(
                    f"{self.rng.randint(8, 110)}", 0.3
                )
                r["height"] = self._maybe(str(self.rng.randint(60, 190)), 0.6)
                r["regimen"] = self._pick(_REGIMENS)
                r["regimen_change"] = self._maybe("Regimen switch type", 0.85)
                r["anitiretroviral_adherence_level"] = self._pick(
                    ["Good", "Fair", "Poor", None]
                )
                r["pregnancy_status"] = self._pick(_YN)
                r["currently_breastfeeding_child"] = self._pick(_YN)
                r["date_of_last_menstrual_period_lmp_"] = self._maybe(
                    d - dt.timedelta(days=self.rng.randint(10, 250)), 0.6
                )
                r["date_of_event"] = self._maybe(
                    (art_start or d) - dt.timedelta(days=30), 0.5
                )
                r["dsd_category"] = self._pick(_DSD)
                r["transferred_in_check_this_for_all_t"] = self._pick(_YN)
                r["current_who_hiv_stage"] = self._pick(_WHO_STAGES)
                r["cd4_count"] = self._maybe(str(self.rng.randint(20, 1200)), 0.5)
                r["cd4_"] = self._maybe(str(self.rng.randint(20, 1200)), 0.7)
                r["method_of_family_planning"] = self._pick(_FP_METHODS)
                r["nutritional_status_of_adult"] = self._pick(_NUTRITION)
                r["nutritional_status_of_older_child_a"] = self._pick(_NUTRITION)
                r["weight_for_age_status"] = self._pick(_NUTRITION)
                r["nutritional_screening_result"] = self._pick(_SCREEN_RESULT)
                r["nutritional_supplements_provided"] = self._pick(_YN)
                r["eats_nutritious_foods"] = self._pick(_YN)
                r["stages_of_disclosure"] = self._pick(
                    ["Full disclosure", "Partial disclosure", "Not disclosed", None]
                )
                # viral load cluster
                vl_sent = self._maybe(d - dt.timedelta(days=self.rng.randint(0, 300)), 0.5)
                r["date_of_reported_hiv_viral_load"] = vl_sent
                r["date_viral_load_results_received"] = (
                    self._maybe(vl_sent + dt.timedelta(days=self.rng.randint(3, 45)), 0.3)
                    if vl_sent
                    else None
                )
                r["viral_load_received_"] = self._pick(_YN)
                r["viral_load_test_status"] = self._pick(_VL_STATUS)
                r["hiv_viral_load"] = self._pick(_VL_COUNTS)
                r["hiv_viral_load_status"] = self._pick(["Completed", None])
                r["viral_load_test_indication"] = self._pick(_VL_INDICATIONS)
                for c in S.VL_ROUTINE_INDICATION_COLS:
                    r[c] = self._maybe(c.replace("_", " "), 0.8)
                r["repeat_or_confirmatory_vl_initial_viral_load_greater_than_10"] = (
                    self._maybe("Repeat or confirmatory VL", 0.85)
                )
                r["suspected_antiretroviral_failure"] = self._pick(
                    ["Suspected ART failure", "Suspected Antiretroviral failure", None, None]
                )
                for i, c in enumerate(
                    (
                        "date_first_enhanced_adherence_counseling_provided",
                        "date_second_enhanced_adherence_counseling_provided",
                        "date_third_enhanced_adherence_counseling_provided",
                    )
                ):
                    r[c] = self._maybe(
                        d - dt.timedelta(days=90 - 25 * i), 0.8
                    )
                # TB / TPT cluster
                r["screening_test_result_tuberculosis"] = self._pick(_SCREEN_RESULT)
                r["was_the_patient_screened_for_tuberc"] = self._pick(_YN)
                r["patient_diagnosed_with_active_tuber"] = self._pick(_YN)
                r["diagnosis_date"] = self._maybe(d - dt.timedelta(days=60), 0.8)
                r["tuberculosis_drug_treatment_start_d"] = self._maybe(
                    d - dt.timedelta(days=55), 0.85
                )
                r["date_active_tbrx_completed"] = self._maybe(d, 0.9)
                r["date_active_tbrx_dc"] = self._maybe(d, 0.92)
                r["date_started_on_tuberculosis_prophy"] = self._maybe(
                    d - dt.timedelta(days=self.rng.randint(30, 400)), 0.6
                )
                r["date_completed_tuberculosis_prophyl"] = self._maybe(
                    d - dt.timedelta(days=self.rng.randint(0, 30)), 0.7
                )
                r["date_discontinued_tuberculosis_prop"] = self._maybe(d, 0.9)
                r["tb_prophylaxis_type"] = self._pick(_TPT_TYPES)
                r["tb_prophylaxis_type_alternate_"] = self._pick(_TPT_ALT)
                r["tpt_followup_6h_"] = self._pick(_GENERIC)
                r["eligible_for_tpt"] = self._pick(_YN)
                r["why_eligible_reason_"] = self._pick(_GENERIC)
                r["tpt_dispensed_dose_in_days_inh_"] = self._maybe("30", 0.7)
                r["tpt_dispensed_dose_in_days_alternat"] = self._maybe("30", 0.8)
                r["tpt_side_effects"] = self._pick(_GENERIC)
                r["Adherence"] = self._pick(["Good", "Fair", "Poor", None])
                r["diagnostic_test"] = self._pick(
                    [
                        "Smear microscopy only",
                        "Additional test other than Gene-Xpert",
                        "Gene-Xpert", None,
                    ]
                )
                r["tb_diagnostic_test_result"] = self._pick(_SCREEN_RESULT)
                r["lf_lam_result"] = self._pick(_SCREEN_RESULT)
                r["gene_xpert_result"] = self._pick(_SCREEN_RESULT)
                r["cotrimoxazole_prophylaxis_start_dat"] = self._maybe(
                    d - dt.timedelta(days=100), 0.8
                )
                r["cotrimoxazole_prophylaxis_stop_date"] = self._maybe(d, 0.9)
                r["fluconazole_start_date"] = self._maybe(d - dt.timedelta(days=40), 0.9)
                r["fluconazole_stop_date"] = self._maybe(d, 0.93)
                r["crag"] = self._pick(_SCREEN_RESULT)
                r["visitect_cd4_result"] = self._pick(
                    ["VISITECT <=200 copies/ml", "VISITECT >200 copies/ml", None]
                )
                r["visitect_cd4_test_date"] = self._maybe(d, 0.8)
                r["current_functional_status"] = self._pick(
                    ["Working", "Ambulatory", "Bedridden", None]
                )
                r["other_medications_med_1"] = self._pick(_GENERIC)
                r["other_medications_med2"] = self._pick(_GENERIC)
                for c in S.OI_FLAG_COLS:
                    r[c] = self._pick(_YN)
                # cervical-cancer cluster
                r["cervical_cancer_screening_status"] = self._maybe(
                    "Cervical cancer screening performed", 0.7
                )
                r["purpose_for_visit_cervical_screening"] = self._pick(_GENERIC)
                r["cervical_cancer_screening_method_strategy"] = self._pick(_CCA_METHOD)
                r["hpv_dna_screening_result"] = self._pick(
                    ["Positive", "Negative result", None]
                )
                r["hpv_subtype"] = self._pick(["16", "18", "Other", None])
                r["date_hpv_test_was_done"] = self._maybe(d, 0.8)
                r["hpv_dna_result_received_date"] = self._maybe(
                    d + dt.timedelta(days=7), 0.8
                )
                r["via_done_"] = self._pick(_YN)
                r["via_screening_result"] = self._pick(_VIA_RESULT)
                r["date_visual_inspection_of_the_cervi"] = self._maybe(d, 0.8)
                r["cytology_result"] = self._pick(_CYTOLOGY)
                r["cytology_sample_collection_date"] = self._maybe(d, 0.85)
                r["date_cytology_result_received"] = self._maybe(
                    d + dt.timedelta(days=14), 0.85
                )
                r["colposcopy_of_cervix_findings"] = self._pick(
                    ["Normal", "Low Grade", "High Grade", None]
                )
                r["colposcopy_exam_date"] = self._maybe(d, 0.9)
                r["biopsy_sample_collected_date"] = self._maybe(d, 0.92)
                r["biopsy_result_received_date"] = self._maybe(
                    d + dt.timedelta(days=20), 0.92
                )
                r["biopsy_result"] = self._pick(_GENERIC)
                r["treatment_of_precancerous_lesions_of_the_cervix"] = self._pick(
                    [
                        "Cryosurgery of lesion of cervix",
                        "Loop electrosurgical excision procedure of cervix",
                        "Thermocauterization of cervix", None,
                    ]
                )
                r["treatment_start_date"] = self._maybe(d, 0.9)
                r["confirmed_cervical_cancer_cases_bas"] = self._pick(_GENERIC)
                r["next_follow_up_screening_date"] = self._maybe(
                    d + dt.timedelta(days=365), 0.85
                )
                r["referral_or_linkage_status"] = self._pick(_GENERIC)
                r["reason_for_referral_cacx"] = self._pick(_GENERIC)
                r["date_patient_referred_out"] = self._maybe(d, 0.92)
                r["date_client_arrived_in_the_referred"] = self._maybe(
                    d + dt.timedelta(days=3), 0.94
                )
                r["date_client_served_in_the_referred_"] = self._maybe(
                    d + dt.timedelta(days=4), 0.94
                )
                r["prep_offered"] = self._pick(_YN)
                r["pre_test_counselling_for_cervical_c"] = self._pick(_YN)
                r["ready_for_cervical_cancer_screening"] = self._pick(_YN)
                r["date_counseling_given"] = self._maybe(d, 0.9)
                rows.append(r)
        return rows

    def intake_b(self) -> list[tuple]:
        rows = []
        for cid in range(1, self.n_patients + 1, 2):  # half the patients
            for _ in range(self.rng.randint(1, 2)):
                start = self._maybe(self._date_near_window(600), 0.3)
                rows.append(
                    (
                        self._next_eid(),
                        cid,
                        start,
                        self._maybe(
                            (start + dt.timedelta(days=180)) if start else None, 0.5
                        ),
                    )
                )
        return rows

    def pmtct(self) -> tuple[list[tuple], list[tuple]]:
        enroll, discharge = [], []
        for cid in range(1, self.n_patients + 1):
            if cid % 3:
                continue
            n_episodes = self.rng.randint(1, 2)
            last = self._date_near_window(700) - dt.timedelta(days=400)
            for ep in range(n_episodes):
                enr_date = last + dt.timedelta(days=self.rng.randint(60, 300))
                enroll.append(
                    (
                        cid,
                        self._next_eid(),
                        self._pick(_GENERIC),
                        self._pick(_YN),
                        self._pick(_YN),
                        self._pick(_YN),
                        self._pick(["Home", "Facility", None]),
                        enr_date,
                        self._pick(_YN),
                        self._pick(_YN),
                        self._maybe(enr_date - dt.timedelta(days=5), 0.5),
                    )
                )
                dis_date = self._maybe(
                    enr_date + dt.timedelta(days=self.rng.randint(30, 280)), 0.35
                )  # ⚑ some open episodes
                if dis_date:
                    discharge.append(
                        (
                            cid,
                            self._next_eid(),
                            dis_date,
                            self._pick(
                                ["Delivery", "Transfer out", "Lost", None]
                            ),
                        )
                    )
                    last = dis_date
                else:
                    last = enr_date
        return enroll, discharge

    def hei(self) -> dict[str, list[tuple]]:
        enroll, followup, followup_1, hiv_test, immun, outcome = [], [], [], [], [], []
        base_cid = 10_000  # infants: separate id space
        for i in range(self.n_patients // 4):
            cid = base_cid + i
            enr_date = self._date_near_window(500)
            enroll.append(
                (
                    cid,
                    self._next_eid(),
                    self._maybe(enr_date, 0.15),
                    f"HEI{i:05d}",
                    self._pick(_YN),
                    self._maybe("Referring Facility", 0.7),
                    self._pick(["NVP", "AZT+NVP", None]),
                    self._maybe(str(self.rng.randint(2, 12)), 0.4),
                    self._pick(_GENERIC),
                )
            )
            for v in range(self.rng.randint(1, 6)):
                fdate = enr_date + dt.timedelta(days=30 * v + self.rng.randint(0, 10))
                if v == 0 and i % 2 == 0:
                    # guarantee a healthy in-window cohort (line-list
                    # grain: followup BETWEEN start AND end)
                    fdate = WINDOW_START + dt.timedelta(days=i % 28)
                eid = self._next_eid()
                followup.append(
                    (
                        eid,
                        cid,
                        self._maybe(fdate, 0.1),  # ⚑ some > window end
                        self._maybe(str(self.rng.randint(3, 15)), 0.4),
                        self._pick(["Normal", "Growth failure", None]),
                        self._pick(_GENERIC),
                        self._pick(_GENERIC),
                        self._pick(["Normal", "Cracked", None]),
                        self._pick(_GENERIC),
                        self._pick(_GENERIC),
                        self._pick(_YN),
                        self._maybe(fdate + dt.timedelta(days=30), 0.3),
                        self._pick(_YN),
                        self._pick(_YN),
                        self._pick(_YN),
                        self._pick(_YN),
                    )
                )
                followup_1.append(
                    (
                        eid,
                        self._pick(["", "DC", "2.5ml", "5ml", None]),
                        self._pick(_GENERIC),
                        self._pick(["Exclusive breastfeeding", "Replacement", None]),
                        self._pick(["Complementary", "Breast", None]),
                        self._pick(_YN),
                        self._pick(_YN),
                        self._pick(_YN),
                        self._pick(_YN),
                        self._pick(_YN),
                    )
                )
            for t in range(self.rng.randint(0, 3)):
                sample = self._maybe(enr_date + dt.timedelta(days=45 * t), 0.2)
                hiv_test.append(
                    (
                        cid,
                        self._next_eid(),
                        sample,
                        self._maybe(
                            (sample + dt.timedelta(days=self.rng.randint(5, 40)))
                            if sample
                            else None,
                            0.3,
                        ),
                        self._pick(["Positive", "Negative", None]),
                        self._pick(["Positive", "Negative", None]),
                        self._pick(["DNA PCR", "Rapid antibody", None]),
                        self._pick(_GENERIC),
                    )
                )
            for _ in range(self.rng.randint(1, 3)):
                immun.append(
                    (cid, self._next_eid())
                    + tuple(self._pick(_YN) for _ in S.HEI_IMMUNIZATION_FLAGS)
                )
            if self.rng.random() < 0.5:
                outcome.append(
                    (
                        cid,
                        self._next_eid(),
                        self._pick(
                            ["Discharged negative", "Confirmed positive", "Died", None]
                        ),
                        self._maybe(enr_date + dt.timedelta(days=400), 0.3),
                        self._pick(_GENERIC),
                    )
                )
        return {
            "mamba_flat_encounter_hei_enrollment": enroll,
            "mamba_flat_encounter_hei_followup": followup,
            "mamba_flat_encounter_hei_followup_1": followup_1,
            "mamba_flat_encounter_hei_hiv_test": hiv_test,
            "mamba_flat_encounter_hei_immunization": immun,
            "mamba_flat_encounter_hei_final_outcome": outcome,
        }

    def locations(self) -> dict[str, list[tuple]]:
        # exactly one resolvable facility (export.py:261-279)
        return {
            "mamba_dim_location": [
                (1, "Adama General Hospital", "Oromia", "Adama"),
                (2, "Other Ward", "Oromia", "Adama"),
            ],
            "mamba_fact_location_tag": [(1, "Facility Location"), (2, "Ward")],
            "mamba_fact_location_tag_map": [(1, 1), (2, 2)],
            "mamba_fact_location_attribute": [(1, 7, "H-12345")],
            "mamba_fact_location_attribute_type": [(7, "hmiscode")],
        }


def generate_all(seed: int = 42, n_patients: int = 200) -> dict[str, list]:
    """table name → list of row tuples (dicts for follow_up shards)."""
    g = FixtureGen(seed, n_patients)
    logical = g.follow_up_logical()
    assignment = S.follow_up_shard_assignment()
    shard_schemas = S.follow_up_shard_schemas()

    tables: dict[str, list] = {}
    for name, schema in shard_schemas.items():
        cols = [f.name for f in schema.fields]
        tables[name] = [tuple(r.get(c) for c in cols) for r in logical]

    tables["mamba_dim_client"] = g.dim_client()
    tables["mamba_flat_encounter_intake_b"] = g.intake_b()
    enr, dis = g.pmtct()
    tables["mamba_flat_encounter_pmtct_enrollment"] = enr
    tables["mamba_flat_encounter_pmtct_discharge"] = dis
    tables.update(g.hei())
    tables.update(g.locations())
    return tables


def create_fixture_frames(
    spark: SparkSession, seed: int = 42, n_patients: int = 200
) -> dict[str, DataFrame]:
    schemas = S.all_table_schemas()
    return {
        name: spark.createDataFrame(rows, schemas[name])
        for name, rows in generate_all(seed, n_patients).items()
    }


def write_fixture_parquet(
    spark: SparkSession, out_dir: str, seed: int = 42, n_patients: int = 200
) -> dict[str, str]:
    """Write every fixture table as parquet; returns name → path. Also
    registers each as a temp view (for the spark.sql transpile path)."""
    import os

    paths = {}
    for name, df in create_fixture_frames(spark, seed, n_patients).items():
        path = os.path.join(out_dir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path).createOrReplaceTempView(name)
        paths[name] = path
    return paths
