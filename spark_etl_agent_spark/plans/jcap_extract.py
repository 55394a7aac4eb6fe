"""The JCAP PA extract — the reference's one real analytical query,
re-expressed as a native Spark DataFrame program.

Reference parity (`services/jcap_pa_etl_service.py:176-227`): the
reference ships a 52-line SQL string to Redshift over JDBC (the
``(query) AS spark_query`` derived-table trick, ``utils/db_utils.py:105``)
and receives only result rows. Here the *same relational program* —
predicate filters (P7-P9), SELECT DISTINCT dedup (A3), three LEFT OUTER
equi-joins incl. an UPPER()-expression compound key (J1-J3), the
greatest-of-two-dates CASE (P10), the 3-branch-no-ELSE CASE (P11), the
21-column aliased projection (P5) and final ORDER BY (O1) — executes in
Spark/Catalyst.

The transform step mirrors ``_transform_data``
(`services/jcap_pa_etl_service.py:245-297`): ``to_timestamp`` with the
``MM-dd-yyyy`` format (P4) and the conditional bulk rename (P3). We
implement the *intended* semantics (SURVEY.md §7.4): the reference's
``to_timestamp`` on already-DATE columns NULLs them by accident; here
date columns are cast, and only the genuinely-string ``load_date``
column is format-parsed.

Scale posture: the fact side streams; the two genuine dimension sides
(zip alignment, segment) are broadcast. The DISTINCT-of-ref-cap side U
is fact-derived — its cardinality grows with the data — so it carries
NO broadcast hint; AQE picks broadcast at runtime only when the distinct
output is actually small, and falls back to shuffle join otherwise. At
100 TB the fact scan is partition-pruned by the completed-date
predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Column-rename map, reference `services/jcap_pa_etl_service.py:271-286`.
# The two dead entries of the reference ("LHM_Name",
# "REFERRING_HCP_PATH_STATE" — SURVEY.md §3.4) are intentionally omitted:
# we reproduce the *effective* output schema.
COLUMN_MAPPING = {
    "pa_completed_date": "pa_completeddate",
    "pa_disposition": "padisposition",
    "appeal_complete_date": "appeal_completedate",
    "appeal_disposition": "appealdisposition",
    "fe_required": "ferequired",
    "sr_type": "srtype",
    "ins_planname": "insurancebenefitplanname",
    "pbm_name": "pbmpayername",
    "bd_terrname": "region",
    "dynamic_segment": "segment",
}

JCAP_LOAD_DATE = "2026-08-13"


# ---------------------------------------------------------------------------
# Deterministic Group-A-shaped derivations from the TPC-H-ish testdata
# (FIXTURES.md Group A shapes; values are pure key arithmetic so Spark and
# the DuckDB oracle agree exactly).
# ---------------------------------------------------------------------------

def derive_payer_details(orders: DataFrame) -> DataFrame:
    """`cdp.fct_pah_pa_payer_details` analog (FIXTURES.md A1) from orders."""
    k = F.col("o_orderkey")
    date = F.col("o_orderdate").cast("date")
    return orders.select(
        F.col("o_custkey").cast("string").alias("pmc_patid"),
        F.when(k % 4 == 0, "Opsumit")
        .when(k % 4 == 1, "UPTRAVI")
        .when(k % 4 == 2, "opsynvi")
        .otherwise("Placebo")
        .alias("prod_nm"),
        F.when(k % 5 < 2, "Approved")
        .when(k % 5 < 4, "denied")
        .otherwise("Pending")
        .alias("pa_disposition"),
        date.alias("pa_completed_date"),
        F.when(k % 4 == 0, F.date_add(date, 30))
        .when(k % 4 == 1, F.date_sub(date, 10))
        .when(k % 4 == 2, F.lit(None).cast("date"))
        .otherwise(date)
        .alias("appeal_complete_date"),
        F.when(k % 7 < 3, "Approved")
        .when(k % 7 < 5, "Denied")
        .otherwise(F.lit(None).cast("string"))
        .alias("appeal_disposition"),
        F.when(k % 2 == 0, "Y").otherwise("N").alias("fe_required"),
        F.col("o_orderpriority").alias("rx_planname"),
        F.col("o_orderstatus").alias("rx_payername"),
        F.when(k % 3 == 0, "Commercial")
        .when(k % 3 == 1, "Medicare")
        .otherwise("Medicaid")
        .alias("rx_payertype"),
        F.when(k % 2 == 0, "PA").otherwise("Appeal").alias("sr_type"),
        F.date_format("o_orderdate", "MM-dd-yyyy").alias("load_date"),
        F.concat(F.lit("INS"), (k % 8).cast("string")).alias("ins_planname"),
        F.concat(F.lit("PBM"), (k % 6).cast("string")).alias("pbm_name"),
    )


def derive_ref_cap(orders: DataFrame) -> DataFrame:
    """`cdp.fct_pah_ref_cap_dly` analog (FIXTURES.md A2): one row per
    order so a customer's repeat orders produce the exact duplicates
    that make SELECT DISTINCT meaningful."""
    ck = F.col("o_custkey")
    return orders.select(
        ck.cast("string").alias("pmc_patid"),
        F.when(ck % 3 == 0, "OPSUMIT")
        .when(ck % 3 == 1, "uptravi")
        .otherwise("Opsynvi")
        .alias("prod_nm"),
        F.concat(F.lit("S"), (ck % 50).cast("string")).alias("managing_hcp_state"),
        F.lpad((ck % 300).cast("string"), 5, "0").alias("managing_hcp_zip"),
        F.concat(F.lit("J"), (ck % 150).cast("string")).alias("managing_hcp_jnj_id"),
    )


def derive_alignment(part: DataFrame) -> DataFrame:
    """`cdp.dmn_pah_curr_alignment_all` analog (FIXTURES.md A3): unique
    per zip; ~83% of ref-cap zips resolve (0..249 of 0..299)."""
    pk = F.col("p_partkey")
    return (
        part.select(
            F.lpad((pk % 250).cast("string"), 5, "0").alias("zip"),
            F.concat(F.lit("LHM"), (pk % 37).cast("string")).alias("lhm"),
            F.concat(F.lit("T"), (pk % 11).cast("string")).alias("terr"),
        )
        .groupBy("zip")
        .agg(F.min("lhm").alias("lhm_name"), F.min("terr").alias("bd_terrname"))
    )


def derive_segment(supplier: DataFrame) -> DataFrame:
    """`cdp.dmn_pah_segment` analog (FIXTURES.md A4): unique per jnj_id
    with an activity flag ('1' for ~70%)."""
    sk = F.col("s_suppkey")
    return (
        supplier.select(
            F.concat(F.lit("J"), (sk % 150).cast("string")).alias("jnj_id"),
            F.concat(F.lit("SEG"), (sk % 5).cast("string")).alias("seg"),
            F.when(sk % 10 < 7, "1").otherwise("0").alias("flag"),
        )
        .groupBy("jnj_id")
        .agg(F.min("seg").alias("dynamic_segment"), F.min("flag").alias("actv_flag"))
    )


# ---------------------------------------------------------------------------
# The extract query proper
# ---------------------------------------------------------------------------

def jcap_extract(
    payer: DataFrame,
    ref_cap: DataFrame,
    alignment: DataFrame,
    segment: DataFrame,
    load_date: str = JCAP_LOAD_DATE,
) -> DataFrame:
    """Native-Spark re-expression of the reference extract SQL
    (`services/jcap_pa_etl_service.py:176-227`), operator for operator."""
    # Derived table P (:201-206): fact filters P7 (IN-list over UPPER),
    # P8 (completed-date range — fixed literals for determinism; the
    # reference used CURRENT_DATE as the upper bound).
    p = payer.filter(
        F.upper(F.col("prod_nm")).isin("OPSUMIT", "UPTRAVI", "OPSYNVI")
        & F.upper(F.col("pa_disposition")).isin("APPROVED", "DENIED")
        & (F.col("pa_completed_date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("pa_completed_date") <= F.lit("2000-12-31").cast("date"))
    )

    # Derived table U (:208-213): SELECT DISTINCT dedup (A3).
    u = ref_cap.select(
        "pmc_patid",
        "prod_nm",
        "managing_hcp_state",
        "managing_hcp_zip",
        "managing_hcp_jnj_id",
    ).distinct()

    # Derived table S (:220-223): pre-filtered segment dim (P9).
    s = segment.filter(F.col("actv_flag") == "1").select(
        "jnj_id", "dynamic_segment"
    )

    # J1 (:207-215): LEFT JOIN on compound key with UPPER() expression.
    # No broadcast hint on U: it is a DISTINCT over the ref-cap *fact*
    # table (`services/jcap_pa_etl_service.py:208-213`), so its
    # patient×product cardinality grows with the data — forcing a
    # broadcast is an OOM at 100× scale. AQE converts to broadcast at
    # runtime when (and only when) the distinct output is actually small.
    # J2 (:216-218), J3 (:219-224): LEFT JOINs to genuine bounded dims —
    # those keep explicit hints.
    joined = (
        p.join(
            u,
            (p.pmc_patid == u.pmc_patid)
            & (F.upper(p.prod_nm) == F.upper(u.prod_nm)),
            "left",
        )
        .join(F.broadcast(alignment), u.managing_hcp_zip == alignment.zip, "left")
        .join(F.broadcast(s), u.managing_hcp_jnj_id == s.jnj_id, "left")
    )

    appeal, pa = p.appeal_complete_date, p.pa_completed_date
    disp, adisp = F.upper(p.pa_disposition), F.upper(p.appeal_disposition)

    # Projection with reference aliases (:177-200) + P10/P11 CASEs.
    return joined.select(
        F.lit(load_date).cast("date").alias("jcap_table_loaddate"),
        p.pmc_patid.alias("pmc_patid"),
        u.managing_hcp_state.alias("vreferring_hcp_path_state"),
        p.prod_nm.alias("drugortherapy"),
        pa.alias("pa_completed_date"),
        p.pa_disposition.alias("pa_disposition"),
        appeal.alias("appeal_complete_date"),
        p.appeal_disposition.alias("appeal_disposition"),
        # P10: CASE keeps the ELSE branch when the comparison is NULL —
        # deliberately NOT F.greatest (which skips NULLs; SURVEY §2.2).
        F.when(appeal > pa, appeal).otherwise(pa).alias("overall_date"),
        # P11: 3 branches, no ELSE → NULL for e.g. denied-with-NULL-appeal.
        F.when(disp == "APPROVED", "Approved")
        .when((disp == "DENIED") & (adisp == "APPROVED"), "Approved")
        .when(disp == "DENIED", "Denied")
        .alias("final_pa_disposition"),
        p.fe_required.alias("fe_required"),
        p.rx_planname.alias("rx_planname"),
        p.rx_payername.alias("rx_payername"),
        p.rx_payertype.alias("rx_payertype"),
        p.sr_type.alias("sr_type"),
        p.load_date.alias("load_date"),
        p.ins_planname.alias("ins_planname"),
        p.pbm_name.alias("pbm_name"),
        alignment.lhm_name.alias("lhm_name"),
        alignment.bd_terrname.alias("bd_terrname"),
        s.dynamic_segment.alias("dynamic_segment"),
    ).orderBy("drugortherapy", "pmc_patid")  # O1 (:226)


def jcap_transform(df: DataFrame) -> DataFrame:
    """The reference's `_transform_data`
    (`services/jcap_pa_etl_service.py:245-297`) with intended semantics:
    parse the MM-dd-yyyy string column, *cast* the already-date columns
    (the reference's to_timestamp-on-date NULLs them — SURVEY §3.4),
    then apply the conditional bulk rename."""
    out = (
        df.withColumn("load_date", F.to_timestamp("load_date", "MM-dd-yyyy"))
        .withColumn("pa_completed_date", F.col("pa_completed_date").cast("timestamp"))
        .withColumn(
            "appeal_complete_date", F.col("appeal_complete_date").cast("timestamp")
        )
        .withColumn("overall_date", F.col("overall_date").cast("timestamp"))
        .withColumn(
            "jcap_table_loaddate", F.col("jcap_table_loaddate").cast("timestamp")
        )
    )
    for old, new in COLUMN_MAPPING.items():
        if old in out.columns:  # conditional rename, reference :284-286
            out = out.withColumnRenamed(old, new)
    return out


def run_jcap_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full extract + transform over Group-A shapes derived from the
    testdata tables."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    extracted = jcap_extract(
        derive_payer_details(orders),
        derive_ref_cap(orders),
        derive_alignment(part),
        derive_segment(supplier),
    )
    return jcap_transform(extracted)
