"""The JCAP PA extract+transform as a declared query.

This is the reference's entire analytical surface in one query
(SURVEY.md §7.2 M1): Group-A-shaped inputs (FIXTURES.md) are derived
deterministically from the testdata tables, then the full reference
program runs natively in Spark (see plans/jcap_extract.py for the
operator-by-operator parity mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.jcap_extract import run_jcap_extract
from .base import QuerySpec


def jcap_pa_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_jcap_extract(spark, sf_dir)


JCAP_PA_EXTRACT_SQL = """
WITH payer AS (
  SELECT CAST(o_custkey AS VARCHAR) AS pmc_patid,
    CASE WHEN o_orderkey % 4 = 0 THEN 'Opsumit' WHEN o_orderkey % 4 = 1 THEN 'UPTRAVI'
         WHEN o_orderkey % 4 = 2 THEN 'opsynvi' ELSE 'Placebo' END AS prod_nm,
    CASE WHEN o_orderkey % 5 < 2 THEN 'Approved' WHEN o_orderkey % 5 < 4 THEN 'denied'
         ELSE 'Pending' END AS pa_disposition,
    CAST(o_orderdate AS DATE) AS pa_completed_date,
    CASE WHEN o_orderkey % 4 = 0 THEN CAST(o_orderdate AS DATE) + 30
         WHEN o_orderkey % 4 = 1 THEN CAST(o_orderdate AS DATE) - 10
         WHEN o_orderkey % 4 = 2 THEN NULL
         ELSE CAST(o_orderdate AS DATE) END AS appeal_complete_date,
    CASE WHEN o_orderkey % 7 < 3 THEN 'Approved' WHEN o_orderkey % 7 < 5 THEN 'Denied'
         ELSE NULL END AS appeal_disposition,
    CASE WHEN o_orderkey % 2 = 0 THEN 'Y' ELSE 'N' END AS fe_required,
    o_orderpriority AS rx_planname,
    o_orderstatus AS rx_payername,
    CASE WHEN o_orderkey % 3 = 0 THEN 'Commercial' WHEN o_orderkey % 3 = 1 THEN 'Medicare'
         ELSE 'Medicaid' END AS rx_payertype,
    CASE WHEN o_orderkey % 2 = 0 THEN 'PA' ELSE 'Appeal' END AS sr_type,
    strftime(o_orderdate, '%m-%d-%Y') AS load_date,
    CONCAT('INS', CAST(o_orderkey % 8 AS VARCHAR)) AS ins_planname,
    CONCAT('PBM', CAST(o_orderkey % 6 AS VARCHAR)) AS pbm_name
  FROM orders
),
ref_cap AS (
  SELECT CAST(o_custkey AS VARCHAR) AS pmc_patid,
    CASE WHEN o_custkey % 3 = 0 THEN 'OPSUMIT' WHEN o_custkey % 3 = 1 THEN 'uptravi'
         ELSE 'Opsynvi' END AS prod_nm,
    CONCAT('S', CAST(o_custkey % 50 AS VARCHAR)) AS managing_hcp_state,
    LPAD(CAST(o_custkey % 300 AS VARCHAR), 5, '0') AS managing_hcp_zip,
    CONCAT('J', CAST(o_custkey % 150 AS VARCHAR)) AS managing_hcp_jnj_id
  FROM orders
),
alignment AS (
  SELECT zip, MIN(lhm) AS lhm_name, MIN(terr) AS bd_terrname FROM (
    SELECT LPAD(CAST(p_partkey % 250 AS VARCHAR), 5, '0') AS zip,
           CONCAT('LHM', CAST(p_partkey % 37 AS VARCHAR)) AS lhm,
           CONCAT('T', CAST(p_partkey % 11 AS VARCHAR)) AS terr
    FROM part) t GROUP BY zip
),
seg AS (
  SELECT jnj_id, MIN(s) AS dynamic_segment, MIN(flag) AS actv_flag FROM (
    SELECT CONCAT('J', CAST(s_suppkey % 150 AS VARCHAR)) AS jnj_id,
           CONCAT('SEG', CAST(s_suppkey % 5 AS VARCHAR)) AS s,
           CASE WHEN s_suppkey % 10 < 7 THEN '1' ELSE '0' END AS flag
    FROM supplier) t GROUP BY jnj_id
)
SELECT TIMESTAMP '2026-08-13 00:00:00' AS jcap_table_loaddate,
  P.pmc_patid,
  U.managing_hcp_state AS vreferring_hcp_path_state,
  P.prod_nm AS drugortherapy,
  CAST(P.pa_completed_date AS TIMESTAMP) AS pa_completeddate,
  P.pa_disposition AS padisposition,
  CAST(P.appeal_complete_date AS TIMESTAMP) AS appeal_completedate,
  P.appeal_disposition AS appealdisposition,
  CAST(CASE WHEN P.appeal_complete_date > P.pa_completed_date THEN P.appeal_complete_date
            ELSE P.pa_completed_date END AS TIMESTAMP) AS overall_date,
  CASE WHEN UPPER(P.pa_disposition) = 'APPROVED' THEN 'Approved'
       WHEN UPPER(P.pa_disposition) = 'DENIED' AND UPPER(P.appeal_disposition) = 'APPROVED' THEN 'Approved'
       WHEN UPPER(P.pa_disposition) = 'DENIED' THEN 'Denied'
  END AS final_pa_disposition,
  P.fe_required AS ferequired,
  P.rx_planname,
  P.rx_payername,
  P.rx_payertype,
  P.sr_type AS srtype,
  strptime(P.load_date, '%m-%d-%Y') AS load_date,
  P.ins_planname AS insurancebenefitplanname,
  P.pbm_name AS pbmpayername,
  C.lhm_name,
  C.bd_terrname AS region,
  S.dynamic_segment AS segment
FROM (SELECT * FROM payer
      WHERE UPPER(prod_nm) IN ('OPSUMIT', 'UPTRAVI', 'OPSYNVI')
        AND UPPER(pa_disposition) IN ('APPROVED', 'DENIED')
        AND pa_completed_date >= DATE '1996-01-01'
        AND pa_completed_date <= DATE '2000-12-31') P
LEFT JOIN (SELECT DISTINCT pmc_patid, prod_nm, managing_hcp_state,
                  managing_hcp_zip, managing_hcp_jnj_id FROM ref_cap) U
  ON P.pmc_patid = U.pmc_patid AND UPPER(P.prod_nm) = UPPER(U.prod_nm)
LEFT JOIN alignment C ON U.managing_hcp_zip = C.zip
LEFT JOIN (SELECT jnj_id, dynamic_segment FROM seg WHERE actv_flag = '1') S
  ON U.managing_hcp_jnj_id = S.jnj_id
"""


QUERIES = {
    "jcap_pa_extract": QuerySpec(
        "jcap_pa_extract",
        jcap_pa_extract,
        JCAP_PA_EXTRACT_SQL,
        "Reference extract+transform end-to-end: P7-P9 filters, A3 DISTINCT, "
        "J1-J3 left joins, P10/P11 CASEs, P5 projection, O1 sort, P3/P4 transform",
        ("reference-job", "join", "flagship"),
    ),
}
