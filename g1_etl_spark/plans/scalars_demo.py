"""Oracle-backed queries exercising the scalar function library (C1–C26)
on the driver's testdata tables.

The entity-specific semantics (category chains, role maps, truncating
cents, 'None Smith' concat, Dr-prefix strip, …) are applied to synthetic
driver columns so the DuckDB oracle can verify every branch at sf0.01.
Unit tests on handcrafted edge rows live in tests/test_scalars.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g1_etl_spark.catalog import load_table
from g1_etl_spark.functions import scalars as sc
from g1_etl_spark.plans.registry import register


@register(
    "scalar_flags_enums",
    oracle="""
    SELECT o_orderkey,
           COALESCE(o_orderkey % 2 = 1, FALSE) AS flag_c1,
           CASE WHEN o_orderkey % 2 = 1 THEN 'INACTIVE'
                WHEN o_orderkey % 2 = 0 THEN 'ACTIVE' END AS status_c2,
           CASE WHEN o_custkey % 2 = 1 THEN 'MEDICAL'
                ELSE 'RECREATIONAL' END AS member_type_c8,
           CASE WHEN o_custkey % 5 IN (1, 2) THEN 'site-admin'
                WHEN o_custkey % 5 = 3 THEN 'store-manager'
                ELSE 'budtender' END AS role_c9,
           CASE WHEN o_custkey % 3 = 1 THEN 'ACTIVE'
                WHEN o_custkey % 3 = 0 THEN 'INACTIVE' END AS emp_active_c10,
           CASE WHEN o_custkey % 3 = 1 THEN 2 ELSE 1 END AS uom_c12,
           CASE WHEN o_orderstatus = 'O' THEN 'ACTIVE'
                ELSE 'INACTIVE' END AS vendor_status_c24
    FROM orders
    """,
    description="C1/C2/C8/C9/C10/C12/C24: flag + enum when-chains",
    tags=("scalar",),
)
def scalar_flags_enums(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # emp_active_c10 semantics: active==1 -> ACTIVE, NULL -> INACTIVE,
    # 0 -> NULL. Synthesize active as NULL when %3==0 else %3 (1 or 2...
    # use ==1 branch); map %3: 1->1(ACTIVE), 2->0(NULL path), 0->NULL(INACTIVE).
    active = (F.when(F.col("o_custkey") % 3 == 1, 1)
              .when(F.col("o_custkey") % 3 == 2, 0))
    return o.select(
        "o_orderkey",
        sc.true_or_false(F.col("o_orderkey") % 2).alias("flag_c1"),
        sc.account_status_inverted(F.col("o_orderkey") % 2).alias("status_c2"),
        sc.member_type(F.col("o_custkey") % 2).alias("member_type_c8"),
        sc.assign_role(F.col("o_custkey") % 5).alias("role_c9"),
        sc.employee_active_status(active).alias("emp_active_c10"),
        sc.map_uom(F.when(F.col("o_custkey") % 3 == 1, 1).otherwise(2))
        .alias("uom_c12"),
        sc.vendor_account_status(
            F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .alias("vendor_status_c24"),
    )


@register(
    "scalar_dates_money",
    oracle="""
    SELECT o_orderkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_c3,
           CAST(CASE WHEN o_totalprice * 100 >= 0
                     THEN FLOOR(o_totalprice * 100)
                     ELSE -FLOOR(-(o_totalprice * 100)) END AS BIGINT)
               AS cents_c4,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso_c5,
           COALESCE(NULL, TIMESTAMP '1970-01-01 00:00:00') AS dob_c16,
           TIMESTAMP '1970-01-01 02:30:00' AS emp_dob_c17,
           -- Spark's double->long cast truncates (= Python int()); DuckDB's
           -- CAST(double AS BIGINT) rounds, so trunc() explicitly here.
           CASE WHEN o_custkey % 3 = 1
                THEN CAST(trunc(o_totalprice) AS BIGINT) END AS net_mj_c18,
           o_totalprice / 100 AS tax_pct_c19,
           CAST(o_custkey AS BIGINT) * 2 AS monthly_c20,
           CASE WHEN o_orderdate IS NOT NULL THEN o_orderdate END AS expiry_c21,
           'Drivers License' AS id_type_c22,
           'General' AS specialty_c23
    FROM orders
    """,
    description="C3/C4/C5/C16/C17/C18/C19/C20/C21/C22/C23: date + money scalars",
    tags=("scalar",),
)
def scalar_dates_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    uom = F.when(F.col("o_custkey") % 3 == 1, 2).otherwise(1)
    return o.select(
        "o_orderkey",
        sc.create_epoch("o_orderdate").alias("epoch_c3"),
        sc.dollars_to_cents("o_totalprice").alias("cents_c4"),
        sc.json_serial("o_orderdate").alias("iso_c5"),
        sc.dob_default(F.lit(None).cast("timestamp")).alias("dob_c16"),
        sc.employee_const_dob().alias("emp_dob_c17"),
        sc.net_marijuana(uom, "o_totalprice").alias("net_mj_c18"),
        sc.tax_percent("o_totalprice").alias("tax_pct_c19"),
        sc.monthly_purchase_limit("o_custkey").alias("monthly_c20"),
        sc.expiry_date_copy("o_orderdate").alias("expiry_c21"),
        sc.identification_type().alias("id_type_c22"),
        sc.physician_specialty().alias("specialty_c23"),
    )


@register(
    "scalar_strings",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_custkey % 3 = 0 AND c_custkey % 2 = 0
                THEN c_name
                ELSE concat_ws(' ',
                       CASE WHEN c_custkey % 3 = 0 THEN 'None'
                            ELSE substr(c_name, 1, 8) END,
                       CASE WHEN c_custkey % 2 = 0 THEN 'None'
                            ELSE 'Smith' END)
           END AS full_name_c6,
           substr(sha256(CAST(c_custkey AS VARCHAR)), 1, 12) || '@example.org'
               AS email_c7,
           trim(regexp_replace(
                CASE WHEN c_custkey % 2 = 0 THEN 'Dr. ' || c_name
                     ELSE c_name END,
                '(?i)^(Dr(?:.)?s|(?:Dr.?))', '')) AS clean_name_c14,
           concat('https://images-production.example.com/customers/',
                  CAST(c_custkey AS VARCHAR), '/', c_name, '.jpg') AS url_c15,
           '42' AS org_id_c25,
           c_mktsegment AS notes_c26
    FROM customer
    """,
    description="C6/C7/C14/C15/C25/C26: string scalars (name concat, email, "
                "Dr-strip, URL build)",
    tags=("scalar",),
)
def scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    first = F.when(F.col("c_custkey") % 3 != 0, F.substring("c_name", 1, 8))
    last = F.when(F.col("c_custkey") % 2 != 0, F.lit("Smith"))
    dr_name = F.when(F.col("c_custkey") % 2 == 0,
                     F.concat(F.lit("Dr. "), F.col("c_name"))
                     ).otherwise(F.col("c_name"))
    return c.select(
        "c_custkey",
        sc.set_name(first, last, F.col("c_name")).alias("full_name_c6"),
        sc.deterministic_email("c_custkey").alias("email_c7"),
        sc.strip_dr_prefix(dr_name).alias("clean_name_c14"),
        F.concat(
            sc.s3_image_url("production", "customers", "c_custkey",
                            F.concat(F.col("c_name"), F.lit(".jpg")))
        ).alias("url_c15"),
        sc.organization_id_lit(42).alias("org_id_c25"),
        sc.account_status_notes("c_mktsegment").alias("notes_c26"),
    )


@register(
    "scalar_category_chain",
    oracle="""
    SELECT p_partkey,
           CASE
             WHEN lower(cat) = 'cannabis' AND sativa > 0 AND indica > 0
                  AND sativa > 80 THEN 'Sativa'
             WHEN lower(cat) = 'cannabis' AND sativa > 0 AND indica > 0
                  AND indica > 80 THEN 'Indica'
             WHEN lower(cat) = 'cannabis' AND NOT (sativa > 0 AND indica > 0)
                  THEN 'Hybrid'
             WHEN lower(cat) = 'paraphernalia' THEN 'Gear'
             WHEN lower(cat) = 'tincture' THEN 'Tinctures'
             WHEN lower(cat) = 'prerolled' THEN 'Preroll'
             WHEN cat = 'Seeds' THEN 'Seed'
             WHEN cat = 'Drinks' THEN 'Drink'
             WHEN cat = 'Edibles' THEN 'Edible'
             WHEN cat NOT IN ('Indica','Sativa','Hybrid','Edible',
                              'Concentrate','Drink','Clone','Seed',
                              'Tinctures','Gear','Topicals','Preroll',
                              'Wax','Hash') THEN 'Other'
             ELSE cat END AS category_c13
    FROM (SELECT p_partkey,
                 ['Cannabis','Paraphernalia','Tincture','Prerolled','Seeds',
                  'Drinks','Edibles','Clone','Concentrate','Topicals','Widget'
                 ][(CAST(p_partkey AS INT) % 11) + 1] AS cat,
                 (p_size * 7) % 101 AS sativa,
                 (p_size * 13) % 101 AS indica
          FROM part)
    """,
    description="C13: full category normalization chain — exact reference "
                "decision order (cannabis both>0 gate, case-insensitive "
                "specials, CAT_MAP passthrough)",
    tags=("scalar",),
)
def scalar_category_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    cats = ["Cannabis", "Paraphernalia", "Tincture", "Prerolled", "Seeds",
            "Drinks", "Edibles", "Clone", "Concentrate", "Topicals", "Widget"]
    cat = F.array(*[F.lit(x) for x in cats]).getItem(
        (F.col("p_partkey") % 11).cast("int"))
    sativa = (F.col("p_size") * 7) % 101
    indica = (F.col("p_size") * 13) % 101
    return p.select(
        "p_partkey",
        sc.map_categories(cat, sativa, indica).alias("category_c13"),
    )
