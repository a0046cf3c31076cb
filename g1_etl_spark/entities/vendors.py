"""Vendors entity pipeline — Spark-native rebuild of
/root/reference/mmj/entities/vendors.py (transform at :36-122).

Narrow select over `vendors` filtered by dispensary_id (the petl
fieldmap+merge collapses into one select, SURVEY §2.4 J3). Zero shuffles.

Output doc per vendor: name, accountStatus, email?/website?/
licenceNumber? (group-deleted if ANY is NULL, vendors.py:77-80),
phone[]?, address?, keys{dispensary_id,id,mmjvenu_id pruned}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from g1_etl_spark.functions import scalars as sc
from g1_etl_spark.functions.nested import falsy_to_null, phone_array


def transform(vendors: DataFrame, dispensary_id: int,
              organization_id) -> DataFrame:
    v = vendors.filter(F.col("dispensary_id") == dispensary_id)

    # licence/email/website vanish as a group when any is NULL
    group_ok = (F.col("liscense_no").isNotNull()
                & F.col("email").isNotNull()
                & F.col("website").isNotNull())

    address = F.when(
        F.col("address").isNotNull(),
        F.struct(
            F.col("address").alias("line1"),
            F.lit(None).cast("string").alias("line2"),
            F.col("city").alias("city"),
            F.col("state").alias("state"),
            F.col("zip_code").alias("zip"),
            F.col("country").alias("country"),
        ),
    )

    keys = F.struct(
        falsy_to_null(F.col("dispensary_id")).alias("dispensary_id"),
        falsy_to_null(F.col("id")).alias("id"),
        falsy_to_null(F.col("mmjvenu_id")).alias("mmjvenu_id"),
    )

    doc = F.struct(
        F.col("name").alias("name"),
        sc.vendor_account_status("confirmed").alias("accountStatus"),
        F.when(group_ok, F.col("email")).alias("email"),
        F.when(group_ok, F.col("website")).alias("website"),
        F.when(group_ok, F.col("liscense_no")).alias("licenceNumber"),
        phone_array(F.col("phone_number"), name="business").alias("phone"),
        address.alias("address"),
        keys.alias("keys"),
    )
    return v.select(F.col("id").alias("_id"), doc.alias("doc"))
