"""Physicians entity pipeline — Spark-native rebuild of
/root/reference/mmj/entities/physicians.py (transform at :37-123).

Narrow select, zero shuffles. Output doc per physician:
  name (Dr-prefix stripped, physicians.py:93-96), specialty='General',
  createdAt, updatedAt, email?/verificationWebsite?/licenceNumber?
  (group-deleted if any NULL, physicians.py:109-113), phone[]? (name
  'work'), address[]? (built when ANY of the five location fields is
  truthy, physicians.py:84-91), keys{dispensary_id,id pruned}.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from g1_etl_spark.functions import scalars as sc
from g1_etl_spark.functions.nested import falsy_to_null, phone_array
from g1_etl_spark.entities.common import iso


def _truthy_str(c: Column) -> Column:
    return c.isNotNull() & (c != "")


def transform(physicians: DataFrame, dispensary_id: int,
              organization_id) -> DataFrame:
    p = physicians.filter(F.col("dispensary_id") == dispensary_id)

    group_ok = (F.col("license_no").isNotNull()
                & F.col("website").isNotNull()
                & F.col("email").isNotNull())

    any_loc = (_truthy_str(F.col("city"))
               | _truthy_str(F.col("address"))
               | _truthy_str(F.col("state"))
               | _truthy_str(F.col("zip_code"))
               | _truthy_str(F.col("country")))
    address = F.when(any_loc, F.array(F.struct(
        F.col("address").alias("line1"),
        F.col("city").alias("city"),
        F.col("state").alias("state"),
        F.col("zip_code").alias("zip"),
        F.col("country").alias("country"),
    )))

    keys = F.struct(
        falsy_to_null(F.col("dispensary_id")).alias("dispensary_id"),
        falsy_to_null(F.col("id")).alias("id"),
    )

    doc = F.struct(
        sc.strip_dr_prefix("name").alias("name"),
        sc.physician_specialty().alias("specialty"),
        iso("created_at").alias("createdAt"),
        iso("updated_at").alias("updatedAt"),
        F.when(group_ok, F.col("email")).alias("email"),
        F.when(group_ok, F.col("website")).alias("verificationWebsite"),
        F.when(group_ok, F.col("license_no")).alias("licenceNumber"),
        phone_array(F.col("phone_number"), name="work").alias("phone"),
        address.alias("address"),
        keys.alias("keys"),
    )
    return p.select(F.col("id").alias("_id"), doc.alias("doc"))
