"""Employees entity pipeline — Spark-native rebuild of
/root/reference/mmj/entities/employees.py (transform at :41-111).

The reference's per-row correlated queries against dispensary_users
(_active :135-152, _assign_role :155-177 — the N+1 pattern, SURVEY S4)
become ONE broadcast left join against a deduplicated dispensary_users
projection. dispensary_users is dimension-sized per dispensary, so the
join never shuffles the users side.

Fidelity notes (SURVEY §7.4):
  - role: the reference's `elif id == 3` tests the USER id (bug); we
    implement the intent (access == 3 -> store-manager).
  - the reference's _active/_assign_role re-query WITHOUT the dispensary
    filter; we keep the dispensary-scoped rows (intent).
  - the reference leaks the raw `updated_at` column into its output via
    petl merge; not cloned.
  - email: Faker safe_email() when fake_email or debug -> replaced by a
    deterministic sha-derived address (C7), excluded from hash goldens.
  - rows with multiple dispensary_users entries: the reference takes the
    first row of an unordered DISTINCT — we take MIN(access)/MAX(active)
    per user as the deterministic stand-in (documented divergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from g1_etl_spark.functions import scalars as sc
from g1_etl_spark.functions.nested import falsy_to_null
from g1_etl_spark.entities.common import iso


def transform(users: DataFrame, dispensary_users: DataFrame,
              dispensary_id: int, organization_id,
              fake_email: bool = True, debug: bool = False) -> DataFrame:
    du = (dispensary_users
          .filter(F.col("dispensary_id") == dispensary_id)
          .groupBy("user_id")
          .agg(F.min("access").alias("access"),
               F.max("active").alias("active")))

    emp = (users
           .join(F.broadcast(du), users.id == du.user_id, "inner"))

    email = (sc.deterministic_email("id")
             if (fake_email or debug) else F.col("email"))

    keys = F.struct(
        falsy_to_null(F.col("id")).alias("id"),
        falsy_to_null(F.col("organization_id")).alias("organization_id"),
    )

    doc = F.struct(
        sc.set_name(F.col("first_name"), F.col("last_name"), F.col("login"))
        .alias("name"),
        sc.assign_role("access").alias("role"),
        iso("created_at").alias("createdAt"),
        iso("updated_at").alias("updatedAt"),
        iso(sc.employee_const_dob()).alias("dateOfBirth"),
        sc.employee_active_status("active").alias("accountStatus"),
        email.alias("email"),
        keys.alias("keys"),
    )
    return emp.select(F.col("id").alias("_id"), doc.alias("doc"))
