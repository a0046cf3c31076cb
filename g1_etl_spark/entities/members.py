"""Members entity pipeline — Spark-native rebuild of
/root/reference/mmj/entities/members.py (transform at :38-163).

One narrow select over `customers` filtered by dispensary_id: zero
shuffles, zero UDFs. At 100 TB this partitions by dispensary_id and
pipelines entirely map-side.

Output document per member (field set = the reference's post-delete dict;
the golden sample json_structure:4-33 differs from the code in places —
the code wins, SURVEY §5):
  name, phone_number, email, dateOfBirth, memberType, mmjCard,
  isCaregiver, identificationNumber, points, taxExempt, accountStatus,
  accountStatusNotes (divergence C26: the reference maps this backwards
  from a nonexistent column and then deletes it; we implement the intent),
  address[], expiryDate?, identificationType, createdAt, updatedAt,
  keys{...truthiness-pruned...}
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from g1_etl_spark.functions import scalars as sc
from g1_etl_spark.functions.nested import falsy_to_null
from g1_etl_spark.entities.common import iso


def transform(customers: DataFrame, dispensary_id: int,
              organization_id) -> DataFrame:
    m = customers.filter(F.col("dispensary_id") == dispensary_id)

    keys = F.struct(
        falsy_to_null(F.col("id")).alias("id"),
        falsy_to_null(F.col("caregiver_id")).alias("caregiver_id"),
        falsy_to_null(F.col("dispensary_id")).alias("dispensary_id"),
        falsy_to_null(F.col("physician_id")).alias("physician_id"),
        falsy_to_null(F.col("custom_membership_id"))
        .alias("custom_membership_id"),
        falsy_to_null(F.col("organization_membership_id"))
        .alias("organization_membership_id"),
        falsy_to_null(F.col("picture_file_name")).alias("picture_file_name"),
        falsy_to_null(F.col("organization_id")).alias("organization_id"),
    )

    doc = F.struct(
        F.col("name").alias("name"),
        F.col("phone_number").alias("phone_number"),
        F.col("email").alias("email"),
        # NULL dob -> epoch start (members.py:136-138)
        iso(sc.dob_default("dob")).alias("dateOfBirth"),
        sc.member_type("license_type").alias("memberType"),
        F.col("registry_no").alias("mmjCard"),
        sc.true_or_false("given_caregivership").alias("isCaregiver"),
        F.col("drivers_license_no").alias("identificationNumber"),
        F.col("points").alias("points"),
        sc.true_or_false("tax_exempt").alias("taxExempt"),
        sc.account_status_inverted("locked_visits").alias("accountStatus"),
        sc.account_status_notes("locked_visits_reason")
        .alias("accountStatusNotes"),
        F.array(F.struct(
            F.col("address").alias("line1"),
            F.col("city").alias("city"),
            F.col("state").alias("state"),
            F.col("zip_code").alias("zip"),
        )).alias("address"),
        # expiryDate only when card_expires_at present (members.py:116-117)
        iso(sc.expiry_date_copy("card_expires_at")).alias("expiryDate"),
        sc.identification_type().alias("identificationType"),
        iso("created_at").alias("createdAt"),
        iso("updated_at").alias("updatedAt"),
        keys.alias("keys"),
    )
    return m.select(F.col("id").alias("_id"), doc.alias("doc"))
