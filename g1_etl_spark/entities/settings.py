"""Settings entity pipeline — Spark-native rebuild of
/root/reference/mmj/entities/settings.py (transform at :41-233).

The reference's correlated per-dispensary queries (_medical_limits
:236-247, _get_taxes :250-263) and its last-row-wins folds (:169-204,
SURVEY A3) become broadcast joins against per-dispensary aggregates with
EXPLICIT deterministic ordering:

  - taxes: the reference keeps whichever DISTINCT row iterates last
    (undefined order) -> we take MAX(struct(name, amount)) per dispensary.
  - membership pricing: the source is ORDER BY id DESC and the loop is
    last-wins, so the WINNER is the MIN(id) row — cloned exactly.
  - multiple dispensary_details rows: dict.update last-wins -> MAX(id).

Output: a single settings document (one row), nested per the reference:
organizationId, sessionTimeoutDuration, image?/apiKey? (group-deleted
when either is NULL), keys{...}, crm_member_settings? (when pp_enabled),
location_specific{apiKey?, members{paidVisitsEnabled, mandatoryReferral,
medicalLimits?}, sales{enableTaxesIn, hasPriceRounding},
inventory{weightPricing{name, defaultTier, breakpoints{7 cent prices}}}?},
sales_settings_taxes{taxes?}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from g1_etl_spark.functions import scalars as sc
from g1_etl_spark.functions.nested import falsy_to_null
from g1_etl_spark.entities.common import image_url


def transform(dispensary_details: DataFrame, memberships: DataFrame,
              membership_prices: DataFrame, red_flags: DataFrame,
              taxes: DataFrame, dispensary_id: int, organization_id,
              debug: bool = False) -> DataFrame:
    dd = dispensary_details.filter(F.col("dispensary_id") == dispensary_id)

    # last dispensary_details row wins (dict.update fold); the single-row
    # unpartitioned window is safe — there is one row per dispensary
    dd = (dd.withColumn("_rn", F.row_number().over(W.orderBy(F.desc("id"))))
          .filter(F.col("_rn") == 1).drop("_rn"))

    # winner tax row per dispensary (deterministic stand-in ordering)
    tax_win = (taxes.filter(F.col("dispensary_id") == dispensary_id)
               .dropDuplicates(["dispensary_id", "amount", "name"])
               .groupBy("dispensary_id")
               .agg(F.max(F.struct("name", "amount")).alias("_t"))
               .select("dispensary_id",
                       F.col("_t.name").alias("tax_name"),
                       F.col("_t.amount").alias("tax_amount")))

    limits_win = (red_flags.filter(F.col("dispensary_id") == dispensary_id)
                  .groupBy("dispensary_id")
                  .agg(F.max(F.struct(
                      "daily_purchase_limit", "visit_purchase_limit",
                      "daily_visit_limit", "two_week_purchase_limit"))
                      .alias("_l"))
                  .select("dispensary_id", "_l.*"))

    # membership pricing winner = MIN(id): source was ORDER BY id DESC and
    # the reference loop keeps the LAST iterated row
    price_win = (membership_prices
                 .join(F.broadcast(
                     memberships.filter(
                         F.col("dispensary_id") == dispensary_id)
                     .select(F.col("id").alias("membership_id"),
                             "dispensary_id")),
                     "membership_id")
                 .groupBy("dispensary_id")
                 .agg(F.min_by(F.struct(
                     "price_half_gram", "price_gram", "price_two_gram",
                     "price_eigth", "price_quarter", "price_half",
                     "price_ounce"), F.col("id")).alias("_p"))
                 .select("dispensary_id", "_p.*"))

    row = (dd
           .join(F.broadcast(tax_win), "dispensary_id", "left")
           .join(F.broadcast(limits_win), "dispensary_id", "left")
           .join(F.broadcast(price_win), "dispensary_id", "left"))

    img = image_url("logos", F.col("id"), F.col("logo_file_name"),
                    debug=debug)
    api_key = F.col("mmjrevu_api_key")
    img_group_ok = img.isNotNull() & api_key.isNotNull()

    crm = F.when(
        sc.true_or_false("pp_enabled"),
        F.struct(F.struct(
            sc.true_or_false("membership_fee_enabled")
            .alias("membershipLevelsEnabled"),
            F.lit("Unnamed").alias("levelName"),
            F.col("pp_global_dollars_to_points").alias("dollarsPerPoint"),
            F.col("pp_global_points_to_dollars").alias("pointsPerDollar"),
            F.col("pp_points_per_referral").alias("referralPoints"),
        ).alias("membershipLevel")),
    )

    medical_limits = F.when(
        (F.col("red_flags_enabled") == 1)
        & F.col("daily_purchase_limit").isNotNull(),
        F.struct(
            F.lit(True).alias("hasLimits"),
            F.col("daily_purchase_limit").cast("long")
            .alias("dailyPurchaseLimit"),
            F.col("visit_purchase_limit").cast("long")
            .alias("visitPurchaseLimit"),
            F.col("daily_visit_limit").cast("long").alias("dailyVisitLimit"),
            sc.monthly_purchase_limit("two_week_purchase_limit")
            .alias("monthlyPurchaseLimit"),
        ),
    )

    breakpoints = F.when(
        F.col("price_gram").isNotNull(),
        F.struct(F.struct(
            F.lit("Default").alias("name"),
            F.lit(True).alias("defaultTier"),
            F.struct(
                sc.dollars_to_cents("price_half_gram").alias("price_half_gram"),
                sc.dollars_to_cents("price_gram").alias("price_gram"),
                sc.dollars_to_cents("price_two_gram").alias("price_two_gram"),
                sc.dollars_to_cents("price_eigth").alias("price_eighth"),
                sc.dollars_to_cents("price_quarter").alias("price_quarter"),
                sc.dollars_to_cents("price_half").alias("price_half"),
                sc.dollars_to_cents("price_ounce").alias("price_ounce"),
            ).alias("breakpoints"),
        ).alias("weightPricing")),
    )

    taxes_struct = F.when(
        F.col("tax_name").isNotNull(),
        F.struct(
            F.col("tax_name").alias("code"),
            sc.tax_percent("tax_amount").alias("percent"),
            F.lit("sales").alias("type"),
        ),
    )

    location_specific = F.struct(
        falsy_to_null(api_key).alias("apiKey"),
        F.struct(
            sc.true_or_false("allow_unpaid_visits").alias("paidVisitsEnabled"),
            sc.true_or_false("require_customer_referrer")
            .alias("mandatoryReferral"),
            medical_limits.alias("medicalLimits"),
        ).alias("members"),
        F.struct(
            sc.true_or_false("menu_show_tax").alias("enableTaxesIn"),
            sc.true_or_false("calculate_even_totals").alias("hasPriceRounding"),
        ).alias("sales"),
        breakpoints.alias("inventory"),
    )

    keys = F.struct(
        falsy_to_null(F.col("dispensary_id")).alias("dispensary_id"),
        falsy_to_null(F.col("id")).alias("id"),
    )

    doc = F.struct(
        sc.organization_id_lit(organization_id).alias("organizationId"),
        F.col("inactivity_logout").alias("sessionTimeoutDuration"),
        F.when(img_group_ok, img).alias("image"),
        F.when(img_group_ok, api_key).alias("apiKey"),
        crm.alias("crm_member_settings"),
        location_specific.alias("location_specific"),
        F.struct(taxes_struct.alias("taxes")).alias("sales_settings_taxes"),
        keys.alias("keys"),
    )
    return row.select(F.col("id").alias("_id"), doc.alias("doc"))
