"""Menu-items (products) entity pipeline — Spark-native rebuild of
/root/reference/mmj/entities/menu_items.py (transform at :52-206).

The reference issues 3+ correlated SQL queries PER ROW (_wm_integration
:237-251, _map_uom :254-274, _restock_level :219-234) plus an in-loop
re-scan of the price table (:111-116). Here each becomes one broadcast
join — the single biggest semantic-preserving rewrite (SURVEY §4):

  menu_items ⋈bcast categories        (unitOfMeasure flip + category name)
  menu_items ⋈bcast wm_integrations   (left -> shareOnWM existence bool)
  menu_items ⋈bcast dispensary_details(restockLevel by product_type)
  menu_items ⋈bcast price_winner      (per-dispensary last-wins price row)

All dimension-sized per dispensary => zero shuffles on the fact side at
any scale.

Fidelity (SURVEY §7.4):
  - weightPricing: the reference overwrites per price row, so the LAST
    row in natural MySQL order wins for EVERY item; stand-in ordering =
    MAX(id) (documented divergence: natural order ~ insertion id).
  - active = (on_hold == 1) cloned as-is (:210-216, suspect inverted).
  - inactive-item purge: the reference's remove-while-iterating skips
    elements (:196-199); we implement the intent (keep active only).
  - medicine_amount leaks into the reference output (never deleted);
    cloned for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from g1_etl_spark.functions import scalars as sc
from g1_etl_spark.functions.nested import falsy_to_null
from g1_etl_spark.entities.common import image_url, iso


def transform(menu_items: DataFrame, categories: DataFrame,
              menu_item_prices: DataFrame, wm_integrations: DataFrame,
              dispensary_details: DataFrame, dispensary_id: int,
              organization_id, debug: bool = False) -> DataFrame:
    mi = menu_items.filter(F.col("dispensary_id") == dispensary_id)

    cats = (categories
            .select(F.col("id").alias("category_id"),
                    F.col("name").alias("category_name"),
                    "measurement")
            .dropDuplicates(["category_id"]))

    wm = (wm_integrations
          .select(F.col("menu_item_id").alias("id"))
          .distinct()
          .withColumn("_wm", F.lit(True)))

    dd = (dispensary_details
          .select("dispensary_id", "grams_hold_at", "units_hold_at")
          .dropDuplicates(["dispensary_id"]))

    # per-dispensary winning price row: last in natural order ~ MAX(id)
    price_win = (menu_item_prices
                 .filter(F.col("dispensary_id") == dispensary_id)
                 .groupBy("dispensary_id")
                 .agg(F.max_by(F.struct(
                     "price_half_gram", "price_gram", "price_two_gram",
                     "price_eigth", "price_quarter", "price_half",
                     "price_ounce"), F.col("id")).alias("_p"))
                 .select("dispensary_id", "_p.*"))

    j = (mi
         .join(F.broadcast(cats), "category_id", "left")
         # wm_integrations grows with the catalog — no hint; AQE decides
         .join(wm, "id", "left")
         .join(F.broadcast(dd), "dispensary_id", "left")
         .join(F.broadcast(price_win), "dispensary_id", "left"))

    uom = sc.map_uom("measurement")
    active = sc.menu_item_active("on_hold")

    weight_pricing = F.when(
        F.col("price_gram").isNotNull(),
        F.struct(
            sc.dollars_to_cents("price_half_gram").alias("price_half_gram"),
            sc.dollars_to_cents("price_two_gram").alias("price_two_gram"),
            sc.dollars_to_cents("price_gram").alias("price_gram"),
            sc.dollars_to_cents("price_eigth").alias("price_eighth"),
            sc.dollars_to_cents("price_quarter").alias("price_quarter"),
            sc.dollars_to_cents("price_half").alias("price_half"),
            sc.dollars_to_cents("price_ounce").alias("price_ounce"),
        ),
    )

    keys = F.struct(
        falsy_to_null(F.col("dispensary_id")).alias("dispensary_id"),
        falsy_to_null(F.col("id")).alias("id"),
        falsy_to_null(F.col("menu_id")).alias("menu_id"),
        falsy_to_null(F.col("vendor_id")).alias("vendor_id"),
        falsy_to_null(F.col("strain_id")).alias("strain_id"),
        falsy_to_null(F.col("category_id")).alias("category_id"),
    )

    doc = F.struct(
        F.col("name").alias("name"),
        iso("created_at").alias("createdAt"),
        iso("updated_at").alias("updatedAt"),
        sc.create_epoch("created_at").alias("createdAtEpoch"),
        F.coalesce(F.col("_wm"), F.lit(False)).alias("shareOnWM"),
        uom.alias("unitOfMeasure"),
        sc.map_categories(F.col("category_name"), F.col("sativa"),
                          F.col("indica")).alias("categoryId"),
        sc.net_marijuana(uom, "medicine_amount").alias("netMarijuana"),
        F.col("medicine_amount").alias("medicine_amount"),
        image_url("menu_items/images", F.col("id"),
                  F.col("image_file_name"), debug=debug)
        .alias("image_file_name"),
        F.struct(
            F.col("id").alias("id"),
            active.alias("active"),
            weight_pricing.alias("weightPricing"),
        ).alias("locationProductDetails"),
        F.when(F.col("product_type") == 1, F.col("grams_hold_at"))
        .otherwise(F.col("units_hold_at")).alias("restockLevel"),
        keys.alias("keys"),
    )

    return (j.filter(active)  # intent of the buggy purge (:196-199)
            .select(F.col("id").alias("_id"), doc.alias("doc")))
