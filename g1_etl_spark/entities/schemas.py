"""Explicit source-table schemas (the reference's schemas are implicit in
`SELECT *` + cut lists; reconstructed in /root/repo/FIXTURES.md §A).

At production scale these tables arrive over JDBC (spark.read.jdbc with
partitionColumn=dispensary_id) or as parquet exports partitioned by
dispensary_id; either way the explicit StructType is the input contract.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*fields) -> T.StructType:
    return T.StructType([
        T.StructField(n, t, True) for n, t in fields
    ])


LONG = T.LongType()
INT = T.IntegerType()
DBL = T.DoubleType()
STR = T.StringType()
TS = T.TimestampType()

CUSTOMERS = _s(
    ("id", LONG), ("dispensary_id", LONG), ("picture_file_name", STR),
    ("name", STR), ("email", STR), ("address", STR), ("phone_number", STR),
    ("dob", TS), ("license_type", INT), ("registry_no", STR),
    ("membership_id", LONG), ("given_caregivership", INT),
    ("tax_exempt", INT), ("drivers_license_no", STR), ("points", DBL),
    ("locked_visits", INT), ("locked_visits_reason", STR),
    ("caregiver_id", LONG), ("card_expires_at", TS), ("created_at", TS),
    ("updated_at", TS), ("physician_id", LONG),
    ("custom_membership_id", STR), ("organization_membership_id", STR),
    ("city", STR), ("state", STR), ("zip_code", STR),
    ("organization_id", LONG),
)

USERS = _s(
    ("id", LONG), ("email", STR), ("first_name", STR), ("last_name", STR),
    ("login", STR), ("organization_id", LONG), ("created_at", TS),
    ("updated_at", TS),
)

DISPENSARY_USERS = _s(
    ("user_id", LONG), ("dispensary_id", LONG), ("active", INT),
    ("access", INT),
)

VENDORS = _s(
    ("id", LONG), ("dispensary_id", LONG), ("mmjvenu_id", STR),
    ("name", STR), ("phone_number", STR), ("email", STR), ("country", STR),
    ("state", STR), ("city", STR), ("address", STR), ("zip_code", STR),
    ("liscense_no", STR), ("confirmed", INT), ("website", STR),
)

PHYSICIANS = _s(
    ("id", LONG), ("dispensary_id", LONG), ("name", STR), ("email", STR),
    ("created_at", TS), ("updated_at", TS), ("address", STR), ("city", STR),
    ("state", STR), ("country", STR), ("zip_code", STR), ("website", STR),
    ("license_no", STR), ("phone_number", STR),
)

MENU_ITEMS = _s(
    ("id", LONG), ("vendor_id", LONG), ("menu_id", LONG),
    ("dispensary_id", LONG), ("strain_id", LONG), ("created_at", TS),
    ("updated_at", TS), ("category_id", LONG), ("name", STR),
    ("sativa", INT), ("indica", INT), ("on_hold", INT),
    ("product_type", INT), ("image_file_name", STR),
    ("medicine_amount", DBL),
)

CATEGORIES = _s(("id", LONG), ("name", STR), ("measurement", INT),
                ("dispensary_id", LONG))

MENU_ITEM_PRICES = _s(
    ("id", LONG), ("menu_item_id", LONG), ("dispensary_id", LONG),
    ("price_half_gram", DBL), ("price_gram", DBL), ("price_two_gram", DBL),
    ("price_eigth", DBL), ("price_quarter", DBL), ("price_half", DBL),
    ("price_ounce", DBL),
)

DISPENSARY_DETAILS = _s(
    ("id", LONG), ("dispensary_id", LONG), ("menu_show_tax", INT),
    ("logo_file_name", STR), ("inactivity_logout", INT),
    ("calculate_even_totals", INT), ("require_customer_referrer", INT),
    ("membership_fee_enabled", INT), ("pp_enabled", INT),
    ("pp_global_dollars_to_points", DBL),
    ("pp_global_points_to_dollars", DBL), ("pp_points_per_referral", DBL),
    ("allow_unpaid_visits", INT), ("red_flags_enabled", INT),
    ("mmjrevu_api_key", STR), ("grams_hold_at", DBL),
    ("units_hold_at", DBL),
)

MEMBERSHIPS = _s(("id", LONG), ("dispensary_id", LONG))

MEMBERSHIP_PRICES = _s(
    ("id", LONG), ("membership_id", LONG),
    ("price_half_gram", DBL), ("price_gram", DBL), ("price_two_gram", DBL),
    ("price_eigth", DBL), ("price_quarter", DBL), ("price_half", DBL),
    ("price_ounce", DBL),
)

RED_FLAGS = _s(
    ("dispensary_id", LONG), ("daily_purchase_limit", DBL),
    ("visit_purchase_limit", DBL), ("daily_visit_limit", DBL),
    ("two_week_purchase_limit", DBL),
)

TAXES = _s(("dispensary_id", LONG), ("amount", DBL), ("name", STR))

WM_INTEGRATIONS = _s(("menu_item_id", LONG),)

ALL_SCHEMAS = {
    "customers": CUSTOMERS,
    "users": USERS,
    "dispensary_users": DISPENSARY_USERS,
    "vendors": VENDORS,
    "physicians": PHYSICIANS,
    "menu_items": MENU_ITEMS,
    "categories": CATEGORIES,
    "menu_item_prices": MENU_ITEM_PRICES,
    "dispensary_details": DISPENSARY_DETAILS,
    "memberships": MEMBERSHIPS,
    "membership_prices": MEMBERSHIP_PRICES,
    "red_flags": RED_FLAGS,
    "taxes": TAXES,
    "menu_item_weedmaps_integrations": WM_INTEGRATIONS,
}
