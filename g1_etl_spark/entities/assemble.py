"""Whole-organization payload assembly + sinks — Spark-native rebuild of
/root/reference/mmj/etl_import.py:21-71.

The reference builds one nested dict {organizationId, settings,
employees, members, products, vendors, physicians, validated, imported,
extractedDate, summary} and writes it to a local JSON file + a MongoDB
collection. Here each entity pipeline stays a distributed DataFrame until
the payload boundary; the per-org document is assembled with
collect_list(struct) aggregations (each entity list is org-scoped, i.e.
dimension-sized) and serialized once.

At 100 TB the per-entity DataFrames write directly to partitioned sinks
(sources/sinks.py); the single-document path exists for reference parity.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from g1_etl_spark.entities import (employees as emp, members as mem,
                                   menu_items as prod, physicians as phys,
                                   settings as sett, vendors as vend)
from g1_etl_spark.entities.common import docs


def _sorted_docs(df: DataFrame) -> list[dict]:
    return docs(df.orderBy("_id"))


def build_payload(sources: dict[str, DataFrame], dispensary_id: int,
                  organization_id, debug: bool = False,
                  extracted_date: int | None = None) -> dict:
    """Assemble the per-organization import document (etl_import.py:21-58).

    `summary` counters are structural zeros in the reference
    (etl_import.py:32-57 — never incremented); reproduced as zeros.
    """
    settings_docs = _sorted_docs(sett.transform(
        sources["dispensary_details"], sources["memberships"],
        sources["membership_prices"], sources["red_flags"],
        sources["taxes"], dispensary_id, organization_id, debug=debug))
    payload = {
        "organizationId": str(organization_id),
        "source": "mmjMenu",
        "extractedDate": int(extracted_date if extracted_date is not None
                             else time.time()),
        "validated": False,
        "imported": False,
        "settings": settings_docs[0] if settings_docs else {},
        "employees": _sorted_docs(emp.transform(
            sources["users"], sources["dispensary_users"], dispensary_id,
            organization_id, fake_email=True, debug=debug)),
        "members": _sorted_docs(mem.transform(
            sources["customers"], dispensary_id, organization_id)),
        "products": _sorted_docs(prod.transform(
            sources["menu_items"], sources["categories"],
            sources["menu_item_prices"],
            sources["menu_item_weedmaps_integrations"],
            sources["dispensary_details"], dispensary_id, organization_id,
            debug=debug)),
        "vendors": _sorted_docs(vend.transform(
            sources["vendors"], dispensary_id, organization_id)),
        "physicians": _sorted_docs(phys.transform(
            sources["physicians"], dispensary_id, organization_id)),
        "summary": {
            entity: {"valid": 0, "invalid": 0}
            for entity in ("members", "employees", "products", "vendors",
                           "physicians")
        },
    }
    return payload


def write_payload_json(payload: dict, path: str) -> None:
    """K1 JSON file sink (etl_import.py:59-64): sorted keys, indent 4."""
    with open(path, "w") as f:
        json.dump(payload, f, sort_keys=True, indent=4)
