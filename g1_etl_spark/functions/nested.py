"""Nested-structure constructors (SURVEY §2.8, N1–N6).

The reference's signature workload: per-row Python dicts with
truthiness-pruned key maps, array-of-struct addresses/phones, and
absent-key JSON semantics. Spark-native mapping:

  - `keys` provenance map (N1)  -> MapType + map_filter        (F5 pruning)
  - address/phone (N2/N3)       -> struct / array(struct)
  - absent-key-when-NULL (F4)   -> to_json drops null struct fields
                                   (spark.sql.jsonGenerator.ignoreNullFields)
  - group-deletes (F4)          -> when(all-present, struct) otherwise NULL

All pure Column expressions — codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Python-truthiness surrogate on stringified map values: the reference
# drops keys whose value is falsy (None / 0 / 0.0 / '' / False —
# mmj/entities/members.py:120-122 et al.). Map values are strings here
# (Spark maps are homogeneous), so the falsy set stringifies to:
_FALSY_STRINGS = ("", "0", "0.0", "false", "False")


def truthiness_pruned_map(pairs: dict[str, Column]) -> Column:
    """N1/F5: build a string->string map and drop falsy-valued entries.

    Reference: `keys` dict + truthiness pruning, e.g.
    mmj/entities/members.py:105-122, menu_items.py:133-148.
    """
    entries: list[Column] = []
    for k, v in pairs.items():
        entries.append(F.lit(k))
        entries.append(v.cast("string"))
    m = F.create_map(*entries)
    return F.map_filter(
        m, lambda _k, v: v.isNotNull() & ~v.isin(*_FALSY_STRINGS))


def falsy_to_null(col: Column) -> Column:
    """Python-truthiness gate preserving the original type: falsy values
    (NULL / 0 / 0.0 / '' / false) become NULL, so a wrapping struct field
    vanishes from to_json output — the reference's key-delete semantics
    with the original JSON value types intact."""
    s = col.cast("string")
    return F.when(s.isNotNull() & ~s.isin(*_FALSY_STRINGS), col)


def address_struct(line1: Column, city: Column, state: Column,
                   zip_: Column, country: Column | None = None,
                   line2: Column | None = None) -> Column:
    """N2: address struct, NULL as a whole when line1 is NULL (the
    reference drops the key when the source address is missing,
    mmj/entities/vendors.py:65-75, physicians.py:115-116)."""
    fields = [line1.alias("line1")]
    if line2 is not None:
        fields.append(line2.alias("line2"))
    fields += [city.alias("city"), state.alias("state"), zip_.alias("zip")]
    if country is not None:
        fields.append(country.alias("country"))
    return F.when(line1.isNotNull(), F.struct(*fields))


def phone_array(number: Column, name: str = "business") -> Column:
    """N3: [{name, number, default:true}] when number present, else NULL
    (absent key). Reference: mmj/entities/vendors.py:82-89."""
    return F.when(
        number.isNotNull(),
        F.array(F.struct(
            F.lit(name).alias("name"),
            number.alias("number"),
            F.lit(True).alias("default"),
        )),
    )


def group_nullable_struct(required: list[Column], struct_col: Column) -> Column:
    """F4 group-delete: emit struct only when EVERY required column is
    non-NULL (licence/email/website dropped as a group if any is NULL,
    mmj/entities/vendors.py:77-80)."""
    cond = F.lit(True)
    for c in required:
        cond = cond & c.isNotNull()
    return F.when(cond, struct_col)
