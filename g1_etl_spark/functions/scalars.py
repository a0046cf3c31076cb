"""Scalar function library — native Column expressions reproducing every
scalar transform in the reference (SURVEY.md §2.9, C1–C26).

Every builder is a pure function Column -> Column compiled to Catalyst
expressions (whole-stage codegen; zero Python UDFs — the reference's petl
lambdas all become JVM-side expressions, SURVEY §2.10).

Fidelity policy (SURVEY §7.4):
  - "clone-exactly": deterministic oddities are reproduced bit-for-bit and
    documented inline (truncation, 'None Smith' concat, enum flips).
  - "clone-the-intent": reference *bugs* (role id==3 test, mixed-type
    returns) are implemented as intended, with the divergence noted.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- C1 -----------------------------------------------------------------
def true_or_false(col: Column | str) -> Column:
    """1 -> true, anything else (incl. 0 and NULL) -> false.

    Reference: mmj/utilities/utils.py:149-157 (`true_or_false`).
    """
    return F.coalesce(_c(col) == 1, F.lit(False))


# -- C2 -----------------------------------------------------------------
def account_status_inverted(col: Column | str) -> Column:
    """1 -> 'INACTIVE', 0 -> 'ACTIVE', else NULL.

    Reference: mmj/utilities/utils.py:160-168 (`account_status`) — note the
    inversion vs C1 and its mixed-type `False` fallback; we diverge by
    returning NULL for the (unreachable in practice) fallback, documented
    per SURVEY §7.4 clone-the-intent.
    """
    c = _c(col)
    return F.when(c == 1, "INACTIVE").when(c == 0, "ACTIVE")


# -- C3 -----------------------------------------------------------------
def create_epoch(col: Column | str) -> Column:
    """datetime -> epoch SECONDS (not ms; the golden doc shows ms but the
    code produces seconds — code wins, SURVEY §1.2).

    Reference: mmj/utilities/utils.py:171-175.
    """
    return F.unix_timestamp(_c(col))


# -- C4 -----------------------------------------------------------------
def dollars_to_cents(col: Column | str) -> Column:
    """dollars * 100 truncated toward zero — int(d*100), NOT rounded.

    Reference: mmj/utilities/utils.py:178-180. Uses float multiply then
    truncation so 19.99 -> 1998 when 19.99*100 == 1998.9999... — the
    reference's float artifact is preserved (clone-exactly).
    """
    d = _c(col).cast("double") * 100
    # int() truncates toward zero; floor() rounds toward -inf — differ on
    # negatives, so emulate int() exactly:
    return F.when(d >= 0, F.floor(d)).otherwise(-F.floor(-d)).cast("long")


# -- C5 -----------------------------------------------------------------
def json_serial(col: Column | str) -> Column:
    """datetime/date -> ISO-8601 string (reference json_serial).

    Reference: mmj/utilities/utils.py:60-64.
    """
    return F.date_format(_c(col), ISO_FMT)


# -- C6 -----------------------------------------------------------------
def set_name(first: Column | str, last: Column | str,
             login: Column | str) -> Column:
    """Both names NULL -> login; else '{first} {last}' with Python-str
    semantics: a single NULL stringifies to 'None' ('None Smith').

    Reference: mmj/entities/employees.py:116-124. Clone-exactly (the
    'None' literal artifact is deterministic and hash-checked in entity
    goldens).
    """
    f, l, lg = _c(first), _c(last), _c(login)
    return F.when(
        f.isNull() & l.isNull(), lg
    ).otherwise(
        F.concat_ws(" ", F.coalesce(f, F.lit("None")),
                    F.coalesce(l, F.lit("None")))
    )


# -- C7 -----------------------------------------------------------------
def deterministic_email(id_col: Column | str,
                        domain: str = "example.org") -> Column:
    """Deterministic stand-in for Faker safe_email() (nondeterministic in
    the reference; excluded from hash checks there, SURVEY §7.4).

    Reference: mmj/entities/employees.py:127-132.
    """
    return F.concat(
        F.substring(F.sha2(_c(id_col).cast("string"), 256), 1, 12),
        F.lit("@" + domain),
    )


# -- C8 -----------------------------------------------------------------
def member_type(license_type: Column | str) -> Column:
    """license_type == 1 -> 'MEDICAL' else 'RECREATIONAL'.

    Reference: mmj/entities/members.py:78-79.
    """
    return F.when(_c(license_type) == 1, "MEDICAL").otherwise("RECREATIONAL")


# -- C9 -----------------------------------------------------------------
def assign_role(access: Column | str) -> Column:
    """access 1|2 -> 'site-admin'; 3 -> 'store-manager'; else/missing ->
    'budtender'.

    Reference: mmj/entities/employees.py:155-177. The reference tests
    `user['id'] == 3` (a bug — compares the *user id*, not access); we
    implement the documented intent (access == 3), SURVEY §7.4
    clone-the-intent.
    """
    a = _c(access)
    return (F.when(a.isin(1, 2), "site-admin")
            .when(a == 3, "store-manager")
            .otherwise("budtender"))


# -- C10 ----------------------------------------------------------------
def employee_active_status(active: Column | str) -> Column:
    """dispensary_users.active == 1 -> 'ACTIVE'; missing (no row) ->
    'INACTIVE'; == 0 -> NULL (the reference falls through with no return).

    Reference: mmj/entities/employees.py:135-152. Clone-exactly: the
    0 -> None fallthrough is deterministic.
    """
    a = _c(active)
    return F.when(a == 1, "ACTIVE").when(a.isNull(), "INACTIVE")


# -- C11 ----------------------------------------------------------------
def menu_item_active(on_hold: Column | str) -> Column:
    """on_hold == 1 -> true else false (suspect inverted in the reference;
    cloned as-is per SURVEY §7.4).

    Reference: mmj/entities/menu_items.py:210-216.
    """
    return F.coalesce(_c(on_hold) == 1, F.lit(False))


# -- C12 ----------------------------------------------------------------
def map_uom(measurement: Column | str) -> Column:
    """category measurement 1 -> 2, else -> 1 (GRAM/EACH -> UNITS/GRAM
    enum flip).

    Reference: mmj/entities/menu_items.py:254-274.
    """
    return F.when(_c(measurement) == 1, F.lit(2)).otherwise(F.lit(1))


# -- C13 ----------------------------------------------------------------
_SINGULARIZE = {"Seeds": "Seed", "Drinks": "Drink", "Edibles": "Edible"}
# PLURAL_CATEGORIES / CAT_MAP cloned from menu_items.py:29-33 (values only).
_CAT_MAP = ("Indica", "Sativa", "Hybrid", "Edible", "Concentrate", "Drink",
            "Clone", "Seed", "Tinctures", "Gear", "Topicals", "Preroll",
            "Wax", "Hash")


def map_categories(name: Column | str, sativa: Column | str,
                   indica: Column | str) -> Column:
    """Category normalization chain — exact decision order of the
    reference (mmj/entities/menu_items.py:277-304):

    1. name.lower()=='cannabis': if BOTH sativa>0 AND indica>0 then
       sativa>80 -> 'Sativa', indica>80 -> 'Indica', neither -> fall
       through; if NOT both>0 -> 'Hybrid' (so sativa=90/indica=0 is
       'Hybrid', not 'Sativa' — cloned as-is).
    2. lower()=='paraphernalia' -> 'Gear'; 'tincture' -> 'Tinctures';
       'prerolled' -> 'Preroll'.
    3. name in PLURAL_CATEGORIES -> literal singularization (the
       reference uses pattern.text.en.singularize on exactly 3 known
       values — no NLP lib needed).
    4. name not in CAT_MAP -> 'Other' (this also catches the cannabis
       fall-through, since 'Cannabis' is not in CAT_MAP); else passthrough.

    NULL percentages compare like Py2 None (< everything): coalesced to
    false, so NULLs land in 'Hybrid' exactly as the reference does.
    """
    n, s, i = _c(name), _c(sativa), _c(indica)
    nl = F.lower(n)
    s_pos = F.coalesce(s > 0, F.lit(False))
    i_pos = F.coalesce(i > 0, F.lit(False))
    both = s_pos & i_pos
    sing = F.lit(None).cast("string")
    for k, v in _SINGULARIZE.items():
        sing = F.when(n == k, v).otherwise(sing)
    return (
        F.when((nl == "cannabis") & both & F.coalesce(s > 80, F.lit(False)),
               "Sativa")
        .when((nl == "cannabis") & both & F.coalesce(i > 80, F.lit(False)),
              "Indica")
        .when((nl == "cannabis") & ~both, "Hybrid")
        .when(nl == "paraphernalia", "Gear")
        .when(nl == "tincture", "Tinctures")
        .when(nl == "prerolled", "Preroll")
        .when(n.isin(*_SINGULARIZE), sing)
        .when(~n.isin(*_CAT_MAP), "Other")
        .otherwise(n)
    )


# -- C14 ----------------------------------------------------------------
DR_PREFIX_RE = r"(?i)^(Dr(?:.)?s|(?:Dr.?))"


def strip_dr_prefix(name: Column | str) -> Column:
    """Strip a leading Dr./Drs. prefix, then trim.

    Reference: mmj/entities/physicians.py:93-96 (same regex, IGNORECASE).
    """
    return F.trim(F.regexp_replace(_c(name), DR_PREFIX_RE, ""))


# -- C15 ----------------------------------------------------------------
def s3_image_url(bucket_env: str, entity: str, id_col: Column | str,
                 file_col: Column | str) -> Column:
    """Construct the blob-store image URL (format-string build).

    Reference: mmj/utilities/utils.py:71-73, mmj/entities/menu_items.py:118-128.
    """
    return F.format_string(
        f"https://images-{bucket_env}.example.com/{entity}/%s/%s",
        _c(id_col).cast("string"), _c(file_col))


# -- C16 ----------------------------------------------------------------
def dob_default(dob: Column | str) -> Column:
    """NULL dob -> epoch-0 datetime.

    Reference: mmj/entities/members.py:136-138.
    """
    return F.coalesce(_c(dob), F.lit("1970-01-01 00:00:00").cast("timestamp"))


# -- C17 ----------------------------------------------------------------
def employee_const_dob() -> Column:
    """Constant datetime(1970,1,1,2,30).

    Reference: mmj/entities/employees.py:76-78.
    """
    return F.lit("1970-01-01 02:30:00").cast("timestamp")


# -- C18 ----------------------------------------------------------------
def net_marijuana(uom: Column | str, medicine_amount: Column | str) -> Column:
    """uom == 2 -> int(medicine_amount) else NULL (reference `is` identity
    test on a small int == semantic ==2).

    Reference: mmj/entities/menu_items.py:142-144.
    """
    return F.when(_c(uom) == 2, _c(medicine_amount).cast("long"))


# -- C19 ----------------------------------------------------------------
def tax_percent(amount: Column | str) -> Column:
    """amount / 100 (true division).

    Reference: mmj/entities/settings.py:171-176.
    """
    return _c(amount).cast("double") / 100


# -- C20 ----------------------------------------------------------------
def monthly_purchase_limit(two_week: Column | str) -> Column:
    """int(two_week_purchase_limit * 2) — multiply FIRST, then truncate
    (int(2.6*2)=5, not int(2.6)*2=4).

    Reference: mmj/entities/settings.py:196-204.
    """
    return (_c(two_week) * 2).cast("long")


# -- C21 ----------------------------------------------------------------
def expiry_date_copy(card_expires_at: Column | str) -> Column:
    """Duplicate card_expires_at into expiryDate when non-NULL.

    Reference: mmj/entities/members.py:116-117.
    """
    c = _c(card_expires_at)
    return F.when(c.isNotNull(), c)


# -- C22/C23 ------------------------------------------------------------
def identification_type() -> Column:
    """Constant 'Drivers License' (mmj/entities/members.py:125)."""
    return F.lit("Drivers License")


def physician_specialty() -> Column:
    """Constant 'General' (mmj/entities/physicians.py:107)."""
    return F.lit("General")


# -- C24 ----------------------------------------------------------------
def vendor_account_status(confirmed: Column | str) -> Column:
    """confirmed == 1 -> 'ACTIVE' else 'INACTIVE'.

    Reference: mmj/entities/vendors.py:54-55.
    """
    return F.when(_c(confirmed) == 1, "ACTIVE").otherwise("INACTIVE")


# -- C25 ----------------------------------------------------------------
def organization_id_lit(organization_id) -> Column:
    """Stringified constant organizationId per run.

    Reference: mmj/etl_import.py:22 (correct form); the fieldmap-constant
    bug at mmj/entities/settings.py:77 is not cloned (SURVEY §7.4).
    """
    return F.lit(str(organization_id))


# -- C26 ----------------------------------------------------------------
def account_status_notes(locked_visits_reason: Column | str) -> Column:
    """accountStatusNotes <- locked_visits_reason (the reference maps it
    backwards and then deletes the output — we implement the intent,
    SURVEY §7.4).

    Reference: mmj/entities/members.py:89,152.
    """
    return _c(locked_visits_reason)
