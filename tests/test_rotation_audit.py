"""VERDICT_r9 ask #5: the committed driver window must equal the
rotation audit's mechanical proposal, so the hand-written tuple in
plans/__init__.py can never drift from the CORRECTNESS artifacts."""

from __future__ import annotations

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_audit_module():
    path = os.path.join(ROOT, "scripts", "rotation_audit.py")
    spec = importlib.util.spec_from_file_location("rotation_audit", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_window_matches_rotation_audit():
    from g1_etl_spark import plans

    audit = _load_audit_module()
    rounds = audit.load_rounds(ROOT)
    assert rounds, "no CORRECTNESS_r*.json artifacts found"
    names = list(plans.NATURAL_ORDER)
    oracle_names = {n for n, s in plans.REGISTRY.items() if s.oracle}
    amap = audit.audit(names, oracle_names, rounds)
    proposal = audit.propose_window(amap, names, 50)
    assert list(plans._R10_WINDOW) == proposal, (
        "committed _R10_WINDOW drifted from rotation_audit proposal; "
        "re-run `python scripts/rotation_audit.py --window 50`"
    )


def test_registry_leads_with_window():
    from g1_etl_spark import plans

    head = list(plans.REGISTRY)[:50]
    assert head == list(plans._R10_WINDOW)


def test_audit_green_semantics():
    audit = _load_audit_module()
    # hash-green oracle row
    assert audit.row_is_green(
        {"hash_match": True, "rows_match": True}, has_oracle=True)
    # red oracle row is NOT green
    assert not audit.row_is_green(
        {"hash_match": False, "rows_match": True}, has_oracle=True)
    # rows-only row for a query registered without an oracle IS green
    assert audit.row_is_green(
        {"hash_match": None, "err": "no_oracle"}, has_oracle=False)
    # but a no_oracle row for a query that HAS an oracle (driver mishap)
    # is not treated as green
    assert not audit.row_is_green(
        {"hash_match": None, "err": "no_oracle"}, has_oracle=True)
