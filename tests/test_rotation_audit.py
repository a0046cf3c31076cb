"""VERDICT_r9 ask #5: the committed driver window must equal the
rotation audit's mechanical proposal, so the hand-written tuple in
plans/__init__.py can never drift from the CORRECTNESS artifacts."""

from __future__ import annotations

import importlib.util
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _window():
    """(round N, tuple) from the plans module's ``_R{N}_WINDOW`` attr.

    The round stamp pins which CORRECTNESS artifacts the window was
    generated from (r1..rN-1), so a freshly-landed CORRECTNESS_r{N}.json
    can't redden this suite (ADVICE r10 #3)."""
    from g1_etl_spark import plans

    names = [a for a in vars(plans) if re.fullmatch(r"_R\d+_WINDOW", a)]
    assert len(names) == 1, names
    return int(re.search(r"\d+", names[0]).group()), getattr(plans, names[0])


def _load_audit_module():
    path = os.path.join(ROOT, "scripts", "rotation_audit.py")
    spec = importlib.util.spec_from_file_location("rotation_audit", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_window_matches_rotation_audit():
    from g1_etl_spark import plans

    audit = _load_audit_module()
    window_round, window = _window()
    rounds = audit.load_rounds(ROOT, max_round=window_round - 1)
    assert rounds, "no CORRECTNESS_r*.json artifacts found"
    names = list(plans.NATURAL_ORDER)
    oracle_names = {n for n, s in plans.REGISTRY.items() if s.oracle}
    amap = audit.audit(names, oracle_names, rounds)
    proposal = audit.propose_window(amap, names, 50)
    assert list(window) == proposal, (
        "committed window drifted from rotation_audit proposal; "
        "re-run `python scripts/rotation_audit.py --window 50 --rewrite`"
    )


def test_registry_leads_with_window():
    from g1_etl_spark import plans

    head = list(plans.REGISTRY)[:50]
    assert head == list(_window()[1])


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
