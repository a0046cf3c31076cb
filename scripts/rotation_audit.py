#!/usr/bin/env python3
"""Rotation bookkeeping for the driver's 50-row CORRECTNESS sample.

VERDICT_r9 ask #5: the hand-enumerated window comments in
``plans/__init__.py`` are the most error-prone artifact in the loop.
This script derives the same facts mechanically:

* reads every ``CORRECTNESS_r*.json`` at the repo root,
* reads the live REGISTRY (registration order = driver sample order),
* emits, per registered query, the latest round with a green row
  (``hash_match`` true, or a ``no_oracle`` rows-only row for queries
  registered without an oracle — those are green-by-design),
* ranks the next-window candidates: never-sampled first (newest
  registrations lead), then stalest-green ascending by round.

Usage:
    python scripts/rotation_audit.py            # human summary
    python scripts/rotation_audit.py --json     # machine form
    python scripts/rotation_audit.py --window 50  # emit a window tuple

The test ``tests/test_rotation_audit.py`` asserts the committed
``_R10_WINDOW`` equals this script's 50-row proposal, so the window
and the audit can never drift apart.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds(root: str = ROOT,
                max_round: int | None = None) -> dict[int, dict]:
    """round number -> {query: row} for every CORRECTNESS artifact.

    ``max_round`` pins the artifact set: rounds greater than it are
    ignored. The sync test passes the window's own round minus one so a
    freshly-landed CORRECTNESS artifact (which post-dates the committed
    window by construction) can't redden the suite (ADVICE r10 #3)."""
    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        with open(path) as f:
            rounds[rnd] = json.load(f)
    return rounds


def row_is_green(row: dict, has_oracle: bool) -> bool:
    """A row counts as green if it hash-matched, or — for queries that
    deliberately register no oracle (nondeterministic-by-design ops whose
    contract twin carries the proof) — if the driver ran it rows-only."""
    if not isinstance(row, dict):
        return False
    if row.get("hash_match"):
        return True
    if not has_oracle and row.get("err") == "no_oracle":
        return True
    return False


def audit(registry_names: list[str], oracle_names: set[str],
          rounds: dict[int, dict]) -> dict:
    """Return {query: {latest_green, latest_sampled, sampled_rounds}}."""
    out: dict[str, dict] = {}
    for name in registry_names:
        has_oracle = name in oracle_names
        sampled, latest_green = [], None
        for rnd in sorted(rounds):
            row = rounds[rnd].get(name)
            if row is None:
                continue
            sampled.append(rnd)
            if row_is_green(row, has_oracle):
                latest_green = rnd
        out[name] = {
            "latest_green": latest_green,
            "latest_sampled": sampled[-1] if sampled else None,
            "sampled_rounds": sampled,
            "has_oracle": has_oracle,
        }
    return out


def propose_window(audit_map: dict, registry_names: list[str],
                   size: int = 50) -> list[str]:
    """Next driver window: never-sampled queries first (newest
    registration cohorts lead — a never-checked row outranks any banked
    green), then stalest latest-green ascending, ties broken by
    registration order."""
    order = {n: i for i, n in enumerate(registry_names)}
    never = [n for n in registry_names if audit_map[n]["latest_sampled"] is None]
    # Newest additions first: later registration order = newer cohort.
    never.sort(key=lambda n: -order[n])
    banked = [n for n in registry_names if audit_map[n]["latest_sampled"] is not None]
    banked.sort(key=lambda n: (audit_map[n]["latest_green"] or 0, order[n]))
    return (never + banked)[:size]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--window", type=int, default=0,
                    help="emit the next N-row window proposal")
    ap.add_argument("--rewrite", action="store_true",
                    help="rewrite the _R%%_WINDOW tuple body in "
                         "plans/__init__.py in place (use after "
                         "registering new queries mid-round)")
    args = ap.parse_args()

    sys.path.insert(0, ROOT)
    from g1_etl_spark.plans import NATURAL_ORDER, REGISTRY  # noqa: E402

    names = list(NATURAL_ORDER)
    oracle_names = {n for n, s in REGISTRY.items() if s.oracle}
    rounds = load_rounds()
    audit_map = audit(names, oracle_names, rounds)

    if args.window:
        win = propose_window(audit_map, names, args.window)
        if args.rewrite:
            path = os.path.join(ROOT, "g1_etl_spark", "plans",
                                "__init__.py")
            with open(path) as f:
                src = f.read()
            body_lines, line = [], "   "
            for n in win:
                q = f'"{n}",'
                if len(line) + len(q) + 1 > 78:
                    body_lines.append(line)
                    line = "   "
                line += " " + q
            body_lines.append(line)
            body = "\n".join(body_lines)
            m = re.search(r"(_R\d+_WINDOW = \(\n).*?(\n\))", src,
                          re.S)
            assert m, "window tuple not found in plans/__init__.py"
            src = src[:m.end(1)] + body + src[m.start(2):]
            # Round-stamp the variable: the window generated from
            # artifacts r1..rN serves round N+1, and the sync test uses
            # the stamp to pin its artifact set (ADVICE r10 #3).
            next_round = max(rounds) + 1 if rounds else 1
            src = re.sub(r"_R\d+_WINDOW", f"_R{next_round}_WINDOW", src)
            with open(path, "w") as f:
                f.write(src)
            print(f"rewrote {path} with the {len(win)}-row proposal "
                  f"as _R{next_round}_WINDOW")
            return 0
        if args.json:
            print(json.dumps(win, indent=1))
        else:
            for n in win:
                a = audit_map[n]
                tag = "NEVER" if a["latest_sampled"] is None else f"r{a['latest_green']}"
                print(f"{n:45s} {tag}")
        return 0

    if args.json:
        print(json.dumps(audit_map, indent=1))
        return 0

    never = [n for n in names if audit_map[n]["latest_sampled"] is None]
    print(f"registered: {len(names)}  (oracle-backed: {len(oracle_names)})")
    print(f"never driver-sampled: {len(never)}")
    by_round: dict[int, int] = {}
    for n in names:
        g = audit_map[n]["latest_green"]
        if g is not None:
            by_round[g] = by_round.get(g, 0) + 1
    for rnd in sorted(by_round):
        print(f"  latest-green r{rnd}: {by_round[rnd]} queries")
    red = [n for n in names
           if audit_map[n]["latest_sampled"] is not None
           and audit_map[n]["latest_green"] is None]
    print(f"sampled-but-never-green: {red or 'none'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
