"""Mechanical driver-window rotation planner.

The registry outgrew casual slot arithmetic at round 12 (a 50-slot
window over 200 queries cycles with zero organic slack, and every new
op pushes a deferral to someone's hard staleness bound), so the plan
COVERAGE.md used to compute by hand in each round's close-out is now a
tool: read the CORRECTNESS_r*.json history the driver writes, assume
the current `_WINDOW_PRIORITY` lands this round, and emit the
next-round window under the same policy every prior rotation used:

  1. HARD COHORT first — every query whose newest (effective) driver
     row would trip STALENESS_BOUND_ROUNDS when the round after next
     lands. If the cohort alone exceeds the window, the contract is
     already unsatisfiable and the tool fails loudly.
  2. Remaining slots fill by ascending effective last-seen round,
     tie-broken by registry order — the oldest rows buy their slots
     back first (exactly how rounds 8-11 chose fillers).
  3. Queued promotions (ORACLE_R<next> dicts whose names are not yet
     registry queries) are REPORTED with a reminder that each takes a
     slot the round it lands; placing them means displacing tail
     fillers deliberately (the deferral arithmetic in COVERAGE.md).

Usage:
    python tools/rotation_plan.py            # plan the next round
    python tools/rotation_plan.py 13         # plan a specific round

Prints the slot list (rows-only names flagged — they must match
tests/test_registry.py's ROWS_ONLY_WINDOW_SLOTS when applied) plus a
staleness audit of the whole registry under the proposed plan.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WINDOW = 50
BOUND = 5  # tests/test_registry.py STALENESS_BOUND_ROUNDS


def last_seen_history(root: str) -> tuple[dict[str, int], int]:
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    seen: dict[str, int] = {}
    latest = 0
    for f in files:
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        latest = max(latest, rnd)
        for name in json.load(open(f)):
            seen[name] = max(seen.get(name, 0), rnd)
    return seen, latest


def queued_promotions(next_round: int) -> list[str]:
    """Names in any operator module's ORACLE_R<next_round> dict that
    are not registry queries yet — the promotions that will want slots."""
    import importlib

    from edu_online_spark import registry

    registered = set(registry.queries())
    out: list[str] = []
    for mod_name in registry._EXTENSION_NAMES:
        try:
            m = importlib.import_module(
                f"edu_online_spark.operators.{mod_name}"
            )
        except ImportError:
            continue
        for name in getattr(m, f"ORACLE_R{next_round}", {}):
            if name not in registered:
                out.append(name)
    return out


def plan(next_round: int | None = None, root: str | None = None) -> dict:
    from edu_online_spark import registry

    root = root or os.path.join(os.path.dirname(__file__), "..")
    seen, latest = last_seen_history(root)
    if next_round is None:
        next_round = latest + 2  # current round lands as latest+1
    landing = next_round - 1  # the round whose window is now in-tree

    names = list(registry.queries())
    oracles = set(registry.oracle_sql())
    order = {n: i for i, n in enumerate(names)}
    effective = dict(seen)
    for n in names[:WINDOW]:  # assume the in-tree window lands
        effective[n] = max(effective.get(n, 0), landing)
    missing = [n for n in names if n not in effective]
    if missing:
        raise SystemExit(
            f"queries with no driver row and no window slot (staleness at "
            f"birth): {missing}"
        )

    # hard cohort: stale when CORRECTNESS_{next_round+1} would land
    # ((next_round + 1 + 1) - last_seen > BOUND unless re-certified now)
    hard = sorted(
        (n for n in names if (next_round + 2) - effective[n] > BOUND),
        key=lambda n: (effective[n], order[n]),
    )
    if len(hard) > WINDOW:
        raise SystemExit(
            f"UNSATISFIABLE: {len(hard)} queries hit the hard bound at "
            f"round {next_round} but the window holds {WINDOW}"
        )
    fillers = sorted(
        (n for n in names if n not in set(hard)),
        key=lambda n: (effective[n], order[n]),
    )[: WINDOW - len(hard)]
    window = hard + fillers
    rows_only = [n for n in window if n not in oracles]

    # audit: with this window, does the whole registry stay in bound
    # through the round AFTER next_round?
    post = dict(effective)
    for n in window:
        post[n] = next_round
    worst = min(post.values())
    audit_ok = (next_round + 2) - worst <= BOUND
    return {
        "next_round": next_round,
        "hard_cohort": hard,
        "fillers": fillers,
        "window": window,
        "rows_only_slots": rows_only,
        "free_slots": WINDOW - len(hard),
        "queued_promotions": queued_promotions(next_round),
        "audit_ok": audit_ok,
    }


def main() -> None:
    next_round = int(sys.argv[1]) if len(sys.argv) > 1 else None
    p = plan(next_round)
    print(
        f"# round-{p['next_round']} window: {len(p['hard_cohort'])} "
        f"hard-cohort + {len(p['fillers'])} fillers "
        f"({p['free_slots']} slots were free before filling)"
    )
    for n in p["window"]:
        flag = "  # rows-only" if n in p["rows_only_slots"] else ""
        print(f'    "{n}",{flag}')
    if p["queued_promotions"]:
        print(
            f"# queued ORACLE_R{p['next_round']} promotions needing slots "
            f"(displace tail fillers deliberately): "
            + ", ".join(p["queued_promotions"])
        )
    print(f"# staleness audit through round {p['next_round'] + 1}: "
          + ("OK" if p["audit_ok"] else "FAIL"))


if __name__ == "__main__":
    main()
