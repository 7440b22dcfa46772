"""Round-over-round bench comparison, calibration-normalized.

Every round's BASELINE.md note (and every verdict) recomputes the same
arithmetic by hand: sum the queries common to two bench artifacts,
read the drift through the calibration pin(s), and list the per-query
outliers that remain after normalization. This tool makes that
analysis reproducible:

    python tools/bench_compare.py OLD.json NEW.json

accepts committed BENCH_LOCAL.json artifacts (use `git show
rev:BENCH_LOCAL.json > /tmp/old.json` for a historical HEAD) and the
driver's BENCH_r{N}.json captures (which wrap the payload under
"parsed", or truncate to a "tail" string — handled by best effort).

Output: one human-readable block plus one JSON line with
  common_n / old_sum / new_sum / drift
  scan_pin_ratio / shuffle_pin_ratio  (when both sides carry the pin)
  residual        (drift minus the scan-pin drift — the part ambient
                   box movement does not explain)
  outliers        (queries whose ratio deviates from the scan-pin
                   ratio by more than OUTLIER_BAND, largest first —
                   the list worth reading against plan changes)
"""

from __future__ import annotations

import json
import sys

OUTLIER_BAND = 0.30  # ratio deviation from pin-implied drift
MIN_SECONDS = 0.5    # ignore sub-half-second queries (box noise)


def load(path: str) -> dict:
    raw = json.load(open(path))
    if "queries" in raw:
        return raw
    if isinstance(raw.get("parsed"), dict) and "queries" in raw["parsed"]:
        return raw["parsed"]
    # driver capture with a truncated tail: reconstruct what's parseable
    tail = raw.get("tail", "")
    start = tail.find("{")
    if start >= 0:
        try:
            return json.loads(tail[start:])
        except json.JSONDecodeError:
            pass
    raise SystemExit(f"{path}: no parseable bench payload")


def pin_median(art: dict, query: str) -> float | None:
    cal = art.get("calibration") or {}
    for pin in cal.get("pins", [cal] if cal else []):
        if pin.get("query") == query:
            return pin.get("median_sec")
    return None


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    osum = sum(oq[q] for q in common)
    nsum = sum(nq[q] for q in common)
    drift = nsum / osum - 1 if osum else 0.0

    out: dict = {
        "common_n": len(common),
        "old_sum_sec": round(osum, 2),
        "new_sum_sec": round(nsum, 2),
        "drift": round(drift, 4),
        "added": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
    }
    pin_drift = 0.0
    for key, query in [
        ("scan_pin", "tpch_q1_pricing_summary"),
        ("shuffle_pin", "dedup_minhash_lsh"),
    ]:
        # ADVICE r12: distinguish "pin absent" (None) from a recorded
        # 0.0 median — only the former should skip the ratio; a 0.0
        # old side still can't divide, so it reports as unusable.
        a, b = pin_median(old, query), pin_median(new, query)
        if a is not None and b is not None and a <= 0:
            out[f"{key}_ratio"] = None  # pin present but sub-resolution
        elif a is not None and b is not None:
            out[f"{key}_ratio"] = round(b / a, 4)
            if key == "scan_pin":
                pin_drift = b / a - 1
    out["residual"] = round(drift - pin_drift, 4)

    implied = 1 + pin_drift
    outliers = sorted(
        (
            {
                "query": q,
                "old_sec": oq[q],
                "new_sec": nq[q],
                "ratio": round(nq[q] / oq[q], 2),
            }
            for q in common
            # ADVICE r12: oq[q] > 0 guards the ratio — a sub-ms old
            # side recorded as 0.0 with a new side >= MIN_SECONDS
            # would raise ZeroDivisionError mid-scan
            if oq[q] > 0
            and max(oq[q], nq[q]) >= MIN_SECONDS
            and abs(nq[q] / oq[q] - implied) > OUTLIER_BAND
        ),
        key=lambda r: -abs(r["ratio"] - implied),
    )
    out["outliers"] = outliers

    print(
        f"# {len(common)} common queries: {osum:.1f}s -> {nsum:.1f}s "
        f"({drift:+.1%}); scan-pin {out.get('scan_pin_ratio', 'n/a')}, "
        f"shuffle-pin {out.get('shuffle_pin_ratio', 'n/a')}; "
        f"residual {out['residual']:+.1%}"
    )
    for r in outliers:
        print(
            f"#   outlier {r['query']}: {r['old_sec']:.2f} -> "
            f"{r['new_sec']:.2f}s ({r['ratio']}x)"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
