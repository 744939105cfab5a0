"""Driver-window bookkeeping check (ADVICE r5 #1, VERDICT r6 #1/#2).

The driver verifies only the FIRST 50 ``queries()`` entries, so the
registry ordering in ``__spark_entry__.py`` must guarantee that every
entry without a successful driver-artifact row sorts inside that
window, and — now that cumulative coverage is 100% — that the
remaining window slots re-certify the STALEST verified entries.

Since r7 the verified set is computed at runtime from the
CORRECTNESS_r*.json artifacts (a hand-maintained list drifted in r4,
r5, and r6), so the r4/r6 drift class cannot recur; this script pins
the ordering invariants independently of how ``queries()`` builds them:

1. every unverified entry sits inside the 50-entry window, and the
   unverified block leads the registry;
2. staleness monotonicity — no verified entry outside the window has
   an older last-verified round than one inside it.

Run from the repo root: ``python scripts/window_check.py``.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

WINDOW = 50


def main() -> int:
    import __spark_entry__ as e

    rounds = e.driver_verified_rounds()
    keys = list(e.queries().keys())

    ok = True
    unverified = [k for k in keys if k not in rounds]
    window = keys[:WINDOW]
    window_set = set(window)

    # 1. every unverified entry inside the window, and leading it
    overflow = [k for k in unverified if k not in window_set]
    if len(unverified) > WINDOW or overflow:
        ok = False
        print(f"OVERFLOW: {len(unverified)} unverified entries, window={WINDOW}")
        print("  outside window:", overflow)
    head = keys[: len(unverified)]
    if set(head) != set(unverified):
        ok = False
        print("HEAD: unverified entries do not lead the registry")
        print("  expected head:", sorted(unverified))
        print("  actual head:", head)

    # 2. staleness monotonicity across the window boundary
    inside = [rounds[k] for k in window if k in rounds]
    outside = [rounds[k] for k in keys[WINDOW:] if k in rounds]
    if inside and outside and max(inside) > min(outside):
        ok = False
        print(
            f"STALENESS: window holds an entry last verified r{max(inside):02d} "
            f"while r{min(outside):02d} entries sit outside it"
        )

    stalest = min(inside) if inside else None
    print(
        f"registry={len(keys)} verified={len(rounds) and len([k for k in keys if k in rounds])} "
        f"unverified={len(unverified)} window_stalest=r{stalest} window_ok={ok}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
