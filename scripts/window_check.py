"""Driver-window bookkeeping check (ADVICE r5 #1).

The driver verifies only the FIRST 50 ``queries()`` entries, so the
registry ordering in ``__spark_entry__.py`` must guarantee that every
entry without a driver-artifact row sorts inside that window.  This
script recomputes ground truth from the CORRECTNESS_r*.json artifacts
and fails loudly when:

- ``_DRIVER_VERIFIED`` drifts from the artifact union (the r4 failure
  mode: a hand-maintained list was 22 entries wrong each way), or
- the unverified set (head carryover + new entries) exceeds 50, which
  would silently push entries past the window (the r5 failure mode:
  25 + 27 > 50 left two entries unchecked).

Run from the repo root: ``python scripts/window_check.py``.
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")


def _row_verified(v: dict) -> bool:
    """A driver row counts as VERIFIED only when it succeeded: hash-match
    for oracle entries, or a rows-only check that actually ran (err ==
    'no_oracle' with a row count).  A failed row (r4's q12/q18 shape:
    hash_match false) must NOT retire the entry — it has to rotate back
    into the window for re-verification after the fix."""
    if v.get("hash_match") is True:
        return True
    return v.get("err") == "no_oracle" and v.get("spark_rows") is not None


def main() -> int:
    import __spark_entry__ as e

    artifact_union: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        for key, row in json.load(open(path)).items():
            if _row_verified(row):
                artifact_union.add(key)

    declared = set(e._DRIVER_VERIFIED)
    keys = list(e.queries().keys())
    registry = set(keys)

    ok = True
    # 1. the declared verified set must be exactly artifacts ∩ registry
    #    (artifacts may mention since-renamed keys; registry is truth)
    truth = artifact_union & registry
    if declared & registry != truth:
        ok = False
        print("DRIFT: _DRIVER_VERIFIED != artifact union")
        print("  missing from declared:", sorted(truth - declared))
        print("  stale in declared:", sorted((declared & registry) - truth))

    # 2. every unverified entry must sit inside the 50-entry window
    unverified = [k for k in keys if k not in truth]
    window = set(keys[:50])
    overflow = [k for k in unverified if k not in window]
    if len(unverified) > 50 or overflow:
        ok = False
        print(f"OVERFLOW: {len(unverified)} unverified entries, window=50")
        print("  outside window:", overflow)

    # 3. head pins must exist and lead the registry
    for i, k in enumerate(e._WINDOW_HEAD):
        if keys[i] != k:
            ok = False
            print(f"HEAD: position {i} is {keys[i]!r}, expected {k!r}")

    print(
        f"registry={len(keys)} verified={len(truth)} "
        f"unverified={len(unverified)} window_ok={ok}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
