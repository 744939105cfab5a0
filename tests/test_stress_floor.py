"""Pin the measured SRP recall floor at stress scale (VERDICT r6 #3).

``n_planes_for`` holds occupancy, and ``probe_k_for`` holds recall —
this test makes the second claim a standing assertion: every committed
STRESS_x*.json artifact that carries an ``srp_recall`` measurement must
show recall ≥ 0.8 at every recorded scale.  Regenerating an artifact
with a recall regression (e.g. a probe-law or plane-law retune) turns
the suite red until the law is fixed or the floor consciously revised.

r7 measured (post cost-retune, see probe_k_for): 0.979 at 1× (4
planes, k=0), 0.985 at 10× (7 planes, k=2), 0.886 at 30× (9 planes,
k=4) — vs 0.691 at 10× before the margin-directed probes landed.
"""

from __future__ import annotations

import glob
import json
import os

RECALL_FLOOR = 0.8
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_stress_artifacts_hold_recall_floor():
    checked = []
    for path in sorted(glob.glob(os.path.join(REPO, "STRESS_x*.json"))):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        for section in ("srp_recall", "knn_recall"):
            rec = data.get("results", {}).get(section)
            if not isinstance(rec, dict):
                continue
            for scale, row in rec.items():
                recall = row.get("recall")
                assert recall is not None, f"{path}:{section}:{scale} missing recall"
                assert recall >= RECALL_FLOOR, (
                    f"{os.path.basename(path)} {section}[{scale}] = {recall:.3f}"
                    f" < {RECALL_FLOOR} (planes={row.get('planes')})"
                )
                checked.append(
                    (os.path.basename(path), section, scale, round(recall, 3))
                )
    # at least the r7 artifacts must be present and measured
    assert len(checked) >= 2, f"no srp_recall/knn_recall rows found in STRESS_x*.json: {checked}"
