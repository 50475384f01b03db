"""MAD-gated bench comparison (round-9 VERDICT item 9).

The driver-host full-surface total swings ±15% round to round
(mad_total 3.9-5.2 in r8/r9) and r9's +9% common-query drift cost real
adjudication effort because raw medians were compared. This tool is
the committed protocol: compare two bench_out*.json records query by
query, gating each delta on the RUNS' measured dispersion —

    regression(q)  iff  new_median - old_median > 2 * (new_MAD + old_MAD)
                   AND  new_median > ratio_floor * old_median

i.e. a move must clear BOTH the noise band implied by the medians'
own MADs and a minimum ratio (default 1.5x) before it is flagged.
Queries absent from either side are listed, not compared.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [min_ratio]

Exit 0 always (it is an adjudication report, not a CI gate); prints
one JSON line: {regressions: [...], improvements: [...], drift: ...}.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """First JSON line with a 'queries' dict AND per-query MAD."""
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if "queries" in d:
                return d
    raise SystemExit(f"{path}: no bench record found")


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    min_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, new = load(old_path), load(new_path)
    old_q, new_q = old["queries"], new["queries"]
    old_mad = old.get("query_mad", {})
    new_mad = new.get("query_mad", {})

    # Parquet layout comparison (round-10 VERDICT item 2): when the
    # fixture layout moved between the two records, every flag is
    # tagged layout-change — the first hypothesis to check is the
    # physical scan shape, not a code regression (the r9/r10
    # single-row-group regenerations both cost a round of adjudication
    # before this was the default suspicion).
    old_lay, new_lay = old.get("layout"), new.get("layout")
    if old_lay is None or new_lay is None:
        layout_state = "unknown"  # pre-r11 records carry no layout
        layout_changed_tables = []
    else:
        # Compare only the fingerprint dimensions BOTH records carry:
        # records straddling a fingerprint-schema change (e.g. the
        # r11 addition of per-table `bytes`) must not read as a
        # fixture change when every shared dimension is equal.
        def _tbl_changed(t: str) -> bool:
            a, b = old_lay.get(t), new_lay.get(t)
            if a is None or b is None:
                return True  # table appeared/disappeared
            shared = set(a) & set(b)
            if not shared:
                # disjoint fingerprint schemas (e.g. an {"error": ...}
                # entry vs full stats): the table state is not
                # comparable — treat as changed, never as "same"
                return True
            return any(a[k] != b[k] for k in shared)

        layout_changed_tables = sorted(
            t for t in set(old_lay) | set(new_lay) if _tbl_changed(t)
        )
        layout_state = "changed" if layout_changed_tables else "same"
    tag = {"tag": "layout-change"} if layout_state == "changed" else {}

    common = sorted(set(old_q) & set(new_q))
    regressions, improvements = [], []
    for q in common:
        o, n = old_q[q], new_q[q]
        band = 2 * (old_mad.get(q, 0.0) + new_mad.get(q, 0.0))
        if n - o > band and n > min_ratio * o:
            regressions.append(
                {"query": q, "old": o, "new": n, "noise_band": round(band, 3), **tag}
            )
        elif o - n > band and o > min_ratio * n:
            improvements.append(
                {"query": q, "old": o, "new": n, "noise_band": round(band, 3), **tag}
            )
    sum_old = sum(old_q[q] for q in common)
    sum_new = sum(new_q[q] for q in common)
    print(
        json.dumps(
            {
                "n_common": len(common),
                "sum_old": round(sum_old, 1),
                "sum_new": round(sum_new, 1),
                "drift_pct": round(100 * (sum_new - sum_old) / sum_old, 1)
                if sum_old
                else None,
                "mad_total_old": old.get("mad_total"),
                "mad_total_new": new.get("mad_total"),
                "layout": layout_state,
                "layout_changed_tables": layout_changed_tables,
                "regressions": regressions,
                "improvements": improvements,
                "only_old": sorted(set(old_q) - set(new_q)),
                "only_new": sorted(set(new_q) - set(old_q)),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
