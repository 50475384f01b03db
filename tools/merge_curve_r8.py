"""Merge the per-(query, regime) clean-session outputs of
tools/run_vector_curve_r8.sh into bench/scale_curve_r8_vectors.json,
re-deriving the per-leg power-law exponents from the merged points."""

from __future__ import annotations

import glob
import json
import math
import os
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "bench/scale_curve_r8_vectors.json"
SRC = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vector_curve_r8"

merged: dict = {
    "protocol": "one fresh JVM per (query, regime), 1 warmup + 3 reps, "
    "median+mad (tools/run_vector_curve_r8.sh)",
    "regimes": {},
}
for path in sorted(glob.glob(f"{SRC}/*.json")):
    name = os.path.basename(path)[: -len(".json")]
    regime = name.split("_", 1)[0]  # clustered / uniform / occupancy
    doc = json.load(open(path))
    if name.startswith("occupancy_"):
        regime = name[len("occupancy_") :]
        reg = merged["regimes"].setdefault(regime, {"points": {}})
        for sf, point in doc["points"].items():
            reg["points"].setdefault(sf, {"rows": point["rows"], "queries": {}})
            if "occupancy" in point:
                reg["points"][sf]["occupancy"] = point["occupancy"]
        continue
    reg = merged["regimes"].setdefault(regime, {"points": {}})
    for sf, point in doc["points"].items():
        dst = reg["points"].setdefault(
            sf, {"rows": point["rows"], "queries": {}}
        )
        dst["queries"].update(point["queries"])

for regime, reg in merged["regimes"].items():
    sfs = sorted(reg["points"], key=float)
    alphas: dict = {}
    for lo, hi in zip(sfs, sfs[1:]):
        plo, phi = reg["points"][lo], reg["points"][hi]
        ratio = phi["rows"]["embeddings"] / plo["rows"]["embeddings"]
        for q in plo["queries"]:
            if q in phi["queries"]:
                a = math.log(
                    phi["queries"][q]["sec"] / plo["queries"][q]["sec"]
                ) / math.log(ratio)
                alphas.setdefault(q, {})[f"sf{lo}->sf{hi}"] = round(a, 2)
    reg["alphas"] = alphas

json.dump(merged, open(OUT, "w"), indent=1)
print(f"wrote {OUT}")
for regime, reg in merged["regimes"].items():
    print(regime, json.dumps(reg.get("alphas", {}), indent=1))
