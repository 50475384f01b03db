#!/usr/bin/env bash
# Round-9 MIPS-tier scale battery: the exact broadcast-BNLJ tier and
# the norm-augmented LSH tier, sf10/20/40 (200k-800k vectors), ONE
# fresh JVM per (query, regime) — the round-7/8 vector-tier protocol
# (clean sessions caught defects that warm-session curves hid).
#
#   - uniform: the additions' default regime (matches §8c's low end)
#   - clustered (dominant Gaussian blob + Zipf tail): the adversarial
#     regime for sign-LSH — a dominant direction collapses sign
#     buckets, the worst case for the augmented bucket join
#
# Results land in /tmp/mips_curve_r9/*.json; merged into
# bench/scale_curve_r9_mips.json by the inline python at the end.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/mips_curve_r9
mkdir -p "$OUT"
SFS="10.0,20.0,40.0"

for mode in uniform clustered; do
  for q in mips_topk mips_topk_lsh; do
    echo "== $mode $q =="
    python tools/scale_bench.py --sfs "$SFS" --base /tmp/scalefix_r6 \
      --emb-mode "$mode" --tables embeddings --skip-candidates \
      --targets "$q" > "$OUT/${mode}_${q}.json"
  done
done

python - <<'EOF'
import json, glob, os
merged = {"protocol": "one fresh JVM per (query, regime); sf10/20/40; "
          "1 warmup + 3 reps median; fixtures /tmp/scalefix_r6",
          "regimes": {}}
for f in sorted(glob.glob("/tmp/mips_curve_r9/*.json")):
    tag = os.path.basename(f)[:-5]
    merged["regimes"][tag] = json.load(open(f))
json.dump(merged, open("bench/scale_curve_r9_mips.json", "w"), indent=1)
print("wrote bench/scale_curve_r9_mips.json")
EOF
echo "MIPS CURVE DONE"
