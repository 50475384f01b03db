#!/usr/bin/env bash
# Round-8 vector-tier scale battery (VERDICT r7 items 2 & 4), clean
# sessions: ONE fresh JVM per (query, regime) invocation of
# tools/scale_bench.py --skip-candidates, exactly the round-7 protocol
# that caught the broadcast-temporary and per-pair-fold defects.
#
#   - clustered sf10/20/40: the flat capped family (the §6b-final
#     settle was uniform-only — "measured, not argued") AND the new
#     hierarchical family on the same adversarial fixture
#   - uniform sf10/20/40: the hierarchical family + residual IVFADC
#     through the former 4096-centroid cap point
#   - occupancy counts per scale point per regime (--targets none)
#
# Results land in /tmp/vector_curve_r8/*.json; tools/merge_curve_r8.py
# merges them into bench/scale_curve_r8_vectors.json.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/vector_curve_r8
mkdir -p "$OUT"

FLAT="semdedup_scaled,similarity_topk_ivf,ivf_pq_topk"
HIER="semdedup_hier,similarity_topk_ivf_hier,ivf_pq_topk_hier"
RES="ivf_pq_topk_residual"
SFS="10.0,20.0,40.0"

for q in ${FLAT//,/ } ${HIER//,/ } $RES; do
  echo "== clustered $q =="
  python tools/scale_bench.py --sfs "$SFS" --base /tmp/scalefix_r6 \
    --emb-mode clustered --tables embeddings --skip-candidates \
    --targets "$q" > "$OUT/clustered_$q.json"
done
for q in ${HIER//,/ } $RES; do
  echo "== uniform $q =="
  python tools/scale_bench.py --sfs "$SFS" --base /tmp/scalefix_r6 \
    --emb-mode uniform --tables embeddings --skip-candidates \
    --targets "$q" > "$OUT/uniform_$q.json"
done
echo "== occupancy (clustered) =="
python tools/scale_bench.py --sfs "$SFS" --base /tmp/scalefix_r6 \
  --emb-mode clustered --tables embeddings --skip-candidates \
  --vector-occupancy --targets none > "$OUT/occupancy_clustered.json"
echo "== occupancy (uniform) =="
python tools/scale_bench.py --sfs "$SFS" --base /tmp/scalefix_r6 \
  --emb-mode uniform --tables embeddings --skip-candidates \
  --vector-occupancy --targets none > "$OUT/occupancy_uniform.json"
echo "VECTOR CURVE DONE"
