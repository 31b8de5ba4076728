#!/bin/bash
# Round-5 post-receipts TPU batch: merge -> guard -> equalize -> winners,
# then the remaining round-5 receipts (MFU ablation, bf16x2 sweep, heads,
# claim M-audit, two-stage A/B), the fresh gated receipt, and bench.
cd /root/repo
set -x
python - <<'PY'
import json
rows = []
for p in (1, 2, 3):
    with open(f"docs/figures/ess_receipts_part{p}.json") as f:
        rows += json.load(f)
with open("docs/figures/ess_receipts.json", "w") as f:
    json.dump(rows, f, indent=1)
print("merged", len(rows))
PY
timeout 5400 python tools/receipts_regression_guard.py --old 01817fa
echo "GUARD rc=$?"
timeout 5400 python tools/receipts_equalize_windows.py
echo "EQUALIZE rc=$?"
python tools/receipts_winners.py
echo "WINNERS rc=$?"
timeout 3600 python bench_mfu.py
echo "MFU rc=$?"
timeout 3600 python tools/bench_mm_precision.py
echo "MMPREC rc=$?"
timeout 3600 python tools/bench_heads.py
echo "HEADS rc=$?"
timeout 5400 python tools/claim_m_audit.py
echo "CLAIM rc=$?"
timeout 3600 python tools/bench_two_stage.py
echo "TWOSTAGE rc=$?"
timeout 5400 python tools/run_tpu_gated.py
echo "GATED rc=$?"
timeout 1800 python bench.py
echo "BENCH rc=$?"
