#!/bin/bash
# Round-5 post-receipts TPU batch, in integrity-first priority order:
# merge -> regression guard -> window equalization -> winner calls, then
# the uniquely-covering receipts (heads, claim M-audit), the fresh gated
# receipt, the two-stage companion A/B, and bench.
cd /root/repo
set -x
python - <<'PY'
import json
rows = []
for p in ("1", "2", "3a", "3b", "3c"):
    with open(f"docs/figures/ess_receipts_part{p}.json") as f:
        rows += json.load(f)
with open("docs/figures/ess_receipts.json", "w") as f:
    json.dump(rows, f, indent=1)
print("merged", len(rows))
PY
timeout 3600 python tools/receipts_regression_guard.py --old 01817fa
echo "GUARD rc=$?"
timeout 3600 python tools/receipts_equalize_windows.py
echo "EQUALIZE rc=$?"
python tools/receipts_winners.py
echo "WINNERS rc=$?"
timeout 2400 python tools/bench_heads.py
echo "HEADS rc=$?"
timeout 3600 python tools/claim_m_audit.py
echo "CLAIM rc=$?"
timeout 3600 python tools/run_tpu_gated.py
echo "GATED rc=$?"
timeout 2400 python tools/bench_two_stage.py --configs rough_well,rough_well_a3 --repeats 3
echo "TWOSTAGE rc=$?"
timeout 1800 python bench.py
echo "BENCH rc=$?"
