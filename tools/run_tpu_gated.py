"""Run every TPU-gated test on the real chip, sequentially, in one process.

The forced-CPU conftest only applies under pytest; importing the test
modules directly leaves the axon TPU backend active. One process means the
remote-compile cold start is paid once. Emits a JSON receipt with per-test
wall time and pass/fail, consumed by RESULTS.md's on-chip verification
table (VERDICT r2 item 9).

Usage: python tools/run_tpu_gated.py [--json-out docs/figures/tpu_gated_receipt.json]
"""

import argparse
import datetime
import json
import sys
import time
import traceback

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-out", default="docs/figures/tpu_gated_receipt.json")
    ap.add_argument("--only", default=None, help="substring filter on test names")
    args = ap.parse_args()

    import jax

    assert jax.default_backend() == "tpu", (
        "must run on the real chip; backend=" + jax.default_backend()
    )

    # Warm the remote compile service with a trivial jit so per-test times
    # reflect the tests, not service bring-up (see CLAUDE.md).
    t0 = time.time()
    import jax.numpy as jnp

    float(jax.jit(lambda x: x * 2)(jnp.ones(8)).sum())
    warm_s = time.time() - t0
    print(f"[warm] trivial jit: {warm_s:.1f}s", flush=True)

    import tests.test_pallas_engine as mod

    gated = [
        name
        for name in dir(mod)
        if name.startswith("test_")
        and any(
            m.name == "skipif" and "TPU" in str(m.args[1:]) + str(m.kwargs)
            for m in getattr(getattr(mod, name), "pytestmark", [])
        )
    ]
    gated.sort()
    if args.only:
        gated = [g for g in gated if args.only in g]
    print(f"[plan] {len(gated)} gated tests: {gated}", flush=True)

    results = []
    for name in gated:
        fn = getattr(mod, name)
        t0 = time.time()
        status, err = "pass", None
        try:
            fn()
        except Exception:
            status = "FAIL"
            err = traceback.format_exc(limit=12)
        dt = time.time() - t0
        stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        )
        print(f"[{status}] {name}  {dt:.1f}s  {stamp}", flush=True)
        if err:
            print(err, flush=True)
        results.append(
            {"test": name, "status": status, "seconds": round(dt, 1), "utc": stamp}
        )

    receipt = {
        "backend": "tpu",
        "warmup_seconds": round(warm_s, 1),
        "n_tests": len(results),
        "n_failed": sum(r["status"] != "pass" for r in results),
        "results": results,
    }
    with open(args.json_out, "w") as f:
        json.dump(receipt, f, indent=1)
    print(json.dumps({k: receipt[k] for k in ("n_tests", "n_failed")}), flush=True)
    sys.exit(1 if receipt["n_failed"] else 0)


if __name__ == "__main__":
    main()
