#!/usr/bin/env python
"""Run every fused-kernel hardware validation and commit the results as one
machine-readable artifact: docs/fused_kernel_validation.json (VERDICT r5
item 2 — the +26 %/+25 % headline kernels' correctness claims must resolve
to committed data, not PERF.md prose).

Runs on the real chip (axon backend). Each validate_* script's ``main()``
returns a record; this wrapper adds device/provenance metadata and writes
the aggregate. Partial results are written even if a later kernel's
validation dies (the artifact says which).

Usage: python scripts/validate_kernels_json.py [--only fused_layer ...]
"""

import argparse
import datetime
import json
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import transformergrooveinfilling_tpu  # noqa: F401,E402
import jax  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--only", nargs="*", default=None,
                   help="subset of {fused_layer, fused_ffn, fused_ln}")
    p.add_argument("--out", default=os.path.join(
        REPO, "docs", "fused_kernel_validation.json"))
    args = p.parse_args(argv)

    assert jax.default_backend() == "tpu", "hardware validation needs a chip"
    dev = jax.devices()[0]
    out = {
        "recorded": datetime.datetime.now().strftime("%Y-%m-%d %H:%M UTC"),
        "device_kind": dev.device_kind,
        "platform": jax.default_backend(),
        "scripts": ["validate_fused_layer.py", "validate_fused_ffn.py",
                    "validate_fused_ln.py"],
        "kernels": {},
    }
    # --only re-runs must not drop the other kernels' records: seed from the
    # existing artifact and overwrite only what re-runs
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            out["kernels"] = prev.get("kernels", {})
            out["previous_recorded"] = prev.get("recorded")
        except (OSError, ValueError):
            pass

    import validate_fused_ffn
    import validate_fused_layer
    import validate_fused_ln

    runners = {
        "fused_layer": validate_fused_layer.main,
        "fused_ffn": validate_fused_ffn.main,
        "fused_ln": validate_fused_ln.main,
    }
    failed = False
    for name, fn in runners.items():
        if args.only and name not in args.only:
            continue
        print(f"\n=== {name} ===", flush=True)
        try:
            out["kernels"][name] = fn()
        except Exception as e:  # record the failure, keep going
            failed = True
            out["kernels"][name] = {
                "error": f"{type(e).__name__}: {e}",
                "traceback": traceback.format_exc(limit=4)}
            print(f"{name} FAILED: {e}", flush=True)
        # flush after every kernel so a mid-run tunnel death still leaves
        # the completed kernels' data on disk
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=1)
        os.replace(tmp, args.out)

    print(f"\nwrote {args.out}")
    return 2 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
