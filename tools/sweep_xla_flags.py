#!/usr/bin/env python3
"""Probe whether XLA debug options pin the fast update_map schedule.

The compile pool's workers produce schedules varying ~±30% for identical
HLO (ops/pallas/tuning.py). tuning.py traced one axis of disagreement to
scoped-VMEM accounting; if a debug option (serialized with the compile
request) lands the fast regime deterministically, curation stops being a
lottery. Each combo runs bench.py's headline stage from an EMPTY cache dir
(a fresh schedule draw) N times and reports the draws.

Options travel via WS_COMPILER_OPTS -> `.compile(compiler_options=...)`
(tuning.py): this reaches the REMOTE TPU compiler, whereas the local
client build fatally rejects TPU-only names in XLA_FLAGS.

Usage: python tools/sweep_xla_flags.py [--draws 2] [--combos ...]
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMBOS = {
    "none": "",
    "vmem128m": "xla_tpu_scoped_vmem_limit_kib=131072",
    "vmem64m": "xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem32m": "xla_tpu_scoped_vmem_limit_kib=32768",
    "no_lhs": "xla_tpu_enable_latency_hiding_scheduler=false",
    "lhs": "xla_tpu_enable_latency_hiding_scheduler=true",
}


def run_headline(opts: str, timeout_s: float = 600.0):
    d = tempfile.mkdtemp(prefix="sweep_cache_")
    env = dict(
        os.environ,
        BENCH_BUDGET_S="1",
        JAX_COMPILATION_CACHE_DIR=d,
        BENCH_LOG=os.path.join(d, "bench_progress.log"),
        BENCH_HEDGE="1",
        BENCH_STAGES="headline",
    )
    if opts:
        env["WS_COMPILER_OPTS"] = opts
    try:
        p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           capture_output=True, text=True, env=env,
                           timeout=timeout_s, cwd=REPO)
    except subprocess.TimeoutExpired:
        shutil.rmtree(d, ignore_errors=True)
        return None, "timeout"
    last, err = None, ""
    for line in p.stdout.splitlines():
        try:
            last = json.loads(line)
        except (json.JSONDecodeError, TypeError):
            continue
    if last is None:
        err = (p.stdout[-500:] + p.stderr[-500:]).replace("\n", " ")
    shutil.rmtree(d, ignore_errors=True)
    return (last or {}).get("value"), err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--draws", type=int, default=2)
    ap.add_argument("--combos", default=",".join(COMBOS))
    args = ap.parse_args()

    results = {}
    for name in args.combos.split(","):
        flags = COMBOS[name]
        draws = []
        for i in range(args.draws):
            t0 = time.time()
            fps, err = run_headline(flags)
            draws.append(fps)
            print(f"[sweep] {name:10s} draw {i}: {fps} f/s "
                  f"in {time.time()-t0:.0f}s {err[:200]}", flush=True)
        results[name] = draws
    print(json.dumps(results))


if __name__ == "__main__":
    main()
