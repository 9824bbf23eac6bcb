#!/usr/bin/env python3
"""Pin fast XLA schedule draws into the persistent compilation cache.

XLA's schedule for the big fused update_map program is not deterministic
across the compile pool: identical HLO measures anywhere from ~5 to
~8.5 ms/step depending on the draw (see ops/pallas/tuning.py docstring).
The persistent compilation cache (bench.py enables it at .jax_cache)
freezes whichever draw compiled first — so a mediocre first draw becomes
every future benchmark's ceiling. In-process hedging cannot re-roll: with
the persistent cache on, a recompile is a cache hit.

Phases:
  0. incumbent — if .jax_cache already exists, measure it (warm, fast);
     the re-rolled candidate must beat it or the cache is left alone, so
     repeated curation runs are monotone non-regressing.
  1. headline re-roll — each attempt starts from an EMPTY cache dir, runs
     `bench.py` restricted to the headline stage (BENCH_STAGES=headline),
     keeps the best attempt's cache directory.
  2. B=24 re-roll — each attempt copies the winning cache (headline warm)
     and runs BENCH_STAGES=headline,b24; the best B=24 draw's cache wins.
     (Re-rolling B=24 requires its cache entry to be ABSENT, which is why
     attempts build on phase-1 dirs, never on the incumbent.)
  3. final full-budget run against the winning cache warms the remaining
     stages (act, train step, fp32 parity) with single draws.

Usage: python tools/curate_cache.py [--attempts 5] [--target-fps 1150]
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


def run_bench(cache_dir: str, budget_s: float, timeout_s: float,
              stages: str, opts=None):
    """opts: compiler-options string for this attempt ("" = defaults).
    None = let bench.py auto-load the cache dir's compiler_opts.json (the
    options an existing cache was built under — required for cache HITs,
    since executables are keyed by their debug options)."""
    env = dict(
        os.environ,
        BENCH_BUDGET_S=str(budget_s),
        JAX_COMPILATION_CACHE_DIR=cache_dir,
        BENCH_LOG=os.path.join(cache_dir, "bench_progress.log"),
        BENCH_HEDGE="1",
        BENCH_STAGES=stages,
    )
    env.pop("WS_COMPILER_OPTS", None)
    if opts is not None:
        if opts:
            env["WS_COMPILER_OPTS"] = opts
        os.makedirs(cache_dir, exist_ok=True)
        with open(os.path.join(cache_dir, "compiler_opts.json"), "w") as f:
            json.dump(opts, f)
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, timeout=timeout_s,
            cwd=REPO)
    except subprocess.TimeoutExpired:
        return None
    last = None
    for line in p.stdout.splitlines():
        try:
            last = json.loads(line)
        except (json.JSONDecodeError, TypeError):
            continue
    if last is None:
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-2000:] + "\n")
    return last


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attempts", type=int, default=5)
    ap.add_argument("--b24-attempts", type=int, default=3)
    ap.add_argument("--target-fps", type=float, default=1150.0,
                    help="stop phase-1 early once an attempt reaches this")
    ap.add_argument("--b24-target-fps", type=float, default=1000.0)
    ap.add_argument("--attempt-timeout", type=float, default=900.0)
    ap.add_argument("--final-budget", type=float, default=2400.0,
                    help="budget for the final warm-everything run")
    ap.add_argument("--no-incumbent", action="store_true",
                    help="ignore an existing .jax_cache instead of "
                         "requiring the re-roll to beat it")
    ap.add_argument("--opts",
                    default=";xla_tpu_scoped_vmem_limit_kib=65536",
                    help="semicolon-separated compiler-option strings; "
                         "phase-1 attempts cycle through them (empty "
                         "string = compiler defaults). The scoped-vmem "
                         "64 MiB option measured the fattest right tail "
                         "of schedule draws (1015 f/s max vs 833 default) "
                         "on one machine, but also produced a >15 min "
                         "compile hang on another — try defaults FIRST so "
                         "attempt 0 cannot burn its whole timeout")
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="curate_cache_")

    # ---- phase 0: measure the incumbent cache (warm, so fast) --------------
    incumbent = None  # (headline_fps, b24_fps)
    if not args.no_incumbent and os.path.isdir(CACHE):
        d_inc = os.path.join(work, "incumbent")
        shutil.copytree(CACHE, d_inc)
        r = run_bench(d_inc, budget_s=3600.0, timeout_s=900.0,
                      stages="headline,b24")
        if r and r.get("value"):
            incumbent = (r["value"],
                         r.get("extras", {}).get("map_update_fps_b24") or -1.0)
            print(f"[curate] incumbent cache: {incumbent[0]} f/s headline, "
                  f"{incumbent[1]} f/s b24", flush=True)

    # ---- phase 1: headline re-roll -----------------------------------------
    opts_list = args.opts.split(";")
    best = (None, -1.0)  # (dir, fps)
    for i in range(args.attempts):
        d = os.path.join(work, f"attempt_{i}")
        os.makedirs(d, exist_ok=True)
        opts = opts_list[i % len(opts_list)]
        t0 = time.time()
        r = run_bench(d, budget_s=1.0, timeout_s=args.attempt_timeout,
                      stages="headline", opts=opts)
        fps = r.get("value") if r else None
        print(f"[curate] headline attempt {i} [{opts or 'defaults'}]: "
              f"{fps} f/s in {time.time()-t0:.0f}s", flush=True)
        if fps is None:
            continue
        if fps > best[1]:
            best = (d, fps)
        if fps >= args.target_fps:
            break

    if best[0] is None:
        print("[curate] no successful attempt; leaving cache as is")
        sys.exit(1)
    print(f"[curate] best headline draw: {best[1]} f/s")

    # ---- phase 2: B=24 re-roll on top of the winning headline --------------
    best24 = (best[0], -1.0)
    for i in range(args.b24_attempts):
        d = os.path.join(work, f"b24_attempt_{i}")
        shutil.copytree(best[0], d)
        t0 = time.time()
        r = run_bench(d, budget_s=3600.0, timeout_s=args.attempt_timeout,
                      stages="headline,b24")
        fps24 = (r or {}).get("extras", {}).get("map_update_fps_b24")
        head = (r or {}).get("value")
        print(f"[curate] b24 attempt {i}: {fps24} f/s (headline re-read "
              f"{head}) in {time.time()-t0:.0f}s", flush=True)
        if fps24 is None:
            continue
        if fps24 > best24[1]:
            best24 = (d, fps24)
        if fps24 >= args.b24_target_fps:
            break
    print(f"[curate] best b24 draw: {best24[1]} f/s")

    # ---- install: only if the challenger beats the incumbent ---------------
    # Headline is THE driver metric, so it dominates; b24 breaks near-ties.
    if incumbent is not None:
        h_new = best[1]
        if h_new < incumbent[0] * 0.995 or (
                h_new < incumbent[0] * 1.005 and best24[1] < incumbent[1]):
            print(f"[curate] challenger ({h_new} f/s) does not beat the "
                  f"incumbent ({incumbent[0]} f/s); leaving .jax_cache "
                  "as is", flush=True)
            with open(os.path.join(CACHE, "curated_fps.json"), "w") as f:
                json.dump({"headline_fps": incumbent[0],
                           "b24_fps": incumbent[1] if incumbent[1] > 0
                           else None}, f)
            shutil.rmtree(work, ignore_errors=True)
            return

    if os.path.isdir(CACHE):
        shutil.rmtree(CACHE)
    shutil.copytree(best24[0], CACHE)
    shutil.rmtree(work, ignore_errors=True)

    # Record what the installed cache delivered: bench.py compares its own
    # measurement against this and re-rolls fresh draws when it falls well
    # short (cache MISS after a code change -> random fresh schedule).
    with open(os.path.join(CACHE, "curated_fps.json"), "w") as f:
        json.dump({"headline_fps": best[1],
                   "b24_fps": best24[1] if best24[1] > 0 else None}, f)

    # ---- phase 3: warm the remaining stages (single draws) -----------------
    t0 = time.time()
    r = run_bench(CACHE, budget_s=args.final_budget,
                  timeout_s=args.final_budget + 300, stages="headline,act,b24,train,fp32")
    print(f"[curate] final warm run: "
          f"{(r or {}).get('value')} f/s headline, "
          f"{(r or {}).get('extras', {}).get('map_update_fps_b24')} f/s b24 "
          f"in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
