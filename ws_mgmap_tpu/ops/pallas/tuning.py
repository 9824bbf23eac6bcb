"""Kernel-parameter tuning mode with a compile-failure fallback.

The aggressive kernel parameters (splat ``n_acc=4``, the measured conv
row-tile table) are the fastest configurations on v5e — but their scoped
VMEM footprint sits between 13 and 26 MB depending on how the compiler
accounts double-buffering, and this environment's TPU compile service is a
pool whose workers disagree on that accounting (one build single-buffers
kernel scratch, another double-buffers it and rejects the same kernel with
"scoped vmem limit exceeded"). A parameter choice that compiles on one
worker can fail on the next, and requests round-robin per compile.

Policy:
  * default = aggressive;
  * long-lived consumers (bench, rollout engine) call
    :func:`with_compile_fallback` around their first jitted invocation —
    on a kernel-compile failure it flips :func:`safe_mode`, clears the jax
    executable caches and retries once with the conservative parameters
    (splat ``n_acc=2``, generic conv tiles), which fit every observed
    accounting;
  * the driver-facing ``__graft_entry__`` forces safe mode up front: a
    compile check must never depend on which pool worker answers.
"""
from __future__ import annotations

import os

_SAFE = False


def compiler_options() -> dict | None:
    """Extra XLA debug options for whole-program compiles, from the env.

    ``WS_COMPILER_OPTS="k=v,k=v"`` — passed via ``.compile(compiler_options=...)``,
    which reaches the REMOTE TPU compiler (this environment's local client
    fatally rejects unknown names in ``XLA_FLAGS``, so the env-var route is
    unusable for TPU-only flags). Used by tools/sweep_xla_flags.py to probe
    schedule-pinning options; empty/unset means compiler defaults.
    """
    s = os.environ.get("WS_COMPILER_OPTS", "").strip()
    if not s:
        return None
    return dict(kv.split("=", 1) for kv in s.split(",") if "=" in kv)


def safe_mode() -> bool:
    return _SAFE


def set_safe_mode(on: bool) -> None:
    global _SAFE
    _SAFE = bool(on)


def _is_kernel_compile_error(e: Exception) -> bool:
    msg = str(e)
    return ("vmem" in msg.lower() or "remote_compile" in msg
            or "Mosaic" in msg)


def with_compile_fallback(fn, *args, **kwargs):
    """Run ``fn(*args, **kwargs)``; on a TPU kernel compile failure, switch
    to conservative kernel parameters and retry once (see module doc)."""
    if _SAFE:
        return fn(*args, **kwargs)
    try:
        return fn(*args, **kwargs)
    except Exception as e:  # jax.errors.JaxRuntimeError subclasses vary
        if not _is_kernel_compile_error(e):
            raise
        import jax

        set_safe_mode(True)
        jax.clear_caches()
        return fn(*args, **kwargs)


def hedged_compile(fn, args, n: int = 2, time_fn=None):
    """AOT-compile ``fn(*args)`` ``n`` times and return the fastest
    executable.

    XLA's schedule for a large fused program is not deterministic across
    this pool's compile workers: six fresh compiles of the same update_map
    program measured 7.47-8.54 ms/step, with rare pathological draws at
    2x (17.5 ms observed). Each compile request re-rolls the worker, so
    best-of-n both tightens the mean and insures against the disaster
    draw — the standard autotuning move, applied at whole-program level.

    ``time_fn(executable) -> seconds`` ranks candidates; the default runs
    the executable twice and times the second call. Kernel-compile
    failures during a candidate flip safe mode (see with_compile_fallback)
    and the candidate is retried once; candidates after the flip compile
    conservatively.
    """
    import time as _time

    import jax
    import numpy as np

    def _default_time(ex):
        ex(*args)  # warm (device paging etc.)
        t0 = _time.perf_counter()
        out = ex(*args)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf)).reshape(-1)[:1]
        return _time.perf_counter() - t0

    time_fn = time_fn or _default_time
    n = max(1, n)
    best = None
    for draw in range(n):
        if draw > 0:
            # force this candidate to recompile; never clear after the last
            # draw (n=1 must leave the jit caches warm for later stages)
            jax.clear_caches()
        try:
            ex = jax.jit(fn).lower(*args).compile(
                compiler_options=compiler_options())
        except Exception as e:
            if not _is_kernel_compile_error(e) or _SAFE:
                raise
            set_safe_mode(True)
            jax.clear_caches()
            ex = jax.jit(fn).lower(*args).compile(
                compiler_options=compiler_options())
        if n == 1:
            return ex  # no ranking needed; skip the timing runs too
        dt = min(time_fn(ex) for _ in range(2))
        if best is None or dt < best[0]:
            best = (dt, ex)
    return best[1]
