"""Honest wall-clock timing for the 'axon' JAX platform.

On this environment's TPU platform, ``jax.block_until_ready`` returns
BEFORE device execution completes (verified: an 8192^3 bf16 matmul
"timed" at 0.019 ms = 58 PFLOP/s, ~300x over a v5e's peak). Only a
device->host transfer (``float(x)`` / ``np.asarray(x)``) actually blocks,
and that transfer carries a fixed ~30-40 ms platform sync overhead.

Every measurement in this repo therefore uses:

* a CHAIN: k iterations where iteration i+1's input depends on iteration
  i's output, closed by ``float(scalar)`` — forces sequential device
  execution and blocks until all k finish;
* the SLOPE: per_iter = (T(n) - T(1)) / (n - 1), which subtracts the
  fixed sync overhead; each T(k) is the median of >= `repeats` runs;
* a PLAUSIBILITY GUARD: implied FLOP/s from XLA ``cost_analysis()`` must
  not exceed the chip's peak, else the clock is broken and we error out.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable, NamedTuple

# TPU v5e bf16 peak ~197 TFLOP/s/chip. cost_analysis counts logical
# FLOPs (2MNK per matmul); allow 25% headroom for analysis slop.
PEAK_TFLOPS = 197.0


def enable_compilation_cache() -> None:
    """Persistent XLA compile cache under the repo's .jax_cache.

    The big train-step compiles dominate bench/script startup on this
    1-core host; tests already share this cache (tests/conftest.py) —
    scripts and bench.py call this to join it. Safe to call before or
    after jax import, must be before first compilation.
    """
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


class SlopeTiming(NamedTuple):
    per_iter: float       # median-slope seconds per iteration
    t1: float             # median wall time of a 1-iteration chain
    tn: float             # median wall time of the n-iteration chain
    per_iter_min: float   # min-based slope (best case)
    n_long: int

    @property
    def sync_overhead(self) -> float:
        """The platform's fixed per-transfer overhead estimate."""
        return max(self.t1 - self.per_iter, 0.0)


def slope_time(run_chain: Callable[[int], float], n_long: int,
               repeats: int = 11) -> SlopeTiming:
    """Time ``run_chain`` at k=1 and k=n_long; return the slope.

    ``run_chain(k)`` must execute k data-dependency-chained device
    iterations and block on a host transfer of the final result (return
    value is ignored; typically ``float(scalar)``).
    """
    t1s, tns = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_chain(1)
        t1s.append(time.perf_counter() - t0)
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_chain(n_long)
        tns.append(time.perf_counter() - t0)
    t1 = statistics.median(t1s)
    tn = statistics.median(tns)
    per_iter = max((tn - t1) / (n_long - 1), 1e-9)
    per_iter_min = max((min(tns) - min(t1s)) / (n_long - 1), 1e-9)
    return SlopeTiming(per_iter, t1, tn, per_iter_min, n_long)


def xla_flops(jitted_fn, *args) -> float:
    """Total FLOPs of a jitted fn at args, per XLA cost analysis (0 if
    the backend doesn't expose it)."""
    try:
        cost = jitted_fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def implied_tflops(flops: float, seconds: float) -> float:
    if flops <= 0 or seconds <= 0:
        return 0.0
    return flops / seconds / 1e12


def check_plausible(name: str, flops: float, seconds: float) -> float:
    """Return implied TFLOP/s; raise if it exceeds the device's peak.

    This is the guard that would have caught the round-1 60-150x
    benchmark inflation before it reached any document.
    """
    rate = implied_tflops(flops, seconds)
    if rate > PEAK_TFLOPS * 1.25:
        raise RuntimeError(
            f"{name}: implied {rate:.1f} TFLOP/s exceeds device peak "
            f"{PEAK_TFLOPS} TFLOP/s — the measurement clock is broken "
            f"(flops={flops:.3e}, seconds={seconds:.6f})")
    return rate
