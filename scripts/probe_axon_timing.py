"""Probe the axon tunnel's execution/synchronization semantics.

Round-5 finding: bench_canary measured 96,199 TFLOP/s (488x the v5e
bf16 peak) with the standard enqueue-N-then-block_until_ready timing
loop — physically impossible, meaning `.block_until_ready()` returned
before the enqueued computations actually ran (or duplicate in-flight
executions were coalesced). This probe times the SAME matmul chain
under four protocols to find which one measures real device time:

  A. independent calls, block on last output       (bench.py <= r4)
  B. chained calls (out feeds next in), block last (data dependency)
  C. chained calls + jax.device_get of one scalar  (value round-trip)
  D. single call + full device_get                 (upper bound)

A sane protocol yields <= ~197 TFLOP/s (bf16 peak). Whichever of A-C
is closest to D-per-call while staying physically possible becomes the
bench protocol.
"""

import sys
import time

sys.path.insert(0, ".")

from stylish_tts_tpu.utils.jax_cache import setup_persistent_cache

setup_persistent_cache(warn_stderr=True)

N = 4096
ITERS = 20
FLOPS_PER_CALL = 8 * 2.0 * N * N * N


def main():
    import jax
    import jax.numpy as jnp

    a = jnp.ones((N, N), jnp.bfloat16)
    b = jnp.ones((N, N), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        for _ in range(8):
            a = (a @ b) * (1.0 / N)
        return a

    chain(a, b).block_until_ready()

    def report(name, dt_per_call):
        tf = FLOPS_PER_CALL / dt_per_call / 1e12
        print(f"{name}: {dt_per_call * 1e3:.3f} ms/call, {tf:.1f} TFLOP/s "
              f"({tf / 197.0:.2f}x v5e bf16 peak)"
              f"{'  <-- IMPOSSIBLE' if tf > 197 else ''}", flush=True)

    # A: independent calls, block on last
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = chain(a, b)
    out.block_until_ready()
    report("A independent+block", (time.perf_counter() - t0) / ITERS)

    # B: chained calls, block on last
    t0 = time.perf_counter()
    x = a
    for _ in range(ITERS):
        x = chain(x, b)
    x.block_until_ready()
    report("B chained+block", (time.perf_counter() - t0) / ITERS)

    # C: chained + scalar value round-trip
    t0 = time.perf_counter()
    x = a
    for _ in range(ITERS):
        x = chain(x, b)
    _ = jax.device_get(x[0, 0])
    report("C chained+device_get[0,0]", (time.perf_counter() - t0) / ITERS)

    # D: one call, full materialization
    t0 = time.perf_counter()
    _ = jax.device_get(chain(a, b))
    report("D single+full device_get", time.perf_counter() - t0)


if __name__ == "__main__":
    main()
