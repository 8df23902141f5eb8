"""Benchmark: SNAC 24 kHz full-size encode+decode round-trip throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: >500x realtime per TPU chip (BASELINE.json north star).

Timing methodology: the axon remote-TPU platform's block_until_ready returns
before device work completes, so the only honest clock is a host fetch of a
scalar that data-depends on every iteration. We chain ITERS forwards inside
one jitted fori_loop (inputs perturbed by the running accumulator so XLA
cannot hoist the loop-invariant body) and fetch one float at the end; the
single tunnel round-trip is amortized over all iterations.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig

    model = SNAC(SNACConfig.snac_24khz())
    cfg = model.config
    seconds = 10.0
    batch = 1  # single-stream (B>1 gains little: the codec is HBM-bound per sample)
    n = int(cfg.sample_rate * seconds)
    rng = np.random.default_rng(0)

    padded = -(-n // cfg.pad_to) * cfg.pad_to
    a = np.zeros((batch, padded, 1), np.float32)
    a[:, :n, 0] = 0.25 * rng.standard_normal((batch, n))
    a = jax.device_put(a)
    key = jax.random.key(0)

    iters = 10

    @jax.jit
    def chained(params, a, key):
        def body(i, carry):
            acc, key = carry
            key, sub = jax.random.split(key)
            out, _ = model._forward_fn(params, a * (1.0 + 1e-12 * acc), sub)
            return acc + jnp.sum(jnp.abs(out)), key

        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.zeros(()), key))
        return acc

    # warmup / compile (fetch forces completion)
    float(chained(model.params, a, key))

    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        float(chained(model.params, a, key))
        best = min(best, time.perf_counter() - start)

    xrt = seconds * batch * iters / best
    print(json.dumps({
        "metric": "snac24_roundtrip_xRT",
        "value": round(xrt, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(xrt / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
