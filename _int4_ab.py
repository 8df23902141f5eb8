"""A/B micro-bench: weight-only matvec formulations on the decode loop shape.

18 chained [B,K]x[K,N] layers inside one while_loop (the PERF.md fused-QKV
methodology: per-op overhead and DMA overlap behave like the real decode
loop, unlike a single-op timing). Measures ms/iter and effective GB/s of
weight bytes for:
  - bf16 dense          (2 B/param)
  - int8 dequant        (1 B/param, the shipped path)
  - int4 two-dot        (reads packed twice: expected ~int8)
  - int4 3-D contraction (group dim as tensor dim, no reshape)
  - int4 stacked single-dot
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

L, B, K, N, G = 18, 2, 2048, 8192, 128
ITERS = 50

rng = np.random.default_rng(0)
w = rng.standard_normal((L, K, N)).astype(np.float32) * 0.02
x0 = rng.standard_normal((B, K)).astype(np.float32)

# int8 per-output-channel
amax8 = np.abs(w).max(axis=1, keepdims=True)
s8 = (amax8 / 127.0).astype(np.float32)
q8 = np.clip(np.round(w / s8), -127, 127).astype(np.int8)

# int4 group-wise
wg = w.reshape(L, K // G, G, N)
amax4 = np.abs(wg).max(axis=2, keepdims=True)
s4 = np.maximum(amax4 / 7.0, 1e-12).astype(np.float32)    # [L, K/G, 1, N]
q4 = np.clip(np.round(wg / s4), -7, 7).astype(np.int64).reshape(L, K, N)
packed = ((q4[:, 0::2] & 0xF) | ((q4[:, 1::2] & 0xF) << 4)).astype(
    np.uint8).view(np.int8)                                # [L, K/2, N]
s4 = s4[:, :, 0, :]                                        # [L, K/G, N]
# 3-D layout: [L, K/G, G/2, N] packed within groups
packed3 = packed.reshape(L, K // G, G // 2, N)

DT = jnp.bfloat16


def proj(x, n):
    # fold N back to K between layers so the chain stays [B, K]
    return x.reshape(B, K, N // K).mean(-1) if n == N else x


def run_bf16(x, wl):
    def body(c):
        i, x = c
        y = jax.lax.dot_general(x, wl[i].astype(DT), (((1,), (0,)), ((), ())),
                                preferred_element_type=DT)
        return i + 1, proj(y, N) * (1 + 1e-6)
    return jax.lax.while_loop(lambda c: c[0] < L, body, (0, x))[1]


def run_int8(x, q, s):
    def body(c):
        i, x = c
        wi = q[i].astype(DT) * s[i].astype(DT)
        y = jax.lax.dot_general(x, wi, (((1,), (0,)), ((), ())),
                                preferred_element_type=DT)
        return i + 1, proj(y, N) * (1 + 1e-6)
    return jax.lax.while_loop(lambda c: c[0] < L, body, (0, x))[1]


def run_int4_twodot(x, p, s):
    def body(c):
        i, x = c
        pi = p[i]
        lo = (jnp.left_shift(pi, 4) >> 4).astype(DT)
        hi = (pi >> 4).astype(DT)
        sg = s[i].astype(DT)[:, None, :]
        wl = (lo.reshape(K // G, G // 2, N) * sg).reshape(K // 2, N)
        wh = (hi.reshape(K // G, G // 2, N) * sg).reshape(K // 2, N)
        y = jax.lax.dot_general(x[:, 0::2], wl, (((1,), (0,)), ((), ())),
                                preferred_element_type=DT)
        y = y + jax.lax.dot_general(x[:, 1::2], wh, (((1,), (0,)), ((), ())),
                                    preferred_element_type=DT)
        return i + 1, proj(y, N) * (1 + 1e-6)
    return jax.lax.while_loop(lambda c: c[0] < L, body, (0, x))[1]


def run_int4_3d(x, p3, s):
    def body(c):
        i, x = c
        pi = p3[i]                                  # [K/G, G/2, N]
        lo = (jnp.left_shift(pi, 4) >> 4).astype(DT)
        hi = (pi >> 4).astype(DT)
        sg = s[i].astype(DT)[:, None, :]            # [K/G, 1, N]
        wl, wh = lo * sg, hi * sg                   # no reshape
        xr = x.reshape(B, K // G, G // 2, 2)        # even/odd interleave
        xe, xo = xr[..., 0], xr[..., 1]             # [B, K/G, G/2]
        dn = (((1, 2), (0, 1)), ((), ()))
        y = jax.lax.dot_general(xe, wl, dn, preferred_element_type=DT) \
            + jax.lax.dot_general(xo, wh, dn, preferred_element_type=DT)
        return i + 1, proj(y, N) * (1 + 1e-6)
    return jax.lax.while_loop(lambda c: c[0] < L, body, (0, x))[1]


def run_int4_stack(x, p3, s):
    def body(c):
        i, x = c
        pi = p3[i]
        lo = (jnp.left_shift(pi, 4) >> 4).astype(DT)
        hi = (pi >> 4).astype(DT)
        sg = s[i].astype(DT)[:, None, :]
        w2 = jnp.stack([lo * sg, hi * sg], axis=2)  # [K/G, G/2, 2, N]
        xr = x.reshape(B, K // G, G // 2, 2)
        dn = (((1, 2, 3), (0, 1, 2)), ((), ()))
        y = jax.lax.dot_general(xr, w2, dn, preferred_element_type=DT)
        return i + 1, proj(y, N) * (1 + 1e-6)
    return jax.lax.while_loop(lambda c: c[0] < L, body, (0, x))[1]


def timeit(name, fn, *args, bytes_per_param):
    f = jax.jit(fn)
    x = jnp.asarray(x0, DT)
    args = [jnp.asarray(a) for a in args]
    y = f(x, *args)
    float(jnp.sum(y.astype(jnp.float32)))  # honest fetch
    t0 = time.perf_counter()
    acc = x
    for _ in range(ITERS):
        acc = f(acc * (1 + 1e-9), *args)
    host = float(jnp.sum(acc.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS
    gb = L * K * N * bytes_per_param / 1e9
    print(f"{name:14s} {dt*1e3:7.2f} ms/iter  {gb/dt:7.1f} GB/s weights"
          f"  (host={host:.3g})")


timeit("bf16", run_bf16, w.astype(np.float32), bytes_per_param=2)
timeit("int8", run_int8, q8, s8, bytes_per_param=1)
timeit("int4-twodot", run_int4_twodot, packed, s4, bytes_per_param=0.5)
timeit("int4-3d", run_int4_3d, packed3, s4, bytes_per_param=0.5)
timeit("int4-stack", run_int4_stack, packed3, s4, bytes_per_param=0.5)
