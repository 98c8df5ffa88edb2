#!/usr/bin/env python
"""Ceiling check: our kernel vs jax.experimental pallas flash/splash and int8 variant."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

B, S, N, H = 2, 32760, 40, 128
PEAK = 197e12


INNER = 8  # kernel invocations per dispatch: amortizes the axon tunnel roundtrip


def timeit(name, body, q, k, v, reps=3):
    """body(q, k, v) -> scalar. Wrapped in an in-program fori_loop of INNER calls so
    one host dispatch times INNER kernel executions (per-call host sync through the
    tunnel showed 30% run-to-run variance)."""
    def looped(q, k, v):
        def it(i, acc):
            return acc + body(q + 0.001 * acc, k, v)
        return jax.lax.fori_loop(0, INNER, it, jnp.float32(0.0))

    fn = jax.jit(looped)
    try:
        float(fn(q, k, v))  # warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(q, k, v))
            best = min(best, (time.perf_counter() - t0) / INNER)
        flops = 4.0 * B * N * S * S * H
        print(f"{name:24s}: {best*1e3:7.1f} ms  MFU {flops/best/PEAK*100:5.1f}%",
              flush=True)
    except Exception as e:
        print(f"{name:24s}: FAIL {str(e)[:160]}", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, N, H), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, N, H), jnp.bfloat16)
    v = jax.random.normal(kv_, (B, S, N, H), jnp.bfloat16)

    from goal_force_tpu.ops import flash_attention as fa

    for bq, bk, bki, pipe in [(1024, 1024, 1024, False), (1024, 2048, 512, True),
                              (1024, 2048, 1024, False)]:
        timeit(f"ours bq{bq} bk{bk} i{bki} p{int(pipe)}",
               lambda q, k, v, bq=bq, bk=bk, bki=bki, pipe=pipe: fa._fa_forward(
                   q, k, v, H ** -0.5, bq, bk, with_lse=False,
                   bk_inner_opt=bki, pipelined=pipe)[0].astype(jnp.float32).mean(),
               q, k, v)

    timeit("ours int8",
           lambda q, k, v: fa.flash_attention_int8(
               q, k, v, H ** -0.5).astype(jnp.float32).mean(), q, k, v)

    sp = 32768  # official kernels need divisible lengths
    qp = jnp.pad(q, ((0, 0), (0, sp - S), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, sp - S), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, sp - S), (0, 0), (0, 0)))

    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jref,
        )

        timeit("jax pallas flash",
               lambda q, k, v: jref(
                   q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                   v.transpose(0, 2, 1, 3), causal=False,
                   sm_scale=H ** -0.5).astype(jnp.float32).mean(), qp, kp, vp)
    except ImportError as e:
        print("jax flash unavailable:", e)

    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        mask = sm.MultiHeadMask([sm.FullMask((sp, sp)) for _ in range(N)])
        kernel = sk.make_splash_mha(mask=mask, head_shards=1, q_seq_shards=1)

        def call(q, k, v):
            qs = q.transpose(0, 2, 1, 3) * (H ** -0.5)
            ks = k.transpose(0, 2, 1, 3)
            vs = v.transpose(0, 2, 1, 3)
            out = jax.vmap(kernel)(qs, ks, vs)
            return out.astype(jnp.float32).mean()

        timeit("jax splash", call, qp, kp, vp)
    except Exception as e:
        print("jax splash unavailable:", str(e)[:160])


if __name__ == "__main__":
    main()
