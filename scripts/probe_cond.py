"""Probe: lax.cond with vector results inside a Pallas fori_loop on Mosaic.

Validates the two-tier k-select pattern before it goes into ops/pallas_dp.py:
  * scalar predicate from jnp.any over a (W, 128) tile
  * lax.cond whose branches read VMEM scratch (the score-tile ref)
  * cond outputs feeding the fori_loop carry
Run on the real chip:  PALLAS_AXON_REMOTE_COMPILE=1 python scripts/probe_cond.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(interpret: bool) -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W, LANES, Q, N = 32, 128, 16, 256

    def kernel(x_v, o_v, ct, zbuf):
        ct[:] = x_v[:, :Q, :]
        zbuf[:] = jnp.zeros((W, LANES), jnp.int32)
        zi0 = zbuf[:]

        def body(i, carry):
            acc, run = carry
            k_c = (run % 23) + (i % 7)

            def ladder(kmax):
                cv = jnp.zeros((W, LANES), jnp.float32) + 1e9
                for kk in range(1, kmax + 1):
                    cv = jnp.where(k_c == kk, ct[:, (kk - 1) % Q, :], cv)
                return cv

            need = jnp.any((k_c > 4) & (k_c <= 12))
            cv = jax.lax.cond(need, lambda: ladder(12), lambda: ladder(4))
            acc = acc + jnp.where(cv < 1e9, cv, 0.0)
            run = run + 1
            return acc, run

        acc, _ = jax.lax.fori_loop(0, N, body, (zi0.astype(jnp.float32), zi0))
        o_v[:] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((W, LANES), np.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W, Q, LANES), np.float32),
                        pltpu.VMEM((W, LANES), np.int32)],
        interpret=interpret,
    )
    x = np.arange(W * Q * LANES, dtype=np.float32).reshape(W, Q, LANES) % 97
    xpad = np.zeros((W, Q, LANES), np.float32)
    xpad[:] = x
    t0 = time.perf_counter()
    out = np.asarray(jax.jit(call)(xpad))
    t1 = time.perf_counter()

    # reference in pure numpy
    acc = np.zeros((W, LANES), np.float32)
    run = np.zeros((W, LANES), np.int64)
    for i in range(N):
        k_c = (run % 23) + (i % 7)
        cv = np.full((W, LANES), 1e9, np.float32)
        for kk in range(1, 13):
            cv = np.where(k_c == kk, x[:, (kk - 1) % Q, :], cv)
        acc += np.where(cv < 1e9, cv, 0.0)
        run += 1
    ok = np.array_equal(out, acc)
    print(f"interpret={interpret} ok={ok} compile+run={t1 - t0:.1f}s")
    assert ok, (out[0, :8], acc[0, :8])


if __name__ == "__main__":
    main(interpret=len(sys.argv) > 1 and sys.argv[1] == "interp")
