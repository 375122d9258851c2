"""XLA prepass: build the Pallas engine's linear tables on device.

Takes raw int8 window sequences and emits the (B, NL, PB, 128) tiled
linear tables (bases + n-polymer L/LZ planes, ref side position-linear,
seq side reversed) plus the per-block steps tiles -- everything the DP/TB
kernels DMA. Moves ~90% of the per-group H2D volume (the n-polymer
planes) onto the device, where np_info runs as segmented scans
(ops/npinfo_device.py).
"""
from __future__ import annotations

import functools

import numpy as np

from ..ops.pallas_dp import BLK, LANES


@functools.lru_cache(maxsize=None)
def get_prepass(r_pad: int, G: int, W: int, max_n: int, max_l: int):
    import jax
    import jax.numpy as jnp
    from ..ops.npinfo_device import np_info_device

    P2 = r_pad + 512
    PADL = 128
    A_OFF = r_pad + 128
    NL = 1 + 2 * max_n
    nblk = r_pad // BLK
    B = G * W

    def prepass(ref8, seq8, sd8):
        # ref8/seq8: (B, r_pad) int8 zero-padded windows
        # sd8: (G, W, r_pad) int8 dels-steps
        ref = ref8.astype(jnp.int32)
        seq = seq8.astype(jnp.int32)

        def side(x):
            L, LZ = np_info_device(x, max_n, max_l)
            planes = jnp.concatenate(
                [x[:, None, :], jnp.minimum(L, 127), LZ], axis=1)
            return planes                       # (B, NL, r_pad)

        pr = side(ref)
        ps = side(seq)
        base = jnp.zeros((B, NL, P2), jnp.int32)
        base = base.at[:, 1 + max_n:, :].set(1)          # LZ default 1
        linr = base.at[:, :, PADL:PADL + r_pad].set(pr)
        lins = base.at[:, :, A_OFF + 1 - r_pad:A_OFF + 1].set(
            jnp.flip(ps, axis=2))
        linr = linr.reshape(B, NL, P2 // LANES, LANES)
        lins = lins.reshape(B, NL, P2 // LANES, LANES)

        sd = jnp.concatenate(
            [sd8.astype(jnp.int32),
             jnp.zeros((G, W, 128), jnp.int32)], axis=2)
        idx = (np.arange(nblk)[:, None] * BLK
               + np.arange(LANES)[None, :])              # (nblk, 128)
        steps = jnp.take(sd, jnp.asarray(idx), axis=2)   # (G, W, nblk, 128)
        steps = jnp.swapaxes(steps, 1, 2)                # (G, nblk, W, 128)
        return linr, lins, steps

    return jax.jit(prepass)
