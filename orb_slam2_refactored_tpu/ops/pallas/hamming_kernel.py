"""Pallas TPU kernel: tiled packed-descriptor Hamming distance matrix.

The single hottest matching primitive (every ORBmatcher variant reduces to
it — see ops/hamming.py). The XLA version materializes an [M,N,8] XOR
intermediate in HBM for large M; this kernel tiles the output into
VMEM-resident [TM, TN] blocks and accumulates the 8 descriptor words
in-register, with SWAR popcount (Mosaic has no native popcount on all
generations; the SWAR sequence is pure VPU arithmetic).

Grid: (M/TM, N/TN); each program computes one output tile from an
a-tile [TM, 8] and a b-tile [TN, 8].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 256
TN = 256


def _popcount_u32(v):
    """SWAR popcount on uint32 (Hacker's Delight 5-2), all VPU ops."""
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (v * jnp.uint32(0x01010101)) >> 24


def _hamming_tile_kernel(a_ref, b_ref, out_ref):
    acc = jnp.zeros((TM, TN), jnp.uint32)
    for w in range(8):
        aw = a_ref[:, w][:, None]          # [TM,1]
        bw = b_ref[:, w][None, :]          # [1,TN]
        acc = acc + _popcount_u32(jnp.bitwise_xor(aw, bw))
    out_ref[:, :] = acc.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=())
def hamming_matrix_pallas(a, b):
    """a: u32[M,8], b: u32[N,8] -> i32[M,N]. M, N padded to tile multiples."""
    M, N = a.shape[0], b.shape[0]
    Mp = ((M + TM - 1) // TM) * TM
    Np = ((N + TN - 1) // TN) * TN
    if Mp != M:
        a = jnp.pad(a, ((0, Mp - M), (0, 0)))
    if Np != N:
        b = jnp.pad(b, ((0, Np - N), (0, 0)))
    out = pl.pallas_call(
        _hamming_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.int32),
        grid=(Mp // TM, Np // TN),
        in_specs=[
            pl.BlockSpec((TM, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(a, b)
    return out[:M, :N]


def available() -> bool:
    """Probe whether the kernel compiles+runs on the current backend."""
    try:
        a = jnp.zeros((4, 8), jnp.uint32)
        out = hamming_matrix_pallas(a, a)
        jax.block_until_ready(out)
        return True
    except Exception:
        return False
