"""uint64 emulation on uint32 pairs for TPU (no x64 mode needed).

The exist-filter hashes (hash64_1/2, lib/utils.c:1067-1091) use only
~  << >> ^ +  — all cheaply emulated on (hi, lo) uint32 pairs on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32


def u64(hi, lo):
    return (jnp.asarray(hi, U32), jnp.asarray(lo, U32))


def from_u32(lo):
    lo = jnp.asarray(lo, U32)
    return (jnp.zeros_like(lo), lo)


def add(a, b):
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(U32)
    return (a[0] + b[0] + carry, lo)


def xor(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def not_(a):
    return (~a[0], ~a[1])


def shl(a, n: int):
    if n == 0:
        return a
    if n >= 64:
        z = jnp.zeros_like(a[0])
        return (z, z)
    if n >= 32:
        return (a[1] << (n - 32), jnp.zeros_like(a[1]))
    return ((a[0] << n) | (a[1] >> (32 - n)), a[1] << n)


def shr(a, n: int):
    if n == 0:
        return a
    if n >= 64:
        z = jnp.zeros_like(a[0])
        return (z, z)
    if n >= 32:
        return (jnp.zeros_like(a[0]), a[0] >> (n - 32))
    return (a[0] >> n, (a[1] >> n) | (a[0] << (32 - n)))


def and_mask_bits(a, bits: int):
    """a & ((1<<bits)-1)."""
    if bits >= 64:
        return a
    if bits >= 32:
        return (a[0] & U32((1 << (bits - 32)) - 1), a[1])
    return (jnp.zeros_like(a[0]), a[1] & U32((1 << bits) - 1))


def hash64_1(key):
    """lib/utils.c:1067-1077 on (hi, lo) pairs."""
    k = key
    k = add(not_(k), shl(k, 21))
    k = xor(k, shr(k, 24))
    k = add(add(k, shl(k, 3)), shl(k, 8))
    k = xor(k, shr(k, 14))
    k = add(add(k, shl(k, 2)), shl(k, 4))
    k = xor(k, shr(k, 28))
    k = add(k, shl(k, 31))
    return k


def hash64_2(key):
    """lib/utils.c:1080-1091."""
    k = key
    k = add(k, not_(shl(k, 32)))
    k = xor(k, shr(k, 22))
    k = add(k, not_(shl(k, 13)))
    k = xor(k, shr(k, 8))
    k = add(k, shl(k, 3))
    k = xor(k, shr(k, 15))
    k = add(k, not_(shl(k, 27)))
    k = xor(k, shr(k, 31))
    return k
