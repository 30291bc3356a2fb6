"""Transfer-free plane equality digests.

Bulk plane transfers through the tunneled host<->device link are the
slowest operation in the system (d2h ~0.4-40 MB/s and it degrades the
link for the rest of the process). To compare a device-resident decoded
plane against a host-side golden plane without moving either, both
sides compute the same pair of 32-bit weighted sums over the cropped
plane; only two scalars cross the link. The weights are a closed-form
function of the pixel coordinates so no weight tensor is ever
materialized on the far side:

    W(y, x)  = y * 0x9E3779B1 + x * 0x85EBCA77 + 0xC2B2AE3D   (mod 2^32)
    d1       = sum(P * W)                                      (mod 2^32)
    d2       = sum(P * (W ^ 0xA5A5A5A5) * 0x27D4EB2F)          (mod 2^32)

For any difference between two planes, the probability that both
linear hashes collide is ~2^-64 over the pseudo-random weights. Bench
uses this as its conformance gate; full bit-exactness (byte-for-byte
md5 against the reference decoder) is asserted by the test suite.
"""
from functools import partial

import numpy as np

_C1 = 0x9E3779B1
_C2 = 0x85EBCA77
_C3 = 0xC2B2AE3D
_CX = 0xA5A5A5A5
_C4 = 0x27D4EB2F


def plane_digest_host(plane, ph, pw):
    """(d1, d2) uint32 digest of plane[:ph, :pw] in numpy."""
    p = plane[:ph, :pw].astype(np.uint32)
    y = np.arange(ph, dtype=np.uint32)[:, None]
    x = np.arange(pw, dtype=np.uint32)[None, :]
    with np.errstate(over="ignore"):
        w = y * np.uint32(_C1) + x * np.uint32(_C2) + np.uint32(_C3)
        d1 = np.sum(p * w, dtype=np.uint32)
        d2 = np.sum(p * ((w ^ np.uint32(_CX)) * np.uint32(_C4)),
                    dtype=np.uint32)
    return int(d1), int(d2)


def plane_digest_dev(plane, ph, pw):
    """(d1, d2) of a device-resident plane; only 2 scalars come back."""
    d1, d2 = _digest_jit(plane, ph, pw)
    return int(d1), int(d2)


def plane_digest_dev_async(plane, ph, pw):
    """Device-resident (d1, d2) WITHOUT reading them back. Even 4-byte
    scalar reads stall for minutes in bad tunnel weather and degrade
    the link; callers accumulate these and flush ONE stacked transfer
    at the end (digests_to_host)."""
    return _digest_jit(plane, ph, pw)


def digests_to_host(pairs):
    """One d2h for a whole batch of async digest pairs."""
    import jax.numpy as jnp
    if not pairs:
        return np.zeros((0, 2), np.uint32)
    stacked = jnp.stack([jnp.stack(p) for p in pairs])
    return np.asarray(stacked)


def _make_digest():
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("ph", "pw"))
    def digest(plane, ph, pw):
        p = plane[:ph, :pw].astype(jnp.uint32)
        y = jnp.arange(ph, dtype=jnp.uint32)[:, None]
        x = jnp.arange(pw, dtype=jnp.uint32)[None, :]
        w = y * jnp.uint32(_C1) + x * jnp.uint32(_C2) + jnp.uint32(_C3)
        d1 = jnp.sum(p * w, dtype=jnp.uint32)
        d2 = jnp.sum(p * ((w ^ jnp.uint32(_CX)) * jnp.uint32(_C4)),
                     dtype=jnp.uint32)
        return d1, d2
    return digest


class _Lazy:
    _fn = None

    def __call__(self, plane, ph, pw):
        if _Lazy._fn is None:
            _Lazy._fn = _make_digest()
        return _Lazy._fn(plane, ph, pw)


_digest_jit = _Lazy()
