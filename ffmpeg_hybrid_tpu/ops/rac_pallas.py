"""On-device VP9 boolean range decoder — Pallas, multi-stream wavefront.

The bool coder is bit-serial per stream (vpx_rac.h:83-94: split compare,
subtract, renormalize), but VP9 tiles are independent entropy streams by
spec (one range coder per tile column, vp9.c:1342), so the TPU-native
form decodes S streams in LOCKSTEP on the VPU: every per-symbol scalar
op becomes an [S]-vector op, and per-lane divergence (different renorm
counts, different tree depths) is handled by predication masks rather
than branches. This is the north-star wavefront from BASELINE.json: one
lane per tile column; superblock-row wavefronts chain K-symbol calls.

State per lane mirrors the spec decoder (codecs/vp9/rac.py, the
differential reference): value < 2*range <= 510, range in [128, 255],
MSB-first bit feed. Byte fetch is gather-free: a masked compare-sum
over the stream buffer axis (VPU-friendly; O(L) per refill, fine for
tile-sized buffers — production chunks stream via double-buffered DMA).

Kernels run compiled on TPU and under `interpret=True` on CPU (tests).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


class _MultiRac:
    """Vectorized decoder over S lockstep streams; `data` is the [S, L]
    int32 byte matrix (a traced value closed over by the kernel)."""

    def __init__(self, data):
        self.data = data
        S = data.shape[0]
        z = jnp.zeros((S,), jnp.int32)
        self.S = S
        value, rng = z, jnp.full((S,), 255, jnp.int32)
        cache, cache_n, byte_pos = z, z, z
        st = (value, rng, cache, cache_n, byte_pos)
        ones = jnp.ones((S,), bool)
        v = z
        for _ in range(8):      # init: read 8 bits (rac.py __init__)
            st, b = self._next_bit(st, ones)
            v = (v << 1) | b
        self.state = (v,) + st[1:]

    def _gather_byte(self, pos, need):
        L = self.data.shape[1]
        j = jax.lax.broadcasted_iota(jnp.int32, self.data.shape, 1)
        # minor-dim insertion on int32 only (Mosaic cannot relayout a
        # bool [S] -> [S, 1] broadcast)
        need_i = need.astype(jnp.int32)[:, None]
        sel = (j == pos[:, None]) & (need_i != 0) & (pos[:, None] < L)
        return jnp.sum(jnp.where(sel, self.data, 0), axis=1)

    def _next_bit(self, state, mask):
        value, rng, cache, cache_n, byte_pos = state
        need = mask & (cache_n == 0)
        b = self._gather_byte(byte_pos, need)
        cache = jnp.where(need, b, cache)
        cache_n = jnp.where(need, 8, cache_n)
        byte_pos = jnp.where(need, byte_pos + 1, byte_pos)
        bit = jnp.where(mask, (cache >> (cache_n - 1)) & 1, 0)
        cache_n = jnp.where(mask, cache_n - 1, cache_n)
        return (value, rng, cache, cache_n, byte_pos), bit

    def get_prob(self, prob, mask):
        """Vectorized vpx_rac_get_prob on masked lanes -> bit [S]."""
        value, rng, cache, cache_n, byte_pos = self.state
        split = 1 + (((rng - 1) * prob) >> 8)
        bit = jnp.where(mask, (value >= split).astype(jnp.int32), 0)
        value = jnp.where(mask & (bit == 1), value - split, value)
        rng = jnp.where(mask, jnp.where(bit == 1, rng - split, split),
                        rng)
        st = (value, rng, cache, cache_n, byte_pos)

        def renorm(_, st):
            value, rng, cache, cache_n, byte_pos = st
            m = mask & (rng < 128)
            st2, b = self._next_bit(
                (value, rng, cache, cache_n, byte_pos), m)
            value, rng, cache, cache_n, byte_pos = st2
            value = jnp.where(m, (value << 1) | b, value)
            rng = jnp.where(m, rng << 1, rng)
            return (value, rng, cache, cache_n, byte_pos)

        # range halves at most 7x (range >= 1, target >= 128)
        self.state = jax.lax.fori_loop(0, 7, renorm, st)
        return bit

    # carrying the state through lax loops ---------------------------
    def pack(self):
        return self.state

    def unpack(self, st):
        self.state = st


def _gather_row(tab, idx, mask):
    """tab: [S, NN]; idx: [S] -> tab[s, idx[s]] (masked compare-sum)."""
    S, NN = tab.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (S, NN), 1)
    mask_i = mask.astype(jnp.int32)[:, None]
    sel = (j == idx[:, None]) & (mask_i != 0)
    return jnp.sum(jnp.where(sel, tab, 0), axis=1)


def _on_cpu():
    return jax.devices()[0].platform == "cpu"


def decode_tree_multi(data_u8, probs_u8, tree, k, max_depth=12,
                      interpret=None):
    """Decode k tree symbols from each of S independent streams.

    data_u8: [S, L] uint8 stream bytes. probs_u8: [S, NN] per-node
    probabilities. tree: [NN, 2] int32 (entry <= 0 encodes leaf -value,
    like codecs/vp9/tables trees). Returns [S, k] int32 symbol values.
    Bit-exact vs rac.py get_tree (tests/test_rac_pallas.py).
    """
    if interpret is None:
        interpret = _on_cpu()
    data = data_u8.astype(jnp.int32)
    probs = probs_u8.astype(jnp.int32)
    # pre-broadcast tree columns: a [NN, 2] block has a 2-wide lane dim
    # the TPU layout cannot slice efficiently
    import numpy as _np
    tree_np = _np.asarray(tree, _np.int32)
    S_ = data.shape[0]
    tree0_b = jnp.asarray(_np.broadcast_to(tree_np[None, :, 0],
                                           (S_, tree_np.shape[0])))
    tree1_b = jnp.asarray(_np.broadcast_to(tree_np[None, :, 1],
                                           (S_, tree_np.shape[0])))

    def kernel(data_ref, probs_ref, tree0_ref, tree1_ref, out_ref):
        data = data_ref[:]
        probs = probs_ref[:]
        S = data.shape[0]
        NN = probs.shape[1]
        rac = _MultiRac(data)
        tree0 = tree0_ref[:]
        tree1 = tree1_ref[:]

        def sym_body(i, carry):
            st, out = carry
            rac.unpack(st)
            node = jnp.zeros((S,), jnp.int32)
            done = jnp.zeros((S,), jnp.int32)  # int32: bool loop
            val = jnp.zeros((S,), jnp.int32)   # carries don't legalize

            def depth_body(_, c):
                st, node, done, val = c
                rac.unpack(st)
                active = done == 0
                p = _gather_row(probs, node, active)
                bit = rac.get_prob(p, active)
                nxt0 = _gather_row(tree0, node, active)
                nxt1 = _gather_row(tree1, node, active)
                nxt = jnp.where(bit == 1, nxt1, nxt0)
                leaf = active & (nxt <= 0)
                val = jnp.where(leaf, -nxt, val)
                done = jnp.where(leaf, 1, done)
                node = jnp.where(active & (nxt > 0), nxt, node)
                return (rac.pack(), node, done, val)

            st, _n, _d, val = jax.lax.fori_loop(
                0, max_depth, depth_body,
                (rac.pack(), node, done, val))
            # one-hot column update: dynamic lane-dim slicing needs
            # 128-alignment on TPU, a masked select does not
            sel = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1) == i
            out = jnp.where(sel, val[:, None], out)
            return (st, out)

        out = jnp.zeros((S, k), jnp.int32)
        _st, out = jax.lax.fori_loop(0, k, sym_body, (rac.pack(), out))
        out_ref[:] = out

    S = data.shape[0]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, k), jnp.int32),
        interpret=interpret,
    )(data, probs, tree0_b, tree1_b)


@partial(jax.jit, static_argnames=("interpret",))
def decode_bits_multi(data_u8, probs_seq_u8, interpret=None):
    """Decode one bit per (stream, position) with the given probability
    sequence [S, K] (128 = literal bits). Returns [S, K] int32 bits."""
    if interpret is None:
        interpret = _on_cpu()
    data = data_u8.astype(jnp.int32)
    probs_seq = probs_seq_u8.astype(jnp.int32)

    def kernel(data_ref, probs_ref, out_ref):
        data = data_ref[:]
        probs_seq = probs_ref[:]
        S, K = probs_seq.shape
        rac = _MultiRac(data)
        ones = jnp.ones((S,), bool)
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, K), 1)

        def body(i, carry):
            st, out = carry
            rac.unpack(st)
            p = jnp.sum(jnp.where(lane == i, probs_seq, 0), axis=1)
            bit = rac.get_prob(p, ones)
            out = jnp.where(lane == i, bit[:, None], out)
            return (rac.pack(), out)

        out = jnp.zeros((S, K), jnp.int32)
        _st, out = jax.lax.fori_loop(0, K, body, (rac.pack(), out))
        out_ref[:] = out

    S, K = probs_seq.shape
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, K), jnp.int32),
        interpret=interpret,
    )(data, probs_seq)
