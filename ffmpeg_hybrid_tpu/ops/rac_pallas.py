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


# ---------------------------------------------------------------------------
# batched multi-stream COEFFICIENT-block decoder
#
# Grows the prob-sequence primitive above into the data-dependent half
# of pass A: S independent streams decode one transform block each, in
# lockstep — the full decode_coeffs_b walk (EOB / zero / token cascade
# with band+nnz context from the token cache, Pareto tail cat1-6 extra
# bits, sign, dequant with the C wrap semantics) exactly as
# blockdec.decode_coeffs_block / the reference's decode_coeffs_b_generic
# (vp9block.c:805-923). Per-lane divergence (different tokens, renorm
# counts, EOB positions) is predication masks, never branches.
#
# The bool decoder here is the halfword-fed form: a 23-bit bit buffer
# refilled with one 16-bit fetch whenever it drops below 8 bits, and a
# multi-bit renormalization (shift computed from the range by compares)
# — replacing decode_tree_multi's per-bit O(L) compare-sum feed with
# one O(L/2) fetch per ~5 bools.


class _MultiRac16:
    """Vectorized bool decoder over S lanes, 16-bit buffered feed.

    half16: [S, Lh] int32 big-endian halfwords of each lane's byte
    window. State: (value, range, bitbuf, nbits, pos). Resumable: init
    from a host BoolDecoder snapshot via from_snapshot()."""

    def __init__(self, half16, state):
        self.half16 = half16
        self.state = state

    def _fetch(self, pos, need):
        Lh = self.half16.shape[1]
        j = jax.lax.broadcasted_iota(jnp.int32, self.half16.shape, 1)
        need_i = need.astype(jnp.int32)[:, None]
        sel = (j == pos[:, None]) & (need_i != 0) & (pos[:, None] < Lh)
        # beyond-end fetches return 0: the spec's zero-extension
        return jnp.sum(jnp.where(sel, self.half16, 0), axis=1)

    def get_prob(self, prob, mask):
        value, rng, bitbuf, nbits, pos = self.state
        # refill so the bit buffer covers the worst renorm (7 bits)
        need = mask & (nbits < 8)
        hw = self._fetch(pos, need)
        bitbuf = jnp.where(need, (bitbuf << 16) | hw, bitbuf)
        nbits = jnp.where(need, nbits + 16, nbits)
        pos = jnp.where(need, pos + 1, pos)
        # split compare
        split = 1 + (((rng - 1) * prob) >> 8)
        bit = jnp.where(mask, (value >= split).astype(jnp.int32), 0)
        value = jnp.where(mask & (bit == 1), value - split, value)
        rng = jnp.where(mask, jnp.where(bit == 1, rng - split, split),
                        rng)
        # multi-bit renorm: shift = 8 - bit_length(range)
        sh = ((rng < 128).astype(jnp.int32) + (rng < 64) + (rng < 32)
              + (rng < 16) + (rng < 8) + (rng < 4) + (rng < 2))
        sh = jnp.where(mask, sh, 0)
        take = (bitbuf >> (nbits - sh)) & ((1 << sh) - 1)
        value = (value << sh) | take
        rng = rng << sh
        nbits = nbits - sh
        self.state = (value, rng, bitbuf, nbits, pos)
        return bit

    def pack(self):
        return self.state

    def unpack(self, st):
        self.state = st


def snapshot_to_state(snaps, windows_start):
    """Host: BoolDecoder snapshots -> _MultiRac16 initial state arrays.

    snaps: list of (data, byte_pos, bit_pos, value, range) per lane;
    windows_start[s] must equal byte_pos + (1 if bit_pos else 0) — the
    byte window each lane's halfword matrix was packed from. Returns
    (value, range, bitbuf, nbits) int32 [S] (pos starts at 0)."""
    import numpy as _np
    S = len(snaps)
    value = _np.zeros(S, _np.int32)
    rng = _np.zeros(S, _np.int32)
    bitbuf = _np.zeros(S, _np.int32)
    nbits = _np.zeros(S, _np.int32)
    for s, (data, byte_pos, bit_pos, val, r) in enumerate(snaps):
        value[s] = val
        rng[s] = r
        if bit_pos:
            rem = 8 - bit_pos
            cur = data[byte_pos] if byte_pos < len(data) else 0
            bitbuf[s] = cur & ((1 << rem) - 1)
            nbits[s] = rem
        assert windows_start[s] == byte_pos + (1 if bit_pos else 0)
    return value, rng, bitbuf, nbits


def pack_windows(datas, starts, Lw=None):
    """Host: per-lane byte windows -> big-endian halfword matrix
    [S, Lw//2] int32 (zero-padded; beyond-end reads are the spec's
    zero-extension)."""
    import numpy as _np
    S = len(datas)
    if Lw is None:
        Lw = max(len(d) - st for d, st in zip(datas, starts))
    Lw = (Lw + 1) & ~1
    buf = _np.zeros((S, Lw), _np.uint8)
    for s, (d, st) in enumerate(zip(datas, starts)):
        w = bytes(d[st:st + Lw])
        buf[s, :len(w)] = _np.frombuffer(w, _np.uint8)
    return ((buf[:, 0::2].astype(_np.int32) << 8)
            | buf[:, 1::2].astype(_np.int32))


def band_table(n):
    """band index in effect at each scan position (clamped to 5)."""
    import numpy as _np
    tx = {16: 0, 64: 1, 256: 2, 1024: 3}[n]
    from ..codecs.vp9.blockdec import BAND_COUNTS
    counts = BAND_COUNTS[tx]
    out = _np.zeros(n, _np.int32)
    band, left = 0, counts[0]
    for i in range(n):
        out[i] = min(band, 5)
        left -= 1
        if not left and band < 5:
            band += 1
            left = counts[band]
    return out


# cat6 extra-bit probability ladders per bit depth (vp9block.c:876-899)
_CAT6_PROBS = {
    8: [254, 254, 254, 252, 249, 243, 230, 196, 177, 153, 140, 133,
        130, 129],
    10: [255, 255, 254, 254, 254, 252, 249, 243, 230, 196, 177, 153,
         140, 133, 130, 129],
    12: [255, 255, 255, 255, 254, 254, 254, 252, 249, 243, 230, 196,
         177, 153, 140, 133, 130, 129],
}


def _coef_kernel_body(half16, value0, rng0, bitbuf0, nbits0, probs,
                      scan, nb0, nb1, nnz0, qmul, band_b, n, bpp,
                      is32):
    """The whole per-block coefficient walk, S lanes in lockstep."""
    S = half16.shape[0]
    rac = _MultiRac16(half16, (value0, rng0, bitbuf0, nbits0,
                               jnp.zeros((S,), jnp.int32)))
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (S, n), 1)
    cat6 = _CAT6_PROBS[bpp]

    def probs_row(band, ctx, mask):
        """probs: [S, 36, 11] -> row [S, 11] at band*6+ctx.
        (Mosaic can't minor-dim-expand i1 vectors: keep the one-hot in
        int32 and select by multiply.)"""
        idx = band * 6 + ctx
        j = jax.lax.broadcasted_iota(jnp.int32, (S, 36), 1)
        sel = ((j == idx[:, None])
               & (mask.astype(jnp.int32)[:, None] != 0))
        return jnp.sum(probs * sel.astype(jnp.int32)[:, :, None],
                       axis=1)

    def gath(tab, i):
        """tab [S, n] -> column i (i is a traced scalar)."""
        return jnp.sum(jnp.where(lane_n == i, tab, 0), axis=1)

    def cache_at(cache, idx, mask):
        sel = (lane_n == idx[:, None]) \
            & (mask.astype(jnp.int32)[:, None] != 0)
        return jnp.sum(jnp.where(sel, cache, 0), axis=1)

    def body(i, carry):
        st, cache, out, skip_eob, ctx, done, count = carry
        rac.unpack(st)
        alive = done == 0
        sc = gath(scan, i)
        # band_b[i] with a traced i lowers to dynamic_slice, which the
        # Pallas TPU backend can't lower — one-hot reduce instead
        band = jnp.sum(jnp.where(
            jax.lax.iota(jnp.int32, band_b.shape[0]) == i, band_b, 0))
        tp = probs_row(jnp.full((S,), band, jnp.int32), ctx, alive)

        def tpk(k):
            return tp[:, k]

        # 1. EOB bit (skipped right after a zero token)
        m_eob = alive & (skip_eob == 0)
        b = rac.get_prob(tpk(0), m_eob)
        hit = m_eob & (b == 0)
        done = jnp.where(hit, 1, done)
        alive = alive & ~hit
        # 2. zero bit
        z = rac.get_prob(tpk(1), alive)
        is_zero = alive & (z == 0)
        nonzero = alive & (z == 1)
        # 3. token cascade
        b_one = rac.get_prob(tpk(2), nonzero)
        m_one = nonzero & (b_one == 0)
        m_big = nonzero & (b_one == 1)
        b3 = rac.get_prob(tpk(3), m_big)
        m_234 = m_big & (b3 == 0)
        b4 = rac.get_prob(tpk(4), m_234)
        m_2 = m_234 & (b4 == 0)
        m_34 = m_234 & (b4 == 1)
        b5 = rac.get_prob(tpk(5), m_34)
        m_cat = m_big & (b3 == 1)
        b6 = rac.get_prob(tpk(6), m_cat)
        m_c12 = m_cat & (b6 == 0)
        b7 = rac.get_prob(tpk(7), m_c12)
        m_c1 = m_c12 & (b7 == 0)
        e1 = rac.get_prob(jnp.int32(159), m_c1)
        m_c2 = m_c12 & (b7 == 1)
        e2a = rac.get_prob(jnp.int32(165), m_c2)
        e2b = rac.get_prob(jnp.int32(145), m_c2)
        m_c36 = m_cat & (b6 == 1)
        b8 = rac.get_prob(tpk(8), m_c36)
        m_c34 = m_c36 & (b8 == 0)
        b9 = rac.get_prob(tpk(9), m_c34)
        m_c3 = m_c34 & (b9 == 0)
        c3a = rac.get_prob(jnp.int32(173), m_c3)
        c3b = rac.get_prob(jnp.int32(148), m_c3)
        c3c = rac.get_prob(jnp.int32(140), m_c3)
        m_c4 = m_c34 & (b9 == 1)
        c4a = rac.get_prob(jnp.int32(176), m_c4)
        c4b = rac.get_prob(jnp.int32(155), m_c4)
        c4c = rac.get_prob(jnp.int32(140), m_c4)
        c4d = rac.get_prob(jnp.int32(135), m_c4)
        m_c56 = m_c36 & (b8 == 1)
        b10 = rac.get_prob(tpk(10), m_c56)
        m_c5 = m_c56 & (b10 == 0)
        c5a = rac.get_prob(jnp.int32(180), m_c5)
        c5b = rac.get_prob(jnp.int32(157), m_c5)
        c5c = rac.get_prob(jnp.int32(141), m_c5)
        c5d = rac.get_prob(jnp.int32(134), m_c5)
        c5e = rac.get_prob(jnp.int32(130), m_c5)
        m_c6 = m_c56 & (b10 == 1)
        v6 = jnp.full((S,), 67, jnp.int32)
        nb_bits = len(cat6)
        for k, p in enumerate(cat6):
            bk = rac.get_prob(jnp.int32(p), m_c6)
            v6 = v6 + (bk << (nb_bits - 1 - k))
        # value per mask
        val = jnp.zeros((S,), jnp.int32)
        val = jnp.where(m_one, 1, val)
        val = jnp.where(m_2, 2, val)
        val = jnp.where(m_34, 3 + b5, val)
        val = jnp.where(m_c1, 5 + e1, val)
        val = jnp.where(m_c2, 7 + (e2a << 1) + e2b, val)
        val = jnp.where(m_c3, 11 + (c3a << 2) + (c3b << 1) + c3c, val)
        val = jnp.where(m_c4, 19 + (c4a << 3) + (c4b << 2)
                        + (c4c << 1) + c4d, val)
        val = jnp.where(m_c5, 35 + (c5a << 4) + (c5b << 3) + (c5c << 2)
                        + (c5d << 1) + c5e, val)
        val = jnp.where(m_c6, v6, val)
        # sign + dequant (C semantics: int32 wraparound product, 32x32
        # pre-divided by 2 truncating toward 0, int16 wrap at 8bpp)
        sgn = rac.get_prob(jnp.int32(128), nonzero)
        sv = jnp.where(sgn == 1, -val, val)
        q = jnp.where(i == 0, qmul[:, 0], qmul[:, 1])
        prod = sv * q
        if is32:
            prod = jnp.where(prod < 0, -((-prod) >> 1), prod >> 1)
        if bpp == 8:
            prod = ((prod + 0x8000) & 0xFFFF) - 0x8000
        # energy class for the token cache
        energy = jnp.zeros((S,), jnp.int32)
        energy = jnp.where(m_one, 1, energy)
        energy = jnp.where(m_2, 2, energy)
        energy = jnp.where(m_34, 3, energy)
        energy = jnp.where(m_c12, 4, energy)
        energy = jnp.where(m_c36, 5, energy)
        # scatter cache + output at raster position sc (expand bool
        # lane masks via int32 — Mosaic can't minor-dim-expand i1)
        sel = lane_n == sc[:, None]
        proc = is_zero | nonzero
        proc2 = proc.astype(jnp.int32)[:, None] != 0
        nz2 = nonzero.astype(jnp.int32)[:, None] != 0
        cache = jnp.where(sel & proc2, energy[:, None], cache)
        out = jnp.where(sel & nz2, prod[:, None], out)
        # next-position context from the token cache via the nb table
        nv0 = cache_at(cache, gath(nb0, i), proc)
        nv1 = cache_at(cache, gath(nb1, i), proc)
        ctx = jnp.where(proc, (1 + nv0 + nv1) >> 1, ctx)
        skip_eob = jnp.where(alive, is_zero.astype(jnp.int32),
                             skip_eob)
        count = jnp.where(proc, i + 1, count)
        return (rac.pack(), cache, out, skip_eob, ctx, done, count)

    z = jnp.zeros((S,), jnp.int32)
    carry = ((value0, rng0, bitbuf0, nbits0, z),
             jnp.zeros((S, n), jnp.int32),      # token cache
             jnp.zeros((S, n), jnp.int32),      # coef out (raster)
             z, nnz0.astype(jnp.int32), z, z)
    carry = jax.lax.fori_loop(0, n, body, carry)
    _st, _cache, out, _sk, _ctx, _done, count = carry
    return out, count


@partial(jax.jit, static_argnames=("n", "bpp", "is32", "interpret"))
def decode_coeffs_multi(half16, value0, rng0, bitbuf0, nbits0, probs,
                        scan, nb0, nb1, nnz0, qmul, n, bpp, is32,
                        interpret=None):
    """Decode one transform block's coefficients per lane, S lanes in
    lockstep.

    half16: [S, Lh] int32 halfword windows (pack_windows). value0/rng0/
    bitbuf0/nbits0: [S] resumable bool state (snapshot_to_state).
    probs: [S, 36, 11] int32 — probs11[band][ctx] rows flattened to
    band*6+ctx. scan/nb0/nb1: [S, n] int32 per-lane scan order and
    neighbor tables (SCANS / SCANS_NB for each lane's tx/txtype).
    nnz0: [S] initial nnz context. qmul: [S, 2] (dc, ac) dequant.
    Returns (coef [S, n] int32 in raster order within the block,
    eob [S] int32). Bit-exact vs blockdec.decode_coeffs_block
    (tests/test_coef_pallas.py)."""
    if interpret is None:
        interpret = _on_cpu()
    band_np = band_table(n)
    S = half16.shape[0]

    def kernel(h_ref, v_ref, r_ref, bb_ref, nb_ref, p_ref, sc_ref,
               n0_ref, n1_ref, nz_ref, q_ref, bt_ref, out_ref,
               eob_ref):
        out, eob = _coef_kernel_body(
            h_ref[:], v_ref[:], r_ref[:], bb_ref[:], nb_ref[:],
            p_ref[:], sc_ref[:], n0_ref[:], n1_ref[:], nz_ref[:],
            q_ref[:], bt_ref[:], n, bpp, is32)
        out_ref[:] = out
        eob_ref[:] = eob

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S, n), jnp.int32),
                   jax.ShapeDtypeStruct((S,), jnp.int32)),
        interpret=interpret,
    )(half16, value0, rng0, bitbuf0, nbits0, probs, scan, nb0, nb1,
      nnz0, qmul, jnp.asarray(band_np))
