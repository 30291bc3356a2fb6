"""Batched multi-stream coefficient decoder (ops/rac_pallas.py
decode_coeffs_multi) vs the host reference walk, on REAL tile payloads.

A real stream (mini_encoder keyframe, all tx sizes, rich tokens) is
decoded by the pure-Python pass A with decode_coeffs_block wrapped to
snapshot, per transform block: the bool-decoder state at the block's
coefficient start, the prob slice, scan/nb tables, initial nnz context
and dequant pair — plus the reference result (dequantized coefficients
and eob). The device kernel then re-decodes every block from those
snapshots, S lanes in lockstep, and must match bit-exactly.
"""
import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _capture_blocks(pkt, monkeypatch):
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
    from ffmpeg_hybrid_tpu.codecs.vp9.blockdec import TileDecoder

    caps = []
    orig = TileDecoder.decode_coeffs_block

    def wrapper(self, plane_coef, py, px, tx, is32, probs11, nnz, scan,
                nb, band_counts, qmul, cnt, eobcnt):
        c = self.c
        snap = (c.data, c.byte_pos, c.bit_pos, c.value, c.range)
        eob = orig(self, plane_coef, py, px, tx, is32, probs11, nnz,
                   scan, nb, band_counts, qmul, cnt, eobcnt)
        sz = 4 << tx
        n = sz * sz
        caps.append({
            "snap": snap, "tx": tx, "is32": bool(is32),
            "probs": np.asarray(probs11, np.int32).reshape(36, 11),
            "nnz": int(nnz),
            "scan": np.asarray(scan[:n], np.int32),
            "nb": np.asarray(nb[:n], np.int32).reshape(n, 2),
            "qmul": np.asarray(qmul[:2], np.int32),
            "coef": np.asarray(plane_coef[py:py + sz, px:px + sz],
                               np.int64).reshape(-1),
            "eob": int(eob),
        })
        return eob

    monkeypatch.setattr(TileDecoder, "decode_coeffs_block", wrapper)
    dec = VP9Decoder(recon_backend="golden", use_native=False)
    dec.decode_pass_a(pkt)
    monkeypatch.setattr(TileDecoder, "decode_coeffs_block", orig)
    return caps


def _run_group(group, bpp, max_lanes=8):
    import jax.numpy as jnp
    from ffmpeg_hybrid_tpu.ops.rac_pallas import (
        decode_coeffs_multi, pack_windows, snapshot_to_state)

    group = group[:max_lanes]
    S = len(group)
    tx = group[0]["tx"]
    n = (4 << tx) ** 2
    starts = [g["snap"][1] + (1 if g["snap"][2] else 0) for g in group]
    # window bound: a block consumes far less than n*4 bytes
    Lw = min(max(len(g["snap"][0]) - st
                 for g, st in zip(group, starts)), 4 * n + 64)
    half16 = pack_windows([g["snap"][0] for g in group], starts, Lw)
    value0, rng0, bitbuf0, nbits0 = snapshot_to_state(
        [g["snap"] for g in group], starts)
    probs = np.stack([g["probs"] for g in group])
    scan = np.stack([g["scan"] for g in group])
    nb0 = np.stack([g["nb"][:, 0] for g in group])
    nb1 = np.stack([g["nb"][:, 1] for g in group])
    nnz0 = np.asarray([g["nnz"] for g in group], np.int32)
    qmul = np.stack([g["qmul"] for g in group])

    coef, eob = decode_coeffs_multi(
        jnp.asarray(half16), jnp.asarray(value0), jnp.asarray(rng0),
        jnp.asarray(bitbuf0), jnp.asarray(nbits0), jnp.asarray(probs),
        jnp.asarray(scan), jnp.asarray(nb0), jnp.asarray(nb1),
        jnp.asarray(nnz0), jnp.asarray(qmul), n=n, bpp=bpp,
        is32=group[0]["is32"])
    coef = np.asarray(coef)
    eob = np.asarray(eob)
    for s, g in enumerate(group):
        assert eob[s] == g["eob"], \
            f"lane {s} tx={tx}: eob {eob[s]} != {g['eob']}"
        assert np.array_equal(coef[s], g["coef"]), \
            f"lane {s} tx={tx}: coef mismatch at " \
            f"{np.nonzero(coef[s] != g['coef'])[0][:4]}"
    return S


@pytest.mark.parametrize("bpp", [8, 10])
def test_coef_multi_vs_reference(bpp, monkeypatch):
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import encode_keyframe_random
    finally:
        sys.path.pop(0)
    pkt = encode_keyframe_random(128, 128, bpp=bpp, seed=3, txfmmode=3,
                                 yac_qi=60, filter_level=0)
    caps = _capture_blocks(pkt, monkeypatch)
    assert len(caps) > 20
    by_tx = {}
    for c in caps:
        by_tx.setdefault(c["tx"], []).append(c)
    checked = 0
    for tx in sorted(by_tx):
        checked += _run_group(by_tx[tx], bpp,
                              max_lanes=8 if tx < 3 else 4)
    assert checked >= 8
    # every tx size must have been exercised
    assert set(by_tx) == {0, 1, 2, 3}
