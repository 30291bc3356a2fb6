"""Tile-column-sharded pass-B recon step over a device mesh.

The frame is split into tile-column stripes (one per "tile" mesh shard),
each shard reconstructs its stripe locally (batched inverse transforms +
per-cell MC against replicated reference planes), then exchanges the
8-pixel column halos needed by the cross-tile loop filter via
`jax.lax.ppermute` over ICI, and `psum`s the per-tile symbol-count
vectors that feed backward probability adaptation (the reference's
cross-tile count merge, vp9.c:1816-1819, becomes a collective).

The "gop" mesh axis runs the same step data-parallel over independent
frames (GOP sharding across hosts — the frame-thread analogue).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import itxfm
from ..ops import recon_tpu


def _stripe_recon(coef, eob4, txsz4, mv16, refsel, comp, filt, inter4,
                  refstack, counts, bpp=8):
    """Local recon of one tile-column stripe (runs per shard).
    coef: [H, Ws] int32; grids at matching granularities; refstack
    [3, H, W_full] replicated. Returns (stripe [H, Ws], halo left/right
    columns, summed counts)."""
    txtype4 = jnp.zeros_like(txsz4)
    residual = recon_tpu.residual_plane(coef, eob4, txsz4, txtype4, False,
                                        bpp)
    w = coef.shape[1]
    # absolute positioning of this stripe in the (replicated) ref planes:
    # fold the stripe's pixel offset into the MV x components (1/16 pel)
    px_off = jax.lax.axis_index("tile") * w
    mv16 = mv16.at[..., 0].add(px_off * 16)
    mc = recon_tpu._mc_cells(refstack, mv16, refsel, comp, filt, inter4,
                             refstack.shape[2], refstack.shape[1], bpp)
    maxp = (1 << bpp) - 1
    stripe = jnp.clip(mc + residual, 0, maxp)
    # cross-tile loop-filter halo: rightmost 8 columns go to the right
    # neighbour, leftmost 8 columns to the left neighbour (ICI ppermute)
    ntile = jax.lax.psum(1, "tile")
    right_halo = stripe[:, -8:]
    left_halo = stripe[:, :8]
    from_left = jax.lax.ppermute(
        right_halo, "tile",
        [(i, (i + 1) % ntile) for i in range(ntile)])
    from_right = jax.lax.ppermute(
        left_halo, "tile",
        [(i, (i - 1) % ntile) for i in range(ntile)])
    # per-tile symbol counts -> frame totals (backward prob adaptation
    # input; reference merges tile counts serially, we psum over ICI)
    total_counts = jax.lax.psum(counts, "tile")
    return stripe, from_left, from_right, total_counts


def sharded_frame_recon(mesh, W_full, bpp=8, mvsx=2, mvsy=2,
                        lossless=False):
    """Tile-column-sharded inter recon of ONE real frame plane.

    Built for real decoder tensors (the grids recon_tpu rebuilds from
    pass-A block records): each "tile" shard reconstructs its column
    stripe with the production kernels — full per-tile residual
    transforms (dct/adst select, dc-only path) and per-cell 8-tap MC
    against the replicated reference stack, with the stripe's pixel
    offset folded into the MV grid so gathers hit absolute positions.
    Intra and the loop filter remain frame-wide passes after stripes
    are re-joined (the reference's contract: the loop filter crosses
    tile boundaries and runs serialized, vp9.c:1441-1552)."""
    spec_px = P(None, "tile")
    spec_mv = P(None, "tile", None, None)
    spec_sel = P(None, "tile", None)
    spec_rep = P(None, None, None)

    @partial(shard_map, mesh=mesh,
             in_specs=(spec_px, spec_px, spec_px, spec_px, spec_sel,
                       spec_mv, spec_px, spec_px, spec_px, spec_rep),
             out_specs=spec_px)
    def step(coef, eob4, txsz4, txtype4, refsel, mv16, comp, filt,
             inter4, refstack):
        residual = recon_tpu.residual_plane(
            coef, eob4, txsz4, txtype4, lossless, bpp).astype(jnp.int32)
        # stripe pixel offset -> absolute ref coordinates via the MV
        # grid (1/16-pel = px * 16; the grid is pre-scale, so /mvsx)
        px_off = jax.lax.axis_index("tile") * coef.shape[1]
        mv16 = mv16.at[..., 0].add(px_off * (16 // mvsx))
        mc = recon_tpu._mc_cells(
            refstack, mv16, refsel, comp.astype(bool), filt,
            inter4.astype(bool), W_full, refstack.shape[1], bpp,
            mvsx, mvsy)
        maxp = (1 << bpp) - 1
        mcfull = jnp.clip(mc + residual[:mc.shape[0], :mc.shape[1]], 0,
                          maxp)
        mask = jnp.repeat(jnp.repeat(inter4.astype(bool), 4, 0), 4, 1)
        plane = jnp.zeros(coef.shape, jnp.int32)
        return plane.at[:mc.shape[0], :mc.shape[1]].set(
            jnp.where(mask, mcfull, plane[:mc.shape[0], :mc.shape[1]]))

    return jax.jit(step)


def sharded_recon_step(mesh, bpp=8):
    """Build the jitted tile+gop-sharded recon step for `mesh`."""
    spec_in = P("gop", None, "tile")      # [gop, H, W] striped by cols
    spec_grid = P("gop", None, "tile")
    spec_mv = P("gop", None, "tile", None, None)
    spec_rep = P("gop", None, None, None)  # refstack replicated over tile
    spec_counts = P("gop", "tile", None)

    @partial(shard_map, mesh=mesh,
             in_specs=(spec_in, spec_grid, spec_grid, spec_mv, spec_grid,
                       spec_grid, spec_grid, spec_grid, spec_rep,
                       spec_counts),
             out_specs=(spec_in, P("gop", None, "tile"),
                        P("gop", None, "tile"), spec_counts))
    def step(coef, eob4, txsz4, mv16, refsel, comp, filt, inter4,
             refstack, counts):
        # shard_map passes local blocks with the leading gop dim of size 1
        out, fl, fr, tc = _stripe_recon(
            coef[0], eob4[0], txsz4[0], mv16[0], refsel[0], comp[0],
            filt[0], inter4[0].astype(bool), refstack[0], counts[0], bpp)
        return (out[None], fl[None], fr[None], tc[None])

    return jax.jit(step)
