#!/usr/bin/env python3
"""Per-stage timing breakdown of the pipelined decode on the real chip.

Decodes the bench clip via decode_stream with VP9_METRICS enabled and
prints the collector summary plus wall fps. Use to find where main-
thread time goes (uploads vs dispatch vs drain) before optimizing.

    python tools/profile_stages.py [n_loops]
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ["VP9_METRICS"] = "1"


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from ffmpeg_hybrid_tpu.formats.ivf import read_ivf
    from ffmpeg_hybrid_tpu.formats.superframe import split_superframe
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
    from ffmpeg_hybrid_tpu.utils.metrics import metrics

    name = os.environ.get("BENCH_VEC", "bench_1080p")
    vec = os.path.join(ROOT, "vectors", name + ".ivf")
    loops = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    info, pkts = read_ivf(vec)
    packets = []
    for pts, data in pkts:
        packets.extend(fd for _, fd in split_superframe(data, pts))

    # warmup: one full PIPELINED pass so every executable is
    # compiled+loaded — the upload stage's fused-slicer executables
    # only exist on the pipelined path (serial decode uploads inline),
    # so a serial warmup would leave them to compile inside the timed
    # window
    dec = VP9Decoder(recon_backend="tpu")
    for f in dec.decode_stream(iter(packets)):
        if f.dev is not None:
            for p in f.dev:
                jax.block_until_ready(p)

    metrics.reset()
    metrics.enable()
    dec2 = VP9Decoder(recon_backend="tpu")

    def packet_loop():
        for _ in range(loops):
            yield from packets

    n = 0
    t0 = time.time()
    t_drain = 0.0
    for f in dec2.decode_stream(packet_loop()):
        td = time.time()
        if f.dev is not None:
            for p in f.dev:
                jax.block_until_ready(p)
        t_drain += time.time() - td
        n += 1
    dt = time.time() - t0
    print(metrics.summary())
    print(f"\nframes={n} wall={dt:.2f}s fps={n / dt:.1f} "
          f"drain={t_drain:.2f}s ({t_drain / n * 1000:.2f} ms/frame)")

    out = os.environ.get("PROFILE_OUT")
    if out:
        import json
        doc = {"vec": name, "loops": loops, "frames": n,
               "wall_s": round(dt, 3), "fps": round(n / dt, 2),
               "drain_ms_per_frame": round(t_drain / n * 1000, 3),
               "stages_ms_per_call": {
                   k: v["mean_ms"]
                   for k, v in metrics.report().items()
                   if isinstance(v, dict) and "mean_ms" in v}}
        with open(out, "w") as fh:
            json.dump(doc, fh, indent=1)
        print(f"written: {out}")


if __name__ == "__main__":
    main()
