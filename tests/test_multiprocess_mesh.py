"""Multi-process (multi-controller) device mesh: the sharded pass-B
step compiled and executed across TWO OS processes coordinated by
`jax.distributed.initialize`, with the TILE axis deliberately laid out
ACROSS the process boundary so the loop filter's per-wave ppermute
halo exchanges cross it (the DCN-boundary path on a real multi-host
pod; the contract replacing the reference's cross-thread state
forwarding, pthread_frame.c:501). Each process verifies its
addressable output shards bit-exact against the serial golden decode.

SURVEY §4.3's simulated 2-host CI run."""
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")

CHILD = r"""
import os, sys, pickle
port, pid_s, streamf = sys.argv[1], sys.argv[2], sys.argv[3]
pid = int(pid_s)
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)
from jax.sharding import Mesh, NamedSharding
sys.path.insert(0, os.environ["REPO_ROOT"])
from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
from ffmpeg_hybrid_tpu.parallel import fullframe

with open(streamf, "rb") as f:
    frames = pickle.load(f)

# serial golden truth (deterministic, recomputed per process)
ser = VP9Decoder(recon_backend="golden")
truth = []
for d in frames:
    js = ser.decode_pass_a(d)
    ser.decode_pass_b(js)
    truth.append(js.cur_frame_obj)

shd = VP9Decoder(recon_backend="golden")
jobs = [shd.decode_pass_a(d) for d in frames]
kf_job, inter_jobs = jobs[0], jobs[1:]
# chain: install serial keyframe pixels as the sharded refs' source
# (the keyframe itself is serial here; the mesh step under test is
# the inter-frame gop x tile decode)
shd.decode_pass_b(kf_job)

devs = np.array(jax.devices())          # 8 global, 4 per process
assert len(devs) == 8, len(devs)
# tile axis ACROSS processes: row g = [g, 2+g, 4+g, 6+g] interleaves
# the two processes along "tile", so LF halo ppermutes cross the
# process boundary every wave step
mesh = Mesh(devs.reshape(4, 2).T, ("gop", "tile"))
gop, ntile = 2, 4

tensors, cfg, slab_cfg, built, reals = fullframe.prepare_gop_tensors(
    inter_jobs, ntile)
step, names = fullframe.build_sharded_step(mesh, cfg, slab_cfg)

def make_global(arr, spec):
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr.shape, sh, lambda idx: arr[idx])

put = [make_global(tensors[n], fullframe.put_spec(n, tensors[n].ndim))
       for n in names]
y, u, v = step(*put)
jax.block_until_ready((y, u, v))

# verify THIS process's addressable shards against serial truth
x0s = tensors["x0"]; x0us = tensors["x0u"]
wrs = tensors["wreal"]; wrus = tensors["wrealu"]
nbad = nsh = 0
for out, pix_x0, pix_w, pi in ((y, x0s, wrs, 0), (u, x0us, wrus, 1),
                               (v, x0us, wrus, 2)):
    for shard in out.addressable_shards:
        g, t = shard.index[0].start or 0, shard.index[1].start or 0
        fr = truth[1 + g]
        Hyr = reals[g][0] if pi == 0 else reals[g][2]
        cw = ((fr.size[0] + 7) >> 3) * 8
        ch = ((fr.size[1] + 7) >> 3) * 8
        pw = cw if pi == 0 else cw >> fr.ss_h
        ph = ch if pi == 0 else ch >> fr.ss_v
        x0 = int(pix_x0[g, t]); w = int(pix_w[g, t])
        a = np.asarray(fr.planes[pi][:ph, x0:min(x0 + w, pw)])
        b = np.asarray(shard.data)[0, 0][:ph, :a.shape[1]]
        nsh += 1
        if not np.array_equal(a, b):
            nbad += 1
            print(f"P{pid} shard g={g} t={t} plane {pi}: MISMATCH",
                  flush=True)
print(f"P{pid}: {nsh} shards checked, {nbad} bad", flush=True)
sys.exit(1 if nbad or nsh == 0 else 0)
"""


def test_two_process_mesh(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    try:
        from mini_encoder import (encode_keyframe_random,
                                  encode_inter_flex)
    finally:
        sys.path.pop(0)
    import pickle
    w, h = 1024, 128     # 4 tile cols x 256 px (VP9 min tile width)
    kf = encode_keyframe_random(w, h, seed=5, filter_level=24,
                                tile_cols_log2=2)
    inters = [
        encode_inter_flex(w, h, seed=30 + g, refresh_mask=0,
                          filter_level=18 + 7 * g, coeffs=True,
                          p_intra=0.2, mv_mags=(0, 2, 4, 8, 16),
                          tile_cols_log2=2)
        for g in range(2)
    ]
    streamf = tmp_path / "frames.pkl"
    with open(streamf, "wb") as f:
        pickle.dump([kf] + inters, f)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["REPO_ROOT"] = os.path.abspath(ROOT)
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", CHILD, str(port), str(pid),
         str(streamf)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    ok = True
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode(errors="replace"))
        ok &= p.returncode == 0
    if not ok:
        raise AssertionError(
            "multi-process mesh run failed:\n"
            + "\n---\n".join(outs[-2:]))
    assert "0 bad" in outs[0] and "0 bad" in outs[1], outs
