"""Checkpoint/resume: a decoder restored from state_dict mid-stream must
continue bit-exactly (reference state analogue: ref slots + prob
contexts + segmap/mv frames, vp9dec.h:143-146, vp9shared.h:66-77)."""
import hashlib
import io
import os

import numpy as np
import pytest

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")


def _packets(name):
    from ffmpeg_hybrid_tpu.formats.ivf import read_ivf
    from ffmpeg_hybrid_tpu.formats.superframe import split_superframe

    _info, pkts = read_ivf(os.path.join(VEC_DIR, name + ".ivf"))
    out = []
    for pts, data in pkts:
        out.extend(fd for _f, fd in split_superframe(data, pts))
    return out


def _md5s(frames):
    return [hashlib.md5(f.to_bytes()).hexdigest() for f in frames]


@pytest.mark.parametrize("name,cut", [
    ("inter_176x144_10f", 5),   # mid-GOP: prob adaptation state matters
    ("mini_scaled", 1),         # refs of a different size than the frame
    ("superframe", 2),          # invisible-frame slot state
    ("mini_seg_128x72", 1),     # segmentation map carried in slots
])
@pytest.mark.parametrize("backend", ["tpu"])
def test_resume_matches_straight_decode(name, cut, backend):
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
    from ffmpeg_hybrid_tpu.codecs.vp9 import checkpoint

    if not os.path.exists(os.path.join(VEC_DIR, name + ".ivf")):
        pytest.skip("vector not generated")
    packets = _packets(name)
    if cut >= len(packets):
        pytest.skip("clip too short for this cut")

    dec = VP9Decoder(recon_backend=backend)
    straight = []
    for i, fd in enumerate(packets):
        straight.extend(dec.decode(fd))
        if i + 1 == cut:
            # snapshot AFTER frame `cut` — sync_host inside must not
            # disturb the continuing decoder
            state = checkpoint.state_dict(dec)
    straight_md5 = _md5s(straight)

    # round-trip the state through npz to prove it is pure arrays
    buf = io.BytesIO()
    np.savez(buf, state=np.array([state], dtype=object))
    buf.seek(0)
    state2 = np.load(buf, allow_pickle=True)["state"][0]

    dec2 = VP9Decoder(recon_backend=backend)
    checkpoint.load_state_dict(dec2, state2)
    resumed = []
    for fd in packets[cut:]:
        resumed.extend(dec2.decode(fd))
    n_tail = len(resumed)
    assert _md5s(resumed) == straight_md5[len(straight_md5) - n_tail:]


def test_checkpoint_counts_frames_once():
    """Aliased slots (cur_frame also in refs) must serialize once."""
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
    from ffmpeg_hybrid_tpu.codecs.vp9 import checkpoint

    packets = _packets("inter_64_5f")
    dec = VP9Decoder(recon_backend="tpu")
    for fd in packets[:2]:
        dec.decode(fd)
    state = checkpoint.state_dict(dec)
    live = {id(f) for f in dec.refs + [dec.cur_frame, dec.mvpair_frame,
                                       dec.segmap_frame] if f is not None}
    assert len(state["frames"]) == len(live)
