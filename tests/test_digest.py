"""The transfer-free plane digest: numpy and device legs must agree
exactly, and any single-pixel change must be detected."""
import numpy as np

from ffmpeg_hybrid_tpu.utils.digest import (plane_digest_host,
                                            plane_digest_dev)


def test_digest_host_dev_agree():
    rng = np.random.default_rng(7)
    for shape, crop in [((64, 64), (64, 64)), ((128, 192), (100, 177)),
                        ((70, 70), (66, 66))]:
        p = rng.integers(0, 1 << 12, size=shape).astype(np.int32)
        import jax.numpy as jnp
        assert plane_digest_host(p, *crop) == \
            plane_digest_dev(jnp.asarray(p), *crop)


def test_digest_detects_change():
    rng = np.random.default_rng(8)
    p = rng.integers(0, 256, size=(64, 64)).astype(np.int32)
    base = plane_digest_host(p, 60, 60)
    for (y, x) in [(0, 0), (31, 17), (59, 59)]:
        q = p.copy()
        q[y, x] ^= 1
        assert plane_digest_host(q, 60, 60) != base
    # changes outside the crop are invisible
    q = p.copy()
    q[63, 63] ^= 255
    assert plane_digest_host(q, 60, 60) == base
