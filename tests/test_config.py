"""utils/config.py: env sourcing, injection, and the decode-path
knobs actually routing through it."""
import os

from ffmpeg_hybrid_tpu.utils.config import Config, get_config, set_config


def test_defaults():
    set_config(None)
    cfg = Config()
    assert cfg.mc_impl is None and cfg.lf_impl is None
    assert cfg.bench_vec == "bench_1080p"
    assert cfg.bench_trials == 5


def test_from_env(monkeypatch):
    monkeypatch.setenv("FFH_MC", "gather")
    monkeypatch.setenv("FFH_LF", "dense")
    monkeypatch.setenv("BENCH_TRIALS", "5")
    monkeypatch.setenv("BENCH_SKIP_4K", "1")
    cfg = Config.from_env()
    assert cfg.mc_impl == "gather"
    assert cfg.lf_impl == "dense"
    assert cfg.bench_trials == 5
    assert cfg.bench_skip_4k is True


def test_injection_roundtrip():
    try:
        set_config(Config(mc_impl="mxu"))
        assert get_config().mc_impl == "mxu"
    finally:
        set_config(None)
    # lazy re-read after reset
    assert get_config().bench_vec in ("bench_1080p",
                                      os.environ.get("BENCH_VEC",
                                                     "bench_1080p"))
    set_config(None)
