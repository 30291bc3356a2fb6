"""Runtime configuration: every FFH_* / BENCH_* / VP9_* knob in one
documented dataclass (the AVOption-table equivalent of the reference's
per-component options).

All knobs come from environment variables once at first access (so
subprocess workers inherit behavior), but code reads them through
`get_config()` — tests can inject overrides with `set_config`.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional


def _env_bool(name):
    return os.environ.get(name, "").lower() not in ("", "0", "false")


def _env_int(name, default):
    v = os.environ.get(name)
    return default if v in (None, "") else int(v)


def _env_float(name, default):
    v = os.environ.get(name)
    return default if v in (None, "") else float(v)


@dataclass
class Config:
    # ---- decode path ----
    # MC kernel: "mxu" (one-hot matmul, ops/mc_mxu.py — measured 3.5x
    # the gather path on TPU, KERNEL_BENCH.json) / "gather"
    # (recon_tpu._mc_cells) / None = auto (mxu on TPU, gather on CPU).
    mc_impl: Optional[str] = None
    # loop-filter kernel: "dense" (slice wavefront, ops/lpf_dense.py —
    # measured 1.4x the scan on TPU) / "scan" (lpf_tpu._lf_scan) /
    # None = auto (dense on TPU, scan on CPU).
    lf_impl: Optional[str] = None
    # pass-A implementation: "device" routes keyframe/intra-only
    # frames through the on-device lockstep walk (ops/passa_device)
    # when the decoder runs without the native library; None = host.
    passa_impl: Optional[str] = None
    # per-stage timing collection (utils/metrics.py; also enabled by
    # metrics.enable())
    metrics: bool = False

    # ---- bench.py ----
    bench_vec: str = "bench_1080p"        # primary clip
    bench_budget_s: float = 75.0          # timed-window budget
    bench_trials: int = 5                 # windows (median reported)
    bench_guard_s: float = 2400.0         # wall guard before 4K leg
    bench_verify_frames: int = 30         # conformance-gate frames
    bench_verify_frames_4k: int = 12
    bench_verify_timeout_s: float = 1500.0
    bench_skip_4k: bool = False
    bench_phase: Optional[str] = None     # internal: "verify" subproc

    # ---- tests ----
    full_tpu_e2e: bool = False            # run bench_1080p on CPU-jax

    @classmethod
    def from_env(cls) -> "Config":
        return cls(
            mc_impl=os.environ.get("FFH_MC") or None,
            lf_impl=os.environ.get("FFH_LF") or None,
            passa_impl=os.environ.get("FFH_PASSA") or None,
            metrics=_env_bool("VP9_METRICS"),
            bench_vec=os.environ.get("BENCH_VEC", "bench_1080p"),
            bench_budget_s=_env_float("BENCH_BUDGET_S", 75.0),
            bench_trials=_env_int("BENCH_TRIALS", 5),
            bench_guard_s=_env_float("BENCH_GUARD_S", 2400.0),
            bench_verify_frames=_env_int("BENCH_VERIFY_FRAMES", 30),
            bench_verify_frames_4k=_env_int("BENCH_VERIFY_FRAMES_4K",
                                            12),
            bench_verify_timeout_s=_env_float("BENCH_VERIFY_TIMEOUT_S",
                                              1500.0),
            bench_skip_4k=_env_bool("BENCH_SKIP_4K"),
            bench_phase=os.environ.get("BENCH_PHASE") or None,
            full_tpu_e2e=_env_bool("FULL_TPU_E2E"),
        )


_config: Optional[Config] = None


def get_config() -> Config:
    global _config
    if _config is None:
        _config = Config.from_env()
    return _config


def set_config(cfg: Optional[Config]):
    """Inject a config (tests); None resets to lazy env re-read."""
    global _config
    _config = cfg
