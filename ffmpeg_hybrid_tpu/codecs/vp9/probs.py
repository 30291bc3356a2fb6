"""VP9 probability state: per-frame-context model probabilities.

Mirrors the reference's ProbContext + coef probs
(reference: libavcodec/vp9dec.h:56-81, 125-131, 143-146) as numpy arrays.
"""
from __future__ import annotations

import numpy as np

from . import tables as T


class Probs:
    """One frame-context's worth of model probabilities (ProbContext + coef).

    coef has shape (4 txsz, 2 plane-type, 2 is-inter, 6 band, 6 ctx, 3 probs);
    the 8-entry pareto tail is materialized separately during decode.
    """

    FIELDS = (
        "y_mode", "uv_mode", "filter", "mv_mode", "intra", "comp",
        "single_ref", "comp_ref", "tx32p", "tx16p", "tx8p", "skip",
        "mv_joint", "partition",
        # mv component fields, [2] leading dim = component (row/col)
        "mv_sign", "mv_classes", "mv_class0", "mv_bits", "mv_class0_fp",
        "mv_fp", "mv_class0_hp", "mv_hp",
    )

    def __init__(self):
        self.y_mode = np.zeros((4, 9), np.uint8)
        self.uv_mode = np.zeros((10, 9), np.uint8)
        self.filter = np.zeros((4, 2), np.uint8)
        self.mv_mode = np.zeros((7, 3), np.uint8)
        self.intra = np.zeros(4, np.uint8)
        self.comp = np.zeros(5, np.uint8)
        self.single_ref = np.zeros((5, 2), np.uint8)
        self.comp_ref = np.zeros(5, np.uint8)
        self.tx32p = np.zeros((2, 3), np.uint8)
        self.tx16p = np.zeros((2, 2), np.uint8)
        self.tx8p = np.zeros(2, np.uint8)
        self.skip = np.zeros(3, np.uint8)
        self.mv_joint = np.zeros(3, np.uint8)
        self.partition = np.zeros((4, 4, 3), np.uint8)
        self.mv_sign = np.zeros(2, np.uint8)
        self.mv_classes = np.zeros((2, 10), np.uint8)
        self.mv_class0 = np.zeros(2, np.uint8)
        self.mv_bits = np.zeros((2, 10), np.uint8)
        self.mv_class0_fp = np.zeros((2, 2, 3), np.uint8)
        self.mv_fp = np.zeros((2, 3), np.uint8)
        self.mv_class0_hp = np.zeros(2, np.uint8)
        self.mv_hp = np.zeros(2, np.uint8)
        self.coef = np.zeros((4, 2, 2, 6, 6, 3), np.uint8)

    @classmethod
    def defaults(cls) -> "Probs":
        p = cls()
        p.y_mode[:] = T.PROBS_Y_MODE
        p.uv_mode[:] = T.PROBS_UV_MODE
        p.filter[:] = T.PROBS_FILTER
        p.mv_mode[:] = T.PROBS_MV_MODE
        p.intra[:] = T.PROBS_INTRA
        p.comp[:] = T.PROBS_COMP
        p.single_ref[:] = T.PROBS_SINGLE_REF
        p.comp_ref[:] = T.PROBS_COMP_REF
        p.tx32p[:] = T.PROBS_TX32P
        p.tx16p[:] = T.PROBS_TX16P
        p.tx8p[:] = T.PROBS_TX8P
        p.skip[:] = T.PROBS_SKIP
        p.mv_joint[:] = T.PROBS_MV_JOINT
        p.partition[:] = T.PROBS_PARTITION
        for c in (0, 1):
            p.mv_sign[c] = T.__dict__[f"MV_COMP{c}_SIGN"][0]
            p.mv_classes[c] = T.__dict__[f"MV_COMP{c}_CLASSES"]
            p.mv_class0[c] = T.__dict__[f"MV_COMP{c}_CLASS0"][0]
            p.mv_bits[c] = T.__dict__[f"MV_COMP{c}_BITS"]
            p.mv_class0_fp[c] = T.__dict__[f"MV_COMP{c}_CLASS0_FP"]
            p.mv_fp[c] = T.__dict__[f"MV_COMP{c}_FP"]
            p.mv_class0_hp[c] = T.__dict__[f"MV_COMP{c}_CLASS0_HP"][0]
            p.mv_hp[c] = T.__dict__[f"MV_COMP{c}_HP"][0]
        p.coef[:] = T.DEFAULT_COEF_PROBS
        return p

    def copy(self) -> "Probs":
        p = Probs()
        self.copy_into(p)
        return p

    def copy_into(self, p: "Probs") -> "Probs":
        """In-place copy (the decoder reuses pooled Probs slots so the
        native pass A's cached pointers stay valid across frames)."""
        for f in self.FIELDS:
            getattr(p, f)[...] = getattr(self, f)
        p.coef[...] = self.coef
        return p


def coef_full(coef3: np.ndarray, out: np.ndarray = None) -> np.ndarray:
    """Expand 3-entry coefficient probs to the 11-entry form with the
    pareto tail (reference: vp9.c:975 memcpy of ff_vp9_model_pareto8)."""
    if out is None:
        out = np.zeros(coef3.shape[:-1] + (11,), np.uint8)
    out[..., :3] = coef3
    out[..., 3:] = T.MODEL_PARETO8[coef3[..., 2]]
    return out
