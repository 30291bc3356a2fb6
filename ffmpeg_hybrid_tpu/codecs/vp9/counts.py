"""Symbol counts accumulated during entropy decode, consumed by backward
probability adaptation (reference: libavcodec/vp9dec.h:191-218, vp9prob.c)."""
import numpy as np


class Counts:
    def __init__(self):
        self.y_mode = np.zeros((4, 10), np.uint32)
        self.uv_mode = np.zeros((10, 10), np.uint32)
        self.filter = np.zeros((4, 3), np.uint32)
        self.mv_mode = np.zeros((7, 4), np.uint32)
        self.intra = np.zeros((4, 2), np.uint32)
        self.comp = np.zeros((5, 2), np.uint32)
        self.single_ref = np.zeros((5, 2, 2), np.uint32)
        self.comp_ref = np.zeros((5, 2), np.uint32)
        self.tx32p = np.zeros((2, 4), np.uint32)
        self.tx16p = np.zeros((2, 3), np.uint32)
        self.tx8p = np.zeros((2, 2), np.uint32)
        self.skip = np.zeros((3, 2), np.uint32)
        self.mv_joint = np.zeros(4, np.uint32)
        self.partition = np.zeros((4, 4, 4), np.uint32)
        self.coef = np.zeros((4, 2, 2, 6, 6, 3), np.uint32)
        self.eob = np.zeros((4, 2, 2, 6, 6, 2), np.uint32)
        # mv component [2]
        self.mv_sign = np.zeros((2, 2), np.uint32)
        self.mv_classes = np.zeros((2, 11), np.uint32)
        self.mv_class0 = np.zeros((2, 2), np.uint32)
        self.mv_bits = np.zeros((2, 10, 2), np.uint32)
        self.mv_class0_fp = np.zeros((2, 2, 4), np.uint32)
        self.mv_fp = np.zeros((2, 4), np.uint32)
        self.mv_class0_hp = np.zeros((2, 2), np.uint32)
        self.mv_hp = np.zeros((2, 2), np.uint32)

    def add(self, other: "Counts"):
        """Merge another tile's counts (reference: vp9.c:1816-1819)."""
        for k, v in self.__dict__.items():
            v += other.__dict__[k]
