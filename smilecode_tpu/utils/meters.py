"""Running statistics (reference AverageMeter parity,
`/root/reference/ModeT/utils.py:8-27`)."""

import numpy as np


class AverageMeter:
    """Tracks current value, running average, and std of all updates."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0
        self.vals = []
        self.std = 0.0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
        self.vals.append(val)
        self.std = float(np.std(self.vals))
