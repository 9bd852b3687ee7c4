"""Training observability.

Equivalent of the reference's TF1 ``Logger`` (``src/utils.py:307-368``):
scalar / image / histogram summaries, here written as TensorBoard event
files through TF2's ``tf.summary`` when TensorFlow is importable, with a
JSONL fallback so training never depends on TF.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class Logger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._writer = None
        try:
            import tensorflow as tf  # noqa: F401

            self._tf = tf
            self._writer = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._tf = None
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def scalar_summary(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            with self._writer.as_default():
                self._tf.summary.scalar(tag, float(value), step=step)
        else:
            self._jsonl.write(json.dumps(
                {"t": time.time(), "tag": tag, "value": float(value),
                 "step": int(step)}) + "\n")
            self._jsonl.flush()

    def image_summary(self, tag: str, images: np.ndarray, step: int) -> None:
        """images: (N, H, W, C) float [0, 1] or uint8."""
        if self._writer is None:
            return
        images = np.asarray(images)
        if images.dtype != np.uint8:
            images = np.clip(images * 255.0, 0, 255).astype(np.uint8)
        with self._writer.as_default():
            self._tf.summary.image(tag, images, step=step,
                                   max_outputs=images.shape[0])

    def histo_summary(self, tag: str, values: np.ndarray, step: int) -> None:
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.histogram(tag, np.asarray(values), step=step)

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()
