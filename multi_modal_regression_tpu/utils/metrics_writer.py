"""Metric sinks: jsonl (always) + TensorBoard scalars (optional).

Replaces the reference's tensorboardX SummaryWriter usage
(learnGeodesicBDModel.py:99,136-137,187-194): the same scalar names
(train_loss, alpha, val_loss) are emitted so existing dashboards carry
over, plus a machine-readable metrics.jsonl stream.
"""

from __future__ import annotations

import json
from pathlib import Path


class MetricsWriter:
    def __init__(self, workdir: str | Path, tensorboard: bool = False):
        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.workdir / "metrics.jsonl", "a")
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    str(self.workdir / "tb")
                )
            except Exception:  # TF missing/broken: jsonl still works
                self._tb = None

    def write(self, step: int, scalars: dict) -> None:
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            with self._tb.as_default():
                import tensorflow as tf

                for k, v in scalars.items():
                    tf.summary.scalar(k, float(v), step=int(step))
                self._tb.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
