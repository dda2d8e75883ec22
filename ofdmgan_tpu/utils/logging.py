"""Training observability: JSONL metrics + optional TensorBoard.

Reference parity: TensorBoard scalars train/{d_loss,g_loss,wasserstein,
rec_loss,gp} and val/{rec_loss,mse} (train.py:355-360, 492-494). The JSONL
stream is the always-on machine-readable artifact; TensorBoard is attached
when available.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: str, experiment: Optional[str] = None, tensorboard: bool = True):
        if experiment is None:
            experiment = time.strftime("%Y%m%d_%H%M%S")
        self.dir = Path(log_dir) / experiment
        self.dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.dir / "metrics.jsonl", "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.dir))
            except Exception:
                self._tb = None

    def log_scalars(self, tag_prefix: str, scalars: Dict[str, Any], step: int):
        rec = {"step": step, "t": time.time()}
        for k, v in scalars.items():
            rec[f"{tag_prefix}/{k}"] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(f"{tag_prefix}/{k}", float(v), step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def log_text(self, tag: str, text: str):
        if self._tb is not None:
            self._tb.add_text(tag, text)
        (self.dir / f"{tag}.txt").write_text(text)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
