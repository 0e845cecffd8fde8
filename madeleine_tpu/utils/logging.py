"""Metrics logging — JSONL-first with optional wandb
(ref observability: bin/pretrain.py:57-58 + setup_components.py:60-83; the
reference only has optional wandb and ANSI prints, SURVEY §5).

`MetricsLogger` always writes ``metrics.jsonl`` into the run dir (one JSON
object per log call with a wall-clock timestamp), and mirrors to wandb when the
package is installed and log_ml is set — so runs are observable with zero
external services.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, results_dir: str, use_wandb: bool = False,
                 project: str = "MADELEINE", run_name: Optional[str] = None,
                 config: Optional[Dict[str, Any]] = None, tags=None):
        os.makedirs(results_dir, exist_ok=True)
        self.path = os.path.join(results_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                # reuse a persisted run id so --resume continues the SAME
                # wandb run (ref: setup_components.py:60-83 reads/writes
                # wandbID.txt with resume="must")
                id_path = os.path.join(results_dir, "wandbID.txt")
                if os.path.exists(id_path):
                    with open(id_path) as f:
                        run_id = f.read().strip()
                    resume = "allow"
                else:
                    run_id = str(uuid.uuid4())
                    resume = None
                self._wandb = wandb.init(project=project, name=run_name,
                                         id=run_id, config=config,
                                         tags=tags or [], resume=resume)
                with open(id_path, "w") as f:
                    f.write(run_id)   # ref: setup_components.py:80-82
            except ImportError:
                print("* wandb not installed; logging to metrics.jsonl only")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        rec = {"time": time.time(), **metrics}
        if step is not None:
            rec["step"] = step
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def summary(self, key: str, value: Any) -> None:
        self.log({f"summary/{key}": value})
        if self._wandb is not None:
            self._wandb.run.summary[key] = value

    def close(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
