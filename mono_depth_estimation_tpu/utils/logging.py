"""Run logging: JSON-lines metric stream with W&B-compatible naming.

The reference logs everything through WandbLogger (train.py:100,156;
metrics.py:16-44). This environment has no wandb and no egress, so the
default sink is a ``metrics.jsonl`` stream using the same metric names
(``val_delta1``, ``train_loss``, prefixes front_/back_/comp_/...), which
wandb tooling can ingest offline. If wandb IS importable it is used
transparently (offline mode respected via env).
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class RunLogger:
    def __init__(self, run_dir, project: str = "stdepth", use_wandb: bool = True):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.file = open(self.run_dir / "metrics.jsonl", "a", buffering=1)
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, dir=str(self.run_dir), resume="allow"
                )
            except Exception:
                self._wandb = None

    def log(self, payload: dict, step: int | None = None) -> None:
        record = {"_time": time.time()}
        if step is not None:
            record["_step"] = int(step)
        record.update(
            {k: (float(v) if hasattr(v, "__float__") else v) for k, v in payload.items()}
        )
        self.file.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(payload, step=step)

    def log_artifact(self, path, kind: str = "model",
                     metadata: dict | None = None) -> None:
        """Records a produced artifact (checkpoint, export) — the JSONL
        mirror of the reference's ``WandbLogger(log_model=True)`` checkpoint
        upload (reference train.py:100). With wandb importable the artifact
        is also uploaded via ``wandb.log_artifact``."""
        record = {"_time": time.time(), "_artifact": str(path), "kind": kind}
        if metadata:
            record.update(
                {k: (float(v) if hasattr(v, "__float__") else v)
                 for k, v in metadata.items()}
            )
        self.file.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            try:
                import wandb

                art = wandb.Artifact(
                    Path(path).name.replace("=", "_"), type=kind,
                    metadata=metadata or {},
                )
                art.add_dir(str(path)) if Path(path).is_dir() else (
                    art.add_file(str(path))
                )
                self._wandb.log_artifact(art)
            except Exception:
                pass

    def log_hparams(self, hparams: dict) -> None:
        (self.run_dir / "hparams.json").write_text(
            json.dumps(hparams, default=str, indent=2)
        )
        if self._wandb is not None:
            self._wandb.config.update(hparams, allow_val_change=True)

    def close(self) -> None:
        self.file.close()
        if self._wandb is not None:
            self._wandb.finish()
