"""Orbax checkpointing with reference-compatible directory semantics.

Parity surface (train.py:106-121 of the reference):
* directory layout ``checkpoints/<run-name>/epoch=E-val_loss=V.ckpt`` with
  the monitored value encoded in the directory name,
* keep only the best checkpoint by val_loss (ModelCheckpoint save_top_k=1),
* auto-resume: scan the run directory, parse val_loss from the name, pick
  the best (train.py:117-121).

Orbax writes async-capable PyTree checkpoints (the TPU-native failure-
recovery story, SURVEY.md §5); the filename contract keeps the reference's
CLI/tooling behavior intact.
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path

import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"epoch=(\d+)-val_loss=([-\d.einf]+)\.ckpt")


def ckpt_name(epoch: int, val_loss: float) -> str:
    # 6 significant decimals: at 4, close val_losses collide in the name
    # and the keep-top-k prune can't order them
    return f"epoch={epoch}-val_loss={val_loss:.6f}.ckpt"


def parse_ckpt_name(name: str):
    m = _CKPT_RE.match(name)
    if not m:
        return None
    return int(m.group(1)), float(m.group(2))


def scan_best(run_dir: Path):
    """Returns (path, epoch, val_loss) of the best checkpoint or None."""
    run_dir = Path(run_dir)
    if not run_dir.exists():
        return None
    best = None
    for p in run_dir.iterdir():
        parsed = parse_ckpt_name(p.name)
        if parsed is None:
            continue
        if not (p / "state").exists():
            # interrupted async save (only a *.orbax-checkpoint-tmp left)
            continue
        epoch, vl = parsed
        if best is None or vl < best[2]:
            best = (p, epoch, vl)
    return best


class CheckpointManager:
    """Best-by-val_loss checkpoint keeper over a TrainState pytree."""

    def __init__(self, run_dir, save_top_k: int = 1):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.save_top_k = save_top_k
        self.best_val_loss = float("inf")
        self._ckptr = ocp.StandardCheckpointer()
        existing = scan_best(self.run_dir)
        if existing:
            self.best_val_loss = existing[2]

    def save(self, state, epoch: int, val_loss: float, extra=None) -> Path | None:
        """Saves if val_loss improves; prunes older checkpoints. Returns the
        new path or None if not saved."""
        if val_loss >= self.best_val_loss and any(
            parse_ckpt_name(p.name) for p in self.run_dir.iterdir()
        ):
            return None
        path = self.run_dir / ckpt_name(epoch, val_loss)
        self._ckptr.save(path.absolute() / "state", state, force=True)
        self._ckptr.wait_until_finished()
        self.best_val_loss = min(self.best_val_loss, val_loss)
        if extra is not None:
            import json

            (path / "extra.json").write_text(json.dumps(extra))
        # prune: keep top-k by val_loss
        entries = sorted(
            (
                (parse_ckpt_name(p.name)[1], p)
                for p in self.run_dir.iterdir()
                if parse_ckpt_name(p.name)
            ),
        )
        for _, p in entries[self.save_top_k :]:
            shutil.rmtree(p, ignore_errors=True)
        return path

    def restore(self, path, target):
        """Restores a TrainState-like pytree saved by save()."""
        path = Path(path)
        return self._ckptr.restore((path / "state").absolute(), target=target)


def restore_variables(path, target):
    """Standalone restore for eval/infer (no optimizer state needed)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore((Path(path) / "state").absolute(), target=target)
