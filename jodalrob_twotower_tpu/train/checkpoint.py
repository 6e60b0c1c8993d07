"""Checkpointing: orbax-backed save/restore of the full train state.

Capability parity with the reference (scripts/train.py:497-589):
per-epoch checkpoints, a tracked best checkpoint, a final checkpoint, a
weights-only export, and resume — but the payload is the sharded JAX train
state (params + optimizer state + batch stats + step + rng), restored with
the original shardings, instead of a torch state_dict.
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from jodalrob_twotower_tpu.config import CheckpointConfig, TrainConfig
from jodalrob_twotower_tpu.train.train_step import TrainState


class CheckpointManager:
    """best/final/epoch checkpoint retention on top of orbax.

    Layout under ``directory``:
      epoch_<n>/   - per-epoch checkpoints (keep_n newest)
      best/        - checkpoint with the lowest tracked metric
      final/       - last checkpoint written by finalize()
      config.json  - the TrainConfig that produced the run
      best.json    - {"epoch": n, "metric": value}
    """

    def __init__(self, directory: str | Path, cfg: CheckpointConfig | None = None) -> None:
        self.dir = Path(directory)
        self.cfg = cfg or CheckpointConfig()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._best_metric: float | None = None
        best_file = self.dir / "best.json"
        if best_file.exists():
            self._best_metric = json.loads(best_file.read_text()).get("metric")

    # -- save --------------------------------------------------------------
    def save_config(self, cfg: TrainConfig) -> None:
        cfg.to_json(self.dir / "config.json")

    def save_epoch(self, state: TrainState, epoch: int, metric: float | None = None) -> None:
        """Save an epoch checkpoint; update best/ when the metric improves
        (reference tracked best val loss, scripts/train.py:426-431)."""
        if self.cfg.save_every_epoch:
            self._write(self.dir / f"epoch_{epoch}", state)
            self._prune_epochs()
        if (
            self.cfg.save_best
            and metric is not None
            and (self._best_metric is None or metric < self._best_metric)
        ):
            self._best_metric = float(metric)
            self._write(self.dir / "best", state, overwrite=True)
            (self.dir / "best.json").write_text(
                json.dumps({"epoch": epoch, "metric": float(metric)})
            )

    def save_step(self, state: TrainState, epoch: int, batch_in_epoch: int) -> None:
        """Mid-epoch checkpoint for preemption recovery.

        ``batch_in_epoch`` is the EXACT number of batches the epoch iterator
        has yielded so far this epoch — recorded rather than derived from a
        nominal steps_per_epoch at resume time, because for streaming runs
        the actual per-epoch batch count need not match the nominal one (a
        derived skip would silently re-train or skip data).

        Double-buffered: alternates between ``step_a/`` and ``step_b/`` and
        only flips the ``step.json`` pointer (atomic rename) after the save
        fully lands — a preemption during the write leaves the previous
        good checkpoint intact and pointed-to."""
        ptr = self.dir / "step.json"
        prev = json.loads(ptr.read_text())["dir"] if ptr.exists() else "step_b"
        nxt = "step_a" if prev == "step_b" else "step_b"
        self._write(self.dir / nxt, state, overwrite=True)
        tmp = self.dir / "step.json.tmp"
        tmp.write_text(
            json.dumps(
                {
                    "dir": nxt,
                    "epoch": int(epoch),
                    "step": int(jax.device_get(state.step)),
                    "batch": int(batch_in_epoch),
                }
            )
        )
        tmp.replace(ptr)

    def restore_step(self, target: TrainState) -> tuple[TrainState, int, int, int | None] | None:
        """Restore the newest mid-epoch checkpoint -> (state, epoch, step,
        batch_in_epoch), or None if no step checkpoint exists.
        ``batch_in_epoch`` is None for checkpoints written before it was
        recorded (callers fall back to deriving it)."""
        ptr = self.dir / "step.json"
        if not ptr.exists():
            return None
        meta = json.loads(ptr.read_text())
        state = self.restore(meta["dir"], target)
        batch = meta.get("batch")
        return state, int(meta["epoch"]), int(meta["step"]), (
            int(batch) if batch is not None else None
        )

    def finalize(self, state: TrainState) -> None:
        if self.cfg.save_final:
            self._write(self.dir / "final", state, overwrite=True)
        # weights-only export (reference model_weights.pt, train.py:525-534)
        self._write_params_only(self.dir / "weights", state)

    def _write(self, path: Path, state: TrainState, overwrite: bool = False) -> None:
        if overwrite and path.exists():
            shutil.rmtree(path)
        self._ckptr.save(path.absolute(), state)
        self._ckptr.wait_until_finished()

    def _write_params_only(self, path: Path, state) -> None:
        if path.exists():
            shutil.rmtree(path)
        if hasattr(state, "params"):
            params = state.params
        else:  # sparse-table state: merge tables back into the param tree
            from jodalrob_twotower_tpu.train.sparse_tables import merged_params

            params = merged_params(state)
        self._ckptr.save(path.absolute(), {"params": params, "batch_stats": state.batch_stats})
        self._ckptr.wait_until_finished()

    _EPOCH_RE = re.compile(r"^epoch_(\d+)$")

    def _epoch_dirs(self) -> list[tuple[int, Path]]:
        """COMPLETE epoch checkpoints only. A preemption mid-save leaves an
        'epoch_N.orbax-checkpoint-tmp' sibling behind (orbax saves to a tmp
        dir, then renames); a naive int(name.split('_')[1]) on that raises
        ValueError and bricks resume — exactly the preemption the step
        checkpoints exist to survive. Match the exact epoch_<int> pattern
        and require the checkpoint-complete marker."""
        out = []
        for p in self.dir.glob("epoch_*"):
            m = self._EPOCH_RE.match(p.name)
            if m and p.is_dir() and (p / "_CHECKPOINT_METADATA").exists():
                out.append((int(m.group(1)), p))
        return sorted(out)

    def _prune_epochs(self) -> None:
        epochs = self._epoch_dirs()
        for _, p in epochs[: max(len(epochs) - self.cfg.keep_n, 0)]:
            shutil.rmtree(p)
        # leftover tmp dirs from interrupted saves are dead weight
        for p in self.dir.glob("*.orbax-checkpoint-tmp"):
            shutil.rmtree(p, ignore_errors=True)

    # -- restore -----------------------------------------------------------
    def available(self) -> list[str]:
        return sorted(
            p.name for p in self.dir.iterdir() if p.is_dir() and (p / "_CHECKPOINT_METADATA").exists()
        )

    def latest_epoch(self) -> int | None:
        epochs = self._epoch_dirs()
        return epochs[-1][0] if epochs else None

    def restore(self, name: str, target: TrainState) -> TrainState:
        """Restore checkpoint ``name`` ('best', 'final', 'epoch_N') into the
        structure/shardings of ``target`` (an initialized state)."""
        return self._ckptr.restore((self.dir / name).absolute(), target)

    def restore_latest(self, target: TrainState) -> tuple[TrainState, int] | None:
        """Resume support (reference --resume, scripts/train.py:537-589)."""
        epoch = self.latest_epoch()
        if epoch is None:
            return None
        return self.restore(f"epoch_{epoch}", target), epoch

    def restore_weights(self, params_template, batch_stats_template=None) -> dict:
        """Load the weights-only export (reference model_weights.pt) into
        {'params', 'batch_stats'} — the serving path's entry point: no
        optimizer state, no training step counter required."""
        target = {"params": params_template, "batch_stats": batch_stats_template or {}}
        return self._ckptr.restore((self.dir / "weights").absolute(), target)
