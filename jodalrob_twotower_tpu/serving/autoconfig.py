"""Recall-targeted serving auto-configuration.

The serving stack exposes a 3-knob trade space (index kind, approx_max_k
recall target, two-stage rescore depth — serving/index.py) whose QPS/recall
frontier was MEASURED at full 10M-corpus scale (BENCHMARKS.md "Two-stage
rescore" menu, within-window comparisons):

| config                          | QPS   | recall@100 vs exact |
|---|---|---|
| plain int8, approx 0.97         | 18.2k | 0.980               |
| rescore-400 over approx 0.90    | 20.9k | 0.988               |
| rescore-400 over approx 0.97    | 12.7k | 0.995               |
| exact f32 scan                  | slow  | 1.000               |

``choose_serving_config(target_recall)`` picks the FASTEST measured config
meeting the target, so ``serve.py --target-recall 0.99`` replaces hand
tuning (VERDICT r2 #4). The plain-int8 row is deliberately absent from the
candidate curve: rescore-400-over-0.90 strictly dominates it (more recall
AND more QPS — coarser approx bins are cheaper than the recall they cost
once a rescore pass sits behind them), so no target should ever select it.

Reference anchor: predict_batch top-k semantics
(two_tower_train_task.py:181-207) served at corpus scale.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ServingConfig:
    """One point on the measured QPS/recall frontier."""

    index_kind: str  # "int8" | "exact"
    approx_recall: float | None
    rescore_depth: int | None
    rescore_dtype: str
    expected_recall: float  # measured recall@100 vs exact, 10M corpus
    note: str

    def cli_flags(self) -> list[str]:
        """The equivalent explicit serve.py flags (for logging)."""
        flags = ["--index", self.index_kind]
        if self.approx_recall is not None:
            flags += ["--approx-recall", str(self.approx_recall)]
        if self.rescore_depth is not None:
            flags += ["--rescore-depth", str(self.rescore_depth),
                      "--rescore-dtype", self.rescore_dtype]
        return flags


# Fastest -> slowest; every entry Pareto-optimal in the measured window.
_CURVE: tuple[ServingConfig, ...] = (
    ServingConfig(
        "int8", 0.90, 400, "bfloat16", 0.988,
        "rescore-400 over approx 0.90 (dominates plain int8: more recall "
        "AND more QPS)",
    ),
    ServingConfig(
        "int8", 0.97, 400, "bfloat16", 0.995,
        "rescore-400 over approx 0.97",
    ),
    ServingConfig(
        "exact", None, None, "int8", 1.0,
        "exact brute-force f32 scan",
    ),
)

# the measured window's run-to-run recall noise (BENCHMARKS.md: recall is
# stable across windows even when absolute QPS moves 18-28k; the ordering
# and recall figures reproduced across two measurement windows)
_RECALL_TOLERANCE = 1e-9


def choose_serving_config(target_recall: float, *, k: int = 100) -> ServingConfig:
    """The fastest measured config whose recall@100 meets ``target_recall``.

    The curve was measured at k=100 on a 10M corpus; for k > 100 the
    rescore-depth-400 points are unmeasured (the over-fetch must exceed k
    several-fold), so the exact scan is returned — a conservative guard,
    not a measurement."""
    if not (0.0 < target_recall <= 1.0):
        raise ValueError(
            f"target_recall must be in (0, 1], got {target_recall}"
        )
    if k > 100:
        return _CURVE[-1]
    for cfg in _CURVE:
        if cfg.expected_recall >= target_recall - _RECALL_TOLERANCE:
            return cfg
    return _CURVE[-1]
