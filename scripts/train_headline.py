"""Headline-config training artifact (VERDICT r4 #1) — gated driver.

Proves the configuration the headline bench advertises TRAINS, on the real
chip, end to end through the shipped CLI — the reference committed real
training trajectories (/root/reference/train_results.csv:2-4, produced by
its epoch loop at scripts/train.py:281-433); this produces the equivalent
artifact for the TPU framework at the bench scale and commits it.

Two legs, both driven through ``scripts/train.py`` flags only:

1. **chip** — the default-resolved flagship: reference-shaped schema,
   B=8192, bf16 stores x one-hot lookup x fused lean CE x rbg dropout x
   on-device sampling (every knob "auto"-resolved, nothing hand-set),
   bench-scale planted-cluster data (100k x 100k rows, 400k pairs, 256
   clusters), with a per-epoch corpus-retrieval trajectory.
2. **cpu-mesh control** — the SAME config on the 8-virtual-device CPU
   mesh (``--force-cpu --mesh-devices 8``). The sampled global-batch
   draws are keyed on the global step, so both legs train on the SAME
   batch sequences; only the dropout impl (auto: rbg vs threefry) and
   matmul rounding differ.

The summary asserts the two legs' final corpus recall@100 agree within
tolerance and that both actually learned — converting "every kernel is
bit-exact" into "the product trains at the speed we advertise".

Artifacts (committed): ``artifacts/headline_b8192/{metrics.jsonl,
train_results.csv, control_metrics.jsonl, control_train_results.csv,
summary.json}``. Checkpoints go to /tmp (not committed).

Usage: ``python scripts/train_headline.py [--epochs N] [--skip-control]``
Gated: requires the real TPU for leg 1 (~minutes); the control leg is
CPU-heavy (~tens of minutes at B=8192).
"""

from __future__ import annotations

import argparse
import csv
import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ART = REPO / "artifacts" / "headline_b8192"


def run_leg(name: str, art: Path, epochs: int, extra: list[str],
            *, batch_size: int = 8192, scale: str = "bench") -> dict:
    art.mkdir(parents=True, exist_ok=True)
    results_csv = art / f"{'control_' if name == 'control' else ''}train_results.csv"
    metrics_jsonl = art / f"{'control_' if name == 'control' else ''}metrics.jsonl"
    for p in (results_csv, metrics_jsonl):
        if p.exists():
            p.unlink()
    ckpt = Path(tempfile.mkdtemp(prefix=f"headline_{name}_"))
    cmd = [
        sys.executable, "scripts/train.py",
        "--synthetic", "--synthetic-scale", scale,
        "--batch-size", str(batch_size), "--epochs", str(epochs),
        "--sample-on-device", "--epoch-corpus-eval",
        "--output-dir", str(ckpt),
        "--results-csv", str(results_csv),
        "--metrics-jsonl", str(metrics_jsonl),
        *extra,
    ]
    print(f"[{name}] {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=REPO, text=True, capture_output=True,
                          timeout=7200)
    sys.stdout.write(proc.stdout[-4000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"{name} leg failed rc={proc.returncode}")
    with results_csv.open() as f:
        rows = list(csv.DictReader(f))
    final = rows[-1]
    epochs_log = [json.loads(l) for l in metrics_jsonl.read_text().splitlines()]
    return {
        "cmd": " ".join(cmd[1:]),
        "final_corpus_recall_at_100": float(final["corpus_recall_at_100"]),
        "final_corpus_recall_at_10": float(final["corpus_recall_at_10"]),
        "final_val_loss": float(final["val_loss"]),
        "final_val_accuracy": float(final["val_accuracy"]),
        "final_z_gap": float(final["z_gap"]),
        "examples_per_sec": float(final["examples_per_sec"]),
        "first_epoch_train_loss": epochs_log[0]["train_loss"],
        "last_epoch_train_loss": epochs_log[-1]["train_loss"],
        "epochs": len(epochs_log),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--skip-control", action="store_true",
                    help="chip leg only (the control takes tens of CPU-minutes)")
    ap.add_argument("--tolerance", type=float, default=0.05,
                    help="max |chip - control| final corpus recall@100")
    ap.add_argument("--smoke", action="store_true",
                    help="hermetic smoke: tiny scale, B=256, BOTH legs on "
                         "CPU, artifacts to a temp dir — exercises the "
                         "whole driver (tests/test_train_headline.py) "
                         "without the chip or the bench-scale minutes")
    args = ap.parse_args()

    art = ART
    scale, batch = "bench", 8192
    chip_extra: list[str] = []
    if args.smoke:
        art = Path(tempfile.mkdtemp(prefix="headline_smoke_"))
        scale, batch = "tiny", 256
        chip_extra = ["--force-cpu", "--mesh-devices", "1"]

    summary: dict = {
        "batch_size": batch,
        "scale": "bench (100k x 100k, 400k pairs)" if scale == "bench"
        else "tiny (smoke)",
    }
    summary["chip"] = run_leg("chip", art, args.epochs, chip_extra,
                              batch_size=batch, scale=scale)
    chip = summary["chip"]
    # learning criteria evaluated AFTER summary.json lands — a failed run
    # must still leave the numbers needed to diagnose it (review finding).
    # threshold = 10x random recall@100 (1e-3 at the bench corpus's 100k
    # companies; 1e-2 at the tiny smoke corpus's 10k)
    min_recall = 0.1 if args.smoke else 0.01
    summary["chip_learned"] = bool(
        chip["last_epoch_train_loss"] < chip["first_epoch_train_loss"]
        and chip["final_corpus_recall_at_100"] >= min_recall
    )

    if not args.skip_control:
        summary["control"] = run_leg(
            "control", art, args.epochs,
            ["--force-cpu", "--mesh-devices", "8"],
            batch_size=batch, scale=scale,
        )
        diff = abs(
            chip["final_corpus_recall_at_100"]
            - summary["control"]["final_corpus_recall_at_100"]
        )
        summary["recall_at_100_abs_diff"] = round(diff, 6)
        summary["within_tolerance"] = bool(diff <= args.tolerance)

    (art / "summary.json").write_text(json.dumps(summary, indent=2))
    assert summary["chip_learned"], summary
    if not args.skip_control:
        assert summary["within_tolerance"], summary
    print(json.dumps({"bench": "headline_training_artifact", **{
        k: v for k, v in summary.items() if not isinstance(v, dict)
    }, "chip_recall_at_100": chip["final_corpus_recall_at_100"],
       "artifacts": str(art)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
