"""Bench-vs-product parity guard (VERDICT r4 item 2).

The headline bench (bench.py) must measure exactly what a default
``scripts/train.py`` run executes: the flagship config is a plain
``TrainConfig()`` whose "auto" knobs resolve per-backend. Any hand-tuned
divergence in bench.py fails here.
"""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_bench_flagship_config_is_the_default_config():
    import bench

    from jodalrob_twotower_tpu.config import TrainConfig

    assert bench.flagship_config() == TrainConfig()


def test_auto_knobs_resolve_to_headline_path_on_tpu(monkeypatch):
    """The default config's auto knobs resolve to the measured headline
    path on a TPU backend: fused CE on, rbg dropout, bf16 stores,
    one-hot lookup eligible."""
    import jax.numpy as jnp

    from jodalrob_twotower_tpu.config import TrainConfig
    from jodalrob_twotower_tpu.train.loss import resolve_use_fused
    from jodalrob_twotower_tpu.train.train_step import (
        resolve_dropout_rng_impl,
        resolve_store_dtype,
    )

    cfg = TrainConfig()
    # store dtype: "auto" = compute dtype (bf16) on every backend
    assert resolve_store_dtype(cfg) == jnp.bfloat16

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_use_fused(cfg.loss) is True
    assert resolve_dropout_rng_impl(cfg.model) == "rbg"

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert resolve_use_fused(cfg.loss) is False
    assert resolve_dropout_rng_impl(cfg.model) == "threefry"


def test_dropout_rng_literals_still_force(monkeypatch):
    import dataclasses

    from jodalrob_twotower_tpu.config import ModelConfig
    from jodalrob_twotower_tpu.train.train_step import resolve_dropout_rng_impl

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert resolve_dropout_rng_impl(ModelConfig(dropout_rng_impl="rbg")) == "rbg"
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert (
        resolve_dropout_rng_impl(ModelConfig(dropout_rng_impl="threefry"))
        == "threefry"
    )


def test_train_cli_dropout_rng_flag():
    """--dropout-rng overrides ModelConfig.dropout_rng_impl."""
    import importlib.util

    path = Path(__file__).resolve().parent.parent / "scripts" / "train.py"
    spec = importlib.util.spec_from_file_location("_train_cli", path)
    train_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_mod)
    args = train_mod.parse_args(["--synthetic", "--dropout-rng", "threefry"])
    assert args.dropout_rng == "threefry"
    args = train_mod.parse_args(["--synthetic"])
    assert args.dropout_rng is None
