"""Typed configuration for the framework.

Reproduces every hyperparameter of the reference's monolithic config dict
(reference: scripts/train.py:84-134) as typed dataclasses, extended with the
TPU-native knobs the reference lacks (mesh shape, sharding strategy, Pallas
kernel flags, input-pipeline prefetch, serving/quantization).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Mapping, Sequence


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Tower architecture (reference: scripts/train.py:101-111, base_tower.py:49-99)."""

    categorical_embedding_dim: int = 32
    # Width each raw dense block (numeric / each text embedding) is projected
    # to before entering the tower MLP. The reference used a *frozen random*
    # 2-layer projection to 128 (feature_projector.py:5-28, applied under
    # no_grad); here the projection is a learned layer inside the tower -
    # an intentional, documented improvement (SURVEY.md 7 "quirks").
    dense_projection_dim: int = 128
    tower_hidden_dims: tuple[int, ...] = (512, 256)
    final_embedding_dim: int = 128
    dropout_rate: float = 0.1
    # PRNG implementation for the per-step dropout mask stream: "auto"
    # (default — "rbg" on a TPU backend, "threefry" elsewhere; mirrors
    # use_fused_logits="auto"), "threefry" (JAX default, counter-based,
    # bit-stable everywhere) or "rbg" (XLA's RngBitGenerator — the TPU's
    # fast hardware generator). Threefry mask generation is VPU-heavy at
    # large batch; rbg cuts the measured dropout cost from ~0.29 to ~0.06
    # ms/step at B=8192 (BENCHMARKS.md), which is why "auto" picks it on
    # TPU: the shipped driver default IS the headline-bench path (the
    # reference likewise enabled its fast-math defaults in the driver,
    # scripts/train.py:145-150, not in a bench). Mask bits differ between
    # the two impls, but within one impl runs remain bit-reproducible:
    # the key is still derived by fold_in(state.rng, step).
    dropout_rng_impl: str = "auto"
    use_batch_norm: bool = True
    # Compute dtype for tower matmuls; params stay float32.
    compute_dtype: str = "bfloat16"
    # Embedding-table gradient path: "auto" (dense one-hot-matmul Pallas
    # kernel on single-device TPU, XLA scatter elsewhere), "dense", or
    # "scatter". The dense kernel replaces an ~11ms serial scatter with a
    # ~0.6ms MXU pass when vocabs are small relative to the batch
    # (ops/embedding_grad.py).
    embedding_grad: str = "auto"
    # Embedding-table FORWARD path: "auto" | "gather" | "onehot". "onehot"
    # computes the lookup as the one-hot MXU matmul (the forward twin of
    # the dense-grad kernel, ops/embedding_grad.make_onehot_lookup)
    # instead of the row-DMA gather: the 262k random row-DMAs per step
    # (row-count-bound, the step's largest per-op line) become ~17 GFLOP
    # of bf16 MXU work. Measured in-step on the chip (BENCHMARKS.md round
    # 4): 2.08 vs 2.66 ms/step at the flagship shape, bit-exact output —
    # so "auto" resolves to the kernel on single-device TPU for tables in
    # the dense-grad envelope, and to the gather elsewhere.
    embedding_lookup: str = "auto"

    def __post_init__(self) -> None:
        if self.dropout_rng_impl not in ("auto", "threefry", "rbg"):
            raise ValueError(
                f"dropout_rng_impl must be 'auto', 'threefry' or 'rbg', got "
                f"{self.dropout_rng_impl!r}"
            )
        if self.compute_dtype not in ("bfloat16", "float32"):
            raise ValueError(
                f"compute_dtype must be 'bfloat16' or 'float32', got "
                f"{self.compute_dtype!r}"
            )
        if self.embedding_grad not in ("auto", "dense", "scatter"):
            raise ValueError(
                f"embedding_grad must be 'auto', 'dense' or 'scatter', got "
                f"{self.embedding_grad!r}"
            )
        if self.embedding_lookup not in ("auto", "gather", "onehot"):
            raise ValueError(
                f"embedding_lookup must be 'auto', 'gather' or 'onehot', "
                f"got {self.embedding_lookup!r}"
            )

    @property
    def hidden_dims(self) -> tuple[int, ...]:
        return tuple(self.tower_hidden_dims)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Training objective (reference: two_tower_train_task.py:99-158)."""

    # "cross_entropy" = bidirectional in-batch-negatives softmax CE;
    # "cosine_embedding" = pairwise cosine margin loss (reference alt loss).
    loss_type: str = "cross_entropy"
    temperature: float = 1.0
    label_smoothing: float = 0.0
    cosine_margin: float = 0.0
    # In-batch negatives always span the GLOBAL batch: under data
    # parallelism the [B, B] logits matmul makes XLA all-gather one side, so
    # the candidate set matches the reference semantics at any mesh size
    # (verified numerically equal to single-device in tests/test_sharding.py).
    # Fused Pallas dot+log-softmax CE (single-device AND mesh — the
    # shard_mapped form keeps global negatives): "auto" (default) resolves
    # True on a TPU backend with the cross_entropy loss — measured 10.3x
    # the materializing XLA path at B=8192 and the only runnable form at
    # global B>=32768 (BENCHMARKS.md) — and False off-TPU, where the
    # materialized [B, B] keeps the full train-metric surface without
    # interpret-mode Pallas. Shapes outside the kernel envelope fall back
    # to XLA inside ops/fused_logits regardless. True/False force it.
    use_fused_logits: bool | str = "auto"

    def __post_init__(self) -> None:
        if self.use_fused_logits not in (True, False, "auto"):
            raise ValueError(
                "use_fused_logits must be True, False or 'auto', got "
                f"{self.use_fused_logits!r}"
            )


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Optimizer/schedule (reference: scripts/train.py:231-242)."""

    learning_rate: float = 1e-3
    weight_decay: float = 1e-5
    num_epochs: int = 1
    warmup_ratio: float = 0.05
    # Dense params use adamw; embedding tables use rowwise adagrad (sharded
    # state, one accumulator scalar per row) unless disabled.
    embedding_optimizer: str = "rowwise_adagrad"  # or "adamw"
    embedding_learning_rate: float | None = None  # defaults to learning_rate
    adagrad_init_accumulator: float = 0.1
    adagrad_eps: float = 1e-10
    gradient_clip_norm: float | None = None
    # dtype of AdamW's FIRST moment (mu) for the dense tower params:
    # "float32" (default) | "bfloat16". bf16 halves mu's read+write in the
    # optimizer fusion (~11.6 MB/step at the flagship, part of the ~0.25
    # ms optimizer line — measured delta in BENCHMARKS.md). The SECOND
    # moment (nu) intentionally stays f32 in both modes: its b2=0.999 EMA
    # adds ~1e-3-relative increments, below bf16's ~4e-3 mantissa
    # granularity — a bf16 nu stops accumulating (measured divergence,
    # BENCHMARKS.md "bf16 optimizer moments").
    adam_moment_dtype: str = "float32"
    # Duplicate-id semantics of the sparse-tables rowwise Adagrad
    # (train/sparse_tables.py): "exact" segment-sums per-occurrence grads
    # per unique row first, matching the dense path's autodiff-summed
    # gradients on ANY batch (reference anchor: autodiff through
    # nn.Embedding, cat_embed.py:156-178); "per_occurrence" applies each
    # occurrence separately (cheaper: skips a sort, exact only when a row
    # appears once in the batch).
    sparse_duplicate_handling: str = "exact"

    def __post_init__(self) -> None:
        if self.adam_moment_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                "adam_moment_dtype must be 'float32' or 'bfloat16', got "
                f"{self.adam_moment_dtype!r}"
            )
        if self.sparse_duplicate_handling not in ("exact", "per_occurrence"):
            raise ValueError(
                "sparse_duplicate_handling must be 'exact' or "
                f"'per_occurrence', got {self.sparse_duplicate_handling!r}"
            )


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline (reference: scripts/train.py:86-100)."""

    batch_size: int = 256
    test_split: float = 0.2
    shuffle_seed: int = 42
    pair_limit: int | None = 1_000_000
    # Streaming chunk size when reading parquet pair chunks.
    chunk_size: int = 1_000_000
    # Number of batches prefetched onto the device.
    prefetch: int = 2
    drop_remainder: bool = True
    # dtype of the DEVICE-RESIDENT dense feature block: "auto" stores at the
    # model compute dtype (bf16 halves the store's HBM footprint and removes
    # XLA's per-dispatch hoisted f32→bf16 cast of the whole store — measured
    # 2.78→2.73 ms/step, bit-identical results since the towers cast dense
    # inputs to compute dtype anyway); "float32" keeps the store at full
    # precision.
    device_store_dtype: str = "auto"
    # ON-DEVICE batch sampling (train_step.make_sampled_train_steps): the
    # pair set lives in HBM and each step draws its batch IID WITH
    # REPLACEMENT from a PRNG key folded with the global step — the host
    # sends one key per dispatch instead of an [n_inner, B, 2] index stack.
    # This is the headline-bench configuration (2.3 ms/step at B=8192 vs
    # 3.2 host-fed, and immune to tunnel H2D congestion). Epoch semantics
    # differ from the default shuffled-permutation path: an "epoch" is
    # steps_per_epoch IID draws, not a without-replacement pass over the
    # pairs (~1/e of pairs missed per epoch; indistinguishable at the
    # multi-epoch scale this serves). Requires the pair set to fit HBM;
    # incompatible with streaming batch sources. Works single-device and
    # on a mesh (parallel/sharded_train.make_sharded_sampled_steps: the
    # GLOBAL batch is drawn on-mesh from the replicated pair set); the
    # sparse O(batch) path stays host-fed.
    sample_on_device: bool = False

    def __post_init__(self) -> None:
        if self.device_store_dtype not in ("auto", "float32", "bfloat16"):
            raise ValueError(
                f"device_store_dtype must be 'auto', 'float32' or "
                f"'bfloat16', got {self.device_store_dtype!r}"
            )


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh / parallelism. The reference has none of this (SURVEY.md 2.5)."""

    # Axis sizes; -1 on the data axis means "all remaining devices".
    data_axis: int = -1
    model_axis: int = 1
    # Embedding-table sharding under a mesh:
    #   "auto" (default)  — "replicated" when both towers' unified tables fit
    #                       the dense-grad kernel envelope (<= 65k rows each:
    #                       a few MB, cheaper to replicate than to exchange
    #                       rows per step, and the backward stays the one-hot
    #                       matmul kernel instead of XLA's sort-scatter),
    #                       else "gspmd_rows" (resolve_embedding_sharding).
    #   "replicated"      — tables replicated; dense-grad kernel backward via
    #                       shard_map when embedding_grad allows.
    #   "gspmd_rows"      — NamedSharding on rows, XLA inserts collectives.
    #   "shard_map"       — explicit all-gather ids + psum_scatter rows.
    embedding_sharding: str = "auto"
    # Use the Pallas gather kernel for embedding lookup on TPU.
    use_pallas_lookup: bool = False
    # Device-resident FEATURE-STORE placement under a mesh:
    #   "replicated" (default) — every chip holds the full dense/cat
    #                matrices; right while they fit one chip's HBM.
    #   "rows"       — each chip holds 1/n of the store's rows; batch rows
    #                are fetched by an explicit all-gather-ids ->
    #                psum_scatter-rows exchange (parallel/sharded_store.py).
    #                The reference's "features too large for memory" mode 4
    #                (unified_bid_data_loader.py:408-456) at TPU scale:
    #                corpora whose dense features exceed one chip's HBM
    #                (10M notices x 768-d text f32 ~ 30 GB) train
    #                device-resident instead of at the host-link floor.
    store_sharding: str = "replicated"
    # Compressed dense-gradient all-reduce with error feedback
    # (parallel/compressed_grads.py; paper anchor PAPERS.md arxiv
    # 2407.04272) — for data parallelism whose gradient sync rides a slow
    # interconnect (multi-host DCN):
    #   "none" (default) — plain f32 sync via GSPMD (right within a slice:
    #          ICI is fast and the collective is free to insert).
    #   "int16" — int8-symmetric quantization on a shared per-tensor scale,
    #          summed exactly in int16 (<=256 workers); 2 B/elem on the
    #          wire vs f32's 4, per-worker residual re-injects what the
    #          quantizer dropped.
    #   "bf16" — cast-and-psum, 2 B/elem, no shared-scale collective.
    # Loss semantics under compression — see compressed_negatives below;
    # uncompressed runs always use the GSPMD/fused global-negatives path.
    grad_compression: str = "none"
    # In-batch-negatives scope WHEN grad_compression is on:
    #   "local" (default) — each shard's [B/n, B/n] block, the reference's
    #          per-GPU semantics (two_tower_train_task.py:99-134). Zero
    #          extra wire: only the compressed dense grads cross shards.
    #   "global" — the framework's flagship full-global-batch candidate
    #          set, kept under compression via the manual fused CE
    #          (ops/fused_logits.make_manual_fused_ce) inside the
    #          compressed shard_map step. Wire adds one [B, D] f32
    #          all-gather of the company side per forward + backward
    #          (B=8192, D=128: 4 MB/step vs the 5.8 MB the int16
    #          compression saves on the flagship's 11.6 MB dense grads —
    #          still a net win, and the loss matches the uncompressed
    #          mesh path exactly).
    compressed_negatives: str = "local"

    def __post_init__(self) -> None:
        if self.embedding_sharding not in (
            "auto", "replicated", "gspmd_rows", "shard_map"
        ):
            raise ValueError(
                "embedding_sharding must be one of 'auto', 'replicated', "
                f"'gspmd_rows', 'shard_map'; got {self.embedding_sharding!r}"
            )
        if self.store_sharding not in ("replicated", "rows"):
            raise ValueError(
                "store_sharding must be 'replicated' or 'rows'; "
                f"got {self.store_sharding!r}"
            )
        if self.grad_compression not in ("none", "int16", "bf16"):
            raise ValueError(
                "grad_compression must be 'none', 'int16' or 'bf16'; "
                f"got {self.grad_compression!r}"
            )
        if self.compressed_negatives not in ("local", "global"):
            raise ValueError(
                "compressed_negatives must be 'local' or 'global'; "
                f"got {self.compressed_negatives!r}"
            )


@dataclasses.dataclass(frozen=True)
class CheckpointConfig:
    """Checkpointing (reference: scripts/train.py:497-534)."""

    output_dir: str = "output/models"
    save_best: bool = True
    save_final: bool = True
    save_every_epoch: bool = True
    keep_n: int = 3
    # mid-epoch preemption recovery: checkpoint the train state every N
    # steps (0 = off). The save is double-buffered with an atomic pointer
    # flip, so a kill during the write never destroys the previous good
    # checkpoint; resume fast-forwards the seeded epoch iterator to the
    # exact batch, making a preempted run bit-identical to an
    # uninterrupted one. The reference could only resume whole epochs
    # (scripts/train.py:537-589).
    save_every_steps: int = 0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Top-level config bundling all subsystems."""

    model: ModelConfig = ModelConfig()
    loss: LossConfig = LossConfig()
    optimizer: OptimizerConfig = OptimizerConfig()
    data: DataConfig = DataConfig()
    mesh: MeshConfig = MeshConfig()
    checkpoint: CheckpointConfig = CheckpointConfig()
    log_interval: int = 20
    metadata_path: str | None = None
    results_csv: str = "train_results.csv"
    # structured per-epoch metrics stream (JSONL); empty disables
    metrics_jsonl: str = ""
    # O(batch) sparse-table training path (train/sparse_tables.py) for huge
    # embedding tables: tables + rowwise-Adagrad state live outside the
    # dense param tree and only touched rows are updated per step
    sparse_tables: bool = False
    # With sparse_tables: apply ONE batched rowwise-Adagrad table update per
    # n_inner-step scan window instead of per step (train/sparse_tables.py
    # make_deferred_sparse_steps). Amortizes the scatter that dominates the
    # sparse step; embeddings are up to n_inner steps stale within a window.
    sparse_defer_updates: bool = False
    seed: int = 42

    # -- (de)serialization ---------------------------------------------------
    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.to_dict(), indent=2))

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "TrainConfig":
        def build(klass, sub):
            fields = {f.name: f for f in dataclasses.fields(klass)}
            kwargs = {}
            for k, v in sub.items():
                if k not in fields:
                    raise KeyError(f"unknown {klass.__name__} field {k!r}")
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return klass(**kwargs)

        kwargs: dict[str, Any] = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            if dataclasses.is_dataclass(f.type) or f.name in (
                "model", "loss", "optimizer", "data", "mesh", "checkpoint",
            ):
                sub_cls = {
                    "model": ModelConfig,
                    "loss": LossConfig,
                    "optimizer": OptimizerConfig,
                    "data": DataConfig,
                    "mesh": MeshConfig,
                    "checkpoint": CheckpointConfig,
                }[f.name]
                kwargs[f.name] = build(sub_cls, v)
            else:
                kwargs[f.name] = v
        return cls(**kwargs)

    @classmethod
    def from_json(cls, path: str | Path) -> "TrainConfig":
        return cls.from_dict(json.loads(Path(path).read_text()))

    def replace(self, **kwargs) -> "TrainConfig":
        return dataclasses.replace(self, **kwargs)
