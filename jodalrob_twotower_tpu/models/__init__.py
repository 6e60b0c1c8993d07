from jodalrob_twotower_tpu.models.embedding import EmbeddingCollection  # noqa: F401
from jodalrob_twotower_tpu.models.tower import Tower  # noqa: F401
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel  # noqa: F401


def build_model(schema, cfg, mesh=None) -> TwoTowerModel:
    """Construct the model with the embedding lookup the config asks for:
    'replicated' -> plain gather whose BACKWARD is the per-shard dense-vocab
    kernel + psum when the config's embedding_grad allows it
    (parallel/sharded_embedding.ShardedDenseGradLookup — replicated tables
    are the right call for vocab totals up to ~65k rows, a few MB);
    'gspmd_rows' -> plain gather, XLA chooses the collectives for the
    row-sharded table; 'shard_map' -> explicit all-to-all exchange."""
    lookup_fn = None
    if mesh is not None and getattr(cfg.mesh, "grad_compression", "none") != "none":
        # compressed-DP steps are themselves explicit shard_maps
        # (parallel/compressed_grads.py): everything inside is per-shard
        # local with replicated tables, so the model must use the PLAIN
        # lookup — a nested shard_map lookup cannot lower inside the
        # Manual-axes context
        mode = None
    elif mesh is not None:
        from jodalrob_twotower_tpu.parallel.mesh import resolve_embedding_sharding

        mode = resolve_embedding_sharding(cfg.mesh, schema)
    else:
        mode = None
    if mode == "shard_map":
        from jodalrob_twotower_tpu.parallel.sharded_embedding import make_sharded_lookup

        lookup_fn = make_sharded_lookup(mesh)
    elif (
        mode == "replicated"
        and mesh.size > 1
        and cfg.model.embedding_grad in ("auto", "dense")
    ):
        from jodalrob_twotower_tpu.parallel.sharded_embedding import (
            ShardedDenseGradLookup,
        )

        from jodalrob_twotower_tpu.models.embedding import resolve_lookup_mode

        lookup_fn = ShardedDenseGradLookup(
            mesh,
            forced=cfg.model.embedding_grad == "dense",
            lookup_mode=resolve_lookup_mode(cfg.model),
        )
    if (
        cfg.model.embedding_lookup == "onehot"
        and lookup_fn is not None
        and not getattr(lookup_fn, "supports_onehot", False)
    ):
        # loud-where-it-cannot-run contract (models/embedding.py): the
        # shard_map all-to-all exchange wins the lookup_fn branch and never
        # consults the forced mode — reject instead of silently gathering
        raise ValueError(
            "embedding_lookup='onehot' forced, but the configured embedding "
            f"sharding ({mode!r}) installs a lookup that does not carry the "
            "one-hot MXU kernel — use embedding_sharding='replicated' "
            "(ShardedDenseGradLookup runs the kernel per shard) or "
            "embedding_lookup='auto'"
        )
    if (
        cfg.model.embedding_lookup == "onehot"
        and mode == "gspmd_rows"
        and mesh is not None
        and mesh.size > 1
    ):
        # static form of the runtime check in models/embedding.py (which
        # only fires on real multi-device TPU): GSPMD cannot partition the
        # Pallas call over a row-sharded table, and a ROW-SHARDED one-hot
        # forward is a measured loss anyway — same per-shard MXU work as
        # the replicated form but adds a [B, K, D] psum every step where
        # replicated needs no collective (BENCHMARKS.md "one-hot forward
        # under row-sharded tables", round 5)
        raise ValueError(
            "embedding_lookup='onehot' cannot run under "
            "embedding_sharding='gspmd_rows' on a multi-device mesh — use "
            "'replicated' (the kernel runs per shard, zero collectives) or "
            "embedding_lookup='auto'"
        )
    return TwoTowerModel(schema, cfg.model, cfg.mesh.use_pallas_lookup, lookup_fn)
