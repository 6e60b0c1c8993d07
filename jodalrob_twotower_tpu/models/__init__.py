from jodalrob_twotower_tpu.models.embedding import EmbeddingCollection  # noqa: F401
from jodalrob_twotower_tpu.models.tower import Tower  # noqa: F401
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel  # noqa: F401


def build_model(schema, cfg, mesh=None) -> TwoTowerModel:
    """Construct the model with the embedding lookup the config asks for:
    'replicated'/'gspmd_rows' -> plain gather (XLA or Pallas per flag);
    'shard_map' -> explicit all-to-all exchange over the mesh."""
    lookup_fn = None
    if mesh is not None and cfg.mesh.embedding_sharding == "shard_map":
        from jodalrob_twotower_tpu.parallel.sharded_embedding import make_sharded_lookup

        lookup_fn = make_sharded_lookup(mesh)
    return TwoTowerModel(schema, cfg.model, cfg.mesh.use_pallas_lookup, lookup_fn)
