from jodalrob_twotower_tpu.ops.embedding_lookup import embedding_lookup  # noqa: F401
