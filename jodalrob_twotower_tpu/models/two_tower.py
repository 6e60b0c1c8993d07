"""Two-tower model: notice tower + company tower.

Capability parity with the reference ``TwoTowerModel``
(two_tower_model.py:10-120): paired forward returning both embeddings,
optional similarity matrix scaled by temperature, and single-side encoders
for index building / serving. Final dims always match because both towers
share one :class:`ModelConfig` (the reference asserted this at runtime,
two_tower_model.py:38-39).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from jodalrob_twotower_tpu.config import ModelConfig
from jodalrob_twotower_tpu.data.types import PairBatch, TowerBatch
from jodalrob_twotower_tpu.models.tower import Tower
from jodalrob_twotower_tpu.schema import TwoTowerSchema


class TwoTowerModel(nn.Module):
    schema: TwoTowerSchema
    config: ModelConfig
    use_pallas_lookup: bool = False
    lookup_fn: object | None = None  # custom embedding lookup (sharded path)

    def setup(self) -> None:
        self.notice_tower = Tower(
            self.schema.notice, self.config, self.use_pallas_lookup,
            self.lookup_fn, name="notice_tower"
        )
        self.company_tower = Tower(
            self.schema.company, self.config, self.use_pallas_lookup,
            self.lookup_fn, name="company_tower"
        )

    def __call__(self, batch: PairBatch, *, train: bool = False, emb_overrides=None):
        """Returns (notice_emb, company_emb), both [B, final_dim], L2-normalized.

        ``emb_overrides``: optional (notice_emb_acts, company_emb_acts) pair
        substituting the categorical embedding activations (sparse-table
        training path)."""
        n_ov, c_ov = emb_overrides if emb_overrides is not None else (None, None)
        return (
            self.notice_tower(batch.notice, train=train, emb_override=n_ov),
            self.company_tower(batch.company, train=train, emb_override=c_ov),
        )

    def encode_notice(self, batch: TowerBatch, *, train: bool = False) -> jax.Array:
        return self.notice_tower(batch, train=train)

    def encode_company(self, batch: TowerBatch, *, train: bool = False) -> jax.Array:
        return self.company_tower(batch, train=train)

    def similarity(self, batch: PairBatch, *, temperature: float = 1.0, train: bool = False):
        """(notice_emb, company_emb, similarity [B, B] / temperature)."""
        n, c = self(batch, train=train)
        sim = jnp.dot(n, c.T, preferred_element_type=jnp.float32) / temperature
        return n, c, sim
