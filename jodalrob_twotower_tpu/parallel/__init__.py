from jodalrob_twotower_tpu.parallel.mesh import make_mesh, batch_sharding  # noqa: F401
from jodalrob_twotower_tpu.parallel.sharded_train import (  # noqa: F401
    make_sharded_train,
    state_shardings,
)
