from jodalrob_twotower_tpu.parallel.mesh import make_mesh, batch_sharding  # noqa: F401
from jodalrob_twotower_tpu.parallel.sharded_train import (  # noqa: F401
    make_sharded_train,
    state_shardings,
)
from jodalrob_twotower_tpu.parallel.sharded_sparse import (  # noqa: F401
    make_sharded_sparse_train,
    sparse_state_shardings,
)
