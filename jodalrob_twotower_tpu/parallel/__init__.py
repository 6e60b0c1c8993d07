from jodalrob_twotower_tpu.parallel.mesh import make_mesh, batch_sharding  # noqa: F401
from jodalrob_twotower_tpu.parallel.sharded_train import (  # noqa: F401
    make_sharded_train,
    state_shardings,
)
from jodalrob_twotower_tpu.parallel.sharded_sparse import (  # noqa: F401
    make_sharded_sparse_train,
    sparse_state_shardings,
)
from jodalrob_twotower_tpu.parallel.sharded_store import (  # noqa: F401
    make_store_gather,
    put_row_sharded_store,
    resolve_store_placement,
)
from jodalrob_twotower_tpu.parallel.compressed_grads import (  # noqa: F401
    compressed_psum_tree,
    make_dp_compressed_indexed_train,
    make_dp_compressed_train_step,
)
