"""Multi-chip parallelism: meshes, shardings, pjit-compiled steps.

The reference is a single-process single-GPU app (SURVEY.md §2.4); this
package is where the TPU rebuild adds first-class scale-out:

* data parallelism — batches of images/frames/views sharded over a ``dp``
  mesh axis (XLA inserts the gradient psum);
* tensor parallelism — conv channel dimensions sharded over ``tp``
  (all-gather/reduce-scatter ride the ICI);
* everything is expressed as `jax.sharding.NamedSharding` annotations on a
  `jax.sharding.Mesh`; no hand-written collectives in the model code.
"""

from aip_tpu.parallel.mesh import make_mesh, best_grid
from aip_tpu.parallel.sharding import (
    conv_param_sharding,
    batch_sharding,
    replicated,
)
