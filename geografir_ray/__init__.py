"""geografir_ray — a Ray-Data-native spatial-join + tiling engine.

A brand-new engine (NOT a port) with the query / data-processing
capabilities of Vibrant-Planet/geografir, re-expressed Ray-Data-first:

- every logical table is a ``ray.data.Dataset`` of Arrow blocks;
- every operator is a vectorized ``map_batches`` transform
  (``batch_format="pyarrow"``, zero-copy) or an explicit shuffle
  (``groupby`` / ``sort`` / ``join``) with a documented partition key;
- stateful stages (gazetteers, spatial indexes, tile encoders) are
  actor pools — state built once per actor in ``__init__``;
- wide binary payloads (html) are projected away at the read.

Layout:
    functions/  pure numpy/pyarrow kernels (no Ray imports)
    sources/    readers + deterministic synthetic table generators
    stages/     map_batches stage callables (stateless fns + actor classes)
    state/      object locations, checkpoint/lineage, broadcast helpers
    pipelines/  end-to-end query pipelines (driver contract surface)

Library code NEVER calls ``ray.init()`` — sessions are owned by the
driver, ``bench.py``, CLI entry points, and the test fixture only.
"""

__version__ = "0.1.0"

# Large-array malloc tuning (functions/allocator.py): every Ray worker
# imports this package when unpickling a stage function, so one call
# here reaches all task/actor processes. Measured 6.5x on the
# 100MB-temp churn the ANN / partition-heavy stages generate.
from .functions.allocator import tune_malloc as _tune_malloc

_tune_malloc()
del _tune_malloc
