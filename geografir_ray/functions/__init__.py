"""Pure vectorized kernels: numpy / pyarrow only, no Ray imports.

Everything here is a deterministic function of its inputs so Ray task
retries are idempotent and lineage-based reconstruction is safe.
"""
