"""map_batches stage callables.

Convention: every stage is either a pure function
``(pa.Table) -> pa.Table`` (stateless task) or a callable class whose
``__init__`` builds per-actor state and whose ``__call__`` transforms a
batch (actor pool).  All hot paths are ``batch_format="pyarrow"`` or
``"numpy"`` — never per-row Python.
"""
