"""DataContext tuning for the engine's workload shape.

Call ``tune()`` once after ray.init (bench/jobs/tests do); it is safe
to call repeatedly.  Values follow the build brief: blocks sized so a
batch x concurrency fits worker heaps, order preserved only where a
pipeline explicitly sorts, progress bars off for clean logs.
"""

from __future__ import annotations


def tune(
    target_max_block_size_mb: int = 128,
    preserve_order: bool = False,
    quiet: bool = True,
) -> None:
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.target_max_block_size = target_max_block_size_mb * 1024 * 1024
    ctx.execution_options.preserve_order = preserve_order
    if quiet:
        ctx.enable_progress_bars = False
