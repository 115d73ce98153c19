"""End-to-end query pipelines (the driver-contract surface).

Every public query function takes ``sf_dir`` and returns a
``ray.data.Dataset`` (or small pyarrow Table); its oracle twin lives in
the same module as ``<name>_SQL`` so the pair stays in sync.
"""
