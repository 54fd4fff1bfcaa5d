"""Dataset stages: per-batch transforms and actor-pool stages.

Every stage is either a plain function (stateless ``map_batches`` task)
or a callable class (actor pool; state built once in ``__init__``), per
SURVEY.md §7.2.  All hot paths are ``batch_format="pyarrow"`` with
``pyarrow.compute`` / numpy kernels — no per-row Python.
"""
