"""Serving library behind ``cli/serve``.

The CLI entry point (argument surface, checkpoint/export loading, mesh
setup) stays in ``cli/serve.py``; the serving machinery lives here:

* ``featurize``  — request JSON -> fixed-shape device batches (same
  code path as the offline pipeline, so serving and evaluation agree)
* ``lanes``      — continuous-decode lane construction + pool routing
* ``http``       — the ``--listen`` HTTP micro-batching front
* ``offline``    — the stdin/file pipelined and continuous loops

Split out of the original single-file CLI with zero behavior change
(tests/test_e2e.py serving suites gate the refactor).
"""
