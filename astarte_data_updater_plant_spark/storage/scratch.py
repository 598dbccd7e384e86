"""Process-lifetime scratch directories for operators that spill to disk.

Several operators materialize intermediate parquet/checkpoint directories
(format round-trips, bucketed-table builds, streaming source/store/checkpoint
roots).  Their result DataFrames are LAZY — the files must outlive the
operator function and stay readable until the caller collects — so cleanup
cannot happen in a ``finally`` block.  Instead every directory is registered
here and removed once, at interpreter exit, so repeated bench/correctness
runs no longer accumulate unbounded ``/tmp`` usage (one full documents-table
copy per q136 invocation, plus s87/s88/s89 source+store+checkpoint roots).

The equivalent concern in the reference is the RabbitMQ channel/queue
lifecycle teardown in ``amqp_data_consumer.ex`` (terminate/2); for a batch
engine the resource is scratch disk, and the lifecycle is the process.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH_DIRS: list[str] = []


def _cleanup_all() -> None:
    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)


atexit.register(_cleanup_all)


def scratch_dir(prefix: str) -> str:
    """mkdtemp whose directory is removed at interpreter exit.

    Use for any operator-created directory a lazy DataFrame still needs to
    read after the operator returns (written parquet, stream checkpoints,
    file-stream sources).
    """
    path = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(path)
    return path
