"""Transient-vs-fatal error classification + bounded backoff retry.

Reference parity (R1/R2, SURVEY.md §2.6):
- ``is_transient_error`` mirrors the reference's classifier
  (/root/reference/scylla-cdc/src/stream_reader.rs:97-154): timeouts,
  broken connections, overload/unavailable ⇒ transient (retry);
  syntax/parse/corrupt-data/auth/config errors ⇒ fatal (propagate).
- ``retry_with_backoff`` is the reference's paged-read retry loop
  (stream_reader.rs:156-186: sleep-and-retry while transient, propagate
  otherwise), applied here to the engine's own driver-side IO (store
  snapshot writes, manifest flips) — executor-side task faults are
  delegated to Spark's task retry (spark.task.maxFailures), which
  retries the same deterministic task exactly like the reference
  re-issues the same page query.

The Spark-side fatal class is data corruption: a corrupt log file must
abort the replay loudly (no retry storm, no silent skip) — the engine
never sets spark.sql.files.ignoreCorruptFiles.
"""

from __future__ import annotations

import errno
import time
from typing import Callable, TypeVar

T = TypeVar("T")

#: OS-level errno values that behave like the reference's transient set
#: (Unavailable / Overloaded / timeouts, stream_reader.rs:106-112)
_TRANSIENT_ERRNOS = {
    errno.EAGAIN,
    errno.EBUSY,
    errno.ETIMEDOUT,
    errno.ECONNRESET,
    errno.ECONNREFUSED,
    errno.ENETUNREACH,
    errno.EIO,
    errno.ENOSPC,  # object-store backpressure analog
}


def is_transient_error(exc: BaseException) -> bool:
    """stream_reader.rs:97-154 mapped onto the engine's failure surface.

    Transient (retry): timeouts, interrupted/failed IO, connection-ish
    OS errors.  Fatal (propagate): corrupt/unparseable data, bad
    arguments, schema/config errors — retrying cannot help.
    """
    if isinstance(exc, TimeoutError):
        return True
    if isinstance(exc, OSError):
        # unknown errno ⇒ conservative retry, like RequestTimeout
        return exc.errno is None or exc.errno in _TRANSIENT_ERRNOS
    # ValueError/TypeError/KeyError (parse/corrupt/config) and any
    # analysis-time Spark error are fatal, like DbError::SyntaxError /
    # CqlResultParseError (stream_reader.rs:113-139)
    return False


def retry_with_backoff(
    fn: Callable[[], T],
    retries: int = 4,
    base_sleep_s: float = 0.05,
    classifier: Callable[[BaseException], bool] = is_transient_error,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run ``fn``; retry transient failures with exponential backoff,
    propagate fatal ones immediately (stream_reader.rs:156-186)."""
    attempt = 0
    while True:
        try:
            return fn()
        except BaseException as exc:  # noqa: BLE001 — classified below
            if not classifier(exc) or attempt >= retries:
                raise
            sleep(base_sleep_s * (2**attempt))
            attempt += 1
