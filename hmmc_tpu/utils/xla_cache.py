"""Atomic-write hardening for jax's persistent XLA compilation cache.

jax's on-disk cache (``jax._src.lru_cache.LRUCache.put``) writes entries
with a plain ``Path.write_bytes`` — NOT atomically. A process killed
mid-write (SIGTERM from a timeout wrapper, OOM kill, a crash) leaves a
TRUNCATED ``*-cache`` file behind. Such an entry can still zstd-decompress
(the stream is cut at a block boundary) and then feeds garbage to
``backend.deserialize_executable``, whose native parser is not hardened
against malformed input — observed live on this host as a hard SIGSEGV
inside ``compilation_cache.get_executable_and_time`` that reproduces on
every later run reading the same key while the same test passes in
isolation (whichever key the torn entry holds gets read at a different
point of each workload). ``put`` also skips its file lock whenever cache
eviction is disabled (the default), so two processes sharing a cache dir
(trainer + a spawned tool, or the test suite + its CLI-smoke children)
can interleave first-writes of the same key with the same torn result.

:func:`harden_cache_writes` replaces ``LRUCache.put``'s body for the
no-eviction configuration this framework uses: write to a same-directory
temp file, then ``os.replace`` (atomic on POSIX) — a reader sees either
no entry or a complete one, regardless of kills or write races. Stale
temp files from killed processes are swept on the next call.
"""

from __future__ import annotations

import logging
import os
import uuid

logger = logging.getLogger(__name__)

_PATCHED = False


def harden_cache_writes() -> None:
    """Make persistent-compile-cache writes atomic (idempotent, safe to
    call before or after the cache is first used; no-op if jax's cache
    internals move)."""
    global _PATCHED
    if _PATCHED:
        return
    try:
        from jax._src import lru_cache as _lru
    except ImportError:  # pragma: no cover - jax internals moved
        logger.warning("xla_cache: jax._src.lru_cache unavailable; "
                       "cache writes stay non-atomic")
        return

    orig_put = _lru.LRUCache.put

    def atomic_put(self, key: str, val: bytes) -> None:
        if not key:
            raise ValueError("key cannot be empty")
        # Eviction-enabled caches carry a file lock and size accounting —
        # defer to the original implementation for those (this framework
        # never enables eviction).
        if getattr(self, "eviction_enabled", False):
            return orig_put(self, key, val)

        cache_path = self.path / f"{key}-cache"
        if cache_path.exists():
            return
        tmp = self.path / f".tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        try:
            tmp.write_bytes(val)
            os.replace(tmp, cache_path)
        except OSError as e:  # pragma: no cover - disk full etc.
            logger.warning("xla_cache: atomic put failed for %r: %s", key, e)
            try:
                tmp.unlink()
            except OSError:
                pass
        # Sweep temp files orphaned by previously killed processes; a live
        # writer's temp is at most seconds old, so only reap stale ones.
        try:
            import time

            now = time.time()
            for stray in self.path.glob(".tmp-*"):
                try:
                    st = stray.stat()
                    # self.path is an etils epath.Path whose StatResult
                    # exposes `mtime`, not os.stat_result's `st_mtime`.
                    mtime = getattr(st, "st_mtime", None) or st.mtime
                    if now - mtime > 300:
                        stray.unlink()
                except OSError:
                    pass
        except Exception:  # pragma: no cover - sweeping is best-effort
            pass

    _lru.LRUCache.put = atomic_put
    _PATCHED = True
