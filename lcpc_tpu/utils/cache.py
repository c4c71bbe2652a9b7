"""Persistent XLA compilation cache setup.

The limb-arithmetic graphs are large (W^2-ish); caching compiled executables
across processes keeps test/bench iteration fast.  Safe to call repeatedly.

jax's LRUCache.put writes entries with a bare ``Path.write_bytes`` — NOT
atomic.  Two lcpc processes compiling the same shape (e.g. a pytest run
overlapping a bench sweep) race: the reader sees a partially-written file,
zstd/XLA deserialization gets truncated bytes, and the process dies with
``Fatal Python error: Aborted`` inside ``get_executable_and_time`` — the
nondeterministic "suite segfault" of earlier rounds.  ``_make_puts_atomic``
replaces the writer with tempfile + ``os.replace`` (atomic on POSIX), so a
reader only ever observes complete entries.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")

_patched = False


def _make_puts_atomic() -> None:
    """Monkeypatch jax's cache write to tempfile + atomic rename.

    Mirrors jax._src.lru_cache.LRUCache.put (same existence check, eviction
    bookkeeping, and locking) with only the final write made atomic.
    """
    global _patched
    if _patched:
        return
    try:
        import tempfile
        import time
        import warnings

        from jax._src import lru_cache

        suffix = lru_cache._CACHE_SUFFIX
        atime_suffix = lru_cache._ATIME_SUFFIX

        def atomic_put(self, key: str, val: bytes) -> None:
            if not key:
                raise ValueError("key cannot be empty")
            if self.eviction_enabled and len(val) > self.max_size:
                warnings.warn(
                    f"Cache value for key {key!r} of size {len(val)} bytes "
                    f"exceeds the maximum cache size of {self.max_size} bytes"
                )
                return
            cache_path = self.path / f"{key}{suffix}"
            if self.eviction_enabled:
                self.lock.acquire(timeout=self.lock_timeout_secs)
            try:
                if cache_path.exists():
                    return
                self._evict_if_needed(additional_size=len(val))
                fd, tmp = tempfile.mkstemp(
                    dir=str(self.path), prefix=cache_path.name,
                    suffix=".tmp",
                )
                try:
                    with os.fdopen(fd, "wb") as f:
                        f.write(val)
                    # mkstemp creates 0600; entries in a shared cache dir
                    # must stay readable to other users like write_bytes'
                    # umask-derived mode would be
                    os.chmod(tmp, 0o666 & ~_umask())
                    os.replace(tmp, str(cache_path))
                except BaseException:
                    try:
                        os.unlink(tmp)
                    except OSError:
                        pass
                    raise
                if self.eviction_enabled:
                    timestamp = time.time_ns().to_bytes(8, "little")
                    atime_path = self.path / f"{key}{atime_suffix}"
                    atime_path.write_bytes(timestamp)
            finally:
                if self.eviction_enabled:
                    self.lock.release()

        lru_cache.LRUCache.put = atomic_put
        _patched = True
    except Exception:
        # unexpected jax layout: fall back to the stock (racy) writer
        pass


def _umask() -> int:
    m = os.umask(0)
    os.umask(m)
    return m


def _sweep_stale_tmp(path: str) -> None:
    """Remove crash-orphaned *.tmp cache writes (they never match the
    *-cache eviction glob, so they would otherwise accumulate forever)."""
    import time

    try:
        now = time.time()
        for name in os.listdir(path):
            if not name.endswith(".tmp"):
                continue
            full = os.path.join(path, name)
            try:
                # only clearly-stale files: a live writer finishes in seconds
                if now - os.path.getmtime(full) > 3600:
                    os.unlink(full)
            except OSError:
                pass
    except OSError:
        pass


def enable_compilation_cache(path: str | None = None) -> None:
    path = path or os.environ.get("LCPC_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    _sweep_stale_tmp(path)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    _make_puts_atomic()
