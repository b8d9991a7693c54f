"""Atomic-write hardening of jax's persistent compile cache
(hmmc_tpu/utils/xla_cache.py; see docs/design.md "Test-gate
reliability" for the torn-entry failure it prevents)."""

import os

from hmmc_tpu.utils.xla_cache import harden_cache_writes


def _make_cache(tmp_path):
    from jax._src.lru_cache import LRUCache

    return LRUCache(str(tmp_path / "cache"), max_size=-1)


def test_put_is_atomic_and_get_roundtrips(tmp_path):
    harden_cache_writes()
    cache = _make_cache(tmp_path)
    cache.put("k1", b"payload-1")
    assert cache.get("k1") == b"payload-1"
    # the write went through a temp file + rename: no temp residue
    assert not list((tmp_path / "cache").glob(".tmp-*"))
    # existing entries are never overwritten (jax's put contract)
    cache.put("k1", b"payload-2")
    assert cache.get("k1") == b"payload-1"


def test_put_sweeps_stale_temp_files(tmp_path):
    harden_cache_writes()
    cache = _make_cache(tmp_path)
    stale = tmp_path / "cache" / ".tmp-999-deadbeef"
    stale.write_bytes(b"torn")
    old = os.stat(stale).st_mtime - 3600
    os.utime(stale, (old, old))
    fresh = tmp_path / "cache" / ".tmp-998-cafecafe"
    fresh.write_bytes(b"in-flight")
    cache.put("k2", b"v")
    assert not stale.exists()       # orphan from a killed process: reaped
    assert fresh.exists()           # a live writer's temp is left alone
    assert cache.get("k2") == b"v"


def test_harden_is_idempotent(tmp_path):
    harden_cache_writes()
    harden_cache_writes()
    cache = _make_cache(tmp_path)
    cache.put("k3", b"v3")
    assert cache.get("k3") == b"v3"
