"""Versioned query-result cache with the reference's service-worker
refresh strategies, re-expressed for engine results.

Reference parity (docs/service-worker.js:1-89): the PWA caches its app
shell under a versioned cache name (`query-browser-cache-v2.55`, :1),
serves same-origin requests stale-while-revalidate (:28-58 — cached
response returned immediately, network fetch refreshes the cache),
serves third-party requests network-first with cache fallback
(:59-72), and deletes non-whitelisted cache versions on activate
(:75-89). An engine has no HTTP requests to intercept; the equivalent
asset is a MATERIALIZED QUERY RESULT, so this module caches result
DataFrames as parquet under `<cache_dir>/<CACHE_VERSION>/<key>/v-N`:

- ``fetch(strategy="stale-while-revalidate")`` — serve the cached
  parquet immediately; rebuild into a NEW version directory and swap
  the pointer, so this call reads stale data and the next call reads
  fresh (the service worker's exact contract, made synchronous — a
  Spark driver job has no background event loop to defer the refresh
  to). The returned frame reads the old version directory, which is
  kept until `prune()` — refreshing never clobbers a frame a caller
  may still be consuming (the SW clones the response for the same
  reason, :37-39).
- ``fetch(strategy="network-first")`` — rebuild; only on failure fall
  back to the cached copy (the third-party branch, :59-72).
- ``prune()`` — the activate-event cleanup: delete every version
  directory except the current pointer of each key, and every cache
  generation whose CACHE_VERSION is not this build's (:75-89).

Bumping ``CACHE_VERSION`` force-invalidates all cached results, exactly
like incrementing the reference's CACHE_NAME.

Scale note: results are written/read as plain parquet through the
executors — the cache holds result TABLES, not driver-collected rows,
so a cached result can be arbitrarily large.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

# Increment to force re-derivation of every cached result (reference:
# CACHE_NAME version bump, service-worker.js:1).
CACHE_VERSION = "v1"

STRATEGIES = ("stale-while-revalidate", "network-first")


def _key_dir(cache_dir: str, key: str) -> str:
    digest = hashlib.sha256(key.encode("utf-8")).hexdigest()
    return os.path.join(cache_dir, CACHE_VERSION, digest)


def _current_version(key_dir: str, key: str) -> str | None:
    """Current version dir for `key`, or None. The persisted _KEY file
    is verified against the requested key: a hash-slot collision (or a
    corrupted slot) must read as a MISS, never as another query's
    result."""
    ptr = os.path.join(key_dir, "_CURRENT")
    key_file = os.path.join(key_dir, "_KEY")
    if not os.path.exists(ptr):
        return None
    try:
        with open(key_file, encoding="utf-8") as fh:
            if fh.read() != key:
                return None
    except OSError:
        return None
    with open(ptr, encoding="utf-8") as fh:
        name = fh.read().strip()
    vdir = os.path.join(key_dir, name)
    return vdir if os.path.isdir(vdir) else None


def _write_version(df: DataFrame, key_dir: str, key: str) -> str:
    """Materialize df into the next version dir and swap the pointer.
    Pointer swap is a tiny atomic rename; the previous version dir is
    left for prune() so in-flight readers keep a valid source."""
    os.makedirs(key_dir, exist_ok=True)
    with open(os.path.join(key_dir, "_KEY"), "w", encoding="utf-8") as fh:
        fh.write(key)
    existing = [d for d in os.listdir(key_dir) if d.startswith("v-")]
    nxt = 1 + max((int(d[2:]) for d in existing), default=0)
    vdir = os.path.join(key_dir, f"v-{nxt}")
    df.write.mode("overwrite").parquet(vdir)
    tmp = os.path.join(key_dir, "_CURRENT.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(f"v-{nxt}")
    os.replace(tmp, os.path.join(key_dir, "_CURRENT"))
    return vdir


class ResultCache:
    """Parquet-backed, versioned result cache keyed by query text (or
    any stable string). See module docstring for the strategy map."""

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir

    def fetch(
        self,
        spark: SparkSession,
        key: str,
        build,
        strategy: str = "stale-while-revalidate",
    ) -> DataFrame:
        """Return the result for `key`, consulting the cache per
        `strategy`. `build` is a zero-arg callable producing the fresh
        DataFrame (the "network" side)."""
        if strategy not in STRATEGIES:
            raise ValueError(f"unknown strategy {strategy!r}; expected {STRATEGIES}")
        key_dir = _key_dir(self.cache_dir, key)
        cached = _current_version(key_dir, key)

        if strategy == "network-first":
            try:
                fresh_dir = _write_version(build(), key_dir, key)
                return spark.read.parquet(fresh_dir)
            except Exception:
                if cached is not None:
                    return spark.read.parquet(cached)
                raise

        # stale-while-revalidate
        if cached is None:
            fresh_dir = _write_version(build(), key_dir, key)
            return spark.read.parquet(fresh_dir)
        stale = spark.read.parquet(cached)
        # revalidate for the NEXT fetch; a failed refresh must not break
        # this fetch — the cached copy is valid, exactly the service
        # worker's contract (the network fetch failing after the cached
        # response was returned is a no-op, service-worker.js:42-50)
        try:
            _write_version(build(), key_dir, key)
        except Exception:
            pass
        return stale

    def prune(self) -> int:
        """Activate-event cleanup: drop old cache generations and
        non-current version dirs. Returns directories removed."""
        removed = 0
        if not os.path.isdir(self.cache_dir):
            return 0
        for gen in os.listdir(self.cache_dir):
            gen_dir = os.path.join(self.cache_dir, gen)
            if not os.path.isdir(gen_dir):
                continue
            if gen != CACHE_VERSION:
                shutil.rmtree(gen_dir)
                removed += 1
                continue
            for key_hash in os.listdir(gen_dir):
                key_dir = os.path.join(gen_dir, key_hash)
                if not os.path.isdir(key_dir):
                    continue
                # pruning keeps whatever the pointer names (no key check
                # needed — nothing is served here)
                ptr = os.path.join(key_dir, "_CURRENT")
                cur_name = None
                if os.path.exists(ptr):
                    with open(ptr, encoding="utf-8") as fh:
                        cur_name = fh.read().strip()
                for d in os.listdir(key_dir):
                    if d.startswith("v-") and d != cur_name:
                        shutil.rmtree(os.path.join(key_dir, d))
                        removed += 1
        return removed
