"""State-store provider selection for the stateful streaming operators.

The default HDFSBackedStateStoreProvider keeps every state row on the
executor heap — fine for tests, impossible at the north-star scale
(10^10-URL frontier: per-host seen-sets + deferred backlogs far exceed
heap; streaming/feedback.py's scale note).  Spark ships an off-heap
RocksDB provider for exactly this; selecting it is one session conf,
and the operator code (applyInPandasWithState folds in ratelimit.py /
feedback.py / stateful.py) is provider-agnostic by construction.

This module makes the switch explicit and testable:

- ``rocksdb_confs()`` — the conf dict a production ``spark-submit``
  would pass (provider class + changelog checkpointing, which turns
  per-batch checkpoint uploads into deltas instead of full SST
  snapshots — the same append-only-delta discipline as the batch
  engine's visited-shard checkpoints);
- ``state_store_provider(spark, "rocksdb")`` — a context manager that
  applies the confs for queries STARTED inside it and restores the
  previous session values after (the provider is captured at query
  start; a restart from an existing checkpoint must keep the provider
  it started with).

Evidence that the provider engaged comes from query progress: the
RocksDB provider reports ``rocksdb*`` custom metrics per stateful
operator (``provider_custom_metrics``), which
tests/test_rocksdb_state.py asserts alongside result equality with the
default provider.
"""

from __future__ import annotations

from contextlib import contextmanager

ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming."
                    "state.RocksDBStateStoreProvider")
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_KEY = ("spark.sql.streaming.stateStore.rocksdb."
                  "changelogCheckpointing.enabled")


def rocksdb_confs() -> dict[str, str]:
    """The production conf set: off-heap RocksDB state + changelog
    (delta) checkpointing."""
    return {_PROVIDER_KEY: ROCKSDB_PROVIDER, _CHANGELOG_KEY: "true"}


@contextmanager
def state_store_provider(spark, provider: str = "rocksdb"):
    """Apply the named provider ('rocksdb' or 'default') to queries
    started inside the block; restore prior session confs on exit."""
    confs = rocksdb_confs() if provider == "rocksdb" else {}
    saved: dict[str, str | None] = {}
    for k in (_PROVIDER_KEY, _CHANGELOG_KEY):
        saved[k] = spark.conf.get(k, None)
    try:
        if provider == "rocksdb":
            for k, v in confs.items():
                spark.conf.set(k, v)
        else:
            for k in saved:
                spark.conf.unset(k)
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def provider_custom_metrics(query) -> dict:
    """The first stateful operator's customMetrics from the query's
    last progress ({} before any progress).  Under RocksDB the keys
    are rocksdb*-prefixed; under the default provider they are not."""
    p = query.lastProgress
    if not p or not p.get("stateOperators"):
        return {}
    return p["stateOperators"][0].get("customMetrics") or {}
