"""Deterministic hash routing: document id → shard.

This is the reference's core machinery re-expressed for Spark. In
elastic-freight a custom Hadoop ``Partitioner`` routes every document
to the reducer that owns its Elasticsearch shard:
``floorMod(Murmur3(docId), numShards)`` with ES's Murmur3 flavour
(x86_32, seed 0, over the UTF-16LE bytes of the id) — see reference
``src/main/java/com/simondata/elasticfreight/index/routing/
ElasticsearchRoutingStrategyV5.java:115-118`` and
``util/ShardPartitioner.java:35-39``.

Three implementations, fastest first:

* :func:`shard_col` — Spark's built-in ``hash`` (Murmur3 x86_32, seed
  42) + ``pmod``. Identical distribution guarantees, different
  constant. JVM-side, whole-stage-codegen'd; the default for every
  internal pipeline.
* :func:`lcg_shard_col` — a Lehmer LCG on integer keys built from
  pure arithmetic (``pmod``/multiply), so the *identical* expression
  runs on any ANSI SQL engine. Used for the DuckDB-oracle correctness
  harness where the shard assignment itself must be reproducible
  outside Spark.
* :func:`es_murmur3_shard_udf` — bit-exact ES 5.x parity (needed only
  if the built artifact must be restorable into a real ES cluster).
  Arrow-batched pandas UDF around a pure-Python murmur3_x86_32.

Also: shard-pruned lookup support. The reference's only query-side
logic is ``getPossibleRoutingHashes`` (ElasticsearchRoutingStrategyV5
.java:97-113): given a doc id, the subset of shards that may contain
it. With routing == doc id that subset is exactly one shard; in
Spark, filtering on the ``shard`` partition column makes the scan skip
every other partition directory (partition pruning).
"""

from __future__ import annotations

import sys

import pandas as pd
import pyspark.cloudpickle
from pyspark.sql import Column, functions as F
from pyspark.sql.types import IntegerType

# The ES-parity pandas UDFs below are module-level functions; without
# by-value registration, workers spawned from a driver whose cwd
# doesn't have this repo on sys.path fail with ModuleNotFoundError
# (same discipline as streaming/structured.py and multimodal.py).
pyspark.cloudpickle.register_pickle_by_value(sys.modules[__name__])

# ---------------------------------------------------------------------------
# Fast path: Spark built-in murmur3 (seed 42)
# ---------------------------------------------------------------------------


def shard_col(col: Column | str, num_shards: int) -> Column:
    """``pmod(murmur3(col), num_shards)`` — the default routing.

    JVM-side and codegen'd; at 100 TB this is the only variant that
    should touch the hot path.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.hash(c), F.lit(num_shards)).cast(IntegerType())


# ---------------------------------------------------------------------------
# Oracle-portable path: Lehmer LCG on integer ids (pure ANSI arithmetic)
# ---------------------------------------------------------------------------

_LCG_M = 2147483647  # 2^31 - 1 (Mersenne prime)
_LCG_A = 48271  # MINSTD multiplier


def lcg_shard_col(col: Column | str, num_shards: int) -> Column:
    """Shard assignment from pure arithmetic on an integer key.

    ``h = ((key mod M) * A) mod M; shard = h mod N`` with
    M = 2^31-1, A = 48271 (MINSTD). Every step fits in int64 with no
    overflow, so the same expression evaluates identically in Spark,
    DuckDB, or any ANSI engine — which is what makes the sharded-write
    pipeline *oracle-checkable*.
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.pmod(F.pmod(c.cast("long"), F.lit(_LCG_M)) * F.lit(_LCG_A), F.lit(_LCG_M))
    return F.pmod(h, F.lit(num_shards)).cast(IntegerType())


def lcg_shard_sql(col_name: str, num_shards: int) -> str:
    """The ANSI-SQL text equivalent of :func:`lcg_shard_col`.

    Usable verbatim in DuckDB (and Spark SQL) for differential
    testing.
    """
    return (
        f"CAST((((({col_name} % {_LCG_M}) + {_LCG_M}) % {_LCG_M}) * {_LCG_A}) "
        f"% {_LCG_M} % {num_shards} AS INT)"
    )


# ---------------------------------------------------------------------------
# Exact ES 5.x parity path (UTF-16LE, seed 0, floorMod)
# ---------------------------------------------------------------------------


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Pure-Python MurmurHash3 x86_32. Returns a *signed* 32-bit int,
    matching Java/Lucene's ``StringHelper.murmurhash3_x86_32``."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    length = len(data)
    nblocks = length // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[nblocks * 4 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - 0x100000000 if h & 0x80000000 else h


def es_routing_hash(routing: str) -> int:
    """ES 5.x ``Murmur3HashFunction.hash(String)``: murmur3_x86_32
    over the UTF-16LE code-unit bytes of the string, seed 0."""
    return murmur3_x86_32(routing.encode("utf-16-le"), seed=0)


def es_shard(routing: str, num_shards: int) -> int:
    """``Math.floorMod(hash(routing), numShards)`` — exact ES shard id
    (ElasticsearchRoutingStrategyV5.java:115-118)."""
    return es_routing_hash(routing) % num_shards  # Python % == floorMod


def es_murmur3_shard_udf(num_shards: int):
    """Arrow-batched pandas UDF computing the exact ES shard.

    Only for real-ES restore parity; the default pipelines use
    :func:`shard_col` (JVM-side).
    """

    @F.pandas_udf(IntegerType())
    def _es_shard(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else es_shard(str(v), num_shards)).astype(
            "Int32"
        )

    return _es_shard


def possible_shards(doc_id: str, num_shards: int) -> list[int]:
    """Query-side shard pruning: the set of shards that can contain a
    document (reference ``getPossibleRoutingHashes``,
    ElasticsearchRoutingStrategyV5.java:97-113). With routing == doc
    id this is exactly one shard."""
    return [es_shard(doc_id, num_shards)]


# ---------------------------------------------------------------------------
# Org → k-of-N shard-subset routing
# ---------------------------------------------------------------------------
#
# The reference *documents* this scheme but never implemented it
# (ElasticsearchRoutingStrategyV5.java:18-40 javadoc: route each org to
# a subset of shards instead of one, so a hot org neither owns a whole
# shard nor fans out to all N). Elasticsearch later shipped it as
# ``index.routing_partition_size``: shard = (hash(routing) +
# hash(id) mod k) mod N — the org hash picks a k-wide window, the doc
# hash spreads within it. Query side: an org filter probes only its k
# shards (partition pruning), not all N.


def org_subset_shard_col(
    org_col: Column | str, id_col: Column | str, num_shards: int, partition_size: int
) -> Column:
    """JVM fast path: ``pmod(hash(org) + pmod(hash(id), k), N)``."""
    org = F.col(org_col) if isinstance(org_col, str) else org_col
    doc = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(
        F.hash(org) + F.pmod(F.hash(doc), F.lit(partition_size)), F.lit(num_shards)
    ).cast(IntegerType())


def _lcg_h_col(col: Column) -> Column:
    return F.pmod(F.pmod(col.cast("long"), F.lit(_LCG_M)) * F.lit(_LCG_A), F.lit(_LCG_M))


def _lcg_h_sql(col_name: str) -> str:
    return f"(((({col_name} % {_LCG_M}) + {_LCG_M}) % {_LCG_M}) * {_LCG_A}) % {_LCG_M}"


def lcg_org_subset_shard_col(
    org_col: Column | str, id_col: Column | str, num_shards: int, partition_size: int
) -> Column:
    """Oracle-portable org-subset routing on integer keys (same LCG
    arithmetic as :func:`lcg_shard_col`, so DuckDB reproduces the
    assignment bit-for-bit)."""
    org = F.col(org_col) if isinstance(org_col, str) else org_col
    doc = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(
        _lcg_h_col(org) + F.pmod(_lcg_h_col(doc), F.lit(partition_size)),
        F.lit(num_shards),
    ).cast(IntegerType())


def lcg_org_subset_shard_sql(
    org_name: str, id_name: str, num_shards: int, partition_size: int
) -> str:
    """ANSI-SQL text twin of :func:`lcg_org_subset_shard_col`."""
    return (
        f"CAST((({_lcg_h_sql(org_name)}) + (({_lcg_h_sql(id_name)}) % {partition_size}))"
        f" % {num_shards} AS INT)"
    )


def lcg_possible_org_shards(org_value: int, num_shards: int, partition_size: int) -> list[int]:
    """Query-side pruning for org-routed indexes: the (at most k)
    shards that can hold the org's documents — the org-routing
    analogue of ``getPossibleRoutingHashes``
    (ElasticsearchRoutingStrategyV5.java:97-113)."""
    h = ((org_value % _LCG_M) + _LCG_M) % _LCG_M * _LCG_A % _LCG_M
    return sorted({(h + j) % num_shards for j in range(partition_size)})


def shard_to_routing(num_shards: int, max_probe: int = 1_000_000) -> dict[int, str]:
    """Inverse map: for each shard i, a routing string that hashes
    back to shard i (reference ``shardToRout`` precompute,
    ElasticsearchRoutingStrategyV5.java:46-55). Needed only to
    *address* a specific ES shard when writing; Spark controls
    partition placement directly so this is a parity utility."""
    out: dict[int, str] = {}
    for probe in range(max_probe):
        s = es_shard(str(probe), num_shards)
        if s not in out:
            out[s] = str(probe)
            if len(out) == num_shards:
                break
    return out
