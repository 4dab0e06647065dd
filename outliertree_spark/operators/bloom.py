"""Bloom-filter membership screen — the scale path for set-membership
gates (decontamination blocksets, URL blocklists, revoked-document ids)
when the membership set is too large to broadcast as a raw join
dimension but its *bitmap* fits in executor memory.

Shape at 100 TB: a 1-billion-key set at 1% fpp is a ~1.2 GB bitmap —
far below a raw broadcast of the keys (~60 GB of url strings), and the
probe is a row-local map with ZERO shuffle of the corpus.  The build is
fully distributed: each key expands to its k bit positions via
JVM-side ``xxhash64(seed_i, key)`` (codegen, no Python), positions pack
into 64-bit words with a ``bit_or`` map-side-combined aggregation whose
output is bounded by m/64 rows REGARDLESS of key count, and only those
packed words are collected.  The probe computes the SAME k positions
JVM-side and tests bits in one vectorized NumPy pass inside an Arrow
``pandas_udf`` (the bitmap rides the UDF closure, serialized once per
executor — the standard Spark broadcast-variable pattern).

Bloom guarantees by construction: NO false negatives (every inserted
key probes true), false positives at ~``fpp``.  ``bloom_screen``
therefore composes the probe with an exact verify join over the tiny
surviving slice, making the end-to-end result EXACT — the bloom is a
pushdown-style prefilter that keeps ~``fpp`` of the corpus off the
verify join instead of all of it.  This is the same screen-then-verify
discipline as the LSH/IVF near-dup family (candidates may over-approximate,
the verify step is exact).

Why not ``DataFrame.stat.bloomFilter``: the JVM ``BloomFilter`` object
cannot be probed from Catalyst expressions or Arrow workers without a
row-at-a-time py4j round trip; building positions with plain
``xxhash64`` keeps both sides in codegen and the filter portable
(the packed words are plain longs — they could be persisted and reused
across jobs).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: m bits and k hashes for ``n_items`` keys at
    ``fpp`` false-positive rate.  m is rounded up to a multiple of 64."""
    n = max(int(n_items), 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _positions(key: Column, m: int, k: int) -> Column:
    """array<long> of the key's k bit positions — pure codegen, shared
    verbatim by build and probe so the hash family can never drift."""
    return F.array(*[F.pmod(F.xxhash64(F.lit(i), key), F.lit(m))
                     for i in range(k)])


def build_bloom(keys: DataFrame, key_col: str, n_items: int | None = None,
                fpp: float = 0.01) -> dict:
    """Distributed build; returns ``{"m", "k", "words"}`` where
    ``words`` is the uint64 bitmap (length m/64).

    The only driver transfer is the packed non-zero words — bounded by
    m/64 rows no matter how many keys went in (the word-index groupBy
    is map-side combined, so the exchange is bounded the same way)."""
    if n_items is None:
        n_items = keys.select(key_col).distinct().count()
    m, k = bloom_params(n_items, fpp)
    pos = keys.select(F.explode(_positions(F.col(key_col), m, k))
                      .alias("_pos"))
    # the python Column API only takes literal shift amounts; the SQL
    # twin accepts an expression for the bit count
    bit = F.expr("shiftleft(1L, cast(pmod(_pos, 64) as int))")
    packed = (pos.groupBy(F.shiftright("_pos", 6).alias("_w"))
                 .agg(F.bit_or(bit).alias("_bits")))
    words = np.zeros(m // 64, dtype=np.uint64)
    for r in packed.collect():
        words[r["_w"]] = np.uint64(r["_bits"] & 0xFFFFFFFFFFFFFFFF)
    return {"m": m, "k": k, "words": words}


def might_contain(bloom: dict, key: Column) -> Column:
    """Boolean probe column.  Positions are computed JVM-side (identical
    expressions to the build); the bit test is one vectorized NumPy
    gather+shift over the Arrow batch.  NULL keys probe false.

    The UDF is marked nondeterministic — not because it is, but to stop
    Catalyst's constraint inference from duplicating the probe filter
    onto the OTHER side of the downstream verify semi-join (observed in
    the plan audit: the key dimension got a second full Arrow probe
    pass, pure waste at 10^9-key scale since members always probe
    true).  The probe is an explicit Filter, never a pushdown
    candidate, so nondeterminism costs nothing."""
    words = bloom["words"]
    k = bloom["k"]

    @F.pandas_udf(T.BooleanType())
    def _probe(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        p = np.stack(pos.to_numpy()).astype(np.int64)  # (batch, k)
        w = words[p >> 6]
        hit = (w >> (p & 63).astype(np.uint64)) & np.uint64(1)
        return pd.Series(hit.all(axis=1))

    _probe = _probe.asNondeterministic()
    pos = _positions(key, bloom["m"], k)
    return F.when(key.isNull(), F.lit(False)).otherwise(_probe(pos))


def bloom_screen(df: DataFrame, keys: DataFrame, key_expr: Column,
                 keys_col: str, fpp: float = 0.01,
                 n_items: int | None = None,
                 bloom: dict | None = None) -> DataFrame:
    """EXACT membership screen: rows of ``df`` whose ``key_expr`` value
    appears in ``keys[keys_col]``.  The bloom probe runs first (row
    local, no shuffle), then only the ~fpp survivors reach the exact
    left-semi verify join — which AQE broadcasts when, as intended, the
    surviving slice is small.  Equivalent to a plain semi-join by the
    no-false-negative guarantee; the bloom only changes the data volume
    entering the join."""
    if bloom is None:
        bloom = build_bloom(keys, keys_col, n_items=n_items, fpp=fpp)
    cand = df.withColumn("_key", key_expr) \
             .filter(might_contain(bloom, F.col("_key")))
    dim = keys.select(F.col(keys_col).alias("_key")).distinct()
    return cand.join(dim, "_key", "left_semi").drop("_key")
