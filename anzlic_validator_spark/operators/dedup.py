"""Deduplication operators for large-scale text corpora.

Beyond the reference's duplicate-field sweep (testing-dublin-core.py:72-83 —
exact duplicates), these are the dedup primitives a training-data pipeline
needs at 10^12-row scale. All hot paths are pure Catalyst expressions
(xxhash64 / array ops inside whole-stage codegen); only SimHash uses an
Arrow pandas UDF (bit-level ops over variable-length token lists don't
compose from built-ins).

Scale notes per operator:
- exact_duplicates: hash-groupBy on a 64-bit fingerprint (map-side combined);
  group on the hash, not the document body, so shuffle rows stay tiny.
- MinHash+LSH: signatures computed per-row (no shuffle), band buckets
  explode rows ×n_bands, the bucket groupBy is the only shuffle; candidate
  verification joins shingle sets back only for candidate pairs (a vanishing
  fraction of n²).
- n-gram Jaccard verify: exact, but only ever run on LSH candidates.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------- exact

def text_fingerprint(col: Column) -> Column:
    """Order/duplication-insensitive content fingerprint: md5 of the sorted
    distinct token set (rolling-hash analog with built-ins only)."""
    toks = F.array_sort(F.array_distinct(F.split(col, " ")))
    return F.md5(F.array_join(toks, " "))


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical texts → (grp_hash, n_docs, canonical_id).

    canonical_id = min id (the survivor a dedup pass would keep).
    """
    h = F.xxhash64(F.col(text_col)).alias("grp_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("grp_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("canonical_id"))
        .where(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------- shingles

def word_shingles(text_col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a single-space-tokenized text column."""
    toks = F.split(text_col, " ")
    n = F.size(toks)
    return F.when(n >= k, F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        )
    )).otherwise(F.array(F.array_join(toks, " ")))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(a) + F.size(b) - F.size(F.array_intersect(a, b))
    return inter / union.cast("double")


# ---------------------------------------------------------------- minhash

def minhash_signature(shingles: Column, num_hashes: int = 64) -> list[Column]:
    """num_hashes min-hash values; hash i = xxhash64(shingle, i).

    Per-row Catalyst transforms — zero shuffle, codegen'd.

    NB: the hash-function index must be baked in via a factory — a
    two-parameter lambda would make pyspark's ``transform`` pass the array
    POSITION as the second argument.
    """

    def hasher(seed: int):
        return lambda s: F.xxhash64(s, F.lit(seed))

    return [
        F.array_min(F.transform(shingles, hasher(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
    num_hashes: int = 63,
    n_bands: int = 21,
    shingle_k: int = 3,
) -> DataFrame:
    """LSH candidate generation + exact Jaccard verification.

    Returns (a_id, b_id, jac) with a_id < b_id and jac >= threshold.
    Pipeline: shingle → signature (no shuffle) → band-bucket self-join
    (the one shuffle; bucket key is (band, hash-of-band-slice)) → exact
    verify on candidates only.

    Band tuning: with b bands of r rows, P(candidate) = 1-(1-j^r)^b.
    Defaults (b=21, r=3) give recall ≥ 0.9998 at j=0.7 and ≥ 0.99 at the
    0.6 threshold while pruning j≈0.1 pairs to ~2% candidate rate; raise r
    (and num_hashes) for higher thresholds at bigger scale.
    """
    rows_per_band = num_hashes // n_bands
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_k).alias("sh"),
    )
    sig = base.select("id", "sh", *minhash_signature(F.col("sh"), num_hashes))
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
                "bh"
            ),
        )
        for b in range(n_bands)
    ]
    buckets = sig.select("id", F.explode(F.array(*band_structs)).alias("bb")).select(
        "id", "bb.band", "bb.bh"
    )
    left = buckets.alias("l")
    right = buckets.alias("r")
    candidates = (
        left.join(right, on=["band", "bh"], how="inner")
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a_id"), F.col("r.id").alias("b_id"))
        .distinct()
    )
    sh = base.select(F.col("id"), F.col("sh"))
    verified = (
        candidates.join(sh.select(F.col("id").alias("a_id"), F.col("sh").alias("sh_a")), "a_id")
        .join(sh.select(F.col("id").alias("b_id"), F.col("sh").alias("sh_b")), "b_id")
        .withColumn("jac", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jac") >= F.lit(threshold))
    )
    return verified.select("a_id", "b_id", F.round("jac", 4).alias("jac"))


def exact_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.6, shingle_k: int = 3
) -> DataFrame:
    """Brute-force O(n²) exact-Jaccard pairs — the small-scale oracle for
    the LSH path; never run this at production scale."""
    base = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), shingle_k).alias("sh")
    )
    a = base.select(F.col("id").alias("a_id"), F.col("sh").alias("sh_a"))
    b = base.select(F.col("id").alias("b_id"), F.col("sh").alias("sh_b"))
    return (
        a.crossJoin(b)
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn("jac", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jac") >= F.lit(threshold))
        .select("a_id", "b_id", F.round("jac", 4).alias("jac"))
    )


# ---------------------------------------------------------------- simhash

def simhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_tables: int = 4,
) -> DataFrame:
    """SimHash (64-bit) near-dup pairs within a Hamming radius.

    Signature via an Arrow pandas UDF (vectorized numpy bit voting); LSH by
    splitting the 64-bit key into ``n_tables`` 16-bit sub-keys — any pair
    within Hamming distance n_tables-1 shares at least one sub-key
    (pigeonhole), so candidate recall is exact for max_hamming < n_tables.
    """

    @F.pandas_udf(T.LongType())
    def simhash64(texts: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        powers = (np.uint64(1) << shifts).astype(np.uint64)
        # per-token 64-bit hash via a stable md5-based fold; memoized per
        # batch — vocabularies repeat heavily, so this converts the kernel
        # from O(rows × tokens) hashing to O(distinct tokens)
        bit_cache: dict[str, np.ndarray] = {}

        def token_bits(tok: str) -> np.ndarray:
            bits = bit_cache.get(tok)
            if bits is None:
                h = np.uint64(int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little"))
                bits = (((h >> shifts) & np.uint64(1)).astype(np.int64) * 2 - 1)
                bit_cache[tok] = bits
            return bits

        out = np.zeros(len(texts), dtype=np.int64)
        for j, t in enumerate(texts):
            toks = (t or "").split(" ")
            if not toks:
                continue
            votes = np.zeros(64, dtype=np.int64)
            for tok in toks:
                votes += token_bits(tok)
            out[j] = np.int64((powers[votes > 0]).sum(dtype=np.uint64).astype(np.int64))
        return pd.Series(out)

    base = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sig"))
    subkeys = [
        F.struct(
            F.lit(t).alias("tbl"),
            F.shiftright(F.col("sig"), t * 16).bitwiseAND(F.lit(0xFFFF)).alias("sub"),
        )
        for t in range(n_tables)
    ]
    buckets = base.select("id", "sig", F.explode(F.array(*subkeys)).alias("b")).select(
        "id", "sig", "b.tbl", "b.sub"
    )
    l, r = buckets.alias("l"), buckets.alias("r")
    cand = (
        l.join(r, on=["tbl", "sub"], how="inner")
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("a_id"),
            F.col("r.id").alias("b_id"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
