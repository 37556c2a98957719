"""Deterministic synthetic clips + transcript-index generator (FIXTURES.md).

The reference's test strategy is golden fixtures + category-labeled corpora
(tests/test_errorCheck.py:28-117, tests/testAllCorrect.xml); here fixtures
are synthesized — seeded, pure per-row functions of the row index, generated
DISTRIBUTED via ``mapInPandas`` over ``spark.range`` so the same code scales
from a 100-row fixture to the SF=0.1 bench table without a driver bottleneck.

Anomaly categories are injected by row-index arithmetic (id % CYCLE lands in
a category window), so any slice of the table has a known violation census.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from anzlic_validator_spark.functions.audio import encode, ref_signal

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu zero one two three four five"
).split()

CODECS = ("pcm_s16le", "wav", "flac")
SRS = (8000, 16000, 22050, 44100)

# anomaly windows inside each cycle of CYCLE ids; ids whose (id % CYCLE) is
# ≥ CLEAN_BELOW fall into one of these categories (correct rows otherwise)
CYCLE = 1000
CLEAN_BELOW = 940
CATEGORIES = (
    ("dup", 940, 950),              # duplicate clip_id
    ("null_transcript", 950, 955),
    ("empty_transcript", 955, 960),
    ("bad_codec", 960, 965),        # codec outside vocabulary
    ("sr_mismatch", 965, 970),      # column sr != encoded stream sr
    ("dur_mismatch", 970, 975),     # column dur off by +500ms
    ("corrupt", 975, 980),          # truncated bytes
    ("low_snr", 980, 990),          # heavy noise → SNR < 30dB
    ("bad_id_format", 990, 995),    # clip_id breaks the format rule
    ("short_dur", 995, 1000),       # dur_ms below range minimum
)


def category_of(i: int) -> str:
    m = i % CYCLE
    if m < CLEAN_BELOW:
        return "correct"
    for name, lo, hi in CATEGORIES:
        if lo <= m < hi:
            return name
    return "correct"


def _transcript(i: int) -> str:
    n_tok = 5 + (i % 8)
    return " ".join(WORDS[(i * 7 + j * 13) % len(WORDS)] for j in range(n_tok))


def _clip_row(i: int, seed: int, with_audio: bool) -> dict:
    cat = category_of(i)
    if cat == "dup":
        # a true duplicate of the previous (correct) row — only the
        # uniqueness rule fires, nothing else
        return _clip_row(i - 1, seed, with_audio)

    sr = SRS[i % len(SRS)]
    dur_ms = 200 + (i * 37) % 1801
    codec = CODECS[i % len(CODECS)]
    clip_id = f"clip-{i:012d}"

    if cat == "bad_id_format":
        clip_id = f"CLIP_{i}"
    elif cat == "short_dur":
        dur_ms = 50  # below the range rule's minimum
    elif cat == "sr_mismatch":
        codec = "wav" if i % 2 else "flac"  # needs an sr-bearing container

    transcript: str | None = _transcript(i)
    if cat == "null_transcript":
        transcript = None
    elif cat == "empty_transcript":
        transcript = "  "

    b = None
    if with_audio:
        n = sr * dur_ms // 1000
        sig = ref_signal(i, sr, n, seed)
        if cat == "low_snr":
            rng = np.random.Generator(np.random.Philox(key=np.uint64(seed * 7919) ^ np.uint64(i)))
            sig = np.clip(sig + 0.6 * rng.standard_normal(n).astype(np.float32), -1, 1)
        if cat == "sr_mismatch":
            # container claims double the rate the column claims
            b = encode(sig, sr * 2, codec)
        else:
            b = encode(sig, sr, codec)
        if cat == "corrupt":
            b = b[: (len(b) // 2) | 1]  # odd-length truncation → decode error

    if cat == "bad_codec":
        codec = "mp3"  # vocabulary + decode violation
    if cat == "dur_mismatch":
        dur_ms = dur_ms + 500  # column no longer matches encoded length

    return {
        "clip_id": clip_id,
        "bytes": b,
        "sr_hz": np.int32(sr),
        "dur_ms": np.int32(dur_ms),
        "codec": codec,
        "transcript": transcript,
    }


CLIPS_DDL = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
)


def clips(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    with_audio: bool = True,
    clean: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthetic clips table. ``clean=True`` keeps only 'correct' rows
    (the golden all-pass fixture, ≙ tests/testAllCorrect.xml)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                if clean and category_of(int(i)) != "correct":
                    continue
                rows.append(_clip_row(int(i), seed, with_audio))
            yield pd.DataFrame(
                rows, columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
            )

    rng_df = spark.range(0, n_rows, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, CLIPS_DDL)


INDEX_DDL = "clip_id string, transcript_ref string, expected_codec string"


def transcript_index(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    missing_every: int = 101,
    mismatch_every: int = 97,
    num_partitions: int | None = None,
) -> DataFrame:
    """Authority table for referential rules (FIXTURES.md §2).

    Every ``missing_every``-th clip_id is absent (→ missing_ref violations);
    every ``mismatch_every``-th transcript differs (→ incorrect violations).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                i = int(i)
                if i % missing_every == missing_every - 1:
                    continue
                t = _transcript(i)
                if i % mismatch_every == mismatch_every - 1:
                    t = t + " extra"
                rows.append(
                    {
                        "clip_id": f"clip-{i:012d}",
                        "transcript_ref": t,
                        "expected_codec": CODECS[i % len(CODECS)],
                    }
                )
            yield pd.DataFrame(rows, columns=["clip_id", "transcript_ref", "expected_codec"])

    rng_df = spark.range(0, n_rows, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, INDEX_DDL)
