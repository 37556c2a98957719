"""Audio content-dedup operators (exact content fp + perceptual hash)."""

import numpy as np
from pyspark.sql import Row

from anzlic_validator_spark.functions.audio import encode, ref_signal
from anzlic_validator_spark.operators.audio_dedup import (
    _phash64,
    audio_exact_duplicates,
    audio_fingerprints,
    audio_near_duplicates,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_phash_noise_robust_and_signal_discriminative():
    """Deterministic fixture (seeds pinned): a 1% additive-noise copy stays
    within Hamming 10 of its source; distinct signals sit >= 14 apart."""
    sr = 8000
    sigs = [ref_signal(j, sr, sr, seed=5) for j in range(8)]
    hs = [_phash64(s.astype(np.float64), sr) for s in sigs]
    rng = np.random.Generator(np.random.Philox(key=np.uint64(99)))
    for j, s in enumerate(sigs):
        noisy = np.clip(s + 0.01 * rng.standard_normal(len(s)).astype(np.float32), -1, 1)
        assert _ham(hs[j], _phash64(noisy.astype(np.float64), sr)) <= 10
    cross = [_ham(hs[a], hs[b]) for a in range(8) for b in range(a + 1, 8)]
    assert min(cross) >= 14


def test_audio_fingerprints_codec_invariant_and_error_path(spark):
    sr = 8000
    pcm = ref_signal(3, sr, sr // 2, seed=7)
    rows = [
        Row(clip_id="a-pcm", bytes=encode(pcm, sr, "pcm_s16le"), codec="pcm_s16le", sr_hz=sr),
        Row(clip_id="b-wav", bytes=encode(pcm, sr, "wav"), codec="wav", sr_hz=sr),
        Row(clip_id="c-flac", bytes=encode(pcm, sr, "flac"), codec="flac", sr_hz=sr),
        Row(clip_id="d-bad", bytes=encode(pcm, sr, "flac")[:40], codec="flac", sr_hz=sr),
    ]
    df = spark.createDataFrame(rows)
    fps = {r.key: r for r in audio_fingerprints(df).collect()}
    # identical PCM under any lossless codec -> identical content fp + phash
    assert fps["a-pcm"].content_fp == fps["b-wav"].content_fp == fps["c-flac"].content_fp
    assert fps["a-pcm"].phash == fps["b-wav"].phash == fps["c-flac"].phash
    assert fps["a-pcm"].err is None
    # truncated clip: per-row error, NULL fingerprints, no task failure
    assert fps["d-bad"].content_fp is None and fps["d-bad"].err
    groups = audio_exact_duplicates(audio_fingerprints(df)).collect()
    assert len(groups) == 1
    assert groups[0].canonical_key == "a-pcm" and groups[0].n_clips == 3


def test_audio_fingerprints_null_sr_and_registered_codec(spark):
    """Review r04: (a) a NULL sr_hz row (NaN in the Arrow batch) must yield
    a fingerprint, not abort the task; (b) driver-side register_codec()
    registrations must reach the UDF workers via the creation-time
    snapshot — the module registry is empty on executors."""
    from anzlic_validator_spark.functions.audio import _CODEC_REGISTRY, register_codec

    sr = 8000
    pcm = ref_signal(1, sr, sr // 2, seed=7)
    raw = encode(pcm, sr, "pcm_s16le")

    def dec_rev(b):  # trivially registered codec: byte-reversed pcm
        return np.frombuffer(b[::-1], dtype="<i2").astype(np.float32) / 32767.0, sr

    register_codec("revpcm", lambda p, s: encode(p, s, "pcm_s16le")[::-1], dec_rev)
    try:
        rows = [
            Row(clip_id="nullsr", bytes=raw, codec="pcm_s16le", sr_hz=None),
            Row(clip_id="reg", bytes=raw[::-1], codec="revpcm", sr_hz=sr),
            Row(clip_id="plain", bytes=raw, codec="pcm_s16le", sr_hz=sr),
        ]
        df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string, sr_hz int")
        fps = {r.key: r for r in audio_fingerprints(df).collect()}
    finally:
        _CODEC_REGISTRY.pop("revpcm", None)
    assert fps["nullsr"].err is None and fps["nullsr"].content_fp is not None
    # the registered codec decodes to the SAME content -> same fingerprint
    assert fps["reg"].err is None
    assert fps["reg"].content_fp == fps["plain"].content_fp


def test_audio_fingerprints_parts_skip_spectra(spark):
    """VERDICT r04 #4: an exact-only fingerprint pass must never run the
    rfft spectra pass (the dominant post-decode cost). Structural check via
    the injectable ``spectra`` hook on the per-clip kernel — a worker-side
    call count is unobservable from the driver — plus the end-to-end
    contract that unrequested parts come back NULL with stable schema."""
    import pytest

    from anzlic_validator_spark.operators.audio_dedup import (
        _fingerprint_one,
        _frame_spectra,
    )

    sr = 8000
    pcm = ref_signal(2, sr, sr // 2, seed=7)
    raw = encode(pcm, sr, "pcm_s16le")
    calls = []

    def counting_spectra(x):
        calls.append(1)
        return _frame_spectra(x)

    cf, ph, fr, sf, err = _fingerprint_one(
        raw, "pcm_s16le", sr, {}, False, False, spectra=counting_spectra
    )
    assert err is None and cf and ph is None and fr is None and sf is None
    assert calls == []  # exact-only: spectra never computed
    cf2, ph2, fr2, sf2, err2 = _fingerprint_one(
        raw, "pcm_s16le", sr, {}, True, True, True, spectra=counting_spectra
    )
    assert len(calls) == 1 and err2 is None  # ONE shared pass for all parts
    assert cf2 == cf and ph2 is not None and fr2 and sf2
    df = spark.createDataFrame(
        [Row(clip_id="x", bytes=raw, codec="pcm_s16le", sr_hz=sr)]
    )
    full = audio_fingerprints(df).collect()[0]
    lean = audio_fingerprints(df, parts=("content_fp",)).collect()[0]
    assert lean.content_fp == full.content_fp
    assert lean.phash is None and lean.frames is None and lean.err is None
    frames_only = audio_fingerprints(df, parts=("frames",)).collect()[0]
    assert frames_only.content_fp is None and frames_only.frames == full.frames
    # the md5 is gated like the spectra (review r05): a perceptual-only
    # kernel call skips it entirely
    cf3, _, fr3, _, err3 = _fingerprint_one(
        raw, "pcm_s16le", sr, {}, False, True, False, want_content=False
    )
    assert cf3 is None and fr3 and err3 is None
    with pytest.raises(ValueError, match="parts"):
        audio_fingerprints(df, parts=("bogus",))
    with pytest.raises(ValueError, match="parts"):
        audio_fingerprints(df, parts=())


def test_frame_subfingerprints_and_frame_near_dup(spark):
    """Frame-half matching (the Haitsma-Kalker search shape): noisy copies
    share many exact halves, unrelated signals few; the Spark operator
    recovers exactly the planted pairs at min_matches=8."""
    from anzlic_validator_spark.operators.audio_dedup import (
        audio_near_duplicates_frames,
        frame_subfingerprint_halves,
    )

    sr = 8000
    rows = []
    for j in range(6):
        s = ref_signal(j, sr, 2 * sr, seed=5).astype(np.float64)
        rng = np.random.Generator(np.random.Philox(key=np.uint64(77) ^ np.uint64(j)))
        nz = np.clip(s + 0.01 * rng.standard_normal(len(s)), -1, 1)
        f_s = frame_subfingerprint_halves(s, sr)
        f_n = frame_subfingerprint_halves(nz, sr)
        assert len(np.intersect1d(f_s, f_n)) >= 8  # planted similarity
        rows.append(Row(key=f"o{j}", content_fp=None, phash=None,
                        frames=[int(x) for x in f_s], err=None))
        rows.append(Row(key=f"n{j}", content_fp=None, phash=None,
                        frames=[int(x) for x in f_n], err=None))
    rows.append(Row(key="dead", content_fp=None, phash=None, frames=None, err="x"))
    fps = spark.createDataFrame(
        rows, "key string, content_fp string, phash long, frames array<long>, err string"
    )
    pairs = {
        tuple(sorted((r.a_key, r.b_key)))
        for r in audio_near_duplicates_frames(fps, min_matches=8).collect()
    }
    assert pairs == {(f"n{j}", f"o{j}") for j in range(6)}


def test_audio_verify_rejects_colliding_halves(spark):
    """VERDICT r04 #3: an ADVERSARIAL pair whose tagged halves collide
    (clearing any min_matches bar, so the candidate stage proposes it) but
    whose ordered subfingerprint sequences are complementary must be
    REJECTED by the BER verify — and a genuine pair with a small frame
    offset must survive via the offset sweep."""
    from anzlic_validator_spark.operators.audio_dedup import (
        audio_near_duplicates_frames,
        audio_verify_pairs,
    )

    seq = [((i * 2654435761) & 0xFFFFFFFF) for i in range(30)]
    inv = [x ^ 0xFFFFFFFF for x in seq]
    halves = list(range(1, 21))  # 20 shared tagged halves: always a candidate
    rows = [
        Row(key="adv-a", content_fp=None, phash=None, frames=halves, subfp=seq, err=None),
        Row(key="adv-b", content_fp=None, phash=None, frames=halves, subfp=inv, err=None),
        # genuine pair: same sequence shifted by 1 frame, a few bits flipped
        Row(key="gen-a", content_fp=None, phash=None, frames=halves, subfp=seq, err=None),
        Row(
            key="gen-b", content_fp=None, phash=None, frames=halves,
            subfp=[seq[0]] + [x ^ 1 for x in seq[:-1]], err=None,
        ),
    ]
    fps = spark.createDataFrame(
        rows,
        "key string, content_fp string, phash long, frames array<long>,"
        " subfp array<long>, err string",
    )
    cand = audio_near_duplicates_frames(fps, min_matches=8).select("a_key", "b_key")
    cand_pairs = {(r.a_key, r.b_key) for r in cand.collect()}
    assert ("adv-a", "adv-b") in cand_pairs  # the candidate stage IS fooled
    verified = {
        (r.a_key, r.b_key): r.ber
        for r in audio_verify_pairs(cand, fps, max_ber=0.25).collect()
    }
    assert ("adv-a", "adv-b") not in verified  # ...and the verify is not
    assert ("gen-a", "gen-b") in verified  # offset sweep finds the 1-frame shift
    assert verified[("gen-a", "gen-b")] <= 0.05
    # without the sweep (max_offset=0) the 1-frame-shifted genuine pair
    # scores coin-flip BER (~0.5) and is rejected — the offset search is
    # what recovers it
    far = spark.createDataFrame(
        [("gen-a", "gen-b")], "a_key string, b_key string"
    )
    assert audio_verify_pairs(far, fps, max_ber=0.25, max_offset=0).collect() == []


def test_verified_guard_and_unrounded_ber_bar(spark):
    """Review r05 regressions: (a) composing the verified near-dup with a
    fingerprint table built WITHOUT subfp must raise, not silently return
    zero pairs; (b) the BER bar compares the UNROUNDED value — a pair at
    raw BER 0.25004 (rounds to 0.2500) is still above max_ber=0.25."""
    import pytest

    from anzlic_validator_spark.functions.audio import encode, ref_signal
    from anzlic_validator_spark.operators.audio_dedup import (
        audio_fingerprints,
        audio_near_duplicates_verified,
        audio_verify_pairs,
    )

    sr = 8000
    raw = encode(ref_signal(0, sr, sr // 2, seed=7), sr, "pcm_s16le")
    clips = spark.createDataFrame(
        [Row(clip_id="x", bytes=raw, codec="pcm_s16le", sr_hz=sr)]
    )
    no_subfp = audio_fingerprints(clips, parts=("frames",))
    with pytest.raises(ValueError, match="subfp"):
        audio_near_duplicates_verified(no_subfp)
    no_frames = audio_fingerprints(clips, parts=("subfp",))
    with pytest.raises(ValueError, match="frames"):
        audio_near_duplicates_verified(no_frames)
    # hand-built tables without metadata still pass the guard (unknowable)
    ok = audio_fingerprints(clips, parts=("frames", "subfp"))
    audio_near_duplicates_verified(ok)  # plan construction must not raise

    # (b) 700 frames x 32 bits = 22400; 5601 differing bits -> raw BER
    # 0.2500446 (rounds to 0.25). Must be REJECTED at max_ber=0.25.
    a = [0] * 700
    b = [0xFFFFFFFF] * 175 + [1] + [0] * 524  # 175*32 + 1 = 5601 bits
    fps = spark.createDataFrame(
        [Row(key="p", subfp=a), Row(key="q", subfp=b)],
        "key string, subfp array<long>",
    )
    cand = spark.createDataFrame([("p", "q")], "a_key string, b_key string")
    assert audio_verify_pairs(cand, fps, max_ber=0.25, max_offset=0).collect() == []
    got = audio_verify_pairs(cand, fps, max_ber=0.2501, max_offset=0).collect()
    assert len(got) == 1 and got[0].ber == 0.25  # rounded for OUTPUT only


def test_audio_neardup_margin_sweep():
    """VERDICT r04 #7: pin WHERE the near-dup margins hold, by measurement,
    across noise 0.5-3% x clip length 0.5-4s (seeds fixed; pure numpy on
    the same kernels the UDF runs). Contract pinned:

    - VERIFY margin: planted-copy BER <= 0.25 and unrelated BER >= 0.30 at
      every combo with >= 1 s clips (at 0.5 s / 3% the planted worst case
      reaches ~0.26 — below-1s corpora need a higher bar or the content_fp
      path, documented here).
    - CANDIDATE recall floor (min_matches=2): holds through 2% noise at
      >= 1 s and through 3% at >= 2 s; at 3% noise on 1 s clips planted
      copies can share ZERO halves — the candidate stage misses, and no
      verify stage can recover an unproposed pair. That boundary is the
      documented contract, not a bug."""
    from anzlic_validator_spark.functions.audio import ref_signal
    from anzlic_validator_spark.operators.audio_dedup import (
        _fold_bands,
        _frame_spectra,
        _halves_from_subfps,
        _subfps_from_bands,
    )

    sr = 8000

    def subfps(x):
        return _subfps_from_bands(
            _fold_bands(_frame_spectra(np.asarray(x, np.float64)), sr, 33)
        )

    def ber(a, b):
        n = min(len(a), len(b))
        x = (a[:n] ^ b[:n]).astype(np.uint32)
        return np.unpackbits(np.frombuffer(x.tobytes(), np.uint8)).sum() / (32.0 * n)

    cand_ok = {  # (noise, dur_s) -> planted min shared halves >= 2 expected
        (0.01, 1.0): True, (0.02, 1.0): True, (0.03, 1.0): False,
        (0.01, 2.0): True, (0.02, 2.0): True, (0.03, 2.0): True,
        (0.02, 4.0): True, (0.03, 4.0): True,
    }
    for (noise, dur_s), recall_holds in cand_ok.items():
        subs, planted_sh, planted_ber = [], [], []
        for j in range(6):
            s = ref_signal(j, sr, int(dur_s * sr), seed=5).astype(np.float64)
            rng = np.random.Generator(
                np.random.Philox(key=np.uint64(1000 * j + int(noise * 1000)))
            )
            nz = np.clip(s + noise * rng.standard_normal(len(s)), -1, 1)
            fs, fn = subfps(s), subfps(nz)
            subs.append(fs)
            planted_sh.append(
                len(np.intersect1d(_halves_from_subfps(fs), _halves_from_subfps(fn)))
            )
            planted_ber.append(ber(fs, fn))
        cross_ber = [
            ber(subs[a], subs[b]) for a in range(6) for b in range(a + 1, 6)
        ]
        tag = f"noise={noise} dur={dur_s}"
        assert max(planted_ber) <= 0.25, tag  # verify never drops a true pair
        assert min(cross_ber) >= 0.30, tag    # ...nor admits a false one
        assert (min(planted_sh) >= 2) == recall_holds, (
            f"{tag}: candidate recall boundary moved (min shared "
            f"{min(planted_sh)})"
        )


def test_audio_near_duplicates_perceptual(spark):
    """Noisy re-encodes pair with their source within the Hamming radius;
    unrelated signals do not."""
    sr = 8000
    rng = np.random.Generator(np.random.Philox(key=np.uint64(11)))
    rows = []
    for j in range(4):
        s = ref_signal(j, sr, sr, seed=5)
        noisy = np.clip(s + 0.01 * rng.standard_normal(len(s)).astype(np.float32), -1, 1)
        rows.append(Row(key=f"s{j}", content_fp=f"f{j}",
                        phash=int(np.uint64(_phash64(s.astype(np.float64), sr)).view(np.int64)),
                        err=None))
        rows.append(Row(key=f"s{j}n", content_fp=f"f{j}n",
                        phash=int(np.uint64(_phash64(noisy.astype(np.float64), sr)).view(np.int64)),
                        err=None))
    rows.append(Row(key="dead", content_fp=None, phash=None, err="boom"))
    fps = spark.createDataFrame(rows, "key string, content_fp string, phash long, err string")
    pairs = {
        (r.a_key, r.b_key)
        for r in audio_near_duplicates(fps, max_hamming=10, n_tables=16).collect()
    }
    for j in range(4):
        assert (f"s{j}", f"s{j}n") in pairs
    # no cross-signal pair within the radius (fixture property, seeds pinned)
    assert all(a[1:].rstrip("n") == b[1:].rstrip("n") for a, b in pairs)
