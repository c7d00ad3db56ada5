"""Audio stage: codec round-trip, feature math pinned to hand-computed
waveforms (independent of the generator, which calls the same functions
— this file is what makes the golden-label oracle meaningful), rule
chain, and the distributed stage over a planted fixture."""

import numpy as np
import pandas as pd
import pytest

from data_quality_ray.stages.audio import (CLIP_LEVEL, audio_features,
                                           audio_verdict, decode_audio,
                                           encode_audio)


def test_codec_roundtrip_exact():
    rs = np.random.RandomState(1)
    s = (rs.randn(5000) * 8000).astype(np.int16)
    out, sr = decode_audio(encode_audio(s, 16000))
    assert sr == 16000 and np.array_equal(out, s)
    with pytest.raises(ValueError):
        decode_audio(b"JPEG" + b"\x00" * 20)


def test_features_hand_computed():
    # constant half-scale square wave alternating sign every sample
    s = np.tile([16384, -16384], 500).astype(np.int16)
    f = audio_features(s, 1000)
    assert f["duration_sec"] == 1.0
    assert f["rms"] == 0.5
    assert f["peak"] == 0.5
    assert f["zcr"] == 1.0          # every adjacent pair crosses zero
    assert f["clipping_ratio"] == 0.0
    assert f["silence_ratio"] == 0.0
    # all-clipped constant
    c = np.full(800, CLIP_LEVEL, dtype=np.int16)
    fc = audio_features(c, 800)
    assert fc["clipping_ratio"] == 1.0 and fc["zcr"] == 0.0
    # half silence
    h = np.concatenate([np.zeros(400, np.int16),
                        np.full(400, 10000, np.int16)])
    assert audio_features(h, 400)["silence_ratio"] == 0.5


def test_verdict_rule_order():
    base = {"duration_sec": 2.0, "rms": 0.2, "peak": 0.5, "zcr": 0.1,
            "clipping_ratio": 0.0, "silence_ratio": 0.0}
    assert audio_verdict(base) == ("KEEP", "none")
    assert audio_verdict({**base, "duration_sec": 0.5}) == ("DROP", "too_short")
    assert audio_verdict({**base, "rms": 0.001}) == ("DROP", "too_quiet")
    assert audio_verdict({**base, "clipping_ratio": 0.02}) == ("DROP", "clipped")
    assert audio_verdict({**base, "silence_ratio": 0.9}) == ("DROP", "mostly_silent")
    # order: too_short beats clipped
    assert audio_verdict({**base, "duration_sec": 0.5,
                          "clipping_ratio": 1.0}) == ("DROP", "too_short")


def test_audio_stage_matches_labels(ray_session, tmp_path):
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    from data_quality_ray.sources.audio_fixtures import write_a1
    from data_quality_ray.stages.audio import extract_audio_features

    d = str(tmp_path / "a1")
    write_a1(d, n_rows=300, seed=7, rows_per_file=128)
    ds = rd.read_parquet(sorted(glob.glob(d + "/part-*.parquet")),
                         columns=["clip_id", "bytes"])
    out = extract_audio_features(ds, concurrency=2).to_pandas() \
        .sort_values("clip_id").reset_index(drop=True)
    lab = pq.read_table(d + "/audio_labels.parquet").to_pandas() \
        .sort_values("clip_id").reset_index(drop=True)
    cols = ["clip_id", "duration_sec", "rms", "peak", "zcr",
            "clipping_ratio", "silence_ratio", "verdict", "first_rule"]
    pd.testing.assert_frame_equal(out[cols], lab[cols])
    # every class is present and every DROP rule fires somewhere
    assert set(lab["cls"]) == {"clean", "short", "quiet", "clipped",
                               "mostly_silent"}
    assert {"too_short", "too_quiet", "clipped", "mostly_silent"} <= \
        set(lab["first_rule"])


def test_fingerprint_noise_and_level_robust():
    from data_quality_ray.stages.audio import (audio_fingerprint,
                                               clip_fingerprint_key)

    sr = 16000
    t = np.arange(sr * 2) / sr

    def mk(freq, nseed, amp=0.5):
        tone = np.sin(2 * np.pi * freq * t)
        n = np.random.RandomState(nseed).randn(len(t)) * 0.01
        return np.clip(np.round((tone + n) * amp * 32767),
                       -32768, 32767).astype(np.int16)

    a, b, c, d = mk(440, 0), mk(440, 9), mk(523, 1), mk(440, 2, amp=0.25)
    assert np.array_equal(audio_fingerprint(a, sr), audio_fingerprint(b, sr))
    assert np.array_equal(audio_fingerprint(a, sr), audio_fingerprint(d, sr))
    assert not np.array_equal(audio_fingerprint(a, sr), audio_fingerprint(c, sr))
    assert clip_fingerprint_key(a, sr) == clip_fingerprint_key(b, sr)
    assert clip_fingerprint_key(a, sr) != clip_fingerprint_key(c, sr)
    # too short to fingerprint
    assert clip_fingerprint_key(a[:1000], sr) is None


def test_fingerprint_dedup_collapses_planted_copies(ray_session):
    out = __import__("__ray_entry__").audio_fingerprint_dedup(
        "/root/testdata/sf0.001")
    k = out.set_index("clip_id")["keeper_id"]
    # every planted re-noised copy lands in its original's group (two
    # originals may legitimately share a key when their tones quantize
    # to the same dominant-bin sequence, so compare GROUPS, not ids)
    copies = [c for c in out["clip_id"] if c.startswith("aud5")]
    assert copies
    for c in copies:
        orig = f"aud{int(c[3:]) - 500_000_000:09d}"
        if orig in k.index:
            assert k[c] == k[orig]
    assert (out.groupby("fp_key")["keeper_id"].nunique() == 1).all()
