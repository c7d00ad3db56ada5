"""Deterministic audio fixture A1: clips of synthetic PCM with typed
metadata, plus a golden label table for the SQL oracle (the F1 image
fixture's feature-label pattern — labels are computed by the SAME
feature functions the stage runs, so the oracle checks the distributed
plumbing end-to-end; the feature math itself is pinned by unit tests on
hand-computed waveforms in tests/test_audio.py).

Schema: (clip_id:string, bytes:binary, sr:int32, n_samples:int32,
caption:string). Classes (deterministic per-row draw): clean tone+noise,
too-short, near-silent (quiet), overdriven (clipped), mostly-silent.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.audio import (audio_features, audio_fingerprint,
                            audio_verdict, clip_fingerprint_key,
                            encode_audio)

A1_CLASSES = ("clean", "short", "quiet", "clipped", "mostly_silent")
_WEIGHTS = np.array([60, 10, 10, 10, 10], dtype=np.float64)
_WEIGHTS /= _WEIGHTS.sum()


def _clip_for(row: int, seed: int,
              noise_seed: int | None = None) -> tuple[np.ndarray, int, str]:
    rs = np.random.RandomState((seed * 1_000_003 + row) % (2**31 - 1))
    cls = A1_CLASSES[rs.choice(len(A1_CLASSES), p=_WEIGHTS)]
    sr = int(rs.choice([8000, 16000]))
    freq = float(rs.uniform(100, 1000))
    if cls == "short":
        n = int(rs.randint(sr // 8, max(sr // 8 + 1, int(sr * 0.9))))
    else:
        n = int(rs.randint(int(sr * 1.2), sr * 4))
    t = np.arange(n) / sr
    tone = np.sin(2 * np.pi * freq * t)
    # re-noised duplicates (same program material, fresh noise) share the
    # spectral fingerprint but not the bytes
    nrs = rs if noise_seed is None else np.random.RandomState(noise_seed)
    noise = nrs.randn(n) * 0.01
    if cls == "quiet":
        x = (tone + noise) * 0.003
    elif cls == "clipped":
        x = np.clip((tone + noise) * 3.0, -1.0, 1.0)
    elif cls == "mostly_silent":
        x = tone * 0.2 + noise
        keep = max(1, n // 10)
        x[keep:] = 0.0
    else:
        x = (tone + noise) * float(rs.uniform(0.1, 0.8))
    s = np.clip(np.round(x * 32767), -32768, 32767).astype(np.int16)
    return s, sr, cls


def generate_a1(n_rows: int, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    rows, labels = [], []

    def emit(cid: str, s: np.ndarray, sr: int, cls: str) -> None:
        rows.append({
            "clip_id": cid,
            "bytes": encode_audio(s, sr),
            "sr": sr,
            "n_samples": len(s),
            "caption": f"{cls} clip {cid}",
        })
        f = audio_features(s, sr)
        v, r = audio_verdict(f)
        labels.append({"clip_id": cid, "cls": cls, **f,
                       "fp_key": clip_fingerprint_key(s, sr),
                       "n_fp_frames": len(audio_fingerprint(s, sr)),
                       "verdict": v, "first_rule": r})

    for i in range(n_rows):
        s, sr, cls = _clip_for(i, seed)
        emit(f"aud{i:09d}", s, sr, cls)
        if i % 13 == 0:  # planted re-noised copy: same material, new noise
            s2, sr2, cls2 = _clip_for(i, seed, noise_seed=i + 777)
            emit(f"aud{i + 500_000_000:09d}", s2, sr2, cls2)
    data = pa.Table.from_pylist(rows, schema=pa.schema([
        ("clip_id", pa.string()), ("bytes", pa.binary()),
        ("sr", pa.int32()), ("n_samples", pa.int32()),
        ("caption", pa.string()),
    ]))
    return data, pa.Table.from_pylist(labels)


def write_a1(out_dir: str, n_rows: int, seed: int = 42,
             rows_per_file: int = 2048) -> str:
    """Idempotent cached write (the write_f1 _DONE-marker contract);
    payload bytes are already zlib'd → parquet compression off for the
    data files (the compressed-payload rule)."""
    marker = os.path.join(out_dir, f"_DONE3_{n_rows}_{seed}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    data, labels = generate_a1(n_rows, seed)
    for start in range(0, len(data), rows_per_file):
        shard = data.slice(start, rows_per_file)
        pq.write_table(shard,
                       os.path.join(out_dir, f"part-{start:08d}.parquet"),
                       compression="none", use_dictionary=False)
    pq.write_table(labels, os.path.join(out_dir, "audio_labels.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
