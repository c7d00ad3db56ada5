"""Deterministic video fixture V1: FVID stand-in clips (the
stages/image_ops stub container) with planted duplicate videos, plus a
golden label table carrying each clip's sampled-frame signature so the
SQL oracle can independently re-derive the dedup grouping.

Frames are synthetic gradients + per-frame offsets (pure functions of
the clip id); every 11th clip gets an exact duplicate under id
``vid…+5e8`` (sorts after all originals → keep-first keeps the
original), and every 17th a NEAR-duplicate (one frame's gradient
shifted) that must NOT collapse under the exact multi-frame signature.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..profiling.sketches import HASH64
from ..stages.image import phash64
from ..stages.image_ops import encode_fake_video

SIZE = 32
N_SAMPLED = 4


def _frame(clip: int, j: int, shift: int = 0) -> np.ndarray:
    g = (np.arange(SIZE, dtype=np.int64)[:, None]
         + 2 * np.arange(SIZE, dtype=np.int64)[None, :])
    px = ((g * (1 + clip % 7) + 13 * j + shift) % 256).astype(np.uint8)
    return np.stack([px, px, (px // 2)], axis=2)


def _clip_frames(clip: int, seed: int) -> list:
    rs = np.random.RandomState((seed * 2_000_003 + clip) % (2**31 - 1))
    n = int(rs.randint(4, 11))
    return [_frame(clip, j) for j in range(n)]


def clip_signature(frames: list) -> int:
    """The signature the Ray stage must reproduce through the real
    sample→decode→phash path: uniform N_SAMPLED frame indices, per-frame
    phash64, stable 64-bit hash of the joined phash string."""
    n = len(frames)
    idx = np.unique(np.linspace(0, n - 1, min(N_SAMPLED, n)).astype(int))
    ph = [int(phash64(frames[i])) for i in idx]
    return int(HASH64["stable"](np.array(["|".join(map(str, ph))],
                                         dtype=object))[0].astype(np.int64)), len(idx)


def generate_v1(n_rows: int, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    rows, labels = [], []

    def emit(vid: str, frames: list) -> None:
        sig, n_sampled = clip_signature(frames)
        rows.append({"video_id": vid, "video": encode_fake_video(frames),
                     "n_frames": len(frames), "w": SIZE, "h": SIZE})
        labels.append({"video_id": vid, "n_frames": len(frames),
                       "n_sampled": n_sampled, "sig": sig})

    for i in range(n_rows):
        frames = _clip_frames(i, seed)
        emit(f"vid{i:09d}", frames)
        if i % 11 == 0:  # exact duplicate — must collapse
            emit(f"vid{i + 500_000_000:09d}", frames)
        elif i % 17 == 0:  # near duplicate (one frame shifted) — must NOT
            nd = list(frames)
            nd[0] = _frame(i, 0, shift=31)
            emit(f"vid{i + 700_000_000:09d}", nd)

    data = pa.Table.from_pylist(rows, schema=pa.schema([
        ("video_id", pa.string()), ("video", pa.binary()),
        ("n_frames", pa.int32()), ("w", pa.int32()), ("h", pa.int32()),
    ]))
    return data, pa.Table.from_pylist(labels)


def write_v1(out_dir: str, n_rows: int, seed: int = 42,
             rows_per_file: int = 1024) -> str:
    marker = os.path.join(out_dir, f"_DONE_{n_rows}_{seed}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    data, labels = generate_v1(n_rows, seed)
    for start in range(0, len(data), rows_per_file):
        pq.write_table(data.slice(start, rows_per_file),
                       os.path.join(out_dir, f"part-{start:08d}.parquet"),
                       compression="none", use_dictionary=False)
    pq.write_table(labels, os.path.join(out_dir, "video_labels.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
