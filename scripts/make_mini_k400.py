"""Generate a mini synthetic-K400 of real mp4 files (cv2-encoded) for
input-pipeline and end-to-end runs without the real dataset: textured
moving-object clips at realistic decode cost (340x256, 25 fps, 10 s).

Usage: python scripts/make_mini_k400.py /tmp/minik400 [n_videos] [class_coded]

Default content: per-video random texture + blobs whose colors re-roll
EVERY FRAME (pure flicker) — the only class-correlated signal is blob
SPEED, which an appearance-level SSL objective has no pressure to
encode, so online-kNN class accuracy can stay at chance even with a
healthy encoder (measured: BYOL + MoCo both flat, BASELINE.md). Pass
class_coded=1 to key each video's (fixed) blob palette to its class —
classes become appearance-separable, so a learning encoder makes the
kNN monitor climb; this is the kNN-certification variant.
"""

from __future__ import annotations

import os
import sys

import cv2
import numpy as np


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/minik400"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    class_coded = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
    w, h, fps, secs, classes = 340, 256, 25, 10, 4
    data = os.path.join(root, "videos")
    lists = os.path.join(root, "lists")
    os.makedirs(lists, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        c = i % classes
        rel = f"class{c}/vid_{i:03d}.mp4"
        os.makedirs(os.path.join(data, f"class{c}"), exist_ok=True)
        path = os.path.join(data, rel)
        if not os.path.exists(path):
            wr = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
            )
            if not wr.isOpened():
                sys.exit(
                    f"cv2.VideoWriter could not open {path} (no mp4v "
                    "encoder in this OpenCV build?)"
                )
            # textured background + several moving blobs; speed ~ class
            bg = rng.integers(0, 255, (h, w, 3), np.uint8)
            bg = cv2.GaussianBlur(bg, (21, 21), 0)
            blobs = rng.uniform(0, 1, (6, 4))  # x0,y0,vx,vy
            if class_coded:
                # fixed per-video palette around a class hue anchor:
                # class is appearance-separable, instances still distinct
                anchor = np.array(
                    [[220, 60, 60], [60, 220, 60], [60, 60, 220],
                     [220, 220, 60]][c]
                )
                pal = np.clip(
                    anchor + rng.integers(-40, 40, (6, 3)), 0, 255
                ).astype(int)
            for t in range(fps * secs):
                f = bg.copy()
                for bi, (x0, y0, vx, vy) in enumerate(blobs):
                    sp = 1.0 + c * 1.5
                    x = int((x0 * w + t * sp * (vx * 8 - 4)) % w)
                    y = int((y0 * h + t * sp * (vy * 8 - 4)) % h)
                    col = (
                        tuple(int(v) for v in pal[bi])
                        if class_coded
                        else tuple(int(v) for v in rng.integers(60, 255, 3))
                    )
                    cv2.circle(f, (x, y), 12 + 4 * bi, col, -1)
                wr.write(f)
            wr.release()
        lines.append(f"{rel} {c}")
    with open(os.path.join(lists, "train.csv"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    with open(os.path.join(lists, "val.csv"), "w") as fh:
        fh.write("\n".join(lines[: max(n // 4, 1)]) + "\n")
    print(f"{n} videos -> {data}; lists -> {lists}")


if __name__ == "__main__":
    main()
