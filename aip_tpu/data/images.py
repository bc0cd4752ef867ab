"""Image dataset + infinite batch sampling for AdaIN decoder training.

Parity with reference `AdaIN/train.py:20-45` (FlatFolderDataset: flat glob of
a directory, resize to 512x512, random-crop 256, [0,1] float) and
`AdaIN/sampler.py` InfiniteSamplerWrapper (endless shuffled index stream).

TPU notes: batches come out as contiguous NHWC numpy arrays ready for a
single host->device transfer; a background thread double-buffers the next
batch so host decode overlaps device compute (the reference gets this from
num_workers=16 DataLoader).
"""

from __future__ import annotations

import threading
from pathlib import Path
from queue import Queue

import numpy as np


def train_transform(img, rng: np.random.Generator, resize=(512, 512), crop=256):
    """Resize to 512x512 then random-crop 256 (train.py:20-26)."""
    from PIL import Image

    img = img.resize(resize, Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    h, w, _ = arr.shape
    top = int(rng.integers(0, h - crop + 1))
    left = int(rng.integers(0, w - crop + 1))
    return arr[top:top + crop, left:left + crop]


class FlatFolderDataset:
    """Flat directory of images (train.py:29-45)."""

    IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}

    def __init__(self, root):
        self.root = Path(root)
        self.paths = sorted(
            p for p in self.root.glob("*") if p.suffix.lower() in self.IMG_EXTS
        )
        if not self.paths:
            raise ValueError(f"no images under {root}")

    def __len__(self):
        return len(self.paths)

    def load(self, index, rng, crop=256):
        from PIL import Image

        img = Image.open(str(self.paths[index])).convert("RGB")
        return train_transform(img, rng, crop=crop)


def infinite_batches(dataset: FlatFolderDataset, batch_size: int, seed: int = 0,
                     crop: int = 256, prefetch: int = 2, num_workers: int = 8):
    """Endless shuffled batches [B, crop, crop, 3].

    ``num_workers`` decode threads (PIL decode/resize releases the GIL in
    the C codecs) fill per-sample slots in parallel — the pool analog of
    the reference's num_workers=16 DataLoader — and an assembler thread
    emits batches in order, ``prefetch`` batches ahead of the consumer."""
    rng = np.random.default_rng(seed)
    lock = threading.Lock()

    def index_stream():
        while True:
            for i in rng.permutation(len(dataset)):
                yield int(i)

    idx_iter = index_stream()

    def next_sample():
        # rng + iterator are shared: take both under one lock, decode
        # outside it.
        with lock:
            i = next(idx_iter)
            sample_rng = np.random.default_rng(rng.integers(1 << 63))
        return dataset.load(i, sample_rng, crop)

    q: Queue = Queue(maxsize=prefetch)

    if num_workers <= 1:
        def worker():
            while True:
                q.put(np.stack([next_sample() for _ in range(batch_size)]))

        threading.Thread(target=worker, daemon=True).start()
    else:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=num_workers)

        def assembler():
            while True:
                futs = [pool.submit(next_sample) for _ in range(batch_size)]
                q.put(np.stack([f.result() for f in futs]))

        threading.Thread(target=assembler, daemon=True).start()
    while True:
        yield q.get()
