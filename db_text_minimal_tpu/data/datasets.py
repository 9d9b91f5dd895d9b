"""Datasets + host-side input pipeline.

Rebuild of ``src/data_loaders.py``'s ``BaseDatasetIter`` (:18-172) and its
four subclasses, restructured for a TPU input pipeline: static 640×640
shapes, NHWC float32 batches, deterministic per-host sharding for multi-host
data parallelism (a new capability — the reference is single-device,
SURVEY.md §2c), and a thread-prefetching loader in place of the torch
DataLoader (which needed the ``cv2.setNumThreads(0)`` fork-deadlock
workaround, ``src/train.py:25-26`` — no fork here, no workaround needed).

Preprocessing parity (``src/data_loaders.py:69-172``):
imread BGR→RGB → [train] flip/rotate/scale augment → text-safe crop →
square resize-pad to ``image_size`` → drop invalid polys → 4 GT maps →
Caffe-mean subtract in RGB order (the reference's checkpoint-parity quirk,
SURVEY.md §2a #8) → float32 NHWC (the reference emits CHW).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Any, Callable, Iterator

import numpy as np

from ..ops import geometry as geo
from ..utils import CAFFE_MEAN
from . import augment as aug
from .labels import make_gt_maps
from .parsers import PARSERS


class BaseDataset:
    """``src/data_loaders.py:18-172``."""

    parser: Callable | None = None

    def __init__(self, train_dir, train_gt_dir, ignore_tags,
                 is_training=True, image_size=640, min_text_size=8,
                 shrink_ratio=0.4, thresh_min=0.3, thresh_max=0.7,
                 mean=CAFFE_MEAN, seed=42, debug=False,
                 compact_dtypes: bool = False):
        self.train_dir = train_dir
        self.train_gt_dir = train_gt_dir
        self.ignore_tags = list(ignore_tags)
        self.is_training = is_training
        self.image_size = image_size
        self.min_text_size = min_text_size
        self.shrink_ratio = shrink_ratio
        self.thresh_min = thresh_min
        self.thresh_max = thresh_max
        self.mean = np.asarray(mean, dtype=np.float32)
        self.debug = debug
        self.seed = seed
        self.epoch = 0  # set by the loader; feeds per-sample aug RNGs
        # compact_dtypes: emit uint8 images (mean subtraction moves onto the
        # device) and uint8/float16 GT maps — a 3.5× smaller host→device
        # transfer per batch. The reference ships full float32 CHW tensors.
        self.compact_dtypes = compact_dtypes

        self.image_paths, self.all_anns = type(self).parser(
            train_dir, train_gt_dir)
        assert len(self.image_paths) == len(self.all_anns)

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, index: int) -> dict[str, Any]:
        import cv2

        image_path = self.image_paths[index]
        anns = [dict(a) for a in self.all_anns[index]]

        img = cv2.imread(image_path)
        if img is None:
            raise FileNotFoundError(image_path)
        img = img[:, :, ::-1]  # BGR -> RGB (src/data_loaders.py:78)

        if self.is_training:
            # per-(epoch, index) RNG: deterministic regardless of worker
            # interleaving, varies across epochs
            rng = np.random.RandomState(
                (self.seed * 1000003 + self.epoch * 9176 + index) % (2**31))
            img, anns = aug.random_flip_rotate_resize(rng, img, anns)
            img, anns = aug.crop(rng, img, anns)
        img, anns = aug.resize_square_pad(self.image_size, img, anns)

        # drop invalid polygons (src/data_loaders.py:86)
        anns = [a for a in anns
                if len(a["poly"]) >= 3 and geo.polygon_is_simple(a["poly"])]

        gt, mask, thresh_map, thresh_mask, ignore_flags = make_gt_maps(
            anns, self.image_size, self.ignore_tags,
            min_text_size=self.min_text_size, shrink_ratio=self.shrink_ratio,
            thresh_min=self.thresh_min, thresh_max=self.thresh_max)

        if self.compact_dtypes:
            # binary maps ship BIT-PACKED (8 px/byte, exact values — the
            # train step unpacks on device in device_preprocess); thresh
            # stays f16. Per-sample upload drops another ~1.1 MB vs plain
            # uint8 maps — this path is upload-bound on tunnel-attached TPUs
            def pack(m):
                if m.shape[-1] % 8 == 0:
                    return np.packbits(m.astype(bool), axis=-1)
                return m.astype(np.uint8)

            data = {
                "image_path": image_path,
                "img": np.ascontiguousarray(img, np.uint8),
                "prob_map": pack(gt),
                "supervision_mask": pack(mask),
                "thresh_map": thresh_map.astype(np.float16),
                "text_area_map": pack(thresh_mask),
            }
            if not self.is_training:
                data["anns"] = [a["poly"] for a in anns]
                data["ignore_tags"] = ignore_flags
            return data

        img = img.astype(np.float32) - self.mean  # RGB-order Caffe means

        data = {
            "image_path": image_path,
            "img": img,                       # (H, W, 3) float32 NHWC
            "prob_map": gt,
            "supervision_mask": mask,
            "thresh_map": thresh_map,
            "text_area_map": thresh_mask,
        }
        if not self.is_training:
            data["anns"] = [a["poly"] for a in anns]
            data["ignore_tags"] = ignore_flags
        return data


class TotalTextDataset(BaseDataset):
    """``src/data_loaders.py:175-211``."""
    parser = staticmethod(PARSERS["totaltext"])


class CTW1500Dataset(BaseDataset):
    """``src/data_loaders.py:214-253``."""
    parser = staticmethod(PARSERS["ctw1500"])


class ICDAR2015Dataset(BaseDataset):
    """``src/data_loaders.py:256-289``."""
    parser = staticmethod(PARSERS["icdar2015"])


class MSRATD500Dataset(BaseDataset):
    """``src/data_loaders.py:292-347``."""
    parser = staticmethod(PARSERS["msra_td500"])


class COCOTextDataset(BaseDataset):
    """COCO-Text v2 (reference TODO, ``README.md:100``)."""
    parser = staticmethod(PARSERS["cocotext"])


class SynthTextDataset(BaseDataset):
    """SynthText (reference TODO, ``README.md:101``)."""
    parser = staticmethod(PARSERS["synthtext"])


class ArT2019Dataset(BaseDataset):
    """ArT 2019 (reference TODO, ``README.md:102``)."""
    parser = staticmethod(PARSERS["art2019"])


DATASETS = {
    "totaltext": TotalTextDataset,
    "ctw1500": CTW1500Dataset,
    "icdar2015": ICDAR2015Dataset,
    "msra_td500": MSRATD500Dataset,
    "synthetic": TotalTextDataset,  # synthetic data is written in TT format
    "cocotext": COCOTextDataset,
    "synthtext": SynthTextDataset,
    "art2019": ArT2019Dataset,
}


def _stack_batch(samples: list[dict]) -> dict[str, Any]:
    batch: dict[str, Any] = {}
    for key in ("img", "prob_map", "supervision_mask", "thresh_map",
                "text_area_map"):
        batch[key] = np.stack([s[key] for s in samples])
    batch["image_path"] = [s["image_path"] for s in samples]
    if "anns" in samples[0]:
        batch["anns"] = [s["anns"] for s in samples]
        batch["ignore_tags"] = [s["ignore_tags"] for s in samples]
    return batch


class DataLoader:
    """Deterministic, optionally host-sharded, thread-prefetching loader.

    With ``num_hosts > 1`` each host sees a disjoint shard of every epoch's
    permutation — the TPU-native replacement for the reference's
    single-process torch DataLoader (``src/train.py:66-74``).
    ``drop_last=True`` keeps batch shapes static for XLA.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 42, num_hosts: int = 1, host_id: int = 0,
                 drop_last: bool | None = None, prefetch: int = 2,
                 num_workers: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.drop_last = shuffle if drop_last is None else drop_last
        self.prefetch = prefetch
        # sample decode + label generation run in a thread pool: cv2 and the
        # C++ geometry library release the GIL, so threads give real
        # parallelism without the fork hazards the reference worked around
        # (cv2.setNumThreads(0), src/train.py:25-26)
        self.num_workers = num_workers
        self.epoch = 0

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        return order[self.host_id::self.num_hosts]

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict[str, Any]]:
        order = self._indices()
        if hasattr(self.dataset, "epoch"):
            self.dataset.epoch = self.epoch
        self.epoch += 1
        n_batches = len(order) // self.batch_size if self.drop_last else \
            (len(order) + self.batch_size - 1) // self.batch_size

        pool = None
        if self.num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def fetch(indices):
            if pool is None:
                return [self.dataset[int(i)] for i in indices]
            return list(pool.map(lambda i: self.dataset[int(i)], indices))

        def batches():
            try:
                for b in range(n_batches):
                    idx = order[b * self.batch_size:
                                (b + 1) * self.batch_size]
                    yield _stack_batch(fetch(idx))
            finally:
                if pool is not None:
                    pool.shutdown(wait=False)

        if self.prefetch <= 0:
            yield from batches()
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list[BaseException] = []

        def producer():
            try:
                for batch in batches():
                    q.put(batch)
            except BaseException as e:  # surfaced on the consumer side
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item


def build_dataset(cfg, is_training: bool):
    """Dataset factory driven by the unified config
    (``src/train.py:29-74`` equivalent)."""
    name = cfg.dataset.name
    section = cfg.data[name]
    cls = DATASETS[name]
    return cls(
        section.train_dir if is_training else section.test_dir,
        section.train_gt_dir if is_training else section.test_gt_dir,
        section.ignore_tags,
        is_training=is_training,
        image_size=cfg.hps.img_size,
        seed=cfg.trainer.seed if cfg.trainer else 42,
        # compact host->device transfers (uint8 img + masks, f16 thresh);
        # the trainer finishes preprocessing on device
        compact_dtypes=True,
    )


def _visualize_sample_main():
    """GT overlay visualization, the ``src/data_loaders.py:350-393``
    ``__main__``: load one training sample and save the prob/thresh map
    overlay to tmp/foo.jpg.

    Usage: ``python -m db_text_minimal_tpu.data.datasets [config.yaml]``
    """
    import sys

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..config import load_config
    from ..utils import minmax_scaler_img

    cfg = load_config(sys.argv[1] if len(sys.argv) > 1 else None)
    dataset = build_dataset(cfg, is_training=True)
    loader = DataLoader(dataset, batch_size=1, shuffle=True, prefetch=0)
    samples = next(iter(loader))
    plt.figure()
    plt.imshow(minmax_scaler_img(samples["img"][0]))
    plt.imshow(samples["prob_map"][0], cmap="jet", alpha=0.35)
    plt.imshow(samples["thresh_map"][0], cmap="jet", alpha=0.5)
    os.makedirs(os.path.join(cfg.meta.root_dir or ".", "tmp"), exist_ok=True)
    out = os.path.join(cfg.meta.root_dir or ".", "tmp", "foo.jpg")
    plt.savefig(out, bbox_inches="tight")
    print(f"saved {out}")


if __name__ == "__main__":
    _visualize_sample_main()
