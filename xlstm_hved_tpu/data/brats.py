"""BraTS dataset with modality dropout + a prefetching host loader.

Re-design of /root/reference/BraTSdataset.py:276-428 (GBMset) without torch
DataLoader: a thread-pool prefetcher feeds numpy batches; augmentation runs
on device (data/transforms.py). Semantics kept:
- per-subject NIfTI layout {subject}-{t1c,t1n,t2f,t2w,seg}.nii.gz,
- random modality dropout with >=1 modality kept (:402-405),
- m_full=False forces >=1 dropped modality (:411-416),
- corrupt subjects are skipped (the reference returns None and filters in
  custom_collate_fn, utils.py:168-173).
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from xlstm_hved_tpu.data.nifti import load_subject
from xlstm_hved_tpu.data.transforms import background_info


class BraTSDataset:
    def __init__(self, data_dir: str, m_full: bool = False,
                 suffixes=("t1c", "t1n", "t2f", "t2w"),
                 seed: int = 0, use_native: Optional[bool] = None):
        self.data_dir = data_dir
        self.m_full = m_full
        self.suffixes = suffixes
        self.subjects: List[str] = sorted(
            d for d in os.listdir(data_dir)
            if os.path.isdir(os.path.join(data_dir, d)))
        self.rng = np.random.RandomState(seed)
        if use_native is None:
            # the native loader decodes modalities in parallel threads; only
            # worth it with more than one core
            use_native = (os.cpu_count() or 1) > 1
        self.use_native = use_native
        if self.use_native:
            from xlstm_hved_tpu.runtime import native_available
            self.use_native = native_available()

    def __len__(self) -> int:
        return len(self.subjects)

    def load(self, index: int) -> Optional[Tuple[np.ndarray, np.ndarray,
                                                 np.ndarray, np.ndarray]]:
        """Returns (img (D,H,W,4) fp32, labels (D,H,W), keep (4,) bool,
        bg_info (3,)) or None on load error."""
        subject = self.subjects[index]
        try:
            if self.use_native:
                from xlstm_hved_tpu.data.nifti import read_nifti
                from xlstm_hved_tpu.runtime import native_read_subject
                img = native_read_subject(self.data_dir, subject,
                                          self.suffixes)
                seg_path = os.path.join(self.data_dir, subject,
                                        f"{subject}-seg.nii.gz")
                if not os.path.exists(seg_path):
                    seg_path = seg_path[:-3]
                seg, _ = read_nifti(seg_path)
            else:
                img, seg = load_subject(self.data_dir, subject, self.suffixes)
        except Exception as e:  # noqa: BLE001 — skip corrupt subjects
            print(f"error {e} loading {subject}, skipping")
            return None
        keep = self.sample_keep()
        bg = background_info(img)
        img = np.moveaxis(img, 0, -1).astype(np.float32)  # channels-last
        return img, seg.astype(np.int32), keep, bg

    def sample_keep(self) -> np.ndarray:
        """Random modality keep mask (True=present), reference semantics
        (BraTSdataset.py:387-416)."""
        keep = self.rng.randint(2, size=4).astype(bool)
        if not keep.any():
            keep[self.rng.randint(4)] = True
        if not self.m_full and keep.all():
            keep[self.rng.randint(4)] = False
        return keep


def prefetch_loader(dataset: BraTSDataset, batch_size: int = 1,
                    shuffle: bool = True, num_threads: int = 2,
                    drop_last: bool = True, seed: int = 0,
                    epochs: Optional[int] = 1,
                    shard: Optional[Tuple[int, int]] = None
                    ) -> Iterator[List[Tuple]]:
    """Threaded prefetching iterator yielding lists of per-subject tuples
    (batching/padding happens in the engine, which knows the crop size).

    `shard=(process_id, process_count)` gives each host a disjoint strided
    slice of the (identically seeded, hence identically shuffled) index
    order — per-host data loading for multi-host data parallelism."""
    order_rng = np.random.RandomState(seed)
    q: "queue.Queue" = queue.Queue(maxsize=max(2 * batch_size, 4))
    stop = threading.Event()

    def producer():
        epoch = 0
        while not stop.is_set() and (epochs is None or epoch < epochs):
            idxs = np.arange(len(dataset))
            if shuffle:
                order_rng.shuffle(idxs)
            if shard is not None:
                idxs = idxs[shard[0]::shard[1]]
            for i in idxs:
                if stop.is_set():
                    return
                item = dataset.load(int(i))
                if item is not None:
                    q.put(item)
            epoch += 1
        q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        batch: List[Tuple] = []
        while True:
            item = q.get()
            if item is None:
                break
            batch.append(item)
            if len(batch) == batch_size:
                yield batch
                batch = []
        if batch and not drop_last:
            yield batch
    finally:
        stop.set()


class HDF5Dataset:
    """BraTS2018/ISLES-style HDF5 validation sets (reference GBMValidset /
    ISLESset, BraTSdataset.py:176-273,431-586): an .h5 with 'image' and
    optional 'label' datasets per index; per-channel z-score over brain."""

    def __init__(self, path: str, image_key: str = "image",
                 label_key: str = "label", zscore: bool = True):
        import h5py

        self.f = h5py.File(path, "r")
        self.images = self.f[image_key]
        self.labels = self.f[label_key] if label_key in self.f else None
        self.zscore = zscore

    def __len__(self):
        return len(self.images)

    def load(self, index: int):
        from xlstm_hved_tpu.data.transforms import host_zscore_nonzero

        img = np.asarray(self.images[index], np.float32)
        if img.ndim == 3:
            img = img[None]
        if self.zscore:
            img = host_zscore_nonzero(img)
        lab = (np.asarray(self.labels[index], np.int32)
               if self.labels is not None else None)
        return np.moveaxis(img, 0, -1), lab


class ISLESDataset:
    """ISLES HDF5 dataset (reference ISLESset,
    /root/reference/BraTSdataset.py:176-273): an .h5 with 'images' (N, 4, D,
    H, W) and 'masks' (N, D, H, W); per-channel z-score over non-background
    voxels; per-modality Bernoulli(0.5) dropout (each modality independently
    DROPPED when rand > 0.5, BraTSdataset.py:247-262) with >=1 modality kept
    and, when m_full=False, >=1 dropped (:265-273).

    The reference's dynamic extract_brain crop becomes the same static pad
    policy as BraTSDataset (TPU shapes must be static); bg_info still marks
    the brain bbox corner for the croppers.
    """

    def __init__(self, path: str, indices: Optional[Sequence[int]] = None,
                 m_full: bool = False, zscore: bool = True, seed: int = 0,
                 image_key: str = "images", mask_key: str = "masks"):
        import h5py

        self.f = h5py.File(path, "r")
        self.images = self.f[image_key]
        self.masks = self.f[mask_key] if mask_key in self.f else None
        self.indices = (list(indices) if indices is not None
                        else list(range(len(self.images))))
        self.m_full = m_full
        self.zscore = zscore
        self.rng = np.random.RandomState(seed)
        self.subjects = [str(i) for i in self.indices]  # loader parity

    def __len__(self) -> int:
        return len(self.indices)

    def sample_keep(self) -> np.ndarray:
        """Bernoulli(0.5) per-modality keep (True = present)."""
        keep = self.rng.rand(4) <= 0.5  # dropped when rand > 0.5
        if not keep.any():
            keep[self.rng.randint(4)] = True
        if not self.m_full and keep.all():
            keep[self.rng.randint(4)] = False
        return keep

    def load(self, index: int):
        """(img (D,H,W,4) fp32 z-scored, labels (D,H,W) int32, keep (4,)
        bool, bg_info (3,)) — the same item contract as BraTSDataset."""
        from xlstm_hved_tpu.data.transforms import (background_info,
                                                    host_zscore_nonzero)

        i = self.indices[index]
        img = np.asarray(self.images[i], np.float32)      # (4, D, H, W)
        if self.zscore:
            img = host_zscore_nonzero(img)
        lab = (np.asarray(self.masks[i], np.int32)
               if self.masks is not None
               else np.zeros(img.shape[1:], np.int32))
        bg = background_info(img)
        return (np.moveaxis(img, 0, -1).astype(np.float32), lab,
                self.sample_keep(), bg)


class BraTSValidationSet:
    """Label-free BraTS2018 HDF5 validation set (reference GBMValidset /
    GBMValidset2, /root/reference/BraTSdataset.py:431-593): 'images'
    (N, 4, W, H, D) transposed to (4, D, H, W); optional reference
    extract_brain crop (dynamic bbox, >=112 per axis); the reference's
    channel-0-mask z-score; per-modality U(0,1)>0.5 dropout with BOTH guard
    rails — at least one modality restored when all four drew >0.5
    (:501-505) and one dropped when none did (:507-511), i.e. every item has
    >=1 kept AND >=1 missing modality.

    Masks don't exist for the validation split; a zero placeholder keeps the
    item contract (the reference does the same, :464). When `extract`, the
    crop is padded up to a multiple of `pad_multiple` per axis so the eval
    jit sees a bounded set of shapes instead of one per subject.
    """

    def __init__(self, path: str, indices: Optional[Sequence[int]] = None,
                 extract: bool = True, seed: int = 0,
                 image_key: str = "images", pad_multiple: int = 16):
        import h5py

        self.f = h5py.File(path, "r")
        self.images = self.f[image_key]
        self.indices = (list(indices) if indices is not None
                        else list(range(len(self.images))))
        self.extract = extract
        self.pad_multiple = pad_multiple
        self.rng = np.random.RandomState(seed)
        self.subjects = [str(i) for i in self.indices]

    def __len__(self) -> int:
        return len(self.indices)

    def sample_keep(self) -> np.ndarray:
        """U(0,1) per modality, dropped when > 0.5; >=1 kept and >=1
        dropped (GBMValidset.__getitem__, BraTSdataset.py:480-511)."""
        ch = self.rng.rand(4)
        keep = ch <= 0.5
        if not keep.any():
            keep[self.rng.choice(4)] = True
        if keep.all():
            keep[self.rng.choice(4)] = False
        return keep

    def load(self, index: int):
        from xlstm_hved_tpu.data.transforms import (background_info,
                                                    extract_brain,
                                                    host_zscore_ref)

        i = self.indices[index]
        img = np.asarray(self.images[i], np.float32)       # (4, W, H, D)
        img = np.transpose(img, (0, 3, 2, 1))              # (4, D, H, W)
        bg = background_info(img)
        lab = np.zeros(img.shape[1:], np.int32)
        if self.extract:
            img, lab = extract_brain(img, lab)
            if self.pad_multiple > 1:
                m = self.pad_multiple
                pads = [(0, (-img.shape[1 + a]) % m) for a in range(3)]
                img = np.pad(img, [(0, 0)] + pads)
                lab = np.pad(lab, pads)
        img = host_zscore_ref(img)
        return (np.moveaxis(img, 0, -1).astype(np.float32),
                lab, self.sample_keep(), bg)
