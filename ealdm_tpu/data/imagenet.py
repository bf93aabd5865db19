"""ImageNet dataset machinery (egress-free parts), numpy/PIL.

Parity target: `/root/reference/ldm/data/imagenet.py:26-394` minus the
downloads (academictorrents fetch / heibox label files — impossible and
pointless here). Everything buildable from a LOCAL tree is implemented:

  * `str_to_indices` / `give_synsets_from_indices` / `synset2idx`
    (the taming helpers the reference imports, re-derived)
  * filelist preparation from a `datadir` of synset subdirectories
    (the post-extraction layout), with `is_prepared`/`mark_prepared`
    ready-flag semantics (taming.data.utils)
  * `_filter_relpaths` semantics: the known-corrupt ignore list and
    `sub_indices` synset filtering
  * synset -> human label table (`synset_human.txt`), human -> integer
    label table (`imagenet1000_clsidx_to_labels.txt` `idx: label` lines),
    `index_synset.yaml`
  * `class_label` either densely re-indexed over the present synsets or
    the original 1000-class index (`keep_orig_class_label`)

`ImageNetLocal` yields the reference example dict (image in [-1,1],
relpath/synset/class_label/human_label) and `ImageNetSRLocal` pairs it
with the BSRGAN-degraded LR view for the SR configs.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .images import center_crop_resize
from .pipeline import Dataset

# known-corrupt files the reference drops (ldm/data/imagenet.py:49-51)
IGNORE_FILES = {"n06596364_9591.JPEG"}

_READY_FLAG = ".ready"


def is_prepared(root: str) -> bool:
    return os.path.exists(os.path.join(root, _READY_FLAG))


def mark_prepared(root: str) -> None:
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, _READY_FLAG), "w"):
        pass


def str_to_indices(string: str) -> List[int]:
    """'5,10-12,30' -> [5, 10, 11, 12, 30] (taming.data.imagenet helper)."""
    assert not string.endswith(","), f"provided string '{string}' ends in ,"
    out: List[int] = []
    for part in string.split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            lo, hi = part.split("-")
            out.extend(range(int(lo), int(hi) + 1))
        else:
            out.append(int(part))
    return sorted(set(out))


def load_index_synset(path_to_yaml: str) -> Dict[int, str]:
    """index_synset.yaml: `idx: synset` lines -> {idx: synset}."""
    import yaml

    with open(path_to_yaml) as f:
        d = yaml.safe_load(f)
    return {int(k): str(v) for k, v in d.items()}


def give_synsets_from_indices(indices: Sequence[int],
                              path_to_yaml: str) -> List[str]:
    idx2syn = load_index_synset(path_to_yaml)
    return [idx2syn[i] for i in indices if i in idx2syn]


def synset2idx(path_to_yaml: str) -> Dict[str, int]:
    return {v: k for k, v in load_index_synset(path_to_yaml).items()}


def load_synset_human(path: str) -> Dict[str, str]:
    """synset_human.txt: `nXXXXXXXX  human, readable, label` lines."""
    with open(path) as f:
        lines = [l for l in f.read().splitlines() if l.strip()]
    return dict(line.split(maxsplit=1) for line in lines)


def load_human_to_integer(path: str) -> Dict[str, int]:
    """imagenet1000_clsidx_to_labels.txt: `idx: label` lines
    (reference `_prepare_human_to_integer_label`)."""
    out: Dict[str, int] = {}
    with open(path) as f:
        for line in f.read().splitlines():
            if not line.strip():
                continue
            value, key = line.split(":", 1)
            out[key.strip()] = int(value)
    return out


def prepare_filelist(root: str, datadir: Optional[str] = None,
                     filename: str = "filelist.txt") -> str:
    """Scan `datadir` (synset subdirectories of JPEGs — the layout the
    reference's tar extraction produces) and write the sorted relpath
    filelist, with ready-flag idempotence. Returns the filelist path."""
    datadir = datadir or os.path.join(root, "data")
    txt_filelist = os.path.join(root, filename)
    if not is_prepared(root):
        files = glob.glob(os.path.join(datadir, "**", "*.JPEG"),
                          recursive=True)
        files += glob.glob(os.path.join(datadir, "**", "*.jpeg"),
                           recursive=True)
        files += glob.glob(os.path.join(datadir, "**", "*.png"),
                           recursive=True)
        rel = sorted(os.path.relpath(p, start=datadir) for p in files)
        with open(txt_filelist, "w") as f:
            f.write("\n".join(rel) + ("\n" if rel else ""))
        mark_prepared(root)
    return txt_filelist


class ImageNetLocal(Dataset):
    """ImageNet(-style) dataset over a local synset tree.

    root/
      data/nXXXXXXXX/*.JPEG     (images per synset)
      filelist.txt              (auto-prepared)
      synset_human.txt          (optional: human labels)
      index_synset.yaml         (optional: original 1000-class indexing)
    """

    def __init__(
        self,
        root: str,
        size: int = 256,
        sub_indices: Optional[str] = None,
        keep_orig_class_label: bool = False,
        flip_p: float = 0.0,
        seed: int = 0,
    ):
        self.root = root
        self.datadir = os.path.join(root, "data")
        self.size = size
        self.flip_p = flip_p
        self._rng = np.random.RandomState(seed)

        txt = prepare_filelist(root, self.datadir)
        with open(txt) as f:
            relpaths = [l for l in f.read().splitlines() if l]
        relpaths = self._filter_relpaths(relpaths, sub_indices)

        self.relpaths = relpaths
        self.synsets = [p.split(os.sep)[0] for p in relpaths]
        self.abspaths = [os.path.join(self.datadir, p) for p in relpaths]

        unique = sorted(set(self.synsets))
        dense = {s: i for i, s in enumerate(unique)}
        if keep_orig_class_label:
            s2i = synset2idx(os.path.join(root, "index_synset.yaml"))
            self.class_labels = [s2i[s] for s in self.synsets]
        else:
            self.class_labels = [dense[s] for s in self.synsets]

        human_path = os.path.join(root, "synset_human.txt")
        if os.path.exists(human_path):
            hd = load_synset_human(human_path)
            self.human_labels = [hd.get(s, s) for s in self.synsets]
        else:
            self.human_labels = list(self.synsets)

    def _filter_relpaths(self, relpaths: List[str],
                         sub_indices: Optional[str]) -> List[str]:
        relpaths = [
            r for r in relpaths if os.path.basename(r) not in IGNORE_FILES
        ]
        if sub_indices:
            indices = str_to_indices(sub_indices)
            synsets = set(give_synsets_from_indices(
                indices, os.path.join(self.root, "index_synset.yaml")))
            relpaths = [r for r in relpaths
                        if r.split(os.sep)[0] in synsets]
        return relpaths

    def __len__(self):
        return len(self.relpaths)

    def _load_image(self, path: str) -> np.ndarray:
        from PIL import Image

        arr = np.asarray(Image.open(path).convert("RGB"))
        arr = center_crop_resize(arr, self.size)
        if self.flip_p > 0 and self._rng.rand() < self.flip_p:
            arr = arr[:, ::-1]
        return arr

    def __getitem__(self, i):
        arr = self._load_image(self.abspaths[i])
        return {
            "image": arr.astype(np.float32) / 127.5 - 1.0,
            "relpath": self.relpaths[i],
            "synsets": self.synsets[i],
            "class_label": self.class_labels[i],
            "human_label": self.human_labels[i],
            "file_path_": self.abspaths[i],
        }


class ImageNetSRLocal(ImageNetLocal):
    """HR/LR pair view for the SR configs (reference ImageNetSR): the LR
    image comes from the BSRGAN-light degradation over a downscaled copy."""

    def __init__(self, *args, downscale_f: int = 4, degradation: str = "light",
                 **kw):
        super().__init__(*args, **kw)
        self.downscale_f = downscale_f
        self.degradation = degradation

    def __getitem__(self, i):
        ex = super().__getitem__(i)
        # rint before the cast: the float32 [-1,1] round-trip leaves values
        # like 2.9999998, which a bare uint8 cast would truncate to 2
        hr_uint8 = np.rint((ex["image"] + 1.0) * 127.5).clip(0, 255).astype(
            np.uint8)
        if self.degradation in ("bsrgan", "bsrgan_light"):
            from .degradation import (
                degradation_fn_bsr, degradation_fn_bsr_light,
            )

            fn = (degradation_fn_bsr_light
                  if self.degradation.endswith("light")
                  else degradation_fn_bsr)
            lr, _ = fn(hr_uint8.astype(np.float32) / 255.0,
                       sf=self.downscale_f, rng=self._rng)
        else:
            from .images import degrade_sr_light

            lr = degrade_sr_light(
                hr_uint8, self.downscale_f, self._rng
            ).astype(np.float32) / 255.0
        ex["LR_image"] = lr.astype(np.float32) * 2.0 - 1.0
        return ex
