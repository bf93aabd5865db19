"""ImageNet synset machinery over a fabricated local tree
(reference ldm/data/imagenet.py:26-394, egress-free parts)."""
import os

import numpy as np
import pytest

from ealdm_tpu.data.imagenet import (
    ImageNetLocal, ImageNetSRLocal, give_synsets_from_indices, is_prepared,
    load_human_to_integer, load_synset_human, prepare_filelist,
    str_to_indices, synset2idx,
)


def _make_tree(root, synsets=("n01440764", "n01443537", "n02084071"),
               per=2, size=40):
    from PIL import Image

    rng = np.random.RandomState(0)
    for s in synsets:
        d = root / "data" / s
        d.mkdir(parents=True)
        for i in range(per):
            arr = rng.randint(0, 255, (size, size, 3), np.uint8)
            Image.fromarray(arr).save(d / f"{s}_{i}.JPEG")
    # corrupt-ignore-list file: must be dropped
    bad = root / "data" / synsets[0] / "n06596364_9591.JPEG"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(bad)
    (root / "synset_human.txt").write_text(
        "\n".join(f"{s} name of {s}" for s in synsets) + "\n")
    (root / "index_synset.yaml").write_text(
        "\n".join(f"{i}: {s}" for i, s in enumerate(synsets)) + "\n")
    return synsets


def test_str_to_indices():
    assert str_to_indices("5,10-12,30") == [5, 10, 11, 12, 30]
    assert str_to_indices("3") == [3]
    with pytest.raises(AssertionError):
        str_to_indices("3,")


def test_synset_tables(tmp_path):
    _make_tree(tmp_path)
    idx_yaml = str(tmp_path / "index_synset.yaml")
    assert give_synsets_from_indices([0, 2], idx_yaml) == [
        "n01440764", "n02084071"]
    assert synset2idx(idx_yaml)["n01443537"] == 1
    hd = load_synset_human(str(tmp_path / "synset_human.txt"))
    assert hd["n01440764"] == "name of n01440764"


def test_human_to_integer(tmp_path):
    p = tmp_path / "imagenet1000_clsidx_to_labels.txt"
    p.write_text("0: tench, Tinca tinca\n1: goldfish, Carassius auratus\n")
    d = load_human_to_integer(str(p))
    assert d["tench, Tinca tinca"] == 0
    assert d["goldfish, Carassius auratus"] == 1


def test_filelist_prepare_idempotent(tmp_path):
    _make_tree(tmp_path)
    txt = prepare_filelist(str(tmp_path))
    lines = open(txt).read().splitlines()
    assert len(lines) == 7  # 3 synsets x 2 + the ignored file (raw list)
    assert lines == sorted(lines)
    assert is_prepared(str(tmp_path))
    # second call must not rescan (drop a file; list unchanged)
    os.remove(tmp_path / "data" / lines[0])
    assert open(prepare_filelist(str(tmp_path))).read().splitlines() == lines


def test_dataset_labels_and_filtering(tmp_path):
    synsets = _make_tree(tmp_path)
    ds = ImageNetLocal(str(tmp_path), size=32)
    # ignore list dropped the corrupt file
    assert len(ds) == 6
    ex = ds[0]
    assert ex["image"].shape == (32, 32, 3)
    assert -1.0 <= ex["image"].min() and ex["image"].max() <= 1.0
    assert ex["synsets"] in synsets
    assert ex["human_label"] == f"name of {ex['synsets']}"
    # dense class labels over present synsets
    assert sorted({ds[i]["class_label"] for i in range(len(ds))}) == [0, 1, 2]
    # original 1000-class indexing
    ds_orig = ImageNetLocal(str(tmp_path), size=32, keep_orig_class_label=True)
    assert {ds_orig[i]["class_label"] for i in range(len(ds_orig))} == {0, 1, 2}
    # sub_indices filtering
    ds_sub = ImageNetLocal(str(tmp_path), size=32, sub_indices="1-2")
    assert len(ds_sub) == 4
    assert {ds_sub[i]["synsets"] for i in range(len(ds_sub))} == {
        "n01443537", "n02084071"}


def test_sr_dataset_pairs(tmp_path):
    _make_tree(tmp_path, per=1, size=64)
    ds = ImageNetSRLocal(str(tmp_path), size=64, downscale_f=4)
    ex = ds[0]
    assert ex["image"].shape == (64, 64, 3)
    assert ex["LR_image"].shape == (16, 16, 3)
    assert np.isfinite(ex["LR_image"]).all()
