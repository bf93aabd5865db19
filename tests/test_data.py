"""Data layer: scalers, loaders, synthetic ETL end-to-end, batch schema."""
import json
import os

import numpy as np
import pytest

from ealdm_tpu.data import (
    DataLoader,
    ImageFolderDataset,
    MinMaxScaler,
    MultiLabelBinarizer,
    StandardScaler,
    StreamCameraDataset,
    WEATHER_CLASSES,
    generate_synthetic_dataset,
    load_scaler,
    parse_response_jsonl,
    save_scaler,
)
from ealdm_tpu.data.gpt_labels import create_req_file


def test_scalers_roundtrip(tmp_path, rng):
    x = rng.randn(20, 3) * 5 + 2
    s = StandardScaler()
    y = s.fit_transform(x)
    assert abs(y.mean()) < 1e-9 and abs(y.std(axis=0).mean() - 1) < 1e-9
    np.testing.assert_allclose(s.inverse_transform(y), x, rtol=1e-9)
    save_scaler(s, str(tmp_path / "s.json"))
    s2 = load_scaler(str(tmp_path / "s.json"))
    np.testing.assert_allclose(s2.transform(x), y)

    m = MinMaxScaler()
    ym = m.fit_transform(x)
    assert ym.min() >= 0 and ym.max() <= 1
    np.testing.assert_allclose(m.inverse_transform(ym), x, rtol=1e-9)

    b = MultiLabelBinarizer(WEATHER_CLASSES)
    enc = b.transform([["Rainy", "Windy"], ["Sunny/Clear"]])
    assert enc.shape == (2, 10) and enc.sum() == 3
    assert b.inverse_transform(enc)[0] == ["Rainy", "Windy"]


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fpe") / "data")
    generate_synthetic_dataset(root, n_days=14, image_size=32)
    return root + "/"


def test_synthetic_etl_trainval(synthetic_root):
    ds = StreamCameraDataset(
        path=synthetic_root, path_weather=synthetic_root,
        phase="trainval", batch_size=1, len_seq=1, image_size=32,
    )
    assert len(ds) > 0
    sample = ds[0]
    assert sample["img"].shape == (32, 32, 3)
    assert -1.0 <= sample["img"].min() and sample["img"].max() <= 1.0
    m = sample["mixed"]
    assert m["img"].shape == (32, 32, 3)
    assert m["flow"].shape == (1, 1)
    assert m["weather"].shape == (1, 16)
    assert m["time"].shape == (1,)
    assert m["wlabel_nxt"].shape == (10,)
    assert m["img_random"].shape == (32, 32, 3)
    # scalers persisted as JSON
    assert os.path.exists(os.path.join(synthetic_root, "flow_scaler_trainval.json"))
    # negative sample comes from a different site (different image content)
    assert not np.allclose(m["img"], m["img_random"])


def test_synthetic_etl_split_disjoint(synthetic_root):
    tr = StreamCameraDataset(
        path=synthetic_root, path_weather=synthetic_root, phase="trainval",
        image_size=32,
    )
    te = StreamCameraDataset(
        path=synthetic_root, path_weather=synthetic_root, phase="test",
        image_size=32, test_sites=("Site_A_01",),
    )
    tr_ids = {tuple(e[2] for e in win) for win in tr.images}
    te_ids = {tuple(e[2] for e in win) for win in te.images}
    assert te_ids and tr_ids
    # fractional split scheme: trainval takes [0,.375)+[.675,1); test [.375,.675)
    assert not (tr_ids & te_ids)


def test_dataloader_batching(synthetic_root):
    ds = StreamCameraDataset(
        path=synthetic_root, path_weather=synthetic_root, phase="trainval",
        image_size=32,
    )
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=7)
    batch = next(iter(dl))
    assert batch["img"].shape == (2, 32, 32, 3)
    assert batch["mixed"]["weather"].shape == (2, 1, 16)
    assert batch["mixed"]["time"].shape == (2, 1)
    # epoch reshuffle is deterministic per (seed, epoch)
    b1 = next(iter(dl))
    dl2 = DataLoader(ds, batch_size=2, shuffle=True, seed=7)
    b2 = next(iter(dl2))
    np.testing.assert_allclose(b1["img"], b2["img"])


def test_data_module_from_reference_config(synthetic_root):
    from ealdm_tpu.config import instantiate_from_config

    cfg = {
        "target": "main.DataModuleFromConfig",
        "params": {
            "batch_size": 2,
            "num_workers": 0,
            "wrap": False,
            "train": {
                "target": "STDiff.dataset_wlbl.ImageNetVidDataset",
                "params": {
                    "batch_size": 1, "len_seq": 1, "image_size": 32,
                    "path": synthetic_root, "path_weather": synthetic_root,
                    "phase": "trainval",
                },
            },
        },
    }
    params = dict(cfg["params"])
    dm_cfgs = {
        k: params.pop(k)
        for k in ("train", "validation", "test", "predict")
        if k in params
    }
    from ealdm_tpu.data import DataModule

    dm = DataModule(batch_size=params["batch_size"], dataset_configs=dm_cfgs)
    dl = dm.train_dataloader()
    batch = next(iter(dl))
    assert batch["img"].shape[0] == 2


def test_gpt_request_and_response_roundtrip(tmp_path):
    rows = [
        {"TIMESTAMP": 1600000000, "Average Temp": 12.0, "Max Daily Temp": 15.0,
         "Min Temp": 8.0, "Wind Speed": 2.0, "Wind Direction": 180.0,
         "Max Wind Spd": 4.0, "Minimum Wind Spd": 0.0,
         "Mean Relative Humidity": 70.0, "Atmospheric Pressure": 1013.0,
         "Mean Solar Radiation": 200.0, "Total Rainfall": 0.0}
    ]
    req_path = str(tmp_path / "req.jsonl")
    create_req_file(rows, req_path)
    req = json.loads(open(req_path).read().strip())
    assert req["messages"][1]["content"].startswith("Classify the input sensor")


def test_image_folder_dataset(tmp_path, rng):
    import numpy as np

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        np.save(d / f"im{i}.npy", (rng.rand(40, 48, 3) * 255).astype(np.uint8))
    ds = ImageFolderDataset(str(d), size=32)
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert -1 <= item["image"].min() and item["image"].max() <= 1
