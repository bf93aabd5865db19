"""Stream-camera ETL value parity vs the ACTUAL reference dataset.

Runs the reference `STDiff.dataset_wlbl.ImageNetVidDataset` ETL (CSV joins,
half-up timestamp rounding, 1-daytime-frame/day filter, GPT-label parsing,
non-overlap windowing, fractional/shuffled phase splits, Standard/MinMax/
MultiLabelBinarizer normalization — dataset_wlbl.py:56-500) over the
in-repo synthetic FPE-westbrook corpus and asserts our
`StreamCameraDataset` produces the same windows, normalized env tensors and
scaler parameters. Shims are IO-only: pd.read_excel is redirected to the
equivalent CSV (no openpyxl in-env), and skimage/torchvision construct-only
stubs satisfy imports the ctor never exercises.
"""
import json
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pd = pytest.importorskip("pandas")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from ealdm_tpu.data import generate_synthetic_dataset

    root = str(tmp_path_factory.mktemp("fpe")) + os.sep
    generate_synthetic_dataset(root, sites=("Site_A_01", "Site_B_02"),
                               n_days=40, image_size=16)
    # the reference globs Weather/*.xlsx only — give it its OWN weather root
    # with an xlsx marker (redirected to the CSV by the read_excel IO shim)
    # so our loader, pointed at the original root, sees only the CSV
    wref_root = os.path.join(root, "wref") + os.sep
    os.makedirs(os.path.join(wref_root, "Weather"), exist_ok=True)
    open(os.path.join(wref_root, "Weather", "daily.xlsx"), "w").close()
    os.symlink(os.path.join(root, "Weather", "daily.csv"),
               os.path.join(wref_root, "Weather", "daily.csv"))
    os.symlink(os.path.join(root, "response.jsonl"),
               os.path.join(wref_root, "response.jsonl"))
    # the reference treats EVERY entry of os.listdir(path) as a site folder
    # (dataset_wlbl.py:83), so its image root must contain only sites;
    # weather/labels live under path_weather
    sites_root = os.path.join(root, "sites") + os.sep
    os.makedirs(sites_root, exist_ok=True)
    for s in ("Site_A_01", "Site_B_02"):
        os.symlink(os.path.join(root, s), os.path.join(sites_root, s))
    return sites_root, root, wref_root


def _reference_dataset(root, weather_root, scaler_dir, phase, mask_frac, **kw):
    created = []

    def ensure(name, **attrs):
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
            created.append(name)
        return sys.modules[name]

    nop = lambda *a, **k: None
    ensure("skimage")
    ensure("skimage.metrics", mean_squared_error=nop,
           structural_similarity=nop, normalized_root_mse=nop)
    sys.modules["skimage"].metrics = sys.modules["skimage.metrics"]
    if "torchvision" not in sys.modules:
        tv = ensure("torchvision")
        cls = lambda name: type(name, (), {"__init__": lambda self, *a, **k: None})
        tv.transforms = types.SimpleNamespace(
            Compose=cls("Compose"), ToPILImage=cls("ToPILImage"),
            Resize=cls("Resize"), ToTensor=cls("ToTensor"),
            Normalize=cls("Normalize"),
        )

    real_read_excel = pd.read_excel

    def read_excel_as_csv(path, skiprows=None, parse_dates=None, **k):
        # IO-only shim: the synthetic corpus carries the same table as CSV
        # without the 3 banner rows the reference's skiprows drops
        return pd.read_csv(str(path).replace(".xlsx", ".csv"),
                           parse_dates=parse_dates)

    pd.read_excel = read_excel_as_csv
    # pandas>=2.2 removed DataFrame.applymap (renamed to .map); the
    # reference uses the old name (dataset_wlbl.py:249)
    had_applymap = hasattr(pd.DataFrame, "applymap")
    if not had_applymap:
        pd.DataFrame.applymap = pd.DataFrame.map
    # pandas>=2 rejects the redundant drop(columns=..., axis=1) the
    # reference writes (dataset_wlbl.py:347); old pandas tolerated it
    real_drop = pd.DataFrame.drop

    def _tolerant_drop(self, labels=None, **kw):
        if "columns" in kw and kw.get("axis") == 1:
            kw.pop("axis")
        if labels is None:
            return real_drop(self, **kw)
        return real_drop(self, labels, **kw)

    pd.DataFrame.drop = _tolerant_drop
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from STDiff.dataset_wlbl import ImageNetVidDataset

        return ImageNetVidDataset(
            path=root, path_weather=weather_root, path_scaler=scaler_dir,
            phase=phase, mask_frac=mask_frac, image_size=16, **kw)
    finally:
        pd.read_excel = real_read_excel
        pd.DataFrame.drop = real_drop
        if not had_applymap:
            del pd.DataFrame.applymap
        for name in created:
            sys.modules.pop(name, None)


@pytest.mark.parametrize("phase,mask_frac", [
    ("train", 0),   # fractional 0.375/0.875 split (dataset_wlbl.py:443-460)
    ("train", 1),   # seed-42 shuffled 0.8 split (:406-412,435-441)
    ("val", 0),
])
def test_etl_value_parity(corpus, tmp_path, phase, mask_frac):
    from ealdm_tpu.data.stdiff import StreamCameraDataset

    sites_root, weather_root, wref_root = corpus
    # reference iterates os.listdir order; the comparison below assumes it
    # coincides with our sorted order (holds for this fixture)
    sites = [d for d in os.listdir(sites_root)
             if os.path.isfile(os.path.join(sites_root, d, "images.csv"))]
    assert sites == sorted(sites)

    kw = dict(batch_size=1, len_seq=4)
    ref = _reference_dataset(sites_root, wref_root,
                             str(tmp_path) + os.sep, phase, mask_frac, **kw)
    ours = StreamCameraDataset(
        path=sites_root, path_weather=weather_root, phase=phase,
        mask_frac=mask_frac, image_size=16,
        path_scaler=str(tmp_path / "ours"), **kw)

    # windows: same image ids in the same order
    assert ours.images.shape == ref.images.shape
    np.testing.assert_array_equal(
        ours.images[:, :, 2].astype(np.int64),
        ref.images[:, :, 2].astype(np.int64))

    # normalized env tensors
    np.testing.assert_allclose(
        ours.flows, np.asarray(ref.labels, np.float64), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        ours.dates, np.asarray(ref.dates, np.float64), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        ours.weather, np.asarray(ref.weather, np.float64), rtol=1e-9, atol=1e-7)
    np.testing.assert_array_equal(
        ours.weather_label, np.asarray(ref.weather_label))

    # scaler parameters round-trip (flow Standard, time MinMax)
    np.testing.assert_allclose(
        np.asarray(ours.normalizer.mean_), ref.normalizer.mean_, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(ours.normalizer.scale_), ref.normalizer.scale_, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(ours.timetransformer.data_min_),
        ref.timetransformer.data_min_, rtol=1e-9)
