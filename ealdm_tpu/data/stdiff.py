"""FPE-westbrook stream-camera dataset ETL (the EALDM data layer).

Parity target: `/root/reference/STDiff/dataset_wlbl.py` (and the uncond
variant `dataset.py`): per-site join of images.csv + values.csv (flow gauge)
+ daily weather station files + GPT weather labels on half-up-rounded
15-minute timestamps; one daytime frame per day; non-overlapping
(l_seq+1)-frame windows; fractional phase splits; per-site boundaries with
random OTHER-site sampling for the CFG negative; Standard/MinMax scalers fit
on the train distribution and persisted (JSON here instead of joblib).

Batch schema (dict-of-arrays, NHWC, static shapes — the jit contract):
  {"img":  [T,H,W,3]    next frame(s), [-1,1]
   "mixed": {"img":       [T,H,W,3] previous frame(s)
             "flow":      [T,1]   scaled gauge values
             "weather":   [T,16]  scaled sensor vector
             "time":      [T,1]   min-max-scaled capture time (next)
             "label_nxt": [T,1]   scaled next-step flow target
             "wlabel_nxt":[T,10]  multi-hot GPT weather labels (next)
             "ids_nxt":   [T,1]   image ids
             "img_random":[T,H,W,3] random other-site frame (CFG negative)}}
(l_seq == 1 squeezes T away, matching the reference contract.)
"""
from __future__ import annotations

import glob
import json
import os
from datetime import datetime, timedelta
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .pipeline import Dataset
from .scalers import (
    MinMaxScaler,
    MultiLabelBinarizer,
    StandardScaler,
    save_scaler,
)

WEATHER_CLASSES = [
    "Sunny/Clear", "Cloudy/Overcast", "Rainy", "Snowy", "Foggy/Misty",
    "Windy", "Stormy/Severe", "Hot/Heatwave", "Cold/Cold Wave",
    "Mixed/Variable",
]

# canonical 16-feature daily weather vector (order matters for parity)
WEATHER_COLUMNS = [
    "TIMESTAMP", "Average Temp", "Max Daily Temp", "Time of Daily Temp Max",
    "Min Temp", "Time of Min. Temp", "Wind Speed", "Wind Direction",
    "Max Wind Spd", "Time of Max Wind Spd", "Minimum Wind Spd",
    "Time of Min. Wind Spd.", "Mean Relative Humidity",
    "Atmospheric Pressure", "Mean Solar Radiation", "Total Rainfall",
]

DEFAULT_TEST_SITES = ("Avery Brook_Bridge_01171000",)


def half_up_minute(ts, minutes: int = 15):
    """Round a pandas Timestamp to the nearest 15-min grid (half-up)."""
    import pandas as pd

    delta = timedelta(minutes=minutes)
    ref = pd.Timestamp(datetime(1970, 1, 1), tz=getattr(ts, "tzinfo", None))
    return ref + round((ts - ref) / delta) * delta


def load_data_from_h5(h5_path: str):
    """Open an HDF5 capture file and return its (image, temps, depths,
    dates) datasets (`STDiff/dataset_wlbl.py:224-232`). Returned objects are
    lazy h5py datasets — index to materialise."""
    import h5py

    f = h5py.File(h5_path, "r")
    return f["image"], f["temps"], f["depths"], f["dates"]


def parse_response_jsonl(path: str) -> List[Tuple[str, List[str]]]:
    """Parse the GPT label response file into [(date 'YYYY-MM-DD', labels)].

    Accepts the reference's [request, response] line format (content parsed
    from the first '{' onward) and a plain {"date", "labels"} fallback.
    """
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            if isinstance(obj, dict) and "date" in obj:
                out.append((obj["date"][:10], list(obj.get("labels", []))))
                continue
            req, resp = obj[0], obj[1]
            content = req["messages"][1]["content"]
            payload = json.loads(content[content.index("{"):])
            ts = payload["Timestamp"]
            answer = json.loads(resp["choices"][0]["message"]["content"])
            labels = answer.get("Weather Classified Categories", [])
            out.append((str(ts)[:10], list(labels)))
    return out


def _load_image(path: str, image_size: int) -> np.ndarray:
    """Load .npy / image file -> [H,W,3] float32 in [-1,1] at image_size.

    Fast path: the native C++ loader (data/native_loader.py) handles the
    decode+resize+normalize in one call; Python/PIL fallback below.
    """
    if path.endswith(".npy"):
        from . import native_loader

        fast = native_loader.load_image(path, image_size)
        if fast is not None:
            return fast
    if path.endswith(".npy"):
        arr = np.load(path, allow_pickle=True)
    else:
        from PIL import Image

        arr = np.asarray(Image.open(path).convert("RGB"))
    arr = np.asarray(arr)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    else:
        arr = arr.astype(np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.shape[0] == 3 and arr.shape[-1] != 3:
        arr = np.transpose(arr, (1, 2, 0))
    if arr.shape[0] != image_size or arr.shape[1] != image_size:
        from PIL import Image

        im = Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8))
        arr = (
            np.asarray(im.resize((image_size, image_size), Image.BILINEAR)).astype(
                np.float32
            )
            / 255.0
        )
    return arr * 2.0 - 1.0


class StreamCameraDataset(Dataset):
    """Environment-aware stream-camera dataset (weather-label variant)."""

    def __init__(
        self,
        path: str,
        path_weather: str,
        phase: str = "trainval",
        batch_size: int = 1,
        len_seq: int = 1,
        image_size: int = 256,
        mask_frac: float = 0.0,
        normalize_flag: bool = True,
        path_scaler: Optional[str] = None,
        test_sites: Sequence[str] = DEFAULT_TEST_SITES,
        seed: int = 42,
    ):
        import pandas as pd

        self.phase = phase
        self.len_seq = len_seq
        self.batch_size = batch_size
        self.l_seq = batch_size * len_seq
        self.image_size = image_size
        self.num_classes = len(WEATHER_CLASSES)
        path_scaler = path_scaler or path
        os.makedirs(path_scaler, exist_ok=True)

        site_list = sorted(
            d
            for d in os.listdir(path)
            if os.path.isfile(os.path.join(path, d, "images.csv"))
        )
        suffix = ""
        if phase == "test":
            site_list = [s for s in site_list if s in set(test_sites)] or site_list[:1]
            suffix = "_ar"

        weather_df = self._load_weather(path_weather)
        labels_df = pd.DataFrame(
            parse_response_jsonl(os.path.join(path_weather, "response.jsonl")),
            columns=["date_tmp", "weather_label"],
        )
        labels_df["date_tmp"] = pd.to_datetime(labels_df["date_tmp"]).dt.strftime(
            "%Y-%m-%d"
        )
        weather_df = weather_df.merge(labels_df, on=["date_tmp"])

        img_paths, flows, dates, weathers, wlabels = [], [], [], [], []
        self.boundaries: List[Tuple[int, int]] = []
        cursor = 0
        for site in site_list:
            site_data = self._load_site(path, site, weather_df)
            if site_data is None:
                continue
            im, fl, dt, wx, wl = site_data
            windows = self._windows(im, fl, dt, wx, wl)
            if windows[0].shape[0] == 0:
                continue
            windows = self._split(windows, phase, mask_frac, seed)
            n = windows[0].shape[0]
            if n == 0:
                continue
            self.boundaries.append((cursor, cursor + n - 1))
            cursor += n
            img_paths.append(windows[0])
            flows.append(windows[1])
            dates.append(windows[2])
            weathers.append(windows[3])
            wlabels.append(windows[4])

        assert img_paths, f"no usable sites under {path}"
        self.images = np.concatenate(img_paths, axis=0)
        self.flows = np.concatenate(flows, axis=0).astype(np.float64)
        self.dates = np.concatenate(dates, axis=0).astype(np.float64)
        self.weather = np.concatenate(weathers, axis=0).astype(np.float64)
        self.weather_label = np.concatenate(wlabels, axis=0)

        if normalize_flag:
            n, t = self.flows.shape[:2]
            self.normalizer = StandardScaler()
            self.flows = self.normalizer.fit_transform(
                self.flows.reshape(n * t, -1)
            ).reshape(n, t, -1)
            save_scaler(
                self.normalizer,
                os.path.join(path_scaler, f"flow_scaler_{phase}{suffix}.json"),
            )
            self.wnormalizer = StandardScaler()
            self.weather = self.wnormalizer.fit_transform(
                self.weather.reshape(n * t, -1)
            ).reshape(n, t, -1)
            save_scaler(
                self.wnormalizer,
                os.path.join(path_scaler, f"weather_scaler_{phase}{suffix}.json"),
            )
            self.timetransformer = MinMaxScaler()
            self.dates = self.timetransformer.fit_transform(
                self.dates.reshape(n * t, -1)
            ).reshape(n, t, -1)
            save_scaler(
                self.timetransformer,
                os.path.join(path_scaler, f"time_scaler_{phase}{suffix}.json"),
            )
            self.wbinarizer = MultiLabelBinarizer(WEATHER_CLASSES)
            flat = [row for win in self.weather_label for row in win]
            wl = self.wbinarizer.transform(flat)
            self.weather_label = wl.reshape(n, t, -1)
            save_scaler(
                self.wbinarizer,
                os.path.join(path_scaler, f"weatherlabel_scaler_{phase}{suffix}.json"),
            )
        self._rng = np.random.RandomState(seed)

    # ------------------------------------------------------------------ ETL
    def _load_weather(self, path_weather: str):
        import pandas as pd

        files = sorted(
            glob.glob(os.path.join(path_weather, "Weather", "*.csv"))
            + glob.glob(os.path.join(path_weather, "Weather", "*.xlsx"))
        )
        assert files, f"no weather files under {path_weather}/Weather"
        frames = []
        time_cols = [
            "Time of Daily Temp Max", "Time of Min. Temp",
            "Time of Max Wind Spd", "Time of Min. Wind Spd.",
        ]
        for fpath in files:
            if fpath.endswith(".xlsx"):
                df = pd.read_excel(
                    fpath, skiprows=[0, 1, 3], parse_dates=["TIMESTAMP"] + time_cols
                )
            else:
                df = pd.read_csv(fpath, parse_dates=["TIMESTAMP"] + time_cols)
            df = df.dropna().reset_index(drop=True)
            for c in time_cols:
                df[c] = df[c].map(datetime.timestamp)
            frames.append(df)
        wdf = pd.concat(frames, ignore_index=True)
        wdf["date_tmp"] = wdf["TIMESTAMP"].dt.strftime("%Y-%m-%d")
        wdf["TIMESTAMP"] = wdf["TIMESTAMP"].map(datetime.timestamp)
        return wdf.drop_duplicates(subset=["date_tmp"]).reset_index(drop=True)

    def _load_site(self, path: str, site: str, weather_df):
        import pandas as pd

        site_dir = os.path.join(path, site)
        imgfile = pd.read_csv(
            os.path.join(site_dir, "images.csv"), parse_dates=["timestamp"]
        )
        valuesfile = pd.read_csv(
            os.path.join(site_dir, "values.csv"), parse_dates=["timestamp"]
        )
        imgfile["timestamp"] = imgfile["timestamp"].map(half_up_minute)
        valuesfile["timestamp"] = valuesfile["timestamp"].map(half_up_minute)

        if self.phase == "pretrain":
            data = imgfile.copy()
            data["value"] = valuesfile["value"].mean()
        else:
            data = imgfile.merge(valuesfile, on=["station_id", "timestamp"])
        if data.empty:
            return None

        # one frame per day, preferring daytime (9 < hour < 18): sort so the
        # first row per date is the earliest daytime frame (else earliest)
        hours = data["timestamp"].dt.hour
        data = data.assign(
            _date=data["timestamp"].dt.date,
            _night=~((hours > 9) & (hours < 18)),
        )
        data = (
            data.sort_values(["_date", "_night", "timestamp"])
            .drop_duplicates("_date", keep="first")
            .drop(columns=["_date", "_night"])
            .reset_index(drop=True)
        )
        data["date_tmp"] = data["timestamp"].dt.strftime("%Y-%m-%d")
        data = data.merge(weather_df, on=["date_tmp"])
        if data.empty:
            return None
        data = data.sort_values("timestamp").reset_index(drop=True)

        times = data["timestamp"].map(datetime.timestamp).to_numpy()
        img_entries = np.array(
            [
                [os.path.join(site_dir, "images", f"{iid}.npy"), url or "", str(iid)]
                for iid, url in zip(data["image_id"], data.get("url", [""] * len(data)))
            ],
            dtype=object,
        )
        flows = data["value"].to_numpy().reshape(-1, 1)
        dates = times.reshape(-1, 1)
        weather = data[WEATHER_COLUMNS].to_numpy(dtype=np.float64)
        wlabels = np.array(
            [list(v) if not isinstance(v, str) else [v] for v in data["weather_label"]],
            dtype=object,
        )
        return img_entries, flows, dates, weather, wlabels

    def _windows(self, images, flows, dates, weather, wlabels):
        """Non-overlapping windows of length l_seq+1, stride l_seq."""
        step = self.l_seq
        n = images.shape[0]
        idxs = [list(range(i, i + step + 1)) for i in range(0, n - step, step)]
        if not idxs:
            empty = np.zeros((0,))
            return empty, empty, empty, empty, empty
        sel = np.asarray(idxs)
        return (
            images[sel],
            flows[sel],
            dates[sel],
            weather[sel],
            np.asarray([[wlabels[j] for j in row] for row in sel], dtype=object),
        )

    def _split(self, windows, phase, mask_frac, seed):
        imgs, flows, dates, weather, wlabels = windows
        n = imgs.shape[0]
        rs = np.random.RandomState(seed)
        indices = np.arange(n)
        rs.shuffle(indices)
        train_size = int(0.8 * n)
        val_size = int(0.2 * n)

        def frac(a, lo, hi):
            return a[round(n * lo): (round(n * hi) if hi is not None else None)]

        def take(sel):
            return tuple(a[sel] for a in (imgs, flows, dates, weather, wlabels))

        if phase in ("trainval", "train"):
            if not mask_frac:
                hi2 = 0.675 if phase == "trainval" else 0.875
                sel = np.concatenate(
                    [np.arange(0, round(n * 0.375)), np.arange(round(n * hi2), n)]
                )
                return take(sel)
            return take(indices[:train_size])
        if phase == "val":
            if not mask_frac:
                return take(np.arange(round(n * 0.675), round(n * 0.875)))
            return take(indices[train_size: train_size + val_size])
        if phase == "test":
            if not mask_frac:
                return take(np.arange(round(n * 0.375), round(n * 0.675)))
            return take(indices[train_size:])
        return windows  # "all" / "pretrain": no split

    # ------------------------------------------------------------- access
    def __len__(self):
        return self.images.shape[0]

    def denormalize(self, pred):
        return self.normalizer.inverse_transform(pred)

    def _other_site_index(self, idx: int) -> int:
        for s, e in self.boundaries:
            if s <= idx <= e:
                pool = np.concatenate(
                    [np.arange(0, s), np.arange(e + 1, len(self))]
                )
                if pool.size:
                    return int(self._rng.choice(pool))
                return idx
        return idx

    def _load_window_images(self, idx: int) -> np.ndarray:
        frames = [
            _load_image(self.images[idx][i][0], self.image_size)
            for i in range(self.l_seq + 1)
        ]
        return np.stack(frames, axis=0)

    def __getitem__(self, idx: int) -> Dict:
        idx_rand = self._other_site_index(idx)
        imgs = self._load_window_images(idx)           # [T+1, H, W, 3]
        imgs_rand = self._load_window_images(idx_rand)

        t = self.dates[idx].astype(np.float32)
        flow = self.flows[idx].astype(np.float32)
        wx = self.weather[idx].astype(np.float32)
        wl = self.weather_label[idx].astype(np.float32)
        ids = np.asarray(
            [[float(self.images[idx][i][2])] for i in range(self.l_seq + 1)],
            np.float32,
        )

        def nxt(a):
            return a[1:]

        def prev(a):
            return a[:-1]

        sample = {
            "img": nxt(imgs),
            "mixed": {
                "img": prev(imgs),
                "flow": prev(flow).reshape(self.batch_size, self.len_seq, -1),
                "weather": prev(wx).reshape(self.batch_size, self.len_seq, -1),
                "time": nxt(t),
                "label_nxt": nxt(flow),
                "wlabel_nxt": nxt(wl),
                "ids_nxt": nxt(ids),
                "img_random": nxt(imgs_rand),
            },
        }
        if self.l_seq == 1:
            sample["img"] = sample["img"][0]
            m = sample["mixed"]
            sample["mixed"] = {
                "img": m["img"][0],
                "flow": m["flow"][0],
                "weather": m["weather"][0],
                "time": m["time"][0],
                "label_nxt": m["label_nxt"][0],
                "wlabel_nxt": m["wlabel_nxt"][0],
                "ids_nxt": m["ids_nxt"],
                "img_random": m["img_random"][0],
            }
        return sample


# backwards-compatible alias matching the reference class name
ImageNetVidDataset = StreamCameraDataset
