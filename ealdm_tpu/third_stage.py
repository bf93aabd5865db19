"""Third stage: post-hoc refinement/evaluation of the trained EALDM.

Parity target: `/root/reference/STDiff/third_stage_model.py` +
`third_stage_dataset.py` + the data-dump loop in `main.py:785-856`:
  * dump_third_stage_data: run log_images over the corpus, persist
    {img, latent (quantized 'diff_samples'), w, wlabel_nxt, flabel,
    flabel_nxt, t} per batch (npz instead of torch.save).
  * ThirdStageDataset: loads those dumps.
  * ThirdStageModel: frozen diffusion model + ResNet-50 feature trunk with
    two heads — fc_w (10-way multi-label weather, BCE) and fc_f (flow
    regression, MSE) — trained on decoded latents; test pass scores FID,
    CLIP-style label agreement, weather-label F1 and flow error with a CSV
    (+ optional matplotlib time-series plot).

Pretrained Inception/CLIP weights cannot be downloaded here; the FID
feature net and the CLIP-style scorer use the in-repo trunks with import
hooks (metrics math is exact given features).
"""
from __future__ import annotations

import csv
import glob
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data.pipeline import DataLoader, Dataset
from .metrics import FID, label_agreement, multilabel_f1
from .models.resnet import ResNet50
from .data.stdiff import WEATHER_CLASSES


class CLIPZeroShot:
    """CLIP-style zero-shot weather-label scorer (reference
    `third_stage_model.py:774-789`): the 10 class names go through the text
    trunk once, images through the image trunk, and the per-image logits are
    the cosine similarities against each class embedding. Agreement is then
    argmax-vs-true-labels — scored by the IMAGE content, independent of the
    trained fc heads. Both trunks use fixed seed-0 parameters (weight-
    importable for real CLIP values; the scorer plumbing and metric math are
    exact given embeddings)."""

    def __init__(
        self,
        class_names=WEATHER_CLASSES,
        embed_dim: int = 512,
        image_size: int = 224,
        prompt: str = "a photo taken on a {} day",
        text_kwargs: Optional[dict] = None,
        image_kwargs: Optional[dict] = None,
    ):
        """text_kwargs/image_kwargs: extra FrozenCLIPTextEmbedder /
        FrozenClipImageEmbedder fields (width/n_layer/...), e.g. to build a
        reduced-geometry scorer whose towers match a small checkpoint."""
        from .models.encoders import (
            FrozenCLIPTextEmbedder,
            FrozenClipImageEmbedder,
        )

        self.class_names = list(class_names)
        self.text_model = FrozenCLIPTextEmbedder(
            n_embed=embed_dim, **(text_kwargs or {})
        )
        self.image_model = FrozenClipImageEmbedder(
            out_dim=embed_dim, image_size=image_size, **(image_kwargs or {})
        )
        rng = jax.random.PRNGKey(0)  # pinned: scorer is fixed across runs
        from .models.text_transformer import SimpleTokenizer

        tokenizer = SimpleTokenizer(
            self.text_model.vocab_size, self.text_model.max_seq_len
        )
        tokens = tokenizer([prompt.format(c) for c in self.class_names])
        self._tokens = tokens
        self._text_params = self.text_model.init(rng, tokens)
        self._image_params = self.image_model.init(
            rng, jnp.zeros((1, image_size, image_size, 3))
        )
        # [n_classes, D], L2-normalized by the text model
        self.class_embeddings = self.text_model.apply(self._text_params, tokens)[
            :, 0, :
        ]
        # params are a traced argument (not a closure constant) so that
        # load_clip_weights takes effect even for already-traced shapes
        self._embed_images = jax.jit(
            lambda params, imgs: self.image_model.apply(params, imgs)
        )

    def load_clip_weights(self, state_dict, tokens=None):
        """Install real CLIP weights (OpenAI `clip` or HF CLIPModel
        state_dict naming — `third_stage_model.py:281` loads
        openai/clip-vit-base-patch32) into both towers and recompute the
        class text embeddings. `tokens` optionally supplies real CLIP-BPE
        ids for the class prompts."""
        from .models.clip import load_torch_clip_state

        text_params, visual_params = load_torch_clip_state(state_dict)
        if text_params is not None:
            self._text_params = {"params": {"model": text_params}}
            if tokens is None:
                tokens = self._tokens
            z = self.text_model.apply(self._text_params, jnp.asarray(tokens))
            self.class_embeddings = z[:, 0, :]
        if visual_params is not None:
            self._image_params = {"params": {"visual": visual_params}}

    def logits(self, images) -> np.ndarray:
        """[B, n_classes] cosine-similarity logits for [-1,1] NHWC images."""
        z = self._embed_images(self._image_params, jnp.asarray(images))
        return np.asarray(z @ self.class_embeddings.T)

    def agreement(self, images, labels_multi_hot: np.ndarray) -> float:
        return label_agreement(self.logits(images), labels_multi_hot)


def dump_third_stage_data(
    model,
    variables,
    data,
    logdir: str,
    rng: jax.Array,
    split: str = "test",
    steps: int = 50,
    max_batches: Optional[int] = None,
) -> str:
    """Sample 'diff_samples' latents per batch and persist the tuple dumps."""
    from .inference import log_images

    loader = data.test_dataloader() if split == "test" else data.train_dataloader()
    if loader is None:
        loader = data.train_dataloader()
    out_dir = os.path.join(logdir, "third_stage_data", split)
    os.makedirs(out_dir, exist_ok=True)
    for i, batch in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        rng, r = jax.random.split(rng)
        logs = log_images(
            model, variables, batch, r, n=batch["img"].shape[0],
            steps=steps, quantize_denoised=True,
        )
        mixed = batch["mixed"]
        np.savez(
            os.path.join(out_dir, f"batch_{i:05d}.npz"),
            img=np.asarray(batch["img"]),
            latent=np.asarray(logs["diff_samples_latent"]),
            w=np.asarray(mixed["weather"]),
            wlabel_nxt=np.asarray(mixed["wlabel_nxt"]),
            flabel=np.asarray(mixed["flow"]),
            flabel_nxt=np.asarray(mixed["label_nxt"]),
            t=np.asarray(mixed["time"]),
        )
    return out_dir


class ThirdStageDataset(Dataset):
    """Loads the per-batch npz dumps as individual samples."""

    def __init__(self, path: str, phase: str = "train"):
        self.files = sorted(glob.glob(os.path.join(path, "*.npz")))
        assert self.files, f"no third-stage dumps under {path}"
        self._index: List = []
        for fi, f in enumerate(self.files):
            with np.load(f) as z:
                n = z["img"].shape[0]
            self._index.extend((fi, j) for j in range(n))
        self._cache: Dict[int, Dict] = {}

    def __len__(self):
        return len(self._index)

    # Keep several dump files resident: a shuffled DataLoader revisits files
    # constantly, and a single-slot cache degraded to one npz read PER SAMPLE
    # on the 1-core host (O(N * files) I/O).
    _CACHE_FILES = 8

    def _file(self, fi: int) -> Dict:
        if fi not in self._cache:
            if len(self._cache) >= self._CACHE_FILES:
                self._cache.pop(next(iter(self._cache)))
            with np.load(self.files[fi]) as z:
                self._cache[fi] = {k: z[k] for k in z.files}
        return self._cache[fi]

    def __getitem__(self, idx):
        fi, j = self._index[idx]
        z = self._file(fi)
        return {k: v[j] for k, v in z.items()}


class Refinement:
    """Latent-delta refinement (reference `Refinement`, third_stage_model.py:
    164-169): a small conv stack predicting a residual latent correction."""

    def __init__(self, channels: int = 4, hidden: int = 32, seed: int = 0):
        import flax.linen as nn

        class Net(nn.Module):
            hidden: int
            channels: int

            @nn.compact
            def __call__(self, z):
                h = nn.relu(nn.Conv(self.hidden, (3, 3), padding=1, name="c1")(z))
                h = nn.relu(nn.Conv(self.hidden, (3, 3), padding=1, name="c2")(h))
                delta = nn.Conv(
                    self.channels, (3, 3), padding=1, name="c3",
                    kernel_init=nn.initializers.zeros,
                )(h)
                return z + delta

        self.net = Net(hidden=hidden, channels=channels)
        self.params = self.net.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 8, 8, channels))
        )["params"]

    def __call__(self, z):
        return self.net.apply({"params": self.params}, z)


class ThirdStageModel:
    """Feature trunk + weather/flow heads over decoded diffusion latents."""

    def __init__(
        self,
        diffusion_model,
        variables,
        feature_dim: int = 2048,
        num_classes: int = len(WEATHER_CLASSES),
        lr: float = 1e-4,
        seed: int = 0,
        clip_image_size: int = 224,
    ):
        import flax.linen as nn
        import optax

        self.model = diffusion_model
        self.variables = variables
        self.num_classes = num_classes

        class Heads(nn.Module):
            num_classes: int

            @nn.compact
            def __call__(self, x):
                feats = ResNet50(name="trunk")(x, pool=True)
                return (
                    nn.Dense(self.num_classes, name="fc_w")(feats),
                    nn.Dense(1, name="fc_f")(feats),
                    feats,
                )

        self.heads = Heads(num_classes=num_classes)
        rng = jax.random.PRNGKey(seed)
        self.head_params = self.heads.init(rng, jnp.zeros((1, 64, 64, 3)))["params"]
        # train only the fc heads (trunk frozen, reference `:675-684`)
        labels = {
            k: ("train" if k in ("fc_w", "fc_f") else "frozen")
            for k in self.head_params
        }
        self.optimizer = optax.multi_transform(
            {"train": optax.adam(lr), "frozen": optax.set_to_zero()}, labels
        )
        self.opt_state = self.optimizer.init(self.head_params)

        self._decode = jax.jit(
            lambda z: self.model.apply(
                self.variables, z, method=self.model.decode_first_stage
            )
        )

        def loss_fn(params, images, wlabel, flabel):
            logits_w, pred_f, _ = self.heads.apply({"params": params}, images)
            bce = optax.sigmoid_binary_cross_entropy(logits_w, wlabel).mean()
            mse = jnp.mean(jnp.square(pred_f - flabel))
            return bce + mse, {"loss_w": bce, "loss_f": mse}

        @jax.jit
        def train_step(params, opt_state, images, wlabel, flabel):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, images, wlabel, flabel
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["loss"] = loss
            return params, opt_state, metrics

        self._train_step = train_step
        self._apply_heads = jax.jit(
            lambda params, images: self.heads.apply({"params": params}, images)
        )

        # Eval-only nets are built lazily on first test() use (train-only
        # runs and the dump loop never pay their init/compile cost).
        self._clip_image_size = clip_image_size
        self._clip_scorer = None
        self._fid = None  # (variables, jitted feature fn)

    @property
    def clip_scorer(self) -> "CLIPZeroShot":
        """CLIP-style zero-shot scorer (image content vs class-name text
        embeddings) — NOT the fc_w head's own predictions. Real CLIP weights
        auto-load from $EALDM_WEIGHTS_DIR when a canonical checkpoint file
        is present (weights.find_weights)."""
        if self._clip_scorer is None:
            self._clip_scorer = CLIPZeroShot(image_size=self._clip_image_size)
            from .weights import find_weights, load_state_dict_file

            path = find_weights("clip")
            if path is not None:
                self._clip_scorer.load_clip_weights(load_state_dict_file(path))
        return self._clip_scorer

    def _fid_feats(self, imgs):
        """FID feature net: the torchmetrics-compatible InceptionV3 FID
        trunk (reference `third_stage_model.py:27,750` uses
        `FrechetInceptionDistance(feature=2048)`), seed-0 init, independent
        of `seed` and of head training. Real pt_inception-2015 weights load
        via `load_fid_weights` (the import map is oracle-tested,
        tests/test_eval_trunks.py) and auto-load from $EALDM_WEIGHTS_DIR
        when a canonical checkpoint file is present; images arrive [-1,1]
        and are mapped to the trunk's [0,1] convention."""
        self._ensure_fid()
        return self._fid[1](self._fid[0], imgs)

    def _ensure_fid(self):
        """Build the FID trunk (and auto-install $EALDM_WEIGHTS_DIR weights)
        without running a forward pass."""
        if self._fid is not None:
            return
        from .models.inception import InceptionV3Features

        fid_net = InceptionV3Features()
        variables = fid_net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )
        fn = jax.jit(
            lambda v, im: fid_net.apply(v, (im + 1.0) * 0.5))
        self._fid = (variables, fn)
        from .weights import find_weights, load_state_dict_file

        path = find_weights("inception")
        if path is not None:
            self.load_fid_weights(load_state_dict_file(path))

    def load_fid_weights(self, state_dict):
        """Install a torchvision-named InceptionV3 state_dict (e.g. the
        pt_inception-2015-12-05 FID weights) into the FID feature net."""
        from .models.inception import load_torch_inception_state

        self._ensure_fid()
        self._fid = (load_torch_inception_state(state_dict), self._fid[1])

    # ------------------------------------------------------------------ api
    def _batch_tensors(self, batch):
        latent = jnp.asarray(batch["latent"])
        images = self._decode(latent)
        wlabel = jnp.asarray(batch["wlabel_nxt"]).reshape(images.shape[0], -1)
        flabel = jnp.asarray(batch["flabel_nxt"]).reshape(images.shape[0], -1)[:, :1]
        return images, wlabel, flabel

    def train(self, loader: DataLoader, epochs: int = 1, log_every: int = 10):
        step = 0
        for _ in range(epochs):
            for batch in loader:
                images, wlabel, flabel = self._batch_tensors(batch)
                self.head_params, self.opt_state, metrics = self._train_step(
                    self.head_params, self.opt_state, images, wlabel, flabel
                )
                step += 1
                if step % log_every == 0:
                    print(
                        f"third-stage step {step}: loss="
                        f"{float(metrics['loss']):.4f}", flush=True,
                    )
        return self

    def test(self, loader: DataLoader, logdir: str, scaler_dir: Optional[str] = None):
        fid = FID()
        all_w_true, all_w_pred, flow_true, flow_pred, times = [], [], [], [], []
        all_clip_logits = []
        for batch in loader:
            images, wlabel, flabel = self._batch_tensors(batch)
            real = jnp.asarray(batch["img"])
            logits_w, pred_f, _ = self._apply_heads(self.head_params, images)
            fid.update(np.asarray(self._fid_feats(real)), real=True)
            fid.update(np.asarray(self._fid_feats(images)), real=False)
            all_clip_logits.append(self.clip_scorer.logits(images))
            all_w_true.append(np.asarray(wlabel))
            all_w_pred.append(np.asarray(jax.nn.sigmoid(logits_w)))
            flow_true.append(np.asarray(flabel))
            flow_pred.append(np.asarray(pred_f))
            times.append(np.asarray(batch["t"]).reshape(len(images), -1)[:, :1])

        w_true = np.concatenate(all_w_true)
        w_pred = np.concatenate(all_w_pred)
        f_true = np.concatenate(flow_true)
        f_pred = np.concatenate(flow_pred)
        t_arr = np.concatenate(times)

        results = {
            "fid": fid.compute(),
            "weather_f1": multilabel_f1(w_true, w_pred),
            # zero-shot: argmax over CLIP image-vs-class-text similarities
            # (reference third_stage_model.py:774-789) — independent of fc_w
            "clip_agreement": label_agreement(
                np.concatenate(all_clip_logits), w_true
            ),
            # the head's own agreement, kept as a separate diagnostic
            "head_agreement": label_agreement(w_pred, w_true),
            "flow_mse": float(np.mean((f_true - f_pred) ** 2)),
        }

        # inverse-scale flow for the CSV/plot when scalers are available
        if scaler_dir:
            from .data.scalers import load_scaler

            p = os.path.join(scaler_dir, "flow_scaler_trainval.json")
            if os.path.exists(p):
                sc = load_scaler(p)
                f_true = sc.inverse_transform(f_true)
                f_pred = sc.inverse_transform(f_pred)

        os.makedirs(logdir, exist_ok=True)
        with open(os.path.join(logdir, "third_stage_flow.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["time", "flow_true", "flow_pred"])
            for i in range(len(f_true)):
                w.writerow([float(t_arr[i, 0]), float(f_true[i, 0]), float(f_pred[i, 0])])
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            order = np.argsort(t_arr[:, 0])
            plt.figure(figsize=(10, 4))
            plt.plot(t_arr[order, 0], f_true[order, 0], label="true flow")
            plt.plot(t_arr[order, 0], f_pred[order, 0], label="predicted flow")
            plt.legend()
            plt.savefig(os.path.join(logdir, "third_stage_flow.png"), dpi=100)
            plt.close()
        except Exception:
            pass

        with open(os.path.join(logdir, "third_stage_results.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(list(results))
            w.writerow([results[k] for k in results])
        print("third-stage results:", results, flush=True)
        return results

    def refine_decoder(
        self,
        loader: DataLoader,
        steps: int = 100,
        lr: float = 1e-5,
        disc_start: int = 0,
    ):
        """Optional decoder fine-tune with the VQ-GAN loss on decoded latents
        (reference `vq_loss` path, third_stage_model.py:365-391). Updates the
        first-stage decoder subtree of self.variables in place."""
        import optax

        from .losses.contperceptual import adaptive_d_weight
        from .losses.vqperceptual import VQLPIPSWithDiscriminator

        params = jax.tree_util.tree_map(jnp.asarray, self.variables["params"])
        dec_params = params["first_stage_model"]["decoder"]
        loss_mod = VQLPIPSWithDiscriminator(disc_start=disc_start, disc_num_layers=1)

        batch0 = next(iter(loader))
        x0 = jnp.asarray(batch0["img"])
        rec0 = self._decode(jnp.asarray(batch0["latent"]))
        loss_vars = loss_mod.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros(()), x0, rec0, 0
        )["params"]

        opt_g = optax.adam(lr, b1=0.5, b2=0.9)
        opt_d = optax.adam(lr, b1=0.5, b2=0.9)
        g_state = opt_g.init(dec_params)
        d_state = opt_d.init(loss_vars["discriminator"])

        def decode_with(dec_p, latent):
            p = dict(params)
            fs = dict(p["first_stage_model"])
            fs["decoder"] = dec_p
            p["first_stage_model"] = fs
            return self.model.apply(
                {"params": p}, latent, method=self.model.decode_first_stage
            )

        @jax.jit
        def step(dec_params, g_state, loss_vars, d_state, latent, real, gstep):
            rec0 = decode_with(dec_params, latent)
            nll_g = jax.grad(
                lambda r: loss_mod.apply(
                    {"params": loss_vars}, real, r, method=loss_mod.nll_loss
                )[0]
            )(rec0)
            gan_g = jax.grad(
                lambda r: loss_mod.apply(
                    {"params": loss_vars}, r, method=loss_mod.g_loss
                )
            )(rec0)
            d_weight = jax.lax.stop_gradient(
                adaptive_d_weight(nll_g, gan_g, loss_mod.disc_weight)
            )

            def gen_loss(dp):
                rec = decode_with(dp, latent)
                loss, log = loss_mod.apply(
                    {"params": loss_vars}, jnp.zeros(()), real, rec, gstep,
                    d_weight, method=loss_mod.generator_loss,
                )
                return loss, (log, rec)

            (gl, (glog, rec)), ggrads = jax.value_and_grad(gen_loss, has_aux=True)(
                dec_params
            )
            gupd, g_state2 = opt_g.update(ggrads, g_state, dec_params)
            dec_params2 = optax.apply_updates(dec_params, gupd)

            def disc_loss(dp):
                lv = dict(loss_vars)
                lv["discriminator"] = dp
                return loss_mod.apply(
                    {"params": lv}, real, rec, gstep,
                    method=loss_mod.discriminator_loss,
                )[0]

            dl, dgrads = jax.value_and_grad(disc_loss)(loss_vars["discriminator"])
            dupd, d_state2 = opt_d.update(dgrads, d_state, loss_vars["discriminator"])
            lv2 = dict(loss_vars)
            lv2["discriminator"] = optax.apply_updates(
                loss_vars["discriminator"], dupd
            )
            return dec_params2, g_state2, lv2, d_state2, gl, dl

        it = 0
        while it < steps:
            for batch in loader:
                if it >= steps:
                    break
                dec_params, g_state, loss_vars, d_state, gl, dl = step(
                    dec_params, g_state, loss_vars, d_state,
                    jnp.asarray(batch["latent"]), jnp.asarray(batch["img"]),
                    jnp.asarray(it),
                )
                it += 1
        new_params = dict(params)
        fs = dict(new_params["first_stage_model"])
        fs["decoder"] = dec_params
        new_params["first_stage_model"] = fs
        self.variables = {"params": new_params}
        self._decode = jax.jit(
            lambda z: self.model.apply(
                self.variables, z, method=self.model.decode_first_stage
            )
        )
        return float(gl), float(dl)

    def run(self, logdir: str, scaler_dir: Optional[str] = None, epochs: int = 1,
            batch_size: int = 4):
        """Train heads on the train dump, evaluate on the test dump
        (reference `run`, third_stage_model.py:989-1016)."""
        base = os.path.join(logdir, "third_stage_data")
        train_dir = os.path.join(base, "train")
        test_dir = os.path.join(base, "test")
        if not os.path.isdir(train_dir):
            train_dir = test_dir
        train_ds = ThirdStageDataset(train_dir, "train")
        # clamp so tiny smoke dumps still yield one batch (drop_last loader)
        bs_tr = max(1, min(batch_size, len(train_ds)))
        self.train(DataLoader(train_ds, bs_tr, shuffle=True), epochs=epochs)
        test_ds = ThirdStageDataset(test_dir if os.path.isdir(test_dir) else train_dir)
        bs_te = max(1, min(batch_size, len(test_ds)))
        return self.test(DataLoader(test_ds, bs_te), logdir, scaler_dir)
