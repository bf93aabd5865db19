"""Oracle tests for the frozen eval-trunk weight-import hooks.

Each test hand-builds a torch twin whose `state_dict()` naming matches the
upstream library the reference loads from (torchvision InceptionV3/ResNet50,
taming vgg_lpips, OpenAI CLIP), randomizes its weights AND BatchNorm
running stats, imports through the repo's key map, and asserts output
parity. This is the proof the hooks would work on the real pretrained
files (which the zero-egress environment cannot download).
"""
import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

torch.manual_seed(0)


def randomize_(module):
    """Random weights + random (positive-var) BN running stats, eval mode."""
    gen = torch.Generator().manual_seed(7)
    for p in module.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm2d,)):
            with torch.no_grad():
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=gen) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=gen) + 0.5)
    module.eval()
    return module


# ===================================================================== FID
class TBasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avgp(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class TInceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avgp(x)),
        ], 1)


class TInceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class TInceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch_pool = TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([
            self.branch1x1(x), b7, bd, self.branch_pool(_avgp(x))], 1)


class TInceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class TInceptionE(tnn.Module):
    def __init__(self, cin, pool="avg"):
        super().__init__()
        self.pool = pool
        self.branch1x1 = TBasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                         padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                         padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
        self.branch_pool = TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = (_avgp(x) if self.pool == "avg"
              else F.max_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class TInceptionV3(tnn.Module):
    """torchvision-named FID InceptionV3 (features only, no fc/aux)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg")
        self.Mixed_7c = TInceptionE(2048, "max")

    def forward(self, x):
        x = 2.0 * x - 1.0
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return F.adaptive_avg_pool2d(x, 1).flatten(1)


def test_inception_v3_import_parity():
    from ealdm_tpu.models.inception import (
        InceptionV3Features, load_torch_inception_state,
    )

    twin = randomize_(TInceptionV3())
    # add fc/aux noise keys to prove they are skipped
    sd = dict(twin.state_dict())
    sd["fc.weight"] = torch.zeros(10, 2048)
    sd["fc.bias"] = torch.zeros(10)

    img = np.random.RandomState(0).rand(1, 95, 95, 3).astype(np.float32)
    with torch.no_grad():
        ref = twin(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()

    net = InceptionV3Features(resize_input=False)
    variables = load_torch_inception_state(sd)
    got = np.asarray(net.apply(variables, jnp.asarray(img)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


# ================================================================ ResNet50
class TBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        out = planes * 4
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or cin != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, out, 1, stride, bias=False),
                tnn.BatchNorm2d(out))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


class TResNet50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        cin = 64
        for s, (planes, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        ):
            layers = []
            for b in range(blocks):
                layers.append(TBottleneck(cin, planes, stride if b == 0 else 1))
                cin = planes * 4
            setattr(self, f"layer{s + 1}", tnn.Sequential(*layers))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        return F.adaptive_avg_pool2d(x, 1).flatten(1)


def test_resnet50_import_parity():
    from ealdm_tpu.models.resnet import ResNet50, load_torch_resnet50_state

    twin = randomize_(TResNet50())
    img = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = twin(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
    variables = load_torch_resnet50_state(twin.state_dict())
    got = np.asarray(
        ResNet50(norm="frozen_bn").apply(variables, jnp.asarray(img),
                                         pool=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_resnet50_random_init_features_are_normalized():
    """The default (GroupNorm) trunk must not blow up at random init — the
    zero-egress consumers (third-stage heads, retrieval) run it unloaded,
    where frozen eval-mode BN would be the identity and residual adds would
    compound variance ~2^16 over the trunk."""
    from ealdm_tpu.models.resnet import ResNet50

    m = ResNet50()
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), img)
    feats = np.asarray(m.apply(v, img, pool=True))
    assert np.isfinite(feats).all()
    assert np.abs(feats).max() < 1e3, np.abs(feats).max()


# ============================================================ taming LPIPS
class TVgg16Slices(tnn.Module):
    """taming lpips.vgg16: torchvision `features` indices kept per slice."""

    def __init__(self):
        super().__init__()
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512]
        feats, cin = [], 3
        for v in cfg:
            if v == "M":
                feats.append(tnn.MaxPool2d(2, 2))
            else:
                feats.append(tnn.Conv2d(cin, v, 3, padding=1))
                feats.append(tnn.ReLU())
                cin = v
        bounds = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
        for si, (lo, hi) in enumerate(bounds):
            sl = tnn.Sequential()
            for i in range(lo, hi):
                if i < len(feats):
                    sl.add_module(str(i), feats[i])
            setattr(self, f"slice{si + 1}", sl)

    def forward(self, x):
        taps = []
        for si in range(5):
            x = getattr(self, f"slice{si + 1}")(x)
            taps.append(x)
        return taps


class TNetLinLayer(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.model = tnn.Sequential(
            tnn.Dropout(), tnn.Conv2d(cin, 1, 1, bias=False))


class TLPIPS(tnn.Module):
    def __init__(self):
        super().__init__()
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None])
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450])[None, :, None, None])
        self.net = TVgg16Slices()
        for i, c in enumerate([64, 128, 256, 512, 512]):
            setattr(self, f"lin{i}", TNetLinLayer(c))

    @staticmethod
    def _norm(t):
        return t / (t.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)

    def forward(self, x, y):
        fx = self.net((x - self.shift) / self.scale)
        fy = self.net((y - self.shift) / self.scale)
        total = 0
        for i in range(5):
            d = (self._norm(fx[i]) - self._norm(fy[i])).pow(2)
            total = total + getattr(self, f"lin{i}").model(d).mean([1, 2, 3])
        return total


def test_lpips_import_parity():
    from ealdm_tpu.losses.lpips import LPIPS, load_torch_lpips_weights

    twin = randomize_(TLPIPS())
    rng = np.random.RandomState(2)
    x = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    y = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = twin(torch.from_numpy(x).permute(0, 3, 1, 2),
                   torch.from_numpy(y).permute(0, 3, 1, 2)).numpy()

    net = LPIPS()
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
    params = {"params": load_torch_lpips_weights(
        params["params"], twin.state_dict())}
    got = np.asarray(net.apply(params, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


# =================================================================== CLIP
class TResidualBlock(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.attn = tnn.MultiheadAttention(d, heads)
        self.ln_1 = tnn.LayerNorm(d)
        self.mlp = tnn.Sequential(collections.OrderedDict([
            ("c_fc", tnn.Linear(d, 4 * d)),
            ("gelu", tnn.Identity()),
            ("c_proj", tnn.Linear(4 * d, d)),
        ]))
        self.ln_2 = tnn.LayerNorm(d)

    def forward(self, x, mask=None):
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False, attn_mask=mask)[0]
        h = self.ln_2(x)
        h = self.mlp.c_fc(h)
        h = h * torch.sigmoid(1.702 * h)
        return x + self.mlp.c_proj(h)


class TTransformer(tnn.Module):
    def __init__(self, d, layers, heads):
        super().__init__()
        self.resblocks = tnn.Sequential(
            *[TResidualBlock(d, heads) for _ in range(layers)])

    def forward(self, x, mask=None):
        for b in self.resblocks:
            x = b(x, mask)
        return x


class TCLIPText(tnn.Module):
    def __init__(self, vocab=100, ctx=16, d=64, layers=2, heads=2, embed=32):
        super().__init__()
        self.ctx = ctx
        self.token_embedding = tnn.Embedding(vocab, d)
        self.positional_embedding = tnn.Parameter(torch.empty(ctx, d))
        self.transformer = TTransformer(d, layers, heads)
        self.ln_final = tnn.LayerNorm(d)
        self.text_projection = tnn.Parameter(torch.empty(d, embed))

    def forward(self, tokens):
        n = tokens.shape[1]
        x = self.token_embedding(tokens) + self.positional_embedding[:n]
        mask = torch.full((n, n), float("-inf")).triu(1)
        x = self.transformer(x.permute(1, 0, 2), mask).permute(1, 0, 2)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), tokens.argmax(-1)]
        return x @ self.text_projection


class TCLIPVisual(tnn.Module):
    def __init__(self, image=32, patch=8, d=64, layers=2, heads=2, embed=32):
        super().__init__()
        n = (image // patch) ** 2
        self.conv1 = tnn.Conv2d(3, d, patch, patch, bias=False)
        self.class_embedding = tnn.Parameter(torch.empty(d))
        self.positional_embedding = tnn.Parameter(torch.empty(n + 1, d))
        self.ln_pre = tnn.LayerNorm(d)
        self.transformer = TTransformer(d, layers, heads)
        self.ln_post = tnn.LayerNorm(d)
        self.proj = tnn.Parameter(torch.empty(d, embed))

    def forward(self, x):
        x = self.conv1(x).flatten(2).permute(0, 2, 1)  # [B, N, D]
        cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], 1) + self.positional_embedding
        x = self.ln_pre(x)
        x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        return self.ln_post(x[:, 0]) @ self.proj


class TCLIP(tnn.Module):
    """Wrapper so state_dict has OpenAI's `visual.` / top-level text split."""

    def __init__(self):
        super().__init__()
        self.visual = TCLIPVisual()
        text = TCLIPText()
        for name in ("token_embedding", "transformer", "ln_final"):
            setattr(self, name, getattr(text, name))
        self.positional_embedding = text.positional_embedding
        self.text_projection = text.text_projection
        self._text = text

    def encode_text(self, tokens):
        return self._text(tokens)

    def encode_image(self, x):
        return self.visual(x)


def test_clip_import_parity():
    from ealdm_tpu.models.clip import (
        CLIPTextTower, CLIPVisionTower, load_torch_clip_state,
    )

    twin = randomize_(TCLIP())
    sd = {k: v for k, v in twin.state_dict().items()
          if not k.startswith("_text.")}
    text_params, visual_params = load_torch_clip_state(sd)

    rng = np.random.RandomState(3)
    tokens = rng.randint(1, 99, size=(2, 16))
    tokens[:, -1] = 99  # EOT = max id
    img = rng.rand(2, 32, 32, 3).astype(np.float32)

    with torch.no_grad():
        ref_t = twin.encode_text(torch.from_numpy(tokens)).numpy()
        ref_v = twin.encode_image(
            torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()

    text = CLIPTextTower(vocab_size=100, context_length=16, width=64,
                         layers=2, heads=2, embed_dim=32)
    got_t = np.asarray(text.apply({"params": text_params},
                                  jnp.asarray(tokens)))
    np.testing.assert_allclose(got_t, ref_t, rtol=2e-4, atol=2e-5)

    vis = CLIPVisionTower(image_size=32, patch_size=8, width=64, layers=2,
                          heads=2, embed_dim=32)
    got_v = np.asarray(vis.apply({"params": visual_params}, jnp.asarray(img)))
    np.testing.assert_allclose(got_v, ref_v, rtol=2e-4, atol=2e-5)


def test_clip_text_eot_fallback_for_foreign_token_ids():
    """A tower configured with a hermetic-tokenizer eot_id must fall back to
    the OpenAI argmax convention on sequences where that id never occurs
    (real CLIP-BPE ids) instead of pooling at position 0 — otherwise every
    prompt yields the SOT embedding (regression)."""
    from ealdm_tpu.models.clip import CLIPTextTower

    rng = np.random.RandomState(0)
    # ids drawn from [10, 90): the hermetic eot_id=3 never occurs
    tokens = rng.randint(10, 90, size=(3, 16)).astype(np.int32)
    tokens[0, 5] = 99   # per-sequence EOT = max id, different positions
    tokens[1, 11] = 99
    tokens[2, 2] = 99

    base = CLIPTextTower(vocab_size=100, context_length=16, width=64,
                         layers=2, heads=2, embed_dim=32, eot_id=None)
    params = base.init(jax.random.PRNGKey(0), jnp.asarray(tokens))
    ref = np.asarray(base.apply(params, jnp.asarray(tokens)))

    hermetic = CLIPTextTower(vocab_size=100, context_length=16, width=64,
                             layers=2, heads=2, embed_dim=32, eot_id=3)
    got = np.asarray(hermetic.apply(params, jnp.asarray(tokens)))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    # and sequences with distinct content must embed distinctly
    assert not np.allclose(got[0], got[1])

    # where the explicit id DOES occur, it takes precedence over argmax:
    # the two conventions now pool different positions of the same input
    tokens2 = tokens.copy()
    tokens2[:, 7] = 3
    got2 = np.asarray(hermetic.apply(params, jnp.asarray(tokens2)))
    ref2 = np.asarray(base.apply(params, jnp.asarray(tokens2)))
    assert not np.allclose(got2, ref2)


def test_hf_clip_import_parity():
    """Oracle vs the REAL transformers CLIPModel (tiny config) — the exact
    library+naming the reference third stage loads
    (third_stage_model.py:281, openai/clip-vit-base-patch32)."""
    from transformers import CLIPConfig, CLIPModel

    from ealdm_tpu.models.clip import (
        CLIPTextTower, CLIPVisionTower, load_torch_clip_state,
    )

    cfg = CLIPConfig(
        text_config=dict(
            vocab_size=100, hidden_size=64, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=16, hidden_act="quick_gelu",
            eos_token_id=99, bos_token_id=98, pad_token_id=0,
        ),
        vision_config=dict(
            hidden_size=64, intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8,
            hidden_act="quick_gelu",
        ),
        projection_dim=32,
    )
    torch.manual_seed(11)
    hf = CLIPModel(cfg).eval()

    rng = np.random.RandomState(5)
    tokens = rng.randint(1, 99, size=(2, 16))
    tokens[:, -1] = 99  # EOT: both HF (eos_token_id=99) and argmax pooling
    img = rng.rand(2, 32, 32, 3).astype(np.float32)

    with torch.no_grad():
        ref_t = hf.get_text_features(torch.from_numpy(tokens)).numpy()
        ref_v = hf.get_image_features(
            torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()

    text_params, visual_params = load_torch_clip_state(hf.state_dict())
    got_t = np.asarray(CLIPTextTower(
        vocab_size=100, context_length=16, width=64, layers=2, heads=2,
        embed_dim=32).apply({"params": text_params}, jnp.asarray(tokens)))
    got_v = np.asarray(CLIPVisionTower(
        image_size=32, patch_size=8, width=64, layers=2, heads=2,
        embed_dim=32).apply({"params": visual_params}, jnp.asarray(img)))
    np.testing.assert_allclose(got_t, ref_t, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got_v, ref_v, rtol=2e-4, atol=2e-5)
