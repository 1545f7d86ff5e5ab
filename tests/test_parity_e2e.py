"""End-to-end numerical parity vs a torch re-implementation of the
reference's `Network.forward` up to the rasterizer inputs
(lightning/network.py:431-496): encoder → dir-modulated feature maps →
build_feat_vol → view embed → volume transformer → coarse decoder →
offsets → surfel parameters (centers / SH / opacity / scaling / rotation).

The torch side chains the reference-shaped twins from test_convert.py plus
a timm-named ViT twin below; weights cross over through
convert_network_state_dict — exactly the path the released `epoch=29.ckpt`
would take — so a wiring bug anywhere in the chain (axis order in
build_feat_vol, token layout, grouping, decoder splits) fails here even
though each module passes its own parity test.

Images are 224² so the ViT pos-embed runs at its native 14-grid (no
bicubic resample — torch and jax bicubic kernels differ; resample fidelity
is covered by tests/test_vit.py at the shape level). The Plücker SH basis
is evaluated once (ours) and fed to both sides; its own correctness is
covered by the Monte-Carlo orthonormality test in test_camera.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lara_tpu.config import Config, ModelConfig, RenderConfig  # noqa: E402
from lara_tpu.models import LaRaNet  # noqa: E402
from lara_tpu.models.convert import convert_network_state_dict  # noqa: E402
from lara_tpu.utils.sh import rsh_cart_3  # noqa: E402
from tests.test_convert import (  # noqa: E402
    TorchDecoder, TorchModLN, TorchVolTransformer, _np)
from tests.test_model import synthetic_batch  # noqa: E402

# test-scale flagship: every structural feature on, every dim shrunk
E_DIM, E_DEPTH, E_HEADS = 32, 2, 4
VE_DIM, EMB_DIM, OUT_DIM = 8, 32, 16
FEAT_RESO, EMB_RESO = 4, 4          # centers grid = 8³ → 1024 surfels (K=2)
N_GROUPS, N_LAYERS, N_HEADS, K = (2,), 2, 4, 2
H = W = 224                          # 14×14 tokens = the ViT's native grid
SH_DIM = 12                          # sh_degree 1


class TorchTimmAttention(tnn.Module):
    """timm VisionTransformer attention (joint qkv, bias) with timm naming."""

    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, L, C = x.shape
        qkv = self.qkv(x).reshape(B, L, 3, self.num_heads, C // self.num_heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        att = torch.softmax(q @ k.transpose(-2, -1) * (q.shape[-1] ** -0.5), -1)
        return self.proj((att @ v).transpose(1, 2).reshape(B, L, C))


class TorchTimmBlock(tnn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchTimmAttention(dim, num_heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.ModuleDict({
            "fc1": tnn.Linear(dim, dim * 4), "fc2": tnn.Linear(dim * 4, dim)})

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        h = tF.gelu(self.mlp["fc1"](self.norm2(x)))
        return x + self.mlp["fc2"](h)


class TorchTimmViT(tnn.Module):
    """timm `vit_*.dino` structure/naming as consumed by DinoWrapper
    (lightning/network.py:14-29): forward_features + drop CLS."""

    def __init__(self, dim, depth, num_heads, patch=16, grid=14):
        super().__init__()
        self.patch_embed = tnn.ModuleDict(
            {"proj": tnn.Conv2d(3, dim, patch, stride=patch)})
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = tnn.Parameter(torch.randn(1, grid * grid + 1, dim) * 0.02)
        self.blocks = tnn.ModuleList(
            [TorchTimmBlock(dim, num_heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):                        # [B, 3, H, W], normalized
        B = x.shape[0]
        x = self.patch_embed["proj"](x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 1:]               # drop CLS


def _dense_grid(reso, scene_size=0.5):
    """lightning/network.py:345-349."""
    ax = (torch.arange(reso, dtype=torch.float32) + 0.5) / reso * 2 - 1
    g = torch.stack(torch.meshgrid(ax, ax, ax, indexing="ij"), -1)
    return g.reshape(-1, 3) * scene_size


def _projection(grid, w2cs, ixts):
    """lightning/network.py:182-187."""
    pts = grid.reshape(1, -1, 3) @ w2cs[:, :3, :3].permute(0, 2, 1) \
        + w2cs[:, :3, 3][:, None]
    pts = pts @ ixts.permute(0, 2, 1)
    return pts[..., :2] / pts[..., -1:], pts[..., -1:]


class TorchNetworkFront(tnn.Module):
    """The reference forward chain up to the rasterizer inputs
    (lightning/network.py:431-465), out of the reference-shaped twins."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(7)
        self.img_encoder_model = TorchTimmViT(E_DIM, E_DEPTH, E_HEADS)
        self.dir_norm = TorchModLN(E_DIM, 32)
        self.view_embed = tnn.Parameter(
            torch.randn(1, 4, VE_DIM, 1, 1, 1) * VE_DIM ** -0.5)
        self.vol_decoder = TorchVolTransformer(
            EMB_DIM, E_DIM + VE_DIM, N_GROUPS, EMB_RESO, OUT_DIM,
            num_layers=N_LAYERS, num_heads=N_HEADS)
        self.decoder = TorchDecoder(OUT_DIM, SH_DIM, K)
        self.opacity_shift = -2.1792
        self.scaling_shift = float(np.log(0.5 * (2.0 / (EMB_RESO * 2)) / 3.0))
        self.n_offset_groups = 8

    def reference_state_dict(self):
        sd = {}
        for k, v in self.img_encoder_model.state_dict().items():
            sd["img_encoder.model." + k.replace("mlp.fc", "mlp.fc")] = v
        for k, v in self.dir_norm.state_dict().items():
            sd["dir_norm." + k] = v
        sd["view_embed"] = self.view_embed.data
        for k, v in self.vol_decoder.state_dict().items():
            sd["vol_decoder." + k] = v
        for k, v in self.decoder.state_dict().items():
            sd["decoder." + k] = v
        return sd

    @torch.no_grad()
    def forward(self, batch, n_views_sel, dir_feat_np):
        B, N, h, w, C = batch["tar_rgb"].shape
        n = n_views_sel
        inps = torch.from_numpy(np.asarray(batch["tar_rgb"][:, :n]))
        inps = inps.reshape(B * n, h, w, C).permute(0, 3, 1, 2).float()
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        tokens = self.img_encoder_model((inps - mean) / std)   # [BV, L, C]
        feats = tokens.permute(0, 2, 1).reshape(
            B * n, E_DIM, h // 16, w // 16)

        # build_feat_vol (lightning/network.py:352-379)
        ixts = torch.from_numpy(np.asarray(batch["tar_ixt"][:, :n])).reshape(-1, 3, 3).float()
        w2cs = torch.from_numpy(np.asarray(batch["tar_w2c"][:, :n])).reshape(-1, 4, 4).float()
        wh = torch.tensor([w, h], dtype=torch.float32)
        point_img, _ = _projection(_dense_grid(FEAT_RESO), w2cs, ixts)
        point_img = (point_img + 0.5) / wh * 2 - 1.0

        dir_feat = torch.from_numpy(dir_feat_np)               # [BV, th, tw, 32]
        f = feats.permute(0, 2, 3, 1)
        f = self.dir_norm(f, dir_feat)
        feats = f.permute(0, 3, 1, 2)
        feats_vol = tF.grid_sample(feats.float(), point_img.unsqueeze(1),
                                   align_corners=False)
        feats_vol = feats_vol.view(B, n, E_DIM,
                                   FEAT_RESO, FEAT_RESO, FEAT_RESO)

        ve = self.view_embed[:, :n].expand(
            B, -1, -1, FEAT_RESO, FEAT_RESO, FEAT_RESO)
        feat_vol = torch.cat([feats_vol, ve], dim=2)

        volume_feat_up = self.vol_decoder(feat_vol)            # [B,2R,2R,2R,out]
        volume_feat_up = volume_feat_up.reshape(B, -1, OUT_DIM)

        offset, sh, scaling, rotation, opacity = self.decoder.forward_coarse(
            volume_feat_up, self.opacity_shift, self.scaling_shift)

        # get_offseted_pt (lightning/network.py:425-429)
        half_cell = 0.5 * 0.5 / self.n_offset_groups
        gc = _dense_grid(EMB_RESO * 2).reshape(1, -1, 3)
        centers = (gc.unsqueeze(-2).expand(B, -1, K, -1).reshape(B, -1, 3)
                   + offset * half_cell)
        return dict(centers=centers, sh=sh, opacity=opacity,
                    scaling=scaling, rotation=rotation,
                    feats=f, feat_vol=feats_vol)


@pytest.fixture(scope="module")
def parity_setup():
    cfg = Config(
        n_views=2,
        model=ModelConfig(
            encoder_dim=E_DIM, encoder_depth=E_DEPTH, encoder_heads=E_HEADS,
            n_groups=N_GROUPS, K=K, num_layers=N_LAYERS, num_heads=N_HEADS,
            view_embed_dim=VE_DIM, embedding_dim=EMB_DIM,
            vol_feat_reso=FEAT_RESO, vol_embedding_reso=EMB_RESO,
            vol_embedding_out_dim=OUT_DIM, n_offset_groups=8, fine_budget=64,
            remat=False),
        render=RenderConfig(tile=16, dup=2, tile_budget=32, tile_chunk=4,
                            eval_tile_budget=32, visible_budget=0,
                            eval_visible_budget=0, pallas_chunk=32,
                            pallas_tiles_per_step=1, backend="tiled"),
    )
    tm = TorchNetworkFront().eval()
    params = convert_network_state_dict(
        tm.reference_state_dict(), num_layers=N_LAYERS, encoder_depth=E_DEPTH)
    batch = synthetic_batch(B=1, n_views=2, H=H, W=W)
    return cfg, tm, params, batch


def _dir_feat(batch, n):
    """Shared Plücker-SH direction features [BV, th, tw, 32] (f32)."""
    from lara_tpu.utils.camera import ray_to_plucker

    rays = jnp.asarray(batch["tar_rays_down"][:, :n])
    rays = rays.reshape(-1, *rays.shape[2:])
    pl = ray_to_plucker(rays)
    out = jnp.concatenate(
        [rsh_cart_3(pl[..., :3]), rsh_cart_3(pl[..., 3:6])], axis=-1)
    return np.asarray(out, np.float32)


def test_e2e_surfel_parameter_parity(parity_setup):
    """Torch chain and flax chain agree ≤1e-3 on every rasterizer input."""
    cfg, tm, params, batch = parity_setup
    dir_feat = _dir_feat(batch, cfg.n_views)
    ref = tm(batch, cfg.n_views, dir_feat)

    net = LaRaNet(cfg, dtype=jnp.float32)
    out = jax.jit(
        lambda p, b: net.apply(p, b, with_fine=False, train=False,
                               return_buffer=True)
    )({"params": params}, batch)
    centers, sh, opacity, scaling, rotation = out["render_pkg"]["coarse"]

    for name, mine, theirs, atol in [
        ("centers", centers, ref["centers"], 5e-4),
        ("sh", sh, ref["sh"], 1e-3),
        ("opacity", opacity, ref["opacity"], 1e-3),
        ("scaling", scaling, ref["scaling"], 1e-3),
        ("rotation", rotation, ref["rotation"], 1e-3),
    ]:
        a, b = np.asarray(mine, np.float32), _np(theirs)
        assert a.shape == b.shape, f"{name}: {a.shape} vs {b.shape}"
        np.testing.assert_allclose(a, b, atol=atol, err_msg=name)
    # torch reference path must actually produce live surfels
    assert (torch.sigmoid(ref["opacity"]) > 0.005).float().mean() > 0


def test_e2e_feature_map_parity(parity_setup):
    """Intermediate checkpoint for diagnosability: the dir-modulated encoder
    feature maps (encode_images ≡ network.py:443-445 + 362-371) agree —
    isolates ViT/ModLN bugs from feat-vol/transformer/decoder bugs."""
    cfg, tm, params, batch = parity_setup
    n = cfg.n_views
    dir_feat = _dir_feat(batch, n)
    ref = tm(batch, n, dir_feat)

    net = LaRaNet(cfg, dtype=jnp.float32)
    B, N, h, w, _ = batch["tar_rgb"].shape
    imgs = batch["tar_rgb"][:, :n].reshape(B * n, h, w, 3)
    rays_down = batch["tar_rays_down"][:, :n]
    rays_down = rays_down.reshape(B * n, *rays_down.shape[2:])
    feats = net.apply({"params": params}, imgs, rays_down,
                      method="encode_images")
    np.testing.assert_allclose(np.asarray(feats, np.float32), _np(ref["feats"]),
                               atol=5e-4)
