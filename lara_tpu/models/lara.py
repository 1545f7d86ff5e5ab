"""LaRa network: multi-view images → 2D Gaussian surfels → rendered views.

TPU-native counterpart of lightning/network.py:286-533 (`Network`). The
reference's per-(batch, view) Python render loop (lines 473-527, 24 CUDA
launches per step) becomes a vmapped fixed-shape render over [B, N]; the
reference's dynamic boolean masking of fine-stage surfels (lines 465,479,
504-511 + `_check_mask` 381-388) becomes a static top-M-by-opacity selection
(`fine_budget`), which keeps every shape static under jit.

Constants reproduced exactly: scene_size=0.5 (line 291), opacity_shift
=-2.1792, voxel_size=2/(2·grid_reso), scaling_shift=log(0.5·voxel/3)
(lines 340-342), offset half-cell = 0.5·scene_size/n_offset_groups
(lines 425-429).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lara_tpu.config import Config
from lara_tpu.models.decoder import CoarseDecoder, FineDecoder
from lara_tpu.models.vit import DinoViT
from lara_tpu.models.volume import ModLN, VolTransformer
from lara_tpu.ops.gather import take_rows, window_gather
from lara_tpu.ops.grid_sample import grid_sample_2d
from lara_tpu.ops.rasterizer import RasterizeConfig
from lara_tpu.ops.renderer import render_view, render_view_rebind
from lara_tpu.utils.camera import Camera, invert_rigid, ray_to_plucker
from lara_tpu.utils.sh import rsh_cart_3


def build_dense_grid(reso: int, scene_size: float) -> jnp.ndarray:
    """Voxel-center grid [reso³, 3] in [-scene_size, scene_size]
    (lightning/network.py:345-349; row-major over (x, y, z) axes)."""
    ax = (jnp.arange(reso, dtype=jnp.float32) + 0.5) / reso * 2.0 - 1.0
    gx, gy, gz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3) * scene_size


def make_cameras(c2ws: jnp.ndarray, fovx, fovy, near, far) -> Camera:
    """Batched Camera pytree from c2w poses [..., 4, 4] and per-scene scalars
    (MiniCam equivalent, incl. the campos=-c2w[:3,3] quirk of
    lightning/utils.py:48)."""
    w2c = invert_rigid(c2ws)
    shape = c2ws.shape[:-2]
    return Camera(
        w2c=w2c,
        campos=-c2ws[..., :3, 3],
        tanfovx=jnp.broadcast_to(jnp.tan(0.5 * fovx), shape),
        tanfovy=jnp.broadcast_to(jnp.tan(0.5 * fovy), shape),
        near=jnp.broadcast_to(near, shape),
        far=jnp.broadcast_to(far, shape),
    )


class LaRaNet(nn.Module):
    cfg: Config
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        m = self.cfg.model
        self.img_encoder = DinoViT(
            patch_size=m.patch_size, dim=m.encoder_dim, depth=m.encoder_depth,
            num_heads=m.encoder_heads, dtype=self.dtype, remat=m.remat,
            remat_policy=m.remat_policy, use_flash=m.flash_attn,
            name="img_encoder")
        self.dir_norm = ModLN(m.encoder_dim, dtype=self.dtype, name="dir_norm")
        if m.view_embed_dim > 0:
            self.view_embed = self.param(
                "view_embed",
                nn.initializers.normal(1.0 / m.view_embed_dim ** 0.5),
                (1, 4, m.view_embed_dim), jnp.float32)
        self.vol_decoder = VolTransformer(
            embed_dim=m.embedding_dim,
            image_feat_dim=m.encoder_dim + m.view_embed_dim,
            vol_low_res=m.vol_embedding_reso,
            out_dim=m.vol_embedding_out_dim,
            n_groups=m.n_groups, num_layers=m.num_layers, num_heads=m.num_heads,
            dtype=self.dtype, remat=m.remat, remat_policy=m.remat_policy,
            name="vol_decoder")
        self.sh_dim = (m.sh_degree + 1) ** 2 * 3
        self.decoder_coarse = CoarseDecoder(
            in_dim=m.vol_embedding_out_dim, sh_dim=self.sh_dim, K=m.K,
            dtype=self.dtype, name="decoder_coarse")
        self.decoder_fine = FineDecoder(
            in_dim=m.vol_embedding_out_dim, sh_dim=self.sh_dim,
            dtype=self.dtype, name="decoder_fine")

        self.opacity_shift = -2.1792
        self.voxel_size = 2.0 / (m.vol_embedding_reso * 2)
        self.scaling_shift = math.log(0.5 * self.voxel_size / 3.0)

    def _render_cfg(self, H: int, W: int, train: bool) -> RasterizeConfig:
        from lara_tpu.ops.rasterizer.api import resolve_backend
        r = self.cfg.render
        backend = resolve_backend(r.backend)
        budget = r.tile_budget if train else r.eval_tile_budget
        return RasterizeConfig(
            height=H, width=W, tile=r.tile, dup=r.dup,
            tile_budget=budget,
            tile_chunk=r.tile_chunk, sh_degree=self.cfg.model.sh_degree,
            visible_budget=r.visible_budget if train else r.eval_visible_budget,
            pallas_chunk=min(r.pallas_chunk, budget),
            pallas_tiles_per_step=r.pallas_tiles_per_step,
            backend=backend, bin_mode=r.bin_mode, pack_mode=r.pack_mode,
            pallas_stash_carries=r.pallas_stash_carries,
            pallas_cumsum=r.pallas_cumsum)

    def encode_images(self, imgs: jnp.ndarray, rays_down: jnp.ndarray) -> jnp.ndarray:
        """imgs [BV, H, W, 3], rays_down [BV, h, w, 6] (h = H/16) →
        direction-modulated feature maps [BV, h, w, C]
        (lightning/network.py:443-445 + 362-371)."""
        bv, h, w, _ = imgs.shape
        tokens = self.img_encoder(imgs)                      # [BV, L, C]
        th, tw = h // self.cfg.model.patch_size, w // self.cfg.model.patch_size
        feats = tokens.reshape(bv, th, tw, -1)

        plucker = ray_to_plucker(rays_down)
        dir_feat = jnp.concatenate(
            [rsh_cart_3(plucker[..., :3]), rsh_cart_3(plucker[..., 3:6])], axis=-1)
        return self.dir_norm(feats, dir_feat)                # [BV, th, tw, C]

    def build_feat_vol(self, feats: jnp.ndarray, w2cs: jnp.ndarray,
                       ixts: jnp.ndarray, img_hw) -> jnp.ndarray:
        """Sample per-view features at projected voxel centers
        (lightning/network.py:352-379). feats [BV, th, tw, C] →
        [BV, D, D, D, C] with D = vol_feat_reso."""
        reso = self.cfg.model.vol_feat_reso
        grid_pts = build_dense_grid(reso, self.cfg.model.scene_size)
        h, w = img_hw
        wh = jnp.asarray([w, h], jnp.float32)

        def sample_one(feat_hw, w2c, ixt):
            cam = grid_pts @ w2c[:3, :3].T + w2c[:3, 3]
            img = cam @ ixt.T
            xy = img[:, :2] / img[:, 2:3]
            gridc = (xy + 0.5) / wh * 2.0 - 1.0
            fchw = jnp.moveaxis(feat_hw.astype(jnp.float32), -1, 0)
            return grid_sample_2d(fchw, gridc)               # [P, C]

        sampled = jax.vmap(sample_one)(feats, w2cs, ixts)    # [BV, P, C]
        return sampled.reshape(sampled.shape[0], reso, reso, reso, -1).astype(feats.dtype)

    def __call__(self, batch: Dict, with_fine: bool = False, train: bool = False,
                 return_buffer: bool = False, render_scale: float = 1.0,
                 n_views_sel: Optional[int] = None) -> Dict:
        """batch follows the reference schema (SURVEY.md §1 L2 contract);
        returns per-view maps stacked as [B, N, H', W', ...] plus `_fine`
        variants when with_fine. `render_scale` renders the output maps at
        round(H·s) (snapped to the tile grid) like the reference's
        `render_img_scale` (lightning/network.py:467,477) — the encoder and
        fine-stage feature sampling still run at the native resolution.

        use_rand_views (lightning/network.py:434-438) has two static-shape
        realizations:
          - `n_views_sel` (preferred, static int): only the first
            n_views_sel input views are encoded — like the reference, no
            encoder/feat-vol FLOPs are spent on dropped views; one compiled
            variant per distinct count (the dataset shuffles view order, so
            a prefix is a uniform random subset);
          - batch["view_mask"] (legacy): encode all n_views and exclude
            dropped views' tokens from every cross-attention KV set.
        """
        m = self.cfg.model
        tar_rgb = batch["tar_rgb"]
        B, N, H, W, _ = tar_rgb.shape
        n_in = self.cfg.n_views
        if n_views_sel is not None:
            assert 1 <= n_views_sel <= n_in
            n_in = n_views_sel

        view_mask = batch.get("view_mask")
        if view_mask is not None:
            view_mask = jnp.asarray(view_mask).astype(bool)
            view_mask = jnp.broadcast_to(view_mask.reshape(-1, n_in)[:1],
                                         (B, n_in))

        from lara_tpu.parallel import tp

        # the encode → feat-vol prefix is per-view: tp shards it over views
        imgs = tp.shard_views(tar_rgb[:, :n_in].reshape(B * n_in, H, W, 3))
        rays_down = batch["tar_rays_down"][:, :n_in]
        rays_down = tp.shard_views(
            rays_down.reshape(B * n_in, *rays_down.shape[2:]))
        feats = self.encode_images(imgs, rays_down)

        w2cs = batch["tar_w2c"][:, :n_in].reshape(-1, 4, 4)
        ixts = batch["tar_ixt"][:, :n_in].reshape(-1, 3, 3)
        feat_vol = self.build_feat_vol(feats, w2cs, ixts, (H, W))  # [BV,D,D,D,C]
        reso = m.vol_feat_reso
        feat_vol = feat_vol.reshape(B, n_in, reso, reso, reso, -1)
        # cross-view from here (KV grouping concatenates views) → back to dp
        feat_vol = tp.shard_batch_dim(feat_vol)

        if m.view_embed_dim > 0:
            ve = jnp.broadcast_to(
                self.view_embed[:, :n_in, None, None, None, :],
                (B, n_in, reso, reso, reso, m.view_embed_dim)).astype(feat_vol.dtype)
            feat_vol = jnp.concatenate([feat_vol, ve], axis=-1)

        volume = self.vol_decoder(feat_vol, view_mask)       # [B, 2R, 2R, 2R, out]
        volume_feat_up = volume.reshape(B, -1, m.vol_embedding_out_dim)

        offset, sh_c, scaling_c, rotation_c, opacity_c = self.decoder_coarse(
            volume_feat_up, self.opacity_shift, self.scaling_shift)

        # Offsets live inside their voxel cell (lightning/network.py:425-429).
        group_centers = build_dense_grid(m.vol_embedding_reso * 2, m.scene_size)
        half_cell = 0.5 * m.scene_size / m.n_offset_groups
        # voxel v owns surfel rows v*K .. v*K+K-1
        centers_c = (
            group_centers[None, :, None, :] + offset.reshape(B, -1, m.K, 3) * half_cell
        ).reshape(B, -1, 3)

        cams = make_cameras(
            batch["tar_c2w"], batch["fovx"][:, None], batch["fovy"][:, None],
            batch["near_far"][:, None, 0], batch["near_far"][:, None, 1])
        rays_full = batch["tar_rays"]
        if render_scale != 1.0:
            tile = self.cfg.render.tile
            Hs = max(tile, int(round(H * render_scale / tile)) * tile)
            Ws = max(tile, int(round(W * render_scale / tile)) * tile)
            rays_full = jax.image.resize(
                rays_full, (B, N, Hs, Ws, rays_full.shape[-1]), method="linear")
        else:
            Hs, Ws = H, W
        rcfg = self._render_cfg(Hs, Ws, train)
        bg_colors = batch["bg_color"].astype(jnp.float32)

        # Sequential scan over scenes and views, NOT vmap: batching the
        # rasterizer's sort/searchsorted/pallas stages over B·N views lowers
        # catastrophically on TPU (measured 48 s/step vs ~1 s), and a single
        # 512² render already saturates the chip. The coarse pass caches each
        # view's binning (depth sort + tile windows) so the fine re-render —
        # identical geometry, new SH/opacity-mask — skips preprocess+binning
        # entirely (the reference re-runs its full CUDA pipeline,
        # lightning/network.py:502-525).
        # The per-scene surfel tensors enter the view scans as CLOSURE
        # constants, never as scan carry/xs: a carried [524k, 3] f32 tensor
        # gets checkpoint-saved per VIEW iteration and the stacked copy
        # picks up the (8,128)-tile layout — 42× lane padding on the
        # 3-wide minor dim, 3 × 2 GB of backward HBM at the flagship step
        # (measured OOM). As constants they stay one buffer and their
        # backward is a single cross-view accumulator.
        # remat_views: recompute each view's render in the backward instead
        # of letting the view scan stack per-view preprocess residuals —
        # [N, 524288, 3] f32 picks up a lane-padded T(8,128) layout (42.7×,
        # 3 × 2 GB of HLO temps), the measured flagship-step OOM.
        # remat_views_save keeps the COMPACT rasterizer residuals (binning
        # ints, packed rows, windowed entries, blend stash — ~18 MB/view)
        # across the boundary so the backward skips the sorts, row gathers
        # and the forward blend kernel while still recomputing the padded
        # preprocess tensors (models/remat.py:views_remat_policy).
        if m.remat_views:
            from functools import partial

            from lara_tpu.models.remat import views_remat_policy
            _pol = views_remat_policy(m.remat_views_save)
            maybe_remat = (jax.checkpoint if _pol is None
                           else partial(jax.checkpoint, policy=_pol))
        else:
            maybe_remat = lambda f: f  # noqa: E731

        def render_batch(cams_b, rays_b, bgs_b, gauss_b, with_bin=False):
            @maybe_remat
            def render_one(cam, rays_i, c, s, o, sc, q, bg):
                return render_view(cam, rays_i, c, s, o, sc, q, bg, rcfg,
                                   return_binned=with_bin)

            def scene_body(_, inp):
                cam_v, rays_v, bg_v, gauss = inp
                c, s, o, sc, q = gauss

                def view_body(_, vin):
                    cam, rays_i, bg = vin
                    res = render_one(cam, rays_i, c, s, o, sc, q, bg)
                    return None, res

                _, res = jax.lax.scan(view_body, None,
                                      (cam_v, rays_v, bg_v))
                return None, res

            _, out = jax.lax.scan(scene_body, None,
                                  (cams_b, rays_b, bgs_b, gauss_b))
            return out

        def render_batch_rebind(cams_b, rays_b, bgs_b, binned_b, sh_f, mask_f,
                                cen_b, op_b, sc_b, rot_b):
            @maybe_remat
            def rebind_one(cam, rays_i, binned, c, s, o, mk, sc, q, bg):
                return render_view_rebind(cam, rays_i, binned, c, s, o,
                                          mk, sc, q, bg, rcfg)

            def scene_body(_, inp):
                cam_v, rays_v, bg_v, binned_v, c, s, o, mk, sc, q = inp

                def view_body(_, vin):
                    cam, rays_i, bg, binned = vin
                    frame = rebind_one(cam, rays_i, binned, c, s, o,
                                       mk, sc, q, bg)
                    return None, frame

                _, frames = jax.lax.scan(view_body, None,
                                         (cam_v, rays_v, bg_v, binned_v))
                return None, frames

            _, out = jax.lax.scan(
                scene_body, None,
                (cams_b, rays_b, bgs_b, binned_b, cen_b, sh_f,
                 op_b, mask_f, sc_b, rot_b))
            return out

        # With tp > 1 the sequential view loop is split across the tp ranks
        # (each renders N/tp views of its scenes; shard_map_render psums the
        # surfel grads over a scene's view shards) — the one axis along
        # which the un-batchable rasterizer can scale.
        gauss_c = (centers_c, sh_c, opacity_c, scaling_c, rotation_c)
        res = tp.shard_map_render(
            lambda v, s: render_batch(*v, s, with_bin=with_fine),
            (cams, rays_full, bg_colors), gauss_c)          # [B,N,H,W,...]
        out, binned = res if with_fine else (res, None)

        outputs = dict(out)
        buffers = {}
        if return_buffer:
            buffers["coarse"] = gauss_c

        if with_fine:
            fine_src = out
            if (Hs, Ws) != (H, W):
                # fine-stage point features sample the coarse renders at the
                # native image grid alongside the reference RGB
                fine_src = dict(out)
                for k in ("image", "acc_map", "depth"):
                    a = out[k]
                    tgt = (B, N, H, W) + a.shape[4:]
                    fine_src[k] = jax.image.resize(a, tgt, method="linear")
            sh_fine, sel_mask = self._fine_stage(
                batch, fine_src, volume_feat_up, centers_c, sh_c, opacity_c,
                n_in, (H, W), view_mask)
            out_f = tp.shard_map_render(
                lambda v, s: render_batch_rebind(*v, *s),
                (cams, rays_full, bg_colors, binned),
                (sh_fine, sel_mask, centers_c, opacity_c, scaling_c,
                 rotation_c))
            outputs.update({f"{k}_fine": v for k, v in out_f.items()})
            if return_buffer:
                # full-set fine surfels (deselected entries disabled via the
                # reference's -1e4 logit convention) for video/mesh export
                op_f = jnp.where(sel_mask[..., None], opacity_c, -1e4)
                buffers["fine"] = (centers_c, sh_fine, op_f, scaling_c,
                                   rotation_c)
        if return_buffer:
            outputs["render_pkg"] = buffers
        return outputs

    def _fine_stage(self, batch, coarse_out, volume_feat_up, centers, sh_c,
                    opacity_c, n_in: int, img_hw, view_mask=None):
        """Static-shape fine refinement (lightning/network.py:502-525):
        select the top-`fine_budget` surfels by coarse opacity, build per-view
        point features from the coarse renders, predict an SH residual, and
        scatter it back onto the full surfel set. Returns
        (sh_fine [B,P,SH,3], sel_mask [B,P] bool); deselected surfels render
        as absent (the reference's -1e4 opacity logit). Keeping the full set
        lets the re-render reuse the coarse binning — no per-parameter
        selection gathers (round-2's dominant non-render backward cost)."""
        m = self.cfg.model
        M = min(m.fine_budget, centers.shape[1])
        h, w = img_hw
        wh = jnp.asarray([w, h], jnp.float32)

        op_act = jax.nn.sigmoid(opacity_c[..., 0])
        score = jax.lax.stop_gradient(jnp.where(op_act > 0.005, op_act, -1.0))

        def per_scene(score_b, centers_b, sh_b, vol_b,
                      img_ref, rend_img, rend_acc, rend_dep, w2c_in, ixt_in):
            vals, idx = jax.lax.top_k(score_b, M)
            sel_ok = vals > 0.0

            # Selection gathers (XLA scatter-add transpose — measured faster
            # than sort-based alternatives at this shape, docs/rasterizer.md):
            # only centers + voxel features are needed now; SH/opacity/scale/
            # rotation selections are gone since the re-render keeps the full
            # surfel set.
            c_sel = take_rows(centers_b, idx)
            # voxel features: up to K surfel rows share one voxel → bounded-
            # duplicate gather (window_gather with max_dup=K)
            vol_sel = window_gather(
                vol_b, (idx // m.K)[None, :],
                jnp.ones((1, M), bool), m.K)[0]

            def feats_for_view(img_v, rimg_v, racc_v, rdep_v, w2c, ixt):
                cam = c_sel @ w2c[:3, :3].T + w2c[:3, 3]
                img = cam @ ixt.T
                z = img[:, 2]
                xy = img[:, :2] / z[:, None]
                gridc = (xy + 0.5) / wh * 2.0 - 1.0
                # channels: ref rgb(3) + coarse rgb(3) + acc(1) + depth(1)
                stack = jnp.concatenate(
                    [img_v, rimg_v, racc_v[..., None], rdep_v], axis=-1)
                samp = grid_sample_2d(jnp.moveaxis(stack.astype(jnp.float32), -1, 0), gridc)
                zdiff = jnp.abs(samp[:, -1] - z)
                return jnp.concatenate([samp[:, :-1], zdiff[:, None]], axis=-1)

            pf = jax.vmap(feats_for_view)(
                img_ref, rend_img, rend_acc, rend_dep, w2c_in, ixt_in)  # [V,M,8]
            pf = jnp.swapaxes(pf, 0, 1)                                 # [M,V,8]

            vm = None if view_mask is None else view_mask[0]
            sh_res = self.decoder_fine(vol_sel, pf, vm)
            # residual scatter-add back onto the full SH set (top_k indices
            # are distinct; the transpose is a gather — no scatter in bwd)
            sh_fine = sh_b.at[idx].add(
                sh_res.reshape(M, self.sh_dim // 3, 3).astype(sh_b.dtype))
            sel_mask = jnp.zeros(centers_b.shape[0], bool).at[idx].set(sel_ok)
            return sh_fine, sel_mask

        img_ref = batch["tar_rgb"][:, :n_in].astype(jnp.float32)       # [B,V,H,W,3]
        rend_img = coarse_out["image"][:, :n_in]
        rend_acc = coarse_out["acc_map"][:, :n_in]
        rend_dep = coarse_out["depth"][:, :n_in]
        w2c_in = batch["tar_w2c"][:, :n_in]
        ixt_in = batch["tar_ixt"][:, :n_in]

        return jax.vmap(per_scene)(
            score, centers, sh_c, volume_feat_up, img_ref, rend_img,
            rend_acc, rend_dep, w2c_in, ixt_in)
