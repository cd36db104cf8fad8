"""Generator: object intrinsics + extrinsics + one differentiable render.

Rebuilds src/models/generator.py as a host-side ``Generator`` object holding
*static* configuration, whose ``init`` builds a param pytree and whose
``forward`` is a pure function of (params, rng, it, data) — safe to close
over in jit.

TPU-first divergences from the reference:
  * map layout is NHWC (bs, h, w, c) — the natural TPU conv layout — instead
    of torch's NCHW;
  * no MAX_RAY_BATCH_SIZE python chunk loop (generator.py:14,286-305): the
    whole (bs, h*w) ray batch renders in one fused jit region; memory is
    managed with XLA/remat, and evaluation at high resolution shards rays
    across devices instead of chunking serially;
  * pose sampling runs on-device (utils/pose_sampler.py) instead of numpy
    per step.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.renderer import FieldFns, RendererConfig, render as neus_render

from ..utils.config import build_from_config, register_target
from ..utils.pose import invert_rot_t
from . import fields, lighting
from .camera import Camera

Params = Dict[str, Any]


def near_far_from_sphere(rays_o: jnp.ndarray, rays_d: jnp.ndarray):
    """Near/far as unit-sphere chords around the closest approach to the
    origin (src/models/generator.py:336-342)."""
    a = jnp.sum(rays_d**2, axis=-1, keepdims=True)
    b = 2.0 * jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    mid = 0.5 * (-b) / a
    return mid - 1.0, mid + 1.0


def build_rays(
    *,
    recp_size: int,
    x_offset: jnp.ndarray,
    y_offset: jnp.ndarray,
    num_rays: int,
    intrinsics_inv: jnp.ndarray,
) -> jnp.ndarray:
    """Unit ray directions for a crop window of the scene camera
    (src/models/generator.py:317-333). Offsets: (bs,) -> rays (bs, h, w, 3).

    Matches the reference's pixel grid exactly: linspace(0, 1, n) * crop_size
    + offset (endpoint included)."""
    t = jnp.linspace(0.0, 1.0, num_rays, dtype=jnp.float32) * recp_size
    px = t[None, None, :] + x_offset[:, None, None]  # (bs, 1, w) -> broadcasts over h
    py = t[None, :, None] + y_offset[:, None, None]  # (bs, h, 1)
    h = w = num_rays
    px = jnp.broadcast_to(px, (px.shape[0], h, w))
    py = jnp.broadcast_to(py, (py.shape[0], h, w))
    p = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)  # (bs, h, w, 3)
    p = jnp.einsum("ij,bhwj->bhwi", intrinsics_inv[:3, :3], p)
    return p / jnp.linalg.norm(p, axis=-1, keepdims=True)


@register_target(
    "src.models.generator.Generator",
    "object_intrinsics_tpu.models.generator.Generator",
)
class Generator:
    """Owns static config; all state lives in the param pytree."""

    def __init__(
        self,
        color_network: dict,
        sdf_network: dict,
        deviation_network: dict,
        light_network: dict,
        camera: dict,
        z_dim: int,
        resolution: int,
        scene_resolution: int,
        renderer: dict,
        anneal_end: int,
        pose_prior: dict,
        nerf: Optional[dict] = None,
    ):
        # (A fused Pallas trunk kernel was evaluated through r3 and removed:
        # the trunk is VPU-sin-bound, so the kernel tied XLA on the forward
        # and lost 3x on the gradient — postmortem in docs/DESIGN.md.)
        self.z_dim = int(z_dim)
        self.resolution = int(resolution)
        self.scene_resolution = int(scene_resolution)
        self.anneal_end = int(anneal_end)

        self.camera: Camera = build_from_config(camera)
        self.pose_prior = build_from_config(pose_prior)
        self.light_init_kwargs = build_from_config(light_network)
        self.rcfg = RendererConfig(**(renderer.get("kwargs", {}) or {}))

        self.sdf_kwargs = dict(sdf_network.get("kwargs", {}) or {})
        self.color_kwargs = dict(color_network.get("kwargs", {}) or {})
        self.deviation_kwargs = dict(deviation_network.get("kwargs", {}) or {})
        # background NeRF for n_outside > 0 (reference Generator accepts the
        # same slot and always receives None, src/models/generator.py:53)
        self.nerf_kwargs = dict((nerf or {}).get("kwargs", {}) or {})
        if self.rcfg.n_outside > 0:
            # static arch params the forward closure needs (not in the pytree)
            self._nerf_multires = int(self.nerf_kwargs.get("multires", 10))
            self._nerf_multires_view = int(self.nerf_kwargs.get("multires_view", 4))
            self._nerf_skips = tuple(self.nerf_kwargs.get("skips", (4,)))

        # constants (host numpy, captured as jnp on first trace)
        self._intrinsics_inv = self.camera.intrinsics_inv
        self._c2w = self.camera.c2w
        self._w2c = self.camera.w2c

        # remat default; build_modules overrides from training.remat, the
        # trainer's OOM fallback may flip it, OI_REMAT env wins over both
        self.remat = False

    @property
    def remat_active(self) -> bool:
        """Rematerialized field evaluation (see _field_fns) — fits bs>=4 per
        chip at ~one extra trunk forward. Three ways on, by precedence:
        OI_REMAT env var (1/0, overrides everything — read live, so setting
        it after import still works, matching the trainer's OOM-fallback
        guard which also reads it live), training.remat config key (plumbed
        through utils.train_setup.build_modules), or the trainer's
        OOM-at-compile auto-fallback flipping ``self.remat``."""
        env = os.environ.get("OI_REMAT")
        if env is not None:
            return env == "1"
        return bool(self.remat)

    # ------------------------------------------------------------------ init

    def init(self, key: jax.Array) -> Params:
        # split(2) + fold_in keeps the n_outside=0 init stream bit-identical
        # to releases that predate the background NeRF
        k_sdf, k_color = jax.random.split(key)
        k_nerf = jax.random.fold_in(key, 2)
        params = {
            "sdf_network": fields.init_shape_network(k_sdf, **self.sdf_kwargs),
            "color_network": fields.init_color_network(k_color, **self.color_kwargs),
            "deviation_network": fields.init_deviation_network(**self.deviation_kwargs),
            "light": lighting.init_light(**self.light_init_kwargs),
        }
        if self.rcfg.n_outside > 0:
            params["nerf"] = fields.init_nerf(k_nerf, **self.nerf_kwargs)
        return params

    # ------------------------------------------------------------- sampling

    def sample_prior(self, params: Params, key: jax.Array, bs: int, data: Dict) -> Dict:
        """Pose b2w from the prior (or eval-provided data), camera-to-box
        transform, and the light direction in each box frame
        (src/models/generator.py:65-78)."""
        if "b2w" in data:
            b2w = jnp.asarray(data["b2w"], dtype=jnp.float32)
        else:
            b2w = self.pose_prior(key, bs)
        w2b = invert_rot_t(b2w)
        c2b = jnp.einsum("bij,jk->bik", w2b, jnp.asarray(self._c2w))
        light_dir_b = lighting.batch_direction(params["light"], w2b)  # (bs, 3)
        return {"c2b": c2b, "b2w": b2w, "light_dir_b": light_dir_b}

    def sample_latent(self, params: Params, key: jax.Array, bs: int, data: Dict) -> Dict:
        if "w" in data:
            return {"z": jnp.asarray(data["z"]), "w": jnp.asarray(data["w"])}
        if "z" in data:
            return {"z": jnp.asarray(data["z"])}
        z = jax.random.normal(key, (bs, self.z_dim), dtype=jnp.float32)
        return {"z": z}

    # ----------------------------------------------------------------- rays

    def gen_rays_at(self, data: Dict, prior_info: Dict) -> Dict[str, jnp.ndarray]:
        """Crop-aware ray generation: project the box center through the scene
        camera to find the crop offsets, then build and rotate rays into the
        box frame (src/models/generator.py:255-279)."""
        b2w = prior_info["b2w"]
        b2c = jnp.einsum("ij,bjk->bik", jnp.asarray(self._w2c), b2w)
        t = b2c[..., :3, 3]

        res, scene_res = self.resolution, self.scene_resolution
        cam_dist = self.camera.cam_dist
        center_x = cam_dist / t[..., 2] * t[..., 0] * res / 2 + 0.5 * scene_res
        center_y = cam_dist / t[..., 2] * t[..., 1] * res / 2 + 0.5 * scene_res
        x_offset = center_x - res / 2
        y_offset = center_y - res / 2

        rays_v = build_rays(
            recp_size=res,
            x_offset=x_offset,
            y_offset=y_offset,
            num_rays=res,
            intrinsics_inv=jnp.asarray(self._intrinsics_inv),
        )
        c2b = prior_info["c2b"]
        rays_v = jnp.einsum("bij,bhwj->bhwi", c2b[..., :3, :3], rays_v)
        rays_o = jnp.broadcast_to(c2b[:, None, None, :3, 3], rays_v.shape)
        return {"rays_o": rays_o, "rays_d": rays_v, "x_offset": x_offset, "y_offset": y_offset}

    # --------------------------------------------------------------- render

    def _field_fns(self, params: Params, w: jnp.ndarray, fast: bool) -> FieldFns:
        """Field closures for the renderer. ``fast`` marks no-grad renders
        (discriminator-step fakes, evaluation); the renderer detaches the
        coarse pass itself (renderer.py:390 in the reference), and every
        path stays pure-JAX so jax.grad can differentiate the generator
        loss through the fine pass.

        remat (training.remat / OI_REMAT=1 / trainer OOM fallback) wraps the
        differentiated field evaluation in ``jax.checkpoint``: the trunk's
        per-layer activations (the dominant HBM cost of the fused step —
        ~5 GB per batch sample at the flagship shapes, capping bs/chip at 2)
        are recomputed in the backward pass instead of stored, trading ~one
        extra trunk forward for the memory to fit bs>=4 per chip. No effect
        on no-grad renders."""
        sdf_p = params["sdf_network"]
        color_p = params["color_network"]

        def coarse_sdf(pts):
            return fields.shape_sdf(sdf_p, pts, w)

        if self.remat_active and not fast:
            fine_eval = jax.checkpoint(fields.shape_sdf_grad)

            def sdf_grad(pts):
                return fine_eval(sdf_p, pts, w)

        else:
            def sdf_grad(pts):
                return fields.shape_sdf_grad(sdf_p, pts, w)

        nerf_fn = None
        if self.rcfg.n_outside > 0:
            nerf_p = params["nerf"]

            def nerf_fn(pts4, dirs):
                return fields.nerf_forward(
                    nerf_p, pts4, dirs,
                    multires=self._nerf_multires,
                    multires_view=self._nerf_multires_view,
                    skips=self._nerf_skips,
                )

        return FieldFns(
            sdf=coarse_sdf,
            sdf_grad=sdf_grad,
            color=lambda feat, normals: fields.color_forward(color_p, feat, normals, w),
            inv_s=fields.deviation_inv_s(params["deviation_network"]),
            nerf=nerf_fn,
        )

    def render(
        self,
        params: Params,
        key: Optional[jax.Array],
        rays_info: Dict,
        latent_info: Dict,
        it: jnp.ndarray,
        train: bool,
        fast: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        bs, h, w_, _ = rays_info["rays_o"].shape
        rays_o = rays_info["rays_o"].reshape(bs, h * w_, 3)
        rays_d = rays_info["rays_d"].reshape(bs, h * w_, 3)
        near, far = near_far_from_sphere(rays_o, rays_d)

        if "w" not in latent_info:
            latent_info = dict(latent_info)
            latent_info["w"] = fields.shape_style(params["sdf_network"], latent_info["z"])
        style = latent_info["w"]

        cos_anneal_ratio = jnp.minimum(1.0, it / self.anneal_end).astype(jnp.float32)
        fns = self._field_fns(params, style, fast=fast)
        out = neus_render(
            self.rcfg,
            fns,
            rays_o,
            rays_d,
            near,
            far,
            cos_anneal_ratio,
            perturb=train,
            key=key,
        )
        out["latent_info"] = latent_info
        return out

    # ----------------------------------------------------------------- maps

    def render_maps(
        self,
        params: Params,
        bg_color: jnp.ndarray,
        render_out: Dict,
        rays_info: Dict,
        prior_info: Dict,
        return_raw: bool,
    ) -> Dict[str, jnp.ndarray]:
        """Alpha-composite per-point quantities into NHWC maps and shade with
        the directional light (src/models/generator.py:80-174).

        bg_color: (bs, 3). Output maps: (bs, h, w, c)."""
        light_p = params["light"]
        bs = render_out["weights"].shape[0]
        h = w_ = self.resolution

        weights = render_out["weights"]  # (bs, R, S [+ n_outside])
        weight_sum = render_out["weight_sum"]  # (bs, R, 1)

        # with a background NeRF the renderer's weights span the inside +
        # outside samples and saturate toward 1: use the object-only
        # transmittance for the mask, the per-point light decomposition, and
        # the uniform-background composite. The full-depth blended color
        # lives in color_map (render_out["color_fine"]).
        if "weights_inside" in render_out:
            weights = render_out["weights_inside"]
            weight_sum = jnp.sum(weights, axis=-1, keepdims=True)

        def rays_to_map(x):  # (bs, R, c) -> (bs, h, w, c)
            return x.reshape(bs, h, w_, x.shape[-1])

        def pts_to_map(x):  # (bs, R, S, c) -> weighted sum -> map
            return rays_to_map(jnp.sum(x * weights[..., None], axis=-2))

        ret: Dict[str, jnp.ndarray] = {}
        weight_sum_map = rays_to_map(weight_sum)
        ret["weight_sum_map"] = weight_sum_map
        ret["color_map"] = rays_to_map(render_out["color_fine"])

        normal_pts = render_out["gradients"]  # (bs, R, S, 3) raw (unnormalized)
        color_pts = render_out["raw_color"]
        pts = render_out["pts"]
        rays_o = rays_info["rays_o"].reshape(bs, h * w_, 3)

        amb = lighting.ambient_color(light_p)  # (3,)
        light_dir = prior_info["light_dir_b"][:, None, None, :]  # (bs, 1, 1, 3)
        diff_pts = lighting.diffuse(normal_pts, lighting.diffuse_color(light_p), light_dir)
        shading_pts = amb + diff_pts
        ret["shading_map"] = pts_to_map(shading_pts)
        if return_raw:
            ret["amb_shading_map"] = weight_sum_map * amb
            ret["diff_shading_map"] = pts_to_map(diff_pts)
            ret["normal_map"] = pts_to_map(normal_pts)

        no_specular_pts = shading_pts * color_pts
        no_specular_map = pts_to_map(no_specular_pts)

        specular_pts = lighting.specular(
            points=pts,
            normals=normal_pts,
            light_dir=light_dir,
            color=lighting.specular_color(light_p),
            camera_position=rays_o[:, :, None, :],
            shininess=lighting.shininess(light_p),
        )
        specular_map = pts_to_map(specular_pts)
        if return_raw:
            ret["no_specular_map"] = no_specular_map
            ret["specular_map"] = specular_map

        rgb_map = no_specular_map + specular_map
        bg_map = bg_color[:, None, None, :]  # (bs, 1, 1, 3)
        ret["image_no_bg"] = rgb_map
        ret["image"] = rgb_map + bg_map * (1.0 - weight_sum_map)
        ret["mask"] = jnp.clip(weight_sum_map, 1e-3, 1.0 - 1e-3)

        if return_raw:
            z_rays = jnp.sum(render_out["mid_z_vals"] * weights, axis=-1, keepdims=True)
            ret["z_map"] = rays_to_map(z_rays)
            z_min = jnp.min(render_out["mid_z_vals"], axis=-1)  # (bs, R)
            ret["z_min"] = jnp.min(z_min, axis=-1)  # (bs,)
        return ret

    # -------------------------------------------------------------- forward

    def forward(
        self,
        params: Params,
        key: jax.Array,
        bs: int,
        it: jnp.ndarray,
        data: Dict,
        train: bool = True,
        return_raw: bool = False,
        fast: bool = False,
    ) -> Dict[str, Any]:
        """One full generative render (src/models/generator.py:186-231).

        Returns {'box': {'loss', 'stats', 'render_out', 'prior_info', ...}}.
        """
        k_pose, k_z, k_bg, k_perturb = jax.random.split(key, 4)

        prior_info = self.sample_prior(params, k_pose, bs, data)
        latent_info = self.sample_latent(params, k_z, bs, data)
        rays_info = self.gen_rays_at(data, prior_info)
        render_out = self.render(params, k_perturb, rays_info, latent_info, it, train, fast=fast)
        latent_info = render_out.pop("latent_info")

        if "bg_color" in data:
            bg_color = jnp.asarray(data["bg_color"], dtype=jnp.float32)
        else:
            bg_color = jax.random.uniform(k_bg, (bs, 3), dtype=jnp.float32)

        maps = self.render_maps(
            params, bg_color, render_out, rays_info, prior_info, return_raw
        )

        light_p = params["light"]
        loss = {"eikonal": render_out["gradient_error"]}
        stats = {
            "surface": render_out["surface_loss"],
            "s_val": jnp.mean(render_out["s_val"]),
            "cdf": jnp.mean(render_out["cdf_fine"][..., :1]),
            "weight_max": jnp.mean(render_out["weight_max"]),
            "weight_sum": jnp.mean(render_out["weight_sum"]),
            "light/ambient": jnp.mean(lighting.ambient_color(light_p)),
            "light/diffuse": jnp.mean(lighting.diffuse_color(light_p)),
            "light/specular": jnp.mean(lighting.specular_color(light_p)),
            "material/shininess": lighting.shininess(light_p),
        }
        blob: Dict[str, Any] = {
            "loss": loss,
            "stats": stats,
            "render_out": maps,
            "prior_info": prior_info,
        }
        if return_raw:
            blob["latent_info"] = latent_info
            blob["rays_info"] = rays_info
            blob["raw_render_out"] = render_out
        return {"box": blob}
