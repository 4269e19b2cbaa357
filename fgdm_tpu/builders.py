"""Builders translating reference-YAML params into framework objects.

These are the targets behind `fgdm_tpu.config.TARGET_ALIASES`: the
reference's config files (e.g. `/root/reference/models/config.yaml`,
`configs/stable-diffusion/*.yaml`) instantiate unchanged.  Torch-only knobs
(``use_checkpoint``, ``use_fp16``, ``legacy``…) are accepted and mapped or
ignored; ``no_prompting`` maps to ``use_adapter=False``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from fgdm_tpu.core.schedules import DiffusionSchedule
from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.models.autoencoder import AutoencoderKL, NpleAutoencoderKL
from fgdm_tpu.models.clip import CLIPTextEncoder
from fgdm_tpu.models.unet import UNetModel


def build_unet(dtype=jnp.bfloat16, **p) -> UNetModel:
    return UNetModel(
        in_channels=p.get("in_channels", 4),
        model_channels=p.get("model_channels", 320),
        out_channels=p.get("out_channels", 4),
        num_res_blocks=p.get("num_res_blocks", 2),
        attention_resolutions=tuple(p.get("attention_resolutions", (4, 2, 1))),
        channel_mult=tuple(p.get("channel_mult", (1, 2, 4, 4))),
        num_heads=p.get("num_heads", 8),
        num_head_channels=p.get("num_head_channels", -1),
        transformer_depth=p.get("transformer_depth", 1),
        context_dim=p.get("context_dim"),
        use_spatial_transformer=p.get("use_spatial_transformer", True),
        use_new_attention_order=p.get("use_new_attention_order", False),
        use_scale_shift_norm=p.get("use_scale_shift_norm", False),
        resblock_updown=p.get("resblock_updown", False),
        num_classes=p.get("num_classes"),
        use_adapter=not p.get("no_prompting", False),
        adapter_channels=p.get("adapter_channels"),
        use_time_adapter=p.get("use_time_adapter", False),
        remat=p.get("use_checkpoint", False),
        # fused Pallas GroupNorm+SiLU: the benched production configuration
        # (+3.8% on the f2 stage); dispatch falls back to XLA off-TPU
        fused_norm_silu=p.get("fused_norm_silu", True),
        dtype=dtype,
    )


def build_autoencoder(dtype=jnp.bfloat16, nple: Optional[int] = None, **p
                      ) -> AutoencoderKL:
    dd = p.get("ddconfig", {})
    cls = NpleAutoencoderKL if nple else AutoencoderKL
    kwargs = dict(
        embed_dim=p.get("embed_dim", 4),
        ch=dd.get("ch", 128),
        ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        attn_resolutions=tuple(dd.get("attn_resolutions", ()) or ()),
        in_channels=dd.get("in_channels", 3),
        out_ch=dd.get("out_ch", 3),
        resolution=dd.get("resolution", 256),
        z_channels=dd.get("z_channels", 4),
        double_z=dd.get("double_z", True),
        fused_norm=p.get("fused_norm", True),
        dtype=dtype,
    )
    if nple:
        kwargs["nple"] = nple
    return cls(**kwargs)


def build_clip(dtype=jnp.bfloat16, **p) -> CLIPTextEncoder:
    return CLIPTextEncoder(
        max_length=p.get("max_length", 77),
        dtype=dtype,
    )


@dataclasses.dataclass
class ModelSpec:
    """A parsed model config: module definitions + training knobs.

    ``create(rng)`` / ``load(ckpt_path)`` materialize a LatentDiffusion.
    """

    unet_def: UNetModel
    vae_def: AutoencoderKL
    clip_def: Optional[CLIPTextEncoder]
    schedule_args: Dict[str, Any]
    conditioning_key: str = "crossattn"
    scale_factor: float = 0.18215
    image_size: int = 32
    base_learning_rate: float = 1e-5
    use_ema: bool = False
    freeze_backbone: bool = False
    apply_distill_loss: bool = False
    distill_every_n_step: int = 10
    monitor: str = "val/loss_simple_ema"
    ckpt_path: Optional[str] = None
    scheduler_config: Optional[Dict[str, Any]] = None
    parameterization: str = "eps"
    # on-the-fly condition-synthesis flags (reference ddpm.py:137-150)
    use_depth: bool = False
    use_normal: bool = False
    use_sketch: bool = False
    use_hed: bool = False
    sketch_to_normal: bool = False
    img_factor_train: bool = False
    scale_by_std: bool = False
    raw: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def schedule(self) -> DiffusionSchedule:
        return DiffusionSchedule.create(**self.schedule_args)

    def condition_kind(self) -> Optional[str]:
        from fgdm_tpu.train.condition import condition_kind

        return condition_kind(
            use_depth=self.use_depth, use_normal=self.use_normal,
            use_sketch=self.use_sketch, use_hed=self.use_hed,
            sketch_to_normal=self.sketch_to_normal,
        )

    def create(self, rng: jax.Array,
               init_first_stage: bool = True) -> LatentDiffusion:
        return LatentDiffusion.create(
            self.unet_def, self.vae_def, self.clip_def, rng,
            latent_size=self.image_size,
            conditioning_key=self.conditioning_key,
            scale_factor=self.scale_factor,
            schedule=self.schedule(),
            init_first_stage=init_first_stage,
        )

    def load(self, ckpt_path: Optional[str] = None, dtype=None
             ) -> LatentDiffusion:
        from fgdm_tpu.checkpoint.loader import load_fgdm

        # thread the parsed config's module defs, schedule, scale_factor and
        # conditioning_key through — a config differing from SD-1.x defaults
        # must not silently fall back to them
        return load_fgdm(
            ckpt_path or self.ckpt_path,
            dtype=dtype or self.unet_def.dtype,
            latent_size=self.image_size,
            unet=self.unet_def, vae=self.vae_def, clip=self.clip_def,
            schedule=self.schedule(),
            scale_factor=self.scale_factor,
            conditioning_key=self.conditioning_key,
        )


def build_latent_diffusion(dtype=jnp.bfloat16, **p) -> ModelSpec:
    from fgdm_tpu.config import instantiate_from_config

    unet_def = build_unet(dtype=dtype, **(p.get("unet_config", {}).get("params")
                                          or {}))
    vae_def = build_autoencoder(
        dtype=dtype, **(p.get("first_stage_config", {}).get("params") or {})
    )
    cond_cfg = p.get("cond_stage_config", "__is_unconditional__")
    if isinstance(cond_cfg, dict):
        clip_def = build_clip(dtype=dtype, **(cond_cfg.get("params") or {}))
    elif cond_cfg in ("__is_unconditional__", None):
        clip_def = None
    else:
        clip_def = build_clip(dtype=dtype)
    return ModelSpec(
        unet_def=unet_def,
        vae_def=vae_def,
        clip_def=clip_def,
        schedule_args=dict(
            timesteps=p.get("timesteps", 1000),
            beta_schedule=p.get("beta_schedule", "linear"),
            linear_start=p.get("linear_start", 1e-4),
            linear_end=p.get("linear_end", 2e-2),
            cosine_s=p.get("cosine_s", 8e-3),
            v_posterior=p.get("v_posterior", 0.0),
            parameterization=p.get("parameterization", "eps"),
        ),
        conditioning_key=p.get("conditioning_key", "crossattn"),
        scale_factor=p.get("scale_factor", 1.0),
        image_size=p.get("image_size", 32),
        base_learning_rate=p.get("base_learning_rate", 1e-5),
        use_ema=p.get("use_ema", True),
        freeze_backbone=p.get("freeze_backbone", False),
        apply_distill_loss=p.get("apply_distill_loss", False),
        distill_every_n_step=p.get("distill_every_n_step", 10),
        monitor=p.get("monitor", "val/loss_simple_ema"),
        ckpt_path=p.get("ckpt_path"),
        scheduler_config=p.get("scheduler_config"),
        parameterization=p.get("parameterization", "eps"),
        use_depth=p.get("use_depth", False),
        use_normal=p.get("use_normal", False),
        use_sketch=p.get("use_sketch", False),
        use_hed=p.get("use_hed", False),
        sketch_to_normal=p.get("sketch_to_normal", False),
        img_factor_train=p.get("img_factor_train", False),
        scale_by_std=p.get("scale_by_std", False),
        raw=p,
    )


def build_controlnet(dtype=jnp.bfloat16, **p):
    """ControlNet branch from a ``control_stage_config`` params block
    (reference `controlnet/models/cldm_v15_canny.yaml:21-36`)."""
    from fgdm_tpu.models.controlnet import ControlNet

    return ControlNet(
        in_channels=p.get("in_channels", 4),
        model_channels=p.get("model_channels", 320),
        hint_channels=p.get("hint_channels", 3),
        num_res_blocks=p.get("num_res_blocks", 2),
        attention_resolutions=tuple(p.get("attention_resolutions", (4, 2, 1))),
        channel_mult=tuple(p.get("channel_mult", (1, 2, 4, 4))),
        num_heads=p.get("num_heads", 8),
        num_head_channels=p.get("num_head_channels", -1),
        transformer_depth=p.get("transformer_depth", 1),
        context_dim=p.get("context_dim"),
        use_scale_shift_norm=p.get("use_scale_shift_norm", False),
        fused_norm_silu=p.get("fused_norm_silu", True),
        dtype=dtype,
    )


@dataclasses.dataclass
class ControlSpec:
    """A parsed ControlLDM config (reference
    `controlnet/models/cldm_v15_canny.yaml` via `cldm.cldm.ControlLDM`)."""

    unet_def: UNetModel
    cn_def: Any
    vae_def: AutoencoderKL
    clip_def: Optional[CLIPTextEncoder]
    schedule_args: Dict[str, Any]
    conditioning_key: str = "crossattn"
    scale_factor: float = 0.18215
    image_size: int = 64
    only_mid_control: bool = False
    control_key: str = "hint"
    ckpt_path: Optional[str] = None
    raw: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def schedule(self) -> DiffusionSchedule:
        return DiffusionSchedule.create(**self.schedule_args)

    def create(self, rng: jax.Array):
        from fgdm_tpu.diffusion.control import ControlLDM

        cldm = ControlLDM.create_control(
            self.unet_def, self.vae_def, self.clip_def, self.cn_def, rng,
            latent_size=self.image_size, scale_factor=self.scale_factor,
            schedule=self.schedule())
        return cldm.replace(only_mid_control=self.only_mid_control)

    def load(self, ckpt_path: Optional[str] = None, dtype=None):
        from fgdm_tpu.checkpoint.loader import load_controlnet

        cldm = load_controlnet(
            ckpt_path or self.ckpt_path,
            dtype=dtype or self.unet_def.dtype,
            latent_size=self.image_size,
            unet=self.unet_def, cn=self.cn_def, vae=self.vae_def,
            clip=self.clip_def, schedule=self.schedule(),
            scale_factor=self.scale_factor)
        return cldm.replace(only_mid_control=self.only_mid_control)


def build_control_ldm(dtype=jnp.bfloat16, **p) -> ControlSpec:
    """`controlnet.cldm.cldm.ControlLDM` yaml params → ControlSpec."""
    unet_def = build_unet(
        dtype=dtype, no_prompting=True,
        **{k: v for k, v in (p.get("unet_config", {}).get("params")
                             or {}).items() if k != "no_prompting"})
    cn_def = build_controlnet(
        dtype=dtype, **(p.get("control_stage_config", {}).get("params")
                        or {}))
    vae_def = build_autoencoder(
        dtype=dtype, **(p.get("first_stage_config", {}).get("params") or {}))
    cond_cfg = p.get("cond_stage_config", "__is_unconditional__")
    if isinstance(cond_cfg, dict):
        clip_def = build_clip(dtype=dtype, **(cond_cfg.get("params") or {}))
    elif cond_cfg in ("__is_unconditional__", None):
        clip_def = None
    else:
        clip_def = build_clip(dtype=dtype)
    return ControlSpec(
        unet_def=unet_def,
        cn_def=cn_def,
        vae_def=vae_def,
        clip_def=clip_def,
        schedule_args=dict(
            timesteps=p.get("timesteps", 1000),
            beta_schedule=p.get("beta_schedule", "linear"),
            linear_start=p.get("linear_start", 1e-4),
            linear_end=p.get("linear_end", 2e-2),
            cosine_s=p.get("cosine_s", 8e-3),
            v_posterior=p.get("v_posterior", 0.0),
            parameterization=p.get("parameterization", "eps"),
        ),
        conditioning_key=p.get("conditioning_key", "crossattn"),
        scale_factor=p.get("scale_factor", 0.18215),
        image_size=p.get("image_size", 64),
        only_mid_control=p.get("only_mid_control", False),
        control_key=p.get("control_key", "hint"),
        ckpt_path=p.get("ckpt_path"),
        raw=p,
    )
