"""Config system: YAML + ``target:``/``params:`` reflection instantiation.

Re-implements the reference's OmegaConf-based DI
(`/root/reference/ldm/util.py:78-93` ``instantiate_from_config``;
`main.py:539-541` left-to-right config merging + CLI dot-list overrides)
without the omegaconf dependency, and adds a **compatibility alias table**
so the reference's own YAML files (``models/config.yaml``,
``configs/stable-diffusion/*.yaml``, ``controlnet/models/cldm_v15_canny.yaml``)
resolve to this framework's builders unchanged.
"""

from __future__ import annotations

import copy
import importlib
from typing import Any, Callable, Dict, List, Optional, Sequence

import re

import yaml

__all__ = [
    "load_config",
    "merge_configs",
    "apply_dot_overrides",
    "instantiate_from_config",
    "get_obj_from_str",
    "TARGET_ALIASES",
]


class _Loader(yaml.SafeLoader):
    """SafeLoader whose float resolver also accepts dot-less scientific
    notation (``5e-5``, ``1E8``) — PyYAML's stock YAML-1.1 regex demands a
    dot before the exponent, silently yielding *strings* for the most
    common learning-rate spellings.  OmegaConf (the reference's config
    layer) coerces these; so do we."""


_Loader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?\.(?:inf|Inf|INF)
        |\.(?:nan|NaN|NAN))$""",
        re.X,
    ),
    list("-+0123456789."),
)


def _yaml_load(text_or_stream) -> Any:
    return yaml.load(text_or_stream, Loader=_Loader)


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return _yaml_load(f) or {}


def merge_configs(*configs: Dict[str, Any]) -> Dict[str, Any]:
    """Deep merge, rightmost wins (reference merges base configs then CLI)."""
    out: Dict[str, Any] = {}
    for cfg in configs:
        out = _deep_merge(out, cfg)
    return out


def _deep_merge(a: Any, b: Any) -> Any:
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, v in b.items():
            out[k] = _deep_merge(a[k], v) if k in a else copy.deepcopy(v)
        return out
    return copy.deepcopy(b)


def apply_dot_overrides(cfg: Dict[str, Any], dotlist: Sequence[str]) -> Dict[str, Any]:
    """``nested.key=value`` CLI overrides (main.py:539-541)."""
    cfg = copy.deepcopy(cfg)
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"override must be key=value, got {item!r}")
        key, _, raw = item.partition("=")
        value = _yaml_load(raw)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return cfg


# -- reference target names → our builders ---------------------------------

def _build_latent_diffusion(**params):
    from fgdm_tpu.builders import build_latent_diffusion

    return build_latent_diffusion(**params)


def _build_control_ldm(**params):
    from fgdm_tpu.builders import build_control_ldm

    return build_control_ldm(**params)


def _build_controlled_unet(**params):
    from fgdm_tpu.builders import build_unet

    params.pop("no_prompting", None)
    return build_unet(no_prompting=True, **params)


def _build_controlnet(**params):
    from fgdm_tpu.builders import build_controlnet

    return build_controlnet(**params)


def _build_unet(**params):
    from fgdm_tpu.builders import build_unet

    return build_unet(**params)


def _build_autoencoder(**params):
    from fgdm_tpu.builders import build_autoencoder

    return build_autoencoder(**params)


def _build_clip(**params):
    from fgdm_tpu.builders import build_clip

    return build_clip(**params)


def _build_load_data(**params):
    from fgdm_tpu.data.dataset import load_data

    return load_data(**params)


def _build_lambda_linear(**params):
    from fgdm_tpu.train.lr_schedules import lambda_linear

    p = {k: (v[0] if isinstance(v, list) else v) for k, v in params.items()}
    return lambda_linear(
        warm_up_steps=p.get("warm_up_steps", 10000),
        f_start=p.get("f_start", 1e-5),
        f_max=p.get("f_max", 1.0),
        f_min=p.get("f_min", 1.0),
        cycle_length=p.get("cycle_lengths", 1e13),
    )


def _identity(**params):
    return lambda x: x


def _data_module(**params):
    """main.DataModuleFromConfig: return the parsed data spec; the train CLI
    builds iterators from it (the Lightning DataModule has no TPU analog)."""
    return dict(params)


def _image_logger(**params):
    from fgdm_tpu.train.metrics import ImageLogger

    import jax

    return lambda logdir: ImageLogger(
        logdir,
        batch_frequency=params.get("batch_frequency", 800),
        max_images=params.get("max_images", 8),
        # multihost: only the coordinator samples/writes (same rank gate as
        # the CLI's --img_log_freq path)
        is_main_process=jax.process_index() == 0,
    )


TARGET_ALIASES: Dict[str, Callable[..., Any]] = {
    # reference target strings (ldm/controlnet namespaces)
    "ldm.models.diffusion.ddpm.LatentDiffusion": _build_latent_diffusion,
    "ldm.models.diffusion.ddpm.AdaptDiffusion": _build_latent_diffusion,
    "ldm.modules.diffusionmodules.openaimodel.UNetModel": _build_unet,
    "ldm.modules.diffusionmodules.openaimodel.AdaptUNetModel": _build_unet,
    "controlnet.cldm.cldm.ControlLDM": _build_control_ldm,
    "cldm.cldm.ControlLDM": _build_control_ldm,
    "controlnet.cldm.cldm.ControlNet": _build_controlnet,
    "cldm.cldm.ControlNet": _build_controlnet,
    "controlnet.cldm.cldm.ControlledUnetModel": _build_controlled_unet,
    "cldm.cldm.ControlledUnetModel": _build_controlled_unet,
    "ldm.models.autoencoder.AutoencoderKL": _build_autoencoder,
    "ldm.models.autoencoder.NpleAutoencoderKL": _build_autoencoder,
    "ldm.modules.encoders.modules.FrozenCLIPEmbedder": _build_clip,
    "ldm.data.semantic.load_data": _build_load_data,
    "ldm.lr_scheduler.LambdaLinearScheduler": _build_lambda_linear,
    "torch.nn.Identity": _identity,
    "main.DataModuleFromConfig": _data_module,
    "main.ImageLogger": _image_logger,
    # this framework's dotted names resolve normally via import
}


def get_obj_from_str(string: str) -> Callable[..., Any]:
    if string in TARGET_ALIASES:
        return TARGET_ALIASES[string]
    module, _, cls = string.rpartition(".")
    return getattr(importlib.import_module(module), cls)


def instantiate_from_config(config: Dict[str, Any], **extra) -> Any:
    """``{target: dotted.path, params: {...}}`` → object (ldm/util.py:78-93)."""
    if not isinstance(config, dict) or "target" not in config:
        if config in ("__is_first_stage__", "__is_unconditional__"):
            return None
        raise KeyError(f"expected a config dict with 'target', got {config!r}")
    params = dict(config.get("params") or {})
    params.update(extra)
    return get_obj_from_str(config["target"])(**params)
