"""Context parallelism: shard the spatial/token axis of one sample over
the mesh.

This is the TPU-native replacement for the reference's fold/unfold
machinery (`/root/reference/ldm/models/diffusion/ddpm.py:697-763` —
``split_input_params`` patch-stitching): generation beyond the single-chip
flash-attention budget shards H over a ``seq`` mesh axis instead of
processing overlapping tiles.  Division of labor:

* convs / GroupNorms / resizes — GSPMD: XLA partitions them over the
  sharded H axis and inserts halo exchanges / psums itself;
* self-attention (the O(N²) part) — ``parallel.ring_attention``: a
  shard_map island rotating K/V shards around the ring with ppermute, so
  no device ever holds the full score matrix or an all-gathered K/V;
* cross-attention (77 replicated text tokens) — local einsum, no
  communication.

Pallas kernels (flash attention, fused GroupNorm) are custom calls XLA
cannot partition, so the context-parallel clone disables them; ring
attention replaces flash on the sharded axis.

Usage:
    mesh = context_mesh()                       # all devices on axis 'seq'
    ld_cp = context_parallel_pipeline(ld, mesh) # seq_axis-threaded clone
    img = sample_context_parallel(ld_cp, mesh, rng, ctx, uc, (2048, 2048))
"""

from __future__ import annotations

import functools
import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fgdm_tpu.parallel.ring_attention import set_context_mesh

AXIS = "seq"


def context_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devs), (axis,))


def context_parallel_pipeline(ld, mesh: Mesh, axis: str = AXIS):
    """Clone a LatentDiffusion/ControlLDM for context-parallel execution:
    ``seq_axis`` threaded into every attention module, Pallas fused kernels
    off.  Registers ``mesh`` for the ring-attention islands."""
    set_context_mesh(mesh)
    # the env-gated Pallas conv is also a custom call XLA cannot partition;
    # it reads a process global at trace time, so clear it here (the flag is
    # an A/B knob, default off — losing it process-wide under CP is correct)
    import fgdm_tpu.nn.layers as _nl

    if _nl._PALLAS_CONV or _nl._PALLAS_CONV_VAE:
        print("[context_parallel] disabling FGDM_PALLAS_CONV(_VAE): Pallas "
              "conv custom calls cannot be GSPMD-partitioned")
        _nl._PALLAS_CONV = False
        _nl._PALLAS_CONV_VAE = False
    updates = {"seq_axis": axis}
    if getattr(ld.unet_def, "fused_norm_silu", False):
        updates["fused_norm_silu"] = False
    unet = ld.unet_def.clone(**updates)
    vae_updates = {"seq_axis": axis}
    if getattr(ld.vae_def, "fused_norm", False):
        vae_updates["fused_norm"] = False
    vae = ld.vae_def.clone(**vae_updates)
    new = ld.replace(unet_def=unet, vae_def=vae)
    if getattr(ld, "control_def", None) is not None:
        ctrl_updates = {"seq_axis": axis}
        if getattr(ld.control_def, "fused_norm_silu", False):
            ctrl_updates["fused_norm_silu"] = False
        new = new.replace(control_def=ld.control_def.clone(**ctrl_updates))
    return new


def _h_sharding(mesh: Mesh, axis: str) -> NamedSharding:
    return NamedSharding(mesh, P(None, axis, None, None))


def sample_context_parallel(
    ld,
    mesh: Mesh,
    rng: jax.Array,
    cond_ctx: jnp.ndarray,
    uncond_ctx: jnp.ndarray,
    image_hw: Tuple[int, int],
    num_steps: int = 50,
    cfg_scale: float = 7.5,
    axis: str = AXIS,
    decode: bool = True,
) -> jnp.ndarray:
    """DDIM-sample one batch at ``image_hw`` with H sharded over the mesh.

    ``ld`` must be a :func:`context_parallel_pipeline` clone.  The latent H
    (image_hw[0]//8) must divide by the mesh size with enough rows per
    device for the deepest UNet level.  Returns the decoded image (or the
    latent when ``decode=False``), still H-sharded.
    """
    from fgdm_tpu.core.schedules import DDIMSchedule
    from fgdm_tpu.sampling.ddim import ddim_sample

    b = cond_ctx.shape[0]
    lat_hw = (image_hw[0] // 8, image_hw[1] // 8)
    n_dev = mesh.devices.size
    # Hard requirement: the top-level H shard must be even (the x_T
    # device_put below) — everything deeper is either a layout-quality
    # concern (GSPMD pads uneven constraint shards) or a ring-attention
    # shard_map requirement on the token count, checked per level.
    assert lat_hw[0] % n_dev == 0, (
        f"latent H {lat_hw[0]} must divide over the {n_dev}-device seq axis")
    max_ds = 2 ** (len(ld.unet_def.channel_mult) - 1)
    if lat_hw[0] % (n_dev * max_ds) != 0:
        # ring attention is a shard_map island: its token axis must divide
        # the mesh at every level that runs self-attention (incl. the
        # middle block at the deepest downsample)
        for ds in sorted(set(ld.unet_def.attention_resolutions) | {max_ds}):
            n_tok = (lat_hw[0] // ds) * (lat_hw[1] // ds)
            assert n_tok % n_dev == 0, (
                f"ring attention at UNet level ds={ds} has {n_tok} tokens, "
                f"not divisible over the {n_dev}-device seq axis — pick H "
                f"a multiple of {n_dev * max_ds} (or adjust W)")
        warnings.warn(
            f"latent H {lat_hw[0]} shards over {n_dev} devices but not at "
            f"every UNet level (deepest downsample {max_ds}×): sampling is "
            "exact, but GSPMD will pad/reshard the deep levels (involuntary "
            f"rematerialization); H a multiple of {n_dev * max_ds} gives "
            "thrash-free layouts", stacklevel=2)
    shape = (b, lat_hw[0], lat_hw[1], ld.unet_def.in_channels)
    sched = DDIMSchedule.create(ld.schedule, num_steps)

    rng, init_rng = jax.random.split(rng)
    # seed the GSPMD propagation: x_T arrives H-sharded, every step's carry
    # keeps the sharding, and XLA partitions the UNet around it
    x_T = jax.device_put(
        jax.random.normal(init_rng, shape, jnp.float32),
        _h_sharding(mesh, axis))

    # module-level jit (not a per-call closure): repeated requests reuse the
    # compiled GSPMD program instead of paying the multi-minute partition
    # compile every time
    return _cp_sample(ld, rng, cond_ctx, uncond_ctx, x_T, sched,
                      float(cfg_scale), bool(decode), int(num_steps))


@functools.partial(jax.jit, static_argnames=("cfg_scale", "decode",
                                              "num_steps"))
def _cp_sample(ld, rng, c, uc, x_T, sched, cfg_scale, decode, num_steps):
    from fgdm_tpu.sampling.ddim import ddim_sample

    z, _ = ddim_sample(
        ld.denoise_fn(), rng, x_T.shape, sched,
        {"c_crossattn": c}, {"c_crossattn": uc},
        cfg_scale=cfg_scale, x_T=x_T)
    if decode:
        return ld.decode_first_stage(z)
    return z


@jax.jit
def _cp_decode(ld, z):
    return ld.decode_first_stage(z)


def decode_context_parallel(ld, mesh: Mesh, z: jnp.ndarray,
                            axis: str = AXIS) -> jnp.ndarray:
    """VAE-decode an H-sharded latent over the mesh (large-image decode
    without the single-chip tiling of ``sampling/tiled.py``)."""
    z = jax.device_put(z, _h_sharding(mesh, axis))
    return _cp_decode(ld, z)
