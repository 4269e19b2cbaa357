"""ControlNet branch: trainable SD-encoder copy with zero-conv taps.

Mirrors `/root/reference/controlnet/cldm/cldm.py:545-813`:

* ``input_hint_block`` — 8-conv stride-2 pyramid mapping the 512² RGB hint
  (3ch) down 8× to model_channels, final conv zero-init (`cldm.py:655-671`).
* encoder copy of the SD UNet ``input_blocks`` + ``middle_block`` with a
  1×1 **zero conv** after every block (13 taps: 12 input + 1 middle,
  `cldm.py:789-813`).
* the hint is added to ``h`` once, right after the first conv block.

Returns the tuple of 13 residuals consumed by
``UNetModel(control=...)`` (our ControlledUnetModel equivalent).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fgdm_tpu.nn.attention import SpatialTransformer
from fgdm_tpu.nn.blocks import Downsample, ResBlock, silu
from fgdm_tpu.nn.layers import Conv2d, Dense, timestep_embedding

Dtype = Any


class ControlNet(nn.Module):
    in_channels: int = 4
    model_channels: int = 320
    hint_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    num_head_channels: int = -1
    transformer_depth: int = 1
    context_dim: Optional[int] = 768
    use_scale_shift_norm: bool = False
    conv_resample: bool = True
    fused_norm_silu: bool = False
    dtype: Dtype = jnp.bfloat16
    # context parallelism (parallel/context.py): mesh axis the spatial dim
    # is sharded over — threaded into the transformers (ring attention) and
    # pinned at block junctions like the UNet
    seq_axis: Optional[str] = None

    def _heads_for(self, ch: int) -> Tuple[int, int]:
        if self.num_head_channels == -1:
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels

    @nn.compact
    def __call__(
        self,
        x: Optional[jnp.ndarray],          # [B, h, w, 4] noisy latent
        hint: Optional[jnp.ndarray],       # [B, 8h, 8w, 3] control in [0,1]
        timesteps: Optional[jnp.ndarray],  # [B]
        context: Optional[jnp.ndarray],    # [B, 77, 768]
        hint_emb: Optional[jnp.ndarray] = None,  # precomputed pyramid out
        hint_only: bool = False,
    ):
        """Returns the 13 zero-conv residual taps; with ``hint_only`` it
        returns just the hint-pyramid embedding [B, h, w, mc] instead.

        The pyramid's input is constant across a sampler's denoise steps,
        so samplers compute it once (``hint_only=True``) and pass the
        result back per step as ``hint_emb`` — hoisting 8 convs (the
        first at full render resolution) out of the scan body.  The
        reference recomputes it every forward (`cldm.py:792-798`).
        """
        mc = self.model_channels
        if hint_emb is None or hint_only:
            # hint pyramid: 3→16→16→32↓→32→96↓→96→256↓→mc(zero)
            g = hint.astype(self.dtype)
            hint_chs = [(16, 1), (16, 1), (32, 2), (32, 1), (96, 2),
                        (96, 1), (256, 2)]
            conv_idx = 0
            for ch_out, stride in hint_chs:
                g = Conv2d(ch_out, kernel_size=3, stride=stride, padding=1,
                           dtype=self.dtype,
                           name=f"input_hint_block_{conv_idx}")(g)
                g = silu(g)
                conv_idx += 1
            guided_hint = Conv2d(mc, kernel_size=3, zero_init=True,
                                 dtype=self.dtype,
                                 name=f"input_hint_block_{conv_idx}")(g)
            if hint_only:
                return guided_hint
        else:
            guided_hint = hint_emb.astype(self.dtype)

        time_embed_dim = mc * 4
        t_emb = timestep_embedding(timesteps, mc)
        emb = Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(t_emb)
        emb = Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(silu(emb))

        def res(name, ch_in, ch_out):
            return ResBlock(channels=ch_in, emb_channels=time_embed_dim,
                            out_channels=ch_out,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            fused_norm=self.fused_norm_silu,
                            dtype=self.dtype, name=name)

        def zero_conv(name, h):
            return Conv2d(h.shape[-1], kernel_size=1, padding=0, zero_init=True,
                          dtype=self.dtype, name=name)(h)

        from fgdm_tpu.parallel.ring_attention import make_sh

        sh = make_sh(self.seq_axis)

        outs = []
        h = x.astype(self.dtype)
        h = Conv2d(mc, kernel_size=3, dtype=self.dtype, name="input_blocks_0_0")(h)
        h = sh(h + guided_hint)
        outs.append(sh(zero_conv("zero_convs_0", h)))

        ch = mc
        ds = 1
        block_idx = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = sh(res(f"input_blocks_{block_idx}_0", ch, mult * mc)(h, emb))
                ch = mult * mc
                if ds in self.attention_resolutions:
                    n_heads, d_head = self._heads_for(ch)
                    h, _ = SpatialTransformer(
                        in_channels=ch, n_heads=n_heads, d_head=d_head,
                        depth=self.transformer_depth, context_dim=self.context_dim,
                        dtype=self.dtype, seq_axis=self.seq_axis,
                        name=f"input_blocks_{block_idx}_1",
                    )(h, context=context)
                    h = sh(h)
                outs.append(sh(zero_conv(f"zero_convs_{block_idx}", h)))
                block_idx += 1
            if level != len(self.channel_mult) - 1:
                h = sh(Downsample(ch, self.conv_resample, dtype=self.dtype,
                                  name=f"input_blocks_{block_idx}_0")(h))
                outs.append(sh(zero_conv(f"zero_convs_{block_idx}", h)))
                ds *= 2
                block_idx += 1

        h = sh(res("middle_block_0", ch, ch)(h, emb))
        n_heads, d_head = self._heads_for(ch)
        h, _ = SpatialTransformer(
            in_channels=ch, n_heads=n_heads, d_head=d_head,
            depth=self.transformer_depth, context_dim=self.context_dim,
            dtype=self.dtype, seq_axis=self.seq_axis, name="middle_block_1",
        )(h, context=context)
        h = sh(res("middle_block_2", ch, ch)(h, emb))
        outs.append(sh(zero_conv("middle_block_out", h)))

        return tuple(outs)


def guess_mode_scales(strength: float = 1.0, num: int = 13) -> Tuple[float, ...]:
    """Geometric decay used in guess mode (controlnet/initialize_cn.py:91):
    ``strength * 0.825**(12-i)`` for tap i."""
    return tuple(strength * (0.825 ** (float(num - 1 - i))) for i in range(num))
