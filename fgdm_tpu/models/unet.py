"""SD-1.x UNet with the FG-DM adapter injection, TPU-first.

Structural contract mirrors `/root/reference/ldm/modules/diffusionmodules/
openaimodel.py:439-884` (SD-1.4 config `models/config.yaml:33-48`):

* 12 input blocks — conv_in, then per level: ``num_res_blocks`` ResBlocks
  (+ SpatialTransformer at ds ∈ attention_resolutions) and a Downsample
  between levels; middle block (Res, Transformer, Res); 12 output blocks with
  skip concatenation; GroupNorm→SiLU→zero-conv head.
* **Adapter injection** (`openaimodel.py:836-859`): the adapter consumes
  ``pcond`` if given, else the noisy latent itself (self-prompting), and its
  4 pyramid features are added after every 3rd input block.
* Dual forward paths (`openaimodel.py:753-806`): ``use_adapter=False`` is the
  frozen-SD teacher path (reference ``use_original=True``).  Here it's a
  *static* flag on one module — no second parameter copy.
* Attention maps are first-class outputs (static ``capture`` flag) instead of
  torch forward hooks (`ddpm.py:1718-1766`): the no-capture path compiles
  with zero overhead.

TPU notes: NHWC layout; bf16 compute / f32 params; `jax.checkpoint` over each
block group when ``remat`` is set (replaces torch gradient checkpointing).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fgdm_tpu.models.adapter import Adapter, TimeAdapter
from fgdm_tpu.nn.attention import PixelAttentionBlock, SpatialTransformer
from fgdm_tpu.nn.blocks import Downsample, ResBlock, Upsample
from fgdm_tpu.nn.layers import Conv2d, Dense, GroupNorm32, timestep_embedding
from fgdm_tpu.nn.blocks import silu

Dtype = Any


class UNetModel(nn.Module):
    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    num_head_channels: int = -1
    transformer_depth: int = 1
    context_dim: Optional[int] = 768
    use_spatial_transformer: bool = True
    use_new_attention_order: bool = False   # legacy pixel-attn qkv layout
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    conv_resample: bool = True
    num_classes: Optional[int] = None
    # FG-DM adapter
    use_adapter: bool = True          # build the adapter ("no_prompting" = False)
    adapter_channels: Optional[int] = None
    use_time_adapter: bool = False
    num_prompts: int = 1              # >1 = AdaptUNetModel multi-adapter
    # TPU execution
    dtype: Dtype = jnp.bfloat16
    remat: bool = False
    fused_norm_silu: bool = False   # Pallas GroupNorm+SiLU in ResBlocks
    # context parallelism: mesh axis the spatial/token dim is sharded over
    # (parallel/context.py) — self-attention rings over it; convs/norms are
    # GSPMD-partitioned by XLA.  Incompatible with fused_norm_silu (custom
    # calls don't partition).
    seq_axis: Optional[str] = None

    def _heads_for(self, ch: int) -> Tuple[int, int]:
        if self.num_head_channels == -1:
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                      # [B, H, W, C] noisy latent
        timesteps: jnp.ndarray,              # [B]
        context: Optional[jnp.ndarray] = None,  # [B, 77, 768] CLIP states
        y: Optional[jnp.ndarray] = None,     # [B] class labels
        pcond: Optional[jnp.ndarray] = None, # adapter prompt (defaults to x)
        extra_pconds: Optional[Sequence[jnp.ndarray]] = None,  # multi-prompt
        adapter_on: bool = True,             # False = frozen-SD teacher path
        capture: bool = False,               # return attention maps
        control: Optional[Sequence[jnp.ndarray]] = None,  # 13 ControlNet residuals
        only_mid_control: bool = False,
        attn_editor=None,  # Callable[[probs, is_cross, place], probs] (ptp)
    ):
        mc = self.model_channels
        time_embed_dim = mc * 4

        # context parallelism: pin the H-shard layout at every block
        # junction so GSPMD never flips layouts mid-network (see
        # parallel/ring_attention.constrain_seq; identity when seq_axis
        # is None)
        from fgdm_tpu.parallel.ring_attention import make_sh

        sh = make_sh(self.seq_axis)

        t_emb = timestep_embedding(timesteps, mc)
        emb = Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(t_emb)
        emb = Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(silu(emb))

        if self.num_classes is not None:
            label_emb = nn.Embed(self.num_classes, time_embed_dim,
                                 param_dtype=jnp.float32, name="label_emb")(y)
            emb = emb + label_emb.astype(emb.dtype)

        h = x.astype(self.dtype)

        # --- adapter features (4-scale pyramid) ---------------------------
        fa: Optional[Tuple[jnp.ndarray, ...]] = None
        if self.use_adapter and adapter_on:
            prompt = h if pcond is None else pcond.astype(self.dtype)
            cin = self.adapter_channels or self.in_channels
            ad_channels = tuple(m * mc for m in self.channel_mult)
            if self.use_time_adapter:
                fa = TimeAdapter(channels=ad_channels, nums_rb=2, cin=cin,
                                 ksize=1, sk=True, use_conv=False,
                                 emb_ch=time_embed_dim, dtype=self.dtype,
                                 name="adapter")(prompt, emb)
            else:
                fa = Adapter(channels=ad_channels, nums_rb=2, cin=cin,
                             ksize=1, sk=True, use_conv=False,
                             dtype=self.dtype, name="adapter")(prompt)
            if self.num_prompts > 1 and extra_pconds is not None:
                # AdaptUNetModel: composable extra adapters summed with the
                # main one (openaimodel.py:1291-1309)
                for k, ep in enumerate(extra_pconds[: self.num_prompts - 1]):
                    fak = Adapter(
                        channels=ad_channels, nums_rb=2, cin=cin, ksize=1,
                        sk=True, use_conv=False, dtype=self.dtype,
                        name=f"adapters_{k}",
                    )(ep.astype(self.dtype))
                    fa = tuple(a + b for a, b in zip(fa, fak))

        selfattn: Dict[str, jnp.ndarray] = {}
        crossattn: Dict[str, jnp.ndarray] = {}

        # remat trades recompute for activation memory (the reference's
        # use_checkpoint → torch CheckpointFunction, util.py:102-157)
        res_cls = nn.remat(ResBlock) if self.remat else ResBlock

        def res(name, ch_in, ch_out, up=False, down=False):
            return res_cls(
                channels=ch_in, emb_channels=time_embed_dim, out_channels=ch_out,
                use_scale_shift_norm=self.use_scale_shift_norm, up=up, down=down,
                fused_norm=self.fused_norm_silu, dtype=self.dtype, name=name,
            )

        def attn(name, ch, prefix):
            n_heads, d_head = self._heads_for(ch)
            if not self.use_spatial_transformer:
                # legacy pixel-space attention (no context/capture/editor —
                # the reference AttentionBlock is self-attention only,
                # openaimodel.py:304-349); used by non-LDM DDPM configs
                assert not capture and attn_editor is None, (
                    "attention capture/editing requires "
                    "use_spatial_transformer=True (the reference "
                    "AttentionBlock exposes no maps either)")
                blk_cls = (nn.remat(PixelAttentionBlock) if self.remat
                           else PixelAttentionBlock)
                blk = blk_cls(channels=ch, num_heads=n_heads,
                              use_new_attention_order=self.use_new_attention_order,
                              dtype=self.dtype, name=name)
                return lambda hh: blk(hh)
            # remat the transformers too (not just ResBlocks) on the plain
            # path: capture-mode maps must escape the block, so those
            # instances stay un-rematted (and the teacher capture runs
            # under stop_gradient anyway)
            st_cls = (nn.remat(SpatialTransformer)
                      if self.remat and not capture and attn_editor is None
                      else SpatialTransformer)
            st = st_cls(
                in_channels=ch, n_heads=n_heads, d_head=d_head,
                depth=self.transformer_depth, context_dim=self.context_dim,
                dtype=self.dtype, seq_axis=self.seq_axis, name=name,
            )
            place = {"i": "down", "m": "mid", "o": "up"}[prefix[0]]
            editor = (
                (lambda p, is_cross: attn_editor(p, is_cross, place))
                if attn_editor is not None else None
            )

            def apply(hh):
                if self.remat and not capture and attn_editor is None:
                    # static defaults (capture=False, no editor): array-only
                    # args so nn.remat never traces a python bool/callable
                    out, probs = st(hh, context=context)
                else:
                    out, probs = st(hh, context=context, capture=capture,
                                    attn_editor=editor)
                if capture and probs is not None:
                    sp, cp = probs
                    if sp is not None:
                        selfattn[prefix] = sp
                    if cp is not None:
                        crossattn[prefix] = cp
                return out

            return apply

        # --- input blocks --------------------------------------------------
        hs = []
        ch = mc
        h = sh(Conv2d(mc, kernel_size=3, dtype=self.dtype, name="input_blocks_0_0")(h))
        hs.append(h)
        input_block_chans = [mc]
        ds = 1
        block_idx = 1
        adapter_idx = 0
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = sh(res(f"input_blocks_{block_idx}_0", ch, mult * mc)(h, emb))
                ch = mult * mc
                if ds in self.attention_resolutions:
                    h = sh(attn(f"input_blocks_{block_idx}_1", ch,
                                f"input_blocks.{block_idx}.1")(h))
                if fa is not None and i == self.num_res_blocks - 1:
                    # Adapter feature added after the last ResBlock of each
                    # level, before downsampling.  On the SD-1.4 layout this
                    # is exactly the reference's "(idx+1)%3==0" rule — blocks
                    # 2/5/8/11 (openaimodel.py:855-857).
                    h = sh(h + sh(fa[adapter_idx]).astype(h.dtype))
                    adapter_idx += 1
                hs.append(h)
                input_block_chans.append(ch)
                block_idx += 1
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(f"input_blocks_{block_idx}_0", ch, ch, down=True)(h, emb)
                else:
                    h = Downsample(ch, self.conv_resample, dtype=self.dtype,
                                   name=f"input_blocks_{block_idx}_0")(h)
                h = sh(h)
                hs.append(h)
                input_block_chans.append(ch)
                ds *= 2
                block_idx += 1
        if fa is not None:
            assert adapter_idx == len(fa), "adapter feature count mismatch"

        # --- middle block --------------------------------------------------
        h = sh(res("middle_block_0", ch, ch)(h, emb))
        h = sh(attn("middle_block_1", ch, "middle_block.1")(h))
        h = sh(res("middle_block_2", ch, ch)(h, emb))

        # ControlNet residual injection (reference ControlledUnetModel,
        # controlnet/cldm/cldm.py:27-50): last residual into the middle
        # output, the rest added to each encoder skip, consumed in reverse.
        ctrl = list(control) if control is not None else None
        if ctrl is not None:
            h = sh(h + sh(ctrl.pop()).astype(h.dtype))

        # --- output blocks -------------------------------------------------
        block_idx = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                ich = input_block_chans.pop()
                skip = hs.pop()
                if ctrl is not None and not only_mid_control:
                    skip = sh(skip + sh(ctrl.pop()).astype(h.dtype))
                h = sh(jnp.concatenate([h, skip], axis=-1))
                h = sh(res(f"output_blocks_{block_idx}_0", ch + ich, mult * mc)(h, emb))
                ch = mult * mc
                layer_idx = 1
                if ds in self.attention_resolutions:
                    h = sh(attn(f"output_blocks_{block_idx}_{layer_idx}", ch,
                                f"output_blocks.{block_idx}.{layer_idx}")(h))
                    layer_idx += 1
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res(f"output_blocks_{block_idx}_{layer_idx}",
                                ch, ch, up=True)(h, emb)
                    else:
                        h = Upsample(ch, self.conv_resample, dtype=self.dtype,
                                     name=f"output_blocks_{block_idx}_{layer_idx}")(h)
                    h = sh(h)
                    ds //= 2
                block_idx += 1

        # --- head ----------------------------------------------------------
        h = GroupNorm32(name="out_norm")(h)
        h = silu(h)
        h = Conv2d(self.out_channels, kernel_size=3, zero_init=True,
                   dtype=self.dtype, name="out_conv")(h)
        h = h.astype(jnp.float32)

        if capture:
            return h, selfattn, crossattn
        return h
