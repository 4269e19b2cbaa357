"""On-the-fly GT condition synthesis for factor training.

The reference synthesizes the training target for the non-seg factors by
running a frozen detector net on each batch inside ``get_input``
(`/root/reference/ldm/models/diffusion/ddpm.py:137-150,397-419`):

* ``use_depth``            → MiDaS depth map
* ``use_depth+use_normal`` → MiDaS depth → surface normals
* ``use_sketch``           → HED (``use_hed``) or PiDiNet edge map
* ``sketch_to_normal``     → concat(normal, sketch) for the joint factor

Here the detector is a frozen flax module whose forward runs *inside* the
compiled train step (one fused program — no host round-trip, no hooks), and
whose params are pytree leaves of :class:`ConditionSynth` so they ride the
same mesh sharding as everything else.  ``jax.lax.stop_gradient`` replaces
the reference's ``.detach()``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

VALID_KINDS = ("depth", "normal", "sketch", "sketch_hed", "sketch_to_normal")


@struct.dataclass
class ConditionSynth:
    """Frozen annotator bundle: ``target(img)`` maps an RGB batch in [-1,1]
    NHWC to the factor's training target in [-1,1] NHWC."""

    kind: str = struct.field(pytree_node=False)
    model_def: Any = struct.field(pytree_node=False)
    params: Any = None
    # second net for sketch_to_normal (reference uses midas + sketch nets)
    model_def2: Any = struct.field(pytree_node=False, default=None)
    params2: Any = None

    def _depth01(self, img: jnp.ndarray) -> jnp.ndarray:
        depth = self.model_def.apply(self.params, img)
        dmin = jnp.min(depth, axis=(1, 2), keepdims=True)
        dmax = jnp.max(depth, axis=(1, 2), keepdims=True)
        return (depth - dmin) / (dmax - dmin + 1e-8)

    def _one(self, kind: str, model_def, params, img: jnp.ndarray
             ) -> jnp.ndarray:
        if kind == "depth":
            d01 = self._depth01(img)
            return jnp.repeat((d01 * 2.0 - 1.0)[..., None], 3, axis=-1)
        if kind == "normal":
            from fgdm_tpu.annotators.midas import depth_to_normal

            depth = model_def.apply(params, img)
            return depth_to_normal(depth)
        # sketch nets already emit [-1,1] 3ch (hed.py / pidinet.py)
        return model_def.apply(params, img)

    def target(self, img: jnp.ndarray) -> jnp.ndarray:
        """[B,H,W,3] RGB in [-1,1] → training target, gradients stopped."""
        if self.kind == "sketch_to_normal":
            # reference: y = midas-normal(x); x = sketch(x); cat([y, x], ch)
            # (ddpm.py:403-410) — consumed by the Nple first stage.
            normal = self._one("normal", self.model_def, self.params, img)
            sketch = self._one("sketch", self.model_def2, self.params2, img)
            out = jnp.concatenate([normal, sketch], axis=-1)
        else:
            out = self._one(self.kind, self.model_def, self.params, img)
        return jax.lax.stop_gradient(out)


def condition_kind(use_depth: bool = False, use_normal: bool = False,
                   use_sketch: bool = False, use_hed: bool = False,
                   sketch_to_normal: bool = False) -> Optional[str]:
    """Map the reference config flags to a synthesis kind (ddpm.py:137-150).

    seg configs set none of these: the dataset's colorized label map *is*
    the target, so the kind is None."""
    if sketch_to_normal:
        return "sketch_to_normal"
    if use_sketch:
        return "sketch_hed" if use_hed else "sketch"
    if use_depth and use_normal:
        return "normal"
    if use_depth:
        return "depth"
    return None


def _sketch_def(kind: str, dtype):
    if kind == "sketch_hed":
        from fgdm_tpu.annotators.hed import ControlNetHED

        return ControlNetHED(dtype=dtype)
    from fgdm_tpu.annotators.pidinet import PiDiNet

    return PiDiNet(dtype=dtype)


def build_condition_synth(
    kind: str,
    rng: Optional[jax.Array] = None,
    params: Any = None,
    params2: Any = None,
    image_size: int = 256,
    dtype=jnp.float32,
) -> ConditionSynth:
    """Construct the frozen annotator bundle for ``kind``.

    ``params`` comes from the annotator checkpoint ingest; when absent (and
    ``rng`` is given) the net is random-initialized — only useful for smoke
    tests, never for a real training run."""
    if kind not in VALID_KINDS:
        raise ValueError(f"unknown condition kind {kind!r}; one of {VALID_KINDS}")

    if kind in ("depth", "normal"):
        from fgdm_tpu.annotators.midas import DPTHybrid

        model_def, model_def2 = DPTHybrid(), None
    elif kind == "sketch_to_normal":
        from fgdm_tpu.annotators.midas import DPTHybrid

        model_def, model_def2 = DPTHybrid(), _sketch_def("sketch", dtype)
    else:
        model_def, model_def2 = _sketch_def(kind, dtype), None

    probe = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    if params is None:
        if rng is None:
            raise ValueError(
                f"condition synthesis {kind!r} needs annotator params (pass "
                "ingested weights, or an rng for a random-init smoke run)")
        params = model_def.init(rng, probe)
    if model_def2 is not None and params2 is None:
        if rng is None:
            raise ValueError("sketch_to_normal needs params2 (sketch net)")
        params2 = model_def2.init(jax.random.fold_in(rng, 1), probe)
    return ConditionSynth(kind=kind, model_def=model_def, params=params,
                          model_def2=model_def2, params2=params2)
