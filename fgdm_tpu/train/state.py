"""Train state: optimizer, EMA shadow, trainable-parameter partitioning.

Reference semantics carried over:
* adapter-only finetuning — ``freeze_backbone`` trains only params whose
  path contains ``'adapter'`` (or an extra ``optim_key``)
  (`/root/reference/ldm/models/diffusion/ddpm.py:1601-1618`).  Implemented as
  a real partition: ``jax.grad`` differentiates only the trainable subtree,
  so frozen-weight gradients are never materialized (the torch version still
  allocates them).
* EMA — per-param shadow with warmup decay
  ``min(decay, (1+updates)/(10+updates))`` (`ldm/modules/ema.py:5-25`),
  plus store/copy_to/restore equivalents via pure functions.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct, traverse_util


def partition_params(
    params: Any, trainable_filter: Callable[[str], bool]
) -> Tuple[Dict, Dict]:
    """Split a flax param tree into (trainable, frozen) flat dicts keyed by
    '/'-joined paths."""
    flat = traverse_util.flatten_dict(params, sep="/")
    train = {k: v for k, v in flat.items() if trainable_filter(k)}
    frozen = {k: v for k, v in flat.items() if not trainable_filter(k)}
    return train, frozen


def merge_params(train: Dict, frozen: Dict) -> Any:
    flat = dict(frozen)
    flat.update(train)
    return traverse_util.unflatten_dict(flat, sep="/")


def adapter_filter(optim_key: str = "adapter") -> Callable[[str], bool]:
    """freeze_backbone rule: train params whose path mentions 'adapter' or
    ``optim_key`` (ddpm.py:1611-1616)."""

    def f(path: str) -> bool:
        return "adapter" in path or optim_key in path

    return f


def randomize_zero_heads(params: Any, scale: float = 0.02) -> Any:
    """Replace zero-initialized kernels (zero convs / output heads) with
    small deterministic noise.

    Scratch-init smoke runs of the adapter-only / control recipes need this:
    with a frozen backbone, a zero-init output conv blocks every upstream
    gradient (d loss/d h = W_outᵀ g = 0), so the trainable branch would see
    exactly zero gradients.  In production these weights come from a
    released SD checkpoint (the reference assumes one, `cldm.py:924-931`).
    Keys derive from crc32 of the tree path — str ``hash()`` is salted per
    process, and checkpoint roundtrips compare across processes."""
    import zlib

    def f(path, p):
        # zero-test on device (scalar bool readback) — np.asarray would pull
        # the full multi-GB tree through the tunnel
        if p.ndim >= 2 and bool(jnp.all(p == 0)):
            k = jax.random.PRNGKey(zlib.crc32(str(path).encode()) % 2**31)
            return jax.random.normal(k, p.shape, p.dtype) * scale
        return p

    return jax.tree_util.tree_map_with_path(f, params)


def joint_image_adapter_filter() -> Callable[[str], bool]:
    """AdaptDiffusion freeze rule (`ddpm.py:1866-1870`): joint training
    optimizes only the image factor's adapter (+ the condition→adapter
    channel mapper); both UNet backbones stay frozen."""

    def f(path: str) -> bool:
        return ("unet1/adapter" in path) or ("channel_mapper" in path)

    return f


@struct.dataclass
class EmaState:
    decay: float = struct.field(pytree_node=False)
    num_updates: jnp.ndarray = None
    shadow: Any = None

    @staticmethod
    def create(params: Any, decay: float = 0.9999) -> "EmaState":
        return EmaState(
            decay=decay,
            num_updates=jnp.zeros((), jnp.int32),
            # real copies — donation would otherwise see aliased buffers
            shadow=jax.tree.map(jnp.copy, params),
        )

    def update(self, params: Any) -> "EmaState":
        n = self.num_updates + 1
        decay = jnp.minimum(self.decay, (1.0 + n) / (10.0 + n))
        one_minus = 1.0 - decay
        shadow = jax.tree.map(
            lambda s, p: s - one_minus * (s - p.astype(s.dtype)),
            self.shadow,
            params,
        )
        return self.replace(num_updates=n, shadow=shadow)


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any                      # trainable partition (flat dict)
    frozen: Any                      # frozen partition (flat dict)
    opt_state: Any
    ema: Optional[EmaState]
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @property
    def full_params(self) -> Any:
        return merge_params(self.params, self.frozen)

    def apply_gradients(self, grads: Any) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema.update(new_params) if self.ema is not None else None
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema=new_ema,
        )

    def ema_full_params(self) -> Any:
        """Params with the EMA shadow swapped in (LitEma copy_to)."""
        if self.ema is None:
            return self.full_params
        return merge_params(self.ema.shadow, self.frozen)

    @staticmethod
    def create(
        params: Any,
        tx: optax.GradientTransformation,
        trainable_filter: Optional[Callable[[str], bool]] = None,
        use_ema: bool = False,
        ema_decay: float = 0.9999,
    ) -> "TrainState":
        if trainable_filter is None:
            trainable_filter = lambda path: True
        train, frozen = partition_params(params, trainable_filter)
        # TrainState owns its buffers: the train step donates the whole
        # state, so aliasing the caller's param arrays would delete them.
        train = jax.tree.map(jnp.copy, train)
        frozen = jax.tree.map(jnp.copy, frozen)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=train,
            frozen=frozen,
            opt_state=tx.init(train),
            ema=EmaState.create(train, ema_decay) if use_ema else None,
            tx=tx,
        )


def state_to_pytree(state: TrainState, include_frozen: bool = True) -> Dict:
    """Serializable view of the full train state (params + opt state + EMA +
    step), the faithful-resume contract (reference Lightning ckpts carry the
    optimizer + EMA too, main.py:594-676)."""
    tree = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    if include_frozen:
        tree["frozen"] = state.frozen
    if state.ema is not None:
        tree["ema"] = {"shadow": state.ema.shadow,
                       "num_updates": state.ema.num_updates}
    return tree


def state_from_pytree(state: TrainState, tree: Dict) -> TrainState:
    """Rebuild a TrainState from ``state_to_pytree`` output, using ``state``
    (a freshly created one) for structure and anything not saved."""
    ema = state.ema
    if ema is not None and "ema" in tree:
        ema = ema.replace(shadow=tree["ema"]["shadow"],
                          num_updates=tree["ema"]["num_updates"])
    return state.replace(
        step=tree["step"],
        params=tree["params"],
        frozen=tree.get("frozen", state.frozen),
        opt_state=tree["opt_state"],
        ema=ema,
    )


def make_adamw(
    lr: float,
    schedule_fn: Optional[Callable] = None,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: Optional[float] = None,
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW matching torch defaults (reference uses torch AdamW with its
    default wd 0.01, ddpm.py:1618), with optional LambdaLR-style multiplier
    schedule, gradient clipping, and gradient accumulation."""
    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if schedule_fn is not None:
        lr_fn = lambda step: lr * schedule_fn(step)
    else:
        lr_fn = lr
    parts.append(optax.adamw(lr_fn, b1=b1, b2=b2, eps=1e-8,
                             weight_decay=weight_decay))
    tx = optax.chain(*parts)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx
