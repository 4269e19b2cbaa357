"""Hardware validation: joint-factor + ControlNet-finetune recipes on real data.

Runs the two training recipes the seg-distill CLI run doesn't cover — the
AdaptDiffusion joint image-adapter step (`train/joint.py`, reference
`ldm/models/diffusion/ddpm.py:1851-1927`) and the ControlLDM fine-tune step
(`train/control.py`, reference `controlnet/cldm/cldm.py:924-931`) — at full
model size on one chip, fed by the real COCO loader (worker threads, colorize,
captions, tokenizer), with checkpoint save → restore → continue.

    python tools/hw_validate_recipes.py control   # 512² ControlLDM, sd_locked
    python tools/hw_validate_recipes.py joint     # 256² SeqTwoUNet image-adapter

Env: FGDM_COCO_DIR (default /tmp/fgdm_coco), FGDM_HW_STEPS (default 12),
FGDM_HW_BATCH (default 2 control / 4 joint).  Emits one JSON line with the
loss curve and writes metrics JSONL + checkpoints under logs/hw_<recipe>/.
"""

import json
import os
import shutil
import sys
import time

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")

import jax  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECIPE = sys.argv[1] if len(sys.argv) > 1 else "control"
COCO = os.environ.get("FGDM_COCO_DIR", "/tmp/fgdm_coco")
STEPS = int(os.environ.get("FGDM_HW_STEPS", "12"))


from fgdm_tpu.train.state import randomize_zero_heads as _randomize_zero_heads  # noqa: E402


def _loader(image_size, batch, use_rgb):
    from fgdm_tpu.data.dataset import load_data
    from fgdm_tpu.data.prefetch import ParallelBatchLoader
    from fgdm_tpu.models.clip import CLIPTokenizer

    ds = load_data("coco", COCO, image_size, use_rgb=use_rgb,
                   use_ade_colormap=True)
    return ParallelBatchLoader(ds, batch, tokenizer=CLIPTokenizer(), seed=0,
                               num_workers=4, prefetch_batches=4)


def _ckpt_roundtrip(mgr, state, step):
    """Save, restore host-side, verify param equality; continue with the
    (identical) original state.  Restoring a second full device copy next
    to the live state OOMs HBM at full model size (observed: control
    recipe, RESOURCE_EXHAUSTED in batched_device_put during restore), so
    the restored tree stays in host numpy — restore-to-device is covered
    at tiny scale by tests/test_train_cli.py resume."""
    from fgdm_tpu.train.state import state_to_pytree

    tree = state_to_pytree(state)
    saved = mgr.save(step, tree, force=True)
    assert saved, f"step {step} already exists — stale checkpoint dir?"
    mgr.wait()
    restored = mgr.restore_host(template=tree)    # host numpy, no device_put
    live = jax.tree.leaves(state.params)
    back = jax.tree.leaves(restored["params"])
    assert len(live) == len(back), (len(live), len(back))
    for i in range(0, len(live), max(1, len(live) // 12)):
        assert np.allclose(np.asarray(live[i]), np.asarray(back[i])), \
            f"ckpt mismatch at leaf {i}"
    return state


def run_control():
    """Full-size ControlLDM (SD UNet + ControlNet) sd_locked fine-tune at
    512²: target = COCO RGB, hint = colorized seg in [0,1]."""
    from fgdm_tpu.checkpoint.orbax_io import CheckpointManager
    from fgdm_tpu.diffusion.control import ControlLDM
    from fgdm_tpu.models.autoencoder import AutoencoderKL
    from fgdm_tpu.models.clip import CLIPTextEncoder
    from fgdm_tpu.models.controlnet import ControlNet
    from fgdm_tpu.models.unet import UNetModel
    from fgdm_tpu.train.control import (control_filter, control_param_tree,
                                        make_control_train_step)
    from fgdm_tpu.train.state import TrainState, make_adamw

    batch_size = int(os.environ.get("FGDM_HW_BATCH", "2"))
    dtype = jnp.bfloat16
    unet = UNetModel(dtype=dtype, use_adapter=False, remat=True,
                     fused_norm_silu=True)
    cldm = ControlLDM.create_control(
        unet, AutoencoderKL(dtype=dtype, fused_norm=True),
        CLIPTextEncoder(dtype=dtype), ControlNet(dtype=dtype, fused_norm_silu=True),
        jax.random.PRNGKey(0), latent_size=64)
    # backbone only: the ControlNet's 13 zero convs start at true zero, as in
    # the reference — they get nonzero grads themselves (upstream x input)
    # once the backbone's out head is nonzero
    cldm = cldm.replace(unet_params=_randomize_zero_heads(cldm.unet_params))
    tx = make_adamw(1e-5)
    state = TrainState.create(control_param_tree(cldm), tx,
                              trainable_filter=control_filter(sd_locked=True))
    step_fn = make_control_train_step(cldm)

    logdir = "logs/hw_control"
    os.makedirs(logdir, exist_ok=True)
    shutil.rmtree(os.path.join(logdir, "checkpoints"), ignore_errors=True)
    mgr = CheckpointManager(os.path.join(logdir, "checkpoints"), keep=2,
                            save_interval_steps=10_000)
    loader = _loader(512, batch_size, use_rgb=True)
    losses, t0 = [], time.time()
    metrics_f = open(os.path.join(logdir, "metrics.jsonl"), "w")
    rng = jax.random.PRNGKey(1)
    it = iter(loader)
    for step in range(STEPS):
        b = next(it)
        dev = {"image": jnp.asarray(b["rgb"]),
               "hint": jnp.asarray((b["image"] + 1.0) * 0.5),
               "input_ids": jnp.asarray(b["input_ids"])}
        rng, k = jax.random.split(rng)
        state, m = step_fn(state, dev, k)
        row = {k_: float(v) for k_, v in m.items()}
        row["step"] = step
        losses.append(row["loss"])
        metrics_f.write(json.dumps(row) + "\n")
        metrics_f.flush()
        if step == 0:
            print(f"[control] compile+first step {time.time() - t0:.1f}s",
                  file=sys.stderr)
    it.close()
    state = _ckpt_roundtrip(mgr, state, STEPS)
    # continue for 2 steps from the restored state
    loader = _loader(512, batch_size, use_rgb=True)
    it = iter(loader)
    for step in range(2):
        b = next(it)
        dev = {"image": jnp.asarray(b["rgb"]),
               "hint": jnp.asarray((b["image"] + 1.0) * 0.5),
               "input_ids": jnp.asarray(b["input_ids"])}
        rng, k = jax.random.split(rng)
        state, m = step_fn(state, dev, k)
        losses.append(float(m["loss"]))
    it.close()
    metrics_f.close()
    return {"recipe": "control", "batch": batch_size, "res": 512,
            "steps": len(losses), "losses": [round(l, 4) for l in losses],
            "wall_s": round(time.time() - t0, 1)}


def run_joint():
    """Full-size SeqTwoUNet(image_adapter=True) joint step at 256²: latents
    are channel-stacked VAE encodes of (RGB image, colorized seg)."""
    from fgdm_tpu.checkpoint.orbax_io import CheckpointManager
    from fgdm_tpu.core.schedules import DiffusionSchedule
    from fgdm_tpu.models.autoencoder import AutoencoderKL
    from fgdm_tpu.models.clip import CLIPTextEncoder
    from fgdm_tpu.models.seq_two_unet import SeqTwoUNet
    from fgdm_tpu.train.joint import make_joint_train_step
    from fgdm_tpu.train.state import (TrainState, joint_image_adapter_filter,
                                      make_adamw)

    batch_size = int(os.environ.get("FGDM_HW_BATCH", "4"))
    dtype = jnp.bfloat16
    model = SeqTwoUNet(dtype=dtype, image_adapter=True, remat=True)
    x = jnp.zeros((1, 32, 32, 8))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 768))
    params = _randomize_zero_heads(model.init(jax.random.PRNGKey(0), x, t, ctx))
    sched = DiffusionSchedule.create(1000, "linear", linear_start=0.00085,
                                     linear_end=0.0120)
    tx = make_adamw(1e-5)
    state = TrainState.create(params, tx,
                              trainable_filter=joint_image_adapter_filter())
    step_fn = make_joint_train_step(model, sched)

    vae = AutoencoderKL(dtype=dtype, fused_norm=True)
    vae_params = vae.init(jax.random.PRNGKey(2),
                          jnp.zeros((1, 256, 256, 3)), jax.random.PRNGKey(3))
    clip = CLIPTextEncoder(dtype=dtype)
    clip_params = clip.init(jax.random.PRNGKey(4),
                            jnp.zeros((1, 77), jnp.int32))

    @jax.jit
    def encode(vp, cp, rgb, seg, ids, k):
        k1, k2 = jax.random.split(k)
        z_img = vae.apply(vp, rgb, method=AutoencoderKL.encode).sample(k1)
        z_cond = vae.apply(vp, seg, method=AutoencoderKL.encode).sample(k2)
        z_img, z_cond = 0.18215 * z_img, 0.18215 * z_cond
        return (jnp.concatenate([z_img, z_cond], axis=-1),
                clip.apply(cp, ids))

    logdir = "logs/hw_joint"
    os.makedirs(logdir, exist_ok=True)
    shutil.rmtree(os.path.join(logdir, "checkpoints"), ignore_errors=True)
    mgr = CheckpointManager(os.path.join(logdir, "checkpoints"), keep=2,
                            save_interval_steps=10_000)
    loader = _loader(256, batch_size, use_rgb=True)
    losses, t0 = [], time.time()
    metrics_f = open(os.path.join(logdir, "metrics.jsonl"), "w")
    rng = jax.random.PRNGKey(1)
    it = iter(loader)
    for step in range(STEPS + 2):
        b = next(it)
        rng, ke, ks = jax.random.split(rng, 3)
        lat, context = encode(vae_params, clip_params,
                              jnp.asarray(b["rgb"]), jnp.asarray(b["image"]),
                              jnp.asarray(b["input_ids"]), ke)
        state, m = step_fn(state, {"latent": lat, "context": context}, ks)
        row = {k_: float(v) for k_, v in m.items()}
        row["step"] = step
        losses.append(row["train/loss"])
        metrics_f.write(json.dumps(row) + "\n")
        metrics_f.flush()
        if step == 0:
            print(f"[joint] compile+first step {time.time() - t0:.1f}s",
                  file=sys.stderr)
        if step == STEPS - 1:
            state = _ckpt_roundtrip(mgr, state, step)
    it.close()
    metrics_f.close()
    return {"recipe": "joint", "batch": batch_size, "res": 256,
            "steps": len(losses), "losses": [round(l, 4) for l in losses],
            "wall_s": round(time.time() - t0, 1)}


if __name__ == "__main__":
    out = run_control() if RECIPE == "control" else run_joint()
    print(json.dumps(out))
