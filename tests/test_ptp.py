"""Prompt-to-prompt editing tests: seq alignment, controllers, sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.models.autoencoder import AutoencoderKL
from fgdm_tpu.models.clip import CLIPTextEncoder, CLIPTokenizer
from fgdm_tpu.models.unet import UNetModel
from fgdm_tpu.sampling.ptp_sampler import ptp_sample
from fgdm_tpu.utils import seq_aligner
from fgdm_tpu.utils.ptp import (
    EditController,
    LocalBlend,
    get_equalizer,
    get_time_words_attention_alpha,
    make_controller,
)

TOK = CLIPTokenizer()


def test_alignment_identity():
    ids = [1, 5, 9, 2]
    m = seq_aligner.aligned_mapper(ids, ids)
    np.testing.assert_array_equal(m[:, 0], m[:, 1])


def test_alignment_insertion():
    x = [1, 5, 2]
    y = [1, 7, 5, 2]  # word inserted at position 1
    m = seq_aligner.aligned_mapper(x, y)
    d = dict(m.tolist())
    assert d[0] == 0 and d[2] == 1 and d[3] == 2  # shifted mapping
    assert d[1] == -1  # inserted token has no source


def test_refinement_mapper_shapes():
    prompts = ["a cat on a mat", "a fluffy cat on a mat"]
    mappers, alphas = seq_aligner.get_refinement_mapper(prompts, TOK)
    assert mappers.shape == (1, 77) and alphas.shape == (1, 77)
    assert set(np.unique(alphas)) <= {0.0, 1.0}
    assert (alphas == 0).sum() >= 1  # the inserted word


def test_replacement_mapper():
    prompts = ["a cat on a mat", "a dog on a mat"]
    m = seq_aligner.get_replacement_mapper(prompts, TOK)
    assert m.shape == (1, 77, 77)
    # row sums 1 (soft permutation)
    np.testing.assert_allclose(m[0].sum(-1)[:20], 1.0, atol=1e-6)


def test_equalizer():
    eq = get_equalizer("a red car", "red", [2.0, 0.5], TOK)
    assert eq.shape == (2, 77)
    assert 2.0 in eq[0] and 0.5 in eq[1]


def test_time_words_alpha():
    a = get_time_words_attention_alpha(["a cat", "a dog"], 10, 0.5, TOK)
    assert a.shape == (11, 1, 1, 1, 77)
    assert a[0].max() == 1.0 and a[9].max() == 0.0  # on until 50% of steps


@pytest.mark.parametrize("kind", ["replace", "refine", "reweight"])
def test_controller_edit_shapes(kind):
    prompts = ["a cat on a mat", "a dog on a mat"]
    eq = get_equalizer(prompts[1], "dog", [2.0], TOK) if kind == "reweight" \
        else None
    ctl = make_controller(prompts, TOK, num_steps=10, kind=kind,
                          equalizer=eq, cfg_doubled=True)
    editor = ctl.editor(jnp.asarray(2))
    probs_cross = jnp.ones((4, 2, 64, 77)) / 77  # [2P, h, N, 77]
    out = editor(probs_cross, True, "down")
    assert out.shape == probs_cross.shape
    probs_self = jnp.ones((4, 2, 64, 64)) / 64
    out = editor(probs_self, False, "down")
    assert out.shape == probs_self.shape
    # uncond half untouched
    np.testing.assert_array_equal(np.asarray(out[:2]),
                                  np.asarray(probs_self[:2]))


def test_ptp_sample_end_to_end():
    kw = dict(model_channels=32, num_heads=4, context_dim=64,
              channel_mult=(1, 2), attention_resolutions=(1, 2),
              num_res_blocks=1, dtype=jnp.float32)
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        resolution=32, dtype=jnp.float32)
    clip = CLIPTextEncoder(vocab_size=49408, embed_dim=64, num_layers=2,
                           num_heads=4)
    ld = LatentDiffusion.create(UNetModel(**kw), vae, clip,
                                jax.random.PRNGKey(0), latent_size=16)
    prompts = ["a cat on a mat", "a dog on a mat"]
    ids = jnp.asarray(TOK(prompts))
    uc_ids = jnp.asarray(TOK(["", ""]))
    ctx = ld.get_learned_conditioning(ids)
    uc = ld.get_learned_conditioning(uc_ids)
    ctl = make_controller(prompts, TOK, num_steps=3, kind="refine")
    lb = LocalBlend.create(prompts, [["cat"], ["dog"]], TOK)
    out = ptp_sample(ld, ctl, jax.random.PRNGKey(1), ctx, uc,
                     latent_hw=(16, 16), num_steps=3, local_blend=lb)
    assert out.shape == (2, 16, 16, 4)
    assert np.all(np.isfinite(np.asarray(out)))
