"""Tokenizer-guard audit (VERDICT r3 #8): every entry point that loads
real model weights must fail LOUD when only the hash-fallback tokenizer is
available (no CLIP vocab) — the fallback yields stable-but-wrong token ids
that silently degrade real-checkpoint output (models/clip.py:160).

Each test monkeypatches the checkpoint loaders to a no-op (the guard fires
before the loaded model is consumed) and asserts SystemExit with the
tokenizer message, then that FGDM_ALLOW_HASH_TOKENIZER=1 unblocks it.
"""

import pytest


@pytest.fixture()
def no_vocab(monkeypatch):
    monkeypatch.delenv("FGDM_CLIP_VOCAB_DIR", raising=False)
    monkeypatch.delenv("FGDM_ALLOW_HASH_TOKENIZER", raising=False)


@pytest.fixture()
def fake_ckpt(tmp_path):
    p = tmp_path / "weights.ckpt"
    p.write_bytes(b"\x00")
    return str(p)


def _assert_tokenizer_exit(excinfo):
    msg = str(excinfo.value)
    assert "vocab" in msg and "tokenizer" in msg.lower(), msg


def test_txt2img_fails_loud_on_hash_fallback(no_vocab, fake_ckpt,
                                             monkeypatch, tmp_path):
    from fgdm_tpu.checkpoint import loader
    from fgdm_tpu.cli import txt2img_fgdm

    monkeypatch.setattr(loader, "load_fgdm",
                        lambda *a, **k: None)
    with pytest.raises(SystemExit) as e:
        txt2img_fgdm.main([
            "--prompt", "a cat", "--ckpt", fake_ckpt,
            "--outdir", str(tmp_path / "out"),
        ])
    _assert_tokenizer_exit(e)


def test_seg2image_fails_loud_on_hash_fallback(no_vocab, fake_ckpt,
                                               monkeypatch, tmp_path):
    from fgdm_tpu.checkpoint import loader
    from fgdm_tpu.cli import seg2image

    monkeypatch.setattr(loader, "load_controlnet",
                        lambda *a, **k: None)
    with pytest.raises(SystemExit) as e:
        seg2image.main([
            "--data_dir", str(tmp_path), "--cn_ckpt", fake_ckpt,
            "--outdir", str(tmp_path / "out"),
        ])
    _assert_tokenizer_exit(e)


def test_eval_scorer_fails_loud_on_hash_fallback(no_vocab, fake_ckpt):
    from types import SimpleNamespace

    from fgdm_tpu.cli.eval import default_scorer_factory

    opt = SimpleNamespace(clip_ckpt=fake_ckpt, vocab_dir=None)
    with pytest.raises(SystemExit) as e:
        default_scorer_factory(opt)
    _assert_tokenizer_exit(e)


def test_server_fails_loud_on_hash_fallback(no_vocab, fake_ckpt,
                                            monkeypatch):
    from fgdm_tpu import server
    from fgdm_tpu.checkpoint import loader

    monkeypatch.setattr(loader, "load_fgdm", lambda *a, **k: None)
    monkeypatch.setattr(loader, "load_controlnet", lambda *a, **k: None)
    with pytest.raises(SystemExit) as e:
        server.main(["--ckpt", fake_ckpt, "--port", "0"])
    _assert_tokenizer_exit(e)


def test_train_guard_is_wired(no_vocab):
    """cli/train.py calls check_production when resuming real weights —
    assert the call site exists (the full train main needs a config tree;
    the guard behavior itself is covered by the tests above)."""
    import inspect

    from fgdm_tpu.cli import train

    src = inspect.getsource(train)
    assert "check_production" in src


def test_override_env_unblocks(no_vocab, fake_ckpt, monkeypatch):
    monkeypatch.setenv("FGDM_ALLOW_HASH_TOKENIZER", "1")
    from fgdm_tpu.models.clip import CLIPTokenizer

    CLIPTokenizer().check_production("guard-test")  # must not raise
