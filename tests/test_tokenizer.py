"""CLIP BPE tokenizer tests — real-vocab path via a toy vocab fixture."""

import json

import numpy as np
import pytest

from fgdm_tpu.models.clip import CLIPTokenizer


@pytest.fixture
def vocab_dir(tmp_path):
    # toy byte-level BPE: characters + a few merges building "cat</w>"
    tokens = {}
    idx = 0
    for ch in "abcdefghijklmnopqrstuvwxyz ":
        tokens[ch] = idx
        idx += 1
    for ch in "abcdefghijklmnopqrstuvwxyz":
        tokens[ch + "</w>"] = idx
        idx += 1
    merges = ["c a", "ca t</w>", "d o", "do g</w>"]
    for m in merges:
        merged = m.replace(" ", "")
        if merged not in tokens:
            tokens[merged] = idx
            idx += 1
    with open(tmp_path / "vocab.json", "w") as f:
        json.dump(tokens, f)
    with open(tmp_path / "merges.txt", "w") as f:
        f.write("#version\n" + "\n".join(merges) + "\n")
    return str(tmp_path), tokens


def test_bpe_merges_apply(vocab_dir):
    path, tokens = vocab_dir
    tok = CLIPTokenizer(vocab_dir=path)
    assert tok.has_real_vocab
    ids = tok.encode_text("cat")
    assert ids == [tokens["cat</w>"]]  # both merges applied
    ids = tok.encode_text("dog")
    assert ids == [tokens["dog</w>"]]
    # word without merges falls back to char pieces
    ids = tok.encode_text("ba")
    assert ids == [tokens["b"], tokens["a</w>"]]


def test_padded_batch_layout(vocab_dir):
    path, tokens = vocab_dir
    tok = CLIPTokenizer(vocab_dir=path)
    out = tok(["cat dog", ""])
    assert out.shape == (2, 77)
    assert out[0, 0] == tok.BOT
    assert out[0, 1] == tokens["cat</w>"]
    assert out[0, 2] == tokens["dog</w>"]
    assert out[0, 3] == tok.EOT
    assert (out[0, 4:] == tok.EOT).all()  # EOT padding
    assert out[1, 0] == tok.BOT and out[1, 1] == tok.EOT


def test_truncation(vocab_dir):
    path, _ = vocab_dir
    tok = CLIPTokenizer(vocab_dir=path)
    long = " ".join(["cat"] * 200)
    out = tok([long])
    assert out.shape == (1, 77)
    assert out[0, -1] == tok.EOT  # truncated to max length with final EOT


def test_fallback_without_vocab():
    tok = CLIPTokenizer()
    assert not tok.has_real_vocab
    a = tok(["hello world"])
    b = tok(["hello world"])
    np.testing.assert_array_equal(a, b)  # deterministic
    c = tok(["different prompt"])
    assert not np.array_equal(a, c)


def test_unicode_pretokenization():
    """The exact CLIP \\p{L}/\\p{N} pattern: unicode letters group, digits
    split singly (the old ASCII approximation broke both)."""
    from fgdm_tpu.models.clip import CLIPTokenizer

    tok = CLIPTokenizer()
    words = tok._pat.findall("café 42 naïve")
    assert "café" in words and "naïve" in words
    assert "4" in words and "2" in words and "42" not in words


def test_check_production_fails_without_vocab(monkeypatch):
    from fgdm_tpu.models.clip import CLIPTokenizer

    tok = CLIPTokenizer()
    assert not tok.has_real_vocab
    monkeypatch.delenv("FGDM_ALLOW_HASH_TOKENIZER", raising=False)
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        tok.check_production("test")
    monkeypatch.setenv("FGDM_ALLOW_HASH_TOKENIZER", "1")
    tok.check_production("test")  # override allows it


def test_bpe_id_parity_with_hf_reference(vocab_dir):
    """Oracle: our BPE machinery produces the exact ids the HF
    transformers CLIPTokenizer (the reference implementation the
    checkpoints were trained with) produces from the same vocab/merges
    files — case folding, merge order, and multi-piece words included.
    With the real vocab.json/merges.txt, parity follows from this plus
    file identity."""
    transformers = pytest.importorskip("transformers")

    d, _ = vocab_dir
    hf = transformers.CLIPTokenizer(d + "/vocab.json", d + "/merges.txt")
    ours = CLIPTokenizer(vocab_dir=d)
    prompts = ["a cat and a dog", "cat", "catdog ccat", "Dog CAT",
               "  spaced   out  ", "zzz qqq"]
    got = np.asarray(ours(prompts))
    for row, s in zip(got, prompts):
        want = hf(s, add_special_tokens=False)["input_ids"]
        assert row[0] == ours.BOT
        inner = [int(t) for t in row[1:] if t != ours.EOT]
        assert inner == want, (s, inner, want)
