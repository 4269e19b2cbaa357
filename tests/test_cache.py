"""Persistent compile-cache wiring (`fgdm_tpu/utils/cache.py`)."""

import jax
import pytest

from fgdm_tpu.utils.cache import DEFAULT_CACHE_DIR, enable_persistent_cache


@pytest.fixture(autouse=True)
def _restore_cache_config():
    before = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", before)


def test_explicit_dir_wins(tmp_path, monkeypatch):
    monkeypatch.setenv("FGDM_CACHE_DIR", str(tmp_path / "env"))
    got = enable_persistent_cache(str(tmp_path / "arg"))
    assert got == str(tmp_path / "arg")
    assert jax.config.jax_compilation_cache_dir == got


def test_env_dir_and_default(tmp_path, monkeypatch):
    monkeypatch.setenv("FGDM_CACHE_DIR", str(tmp_path / "env"))
    assert enable_persistent_cache() == str(tmp_path / "env")
    monkeypatch.delenv("FGDM_CACHE_DIR")
    assert enable_persistent_cache() == DEFAULT_CACHE_DIR


def test_off_disables(monkeypatch):
    monkeypatch.setenv("FGDM_CACHE_DIR", "off")
    before = jax.config.jax_compilation_cache_dir
    assert enable_persistent_cache() == ""
    assert jax.config.jax_compilation_cache_dir == before


def test_failure_warns_not_silent(monkeypatch, tmp_path):
    """A failed config.update must warn (the cold-compile wall is the whole
    point of the module), not silently return ''."""
    def boom(name, value):
        raise RuntimeError("no such config")

    monkeypatch.setattr(jax.config, "update", boom)
    with pytest.warns(UserWarning, match="cold compile"):
        assert enable_persistent_cache(str(tmp_path)) == ""
