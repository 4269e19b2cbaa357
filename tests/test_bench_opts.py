"""Regression tests for bench.py's compiler-option spec parser.

ADVICE r3: a trailing-equals entry like ``key=`` must behave like a bare
key (boolean "true"), not an empty-string value — the axon remote compile
service rejects empty values with an opaque HTTP 500.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import parse_compiler_options  # noqa: E402


def test_key_value_pairs():
    assert parse_compiler_options(
        "xla_tpu_scoped_vmem_limit_kib=98304,foo=bar"
    ) == {"xla_tpu_scoped_vmem_limit_kib": "98304", "foo": "bar"}


def test_bare_key_is_boolean_true():
    assert parse_compiler_options("xla_enable_thing") == {
        "xla_enable_thing": "true"}


def test_trailing_equals_is_boolean_true():
    # the ADVICE r3 case: 'key=' must not map to an empty string
    assert parse_compiler_options("xla_enable_thing=") == {
        "xla_enable_thing": "true"}


def test_whitespace_and_empty_entries():
    assert parse_compiler_options(" a = 1 , , b , c= ") == {
        "a": "1", "b": "true", "c": "true"}


def test_empty_spec():
    assert parse_compiler_options("") == {}
