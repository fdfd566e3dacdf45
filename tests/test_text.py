"""Whitespace normalization + detokenization goldens (FIXTURES.md F7)."""

import pytest
from hypothesis import given, strategies as st

from post_ocr_corrector_ray.functions.text import (
    detokenize,
    normalize_whitespace,
    normalize_whitespace_vec,
    tokenize_ws,
)

GOLDENS = [
    ("", ""),
    ("abc", "abc"),
    ("  abc", "abc"),                      # leading run dropped
    ("abc  ", "abc "),                     # trailing run collapses to ONE space (not stripped)
    ("a  b", "a b"),
    ("a \t\n b", "a b"),
    ("\t\n  ", ""),                        # all-whitespace → empty
    ("a b", "a b"),                   # NBSP is str.isspace()
    ("a  b", "a b"),             # unicode line/para separators
    ("a　b", "a b"),                   # ideographic space
    ("ћирилица  и  латиница", "ћирилица и латиница"),
    ("x\ny\nz\n", "x y z "),
    (" ​ ", "​ "),               # ZWSP is NOT whitespace (isspace()==False); trailing run → one " "
]


@pytest.mark.parametrize("raw,expected", GOLDENS)
def test_normalize_goldens(raw, expected):
    assert normalize_whitespace(raw) == expected


@pytest.mark.parametrize("raw,expected", GOLDENS)
def test_normalize_vec_matches_scalar(raw, expected):
    assert normalize_whitespace_vec(raw) == expected


@given(st.text(alphabet=st.characters(max_codepoint=0x2FFF), max_size=200))
def test_vec_equals_scalar_property(s):
    assert normalize_whitespace_vec(s) == normalize_whitespace(s)


@given(st.text(max_size=100))
def test_normalize_idempotent_after_strip(s):
    once = normalize_whitespace(s)
    assert normalize_whitespace(once) == once


def test_detokenize():
    # reference to_plain_text.py:16-28: <g/> glues the NEXT token to the previous
    assert detokenize(["Hello", "world"]) == "Hello world"
    assert detokenize(["Hello", "<g/>", ",", "world"]) == "Hello, world"
    assert detokenize(["a", "<g/>", "b", "<g/>", "c"]) == "abc"
    assert detokenize([]) == ""
    assert detokenize(["x", "<g/>"]) == "x"  # dangling joiner ignored


def test_tokenize_ws():
    assert tokenize_ws("  a  b\tc ") == ["a", "b", "c"]
    assert tokenize_ws("   ") == []
