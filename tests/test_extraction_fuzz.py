"""Extractor robustness: arbitrary bytes must never raise — only statuses."""

from hypothesis import given, settings, strategies as st

from post_ocr_corrector_ray.functions.extraction import extract_page

VALID_STATUSES = {"ok", "empty", "no_content", "pdf_ok", "pdf_undecodable", "decode_error"}


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_random_bytes_never_raise(payload):
    res = extract_page(payload)
    assert res.status in VALID_STATUSES
    assert isinstance(res.text, str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_random_text_as_html_never_raises(html):
    res = extract_page(html.encode("utf-8"))
    assert res.status in VALID_STATUSES


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300))
def test_pdf_prefixed_garbage(payload):
    res = extract_page(b"%PDF-" + payload)
    assert res.status in ("pdf_ok", "pdf_undecodable")
