"""HTML/PDF extraction tests against constructive synthetic goldens."""

import numpy as np
import pytest

from post_ocr_corrector_ray.functions.extraction import extract_page, extract_pdf_text
from post_ocr_corrector_ray.sources.synth import gen_page, pages_batch


class TestSynthGoldens:
    @pytest.mark.parametrize("i", list(range(0, 400, 7)))
    def test_extraction_recovers_known_main_content(self, i):
        p = gen_page(i)
        if p["kind"] in ("text_only", "ws_text"):
            pytest.skip("no html payload")
        res = extract_page(p["html"])
        assert res.text == p["expected_text"]

    def test_kind_mix_includes_edges(self):
        kinds = {gen_page(i)["kind"] for i in range(600)}
        assert {"html", "html_big", "html_boiler", "html_empty", "pdf",
                "text_only", "ws_text"} <= kinds

    def test_generation_is_order_independent(self):
        a = gen_page(123)
        b = gen_page(123)
        assert a == b
        t = pages_batch(np.array([123]))
        assert t.column("url")[0].as_py() == a["url"]


class TestHtmlHeuristics:
    def test_empty_and_none(self):
        assert extract_page(None).status == "empty"
        assert extract_page(b"").status == "empty"

    def test_boilerplate_stripped(self):
        html = b"""<html><body>
        <nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li></ul></nav>
        <p>This paragraph has plenty of real sentence content to keep around here.</p>
        <div class="sidebar"><a href="/x">link one</a> <a href="/y">link two</a></div>
        <footer><p>All rights reserved by somebody somewhere.</p></footer>
        </body></html>"""
        res = extract_page(html)
        assert res.text == "This paragraph has plenty of real sentence content to keep around here."
        assert res.status == "ok"

    def test_link_density_drops_nav_block(self):
        html = (b'<html><body><p><a href="/1">one long link text here</a> '
                b'<a href="/2">another long link text</a></p>'
                b"<p>Normal prose paragraph with enough characters and words to stay.</p>"
                b"</body></html>")
        assert extract_page(html).text == \
            "Normal prose paragraph with enough characters and words to stay."

    def test_script_style_pruned(self):
        html = (b"<html><body><script>var padding = 'not content at all here';</script>"
                b"<p>Visible paragraph content that is long enough to be kept today.</p>"
                b"</body></html>")
        assert "padding" not in extract_page(html).text

    def test_entities_decoded(self):
        html = (b"<html><body><p>Fish &amp; chips &lt;3 is a fairly good meal idea "
                b"for everyone involved.</p></body></html>")
        assert "Fish & chips <3" in extract_page(html).text

    def test_whitespace_normalized(self):
        html = (b"<html><body><p>spaced   out\n\n\ttext needing normalization "
                b"across multiple breaks here</p></body></html>")
        assert "  " not in extract_page(html).text

    def test_title_captured_not_in_text(self):
        p = gen_page(0)
        res = extract_page(p["html"])
        assert res.title == "synth page"
        assert "synth page" not in res.text

    def test_malformed_html_tolerated(self):
        html = b"<html><body><p>Unclosed paragraph with plenty of words to keep it around"
        res = extract_page(html)
        assert "Unclosed paragraph" in res.text

    def test_heading_kept_linky_heading_dropped(self):
        html = (b"<html><body><h1>Clean heading words</h1>"
                b'<h2><a href="/x">linked heading</a></h2>'
                b"<p>Body paragraph containing sufficient words to clear thresholds now.</p>"
                b"</body></html>")
        res = extract_page(html)
        assert res.text.startswith("Clean heading words")
        assert "linked heading" not in res.text


class TestPdf:
    def test_simple_tj(self):
        pdf = b"%PDF-1.4\nstream\nBT (Hello) Tj (world) Tj ET\nendstream\n%%EOF"
        assert extract_page(pdf).text == "Hello world"

    def test_tj_array(self):
        pdf = b"%PDF-1.4\nstream\nBT [(Hel) (lo)] TJ ET\nendstream\n%%EOF"
        assert extract_page(pdf).text == "Hello"

    def test_escapes(self):
        pdf = rb"%PDF-1.4\nstream\nBT (a\(b\)c \\ d) Tj ET\nendstream\n%%EOF".replace(rb"\n", b"\n")
        assert extract_page(pdf).text == "a(b)c \\ d"

    def test_flate_stream(self):
        import zlib

        inner = b"BT (compressed text content) Tj ET"
        pdf = b"%PDF-1.4\nstream\n" + zlib.compress(inner) + b"\nendstream\n%%EOF"
        assert extract_page(pdf).text == "compressed text content"

    def test_undecodable(self):
        pdf = b"%PDF-1.4\nstream\n\x00\x01\x02\nendstream\n%%EOF"
        res = extract_page(pdf)
        assert res.status == "pdf_undecodable" and res.text == ""


class TestPartitionHash:
    def test_vectorized_polyhash_equals_scalar(self):
        import pyarrow as pa

        from post_ocr_corrector_ray.functions.hashing import (
            partition_of, partition_of_array, polyhash_u64, polyhash_u64_array)

        strs = ["", "a", "ab", "https://example.com/x?q=1", "ünïcødé-",
                "x" * 500, "\x00\x01", "https://synth.example/d7/page-7",
                "тест-кирилица", "日本語のページ"]
        arr = pa.array(strs, pa.string())
        vec = polyhash_u64_array(arr)
        for i, s in enumerate(strs):
            assert int(vec[i]) == polyhash_u64(s.encode("utf-8")), s
        parts = partition_of_array(arr, 16)
        assert [int(p) for p in parts] == [partition_of(s, 16) for s in strs]

    def test_sliced_array_hashes_identically(self):
        import pyarrow as pa

        from post_ocr_corrector_ray.functions.hashing import polyhash_u64_array

        arr = pa.array(["aa", "bb", "cc", "dd"], pa.string())
        assert polyhash_u64_array(arr.slice(1, 2)).tolist() == \
            polyhash_u64_array(pa.array(["bb", "cc"])).tolist()
