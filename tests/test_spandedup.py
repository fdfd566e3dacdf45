"""Cross-document exact span dedup (stages/spandedup.py): occurrence
extraction vs per-row brute force, and end-to-end keep-one-copy semantics on
crafted corpora.  SQL-oracle parity runs in tests/test_shuffle_and_oracle_parity.py."""

import numpy as np
import pyarrow as pa
import pytest

from post_ocr_corrector_ray.stages import spandedup as sd


def _batch(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _brute_occurrences(texts, ids, k):
    out = set()
    for i, t in zip(ids, texts):
        w = t.split()
        for p in range(len(w) - k + 1):
            out.add((i, p, " ".join(w[p:p + k])))
    return out


def _brute_span_dedup(texts, ids, k):
    """Reference semantics: gram in ≥2 docs → remove all its occurrences
    outside the min-doc_id keeper; coverage is the interval union."""
    occ = {}
    for i, t in zip(ids, texts):
        w = t.split()
        for p in range(len(w) - k + 1):
            occ.setdefault(" ".join(w[p:p + k]), []).append((i, p))
    covered = {i: set() for i in ids}
    for gram, places in occ.items():
        docs = {i for i, _ in places}
        if len(docs) < 2:
            continue
        keeper = min(docs)
        for i, p in places:
            if i != keeper:
                covered[i].update(range(p, p + k))
    out = {}
    for i, t in zip(ids, texts):
        w = t.split()
        kept = [x for j, x in enumerate(w) if j not in covered[i]]
        out[i] = (" ".join(kept), len(w), len(w) - len(kept))
    return out


class TestOccurrences:
    def test_matches_bruteforce(self):
        texts = ["a b c d e f g h i j", "x y z", "", "a b c d e f g h",
                 "q q q q q q q q q"]
        b = _batch(texts)
        t = sd.gram_occurrences_batch(b, k=8)
        got = set(zip(t.column("doc_id").to_pylist(),
                      t.column("pos").to_pylist(),
                      t.column("gram").to_pylist()))
        assert got == _brute_occurrences(texts, range(len(texts)), 8)

    def test_all_short_batch(self):
        t = sd.gram_occurrences_batch(_batch(["a b", "c"]), k=8)
        assert t.num_rows == 0
        assert t.column_names == ["doc_id", "pos", "gram"]


@pytest.mark.usefixtures("ray_session")
class TestSpanDedupE2E:
    def _run(self, texts, ids=None, k=8):
        import ray.data

        ids = list(range(len(texts))) if ids is None else ids
        ds = ray.data.from_arrow(_batch(texts, ids))
        out = sd.span_dedup(ds, k=k, num_partitions=8).to_pandas()
        return {r.doc_id: (r.clean_text, r.n_words, r.n_removed)
                for r in out.itertuples()}

    def test_keep_one_copy(self):
        shared = "one two three four five six seven eight"
        texts = [f"{shared} tail0", f"head1 {shared}", "unique words only here",
                 "sh ort"]
        got = self._run(texts)
        brute = _brute_span_dedup(texts, range(len(texts)), 8)
        assert got == brute
        # keeper (doc 0) intact; doc 1 loses the 8 shared words
        assert got[0][0] == texts[0]
        assert got[1] == ("head1", 9, 8)
        assert got[3] == ("sh ort", 2, 0)   # shorter than k → untouched

    def test_overlapping_spans_union(self):
        # doc 2 shares two OVERLAPPING 8-grams with different keepers; the
        # covered set is the union of both intervals, not double-removed
        a = "w1 w2 w3 w4 w5 w6 w7 w8"
        b = "w2 w3 w4 w5 w6 w7 w8 w9"
        texts = [a, b, "w1 w2 w3 w4 w5 w6 w7 w8 w9"]
        got = self._run(texts)
        assert got == _brute_span_dedup(texts, range(3), 8)
        assert got[2] == ("", 9, 9)

    def test_randomized_matches_bruteforce(self):
        rng = np.random.default_rng(7)
        vocab = [f"t{i}" for i in range(12)]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 30)))
                 for _ in range(40)]
        got = self._run(texts, k=5)
        assert got == _brute_span_dedup(texts, range(len(texts)), 5)


@pytest.mark.usefixtures("ray_session")
class TestHashedGramKeys:
    def test_hashed_equals_string_path(self):
        import ray.data

        rng = np.random.default_rng(11)
        vocab = [f"t{i}" for i in range(15)]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 40)))
                 for _ in range(60)]
        ds = ray.data.from_arrow(_batch(texts, list(range(60))))
        a = sd.span_dedup(ds, k=6, hash_grams=False, num_partitions=8) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        ds = ray.data.from_arrow(_batch(texts, list(range(60))))
        b = sd.span_dedup(ds, k=6, hash_grams=True, num_partitions=8) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)

    def test_hashed_occurrence_rows_are_smaller(self):
        """The point of the hashed key: exchange bytes per occurrence drop
        several-fold (16 bytes of hash vs the full gram string)."""
        texts = [" ".join(f"longword{i:04d}" for i in range(40))
                 for _ in range(20)]
        batch = _batch(texts, list(range(20)))
        s = sd.gram_occurrences_batch(batch, k=8, hash_grams=False)
        h = sd.gram_occurrences_batch(batch, k=8, hash_grams=True)
        assert s.num_rows == h.num_rows
        str_bytes = s.column("gram").nbytes
        hash_bytes = h.column("g_lo").nbytes + h.column("g_hi").nbytes
        assert hash_bytes * 3 < str_bytes   # ≥3x reduction on realistic grams
