"""Training-corpus preparation ops (stages/corpusprep.py): vectorized
repetition stats / contamination / familiarity vs per-row brute-force
references, plus the temperature-weight invariants.  SQL-oracle parity runs
in tests/test_shuffle_and_oracle_parity.py and the driver gate."""

import numpy as np
import pyarrow as pa
import pytest

from post_ocr_corrector_ray.stages import corpusprep as cp

TEXTS = [
    "a a a",                      # all-dup doc
    "a b c d",                    # no repetition
    "",                           # empty
    "x",                          # single word
    "a b a b a",                  # repeating 2-grams
    "  spaced   out  words  ",    # whitespace runs
    "one two three four five six one two three four five six",  # dup 5-grams
]


def _batch(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _brute_repetition(text):
    w = text.split()
    nw = len(w)
    if nw == 0:
        return (0, 0.0, 0.0, 0, 0.0)
    from collections import Counter

    c = Counter(w)
    dup_word = (nw - len(c)) / nw
    top_word = max(c.values()) / nw
    grams = [" ".join(w[i:i + 2]) for i in range(nw - 1)]
    n2 = len(grams)
    dup2 = (n2 - len(set(grams))) / n2 if n2 else 0.0
    return (nw, dup_word, top_word, n2, dup2)


class TestRepetitionStats:
    def test_matches_bruteforce(self):
        out = cp.repetition_stats_batch(_batch(TEXTS)).to_pydict()
        for i, t in enumerate(TEXTS):
            nw, dw, tw, n2, d2 = _brute_repetition(t)
            assert out["n_words"][i] == nw, t
            assert out["dup_word_frac"][i] == dw, t
            assert out["top_word_frac"][i] == tw, t
            assert out["n_2grams"][i] == n2, t
            assert out["dup_2gram_frac"][i] == d2, t

    def test_empty_batch(self):
        out = cp.repetition_stats_batch(_batch([]))
        assert out.num_rows == 0

    def test_single_row_all_dup(self):
        out = cp.repetition_stats_batch(_batch(["z z z z"])).to_pydict()
        assert out["dup_word_frac"] == [0.75]
        assert out["top_word_frac"] == [1.0]
        assert out["dup_2gram_frac"] == [2 / 3]


class TestWordGrams:
    def test_distinct_and_short_convention(self):
        texts = pa.array(["a b c d e f", "a b", "", "g h i j k",
                          "a b c d e a b c d e"])
        grams, rows = cp.word_grams_per_row(texts, 5)
        got = {}
        for g, r in zip(grams.to_pylist(), rows.tolist()):
            got.setdefault(r, set()).add(g)
        assert got[0] == {"a b c d e", "b c d e f"}
        assert got[1] == {"a b"}            # short doc → whole text
        assert got[2] == {""}               # empty doc → empty gram
        assert got[3] == {"g h i j k"}
        # 6 grams, but the first and last are both "a b c d e" → 5 distinct
        assert "a b c d e" in got[4] and len(got[4]) == 5

    def test_gram_strings_match_python(self):
        texts = pa.array(["the quick brown fox jumps over the lazy dog"])
        grams, rows = cp.word_grams_per_row(texts, 3)
        w = texts[0].as_py().split()
        want = {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        assert set(grams.to_pylist()) == want


@pytest.mark.usefixtures("ray_session")
class TestBroadcastStages:
    def test_contamination_stage(self):
        import ray

        bench = pa.array(sorted({"a b c d e", "one two three four five"}))
        stage = cp.ContaminationStage(ray.put(bench), n_gram=5)
        out = stage(_batch(["a b c d e f",      # 1 of 2 grams hit
                            "zz yy xx ww vv",   # no hits
                            "a b"])).to_pydict()  # short doc, no hit
        assert out["n_grams"] == [2, 1, 1]
        assert out["n_hit"] == [1, 0, 0]
        assert out["hit_frac"] == [0.5, 0.0, 0.0]

    def test_familiarity_stage(self):
        import ray

        vocab = (pa.array(["alpha", "beta"]),
                 np.array([10, 4], dtype=np.int64))
        stage = cp.FamiliarityStage(ray.put(vocab))
        out = stage(_batch(["alpha beta gamma", "", "gamma gamma"])).to_pydict()
        assert out["n_tokens"] == [3, 0, 2]
        assert out["n_oov"] == [1, 0, 2]
        assert out["mean_train_freq"] == [14 / 3, 0.0, 0.0]


@pytest.mark.usefixtures("ray_session")
class TestContaminationJoined:
    def test_matches_broadcast_path(self):
        """The gram-exchange scale twin must produce exactly the broadcast
        path's rows (same contract, same oracle)."""
        import ray

        from post_ocr_corrector_ray.pipelines.documents import (
            doc_contamination, doc_contamination_joined)

        sf = "/root/testdata/sf0.001"
        a = doc_contamination(sf).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        b = doc_contamination_joined(sf).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        import pandas as pd

        pd.testing.assert_frame_equal(a[sorted(a.columns)],
                                      b[sorted(b.columns)],
                                      check_dtype=False)


class TestTemperatureWeights:
    def test_sums_to_one_and_flattens(self):
        w = cp.temperature_weights({"en": 400, "de": 100}, alpha=0.5)
        assert abs(sum(w.values()) - 1.0) < 1e-12
        # temperature flattening: per-group ratio is sqrt(4)=2, not 4
        assert abs(w["en"] / w["de"] - 2.0) < 1e-12

    def test_alpha_one_is_proportional(self):
        w = cp.temperature_weights({"a": 30, "b": 10}, alpha=1.0)
        assert abs(w["a"] / w["b"] - 3.0) < 1e-12
