"""BPE tokenizer training/application (stages/bpe.py).

Training is iterative vocabulary induction — not SQL-expressible — so these
tests are its correctness contract: the golden Sennrich corpus, independence
from word order, the leftmost-one-at-a-time == all-occurrences equivalence
the generated DuckDB twin relies on, and layout invariance of the
distributed apply.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from post_ocr_corrector_ray.stages.bpe import (
    END,
    _merge_once,
    bpe_counts_oracle_sql,
    bpe_encode_word,
    bpe_learn,
    bpe_token_counts,
    bpe_train_from_counts,
)


class TestTrain:
    def test_golden_sennrich_corpus(self):
        """The classic low/lower/newest/widest corpus (Sennrich et al. 2016
        §3.2 uses {low:5, lower:2, newest:6, widest:3}): highest-count pair
        first, ties lexicographic."""
        words = ["low", "lower", "newest", "widest"]
        counts = np.array([5, 2, 6, 3])
        merges = bpe_train_from_counts(words, counts, 4)
        # (e,s) and (s,t) both occur 9 times -> lexicographic tie-break
        assert merges[0] == ("e", "s", 9)
        assert merges[1] == ("es", "t", 9)
        assert merges[2] == ("est", END, 9)
        assert merges[3] == ("l", "o", 7)

    def test_word_order_irrelevant_and_min_count_stop(self):
        words = ["abc", "abd", "xy"]
        counts = np.array([3, 2, 1])
        a = bpe_train_from_counts(words, counts, 50)
        perm = [2, 0, 1]
        b = bpe_train_from_counts([words[i] for i in perm],
                                  counts[perm], 50)
        assert a == b
        # every learned pair occurs >= 2 times; the xy-only pairs never make it
        assert all(n >= 2 for *_, n in a)
        assert not any("x" in le or "y" in le for le, *_ in a)

    def test_overlapping_run_counts_per_position(self):
        # "aaa" x2: (a,a) occurs at two positions per word -> count 4
        merges = bpe_train_from_counts(["aaa"], np.array([2]), 1)
        assert merges[0] == ("a", "a", 4)


class TestApply:
    def _ranks(self, merges):
        return {(a, b): i for i, (a, b, _) in enumerate(merges)}

    def test_encode_matches_leftmost_one_at_a_time(self):
        """The equivalence the recursive-CTE oracle is built on: merging
        ALL occurrences of the best pair per round (engine) == merging one
        LEFTMOST occurrence and re-picking the best rank (twin)."""
        rng = np.random.default_rng(11)
        words = ["".join(rng.choice(list("abc"), size=n))
                 for n in rng.integers(1, 12, size=60)]
        uniq = sorted(set(words))
        merges = bpe_train_from_counts(
            uniq, rng.integers(1, 9, size=len(uniq)), 20)
        ranks = self._ranks(merges)

        def one_at_a_time(word):
            s = [*word, END]
            while True:
                best = min(
                    (((ranks[(s[i], s[i + 1])]), i)
                     for i in range(len(s) - 1)
                     if (s[i], s[i + 1]) in ranks),
                    default=None)
                if best is None:
                    return s
                _, i = best
                # leftmost occurrence OF THE BEST-RANK PAIR
                r, _ = best
                pair = [p for p in range(len(s) - 1)
                        if ranks.get((s[p], s[p + 1])) == r][0]
                s = s[:pair] + [s[pair] + s[pair + 1]] + s[pair + 2:]

        for w in uniq:
            assert bpe_encode_word(w, ranks) == one_at_a_time(w), w

    def test_merge_once_greedy_left_to_right(self):
        assert _merge_once(["a", "a", "a"], "a", "a") == ["aa", "a"]
        assert _merge_once(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
        assert _merge_once(["x", "a", "b", "a", "b"], "a", "b") \
            == ["x", "ab", "ab"]

    def test_no_merges_yields_chars_plus_end(self):
        assert bpe_encode_word("low", {}) == ["l", "o", "w", END]


@pytest.mark.usefixtures("ray_session")
class TestDistributed:
    def _corpus(self):
        texts = ["low low low low low", "lower lower newest newest",
                 "newest newest newest newest widest widest", "", "  ",
                 "aaa aaaa low"]
        return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                         "text": pa.array(texts, pa.string())}), texts

    def test_learn_apply_layout_invariant_and_matches_local(self):
        import duckdb

        import ray.data

        tbl, texts = self._corpus()
        census: dict = {}
        for t in texts:
            for w in t.strip().split():
                census[w] = census.get(w, 0) + 1
        vocab = pa.table({
            "token": pa.array(list(census), pa.string()),
            "frequency": pa.array(list(census.values()), pa.int64())})
        want_merges = bpe_train_from_counts(
            sorted(census), np.array([census[w] for w in sorted(census)]),
            10)
        for nparts in (1, 4):
            merges = bpe_learn(
                ray.data.from_arrow(vocab).repartition(nparts), 10)
            got = list(zip(merges.column("left").to_pylist(),
                           merges.column("right").to_pylist(),
                           merges.column("pair_count").to_pylist()))
            assert got == want_merges, nparts

        ranks = {(a, b): i for i, (a, b, _) in enumerate(want_merges)}
        want = [(i, len(t.strip().split()),
                 sum(len(bpe_encode_word(w, ranks))
                     for w in t.strip().split()))
                for i, t in enumerate(texts)]
        for nparts in (1, 5):
            out = bpe_token_counts(
                ray.data.from_arrow(tbl).repartition(nparts), merges) \
                .to_pandas().sort_values("doc_id").reset_index(drop=True)
            assert list(map(tuple, out.itertuples(index=False))) == want

        # and the generated DuckDB twin agrees on the same corpus
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        list(enumerate(texts)))
        sql_rows = sorted(con.execute(bpe_counts_oracle_sql(merges))
                          .fetchall())
        assert sql_rows == want
