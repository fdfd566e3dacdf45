"""Training feed: the CorrectorDataset+DataLoader analog
(reference corrector_dataset.py:16-51, neural_corrector.py:216-226,
data_functions.py:57-60) as a deterministic distributed epoch stream."""

import numpy as np
import pyarrow as pa
import pytest

from post_ocr_corrector_ray import INT_EMPTY
from post_ocr_corrector_ray.functions.alphabet import Vocab, build_alphabet
from post_ocr_corrector_ray.pipelines.training import epoch_feed, iter_epoch

ALPHABET = build_alphabet(set("abcdefghijklmnopqrstuvwxyz ."))


def _corpus_table(n=37):
    rng = np.random.default_rng(5)
    words = ["oak", "fox", "dog", "river", "stone", "brew"]
    clean = [" ".join(rng.choice(words, size=rng.integers(2, 7)).tolist())
             for _ in range(n)]
    messy = [c.replace("o", "0") if i % 3 == 0 else c
             for i, c in enumerate(clean)]
    return pa.table({
        "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
        "clean": pa.array(clean, pa.string()),
        "messy": pa.array(messy, pa.string()),
        "split": pa.array(["train"] * n, pa.string())})


def _feed_df(ds):
    return ds.to_pandas().sort_values("batch_id").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
class TestEpochFeed:
    def test_exact_batch_sizes_and_coverage(self):
        import ray.data

        tbl = _corpus_table(37)
        out = _feed_df(epoch_feed(ray.data.from_arrow(tbl), alphabet=ALPHABET,
                                  batch_size=8))
        assert out["size"].tolist() == [8, 8, 8, 8, 5]   # 37 = 4×8 + 5
        assert out["batch_id"].tolist() == [0, 1, 2, 3, 4]

    def test_parallelism_invariant(self):
        import ray.data

        tbl = _corpus_table(37)
        a = _feed_df(epoch_feed(ray.data.from_arrow(tbl), alphabet=ALPHABET,
                                batch_size=8))
        b = _feed_df(epoch_feed(ray.data.from_arrow(tbl).repartition(11),
                                alphabet=ALPHABET, batch_size=8))
        assert a.equals(b)

    def test_collate_matches_reference_semantics(self):
        """Batch content == pad-to-widest INT_EMPTY collate of the permuted
        example list (data_functions.py collate_sequences, row-major here)."""
        import ray.data

        tbl = _corpus_table(19)
        out = _feed_df(epoch_feed(ray.data.from_arrow(tbl), alphabet=ALPHABET,
                                  batch_size=4))
        v = Vocab(ALPHABET)
        row = out.iloc[0]
        x = np.frombuffer(row["x"], dtype="<i4").astype(np.int64).reshape(row["size"], row["width_x"])
        widths = (x != INT_EMPTY).argmin(axis=1)  # first pad position
        for i in range(row["size"]):
            seq = x[i][x[i] != INT_EMPTY]
            assert (x[i][len(seq):] == INT_EMPTY).all()
            assert len(v.decode(seq)) == len(seq)
        assert row["width_x"] == max((x[i] != INT_EMPTY).sum() for i in range(row["size"]))

    def test_epochs_reshuffle_deterministically(self):
        import ray.data

        tbl = _corpus_table(24)
        e0 = _feed_df(epoch_feed(ray.data.from_arrow(tbl), alphabet=ALPHABET,
                                 batch_size=6, epoch=0))
        e0b = _feed_df(epoch_feed(ray.data.from_arrow(tbl), alphabet=ALPHABET,
                                  batch_size=6, epoch=0))
        e1 = _feed_df(epoch_feed(ray.data.from_arrow(tbl), alphabet=ALPHABET,
                                 batch_size=6, epoch=1))
        assert e0.equals(e0b)
        assert not e0.equals(e1)                  # different permutation
        # same example multiset across epochs (padding stripped)
        def multiset(df):
            seqs = []
            for _, r in df.iterrows():
                x = np.frombuffer(r["x"], dtype="<i4").astype(
                    np.int64).reshape(r["size"], r["width_x"])
                seqs += [tuple(row[row != INT_EMPTY]) for row in x]
            return sorted(seqs)
        assert multiset(e0) == multiset(e1)

    def test_split_filter(self):
        import ray.data

        tbl = _corpus_table(20)
        split = ["train" if i % 2 else "test" for i in range(20)]
        tbl = tbl.set_column(3, "split", pa.array(split, pa.string()))
        out = _feed_df(epoch_feed(ray.data.from_arrow(tbl), alphabet=ALPHABET,
                                  batch_size=4, split="train"))
        assert out["size"].sum() == 10

    def test_iter_epoch_yields_matrices(self):
        import ray.data

        tbl = _corpus_table(10)
        got = list(iter_epoch(ray.data.from_arrow(tbl), alphabet=ALPHABET,
                              n_epochs=2, batch_size=4))
        assert len(got) == 2 * 3                   # 10 = 4+4+2, two epochs
        ep, bid, x, y = got[0]
        assert ep == 0 and x.shape[0] == 4 and x.dtype == np.int32
        assert y.shape[0] == 4
