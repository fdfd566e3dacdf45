"""End-to-end: Ray pipeline output byte-identical to the single-process oracle,
invariant to batch size / parallelism; partitioned commit + resume."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from post_ocr_corrector_ray.functions.alphabet import build_alphabet
from post_ocr_corrector_ray.model.dictionary import DictionaryCorrector
from post_ocr_corrector_ray.model.neural import NeuralCorrectorModel
from post_ocr_corrector_ray.oracle import oracle_extract, oracle_extract_correct
from post_ocr_corrector_ray.pipelines.extract_correct import extract_correct
from post_ocr_corrector_ray.sources.synth import pages_batch, write_pages_parquet
from post_ocr_corrector_ray.state import lineage as lin

import numpy as np

N_PAGES = 120


@pytest.fixture(scope="module")
def pages_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    path = str(d / "pages.parquet")
    write_pages_parquet(path, N_PAGES, seed=42)
    return path


@pytest.fixture(scope="module")
def pages_table():
    return pages_batch(np.arange(N_PAGES), seed=42)


@pytest.fixture(scope="module")
def alphabet(pages_table):
    golden = oracle_extract(pages_table)
    return build_alphabet(set().union(*[set(t) for t in golden.values()]) or {"a"})


def _as_url_map(ds, col="corrected_text"):
    tbl = ds.to_pandas()
    return dict(zip(tbl["url"], tbl[col]))


@pytest.mark.usefixtures("ray_session")
class TestByteIdentity:
    def test_extract_matches_oracle(self, pages_file, pages_table):
        import ray.data

        ds = extract_correct(ray.data.read_parquet(pages_file), corrector="null")
        got = _as_url_map(ds, "extracted_text")
        want = oracle_extract(pages_table)
        assert got == want

    def test_null_corrector_identity(self, pages_file):
        import ray.data

        ds = extract_correct(ray.data.read_parquet(pages_file), corrector="null")
        df = ds.to_pandas()
        assert (df["corrected_text"] == df["extracted_text"]).all()

    def test_neural_matches_oracle_across_batch_sizes(self, pages_file, pages_table,
                                                      alphabet, tiny_hparams):
        import ray.data

        model = NeuralCorrectorModel.from_seed(alphabet, seed=7, **tiny_hparams)
        # keep runtime sane: 12 mixed pages
        small = pages_table.slice(0, 12)
        want = oracle_extract_correct(small, model)
        for batch_size in (1, 12):
            ds = extract_correct(
                ray.data.from_arrow(small), corrector="neural",
                alphabet=alphabet, seed=7, hparams=tiny_hparams,
                batch_size=batch_size, concurrency=2,
            )
            assert _as_url_map(ds) == want, f"batch_size={batch_size}"

    def test_chunk_parallel_matches_oracle(self, pages_table, alphabet, tiny_hparams):
        """Giant-doc explosion + reassembly must not change output bytes —
        uncommitted (groupby-url reassembly) and committed (part-shuffle
        reassembly) paths both byte-identical to the oracle."""
        import ray.data

        model = NeuralCorrectorModel.from_seed(alphabet, seed=7, **tiny_hparams)
        small = pages_table.slice(0, 10)
        want = oracle_extract_correct(small, model)
        ds = extract_correct(
            ray.data.from_arrow(small), corrector="neural",
            alphabet=alphabet, seed=7, hparams=tiny_hparams,
            chunk_parallel=True, chunk_threshold=64,  # force explosion on most docs
            batch_size=4, concurrency=2,
        )
        assert _as_url_map(ds) == want

    def test_chunk_parallel_committed(self, pages_table, alphabet, tiny_hparams, tmp_path):
        import ray.data

        model = NeuralCorrectorModel.from_seed(alphabet, seed=7, **tiny_hparams)
        small = pages_table.slice(0, 10)
        want = oracle_extract_correct(small, model)
        out = str(tmp_path / "cp_out")
        extract_correct(
            ray.data.from_arrow(small), corrector="neural",
            alphabet=alphabet, seed=7, hparams=tiny_hparams,
            chunk_parallel=True, chunk_threshold=64,
            out_dir=out, num_partitions=4, batch_size=4, concurrency=2,
        ).to_pandas()
        table = lin.read_output(out)
        got = dict(zip(table.column("url").to_pylist(),
                       table.column("corrected_text").to_pylist()))
        assert got == want

    def test_dictionary_matches_oracle(self, pages_file, pages_table):
        import ray

        vocab = {"brza": 3, "lisica": 3, "quick": 5, "brown": 5, "fox": 5,
                 "the": 9, "dog": 4, "under": 3, "trees": 3}
        corr = DictionaryCorrector(vocab, min_frequency=2)
        small = pages_table.slice(0, 20)
        want = oracle_extract_correct(small, corr)
        ds = extract_correct(
            ray.data.from_arrow(small), corrector="dictionary",
            vocab_ref=ray.put(vocab), min_frequency=2, concurrency=2,
        )
        assert _as_url_map(ds) == want

    def test_corrector_stage_resource_passthrough(self, pages_table, alphabet,
                                                  tiny_hparams):
        """SURVEY §2.3 T1: num_gpus/resources plumb through to map_batches
        (smoke with num_gpus=0 — same output, no GPU requested)."""
        import ray.data

        small = pages_table.slice(0, 12)
        base = extract_correct(ray.data.from_arrow(small), corrector="neural",
                               alphabet=alphabet, seed=7, hparams=tiny_hparams,
                               concurrency=2)
        gpu0 = extract_correct(ray.data.from_arrow(small), corrector="neural",
                               alphabet=alphabet, seed=7, hparams=tiny_hparams,
                               concurrency=2, num_gpus=0, num_cpus=1)
        assert _as_url_map(gpu0) == _as_url_map(base)


@pytest.mark.usefixtures("ray_session")
class TestCommitResume:
    def test_partitioned_commit_and_lineage(self, pages_file, pages_table, tmp_path):
        import ray.data

        out = str(tmp_path / "out")
        summary = extract_correct(ray.data.read_parquet(pages_file), corrector="null",
                                  out_dir=out, num_partitions=8,
                                  input_fingerprint="testfp").to_pandas()
        committed = lin.committed_partitions(out)
        assert set(summary["part"]) == committed and len(committed) > 0
        # lineage records present with metrics
        recs = lin.read_lineage(out)
        assert all(r["input_fingerprint"] == "testfp" for r in recs)
        assert sum(r["n_rows"] for r in recs) == N_PAGES
        # output matches oracle
        table = lin.read_output(out)
        got = dict(zip(table.column("url").to_pylist(),
                       table.column("corrected_text").to_pylist()))
        assert got == oracle_extract(pages_table)

    def test_resume_skips_committed(self, pages_file, tmp_path):
        import ray.data

        out = str(tmp_path / "out2")
        extract_correct(ray.data.read_parquet(pages_file), corrector="null",
                        out_dir=out, num_partitions=8).to_pandas()
        first = lin.committed_partitions(out)
        assert len(first) > 0
        # wipe two partitions' markers → only those get redone
        victims = sorted(first)[:2]
        for p in victims:
            os.remove(os.path.join(lin.partition_dir(out, p), lin.SUCCESS_NAME))
        summary2 = extract_correct(ray.data.read_parquet(pages_file), corrector="null",
                                   out_dir=out, num_partitions=8).to_pandas()
        assert set(summary2["part"]) == set(victims)
        assert lin.committed_partitions(out) == first

    def test_csv_sink_variant(self, pages_file, tmp_path):
        """Reference eval.py:39-42 writes CSV — the commit sink supports it
        with the same atomic-rename + _SUCCESS protocol and readback."""
        import ray.data

        out = str(tmp_path / "csvout")
        s = extract_correct(ray.data.read_parquet(pages_file), corrector="null",
                            out_dir=out, num_partitions=4,
                            data_format="csv").to_pandas()
        assert s["n_rows"].sum() == N_PAGES
        tbl = lin.read_output(out)
        assert tbl.num_rows == N_PAGES
        assert all(r["data_format"] == "csv" for r in lin.read_lineage(out))
        assert os.path.exists(os.path.join(out, "part=00000", "data.csv"))

    def test_crashed_partition_redone_cleanly(self, pages_file, tmp_path):
        """A partition with data but no _SUCCESS (crash between write and
        commit) plus stray tmp files is redone and recommitted atomically."""
        import ray.data

        out = str(tmp_path / "crash_out")
        extract_correct(ray.data.read_parquet(pages_file), corrector="null",
                        out_dir=out, num_partitions=8).to_pandas()
        victim = sorted(lin.committed_partitions(out))[0]
        pdir = lin.partition_dir(out, victim)
        os.remove(os.path.join(pdir, lin.SUCCESS_NAME))
        with open(os.path.join(pdir, ".tmp-deadbeef.parquet"), "wb") as f:
            f.write(b"garbage partial write")
        summary = extract_correct(ray.data.read_parquet(pages_file), corrector="null",
                                  out_dir=out, num_partitions=8).to_pandas()
        assert set(summary["part"]) == {victim}
        assert os.path.exists(os.path.join(pdir, lin.SUCCESS_NAME))
        # output readable and complete despite the stray tmp file
        table = lin.read_output(out)
        assert table.num_rows == N_PAGES

    def test_fingerprint_inputs(self, pages_file, tmp_path):
        a = lin.fingerprint_inputs(pages_file)
        assert a == lin.fingerprint_inputs(pages_file)  # stable
        other = str(tmp_path / "other.parquet")
        import shutil

        shutil.copy(pages_file, other)
        assert lin.fingerprint_inputs(other) != a  # basename participates
        assert len(a) == 24

    def test_partition_assignment_deterministic(self, pages_file, tmp_path):
        from post_ocr_corrector_ray.functions.hashing import partition_of

        urls = pq.read_table(pages_file, columns=["url"]).column("url").to_pylist()
        a = [partition_of(u, 8) for u in urls]
        b = [partition_of(u, 8) for u in urls]
        assert a == b


@pytest.mark.usefixtures("ray_session")
class TestCommitByKey:
    def test_generic_sink_commits_and_resumes(self, tmp_path):
        import pyarrow as pa
        import ray.data

        from post_ocr_corrector_ray.state.lineage import commit_by_key

        out = str(tmp_path / "generic")
        tbl = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                        "text": pa.array([f"t{i}" for i in range(100)])})
        s = commit_by_key(ray.data.from_arrow(tbl), out, key_col="doc_id",
                          num_partitions=8).to_pandas()
        assert s["n_rows"].sum() == 100 and len(s) == 8
        back = lin.read_output(out)
        assert sorted(back.column("doc_id").to_pylist()) == list(range(100))
        assert "_part" not in back.column_names
        # resume: nothing recommitted
        s2 = commit_by_key(ray.data.from_arrow(tbl), out, key_col="doc_id",
                           num_partitions=8).to_pandas()
        assert len(s2) == 0
        # partial wipe → only the missing partition is redone
        import shutil

        shutil.rmtree(lin.partition_dir(out, int(s["part"][0])))
        s3 = commit_by_key(ray.data.from_arrow(tbl), out, key_col="doc_id",
                           num_partitions=8).to_pandas()
        assert len(s3) == 1
        assert lin.read_output(out).num_rows == 100


@pytest.mark.usefixtures("ray_session")
class TestPartitionSchemeGuard:
    def test_foreign_scheme_resume_refused(self, pages_file, tmp_path):
        import json

        import ray.data

        out = str(tmp_path / "legacy")
        extract_correct(ray.data.read_parquet(pages_file), corrector="null",
                        out_dir=out, num_partitions=4).to_pandas()
        # forge one marker as a legacy/blake2b-era commit
        mpath = os.path.join(lin.partition_dir(out, sorted(
            lin.committed_partitions(out))[0]), lin.SUCCESS_NAME)
        rec = json.load(open(mpath))
        rec.pop("partition_scheme")
        json.dump(rec, open(mpath, "w"))
        with pytest.raises(ValueError, match="partition_scheme"):
            extract_correct(ray.data.read_parquet(pages_file), corrector="null",
                            out_dir=out, num_partitions=4)
        # resume=False bypasses (fresh recompute over the same dir is allowed)
        extract_correct(ray.data.read_parquet(pages_file), corrector="null",
                        out_dir=out, num_partitions=4, resume=False).to_pandas()
        assert lin.read_output(out).num_rows == N_PAGES


@pytest.mark.usefixtures("ray_session")
class TestFlagshipDictionaryCommittedIntermediate:
    def test_intermediate_is_lineage_store_and_resumes(self):
        """The twice-consumed extracted corpus must live in a committed
        partitioned parquet store (the 100-TB posture), not an object-store
        materialize — and a second run must resume (commit 0 new partitions)."""
        import shutil
        import sys

        sys.path.insert(0, os.getcwd())
        import __ray_entry__ as entry

        store = "/tmp/flagship_dict_corpus_n40"
        shutil.rmtree(store, ignore_errors=True)
        out1 = entry._flagship_dictionary(40)
        n1 = out1.count()
        assert n1 == 40
        recs = lin.read_lineage(store)
        # every NON-EMPTY partition commits with lineage (a 40-row input may
        # leave some of the 16 hash partitions empty — those never commit)
        assert len(recs) >= 10
        assert sum(r["n_rows"] for r in recs) == 40
        assert all(r["input_fingerprint"] == "synthetic_pages:40" for r in recs)
        mtimes = {r["partition"]: os.path.getmtime(
            os.path.join(lin.partition_dir(store, r["partition"]), "data.parquet"))
            for r in recs}
        out2 = entry._flagship_dictionary(40)  # resume: no partition rewritten
        assert out2.count() == n1
        for pid, mt in mtimes.items():
            assert os.path.getmtime(os.path.join(
                lin.partition_dir(store, pid), "data.parquet")) == mt

    def test_joined_flagship_byte_identical_to_broadcast(self):
        """``_flagship_dictionary_joined`` (vocabulary as a DATASET, dictjoin
        partitioned scan) corrects every url byte-identically to the
        broadcast ``_flagship_dictionary`` — the same corpus, noise, vocab
        threshold, and osa metric, through a completely different dataflow.
        It also shares (resumes from) the broadcast flagship's committed
        corpus store rather than re-extracting."""
        import shutil
        import sys

        sys.path.insert(0, os.getcwd())
        import __ray_entry__ as entry

        store = "/tmp/flagship_dict_corpus_n40"
        shutil.rmtree(store, ignore_errors=True)
        broad = entry._flagship_dictionary(40).to_pandas()
        mtimes = {r["partition"]: os.path.getmtime(
            os.path.join(lin.partition_dir(store, r["partition"]), "data.parquet"))
            for r in lin.read_lineage(store)}
        joined = entry._flagship_dictionary_joined(40).to_pandas()
        # shared store: the joined variant committed nothing new
        for pid, mt in mtimes.items():
            assert os.path.getmtime(os.path.join(
                lin.partition_dir(store, pid), "data.parquet")) == mt
        assert len(joined) == len(broad) == 40
        b = broad.set_index("url").sort_index()
        j = joined.set_index("url").sort_index()
        assert j["corrected_text"].tolist() == b["corrected_text"].tolist()
        # NaN CER (empty clean text, skip_empty_correct) must match positionally
        np.testing.assert_array_equal(j["cer"].to_numpy(),
                                      b["cer"].to_numpy())
