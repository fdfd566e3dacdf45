"""Model-dir artifacts + CLI smoke (subprocess-free: main() called directly
except one true end-to-end subprocess run)."""

import json
import subprocess
import sys

import pytest

from post_ocr_corrector_ray.model.artifacts import (
    load_dictionary,
    load_hparams,
    load_model_dir,
    read_alphabet,
    save_model_dir,
    whitespace_indices,
)
from post_ocr_corrector_ray.model.dictionary import DictionaryCorrector
from post_ocr_corrector_ray.model.neural import NeuralCorrectorModel

ALPHA = " .abcdefghij"


class TestArtifacts:
    def test_model_dir_round_trip(self, tmp_path, tiny_hparams):
        model = NeuralCorrectorModel.from_seed(ALPHA, seed=3, **tiny_hparams)
        d = DictionaryCorrector({"abc": 3}, min_frequency=1)
        mdir = str(tmp_path / "m")
        save_model_dir(mdir, model, dictionary=d, extra_hparams={"note": "x"})
        hp = load_hparams(mdir)
        assert hp["max_len"] == tiny_hparams["max_len"] and hp["note"] == "x"
        assert read_alphabet(mdir) == ALPHA
        loaded = load_model_dir(mdir)
        text = "a bad cafe hid a jig."
        assert loaded.correct_document(text) == model.correct_document(text)
        assert load_dictionary(mdir).vocabulary == {"abc": 3}

    def test_alphabet_newline_stripped(self, tmp_path):
        # get_alphabet semantics: \n in the file never enters the alphabet
        mdir = tmp_path / "m2"
        mdir.mkdir()
        (mdir / "alphabet.txt").write_text("ab\ncd\n")
        assert read_alphabet(str(mdir)) == "abcd"

    def test_whitespace_indices(self):
        assert whitespace_indices(" a\tb") == {0, 2}


@pytest.mark.usefixtures("ray_session")
class TestCli:
    def test_synth_and_run_null(self, tmp_path):
        from post_ocr_corrector_ray.cli import main

        pages = str(tmp_path / "pages.parquet")
        # synth runs without ray
        assert main(["synth", pages, "--n", "40"]) == 0
        # the heavier subcommands share the session fixture's Ray
        out = str(tmp_path / "out")
        assert main(["run", pages, out, "--corrector", "null",
                     "--partitions", "4"]) == 0
        from post_ocr_corrector_ray.state.lineage import committed_partitions

        assert len(committed_partitions(out)) > 0

    def test_eval_subcommand(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from post_ocr_corrector_ray.cli import main

        f = str(tmp_path / "pairs.parquet")
        pq.write_table(pa.table({"corrected_text": ["ab", "xyz"],
                                 "clean": ["abcd", "xyz"]}), f)
        assert main(["eval", f]) == 0

    def test_feed_subcommand(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from post_ocr_corrector_ray.cli import main

        f = str(tmp_path / "corpus.parquet")
        pq.write_table(pa.table({
            "url": [f"u{i}" for i in range(12)],
            "clean": ["ab cd"] * 12, "messy": ["ab ce"] * 12,
            "split": ["train"] * 12}), f)
        alpha = tmp_path / "alpha.txt"
        alpha.write_text("abcde ")
        out = str(tmp_path / "feed_out")
        assert main(["feed", f, out, "--alphabet-file", str(alpha),
                     "--batch-size", "4"]) == 0
        got = pq.read_table(out)
        assert got.num_rows == 3 and set(got.column("size").to_pylist()) == {4}

    def test_convert_ckpt_subcommand(self, tmp_path):
        from post_ocr_corrector_ray.cli import main
        from post_ocr_corrector_ray.functions.alphabet import build_alphabet
        from post_ocr_corrector_ray.model import ckpt_compat as cc
        from post_ocr_corrector_ray.model.artifacts import load_model_dir
        from post_ocr_corrector_ray.model.neural import NeuralCorrectorModel

        alphabet = build_alphabet(set("abc "))
        hp = dict(max_len=8, d_model=8, n_head=2, n_layers=1, d_linear=8)
        m = NeuralCorrectorModel.from_seed(alphabet, seed=3, **hp)
        sd = cc.params_to_state_dict(
            {k: v for k, v in m.net.w.items() if not k.startswith("_")}, 1)
        ckpt = str(tmp_path / "ref.ckpt")
        cc.write_fake_torch_ckpt(ckpt, sd, dict(hp, batch_size=4))
        af = tmp_path / "alpha.txt"
        af.write_text(alphabet)
        out = str(tmp_path / "mdir")
        assert main(["convert-ckpt", ckpt, str(af), out]) == 0
        m2 = load_model_dir(out)
        assert m2.correct_document("ab c") == m.correct_document("ab c")

    def test_dedup_incremental_sigstore(self, tmp_path):
        """Two-wave ingest: wave 1 persists its LSH signature store; wave 2
        --against reuses it (meta.json present) and must keep exactly the
        survivors the store-text recompute fallback keeps."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from post_ocr_corrector_ray.cli import main
        from post_ocr_corrector_ray.state.lineage import read_output

        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away toward the distant hills today")
        other = "completely different content about database engines and arrow"

        def _write(path, ids, texts):
            pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                     "text": pa.array(texts, pa.string())}),
                           path)

        w1 = str(tmp_path / "wave1.parquet")
        _write(w1, [0, 1, 2], [base, other,
                               "unrelated text regarding mountains and rivers"])
        out1 = str(tmp_path / "out1")
        assert main([
            "dedup", w1, out1, "--threshold", "0.5", "--partitions", "2"]) == 0
        assert (tmp_path / "out1" / "_sigstore" / "meta.json").exists()

        w2 = str(tmp_path / "wave2.parquet")
        _write(w2, [100, 101, 102],
               [base.replace("lazy", "hazy"),   # dup of store 0 → drops
                other,                           # exact dup of store 1 → drops
                "fresh novel text with nothing shared at all whatsoever"])
        out2 = str(tmp_path / "out2")
        assert main(["dedup", w2, out2, "--against", out1,
                     "--threshold", "0.5", "--partitions", "2"]) == 0
        got = sorted(read_output(out2)["doc_id"].to_pylist())

        # fallback recompute path (no meta.json → store text re-read)
        (tmp_path / "out1" / "_sigstore" / "meta.json").unlink()
        out3 = str(tmp_path / "out3")
        assert main(["dedup", w2, out3, "--against", out1,
                     "--threshold", "0.5", "--partitions", "2"]) == 0
        assert got == sorted(read_output(out3)["doc_id"].to_pylist()) == [102]

    def test_pq_index_two_wave_frozen_codebooks(self, tmp_path):
        """Append-only PQ ingest e2e: wave 1 trains + freezes codebooks,
        wave 2 --against encodes with them VERBATIM (no retraining; store
        bytes untouched) and its codes are byte-identical to a direct
        pq_encode with wave-1's books.  A wave-2 re-run resumes (0 new
        partitions)."""
        import os

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from post_ocr_corrector_ray.cli import main
        from post_ocr_corrector_ray.stages.pq import pq_store_load
        from post_ocr_corrector_ray.state.lineage import read_output

        rng = np.random.default_rng(3)
        dim, n1, n2 = 16, 60, 40

        def _write(path, ids):
            vecs = rng.standard_normal((len(ids), dim)).round(3)
            pq.write_table(pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(vecs),
                                      pa.list_(pa.float64()))}), path)

        w1 = str(tmp_path / "wave1.parquet")
        w2 = str(tmp_path / "wave2.parquet")
        _write(w1, list(range(n1)))
        _write(w2, list(range(n1, n1 + n2)))
        out1, out2 = str(tmp_path / "pq1"), str(tmp_path / "pq2")
        assert main(["pq-index", w1, out1, "--m", "4", "--ksub", "8",
                     "--partitions", "2"]) == 0
        books = pq_store_load(out1)
        assert books.shape == (4, 8, dim // 4)
        cb_path = os.path.join(out1, "codebooks.parquet")
        cb_bytes = open(cb_path, "rb").read()

        assert main(["pq-index", w2, out2, "--against", out1,
                     "--partitions", "2"]) == 0
        # frozen store untouched, inherited copy identical
        assert open(cb_path, "rb").read() == cb_bytes
        np.testing.assert_array_equal(pq_store_load(out2), books)
        got = read_output(os.path.join(out2, "codes")) \
            .sort_by("vec_id").to_pandas()
        assert got["vec_id"].tolist() == list(range(n1, n1 + n2))

        # byte-identity with a direct encode under wave-1's books
        import ray.data

        from post_ocr_corrector_ray.stages.pq import pq_encode

        want = pq_encode(ray.data.read_parquet(w2), books).to_pandas() \
            .sort_values("vec_id")
        assert got["pq_code"].tolist() == want["pq_code"].tolist()

        # resume: a re-run recommits nothing (per-partition mtimes hold)
        from post_ocr_corrector_ray.state import lineage as lin

        codes_dir = os.path.join(out2, "codes")
        mt = {r["partition"]: os.path.getmtime(os.path.join(
            lin.partition_dir(codes_dir, r["partition"]), "data.parquet"))
            for r in lin.read_lineage(codes_dir)}
        assert main(["pq-index", w2, out2, "--against", out1,
                     "--partitions", "2"]) == 0
        for pid, m in mt.items():
            assert os.path.getmtime(os.path.join(
                lin.partition_dir(codes_dir, pid), "data.parquet")) == m

    def test_ivf_index_two_wave_frozen_quantizers(self, tmp_path):
        """Append-only IVFADC ingest e2e: wave 1 trains + freezes coarse
        centroids and residual codebooks, wave 2 --against emits
        (vec_id, cell, pq_code) rows byte-identical to a direct index build
        under wave-1's quantizers, with the frozen store untouched."""
        import os

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from post_ocr_corrector_ray.cli import main
        from post_ocr_corrector_ray.stages.pq import ivfadc_store_load
        from post_ocr_corrector_ray.state.lineage import read_output

        rng = np.random.default_rng(5)
        dim, n1, n2 = 64, 80, 50

        def _write(path, ids):
            vecs = rng.standard_normal((len(ids), dim)).round(3)
            pq.write_table(pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(vecs),
                                      pa.list_(pa.float64()))}), path)

        w1 = str(tmp_path / "wave1.parquet")
        w2 = str(tmp_path / "wave2.parquet")
        _write(w1, list(range(n1)))
        _write(w2, list(range(n1, n1 + n2)))
        out1, out2 = str(tmp_path / "ivf1"), str(tmp_path / "ivf2")
        assert main(["ivf-index", w1, out1, "--partitions", "2"]) == 0
        cents, books = ivfadc_store_load(out1)
        assert cents.shape == (16, dim) and books.shape == (8, 16, dim // 8)
        frozen = {f: open(os.path.join(out1, f), "rb").read()
                  for f in ("centroids.parquet", "codebooks.parquet")}

        assert main(["ivf-index", w2, out2, "--against", out1,
                     "--partitions", "2"]) == 0
        for f, b in frozen.items():
            assert open(os.path.join(out1, f), "rb").read() == b
        c2, b2 = ivfadc_store_load(out2)
        np.testing.assert_array_equal(c2, cents)
        np.testing.assert_array_equal(b2, books)
        got = read_output(os.path.join(out2, "index")) \
            .sort_by("vec_id").to_pandas()
        assert got["vec_id"].tolist() == list(range(n1, n1 + n2))

        import ray.data

        from post_ocr_corrector_ray.stages.pq import ivfadc_index_build

        want = ivfadc_index_build(ray.data.read_parquet(w2), cents,
                                  books).to_pandas().sort_values("vec_id")
        assert got["cell"].tolist() == want["cell"].tolist()
        assert got["pq_code"].tolist() == want["pq_code"].tolist()

    def test_subprocess_end_to_end(self, tmp_path):
        """One real subprocess run proving the CLI owns its own session."""
        pages = str(tmp_path / "p.parquet")
        out = str(tmp_path / "o")
        r1 = subprocess.run([sys.executable, "-m", "post_ocr_corrector_ray.cli",
                             "synth", pages, "--n", "30"],
                            capture_output=True, text=True, cwd="/root/repo")
        assert r1.returncode == 0, r1.stderr[-500:]
        r2 = subprocess.run([sys.executable, "-m", "post_ocr_corrector_ray.cli",
                             "--num-cpus", "2", "run", pages, out,
                             "--corrector", "null", "--partitions", "2"],
                            capture_output=True, text=True, cwd="/root/repo")
        assert r2.returncode == 0, r2.stderr[-500:]
        assert json.loads(r2.stdout.strip().splitlines()[-1])["rows"] == 30


@pytest.mark.usefixtures("ray_session")
class TestTiersCli:
    def test_tiers_pages_e2e_and_resume(self, tmp_path, capsys):
        """pages → extract → per-lang tiers → committed (lang, tier) store;
        a second identical run resumes (0 partitions re-committed); tier
        values match the library flagship composition."""
        import __ray_entry__ as entry
        from post_ocr_corrector_ray.cli import main
        from post_ocr_corrector_ray.state.lineage import read_output

        pages = str(tmp_path / "pages.parquet")
        assert main(["synth", pages, "--n", "600"]) == 0
        out = str(tmp_path / "tiers_store")
        assert main(["tiers", pages, out, "--partitions", "8"]) == 0
        first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert first["partitions_committed"] > 0 and first["rows"] > 500

        got = read_output(out).to_pandas().sort_values("url") \
            .reset_index(drop=True)
        assert set(got["tier"].unique()) == {1, 2, 3}
        # composite partition key is (lang, tier, id-hash shard)
        assert got["lang_tier"].str.match(r"^[a-z]+/tier-[123]/s[0-3]$").all()
        prefix = got["lang_tier"].str.rsplit("/s", n=1).str[0]
        assert (prefix == got["lang"] + "/tier-"
                + got["tier"].astype(str)).all()
        # sub-sharding actually splits tiers (the 100-TB partition-count fix)
        assert got["lang_tier"].nunique() > got["lang"].nunique() * 3
        want = entry.queries()["flagship_tiered"]("unused").to_pandas() \
            .sort_values("url").reset_index(drop=True)
        import pandas as pd
        pd.testing.assert_frame_equal(
            got[["url", "lang", "quality", "tier"]], want,
            check_dtype=False, check_exact=True)

        # resume: nothing re-commits
        assert main(["tiers", pages, out, "--partitions", "8"]) == 0
        second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert second["partitions_committed"] == 0

    def test_tiers_documents_mode_matches_pipeline(self, tmp_path, capsys):
        import __ray_entry__ as entry
        from post_ocr_corrector_ray.cli import main
        from post_ocr_corrector_ray.state.lineage import read_output

        out = str(tmp_path / "doc_tiers")
        assert main(["tiers", "/root/testdata/sf0.001/documents.parquet",
                     out, "--mode", "documents", "--partitions", "4"]) == 0
        capsys.readouterr()
        got = read_output(out).to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        want = entry.queries()["doc_quality_tiers"]("/root/testdata/sf0.001") \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        import pandas as pd
        pd.testing.assert_frame_equal(
            got[["doc_id", "lang", "quality", "tier"]],
            want[["doc_id", "lang", "quality", "tier"]],
            check_dtype=False, check_exact=True)
