"""Edge cases for the round-2 additions: window chunking on empty/short
docs, k-NN graph with k exceeding available neighbors, and the blockwise
pair kernel under adversarial block layouts (the cross-block ordering bug
class fixed in stages/embed.py::cosine_pairs_blockwise)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, rows):
    import pyarrow.parquet as pq

    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["xx"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestChunkWindowsEdges:
    def test_empty_and_short_docs(self, tmp_path):
        from post_ocr_corrector_ray.pipelines.documents import doc_chunk_windows

        sf = _write_docs(tmp_path, [
            (1, ""),                      # no words → no chunks
            (2, "   "),                   # whitespace only → no chunks
            (3, "one two three"),         # < win → single partial window
            (4, " ".join(f"w{i}" for i in range(65))),  # win+1 words
        ])
        got = doc_chunk_windows(sf, win=64, stride=32).to_pandas() \
            .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
        assert set(got.doc_id) == {3, 4}
        d3 = got[got.doc_id == 3]
        assert len(d3) == 1 and d3.iloc[0].chunk_text == "one two three"
        assert d3.iloc[0].chunk_n_words == 3
        d4 = got[got.doc_id == 4]
        # 65 words, stride 32 → starts 0, 32, 64
        assert d4.chunk_start.tolist() == [0, 32, 64]
        assert d4.chunk_n_words.tolist() == [64, 33, 1]
        assert d4.iloc[2].chunk_text == "w64"

    def test_windows_cover_all_words_once_per_stride(self, tmp_path):
        from post_ocr_corrector_ray.pipelines.documents import doc_chunk_windows

        words = [f"t{i}" for i in range(100)]
        sf = _write_docs(tmp_path, [(7, " ".join(words))])
        got = doc_chunk_windows(sf, win=64, stride=32).to_pandas()
        rebuilt = []
        for _, r in got.sort_values("chunk_idx").iterrows():
            rebuilt.extend(r.chunk_text.split()[: 32])  # first stride words
        # first-stride prefixes tile the document except the final tail
        assert rebuilt == words[: len(rebuilt)]


@pytest.mark.usefixtures("ray_session")
class TestKnnGraphEdges:
    def test_k_exceeds_population(self):
        """k larger than n-1 → every other vector is returned, ranked."""
        import ray.data

        from post_ocr_corrector_ray.stages.embed import knn_graph_blockwise

        rng = np.random.default_rng(3)
        n = 6
        t = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                      "embedding": pa.array(
                          rng.standard_normal((n, 4)).tolist(),
                          pa.list_(pa.float64()))})
        got = knn_graph_blockwise(ray.data.from_arrow(t), k=10,
                                  num_blocks=3).to_pandas()
        counts = got.groupby("vec_id").size()
        assert (counts == n - 1).all()
        # rank is a 1..n-1 permutation per vector
        for _, g in got.groupby("vec_id"):
            assert sorted(g.nn_rank) == list(range(1, n))

    def test_matches_bruteforce(self):
        import ray.data

        from post_ocr_corrector_ray.stages.embed import knn_graph_blockwise

        rng = np.random.default_rng(11)
        n, k = 40, 5
        m = rng.standard_normal((n, 8))
        t = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                      "embedding": pa.array(m.tolist(), pa.list_(pa.float64()))})
        got = knn_graph_blockwise(ray.data.from_arrow(t), k=k,
                                  num_blocks=4).to_pandas() \
            .sort_values(["vec_id", "nn_rank"]).reset_index(drop=True)
        norm = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(norm @ norm.T, 6)
        np.fill_diagonal(sims, -np.inf)
        for i in range(n):
            order = sorted(range(n), key=lambda j: (-sims[i, j], j))[:k]
            sub = got[got.vec_id == i]
            assert sub.nn_id.tolist() == order
            assert sub.nn_sim.tolist() == [sims[i, j] for j in order]


@pytest.mark.usefixtures("ray_session")
class TestBlockwisePairsLayoutInvariance:
    def test_pairs_complete_under_any_block_count(self):
        """The cross-block ordering bug (id_a < id_b applied off-diagonal)
        dropped pairs depending on repartition layout — pin completeness for
        several block counts."""
        import ray.data

        from post_ocr_corrector_ray.stages.embed import cosine_pairs_blockwise

        rng = np.random.default_rng(5)
        n = 60
        base = rng.standard_normal((6, 5))
        m = base[rng.integers(0, 6, n)] + rng.standard_normal((n, 5)) * 0.05
        ids = rng.permutation(n).astype(np.int64)   # ids deliberately shuffled
        t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                      "embedding": pa.array(m.tolist(), pa.list_(pa.float64()))})
        norm = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(norm @ norm.T, 6)
        want = set()
        for i in range(n):
            for j in range(n):
                if ids[i] < ids[j] and sims[i, j] >= 0.9:
                    want.add((int(ids[i]), int(ids[j])))
        for nb in (1, 3, 8):
            got = cosine_pairs_blockwise(ray.data.from_arrow(t), threshold=0.9,
                                         num_blocks=nb).to_pandas()
            assert set(zip(got.id_a, got.id_b)) == want, f"num_blocks={nb}"


@pytest.mark.usefixtures("ray_session")
class TestIdfInvertedIndexEdges:
    def test_idf_and_index_consistent(self, tmp_path):
        from post_ocr_corrector_ray.pipelines.documents import (
            doc_idf,
            doc_inverted_index,
        )

        sf = _write_docs(tmp_path, [
            (1, "alpha beta beta"),
            (2, "beta gamma"),
            (3, ""),
        ])
        idf = doc_idf(sf).to_pandas().set_index("token")
        idx = doc_inverted_index(sf).to_pandas().set_index("token")
        assert idf.loc["beta", "df"] == 2 and idx.loc["beta", "postings"] == "1,2"
        assert idf.loc["alpha", "df"] == 1 and idx.loc["alpha", "postings"] == "1"
        # idf uses total doc count INCLUDING empty docs (N=3)
        assert idf.loc["gamma", "idf"] == np.round(np.log(3 / 1), 6)
        pd.testing.assert_series_equal(idf["df"].sort_index(),
                                       idx["df"].sort_index(),
                                       check_names=False)


@pytest.mark.usefixtures("ray_session")
class TestEmptyInputTopK:
    """Driver-side top-k merges must survive an all-empty partial set
    (pd.DataFrame([]) has no columns, so an unguarded sort_values raises)."""

    def _write_empty(self, tmp_path):
        import pyarrow.parquet as pq

        pq.write_table(pa.table({
            "o_orderkey": pa.array([], pa.int64()),
            "o_custkey": pa.array([], pa.int64()),
            "o_totalprice": pa.array([], pa.float64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "o_orderpriority": pa.array([], pa.string()),
        }), f"{tmp_path}/orders.parquet")
        pq.write_table(pa.table({
            "c_custkey": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
        }), f"{tmp_path}/customer.parquet")
        pq.write_table(pa.table({
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "ts": pa.array([], pa.timestamp("us")),
            "value": pa.array([], pa.float64()),
        }), f"{tmp_path}/events.parquet")
        _write_docs(tmp_path, [])
        return str(tmp_path)

    def test_empty_tables_yield_typed_empty_results(self, tmp_path):
        from post_ocr_corrector_ray.pipelines.documents import doc_top_tokens
        from post_ocr_corrector_ray.pipelines.relational import (
            events_topk_per_type,
            top_customers,
        )

        sf = self._write_empty(tmp_path)
        t = top_customers(sf)
        assert t.num_rows == 0
        assert t.column_names == ["c_custkey", "c_name", "revenue"]
        e = events_topk_per_type(sf)
        assert e.num_rows == 0
        assert set(e.column_names) >= {"event_type", "value", "rk"}
        d = doc_top_tokens(sf)
        assert d.num_rows == 0
        assert d.column_names == ["token", "frequency"]


@pytest.mark.usefixtures("ray_session")
class TestRound3Edges:
    def test_mix_materialize_copy_semantics(self, tmp_path):
        """Every emitted doc's copy_ids are exactly 1..n; per-language totals
        land within 1 of r × count; deterministic across runs."""
        from post_ocr_corrector_ray.pipelines.documents import doc_mix_materialize

        import pyarrow.parquet as pq

        rows = [(i, f"text {i}", "aa" if i < 90 else "bb") for i in range(100)]
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array(["s"] * len(rows), pa.string()),
            "n_chars": pa.array([1] * len(rows), pa.int64())})
        pq.write_table(t, f"{tmp_path}/documents.parquet")
        out = doc_mix_materialize(str(tmp_path)).to_pandas()
        out2 = doc_mix_materialize(str(tmp_path)).to_pandas()
        pd.testing.assert_frame_equal(
            out.sort_values(["doc_id", "copy_id"]).reset_index(drop=True),
            out2.sort_values(["doc_id", "copy_id"]).reset_index(drop=True))
        per_doc = out.groupby("doc_id")["copy_id"].agg(["min", "max", "size"])
        assert (per_doc["min"] == 1).all()
        assert (per_doc["max"] == per_doc["size"]).all()
        # temperature α=0.5 upsamples the rare language, downsamples common
        n_aa = (out["lang"] == "aa").sum()
        n_bb = (out["lang"] == "bb").sum()
        assert n_bb > 10 and n_aa < 90        # bb upsampled, aa downsampled

    def test_running_totals_single_and_empty_user(self):
        import ray.data
        from post_ocr_corrector_ray.pipelines import relational as R

        # direct stage-level window math on a 1-row and interleaved frame is
        # covered by the oracle; here pin grouped_apply wiring on tiny input
        sf = "/root/testdata/sf0.001"
        out = R.events_running_totals(sf).to_pandas()
        assert (out.groupby("user_id")["row_n"].min() == 1).all()
        one = out[out["row_n"] == 1]
        first_vals = one["running_value"].to_numpy()
        assert np.allclose(one["moving_avg"].to_numpy(), first_vals)

    def test_large_volume_orders_empty_qualifiers(self, ray_session):
        from post_ocr_corrector_ray.pipelines.relational import large_volume_orders

        out = large_volume_orders("/root/testdata/sf0.001",
                                  min_qty=10**9).to_pandas()
        assert len(out) == 0

    def test_large_volume_orders_fallback_matches_broadcast(self, ray_session):
        """A low threshold makes the HAVING unselective; budget=0 forces the
        co-partitioned hash_join tail, which must be row-identical to the
        broadcast pushdown (values, dtypes, timestamps)."""
        from post_ocr_corrector_ray.pipelines.relational import large_volume_orders

        sf = "/root/testdata/sf0.001"
        kw = dict(min_qty=50.0)                       # huge qualifying set
        cols = ["o_orderkey", "c_name", "o_custkey", "o_orderdate",
                "o_totalprice", "total_qty"]

        def canon(ds):
            df = ds.to_pandas()[cols]
            return df.sort_values("o_orderkey").reset_index(drop=True)

        broad = canon(large_volume_orders(sf, broadcast_budget=10**9, **kw))
        joined = canon(large_volume_orders(sf, broadcast_budget=0, **kw))
        assert len(broad) > 100                        # fallback really fired
        pd.testing.assert_frame_equal(broad, joined)

    def test_kmeans_empty_cluster_carries_init(self, ray_session):
        """k > distinct points: surplus clusters keep their init centroid and
        report n_members = 0."""
        import ray.data
        from post_ocr_corrector_ray.stages.embed import kmeans_lloyd_distributed

        pts = np.array([[0.0, 0.0], [10.0, 10.0]], dtype=np.float32)
        pts = np.repeat(pts, 5, axis=0)
        tbl = pa.table({"vec_id": pa.array(np.arange(10), pa.int64()),
                        "embedding": pa.array(list(pts))})
        out = kmeans_lloyd_distributed(ray.data.from_arrow(tbl), n_clusters=4,
                                       n_iter=2, approx_count=10).to_pandas()
        members = out.groupby("cluster")["n_members"].first()
        assert int(members.sum()) == 10
        assert (members == 0).sum() >= 1          # surplus cluster(s) empty


@pytest.mark.usefixtures("ray_session")
class TestFastHashTwins:
    """The scan-shaped sampling/shuffle ops default to a vectorized splitmix
    hash; the md5 variants survive ONLY as SQL-oracle twins.  Both paths must
    satisfy the same structural contract, and the fast paths must equal a
    local scalar recompute (no hidden layout dependence)."""

    SF = "/root/testdata/sf0.001"

    def test_shuffle_order_both_paths_bijection(self):
        from post_ocr_corrector_ray.pipelines.documents import doc_shuffle_order

        for fn in ("fast", "md5"):
            a = doc_shuffle_order(self.SF, hash_fn=fn).to_pandas() \
                .sort_values("doc_id")
            n = len(a)
            assert sorted(a["shuffle_rank"]) == list(range(1, n + 1)), fn
            assert a["shuffle_rank"].tolist() != list(range(1, n + 1)), fn

    def test_shuffle_order_unknown_hash_fn_raises(self):
        from post_ocr_corrector_ray.pipelines.documents import doc_shuffle_order

        with pytest.raises(ValueError):
            doc_shuffle_order(self.SF, hash_fn="sha999")

    def test_weighted_sample_fast_matches_local_recompute(self):
        """The distributed local-top-k + driver merge must equal a single
        numpy recompute of the identical A-ES keys over the whole table."""
        import pyarrow.parquet as pq

        from post_ocr_corrector_ray.functions.hashing import hash_u64_array
        from post_ocr_corrector_ray.pipelines.documents import (
            _WSAMPLE_SEED, doc_weighted_sample)

        k = 16
        got = doc_weighted_sample(self.SF, k=k).to_pandas()
        t = pq.read_table(f"{self.SF}/documents.parquet",
                          columns=["doc_id", "n_chars"])
        ids = t.column("doc_id").to_numpy()
        w = t.column("n_chars").to_numpy().astype(np.float64)
        u = (hash_u64_array(ids.astype(np.uint64), seed=_WSAMPLE_SEED)
             >> np.uint64(16)).astype(np.float64) / float(1 << 48)
        key = u ** (1.0 / np.maximum(w, 1.0))
        order = np.lexsort((ids, -key))[:k]
        assert got["doc_id"].tolist() == ids[order].tolist()

    def test_mix_materialize_fast_copy_semantics(self, tmp_path):
        """Fast-hash mix keeps the copy contract (copy_ids exactly 1..n,
        per-lang totals within 1 of r x count is covered by the md5 test —
        here pin determinism and the residual-coin bound base<=n<=base+1)."""
        import pyarrow.parquet as pq

        from post_ocr_corrector_ray.pipelines.documents import doc_mix_materialize

        rows = [(i, "aa" if i < 90 else "bb") for i in range(100)]
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array(["x"] * 100, pa.string()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array(["s"] * 100, pa.string()),
            "n_chars": pa.array([1] * 100, pa.int64())})
        pq.write_table(t, f"{tmp_path}/documents.parquet")
        out = doc_mix_materialize(str(tmp_path), hash_fn="fast").to_pandas()
        out2 = doc_mix_materialize(str(tmp_path), hash_fn="fast").to_pandas()
        pd.testing.assert_frame_equal(
            out.sort_values(["doc_id", "copy_id"]).reset_index(drop=True),
            out2.sort_values(["doc_id", "copy_id"]).reset_index(drop=True))
        per_doc = out.groupby("doc_id")["copy_id"].agg(["min", "max", "size"])
        assert (per_doc["min"] == 1).all()
        assert (per_doc["max"] == per_doc["size"]).all()
        # copy counts per doc differ between docs of the SAME lang by <= 1
        # (floor vs ceil of the same r) — the residual-coin contract
        sizes = out.merge(
            pd.DataFrame({"doc_id": [r[0] for r in rows],
                          "lang0": [r[1] for r in rows]}), on="doc_id")
        spread = sizes.groupby(["lang0", "doc_id"]).size().groupby("lang0") \
                      .agg(["min", "max"])
        assert ((spread["max"] - spread["min"]) <= 1).all()

    def test_add_split_column_vectorized_matches_scalar(self):
        from post_ocr_corrector_ray.functions.hashing import polyhash_u64
        from post_ocr_corrector_ray.pipelines.corpus import (
            add_split_column, pick_split)

        urls = [f"https://ex.example/{i}" for i in range(257)] + ["", "x"]
        batch = pa.table({"url": pa.array(urls, pa.string())})
        got = add_split_column(batch).column("split").to_pylist()
        want = [pick_split(polyhash_u64(u.encode("utf-8")) % 10) for u in urls]
        assert got == want


@pytest.mark.usefixtures("ray_session")
class TestProductQuantization:
    """stages/pq.py: exact-int64 determinism, layout invariance, recall of
    the compressed ADC scan vs exact L2 top-k."""

    SF = "/root/testdata/sf0.001"

    def _setup(self):
        import pyarrow.parquet as pq
        import ray.data

        from post_ocr_corrector_ray.stages.pq import pq_train

        ds = ray.data.read_parquet(f"{self.SF}/embeddings.parquet")
        n = pq.ParquetFile(f"{self.SF}/embeddings.parquet").metadata.num_rows
        books = pq_train(ds, approx_count=n)
        t = pq.read_table(f"{self.SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
        mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        return ds, books, ids, mat

    def test_encode_matches_local_recompute_any_layout(self):
        from post_ocr_corrector_ray.stages.pq import _codebooks_int, \
            _encode_matrix, pq_encode

        ds, books, ids, mat = self._setup()
        order = np.argsort(ids)
        want = _encode_matrix(mat[order], _codebooks_int(books))
        for nparts in (1, 7):
            got = pq_encode(ds.repartition(nparts), books).to_pandas() \
                .sort_values("vec_id")
            codes = np.frombuffer(b"".join(got["pq_code"]), dtype=np.uint8) \
                .reshape(len(got), -1)
            assert np.array_equal(codes, want), nparts
        assert want.shape[1] == 8          # 8-byte code per 64-dim vector

    def test_vectorized_code_materialization_byte_identical(self):
        """The r5 FixedSizeBinary buffer build/decode (_codes_to_binary /
        _binary_to_codes) is byte-identical to the old per-row
        tobytes()/to_pylist() path, including under array slicing (non-zero
        Arrow offset) and for variable-width binary input."""
        from post_ocr_corrector_ray.stages.pq import _binary_to_codes, \
            _codes_to_binary

        rng = np.random.default_rng(7)
        codes = rng.integers(0, 256, size=(257, 8), dtype=np.uint8)
        col = _codes_to_binary(codes)
        assert pa.types.is_fixed_size_binary(col.type)
        assert col.to_pylist() == [c.tobytes() for c in codes]  # old path
        assert np.array_equal(_binary_to_codes(col), codes)
        sliced = col.slice(100, 57)                 # non-zero offset
        assert np.array_equal(_binary_to_codes(sliced), codes[100:157])
        legacy = pa.array([c.tobytes() for c in codes], pa.binary())
        assert np.array_equal(_binary_to_codes(legacy), codes)
        assert _binary_to_codes(pa.chunked_array([col, col])).shape == (514, 8)

    def test_ivfadc_topk_layout_invariant_and_local_recompute(self):
        """IVFADC (coarse probe + residual-PQ ADC): layout-invariant,
        rank/order contract holds, and the distributed result equals a
        straight local recompute of the same exact-int64 algebra.  Recall:
        the probed cells must contain the query's own cell (vec_id=0 ranks)."""
        from post_ocr_corrector_ray.stages.pq import (
            _assign_int, _codebooks_int, _encode_matrix, _int_scale,
            _residual_luts, ivfadc_topk, ivfadc_train)

        ds, _, ids, mat = self._setup()
        q = mat[ids == 0][0]
        cents, books = ivfadc_train(ds, approx_count=len(ids))
        assert cents.shape[0] == 16 and books.shape == (8, 16, 8)
        k, n_probe = 10, 4
        a = ivfadc_topk(ds, q, cents, books, k=k, n_probe=n_probe).to_pandas()
        b = ivfadc_topk(ds.repartition(9), q, cents, books,
                        k=k, n_probe=n_probe).to_pandas()
        pd.testing.assert_frame_equal(a, b)
        assert a["rank"].tolist() == list(range(1, len(a) + 1))
        assert (a["adc_dist"].diff().dropna() >= 0).all()
        assert 0 in set(a["vec_id"])  # query's own cell is always probed
        # local recompute of the full pipeline
        cent_int = _int_scale(cents)
        cb_int = _codebooks_int(books)
        q_int = _int_scale(q)
        qd2 = ((q_int[None, :] - cent_int) ** 2).sum(axis=1)
        probe = np.lexsort((np.arange(len(cent_int)), qd2))[:n_probe]
        luts = _residual_luts(q, cents, cb_int, probe.astype(np.int64))
        assign = _assign_int(_int_scale(mat), cent_int)
        keep = np.isin(assign, probe)
        adc = np.empty(keep.sum(), np.int64)
        kids = ids[keep]
        for ci in np.unique(assign[keep]):
            sel = assign[keep] == ci
            codes = _encode_matrix(mat[keep][sel] - cents[ci][None, :],
                                   cb_int)
            adc[sel] = luts[int(ci)][np.arange(8)[None, :],
                                     codes.astype(np.int64)].sum(axis=1)
        order = np.lexsort((kids, adc))[:k]
        assert a["vec_id"].tolist() == kids[order].tolist()
        np.testing.assert_allclose(a["adc_dist"].to_numpy(),
                                   adc[order] / 1e12, rtol=0, atol=0)

    def test_ivfadc_index_serving_and_incremental_store(self, tmp_path):
        """The materialized (vec_id, cell, pq_code) index serves bit-identical
        results to the scan-side ivfadc_topk — including after a parquet
        round-trip (the stored-index contract) — and the append-only store
        freezes quantizers so a second wave's rows are byte-identical to
        encoding it with wave-1's quantizers."""
        import ray.data

        from post_ocr_corrector_ray.stages.pq import (
            ivfadc_index_build, ivfadc_index_incremental, ivfadc_store_load,
            ivfadc_topk, ivfadc_topk_from_index, ivfadc_train)

        ds, _, ids, mat = self._setup()
        q = mat[ids == 0][0]
        cents, books = ivfadc_train(ds, approx_count=len(ids))
        index = ivfadc_index_build(ds, cents, books)
        idx_dir = str(tmp_path / "ivf_index")
        index.write_parquet(idx_dir)
        stored = ray.data.read_parquet(idx_dir)
        want = ivfadc_topk(ds, q, cents, books, k=10, n_probe=4).to_pandas()
        for src in (index, stored, stored.repartition(7)):
            got = ivfadc_topk_from_index(src, q, cents, books,
                                         k=10, n_probe=4).to_pandas()
            pd.testing.assert_frame_equal(got, want)
        # two-wave append-only ingest against the frozen store
        split = int(np.median(ids))
        w1 = ds.filter(expr=f"vec_id < {split}")
        w2 = ds.filter(expr=f"vec_id >= {split}")
        store = str(tmp_path / "ivf_store")
        idx1, c1, b1, trained1 = ivfadc_index_incremental(
            w1, store, approx_count=int((ids < split).sum()))
        idx2, c2, b2, trained2 = ivfadc_index_incremental(
            w2, store, approx_count=int((ids >= split).sum()))
        assert trained1 and not trained2
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(b1, b2)
        sc, sb = ivfadc_store_load(store)
        np.testing.assert_array_equal(sc, c1)   # exact float64 round-trip
        np.testing.assert_array_equal(sb, b1)
        direct = ivfadc_index_build(w2, c1, b1).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        wave2 = idx2.to_pandas().sort_values("vec_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(wave2, direct)
        # the union of wave indexes serves exactly like a single-pass index
        whole = ivfadc_topk_from_index(idx1.union(idx2), q, c1, b1,
                                       k=10, n_probe=4).to_pandas()
        single = ivfadc_topk_from_index(
            ivfadc_index_build(ds, c1, b1), q, c1, b1,
            k=10, n_probe=4).to_pandas()
        pd.testing.assert_frame_equal(whole, single)

    def test_ivfadc_store_serving_prunes_partitions(self, tmp_path):
        """Cell-partitioned committed index: the from-store query reads only
        the probed cells' partition files (a strict subset when P is wide
        enough) and returns results bit-identical to the unpruned
        from-index path; a second commit over the same input is a no-op
        (resume) and serving still works."""
        from post_ocr_corrector_ray.functions.hashing import (
            partition_of_array)
        from post_ocr_corrector_ray.state import lineage as lin
        from post_ocr_corrector_ray.stages.pq import (
            _int_scale, ivfadc_index_build, ivfadc_index_commit,
            ivfadc_topk_from_index, ivfadc_topk_from_store, ivfadc_train)

        ds, _, ids, mat = self._setup()
        q = mat[ids == 0][0]
        cents, books = ivfadc_train(ds, approx_count=len(ids))
        index = ivfadc_index_build(ds, cents, books)
        idx_dir = str(tmp_path / "cell_index")
        s1 = ivfadc_index_commit(index, idx_dir, num_partitions=16) \
            .to_pandas()
        assert s1["n_rows"].sum() == len(ids)
        want = ivfadc_topk_from_index(index, q, cents, books,
                                      k=10, n_probe=4).to_pandas()
        got = ivfadc_topk_from_store(idx_dir, q, cents, books,
                                     k=10, n_probe=4).to_pandas()
        pd.testing.assert_frame_equal(got, want)
        # the probe maps to a strict subset of committed partitions
        cent_int = _int_scale(cents)
        q_int = _int_scale(q)
        qd2 = ((q_int[None, :] - cent_int) ** 2).sum(axis=1)
        probe = np.lexsort((np.arange(len(cent_int)), qd2))[:4]
        import pyarrow as pa
        pruned = set(partition_of_array(
            pa.array([str(int(c)) for c in probe]), 16).tolist())
        assert len(pruned) < len(lin.committed_partitions(idx_dir))
        # resume: a re-commit of the same index writes nothing new
        s2 = ivfadc_index_commit(ivfadc_index_build(ds, cents, books),
                                 idx_dir, num_partitions=16).to_pandas()
        assert len(s2) == 0
        got2 = ivfadc_topk_from_store(idx_dir, q, cents, books,
                                      k=10, n_probe=4).to_pandas()
        pd.testing.assert_frame_equal(got2, want)

    def test_filtered_search_exact_and_compressed(self):
        """Filtered vector search: (a) the exact path equals brute-force
        cosine restricted to the predicate's population; (b) the compressed
        path (label carried on the materialized index, predicate composed
        with the probed-cell filter) equals scan-side IVFADC over the
        pre-filtered dataset — the predicate only prunes the competing
        population, it never perturbs codes or probe order; (c) both are
        layout-invariant."""
        import pyarrow.dataset as pds
        import ray.data

        from post_ocr_corrector_ray.stages.embed import ann_topk
        from post_ocr_corrector_ray.stages.pq import (
            ivfadc_index_build, ivfadc_topk, ivfadc_topk_from_index,
            ivfadc_train)

        ds, _, ids, mat = self._setup()
        t = __import__("pyarrow.parquet", fromlist=["read_table"]) \
            .read_table(f"{self.SF}/embeddings.parquet",
                        columns=["vec_id", "label"])
        labels = np.asarray(t.column("label").to_pylist(), dtype=np.int64)[
            np.argsort(np.asarray(t.column("vec_id").to_pylist()))]
        order_ids = np.sort(ids)
        mat_sorted = mat[np.argsort(ids)]
        q = mat[ids == 0][0]
        lbl = 3
        # (a) exact: read-level predicate == brute force over the subset
        filt = ray.data.read_parquet(f"{self.SF}/embeddings.parquet",
                                     columns=["vec_id", "embedding"],
                                     filter=pds.field("label") == lbl)
        got = ann_topk(filt, q, k=10).to_pandas()
        sel = labels == lbl
        m = mat_sorted[sel]
        sims = np.round(
            (m @ (q / np.linalg.norm(q)))
            / np.where(np.linalg.norm(m, axis=1) == 0, 1.0,
                       np.linalg.norm(m, axis=1)), 6)
        want_order = np.lexsort((order_ids[sel], -sims))[:10]
        assert got["vec_id"].tolist() == order_ids[sel][want_order].tolist()
        np.testing.assert_array_equal(got["sim"].to_numpy(),
                                      sims[want_order])
        # (b) compressed: carried-label index filter == scan over prefilter
        cents, books = ivfadc_train(ds, approx_count=len(ids))
        index = ivfadc_index_build(ds, cents, books, carry_cols=("label",))
        got_c = ivfadc_topk_from_index(index, q, cents, books, k=10,
                                       n_probe=8,
                                       keep=("label", lbl)).to_pandas()
        want_c = ivfadc_topk(filt, q, cents, books, k=10,
                             n_probe=8).to_pandas()
        pd.testing.assert_frame_equal(got_c, want_c)
        assert set(got_c["vec_id"]) <= set(order_ids[sel].tolist())
        # (c) layout invariance of the compressed filtered path
        got_r = ivfadc_topk_from_index(index.repartition(7), q, cents, books,
                                       k=10, n_probe=8,
                                       keep=("label", lbl)).to_pandas()
        pd.testing.assert_frame_equal(got_r, got_c)

    def test_ivfadc_rerank_exact_within_probed_cells(self):
        """IVFADC + exact re-rank restores brute-force search restricted to
        the probed cells: with rerank covering every probed resident the
        result IS the exact top-k over that subset (the probed-subset oracle
        contract), it is layout-invariant, and widening n_probe to all cells
        recovers the GLOBAL exact top-k."""
        from post_ocr_corrector_ray.stages.pq import (
            _assign_int, _int_scale, ivfadc_rerank_topk, ivfadc_train)

        ds, _, ids, mat = self._setup()
        q = mat[ids == 0][0]
        cents, books = ivfadc_train(ds, approx_count=len(ids))
        k, n_probe = 10, 4
        got = ivfadc_rerank_topk(ds, q, cents, books, k=k, n_probe=n_probe,
                                 rerank=len(ids)).to_pandas()
        got2 = ivfadc_rerank_topk(ds.repartition(9), q, cents, books, k=k,
                                  n_probe=n_probe, rerank=len(ids)).to_pandas()
        pd.testing.assert_frame_equal(got, got2)
        # exact top-k over probed-cell residents, same int64 algebra
        cent_int = _int_scale(cents)
        q_int = _int_scale(q)
        qd2 = ((q_int[None, :] - cent_int) ** 2).sum(axis=1)
        probe = np.lexsort((np.arange(len(cent_int)), qd2))[:n_probe]
        keep = np.isin(_assign_int(_int_scale(mat), cent_int), probe)
        d2 = ((_int_scale(mat[keep]) - q_int[None, :]) ** 2).sum(axis=1)
        order = np.lexsort((ids[keep], d2))[:k]
        assert got["vec_id"].tolist() == ids[keep][order].tolist()
        np.testing.assert_allclose(got["l2_dist"].to_numpy(),
                                   d2[order] / 1e12, rtol=0, atol=0)
        # all cells probed -> the global exact top-k
        full = ivfadc_rerank_topk(ds, q, cents, books, k=k,
                                  n_probe=len(cents),
                                  rerank=len(ids)).to_pandas()
        d2g = ((_int_scale(mat) - q_int[None, :]) ** 2).sum(axis=1)
        og = np.lexsort((ids, d2g))[:k]
        assert full["vec_id"].tolist() == ids[og].tolist()
        # recall@k of the default serving config vs global exact search is
        # reported (not asserted tight: synthetic near-random embeddings are
        # PQ's distance-concentration worst case; n_probe governs it)
        hits = len(set(got["vec_id"]) & set(ids[og]))
        assert hits >= 1

    def test_adc_topk_layout_invariant_and_recall(self):
        from post_ocr_corrector_ray.stages.pq import pq_adc_topk

        ds, books, ids, mat = self._setup()
        q = mat[ids == 0][0]
        k = 10
        a = pq_adc_topk(ds, q, books, k=k).to_pandas()
        b = pq_adc_topk(ds.repartition(9), q, books, k=k).to_pandas()
        pd.testing.assert_frame_equal(a, b)
        assert a["rank"].tolist() == list(range(1, k + 1))
        assert (a["adc_dist"].diff().dropna() >= 0).all()
        # recall vs exact L2 top-k: plain ADC on near-random 64-dim vectors
        # is PQ's worst case (distance concentration) — measured ~0.3-0.5
        # recall@10 at 16x8 codes; pin the floor, the rerank test below pins
        # the serving-quality bound
        d2 = ((mat - q) ** 2).sum(axis=1)
        exact = set(ids[np.lexsort((ids, d2))[:k]].tolist())
        got = set(a["vec_id"].tolist())
        assert len(exact & got) >= 2, (exact, got)
        # vec_id=0 is the query itself: its own quantization cell must rank
        # it at or near the top
        assert 0 in got

    def test_adc_rerank_recall_and_exactness(self):
        """ADC top-200 candidates + exact re-rank: recall@10 >= 0.8 on the
        worst-case vectors, distances exactly equal the true L2 for every
        returned row, layout-invariant."""
        from post_ocr_corrector_ray.stages.pq import pq_adc_rerank_topk

        ds, books, ids, mat = self._setup()
        q = mat[ids == 0][0]
        k = 10
        a = pq_adc_rerank_topk(ds, q, books, k=k, rerank=200).to_pandas()
        b = pq_adc_rerank_topk(ds.repartition(9), q, books,
                               k=k, rerank=200).to_pandas()
        pd.testing.assert_frame_equal(a, b)
        d2 = ((mat - q) ** 2).sum(axis=1)
        exact_order = np.lexsort((ids, d2))[:k]
        exact = set(ids[exact_order].tolist())
        got = set(a["vec_id"].tolist())
        assert len(exact & got) >= 8, (exact, got)
        # every returned distance is the TRUE distance (re-rank is exact,
        # up to the shared 1e-6 coordinate quantization)
        by_id = dict(zip(ids, d2))
        for r in a.itertuples():
            assert abs(by_id[r.vec_id] - r.l2_dist) < 1e-4, r

    def test_pq_train_dim_mismatch_raises(self):
        from post_ocr_corrector_ray.stages.pq import pq_train_local

        with pytest.raises(ValueError):
            pq_train_local(np.ones((10, 30)), m_subspaces=8)


class TestWinnowingSelection:
    """Pure selection-rule pins for stages/textstats.py::_winnow_positions."""

    def test_rightmost_min_on_ties(self):
        from post_ocr_corrector_ray.stages.textstats import _winnow_positions

        h = np.array(["bb", "aa", "aa", "cc", "aa"], dtype="<U32")
        # windows (w=3): [bb,aa,aa]->pos2  [aa,aa,cc]->pos2  [aa,cc,aa]->pos4
        assert _winnow_positions(h, 3).tolist() == [2, 4]

    def test_every_window_is_covered(self):
        from post_ocr_corrector_ray.stages.textstats import _winnow_positions

        rng = np.random.default_rng(7)
        for _ in range(20):
            n = int(rng.integers(1, 40))
            w = int(rng.integers(1, 6))
            h = rng.integers(0, 10, n).astype(np.uint64)
            sel = _winnow_positions(h, w)
            ww = min(w, n)
            for start in range(n - ww + 1):
                assert ((sel >= start) & (sel < start + ww)).any()
            # every selected position is the minimum of at least one window
            # that contains it
            for p in sel:
                starts = range(max(0, p - ww + 1), min(p, n - ww) + 1)
                assert any(h[p] <= h[s : s + ww].min() for s in starts)

    def test_short_doc_single_fingerprint(self):
        from post_ocr_corrector_ray.stages.textstats import (
            winnowing_batch, winnowing_fast_batch)

        b = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["abc", ""], pa.string())})
        for fn in (winnowing_batch, winnowing_fast_batch):
            out = fn(b)
            assert out.column("doc_id").to_pylist() == [1, 2]
            assert out.column("pos").to_pylist() == [1, 1]


@pytest.mark.usefixtures("ray_session")
class TestKeepBestAndNovelty:
    def test_keep_best_picks_max_score(self):
        import ray.data

        from post_ocr_corrector_ray.stages.components import near_dedup_by_score

        docs = ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64())}))
        pairs = ray.data.from_arrow(pa.table(
            {"id_a": pa.array([1, 2, 4], pa.int64()),
             "id_b": pa.array([2, 3, 5], pa.int64())}))
        scores = ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
             "quality": pa.array([0.1, 0.9, 0.5, 0.7, 0.7, 0.0],
                                 pa.float64())}))
        kept = sorted(near_dedup_by_score(docs, pairs, scores)
                      .to_pandas()["doc_id"].tolist())
        # cluster {1,2,3} -> 2 (max quality); {4,5} tie -> 4 (min id); 6 untouched
        assert kept == [2, 4, 6]

    def test_novelty_ownership_and_short_docs(self, tmp_path):
        from post_ocr_corrector_ray.pipelines.documents import doc_ngram_novelty

        sf = _write_docs(tmp_path, [
            (0, "a b c d e f"),   # grams "a b c d e","b c d e f" — both owned
            (1, "a b c d e"),     # exactly 5 words -> one gram, owned by doc 0
            (2, ""),              # empty -> one '' gram, owned
        ])
        got = doc_ngram_novelty(sf).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got["n_grams"].tolist() == [2, 1, 1]
        assert got["n_novel"].tolist() == [2, 0, 1]
        assert got["novelty"].tolist() == [1.0, 0.0, 1.0]


@pytest.mark.usefixtures("ray_session")
class TestFlagshipTiered:
    def test_matches_single_process_ntile_recompute(self):
        """flagship_tiered == single-process extract + DuckDB NTILE(3) OVER
        (PARTITION BY lang ORDER BY quality, url) — an independent oracle
        for the url-keyed tier-extraction composition."""
        import duckdb

        import __ray_entry__ as entry
        from post_ocr_corrector_ray.sources.synth import pages_batch
        from post_ocr_corrector_ray.stages.extract import extract_batch
        from post_ocr_corrector_ray.stages.textstats import quality_score_batch

        got = entry.queries()["flagship_tiered"]("unused").to_pandas() \
            .sort_values("url").reset_index(drop=True)

        pages = pages_batch(np.arange(600), seed=42)
        ext = extract_batch(pages)
        df = ext.to_pandas()
        df = df[df["extracted_text"].notna() & (df["extracted_text"] != "")]
        q = quality_score_batch(
            pa.table({"url": pa.array(df["url"], pa.string()),
                      "text": pa.array(df["extracted_text"], pa.string())}),
            id_col="url").to_pandas()
        q["lang"] = df["lang"].to_numpy()
        want = duckdb.query(
            "SELECT url, lang, quality, CAST(NTILE(3) OVER (PARTITION BY "
            "lang ORDER BY quality, url) AS BIGINT) AS tier FROM q"
        ).fetchdf().sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["url", "lang", "quality", "tier"]], want,
            check_dtype=False, check_exact=True)
        assert len(got) > 500  # most synthetic pages carry extractable text
