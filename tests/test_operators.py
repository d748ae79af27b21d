"""Algorithmic quality tests for the extension operators - the stronger
checks behind the rows-only registry entries: recall/precision of the
approximate algorithms against their exact counterparts, plus
hand-built edge cases for temporal/multimodal/text operators."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dlt_salesforce_iceberg_rest_demo_spark.operators import (
    dedup,
    multimodal,
    similarity,
    temporal,
    text,
)
from dlt_salesforce_iceberg_rest_demo_spark.sources.parquet import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events")


class TestDedup:
    def test_minhash_full_recall_on_planted_dups(self, spark, docs):
        """LSH banding (8 bands x 4 rows) must catch every planted
        >=0.9-Jaccard pair; at est>=0.5 precision on this corpus is
        perfect (big gap: nothing between 0.3 and 0.9)."""
        exact = {
            (r.doc_a, r.doc_b)
            for r in dedup.jaccard_pairs(docs, threshold=0.9).collect()
        }
        mh = {
            (r.doc_a, r.doc_b)
            for r in dedup.minhash_dedup_pairs(docs, threshold=0.5).collect()
        }
        assert exact, "fixture should contain planted near-duplicates"
        assert exact <= mh, f"missed pairs: {exact - mh}"
        assert mh <= exact, f"false positives: {mh - exact}"

    def test_minhash_estimate_close_to_true_jaccard(self, spark, docs):
        exact = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in dedup.jaccard_pairs(docs, threshold=0.9).collect()
        }
        est = {
            (r.doc_a, r.doc_b): r.est_jaccard
            for r in dedup.minhash_dedup_pairs(docs, threshold=0.5).collect()
        }
        for pair, true_j in exact.items():
            assert abs(est[pair] - true_j) < 0.25  # 32 perms -> se ~0.05

    def test_simhash_finds_planted_dups_with_high_precision(self, spark, docs):
        exact = {
            (r.doc_a, r.doc_b)
            for r in dedup.jaccard_pairs(docs, threshold=0.9).collect()
        }
        sh = {
            (r.doc_a, r.doc_b)
            for r in dedup.simhash_pairs(docs, max_hamming=3).collect()
        }
        recall = len(exact & sh) / len(exact)
        precision = len(exact & sh) / max(1, len(sh))
        # measured 0.5 with the portable md5-derived bits (0.679 with
        # xxhash64): simhash trades recall for O(n); the exact pair set
        # is pinned by the dedup_simhash DuckDB oracle, this guards the
        # statistical floor only.
        assert recall >= 0.4
        assert precision == 1.0

    def test_exact_dedup_representative_deterministic(self, spark, docs):
        out1 = dedup.exact_dedup(docs, ["lang", "source"]).collect()
        out2 = dedup.exact_dedup(docs, ["lang", "source"]).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))

    def test_shingles_short_doc_guard(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="one")])
        out = df.select(dedup.shingles("text", 2).alias("s")).collect()[0]["s"]
        assert out == []  # not a descending-sequence artifact


class TestSimilarity:
    def test_bruteforce_matches_fixed_point_ranking(self, spark, emb):
        q = emb.filter(F.col("vec_id") < 20)
        bf = {(r.query_id, r.corpus_id) for r in similarity.cosine_topk(emb, q, k=5).collect()}
        ex = {
            (r.query_id, r.corpus_id)
            for r in similarity.cosine_topk(emb, q, k=5, exact_decimal=True).collect()
        }
        assert bf == ex

    def test_ann_recall_at_5(self, spark, emb):
        q = emb.filter(F.col("vec_id") < 20)
        bf = {(r.query_id, r.corpus_id) for r in similarity.cosine_topk(emb, q, k=5).collect()}
        ann = {
            (r.query_id, r.corpus_id)
            for r in similarity.ann_lsh_topk(
                emb, q, k=5, n_planes=8, n_tables=16
            ).collect()
        }
        recall = len(bf & ann) / len(bf)
        assert recall >= 0.8  # measured 0.9 at (8 planes, 16 tables)

    def test_topk_is_k_rows_per_query_sorted(self, spark, emb):
        q = emb.filter(F.col("vec_id") < 3)
        rows = similarity.cosine_topk(emb, q, k=5).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append((r.rank, r.cosine))
        for qid, rs in by_q.items():
            rs.sort()
            assert [r[0] for r in rs] == [1, 2, 3, 4, 5]
            cosines = [r[1] for r in rs]
            assert cosines == sorted(cosines, reverse=True)


class TestNonFiniteCandidates:
    """Round-6 ADVICE fix: the index family (kmeans/IVF/PQ) excludes
    non-finite corpus vectors from CANDIDATES, not just from centroid
    training — symmetric with `_non_null_vectors` dropping NULL rows."""

    def _corpus(self, spark, poison):
        rows = [
            Row(vec_id=i, embedding=[float((i * 7 + j * 3) % 5) + 0.25
                                     for j in range(8)])
            for i in range(30)
        ]
        rows.append(Row(vec_id=999, embedding=poison))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    @pytest.mark.parametrize(
        "poison",
        [[float("nan")] * 8,
         [float("inf")] * 8,
         [1.0, float("nan")] + [0.5] * 6],  # PARTIALLY finite row
        ids=["all-nan", "all-inf", "one-nan"],
    )
    @pytest.mark.exhaustive
    def test_ivf_and_pq_never_surface_nonfinite_corpus_rows(self, spark, poison):
        corpus = self._corpus(spark, poison)
        q = corpus.filter(F.col("vec_id") < 3)
        ivf = similarity.ivf_topk(corpus, q, k=5, n_centroids=4, iters=1)
        assert all(r.corpus_id != 999 for r in ivf.collect())
        pq = similarity.pq_topk(corpus, q, k=5, m=4, n_codes=4, iters=1)
        assert all(r.corpus_id != 999 for r in pq.collect())

    def test_quantize_unit_masks_nonfinite_rows_warning_free(self):
        """Non-finite rows land in the zero-norm mask BY CONSTRUCTION
        (masked before the int64 cast) — no NaN-cast RuntimeWarning,
        no platform-defined garbage."""
        import warnings

        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators.similarity import (
            _quantize_unit_np,
        )

        m = np.array(
            [
                [3.0, 4.0],
                [float("nan"), 1.0],
                [float("inf"), 2.0],
                [0.0, 0.0],
                [1.0, float("-inf")],
            ]
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            uq, nz = _quantize_unit_np(m)
        assert nz.tolist() == [True, False, False, False, False]
        assert uq[1:].tolist() == [[0, 0]] * 4
        assert uq[0].tolist() == [600000, 800000]


class TestText:
    def test_lang_id_on_real_language_samples(self, spark):
        samples = [
            Row(doc_id=1, text="the cat sat on a mat and the dog is here"),
            Row(doc_id=2, text="der hund und die katze das ist gut"),
            Row(doc_id=3, text="le chien et la maison les arbres est grand"),
            Row(doc_id=4, text="el perro y los gatos que es grande"),
            Row(doc_id=5, text="这是一个中文文档"),
            Row(doc_id=6, text="zzz qqq xxx"),
        ]
        out = {r.doc_id: r.lang_pred for r in text.lang_id(spark.createDataFrame(samples)).collect()}
        assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "zh", 6: "und"}

    def test_quality_score_bounds(self, spark, docs):
        rows = text.quality_score(docs).collect()
        assert all(0.0 <= r.quality <= 1.0 for r in rows)

    def test_fingerprint_deterministic_and_content_addressed(self, spark, docs):
        f1 = {r.doc_id: (r.h60, r.winnow_min) for r in text.fingerprint(docs).collect()}
        f2 = {r.doc_id: (r.h60, r.winnow_min) for r in text.fingerprint(docs).collect()}
        assert f1 == f2
        df = spark.createDataFrame(
            [Row(doc_id=1, text="same text"), Row(doc_id=2, text="same text")]
        )
        out = {r.doc_id: r.content_md5 for r in text.fingerprint(df).collect()}
        assert out[1] == out[2]

    def test_tfidf_rare_term_outranks_common(self, spark):
        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="common common common rare"),
                Row(doc_id=2, text="common common"),
                Row(doc_id=3, text="common other"),
            ]
        )
        top = {
            (r.doc_id, r.rank): r.term
            for r in text.tfidf_top_terms(df, k=1).collect()
        }
        assert top[(1, 1)] == "rare"  # df=1 beats tf=3 of the everywhere-term


class TestTemporal:
    def _events(self, spark):
        t0 = datetime.datetime(2024, 1, 1)
        mk = lambda i, minutes, etype, v: Row(
            event_id=i,
            ts=t0 + datetime.timedelta(minutes=minutes),
            user_id=1,
            event_type=etype,
            value=float(v),
        )
        return spark.createDataFrame(
            [
                mk(1, 0, "click", 1),
                mk(2, 10, "click", 2),
                mk(3, 20, "purchase", 10),  # joins to click@10
                mk(4, 120, "purchase", 20),  # same session? no: 100min gap
                mk(5, 125, "click", 3),
                mk(6, 125, "purchase", 30),  # equal-ts click: inclusive match
            ]
        )

    def test_sessionize_gap_boundaries(self, spark):
        out = temporal.sessionize(self._events(spark), gap_minutes=30)
        sess = {r.event_id: r.session_idx for r in out.collect()}
        assert sess == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1}

    def test_asof_matches_latest_prior_inclusive(self, spark):
        ev = self._events(spark)
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts", "value"
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", "event_id", "ts", "value"
        )
        out = {
            r.event_id: r.event_id_asof
            for r in temporal.asof_join(
                purchases, clicks, on="user_id", right_cols=["event_id", "value"]
            ).collect()
        }
        assert out == {3: 2, 4: 2, 6: 5}  # 6 matches the equal-ts click 5

    def test_asof_no_prior_match_is_null(self, spark):
        ev = self._events(spark)
        early = ev.filter(F.col("event_id") == 1).select(
            "user_id", "event_id", "ts", "value"
        )
        late_clicks = ev.filter(F.col("event_id") == 5).select(
            "user_id", "event_id", "ts", "value"
        )
        row = temporal.asof_join(
            early, late_clicks, on="user_id", right_cols=["event_id"]
        ).collect()[0]
        assert row.event_id_asof is None

    @pytest.mark.exhaustive
    def test_band_join_matches_naive_theta(self, spark):
        """Bucketized band join == brute-force theta join (inclusive
        bounds both ends), on a window that straddles bucket edges."""
        ev = self._events(spark)
        p = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts")
        c = ev.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), "ts", "value"
        )
        got = {
            (r.event_id, r.click_id)
            for r in temporal.band_join(
                p, c, lower_seconds=-1800.0, upper_seconds=0.0, suffix="_c"
            ).collect()
        }
        lo, hi = -1800 * 1_000_000, 0
        naive = {
            (r.event_id, r.click_id)
            for r in p.alias("p")
            .join(
                c.alias("c"),
                (F.unix_micros(F.col("c.ts")) >= F.unix_micros(F.col("p.ts")) + lo)
                & (F.unix_micros(F.col("c.ts")) <= F.unix_micros(F.col("p.ts")) + hi),
            )
            .select(F.col("p.event_id"), F.col("c.click_id"))
            .collect()
        }
        assert got == naive
        # equal-timestamp click is inclusive at the upper bound; the
        # 110-min-old click falls outside the band
        assert (6, 5) in got and (4, 2) not in got and (3, 1) in got

    def test_gapfill_dense_grid_and_forward_fill(self, spark):
        """Empty hours appear with 0 events and the carried value; a
        single-event user gets a 1-row grid."""
        t0 = datetime.datetime(2024, 1, 1, 0, 30)
        rows = [
            Row(user_id=1, ts=t0, value=10.0),
            Row(user_id=1, ts=t0 + datetime.timedelta(hours=3), value=4.0),
            Row(user_id=2, ts=t0, value=7.0),
        ]
        out = temporal.gapfill(spark.createDataFrame(rows), grain="hour")
        got = {
            (r.user_id, r.bucket_ts.hour): (r.n_events, r.bucket_value, r.filled_value)
            for r in out.collect()
        }
        assert got == {
            (1, 0): (1, 10.0, 10.0),
            (1, 1): (0, None, 10.0),  # gap: 0 events, value carried
            (1, 2): (0, None, 10.0),
            (1, 3): (1, 4.0, 4.0),
            (2, 0): (1, 7.0, 7.0),  # single-event user: 1-row grid
        }

    def test_band_join_bounds_inclusive_exact(self, spark):
        """Rows exactly ON the band edges are kept; 1s past is dropped."""
        t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
        p = spark.createDataFrame([Row(event_id=1, ts=t0)])
        c = spark.createDataFrame(
            [
                Row(click_id=10, ts=t0 - datetime.timedelta(seconds=1800)),
                Row(click_id=11, ts=t0 - datetime.timedelta(seconds=1801)),
                Row(click_id=12, ts=t0),
                Row(click_id=13, ts=t0 + datetime.timedelta(seconds=1)),
            ]
        )
        got = {
            r.click_id
            for r in temporal.band_join(
                p, c, lower_seconds=-1800.0, upper_seconds=0.0
            ).collect()
        }
        assert got == {10, 12}

    def test_band_join_with_equi_key(self, spark):
        """Equi-key restricts matches to the same user."""
        rows = [
            Row(user_id=u, event_id=i, ts=datetime.datetime(2024, 1, 1, 0, m))
            for i, (u, m) in enumerate([(1, 0), (1, 10), (2, 10)])
        ]
        df = spark.createDataFrame(rows)
        out = temporal.band_join(
            df,
            df.select(F.col("event_id").alias("rid"), "ts", "user_id"),
            lower_seconds=-3600.0,
            upper_seconds=3600.0,
            on=["user_id"],
        )
        pairs = {(r.event_id, r.rid) for r in out.collect()}
        assert pairs == {(0, 0), (0, 1), (1, 0), (1, 1), (2, 2)}

    def test_band_join_empty_band_and_plan_is_equi(self, spark):
        ev = self._events(spark)
        p = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts")
        c = ev.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), "ts"
        )
        # band strictly in the future of all clicks relative to purchases
        out = temporal.band_join(p, c, lower_seconds=3600.0, upper_seconds=3600.0)
        assert out.count() == 0
        # the physical plan must be an equi join on the bucket key, not
        # a nested-loop theta join
        import contextlib, io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain()
        assert "BroadcastNestedLoopJoin" not in buf.getvalue()


class TestMultimodal:
    def test_decode_stub_features_normalized_and_deterministic(self, spark, docs):
        mm = multimodal.attach_binary_payload(docs.limit(20))
        f1 = {r.doc_id: r.features for r in multimodal.decode_image_features(mm).collect()}
        f2 = {r.doc_id: r.features for r in multimodal.decode_image_features(mm).collect()}
        assert f1 == f2
        for feats in f1.values():
            assert len(feats) == multimodal.FEATURE_DIM
            assert abs(sum(feats) - 1.0) < 1e-6

    def test_real_decode_raises_at_the_seam(self, spark, docs):
        mm = multimodal.attach_binary_payload(docs.limit(1))
        with pytest.raises(NotImplementedError):
            multimodal.decode_image_features(mm, decode_stub=False)

    def test_frame_sampling_reassembles_prefix(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="a" * 100)])
        mm = multimodal.attach_binary_payload(df)
        row = multimodal.sample_frames(mm, frame_size=32, every_k=1).collect()[0]
        assert row.n_frames_total == 4  # ceil(100/32)
        joined = b"".join(bytes(f) for f in row.frames)
        assert joined == b"a" * 100  # every_k=1 keeps everything, lossless

    def test_resize_stride_sampling(self, spark, docs):
        mm = multimodal.attach_binary_payload(docs.limit(20))
        out = multimodal.resize_payload(mm, target_bytes=64).collect()
        for r in out:
            assert r.resized_bytes <= 64 or r.resized_bytes == r.orig_bytes
            if r.orig_bytes <= 64:
                assert r.resized_bytes == r.orig_bytes

    def test_resize_short_payload_passthrough(self, spark):
        from pyspark.sql import Row as R

        df = spark.createDataFrame([R(doc_id=1, text="tiny")])
        mm = multimodal.attach_binary_payload(df)
        row = multimodal.resize_payload(mm, target_bytes=64).collect()[0]
        assert bytes(row.payload_resized) == b"tiny"

    def test_payload_roundtrip(self, spark, docs):
        mm = multimodal.attach_binary_payload(docs.limit(5))
        rows = mm.join(docs.limit(5), "doc_id").select("payload", "text").collect()
        for r in rows:
            assert bytes(r.payload).decode("utf-8") == r.text


class TestConnectedComponents:
    def _labels(self, df):
        return {r.node: r.cluster_id for r in df.collect()}

    def test_two_components_and_singleton(self, spark):
        edges = spark.createDataFrame(
            [(2, 3), (3, 7), (10, 11)], ["src", "dst"]
        )
        nodes = spark.createDataFrame([(i,) for i in (2, 3, 7, 10, 11, 99)], ["id"])
        got = self._labels(
            dedup.connected_components(edges, nodes=nodes, node_col="id")
        )
        assert got == {2: 2, 3: 2, 7: 2, 10: 10, 11: 10, 99: 99}

    def test_long_chain_converges(self, spark):
        # Path graph 0-1-2-...-9: worst case for propagation (diameter 9).
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(9)], ["src", "dst"]
        )
        got = self._labels(dedup.connected_components(edges))
        assert got == {i: 0 for i in range(10)}

    def test_nodes_optional_defaults_to_edge_endpoints(self, spark):
        edges = spark.createDataFrame([(5, 4)], ["src", "dst"])
        got = self._labels(dedup.connected_components(edges))
        assert got == {4: 4, 5: 4}

    def test_cycle_terminates(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], ["src", "dst"]
        )
        got = self._labels(dedup.connected_components(edges))
        assert got == {1: 1, 2: 1, 3: 1}


class TestRepetition:
    def test_degenerate_doc_scores_high(self, spark):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import text as text_ops

        df = spark.createDataFrame(
            [(1, "spam spam spam spam ham"), (2, "a b c d e")],
            ["doc_id", "text"],
        )
        rows = {r.doc_id: r for r in text_ops.repetition_score(df).collect()}
        assert rows[1].n_tokens == 5
        assert rows[1].top_token_count == 4
        assert abs(rows[1].top_token_frac - 0.8) < 1e-12
        assert abs(rows[2].top_token_frac - 0.2) < 1e-12


class TestChunking:
    def test_short_doc_single_chunk(self, spark):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import text as text_ops

        df = spark.createDataFrame([(1, "just three words")], ["doc_id", "text"])
        rows = text_ops.chunk_documents(df, window=8, stride=6).collect()
        assert len(rows) == 1
        assert rows[0].chunk_text == "just three words"
        assert rows[0].chunk_idx == 0 and rows[0].n_tokens == 3

    def test_overlap_and_coverage(self, spark):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import text as text_ops

        words = [f"w{i}" for i in range(20)]
        df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
        rows = sorted(
            text_ops.chunk_documents(df, window=8, stride=6).collect(),
            key=lambda r: r.chunk_idx,
        )
        # starts at 1, 7, 13 (last start <= 20-8+1=13): 3 chunks
        assert [r.chunk_idx for r in rows] == [0, 1, 2]
        assert rows[0].chunk_text.split() == words[0:8]
        assert rows[1].chunk_text.split() == words[6:14]
        assert rows[2].chunk_text.split() == words[12:20]
        # every token appears in some chunk
        covered = {w for r in rows for w in r.chunk_text.split()}
        assert covered == set(words)


class TestStarConnectedComponents:
    def _labels(self, df):
        return {r.node: r.cluster_id for r in df.collect()}

    def _assert_same_as_propagation(self, spark, pairs):
        edges = spark.createDataFrame(pairs, ["src", "dst"])
        star = self._labels(dedup.connected_components_star(edges))
        prop = self._labels(dedup.connected_components(edges))
        assert star == prop

    @pytest.mark.exhaustive
    def test_long_chain(self, spark):
        self._assert_same_as_propagation(spark, [(i, i + 1) for i in range(30)])

    @pytest.mark.exhaustive
    def test_random_graph_matches_propagation(self, spark):
        import random

        rng = random.Random(7)
        pairs = [
            (rng.randrange(60), rng.randrange(60)) for _ in range(80)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        self._assert_same_as_propagation(spark, pairs)

    def test_two_components_and_singleton(self, spark):
        edges = spark.createDataFrame([(2, 3), (3, 7), (10, 11)], ["src", "dst"])
        nodes = spark.createDataFrame([(i,) for i in (2, 3, 7, 10, 11, 99)], ["id"])
        got = self._labels(
            dedup.connected_components_star(edges, nodes=nodes, node_col="id")
        )
        assert got == {2: 2, 3: 2, 7: 2, 10: 10, 11: 10, 99: 99}


class TestIncrementalDedup:
    def test_new_batch_matches_corpus_and_itself(self, spark):
        base = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "one two three four five six seven"),
                (3, "red orange yellow green blue indigo"),
            ],
            ["doc_id", "text"],
        )
        base_sigs = dedup.minhash_signatures(base)
        new = spark.createDataFrame(
            [
                (10, "one two three four five six seven"),   # dup of base 2
                (11, "totally novel content nothing shared"),
                (12, "one two three four five six seven"),   # dup of 10 (intra-batch)
            ],
            ["doc_id", "text"],
        )
        pairs = {
            (r.doc_new, r.doc_match)
            for r in dedup.incremental_minhash_pairs(new, base_sigs).collect()
        }
        assert (10, 2) in pairs
        assert (12, 2) in pairs
        assert (12, 10) in pairs          # intra-batch pair, counted once
        assert not any(a == 11 or b == 11 for a, b in pairs)
        assert not any(b == a for a, b in pairs)
        # base-vs-base pairs never appear (corpus already deduped)
        assert all(a in (10, 12) for a, _ in pairs)

    def test_candidates_unchanged_by_refactor(self, spark, docs):
        # _banded extraction must not change minhash_lsh_candidates.
        sigs = dedup.minhash_signatures(docs.limit(50))
        cands = dedup.minhash_lsh_candidates(sigs)
        rows = cands.collect()
        assert all(r.doc_a < r.doc_b for r in rows)


class TestBlockDedup:
    def test_planted_duplicate_blocks(self, spark):
        """A 16-token block shared verbatim by two docs is a duplicate
        in the later doc only (keep-first by doc_id)."""
        block = " ".join(f"w{i}" for i in range(16))
        rows = [
            Row(doc_id=1, text=block + " " + "x " * 15 + "x"),
            Row(doc_id=2, text=block + " " + "y " * 15 + "y"),
            Row(doc_id=3, text="z " * 31 + "z"),
        ]
        out = {
            r.doc_id: r
            for r in text.block_dedup(spark.createDataFrame(rows)).collect()
        }
        assert out[1].n_blocks == 2 and out[1].n_dup_blocks == 0
        assert out[2].n_blocks == 2 and out[2].n_dup_blocks == 1
        assert out[2].dup_frac == pytest.approx(0.5)
        # doc 3 repeats 'z' -> its second block duplicates its first?
        # blocks are 'z'*16 each -> intra-doc duplicate counts too.
        assert out[3].n_dup_blocks == 1

    def test_short_doc_single_block(self, spark):
        out = text.block_dedup(
            spark.createDataFrame([Row(doc_id=1, text="just three words")])
        ).collect()
        assert out[0].n_blocks == 1 and out[0].n_dup_blocks == 0


class TestExactSubstringSpans:
    """ExactSubstr dedup (Lee et al. 2022 sec. 4.1) — the any-offset
    upgrade over TestBlockDedup's aligned blocks."""

    def test_planted_unaligned_span(self, spark):
        """A 10-token run shared at DIFFERENT offsets in two docs (so
        block_dedup's aligned 16-token blocks would miss it) is found
        in BOTH docs; merged span covers exactly the shared tokens."""
        shared = " ".join(f"s{i}" for i in range(10))
        rows = [
            # shared run starts at token 1
            Row(doc_id=1, text=shared + " " + " ".join(f"a{i}" for i in range(10))),
            # shared run starts at token 6
            Row(
                doc_id=2,
                text=" ".join(f"b{i}" for i in range(5))
                + " " + shared + " "
                + " ".join(f"c{i}" for i in range(5)),
            ),
            Row(doc_id=3, text=" ".join(f"z{i}" for i in range(20))),
        ]
        out = {
            r.doc_id: r
            for r in text.exact_substring_spans(
                spark.createDataFrame(rows), window=8
            ).collect()
        }
        # duplicated substring length 10 >= window 8 -> all 10 tokens
        # covered in each doc, one maximal span each
        assert out[1].n_dup_spans == 1 and out[1].dup_tokens == 10
        assert out[2].n_dup_spans == 1 and out[2].dup_tokens == 10
        assert out[3].n_dup_spans == 0 and out[3].dup_tokens == 0
        assert out[1].n_tokens == 20 and out[1].dup_token_frac == pytest.approx(0.5)

    def test_intra_doc_repeat_counts(self, spark):
        """A doc repeating its own 8-token phrase twice is flagged even
        with no second document (the paper removes intra-doc repeats)."""
        phrase = " ".join(f"p{i}" for i in range(8))
        mid = " ".join(f"m{i}" for i in range(4))
        rows = [Row(doc_id=1, text=phrase + " " + mid + " " + phrase)]
        out = text.exact_substring_spans(
            spark.createDataFrame(rows), window=8
        ).collect()[0]
        assert out.n_dup_spans == 2 and out.dup_tokens == 16

    def test_sub_window_span_not_flagged(self, spark):
        """A shared run SHORTER than the window is invisible: no 8-token
        window fits inside it, so nothing is flagged (threshold
        semantics, not substring-grep semantics)."""
        shared = " ".join(f"s{i}" for i in range(7))  # 7 < window
        rows = [
            Row(doc_id=1, text=shared + " " + " ".join(f"a{i}" for i in range(8))),
            Row(doc_id=2, text=shared + " " + " ".join(f"b{i}" for i in range(8))),
        ]
        out = text.exact_substring_spans(
            spark.createDataFrame(rows), window=8
        ).collect()
        assert all(r.n_dup_spans == 0 for r in out)

    def test_adjacent_windows_merge_into_one_span(self, spark):
        """Two duplicated regions that overlap merge into ONE maximal
        span (the gaps-and-islands pass), mirroring the paper's maximal
        byte ranges."""
        long_shared = " ".join(f"s{i}" for i in range(20))
        rows = [
            Row(doc_id=1, text=long_shared),
            Row(doc_id=2, text=long_shared + " tail1 tail2"),
        ]
        out = {
            r.doc_id: r
            for r in text.exact_substring_spans(
                spark.createDataFrame(rows), window=8
            ).collect()
        }
        assert out[1].n_dup_spans == 1 and out[1].dup_tokens == 20
        assert out[2].n_dup_spans == 1 and out[2].dup_tokens == 20

    def test_short_doc_zero_output_row(self, spark):
        """Docs shorter than the window still appear in the output with
        zeros (left-join contract: per-doc stats over the WHOLE corpus)."""
        out = text.exact_substring_spans(
            spark.createDataFrame([Row(doc_id=1, text="just three words")]),
            window=8,
        ).collect()
        assert out[0].n_tokens == 3 and out[0].n_dup_spans == 0
        assert out[0].dup_token_frac == 0.0


class TestExactSubstringRemove:
    """ExactSubstr removal: the cleaned text, not just the stats."""

    def test_removal_edges(self, spark):
        phrase = " ".join(f"w{i}" for i in range(8))
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text=phrase + " a b"),   # dup + unique tail
                Row(doc_id=2, text="x y " + phrase),   # dup elsewhere
                Row(doc_id=3, text="u0 u1 u2"),        # sub-window, clean
                Row(doc_id=4, text=phrase),            # fully duplicated
                Row(doc_id=5, text=None),              # NULL stays NULL
                Row(doc_id=6, text=phrase + " mid " + phrase),  # intra-doc
            ]
        )
        out = {
            r.doc_id: r
            for r in text.exact_substring_remove(docs, window=8).collect()
        }
        assert out[1].text_clean == "a b" and out[1].n_removed == 8
        assert out[2].text_clean == "x y"
        assert out[3].text_clean == "u0 u1 u2" and out[3].n_removed == 0
        assert out[4].text_clean == "" and out[4].n_removed == 8
        # NULL doc: ALL outputs NULL, not size(split(NULL)) = -1
        # (ADVICE r8 — non-ANSI size() of NULL is -1, not NULL)
        assert out[5].text_clean is None
        assert out[5].n_tokens is None and out[5].n_removed is None
        assert out[6].text_clean == "mid" and out[6].n_removed == 16

    def test_null_doc_stats_are_null_in_spans_too(self, spark):
        """exact_substring_spans shares _span_stats: a NULL doc reports
        NULL n_tokens and NULL dup_token_frac (0/NULL), matching the
        DuckDB oracle's len(NULL) semantics."""
        out = {
            r.doc_id: r
            for r in text.exact_substring_spans(
                spark.createDataFrame(
                    [Row(doc_id=1, text=None), Row(doc_id=2, text="a b c")]
                ),
                window=8,
            ).collect()
        }
        assert out[1].n_tokens is None and out[1].dup_token_frac is None
        assert out[1].n_dup_spans == 0 and out[1].dup_tokens == 0
        assert out[2].n_tokens == 3 and out[2].dup_token_frac == 0.0

    def test_consecutive_spaces_roundtrip(self, spark):
        """Empty tokens (double spaces) survive untouched in clean
        docs — the split/rejoin is lossless."""
        docs = spark.createDataFrame([Row(doc_id=1, text="a  b   c")])
        out = text.exact_substring_remove(docs, window=8).collect()[0]
        assert out.text_clean == "a  b   c" and out.n_removed == 0


class TestIncrementalExactSubstring:
    """Batch-vs-corpus ExactSubstr over the persisted fingerprint
    index: corpus text is never re-read (the O(batch) ingest shape)."""

    def test_corpus_dup_and_intra_batch_dup_detected(self, spark):
        corpus_phrase = " ".join(f"k{i}" for i in range(8))
        batch_phrase = " ".join(f"q{i}" for i in range(8))
        base = spark.createDataFrame(
            [Row(doc_id=1, text=corpus_phrase + " extra0 extra1")]
        )
        new = spark.createDataFrame(
            [
                # duplicates a corpus phrase
                Row(doc_id=10, text=corpus_phrase + " fresh0 fresh1"),
                # duplicates ANOTHER batch doc (corpus never saw it)
                Row(doc_id=20, text=batch_phrase + " m0 m1"),
                Row(doc_id=30, text="n0 n1 " + batch_phrase),
                # clean
                Row(doc_id=40, text=" ".join(f"z{i}" for i in range(10))),
            ]
        )
        idx = text.exact_substring_index(base, window=8)
        out = {
            r.doc_id: r
            for r in text.incremental_exact_substring_spans(
                new, idx, window=8
            ).collect()
        }
        assert set(out) == {10, 20, 30, 40}  # batch docs only
        assert out[10].n_dup_spans == 1 and out[10].dup_tokens == 8
        assert out[20].n_dup_spans == 1 and out[20].dup_tokens == 8
        assert out[30].n_dup_spans == 1 and out[30].dup_tokens == 8
        assert out[40].n_dup_spans == 0 and out[40].dup_tokens == 0

    def test_broadcast_probe_off_is_equivalent(self, spark):
        """broadcast_probe=False (the shuffle fallback for batches
        whose fp set cannot broadcast — ADVICE r7) must produce the
        identical result as the default broadcast probe."""
        base = spark.createDataFrame(
            [Row(doc_id=1, text=" ".join(f"c{i}" for i in range(12)))]
        )
        new = spark.createDataFrame(
            [
                Row(doc_id=10, text=" ".join(f"c{i}" for i in range(9))),
                Row(doc_id=20, text=" ".join(f"y{i}" for i in range(10))),
            ]
        )
        idx = text.exact_substring_index(base, window=8)
        on = sorted(
            r.asDict().items()
            for r in text.incremental_exact_substring_spans(
                new, idx, window=8, broadcast_probe=True
            ).collect()
        )
        off = sorted(
            r.asDict().items()
            for r in text.incremental_exact_substring_spans(
                new, idx, window=8, broadcast_probe=False
            ).collect()
        )
        assert on == off
        assert any(
            dict(row)["n_dup_spans"] > 0 for row in on
        )  # non-vacuous: the corpus-dup doc is flagged

    def test_index_counts_merge_additively(self, spark):
        """index(a ∪ b) == index(a) + index(b) summed per fp — the
        per-ingest maintenance contract (counts add, no text kept)."""
        a = spark.createDataFrame(
            [Row(doc_id=1, text=" ".join(f"w{i}" for i in range(10)))]
        )
        b = spark.createDataFrame(
            [Row(doc_id=2, text=" ".join(f"w{i}" for i in range(9)))]
        )
        both = a.unionByName(b)
        merged = {
            r.fp: r.cnt
            for r in text.exact_substring_index(a)
            .unionByName(text.exact_substring_index(b))
            .groupBy("fp")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        }
        full = {
            r.fp: r.cnt
            for r in text.exact_substring_index(both).collect()
        }
        assert merged == full


class TestDsir:
    """DSIR importance resampling (Xie et al. 2023): raw docs that
    share the target domain's vocabulary must outscore off-domain
    docs; the hypothesis replay in test_properties.py pins the full
    arithmetic."""

    def test_on_domain_outscores_off_domain(self, spark):
        target = spark.createDataFrame(
            [
                Row(doc_id=100, text="spark sql window functions shuffle"),
                Row(doc_id=101, text="spark shuffle partitions window"),
            ]
        )
        raw = spark.createDataFrame(
            [
                Row(doc_id=1, text="spark sql window shuffle partitions"),
                Row(doc_id=2, text="gardening tulips soil compost watering"),
            ]
        )
        from dlt_salesforce_iceberg_rest_demo_spark.operators import text as t_ops

        imp = {
            r.doc_id: r.logw_micro
            for r in t_ops.dsir_importance(raw, target, buckets=32).collect()
        }
        assert imp[1] > imp[2]

    def test_select_is_subset_and_deterministic(self, spark):
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=f"w{i} w{i+1} common token") for i in range(10)]
        )
        target = spark.createDataFrame(
            [Row(doc_id=99, text="common token stream")]
        )
        from dlt_salesforce_iceberg_rest_demo_spark.operators import text as t_ops

        a = t_ops.dsir_select(docs, target, n_select=4).collect()
        b = t_ops.dsir_select(docs, target, n_select=4).collect()
        assert a == b and len(a) == 4
        assert {r.doc_id for r in a} <= set(range(10))


class TestContamination:
    def test_contained_and_disjoint_docs(self, spark):
        bench = spark.createDataFrame(
            [Row(doc_id=100, text="alpha beta gamma delta epsilon")]
        )
        docs = spark.createDataFrame(
            [
                # every 3-gram inside the benchmark text
                Row(doc_id=1, text="alpha beta gamma delta"),
                # no overlap at all
                Row(doc_id=2, text="one two three four"),
                # half: 'beta gamma delta' yes, 'delta zzz qqq' chain no
                Row(doc_id=3, text="beta gamma delta zzz qqq"),
            ]
        )
        out = {
            r.doc_id: r for r in text.contamination(docs, bench, n=3).collect()
        }
        assert out[1].contamination == pytest.approx(1.0)
        assert out[2].contamination == pytest.approx(0.0)
        assert out[3].n_grams == 3 and out[3].n_contaminated == 1

    def test_too_short_docs_excluded(self, spark):
        bench = spark.createDataFrame([Row(doc_id=9, text="a b c")])
        docs = spark.createDataFrame([Row(doc_id=1, text="a b")])
        assert text.contamination(docs, bench, n=3).count() == 0


class TestQuantize:
    def test_roundtrip_error_bounded(self, spark, emb):
        """Dequantized values must sit within scale/2 of the original
        (the definition of symmetric round-to-nearest int8)."""
        joined = (
            similarity.quantize_int8(emb)
            .join(emb, "vec_id")
            .select(
                F.max(
                    F.array_max(
                        F.zip_with(
                            "embedding",
                            "qvec",
                            lambda x, q: F.abs(
                                x.cast("double")
                                - q.cast("double") * F.col("dequant_scale")
                            ),
                        )
                    )
                    / F.col("dequant_scale")
                ).alias("worst")
            )
            .collect()
        )
        assert joined[0].worst <= 0.5 + 1e-9

    def test_range_and_extremum(self, spark, emb):
        """All codes within [-127,127]; every vector uses the full range
        (its max-|x| element maps to +/-127)."""
        qz = similarity.quantize_int8(emb)
        stats = qz.select(
            F.min(F.array_min("qvec")).alias("lo"),
            F.max(F.array_max("qvec")).alias("hi"),
            F.min(
                F.array_max(F.transform("qvec", lambda q: F.abs(q)))
            ).alias("min_peak"),
        ).collect()[0]
        assert -127 <= stats.lo and stats.hi <= 127
        assert stats.min_peak == 127

    def test_zero_vector(self, spark):
        df = spark.createDataFrame(
            [Row(vec_id=1, embedding=[0.0, 0.0, 0.0])]
        )
        r = similarity.quantize_int8(df).collect()[0]
        assert r.qvec == [0, 0, 0] and r.dequant_scale == 0.0

    def test_quantized_topk_agrees_with_exact_mostly(self, spark, emb):
        """int8 shortlist must keep >=80% of the true top-5 on the
        fixtures (it's the shortlist pass, not the final ranking)."""
        exact = {
            (r.query_id, r.corpus_id)
            for r in similarity.cosine_topk(
                emb, emb.filter(F.col("vec_id") < 8), k=5
            ).collect()
        }
        quant = {
            (r.query_id, r.corpus_id)
            for r in similarity.quantized_topk(
                emb, emb.filter(F.col("vec_id") < 8), k=5
            ).collect()
        }
        assert len(exact & quant) / len(exact) >= 0.8


class TestSemanticDedup:
    def _planted(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        base = rng.standard_normal((20, 16))
        rows = [
            Row(vec_id=i, embedding=[float(x) for x in base[i]])
            for i in range(20)
        ]
        # vec 100/101: near-copies of vec 3 (tiny perturbation)
        for j, vid in enumerate((100, 101)):
            rows.append(
                Row(
                    vec_id=vid,
                    embedding=[
                        float(x + 0.001 * (j + 1)) for x in base[3]
                    ],
                )
            )
        return spark.createDataFrame(rows)

    def test_planted_near_copies_pruned(self, spark):
        out = {
            r.vec_id: r
            for r in similarity.semantic_dedup(
                self._planted(spark), threshold=0.95, n_centroids=4
            ).collect()
        }
        assert len(out) == 22
        assert out[3].keep  # lowest id in the duplicate group survives
        assert not out[100].keep and not out[101].keep
        assert out[100].dup_of == 3
        # random gaussians in 16-dim are far below 0.95 cosine
        assert all(r.keep for v, r in out.items() if v not in (100, 101))

    def test_deterministic(self, spark):
        df = self._planted(spark)
        a = sorted(
            similarity.semantic_dedup(df, 0.95, 4).collect(),
            key=lambda r: r.vec_id,
        )
        b = sorted(
            similarity.semantic_dedup(df, 0.95, 4).collect(),
            key=lambda r: r.vec_id,
        )
        assert [(r.vec_id, r.keep, r.dup_of) for r in a] == [
            (r.vec_id, r.keep, r.dup_of) for r in b
        ]


class TestEwma:
    def test_matches_reference_recursion(self, spark):
        rows = [
            Row(user_id=1, ts=i, value=float(v))
            for i, v in enumerate([10.0, 20.0, 0.0, 5.0])
        ] + [Row(user_id=2, ts=0, value=7.0)]
        out = {
            (r.user_id, r.ts): r.ewma
            for r in temporal.ewma(
                spark.createDataFrame(rows), "user_id", "ts", "value", alpha=0.5
            ).collect()
        }
        # hand recursion, alpha=0.5: 10, 15, 7.5, 6.25
        y, a = None, 0.5
        for i, v in enumerate([10.0, 20.0, 0.0, 5.0]):
            y = v if y is None else a * v + (1 - a) * y
            assert out[(1, i)] == pytest.approx(y, abs=0)
        assert out[(2, 0)] == 7.0

    def test_row_count_preserved(self, spark, events):
        n = events.count()
        assert temporal.ewma(events).count() == n


class TestProfiling:
    def test_nulls_distinct_minmax(self, spark):
        from dlt_salesforce_iceberg_rest_demo_spark.operators.profiling import (
            profile_table,
        )

        df = spark.createDataFrame(
            [
                Row(a=1, b="x"),
                Row(a=1, b=None),
                Row(a=3, b="y"),
            ]
        )
        prof = {r.column: r for r in profile_table(df).collect()}
        assert prof["a"].n_rows == 3 and prof["a"].n_null == 0
        assert prof["a"].n_distinct == 2
        assert prof["a"].min_value == "1" and prof["a"].max_value == "3"
        assert prof["b"].n_null == 1 and prof["b"].n_distinct == 2
        assert prof["b"].min_value == "x" and prof["b"].max_value == "y"

    def test_single_aggregation_pass(self, spark, events):
        from dlt_salesforce_iceberg_rest_demo_spark.operators.profiling import (
            profile_table,
        )

        import contextlib, io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            profile_table(events, ["user_id", "event_type"]).explain("simple")
        plan = buf.getvalue()
        # one scan of the input, however many Expand/agg stages follow
        assert plan.count("Scan parquet") == 1


class TestTokenRunsUDTF:
    def test_planted_runs(self, spark):
        from dlt_salesforce_iceberg_rest_demo_spark.functions.udtfs import token_runs

        docs = spark.createDataFrame(
            [Row(doc_id=1, text="a a a b a"), Row(doc_id=2, text="x")]
        )
        rows = sorted(
            token_runs(spark, docs).collect(),
            key=lambda r: (r.doc_id, r.run_start),
        )
        assert [(r.doc_id, r.token, r.run_start, r.run_len) for r in rows] == [
            (1, "a", 0, 3),
            (1, "b", 3, 1),
            (1, "a", 4, 1),
            (2, "x", 0, 1),
        ]

    def test_total_lengths_reconstruct(self, spark, docs):
        from dlt_salesforce_iceberg_rest_demo_spark.functions.udtfs import token_runs

        runs = token_runs(spark, docs).groupBy("doc_id").agg(
            F.sum("run_len").alias("n")
        )
        toks = docs.select(
            "doc_id", F.size(F.split(F.lower("text"), " ")).alias("n")
        )
        assert runs.join(toks, "doc_id").filter(
            runs["n"] != toks["n"]
        ).count() == 0


class TestHeavyHitters:
    def test_mg_guarantees_on_skewed_data(self, spark):
        """Every key with true count > n/capacity must appear, with
        estimate in [c - n/capacity, c]."""
        from dlt_salesforce_iceberg_rest_demo_spark.operators.sketches import (
            heavy_hitters,
        )

        # zipf-ish: key 0 x 5000, key 1 x 2000, key 2 x 1000, tail unique
        rows = (
            [Row(k=0)] * 5000 + [Row(k=1)] * 2000 + [Row(k=2)] * 1000
            + [Row(k=100 + i) for i in range(2000)]
        )
        df = spark.createDataFrame(rows).repartition(8)
        n = len(rows)
        cap = 64
        out = {r.key: r for r in heavy_hitters(df, "k", capacity=cap, k=10).collect()}
        truth = {0: 5000, 1: 2000, 2: 1000}
        for key, c in truth.items():
            assert c > n / cap  # premise: they are true heavy hitters
            assert key in out, f"heavy hitter {key} missing"
            assert c - n / cap <= out[key].est <= c
        assert out[0].max_underestimate == pytest.approx(n / cap)

    def test_exact_when_capacity_exceeds_cardinality(self, spark):
        from dlt_salesforce_iceberg_rest_demo_spark.operators.sketches import (
            heavy_hitters,
        )

        rows = [Row(k=i % 5) for i in range(500)]
        out = heavy_hitters(
            spark.createDataFrame(rows).repartition(4), "k", capacity=64, k=5
        ).collect()
        assert {r.key: r.est for r in out} == {i: 100 for i in range(5)}


class TestRareTokenFraction:
    def test_planted_rare_and_common(self, spark):
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="common zzzq common"),
                Row(doc_id=2, text="common common"),
                Row(doc_id=3, text="common"),
            ]
        )
        out = {r.doc_id: r for r in text.rare_token_fraction(docs, max_df=1).collect()}
        # 'common' appears in 3 docs (df=3, not rare); 'zzzq' df=1 (rare)
        assert out[1].n_distinct_tokens == 2 and out[1].n_rare_tokens == 1
        assert out[1].rare_fraction == pytest.approx(0.5)
        assert out[2].n_rare_tokens == 0 and out[3].n_rare_tokens == 0


class TestPackSequences:
    def _packed(self, spark, max_tokens=10, num_partitions=2):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import text as text_ops

        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * n)) for i, n in enumerate(
                [3, 7, 2, 9, 5, 5, 1, 4, 8, 6], start=1
            )],
            ["doc_id", "text"],
        )
        return text_ops.pack_sequences(
            docs, max_tokens=max_tokens, num_partitions=num_partitions
        )

    def test_every_doc_assigned_once_and_bins_fit(self, spark):
        rows = self._packed(spark).collect()
        assert sorted(r.doc_id for r in rows) == list(range(1, 11))
        fills: dict = {}
        for r in rows:
            fills[r.bin_id] = fills.get(r.bin_id, 0) + r.n_tokens
        assert all(v <= 10 for v in fills.values()), fills

    def test_deterministic_across_runs(self, spark):
        a = {(r.doc_id, r.bin_id) for r in self._packed(spark).collect()}
        b = {(r.doc_id, r.bin_id) for r in self._packed(spark).collect()}
        assert a == b

    def test_long_doc_truncated_to_capacity(self, spark):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import text as text_ops

        docs = spark.createDataFrame([(1, " ".join(["w"] * 50))], ["doc_id", "text"])
        rows = text_ops.pack_sequences(docs, max_tokens=10, num_partitions=1).collect()
        assert len(rows) == 1 and rows[0].n_tokens == 10

    def test_ffd_fills_tightly(self, spark):
        # sizes 9,8,7,6,5,5,4,3,2,1 into cap-10 bins: FFD in one
        # partition packs 50 tokens into exactly 5 full bins
        from dlt_salesforce_iceberg_rest_demo_spark.operators import text as text_ops

        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * n)) for i, n in enumerate(
                [9, 8, 7, 6, 5, 5, 4, 3, 2, 1], start=1
            )],
            ["doc_id", "text"],
        )
        rows = text_ops.pack_sequences(docs, max_tokens=10, num_partitions=1).collect()
        fills: dict = {}
        for r in rows:
            fills[r.bin_id] = fills.get(r.bin_id, 0) + r.n_tokens
        assert len(fills) == 5 and all(v == 10 for v in fills.values())


class TestProductQuantization:
    def test_pq_recall_vs_exact(self, spark, emb):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import similarity

        q = emb.filter(F.col("vec_id") < 8)
        exact = similarity.cosine_topk(emb, q, k=5).collect()
        pq = similarity.pq_topk(emb, q, k=5).collect()
        ex: dict[int, set] = {}
        got: dict[int, set] = {}
        for r in exact:
            ex.setdefault(r.query_id, set()).add(r.corpus_id)
        for r in pq:
            got.setdefault(r.query_id, set()).add(r.corpus_id)
        recall = sum(
            len(ex[k] & got.get(k, set())) / len(ex[k]) for k in ex
        ) / len(ex)
        assert recall >= 0.8, recall
        # every query returns exactly k ranked rows, rank 1..5
        for k_, rows in got.items():
            assert len(rows) == 5

    def test_pq_codes_shape_and_determinism(self, spark, emb):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import similarity

        books = similarity.pq_fit(emb, m=16, n_codes=16, iters=1)
        assert len(books) == 16
        assert all(len(b) == 16 and len(b[0]) == 4 for b in books)
        enc = similarity._pq_encode_udf(books)
        c1 = emb.select(
            "vec_id", enc(F.col("embedding")).alias("codes")
        ).collect()
        c2 = emb.select(
            "vec_id", enc(F.col("embedding")).alias("codes")
        ).collect()
        m1 = {r.vec_id: list(r.codes) for r in c1}
        m2 = {r.vec_id: list(r.codes) for r in c2}
        assert m1 == m2
        assert all(0 <= x < 16 for codes in m1.values() for x in codes)

    def test_pq_fit_rejects_indivisible_m(self, spark, emb):
        """ADVICE r9: dim % m != 0 used to crash deep inside the Lloyd
        update (all-NULL codes -> TypeError on a None index); it must
        fail up front with the actual contract."""
        import pytest as _pytest

        from dlt_salesforce_iceberg_rest_demo_spark.operators import similarity

        with _pytest.raises(ValueError, match="not divisible"):
            similarity.pq_fit(emb, m=7, n_codes=8, iters=1)


class TestScd2:
    def test_intervals_and_current_flag(self, spark):
        from dlt_salesforce_iceberg_rest_demo_spark.operators.scd import (
            scd2_from_snapshots,
        )

        rows = [
            # key 1: a, a, b, a  -> three runs
            (1, "a", "2024-01-01 00:00:00", 1),
            (1, "a", "2024-01-01 01:00:00", 2),
            (1, "b", "2024-01-01 02:00:00", 3),
            (1, "a", "2024-01-01 03:00:00", 4),
            # key 2: single observation
            (2, "x", "2024-01-01 00:30:00", 5),
        ]
        df = spark.createDataFrame(
            rows, "k long, attr string, ts string, id long"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = scd2_from_snapshots(df, "k", "attr", "ts", "id").collect()
        by_key = {}
        for r in sorted(out, key=lambda r: (r.k, r.valid_from)):
            by_key.setdefault(r.k, []).append(r)
        h1 = by_key[1]
        assert [r.attr for r in h1] == ["a", "b", "a"]
        assert [r.n_observations for r in h1] == [2, 1, 1]
        # intervals chain: valid_to == next valid_from; last is open
        assert h1[0].valid_to == h1[1].valid_from
        assert h1[1].valid_to == h1[2].valid_from
        assert h1[2].valid_to is None and h1[2].is_current
        assert not h1[0].is_current and not h1[1].is_current
        h2 = by_key[2]
        assert len(h2) == 1 and h2[0].is_current and h2[0].n_observations == 1

    def test_timestamp_ties_break_on_id(self, spark):
        from dlt_salesforce_iceberg_rest_demo_spark.operators.scd import (
            scd2_from_snapshots,
        )

        rows = [
            (1, "a", "2024-01-01 00:00:00", 2),
            (1, "b", "2024-01-01 00:00:00", 1),  # same ts, lower id first
        ]
        df = spark.createDataFrame(
            rows, "k long, attr string, ts string, id long"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = sorted(
            scd2_from_snapshots(df, "k", "attr", "ts", "id").collect(),
            key=lambda r: not r.is_current,
        )
        # id=1 ("b") sorts first, so "a" is the current run
        assert [r.attr for r in out] == ["a", "b"]


class TestExpectations:
    def test_violations_counted_per_check(self, spark):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import expectations

        rows = [
            (1, 10.0, "ok", 1),
            (1, -5.0, "ok", 2),     # dup id, below range
            (None, 3.0, "bad", 3),  # null id, invalid status
            (4, 999.0, "ok", 99),   # orphan FK
        ]
        df = spark.createDataFrame(rows, "id long, v double, status string, fk long")
        dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
        r = expectations.check_report(
            df,
            not_null=["id"],
            unique=["id"],
            ranges={"v": (0, 100)},
            allowed={"status": ["ok"]},
            references={"fk": (dim, "k")},
        ).collect()[0]
        assert r.n_rows == 4
        assert r.null_id == 1
        assert r.dup_id == 1      # two rows share id=1 (null not counted)
        assert r.range_v == 2     # -5 and 999
        assert r.invalid_status == 1
        assert r.orphan_fk == 1   # fk=99


class TestOrderedFunnel:
    def test_funnel_counts_ordered_completion(self, spark):
        from dlt_salesforce_iceberg_rest_demo_spark.operators.funnel import (
            ordered_funnel,
            ordered_funnel_df,
        )

        rows = [
            # user 1 completes a->b->c in order
            (1, "a", "2024-01-01 00:00:00"),
            (1, "b", "2024-01-01 01:00:00"),
            (1, "c", "2024-01-01 02:00:00"),
            # user 2 does b BEFORE a: b must not count
            (2, "b", "2024-01-01 00:00:00"),
            (2, "a", "2024-01-01 01:00:00"),
            # user 3 only a
            (3, "a", "2024-01-01 00:00:00"),
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {
            r.step: r.n_users
            for r in ordered_funnel(ev, ["a", "b", "c"]).collect()
        }
        assert got == {"a": 3, "b": 1, "c": 1}
        lazy = {
            r.step: r.n_users
            for r in ordered_funnel_df(ev, ["a", "b", "c"]).collect()
        }
        assert lazy == got


class TestAsofJoinForward:
    """Forward as-of join: earliest right row >= left ts, deterministic
    ties, inclusive tolerance boundary, no-match nulls."""

    def _mk(self, spark, rows):
        import datetime

        from pyspark.sql import Row

        return spark.createDataFrame(
            [
                Row(
                    user_id=u,
                    event_id=i,
                    ts=datetime.datetime(2024, 1, 1, 0, m, s),
                    value=float(v),
                )
                for (u, i, m, s, v) in rows
            ]
        )

    def test_earliest_following_inclusive_and_ties(self, spark):
        left = self._mk(spark, [(1, 100, 10, 0, 0)])
        # right rows: one BEFORE (never matches), two at the same
        # later instant (tie -> min event_id), one even later.
        right = self._mk(
            spark, [(1, 1, 5, 0, 1), (1, 3, 20, 0, 3), (1, 2, 20, 0, 2), (1, 4, 30, 0, 4)]
        )
        out = temporal.asof_join_forward(
            left, right, on="user_id", right_cols=["event_id", "value"],
            tie_col="event_id",
        ).collect()
        assert len(out) == 1
        assert out[0].event_id_next == 2 and out[0].value_next == 2.0

    def test_equal_ts_is_inclusive(self, spark):
        left = self._mk(spark, [(1, 100, 10, 0, 0)])
        right = self._mk(spark, [(1, 7, 10, 0, 7)])
        row = temporal.asof_join_forward(
            left, right, on="user_id", right_cols=["event_id"], tie_col="event_id"
        ).collect()[0]
        assert row.event_id_next == 7

    def test_tolerance_boundary_inclusive_then_exclusive(self, spark):
        left = self._mk(spark, [(1, 100, 0, 0, 0)])
        at_horizon = self._mk(spark, [(1, 7, 10, 0, 7)])  # exactly 600s later
        row = temporal.asof_join_forward(
            left, at_horizon, on="user_id", right_cols=["event_id"],
            tie_col="event_id", tolerance_seconds=600,
        ).collect()[0]
        assert row.event_id_next == 7  # inclusive horizon
        row = temporal.asof_join_forward(
            left, at_horizon, on="user_id", right_cols=["event_id"],
            tie_col="event_id", tolerance_seconds=599,
        ).collect()[0]
        assert row.event_id_next is None  # beyond horizon -> nulled

    def test_no_following_match_is_null(self, spark):
        left = self._mk(spark, [(1, 100, 10, 0, 0)])
        only_prior = self._mk(spark, [(1, 7, 5, 0, 7)])
        row = temporal.asof_join_forward(
            left, only_prior, on="user_id", right_cols=["event_id"],
            tie_col="event_id",
        ).collect()[0]
        assert row.event_id_next is None


class TestBinaryCodecs:
    """Pure-python PNG/WAV/BMP codecs + real binaryFile ingestion."""

    def test_bmp_roundtrip_non_multiple_of_four_width(self):
        """8-bit palettized BMP: bottom-up storage and 4-byte row
        padding must round-trip to top-down unpadded pixels — width 6
        forces 2 pad bytes per row."""
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        pix = bytes(range(6 * 5))
        data = mm.encode_bmp_gray(pix, 6, 5)
        assert data[:2] == b"BM"
        w, h, out = mm.decode_bmp_gray(data)
        assert (w, h) == (6, 5)
        assert out == pix

    def test_bmp_ingest_meta_and_stats(self, spark, tmp_path):
        """binaryFile ingestion parses BMP width/height from the
        little-endian header JVM-side and decode stats route through
        the real BMP decoder."""
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        pix = bytes([3] * (8 * 4))
        (tmp_path / "z.bmp").write_bytes(mm.encode_bmp_gray(pix, 8, 4))
        df = mm.ingest_binary_dir(spark, str(tmp_path))
        row = df.collect()[0]
        assert row.meta.format == "bmp" and row.meta.modality == "image"
        assert (row.meta.width, row.meta.height) == (8, 4)
        stats = mm.decode_binary_stats(df).collect()[0]
        assert (stats.modality, stats.n_values, stats.val_sum) == ("image", 32, 96)

    def test_png_roundtrip(self):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        pix = bytes(range(256))
        data = mm.encode_png_gray(pix, 16, 16)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        w, h, out = mm.decode_png_gray(data)
        assert (w, h, out) == (16, 16, pix)

    def test_wav_roundtrip(self):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        samples = bytes([0, 127, 255, 64] * 16)
        data = mm.encode_wav_pcm8(samples, rate=8000)
        rate, out = mm.decode_wav_pcm8(data)
        assert rate == 8000 and out == samples

    def test_ingest_parses_meta_jvm_side(self, spark, tmp_path):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        (tmp_path / "a.png").write_bytes(mm.encode_png_gray(bytes(64), 8, 8))
        (tmp_path / "b.wav").write_bytes(mm.encode_wav_pcm8(bytes(32), rate=44100))
        rows = {
            r.file_name: r.meta.asDict()
            for r in mm.ingest_binary_dir(spark, str(tmp_path)).collect()
        }
        assert rows["a.png"]["format"] == "png"
        assert rows["a.png"]["modality"] == "image"
        assert (rows["a.png"]["width"], rows["a.png"]["height"]) == (8, 8)
        assert rows["a.png"]["sample_rate"] is None
        assert rows["a.png"]["channels"] == 1  # IHDR color type 0
        assert rows["b.wav"]["format"] == "wav"
        assert rows["b.wav"]["modality"] == "audio"
        assert rows["b.wav"]["sample_rate"] == 44100
        assert rows["b.wav"]["width"] is None
        assert rows["b.wav"]["channels"] == 1  # mono PCM

    def test_decode_stats_match_known_values(self, spark, tmp_path):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        pix = bytes([1] * 256)
        (tmp_path / "x.png").write_bytes(mm.encode_png_gray(pix, 16, 16))
        (tmp_path / "y.wav").write_bytes(mm.encode_wav_pcm8(bytes([2] * 10)))
        stats = {
            r.file_name: (r.modality, r.n_values, r.val_sum)
            for r in mm.decode_binary_stats(
                mm.ingest_binary_dir(spark, str(tmp_path))
            ).collect()
        }
        assert stats["x.png"] == ("image", 256, 256)
        assert stats["y.wav"] == ("audio", 10, 20)

    def test_fixture_writer_idempotent(self, spark, tmp_path):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm
        from pyspark.sql import Row

        docs = spark.createDataFrame(
            [Row(doc_id=0, text="hello world"), Row(doc_id=20, text="abc"),
             Row(doc_id=7, text="skipped")]
        )
        n1 = mm.write_binary_fixtures(docs, str(tmp_path / "fx"))
        n2 = mm.write_binary_fixtures(docs, str(tmp_path / "fx"))
        assert n1 == n2 == 2
        names = sorted(p.name for p in (tmp_path / "fx").glob("doc_*"))
        assert names == ["doc_0.bmp", "doc_0.jfif", "doc_0.jpg",
                         "doc_0.png", "doc_0.wav",
                         "doc_20.bmp", "doc_20.jfif", "doc_20.jpg",
                         "doc_20.png", "doc_20.wav"]

    def test_fixture_writer_regenerates_on_content_change(self, spark, tmp_path):
        """Equal doc COUNT with changed text must regenerate: the
        idempotence marker is a content digest, so stale PNG/WAV bytes
        can't be silently served after a fixture-corpus change."""
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm
        from pyspark.sql import Row

        out = str(tmp_path / "fx")
        mm.write_binary_fixtures(
            spark.createDataFrame([Row(doc_id=0, text="before")]), out
        )
        png_v1 = (tmp_path / "fx" / "doc_0.png").read_bytes()
        mm.write_binary_fixtures(
            spark.createDataFrame([Row(doc_id=0, text="after!")]), out
        )
        png_v2 = (tmp_path / "fx" / "doc_0.png").read_bytes()
        assert png_v1 != png_v2

    def test_fixture_writer_removes_stale_files_on_shrink(self, spark, tmp_path):
        """A shrunk doc set must DELETE the vanished docs' files on
        regeneration — orphan doc_* files would still be read by
        ingest_binary_dir and break oracle counts/sums."""
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm
        from pyspark.sql import Row

        out = str(tmp_path / "fx")
        mm.write_binary_fixtures(
            spark.createDataFrame(
                [Row(doc_id=0, text="keep"), Row(doc_id=20, text="drop")]
            ),
            out,
        )
        mm.write_binary_fixtures(
            spark.createDataFrame([Row(doc_id=0, text="keep")]), out
        )
        names = sorted(p.name for p in (tmp_path / "fx").glob("doc_*"))
        assert names == ["doc_0.bmp", "doc_0.jfif", "doc_0.jpg",
                         "doc_0.png", "doc_0.wav"]

    def test_jpeg_near_lossless_roundtrip_all_ones_quant(self):
        """At the all-ones quant table the only loss is DCT float
        rounding: |err| <= 2 per pixel on arbitrary (worst-case
        high-frequency) content, dims exact, decode deterministic."""
        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        rng = np.random.RandomState(7)
        for w, h in [(16, 16), (6, 5), (24, 9), (1, 1)]:
            pix = rng.randint(0, 256, size=w * h, dtype=np.uint8).tobytes()
            data = mm.encode_jpeg_gray(pix, w, h)
            assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
            w2, h2, out = mm.decode_jpeg_gray(data)
            assert (w2, h2) == (w, h)
            err = np.abs(
                np.frombuffer(out, np.uint8).astype(int)
                - np.frombuffer(pix, np.uint8).astype(int)
            )
            assert err.max() <= 2
            assert mm.decode_jpeg_gray(data)[2] == out  # deterministic

    def test_jpeg_standard_table_lossy_but_deterministic(self):
        """The Annex-K luminance table path: genuinely lossy (smaller
        file than the near-lossless setting), deterministic bytes,
        dims preserved, smooth-content error bounded."""
        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        pix = bytes(range(256))  # smooth gradient
        d1 = mm.encode_jpeg_gray(pix, 16, 16, quant=mm.JPEG_STD_LUMA_QUANT)
        d2 = mm.encode_jpeg_gray(pix, 16, 16, quant=mm.JPEG_STD_LUMA_QUANT)
        assert d1 == d2
        assert len(d1) < len(mm.encode_jpeg_gray(pix, 16, 16))
        w, h, out = mm.decode_jpeg_gray(d1)
        assert (w, h) == (16, 16)
        err = np.abs(
            np.frombuffer(out, np.uint8).astype(int)
            - np.frombuffer(pix, np.uint8).astype(int)
        )
        assert err.max() <= 16  # quantization-scale error on smooth data

    def test_jpeg_decoder_reads_16bit_quant_tables(self):
        """Foreign encoders emit Pq=1 (16-bit big-endian) DQT entries;
        the decoder must read them (round 6 — previously
        NotImplementedError). Surgery: widen our encoder's 8-bit table
        to 16 bits in place; the decode must be pixel-identical."""
        import struct

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        pix = bytes(range(64)) * 4  # 16x16
        base = mm.encode_jpeg_gray(pix, 16, 16)
        dqt = base.find(b"\xff\xdb")
        (ln,) = struct.unpack(">H", base[dqt + 2 : dqt + 4])
        assert ln == 67  # 2 len + 1 pq/tq + 64 entries
        vals = base[dqt + 5 : dqt + 5 + 64]
        wide = (
            base[:dqt]
            + b"\xff\xdb"
            + struct.pack(">H", 2 + 1 + 128)
            + bytes([0x10 | (base[dqt + 4] & 0x0F)])
            + struct.pack(">64H", *vals)
            + base[dqt + 4 + ln - 2 :]
        )
        assert mm.decode_jpeg_gray(wide) == mm.decode_jpeg_gray(base)
        with pytest.raises(ValueError, match="invalid DQT precision"):
            bad = bytearray(wide)
            bad[dqt + 4] = 0x20 | (bad[dqt + 4] & 0x0F)
            mm.decode_jpeg_gray(bytes(bad))

    def test_jpeg_restart_intervals_round_trip(self):
        """DRI/RSTn (round 6 — previously NotImplementedError): encode
        with restart intervals and decode back; pixels must equal the
        no-restart encoding's decode exactly (restarts change framing,
        never content). Checks marker presence, cyclic RST numbering,
        odd intervals (restart mid-row), and a truncated-segment
        error."""
        import pytest

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        pix = bytes((x * 7 + 13) % 256 for x in range(24 * 16))  # 24x16: 6 MCUs
        plain = mm.decode_jpeg_gray(mm.encode_jpeg_gray(pix, 24, 16))
        for ri in (1, 2, 3, 5):
            data = mm.encode_jpeg_gray(pix, 24, 16, restart_interval=ri)
            assert b"\xff\xdd" in data
            n_rst = sum(
                data.count(bytes([0xFF, 0xD0 + k])) for k in range(8)
            )
            assert n_rst == (6 - 1) // ri
            assert mm.decode_jpeg_gray(data) == plain
        # 9 restarts exercise the cyclic wrap RST7 -> RST0
        wide = bytes((x * 3 + 5) % 256 for x in range(88 * 8))  # 11 MCUs
        data = mm.encode_jpeg_gray(wide, 88, 8, restart_interval=1)
        assert bytes([0xFF, 0xD0]) in data and bytes([0xFF, 0xD7]) in data
        assert mm.decode_jpeg_gray(data) == mm.decode_jpeg_gray(
            mm.encode_jpeg_gray(wide, 88, 8)
        )
        # a stream whose restart marker was stripped must fail loudly
        broken = data.replace(bytes([0xFF, 0xD0]), b"", 1)
        with pytest.raises(ValueError):
            mm.decode_jpeg_gray(broken)

    def test_jpeg_progressive_round_trip_default_script(self):
        """SOF2 decode (round 6 — previously NotImplementedError):
        progressive coding is lossless given the quantized
        coefficients, so decoding the progressive encoding must be
        BIT-IDENTICAL to decoding the baseline encoding — busy content,
        non-multiple-of-8 dims, both quant settings."""
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        pix = bytes((x * 37 + (x // 29) * 11) % 256 for x in range(29 * 21))
        for q in (None, mm.JPEG_STD_LUMA_QUANT):
            base = mm.decode_jpeg_gray(mm.encode_jpeg_gray(pix, 29, 21, quant=q))
            prog = mm.encode_jpeg_gray_progressive(pix, 29, 21, quant=q)
            assert b"\xff\xc2" in prog
            assert prog.count(b"\xff\xda") == 6  # the 6-scan script
            assert mm.decode_jpeg_gray(prog) == base
        # deterministic bytes
        assert mm.encode_jpeg_gray_progressive(
            pix, 29, 21
        ) == mm.encode_jpeg_gray_progressive(pix, 29, 21)

    def test_jpeg_progressive_custom_scan_scripts(self):
        """Spectral-selection-only, deep successive approximation, and
        many-band scripts all decode to the same pixels; smooth content
        exercises long EOB runs (all-zero high bands across blocks),
        busy content exercises ZRL + refinement correction paths."""
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        scripts = [
            [(0, 0, 0, 0), (1, 63, 0, 0)],  # spectral selection only
            [(0, 0, 0, 3), (0, 0, 3, 2), (0, 0, 2, 1), (0, 0, 1, 0),
             (1, 63, 0, 2), (1, 63, 2, 1), (1, 63, 1, 0)],  # deep SA
            [(0, 0, 0, 1), (0, 0, 1, 0)]
            + [(a, b, 0, 0) for a, b in
               [(1, 2), (3, 7), (8, 20), (21, 40), (41, 63)]],  # many bands
        ]
        smooth = bytes(min(255, (x % 40) + (x // 40)) for x in range(40 * 24))
        busy = bytes((x * 73 + (x // 17) * 41) % 256 for x in range(40 * 24))
        for pix in (smooth, busy):
            base = mm.decode_jpeg_gray(mm.encode_jpeg_gray(pix, 40, 24))
            for script in scripts:
                got = mm.decode_jpeg_gray(
                    mm.encode_jpeg_gray_progressive(pix, 40, 24, scans=script)
                )
                assert got == base, script

    def test_jpeg_progressive_randomized_scan_scripts(self):
        """Seeded stress: 25 random (dims, pixels, quant, scan script)
        combinations — random DC successive-approximation chains,
        random spectral band splits, random AC approximation depths —
        every progressive encoding must decode bit-identically to the
        baseline encoding's decode (progressive coding is lossless
        given the coefficients; any bit error desyncs the Huffman
        stream and fails loudly rather than approximately)."""
        import random

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        rng = random.Random(99)
        for _ in range(25):
            w = rng.choice([8, 16, 17, 24, 31])
            h = rng.choice([8, 16, 23])
            pix = bytes(rng.randrange(256) for _ in range(w * h))
            al_dc = rng.randint(0, 2)
            scans = [(0, 0, 0, al_dc)] + [
                (0, 0, a, a - 1) for a in range(al_dc, 0, -1)
            ]
            cuts = sorted(rng.sample(range(2, 63), rng.randint(0, 2)))
            lo, bands = 1, []
            for c in cuts:
                bands.append((lo, c))
                lo = c + 1
            bands.append((lo, 63))
            al_ac = rng.randint(0, 2)
            scans += [(a, b, 0, al_ac) for a, b in bands]
            scans += [(1, 63, a, a - 1) for a in range(al_ac, 0, -1)]
            q = mm.JPEG_STD_LUMA_QUANT if rng.random() < 0.5 else None
            base = mm.decode_jpeg_gray(mm.encode_jpeg_gray(pix, w, h, quant=q))
            got = mm.decode_jpeg_gray(
                mm.encode_jpeg_gray_progressive(pix, w, h, quant=q, scans=scans)
            )
            assert got == base, (w, h, scans)

    def test_jpeg_progressive_ingest_and_decode_stats(self, spark, tmp_path):
        """A progressive file flows through the whole Spark path:
        binaryFile ingest parses dims JVM-side from the SOF2 header
        (the segment walk accepts C0 and C2), and decode stats route
        through the multi-scan decoder — equal to the baseline twin's
        stats on the same pixels."""
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        pix = bytes([9] * (16 * 24))
        (tmp_path / "p.jpg").write_bytes(
            mm.encode_jpeg_gray_progressive(pix, 16, 24)
        )
        df = mm.ingest_binary_dir(spark, str(tmp_path), glob="*.jpg")
        row = df.collect()[0]
        assert row.meta.format == "jpeg"
        assert (row.meta.width, row.meta.height) == (16, 24)
        stats = mm.decode_binary_stats(df).collect()[0]
        assert (stats.modality, stats.n_values) == ("image", 16 * 24)
        assert stats.val_sum == 9 * 16 * 24  # constant image: exact

    def test_jpeg_decoder_refuses_unsupported_processes(self):
        import struct

        import pytest

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        base = bytearray(mm.encode_jpeg_gray(bytes(64), 8, 8))
        sof = base.find(b"\xff\xc0")
        ext = bytearray(base)
        ext[sof + 1] = 0xC1  # SOF0 -> SOF1 (extended sequential)
        with pytest.raises(NotImplementedError, match="SOF0"):
            mm.decode_jpeg_gray(bytes(ext))
        # round-7: 3-component YCbCr now DECODES, so claiming ncomp=3
        # in a frame header that only carries one component spec is a
        # MALFORMED stream (short SOF), not an unsupported feature
        multi = bytearray(base)
        multi[sof + 9] = 3  # ncomp 1 -> 3, but SOF body stays 9 bytes
        with pytest.raises(ValueError, match="truncated SOF"):
            mm.decode_jpeg_gray(bytes(multi))
        cmyk = bytearray(base)
        cmyk[sof + 9] = 4  # 4-component (CMYK/Adobe) stays a seam
        with pytest.raises(NotImplementedError, match="grayscale"):
            mm.decode_jpeg_gray(bytes(cmyk))
        # a BASELINE scan header mislabeled as progressive (SOF2) is a
        # malformed stream, not an unsupported feature: Se=63 in a DC
        # scan must fail loudly (round 6 — SOF2 itself now decodes)
        prog = bytearray(base)
        prog[sof + 1] = 0xC2
        with pytest.raises(ValueError, match="Se=0"):
            mm.decode_jpeg_gray(bytes(prog))
        assert struct.unpack(">HH", base[sof + 5 : sof + 9]) == (8, 8)

    def test_jpeg_ingest_meta_jvm_side_and_decode_stats(self, spark, tmp_path):
        """binaryFile ingestion locates SOF0 via the byte-aligned hex
        search and parses height/width JVM-side; decode stats route
        through the real entropy decoder."""
        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        pix = bytes([5] * (16 * 16))
        (tmp_path / "q.jpg").write_bytes(mm.encode_jpeg_gray(pix, 16, 16))
        df = mm.ingest_binary_dir(spark, str(tmp_path), glob="*.jpg")
        row = df.collect()[0]
        assert row.meta.format == "jpeg" and row.meta.modality == "image"
        assert (row.meta.width, row.meta.height) == (16, 16)
        stats = mm.decode_binary_stats(df).collect()[0]
        assert (stats.modality, stats.n_values) == ("image", 256)
        # constant image: DCT rounding error vanishes -> exact sum
        assert stats.val_sum == 5 * 256

    def test_jpeg_sof0_locate_rejects_stray_and_unaligned_hits(
        self, spark, tmp_path
    ):
        """SOF0 location must be byte-aligned and validated: a stray
        FF C0 byte pair inside an earlier COM/APPn segment (foreign
        JPEGs: EXIF, custom DQT values) must not hijack the dims, a
        nibble-straddling FFC0 hex hit must not match at all, and a
        jpeg with no plausible SOF0 gets NULL dims — never garbage."""
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        # stray FF C0 in a COM segment whose following bytes are NOT a
        # plausible SOF0 (precision 0x07), then the REAL SOF0 (16x32)
        stray = b"\xff\xc0\x00\x0b\x07\x00\x99\x00\x99\x01"
        com = b"\xff\xfe" + (len(stray) + 2).to_bytes(2, "big") + stray
        sof0 = b"\xff\xc0\x00\x0b\x08\x00\x10\x00\x20\x01\x11\x00"
        (tmp_path / "stray.jpg").write_bytes(
            b"\xff\xd8" + com + sof0 + b"\xff\xd9"
        )
        # hex "0FFC0B..." contains FFC0 straddling two bytes; no real
        # SOF0 anywhere -> dims must be NULL (old locate() parsed junk)
        (tmp_path / "junk.jpg").write_bytes(
            b"\xff\xd8" + b"\x0f\xfc\x0b\x08\x00\x10\x00\x20" + b"\xff\xd9"
        )
        rows = {
            r.file_name: r.meta
            for r in mm.ingest_binary_dir(
                spark, str(tmp_path), glob="*.jpg"
            ).collect()
        }
        assert (rows["stray.jpg"].width, rows["stray.jpg"].height) == (32, 16)
        assert rows["junk.jpg"].width is None
        assert rows["junk.jpg"].height is None
        assert rows["junk.jpg"].format == "jpeg"

    def test_jpeg_sof0_segment_walk_skips_plausible_fakes(
        self, spark, tmp_path
    ):
        """Round-6 ADVICE fix: a stray FF C0 inside an APPn/EXIF payload
        whose following bytes LOOK like a valid SOF0 (length + precision
        0x08) used to hijack width/height under the regexp scan; the
        segment-chain walk hops over the whole payload by its declared
        length and never visits it. A file whose only FFC0 is such a
        fake gets NULL dims, not the fake's."""
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        # fully plausible fake: FFC0 <len=000B> <prec=08> h=0x0099 w=0x0099
        fake = b"\xff\xc0\x00\x0b\x08\x00\x99\x00\x99\x01"
        app1 = b"\xff\xe1" + (len(fake) + 2).to_bytes(2, "big") + fake
        sof0 = b"\xff\xc0\x00\x0b\x08\x00\x10\x00\x20\x01\x11\x00"
        (tmp_path / "fake_then_real.jpg").write_bytes(
            b"\xff\xd8" + app1 + sof0 + b"\xff\xd9"
        )
        (tmp_path / "fake_only.jpg").write_bytes(
            b"\xff\xd8" + app1 + b"\xff\xda\x00\x02" + b"\xff\xd9"
        )
        # a real encoder file still parses through the walk
        (tmp_path / "real.jpg").write_bytes(
            mm.encode_jpeg_gray(bytes(8 * 24), 8, 24)
        )
        rows = {
            r.file_name: r.meta
            for r in mm.ingest_binary_dir(
                spark, str(tmp_path), glob="*.jpg"
            ).collect()
        }
        got = rows["fake_then_real.jpg"]
        assert (got.width, got.height) == (32, 16)
        assert rows["fake_only.jpg"].width is None
        assert rows["fake_only.jpg"].height is None
        assert (rows["real.jpg"].width, rows["real.jpg"].height) == (8, 24)

    def test_bmp_decoder_refuses_v5_header_and_topdown(self):
        """A valid BMP with a V4/V5 header (palette not at byte 54) or
        negative (top-down) height passes the bitcount/compression
        check but must raise, never silently mis-decode."""
        import struct

        import pytest

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        base = mm.encode_bmp_gray(bytes(16), 4, 4)
        # Rewrite as BITMAPV5HEADER (124 bytes): palette moves after it.
        palette = base[54 : 54 + 1024]
        rows = base[54 + 1024 :]
        offset = 14 + 124 + 1024
        hdr = struct.pack("<2sIHHI", b"BM", offset + len(rows), 0, 0, offset)
        info = struct.pack(
            "<IiiHHIIiiII", 124, 4, 4, 1, 8, 0, len(rows), 0, 0, 256, 0
        ) + bytes(124 - 40)
        v5 = hdr + info + palette + rows
        with pytest.raises(NotImplementedError, match="V4/V5"):
            mm.decode_bmp_gray(v5)
        topdown = bytearray(base)
        topdown[22:26] = struct.pack("<i", -4)  # negative height
        with pytest.raises(NotImplementedError, match="bottom-up"):
            mm.decode_bmp_gray(bytes(topdown))


class TestJpegForeignGolden:
    """Cross-validation against INDEPENDENT implementations (round-7
    ADVICE): golden fixtures produced by foreign encoders (libjpeg
    lineage — see tests/fixtures_jpeg/README.md) decoded by our codec,
    and our encoder's files decoded by the JVM's javax.imageio (via
    Spark's `image` data source — a decoder lineage entirely separate
    from this repo). A mirrored spec misunderstanding between our
    encoder and decoder survives self round-trips; it cannot survive
    both directions of this test class. Tolerance is ±1 grey level:
    T.81 does not pin IDCT rounding, so two correct decoders may
    differ by one level on a few pixels (never more)."""

    @staticmethod
    def _fixture(name):
        from pathlib import Path

        return Path(__file__).parent / "fixtures_jpeg" / name

    @staticmethod
    def _imageio_gray(spark, path):
        """Decode via the JVM's javax.imageio (Spark image source);
        returns (width, height, np.uint8 pixels row-major)."""
        import numpy as np

        row = (
            spark.read.format("image")
            .load(str(path))
            .select("image.*")
            .collect()[0]
        )
        assert row.nChannels == 1, "golden fixture expected grayscale"
        return row.width, row.height, np.frombuffer(bytes(row.data), np.uint8)

    def test_foreign_progressive_grayscale_matches_imageio(self, spark):
        """A real libjpeg-encoded progressive file (6-scan successive
        approximation script, 300x215): our multi-scan decoder must
        agree with javax.imageio within IDCT rounding on every pixel."""
        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        p = self._fixture("spark_mllib_grayscale_progressive.jpg")
        w, h, px = mm.decode_jpeg_gray(p.read_bytes())
        jw, jh, jpx = self._imageio_gray(spark, p)
        assert (w, h) == (jw, jh) == (300, 215)
        diff = np.abs(
            np.frombuffer(px, np.uint8).astype(int) - jpx.astype(int)
        )
        assert diff.max() <= 1
        assert (diff == 0).mean() > 0.9  # measured 0.98 exact

    def test_foreign_baseline_grayscale_exact(self):
        """The 2x2 baseline foreign file decodes to the exact pixels
        javax.imageio produces (verified: four 0x80 bytes)."""
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        p = self._fixture("ipython_2x2_baseline_gray.jpg")
        assert mm.decode_jpeg_gray(p.read_bytes()) == (2, 2, b"\x80" * 4)

    def test_our_encodings_decode_identically_in_imageio(
        self, spark, tmp_path
    ):
        """The reverse direction: files from OUR encoders (baseline,
        baseline+DRI/RSTn, progressive default script, progressive
        custom script) must decode in javax.imageio to within ±1 of
        our own decode — so the encoder emits streams foreign decoders
        read, not streams only our decoder reads."""
        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        rng = np.random.RandomState(13)
        pix = rng.randint(0, 256, size=24 * 16, dtype=np.uint8).tobytes()
        files = {
            "base.jpg": mm.encode_jpeg_gray(pix, 24, 16),
            "rst.jpg": mm.encode_jpeg_gray(pix, 24, 16, restart_interval=2),
            "prog.jpg": mm.encode_jpeg_gray_progressive(pix, 24, 16),
            "prog_custom.jpg": mm.encode_jpeg_gray_progressive(
                pix, 24, 16,
                scans=[(0, 0, 0, 0), (1, 31, 0, 1), (32, 63, 0, 1),
                       (1, 31, 1, 0), (32, 63, 1, 0)],
            ),
        }
        for name, data in files.items():
            (tmp_path / name).write_bytes(data)
        for name, data in files.items():
            w, h, ours = mm.decode_jpeg_gray(data)
            jw, jh, theirs = self._imageio_gray(spark, tmp_path / name)
            assert (w, h) == (jw, jh) == (24, 16), name
            diff = np.abs(
                np.frombuffer(ours, np.uint8).astype(int)
                - theirs.astype(int)
            )
            assert diff.max() <= 1, (name, diff.max())

    def test_jpeg_fill_bytes_before_markers_tolerated(self):
        """T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes.
        Round-7 ADVICE fix — fill bytes before the scan-terminating
        marker (EOI, or the between-scans DHT of a progressive file)
        used to leave pos on a fill byte and unpack garbage lengths."""
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        pix = bytes(range(64)) * 6
        base = mm.encode_jpeg_gray(pix, 24, 16)
        want = mm.decode_jpeg_gray(base)
        # fill bytes before EOI (terminates the entropy segment scan)
        assert base.endswith(b"\xff\xd9")
        padded = base[:-2] + b"\xff" * 3 + b"\xff\xd9"
        assert mm.decode_jpeg_gray(padded) == want
        # fill bytes between header segments (marker-loop path)
        assert base.startswith(b"\xff\xd8")
        padded2 = b"\xff\xd8" + b"\xff\xff" + base[2:]
        assert mm.decode_jpeg_gray(padded2) == want
        # progressive: fill before the DHT that terminates scan 1 (a
        # raw FF C4 cannot occur inside entropy data — FF is stuffed)
        prog = mm.encode_jpeg_gray_progressive(pix, 24, 16)
        want_p = mm.decode_jpeg_gray(prog)
        sos1 = prog.index(b"\xff\xda")
        dht2 = prog.index(b"\xff\xc4", sos1)
        padded3 = prog[:dht2] + b"\xff\xff" + prog[dht2:]
        assert mm.decode_jpeg_gray(padded3) == want_p

    def test_jpeg_invalid_ac_symbol_explicit_error(self):
        """Round-7 ADVICE fix: an AC run/size symbol with SSSS=0 and
        RRRR not in (0, 15) is stream corruption; the sequential scan
        must reject it explicitly, not via a negative-shift ValueError
        inside EXTEND."""
        import numpy as np
        import pytest

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        coefs = np.zeros((1, 64), dtype=np.int64)
        dc_table = {(1, 0): 0}          # one-bit code 0 -> size 0
        ac_table = {(1, 0): 0x10}       # one-bit code 0 -> run 1, size 0
        segments = [bytearray([0x00])]  # bits: DC '0', AC '0'
        with pytest.raises(ValueError, match="invalid AC run/size"):
            mm._jpeg_baseline_scan(coefs, segments, dc_table, ac_table, 0)


class TestJpegColor:
    """Round-7: 3-component YCbCr color JPEG — the last codec seam
    implementable without image libraries (reference has no multimodal
    surface at all; north-star scope). Encoder: JFIF color transform,
    box-averaged chroma subsampling, interleaved MCU scan order,
    per-component quant/Huffman table pairs (Annex K luma + chroma).
    Decoder: the generalized multi-component path — per-component
    coefficient grids with dummy blocks at MCU boundaries,
    interleaved AND non-interleaved scans, libjpeg-exact triangular
    chroma upsampling. Foreign-file fidelity is cross-validated
    against javax.imageio in TestJpegForeignGolden/here."""

    def test_grey_block_constant_exact_through_all_subsamplings(self):
        """Grey 8x8-tile images survive the FULL lossy color pipeline
        exactly: grey maps to (Y, 128, 128), constant blocks quantize
        losslessly at ones-quant, constant chroma survives
        subsample+upsample bit-for-bit. This exactness is what makes
        the color fixture oracle text-replayable."""
        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        rng = np.random.RandomState(3)
        for W, H in [(16, 16), (17, 13), (33, 23)]:
            tiles = np.kron(
                rng.randint(0, 256, size=(-(-H // 8), -(-W // 8)), dtype=np.uint8),
                np.ones((8, 8), np.uint8),
            )[:H, :W]
            rgbt = np.stack([tiles] * 3, -1)
            for sub in [(1, 1), (2, 1), (1, 2), (2, 2)]:
                data = mm.encode_jpeg_color(
                    rgbt.tobytes(), W, H, subsampling=sub
                )
                w, h, c, px = mm.decode_jpeg(data)
                assert (w, h, c) == (W, H, 3)
                out = np.frombuffer(px, np.uint8).reshape(H, W, 3)
                assert (out == rgbt).all(), (W, H, sub)

    def test_arbitrary_color_bounded_error_at_ones_quant(self):
        """Worst-case random color content at the all-ones tables:
        4:4:4 error is color-transform + DCT rounding only (<= 3 per
        channel); decode is deterministic."""
        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        rng = np.random.RandomState(7)
        rgb = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
        data = mm.encode_jpeg_color(rgb.tobytes(), 16, 16, subsampling=(1, 1))
        w, h, c, px = mm.decode_jpeg(data)
        out = np.frombuffer(px, np.uint8).reshape(16, 16, 3)
        assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3
        assert mm.decode_jpeg(data)[3] == px

    def test_restart_intervals_round_trip_and_emit_rst(self):
        """DRI/RSTn in the interleaved color scan: restarts reset ALL
        components' DC predictions; the decode equals the plain
        encoding's decode and real RSTn markers appear whenever there
        is more than one restart segment."""
        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        rng = np.random.RandomState(5)
        rgb = rng.randint(0, 256, size=(23, 34, 3), dtype=np.uint8)
        for sub in [(2, 2), (2, 1), (1, 1)]:
            base = mm.decode_jpeg(
                mm.encode_jpeg_color(rgb.tobytes(), 34, 23, subsampling=sub)
            )
            n_mcu = (-(-34 // (8 * sub[0]))) * (-(-23 // (8 * sub[1])))
            for ri in (1, 2, 5):
                data = mm.encode_jpeg_color(
                    rgb.tobytes(), 34, 23, subsampling=sub,
                    restart_interval=ri,
                )
                assert mm.decode_jpeg(data) == base, (sub, ri)
                if n_mcu > ri:
                    assert any(
                        bytes([0xFF, 0xD0 + i]) in data for i in range(8)
                    ), (sub, ri)

    def test_standard_tables_lossy_deterministic_and_smaller(self):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm
        import numpy as np

        rng = np.random.RandomState(11)
        rgb = rng.randint(0, 256, size=(24, 24, 3), dtype=np.uint8).tobytes()
        kw = dict(
            quant_luma=mm.JPEG_STD_LUMA_QUANT,
            quant_chroma=mm.JPEG_STD_CHROMA_QUANT,
        )
        d1 = mm.encode_jpeg_color(rgb, 24, 24, **kw)
        assert d1 == mm.encode_jpeg_color(rgb, 24, 24, **kw)
        assert len(d1) < len(mm.encode_jpeg_color(rgb, 24, 24))
        w, h, c, px = mm.decode_jpeg(d1)
        assert (w, h, c) == (24, 24, 3)

    def test_foreign_color_goldens_match_imageio(self, spark):
        """Real libjpeg-lineage COLOR files — baseline 4:2:0
        interleaved (16x16 logo, 199x313 photo) and progressive 4:4:4
        with NON-interleaved scans (493x58) — decode within ±3 of
        javax.imageio (>=95% of samples exact): interleave order,
        per-component tables, dummy blocks, progressive color scans
        and the triangular upsampler all validated against an
        independent decoder lineage."""
        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        fixdir = TestJpegForeignGolden._fixture("")
        for name in [
            "cpython_logo_baseline_color420.jpg",
            "spark_mllib_kitten_baseline_color420.jpg",
            "nodejs_stripe_progressive_color444.jpg",
        ]:
            p = fixdir / name
            row = (
                spark.read.format("image")
                .load(str(p))
                .select("image.*")
                .collect()[0]
            )
            assert row.nChannels == 3, name
            theirs = (
                np.frombuffer(bytes(row.data), np.uint8)
                .reshape(row.height, row.width, 3)[..., ::-1]  # BGR->RGB
                .astype(int)
            )
            w, h, c, px = mm.decode_jpeg(p.read_bytes())
            assert (w, h, c) == (row.width, row.height, 3), name
            ours = np.frombuffer(px, np.uint8).reshape(h, w, 3).astype(int)
            diff = np.abs(ours - theirs)
            assert diff.max() <= 3, (name, diff.max())
            assert (diff == 0).mean() > 0.95, name

    def test_our_color_encodings_decode_in_imageio(self, spark, tmp_path):
        """Reverse direction: our color encoder's streams (4:4:4,
        4:2:0, 4:2:2+DRI, standard tables) decode in javax.imageio to
        within ±2 of our own decode."""
        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        rng = np.random.RandomState(13)
        rgb = rng.randint(0, 256, size=(23, 34, 3), dtype=np.uint8)
        files = {
            "c444.jpg": mm.encode_jpeg_color(
                rgb.tobytes(), 34, 23, subsampling=(1, 1)
            ),
            "c420.jpg": mm.encode_jpeg_color(
                rgb.tobytes(), 34, 23, subsampling=(2, 2)
            ),
            "c422rst.jpg": mm.encode_jpeg_color(
                rgb.tobytes(), 34, 23, subsampling=(2, 1),
                restart_interval=2,
            ),
            "c420std.jpg": mm.encode_jpeg_color(
                rgb.tobytes(), 34, 23,
                quant_luma=mm.JPEG_STD_LUMA_QUANT,
                quant_chroma=mm.JPEG_STD_CHROMA_QUANT,
            ),
        }
        for n, d in files.items():
            (tmp_path / n).write_bytes(d)
        for n, d in files.items():
            w, h, c, px = mm.decode_jpeg(d)
            ours = np.frombuffer(px, np.uint8).reshape(h, w, 3).astype(int)
            row = (
                spark.read.format("image")
                .load(str(tmp_path / n))
                .select("image.*")
                .collect()[0]
            )
            assert (row.width, row.height, row.nChannels) == (w, h, 3), n
            theirs = (
                np.frombuffer(bytes(row.data), np.uint8)
                .reshape(h, w, 3)[..., ::-1]
                .astype(int)
            )
            assert np.abs(ours - theirs).max() <= 2, n

    def test_color_ingest_dims_jvm_side_and_decode_stats(
        self, spark, tmp_path
    ):
        """A color JPEG flows through the whole Spark path: the
        segment-chain walk reads the 3-component SOF0 dims JVM-side,
        and decode stats route through the color decoder
        (n_values = w*h*3; grey tiles make val_sum exact)."""
        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        tiles = np.kron(
            np.array([[10, 20], [30, 40]], dtype=np.uint8),
            np.ones((8, 8), np.uint8),
        )
        rgb = np.stack([tiles] * 3, -1)
        (tmp_path / "c.jfif").write_bytes(
            mm.encode_jpeg_color(rgb.tobytes(), 16, 16)
        )
        df = mm.ingest_binary_dir(spark, str(tmp_path), glob="*.jfif")
        row = df.collect()[0]
        assert row.meta.format == "jpeg"
        assert (row.meta.width, row.meta.height) == (16, 16)
        assert row.meta.channels == 3  # SOF component count, JVM-side
        stats = mm.decode_binary_stats(df).collect()[0]
        assert (stats.modality, stats.n_values) == ("image", 768)
        assert stats.val_sum == 3 * 64 * (10 + 20 + 30 + 40)

    def test_decode_jpeg_gray_rejects_color(self):
        import numpy as np
        import pytest

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        rgb = np.zeros((8, 8, 3), np.uint8).tobytes()
        data = mm.encode_jpeg_color(rgb, 8, 8)
        with pytest.raises(ValueError, match="not a grayscale"):
            mm.decode_jpeg_gray(data)


class TestJpegColorProgressive:
    """Progressive COLOR encoder (round-7, completes the codec
    matrix): interleaved multi-component DC scans + non-interleaved
    per-component AC scans with per-scan optimal Huffman — decode must
    be bit-identical to the baseline color encoding's decode
    (progressive coding is lossless given the coefficients), and the
    streams must decode in javax.imageio."""

    def test_progressive_equals_baseline_decode(self):
        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        rng = np.random.RandomState(21)
        for W, H in [(16, 16), (17, 13), (34, 23)]:
            rgb = rng.randint(0, 256, size=(H, W, 3), dtype=np.uint8)
            for sub in [(2, 2), (2, 1), (1, 1)]:
                base = mm.decode_jpeg(
                    mm.encode_jpeg_color(rgb.tobytes(), W, H, subsampling=sub)
                )
                prog = mm.encode_jpeg_color_progressive(
                    rgb.tobytes(), W, H, subsampling=sub
                )
                assert prog[2:4] == b"\xff\xe0" and b"\xff\xc2" in prog
                assert mm.decode_jpeg(prog) == base, (W, H, sub)
        # deterministic bytes
        rgb = rng.randint(0, 256, size=(13, 17, 3), dtype=np.uint8)
        assert mm.encode_jpeg_color_progressive(
            rgb.tobytes(), 17, 13
        ) == mm.encode_jpeg_color_progressive(rgb.tobytes(), 17, 13)

    def test_custom_scan_script(self):
        """A minimal no-successive-approximation script (sequential-
        style DC + three full-band AC scans) round-trips too."""
        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        rng = np.random.RandomState(23)
        rgb = rng.randint(0, 256, size=(23, 34, 3), dtype=np.uint8)
        custom = [
            ((0, 1, 2), 0, 0, 0, 0),
            ((0,), 1, 63, 0, 0),
            ((1,), 1, 63, 0, 0),
            ((2,), 1, 63, 0, 0),
        ]
        base = mm.decode_jpeg(mm.encode_jpeg_color(rgb.tobytes(), 34, 23))
        got = mm.decode_jpeg(
            mm.encode_jpeg_color_progressive(rgb.tobytes(), 34, 23, scans=custom)
        )
        assert got == base

    def test_streams_decode_in_imageio(self, spark, tmp_path):
        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        rng = np.random.RandomState(31)
        rgb = rng.randint(0, 256, size=(23, 34, 3), dtype=np.uint8)
        for sub in [(2, 2), (1, 1)]:
            d = mm.encode_jpeg_color_progressive(
                rgb.tobytes(), 34, 23, subsampling=sub
            )
            p = tmp_path / f"p{sub[0]}{sub[1]}.jpg"
            p.write_bytes(d)
            w, h, c, px = mm.decode_jpeg(d)
            ours = np.frombuffer(px, np.uint8).reshape(h, w, 3).astype(int)
            row = (
                spark.read.format("image")
                .load(str(p))
                .select("image.*")
                .collect()[0]
            )
            assert (row.width, row.height, row.nChannels) == (w, h, 3)
            theirs = (
                np.frombuffer(bytes(row.data), np.uint8)
                .reshape(h, w, 3)[..., ::-1]
                .astype(int)
            )
            assert np.abs(ours - theirs).max() <= 2, sub


class TestJpegStreamValidation:
    """Round-7 hardening (the ADVICE-3 class, swept exhaustively): a
    corrupt or truncated stream must fail with an EXPLICIT
    ValueError/NotImplementedError — never an accidental IndexError/
    KeyError/OverflowError/struct.error from an unvalidated read. The
    seeded fuzz found 14 accidental error classes (truncated segment
    headers, short DQT/DHT/SOS bodies, scans referencing missing
    Huffman/quant tables, out-of-range Ss/Se, DC size categories past
    15 overflowing the int64 coefficient buffer); each now has a
    named validation. A larger offline sweep (1500 flips/stream +
    every 7th truncation) ran clean."""

    def test_truncations_and_bit_flips_fail_loudly(self):
        import random

        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        rng = np.random.RandomState(5)
        pix = rng.randint(0, 256, size=24 * 16, dtype=np.uint8).tobytes()
        rgbpix = rng.randint(0, 256, size=24 * 16 * 3, dtype=np.uint8).tobytes()
        streams = [
            mm.encode_jpeg_gray(pix, 24, 16),
            mm.encode_jpeg_gray_progressive(pix, 24, 16),
            mm.encode_jpeg_color(rgbpix, 24, 16),
            mm.encode_jpeg_color_progressive(rgbpix, 24, 16),
            mm.encode_jpeg_gray(pix, 24, 16, restart_interval=2),
        ]
        rnd = random.Random(99)
        n_decoded = n_rejected = 0
        for base in streams:
            cases = [base[:cut] for cut in range(1, len(base), 29)]
            for _ in range(150):
                i = rnd.randrange(2, len(base))
                d = bytearray(base)
                d[i] ^= 1 << rnd.randrange(8)
                cases.append(bytes(d))
            for d in cases:
                try:
                    mm.decode_jpeg(d)
                    n_decoded += 1  # harmless flip (e.g. entropy bits)
                except (ValueError, NotImplementedError):
                    n_rejected += 1
                # anything else propagates and fails the test
        assert n_rejected > 100  # the sweep is not vacuous
        assert n_decoded > 0     # nor is it rejecting everything


class TestContainerStreamValidation:
    """Round-7 hardening, PNG/BMP/WAV (same sweep as the JPEG class):
    corrupt or truncated containers must raise ValueError/
    NotImplementedError — never struct.error/zlib.error/wave.Error/
    IndexError/TypeError — and NEVER silently return short pixel data
    (a truncated BMP used to yield fewer than width*height bytes with
    no error; it now fails loudly). An offline sweep of every
    truncation point + 3000 flips per format ran clean."""

    def test_truncations_and_bit_flips_fail_loudly(self):
        import random

        import numpy as np

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        rng = np.random.RandomState(7)
        streams = {
            "png": mm.encode_png_gray(
                rng.randint(0, 256, size=256, dtype=np.uint8).tobytes(), 16, 16
            ),
            "bmp": mm.encode_bmp_gray(
                rng.randint(0, 256, size=256, dtype=np.uint8).tobytes(), 16, 16
            ),
            "wav": mm.encode_wav_pcm8(
                rng.randint(0, 256, size=64, dtype=np.uint8).tobytes()
            ),
        }
        dec = {
            "png": mm.decode_png_gray,
            "bmp": mm.decode_bmp_gray,
            "wav": mm.decode_wav_pcm8,
        }
        rnd = random.Random(123)
        n_rejected = 0
        for name, base in streams.items():
            w0, h0 = 16, 16
            cases = [base[:cut] for cut in range(1, len(base), 5)]
            for _ in range(200):
                i = rnd.randrange(0, len(base))
                d = bytearray(base)
                d[i] ^= 1 << rnd.randrange(8)
                cases.append(bytes(d))
            for d in cases:
                try:
                    out = dec[name](d)
                    if name != "wav":  # decode implies full-size pixels
                        assert len(out[2]) == out[0] * out[1], name
                except (ValueError, NotImplementedError):
                    n_rejected += 1
        assert n_rejected > 100

    def test_bmp_truncated_pixels_fail_instead_of_short_output(self):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm
        import pytest

        base = mm.encode_bmp_gray(bytes(range(256)), 16, 16)
        with pytest.raises(ValueError, match="truncated BMP pixel"):
            mm.decode_bmp_gray(base[:-10])


class TestJpegRawStreamGolden:
    def test_foreign_raw_no_app0_color_golden(self):
        """CPython's python-raw.jpg: a real color 4:2:0 JPEG with NO
        APP0/JFIF segment (SOI straight to DQT) — decoders and the
        ingest segment walk must not assume a JFIF header."""
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        p = TestJpegForeignGolden._fixture(
            "cpython_logo_raw_noapp0_color420.jpg"
        )
        w, h, c, px = mm.decode_jpeg(p.read_bytes())
        assert (w, h, c) == (16, 16, 3)
        assert len(px) == 16 * 16 * 3

    def test_raw_stream_ingest_dims(self, spark, tmp_path):
        import shutil

        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        shutil.copy(
            TestJpegForeignGolden._fixture(
                "cpython_logo_raw_noapp0_color420.jpg"
            ),
            tmp_path / "raw.jpg",
        )
        row = mm.ingest_binary_dir(spark, str(tmp_path), glob="*.jpg").collect()[0]
        assert (row.meta.width, row.meta.height, row.meta.channels) == (16, 16, 3)


class TestDecodeStatsOnError:
    """decode_binary_stats on_error modes (round-7): a corrupt blob in
    a lake directory must be controllable — fail the job (default,
    what the fixture-derived oracles want), skip the row, or tag it
    with modality='corrupt' and the error text for downstream
    quarantine."""

    @pytest.fixture()
    def mixed_dir(self, spark, tmp_path):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        (tmp_path / "ok.png").write_bytes(
            mm.encode_png_gray(bytes([3] * 64), 8, 8)
        )
        good_bmp = mm.encode_bmp_gray(bytes([5] * 64), 8, 8)
        (tmp_path / "bad.bmp").write_bytes(good_bmp[:-7])  # truncated
        return mm.ingest_binary_dir(spark, str(tmp_path), glob="*.{png,bmp}")

    def test_fail_propagates(self, mixed_dir):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        with pytest.raises(Exception, match="truncated BMP"):
            mm.decode_binary_stats(mixed_dir).collect()

    def test_skip_drops_corrupt_row(self, mixed_dir):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        rows = mm.decode_binary_stats(mixed_dir, on_error="skip").collect()
        assert [(r.file_name, r.n_values, r.val_sum) for r in rows] == [
            ("ok.png", 64, 192)
        ]

    def test_tag_quarantines_with_error_text(self, mixed_dir):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        rows = {
            r.file_name: r
            for r in mm.decode_binary_stats(mixed_dir, on_error="tag").collect()
        }
        ok, bad = rows["ok.png"], rows["bad.bmp"]
        assert (ok.modality, ok.n_values, ok.val_sum, ok.error) == (
            "image", 64, 192, None,
        )
        assert bad.modality == "corrupt"
        assert bad.n_values is None and bad.val_sum is None
        assert "truncated BMP" in bad.error

    def test_invalid_mode_rejected(self, spark):
        from dlt_salesforce_iceberg_rest_demo_spark.operators import multimodal as mm

        df = spark.createDataFrame(
            [Row(file_name="x", payload=b"")], "file_name string, payload binary"
        )
        with pytest.raises(ValueError, match="on_error"):
            mm.decode_binary_stats(df, on_error="ignore")
