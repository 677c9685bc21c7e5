"""Codec round-trip, segment construction invariants, and WAND ==
exhaustive rank-identity on random queries.
"""

import random

import pytest
from pyspark.sql import functions as F

from ex_elasticlunr_spark import Index
from ex_elasticlunr_spark.build import codec
from ex_elasticlunr_spark.build.ordinals import assign_doc_ordinals
from ex_elasticlunr_spark.build.segments import build_segments, decode_segments
from ex_elasticlunr_spark.search.wand import wand_topk
from ex_elasticlunr_spark.sources.transcripts import transcripts_df, with_docid


class TestCodec:
    def test_roundtrip(self):
        rng = random.Random(7)
        ords = sorted(rng.sample(range(10_000_000), 500))
        tfs = [rng.randint(1, 50) for _ in ords]
        dls = [rng.randint(1, 400) for _ in ords]
        buf = codec.encode_block(ords, tfs, dls)
        assert codec.decode_block(buf) == (ords, tfs, dls)

    def test_roundtrip_base_ord(self):
        buf = codec.encode_block([4096, 4100], [1, 2], [10, 20], base_ord=4096)
        assert codec.decode_block(buf, base_ord=4096) == (
            [4096, 4100], [1, 2], [10, 20])

    def test_compression_wins(self):
        # dense ordinals -> ~3 bytes/entry vs 24 raw
        ords = list(range(100_000, 104_096))
        buf = codec.encode_block(ords, [1] * len(ords), [10] * len(ords))
        assert len(buf) / len(ords) < 4

    def test_vectorized_matches_scalar_reference(self):
        # the numpy block codec must emit byte-identical output to the
        # scalar varint reference (same LEB128 stream)
        rng = random.Random(11)
        for n in (0, 1, 2, 17, 1000):
            base = rng.choice([0, 4096, 1 << 20])
            ords = sorted(rng.sample(range(base, base + 80_000), n))
            tfs = [rng.randint(0, 1 << rng.choice([3, 14, 30])) for _ in range(n)]
            dls = [rng.randint(0, 1 << 14) for _ in range(n)]
            ref = bytearray()
            codec.encode_varint(n, ref)
            prev = base
            for o, t, d in zip(ords, tfs, dls):
                codec.encode_varint(o - prev, ref)
                codec.encode_varint(t, ref)
                codec.encode_varint(d, ref)
                prev = o
            buf = codec.encode_block(ords, tfs, dls, base)
            assert buf == bytes(ref)
            assert codec.decode_block(buf, base) == (ords, tfs, dls)

    def test_varint_edge(self):
        out = bytearray()
        codec.encode_varint(0, out)
        codec.encode_varint(127, out)
        codec.encode_varint(128, out)
        codec.encode_varint(1 << 40, out)
        v0, p = codec.decode_varint(bytes(out), 0)
        v1, p = codec.decode_varint(bytes(out), p)
        v2, p = codec.decode_varint(bytes(out), p)
        v3, p = codec.decode_varint(bytes(out), p)
        assert (v0, v1, v2, v3) == (0, 127, 128, 1 << 40)


@pytest.fixture(scope="module")
def index(spark):
    src = with_docid(transcripts_df(spark, n_convs=60, turns_per_conv=6))
    idx = Index(name="segtx").add_field("text").add_field("tool")
    idx.add_documents(src, docid_col="docid")
    idx.materialize()
    return idx


class TestOrdinals:
    def test_dense_and_sorted(self, spark, index):
        ords = assign_doc_ordinals(index.inverted.docs, partitions=5)
        rows = ords.orderBy("ord").collect()
        assert [r["ord"] for r in rows] == list(range(len(rows)))
        docids = [r["docid"] for r in rows]
        assert docids == sorted(docids)


class TestSegments:
    def test_roundtrip_equals_postings(self, spark, index):
        seg, ords = build_segments(index.inverted, block_size=64)
        decoded = decode_segments(seg, block_size=64)
        back = (
            decoded.join(ords, "ord")
            .select("field", "term", "docid", "tf_raw", "doc_len")
        )
        orig = index.inverted.postings.select(
            "field", "term", "docid", "tf_raw", "doc_len")
        assert back.exceptAll(orig).count() == 0
        assert orig.exceptAll(back).count() == 0

    def test_block_invariants(self, spark, index):
        seg, _ = build_segments(index.inverted, block_size=64)
        bad = seg.where(
            (F.col("n_docs") > 64)
            | (F.col("min_ord") < F.col("block_id") * 64)
            | (F.col("max_ord") >= (F.col("block_id") + 1) * 64)
        )
        assert bad.count() == 0

    def test_hot_term_splits_into_blocks(self, spark, index):
        seg, _ = build_segments(index.inverted, block_size=64)
        hot = seg.where((F.col("field") == "text") & (F.col("term") == "elixir"))
        assert hot.count() > 1  # 360 docs, most contain 'elixir'


QUERIES = [
    ("text", "elixir tool run quick"),
    ("text", "quick fox lazy dog"),
    ("text", "transcript conversation message"),
    ("text", "elixir"),
    ("text", "missing-term-zzz"),
    ("tool", "search bash"),
]


class TestWand:
    @pytest.mark.parametrize("mode", ["bm25", "elasticlunr"])
    @pytest.mark.parametrize("qi", range(len(QUERIES)))
    def test_wand_equals_exhaustive(self, spark, index, mode, qi):
        field, text = QUERIES[qi]
        wand = index.search_wand(text, field, top_k=10, mode=mode,
                                 block_size=64)
        got = [(r["docid"], round(r["score"], 9)) for r in wand.collect()]

        terms = index.analyzers[field].to_pipeline().run_terms(text)
        exhaustive = index.search(
            {"query": {"terms": {field: terms}}}, top_k=10, mode=mode)
        want = [(r["docid"], round(r["score"], 9)) for r in exhaustive.collect()]
        assert got == want

    def test_wand_random_queries(self, spark, index):
        rng = random.Random(99)
        vocab = ["elixir", "tool", "run", "index", "search", "merge",
                 "quick", "stream", "varint", "dog", "lorem"]
        for _ in range(5):
            terms = rng.sample(vocab, rng.randint(1, 4))
            wand = wand_topk(index.inverted, "text", terms, k=5,
                             mode="bm25", block_size=64)
            got = [(r["docid"], round(r["score"], 9)) for r in wand.collect()]
            exhaustive = index.search(
                {"query": {"terms": {"text": terms}}}, top_k=5, mode="bm25")
            want = [(r["docid"], round(r["score"], 9))
                    for r in exhaustive.collect()]
            assert got == want, terms


@pytest.fixture()
def v4_index(spark, tmp_path):
    """A small index saved in the v4 layout (fresh per test — save()
    rebinds the object to the written path)."""
    src = with_docid(transcripts_df(spark, n_convs=30, turns_per_conv=5))
    idx = Index(name="v4").add_field("text").add_field("tool")
    idx.add_documents(src, docid_col="docid")
    path = str(tmp_path / "v4")
    idx.inverted.save(path, block_size=64)
    return idx, path


class TestStreamingSegments:
    def test_streaming_equals_decode_roundtrip(self, spark, v4_index):
        """save()'s zero-shuffle segment build over the block-clustered
        layout decodes back to exactly the postings (ord, tf, doc_len)
        multiset — same invariant as the legacy groupBy builder."""
        _, path = v4_index
        segs = spark.read.parquet(path + "/segments")
        decoded = decode_segments(segs, 64)
        got = sorted(
            (r["field"], r["term"], r["ord"], r["tf_raw"], r["doc_len"])
            for r in decoded.collect()
        )
        want = sorted(
            (r["field"], r["term"], r["ord"], r["tf_raw"], r["doc_len"])
            for r in spark.read.parquet(path + "/postings").collect()
        )
        assert got == want

    def test_streaming_survives_file_splits(self, spark, v4_index):
        """Partial blocks from split/merged parquet reads stay valid:
        force tiny read partitions and check the decode multiset."""
        from ex_elasticlunr_spark.build.segments import build_segments_streaming

        _, path = v4_index
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        try:
            spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
            posts = spark.read.parquet(path + "/postings")
            segs = build_segments_streaming(posts, 64)
            decoded = decode_segments(segs, 64)
            got = sorted(
                (r["field"], r["term"], r["ord"], r["tf_raw"])
                for r in decoded.collect()
            )
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        want = sorted(
            (r["field"], r["term"], r["ord"], r["tf_raw"])
            for r in spark.read.parquet(path + "/postings").collect()
        )
        assert got == want

    def test_wand_on_loaded_index_uses_disk_segments(self, spark, v4_index):
        from ex_elasticlunr_spark.build.indexer import InvertedIndex

        idx, path = v4_index
        loaded = InvertedIndex.load(spark, path)
        assert loaded._segments is not None  # no lazy build needed
        got = wand_topk(loaded, "text", ["elixir", "search"], k=5,
                        mode="bm25", block_size=64)
        want = wand_topk(idx.inverted, "text", ["elixir", "search"], k=5,
                         mode="bm25", block_size=64)
        assert [tuple(r) for r in got.collect()] == \
               [tuple(r) for r in want.collect()]

    def test_details_positions_survive_save(self, spark, v4_index):
        """positions live in the flat table after save; the details path
        must still surface them on the REBOUND and the RELOADED index."""
        idx, path = v4_index
        q = {"query": {"terms": {"text": {"value": "elixir"}}}}
        rows = idx.search(q, include_details=True).collect()
        assert rows and all(r["positions"]["text"] for r in rows)
        loaded = Index.load(spark, path)
        rows2 = loaded.search(q, include_details=True).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
