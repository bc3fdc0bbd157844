"""Unit tests for operator/function modules on tiny in-memory frames,
covering the reference's edge-case semantics (SURVEY.md §7 hard parts):
ragged release_date, first-wins dedup determinism, ragged-schema union,
empty-input guards, null-guarded flattening."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdata06_spark.functions.dates import normalize_release_date, release_date_precision
from bigdata06_spark.functions.flatten import (
    array_head_or,
    array_joined,
    array_of_struct_names_joined,
    duration_min,
    safe_get,
)
from bigdata06_spark.operators.relational import (
    dedup_first_wins,
    is_empty,
    top_k,
    union_all,
)


def test_ragged_release_date(spark):
    df = spark.createDataFrame(
        [("1999",), ("1999-07",), ("1999-07-16",), ("",), (None,), ("bogus",)],
        ["release_date"],
    )
    out = df.select(
        normalize_release_date("release_date").cast("string").alias("d"),
        release_date_precision("release_date").alias("p"),
    ).collect()
    assert [(r.d, r.p) for r in out] == [
        ("1999-01-01", "year"),
        ("1999-07-01", "month"),
        ("1999-07-16", "day"),
        (None, None),
        (None, None),
        (None, None),
    ]


def test_dedup_first_wins_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 3, "x"), ("a", 1, "y"), ("b", 2, "z"), ("a", 2, "w")],
        ["id", "seq", "payload"],
    )
    out = dedup_first_wins(df, ["id"], [F.asc("seq")]).orderBy("id").collect()
    assert [(r.id, r.seq, r.payload) for r in out] == [("a", 1, "y"), ("b", 2, "z")]


def test_union_ragged_schemas(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "only_a"])
    b = spark.createDataFrame([(2, 9.5)], ["id", "only_b"])
    out = union_all([a, b]).orderBy("id").collect()
    assert out[0].only_a == "x" and out[0].only_b is None
    assert out[1].only_a is None and out[1].only_b == 9.5


def test_top_k_ties_pinned(spark):
    df = spark.createDataFrame([(1, 10), (2, 10), (3, 5)], ["id", "pop"])
    out = top_k(df, "pop", 2, "id").collect()
    assert [(r.id, r.pop) for r in out] == [(1, 10), (2, 10)]


def test_empty_guard(spark):
    df = spark.range(0).select(F.col("id"))
    assert is_empty(df)
    assert not is_empty(spark.range(1))


def test_flatten_helpers(spark):
    df = spark.createDataFrame(
        [
            Row(
                images=[Row(url="u1"), Row(url="u2")],
                artists=[Row(name="A"), Row(name="B")],
                genres=["pop", "rock"],
                explicit=None,
                duration_ms=123456,
            ),
            Row(images=[], artists=[], genres=None, explicit=True, duration_ms=60000),
        ]
    )
    out = df.select(
        array_head_or(F.col("images")["url"]).alias("img"),
        array_of_struct_names_joined("artists").alias("names"),
        array_joined("genres").alias("genres"),
        safe_get("explicit", False).alias("explicit"),
        duration_min("duration_ms").alias("mins"),
    ).collect()
    assert out[0].img == "u1"
    assert out[0].names == "A, B"
    assert out[0].genres == "pop, rock"
    assert out[0].explicit is False  # reference default (Spotify_API4.py:380)
    assert out[0].mins == 2.06
    assert out[1].img == ""
    assert out[1].names == ""
    assert out[1].genres == ""
    assert out[1].explicit is True
    assert out[1].mins == 1.0


def test_connected_components_hand_graph(spark):
    """Two chains and a singleton: {1-2-3}, {10-11}, {99}. Chain 1-2-3
    has no direct 1-3 edge — needs ≥2 propagation rounds."""
    from bigdata06_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (10, 11)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)], "doc_id long")
    got = {r.doc_id: r.component for r in connected_components(pairs, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_pack_next_fit_semantics(spark):
    """Next-fit walk: exact-fit closes at the boundary (not before),
    an oversized doc occupies a pack alone, and the first doc always
    lands in pack 0. Single shard so the walk order is total."""
    from bigdata06_spark.operators.packing import pack_next_fit

    docs = spark.createDataFrame(
        [(0, 300), (1, 212), (2, 600), (3, 1), (4, 511), (5, 2)],
        "doc_id long, ntok long",
    )
    got = {
        r.doc_id: r.pack_id
        for r in pack_next_fit(docs, F.col("ntok"), budget=512, n_shards=1).collect()
    }
    # pack 0: 300+212 = 512 exactly; pack 1: the 600 oversize alone;
    # pack 2: 1+511 = 512; pack 3: trailing 2.
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 2, 5: 3}


def test_pack_next_fit_prefix_stable(spark):
    """Appending documents never reassigns earlier ones (the next-fit
    property the operator docstring promises)."""
    from bigdata06_spark.operators.packing import pack_next_fit

    rows = [(i, 100 + 37 * (i % 7)) for i in range(20)]
    small = spark.createDataFrame(rows[:12], "doc_id long, ntok long")
    big = spark.createDataFrame(rows, "doc_id long, ntok long")
    a = {r.doc_id: (r.shard, r.pack_id)
         for r in pack_next_fit(small, F.col("ntok"), budget=512, n_shards=4).collect()}
    b = {r.doc_id: (r.shard, r.pack_id)
         for r in pack_next_fit(big, F.col("ntok"), budget=512, n_shards=4).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_kmeans_hand_clusters(spark):
    """Two tight clusters in 2-D: seeding with k=2 (ids 0,1 — one in
    each cluster) must label each point with its cluster's seed and be
    stable across the centroid-recompute round."""
    from bigdata06_spark.operators.similarity import kmeans_assign

    pts = [
        (0, [0.0, 0.1]), (2, [0.1, 0.0]), (4, [0.05, 0.05]),
        (1, [5.0, 5.1]), (3, [5.1, 5.0]), (5, [4.95, 5.05]),
    ]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.cluster for r in kmeans_assign(emb, k=2, n_iter=2).collect()}
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}


def test_ann_recall_floors(spark, sf_dir):
    """Quality gate for the rows-only ANN paths: recall vs the exact
    brute-force top-5 on the fixture embeddings. Floors sit under the
    measured values (multiprobe lsh 0.96/0.94/0.98 across SFs, ivf 0.49
    at sf0.001) — a regression guard, not a guarantee; both operators'
    docstrings give the formula-level expectations."""
    from pyspark.sql import functions as F

    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.operators import similarity as S

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id) for r in S.knn_bruteforce(q, emb, k=5).collect()}
    lsh = {(r.query_id, r.neighbor_id) for r in S.lsh_ann(q, emb, k=5).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in S.ivf_ann(q, emb, k=5, nprobe=3).collect()}
    assert len(lsh & exact) / len(exact) >= 0.70
    assert len(ivf & exact) / len(exact) >= 0.40


def test_approx_aggregate_error_bounds(spark, sf_dir):
    """Quality gates for the rows-only sketch aggregates: the HLL++
    distinct estimate must sit within its configured 1% rsd (x5 slack
    for small-N bias) of the exact count, and the approx median within
    0.5% of the exact percentile — so 'approximate' stays measured,
    never unchecked."""
    from pyspark.sql import functions as F

    from bigdata06_spark.catalog import load_table

    li = load_table(spark, "lineitem", sf_dir)
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact_d"),
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_d"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_p50"),
    ).first()
    assert abs(row.approx_d - row.exact_d) / row.exact_d <= 0.05
    assert abs(row.approx_p50 - row.exact_p50) / row.exact_p50 <= 0.005


# ------------------------------------------------------------- multimodal


def test_decode_image_codec_activation(monkeypatch):
    """decode_image_real auto-activates when PIL imports: a stub PIL
    module makes it return real dims; without PIL it raises
    NotImplementedError; _decode_dims falls back to the deterministic
    stand-in either way (absent codec OR corrupt payload)."""
    import io
    import sys
    import types

    import pytest

    from bigdata06_spark.operators import multimodal as M

    # absent codec → NotImplementedError → fallback dims
    monkeypatch.setitem(sys.modules, "PIL", None)
    monkeypatch.setitem(sys.modules, "PIL.Image", None)
    with pytest.raises(NotImplementedError):
        M.decode_image_real(b"xx")
    assert M._decode_dims(b"xx", "image/png", try_codec=True) == M._fake_decode_dims(
        b"xx", "image/png"
    )

    # stub codec: "decodes" payloads of the form b"WxH"
    class _Im:
        def __init__(self, payload):
            w, h = payload.decode().split("x")
            self.width, self.height = int(w), int(h)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    image_mod = types.SimpleNamespace(open=lambda fobj: _Im(fobj.read()))
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    assert M.decode_image_real(b"640x480") == (640, 480)
    assert M._decode_dims(b"640x480", "image/png", try_codec=True) == (640, 480, 1)
    # corrupt payload under an active codec → per-asset fallback
    assert M._decode_dims(b"notanimage", "image/png", try_codec=True) == M._fake_decode_dims(
        b"notanimage", "image/png"
    )
    # non-image media never consults the image codec
    assert M._decode_dims(b"640x480", "video/mp4", try_codec=True) == M._fake_decode_dims(
        b"640x480", "video/mp4"
    )
    io  # keep import used


def test_bq_words_and_rerank_recall(spark):
    """Binary quantization: (a) sign-bit word packing is exact on a
    hand vector (bit i of word w set iff dim 32w+i is positive; bit 31
    lands in the word without touching the long's sign); (b) the
    hamming-shortlist + exact-rerank pipeline on the sf0.001
    embeddings keeps recall@5 vs the exact top-5 above the documented
    floor, and every returned sim matches the exact ranking's sim for
    the hits."""
    from bigdata06_spark.operators import similarity as S

    vec = [0.0] * 64
    vec[0] = 0.5          # w0 bit 0
    vec[31] = 0.1         # w0 bit 31 (the would-be sign bit of int32)
    vec[32] = 0.2         # w1 bit 0
    vec[63] = -0.3        # negative → no bit
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<double>")
    w = df.select(*[c.alias(f"w{i}") for i, c in
                    enumerate(S.bq_words(F.col("embedding")))]).first()
    assert w.w0 == (1 | (1 << 31)) and w.w1 == 1

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    bq = S.bq_rerank_topk(q, e, k_neighbors=5, shortlist=50)
    ex = S.knn_bruteforce(q, e, k=5)
    hits = bq.select("query_id", "neighbor_id").join(
        ex.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
    recall = hits.count() / ex.count()
    assert recall >= 0.4, recall   # random-data floor; real MRL/BQ-trained
    #                                embeddings sit far higher


def test_phash_near_dup_hamming_boundary(spark):
    """Non-vacuous phash dedup check on CONSTRUCTED payloads (VERDICT
    r6: the sf0.01 oracle pass compared 0 rows to 0 rows). A 63-byte
    payload IS the 7×9 sample grid verbatim (position (j*62)//62 = j),
    so gradient bits are controlled exactly: with a base all-zero
    grid, setting byte 2k+1 to 1 sets bit 2k and nothing else. The
    banded join must return the exact pair set of the brute-force
    ≤3-hamming join — including the boundary: hamming 3 kept,
    hamming 4 dropped — and equal payloads hash equal (hamming 0)."""
    from bigdata06_spark.operators import multimodal as M

    def grid(set_bits):
        b = bytearray(63)
        for k in set_bits:
            assert k % 2 == 0  # even bits touch disjoint byte pairs
            b[(k // 8) * 9 + (k % 8) + 1] = 1
        return bytes(b)

    payloads = {
        0: grid([]),                  # base
        1: grid([]),                  # exact duplicate of base
        2: grid([0, 2, 4]),           # hamming 3 from base
        3: grid([0, 2, 4, 6]),        # hamming 4 from base, 1 from #2
        4: grid([10, 12, 20, 22, 30, 32]),  # hamming 6 from base
    }
    df = spark.createDataFrame(
        [(i, p) for i, p in payloads.items()], "doc_id long, payload binary")
    hashed = M.phash_media(df)
    hs = {r.doc_id: r.phash for r in hashed.collect()}
    assert hs[0] == 0 and hs[1] == 0         # all-zero grid → zero hash
    assert bin(hs[2]).count("1") == 3
    assert bin(hs[3]).count("1") == 4

    got = {(r.doc_a, r.doc_b): r.hamming
           for r in M.phash_near_dup_pairs(hashed).collect()}
    want = {}
    ids = sorted(payloads)
    for i in ids:
        for j in ids:
            if i < j:
                h = bin(hs[i] ^ hs[j]).count("1")
                if h <= 3:
                    want[(i, j)] = h
    assert got == want
    assert got[(0, 1)] == 0          # exact dup found
    assert got[(0, 2)] == 3          # boundary: hamming 3 kept
    assert (0, 3) not in got         # boundary: hamming 4 dropped
    assert got[(2, 3)] == 1
    assert want                      # the check compares non-empty sets


def test_checksum_batches_null_payload():
    """A nullable binary column must not crash the mapInArrow stage:
    null payloads yield null byte_len/byte_sum."""
    import pyarrow as pa

    from bigdata06_spark.operators.multimodal import checksum_batches

    batch = pa.RecordBatch.from_arrays(
        [pa.array([1, 2, 3], type=pa.int64()),
         pa.array([b"\x01\x02", None, b"\x05"], type=pa.binary())],
        names=["doc_id", "payload"],
    )
    [out] = list(checksum_batches(iter([batch])))
    assert out.column("byte_len").to_pylist() == [2, None, 1]
    assert out.column("byte_sum").to_pylist() == [3, None, 5]


def test_substring_spans_hand_example(spark, monkeypatch):
    """Island-merge semantics on a hand corpus: a shared 10-word run
    yields ONE maximal span (its two overlapping 8-gram hits merge); a
    doc sharing two separate runs reports two spans; a doc with no
    8-gram shared with any OTHER doc reports none."""
    import bigdata06_spark.queries.llm as L
    from bigdata06_spark.queries import load_all_queries

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"  # 10 words
    run2 = "one two three four five six seven eight"  # 8 words
    docs = [
        (1, f"{shared} xx yy zz"),
        (2, f"aa bb {shared}"),
        (3, f"{run2} filler filler2 filler3 filler4 filler5 filler6 filler7 {shared}"),
        (4, f"pp qq rr ss tt uu vv ww {run2}"),
        (5, "lone words that no other document repeats in any eight gram run here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    monkeypatch.setattr(L, "load_table", lambda _s, _t, _d: df)
    out = load_all_queries()["dedup_substring_spans"].fn(spark, "ignored")
    got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in out.collect()}
    assert got == {
        (1, 1, 10, 10),           # 10-word shared run: 8-gram hits at pos 1..3 merge
        (2, 3, 12, 10),
        (3, 1, 8, 8),             # run2 at front
        (3, 16, 25, 10),          # shared at tail (pos 16: after 8+7 lead words)
        (4, 9, 16, 8),
    }


def test_star_components_equal_label_propagation(spark):
    """large-star/small-star and min-label propagation must produce the
    identical component labeling on an arbitrary graph — including a
    long chain (the propagation algorithm's worst case) and isolated
    nodes."""
    import random

    from pyspark.sql import functions as F

    from bigdata06_spark.operators.dedup import connected_components, connected_components_star

    rng = random.Random(42)
    n = 300
    chain_len = 40
    edges = [(i, i + 1) for i in range(0, chain_len)]  # one 41-node chain
    edges += [(rng.randrange(100, n), rng.randrange(100, n)) for _ in range(150)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], ["doc_a", "doc_b"]
    )
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    prop = {
        (r.doc_id, r.component)
        for r in connected_components(pairs, nodes, max_iter=chain_len + 2).collect()
    }
    star = {(r.doc_id, r.component) for r in connected_components_star(pairs, nodes).collect()}
    assert prop == star
    # every chain node reaches min 0
    assert all(c == 0 for d, c in star if d <= chain_len)

    # propagation must FAIL LOUD, not silently mis-label, when the
    # diameter exceeds its round budget
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, nodes, max_iter=5)


def test_allpairs_blocked_equals_bruteforce(spark, sf_dir):
    """The tiled equi-join must emit every unordered pair EXACTLY once
    with the same rounded sim as the naive cross-join form — exactness
    is the whole point (ANN covers the approximate path)."""
    from bigdata06_spark.operators import similarity as S
    from bigdata06_spark.queries.qutil import rnd

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = sorted(
        (r.vec_a, r.vec_b, r.sim)
        for r in S.allpairs_blocked(e, threshold=0.4, n_blocks=5).collect()
    )
    base = e.select("vec_id", S.as_double(F.col("embedding")).alias("v"))
    base = base.select("vec_id", "v", S.norm(F.col("v")).alias("n"))
    a = base.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    b = base.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    naive = (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("sim", rnd(S.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("sim") >= 0.4)
    )
    want = sorted((r.vec_a, r.vec_b, r.sim) for r in naive.collect())
    assert got == want and len(got) > 0


def test_observation_metrics_piggyback_scan(spark, sf_dir):
    """df.observe(Observation, ...): data-quality counters computed IN
    the same job as the consuming action — no second scan. The
    canonical use at 100 TB: row counts / null counts / bounds ride
    the write job instead of a separate validation pass."""
    from pyspark.sql import Observation

    from bigdata06_spark.catalog import load_table

    li = load_table(spark, "lineitem", sf_dir)
    obs = Observation("quality")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
        F.min("l_shipdate").alias("min_ship"),
    )
    n = observed.filter(F.col("l_quantity") > 0).count()  # the consuming action
    got = obs.get
    assert got["n_rows"] == li.count()
    assert got["null_qty"] == 0
    assert got["min_ship"] is not None and n > 0


def test_pq_adc_recall_floor(spark, sf_dir):
    """ADC ranks by a lossy 4-byte code, so it's approximate — gate it
    the way the LSH/IVF paths are gated, at BOTH stages. Pure ADC on
    near-random 64-dim vectors at 4 bytes/vector is maximal
    compression: measured recall@3 0.17-0.27 across SFs (the
    quantization error swamps the thin cosine margins of this
    fixture), floor 0.15. The production two-stage form
    (`pq_adc_rerank_topk`: ADC shortlist-50 → exact rerank) measured
    0.73-0.83, floor 0.6 — the rerank restoring precision is the
    property that matters."""
    from bigdata06_spark.operators import similarity as S

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_bruteforce(q, e, k=3).collect()
    }
    adc = {
        (r.query_id, r.neighbor_id)
        for r in S.pq_adc_topk(q, e, k_neighbors=3).collect()
    }
    assert len(adc & exact) / len(exact) >= 0.15, adc & exact
    reranked = {
        (r.query_id, r.neighbor_id)
        for r in S.pq_adc_rerank_topk(q, e, k_neighbors=3, shortlist=50).collect()
    }
    assert len(reranked & exact) / len(exact) >= 0.6, reranked & exact

    codes = S.pq_quantize(e)
    errs = [r.sq_err for r in codes.select("sq_err").collect()]
    assert all(x >= 0 for x in errs) and any(x > 0 for x in errs)


def test_ivfpq_recall_floor(spark, sf_dir):
    """End-to-end IVF-PQ recall@3 vs exact brute force. Two lossy
    stages compound (nprobe=2 of 8 cells + 4-byte ADC shortlist), so
    the floor sits below the rerank-only path's: measured ~0.4-0.6 on
    the near-random fixture; floor 0.3. The exact-replayable pipeline
    (knn_ivfpq's oracle) certifies CORRECTNESS of the machinery; this
    gates its retrieval QUALITY."""
    from bigdata06_spark.operators import similarity as S

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    got = {
        (r.query_id, r.neighbor_id)
        for r in S.ivfpq_query(q, e, k_neighbors=3).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_bruteforce(q, e, k=3).collect()
    }
    assert len(got & exact) / len(exact) >= 0.3, got & exact


def test_avro_codec_error_paths():
    """The codec fails LOUD, never misreads: corrupt magic, corrupt
    sync boundary, unsupported schema types, bad codec, wrong-size
    sync marker."""
    import io

    import pytest

    from bigdata06_spark.sources import avro_codec as A

    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    buf = io.BytesIO()
    A.write_container(buf, schema, [{"x": 1}, {"x": 2}], codec="null",
                      sync=b"0123456789abcdef")
    raw = bytearray(buf.getvalue())

    with pytest.raises(ValueError, match="not an Avro"):
        A.read_container(io.BytesIO(b"XXXX" + bytes(raw[4:])))

    corrupt = bytearray(raw)
    corrupt[-1] ^= 0xFF  # flip a sync byte
    _, rows = A.read_container(io.BytesIO(bytes(corrupt)))
    with pytest.raises(ValueError, match="sync marker"):
        list(rows)

    # enum/fixed/decimal are SUPPORTED since round 4; a genuinely
    # unknown type must still reject loudly
    with pytest.raises(ValueError, match="unsupported"):
        A.write_container(io.BytesIO(), {"type": "interval", "name": "i"}, [])
    with pytest.raises(ValueError, match="codec"):
        A.write_container(io.BytesIO(), schema, [], codec="snappy")
    with pytest.raises(ValueError, match="16 bytes"):
        A.write_container(io.BytesIO(), schema, [], sync=b"short")


def test_lakehouse_error_paths(spark, sf_dir, tmp_path):
    """Version-pinned reads reject out-of-range versions; merge
    demands a change set."""
    import pytest

    from bigdata06_spark import lakehouse as LH
    from bigdata06_spark.catalog import load_table

    path = str(tmp_path / "lh_err")
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    LH.table_init(o, path, "o_orderkey", n_files=2)
    with pytest.raises(ValueError, match="not in"):
        LH.files_at_version(path, 5)
    with pytest.raises(ValueError, match="not in"):
        LH.files_at_version(path, -1)
    with pytest.raises(ValueError, match="merge needs"):
        LH.merge(spark, path, "o_orderkey")


def test_perceptron_pocket_learns_separable_target(spark, sf_dir):
    """The pocket perceptron must actually LEARN the separable
    contains-'spark' target — ≥95% training accuracy — not settle at
    the majority-class solution (77% base rate), which is where plain
    full-batch iterates cycle. Guards the binary-feature + pocket
    dynamics against regressions."""
    from pyspark.sql import functions as F

    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.operators import classifier as C

    docs = load_table(spark, "documents", sf_dir)
    label = F.when(
        F.array_contains(F.split(F.col("text"), " "), "spark"), 1
    ).otherwise(-1)
    w = C.perceptron_train(docs, label, epochs=16, dim=1024)
    scored = C.perceptron_score(docs, w)
    truth = docs.select("doc_id", label.cast("long").alias("y"))
    stats = (
        truth.join(scored, "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("pred") == F.col("y"), 1).otherwise(0)).alias("ok"),
        )
        .first()
    )
    acc = stats.ok / stats.n
    assert acc >= 0.95, f"pocket perceptron accuracy {acc:.3f} < 0.95"


def test_adaptive_simhash_chunk_rule():
    """The adaptive chunk rule must keep the per-chunk VALUE SPACE ≥ N
    (the linearity invariant) within the [2,16] clamp, and the chunk
    spans must be disjoint and cover all signature bits (the pigeonhole
    guarantee needs exactly this)."""
    from bigdata06_spark.operators.dedup import (
        SIMHASH_POLY_BITS,
        _chunk_spans,
        adaptive_simhash_chunks,
    )

    for n_docs in (1, 2, 100, 2_000, 20_000, 50_000, 10**6, 10**9):
        c = adaptive_simhash_chunks(n_docs)
        assert 2 <= c <= 16
        spans = _chunk_spans(c)
        # disjoint + covering
        bits = sorted(b for lo, w in spans for b in range(lo, lo + w))
        assert bits == list(range(SIMHASH_POLY_BITS))
        # value space of every chunk ≥ N (up to the chunk-count clamp:
        # at the floor of 2 chunks the width is ≥ 30 bits — space 2^30)
        min_width = min(w for _, w in spans)
        if c > 2:
            assert 2 ** min_width >= min(n_docs, 2 ** 30) or c == 16


def test_adaptive_simhash_finds_exact_duplicates(spark):
    """Hamming-0 pairs (exact text duplicates) must always surface —
    the guaranteed-recall floor of the adaptive regime at ANY chunk
    count."""
    from bigdata06_spark.operators.dedup import simhash_adaptive_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup
        (3, "completely different text about distributed query engines here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = simhash_adaptive_pairs(docs, threshold=0.5).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in got] == [(1, 2, 1.0)]


def test_minhash_seed_families_are_independent(spark, sf_dir):
    """The seed_offset parameter must produce a genuinely DIFFERENT
    hash family (different signatures) while the verified output stays
    the same exact pair set — the property dedup_methods_agreement's
    cross-validation rests on."""
    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

    docs = load_table(spark, "documents", sf_dir).limit(200)
    s0 = minhash_signatures(docs).orderBy("doc_id").limit(5).collect()
    # same docs, shifted seeds → different signature values
    from bigdata06_spark.operators.dedup import _minhash_aggs, shingle_index

    idx = shingle_index(docs)
    sig_b = idx.groupBy("doc_id").agg(*_minhash_aggs(64, 101)).orderBy("doc_id").limit(5).collect()
    assert [r.h0 for r in s0] != [r.h0 for r in sig_b]
    pa = sorted(map(tuple, minhash_lsh_pairs(docs, threshold=0.5).select("doc_a", "doc_b").collect()))
    pb = sorted(map(tuple, minhash_lsh_pairs(docs, threshold=0.5, seed_offset=101).select("doc_a", "doc_b").collect()))
    assert pa == pb  # verified output identical despite disjoint seeds


def test_ivfpq_persisted_index_serves_identical_results(spark, sf_dir, tmp_path):
    """ivfpq_fit's index relations round-trip through parquet and
    serve results identical to the in-session fit+serve composition
    (integer-exact fit => persistence cannot change a neighbor)."""
    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.operators import similarity as S

    e = load_table(spark, "embeddings", sf_dir)
    q = e.filter(F.col("vec_id") < 5)
    direct = sorted(map(tuple, S.ivfpq_query(q, e, k_neighbors=3).collect()))

    codebook, cells, codes = S.ivfpq_fit(e)
    root = tmp_path / "idx"
    codebook.write.parquet(str(root / "codebook"))
    cells.write.parquet(str(root / "cells"))
    codes.write.parquet(str(root / "codes"))
    served = S.ivfpq_serve(
        q, e,
        spark.read.parquet(str(root / "codebook")),
        spark.read.parquet(str(root / "cells")),
        spark.read.parquet(str(root / "codes")),
        k_neighbors=3,
    )
    assert sorted(map(tuple, served.collect())) == direct


def test_ivfpq_incremental_append_equals_full_assignment(spark, sf_dir):
    """ivfpq_encode against the frozen fit-time quantizers produces
    exactly the assignment the fit's own final pass would have given
    the appended rows: encode(evens-fit, odds) unioned with the fit's
    cells/codes equals a direct frozen-quantizer assignment of ALL
    rows."""
    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.operators import similarity as S

    e = load_table(spark, "embeddings", sf_dir)
    old = e.filter(F.col("vec_id") % 2 == 0)
    new = e.filter(F.col("vec_id") % 2 == 1)
    codebook, cells, codes = S.ivfpq_fit(old)
    cells_new, codes_new = S.ivfpq_encode(new, codebook)
    all_cells, all_codes = S.ivfpq_encode(e, codebook)
    assert sorted(map(tuple, cells.unionByName(cells_new).collect())) == \
        sorted(map(tuple, all_cells.collect()))
    assert sorted(map(tuple, codes.unionByName(codes_new).collect())) == \
        sorted(map(tuple, all_codes.collect()))


def test_readme_counts_match_registry():
    """The README's audited coverage claim is generated by
    tools/counts.py and must equal the live registry — count drift
    between the two was a round-5 verdict finding."""
    import os
    import re

    import __spark_entry__ as E

    readme = os.path.join(os.path.dirname(__file__), "..", "README.md")
    m = re.search(
        r"- \*\*Coverage\*\*: (\d+) registered queries, (\d+) with exact "
        r"DuckDB oracles",
        open(readme).read(),
    )
    assert m, "README.md lost its Coverage line"
    assert int(m.group(1)) == len(E.queries())
    assert int(m.group(2)) == len(E.oracle_sql())


def test_sq8_recall_floor(spark, sf_dir):
    """Quality gate for the SQ8 codec: the reconstructed-code shortlist
    plus exact rerank must recover (nearly) the exact top-5 — measured
    1.0 at sf0.001/0.01/0.1 (8-bit symmetric quantization keeps
    per-dim relative error ~0.4%, far inside the top-20 shortlist
    margin); floor pinned below at 0.9."""
    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.operators import similarity as S

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id) for r in S.knn_bruteforce(q, emb, k=5).collect()}
    sq8 = {(r.query_id, r.neighbor_id) for r in S.sq8_rerank_topk(q, emb).collect()}
    assert len(sq8 & exact) / len(exact) >= 0.9


def test_mmr_greedy_properties(spark, sf_dir):
    """Structural gates for the MMR re-rank: (1) step 1 is the pure
    max-relevance pick; (2) picks are distinct per query and steps are
    1..k; (3) diversity — the mean pairwise similarity among the MMR
    selection is no higher than among the plain top-k-by-relevance
    set, per query (the whole point of the trade-off term)."""
    from itertools import combinations

    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.operators import similarity as S

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 3)
    k, pool = 4, 8
    sel = S.mmr_select(queries, emb, k_select=k, pool=pool).collect()
    cand = S.knn_bruteforce(queries, emb, k=pool).collect()
    by_q = {}
    for r in sel:
        by_q.setdefault(r.query_id, []).append(r)
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 10_000).collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb)

    def mean_pair_sim(ids):
        pairs = list(combinations(ids, 2))
        return sum(cos(vecs[a], vecs[b]) for a, b in pairs) / len(pairs)

    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.step)
        assert [r.step for r in rows] == list(range(1, k + 1))
        ids = [r.neighbor_id for r in rows]
        assert len(set(ids)) == k
        top_rel = sorted(
            (r for r in cand if r.query_id == qid),
            key=lambda r: (-r.sim, r.neighbor_id),
        )
        assert rows[0].neighbor_id == top_rel[0].neighbor_id
        topk_ids = [r.neighbor_id for r in top_rel[:k]]
        assert mean_pair_sim(ids) <= mean_pair_sim(topk_ids) + 1e-9


def test_misra_gries_evicts_and_never_loses_heavy_hitters(spark):
    """Non-vacuity + soundness for the heavy-hitter pass-1 sketch: a
    Zipf-ish stream whose key cardinality exceeds the MG capacity must
    (a) actually evict — every per-partition summary stays <= capacity
    counters — and (b) still surface every key with frequency >= phi*N
    in the candidate union, for the phi the capacity was sized for."""
    from bigdata06_spark.operators.relational import misra_gries_candidates

    # 4 heavy keys (600 rows each) + 2000 singleton keys, N = 4400
    rows = [(k,) for k in range(4) for _ in range(600)]
    rows += [(1000 + i,) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long").repartition(8)

    capacity = 20  # phi = 2/capacity = 0.1 -> heavy = freq >= 440
    summ = misra_gries_candidates(df, "k", capacity)
    per_part = (
        summ.filter(~F.col("is_sentinel"))
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    assert per_part, "summaries must be non-empty"
    assert all(r["count"] <= capacity for r in per_part), (
        "MG must bound every partition summary by its capacity "
        f"(got {[r['count'] for r in per_part]})"
    )
    candidates = {r["k"] for r in summ.filter(~F.col("is_sentinel")).collect()}
    assert candidates < {r[0] for r in rows}, "eviction must drop some keys"
    for heavy in range(4):
        assert heavy in candidates, f"heavy key {heavy} lost by the sketch"
    # sentinel rows carry the exact global row count
    total = (
        summ.filter(F.col("is_sentinel"))
        .agg(F.sum("mg_count").alias("n"))
        .collect()[0]["n"]
    )
    assert total == len(rows)


def test_bloom_prune_no_false_negatives_and_actually_prunes(spark, sf_dir):
    """The bloom-pruned join must equal the unpruned join exactly (no
    false negatives), and the bloom filter must be doing real work:
    the pruned fact scan is strictly smaller than the full fact scan."""
    from pyspark.sql import functions as F  # noqa: F811

    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.queries import load_all_queries

    specs = load_all_queries()
    got = {
        tuple(r)
        for r in specs["join_bloom_prune"].fn(spark, sf_dir).collect()
    }
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    rich = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    want = {
        tuple(r)
        for r in (
            o.join(rich, o.o_custkey == rich.c_custkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
                .cast("double")
                .alias("revenue"),
            )
            .collect()
        )
    }
    assert got == want
    # the bloom must do real work: the probe keeps every true-match
    # row (no false negatives) while dropping most non-matching rows
    from bigdata06_spark.operators.relational import bloom_probe_expr

    pruned = o.filter(bloom_probe_expr(rich, "c_custkey", "o_custkey"))
    n_all, n_pruned = o.count(), pruned.count()
    n_match = o.join(rich, o.o_custkey == rich.c_custkey).count()
    n_pruned_match = pruned.join(rich, pruned.o_custkey == rich.c_custkey).count()
    assert n_pruned_match == n_match, "bloom dropped a true match"
    assert n_pruned < n_all / 2, (
        f"bloom pruned nothing: {n_pruned}/{n_all} rows survive"
    )


def test_wordpiece_greedy_longest_match_and_fallback(spark):
    """Greedy segmentation: longest vocab match wins at every position
    and unmatched positions fall back to single characters — pinned on
    a constructed vocab where greedy and optimal differ."""
    from bigdata06_spark.operators.textops import wordpiece_segment

    words = spark.createDataFrame(
        [("internal", 3), ("xyz", 1), ("inter", 2)], "w string, wf long"
    )
    # 'internal': greedy takes 'intern' (6) then 'al' — never the
    # 'inter'+'nal' split an optimal tokenizer might prefer
    vocab = ["intern", "inter", "nal", "al", "xy"]
    got = {
        r["w"]: list(r["toks"])
        for r in wordpiece_segment(words, vocab, max_len=6).collect()
    }
    assert got["internal"] == ["intern", "al"]
    assert got["inter"] == ["inter"]
    assert got["xyz"] == ["xy", "z"]  # 'z' is the single-char fallback


def test_extract_features_empty_payload_emits_no_rows(spark):
    """Zero-length payloads contribute NO feature rows (review r10:
    the previous all-zero convention diverged from the oracle's
    string_split('','') artifact); dim is bounded to the 8-member
    byte-statistics family."""
    import pytest as _pytest

    from bigdata06_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(b""))],
        "doc_id long, payload binary",
    )
    out = M.extract_features(df).collect()
    assert {r["doc_id"] for r in out} == {1}
    assert len(out) == 8
    with _pytest.raises(ValueError, match=r"dim must be in \[1, 8\]"):
        M.extract_features(df, dim=16)


def test_extract_features_null_payload_emits_no_rows(spark):
    """NULL payloads (nullable binary input — the checksum stage's
    contract) emit no feature rows rather than crashing the Arrow
    worker (review r10 second pass)."""
    from bigdata06_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, bytearray(b"xy")), (2, None)], "doc_id long, payload binary"
    )
    out = M.extract_features(df).collect()
    assert {r["doc_id"] for r in out} == {1}


def test_documents_fixture_text_is_ascii():
    """_MM_FEAT_SQL (queries/llm.py) replays the engine's BYTE
    statistics from DuckDB's per-CODE-POINT unnest — valid only while
    the documents fixture is pure ASCII (UTF-8 bytes == code points).
    Pin that invariant across every shipped SF so a future fixture
    regeneration that introduces multi-byte text fails HERE with the
    reason, not as an opaque oracle hash mismatch (ADVICE r10)."""
    import os

    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        (n_bad,) = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{path}') "
            "WHERE text IS NOT NULL AND length(text) <> octet_length(ENCODE(text))"
        ).fetchone()
        assert n_bad == 0, f"{sf}: {n_bad} non-ASCII documents break _MM_FEAT_SQL"


def test_sharded_graph_ann_build_past_1m(spark):
    """The wall `knn_graph_greedy_sharded` exists to remove (VERDICT
    r10 next #3): a graph-ANN build + serve over MORE than 2^20
    vectors — the corpus size where the single-shard form fail-louds
    — must complete, with the cell count growing past the SQL-fold
    boundary so the Arrow assignment/probe path is the one exercised.
    dim=16 keeps the synthetic corpus cheap while giving the 15
    sign-plane bucket space full rank (in dim << bits, hyperplanes
    carve far fewer than 2^bits regions and buckets go quadratic —
    the operator's documented design envelope is dim >= bits)."""
    from pyspark.sql import functions as F

    from bigdata06_spark.queries.llm import (
        _GS_EXPR_CELLS,
        _GS_STEPS,
        _graph_greedy_sharded_impl,
        _gs_bits,
        _gs_ncells,
    )

    n = (1 << 20) + 1
    assert _gs_ncells(n) > _GS_EXPR_CELLS  # Arrow path, not the SQL fold
    assert _gs_bits(n, _gs_ncells(n)) <= 15  # bounded at ANY corpus size
    ev = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 16), j -> "
            "CAST(pmod(hash(id * 31 + j), 2001) - 1000 AS DOUBLE) / 1000.0)"
        ).alias("v"),
    )
    out = _graph_greedy_sharded_impl(spark, ev, n, 16, nq=5).collect()
    assert len(out) == 5
    for r in out:
        assert 0 <= r["found_id"] < n
        assert -1.0 <= r["sim"] <= 1.0
        assert 0 <= r["hops"] <= _GS_STEPS


def test_pixel_features_encoding_invariant(monkeypatch):
    """VERDICT r10 next #5: with a codec active, two BYTE-LEVEL
    DIFFERENT encodings of the same image must map to identical
    features (decoded-luminance statistics), while an undecodable
    payload falls back to the byte-statistics family bit-for-bit.
    Stub codec: payloads of the form b'IMGv<n>:<pixels>' decode to
    <pixels> regardless of the header — two 'encodings' of one image.
    Runs feature_batch directly (plain pandas, no Spark) because a
    monkeypatched sys.modules does not reach executor processes."""
    import sys
    import types

    import pandas as pd

    from bigdata06_spark.operators import multimodal as M

    class _Im:
        def __init__(self, payload):
            if not payload.startswith(b"IMGv"):
                raise ValueError("not an image")
            self._px = payload.split(b":", 1)[1]

        def convert(self, mode):
            assert mode == "L"
            return self

        def __array__(self, dtype=None, copy=None):
            import numpy as np

            return np.frombuffer(self._px, dtype=np.uint8).astype(
                dtype or np.uint8)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    image_mod = types.SimpleNamespace(open=lambda fobj: _Im(fobj.read()))
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    pixels = bytes(range(0, 250, 5)) * 3  # one synthetic image
    enc_a, enc_b = b"IMGv1:" + pixels, b"IMGv2~junkhdr:" + pixels
    assert enc_a != enc_b
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "payload": [enc_a, enc_b, b"plain text, no codec parses this"],
        "media_type": ["image/png", "image/png", "image/png"],
    })
    out = pd.concat(list(M.feature_batch(8, try_codec=True)(iter([pdf]))))
    fa = out[out.doc_id == 1].set_index("feat_idx")["feat_val"]
    fb = out[out.doc_id == 2].set_index("feat_idx")["feat_val"]
    assert (fa == fb).all(), "same image, different encodings, different features"
    # undecodable payload == byte-statistics path (try_codec off)
    pdf3 = pd.DataFrame({"doc_id": [3],
                         "payload": [b"plain text, no codec parses this"]})
    byte_out = pd.concat(list(M.feature_batch(8)(iter([pdf3]))))
    f3 = out[out.doc_id == 3].reset_index(drop=True)
    assert f3.equals(byte_out.reset_index(drop=True))
    # and the pixel features differ from what byte stats would say
    bpdf = pd.DataFrame({"doc_id": [1], "payload": [enc_a]})
    bf = pd.concat(list(M.feature_batch(8)(iter([bpdf]))))
    assert not (fa.to_numpy() == bf["feat_val"].to_numpy()).all()


def test_prebuilt_index_and_candidates_only_paths_match(spark, sf_dir):
    """r11 optimization hooks: (a) passing a prebuilt shingle index —
    and verification sets under ANY bijective element encoding — into
    jaccard_pairs_prefix / minhash_lsh_pairs yields the identical pair
    set as the self-built path; (b) candidates_only=True returns a
    SUPERSET of the verified pairs (banding recall), so semi-joining
    candidates against an exact-recall pair set reproduces the
    verified output (the dedup_methods_agreement rewrite)."""
    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.operators.dedup import (
        jaccard_pairs_prefix,
        minhash_lsh_pairs,
        shingle_index,
    )

    docs = load_table(spark, "documents", sf_dir).limit(200)
    idx = shingle_index(docs).localCheckpoint(eager=True)
    sdict = (
        idx.select("shingle").distinct()
        .withColumn("sid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    int_sets = (
        idx.join(sdict, "shingle")
        .groupBy("doc_id")
        .agg(F.collect_set("sid").alias("sh_set"))
    )
    pairs = lambda df: sorted(map(tuple, df.select("doc_a", "doc_b").collect()))

    ex_default = pairs(jaccard_pairs_prefix(docs))
    ex_prebuilt = pairs(jaccard_pairs_prefix(docs, index=idx, sets_=int_sets))
    assert ex_default == ex_prebuilt

    mh_default = pairs(minhash_lsh_pairs(docs, threshold=0.5))
    mh_prebuilt = pairs(minhash_lsh_pairs(docs, threshold=0.5, index=idx))
    assert mh_default == mh_prebuilt

    cands = pairs(minhash_lsh_pairs(docs, threshold=0.5, candidates_only=True))
    assert set(mh_default) <= set(cands)  # candidates are a superset
    ex_df = spark.createDataFrame(ex_default or [(0, 0)], ["doc_a", "doc_b"])
    semi = pairs(
        minhash_lsh_pairs(docs, threshold=0.5, candidates_only=True)
        .join(ex_df, ["doc_a", "doc_b"], "left_semi")
    )
    assert semi == mh_default
