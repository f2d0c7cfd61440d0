"""Training-pipeline operators vs python oracles on the documents /
embeddings testdata tables (sf0.001)."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from fog_spark.operators import (
    cosine_topk,
    doc_fingerprint,
    exact_dedup,
    lang_id,
    lsh_ann_topk,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_features,
    simhash,
    simhash_near_dups,
    token_count_col,
)
from fog_spark.operators.text import STOPWORDS

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    d.count()
    yield d
    d.unpersist()


@pytest.fixture(scope="module")
def emb(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    e.count()
    yield e
    e.unpersist()


def _tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _shingles(text, n=3):
    toks = _tokens(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_token_count(spark, docs):
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", token_count_col(F.col("text")).alias("n")).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == len(_tokens(r["text"])), r["doc_id"]


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs).collect()
    texts = [r["text"] for r in docs.select("text").collect()]
    assert sum(r["dup_count"] for r in out) == len(texts)
    assert len(out) == len(set(texts))


def test_ngram_jaccard_pairs_oracle(spark, docs):
    sample = docs.where(F.col("doc_id") < 60)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(sample, threshold=0.2).collect()
    }
    rows = {r["doc_id"]: r["text"] for r in sample.collect()}
    ids = sorted(rows)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = _shingles(rows[a]), _shingles(rows[b])
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter:
                j = inter / (len(sa) + len(sb) - inter)
                if j >= 0.2:
                    want[(a, b)] = j
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_jaccard_shingle_df_cap(spark):
    # every doc shares one planted stop-shingle; unrelated tails. Uncapped,
    # the stop-shingle makes ALL pairs candidates (O(n^2)); with the cap it
    # is dropped from intersections AND sizes, so only the true dup pair
    # (identical tails) survives with jaccard 1.0.
    n = 40
    stop = "common common common"
    rows = [(i, f"{stop} tail{i} a{i} b{i} c{i} d{i}") for i in range(n - 1)]
    rows.append((n - 1, f"{stop} tail0 a0 b0 c0 d0"))  # dup of doc 0
    d = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(d, threshold=0.0, shingle_n=3)
    assert uncapped.count() == n * (n - 1) // 2  # quadratic blowup
    capped = ngram_jaccard_pairs(
        d, threshold=0.0, shingle_n=3, max_shingle_df=5
    ).collect()
    # shingles containing only 'common' tokens have df=n > 5 -> dropped;
    # 'common common tailX'-style shingles are per-doc (df<=2) -> kept
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(0, n - 1)}
    assert capped[0]["jaccard"] == 1.0


def test_minhash_lsh_finds_exact_dups(spark, docs):
    # exact duplicates must always share every band
    dup = docs.limit(20).union(
        docs.limit(20).withColumn("doc_id", F.col("doc_id") + 100000)
    )
    cands = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(dup).collect()}
    for r in docs.limit(20).collect():
        nonempty = len(_shingles(r["text"])) > 0
        if nonempty:
            assert (r["doc_id"], r["doc_id"] + 100000) in cands


def test_minhash_signature_shape(spark, docs):
    sig = minhash_signatures(docs.limit(10), num_hashes=8)
    rows = sig.collect()
    assert all(len(r) == 9 for r in rows)


def test_simhash_near_dups(spark, docs):
    dup = docs.limit(15).union(
        docs.limit(15).withColumn("doc_id", F.col("doc_id") + 100000)
    )
    sigs = {r["id"]: r["simhash"] for r in simhash(dup).collect()}
    for r in docs.limit(15).collect():
        if _tokens(r["text"]):
            assert sigs[r["doc_id"]] == sigs[r["doc_id"] + 100000]
    pairs = simhash_near_dups(dup, max_hamming=0).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    for r in docs.limit(15).collect():
        if _tokens(r["text"]):
            assert (r["doc_id"], r["doc_id"] + 100000) in found


def test_simhash_md5_near_dups(spark, docs):
    # the oracle-portable 48-bit twin: exact dups collide at hamming 0,
    # and a NumPy reimplementation of the md5 bit votes pins every
    # signature bit-for-bit (the portability claim, tested Spark-side)
    import hashlib
    from collections import Counter

    from fog_spark.operators.dedup import simhash_md5, simhash_md5_near_dups

    dup = docs.limit(12).union(
        docs.limit(12).withColumn("doc_id", F.col("doc_id") + 100000)
    )
    sigs = {r["id"]: r["simhash"] for r in simhash_md5(dup).collect()}
    for r in docs.limit(12).collect():
        toks = _tokens(r["text"])
        if not toks:
            continue
        votes = [0] * 48
        for tok, w in Counter(toks).items():
            h = int(hashlib.md5(tok.encode()).hexdigest()[:12], 16)
            for b in range(48):
                votes[b] += w if (h >> b) & 1 else -w
        expect = sum(1 << b for b in range(48) if votes[b] > 0)
        assert sigs[r["doc_id"]] == expect
        assert sigs[r["doc_id"] + 100000] == expect
    found = {
        (r["id_a"], r["id_b"])
        for r in simhash_md5_near_dups(dup, max_hamming=0).collect()
    }
    for r in docs.limit(12).collect():
        if _tokens(r["text"]):
            assert (r["doc_id"], r["doc_id"] + 100000) in found


def test_quality_and_langid_run(spark, docs):
    q = quality_features(docs).collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in q)
    li = lang_id(docs).collect()
    assert {r["lang_pred"] for r in li} <= set(STOPWORDS) | {"und"}
    # oracle a few rows
    texts = {r["doc_id"]: r["text"] for r in docs.limit(50).collect()}
    got = {r["id"]: r["lang_pred"] for r in li}
    for did, text in texts.items():
        toks = _tokens(text)
        best, bh = "und", 0
        for lang in sorted(STOPWORDS):
            hits = sum(1 for t in toks if t in STOPWORDS[lang])
            if hits > bh:
                best, bh = lang, hits
        assert got[did] == best


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha bravo charlie"), (1, "charlie bravo alpha"), (2, "alpha bravo charlie")],
        "doc_id long, text string",
    )
    fp = {r["id"]: r["fingerprint"] for r in doc_fingerprint(df).collect()}
    assert fp[0] == fp[2]
    assert fp[0] != fp[1]


def test_cosine_topk_exact(spark, emb):
    probes = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    got = cosine_topk(emb, probes, k=5).collect()
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dot / (na * nb)

    for pid in range(3):
        mine = sorted(
            ((r["cosine"], r["neighbor_id"]) for r in got if r["probe_id"] == pid),
            key=lambda t: (-t[0], t[1]),
        )
        want = sorted(
            ((cos(vecs[pid], v), i) for i, v in vecs.items() if i != pid),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        assert [m[1] for m in mine] == [w[1] for w in want]
        for m, w in zip(mine, want):
            assert abs(m[0] - w[0]) < 1e-6


def test_lsh_ann_reasonable_recall(spark, emb):
    probes = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = cosine_topk(emb, probes, k=5).collect()
    approx = lsh_ann_topk(emb, probes, k=5, nplanes=4).collect()
    ex = {(r["probe_id"], r["neighbor_id"]) for r in exact}
    ap = {(r["probe_id"], r["neighbor_id"]) for r in approx}
    # LSH with 4 planes = 16 buckets: expect meaningful but partial recall
    assert len(ap & ex) >= len(ex) * 0.2


def test_ivf_ann_recall_beats_scan_fraction(spark, emb):
    from fog_spark.operators.similarity import ivf_ann_topk, ivf_train

    probes = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = cosine_topk(emb, probes, k=5).collect()
    cents = ivf_train(emb, ncells=8, iters=2)
    assert len(cents) == 8
    approx = ivf_ann_topk(
        emb, probes, k=5, ncells=8, nprobe=3, centroids=cents
    ).collect()
    ex = {(r["probe_id"], r["neighbor_id"]) for r in exact}
    ap = {(r["probe_id"], r["neighbor_id"]) for r in approx}
    # scanning 3/8 of the corpus must recall well above 3/8 of the truth
    # (cells group similar vectors) — and be deterministic
    assert len(ap & ex) >= len(ex) * 0.5
    again = ivf_ann_topk(
        emb, probes, k=5, ncells=8, nprobe=3, centroids=cents
    ).collect()
    assert {(r["probe_id"], r["neighbor_id"], r["rank"]) for r in again} == {
        (r["probe_id"], r["neighbor_id"], r["rank"]) for r in approx
    }


def test_embedding_near_dups(spark, emb):
    from fog_spark.operators.similarity import (
        embedding_near_dups,
        embedding_near_dups_exact,
    )

    # plant near-dups: copies with one slightly perturbed component
    planted = emb.limit(10).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.slice("embedding", 1, 1),
            F.transform(
                F.slice("embedding", 2, F.size("embedding") - 1),
                lambda x: x * F.lit(1.001),
            ),
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups_exact(corpus, threshold=0.95).collect()
    }
    # every planted pair is a near-dup at 0.95
    for i in range(10):
        assert (i, i + 100000) in exact
    approx = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(corpus, threshold=0.95).collect()
    }
    assert approx <= exact  # verification step: no false positives
    planted_pairs = {(i, i + 100000) for i in range(10)}
    found = approx & planted_pairs
    assert len(found) >= 8  # LSH recall on near-identical vectors


def test_multimodal_plumbing(spark):
    from fog_spark.operators.multimodal import (
        extract_features, frame_sample_plan, synth_media, FEATURE_DIM,
    )

    media = synth_media(spark, 32)
    feats = extract_features(media, fake=True).collect()
    assert len(feats) == 32
    assert all(len(r["feature"]) == FEATURE_DIM for r in feats)
    assert all(r["n_bytes"] > 0 for r in feats)
    # determinism
    again = extract_features(synth_media(spark, 32), fake=True).collect()
    a = {r["media_id"]: r["feature"] for r in feats}
    b = {r["media_id"]: r["feature"] for r in again}
    assert a == b
    plan = frame_sample_plan(media, every_ms=5000)
    rows = plan.collect()
    assert all(r["ts_ms"] == r["frame_idx"] * 5000 for r in rows)

    from fog_spark.operators.multimodal import resize_plan

    rp = resize_plan(media, max_side=256).collect()
    assert rp
    for r in rp:
        assert max(r["out_w"], r["out_h"]) <= 256
        scale = min(1.0, 256 / max(r["width"], r["height"]))
        # exact oracle: half-up rounding (Spark F.round), floor 1px
        assert r["out_w"] == max(1, int(r["width"] * scale + 0.5))
        assert r["out_h"] == max(1, int(r["height"] * scale + 0.5))
        if max(r["width"], r["height"]) <= 256:
            assert (r["out_w"], r["out_h"]) == (r["width"], r["height"])

    # real decode is stubbed
    import pytest as _pytest

    with _pytest.raises(Exception):
        extract_features(media, fake=False).collect()


def test_embedding_near_dups_bucket_cap(spark):
    # pathological crawl shape: N byte-identical embeddings land in ONE
    # bucket of EVERY table. The bucket cap must switch that bucket from
    # the O(N^2) all-pairs self-join to the O(N * chain_window) id-chain
    # while keeping the duplicate cluster transitively connected
    # (VERDICT r02 "What's wrong" #1).
    from fog_spark.operators.similarity import embedding_near_dups

    n = 1200
    vec = [1.0, 0.5, -0.25, 0.125] * 2
    df = spark.range(n).select(
        F.col("id").cast("long").alias("vec_id"),
        F.array(*[F.lit(x) for x in vec]).alias("embedding"),
    )
    pairs = embedding_near_dups(
        df, threshold=0.99, nplanes=4, ntables=3,
        bucket_cap=100, chain_window=4,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # identical vectors -> identical per-table buckets -> identical
    # chains in every table; dedup leaves exactly the rank chain:
    # sum_{j=1..4} (n - j) pairs, never ~n^2/2
    want_count = sum(n - j for j in range(1, 5))
    assert len(got) == want_count
    # transitive connectivity: every consecutive id pair is present, so
    # the whole cluster is one component for a keep-min consumer
    assert all((i, i + 1) in got for i in range(n - 1))
    # and the chain respects the id order contract
    assert all(a < b for a, b in got)


def test_minhash_candidates_bucket_cap_10k_identical(spark):
    # VERDICT r03 "Next round" #1: the pair-LISTING LSH candidates get the
    # same degenerate-bucket guard their clustering sibling has. 10k
    # byte-identical docs land in ONE bucket of EVERY band; uncapped that
    # is ~50M candidate pairs (O(N^2)); with cap+chain it must complete
    # with exactly the O(N * chain_window) id-chain and stay transitively
    # connected for a downstream keep-min/CC consumer.
    n, w = 10_000, 8
    d = spark.range(n).select(
        F.col("id").cast("long").alias("doc_id"),
        F.lit("the same boilerplate footer text repeated on every page").alias("text"),
    )
    pairs = minhash_lsh_candidates(
        d, num_hashes=16, bands=4, bucket_cap=2000, chain_window=w
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # identical docs -> identical signatures -> one bucket per band with
    # the same id-ordered chain; dedup across bands leaves exactly
    # sum_{j=1..w} (n - j) pairs
    assert len(got) == sum(n - j for j in range(1, w + 1))
    assert all((i, i + 1) in got for i in range(n - 1))  # connected
    assert all(a < b for a, b in got)


def test_capped_pairs_reject_windowless_chain(spark):
    # chain_window=0 ("cap, no chaining") must be rejected: F.sequence
    # (rk+1, rk) generates a DESCENDING [rk+1, rk], so each row would
    # join to ITSELF and emit (i, i) pairs violating id_a < id_b — a
    # keep-one-of-each-pair consumer could then delete whole buckets.
    d = spark.range(10).select(
        F.col("id").cast("long").alias("doc_id"),
        F.lit("same text").alias("text"),
    )
    with pytest.raises(ValueError, match="chain_window"):
        minhash_lsh_candidates(d, bucket_cap=2, chain_window=0).collect()


def test_minhash_candidates_cap_matches_allpairs_when_small(spark, docs):
    # buckets at or below the cap take the exact all-pairs branch: a tiny
    # cap that nothing exceeds must be a no-op vs an effectively-infinite
    # cap, on both hash families
    from fog_spark.operators.dedup import minhash_md5_candidates

    d = docs.limit(60)
    for fn, kw in [
        (minhash_lsh_candidates, dict(num_hashes=16, bands=4)),
        (minhash_md5_candidates, dict(num_hashes=8, bands=4)),
    ]:
        base = {(r["id_a"], r["id_b"]) for r in fn(d, **kw).collect()}
        capped = {
            (r["id_a"], r["id_b"])
            for r in fn(d, bucket_cap=10**9, chain_window=3, **kw).collect()
        }
        assert base == capped


def test_simhash_pairs_bucket_cap_chain(spark):
    # identical docs share all signature chunks; with cap < n the chunk
    # buckets switch to the rank chain: O(n * w) verified pairs at
    # hamming 0, consecutive ids all present (transitive connectivity)
    from fog_spark.operators.dedup import simhash_md5_near_dups

    n, w = 400, 4
    d = spark.range(n).select(
        F.col("id").cast("long").alias("doc_id"),
        F.lit("copy of the exact same page body").alias("text"),
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_md5_near_dups(
            d, max_hamming=0, bucket_cap=50, chain_window=w
        ).collect()
    }
    assert len(got) == sum(n - j for j in range(1, w + 1))
    assert all((i, i + 1) in got for i in range(n - 1))


def test_repetition_features_oracle(spark):
    """Gopher-style repetition signals vs a direct Python oracle on
    hand-built pathological and clean docs."""
    from fog_spark.operators.text import repetition_features

    texts = {
        1: "buy cheap pills buy cheap pills buy cheap pills now",
        2: "the quick brown fox jumps over the lazy dog",
        3: "a a a a a a",
        4: "one two",
        5: "x",
        6: "",
        7: "line\nline\nother line\nline",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {
        r["id"]: (
            r["dup_token_ratio"],
            r["top_bigram_frac"],
            r["top_trigram_frac"],
            r["dup_line_ratio"],
        )
        for r in repetition_features(docs).collect()
    }

    def oracle(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        n = len(toks)
        dup_tok = 1.0 - len(set(toks)) / n if n else 0.0

        def top(k):
            grams = [" ".join(toks[i : i + k]) for i in range(n - k + 1)] if n >= k else []
            return max(Counter(grams).values()) / len(grams) if grams else 0.0

        lines = [ln for ln in text.split("\n") if ln]
        dup_line = 1.0 - len(set(lines)) / len(lines) if lines else 0.0
        return (dup_tok, top(2), top(3), dup_line)

    want = {k: oracle(v) for k, v in texts.items()}
    assert got.keys() == want.keys()
    for k in want:
        for g, w in zip(got[k], want[k]):
            assert math.isclose(g, w, rel_tol=0, abs_tol=1e-12), (k, got[k], want[k])
    # the spam doc must dominate every signal the clean doc is low on
    assert got[1][1] > 0.3 and got[2][1] < 0.15
    assert got[3][0] > 0.8 and got[2][0] < 0.2


def test_pretoken_count_portable_incl_vertical_tab(spark):
    # cross-engine pin for the doc_stats gate column: Spark (Java regex)
    # and DuckDB (RE2) must count the same pieces — including on \x0b
    # (vertical tab), where a bare \s class would diverge (Java \s has
    # VT, RE2 \s does not)
    import duckdb

    from fog_spark.operators.text import PRETOKEN_RE, pretoken_count
    from pyspark.sql import functions as F

    texts = [
        "Hello world, it's 12345 tokens... don't!",
        "vertical\x0btab and form\x0cfeed",
        "",
        "   ",
        "a1234b &&& x",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r["i"]: r["n"]
        for r in df.select("i", pretoken_count(F.col("t")).alias("n")).collect()
    }
    con = duckdb.connect()
    sql_re = PRETOKEN_RE.replace("'", "''")
    for i, t in enumerate(texts):
        want = con.execute(
            f"SELECT len(regexp_extract_all(?, '{sql_re}'))", [t]
        ).fetchone()[0]
        assert got[i] == want, (i, t, got[i], want)


def test_real_image_decode_when_pil_available(spark):
    # VERDICT r03 #8: the real Pillow decode path, skip-marked — runs
    # wherever Pillow exists (this container ships none). The fixture is
    # a 1x1 8-bit grayscale PNG (value 128) built from the spec with
    # zlib/struct, byte-embedded so no file or library is needed to
    # CREATE it.
    import struct
    import zlib

    import pytest

    from fog_spark.operators.multimodal import (
        FEATURE_DIM,
        _decode_real,
        extract_features,
        pil_available,
    )

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x80"))
        + chunk(b"IEND", b"")
    )
    if not pil_available():
        with pytest.raises(NotImplementedError, match="Pillow"):
            _decode_real(png, "image")
        pytest.skip("Pillow not installed in this environment")
    feat = _decode_real(png, "image")
    assert feat.shape == (FEATURE_DIM,)
    assert all(abs(v - 128 / 255.0) < 1e-6 for v in feat)
    media = spark.createDataFrame(
        [(0, "image", bytearray(png), 1, 1, None)],
        "media_id long, kind string, payload binary, width int, height int, duration_ms int",
    )
    rows = extract_features(media, fake=False).collect()
    assert len(rows) == 1 and abs(rows[0]["feature"][0] - 128 / 255.0) < 1e-6


def test_wav_audio_decode_skip_free(spark):
    """VERDICT r04 #7: PCM audio needs no ffmpeg — the stdlib wave
    module parses RIFF/WAV. synth_wav builds real containers from the
    deterministic PCM formula; wav_features must extract integer-exact
    stats matching a numpy replay, and _decode_real('audio') yields
    FEATURE_DIM segment-RMS values. Runs everywhere (no skip)."""
    import numpy as np

    from fog_spark.operators.multimodal import (
        FEATURE_DIM,
        _decode_real,
        extract_features,
        synth_wav,
        wav_features,
    )

    wav = synth_wav(spark, 8, n_samples=512, framerate=8000)
    got = {r["media_id"]: r for r in wav_features(wav).collect()}
    assert len(got) == 8
    i = np.arange(512, dtype=np.int64)
    for mid in range(8):
        s = ((mid * 1000003 + i * 7919) % 65536) - 32768
        r = got[mid]
        assert r["n_samples"] == 512 and r["framerate"] == 8000
        assert r["duration_ms"] == 64
        assert r["peak"] == int(np.abs(s).max())
        assert r["sum_sq"] == int((s**2).sum())
    # segment-RMS feature path through extract_features(fake=False)
    payload = wav.where("media_id = 3").collect()[0]["payload"]
    feat = _decode_real(bytes(payload), "audio")
    assert feat.shape == (FEATURE_DIM,)
    s3 = ((3 * 1000003 + i * 7919) % 65536) - 32768
    seg0 = s3[: 512 // FEATURE_DIM].astype(float)
    assert abs(feat[0] - np.sqrt((seg0**2).mean()) / 32768.0) < 1e-6
    media = spark.createDataFrame(
        [(3, "audio", bytearray(payload), None, None, 64)],
        "media_id long, kind string, payload binary, width int, height int, duration_ms int",
    )
    rows = extract_features(media, fake=False).collect()
    assert len(rows) == 1 and abs(rows[0]["feature"][0] - feat[0]) < 1e-6


def test_wav_features_multichannel_and_widths(spark):
    """The parser handles 8-bit unsigned and stereo mixdown — hand-built
    WAVs, byte-exact expectations."""
    import io
    import wave as wv

    import numpy as np

    from fog_spark.operators.multimodal import wav_features

    def build(nch, width, frames):
        buf = io.BytesIO()
        with wv.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(width)
            w.setframerate(4000)
            w.writeframes(frames)
        return buf.getvalue()

    # 8-bit unsigned mono: bytes 0,128,255 -> samples -128,0,127
    w8 = build(1, 1, bytes([0, 128, 255]))
    # 16-bit stereo: (100,-50),(3,5) -> mixdown means 25, 4
    st = np.array([100, -50, 3, 5], dtype="<i2").tobytes()
    w16 = build(2, 2, st)
    media = spark.createDataFrame(
        [(1, bytearray(w8)), (2, bytearray(w16))], "media_id long, payload binary"
    )
    got = {r["media_id"]: r for r in wav_features(media).collect()}
    assert got[1]["n_samples"] == 3 and got[1]["peak"] == 128
    assert got[1]["sum_sq"] == 128 * 128 + 0 + 127 * 127
    assert got[2]["n_samples"] == 2 and got[2]["peak"] == 25
    assert got[2]["sum_sq"] == 25 * 25 + 4 * 4
    # feature normalization follows the ACTUAL width (review finding):
    # an 8-bit full-scale sample must yield features near 1.0, not
    # ~0.004 under an assumed 16-bit scale
    from fog_spark.operators.multimodal import _decode_real

    feat8 = _decode_real(build(1, 1, bytes([0] * 64)), "audio")  # all -128
    assert abs(float(feat8[0]) - 1.0) < 1e-6
    s32 = np.array([2**31 - 1, -(2**31)], dtype="<i4").tobytes()
    feat32 = _decode_real(build(1, 4, s32), "audio")
    assert float(max(feat32)) <= 1.0 + 1e-6
