"""Byte-stream object semantics as oracle-checkable queries: chunked
storage, reassembly, seek/slice, and binary (multimodal) column plumbing.

Mirrors the reference's object surface — objects are chunked byte streams
read sequentially (read_next, /root/reference/src/storage/block_driver.rs:
489-527) and positioned with seek (:530-586) — re-expressed as
(doc_id, chunk_no, payload) rows, with reassembly an order-preserving
aggregation and seek an offset computation that prunes chunks before the
scan. The full transactional object store lives in db_core_spark.plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table

CHUNK = 64  # chars per chunk; mirrors block-size chunking (datastore.rs:92-96)


def _chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode documents into fixed-size (doc_id, chunk_no, payload) rows —
    the write_next chunking path (system/instance.rs:429-444) as a set transform."""
    d = table(spark, sf_dir, "documents")
    n_chunks = F.ceil(F.length("text") / CHUNK).cast("int")
    return d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_no"),
        F.length("text").alias("total_len"),
    ).join(d.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        "chunk_no",
        F.substring(F.col("text"), F.col("chunk_no") * CHUNK + 1, CHUNK).alias("payload"),
    )


@query(
    "object_chunked_scan",
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id,
             UNNEST(range(0, CAST(ceil(LENGTH(text) * 1.0 / {CHUNK}) AS BIGINT))) AS chunk_no,
             text
      FROM documents)
    SELECT doc_id, CAST(chunk_no AS INT) AS chunk_no,
           SUBSTRING(text, CAST(chunk_no * {CHUNK} + 1 AS INT), {CHUNK}) AS payload,
           CAST(LENGTH(SUBSTRING(text, CAST(chunk_no * {CHUNK} + 1 AS INT), {CHUNK})) AS INT)
             AS chunk_len
    FROM chunks
    """,
    category="object",
)
def object_chunked_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunked representation itself (write path output)."""
    c = _chunked(spark, sf_dir)
    return c.select(
        "doc_id", "chunk_no", "payload", F.length("payload").cast("int").alias("chunk_len")
    )


@query(
    "object_reassembly",
    oracle="""
    SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars, TRUE AS matches_original
    FROM documents
    """,
    category="object",
)
def object_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_next loop as aggregation: collect chunks, order by chunk_no
    (continuation-pointer order, block.rs:493-495), concatenate, verify the
    round trip against the original byte stream."""
    c = _chunked(spark, sf_dir)
    reasm = (
        c.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_no", "payload"))),
                    lambda s: s.payload,
                ),
                "",
            ).alias("reassembled")
        )
    )
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return reasm.join(d, "doc_id").select(
        "doc_id",
        F.length("reassembled").cast("long").alias("n_chars"),
        (F.col("reassembled") == F.col("text")).alias("matches_original"),
    )


@query(
    "object_seek_slice",
    oracle=f"""
    SELECT doc_id,
           SUBSTRING(text, 33, 48) AS sliced,
           CAST({32 // CHUNK} AS INT) AS first_chunk,
           CAST({(32 + 48 - 1) // CHUNK} AS INT) AS last_chunk
    FROM documents WHERE LENGTH(text) >= 80
    """,
    category="object",
)
def object_seek_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """seek(32) + read(48): compute the chunk span [first,last] the offset
    maps to, scan ONLY those chunk rows (predicate on chunk_no — partition/
    rowgroup pruning at scale), and splice the requested byte range —
    block_driver.rs:530-586 without touching the full object."""
    offset, length = 32, 48
    first_chunk = offset // CHUNK
    last_chunk = (offset + length - 1) // CHUNK
    c = _chunked(spark, sf_dir).filter(
        (F.col("chunk_no") >= first_chunk) & (F.col("chunk_no") <= last_chunk)
    )
    spliced = (
        c.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_no", "payload"))),
                    lambda s: s.payload,
                ),
                "",
            ).alias("span"),
            F.min("chunk_no").alias("min_chunk"),
        )
    )
    return (
        spliced.withColumn(
            "sliced", F.substring(F.col("span"), offset - first_chunk * CHUNK + 1, length)
        )
        .filter(F.length("sliced") == length)  # only docs long enough for the full read
        .select(
            "doc_id",
            "sliced",
            F.lit(first_chunk).cast("int").alias("first_chunk"),
            F.lit(last_chunk).cast("int").alias("last_chunk"),
        )
    )


@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           SUBSTRING(text, 1, 4) AS header_preview,
           sha256(text) AS content_digest
    FROM documents WHERE doc_id <= 100
    """,
    category="object",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing: opaque binary payload + typed metadata
    (size, header bytes, digest). The decode/feature-extract stage for real
    image/audio payloads is the Pandas-UDF pipeline in
    db_core_spark.operators.multimodal (decode stubbed — codec libs not in
    this container); this query proves the binary column contract itself."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.substring("text", 1, 4).alias("header_preview"),
        F.sha2("text", 256).alias("content_digest"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH src AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n,
             1 + octet_length(encode(text)) % 8 AS k
      FROM documents WHERE doc_id <= 50),
    frames AS (
      SELECT doc_id, CAST(i AS INT) AS frame_no,
             (i * n) // k AS s, ((i + 1) * n) // k AS e, text
      FROM src, UNNEST(range(0, k, 2)) AS t(i))
    SELECT doc_id, frame_no,
           CAST(e - s AS BIGINT) AS frame_len,
           sha256(substring(text, CAST(s + 1 AS BIGINT), CAST(e - s AS BIGINT)))
             AS frame_digest
    FROM frames
    """,
    category="multimodal",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the stubbed video codec: every 2nd frame of
    each payload, one output row per frame (flatMap fan-out inside
    mapInPandas — operators/multimodal.py:sample_frames). Fixture text is
    pure ASCII so the SQL oracle's varchar slicing is byte-exact against
    the pandas byte slicing."""
    from db_core_spark.operators.multimodal import sample_frames

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    binary_df = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return sample_frames(binary_df, stride=2)


@query(
    "multimodal_resize_stub",
    oracle="""
    SELECT doc_id,
           CAST(16 + octet_length(encode(text)) % 64 AS INT) AS src_w,
           CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INT) AS src_h,
           CAST(32 AS INT) AS out_w, CAST(32 AS INT) AS out_h,
           CAST(LEAST(octet_length(encode(text)), 1024) AS BIGINT) AS out_n_bytes,
           sha256(substring(text, 1, LEAST(octet_length(encode(text)), 1024)))
             AS out_digest
    FROM documents WHERE doc_id <= 50
    """,
    category="multimodal",
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize through the stubbed codec: deterministic fake decode
    (dims from byte length) + truncation "resample" to 32x32, digest of the
    resized payload (operators/multimodal.py:resize_images). Proves the
    batch shape, schema contract, and partition inheritance a real
    PIL-backed resize drops into."""
    from db_core_spark.operators.multimodal import resize_images

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    binary_df = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return resize_images(binary_df, out_w=32, out_h=32)


@query(
    "multimodal_audio_chunks",
    oracle="""
    WITH src AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents WHERE doc_id % 5 = 0 AND doc_id <= 250),
    chunks AS (
      SELECT doc_id, CAST(t.i AS INT) AS chunk_no,
             CAST(t.i * 256 AS BIGINT) AS start_byte,
             CAST(LEAST(512, n - t.i * 256) AS BIGINT) AS chunk_len, text
      FROM src, UNNEST(range(0, (n - 1) // 256 + 1)) AS t(i)
      WHERE n > 0)
    SELECT doc_id, chunk_no, start_byte, chunk_len,
           sha256(substring(text, CAST(start_byte + 1 AS BIGINT), chunk_len))
             AS chunk_digest
    FROM chunks
    """,
    category="multimodal",
)
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio window-chunking through the stubbed codec: 512-byte windows at
    256-byte hop (50% overlap, STFT-style framing), one output row per
    chunk with its sha256 — operators/multimodal.py:chunk_audio. Fixture
    text is pure ASCII so the SQL oracle's varchar slicing is byte-exact
    against the pandas byte slicing."""
    from db_core_spark.operators.multimodal import chunk_audio

    d = table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 5 == 0) & (F.col("doc_id") <= 250)
    )
    binary_df = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return chunk_audio(binary_df, window_bytes=512, hop_bytes=256)


# DuckDB replica of dhash64(synth_ppm_for_text(text)) — the ENTIRE codec
# chain (md5 keystream pixels -> PPM encode/decode round-trip, which cancels
# -> nearest-neighbor 24x24 -> 9x8 resize -> luminance-gradient bits) is
# deterministic arithmetic, so the oracle derives it independently instead of
# pinning values: keystream block i is md5(text || '|' || i) (ASCII counter
# chosen for exactly this portability), resize index map is
# sy = min(y*24//8, 23), sx = min(x*24//9, 23), luminance = 299R+587G+114B,
# bit (y,x) weighs 2^(63-(y*8+x)) with the top bit contributing -2^63 (signed
# int64, matching Python's two's-complement fold). Callers prepend a CTE
# `alldocs(doc_id, text, edit0)`; edit0 applies the one-pixel
# (byte 0 += 128 mod 256) edit the near-dup fixtures plant.
_DHASH_CTES = """
    grid AS (
      SELECT y.g AS y, x.g AS x,
             (LEAST(y.g*24//8, 23)*24 + LEAST(x.g*24//9, 23))*3 AS p0
      FROM generate_series(0,7) y(g), generate_series(0,8) x(g)),
    needed AS (SELECT DISTINCT p0 + c.g AS idx FROM grid, generate_series(0,2) c(g)),
    blocks AS (
      SELECT d.doc_id, d.edit0, b.g AS blk,
             md5(d.text || '|' || CAST(b.g AS VARCHAR)) AS hx
      FROM alldocs d, generate_series(0,107) b(g)),
    bytes AS (
      SELECT bl.doc_id, n.idx,
             CASE WHEN bl.edit0 AND n.idx = 0
                  THEN (('0x' || substr(bl.hx, 2*(n.idx % 16) + 1, 2))::INT + 128) % 256
                  ELSE ('0x' || substr(bl.hx, 2*(n.idx % 16) + 1, 2))::INT END AS val
      FROM needed n JOIN blocks bl ON bl.blk = n.idx // 16),
    lum AS (
      SELECT b0.doc_id, g.y, g.x, 299*b0.val + 587*b1.val + 114*b2.val AS l
      FROM grid g
      JOIN bytes b0 ON b0.idx = g.p0
      JOIN bytes b1 ON b1.doc_id = b0.doc_id AND b1.idx = g.p0+1
      JOIN bytes b2 ON b2.doc_id = b0.doc_id AND b2.idx = g.p0+2),
    lpairs AS (
      SELECT a.doc_id, a.y, a.x, a.l AS l1, b.l AS l2
      FROM lum a JOIN lum b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x+1
      WHERE a.x < 8),
    dh AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN l1 > l2 THEN
                  CASE WHEN y = 0 AND x = 0 THEN -9223372036854775808
                       ELSE (1::BIGINT << (63 - (y*8+x))) END
                  ELSE 0 END) AS BIGINT) AS dhash
      FROM lpairs GROUP BY doc_id)
"""


_PHASH_DEDUP_ORACLE = f"""
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id <= 300),
    alldocs AS (
      SELECT doc_id, text, FALSE AS edit0 FROM base
      UNION ALL
      SELECT doc_id + 10000, text, FALSE FROM base WHERE doc_id % 50 = 0),
    {_DHASH_CTES}
    SELECT dhash, CAST(COUNT(*) AS BIGINT) AS n_images,
           MIN(doc_id) AS canonical_doc_id
    FROM dh GROUP BY dhash HAVING COUNT(*) >= 2
"""


@query("multimodal_phash_dedup", oracle=_PHASH_DEDUP_ORACLE, category="multimodal")
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dedup by perceptual difference-hash (dHash) with a REAL
    decode path end to end: each document renders to a valid PPM payload
    (deterministic md5 keystream — the in-container stand-in for a crawl's
    image column), then every payload is DECODED by the stdlib codec,
    resized 9x8, gradient-hashed to 64 bits, and duplicate groups fall out
    of a plain hash aggregate — exactly the image-dedup pass of a
    multimodal pipeline (identical images collide; near-identical images
    land hamming-close for a banded variant).

    Arrow-batched mapInPandas carries (doc_id, dhash) only — pixels never
    leave the executor; the shuffle moves 16 bytes per image regardless of
    image size. The fixture corpus has no exact duplicates, so duplicate
    images are SEEDED deterministically (every doc_id % 50 == 0 re-posts
    under doc_id + 10000 — same text, byte-identical image), exactly like
    the PII twin seeds emails. Fully oracle-checked: the DuckDB twin
    re-derives the whole codec chain in SQL (_DHASH_CTES); pytest
    additionally pins dHash groups == exact-text dup groups."""
    from collections.abc import Iterator

    import pandas as pd

    from db_core_spark.operators.multimodal import dhash64, synth_ppm_for_text

    base = table(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") <= 300
    )
    reposts = base.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10000
    )
    d = base.union(reposts)

    def hash_images(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "dhash": [
                        dhash64(synth_ppm_for_text(t)) for t in pdf["text"]
                    ],
                }
            )

    hashed = d.mapInPandas(hash_images, "doc_id long, dhash long")
    return (
        hashed.groupBy("dhash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_images") >= 2)
    )


_PHASH_NEARDUP_ORACLE = f"""
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id <= 300),
    alldocs AS (
      SELECT doc_id, text, FALSE AS edit0 FROM base
      UNION ALL
      SELECT doc_id + 10000, text, FALSE FROM base WHERE doc_id % 50 = 0
      UNION ALL
      SELECT doc_id + 20000, text, TRUE FROM base WHERE doc_id % 50 = 0),
    {_DHASH_CTES},
    bands AS (
      SELECT doc_id, dhash, b.g AS band_id,
             (dhash >> (16 * b.g)) & 65535 AS band_val
      FROM dh, generate_series(0,3) b(g))
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 8
"""


@query(
    "multimodal_phash_neardup_pairs",
    oracle=_PHASH_NEARDUP_ORACLE,
    category="multimodal",
)
def multimodal_phash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate image pairs by banded dHash: split each 64-bit
    perceptual hash into 4x16-bit bands, candidate pairs collide on at
    least one band (pigeonhole: every pair within hamming distance 3 MUST
    share a band), verify candidates with an exact popcount(xor) <= 8 —
    the image twin of minhash LSH banding, and the step between exact
    image dedup (`multimodal_phash_dedup`) and embedding ANN.

    Near-dup structure is seeded like the exact twin: every doc_id % 50
    == 0 re-posts under +10000 byte-identical (hamming 0) and under
    +20000 with a one-pixel edit (hamming-close but not equal). Scale
    shape: band equi-join on (band_id, band_value) — never an all-pairs
    hamming scan; the verification popcount runs only on band-collided
    candidates. Fully oracle-checked (the SQL twin replays the codec,
    the one-pixel edit, and the band join); pytest pins soundness
    (subset of brute-force pairs) and the pigeonhole recall guarantee."""
    from collections.abc import Iterator

    import pandas as pd

    from db_core_spark.operators.imagecodec import sniff_decode
    from db_core_spark.operators.multimodal import dhash64, synth_ppm_for_text

    base = table(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") <= 300
    )

    def hash_images(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from db_core_spark.operators.imagecodec import DecodedImage, encode_ppm

        for pdf in batches:
            ids, hashes = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = synth_ppm_for_text(text)
                ids.append(int(doc_id))
                hashes.append(dhash64(payload))
                if doc_id % 50 == 0:
                    # byte-identical repost + one-pixel-edited repost
                    ids.append(int(doc_id) + 10000)
                    hashes.append(dhash64(payload))
                    img = sniff_decode(payload)
                    px = bytearray(img.pixels)
                    px[0] = (px[0] + 128) % 256
                    edited = encode_ppm(
                        DecodedImage(img.width, img.height, img.channels, bytes(px), "ppm")
                    )
                    ids.append(int(doc_id) + 20000)
                    hashes.append(dhash64(edited))
            yield pd.DataFrame({"doc_id": ids, "dhash": hashes})

    hashed = base.mapInPandas(hash_images, "doc_id long, dhash long").localCheckpoint(eager=False)
    bands = hashed.select(
        "doc_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftright(F.col("dhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "dhash", "b.band_id", "b.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("b.dhash")))
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= 8)
        .dropDuplicates(["id_a", "id_b"])
    )


SHARD_CAPACITY_BYTES = 64 * 1024


# every synthetic image is 24x24 RGB -> PPM header "P6\n24 24\n255\n" (13 B)
# + 1728 pixel bytes = 1741 bytes, the constant the SQL packer mirrors
_PPM_BYTES = 1741

_PIPELINE_MM_ORACLE = f"""
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id <= 300),
    alldocs AS (
      SELECT doc_id, text, FALSE AS edit0 FROM base
      UNION ALL
      SELECT doc_id + 10000, text, FALSE FROM base WHERE doc_id % 50 = 0),
    {_DHASH_CTES},
    kept AS (
      SELECT doc_id, dhash FROM (
        SELECT doc_id, dhash,
               ROW_NUMBER() OVER (PARTITION BY dhash ORDER BY doc_id) AS rn
        FROM dh) WHERE rn = 1),
    packed AS (
      SELECT doc_id, dhash,
             SUM(CAST({_PPM_BYTES} AS BIGINT))
               OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM kept)
    SELECT doc_id, dhash, CAST({_PPM_BYTES} AS BIGINT) AS n_bytes,
           CAST((cum - {_PPM_BYTES}) // {SHARD_CAPACITY_BYTES} AS BIGINT) AS shard_id,
           CAST((cum - {_PPM_BYTES}) % {SHARD_CAPACITY_BYTES} AS BIGINT) AS offset_bytes
    FROM packed
"""


@query("pipeline_multimodal_prepare", oracle=_PIPELINE_MM_ORACLE, category="multimodal")
def pipeline_multimodal_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal ingest pipeline — the image twin of the
    `pipeline_corpus_prepare` headline: render/decode (REAL codec) ->
    perceptual dedup (keep-first by dHash) -> shard packing (64 KiB
    capacity, first-fit in doc_id order via running byte sum). One
    mapInPandas pass carries (doc_id, dhash, n_bytes) — 24 bytes/image
    regardless of pixels — then a dedup window and the prefix-sum packer
    run on survivors. Output: one row per KEPT image with its shard
    assignment and intra-shard byte offset.

    Fully oracle-checked (SQL dhash + window dedup + running-sum packer
    twin); pytest additionally checks exact equality
    with a pure-Python pipeline over the same seeded inputs. The packing
    stage IS the distributed two-pass prefix sum
    (`operators/prefixrank.py::global_running_sum`) — integer byte counts
    make the offset addition exact, and no stage sees more than its own
    partition's survivors."""
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql import Window as W

    from db_core_spark.operators.multimodal import dhash64, synth_ppm_for_text
    from db_core_spark.operators.prefixrank import global_running_sum

    base = table(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") <= 300
    )
    reposts = base.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10000
    )
    src = base.union(reposts)

    def decode_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [synth_ppm_for_text(t) for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "dhash": [dhash64(p) for p in payloads],
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    decoded = src.mapInPandas(decode_stage, "doc_id long, dhash long, n_bytes long")
    # perceptual dedup: keep the smallest doc_id per dhash
    wd = W.partitionBy("dhash").orderBy("doc_id")
    kept = (
        decoded.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    # shard packing: two-pass prefix byte sum in doc_id order -> shard + offset
    packed = global_running_sum(
        kept, [F.col("doc_id")], "n_bytes", out="cum"
    ).select(
        "doc_id",
        "dhash",
        "n_bytes",
        F.floor((F.col("cum") - F.col("n_bytes")) / SHARD_CAPACITY_BYTES)
        .cast("long")
        .alias("shard_id"),
        ((F.col("cum") - F.col("n_bytes")) % SHARD_CAPACITY_BYTES).alias("offset_bytes"),
    )
    return packed


# Scene-cut oracle: per (doc, frame) the keystream text is
# text || ':scene' || (frame // scene_len) with scene_len = 3 + doc_id % 3,
# and the in-scene jitter brightens the red channel of pixel row
# (frame % scene_len): +64 mod 256 at pixel byte indexes
# [row*72, row*72+72) step 3. Same dhash fold as _DHASH_CTES but keyed
# (doc_id, frame_no); cuts compare consecutive frames' hashes.
_SCENE_CUTS_ORACLE = """
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id <= 60),
    frames AS (
      SELECT d.doc_id, f.g AS frame_no,
             d.text || ':scene' || CAST(f.g // (3 + d.doc_id % 3) AS VARCHAR)
               AS textf,
             (f.g % (3 + d.doc_id % 3)) * 72 AS row0
      FROM base d, generate_series(0,7) f(g)),
    grid AS (
      SELECT y.g AS y, x.g AS x,
             (LEAST(y.g*24//8, 23)*24 + LEAST(x.g*24//9, 23))*3 AS p0
      FROM generate_series(0,7) y(g), generate_series(0,8) x(g)),
    needed AS (SELECT DISTINCT p0 + c.g AS idx FROM grid, generate_series(0,2) c(g)),
    blocks AS (
      SELECT fr.doc_id, fr.frame_no, fr.row0, b.g AS blk,
             md5(fr.textf || '|' || CAST(b.g AS VARCHAR)) AS hx
      FROM frames fr, generate_series(0,107) b(g)),
    bytes AS (
      SELECT bl.doc_id, bl.frame_no, n.idx,
             CASE WHEN n.idx >= bl.row0 AND n.idx < bl.row0 + 72
                       AND (n.idx - bl.row0) % 3 = 0
                  THEN (('0x' || substr(bl.hx, 2*(n.idx % 16) + 1, 2))::INT + 64) % 256
                  ELSE ('0x' || substr(bl.hx, 2*(n.idx % 16) + 1, 2))::INT END AS val
      FROM needed n JOIN blocks bl ON bl.blk = n.idx // 16),
    lum AS (
      SELECT b0.doc_id, b0.frame_no, g.y, g.x,
             299*b0.val + 587*b1.val + 114*b2.val AS l
      FROM grid g
      JOIN bytes b0 ON b0.idx = g.p0
      JOIN bytes b1 ON b1.doc_id = b0.doc_id AND b1.frame_no = b0.frame_no
                   AND b1.idx = g.p0+1
      JOIN bytes b2 ON b2.doc_id = b0.doc_id AND b2.frame_no = b0.frame_no
                   AND b2.idx = g.p0+2),
    lpairs AS (
      SELECT a.doc_id, a.frame_no, a.y, a.x, a.l AS l1, b.l AS l2
      FROM lum a JOIN lum b ON b.doc_id = a.doc_id AND b.frame_no = a.frame_no
                           AND b.y = a.y AND b.x = a.x+1
      WHERE a.x < 8),
    dh AS (
      SELECT doc_id, frame_no,
             CAST(SUM(CASE WHEN l1 > l2 THEN
                  CASE WHEN y = 0 AND x = 0 THEN -9223372036854775808
                       ELSE (1::BIGINT << (63 - (y*8+x))) END
                  ELSE 0 END) AS BIGINT) AS dhash
      FROM lpairs GROUP BY doc_id, frame_no)
    SELECT cur.doc_id, CAST(cur.frame_no AS INT) AS frame_no,
           CAST(bit_count(xor(prv.dhash, cur.dhash)) AS INT) AS hamming,
           bit_count(xor(prv.dhash, cur.dhash)) > 16 AS is_cut
    FROM dh cur JOIN dh prv
      ON prv.doc_id = cur.doc_id AND prv.frame_no = cur.frame_no - 1
"""


@query("multimodal_scene_cuts", oracle=_SCENE_CUTS_ORACLE, category="multimodal")
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-cut detection through the REAL image codec: each document
    becomes a synthetic 8-frame video (frames within a scene are the same
    rendered PPM with a one-byte pixel edit per frame; scene boundaries
    switch to a fresh md5-keystream image), every frame is decoded and
    dHashed, and a cut fires where consecutive frames' hashes differ by
    hamming > 16 — the standard perceptual shot-boundary heuristic.

    Scale shape: a video's frames are generated (in production: decoded)
    inside ONE mapInPandas pass, so consecutive-frame hamming is computed
    locally and the operator needs ZERO shuffles — frames grouped by video
    on ingest (the universal video-storage layout) never leave their
    partition; only (video, transition, hamming) rows emerge. For frame
    rows scattered across files, the same comparison is a lag window
    partitioned by video. Fully oracle-checked: the SQL twin re-derives
    every frame's dhash (scene keystream + per-frame row jitter) and the
    consecutive-frame hamming; pytest additionally pins detected cuts ==
    planted scene boundaries for every video."""
    from collections.abc import Iterator

    import pandas as pd

    from db_core_spark.operators.multimodal import dhash64, synth_ppm_for_text

    n_frames = 8

    def frame_payload(text: str, doc_id: int, frame_no: int, scene_len: int) -> bytes:
        scene = frame_no // scene_len
        img = bytearray(synth_ppm_for_text(f"{text}:scene{scene}"))
        # in-scene jitter: brighten one pixel row's red channel — a few
        # dHash bits flip (camera noise / exposure drift), never > 16
        base = img.index(b"255\n") + 4
        row = base + (frame_no % scene_len) * 24 * 3
        for px in range(24):
            img[row + px * 3] = (img[row + px * 3] + 64) % 256
        return bytes(img)

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_fr, out_ham, out_cut = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                scene_len = 3 + doc_id % 3
                prev = None
                for fr in range(n_frames):
                    h = dhash64(frame_payload(text, int(doc_id), fr, int(scene_len)))
                    if prev is not None:
                        ham = bin((prev ^ h) & ((1 << 64) - 1)).count("1")
                        out_doc.append(doc_id)
                        out_fr.append(fr)
                        out_ham.append(ham)
                        out_cut.append(ham > 16)
                    prev = h
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "frame_no": pd.Series(out_fr, dtype="int32"),
                    "hamming": pd.Series(out_ham, dtype="int32"),
                    "is_cut": pd.Series(out_cut, dtype="bool"),
                }
            )

    d = table(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") <= 60
    )
    return d.mapInPandas(cuts, "doc_id long, frame_no int, hamming int, is_cut boolean")


_TEXT_IMAGE_PAIRS_ORACLE = f"""
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
    alldocs AS (SELECT doc_id, text, FALSE AS edit0 FROM base),
    {_DHASH_CTES},
    negs AS (
      SELECT d.doc_id,
             ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#' ||
                                 CAST(i.g AS VARCHAR)), 1, 8))::BIGINT % 100 AS raw
      FROM base d, generate_series(0,1) i(g)),
    prs AS (
      SELECT doc_id,
             CASE WHEN raw = doc_id THEN (raw + 1) % 100 ELSE raw END
               AS image_doc_id,
             0 AS label
      FROM negs
      UNION ALL
      SELECT doc_id, doc_id, 1 FROM base)
    SELECT p.doc_id, p.image_doc_id, p.label, dh.dhash AS image_dhash
    FROM prs p JOIN dh ON dh.doc_id = p.image_doc_id
"""


@query(
    "multimodal_text_image_pairs",
    oracle=_TEXT_IMAGE_PAIRS_ORACLE,
    category="multimodal",
)
def multimodal_text_image_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive text-image pair construction (the CLIP-style training
    table): every document pairs with ITS image (label 1) and with k=2
    hash-deterministic other documents' images (label 0) — the
    negative-sampling arithmetic of negative_pair_sample applied to the
    multimodal corpus. Images render and dHash ONCE through the real
    codec inside one mapInPandas pass (64-bit hash per image, pixels
    never shuffle); the pair table then equi-joins that hash table on
    image_doc_id — at 100 TB this is the standard fan-out join against a
    precomputed image-feature store, never a re-decode per pair.
    Fully oracle-checked (SQL dhash + the same md5 negative-sampling
    arithmetic); pytest pins positives carrying their own image's hash,
    negatives never doing so, and bit-identical reruns."""
    from collections.abc import Iterator

    import pandas as pd

    from db_core_spark.operators.multimodal import dhash64, synth_ppm_for_text

    n_docs = 100
    d = table(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < n_docs
    )

    def hash_images(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "image_doc_id": pdf["doc_id"],
                    "image_dhash": [dhash64(synth_ppm_for_text(t)) for t in pdf["text"]],
                }
            )

    dhashes = d.mapInPandas(hash_images, "image_doc_id long, image_dhash long")

    k = 2
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#"), F.col("i").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    negs = (
        d.select("doc_id")
        .withColumn("i", F.explode(F.array(*[F.lit(j) for j in range(k)])))
        .withColumn("raw", h32 % n_docs)
        .select(
            "doc_id",
            F.when(F.col("raw") == F.col("doc_id"), (F.col("raw") + 1) % n_docs)
            .otherwise(F.col("raw"))
            .alias("image_doc_id"),
            F.lit(0).alias("label"),
        )
    )
    pos = d.select(
        "doc_id", F.col("doc_id").alias("image_doc_id"), F.lit(1).alias("label")
    )
    return pos.unionByName(negs).join(dhashes, "image_doc_id").select(
        "doc_id", "image_doc_id", "label", "image_dhash"
    )


# VAD oracle: the PCM stream is 4 x 1024-byte segments; segment s of doc d
# is speech iff (d + s) % 2 = 0, its bytes the md5 keystream of
# text || ':aud' || s || '|' || block (64 blocks); silence bytes are 0x80
# (zero energy, so only speech bytes are generated). A byte at stream index
# i belongs to STFT frames i//256 and i//256 - 1 (512-byte window, 256-byte
# hop), so per-frame energy is one equi-join aggregate over a 16-frame
# spine; the final frame truncates to 256 bytes. `active` compares the
# UNROUNDED energy against the threshold, as the pandas path does.
_AUDIO_VAD_ORACLE = """
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id <= 60),
    sbytes AS (
      SELECT d.doc_id, g.g AS idx,
             ('0x' || substr(
                md5(d.text || ':aud' || CAST(g.g // 1024 AS VARCHAR) || '|'
                    || CAST((g.g % 1024) // 16 AS VARCHAR)),
                2*((g.g % 1024) % 16) + 1, 2))::INT - 128 AS dev
      FROM base d, generate_series(0,4095) g(g)
      WHERE (d.doc_id + g.g // 1024) % 2 = 0),
    contrib AS (
      SELECT doc_id, idx // 256 AS f, dev*dev AS sq FROM sbytes
      UNION ALL
      SELECT doc_id, idx // 256 - 1, dev*dev FROM sbytes WHERE idx // 256 >= 1),
    frame_spine AS (
      SELECT d.doc_id, f.g AS frame_no, CAST(f.g * 256 AS BIGINT) AS start_byte,
             CASE WHEN f.g = 15 THEN 256 ELSE 512 END AS flen
      FROM base d, generate_series(0,15) f(g)),
    ssqs AS (
      SELECT doc_id, f, SUM(sq) AS ssq FROM contrib WHERE f <= 15 GROUP BY 1, 2)
    SELECT fs.doc_id, CAST(fs.frame_no AS INT) AS frame_no, fs.start_byte,
           FLOOR(COALESCE(s.ssq, 0) * 10000.0 / fs.flen + 0.5) / 10000.0 AS energy,
           COALESCE(s.ssq, 0) * 1.0 / fs.flen > 100.0 AS active
    FROM frame_spine fs
    LEFT JOIN ssqs s ON s.doc_id = fs.doc_id AND s.f = fs.frame_no
"""


@query("multimodal_audio_vad", oracle=_AUDIO_VAD_ORACLE, category="multimodal")
def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity detection over synthetic audio: each document renders
    to a 4-segment PCM-like byte stream (speech segments = md5-keystream
    noise, silence segments = constant midpoint — which segments are which
    is planted per doc_id), then STFT-style frames (512-byte window,
    256-byte hop, the chunk_audio geometry) score mean squared deviation
    from the midpoint and frames above the energy threshold flag active —
    the segmentation pass an ASR pipeline runs before transcribing
    anything. Framing and scoring happen inside one mapInPandas over the
    partition holding the payload: zero shuffle, only (doc, frame, energy,
    flag) rows emerge. Fully oracle-checked (the SQL twin re-derives the
    PCM keystream and folds per-frame energy); pytest pins frames
    inside planted silence to energy 0 / inactive and frames inside
    planted speech to active."""
    from collections.abc import Iterator

    import pandas as pd

    seg_bytes, window, hop = 1024, 512, 256
    n_segs, threshold = 4, 100.0

    def synth_pcm(text: str, doc_id: int) -> bytes:
        # keystream block i of segment s is md5(text + ":aud{s}|" + str(i))
        # — ASCII counter so the identical stream is derivable in the SQL
        # oracle (same construction as synth_ppm_for_text)
        import hashlib

        buf = bytearray()
        for s in range(n_segs):
            if (doc_id + s) % 2 == 0:  # planted speech segment
                seed = f"{text}:aud{s}|".encode()
                chunk = bytearray()
                ctr = 0
                while len(chunk) < seg_bytes:
                    chunk.extend(hashlib.md5(seed + str(ctr).encode()).digest())
                    ctr += 1
                buf.extend(chunk[:seg_bytes])
            else:  # planted silence
                buf.extend(b"\x80" * seg_bytes)
        return bytes(buf)

    def vad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        out = {"doc_id": [], "frame_no": [], "start_byte": [], "energy": [], "active": []}
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = synth_pcm(text, int(doc_id))
                n = len(data)
                i = 0
                while i * hop < n:
                    s = i * hop
                    frame = data[s : s + window]
                    energy = sum((b - 128) * (b - 128) for b in frame) / len(frame)
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["start_byte"].append(s)
                    # portable half-up quantization (k/flen energies land
                    # exactly on .xxxx5, where round()'s half-even and SQL
                    # ROUND's half-away diverge)
                    out["energy"].append(math.floor(energy * 10000 + 0.5) / 10000)
                    out["active"].append(energy > threshold)
                    i += 1
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_no": pd.Series(out["frame_no"], dtype="int32"),
                "start_byte": pd.Series(out["start_byte"], dtype="int64"),
                "energy": pd.Series(out["energy"], dtype="float64"),
                "active": pd.Series(out["active"], dtype="bool"),
            }
        )

    d = table(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") <= 60
    )
    return d.mapInPandas(
        vad, "doc_id long, frame_no int, start_byte long, energy double, active boolean"
    )


# Palette oracle: the keystream pixels are re-derived directly (all 108
# md5 blocks = 1728 bytes/doc), quantized to the 4x4x4 cube, counted, and
# top-3 ranked by (count DESC, cell ASC) — exactly numpy's stable argsort of
# -counts over ascending cell ids. Shares divide by the fixed 576 pixels.
_DOMINANT_COLORS_ORACLE = """
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id <= 200),
    blocks AS (
      SELECT doc_id, b.g AS blk, md5(text || '|' || CAST(b.g AS VARCHAR)) AS hx
      FROM base, generate_series(0,107) b(g)),
    bytes AS (
      SELECT bl.doc_id, bl.blk*16 + j.g AS idx,
             ('0x' || substr(bl.hx, 2*j.g + 1, 2))::INT AS val
      FROM blocks bl, generate_series(0,15) j(g)),
    cells AS (
      SELECT b0.doc_id,
             (b0.val >> 6) * 16 + (b1.val >> 6) * 4 + (b2.val >> 6) AS cell
      FROM bytes b0
      JOIN bytes b1 ON b1.doc_id = b0.doc_id AND b1.idx = b0.idx + 1
      JOIN bytes b2 ON b2.doc_id = b0.doc_id AND b2.idx = b0.idx + 2
      WHERE b0.idx % 3 = 0),
    counts AS (SELECT doc_id, cell, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
    ranked AS (
      SELECT doc_id, cell, cnt,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, cell) AS rk
      FROM counts)
    SELECT doc_id, CAST(cell AS INT) AS color_cell,
           ROUND(cnt / 576.0, 6) AS share, CAST(rk AS INT) AS rank
    FROM ranked WHERE rk <= 3
"""


@query(
    "multimodal_dominant_colors",
    oracle=_DOMINANT_COLORS_ORACLE,
    category="multimodal",
)
def multimodal_dominant_colors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-color extraction through the REAL codec: each document's
    synthetic PPM renders, DECODES (stdlib codec), quantizes every pixel
    to a 4x4x4 RGB cube (64 cells), and reports the top-3 cells with
    their pixel shares — the palette/thumbnail-indexing feature of an
    image-curation pipeline (and the blocking key for palette-based
    near-dup candidates). Pixels never leave the executor: mapInPandas
    emits 3 rows of (doc_id, color_cell, share) per image regardless of
    resolution. Fully oracle-checked (SQL keystream + quantize + rank
    twin); pytest pins determinism,
    share normalization, and byte-identical images yielding identical
    palettes."""
    from collections.abc import Iterator  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    from db_core_spark.operators.imagecodec import sniff_decode  # noqa: PLC0415
    from db_core_spark.operators.multimodal import synth_ppm_for_text  # noqa: PLC0415

    d = table(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") <= 200
    )

    def palette(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # noqa: PLC0415

        for pdf in batches:
            out_id, out_cell, out_share, out_rank = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                img = sniff_decode(synth_ppm_for_text(text))
                px = np.frombuffer(img.pixels, dtype=np.uint8).reshape(-1, 3)
                cells = (
                    (px[:, 0] >> 6) * 16 + (px[:, 1] >> 6) * 4 + (px[:, 2] >> 6)
                )
                counts = np.bincount(cells, minlength=64)
                top = np.argsort(-counts, kind="stable")[:3]
                for rk, cell in enumerate(top, start=1):
                    out_id.append(doc_id)
                    out_cell.append(int(cell))
                    out_share.append(round(float(counts[cell]) / len(px), 6))
                    out_rank.append(rk)
            yield pd.DataFrame(
                {
                    "doc_id": out_id,
                    "color_cell": out_cell,
                    "share": out_share,
                    "rank": out_rank,
                }
            )

    return d.mapInPandas(
        palette, "doc_id long, color_cell int, share double, rank int"
    )
