"""Engine-parity tests for the portable hashing kernels that the round-5
oracle conversions stand on: portable_hash60 (md5-prefix BIGINT) must agree
bit-for-bit between pure Python, DuckDB, and Spark, and minhash_coeffs must
be a stable deterministic stream (its literals are baked into oracle SQL —
a change would silently break every dependent oracle)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

_CON = duckdb.connect()  # one shared in-memory db for all examples


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@settings(max_examples=150, deadline=None)
@given(st.text(min_size=1, max_size=40).filter(lambda s: "\x00" not in s))
def test_portable_hash60_duckdb_matches_python(s):
    got = _CON.execute(
        "SELECT CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT)", [s]
    ).fetchone()[0]
    assert got == _py_hash60(s)


def test_portable_hash60_spark_matches_python(spark):  # noqa: F811
    from pyspark.sql import functions as F

    from db_core_spark.functions.text import portable_hash60

    tricky = [
        "hello", "a", " ", "'quote'", 'double"quote', "back\\slash",
        "tab\there", "ünïcödé", "汉字", "emoji🙂", "0", "-1", "NaN",
        "x" * 200, "comma,separated,values", "new\nline",
    ]
    df = spark.createDataFrame([(s,) for s in tricky], "s string")
    rows = df.select("s", portable_hash60(F.col("s")).alias("h")).collect()
    for r in rows:
        assert r.h == _py_hash60(r.s), r.s


def test_minhash_coeffs_stream_is_stable_and_prefix_consistent():
    from db_core_spark.functions.text import MINHASH_P, minhash_coeffs

    c68 = minhash_coeffs(68)
    # prefix property: the CMS rows 64..67 extension must not disturb the
    # first 64 pairs minhash_lsh_pairs baked into its oracle
    assert minhash_coeffs(64) == c68[:64]
    for a, b in c68:
        assert 1 <= a <= MINHASH_P - 1 and 0 <= b <= MINHASH_P - 1
    # pin the first pair to a HARD-CODED literal: a silent LCG change would
    # desync every dependent oracle (recomputing both sides would not catch
    # it — the literal is the actual guard)
    assert c68[0] == (546257053, 1866110371)
    assert len({p for p in c68}) == 68  # no duplicate permutations


@pytest.mark.parametrize("val", [0.1234565, -0.1234565, 2.5e-7, 1.9999995])
def test_half_up_quantization_matches_duckdb(val):
    """FLOOR(x*1e6+0.5)/1e6 must agree between Python/numpy and DuckDB —
    the quantizer every float-trajectory oracle (mmr/ivf/kmeans/logreg)
    relies on."""
    import math

    got = _CON.execute(
        "SELECT FLOOR(? * 1000000 + 0.5) / 1000000", [val]
    ).fetchone()[0]
    assert got == math.floor(val * 1e6 + 0.5) / 1e6
