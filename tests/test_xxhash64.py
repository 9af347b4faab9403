"""Parity of the pure-Python xxhash64 mirror vs Spark's F.xxhash64.

The mirror underpins the single-node triples oracle (the minhash-LSH
canonicalization fixture), so it is fuzzed against the real expression
across every branch of the algorithm: int/long children, empty
strings, <8-byte tails, the 4-byte chunk path, 8..31-byte word path,
>=32-byte stripe path, multi-byte UTF-8, and multi-child seed
chaining exactly as minhash_signatures uses it."""

import random
import string

import pytest
from pyspark.sql import functions as F, types as T

from weak_supervision_for_ner_spark.functions.xxhash64 import xxhash64


def _rand_str(rng, lo=0, hi=80):
    n = rng.randint(lo, hi)
    alphabet = string.ascii_letters + string.digits + " ^$.,-'&ØæåÆéü€文"
    return "".join(rng.choice(alphabet) for _ in range(n))


def test_string_hash_parity(spark):
    rng = random.Random(7)
    vals = [""] + ["a" * n for n in (1, 3, 4, 7, 8, 9, 15, 16, 31, 32, 33, 64, 100)]
    vals += [_rand_str(rng) for _ in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], schema="s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for v in vals:
        assert got[v] == xxhash64(v), repr(v)


def test_int_and_chain_parity(spark):
    """The exact shape minhash_signatures hashes: (lit(int), string)."""
    rng = random.Random(11)
    rows = [(rng.randint(-(2**31), 2**31 - 1), _rand_str(rng, 1, 40))
            for _ in range(150)]
    schema = T.StructType([
        T.StructField("i", T.IntegerType()),
        T.StructField("s", T.StringType()),
    ])
    df = spark.createDataFrame(rows, schema=schema)
    got = df.select("i", "s", F.xxhash64("i", "s").alias("h")).collect()
    for r in got:
        assert r["h"] == xxhash64(r["i"], r["s"]), (r["i"], r["s"])


def test_long_parity(spark):
    rng = random.Random(13)
    vals = [rng.randint(-(2**63), 2**63 - 1) for _ in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], schema="v long")
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert got[v] == xxhash64(("long", v)), v


def test_unsupported_type_raises():
    with pytest.raises(TypeError):
        xxhash64(1.5)
