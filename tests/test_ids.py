"""id dictionary encoding (operators/ids.py) — dense-rank mapping."""

from __future__ import annotations

import random

import pandas as pd

from dude_spark.operators.ids import decode_keys, encode_ids, encode_keys


def test_encode_ids_global_dense_rank(spark):
    ids = [f"img-{i:05d}" for i in range(500)]
    shuffled = ids[:]
    random.Random(7).shuffle(shuffled)
    df = spark.createDataFrame(
        pd.DataFrame({"image_id": shuffled, "junk": range(500)})
    ).repartition(13)
    m = encode_ids(df).toPandas().sort_values("image_id").reset_index(drop=True)
    assert list(m["image_id"]) == ids  # complete, no dups
    # dense 0..n-1 AND order-preserving (iid = rank of image_id)
    assert list(m["iid"]) == list(range(500))


def test_encode_ids_deterministic_across_layouts(spark):
    """Same id set under different input partitioning → identical
    mapping (resume/oracle stability does not depend on task layout)."""
    pdf = pd.DataFrame({"image_id": [f"x{i}" for i in range(257)]})
    a = (
        encode_ids(spark.createDataFrame(pdf).repartition(3))
        .toPandas().sort_values("image_id").reset_index(drop=True)
    )
    b = (
        encode_ids(spark.createDataFrame(pdf).repartition(17))
        .toPandas().sort_values("image_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_encode_decode_roundtrip_pairs(spark):
    images = spark.createDataFrame(pd.DataFrame({"image_id": list("abcdef")}))
    ids = encode_ids(images)
    pairs = spark.createDataFrame(pd.DataFrame({"a": ["a", "c"], "b": ["b", "f"]}))
    enc = encode_keys(pairs, ids, ("a", "b"))
    assert dict(enc.dtypes) == {"a": "bigint", "b": "bigint"}
    dec = decode_keys(enc, ids, ("a", "b"))
    assert {(r["a"], r["b"]) for r in dec.collect()} == {("a", "b"), ("c", "f")}


def test_min_iid_decodes_to_min_image_id(spark):
    """The CC representative contract survives encoding: the minimum
    iid of any subset decodes to the lexicographically-minimum id."""
    universe = ["zz", "ab", "m", "ab0", "z", "a!"]
    m = encode_ids(
        spark.createDataFrame(pd.DataFrame({"image_id": universe}))
    ).toPandas()
    by_id = dict(zip(m["image_id"], m["iid"]))
    for subset in (["zz", "m"], ["ab", "ab0"], universe):
        arg = min(subset, key=lambda s: by_id[s])
        assert arg == min(subset)


def test_encode_ids_empty(spark):
    empty = spark.createDataFrame([], "image_id string")
    assert encode_ids(empty).count() == 0
