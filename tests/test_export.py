"""Training-shard export sink: token-budgeted JSONL shards, readable
back losslessly, with a correct shard manifest."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from graphlab_spark.sources.export import export_training_shards

SF = "/root/testdata/sf0.001"


def test_export_shards_roundtrip_and_budget(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = export_training_shards(docs, out, budget_tokens=512)
    man = {(r.bucket, r.chunk_id): (r.n_docs, r.n_tokens) for r in manifest.collect()}
    assert man

    # greedy bound: a shard exceeds the budget only by its LAST doc
    # (the packing rule: a doc starts a new chunk when the running sum
    # before it has already crossed the budget)
    back = spark.read.json(f"{out}")
    assert back.count() == docs.count()  # lossless: every doc exported once

    # per-shard totals match the manifest
    got = {
        (r.bucket, r.chunk_id): (r.n, r.t)
        for r in back.groupBy("bucket", "chunk_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t"))
        .collect()
    }
    assert got == man

    # one JSON file per shard (repartition on the partition keys)
    for b, c in list(man)[:5]:
        files = glob.glob(os.path.join(out, f"bucket={b}", f"chunk_id={c}", "part-*.json"))
        assert len(files) == 1, files

    # shard lines parse as JSON with the expected fields
    sample = glob.glob(os.path.join(out, "bucket=*", "chunk_id=*", "part-*.json"))[0]
    with open(sample) as fh:
        row = json.loads(fh.readline())
    assert set(row) == {"doc_id", "n_tokens", "text"}


def test_export_shards_with_token_ids(spark, tmp_path):
    """Pre-tokenized export: shards carry the BPE token-id arrays, the
    budget runs on exact subword counts, and every exported line's
    n_tokens equals len(token_ids)."""
    from graphlab_spark.functions.bpe import bpe_count_col, bpe_ids_col, load_merges

    merges = load_merges("/root/repo/fixtures/bpe_merges.parquet")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            "text",
            bpe_ids_col(merges).alias("token_ids"),
            bpe_count_col(merges).alias("n_bpe"),
        )
    )
    out = str(tmp_path / "shards_ids")
    manifest = export_training_shards(
        docs, out, budget_tokens=400, count_col="n_bpe", extra_cols=["token_ids"]
    )
    assert manifest.count() > 1

    back = spark.read.json(out)
    assert back.count() == 200
    rows = back.collect()
    assert all(r.n_tokens == len(r.token_ids) for r in rows)
    # ids round-trip exactly (JSON arrays of ints)
    want = {r.doc_id: list(r.token_ids) for r in docs.collect()}
    assert all([int(x) for x in r.token_ids] == want[r.doc_id] for r in rows)
