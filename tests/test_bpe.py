"""BPE tokenizer (engine/ops/bpe): training determinism, the
rank-greedy encode contract, save/load round-trip, and scale shape.

The reference check is a from-first-principles sequential BPE over
the same word-frequency table — the Spark-trained merges must match
it exactly, at any partitioning.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from engine.ops.bpe import (
    EOW,
    _train_merges,
    bpe_encode,
    encode_text,
    encode_word,
    load_bpe,
    pretokenize,
    save_bpe,
    train_bpe,
)


@pytest.fixture(scope="module")
def spark():
    from engine.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


CORPUS = [
    "the lower lowest low newer newest new wider widest wide",
    "the newer the better, the lower the cheaper",
    "low low low lower lower newest",
    "wide wider widest, new newer newest!",
] * 3


def _ref_merges(texts, n):
    """Independent sequential reference: word freqs -> classic loop."""
    wf = Counter()
    for t in texts:
        wf.update(pretokenize(t))
    return _train_merges(sorted(wf.items()), n)


def test_pretokenize_spec():
    assert pretokenize("Hello, World! x2") == ["hello", ",", "world", "!", "x2"]
    assert pretokenize("") == []
    assert pretokenize(None) == []


def test_encode_word_merges_greedily_by_rank():
    # ranks: ('l','o')=0, ('lo','w')=1  =>  "low" -> ["low</w>"]? no:
    # the last symbol carries EOW, so ('lo','w</w>') must be learned
    ranks = {("l", "o"): 0, ("lo", "w" + EOW): 1}
    assert encode_word("low", ranks) == ["low" + EOW]
    assert encode_word("lox", ranks) == ["lo", "x" + EOW]
    # no applicable merges: falls back to characters
    assert encode_word("zz", {}) == ["z", "z" + EOW]


def test_spark_training_matches_sequential_reference(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(CORPUS)],
        "doc_id string, text string",
    )
    merges = train_bpe(docs, n_merges=40, sample_docs=10_000)
    assert merges == _ref_merges(CORPUS, 40)
    # partition invariance: same merges from a repartitioned frame
    assert train_bpe(docs.repartition(7), n_merges=40, sample_docs=10_000) == merges
    # frequent words end as single tokens
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("the", ranks) == ["the" + EOW]
    assert encode_word("low", ranks) == ["low" + EOW]
    # unseen word still encodes (merges as far as trained pairs allow)
    assert "".join(encode_word("lowzq", ranks)) == "lowzq" + EOW


def test_encode_roundtrip_and_counts(spark, tmp_path):
    docs = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(CORPUS)],
        "doc_id string, text string",
    )
    merges = train_bpe(docs, n_merges=40, sample_docs=10_000)
    path = str(tmp_path / "bpe")
    save_bpe(spark, merges, path)
    assert load_bpe(spark, path) == merges

    enc = bpe_encode(docs, merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for r in enc.collect():
        assert r["bpe_tokens"] == encode_text(r["text"], ranks)
        # concatenation restores the pretokenized stream (losslessness)
        joined = "".join(r["bpe_tokens"]).replace(EOW, "")
        assert joined == "".join(pretokenize(r["text"]))

    counted = bpe_encode(docs, merges, count_only=True)
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in counted.collect()}
    want = {
        r["doc_id"]: len(r["bpe_tokens"]) for r in enc.collect()
    }
    assert got == want

    # map-only plan for the apply (closure-shipped ranks, no shuffle)
    plan = counted._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_real_documents_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    merges = train_bpe(docs, n_merges=64, sample_docs=200)
    assert len(merges) > 0
    stats = (
        bpe_encode(docs, merges, count_only=True)
        .agg(
            F.sum("n_bpe_tokens").alias("bpe"),
            F.sum(F.size(F.split(F.coalesce("text", F.lit("")), r"\s+"))).alias(
                "ws"
            ),
        )
        .collect()[0]
    )
    # BPE tokens >= whitespace words (subword splitting), sane ratio
    assert stats["bpe"] >= stats["ws"]
    assert stats["bpe"] < stats["ws"] * 12
