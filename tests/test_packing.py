"""Sequence packing: the distributed two-phase prefix sum must equal the
naive single-partition window, stay invariant to the partition count,
and never collapse to one task."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from wills_columnar_format_spark.operators.packing import (
    doc_offsets,
    sequence_pack_spans,
    sequence_pack_tokens,
)


@pytest.fixture(scope="module")
def tok_docs(spark):
    """Docs with actual token arrays (deterministic, ragged lengths,
    some longer than a sequence, one empty)."""
    return spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        # slice-to-n so n=0 yields an EMPTY array (bare sequence(1, 0)
        # would descend to [1, 0])
        F.expr(
            "slice(transform(sequence(1, greatest(cast((id * 37) % 700 as int), 1)), "
            "i -> cast(id * 1000 + i as int)), 1, cast((id * 37) % 700 as int))"
        ).alias("toks"),
    ).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def docs(spark):
    # ragged lengths incl. docs longer than a sequence (straddle several)
    return spark.range(0, 5_000).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 700 + 1).cast("int").alias("n_chars"),
    ).localCheckpoint(eager=True)


def _naive_offsets(spark, docs):
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    return docs.select(
        "doc_id",
        F.col("n_chars").alias("n"),
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).cast("bigint").alias("off"),
    )


def test_offsets_match_naive_window(spark, docs):
    got = {r.doc_id: (r.n, r.off) for r in doc_offsets(docs, "doc_id", "n_chars", 8).collect()}
    exp = {r.doc_id: (r.n, r.off) for r in _naive_offsets(spark, docs).collect()}
    assert got == exp


def test_offsets_invariant_to_partition_count(spark, docs):
    a = sorted((r.doc_id, r.off) for r in doc_offsets(docs, "doc_id", "n_chars", 2).collect())
    b = sorted((r.doc_id, r.off) for r in doc_offsets(docs, "doc_id", "n_chars", 16).collect())
    assert a == b


def test_pack_spans_exact(spark, docs):
    L = 512
    spans = {r.seq_id: (r.n_docs, r.n_units, r.first_doc, r.last_doc)
             for r in sequence_pack_spans(docs, L, "doc_id", "n_chars", 8).collect()}
    # reference: naive python packing
    rows = sorted((r.doc_id, r.n_chars) for r in docs.collect())
    exp = {}
    off = 0
    for doc_id, n in rows:
        if n <= 0:
            continue
        for s in range(off // L, (off + n - 1) // L + 1):
            nd, nu, fd, ld = exp.get(s, (0, 0, None, None))
            ov = min((s + 1) * L, off + n) - max(s * L, off)
            exp[s] = (nd + 1, nu + ov,
                      doc_id if fd is None else min(fd, doc_id),
                      doc_id if ld is None else max(ld, doc_id))
        off += n
    assert spans == exp
    # every sequence is exactly L units except the last
    total = sum(n for _, n in rows)
    for s, (_, nu, _, _) in spans.items():
        assert nu == (L if s < max(spans) else total - L * max(spans))


def test_no_single_partition_window(spark, docs):
    """The scale property: no stage may run the ORDER-BY-everything
    window (SinglePartition exchange) — the whole point of the two-phase
    prefix sum."""
    out = sequence_pack_spans(docs, 512, "doc_id", "n_chars", 8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_pack_tokens_payload_exact(spark, tok_docs):
    """The packed sequences ARE the concatenated token stream: flattening
    seq 0..max in order reproduces every doc's tokens in doc_id order,
    every sequence is exactly L tokens except the last, and per-sequence
    counts agree with sequence_pack_spans."""
    L = 512
    out = {r.seq_id: (r.n_tokens, r.tokens)
           for r in sequence_pack_tokens(tok_docs, L, "doc_id", "toks", 8).collect()}
    stream = [
        t
        for r in sorted(tok_docs.collect(), key=lambda r: r.doc_id)
        for t in r.toks
    ]
    assert sorted(out) == list(range((len(stream) + L - 1) // L))
    rebuilt = [t for s in sorted(out) for t in out[s][1]]
    assert rebuilt == stream
    last = max(out)
    for s, (n, toks) in out.items():
        assert n == len(toks)
        assert n == (L if s < last else len(stream) - L * last)
    # geometry agrees with the span summary (lengths-only path)
    lens = tok_docs.select("doc_id", F.size("toks").alias("n_chars"))
    spans = {r.seq_id: r.n_units
             for r in sequence_pack_spans(lens, L, "doc_id", "n_chars", 8).collect()}
    assert {s: n for s, (n, _) in out.items()} == spans


def test_pack_tokens_partition_count_invariant(spark, tok_docs):
    a = sorted((r.seq_id, tuple(r.tokens))
               for r in sequence_pack_tokens(tok_docs, 512, "doc_id", "toks", 2).collect())
    b = sorted((r.seq_id, tuple(r.tokens))
               for r in sequence_pack_tokens(tok_docs, 512, "doc_id", "toks", 16).collect())
    assert a == b


def test_pack_tokens_no_single_partition_window(spark, tok_docs):
    """Payload path scale property: no SinglePartition exchange AND no
    Window at all — per-row offsets come from the per-partition Arrow
    cumsum, so the token payload moves through exactly two exchanges
    (the range shuffle in, the seq_id shuffle out)."""
    out = sequence_pack_tokens(tok_docs, 512, "doc_id", "toks", 8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "Window" not in plan
    assert plan.count("Exchange") <= 2


def test_offsets_broadcast_carrier_matches_literal(spark, docs, monkeypatch):
    """Past BASE_CARRIER_MAX_LITERALS partitions the base offsets ride a
    broadcast join instead of a create_map literal: same offsets, and
    the plan no longer inlines the 2·P literals."""
    import wills_columnar_format_spark.operators.packing as pk

    lit_df = doc_offsets(docs, "doc_id", "n_chars", 8)
    lit_plan = lit_df._jdf.queryExecution().executedPlan().toString()
    assert "element_at(" in lit_plan  # the literal-map carrier
    exp = sorted((r.doc_id, r.off) for r in lit_df.collect())
    monkeypatch.setattr(pk, "BASE_CARRIER_MAX_LITERALS", 2)
    got_df = doc_offsets(docs, "doc_id", "n_chars", 8)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "element_at(" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    got = sorted((r.doc_id, r.off) for r in got_df.collect())
    assert got == exp


def test_zero_length_docs_dropped(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, 5)], "doc_id bigint, n_chars int"
    )
    spans = sequence_pack_spans(df, 8, "doc_id", "n_chars", 2).collect()
    by_seq = {r.seq_id: r for r in spans}
    # 15 units total, L=8: seq0 = first 8 units of doc1; seq1 = doc1's
    # last 2 units + all 5 of doc3. doc2 (empty) appears nowhere.
    assert by_seq[0].n_docs == 1 and by_seq[0].first_doc == 1 and by_seq[0].last_doc == 1
    assert by_seq[0].n_units == 8
    assert by_seq[1].n_units == 7 and by_seq[1].n_docs == 2
    assert by_seq[1].first_doc == 1 and by_seq[1].last_doc == 3


def test_shuffle_order_matches_naive_window(spark, docs):
    from wills_columnar_format_spark.operators.packing import shuffle_order

    got = {r.doc_id: r.pos
           for r in shuffle_order(docs, "doc_id", seed=7, num_partitions=8).collect()}
    h = F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("7")))
    w = Window.orderBy(h, "doc_id")
    exp = {r.doc_id: r.pos for r in docs.select(
        "doc_id", (F.row_number().over(w) - 1).cast("bigint").alias("pos")
    ).collect()}
    assert got == exp
    assert sorted(got.values()) == list(range(docs.count()))


def test_shuffle_order_seeds_decorrelate_and_reproduce(spark, docs):
    from wills_columnar_format_spark.operators.packing import shuffle_order

    small = docs.limit(500)
    a1 = {r.doc_id: r.pos for r in shuffle_order(small, "doc_id", 1, 4).collect()}
    a2 = {r.doc_id: r.pos for r in shuffle_order(small, "doc_id", 1, 16).collect()}
    b = {r.doc_id: r.pos for r in shuffle_order(small, "doc_id", 2, 4).collect()}
    assert a1 == a2  # partition-count invariant, reproducible
    same = sum(1 for k in a1 if a1[k] == b[k])
    assert same < len(a1) // 10  # different seed is a different permutation
