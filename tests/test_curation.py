"""Corpus-curation operators (pipeline/curation.py): PII scan/redaction,
benchmark decontamination, and distributed sequence packing.

Key properties under test: PII detection counts and the ordered redaction
chain on known texts; decontamination flags exactly the documents sharing
a window-span with the benchmark set; pack_sequences is a pure function
of (order key, token counts) — invariant to partitioning and equal to a
single-threaded prefix-sum reference.
"""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.curation import (
    PII_PATTERNS,
    decontaminate,
    pack_sequences,
    packing_stats,
    pii_redact,
    pii_scan,
)


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (0, "reach me at alice@example.com or bob.smith+x@sub.domain.org"),
        (1, "ssn 123-45-6789 card 4111 1111 1111 1111 phone 555-867-5309"),
        (2, "server at 10.0.0.1 and 192.168.1.255 no other pii here"),
        (3, "clean document with no sensitive content at all"),
        (4, "dotted phone 555.867.5309 and dashed 555-867-5309"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_scan_counts(pii_docs):
    got = {r.doc_id: r.asDict() for r in pii_scan(pii_docs).collect()}
    assert got[0]["n_email"] == 2
    assert got[0]["n_ssn"] == got[0]["n_phone"] == got[0]["n_ipv4"] == 0
    assert got[1]["n_ssn"] == 1
    assert got[1]["n_credit_card"] == 1
    assert got[1]["n_phone"] == 1
    assert got[2]["n_ipv4"] == 2
    assert all(v == 0 for k, v in got[3].items() if k != "doc_id")
    assert got[4]["n_phone"] == 2


def test_pii_redact_rewrites_every_class(pii_docs):
    got = {r.doc_id: r.text for r in pii_redact(pii_docs).collect()}
    assert got[0] == "reach me at <EMAIL> or <EMAIL>"
    assert got[1] == "ssn <SSN> card <CREDIT_CARD> phone <PHONE>"
    assert got[2] == "server at <IPV4> and <IPV4> no other pii here"
    assert got[3] == "clean document with no sensitive content at all"
    assert got[4] == "dotted phone <PHONE> and dashed <PHONE>"


def test_pii_redact_class_subset(pii_docs):
    got = {
        r.doc_id: r.text
        for r in pii_redact(pii_docs, classes=("email",)).collect()
    }
    assert "<EMAIL>" in got[0]
    assert "123-45-6789" in got[1]  # ssn untouched


def test_pii_redact_order_credit_card_before_phone(spark):
    # The 4-4-4-4 card shape must be consumed whole; a phone-first chain
    # would eat "1111-1111-1111" fragments. Order is part of the contract.
    assert list(PII_PATTERNS) == [
        "email",
        "ssn",
        "credit_card",
        "phone",
        "ipv4",
    ]
    df = spark.createDataFrame(
        [(0, "card 4111-1111-1111-1111 end")], "doc_id long, text string"
    )
    assert pii_redact(df).collect()[0].text == "card <CREDIT_CARD> end"


# --- decontamination -------------------------------------------------------


@pytest.fixture(scope="module")
def decon_docs(spark):
    # 8-token benchmark item; doc 10 contains it verbatim, doc 11 shares
    # no 4-window with it, doc 12 shares exactly one window.
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (10, f"intro words {bench_text} trailing words here"),
        (11, "completely unrelated content with many distinct tokens okay"),
        (12, "alpha beta gamma delta mixed tail words and more padding"),
        (13, "short doc"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(0, bench_text)], "doc_id long, text string")
    return docs, bench


def test_decontaminate_flags_exact_and_partial(decon_docs):
    docs, bench = decon_docs
    got = {
        r.doc_id: r.asDict()
        for r in decontaminate(docs, bench, window=4).collect()
    }
    # doc 10 holds all five 4-windows of the 8-token benchmark text
    assert got[10]["contaminated"] and got[10]["n_contaminated_spans"] == 5
    assert not got[11]["contaminated"]
    assert got[12]["contaminated"] and got[12]["n_contaminated_spans"] == 1
    # shorter than the window -> zero spans, never contaminated
    assert got[13]["n_spans"] == 0 and not got[13]["contaminated"]
    # one output row per input document
    assert set(got) == {10, 11, 12, 13}


def test_decontaminate_window_longer_than_bench_matches_nothing(decon_docs):
    docs, bench = decon_docs
    got = decontaminate(docs, bench, window=9).filter("contaminated").count()
    assert got == 0


# --- sequence packing ------------------------------------------------------


@pytest.fixture(scope="module")
def pack_docs(spark):
    # token counts 1..40 in a scrambled insert order; packing must sort
    # by doc_id regardless.
    rows = [(i, " ".join(f"t{j}" for j in range(i + 1))) for i in range(40)]
    rows = rows[::3] + rows[1::3] + rows[2::3]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(7)


def _reference_packing(n_tokens_by_id, seq_len):
    out, acc = {}, 0
    for doc_id in sorted(n_tokens_by_id):
        n = n_tokens_by_id[doc_id]
        first = acc // seq_len
        last = (acc + max(n, 1) - 1) // seq_len
        out[doc_id] = (n, acc, first, last, (last - first + 1) if n else 0)
        acc += n
    return out


def test_pack_sequences_matches_prefix_sum_reference(pack_docs):
    seq_len = 64
    got = {
        r.doc_id: (r.n_tokens, r.start_token, r.first_seq, r.last_seq, r.n_seqs)
        for r in pack_sequences(pack_docs, seq_len).collect()
    }
    ref = _reference_packing({i: i + 1 for i in range(40)}, seq_len)
    assert got == ref
    # boundary-splitting documents really span >1 sequence
    assert any(v[4] > 1 for v in got.values())


def test_pack_sequences_partitioning_invariance(pack_docs):
    seq_len = 64
    a = sorted(map(tuple, pack_sequences(pack_docs, seq_len).collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(pack_docs.repartition(1), seq_len).collect(),
        )
    )
    c = sorted(
        map(
            tuple,
            pack_sequences(
                pack_docs.repartition(16, "text"), seq_len
            ).collect(),
        )
    )
    assert a == b == c


def test_pack_sequences_precomputed_counts(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 100), (2, 0), (3, 54)], "doc_id long, cnt long"
    )
    got = {
        r.doc_id: (r.n_tokens, r.start_token, r.first_seq, r.last_seq, r.n_seqs)
        for r in pack_sequences(
            df, 64, text_col="missing", n_tokens_col="cnt"
        ).collect()
    }
    assert got == _reference_packing({0: 10, 1: 100, 2: 0, 3: 54}, 64)
    # zero-token doc occupies no sequence
    assert got[2][4] == 0


def test_packing_stats(pack_docs):
    seq_len = 64
    packed = pack_sequences(pack_docs, seq_len)
    row = packing_stats(packed, seq_len).collect()[0]
    total = sum(range(1, 41))  # 820
    assert row.n_docs == 40
    assert row.total_tokens == total
    assert row.n_sequences == -(-total // seq_len)
    assert row.fill_frac == round(total / (row.n_sequences * seq_len), 6)


def test_pii_scan_luhn(spark):
    from graph_data_science_spark.pipeline.curation import luhn_valid, pii_scan

    df = spark.createDataFrame(
        [
            # valid Visa test number + the same with last digit bumped
            (1, "pay 4111 1111 1111 1111 or 4111 1111 1111 1112 ok"),
            (2, "no cards 1234"),
            (3, "5500-0000-0000-0004 works"),  # valid MC test number
        ],
        "doc_id long, text string",
    )
    raw = {r.doc_id: r.n_credit_card for r in pii_scan(df).collect()}
    luhn = {
        r.doc_id: r.n_credit_card
        for r in pii_scan(df, luhn_check=True).collect()
    }
    assert raw == {1: 2, 2: 0, 3: 1}
    assert luhn == {1: 1, 2: 0, 3: 1}
    # the other classes are unaffected by the flag
    full = pii_scan(df, luhn_check=True).collect()[0]
    assert full.n_email == 0 and full.n_ssn == 0

    from pyspark.sql import functions as F

    vals = df.select(
        F.expr("doc_id"),
        luhn_valid(F.lit("4111 1111 1111 1111")).alias("good"),
        luhn_valid(F.lit("4111-1111-1111-1112")).alias("bad"),
    ).collect()[0]
    assert vals.good is True and vals.bad is False


def test_curate_corpus_end_to_end(spark):
    from graph_data_science_spark.pipeline.curation import curate_corpus

    def para(seed):
        ws = [f"word{chr(96 + seed)}{chr(97 + j)}" for j in range(20)]
        return " ".join(ws * 3)  # 60 passing tokens, all-alpha, len ~6

    base, other, third, fourth = para(1), para(2), para(3), para(4)
    near = base.replace("wordaa", "wordazz", 1)
    bench_span = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base),                         # exact dup of 0
            (2, near),                         # near dup of 0
            (3, other),                        # distinct keeper
            (4, "tiny doc few tokens"),        # fails quality (< 50 tokens)
            (5, third + " ssn 123-45-6789"),   # kept, must be redacted
            (6, fourth + " " + bench_span),    # contaminated
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(100, "prefix " + bench_span + " suffix")], "doc_id long, text string"
    )
    out, report = curate_corpus(
        docs,
        benchmark=benchmark,
        split_weights={"train": 1.0},
        min_jaccard_est=0.5,
    )
    stages = {r.stage: (r.docs_in, r.docs_out) for r in report.collect()}
    assert stages["normalize"] == (7, 7)
    assert stages["exact_dedup"] == (7, 6)     # doc 1 gone
    assert stages["near_dup"] == (6, 5)        # doc 2 gone
    assert stages["quality"] == (5, 4)         # doc 4 gone
    assert stages["pii_redact"] == (4, 4)
    assert stages["decontaminate"] == (4, 3)   # doc 6 gone
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {0, 3, 5}
    assert all(r.split == "train" for r in rows.values())
    assert "<SSN>" in rows[5].text and "123-45-6789" not in rows[5].text


def test_pack_sequences_empty_input(spark):
    from graph_data_science_spark.pipeline.curation import pack_sequences

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(empty, 64).count() == 0  # no map()[int] crash
