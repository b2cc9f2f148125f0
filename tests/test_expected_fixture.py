"""The frozen full-pipeline expectation (tools/make_expected.py).

Two risk surfaces: (a) the pure-Python transcript derivation drifting
from the Spark-side ``transcripts_from_documents`` (the whole point is
that the fixture is generated WITHOUT Spark); (b) the frozen parquet
going stale against regenerated testdata — the oracle SQL fails loud
(fingerprint miss → 0 rows), but CI should catch it before the driver
does.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from tools.make_expected import OUT_DIR, derive_transcripts

SF_SMALL = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    not os.path.isdir(SF_SMALL), reason="driver testdata absent"
)
def test_pure_python_derivation_matches_spark(spark):
    """derive_transcripts (zero Spark) must reproduce
    transcripts_from_documents byte-for-byte: base rows, alt rows and
    the lexicon — otherwise the frozen expectation tests a different
    corpus than the flagship runs on."""
    import __spark_entry__ as entrymod

    base_df, alt_df, lexicon = entrymod.transcripts_from_documents(
        spark, SF_SMALL
    )
    tbl = pq.read_table(
        os.path.join(SF_SMALL, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    docs = list(
        zip(
            (str(x) for x in tbl.column("doc_id").to_pylist()),
            tbl.column("text").to_pylist(),
        )
    )
    py_base, py_alt, py_lex = derive_transcripts(docs)

    got_base = {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
        for r in base_df.collect()
    }
    want_base = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in py_base
    }
    assert got_base == want_base
    got_alt = {
        (r.conv_id, r.turn_idx): r.text for r in alt_df.collect()
    }
    want_alt = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in py_alt
    }
    assert got_alt == want_alt
    assert lexicon == py_lex


def test_frozen_fixtures_fresh_against_testdata():
    """Every frozen fixture's corpus fingerprint must match the live
    documents table it claims to describe; every gate sf dir must have a
    fixture.  Regenerate with tools/make_expected.py on mismatch."""
    fixtures = sorted(glob.glob(os.path.join(OUT_DIR, "expected_*.parquet")))
    assert fixtures, "no frozen fixtures — run tools/make_expected.py"
    by_tag = {}
    for f in fixtures:
        t = pq.read_table(f, columns=["n_docs", "n_chars"])
        tag = os.path.basename(f)[len("expected_") : -len(".parquet")]
        by_tag[tag] = (
            t.column("n_docs")[0].as_py(),
            t.column("n_chars")[0].as_py(),
        )
    for tag in ("sf0.001", "sf0.01"):
        sf_dir = f"/root/testdata/{tag}"
        if not os.path.isdir(sf_dir):
            pytest.skip("driver testdata absent")
        assert tag in by_tag, f"missing frozen fixture for {tag}"
        docs = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["text"]
        )
        n_docs = docs.num_rows
        n_chars = sum(
            len(x) for x in docs.column("text").to_pylist()
        )
        assert by_tag[tag] == (n_docs, n_chars), (
            f"{tag} fixture is stale (fixture fingerprint {by_tag[tag]},"
            f" live ({n_docs}, {n_chars})) —"
            " rerun tools/make_expected.py"
        )


def test_pure_python_opcode_pairs_match_spark(spark):
    """derive_opcode_pairs (zero Spark) must reproduce
    __spark_entry__._opcode_pair_table row-for-row — the frozen opcode
    fixture must describe exactly the pair table the Spark queries
    annotate."""
    import __spark_entry__ as entrymod
    from tools.make_expected import derive_opcode_pairs

    got = {
        (r.doc_id, r.pos): (r.token, r.ocrtok)
        for r in entrymod._opcode_pair_table(spark, SF_SMALL).collect()
    }
    tbl = pq.read_table(
        os.path.join(SF_SMALL, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    want = {}
    for did, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        for d, p, a, b in derive_opcode_pairs(did, text):
            want[(d, p)] = (a, b)
    assert got == want


def test_frozen_fixtures_content_hash_fresh():
    """The content-hash component of the fingerprint (r5): a content
    edit preserving (n_docs, n_chars) must still miss the fixture.  Both
    fixture families carry it and it must match the live corpus."""
    from tools.make_expected import OPCODE_OUT_DIR, content_hash_of

    for out_dir in (OUT_DIR, OPCODE_OUT_DIR):
        fixtures = sorted(
            glob.glob(os.path.join(out_dir, "expected_*.parquet"))
        )
        assert fixtures, f"no frozen fixtures in {out_dir}"
        for f in fixtures:
            t = pq.read_table(f, columns=["content_hash"])
            tag = os.path.basename(f)[
                len("expected_") : -len(".parquet")
            ]
            sf_dir = f"/root/testdata/{tag}"
            if not os.path.isdir(sf_dir):
                continue
            texts = pq.read_table(
                os.path.join(sf_dir, "documents.parquet"),
                columns=["text"],
            ).column("text").to_pylist()
            assert t.column("content_hash")[0].as_py() == (
                content_hash_of(texts)
            ), f"{f} content_hash stale — rerun tools/make_expected.py"


def test_content_hash_detects_length_preserving_edit():
    """The weakness the hash closes (VERDICT r4 'What's wrong #3'): two
    corpora with identical (n_docs, n_chars) but different content must
    fingerprint differently."""
    from tools.make_expected import content_hash_of

    a = ["hello world", "spark graft"]
    b = ["hello worle", "spark graft"]  # same lengths, one char differs
    assert content_hash_of(a) != content_hash_of(b)
    assert content_hash_of(a) == content_hash_of(list(a))
