"""Freeze the single-node spec oracle's FULL-pipeline output to parquet.

Upgrades the flagship ``pipeline_correct_turns`` from a rows-only driver
row to a real rows+schema+hash check (VERDICT r3 item 1): the expected
output is generated here with ZERO Spark — the transcript derivation is a
pure-Python re-statement of ``__spark_entry__.transcripts_from_documents``
(same spec, independent execution), and the correction itself is the
sequential single-node oracle (``oracle.spec.correct_corpus``), mirroring
the reference's gold-standard acceptance harness
(evalocr/analyze_gold_vrt.py:42-103: precomputed expected text compared
row-for-row).  The driver's DuckDB gate then does a plain
``read_parquet`` of the frozen fixture — a genuine cross-engine equality
join for the whole correction path, alignment and SymSpell included.

Each fixture row carries the corpus fingerprint ``(n_docs, n_chars)`` of
the documents table it was generated from, so one glob-read SQL text
selects the right fixture for whichever sf dir the gate runs against —
and a regenerated/changed testdata set makes the oracle return ZERO rows
(loud failure), never a silently stale expectation.

Usage: python tools/make_expected.py [sf_dir ...]
Defaults to sf0.001 and sf0.01 (the gate's two scales).
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "fixtures", "expected_corrected")

# pure-Python twins of the Spark-side derivation expressions
# (__spark_entry__.py transcripts_from_documents).  Plain-text regex
# patterns behave identically in Java and Python `re` — both do
# non-overlapping left-to-right replacement.
_PUNCT_PAD = re.compile(r"([.,:;!?()])")  # == __spark_entry__.PUNCT_CLASS
_WS = re.compile(r"\s+")


def _portable_tokens(s: str) -> list[str]:
    padded = _PUNCT_PAD.sub(r" \1 ", s)
    return [t for t in _WS.split(padded) if t]


def derive_transcripts(docs: list[tuple[str, str]], turns_per_doc: int = 4):
    """(doc_id, text) rows -> (base_rows, alt_rows, lexicon), the exact
    semantics of transcripts_from_documents, executed without Spark."""
    base, alt, counts = [], [], Counter()
    for doc_id, text in docs:
        toks = text.split(" ")  # F.split(_, " ") keeps empties (limit -1)
        per = max(int(len(toks) / turns_per_doc), 1)
        for ti in range(turns_per_doc):
            clean = " ".join(toks[ti * per : ti * per + per])
            if clean == "":
                continue
            noisy = clean.replace(" filter ", " fil-\nter ").replace(
                " scan ", " \n scan "
            )
            noisy = noisy.replace("a", "œ").replace("s", "ſ")
            base.append(
                {
                    "conv_id": f"conv{doc_id}",
                    "turn_idx": ti,
                    "role": ("user", "assistant", "tool")[ti % 3],
                    "text": noisy,
                    "tool": None,
                    "ts": datetime.fromtimestamp(
                        1700000000 + ti * 60, tz=timezone.utc
                    ),
                }
            )
            alt.append(
                {
                    "conv_id": f"conv{doc_id}",
                    "turn_idx": ti,
                    "text": clean.replace("e", "c"),
                }
            )
            counts.update(_portable_tokens(clean.lower()))
    lex = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50000]
    lexicon = [(t, c * 10) for t, c in lex]
    return base, alt, lexicon


def main(sf_dirs: list[str]) -> None:
    from memo_fraktur_ocr_code_spark.oracle.spec import correct_corpus

    os.makedirs(OUT_DIR, exist_ok=True)
    for sf_dir in sf_dirs:
        tbl = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        docs = list(
            zip(
                (str(x) for x in tbl.column("doc_id").to_pylist()),
                tbl.column("text").to_pylist(),
            )
        )
        n_docs = len(docs)
        n_chars = sum(len(t) for _d, t in docs)
        base, alt, lexicon = derive_transcripts(docs)
        rows = correct_corpus(base, alt, lexicon)
        out = pa.table(
            {
                "conv_id": [r["conv_id"] for r in rows],
                "turn_idx": pa.array(
                    [r["turn_idx"] for r in rows], type=pa.int32()
                ),
                "corrected_text": [r["corrected_text"] for r in rows],
                "n_docs": pa.array([n_docs] * len(rows), type=pa.int64()),
                "n_chars": pa.array([n_chars] * len(rows), type=pa.int64()),
            }
        )
        tag = os.path.basename(os.path.normpath(sf_dir))
        dest = os.path.join(OUT_DIR, f"expected_{tag}.parquet")
        pq.write_table(out, dest)
        print(
            f"{dest}: {len(rows)} turns frozen"
            f" (n_docs={n_docs}, n_chars={n_chars})"
        )


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    main(dirs)
