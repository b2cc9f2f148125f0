"""memo_fraktur_ocr_code_spark — a from-scratch PySpark-native re-creation
of the MeMo Fraktur OCR post-correction + extraction pipeline
(reference: phildiderichsen/MeMo-Fraktur-OCR-code), applied per transcript
turn over tables of multi-turn conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Layout
------
functions/   pure deterministic spec kernels (tokenizer, edit distances,
             SymSpell index, sequence alignment) shared by the single-node
             oracle and the Arrow-batched Spark kernels
operators/   DataFrame-level operators (normalization, hyphen repair,
             word/hard correction, annotation, aggregation, dedup,
             similarity, text stats, multimodal plumbing)
sources/     readers/writers + deterministic fixture synthesis
plans/       end-to-end pipeline composition, checkpoint/resume manifests
streaming/   Structured Streaming surface for per-turn correction
oracle/      single-node pure-Python execution of the same spec (the
             per-turn byte-equality gold)
"""

__version__ = "0.1.0"
