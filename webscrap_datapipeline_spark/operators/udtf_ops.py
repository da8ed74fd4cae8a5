"""Python UDTF surface (Spark 4 `@udtf`) — the 1:N table function shape
(SURVEY §2.9 X5) as a first-class lateral generator.

The reference's row-building loop (one input hotel → N output log rows,
reference src/process_files.py:90-121) generalizes to "one row in, a
table out". Spark-first that is usually `F.explode` over a computed
array (zero Python); the UDTF exists for generators whose per-row logic
is genuinely imperative — stateful tokenizers, parsers, samplers — where
building the intermediate array column would double peak memory.

Arrow-optimized (`useArrow=True`): batches cross the JVM↔Python boundary
as Arrow record batches, not pickled rows. Still the slow path versus
built-ins — use for logic built-ins can't express.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


CHUNK_SIZE = 20
CHUNK_OVERLAP = 5


@udtf(returnType="chunk_idx int, chunk string, n_words int", useArrow=True)
class DocumentChunker:
    """Context-window chunking: split a document into overlapping
    CHUNK_SIZE-word chunks with CHUNK_OVERLAP words of overlap (stride
    CHUNK_SIZE-CHUNK_OVERLAP) — the standard pre-tokenization step of an
    LLM training pipeline. One doc in, ceil(n/stride) chunk rows out.
    Pure generator: safe for Spark to re-execute on task retry."""

    def eval(self, text: str):
        if text is None:
            return
        words = text.split()
        if not words:
            return
        stride = CHUNK_SIZE - CHUNK_OVERLAP
        idx = 0
        for start in range(0, len(words), stride):
            piece = words[start : start + CHUNK_SIZE]
            yield idx, " ".join(piece), len(piece)
            idx += 1
            if start + CHUNK_SIZE >= len(words):
                break
