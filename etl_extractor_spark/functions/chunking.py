"""Document chunking — the tokenize-and-window primitive every LLM
training pipeline needs (context-length-bounded chunks).

Implemented as a Python UDTF (Spark 4 user-defined TABLE function):
one input row → N chunk rows. The UDTF is the right tool when the
fan-out arity is data-dependent and the per-row logic is Python (here
it's simple slicing, so the DuckDB oracle can pin the exact semantics;
with a real BPE tokenizer the same UDTF body swaps in tiktoken-style
encode and the plumbing is unchanged).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

CHUNK_SIZE = 50


@udtf(returnType="doc_id: bigint, chunk_id: bigint, chunk_text: string, n_tokens: bigint")
class ChunkTokens:
    """Yield whitespace-token chunks of CHUNK_SIZE per document."""

    def eval(self, doc_id: int, text: str):
        toks = re.sub(r"\s+", " ", text or "").strip().split(" ")
        if toks == [""]:
            toks = []
        for i in range(0, max(len(toks), 1), CHUNK_SIZE):
            chunk = toks[i : i + CHUNK_SIZE]
            yield doc_id, i // CHUNK_SIZE, " ".join(chunk), len(chunk)


def register_chunker(spark) -> None:
    spark.udtf.register("chunk_tokens", ChunkTokens)
