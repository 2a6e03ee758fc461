"""Sentence-aware chunker for vector-store indexing (SURVEY.md §2 A7).

Greedy packing of whole sentences into chunks. Pinned parameters and
rules (chunk boundaries must match exactly — BASELINE.json:6):

  * MAX_CHARS = 1600: a chunk's [char_start, char_end) span length
    never exceeds this, except the single-long-sentence case.
  * Whole sentences only — never split mid-sentence.
  * A single sentence longer than MAX_CHARS becomes its own chunk.
  * OVERLAP_SENTS = 1: each chunk after the first re-starts with the
    last sentence of the previous chunk (context overlap), unless the
    overlap sentence alone is >= MAX_CHARS (then no overlap).
  * chunk span = [start of first sentence, end of last sentence) in
    the canonicalized document; chunk_text = text[char_start:char_end]
    (so inter-sentence whitespace inside the span is preserved).
  * Packing check counts the full candidate span (end of candidate
    sentence minus start of the chunk's first sentence).
  * Empty document -> zero chunks.

Output per chunk: (chunk_ix, char_start, char_end, sent_start,
sent_end, text) with sent_* indexing into the document's sentence
list, [sent_start, sent_end) exclusive.
"""

from __future__ import annotations

from dataclasses import dataclass

from engine.kernels.sentences import sentence_spans

MAX_CHARS = 1600
OVERLAP_SENTS = 1


@dataclass(frozen=True)
class Chunk:
    chunk_ix: int
    char_start: int
    char_end: int
    sent_start: int
    sent_end: int
    text: str


def chunk_text(
    text: str,
    max_chars: int = MAX_CHARS,
    overlap_sents: int = OVERLAP_SENTS,
    spans=None,
) -> list[Chunk]:
    """Greedy sentence packing over canonicalized text.

    `spans`: precomputed sentence_spans(text) (any sequence of (a,b)
    pairs, e.g. an (n,2) int array carried through the extracted
    table); None recomputes. len(spans)==0 means "no sentences", not
    "recompute"."""
    if spans is None:
        spans = sentence_spans(text)
    if not len(spans):
        return []
    chunks: list[Chunk] = []
    i = 0  # sentence index where the current chunk starts
    n = len(spans)
    while i < n:
        start_char = spans[i][0]
        j = i + 1
        # grow while the NEXT sentence still fits in the span budget
        while j < n and spans[j][1] - start_char <= max_chars:
            j += 1
        # [i, j) is the chunk; if even sentence i alone exceeded budget,
        # j == i+1 and the overlong sentence becomes its own chunk.
        end_char = spans[j - 1][1]
        chunks.append(
            Chunk(
                chunk_ix=len(chunks),
                char_start=start_char,
                char_end=end_char,
                sent_start=i,
                sent_end=j,
                text=text[start_char:end_char],
            )
        )
        if j >= n:
            break
        # overlap: re-start from the last `overlap_sents` sentences of this
        # chunk, provided that actually advances and the overlap sentence
        # isn't itself >= max_chars (else we'd loop or emit degenerate dups)
        nxt = j - overlap_sents
        if nxt <= i:
            nxt = j
        elif spans[j - 1][1] - spans[nxt][0] >= max_chars:
            nxt = j
        i = nxt
    return chunks


def chunk_rows(text: str, spans=None) -> list[tuple[int, int, int, int, int, str]]:
    """Tuple form for Arrow/pandas interop (same order as Chunk fields)."""
    return [
        (c.chunk_ix, c.char_start, c.char_end, c.sent_start, c.sent_end, c.text)
        for c in chunk_text(text, spans=spans)
    ]
