"""Document chunking stage (reference ``Indexer`` :385-445).

Large documents split at sentence boundaries into ≤``chunk_size``-char
chunks with a ``chunk_overlap``-char tail of the previous chunk carried
into the next; each chunk is indexed as its own row, keyed
``parent_doc_id`` + ``chunk_index``, with ``is_chunk`` and a parent
route for query-time dedup-by-route (reference chunk-id format
``"{parentId}#chunk{N}"`` :298,334).

As a Ray stage it is a ``map_batches`` transform that EXPLODES rows
(one in → 1+N out) — flat-map shape, still vectorized per batch at the
row level.  Chunk doc_ids are derived deterministically:
``(parent_id << CHUNK_BITS) | (chunk_index + 1)`` and the parent keeps
``parent_id << CHUNK_BITS``, so ids stay unique, ordered and stable
across runs and cluster sizes (doc-id determinism, SURVEY §7).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

CHUNK_BITS = 12  # up to 4095 chunks per parent
# explicit PCRE-\s class ([ \t\n\r\f\x0b]): the reference's preg_split
# uses PCRE \s (which includes \x0b), Python re's \s additionally
# matches unicode whitespace, and RE2's (the DuckDB oracle) excludes
# \x0b — spelling the class out makes all three engines split the same
_SENT_RE = re.compile(r"(?<=[.!?])[\t\n\f\r\x0b ]+")


def split_sentences(text: str) -> list[str]:
    return [s for s in _SENT_RE.split(text) if s]


def chunk_text(text: str, chunk_size: int, overlap: int) -> list[str]:
    """Pack sentences into ≤chunk_size-char chunks; carry up to
    ``overlap`` trailing characters (whole words) into the next chunk."""
    if len(text) <= chunk_size:
        return [text]
    sentences = split_sentences(text)
    chunks: list[str] = []
    cur = ""
    for s in sentences:
        if cur and len(cur) + 1 + len(s) > chunk_size:
            chunks.append(cur)
            # overlap: trailing words of the finished chunk
            tail = cur[-overlap:] if overlap > 0 else ""
            sp = tail.find(" ")
            if sp >= 0:
                tail = tail[sp + 1 :]
            cur = (tail + " " + s).strip() if tail else s
        else:
            cur = (cur + " " + s).strip() if cur else s
        # a single sentence longer than chunk_size becomes its own chunk(s)
        while len(cur) > chunk_size:
            chunks.append(cur[:chunk_size])
            cur = cur[chunk_size - overlap :] if overlap > 0 else cur[chunk_size:]
    if cur:
        chunks.append(cur)
    return chunks


def chunk_documents(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    chunk_size: int = 1000, chunk_overlap: int = 100,
                    route_col: str | None = None, keep_parent: bool = True,
                    chunks_col: str | None = None):
    """Explode oversized docs into chunk rows.

    Output schema: original columns (text replaced by the chunk text) +
    ``parent_id`` (uint64), ``chunk_index`` (int32, -1 for the parent
    row), ``is_chunk`` (bool).  Docs ≤ chunk_size pass through unchanged
    (chunk_index -1).

    ``chunks_col`` names an optional ``list<string>`` (or list of
    ``{"content": ...}`` structs) column of USER-PROVIDED chunks
    (reference pre-chunked ingest, ``Indexer.php:269-325``): rows with a
    non-empty list skip automatic chunking and index those chunks
    verbatim (parent still kept per ``keep_parent``).
    """

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        user_chunks = (t[chunks_col].to_pylist()
                       if chunks_col and chunks_col in t.column_names
                       else None)
        other_cols = [c for c in t.column_names
                      if c not in (id_col, text_col, chunks_col)]
        # collect per-output-row scalars + the INPUT row index; the other
        # columns are carried over with one vectorized Table.take instead
        # of per-cell .as_py() (row-at-a-time Arrow access is the slowest
        # way to explode)
        take_idx: list[int] = []
        out_ids, out_parent, out_idx, out_is, out_text = [], [], [], [], []

        def emit(i, did, parent, idx, is_chunk, text):
            take_idx.append(i)
            out_ids.append(did)
            out_parent.append(parent)
            out_idx.append(idx)
            out_is.append(is_chunk)
            out_text.append(text)

        for i, (pid, text) in enumerate(zip(ids, texts)):
            base = int(pid) << CHUNK_BITS
            text = text or ""
            pre = user_chunks[i] if user_chunks is not None else None
            if pre:
                # pre-chunked ingest: user chunks verbatim, no auto split
                if keep_parent:
                    emit(i, base, int(pid), -1, False, text)
                for n, ch in enumerate(pre):
                    if n + 1 >= (1 << CHUNK_BITS):
                        break
                    if isinstance(ch, dict):
                        ch = ch.get("content") or ""
                    emit(i, base | (n + 1), int(pid), n, True, str(ch))
                continue
            if len(text) <= chunk_size:
                emit(i, base, int(pid), -1, False, text)
                continue
            chunks = chunk_text(text, chunk_size, chunk_overlap)
            if keep_parent:
                emit(i, base, int(pid), -1, False, text)
            for n, ch in enumerate(chunks):
                if n + 1 >= (1 << CHUNK_BITS):
                    break
                emit(i, base | (n + 1), int(pid), n, True, ch)

        cols = {
            id_col: pa.array(np.asarray(out_ids, dtype=np.uint64), pa.uint64()),
            "parent_id": pa.array(np.asarray(out_parent, dtype=np.uint64), pa.uint64()),
            "chunk_index": pa.array(out_idx, pa.int32()),
            "is_chunk": pa.array(out_is, pa.bool_()),
            text_col: pa.array(out_text, pa.string()),
        }
        if other_cols:
            carried = t.select(other_cols).take(
                pa.array(np.asarray(take_idx, dtype=np.int64)))
            for c in other_cols:
                cols[c] = carried[c]
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")
