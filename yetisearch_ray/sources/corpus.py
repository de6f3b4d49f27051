"""Deterministic synthetic source-code corpus (the north-rule input table).

Schema per BASELINE.json input_hint: ``(repo:string, path:string,
commit:string, lang:string, content:string)``.  Rows are written sorted by
``(repo, path, commit)`` across ordered part files, so
``read_parquet_with_doc_ids`` can assign dense doc_ids without a shuffle.

Content is pseudo-source: a per-language keyword skeleton (hot Zipf head —
exercises hot-term skew), identifiers from a seeded vocabulary (long
tail), English doc-comments (stopword/stemming paths), and occasional
unicode identifiers (unicode61 diacritic folding).  Everything derives
from seed 42 → byte-identical across runs and machines, which makes
``sha256(content)`` a stable per-row invariant.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

LANG_KEYWORDS = {
    "python": "def return if else for while import from class try except with as pass lambda yield",
    "php": "function return if else foreach while echo class public private static new use namespace",
    "js": "function return if else for while const let var class import export async await new",
    "go": "func return if else for range import package type struct interface var const defer go",
    "rust": "fn return if else for while loop impl struct enum trait let mut pub use match",
    "java": "public private static void return if else for while class interface import new final try",
}
LANGS = list(LANG_KEYWORDS)
EXTS = {"python": "py", "php": "php", "js": "js", "go": "go", "rust": "rs", "java": "java"}

# identifier word vocabulary (long tail); identifiers are pairs/triples
_WORDS = (
    "parse config loader hash table index search query token stream buffer "
    "cache client server handler router filter mapper reducer writer reader "
    "batch shard segment merge sort scan vector matrix graph node edge tree "
    "heap stack queue list array string number format encode decode compress "
    "schema record field column row block page file path utils helper core "
    "engine worker task job sched timer clock event signal state machine "
    "proto socket http json yaml xml csv binary text char byte bit flag mask "
    "lock mutex atomic thread pool chan sync async wait notify retry backoff "
    "error panic assert check valid parse emit token lexer parser compiler "
    "optimizer planner executor runtime memory alloc free gc ref count weak "
    "strong copy move clone drop init setup teardown open close read write "
    "seek flush commit rollback txn log trace debug info warn metric gauge "
    "counter histogram span context cancel deadline timeout limit quota rate"
).split()

_COMMENT_WORDS = (
    "this function returns the computed value for a given input and handles "
    "edge cases gracefully when the buffer is empty or the connection has "
    "been closed by the remote peer we retry with exponential backoff until "
    "the deadline expires then propagate an error to the caller documentation "
    "generated automatically please keep comments updated running tests "
    "requires a local installation of the toolchain"
).split()

# accent-only words: NFKD-strip (engine) and strip_accents (DuckDB oracle)
# agree on these; sharp-s-style expansions are deliberately excluded so the
# SQL conformance oracle tokenizes identically
_UNICODE_IDS = ["café", "naïve", "übung", "señal", "résumé", "montréal"]


def _doc_content(rng: np.random.Generator, lang: str) -> str:
    kw = LANG_KEYWORDS[lang].split()
    n_lines = int(rng.integers(8, 40))
    lines = []
    for _ in range(n_lines):
        kind = rng.random()
        if kind < 0.55:  # code line: keywords + identifiers
            nk = int(rng.integers(1, 4))
            ni = int(rng.integers(1, 4))
            toks = [kw[int(i)] for i in rng.integers(0, len(kw), nk)]
            idents = [
                "_".join(_WORDS[int(j)] for j in rng.integers(0, len(_WORDS), int(rng.integers(1, 3))))
                for _ in range(ni)
            ]
            lines.append(" ".join(toks[:1] + [idents[0] + "("] + idents[1:] + [")"] + toks[1:]))
        elif kind < 0.85:  # identifier-dense line
            idents = [
                "_".join(_WORDS[int(j)] for j in rng.integers(0, len(_WORDS), 2))
                for _ in range(int(rng.integers(2, 6)))
            ]
            lines.append(" = ".join(idents))
        elif kind < 0.98:  # English comment
            nw = int(rng.integers(5, 15))
            ws = [_COMMENT_WORDS[int(j)] for j in rng.integers(0, len(_COMMENT_WORDS), nw)]
            lines.append("# " + " ".join(ws))
        else:  # rare unicode identifier
            lines.append(f'label = "{_UNICODE_IDS[int(rng.integers(0, len(_UNICODE_IDS)))]}"')
    return "\n".join(lines)


def generate_code_corpus(n_docs: int, out_dir: str, *, num_files: int = 8,
                         force: bool = False) -> str:
    """Generate (idempotently) and return the corpus directory.

    Files are written with many small-ish row groups: each row group is a
    read task in ``read_parquet_with_doc_ids``, so row-group count bounds
    the build's read/tokenize parallelism.
    """
    marker = os.path.join(out_dir, f".complete-v4-{n_docs}")
    if os.path.exists(marker) and not force:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.endswith(".parquet"):
            os.remove(os.path.join(out_dir, f))

    rng = np.random.default_rng(SEED)
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_docs):
        repo = f"org{i % 7}/proj{i % 97}"
        lang = LANGS[i % len(LANGS)]
        path = f"src/module_{i % 23}/file_{i // 23}.{EXTS[lang]}"
        commit = hashlib.sha1(f"{repo}:{path}:0".encode()).hexdigest()
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(_doc_content(rng, lang))

    t = pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.large_string()),
        }
    )
    t = t.sort_by([("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")])
    # split into ordered part files (each internally sorted; file order =
    # global order), multiple row groups per file for read parallelism
    chunk = -(-n_docs // num_files)
    # target ~64 row groups: per-batch fixed costs in the ingest pass
    # (docstore chunk write + one IPC blob per partition) scale with batch
    # count x partitions, so coarse blocks beat fine-grained straggler
    # smoothing (measured: 256 batches doubled the 32-cpu build time)
    rg = max(128, n_docs // 64)
    for fi in range(num_files):
        lo, hi = fi * chunk, min((fi + 1) * chunk, n_docs)
        if lo >= hi:
            break
        pq.write_table(
            t.slice(lo, hi - lo),
            os.path.join(out_dir, f"part-{fi:04d}.parquet"),
            row_group_size=rg,
        )
    with open(marker, "w") as f:
        f.write(str(n_docs))
    return out_dir


_SF_DOCS = {"sf0.001": 1000, "sf0.01": 5000, "sf0.1": 50000}


def corpus_path(sf_dir: str, base: str = "/tmp/ys_corpus") -> str:
    """Deterministic corpus for the scale factor named by ``sf_dir``."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    n = _SF_DOCS.get(sf, 1000)
    out = os.path.join(base, sf)
    return generate_code_corpus(n, out)
