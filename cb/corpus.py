"""Synthetic source-code corpus + identity columns.

Input table shape per BASELINE.json ``input_hint``:
``(repo:string, path:string, commit:string, lang:string, content:string)``.

Deterministic synthesis (seeded per-document, so the corpus is identical
regardless of generation order, batching, or process count — the analog
of the reference's golden fixture files,
/root/reference/test/ConveyorBelt.Tooling.Test/Data/).

Identity columns (the reference's deterministic-ID idempotence,
``_id = PartitionKey + RowKey`` at
/root/reference/src/ConveyorBelt.Tooling/NestBatchPusher.cs:70-71):

- ``doc_id``  = first 8 bytes (63 bits) of sha256("repo\\0path\\0commit").
  Content-derived, so ids are stable under resume, repartitioning and
  re-runs — no global sort or arrival-order dependence.  Collision odds
  at 10^12 docs are ~5% over the whole corpus (birthday bound on 63
  bits); the build detects collisions (distinct key count vs distinct
  doc_id count) and the scale path is to widen to 2x int64 or assign
  dense ids by a one-off sort.  At sandbox scale collisions are ~1e-10.
- ``content_sha256`` = hex sha256 of ``content`` (the per-row invariant
  required by BASELINE.json ``input_hint``).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["python", "java", "go", "js", "rust"]
_LANG_W = [0.4, 0.2, 0.15, 0.15, 0.1]

_KEYWORDS = {
    "python": ["import", "return", "def", "class", "if", "else", "for", "while", "try", "except", "lambda", "yield", "self", "none", "true", "false"],
    "java": ["import", "return", "public", "class", "void", "static", "final", "new", "if", "else", "for", "while", "try", "catch", "extends", "interface"],
    "go": ["import", "return", "func", "type", "struct", "if", "else", "for", "range", "defer", "go", "chan", "interface", "package", "var", "const"],
    "js": ["import", "return", "function", "class", "const", "let", "var", "if", "else", "for", "while", "async", "await", "export", "new", "typeof"],
    "rust": ["use", "return", "fn", "struct", "impl", "if", "else", "for", "while", "match", "let", "mut", "pub", "trait", "enum", "mod"],
}
_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "rust": "rs"}

_SYLLABLES = [
    "get", "set", "parse", "read", "write", "load", "store", "index", "query",
    "shard", "merge", "split", "token", "batch", "block", "node", "item",
    "data", "file", "line", "row", "col", "map", "list", "hash", "key",
    "value", "count", "total", "max", "min", "buf", "str", "num", "ctx",
    "cfg", "tmp", "meta", "sync", "async", "http", "json", "xml", "util",
]

# Contents embedding the tokenizer edge cases (FIXTURES.md §1); placed at
# fixed doc indices 0..len-1 of every generated corpus.
EDGE_CONTENTS = [
    "camelCaseIdent snake_case_ident SCREAMING_CASE HTMLParser2",
    "éclair_café unicodeßident",
    "",  # empty file
    "the and of to is a",  # only stopwords
    "getHTTPResponseCode x86_64 utf8Decode",
]


def _ident_vocab(seed: int, n: int = 2000) -> list[str]:
    rng = np.random.Generator(np.random.PCG64(seed))
    out = []
    for _ in range(n):
        k = int(rng.integers(2, 4))
        parts = [_SYLLABLES[int(i)] for i in rng.integers(0, len(_SYLLABLES), k)]
        if rng.random() < 0.5:  # snake_case
            out.append("_".join(parts))
        else:  # camelCase
            out.append(parts[0] + "".join(p.capitalize() for p in parts[1:]))
    return out


def _doc_content(rng: np.random.Generator, lang: str, vocab: list[str], zipf_cum: np.ndarray) -> str:
    kw = _KEYWORDS[lang]
    target = min(int(np.exp(rng.normal(6.7, 1.1))) + 200, 50_000)  # bytes, heavy-tailed
    # Draw identifier/choice streams up-front (vectorized Zipf via
    # searchsorted on the cumulative distribution).
    est_lines = target // 12 + 8
    idents = np.searchsorted(zipf_cum, rng.random(est_lines * 4))
    kinds = rng.random(est_lines)
    nums = rng.integers(0, 1000, est_lines)
    lines: list[str] = []
    size = ip = 0
    for li in range(est_lines):
        if size >= target:
            break
        if ip + 5 >= len(idents):
            idents = np.concatenate([idents, np.searchsorted(zipf_cum, rng.random(est_lines * 4))])
        r = kinds[li]
        if r < 0.15:
            line = f"{kw[0]} {vocab[idents[ip]]}"
            ip += 1
        elif r < 0.30:
            line = f"{kw[2 % len(kw)]} {vocab[idents[ip]]}({vocab[idents[ip+1]]}):"
            ip += 2
        elif r < 0.45:
            line = f"    {kw[1]} {vocab[idents[ip]]} + {nums[li]}"
            ip += 1
        elif r < 0.60:
            k = 2 + li % 4
            line = "# " + " ".join(vocab[i] for i in idents[ip:ip + k])
            ip += k
        else:
            op = ["=", "==", "+=", ".", "->"][li % 5]
            line = f"{vocab[idents[ip]]} {op} {vocab[idents[ip+1]]}"
            ip += 2
        lines.append(line)
        size += len(line) + 1
    return "\n".join(lines)


def generate_corpus(n_docs: int, seed: int = 42) -> pa.Table:
    """Deterministic corpus; doc i is a pure function of (seed, i)."""
    return generate_corpus_slice(0, n_docs, seed)


def generate_corpus_slice(start: int, count: int, seed: int = 42) -> pa.Table:
    """Docs [start, start+count) of the seed's corpus (order-independent)."""
    vocab = _ident_vocab(seed)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    zipf_p = (1.0 / ranks) / np.sum(1.0 / ranks)
    zipf_cum = np.cumsum(zipf_p)
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(start, start + count):
        rng = np.random.Generator(np.random.PCG64((seed << 32) ^ i))
        lang = LANGS[int(rng.choice(len(LANGS), p=_LANG_W))]
        repo = f"org{i % 7}/repo{i % 23}"
        pkg = _SYLLABLES[int(rng.integers(0, len(_SYLLABLES)))]
        path = f"src/{pkg}/module_{i}.{_EXT[lang]}"
        if i < len(EDGE_CONTENTS):
            content = EDGE_CONTENTS[i]
        else:
            content = _doc_content(rng, lang, vocab, zipf_cum)
        repos.append(repo)
        paths.append(path)
        commits.append(hashlib.sha1(f"{repo}/{path}".encode()).hexdigest())
        langs.append(lang)
        contents.append(content)
    return pa.table(
        {
            "repo": pa.array(repos, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "content": pa.array(contents, type=pa.string()),
        }
    )


def write_corpus(out_dir: str, n_docs: int, seed: int = 42, n_files: int = 4) -> str:
    """Write the corpus as a directory of row-group-sized parquet files."""
    os.makedirs(out_dir, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files
    start = 0
    for f in range(n_files):
        cnt = min(per, n_docs - start)
        if cnt <= 0:
            break
        tbl = generate_corpus_slice(start, cnt, seed)
        pq.write_table(tbl, os.path.join(out_dir, f"part-{f:05d}.parquet"))
        start += cnt
    return out_dir


def doc_ids_from_keys(repo, path, commit) -> np.ndarray:
    """Content-derived 63-bit doc ids (see module docstring)."""
    out = np.empty(len(repo), dtype=np.int64)
    rl, pl, cl = (
        _to_pylist(repo),
        _to_pylist(path),
        _to_pylist(commit),
    )
    for i, (r, p, c) in enumerate(zip(rl, pl, cl)):
        h = hashlib.sha256(f"{r}\x00{p}\x00{c}".encode()).digest()
        out[i] = int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF
    return out


def _to_pylist(x):
    return x.to_pylist() if isinstance(x, (pa.Array, pa.ChunkedArray)) else list(x)


def sha256_hex(texts) -> list[str]:
    return [hashlib.sha256(t.encode()).hexdigest() for t in _to_pylist(texts)]


def with_identity(batch: pa.Table) -> pa.Table:
    """map_batches fn: corpus batch -> + doc_id + content_sha256."""
    ids = doc_ids_from_keys(batch["repo"], batch["path"], batch["commit"])
    sha = sha256_hex(batch["content"])
    batch = batch.append_column("doc_id", pa.array(ids, type=pa.int64()))
    return batch.append_column("content_sha256", pa.array(sha, type=pa.string()))
