"""Assemble an English-prose corpus from in-image package docs.

VERDICT r3 #4 wants speculative decoding proven (or demoted) with a REAL
acceptance rate, which needs models trained on real text — but the image
has no openwebtext/wikitext and zero egress. The closest thing to natural
English available offline is the ~4MB of package documentation shipped in
site-packages (PyPI METADATA description bodies, READMEs, licenses):
templated, repetitive prose — which is fine, since acceptance measures
draft/target AGREEMENT, not language quality.

Output: ``<out>/spec_train.npy`` + ``<out>/spec_val.npy`` — (N, 80) int32
CLIP-BPE chunks (same packing as apps/tokenize_dataset.py, the reference's
80-token convention, conf/tokenize_dataset.yaml:13) with a 95/5 split on
SHUFFLED chunks (fixed seed).

Run: ``python tools/make_spec_corpus.py [out_dir]`` (CPU, ~2 min).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SITE = Path("/opt/venv/lib/python3.12/site-packages")
SEED = 0
MAX_LEN = 80

_rst_junk = re.compile(
    r"^(\s*\.\.|\s*:[a-z-]+:|\s*[=~^`#*-]{4,}\s*$|\s*\|)")
_meta_header = re.compile(r"^[A-Za-z-]+: ")


def iter_docs():
    """Prose bodies from METADATA descriptions, *.md/*.rst, LICENSE files."""
    for p in sorted(SITE.glob("*.dist-info/METADATA")):
        text = p.read_text(errors="replace")
        # the description body follows the first blank line of the headers
        body = text.split("\n\n", 1)
        if len(body) == 2 and len(body[1]) > 500:
            yield body[1]
    for pat in ("*.dist-info/licenses/*", "*/*.md", "*/*.rst"):
        for p in sorted(SITE.glob(pat)):
            if p.is_file() and 500 < p.stat().st_size < 300_000:
                yield p.read_text(errors="replace")


def clean(doc: str) -> str:
    lines = []
    for ln in doc.splitlines():
        if _rst_junk.match(ln) or _meta_header.match(ln):
            continue
        if len(ln) > 400:  # minified/base64 blobs
            continue
        lines.append(ln)
    return "\n".join(lines)


def main(out_dir: str = "outputs/spec_corpus") -> int:
    from summer_clip_tpu.apps.tokenize_dataset import tokenize_texts
    from summer_clip_tpu.models.tokenizer import get_tokenizer

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    tok = get_tokenizer()
    docs, seen = [], set()
    for d in iter_docs():
        d = clean(d)
        h = hash(d[:2000])
        if len(d) > 500 and h not in seen:  # dedup vendored duplicates
            seen.add(h)
            docs.append(d)
    print(f"{len(docs)} docs, {sum(map(len, docs)) / 1e6:.1f} MB raw")
    chunks = tokenize_texts(docs, tok, MAX_LEN)
    rng = np.random.RandomState(SEED)
    order = rng.permutation(len(chunks))
    chunks = chunks[order]
    n_val = max(len(chunks) // 20, 1)
    np.save(out / "spec_val.npy", chunks[:n_val])
    np.save(out / "spec_train.npy", chunks[n_val:])
    print(f"train {len(chunks) - n_val} x {MAX_LEN}, val {n_val} x {MAX_LEN} "
          f"({(len(chunks) - n_val) * MAX_LEN / 1e6:.2f}M train tokens) -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
