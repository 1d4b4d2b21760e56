"""BPE merge-algorithm goldens for the CLIP tokenizer.

The real ``bpe_simple_vocab_16e6.txt.gz`` cannot ship in this offline image
(no network; the asset exists nowhere on disk — documented in PARITY_r02.md),
so the merge ALGORITHM is pinned against hand-derived goldens on a small
ranked merge table, plus format-equivalence across the three public merge
sources (openai .gz / HF merges.txt / HF tokenizer.json). With the real
asset dropped into ``summer_clip_tpu/models/assets/`` (or ``$CLIP_BPE_PATH``)
the canonical-ids test below runs against openai-clip's published contract.
"""

import gzip
import json

import numpy as np
import pytest

from summer_clip_tpu.models.tokenizer import SimpleTokenizer, get_tokenizer, tokenize

MERGES = [("l", "l"), ("h", "e"), ("he", "ll"), ("hell", "o</w>"), ("e", "l")]


def _write_merges_txt(path):
    path.write_text("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n")
    return path


@pytest.fixture()
def tok(tmp_path):
    return SimpleTokenizer(_write_merges_txt(tmp_path / "merges.txt"))


def test_merge_sequence_hand_derived(tok):
    """"hello" runs the ranked merges in order: ll, he, hell, hello</w>."""
    assert tok.bpe("hello") == "hello</w>"
    # vocab layout: 256 bytes + 256 byte</w> + merges in order + specials
    assert tok.encoder["ll"] == 512
    assert tok.encoder["he"] == 513
    assert tok.encoder["hell"] == 514
    assert tok.encoder["hello</w>"] == 515
    assert tok.encode("hello") == [515]


def test_merge_priority_is_rank_not_position(tok):
    """In "lell", ("e","l") rank 4 beats any later/unranked pair even though
    ("l","e") appears first in the word; result is l + el + l</w>."""
    assert tok.bpe("lell") == "l el l</w>"
    # partial merges stop when no ranked pair remains
    assert tok.bpe("helm") == "he l m</w>"


def test_word_end_marker_distinguishes_final_byte(tok):
    # ("e","l") merges word-internal "el" only; "l</w>" is a different symbol
    assert tok.bpe("el") == "e l</w>"       # final l carries </w>: no merge
    assert tok.bpe("elk") == "el k</w>"     # internal el merges


def test_regex_split_normalization_and_framing(tok):
    ids = tok.encode("Hello  HELLO!")
    hello = tok.encoder["hello</w>"]
    bang = tok.encoder["!</w>"]
    assert ids == [hello, hello, bang]
    arr = tokenize(["hello"], context_length=8, tokenizer=tok)
    assert arr.shape == (1, 8)
    assert arr[0, :3].tolist() == [tok.sot_token, hello, tok.eot_token]
    assert arr[0, 3:].tolist() == [0] * 5
    assert tok.decode([hello, bang]) == "hello !"


def test_three_merge_formats_agree(tmp_path):
    txt = _write_merges_txt(tmp_path / "merges.txt")
    gz = tmp_path / "bpe.txt.gz"
    with gzip.open(gz, "wt", encoding="utf-8") as f:
        f.write("header line ignored\n" + "\n".join(f"{a} {b}" for a, b in MERGES))
    tokjson = tmp_path / "tokenizer.json"
    tokjson.write_text(json.dumps(
        {"model": {"merges": [list(m) for m in MERGES]}}))

    toks = [SimpleTokenizer(p) for p in (txt, gz, tokjson)]
    assert all(t.has_merges for t in toks)
    for t in toks[1:]:
        assert t.encoder == toks[0].encoder
        assert t.bpe_ranks == toks[0].bpe_ranks


def test_truncation_keeps_eot(tok):
    arr = tokenize(["hello " * 50], context_length=8, tokenizer=tok)
    assert arr[0, 0] == tok.sot_token
    assert arr[0, -1] == tok.eot_token


# ---------------------------------------------------------------------------
# Canonical openai-clip contract — runs only when the real asset is present.
# ---------------------------------------------------------------------------

def test_canonical_ids_with_real_asset():
    tok = get_tokenizer()
    if not tok.has_merges or tok.vocab_size != 49408:
        pytest.skip("real CLIP BPE merge asset not available in this image")
    assert tok.sot_token == 49406 and tok.eot_token == 49407
    # openai-clip: clip.tokenize("a photo of a cat")[0, :7]
    ids = tokenize(["a photo of a cat"])[0]
    assert ids[:7].tolist() == [49406, 320, 1125, 539, 320, 2368, 49407]


def test_fallback_mode_structure():
    """Without merges: byte-level ids, canonical vocab size + special ids."""
    tok = SimpleTokenizer(bpe_path="/nonexistent")
    assert not tok.has_merges
    assert tok.vocab_size == 49408
    assert tok.sot_token == 49406 and tok.eot_token == 49407
    ids = tok.encode("cat")
    assert all(i < 512 for i in ids)
    assert tok.decode(ids) == "cat"
