"""Byte-level BPE tokenizer with the exact CLIP vocabulary (49 408 tokens).

This reproduces the tokenization contract of the reference's vendored
tokenizer (`/root/reference/clip/simple_tokenizer.py`) — byte<->unicode
table, lowest-rank greedy merge loop, end-of-word ``</w>`` marker, and the
``<|startoftext|>`` / ``<|endoftext|>`` specials — on top of a repackaged
copy of OpenAI's public merge list
(``assets/clip_bpe_merges.zz``, zlib-compressed UTF-8, one merge per line;
48 894 merges => vocab 256*2 + 48 894 + 2 = 49 408).

Tokenization is host-side CPU work; text sequences are tiny (77 tokens).
"""

from __future__ import annotations

import html
import os
import zlib
from functools import lru_cache
from typing import Dict, Iterable, List, Sequence, Tuple, Union

import numpy as np
import regex as re

try:  # ftfy fixes mojibake; optional — prompts in this project are clean ASCII
    import ftfy

    _HAS_FTFY = True
except ImportError:  # pragma: no cover
    _HAS_FTFY = False

SOT_TOKEN = "<|startoftext|>"
EOT_TOKEN = "<|endoftext|>"
CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408


@lru_cache()
def default_merges_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "assets", "clip_bpe_merges.zz")


@lru_cache()
def byte_to_unicode() -> Dict[int, str]:
    """Reversible map from utf-8 bytes to printable unicode chars.

    Printable ASCII/latin-1 bytes map to themselves; the remaining bytes map
    to 256+n so no token string ever contains whitespace/control characters.
    """
    keep = (list(range(ord("!"), ord("~") + 1))
            + list(range(ord("¡"), ord("¬") + 1))
            + list(range(ord("®"), ord("ÿ") + 1)))
    mapping: Dict[int, str] = {b: chr(b) for b in keep}
    shift = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + shift)
            shift += 1
    return mapping


def _load_merges(path: str) -> List[Tuple[str, str]]:
    with open(path, "rb") as f:
        text = zlib.decompress(f.read()).decode("utf-8")
    merges = []
    for line in text.split("\n"):
        a, b = line.split()
        merges.append((a, b))
    return merges


def clean_text(text: str) -> str:
    """Mojibake fix (when ftfy is present) + html unescape + whitespace fold."""
    if _HAS_FTFY:
        text = ftfy.fix_text(text)
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip()


class ClipBPETokenizer:
    """Exact CLIP byte-level BPE."""

    def __init__(self, merges_path: str | None = None,
                 use_native: bool = True):
        self.use_native = use_native and merges_path is None
        self.byte_encoder = byte_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        merges = _load_merges(merges_path or default_merges_path())

        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += [SOT_TOKEN, EOT_TOKEN]
        if len(vocab) != VOCAB_SIZE:
            raise ValueError(f"vocab size {len(vocab)} != {VOCAB_SIZE}")

        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.decoder: Dict[int, str] = {i: tok for tok, i in self.encoder.items()}
        self.merge_ranks: Dict[Tuple[str, str], int] = {
            m: i for i, m in enumerate(merges)
        }
        self._cache: Dict[str, str] = {SOT_TOKEN: SOT_TOKEN, EOT_TOKEN: EOT_TOKEN}
        # Pre-tokenizer: specials, common contractions, letter runs, single
        # digits, and punctuation runs.
        self._pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )

    @property
    def sot_id(self) -> int:
        return self.encoder[SOT_TOKEN]

    @property
    def eot_id(self) -> int:
        return self.encoder[EOT_TOKEN]

    def _bpe(self, token: str) -> str:
        """Apply merges greedily (lowest rank first) to one pre-token."""
        cached = self._cache.get(token)
        if cached is not None:
            return cached

        word: Tuple[str, ...] = tuple(token[:-1]) + (token[-1] + "</w>",)
        if len(word) == 1:
            self._cache[token] = word[0]
            return word[0]

        while len(word) > 1:
            # find the adjacent pair with the lowest merge rank
            best_rank = None
            best_i = -1
            for i in range(len(word) - 1):
                rank = self.merge_ranks.get((word[i], word[i + 1]))
                if rank is not None and (best_rank is None or rank < best_rank):
                    best_rank, best_i = rank, i
            if best_rank is None:
                break
            first, second = word[best_i], word[best_i + 1]
            # merge ALL occurrences of (first, second) in one sweep
            merged: List[str] = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)

        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = clean_text(text).lower()
        # native C++ fast path (ASCII inputs; exact same ids)
        if self.use_native and text.isascii():
            from ..native import native_bpe_encode

            ids = native_bpe_encode(text)
            if ids is not None:
                return ids
        return self._encode_python(text)

    def _encode_python(self, text: str) -> List[int]:
        ids: List[int] = []
        for token in re.findall(self._pat, text):
            mapped = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[piece] for piece in self._bpe(mapped).split(" "))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


@lru_cache()
def get_tokenizer() -> ClipBPETokenizer:
    return ClipBPETokenizer()


def tokenize(
    texts: Union[str, Sequence[str]],
    context_length: int = CONTEXT_LENGTH,
    truncate: bool = False,
) -> np.ndarray:
    """Tokenize into a fixed [N, context_length] int32 array with SOT/EOT.

    Matches the reference ``clip.tokenize`` contract
    (`/root/reference/clip/clip.py:192-228`): raises when a prompt exceeds
    the context length unless ``truncate`` (which keeps EOT as the last id).
    """
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer()
    sot, eot = tok.sot_id, tok.eot_id

    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for row, text in enumerate(texts):
        ids = [sot] + tok.encode(text) + [eot]
        if len(ids) > context_length:
            if truncate:
                ids = ids[:context_length]
                ids[-1] = eot
            else:
                raise RuntimeError(
                    f"Input {text!r} is too long for context length {context_length}")
        out[row, : len(ids)] = ids
    return out
