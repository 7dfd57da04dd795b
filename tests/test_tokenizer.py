import numpy as np
import pytest

from aihab_clip_tpu.tokenizer import (
    CONTEXT_LENGTH,
    VOCAB_SIZE,
    get_tokenizer,
    tokenize,
)


def test_vocab_size():
    tok = get_tokenizer()
    assert len(tok.encoder) == VOCAB_SIZE == 49408
    assert tok.sot_id == 49406
    assert tok.eot_id == 49407


def test_known_token_ids():
    # Published OpenAI CLIP tokenizations (README examples).
    tok = get_tokenizer()
    assert tok.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]
    assert tok.encode("a photo of a dog") == [320, 1125, 539, 320, 1929]
    assert tok.encode("a diagram") == [320, 22697]


def test_tokenize_shape_and_specials():
    arr = tokenize(["a habitat photo of Urban.", "hello world"])
    assert arr.shape == (2, CONTEXT_LENGTH)
    assert arr.dtype == np.int32
    assert (arr[:, 0] == 49406).all()
    for row in arr:
        nz = row[row != 0]
        assert nz[-1] == 49407  # EOT closes each sequence


def test_tokenize_single_string():
    arr = tokenize("a habitat photo of Bog.")
    assert arr.shape == (1, CONTEXT_LENGTH)


def test_case_and_whitespace_insensitive():
    tok = get_tokenizer()
    assert tok.encode("A  Photo\tOF a CAT") == tok.encode("a photo of a cat")


def test_decode_roundtrip():
    tok = get_tokenizer()
    for text in [
        "a habitat photo of Grassland, specifically Improved Grassland",
        "short to medium vegetation height, patchy or tussocky sward",
        "dwarf shrubs (<1.5 m) with moss/lichen!",
    ]:
        ids = tok.encode(text)
        # decode inserts spaces at </w> boundaries (e.g. before punctuation),
        # so roundtrip is exact at the token level, not the string level
        assert tok.encode(tok.decode(ids)) == ids
        assert tok.decode(ids).replace(" ", "") == text.lower().replace(" ", "")


def test_too_long_raises_and_truncate():
    long_text = "habitat " * 200
    with pytest.raises(RuntimeError):
        tokenize(long_text)
    arr = tokenize(long_text, truncate=True)
    assert arr.shape == (1, CONTEXT_LENGTH)
    assert arr[0, -1] == 49407


def test_all_cs_prompts_fit_context():
    from aihab_clip_tpu.templates import gen_prompts

    for use_h in (False, True):
        for use_d in (False, True):
            prompts, _ = gen_prompts(use_hierarchy=use_h, use_descriptive=use_d)
            arr = tokenize(prompts)  # must not raise
            assert arr.shape[1] == CONTEXT_LENGTH
