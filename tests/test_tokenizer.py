"""Golden-vector and behavior tests for the CLIP BPE tokenizer.

Golden ids are the publicly known OpenAI CLIP tokenizations (the reference
vendors the same tokenizer, modules/tokenization_clip.py)."""

import pytest

from hmmc_tpu.tokenization import ClipTokenizer


@pytest.fixture(scope="module")
def tok():
    return ClipTokenizer()


def test_vocab_size_and_special_ids(tok):
    assert tok.vocab_size == 49408
    assert tok.cls_token_id == 49406   # <|startoftext|>
    assert tok.pad_token_id == 49407   # <|endoftext|> doubles as pad
    assert tok.mask_token_id == 49394  # HMMC [MASK] slot
    assert tok.decoder[49394] == "[MASK]"


def test_golden_encoding(tok):
    # known CLIP tokenization of the canonical prompt
    assert tok.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]
    assert tok.encode("a photo of a dog") == [320, 1125, 539, 320, 1929]


def test_roundtrip(tok):
    for text in ["hello world", "a diagram", "the quick brown fox jumps"]:
        ids = tok.encode(text)
        assert tok.decode(ids).strip() == text


def test_normalization(tok):
    # whitespace collapse + lowercase + html unescape
    assert tok.encode("A  PHOTO\tof   a CAT") == tok.encode("a photo of a cat")
    assert tok.encode("cat &amp; dog") == tok.encode("cat & dog")


def test_special_tokens_pass_through(tok):
    ids = tok.convert_tokens_to_ids(
        ["<|startoftext|>"] + tok.tokenize("a cat") + ["<|endoftext|>"])
    assert ids[0] == 49406 and ids[-1] == 49407


def test_reference_padding_scheme(tok):
    # dataloader_msrvtt_retrieval.py:97-122 pads with id 0 after the real
    # tokens; argmax-based EOT pooling depends on eot being the max id
    ids = [tok.cls_token_id] + tok.encode("a cat") + [tok.sep_token_id]
    padded = ids + [0] * (32 - len(ids))
    assert max(padded) == tok.sep_token_id
    assert padded.index(max(padded)) == len(ids) - 1
