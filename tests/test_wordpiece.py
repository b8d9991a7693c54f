"""Native WordPiece tokenizer tests (Chinese tower path)."""

import pytest

from hmmc_tpu.data.text import encode_text
from hmmc_tpu.tokenization.wordpiece import WordPieceTokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "cat", "sat", "##s", "##ting", "si", "on", "mat",
         "猫", "坐", "在", "上", ",", "。", "a"]


@pytest.fixture()
def tok(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB))
    return WordPieceTokenizer(str(p))


def test_special_ids(tok):
    assert tok.pad_token_id == 0
    assert tok.cls_token_id == 2
    assert tok.sep_token_id == 3
    assert tok.mask_token_id == 4
    assert tok.vocab_size == len(VOCAB)


def test_basic_wordpiece(tok):
    assert tok.tokenize("the cat") == ["the", "cat"]
    # greedy longest-match: "cats" -> cat + ##s; "siting" -> si + ##ting
    assert tok.tokenize("cats siting") == ["cat", "##s", "si", "##ting"]
    # no valid continuation -> whole word becomes [UNK]
    assert tok.tokenize("sitting") == ["[UNK]"]
    # unknown word -> [UNK]
    assert tok.tokenize("zebra") == ["[UNK]"]


def test_cjk_chars_split(tok):
    # each CJK char is its own token (BERT chinese behavior)
    assert tok.tokenize("猫坐在上") == ["猫", "坐", "在", "上"]
    assert tok.tokenize("猫,坐。") == ["猫", ",", "坐", "。"]


def test_lowercase_and_accents(tok):
    assert tok.tokenize("The CAT") == ["the", "cat"]
    assert tok.tokenize("cät") == ["cat"]  # NFD accent strip


def test_encode_text_chinese_framing(tok):
    ids, mask = encode_text(tok, "猫坐在上", max_words=6,
                            language="chinese")
    # [CLS] 猫 坐 在 [SEP] + pad -> truncation keeps max_words-1 then SEP
    assert ids.tolist()[0] == tok.cls_token_id
    assert tok.sep_token_id in ids.tolist()
    assert len(ids) == 6 and mask.sum() == 6 or mask.sum() <= 6
    # padding is zero
    assert ids[mask == 0].sum() == 0


def test_matches_hf_bert_tokenizer_if_available(tok, tmp_path):
    transformers = pytest.importorskip("transformers")
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB))
    try:
        hf = transformers.BertTokenizer(str(vocab_file),
                                        do_lower_case=True)
    except Exception:
        pytest.skip("HF BertTokenizer unavailable offline")
    for text in ("the cat sat on mat", "cats siting", "猫坐在上,",
                 "The CÄT zebra 猫"):
        assert tok.tokenize(text) == hf.tokenize(text), text
