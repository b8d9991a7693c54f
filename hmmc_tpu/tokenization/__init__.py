from hmmc_tpu.tokenization.clip_bpe import ClipTokenizer

__all__ = ["ClipTokenizer", "get_tokenizer"]


def get_tokenizer(language: str, pretrained_text: str = "hfl/chinese-roberta-wwm-ext"):
    """Tokenizer factory mirroring the reference's selection logic
    (main_task_retrieval.py:535-540): CLIP BPE for English, HF BertTokenizer
    for Chinese."""
    if language == "english":
        return ClipTokenizer()
    if language == "chinese":
        from transformers import BertTokenizer  # host-side only

        return BertTokenizer.from_pretrained(pretrained_text)
    raise ValueError(f"unknown language {language!r}")
