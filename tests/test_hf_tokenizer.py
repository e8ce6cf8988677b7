"""HF-tokenizer path of io/tokenizer.py, built fully offline via the
`tokenizers` library (the reference loads tokenizers with AutoTokenizer,
chat_finetuned.py:137)."""

import pytest

tokenizers = pytest.importorskip("tokenizers")
transformers = pytest.importorskip("transformers")

from ct_diffusionmodelbench_tpu.io.tokenizer import Tokenizer, resolve_mask_id

VOCAB = {"<pad>": 0, "<unk>": 1, "</s>": 2, "<|mask|>": 3,
         "theorem": 4, "n": 5, "+": 6, "0": 7, "=": 8, "by": 9, "simp": 10}


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    from tokenizers import Tokenizer as RawTok
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    raw = RawTok(WordLevel(VOCAB, unk_token="<unk>"))
    raw.pre_tokenizer = Whitespace()
    tok = transformers.PreTrainedTokenizerFast(
        tokenizer_object=raw, unk_token="<unk>", pad_token="<pad>",
        eos_token="</s>", mask_token="<|mask|>")
    tok.chat_template = (
        "{% for m in messages %}<{{ m.role }}>{{ m.content }}"
        "{% endfor %}{% if add_generation_prompt %}<assistant>{% endif %}")
    out = tmp_path_factory.mktemp("hf_tok")
    tok.save_pretrained(str(out))
    return out


def test_hf_roundtrip(hf_dir):
    tok = Tokenizer.from_pretrained(hf_dir)
    assert tok.kind == "hf"
    ids = tok.encode("theorem n + 0 = n by simp")
    assert tok.decode(ids) == "theorem n + 0 = n by simp"
    assert tok.eos_token_id == 2 and tok.pad_token_id == 0


def test_hf_chat_template_used(hf_dir):
    tok = Tokenizer.from_pretrained(hf_dir)
    prompt = tok.apply_chat_template(
        [{"role": "system", "content": "s"}, {"role": "user", "content": "u"}])
    assert prompt == "<system>s<user>u<assistant>"


def test_mask_id_from_hf_tokenizer(hf_dir):
    tok = Tokenizer.from_pretrained(hf_dir)
    assert resolve_mask_id(tokenizer=tok) == 3
    # config id wins over tokenizer attribute
    assert resolve_mask_id(config_mask_id=77, tokenizer=tok) == 77


def test_save_pretrained_roundtrip(hf_dir, tmp_path):
    tok = Tokenizer.from_pretrained(hf_dir)
    tok.save_pretrained(tmp_path / "resaved")
    tok2 = Tokenizer.from_pretrained(tmp_path / "resaved")
    assert tok2.encode("theorem by") == tok.encode("theorem by")
