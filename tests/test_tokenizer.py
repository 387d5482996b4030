"""Tokenizer tests: behaviour + golden parity vs the reference byte-BPE."""
import numpy as np
import pytest

from daclip_tpu.tokenizer import SimpleTokenizer, tokenize
from tests.conftest import requires_reference


def test_tokenize_shape_and_specials():
    out = tokenize(["a photo of a cat", "noisy with parameter 25"])
    assert out.shape == (2, 77)
    tk = SimpleTokenizer()
    assert out[0, 0] == tk.sot_token
    row = out[0]
    eot_pos = int(np.argmax(row))  # EOT is the highest id
    assert row[eot_pos] == tk.eot_token
    assert (row[eot_pos + 1:] == 0).all()


def test_truncation_keeps_eot():
    tk = SimpleTokenizer()
    out = tokenize("word " * 200, context_length=77)
    assert out.shape == (1, 77)
    assert out[0, -1] == tk.eot_token


def test_roundtrip_decode():
    tk = SimpleTokenizer()
    ids = tk.encode("hello world, a blurry image!")
    assert tk.decode(ids).strip() == "hello world , a blurry image !"


@requires_reference
def test_golden_vs_reference_tokenizer():
    import sys
    import types
    # the reference tokenizer imports ftfy at module import; alias the regex
    # module and stub ftfy with the same fallback cleaning we use
    if "ftfy" not in sys.modules:
        import html
        mod = types.ModuleType("ftfy")
        mod.fix_text = lambda t: t
        sys.modules["ftfy"] = mod
    from tests.parity.refload import load_ref_module
    ref = load_ref_module("universal-image-restoration/open_clip/tokenizer.py",
                          "ref_tokenizer")
    texts = [
        "a photo of a cat",
        "A bridge over the river| noisy with parameter 25.0",
        "motion-blurry image, low quality",
        "high quality jpeg",
        "it's 100% AMAZING!!! (really)",
        "",
    ]
    want = ref.tokenize(texts).numpy()
    got = tokenize(texts)
    np.testing.assert_array_equal(got, want)
