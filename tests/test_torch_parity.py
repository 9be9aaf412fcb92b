"""Offline numerics parity vs the actual torch/transformers implementations.

The reference conditions on `transformers.CLIPTextModel` hidden states
(/root/reference/models/controllable_pipeline_text_to_video_synth.py:24-30)
and aligns phrases via `transformers.CLIPTokenizer`
(/root/reference/utils/guidance.py:18-39). Both libraries are installed in
this environment, so conversion fidelity for these components is directly
falsifiable without any checkpoint download:

* build a tiny *random* HF model, convert its state dict with
  models/convert.py, and compare activations end-to-end;
* run `transformers.CLIPTokenizer` on a synthesized vocab.json/merges.txt and
  require identical token ids from our from-scratch BPE.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from lvd_tpu.config import CLIPTextConfig  # noqa: E402
from lvd_tpu.models import convert  # noqa: E402
from lvd_tpu.models.clip import apply_clip_text  # noqa: E402
from lvd_tpu.text.tokenizer import ClipBpeTokenizer  # noqa: E402


# ---------------------------------------------------------------------------
# CLIP text encoder activation parity
# ---------------------------------------------------------------------------


def _tiny_hf_clip(hidden_act: str, seed: int = 0):
    cfg = transformers.CLIPTextConfig(
        vocab_size=1000,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=77,
        hidden_act=hidden_act,
        bos_token_id=998,
        eos_token_id=999,
    )
    torch.manual_seed(seed)
    model = transformers.CLIPTextModel(cfg).eval()
    return cfg, model


def _ids_with_eos(rng, batch, length, eos):
    """Random token ids, eos-terminated at varying positions then eos-padded
    (the pipeline's encode_padded convention)."""
    ids = rng.integers(1, 900, size=(batch, length)).astype(np.int64)
    for b in range(batch):
        stop = rng.integers(3, length - 1)
        ids[b, stop:] = eos
    return ids


@pytest.mark.parametrize("hidden_act", ["gelu", "quick_gelu"])
def test_clip_text_activation_parity(hidden_act):
    hf_cfg, model = _tiny_hf_clip(hidden_act)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    ours_cfg = CLIPTextConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        hidden_act=hidden_act,
    )
    import jax

    params = jax.tree_util.tree_map(jnp.asarray, convert.convert_clip_text(sd, ours_cfg))

    ids = _ids_with_eos(np.random.default_rng(0), 4, 77, hf_cfg.eos_token_id)
    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids))

    got = apply_clip_text(
        params, ours_cfg, jnp.asarray(ids.astype(np.int32)),
        eos_token_id=hf_cfg.eos_token_id,
    )

    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]),
        want.last_hidden_state.numpy(),
        atol=2e-5,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["pooler_output"]),
        want.pooler_output.numpy(),
        atol=2e-5,
        rtol=1e-4,
    )


def test_clip_text_with_projection_parity():
    """CLIPTextModelWithProjection (SDXL text encoders): text_embeds parity."""
    cfg = transformers.CLIPTextConfig(
        vocab_size=1000,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=77,
        hidden_act="gelu",
        projection_dim=48,
        bos_token_id=998,
        eos_token_id=999,
    )
    torch.manual_seed(1)
    model = transformers.CLIPTextModelWithProjection(cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    ours_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, hidden_act="gelu",
        projection_dim=48,
    )
    params = convert.convert_clip_text(sd, ours_cfg)
    assert "text_projection" in params

    ids = _ids_with_eos(np.random.default_rng(1), 3, 77, cfg.eos_token_id)
    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids))
    got = apply_clip_text(
        params, ours_cfg, jnp.asarray(ids.astype(np.int32)), eos_token_id=999
    )
    np.testing.assert_allclose(
        np.asarray(got["text_embeds"]), want.text_embeds.numpy(),
        atol=2e-5, rtol=1e-4,
    )


def test_clip_real_config_key_manifest():
    """The consumed-key set of convert_clip_text on the *real* OpenCLIP-ViT-H
    text-tower config must equal the transformers state-dict key set — a
    static guard against converter naming drift, runnable with zero weights
    (meta-device instantiation)."""
    cfg = transformers.CLIPTextConfig(
        vocab_size=49408, hidden_size=1024, intermediate_size=4096,
        num_hidden_layers=23, num_attention_heads=16,
        max_position_embeddings=77, hidden_act="gelu",
    )
    with torch.device("meta"):
        model = transformers.CLIPTextModel(cfg)
    expected = {
        k for k in model.state_dict().keys() if not k.endswith("position_ids")
    }

    class Recording(dict):
        def __init__(self, data):
            super().__init__(data)
            self.used = set()

        def __getitem__(self, k):
            self.used.add(k)
            return super().__getitem__(k)

    # ndim-faithful dummies: the converter only reshapes/transposes.
    sd = Recording(
        {k: np.zeros((1,) * model.state_dict()[k].dim(), np.float32)
         for k in expected}
    )
    params = convert.convert_clip_text(sd, CLIPTextConfig())
    assert len(params["layers"]) == 23
    missing = expected - sd.used
    extra = sd.used - expected
    assert not missing and not extra, (sorted(missing)[:5], sorted(extra)[:5])


# ---------------------------------------------------------------------------
# Tokenizer parity
# ---------------------------------------------------------------------------


def _micro_bpe(tmp_path):
    """A miniature but real CLIP-style BPE vocabulary + merge table."""
    vocab = {}

    def add(tok):
        if tok not in vocab:
            vocab[tok] = len(vocab)

    for c in "abcdefghijklmnopqrstuvwxyz0123456789.,!?'-":
        add(c)
        add(c + "</w>")
    merges = [
        ("t", "h"),
        ("th", "e</w>"),
        ("c", "a"),
        ("ca", "t</w>"),
        ("d", "o"),
        ("do", "g</w>"),
        ("ca", "t"),          # non-terminal merge: "cats" -> cat + s</w>
        ("i", "n"),
        ("in", "g</w>"),      # suffix merge shared across words
        ("w", "a"),
        ("wa", "l"),
        ("wal", "k"),
    ]
    for a, b in merges:
        add(a + b)
    add("<|startoftext|>")
    add("<|endoftext|>")

    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(json.dumps(vocab))
    merges_file.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"
    )
    return str(vocab_file), str(merges_file)


def test_clip_bpe_tokenizer_matches_transformers(tmp_path):
    vocab_file, merges_file = _micro_bpe(tmp_path)
    hf = transformers.CLIPTokenizer(vocab_file, merges_file)
    ours = ClipBpeTokenizer.from_files(vocab_file, merges_file)

    assert ours.bos_token_id == hf.bos_token_id
    assert ours.eos_token_id == hf.eos_token_id

    texts = [
        "the cat",
        "a dog walks in the fog",
        "The CAT, the dog!",          # case folding + punctuation
        "cats and dogs walking",      # multi-merge words, shared suffixes
        "singing 42 songs.",          # digits tokenize one at a time
        "  padded   whitespace \n",   # whitespace cleanup
        "it's the dog's ball",        # contraction pattern 's
        "edge-case, hy-phen!",
        "",
    ]
    for text in texts:
        want = hf(text)["input_ids"]
        got = ours.encode(text)
        assert got == want, (text, got, want)

    # Padded form: eos-padding to 77 (the pipeline's encode_padded).
    padded = ours.encode_padded("the cat")
    assert len(padded) == 77
    assert padded[: len(ours.encode("the cat"))] == ours.encode("the cat")
    assert set(padded[len(ours.encode("the cat")) :]) == {ours.eos_token_id}

    # Truncation parity at model_max_length.
    long_text = " ".join(["walking cats"] * 100)
    want = hf(long_text, truncation=True, max_length=77)["input_ids"]
    got = ours.encode(long_text)
    assert got == want
