"""HF checkpoint loading: synthesized same-schema checkpoints, verified by
activation parity against the torch reference implementations (torch-cpu +
transformers are available offline; real hub downloads are not)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from multimodal_llm_pretraining_tpu.models.clip import CLIPVisionEncoder, quick_gelu
from multimodal_llm_pretraining_tpu.models.llama import LlamaDecoder
from multimodal_llm_pretraining_tpu.models.weights import (
    load_clip_vision,
    load_llama,
    load_vilt_encoder,
    llava_params_from_pretrained,
    overlay,
    resize_embeddings,
)

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def tiny_llama_dir(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        rope_theta=500000.0,
        rms_norm_eps=1e-5,
        max_position_embeddings=4096,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 32.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        },
        tie_word_embeddings=True,
        attention_bias=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_llama")
    model.save_pretrained(d)
    return str(d), model


@pytest.fixture(scope="module")
def tiny_clip_dir(tmp_path_factory):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    cfg = CLIPVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=28,
        patch_size=14,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(1)
    model = CLIPVisionModel(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_clip")
    model.save_pretrained(d)
    return str(d), model


def test_llama_activation_parity(tiny_llama_dir):
    """Loaded+fused+stacked weights reproduce HF LlamaModel activations
    (embedding lookup -> decoder trunk -> final norm)."""
    d, hf = tiny_llama_dir
    decoder_params, embed, kwargs = load_llama(d)
    dec = LlamaDecoder(**kwargs)

    ids = RNG.integers(0, 256, size=(2, 10))
    embeds = jnp.take(jnp.asarray(embed), jnp.asarray(ids), axis=0)
    ours = dec.apply({"params": decoder_params}, embeds)

    with torch.no_grad():
        theirs = hf.model(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-5)


def test_clip_activation_parity(tiny_clip_dir):
    """feature_layer=-2 output matches HF hidden_states[-2] (the LLaVA
    vision feature tap, before the final block and post-LN)."""
    d, hf = tiny_clip_dir
    params, kw = load_clip_vision(d, feature_layer=-2)
    enc = CLIPVisionEncoder(**kw, activation=quick_gelu, feature_layer=-2)

    pix = RNG.normal(size=(2, 28, 28, 3)).astype(np.float32)
    ours = enc.apply({"params": params}, jnp.asarray(pix))

    with torch.no_grad():
        theirs = hf(pixel_values=torch.tensor(pix.transpose(0, 3, 1, 2)), output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(ours), theirs.hidden_states[-2].numpy(), rtol=2e-4, atol=2e-5)


def test_llava_assembly_from_pretrained(tiny_clip_dir, tiny_llama_dir):
    """Full assembly: random-init LLaVA tree overlaid with pretrained tower +
    LM; projector keeps its fresh init; the <image> embedding row is the
    vocabulary mean (HF mean_resizing); the assembled model runs."""
    from multimodal_llm_pretraining_tpu.models.llava import LlavaModule
    from multimodal_llm_pretraining_tpu.models.weights import clip_module_kwargs, llama_module_kwargs, read_config

    clip_dir, _ = tiny_clip_dir
    llama_dir, hf_llama = tiny_llama_dir
    tower_kw = clip_module_kwargs(read_config(clip_dir))
    lm_kw = llama_module_kwargs(read_config(llama_dir))

    module = LlavaModule(tower_kwargs=tower_kw, lm_kwargs=lm_kw, vocab_with_image=257, image_token=256)
    ids = jnp.array([[1, 256, 2, 3, 4, 5]], jnp.int32)
    pix = jnp.zeros((1, 28, 28, 3), jnp.float32)
    init = module.init(jax.random.key(0), ids, pix)["params"]

    params = llava_params_from_pretrained(clip_dir, llama_dir, init)

    hf_embed = hf_llama.model.embed_tokens.weight.detach().numpy()
    got_embed = np.asarray(params["language_model_embed_tokens"])
    np.testing.assert_allclose(got_embed[:256], hf_embed, rtol=1e-6)
    np.testing.assert_allclose(got_embed[256], hf_embed.mean(axis=0), rtol=1e-4)

    # projector untouched by the overlay (fresh init trains from scratch)
    np.testing.assert_array_equal(
        np.asarray(params["projector_in"]["kernel"]), np.asarray(init["projector_in"]["kernel"])
    )

    labels = jnp.array([[-100, -100, 2, 3, 4, 5]], jnp.int32)
    loss = module.apply({"params": params}, ids, pix, labels=labels)
    assert np.isfinite(float(loss))


def test_vilt_encoder_graft(tmp_path):
    """dandelin-schema encoder layers stack onto the vilt-original trunk
    (the reference grafts exactly the encoder, vilt_original.py:238)."""
    from transformers import ViltConfig, ViltModel

    from multimodal_llm_pretraining_tpu.models.vilt import ViltEncoderModule

    cfg = ViltConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
        image_size=28, patch_size=14, vocab_size=100, max_position_embeddings=40,
    )
    torch.manual_seed(2)
    hf = ViltModel(cfg).eval()
    hf.save_pretrained(tmp_path)

    loaded = load_vilt_encoder(str(tmp_path))

    module = ViltEncoderModule(
        hidden=64, num_layers=2, num_heads=4, intermediate=128, patch=14,
        image_size=28, vocab_size=100, token_embed_dim=64, max_position=40,
    )
    ids = jnp.ones((1, 6), jnp.int32)
    tt = jnp.zeros((1, 6), jnp.int32)
    pix = jnp.zeros((1, 28, 28, 3), jnp.float32)
    init = module.init(jax.random.key(0), ids, tt, pix)["params"]
    grafted = overlay(dict(init), loaded)

    # one encoder block, numerically vs the HF ViltLayer on the same input
    x = RNG.normal(size=(1, 5, 64)).astype(np.float32)
    from multimodal_llm_pretraining_tpu.models.clip import CLIPBlock
    import flax.linen as nn

    block = CLIPBlock(hidden=64, num_heads=4, intermediate=128, activation=nn.gelu, ln_eps=1e-12)
    block_params = jax.tree.map(lambda l: l[0], grafted["layers"])
    ours, _ = block.apply({"params": block_params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = hf.encoder.layer[0](torch.tensor(x))[0].numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-5)


def test_overlay_rejects_shape_mismatch():
    base = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(4)}}
    ok = overlay(base, {"b": {"c": np.ones(4)}})
    np.testing.assert_array_equal(ok["b"]["c"], np.ones(4))
    with pytest.raises(ValueError, match="shape mismatch"):
        overlay(base, {"a": np.zeros((3, 2))})


def test_resize_embeddings_mean_rows():
    e = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = np.asarray(resize_embeddings(jnp.asarray(e), 6))
    assert out.shape == (6, 3)
    np.testing.assert_allclose(out[4], e.mean(axis=0))
    np.testing.assert_allclose(out[5], e.mean(axis=0))


def test_llama_sharded_index_layout(tiny_llama_dir, tmp_path):
    """Real multi-shard save_pretrained layout (model.safetensors.index.json
    + model-0000x-of-0000y.safetensors): the reader must follow the index
    and reproduce exactly the tensors of the single-file save."""
    import json
    import os

    _, hf = tiny_llama_dir
    d = tmp_path / "sharded"
    hf.save_pretrained(d, max_shard_size="50KB")
    index = d / "model.safetensors.index.json"
    assert index.exists(), "fixture must actually shard (raise max_shard_size?)"
    shards = {f for f in os.listdir(d) if f.endswith(".safetensors")}
    assert len(shards) > 1
    with open(index) as f:
        weight_map = json.load(f)["weight_map"]
    assert set(weight_map.values()) == shards

    sharded_params, sharded_embed, kw1 = load_llama(str(d))
    whole_params, whole_embed, kw2 = load_llama(tiny_llama_dir[0])
    assert kw1 == kw2
    np.testing.assert_array_equal(np.asarray(sharded_embed), np.asarray(whole_embed))
    flat1 = jax.tree_util.tree_leaves_with_path(sharded_params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(whole_params))
    assert {p for p, _ in flat1} == set(flat2)
    for path, leaf in flat1:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat2[path]))
