"""Pretrained HF checkpoint loading (safetensors -> flax param trees).

The reference assembles LLaVA from pretrained checkpoints -- the
CLIP-ViT-L/14-336 tower + Llama-3.2-1B LM (``/root/reference/src/models/
llava.py:30-45``) -- and ViLT-original reuses the pretrained
``dandelin/vilt-b32-mlm`` encoder (``vilt_original.py``). This module maps
those checkpoints (any local directory in HF ``save_pretrained`` layout:
``config.json`` + ``*.safetensors`` [+ index]) onto the flax modules here.

Two structural transforms happen in the mapping, both consequences of the
TPU-first module design:

- **fusion**: separate q/k/v (and gate/up) projections concatenate into the
  single fused matmuls the modules use (one big MXU-friendly GEMM);
- **stacking**: per-layer tensors stack along a leading layer axis, because
  layer stacks are ``nn.scan`` loops (one compiled block, not N).

torch weights store Linear as [out, in]; flax Dense kernels are [in, out],
so every projection transposes.
"""

import json
import os
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..utils import get_logger

logger = get_logger()


# --------------------------------------------------------------------- io


def read_config(directory: str) -> dict:
    with open(os.path.join(directory, "config.json")) as f:
        return json.load(f)


def load_safetensors_dir(directory: str) -> dict[str, jnp.ndarray]:
    """All tensors from a save_pretrained directory (sharded or not)."""
    from safetensors import safe_open

    index_path = os.path.join(directory, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
    else:
        shards = sorted(n for n in os.listdir(directory) if n.endswith(".safetensors"))
    if not shards:
        raise FileNotFoundError(f"no .safetensors files under {directory}")

    tensors: dict[str, jnp.ndarray] = {}
    for shard in shards:
        with safe_open(os.path.join(directory, shard), framework="flax") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    return tensors


def _t(w) -> jnp.ndarray:
    """torch Linear [out, in] -> flax Dense kernel [in, out]."""
    return jnp.transpose(w)


def _stack(per_layer: list) -> jnp.ndarray:
    return jnp.stack(per_layer, axis=0)


# ------------------------------------------------------------------- llama


def llama_params_from_tensors(t: dict[str, jnp.ndarray], config: dict) -> tuple[dict, jnp.ndarray]:
    """(LlamaDecoder params, embed_tokens [V, H]) from an HF LlamaForCausalLM
    state dict. Fuses q/k/v -> qkv and gate/up -> gate_up, stacks layers."""
    n_layers = config["num_hidden_layers"]
    pfx = "model."

    qkv, out, gate_up, down, ln_a, ln_m = [], [], [], [], [], []
    for i in range(n_layers):
        lp = f"{pfx}layers.{i}."
        qkv.append(_t(jnp.concatenate(
            [t[lp + "self_attn.q_proj.weight"], t[lp + "self_attn.k_proj.weight"], t[lp + "self_attn.v_proj.weight"]],
            axis=0,
        )))
        out.append(_t(t[lp + "self_attn.o_proj.weight"]))
        gate_up.append(_t(jnp.concatenate([t[lp + "mlp.gate_proj.weight"], t[lp + "mlp.up_proj.weight"]], axis=0)))
        down.append(_t(t[lp + "mlp.down_proj.weight"]))
        ln_a.append(t[lp + "input_layernorm.weight"])
        ln_m.append(t[lp + "post_attention_layernorm.weight"])

    decoder = {
        "layers": {
            "attn": {"qkv": {"kernel": _stack(qkv)}, "out": {"kernel": _stack(out)}},
            "mlp": {"gate_up": {"kernel": _stack(gate_up)}, "down": {"kernel": _stack(down)}},
            "ln_attn": {"scale": _stack(ln_a)},
            "ln_mlp": {"scale": _stack(ln_m)},
        },
        "final_norm": {"scale": t[pfx + "norm.weight"]},
    }
    return decoder, t[pfx + "embed_tokens.weight"]


def llama_module_kwargs(config: dict) -> dict[str, Any]:
    """LlamaDecoder fields from an HF config.json."""
    rope_scaling = config.get("rope_scaling") or {}
    return dict(
        hidden=config["hidden_size"],
        num_layers=config["num_hidden_layers"],
        num_heads=config["num_attention_heads"],
        num_kv_heads=config.get("num_key_value_heads", config["num_attention_heads"]),
        ffn=config["intermediate_size"],
        rope_theta=config.get("rope_theta", 10000.0),
        rope_scaling_factor=rope_scaling.get("factor") if rope_scaling.get("rope_type") == "llama3" else None,
        rms_eps=config.get("rms_norm_eps", 1e-5),
    )


def load_llama(directory: str) -> tuple[dict, jnp.ndarray, dict]:
    """(decoder params, embed_tokens, module kwargs) from a local HF dir."""
    config = read_config(directory)
    tensors = load_safetensors_dir(directory)
    decoder, embed = llama_params_from_tensors(tensors, config)
    logger.info(f"loaded llama weights from {directory}: {config['num_hidden_layers']} layers, hidden {config['hidden_size']}")
    return decoder, embed, llama_module_kwargs(config)


# -------------------------------------------------------------------- clip


def clip_vision_params_from_tensors(t: dict[str, jnp.ndarray], config: dict, num_stacked_layers: int | None = None) -> dict:
    """CLIPVisionEncoder params from an HF CLIPVisionModel state dict.

    ``num_stacked_layers`` < depth drops trailing blocks (LLaVA's
    vision_feature_layer=-2 never evaluates the final block, so its weights
    need not load).
    """
    pfx = "vision_model."
    if not any(k.startswith(pfx) for k in t):
        pfx = ""  # bare CLIPVisionModel save
    n_layers = num_stacked_layers if num_stacked_layers is not None else config["num_hidden_layers"]
    patch = config["patch_size"]
    hidden = config["hidden_size"]

    conv = t[pfx + "embeddings.patch_embedding.weight"]  # [H, C, p, p]
    # dense kernel index order must match the module's patch flattening
    # (ph, pw, channel): conv [H, C, ph, pw] -> [ph, pw, C, H] -> [p*p*C, H]
    patch_kernel = jnp.transpose(conv, (2, 3, 1, 0)).reshape(patch * patch * conv.shape[1], hidden)

    def ln(name):
        return {"scale": t[pfx + name + ".weight"], "bias": t[pfx + name + ".bias"]}

    qkv_k, qkv_b, out_k, out_b = [], [], [], []
    up_k, up_b, down_k, down_b = [], [], [], []
    ln1_s, ln1_b, ln2_s, ln2_b = [], [], [], []
    for i in range(n_layers):
        lp = f"{pfx}encoder.layers.{i}."
        qkv_k.append(_t(jnp.concatenate(
            [t[lp + "self_attn.q_proj.weight"], t[lp + "self_attn.k_proj.weight"], t[lp + "self_attn.v_proj.weight"]],
            axis=0,
        )))
        qkv_b.append(jnp.concatenate(
            [t[lp + "self_attn.q_proj.bias"], t[lp + "self_attn.k_proj.bias"], t[lp + "self_attn.v_proj.bias"]], axis=0
        ))
        out_k.append(_t(t[lp + "self_attn.out_proj.weight"]))
        out_b.append(t[lp + "self_attn.out_proj.bias"])
        up_k.append(_t(t[lp + "mlp.fc1.weight"]))
        up_b.append(t[lp + "mlp.fc1.bias"])
        down_k.append(_t(t[lp + "mlp.fc2.weight"]))
        down_b.append(t[lp + "mlp.fc2.bias"])
        ln1_s.append(t[lp + "layer_norm1.weight"])
        ln1_b.append(t[lp + "layer_norm1.bias"])
        ln2_s.append(t[lp + "layer_norm2.weight"])
        ln2_b.append(t[lp + "layer_norm2.bias"])

    return {
        "patch_embed": {"kernel": patch_kernel},
        "class_embedding": t[pfx + "embeddings.class_embedding"].reshape(1, 1, hidden),
        "position_embeddings": t[pfx + "embeddings.position_embedding.weight"][None],
        # HF ships this misspelling in CLIPVisionTransformer
        "pre_ln": ln("pre_layrnorm"),
        "layers": {
            "attn": {
                "qkv": {"kernel": _stack(qkv_k), "bias": _stack(qkv_b)},
                "out": {"kernel": _stack(out_k), "bias": _stack(out_b)},
            },
            "mlp": {
                "up": {"kernel": _stack(up_k), "bias": _stack(up_b)},
                "down": {"kernel": _stack(down_k), "bias": _stack(down_b)},
            },
            "ln_attn": {"scale": _stack(ln1_s), "bias": _stack(ln1_b)},
            "ln_mlp": {"scale": _stack(ln2_s), "bias": _stack(ln2_b)},
        },
    }


def clip_module_kwargs(config: dict) -> dict[str, Any]:
    return dict(
        hidden=config["hidden_size"],
        num_layers=config["num_hidden_layers"],
        num_heads=config["num_attention_heads"],
        intermediate=config["intermediate_size"],
        patch=config["patch_size"],
        image_size=config["image_size"],
    )


def load_clip_vision(directory: str, feature_layer: int = -1) -> tuple[dict, dict]:
    """(params, module kwargs) from a local HF CLIP dir. The config may be a
    full CLIPConfig (with vision_config) or a bare CLIPVisionConfig."""
    config = read_config(directory)
    config = config.get("vision_config", config)
    n = config["num_hidden_layers"] + 1 + feature_layer if feature_layer < -1 else config["num_hidden_layers"]
    tensors = load_safetensors_dir(directory)
    params = clip_vision_params_from_tensors(tensors, config, num_stacked_layers=n)
    logger.info(f"loaded CLIP vision weights from {directory}: {n}/{config['num_hidden_layers']} layers stacked")
    return params, clip_module_kwargs(config)


# ------------------------------------------------------------------- llava


def resize_embeddings(embed: jnp.ndarray, new_rows: int) -> jnp.ndarray:
    """HF resize_token_embeddings with mean_resizing: added rows start at the
    mean of the existing embedding distribution."""
    if new_rows <= embed.shape[0]:
        return embed[:new_rows]
    mean = jnp.mean(embed.astype(jnp.float32), axis=0, keepdims=True).astype(embed.dtype)
    extra = jnp.broadcast_to(mean, (new_rows - embed.shape[0], embed.shape[1]))
    return jnp.concatenate([embed, extra], axis=0)


def llava_params_from_pretrained(clip_dir: str, llama_dir: str, init_params: dict) -> dict:
    """Overlay pretrained tower + LM weights onto a freshly initialized
    LlavaModule param tree (the projector keeps its random init, exactly the
    reference's LlavaForConditionalGeneration assembly,
    ``src/models/llava.py:30-45``)."""
    clip_params, _ = load_clip_vision(clip_dir, feature_layer=-2)
    decoder, embed, _ = load_llama(llama_dir)
    vocab_with_image = init_params["language_model_embed_tokens"].shape[0]
    loaded = {
        "vision_tower": clip_params,
        "language_model": decoder,
        "language_model_embed_tokens": resize_embeddings(embed, vocab_with_image).astype(
            init_params["language_model_embed_tokens"].dtype
        ),
    }
    return overlay(init_params, loaded)


# -------------------------------------------------------------------- vilt


def vilt_encoder_params_from_tensors(t: dict[str, jnp.ndarray], config: dict) -> dict:
    """Encoder-stack params of ``dandelin/vilt-b32-mlm`` for the
    ``vilt-original`` trunk. Scope matches the reference exactly: it grafts
    ONLY the pretrained encoder (``model.vilt.encoder = HFViltModel.
    from_pretrained(...).encoder``, ``src/models/vilt_original.py:238``);
    embeddings, pooler, final LN, and heads stay freshly initialized."""
    n_layers = config["num_hidden_layers"]
    pfx = "vilt."
    if not any(k.startswith(pfx) for k in t):
        pfx = ""  # bare ViltModel save

    qkv_k, qkv_b, out_k, out_b = [], [], [], []
    up_k, up_b, down_k, down_b = [], [], [], []
    ln1_s, ln1_b, ln2_s, ln2_b = [], [], [], []
    for i in range(n_layers):
        lp = f"{pfx}encoder.layer.{i}."
        qkv_k.append(_t(jnp.concatenate(
            [
                t[lp + "attention.attention.query.weight"],
                t[lp + "attention.attention.key.weight"],
                t[lp + "attention.attention.value.weight"],
            ],
            axis=0,
        )))
        qkv_b.append(jnp.concatenate(
            [
                t[lp + "attention.attention.query.bias"],
                t[lp + "attention.attention.key.bias"],
                t[lp + "attention.attention.value.bias"],
            ],
            axis=0,
        ))
        out_k.append(_t(t[lp + "attention.output.dense.weight"]))
        out_b.append(t[lp + "attention.output.dense.bias"])
        up_k.append(_t(t[lp + "intermediate.dense.weight"]))
        up_b.append(t[lp + "intermediate.dense.bias"])
        down_k.append(_t(t[lp + "output.dense.weight"]))
        down_b.append(t[lp + "output.dense.bias"])
        ln1_s.append(t[lp + "layernorm_before.weight"])
        ln1_b.append(t[lp + "layernorm_before.bias"])
        ln2_s.append(t[lp + "layernorm_after.weight"])
        ln2_b.append(t[lp + "layernorm_after.bias"])

    return {
        "layers": {
            "attn": {
                "qkv": {"kernel": _stack(qkv_k), "bias": _stack(qkv_b)},
                "out": {"kernel": _stack(out_k), "bias": _stack(out_b)},
            },
            "mlp": {
                "up": {"kernel": _stack(up_k), "bias": _stack(up_b)},
                "down": {"kernel": _stack(down_k), "bias": _stack(down_b)},
            },
            "ln_attn": {"scale": _stack(ln1_s), "bias": _stack(ln1_b)},
            "ln_mlp": {"scale": _stack(ln2_s), "bias": _stack(ln2_b)},
        },
    }


def load_vilt_encoder(directory: str) -> dict:
    """``{"layers": ...}`` subtree for ``ViltEncoderModule`` from a local
    dandelin/vilt-b32-mlm save_pretrained dir."""
    config = read_config(directory)
    tensors = load_safetensors_dir(directory)
    params = vilt_encoder_params_from_tensors(tensors, config)
    logger.info(f"loaded ViLT encoder weights from {directory}: {config['num_hidden_layers']} layers")
    return params


# ----------------------------------------------------------------- overlay


def overlay(base: dict, loaded: dict, path: str = "") -> dict:
    """Replace subtrees of ``base`` with ``loaded``, verifying every loaded
    leaf matches the initialized shape (catches mapping bugs loudly)."""
    out = dict(base)
    for k, v in loaded.items():
        if isinstance(v, dict):
            out[k] = overlay(base[k], v, f"{path}/{k}")
        else:
            expected = np.shape(base[k])
            if tuple(expected) != tuple(v.shape):
                raise ValueError(f"shape mismatch at {path}/{k}: checkpoint {v.shape} vs module {expected}")
            out[k] = v
    return out
