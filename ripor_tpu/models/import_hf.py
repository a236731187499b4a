"""HF T5 checkpoint import — load pretrained t5-base/large weights into the
from-scratch flax model.

The reference fine-tunes HF ``t5-base`` (modeling/t5_generative_retriever.py:70,
from_pretrained at :521); matching that recipe requires loading converted T5
weights. This module maps an HF T5 state dict (torch tensors or numpy) onto
the ripor_tpu parameter tree. The codebook head has no HF counterpart
(initialized from RQ instead; reference's embedding surgery) and the HF
lm_head is dropped.

Covers encoder+decoder stacks of T5 v1.0/v1.1 (gated FFN handled).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor / array -> numpy, transposing torch Linear weights
    ([out, in]) into flax kernels ([in, out])."""
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                     np.float32)
    return arr


def hf_t5_to_params(state: Mapping[str, "np.ndarray"], params: Dict) -> Dict:
    """Fill a ripor_tpu params pytree from an HF T5 state dict.

    ``params`` is a template (e.g. from init) whose shapes are verified.
    Returns a new params dict; codebooks/start_embed are left untouched.
    """
    out = {k: dict(v) if isinstance(v, dict) else v for k, v in params.items()}

    def put(dst_path, value, transpose=False):
        v = _t(value)
        if transpose:
            v = v.T
        node = out
        *parents, leaf = dst_path.split("/")
        for p in parents:
            node[p] = dict(node[p]) if not isinstance(node[p], dict) else node[p]
            node = node[p]
        assert node[leaf].shape == v.shape, (dst_path, node[leaf].shape, v.shape)
        node[leaf] = v.astype(np.asarray(node[leaf]).dtype)

    put("shared/embedding", state["shared.weight"])

    def stack(side: str, n_layers: int):
        is_enc = side == "encoder"
        for i in range(n_layers):
            hf = f"{side}.block.{i}.layer"
            fx = f"{side}/layer_{i}"
            # self-attention (layer.0)
            for m in ("q", "k", "v", "o"):
                put(f"{fx}/{'attn' if is_enc else 'self_attn'}/{m}/kernel",
                    state[f"{hf}.0.SelfAttention.{m}.weight"], transpose=True)
            put(f"{fx}/{'attn_norm' if is_enc else 'self_attn_norm'}/scale",
                state[f"{hf}.0.layer_norm.weight"])
            li = 1
            if not is_enc:
                # cross-attention (layer.1)
                for m in ("q", "k", "v", "o"):
                    put(f"{fx}/cross_attn/{m}/kernel",
                        state[f"{hf}.1.EncDecAttention.{m}.weight"], transpose=True)
                put(f"{fx}/cross_attn_norm/scale",
                    state[f"{hf}.1.layer_norm.weight"])
                li = 2
            # FFN
            ff = f"{hf}.{li}.DenseReluDense"
            if f"{ff}.wi.weight" in state:
                put(f"{fx}/ffn/wi/kernel", state[f"{ff}.wi.weight"], transpose=True)
            else:  # v1.1 gated
                put(f"{fx}/ffn/wi_0/kernel", state[f"{ff}.wi_0.weight"], transpose=True)
                put(f"{fx}/ffn/wi_1/kernel", state[f"{ff}.wi_1.weight"], transpose=True)
            put(f"{fx}/ffn/wo/kernel", state[f"{ff}.wo.weight"], transpose=True)
            put(f"{fx}/ffn_norm/scale", state[f"{hf}.{li}.layer_norm.weight"])
        put(f"{side}/rel_bias/rel_embedding",
            state[f"{side}.block.0.layer.0.SelfAttention"
                  f".relative_attention_bias.weight"])
        put(f"{side}/final_norm/scale", state[f"{side}.final_layer_norm.weight"])

    n_enc = max(int(k.split(".")[2]) for k in state
                if k.startswith("encoder.block.")) + 1
    n_dec = max(int(k.split(".")[2]) for k in state
                if k.startswith("decoder.block.")) + 1
    stack("encoder", n_enc)
    stack("decoder", n_dec)
    return out


def hf_bert_to_params(state: Mapping[str, "np.ndarray"], params: Dict) -> Dict:
    """Fill BertCrossEncoder / BertDenseEncoder params from an HF BERT-class
    state dict (BertForSequenceClassification for the MiniLM teacher the
    reference loads at modeling/cross_encoder.py:12, or a bare BertModel
    for the DenseEncoder baseline, modeling/dense_encoder.py:8).

    Accepts keys with or without the ``bert.`` prefix; pooler/classifier are
    filled only when present in both the state dict and the target tree."""
    out = {k: dict(v) if isinstance(v, dict) else v for k, v in params.items()}
    prefix = "bert." if any(k.startswith("bert.") for k in state) else ""

    def get(key: str):
        return state[prefix + key] if prefix + key in state else state[key]

    def has(key: str) -> bool:
        return prefix + key in state or key in state

    def put(dst_path, value, transpose=False):
        v = _t(value)
        if transpose:
            v = v.T
        node = out
        *parents, leaf = dst_path.split("/")
        for p in parents:
            node[p] = dict(node[p]) if not isinstance(node[p], dict) else node[p]
            node = node[p]
        assert node[leaf].shape == v.shape, (dst_path, node[leaf].shape, v.shape)
        node[leaf] = v.astype(np.asarray(node[leaf]).dtype)

    emb = "embeddings"
    put("bert/word/embedding", get(f"{emb}.word_embeddings.weight"))
    put("bert/position/embedding", get(f"{emb}.position_embeddings.weight"))
    put("bert/type/embedding", get(f"{emb}.token_type_embeddings.weight"))
    put("bert/emb_norm/scale", get(f"{emb}.LayerNorm.weight"))
    put("bert/emb_norm/bias", get(f"{emb}.LayerNorm.bias"))

    n_layers = max(int(k.split("encoder.layer.")[1].split(".")[0])
                   for k in state if "encoder.layer." in k) + 1
    for i in range(n_layers):
        hf = f"encoder.layer.{i}"
        fx = f"bert/layer_{i}"
        for ours, theirs in (("q", "attention.self.query"),
                             ("k", "attention.self.key"),
                             ("v", "attention.self.value"),
                             ("o", "attention.output.dense")):
            put(f"{fx}/attn/{ours}/kernel", get(f"{hf}.{theirs}.weight"),
                transpose=True)
            put(f"{fx}/attn/{ours}/bias", get(f"{hf}.{theirs}.bias"))
        put(f"{fx}/attn_norm/scale", get(f"{hf}.attention.output.LayerNorm.weight"))
        put(f"{fx}/attn_norm/bias", get(f"{hf}.attention.output.LayerNorm.bias"))
        put(f"{fx}/ffn_wi/kernel", get(f"{hf}.intermediate.dense.weight"),
            transpose=True)
        put(f"{fx}/ffn_wi/bias", get(f"{hf}.intermediate.dense.bias"))
        put(f"{fx}/ffn_wo/kernel", get(f"{hf}.output.dense.weight"),
            transpose=True)
        put(f"{fx}/ffn_wo/bias", get(f"{hf}.output.dense.bias"))
        put(f"{fx}/ffn_norm/scale", get(f"{hf}.output.LayerNorm.weight"))
        put(f"{fx}/ffn_norm/bias", get(f"{hf}.output.LayerNorm.bias"))

    if "pooler" in out and has("pooler.dense.weight"):
        put("pooler/kernel", get("pooler.dense.weight"), transpose=True)
        put("pooler/bias", get("pooler.dense.bias"))
    if "classifier" in out and "classifier.weight" in state:
        put("classifier/kernel", state["classifier.weight"], transpose=True)
        put("classifier/bias", state["classifier.bias"])
    return out


def load_hf_t5_file(path: str) -> Dict[str, np.ndarray]:
    """Read an HF T5 checkpoint file (pytorch_model.bin or model.safetensors)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    return torch.load(path, map_location="cpu", weights_only=True)
