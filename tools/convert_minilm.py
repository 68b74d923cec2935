"""Convert HuggingFace all-MiniLM-L6-v2 weights to the FlaxMiniLM npz layout.

This environment is zero-egress so no pretrained weights exist locally; the
moment a checkpoint is available (safetensors or pytorch_model.bin), this
script maps HF BERT parameter names onto `models/minilm.py`'s module tree and
writes the npz that `FlaxMiniLMEmbedder.load_params` consumes:

    python tools/convert_minilm.py /path/to/model_dir out_params.npz

Mapping (HF BertModel -> MiniLMEncoder):
  embeddings.word_embeddings.weight        -> Embed_0.embedding
  embeddings.position_embeddings.weight    -> Embed_1.embedding
  embeddings.token_type_embeddings.weight  -> Embed_2.embedding
  embeddings.LayerNorm.{weight,bias}       -> LayerNorm_0.{scale,bias}
  encoder.layer.{i}.attention.self.{query,key,value}.{weight,bias}
      -> TransformerLayer_{i}.MultiHeadDotProductAttention_0.{query,key,value}
         .kernel [D, H, Dh] / bias [H, Dh]
  encoder.layer.{i}.attention.output.dense -> ...attention out kernel
  encoder.layer.{i}.attention.output.LayerNorm -> LayerNorm_0 of the layer
  encoder.layer.{i}.intermediate.dense     -> Dense_0
  encoder.layer.{i}.output.dense           -> Dense_1
  encoder.layer.{i}.output.LayerNorm       -> LayerNorm_1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_hf_state_dict(model_dir: str) -> dict:
    """Load tensors from safetensors or a torch pickle, whichever exists."""
    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file  # type: ignore

        return load_file(st_path)
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch  # type: ignore

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no checkpoint found under {model_dir}")


def convert(state: dict, num_layers: int = 6, num_heads: int = 12) -> dict:
    """HF BERT state dict -> flat '/'-joined flax param paths."""
    def strip(k):
        return k[len("bert."):] if k.startswith("bert.") else k

    state = {strip(k): np.asarray(v) for k, v in state.items()}
    d = state["embeddings.word_embeddings.weight"].shape[1]
    dh = d // num_heads
    out = {
        "params/Embed_0/embedding": state["embeddings.word_embeddings.weight"],
        "params/Embed_1/embedding": state["embeddings.position_embeddings.weight"],
        "params/Embed_2/embedding": state["embeddings.token_type_embeddings.weight"],
        "params/LayerNorm_0/scale": state["embeddings.LayerNorm.weight"],
        "params/LayerNorm_0/bias": state["embeddings.LayerNorm.bias"],
    }
    for i in range(num_layers):
        hf = f"encoder.layer.{i}"
        fx = f"params/TransformerLayer_{i}"
        attn = f"{fx}/MultiHeadDotProductAttention_0"
        for name in ("query", "key", "value"):
            w = state[f"{hf}.attention.self.{name}.weight"]  # [D, D] (out, in)
            b = state[f"{hf}.attention.self.{name}.bias"]
            out[f"{attn}/{name}/kernel"] = w.T.reshape(d, num_heads, dh)
            out[f"{attn}/{name}/bias"] = b.reshape(num_heads, dh)
        wo = state[f"{hf}.attention.output.dense.weight"]  # [D, D]
        bo = state[f"{hf}.attention.output.dense.bias"]
        out[f"{attn}/out/kernel"] = wo.T.reshape(num_heads, dh, d)
        out[f"{attn}/out/bias"] = bo
        out[f"{fx}/LayerNorm_0/scale"] = state[f"{hf}.attention.output.LayerNorm.weight"]
        out[f"{fx}/LayerNorm_0/bias"] = state[f"{hf}.attention.output.LayerNorm.bias"]
        out[f"{fx}/Dense_0/kernel"] = state[f"{hf}.intermediate.dense.weight"].T
        out[f"{fx}/Dense_0/bias"] = state[f"{hf}.intermediate.dense.bias"]
        out[f"{fx}/Dense_1/kernel"] = state[f"{hf}.output.dense.weight"].T
        out[f"{fx}/Dense_1/bias"] = state[f"{hf}.output.dense.bias"]
        out[f"{fx}/LayerNorm_1/scale"] = state[f"{hf}.output.LayerNorm.weight"]
        out[f"{fx}/LayerNorm_1/bias"] = state[f"{hf}.output.LayerNorm.bias"]
    return out


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    model_dir, out_path = sys.argv[1], sys.argv[2]
    state = load_hf_state_dict(model_dir)
    params = convert(state)
    np.savez(out_path, **params)
    print(f"wrote {len(params)} tensors -> {out_path}")
    print("load with FlaxMiniLMEmbedder(...).load_params(out_path) and pair")
    print("with WordPieceTokenizer(vocab.txt) for HF-compatible embeddings.")


if __name__ == "__main__":
    main()
