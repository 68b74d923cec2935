"""FlaxMiniLM — on-device MiniLM-class sentence encoder.

The reference treats `all-MiniLM-L6-v2` as a black-box host-side model
(embedding_generator.py:18-21).  This module is the TPU-native counterpart: a
BERT-style encoder in Flax matching MiniLM-L6's architecture (6 layers,
hidden 384, 12 heads, FFN 1536, vocab 30522) with mean pooling + L2 norm —
exactly the sentence-transformers pooling recipe — compiled with jit/pjit so
query/corpus embedding can run on the same chips as retrieval.

Weights: randomly initialized unless a checkpoint is supplied via
`load_params` (numpy .npz with HF BERT parameter names).  In this
zero-egress build no pretrained weights exist, so the encoder serves as the
architecture-true compute path (benchmarkable, shardable) while the
deterministic `HashingEmbedder` provides semantic embeddings for tests.

Tokenization: `SimpleTokenizer`, a lowercase wordpiece-less hash tokenizer
(deterministic vocab-bucket ids).  With a real vocab.txt available,
`WordPieceTokenizer` replicates BERT tokenization.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class MiniLMConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position: int = 512
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0


class TransformerLayer(nn.Module):
    cfg: MiniLMConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        attn_out = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads,
            qkv_features=cfg.hidden_size,
            out_features=cfg.hidden_size,
            dtype=x.dtype,
        )(x, x, mask=mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=x.dtype)(x + attn_out)
        h = nn.Dense(cfg.intermediate_size, dtype=x.dtype)(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=x.dtype)(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=x.dtype)(x + h)


class MiniLMEncoder(nn.Module):
    cfg: MiniLMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        cfg = self.cfg
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype)(input_ids)
        pos_ids = jnp.arange(s)[None, :]
        pos = nn.Embed(cfg.max_position, cfg.hidden_size, dtype=self.dtype)(pos_ids)
        seg = nn.Embed(2, cfg.hidden_size, dtype=self.dtype)(
            jnp.zeros_like(input_ids)
        )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype)(
            tok + pos + seg
        )
        # [B, 1, S, S] additive-free boolean mask for MHA
        attn_mask = attention_mask[:, None, None, :].astype(bool)
        for _ in range(cfg.num_layers):
            x = TransformerLayer(cfg)(x, attn_mask)
        # Mean pooling over valid tokens + L2 norm (the sentence-transformers
        # pooling used by all-MiniLM-L6-v2).
        m = attention_mask[..., None].astype(x.dtype)
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
        norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        return pooled / jnp.maximum(norm, 1e-12)


_WORD_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")


class SimpleTokenizer:
    """Deterministic hash tokenizer: words -> stable vocab buckets.

    ids 0/101/102 reserved as pad/CLS/SEP like BERT.
    """

    def __init__(self, vocab_size: int = 30522, max_len: int = 128):
        self.vocab_size = vocab_size
        self.max_len = max_len

    def encode_batch(self, texts: Sequence[str], max_len: int = 0):
        import hashlib

        max_len = min(max_len, self.max_len) if max_len else self.max_len
        ids = np.zeros((len(texts), max_len), dtype=np.int32)
        mask = np.zeros((len(texts), max_len), dtype=np.int32)
        for i, text in enumerate(texts):
            words = _WORD_RE.findall(text.lower())[: max_len - 2]
            reserved = min(999, max(self.vocab_size // 4, 103))
            bucket_range = self.vocab_size - reserved
            row = [101]
            for w in words:
                h = int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=4).digest(), "little"
                )
                row.append(reserved + h % bucket_range)
            row.append(102)
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return ids, mask


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece (BERT tokenization) over a real
    vocab.txt — drop this in when the MiniLM vocabulary is available locally
    and token ids match HuggingFace's BertTokenizer for standard text."""

    def __init__(self, vocab_path: str, max_len: int = 128, lowercase: bool = True):
        self.vocab = {}
        with open(vocab_path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                self.vocab[line.rstrip("\n")] = i
        self.max_len = max_len
        self.lowercase = lowercase
        self.cls_id = self.vocab.get("[CLS]", 101)
        self.sep_id = self.vocab.get("[SEP]", 102)
        self.unk_id = self.vocab.get("[UNK]", 100)
        self.vocab_size = len(self.vocab)
        self._native = None
        self._native_tried = False

    def _native_tokenizer(self):
        """Lazy native (C++) tokenizer — byte-exact with the Python path on
        the test corpus (tests/unit/test_native.py); None -> pure Python.

        The C++ side lowercases ASCII only, while Python str.lower() is full
        Unicode — a divergence only reachable through non-ASCII TEXT (e.g.
        'É' maps to a lowercase vocab id in Python but stays 'É' natively).
        For pure-ASCII text the two lowerings agree and vocab lookups are
        byte-exact regardless of vocab content, so `encode_batch` routes
        non-ASCII rows to the Python path and keeps native for the rest."""
        if not self._native_tried:
            self._native_tried = True
            try:
                from hcrag_tpu.native import NativeWordPiece

                words = [
                    w for w, _ in sorted(self.vocab.items(), key=lambda kv: kv[1])
                ]
                self._native = NativeWordPiece.create(words)
            except Exception:
                self._native = None
        return self._native

    def _wordpiece(self, word: str):
        if word in self.vocab:
            return [self.vocab[word]]
        pieces = []
        start = 0
        while start < len(word):
            end = len(word)
            piece_id = None
            while end > start:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece_id = self.vocab[sub]
                    break
                end -= 1
            if piece_id is None:
                return [self.unk_id]
            pieces.append(piece_id)
            start = end
        return pieces

    def encode_batch(self, texts: Sequence[str], max_len: int = 0):
        """`max_len` overrides (never exceeds) the tokenizer default: short
        QUERY batches at max_len 64 cut the encoder's attention work ~9x vs
        the 192-token corpus-row setting with identical embeddings for
        shorter texts (mean pooling and attention both mask padding)."""
        max_len = min(max_len, self.max_len) if max_len else self.max_len
        native = self._native_tokenizer()
        if native is None:
            return self._encode_batch_py(texts, max_len)
        if self.lowercase and not all(t.isascii() for t in texts):
            # Unicode lowercasing divergence (see _native_tokenizer): keep
            # the native path for the ASCII rows, Python for the rest.
            texts = list(texts)
            ascii_rows = [i for i, t in enumerate(texts) if t.isascii()]
            other_rows = [i for i, t in enumerate(texts) if not t.isascii()]
            ids = np.zeros((len(texts), max_len), dtype=np.int32)
            mask = np.zeros((len(texts), max_len), dtype=np.int32)
            if ascii_rows:
                ids_a, mask_a = native.encode_batch(
                    [texts[i] for i in ascii_rows], max_len,
                    lowercase=self.lowercase, cls_id=self.cls_id,
                    sep_id=self.sep_id, unk_id=self.unk_id,
                )
                ids[ascii_rows], mask[ascii_rows] = ids_a, mask_a
            ids_p, mask_p = self._encode_batch_py(
                [texts[i] for i in other_rows], max_len
            )
            ids[other_rows], mask[other_rows] = ids_p, mask_p
            return ids, mask
        return native.encode_batch(
            texts, max_len, lowercase=self.lowercase,
            cls_id=self.cls_id, sep_id=self.sep_id, unk_id=self.unk_id,
        )

    def _encode_batch_py(self, texts: Sequence[str], max_len: int):
        """Pure-Python reference path (also the native tokenizer's parity
        oracle in tests)."""
        ids = np.zeros((len(texts), max_len), dtype=np.int32)
        mask = np.zeros((len(texts), max_len), dtype=np.int32)
        for i, text in enumerate(texts):
            if self.lowercase:
                text = text.lower()
            row = [self.cls_id]
            for word in _WORD_RE.findall(text):
                row.extend(self._wordpiece(word))
                if len(row) >= max_len - 1:
                    break
            row = row[: max_len - 1]
            row.append(self.sep_id)
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return ids, mask


class FlaxMiniLMEmbedder:
    """Batched on-device text embedder with the MiniLM architecture."""

    def __init__(
        self,
        cfg: Optional[MiniLMConfig] = None,
        tokenizer=None,
        seed: int = 0,
        dtype=jnp.float32,
        max_len: int = 128,
    ):
        self.cfg = cfg or MiniLMConfig()
        self.dim = self.cfg.hidden_size
        self.tokenizer = tokenizer or SimpleTokenizer(
            self.cfg.vocab_size, max_len=max_len
        )
        self.model = MiniLMEncoder(self.cfg, dtype=dtype)
        dummy = jnp.zeros((1, 8), jnp.int32)
        self.params = self.model.init(
            jax.random.PRNGKey(seed), dummy, jnp.ones_like(dummy)
        )
        self._apply = jax.jit(self.model.apply)

    def load_params(self, npz_path: str) -> None:
        """Load parameters from an .npz checkpoint (flattened '/'-joined
        flax paths)."""
        import flax.traverse_util as tu

        flat = dict(np.load(npz_path))
        restored = tu.unflatten_dict(
            {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()}
        )
        self.params = {"params": restored.get("params", restored)}

    def save_params(self, npz_path: str) -> None:
        import flax.traverse_util as tu

        flat = tu.flatten_dict(self.params)
        np.savez(
            npz_path, **{"/".join(k): np.asarray(v) for k, v in flat.items()}
        )

    def encode(self, texts: Sequence[str], max_len: int = 0) -> np.ndarray:
        """`max_len` (optional) caps the padded sequence length — use ~64
        for short query batches (9x less attention work, identical outputs
        for texts that fit; see WordPieceTokenizer.encode_batch)."""
        ids, mask = self.tokenizer.encode_batch(list(texts), max_len=max_len)
        return np.asarray(self._apply(self.params, ids, mask))


def load_distilled_embedder(base: Optional[str] = None) -> Optional[FlaxMiniLMEmbedder]:
    """Load the distilled-to-golden encoder artifacts if present.

    `tools/distill_minilm.py` trains this MiniLM architecture to reproduce
    the reference artifact's real `all-MiniLM-L6-v2` vectors (the pickle
    stores 585 text->vector pairs — a complete corpus-domain supervision
    set) with a corpus-built WordPiece vocab.  Returns None when the
    artifacts are absent (the zero-egress default until the tool has run).
    """
    import json
    import os

    if base is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        base = os.path.join(repo, "tools/minilm_distilled")
    npz, vocab, meta_p = base + ".npz", base + "_vocab.txt", base + "_meta.json"
    if not (os.path.exists(npz) and os.path.exists(vocab) and os.path.exists(meta_p)):
        return None
    with open(meta_p) as f:
        meta = json.load(f)
    cfg = MiniLMConfig(**meta["config"])
    tok = WordPieceTokenizer(vocab, max_len=meta["max_len"])
    emb = FlaxMiniLMEmbedder(cfg, tokenizer=tok, max_len=meta["max_len"])
    emb.load_params(npz)
    return emb
