"""Encoder towers for the embedding stages — TPU-batched, weight-pluggable.

The reference runs sentence-transformers MiniLM (384d) and HF CLIP ViT-B/32
(512d) on GPU (`embed_text.py:109-115`, `embed_image.py:120-136`). This
module provides:

  - `hash_text_encoder`: deterministic featureless encoder (feature-hashing
    n-grams -> L2-normalized dense vector). Needs no weights or network —
    the default in zero-egress environments, and exactly reproducible.
  - `TransformerTextEncoder`: MiniLM-shaped functional transformer (6 layers,
    hidden 384, 12 heads, mean pooling) for when real weights are provided
    locally as an npz; random init otherwise.
  - `ViTImageEncoder`: CLIP-ViT-B/32-shaped vision tower (32px patches,
    12 layers, hidden 768, CLS token, projection to 512).

All towers are pure-functional (params pytree + apply) and jit/batch on TPU.
"""
from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass
from typing import Any, Callable, Dict, List

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Featureless deterministic encoder (zero-egress default)
# ---------------------------------------------------------------------------


def hash_text_encoder(dim: int = 384, n_grams: int = 3, seed: int = 0, max_len: int = 256) -> Callable[[List[str]], np.ndarray]:
    """Feature-hashing encoder: character n-grams -> signed buckets -> L2 norm.

    Deterministic across processes/hosts, so artifacts are reproducible
    without any model weights. Similar texts share n-grams and therefore land
    near each other — enough signal for the kNN/fusion plumbing to be
    meaningful in tests and offline runs.

    Fully vectorized (numpy rolling polynomial hashes over a fixed-width byte
    matrix): encodes the 498k-item reference catalog in seconds; the naive
    per-ngram md5 formulation took hours at that scale.
    """
    P1, P2 = np.uint64(1099511628211), np.uint64(14695981039346656037)  # FNV-ish
    MIX = np.uint64(0x9E3779B97F4A7C15)

    def encode(texts: List[str]) -> np.ndarray:
        n_rows = len(texts)
        # fixed-width byte matrix (lowercased, truncated/padded with 0)
        mat = np.zeros((n_rows, max_len), dtype=np.uint64)
        lens = np.zeros(n_rows, dtype=np.int64)
        for i, t in enumerate(texts):
            b = (t or "").lower().encode("utf-8", "ignore")[:max_len]
            lens[i] = len(b)
            if b:
                mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        mat = mat + np.uint64(seed + 1)

        out = np.zeros((n_rows, dim), dtype=np.float32)
        pos = np.arange(max_len)
        with np.errstate(over="ignore"):
            for n in range(1, n_grams + 1):
                # rolling hash of every n-gram window: h = sum b[j+k] * P1^k, mixed
                h = np.zeros((n_rows, max_len - n + 1), dtype=np.uint64)
                for k in range(n):
                    h = h * P1 + mat[:, k : max_len - n + 1 + k]
                h = (h ^ (h >> np.uint64(33))) * MIX ^ P2
                h ^= h >> np.uint64(29)
                valid = pos[None, : max_len - n + 1] < (lens[:, None] - n + 1)
                bucket = (h % np.uint64(dim)).astype(np.int64)
                sign = np.where((h >> np.uint64(13)) & np.uint64(1), 1.0, -1.0).astype(np.float32)
                contrib = np.where(valid, sign, 0.0)
                np.add.at(out, (np.repeat(np.arange(n_rows), bucket.shape[1]), bucket.ravel()), contrib.ravel())
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.where(norms > 0, norms, 1.0)

    return encode


# ---------------------------------------------------------------------------
# Shared transformer blocks (functional)
# ---------------------------------------------------------------------------


def _linear_init(key, fan_in, fan_out):
    a = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -a, a),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -a, a),
    }


def _layer_norm(x, p, eps=1e-12):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


# Activation fidelity: converted real weights only reproduce the published
# embeddings with the exact activation the checkpoint was trained with —
# BERT/MiniLM uses erf-GELU, CLIP uses QuickGELU (x * sigmoid(1.702 x)).
ACTIVATIONS: Dict[str, Callable] = {
    "gelu_exact": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
}


def _init_block(key, hidden, ffn):
    ks = jax.random.split(key, 6)
    return {
        "qkv": _linear_init(ks[0], hidden, 3 * hidden),
        "proj": _linear_init(ks[1], hidden, hidden),
        "ffn1": _linear_init(ks[2], hidden, ffn),
        "ffn2": _linear_init(ks[3], ffn, hidden),
        "ln1": {"g": jnp.ones((hidden,)), "b": jnp.zeros((hidden,))},
        "ln2": {"g": jnp.ones((hidden,)), "b": jnp.zeros((hidden,))},
    }


def _block_apply(p, x, mask, heads, pre_ln: bool, act: str = "gelu_tanh", ln_eps: float = 1e-12):
    """One transformer block. pre_ln=True -> ViT/CLIP style; False -> BERT style."""
    b, s, h = x.shape
    d = h // heads
    act_fn = ACTIVATIONS[act]

    def attn(xin):
        qkv = xin @ p["qkv"]["w"] + p["qkv"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, -1e9)
        a = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", a, v).transpose(0, 2, 1, 3).reshape(b, s, h)
        return out @ p["proj"]["w"] + p["proj"]["b"]

    def ffn(xin):
        y = xin @ p["ffn1"]["w"] + p["ffn1"]["b"]
        y = act_fn(y)
        return y @ p["ffn2"]["w"] + p["ffn2"]["b"]

    if pre_ln:
        x = x + attn(_layer_norm(x, p["ln1"], ln_eps))
        x = x + ffn(_layer_norm(x, p["ln2"], ln_eps))
    else:
        x = _layer_norm(x + attn(x), p["ln1"], ln_eps)
        x = _layer_norm(x + ffn(x), p["ln2"], ln_eps)
    return x


# ---------------------------------------------------------------------------
# MiniLM-shaped text tower
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TransformerTextEncoder:
    """all-MiniLM-L6-v2 shape: vocab 30522, hidden 384, 6 layers, 12 heads,
    max_len 256, mean pooling over valid tokens, L2 normalize."""

    vocab_size: int = 30522
    hidden: int = 384
    n_layers: int = 6
    heads: int = 12
    ffn: int = 1536
    max_len: int = 256
    act: str = "gelu_exact"  # BERT/MiniLM trains with erf-GELU
    ln_eps: float = 1e-12

    def init(self, key) -> Dict[str, Any]:
        ks = jax.random.split(key, self.n_layers + 2)
        return {
            "tok_emb": 0.02 * jax.random.normal(ks[0], (self.vocab_size, self.hidden)),
            "pos_emb": 0.02 * jax.random.normal(ks[1], (self.max_len, self.hidden)),
            "ln_emb": {"g": jnp.ones((self.hidden,)), "b": jnp.zeros((self.hidden,))},
            "blocks": [_init_block(k, self.hidden, self.ffn) for k in ks[2:]],
        }

    def apply(self, params, token_ids: jax.Array, mask: jax.Array) -> jax.Array:
        """token_ids, mask: [B, S] -> [B, hidden] mean-pooled, L2-normalized."""
        s = token_ids.shape[1]
        x = params["tok_emb"][token_ids] + params["pos_emb"][:s]
        x = _layer_norm(x, params["ln_emb"], self.ln_eps)
        for blk in params["blocks"]:
            x = _block_apply(blk, x, mask.astype(bool), self.heads, pre_ln=False,
                             act=self.act, ln_eps=self.ln_eps)
        m = mask[..., None].astype(x.dtype)
        pooled = (x * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        return pooled / (jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-12)

    def tokenize(self, texts: List[str]) -> tuple:
        """Hash tokenizer (no vocab file needed): whitespace words -> hashed ids.
        With real MiniLM weights, plug a WordPiece tokenizer instead."""
        ids = np.zeros((len(texts), self.max_len), np.int32)
        mask = np.zeros((len(texts), self.max_len), np.float32)
        for i, t in enumerate(texts):
            words = (t or "").lower().split()[: self.max_len]
            for j, w in enumerate(words):
                h = hashlib.md5(w.encode()).digest()
                ids[i, j] = int.from_bytes(h[:4], "little") % self.vocab_size
            mask[i, : len(words)] = 1.0
        return ids, mask


# ---------------------------------------------------------------------------
# CLIP-ViT-B/32-shaped vision tower
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ViTImageEncoder:
    """CLIP ViT-B/32 vision shape: 224px, 32px patches (49 + CLS tokens),
    hidden 768, 12 layers, 12 heads, pre-LN, projection to 512."""

    image_size: int = 224
    patch: int = 32
    hidden: int = 768
    n_layers: int = 12
    heads: int = 12
    ffn: int = 3072
    out_dim: int = 512
    act: str = "quick_gelu"  # CLIP trains with QuickGELU
    ln_eps: float = 1e-5

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch) ** 2

    def init(self, key) -> Dict[str, Any]:
        ks = jax.random.split(key, self.n_layers + 4)
        patch_dim = 3 * self.patch * self.patch
        return {
            "patch_proj": _linear_init(ks[0], patch_dim, self.hidden),
            "cls": 0.02 * jax.random.normal(ks[1], (self.hidden,)),
            "pos_emb": 0.02 * jax.random.normal(ks[2], (self.n_patches + 1, self.hidden)),
            "ln_pre": {"g": jnp.ones((self.hidden,)), "b": jnp.zeros((self.hidden,))},
            "ln_post": {"g": jnp.ones((self.hidden,)), "b": jnp.zeros((self.hidden,))},
            "proj": _linear_init(ks[3], self.hidden, self.out_dim),
            "blocks": [_init_block(k, self.hidden, self.ffn) for k in ks[4:]],
        }

    def apply(self, params, images: jax.Array) -> jax.Array:
        """images: [B, H, W, 3] float in [0,1] -> [B, out_dim] L2-normalized."""
        b = images.shape[0]
        p = self.patch
        g = self.image_size // p
        x = images.reshape(b, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, p * p * 3)
        x = x @ params["patch_proj"]["w"] + params["patch_proj"]["b"]
        cls = jnp.broadcast_to(params["cls"], (b, 1, self.hidden))
        x = jnp.concatenate([cls, x], axis=1) + params["pos_emb"]
        x = _layer_norm(x, params["ln_pre"], self.ln_eps)
        for blk in params["blocks"]:
            x = _block_apply(blk, x, None, self.heads, pre_ln=True,
                             act=self.act, ln_eps=self.ln_eps)
        pooled = _layer_norm(x[:, 0], params["ln_post"], self.ln_eps)
        out = pooled @ params["proj"]["w"] + params["proj"]["b"]
        return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)


def load_params_npz(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore an encoder params pytree from a flat npz keyed by tree paths
    (same format as train/checkpoint.py) — the adapter for locally converted
    MiniLM/CLIP weights."""
    from plotpointe_tpu.train.checkpoint import load_checkpoint

    params, _ = load_checkpoint(path, template)
    return params
