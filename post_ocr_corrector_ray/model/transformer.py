"""NumPy transformer encoder-decoder matching the reference architecture.

The reference model (src/model/neural_corrector.py:20-69) is
``nn.Transformer(d_model, n_head, n_layers, n_layers, d_linear, dropout,
layer_norm_eps, norm_first=True)`` over a char vocabulary of
``len(alphabet)+3`` (unk/bookend/pad appended after the alphabet), with:

- source/target ``nn.Embedding(vocab, d_model, padding_idx=pad)`` (pad row zero),
- sinusoidal positional encoding added WITHOUT the sqrt(d_model) scale
  (src/model/positional_encoding.py:19-26),
- a 2-layer ReLU head ``Linear(d,d) → ReLU → Linear(d,vocab)`` (:60-64).

This module reimplements that architecture in NumPy (float32, inference only
— dropout is identity, exactly like the reference's ``eval()`` +
``torch.no_grad()`` decode path).  ``norm_first`` semantics: pre-norm residual
blocks plus a final LayerNorm after each stack (what ``nn.Transformer``
constructs when ``norm_first=True``).

Weights are NOT ported from torch (no checkpoint exists in the reference repo
and torch is absent here); they are generated deterministically from a seed or
loaded from an ``.npz`` artifact.  Byte-identity of pipeline output is defined
against the single-process oracle running THIS same code — see
SURVEY.md §7.4.1.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np


@dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int
    max_len: int = 512
    d_model: int = 256
    n_head: int = 4
    n_layers: int = 4
    d_linear: int = 256
    layer_norm_eps: float = 2e-5
    pad_index: int | None = None  # embedding row forced to zero (padding_idx)

    def to_dict(self) -> dict:
        return {
            "vocab_size": self.vocab_size, "max_len": self.max_len,
            "d_model": self.d_model, "n_head": self.n_head,
            "n_layers": self.n_layers, "d_linear": self.d_linear,
            "layer_norm_eps": self.layer_norm_eps, "pad_index": self.pad_index,
        }


def sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    """Reference PositionalEncoding table (positional_encoding.py:12-16)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


def _layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray, eps: float) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


def _softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _mha(q_in: np.ndarray, kv_in: np.ndarray, w: dict, n_head: int,
         kv_cache: tuple[np.ndarray, np.ndarray] | None = None) -> np.ndarray:
    """Multi-head attention, shapes (B, L, D); packed qkv like torch MHA.

    Self-attention (q_in is kv_in, no cache) projects q/k/v in ONE packed GEMM
    against the stacked weight — one BLAS call instead of three, same dot
    products.  ``kv_cache``: precomputed (k, v) projections of a FIXED kv
    input (the encoder memory during greedy decode) — identical math, computed
    once per decode instead of once per step."""
    d = q_in.shape[-1]
    dh = d // n_head
    if kv_cache is not None:
        q = q_in @ w["wq"].T + w["bq"]
        k, v = kv_cache
    elif q_in is kv_in:
        packed = w.get("_packed")
        if packed is None:
            packed = (np.vstack([w["wq"], w["wk"], w["wv"]]),
                      np.concatenate([w["bq"], w["bk"], w["bv"]]))
            w["_packed"] = packed
        qkv = q_in @ packed[0].T + packed[1]
        q, k, v = qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :]
    else:
        q = q_in @ w["wq"].T + w["bq"]
        k = kv_in @ w["wk"].T + w["bk"]
        v = kv_in @ w["wv"].T + w["bv"]
    B, Lq, _ = q.shape
    Lk = k.shape[1]
    q = q.reshape(B, Lq, n_head, dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, Lk, n_head, dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, Lk, n_head, dh).transpose(0, 2, 1, 3)
    scores = (q @ k.transpose(0, 1, 3, 2)) / np.float32(math.sqrt(dh))
    attn = _softmax(scores, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, Lq, d)
    return out @ w["wo"].T + w["bo"]


def _ff(x: np.ndarray, w: dict) -> np.ndarray:
    h = x @ w["w1"].T + w["b1"]
    np.maximum(h, 0.0, out=h)
    return h @ w["w2"].T + w["b2"]


@dataclass
class TransformerWeights:
    config: TransformerConfig
    params: dict = field(default_factory=dict)

    @classmethod
    def create(cls, config: TransformerConfig, seed: int = 42) -> "TransformerWeights":
        """Deterministic xavier-ish init (float32) from a seed."""
        rng = np.random.default_rng(seed)
        p: dict[str, np.ndarray] = {}
        d, f, v = config.d_model, config.d_linear, config.vocab_size

        def mat(name: str, rows: int, cols: int) -> None:
            scale = math.sqrt(2.0 / (rows + cols))
            p[name] = rng.normal(0.0, scale, size=(rows, cols)).astype(np.float32)

        def vec(name: str, n: int, val: float = 0.0) -> None:
            p[name] = np.full(n, val, dtype=np.float32)

        mat("emb_src", v, d)
        mat("emb_tgt", v, d)
        if config.pad_index is not None:
            p["emb_src"][config.pad_index] = 0.0
            p["emb_tgt"][config.pad_index] = 0.0
        for side, n_attn in (("enc", 1), ("dec", 2)):
            for layer in range(config.n_layers):
                pre = f"{side}{layer}"
                for a in range(n_attn):
                    for nm in ("wq", "wk", "wv", "wo"):
                        mat(f"{pre}.attn{a}.{nm}", d, d)
                    for nm in ("bq", "bk", "bv", "bo"):
                        vec(f"{pre}.attn{a}.{nm}", d)
                mat(f"{pre}.ff.w1", f, d); vec(f"{pre}.ff.b1", f)
                mat(f"{pre}.ff.w2", d, f); vec(f"{pre}.ff.b2", d)
                n_norms = 2 if side == "enc" else 3
                for k in range(n_norms):
                    vec(f"{pre}.norm{k}.g", d, 1.0); vec(f"{pre}.norm{k}.b", d)
            vec(f"{side}_final_norm.g", d, 1.0); vec(f"{side}_final_norm.b", d)
        mat("head.w1", d, d); vec("head.b1", d)
        mat("head.w2", v, d); vec("head.b2", v)
        p["pe"] = sinusoidal_pe(config.max_len, d)
        return cls(config=config, params=p)

    def save_npz(self, path: str) -> None:
        meta = {f"__cfg__{k}": np.array(v if v is not None else -1)
                for k, v in self.config.to_dict().items()}
        np.savez_compressed(path, **self.params, **meta)

    @classmethod
    def load_npz(cls, path: str) -> "TransformerWeights":
        data = np.load(path)
        cfg_raw = {k[len("__cfg__"):]: data[k].item() for k in data.files if k.startswith("__cfg__")}
        pad = int(cfg_raw["pad_index"])
        config = TransformerConfig(
            vocab_size=int(cfg_raw["vocab_size"]), max_len=int(cfg_raw["max_len"]),
            d_model=int(cfg_raw["d_model"]), n_head=int(cfg_raw["n_head"]),
            n_layers=int(cfg_raw["n_layers"]), d_linear=int(cfg_raw["d_linear"]),
            layer_norm_eps=float(cfg_raw["layer_norm_eps"]),
            pad_index=None if pad < 0 else pad,
        )
        params = {k: data[k] for k in data.files if not k.startswith("__cfg__")}
        return cls(config=config, params=params)


class Transformer:
    """Inference-only encoder-decoder over (B, L) int64 id arrays."""

    def __init__(self, weights: TransformerWeights):
        self.w = weights.params
        self.cfg = weights.config

    def _attn_params(self, pre: str, a: int) -> dict:
        # memoized so the packed-qkv weight cached inside persists across steps
        cache = getattr(self, "_attn_cache", None)
        if cache is None:
            cache = self._attn_cache = {}
        key = (pre, a)
        got = cache.get(key)
        if got is None:
            w = self.w
            got = cache[key] = {nm: w[f"{pre}.attn{a}.{nm}"] for nm in
                                ("wq", "wk", "wv", "wo", "bq", "bk", "bv", "bo")}
        return got

    def _ff_params(self, pre: str) -> dict:
        w = self.w
        return {"w1": w[f"{pre}.ff.w1"], "b1": w[f"{pre}.ff.b1"],
                "w2": w[f"{pre}.ff.w2"], "b2": w[f"{pre}.ff.b2"]}

    def _norm(self, x: np.ndarray, pre: str, k: int) -> np.ndarray:
        return _layer_norm(x, self.w[f"{pre}.norm{k}.g"], self.w[f"{pre}.norm{k}.b"],
                           self.cfg.layer_norm_eps)

    def embed(self, ids: np.ndarray, which: str) -> np.ndarray:
        """Embedding + positional encoding (no sqrt(d_model) scale — reference
        adds PE directly to the raw embedding)."""
        emb = self.w[f"emb_{which}"][ids]  # (B, L, D)
        L = ids.shape[1]
        return emb + self.w["pe"][:L]

    def encode(self, src_ids: np.ndarray) -> np.ndarray:
        x = self.embed(src_ids, "src")
        nh = self.cfg.n_head
        for layer in range(self.cfg.n_layers):
            pre = f"enc{layer}"
            h = self._norm(x, pre, 0)
            x = x + _mha(h, h, self._attn_params(pre, 0), nh)
            x = x + _ff(self._norm(x, pre, 1), self._ff_params(pre))
        return _layer_norm(x, self.w["enc_final_norm.g"], self.w["enc_final_norm.b"],
                           self.cfg.layer_norm_eps)

    def precompute_memory_kv(self, memory: np.ndarray) -> list:
        """Cross-attention K/V projections of the (fixed) encoder memory, one
        pair per decoder layer — hoisted out of the per-step decode loop."""
        out = []
        for layer in range(self.cfg.n_layers):
            w = self._attn_params(f"dec{layer}", 1)
            out.append((memory @ w["wk"].T + w["bk"], memory @ w["wv"].T + w["bv"]))
        return out

    def decode_last_logits(self, tgt_ids: np.ndarray, memory: np.ndarray,
                           mem_kv: list | None = None) -> np.ndarray:
        """Run the decoder over the full target prefix (B, Lt) with UNMASKED
        self-attention — the reference's inference decode passes no tgt_mask
        (neural_corrector.py:92) — and return logits for the LAST position."""
        x = self.embed(tgt_ids, "tgt")
        nh = self.cfg.n_head
        for layer in range(self.cfg.n_layers):
            pre = f"dec{layer}"
            h = self._norm(x, pre, 0)
            x = x + _mha(h, h, self._attn_params(pre, 0), nh)
            x = x + _mha(self._norm(x, pre, 1), memory, self._attn_params(pre, 1), nh,
                         kv_cache=mem_kv[layer] if mem_kv is not None else None)
            x = x + _ff(self._norm(x, pre, 2), self._ff_params(pre))
        x = _layer_norm(x, self.w["dec_final_norm.g"], self.w["dec_final_norm.b"],
                        self.cfg.layer_norm_eps)
        last = x[:, -1, :]  # (B, D)
        h = np.maximum(last @ self.w["head.w1"].T + self.w["head.b1"], 0.0)
        return h @ self.w["head.w2"].T + self.w["head.b2"]  # (B, V)
