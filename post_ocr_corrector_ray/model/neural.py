"""Character-level neural corrector with the reference's decode semantics.

Reproduces ``NeuralCorrector.correct`` / ``forward`` (reference
src/model/neural_corrector.py:71-150) on the NumPy transformer:

- inputs chunked into ``max_len``-char windows per text (:138-141);
- each chunk batch greedy-decoded from a ``bookend`` start token, one argmax
  token at a time, with per-sequence termination on bookend, termination
  forcing pad thereafter, and a hard stop at ``2 × in_length`` generated
  context (:83-102);
- when the growing target exceeds ``max_len`` only the last ``max_len`` tokens
  feed the decoder (:87-88);
- decoder self-attention is UNMASKED during generation (no tgt_mask at :92) —
  so the whole prefix is re-run every step, exactly like the reference;
- output ids map back to text with unk/out-of-range → U+FFFD and sequences
  stopping at the first INT_EMPTY (:107-126).

Determinism under parallelism (SURVEY.md §7.4.1): the reference encoder takes
no src padding mask, so with cross-document micro-batches the output bytes
depend on which documents share a batch.  This engine therefore pins
**per-document batching**: ``correct_document`` processes one document's
chunks with batch size 1 per chunk — output is a pure function of the document
text, invariant to partitioning, Ray batch size, and actor count.  The
cross-document ``correct(texts)`` micro-batch path of the reference is also
provided (for parity/testing) but the pipeline never uses it.
"""

from __future__ import annotations

from math import ceil

import numpy as np

from .. import INT_EMPTY
from ..functions.alphabet import Vocab
from .transformer import Transformer, TransformerConfig, TransformerWeights

# Fixed decode micro-batch: full max_len chunks decode in groups of exactly
# this many.  The group boundary is a pure function of the document (chunks
# [0, G), [G, 2G), ...), so the batch shapes fed to BLAS are identical whether
# a document is corrected whole or exploded into G×max_len-char rows by the
# chunk-parallel skew path — float results (and therefore argmax/bytes) match
# bit-for-bit.  An "all chunks in one batch" policy would make output bytes
# depend on document length vs explosion window (GEMM results vary with M), a
# fragility the round-2 chunk-parallel byte-identity failure traced to.
# Also bounds decode memory: one giant page never builds a (n_chunks × L)
# attention problem bigger than (G × L).
DECODE_GROUP = 32


class NeuralCorrectorModel:
    def __init__(self, alphabet: str, weights: TransformerWeights, batch_size: int = 4):
        self.vocab = Vocab(alphabet)
        cfg = weights.config
        assert cfg.vocab_size == self.vocab.vocab_size, (
            f"weights vocab_size {cfg.vocab_size} != alphabet vocab {self.vocab.vocab_size}"
        )
        self.alphabet = alphabet
        self.max_len = cfg.max_len
        self.batch_size = batch_size
        self.net = Transformer(weights)

    # -- constructors ---------------------------------------------------------

    @classmethod
    def from_seed(cls, alphabet: str, seed: int = 42, *, max_len: int = 512,
                  d_model: int = 256, n_head: int = 4, n_layers: int = 4,
                  d_linear: int = 256, layer_norm_eps: float = 2e-5,
                  batch_size: int = 4) -> "NeuralCorrectorModel":
        vocab = Vocab(alphabet)
        cfg = TransformerConfig(
            vocab_size=vocab.vocab_size, max_len=max_len, d_model=d_model,
            n_head=n_head, n_layers=n_layers, d_linear=d_linear,
            layer_norm_eps=layer_norm_eps, pad_index=vocab.pad_index,
        )
        return cls(alphabet, TransformerWeights.create(cfg, seed=seed), batch_size=batch_size)

    @classmethod
    def load(cls, npz_path: str, alphabet: str, batch_size: int = 4) -> "NeuralCorrectorModel":
        return cls(alphabet, TransformerWeights.load_npz(npz_path), batch_size=batch_size)

    def save(self, npz_path: str) -> None:
        TransformerWeights(config=self.net.cfg, params=self.net.w).save_npz(npz_path)

    # -- decode ---------------------------------------------------------------

    def greedy_decode(self, src_ids: np.ndarray) -> np.ndarray:
        """(B, L) int64 with INT_EMPTY padding → (B, L') generated ids with
        INT_EMPTY padding; reference ``forward`` semantics."""
        v = self.vocab
        if src_ids.shape[1] > self.max_len:
            src_ids = src_ids[:, : self.max_len]
        B, in_length = src_ids.shape
        src = np.where(src_ids == INT_EMPTY, v.pad_index, src_ids)
        memory = self.net.encode(src)
        mem_kv = self.net.precompute_memory_kv(memory)
        sequence = np.full((B, 1), v.bookend_index, dtype=np.int64)
        terminated = np.zeros(B, dtype=bool)
        while sequence.shape[1] <= 2 * in_length:
            window = sequence[:, -self.max_len:] if sequence.shape[1] > self.max_len else sequence
            logits = self.net.decode_last_logits(window, memory, mem_kv)
            new = logits.argmax(axis=1).astype(np.int64)
            terminated = terminated | (new == v.bookend_index)
            if terminated.all():
                break
            new[terminated] = v.pad_index
            sequence = np.concatenate([sequence, new[:, None]], axis=1)
        out = sequence[:, 1:]  # drop the starting bookend
        return np.where(out == v.pad_index, INT_EMPTY, out)

    def ids_to_texts(self, ids: np.ndarray) -> list[str]:
        return [self.vocab.decode(ids[i]) for i in range(ids.shape[0])]

    # -- correction -----------------------------------------------------------

    def correct_document(self, text: str) -> str:
        """Pinned per-document path: batch composition is a pure function of
        the document, so output bytes are invariant to Ray batch size,
        partitioning, and actor count (SURVEY.md §7.4.1 — the encoder takes no
        padding mask, so cross-document batches would leak neighbors' padding
        into the result).

        Full ``max_len`` chunks decode in fixed groups of ``DECODE_GROUP``
        (uniform length — no padding exists), the short tail chunk decodes
        alone.  Group boundaries are document-absolute, so the chunk-parallel
        explosion path (rows of ``DECODE_GROUP × max_len`` chars) reproduces
        the exact same batch shapes and bytes."""
        if text == "":
            return ""
        L = self.max_len
        G = DECODE_GROUP
        n_full = len(text) // L
        outs: list[str] = [""] * ((n_full + 1) if len(text) % L else n_full)
        for g0 in range(0, n_full, G):
            g1 = min(g0 + G, n_full)
            ids = np.stack([self.vocab.encode(text[i * L : (i + 1) * L])
                            for i in range(g0, g1)])  # (<=G, L)
            decoded = self.greedy_decode(ids)
            for row, i in enumerate(range(g0, g1)):
                outs[i] = self.vocab.decode(decoded[row])
        tail = text[n_full * L :]
        if tail:
            out = self.greedy_decode(self.vocab.encode(tail)[None, :])
            outs[-1] = self.vocab.decode(out[0])
        return "".join(outs)

    def correct(self, texts: list[str]) -> list[str]:
        """Reference ``correct`` parity path (cross-document micro-batches,
        chunk i of every batch text decoded together; :128-150).  Used for
        semantics tests only — the pipeline uses ``correct_document``."""
        out_all: list[str] = []
        n = len(texts)
        next_text = 0
        while next_text < n:
            batch_texts = texts[next_text : next_text + self.batch_size]
            longest = max(len(x) for x in batch_texts)
            out_chunks: list[list[str]] = [[] for _ in batch_texts]
            for chunk_num in range(ceil(longest / self.max_len)):
                lo = chunk_num * self.max_len
                hi = lo + self.max_len
                in_chunks = [t[lo:hi] for t in batch_texts]
                width = max(len(c) for c in in_chunks)
                ids = np.full((len(in_chunks), width), INT_EMPTY, dtype=np.int64)
                for i, c in enumerate(in_chunks):
                    if c:
                        ids[i, : len(c)] = self.vocab.encode(c)
                decoded = self.ids_to_texts(self.greedy_decode(ids))
                for i, (in_c, out_c) in enumerate(zip(in_chunks, decoded)):
                    if in_c != "":
                        out_chunks[i].append(out_c)
            out_all += ["".join(c) for c in out_chunks]
            next_text += self.batch_size
        return out_all
