"""Convert a reference PyTorch-Lightning checkpoint to an engine model dir.

Usage:
    python scripts/convert_reference_ckpt.py model.ckpt alphabet.txt out_model_dir/

Reads the torch-zip checkpoint WITHOUT torch (post_ocr_corrector_ray.model.
ckpt_compat), maps the nn.Transformer state dict onto the engine's NumPy
weight layout, and writes hyperparameters.json + alphabet.txt + weights.npz —
the directory every corrector actor loads once in __init__
(model/artifacts.py).  Reference loading site: eval.py:24-33.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from post_ocr_corrector_ray.model import artifacts
from post_ocr_corrector_ray.model.ckpt_compat import checkpoint_to_weights


def main(ckpt_path: str, alphabet_path: str, out_dir: str) -> None:
    with open(alphabet_path, encoding="utf-8") as f:
        alphabet = f.read().replace("\n", "")
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
    print(f"wrote {out_dir}: vocab={cfg.vocab_size} d_model={cfg.d_model} "
          f"layers={cfg.n_layers}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
