"""Convert a reference PyTorch-Lightning checkpoint to an engine model dir.

Usage:
    python scripts/convert_reference_ckpt.py model.ckpt alphabet.txt out_model_dir/

Thin wrapper over post_ocr_corrector_ray.model.ckpt_compat.convert_to_model_dir
(the torch-free .ckpt parser + nn.Transformer→engine weight mapping); also
exposed as the `convert-ckpt` CLI subcommand.  Reference loading site:
eval.py:24-33.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from post_ocr_corrector_ray.model.ckpt_compat import convert_to_model_dir


def main(ckpt_path: str, alphabet_path: str, out_dir: str) -> None:
    with open(alphabet_path, encoding="utf-8") as f:
        alphabet = f.read().replace("\n", "")
    hparams = convert_to_model_dir(ckpt_path, alphabet, out_dir)
    print(f"wrote {out_dir}: vocab={len(alphabet) + 3} "
          f"d_model={hparams['d_model']} layers={hparams['n_layers']}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
